#!/usr/bin/env python
"""Novel-view / mesh evaluation CLI — mirrors the reference
`python eval_vsdf.py --conf dtu --eval_rendering ...`
(/root/reference/eval_vsdf.py:283-348).
Thin shim over s_volsdf_tpu.cli.eval_vsdf (installed as `s-volsdf-eval`).
"""

from s_volsdf_tpu.cli.eval_vsdf import main

if __name__ == "__main__":
    main()
