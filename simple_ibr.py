#!/usr/bin/env python
"""Image-based rendering CLI — mirrors the reference
`python simple_ibr.py testlist=... outdir=... evals_folder=...`
(/root/reference/simple_ibr.py:238-265).
Thin shim over s_volsdf_tpu.cli.ibr (installed as `s-volsdf-ibr`).
"""

import sys

from s_volsdf_tpu.cli.ibr import main

if __name__ == "__main__":
    main(sys.argv[1:])
