#!/usr/bin/env python
"""BlendedMVS Chamfer evaluation CLI (reference evals/eval_bmvs.py).
Thin shim over s_volsdf_tpu.cli.eval_bmvs (installed as
`s-volsdf-eval-bmvs`).

  python evals/eval_bmvs.py --datadir exps_mvs --scan 4 \
      --data_dir_root data_s_volsdf
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s_volsdf_tpu.cli.eval_bmvs import main

if __name__ == "__main__":
    main()
