#!/usr/bin/env python
"""DTU Chamfer evaluation CLI (reference evals/eval_dtu.py:38-197).
Thin shim over s_volsdf_tpu.cli.eval_dtu (installed as
`s-volsdf-eval-dtu`).

  python evals/eval_dtu.py --datadir exps_mvs --scan 106 \
      --dataset_dir <DTU official SampleSet/MVS Data>
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from s_volsdf_tpu.cli.eval_dtu import main

if __name__ == "__main__":
    main()
