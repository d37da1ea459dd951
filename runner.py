#!/usr/bin/env python
"""CLI entry — mirrors the reference `python runner.py key=val ...`
(hydra-style dotted overrides, reference runner.py:8-16, 435-459).
Thin shim over s_volsdf_tpu.cli.run (installed as `s-volsdf`).

Examples:
  python runner.py testlist=scan106
  python runner.py preset=bmvs testlist=scan4 opt_stepNs=[100000,0,0]
  python runner.py testlist=scan106 filter_only=true
  python runner.py testlist=scan106 create_scene=true
  python runner.py testlist=scan106,scan114 multiscene=true
"""

import sys

from s_volsdf_tpu.cli.run import main

if __name__ == "__main__":
    main(sys.argv[1:])
