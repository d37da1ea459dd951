"""Console entry points (installed as ``s-volsdf*`` scripts).

Mirrors the reference's top-level scripts (`runner.py`, `eval_vsdf.py`,
`simple_ibr.py`, `evals/eval_dtu.py`, `evals/eval_bmvs.py`); the
repo-root scripts of the same names are thin shims over these modules
so both ``python runner.py ...`` (reference-style) and the installed
``s-volsdf ...`` commands work.
"""
