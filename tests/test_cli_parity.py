"""CLI flag-surface parity audit against the reference's argparse CLIs.

Extracts every `add_argument` option string from the reference's
eval_vsdf.py, evals/eval_dtu.py and evals/eval_bmvs.py and asserts each
flag either exists in our corresponding CLI module (same spelling) or
is explicitly excluded with a reason. The hydra-driven entry points
(runner.py, simple_ibr.py) are covered by the config-surface audit in
test_config_parity.py instead.
"""

import os
import re

import pytest

REF = "/root/reference"
OURS = os.path.join(os.path.dirname(__file__), "..", "s_volsdf_tpu", "cli")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not available")

# flag -> exclusion reason. Currently every reference flag has a local
# equivalent (--gpu is accepted-and-ignored rather than excluded).
EXCLUDED = {
    "eval_vsdf": {},
    "eval_dtu": {},
    "eval_bmvs": {},
}

PAIRS = [
    ("eval_vsdf", f"{REF}/eval_vsdf.py", f"{OURS}/eval_vsdf.py"),
    ("eval_dtu", f"{REF}/evals/eval_dtu.py", f"{OURS}/eval_dtu.py"),
    ("eval_bmvs", f"{REF}/evals/eval_bmvs.py", f"{OURS}/eval_bmvs.py"),
]


def _flags(path):
    src = open(path).read()
    out = set()
    for m in re.finditer(r"add_argument\(\s*((?:'[^']*'|\"[^\"]*\")"
                         r"(?:\s*,\s*(?:'[^']*'|\"[^\"]*\"))*)", src):
        for tok in re.findall(r"['\"]([^'\"]+)['\"]", m.group(1)):
            if tok.startswith("-"):
                out.add(tok)
    return out


@pytest.mark.parametrize("name,ref_path,our_path", PAIRS)
def test_reference_flags_covered(name, ref_path, our_path):
    ref_flags = _flags(ref_path)
    our_flags = _flags(our_path)
    excluded = EXCLUDED[name]
    missing = {f for f in ref_flags
               if f not in our_flags and f not in excluded}
    assert not missing, (f"{name}: reference flags with no local "
                         f"equivalent or exclusion: {sorted(missing)}")
    stale = {f for f in excluded if f in our_flags and excluded[f] is None
             and f not in ref_flags}
    assert not stale, f"{name}: stale exclusion entries: {sorted(stale)}"


def test_our_cli_builds():
    """Every CLI parser constructs and prints help without importing
    heavy deps at module import time."""
    import importlib
    for mod in ("eval_vsdf", "eval_dtu", "eval_bmvs", "ibr", "run"):
        importlib.import_module(f"s_volsdf_tpu.cli.{mod}")


def test_run_cli_hydra_compat_parsing():
    """The pipeline CLI accepts the reference's hydra spellings:
    '+key=value' append syntax and 'vol=bmvs' group selection
    (reference config/logs.yaml commands)."""
    from s_volsdf_tpu.cli import run as run_cli

    captured = {}

    def fake_load_config(preset, overrides=None, **kw):
        captured["preset"] = preset
        captured["overrides"] = overrides
        raise RuntimeError("stop-after-parse")

    import s_volsdf_tpu.config as config_mod
    orig = config_mod.load_config
    config_mod.load_config = fake_load_config
    try:
        import pytest as _pytest
        with _pytest.raises(RuntimeError, match="stop-after-parse"):
            run_cli.main(["vol=bmvs", "testlist=scan4",
                          "+create_scene=true", "+outdir=exps_ibr"])
    finally:
        config_mod.load_config = orig
    assert captured["preset"] == "bmvs"
    assert "outdir=exps_ibr" in captured["overrides"]
    # create_scene was consumed as a mode flag, not an override
    assert not any(o.startswith("create_scene")
                   for o in captured["overrides"])
