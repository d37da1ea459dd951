"""Packaging: the wheel must carry the package, its data files, and
working console entry points (pyproject.toml).

Guards the pyproject <-> package-tree contract: a new data directory
that isn't listed in [tool.setuptools.package-data] would import fine
from the repo but break for pip users.
"""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_pip_install_and_console_scripts(tmp_path):
    target = str(tmp_path / "site")
    subprocess.run(
        [sys.executable, "-m", "pip", "install", "--no-deps",
         "--no-build-isolation", "--quiet", "--target", target, REPO],
        check=True, cwd=str(tmp_path))

    pkg = os.path.join(target, "s_volsdf_tpu")
    # Data files declared in [tool.setuptools.package-data].
    for rel in ("configs/lists/dtu.txt", "configs/lists/bmvs.txt",
                "native/fusion.cpp", "native/mc.cpp"):
        assert os.path.exists(os.path.join(pkg, rel)), f"missing {rel}"
    # Host-built .so files must NOT ship.
    assert not any(f.endswith(".so")
                   for f in os.listdir(os.path.join(pkg, "native")))

    # Console scripts resolve and run from the installed tree (cwd is
    # tmp_path, so the repo checkout is not on sys.path).
    for script in ("s-volsdf", "s-volsdf-eval", "s-volsdf-ibr",
                   "s-volsdf-eval-dtu", "s-volsdf-eval-bmvs"):
        assert os.path.exists(os.path.join(target, "bin", script)), script
    env = dict(os.environ, PYTHONPATH=target, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [sys.executable, os.path.join(target, "bin", "s-volsdf-eval"),
         "--help"],
        check=True, cwd=str(tmp_path), env=env, capture_output=True,
        text=True)
    assert "--eval_rendering" in out.stdout
