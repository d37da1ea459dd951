"""Larger-than-8 virtual meshes: the production sharded loops must
compile and execute unchanged when the device count grows past the
8-device CPU mesh the rest of the suite uses (SURVEY.md §7 — scaling
is mesh-shape-driven, never code-driven; reference has no analog,
/root/reference is single-GPU).

Runs `__graft_entry__.dryrun_multichip` — the exact artifact the
driver validates — in a subprocess (device count is fixed at backend
init, so the 16/32-device meshes need their own process). Covers:
1D 16-way ray sharding, scene-sharded multiscene, the 2D
(scene x rays) = (2 x 8) pod topology, and the mesh-sharded eval
render, all with finite-loss asserts inside the dryrun itself.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # fresh-process XLA compiles (~1-2 min)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.parametrize("n_devices", [16, 32])
def test_dryrun_multichip_scales_past_eight(n_devices):
    code = (
        "import __graft_entry__ as g; "
        f"g.dryrun_multichip({n_devices}); "
        f"print('dryrun ok at {n_devices}')"
    )
    env = dict(os.environ, PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-c", code], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (
        f"dryrun_multichip({n_devices}) failed:\n"
        f"stdout: {proc.stdout[-2000:]}\nstderr: {proc.stderr[-2000:]}")
    assert f"dryrun ok at {n_devices}" in proc.stdout
