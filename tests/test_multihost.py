"""Two-process jax.distributed coverage (VERDICT r3 #4): the DCN path —
coordinator handshake, global device discovery, per-host data feeding,
cross-process psum — via tools/multihost_smoke.py. The smoke spawns two
fresh processes (4 virtual CPU devices each), runs one (8, 1) sharded
scene step fed half-per-process, and asserts the replicated loss equals
a single-process 8-device run."""
import pathlib
import subprocess
import sys

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[1]


@pytest.mark.slow
def test_two_process_distributed_step_matches_single():
    r = subprocess.run(
        [sys.executable, str(ROOT / "tools" / "multihost_smoke.py")],
        capture_output=True, text=True, timeout=1200,
        env={"PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": str(pathlib.Path.home()),
             "SGNT_SMOKE_PORT": "12431"})
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-3000:])
    assert "MULTIHOST SMOKE OK" in r.stdout, r.stdout[-2000:]
