"""Multi-host (jax.distributed) layer test — SURVEY §5.8 / §2.11.

Spawns a real 2-process CPU cluster (coordinator + DCN-style allgather)
and checks sharded decode + global manifest + measured scaling
efficiency.  Slow tier: the workers decode through interpret-mode
kernels.
"""

import subprocess
import sys

import pytest

from debigulator_tpu.native import scanner as ns


@pytest.mark.slow
@pytest.mark.skipif(not ns.available(), reason="native library required")
def test_two_process_cluster_decode():
    r = subprocess.run(
        [sys.executable, "-m", "debigulator_tpu.parallel.multihost"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "MULTIHOST OK" in r.stdout
    eff = float(r.stdout.rsplit("scaling_efficiency=", 1)[1].split()[0])
    # Emulated ≥80% BASELINE target: the decode window (startup excluded)
    # covers decode + DCN allgather; same total silicon, so ideal == 1.0
    # and the gate bounds the distributed machinery's cost at 20%.
    assert eff >= 0.8, f"scaling efficiency {eff} below the 0.80 target"
