"""Multi-host (DCN) executed evidence.

tools/multihost_smoke.py forms a REAL 2-process JAX distributed cluster on
the CPU backend (4 virtual devices each -> 8 global, mesh (4,2)) and runs
the package's actual multi-host code paths — BatchLoader per-process
slicing + make_array_from_process_local_data staging, the sharded hybrid
train step, and train.loop.compute_embed_table's chunk-assembly/allgather
— then checks both workers against a single-process oracle.

This is the executable counterpart of the single-process multi-host unit
tests in test_data.py (which mock process_count/process_index): here
jax.process_count() really is 2. The reference has no multi-node story
(single-GPU trainer, train_hybrid.py:529-585); this covers SURVEY.md §2.7's
DCN axis.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
TOOL = REPO / "tools" / "multihost_smoke.py"


@pytest.mark.slow
def test_multihost_smoke_two_processes():
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(REPO), env.get("PYTHONPATH", "")) if p)
    r = subprocess.run([sys.executable, str(TOOL)], capture_output=True,
                       text=True, timeout=1800, env=env)
    assert r.returncode == 0, (r.stdout[-4000:], r.stderr[-2000:])
    assert '"multihost_smoke": "PASS"' in r.stdout, r.stdout[-4000:]
