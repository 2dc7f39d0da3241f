"""Two-process jax.distributed CPU test (VERDICT r1 item 7): the
``process_count > 1`` branch of parallel/distributed.py actually executes —
host-scalar/array allreduce and a metric ``compute()`` produce GLOBAL values
across processes (SURVEY §2.3 communication backend; the reference declared
torchmetrics dist_reduce_fx='sum' states but never ran distributed)."""

from __future__ import annotations

import os
import socket
import subprocess
import sys
from pathlib import Path

_WORKER = """
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(
    coordinator_address=sys.argv[1], num_processes=2, process_id=int(sys.argv[2])
)
import numpy as np
from sonicdiffusionbayeslab_tpu.parallel.distributed import all_sum_array, all_sum_scalar
from sonicdiffusionbayeslab_tpu.metrics.metrics import TimeMetric

pid = jax.process_index()
assert jax.process_count() == 2, jax.process_count()

s = all_sum_scalar(float(pid + 1))            # 1 + 2 = 3
a = all_sum_array(np.full(3, pid + 1.0))      # elementwise 3
m = TimeMetric()
m.update(2.0 * (pid + 1), 2)                  # global: 6 s over 4 images
c = m.compute()
print(f"RESULT pid={pid} scalar={s} array={a.tolist()} sec_per_image={c}", flush=True)
assert s == 3.0, s
assert np.allclose(a, 3.0), a
assert abs(c - 1.5) < 1e-9, c
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_global_reduction():
    addr = f"localhost:{_free_port()}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # Per-process single CPU device is enough; drop the 8-device forcing the
    # test session sets for mesh tests.
    env.pop("XLA_FLAGS", None)
    repo = str(Path(__file__).parent.parent)
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, str(i)],
            env=env, cwd=repo, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    assert any("RESULT pid=0 scalar=3.0" in o for o in outs), outs
    assert any("RESULT pid=1 scalar=3.0" in o for o in outs), outs
