"""Multi-host input pipeline: a real 2-process CPU cluster (Gloo) proving
per-rank disjoint sampler stripes + ``make_array_from_process_local_data``
assembly + one SPMD surgery step with identical results on every process
(reference DDP semantics, ``infinite_sampler.py:5-13`` / SURVEY §2.8).
"""

import os
import re
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_input_pipeline():
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    port = _free_port()
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    procs = [
        subprocess.Popen([sys.executable, worker, str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env)
        for pid in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out)
        assert p.returncode == 0, f"worker failed:\n{out[-3000:]}"
    # both processes computed the SAME global update (SPMD determinism)
    results = {}
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=(\d) w=([-\d.]+) norm_a=([-\d.]+)", out)
        assert m, out[-2000:]
        results[m.group(1)] = (m.group(2), m.group(3))
    assert results["0"] == results["1"], results
