"""Two-process multi-host training over jax.distributed (CPU backend).

The TPU-native analogue of multi-worker DP: each process owns half the
global devices and feeds its local batch slice; the gradient all-reduce
spans processes via the coordination service. Slow-ish (two fresh JAX
processes + compile), so it lives in the slow group.
"""
import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(('127.0.0.1', 0))
        return s.getsockname()[1]


def test_two_process_distributed_training():
    coord = f'127.0.0.1:{_free_port()}'
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    procs = [subprocess.Popen(
        [sys.executable, str(REPO / 'tests' / 'multihost_worker.py'),
         str(i), coord],
        cwd=REPO, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=420)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        assert p.returncode == 0, (out[-1000:], err[-3000:])
        outs.append(out)
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if 'loss' in l][-1]
        losses.append(float(line.rsplit(' ', 1)[-1]))
    # the all-reduce spans processes: both replicas must hold the same loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-6)
