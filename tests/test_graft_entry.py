"""Driver-contract tests: __graft_entry__ must be hermetic.

Round-1 failure mode: dryrun_multichip eagerly dispatched PRNGKey /
convert_element_type to the ambient TPU plugin backend and died on a libtpu
version mismatch (MULTICHIP_r01.json ok=false).  These tests run the entry
points in a *subprocess with the ambient environment* (no JAX_PLATFORMS=cpu
from conftest) so regressions surface the same way the driver would see them.
"""
import os
import subprocess
import sys

import jax
import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_dryrun_multichip_in_process():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_dryrun_multichip_subprocess_ambient_env():
    """Exactly what the driver does: fresh process, ambient env, no CPU
    forcing from outside.  Must not touch any non-CPU backend."""
    env = dict(os.environ)
    env.pop('XLA_FLAGS', None)
    env.pop('JAX_PLATFORMS', None)
    out = subprocess.run(
        [sys.executable, '-c',
         'import __graft_entry__ as g; g.dryrun_multichip(8)'],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=480)
    assert out.returncode == 0, out.stderr[-2000:]
    # all three SPMD surfaces must report OK (VERDICT r2 item 5)
    assert 'dryrun_multichip(8) forward-train OK' in out.stdout
    assert 'dryrun_multichip(8) aligner-train OK' in out.stdout
    assert 'dryrun_multichip(8) serving OK' in out.stdout


def test_entry_compiles():
    fn, args = __import__('__graft_entry__').entry()
    mel = jax.jit(fn)(*args)
    assert mel.shape[0] == 4 and mel.shape[-1] == 80
    assert np.all(np.isfinite(np.asarray(mel)))
