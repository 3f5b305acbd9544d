"""Per-device HBM traffic delta from ZeRO-1 optimizer-state sharding.

Multi-chip hardware is not reachable from this environment, so the wall-time
effect of sharding Adam m/v over the 'data' axis cannot be timed; what CAN be
measured is the thing ZeRO-1 exists to change — per-device HBM traffic. This
script compiles the published-scale ForwardTransformer train step over a
virtual 8-device ('data'=8) CPU mesh twice — ZeRO-1 (the production layout,
BaseTrainer.state_shardings) and fully-replicated moments — and reports, from
the SPMD-partitioned per-device module (scripts/hlo_bytes.py entry-traffic
model):

  - per-device fusion-boundary HBM bytes (the roofline's denominator)
  - bytes moved by collectives (the ICI side of the trade)

The batch is held small and identical across both compiles: optimizer traffic
is batch-independent, so the delta isolates the Adam m/v/p term the round-3
roofline measured at 1.47 GB/step replicated (BASELINE.md).

    XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
        python scripts/measure_zero1_traffic.py
"""
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

# force CPU even when an ambient PJRT plugin (axon tunnel) is configured:
# this is a compile-only analysis and needs 8 virtual devices
os.environ['JAX_PLATFORMS'] = 'cpu'
if 'xla_force_host_platform_device_count' not in os.environ.get('XLA_FLAGS', ''):
    os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                               + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

import numpy as np  # noqa: E402


COLLECTIVES = ('all-gather', 'all-reduce', 'reduce-scatter',
               'all-gather-start', 'all-reduce-start', 'reduce-scatter-start',
               'collective-permute', 'all-to-all')


def analyze(compiled):
    from hlo_bytes import (entry_traffic_bytes, op_traffic,
                           parse_entry_instructions)
    text = compiled.as_text()
    total = entry_traffic_bytes(text)
    instrs = parse_entry_instructions(text)
    tr = op_traffic(instrs)
    coll = defaultdict(float)
    for name, info in tr.items():
        opc = instrs[name]['opcode']
        if opc in COLLECTIVES:
            coll[opc] += info['out_bytes']
    return total, dict(coll)


def main():
    from transformertts_tpu.utils.scripts_utils import enable_compilation_cache
    enable_compilation_cache()
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    from measure_train_step import build, make_batch
    from transformertts_tpu.parallel import mesh as mesh_lib
    from transformertts_tpu.training import ForwardTrainer, make_optimizer

    assert len(jax.devices()) >= 8, 'needs the 8-device virtual CPU mesh'
    mesh = mesh_lib.make_mesh(mesh_lib.MeshConfig(data=8, model=1))

    class ReplicatedTrainer(ForwardTrainer):
        def state_shardings(self, state):
            specs = mesh_lib.tp_param_specs(state, self.mesh)  # no zero1
            return jax.tree_util.tree_map(
                lambda sp: NamedSharding(self.mesh, sp), specs,
                is_leaf=lambda x: isinstance(x, P))

    model, _, _ = build()  # published scale; its 1-dev trainer is unused
    tx = make_optimizer([(0.0, 1e-4), (1000.0, 1e-4)])
    rng = np.random.default_rng(0)
    batch = make_batch(model, 8, 16, 64, rng)

    results = {}
    for label, cls in [('zero1', ForwardTrainer),
                       ('replicated', ReplicatedTrainer)]:
        trainer = cls(model, tx, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0))
        dbatch = trainer.shard_batch(batch)
        trainer._build_steps(state)
        compiled = trainer._train_step.lower(state, dbatch).compile()
        total, coll = analyze(compiled)
        results[label] = {'per_device_gb': total / 1e9,
                          'collective_gb': {k: v / 1e9 for k, v in coll.items()}}
        print(f'{label:>11}: per-device entry traffic {total / 1e9:.3f} GB, '
              f'collectives {({k: round(v / 1e9, 3) for k, v in coll.items()})}')

    n_params = sum(int(np.prod(x.shape)) for x in
                   jax.tree_util.tree_leaves(
                       model.init_params(jax.random.PRNGKey(0))))
    delta = (results['replicated']['per_device_gb']
             - results['zero1']['per_device_gb'])
    results['delta_gb'] = delta
    results['n_params_m'] = n_params / 1e6
    print(f'params {n_params / 1e6:.1f} M; ZeRO-1 saves {delta:.3f} GB '
          f'of per-device HBM traffic per step on data=8')
    print(json.dumps(results))


if __name__ == '__main__':
    main()
