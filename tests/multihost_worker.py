"""Worker for the 2-process multi-host test (run via test_multihost.py).

Each process owns 4 virtual CPU devices (8 global), builds the same
(data=8, model=1) mesh, feeds its *local* half of the global batch through
ForwardTrainer.shard_batch (which assembles the global array via
make_array_from_process_local_data), and runs two training steps. Prints
the final loss — both processes must agree (the gradient all-reduce spans
processes).
"""
import os
import sys

proc_id = int(sys.argv[1])
coord = sys.argv[2]

os.environ['JAX_PLATFORMS'] = 'cpu'
os.environ['XLA_FLAGS'] = (os.environ.get('XLA_FLAGS', '')
                           + ' --xla_force_host_platform_device_count=4').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=proc_id)

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from transformertts_tpu.models.forward_tts import ForwardTransformer  # noqa: E402
from transformertts_tpu.parallel import MeshConfig, make_mesh  # noqa: E402
from transformertts_tpu.training import ForwardTrainer, make_optimizer  # noqa: E402

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

model = ForwardTransformer(
    encoder_model_dimension=32, decoder_model_dimension=32, dropout_rate=0.1,
    decoder_num_heads=[2], encoder_num_heads=[2],
    encoder_max_position_encoding=500, decoder_max_position_encoding=1000,
    encoder_dense_blocks=1, decoder_dense_blocks=1,
    duration_conv_filters=[16, 8], pitch_conv_filters=[16, 8],
    duration_kernel_size=3, pitch_kernel_size=3, predictors_dropout=0.1,
    mel_channels=20, phoneme_language='en-us', with_stress=False,
    model_breathing=False, encoder_attention_conv_filters=None,
    decoder_attention_conv_filters=None, encoder_attention_conv_kernel=3,
    decoder_attention_conv_kernel=3, encoder_feed_forward_dimension=32,
    decoder_feed_forward_dimension=32)

mesh = make_mesh(MeshConfig(data=8, model=1))
trainer = ForwardTrainer(model, make_optimizer([(0.0, 1e-4)]), mesh=mesh)
state = trainer.init_state(jax.random.PRNGKey(0))

# deterministic GLOBAL batch; each process feeds its local half
rng = np.random.default_rng(0)
B, n_tok, n_frames = 16, 8, 32
tokens = np.zeros((B, n_tok), np.int32)
tokens[:, :6] = rng.integers(1, 40, size=(B, 6))
durations = np.zeros((B, n_tok), np.float32)
durations[:, :6] = rng.integers(1, 5, size=(B, 6)).astype(np.float32)
mel = np.zeros((B, n_frames, 20), np.float32)
for i in range(B):
    t = int(durations[i].sum())
    mel[i, :t] = rng.standard_normal((t, 20)).astype(np.float32)
pitch = np.zeros((B, n_tok), np.float32)
pitch[:, :6] = rng.standard_normal((B, 6)).astype(np.float32)

lo, hi = (0, B // 2) if proc_id == 0 else (B // 2, B)
local = {'tokens': tokens[lo:hi], 'mel': mel[lo:hi],
         'durations': durations[lo:hi], 'pitch': pitch[lo:hi]}

for _ in range(2):
    state, aux = trainer.train_step(state, local)
loss = float(aux['loss'])
assert np.isfinite(loss)
print(f'proc {proc_id} loss {loss:.6f}', flush=True)
jax.distributed.shutdown()
