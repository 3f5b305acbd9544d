"""Test configuration: run everything on a virtual 8-device CPU mesh.

Sharding/pjit paths are exercised without TPU hardware via
``xla_force_host_platform_device_count`` (see SURVEY.md §4). The platform is
forced to CPU through jax.config because ambient PJRT plugins may override
the ``JAX_PLATFORMS`` env var after import.
"""
import os

os.environ['JAX_PLATFORMS'] = 'cpu'
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
