"""Shared CLI plumbing (reference: utils/scripts_utils.py:20-29)."""
import argparse


def basic_train_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument('--config', type=str, required=True,
                        help='path to session YAML config')
    parser.add_argument('--reset_dir', action='store_true',
                        help='delete logs AND weights for this session')
    parser.add_argument('--reset_logs', action='store_true')
    parser.add_argument('--reset_weights', action='store_true')
    parser.add_argument('--yes', action='store_true',
                        help='skip interactive reset confirmations')
    return parser


def print_devices():
    import jax
    devices = jax.devices()
    print(f'devices: {len(devices)} × {devices[0].device_kind}'
          if devices else 'no devices')


def apply_platform_env():
    """Make ``JAX_PLATFORMS`` effective even when an ambient PJRT plugin
    (e.g. a sitecustomize-registered TPU backend) overrides the env var
    after import: re-apply it through jax.config, which wins. No-op when
    the variable is unset or backends are already initialized."""
    import os
    import jax
    plat = os.environ.get('JAX_PLATFORMS')
    if plat:
        try:
            jax.config.update('jax_platforms', plat)
        except Exception:
            pass


def enable_compilation_cache(path: str = None):
    """Persistent XLA compilation cache: first compiles of each executable
    are reused across runs — critical when compiles go through a remote
    service (minutes each). Also applies ``JAX_PLATFORMS`` (every CLI calls
    this first, so platform selection works under ambient PJRT plugins)."""
    import os
    import jax
    apply_platform_env()
    path = path or os.environ.get('JAX_COMPILATION_CACHE_DIR',
                                  os.path.expanduser('~/.cache/tts_tpu_xla'))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', path)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception as e:
        print(f'compilation cache unavailable: {e}')
