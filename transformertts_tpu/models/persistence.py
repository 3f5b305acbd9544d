"""Shared model persistence: self-describing checkpoint dirs.

Both models write the same layout as the reference save_model
(model/models.py:600-638): ``config.yaml`` (full constructor config +
alphabet + step + git hash) plus weights — native ``model_weights.npz``
and/or the legacy Keras-2 ``model_weights.hdf5`` the reference TF code can
``load_weights`` (two-way interop).
"""
import subprocess
from pathlib import Path

import numpy as np
import yaml

from transformertts_tpu.utils.pytree import flatten_params, unflatten_params


def make_config(locals_: dict, kwargs: dict) -> dict:
    """Constructor args ARE the schema (reference model/models.py:117-125)."""
    config = {}
    keys = [k for k in locals_.keys()
            if (k not in kwargs) and (k not in ('self', '__class__', 'kwargs'))]
    for k in keys:
        if isinstance(locals_[k], dict):
            config.update(locals_[k])
        else:
            config[k] = locals_[k]
    config.update(kwargs)
    return config


def save_model_dir(model, path, weights_format: str = 'npz') -> Path:
    """config.yaml + weights under ``path``.

    weights_format: 'npz' (native), 'hdf5' (legacy Keras-2 layout the
    reference TF code loads), or 'both'.
    """
    if weights_format not in ('npz', 'hdf5', 'both'):
        raise ValueError(f'unknown weights_format {weights_format!r}')
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    config = dict(model.config)
    config['alphabet'] = ''.join(model.symbols)
    config['step'] = int(model.step)
    try:
        config['git_hash'] = subprocess.check_output(
            ['git', 'describe', '--always']).strip().decode()
    except Exception:
        pass
    with open(path / 'config.yaml', 'w') as f:
        yaml.safe_dump(config, f, allow_unicode=True)
    if weights_format in ('npz', 'both'):
        # ONE batched device→host fetch: np.savez would np.asarray each leaf
        # separately, costing a full network round trip PER PARAMETER on
        # remote-dispatch backends (minutes for a real model — measured in
        # scripts/measure_dispatch_breakdown.py: ~35 ms per fetch)
        import jax
        params_h = jax.device_get(model.params)
        np.savez(path / 'model_weights.npz', **flatten_params(params_h))
    if weights_format in ('hdf5', 'both'):
        from transformertts_tpu.models.convert import write_legacy_h5
        write_legacy_h5(model, path / 'model_weights.hdf5')
    return path


def load_model_dir(cls, path):
    """Rebuild a model of type ``cls`` from a self-describing dir (native
    npz, or an hdf5-only dir — our legacy export or a reference artifact)."""
    path = Path(path)
    with open(path / 'config.yaml') as f:
        config = yaml.safe_load(f)
    model = cls.from_config(config)
    npz = path / 'model_weights.npz'
    if npz.exists():
        with np.load(npz) as data:
            model.params = unflatten_params({k: data[k] for k in data.files})
    else:
        from transformertts_tpu.models.convert import (
            load_reference_weights_into)
        h5s = sorted(path.glob('*.hdf5')) + sorted(path.glob('*.h5'))
        if not h5s:
            raise FileNotFoundError(f'no model weights under {path}')
        load_reference_weights_into(model, h5s[0])
    model.step = int(config.get('step', 0))
    return model
