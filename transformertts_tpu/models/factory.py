"""Pretrained / custom model loading API (reference: model/factory.py:10-39).

``tts_ljspeech(step)`` resolves the published LJSpeech ForwardTransformer:
1. ``$TRANSFORMERTTS_MODELS_DIR/<name>`` if present (offline cache);
2. ``~/.cache/transformertts_tpu/models/<name>``;
3. otherwise downloads the reference release zip and converts the TF hdf5
   weights into this framework's parameter pytree (requires network + h5py).

Model dirs may contain either native ``model_weights.npz`` checkpoints or
reference ``model_weights.hdf5`` files — the latter are converted on load.
"""
import os
import urllib.request
import zipfile
from pathlib import Path

import yaml

from transformertts_tpu.models.forward_tts import ForwardTransformer

_REMOTE_DIR = ('https://public-asai-dl-models.s3.eu-central-1.amazonaws.com/'
               'TransformerTTS/api_weights/bdf06b9_ljspeech/')


def _cache_dirs() -> list:
    """Lookup order: $TRANSFORMERTTS_MODELS_DIR (if set), then the home
    cache. Downloads land in the first entry."""
    dirs = []
    env = os.environ.get('TRANSFORMERTTS_MODELS_DIR')
    if env:
        dirs.append(Path(env))
    dirs.append(Path.home() / '.cache' / 'transformertts_tpu' / 'models')
    return dirs


def tts_ljspeech(step: str = '95000') -> ForwardTransformer:
    name = f'bdf06b9_ljspeech_step_{step}'
    for cache in _cache_dirs():
        if (cache / name).exists():
            return load_model_dir(cache / name)
    cache = _cache_dirs()[0]
    model_dir = cache / name
    if not model_dir.exists():
        cache.mkdir(parents=True, exist_ok=True)
        zip_path = cache / f'{name}.zip'
        url = _REMOTE_DIR + f'{name}.zip'
        try:
            urllib.request.urlretrieve(url, zip_path)
        except Exception as e:
            raise RuntimeError(
                f'pretrained model {name} not cached at {model_dir} and '
                f'download from {url} failed ({e}). Place the model dir under '
                f'$TRANSFORMERTTS_MODELS_DIR to use it offline.') from e
        with zipfile.ZipFile(zip_path) as zf:
            zf.extractall(cache)
    return load_model_dir(model_dir)


def load_model_dir(model_dir) -> ForwardTransformer:
    """Load a self-describing model dir (native npz or reference hdf5)."""
    model_dir = Path(model_dir)
    if (model_dir / 'model_weights.npz').exists():
        return ForwardTransformer.load_model(model_dir)
    if any(model_dir.glob('*.hdf5')) or any(model_dir.glob('*.h5')):
        # reference artifacts may carry other weight names; the converter
        # prefers the canonical model_weights.hdf5 and sorts candidates
        from transformertts_tpu.models.convert import load_reference_checkpoint
        return load_reference_checkpoint(model_dir)
    raise FileNotFoundError(f'no model weights found under {model_dir}')


def _custom(model_cls, config_path, weights_path):
    with open(config_path) as f:
        config = yaml.safe_load(f)
    model = model_cls.from_config(config)
    weights_path = Path(weights_path)
    if weights_path.suffix == '.npz':
        import numpy as np
        from transformertts_tpu.utils.pytree import unflatten_params
        with np.load(weights_path) as data:
            model.params = unflatten_params({k: data[k] for k in data.files})
    else:
        from transformertts_tpu.models.convert import load_reference_weights_into
        load_reference_weights_into(model, weights_path)
    return model, config


def tts_custom(config_path: str, weights_path: str):
    return _custom(ForwardTransformer, config_path, weights_path)


def aligner_custom(config_path: str, weights_path: str):
    from transformertts_tpu.models.aligner import Aligner
    return _custom(Aligner, config_path, weights_path)
