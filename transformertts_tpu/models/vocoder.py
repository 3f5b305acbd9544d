"""Vocoder checkpoint loader: auto-detects the torch checkpoint family.

The reference's pretrained models are advertised as compatible with both
MelGAN (seungwonpark/melgan) and HiFi-GAN (jik876/hifi-gan)
(`/root/reference/README.md:19-22`); ``load_vocoder`` accepts either
family's checkpoint file and returns the matching TPU generator
(models/melgan.py or models/hifigan.py). HiFi-GAN topology is read from a
``config.json`` sitting next to the checkpoint when present (the jik876
release layout), else the v1 defaults apply.
"""
import json
from pathlib import Path


def unwrap_torch_checkpoint(path, allow_pickle: bool = False) -> dict:
    """torch checkpoint file → numpy state dict.

    Handles whole-module saves (``.state_dict()``), MelGAN trainer
    checkpoints (``{'model_g': sd}``) and HiFi-GAN trainer checkpoints
    (``{'generator': sd}``). The single unwrapping used by load_vocoder and
    both vocoders' ``from_torch_checkpoint``.

    Loads with ``weights_only=True`` (no arbitrary pickle execution — the
    documented seungwonpark/melgan and jik876/hifi-gan checkpoints are plain
    tensor dicts). A checkpoint that genuinely needs full unpickling (e.g. a
    whole pickled ``nn.Module``) is refused unless ``allow_pickle=True`` is
    passed explicitly — that executes code from the checkpoint file.
    """
    import pickle

    import torch
    try:
        blob = torch.load(path, map_location='cpu', weights_only=True)
    except TypeError as exc:
        # torch < 1.13 has no weights_only kwarg — the safe loader does not
        # exist there, so honour the same opt-in contract
        if not allow_pickle:
            raise ValueError(
                f'this torch build does not support '
                f'torch.load(weights_only=True) ({exc}); pass '
                f'allow_pickle=True to load {path} with full unpickling '
                f'(this executes code from the file).') from exc
        blob = torch.load(path, map_location='cpu')
    except (pickle.UnpicklingError, RuntimeError) as exc:
        # weights_only refused the content (pickled code/objects inside).
        # File-level problems (missing/corrupt/truncated: OSError, EOFError,
        # zipfile errors) propagate unchanged — allow_pickle can't fix those
        # and the advice to pass it would be misleading.
        if not allow_pickle:
            raise ValueError(
                f'{path} is not a plain tensor checkpoint '
                f'(weights_only load failed: {exc}). If you trust this '
                f'file, pass allow_pickle=True to load it with full '
                f'unpickling (this executes code from the file).') from exc
        blob = torch.load(path, map_location='cpu', weights_only=False)
    if hasattr(blob, 'state_dict'):
        blob = blob.state_dict()
    if isinstance(blob, dict) and 'model_g' in blob:     # MelGAN trainer ckpt
        blob = blob['model_g']
    if isinstance(blob, dict) and 'generator' in blob and \
            hasattr(blob['generator'], 'keys'):          # HiFi-GAN trainer ckpt
        blob = blob['generator']
    return {k: v.numpy() for k, v in blob.items()}


def load_vocoder(path, mel_channels: int = 80, allow_pickle: bool = False):
    """Load a MelGAN or HiFi-GAN torch checkpoint as a TPU generator."""
    from transformertts_tpu.models.melgan import MelGANVocoder
    from transformertts_tpu.models.hifigan import HiFiGANVocoder

    sd = unwrap_torch_checkpoint(path, allow_pickle=allow_pickle)

    if any(k.startswith('conv_pre.') for k in sd):
        cfg_path = Path(path).parent / 'config.json'
        config = None
        if cfg_path.exists():
            config = json.loads(cfg_path.read_text())
        return HiFiGANVocoder.from_torch_state_dict(
            sd, config=config, mel_channels=mel_channels)
    return MelGANVocoder.from_torch_state_dict(sd, mel_channels=mel_channels)
