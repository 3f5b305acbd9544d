"""tpu-transformer-tts: a TPU-native (JAX/XLA/Pallas/pjit) text-to-speech framework.

Re-implements the full capability surface of as-ideas/TransformerTTS
(reference layout documented in SURVEY.md) as an idiomatic JAX framework:

- ``models.ForwardTransformer`` — non-autoregressive FastSpeech2/FastPitch-style
  synthesis model (the inference model).
- ``models.Aligner`` — autoregressive attention teacher used to extract
  phoneme durations.
- ``audio.Audio`` — config-driven DSP frontend (mel spectrograms, Griffin-Lim
  reconstruction, pitch extraction) running on-device.
- ``text.TextToTokens`` — host-side phonemization + IPA tokenization.
- ``models.factory.tts_ljspeech`` / ``tts_custom`` / ``aligner_custom`` —
  pretrained/checkpoint loading API.

Public API mirrors the reference (README.md:83-93 of the reference repo):

    from transformertts_tpu.models import ForwardTransformer
    from transformertts_tpu.audio import Audio
    model = ForwardTransformer.load_model('/path/to/model_dir')
    audio = Audio.from_config(model.config)
    out = model.predict('Please, say something.')
    wav = audio.reconstruct_waveform(out['mel'])
"""

__version__ = '0.1.0'
