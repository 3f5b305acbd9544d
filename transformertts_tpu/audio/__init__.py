"""Config-driven audio frontend.

Public surface mirrors the reference ``Audio`` class (data/audio.py:14-198):
``mel_spectrogram``, ``reconstruct_waveform``, ``extract_pitch``,
``load_wav``/``preprocess``/``save_wav``, ``display_mel``, ``from_config`` and
the MelGAN/WaveRNN normalizers selected by name. The compute paths are
device-native: STFT+mel as GEMMs on the MXU, Griffin-Lim as a jitted loop,
pitch as a batched YIN kernel. Wav I/O, volume normalization and silence
trimming stay host-side (offline preprocessing boundary, as in the
reference).
"""
import sys

import jax.numpy as jnp
import numpy as np

from transformertts_tpu.audio import spectral, griffinlim, pitch, vad, wav_io

__all__ = ['Audio', 'Normalizer', 'MelGAN', 'WaveRNN']


class Normalizer:
    def normalize(self, S):
        raise NotImplementedError

    def denormalize(self, S):
        raise NotImplementedError


class MelGAN(Normalizer):
    """log-mel with 1e-5 amplitude floor (reference: data/audio.py:209-219)."""

    def __init__(self):
        self.clip_min = 1.0e-5

    def normalize(self, S):
        xp = jnp if isinstance(S, jnp.ndarray) else np
        return xp.log(xp.clip(S, self.clip_min, None))

    def denormalize(self, S):
        xp = jnp if isinstance(S, jnp.ndarray) else np
        return xp.exp(S)


class WaveRNN(Normalizer):
    """dB-scaled mel in [-4, 4] (reference: data/audio.py:222-242)."""

    def __init__(self):
        self.min_level_db = -100
        self.max_norm = 4

    def normalize(self, S):
        xp = jnp if isinstance(S, jnp.ndarray) else np
        S = 20 * xp.log10(xp.maximum(1e-5, S))
        S = xp.clip((S - self.min_level_db) / -self.min_level_db, 0, 1)
        return (S * 2 * self.max_norm) - self.max_norm

    def denormalize(self, S):
        xp = jnp if isinstance(S, jnp.ndarray) else np
        S = (S + self.max_norm) / (2 * self.max_norm)
        S = (xp.clip(S, 0, 1) * -self.min_level_db) + self.min_level_db
        return xp.power(10.0, S * 0.05)


class Audio:

    def __init__(self,
                 sampling_rate: int,
                 n_fft: int,
                 mel_channels: int,
                 hop_length: int,
                 win_length: int,
                 f_min: int,
                 f_max: int,
                 normalizer: str,
                 norm_wav: bool = None,
                 target_dBFS: int = None,
                 int16_max: int = None,
                 trim_long_silences: bool = None,
                 trim_silence: bool = None,
                 trim_silence_top_db: int = None,
                 vad_window_length: int = None,
                 vad_sample_rate: int = None,
                 vad_moving_average_width: int = None,
                 vad_max_silence_length: int = None,
                 griffin_lim_iters: int = 32,
                 **kwargs):
        self.config = self._make_config(locals())
        self.sampling_rate = sampling_rate
        self.n_fft = n_fft
        self.mel_channels = mel_channels
        self.hop_length = hop_length
        self.win_length = win_length
        self.f_min = f_min
        self.f_max = f_max
        self.norm_wav = norm_wav
        self.target_dBFS = target_dBFS
        self.int16_max = int16_max
        self.trim_long_silences = trim_long_silences
        self.trim_silence = trim_silence
        self.trim_silence_top_db = trim_silence_top_db
        self.vad_window_length = vad_window_length
        self.vad_sample_rate = vad_sample_rate
        self.vad_moving_average_width = vad_moving_average_width
        self.vad_max_silence_length = vad_max_silence_length
        self.griffin_lim_iters = griffin_lim_iters
        self.normalizer = getattr(sys.modules[__name__], normalizer)()

    def _make_config(self, locals_) -> dict:
        config = {}
        for k in locals_:
            if k in ('self', '__class__'):
                continue
            if isinstance(locals_[k], dict):
                config.update(locals_[k])
            else:
                config[k] = locals_[k]
        return config

    # --- feature extraction (device) ---------------------------------------

    def _normalize(self, S):
        return self.normalizer.normalize(S)

    def _denormalize(self, S):
        return self.normalizer.denormalize(S)

    def mel_spectrogram(self, wav) -> np.ndarray:
        """Waveform → normalized log-mel (n_frames, mel_channels).

        This is what the models are trained to reproduce.
        """
        mel = spectral.mel_spectrogram(
            jnp.asarray(wav, jnp.float32), self.sampling_rate, self.n_fft,
            self.hop_length, self.win_length, self.mel_channels,
            self.f_min, self.f_max)
        return np.asarray(self._normalize(mel))

    def mel_spectrogram_batch(self, wavs: jnp.ndarray) -> jnp.ndarray:
        """Batched device path for the preprocessing job: (B, T) → (B, F, M)."""
        mel = spectral.mel_spectrogram(
            wavs.astype(jnp.float32), self.sampling_rate, self.n_fft,
            self.hop_length, self.win_length, self.mel_channels,
            self.f_min, self.f_max)
        return self._normalize(mel)

    def log_mel_batch_centered(self, wavs_centered: jnp.ndarray) -> jnp.ndarray:
        """Normalized mel for center-pre-padded batched wavs (B, T+n_fft).

        Dispatches to the fused Pallas frontend kernel when the normalizer is
        the MelGAN log (whose clip+log is fused into the kernel); otherwise
        runs the GEMM-native jnp path + normalizer.
        """
        if isinstance(self.normalizer, MelGAN):
            from transformertts_tpu.ops.stft_pallas import fused_log_mel
            return fused_log_mel(
                wavs_centered, self.sampling_rate, self.n_fft,
                self.hop_length, self.win_length, self.mel_channels,
                self.f_min, self.f_max, clip_min=self.normalizer.clip_min)
        mel = spectral.mel_spectrogram(
            wavs_centered.astype(jnp.float32), self.sampling_rate, self.n_fft,
            self.hop_length, self.win_length, self.mel_channels,
            self.f_min, self.f_max, center=False)
        return self._normalize(mel)

    def reconstruct_waveform(self, mel, n_iter: int = None) -> np.ndarray:
        """Normalized log-mel (n_frames, mel_channels) → waveform via
        pseudo-inverse mel + on-device Griffin-Lim."""
        n_iter = n_iter if n_iter is not None else self.griffin_lim_iters
        mel = jnp.asarray(mel, jnp.float32)
        if mel.ndim == 2 and mel.shape[0] == self.mel_channels:
            mel = mel.T  # accept (mels, frames) like the reference
        # Griffin-Lim's internal STFT needs n_fft//hop frames of signal for
        # its reflect centering; edge-pad degenerate (untrained-model) mels
        min_frames = max(self.n_fft // self.hop_length, 2)
        if mel.shape[0] < min_frames:
            mel = jnp.concatenate(
                [mel] + [mel[-1:]] * (min_frames - mel.shape[0]), axis=0)
        amp = self._denormalize(mel)
        S = griffinlim.mel_to_linear(amp, self.sampling_rate, self.n_fft,
                                     self.f_min, self.f_max)
        wav = griffinlim.griffin_lim(S, n_iter, self.n_fft, self.hop_length,
                                     self.win_length)
        return np.asarray(wav)

    def reconstruct_waveform_batch(self, mels, n_iter: int = None) -> np.ndarray:
        """Batched Griffin-Lim: (B, n_frames, mel_channels) normalized log-mel
        → (B, T) waveforms, one vmapped device call."""
        import jax
        n_iter = n_iter if n_iter is not None else self.griffin_lim_iters
        mels = jnp.asarray(mels, jnp.float32)
        # degenerate (untrained-model) mels: Griffin-Lim's padded-domain
        # iteration needs n_fft//hop frames; edge-pad like the single path
        min_frames = max(self.n_fft // self.hop_length, 2)
        if mels.shape[1] < min_frames:
            reps = min_frames - mels.shape[1]
            mels = jnp.concatenate(
                [mels, jnp.repeat(mels[:, -1:], reps, axis=1)], axis=1)
        amp = self._denormalize(mels)
        S = griffinlim.mel_to_linear(amp, self.sampling_rate, self.n_fft,
                                     self.f_min, self.f_max)
        gl = jax.vmap(lambda s: griffinlim.griffin_lim(
            s, n_iter, self.n_fft, self.hop_length, self.win_length))
        return np.asarray(gl(S))

    def extract_pitch(self, y) -> np.ndarray:
        """Frame-aligned F0 (same length as the mel spectrogram)."""
        return pitch.extract_pitch_np(np.asarray(y, np.float32),
                                      self.sampling_rate, self.hop_length)

    # --- wav preprocessing (host, offline) ----------------------------------

    def load_wav(self, wav_path, preprocess=True):
        y, sr = wav_io.load_wav(wav_path, self.sampling_rate)
        if preprocess:
            y = self.preprocess(y)
        return y, sr

    def preprocess(self, y: np.ndarray) -> np.ndarray:
        """Offline wav cleanup: level → silence policy → hop alignment.

        Same pipeline and config gates as the reference
        (data/audio.py:131-140).
        """
        stages = (
            (self.norm_wav,
             lambda w: self.normalize_volume(w, increase_only=True)),
            (self.trim_long_silences, self.trim_audio_long_silences),
            (self.trim_silence, self.trim_audio_silence),
        )
        for enabled, stage in stages:
            if enabled:
                y = stage(y)
        # a clip landing exactly on a hop boundary gains one sample so the
        # STFT frame count is unambiguous
        if y.shape[0] % self.hop_length == 0:
            y = np.pad(y, (0, 1))
        return y

    def save_wav(self, y, wav_path):
        wav_io.save_wav(np.asarray(y), wav_path, self.sampling_rate)

    def normalize_volume(self, wav, increase_only=False, decrease_only=False):
        """Scale the clip toward ``target_dBFS`` (policy as in the reference,
        data/audio.py:153-161 — there the int16 scale cancels out of the RMS
        ratio, so dBFS reduces to the plain log-RMS of the float wav)."""
        if increase_only and decrease_only:
            raise ValueError('increase_only and decrease_only are exclusive')
        rms = np.sqrt(np.mean(np.square(wav)))
        gain_db = self.target_dBFS - 20.0 * np.log10(rms + 1e-12)
        if (gain_db < 0 and increase_only) or (gain_db > 0 and decrease_only):
            return wav
        return wav * 10.0 ** (gain_db / 20.0)

    def trim_audio_silence(self, wav):
        return vad.trim_silence_top_db(wav, self.trim_silence_top_db,
                                       frame_length=256, hop_length=64)

    def trim_audio_long_silences(self, wav):
        return vad.trim_long_silences(
            wav, self.sampling_rate, self.vad_window_length,
            self.vad_moving_average_width, self.vad_max_silence_length)

    # --- plots ---------------------------------------------------------------

    def display_mel(self, mel, is_normal=True):
        import matplotlib
        matplotlib.use('Agg')
        from matplotlib import pyplot as plt
        if is_normal:
            mel = self._denormalize(np.asarray(mel))
        mel = np.asarray(mel)
        if mel.shape[0] != self.mel_channels:
            mel = mel.T
        f = plt.figure(figsize=(10, 4))
        s_db = 20.0 * np.log10(np.maximum(mel, 1e-10) / np.max(mel))
        plt.imshow(s_db, origin='lower', aspect='auto', cmap='magma')
        plt.xlabel('frames')
        plt.ylabel('mel bins')
        return f

    @classmethod
    def from_config(cls, config: dict):
        return cls(**config)
