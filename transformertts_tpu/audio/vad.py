"""Voice activity detection for long-silence trimming.

The reference uses the webrtcvad C library over 30 ms windows with a moving
average + binary dilation smoothing (data/audio.py:172-194). webrtcvad's GMM
classifier is replaced by an adaptive log-energy detector over the same
window/smoothing structure, with the same config knobs
(vad_window_length ms, vad_moving_average_width, vad_max_silence_length).
Offline preprocessing only — pure NumPy.
"""
import numpy as np


def _moving_average(array: np.ndarray, width: int) -> np.ndarray:
    """Centered running mean with zero boundary handling.

    Output i averages array[i-(width-1)//2 .. i+width//2] — the same window
    alignment the reference smoothing uses (data/audio.py:185-191), expressed
    as a convolution: that window ends at full-conv index i + width//2.
    """
    summed = np.convolve(np.asarray(array, dtype=float), np.ones(width),
                         mode='full')
    return summed[width // 2:width // 2 + len(array)] / width


def _binary_dilation(mask: np.ndarray, width: int) -> np.ndarray:
    """1-D binary dilation with a flat structuring element of ``width``."""
    if width <= 1:
        return mask
    kernel = np.ones(width)
    conv = np.convolve(mask.astype(float), kernel, mode='same')
    return conv > 0


def adaptive_threshold_db(rms: np.ndarray, ref: float,
                          fallback_db: float = -48.0) -> float:
    """Bimodal energy threshold relative to the p95 level.

    The noise floor is the 10th-percentile window RMS. When the floor sits
    clearly below the speech level (>12 dB gap) the threshold is the
    midpoint between the two, clamped to [-48, -12] dB — so noisy silences
    (recording hiss well above -48 dBFS, which a fixed gate keeps) are still
    trimmed. Without a clear gap (clip is all speech, or SNR too low for an
    energy gate to separate safely) the conservative ``fallback_db`` gate
    applies and only near-digital silence is removed.
    """
    floor_db = 20.0 * np.log10((np.percentile(rms, 10) + 1e-12) / ref)
    if floor_db <= -12.0:
        return float(np.clip(floor_db / 2.0, -48.0, -12.0))
    return fallback_db


def detect_voice_flags(wav: np.ndarray, sampling_rate: int,
                       window_ms: int, energy_threshold_db: float = -48.0) -> np.ndarray:
    """Per-window speech flags from adaptive log-energy.

    A window is speech if its RMS is above an adaptive threshold (see
    :func:`adaptive_threshold_db`) relative to the 95th-percentile window
    RMS (robust to overall level); ``energy_threshold_db`` is the fallback
    gate when the clip has no clear silence mode.
    """
    samples_per_window = (window_ms * sampling_rate) // 1000
    n_windows = len(wav) // samples_per_window
    if n_windows == 0:
        return np.ones(0, dtype=bool)
    frames = wav[:n_windows * samples_per_window].reshape(n_windows, samples_per_window)
    rms = np.sqrt(np.mean(frames ** 2, axis=-1) + 1e-12)
    ref = np.percentile(rms, 95) + 1e-12
    db = 20.0 * np.log10(rms / ref)
    return db > adaptive_threshold_db(rms, ref, energy_threshold_db)


def trim_long_silences(wav: np.ndarray, sampling_rate: int, window_ms: int,
                       moving_average_width: int, max_silence_length: int,
                       energy_threshold_db: float = -48.0) -> np.ndarray:
    """Remove long internal silences; mirrors the reference smoothing chain
    (moving-average of voice flags → round → dilation → sample mask).

    Uses the native C++ implementation (native/csrc/native_ops.cpp) when
    built; byte-identical to the NumPy path below."""
    samples_per_window = (window_ms * sampling_rate) // 1000
    wav = wav[:len(wav) - (len(wav) % samples_per_window)]
    if len(wav) == 0:
        return wav
    try:
        from transformertts_tpu import native
        if native.available():
            mask = native.vad_long_silence_mask(
                np.asarray(wav, np.float32), sampling_rate, window_ms,
                moving_average_width, max_silence_length,
                energy_threshold_db)
            return wav[mask]
    except Exception:
        pass
    voice_flags = detect_voice_flags(wav, sampling_rate, window_ms,
                                     energy_threshold_db).astype(float)
    audio_mask = _moving_average(voice_flags, moving_average_width)
    audio_mask = np.round(audio_mask).astype(bool)
    audio_mask = _binary_dilation(audio_mask, max_silence_length + 1)
    audio_mask = np.repeat(audio_mask, samples_per_window)
    return wav[audio_mask]


def trim_silence_top_db(wav: np.ndarray, top_db: float, frame_length: int = 256,
                        hop_length: int = 64) -> np.ndarray:
    """Leading/trailing silence trim (librosa.effects.trim semantics:
    drop edges quieter than ``top_db`` below the peak RMS)."""
    if len(wav) < frame_length:
        return wav
    n_frames = 1 + (len(wav) - frame_length) // hop_length
    idx = np.arange(frame_length)[None, :] + hop_length * np.arange(n_frames)[:, None]
    rms = np.sqrt(np.mean(wav[idx] ** 2, axis=-1) + 1e-12)
    ref = np.max(rms) + 1e-12
    db = 20.0 * np.log10(rms / ref)
    non_silent = np.where(db > -top_db)[0]
    if len(non_silent) == 0:
        return wav[:0]
    start = non_silent[0] * hop_length
    end = min(len(wav), non_silent[-1] * hop_length + frame_length)
    return wav[start:end]
