"""WAV I/O and PCM utilities — stdlib + numpy (no soundfile/librosa in this
environment; replaces their uses in reference utils/audio.py and
examples/server.py:338-361)."""

from __future__ import annotations

import io
import wave

import numpy as np


def write_wav(path_or_buf, wav: np.ndarray, sample_rate: int):
    """Write mono float waveform [-1, 1] as 16-bit PCM WAV."""
    pcm = float_to_pcm16(wav)
    f = wave.open(path_or_buf, "wb")
    try:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sample_rate)
        f.writeframes(pcm.tobytes())
    finally:
        f.close()


def read_wav(path_or_buf) -> tuple[np.ndarray, int]:
    """Read a WAV file -> (float32 mono waveform, sample_rate)."""
    f = wave.open(path_or_buf, "rb")
    try:
        sr = f.getframerate()
        n = f.getnframes()
        ch = f.getnchannels()
        width = f.getsampwidth()
        raw = f.readframes(n)
    finally:
        f.close()
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported sample width {width}")
    if ch > 1:
        x = x.reshape(-1, ch).mean(axis=1)
    return x, sr


def wav_bytes_to_float(data: bytes) -> tuple[np.ndarray, int]:
    return read_wav(io.BytesIO(data))


def float_to_pcm16(wav: np.ndarray) -> np.ndarray:
    """Clip to [-1, 1] and convert to int16 (server.py:356-361 semantics)."""
    return np.round(
        np.clip(np.asarray(wav, np.float32), -1.0, 1.0) * 32767.0
    ).astype("<i2")


def resample(wav: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    """Band-limited-ish resample via polyphase linear interpolation.

    Good enough for the 24k->24k no-op common case and the speaker-encoder
    input path; the codec operates natively at 24 kHz.
    """
    if orig_sr == target_sr:
        return np.asarray(wav, np.float32)
    n_out = int(round(len(wav) * target_sr / orig_sr))
    t_out = np.arange(n_out, dtype=np.float64) * (orig_sr / target_sr)
    return np.interp(t_out, np.arange(len(wav)), wav).astype(np.float32)
