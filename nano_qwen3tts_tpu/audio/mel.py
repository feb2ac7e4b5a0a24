"""Mel spectrogram (numpy) for the speaker-encoder input path.

Parity with reference interface.py:591-640 (_mel_spectrogram): torch.stft
with hann window, reflect padding of (n_fft - hop)/2, center=False,
magnitude sqrt(re^2 + im^2 + 1e-9), then a librosa-style (Slaney-scale,
slaney-normalized) mel filterbank. Implemented with numpy rfft — no
librosa/torch dependency.
"""

from __future__ import annotations

import numpy as np


def hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    f_safe = np.maximum(f, 1e-10)  # avoid log(0) in the unused branch
    return np.where(
        f >= min_log_hz, min_log_mel + np.log(f_safe / min_log_hz) / logstep, mel
    )


def mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    f = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f
    )


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """librosa.filters.mel equivalent (htk=False, norm='slaney'). [n_mels, 1+n_fft//2]."""
    fmax = fmax or sr / 2
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = np.linspace(hz_to_mel_slaney(fmin), hz_to_mel_slaney(fmax), n_mels + 2)
    hz_pts = mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def stft_magnitude(
    y: np.ndarray, n_fft: int, hop: int, win: int
) -> np.ndarray:
    """|STFT| with hann window, reflect-padded by (n_fft-hop)//2, center=False.

    Returns [freq_bins, frames].
    """
    pad = (n_fft - hop) // 2
    y = np.pad(y, (pad, pad), mode="reflect")
    window = np.hanning(win + 1)[:-1].astype(np.float32)  # periodic hann
    n_frames = 1 + (len(y) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    frames = y[idx] * window[None, :]
    spec = np.fft.rfft(frames, n=n_fft, axis=1)
    return np.sqrt(spec.real**2 + spec.imag**2 + 1e-9).T.astype(np.float32)


def mel_spectrogram(
    y: np.ndarray,
    n_fft: int = 1024,
    num_mels: int = 128,
    sampling_rate: int = 24000,
    hop_size: int = 256,
    win_size: int = 1024,
    fmin: float = 0,
    fmax: float = 12000,
) -> np.ndarray:
    """[num_mels, frames] mel magnitude spectrogram (speaker-encoder input)."""
    basis = mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax)
    return basis @ stft_magnitude(np.asarray(y, np.float32), n_fft, hop_size, win_size)
