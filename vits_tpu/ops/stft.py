"""STFT / linear-spectrogram / mel-spectrogram, TPU-first.

Behavioral reference: /root/reference/mel_processing.py:46-207. Semantics
matched exactly:

  * reflect-pad the waveform by (n_fft - hop)/2 on both sides
    (mel_processing.py:85-86), then a center=False STFT
  * periodic Hann window (torch.hann_window default)
  * magnitude = sqrt(re^2 + im^2 + 1e-6)  (mel_processing.py:114)
  * mel projection with a librosa-style Slaney filterbank
    (mel_processing.py:137), log compression log(clamp(x, 1e-5))
    (mel_processing.py:7-14)

TPU-first design: the reference caches the window/mel-basis in global dicts
keyed by dtype+device (mel_processing.py:42-43); under jit those are simply
constants folded into the compiled program, so the caching layer disappears.
Framing is a strided gather; the DFT runs as a real matmul against a
precomputed DFT basis so the heavy op lands on the MXU (jnp.fft.rfft lowers
to a generic FFT that is slower than a 1024-wide matmul for speech frames).
All spectral math is float32 regardless of the bf16 compute policy, mirroring
the reference's forced-fp32 autocast blocks (mel_processing.py:97-109).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# mel filterbank (librosa-compatible: htk=False, norm='slaney')
# ---------------------------------------------------------------------------


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        log_mels = min_log_mel + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mels, mels)


def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    sr: int, n_fft: int, n_mels: int, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, shape [n_mels, 1+n_fft//2].

    Matches librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with the
    default htk=False, norm='slaney' used by the reference
    (mel_processing.py:137).
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    enorm = 2.0 / (hz_pts[2 : n_mels + 2] - hz_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT via framed matmul
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _dft_basis(n_fft: int, win_length: int) -> np.ndarray:
    """Windowed real-DFT basis, shape [n_fft, 2*(1+n_fft//2)] (cos | -sin).

    frames @ basis gives [.., re..re, im..im]. The periodic Hann window is
    folded into the basis so framing + window + DFT is a single matmul.
    """
    n_freqs = 1 + n_fft // 2
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:  # torch zero-pads the window symmetrically
        pad = (n_fft - win_length) // 2
        window = np.pad(window, (pad, n_fft - win_length - pad))
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return (basis * window[:, None]).astype(np.float32)


def frame_signal(y: jax.Array, n_fft: int, hop: int) -> jax.Array:
    """[B, T] -> [B, n_frames, n_fft] overlapping frames (center=False)."""
    t = y.shape[-1]
    n_frames = 1 + (t - n_fft) // hop
    idx = jnp.arange(n_frames)[:, None] * hop + jnp.arange(n_fft)[None, :]
    return y[:, idx]


def spectrogram(
    y: jax.Array,
    n_fft: int,
    hop_size: int,
    win_size: int,
    *,
    pad: bool = True,
) -> jax.Array:
    """Linear magnitude spectrogram.

    y: [B, T] float waveform in [-1, 1].
    Returns [B, n_frames, 1+n_fft//2]  (channels-last; the reference returns
    [B, F, T'], mel_processing.py:46-115).
    """
    y = y.astype(jnp.float32)
    if pad:
        p = (n_fft - hop_size) // 2
        y = jnp.pad(y, ((0, 0), (p, p)), mode="reflect")
    frames = frame_signal(y, n_fft, hop_size)  # [B, T', n_fft]
    basis = jnp.asarray(_dft_basis(n_fft, win_size))
    spec = jnp.einsum(
        "btn,nf->btf", frames, basis, preferred_element_type=jnp.float32
    )
    n_freqs = 1 + n_fft // 2
    re, im = spec[..., :n_freqs], spec[..., n_freqs:]
    return jnp.sqrt(re * re + im * im + 1e-6)


def spec_to_mel(
    spec: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    fmin: float,
    fmax: float | None,
) -> jax.Array:
    """Linear spectrogram [B, T, F] -> log-mel [B, T, n_mels].

    Reference: mel_processing.py:118-145 (matmul + log-clamp compression).
    """
    basis = jnp.asarray(mel_filterbank(sampling_rate, n_fft, num_mels, fmin, fmax))
    mel = jnp.einsum(
        "btf,mf->btm", spec.astype(jnp.float32), basis,
        preferred_element_type=jnp.float32,
    )
    return jnp.log(jnp.clip(mel, min=1e-5))


def spectral_normalize(x: jax.Array, clip_val: float = 1e-5) -> jax.Array:
    """Dynamic-range compression log(clamp(x, clip)) (mel_processing.py:7-31)."""
    return jnp.log(jnp.clip(x, min=clip_val))


def spectral_de_normalize(x: jax.Array) -> jax.Array:
    """Inverse of spectral_normalize (mel_processing.py:17-39)."""
    return jnp.exp(x)


def mel_spectrogram(
    y: jax.Array,
    n_fft: int,
    num_mels: int,
    sampling_rate: int,
    hop_size: int,
    win_size: int,
    fmin: float,
    fmax: float | None,
) -> jax.Array:
    """Waveform [B, T] -> log-mel [B, T', n_mels] (mel_processing.py:148-207)."""
    spec = spectrogram(y, n_fft, hop_size, win_size)
    return spec_to_mel(spec, n_fft, num_mels, sampling_rate, fmin, fmax)
