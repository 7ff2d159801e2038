"""Yingram (YIN-based differentiable pitch feature), TPU-first.

Behavioral reference: /root/reference/Pitch.py. The yingram is the cumulative
mean-normalized difference function (cMNDF) of YIN, sampled at midi-note lags
with linear interpolation (Pitch.py:54-80); the difference function is
computed via rFFT autocorrelation (Pitch.py:118-149).

Differences from the reference, by design:
  * channels-last output [B, T', M] (reference returns [B, M, T'])
  * float32 accumulation on TPU instead of float64 (TPU f64 is emulated and
    slow). The reference itself documents ~1e-4 error for its f64 path
    (Pitch.py:120-122); f32 with the same "nice number" FFT padding stays in
    that regime for the 1-s segments used in training. For bit-closer host
    parity (feature caching), ``yingram_numpy`` computes in float64.
  * everything is static-shape and jit/vmap-safe.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.ops.stft import frame_signal


def midi_to_lag(m: int, sr: int, octave_range: float = 12) -> float:
    """midi -> lag in samples: sr / (440 * 2^((m-69)/octave_range)).

    Reference: Pitch.py:38-52.
    """
    f = 440.0 * math.pow(2, (m - 69) / octave_range)
    return sr / f


def _nice_fft_size(size: int) -> int:
    """Smallest `nice` FFT size >= size (Pitch.py:139-142)."""
    p2 = (size // 32).bit_length()
    nice_numbers = (16, 18, 20, 24, 25, 27, 30, 32)
    return min(x * 2**p2 for x in nice_numbers if x * 2**p2 >= size)


def difference_function(frames: jax.Array, tau_max: int) -> jax.Array:
    """YIN difference function d(tau) for tau in [0, tau_max).

    frames: [N, W]. d(tau) = sum_{j<W-tau} (x_j - x_{j+tau})^2, computed as
    cumulative energies minus twice the autocorrelation (rFFT; Pitch.py:118-149).
    """
    w = frames.shape[-1]
    tau_max = min(tau_max, w)
    x = frames.astype(jnp.float32)
    energy = jnp.concatenate(
        [jnp.zeros((x.shape[0], 1), x.dtype), jnp.cumsum(x * x, axis=-1)], axis=-1
    )  # [N, W+1]
    size_pad = _nice_fft_size(w + tau_max)
    fc = jnp.fft.rfft(x, n=size_pad, axis=-1)
    acorr = jnp.fft.irfft(fc * jnp.conj(fc), n=size_pad, axis=-1)[:, :tau_max]
    # energy[W - tau] for tau = 0..tau_max-1
    head = jnp.flip(energy[:, w - tau_max + 1 : w + 1], axis=-1)
    return head + energy[:, w : w + 1] - energy[:, :tau_max] - 2.0 * acorr


def cmndf(dfs: jax.Array, tau_max: int, eps: float = 1e-8) -> jax.Array:
    """Cumulative mean-normalized difference function (Pitch.py:152-167)."""
    arange = jnp.arange(1, tau_max, dtype=dfs.dtype)
    cum = jnp.cumsum(dfs[:, 1:], axis=-1)
    out = dfs[:, 1:] * arange / (cum + eps)
    return jnp.concatenate([jnp.ones((dfs.shape[0], 1), dfs.dtype), out], axis=-1)


class Yingram:
    """Yingram extractor with precomputed midi-lag tables.

    Reference: Pitch.py:6-110 (buffers c_ms / ceil / floor, frame unfold
    W=2048 step=256, cMNDF sampling at interpolated lags).
    """

    def __init__(
        self,
        sr: int = 22050,
        w_step: int = 256,
        w_size: int = 2048,
        tau_max: int = 2048,
        midi_start: int = 5,
        midi_end: int = 85,
        octave_range: int = 12,
    ):
        self.sr = sr
        self.w_step = w_step
        self.w_size = w_size
        self.tau_max = tau_max
        midis = list(range(midi_start, midi_end))
        self.n_midis = len(midis)
        c_ms = np.array([midi_to_lag(m, sr, octave_range) for m in midis])
        self.c_ms = jnp.asarray(c_ms, dtype=jnp.float32)
        self.c_ms_ceil = jnp.asarray(np.ceil(c_ms).astype(np.int32))
        self.c_ms_floor = jnp.asarray(np.floor(c_ms).astype(np.int32))

    def yingram_from_cmndf(self, cmndfs: jax.Array) -> jax.Array:
        """[N, tau_max] -> [N, M]: linear interp at midi lags (Pitch.py:54-80)."""
        ceil_v = cmndfs[:, self.c_ms_ceil]
        floor_v = cmndfs[:, self.c_ms_floor]
        denom = (self.c_ms_ceil - self.c_ms_floor).astype(cmndfs.dtype)
        frac = (self.c_ms - self.c_ms_floor.astype(jnp.float32)).astype(cmndfs.dtype)
        return (ceil_v - floor_v) / denom[None, :] * frac[None, :] + floor_v

    def __call__(self, x: jax.Array) -> jax.Array:
        """Raw audio [B, T] -> yingram [B, T', M] (channels-last).

        T' = 1 + (T - w_size) // w_step  (no padding; callers pad as the
        reference does: filter_length - hop on the left, round-up right,
        TextAudioSpeakerLoader.py:140-148 / SynthesizerTrn.py:261-265).
        """
        b, t = x.shape
        frames = frame_signal(x, self.w_size, self.w_step)  # [B, T', W]
        n_frames = frames.shape[1]
        flat = frames.reshape(b * n_frames, self.w_size)
        dfs = difference_function(flat, self.tau_max)
        c = cmndf(dfs, self.tau_max)
        y = self.yingram_from_cmndf(c)
        return y.reshape(b, n_frames, self.n_midis)


def yingram_numpy(
    x: np.ndarray,
    sr: int = 22050,
    w_step: int = 256,
    w_size: int = 2048,
    tau_max: int = 2048,
    midi_start: int = 5,
    midi_end: int = 85,
    octave_range: int = 12,
) -> np.ndarray:
    """Float64 host-side yingram for feature caching / parity tests.

    Matches the reference's float64 torch path (Pitch.py:82-110) to its
    documented ~1e-4 tolerance. x: [B, T] -> [B, T', M].
    """
    x = np.asarray(x, dtype=np.float64)
    b, t = x.shape
    n_frames = 1 + (t - w_size) // w_step
    idx = np.arange(n_frames)[:, None] * w_step + np.arange(w_size)[None, :]
    frames = x[:, idx].reshape(b * n_frames, w_size)

    w = w_size
    tm = min(tau_max, w)
    energy = np.concatenate(
        [np.zeros((frames.shape[0], 1)), np.cumsum(frames * frames, axis=-1)], axis=-1
    )
    size_pad = _nice_fft_size(w + tm)
    fc = np.fft.rfft(frames, n=size_pad, axis=-1)
    acorr = np.fft.irfft(fc * np.conj(fc), n=size_pad, axis=-1)[:, :tm]
    head = energy[:, w - tm + 1 : w + 1][:, ::-1]
    dfs = head + energy[:, w : w + 1] - energy[:, :tm] - 2.0 * acorr

    arange = np.arange(1, tm)
    cum = np.cumsum(dfs[:, 1:], axis=-1)
    c = dfs[:, 1:] * arange / (cum + 1e-8)
    c = np.concatenate([np.ones((dfs.shape[0], 1)), c], axis=-1)

    midis = np.arange(midi_start, midi_end)
    c_ms = sr / (440.0 * 2.0 ** ((midis - 69) / octave_range))
    ceil_i = np.ceil(c_ms).astype(np.int64)
    floor_i = np.floor(c_ms).astype(np.int64)
    y = (c[:, ceil_i] - c[:, floor_i]) / (ceil_i - floor_i)[None, :] * (
        c_ms - floor_i
    )[None, :] + c[:, floor_i]
    return y.reshape(b, n_frames, len(midis))
