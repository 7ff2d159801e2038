"""Yingram golden tests vs an independent torch-f64 oracle implementing the
published YIN equations (reference behavior: /root/reference/Pitch.py)."""

import numpy as np
import torch

import jax.numpy as jnp

from vits_tpu.ops.yin import Yingram, yingram_numpy, midi_to_lag, _nice_fft_size


def _torch_yingram(x, sr=22050, w_step=256, W=2048, tau_max=2048,
                   midi_start=-5, midi_end=75, octave_range=24):
    """Independent float64 oracle: direct O(W*tau) difference function."""
    x = torch.from_numpy(x).double()
    b, t = x.shape
    n_frames = 1 + (t - W) // w_step
    idx = torch.arange(n_frames)[:, None] * w_step + torch.arange(W)[None, :]
    frames = x[:, idx].reshape(b * n_frames, W)

    tm = min(tau_max, W)
    # direct difference function (quadratic; small sizes only)
    d = torch.zeros(frames.shape[0], tm, dtype=torch.float64)
    for tau in range(1, tm):
        diff = frames[:, : W - tau] - frames[:, tau:]
        d[:, tau] = (diff * diff).sum(-1)
    arange = torch.arange(1, tm, dtype=torch.float64)
    cum = torch.cumsum(d[:, 1:], dim=-1)
    c = d[:, 1:] * arange / (cum + 1e-8)
    c = torch.cat([torch.ones(c.shape[0], 1, dtype=torch.float64), c], dim=-1)

    midis = np.arange(midi_start, midi_end)
    c_ms = sr / (440.0 * 2.0 ** ((midis - 69) / octave_range))
    ceil_i = np.ceil(c_ms).astype(int)
    floor_i = np.floor(c_ms).astype(int)
    y = (c[:, ceil_i] - c[:, floor_i]) / torch.tensor(ceil_i - floor_i) * torch.tensor(
        c_ms - floor_i
    ) + c[:, floor_i]
    return y.reshape(b, n_frames, len(midis)).numpy()


def test_nice_fft_size():
    # size = W + tau_max = 4096 -> p2 = bit_length(128) = 8, 16*256 = 4096
    assert _nice_fft_size(4096) == 4096
    assert _nice_fft_size(4097) > 4096


def test_midi_to_lag():
    assert abs(midi_to_lag(69, 22050, 24) - 22050 / 440) < 1e-9


def test_yingram_matches_oracle():
    rng = np.random.default_rng(0)
    t = 2048 + 256 * 3  # 4 frames
    # voiced-ish signal: mixture of harmonics + noise
    n = np.arange(t)
    x = (
        0.5 * np.sin(2 * np.pi * 110 * n / 22050)
        + 0.2 * np.sin(2 * np.pi * 220 * n / 22050)
        + 0.05 * rng.standard_normal(t)
    ).astype(np.float32)[None, :]

    ref = _torch_yingram(x)
    ours32 = np.asarray(Yingram(22050, 256, 2048, 2048, -5, 75, 24)(jnp.asarray(x)))
    ours64 = yingram_numpy(x, 22050, 256, 2048, 2048, -5, 75, 24)

    assert ours32.shape == ref.shape == (1, 4, 80)
    np.testing.assert_allclose(ours64, ref, rtol=1e-6, atol=1e-8)
    # f32 FFT-autocorr path: the reference itself documents ~1e-4 error
    np.testing.assert_allclose(ours32, ref, rtol=2e-2, atol=2e-3)
