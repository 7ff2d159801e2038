"""Golden tests: STFT / mel vs the torch-CPU reference semantics.

The torch formulas here re-state /root/reference/mel_processing.py behavior
(reflect pad (n_fft-hop)/2, center=False, periodic hann, sqrt(·+1e-6),
log-clamp 1e-5) as an independent oracle.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vits_tpu.ops.stft import spectrogram, spec_to_mel, mel_spectrogram, mel_filterbank


def _torch_spec(y, n_fft, hop, win):
    yt = torch.from_numpy(y).float()
    pad = (n_fft - hop) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(
        yt,
        n_fft,
        hop_length=hop,
        win_length=win,
        window=torch.hann_window(win),
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.view_as_real(spec)
    return torch.sqrt(spec.pow(2).sum(-1) + 1e-6).numpy()  # [B, F, T]


@pytest.mark.parametrize("t", [8192, 22050])
def test_spectrogram_matches_torch(t):
    rng = np.random.default_rng(0)
    y = (rng.standard_normal((2, t)) * 0.3).clip(-1, 1).astype(np.float32)
    ours = np.asarray(spectrogram(jnp.asarray(y), 1024, 256, 1024))  # [B,T,F]
    ref = _torch_spec(y, 1024, 256, 1024)  # [B,F,T]
    assert ours.shape == (2, ref.shape[2], ref.shape[1])
    np.testing.assert_allclose(ours, ref.transpose(0, 2, 1), rtol=1e-4, atol=2e-4)


def test_mel_filterbank_slaney():
    """Spot-check the Slaney filterbank: rows sum to enorm-weighted triangles,
    no NaNs, correct shape, and every mel channel has support."""
    fb = mel_filterbank(22050, 1024, 80, 0.0, None)
    assert fb.shape == (80, 513)
    assert np.isfinite(fb).all()
    assert (fb.max(axis=1) > 0).all()
    # hand-derived golden value for sr=22050, n_fft=1024, n_mels=80:
    # mel_max = 15 + ln(11.025)*27/ln(6.4) = 49.9124; spacing 0.616203 mel;
    # hz_1 = 41.0802; bin1 = 21.5332 Hz -> tri = 0.524175, enorm = 1/41.0802.
    np.testing.assert_allclose(fb[0, 1], 0.012760, rtol=1e-3)


def test_mel_spectrogram_matches_torch_oracle():
    rng = np.random.default_rng(1)
    y = (rng.standard_normal((1, 8192)) * 0.2).astype(np.float32)
    spec = _torch_spec(y, 1024, 256, 1024)  # [B,F,T]
    fb = torch.from_numpy(mel_filterbank(22050, 1024, 80, 0.0, None))
    mel_ref = torch.log(
        torch.clamp(torch.matmul(fb, torch.from_numpy(spec)), min=1e-5)
    ).numpy()
    ours = np.asarray(
        mel_spectrogram(jnp.asarray(y), 1024, 80, 22050, 256, 1024, 0.0, None)
    )
    np.testing.assert_allclose(ours, mel_ref.transpose(0, 2, 1), rtol=1e-3, atol=1e-3)


def test_spec_to_mel_shapes():
    spec = jnp.ones((3, 17, 513))
    mel = spec_to_mel(spec, 1024, 80, 22050, 0.0, None)
    assert mel.shape == (3, 17, 80)
