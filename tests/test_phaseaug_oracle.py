"""PhaseAug cross-check against an independent torch STFT-round-trip oracle.

The reference trains through the external `phaseaug` pip package
(/root/reference/train_and_evaluate.py:24,92-98). That package is not
installed in this image, so a direct fixture comparison is impossible;
instead this file reimplements the package's *actual compute path* — STFT
(hann, nfft=1024, hop=256, centered) -> per-frame complex rotation by
exp(i*phi) -> iSTFT — independently in torch (torch.stft/istft, which is
exactly what the package calls), from the published algorithm (Lee et al.,
ICASSP 2023), and feeds it the SAME sampled phi as the repo's JAX
implementation (vits_tpu/ops/phaseaug.py::apply_phi_stft), which builds the
same round-trip out of batched rfft + reshape overlap-add. The waveforms
must agree to float32 precision — a true empirical cross-check, not a
property test.

Note: per-frame rotation followed by iSTFT is not STFT-consistent, so
re-analyzing the output does NOT exactly reproduce rotated magnitudes; the
~3% magnitude drift is a property of the package's own pipeline, which is
why the magnitude test compares repo output against oracle output rather
than against the input.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from vits_tpu.ops.phaseaug import NFFT, phaseaug_sync, sample_phi

HOP = 256


def _torch_phaseaug(x: np.ndarray, phi: np.ndarray) -> np.ndarray:
    """The package's pipeline, written independently in torch:
    rotate every STFT frame of x [B, T] by exp(i*phi[b, k]) and resynthesize.
    """
    xt = torch.from_numpy(x).to(torch.float64)
    window = torch.hann_window(NFFT, dtype=torch.float64)
    spec = torch.stft(
        xt, NFFT, HOP, win_length=NFFT, window=window,
        center=True, pad_mode="reflect", return_complex=True,
    )  # [B, NFFT//2+1, frames]
    rot = torch.exp(1j * torch.from_numpy(phi).to(torch.complex128))
    out = torch.istft(
        spec * rot[:, :, None], NFFT, HOP, win_length=NFFT, window=window,
        center=True, length=x.shape[1],
    )
    return out.numpy()


def _shared_phi(b: int, seed: int = 0) -> np.ndarray:
    phi = np.asarray(sample_phi(jax.random.PRNGKey(seed), b), np.float64)
    phi[:, -1] = 0.0  # repo zeroes Nyquist on the T-grid; match on STFT grid
    return phi


def test_matches_stft_round_trip_interior():
    """Away from signal edges, the exact path must equal the package's
    STFT rotate + iSTFT to float32 precision."""
    b, t = 3, 8192
    rng = np.random.default_rng(7)
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    phi = _shared_phi(b)

    ref = _torch_phaseaug(x, phi)

    y = jnp.asarray(x[:, :, None])
    phi_j = jnp.asarray(phi, jnp.float32)
    got, _ = phaseaug_sync(y, y, jax.random.PRNGKey(1), phi=phi_j)
    got = np.asarray(got[..., 0], np.float64)

    sl = slice(NFFT, t - NFFT)
    rms = np.sqrt((ref[:, sl] ** 2).mean())
    err = np.sqrt(((got[:, sl] - ref[:, sl]) ** 2).mean())
    assert err / rms < 1e-4, (err, rms)


def test_edges_match_too():
    """The reflect-pad / OLA-envelope edge handling matches torch.istft's,
    so the FULL signal (edges included) agrees to float32 precision."""
    b, t = 2, 4096
    rng = np.random.default_rng(3)
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    phi = _shared_phi(b, seed=5)

    ref = _torch_phaseaug(x, phi)
    got, _ = phaseaug_sync(
        jnp.asarray(x[:, :, None]), jnp.asarray(x[:, :, None]),
        jax.random.PRNGKey(1), phi=jnp.asarray(phi, jnp.float32),
    )
    got = np.asarray(got[..., 0], np.float64)
    rel = np.sqrt(((got - ref) ** 2).sum()) / np.sqrt((ref**2).sum())
    assert rel < 1e-4, rel


def test_matmul_rotation_matches_fft():
    """The explicit DFT-matmul rotation (an independent numerical reference;
    measured slower on TPU, so never the default) is identical to the
    rfft/irfft rotation — including complex DC/Nyquist phases, whose
    imaginary parts both formulations discard the same way."""
    from vits_tpu.ops.phaseaug import apply_phi_stft

    b, t = 2, 4096
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((b, t)) * 0.1, jnp.float32)
    # deliberately non-zero Nyquist/DC-adjacent phases
    phi = jnp.asarray(
        np.asarray(sample_phi(jax.random.PRNGKey(4), b)), jnp.float32
    )
    y_fft = np.asarray(apply_phi_stft(x, phi, use_fft=True), np.float64)
    y_mm = np.asarray(apply_phi_stft(x, phi, use_fft=False), np.float64)
    rel = np.sqrt(((y_fft - y_mm) ** 2).sum()) / np.sqrt((y_fft**2).sum())
    assert rel < 1e-5, rel


def test_magnitude_agreement_on_stft_grid():
    """On the package's own STFT grid, the repo output's magnitudes match the
    oracle output's magnitudes to float32 precision, and both drift from the
    input's magnitudes by the same small amount (per-frame rotation + iSTFT
    is not STFT-consistent — the ~3% drift is the package's own behavior)."""
    b, t = 2, 8192
    rng = np.random.default_rng(11)
    x = (rng.standard_normal((b, t)) * 0.1).astype(np.float32)
    phi = _shared_phi(b, seed=2)

    ref = _torch_phaseaug(x, phi)
    got, _ = phaseaug_sync(
        jnp.asarray(x[:, :, None]), jnp.asarray(x[:, :, None]),
        jax.random.PRNGKey(1), phi=jnp.asarray(phi, jnp.float32),
    )
    got = np.asarray(got[..., 0])

    window = torch.hann_window(NFFT, dtype=torch.float64)

    def mags(sig):
        spec = torch.stft(
            torch.from_numpy(np.array(sig, dtype=np.float64, copy=True)),
            NFFT, HOP, window=window, center=True, pad_mode="reflect",
            return_complex=True,
        )
        return spec.abs().numpy()

    m_in, m_ref, m_got = mags(x), mags(ref), mags(got)
    # repo vs oracle: tight
    assert np.abs(m_got - m_ref).mean() / m_ref.mean() < 1e-4
    # both vs input: small and EQUAL drift (interior frames)
    sl = (slice(None), slice(None), slice(4, -4))
    drift_ref = np.abs(m_ref[sl] - m_in[sl]).mean() / m_in[sl].mean()
    drift_got = np.abs(m_got[sl] - m_in[sl]).mean() / m_in[sl].mean()
    assert drift_ref < 0.05 and abs(drift_got - drift_ref) < 1e-4
