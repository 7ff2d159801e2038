"""PhaseAug property tests (Lee et al. 2023 semantics, package defaults)."""

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.ops.phaseaug import (
    DELTA_MAX,
    VAR,
    _lowpass_kernel,
    phaseaug_sync,
    sample_phi,
)


def _wave(b=2, t=2048, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.standard_normal((b, t, 1)) * 0.1, jnp.float32)


def test_magnitude_preserved():
    # all-pass approximation: full-T rfft magnitudes preserved EXACTLY
    y = _wave()
    a, _ = phaseaug_sync(y, y, jax.random.PRNGKey(0), exact=False)
    mag0 = jnp.abs(jnp.fft.rfft(y[..., 0], axis=1))
    mag1 = jnp.abs(jnp.fft.rfft(a[..., 0], axis=1))
    np.testing.assert_allclose(np.asarray(mag0), np.asarray(mag1), atol=1e-3)
    # but the waveform itself changed (a real rotation happened)
    assert not np.allclose(np.asarray(y), np.asarray(a), atol=1e-3)

    # exact (package) path: signal energy preserved to a few % (per-frame
    # rotation + iSTFT is not STFT-consistent, so exact preservation is
    # neither expected nor what the package itself does)
    e, _ = phaseaug_sync(y, y, jax.random.PRNGKey(0))
    r = float(jnp.sum(e**2) / jnp.sum(y**2))
    assert 0.9 < r < 1.1, r
    assert not np.allclose(np.asarray(y), np.asarray(e), atol=1e-3)


def test_synchronized_rotation():
    """Identical inputs receive the identical rotation (forward_sync)."""
    y = _wave(seed=1)
    a, b = phaseaug_sync(y, y, jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_phi_smoothness():
    """The windowed-sinc smoother must kill bin-to-bin jitter: adjacent-bin
    phase increments shrink by >5x vs the raw N(0, var) draw."""
    phi = np.asarray(sample_phi(jax.random.PRNGKey(0), 8))
    dphi = np.diff(phi, axis=1)
    raw_increment = np.sqrt(2 * VAR)  # std of diff of iid N(0, var)
    assert np.abs(dphi).mean() < raw_increment / 5.0
    # linear ramp bounded by delta_max * pi overall
    assert np.abs(phi).max() < DELTA_MAX * np.pi + 4 * np.sqrt(VAR)


def test_kernel_is_lowpass():
    k = _lowpass_kernel()
    assert abs(k.sum() - 1.0) < 1e-6  # unity DC gain
    resp = np.abs(np.fft.rfft(k, 4096))
    assert resp[0] > 0.99
    # strong attenuation well above the cutoff
    hi = int(0.25 * len(resp))
    assert resp[hi:].max() < 0.05


def test_differentiable():
    y = _wave(seed=2)

    def loss(x):
        a, b = phaseaug_sync(x, x, jax.random.PRNGKey(1))
        return jnp.sum(a**2 + b**2)

    g = jax.grad(loss)(y)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.abs(np.asarray(g)).max() > 0


def test_dc_untouched():
    """DC bin stays real: a constant offset passes through unchanged on the
    all-pass path. (On the exact STFT path the hann window spreads a
    constant across a few bins whose rotation perturbs the mean slightly —
    the package's own behavior — so only near-preservation is asserted.)"""
    y = jnp.ones((1, 1024, 1), jnp.float32)
    a, _ = phaseaug_sync(y, y, jax.random.PRNGKey(5), exact=False)
    np.testing.assert_allclose(float(jnp.mean(a)), 1.0, rtol=1e-4)
    e, _ = phaseaug_sync(y, y, jax.random.PRNGKey(5))
    np.testing.assert_allclose(float(jnp.mean(e)), 1.0, rtol=0.1)
