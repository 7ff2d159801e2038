"""PhaseAug: differentiable phase-rotation augmentation for GAN training.

Behavioral reference: the reference uses the external `phaseaug` pip package
(train_and_evaluate.py:5,24,92-98,119-122), applying the SAME random phase
rotation to real and fake audio before both discriminator passes
(`aug.forward_sync`). Core method (Lee et al., ICASSP 2023): rotate the
phase of every STFT frequency bin by phi(f) = phi_0 * 2pi * f/f_nyq + a
per-bin perturbation, identically across frames, then resynthesize.

Here: rfft-domain rotation over whole (frame-sized) segments with a linear
phase ramp plus per-bin uniform jitter, one draw per batch element, applied
via forward_sync to (real, fake) jointly. This preserves the reference's
training contract (synchronized, differentiable, magnitude-preserving phase
augmentation); the exact smoothing filter of the pip package is not
replicated (it is an augmentation, not a numerical parity surface).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def phaseaug_sync(
    y: jax.Array,
    y_hat: jax.Array,
    rng: jax.Array,
    mu: float = 1.0,
    sigma: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Apply one synchronized random phase rotation to y and y_hat.

    y, y_hat: [B, T, 1] waveforms (same shapes). Returns rotated pair.
    """
    b, t, _ = y.shape
    n_freq = t // 2 + 1
    r_phi, r_jitter = jax.random.split(rng)
    # global linear ramp coefficient per sample ~ N(0, mu)
    phi_0 = jax.random.normal(r_phi, (b, 1)) * mu
    # per-bin jitter ~ N(0, sigma) (radians)
    jitter = jax.random.normal(r_jitter, (b, n_freq)) * sigma
    freqs = jnp.arange(n_freq) / max(n_freq - 1, 1)
    phi = phi_0 * jnp.pi * freqs[None, :] + jitter  # [B, F]
    phi = phi.at[:, 0].set(0.0)  # keep DC real
    rot = jnp.exp(1j * phi)[:, :, None]  # [B, F, 1]

    def _apply(x):
        spec = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
        return jnp.fft.irfft(spec * rot, n=t, axis=1).astype(x.dtype)

    return _apply(y), _apply(y_hat)
