"""PhaseAug: differentiable phase-rotation augmentation for GAN training.

Behavioral reference: the reference drives the external `phaseaug` pip
package (train_and_evaluate.py:5,24,92-98,119-122) with default parameters,
applying the SAME random rotation to real and fake audio before both
discriminator passes (`aug.forward_sync`).

Method (Lee et al., "PhaseAug: A Differentiable Augmentation for Speech
Synthesis to Train Monotonic GANs", ICASSP 2023), matching the package's
default pipeline:

  1. sample an i.i.d. Gaussian phase per STFT frequency bin,
     phi_raw[k] ~ N(0, var), var = 6.0, over nfft//2+1 = 513 bins
  2. low-pass the phase ALONG FREQUENCY with a windowed-sinc FIR
     (cutoff 0.05, transition half-width 0.012, kernel 128, zero padding) so
     neighbouring bins rotate coherently — the smoothing that makes the
     augmentation artifact-free
  3. add a linear ramp delta * pi * (k/K), delta ~ U(-delta_max, delta_max)
     with delta_max = 2.0 (a sub-sample circular time shift)
  4. rotate: X[k] <- X[k] * exp(i * phi[k]), identically for every frame

Because phi is constant across frames, the rotation is a linear
time-invariant all-pass filter; this implementation applies exactly that
filter in the length-T rfft domain (phi interpolated from the 513-bin STFT
grid onto the T//2+1-bin grid), which avoids the package's STFT/iSTFT
round-trip and its overlap-add leakage — bitwise-equal magnitudes, one fused
FFT per tensor on TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NFFT = 1024
VAR = 6.0
DELTA_MAX = 2.0
CUTOFF = 0.05
HALF_WIDTH = 0.012
KERNEL_SIZE = 128


def _lowpass_kernel(
    kernel_size: int = KERNEL_SIZE,
    cutoff: float = CUTOFF,
    half_width: float = HALF_WIDTH,
) -> np.ndarray:
    """Windowed-sinc low-pass FIR (the package's frequency-axis smoother:
    kaiser-windowed ideal LPF at `cutoff` with transition `half_width`)."""
    even = kernel_size % 2 == 0
    half = kernel_size // 2
    delta_f = 4 * half_width
    a = 2.285 * (half - 1) * np.pi * delta_f + 7.95  # kaiser attenuation
    beta = 0.1102 * (a - 8.7) if a > 50 else (
        0.5842 * (a - 21) ** 0.4 + 0.07886 * (a - 21) if a >= 21 else 0.0
    )
    if even:
        t = np.arange(-half, half) + 0.5
    else:
        t = np.arange(-half, half + 1)
    window = np.kaiser(len(t), beta)
    ideal = 2 * cutoff * np.sinc(2 * cutoff * t)
    k = window * ideal
    return (k / k.sum()).astype(np.float32)


@functools.lru_cache(maxsize=1)
def _kernel() -> np.ndarray:
    # Host-side numpy, cached: a module-level device array would initialize
    # the JAX backend at import (breaking dryrun_multichip's CPU pinning),
    # and caching a jnp array created inside a trace would leak that tracer
    # across jit boundaries. numpy constants stage cleanly into any trace.
    return _lowpass_kernel()


def sample_phi(
    rng: jax.Array,
    batch: int,
    n_bins: int = NFFT // 2 + 1,
    var: float = VAR,
    delta_max: float = DELTA_MAX,
) -> jax.Array:
    """Sample the per-bin rotation phi [batch, n_bins] (steps 1-3 above)."""
    r_phi, r_delta = jax.random.split(rng)
    phi_raw = jax.random.normal(r_phi, (batch, n_bins)) * np.sqrt(var)
    kernel = _kernel()
    pad = kernel.shape[0] // 2
    phi_pad = jnp.pad(phi_raw, ((0, 0), (pad, pad - 1 + kernel.shape[0] % 2)))
    phi_smooth = jax.vmap(
        lambda row: jnp.convolve(row, kernel, mode="valid")
    )(phi_pad)
    delta = (jax.random.uniform(r_delta, (batch, 1)) * 2.0 - 1.0) * delta_max
    ramp = jnp.linspace(0.0, 1.0, n_bins)[None, :]
    phi = phi_smooth + delta * jnp.pi * ramp
    return phi.at[:, 0].set(0.0)  # DC stays real


def phaseaug_sync(
    y: jax.Array,
    y_hat: jax.Array,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """One synchronized random rotation applied to y and y_hat [B, T, 1]
    (the package's forward_sync contract)."""
    b, t, _ = y.shape
    phi = sample_phi(rng, b)  # [B, 513] on the STFT-bin grid
    # interpolate the smooth response onto the length-T rfft grid: the
    # rotation is an LTI all-pass, so this is the exact same filter
    n_freq = t // 2 + 1
    src = jnp.linspace(0.0, 1.0, phi.shape[1])
    dst = jnp.linspace(0.0, 1.0, n_freq)
    phi_t = jax.vmap(lambda p: jnp.interp(dst, src, p))(phi)  # [B, F]
    if t % 2 == 0:
        phi_t = phi_t.at[:, -1].set(0.0)  # Nyquist bin must stay real
    rot = jnp.exp(1j * phi_t)[:, :, None]

    def _apply(x):
        spec = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
        return jnp.fft.irfft(spec * rot, n=t, axis=1).astype(x.dtype)

    return _apply(y), _apply(y_hat)
