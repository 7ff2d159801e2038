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
  4. rotate: X[k] <- X[k] * exp(i * phi[k]), identically for every frame,
     inside an STFT (hann, nfft=1024, hop=256, centered/reflect) round-trip

The default path here reproduces the package's STFT -> rotate -> iSTFT
pipeline EXACTLY (verified against an independent torch.stft/istft oracle
to float32 precision, tests/test_phaseaug_oracle.py), built TPU-first:
batched rfft/irfft over static frames and a reshape-based overlap-add
(hop divides nfft, so OLA is four shifted pads + a sum — no scatter).

Because phi is constant across frames the rotation is *approximately* an
LTI all-pass; `apply_allpass` applies that idealization in one length-T
rfft (phi interpolated onto the T//2+1 grid). Measured against the STFT
round-trip it deviates by ~8% waveform RMS (window/filter commutation
error — the smoothed phi still carries ~40-sample group delays), so the
exact path is the training default and the all-pass stays as a documented
fast approximation.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

NFFT = 1024
HOP = 256
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


@functools.lru_cache(maxsize=4)
def _window_and_envelope(t: int) -> tuple[np.ndarray, np.ndarray]:
    """Hann analysis window + the OLA w^2 envelope over the padded length
    (torch.istft's normalization denominator), cropped to [pad : pad+t]."""
    w = np.hanning(NFFT + 1)[:-1].astype(np.float32)  # periodic hann
    pad = NFFT // 2
    n_frames = (t + 2 * pad - NFFT) // HOP + 1
    env = np.zeros(t + 2 * pad, np.float32)
    for i in range(n_frames):
        env[i * HOP : i * HOP + NFFT] += w * w
    return w, env[pad : pad + t].copy()


@functools.lru_cache(maxsize=1)
def _rotation_bases() -> tuple[np.ndarray, np.ndarray]:
    """Real-DFT bases for the MXU matmul rotation path.

    fwd [NFFT, 2K] = (cos | -sin): frames @ fwd -> (X_re | X_im), exactly
    rfft. inv [2K, NFFT]: (R_re | R_im) @ inv -> irfft's real output —
    Hermitian-inverse weights 1/N at DC/Nyquist and 2/N elsewhere, and the
    -sin block reproduces irfft's implicit discard of the DC/Nyquist
    imaginary parts (sin(0)=sin(pi*n)=0). Numerically identical to
    irfft(rfft(f) * exp(i*phi)) to f32 roundoff."""
    k = NFFT // 2 + 1
    n = np.arange(NFFT)[:, None]
    ks = np.arange(k)[None, :]
    ang = 2.0 * np.pi * n * ks / NFFT
    fwd = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    wk = np.full(k, 2.0 / NFFT)
    wk[0] = wk[-1] = 1.0 / NFFT
    inv = np.concatenate(
        [(np.cos(ang) * wk).T, (-np.sin(ang) * wk).T], axis=0
    )
    return fwd.astype(np.float32), inv.astype(np.float32)


def _rotate_frames_matmul(frames: jax.Array, phi: jax.Array) -> jax.Array:
    """Per-frame rotation by exp(i*phi[b]) as two real matmuls [B, F, NFFT]
    -> [B, F, NFFT] — kept as an independent numerical reference for the
    FFT path (the equivalence test cross-checks irfft's implicit DC/Nyquist
    imaginary-part discard against the explicit Hermitian-inverse basis).

    Measured NEGATIVE result (TPU v5e, B=64/F=36): this lowers to 29-250 ms
    depending on einsum form, vs 2.4 ms for the entire FFT apply — XLA's
    batched 1024-pt rfft/irfft is already fast on TPU, and the f32
    matmul+elementwise fusions here hit a platform pathology (plain f32
    `a @ b` at [2304,1024]x[1024,1026] runs 260 ms where the
    preferred_element_type=f32 einsum runs 0.45 ms). So the FFT path is the
    default on every backend; do NOT route the training step through this."""
    fwd, inv = _rotation_bases()
    k = NFFT // 2 + 1
    spec = jnp.einsum(
        "bfn,nc->bfc", frames, fwd, preferred_element_type=jnp.float32
    )
    x_re, x_im = spec[..., :k], spec[..., k:]
    c = jnp.cos(phi)[:, None, :]
    s = jnp.sin(phi)[:, None, :]
    rot = jnp.concatenate([x_re * c - x_im * s, x_re * s + x_im * c], axis=-1)
    return jnp.einsum(
        "bfc,cn->bfn", rot, inv, preferred_element_type=jnp.float32
    )


def apply_phi_stft(
    x: jax.Array, phi: jax.Array, use_fft: bool = True
) -> jax.Array:
    """The package's exact pipeline on [B, T]: centered reflect-pad STFT
    (hann/1024/256), rotate every frame by exp(i*phi[b, k]), iSTFT with OLA
    w^2 normalization, crop back to T. Static shapes; OLA is reshape+pad
    sums (HOP divides NFFT). Rotation via batched rfft/irfft (2.4 ms for
    [64, 8192] on a v5e — ~4.6% of a batch-32 train step; the DFT-matmul
    alternative measured 12-100x slower, see _rotate_frames_matmul).
    `use_fft=False` selects that matmul reference path (tests only; both
    agree to f32 roundoff — tests/test_phaseaug_oracle.py)."""
    b, t = x.shape
    assert t % HOP == 0, "segment length must be a hop multiple"
    w, env = _window_and_envelope(t)
    pad = NFFT // 2
    xp = jnp.pad(x.astype(jnp.float32), ((0, 0), (pad, pad)), mode="reflect")
    n_frames = (t + 2 * pad - NFFT) // HOP + 1
    # gather-free framing: HOP divides NFFT and pad, so view the padded
    # signal as HOP-sized blocks and build each frame from 4 shifted
    # block-slices — XLA sees slices/concats, no gather op
    r = NFFT // HOP
    blocks = xp.reshape(b, -1, HOP)
    frames = jnp.concatenate(
        [blocks[:, j : j + n_frames][:, :, None, :] for j in range(r)], axis=2
    ).reshape(b, n_frames, NFFT)
    frames = frames * w[None, None, :]
    if use_fft:
        spec = jnp.fft.rfft(frames, axis=-1)  # [B, F, 513]
        spec = spec * jnp.exp(1j * phi)[:, None, :]
        out = jnp.fft.irfft(spec, n=NFFT, axis=-1)
    else:
        out = _rotate_frames_matmul(frames, phi)
    out = out * w[None, None, :]
    # overlap-add: NFFT/HOP = 4 chunks; chunk j of frame i lands at
    # output block i+j -> four frame-axis-shifted pads summed
    r = NFFT // HOP
    chunks = out.reshape(b, n_frames, r, HOP)
    total_blocks = n_frames + r - 1
    acc = jnp.zeros((b, total_blocks, HOP), jnp.float32)
    for j in range(r):
        acc = acc + jnp.pad(
            chunks[:, :, j, :], ((0, 0), (j, r - 1 - j), (0, 0))
        )
    y = acc.reshape(b, total_blocks * HOP)[:, pad : pad + t]
    return y / jnp.asarray(env)[None, :]


def apply_allpass(x: jax.Array, phi: jax.Array) -> jax.Array:
    """Fast approximation on [B, T]: treat the frame-constant rotation as an
    LTI all-pass and apply it in one length-T rfft (phi interpolated onto
    the T//2+1 grid). ~8% waveform RMS from the exact STFT path (measured,
    tests/test_phaseaug_oracle.py) — magnitudes on the full-T grid are
    preserved exactly, per-frame STFT magnitudes approximately."""
    b, t = x.shape
    n_freq = t // 2 + 1
    src = jnp.linspace(0.0, 1.0, phi.shape[1])
    dst = jnp.linspace(0.0, 1.0, n_freq)
    phi_t = jax.vmap(lambda p: jnp.interp(dst, src, p))(phi)  # [B, F]
    if t % 2 == 0:
        phi_t = phi_t.at[:, -1].set(0.0)  # Nyquist bin must stay real
    rot = jnp.exp(1j * phi_t)
    spec = jnp.fft.rfft(x.astype(jnp.float32), axis=1)
    return jnp.fft.irfft(spec * rot, n=t, axis=1)


def phaseaug_sync(
    y: jax.Array,
    y_hat: jax.Array,
    rng: jax.Array,
    phi: jax.Array | None = None,
    exact: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """One synchronized random rotation applied to y and y_hat [B, T, 1]
    (the package's forward_sync contract). `phi` [B, NFFT//2+1] overrides
    the sampled rotation (the oracle tests share one phi across
    implementations); `exact=False` selects the LTI all-pass approximation."""
    b, t, _ = y.shape
    if phi is None:
        phi = sample_phi(rng, b)  # [B, 513] on the STFT-bin grid
    apply = apply_phi_stft if exact else apply_allpass
    # one batched round-trip for both signals: concat on batch, tile phi —
    # halves the number of FFT/framing dispatches vs applying separately
    # (same math; the synchronized rotation is per-ORIGINAL-batch-row)
    xy = jnp.concatenate([y[..., 0], y_hat[..., 0]], axis=0)  # [2B, T]
    phi2 = jnp.concatenate([phi, phi], axis=0)
    out = apply(xy, phi2)
    return (
        out[:b].astype(y.dtype)[..., None],
        out[b:].astype(y_hat.dtype)[..., None],
    )
