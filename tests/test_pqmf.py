"""PQMF filterbank tests.

The polyphase analysis must be numerically identical to the definitional
form (stride-1 conv with the full-tap analysis bank, then [::N] decimation
— reference Avocodo.py:497-508), for every subband config the Avocodo
discriminator instantiates.
"""

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.ops.pqmf import PQMF

# (subbands, taps, cutoff, beta) — exactly the banks built by
# vits_tpu/models/avocodo.py (CoMBD lv1/lv2 projections, SBD pqmf/f_pqmf)
CONFIGS = [
    (2, 256, 0.25, 10.0),
    (4, 192, 0.13, 10.0),
    (16, 256, 0.03, 10.0),
    (64, 256, 0.1, 9.0),
]


def _naive_analysis(pq: PQMF, x: jax.Array) -> jax.Array:
    pad = pq.taps // 2
    y = jax.lax.conv_general_dilated(
        x,
        pq.analysis_filter.astype(x.dtype),
        window_strides=(1,),
        padding=[(pad, pad)],
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[:, :: pq.subbands, :]


def test_polyphase_analysis_matches_naive():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8192, 1)), jnp.float32)
    for cfg in CONFIGS:
        pq = PQMF(*cfg)
        ref = np.asarray(_naive_analysis(pq, x))
        got = np.asarray(pq.analysis(x))
        assert got.shape == ref.shape, (cfg, got.shape, ref.shape)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5, err_msg=str(cfg))


def test_polyphase_analysis_ragged_length():
    # T not divisible by N: output is ceil(T/N) frames, same as [::N]
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 1000, 1)), jnp.float32)
    pq = PQMF(16, 256, 0.03, 10.0)
    ref = np.asarray(_naive_analysis(pq, x))
    got = np.asarray(pq.analysis(x))
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_analysis_synthesis_near_identity():
    """Near-perfect reconstruction up to the filterbank group delay."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4096, 1)), jnp.float32)
    pq = PQMF(4, 62, 0.142, 9.0)  # the classic MB-MelGAN design point
    y = pq.synthesis(pq.analysis(x))
    # the symmetric taps//2 padding in both stages absorbs the group delay
    a = np.asarray(x)[0, :, 0]
    b = np.asarray(y)[0, :, 0]
    err = np.sqrt(np.mean((a - b) ** 2)) / np.sqrt(np.mean(a**2))
    assert err < 0.05, err
