"""Relative-position attention helper parity vs a torch oracle, plus encoder
shape/mask tests."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vits_tpu.models.attention import (
    _relative_position_to_absolute_position,
    _absolute_position_to_relative_position,
    _get_relative_embeddings,
    RelativePositionTransformer,
)
from vits_tpu.models.text_encoder import TextEncoder


def _torch_rel_to_abs(x):
    batch, heads, length, _ = x.size()
    x = F.pad(x, (0, 1))
    x_flat = x.view([batch, heads, length * 2 * length])
    x_flat = F.pad(x_flat, (0, length - 1))
    return x_flat.view([batch, heads, length + 1, 2 * length - 1])[
        :, :, :length, length - 1 :
    ]


def _torch_abs_to_rel(x):
    batch, heads, length, _ = x.size()
    x = F.pad(x, (0, length - 1))
    x_flat = x.view([batch, heads, length**2 + length * (length - 1)])
    x_flat = F.pad(x_flat, (length, 0))
    return x_flat.view([batch, heads, length, 2 * length])[:, :, :, 1:]


def test_rel_abs_conversions_match_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 7, 13)).astype(np.float32)  # [B,H,T,2T-1]
    ours = np.asarray(_relative_position_to_absolute_position(jnp.asarray(x)))
    ref = _torch_rel_to_abs(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6)

    y = rng.standard_normal((2, 3, 7, 7)).astype(np.float32)  # [B,H,T,T]
    ours2 = np.asarray(_absolute_position_to_relative_position(jnp.asarray(y)))
    ref2 = _torch_abs_to_rel(torch.from_numpy(y)).numpy()
    np.testing.assert_allclose(ours2, ref2, rtol=1e-6)


def test_get_relative_embeddings():
    emb = jnp.asarray(np.arange(9 * 4, dtype=np.float32).reshape(1, 9, 4))  # W=4
    # length > window+1: padded then sliced to 2*length-1
    out = _get_relative_embeddings(emb, 7, 4)
    assert out.shape == (1, 13, 4)
    # length < window+1: sliced from the center
    out2 = _get_relative_embeddings(emb, 3, 4)
    assert out2.shape == (1, 5, 4)
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(emb)[:, 2:7])


def test_transformer_respects_mask():
    m = RelativePositionTransformer(
        hidden_channels=16, filter_channels=32, n_heads=2, n_layers=2,
        kernel_size=3, p_dropout=0.0,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
    mask = jnp.ones((2, 10, 1)).at[1, 6:].set(0)
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out = m.apply(params, x, mask)
    assert out.shape == (2, 10, 16)
    assert np.abs(np.asarray(out)[1, 6:]).sum() == 0
    # padded positions must not influence valid ones
    x2 = x.at[1, 6:].set(123.0)
    out2 = m.apply(params, x2, mask)
    np.testing.assert_allclose(np.asarray(out2)[1, :6], np.asarray(out)[1, :6],
                               rtol=1e-4, atol=1e-5)


def test_text_encoder_outputs():
    m = TextEncoder(
        n_vocab=50, out_channels=12, hidden_channels=16, filter_channels=32,
        n_heads=2, n_layers=2, kernel_size=3, p_dropout=0.0,
    )
    x = jnp.asarray([[1, 2, 3, 4, 0, 0], [5, 6, 7, 8, 9, 10]])
    t = jnp.asarray([[1, 1, 3, 3, 0, 0], [0, 0, 1, 1, 1, 1]])
    lengths = jnp.asarray([4, 6])
    params = m.init(jax.random.PRNGKey(0), x, t, lengths)
    h, mp, logsp, mask = m.apply(params, x, t, lengths)
    assert h.shape == (2, 6, 16)
    assert mp.shape == (2, 6, 12) and logsp.shape == (2, 6, 12)
    assert np.asarray(mask)[0, :, 0].tolist() == [1, 1, 1, 1, 0, 0]
    # language-id zero rows contribute no tone embedding: compare two ids
    # mapped to 0-language -> embeddings equal where symbols equal
    assert np.isfinite(np.asarray(h)).all()
