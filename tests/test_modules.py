"""Conv / weight-norm parity vs torch, and module shape tests."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vits_tpu.models.modules import Conv1d, ConvTranspose1d, WaveNet, DDSConv


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 20, 8)).astype(np.float32)
    w = rng.standard_normal((16, 8, 5)).astype(np.float32)  # [out, in, k]
    b = rng.standard_normal(16).astype(np.float32)

    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)),
        torch.from_numpy(w),
        torch.from_numpy(b),
        padding=2,
        dilation=1,
    ).numpy()

    m = Conv1d(16, 5, padding=2)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}}
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_conv1d_weight_norm_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 16, 4)).astype(np.float32)
    conv = torch.nn.Conv1d(4, 6, 3, padding=1)
    conv = torch.nn.utils.weight_norm(conv)
    with torch.no_grad():
        ref = conv(torch.from_numpy(x.transpose(0, 2, 1))).numpy()

    v = conv.weight_v.detach().numpy()  # [out, in, k]
    g = conv.weight_g.detach().numpy().reshape(-1)  # [out]
    b = conv.bias.detach().numpy()
    m = Conv1d(6, 3, padding=1, use_weight_norm=True)
    params = {
        "params": {
            "kernel": jnp.asarray(v.transpose(2, 1, 0)),
            "g": jnp.asarray(g),
            "bias": jnp.asarray(b),
        }
    }
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_conv1d_weight_norm_g_init_equals_kernel_norm():
    m = Conv1d(6, 3, padding=1, use_weight_norm=True)
    params = m.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 4)))
    k = params["params"]["kernel"]
    g = params["params"]["g"]
    np.testing.assert_allclose(
        np.asarray(g), np.sqrt((np.asarray(k) ** 2).sum(axis=(0, 1)) + 1e-12),
        rtol=1e-6,
    )


def test_conv1d_grouped_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 12, 8)).astype(np.float32)
    w = rng.standard_normal((8, 1, 3)).astype(np.float32)  # depthwise
    ref = torch.nn.functional.conv1d(
        torch.from_numpy(x.transpose(0, 2, 1)), torch.from_numpy(w),
        padding=1, groups=8,
    ).numpy()
    m = Conv1d(8, 3, padding=1, groups=8, use_bias=False)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 1, 0))}}
    out = np.asarray(m.apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)


def test_conv_transpose_matches_torch():
    """HiFi-GAN upsampler semantics: padding=u//2+u%2, output_padding=u%2."""
    rng = np.random.default_rng(3)
    for u, k in [(8, 16), (2, 4), (3, 7)]:
        x = rng.standard_normal((2, 10, 6)).astype(np.float32)
        w = rng.standard_normal((6, 5, k)).astype(np.float32)  # [in, out, k]
        b = rng.standard_normal(5).astype(np.float32)
        pad, opad = u // 2 + u % 2, u % 2
        ref = torch.nn.functional.conv_transpose1d(
            torch.from_numpy(x.transpose(0, 2, 1)),
            torch.from_numpy(w),
            torch.from_numpy(b),
            stride=u,
            padding=pad,
            output_padding=opad,
        ).numpy()
        m = ConvTranspose1d(5, k, stride=u, padding=pad, output_padding=opad,
                            use_weight_norm=False)
        params = {
            "params": {"kernel": jnp.asarray(w.transpose(2, 0, 1)), "bias": jnp.asarray(b)}
        }
        out = np.asarray(m.apply(params, jnp.asarray(x)))
        assert out.shape == ref.transpose(0, 2, 1).shape, (u, k)
        np.testing.assert_allclose(out, ref.transpose(0, 2, 1), rtol=1e-4, atol=1e-5)
        if u % 2 == 0:  # the reference's rates (8,8,2,2) are even -> exact T*u
            assert out.shape[1] == 10 * u


def test_wavenet_shapes_and_mask():
    m = WaveNet(hidden_channels=8, kernel_size=5, dilation_rate=1, n_layers=4,
                gin_channels=6)
    x = jnp.ones((2, 12, 8))
    mask = jnp.ones((2, 12, 1)).at[1, 8:].set(0)
    g = jnp.ones((2, 1, 6))
    params = m.init(jax.random.PRNGKey(0), x, mask, g)
    out = m.apply(params, x, mask, g)
    assert out.shape == (2, 12, 8)
    assert np.asarray(out)[1, 8:].sum() == 0  # masked region zeroed


def test_ddsconv_shapes():
    m = DDSConv(channels=8, kernel_size=3, n_layers=3)
    x = jnp.ones((2, 12, 8))
    mask = jnp.ones((2, 12, 1))
    params = m.init(jax.random.PRNGKey(0), x, mask)
    out = m.apply(params, x, mask)
    assert out.shape == (2, 12, 8)
    assert np.isfinite(np.asarray(out)).all()

