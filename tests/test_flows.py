"""Invertibility and logdet tests for flow components."""

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.models.flows import (
    Flip,
    ElementwiseAffine,
    Log,
    ResidualCouplingBlock,
    ConvFlow,
)
from vits_tpu.ops.spline import unconstrained_rational_quadratic_spline


def test_spline_roundtrip_and_tails():
    rng = np.random.default_rng(0)
    shape = (4, 7)
    K = 10
    x = rng.uniform(-8, 8, shape).astype(np.float32)  # mix of inside/outside
    uw = rng.standard_normal(shape + (K,)).astype(np.float32)
    uh = rng.standard_normal(shape + (K,)).astype(np.float32)
    ud = rng.standard_normal(shape + (K - 1,)).astype(np.float32)

    y, ld = unconstrained_rational_quadratic_spline(
        jnp.asarray(x), jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
        inverse=False, tail_bound=5.0,
    )
    x_rec, ld_inv = unconstrained_rational_quadratic_spline(
        y, jnp.asarray(uw), jnp.asarray(uh), jnp.asarray(ud),
        inverse=True, tail_bound=5.0,
    )
    np.testing.assert_allclose(np.asarray(x_rec), x, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ld), -np.asarray(ld_inv), rtol=1e-3, atol=1e-4)
    # outside the tails: identity, logdet 0
    outside = np.abs(x) > 5.0
    assert outside.any()
    np.testing.assert_allclose(np.asarray(y)[outside], x[outside])
    np.testing.assert_allclose(np.asarray(ld)[outside], 0.0)


def test_spline_logdet_matches_numerical_jacobian():
    rng = np.random.default_rng(1)
    K = 10
    uw = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal((1, K)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal((1, K - 1)).astype(np.float32))

    def f(xv):
        y, _ = unconstrained_rational_quadratic_spline(
            xv[None], uw, uh, ud, inverse=False, tail_bound=5.0
        )
        return y[0]

    x0 = jnp.asarray(1.234, dtype=jnp.float32)
    deriv = jax.grad(f)(x0)
    _, ld = unconstrained_rational_quadratic_spline(
        x0[None], uw, uh, ud, inverse=False, tail_bound=5.0
    )
    np.testing.assert_allclose(np.log(np.asarray(deriv)), np.asarray(ld)[0], rtol=1e-4)


def test_elementwise_affine_roundtrip():
    m = ElementwiseAffine(2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 2)), jnp.float32)
    mask = jnp.ones((2, 5, 1))
    params = m.init(jax.random.PRNGKey(0), x, mask)
    # non-trivial params
    params = jax.tree_util.tree_map(lambda p: p + 0.3, params)
    y, ld = m.apply(params, x, mask)
    x_rec = m.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-5, atol=1e-6)
    assert ld.shape == (2,)


def test_log_flow_roundtrip():
    m = Log()
    x = jnp.asarray(np.abs(np.random.default_rng(0).standard_normal((2, 5, 1))) + 0.1,
                    jnp.float32)
    mask = jnp.ones((2, 5, 1))
    y, ld = m.apply({}, x, mask)
    x_rec = m.apply({}, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-5, atol=1e-6)


def test_residual_coupling_block_roundtrip():
    m = ResidualCouplingBlock(
        channels=8, hidden_channels=16, kernel_size=5, dilation_rate=1,
        n_layers=2, n_flows=2, gin_channels=4,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 10, 8)), jnp.float32)
    mask = jnp.ones((2, 10, 1))
    g = jnp.asarray(rng.standard_normal((2, 1, 4)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x, mask, g)
    # perturb so couplings are not identity (zero-init heads)
    params = jax.tree_util.tree_map(lambda p: p + 0.05, params)
    z = m.apply(params, x, mask, g=g)
    x_rec = m.apply(params, z, mask, g=g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)


def test_conv_flow_roundtrip():
    m = ConvFlow(in_channels=2, filter_channels=16, kernel_size=3, n_layers=2)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 9, 2)), jnp.float32)
    mask = jnp.ones((2, 9, 1))
    params = m.init(jax.random.PRNGKey(0), x, mask)
    params = jax.tree_util.tree_map(lambda p: p + 0.02, params)
    y, ld = m.apply(params, x, mask)
    x_rec = m.apply(params, y, mask, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-3, atol=1e-4)
    assert np.isfinite(np.asarray(ld)).all()


def test_flip_roundtrip():
    m = Flip()
    x = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 6))
    y, ld = m.apply({}, x)
    x_rec = m.apply({}, y, reverse=True)
    np.testing.assert_array_equal(np.asarray(x_rec), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(ld), np.zeros(1))
