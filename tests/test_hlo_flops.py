"""tools/hlo_flops.py: the grouped-conv-aware FLOP counter must match
hand-computed FLOPs on small compiled programs (dense, grouped, strided,
and gradient convolutions)."""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)
from hlo_flops import true_flops_from_hlo  # noqa: E402


def _compiled_text(fn, *args):
    return jax.jit(fn).lower(*args).compile().as_text()


def test_dense_conv_flops():
    b, t, ci, co, k = 2, 64, 8, 16, 5
    x = jnp.zeros((b, t, ci))
    w = jnp.zeros((k, ci, co))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(2, 2)], dimension_numbers=("NWC", "WIO", "NWC")
        )

    got = true_flops_from_hlo(_compiled_text(f, x, w))["total"]
    want = 2 * b * t * k * ci * co
    assert abs(got - want) / want < 0.05, (got, want)


def test_grouped_conv_flops_not_dense_counted():
    b, t, ci, co, k, g = 2, 64, 16, 32, 5, 4
    x = jnp.zeros((b, t, ci))
    w = jnp.zeros((k, ci // g, co))

    def f(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1,), [(2, 2)], feature_group_count=g,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    got = true_flops_from_hlo(_compiled_text(f, x, w))["total"]
    want = 2 * b * t * k * (ci // g) * co  # per-group input channels
    assert abs(got - want) / want < 0.05, (got, want)


def test_grad_conv_flops_sane():
    """Gradient convs (input dilation + group-as-spatial tricks) must not
    blow up the count: fwd+bwd of a grouped conv is ~3x fwd."""
    b, t, ci, co, k, g, s = 2, 256, 16, 32, 9, 4, 2
    x = jnp.zeros((b, t, ci))
    w = jnp.zeros((k, ci // g, co))

    def conv(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (s,), [(4, 4)], feature_group_count=g,
            dimension_numbers=("NWC", "WIO", "NWC"),
        )

    def loss(x, w):
        return jnp.sum(conv(x, w) ** 2)

    fwd = true_flops_from_hlo(_compiled_text(conv, x, w))["total"]
    both = true_flops_from_hlo(
        _compiled_text(jax.grad(loss, argnums=(0, 1)), x, w)
    )["total"]
    assert fwd > 0 and both > fwd
    # fwd (rematerialized) + dgrad + wgrad should be within [2x, 4.5x] fwd
    assert 2.0 * fwd <= both <= 4.5 * fwd, (fwd, both, both / fwd)
