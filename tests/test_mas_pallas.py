"""Pallas MAS kernel vs the scan oracle (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vits_tpu.ops.mas import maximum_path_scan
from vits_tpu.ops.mas_pallas import maximum_path_pallas
from tests.test_mas import _random_case


@pytest.mark.parametrize("b,ty,tx", [(4, 37, 11), (2, 64, 48), (8, 150, 130)])
def test_pallas_matches_scan(b, ty, tx):
    rng = np.random.default_rng(b + ty)
    neg_cent, mask, t_ys, t_xs = _random_case(rng, b, ty, tx)
    ref = np.asarray(maximum_path_scan(jnp.asarray(neg_cent), jnp.asarray(mask)))
    out = np.asarray(
        maximum_path_pallas(jnp.asarray(neg_cent), jnp.asarray(mask), interpret=True)
    )
    np.testing.assert_array_equal(out, ref)


def test_pallas_handles_full_lengths():
    b, ty, tx = 3, 40, 40  # t_y == t_x forces the pure-diagonal path
    neg_cent = np.random.default_rng(0).standard_normal((b, ty, tx)).astype(np.float32)
    mask = np.ones((b, ty, tx), np.float32)
    out = np.asarray(
        maximum_path_pallas(jnp.asarray(neg_cent), jnp.asarray(mask), interpret=True)
    )
    np.testing.assert_array_equal(out[0], np.eye(ty, dtype=np.float32))
