"""Native C++ MAS vs scan oracle + cross-check all three implementations."""

import numpy as np
import pytest
import jax.numpy as jnp

from vits_tpu.ops.mas import maximum_path_scan
from vits_tpu.ops import mas_native
from tests.test_mas import _random_case, _numpy_mas

pytestmark = pytest.mark.skipif(
    not mas_native.available(), reason="g++/OpenMP unavailable"
)


@pytest.mark.parametrize("b,ty,tx", [(4, 37, 11), (8, 120, 60)])
def test_native_matches_oracles(b, ty, tx):
    rng = np.random.default_rng(b * ty)
    neg_cent, mask, t_ys, t_xs = _random_case(rng, b, ty, tx)
    ref_py = _numpy_mas(neg_cent, t_ys, t_xs) * mask.astype(np.int32)
    ref_scan = np.asarray(
        maximum_path_scan(jnp.asarray(neg_cent), jnp.asarray(mask))
    ).astype(np.int32)
    out = mas_native.maximum_path_native(neg_cent, mask)
    np.testing.assert_array_equal(out, ref_py)
    np.testing.assert_array_equal(out, ref_scan)
