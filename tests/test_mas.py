"""MAS golden tests vs an independent numpy implementation of the Glow-TTS
Viterbi DP (the algorithm in /root/reference/monotonic_align/core.pyx)."""

import numpy as np
import jax.numpy as jnp

from vits_tpu.ops.mas import maximum_path_scan


def _numpy_mas(neg_cent, t_ys, t_xs):
    """Per-sample forward DP + backtrack (published Glow-TTS algorithm)."""
    b, T_y, T_x = neg_cent.shape
    paths = np.zeros((b, T_y, T_x), dtype=np.int32)
    big_neg = -1e9
    for i in range(b):
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        value = neg_cent[i].copy().astype(np.float32)
        for y in range(t_y):
            for x in range(max(0, t_x + y - t_y), min(t_x, y + 1)):
                v_cur = big_neg if x == y else value[y - 1, x]
                if x == 0:
                    v_prev = 0.0 if y == 0 else big_neg
                else:
                    v_prev = value[y - 1, x - 1]
                value[y, x] += max(v_prev, v_cur)
        index = t_x - 1
        for y in range(t_y - 1, -1, -1):
            paths[i, y, index] = 1
            if index != 0 and (index == y or value[y - 1, index] < value[y - 1, index - 1]):
                index -= 1
    return paths


def _random_case(rng, b, T_y, T_x):
    neg_cent = rng.standard_normal((b, T_y, T_x)).astype(np.float32)
    t_ys = rng.integers(T_x, T_y + 1, size=b)  # t_y >= t_x so a path exists
    t_xs = rng.integers(2, T_x + 1, size=b)
    t_ys = np.maximum(t_ys, t_xs)
    mask = (
        (np.arange(T_y)[None, :, None] < t_ys[:, None, None])
        & (np.arange(T_x)[None, None, :] < t_xs[:, None, None])
    ).astype(np.float32)
    return neg_cent, mask, t_ys, t_xs


def test_mas_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    neg_cent, mask, t_ys, t_xs = _random_case(rng, 4, 37, 11)
    ref = _numpy_mas(neg_cent, t_ys, t_xs) * mask.astype(np.int32)
    ours = np.asarray(maximum_path_scan(jnp.asarray(neg_cent), jnp.asarray(mask)))
    np.testing.assert_array_equal(ours.astype(np.int32), ref)


def test_mas_path_properties():
    rng = np.random.default_rng(1)
    neg_cent, mask, t_ys, t_xs = _random_case(rng, 3, 50, 23)
    path = np.asarray(maximum_path_scan(jnp.asarray(neg_cent), jnp.asarray(mask)))
    for i in range(3):
        t_y, t_x = int(t_ys[i]), int(t_xs[i])
        p = path[i, :t_y, :t_x]
        # exactly one phoneme per frame
        np.testing.assert_array_equal(p.sum(axis=1), np.ones(t_y))
        # durations sum to t_y, all >= 1
        durs = p.sum(axis=0)
        assert durs.sum() == t_y and (durs >= 1).all()
        # monotonic, non-decreasing by 0/1
        xs = p.argmax(axis=1)
        assert ((np.diff(xs) == 0) | (np.diff(xs) == 1)).all()
        assert xs[0] == 0 and xs[-1] == t_x - 1
        # padded region is zero
        assert path[i, t_y:, :].sum() == 0 and path[i, :, t_x:].sum() == 0
