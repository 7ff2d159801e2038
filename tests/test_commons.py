"""Tests for mask/path/slice primitives (reference: /root/reference/commons.py)."""

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.ops.commons import (
    sequence_mask,
    generate_path,
    slice_segments,
    rand_slice_segments_for_cat,
    intersperse_with_language_id,
    crop_scope,
)


def test_sequence_mask():
    m = np.asarray(sequence_mask(jnp.array([1, 3, 0]), 4))
    expected = np.array(
        [[1, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0]], dtype=bool
    )
    np.testing.assert_array_equal(m, expected)


def test_generate_path():
    # durations [2, 1, 3] over 6 frames
    dur = jnp.array([[2, 1, 3]], dtype=jnp.float32)
    mask = jnp.ones((1, 6, 3), dtype=jnp.float32)
    path = np.asarray(generate_path(dur, mask))
    expected = np.array(
        [[[1, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 1], [0, 0, 1]]],
        dtype=np.float32,
    )
    np.testing.assert_array_equal(path, expected)


def test_slice_segments():
    x = jnp.arange(2 * 10 * 3, dtype=jnp.float32).reshape(2, 10, 3)
    out = np.asarray(slice_segments(x, jnp.array([0, 4]), 4))
    np.testing.assert_array_equal(out[0], np.asarray(x)[0, 0:4])
    np.testing.assert_array_equal(out[1], np.asarray(x)[1, 4:8])


def test_rand_slice_segments_for_cat_duplicated_offsets():
    x = jnp.zeros((6, 20, 2))
    lengths = jnp.full((6,), 20)
    _, ids = rand_slice_segments_for_cat(x, lengths, 8, jax.random.PRNGKey(0))
    ids = np.asarray(ids)
    np.testing.assert_array_equal(ids[:3], ids[3:])  # halves share offsets
    assert (ids >= 0).all() and (ids <= 12).all()


def test_intersperse_with_language_id():
    text, lang = intersperse_with_language_id([5, 6], [1, 3], 0)
    assert text == [0, 5, 0, 6, 0]
    assert lang == [1, 1, 3, 3, 3]


def test_crop_scope():
    x = jnp.broadcast_to(jnp.arange(80, dtype=jnp.float32), (2, 4, 80))
    out = np.asarray(crop_scope(x, 15, 50, jnp.array([0, -3])))
    np.testing.assert_array_equal(out[0, 0], np.arange(15, 65))
    np.testing.assert_array_equal(out[1, 0], np.arange(12, 62))
