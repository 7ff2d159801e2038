"""Checkpoint tests: dual artifacts, latest-resume, pruning, partial load."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    load_eval_params,
    merge_compatible,
    save_checkpoint,
)
from vits_tpu.training.step import TrainState


def _dummy_state(scale=1.0):
    return TrainState(
        step=jnp.asarray(3),
        g_params={"a": jnp.ones((2, 3)) * scale, "b": {"c": jnp.zeros(4)}},
        d_params={"w": jnp.ones(5) * scale},
        g_opt_state={"m": jnp.zeros((2, 3))},
        d_opt_state={"m": jnp.zeros(5)},
    )


def test_save_load_roundtrip(tmp_path):
    d = str(tmp_path)
    state = _dummy_state(2.0)
    save_checkpoint(d, 10, state, epoch=1)
    assert os.path.isdir(os.path.join(d, "train_10"))
    assert os.path.isdir(os.path.join(d, "eval_10"))

    restored, epoch = load_checkpoint(latest_checkpoint(d), _dummy_state(0.0))
    assert epoch == 1
    np.testing.assert_array_equal(
        np.asarray(restored.g_params["a"]), np.ones((2, 3)) * 2.0
    )
    g = load_eval_params(os.path.join(d, "eval_10"), _dummy_state(0.0).g_params)
    np.testing.assert_array_equal(np.asarray(g["a"]), np.ones((2, 3)) * 2.0)
    # raw restore (no target): serving path that carries the full tree
    g_raw = load_eval_params(os.path.join(d, "eval_10"))
    np.testing.assert_array_equal(np.asarray(g_raw["a"]), np.ones((2, 3)) * 2.0)
    np.testing.assert_array_equal(np.asarray(g_raw["b"]["c"]), np.zeros(4))


def test_keep_ckpts_pruning(tmp_path):
    d = str(tmp_path)
    for step in [10, 20, 30, 40]:
        save_checkpoint(d, step, _dummy_state(), epoch=0, keep_ckpts=2)
    names = sorted(n for n in os.listdir(d) if n.startswith("train_"))
    assert names == ["train_30", "train_40"]
    assert latest_checkpoint(d).endswith("train_40")


def test_latest_checkpoint_empty(tmp_path):
    assert latest_checkpoint(str(tmp_path)) is None


def test_merge_compatible():
    init = {"a": jnp.zeros((2, 3)), "b": jnp.zeros(4), "new": jnp.zeros(7)}
    loaded = {"a": jnp.ones((2, 3)), "b": jnp.ones(5), "old": jnp.ones(1)}
    merged, used, skipped = merge_compatible(init, loaded)
    np.testing.assert_array_equal(np.asarray(merged["a"]), np.ones((2, 3)))
    np.testing.assert_array_equal(np.asarray(merged["b"]), np.zeros(4))  # shape mismatch
    np.testing.assert_array_equal(np.asarray(merged["new"]), np.zeros(7))
    assert used == 1 and skipped == 2
