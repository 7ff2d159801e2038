"""Monotonic Alignment Search (MAS) — on-device, no host round-trip.

Behavioral reference: /root/reference/monotonic_align/core.pyx (the Glow-TTS
Viterbi DP) and its host wrapper monotonic_align/__init__.py:7-20, which does
a GPU->CPU->Cython->GPU round-trip every training step. Here the whole DP +
backtrack runs on the TPU inside jit.

Algorithm (per sample, value matrix [T_y frames, T_x text]):
  forward:  value[y, x] = neg_cent[y, x] + max(value[y-1, x], value[y-1, x-1])
            with value[y, x] = -BIG for x > y (a path step advances x by 0/1,
            starting at (0, 0)), matching core.pyx:15-28.
  backtrack: from (t_y-1, t_x-1) downward; x decrements iff x == y or
            value[y-1, x] < value[y-1, x-1] (core.pyx:30-33).

The full-lattice formulation computes exactly the Cython band values for all
cells the backtrack can visit (the band restriction in core.pyx:16 is a CPU
compute-saving detail, not a semantic one).

Two implementations:
  * ``maximum_path_scan`` — pure lax.scan over frames; the correctness oracle,
    runs anywhere.
  * ``maximum_path_pallas`` — Pallas TPU kernel; whole DP in VMEM, one kernel
    per batch tile (see vits_tpu/ops/mas_pallas.py).

``maximum_path`` dispatches to the pallas kernel on TPU, scan elsewhere.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG_NEG = -1e9


def _forward_values(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """DP value lattice. neg_cent/mask: [B, T_y, T_x] -> values [T_y, B, T_x]."""
    b, t_y, t_x = neg_cent.shape
    neg = jnp.where(mask > 0, neg_cent.astype(jnp.float32), _BIG_NEG)
    xs = jnp.moveaxis(neg, 1, 0)  # [T_y, B, T_x]

    col = jnp.arange(t_x)
    row0 = xs[0] + jnp.where(col[None, :] == 0, 0.0, _BIG_NEG)

    def step(prev, neg_row):
        shifted = jnp.concatenate(
            [jnp.full_like(prev[:, :1], _BIG_NEG), prev[:, :-1]], axis=1
        )
        cur = neg_row + jnp.maximum(prev, shifted)
        return cur, cur

    _, rows = jax.lax.scan(step, row0, xs[1:])
    return jnp.concatenate([row0[None], rows], axis=0)


def _backtrack(values: jax.Array, t_ys: jax.Array, t_xs: jax.Array) -> jax.Array:
    """values: [T_y, B, T_x]; per-sample lengths -> path [B, T_y, T_x]."""
    t_y, b, t_x = values.shape
    vprev = jnp.concatenate(
        [jnp.full_like(values[:1], _BIG_NEG), values[:-1]], axis=0
    )
    ys = jnp.arange(t_y - 1, -1, -1)
    batch_ix = jnp.arange(b)
    col = jnp.arange(t_x)

    def step(idx, inputs):
        y, vprev_row = inputs
        idx = jnp.where(y == t_ys - 1, t_xs - 1, idx)
        active = y < t_ys
        row = jnp.where(
            active[:, None] & (col[None, :] == idx[:, None]), 1.0, 0.0
        )
        v_i = vprev_row[batch_ix, idx]
        v_im1 = vprev_row[batch_ix, jnp.maximum(idx - 1, 0)]
        dec = (idx == y) | (v_i < v_im1)
        new_idx = jnp.where(active & (idx != 0) & dec, idx - 1, idx)
        return new_idx, row

    idx0 = jnp.zeros((b,), jnp.int32)
    _, rows = jax.lax.scan(step, idx0, (ys, vprev[::-1]))
    return jnp.moveaxis(rows[::-1], 1, 0)  # [B, T_y, T_x]


def maximum_path_scan(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """MAS via lax.scan. neg_cent, mask: [B, T_y, T_x] -> path [B, T_y, T_x]."""
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)
    values = _forward_values(neg_cent, mask)
    path = _backtrack(values, t_ys, t_xs)
    return path.astype(neg_cent.dtype) * mask


def maximum_path(neg_cent: jax.Array, mask: jax.Array) -> jax.Array:
    """MAS: dispatches to the Pallas TPU kernel when available.

    neg_cent: [B, T_y, T_x] similarity (frames x text), mask likewise.
    Returns hard path [B, T_y, T_x] in neg_cent's dtype.
    """
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover - no backend at trace time
        platform = "cpu"
    if platform == "tpu":
        from vits_tpu.ops.mas_pallas import maximum_path_pallas

        return maximum_path_pallas(neg_cent, mask)
    return maximum_path_scan(neg_cent, mask)
