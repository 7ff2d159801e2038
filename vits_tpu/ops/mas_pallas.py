"""Pallas TPU kernel for Monotonic Alignment Search.

Replaces the reference's Cython/OpenMP kernel + per-step GPU->CPU round-trip
(monotonic_align/core.pyx, monotonic_align/__init__.py:7-20) with an
on-device two-pass kernel (cf. "Super Monotonic Alignment Search",
PAPERS.md — wavefront DP on accelerator):

  pass 1 (forward):  grid over frames y; the previous DP row lives in VMEM
      scratch across grid steps (TPU grids are sequential); each step does
      vectorized [B, T_x] work on the VPU and emits a *decision row*
      dec[y, x] = (value[y-1, x] < value[y-1, x-1]) — everything backtrack
      needs, so the O(T_y * B * T_x) value lattice never hits HBM.
  pass 2 (backtrack): grid over frames in reverse; the running alignment
      index is a ONE-HOT [B, T_x] VMEV row, so "select decision at index"
      and "decrement index" are vectorized mask/roll ops, not scalar loops.

The decision row subsumes the Cython backtrack conditions:
  * x == y      -> value[y-1, x] is -BIG (above diagonal) -> dec true
  * x == 0      -> shifted slot is -BIG -> dec false (never decrement at 0)

Alignment: B is padded to 8 (f32 sublanes), T_x to 128 (lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_NEG = -1e9


def _forward_kernel(neg_ref, dec_ref, prev_ref):
    """Grid step y: read neg row, emit decision row, update prev row."""
    y = pl.program_id(0)
    neg = neg_ref[0]  # [B, T_x]
    b, t_x = neg.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), dimension=1)

    @pl.when(y == 0)
    def _():
        dec_ref[0] = jnp.zeros_like(neg)
        prev_ref[:] = neg + jnp.where(col == 0, 0.0, _BIG_NEG)

    @pl.when(y > 0)
    def _():
        prev = prev_ref[:]
        shifted = pltpu.roll(prev, 1, axis=1)
        shifted = jnp.where(col == 0, _BIG_NEG, shifted)
        dec_ref[0] = (prev < shifted).astype(jnp.float32)
        prev_ref[:] = neg + jnp.maximum(prev, shifted)


def _backtrack_kernel(dec_ref, tys_ref, txs_ref, path_ref, onehot_ref):
    """Reverse grid step (row y = T_y-1-i): trace the path via a one-hot
    index row."""
    i = pl.program_id(0)
    y = pl.num_programs(0) - 1 - i
    dec = dec_ref[0]  # [B, T_x]
    b, t_x = dec.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (b, t_x), dimension=1)
    t_ys = tys_ref[:]  # [B, 1] int32
    t_xs = txs_ref[:]  # [B, 1] int32

    @pl.when(i == 0)
    def _():
        onehot_ref[:] = jnp.zeros_like(dec)

    onehot = onehot_ref[:]
    start = (y == t_ys - 1)  # [B, 1]
    onehot = jnp.where(start, (col == t_xs - 1).astype(jnp.float32), onehot)
    path_ref[0] = onehot
    dec_sel = jnp.sum(dec * onehot, axis=1, keepdims=True)  # [B, 1]
    moved = pltpu.roll(onehot, t_x - 1, axis=1)  # circular shift-left by 1
    onehot_ref[:] = jnp.where(dec_sel > 0.5, moved, onehot)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("interpret",))
def maximum_path_pallas(
    neg_cent: jax.Array, mask: jax.Array, interpret: bool = False
) -> jax.Array:
    """MAS on TPU. neg_cent, mask: [B, T_y, T_x] -> hard path (same shape)."""
    b, t_y, t_x = neg_cent.shape
    t_ys = mask[:, :, 0].sum(axis=1).astype(jnp.int32)
    t_xs = mask[:, 0, :].sum(axis=1).astype(jnp.int32)

    bp = _round_up(max(b, 8), 8)
    xp = _round_up(max(t_x, 128), 128)
    neg = jnp.where(mask > 0, neg_cent.astype(jnp.float32), _BIG_NEG)
    neg = jnp.pad(
        neg, ((0, bp - b), (0, 0), (0, xp - t_x)), constant_values=_BIG_NEG
    )
    neg = jnp.moveaxis(neg, 1, 0)  # [T_y, Bp, Xp]
    # padded rows get t_y=1/t_x=1 so their paths stay in cell (0, 0)
    t_ys_p = jnp.pad(t_ys, (0, bp - b), constant_values=1)[:, None]
    t_xs_p = jnp.pad(t_xs, (0, bp - b), constant_values=1)[:, None]

    dec = pl.pallas_call(
        _forward_kernel,
        grid=(t_y,),
        in_specs=[
            pl.BlockSpec((1, bp, xp), lambda y: (y, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bp, xp), lambda y: (y, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t_y, bp, xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, xp), jnp.float32)],
        interpret=interpret,
    )(neg)

    path = pl.pallas_call(
        _backtrack_kernel,
        grid=(t_y,),
        in_specs=[
            pl.BlockSpec(
                (1, bp, xp),
                lambda i: (t_y - 1 - i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((bp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bp, xp),
            lambda i: (t_y - 1 - i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((t_y, bp, xp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((bp, xp), jnp.float32)],
        interpret=interpret,
    )(dec, t_ys_p, t_xs_p)

    path = jnp.moveaxis(path, 0, 1)[:b, :, :t_x]
    return path.astype(neg_cent.dtype) * mask
