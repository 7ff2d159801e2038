"""Mask / path / slicing primitives.

Behavioral reference: /root/reference/commons.py. Re-designed for XLA: the
per-sample Python loops of the reference (slice_segments, commons.py:29-37;
crop_scope, SynthesizerTrn.py:165-177) become vmapped ``lax.dynamic_slice``;
everything is static-shape and jit-safe.

Layout convention: sequence tensors are channels-last ``[B, T, C]`` (TPU
prefers the feature dimension last so 1-D convolutions lower onto the MXU).
Masks are ``[B, T, 1]`` so they broadcast over channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sequence_mask(length: jax.Array, max_length: int) -> jax.Array:
    """Boolean mask [B, T] with True where t < length[b].

    Reference: commons.py:79-98 (same semantics; max_length must be static
    under jit, so it is a required python int here).
    """
    x = jnp.arange(max_length, dtype=length.dtype)
    return x[None, :] < length[:, None]


def generate_path(duration: jax.Array, mask: jax.Array) -> jax.Array:
    """Hard monotonic alignment path from integer durations.

    duration: [B, T_x]   (per-phoneme frame counts)
    mask:     [B, T_y, T_x]  (attn mask, y=frames, x=text)
    returns:  [B, T_y, T_x] one-hot-ish path (float)

    Reference: commons.py:101-117 — cumulative duration -> per-x frame
    interval, realized as difference of sequence masks.
    """
    b, t_y, t_x = mask.shape
    cum_duration = jnp.cumsum(duration, axis=-1)  # [B, T_x]
    # frame index t is assigned to phoneme x iff cum[x-1] <= t < cum[x]
    frames = jnp.arange(t_y, dtype=cum_duration.dtype)  # [T_y]
    path = frames[None, :, None] < cum_duration[:, None, :]  # [B, T_y, T_x]
    path_prev = jnp.concatenate(
        [jnp.zeros_like(path[..., :1]), path[..., :-1]], axis=-1
    )
    path = jnp.logical_and(path, jnp.logical_not(path_prev))
    return path.astype(mask.dtype) * mask


def slice_segments(x: jax.Array, ids_str: jax.Array, segment_size: int) -> jax.Array:
    """Per-sample fixed-length time slices, vmapped dynamic_slice.

    x: [B, T, C]; ids_str: [B] int start frames -> [B, segment_size, C].
    Reference: commons.py:29-37 (python loop over batch -> vmap here).
    """

    def _one(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, s, segment_size, axis=0)

    return jax.vmap(_one)(x, ids_str)


def rand_slice_segments_for_cat(
    x: jax.Array,
    x_lengths: jax.Array,
    segment_size: int,
    rng: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Random slices with ONE offset per half-batch, duplicated.

    The training batch is [z_dec; z_dec_shifted] stacked on the batch axis
    (2B rows); both halves must be sliced at identical offsets so the
    pitch-shift consistency loss compares aligned windows.

    x: [2B, T, C]; x_lengths: [2B]. Returns (slices [2B, seg, C], ids [2B]).
    Reference: commons.py:40-55 (torch.rand on B//2, tiled to B).
    """
    b = x.shape[0]
    u = jax.random.uniform(rng, (b // 2,))
    u = jnp.concatenate([u, u], axis=0)
    ids_str_max = x_lengths - segment_size + 1
    ids_str = (u * ids_str_max).astype(jnp.int32)
    ids_str = jnp.maximum(ids_str, 0)
    return slice_segments(x, ids_str, segment_size), ids_str


def intersperse_with_language_id(text, lang, item):
    """Blank-interleave a symbol-id list with per-char language ids.

    Pure-python host-side helper (runs in the data pipeline, not under jit).
    Reference: commons.py:18-26 — blanks take the language id of the next
    character (and the final blank repeats the last language id).
    """
    n = len(text)
    out_text = [item] * (2 * n + 1)
    out_lang = [None] * (2 * n + 1)
    out_text[1::2] = text
    out_lang[1::2] = lang
    out_lang[::2] = list(lang) + [lang[-1]]
    return out_text, out_lang


def subsequent_mask(length: int) -> jax.Array:
    """Lower-triangular causal mask [1, 1, T, T] (reference commons.py:58-60)."""
    return jnp.tril(jnp.ones((length, length)))[None, None]


def crop_scope(
    x: jax.Array, yin_start: int, yin_scope: int, scope_shift: jax.Array
) -> jax.Array:
    """Per-sample channel-window crop of a yingram-like tensor.

    x: [B, T, C_yin]; scope_shift: [B] int32 (may be negative).
    Returns [B, T, yin_scope] = x[b, :, yin_start+shift[b] : +yin_scope].
    Reference: SynthesizerTrn.py:170-177 / YingDecoder.py:43-46 (python
    loops -> vmapped dynamic_slice on the channel axis).
    """

    def _one(xb, s):
        return jax.lax.dynamic_slice_in_dim(xb, yin_start + s, yin_scope, axis=1)

    return jax.vmap(_one)(x, scope_shift)
