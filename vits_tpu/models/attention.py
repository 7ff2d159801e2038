"""Relative-position multi-head attention + conv FFN transformer.

Behavioral reference: /root/reference/TextEncoder.py:107-665 (the VITS
windowed relative-attention encoder, window_size=4, heads_share=True).

TPU notes: the rel->abs / abs->rel index shuffles are pure pad+reshape ops
(no gathers), exactly as in the reference — XLA folds them into the matmul
epilogues. Text sequences are short (<= ~400 after blank-interleave), so a
full O(T^2) attention on the MXU is the right call — no flash/blockwise
machinery needed at these lengths.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.modules import Conv1d


def _relative_position_to_absolute_position(x: jax.Array) -> jax.Array:
    """[B, H, T, 2T-1] -> [B, H, T, T] (reference TextEncoder.py:505-529)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, t * 2 * t)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, t - 1)))
    x_final = x_flat.reshape(b, h, t + 1, 2 * t - 1)
    return x_final[:, :, :t, t - 1 :]


def _absolute_position_to_relative_position(x: jax.Array) -> jax.Array:
    """[B, H, T, T] -> [B, H, T, 2T-1] (reference TextEncoder.py:531-553)."""
    b, h, t, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, t - 1)))
    x_flat = x.reshape(b, h, t * t + t * (t - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (t, 0)))
    return x_flat.reshape(b, h, t, 2 * t)[:, :, :, 1:]


def _get_relative_embeddings(
    emb: jax.Array, length: int, window_size: int
) -> jax.Array:
    """Pad-then-slice the learned window embeddings to 2*length-1 positions
    (reference TextEncoder.py:474-503). emb: [H_rel, 2W+1, D]."""
    pad_length = max(length - (window_size + 1), 0)
    start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, start : start + 2 * length - 1]


class MultiHeadAttention(nn.Module):
    """Self-attention with windowed relative position embeddings
    (reference TextEncoder.py:205-576)."""

    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: int | None = None
    heads_share: bool = True

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        c: jax.Array,
        attn_mask: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        k_channels = self.channels // self.n_heads
        xavier = nn.initializers.xavier_uniform()
        q = Conv1d(self.channels, 1, kernel_init=xavier, name="conv_q")(x)
        k = Conv1d(self.channels, 1, kernel_init=xavier, name="conv_k")(c)
        v = Conv1d(self.channels, 1, kernel_init=xavier, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]
        # [B, T, C] -> [B, H, T, D]; channel dim factors as (H, D) to match
        # the reference's view(b, n_heads, k_channels, t) on [B, C, T].
        q = q.reshape(b, t_t, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        k = k.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)
        v = v.reshape(b, t_s, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        scores = jnp.einsum(
            "bhtd,bhsd->bhts", q / math.sqrt(k_channels), k
        )

        if self.window_size is not None:
            assert t_s == t_t, "relative attention requires self-attention"
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels**-0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, self.window_size * 2 + 1, k_channels),
            )
            emb_rel_v = self.param(
                "emb_rel_v",
                lambda key, shape: jax.random.normal(key, shape) * rel_stddev,
                (n_heads_rel, self.window_size * 2 + 1, k_channels),
            )
            key_rel = _get_relative_embeddings(emb_rel_k, t_s, self.window_size)
            rel_logits = jnp.einsum(
                "bhtd,hed->bhte", q / math.sqrt(k_channels), key_rel
            )
            scores = scores + _relative_position_to_absolute_position(rel_logits)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)
        output = jnp.einsum("bhts,bhsd->bhtd", p_attn, v)

        if self.window_size is not None:
            rel_weights = _absolute_position_to_relative_position(p_attn)
            value_rel = _get_relative_embeddings(emb_rel_v, t_s, self.window_size)
            output = output + jnp.einsum("bhte,hed->bhtd", rel_weights, value_rel)

        output = output.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return Conv1d(self.out_channels, 1, name="conv_o")(output)


class FeedForwardNetwork(nn.Module):
    """Conv FFN with masked same/causal padding (reference TextEncoder.py:579-665)."""

    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    causal: bool = False

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        if self.kernel_size == 1:
            pad = (0, 0)
        elif self.causal:
            pad = (self.kernel_size - 1, 0)
        else:
            pad = ((self.kernel_size - 1) // 2, self.kernel_size // 2)
        y = Conv1d(self.filter_channels, self.kernel_size, padding=pad, name="conv_1")(
            x * x_mask
        )
        y = jax.nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
        y = Conv1d(self.out_channels, self.kernel_size, padding=pad, name="conv_2")(
            y * x_mask
        )
        return y * x_mask


class RelativePositionTransformer(nn.Module):
    """n_layers x [rel-attn + LN, conv-FFN + LN] (reference TextEncoder.py:107-202)."""

    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, x_mask: jax.Array, deterministic: bool = True
    ) -> jax.Array:
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][
            :, :, :, None
        ]  # [B, 1, T, T]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels,
                self.hidden_channels,
                self.n_heads,
                p_dropout=self.p_dropout,
                window_size=self.window_size,
                name=f"attn_{i}",
            )(x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(x + y)

            y = FeedForwardNetwork(
                self.hidden_channels,
                self.filter_channels,
                self.kernel_size,
                p_dropout=self.p_dropout,
                name=f"ffn_{i}",
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(x + y)
        return x * x_mask
