"""Text encoder: phoneme + language-id embeddings -> rel-pos transformer ->
prior stats (m, logs).

Behavioral reference: /root/reference/TextEncoder.py:12-104. Notably the
language ("tone") embedding has 6 ids and is zeroed where t == 0
(TextEncoder.py:75-77) — here done maskwise instead of in-place indexing.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.attention import RelativePositionTransformer
from vits_tpu.models.modules import Conv1d
from vits_tpu.ops.commons import sequence_mask

N_LANGUAGES = 6  # reference TextEncoder.py:54


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T] int symbol ids
        t: jax.Array,  # [B, T] int language ids
        x_lengths: jax.Array,  # [B]
        deterministic: bool = True,
    ):
        h = self.hidden_channels
        emb_init = lambda key, shape, dtype=jnp.float32: (
            jax.random.normal(key, shape, dtype) * (h**-0.5)
        )
        emb = nn.Embed(self.n_vocab, h, embedding_init=emb_init, name="emb")
        emb_t = nn.Embed(N_LANGUAGES, h, embedding_init=emb_init, name="emb_t")

        # clip ids defensively: out-of-range gather fills NaN under XLA
        # (silently), unlike torch's loud IndexError
        x = jnp.clip(x, 0, self.n_vocab - 1)
        t = jnp.clip(t, 0, N_LANGUAGES - 1)
        te = emb_t(t) * (t != 0)[..., None]  # zero where language id == 0
        x = (emb(x) + te) * math.sqrt(h)  # [B, T, H]

        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(x.dtype)
        x = x * x_mask

        x = RelativePositionTransformer(
            h,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
            name="encoder",
        )(x, x_mask, deterministic=deterministic)

        stats = Conv1d(self.out_channels * 2, 1, name="proj")(x) * x_mask
        m, logs = stats[..., : self.out_channels], stats[..., self.out_channels :]
        return x, m, logs, x_mask
