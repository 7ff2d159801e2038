"""Posterior encoder: 1x1 pre -> WaveNet -> 1x1 proj -> (m, logs) -> sample z.

Behavioral reference: /root/reference/PosteriorEncoder.py:10-67. Used twice in
the synthesizer: for the linear spectrogram and for the yingram (pitch)
posterior (SynthesizerTrn.py:122-136). Sampling takes an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.modules import Conv1d, WaveNet
from vits_tpu.ops.commons import sequence_mask


class PosteriorEncoder(nn.Module):
    in_channels: int
    out_channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    bf16: bool = False  # WaveNet stack in bfloat16; stats/sampling in f32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, C_in]
        x_lengths: jax.Array,  # [B]
        g: jax.Array | None = None,  # [B, 1, gin]
        rng: jax.Array | None = None,
    ):
        x_mask = sequence_mask(x_lengths, x.shape[1])[..., None].astype(jnp.float32)
        if self.bf16:
            x = x.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16) if g is not None else None
            x_mask = x_mask.astype(jnp.bfloat16)
        h = Conv1d(self.hidden_channels, 1, name="pre")(x) * x_mask
        h = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="enc",
        )(h, x_mask, g=g)
        stats = (Conv1d(self.out_channels * 2, 1, name="proj")(h) * x_mask).astype(
            jnp.float32
        )
        x_mask = x_mask.astype(jnp.float32)
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        if rng is None:
            z = m * x_mask
        else:
            eps = jax.random.normal(rng, m.shape, m.dtype)
            z = (m + eps * jnp.exp(logs)) * x_mask
        return z, m, logs, x_mask
