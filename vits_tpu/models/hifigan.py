"""Hierarchical HiFi-GAN generator (multi-scale outputs for Avocodo CoMBD).

Behavioral reference: /root/reference/HiFiGANGenerator.py. Upsampling via
weight-normed transposed convs (padding u//2+u%2, output_padding u%2,
:52-64) so T_out = T_in * prod(rates) exactly; MRF resblocks; hierarchical
``conv_posts`` for the last 3 stages (:76-77,114-140).

TPU notes: channels-last 1-D convs lower onto the MXU; at [B, 8192, 512]
blocks the generator is MXU-bound, which is where we want it. Weight norm is
computed on the fly (cheap — per-step kernel normalization is O(params)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.modules import (
    Conv1d,
    ConvTranspose1d,
    normal_init,
    LRELU_SLOPE,
)


class ResBlock1(nn.Module):
    """3x (dilated conv + conv) with leaky-relu pre-activations
    (reference HiFiGANGenerator.py:150-262)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array | None = None) -> jax.Array:
        for j, d in enumerate(self.dilation):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                name=f"conv1_{j}",
            )(xt)
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                padding=(self.kernel_size - 1) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                name=f"conv2_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class ResBlock2(nn.Module):
    """2x dilated conv variant (reference HiFiGANGenerator.py:265-322)."""

    channels: int
    kernel_size: int = 3
    dilation: tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x: jax.Array, x_mask: jax.Array | None = None) -> jax.Array:
        for j, d in enumerate(self.dilation):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            if x_mask is not None:
                xt = xt * x_mask
            xt = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=d,
                padding=(self.kernel_size * d - d) // 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                name=f"conv_{j}",
            )(xt)
            x = xt + x
        if x_mask is not None:
            x = x * x_mask
        return x


class HiFiGANGenerator(nn.Module):
    """conv_pre -> [lrelu -> up -> MRF]xN -> lrelu -> conv_post -> tanh,
    with hierarchical outputs at the last 3 stages via ``hier`` flag.

    Reference: HiFiGANGenerator.py:13-147.
    """

    initial_channel: int
    resblock_type: str
    resblock_kernel_sizes: tuple[int, ...]
    resblock_dilation_sizes: tuple[tuple[int, ...], ...]
    upsample_rates: tuple[int, ...]
    upsample_initial_channel: int
    upsample_kernel_sizes: tuple[int, ...]
    gin_channels: int = 0
    bf16: bool = False  # compute in bfloat16 (params stay f32); outputs f32

    @nn.compact
    def _body(self, x: jax.Array, g: jax.Array | None, hier: bool):
        num_kernels = len(self.resblock_kernel_sizes)
        num_upsamples = len(self.upsample_rates)
        resblock_cls = ResBlock1 if self.resblock_type == "1" else ResBlock2

        if self.bf16:
            x = x.astype(jnp.bfloat16)
            g = g.astype(jnp.bfloat16) if g is not None else None
        x = Conv1d(self.upsample_initial_channel, 7, padding=3, name="conv_pre")(x)
        if g is not None:
            x = x + Conv1d(self.upsample_initial_channel, 1, name="cond")(g)

        outs = []
        for i, (u, k) in enumerate(zip(self.upsample_rates, self.upsample_kernel_sizes)):
            ch = self.upsample_initial_channel // (2 ** (i + 1))
            x = jax.nn.leaky_relu(x, LRELU_SLOPE)
            x = ConvTranspose1d(
                ch,
                k,
                stride=u,
                padding=u // 2 + u % 2,
                output_padding=u % 2,
                use_weight_norm=True,
                kernel_init=normal_init(0.01),
                name=f"up_{i}",
            )(x)
            z_sum = None
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilation_sizes)
            ):
                r = resblock_cls(ch, rk, tuple(rd), name=f"resblock_{i}_{j}")(x)
                z_sum = r if z_sum is None else z_sum + r
            x = z_sum / num_kernels

            if hier and i >= num_upsamples - 3:
                _x = jax.nn.leaky_relu(x)  # default slope, reference :135
                _x = Conv1d(
                    1, 7, padding=3, use_bias=False,
                    name=f"conv_post_{i - num_upsamples + 3}",
                )(_x)
                outs.append(jnp.tanh(_x).astype(jnp.float32))
            if not hier and i == num_upsamples - 1:
                _x = jax.nn.leaky_relu(x)
                _x = Conv1d(1, 7, padding=3, use_bias=False, name="conv_post_2")(_x)
                outs.append(jnp.tanh(_x).astype(jnp.float32))
        return outs

    def __call__(self, x: jax.Array, g: jax.Array | None = None) -> jax.Array:
        """Final-scale waveform [B, T*prod(rates), 1]."""
        return self._body(x, g, hier=False)[-1]

    def hier_forward(self, x: jax.Array, g: jax.Array | None = None):
        """3 waveforms at 1/4x, 1/2x, 1x rates (reference :114-140)."""
        return self._body(x, g, hier=True)
