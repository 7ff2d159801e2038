"""Core neural building blocks: weight-normed 1-D convs, WaveNet, DDSConv.

Layout: channels-last [B, T, C]; masks [B, T, 1].

Weight norm follows torch semantics (w = g * v / ||v||, per-output-channel
norm over (k, in); torch.nn.utils.weight_norm dim=0): the scale ``g`` is
initialized to ||v|| so the effective kernel at init equals the raw init —
this matters for GAN training dynamics. flax.linen.WeightNorm initializes
g=1 (normalizing the kernel), so we roll our own.

Behavioral references: /root/reference/WaveNet.py, LayerNorm.py,
StochasticDurationPredictor.py:255-320 (DDSConv), commons.py:63-70 (fused
gated activation — on TPU, XLA fuses the add/tanh/sigmoid/mul chain into the
preceding conv epilogue, so no custom kernel is needed).
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

LRELU_SLOPE = 0.1


def torch_conv_init(fan_in: int):
    """torch.nn.Conv1d default init: kaiming_uniform(a=sqrt(5)) == U(-b, b)
    with b = 1/sqrt(fan_in_total). Used so fresh models start in the same
    regime as the reference."""
    bound = 1.0 / (fan_in**0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def normal_init(std: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std

    return init


class Conv1d(nn.Module):
    """Plain 1-D conv, channels-last, torch-style explicit padding.

    kernel: [k, in/groups, out]. padding: int (symmetric), tuple, or 'SAME'.
    """

    features: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    groups: int = 1
    padding: int | tuple[int, int] | str = "SAME"
    use_bias: bool = True
    use_weight_norm: bool = False
    kernel_init: Callable | None = None
    zero_init: bool = False  # zero both kernel and bias (flow output heads)
    dtype: jnp.dtype | None = None
    dense_grouped: bool = False  # lower a grouped conv as ONE dense conv
    # with a block-diagonal kernel (identical math + params + grads). A
    # grouped conv with in/g=16 runs 16-wide matmuls per group — ~1.5% of a
    # 128x128 MXU tile; the dense form costs g x the FLOPs but uses full
    # tiles. Whether that trades positive is measured per-shape
    # (tools/bench_grouped_conv.py) — see README perf notes.

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        k = self.kernel_size
        shape = (k, in_features // self.groups, self.features)
        if self.zero_init:
            kinit = nn.initializers.zeros
        elif self.kernel_init is not None:
            kinit = self.kernel_init
        else:
            kinit = torch_conv_init((in_features // self.groups) * k)
        kernel = self.param("kernel", kinit, shape)

        if self.use_weight_norm:
            def g_init(rng, s):
                del rng, s
                return jnp.sqrt(jnp.sum(kernel * kernel, axis=(0, 1)) + 1e-12)

            g = self.param("g", g_init, (self.features,))
            norm = jnp.sqrt(jnp.sum(kernel * kernel, axis=(0, 1), keepdims=True) + 1e-12)
            kernel = kernel * (g / norm)

        if isinstance(self.padding, str):
            padding = self.padding
        elif isinstance(self.padding, int):
            padding = [(self.padding, self.padding)]
        else:
            padding = [tuple(self.padding)]

        dtype = self.dtype or x.dtype
        fgc = self.groups
        if self.groups > 1 and self.dense_grouped:
            g = self.groups
            cg = in_features // g
            og = self.features // g
            kr = kernel.reshape(k, cg, g, og)
            eye = jnp.eye(g, dtype=kernel.dtype)
            kernel = jnp.einsum("kcgo,gh->kgcho", kr, eye).reshape(
                k, in_features, self.features
            )
            fgc = 1
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            kernel.astype(dtype),
            window_strides=(self.stride,),
            padding=padding,
            rhs_dilation=(self.dilation,),
            dimension_numbers=("NWC", "WIO", "NWC"),
            feature_group_count=fgc,
        )
        if self.use_bias:
            binit = (
                nn.initializers.zeros
                if self.zero_init
                else torch_conv_init((in_features // self.groups) * k)
            )
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(dtype)
        return y


class ConvTranspose1d(nn.Module):
    """Transposed 1-D conv with torch padding/output_padding semantics.

    Lowered as an input-dilated conv with a spatially-flipped kernel — the
    XLA-native formulation (no gradient trickery). Output length is exactly
    T*stride for the HiFi-GAN configs (padding=u//2+u%2, output_padding=u%2;
    reference HiFiGANGenerator.py:52-64).
    """

    features: int
    kernel_size: int
    stride: int
    padding: int = 0
    output_padding: int = 0
    use_bias: bool = True
    use_weight_norm: bool = True
    kernel_init: Callable | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        k = self.kernel_size
        # torch layout for ConvTranspose1d weight is [in, out, k]; we keep
        # [k, in, out] and flip spatially at use.
        kinit = self.kernel_init or torch_conv_init(
            in_features * k // 1
        )  # torch fan_in for transposed conv counts in_channels * k
        kernel = self.param("kernel", kinit, (k, in_features, self.features))

        if self.use_weight_norm:
            # torch weight_norm(ConvTranspose1d) dim=0 normalizes per
            # *input* channel (weight shape [in, out, k] -> dim 0 = in).
            def g_init(rng, s):
                del rng, s
                return jnp.sqrt(jnp.sum(kernel * kernel, axis=(0, 2)) + 1e-12)

            g = self.param("g", g_init, (in_features,))
            norm = jnp.sqrt(
                jnp.sum(kernel * kernel, axis=(0, 2), keepdims=True) + 1e-12
            )
            kernel = kernel * (g[None, :, None] / norm)

        pad_lo = k - 1 - self.padding
        pad_hi = k - 1 - self.padding + self.output_padding
        dtype = self.dtype or x.dtype
        y = jax.lax.conv_general_dilated(
            x.astype(dtype),
            jnp.flip(kernel, axis=0).astype(dtype),
            window_strides=(1,),
            padding=[(pad_lo, pad_hi)],
            lhs_dilation=(self.stride,),
            dimension_numbers=("NWC", "WIO", "NWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", torch_conv_init(in_features * k), (self.features,)
            )
            y = y + bias.astype(dtype)
        return y


class LayerNorm(nn.Module):
    """LayerNorm over the channel (last) axis — reference LayerNorm.py:6-33
    transposes to do this; channels-last makes it the natural op."""

    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.LayerNorm(epsilon=self.eps, name="ln")(x)


class WaveNet(nn.Module):
    """Non-causal WaveNet stack with gated tanh/sigmoid units and global
    conditioning (reference WaveNet.py:7-110).

    All convs weight-normed. The per-layer conditioning slice comes from one
    big 1x1 cond conv (reference WaveNet.py:49-51).
    """

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        h = self.hidden_channels
        output = jnp.zeros_like(x)
        if g is not None:
            g = Conv1d(
                2 * h * self.n_layers, 1, use_weight_norm=True, name="cond_layer"
            )(g)

        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = Conv1d(
                2 * h,
                self.kernel_size,
                dilation=dilation,
                padding=(self.kernel_size * dilation - dilation) // 2,
                use_weight_norm=True,
                name=f"in_{i}",
            )(x)
            if g is not None:
                g_l = g[..., i * 2 * h : (i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = jnp.tanh(x_in[..., :h] + g_l[..., :h]) * jax.nn.sigmoid(
                x_in[..., h:] + g_l[..., h:]
            )
            acts = nn.Dropout(self.p_dropout, deterministic=deterministic)(acts)

            res_skip_channels = 2 * h if i < self.n_layers - 1 else h
            res_skip = Conv1d(
                res_skip_channels, 1, use_weight_norm=True, name=f"res_skip_{i}"
            )(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack (k^i dilation, LayerNorm, GELU)
    (reference StochasticDurationPredictor.py:255-320)."""

    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size**i
            y = Conv1d(
                self.channels,
                self.kernel_size,
                dilation=dilation,
                groups=self.channels,
                padding=(self.kernel_size * dilation - dilation) // 2,
                name=f"sep_{i}",
            )(x * x_mask)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm1_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = Conv1d(self.channels, 1, name=f"pointwise_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, name=f"norm2_{i}")(y)
            y = jax.nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = x + y
        return x * x_mask
