"""Normalizing-flow components: affine coupling block (the "flow" between
posterior and prior) and the spline flows used by the duration predictor.

Behavioral references: /root/reference/ResidualCouplingBlock.py,
StochasticDurationPredictor.py:153-252.

Layout: [B, T, C]; masks [B, T, 1]. Each flow returns (y, logdet) forward
and y in reverse (reverse is a static python flag -> two traced graphs).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.modules import Conv1d, WaveNet, DDSConv
from vits_tpu.ops.spline import piecewise_rational_quadratic_transform


class Flip(nn.Module):
    """Channel-order flip (reference ResidualCouplingBlock.py:88-96)."""

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, reverse: bool = False):
        x = jnp.flip(x, axis=-1)
        if not reverse:
            return x, jnp.zeros((x.shape[0],), x.dtype)
        return x


class ElementwiseAffine(nn.Module):
    """Per-channel affine y = m + exp(logs) * x (reference SDP:164-184)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class Log(nn.Module):
    """y = log(clamp(x, 1e-5)) (reference SDP:153-161)."""

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False):
        if not reverse:
            y = jnp.log(jnp.clip(x, min=1e-5)) * x_mask
            logdet = jnp.sum(-y, axis=(1, 2))
            return y, logdet
        return jnp.exp(x) * x_mask


class ResidualCouplingLayer(nn.Module):
    """Affine (mean-only here) coupling with a WaveNet conditioner
    (reference ResidualCouplingBlock.py:99-168). Output head zero-init so the
    flow starts as identity (:136-138)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    p_dropout: float = 0.0
    gin_channels: int = 0
    mean_only: bool = False

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.hidden_channels, 1, name="pre")(x0) * x_mask
        h = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            p_dropout=self.p_dropout,
            name="enc",
        )(h, x_mask, g=g)
        stats = Conv1d(
            half * (2 - self.mean_only), 1, zero_init=True, name="post"
        )(h) * x_mask
        if not self.mean_only:
            m, logs = stats[..., :half], stats[..., half:]
        else:
            m = stats
            logs = jnp.zeros_like(m)

        if not reverse:
            x1 = m + x1 * jnp.exp(logs) * x_mask
            logdet = jnp.sum(logs, axis=(1, 2))
            return jnp.concatenate([x0, x1], axis=-1), logdet
        x1 = (x1 - m) * jnp.exp(-logs) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling + flip) (reference ResidualCouplingBlock.py:9-85)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        layers = []
        for i in range(self.n_flows):
            layers.append(
                ResidualCouplingLayer(
                    self.channels,
                    self.hidden_channels,
                    self.kernel_size,
                    self.dilation_rate,
                    self.n_layers,
                    gin_channels=self.gin_channels,
                    mean_only=True,
                    name=f"coupling_{i}",
                )
            )
            layers.append(Flip(name=f"flip_{i}"))
        self.flows = layers

    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, reverse=False)
        else:
            for flow in reversed(self.flows):
                x = flow(x, x_mask, g=g, reverse=True)
        return x


class ConvFlow(nn.Module):
    """Spline coupling flow: DDSConv conditioner -> RQ-spline on x1
    (reference StochasticDurationPredictor.py:187-252). Param head zero-init."""

    in_channels: int
    filter_channels: int
    kernel_size: int
    n_layers: int
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = Conv1d(self.filter_channels, 1, name="pre")(x0)
        h = DDSConv(
            self.filter_channels, self.kernel_size, self.n_layers, name="convs"
        )(h, x_mask, g=g)
        h = Conv1d(
            half * (self.num_bins * 3 - 1), 1, zero_init=True, name="proj"
        )(h) * x_mask

        b, t, _ = x0.shape
        # [B, T, half*(3K-1)] -> [B, T, half, 3K-1]
        h = h.reshape(b, t, half, self.num_bins * 3 - 1)
        denom = math.sqrt(self.filter_channels)
        uw = h[..., : self.num_bins] / denom
        uh = h[..., self.num_bins : 2 * self.num_bins] / denom
        ud = h[..., 2 * self.num_bins :]

        x1, logabsdet = piecewise_rational_quadratic_transform(
            x1, uw, uh, ud, inverse=reverse, tails="linear",
            tail_bound=self.tail_bound,
        )
        x = jnp.concatenate([x0, x1], axis=-1) * x_mask
        if not reverse:
            logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
            return x, logdet
        return x
