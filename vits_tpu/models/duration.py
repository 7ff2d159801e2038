"""Stochastic duration predictor (flow-based), with explicit PRNG keys.

Behavioral reference: /root/reference/StochasticDurationPredictor.py:12-150.
Train: posterior spline-flow over (u, z1) conditioned on text+duration
encodings; returns per-sample nll + logq. Reverse: sample 2-ch noise, run the
main flows backward (dropping the final unused flow, reference :140-141),
logw = z0.

The reference detaches x and g (:90-95) — here jax.lax.stop_gradient.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.flows import ConvFlow, ElementwiseAffine, Flip, Log
from vits_tpu.models.modules import Conv1d, DDSConv


class StochasticDurationPredictor(nn.Module):
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0

    def setup(self):
        self.log_flow = Log()
        flows = [ElementwiseAffine(2, name="flow_pre")]
        for i in range(self.n_flows):
            flows.append(
                ConvFlow(2, self.filter_channels, self.kernel_size, n_layers=3,
                         name=f"flow_{i}")
            )
            flows.append(Flip(name=f"flow_flip_{i}"))
        self.flows = flows

        self.post_pre = Conv1d(self.filter_channels, 1, name="post_pre")
        self.post_proj = Conv1d(self.filter_channels, 1, name="post_proj")
        self.post_convs = DDSConv(
            self.filter_channels, self.kernel_size, n_layers=3,
            p_dropout=self.p_dropout, name="post_convs",
        )
        post_flows = [ElementwiseAffine(2, name="post_flow_pre")]
        for i in range(4):
            post_flows.append(
                ConvFlow(2, self.filter_channels, self.kernel_size, n_layers=3,
                         name=f"post_flow_{i}")
            )
            post_flows.append(Flip(name=f"post_flow_flip_{i}"))
        self.post_flows = post_flows

        self.pre = Conv1d(self.filter_channels, 1, name="pre")
        self.proj = Conv1d(self.filter_channels, 1, name="proj")
        self.convs = DDSConv(
            self.filter_channels, self.kernel_size, n_layers=3,
            p_dropout=self.p_dropout, name="convs",
        )
        if self.gin_channels != 0:
            self.cond = Conv1d(self.filter_channels, 1, name="cond")

    def _encode_text(self, x, x_mask, g, deterministic):
        x = jax.lax.stop_gradient(x)
        x = self.pre(x)
        if g is not None:
            g = jax.lax.stop_gradient(g)
            x = x + self.cond(g)
        x = self.convs(x, x_mask, deterministic=deterministic)
        return self.proj(x) * x_mask

    def __call__(
        self,
        x: jax.Array,  # [B, T, C] text encodings
        x_mask: jax.Array,  # [B, T, 1]
        w: jax.Array,  # [B, T, 1] durations
        g: jax.Array | None = None,
        rng: jax.Array | None = None,
        deterministic: bool = True,
    ) -> jax.Array:
        """Training path -> per-sample variational bound nll + logq [B]."""
        x = self._encode_text(x, x_mask, g, deterministic)

        h_w = self.post_pre(w)
        h_w = self.post_convs(h_w, x_mask, deterministic=deterministic)
        h_w = self.post_proj(h_w) * x_mask

        e_q = (
            jax.random.normal(rng, (w.shape[0], w.shape[1], 2), x.dtype) * x_mask
        )
        z_q = e_q
        logdet_tot_q = 0.0
        for flow in self.post_flows:
            z_q, logdet_q = flow(z_q, x_mask, g=(x + h_w))
            logdet_tot_q += logdet_q

        z_u, z1 = z_q[..., :1], z_q[..., 1:]
        u = jax.nn.sigmoid(z_u) * x_mask
        z0 = (w - u) * x_mask
        logdet_tot_q += jnp.sum(
            (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
            axis=(1, 2),
        )
        logq = (
            jnp.sum(-0.5 * (math.log(2 * math.pi) + e_q**2) * x_mask, axis=(1, 2))
            - logdet_tot_q
        )

        z0, logdet = self.log_flow(z0, x_mask)
        logdet_tot = logdet
        z = jnp.concatenate([z0, z1], axis=-1)
        for flow in self.flows:
            z, logdet = flow(z, x_mask, g=x, reverse=False)
            logdet_tot = logdet_tot + logdet
        nll = (
            jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask, axis=(1, 2))
            - logdet_tot
        )
        return nll + logq

    def reverse(
        self,
        x: jax.Array,
        x_mask: jax.Array,
        g: jax.Array | None = None,
        rng: jax.Array | None = None,
        noise_scale: float = 1.0,
        deterministic: bool = True,
    ) -> jax.Array:
        """Inference path -> logw [B, T, 1] (reference :139-150)."""
        x = self._encode_text(x, x_mask, g, deterministic)
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]  # drop the unused extra flow
        z = (
            jax.random.normal(rng, (x.shape[0], x.shape[1], 2), x.dtype)
            * noise_scale
        )
        for flow in flows:
            z = flow(z, x_mask, g=x, reverse=True)
        return z[..., :1]
