"""GAN / VAE losses (LSGAN + feature matching + masked Gaussian KL).

Behavioral reference: /root/reference/losses.py. All loss math in float32
(the reference forces fp32 under autocast, losses.py:8-9,20-21,35,49-53);
under a bf16 compute policy the cast here is the stability boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def feature_loss(fmap_r, fmap_g) -> jax.Array:
    """L1 feature matching x2 (reference losses.py:4-12). Real fmaps are
    detached."""
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            rl = jax.lax.stop_gradient(rl.astype(jnp.float32))
            gl = gl.astype(jnp.float32)
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    """LSGAN D loss: (1-D(y))^2 + D(y_hat)^2 (reference losses.py:15-28)."""
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        dr = dr.astype(jnp.float32)
        dg = dg.astype(jnp.float32)
        r_loss = jnp.mean((1.0 - dr) ** 2)
        g_loss = jnp.mean(dg**2)
        loss += r_loss + g_loss
        r_losses.append(r_loss)
        g_losses.append(g_loss)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    """LSGAN G loss: (1-D(y_hat))^2 (reference losses.py:31-40)."""
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg.astype(jnp.float32)) ** 2)
        gen_losses.append(l)
        loss += l
    return loss, gen_losses


def kl_loss(z_p, logs_q, m_p, logs_p, z_mask) -> jax.Array:
    """Masked Gaussian KL between posterior sample and expanded prior
    (reference losses.py:43-60). All args [B, T, C] / mask [B, T, 1]."""
    z_p = z_p.astype(jnp.float32)
    logs_q = logs_q.astype(jnp.float32)
    m_p = m_p.astype(jnp.float32)
    logs_p = logs_p.astype(jnp.float32)
    z_mask = z_mask.astype(jnp.float32)

    kl = logs_p - logs_q - 0.5
    kl += 0.5 * ((z_p - m_p) ** 2) * jnp.exp(-2.0 * logs_p)
    kl = jnp.sum(kl * z_mask)
    return kl / jnp.sum(z_mask)
