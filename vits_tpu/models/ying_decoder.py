"""Yin decoder: reconstructs scope-cropped yingram from z_yin with a random
per-sample integer scope shift (pitch-shift augmentation).

Behavioral reference: /root/reference/YingDecoder.py. The python crop loops
(:43-46) become vmapped dynamic slices (ops.commons.crop_scope); the
torch.randint shift (:50-54, :64-69) takes an explicit PRNG key.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.modules import Conv1d, WaveNet
from vits_tpu.ops.commons import crop_scope


class YingDecoder(nn.Module):
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    yin_start: int
    yin_scope: int
    yin_shift_range: int
    gin_channels: int = 0

    def setup(self):
        self.pre = Conv1d(self.hidden_channels, 1, name="pre")
        self.dec = WaveNet(
            self.hidden_channels,
            self.kernel_size,
            self.dilation_rate,
            self.n_layers,
            gin_channels=self.gin_channels,
            name="dec",
        )
        self.proj = Conv1d(self.yin_scope, 1, name="proj")

    def _decode(self, z_yin_crop, z_mask, g):
        x = self.pre(z_yin_crop) * z_mask
        x = self.dec(x, z_mask, g=g)
        return self.proj(x) * z_mask

    def infer(self, z_yin, z_mask, g=None, rng=None):
        """Random-shift crop + decode (reference YingDecoder.py:48-61)."""
        b = z_yin.shape[0]
        scope_shift = jax.random.randint(
            rng, (b,), -self.yin_shift_range, self.yin_shift_range
        )
        z_yin_crop = crop_scope(z_yin, self.yin_start, self.yin_scope, scope_shift)
        return self._decode(z_yin_crop, z_mask, g)

    def __call__(self, z_yin, yin_gt, z_mask, g=None, rng=None):
        """Training: returns (yin_gt_crop, yin_gt_shifted_crop, yin_hat_crop,
        z_yin_crop, scope_shift) (reference YingDecoder.py:63-84)."""
        b = z_yin.shape[0]
        scope_shift = jax.random.randint(
            rng, (b,), -self.yin_shift_range, self.yin_shift_range
        )
        z_yin_crop = crop_scope(z_yin, self.yin_start, self.yin_scope, scope_shift)
        yin_gt_shifted_crop = crop_scope(
            yin_gt, self.yin_start, self.yin_scope, scope_shift
        )
        yin_gt_crop = crop_scope(
            yin_gt, self.yin_start, self.yin_scope, jnp.zeros_like(scope_shift)
        )
        yin_hat_crop = self._decode(z_yin_crop, z_mask, g)
        return yin_gt_crop, yin_gt_shifted_crop, yin_hat_crop, z_yin_crop, scope_shift
