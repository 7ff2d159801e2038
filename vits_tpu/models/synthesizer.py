"""SynthesizerTrn: conditional VAE + flow + hierarchical HiFi-GAN generator
with PITS pitch (yingram) controllability.

Behavioral reference: /root/reference/SynthesizerTrn.py. Train forward
(:186-277): text-enc -> dual posterior encoders (spec + yin) -> flow -> MAS
-> SDP duration loss -> random segment slice (duplicated-offset 2B trick) ->
hierarchical decode -> on-device yingram of the output. Inference (:325-443):
text-enc -> SDP(reverse) -> path expand -> flow(reverse) -> scope crop ->
decode, including the staged latency-control variants.

TPU-first notes:
  * every stochastic site takes a key split from one per-call `rng`
  * MAS is the on-device kernel (ops.mas), no host round-trip
  * inference is fixed-shape: callers pass static `max_frames`; real lengths
    ride in y_mask (XLA requires static shapes; the reference's dynamic
    y_lengths becomes mask semantics)
  * per-sample crops/slices are vmapped dynamic slices
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from vits_tpu.models.text_encoder import TextEncoder
from vits_tpu.models.posterior_encoder import PosteriorEncoder
from vits_tpu.models.flows import ResidualCouplingBlock
from vits_tpu.models.duration import StochasticDurationPredictor
from vits_tpu.models.hifigan import HiFiGANGenerator
from vits_tpu.models.ying_decoder import YingDecoder
from vits_tpu.ops.commons import (
    sequence_mask,
    generate_path,
    rand_slice_segments_for_cat,
    crop_scope,
)
from vits_tpu.ops.mas import maximum_path
from vits_tpu.ops.yin import Yingram


class SynthesizerTrn(nn.Module):
    num_chars: int
    spec_channels: int
    segment_size: int  # in samples
    midi_start: int
    midi_end: int
    octave_range: int
    inter_channels: int
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int
    p_dropout: float
    resblock: str
    resblock_kernel_sizes: Sequence[int]
    resblock_dilation_sizes: Sequence[Sequence[int]]
    upsample_rates: Sequence[int]
    upsample_initial_channel: int
    upsample_kernel_sizes: Sequence[int]
    yin_channels: int
    yin_start: int
    yin_scope: int
    yin_shift_range: int
    n_speakers: int = 0
    gin_channels: int = 0
    sampling_rate: int = 22050
    filter_length: int = 1024
    hop_length: int = 256
    posterior_layers: int = 16  # WaveNet depth of both posterior encoders
    # (reference hard-codes 16, SynthesizerTrn.py:122-136; exposed so tiny
    # probe/test configs can compile a structurally identical but smaller
    # program — XLA compile time scales with unrolled graph size)
    flow_n_flows: int = 4       # coupling+flip pairs in the flow
    flow_wn_layers: int = 4     # WaveNet depth inside each coupling layer
    dur_n_flows: int = 4        # ConvFlow spline stages in the SDP
    yin_dec_layers: int = 4     # WaveNet depth of the yin decoder
    # (all four reference-hard-coded at 4: SynthesizerTrn.py:138-156;
    # exposed for the same compile-size reason as posterior_layers)
    bf16: bool = False  # bfloat16 compute in the HBM/FLOP-heavy submodules
    # (posterior WaveNet stacks + HiFi-GAN decoder); flows, MAS, duration,
    # sampling and all loss-facing stats stay float32

    def setup(self):
        self.text_encoder = TextEncoder(
            self.num_chars,
            self.inter_channels,
            self.hidden_channels,
            self.filter_channels,
            self.n_heads,
            self.n_layers,
            self.kernel_size,
            self.p_dropout,
        )
        self.waveform_decoder = HiFiGANGenerator(
            self.inter_channels - self.yin_channels + self.yin_scope,
            self.resblock,
            tuple(self.resblock_kernel_sizes),
            tuple(tuple(d) for d in self.resblock_dilation_sizes),
            tuple(self.upsample_rates),
            self.upsample_initial_channel,
            tuple(self.upsample_kernel_sizes),
            gin_channels=self.gin_channels,
            bf16=self.bf16,
        )
        self.posterior_encoder = PosteriorEncoder(
            self.spec_channels,
            self.inter_channels - self.yin_channels,
            self.inter_channels - self.yin_channels,
            5, 1, self.posterior_layers,
            gin_channels=self.gin_channels,
            bf16=self.bf16,
        )
        self.pitch_encoder = PosteriorEncoder(
            self.yin_channels,
            self.yin_channels,
            self.yin_channels,
            5, 1, self.posterior_layers,
            gin_channels=self.gin_channels,
            bf16=self.bf16,
        )
        self.flow = ResidualCouplingBlock(
            self.inter_channels,
            self.hidden_channels,
            5, 1, self.flow_wn_layers,
            n_flows=self.flow_n_flows,
            gin_channels=self.gin_channels,
        )
        self.duration_predictor = StochasticDurationPredictor(
            self.hidden_channels, 192, 3, 0.5, self.dur_n_flows,
            gin_channels=self.gin_channels,
        )
        self.yin_decoder = YingDecoder(
            self.yin_scope,
            5, 1, self.yin_dec_layers,
            self.yin_start,
            self.yin_scope,
            self.yin_shift_range,
            gin_channels=self.gin_channels,
        )
        self.emb_g = nn.Embed(max(self.n_speakers, 1), self.gin_channels)
        self.pitch = Yingram(
            sr=self.sampling_rate,
            w_step=self.hop_length,
            w_size=2048,
            tau_max=2048,
            midi_start=self.midi_start,
            midi_end=self.midi_end,
            octave_range=self.octave_range,
        )

    # -- helpers ---------------------------------------------------------

    def _speaker_embedding(self, sid):
        if self.n_speakers > 0:
            return self.emb_g(sid)[:, None, :]  # [B, 1, gin]
        return None

    def _crop0(self, x, scope_shift=0):
        """Scalar scope crop (reference crop_scope :165-168). scope_shift
        may be a python int (static) or a traced int scalar — serving
        passes it traced so the -15..15 slider reuses one compiled
        program per (text, frame) bucket instead of recompiling."""
        return jax.lax.dynamic_slice_in_dim(
            x, self.yin_start + scope_shift, self.yin_scope, axis=-1
        )

    def _yingram_of(self, o):
        """Yingram of generated audio with the reference's padding
        (SynthesizerTrn.py:261-265): left 768, right 768 + round-up."""
        o = o[..., 0]  # [2B, T]
        length = o.shape[-1]
        left = self.filter_length - self.hop_length
        right = (
            left
            + (-length) % self.hop_length
            + self.hop_length * (length % self.hop_length == 0)
        )
        o_pad = jnp.pad(o, ((0, 0), (left, right)))
        return self.pitch(o_pad)  # [2B, T', M]

    # -- training forward ------------------------------------------------

    def __call__(
        self,
        x,            # [B, Tx] symbol ids
        t,            # [B, Tx] language ids
        x_lengths,    # [B]
        y,            # [B, Ty, spec_channels] linear spectrogram
        y_lengths,    # [B]
        ying,         # [B, Ty, yin_channels]
        sid=None,     # [B]
        rng=None,
        scope_shift: int = 0,
        deterministic: bool = True,
    ) -> dict[str, Any]:
        r_spec, r_yin, r_yindec, r_dur, r_slice = jax.random.split(rng, 5)

        x_h, m_p, logs_p, x_mask = self.text_encoder(
            x, t, x_lengths, deterministic=deterministic
        )
        g = self._speaker_embedding(sid)

        z_spec, m_spec, logs_spec, spec_mask = self.posterior_encoder(
            y, y_lengths, g=g, rng=r_spec
        )
        z_yin, m_yin, logs_yin, yin_mask = self.pitch_encoder(
            ying, y_lengths, g=g, rng=r_yin
        )
        z_yin_crop = self._crop0(z_yin, scope_shift)

        (
            yin_gt_crop,
            yin_gt_shifted_crop,
            yin_dec_crop,
            z_yin_crop_shifted,
            scope_shift_vec,
        ) = self.yin_decoder(z_yin, ying, yin_mask, g, rng=r_yindec)

        z = jnp.concatenate([z_spec, z_yin], axis=-1)
        logs_q = jnp.concatenate([logs_spec, logs_yin], axis=-1)
        m_q = jnp.concatenate([m_spec, m_yin], axis=-1)
        z_p = self.flow(z, spec_mask, g=g)

        z_dec = jnp.concatenate([z_spec, z_yin_crop], axis=-1)
        z_dec_shifted = jnp.concatenate(
            [jax.lax.stop_gradient(z_spec), z_yin_crop_shifted], axis=-1
        )
        z_dec_ = jnp.concatenate([z_dec, z_dec_shifted], axis=0)  # [2B, Ty, C]

        # -- MAS (no gradient; reference :220-235) -----------------------
        zp_sg = jax.lax.stop_gradient(z_p)
        mp_sg = jax.lax.stop_gradient(m_p)
        logsp_sg = jax.lax.stop_gradient(logs_p)
        s_p_sq_r = jnp.exp(-2.0 * logsp_sg)  # [B, Tx, C]
        neg_cent1 = jnp.sum(
            -0.5 * math.log(2 * math.pi) - logsp_sg, axis=-1
        )[:, None, :]  # [B, 1, Tx]
        neg_cent2 = jnp.einsum(
            "btc,bsc->bts", -0.5 * zp_sg**2, s_p_sq_r
        )  # [B, Ty, Tx]
        neg_cent3 = jnp.einsum("btc,bsc->bts", zp_sg, mp_sg * s_p_sq_r)
        neg_cent4 = jnp.sum(-0.5 * mp_sg**2 * s_p_sq_r, axis=-1)[:, None, :]
        neg_cent = neg_cent1 + neg_cent2 + neg_cent3 + neg_cent4

        attn_mask = spec_mask * jnp.swapaxes(x_mask, 1, 2)  # [B, Ty, Tx]
        attn = jax.lax.stop_gradient(maximum_path(neg_cent, attn_mask))

        # -- duration loss (reference :237-243) --------------------------
        w = jnp.sum(attn, axis=1)[..., None]  # [B, Tx, 1]
        l_length = self.duration_predictor(
            x_h, x_mask, w, g=g, rng=r_dur, deterministic=deterministic
        )
        l_length = l_length / jnp.sum(x_mask)

        # -- expand prior (reference :245-248) ---------------------------
        m_p_exp = jnp.einsum("bts,bsc->btc", attn, m_p)
        logs_p_exp = jnp.einsum("bts,bsc->btc", attn, logs_p)

        # -- random segment + hierarchical decode (reference :252-258) ---
        seg_frames = self.segment_size // self.hop_length
        z_slice, ids_slice = rand_slice_segments_for_cat(
            z_dec_,
            jnp.concatenate([y_lengths, y_lengths], axis=0),
            seg_frames,
            r_slice,
        )
        g2 = jnp.concatenate([g, g], axis=0) if g is not None else None
        o_ = self.waveform_decoder.hier_forward(z_slice, g=g2)  # 3x [2B, T, 1]

        # -- yingram consistency of the generated audio (:261-271) -------
        yin_hat = self._yingram_of(o_[-1])  # [2B, T', M]
        yin_hat_crop = self._crop0(yin_hat)
        yin_hat_shifted = crop_scope(
            yin_hat[: yin_hat.shape[0] // 2],
            self.yin_start,
            self.yin_scope,
            scope_shift_vec,
        )

        return {
            "wav_hier": o_,  # list of [2B, T_i, 1]
            "l_length": l_length,
            "attn": attn,
            "ids_slice": ids_slice,
            "x_mask": x_mask,
            "z_mask": spec_mask,
            "z": z,
            "z_p": z_p,
            "m_p": m_p_exp,
            "logs_p": logs_p_exp,
            "m_q": m_q,
            "logs_q": logs_q,
            "z_dec": z_dec_,
            "z_spec": z_spec,
            "m_spec": m_spec,
            "logs_spec": logs_spec,
            "z_yin": z_yin,
            "m_yin": m_yin,
            "logs_yin": logs_yin,
            "yin_gt_crop": yin_gt_crop,
            "yin_gt_shifted_crop": yin_gt_shifted_crop,
            "yin_dec_crop": yin_dec_crop,
            "yin_hat_crop": yin_hat_crop,
            "scope_shift": scope_shift_vec,
            "yin_hat_shifted": yin_hat_shifted,
        }

    # -- inference -------------------------------------------------------

    def infer_pre_decoder(
        self,
        x,
        t,
        x_lengths,
        sid=None,
        rng=None,
        noise_scale: float = 1.0,
        length_scale: float = 1.0,
        noise_scale_w: float = 1.0,
        max_frames: int = 2000,
        scope_shift: int = 0,
        deterministic: bool = True,
    ):
        """Text -> decoder inputs (reference :325-373); fixed-shape output
        [B, max_frames, C] with y_mask carrying the true lengths."""
        r_dur, r_noise = jax.random.split(rng, 2)
        x_h, m_p, logs_p, x_mask = self.text_encoder(
            x, t, x_lengths, deterministic=deterministic
        )
        g = self._speaker_embedding(sid)
        logw = self.duration_predictor.reverse(
            x_h, x_mask, g=g, rng=r_dur, noise_scale=noise_scale_w,
            deterministic=deterministic,
        )
        w = jnp.exp(logw) * x_mask * length_scale
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.clip(
            jnp.sum(w_ceil, axis=(1, 2)), min=1
        ).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        decoder_inputs, y_mask, aux = self._expand_and_flow(
            w_ceil[..., 0], m_p, logs_p, x_mask, g, r_noise,
            noise_scale, max_frames, scope_shift,
        )
        return decoder_inputs, y_mask, y_lengths, aux

    def _expand_and_flow(
        self, w_ceil, m_p, logs_p, x_mask, g, rng, noise_scale, max_frames,
        scope_shift,
    ):
        """Length-regulate + reverse flow + scope crop (reference :356-372)."""
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=1), min=1).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames)[..., None].astype(m_p.dtype)
        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)  # [B, Ty, Tx]
        attn = generate_path(w_ceil, attn_mask)  # [B, Ty, Tx]
        m_p_exp = jnp.einsum("bts,bsc->btc", attn, m_p)
        logs_p_exp = jnp.einsum("bts,bsc->btc", attn, logs_p)
        eps = jax.random.normal(rng, m_p_exp.shape, m_p_exp.dtype)
        z_p = m_p_exp + eps * jnp.exp(logs_p_exp) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        spec_ch = self.inter_channels - self.yin_channels
        z_spec, z_yin = z[..., :spec_ch], z[..., spec_ch:]
        z_yin_crop = self._crop0(z_yin, scope_shift)
        z_crop = jnp.concatenate([z_spec, z_yin_crop], axis=-1)
        return z_crop * y_mask, y_mask, (z_crop, z, z_p, m_p_exp, logs_p_exp)

    def infer_decode_chunk(self, decoder_inputs, sid=None):
        """Decoder-only stage (reference :438-443)."""
        g = self._speaker_embedding(sid)
        return self.waveform_decoder(decoder_inputs, g=g)

    def infer(
        self,
        x,
        t,
        x_lengths,
        sid=None,
        rng=None,
        noise_scale: float = 0.667,
        length_scale: float = 1.0,
        noise_scale_w: float = 0.8,
        max_frames: int = 2000,
        scope_shift: int = 0,
        deterministic: bool = True,
    ):
        """Full text -> waveform path (pre_decoder + decode, the live
        inference route; reference app.py:60-87)."""
        decoder_inputs, y_mask, y_lengths, _ = self.infer_pre_decoder(
            x, t, x_lengths, sid=sid, rng=rng, noise_scale=noise_scale,
            length_scale=length_scale, noise_scale_w=noise_scale_w,
            max_frames=max_frames, scope_shift=scope_shift,
            deterministic=deterministic,
        )
        wav = self.infer_decode_chunk(decoder_inputs, sid=sid)
        return wav, y_mask, y_lengths

    # -- staged latency-control API (reference :375-436) -----------------

    def infer_pre_lr(
        self, x, t, x_lengths, sid=None, rng=None,
        length_scale: float = 1.0, noise_scale_w: float = 1.0,
        deterministic: bool = True,
    ):
        x_h, m_p, logs_p, x_mask = self.text_encoder(
            x, t, x_lengths, deterministic=deterministic
        )
        g = self._speaker_embedding(sid)
        logw = self.duration_predictor.reverse(
            x_h, x_mask, g=g, rng=rng, noise_scale=noise_scale_w,
            deterministic=deterministic,
        )
        w = jnp.exp(logw) * x_mask * length_scale
        return jnp.ceil(w), x_h, m_p, logs_p, x_mask, g

    def infer_lr(self, w_ceil, m_p, logs_p, x_mask, max_frames: int = 2000):
        y_lengths = jnp.clip(jnp.sum(w_ceil, axis=(1, 2)), min=1).astype(jnp.int32)
        y_lengths = jnp.minimum(y_lengths, max_frames)
        y_mask = sequence_mask(y_lengths, max_frames)[..., None].astype(m_p.dtype)
        attn_mask = y_mask * jnp.swapaxes(x_mask, 1, 2)
        attn = generate_path(w_ceil[..., 0], attn_mask)
        m_p_exp = jnp.einsum("bts,bsc->btc", attn, m_p)
        logs_p_exp = jnp.einsum("bts,bsc->btc", attn, logs_p)
        return m_p_exp, logs_p_exp, y_mask

    def infer_post_lr_pre_decoder(
        self, m_p, logs_p, g, y_mask, rng=None,
        noise_scale: float = 1.0, scope_shift: int = 0,
    ):
        eps = jax.random.normal(rng, m_p.shape, m_p.dtype)
        z_p = m_p + eps * jnp.exp(logs_p) * noise_scale
        z = self.flow(z_p, y_mask, g=g, reverse=True)
        spec_ch = self.inter_channels - self.yin_channels
        z_spec, z_yin = z[..., :spec_ch], z[..., spec_ch:]
        z_yin_crop = self._crop0(z_yin, scope_shift)
        z_crop = jnp.concatenate([z_spec, z_yin_crop], axis=-1)
        return z_crop * y_mask, y_mask, (z_crop, z, z_p, m_p, logs_p)

    # -- misc ------------------------------------------------------------

    def yin_dec_infer(self, z_yin, z_mask, sid=None, rng=None):
        """Eval-time yin decoder reconstruction (reference :179-184)."""
        g = self._speaker_embedding(sid)
        return self.yin_decoder.infer(z_yin, z_mask, g, rng=rng)

    def voice_conversion(
        self, y, ying, y_lengths, sid_src, sid_tgt, rng=None, scope_shift: int = 0
    ):
        """Source speaker -> target speaker via the shared flow.

        Reference: SynthesizerTrn.py:445-455. NOTE: the reference version is
        dead code in the PITS fork — it feeds the 112-channel spec posterior
        into the 192-channel flow and the full 192-channel z into the
        162-channel decoder, which would crash. Here we implement the working
        equivalent: both posteriors (spec + yin) feed the flow, and the
        decoder input is scope-cropped as in inference.
        """
        assert self.n_speakers > 0
        r_spec, r_yin = jax.random.split(rng, 2)
        g_src = self.emb_g(sid_src)[:, None, :]
        g_tgt = self.emb_g(sid_tgt)[:, None, :]
        z_spec, _, _, y_mask = self.posterior_encoder(
            y, y_lengths, g=g_src, rng=r_spec
        )
        z_yin, _, _, _ = self.pitch_encoder(ying, y_lengths, g=g_src, rng=r_yin)
        z = jnp.concatenate([z_spec, z_yin], axis=-1)
        z_p = self.flow(z, y_mask, g=g_src)
        z_hat = self.flow(z_p, y_mask, g=g_tgt, reverse=True)
        spec_ch = self.inter_channels - self.yin_channels
        z_hat_spec, z_hat_yin = z_hat[..., :spec_ch], z_hat[..., spec_ch:]
        z_crop = jnp.concatenate(
            [z_hat_spec, self._crop0(z_hat_yin, scope_shift)], axis=-1
        )
        o_hat = self.waveform_decoder(z_crop * y_mask, g=g_tgt)
        return o_hat, y_mask, (z, z_p, z_hat)
