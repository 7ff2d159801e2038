"""Validation loop: val losses over the FULL eval set + the reference's
complete TensorBoard payload.

Behavioral reference: /root/reference/evaluate.py — train-style forward for
val mel/yin L1 over every batch (:26-80); first-batch synthesis via the
pre_decoder path with n_sample samples (:84-118); scope-shift(+6) re-crop of
the same latent (:104-115); yin-decoder reconstruction of the inferred z_yin
(:117-118); yingram of generated and shifted audio (:144-167); mel images on
a shared log-floor(-11.5129) time grid (:169-213); ground-truth mel/ying/audio
logged once at step 0 (:269-287).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.ops.commons import slice_segments
from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
from vits_tpu.ops.yin import Yingram
from vits_tpu.utils.logging_utils import plot_spectrogram_to_numpy, summarize

_LOG_FLOOR = -11.5129  # log(1e-5), the reference's mel padding value


# jitted-program cache: evaluate runs every eval_interval with the same
# model, so each program compiles once per process (per batch-bucket
# shape). Running these eagerly costs thousands of per-op dispatches per
# eval — ~70 s/eval measured. The cache holds programs for ONE
# (model, hps-values) generation at a time: a caller that constructs a
# fresh model/hps per evaluate() call evicts the previous entry instead of
# leaking one compiled program (plus its closed-over model) per call.
_JIT_CACHE: dict = {}
_JIT_CACHE_GEN: list = [None]  # (id(model), hps value tuple) of cached gen


def _hps_cache_key(hps) -> tuple:
    d, t = hps.data, hps.train
    return (
        d.hop_length, d.filter_length, d.win_length, d.n_mel_channels,
        d.sampling_rate, d.mel_fmin, d.mel_fmax, t.segment_size,
        int(t.get("n_sample", 1)),
    )


def _jit_cache_for(model, hps) -> dict:
    gen = (id(model), _hps_cache_key(hps))
    if _JIT_CACHE_GEN[0] != gen:
        _JIT_CACHE.clear()
        _JIT_CACHE_GEN[0] = gen
    return _JIT_CACHE


def _val_loss_fn(model, hps):
    cache = _jit_cache_for(model, hps)
    key = "val"
    fn = cache.get(key)
    if fn is not None:
        return fn
    hop = hps.data.hop_length
    seg_frames = hps.train.segment_size // hop

    @jax.jit
    def fn(g_params, x, t, xl, spec, sl, ying, sid):
        b = x.shape[0]
        out = model.apply(
            {"params": g_params}, x, t, xl, spec, sl, ying, sid,
            rng=jax.random.PRNGKey(0),
        )
        mel = spec_to_mel(
            spec, hps.data.filter_length, hps.data.n_mel_channels,
            hps.data.sampling_rate, hps.data.mel_fmin, hps.data.mel_fmax,
        )
        ids = out["ids_slice"].astype(jnp.int32)
        y_mel = slice_segments(mel, ids[:b], seg_frames)
        y_hat_mel = mel_spectrogram(
            out["wav_hier"][-1][:b, :, 0], hps.data.filter_length,
            hps.data.n_mel_channels, hps.data.sampling_rate, hop,
            hps.data.win_length, hps.data.mel_fmin, hps.data.mel_fmax,
        )
        loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel))
        loss_yin = jnp.mean(
            jnp.abs(out["yin_gt_shifted_crop"] - out["yin_dec_crop"])
        )
        return loss_mel, loss_yin

    cache[key] = fn
    return fn


def _val_losses(model, g_params, batch, hps):
    """Train-style forward -> (mel L1, yin L1) (reference evaluate.py:44-80).
    Plain-weighted L1 (the c_mel/c_yin scaling divides back out when
    comparing runs; scalars stay unit-comparable across configs)."""
    return _val_loss_fn(model, hps)(
        g_params,
        jnp.asarray(batch["x"]), jnp.asarray(batch["t"]),
        jnp.asarray(batch["x_lengths"]), jnp.asarray(batch["spec"]),
        jnp.asarray(batch["spec_lengths"]), jnp.asarray(batch["ying"]),
        jnp.asarray(batch["sid"]),
    )


def _pad_to(arr: np.ndarray, n: int, fill: float) -> np.ndarray:
    """Pad/trim leading (time) axis of [T, C] to n with a fill value."""
    if arr.shape[0] >= n:
        return arr[:n]
    pad = np.full((n - arr.shape[0], arr.shape[1]), fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def _log_samples(model, g_params, batch, writer, global_step, hps):
    """First-batch TB payload (reference evaluate.py:84-287)."""
    hop = hps.data.hop_length
    n_sample = min(int(hps.train.get("n_sample", 1)), batch["x"].shape[0])

    cache = _jit_cache_for(model, hps)
    skey = "samples"
    sample_fn = cache.get(skey)
    if sample_fn is None:
        max_frames = 1024

        @jax.jit
        def sample_fn(g_params, x, t, xl, sid, spec):
            dec_inputs, y_mask, y_lengths, aux = model.apply(
                {"params": g_params}, x, t, xl, sid=sid,
                rng=jax.random.PRNGKey(1),
                noise_scale=0.667, noise_scale_w=0.8, max_frames=max_frames,
                method=SynthesizerTrn.infer_pre_decoder,
            )
            _, z, *_ = aux
            y_hat = model.apply(
                {"params": g_params}, dec_inputs, sid,
                method=SynthesizerTrn.infer_decode_chunk,
            )  # [B, T*hop, 1]

            # scope-shift(+6): re-crop the SAME latent z (reference :104-115)
            spec_ch = model.inter_channels - model.yin_channels
            z_spec, z_yin = z[..., :spec_ch], z[..., spec_ch:]
            s = model.yin_start + 6
            z_crop_shift = jnp.concatenate(
                [z_spec, z_yin[..., s : s + model.yin_scope]], axis=-1
            ) * y_mask
            y_hat_shift = model.apply(
                {"params": g_params}, z_crop_shift, sid,
                method=SynthesizerTrn.infer_decode_chunk,
            )

            # yin-decoder reconstruction of the pitch latent (:117-118)
            yin_hat = model.apply(
                {"params": g_params}, z_yin * y_mask, y_mask, sid,
                rng=jax.random.PRNGKey(2),
                method=SynthesizerTrn.yin_dec_infer,
            )

            # yingram of generated + shifted audio, reference pad (:144-167)
            ying_op = Yingram(
                hps.data.sampling_rate, hop, 2048, hps.data.tau_max,
                hps.data.midi_start, hps.data.midi_end,
                hps.data.octave_range,
            )

            def _ying_of(o):
                o = o[..., 0]
                left = hps.data.filter_length - hop
                right = (
                    left + (-o.shape[-1]) % hop
                    + hop * (o.shape[-1] % hop == 0)
                )
                return ying_op(jnp.pad(o, ((0, 0), (left, right))))

            mel_kw = (
                hps.data.filter_length, hps.data.n_mel_channels,
                hps.data.sampling_rate, hop, hps.data.win_length,
                hps.data.mel_fmin, hps.data.mel_fmax,
            )
            return dict(
                y_lengths=y_lengths,
                y_hat=y_hat,
                y_hat_shift=y_hat_shift,
                yin_hat=yin_hat,
                z_yin_masked=z_yin * y_mask,
                ying_hat=_ying_of(y_hat),
                ying_hat_shift=_ying_of(y_hat_shift),
                mel_gt=spec_to_mel(
                    spec, hps.data.filter_length, hps.data.n_mel_channels,
                    hps.data.sampling_rate, hps.data.mel_fmin,
                    hps.data.mel_fmax,
                ),
                mel_gen=mel_spectrogram(y_hat[..., 0], *mel_kw),
                mel_gen_shift=mel_spectrogram(y_hat_shift[..., 0], *mel_kw),
            )

        cache[skey] = sample_fn

    out = sample_fn(
        g_params,
        jnp.asarray(batch["x"][:n_sample]),
        jnp.asarray(batch["t"][:n_sample]),
        jnp.asarray(batch["x_lengths"][:n_sample]),
        jnp.asarray(batch["sid"][:n_sample]),
        jnp.asarray(batch["spec"][:n_sample]),
    )
    y_lengths = out["y_lengths"]
    y_hat, y_hat_shift = out["y_hat"], out["y_hat_shift"]
    yin_hat, z_yin_masked = out["yin_hat"], out["z_yin_masked"]
    ying_hat, ying_hat_shift = out["ying_hat"], out["ying_hat_shift"]
    mel_gt, mel_gen = out["mel_gt"], out["mel_gen"]
    mel_gen_shift = out["mel_gen_shift"]

    images, audios = {}, {}
    y_len_np = np.asarray(y_lengths)
    for i in range(n_sample):
        n_frames = int(y_len_np[i])
        gt_frames = int(batch["spec_lengths"][i])
        grid = max(n_frames, gt_frames)  # shared log-floor time grid (:169+)
        images[f"gen/{i}_mel"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(mel_gen[i, :n_frames]), grid, _LOG_FLOOR)
        )
        images[f"gen/{i}_mel_shift"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(mel_gen_shift[i, :n_frames]), grid, _LOG_FLOOR)
        )
        images[f"gen/{i}_z_yin"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(z_yin_masked[i, :n_frames]), grid, 0.0)
        )
        images[f"gen/{i}_yin_dec"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(yin_hat[i, :n_frames]), grid, 0.0)
        )
        images[f"gen/{i}_ying"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(ying_hat[i, :n_frames]), grid, 0.0)
        )
        images[f"gen/{i}_ying_shift"] = plot_spectrogram_to_numpy(
            _pad_to(np.asarray(ying_hat_shift[i, :n_frames]), grid, 0.0)
        )
        audios[f"gen/{i}_audio"] = np.asarray(y_hat[i, : n_frames * hop, 0])
        audios[f"gen/{i}_audio_shift"] = np.asarray(
            y_hat_shift[i, : n_frames * hop, 0]
        )
        if global_step == 0:  # ground truth once (reference :269-287)
            images[f"gt/{i}_mel"] = plot_spectrogram_to_numpy(
                np.asarray(mel_gt[i, :gt_frames])
            )
            images[f"gt/{i}_ying"] = plot_spectrogram_to_numpy(
                np.asarray(batch["ying"][i, :gt_frames])
            )
            audios[f"gt/{i}_audio"] = np.asarray(
                batch["wav"][i, : gt_frames * hop, 0]
            )
    summarize(
        writer, global_step, images=images, audios=audios,
        audio_sampling_rate=hps.data.sampling_rate,
    )


def evaluate(
    model: SynthesizerTrn,
    g_params,
    val_iter,
    writer,
    global_step: int,
    hps,
    max_batches: int | None = None,
) -> dict:
    """Full-val-set losses + first-batch sample payload. Returns scalars."""
    mel_losses, yin_losses = [], []
    first_batch = None
    for bi, batch in enumerate(val_iter):
        if max_batches is not None and bi >= max_batches:
            break
        loss_mel, loss_yin = _val_losses(model, g_params, batch, hps)
        mel_losses.append(float(loss_mel))
        yin_losses.append(float(loss_yin))
        if first_batch is None:
            first_batch = batch

    if first_batch is not None and writer is not None:
        _log_samples(model, g_params, first_batch, writer, global_step, hps)

    scalars = {
        "val/mel": float(np.mean(mel_losses)) if mel_losses else float("nan"),
        "val/yin_dec": float(np.mean(yin_losses)) if yin_losses else float("nan"),
    }
    if writer is not None:
        summarize(writer, global_step, scalars=scalars)
    return scalars
