"""Validation loop: val losses over the eval set + synthesis samples to TB.

Behavioral reference: /root/reference/evaluate.py (train-style forward for
val mel/yin L1; first-batch synthesis via the pre_decoder path; mel/yin
images and audio samples to TensorBoard).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.ops.commons import slice_segments
from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
from vits_tpu.utils.logging_utils import plot_spectrogram_to_numpy, summarize


def evaluate(
    model: SynthesizerTrn,
    g_params,
    val_iter,
    writer,
    global_step: int,
    hps,
    max_batches: int = 4,
) -> dict:
    """Compute val losses; log first-batch samples. Returns scalar dict."""
    hop = hps.data.hop_length
    seg_frames = hps.train.segment_size // hop
    mel_losses, yin_losses = [], []
    first_logged = False

    for bi, batch in enumerate(val_iter):
        if bi >= max_batches:
            break
        b = batch["x"].shape[0]
        out = model.apply(
            {"params": g_params},
            jnp.asarray(batch["x"]), jnp.asarray(batch["t"]),
            jnp.asarray(batch["x_lengths"]), jnp.asarray(batch["spec"]),
            jnp.asarray(batch["spec_lengths"]), jnp.asarray(batch["ying"]),
            jnp.asarray(batch["sid"]),
            rng=jax.random.PRNGKey(0),
        )
        mel = spec_to_mel(
            jnp.asarray(batch["spec"]), hps.data.filter_length,
            hps.data.n_mel_channels, hps.data.sampling_rate,
            hps.data.mel_fmin, hps.data.mel_fmax,
        )
        ids = out["ids_slice"].astype(jnp.int32)
        y_mel = slice_segments(mel, ids[:b], seg_frames)
        y_hat_mel = mel_spectrogram(
            out["wav_hier"][-1][:b, :, 0], hps.data.filter_length,
            hps.data.n_mel_channels, hps.data.sampling_rate, hop,
            hps.data.win_length, hps.data.mel_fmin, hps.data.mel_fmax,
        )
        mel_losses.append(float(jnp.mean(jnp.abs(y_mel - y_hat_mel))))
        yin_losses.append(
            float(jnp.mean(jnp.abs(out["yin_gt_shifted_crop"] - out["yin_dec_crop"])))
        )

        if not first_logged and writer is not None:
            first_logged = True
            # synthesis sample (reference evaluate.py:98-118)
            wav, y_mask, y_len = model.apply(
                {"params": g_params},
                jnp.asarray(batch["x"][:1]), jnp.asarray(batch["t"][:1]),
                jnp.asarray(batch["x_lengths"][:1]),
                sid=jnp.asarray(batch["sid"][:1]),
                rng=jax.random.PRNGKey(1), noise_scale=0.667,
                noise_scale_w=0.8, max_frames=1024,
                method=SynthesizerTrn.infer,
            )
            # scope-shifted (+6) resynthesis (reference evaluate.py:104-115)
            wav_shift, _, y_len_shift = model.apply(
                {"params": g_params},
                jnp.asarray(batch["x"][:1]), jnp.asarray(batch["t"][:1]),
                jnp.asarray(batch["x_lengths"][:1]),
                sid=jnp.asarray(batch["sid"][:1]),
                rng=jax.random.PRNGKey(1), noise_scale=0.667,
                noise_scale_w=0.8, max_frames=1024, scope_shift=6,
                method=SynthesizerTrn.infer,
            )
            n = int(np.asarray(y_len)[0]) * hop
            n_shift = int(np.asarray(y_len_shift)[0]) * hop
            gen_mel = mel_spectrogram(
                wav[..., 0], hps.data.filter_length, hps.data.n_mel_channels,
                hps.data.sampling_rate, hop, hps.data.win_length,
                hps.data.mel_fmin, hps.data.mel_fmax,
            )
            gt_frames = int(batch["spec_lengths"][0])
            summarize(
                writer,
                global_step,
                images={
                    "gen/mel": plot_spectrogram_to_numpy(
                        np.asarray(gen_mel[0])
                    ),
                    "gt/mel": plot_spectrogram_to_numpy(
                        np.asarray(mel[0, :gt_frames])
                    ),
                    "gen/yin_dec": plot_spectrogram_to_numpy(
                        np.asarray(out["yin_dec_crop"][0, :gt_frames])
                    ),
                    "gt/yin": plot_spectrogram_to_numpy(
                        np.asarray(out["yin_gt_crop"][0, :gt_frames])
                    ),
                },
                audios={
                    "gen/audio": np.asarray(wav[0, :n, 0]),
                    "gen/audio_scope_shift6": np.asarray(
                        wav_shift[0, :n_shift, 0]
                    ),
                    "gt/audio": np.asarray(batch["wav"][0, : gt_frames * hop, 0]),
                },
                audio_sampling_rate=hps.data.sampling_rate,
            )

    scalars = {
        "val/mel": float(np.mean(mel_losses)) if mel_losses else float("nan"),
        "val/yin_dec": float(np.mean(yin_losses)) if yin_losses else float("nan"),
    }
    if writer is not None:
        summarize(writer, global_step, scalars=scalars)
    return scalars
