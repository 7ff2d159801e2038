"""GAN training step: D-then-G alternation with torch-faithful semantics.

Behavioral reference: /root/reference/train_and_evaluate.py:17-156 and
train.py:161-195 (2x AdamW lr 2e-4 betas (0.8,0.99) eps 1e-9, per-epoch
exponential lr decay 0.999875).

Ordering matches the reference exactly:
  1. generator forward (one set of samples/noise for the whole step)
  2. D step: PhaseAug'd (real, detached fake) -> LSGAN D loss -> update D
  3. G step: PhaseAug'd (real, live fake) -> *updated* D -> adversarial +
     feature-matching + mel L1*45 + duration + KL + yin losses -> update G

TPU-first: the generator runs ONCE via jax.vjp; the G gradient is pulled
back through the stored linearization (torch's retained autograd graph,
expressed functionally). The whole step is one jit program; under a
`data`-sharded mesh the gradient all-reduces lower to ICI psums
automatically.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.models.avocodo import AvocodoDiscriminator
from vits_tpu.ops.commons import slice_segments
from vits_tpu.ops.phaseaug import phaseaug_sync
from vits_tpu.ops.stft import mel_spectrogram, spec_to_mel
from vits_tpu.training import losses as L


class TrainState(struct.PyTreeNode):
    step: jax.Array
    g_params: Any
    d_params: Any
    g_opt_state: Any
    d_opt_state: Any


def lr_schedule(hps, steps_per_epoch: int) -> optax.Schedule:
    """The per-epoch exponential-decay schedule (reference train.py:190-195:
    ExponentialLR stepped once per epoch). Exposed so the train loop logs the
    actual schedule value instead of re-deriving it arithmetically."""
    return optax.exponential_decay(
        init_value=float(hps.train.learning_rate),
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=float(hps.train.lr_decay),
        staircase=True,
    )


def make_optimizer(hps, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW with per-epoch exponential decay (reference train.py:161-173,
    190-195; torch AdamW default weight_decay=1e-2)."""
    return optax.adamw(
        lr_schedule(hps, steps_per_epoch),
        b1=float(hps.train.betas[0]),
        b2=float(hps.train.betas[1]),
        eps=float(hps.train.eps),
        weight_decay=1e-2,
    )


def create_train_state(
    rng: jax.Array,
    model: SynthesizerTrn,
    disc: AvocodoDiscriminator,
    optim_g: optax.GradientTransformation,
    optim_d: optax.GradientTransformation,
    batch: dict,
    jit_init: bool = True,
) -> TrainState:
    """jit_init=True compiles the flax inits (eager tracing dispatches
    thousands of tiny ops one by one — minutes on a tunneled TPU).
    jit_init=False runs them eagerly — the right trade on CPU probes, where
    a tiny model's eager init takes seconds but COMPILING the init graph
    costs minutes of LLVM time on a single core (measured 195 s + 54 s of
    the round-3 probe timeout)."""
    g_rng, d_rng, f_rng = jax.random.split(rng, 3)
    maybe_jit = jax.jit if jit_init else (lambda f: f)
    g_vars = maybe_jit(model.init)(
        g_rng,
        batch["x"], batch["t"], batch["x_lengths"],
        batch["spec"], batch["spec_lengths"], batch["ying"], batch["sid"],
        rng=f_rng,
    )
    seg = model.segment_size
    b = batch["x"].shape[0]
    dummy_y = jnp.zeros((2 * b, seg, 1), jnp.float32)
    dummy_hier = [
        jnp.zeros((2 * b, seg // 4, 1), jnp.float32),
        jnp.zeros((2 * b, seg // 2, 1), jnp.float32),
        dummy_y,
    ]
    d_vars = jax.jit(disc.init)(d_rng, dummy_y, dummy_hier)
    g_params, d_params = g_vars["params"], d_vars["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        g_params=g_params,
        d_params=d_params,
        g_opt_state=optim_g.init(g_params),
        d_opt_state=optim_d.init(d_params),
    )


def train_step(
    state: TrainState,
    batch: dict,
    rng: jax.Array,
    *,
    model: SynthesizerTrn,
    disc: AvocodoDiscriminator,
    optim_g: optax.GradientTransformation,
    optim_d: optax.GradientTransformation,
    hps,
) -> tuple[TrainState, dict]:
    """One D+G update. batch keys: x, t, x_lengths, spec, spec_lengths,
    ying, wav ([B, T_samples, 1]), sid.

    ``rng`` is a RUN-level base key: it is folded with the (checkpointed)
    ``state.step`` inside the jitted program, so the caller passes the same
    key every step — no per-step host-side PRNG programs (each tiny dispatch
    costs real latency on a tunneled TPU), and resume reproduces the exact
    key sequence for free."""
    hop = hps.data.hop_length
    seg = hps.train.segment_size
    seg_frames = seg // hop
    b = batch["x"].shape[0]

    rng = jax.random.fold_in(rng, state.step)
    gen_rng, drop_rng, aug_d_rng, aug_g_rng = jax.random.split(rng, 4)

    # ---- 1. generator forward, linearized once (reference :55-60) -------
    def gen_fn(g_params):
        out = model.apply(
            {"params": g_params},
            batch["x"], batch["t"], batch["x_lengths"],
            batch["spec"], batch["spec_lengths"], batch["ying"], batch["sid"],
            rng=gen_rng,
            deterministic=False,
            rngs={"dropout": drop_rng},
        )
        out["wav_hier"] = tuple(out["wav_hier"])
        # float-cast int outputs so every vjp cotangent is a float array
        out["ids_slice"] = out["ids_slice"].astype(jnp.float32)
        out["scope_shift"] = out["scope_shift"].astype(jnp.float32)
        return out

    remat = bool(hps.train.get("remat_run", False))
    if remat:
        # rematerialization: store only the generator INPUTS and replay the
        # forward during the backward pass — trades ~1 extra G forward for
        # the dominant activation memory, unlocking larger per-chip batch
        gen_fn = jax.checkpoint(gen_fn)
    gen_out, gen_vjp = jax.vjp(gen_fn, state.g_params)
    ids = gen_out["ids_slice"].astype(jnp.int32)  # [2B], halves identical

    # ---- shared real-side tensors (reference :62-89) --------------------
    mel = spec_to_mel(
        batch["spec"], hps.data.filter_length, hps.data.n_mel_channels,
        hps.data.sampling_rate, hps.data.mel_fmin, hps.data.mel_fmax,
    )
    y_mel = slice_segments(mel, ids[:b], seg_frames)
    wav2 = jnp.concatenate([batch["wav"], batch["wav"]], axis=0)  # [2B,T,1]
    y_sliced = slice_segments(wav2, ids * hop, seg)  # [2B, seg, 1]

    # ---- 2. discriminator step (reference :92-111) ----------------------
    fake_hier = gen_out["wav_hier"]  # values; no grad flows to G from here

    def disc_apply(d_params, y_in, fakes):
        return disc.apply({"params": d_params}, y_in, fakes)

    if remat:
        disc_apply = jax.checkpoint(disc_apply)

    def d_loss_fn(d_params):
        aug_y, aug_yhat_last = phaseaug_sync(y_sliced, fake_hier[-1], aug_d_rng)
        fakes = [fake_hier[0], fake_hier[1], aug_yhat_last]
        y_d_r, y_d_g, _, _ = disc_apply(d_params, aug_y, fakes)
        loss_disc, r_losses, g_losses = L.discriminator_loss(y_d_r, y_d_g)
        return loss_disc, (sum(r_losses), sum(g_losses))

    (loss_disc, (loss_d_r, loss_d_g)), d_grads = jax.value_and_grad(
        d_loss_fn, has_aux=True
    )(state.d_params)
    d_updates, new_d_opt_state = optim_d.update(
        d_grads, state.d_opt_state, state.d_params
    )
    new_d_params = optax.apply_updates(state.d_params, d_updates)

    # ---- 3. generator step against the UPDATED D (reference :117-156) ---
    def g_loss_fn(out):
        aug_y, aug_yhat_last = phaseaug_sync(y_sliced, out["wav_hier"][-1], aug_g_rng)
        fakes = [out["wav_hier"][0], out["wav_hier"][1], aug_yhat_last]
        y_d_r, y_d_g, fmap_r, fmap_g = disc_apply(new_d_params, aug_y, fakes)
        y_hat_mel = mel_spectrogram(
            out["wav_hier"][-1][:b, :, 0],
            hps.data.filter_length, hps.data.n_mel_channels,
            hps.data.sampling_rate, hop, hps.data.win_length,
            hps.data.mel_fmin, hps.data.mel_fmax,
        )
        yin_gt_crop_sliced = slice_segments(
            jnp.concatenate([out["yin_gt_crop"], out["yin_gt_shifted_crop"]], axis=0),
            ids, seg_frames,
        )

        loss_dur = jnp.sum(out["l_length"].astype(jnp.float32))
        loss_mel = jnp.mean(jnp.abs(y_mel - y_hat_mel)) * hps.train.c_mel
        loss_kl = L.kl_loss(
            out["z_p"], out["logs_q"], out["m_p"], out["logs_p"], out["z_mask"]
        ) * hps.train.c_kl
        loss_yin_dec = jnp.mean(
            jnp.abs(out["yin_gt_shifted_crop"] - out["yin_dec_crop"])
        ) * hps.train.c_yin
        loss_yin_shift = (
            jnp.mean(jnp.abs(jnp.exp(-yin_gt_crop_sliced) - jnp.exp(-out["yin_hat_crop"])))
            * hps.train.c_yin
            + jnp.mean(jnp.abs(
                jnp.exp(-out["yin_hat_shifted"])
                - jnp.exp(-out["yin_hat_crop"][b:])
            )) * hps.train.c_yin
        )
        loss_fm = L.feature_loss(fmap_r, fmap_g)
        loss_gen, _ = L.generator_loss(y_d_g)
        loss_total = (
            loss_gen + loss_fm + loss_mel + loss_dur + loss_kl
            + loss_yin_shift + loss_yin_dec
        )
        metrics = {
            "loss/g/score": loss_gen,
            "loss/g/fm": loss_fm,
            "loss/g/mel": loss_mel,
            "loss/g/dur": loss_dur,
            "loss/g/kl": loss_kl,
            "loss/g/yindec": loss_yin_dec,
            "loss/g/yinshift": loss_yin_shift,
            "loss/g/total": loss_total,
        }
        return loss_total, metrics

    (loss_gen_all, g_metrics), out_cot = jax.value_and_grad(
        g_loss_fn, has_aux=True
    )(gen_out)
    (g_grads,) = gen_vjp(out_cot)
    g_updates, new_g_opt_state = optim_g.update(
        g_grads, state.g_opt_state, state.g_params
    )
    new_g_params = optax.apply_updates(state.g_params, g_updates)

    metrics = dict(g_metrics)
    metrics.update({
        "loss/d/total": loss_disc,
        "loss/d/real": loss_d_r,
        "loss/d/gen": loss_d_g,
        "grad_norm/g": optax.global_norm(g_grads),
        "grad_norm/d": optax.global_norm(d_grads),
    })

    if bool(hps.train.get("nan_guard", False)):
        # production robustness (no reference counterpart, default off):
        # a non-finite loss or grad skips that side's update in-graph —
        # one bad batch can't poison the run. Skips are visible as
        # nan_skipped/{g,d} metrics; state.step still advances so the
        # PRNG stream stays aligned. The optimizer counts (int scalar
        # leaves: adam count, schedule count) ALSO advance on a skip —
        # only params and float moments are reverted — so opt_state
        # counts stay aligned with state.step and any count-keyed LR
        # schedule sees the same step index a skip-free run would.
        g_ok = jnp.isfinite(loss_gen_all) & jnp.isfinite(
            metrics["grad_norm/g"]
        )
        d_ok = jnp.isfinite(loss_disc) & jnp.isfinite(metrics["grad_norm/d"])
        keep = lambda ok: (  # noqa: E731
            lambda new, old: jnp.where(ok, new, old)
        )

        def keep_floats(ok):
            def f(new, old):
                if jnp.issubdtype(new.dtype, jnp.integer):
                    return new  # optimizer step counts always advance
                return jnp.where(ok, new, old)

            return f

        new_g_params = jax.tree_util.tree_map(
            keep(g_ok), new_g_params, state.g_params
        )
        new_g_opt_state = jax.tree_util.tree_map(
            keep_floats(g_ok), new_g_opt_state, state.g_opt_state
        )
        new_d_params = jax.tree_util.tree_map(
            keep(d_ok), new_d_params, state.d_params
        )
        new_d_opt_state = jax.tree_util.tree_map(
            keep_floats(d_ok), new_d_opt_state, state.d_opt_state
        )
        metrics["nan_skipped/g"] = 1.0 - g_ok.astype(jnp.float32)
        metrics["nan_skipped/d"] = 1.0 - d_ok.astype(jnp.float32)

    new_state = state.replace(
        step=state.step + 1,
        g_params=new_g_params,
        d_params=new_d_params,
        g_opt_state=new_g_opt_state,
        d_opt_state=new_d_opt_state,
    )
    return new_state, metrics
