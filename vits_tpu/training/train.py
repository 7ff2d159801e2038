"""Training entry point: `python -m vits_tpu.training.train -c <yaml> -m <dir>`.

Behavioral reference: /root/reference/train.py + train_and_evaluate.py.
TPU-native redesign (SURVEY.md §2.8, §5):
  * no mp.spawn / NCCL: ONE process per host, SPMD over a jax.sharding.Mesh;
    gradient all-reduce is an XLA psum from sharding propagation
  * batches are padded to static bucket shapes -> one compiled program per
    bucket (XLA compile cache), instead of per-shape retraces
  * bf16 is the TPU mixed-precision story (no GradScaler: bf16 has fp32
    exponent range; loss math stays fp32 as in the reference)
  * checkpoint/resume: Orbax dual artifacts, latest-by-step, keep_ckpts
"""

from __future__ import annotations

import argparse
import functools
import time
from collections import deque

import numpy as np
import jax

from vits_tpu.config import get_hparams, synthesizer_kwargs
from vits_tpu.data.dataset import (
    DataIterator,
    DatasetConfig,
    DistributedBucketSampler,
    TextAudioSpeakerDataset,
)
from vits_tpu.models.avocodo import AvocodoDiscriminator, probe_discriminator
from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.parallel.mesh import (
    local_batch_rows,
    make_mesh,
    replicate_state,
    shard_batch,
)
from vits_tpu.text.symbols import symbols
from vits_tpu.training.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
)
from vits_tpu.training.evaluate import evaluate
from vits_tpu.training.step import (
    create_train_state,
    lr_schedule,
    make_optimizer,
    train_step,
)
from vits_tpu.utils.profiling import StepTimer, trace
from vits_tpu.utils.logging_utils import (
    check_git_hash,
    get_logger,
    make_writer,
    summarize,
)


def build_dataset(hps, split: str, pt_run: bool = False):
    cfg = DatasetConfig(
        data_path=hps.data.data_path,
        sampling_rate=hps.data.sampling_rate,
        filter_length=hps.data.filter_length,
        hop_length=hps.data.hop_length,
        win_length=hps.data.win_length,
        add_blank=hps.data.add_blank,
        min_text_len=hps.data.get("min_text_len", 1),
        max_text_len=hps.data.get("max_text_len", 190),
        midi_start=hps.data.midi_start,
        midi_end=hps.data.midi_end,
        octave_range=hps.data.octave_range,
        tau_max=hps.data.tau_max,
        speakers=tuple(hps.data.speakers),
    )
    filelist = (
        hps.data.training_files if split == "train" else hps.data.validation_files
    )
    return TextAudioSpeakerDataset(filelist, cfg, pt_run=pt_run)


def run(hps, initial_run: bool = False) -> None:
    from vits_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    logger = get_logger(hps.model_dir)
    check_git_hash(hps.model_dir, logger)
    writer = make_writer(hps.model_dir)

    process_index = jax.process_index()
    num_processes = jax.process_count()

    train_ds = build_dataset(hps, "train", pt_run=initial_run)
    val_ds = build_dataset(hps, "val")
    boundaries = list(hps.data.get("bucket_boundaries",
                                   [32, 300, 400, 500, 600, 700, 800, 900,
                                    1000, 1100, 1200, 1300, 1400, 1500]))
    # hps.train.batch_size is the GLOBAL batch; each host's sampler feeds its
    # 1/num_processes share (reference semantics: per-rank loaders over the
    # ids[rank::num_replicas] stride, DistributedBucketSampler.py:127-129).
    global_batch = hps.train.batch_size
    per_host_batch = local_batch_rows(global_batch)
    sampler = DistributedBucketSampler(
        train_ds.lengths, per_host_batch, boundaries,
        num_replicas=num_processes, rank=process_index, shuffle=True,
    )
    text_bound = 2 * hps.data.get("max_text_len", 190) + 4
    train_iter = DataIterator(train_ds, sampler, text_bound=text_bound)

    val_sampler = DistributedBucketSampler(
        val_ds.lengths, min(per_host_batch, max(len(val_ds), 1)), boundaries,
        num_replicas=1, rank=0, shuffle=False,
    )
    val_iter_factory = lambda: DataIterator(
        val_ds, val_sampler, text_bound=text_bound
    )

    bf16 = bool(hps.train.get("bf16_run", False))
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)), bf16=bf16)
    disc_size = str(hps.model.get("discriminator_size", "flagship"))
    if disc_size not in ("flagship", "probe"):
        # a typo ('Probe', 'small') would otherwise silently train the
        # flagship discriminator and mask a misconfigured probe/CI run
        raise ValueError(
            f"model.discriminator_size must be 'flagship' or 'probe', "
            f"got {disc_size!r}"
        )
    disc = (
        probe_discriminator(bf16=bf16)
        if disc_size == "probe"
        else AvocodoDiscriminator(bf16=bf16)
    )
    steps_per_epoch = max(len(sampler), 1)
    optim_g = make_optimizer(hps, steps_per_epoch)
    optim_d = make_optimizer(hps, steps_per_epoch)

    init_batch = next(iter(train_iter))
    state = create_train_state(
        jax.random.PRNGKey(hps.train.seed), model, disc, optim_g, optim_d,
        {k: np.asarray(v) for k, v in init_batch.items()},
    )

    epoch_start = 0
    ckpt = latest_checkpoint(hps.model_dir)
    if ckpt is not None:
        state, epoch_start = load_checkpoint(ckpt, state)
        logger.info("resumed from %s (epoch %d)", ckpt, epoch_start)

    # Mesh sized from GLOBAL devices, dividing the GLOBAL batch. Multi-host
    # jit requires every process's devices to participate, so with >1 process
    # the global batch must divide evenly over all devices.
    n_global = jax.device_count()
    if num_processes > 1:
        if global_batch % n_global != 0:
            raise ValueError(
                f"global batch {global_batch} must be divisible by the "
                f"global device count {n_global} for multi-host DP"
            )
        n_mesh = n_global
    else:
        n_mesh = n_global
        while n_mesh > 1 and global_batch % n_mesh != 0:
            n_mesh -= 1
    mesh = make_mesh(n_mesh) if n_mesh > 1 else None
    if mesh is not None:
        state = replicate_state(state, mesh)
        logger.info(
            "data-parallel mesh over %d devices (%d process(es), "
            "global batch %d)", n_mesh, num_processes, global_batch,
        )

    step_fn = jax.jit(
        functools.partial(
            train_step, model=model, disc=disc,
            optim_g=optim_g, optim_d=optim_d, hps=hps,
        ),
        donate_argnums=(0,),  # donate the old TrainState buffers
    )

    base_rng = jax.random.PRNGKey(hps.train.seed)
    global_step = int(state.step)
    schedule = lr_schedule(hps, steps_per_epoch)
    timer = StepTimer()
    profile_at = int(hps.train.get("profile_step", 0))  # 0 = off
    log_interval = hps.train.log_interval
    eval_interval = hps.train.eval_interval
    save_interval = hps.train.get("save_interval", 200)

    # Device prefetch (double-buffering): start the host->device transfer
    # of upcoming batches while the current step computes. Transfers are
    # async, so without this every step pays its full H2D latency
    # serially (measured ~0.4 s/step of batch upload on the test rig).
    if mesh is not None:
        put_batch = lambda b: shard_batch(b, mesh)  # noqa: E731
    else:
        put_batch = lambda b: jax.device_put(  # noqa: E731
            {k: np.asarray(v) for k, v in b.items()}
        )

    def prefetched(iterable, depth=2):
        q = deque()
        it = iter(iterable)
        try:
            while len(q) < depth:
                q.append(put_batch(next(it)))
        except StopIteration:
            pass
        for item in it:
            out = q.popleft()
            q.append(put_batch(item))
            yield out
        while q:
            yield q.popleft()

    for epoch in range(epoch_start, hps.train.epochs):
        sampler.set_epoch(epoch)
        t_epoch = time.time()
        for batch in prefetched(train_iter):
            # base_rng is folded with state.step INSIDE the jitted step —
            # zero per-step host PRNG dispatches.
            if profile_at and global_step == profile_at:
                # one traced step, viewable in TensorBoard/Perfetto
                with trace(hps.model_dir):
                    state, metrics = step_fn(state, batch, base_rng)
                    # concrete fetch: block_until_ready does not drain the
                    # queue on the tunneled backend
                    float(metrics["loss/g/total"])
            else:
                state, metrics = step_fn(state, batch, base_rng)
            global_step += 1
            timer.tick()

            if global_step % log_interval == 0:
                scalars = {k: float(v) for k, v in metrics.items()}
                scalars["learning_rate"] = float(schedule(global_step))
                scalars["perf/steps_per_sec"] = timer.steps_per_sec()
                summarize(writer, global_step, scalars=scalars)
                logger.info(
                    "step %d | g %.4f d %.4f",
                    global_step,
                    scalars["loss/g/total"],
                    scalars["loss/d/total"],
                )
            if global_step % eval_interval == 0 and process_index == 0:
                evaluate(
                    model, jax.device_get(state.g_params),
                    val_iter_factory(), writer, global_step, hps,
                )
            if global_step % save_interval == 0 and process_index == 0:
                save_checkpoint(
                    hps.model_dir, global_step, jax.device_get(state),
                    epoch, keep_ckpts=hps.train.get("keep_ckpts", 3),
                )
                logger.info("saved checkpoint at step %d", global_step)
        logger.info(
            "epoch %d done in %.1fs (%d steps)",
            epoch, time.time() - t_epoch, len(sampler),
        )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", required=True)
    parser.add_argument("-m", "--model", required=True, help="model dir name")
    parser.add_argument(
        "-i", "--initial-run", action="store_true",
        help="precompute all feature caches first",
    )
    parser.add_argument(
        "--distributed", action="store_true",
        help="multi-host SPMD: jax.distributed.initialize() (TPU pods pick "
        "up coordinator/process env automatically)",
    )
    args = parser.parse_args()
    if args.distributed:
        jax.distributed.initialize()
    hps = get_hparams(args.config, args.model)
    run(hps, initial_run=args.initial_run)


if __name__ == "__main__":
    main()
