"""Training-step throughput benchmark on the flagship config (single chip).

Not the driver headline (bench.py is); prints a JSON line with steps/sec and
utterance-seconds of audio trained per second.
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from vits_tpu.config import load_hparams, synthesizer_kwargs
from vits_tpu.models.avocodo import AvocodoDiscriminator
from vits_tpu.models.synthesizer import SynthesizerTrn
from vits_tpu.text.symbols import symbols
from vits_tpu.training.step import create_train_state, make_optimizer, train_step


def main():
    from vits_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int, default=16)
    parser.add_argument("--frames", type=int, default=400)
    parser.add_argument("--text", type=int, default=128)
    parser.add_argument("--iters", type=int, default=10)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--remat", action="store_true",
                        help="gradient rematerialization (train.remat_run)")
    parser.add_argument(
        "--trace", default=None, metavar="DIR",
        help="capture a jax.profiler trace of the timed loop into DIR",
    )
    args = parser.parse_args()

    hps = load_hparams("configs/config_cje.yaml")
    if args.remat:
        hps.train["remat_run"] = True
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)), bf16=args.bf16)
    disc = AvocodoDiscriminator(bf16=args.bf16)
    optim_g = make_optimizer(hps, steps_per_epoch=100)
    optim_d = make_optimizer(hps, steps_per_epoch=100)

    b, tx, ty, hop = args.batch, args.text, args.frames, hps.data.hop_length
    rng = np.random.default_rng(0)
    batch = {
        "x": jnp.asarray(rng.integers(1, len(symbols), (b, tx))),
        "t": jnp.asarray(rng.integers(0, 6, (b, tx))),
        "x_lengths": jnp.asarray([tx] * b),
        "spec": jnp.asarray(
            np.abs(rng.standard_normal((b, ty, 513))).astype(np.float32)
        ),
        "spec_lengths": jnp.asarray([ty] * b),
        "ying": jnp.asarray(rng.uniform(0, 1, (b, ty, 80)).astype(np.float32)),
        "wav": jnp.asarray(
            (rng.standard_normal((b, ty * hop, 1)) * 0.1).astype(np.float32)
        ),
        "sid": jnp.asarray(rng.integers(0, 5, (b,))),
    }

    t0 = time.perf_counter()
    state = create_train_state(
        jax.random.PRNGKey(0), model, disc, optim_g, optim_d, batch
    )
    jax.block_until_ready(state.g_params)
    init_s = time.perf_counter() - t0

    step_fn = jax.jit(
        functools.partial(
            train_step, model=model, disc=disc,
            optim_g=optim_g, optim_d=optim_d, hps=hps,
        ),
        donate_argnums=(0,),
    )
    t0 = time.perf_counter()
    key = jax.random.PRNGKey(1)
    state, metrics = step_fn(state, batch, key)
    # NOTE: a concrete value fetch, NOT jax.block_until_ready — on the
    # tunneled axon backend block_until_ready returns before the execution
    # queue drains, which silently inflated throughput ~4x (round-1 numbers
    # had this flaw). Only a device->host read proves the steps ran.
    float(metrics["loss/g/total"])
    compile_s = time.perf_counter() - t0

    from vits_tpu.utils.profiling import trace
    import contextlib

    tracer = trace(args.trace) if args.trace else contextlib.nullcontext()
    with tracer:
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, metrics = step_fn(state, batch, key)  # step-folded in-graph
        float(metrics["loss/g/total"])  # single final fetch drains the queue
        elapsed = time.perf_counter() - t0

    steps_per_sec = args.iters / elapsed
    audio_sec_per_step = b * ty * hop / hps.data.sampling_rate
    print(json.dumps({
        "metric": "train_steps_per_sec",
        "bf16": args.bf16,
        "value": round(steps_per_sec, 4),
        "unit": "steps/s",
        "batch": b,
        "frames": ty,
        "audio_sec_per_sec": round(steps_per_sec * audio_sec_per_step, 2),
        "init_s": round(init_s, 1),
        "compile_s": round(compile_s, 1),
        "loss_g": round(float(metrics["loss/g/total"]), 3),
        "loss_d": round(float(metrics["loss/d/total"]), 3),
    }))


if __name__ == "__main__":
    main()
