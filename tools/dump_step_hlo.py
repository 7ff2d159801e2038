"""Dump the compiled train-step HLO (with flax scope metadata) for perf RCA.

Usage: python tools/dump_step_hlo.py [--bf16] [--out /tmp/step.hlo.txt]

Grep the dump for a fusion name from tools/analyze_trace.py output; the
`metadata={op_name="jit(train_step)/...scope..."}` entries on its parameters
attribute device time back to model components.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--out", default="/tmp/step.hlo.txt")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--frames", type=int, default=400)
    ap.add_argument("--text", type=int, default=128)
    args = ap.parse_args()

    from vits_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    from vits_tpu.config import load_hparams, synthesizer_kwargs
    from vits_tpu.models.avocodo import AvocodoDiscriminator
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.text.symbols import symbols
    from vits_tpu.training.step import (
        create_train_state, make_optimizer, train_step,
    )

    hps = load_hparams("configs/config_cje.yaml")
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
        "spec": jnp.asarray(np.abs(rng.standard_normal((b, ty, 513))), jnp.float32),
        "spec_lengths": jnp.asarray([ty] * b),
        "ying": jnp.asarray(rng.uniform(0, 1, (b, ty, 80)), jnp.float32),
        "wav": jnp.asarray(rng.standard_normal((b, ty * hop, 1)) * 0.1, jnp.float32),
        "sid": jnp.asarray(rng.integers(0, 5, (b,))),
    }
    state = create_train_state(
        jax.random.PRNGKey(0), model, disc, optim_g, optim_d, batch
    )
    step_fn = jax.jit(
        functools.partial(
            train_step, model=model, disc=disc,
            optim_g=optim_g, optim_d=optim_d, hps=hps,
        ),
        donate_argnums=(0,),
    )
    compiled = step_fn.lower(state, batch, jax.random.PRNGKey(1)).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    cost = compiled.cost_analysis() or {}
    print(f"wrote {args.out} ({len(txt)} bytes)")
    print(f"flops={cost.get('flops', 0):.3e} "
          f"bytes accessed={cost.get('bytes accessed', 0):.3e}")


if __name__ == "__main__":
    main()
