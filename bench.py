"""Benchmark: end-to-end synthesis real-time factor on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.md): >= 20x real-time per TPU chip.
vs_baseline = measured_rtf / 20.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from vits_tpu.utils.compilation_cache import enable_persistent_cache

    enable_persistent_cache()
    from vits_tpu.config import load_hparams, synthesizer_kwargs
    from vits_tpu.models.synthesizer import SynthesizerTrn
    from vits_tpu.text.symbols import symbols

    hps = load_hparams("configs/config_cje.yaml")
    model = SynthesizerTrn(**synthesizer_kwargs(hps, len(symbols)))

    b, tx, max_frames = 1, 64, 400  # ~4.64 s of audio at 22.05 kHz
    sr, hop = hps.data.sampling_rate, hps.data.hop_length
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, len(symbols), (b, tx)))
    t = jnp.asarray(rng.integers(0, 6, (b, tx)))
    x_lengths = jnp.asarray([tx] * b)
    sid = jnp.asarray([0])

    init_fn = jax.jit(
        lambda key, x, t, xl, sid, r: model.init(
            key, x, t, xl, sid=sid, rng=r, max_frames=16,
            method=SynthesizerTrn.infer,
        )
    )
    params = init_fn(
        jax.random.PRNGKey(0), x, t, x_lengths, sid, jax.random.PRNGKey(1)
    )

    @jax.jit
    def synthesize(params, x, t, x_lengths, sid, key):
        return model.apply(
            params, x, t, x_lengths, sid=sid, rng=key,
            noise_scale=0.667, noise_scale_w=0.8, max_frames=max_frames,
            method=SynthesizerTrn.infer,
        )

    # warmup/compile
    wav, y_mask, y_lengths = synthesize(params, x, t, x_lengths, sid, jax.random.PRNGKey(2))
    jax.block_until_ready(wav)

    n_iter = 10
    start = time.perf_counter()
    for i in range(n_iter):
        wav, _, yl = synthesize(params, x, t, x_lengths, sid, jax.random.PRNGKey(i))
        jax.block_until_ready(wav)
    elapsed = time.perf_counter() - start

    audio_seconds = b * max_frames * hop / sr * n_iter  # full padded output
    rtf = audio_seconds / elapsed
    print(json.dumps({
        "metric": "inference_rtf",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 20.0, 4),
    }))


if __name__ == "__main__":
    main()
