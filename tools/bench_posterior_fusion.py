"""Measured experiment for VERDICT r4 item #8: would fusing the two
16-layer posterior WaveNets into ONE batched/wider stack raise MFU?

The flagship synthesizer runs two independent posterior encoders over the
same [B, T] grid (synthesizer.py:110-125, reference SynthesizerTrn.py:122-136):
  spec posterior : hidden 112 (= inter 192 - yin 80), 16 layers, k=5, dil=1
  pitch posterior: hidden  80,                         16 layers, k=5, dil=1
Both widths are below the 128-lane MXU tile, so each conv leaves lanes idle.

A semantics-preserving fusion exists: concatenate the two hidden states on
the channel axis (112+80=192) and give every per-layer conv BLOCK-DIAGONAL
weights — identical math, one conv call per layer at width 192/384 instead
of two calls at 112/224 and 80/160. Whether that pays depends only on
whether XLA:TPU runs the one wide conv faster than the two narrow ones,
which is exactly what this tool measures (the block-diagonal zeros cost the
MXU the same as dense weights, so dense-192 timing == fused timing).

Variants, all jitted, bf16, training sweet-spot shapes [32, 400, H]:
  separate : the real WaveNet module, 112-stack then 80-stack (today's cost)
  fused192 : one real WaveNet at width 192 (cost of the block-diag fusion)
  pair convs: just the per-layer (k=5 in_conv + 1x1 res_skip) pair at both
              widths vs fused width, isolating the conv cost from the
              gated-activation elementwise

Run on the TPU chip:  python tools/bench_posterior_fusion.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from vits_tpu.models.modules import WaveNet

B, T = 32, 400
N_LAYERS = 16
GIN = 256
N_ITER = 30


def _timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(N_ITER):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / N_ITER * 1e3  # ms


def bench_wavenet(widths: tuple[int, ...]) -> float:
    """Forward cost of running one WaveNet stack per width, sequentially
    (the synthesizer calls them back to back in one jitted step)."""
    key = jax.random.PRNGKey(0)
    models, params, xs, masks = [], [], [], []
    g = jnp.ones((B, 1, GIN), jnp.bfloat16)
    for w in widths:
        m = WaveNet(w, 5, 1, N_LAYERS, gin_channels=GIN)
        x = jax.random.normal(key, (B, T, w), jnp.bfloat16)
        mask = jnp.ones((B, T, 1), jnp.bfloat16)
        p = m.init(key, x, mask, g=g)
        models.append(m)
        params.append(p)
        xs.append(x)
        masks.append(mask)

    @jax.jit
    def fwd(params, xs, masks):
        return [
            m.apply(p, x, mask, g=g)
            for m, p, x, mask in zip(models, params, xs, masks)
        ]

    return _timeit(fwd, params, xs, masks)


def bench_layer_convs(widths: tuple[int, ...]) -> float:
    """One WaveNet layer's conv pair (k=5 H->2H + 1x1 H->2H) per width,
    16x, without the gated elementwise — isolates conv cost."""
    key = jax.random.PRNGKey(1)
    wk = {
        w: (
            jax.random.normal(key, (5, w, 2 * w), jnp.bfloat16),
            jax.random.normal(key, (1, w, 2 * w), jnp.bfloat16),
        )
        for w in widths
    }
    xs = {w: jax.random.normal(key, (B, T, w), jnp.bfloat16) for w in widths}

    @jax.jit
    def fwd(wk, xs):
        outs = []
        for w in widths:
            k5, k1 = wk[w]
            x = xs[w]
            for _ in range(N_LAYERS):
                a = jax.lax.conv_general_dilated(
                    x, k5, (1,), [(2, 2)], dimension_numbers=("NWC", "WIO", "NWC")
                )
                b = jax.lax.conv_general_dilated(
                    jnp.tanh(a[..., :w]), k1, (1,), [(0, 0)],
                    dimension_numbers=("NWC", "WIO", "NWC"),
                )
                x = b[..., :w]
            outs.append(x)
        return outs

    return _timeit(fwd, wk, xs)


def main():
    print(f"device: {jax.devices()[0].device_kind}, shapes [B={B}, T={T}], "
          f"{N_LAYERS} layers, bf16", file=sys.stderr)
    sep = bench_wavenet((112, 80))
    fused = bench_wavenet((192,))
    sep_c = bench_layer_convs((112, 80))
    fused_c = bench_layer_convs((192,))
    print(json.dumps({
        "wavenet_separate_112_80_ms": round(sep, 3),
        "wavenet_fused192_ms": round(fused, 3),
        "wavenet_fusion_speedup": round(sep / fused, 3),
        "convs_separate_112_80_ms": round(sep_c, 3),
        "convs_fused192_ms": round(fused_c, 3),
        "convs_fusion_speedup": round(sep_c / fused_c, 3),
    }))


if __name__ == "__main__":
    main()
