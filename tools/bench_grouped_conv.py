"""Measure grouped vs block-diagonal-dense lowering of the CoMBD conv stack
on the current accelerator (VERDICT r4 item 4b).

    python tools/bench_grouped_conv.py [--batch 64] [--t 8192]

Runs the flagship CoMBDBlock (h_u 16..1024, groups 1..256) both ways on the
real discriminator input shape and prints per-variant wall times.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp


def _drain(out):
    """Concrete device->host fetch: on the tunneled axon backend
    block_until_ready returns before the queue drains (see bench_train.py);
    only a value read proves execution."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.sum(leaf))


def bench(fn, *args, iters=20):
    _drain(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--t", type=int, default=8192)
    args = ap.parse_args()

    from vits_tpu.models.avocodo import CoMBDBlock, COMBD_FLAGSHIP

    c = COMBD_FLAGSHIP
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((args.batch, args.t, 1)),
        jnp.float32,
    )
    results = {}
    for dense in (False, True):
        blk = CoMBDBlock(
            c.h_u, c.d_k[2], c.d_s, c.d_d, c.d_g, c.d_p[2],
            op_f=c.op_f, op_k=c.op_k, op_g=c.op_g, dense_grouped=dense,
        )
        params = blk.init(jax.random.PRNGKey(0), x, args.batch // 2,
                          args.batch // 2)
        fwd = jax.jit(lambda p, x: blk.apply(p, x, args.batch // 2,
                                             args.batch // 2))
        dt = bench(fwd, params, x)
        results[dense] = dt
        print(f"dense_grouped={dense}: {dt*1e3:.2f} ms/fwd "
              f"(batch {args.batch}, T {args.t})")

        # fwd+bwd (training cost): grad wrt params of sum of logits
        def loss(p, x):
            o_r, o_g, _, _ = blk.apply(p, x, args.batch // 2, args.batch // 2)
            return jnp.sum(o_r) + jnp.sum(o_g)

        g = jax.jit(jax.grad(loss))
        dt = bench(g, params, x)
        print(f"  +grad: {dt*1e3:.2f} ms")
    speedup = results[False] / results[True]
    print(f"dense/grouped fwd speedup: {speedup:.2f}x "
          f"({'dense wins' if speedup > 1 else 'grouped wins'})")


if __name__ == "__main__":
    main()
