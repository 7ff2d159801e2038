"""REAL multi-process data parallelism (VERDICT round-2, Missing #6).

The emulated 2-host contract test (tests/test_train_step.py) verifies the
`jax.make_array_from_process_local_data` assembly on one process; this test
actually launches 2 OS processes, initializes `jax.distributed` between
them over CPU devices, runs one sharded train step through
shard_batch/local_batch_rows, and asserts the losses match the
single-process step on the same global batch.

Reference: /root/reference/train.py:40-46,80-86 — one process per GPU via
mp.spawn + NCCL env:// rendezvous. Here: N processes, jax.distributed
coordinator rendezvous, psum from sharding propagation.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_dist_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_dp_matches_single_process():
    nproc = 2
    port = str(_free_port())
    env = dict(os.environ)
    # each worker gets exactly ONE local CPU device (no virtual-device
    # flag), so the global mesh is 2 devices across 2 processes
    env.pop("XLA_FLAGS", None)  # drop the 8-virtual-device flag
    # keep the long collective rendezvous deadline (conftest rationale):
    # two fresh processes compile the step concurrently on this 1-core
    # host and can hit an execution-time collective tens of seconds apart
    env["XLA_FLAGS"] = "--xla_cpu_collective_call_terminate_timeout_seconds=1200"
    env["JAX_PLATFORMS"] = "cpu"
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(r), str(nproc), port],
            cwd=REPO, env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, text=True,
        )
        for r in range(nproc)
    ]
    outs = [p.communicate(timeout=2400) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, (out[-2000:], err[-2000:])

    result_line = next(
        line for line in outs[0][0].splitlines() if line.startswith("RESULT ")
    )
    dist_losses = json.loads(result_line[len("RESULT "):])

    # single-process reference: same global batch on a 2-device mesh
    sys.path.insert(0, REPO)
    try:
        import __graft_entry__ as g
    finally:
        sys.path.remove(REPO)
    from vits_tpu.parallel.mesh import make_mesh, replicate_state, shard_batch

    state, batch, step_fn = g._dryrun_model_and_batch(nproc)
    mesh = make_mesh(nproc)
    state = replicate_state(state, mesh)
    gb = shard_batch(batch, mesh)
    _, metrics = step_fn(state, gb, jax.random.PRNGKey(1))

    for k, v in dist_losses.items():
        np.testing.assert_allclose(
            v, float(metrics[k]), rtol=5e-4, atol=5e-4, err_msg=k
        )
