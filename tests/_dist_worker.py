"""Worker process for the real multi-process DP test.

Launched by tests/test_multiprocess_dp.py: initializes jax.distributed with
num_processes>1 over CPU devices, assembles its host-local batch rows via
the ids[rank::num_replicas] stride contract (reference
DistributedBucketSampler.py:127-129), runs ONE sharded train step, and
prints the loss metrics as JSON (rank 0).
"""

import json
import os
import sys


def main() -> None:
    rank = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = sys.argv[3]

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=rank,
    )
    assert jax.process_count() == nproc, jax.process_count()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import numpy as np
    import __graft_entry__ as g
    from vits_tpu.parallel.mesh import (
        local_batch_rows,
        make_mesh,
        replicate_state,
        shard_batch,
    )

    # same seed on every process -> identical global batch and init
    state, batch, step_fn = g._dryrun_model_and_batch(nproc)
    n_local = local_batch_rows(nproc)  # global batch has nproc rows
    local = {
        k: np.asarray(v)[rank::nproc]
        if hasattr(v, "shape") and v.shape[0] == nproc
        else v
        for k, v in batch.items()
    }
    assert local["x"].shape[0] == n_local, (local["x"].shape, n_local)

    # On a loaded single-core host the two workers can reach the first
    # cross-process collective minutes apart (imports + model build are
    # time-sliced), and XLA's gloo context init has a HARDCODED 30 s
    # key-value rendezvous deadline (observed: "Gloo context initialization
    # failed ... GetKeyValue() timed out ... 29.99s"). Synchronize via the
    # coordination-service barrier — whose timeout we control — so both
    # processes enter gloo init within RPC latency of each other.
    from jax._src import distributed as _dist

    _dist.global_state.client.wait_at_barrier(
        "pre_first_collective", timeout_in_ms=30 * 60 * 1000
    )

    mesh = make_mesh(len(jax.devices()))
    state = replicate_state(state, mesh)
    global_batch = shard_batch(local, mesh)
    new_state, metrics = step_fn(state, global_batch, jax.random.PRNGKey(1))
    jax.block_until_ready(new_state.g_params)

    result = {
        k: float(v)
        for k, v in metrics.items()
        if k.startswith("loss/")
    }
    if rank == 0:
        print("RESULT " + json.dumps(result))
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
