"""SPMD device-mesh utilities: data-parallel (and later model-parallel)
sharding for the train step.

The reference's distribution layer is torch DistributedDataParallel over NCCL
(train.py:40-46,80-86,175-176; SURVEY.md §2.8): one process per GPU, gradient
all-reduce hooks, rank-strided data sharding. The TPU-native equivalent is a
jax.sharding.Mesh + jit: batches are sharded over the 'data' axis, parameters
replicated; XLA inserts the gradient all-reduce (psum over ICI) automatically
from sharding propagation — no NCCL-like API surface exists or is needed.

Multi-host: jax.distributed.initialize() before mesh creation; each host
feeds its local shard (jax.make_array_from_process_local_data).
"""

from __future__ import annotations

from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(devices.reshape(-1), ("data",))


def make_mesh_2d(n_data: int, n_model: int, devices=None) -> Mesh:
    """2-D (data, model) mesh: batch sharded over 'data', tensor-parallel
    layers sharded over 'model'."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    devices = devices[: n_data * n_model].reshape(n_data, n_model)
    return Mesh(devices, ("data", "model"))


def tp_shard_generator(g_params, mesh: Mesh):
    """Tensor-parallel placement for the waveform decoder: conv kernels
    sharded over output channels on the 'model' axis (per-output-channel
    quantities — bias, weight-norm g — sharded likewise). XLA inserts the
    resulting all-gathers/reduce-scatters on ICI from sharding propagation.

    The reference has no TP (SURVEY.md §2.8) — for VITS-scale models DP is
    the right strategy; this placement exists to scale the HiFi-GAN decoder
    beyond one chip's HBM bandwidth for very large batch serving/training.
    """
    n_model = mesh.shape["model"]

    def place(path, leaf):
        keys = [getattr(p, "key", "") for p in path]
        if "waveform_decoder" in keys:
            last = keys[-1]
            if last == "kernel" and leaf.ndim == 3 and leaf.shape[-1] % n_model == 0:
                return jax.device_put(leaf, NamedSharding(mesh, P(None, None, "model")))
            if last in ("bias", "g") and leaf.ndim == 1 and leaf.shape[0] % n_model == 0:
                return jax.device_put(leaf, NamedSharding(mesh, P("model")))
        return jax.device_put(leaf, NamedSharding(mesh, P()))

    return jax.tree_util.tree_map_with_path(place, g_params)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Assemble a global batch (leading axis sharded over 'data') from this
    process's host-local rows.

    Multi-host contract (reference DistributedBucketSampler.py:127-129): each
    host's sampler yields the `ids[rank::num_replicas]` stride, i.e. every
    host holds DIFFERENT rows; `jax.make_array_from_process_local_data`
    assembles them into one global array whose shards live on each host's
    addressable devices — no host ever materializes the global batch. With one
    process this is exactly `jax.device_put` onto the sharding (asserted by
    tests/test_train_step.py). Row order across hosts follows mesh device
    order; DP training is order-invariant (mean-reduced losses).
    """
    sh = batch_sharding(mesh)
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def replicate_state(state: Any, mesh: Mesh) -> Any:
    # Multi-host: every process passes the same host-local value (same seed
    # -> same init), which jax.device_put accepts for a fully-replicated
    # global sharding.
    rep = replicated(mesh)
    return jax.device_put(state, rep)


def local_batch_rows(global_batch_size: int) -> int:
    """Rows THIS process must feed per step so the assembled global batch has
    `global_batch_size` rows. With the `ids[rank::num_replicas]` sampler
    stride, every process contributes an equal share."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"process count {n_proc}"
        )
    return global_batch_size // n_proc
