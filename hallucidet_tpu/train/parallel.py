"""Device-mesh data parallelism (the scale-out dimension, SURVEY.md §2.8).

The reference is single-GPU; its latent DDP hooks (Lightning NCCL,
Utils.reduce_dict at src/utils/utils.py:300-318) are replaced by first-class
SPMD: a `jax.sharding.Mesh` with a `data` axis, batch tensors sharded over it,
parameters replicated, and XLA inserting the gradient all-reduce over ICI.
Multi-host pods extend the same mesh over DCN (jax.distributed).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise RuntimeError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are visible"
            )
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Batch tensors: leading axis split across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Host batch -> device-sharded batch (leading dim over `data`)."""
    sh = data_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(mesh: Mesh, tree):
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def dp_jit(step_fn, mesh: Mesh, donate_state: bool = True):
    """jit a (state, batch, ...) -> (state, aux) train step for DP execution.

    Parameters/optimizer state are replicated, batches are sharded on the
    leading axis; because the loss averages over the global batch, XLA's SPMD
    partitioner emits the psum over ICI — the NCCL all-reduce equivalent —
    with zero user-level collective code.
    """
    # (state, batch, rng): params/opt replicated, batch sharded on the
    # leading axis, the PRNG key replicated. Outputs replicate (a single
    # sharding broadcasts over the whole output pytree, so this serves both
    # the (state, logs) train step and the (total, logs, dets, hall) eval
    # step); XLA inserts the all-gather for batch-sharded outputs.
    in_shardings = (replicated(mesh), data_sharding(mesh), replicated(mesh))
    return jax.jit(
        step_fn,
        in_shardings=in_shardings,
        out_shardings=replicated(mesh),
        donate_argnums=(0,) if donate_state else (),
    )


def reduce_dict(metrics: dict, mesh: Optional[Mesh] = None) -> dict:
    """Cross-process metric mean (replaces the reference's vestigial
    Utils.reduce_dict). Under single-controller JAX, replicated outputs are
    already reduced; across hosts use multihost_utils."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    return {
        k: float(
            multihost_utils.process_allgather(np.asarray(v)).mean()
        )
        for k, v in metrics.items()
    }
