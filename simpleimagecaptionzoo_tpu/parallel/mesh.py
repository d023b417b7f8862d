"""Device mesh + sharding layer.

The reference is explicitly single-GPU ("Currently only supports single GPU",
Main.py:24-25) with no collectives of any kind (SURVEY.md §2c).  Scale-out is
therefore a first-class *new* component here, designed the TPU way:

* a 1-D ``jax.sharding.Mesh`` over all local chips with a ``data`` axis —
  batch goes over ICI, parameters are replicated (the largest model, AoA, is
  ~50M params: pure data parallelism is the right point in the
  compute/communication trade-off; SURVEY.md §2c);
* train steps are ordinary ``jax.jit`` programs with ``NamedSharding``
  annotations — XLA inserts the gradient ``all-reduce`` over ICI itself (the
  scaling-book recipe: pick a mesh, annotate, let the compiler place
  collectives);
* decode/eval/SCST rollouts are sharded along the same batch axis, so eval
  and reward computation scale linearly with chips with zero code changes.

An optional ``model`` axis is accepted for forward compatibility (vocab-dim
tensor parallelism of the prediction head); a mesh of shape (data, 1) is
created when ``model_parallel=1`` so sharding specs stay uniform.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def get_mesh(devices: Optional[Sequence] = None,
             model_parallel: int = 1) -> Mesh:
    """Mesh over the given (default: all) devices.

    Layout is (data, model); ``model_parallel`` must divide the device count.
    On a single chip this degenerates to a 1x1 mesh, so every code path is
    mesh-aware even locally.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    arr = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Host batch pytree -> device arrays with the batch axis sharded over
    the mesh's data axis.  Batch sizes must be divisible by the data-axis
    size (the data layer pads its final batch to guarantee this).  Scalars
    are replicated; non-numeric leaves (ids, strings) pass through
    untouched so whole eval batches can be sharded directly."""
    def put(x):
        if isinstance(x, (str, bytes)):
            return x
        arr = np.asarray(x)
        if arr.dtype == object:
            return x
        if arr.ndim == 0:
            return jax.device_put(arr, replicated_sharding(mesh))
        return jax.device_put(arr, data_sharding(mesh, arr.ndim))
    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a parameter/opt-state pytree onto every device."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def local_batch_slice(global_batch_size: int, mesh: Mesh) -> int:
    """Per-host slice size (single-process: the full batch).  Multi-host
    feeding would slice per process; kept explicit for that extension."""
    del mesh
    return global_batch_size
