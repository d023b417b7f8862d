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

The optional ``model`` axis carries vocab-dim tensor parallelism of the
prediction head (see :func:`place_params`): the hidden x vocab matmul of
every decode step is column-split over the axis and XLA places the logits
collectives.  A mesh of shape (data, 1) is created when ``model_parallel=1``
so sharding specs stay uniform.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def configure_collective_timeout(seconds: int = 600) -> None:
    """Bound how long a collective waits on a straggling peer.

    XLA's CPU collectives (Gloo) default to a 1800s internal timeout: a
    dead or straggling rank surfaces 30 minutes later as an opaque
    ``JaxRuntimeError: Gloo ... Timed out waiting 1800000ms`` at whatever
    collective happened to be in flight (observed inside a mid-epoch save,
    where it reads as a checkpoint bug).  Setting a tighter bound makes
    multi-process jobs fail fast and lets harnesses with their own outer
    timeout (e.g. tests/test_multiprocess.py's 2400s) collect per-rank
    output that names the straggler instead of killing a hung job blind.

    Must be called BEFORE the first jax backend touch (it appends to
    ``XLA_FLAGS``); a no-op if the flag is already set — an explicit
    operator choice wins.
    """
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_cpu_collective_timeout_seconds" in flags:
        return
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_cpu_collective_timeout_seconds={int(seconds)}"
    ).strip()


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
    the mesh's data axis.  Scalars are replicated; non-numeric leaves (ids,
    strings) pass through untouched so whole eval batches can be sharded
    directly.

    Single-process: a plain sharded ``device_put`` (global batch sizes must
    be divisible by the data-axis size; the data layer pads its final batch
    to guarantee this).  Multi-process (v5e-16+ over DCN): each leaf is this
    process's slice of the global batch (the batchers' ``process_index``/
    ``process_count`` feeding seam) and is assembled into one global
    jax.Array via ``jax.make_array_from_process_local_data``."""
    multihost = jax.process_count() > 1

    def put(x):
        if isinstance(x, (str, bytes)):
            return x
        arr = np.asarray(x)
        # 'O' = object arrays, 'U'/'S' = numpy string arrays (a plain list
        # of filenames lands here as '<U*', not object) — all pass through
        if arr.dtype.kind in "OUS":
            return x
        if arr.ndim == 0:
            return jax.device_put(arr, replicated_sharding(mesh))
        sh = data_sharding(mesh, arr.ndim)
        if multihost:
            return jax.make_array_from_process_local_data(sh, arr)
        return jax.device_put(arr, sh)
    return jax.tree_util.tree_map(put, batch)


def replicate_tree(mesh: Mesh, tree):
    """Replicate a parameter/opt-state pytree onto every device."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


def place_params(mesh: Mesh, params):
    """Place a captioner param tree on the mesh: everything replicated
    EXCEPT the prediction head, whose vocab dimension is sharded over the
    ``model`` axis (vocab-dim tensor parallelism).

    The predict head is each decode step's largest matmul (hidden x vocab,
    e.g. 1024 x 9962 for AoA/COCO14); sharding its columns splits that
    matmul's FLOPs and the (B, V) logits' memory across the model axis.
    Weight-norm math stays exact under column sharding: ``dense_wn``
    normalizes v per-column (axis=0), which is local to each shard.
    Downstream consumers (softmax, argmax, top_k over V) are jit-compiled
    with sharding propagation, so XLA inserts the cross-shard collectives
    itself.  On a (N, 1) mesh this degenerates to full replication."""
    rep = replicated_sharding(mesh)
    if MODEL_AXIS not in mesh.axis_names or mesh.shape[MODEL_AXIS] == 1:
        return replicate_tree(mesh, params)
    vdim = {"v": NamedSharding(mesh, P(None, MODEL_AXIS)),
            "g": NamedSharding(mesh, P(MODEL_AXIS)),
            "b": NamedSharding(mesh, P(MODEL_AXIS))}

    def place(path, x):
        keys = [getattr(p, "key", getattr(p, "idx", None)) for p in path]
        if "predict" in keys and keys[-1] in vdim:
            return jax.device_put(x, vdim[keys[-1]])
        return jax.device_put(x, rep)

    return jax.tree_util.tree_map_with_path(place, params)


def host_read(x):
    """Device value -> host ``np.ndarray`` on EVERY process (multi-host
    safe).  Single-host / fully-replicated arrays use the plain ``__array__``
    path; data-sharded global arrays are all-gathered across processes so
    each host sees the full batch axis (eval decode reads ids this way —
    every process then scores the identical full result set, keeping
    best-checkpoint decisions in lockstep)."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable \
            and not x.is_fully_replicated:
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def host_allgather(x: np.ndarray) -> np.ndarray:
    """Host-value all-gather: (…,) on each process -> (P, …) on every
    process, in process order.  Identity-with-leading-axis single-process,
    so call sites stay uniform."""
    if jax.process_count() == 1:
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(np.asarray(x)))


def barrier(tag: str) -> None:
    """Cross-process barrier (no-op single-process).  Placed after
    process-0-only checkpoint writes so no process acts on a checkpoint
    before it is durable (the commit point of coordinated saves)."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices(tag)


def processes_agree(fingerprint: np.ndarray) -> bool:
    """True iff every process passed a bit-identical fingerprint array.
    Collective — every process must call it (always-reached code paths
    only).

    Gathers the fingerprint's raw BYTES: the gather rides jax, which under
    the default ``jax_enable_x64=False`` silently canonicalizes
    float64->float32 / (u)int64->int32 — enough to alias two checkpoint
    checksums that differ only below float32 precision, defeating the
    agreement check.  A uint8 view survives canonicalization bit-exactly."""
    a = np.ascontiguousarray(np.asarray(fingerprint))
    g = host_allgather(a.view(np.uint8).reshape(-1))
    return bool(np.all(g == g[0]))


def local_batch_slice(global_batch_size: int, mesh: Mesh) -> int:
    """Rows of each global batch this process materializes (the batchers'
    per-process feeding seam; single-process: the full batch)."""
    del mesh
    count = jax.process_count()
    if global_batch_size % count:
        raise ValueError(f"global batch {global_batch_size} not divisible "
                         f"by process_count {count}")
    return global_batch_size // count
