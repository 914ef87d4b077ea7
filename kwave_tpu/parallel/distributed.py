"""Multi-host orchestration: process init, sensor-block sharded encode, ordered gather.

The reference is one process/one GPU; its "distributed" story is checkpoint/restart legs
(main.cpp:147-169). Here:

- `initialize()` — `jax.distributed.initialize` wrapper (no-op single-host).
- `encode_sharded` — the codec's data parallelism: sensors sharded over the mesh, basis
  tables replicated; each chip encodes its sensor block independently (the codec state is
  O(1) per sensor — SURVEY.md §5 long-context note — so this is embarrassingly parallel).
- `gather_frames` — coefficient frames back to the writer process in sensor-index order.
  Within one process this is a device_get of the sharded array (XLA lays shards out in
  index order); across hosts, process_allgather over DCN with index-ordered reassembly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from kwave_tpu import encoder
from kwave_tpu.basis import CompressionBasis
from kwave_tpu.parallel.mesh import codec_sharding, replicated


def initialize(coordinator: Optional[str] = None, num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> int:
    """Start the JAX distributed runtime when multi-process; returns process index."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    return jax.process_index()


def shard_series(series: jax.Array, mesh: Mesh, axis: str = "space") -> jax.Array:
    """Sensor series [T, N]: shard the sensor axis."""
    return jax.device_put(series, NamedSharding(mesh, P(None, axis)))


def encode_sharded(
    series: jax.Array,
    basis: CompressionBasis,
    mesh: Mesh,
    shifted: bool = False,
    mode40: bool = False,
    axis: str = "space",
):
    """Fast-path encode with the sensor axis data-parallel over the mesh.

    The projection matmuls contract over time, so sensor-sharded inputs produce
    sensor-sharded frames with zero communication — XLA keeps everything local."""
    series = shard_series(jnp.asarray(series, jnp.float32), mesh, axis)
    with mesh:
        out = encoder.encode_series_fast(series, basis, shifted=shifted, mode40=mode40)
    return out


def fetch_global(tree):
    """Pytree of (possibly non-addressable, sharded) jax Arrays -> host numpy of the
    GLOBAL value, identical on every process.

    Non-fully-addressable arrays go through process_allgather's replicate-and-read
    (a collective: every process must walk the same tree in the same order — pytree
    traversal order is deterministic). Fully-addressable arrays (replicated or
    single-process) are plain device_get. This is the multi-host edge of the driver's
    writer: the analogue of the reference's single-writer HDF5 flush."""
    from jax.experimental import multihost_utils

    def one(x):
        if x is None or isinstance(x, np.ndarray):
            return x
        x = jnp.asarray(x)
        if jax.process_count() == 1 or x.is_fully_addressable:
            return np.asarray(x)
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree_util.tree_map(one, tree, is_leaf=lambda v: v is None)


def gather_frames(frames, mesh: Mesh) -> np.ndarray:
    """Sharded frame planes -> host arrays in sensor-index order.

    Single-process: jax.device_get walks the shards in index order. Multi-process: each
    host holds a sensor-block slice; process_allgather (DCN) then index-ordered concat —
    the multi-host analogue of the reference's single-writer HDF5 flush."""
    if jax.process_count() == 1:
        return tuple(np.asarray(f) for f in frames)
    from jax.experimental import multihost_utils

    return tuple(
        np.asarray(multihost_utils.process_allgather(f, tiled=True)) for f in frames
    )
