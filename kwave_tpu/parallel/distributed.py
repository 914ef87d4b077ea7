"""Multi-host orchestration: process init, sensor-block sharded encode, ordered gather.

The reference is one process/one GPU; its "distributed" story is checkpoint/restart legs
(main.cpp:147-169). Here:

- `initialize()` — `jax.distributed.initialize` wrapper (no-op single-host).
- `encode_sharded` — the codec's data parallelism: sensors sharded over the mesh, basis
  tables replicated; each chip encodes its sensor block independently (the codec state is
  O(1) per sensor — SURVEY.md §5 long-context note — so this is embarrassingly parallel).
- `WriterGather` — THE production writer edge: per-window emissions reach process 0
  only (each rank ships its addressable shards point-to-point; index-ordered assembly
  on the writer). `fetch_global`/`gather_frames` are the replicate-to-all utilities
  (every rank receives the global value) for small collective state.
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


class WriterGather:
    """Point-to-point gather of sharded host values to the WRITER process only.

    The reference funnels all sampled device data to exactly one consumer (the
    zero-copy host buffers read by its single process,
    OutputStreams/BaseOutputStream.cpp:369-388). The multi-host TPU equivalent
    (SURVEY.md §2.9/§7: "index-ordered gather to the writer host over DCN") must
    NOT replicate every emission to every rank the way `process_allgather` does —
    that costs P x the necessary DCN bytes and gives every rank a global-size
    buffer. Here each non-writer rank device_gets only its ADDRESSABLE shards and
    sends them (with their global index) to process 0 over a TCP side channel;
    the writer assembles the global array by index. DCN bytes per window ~ one
    shard per rank; non-writer ranks never materialize a global row.

    The side channel's address is published through the jax.distributed
    coordinator's key-value store (the writer binds an ephemeral port). One
    instance per run; gathers are sequence-numbered and processed in lockstep
    (the driver calls gather() in identical order on every rank — SPMD host code).

    gather(tree) returns the global numpy tree on the writer and ``None`` on
    every other rank.
    """

    _instances = 0

    def __init__(self, timeout_s: float = 300.0):
        import socket

        WriterGather._instances += 1
        self._key = f"kwave_writer_gather_{WriterGather._instances}"
        self._seq = 0
        self._nproc = jax.process_count()
        self._rank = jax.process_index()
        self._srv = None
        self._conns = {}
        self._sock = None
        if self._nproc <= 1:
            return
        from jax._src import distributed as _jdist

        client = _jdist.global_state.client
        if client is None:  # pragma: no cover - initialize() always sets it
            raise RuntimeError("jax.distributed is not initialized")
        if self._rank == 0:
            srv = socket.socket()
            srv.bind(("", 0))
            srv.listen(self._nproc - 1)
            srv.settimeout(timeout_s)
            port = srv.getsockname()[1]
            try:
                host = socket.gethostbyname(socket.gethostname())
            except OSError:
                host = "127.0.0.1"
            client.key_value_set(self._key, f"{host}:{port}")
            self._srv = srv
            for _ in range(self._nproc - 1):
                conn, _addr = srv.accept()
                conn.settimeout(timeout_s)
                peer = int.from_bytes(self._recv_n(conn, 4), "little")
                self._conns[peer] = conn
        else:
            addr = client.blocking_key_value_get(self._key, int(timeout_s * 1000))
            host, port = addr.rsplit(":", 1)
            sock = socket.create_connection((host, int(port)), timeout=timeout_s)
            sock.settimeout(timeout_s)
            sock.sendall(self._rank.to_bytes(4, "little"))
            self._sock = sock

    @staticmethod
    def _recv_n(sock, n: int) -> bytes:
        buf = bytearray()
        while len(buf) < n:
            chunk = sock.recv(n - len(buf))
            if not chunk:
                raise ConnectionError("writer-gather peer closed the connection")
            buf.extend(chunk)
        return bytes(buf)

    @classmethod
    def _send_msg(cls, sock, obj) -> None:
        import pickle

        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        sock.sendall(len(payload).to_bytes(8, "little") + payload)

    @classmethod
    def _recv_msg(cls, sock):
        import pickle

        n = int.from_bytes(cls._recv_n(sock, 8), "little")
        return pickle.loads(cls._recv_n(sock, n))

    def gather(self, tree):
        """Pytree of (possibly sharded) jax Arrays -> global numpy tree on the
        writer; None on non-writer ranks (they hold only their own shards)."""
        if self._nproc <= 1:
            return jax.tree_util.tree_map(
                lambda x: x if (x is None or isinstance(x, np.ndarray))
                else np.asarray(x),
                tree, is_leaf=lambda v: v is None,
            )
        self._seq += 1
        leaves, treedef = jax.tree_util.tree_flatten(
            tree, is_leaf=lambda v: v is None
        )
        writer = self._rank == 0

        # classify each leaf; collect the shards the non-writer must ship
        to_send = []
        locals_ = []
        for x in leaves:
            if x is None or isinstance(x, (np.ndarray, int, float, np.generic)):
                to_send.append(None)
                locals_.append(x)
                continue
            x = jnp.asarray(x)
            if x.is_fully_addressable or x.is_fully_replicated:
                # every rank holds the full value (SPMD host arrays / replicated
                # shardings): no bytes on the wire
                to_send.append(None)
                locals_.append(np.asarray(x.addressable_shards[0].data)
                               if not x.is_fully_addressable else np.asarray(x))
                continue
            shards = [
                (s.index, np.asarray(s.data))
                for s in x.addressable_shards
                if writer or s.replica_id == 0
            ]
            to_send.append(shards)
            locals_.append(("sharded", x.shape, x.dtype, shards))

        if not writer:
            self._send_msg(
                self._sock,
                (self._seq, [s for s in to_send]),
            )
            return None

        received = {}
        for peer, conn in self._conns.items():
            seq, payload = self._recv_msg(conn)
            if seq != self._seq:
                raise RuntimeError(
                    f"writer-gather out of lockstep: peer {peer} at seq {seq}, "
                    f"writer at {self._seq}"
                )
            received[peer] = payload

        out_leaves = []
        for i, loc in enumerate(locals_):
            if not (isinstance(loc, tuple) and len(loc) == 4 and loc[0] == "sharded"):
                out_leaves.append(loc)
                continue
            _, shape, dtype, own = loc
            full = np.empty(shape, dtype)
            filled = np.zeros(shape, bool)
            for index, data in own:
                full[index] = data
                filled[index] = True
            for payload in received.values():
                for index, data in payload[i] or ():
                    full[index] = data
                    filled[index] = True
            if not filled.all():
                raise RuntimeError(
                    "writer-gather: received shards do not cover the global array"
                )
            out_leaves.append(full)
        return jax.tree_util.tree_unflatten(treedef, out_leaves)

    def close(self) -> None:
        for conn in self._conns.values():
            try:
                conn.close()
            except OSError:
                pass
        for s in (self._sock, self._srv):
            if s is not None:
                try:
                    s.close()
                except OSError:
                    pass
        self._conns = {}
        self._sock = self._srv = None

    def __del__(self):  # best-effort; driver calls close() explicitly
        self.close()


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
