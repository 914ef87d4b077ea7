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

    Pod-real transport properties (r4 VERDICT Missing #1):

    - The advertised writer address is resolved from the ROUTE to the
      jax.distributed coordinator (a UDP connect picks the interface that
      reaches it — the DCN-facing one on a pod, loopback in local tests), with
      ``KWAVE_WRITER_HOST`` as an explicit override; ``gethostbyname(hostname)``
      (which resolves to 127.0.0.1 on many container images) is only the last
      fallback.
    - Bulk data never rides a pickle blob: each shard streams as a tiny pickled
      header plus length-prefixed raw bytes, and the writer places shards into
      the preallocated global arrays ONE AT A TIME — peak writer memory is the
      assembled globals plus a single shard, not every peer's full window
      payload at once.
    - Every failure path names the rank: a dead peer surfaces as a
      ConnectionError naming it immediately (TCP close), a hung peer as a
      timeout error listing exactly which ranks have not delivered.
      The default timeout comes from ``KWAVE_GATHER_TIMEOUT_S`` (300 s).

    Usable as a context manager (``with WriterGather() as g: ...``) so the
    socket lifecycle survives exceptions inside the window loop.

    gather(tree) returns the global numpy tree on the writer and ``None`` on
    every other rank.
    """

    _instances = 0

    def __init__(self, timeout_s: float | None = None):
        import os
        import socket

        if timeout_s is None:
            timeout_s = float(os.environ.get("KWAVE_GATHER_TIMEOUT_S", "300"))
        WriterGather._instances += 1
        self._key = f"kwave_writer_gather_{WriterGather._instances}"
        self._seq = 0
        self._nproc = jax.process_count()
        self._rank = jax.process_index()
        self._timeout_s = timeout_s
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
            host = self._advertise_host()
            client.key_value_set(self._key, f"{host}:{port}")
            self._srv = srv
            try:
                for _ in range(self._nproc - 1):
                    conn, _addr = srv.accept()
                    conn.settimeout(timeout_s)
                    peer = int.from_bytes(self._recv_n(conn, 4), "little")
                    self._conns[peer] = conn
            except socket.timeout:
                missing = sorted(
                    set(range(1, self._nproc)) - set(self._conns)
                )
                raise RuntimeError(
                    f"writer-gather: rank(s) {missing} never connected to the "
                    f"writer at {host}:{port} within {timeout_s:.0f}s (connected: "
                    f"{sorted(self._conns)}); check DCN reachability or set "
                    "KWAVE_WRITER_HOST to the writer's pod-visible address"
                ) from None
        else:
            addr = client.blocking_key_value_get(self._key, int(timeout_s * 1000))
            host, port = addr.rsplit(":", 1)
            try:
                sock = socket.create_connection((host, int(port)),
                                                timeout=timeout_s)
            except OSError as exc:
                raise RuntimeError(
                    f"writer-gather: rank {self._rank} cannot reach the writer "
                    f"at {host}:{port} ({exc}); set KWAVE_WRITER_HOST on the "
                    "writer if its auto-detected address is not pod-visible"
                ) from exc
            sock.settimeout(timeout_s)
            sock.sendall(self._rank.to_bytes(4, "little"))
            self._sock = sock

    @staticmethod
    def _advertise_host() -> str:
        """The address non-writer ranks should dial: explicit override, else the
        interface that routes to the jax.distributed coordinator (the DCN-facing
        one on a multi-host pod), else hostname resolution as a last resort."""
        import os
        import socket

        from jax._src import distributed as _jdist

        override = os.environ.get("KWAVE_WRITER_HOST")
        if override:
            return override
        coord = getattr(_jdist.global_state, "coordinator_address", None)
        if coord:
            chost, _, cport = coord.rpartition(":")
            try:
                probe = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
                try:
                    # a host-only coordinator string makes int(cport) raise
                    # ValueError — fall through to hostname resolution
                    probe.connect((chost or "127.0.0.1", int(cport or 1)))
                    return probe.getsockname()[0]
                finally:
                    probe.close()
            except (OSError, ValueError):
                pass
        try:
            return socket.gethostbyname(socket.gethostname())
        except OSError:
            return "127.0.0.1"

    def __enter__(self) -> "WriterGather":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_n(self, sock, n: int, peer: int | None = None) -> bytes:
        buf = bytearray(n)
        self._recv_into(sock, memoryview(buf), peer)
        return bytes(buf)

    def _recv_into(self, sock, view, peer: int | None = None) -> None:
        import socket as _socket

        got = 0
        who = f"rank {peer}" if peer is not None else "peer"
        while got < len(view):
            try:
                k = sock.recv_into(view[got:])
            except _socket.timeout:
                raise RuntimeError(
                    f"writer-gather: {who} sent {got}/{len(view)} bytes then "
                    f"went silent for {self._timeout_s:.0f}s (seq {self._seq})"
                ) from None
            if k == 0:
                raise ConnectionError(
                    f"writer-gather: {who} closed the connection mid-gather "
                    f"(seq {self._seq}) — the process likely died"
                )
            got += k

    def _send_msg(self, sock, obj) -> None:
        import pickle

        payload = pickle.dumps(obj, protocol=pickle.HIGHEST_PROTOCOL)
        sock.sendall(len(payload).to_bytes(8, "little") + payload)

    def _recv_msg(self, sock, peer: int | None = None):
        import pickle

        n = int.from_bytes(self._recv_n(sock, 8, peer), "little")
        buf = bytearray(n)
        self._recv_into(sock, memoryview(buf), peer)
        return pickle.loads(buf)

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
        to_send = []  # (leaf_idx, index, np shard) triples for the wire
        locals_ = []
        for li, x in enumerate(leaves):
            if x is None or isinstance(x, (np.ndarray, int, float, np.generic)):
                locals_.append(x)
                continue
            x = jnp.asarray(x)
            if x.is_fully_addressable or x.is_fully_replicated:
                # every rank holds the full value (SPMD host arrays / replicated
                # shardings): no bytes on the wire
                locals_.append(np.asarray(x.addressable_shards[0].data)
                               if not x.is_fully_addressable else np.asarray(x))
                continue
            shards = [
                (s.index, np.ascontiguousarray(s.data))
                for s in x.addressable_shards
                if writer or s.replica_id == 0
            ]
            if not writer:
                to_send.extend((li, idx, d) for idx, d in shards)
            locals_.append(("sharded", x.shape, x.dtype, shards))

        if not writer:
            # One tiny pickled header (seq + per-shard metadata), then each
            # shard's raw bytes length-prefixed — never one pickle blob of the
            # whole window payload.
            headers = [
                (li, idx, d.dtype.str, d.shape) for li, idx, d in to_send
            ]
            self._send_msg(self._sock, (self._seq, headers))
            for _li, _idx, d in to_send:
                raw = memoryview(d).cast("B")
                self._sock.sendall(len(raw).to_bytes(8, "little"))
                self._sock.sendall(raw)
            return None

        # Writer: preallocate the global arrays from its OWN trace of the tree
        # (SPMD: every rank sees identical global shapes), then place incoming
        # shards into them one at a time — peak memory = globals + one shard.
        out_leaves = []
        fulls = {}  # leaf_idx -> (array, filled mask)
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
            fulls[i] = (full, filled)
            out_leaves.append(full)

        for peer, conn in self._conns.items():
            seq, headers = self._recv_msg(conn, peer)
            if seq != self._seq:
                raise RuntimeError(
                    f"writer-gather out of lockstep: rank {peer} at seq {seq}, "
                    f"writer at {self._seq}"
                )
            for li, index, dtype_str, shape in headers:
                n_bytes = int.from_bytes(self._recv_n(conn, 8, peer), "little")
                shard = np.empty(shape, np.dtype(dtype_str))
                if shard.nbytes != n_bytes:
                    raise RuntimeError(
                        f"writer-gather: rank {peer} announced a "
                        f"{np.dtype(dtype_str)}{shape} shard ({shard.nbytes} B) "
                        f"but sent {n_bytes} B (seq {self._seq})"
                    )
                self._recv_into(conn, memoryview(shard).cast("B"), peer)
                if li not in fulls:
                    raise RuntimeError(
                        f"writer-gather: rank {peer} sent a shard for leaf {li} "
                        "which is not sharded on the writer — ranks out of sync"
                    )
                full, filled = fulls[li]
                full[index] = shard
                filled[index] = True

        for full, filled in fulls.values():
            if not filled.all():
                raise RuntimeError(
                    "writer-gather: received shards do not cover the global array"
                )
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
