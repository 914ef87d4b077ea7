"""Worker for the two-process distributed test (run via subprocess, one per rank).

Validates the multi-host story on one machine: jax.distributed rendezvous, a global mesh
spanning both processes' CPU devices, sensor-sharded encode where each process holds its
local shards, and the index-ordered gather over the process boundary
(multihost_utils.process_allgather — the DCN path of SURVEY.md §2.9).

Usage: python tests/mp_worker.py <rank> <nprocs> <port> <out_npz>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=2").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> int:
    rank, nprocs, port, out = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]

    from kwave_tpu.parallel.distributed import encode_sharded, gather_frames, initialize

    initialize(coordinator=f"localhost:{port}", num_processes=nprocs, process_id=rank)
    assert jax.process_count() == nprocs, jax.process_count()
    n_global = len(jax.devices())

    from jax.sharding import Mesh

    from kwave_tpu.basis import generate_basis

    mesh = Mesh(np.asarray(jax.devices()), ("space",))
    cb = generate_basis(20.0, 1, 2, normalize=True)
    t_steps, n_sensors = 200, 64 * n_global
    t = np.arange(t_steps, dtype=np.float32)[:, None]
    phase = np.linspace(0, 2 * np.pi, n_sensors, dtype=np.float32)[None, :]
    x = (1e5 * np.sin(2 * np.pi * t / 20.0 + phase)).astype(np.float32)

    frames = encode_sharded(x, cb, mesh)
    gathered = gather_frames(frames, mesh)

    if rank == 0:
        np.savez(out, re=gathered[0], im=gathered[1])
    # all ranks must reach the collective; exit cleanly
    jax.effects_barrier()
    return 0


if __name__ == "__main__":
    sys.exit(main())
