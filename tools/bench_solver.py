"""Solver throughput benchmark on the current jax backend (real TPU under axon).

Measures the production main-loop iteration time — the number the reference reports as
`average_sampling_iteration_time` / `average_non-sampling_iteration_time`
(KSpaceFirstOrderSolver.cpp:1157-1168, printStatistics :2742-2780) — for 3D heterogeneous
absorbing media at the reference's supported grid sizes (64^3..256^3; Readme.md:11-13),
with and without the full sampling+compression window pipeline.

Usage: python tools/bench_solver.py [--sizes 64,128,256] [--steps 32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kwave_tpu import streams as streams_mod  # noqa: E402
from kwave_tpu.basis import generate_basis  # noqa: E402
from kwave_tpu.driver import make_window_fn  # noqa: E402
from kwave_tpu.solver import (  # noqa: E402
    Grid,
    Medium,
    SolverConfig,
    Sources,
    init_state,
    make_operators,
    make_simulate_fn,
)
from kwave_tpu.streams import StreamSpec  # noqa: E402


def setup(n: int, mxfft_on: bool = False, compact: bool = False,
          precision: str = "highest", direct_base: int = 0):
    dx = 1e-4
    dt = 0.3 * dx / 1600.0
    grid = Grid(nx=n, ny=n, nz=n, dx=dx, dy=dx, dz=dx, dt=dt, nt=10_000)
    rng = np.random.default_rng(7)
    c0 = (1500.0 + 100.0 * rng.random(grid.shape)).astype(np.float32)
    rho0 = (1000.0 + 50.0 * rng.random(grid.shape)).astype(np.float32)
    medium = Medium(c0=c0, rho0=rho0, alpha_coeff=0.75, alpha_power=1.5)
    ops = make_operators(grid, medium, (10, 10, 10), (2.0,) * 3, absorbing=True,
                         compact=compact)
    fft = None
    if mxfft_on:
        from kwave_tpu.ops import mxfft
        from kwave_tpu.solver.step import FftOps

        prec = {"high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST}[precision]
        fwd, inv, perms = mxfft.make_fft_ops(grid.shape, precision=prec,
                                             direct_base=direct_base or None)
        ops = mxfft.permute_operators(ops, 3, perms)
        fft = FftOps(rfftn=fwd, irfftn=inv)
    ops = jax.tree_util.tree_map(jnp.asarray, ops)  # device-resident (see driver.py)
    # steady-state step: the driver peels the t==0 initial-pressure program out
    # of the scan (make_window_fn peel_p0), so production iterations carry no p0
    # branch — the benchmark measures exactly that step
    cfg = SolverConfig(absorbing=True)
    p0 = np.zeros(grid.shape, np.float32)
    p0[n // 2, n // 2, n // 2] = 1e5
    src = Sources(p0=jnp.asarray(p0))
    return grid, ops, cfg, src, fft


_PROBE = None


def probe(x) -> float:
    """Force execution by fetching a scalar that data-depends on x (block_until_ready does
    not wait for device execution on remote backends like the axon tunnel)."""
    global _PROBE
    if _PROBE is None:
        _PROBE = jax.jit(lambda v: jnp.sum(v))
    return float(_PROBE(x))


def bench_plain(n: int, steps: int, mxfft_on: bool = False,
                compact: bool = False,
                precision: str = "highest", direct_base: int = 0) -> float:
    """Seconds per iteration, solver only (non-sampling)."""
    grid, ops, cfg, src, fft = setup(n, mxfft_on, compact, precision,
                                     direct_base)
    from kwave_tpu.solver.step import LOCAL_FFT

    run = make_simulate_fn(ops, src, cfg, steps, fft=fft or LOCAL_FFT)
    state = init_state(grid)
    state, _ = run(state, jnp.int32(0))
    probe(state.p)
    state = init_state(grid)
    reps = 4  # chained reps amortize the ~25 ms scalar-probe round trip
    t0 = time.perf_counter()
    for r in range(reps):
        state, _ = run(state, jnp.int32(r * steps))
    probe(state.p)
    return (time.perf_counter() - t0) / (steps * reps)


def bench_sampling(n: int, steps: int, n_sensors: int = 16384,
                   mxfft_on: bool = False, compact: bool = False,
                   precision: str = "highest", direct_base: int = 0) -> float:
    """Seconds per iteration with index-mask sampling + compressed + raw p streams
    (the reference's sampling-iteration bucket)."""
    grid, ops, cfg, src, fft = setup(n, mxfft_on, compact, precision=precision,
                                     direct_base=direct_base)
    basis = generate_basis(16.0, 1, 2, normalize=True)
    o = basis.o_size
    rng = np.random.default_rng(0)
    mask = jnp.asarray(
        np.sort(rng.choice(grid.n_elements, n_sensors, replace=False)).astype(np.int32)
    )
    specs = StreamSpec.from_flags(dict(p_raw=True, p_c=True, p_rms=True), True, False)
    ss = streams_mod.init_stream_states(specs, n_sensors, grid.n_elements, basis)
    window = make_window_fn(specs, basis, cfg, o, n_sensors, ops=ops, src=src, mask=mask,
                            fft=fft)
    state = init_state(grid)
    state, ss, em = window(state, ss, jnp.int32(0))  # compile
    probe(state.p)
    state = init_state(grid)
    ss = streams_mod.init_stream_states(specs, n_sensors, grid.n_elements, basis)
    n_windows = max(steps // o, 1) * 4
    t0 = time.perf_counter()
    t = 0
    for _ in range(n_windows):
        state, ss, em = window(state, ss, jnp.int32(t))
        t += o
    probe(state.p)
    return (time.perf_counter() - t0) / (n_windows * o)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128,256")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--mxfft", action="store_true",
                    help="use the MXU matmul FFT (ops.mxfft) + compact operators")
    ap.add_argument("--no-sampling", action="store_true",
                    help="skip the sampling+encode benchmark leg")
    ap.add_argument("--precision", default="highest", choices=["high", "highest"],
                    help="mxfft matmul precision (high = 3-pass bf16, ~1e-6 rel)")
    ap.add_argument("--direct", type=int, default=0,
                    help="mxfft direct-DFT base (e.g. 256: skip butterflies for "
                         "axes <= 256, one full-DFT matmul per axis)")
    args = ap.parse_args()
    print(f"backend: {jax.devices()}  mxfft={args.mxfft} precision={args.precision}"
          f" direct={args.direct}", flush=True)
    for n in (int(s) for s in args.sizes.split(",")):
        plain = bench_plain(n, args.steps, mxfft_on=args.mxfft, compact=args.mxfft,
                            precision=args.precision, direct_base=args.direct)
        cells = n**3
        line = (
            f"  {n}^3: non-sampling {plain * 1e3:8.3f} ms/step "
            f"({cells / plain / 1e9:6.2f} Gcell/s)"
        )
        if not args.no_sampling:
            samp = bench_sampling(n, args.steps, mxfft_on=args.mxfft,
                                  compact=args.mxfft, precision=args.precision,
                                  direct_base=args.direct)
            line += (
                f" | sampling+encode {samp * 1e3:8.3f} ms/step "
                f"({cells / samp / 1e9:6.2f} Gcell/s)"
            )
        print(line, flush=True)


if __name__ == "__main__":
    main()
