"""Accumulated divergence of the `--fft_precision high` perf mode vs the default.

Round-4 VERDICT Weak #3 / item #4: the 2x solver perf mode ("high" = 3-pass bf16
MXU matmul FFT) shipped with a single 40-step error datum (2.5e-3 rel) and an
extrapolated "compounds roughly linearly" claim that, if true, would make a real
10^4-step record unusable. This measures the claim directly: a driven-source
steady-state run (continuous sinusoidal pressure source, heterogeneous absorbing
medium — the regime of a real long record, where a p0 pulse would instead decay
through the PML and inflate relative norms) compared field-for-field at
40/100/300/1000/3000 steps between

- the production DEFAULT config for the size (jnp.fft at <256 axes — what
  `fft_precision=highest` auto-selects there), and
- the production "high" config (mxfft 3-pass bf16, dense-base policy per
  driver._auto_direct_base).

Reported per checkpoint: relative L2 and relative max of the pressure field,
normalized by the reference run's norm. If the error grows ~linearly the 3000/40
ratio is ~75; if bounded (phase-noise floor of a dissipative driven system) the
curve flattens — that decides whether "high" is safe at production record
lengths (CLI default policy, driver.py:_auto_* docstrings).

Usage: python tools/bench_precision_drift.py [--sizes 64,128] [--checkpoints ...]
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kwave_tpu.solver import (  # noqa: E402
    Grid,
    Medium,
    SolverConfig,
    Sources,
    init_state,
    make_operators,
    make_simulate_fn,
)
from kwave_tpu.solver.step import ADDITIVE, LOCAL_FFT, FftOps  # noqa: E402

SEG = 20  # steps per dispatch (one compile; checkpoints are multiples of SEG)
SRC_PERIOD = 16.0  # steps per source cycle


def setup(n: int, engine: str, n_steps: int):
    """engine: "jnp" (the <256-axis default) | "high" | "highest" (mxfft)."""
    dx = 1e-4
    dt = 0.3 * dx / 1600.0
    grid = Grid(nx=n, ny=n, nz=n, dx=dx, dy=dx, dz=dx, dt=dt, nt=n_steps)
    rng = np.random.default_rng(7)
    c0 = (1500.0 + 100.0 * rng.random(grid.shape)).astype(np.float32)
    rho0 = (1000.0 + 50.0 * rng.random(grid.shape)).astype(np.float32)
    medium = Medium(c0=c0, rho0=rho0, alpha_coeff=0.75, alpha_power=1.5)
    ops = make_operators(grid, medium, (10, 10, 10), (2.0,) * 3, absorbing=True,
                         need_source_kappa=True)  # additive driven source
    fft = None
    if engine != "jnp":
        from kwave_tpu.ops import mxfft

        prec = {"high": jax.lax.Precision.HIGH,
                "highest": jax.lax.Precision.HIGHEST}[engine]
        # driver._auto_direct_base policy: dense full-DFT base for >=256 axes at
        # "high" (>=512 at "highest"); smaller axes hit the dense 128 base anyway
        floor = 256 if engine == "high" else 512
        base = n if n >= floor else None
        fwd, inv, perms = mxfft.make_fft_ops(grid.shape, precision=prec,
                                             direct_base=base)
        ops = mxfft.permute_operators(ops, 3, perms)
        fft = FftOps(rfftn=fwd, irfftn=inv)
    ops = jax.tree_util.tree_map(jnp.asarray, ops)

    # driven source: a disc of points on the z = n//4 plane, additive sinusoid at
    # pressure amplitude — the field reaches a steady standing/traveling state
    # instead of decaying out through the PML
    zz, yy, xx = n // 4, np.arange(n), np.arange(n)
    ym, xm = np.meshgrid(yy, xx, indexing="ij")
    disc = (ym - n / 2) ** 2 + (xm - n / 2) ** 2 <= (n / 8) ** 2
    flat = (zz * n + ym[disc]) * n + xm[disc]
    sig = (1e5 * np.sin(2 * np.pi * np.arange(n_steps + SEG) / SRC_PERIOD)
           ).astype(np.float32)
    src = Sources(p_index=jnp.asarray(flat.astype(np.int32)),
                  p_signal=jnp.asarray(sig))
    cfg = SolverConfig(absorbing=True, p_source_flag=n_steps + SEG,
                       p_source_mode=ADDITIVE)
    return grid, ops, cfg, src, fft


def run_to_checkpoints(n: int, engine: str, checkpoints: list[int]):
    """Yield (t, p_field) at each checkpoint (device arrays, one compile)."""
    n_steps = max(checkpoints)
    grid, ops, cfg, src, fft = setup(n, engine, n_steps)
    seg = make_simulate_fn(ops, src, cfg, SEG, fft=fft or LOCAL_FFT)
    state = init_state(grid)
    t = 0
    out = {}
    for ck in sorted(checkpoints):
        while t < ck:
            state, _ = seg(state, jnp.int32(t))
            t += SEG
        out[ck] = jnp.copy(state.p)  # the next seg() donates state buffers
    return out


@jax.jit
def _norms(pa, pb):
    d = pa - pb
    return (jnp.sqrt(jnp.sum(d * d) / jnp.sum(pb * pb)),
            jnp.max(jnp.abs(d)) / jnp.max(jnp.abs(pb)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="64,128")
    ap.add_argument("--checkpoints", default="40,100,300,1000,3000")
    ap.add_argument("--engines", default="high",
                    help="comma list compared against the size's default "
                         "(jnp.fft below 256; mxfft-highest at/above)")
    args = ap.parse_args()
    checkpoints = [int(c) for c in args.checkpoints.split(",")]
    assert all(c % SEG == 0 for c in checkpoints), f"checkpoints must be x{SEG}"
    print(f"backend: {jax.devices()}", file=sys.stderr, flush=True)
    for n in (int(s) for s in args.sizes.split(",")):
        ref_engine = "jnp" if n < 256 else "highest"
        t0 = time.time()
        ref = run_to_checkpoints(n, ref_engine, checkpoints)
        # force execution before timing the trial runs
        float(jnp.max(jnp.abs(ref[max(checkpoints)])))
        print(f"[{n}^3] reference ({ref_engine}) done in {time.time()-t0:.0f}s",
              file=sys.stderr, flush=True)
        for engine in args.engines.split(","):
            got = run_to_checkpoints(n, engine, checkpoints)
            for ck in sorted(checkpoints):
                l2, mx = _norms(got[ck], ref[ck])
                print(json.dumps({
                    "n": n, "engine": engine, "vs": ref_engine, "t": ck,
                    "rel_l2": float(f"{float(l2):.3e}"),
                    "rel_max": float(f"{float(mx):.3e}"),
                }), flush=True)


if __name__ == "__main__":
    main()
