"""Decompose the flat-kernel encode residual (r4 VERDICT #1, the last open codec surface).

r4 left encode at ~63-71% of its measured ~5:1 read-dominated mix ceiling with the
residual attributed to "per-grid-step fixed cost + the carry/matmul interleave" but not
measured. This isolates each suspect IN THE SAME RUN (machine state cancels):

- `copy`        : chained XLA elementwise pass — the 1:1 ceiling reference.
- `mix_exact`   : a Pallas kernel with the encode kernel's EXACT grid and block shapes
                  (read [kb*o, tile], write [kb*h2, tile], same index maps, same
                  partial boundary block) but trivial compute — the structural ceiling
                  for this grid. Gap to the generic 128-row mix probe = block-shape cost.
- `enc_full`    : production encode_frames_flat (split3 precision).
- `enc_nomask`  : full minus the OOB row mask (timing-only: boundary block reads
                  unspecified values) — the mask's VPU pass + iota cost.
- `enc_nocarry` : full minus the cross-window carry (frame = P1[k]+P2[k], wrong
                  semantics, same traffic/matmul) — the carry chain's cost: scratch
                  round trip, per-window where, kb-way unrolled concat.
- `enc_matmul`  : block-diag matmul only, write the raw projection rows (no carry, no
                  split, no concat) — everything except the contraction removed.
- kb/tile sweep on enc_full — fewer, larger grid steps vs per-step fixed cost.

All chained with true serial dependencies, scalar-probe-closed (BASELINE methodology).
Throughputs are actual bytes moved / time, so every row is comparable to `copy`.

Usage: python tools/bench_encode_residual.py [reps_outer]
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from kwave_tpu.basis import generate_basis  # noqa: E402
from kwave_tpu.ops import fastpath  # noqa: E402

PERIOD = 20.0
HARMONICS = 2
T_STEPS = 4096
N_SENSORS = 16384
REPS_INNER = 16
REPS_OUTER = 4


def _series(t, n):
    @jax.jit
    def gen():
        tt = jnp.arange(t, dtype=jnp.float32)[:, None]
        ph = jax.random.uniform(jax.random.PRNGKey(0), (1, n), dtype=jnp.float32,
                                minval=0.0, maxval=2.0 * np.pi)
        x = 1e5 * jnp.sin(2 * jnp.pi * tt / PERIOD + ph)
        return x + 1e4 * jnp.sin(4 * jnp.pi * tt / PERIOD + 1.7 * ph)

    return gen()


def _timeit(chain, probe, arg, reps_outer):
    out = chain(arg)
    float(probe(out))
    t0 = time.perf_counter()
    for _ in range(reps_outer):
        out = chain(arg)
    float(probe(out))
    return (time.perf_counter() - t0) / (reps_outer * REPS_INNER)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _variant_kernel(chunk_ref, tabblk_ref, frame_ref, p1_scratch, *, h2, kb,
                    t_rows, variant):
    """The encode kernel with one suspect removed per variant (see module doc)."""
    k = pl.program_id(1)
    chunk = chunk_ref[:]
    if variant != "nomask":
        chunk = fastpath._mask_oob_rows(chunk, k, chunk_ref.shape[0], t_rows)
    p_all = fastpath._dot_split3(tabblk_ref[:], chunk, (((0,), (0,)), ((), ())))
    if variant == "matmul":
        frame_ref[:] = p_all[: kb * h2]
        return
    prev = p1_scratch[:]
    outs = []
    for j in range(kb):
        pj = p_all[j * 2 * h2:(j + 1) * 2 * h2]
        p1, p2 = pj[:h2], pj[h2:]
        if variant == "nocarry":
            outs.append(p1 + p2)
        else:
            first = (k == 0) & (j == 0)
            outs.append(jnp.where(first, p1, prev) + p2)
            prev = p1
    frame_ref[:] = jnp.concatenate(outs, axis=0)
    if variant != "nocarry":
        p1_scratch[:] = prev


def encode_variant(series, tab_blk, o, h2, kb, tile, variant):
    t_total, n = series.shape
    k_frames = t_total // o
    grid = (pl.cdiv(n, tile), pl.cdiv(k_frames, kb))
    return pl.pallas_call(
        functools.partial(_variant_kernel, h2=h2, kb=kb,
                          t_rows=k_frames * o, variant=variant),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb * o, tile), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * o, kb * 2 * h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb * h2, tile), lambda i, k: (k, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_frames * h2, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h2, tile), jnp.float32)],
        compiler_params=fastpath._compiler_params(),
        interpret=fastpath._interpret_default(),
    )(series[: k_frames * o], tab_blk)


def main():
    reps_outer = int(sys.argv[1]) if len(sys.argv) > 1 else REPS_OUTER
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr, flush=True)
    cb = generate_basis(PERIOD, 1, HARMONICS, normalize=True)
    o = cb.o_size
    k_frames = T_STEPS // o
    h2 = 2 * HARMONICS
    series = _series(T_STEPS, N_SENSORS)
    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)
    tab2o = jnp.concatenate([tab_re, tab_im], axis=1)
    tab_lo, tab_hi = tab2o[:o], tab2o[o:]
    tab4 = jnp.concatenate([tab_lo, tab_hi], axis=1)  # [o, 4H]

    s_bytes = T_STEPS * N_SENSORS * 4
    f_bytes = k_frames * h2 * N_SENSORS * 4
    probe = jax.jit(lambda a: jnp.sum(a[..., :1]))

    # --- copy ceiling ---
    @jax.jit
    def copy_chain(x):
        def body(c, i):
            return c * (1.0 + 0.0 * i.astype(jnp.float32)), None
        out, _ = lax.scan(body, x, jnp.arange(REPS_INNER))
        return out

    dt = _timeit(copy_chain, probe, series, reps_outer)
    _emit({"op": "copy", "gbps": round(2 * s_bytes / dt / 1e9, 1)})

    tile0 = fastpath._pick_tile(N_SENSORS, o)
    kb0 = fastpath._aligned_kb(o, h2, tile0, k_frames)

    # --- structural probe at the encode kernel's exact shapes ---
    def _mix_kernel(c_ref, o_ref, *, h2, kb):
        o_ref[:] = c_ref[: kb * h2] * 2.0

    def mix_exact(x2, kb, tile):
        grid = (pl.cdiv(N_SENSORS, tile), pl.cdiv(k_frames, kb))
        return pl.pallas_call(
            functools.partial(_mix_kernel, h2=h2, kb=kb),
            grid=grid,
            in_specs=[pl.BlockSpec((kb * o, tile), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((kb * h2, tile), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k_frames * h2, N_SENSORS),
                                           jnp.float32),
            compiler_params=fastpath._compiler_params(),
            interpret=fastpath._interpret_default(),
        )(x2)

    for kb, tile in ((kb0, tile0), (16, tile0), (kb0, tile0 // 2)):
        @jax.jit
        def mix_chain(x, _kb=kb, _tile=tile):
            x2 = x[: k_frames * o]

            def body(c, _):
                y = mix_exact(c, _kb, _tile)
                return c * (1.0 + 0.0 * y[0, 0]), y
            _, ys = lax.scan(body, x2, None, length=REPS_INNER)
            return ys[-1]

        dt = _timeit(mix_chain, probe, series, reps_outer)
        _emit({"op": "mix_exact", "kb": kb, "tile": tile,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # --- encode variants (same kb/tile as production) ---
    tab_blk0 = fastpath._block_diag(tab4, kb0)
    for variant in ("full", "nomask", "nocarry", "matmul"):
        @jax.jit
        def enc_chain(x, _v=variant):
            def body(tl, _):
                f = encode_variant(x, tab_blk0, o, h2, kb0, tile0, _v)
                return tl + 0.0 * f[0, 0], f
            _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
            return fs[-1]

        dt = _timeit(enc_chain, probe, series, reps_outer)
        _emit({"op": f"enc_{variant}", "kb": kb0, "tile": tile0,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # --- kb / tile sweep on the full variant ---
    for kb, tile in ((4, tile0), (16, tile0), (12, tile0), (kb0, tile0 // 2),
                     (16, tile0 // 2)):
        tab_blk = fastpath._block_diag(tab4, kb)

        @jax.jit
        def enc_chain2(x, _kb=kb, _tile=tile, _tb=tab_blk):
            def body(tl, _):
                f = encode_variant(x, _tb, o, h2, _kb, _tile, "full")
                return tl + 0.0 * f[0, 0], f
            _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
            return fs[-1]

        dt = _timeit(enc_chain2, probe, series, reps_outer)
        _emit({"op": "enc_full_sweep", "kb": kb, "tile": tile,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # --- production entry point (sanity: must match enc_full) ---
    @jax.jit
    def prod_chain(x):
        def body(tl, _):
            f = fastpath.encode_frames_flat(x, tl, tab_hi, o, precision="split3")
            return tl + 0.0 * f[0, 0, 0], f
        _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
        return fs[-1]

    dt = _timeit(prod_chain, probe, series, reps_outer)
    _emit({"op": "enc_production", "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})


if __name__ == "__main__":
    main()
