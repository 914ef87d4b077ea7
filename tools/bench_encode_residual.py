"""Decompose the flat-kernel encode residual (r4 VERDICT #1, the last open codec surface).

VERDICT r4 left encode at "~63-71% of its mix ceiling, residual unmeasured". The
variants here isolated it completely (BASELINE.md r5 section records the numbers and
the full argument). Final finding: the wall is the IN-KERNEL FULL-BLOCK READ — any
Pallas kernel that moves every input byte through the compute units runs at ~170 GB/s
(~345 GB/s effective vreg-read rate on top of DMA), while partial-read probes with the
identical grid/blocks reach ~300 and XLA's elementwise loop ~430. Since a windowed
projection must contract every sample, ~170 is encode's speed of light on this
toolchain. The discriminating variants:

- `copy` / `mix_generic` / `mix_exact` : DMA-only ceilings (exact structure, but the
  probe reads only kb*h2 of kb*o rows into vregs).
- `enc_full/nomask/nocarry/matmul/matmul_discard/tabT` + precision & kb/tile sweeps:
  every matmul-bearing variant ~160-175 regardless of pass count (1/3/6), result use,
  orientation, or geometry.
- `enc_matmul_half` : half-size contraction, unchanged — the full block is read anyway.
- `enc_fullread` / `enc_fullread_strips` : NO matmul, full read (monolithic / 8-row
  ref slices) — both ~171-176, nailing the read itself as the wall and ruling out
  vreg-spill artifacts.
- `enc_vpu40` (112) and `enc_xla_multireduce` (59) : the no-MXU and no-Pallas escapes,
  both measured and rejected.

All chained with true serial dependencies injected through the TINY basis table
(carrying the series would add a hidden 2S pass per link; loop-invariant kernel args
would let XLA hoist the kernel and print >ceiling garbage), scalar-probe-closed
(BASELINE methodology). Throughputs are actual bytes moved / time.

Usage: python tools/bench_encode_residual.py [reps_outer] [rows]
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
                    t_rows, variant, precision="split3"):
    """The encode kernel with one suspect removed per variant (see module doc)."""
    k = pl.program_id(1)
    chunk = chunk_ref[:]
    if variant != "nomask":
        chunk = fastpath._mask_oob_rows(chunk, k, chunk_ref.shape[0], t_rows)
    if variant == "vpu40":
        # No MXU at all: fp32 broadcast-FMA over 8-ALIGNED window-PAIR slices
        # (lcm(o=20, sublane 8) = 40 rows, so every slice offset is vreg-aligned
        # — the per-window 20-row slices of the 3D kernels are not). The pair
        # table is the [40, 2*2*h2] two-window block-diagonal.
        prev = p1_scratch[:]
        outs = []
        for jp in range(kb // 2):
            sl = chunk[jp * 40:(jp + 1) * 40]
            proj = [
                jnp.sum(sl * tabblk_ref[:, m:m + 1], axis=0, keepdims=True)
                for m in range(4 * h2)
            ]
            for w in range(2):  # the two windows of the pair
                p1 = jnp.concatenate(proj[w * 2 * h2: w * 2 * h2 + h2], axis=0)
                p2 = jnp.concatenate(proj[w * 2 * h2 + h2:(w + 1) * 2 * h2],
                                     axis=0)
                first = (k == 0) & (jp == 0) & (w == 0)
                outs.append(jnp.where(first, p1, prev) + p2)
                prev = p1
        frame_ref[:] = jnp.concatenate(outs, axis=0)
        p1_scratch[:] = prev
        return
    if variant == "fullread_strips":
        # same full-block read, but in 8-row strips sliced straight off the ref
        # (no single [kb*o, tile] SSA value): discriminates "reading through
        # compute is slow" from "materializing the whole block as one value
        # forces vreg spills". XLA's elementwise copy reads every byte through
        # the VPU at ~430, so the toll cannot be intrinsic to compute reads.
        acc = jnp.zeros((1, frame_ref.shape[1]), jnp.float32)
        for r in range(chunk_ref.shape[0] // 8):
            acc = acc + jnp.sum(chunk_ref[r * 8:(r + 1) * 8], axis=0,
                                keepdims=True)
        frame_ref[:] = chunk_ref[: kb * h2] + 0.0 * acc
        return
    if variant == "fullread":
        # full-block VMEM->VREG materialization, NO matmul: a cross-sublane
        # reduction forces every row through the vector registers. If this is
        # as slow as the matmul variants, the wall is the in-kernel read of the
        # full block (which ANY projection must do), not MXU operand staging —
        # and mix_exact (which reads only kb*h2 of kb*o rows) was measuring a
        # DMA-only ceiling no full-contraction kernel can reach.
        s = jnp.sum(chunk, axis=0, keepdims=True)
        frame_ref[:] = chunk[: kb * h2] + 0.0 * s
        return
    if variant == "matmul_half":
        # contract only HALF the rows (timing-only, wrong semantics): if the
        # cost is per-staged-operand-byte, time lands halfway to the structural
        # ceiling; if it is fixed per matmul, time is unchanged
        p_half = fastpath._dot_flat(tabblk_ref[: chunk.shape[0] // 2],
                                    chunk[: chunk.shape[0] // 2],
                                    (((0,), (0,)), ((), ())), precision)
        frame_ref[:] = p_half[: kb * h2]
        return
    if variant == "matmul_discard":
        # the contraction runs but its result is (almost) unused: isolates the
        # cost of the matmul's PRESENCE (operand layout) from its result path
        p_all = fastpath._dot_flat(tabblk_ref[:], chunk,
                                   (((0,), (0,)), ((), ())), precision)
        frame_ref[:] = chunk[: kb * h2] + 0.0 * p_all[: kb * h2]
        return
    if variant == "tabT":
        # pre-transposed small operand: contraction is the MXU-natural
        # LHS[M,K] x RHS[K,N] form (no transposed-LHS dimension numbers)
        p_all = fastpath._dot_flat(tabblk_ref[:], chunk,
                                   (((1,), (0,)), ((), ())), precision)
    else:
        p_all = fastpath._dot_flat(tabblk_ref[:], chunk,
                                   (((0,), (0,)), ((), ())), precision)
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


def encode_variant(series, tab_blk, o, h2, kb, tile, variant, precision="split3",
                   dimsem=None):
    t_total, n = series.shape
    k_frames = t_total // o
    grid = (pl.cdiv(n, tile), pl.cdiv(k_frames, kb))
    params = (pltpu.CompilerParams(
        vmem_limit_bytes=fastpath._vmem_limit_bytes(),
        dimension_semantics=dimsem,
    ) if dimsem else fastpath._compiler_params())
    return pl.pallas_call(
        functools.partial(_variant_kernel, h2=h2, kb=kb,
                          t_rows=k_frames * o, variant=variant,
                          precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb * o, tile), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tab_blk.shape, lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb * h2, tile), lambda i, k: (k, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_frames * h2, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h2, tile), jnp.float32)],
        compiler_params=params,
        interpret=fastpath._interpret_default(),
    )(series[: k_frames * o], tab_blk)


def rows_sweep(series, probe, reps_outer, tile):
    """Generic 4:1 mix probe vs READ-block row count (write rows fixed at
    read/4): locates the row-count cliff that separates the 128-row probe
    (~305 GB/s) from the 160-row encode structure (~173)."""
    # rows//4 must be 8-divisible (write-block constraint), so steps of 32
    for rows in (64, 96, 128, 160, 192, 224, 256, 320):
        t_mix = (T_STEPS // rows) * rows
        seed0 = jnp.zeros((8, N_SENSORS), jnp.float32)
        out_rows = rows // 4

        def _k(c_ref, s_ref, o_ref, _out=out_rows):
            o_ref[...] = c_ref[:_out] + s_ref[0:1]

        def _m(x2, seed, _rows=rows, _out=out_rows, _tm=t_mix):
            return pl.pallas_call(
                _k,
                grid=(pl.cdiv(N_SENSORS, tile), _tm // _rows),
                in_specs=[
                    pl.BlockSpec((_rows, tile), lambda i, k: (k, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i, k: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((_out, tile), lambda i, k: (k, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((_tm // 4, N_SENSORS),
                                               jnp.float32),
                compiler_params=fastpath._compiler_params(),
                interpret=fastpath._interpret_default(),
            )(x2, seed)

        @jax.jit
        def chain(x, _tm=t_mix, _m=_m):
            x2 = x[:_tm]

            def body(seed, _):
                y = _m(x2, seed)
                return seed * (1.0 + 0.0 * y[0, 0]), y
            _, ys = lax.scan(body, seed0, None, length=REPS_INNER)
            return ys[-1]

        dt = _timeit(chain, probe, series, reps_outer)
        _emit({"op": "rows_sweep_4to1", "rows": rows,
               "gbps": round(t_mix * N_SENSORS * 4 * 1.25 / dt / 1e9, 1)})


def main():
    reps_outer = int(sys.argv[1]) if len(sys.argv) > 1 else REPS_OUTER
    if len(sys.argv) > 2 and sys.argv[2] == "rows":
        probe = jax.jit(lambda a: jnp.sum(a[..., :1]))
        series = _series(T_STEPS, N_SENSORS)
        tile = fastpath._pick_tile(N_SENSORS, generate_basis(
            PERIOD, 1, HARMONICS, normalize=True).o_size)
        rows_sweep(series, probe, reps_outer, tile)
        return
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

    # --- structural probe at the encode kernel's exact shapes. The serial
    # dependency is injected through a TINY seed block (like the generic mix
    # probe): carrying the series itself would add a hidden 2S elementwise pass
    # per link and poison the number. ---
    def _mix_kernel(c_ref, s_ref, o_ref, *, h2, kb):
        o_ref[:] = c_ref[: kb * h2] + s_ref[0 : kb * h2]

    seed_mix = jnp.zeros((max(16 * h2, 8), N_SENSORS), jnp.float32)

    def mix_exact(x2, seed, kb, tile):
        grid = (pl.cdiv(N_SENSORS, tile), pl.cdiv(k_frames, kb))
        return pl.pallas_call(
            functools.partial(_mix_kernel, h2=h2, kb=kb),
            grid=grid,
            in_specs=[
                pl.BlockSpec((kb * o, tile), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((seed_mix.shape[0], tile), lambda i, k: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((kb * h2, tile), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((k_frames * h2, N_SENSORS),
                                           jnp.float32),
            compiler_params=fastpath._compiler_params(),
            interpret=fastpath._interpret_default(),
        )(x2, seed)

    for kb, tile in ((kb0, tile0), (16, tile0), (kb0, tile0 // 2)):
        @jax.jit
        def mix_chain(x, _kb=kb, _tile=tile):
            x2 = x[: k_frames * o]

            def body(seed, _):
                y = mix_exact(x2, seed, _kb, _tile)
                return seed * (1.0 + 0.0 * y[0, 0]), y
            _, ys = lax.scan(body, seed_mix, None, length=REPS_INNER)
            return ys[-1]

        dt = _timeit(mix_chain, probe, series, reps_outer)
        _emit({"op": "mix_exact", "kb": kb, "tile": tile,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # --- generic 4:1 mix probe (r4's 128-row blocks) for same-run comparison ---
    rows_mix = 128
    t_mix = (T_STEPS // rows_mix) * rows_mix
    seed0 = jnp.zeros((8, N_SENSORS), jnp.float32)

    def _gmix_kernel(c_ref, s_ref, o_ref):
        o_ref[...] = c_ref[: rows_mix // 4] + s_ref[0:1]

    def _gmix(x2, seed):
        return pl.pallas_call(
            _gmix_kernel,
            grid=(pl.cdiv(N_SENSORS, tile0), t_mix // rows_mix),
            in_specs=[
                pl.BlockSpec((rows_mix, tile0), lambda i, k: (k, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, tile0), lambda i, k: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((rows_mix // 4, tile0), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((t_mix // 4, N_SENSORS), jnp.float32),
            compiler_params=fastpath._compiler_params(),
            interpret=fastpath._interpret_default(),
        )(x2, seed)

    @jax.jit
    def gmix_chain(x):
        x2 = x[:t_mix]

        def body(seed, _):
            y = _gmix(x2, seed)
            return seed * (1.0 + 0.0 * y[0, 0]), y
        _, ys = lax.scan(body, seed0, None, length=REPS_INNER)
        return ys[-1]

    dt = _timeit(gmix_chain, probe, series, reps_outer)
    _emit({"op": "mix_generic_4to1", "rows": rows_mix,
           "gbps": round(t_mix * N_SENSORS * 4 * 1.25 / dt / 1e9, 1)})

    # --- encode variants (same kb/tile as production). The serial dependency is
    # injected through the TABLE (tab_lo is the scan carry, the block-diag
    # operator is rebuilt from it inside each link — tiny vs the series): a
    # closure-constant table would let XLA hoist the whole kernel out of the
    # scan and fake >ceiling numbers. ---
    def chained(variant, kb, tile, precision="split3", dimsem=None):
        @jax.jit
        def enc_chain(x):
            def body(tl, _):
                t4 = jnp.concatenate([tl, tab_hi], axis=1)
                if variant == "vpu40":
                    tb = fastpath._block_diag(t4, 2)  # [40, 4*h2] pair table
                elif variant == "tabT":
                    tb = fastpath._block_diag(t4, kb).T
                else:
                    tb = fastpath._block_diag(t4, kb)
                f = encode_variant(x, tb, o, h2, kb, tile, variant, precision,
                                   dimsem)
                return tl + 0.0 * f[0, 0], f
            _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
            return fs[-1]

        return _timeit(enc_chain, probe, series, reps_outer)

    for variant in ("full", "nomask", "nocarry", "matmul", "matmul_discard",
                    "matmul_half", "fullread", "fullread_strips", "tabT",
                    "vpu40"):
        dt = chained(variant, kb0, tile0)
        _emit({"op": f"enc_{variant}", "kb": kb0, "tile": tile0,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # XLA-only formulation: the full-read toll is Mosaic-specific (XLA
    # elementwise sustains ~430), so express the projection as 4H weighted
    # REDUCTIONS of the same reshaped series — no dot anywhere — and let XLA's
    # multi-output fusion read the series once for all of them. If XLA fuses,
    # this approaches the DMA mix ceiling and beats every Pallas variant.
    k_frames_l = T_STEPS // o

    @jax.jit
    def xla_multireduce_chain(x):
        def body(tl, _):
            t4 = jnp.concatenate([tl, tab_hi], axis=1)  # [o, 4H]
            x3 = x[: k_frames_l * o].reshape(k_frames_l, o, N_SENSORS)
            outs = [
                jnp.sum(x3 * t4[None, :, m, None], axis=1)  # [K, N]
                for m in range(4 * HARMONICS)
            ]
            f = jnp.stack(outs, axis=1)  # [K, 4H, N]
            return tl + 0.0 * f[0, 0, 0], f
        _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
        return fs[-1]

    dt = _timeit(xla_multireduce_chain, probe, series, reps_outer)
    _emit({"op": "enc_xla_multireduce",
           "gbps": round((s_bytes + 2 * f_bytes) / dt / 1e9, 1)})

    # pipelining semantics: "parallel" on the sensor dim lets Mosaic reorder /
    # overlap more aggressively; tests whether the staging serializes against
    # the next block's DMA because of conservative default grid semantics
    dt = chained("nocarry", kb0, tile0, dimsem=("parallel", "arbitrary"))
    _emit({"op": "enc_nocarry_dimsem", "kb": kb0, "tile": tile0,
           "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # MXU pass count: if the contraction bounds the kernel, 1-pass default and
    # 6-pass highest separate strongly; if DMA-bound they coincide
    for precision in ("default", "highest"):
        dt = chained("full", kb0, tile0, precision)
        _emit({"op": f"enc_full_{precision}", "kb": kb0, "tile": tile0,
               "gbps": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # Mechanism check: a BF16 series input (pre-converted outside the timed
    # chain). If the staging cost is the fp32->bf16 (8,128)->(16,128) relayout,
    # a bf16 operand arrives MXU-ready and the kernel should return to its
    # structural ceiling (on S/2 read bytes); if it stays slow, the staging is
    # intrinsic to MXU operand handling, not the dtype conversion.
    series_bf16 = series.astype(jnp.bfloat16)

    @jax.jit
    def bf16_chain(xb):
        def body(tl, _):
            tb = fastpath._block_diag(
                jnp.concatenate([tl, tab_hi], axis=1), kb0).astype(jnp.bfloat16)
            f = encode_variant(xb, tb, o, h2, kb0, tile0, "matmul", "default")
            return tl + 0.0 * f[0, 0].astype(jnp.float32), f
        _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
        return fs[-1]

    dt = _timeit(bf16_chain, probe, series_bf16, reps_outer)
    _emit({"op": "enc_matmul_bf16in", "kb": kb0, "tile": tile0,
           "gbps_actual": round((s_bytes // 2 + f_bytes) / dt / 1e9, 1),
           "gbps_fp32equiv": round((s_bytes + f_bytes) / dt / 1e9, 1)})

    # --- kb / tile sweep on the full variant ---
    for kb, tile in ((4, tile0), (16, tile0), (12, tile0), (kb0, tile0 // 2),
                     (16, tile0 // 2)):
        dt = chained("full", kb, tile)
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
