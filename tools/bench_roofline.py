"""Codec roofline: measured HBM ceiling vs per-kernel throughput, per compute path.

Answers round-2 VERDICT item #2 quantitatively. For the headline workload
(T=4096, N=16384, period 20, H=2) it measures, on the current backend:

- `copy`     : a chained elementwise pass (read + write the series once) — the
               achievable HBM ceiling through this harness, i.e. the speed of light
               the fast-path kernels claim.
- `encode`   : fastpath.encode_frames alone (reads series once, writes frames once),
               chained through the (tiny) basis table so successive calls have a true
               data dependency with no extra HBM pass.
- `decode`   : fastpath.reconstruct_series alone (reads frames, writes series once),
               chained through the (tiny) frames side.
- `roundtrip`: bench.py's encode+decode chain.

Each of encode/decode/roundtrip runs once per compute path: "flat" (aligned
flat-block kernels, the production path), "vpu" (true-fp32 broadcast-FMA),
"mxu_highest" (6-pass bf16 emulation), "mxu_default" (1 bf16 pass). Mosaic has
no Precision.HIGH, so there is no 3-pass MXU path (the flat kernels' "split3"
spelling covers that regime). Throughputs are reported as ACTUAL bytes moved / time
(series bytes S, frame bytes F: copy=2S, encode=S+F, decode=F+S, roundtrip=2S+2F),
so a kernel at the ceiling prints the same GB/s as `copy`. The round-trip relative
error per path is reported alongside (accuracy cost of the bf16 paths).

Timing closes with a 4-byte scalar probe (axon tunnel; see BASELINE.md methodology).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from kwave_tpu import decoder, encoder  # noqa: E402
from kwave_tpu.basis import generate_basis  # noqa: E402
from kwave_tpu.ops import fastpath  # noqa: E402

PERIOD = 20.0
HARMONICS = 2
T_STEPS = 4096
N_SENSORS = 16384
REPS_INNER = 16
REPS_OUTER = 4
PATHS = ("flat", "vpu", "mxu_highest", "mxu_default")


def _series(t, n):
    """Built ON DEVICE: a 268 MB host->device upload over the axon tunnel can take
    many minutes when the tunnel is congested (BASELINE.md methodology)."""
    @jax.jit
    def gen():
        tt = jnp.arange(t, dtype=jnp.float32)[:, None]
        ph = jax.random.uniform(jax.random.PRNGKey(0), (1, n), dtype=jnp.float32,
                                minval=0.0, maxval=2.0 * np.pi)
        x = 1e5 * jnp.sin(2 * jnp.pi * tt / PERIOD + ph)
        return x + 1e4 * jnp.sin(4 * jnp.pi * tt / PERIOD + 1.7 * ph)

    return gen()


def _timeit(chain, probe, arg):
    out = chain(arg)
    float(probe(out))  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(REPS_OUTER):
        out = chain(arg)
    float(probe(out))
    return (time.perf_counter() - t0) / (REPS_OUTER * REPS_INNER)


def _emit(obj):
    print(json.dumps(obj), flush=True)


def _log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    paths = tuple(sys.argv[1].split(",")) if len(sys.argv) > 1 else PATHS
    if paths == ("none",):
        paths = ()
    bad = set(paths) - set(PATHS)
    if bad:
        sys.exit(f"unknown compute path(s) {sorted(bad)}; supported: {PATHS}")
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr, flush=True)
    cb = generate_basis(PERIOD, 1, HARMONICS, normalize=True)
    o = cb.o_size
    k_frames = T_STEPS // o
    _log("basis done")
    series = jnp.asarray(_series(T_STEPS, N_SENSORS))
    _log("series generated on device")
    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)  # [2o, H]
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)
    tab2o = jnp.concatenate([tab_re, tab_im], axis=1)  # [2o, 2H]
    tab_lo, tab_hi = tab2o[:o], tab2o[o:]
    # decode table layout per fastpath.reconstruct_series
    tab4 = jnp.concatenate(
        [tab_re[o:], tab_im[o:], tab_re[:o], tab_im[:o]], axis=1)  # [o, 4H]

    s_bytes = series.size * 4
    f_bytes = k_frames * (4 * HARMONICS) * N_SENSORS * 4
    probe = jax.jit(lambda a: jnp.sum(a[..., :1]))
    _log("tables staged; starting copy chain")

    results = {}

    # --- HBM ceiling: chained elementwise pass ---
    @jax.jit
    def copy_chain(x):
        def body(c, i):
            return c * (1.0 + 0.0 * i.astype(jnp.float32)), None
        out, _ = lax.scan(body, x, jnp.arange(REPS_INNER))
        return out

    dt = _timeit(copy_chain, probe, series)
    results["copy"] = round(2 * s_bytes / dt / 1e9, 1)
    _emit({"op": "copy", "gbps": results["copy"]})

    # --- structural probe: a pure copy through the encode kernel's exact grid/block
    # structure ([K, o, N] blocks (kb, o, tile)) — separates DMA/grid overhead from
    # compute in the encode numbers ---
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = fastpath._pick_tile(N_SENSORS, o)
    kb = fastpath._pick_kb(k_frames, o, tile)

    def _copy_kernel(c_ref, o_ref):
        o_ref[...] = c_ref[...]

    def _pallas_copy(x3):
        return pl.pallas_call(
            _copy_kernel,
            grid=(pl.cdiv(N_SENSORS, tile), pl.cdiv(k_frames, kb)),
            in_specs=[pl.BlockSpec((kb, o, tile), lambda i, k: (k, 0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((kb, o, tile), lambda i, k: (k, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x3.shape, jnp.float32),
            compiler_params=fastpath._compiler_params(),
        )(x3)

    @jax.jit
    def pcopy_chain(x):
        x3 = x[: k_frames * o].reshape(k_frames, o, N_SENSORS)

        def body(c, _):
            return _pallas_copy(c), None
        out, _ = lax.scan(body, x3, None, length=REPS_INNER)
        return out

    dt = _timeit(pcopy_chain, probe, series)
    results["pallas_copy"] = round(2 * k_frames * o * N_SENSORS * 4 / dt / 1e9, 1)
    _emit({"op": "pallas_copy", "gbps": results["pallas_copy"],
           "kb": kb, "tile": tile})

    # --- same probe with FLAT 8-aligned row blocks ([K*o, N] blocks (8*o, tile)):
    # isolates the cost of the o-sublane (non-(8,128)-tile-aligned) block shape ---
    rows = 8 * o
    t_flat = k_frames * o

    def _pallas_copy_flat(x2):
        return pl.pallas_call(
            _copy_kernel,
            grid=(pl.cdiv(N_SENSORS, tile), pl.cdiv(t_flat, rows)),
            in_specs=[pl.BlockSpec((rows, tile), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((rows, tile), lambda i, k: (k, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(x2.shape, jnp.float32),
            compiler_params=fastpath._compiler_params(),
        )(x2)

    @jax.jit
    def pcopy_flat_chain(x):
        x2 = x[:t_flat]

        def body(c, _):
            return _pallas_copy_flat(c), None
        out, _ = lax.scan(body, x2, None, length=REPS_INNER)
        return out

    dt = _timeit(pcopy_flat_chain, probe, series)
    results["pallas_copy_flat"] = round(2 * t_flat * N_SENSORS * 4 / dt / 1e9, 1)
    _emit({"op": "pallas_copy_flat", "gbps": results["pallas_copy_flat"],
           "rows": rows, "tile": tile})

    # --- read:write mix sweep (VERDICT r3 #2). Encode at o=20/H=2 reads ~5 bytes
    # per byte written; the 1:1 copy ceiling is the wrong roofline for that mix.
    # Each kernel reads full (rows_mix, tile) blocks and writes the first
    # rows_mix/ratio rows — the measured GB/s-vs-mix curve is the ceiling the
    # encode kernel should be judged against. A tiny carried seed block forces a
    # true serial dependency (~0.2% extra traffic). ---
    rows_mix = 128
    seed0 = jnp.zeros((8, N_SENSORS), jnp.float32)
    t_mix = (T_STEPS // rows_mix) * rows_mix
    for ratio in (1, 2, 4, 8, 16):
        out_rows = rows_mix // ratio

        def _mix_kernel(c_ref, s_ref, o_ref, _out=out_rows):
            o_ref[...] = c_ref[:_out] + s_ref[0:1]

        def _mix(x2, seed, _ratio=ratio, _out=out_rows):
            return pl.pallas_call(
                _mix_kernel,
                grid=(pl.cdiv(N_SENSORS, tile), t_mix // rows_mix),
                in_specs=[
                    pl.BlockSpec((rows_mix, tile), lambda i, k: (k, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i, k: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((_out, tile), lambda i, k: (k, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t_mix // _ratio, N_SENSORS),
                                               jnp.float32),
                compiler_params=fastpath._compiler_params(),
            )(x2, seed)

        @jax.jit
        def mix_chain(x):
            x2 = x[:t_mix]

            def body(seed, _):
                y = _mix(x2, seed)
                return seed * (1.0 + 0.0 * y[0, 0]), y

            _, ys = lax.scan(body, seed0, None, length=REPS_INNER)
            return ys[-1]

        dt = _timeit(mix_chain, probe, series)
        bytes_moved = t_mix * N_SENSORS * 4 * (1 + 1 / ratio)
        gbps = round(bytes_moved / dt / 1e9, 1)
        results[f"mix_{ratio}to1"] = gbps
        _emit({"op": "mix", "read_to_write": ratio, "gbps": gbps})

    # --- the write-dominated mirror (decode's regime: read F small, write S
    # large): read the first rows_mix/ratio rows, broadcast-write the full block ---
    for ratio in (2, 4, 8, 16):
        in_rows = rows_mix // ratio

        def _wmix_kernel(c_ref, s_ref, o_ref, _in=in_rows, _r=rows_mix // in_rows):
            blk = c_ref[...] + s_ref[0:1]
            o_ref[...] = jnp.concatenate([blk] * _r, axis=0)

        def _wmix(x2, seed, _ratio=ratio, _in=in_rows):
            return pl.pallas_call(
                _wmix_kernel,
                grid=(pl.cdiv(N_SENSORS, tile), t_mix // rows_mix),
                in_specs=[
                    pl.BlockSpec((_in, tile), lambda i, k: (k, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, tile), lambda i, k: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((rows_mix, tile), lambda i, k: (k, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((t_mix, N_SENSORS), jnp.float32),
                compiler_params=fastpath._compiler_params(),
            )(x2, seed)

        @jax.jit
        def wmix_chain(x):
            x2 = x[: t_mix // ratio]

            def body(seed, _):
                y = _wmix(x2, seed)
                return seed * (1.0 + 0.0 * y[0, 0]), y

            _, ys = lax.scan(body, seed0, None, length=REPS_INNER)
            return ys[-1]

        dt = _timeit(wmix_chain, probe, series)
        bytes_moved = t_mix * N_SENSORS * 4 * (1 + 1 / ratio)
        gbps = round(bytes_moved / dt / 1e9, 1)
        results[f"wmix_1to{ratio}"] = gbps
        _emit({"op": "mix", "read_to_write": f"1:{ratio}", "gbps": gbps})

    for path in paths:
        # --- encode alone: dependency injected through the tiny basis table ---
        def _enc(x, tl, _path=path):
            if _path == "flat":
                return fastpath.encode_frames_flat(x, tl, tab_hi, o)
            return fastpath.encode_frames(x, tl, tab_hi, o, compute=_path)

        def _dec(f, _path=path):
            if _path == "flat":
                return fastpath.reconstruct_series_flat(f, tab4, o, T_STEPS)
            return fastpath.reconstruct_series(f, tab4, o, T_STEPS, compute=_path)

        @jax.jit
        def enc_chain(x):
            def body(tl, _):
                f = _enc(x, tl)
                return tl + 0.0 * f[0, 0, 0], f
            _, fs = lax.scan(body, tab_lo, None, length=REPS_INNER)
            return fs[-1]

        dt = _timeit(enc_chain, probe, series)
        enc_gbps = (s_bytes + f_bytes) / dt / 1e9
        _emit({"op": "encode", "path": path, "gbps": round(enc_gbps, 1)})

        # --- decode alone: dependency chained through the (small) frames ---
        frames = fastpath.encode_frames(series, tab_lo, tab_hi, o, compute="vpu")

        @jax.jit
        def dec_chain(f0):
            def body(f, _):
                x = _dec(f)
                return f * (1.0 + 0.0 * x[0, 0]), x
            _, xs = lax.scan(body, f0, None, length=REPS_INNER)
            return xs[-1]

        dt = _timeit(dec_chain, probe, frames)
        dec_gbps = (s_bytes + f_bytes) / dt / 1e9
        _emit({"op": "decode", "path": path, "gbps": round(dec_gbps, 1)})

        # --- full round trip (bench.py semantics) + accuracy. The flat path runs
        # the PACKED production chain (encode_series_frames/reconstruct_frames —
        # exactly bench.py's chain), so this number and bench.py's differ only by
        # byte accounting: roofline counts actual bytes (2S+2F), bench.py counts
        # series bytes (2S). ---
        def one(x, _path=path):
            if _path == "flat":
                frames = encoder.encode_series_frames(x, cb)
                return decoder.reconstruct_frames(frames, tab_re, tab_im, o,
                                                  T_STEPS)
            f_re, f_im = encoder.encode_series_fast(x, cb, compute=_path)
            return decoder.reconstruct(f_re, f_im, tab_re, tab_im, o, T_STEPS,
                                       compute=_path)

        @jax.jit
        def rt_chain(x):
            def body(c, _):
                return one(c), None
            out, _ = lax.scan(body, x, None, length=REPS_INNER)
            return out

        rec = jax.jit(one)(series)
        err = float(
            jnp.max(jnp.abs(rec[2 * o: k_frames * o - 2 * o]
                            - series[2 * o: k_frames * o - 2 * o]))
            / jnp.max(jnp.abs(series)))
        dt = _timeit(rt_chain, probe, series)
        rt_gbps = 2 * (s_bytes + f_bytes) / dt / 1e9
        results[path] = {
            "encode": round(enc_gbps, 1),
            "decode": round(dec_gbps, 1),
            "roundtrip": round(rt_gbps, 1),
            "roundtrip_rel_err": float(f"{err:.2e}"),
        }
        _emit({"op": "roundtrip", "path": path, "gbps": round(rt_gbps, 1),
               "rel_err": float(f"{err:.2e}")})

    print(json.dumps(results, indent=2), file=sys.stderr)


if __name__ == "__main__":
    main()
