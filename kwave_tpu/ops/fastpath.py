"""Fast-path codec kernels: whole-series windowed projection encode and overlap-add
reconstruction, each as ONE Pallas kernel that touches HBM minimally.

The jnp einsum formulations (encoder.encode_series_fast / decoder.reconstruct) are the
reference semantics; XLA lowers them to several HBM passes (projection, shift-concat,
add; and the decode contraction materializes relayouts). These kernels do:

- `encode_frames`: read the series ONCE, write the coefficient frames once. TPU grid
  iterations run sequentially per core, so the first-half projection P1 of window k is
  carried in a VMEM scratch to window k+1 (``frame[k] = P1[k-1] + P2[k]``, the
  window-split identity derived in kwave_tpu.encoder from IndexOutputStream.cpp:380-470;
  ``frame[0] = P1[0] + P2[0]`` is the mirror identity).
- `reconstruct_series`: read the (small) frames, write the series ONCE
  (``x[k*o + r] = C[k] . tab[r+o] + C[k+1] . tab[r]`` — decoder.reconstruct's pairing).

Traffic per round trip ~ (1 + eps) reads + (1 + eps) writes of the series — the
bandwidth-bound speed of light for this transform.

Layouts follow kwave_tpu.encoder: series [T, N] (sensors on lanes), tables time-major,
frames [K, 2H, N] with rows [:H] = re, [H:] = im.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128

# The default scoped-VMEM compiler limit is 16 MB — far below v5e's 128 MB physical
# VMEM, and the binding constraint on window-block size (it capped KB at 2 and left
# the kernels per-grid-step-overhead-bound at ~13% of HBM bandwidth). Raise it and
# size the double-buffered blocks against the real budget. Per-generation physical
# VMEM differs (v4: 128 MB, v5e: 128 MB, v5p: 128 MB, older v2/v3: 16/32 MB per
# core) — derive the limit from the attached device rather than assuming v5e.
_VMEM_BY_GENERATION = {"v2": 16, "v3": 32}  # MB; everything newer has 128


@functools.cache
def _vmem_limit_bytes() -> int:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        kind = ""
    for gen, mb in _VMEM_BY_GENERATION.items():
        if gen in kind:
            return (mb - 2) * 1024 * 1024
    return 100 * 1024 * 1024


def _compiler_params():
    return pltpu.CompilerParams(vmem_limit_bytes=_vmem_limit_bytes())


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _dot_f32(a: jax.Array, b: jax.Array, dims,
             precision=lax.Precision.HIGHEST) -> jax.Array:
    """MXU contraction. HIGHEST = six bf16 passes (full fp32 emulation); HIGH = three
    passes (~3e-5 relative, above the 40-bit codec's ~8e-6 quantization floor but below
    float-mode acceptance); DEFAULT = one bf16 pass (~4e-3).

    The projection operator is [4H, o] — e.g. 8x20 for the H=2/period-20 headline — so
    every MXU pass runs at ~1% array utilization and the kernels are MXU-*issue*-bound,
    not bandwidth-bound, whenever they use the MXU. That is why compute="vpu" (true fp32
    FMAs, no emulation passes) is the production default: see _enc_kernel_vpu."""
    return lax.dot_general(a, b, dimension_numbers=dims,
                           preferred_element_type=jnp.float32,
                           precision=precision)


def _pick_tile(n: int, o_size: int, budget_bytes: int = 4 << 20) -> int:
    """Sensor-axis tile: as large as the VMEM budget allows (each grid step holds a
    double-buffered [o, tile] fp32 chunk block plus frame blocks). Big tiles matter —
    per-grid-step overhead dominates when blocks are tiny."""
    per_lane = o_size * 4 * 3  # chunk block, double-buffered + headroom
    tile = max(budget_bytes // per_lane, LANE)
    tile = (tile // LANE) * LANE
    return min(_round_up(n, LANE), tile)


def _pick_kb(k_frames: int, o_size: int, tile: int,
             budget_bytes: int = 24 << 20) -> int:
    """Windows per grid step, as many as the VMEM budget allows (the chunk block is
    KB*o*tile fp32, double-buffered; v5e VMEM is 128 MB). KB need not divide K:
    the boundary block relies on Pallas partial-block semantics — out-of-range
    READS return unspecified values (masked in-kernel where they would propagate,
    see _mask_oob_rows / the encode carry notes) and out-of-range WRITES are
    masked automatically. Measured on chip, per-grid-step cost has a large fixed
    component (~10 us at KB=2), so fewer, bigger steps dominate the tiled-DMA
    loss from the partial boundary block."""
    cap = max(budget_bytes // (o_size * tile * 4 * 2), 1)
    return max(1, min(cap, 16, k_frames))


# Mosaic rejects lax.Precision.HIGH inside kernels, so the MXU menu is the exact
# 6-pass emulation or the raw single bf16 pass.
_PRECISIONS = {
    "mxu_highest": lax.Precision.HIGHEST,
    "mxu_default": lax.Precision.DEFAULT,
}


def _project_vpu(tab: jax.Array, chunk: jax.Array) -> jax.Array:
    """[o, 4H]^T . [o, tile] on the VPU: one [o, tile] broadcast-multiply + sublane
    reduction per output row. True fp32 (no bf16 emulation passes) at 2*4H flops per
    input element — ~4 flops/byte, far below the VPU:HBM ridge, so this path is
    HBM-bandwidth-bound where the tiny-M MXU contraction is issue-bound."""
    rows = [jnp.sum(chunk * tab[:, h:h + 1], axis=0, keepdims=True)
            for h in range(tab.shape[1])]
    return jnp.concatenate(rows, axis=0)  # [4H, tile]


def _enc_kernel(chunk_ref, tab_lo_ref, tab_hi_ref, frame_ref, p1_scratch, *,
                o_size: int, kb: int, compute: str):
    """Projections for a block of KB windows per grid step. compute="vpu" (default)
    does each projection as 4H broadcast-multiply+sublane-reduce passes; the mxu_*
    variants fuse the block into ONE [4H, o] x [o, KB*tile] contraction (M and K are
    tiny next to the 128x128 array, so those run at ~1% utilization x pass count).
    KB blocking amortizes per-grid-step overhead either way."""
    k = pl.program_id(1)
    h2 = tab_lo_ref.shape[1]
    tab = jnp.concatenate([tab_lo_ref[:], tab_hi_ref[:]], axis=1)  # [o, 4H]
    prev = p1_scratch[:]
    for j in range(kb):  # static unroll over the window block
        if compute == "vpu":
            p = _project_vpu(tab, chunk_ref[j])  # [4H, tile]
        else:
            p = _dot_f32(tab, chunk_ref[j], (((0,), (0,)), ((), ())),
                         _PRECISIONS[compute])
        p1, p2 = p[:h2], p[h2:]
        first = (k == 0) & (j == 0)
        frame_ref[j] = jnp.where(first, p1, prev) + p2
        prev = p1
    p1_scratch[:] = prev


@functools.partial(jax.jit, static_argnames=("o_size", "interpret", "compute"))
def encode_frames(
    series: jax.Array,  # [K*o, N]
    tab_lo: jax.Array,  # [o, 2H] re|im columns, first window half
    tab_hi: jax.Array,  # [o, 2H] second half
    o_size: int,
    interpret: bool | None = None,
    compute: str = "vpu",
):
    """Whole-series fast encode: returns frames [K, 2H, N]. One HBM read of the series."""
    if interpret is None:
        interpret = _interpret_default()
    t_total, n = series.shape
    k_frames = t_total // o_size
    h2 = tab_lo.shape[1]
    tile = _pick_tile(n, o_size)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        series = jnp.pad(series, ((0, 0), (0, n_pad - n)))
        out = encode_frames(series, tab_lo, tab_hi, o_size, interpret, compute)
        return out[..., :n]
    # K is the MINOR grid dim: per sensor tile the windows run in order, so the P1
    # scratch carried across grid steps always holds the previous window's projection.
    # KB windows per grid step amortize the per-step overhead; the series gets an
    # explicit window axis ([K, o, N], block (KB, o, tile)) because Mosaic requires
    # block sublane dims divisible by 8 OR equal to the array dim — o is generally
    # neither of a flat [K*o, N] layout. KB need not divide K: the boundary block's
    # out-of-range windows read unspecified values and their writes are masked off
    # (Pallas non-divisible-dim semantics); their P1 garbage only flows FORWARD into
    # other out-of-range windows, and the next sensor tile restarts at k == 0 where
    # `first` resets the carry.
    kb = _pick_kb(k_frames, o_size, tile)
    grid = (pl.cdiv(n, tile), pl.cdiv(k_frames, kb))
    frames = pl.pallas_call(
        functools.partial(_enc_kernel, o_size=o_size, kb=kb, compute=compute),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, o_size, tile), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_size, h2), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((o_size, h2), lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kb, h2, tile), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_frames, h2, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h2, tile), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(series[: k_frames * o_size].reshape(k_frames, o_size, n), tab_lo, tab_hi)
    return frames


# ---------------------------------------------------------------------------
# Flat-block kernels: every HBM block 8-sublane aligned + block-diagonal matmul
# ---------------------------------------------------------------------------
#
# The 3D-layout kernels above block the series as [K, o, N] with o (e.g. 20) on the
# sublane axis. o is generally not a multiple of the fp32 (8, 128) HBM tile, and the
# resulting partial-tile DMAs run at ~half bandwidth (measured: a pure copy through
# that structure reaches ~200 GB/s vs ~410 GB/s for the aligned elementwise ceiling).
# The flat variants keep the series in its natural [T, N] layout and pick KB so that
# every block row count (KB*o in, KB*2H out) is a multiple of 8. The per-window
# projections then can't address windows on the sublane axis — instead ALL KB windows
# are projected by ONE [KB*4H, KB*o] x [KB*o, tile] matmul against a block-diagonal
# operator: 8x the flops of the per-window form, but at ~60% MXU utilization (vs ~1%)
# the compute stays well under the DMA time and the kernel is bandwidth-bound.


def _aligned_kb(o_size: int, h2: int, tile: int, k_frames: int,
                budget_bytes: int = 24 << 20) -> int:
    """Largest KB within the VMEM budget such that KB*o and KB*h2 are both
    multiples of 8 (fully tile-aligned HBM blocks)."""
    def unit(m):
        return 8 // math.gcd(m, 8)

    base = unit(o_size) * unit(h2) // math.gcd(unit(o_size), unit(h2))  # lcm
    cap = max(budget_bytes // (o_size * tile * 4 * 2), 1)
    kb = max(base, (min(cap, 16) // base) * base)
    return min(kb, _round_up(k_frames, base))


def _dot_split3(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    """fp32-ish contraction as 3 native bf16 MXU passes (2-way operand split,
    a_lo*b_lo dropped): ~2^-16 relative (the low parts are themselves bf16) —
    half the passes of HIGHEST, above the 40-bit codec's ~8e-6 quantization
    floor but fine for float-mode acceptance. Mosaic has no Precision.HIGH, so
    the split is spelled out. Measured on chip: indistinguishable throughput
    from HIGHEST or DEFAULT — the kernels are DMA-bound (BASELINE.md)."""
    f32 = jnp.float32
    a_hi = a.astype(jnp.bfloat16).astype(f32)
    b_hi = b.astype(jnp.bfloat16).astype(f32)
    a_lo, b_lo = a - a_hi, b - b_hi

    def d(u, v):
        return lax.dot_general(u.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
                               dims, preferred_element_type=f32,
                               precision=lax.Precision.DEFAULT)

    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def _dot_flat(a, b, dims, precision: str):
    if precision == "split3":
        return _dot_split3(a, b, dims)
    return _dot_f32(a, b, dims, {"highest": lax.Precision.HIGHEST,
                                 "default": lax.Precision.DEFAULT}[precision])


def _block_diag(tab: jax.Array, kb: int) -> jax.Array:
    """[kb*r, kb*c] block-diagonal stack of a [r, c] table (trace-time constant)."""
    r, c = tab.shape
    out = jnp.zeros((kb * r, kb * c), jnp.float32)
    for j in range(kb):
        out = out.at[j * r:(j + 1) * r, j * c:(j + 1) * c].set(tab)
    return out


def _mask_oob_rows(block: jax.Array, k: jax.Array, rows_per_step: int,
                   total_rows: int) -> jax.Array:
    """Zero the rows of a boundary block that lie past the array end. Unlike the
    write side (which Pallas masks automatically), OOB READS return unspecified
    values, and the block-diagonal contraction would propagate NaN*0 = NaN from
    them into every output row."""
    valid = total_rows - k * rows_per_step
    row = lax.broadcasted_iota(jnp.int32, (block.shape[0], 1), 0)
    return jnp.where(row < valid, block, 0.0)


def _enc_kernel_flat(chunk_ref, tabblk_ref, frame_ref, p1_scratch, *, h2: int,
                     kb: int, t_rows: int, precision: str):
    """ONE block-diagonal contraction projects all KB windows, then the window-split
    carry identity (frame[k] = P1[k-1] + P2[k]) is applied on the small projection."""
    k = pl.program_id(1)
    chunk = _mask_oob_rows(chunk_ref[:], k, chunk_ref.shape[0], t_rows)
    p_all = _dot_flat(tabblk_ref[:], chunk, (((0,), (0,)), ((), ())), precision)
    prev = p1_scratch[:]
    outs = []
    for j in range(kb):
        pj = p_all[j * 2 * h2:(j + 1) * 2 * h2]
        p1, p2 = pj[:h2], pj[h2:]
        first = (k == 0) & (j == 0)
        outs.append(jnp.where(first, p1, prev) + p2)
        prev = p1
    frame_ref[:] = jnp.concatenate(outs, axis=0)  # [kb*h2, tile]
    p1_scratch[:] = prev


@functools.partial(jax.jit, static_argnames=("o_size", "interpret", "precision"))
def encode_frames_flat(
    series: jax.Array,  # [K*o, N]
    tab_lo: jax.Array,  # [o, 2H]
    tab_hi: jax.Array,  # [o, 2H]
    o_size: int,
    interpret: bool | None = None,
    precision: str = "highest",
):
    """encode_frames semantics through the aligned flat-block kernel."""
    if interpret is None:
        interpret = _interpret_default()
    t_total, n = series.shape
    k_frames = t_total // o_size
    h2 = tab_lo.shape[1]
    tile = _pick_tile(n, o_size)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        series = jnp.pad(series, ((0, 0), (0, n_pad - n)))
        out = encode_frames_flat(series, tab_lo, tab_hi, o_size, interpret,
                                 precision)
        return out[..., :n]
    kb = _aligned_kb(o_size, h2, tile, k_frames)
    tab4 = jnp.concatenate([tab_lo, tab_hi], axis=1)  # [o, 4H]
    tab_blk = _block_diag(tab4, kb)  # [kb*o, kb*4H]
    grid = (pl.cdiv(n, tile), pl.cdiv(k_frames, kb))
    frames_flat = pl.pallas_call(
        functools.partial(_enc_kernel_flat, h2=h2, kb=kb,
                          t_rows=k_frames * o_size, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb * o_size, tile), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * o_size, kb * 2 * h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb * h2, tile), lambda i, k: (k, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_frames * h2, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h2, tile), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(series[: k_frames * o_size], tab_blk)
    return frames_flat.reshape(k_frames, h2, n)


def _dec_kernel_flat(f_ref, succ_ref, tabblk_ref, x_ref, first_scratch, *,
                     kb: int, h2f: int, f_rows: int, nb: int, precision: str):
    """Window-blocks walk in REVERSE grid order so the pairing of frame w with
    frame w+1 needs no pre-shifted copy of the frames: the previous (higher)
    block's first frame is carried in VMEM scratch; the very first step (the
    highest block) takes its successor frame from the tiny `succ` input (the
    frame after the highest block, precomputed by the wrapper — it is the only
    frame no processed block supplies)."""
    k = pl.program_id(1)
    b = nb - 1 - k  # block index in frame order
    f = _mask_oob_rows(f_ref[:], b, kb * h2f, f_rows)
    succ_last = jnp.where(k == 0, succ_ref[:h2f], first_scratch[:])
    parts = []
    for j in range(kb):
        parts.append(f[j * h2f:(j + 1) * h2f])
        parts.append(f[(j + 1) * h2f:(j + 2) * h2f] if j < kb - 1 else succ_last)
    g = jnp.concatenate(parts, axis=0)  # [kb*2*h2f, tile]
    x_ref[:] = _dot_flat(tabblk_ref[:], g, (((1,), (0,)), ((), ())), precision)
    first_scratch[:] = f[:h2f]


@functools.partial(jax.jit, static_argnames=("o_size", "n_steps", "normalized",
                                              "interpret", "precision"))
def reconstruct_series_flat(
    frames: jax.Array,  # [K, 2H, N]
    tab: jax.Array,  # [o, 4H]
    o_size: int,
    n_steps: int,
    normalized: bool = True,
    interpret: bool | None = None,
    precision: str = "highest",
):
    """reconstruct_series semantics through the aligned flat-block kernel."""
    if interpret is None:
        interpret = _interpret_default()
    k_total, h2, n = frames.shape
    k_max = (n_steps + o_size - 1) // o_size
    tile = _pick_tile(n, o_size)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_pad - n)))
        x = reconstruct_series_flat(frames, tab, o_size, n_steps, normalized,
                                    interpret, precision)
        return x[:, :n]
    pad_to = max(k_max, k_total) + 1
    if pad_to != k_total:
        frames = jnp.pad(frames, ((0, pad_to - k_total), (0, 0), (0, 0)))
    if normalized:
        tab = tab * jnp.float32(o_size / 2.0)
    kb = _aligned_kb(o_size, h2, tile, k_max)
    frames_flat = frames.reshape(pad_to * h2, n)
    tab_blk = _block_diag(tab, kb)  # [kb*o, kb*4H]
    nb = pl.cdiv(k_max, kb)
    grid = (pl.cdiv(n, tile), nb)
    # The successor frame of the HIGHEST block's last window (frame nb*kb) is the
    # one frame no processed block supplies; extract it here (a tiny [2H, N] slice)
    # and pass it as its own 8-aligned input. Past the padded range it is zero —
    # its windows' writes are masked off anyway.
    h_pad = _round_up(h2, 8)
    succ_idx = nb * kb
    if succ_idx < pad_to:
        succ = jnp.pad(frames[succ_idx], ((0, h_pad - h2), (0, 0)))
    else:
        succ = jnp.zeros((h_pad, n), jnp.float32)
    x = pl.pallas_call(
        functools.partial(_dec_kernel_flat, kb=kb, h2f=h2,
                          f_rows=pad_to * h2, nb=nb, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb * h2, tile), lambda i, k, _nb=nb: (_nb - 1 - k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h_pad, tile), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * o_size, kb * 2 * h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb * o_size, tile),
                               lambda i, k, _nb=nb: (_nb - 1 - k, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_max * o_size, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((h2, tile), jnp.float32)],
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(frames_flat, succ, tab_blk)
    return x if n_steps == k_max * o_size else x[:n_steps]


def _dec_kernel(f_late_ref, f_early_ref, tab_ref, x_ref, *, o_size: int, kb: int,
                compute: str):
    # g [4H, TN] = [late re|im ; early re|im]; x = tab . g (see _enc_kernel for the
    # compute-path choices); KB windows per grid step. The VPU form accumulates the
    # 4H-term synthesis as broadcast FMAs: x[r, :] = sum_h tab[r, h] * g[h, :].
    for j in range(kb):
        g = jnp.concatenate([f_late_ref[j], f_early_ref[j]], axis=0)
        if compute == "vpu":
            tab = tab_ref[:]  # [o, 4H]
            acc = tab[:, 0:1] * g[0:1, :]
            for h in range(1, tab.shape[1]):
                acc = acc + tab[:, h:h + 1] * g[h:h + 1, :]
            x_ref[j] = acc
        else:
            x_ref[j] = _dot_f32(tab_ref[:], g, (((1,), (0,)), ((), ())),
                                _PRECISIONS[compute])


@functools.partial(jax.jit, static_argnames=("o_size", "n_steps", "normalized",
                                              "interpret", "compute"))
def reconstruct_series(
    frames: jax.Array,  # [K, 2H, N] rows [:H]=re, [H:]=im
    tab: jax.Array,  # [o, 4H] = [be_re[o:] | be_im[o:] | be_re[:o] | be_im[:o]]
    o_size: int,
    n_steps: int,
    normalized: bool = True,
    interpret: bool | None = None,
    compute: str = "vpu",
):
    """Overlap-add synthesis (decoder.reconstruct semantics) writing the series once."""
    if interpret is None:
        interpret = _interpret_default()
    k_total, h2, n = frames.shape
    k_max = (n_steps + o_size - 1) // o_size
    tile = _pick_tile(n, o_size)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        frames = jnp.pad(frames, ((0, 0), (0, 0), (0, n_pad - n)))
        x = reconstruct_series(frames, tab, o_size, n_steps, normalized, interpret,
                               compute)
        return x[:, :n]
    pad_to = max(k_max, k_total) + 1
    if pad_to != k_total:
        frames = jnp.pad(frames, ((0, pad_to - k_total), (0, 0), (0, 0)))
    # fold the normalization undo into the (tiny) basis table: saves a full extra
    # HBM pass over the synthesized series
    if normalized:
        tab = tab * jnp.float32(o_size / 2.0)
    kb = _pick_kb(k_max, o_size, tile)
    grid = (pl.cdiv(n, tile), pl.cdiv(k_max, kb))
    # window k pairs frame k (late half) with frame k+1 (early half); the early stream
    # is the frames array shifted by one (a cheap copy of the SMALL coefficient side)
    # so both inputs block cleanly at any KB
    f_late = frames[:k_max]
    f_early = frames[1 : k_max + 1]
    x = pl.pallas_call(
        functools.partial(_dec_kernel, o_size=o_size, kb=kb, compute=compute),
        grid=grid,
        in_specs=[
            pl.BlockSpec((kb, h2, tile), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, h2, tile), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((o_size, 2 * h2), lambda i, k: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (kb, o_size, tile), lambda i, k: (k, 0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_max, o_size, n), jnp.float32),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(f_late, f_early, tab)
    x = x.reshape(k_max * o_size, n)
    return x if n_steps == k_max * o_size else x[:n_steps]
