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

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


def _dot_f32(a: jax.Array, b: jax.Array, dims) -> jax.Array:
    """fp32-accurate MXU contraction. HIGHEST = six bf16 passes (full fp32 emulation).

    Measured alternatives on chip: a 2-way bf16 split with 3 products leaves ~3e-5
    relative error (above the 40-bit codec's ~8e-6 quantization floor) and bought only
    ~6% end-to-end — the kernels are bandwidth-limited, not pass-count-limited."""
    return lax.dot_general(a, b, dimension_numbers=dims,
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _pick_tile(n: int, o_size: int, budget_bytes: int = 4 << 20) -> int:
    """Sensor-axis tile: as large as the VMEM budget allows (each grid step holds a
    double-buffered [o, tile] fp32 chunk block plus frame blocks). Big tiles matter —
    per-grid-step overhead dominates when blocks are tiny."""
    per_lane = o_size * 4 * 3  # chunk block, double-buffered + headroom
    tile = max(budget_bytes // per_lane, LANE)
    tile = (tile // LANE) * LANE
    return min(_round_up(n, LANE), tile)


def _pick_kb(k_frames: int, o_size: int, tile: int,
             budget_bytes: int = 6 << 20) -> int:
    """Windows per grid step: largest divisor of K within the VMEM budget (the chunk
    block is KB*o*tile fp32, double-buffered)."""
    cap = max(budget_bytes // (o_size * tile * 4 * 2), 1)
    kb = 1
    for d in range(1, min(cap, 8) + 1):
        if k_frames % d == 0:
            kb = d
    return kb


def _enc_kernel(chunk_ref, tab_lo_ref, tab_hi_ref, frame_ref, p1_scratch, *,
                o_size: int, kb: int):
    """Projections as ONE [4H, o] x [o, KB*tile] MXU contraction per grid step for a
    block of KB windows (separate matmuls and VPU MAC loops both measured slower: M
    and K are tiny next to the 128x128 array, so MXU issue count — which the fused M
    dim halves — and per-grid-step overhead dominate; KB blocking amortizes the
    latter). fp32 precision via HIGHEST (see _dot_f32)."""
    k = pl.program_id(1)
    h2 = tab_lo_ref.shape[1]
    tab = jnp.concatenate([tab_lo_ref[:], tab_hi_ref[:]], axis=1)  # [o, 4H]
    prev = p1_scratch[:]
    for j in range(kb):  # static unroll over the window block
        p = _dot_f32(tab, chunk_ref[j], (((0,), (0,)), ((), ())))  # [4H, tile]
        p1, p2 = p[:h2], p[h2:]
        first = (k == 0) & (j == 0)
        frame_ref[j] = jnp.where(first, p1, prev) + p2
        prev = p1
    p1_scratch[:] = prev


@functools.partial(jax.jit, static_argnames=("o_size", "interpret"))
def encode_frames(
    series: jax.Array,  # [K*o, N]
    tab_lo: jax.Array,  # [o, 2H] re|im columns, first window half
    tab_hi: jax.Array,  # [o, 2H] second half
    o_size: int,
    interpret: bool | None = None,
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
        out = encode_frames(series, tab_lo, tab_hi, o_size, interpret)
        return out[..., :n]
    # K is the MINOR grid dim: per sensor tile the windows run in order, so the P1
    # scratch carried across grid steps always holds the previous window's projection.
    # KB windows per grid step amortize the per-step overhead; the series gets an
    # explicit window axis ([K, o, N], block (KB, o, tile)) because Mosaic requires
    # block sublane dims divisible by 8 OR equal to the array dim — o is generally
    # neither of a flat [K*o, N] layout.
    kb = _pick_kb(k_frames, o_size, tile)
    grid = (pl.cdiv(n, tile), k_frames // kb)
    frames = pl.pallas_call(
        functools.partial(_enc_kernel, o_size=o_size, kb=kb),
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
        interpret=interpret,
    )(series[: k_frames * o_size].reshape(k_frames, o_size, n), tab_lo, tab_hi)
    return frames


def _dec_kernel(f_late_ref, f_early_ref, tab_ref, x_ref, *, o_size: int, kb: int):
    # g [4H, TN] = [late re|im ; early re|im]; x = tab . g (see _enc_kernel for the
    # MXU/precision choices); KB windows per grid step
    for j in range(kb):
        g = jnp.concatenate([f_late_ref[j], f_early_ref[j]], axis=0)
        x_ref[j] = _dot_f32(tab_ref[:], g, (((1,), (0,)), ((), ())))


@functools.partial(jax.jit, static_argnames=("o_size", "n_steps", "normalized",
                                              "interpret"))
def reconstruct_series(
    frames: jax.Array,  # [K, 2H, N] rows [:H]=re, [H:]=im
    tab: jax.Array,  # [o, 4H] = [be_re[o:] | be_im[o:] | be_re[:o] | be_im[:o]]
    o_size: int,
    n_steps: int,
    normalized: bool = True,
    interpret: bool | None = None,
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
        x = reconstruct_series(frames, tab, o_size, n_steps, normalized, interpret)
        return x[:, :n]
    pad_to = max(k_max, k_total) + 1
    if pad_to != k_total:
        frames = jnp.pad(frames, ((0, pad_to - k_total), (0, 0), (0, 0)))
    # fold the normalization undo into the (tiny) basis table: saves a full extra
    # HBM pass over the synthesized series
    if normalized:
        tab = tab * jnp.float32(o_size / 2.0)
    kb = _pick_kb(k_max, o_size, tile)
    grid = (pl.cdiv(n, tile), k_max // kb)
    # window k pairs frame k (late half) with frame k+1 (early half); the early stream
    # is the frames array shifted by one (a cheap copy of the SMALL coefficient side)
    # so both inputs block cleanly at any KB
    f_late = frames[:k_max]
    f_early = frames[1 : k_max + 1]
    x = pl.pallas_call(
        functools.partial(_dec_kernel, o_size=o_size, kb=kb),
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
        interpret=interpret,
    )(f_late, f_early, tab)
    x = x.reshape(k_max * o_size, n)
    return x if n_steps == k_max * o_size else x[:n_steps]
