"""Pallas kernels: fused compression-window encode.

Data layout (kwave_tpu.encoder conventions): sampled chunk ``[o, N]`` with sensors N on
the 128-lane axis; basis tables time-major ``[o, H]``; coefficient planes ``[H, N]``.

Float kernel: the two half-window projections P1 = chunk^T.bE[:o], P2 = chunk^T.bE[o:]
are MXU matmuls; ``frame = P1_prev + P2`` (the window-split identity derived in
kwave_tpu.encoder's module docstring from IndexOutputStream.cpp:380-470). One kernel
evaluates both matmuls per sensor tile and emits (frame, P1) with chunk/tables read once.

40-bit exact kernel: the reference requantizes the packed accumulators EVERY timestep
(decode -> complex MAC -> encode, IndexOutputStream.cpp:411-437). Here the whole window
runs inside one kernel with the packed planes resident in VMEM — o times fewer HBM round
trips than the lax.scan formulation. Bit-identical to `kwave_tpu.bitpack` (tests enforce).

CLZ note: `_norm`'s count-leading-zeros is computed via exact int->float conversion
(exponent-field read); mantissas are <=23 bits, so the conversion is exact and portable
across Mosaic versions without a clz primitive.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U32 = jnp.uint32
_I32 = jnp.int32

LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interpret_default() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# In-kernel 40-bit codec (bit-identical to kwave_tpu.bitpack, clz-free)
# ---------------------------------------------------------------------------


def _encode40_block(re, im, e: int):
    """kwave_tpu.bitpack.encode40 on a VMEM block (CompressHelper.cpp:292-389)."""
    bits_r = lax.bitcast_convert_type(re.astype(jnp.float32), _U32)
    bits_i = lax.bitcast_convert_type(im.astype(jnp.float32), _U32)
    s_r = bits_r >> 31
    s_i = bits_i >> 31
    e_rs = ((bits_r >> 23) & 0xFF).astype(_I32) - jnp.int32(e)
    e_is = ((bits_i >> 23) & 0xFF).astype(_I32) - jnp.int32(e)
    e_s = jnp.maximum(e_rs, e_is)
    m_r = bits_r & 0x007FFFFF
    m_i = bits_i & 0x007FFFFF
    rs_r = (6 + jnp.maximum(e_is - e_rs, 0)) & 0xFF
    rs_i = (6 + jnp.maximum(e_rs - e_is, 0)) & 0xFF
    neg = e_s < 0
    rs_r = jnp.where(neg, (rs_r - e_s) & 0xFF, rs_r)
    rs_i = jnp.where(neg, (rs_i - e_s) & 0xFF, rs_i)
    e_s = jnp.maximum(e_s, 0)
    rs_r = jnp.minimum(rs_r, 23).astype(_U32)
    rs_i = jnp.minimum(rs_i, 23).astype(_U32)
    m_r = m_r >> rs_r
    m_i = m_i >> rs_i
    max_r = jnp.uint32(0x7FFFFF) >> rs_r
    max_i = jnp.uint32(0x7FFFFF) >> rs_i
    m_r = jnp.where((m_r > 0) & (m_r != max_r), m_r + 1, m_r)
    m_i = jnp.where((m_i > 0) & (m_i != max_i), m_i + 1, m_i)
    m_r = (m_r | (jnp.uint32(1) << (jnp.uint32(23) - rs_r))) >> 1
    m_i = (m_i | (jnp.uint32(1) << (jnp.uint32(23) - rs_i))) >> 1
    over = e_s > 0xF
    m_r = jnp.where(over, jnp.uint32(0xFFFF), m_r)
    m_i = jnp.where(over, jnp.uint32(0xFFFF), m_i)
    e_s = jnp.where(over, 0xF, e_s).astype(_U32)
    header = (
        (s_r << 7) | (s_i << 6) | ((m_r & 0x10000) >> 11) | ((m_i & 0x10000) >> 12)
        | (e_s & 0xF)
    )
    return header, m_r & 0xFFFF, m_i & 0xFFFF


def _msb_index(m):
    """Index of the most-significant set bit of m (m < 2^24, m != 0) via exact
    int->float32 conversion: exponent field = 127 + msb_index.

    The conversion goes through int32 — values are < 2^24 so it is lossless, and
    Mosaic's TPU lowering supports int32->float32 but not uint32->float32."""
    f = m.astype(_I32).astype(jnp.float32)
    return ((lax.bitcast_convert_type(f, _U32) >> 23).astype(_I32) - 127)


def _decode40_block(header, mr, mi, e: int):
    """kwave_tpu.bitpack.decode40 on a VMEM block (CompressHelper.cpp:224-284)."""
    header = header.astype(_U32)
    m_r = ((header & 0x20) << 11) | (mr.astype(_U32) & 0xFFFF)
    m_i = ((header & 0x10) << 12) | (mi.astype(_U32) & 0xFFFF)
    s_r = header >> 7
    s_i = (header & 0x40) >> 6
    e_s = (header & 0xF).astype(_I32)
    m_r <<= 6
    m_i <<= 6

    def _norm(m, ex):
        nz = m != 0
        idx = _msb_index(jnp.where(nz, m, 1))
        m2 = jnp.where(nz, m << (jnp.uint32(23) - idx.astype(_U32)), m)
        ex2 = jnp.where(nz, ex - (22 - idx), 0)
        return m2, ex2

    e_base = e_s + jnp.int32(e)
    m_r, e_r = _norm(m_r, e_base)
    m_i, e_i = _norm(m_i, e_base)
    bits_r = (s_r << 31) | (e_r.astype(_U32) << 23) | (m_r & 0x7FFFFF)
    bits_i = (s_i << 31) | (e_i.astype(_U32) << 23) | (m_i & 0x7FFFFF)
    return (
        lax.bitcast_convert_type(bits_r, jnp.float32),
        lax.bitcast_convert_type(bits_i, jnp.float32),
    )


# ---------------------------------------------------------------------------
# Float-mode fused window projection
# ---------------------------------------------------------------------------


def _float_kernel(chunk_ref, tab_lo_ref, tab_hi_ref, p1_prev_ref, frame_ref, p1_ref, *,
                  first_window: bool):
    chunk = chunk_ref[:]  # [o, TN]
    # P[2H, TN] = tab^T . chunk — contraction over the o axis on the MXU
    # HIGHEST precision: the MXU's default fp32 matmul path is bf16 passes — the
    # interpret-mode (CPU) tests would hide the ~1e-3 relative error that introduces
    p1 = lax.dot_general(
        tab_lo_ref[:], chunk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    p2 = lax.dot_general(
        tab_hi_ref[:], chunk, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=lax.Precision.HIGHEST,
    )
    # frame = P1_prev + P2; first window uses its own P1 (mirror identity)
    prev = p1 if first_window else p1_prev_ref[:]
    frame_ref[:] = prev + p2
    p1_ref[:] = p1


@functools.partial(jax.jit, static_argnames=("first_window", "interpret"))
def encode_window_float(
    chunk: jax.Array,  # [o, N]
    tab_lo: jax.Array,  # [o, 2H] (re planes then im planes stacked on axis 1)
    tab_hi: jax.Array,  # [o, 2H]
    p1_prev: jax.Array,  # [2H, N]
    first_window: bool = False,
    interpret: bool | None = None,
):
    """One fused window encode. Returns (frame [2H, N], p1 [2H, N]) — pass p1 as p1_prev
    of the next window. Row blocks: [:H] = re, [H:] = im coefficients."""
    if interpret is None:
        interpret = _interpret_default()
    o, n = chunk.shape
    h2 = tab_lo.shape[1]
    tile = min(_round_up(n, LANE), 512)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        chunk = jnp.pad(chunk, ((0, 0), (0, n_pad - n)))
        p1_prev = jnp.pad(p1_prev, ((0, 0), (0, n_pad - n)))
        frame, p1 = encode_window_float(
            chunk, tab_lo, tab_hi, p1_prev, first_window, interpret
        )
        return frame[:, :n], p1[:, :n]
    grid = (pl.cdiv(n, tile),)
    out_shape = [
        jax.ShapeDtypeStruct((h2, n), jnp.float32),
        jax.ShapeDtypeStruct((h2, n), jnp.float32),
    ]
    frame, p1 = pl.pallas_call(
        functools.partial(_float_kernel, first_window=first_window),
        grid=grid,
        in_specs=[
            pl.BlockSpec((o, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((o, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((o, h2), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((h2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((h2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(chunk, tab_lo, tab_hi, p1_prev)
    return frame, p1


# ---------------------------------------------------------------------------
# 40-bit exact-mode fused window (per-step requantization loop in VMEM)
# ---------------------------------------------------------------------------


def _w40_kernel(
    chunk_ref, tabs_ref, hdr1_ref, mr1_ref, mi1_ref, hdr2_ref, mr2_ref, mi2_ref,
    hdr1_o, mr1_o, mi1_o, hdr2_o, mr2_o, mi2_o, *,
    e_const: int, o_size: int, parity: int, mirror: bool,
):
    """Runs the o-step RMW loop for one sensor tile. tabs stacks
    [bE_re; bE_im; bE1_re; bE1_im] rows: shape [2o, 4H] time-major per parity half.

    parity selects which half of the 2o-long tables this window starts at
    (stepLocal = sampledStep mod 2o, IndexOutputStream.cpp:380)."""
    h = tabs_ref.shape[1] // 4

    def body(u, carry):
        h1, r1, i1, h2, r2, i2 = carry
        sl = parity * o_size + u
        x = chunk_ref[u, :][None, :]  # [1, TN]
        t = tabs_ref[sl, :]  # [4H]
        t1r = t[0 * h : 1 * h][:, None]
        t1i = t[1 * h : 2 * h][:, None]
        t2r = t[2 * h : 3 * h][:, None]
        t2i = t[3 * h : 4 * h][:, None]

        c1r, c1i = _decode40_block(h1, r1, i1, e_const)
        c2r, c2i = _decode40_block(h2, r2, i2, e_const)
        c1r = c1r + t1r * x
        c1i = c1i + t1i * x
        c2r = c2r + t2r * x
        c2i = c2i + t2i * x
        h1n, r1n, i1n = _encode40_block(c1r, c1i, e_const)
        if mirror:
            is_mirror_step = u == o_size - 1
            m_r = c2r + c1r
            m_i = c2i + c1i
            hm, rm, im_ = _encode40_block(m_r, m_i, e_const)
            h2n, r2n, i2n = _encode40_block(c2r, c2i, e_const)
            h2n = jnp.where(is_mirror_step, hm, h2n)
            r2n = jnp.where(is_mirror_step, rm, r2n)
            i2n = jnp.where(is_mirror_step, im_, i2n)
        else:
            h2n, r2n, i2n = _encode40_block(c2r, c2i, e_const)
        return h1n, r1n, i1n, h2n, r2n, i2n

    init = (hdr1_ref[:], mr1_ref[:], mi1_ref[:], hdr2_ref[:], mr2_ref[:], mi2_ref[:])
    h1, r1, i1, h2, r2, i2 = lax.fori_loop(0, o_size, body, init)
    hdr1_o[:] = h1
    mr1_o[:] = r1
    mi1_o[:] = i1
    hdr2_o[:] = h2
    mr2_o[:] = r2
    mi2_o[:] = i2


@functools.partial(
    jax.jit, static_argnames=("e_const", "parity", "mirror", "interpret")
)
def encode_window_40b_exact(
    chunk: jax.Array,  # [o, N]
    tabs: jax.Array,  # [2o, 4H] = [bE_re | bE_im | bE1_re | bE1_im] columns
    state,  # (hdr1, mr1, mi1, hdr2, mr2, mi2) each [H, N] uint32
    e_const: int,
    parity: int,
    mirror: bool,
    interpret: bool | None = None,
):
    """One window of the reference-exact packed-accumulator path. Returns the six updated
    planes; frame emission/zeroing stays in kwave_tpu.encoder's logic."""
    if interpret is None:
        interpret = _interpret_default()
    o, n = chunk.shape
    h = tabs.shape[1] // 4
    tile = min(_round_up(n, LANE), 512)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        chunk = jnp.pad(chunk, ((0, 0), (0, n_pad - n)))
        state = tuple(jnp.pad(s, ((0, 0), (0, n_pad - n))) for s in state)
        outs = encode_window_40b_exact(
            chunk, tabs, state, e_const, parity, mirror, interpret
        )
        return tuple(o_[:, :n] for o_ in outs)
    grid = (pl.cdiv(n, tile),)
    u32 = jax.ShapeDtypeStruct((h, n), jnp.uint32)
    plane = lambda: pl.BlockSpec((h, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(
            _w40_kernel, e_const=e_const, o_size=o, parity=parity, mirror=mirror
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((o, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * o, 4 * h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            plane(), plane(), plane(), plane(), plane(), plane(),
        ],
        out_specs=[plane()] * 6,
        out_shape=[u32] * 6,
        interpret=interpret,
    )(chunk, tabs, *state)
    return tuple(outs)
