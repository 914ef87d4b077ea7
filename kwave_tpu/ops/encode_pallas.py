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
# Exact-mode fused windows: the production encode_chunk path on TPU.
#
# parity and mirror arrive as DYNAMIC (1, 1) int32 SMEM scalars so one compiled kernel
# serves every window of the driver's jitted loop (stepLocal parity alternates per
# window and mirror fires only on the very first frame, IndexOutputStream.cpp:380-385).
# The mirror ("buf2 += buf1" at the saving step) is applied as a post-loop fixup from
# the last step's float values — identical to the in-loop formulation because the
# saving step IS the window's last step.
# ---------------------------------------------------------------------------


def _scalar2d(v) -> jax.Array:
    return jnp.asarray(v, jnp.int32).reshape(1, 1)


def _wfloat_exact_kernel(
    par_ref, mir_ref, chunk_ref, tabs_ref,
    a1r_ref, a1i_ref, a2r_ref, a2i_ref,
    o1r_ref, o1i_ref, o2r_ref, o2i_ref, *, o_size: int,
):
    """Float overlap mode: per-step fp32 MAC of both staggered accumulators
    (IndexOutputStream.cpp:438-448), whole window resident in VMEM."""
    h = tabs_ref.shape[1] // 4
    parity = par_ref[0, 0]

    def body(u, carry):
        a1r, a1i, a2r, a2i = carry
        sl = parity * o_size + u
        x = chunk_ref[u, :][None, :]  # [1, TN]
        t = tabs_ref[sl, :]  # [4H]
        a1r = a1r + t[0 * h : 1 * h][:, None] * x
        a1i = a1i + t[1 * h : 2 * h][:, None] * x
        a2r = a2r + t[2 * h : 3 * h][:, None] * x
        a2i = a2i + t[3 * h : 4 * h][:, None] * x
        return a1r, a1i, a2r, a2i

    a1r, a1i, a2r, a2i = lax.fori_loop(
        0, o_size, body, (a1r_ref[:], a1i_ref[:], a2r_ref[:], a2i_ref[:])
    )
    m = mir_ref[0, 0] != 0
    o1r_ref[:] = a1r
    o1i_ref[:] = a1i
    o2r_ref[:] = jnp.where(m, a2r + a1r, a2r)
    o2i_ref[:] = jnp.where(m, a2i + a1i, a2i)


def _wfloat_exact_noov_kernel(
    par_ref, mir_ref, chunk_ref, tabs_ref, a1r_ref, a1i_ref, o1r_ref, o1i_ref, *,
    o_size: int,
):
    """Float no-overlap mode: aliased buffer, two sequential adds per step
    (BaseOutputStream.cpp:246-257 aliasing; the float branch of
    IndexOutputStream.cpp:438-443 hits the same buffer twice)."""
    h = tabs_ref.shape[1] // 4
    parity = par_ref[0, 0]

    def body(u, carry):
        a1r, a1i = carry
        sl = parity * o_size + u
        x = chunk_ref[u, :][None, :]
        t = tabs_ref[sl, :]
        a1r = a1r + t[0 * h : 1 * h][:, None] * x
        a1i = a1i + t[1 * h : 2 * h][:, None] * x
        a1r = a1r + t[2 * h : 3 * h][:, None] * x
        a1i = a1i + t[3 * h : 4 * h][:, None] * x
        return a1r, a1i

    a1r, a1i = lax.fori_loop(0, o_size, body, (a1r_ref[:], a1i_ref[:]))
    o1r_ref[:] = a1r
    o1i_ref[:] = a1i


def _w40_kernel(
    par_ref, mir_ref, chunk_ref, tabs_ref, hdr1_ref, mr1_ref, mi1_ref,
    hdr2_ref, mr2_ref, mi2_ref,
    hdr1_o, mr1_o, mi1_o, hdr2_o, mr2_o, mi2_o, *, e_const: int, o_size: int,
):
    """40-bit overlap mode: the o-step decode->MAC->encode RMW loop for one sensor tile
    (IndexOutputStream.cpp:411-437). tabs stacks [bE_re | bE_im | bE1_re | bE1_im]
    columns: shape [2o, 4H] time-major; parity selects the half the window starts at
    (stepLocal = sampledStep mod 2o, :380)."""
    h = tabs_ref.shape[1] // 4
    parity = par_ref[0, 0]
    zf = jnp.zeros(hdr1_ref.shape, jnp.float32)

    def body(u, carry):
        h1, r1, i1, h2, r2, i2, _, _, _, _ = carry
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
        h2n, r2n, i2n = _encode40_block(c2r, c2i, e_const)
        # carry the post-MAC float values: the (dynamic) mirror fixup after the loop
        # needs the last step's c1/c2 BEFORE their lossy re-encoding
        return h1n, r1n, i1n, h2n, r2n, i2n, c1r, c1i, c2r, c2i

    init = (hdr1_ref[:], mr1_ref[:], mi1_ref[:], hdr2_ref[:], mr2_ref[:], mi2_ref[:],
            zf, zf, zf, zf)
    h1, r1, i1, h2, r2, i2, c1r, c1i, c2r, c2i = lax.fori_loop(0, o_size, body, init)
    # Mirror first half frame (only the first window): buf2 = encode(c2 + c1) at the
    # saving step (IndexOutputStream.cpp:429-435)
    m = mir_ref[0, 0] != 0
    hm, rm, im_ = _encode40_block(c2r + c1r, c2i + c1i, e_const)
    hdr1_o[:] = h1
    mr1_o[:] = r1
    mi1_o[:] = i1
    hdr2_o[:] = jnp.where(m, hm, h2)
    mr2_o[:] = jnp.where(m, rm, r2)
    mi2_o[:] = jnp.where(m, im_, i2)


def _w40_noov_kernel(
    par_ref, mir_ref, chunk_ref, tabs_ref, hdr1_ref, mr1_ref, mi1_ref,
    hdr1_o, mr1_o, mi1_o, *, e_const: int, o_size: int,
):
    """40-bit no-overlap mode: cc += (bE*x + bE_1*x), one accumulate of the pre-summed
    term then requantize (IndexOutputStream.cpp:417-421)."""
    h = tabs_ref.shape[1] // 4
    parity = par_ref[0, 0]

    def body(u, carry):
        h1, r1, i1 = carry
        sl = parity * o_size + u
        x = chunk_ref[u, :][None, :]
        t = tabs_ref[sl, :]
        t1r = t[0 * h : 1 * h][:, None]
        t1i = t[1 * h : 2 * h][:, None]
        t2r = t[2 * h : 3 * h][:, None]
        t2i = t[3 * h : 4 * h][:, None]
        c1r, c1i = _decode40_block(h1, r1, i1, e_const)
        c1r = c1r + (t1r * x + t2r * x)
        c1i = c1i + (t1i * x + t2i * x)
        return _encode40_block(c1r, c1i, e_const)

    init = (hdr1_ref[:], mr1_ref[:], mi1_ref[:])
    h1, r1, i1 = lax.fori_loop(0, o_size, body, init)
    hdr1_o[:] = h1
    mr1_o[:] = r1
    mi1_o[:] = i1


def _run_window_kernel(kernel, chunk, tabs, planes, dtype, interpret):
    """Shared pallas_call plumbing: tile the sensor axis, pad to the lane multiple,
    pass parity/mirror as SMEM scalars (planes[0] is parity, planes[1] mirror)."""
    (par, mir), planes = planes[:2], planes[2:]
    o, n = chunk.shape
    h = planes[0].shape[0]
    tile = min(_round_up(n, LANE), 512)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        chunk = jnp.pad(chunk, ((0, 0), (0, n_pad - n)))
        planes = tuple(jnp.pad(s, ((0, 0), (0, n_pad - n))) for s in planes)
        outs = _run_window_kernel(
            kernel, chunk, tabs, (par, mir) + planes, dtype, interpret
        )
        return tuple(o_[:, :n] for o_ in outs)
    grid = (pl.cdiv(n, tile),)
    shape = jax.ShapeDtypeStruct((h, n), dtype)
    plane = lambda: pl.BlockSpec((h, tile), lambda i: (0, i), memory_space=pltpu.VMEM)
    scal = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    n_planes = len(planes)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            scal(), scal(),
            pl.BlockSpec((o, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [plane() for _ in range(n_planes)],
        out_specs=[plane()] * n_planes,
        out_shape=[shape] * n_planes,
        interpret=interpret,
    )(par, mir, chunk, tabs, *planes)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("overlap", "interpret"))
def encode_window_float_exact(
    chunk: jax.Array,  # [o, N]
    tabs: jax.Array,  # [2o, 4H] = [bE_re | bE_im | bE1_re | bE1_im] columns
    state,  # (acc1_re, acc1_im[, acc2_re, acc2_im]) each [H, N] fp32
    parity,  # int or traced scalar: window start parity in the 2o table
    mirror,  # bool/int or traced scalar: first-frame mirror fires this window
    overlap: bool = True,
    interpret: bool | None = None,
):
    """One fused window of the reference-exact float accumulate path. Returns the
    updated accumulator planes; frame emission/zeroing stays in kwave_tpu.encoder."""
    if interpret is None:
        interpret = _interpret_default()
    o = chunk.shape[0]
    kern = functools.partial(
        _wfloat_exact_kernel if overlap else _wfloat_exact_noov_kernel, o_size=o
    )
    return _run_window_kernel(
        kern, chunk, tabs, (_scalar2d(parity), _scalar2d(mirror)) + tuple(state),
        jnp.float32, interpret,
    )


@functools.partial(jax.jit, static_argnames=("e_const", "overlap", "interpret"))
def encode_window_40b_exact(
    chunk: jax.Array,  # [o, N]
    tabs: jax.Array,  # [2o, 4H] = [bE_re | bE_im | bE1_re | bE1_im] columns
    state,  # (hdr1, mr1, mi1[, hdr2, mr2, mi2]) each [H, N] uint32
    e_const: int,
    parity,
    mirror,
    overlap: bool = True,
    interpret: bool | None = None,
):
    """One window of the reference-exact packed-accumulator path. Returns the updated
    planes; frame emission/zeroing stays in kwave_tpu.encoder's logic."""
    if interpret is None:
        interpret = _interpret_default()
    o = chunk.shape[0]
    kern = functools.partial(
        _w40_kernel if overlap else _w40_noov_kernel, e_const=e_const, o_size=o
    )
    return _run_window_kernel(
        kern, chunk, tabs, (_scalar2d(parity), _scalar2d(mirror)) + tuple(state),
        jnp.uint32, interpret,
    )


# ---------------------------------------------------------------------------
# Whole-series exact kernels: the full record in ONE pallas_call.
#
# The per-window kernels above serve the driver's streaming loop (one window per
# solver-window program). For standalone encoding of a recorded series the per-window
# dispatch dominates; here the K-window sweep runs inside the kernel grid (K minor, so
# per sensor tile the windows execute in order) with the accumulator planes carried in
# VMEM scratch, and each window's emitted frame written per the odd/even alternation of
# encoder._emit (IndexOutputStream.cpp:454-469). Fresh-state encode only (parity starts
# at 0, mirror fires in window 0) — exactly encode_series_exact's contract.
# ---------------------------------------------------------------------------


def _series40_kernel(
    chunk_ref, tabs_ref, fh_ref, fr_ref, fi_ref,
    oh1, or1, oi1, oh2, or2, oi2, *scratch, e_const: int, o_size: int, overlap: bool,
):
    k = pl.program_id(1)
    if overlap:
        sh1, sr1, si1, sh2, sr2, si2 = scratch
    else:
        sh1, sr1, si1 = scratch

    @pl.when(k == 0)
    def _():
        z = jnp.zeros(sh1.shape, _U32)
        sh1[:] = z
        sr1[:] = z
        si1[:] = z
        if overlap:
            sh2[:] = z
            sr2[:] = z
            si2[:] = z

    parity = lax.rem(k, 2)
    h = tabs_ref.shape[1] // 4
    zf = jnp.zeros(sh1.shape, jnp.float32)

    if overlap:
        def body(u, carry):
            h1, r1, i1, h2, r2, i2, _, _, _, _ = carry
            sl = parity * o_size + u
            x = chunk_ref[0, u, :][None, :]
            t = tabs_ref[sl, :]
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
            h2n, r2n, i2n = _encode40_block(c2r, c2i, e_const)
            return h1n, r1n, i1n, h2n, r2n, i2n, c1r, c1i, c2r, c2i

        init = (sh1[:], sr1[:], si1[:], sh2[:], sr2[:], si2[:], zf, zf, zf, zf)
        h1, r1, i1, h2, r2, i2, c1r, c1i, c2r, c2i = lax.fori_loop(
            0, o_size, body, init
        )
        m = k == 0
        hm, rm, im_ = _encode40_block(c2r + c1r, c2i + c1i, e_const)
        h2 = jnp.where(m, hm, h2)
        r2 = jnp.where(m, rm, r2)
        i2 = jnp.where(m, im_, i2)
        odd = lax.rem(k + 1, 2) == 0
        z = jnp.zeros_like(h1)
        fh_ref[0] = jnp.where(odd, h1, h2)
        fr_ref[0] = jnp.where(odd, r1, r2)
        fi_ref[0] = jnp.where(odd, i1, i2)
        h1p, r1p, i1p = (jnp.where(odd, z, v) for v in (h1, r1, i1))
        h2p, r2p, i2p = (jnp.where(odd, v, z) for v in (h2, r2, i2))
        sh1[:] = h1p
        sr1[:] = r1p
        si1[:] = i1p
        sh2[:] = h2p
        sr2[:] = r2p
        si2[:] = i2p
        oh1[:] = h1p
        or1[:] = r1p
        oi1[:] = i1p
        oh2[:] = h2p
        or2[:] = r2p
        oi2[:] = i2p
    else:
        def body(u, carry):
            h1, r1, i1 = carry
            sl = parity * o_size + u
            x = chunk_ref[0, u, :][None, :]
            t = tabs_ref[sl, :]
            t1r = t[0 * h : 1 * h][:, None]
            t1i = t[1 * h : 2 * h][:, None]
            t2r = t[2 * h : 3 * h][:, None]
            t2i = t[3 * h : 4 * h][:, None]
            c1r, c1i = _decode40_block(h1, r1, i1, e_const)
            c1r = c1r + (t1r * x + t2r * x)
            c1i = c1i + (t1i * x + t2i * x)
            return _encode40_block(c1r, c1i, e_const)

        h1, r1, i1 = lax.fori_loop(0, o_size, body, (sh1[:], sr1[:], si1[:]))
        fh_ref[0] = h1
        fr_ref[0] = r1
        fi_ref[0] = i1
        z = jnp.zeros_like(h1)
        sh1[:] = z
        sr1[:] = z
        si1[:] = z
        oh1[:] = z
        or1[:] = z
        oi1[:] = z
        oh2[:] = z
        or2[:] = z
        oi2[:] = z


def _seriesf_kernel(
    chunk_ref, tabs_ref, frr_ref, fri_ref, o1r, o1i, o2r, o2i, *scratch,
    o_size: int, overlap: bool,
):
    k = pl.program_id(1)
    if overlap:
        s1r, s1i, s2r, s2i = scratch
    else:
        s1r, s1i = scratch

    @pl.when(k == 0)
    def _():
        z = jnp.zeros(s1r.shape, jnp.float32)
        s1r[:] = z
        s1i[:] = z
        if overlap:
            s2r[:] = z
            s2i[:] = z

    parity = lax.rem(k, 2)
    h = tabs_ref.shape[1] // 4

    if overlap:
        def body(u, carry):
            a1r, a1i, a2r, a2i = carry
            sl = parity * o_size + u
            x = chunk_ref[0, u, :][None, :]
            t = tabs_ref[sl, :]
            a1r = a1r + t[0 * h : 1 * h][:, None] * x
            a1i = a1i + t[1 * h : 2 * h][:, None] * x
            a2r = a2r + t[2 * h : 3 * h][:, None] * x
            a2i = a2i + t[3 * h : 4 * h][:, None] * x
            return a1r, a1i, a2r, a2i

        a1r, a1i, a2r, a2i = lax.fori_loop(
            0, o_size, body, (s1r[:], s1i[:], s2r[:], s2i[:])
        )
        m = k == 0
        a2r = jnp.where(m, a2r + a1r, a2r)
        a2i = jnp.where(m, a2i + a1i, a2i)
        odd = lax.rem(k + 1, 2) == 0
        z = jnp.zeros_like(a1r)
        frr_ref[0] = jnp.where(odd, a1r, a2r)
        fri_ref[0] = jnp.where(odd, a1i, a2i)
        a1rp = jnp.where(odd, z, a1r)
        a1ip = jnp.where(odd, z, a1i)
        a2rp = jnp.where(odd, a2r, z)
        a2ip = jnp.where(odd, a2i, z)
        s1r[:] = a1rp
        s1i[:] = a1ip
        s2r[:] = a2rp
        s2i[:] = a2ip
        o1r[:] = a1rp
        o1i[:] = a1ip
        o2r[:] = a2rp
        o2i[:] = a2ip
    else:
        def body(u, carry):
            a1r, a1i = carry
            sl = parity * o_size + u
            x = chunk_ref[0, u, :][None, :]
            t = tabs_ref[sl, :]
            a1r = a1r + t[0 * h : 1 * h][:, None] * x
            a1i = a1i + t[1 * h : 2 * h][:, None] * x
            a1r = a1r + t[2 * h : 3 * h][:, None] * x
            a1i = a1i + t[3 * h : 4 * h][:, None] * x
            return a1r, a1i

        a1r, a1i = lax.fori_loop(0, o_size, body, (s1r[:], s1i[:]))
        frr_ref[0] = a1r
        fri_ref[0] = a1i
        z = jnp.zeros_like(a1r)
        s1r[:] = z
        s1i[:] = z
        o1r[:] = z
        o1i[:] = z
        o2r[:] = z
        o2i[:] = z


def _series_call(kernel, series, tabs, o_size, n_frames, n_out_frames, n_state,
                 n_scratch, dtype, interpret):
    t_used = n_frames * o_size
    _, n = series.shape
    h = tabs.shape[1] // 4
    tile = min(_round_up(n, LANE), 512)
    n_pad = _round_up(n, tile)
    if n_pad != n:
        series = jnp.pad(series, ((0, 0), (0, n_pad - n)))
        outs = _series_call(kernel, series, tabs, o_size, n_frames, n_out_frames,
                            n_state, n_scratch, dtype, interpret)
        return tuple(o_[..., :n] for o_ in outs)
    grid = (pl.cdiv(n, tile), n_frames)
    frame_spec = pl.BlockSpec((1, h, tile), lambda i, k: (k, 0, i),
                              memory_space=pltpu.VMEM)
    state_spec = pl.BlockSpec((h, tile), lambda i, k: (0, i), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # explicit window axis: Mosaic requires block sublane dims divisible by 8
            # OR equal to the array dim — o generally is neither on a flat layout
            pl.BlockSpec((1, o_size, tile), lambda i, k: (k, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tabs.shape, lambda i, k: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[frame_spec] * n_out_frames + [state_spec] * n_state,
        out_shape=(
            [jax.ShapeDtypeStruct((n_frames, h, n), dtype)] * n_out_frames
            + [jax.ShapeDtypeStruct((h, n), dtype)] * n_state
        ),
        scratch_shapes=[pltpu.VMEM((h, tile), dtype)] * n_scratch,
        interpret=interpret,
    )(series[:t_used].reshape(n_frames, o_size, n), tabs)
    return tuple(outs)


@functools.partial(jax.jit, static_argnames=("e_const", "o_size", "overlap",
                                              "interpret"))
def encode_series_40b(series, tabs, e_const: int, o_size: int, overlap: bool = True,
                      interpret: bool | None = None):
    """Fresh-state whole-series 40-bit exact encode. Returns
    ((hdr, mr, mi) frames each [K, H, N], final state planes (hdr1, mr1, mi1, hdr2,
    mr2, mi2) each [H, N] — post-emission, for trailing-step continuation)."""
    if interpret is None:
        interpret = _interpret_default()
    n_frames = series.shape[0] // o_size
    kern = functools.partial(_series40_kernel, e_const=e_const, o_size=o_size,
                             overlap=overlap)
    outs = _series_call(kern, series, tabs, o_size, n_frames, 3, 6,
                        6 if overlap else 3, jnp.uint32, interpret)
    return outs[:3], outs[3:]


@functools.partial(jax.jit, static_argnames=("o_size", "overlap", "interpret"))
def encode_series_float_exact(series, tabs, o_size: int, overlap: bool = True,
                              interpret: bool | None = None):
    """Fresh-state whole-series float exact encode. Returns ((re, im) frames
    [K, H, N], final state planes (a1r, a1i, a2r, a2i) each [H, N])."""
    if interpret is None:
        interpret = _interpret_default()
    n_frames = series.shape[0] // o_size
    kern = functools.partial(_seriesf_kernel, o_size=o_size, overlap=overlap)
    outs = _series_call(kern, series, tabs, o_size, n_frames, 2, 4,
                        4 if overlap else 2, jnp.float32, interpret)
    return outs[:2], outs[2:]
