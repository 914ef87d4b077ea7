"""MXU-native FFT: Cooley-Tukey radix-2 butterflies + 128-point base-DFT matmuls.

Why this exists: XLA's TPU FFT lowers to full-DFT matmuls in fp32 — O(N) flops per
cell per axis — measured at ~25 GB/s effective for a 256^3 rfftn+irfftn round trip
(tools/bench_fft.py), which makes the k-space solver step ~93% FFT time at 256^3
and explains the per-cell throughput regressing 2x every grid doubling. This module
replaces the per-axis transform with:

  1. log2(N/128) levels of radix-2 DIF butterflies — pure elementwise adds and one
     twiddle complex-multiply per level, fused by XLA into the surrounding ops;
  2. ONE base-DFT matmul of size <=128 — contraction K=128 is exactly the MXU's
     native tile, so the matmul runs at full systolic-array efficiency;
  3. NO output reordering: the spectral axis is left in the recursive class-major
     ("DIF") bin order.  Spectral operators (kappa, ddy/ddz, nablas, source_kappa)
     are permuted ONCE at build time (`permute_operators`) to match, so consistency
     costs zero runtime — real-space arrays are always in canonical order.

Per-axis flop count drops from 8*points*N (XLA full DFT) to 8*points*128 + O(points)
butterflies, and matmul precision is selectable (default HIGHEST = full fp32
emulation; HIGH = 3-pass bf16, ~1e-6 relative, is ~2x faster where the MXU is the
bound).

The x (minor) axis r2c/c2r legs are real matmuls with the [N, N//2+1] DFT matrix —
real-input structure makes them 4x cheaper than a c2c axis, and the reduced axis
stays in canonical bin order (compatible with the reference's reduced-dimension
operator layout, Parameters::getReducedDimensionSizes).

This is the TPU-native equivalent of the reference's cuFFT plan cache
(MatrixClasses/CufftComplexMatrix.cpp:172-271): plans become trace-time numpy
constants (DFT matrices <=128x128, twiddle vectors), cached per axis length.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


BASE = 128  # base-DFT size: the MXU contraction tile


def _split_levels(n: int, base: int = BASE) -> tuple[int, int]:
    """(levels, base_size): halve n while it stays even and above `base`."""
    levels = 0
    while n > base and n % 2 == 0:
        n //= 2
        levels += 1
    return levels, n


def perm(n: int, base: int = BASE) -> np.ndarray:
    """Spectral bin order of the radix-2 DIF pipeline: position j holds bin perm[j].

    perm(n) = [2*perm(n/2), 2*perm(n/2)+1] (even classes first), identity at the base.
    """
    levels, _ = _split_levels(n, base)
    if levels == 0:
        return np.arange(n)
    p = perm(n // 2, base)
    return np.concatenate([2 * p, 2 * p + 1])


@functools.lru_cache(maxsize=None)
def _plan_c2c(n: int, base: int = BASE):
    """Trace-time constants for one c2c axis: twiddles per level + base DFT matrices."""
    levels, m = _split_levels(n, base)
    tw = []
    size = n
    for _ in range(levels):
        h = size // 2
        w = np.exp(-2j * np.pi * np.arange(h) / size)
        tw.append((w.real.astype(np.float32), w.imag.astype(np.float32)))
        size = h
    k = np.arange(m)
    f = np.exp(-2j * np.pi * np.outer(k, k) / m)
    fwd = (f.real.astype(np.float32), f.imag.astype(np.float32))
    fi = np.conj(f) / n  # inverse base folds the FULL 1/n (butterfly halves included)
    inv = (fi.real.astype(np.float32), fi.imag.astype(np.float32))
    return levels, m, tw, fwd, inv


@functools.lru_cache(maxsize=None)
def _plan_r2c(n: int):
    """Real-input DFT matrices for the reduced x axis: [n, R] fwd, [R, n] inv."""
    r = n // 2 + 1
    j = np.arange(n)
    k = np.arange(r)
    ang = 2.0 * np.pi * np.outer(j, k) / n
    f_re = np.cos(ang).astype(np.float32)  # [n, R]
    f_im = (-np.sin(ang)).astype(np.float32)
    # inverse: x[j] = sum_k s_k*(re_k*cos - im_k*sin)(2pi k j / n) / n,
    # s_k = 2 except DC and (even-n) Nyquist
    s = np.full(r, 2.0)
    s[0] = 1.0
    if n % 2 == 0:
        s[-1] = 1.0
    ang_i = 2.0 * np.pi * np.outer(k, j) / n
    c_re = (s[:, None] * np.cos(ang_i) / n).astype(np.float32)  # [R, n]
    c_im = (-s[:, None] * np.sin(ang_i) / n).astype(np.float32)
    return f_re, f_im, c_re, c_im


def _axis_einsum(ndim: int, axis: int) -> str:
    """Contraction over `axis` with the result staying in place: 'aXc,XY->aYc'."""
    letters = "abcdef"[:ndim]
    lhs = letters[:axis] + "X" + letters[axis + 1 :]
    out = letters[:axis] + "Y" + letters[axis + 1 :]
    return f"{lhs},XY->{out}"


def _cmatmul(re, im, mats, axis: int, precision):
    """(re + i*im) @ (m_re + i*m_im) along `axis` as four real einsums.

    (Measured on chip: a single einsum on a (re,im)-interleaved [2m, 2m] matrix is
    flop-neutral but ~40% SLOWER end-to-end — the stride-2 interleave relayout costs
    more than the saved operand reads. The four-einsum form keeps operands in their
    natural layout and XLA fuses the combines.)"""
    m_re, m_im = (jnp.asarray(mats[0]), jnp.asarray(mats[1]))
    sub = _axis_einsum(re.ndim, axis)
    kw = dict(precision=precision, preferred_element_type=jnp.float32)
    o_re = jnp.einsum(sub, re, m_re, **kw) - jnp.einsum(sub, im, m_im, **kw)
    o_im = jnp.einsum(sub, re, m_im, **kw) + jnp.einsum(sub, im, m_re, **kw)
    return o_re, o_im


def _bshape(ndim: int, axis: int, h: int) -> tuple[int, ...]:
    s = [1] * ndim
    s[axis] = h
    return tuple(s)


def _c2c_axis(re, im, axis: int, n: int, inverse: bool, precision,
              base: int = BASE):
    """c2c DFT along `axis` (length n). Forward emits the permuted bin order;
    inverse consumes it. Operates on separate fp32 re/im planes (no complex64)."""
    levels, m, tw, fwd_mat, inv_mat = _plan_c2c(n, base)
    shape = re.shape
    ndim = re.ndim
    # blocked view: [..., K, size, ...] with the block axis inserted at `axis`
    kblk = 1

    def blocked(x, size):
        return x.reshape(shape[:axis] + (kblk, size) + shape[axis + 1 :])

    if not inverse:
        size = n
        for lv in range(levels):
            h = size // 2
            rb, ib = blocked(re, size), blocked(im, size)
            x0r = lax.slice_in_dim(rb, 0, h, axis=axis + 1)
            x1r = lax.slice_in_dim(rb, h, size, axis=axis + 1)
            x0i = lax.slice_in_dim(ib, 0, h, axis=axis + 1)
            x1i = lax.slice_in_dim(ib, h, size, axis=axis + 1)
            ar, ai = x0r + x1r, x0i + x1i
            dr, di = x0r - x1r, x0i - x1i
            wr = jnp.asarray(tw[lv][0]).reshape(_bshape(ndim + 1, axis + 1, h))
            wi = jnp.asarray(tw[lv][1]).reshape(_bshape(ndim + 1, axis + 1, h))
            br, bi = dr * wr - di * wi, dr * wi + di * wr
            re = jnp.stack([ar, br], axis=axis + 1).reshape(
                shape[:axis] + (2 * kblk, h) + shape[axis + 1 :]
            )
            im = jnp.stack([ai, bi], axis=axis + 1).reshape(
                shape[:axis] + (2 * kblk, h) + shape[axis + 1 :]
            )
            re = re.reshape(shape)
            im = im.reshape(shape)
            kblk *= 2
            size = h
        rb, ib = blocked(re, m), blocked(im, m)
        o_re, o_im = _cmatmul(rb, ib, fwd_mat, axis + 1, precision)
        return o_re.reshape(shape), o_im.reshape(shape)

    # inverse: base inverse matmul on the finest blocks, then merge levels in reverse
    kblk = 2**levels
    rb, ib = blocked(re, m), blocked(im, m)
    re, im = _cmatmul(rb, ib, inv_mat, axis + 1, precision)
    re, im = re.reshape(shape), im.reshape(shape)
    size = m
    for lv in reversed(range(levels)):
        h = size
        kblk //= 2
        # [..., K, 2, h, ...]
        pair_shape = shape[:axis] + (kblk, 2, h) + shape[axis + 1 :]
        rb, ib = re.reshape(pair_shape), im.reshape(pair_shape)
        a_r = lax.index_in_dim(rb, 0, axis=axis + 1, keepdims=False)
        b_r = lax.index_in_dim(rb, 1, axis=axis + 1, keepdims=False)
        a_i = lax.index_in_dim(ib, 0, axis=axis + 1, keepdims=False)
        b_i = lax.index_in_dim(ib, 1, axis=axis + 1, keepdims=False)
        wr = jnp.asarray(tw[lv][0]).reshape(_bshape(ndim + 1, axis + 1, h))
        wi = jnp.asarray(tw[lv][1]).reshape(_bshape(ndim + 1, axis + 1, h))
        # b * conj(w)
        cr, ci = b_r * wr + b_i * wi, b_i * wr - b_r * wi
        x0r, x1r = a_r + cr, a_r - cr
        x0i, x1i = a_i + ci, a_i - ci
        re = jnp.concatenate([x0r, x1r], axis=axis + 1).reshape(shape)
        im = jnp.concatenate([x0i, x1i], axis=axis + 1).reshape(shape)
        size *= 2
    return re, im


def _rfft_last(x, n: int, precision):
    f_re, f_im, _, _ = _plan_r2c(n)
    kw = dict(precision=precision, preferred_element_type=jnp.float32)
    return (
        jnp.einsum("...x,xr->...r", x, jnp.asarray(f_re), **kw),
        jnp.einsum("...x,xr->...r", x, jnp.asarray(f_im), **kw),
    )


def _irfft_last(re, im, n: int, precision):
    _, _, c_re, c_im = _plan_r2c(n)
    kw = dict(precision=precision, preferred_element_type=jnp.float32)
    return jnp.einsum("...r,rx->...x", re, jnp.asarray(c_re), **kw) + jnp.einsum(
        "...r,rx->...x", im, jnp.asarray(c_im), **kw
    )


def supported(shape: tuple[int, ...]) -> bool:
    """True when every non-minor axis is a power-of-two multiple of <=128 blocks
    (i.e. splits down to an MXU-friendly base) and the shape is 2D/3D."""
    if len(shape) not in (2, 3):
        return False
    return all(_split_levels(int(n))[1] <= BASE for n in shape[:-1])


def make_fft_ops(shape: tuple[int, ...],
                 precision=lax.Precision.HIGHEST,
                 direct_base: Optional[int] = None):
    """Build (FftOps-compatible rfftn/irfftn, perms) for a real-space grid `shape`.

    The returned transforms produce/consume complex64 spectra shaped like
    jnp.fft.rfftn's, but with each NON-minor axis in `perm(n)` bin order; `perms`
    maps axis index -> the bin-order vector (canonical minor axis excluded).
    Feed `perms` to `permute_operators` so spectral operators line up.

    Both transforms are BATCH-TRANSPARENT: an input with extra leading axes is
    treated as a stack of grids, and all the base-DFT einsums run at the full
    stacked batch (the step() batching of the 3 velocity-gradient transforms
    rides this).

    ``direct_base`` raises the base-DFT size (e.g. 256): axes up to that length
    skip the radix-2 butterfly levels entirely and run ONE full-DFT matmul —
    2x the contraction flops per skipped level, but one fewer full read+write
    pass over the spectrum per level, for bandwidth-bound grids.
    """
    ndim = len(shape)
    nx = shape[-1]
    base = direct_base or BASE
    other_axes = list(range(ndim - 1))
    perms = {ax: perm(int(shape[ax]), base) for ax in other_axes}

    def rfftn(x):
        off = x.ndim - ndim
        re, im = _rfft_last(x, nx, precision)
        for ax in other_axes:
            re, im = _c2c_axis(re, im, ax + off, int(shape[ax]), False, precision,
                               base)
        return lax.complex(re, im)

    def irfftn(xk, s):
        off = xk.ndim - ndim
        re, im = jnp.real(xk), jnp.imag(xk)
        for ax in other_axes:
            re, im = _c2c_axis(re, im, ax + off, int(shape[ax]), True, precision,
                               base)
        return _irfft_last(re, im, nx, precision)

    return rfftn, irfftn, perms


def make_shift_matrix(n: int, shift_packed: np.ndarray) -> np.ndarray:
    """Real [n, n] circulant applying irfft(shift * rfft(x)) along one axis as ONE
    matmul (the half-cell staggered->regular shift of computeShiftedVelocity,
    KSpaceFirstOrderSolver.cpp:2714-2735 — there: 3 batched 1D FFT pairs per sample
    step). shift_packed is the [R, 2] (re, im) plane pair from operators.make_shift_neg.
    """
    f_re, f_im, c_re, c_im = _plan_r2c(n)
    s_re = shift_packed[..., 0].astype(np.float64)
    s_im = shift_packed[..., 1].astype(np.float64)
    fr, fi = f_re.astype(np.float64), f_im.astype(np.float64)
    cr, ci = c_re.astype(np.float64), c_im.astype(np.float64)
    xr = fr * s_re[None, :] - fi * s_im[None, :]  # [n, R] spectrum rows per input j
    xi = fr * s_im[None, :] + fi * s_re[None, :]
    return (xr @ cr + xi @ ci).astype(np.float32)


def make_shift_ops(ops, shape: tuple[int, ...], precision=lax.Precision.HIGHEST):
    """Per-axis half-cell shift callable (u, axis) -> shifted, built from the
    operator set's shift_*_neg vectors; None when the run needs no shifted velocity.

    `shape` is the real-space grid shape: the true axis length cannot be inferred
    from the packed [R, 2] vector ((R-1)*2 is wrong for odd axes, where R = (n+1)//2)."""
    if ops.shift_x_neg is None:
        return None
    ndim = len(shape)

    def mat_for(vec, n):
        return make_shift_matrix(int(n), np.asarray(vec))

    mats = {
        ndim - 1: mat_for(ops.shift_x_neg, shape[-1]),
        ndim - 2: mat_for(ops.shift_y_neg, shape[-2]),
    }
    if ndim == 3 and ops.shift_z_neg is not None:
        mats[0] = mat_for(ops.shift_z_neg, shape[0])
    consts = {ax: jnp.asarray(m) for ax, m in mats.items()}

    def shift_axis(u, axis: int):
        return jnp.einsum(_axis_einsum(u.ndim, axis), u, consts[axis],
                          precision=precision, preferred_element_type=jnp.float32)

    return shift_axis


def permute_operators(ops, ndim: int, perms: dict[int, np.ndarray]):
    """Reorder every SPECTRAL operator leaf to the mxfft bin order (host-side, once).

    Spectral leaves: kappa/source_kappa/absorb_nabla1/absorb_nabla2 (full reduced
    spectra [.., ny, nxR]), ddy/ddz packed vectors, and the compact-mode k2_y/k2_z
    vectors. Real-space leaves (PML, media, stretch maps) and the canonical-order
    x-axis leaves (ddx, k2_x) are untouched. shift_*_neg stay canonical: they are
    consumed by per-axis jnp.fft transforms in shifted_velocity, not by the 3D path.
    """
    import dataclasses as _dc

    d = {f.name: getattr(ops, f.name) for f in _dc.fields(ops)}

    def grid3(a):
        if a is None or np.ndim(a) != ndim:
            return a
        a = np.asarray(a)
        if ndim == 2:
            return a[perms[0]]
        return a[perms[0]][:, perms[1]]

    def vec(a, ax):
        if a is None:
            return a
        return np.asarray(a)[perms[ax]]

    for name in ("kappa", "source_kappa", "absorb_nabla1", "absorb_nabla2"):
        d[name] = grid3(d[name])
    y_ax = ndim - 2
    for name in ("ddy_pos", "ddy_neg", "k2_y"):
        d[name] = vec(d[name], y_ax)
    if ndim == 3:
        for name in ("ddz_pos", "ddz_neg", "k2_z"):
            d[name] = vec(d[name], 0)
    return type(ops)(**d)
