"""Fused z-stage spectral multiply: z-DFT -> pointwise operator -> z-IDFT in ONE
Pallas kernel.

Why: at 512^3 the solver step loses XLA's cross-stage fusion entirely — the step
time equals the sum of its isolated transform stages, so every stage is a full
materializing HBM pass over the ~1 GB spectrum (BASELINE.md 512^3 root-cause,
tools/bench_mxfft_stage.py). With the dense-base mxfft the z stage of a spectral
multiply pipeline is (z-DFT matmul) -> (pointwise op) -> (z-IDFT matmul): three
logical stages this kernel runs per VMEM block, reading the y-staged spectrum
ONCE and writing each output ONCE. The sandwiched pointwise operator is built
IN-KERNEL from tiny per-axis vectors (the compact-operator formulas,
kwave_tpu/solver/step.py `_kappa`/`_absorb_nablas`), so no full-size operator
array is ever read:

- "grad" ops: kappa(|k|) * dd_axis  (the computePressureGradient /
  computeVelocityGradient spectral factors, SolverCudaKernels.cu:1139-1343);
- "nabla" ops: |k|^(alpha_power-2) / ^(alpha_power-1) with the k=0 pole zeroed
  (the absorbing-term factors, generateKappaAndNablas,
  KSpaceFirstOrderSolver.cpp:2568-2576).

Several ops may share one forward z-DFT (the velocity update's one-fwd /
three-inverse shape). Complex math runs on separate fp32 re/im planes; the
dense matmuls use the 3-pass bf16 split (fastpath._dot_split3 — Mosaic has no
Precision.HIGH), matching the solver's "high" mxfft mode.

Layout contract: spectra are [nz, ny, nxr] with z canonical-order bins (the
dense base emits NO permutation on the contracted axis; callers must be in
dense-base mode for z — driver._auto_direct_base guarantees it at >=256).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from kwave_tpu.ops.fastpath import _compiler_params, _interpret_default

LANE = 128
BY = 8  # y rows per block (fp32 sublane tile)


def _presplit(m: np.ndarray):
    """fp32 matrix -> (hi, lo) bf16 parts for the 3-pass split contraction,
    precomputed at plan time so the kernel never casts the (block-constant)
    DFT matrices per grid step."""
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def _dot_pre(m_hi, m_lo, x_hi, x_lo):
    """3-pass split matmul with PRE-SPLIT operands (matrix parts from the plan,
    block parts cast once per block): m @ x ~ hi*hi + hi*lo + lo*hi."""
    dims = (((1,), (0,)), ((), ()))

    def d(a, b):
        return lax.dot_general(a, b, dims, preferred_element_type=jnp.float32,
                               precision=lax.Precision.DEFAULT)

    return d(m_hi, x_hi) + d(m_hi, x_lo) + d(m_lo, x_hi)


def _split_block(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _cmatmul_pre(mats, x_re, x_im):
    """Complex matmul with pre-split matrix parts mats=(re_hi, re_lo, im_hi, im_lo)."""
    re_hi, re_lo, im_hi, im_lo = mats
    xr_hi, xr_lo = _split_block(x_re)
    xi_hi, xi_lo = _split_block(x_im)
    rr = _dot_pre(re_hi, re_lo, xr_hi, xr_lo)
    ii = _dot_pre(im_hi, im_lo, xi_hi, xi_lo)
    ri = _dot_pre(re_hi, re_lo, xi_hi, xi_lo)
    ir = _dot_pre(im_hi, im_lo, xr_hi, xr_lo)
    return rr - ii, ri + ir


@dataclasses.dataclass(frozen=True)
class OpSpec:
    """One pointwise spectral operator (hashable; part of the kernel's static key).

    kind="grad": kappa * dd[axis]; the complex dd vector is passed via the
    matching `dd_*` argument of `apply`. kind="nabla": |k|^power, k=0 -> 0.
    """

    kind: str  # "grad" | "nabla"
    axis: int = 0  # grad: 0=z, 1=y, 2=x (index into [nz, ny, nxr])
    power: float = 0.0  # nabla exponent


def _dftmats(n: int):
    """Dense z DFT/IDFT matrices [n, n] as fp32 (re, im) pairs (trace-time consts)."""
    k = np.arange(n)
    f = np.exp(-2j * np.pi * np.outer(k, k) / n)
    fi = np.conj(f) / n
    return (f.real.astype(np.float32), f.imag.astype(np.float32),
            fi.real.astype(np.float32), fi.imag.astype(np.float32))


def _kernel(sre_ref, sim_ref, fre_hi_ref, fre_lo_ref, fim_hi_ref, fim_lo_ref,
            ire_hi_ref, ire_lo_ref, iim_hi_ref, iim_lo_ref,
            k2z_ref, k2y_ref, k2x_ref, *rest, ops: tuple[OpSpec, ...],
            c_ref_dt_2: float, use_kappa: bool):
    n_dd = sum(1 for o in ops if o.kind == "grad")
    dd_refs = rest[: 2 * n_dd]
    out_refs = rest[2 * n_dd:]
    nz, by, bx = sre_ref.shape
    cols = by * bx

    s_re = sre_ref[...].reshape(nz, cols)
    s_im = sim_ref[...].reshape(nz, cols)
    # z-forward: F = DFT_z @ S (pre-split bf16 matrix parts from the plan)
    fwd_mats = (fre_hi_ref[...], fre_lo_ref[...], fim_hi_ref[...], fim_lo_ref[...])
    inv_mats = (ire_hi_ref[...], ire_lo_ref[...], iim_hi_ref[...], iim_lo_ref[...])
    f_re, f_im = _cmatmul_pre(fwd_mats, s_re, s_im)

    # |k|^2 over the block: k2z per row + (k2y + k2x) per column
    k2z_col = k2z_ref[:, 0:1]  # [nz, 1]
    k2yx = (k2y_ref[:, 0:1] + k2x_ref[0:1, :]).reshape(1, cols)  # [1, cols]
    k2 = k2z_col + k2yx  # [nz, cols]
    if use_kappa:
        arg = jnp.float32(c_ref_dt_2) * jnp.sqrt(k2)
        kappa = jnp.where(arg == 0.0, 1.0,
                          jnp.sin(arg) / jnp.where(arg == 0.0, 1.0, arg))

    dd_i = 0
    for o, (out_re_ref, out_im_ref) in zip(
        ops, zip(out_refs[0::2], out_refs[1::2])
    ):
        if o.kind == "grad":
            dre_ref, dim_ref = dd_refs[2 * dd_i], dd_refs[2 * dd_i + 1]
            dd_i += 1
            if o.axis == 0:  # z vector: [nz, 128] tiled -> column
                d_re, d_im = dre_ref[:, 0:1], dim_ref[:, 0:1]  # [nz, 1]
            elif o.axis == 1:  # y vector: block rows [by, 128] -> [1, cols]
                d_re = jnp.broadcast_to(dre_ref[:, 0:1], (by, bx)).reshape(1, cols)
                d_im = jnp.broadcast_to(dim_ref[:, 0:1], (by, bx)).reshape(1, cols)
            else:  # x vector: [8, bx] tile -> row, tiled over y
                d_re = jnp.broadcast_to(dre_ref[0:1, :], (by, bx)).reshape(1, cols)
                d_im = jnp.broadcast_to(dim_ref[0:1, :], (by, bx)).reshape(1, cols)
            o_re = d_re * kappa if use_kappa else d_re
            o_im = d_im * kappa if use_kappa else d_im
        else:  # nabla: |k|^power with the k=0 pole zeroed
            kmag = jnp.sqrt(k2)
            safe = jnp.where(kmag == 0.0, 1.0, kmag)
            o_re = jnp.where(kmag == 0.0, 0.0,
                             jnp.exp(jnp.float32(o.power) * jnp.log(safe)))
            o_im = None
        if o_im is None:
            g_re, g_im = f_re * o_re, f_im * o_re
        else:
            g_re = f_re * o_re - f_im * o_im
            g_im = f_re * o_im + f_im * o_re
        # z-inverse: out = IDFT_z @ G
        r_re, r_im = _cmatmul_pre(inv_mats, g_re, g_im)
        out_re_ref[...] = r_re.reshape(nz, by, bx)
        out_im_ref[...] = r_im.reshape(nz, by, bx)


def _tile128(vec) -> jax.Array:
    """[n] -> [n, 128] tiled fp32 (a VMEM-friendly column vector). jnp ops so
    traced (device-staged) vectors work — the driver passes operator vectors as
    jit arguments, never as baked constants."""
    v = jnp.asarray(vec, jnp.float32)
    return jnp.broadcast_to(v[:, None], (v.shape[0], LANE))


def _tile8(vec) -> jax.Array:
    """[n] -> [8, n] tiled fp32 (a VMEM-friendly row vector)."""
    v = jnp.asarray(vec, jnp.float32)
    return jnp.broadcast_to(v[None, :], (8, v.shape[0]))


@dataclasses.dataclass(frozen=True)
class ZFusePlan:
    """Trace-time constants for one spectrum shape (built once per run)."""

    nz: int
    ny: int
    nxr: int
    c_ref_dt_2: float
    mats: tuple  # 8 arrays: fwd re/im + inv re/im, each (hi, lo) bf16
    k2z: jax.Array  # [nz, 128]
    k2y: jax.Array  # [ny, 128]
    k2x: jax.Array  # [8, nxr]


def make_plan(shape: tuple[int, int, int], k2z: np.ndarray, k2y: np.ndarray,
              k2x: np.ndarray, c_ref_dt_2: float) -> ZFusePlan:
    """shape is the REAL grid [nz, ny, nx]; k2* are the per-axis wavenumber^2
    vectors (k2x reduced to nx//2+1)."""
    nz, ny, nx = shape
    f_re, f_im, i_re, i_im = _dftmats(nz)
    mats = []
    for m in (f_re, f_im, i_re, i_im):
        hi, lo = _presplit(m)
        mats += [jnp.asarray(hi), jnp.asarray(lo)]
    return ZFusePlan(
        nz=nz, ny=ny, nxr=nx // 2 + 1, c_ref_dt_2=float(c_ref_dt_2),
        mats=tuple(mats), k2z=_tile128(k2z), k2y=_tile128(k2y), k2x=_tile8(k2x),
    )


def _dd_tables(op: OpSpec, dd_packed) -> tuple[jax.Array, jax.Array]:
    dd = jnp.asarray(dd_packed, jnp.float32)
    if op.axis in (0, 1):
        return _tile128(dd[:, 0]), _tile128(dd[:, 1])
    return _tile8(dd[:, 0]), _tile8(dd[:, 1])


def apply(plan: ZFusePlan, s_re: jax.Array, s_im: jax.Array,
          ops: tuple[OpSpec, ...], dds: tuple = (),
          use_kappa: bool = True, interpret: Optional[bool] = None):
    """Run the fused z stage: returns [(out_re, out_im), ...] one per op.

    s_re/s_im: the y-staged spectrum [nz, ny, nxr] (z canonical order).
    dds: packed [n, 2] (re, im) dd vectors, one per "grad" op, in op order.
    """
    if interpret is None:
        interpret = _interpret_default()
    nz, ny, nxr = s_re.shape
    # block sizing: bigger blocks feed the MXU longer contractions and amortize
    # per-grid-step overhead; multi-output calls shrink to fit the VMEM budget
    if len(ops) <= 1:
        by, bx = min(BY, ny), min(2 * LANE, _round_up_lane(nxr))
    else:
        by, bx = min(BY, ny), LANE
    grid = (pl.cdiv(ny, by), pl.cdiv(nxr, bx))

    dd_args = []
    dd_specs = []
    dd_i = 0
    for o in ops:
        if o.kind != "grad":
            continue
        t_re, t_im = _dd_tables(o, dds[dd_i])
        dd_i += 1
        dd_args += [t_re, t_im]
        if o.axis == 0:
            spec = pl.BlockSpec((nz, LANE), lambda j, i: (0, 0),
                                memory_space=pltpu.VMEM)
        elif o.axis == 1:
            spec = pl.BlockSpec((by, LANE), lambda j, i: (j, 0),
                                memory_space=pltpu.VMEM)
        else:
            spec = pl.BlockSpec((8, bx), lambda j, i: (0, i),
                                memory_space=pltpu.VMEM)
        dd_specs += [spec, spec]

    io_spec = pl.BlockSpec((nz, by, bx), lambda j, i: (0, j, i),
                           memory_space=pltpu.VMEM)
    mat_spec = pl.BlockSpec((nz, nz), lambda j, i: (0, 0),
                            memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        functools.partial(_kernel, ops=tuple(ops),
                          c_ref_dt_2=plan.c_ref_dt_2, use_kappa=use_kappa),
        grid=grid,
        in_specs=[
            io_spec, io_spec,  # spectrum re/im
            *([mat_spec] * 8),  # DFT / IDFT pre-split parts
            pl.BlockSpec((nz, LANE), lambda j, i: (0, 0),
                         memory_space=pltpu.VMEM),  # k2z
            pl.BlockSpec((by, LANE), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),  # k2y
            pl.BlockSpec((8, bx), lambda j, i: (0, i),
                         memory_space=pltpu.VMEM),  # k2x
            *dd_specs,
        ],
        out_specs=[io_spec] * (2 * len(ops)),
        out_shape=[jax.ShapeDtypeStruct((nz, ny, nxr), jnp.float32)] * (2 * len(ops)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(s_re, s_im, *plan.mats, plan.k2z, plan.k2y, plan.k2x, *dd_args)
    return [(outs[2 * k], outs[2 * k + 1]) for k in range(len(ops))]


def _round_up_lane(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def make_pipeline(shape: tuple[int, int, int], k2z, k2y, k2x,
                  c_ref_dt_2: float, precision=lax.Precision.HIGH):
    """Build FftOps.spectral_multi for a 3D grid: the COMPLETE spectral-multiply
    pipeline `irfftn(op_k * [kappa *] rfftn(field))` per op, with the x and y
    stages as dense mxfft matmuls (canonical bin order — dense bases emit no
    permutation) and the z stage + pointwise operators fused into one Pallas
    kernel. All 14 transforms of the absorbing timestep route through this.

    k2z/k2y/k2x: per-axis wavenumber^2 vectors (CONCRETE, host-side — they
    become trace-time constants of the kernel plan). The dd vectors arrive per
    call and may be traced jit arguments.
    """
    from kwave_tpu.ops import mxfft

    nz, ny, nx = (int(n) for n in shape)
    plan = make_plan((nz, ny, nx), np.asarray(k2z), np.asarray(k2y),
                     np.asarray(k2x), c_ref_dt_2)

    def spectral_multi(field, specs, dds, use_kappa=True):
        re, im = mxfft._rfft_last(field, nx, precision)
        # dense y base -> canonical y bin order, matching the plan's k2y
        re, im = mxfft._c2c_axis(re, im, 1, ny, False, precision, base=ny)
        outs = apply(plan, re, im, tuple(specs), tuple(dds), use_kappa=use_kappa)
        results = []
        for o_re, o_im in outs:
            r, i2 = mxfft._c2c_axis(o_re, o_im, 1, ny, True, precision, base=ny)
            results.append(mxfft._irfft_last(r, i2, nx, precision))
        return results

    return spectral_multi
