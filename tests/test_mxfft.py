"""MXU matmul-FFT (kwave_tpu.ops.mxfft) numerics + solver-step/driver integration.

The transform intentionally emits a PERMUTED spectral bin order (radix-2 DIF
class-major, mxfft.perm); every comparison against jnp.fft applies that
permutation explicitly, and operator-consistency tests go through
mxfft.permute_operators the way the driver does.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kwave_tpu.ops import mxfft
from kwave_tpu.solver import (
    Grid,
    Medium,
    SolverConfig,
    Sources,
    init_state,
    make_operators,
    simulate,
)
from kwave_tpu.solver.step import FftOps, LOCAL_FFT


def _ref_permuted(ref: np.ndarray, shape) -> np.ndarray:
    """jnp.fft.rfftn output reordered to mxfft's bin order (minor axis canonical)."""
    idx = [mxfft.perm(int(n)) for n in shape[:-1]] + [np.arange(ref.shape[-1])]
    return ref[np.ix_(*idx)]


@pytest.mark.parametrize("shape", [(256, 4, 16), (8, 256, 32), (4, 4, 512), (256, 32)])
def test_rfftn_matches_jnp_up_to_perm(shape):
    rng = np.random.default_rng(3)
    x = rng.standard_normal(shape).astype(np.float32)
    fwd, inv, perms = mxfft.make_fft_ops(shape)
    mine = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    ref = np.fft.rfftn(x).astype(np.complex64)
    ref_p = _ref_permuted(ref, shape)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(mine.real, ref_p.real, atol=2e-5 * scale)
    np.testing.assert_allclose(mine.imag, ref_p.imag, atol=2e-5 * scale)
    # perm really is a permutation of every non-minor axis
    for ax, p in perms.items():
        assert sorted(p.tolist()) == list(range(shape[ax]))


@pytest.mark.parametrize("shape", [(256, 4, 16), (8, 128, 30), (256, 32)])
def test_roundtrip(shape):
    rng = np.random.default_rng(5)
    x = rng.standard_normal(shape).astype(np.float32)
    fwd, inv, _ = mxfft.make_fft_ops(shape)
    y = np.asarray(jax.jit(lambda v: inv(fwd(v), shape))(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, atol=3e-5 * np.abs(x).max())


def test_spectral_multiply_equivalence():
    """irfftn(op * rfftn(x)) is permutation-invariant when the operator is permuted
    the same way — the driver's actual usage pattern."""
    shape = (256, 8, 16)
    rng = np.random.default_rng(11)
    x = rng.standard_normal(shape).astype(np.float32)
    op = rng.standard_normal((shape[0], shape[1], shape[2] // 2 + 1)).astype(np.float32)
    fwd, inv, perms = mxfft.make_fft_ops(shape)
    op_p = op[perms[0]]  # permute z axis (y axis of length 8 is identity)
    got = np.asarray(
        jax.jit(lambda v: inv(fwd(v) * jnp.asarray(op_p), shape))(jnp.asarray(x))
    )
    ref = np.fft.irfftn(np.fft.rfftn(x) * op, s=shape).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=5e-5 * np.abs(ref).max())


@pytest.mark.parametrize("shape", [(8, 16, 32), (8, 15, 32), (9, 16, 25)])
def test_shift_matmul_matches_fft_shift(shape):
    """make_shift_ops (circulant matmul per axis) reproduces shifted_velocity's
    rfft/irfft half-cell shift — including odd axes, whose length cannot be
    inferred from the packed [R, 2] vector (round-2 advisor finding)."""
    from kwave_tpu.solver.operators import make_shift_neg
    from kwave_tpu.solver.step import FftOps, SimState, shifted_velocity

    nz, ny, nx = shape
    d = 1e-4
    rng = np.random.default_rng(13)
    u = {k: rng.standard_normal((nz, ny, nx)).astype(np.float32) for k in "xyz"}
    state = SimState(
        p=jnp.zeros((nz, ny, nx), jnp.float32),
        ux_sgx=jnp.asarray(u["x"]), uy_sgy=jnp.asarray(u["y"]),
        uz_sgz=jnp.asarray(u["z"]),
        rho_x=None, rho_y=None, rho_z=None,
    )

    class _Ops:
        shift_x_neg = make_shift_neg(nx, d, True)
        shift_y_neg = make_shift_neg(ny, d, True)
        shift_z_neg = make_shift_neg(nz, d, True)

    ref = shifted_velocity(state, _Ops)
    shift_fn = mxfft.make_shift_ops(_Ops, (nz, ny, nx))
    got = shifted_velocity(state, _Ops, FftOps(None, None, shift_fn))
    for g, r in zip(got, ref):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-6 * np.abs(np.asarray(r)).max()
        )


def test_high_precision_error_bound():
    """HIGH (3-pass bf16) matmul precision keeps per-transform error ~1e-6 relative —
    the driver's default mxfft mode. Compared against float64 numpy on a realistic
    pressure-scale field."""
    shape = (256, 8, 32)
    rng = np.random.default_rng(9)
    x = (1e5 * rng.standard_normal(shape)).astype(np.float32)
    fwd, inv, _ = mxfft.make_fft_ops(shape, precision=jax.lax.Precision.HIGH)
    ref = np.fft.rfftn(x.astype(np.float64))
    mine = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    scale = np.abs(ref).max()
    err = np.abs(mine - _ref_permuted(ref, shape)).max() / scale
    assert err < 5e-6, err
    y = np.asarray(jax.jit(lambda v: inv(fwd(v), shape))(jnp.asarray(x)))
    rt = np.abs(y - x).max() / np.abs(x).max()
    assert rt < 5e-6, rt


def _het_setup(shape, compact=False):
    nz, ny, nx = shape
    dx = 1e-4
    dt = 0.3 * dx / 1600.0
    grid = Grid(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, dz=dx, dt=dt, nt=100)
    rng = np.random.default_rng(7)
    c0 = (1500.0 + 100.0 * rng.random(grid.shape)).astype(np.float32)
    rho0 = (1000.0 + 50.0 * rng.random(grid.shape)).astype(np.float32)
    medium = Medium(c0=c0, rho0=rho0, alpha_coeff=0.75, alpha_power=1.5)
    ops = make_operators(grid, medium, (2, 2, 2), (2.0,) * 3, absorbing=True,
                         compact=compact)
    p0 = np.zeros(grid.shape, np.float32)
    p0[nz // 2, ny // 2, nx // 2] = 1e5
    cfg = SolverConfig(absorbing=True, p0_source_flag=True)
    return grid, ops, cfg, p0


def test_step_with_mxfft_matches_local_fft():
    """Full het absorbing steps through the mxfft path (permuted operators) track the
    jnp.fft path to fp32 noise."""
    shape = (256, 8, 8)
    grid, ops, cfg, p0 = _het_setup(shape)
    fwd, inv, perms = mxfft.make_fft_ops(shape)
    mx = FftOps(rfftn=fwd, irfftn=inv)
    ops_p = mxfft.permute_operators(ops, 3, perms)

    def run(o, fft):
        src = Sources(p0=jnp.asarray(p0))
        st, _ = simulate(init_state(grid), o, src, cfg, n_steps=8, fft=fft)
        return np.asarray(st.p)

    p_ref = run(ops, LOCAL_FFT)
    p_mx = run(ops_p, mx)
    np.testing.assert_allclose(p_mx, p_ref, atol=1e-4 * np.abs(p_ref).max())


def test_batched_fft_ops_and_step():
    """FftOps.batched contract: mxfft's transforms are batch-transparent (a stacked
    leading axis is a stack of grids), and a step() run with batched=True matches
    batched=False bit-for-bit shapes / fp32-noise values. (The driver keeps
    batched=False — measured slower at 256^3, BASELINE.md — but the branch must
    stay correct while it exists.)"""
    shape = (256, 8, 8)
    grid, ops, cfg, p0 = _het_setup(shape)
    fwd, inv, perms = mxfft.make_fft_ops(shape)

    rng = np.random.default_rng(3)
    stack = jnp.asarray(rng.standard_normal((3, *shape)).astype(np.float32))
    fk_stacked = fwd(stack)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(fk_stacked[i]), np.asarray(fwd(stack[i])),
                                   rtol=1e-5, atol=1e-4)
    back = inv(fk_stacked, shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(stack), atol=1e-4)

    ops_p = mxfft.permute_operators(ops, 3, perms)

    def run(fft):
        src = Sources(p0=jnp.asarray(p0))
        st, _ = simulate(init_state(grid), ops_p, src, cfg, n_steps=6, fft=fft)
        return np.asarray(st.p)

    p_unbatched = run(FftOps(rfftn=fwd, irfftn=inv, batched=False))
    p_batched = run(FftOps(rfftn=fwd, irfftn=inv, batched=True))
    np.testing.assert_allclose(p_batched, p_unbatched,
                               atol=1e-5 * np.abs(p_unbatched).max())


def test_compact_operators_match_precomputed():
    """make_operators(compact=True) — lazy kappa/nablas/c2/tau/eta — reproduces the
    precomputed-operator step to fp32 noise (16^3 het absorbing)."""
    shape = (16, 16, 16)
    grid, ops_full, cfg, p0 = _het_setup(shape, compact=False)
    _, ops_c, _, _ = _het_setup(shape, compact=True)
    assert ops_c.kappa is None and ops_c.absorb_nabla1 is None
    assert ops_c.c2 is None and ops_c.absorb_tau is None

    def run(o):
        src = Sources(p0=jnp.asarray(p0))
        st, _ = simulate(init_state(grid), o, src, cfg, n_steps=6)
        return np.asarray(st.p)

    p_full = run(ops_full)
    p_c = run(ops_c)
    np.testing.assert_allclose(p_c, p_full, atol=2e-5 * np.abs(p_full).max())


def test_driver_matmul_fft_and_compact(tmp_path):
    """run_simulation with matmul_fft/compact_operators forced on produces the same
    p series as the default path (within fp32 transform noise)."""
    import h5py

    from kwave_tpu.driver import RunConfig, run_simulation
    from kwave_tpu.io.input_file import InputData

    nz, ny, nx = 256, 4, 8
    dx = 1e-4
    grid = Grid(nx=nx, ny=ny, nz=nz, dx=dx, dy=dx, dz=dx,
                dt=0.3 * dx / 1600.0, nt=12)
    rng = np.random.default_rng(2)
    p0 = np.zeros(grid.shape, np.float32)
    p0[nz // 2, ny // 2, nx // 2] = 1e5
    mask = np.sort(rng.choice(grid.n_elements, 32, replace=False)).astype(np.int64)
    c0 = (1500.0 + 100.0 * rng.random(grid.shape)).astype(np.float32)

    def data():
        return InputData(
            grid=grid,
            medium=Medium(c0=c0, rho0=1000.0, alpha_coeff=0.75, alpha_power=1.5),
            absorbing=True,
            nonlinear=False,
            p0=p0,
            sensor_mask_index=mask,
            pml_size=(2, 2, 2),
            pml_alpha=(2.0, 2.0, 2.0),
        )

    out_a = str(tmp_path / "a.h5")
    out_b = str(tmp_path / "b.h5")
    run_simulation(data(), RunConfig(flags=dict(p_raw=True), matmul_fft=False,
                                     compact_operators=False), out_a)
    run_simulation(data(), RunConfig(flags=dict(p_raw=True), matmul_fft=True,
                                     compact_operators=True), out_b)
    with h5py.File(out_a) as fa, h5py.File(out_b) as fb:
        a = np.asarray(fa["p"])
        b = np.asarray(fb["p"])
    np.testing.assert_allclose(b, a, atol=2e-4 * np.abs(a).max())


@pytest.mark.parametrize("shape", [(256, 4, 16), (64, 32, 30)])
def test_direct_base_roundtrip_and_canonical_order(shape):
    """direct_base=256: axes <= 256 skip the butterflies (identity perm, one
    full-DFT matmul) and still invert exactly."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal(shape).astype(np.float32)
    fwd, inv, perms = mxfft.make_fft_ops(shape, direct_base=256)
    for ax, p in perms.items():
        np.testing.assert_array_equal(p, np.arange(shape[ax]))
    fk = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    ref = np.fft.rfftn(x).astype(np.complex64)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(fk.real, ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(fk.imag, ref.imag, atol=3e-5 * scale)
    y = np.asarray(jax.jit(lambda v: inv(fwd(v), shape))(jnp.asarray(x)))
    np.testing.assert_allclose(y, x, atol=3e-5 * np.abs(x).max())


def test_auto_direct_base_heuristic():
    """Driver base-DFT auto-pick (BASELINE.md 2026-08-21): dense full-DFT base
    for every >=256 axis at precision "high" (HBM passes beat MXU flops there);
    128 base at "highest" (dense contraction is MXU-bound under 6-pass
    emulation) and for small grids."""
    from kwave_tpu.driver import _auto_direct_base

    assert _auto_direct_base((512, 512, 512), "high") == 512
    assert _auto_direct_base((512, 64, 64), "high") == 512
    assert _auto_direct_base((256, 256, 256), "high") == 256
    assert _auto_direct_base((128, 128, 128), "high") is None
    # at "highest" the crossover moves to 512 (dense wins 360 vs 492 there but
    # loses at 256^3, BASELINE.md)
    assert _auto_direct_base((512, 512, 512), "highest") == 512
    assert _auto_direct_base((256, 256, 256), "highest") is None
    # the dense-base transform stays correct at HIGH precision (K=512: 3-pass
    # bf16 error accumulates over the full contraction)
    shape = (512, 8, 8)
    fwd, inv, perms = mxfft.make_fft_ops(shape, direct_base=512,
                                         precision=jax.lax.Precision.HIGH)
    rng = np.random.default_rng(2)
    x = (1e5 * rng.standard_normal(shape)).astype(np.float32)
    ref = np.fft.rfftn(x.astype(np.float64))
    mine = np.asarray(jax.jit(fwd)(jnp.asarray(x)))
    idx = [mxfft.perm(512, 512), np.arange(8), np.arange(5)]
    err = np.abs(mine - ref[np.ix_(*idx)]).max() / np.abs(ref).max()
    assert err < 1e-5, err
    y = np.asarray(jax.jit(lambda v: inv(fwd(v), shape))(jnp.asarray(x)))
    rt = np.abs(y - x).max() / np.abs(x).max()
    assert rt < 1e-5, rt


def test_auto_mxfft_threshold_by_precision():
    """mxfft auto-enable threshold (BASELINE.md 2026-08-21): the whole 64^3+
    envelope at precision "high" (dense-base wins ~2x at 64/128), 256+ at
    "highest" (6-pass emulation only pays off there)."""
    from kwave_tpu.driver import _auto_mxfft_min_axis

    assert _auto_mxfft_min_axis("high") == 64
    assert _auto_mxfft_min_axis("highest") == 256
