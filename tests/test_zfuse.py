"""Fused z-stage spectral multiply (ops/zfuse.py) vs the unfused composition
(interpret mode on CPU; the same kernel compiles for TPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from kwave_tpu.ops import zfuse


def _case(nz=32, ny=16, nx=16, seed=0):
    rng = np.random.default_rng(seed)
    nxr = nx // 2 + 1
    s = (rng.standard_normal((nz, ny, nxr))
         + 1j * rng.standard_normal((nz, ny, nxr))).astype(np.complex64)
    k2z = (np.fft.fftfreq(nz) * 2 * np.pi * nz / 1e-2) ** 2
    k2y = (np.fft.fftfreq(ny) * 2 * np.pi * ny / 1e-2) ** 2
    k2x = (np.fft.rfftfreq(nx) * 2 * np.pi * nx / 1e-2) ** 2
    plan = zfuse.make_plan((nz, ny, nx), k2z, k2y, k2x, c_ref_dt_2=1e-5)
    return s, k2z, k2y, k2x, plan


def _kappa_np(k2z, k2y, k2x, c):
    k = np.sqrt(k2z[:, None, None] + k2y[None, :, None] + k2x[None, None, :])
    arg = c * k
    return np.where(arg == 0, 1.0, np.sin(arg) / np.where(arg == 0, 1.0, arg))


def _ref(s, op):
    return np.fft.ifft(np.fft.fft(s, axis=0) * op, axis=0).astype(np.complex64)


def test_grad_ops_all_axes_share_one_forward():
    s, k2z, k2y, k2x, plan = _case()
    nz, ny, nxr = s.shape
    rng = np.random.default_rng(3)
    dds = []
    ops = []
    for axis, n in ((0, nz), (1, ny), (2, nxr)):
        dd = rng.standard_normal((n, 2)).astype(np.float32)
        dds.append(dd)
        ops.append(zfuse.OpSpec("grad", axis=axis))
    outs = zfuse.apply(plan, jnp.asarray(s.real), jnp.asarray(s.imag),
                       tuple(ops), tuple(dds))
    kap = _kappa_np(k2z, k2y, k2x, 1e-5)
    shapes = [(nz, 1, 1), (1, ny, 1), (1, 1, nxr)]
    for (o_re, o_im), dd, shp in zip(outs, dds, shapes):
        ddc = (dd[:, 0] + 1j * dd[:, 1]).reshape(shp)
        ref = _ref(s, kap * ddc)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(o_re), ref.real, atol=3e-5 * scale)
        np.testing.assert_allclose(np.asarray(o_im), ref.imag, atol=3e-5 * scale)


def test_nabla_ops_and_pole():
    s, k2z, k2y, k2x, plan = _case(seed=5)
    power = -0.5
    outs = zfuse.apply(plan, jnp.asarray(s.real), jnp.asarray(s.imag),
                       (zfuse.OpSpec("nabla", power=power),), use_kappa=False)
    k = np.sqrt(k2z[:, None, None] + k2y[None, :, None] + k2x[None, None, :])
    op = np.where(k == 0, 0.0, np.where(k == 0, 1.0, k) ** power)
    ref = _ref(s, op)
    scale = np.abs(ref).max()
    o_re, o_im = outs[0]
    np.testing.assert_allclose(np.asarray(o_re), ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(o_im), ref.imag, atol=3e-5 * scale)


def test_partial_x_tail_block():
    """nxr not a lane multiple (the production 257 case, scaled down): the
    boundary block's OOB lanes must not corrupt in-range output."""
    s, k2z, k2y, k2x, plan = _case(nz=16, ny=8, nx=260, seed=7)  # nxr = 131
    rng = np.random.default_rng(8)
    dd = rng.standard_normal((16, 2)).astype(np.float32)
    outs = zfuse.apply(plan, jnp.asarray(s.real), jnp.asarray(s.imag),
                       (zfuse.OpSpec("grad", axis=0),), (dd,))
    kap = _kappa_np(k2z, k2y, k2x, 1e-5)
    ddc = (dd[:, 0] + 1j * dd[:, 1]).reshape(16, 1, 1)
    ref = _ref(s, kap * ddc)
    scale = np.abs(ref).max()
    np.testing.assert_allclose(np.asarray(outs[0][0]), ref.real, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(outs[0][1]), ref.imag, atol=3e-5 * scale)


def test_step_with_zfuse_matches_unfused():
    """A full het absorbing step with FftOps.spectral_multi (all 14 transforms
    fused through zfuse) tracks the plain mxfft dense-base step to transform
    noise."""
    from kwave_tpu.ops import mxfft
    from kwave_tpu.solver import (Grid, Medium, SolverConfig, Sources, init_state,
                                  make_operators, make_p0_init, simulate)
    from kwave_tpu.solver.step import FftOps

    n = 16
    grid = Grid(nx=n, ny=n, nz=n, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=8)
    rng = np.random.default_rng(7)
    c0 = (1500.0 + 100.0 * rng.random(grid.shape)).astype(np.float32)
    medium = Medium(c0=c0, rho0=1000.0, alpha_coeff=0.75, alpha_power=1.5)
    ops = make_operators(grid, medium, (2, 2, 2), (2.0,) * 3, absorbing=True,
                         compact=True)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    cfg = SolverConfig(absorbing=True)
    prec = jax.lax.Precision.HIGH
    fwd, inv, perms = mxfft.make_fft_ops(grid.shape, precision=prec, direct_base=n)
    sm = zfuse.make_pipeline(grid.shape, ops.k2_z, ops.k2_y, ops.k2_x,
                             ops.c_ref_dt_2, precision=prec)
    base = FftOps(rfftn=fwd, irfftn=inv)
    fused = FftOps(rfftn=fwd, irfftn=inv, spectral_multi=sm)

    def run(fft):
        st0 = make_p0_init(grid, ops, p0, fft)
        st, _ = simulate(st0, ops, Sources(), cfg, n_steps=6, fft=fft, t0=1)
        return np.asarray(st.p)

    p_ref = run(base)
    p_fused = run(fused)
    np.testing.assert_allclose(p_fused, p_ref, atol=2e-4 * np.abs(p_ref).max())


def test_driver_fuse_z_matches_default(tmp_path):
    """run_simulation with fuse_z forced on (tiny dense-base config) matches the
    default run within transform noise."""
    import h5py

    from kwave_tpu.driver import RunConfig, run_simulation
    from kwave_tpu.io.input_file import InputData
    from kwave_tpu.solver import Grid, Medium

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=30)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    mask = np.sort(
        np.random.default_rng(1).choice(grid.n_elements, 48, replace=False)
    )
    data = InputData(
        grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
        pml_size=(2, 2, 2), pml_alpha=(2.0,) * 3,
        sensor_mask_index=mask, p0=p0,
    )
    out_ref = str(tmp_path / "ref.h5")
    out_z = str(tmp_path / "z.h5")
    run_simulation(data, RunConfig(flags=dict(p_raw=True)), out_ref)
    run_simulation(
        data,
        RunConfig(flags=dict(p_raw=True), matmul_fft=True, fft_precision="high",
                  fft_direct_base=16, compact_operators=True, fuse_z=True),
        out_z,
    )
    with h5py.File(out_ref) as fr, h5py.File(out_z) as fz:
        a, b = np.asarray(fz["p"]), np.asarray(fr["p"])
        np.testing.assert_allclose(a, b, atol=1e-4 * np.abs(b).max())
