"""Post-processing tests: time shift, intensity, Q term, and the --post file path."""

import numpy as np
import h5py
import jax.numpy as jnp

from kwave_tpu import postproc
from kwave_tpu.driver import RunConfig, run_simulation
from kwave_tpu.io.input_file import InputData
from kwave_tpu.solver import Grid, Medium


def test_time_shift_half_step_analytic():
    """Shifting a sampled sinusoid by dt/2 must match the analytic half-step advance."""
    t_steps = 64
    t = np.arange(t_steps)
    for m in (1, 3, 7):  # integer-period tones are exactly representable
        w = 2 * np.pi * m / t_steps
        x = np.cos(w * t).astype(np.float32)[:, None]
        shifted = np.asarray(postproc.time_shift_half_step(jnp.asarray(x)))[:, 0]
        expect = np.cos(w * (t + 0.5))
        np.testing.assert_allclose(shifted, expect, atol=2e-5)


def test_avg_intensity_raw_plane_wave():
    """For p = A cos(wt), u = (A/(rho c)) cos(w(t+1/2 - 1/2)) the intensity is A^2/(2 rho c)."""
    t_steps, n = 60, 5
    m = 6
    w = 2 * np.pi * m / t_steps
    t = np.arange(t_steps)[:, None]
    a, rho_c = 1e5, 1.5e6
    p = (a * np.cos(w * t)).astype(np.float32) * np.ones((1, n), np.float32)
    # u sampled half a step EARLY (staggered): u[t] = (A/rhoc) cos(w (t - 1/2))
    u = (a / rho_c * np.cos(w * (t - 0.5))).astype(np.float32) * np.ones((1, n), np.float32)
    i_avg = np.asarray(postproc.avg_intensity_raw(jnp.asarray(p), jnp.asarray(u)))
    np.testing.assert_allclose(i_avg, a**2 / (2 * rho_c) * np.ones(n), rtol=1e-5)


def test_q_term_analytic():
    """Q = -dIx/dx for Ix = sin(kx x): Q = -k cos(kx x)."""
    n = 32
    dx = 0.5
    kx = 2 * np.pi * 3 / (n * dx)
    x = np.arange(n) * dx
    ix = np.broadcast_to(np.sin(kx * x).astype(np.float32), (n, n)).copy()
    iy = np.zeros((n, n), np.float32)
    q = np.asarray(postproc.q_term(jnp.asarray(ix), jnp.asarray(iy), None, dx, dx, dx))
    np.testing.assert_allclose(q[0], -kx * np.cos(kx * x), atol=1e-3)


def _sim_input(nt=60, n=16):
    grid = Grid(nx=n, ny=n, nz=n, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=nt)
    p0 = np.zeros(grid.shape, np.float32)
    p0[n // 2, n // 2, n // 2] = 1e5
    mask = np.sort(np.random.default_rng(5).choice(grid.n_elements, 48, replace=False))
    return InputData(
        grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
        pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3,
        sensor_mask_index=mask, p0=p0,
    )


def test_i_avg_and_q_term_end_to_end(tmp_path):
    data = _sim_input()
    out = str(tmp_path / "out.h5")
    run = RunConfig(flags={}, i_avg=True, q_term=True, i_avg_c=True,
                    period=10.0, harmonics=2)
    run_simulation(data, run, out)
    with h5py.File(out, "r") as f:
        # raw dependency streams are stored (read back by the post pass); the coefficient
        # dependencies run hidden (doNotSave, OutputStreamContainer.cpp:269-325)
        assert "p" in f and "ux_non_staggered" in f
        assert "p_c" not in f and "ux_non_staggered_c" not in f
        for name in ("Ix_avg", "Iy_avg", "Iz_avg", "Q_term", "Ix_avg_c"):
            assert name in f, name
            assert np.isfinite(np.asarray(f[name])).all()
        # raw-series and coefficient-space intensity agree (coeffs capture the
        # harmonic content; tolerance loose because of windowing/transients)
        ix = np.asarray(f["Ix_avg"]).reshape(-1)
        ixc = np.asarray(f["Ix_avg_c"]).reshape(-1)
        scale = np.abs(ix).max()
        assert scale > 0
        assert np.median(np.abs(ixc - ix)) < 0.5 * scale


def test_i_avg_c_40bit(tmp_path):
    """On-the-fly coefficient intensity from packed 40-bit frames (beyond the reference's
    post path, which cannot handle 40-bit at all — note :1541)."""
    data = _sim_input()
    out = str(tmp_path / "out40.h5")
    run = RunConfig(flags={}, i_avg_c=True, period=10.0, harmonics=1, mode40=True)
    run_simulation(data, run, out)
    with h5py.File(out, "r") as f:
        assert "p_c" not in f  # hidden dependency stream
        ixc = np.asarray(f["Ix_avg_c"])
        assert np.isfinite(ixc).all() and np.abs(ixc).max() > 0

    # explicit --p_c keeps the dependency visible AND the on-the-fly intensity equal
    out2 = str(tmp_path / "out40b.h5")
    run2 = RunConfig(flags=dict(p_c=True, u_non_staggered_c=True), i_avg_c=True,
                     period=10.0, harmonics=1, mode40=True)
    run_simulation(data, run2, out2)
    with h5py.File(out2, "r") as f:
        assert f["p_c"].attrs["c_complex_size"] == np.float32(1.25)
        np.testing.assert_array_equal(np.asarray(f["Ix_avg_c"]), ixc)


def test_block_size_matches_unblocked(tmp_path):
    """--block_size bounded hyperslab streaming must reproduce the in-memory result
    (reference block-wise computeAverageIntensities, KSpaceFirstOrderSolver.cpp:1283-1307)."""
    from kwave_tpu.postproc import post_process_output_file

    data = _sim_input()
    out = str(tmp_path / "out.h5")
    # store the coefficient streams explicitly so the --post reader can re-derive
    # intensity from the file (the on-the-fly path tested elsewhere does not store them)
    run = RunConfig(flags=dict(p_c=True, u_non_staggered_c=True),
                    i_avg=True, q_term=True, i_avg_c=True,
                    period=10.0, harmonics=2)
    run_simulation(data, run, out)
    with h5py.File(out, "r") as f:
        ref = {k: np.asarray(f[k]) for k in
               ("Ix_avg", "Iy_avg", "Iz_avg", "Q_term", "Ix_avg_c")}
    mask = data.sensor_mask_index
    # tiny blocks: raw mode -> a handful of sensors per read; coeff mode -> 1 frame
    post_process_output_file(out, data.grid, mask, want_i_avg=True, want_q_term=True,
                             from_coeffs=False, block_size=500)
    post_process_output_file(out, data.grid, mask, want_i_avg=True, want_q_term=False,
                             from_coeffs=True, block_size=100)
    with h5py.File(out, "r") as f:
        for k, v in ref.items():
            got = np.asarray(f[k])
            np.testing.assert_allclose(got, v, rtol=1e-5, atol=1e-8, err_msg=k)


def test_auto_block_size_computation():
    """Block-size derivation from available memory (the reference's free-memory sizing,
    KSpaceFirstOrderSolver.cpp:1283-1307): 1/8 of available, /4 per concurrent buffer,
    2 GB cap, 8M-element floor."""
    from kwave_tpu.postproc import _auto_block_size

    gib = 1 << 30
    assert _auto_block_size(avail_bytes=64 * gib) == (2 * gib) // 4  # capped at 2 GB
    assert _auto_block_size(avail_bytes=8 * gib) == (gib // 4)  # 1/8 * 8GiB / 4
    assert _auto_block_size(avail_bytes=0) == 8 << 20  # floor
    # free DEVICE memory also bounds the block (the reference takes
    # min(host, device) — KSpaceFirstOrderSolver.cpp:1297; HBM binds at 512^3)
    assert _auto_block_size(avail_bytes=64 * gib, device_bytes=4 * gib) == gib // 4
    assert _auto_block_size(avail_bytes=64 * gib, device_bytes=0) == 8 << 20
    # the default probe path returns something sane
    assert _auto_block_size() >= 8 << 20


def test_cuboid_cx_inverse():
    """_cuboid_cx_from_row inverts ceil(cx*complex_size)*h for every cx/h/width combo."""
    import math as m

    from kwave_tpu.postproc import _cuboid_cx_from_row

    for cs in (1.25, 2.0):
        for h in (1, 2, 4):
            for cx in range(1, 70):
                row = m.ceil(cx * cs) * h
                assert _cuboid_cx_from_row(row, h, cs) == cx, (cs, h, cx)


def test_i_avg_c_post_cuboid_40bit(tmp_path):
    """--post coefficient-space intensity from CUBOID-layout 40-bit streams (beyond the
    reference, which cannot post-process 40-bit at all — note :1541, and a round-2 gap
    here): must agree with the equivalent index-mask 40-bit post run on the same points."""
    from kwave_tpu.driver import _corners_to_indices
    from kwave_tpu.postproc import post_process_output_file

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=60)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    corners = np.array([[2, 3, 4, 6, 6, 7], [9, 9, 9, 12, 10, 9]])  # cx=5 pads 40-bit rows
    base = dict(grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
                pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3, p0=p0)
    run = RunConfig(flags=dict(p_c=True, u_non_staggered_c=True),
                    period=10.0, harmonics=2, mode40=True)

    out_c = str(tmp_path / "cuboid.h5")
    run_simulation(InputData(sensor_mask_corners=corners, **base), run, out_c)
    mask = _corners_to_indices(corners, grid)
    out_i = str(tmp_path / "index.h5")
    run_simulation(InputData(sensor_mask_index=mask, **base), run, out_i)

    post_process_output_file(out_c, grid, mask, want_i_avg=True, want_q_term=False,
                             from_coeffs=True)
    post_process_output_file(out_i, grid, mask, want_i_avg=True, want_q_term=False,
                             from_coeffs=True, block_size=100)  # tiny blocks too
    with h5py.File(out_c) as fc, h5py.File(out_i) as fi:
        for a in ("x", "y", "z"):
            grp = fc[f"I{a}_avg_c"]
            assert isinstance(grp, h5py.Group)
            got = np.concatenate([np.asarray(grp[k]).reshape(-1)
                                  for k in sorted(grp.keys(), key=int)])
            want = np.asarray(fi[f"I{a}_avg_c"]).reshape(-1)
            assert np.abs(want).max() > 0
            np.testing.assert_array_equal(got, want, err_msg=a)


def test_i_avg_post_cuboid_blocked_raw(tmp_path):
    """Raw-mode cuboid --post with a tiny block_size (z-slab hyperslab reads) equals the
    unblocked result."""
    from kwave_tpu.driver import _corners_to_indices
    from kwave_tpu.postproc import post_process_output_file

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=60)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    corners = np.array([[2, 3, 4, 6, 6, 9], [9, 9, 9, 12, 10, 9]])
    base = dict(grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
                pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3, p0=p0)
    run = RunConfig(flags=dict(p_raw=True, u_non_staggered_raw=True))
    out = str(tmp_path / "cuboid.h5")
    run_simulation(InputData(sensor_mask_corners=corners, **base), run, out)
    mask = _corners_to_indices(corners, grid)

    post_process_output_file(out, grid, mask, want_i_avg=True, want_q_term=False)
    with h5py.File(out) as f:
        ref = {a: np.concatenate([np.asarray(f[f"I{a}_avg"][k]).reshape(-1)
                                  for k in sorted(f[f"I{a}_avg"].keys(), key=int)])
               for a in ("x", "y", "z")}
    # force 1-z-slab blocks: block_size < T*cy*cx of the smallest cuboid
    post_process_output_file(out, grid, mask, want_i_avg=True, want_q_term=False,
                             block_size=200)
    with h5py.File(out) as f:
        for a in ("x", "y", "z"):
            got = np.concatenate([np.asarray(f[f"I{a}_avg"][k]).reshape(-1)
                                  for k in sorted(f[f"I{a}_avg"].keys(), key=int)])
            np.testing.assert_array_equal(got, ref[a], err_msg=a)


def test_i_avg_and_q_term_cuboid_layout(tmp_path):
    """--post on a cuboid-mask run: series live in per-cuboid HDF5 groups; intensity and
    Q-term results must come back in the same per-cuboid layout and agree with an
    equivalent index-mask run (same points)."""
    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=60)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    corners = np.array([[2, 3, 4, 5, 6, 7], [9, 9, 9, 12, 10, 9]])  # two cuboids
    base = dict(grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
                pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3, p0=p0)
    run = RunConfig(flags={}, i_avg=True, q_term=True, i_avg_c=True,
                    period=10.0, harmonics=2)

    out_c = str(tmp_path / "cuboid.h5")
    run_simulation(InputData(sensor_mask_corners=corners, **base), run, out_c)

    from kwave_tpu.driver import _corners_to_indices

    mask = _corners_to_indices(corners, grid)
    out_i = str(tmp_path / "index.h5")
    run_simulation(InputData(sensor_mask_index=mask, **base), run, out_i)

    with h5py.File(out_c) as fc, h5py.File(out_i) as fi:
        for name in ("Ix_avg", "Iy_avg", "Iz_avg", "Q_term"):
            grp = fc[name]
            assert isinstance(grp, h5py.Group), name
            got = np.concatenate(
                [np.asarray(grp[k]).reshape(-1) for k in sorted(grp.keys(), key=int)])
            want = np.asarray(fi[name]).reshape(-1)
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-9, err_msg=name)
        # the on-the-fly coefficient intensity is a per-sensor aggregate: per-cuboid
        # group layout in cuboid runs (CuboidOutputStream handles every reduce op)
        grp = fc["Ix_avg_c"]
        assert isinstance(grp, h5py.Group)
        got = np.concatenate(
            [np.asarray(grp[k]).reshape(-1) for k in sorted(grp.keys(), key=int)])
        np.testing.assert_allclose(
            got, np.asarray(fi["Ix_avg_c"]).reshape(-1), rtol=1e-5, atol=1e-9)


def test_post_missing_streams_clear_error(tmp_path):
    """--post on a file lacking the u_non_staggered_c datasets must raise an
    actionable ValueError, not a KeyError from deep inside h5py."""
    import pytest

    data = _sim_input(nt=30)
    out = str(tmp_path / "out.h5")
    run = RunConfig(flags=dict(p_c=True), period=10.0, harmonics=2)
    run_simulation(data, run, out)
    with pytest.raises(ValueError, match="u_non_staggered"):
        postproc.post_process_output_file(out, data.grid, data.sensor_mask_index,
                                          want_i_avg=True, from_coeffs=True)
