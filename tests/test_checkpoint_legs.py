"""Multi-leg checkpoint/restart equivalence: split runs must produce bitwise-identical
output files to a single run (the reference's multi-leg execution design, main.cpp:147-169)."""

import numpy as np
import h5py

from kwave_tpu.driver import RunConfig, run_simulation
from kwave_tpu.io.input_file import InputData
from kwave_tpu.solver import Grid, Medium


def _input(nt=60, n=16):
    grid = Grid(nx=n, ny=n, nz=n, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=nt)
    p0 = np.zeros(grid.shape, np.float32)
    p0[n // 2, n // 2, n // 2] = 1e5
    mask = np.sort(np.random.default_rng(9).choice(grid.n_elements, 40, replace=False))
    return InputData(
        grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
        pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3,
        sensor_mask_index=mask, p0=p0,
    )


def _flags():
    return dict(p_raw=True, p_c=True, p_rms=True, p_max=True)


def test_multi_leg_bitwise_equal(tmp_path):
    data = _input()
    # single-leg reference
    out1 = str(tmp_path / "single.h5")
    run_simulation(data, RunConfig(flags=_flags(), period=10.0, harmonics=2), out1)

    # three legs of 20 steps via checkpoint interrupts
    out2 = str(tmp_path / "legs.h5")
    ckpt = str(tmp_path / "ckpt.h5")
    run = RunConfig(flags=_flags(), period=10.0, harmonics=2,
                    checkpoint_file=ckpt, checkpoint_interval_steps=20)
    s1 = run_simulation(data, run, out2)
    assert s1["__checkpointed_at__"] == (20,)
    s2 = run_simulation(data, run, out2, resume_from=ckpt)
    assert s2["__checkpointed_at__"] == (40,)
    s3 = run_simulation(data, run, out2, resume_from=ckpt)
    assert "__checkpointed_at__" not in s3

    with h5py.File(out1) as f1, h5py.File(out2) as f2:
        for name in ("p", "p_c", "p_rms", "p_max"):
            a = np.asarray(f1[name])
            b = np.asarray(f2[name])
            np.testing.assert_array_equal(a, b, err_msg=name)


def test_multi_leg_40bit(tmp_path):
    """40-bit packed accumulators survive the checkpoint roundtrip bit-exactly."""
    data = _input(nt=40)
    out1 = str(tmp_path / "single.h5")
    run_simulation(data, RunConfig(flags=dict(p_c=True), period=10.0, mode40=True), out1)

    out2 = str(tmp_path / "legs.h5")
    ckpt = str(tmp_path / "ckpt.h5")
    run = RunConfig(flags=dict(p_c=True), period=10.0, mode40=True,
                    checkpoint_file=ckpt, checkpoint_interval_steps=10)
    run_simulation(data, run, out2)
    run_simulation(data, run, out2, resume_from=ckpt)
    run_simulation(data, run, out2, resume_from=ckpt)
    run_simulation(data, run, out2, resume_from=ckpt)

    with h5py.File(out1) as f1, h5py.File(out2) as f2:
        np.testing.assert_array_equal(np.asarray(f1["p_c"]), np.asarray(f2["p_c"]))


def test_wall_time_checkpoint_trigger(tmp_path):
    """checkpoint_interval_seconds (the reference --checkpoint_interval) interrupts the run
    at the next window boundary; resumed legs still produce the single-run output bitwise."""
    data = _input()
    out1 = str(tmp_path / "single.h5")
    run_simulation(data, RunConfig(flags=_flags(), period=10.0, harmonics=2), out1)

    out2 = str(tmp_path / "legs.h5")
    ckpt = str(tmp_path / "ckpt.h5")
    run = RunConfig(flags=_flags(), period=10.0, harmonics=2,
                    checkpoint_file=ckpt, checkpoint_interval_seconds=0.0)
    # interval 0 -> checkpoint after every window (o_size=10 steps); 60 steps = 6 legs
    legs = 0
    summary = run_simulation(data, run, out2)
    while "__checkpointed_at__" in summary:
        legs += 1
        assert legs < 20
        summary = run_simulation(data, run, out2, resume_from=ckpt)
    assert legs >= 2
    with h5py.File(out1) as f1, h5py.File(out2) as f2:
        for name in ("p", "p_c", "p_rms", "p_max"):
            np.testing.assert_array_equal(
                np.asarray(f1[name]), np.asarray(f2[name]), err_msg=name)
