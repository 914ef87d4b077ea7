"""HDF5 contract tests: input-file roundtrip, output stream layout, checkpoint."""

import numpy as np
import h5py
import pytest

from kwave_tpu.io import (
    CompressionAttrs,
    create_compressed_dataset,
    create_cuboid_group,
    create_output_file,
    create_raw_dataset,
    names,
    read_checkpoint,
    read_input_file,
    write_checkpoint,
    write_frame,
    write_frames,
    write_input_file,
)
from kwave_tpu.io.hdf5 import read_attr
from kwave_tpu.io.input_file import InputData
from kwave_tpu.solver import Grid, Medium
from kwave_tpu.solver.step import SimState


def _toy_input(tmp_path, het=False, with_sources=True):
    grid = Grid(nx=16, ny=12, nz=8, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=64)
    shape = grid.shape
    rng = np.random.default_rng(1)
    if het:
        medium = Medium(
            c0=(1500 + 10 * rng.random(shape)).astype(np.float32),
            rho0=(1000 + 5 * rng.random(shape)).astype(np.float32),
            alpha_coeff=0.5,
            alpha_power=1.5,
        )
    else:
        medium = Medium(c0=1500.0, rho0=1000.0, alpha_coeff=0.5, alpha_power=1.5)
    p0 = rng.standard_normal(shape).astype(np.float32)
    mask = rng.choice(grid.n_elements, 20, replace=False).astype(np.int64)
    data = InputData(
        grid=grid,
        medium=medium,
        pml_size=(4, 4, 4),
        pml_alpha=(2.0, 2.0, 2.0),
        absorbing=True,
        sensor_mask_index=np.sort(mask),
        p0=p0,
    )
    if with_sources:
        data.p_source_flag = 30
        data.p_source_index = np.array([5, 17, 200], np.int64)
        data.p_source_input = rng.standard_normal(30).astype(np.float32)
        data.p_source_mode = 1
    path = str(tmp_path / "input.h5")
    write_input_file(path, data)
    return path, data


@pytest.mark.parametrize("het", [False, True])
def test_input_file_roundtrip(tmp_path, het):
    path, orig = _toy_input(tmp_path, het=het)
    back = read_input_file(path)
    # spatial scalars are stored float32 (the format's own precision)
    assert (back.grid.nx, back.grid.ny, back.grid.nz, back.grid.nt) == (
        orig.grid.nx, orig.grid.ny, orig.grid.nz, orig.grid.nt)
    for a in ("dx", "dy", "dz", "dt"):
        assert getattr(back.grid, a) == np.float32(getattr(orig.grid, a))
    assert back.absorbing and not back.nonlinear
    np.testing.assert_array_equal(back.sensor_mask_index, orig.sensor_mask_index)
    np.testing.assert_array_equal(back.p0, orig.p0)
    if het:
        np.testing.assert_array_equal(back.medium.c0, orig.medium.c0)
        np.testing.assert_array_equal(back.medium.rho0, orig.medium.rho0)
    else:
        assert back.medium.c0 == 1500.0 and back.medium.rho0 == 1000.0
    np.testing.assert_array_equal(back.p_source_index, orig.p_source_index)
    np.testing.assert_allclose(back.p_source_input, orig.p_source_input)
    assert back.p_source_mode == 1 and back.p_source_flag == 30

    # file-level contract: 1-based mask, u64 scalars, header attrs
    with h5py.File(path, "r") as f:
        assert read_attr(f, names.FILE_TYPE) == "input"
        assert read_attr(f, names.MAJOR_VERSION) == "1"
        assert read_attr(f, names.MINOR_VERSION) == "1"
        assert f[names.NX].dtype == np.uint64 and f[names.NX].shape == (1, 1, 1)
        assert np.asarray(f[names.SENSOR_MASK_INDEX]).min() >= 1  # MATLAB 1-based
        assert f[names.P0_SOURCE_INPUT].shape == (8, 12, 16)  # (nz, ny, nx)


def test_compressed_dataset_layout(tmp_path):
    """Shape/chunk/attr contract of a `p_c` dataset (IndexOutputStream.cpp:87-171)."""
    path = str(tmp_path / "out.h5")
    f = create_output_file(path)
    attrs = CompressionAttrs(
        harmonics=3, period=20.0, mos=1, shift=False, complex_size=2.0, max_exp=138
    )
    n_sens, steps = 100, 205
    ds = create_compressed_dataset(f, "p_c", n_sens, steps, attrs)
    # mSize = ceil(100*2.0)*3 = 600; Nc = floor(205/20) = 10
    assert ds.shape == (1, 10, 600)
    assert ds.chunks == (1, 1, 600)
    write_frame(ds, 3, np.arange(600, dtype=np.float32))
    f.close()
    with h5py.File(path, "r") as f:
        assert read_attr(f, names.FILE_TYPE) == "output"
        d = f["p_c"]
        assert read_attr(d, "c_type") == "c"
        assert d.attrs["c_harmonics"] == 3
        assert d.attrs["c_period"] == np.float32(20.0)
        assert d.attrs["c_mos"] == 1
        assert d.attrs["c_shift"] == 0
        assert d.attrs["c_complex_size"] == np.float32(2.0)
        assert d.attrs["c_max_exp"] == 138
        assert read_attr(d, names.DOMAIN_TYPE) == "complex"
        assert read_attr(d, names.DATA_TYPE) == "float"
        np.testing.assert_array_equal(d[0, 3, :], np.arange(600, dtype=np.float32))

    # 40-bit sizing: complexSize = 1.25 floats
    f = h5py.File(str(tmp_path / "out40.h5"), "w")
    attrs40 = CompressionAttrs(
        harmonics=1, period=17.0, mos=1, shift=True, complex_size=1.25, max_exp=114
    )
    ds = create_compressed_dataset(f, "ux_non_staggered_c", 10, 40, attrs40)
    assert ds.shape == (1, 40 // 17, int(np.ceil(10 * 1.25)) * 1)
    f.close()


def test_raw_and_cuboid_layout(tmp_path):
    path = str(tmp_path / "out.h5")
    f = create_output_file(path)
    ds = create_raw_dataset(f, "p", 50, 200)
    assert ds.shape == (1, 200, 50)
    write_frames(ds, 10, np.ones((5, 50), np.float32))

    # (raw "p" and a cuboid "p" group never coexist — different mask types; use ux here)
    grp = create_cuboid_group(f, "ux", [(8, 6, 4), (3, 3, 3)], 200)
    assert grp["1"].shape == (200, 4, 6, 8)
    assert grp["2"].shape == (200, 3, 3, 3)

    attrs = CompressionAttrs(
        harmonics=2, period=10.0, mos=1, shift=False, complex_size=2.0, max_exp=138
    )
    grp = create_cuboid_group(f, "p_c", [(8, 6, 4)], 200, attrs=attrs)
    # row_x = ceil(8*2)*2 = 32; Nc = 20
    assert grp["1"].shape == (20, 4, 6, 32)
    assert grp["1"].attrs["c_harmonics"] == 2
    f.close()


def test_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    nx, ny, nz = 6, 5, 4
    shape = (nz, ny, nx)
    rng = np.random.default_rng(0)
    mk = lambda: jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    state = SimState(
        p=mk(), ux_sgx=mk(), uy_sgy=mk(), uz_sgz=mk(),
        rho_x=mk(), rho_y=mk(), rho_z=mk(),
    )
    coeffs = {"p_c": (rng.standard_normal(24).astype(np.float32),
                      rng.standard_normal(24).astype(np.float32))}
    path = str(tmp_path / "ckpt.h5")
    write_checkpoint(path, state, t_index=42, grid_shape=(nx, ny, nz),
                     stream_coeffs=coeffs)
    back = read_checkpoint(path)
    assert back["t_index"] == 42
    assert back["grid_shape"] == (nx, ny, nz)
    np.testing.assert_array_equal(back["fields"]["p"], np.asarray(state.p))
    np.testing.assert_array_equal(back["fields"]["uz_sgz"], np.asarray(state.uz_sgz))
    b1, b2 = back["stream_coeffs"]["p_c"]
    np.testing.assert_array_equal(b1, coeffs["p_c"][0])
    np.testing.assert_array_equal(b2, coeffs["p_c"][1])
    with h5py.File(path, "r") as f:
        assert read_attr(f, names.FILE_TYPE) == "checkpoint"
        assert "Temp_p_c_1" in f and "Temp_p_c_2" in f


def test_run_info_attributes(tmp_path):
    """Execution-statistics attribute block on the output file (writeOutputDataInfo parity)."""
    import jax.numpy as jnp
    from kwave_tpu.driver import RunConfig, run_simulation
    from kwave_tpu.io.input_file import InputData as ID2

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=20)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    data = ID2(
        grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
        pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3,
        sensor_mask_index=np.arange(10, dtype=np.int64), p0=p0,
    )
    out = str(tmp_path / "out.h5")
    import kwave_tpu.utils.observability as obs
    orig = obs._peak_device_mb
    obs._peak_device_mb = lambda: 123.5  # CPU backends report no device stats
    try:
        run_simulation(data, RunConfig(flags=dict(p_raw=True)), out)
    finally:
        obs._peak_device_mb = orig
    with h5py.File(out) as f:
        for attr in ("total_execution_time", "simulation_phase_execution_time",
                     "average_sampling_iteration_time", "sampling_time",
                     "number_of_cpu_cores", "simulation_peak_host_memory_in_use",
                     "simulation_peak_device_memory_in_use"):
            assert attr in f.attrs, attr
        assert f.attrs["total_execution_time"] > 0
        assert f.attrs["simulation_peak_device_memory_in_use"] == 123.5


def test_whole_domain_and_final_dataset_shapes(tmp_path):
    """_all/_final datasets keep the full source-matrix dims (nz, ny, nx) with one-z-slab
    chunks — WholeDomainOutputStream::create (WholeDomainOutputStream.cpp:78-99; HDF5 dim
    reversal Hdf5File.cpp:321-323; format table main.cpp:648-650)."""
    from kwave_tpu.io.output_file import create_field_dataset

    f = create_output_file(str(tmp_path / "o.h5"))
    ds3 = create_field_dataset(f, "p_max_all", (8, 12, 16))
    assert ds3.shape == (8, 12, 16)
    assert ds3.chunks == (1, 12, 16)
    ds2 = create_field_dataset(f, "p_final", (12, 16))  # 2D field -> nz = 1
    assert ds2.shape == (1, 12, 16)
    assert ds2.chunks == (1, 12, 16)
    f.close()


def test_driver_writes_field_shaped_all_and_final(tmp_path):
    """End-to-end: the driver's _max_all/_final outputs land as full-field datasets."""
    import jax.numpy as jnp  # noqa: F401

    from kwave_tpu.driver import RunConfig, run_simulation

    grid = Grid(nx=16, ny=12, nz=8, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=20)
    p0 = np.zeros(grid.shape, np.float32)
    p0[4, 6, 8] = 1e5
    mask = np.sort(np.random.default_rng(0).choice(grid.n_elements, 16, replace=False))
    data = InputData(
        grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
        pml_size=(2, 2, 2), pml_alpha=(2.0,) * 3,
        sensor_mask_index=mask, p0=p0,
    )
    out = str(tmp_path / "o.h5")
    run_simulation(
        data, RunConfig(flags=dict(p_max_all=True, p_min_all=True, p_final=True,
                                   u_final=True)), out
    )
    with h5py.File(out, "r") as f:
        for name in ("p_max_all", "p_min_all", "p_final", "ux_final"):
            assert f[name].shape == (8, 12, 16), name
            assert f[name].chunks == (1, 12, 16), name
        # the final snapshot equals... p_max_all >= p_final everywhere
        assert (np.asarray(f["p_max_all"]) >= np.asarray(f["p_final"])).all()


def _reset_attr(f, name, value):
    # attrs.modify keeps the existing fixed-length string type (truncating longer
    # values); recreate the attribute at the new value's length instead
    del f.attrs[name]
    f.attrs.create(name, np.bytes_(value.encode()))


class TestInputHeaderValidation:
    """Opening the wrong kind of file as input fails fast with a named reason
    (Hdf5FileHeader.h:201-348 parity: file_type + major/minor checked on open)."""

    def _grid_file(self, tmp_path, mutate):
        path, _data = _toy_input(tmp_path, with_sources=False)
        with h5py.File(path, "r+") as f:
            mutate(f)
        return path

    def test_checkpoint_file_as_input_names_the_problem(self, tmp_path):
        path = self._grid_file(
            tmp_path,
            lambda f: _reset_attr(f, names.FILE_TYPE, "checkpoint"),
        )
        with pytest.raises(ValueError, match="'checkpoint' file.*not.*'input'"):
            read_input_file(path)

    def test_output_file_as_input_suggests_post(self, tmp_path):
        path = self._grid_file(
            tmp_path,
            lambda f: _reset_attr(f, names.FILE_TYPE, "output"),
        )
        with pytest.raises(ValueError, match="--post"):
            read_input_file(path)

    def test_unsupported_version_rejected(self, tmp_path):
        path = self._grid_file(
            tmp_path,
            lambda f: _reset_attr(f, names.MAJOR_VERSION, "2"),
        )
        with pytest.raises(ValueError, match=r"version 2\.1.*supports.*1\.0, 1\.1"):
            read_input_file(path)

    def test_headerless_file_rejected(self, tmp_path):
        path = str(tmp_path / "plain.h5")
        with h5py.File(path, "w") as f:
            f.create_dataset("x", data=np.zeros(3))
        with pytest.raises(ValueError, match="no 'file_type' attribute"):
            read_input_file(path)

    def test_v10_input_still_accepted(self, tmp_path):
        # version 1.0 inputs are valid (the reference accepts both minors)
        path = self._grid_file(
            tmp_path,
            lambda f: _reset_attr(f, names.MINOR_VERSION, "0"),
        )
        data = read_input_file(path)
        assert data.grid.nx == 16


def test_compression_level_gzip_outputs(tmp_path):
    """-c N: output datasets are gzip-deflated at the requested level with
    identical contents (Hdf5File::createDataset compression parity — the '≤
    reference size' acceptance depends on matching deflate behavior)."""
    from kwave_tpu.driver import RunConfig, run_simulation

    grid = Grid(nx=16, ny=16, nz=16, dx=1e-4, dy=1e-4, dz=1e-4, dt=2e-8, nt=40)
    p0 = np.zeros(grid.shape, np.float32)
    p0[8, 8, 8] = 1e5
    mask = np.sort(np.random.default_rng(3).choice(grid.n_elements, 40,
                                                   replace=False))
    data = InputData(grid=grid, medium=Medium(c0=1500.0, rho0=1000.0),
                     pml_size=(4, 4, 4), pml_alpha=(2.0,) * 3,
                     sensor_mask_index=mask.astype(np.int64), p0=p0)
    plain, packed = str(tmp_path / "c0.h5"), str(tmp_path / "c6.h5")
    run_simulation(data, RunConfig(flags=dict(p_raw=True, p_c=True),
                                   period=10.0, harmonics=2), plain)
    run_simulation(data, RunConfig(flags=dict(p_raw=True, p_c=True),
                                   period=10.0, harmonics=2,
                                   compression_level=6), packed)
    with h5py.File(plain) as f0, h5py.File(packed) as f6:
        for name in ("p", "p_c"):
            assert f0[name].compression is None
            assert f6[name].compression == "gzip"
            assert f6[name].compression_opts == 6
            np.testing.assert_array_equal(np.asarray(f0[name]),
                                          np.asarray(f6[name]), err_msg=name)
        # no size assertion: at this fixture size gzip legitimately inflates
        # per-chunk storage (fp32 wave data in 1-row chunks — HDF5 behaves the
        # same for the reference); the contract is the filter + identical data
