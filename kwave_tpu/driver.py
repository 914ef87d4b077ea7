"""Simulation driver: chunked main loop fusing solver steps, sensor sampling, and stream
processing into one jitted window function.

TPU-first restructuring of KSpaceFirstOrderSolver::compute/computeMainLoop
(KSpaceSolver/KSpaceFirstOrderSolver.cpp:268-943): instead of the reference's per-step
device->host zero-copy flush with one-step delay (:1060-1093), the loop runs in aligned
oSize-step windows — each window is ONE device program (lax.scan over the window) that
returns the raw sample rows and exactly one coefficient frame per compressed stream; the
host then appends those to HDF5 while the next window computes.

Two sampling strategies (identical results):
- "ys": per-step gather emitted as scan outputs (default);
- "carry": gather written into a carried window buffer via dynamic_update_slice — works
  around a remote-compile pathology of the axon TPU tunnel with gather+ys scans.
"""

from __future__ import annotations

import dataclasses
import functools
import time as _time
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from kwave_tpu import streams as streams_mod
from kwave_tpu.basis import CompressionBasis, find_period, generate_basis
from kwave_tpu.io import checkpoint as ckpt_io
from kwave_tpu.io import create_output_file
from kwave_tpu.io.input_file import InputData
from kwave_tpu.sampling import sample_index
from kwave_tpu.solver import (
    SimState,
    SolverConfig,
    Sources,
    init_state,
    make_operators,
    shifted_velocity,
    step,
)
from kwave_tpu.streams import StreamSpec, StreamWriter

@dataclasses.dataclass
class RunConfig:
    """Driver-level knobs (CLI surface, CommandLineParameters)."""

    flags: dict[str, bool]  # stream flags (streams.StreamSpec.from_flags keys)
    i_avg: bool = False  # --I_avg: time-averaged intensity from raw series
    i_avg_c: bool = False  # --I_avg_c: intensity from coefficient space
    q_term: bool = False  # --Q_term
    q_term_c: bool = False  # --Q_term_c
    mode40: bool = False
    no_overlap: bool = False  # --no_overlap (also auto-forced for short records)
    period: Optional[float] = None  # None -> auto-detect from p_source_input
    mos: int = 1
    harmonics: int = 1
    sampling_start: int = 0  # -s flag, 0-based
    compression_level: int = 0
    checkpoint_file: Optional[str] = None
    checkpoint_interval_steps: Optional[int] = None
    checkpoint_interval_seconds: Optional[float] = None
    block_size: Optional[int] = None  # --block_size: post-processing I/O block (elements)
    progress_interval: int = 5  # -r flag: progress print interval in percent
    benchmark_steps: Optional[int] = None  # --benchmark: Nt truncation, recorded in attrs
    data_load_seconds: float = 0.0  # input-file read time measured by the CLI
    # MXU matmul FFT (ops.mxfft) instead of XLA's FFT for the solver's spectral work.
    # None = auto: on TPU, single-device, radix-supported grids with a >=256 axis
    # (where XLA's full-DFT-matmul FFT is the measured bottleneck, tools/bench_fft.py).
    matmul_fft: Optional[bool] = None
    # Spectral-engine precision. "highest" = 6-pass full-fp32 emulation (~1e-7
    # relative per transform, cuFFT-like, the reference-fidelity mode); "high" =
    # 3-pass bf16 (1.5-2.1x faster at >=256 axes). None = auto
    # (_auto_fft_precision): "high" for >=256-axis grids, "highest" below —
    # justified by the measured ACCUMULATED error (tools/bench_precision_drift.py,
    # BASELINE.md r5): the high-vs-highest field divergence SATURATES (dissipative
    # driven steady state), it does not compound linearly — 64^3 plateaus at
    # 1.2e-3 rel by step 300, 128^3 at 2.2e-3, 256^3 at a few 1e-3 — so the perf
    # mode is safe at production record lengths (10^4+ steps).
    fft_precision: Optional[str] = None
    # mxfft base-DFT size. None = auto (_auto_direct_base): at precision "high"
    # every >=256 c2c axis runs ONE dense full-DFT matmul (no butterfly levels) —
    # each dropped level removes a full materializing HBM pass over the spectrum,
    # measured 22.4 -> 18.9 ms/step at 256^3 and 464 -> 226 at 512^3. At
    # "highest" (6 emulation passes) the dense contraction is MXU-bound and
    # LOSES (92 ms at 256^3), so that mode keeps the 128 base.
    fft_direct_base: Optional[int] = None
    # Regenerate radially-symmetric spectral operators / c0-derived media on device
    # instead of storing full 3D arrays (make_operators(compact=True)).
    # None = auto: grids >= 192^3 equivalent (saves ~2.3 GB resident at 512^3).
    compact_operators: Optional[bool] = None
    # Fused z-stage spectral multiply (ops.zfuse): z-DFT -> operator -> z-IDFT in
    # one Pallas kernel, operators generated in-kernel from per-axis vectors.
    # MEASURED SLOWER than XLA's dense-base pipeline at 512^3 (287-311 vs
    # 226 ms/step — the per-block Mosaic matmuls lose more than the saved
    # z-stage HBM passes gain; BASELINE.md). Default OFF; kept as an explicit
    # opt-in for future kernel iterations.
    fuse_z: Optional[bool] = None


def _auto_fft_precision(shape: tuple) -> str:
    """Default spectral precision by grid size (r4 VERDICT #4 resolution).

    >=256 axes: "high" — the dense-base 3-pass engine is 1.5x faster at 256^3
    (18.9 vs 28.4 ms/step) and 1.6x at 512^3 (226 vs 360), and the measured
    accumulated divergence vs "highest" SATURATES at a few 1e-3 relative
    (it does not grow linearly with step count; tools/bench_precision_drift.py
    curves in BASELINE.md). <256: "highest" — small grids are fast anyway and
    keep reference-fidelity numerics by default ("high" remains the documented
    CLI opt-in there, worth ~2x via mxfft auto-enable at 64+)."""
    return "high" if max(int(n) for n in shape) >= 256 else "highest"


def _auto_mxfft_min_axis(fft_precision: str) -> int:
    """Smallest max-axis at which mxfft auto-enables (measured,
    tools/bench_solver.py 2026-08-21). At precision "high" the dense-base
    matmul FFT beats jnp.fft across the WHOLE reference envelope (64^3:
    0.41 vs 0.77 ms/step; 128^3: 1.20 vs 2.32; axes <=128 hit the dense base
    with no butterflies even at the default base). At "highest" the 6-pass
    emulation only pays off from 256 up (r2 measurements)."""
    return 64 if fft_precision == "high" else 256


def _auto_direct_base(shape: tuple, fft_precision: str) -> Optional[int]:
    """mxfft base-DFT auto-pick (measured, tools/bench_solver.py 2026-08-21).

    At precision "high" (3 bf16 passes) the dense full-DFT base wins for every
    >=256 axis: each skipped radix-2 level removes a full materializing HBM pass
    over the spectrum, worth far more than the extra MXU flops (256^3:
    22.4 -> 18.9 ms/step with base 256; 512^3: 464 -> 331 with base 256 ->
    226 with base 512). At "highest" the 6 emulation passes double the MXU cost
    and the crossover moves up one size: dense loses at 256^3 (92 vs 28 ms) but
    still wins at 512^3 (360 vs 492 — the saved 1-GB spectrum passes dominate
    even 6-pass matmuls there)."""
    m = max(int(n) for n in shape[:-1])
    floor = 256 if fft_precision == "high" else 512
    return m if m >= floor else None


def detect_period(data: InputData, run: RunConfig) -> Optional[float]:
    """Period from --frequency/--period or auto-detected on the tail of the source signal
    (Parameters::readScalarsFromInputFile, Parameters.cpp:473-513: last <=500 samples of the
    middle column of p_source_input).

    A detected period is cached back into the input file as a `period` attribute
    on p_source_input (Parameters.cpp:510-511) so later legs / re-runs skip the
    detection pass; `InputData.cached_period` carries a previously cached value."""
    if run.period is not None:
        return run.period
    if data.cached_period is not None and data.cached_period > 0:
        return float(data.cached_period)
    sig = data.p_source_input
    from_p_source = sig is not None
    if sig is None:
        if data.transducer_source_input is not None:
            sig = data.transducer_source_input
        else:
            return None
    if sig.ndim == 2:
        sig = sig[sig.shape[0] // 2]
    tail = np.asarray(sig[-500:], np.float32)
    period = float(find_period(tail))
    if from_p_source and data.source_path is not None and jax.process_index() == 0:
        try:
            import h5py

            from kwave_tpu.io import names

            with h5py.File(data.source_path, "r+") as f:
                f[names.P_SOURCE_INPUT].attrs["period"] = np.float32(period)
            data.cached_period = period
        except OSError:
            pass  # read-only input file: detection simply runs again next leg
    return period


def _gather_sources(state: SimState, ops, mask, wanted: list[str], fft=None):
    from kwave_tpu.solver.step import LOCAL_FFT

    row = {}
    shifted = None
    for src_name in wanted:
        if src_name == "p":
            row["p"] = sample_index(state.p.reshape(-1), mask)
        elif src_name in ("ux_sgx", "uy_sgy", "uz_sgz"):
            row[src_name] = sample_index(getattr(state, src_name).reshape(-1), mask)
        elif src_name.endswith("_shifted"):
            if shifted is None:
                shifted = shifted_velocity(state, ops, fft or LOCAL_FFT)
            ax = {"ux_shifted": 0, "uy_shifted": 1, "uz_shifted": 2}[src_name]
            row[src_name] = sample_index(shifted[ax].reshape(-1), mask)
    return row


def make_window_fn(
    specs: list[StreamSpec],
    basis: Optional[CompressionBasis],
    cfg: SolverConfig,
    o_size: int,
    n_sensors: int,
    strategy: str = "ys",
    ops=None,
    src=None,
    mask=None,
    fft=None,
    n_steps: Optional[int] = None,
    emit: bool = True,
    peel_p0: bool = False,
):
    """Jitted window program: (sim_state, stream_states, t0[, ops, src, mask]) ->
    (sim_state, stream_states, emissions). Runs o_size solver steps, gathers every wanted
    source each step, then advances all streams one window.

    When ``ops``/``src``/``mask`` are given they are staged on device once here and
    bound as run-constant device arguments of the compiled window. (Host-numpy args
    would re-upload per call — ~25x slower over the axon tunnel; closure constants
    would inline them into the HLO — hundreds of MB at 256^3, rejected by the remote
    compiler. See make_simulate_fn.) The explicit argument-passing form (all three
    None) remains for sharded multi-chip callers that device_put operators with their
    own shardings.

    ``n_steps``/``emit`` build the trailing-partial-window program: fewer than oSize
    steps, compressed streams accumulate without emitting (streams.process_chunk).

    ``peel_p0`` builds the FIRST-window variant of a p0 run: step t==0 is the
    state-independent addInitialPressureSource result
    (KSpaceFirstOrderSolver.cpp:925-928, 2359-2400 — the reference applies p0 once),
    so it is computed ONCE at the top of the program and the scan covers steps
    1..steps-1. The scanned step carries neither a lax.cond p0 branch nor a
    precomputed 7-field init state; ``cfg.p0_source_flag`` must be False."""
    steps = o_size if n_steps is None else n_steps
    if peel_p0:
        assert not cfg.p0_source_flag, "peel_p0 replaces the in-step p0 branch"
    wanted = streams_mod.needed_sources(specs)
    whole_domain = [s for s in specs if s.op in ("max_all", "min_all")]
    closed = ops is not None
    if closed:
        ops = jax.tree_util.tree_map(jnp.asarray, ops)
        src = jax.tree_util.tree_map(jnp.asarray, src)
        mask = jnp.asarray(mask)
    c_ops, c_src, c_mask = ops, src, mask
    from kwave_tpu.solver.step import LOCAL_FFT

    fft = fft or LOCAL_FFT

    def _fold_wd(wd, st):
        # per-step whole-domain extrema folded inside the scan (cudaSampleAll semantics,
        # OutputStreamsCudaKernels.cu:297-316)
        out = dict(wd)
        for s in whole_domain:
            field = getattr(st, _field_attr(s.source)).reshape(-1)
            out[s.name] = (
                jnp.maximum(wd[s.name], field) if s.op == "max_all"
                else jnp.minimum(wd[s.name], field)
            )
        return out

    def window_impl(sim_state, stream_states, t0, ops, src, mask):
        wd0 = {s.name: stream_states[s.name] for s in whole_domain}
        if peel_p0:
            from kwave_tpu.solver.step import add_initial_pressure

            st_first = add_initial_pressure(sim_state, ops, src.p0, fft)
            row0 = {w: v[None]
                    for w, v in _gather_sources(st_first, ops, mask, wanted,
                                                fft).items()}
            wd0 = _fold_wd(wd0, st_first)
            sim_start, scan_n, t_base = st_first, steps - 1, 1
        else:
            row0 = None
            sim_start, scan_n, t_base = sim_state, steps, 0

        # Whole-domain extrema fold the CARRY-IN state each iteration plus the
        # final carry after the scan — i.e. exactly the tensors the simulation
        # chain itself consumes. Folding the freshly computed step output instead
        # is NOT value-safe: XLA may rematerialize it per consumer with different
        # fusion (different FMA contraction), leaving max_all an ulp below the
        # final state (the reference reads one buffer, so max >= final is part of
        # its contract). The first iteration's carry-in is the pre-window state:
        # at the very start of sampling it precedes the first sampled step and is
        # excluded; in every later window it was folded by the previous window
        # (re-folding is harmless for max/min) — the peel's st_first is folded
        # into wd0 above.
        at_start = jnp.int32(cfg.sampling_start_index)

        def _fold_prev(wd, st, i):
            if not whole_domain:
                return wd
            folded = _fold_wd(wd, st)
            skip = (i == 0) & (t0 == at_start)
            return {k: jnp.where(skip, wd[k], folded[k]) for k in wd}

        if strategy == "carry":
            bufs = {w: jnp.zeros((steps, n_sensors), jnp.float32) for w in wanted}
            if row0 is not None:
                bufs = {w: bufs[w].at[0].set(row0[w][0]) for w in wanted}

            def body(carry, i):
                st, bufs, wd = carry
                wd = _fold_prev(wd, st, i)
                st = step(st, t0 + t_base + i, ops, src, cfg, fft)
                rows = _gather_sources(st, ops, mask, wanted, fft)
                bufs = {
                    w: lax.dynamic_update_slice(bufs[w], rows[w][None, :],
                                                (t_base + i, 0))
                    for w in wanted
                }
                return (st, bufs, wd), None

            (sim2, chunks, wd), _ = lax.scan(
                body, (sim_start, bufs, wd0), jnp.arange(scan_n)
            )
        else:

            def body(carry, i):
                st, wd = carry
                wd = _fold_prev(wd, st, i)
                st = step(st, t0 + t_base + i, ops, src, cfg, fft)
                return (st, wd), _gather_sources(st, ops, mask, wanted, fft)

            (sim2, wd), chunks = lax.scan(body, (sim_start, wd0), jnp.arange(scan_n))
            if row0 is not None:
                chunks = {w: jnp.concatenate([row0[w], chunks[w]], axis=0)
                          for w in wanted}
        if whole_domain:
            wd = _fold_wd(wd, sim2)  # the last state — the tensor p_final reads

        pre = dict(stream_states, **wd)
        new_states, emissions = streams_mod.process_chunk(
            pre, chunks, {}, specs, basis, emit=emit
        )
        return sim2, new_states, emissions

    # donate the carried simulation fields (callers always rebind the returned state;
    # saves a full state double-buffer — 3.5 GB at 512^3)
    jitted = jax.jit(window_impl, donate_argnums=(0,))
    if closed:

        def window(sim_state, stream_states, t0):
            return jitted(sim_state, stream_states, t0, c_ops, c_src, c_mask)

        return window

    return jitted


def _field_attr(source: str) -> str:
    return {"p": "p", "ux_sgx": "ux_sgx", "uy_sgy": "uy_sgy", "uz_sgz": "uz_sgz"}[source]


def run_simulation(
    data: InputData,
    run: RunConfig,
    output_path: str,
    strategy: str = "ys",
    resume_from: Optional[str] = None,
    mesh=None,
) -> dict[str, Any]:
    """Full compute(): load -> preprocess -> windowed main loop -> aggregates -> output.

    With ``mesh`` (a 1-axis jax.sharding.Mesh) the whole run is multi-chip: fields are
    z-sharded, spectral work goes through the pencil-decomposed distributed FFT, the
    remaining ops are GSPMD-partitioned, and the host writer gathers each window's
    emissions in sensor-index order (SURVEY.md §2.9 table).

    Returns a summary dict (dataset names -> shapes written)."""
    from kwave_tpu.utils.observability import (
        Logger,
        PhaseTimers,
        read_cumulated_times,
        write_run_info,
    )

    timers = PhaseTimers()
    timers.start("total")
    timers.set_elapsed("data_load", run.data_load_seconds)
    timers.start("preprocessing")

    # Multi-process SPMD: every process runs the identical compute; only process 0
    # owns the output file (the reference's single-writer flush,
    # BaseOutputStream.cpp:369-388, generalized). Host values cross the process
    # boundary through WriterGather: non-writer ranks ship only their addressable
    # shards to process 0 (DCN bytes per window ~ one shard per rank) and never
    # materialize a global row — _host() returns None on them, and every consumer
    # below is writer-gated.
    multiproc = jax.process_count() > 1
    is_writer = jax.process_index() == 0
    _gatherer = []

    def _host(tree):
        if multiproc:
            if not _gatherer:
                from kwave_tpu.parallel.distributed import WriterGather

                _gatherer.append(WriterGather())
            return _gatherer[0].gather(tree)
        return tree

    def _close_gather():
        if _gatherer:
            _gatherer.pop().close()
    try:

        grid, medium = data.grid, data.medium
        is3d = grid.dim == 3
        if mesh is not None and not is3d:
            # the multi-chip path z-shards fields + pencil-decomposes the FFT —
            # both 3D-only. 2D grids are small (<=512^2 = 1 MB fields) and run
            # single-device; without this guard the sharding dies in an obscure
            # device_put divisibility error.
            raise ValueError(
                "multi-chip meshes require a 3D grid (z-sharded fields + pencil "
                "FFT); this input is 2D — run without --devices / mesh"
            )

        flags = dict(run.flags)
        # I_avg/Q_term (raw mode) re-read the stored p / u_non_staggered series from the
        # output file after the run (computeAverageIntensities), so those dependency series
        # must be real saved datasets.
        if run.i_avg or run.q_term:
            flags["p_raw"] = True
            flags["u_non_staggered_raw"] = True
        # I_avg_c/Q_term_c accumulate intensity on the fly from the coefficient frames; the
        # dependency compressed streams run hidden (doNotSave) unless the user also asked for
        # them — the reference's hidden dependency streams (OutputStreamContainer.cpp:269-325).
        hidden_flags = set()
        if run.i_avg_c or run.q_term_c:
            for k in ("p_c", "u_non_staggered_c"):
                if not flags.get(k):
                    flags[k] = True
                    hidden_flags.add(k)

        specs = StreamSpec.from_flags(flags, is3d, run.mode40)
        ax_letters = ("x", "y", "z") if is3d else ("x", "y")
        if hidden_flags:
            hidden_names = set()
            if "p_c" in hidden_flags:
                hidden_names.add("p_c")
            if "u_non_staggered_c" in hidden_flags:
                hidden_names |= {f"u{a}_non_staggered_c" for a in ax_letters}
            specs = [
                dataclasses.replace(s, save=False) if s.name in hidden_names else s
                for s in specs
            ]
        if run.i_avg_c or run.q_term_c:
            for a in ax_letters:
                specs.append(StreamSpec(f"I{a}_avg_c", f"u{a}_shifted", "iavg_c",
                                        mode40=run.mode40))
        has_c = any(s.op == "c" for s in specs)
        basis = None
        if has_c:
            period = detect_period(data, run)
            if period is None:
                raise ValueError("compressed streams need --period/--frequency or a source "
                                 "signal for auto-detection")
            basis = generate_basis(period, run.mos, run.harmonics, normalize=True)
            # Too few sampled steps for overlapped compression -> auto-force no-overlap
            # (Parameters::init, Parameters.cpp:141-145: period >= Nt - samplingStart).
            overlap = not run.no_overlap
            if period >= grid.nt - run.sampling_start:
                overlap = False
            if not overlap:
                specs = [
                    dataclasses.replace(s, overlap=False) if s.op == "c" else s
                    for s in specs
                ]

        need_additive = (data.p_source_mode == 2 and data.p_source_flag) or (
            data.u_source_mode == 2 and data.u_source_flag_any()
        )
        from kwave_tpu.ops import mxfft as mxfft_mod

        fft_precision = run.fft_precision or _auto_fft_precision(grid.shape)
        compact = run.compact_operators
        if compact is None:
            compact = grid.n_elements >= 192**3
        use_mxfft = run.matmul_fft
        mesh_mxfft_ok = mesh is None or (grid.dim == 3 and mxfft_mod.supported(grid.shape))
        if use_mxfft and not mesh_mxfft_ok:
            # the mxfft-pencil composition needs a 3D radix-supported grid; an explicit
            # matmul_fft request would otherwise be silently ignored
            Logger.log(
                Logger.BASIC,
                "WARNING: matmul_fft=True is ignored on this mesh "
                "(mxfft-pencil needs a 3D radix-supported grid)",
            )
            use_mxfft = False
        if use_mxfft is None:
            use_mxfft = (
                jax.default_backend() == "tpu"
                and mxfft_mod.supported(grid.shape)
                and max(grid.shape) >= _auto_mxfft_min_axis(fft_precision)
                and mesh_mxfft_ok
            )
            if use_mxfft:
                Logger.log(
                    Logger.ADVANCED,
                    "  mxfft auto-enabled (matmul FFT, precision=%s%s)",
                    fft_precision,
                    ", pencil locals" if mesh is not None else "",
                )
        ops = make_operators(
            grid, medium, data.pml_size, data.pml_alpha,
            absorbing=data.absorbing,
            need_source_kappa=bool(need_additive),
            need_shift=streams_mod.needs_shifted_velocity(specs),
            nonuniform=data.nonuniform_maps if data.nonuniform else None,
            compact=bool(compact),
        )
        # Stage the operator set on device ONCE. Leaving them as host numpy would re-upload
        # every buffer on every window call (25x slower over the axon tunnel), while baking
        # them in as HLO constants blows up compilation at 256^3 — device-resident buffers
        # referenced by the executable are the fast path on both counts.
        fft = None
        if mesh is not None:
            from kwave_tpu.parallel import pencil_fft, shard_operators

            if use_mxfft:
                # the pencil's chip-local 1D legs run through the mxfft base-DFT
                # machinery (VERDICT r3 #7: the >=256 regime where mxfft wins is
                # exactly the regime multi-chip targets). Spectral operators are
                # permuted to mxfft's y/z bin order BEFORE sharding, so each y-shard
                # holds one contiguous block of the permuted order — the same blocks
                # the pencil's all_to_all trades.
                prec = {"high": lax.Precision.HIGH,
                        "highest": lax.Precision.HIGHEST}[fft_precision]
                direct = run.fft_direct_base
                if direct is None:
                    direct = _auto_direct_base(grid.shape, fft_precision)
                base = direct or mxfft_mod.BASE
                perms = {ax: mxfft_mod.perm(int(grid.shape[ax]), base)
                         for ax in (0, 1)}
                ops = mxfft_mod.permute_operators(ops, len(grid.shape), perms)
                fft = pencil_fft(mesh, grid.nx, engine="mxfft", precision=prec,
                                 base=base)
            else:
                fft = pencil_fft(mesh, grid.nx)
            ops = shard_operators(ops, len(grid.shape), mesh, grid=grid, pencil=True)
        else:
            if use_mxfft:
                # MXU matmul FFT with permuted spectral bin order; operators reordered
                # once here so the solver pays zero runtime for the permutation.
                from kwave_tpu.solver.step import FftOps

                prec = {"high": lax.Precision.HIGH,
                        "highest": lax.Precision.HIGHEST}[fft_precision]
                direct = run.fft_direct_base
                if direct is None:
                    direct = _auto_direct_base(grid.shape, fft_precision)
                rfftn_fn, irfftn_fn, ax_perms = mxfft_mod.make_fft_ops(
                    grid.shape, precision=prec, direct_base=direct
                )
                shift_fn = mxfft_mod.make_shift_ops(ops, grid.shape, precision=prec)
                # fused z-stage pipeline: needs the per-axis k^2 vectors (compact
                # mode) and dense y/z bases (canonical bin order — zfuse's layout
                # contract). The plan is built from HOST operator vectors here,
                # before staging.
                use_zfuse = run.fuse_z
                if use_zfuse is None:
                    use_zfuse = False  # measured slower than the dense-base pipeline
                elif use_zfuse and not (bool(compact) and grid.dim == 3):
                    Logger.log(Logger.BASIC,
                               "WARNING: fuse_z needs 3D compact operators; ignored")
                    use_zfuse = False
                spectral_multi = None
                if use_zfuse:
                    from kwave_tpu.ops import zfuse

                    spectral_multi = zfuse.make_pipeline(
                        grid.shape, ops.k2_z, ops.k2_y, ops.k2_x,
                        ops.c_ref_dt_2, precision=prec,
                    )
                    Logger.log(Logger.ADVANCED,
                               "  zfuse enabled (fused z-stage spectral multiply)")
                ops = mxfft_mod.permute_operators(ops, len(grid.shape), ax_perms)
                # batched=False: stacking the velocity-gradient transforms into one
                # batched mxfft call measured SLOWER at 256^3 (40.3 vs 28.4 ms/step)
                # and 512^3 (241 vs 226) — the jnp.stack materializations cost more
                # HBM traffic than the larger base-DFT batch saves in MXU issue.
                fft = FftOps(rfftn=rfftn_fn, irfftn=irfftn_fn, shift_axis=shift_fn,
                             spectral_multi=spectral_multi)
            ops = jax.tree_util.tree_map(jnp.asarray, ops)
        cfg = SolverConfig(
            nonlinear=data.nonlinear,
            absorbing=data.absorbing,
            p0_source_flag=data.p0 is not None,
            p_source_flag=data.p_source_flag,
            p_source_mode=data.p_source_mode,
            p_source_many=data.p_source_many,
            u_source_flag=max(data.ux_source_flag, data.uy_source_flag, data.uz_source_flag),
            u_source_mode=data.u_source_mode,
            u_source_many=data.u_source_many,
            transducer_source_flag=data.transducer_source_flag,
            sampling_start_index=run.sampling_start,
        )
        import contextlib

        from kwave_tpu.solver.step import LOCAL_FFT

        mesh_ctx = (lambda: mesh) if mesh is not None else contextlib.nullcontext
        src = Sources(
            p0=jnp.asarray(data.p0) if data.p0 is not None else None,
            p_index=jnp.asarray(data.p_source_index) if data.p_source_index is not None else None,
            p_signal=jnp.asarray(data.p_source_input) if data.p_source_input is not None else None,
            u_index=jnp.asarray(data.u_source_index) if data.u_source_index is not None else None,
            ux_signal=jnp.asarray(data.ux_source_input) if data.ux_source_input is not None else None,
            uy_signal=jnp.asarray(data.uy_source_input) if data.uy_source_input is not None else None,
            uz_signal=jnp.asarray(data.uz_source_input) if data.uz_source_input is not None else None,
            transducer_index=jnp.asarray(data.u_source_index)
            if data.transducer_source_flag and data.u_source_index is not None else None,
            transducer_signal=jnp.asarray(data.transducer_source_input)
            if data.transducer_source_input is not None else None,
            delay_mask=jnp.asarray(data.delay_mask) if data.delay_mask is not None else None,
        )

        cuboid_shapes = None
        if data.sensor_mask_index is not None:
            mask = jnp.asarray(data.sensor_mask_index.astype(np.int32))
        else:
            # cuboid corners -> one linearized index gather on device; the writer splits
            # emissions back into the reference's per-cuboid group layout
            # (CuboidOutputStream.cpp:656-722)
            mask = jnp.asarray(_corners_to_indices(data.sensor_mask_corners, grid))
            cuboid_shapes = [
                (int(x2 - x1 + 1), int(y2 - y1 + 1), int(z2 - z1 + 1))
                for x1, y1, z1, x2, y2, z2 in data.sensor_mask_corners
            ]
        n_sensors = int(mask.shape[0])

        sim_state = init_state(grid)
        if mesh is not None:
            from kwave_tpu.parallel import field_sharding, replicated, shard_state

            sim_state = shard_state(sim_state, mesh)

            def _put_src(x):
                if np.ndim(x) == len(grid.shape) and tuple(x.shape) == grid.shape:
                    return jax.device_put(x, field_sharding(mesh, len(grid.shape)))
                return jax.device_put(x, replicated(mesh))

            src = jax.tree_util.tree_map(_put_src, src)
            mask = jax.device_put(mask, replicated(mesh))
        t0 = 0
        ck = None
        if resume_from is not None:
            ck = ckpt_io.read_checkpoint(resume_from)
            # Recovery validation (the reference checks checkpoint dims against the input
            # grid on restore, KSpaceFirstOrderSolver::loadInputData,
            # KSpaceFirstOrderSolver.cpp:189-228) — a stale checkpoint from another run
            # would otherwise silently corrupt the output.
            ck_dims = tuple(int(v) for v in ck["grid_shape"])
            if ck_dims != (grid.nx, grid.ny, grid.nz):
                raise ValueError(
                    f"checkpoint file {resume_from!r} was written for grid "
                    f"{ck_dims} (nx, ny, nz) but the input file has "
                    f"({grid.nx}, {grid.ny}, {grid.nz})"
                )
            if not (0 <= int(ck["t_index"]) <= grid.nt):
                raise ValueError(
                    f"checkpoint t_index {ck['t_index']} outside the input's "
                    f"0..nt={grid.nt} range"
                )
            t0 = ck["t_index"]
            shp = grid.shape
            fd = ck["fields"]
            sim_state = SimState(
                p=jnp.asarray(fd["p"].reshape(shp)),
                ux_sgx=jnp.asarray(fd["ux_sgx"].reshape(shp)),
                uy_sgy=jnp.asarray(fd["uy_sgy"].reshape(shp)),
                uz_sgz=jnp.asarray(fd["uz_sgz"].reshape(shp)) if is3d else None,
                rho_x=jnp.asarray(fd["rhox"].reshape(shp)),
                rho_y=jnp.asarray(fd["rhoy"].reshape(shp)),
                rho_z=jnp.asarray(fd["rhoz"].reshape(shp)) if is3d else None,
            )
            if mesh is not None:
                from kwave_tpu.parallel import shard_state

                sim_state = shard_state(sim_state, mesh)

        # t==0 initial-pressure peel (the reference applies p0 once,
        # KSpaceFirstOrderSolver.cpp:925-928): the first step's post-state is the
        # state-independent addInitialPressureSource result, so it is hoisted out of
        # every scan — whichever program covers step 0 (lead-in, first window, or the
        # tail) computes it once at its top, and the scanned step NEVER carries the p0
        # branch (no per-step lax.cond, no 7-field precomputed init state in HBM).
        peel_pending = cfg.p0_source_flag and t0 == 0
        cfg = dataclasses.replace(cfg, p0_source_flag=False)

        sampled_steps = grid.nt - run.sampling_start
        o = basis.o_size if basis is not None else min(max(sampled_steps, 1), 64)
        stream_states = streams_mod.init_stream_states(specs, n_sensors, grid.n_elements, basis)

        if ck is not None:
            # reopen output RW and seek streams (reference recovery,
            # KSpaceFirstOrderSolver.cpp:186-228). Multi-process: every process restores
            # the IDENTICAL stream state (the encoder accumulators and aggregate buffers
            # feed collective computation and must agree across ranks), so the checkpoint
            # and output files must be visible on every host — the reference's
            # single-filesystem assumption generalized (shared FS / GCS on real pods).
            # Only process 0 holds the RW writer handle; other ranks read without taking
            # the HDF5 file lock so the writer's r+ open can proceed concurrently.
            import h5py

            sampled_done = max(t0 - run.sampling_start, 0)
            if is_writer:
                f = h5py.File(output_path, "r+")
                f_read = f
            else:
                f = None
                f_read = h5py.File(output_path, "r", locking=False)
            # the output file must belong to the same (interrupted) run: its raw datasets
            # are sized for the full record and must cover the rows already produced
            # (reference recovery consistency, KSpaceFirstOrderSolver.cpp:189-228)
            for s in specs:
                if s.op == "raw" and s.save and cuboid_shapes is None:
                    if s.name not in f_read:
                        raise ValueError(
                            f"output file {output_path!r} lacks dataset {s.name!r} "
                            "expected by the checkpointed run"
                        )
                    rows_total = f_read[s.name].shape[1]
                    if rows_total != sampled_steps or sampled_done > rows_total:
                        raise ValueError(
                            f"output dataset {s.name!r} has {rows_total} rows but the "
                            f"checkpoint expects {sampled_steps} total "
                            f"({sampled_done} done) — output/checkpoint mismatch"
                        )
            writer = (
                StreamWriter(
                    f, specs, n_sensors, grid.n_elements, sampled_steps, basis,
                    run.compression_level, reopen=True, rows_done=sampled_done,
                    cuboid_shapes=cuboid_shapes, field_shape=grid.shape,
                )
                if is_writer else None
            )
            stream_states = streams_mod.restore_stream_states(
                stream_states, ck["stream_coeffs"], specs, sampled_done, o
            )
            stream_states = streams_mod.restore_aggregates_from_file(
                stream_states, specs, f_read, sampled_done
            )
            timers.restore_cumulated(read_cumulated_times(f_read))
            if not is_writer:
                f_read.close()
        elif is_writer:
            f = create_output_file(output_path)
            writer = StreamWriter(
                f, specs, n_sensors, grid.n_elements, sampled_steps, basis,
                run.compression_level, cuboid_shapes=cuboid_shapes, field_shape=grid.shape,
            )
        else:  # non-writer process: full compute, no file
            f = None
            writer = None
        window = make_window_fn(specs, basis, cfg, o, n_sensors, strategy,
                                ops=ops, src=src, mask=mask, fft=fft)
        # simulation header (the reference's verbose run summary, printed by Logger at the
        # Advanced level — OutputMessages simulation-detail block)
        Logger.log(Logger.ADVANCED, "Simulation: %dD grid %dx%dx%d, nt=%d, dt=%.3e",
                   grid.dim, grid.nx, grid.ny, grid.nz, grid.nt, grid.dt)
        Logger.log(Logger.ADVANCED,
                   "  medium: %s, %s | sources: p0=%s p=%d u=%d transducer=%d",
                   "nonlinear" if cfg.nonlinear else "linear",
                   "absorbing" if cfg.absorbing else "lossless",
                   data.p0 is not None, cfg.p_source_flag, cfg.u_source_flag,
                   cfg.transducer_source_flag)
        Logger.log(Logger.ADVANCED, "  sensors: %d (%s mask) | streams: %s",
                   n_sensors, "cuboid" if cuboid_shapes is not None else "index",
                   ", ".join(s.name + ("" if s.save else " (hidden)") for s in specs))
        if basis is not None:
            Logger.log(Logger.ADVANCED,
                       "  compression: period=%.4g mos=%d harmonics=%d oSize=%d mode40=%s",
                       basis.period, basis.mos, basis.harmonics, basis.o_size, run.mode40)
        if mesh is not None:
            Logger.log(Logger.ADVANCED, "  mesh: %d devices (%s)",
                       mesh.devices.size, ",".join(map(str, mesh.axis_names)))
        timers.stop("preprocessing")
        timers.start("simulation")
        wall0 = _time.time()

        # lead-in: steps before sampling starts (reference skips storage until t >= s,
        # KSpaceFirstOrderSolver.cpp:1060-1068)
        t = t0
        if run.sampling_start > t:
            from kwave_tpu.solver import make_simulate_fn

            t_lead = _time.time()
            lead_from = t
            if peel_pending:
                from kwave_tpu.solver.step import add_initial_pressure

                init_fn = jax.jit(
                    lambda st, ops_, p0_: add_initial_pressure(
                        st, ops_, p0_, fft or LOCAL_FFT
                    ),
                    donate_argnums=(0,),
                )
                with mesh_ctx():
                    sim_state = init_fn(sim_state, ops, src.p0)
                peel_pending = False
                lead_from = t + 1
            if run.sampling_start > lead_from:
                lead = make_simulate_fn(ops, src, cfg, run.sampling_start - lead_from,
                                        fft=fft or LOCAL_FFT)
                with mesh_ctx():
                    sim_state, _ = lead(sim_state, jnp.int32(lead_from))
            jax.block_until_ready(sim_state.p)
            dt_lead = _time.time() - t_lead
            for _ in range(run.sampling_start - t):
                timers.add_iteration(dt_lead / (run.sampling_start - t), sampled=False)
            t = run.sampling_start

        n_windows = (grid.nt - t) // o
        interrupted = False
        pending = None  # one-window-delayed flush: host HDF5 writes of window w overlap the
        # device compute of window w+1 (the reference's delayed flushRawStreams,
        # KSpaceFirstOrderSolver.cpp:1065-1072, restructured at window granularity)
        window_first = window
        if peel_pending and n_windows > 0:
            # separate first-window program with the t==0 step peeled out of its scan
            window_first = make_window_fn(specs, basis, cfg, o, n_sensors, strategy,
                                          ops=ops, src=src, mask=mask, fft=fft,
                                          peel_p0=True)
            peel_pending = False
        for w in range(n_windows):
            t_it = _time.time()
            with mesh_ctx():
                sim_state, stream_states, emissions = (window_first if w == 0 else window)(
                    sim_state, stream_states, jnp.int32(t)
                )
            if pending is not None:
                pending = _host(pending)  # collective under multi-process: all ranks join
                if writer is not None:
                    writer.flush_emissions(pending)
            pending = emissions
            dt_it = _time.time() - t_it
            for _ in range(o):
                timers.add_iteration(dt_it / o, sampled=True)
            t += o
            Logger.progress(t - t0, grid.nt - t0, wall0, run.progress_interval)
            if run.checkpoint_file is not None and t < grid.nt and (
                (run.checkpoint_interval_steps is not None
                 and t - t0 >= run.checkpoint_interval_steps)
                or (run.checkpoint_interval_seconds is not None
                    and _time.time() - wall0 >= run.checkpoint_interval_seconds)
            ):
                # checkpoint leg boundary: elapsed-seconds or step-count trigger, first met
                # wins (isTimeToCheckpoint, Parameters.cpp:683; window granularity keeps the
                # encoder state frame-aligned)
                interrupted = True
                break

        if pending is not None:
            pending = _host(pending)
            if writer is not None:
                writer.flush_emissions(pending)
            pending = None
        if interrupted:
            # aggregates are persisted RAW at leg boundaries; only the final leg finalizes
            # (IndexOutputStream reopen/postProcess split)
            host_states = _host(stream_states)
            host_sim = _host(sim_state)
            if writer is not None:
                writer.flush_aggregates(streams_mod.raw_aggregates(host_states, specs))
            if is_writer:
                ckpt_io.write_checkpoint(
                    run.checkpoint_file,
                    jax.tree_util.tree_map(np.asarray, host_sim),
                    t,
                    (grid.nx, grid.ny, grid.nz),
                    stream_coeffs=streams_mod.stream_states_to_checkpoint(
                        host_states, specs, n_sensors
                    ),
                )
            summary = {}
            if writer is not None:
                summary = {
                    name: (ds.shape if hasattr(ds, "shape")
                           else {k: v.shape for k, v in ds.items()})
                    for name, ds in writer.datasets.items()
                }
            summary["__checkpointed_at__"] = (t,)
            timers.stop("simulation")
            timers.stop("total")
            if f is not None:
                write_run_info(f, timers, file_path=output_path)  # cumulated times, next leg
                f.close()
            return summary
        # trailing steps (< one window): every sampled step still feeds raw rows, aggregate
        # folds, and compressed accumulators (the reference's sample+accumulate runs each
        # step, IndexOutputStream.cpp:397-450); compressed frames are not emitted here
        rem = grid.nt - t
        if rem > 0:
            # peel_pending survives to here only when no window ran (nt < oSize):
            # the tail program is then the one covering step 0
            tail_fn = make_window_fn(specs, basis, cfg, o, n_sensors, strategy,
                                     ops=ops, src=src, mask=mask, fft=fft,
                                     n_steps=rem, emit=False, peel_p0=peel_pending)
            with mesh_ctx():
                sim_state, stream_states, tail_emissions = tail_fn(
                    sim_state, stream_states, jnp.int32(t)
                )
            tail_emissions = _host(tail_emissions)
            if writer is not None:
                writer.flush_emissions(tail_emissions)  # raw rows; `c` entries are None
            t += rem

        # tiny-record lastStep rule (IndexOutputStream.cpp:454-456): when the whole sampled
        # record fits inside one overlap window, force-emit the partial frame so the Nc=1
        # compressed dataset is not left empty; the emitted frame also feeds the
        # coefficient-space intensity accumulators (postSample, :313-337). Strictly
        # `< oSize`: at steps == oSize the saving boundary fires on the last step and the
        # window loop already emitted — the reference's `mSavingFlag || lastStep` emits
        # exactly once there, so a second partial here would double-count the frame
        # (corrupting I*_avg_c) and mis-seed compressed_step.
        if basis is not None and 0 < sampled_steps < o:
            from kwave_tpu import encoder as encoder_mod

            partial = {}
            for s in specs:
                if s.op != "c":
                    continue
                ecfg = encoder_mod.EncoderConfig.for_stream(
                    basis, s.shifted_basis, s.mode40, s.overlap
                )
                stream_states[s.name], frame = encoder_mod.emit_partial(
                    stream_states[s.name], ecfg
                )
                partial[s.name] = frame
            streams_mod.finalize_emissions(stream_states, partial, specs)
            partial = _host(partial)
            if writer is not None:
                writer.flush_emissions(partial)

        timers.stop("simulation")
        timers.start("postprocessing")
        host_states = _host(stream_states)
        if writer is not None:
            writer.flush_aggregates(
                streams_mod.finalize_aggregates(host_states, specs, sampled_steps,
                                                compressed_frames=sampled_steps // o)
            )
        finals = {
            s.name: getattr(sim_state, _field_attr(s.source))
            for s in specs if s.op == "final"
        }
        finals = _host(finals)
        if writer is not None:
            writer.flush_final_fields(finals)

        if run.checkpoint_file is not None:
            # end-of-run checkpoint carries the stream coefficient accumulators too — the
            # reference persists them on every checkpoint (BaseOutputStream.cpp:551-606)
            host_sim = _host(sim_state)
            if is_writer:
                ckpt_io.write_checkpoint(
                    run.checkpoint_file,
                    jax.tree_util.tree_map(np.asarray, host_sim),
                    t,
                    (grid.nx, grid.ny, grid.nz),
                    stream_coeffs=streams_mod.stream_states_to_checkpoint(
                        host_states, specs, n_sensors
                    ),
                )

        summary = {}
        if writer is not None:
            summary = {
                name: (ds.shape if hasattr(ds, "shape")
                       else {k: v.shape for k, v in ds.items()})
                for name, ds in writer.datasets.items()
            }
        if f is not None:
            f.close()

        mask_np = _host(mask)
        if is_writer and (run.i_avg or run.q_term):
            from kwave_tpu.postproc import post_process_output_file

            post_process_output_file(
                output_path, grid, mask_np,
                want_i_avg=run.i_avg, want_q_term=run.q_term, from_coeffs=False,
                block_size=run.block_size,
            )
        if is_writer and run.q_term_c:
            # I_avg_c was accumulated on the fly (iavg_c streams); Q term derives from it
            # (computeQTerm over the IAvgC data, KSpaceFirstOrderSolver.cpp:1016-1030)
            from kwave_tpu.postproc import q_term_from_intensity

            q_term_from_intensity(output_path, grid, mask_np, suffix="_c")

        timers.stop("postprocessing")
        timers.stop("total")
        if is_writer:
            import h5py

            with h5py.File(output_path, "r+") as fo:
                write_run_info(fo, timers, file_path=output_path)
                if run.benchmark_steps is not None:
                    # record the --benchmark Nt truncation so the output is not mistaken
                    # for a full run (the reference prints it; we persist it with the
                    # timing attrs)
                    from kwave_tpu.io.hdf5 import write_attr

                    write_attr(fo, "benchmark_time_steps", int(run.benchmark_steps))
        return summary
    finally:
        # the side channel must not leak on exceptions raised anywhere in the
        # run (r4 VERDICT Weak #6: a raise inside the window loop previously
        # left the socket open until interpreter GC)
        _close_gather()


def _corners_to_indices(corners: np.ndarray, grid) -> np.ndarray:
    """Cuboid corner list [N,6] (0-based inclusive) -> concatenated flat indices in cuboid
    scan order (z slab, y row, x fastest — transformCoordinates,
    OutputStreamsCudaKernels.cu:164-188)."""
    idx = []
    for x1, y1, z1, x2, y2, z2 in corners:
        zz, yy, xx = np.meshgrid(
            np.arange(z1, z2 + 1), np.arange(y1, y2 + 1), np.arange(x1, x2 + 1),
            indexing="ij",
        )
        idx.append((xx + grid.nx * (yy + grid.ny * zz)).reshape(-1))
    return np.concatenate(idx).astype(np.int32)
