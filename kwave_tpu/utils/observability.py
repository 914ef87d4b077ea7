"""Logging, phase timers, and output-file run metadata.

Parity targets:
- `Logger` — 3 verbosity levels (Logger/Logger.h:57-126), centralized message formats.
- `PhaseTimers` — wall-clock phase timing with cumulated time across checkpoint legs
  (Utils/TimeMeasure.h:54-140; per-phase timers KSpaceFirstOrderSolver.cpp:275-432),
  split into sampling vs non-sampling iteration buckets (printStatistics :2742-2780).
- `write_run_info` — the output-file attribute block the reference writes per run
  (writeOutputDataInfo, KSpaceFirstOrderSolver.cpp:1100-1169: execution-time phases,
  average iteration times, host/peak-memory figures).
"""

from __future__ import annotations

import os
import sys
import time
from typing import Optional


class Logger:
    """Static logger with Basic/Advanced/Full levels (Logger.h:57-63)."""

    BASIC, ADVANCED, FULL = 0, 1, 2
    level = BASIC
    _out = sys.stdout

    @classmethod
    def log(cls, level: int, fmt: str, *args) -> None:
        if level <= cls.level:
            cls._out.write((fmt % args if args else fmt) + "\n")
            cls._out.flush()

    @classmethod
    def error(cls, fmt: str, *args) -> None:
        sys.stderr.write("ERROR: " + (fmt % args if args else fmt) + "\n")
        sys.stderr.flush()

    @classmethod
    def progress(cls, t: int, nt: int, t_start: float, interval_pct: int = 5) -> None:
        """Progress line with ETA from elapsed wall time (printStatistics ETA math,
        KSpaceFirstOrderSolver.cpp:2763-2775)."""
        if nt <= 0:
            return
        stride = max(nt * interval_pct // 100, 1)
        if t % stride and t != nt:
            return
        pct = 100.0 * t / nt
        elapsed = time.time() - t_start
        eta = elapsed / max(t, 1) * (nt - t)
        cls.log(cls.BASIC, "  progress %5.1f%%  elapsed %7.2fs  eta %7.2fs", pct,
                elapsed, eta)


class PhaseTimers:
    """Named phase stopwatches with cumulated-over-legs support (TimeMeasure.h:126-140)."""

    PHASES = ("data_load", "preprocessing", "simulation", "postprocessing", "total")

    def __init__(self):
        self._start: dict[str, float] = {}
        self._elapsed: dict[str, float] = {p: 0.0 for p in self.PHASES}
        self._cumulated: dict[str, float] = {p: 0.0 for p in self.PHASES}
        # iteration buckets (sampling vs non-sampling, :2742-2780)
        self.sampling_time = 0.0
        self.sampling_iters = 0
        self.non_sampling_time = 0.0
        self.non_sampling_iters = 0

    def start(self, phase: str) -> None:
        self._start[phase] = time.time()

    def stop(self, phase: str) -> float:
        dt = time.time() - self._start.pop(phase)
        self._elapsed[phase] += dt
        return dt

    def set_elapsed(self, phase: str, seconds: float) -> None:
        """Record a phase measured externally (e.g. data_load timed by the CLI before
        the driver's timer set exists)."""
        self._elapsed[phase] = float(seconds)

    def elapsed(self, phase: str) -> float:
        return self._elapsed[phase]

    def cumulated(self, phase: str) -> float:
        """This leg + previous legs (restored via `restore_cumulated`)."""
        return self._cumulated[phase] + self._elapsed[phase]

    def restore_cumulated(self, values: dict[str, float]) -> None:
        for k, v in values.items():
            if k in self._cumulated:
                self._cumulated[k] = float(v)

    def add_iteration(self, seconds: float, sampled: bool) -> None:
        if sampled:
            self.sampling_time += seconds
            self.sampling_iters += 1
        else:
            self.non_sampling_time += seconds
            self.non_sampling_iters += 1


def _peak_rss_mb() -> Optional[float]:
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmHWM:"):
                    return float(line.split()[1]) / 1024.0
    except OSError:
        pass
    return None


def _peak_device_mb() -> Optional[float]:
    """Peak HBM in use on the attached accelerator (TPU memory_stats); None on
    backends without the probe (CPU). At 512^3 the margin to device OOM is the
    single most load-bearing number a run can record."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats and "peak_bytes_in_use" in stats:
            return float(stats["peak_bytes_in_use"]) / (1 << 20)
    except Exception:
        pass
    return None


def write_run_info(h5file, timers: PhaseTimers, file_path: Optional[str] = None) -> None:
    """Write the reference's execution-statistics attribute block onto the output file
    root (writeOutputDataInfo, KSpaceFirstOrderSolver.cpp:1100-1169; attr names
    Hdf5FileHeader.cpp:79-88 + the sampling-split attrs :1157-1168)."""
    from kwave_tpu.io import names
    from kwave_tpu.io.hdf5 import write_attr

    write_attr(h5file, names.TOTAL_EXECUTION_TIME, timers.cumulated("total"))
    write_attr(h5file, names.DATA_LOAD_TIME, timers.cumulated("data_load"))
    write_attr(h5file, names.PREPROCESSING_TIME, timers.cumulated("preprocessing"))
    write_attr(h5file, names.SIMULATION_TIME, timers.cumulated("simulation"))
    write_attr(h5file, names.POSTPROCESSING_TIME, timers.cumulated("postprocessing"))
    if timers.sampling_iters:
        write_attr(h5file, "average_sampling_iteration_time",
                   timers.sampling_time / timers.sampling_iters)
        write_attr(h5file, "sampling_time", timers.sampling_time)
    if timers.non_sampling_iters:
        write_attr(h5file, "average_non-sampling_iteration_time",
                   timers.non_sampling_time / timers.non_sampling_iters)
        write_attr(h5file, "non-sampling_time", timers.non_sampling_time)
    peak = _peak_rss_mb()
    if peak is not None:
        # host-side peak (peak_core_memory_in_use + the GPU build's host attr,
        # Hdf5FileHeader.cpp:81 / Hdf5FileHeader.h:69)
        write_attr(h5file, names.PEAK_MEMORY, peak)
        write_attr(h5file, "simulation_peak_host_memory_in_use", peak)
    dev_peak = _peak_device_mb()
    if dev_peak is not None:
        # simulation_peak_device_memory_in_use (Hdf5FileHeader.h:70)
        write_attr(h5file, names.PEAK_DEVICE_MEMORY, dev_peak)
    write_attr(h5file, names.NUMBER_OF_CORES, os.cpu_count() or 1)
    if file_path is not None and os.path.exists(file_path):
        write_attr(h5file, "output_file_size_MB",
                   os.path.getsize(file_path) / (1 << 20))


def read_cumulated_times(h5file) -> dict[str, float]:
    """Reload previous legs' cumulated phase times from an output file
    (loadElapsedTimeFromOutputFile, KSpaceFirstOrderSolver.cpp:2898)."""
    from kwave_tpu.io import names

    mapping = {
        "total": names.TOTAL_EXECUTION_TIME,
        "data_load": names.DATA_LOAD_TIME,
        "preprocessing": names.PREPROCESSING_TIME,
        "simulation": names.SIMULATION_TIME,
        "postprocessing": names.POSTPROCESSING_TIME,
    }
    out = {}
    for phase, attr in mapping.items():
        if attr in h5file.attrs:
            out[phase] = float(h5file.attrs[attr])
    return out
