"""Utilities: logging, phase timing, run metadata (Logger/, Utils/TimeMeasure.h parity)."""

from kwave_tpu.utils.observability import Logger, PhaseTimers, write_run_info

__all__ = ["Logger", "PhaseTimers", "write_run_info"]
