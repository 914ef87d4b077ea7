"""CLI parameter surface — the full kspaceFirstOrder-CUDA flag set as argparse.

Mirrors CommandLineParameters (Parameters/CommandLineParameters.cpp:253-299 getopt loop;
flag docs main.cpp:196-307): same long-option names, same semantics (e.g. `-s` is 1-based,
`-c` is the output-file gzip level, `--benchmark` truncates Nt). GPU/thread selection flags
(-g/-t) are accepted for drop-in compatibility and ignored — device binding is JAX's.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Optional

from kwave_tpu.driver import RunConfig


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="kspaceFirstOrder-TPU",
        description="Fluid k-space first-order simulator (TPU, JAX) with on-the-fly "
        "compression — capability-equivalent to kspaceFirstOrder-CUDA v1.3",
    )
    p.add_argument("-i", "--input_file", required=True, help="HDF5 input file")
    p.add_argument("-o", "--output_file", required=True, help="HDF5 output file")
    p.add_argument("-r", "--progress_interval", type=int, default=5,
                   help="progress print interval in %%")
    p.add_argument("-t", "--threads", type=int, default=None,
                   help="(compat; ignored — XLA manages threads)")
    p.add_argument("-g", "--gpu_id", type=int, default=None,
                   help="(compat; ignored — JAX device binding)")
    p.add_argument("--devices", type=int, default=None, metavar="N",
                   help="run multi-chip over the first N jax devices "
                        "(z-sharded fields + pencil FFT); default single device, "
                        "or ALL global devices under a multi-process launch")
    # multi-host launch (POD_RUNBOOK.md; no reference analogue — it is single-GPU)
    p.add_argument("--distributed", action="store_true",
                   help="jax.distributed.initialize() with TPU-pod auto-detection "
                        "(one process per host; Cloud TPU metadata supplies "
                        "coordinator/rank)")
    p.add_argument("--coordinator", default=None, metavar="HOST:PORT",
                   help="distributed coordinator address (with --num_processes)")
    p.add_argument("--num_processes", type=int, default=None, metavar="N",
                   help="total process count for explicit multi-host launch")
    p.add_argument("--process_id", type=int, default=None, metavar="R",
                   help="this process's rank for explicit multi-host launch")
    p.add_argument("-c", "--compression_level", type=int, default=0,
                   help="output HDF5 gzip level 0-9")
    p.add_argument("-s", "--sampling_start", type=int, default=1,
                   help="first sampled timestep (1-based, as the reference)")
    p.add_argument("--benchmark", type=int, default=None, metavar="STEPS",
                   help="run only STEPS timesteps")
    p.add_argument("--verbose", type=int, default=0, choices=[0, 1, 2])
    p.add_argument("--version", action="store_true")

    p.add_argument("--checkpoint_file", default=None)
    p.add_argument("--checkpoint_interval", type=int, default=None, metavar="SECONDS")
    p.add_argument("--checkpoint_timesteps", type=int, default=None, metavar="STEPS")
    p.add_argument("--copy_sensor_mask", action="store_true",
                   help="copy the sensor mask into the output file")

    # pressure streams
    p.add_argument("-p", "--p_raw", action="store_true")
    for f in ("p_c", "p_rms", "p_max", "p_min", "p_max_all", "p_min_all", "p_final"):
        p.add_argument(f"--{f}", action="store_true")
    # velocity streams
    p.add_argument("-u", "--u_raw", action="store_true")
    for f in ("u_c", "u_non_staggered_raw", "u_non_staggered_c", "u_rms", "u_max",
              "u_min", "u_max_all", "u_min_all", "u_final"):
        p.add_argument(f"--{f}", action="store_true")
    # intensity / Q term
    for f in ("I_avg", "I_avg_c", "Q_term", "Q_term_c"):
        p.add_argument(f"--{f}", action="store_true")
    p.add_argument("--post", action="store_true",
                   help="post-processing only on an existing output file")
    p.add_argument("--block_size", type=int, default=None,
                   help="I/O block size for post-processing")

    # compression configuration
    p.add_argument("--frequency", type=float, default=None,
                   help="source frequency [Hz]; period = 1/(dt*frequency)")
    p.add_argument("--period", type=float, default=None,
                   help="compression basis period in timesteps")
    p.add_argument("--mos", type=int, default=1, help="multiple of overlap size")
    p.add_argument("--harmonics", type=int, default=1)
    p.add_argument("--no_overlap", action="store_true",
                   help="no-overlap compression windows")
    p.add_argument("--40-bit_complex", dest="bit40", action="store_true",
                   help="store coefficients in the packed 40-bit format")

    # TPU spectral-engine knobs (no reference counterpart — cuFFT is fixed there;
    # the mxfft base/precision policy is measured in BASELINE.md)
    p.add_argument("--fft_precision", choices=["auto", "highest", "high"],
                   default="auto",
                   help="spectral precision: highest = full fp32 emulation "
                        "(reference fidelity), high = 3-pass bf16 (1.5-2.1x "
                        "faster at >=256 axes; accumulated field divergence vs "
                        "highest SATURATES at ~1e-3..4e-3 rel — it does not grow "
                        "with record length; BASELINE.md drift curves). "
                        "auto (default): high for >=256-axis grids, highest below")
    p.add_argument("--mxfft", dest="matmul_fft", action="store_const", const=True,
                   default=None,
                   help="force the MXU matmul FFT on (default: auto by grid size "
                        "and precision)")
    p.add_argument("--no-mxfft", dest="matmul_fft", action="store_const", const=False,
                   help="force the MXU matmul FFT off")
    p.add_argument("--fft_direct_base", type=int, default=None,
                   help="mxfft dense base-DFT size override (default: auto policy)")
    return p


def args_to_run_config(args, dt: Optional[float] = None) -> RunConfig:
    """argparse Namespace -> driver RunConfig (the Parameters::init digest,
    Parameters.cpp:113-154,461-552)."""
    flags = {
        k: getattr(args, k)
        for k in (
            "p_raw", "p_c", "p_rms", "p_max", "p_min", "p_max_all", "p_min_all",
            "p_final", "u_raw", "u_c", "u_non_staggered_raw", "u_non_staggered_c",
            "u_rms", "u_max", "u_min", "u_max_all", "u_min_all", "u_final",
        )
    }
    period = args.period
    if period is None and args.frequency is not None:
        if dt is None:
            raise ValueError("--frequency needs the input file's dt")
        period = 1.0 / (args.frequency * dt)  # Parameters.cpp:473-485
    return RunConfig(
        flags=flags,
        i_avg=args.I_avg,
        i_avg_c=args.I_avg_c,
        q_term=args.Q_term,
        q_term_c=args.Q_term_c,
        mode40=args.bit40,
        no_overlap=args.no_overlap,
        period=period,
        mos=args.mos,
        harmonics=args.harmonics,
        sampling_start=max(args.sampling_start - 1, 0),  # 1-based CLI -> 0-based
        compression_level=args.compression_level,
        checkpoint_file=args.checkpoint_file,
        checkpoint_interval_steps=args.checkpoint_timesteps,
        checkpoint_interval_seconds=args.checkpoint_interval,
        block_size=args.block_size,
        progress_interval=args.progress_interval,
        benchmark_steps=args.benchmark,
        matmul_fft=args.matmul_fft,
        fft_precision=None if args.fft_precision == "auto" else args.fft_precision,
        fft_direct_base=args.fft_direct_base,
    )
