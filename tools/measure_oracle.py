"""Measure the reference-semantics CPU oracle encode throughput (fills BASELINE.md).

The oracle (kwave_tpu.oracle.OracleEncoder) reproduces the reference's per-step CPU
accumulate loop (IndexOutputStream.cpp:397-450) in vectorized NumPy — one complex MAC pair
per (step, sensor, harmonic), the same arithmetic the reference's OpenMP loop performs.
Run: python tools/measure_oracle.py
"""

import time

import numpy as np

import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kwave_tpu.basis import generate_basis
from kwave_tpu.oracle import OracleEncoder

PERIOD, HARMONICS = 20.0, 1
T, N = 1024, 8192


def run(mode40: bool) -> float:
    cb = generate_basis(PERIOD, 1, HARMONICS, normalize=True)
    rng = np.random.default_rng(0)
    t = np.arange(T, dtype=np.float32)[:, None]
    x = (1e5 * np.sin(2 * np.pi * t / PERIOD)
         + 1e3 * rng.standard_normal((T, N))).astype(np.float32)
    enc = OracleEncoder(cb, n_sensors=N, mode40=mode40, total_steps=T)
    t0 = time.perf_counter()
    enc.encode_series(x)
    dt = time.perf_counter() - t0
    return x.nbytes / dt / 1e9


if __name__ == "__main__":
    g_f = run(False)
    print(f"oracle float encode: {g_f:.4f} GB/s")
    g_40 = run(True)
    print(f"oracle 40-bit encode: {g_40:.4f} GB/s")
