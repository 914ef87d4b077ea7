"""Headline benchmark: on-the-fly compression codec throughput on one chip.

Prints ONE JSON line: {"metric": "codec_encode_decode", "value": <GB/s>, "unit": "GB/s",
"vs_baseline": <x over the reference-semantics CPU oracle>}.

Workload (BASELINE.json north star): pressure sensor series [T, N] fp32 at pressure
amplitudes, windowed-harmonic projection encode (the production float path — the same
coefficients the reference's OpenMP accumulate loop produces,
OutputStreams/IndexOutputStream.cpp:397-450) plus full decode (overlap-add reconstruction).
Throughput counts bytes-in for encode + bytes-out for decode over the measured wall time.

`vs_baseline` compares against the reference-CPU-oracle throughput recorded in BASELINE.md
(measured on this container with kwave_tpu.oracle.OracleEncoder, single process — the
faithful reimplementation of the reference CPU encode loop).
"""

import json
import time

import numpy as np

import jax
import jax.numpy as jnp

from kwave_tpu import decoder, encoder
from kwave_tpu.basis import generate_basis

# Reference-oracle float-mode encode throughput measured on this container's CPU
# (tools/measure_oracle.py: 0.881 GB/s float, 0.014 GB/s 40-bit; see BASELINE.md).
ORACLE_GBPS = 0.881

PERIOD = 20.0
HARMONICS = 2
T_STEPS = 4096
N_SENSORS = 16384  # 256 MB series


def make_series(t_steps: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(0)
    t = np.arange(t_steps, dtype=np.float32)[:, None]
    phase = rng.uniform(0, 2 * np.pi, n).astype(np.float32)[None, :]
    x = 1e5 * np.sin(2 * np.pi * t / PERIOD + phase)
    x += 1e4 * np.sin(4 * np.pi * t / PERIOD + 1.7 * phase)
    return x.astype(np.float32)


def main() -> None:
    cb = generate_basis(PERIOD, 1, HARMONICS, normalize=True)
    o = cb.o_size
    series = jnp.asarray(make_series(T_STEPS, N_SENSORS))
    n_frames = T_STEPS // o

    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)

    @jax.jit
    def roundtrip(x):
        f_re, f_im = encoder.encode_series_fast(x, cb)
        rec = decoder.reconstruct(f_re, f_im, tab_re, tab_im, o, T_STEPS)
        return f_re, f_im, rec

    # Scalar probe that forces full execution before timing stops. On remote backends
    # (the axon TPU tunnel) jax.block_until_ready returns before the device has actually
    # executed the enqueued programs, so timing must be closed by fetching a value that
    # data-depends on the final output (a 4-byte scalar; bulk fetches are tunnel-limited).
    probe = jax.jit(lambda a, b, c: jnp.sum(a) + jnp.sum(b) + jnp.sum(c))

    # warmup + correctness guard
    f_re, f_im, rec = roundtrip(series)
    float(probe(f_re, f_im, rec))
    err = float(
        jnp.max(jnp.abs(rec[2 * o : n_frames * o - 2 * o] - series[2 * o : n_frames * o - 2 * o]))
        / jnp.max(jnp.abs(series))
    )
    assert err < 0.02, f"roundtrip rel err {err}"

    reps = 30
    t0 = time.perf_counter()
    for _ in range(reps):
        out = roundtrip(series)
    float(probe(*out))  # device executes in enqueue order: waits for all reps
    dt = (time.perf_counter() - t0) / reps

    bytes_in = series.size * 4  # encode reads the series
    bytes_out = rec.size * 4  # decode writes the reconstruction
    gbps = (bytes_in + bytes_out) / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "codec_encode_decode",
                "value": round(gbps, 3),
                "unit": "GB/s",
                "vs_baseline": round(gbps / ORACLE_GBPS, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
