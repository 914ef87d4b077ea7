"""Per-path codec throughput on the current backend (run on the real TPU chip).

Measures the production encode paths end-to-end over a long series:

- float fast (windowed-projection matmuls, encoder.encode_series_fast)
- float exact via Pallas fused windows (the driver's TPU path)
- float exact via the lax.fori_loop fallback
- 40-bit exact via Pallas fused windows (the driver's TPU path)
- 40-bit exact via the lax.fori_loop fallback

Throughput counts input bytes consumed per second (the reference-comparable metric:
BASELINE.md's oracle figures count the same). Timing closes with a scalar probe that
data-depends on the outputs (axon tunnel: block_until_ready returns early, bulk fetches
are tunnel-limited — see BASELINE.md methodology).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from kwave_tpu import encoder  # noqa: E402
from kwave_tpu.basis import generate_basis  # noqa: E402

PERIOD = 20.0
HARMONICS = 2
T_STEPS = 2048
N_SENSORS = 16384
REPS = 8


def _series(t, n):
    rng = np.random.default_rng(0)
    tt = np.arange(t, dtype=np.float32)[:, None]
    ph = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    return (1e5 * np.sin(2 * np.pi * tt / PERIOD + ph)).astype(np.float32)


def _time(fn, out_probe, reps=REPS):
    out = fn()
    float(out_probe(out))  # warmup + compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    float(out_probe(out))
    return (time.perf_counter() - t0) / reps


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    cb = generate_basis(PERIOD, 1, HARMONICS, normalize=True)
    o = cb.o_size
    series = jnp.asarray(_series(T_STEPS, N_SENSORS))
    n_chunks = T_STEPS // o
    chunks = series[: n_chunks * o].reshape(n_chunks, o, N_SENSORS)
    gb_in = T_STEPS * N_SENSORS * 4 / 1e9
    tables = encoder.make_tables(cb, False)

    results = {}

    # float fast path (matmul projection)
    fast = jax.jit(lambda x: encoder.encode_series_fast(x, cb))
    probe2 = jax.jit(lambda out: jnp.sum(out[0]) + jnp.sum(out[1]))
    dt = _time(lambda: fast(series), probe2)
    results["float_fast"] = gb_in / dt

    for use_pallas in (True, False):
        encoder.USE_PALLAS = use_pallas
        jax.clear_caches()
        tag = "pallas" if use_pallas else "fori"
        try:
            for mode40 in (False, True):
                cfg = encoder.EncoderConfig.for_stream(cb, False, mode40, True)

                @jax.jit
                def run(chunks_, cfg=cfg):
                    st = encoder.init_state(cfg, N_SENSORS)
                    st2, frames = encoder.encode_chunks(st, chunks_, cfg, tables)
                    return frames

                if mode40:
                    probe = jax.jit(lambda fr: sum(jnp.sum(f) for f in fr))
                else:
                    probe = jax.jit(lambda fr: jnp.sum(fr[0]) + jnp.sum(fr[1]))
                dt = _time(lambda: run(chunks), probe)
                results[f"{'40bit' if mode40 else 'float'}_exact_{tag}"] = gb_in / dt
        finally:
            encoder.USE_PALLAS = None
    jax.clear_caches()

    for k, v in results.items():
        print(f"  {k:24s} {v:8.2f} GB/s")
    print(json.dumps({k: round(v, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
