"""Real-TPU bit-exactness validation: the BASELINE.json acceptance gate.

Runs the exact-path encoder on the TPU backend and compares every emitted frame bit-for-bit
against the NumPy oracle (which carries the reference C++ semantics: fp32 MACs with separate
rounding, per-step 40-bit requantization). XLA:TPU performs no fp32 FMA contraction, so the
device path must match exactly; XLA:CPU contracts mul+add into FMA at LLVM level (not
disableable), which is why this check runs on TPU, not in the CPU test suite (the CPU suite
pins the state machine with dyadic-exact data instead — see tests/test_jax_codec.py).

Usage: python tools/validate_tpu.py   (from the repo root; uses jax.devices() as configured)
"""

import sys

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

from kwave_tpu import encoder, oracle  # noqa: E402
from kwave_tpu.basis import generate_basis  # noqa: E402


def _series(steps, n, period, seed=0, scale=1e5):
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.5, 2.0, n) * scale
    ph = rng.uniform(0, 2 * np.pi, n)
    t = np.arange(steps)[:, None]
    base = amp[None] * np.sin(2 * np.pi * t / period + ph[None])
    return (base + rng.normal(0, 0.01 * scale, (steps, n))).astype(np.float32)


def check(name, series, basis, shifted=False, mode40=False, overlap=True):
    enc = oracle.OracleEncoder(
        basis, series.shape[1], shifted=shifted, mode40=mode40, overlap=overlap,
        total_steps=series.shape[0],
    )
    frames_o = enc.encode_series(series)
    frames_j, _ = encoder.encode_series_exact(
        series, basis, shifted=shifted, mode40=mode40, overlap=overlap
    )
    n_mismatch = 0
    for c, fo in enumerate(frames_o):
        for k, plane_o in enumerate(fo):
            plane_j = np.asarray(frames_j[k][c]).T
            if mode40:
                plane_j = plane_j.astype(plane_o.dtype)
                eq = np.array_equal(plane_j, plane_o)
            else:
                eq = np.array_equal(plane_j.view(np.uint32), plane_o.view(np.uint32))
            if not eq:
                n_mismatch += 1
    status = "BIT-EXACT" if n_mismatch == 0 else f"MISMATCH ({n_mismatch} planes)"
    print(f"  {name:55s} {len(frames_o):3d} frames  {status}")
    return n_mismatch == 0


def check_production_dispatch(name, series, basis, shifted=False, mode40=False,
                              overlap=True):
    """The driver's c-stream path: encode_chunk with the Pallas fused window kernels
    (USE_PALLAS=True, real Mosaic lowering) vs the NumPy oracle, frame for frame."""
    import jax.numpy as jnp

    enc = oracle.OracleEncoder(
        basis, series.shape[1], shifted=shifted, mode40=mode40, overlap=overlap,
        total_steps=series.shape[0],
    )
    frames_o = enc.encode_series(series)
    cfg = encoder.EncoderConfig.for_stream(basis, shifted, mode40, overlap)
    tables = encoder.make_tables(basis, shifted)
    o = cfg.o_size
    saved = encoder.USE_PALLAS
    encoder.USE_PALLAS = True
    jax.clear_caches()
    try:
        st = encoder.init_state(cfg, series.shape[1])
        n_mismatch = 0
        for w in range(series.shape[0] // o):
            st, frame = encoder.encode_chunk(
                st, jnp.asarray(series[w * o : (w + 1) * o]), cfg, tables
            )
            for k, plane in enumerate(frame):
                plane_j = np.asarray(plane).T
                plane_o = frames_o[w][k]
                if mode40:
                    eq = np.array_equal(plane_j.astype(plane_o.dtype), plane_o)
                else:
                    eq = np.array_equal(plane_j.view(np.uint32), plane_o.view(np.uint32))
                if not eq:
                    n_mismatch += 1
    finally:
        encoder.USE_PALLAS = saved
        jax.clear_caches()
    status = "BIT-EXACT" if n_mismatch == 0 else f"MISMATCH ({n_mismatch} planes)"
    print(f"  {name:55s} {series.shape[0] // o:3d} frames  {status}")
    return n_mismatch == 0


def main():
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    ok = True
    period = 13.4
    for harmonics in (1, 4):
        basis = generate_basis(period, 1, harmonics)
        s = _series(12 * basis.o_size + 5, 64, period, seed=harmonics)
        sv = _series(12 * basis.o_size + 5, 64, period, seed=harmonics + 10, scale=2.0)
        ok &= check(f"float overlap p   H={harmonics}", s, basis)
        ok &= check(f"float overlap u-shifted H={harmonics}", sv, basis, shifted=True)
        ok &= check(f"float no-overlap  H={harmonics}", s, basis, overlap=False)
        ok &= check(f"40bit overlap p   H={harmonics}", s, basis, mode40=True)
        ok &= check(f"40bit overlap u-shifted H={harmonics}", sv, basis, shifted=True,
                    mode40=True)
        ok &= check(f"40bit no-overlap  H={harmonics}", s, basis, mode40=True, overlap=False)
    # Tiny record (lastStep edge)
    basis = generate_basis(20.0, 1, 1)
    tiny = _series(basis.o_size - 3, 16, 20.0, seed=99)
    ok &= check("tiny record lastStep", tiny, basis)
    ok &= check("tiny record lastStep 40bit", tiny, basis, mode40=True)
    # Production dispatch: encode_chunk through the fused Pallas window kernels
    # (Mosaic lowering) vs the oracle — the exact bytes the driver writes on TPU
    if jax.default_backend() == "tpu":
        basis = generate_basis(period, 1, 2)
        s = _series(6 * basis.o_size, 64, period, seed=5)
        for mode40 in (False, True):
            for overlap in (True, False):
                tag = f"pallas dispatch {'40bit' if mode40 else 'float'}" \
                      f"{'' if overlap else ' no-overlap'}"
                ok &= check_production_dispatch(tag, s, basis, mode40=mode40,
                                                overlap=overlap)
    # Pallas kernels with real Mosaic lowering (the CPU suite runs them in interpret
    # mode, which has hidden TPU-only issues before: unsupported uint32->f32 casts and
    # bf16 default-precision MXU matmuls)
    if jax.default_backend() == "tpu":
        import kwave_tpu.ops.encode_pallas as ep
        import tests.test_pallas_ops as tp

        saved = ep._interpret_default
        ep._interpret_default = lambda: False
        try:
            tp.test_float_window_kernel_matches_fast_path()
            tp.test_40b_window_kernel_bit_exact_vs_scan_encoder()
            tp.test_40b_roundtrip_through_kernel_codec_helpers()
            print("  pallas kernels (Mosaic lowering)                          BIT-EXACT")
        except Exception as exc:  # noqa: BLE001
            ok = False
            print("  pallas kernels (Mosaic lowering)  FAIL:", str(exc)[:120])
        finally:
            ep._interpret_default = saved
    print("RESULT:", "PASS — TPU path is bit-exact vs reference oracle" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
