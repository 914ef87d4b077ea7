"""Oracle codec property tests: 40-bit round-trip semantics per CompressHelper.cpp:224-389."""

import numpy as np
import pytest

from kwave_tpu import oracle as O
from kwave_tpu.basis import MAX_EXP_P, MAX_EXP_U, generate_basis


def _roundtrip(re, im, e):
    h, mr, mi = O.encode40(re, im, e)
    return O.decode40(h, mr, mi, e)


def test_zero_roundtrip():
    re, im = _roundtrip(np.float32([0.0]), np.float32([0.0]), MAX_EXP_P)
    assert re[0] == 0.0 and im[0] == 0.0


def test_negative_zero_keeps_sign():
    re, im = _roundtrip(np.float32([-0.0]), np.float32([0.0]), MAX_EXP_P)
    assert np.signbit(re[0]) and not np.signbit(im[0])
    assert re[0] == 0.0


def test_roundtrip_error_bound():
    # Error model: quantum = 2^(eS + e - 127 - 16) with eS >= 0, i.e. an absolute floor of
    # 2^-5 for pressure (e=138; "p min value is 0.03125", CompressHelper.cpp:302-307) and a
    # relative bound ~2^-15 of the larger part above it (truncate-then-increment rounding).
    rng = np.random.default_rng(0)
    vals = rng.uniform(-1000, 1000, size=(2, 4096)).astype(np.float32)
    re, im = _roundtrip(vals[0], vals[1], MAX_EXP_P)
    bound = np.maximum(2.0**-5, np.maximum(np.abs(vals[0]), np.abs(vals[1])) * 2.0**-15)
    assert np.all(np.abs(re - vals[0]) <= bound)
    assert np.all(np.abs(im - vals[1]) <= bound)


def test_roundtrip_idempotent():
    # decode(encode(x)) is a fixed point: encoding the decoded value reproduces the same bits.
    rng = np.random.default_rng(1)
    re0 = rng.uniform(-8, 8, 8192).astype(np.float32)
    im0 = rng.uniform(-8, 8, 8192).astype(np.float32)
    for e in (MAX_EXP_P, MAX_EXP_U):
        h1, r1, i1 = O.encode40(re0, im0, e)
        dre, dim = O.decode40(h1, r1, i1, e)
        h2, r2, i2 = O.encode40(dre, dim, e)
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(r1, r2)
        np.testing.assert_array_equal(i1, i2)


def test_exponent_saturation():
    # Values above the representable max saturate mantissas and exponent (CompressHelper.cpp:376).
    big = np.float32([3e8])  # > pow(2, 26-16)*0x1FFFF = 134216704 for e=138
    h, mr, mi = O.encode40(big, big, MAX_EXP_P)
    assert (h[0] & 0xF) == 0xF
    assert mr[0] == 0xFFFF and mi[0] == 0xFFFF


def test_small_values_crop_to_zero():
    # Far below the minimum representable -> mantissa underflows to zero-ish.
    tiny = np.float32([1e-20])
    re, im = _roundtrip(tiny, tiny, MAX_EXP_P)
    assert abs(re[0]) < 0.04  # min representable ~0.03125 for e=138
    assert abs(im[0]) < 0.04


def test_mixed_magnitude_parts_align_to_shared_exponent():
    re0 = np.float32([1000.0])
    im0 = np.float32([0.001])  # 20 binades below: gets shifted out
    re, im = _roundtrip(re0, im0, MAX_EXP_P)
    np.testing.assert_allclose(re, re0, atol=2.0**-5)
    assert abs(im[0]) <= 0.05  # tiny part loses all precision vs the big one


def test_velocity_range_constant():
    v = np.float32([1.5, -7.99, 1e-4, 0.25])
    re, im = _roundtrip(v, v, MAX_EXP_U)
    np.testing.assert_allclose(re, v, rtol=2**-14, atol=2.0**-29)
    np.testing.assert_allclose(im, v, rtol=2**-14, atol=2.0**-29)


def test_soa_bytes_roundtrip():
    rng = np.random.default_rng(2)
    h = rng.integers(0, 256, 100).astype(np.uint8)
    mr = rng.integers(0, 65536, 100).astype(np.uint16)
    mi = rng.integers(0, 65536, 100).astype(np.uint16)
    raw = O.soa_to_bytes(h, mr, mi)
    assert raw.shape == (500,)
    h2, r2, i2 = O.bytes_to_soa(raw)
    np.testing.assert_array_equal(h, h2)
    np.testing.assert_array_equal(mr, r2)
    np.testing.assert_array_equal(mi, i2)


def test_aos_byte_layout_matches_reference():
    # header byte first, then mR as LE uint16, then mI as LE uint16 (CompressHelper.cpp:386-388).
    raw = O.soa_to_bytes(
        np.uint8([0xAB]), np.uint16([0x1234]), np.uint16([0xCDEF])
    )
    np.testing.assert_array_equal(raw, np.uint8([0xAB, 0x34, 0x12, 0xEF, 0xCD]))


# ---------------------------------------------------------------------------
# Streaming encoder semantics
# ---------------------------------------------------------------------------


def _sine_series(steps, n_sens, period, seed=0):
    rng = np.random.default_rng(seed)
    amp = rng.uniform(0.5, 2.0, n_sens)
    phase = rng.uniform(0, 2 * np.pi, n_sens)
    t = np.arange(steps)[:, None]
    return (amp[None, :] * np.sin(2 * np.pi * t / period + phase[None, :])).astype(np.float32)


def test_frame_count_matches_reference_dataset_sizing():
    # compressedSteps = max(floor(steps / oSize), 1)   (IndexOutputStream.cpp:111-117)
    period, steps, n = 16.0, 200, 5
    b = generate_basis(period, 1, 1)
    enc = O.OracleEncoder(b, n, total_steps=steps)
    frames = enc.encode_series(_sine_series(steps, n, period))
    assert len(frames) == steps // b.o_size


def test_first_frame_is_mirrored():
    # Frame 0 = sum_{t<o} (bE_1[t] + bE[t]) * x[t]  (mirror adds buf1 into buf2).
    period, n = 8.0, 3
    b = generate_basis(period, 1, 1)
    o = b.o_size
    series = _sine_series(3 * o, n, period)
    enc = O.OracleEncoder(b, n, total_steps=3 * o)
    frames = enc.encode_series(series)
    f0_re, f0_im = frames[0]
    exp_re = np.zeros((n, 1), np.float32)
    exp_im = np.zeros((n, 1), np.float32)
    for t in range(o):
        x = series[t][:, None]
        exp_re += (b.be1_re[:, t][None, :] * x).astype(np.float32)
        exp_im += (b.be1_im[:, t][None, :] * x).astype(np.float32)
    for t in range(o):
        x = series[t][:, None]
        exp_re += (b.be_re[:, t][None, :] * x).astype(np.float32)
        exp_im += (b.be_im[:, t][None, :] * x).astype(np.float32)
    # Mirrored frame equals buf2 + buf1 (accumulation order differs from this closed form only
    # by fp32 association on the final mirror add, which the oracle performs exactly once).
    np.testing.assert_allclose(f0_re, exp_re, rtol=1e-5)
    np.testing.assert_allclose(f0_im, exp_im, rtol=1e-5)


def test_odd_frames_are_full_be_windows():
    # Frame 1 (odd, from buf1) = sum_{t=0}^{2o-1} bE[t] * x[t], exactly, in order.
    period, n = 8.0, 4
    b = generate_basis(period, 1, 2)
    o = b.o_size
    series = _sine_series(4 * o, n, period)
    enc = O.OracleEncoder(b, n, total_steps=4 * o)
    frames = enc.encode_series(series)
    acc_re = np.zeros((n, 2), np.float32)
    acc_im = np.zeros((n, 2), np.float32)
    for t in range(2 * o):
        x = series[t][:, None]
        acc_re += (b.be_re[:, t][None, :] * x).astype(np.float32)
        acc_im += (b.be_im[:, t][None, :] * x).astype(np.float32)
    np.testing.assert_array_equal(frames[1][0], acc_re)
    np.testing.assert_array_equal(frames[1][1], acc_im)


def test_no_overlap_mode_single_buffer():
    period, n = 8.0, 3
    b = generate_basis(period, 1, 1)
    o = b.o_size
    series = _sine_series(3 * o, n, period)
    enc = O.OracleEncoder(b, n, overlap=False, total_steps=3 * o)
    frames = enc.encode_series(series)
    assert len(frames) == 3
    # Each frame integrates exactly o steps with basis (bE + bE_1).
    acc_re = np.zeros((n, 1), np.float32)
    acc_im = np.zeros((n, 1), np.float32)
    for t in range(o):
        x = series[t][:, None]
        acc_re += (b.be_re[:, t][None, :] * x).astype(np.float32)
        acc_re += (b.be1_re[:, t][None, :] * x).astype(np.float32)
        acc_im += (b.be_im[:, t][None, :] * x).astype(np.float32)
        acc_im += (b.be1_im[:, t][None, :] * x).astype(np.float32)
    np.testing.assert_array_equal(frames[0][0], acc_re)
    np.testing.assert_array_equal(frames[0][1], acc_im)


def test_40bit_mode_requantizes_every_step():
    period, n, steps = 16.0, 8, 96
    b = generate_basis(period, 1, 1)
    # Realistic pressure scale: e=138 puts the 40-bit quantum at 2^-5 absolute, so amplitudes
    # must sit well above it (ultrasound pressures are ~1e5..1e7 Pa).
    series = _sine_series(steps, n, period) * np.float32(1e5)
    enc40 = O.OracleEncoder(b, n, mode40=True, total_steps=steps)
    frames40 = enc40.encode_series(series)
    encf = O.OracleEncoder(b, n, total_steps=steps)
    framesf = encf.encode_series(series)
    assert len(frames40) == len(framesf)
    # Decoded 40-bit coefficients track the float coefficients within quantization error
    # accumulated over the per-step RMW (bounded but nonzero).
    h, mr, mi = frames40[1]
    dre, dim = O.decode40(h, mr, mi, O.MAX_EXP_P)
    ref_re, ref_im = framesf[1]
    scale = max(np.abs(ref_re).max(), np.abs(ref_im).max())
    assert np.max(np.abs(dre - ref_re)) < 1e-3 * scale
    assert np.max(np.abs(dim - ref_im)) < 1e-3 * scale


def test_roundtrip_reconstruction_accuracy():
    # Pure harmonic signal: decode(encode(x)) tracks x closely away from record edges.
    period, n, steps = 20.0, 6, 400
    b = generate_basis(period, 1, 1)
    o = b.o_size
    series = _sine_series(steps, n, period, seed=3)
    enc = O.OracleEncoder(b, n, total_steps=steps)
    frames = enc.encode_series(series)
    fre = np.stack([f[0] for f in frames])
    fim = np.stack([f[1] for f in frames])
    recon = O.reconstruct(fre, fim, b, shifted=False, n_steps=steps)
    lo, hi = 2 * o, (len(frames) - 1) * o
    err = np.abs(recon[lo:hi] - series[lo:hi])
    assert err.max() < 5e-3 * np.abs(series).max()


def test_multi_harmonic_reconstruction():
    period, n, steps = 24.0, 4, 480
    b = generate_basis(period, 1, 3)
    o = b.o_size
    rng = np.random.default_rng(7)
    t = np.arange(steps)[:, None]
    series = np.zeros((steps, n), np.float32)
    for h in range(1, 4):
        amp = rng.uniform(0.2, 1.0, n)
        ph = rng.uniform(0, 2 * np.pi, n)
        series += (amp[None] * np.sin(2 * np.pi * h * t / period + ph[None])).astype(np.float32)
    enc = O.OracleEncoder(b, n, total_steps=steps)
    frames = enc.encode_series(series)
    fre = np.stack([f[0] for f in frames])
    fim = np.stack([f[1] for f in frames])
    recon = O.reconstruct(fre, fim, b, shifted=False, n_steps=steps)
    lo, hi = 2 * o, (len(frames) - 1) * o
    err = np.abs(recon[lo:hi] - series[lo:hi])
    assert err.max() < 2e-2 * np.abs(series).max()


def test_compressed_size_model():
    # mSize = ceil(Nsens * complexSize) * harmonics floats (IndexOutputStream.cpp:91-93):
    # complexSize = 2.0 floats (full complex64) or 1.25 floats (40-bit).
    n_sens, harmonics = 1000, 3
    float_size = int(np.ceil(n_sens * 2.0)) * harmonics * 4
    packed_size = int(np.ceil(n_sens * 1.25)) * harmonics * 4
    assert packed_size == 15000
    assert packed_size * 8 // (n_sens * harmonics) == 40  # 40 bits per complex coefficient
    assert float_size / packed_size == pytest.approx(1.6)
