"""Basis-table tests vs the direct formulas of CompressHelper.cpp:672-778 (SURVEY.md §4.2)."""

import numpy as np
import pytest

from kwave_tpu import basis as B


def test_overlap_size_truncates_like_reference():
    # hsize_t(period * mos) truncates toward zero on the fp32 product (CompressHelper.cpp:50).
    assert B.overlap_size(21.7, 1) == 21
    assert B.overlap_size(21.7, 8) == int(np.float32(np.float32(21.7) * 8))
    assert B.overlap_size(2.0, 1) == 2


def test_triangular_window_values():
    o = 8
    w = B.triangular_window(o)
    assert w.shape == (2 * o + 1,)
    assert w.dtype == np.float32
    assert w[0] == 0.0
    assert w[o] == 1.0
    assert w[2 * o] == pytest.approx(0.0, abs=1e-7)
    # Overlap-add tiling: b[u] + b[u+o] == 1 on [0, o)
    np.testing.assert_allclose(w[:o] + w[o : 2 * o], np.ones(o, np.float32), rtol=1e-6)


def test_exponential_basis_formula():
    period, harmonics = 16.0, 3
    b = B.generate_basis(period, mos=1, harmonics=harmonics, normalize=False)
    x = np.arange(b.b_size)
    for ih in range(harmonics):
        h = ih + 1
        expected = np.exp(-1j * (2.0 * np.pi * h / period) * x)
        got = b.e_re[ih] + 1j * b.e_im[ih]
        np.testing.assert_allclose(got, expected.astype(np.complex64), atol=2e-6)


def test_shifted_basis_is_half_sample_phase():
    period = 12.0
    b = B.generate_basis(period, mos=1, harmonics=2, normalize=False)
    for ih in range(2):
        h = ih + 1
        shift = np.exp(1j * np.pi * h / period)
        expected = (b.e_re[ih] + 1j * b.e_im[ih]) * shift
        got = b.e_sh_re[ih] + 1j * b.e_sh_im[ih]
        np.testing.assert_allclose(got, expected, atol=2e-6)


def test_be_and_be1_construction():
    period, mos = 10.0, 2
    b = B.generate_basis(period, mos=mos, harmonics=1, normalize=True)
    o, bs = b.o_size, b.b_size
    w = B.triangular_window(o)
    e = b.e_re[0] + 1j * b.e_im[0]
    norm = 2.0 / o
    np.testing.assert_allclose(b.be[0], (w * e * norm).astype(np.complex64), atol=2e-6)
    idx = (np.arange(bs) + o) % (bs - 1)
    np.testing.assert_allclose(b.be1[0], (w[idx] * e[idx] * norm).astype(np.complex64), atol=2e-6)


def test_be1_equals_be_at_rotated_offset():
    # bE_1[stepLocal] == bE[(stepLocal + o) mod 2o] for all used indices [0, 2o)
    b = B.generate_basis(14.0, mos=1, harmonics=2, normalize=True)
    o = b.o_size
    sl = np.arange(2 * o)
    rot = (sl + o) % (2 * o)
    np.testing.assert_array_equal(b.be1_re[:, sl], b.be_re[:, rot])
    np.testing.assert_array_equal(b.be1_im[:, sl], b.be_im[:, rot])


def test_find_peaks_parabolic_location():
    # Symmetric peak at index 5 -> location 5 + 0.5 - 0.5 = 5 with equal slopes... d1 = d2 so
    # loc = i + 0.5 - 0.5 = i.
    sig = np.zeros(11, np.float32)
    sig[4], sig[5], sig[6] = 1.0, 2.0, 1.0
    locs, peaks = B.find_peaks(sig)
    assert len(locs) == 1
    assert peaks[0] == 2.0
    assert locs[0] == pytest.approx(5.0)


def test_find_period_on_sine():
    period = 23.0
    t = np.arange(2000, dtype=np.float64)
    sig = np.sin(2 * np.pi * t / period).astype(np.float32)
    est = B.find_period(sig)
    assert est == pytest.approx(period, rel=1e-3)


def test_find_period_filters_small_peaks():
    # Strong spikes every 40 samples, weak spikes (0.3 < 0.5*max) every 10: weak ones dropped.
    sig = np.zeros(2000, np.float32)
    sig[5::10] = 0.3
    sig[5::40] = 1.0
    est = B.find_period(sig)
    assert est == pytest.approx(40.0, rel=1e-6)
