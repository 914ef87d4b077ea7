"""Decoder (reconstruction, coefficient-space intensity) and sampling reduce-op tests."""

import numpy as np
import pytest

from kwave_tpu import decoder, oracle, sampling
from kwave_tpu.basis import generate_basis
from kwave_tpu import encoder as enc_mod


def _sine(steps, n, period, seed=0, scale=1.0):
    rng = np.random.default_rng(seed)
    t = np.arange(steps)[:, None]
    amp = rng.uniform(0.5, 2.0, n) * scale
    ph = rng.uniform(0, 2 * np.pi, n)
    return (amp[None] * np.sin(2 * np.pi * t / period + ph[None])).astype(np.float32)


def test_reconstruct_matches_oracle():
    period, n, steps = 20.0, 6, 400
    b = generate_basis(period, 1, 2)
    series = _sine(steps, n, period, seed=3)
    frames, _ = enc_mod.encode_series_exact(series, b)
    f_re, f_im = (np.asarray(f) for f in frames)  # [Nc, H, N]
    rec_j = np.asarray(decoder.reconstruct_series(f_re, f_im, b, False, steps))
    rec_o = oracle.reconstruct(
        np.moveaxis(f_re, 1, 2), np.moveaxis(f_im, 1, 2), b, False, steps
    )
    np.testing.assert_allclose(rec_j, rec_o, rtol=0, atol=1e-4 * np.abs(series).max())


def test_reconstruct_accuracy_midrecord():
    period, n, steps = 20.0, 6, 400
    b = generate_basis(period, 1, 1)
    o = b.o_size
    series = _sine(steps, n, period, seed=3)
    frames, _ = enc_mod.encode_series_exact(series, b)
    rec = np.asarray(decoder.reconstruct_series(frames[0], frames[1], b, False, steps))
    n_c = frames[0].shape[0]
    lo, hi = 2 * o, (n_c - 1) * o
    assert np.abs(rec[lo:hi] - series[lo:hi]).max() < 5e-3 * np.abs(series).max()


def test_avg_intensity_matches_scalar_loop():
    # I = mean over frames of sum_h Re(cP conj(cU))/2, vs a direct per-frame scalar loop
    # mirroring IndexOutputStream::postSample / postProcess.
    period, n, steps = 16.0, 5, 256
    b = generate_basis(period, 1, 3)
    p = _sine(steps, n, period, seed=1)
    u = _sine(steps, n, period, seed=2, scale=0.01)
    fp, _ = enc_mod.encode_series_exact(p, b)
    fu, _ = enc_mod.encode_series_exact(u, b, shifted=True)
    p_re, p_im = (np.asarray(f) for f in fp)
    u_re, u_im = (np.asarray(f) for f in fu)
    n_c = p_re.shape[0]

    acc = np.zeros(n, np.float32)
    for c in range(n_c):
        for ih in range(b.harmonics):
            acc += (p_re[c, ih] * u_re[c, ih] + p_im[c, ih] * u_im[c, ih]) / 2.0
    expected = acc / n_c

    got = np.asarray(decoder.avg_intensity_frames(p_re, p_im, u_re, u_im))
    np.testing.assert_allclose(got, expected, rtol=1e-5)

    # streaming form agrees with batch form
    s = np.zeros(n, np.float32)
    for c in range(n_c):
        s = np.asarray(
            decoder.avg_intensity_update(s, p_re[c], p_im[c], u_re[c], u_im[c])
        )
    np.testing.assert_allclose(s / n_c, expected, rtol=1e-5)


def test_avg_intensity_40b_roundtrip():
    period, n, steps = 16.0, 4, 128
    b = generate_basis(period, 1, 1)
    p = _sine(steps, n, period, seed=1, scale=1e5)
    u = _sine(steps, n, period, seed=2, scale=2.0)
    fp, _ = enc_mod.encode_series_exact(p, b, mode40=True)
    fu, _ = enc_mod.encode_series_exact(u, b, shifted=True, mode40=True)
    got = np.asarray(decoder.avg_intensity_40b(fp, fu))
    # float-mode intensity as the near-truth
    fpF, _ = enc_mod.encode_series_exact(p, b)
    fuF, _ = enc_mod.encode_series_exact(u, b, shifted=True)
    want = np.asarray(decoder.avg_intensity_frames(*(list(fpF) + list(fuF))))
    np.testing.assert_allclose(got, want, rtol=2e-3)


# -- sampling ----------------------------------------------------------------------------------


def test_sample_index_ops():
    rng = np.random.default_rng(0)
    field = rng.normal(size=64).astype(np.float32)
    mask = np.array([3, 17, 0, 63, 42], np.int32)
    assert np.array_equal(np.asarray(sampling.sample_index(field, mask)), field[mask])
    buf = sampling.init_reduce_buffer("rms", 5)
    buf = sampling.sample_index_rms(buf, field, mask)
    np.testing.assert_allclose(np.asarray(buf), field[mask] ** 2, rtol=1e-6)
    bmax = sampling.sample_index_max(sampling.init_reduce_buffer("max", 5), field, mask)
    bmin = sampling.sample_index_min(sampling.init_reduce_buffer("min", 5), field, mask)
    assert np.array_equal(np.asarray(bmax), field[mask])
    assert np.array_equal(np.asarray(bmin), field[mask])


def test_sample_cuboid_layout():
    # Cuboid flattening must be x-fastest (reference transformCoordinates order).
    nz, ny, nx = 4, 5, 6
    field = np.arange(nz * ny * nx, dtype=np.float32).reshape(nz, ny, nx)
    c = sampling.Cuboid(lo=(1, 2, 1), hi=(4, 4, 3))
    flat = np.asarray(sampling.sample_cuboid_flat(field, c))
    want = field[1:3, 2:4, 1:4].reshape(-1)
    assert np.array_equal(flat, want)
    assert c.size == flat.size == 3 * 2 * 2


def test_post_rms():
    buf = np.array([4.0, 16.0], np.float32)
    out = np.asarray(sampling.post_rms(buf, 4))
    np.testing.assert_allclose(out, [1.0, 2.0], rtol=1e-6)


def test_whole_domain_ops():
    rng = np.random.default_rng(1)
    f1 = rng.normal(size=32).astype(np.float32)
    f2 = rng.normal(size=32).astype(np.float32)
    rms = sampling.init_reduce_buffer("rms", 32)
    rms = sampling.sample_all_rms(sampling.sample_all_rms(rms, f1), f2)
    np.testing.assert_allclose(np.asarray(rms), f1**2 + f2**2, rtol=1e-6)
    mx = sampling.sample_all_max(sampling.sample_all_max(
        sampling.init_reduce_buffer("max", 32), f1), f2)
    assert np.array_equal(np.asarray(mx), np.maximum(f1, f2))


def test_decode_40bit_rows_detects_corruption():
    """The dryrun's decode-level 40-bit check is demonstrably effective (r4
    VERDICT #7 done-criterion): a single flipped byte in a well-formed packed
    stream changes the decoded coefficients beyond any tolerance — garbage
    cannot pass a decode-and-compare."""
    import numpy as np

    from kwave_tpu import encoder
    from kwave_tpu.basis import generate_basis
    from kwave_tpu.decoder import decode_40bit_rows
    from kwave_tpu.oracle import OracleEncoder

    basis = generate_basis(10.0, 1, 2)
    n = 16
    t = np.arange(40, dtype=np.float32)[:, None]
    x = (1e5 * np.sin(2 * np.pi * t / 10.0
                      + np.linspace(0, 3, n, dtype=np.float32)[None]))
    enc = OracleEncoder(basis, n, mode40=True, total_steps=40)
    frames = enc.encode_series(x)
    # serialize frames the way the writer does: 5-byte AoS rows padded to mSize
    from kwave_tpu.oracle import soa_to_bytes

    m_floats = int(np.ceil(n * 1.25)) * 2
    rows = np.zeros((len(frames), m_floats), np.float32)
    for c, (hdr, mr, mi) in enumerate(frames):
        by = soa_to_bytes(hdr.reshape(-1), mr.reshape(-1), mi.reshape(-1))
        rows[c].view(np.uint8)[: by.size] = by

    from kwave_tpu.basis import MAX_EXP_P  # what OracleEncoder(mode40) encodes with

    re0, im0 = decode_40bit_rows(rows, 2, MAX_EXP_P)
    assert np.abs(re0).max() > 0
    bad = rows.copy()
    bad.view(np.uint8)[1, 7] ^= 0x41  # one flipped byte mid-stream
    re1, im1 = decode_40bit_rows(bad, 2, MAX_EXP_P)
    diff = max(np.abs(re1 - re0).max(), np.abs(im1 - im0).max())
    scale = np.abs(np.stack([re0, im0])).max()
    assert diff / scale > 1e-3, "corruption must exceed the dryrun tolerance"
