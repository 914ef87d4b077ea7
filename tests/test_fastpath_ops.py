"""Fast-path whole-series Pallas kernels vs the jnp einsum formulations
(interpret mode on CPU; the same kernels compile for TPU)."""

import numpy as np
import jax.numpy as jnp

from kwave_tpu import decoder, encoder
from kwave_tpu.basis import generate_basis
from kwave_tpu.ops import fastpath


def _series(t, n, seed=0, amp=1e5):
    rng = np.random.default_rng(seed)
    tt = np.arange(t, dtype=np.float32)[:, None]
    ph = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    return (amp * np.sin(2 * np.pi * tt / 20.0 + ph)
            + 0.01 * amp * rng.standard_normal((t, n))).astype(np.float32)


def test_encode_frames_matches_einsum_fast_path():
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 200, 6  # n not a lane multiple
    x = _series(o * windows, n)

    ref_re, ref_im = encoder.encode_series_fast(jnp.asarray(x), cb)

    be_re, be_im, _, _ = cb.tables(False)
    tab = np.concatenate([be_re[:, : 2 * o].T, be_im[:, : 2 * o].T], axis=1)
    frames = fastpath.encode_frames(
        jnp.asarray(x), jnp.asarray(tab[:o]), jnp.asarray(tab[o:]), o
    )
    assert frames.shape == (windows, 2 * h, n)
    np.testing.assert_allclose(np.asarray(frames[:, :h]), np.asarray(ref_re),
                               rtol=1e-6, atol=1e-2)
    np.testing.assert_allclose(np.asarray(frames[:, h:]), np.asarray(ref_im),
                               rtol=1e-6, atol=1e-2)


def test_reconstruct_series_matches_einsum_decoder():
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 160, 5
    x = _series(o * windows, n, seed=4)
    f_re, f_im = encoder.encode_series_fast(jnp.asarray(x), cb)

    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)
    ref = decoder.reconstruct(f_re, f_im, tab_re, tab_im, o, o * windows)

    frames = jnp.concatenate([f_re, f_im], axis=1)  # [K, 2H, N]
    tab4 = jnp.concatenate(
        [tab_re[o:], tab_im[o:], tab_re[:o], tab_im[:o]], axis=1
    )  # [o, 4H]
    got = fastpath.reconstruct_series(frames, tab4, o, o * windows)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-2)

    # round trip accuracy on a clean band-limited signal (the noise term above is not
    # representable by 2 harmonics, so it is excluded from the accuracy gate)
    rng = np.random.default_rng(6)
    tt = np.arange(o * windows, dtype=np.float32)[:, None]
    ph = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    xc = (1e5 * np.sin(2 * np.pi * tt / 20.0 + ph)
          + 1e4 * np.sin(4 * np.pi * tt / 20.0 + 1.7 * ph)).astype(np.float32)
    fr2, fi2 = encoder.encode_series_fast(jnp.asarray(xc), cb)
    got2 = fastpath.reconstruct_series(
        jnp.concatenate([fr2, fi2], axis=1), tab4, o, o * windows
    )
    mid = slice(2 * o, o * windows - 2 * o)
    err = np.max(np.abs(np.asarray(got2)[mid] - xc[mid])) / np.max(np.abs(xc))
    assert err < 0.02


def test_whole_series_exact_kernels_match_fori(monkeypatch):
    """encode_series_exact's whole-series Pallas path vs the fori/scan path (interpret
    mode; the on-chip gate asserts bitwise vs the oracle)."""
    import jax

    from kwave_tpu.ops import encode_pallas as ep

    cb = generate_basis(10.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 200, 6
    x = _series(o * windows + 3, n, seed=9)  # +3 trailing steps

    results = {}
    for use_pallas in (False, True):
        encoder.USE_PALLAS = use_pallas
        jax.clear_caches()
        try:
            per_mode = {}
            for mode40 in (False, True):
                for overlap in (True, False):
                    frames, state = encoder.encode_series_exact(
                        jnp.asarray(x), cb, mode40=mode40, overlap=overlap
                    )
                    per_mode[(mode40, overlap)] = (
                        tuple(np.asarray(f) for f in frames),
                        {k: np.asarray(v) for k, v in state.items()},
                    )
            results[use_pallas] = per_mode
        finally:
            encoder.USE_PALLAS = None
    jax.clear_caches()

    for key in results[False]:
        mode40, overlap = key
        fr_a, st_a = results[False][key]
        fr_b, st_b = results[True][key]
        for k, (a, b) in enumerate(zip(fr_a, fr_b)):
            if mode40:
                np.testing.assert_array_equal(a, b, err_msg=f"{key} plane {k}")
            else:
                np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-2,
                                           err_msg=f"{key} plane {k}")
        assert set(st_a) == set(st_b), key
        for sk in st_a:
            if mode40 or sk in ("sampled_step", "compressed_step"):
                np.testing.assert_array_equal(st_a[sk], st_b[sk],
                                              err_msg=f"{key} state {sk}")
            else:
                np.testing.assert_allclose(st_a[sk], st_b[sk], rtol=1e-5, atol=1e-2,
                                           err_msg=f"{key} state {sk}")


def test_flat_kernels_match_3d_kernels():
    """The aligned flat-block kernels (block-diagonal projection, masked boundary
    blocks) are bit-identical to the 3D-layout kernels across window lengths,
    harmonics, and non-divisible window counts."""
    # h=5/6 exercise 2H > 8 (the successor-frame block is taller than one 8-row
    # tile — the r3 fixed-8-row nxt block crashed at trace time there)
    for period, h, windows, extra, n in [(20.0, 2, 10, 0, 300), (20.0, 1, 7, 0, 128),
                                         (14.0, 4, 7, 1, 200), (17.0, 5, 6, 2, 144),
                                         (20.0, 6, 5, 0, 130)]:
        cb = generate_basis(period, 1, h, normalize=True)
        o = cb.o_size
        x = jnp.asarray(_series(o * windows + extra, n, seed=3))
        be_re, be_im, _, _ = cb.tables(False)
        tab_re = jnp.asarray(be_re[:, : 2 * o].T)
        tab_im = jnp.asarray(be_im[:, : 2 * o].T)
        tab2o = jnp.concatenate([tab_re, tab_im], axis=1)
        tab4 = jnp.concatenate(
            [tab_re[o:], tab_im[o:], tab_re[:o], tab_im[:o]], axis=1)

        f_ref = fastpath.encode_frames(x, tab2o[:o], tab2o[o:], o,
                                       compute="mxu_highest")
        f_flat = fastpath.encode_frames_flat(x, tab2o[:o], tab2o[o:], o)
        np.testing.assert_array_equal(np.asarray(f_flat), np.asarray(f_ref),
                                      err_msg=f"enc o={o} H={h}")

        r_ref = fastpath.reconstruct_series(f_ref, tab4, o, o * windows,
                                            compute="mxu_highest")
        r_flat = fastpath.reconstruct_series_flat(f_ref, tab4, o, o * windows)
        np.testing.assert_array_equal(np.asarray(r_flat), np.asarray(r_ref),
                                      err_msg=f"dec o={o} H={h}")


def test_flat_kernel_precisions_close():
    """split3 (3-pass bf16 split) stays within ~1e-5 of the fp32 path."""
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o = cb.o_size
    x = jnp.asarray(_series(o * 6, 160, seed=5))
    be_re, be_im, _, _ = cb.tables(False)
    tab2o = jnp.concatenate(
        [jnp.asarray(be_re[:, : 2 * o].T), jnp.asarray(be_im[:, : 2 * o].T)], axis=1)
    f_hi = fastpath.encode_frames_flat(x, tab2o[:o], tab2o[o:], o,
                                       precision="highest")
    f_s3 = fastpath.encode_frames_flat(x, tab2o[:o], tab2o[o:], o,
                                       precision="split3")
    scale = float(jnp.max(jnp.abs(f_hi)))
    assert float(jnp.max(jnp.abs(f_s3 - f_hi))) < 1e-4 * scale


def test_flat_decode_boundary_cases():
    """Reverse-carry decode edges: n_steps not a window multiple, more frames than
    needed (k_total > k_max), fewer frames than coverage (zero tail), and a single
    window — all must match the forward 3D kernel bit-for-bit."""
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o = cb.o_size
    n = 160
    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)
    tab4 = jnp.concatenate([tab_re[o:], tab_im[o:], tab_re[:o], tab_im[:o]], axis=1)
    tab2o = jnp.concatenate([tab_re, tab_im], axis=1)

    x = jnp.asarray(_series(o * 12, n, seed=11))
    frames = fastpath.encode_frames(x, tab2o[:o], tab2o[o:], o,
                                    compute="mxu_highest")

    for k_frames, n_steps in [
        (12, 12 * o - 7),   # partial tail window
        (12, 5 * o),        # many more frames than reconstructed steps
        (4, 6 * o),         # coverage beyond the frames: zero-padded tail
        (1, o),             # single window
        (12, 1),            # single step
    ]:
        f = frames[:k_frames]
        ref = fastpath.reconstruct_series(f, tab4, o, n_steps,
                                          compute="mxu_highest")
        got = fastpath.reconstruct_series_flat(f, tab4, o, n_steps)
        np.testing.assert_array_equal(
            np.asarray(got), np.asarray(ref),
            err_msg=f"k_frames={k_frames} n_steps={n_steps}")


def test_packed_frame_api_matches_split_api(monkeypatch):
    """The production packed-frame wrappers (encoder.encode_series_frames /
    decoder.reconstruct_frames) agree with the split (re, im) API on both the
    Pallas and the jnp fallback paths — carrying [K, 2H, N] end-to-end is a
    layout change only (VERDICT r3 #1)."""
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    x = jnp.asarray(_series(o * 8, 200, seed=21))
    be_re, be_im, _, _ = cb.tables(False)
    tab_re = jnp.asarray(be_re[:, : 2 * o].T)
    tab_im = jnp.asarray(be_im[:, : 2 * o].T)
    for use_pallas in (True, False):
        monkeypatch.setattr(encoder, "USE_PALLAS", use_pallas)
        frames = encoder.encode_series_frames(x, cb)
        f_re, f_im = encoder.encode_series_fast(x, cb)
        np.testing.assert_array_equal(np.asarray(frames[:, :h]), np.asarray(f_re))
        np.testing.assert_array_equal(np.asarray(frames[:, h:]), np.asarray(f_im))
        rec_packed = decoder.reconstruct_frames(frames, tab_re, tab_im, o, o * 8)
        rec_split = decoder.reconstruct(f_re, f_im, tab_re, tab_im, o, o * 8)
        np.testing.assert_array_equal(np.asarray(rec_packed), np.asarray(rec_split))
