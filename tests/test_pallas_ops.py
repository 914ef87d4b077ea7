"""Pallas kernel exactness vs the jnp reference formulations (interpret mode on CPU;
the same kernels compile for TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from kwave_tpu import bitpack, encoder
from kwave_tpu.basis import MAX_EXP_P, generate_basis
from kwave_tpu.ops import (
    encode_window_40b_exact,
    encode_window_float,
    encode_window_float_exact,
)


def _series(t, n, seed=0, amp=1e5):
    rng = np.random.default_rng(seed)
    tt = np.arange(t, dtype=np.float32)[:, None]
    ph = rng.uniform(0, 2 * np.pi, n).astype(np.float32)
    return (amp * np.sin(2 * np.pi * tt / 20.0 + ph)
            + 0.01 * amp * rng.standard_normal((t, n))).astype(np.float32)


def test_float_window_kernel_matches_fast_path():
    cb = generate_basis(20.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 200, 5  # n deliberately not a lane multiple
    x = _series(o * windows, n)

    ref_re, ref_im = encoder.encode_series_fast(jnp.asarray(x), cb)

    be_re, be_im, _, _ = cb.tables(False)
    tab = np.concatenate([be_re[:, : 2 * o].T, be_im[:, : 2 * o].T], axis=1)  # [2o, 2H]
    tab_lo = jnp.asarray(tab[:o])
    tab_hi = jnp.asarray(tab[o:])

    p1 = jnp.zeros((2 * h, n), jnp.float32)
    for w in range(windows):
        chunk = jnp.asarray(x[w * o : (w + 1) * o])
        frame, p1 = encode_window_float(chunk, tab_lo, tab_hi, p1,
                                        first_window=(w == 0))
        np.testing.assert_allclose(
            np.asarray(frame[:h]), np.asarray(ref_re[w]), rtol=1e-6, atol=1e-2,
            err_msg=f"re window {w}",
        )
        np.testing.assert_allclose(
            np.asarray(frame[h:]), np.asarray(ref_im[w]), rtol=1e-6, atol=1e-2,
            err_msg=f"im window {w}",
        )


def test_40b_window_kernel_bit_exact_vs_scan_encoder():
    cb = generate_basis(10.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 96, 6
    x = _series(o * windows, n, seed=3)

    # reference: the lax.scan exact encoder
    (hdr_ref, mr_ref, mi_ref), _ = encoder.encode_series_exact(
        jnp.asarray(x), cb, mode40=True
    )

    be_re, be_im, be1_re, be1_im = cb.tables(False)
    tabs = jnp.asarray(np.concatenate(
        [be_re[:, : 2 * o].T, be_im[:, : 2 * o].T,
         be1_re[:, : 2 * o].T, be1_im[:, : 2 * o].T], axis=1,
    ))  # [2o, 4H]

    z = jnp.zeros((h, n), jnp.uint32)
    state = (z, z, z, z, z, z)
    frames = []
    for w in range(windows):
        chunk = jnp.asarray(x[w * o : (w + 1) * o])
        state = encode_window_40b_exact(
            chunk, tabs, state, MAX_EXP_P, parity=w % 2, mirror=(w == 0)
        )
        # frame emission: odd/even alternation (encoder._emit semantics)
        odd = (w + 1) % 2 == 0
        frame = (state[0], state[1], state[2]) if odd else (state[3], state[4], state[5])
        frames.append(tuple(np.asarray(f) for f in frame))
        # zero the emitted buffer
        if odd:
            state = (z, z, z, state[3], state[4], state[5])
        else:
            state = (state[0], state[1], state[2], z, z, z)

    for w in range(windows):
        np.testing.assert_array_equal(frames[w][0], np.asarray(hdr_ref[w]),
                                      err_msg=f"hdr window {w}")
        np.testing.assert_array_equal(frames[w][1], np.asarray(mr_ref[w]),
                                      err_msg=f"mr window {w}")
        np.testing.assert_array_equal(frames[w][2], np.asarray(mi_ref[w]),
                                      err_msg=f"mi window {w}")


def test_40b_roundtrip_through_kernel_codec_helpers():
    """The kernel-local codec helpers must match bitpack bit-for-bit."""
    from kwave_tpu.ops.encode_pallas import _decode40_block, _encode40_block

    rng = np.random.default_rng(1)
    re = (1e5 * rng.standard_normal((4, 256))).astype(np.float32)
    im = (1e5 * rng.standard_normal((4, 256))).astype(np.float32)
    h1, r1, i1 = (np.asarray(a) for a in _encode40_block(jnp.asarray(re), jnp.asarray(im), MAX_EXP_P))
    h2, r2, i2 = (np.asarray(a) for a in bitpack.encode40(jnp.asarray(re), jnp.asarray(im), MAX_EXP_P))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(r1, r2)
    np.testing.assert_array_equal(i1, i2)
    d1 = _decode40_block(jnp.asarray(h1), jnp.asarray(r1), jnp.asarray(i1), MAX_EXP_P)
    d2 = bitpack.decode40(jnp.asarray(h1), jnp.asarray(r1), jnp.asarray(i1), MAX_EXP_P)
    np.testing.assert_array_equal(np.asarray(d1[0]), np.asarray(d2[0]))
    np.testing.assert_array_equal(np.asarray(d1[1]), np.asarray(d2[1]))


@pytest.mark.parametrize("mode40", [False, True])
@pytest.mark.parametrize("overlap", [True, False])
def test_production_dispatch_matches_fori_path(mode40, overlap):
    """encoder.encode_chunk routed through the fused Pallas window kernels produces the
    same frames as the lax.fori_loop formulation (the driver's `c` streams dispatch to
    the kernels on TPU; this pins the two paths against each other in interpret mode)."""
    cb = generate_basis(10.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 200, 5  # n deliberately not a lane multiple
    x = _series(o * windows, n, seed=7)
    cfg = encoder.EncoderConfig.for_stream(cb, False, mode40, overlap)
    tables = encoder.make_tables(cb, False)

    results = {}
    for use_pallas in (False, True):
        encoder.USE_PALLAS = use_pallas
        jax.clear_caches()  # USE_PALLAS is not part of the jit cache key
        try:
            st = encoder.init_state(cfg, n)
            frames = []
            for w in range(windows):
                st, frame = encoder.encode_chunk(
                    st, jnp.asarray(x[w * o : (w + 1) * o]), cfg, tables
                )
                frames.append(tuple(np.asarray(f) for f in frame))
            results[use_pallas] = frames
        finally:
            encoder.USE_PALLAS = None
    jax.clear_caches()

    for w in range(windows):
        for k, (a, b) in enumerate(zip(results[False][w], results[True][w])):
            if mode40:
                np.testing.assert_array_equal(a, b, err_msg=f"win {w} plane {k}")
            else:
                # XLA:CPU FMA-contracts the two loop formulations differently at the
                # LLVM level (see tools/validate_tpu.py); on TPU the on-chip gate
                # asserts bitwise equality instead.
                np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-3,
                                           err_msg=f"win {w} plane {k}")


def test_float_exact_window_kernel_vs_oracle():
    """The fused float window kernel reproduces the NumPy oracle's frames (interpret
    mode executes the same per-step MAC order)."""
    from kwave_tpu import oracle

    cb = generate_basis(10.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, windows = 96, 4
    x = _series(o * windows, n, seed=11)

    enc = oracle.OracleEncoder(cb, n, total_steps=o * windows)
    frames_o = enc.encode_series(x)

    tables = encoder.make_tables(cb, False)
    tabs = encoder._stacked_tables(tables)
    z = jnp.zeros((h, n), jnp.float32)
    state = (z, z, z, z)
    for w in range(windows):
        chunk = jnp.asarray(x[w * o : (w + 1) * o])
        state = encode_window_float_exact(
            chunk, tabs, state, parity=w % 2, mirror=(w == 0)
        )
        odd = (w + 1) % 2 == 0
        fr = (state[0], state[1]) if odd else (state[2], state[3])
        # interpret mode compiles through XLA:CPU, whose LLVM-level FMA contraction
        # perturbs the MAC chain (amplified by cancellation); amplitudes are ~1e5 so
        # atol 1e-2 is ~1e-7 relative to scale. TPU asserts bitwise (validate_tpu).
        np.testing.assert_allclose(np.asarray(fr[0]).T, frames_o[w][0],
                                   rtol=1e-5, atol=1e-2, err_msg=f"re win {w}")
        np.testing.assert_allclose(np.asarray(fr[1]).T, frames_o[w][1],
                                   rtol=1e-5, atol=1e-2, err_msg=f"im win {w}")
        if odd:
            state = (z, z, state[2], state[3])
        else:
            state = (state[0], state[1], z, z)
