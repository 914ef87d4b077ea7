"""Native C++ codec vs the NumPy oracle and jnp bitpack — three independent
implementations of the same bit format must agree exactly."""

import numpy as np
import pytest

import jax.numpy as jnp

from kwave_tpu import bitpack, native, oracle
from kwave_tpu.basis import MAX_EXP_P, MAX_EXP_U, generate_basis

pytestmark = pytest.mark.skipif(not native.available(), reason="toolchain unavailable")


def _data(shape=(8, 500), amp=1e5, seed=0):
    rng = np.random.default_rng(seed)
    return (
        (amp * rng.standard_normal(shape)).astype(np.float32),
        (amp * rng.standard_normal(shape)).astype(np.float32),
    )


@pytest.mark.parametrize("e", [MAX_EXP_P, MAX_EXP_U])
def test_encode_decode_tri_implementation_agreement(e):
    re, im = _data()
    h_n, r_n, i_n = native.encode40(re, im, e)
    h_j, r_j, i_j = (np.asarray(a) for a in bitpack.encode40(jnp.asarray(re), jnp.asarray(im), e))
    np.testing.assert_array_equal(h_n, h_j.astype(np.uint8))
    np.testing.assert_array_equal(r_n, r_j.astype(np.uint16))
    np.testing.assert_array_equal(i_n, i_j.astype(np.uint16))

    d_re, d_im = native.decode40(h_n, r_n, i_n, e)
    j_re, j_im = bitpack.decode40(
        jnp.asarray(h_n.astype(np.uint32)), jnp.asarray(r_n.astype(np.uint32)),
        jnp.asarray(i_n.astype(np.uint32)), e,
    )
    np.testing.assert_array_equal(d_re, np.asarray(j_re))
    np.testing.assert_array_equal(d_im, np.asarray(j_im))


def test_wire_format_matches_oracle():
    re, im = _data(shape=(1000,))
    hdr, mr, mi = native.encode40(re, im, MAX_EXP_P)
    wire_n = native.soa_to_bytes(hdr, mr, mi)
    wire_o = oracle.soa_to_bytes(hdr, mr, mi)
    np.testing.assert_array_equal(wire_n, np.asarray(wire_o).reshape(-1))
    h2, r2, i2 = native.bytes_to_soa(wire_n)
    np.testing.assert_array_equal(h2, hdr)
    np.testing.assert_array_equal(r2, mr)
    np.testing.assert_array_equal(i2, mi)


@pytest.mark.parametrize("mode40", [False, True])
def test_native_accumulate_matches_oracle_encoder(mode40):
    """Drive the native per-step accumulate through a full series; frames must equal the
    OracleEncoder's (the Python spec of IndexOutputStream::flushRaw)."""
    cb = generate_basis(10.0, 1, 2, normalize=True)
    o, h = cb.o_size, cb.harmonics
    n, steps = 64, 50
    rng = np.random.default_rng(4)
    t = np.arange(steps, dtype=np.float32)[:, None]
    x = (1e5 * np.sin(2 * np.pi * t / 10.0)
         + 1e3 * rng.standard_normal((steps, n))).astype(np.float32)

    enc = oracle.OracleEncoder(cb, n_sensors=n, mode40=mode40, total_steps=steps)
    ref_frames = enc.encode_series(x)

    lib = native.load()
    be_re, be_im, be1_re, be1_im = (np.ascontiguousarray(a) for a in cb.tables(False))
    b_size = be_re.shape[1]
    if mode40:
        buf1 = np.zeros(n * h * 5, np.uint8)
        buf2 = np.zeros(n * h * 5, np.uint8)
    else:
        buf1 = np.zeros(n * h * 2, np.float32)
        buf2 = np.zeros(n * h * 2, np.float32)

    frames = []
    compressed = 0
    for s in range(steps):
        sl = s % (2 * o)
        saving = (sl + 1) % o == 0
        mirror = int(saving and compressed == 0)
        xs = np.ascontiguousarray(x[s])
        if mode40:
            lib.kw_accum_step_40b(buf1, buf2, xs, n, h, b_size, sl,
                                  be_re, be_im, be1_re, be1_im, MAX_EXP_P, mirror)
        else:
            lib.kw_accum_step_float(buf1, buf2, xs, n, h, b_size, sl,
                                    be_re, be_im, be1_re, be1_im, mirror)
        if saving:
            odd = (compressed + 1) % 2 == 0
            emitted = buf1 if odd else buf2
            frames.append(emitted.copy())
            emitted[:] = 0
            compressed += 1

    assert len(frames) == len(ref_frames)
    for k, (got, ref) in enumerate(zip(frames, ref_frames)):
        if mode40:
            # oracle frames are [N, H] planes; flatten in pH order
            h_o = np.asarray(ref[0]).reshape(-1)
            r_o = np.asarray(ref[1]).reshape(-1)
            i_o = np.asarray(ref[2]).reshape(-1)
            ref_bytes = oracle.soa_to_bytes(h_o, r_o, i_o)
            np.testing.assert_array_equal(got, np.asarray(ref_bytes), err_msg=f"frame {k}")
        else:
            ref_flat = np.stack([ref[0], ref[1]], axis=-1).reshape(-1)  # [N,H,2]
            np.testing.assert_array_equal(got, ref_flat, err_msg=f"frame {k}")
