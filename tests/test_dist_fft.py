"""Pencil-decomposed distributed FFT vs single-device rfftn on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kwave_tpu.parallel import make_mesh, field_sharding
from kwave_tpu.parallel.fft import dist_irfftn, dist_rfftn, spectral_sharding


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh(8)


def test_dist_rfftn_matches_reference(mesh):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((16, 24, 20)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), field_sharding(mesh, 3))
    got = np.asarray(dist_rfftn(xs, mesh))
    ref = np.fft.rfftn(x.astype(np.float64)).astype(np.complex64)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-3)


def test_dist_roundtrip_and_sharding(mesh):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((16, 16, 12)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), field_sharding(mesh, 3))

    @jax.jit
    def roundtrip(a):
        ak = dist_rfftn(a, mesh)
        return dist_irfftn(ak, a.shape[2], mesh), ak

    back, ak = roundtrip(xs)
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-6)
    # spectral result is y-sharded
    assert ak.sharding.is_equivalent_to(spectral_sharding(mesh), 3)
    assert back.sharding.is_equivalent_to(field_sharding(mesh, 3), 3)


def test_dist_spectral_multiply_kappa(mesh):
    """A k-space operator applied in the y-sharded spectral layout matches the
    single-device result — the solver's spectral-multiply pattern."""
    rng = np.random.default_rng(2)
    x = rng.standard_normal((16, 16, 16)).astype(np.float32)
    kap = rng.random((16, 16, 9)).astype(np.float32)

    xs = jax.device_put(jnp.asarray(x), field_sharding(mesh, 3))
    kap_s = jax.device_put(jnp.asarray(kap), spectral_sharding(mesh))

    @jax.jit
    def apply_op(a, k):
        return dist_irfftn(dist_rfftn(a, mesh) * k, 16, mesh)

    got = np.asarray(apply_op(xs, kap_s))
    ref = np.fft.irfftn(np.fft.rfftn(x) * kap, s=(16, 16, 16)).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-4)


def test_dist_mxfft_engine_matches_jnp(mesh):
    """The mxfft-backed pencil legs (engine="mxfft") reproduce the jnp pencil up
    to mxfft's y/z bin permutation, and roundtrip to identity. Uses a 256-z grid
    so the radix-2 levels actually run (16-length axes hit the base directly)."""
    from kwave_tpu.ops import mxfft

    rng = np.random.default_rng(5)
    x = rng.standard_normal((256, 16, 12)).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), field_sharding(mesh, 3))

    @jax.jit
    def both(a):
        k_jnp = dist_rfftn(a, mesh)
        k_mx = dist_rfftn(a, mesh, engine="mxfft",
                          precision=jax.lax.Precision.HIGHEST)
        back = dist_irfftn(k_mx, a.shape[2], mesh, engine="mxfft",
                           precision=jax.lax.Precision.HIGHEST)
        return k_jnp, k_mx, back

    k_jnp, k_mx, back = both(xs)
    pz, py = mxfft.perm(256), mxfft.perm(16)
    ref_perm = np.asarray(k_jnp)[pz][:, py]
    scale = np.abs(ref_perm).max()
    np.testing.assert_allclose(np.asarray(k_mx), ref_perm, atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(back), x, atol=3e-5 * np.abs(x).max())
    assert k_mx.sharding.is_equivalent_to(spectral_sharding(mesh), 3)

    # dense local bases (base=256: no butterfly levels, canonical bin order) —
    # the >=256 sharded regime the driver auto-picks at precision "high"
    @jax.jit
    def dense(a):
        k = dist_rfftn(a, mesh, engine="mxfft",
                       precision=jax.lax.Precision.HIGHEST, base=256)
        return k, dist_irfftn(k, a.shape[2], mesh, engine="mxfft",
                              precision=jax.lax.Precision.HIGHEST, base=256)

    k_dense, back_dense = dense(xs)
    np.testing.assert_allclose(np.asarray(k_dense), np.asarray(k_jnp),
                               atol=3e-5 * scale)
    np.testing.assert_allclose(np.asarray(back_dense), x,
                               atol=3e-5 * np.abs(x).max())
