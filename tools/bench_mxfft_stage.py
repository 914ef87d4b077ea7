"""Per-stage mxfft timing at 256^3 vs 512^3 — the 512^3 root-cause probe.

The absorbing step is ~14 spectral transforms; 512^3 runs 2.6x worse PER CELL
than 256^3 (BASELINE solver table). This isolates where: each mxfft stage (x r2c
leg, y c2c, z c2c — 512 has TWO radix-2 levels where 256 has one), the full
rfftn+irfftn round trip, and the round trip with a fused spectral multiply
(the solver's pipeline shape). Inputs generated on device; chained-scan timing
with a scalar probe per BASELINE.md methodology.

Usage: python tools/bench_mxfft_stage.py [--sizes 256,512] [--reps 8]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

from kwave_tpu.ops import mxfft  # noqa: E402

_PROBE = None


def probe(x) -> float:
    global _PROBE
    if _PROBE is None:
        _PROBE = jax.jit(lambda v: jnp.sum(jnp.real(v)))
    return float(_PROBE(x))


def timeit(fn, x, reps: int) -> float:
    @jax.jit
    def chained(v):
        def body(c, _):
            return fn(c), None

        out, _ = lax.scan(body, v, None, length=reps)
        return out

    out = chained(x)
    probe(out)
    t0 = time.perf_counter()
    out = chained(x)
    probe(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="256,512")
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    print(f"backend: {jax.devices()}", flush=True)
    prec = lax.Precision.HIGH

    for n in (int(s) for s in args.sizes.split(",")):
        shape = (n, n, n)
        cells = n**3

        @jax.jit
        def gen():
            k = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
            return k

        x = gen()
        fwd, inv, perms = mxfft.make_fft_ops(shape, precision=prec)

        def report(name, t):
            print(f"  {n}^3 {name:34s}: {t * 1e3:9.3f} ms "
                  f"({t / cells * 1e12:6.2f} ps/cell)", flush=True)

        # x r2c leg alone (real -> packed real of same size, roundtrip)
        def x_leg(v):
            re, im = mxfft._rfft_last(v, n, prec)
            return mxfft._irfft_last(re, im, n, prec)

        report("x r2c+c2r leg", timeit(x_leg, x, args.reps))

        # y / z c2c axes alone (fwd+inv on fp32 planes; zero imag)
        for ax, name in ((1, "y c2c fwd+inv"), (0, "z c2c fwd+inv")):
            def axis_leg(v, a=ax):
                re, im = mxfft._c2c_axis(v, jnp.zeros_like(v), a, n, False, prec)
                re, im = mxfft._c2c_axis(re, im, a, n, True, prec)
                return re + 0.0 * im

            report(name, timeit(axis_leg, x, args.reps))

        # full transform pair
        def rt(v):
            return inv(fwd(v), shape)

        report("rfftn+irfftn", timeit(rt, x, args.reps))

        # transform pair with a spectral multiply (the solver pipeline unit);
        # operator generated in-jit from per-axis vectors (compact-mode style)
        kz = jnp.linspace(0.5, 1.5, n, dtype=jnp.float32)
        ky = jnp.linspace(0.7, 1.3, n, dtype=jnp.float32)
        kx = jnp.linspace(0.9, 1.1, n // 2 + 1, dtype=jnp.float32)

        def rt_mul(v):
            vk = fwd(v)
            op = kz[:, None, None] * ky[None, :, None] * kx[None, None, :]
            return inv(vk * op, shape)

        report("rfftn + op-mul + irfftn", timeit(rt_mul, x, args.reps))


if __name__ == "__main__":
    main()
