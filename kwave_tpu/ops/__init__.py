"""Pallas TPU kernels for the codec hot paths.

The XLA-fused jnp formulations in `kwave_tpu.encoder`/`bitpack` are the reference
implementations; these kernels keep the whole compression window resident in VMEM:

- `encode_window_float`: both half-window projections as MXU matmuls in one kernel
  (the fast, not-bit-identical formulation).
- `encode_window_float_exact`: the reference's per-step fp32 MAC loop
  (IndexOutputStream.cpp:438-448) — the production float path on TPU.
- `encode_window_40b_exact`: the reference's per-step decode->MAC->encode
  requantization loop (IndexOutputStream.cpp:411-437) without o round trips to HBM —
  the production 40-bit path on TPU.
"""

from kwave_tpu.ops.encode_pallas import (
    encode_window_40b_exact,
    encode_window_float,
    encode_window_float_exact,
)

__all__ = [
    "encode_window_float",
    "encode_window_float_exact",
    "encode_window_40b_exact",
]
