"""Sequential-grid Pallas prefix sums.

XLA's 1-D cumsum on TPU runs ~1000x off roofline at millions of elements
(measured 600ms for 8M int32 on v5e -- see ops/pallas/records.py). This is
the bandwidth-bound version: lane-blocked Hillis-Steele scans within each
block, a scalar carry in SMEM across the sequential grid. The reference's
own prefix machinery (``prefixBins.glsl``, ``computePrefixSum.glsl``) is the
256-element ancestor of this kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 2048  # elements per grid step (1, BLK) lanes


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


def _scan_lanes(x):
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [jnp.zeros(x.shape[:1] + (s,), x.dtype), x[:, :-s]], axis=1)
        s *= 2
    return x


def _cumsum_kernel(x_ref, out_ref, carry):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        carry[0] = jnp.zeros((), x_ref.dtype)

    x = x_ref[0:1, :]
    inc = _scan_lanes(x)
    out_ref[0:1, :] = inc + carry[0]
    carry[0] = carry[0] + jnp.sum(x)


def cumsum(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive 1-D cumsum at HBM bandwidth (int32/float32)."""
    n = x.shape[0]
    n_pad = -(-n // BLK) * BLK
    x2 = jnp.zeros((1, n_pad), x.dtype).at[0, 0:n].set(x)
    out = pl.pallas_call(
        _cumsum_kernel,
        grid=(n_pad // BLK,),
        in_specs=[pl.BlockSpec((1, BLK), lambda b: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, BLK), lambda b: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SMEM((1,), x.dtype)],
        out_shape=jax.ShapeDtypeStruct((1, n_pad), x.dtype),
        interpret=_interpret(),
    )(x2)
    return out[0, 0:n]
