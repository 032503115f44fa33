"""Hardware lower bound for a Pallas carry-block distribution bucketer.

Round 2 rejected a Pallas radix/bucket sort for the record sort on a PAPER
costing; VERDICT r2 #2 demanded hardware. `scripts/sort_shape_probe.py`
already measured the lax.sort alternatives; this probe measures the OTHER
side: the irreducible per-level primitive of any carry-block bucketer
under Mosaic's constraints, at real scale.

Any single level that stably distributes a chunk of R records into K
bucket carry blocks must, per chunk and per bucket present:
  1. build a placement one-hot (R, R+carry) from the in-bucket ranks
     (VPU compares -- Mosaic has no per-lane scatter, so placement IS a
     matmul against a one-hot);
  2. compact via an MXU dot (16 field rows x R) @ (R, R+carry);
  3. flush full 128-record sub-blocks to HBM with an aligned DMA.
This kernel performs exactly those three (plus the rank cumsums), with
ZERO correctness bookkeeping (no fill carry-over, no overflow handling,
fixed flush target per bucket) -- every simplification removes work, so
the measured time LOWER-BOUNDS a real bucketer level. The real sort needs
1 level at K = num_tiles (impossible: carry VMEM) or 2+ levels at
K ~ 16-64.

Compare against: in-pipeline `lax.sort` (tile, depth) + 10 payloads =
68.3 ms at C = 6.29 M (scripts/profile_stages.py, flagship).

Run (serialize with other TPU jobs):
    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/bucketer_probe.py > /tmp/bucketer_probe.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

import numpy as np

C = int(os.environ.get("BUCKET_C", str(6 * 1024 * 1024)))
R = 512                    # records per chunk
K = int(os.environ.get("BUCKET_K", "32"))   # buckets this level
ROWS = 16                  # record field rows
CARRY = 128                # carry sub-block per bucket
ITERS = 10
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if os.environ.get("BUCKET_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = jax.devices()[0]
    log(f"device: {dev}; C={C} R={R} K={K}")
    interpret = dev.platform != "tpu"

    SLOTS = R + CARRY      # staging slots per bucket

    def kernel(blk_ref, out_ref, stage, sem):
        # blk_ref: (ROWS, R) VMEM block of this chunk's records (row 9=tile)
        tile = blk_ref[9:10, :]                        # (1, R) f32
        b_of = jnp.floor(tile * (K / 512.0))           # bucket of each record
        # one-hot built records-on-lanes (like records._dot_rt): slot_iota
        # rides sublanes so no cross-lane transposes are needed
        # Mosaic iota must be integer-typed; cast for the f32 compare
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (SLOTS, R), 0).astype(jnp.float32)
        for b in range(K):                             # static unroll
            mask = jnp.where(b_of == float(b), 1.0, 0.0)        # (1, R)
            # in-bucket rank: inclusive prefix sum over lanes (log2 R steps)
            x = mask
            s = 1
            while s < R:
                x = x + jnp.concatenate(
                    [jnp.zeros((1, s), jnp.float32), x[:, :-s]], axis=1)
                s *= 2
            slot = (x - 1.0) * mask + (1.0 - mask) * -2.0       # (1, R)
            onehot = jnp.where(slot_iota == slot, 1.0, 0.0)     # (SLOTS, R)
            staged = jax.lax.dot_general(
                blk_ref[:, :], onehot.astype(jnp.bfloat16).astype(jnp.float32),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (ROWS, SLOTS)
            stage[:, :] = staged
            # flush one aligned CARRY sub-block to this bucket's HBM region
            cp = pltpu.make_async_copy(
                stage.at[:, pl.ds(0, CARRY)],
                out_ref.at[:, pl.ds(b * CARRY, CARRY)], sem)
            cp.start()
            cp.wait()

    n_chunks = C // R
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((ROWS, R), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((ROWS, SLOTS), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    probe = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ROWS, K * CARRY), jnp.float32),
        interpret=interpret,
    )

    rng = np.random.default_rng(0)
    recs = rng.standard_normal((ROWS, C), dtype=np.float32)
    recs[9] = rng.integers(0, 512, C).astype(np.float32)
    recs = jnp.asarray(recs)

    fn = jax.jit(probe)

    def fence(x):
        jax.block_until_ready(x)
        return float(np.asarray(x).ravel()[0])

    t0 = time.time()
    out = fn(recs)
    fence(out)
    log(f"compile+run {time.time() - t0:.1f}s")
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(recs)
        fence(out)
        times.append((time.time() - t0) / ITERS * 1000)
    ms = float(np.median(times))
    log(f"bucketer LEVEL lower bound: {ms:.2f} ms  "
        f"({n_chunks} chunks x {K} buckets; vs lax.sort 68.3 ms total)")
    print(json.dumps({"bucketer_level_lower_bound_ms": round(ms, 2),
                      "C": C, "K": K, "R": R,
                      "lax_sort_total_ms": 68.3}))


if __name__ == "__main__":
    main()
