"""Measure sort2 alternatives on real hardware: payload sort vs sort+gather.

The record sort (reference's radix sort role, `sort.cpp:158-197`) currently
runs as one 11-operand ``lax.sort`` (key + source idx + 9 payload fields):
every merge pass moves ~44 B/record. Alternative: sort only (key, iota)
(8 B/record through the sort) and then apply the permutation with one XLA
gather per field. Whether TPU XLA's dynamic gather beats the payload
traffic is hardware-empirical -- this script measures both on the bench
scene's record count.

Run AFTER other TPU jobs finish (serialize on the tunnel):
    nohup python scripts/sort2_experiment.py > /tmp/sort2_exp.log 2>&1 &
"""

import sys
import time

import numpy as np

C = 2_500_096   # bench-scene record capacity (tight-rect, 2.5x 1M)
NUM_FIELDS = 9
NUM_TILES = 2040
ITERS = 20
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, NUM_TILES + 1, C, dtype=np.int32))
    fields = tuple(jnp.asarray(rng.standard_normal(C, dtype=np.float32))
                   for _ in range(NUM_FIELDS))

    def fence(x):
        # block on ALL output buffers (not just one element of one leaf),
        # then fetch a scalar: on this tunnel backend block_until_ready has
        # been observed returning before queued work executes, so the host
        # fetch is the reliable fence -- belt and braces.
        jax.block_until_ready(x)
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[0])

    def time_fn(fn, *args):
        out = fn(*args)
        fence(out)
        results = []
        for _ in range(REPEATS):
            t0 = time.time()
            for _ in range(ITERS):
                out = fn(*args)
            fence(out)
            results.append((time.time() - t0) / ITERS * 1000)
        return float(np.median(results))

    @jax.jit
    def payload_sort(key, fields):
        idx = jnp.arange(C, dtype=jnp.int32)
        out = jax.lax.sort((key, idx) + fields, num_keys=1, is_stable=True)
        return out

    @jax.jit
    def sort_then_gather(key, fields):
        idx = jnp.arange(C, dtype=jnp.int32)
        sk, si = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
        sf = tuple(jnp.take(f, si, axis=0) for f in fields)
        return (sk, si) + sf

    @jax.jit
    def sort_only(key):
        idx = jnp.arange(C, dtype=jnp.int32)
        return jax.lax.sort((key, idx), num_keys=1, is_stable=True)

    t0 = time.time()
    ms_payload = time_fn(payload_sort, key, fields)
    log(f"11-operand payload sort: {ms_payload:7.2f} ms "
        f"(compile+measure {time.time()-t0:.0f}s)")

    t0 = time.time()
    ms_sg = time_fn(sort_then_gather, key, fields)
    log(f"2-op sort + 9 gathers:   {ms_sg:7.2f} ms "
        f"(compile+measure {time.time()-t0:.0f}s)")

    t0 = time.time()
    ms_s = time_fn(sort_only, key)
    log(f"2-op sort alone:         {ms_s:7.2f} ms "
        f"(compile+measure {time.time()-t0:.0f}s)")

    # parity
    a = payload_sort(key, fields)
    b = sort_then_gather(key, fields)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    log("parity: exact")


if __name__ == "__main__":
    main()
