"""Full TPU radix sort vs lax.sort -- the complete-component measurement.

``scripts/bucketer_probe.py`` measured the irreducible per-level primitive
of a distribution sort at 471.5 ms/level (C = 6.29M, K = 32); this benches
the COMPLETE 3-phase radix sort (``ops/pallas/radix_sort.py``) against the
production ``lax.sort`` payload sort at the same operand shape as the
record sort (1 u32 key + 9 f32 payloads), closing the dead-end entry with
a full-sort number instead of a per-level extrapolation.

Configs:
  * key_bits=31: the packed (tile||22-bit-depth) record key at tile counts
    <= 512 -- 8 passes, the reference's own plan (sort.cpp:147).
  * key_bits=9: tile-only keys (hoist mode) -- 3 passes, the distribution
    sort's best case.

Run (serialize with other TPU jobs):
    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/radix_sort_bench.py > /tmp/radix_bench.log 2>&1 &
"""

import json
import os
import sys
import time

import numpy as np

SIZES = [int(s) for s in os.environ.get(
    "RADIX_SIZES", "524288,1048576,2097152").split(",")]
NPAYLOAD = 9
ITERS = 5
REPEATS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    """Force completion with a one-element host fetch -- under the axon
    tunnel block_until_ready alone returns early (repo probes fence this
    way, scripts/profile_stages.py)."""
    import jax
    leaf = jax.tree.leaves(x)[0]
    return float(np.asarray(leaf[(0,) * leaf.ndim]))


def bench(fn, args):
    t0 = time.time()
    fence(fn(*args))
    compile_s = time.time() - t0
    times = []
    for _ in range(REPEATS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        fence(out)
        times.append((time.time() - t0) / ITERS * 1000)
    return float(np.median(times)), compile_s


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.ops.pallas.radix_sort import (
        radix_sort)

    rng = np.random.default_rng(0)
    results = []
    for c in SIZES:
        keys31 = jnp.asarray(rng.integers(0, 1 << 31, c, dtype=np.uint32))
        keys9 = jnp.asarray(rng.integers(0, 512, c, dtype=np.uint32))
        vals = tuple(jnp.asarray(rng.standard_normal(c), np.float32)
                     for _ in range(NPAYLOAD))

        lax_sorter = jax.jit(lambda k, *v: jax.lax.sort(
            (k,) + v, num_keys=1, is_stable=True))
        ms_lax, cs = bench(lax_sorter, (keys31,) + vals)
        log(f"C={c}: lax.sort {ms_lax:.1f} ms (compile {cs:.0f}s)")

        row = {"C": c, "lax_ms": round(ms_lax, 1)}
        for name, keys, kb in (("radix31", keys31, 31),
                               ("radix9", keys9, 9)):
            try:
                sorter = jax.jit(
                    lambda k, *v, kb=kb: radix_sort(k, v, key_bits=kb))
                ms, cs = bench(sorter, (keys,) + vals)
                # exactness spot-check on hardware
                sk, sv = sorter(keys, *vals)
                ref = jax.lax.sort(
                    (keys, jnp.arange(c, dtype=jnp.int32)) + vals,
                    num_keys=1, is_stable=True)
                ok = bool(jnp.all(sk == ref[0])) and all(
                    bool(jnp.all(a == b)) for a, b in zip(sv, ref[2:]))
                row[f"{name}_ms"] = round(ms, 1)
                row[f"{name}_exact"] = ok
                log(f"C={c}: {name} {ms:.1f} ms exact={ok} "
                    f"(compile {cs:.0f}s)")
            except Exception as e:  # noqa: BLE001 -- record SMEM/VMEM limits
                row[f"{name}_error"] = f"{type(e).__name__}: {e}"[:300]
                log(f"C={c}: {name} FAILED: {e}")
        results.append(row)
        print(json.dumps(row), flush=True)
    print(json.dumps({"radix_bench": results}), flush=True)


if __name__ == "__main__":
    main()
