"""Does lax.sort run faster on already-sorted input? (No -- proof.)

The temporal-coherence idea (reuse last frame's record order for small
camera deltas) only helps if a nearly-sorted input is cheaper to sort.
`lax.sort` lowers to a data-independent comparison network, so the answer
should be an exact "no"; this probe pins it with hardware numbers at the
flagship record count so the idea is never retried blind
(ARCHITECTURE.md dead-ends).

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/sorted_input_probe.py
"""

import json
import os
import sys
import time

import numpy as np

C = int(os.environ.get("PROBE_C", str(6_291_456)))
ITERS = 10


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"device: {jax.devices()[0]}; C={C}", file=sys.stderr, flush=True)

    rng = np.random.default_rng(0)
    key_rand = jnp.asarray(rng.integers(0, 1 << 31, C).astype(np.uint32))
    key_sorted = jnp.sort(key_rand)
    # nearly-sorted: sorted with 1% random swaps (the temporal-delta case)
    nk = C // 100
    idx = rng.choice(C, 2 * nk, replace=False)
    ks = np.asarray(key_sorted).copy()
    ks[idx[:nk]], ks[idx[nk:]] = ks[idx[nk:]], ks[idx[:nk]].copy()
    key_near = jnp.asarray(ks)
    payloads = tuple(jnp.asarray(rng.standard_normal(C).astype(np.float32))
                     for _ in range(9))

    fn = jax.jit(lambda k, p: jax.lax.sort((k,) + p, num_keys=1,
                                           is_stable=True))

    def timeit(k):
        out = fn(k, payloads)
        float(np.asarray(out[0][0]))
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(ITERS):
                out = fn(k, payloads)
            float(np.asarray(out[0][0]))
            ts.append((time.time() - t0) / ITERS * 1000)
        return round(float(np.median(ts)), 2)

    res = {"c": C,
           "random_ms": timeit(key_rand),
           "nearly_sorted_ms": timeit(key_near),
           "sorted_ms": timeit(key_sorted)}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
