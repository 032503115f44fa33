"""Persistent-cache key vs source-location sensitivity (VERDICT r4 weak #8).

r4 root-caused the bench recompiles: ANY line-number-shifting edit changes
the persistent compilation-cache keys, because source locations reach the
serialized program (Mosaic kernel payloads carry MLIR locations). This
probe measures whether location-stripping config flags fix it from user
code:

  for each flag setting (run in a SUBPROCESS so flags bind before any
  trace), compile the same tiny Pallas program twice -- once as-is and once
  with 7 blank lines prepended to the kernel's source (simulating an edit
  above it) -- and compare the persistent-cache keys computed by
  jax._src.cache_key.get (the exact function the compilation cache keys
  on).

Run on the TPU (Mosaic payloads only exist when lowering for TPU):
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/cache_key_probe.py
"""

import json
import os
import subprocess
import sys


def log(*a):
    print(*a, file=sys.stderr, flush=True)


SRC = '''
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
{pad}
def kernel(x_ref, o_ref):
    o_ref[...] = x_ref[...] * 2.0 + 1.0

def f(x):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32))(x)
'''


def child():
    """Print the cache key for PAD_LINES source-shifted builds."""
    import jax
    import jax.numpy as jnp
    from jax._src import cache_key
    from jax._src import compiler

    pad = int(os.environ["PAD_LINES"])
    ns = {}
    exec(compile(SRC.format(pad="\n" * pad),
                 f"<probe_pad{pad}>", "exec"), ns)
    x = jnp.ones((8, 128), jnp.float32)
    lowered = jax.jit(ns["f"]).lower(x)
    backend = jax.devices()[0].client
    import numpy as np

    module = lowered.compiler_ir()          # MLIR (stablehlo) module
    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    print(cache_key.get(module, np.array(jax.devices()), opts, backend))


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child()
        return

    settings = [
        ("default", {}),
        ("no_full_tracebacks",
         {"JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS": "0"}),
        ("loc_limit_0", {"JAX_TRACEBACK_IN_LOCATIONS_LIMIT": "0"}),
        ("both", {"JAX_INCLUDE_FULL_TRACEBACKS_IN_LOCATIONS": "0",
                  "JAX_TRACEBACK_IN_LOCATIONS_LIMIT": "0"}),
    ]
    results = {}
    for name, flags in settings:
        keys = []
        ok = True
        for pad in (0, 7):
            env = dict(os.environ, PAD_LINES=str(pad), **flags)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child"],
                env=env, capture_output=True, text=True, timeout=600)
            if r.returncode != 0:
                log(f"{name} pad={pad}: child failed:\n{r.stderr[-800:]}")
                ok = False
                break
            keys.append(r.stdout.strip())
        if not ok:
            results[name] = None
            continue
        stable = keys[0] == keys[1]
        results[name] = stable
        log(f"{name}: cache key stable under a 7-line source shift: "
            f"{stable}")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
