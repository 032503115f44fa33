"""Expand-kernel block-size sweep at the flagship operating point.

Per-record expand cost scales with the input span IB = roundup(128+OB+1,
128) in BOTH compute units (one-hot build compares on the VPU, 16 x IB x 3
bf16 MACs on the MXU), so smaller output blocks cut absolute work per
record: OB=512 -> 768 span, OB=256 -> 512 (-33%), OB=128 -> 384 (-50%),
at the price of more grid steps (amortized by GS_EXP_OUTER) and relatively
more 128-floor DMA slack. This measures the real trade on hardware.

GS_EXP_OB binds at import, so each setting runs in a fresh subprocess:

    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/sweep_expand.py > /tmp/sweep_expand.log 2>&1 &

One setting directly (inner mode):
    GS_EXP_OB=256 GS_EXP_OUTER=16 python scripts/sweep_expand.py --inner
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

NUM_SPLATS = int(os.environ.get("SWEEP_SPLATS", "3616103"))
W, H = 1024, 512
CAP = int(os.environ.get("SWEEP_CAP", "6291456"))
ITERS = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def inner():
    import jax
    import jax.numpy as jnp
    import functools

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.ops import fastpath
    from openglgaussiansplattingrenderer_tpu.ops.pallas import records as rk
    from openglgaussiansplattingrenderer_tpu.render import camera_args

    cfg = RenderConfig.for_resolution(W, H, tile_px=32, use_pallas=True,
                                      chunk=256, depth_key="packed",
                                      capacity_records=CAP)
    scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=99, extent=3.0,
                                        log_scale_range=(-5.8, -3.6))
    cam = Camera(0.0, 0.0, -8.0, width=W, height=H)
    a = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view, vp = jnp.asarray(a["view"]), jnp.asarray(a["vp"])
    cam_f = (a["focal_x"], a["focal_y"], a["tan_fovx"], a["tan_fovy"])

    def run(stop):
        fn = jax.jit(functools.partial(
            fastpath.render_fast, width=W, height=H, cfg=cfg,
            stop_after=stop))
        out = fn(params, view, vp, *cam_f)
        leaf = jax.tree.leaves(out)[0]
        float(leaf[(0,) * leaf.ndim])
        ts = []
        for _ in range(3):
            t0 = time.time()
            for _ in range(ITERS):
                out = fn(params, view, vp, *cam_f)
            leaf = jax.tree.leaves(out)[0]
            float(leaf[(0,) * leaf.ndim])
            ts.append((time.time() - t0) / ITERS * 1000)
        return float(np.median(ts))

    pre = run("cumsum")
    post = run("expand")
    full = run(None)
    print(json.dumps({"ob": rk.OB, "ib": rk.IB, "outer": rk.EXP_OUTER,
                      "expand_ms": round(post - pre, 2),
                      "fwd_ms": round(full, 2)}), flush=True)


def main():
    results = []
    for ob, outer in ((512, 8), (256, 16), (128, 32), (1024, 4)):
        env = dict(os.environ, GS_EXP_OB=str(ob), GS_EXP_OUTER=str(outer))
        log(f"--- OB={ob} OUTER={outer} ---")
        p = subprocess.run(
            [sys.executable, __file__, "--inner"], env=env,
            capture_output=True, text=True, timeout=3600)
        log(p.stderr[-2000:] if p.stderr else "")
        line = (p.stdout.strip().splitlines() or [""])[-1]
        log(line)
        try:
            results.append(json.loads(line))
        except json.JSONDecodeError:
            results.append({"ob": ob, "error": p.returncode})
    print(json.dumps(results, indent=1), flush=True)


if __name__ == "__main__":
    if "--inner" in sys.argv:
        inner()
    else:
        main()
