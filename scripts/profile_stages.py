"""Measured per-stage timing of the fast path on the real device.

VERDICT r1 (missing #4 / weak #5): round-1 stage attribution came from
hand-noted microbenches with +/-30% jitter whose sum exceeded the measured
frame. This script measures each stage as a complete compiled program
(prefix-timing through ``render_fast(stop_after=...)``) plus the composite
kernel in isolation, with proper one-element host fences, and prints a
consistent table: stage cost = prefix[k] - prefix[k-1].

Run on the TPU (serialize with other python processes on this box):
    nohup python scripts/profile_stages.py > /tmp/profile_stages.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

import numpy as np

# Defaults = the 1M/1080p headline bench; env overrides profile other
# operating points (e.g. the flagship 3.6M/1024x512: PROF_SPLATS=3616103
# PROF_W=1024 PROF_H=512 PROF_SCENE=uniform PROF_CAP=6291456).
NUM_SPLATS = int(os.environ.get("PROF_SPLATS", "1000000"))
WIDTH = int(os.environ.get("PROF_W", "1920"))
HEIGHT = int(os.environ.get("PROF_H", "1080"))
ITERS = int(os.environ.get("PROF_ITERS", "20"))
REPEATS = 3
TILE_PX = int(os.environ.get("PROF_TILE_PX", "32"))
CHUNK = int(os.environ.get("PROF_CHUNK", "256"))
CAP = os.environ.get("PROF_CAP")  # capacity_records override
SCENE = os.environ.get("PROF_SCENE", "bench")
SKIP_BWD = bool(int(os.environ.get("PROF_SKIP_BWD", "0")))
BWD_STAGES = bool(int(os.environ.get("PROF_BWD_STAGES", "0")))
DEPTH_KEY = os.environ.get("PROF_DEPTH_KEY", "pair")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(leaf[(0,) * leaf.ndim])


def time_fn(fn, *args):
    """Median over REPEATS of the mean per-iteration time of ITERS calls."""
    out = fn(*args)
    fence(out)  # compile + warm
    results = []
    for _ in range(REPEATS):
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(*args)
        fence(out)
        results.append((time.time() - t0) / ITERS * 1000)
    return float(np.median(results)), out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.ops import fastpath
    from openglgaussiansplattingrenderer_tpu.render import camera_args

    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=TILE_PX, use_pallas=True, chunk=CHUNK,
        dup_capacity_factor=3.0,  # tight-rect allocation: 2.50M records at the bench scene
        depth_key=DEPTH_KEY,
        capacity_records=int(CAP) if CAP else None)
    if SCENE == "bench":
        scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                            log_scale_range=(-5.5, -3.2))
    elif SCENE == "uniform":  # the flagship/scale_test scene
        scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=99, extent=3.0,
                                            log_scale_range=(-5.8, -3.6))
    else:
        scene = ply_io.make_clustered_scene(NUM_SPLATS, seed=7, extent=3.0)
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    args = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view = jnp.asarray(args["view"])
    vp = jnp.asarray(args["vp"])
    cam_f = (args["focal_x"], args["focal_y"], args["tan_fovx"], args["tan_fovy"])

    stages = ["prep", "sort1", "cumsum", "expand", "sort2", None]
    if not cfg.hoist_depth_sort:
        stages.remove("sort1")  # no N-sized depth pre-sort in this mode
    prefix_ms = {}
    for s in stages:
        name = s or "full"
        fn = jax.jit(functools.partial(
            fastpath.render_fast, width=WIDTH, height=HEIGHT, cfg=cfg,
            stop_after=s))
        t0 = time.time()
        ms, _ = time_fn(fn, params, view, vp, *cam_f)
        prefix_ms[name] = ms
        log(f"prefix[{name:7s}] = {ms:8.2f} ms   (compile+measure "
            f"{time.time() - t0:.0f}s)")

    log("\n--- stage costs (prefix differences) ---")
    table = {}
    prev = 0.0
    for s in stages:
        name = s or "composite"
        cost = prefix_ms[s or "full"] - prev
        prev = prefix_ms[s or "full"]
        table[name] = round(cost, 2)
        log(f"{name:10s} {cost:8.2f} ms")

    # --- composite kernel in isolation (fwd and fwd+bwd) ------------------
    sort2_fn = jax.jit(functools.partial(
        fastpath.render_fast, width=WIDTH, height=HEIGHT, cfg=cfg,
        stop_after="sort2"))
    _, aux = sort2_fn(params, view, vp, *cam_f)
    sf2 = tuple(jax.block_until_ready(f) for f in aux["fields"])
    bounds = aux["bounds"]
    cap = sf2[0].shape[0]

    def comp(fields, bounds):
        tiled, _, _ = fastpath.composite_sorted(
            fields, bounds, capacity=cap, num_tiles=cfg.num_tiles,
            tile_ids=jnp.arange(cfg.num_tiles, dtype=jnp.int32),
            width=WIDTH, height=HEIGHT, cfg=cfg)
        return tiled

    comp_fwd = jax.jit(comp)
    ms_fwd, _ = time_fn(comp_fwd, sf2, bounds)
    log(f"composite fwd (isolated)     = {ms_fwd:8.2f} ms")

    ms_fb = ms_full_fb = float("nan")
    if not SKIP_BWD:
        comp_fb = jax.jit(jax.value_and_grad(
            lambda f, b: jnp.sum(comp(f, b)[:, :, 0:3] ** 2)))
        ms_fb, _ = time_fn(comp_fb, sf2, bounds)
        log(f"composite fwd+bwd (isolated) = {ms_fb:8.2f} ms "
            f"(bwd-only ~ {ms_fb - ms_fwd:.2f} ms)")

        # --- full fwd+bwd --------------------------------------------------
        def loss(p):
            img, _ = fastpath.render_fast(p, view, vp, *cam_f, WIDTH, HEIGHT,
                                          cfg)
            return jnp.mean(img[..., :3] ** 2)

        fb = jax.jit(jax.value_and_grad(loss))
        ms_full_fb, _ = time_fn(fb, params)
        log(f"full fwd+bwd                 = {ms_full_fb:8.2f} ms")

    # --- backward attribution by fwd+bwd prefix-timing --------------------
    # grad(sum(stage_k output)) runs stages 1..k forward AND their
    # transposes; bwd cost of stage k = (fwdbwd prefix difference) - (fwd
    # prefix difference). "cumsum" is int-valued (no grad path), so the
    # differentiable prefixes are prep -> expand -> sort2 -> full.
    bwd_table = {}
    if BWD_STAGES and not SKIP_BWD:
        log("\n--- backward prefixes (value_and_grad of stage sums) ---")
        bstages = ["prep", "expand", "sort2", None]

        def loss_at(s):
            def f(p):
                out, aux = fastpath.render_fast(
                    p, view, vp, *cam_f, WIDTH, HEIGHT, cfg, stop_after=s)
                if s == "sort2":
                    return sum(jnp.sum(x * x) for x in aux["fields"])
                if s is None:
                    return jnp.sum(out[..., :3] ** 2)
                return jnp.sum(out * out)
            return f

        fb_prefix = {}
        for s in bstages:
            name = s or "full"
            fn = jax.jit(jax.value_and_grad(loss_at(s)))
            t0 = time.time()
            ms, _ = time_fn(fn, params)
            fb_prefix[name] = ms
            log(f"fwd+bwd prefix[{name:7s}] = {ms:8.2f} ms   "
                f"(compile+measure {time.time() - t0:.0f}s)")
        log("\n--- backward-only stage costs "
            "(fwd+bwd prefix diff minus fwd prefix diff) ---")
        fwd_of = {"prep": prefix_ms.get("prep", 0.0),
                  "expand": prefix_ms.get("expand", 0.0),
                  "sort2": prefix_ms.get("sort2", 0.0),
                  "full": prefix_ms.get("full", 0.0)}
        prev_fb = prev_fw = 0.0
        for s in bstages:
            name = s or "full"
            dfb = fb_prefix[name] - prev_fb
            dfw = fwd_of[name] - prev_fw
            prev_fb, prev_fw = fb_prefix[name], fwd_of[name]
            bwd_table[name if s else "composite"] = round(dfb - dfw, 2)
            log(f"{name if s else 'composite':10s} bwd {dfb - dfw:8.2f} ms "
                f"(fwd {dfw:.2f})")

    print(json.dumps({
        "prefix_ms": {k: round(v, 2) for k, v in prefix_ms.items()},
        "stage_ms": table,
        "composite_fwd_ms": round(ms_fwd, 2),
        "composite_fwdbwd_ms": round(ms_fb, 2),
        "full_fwdbwd_ms": round(ms_full_fb, 2),
        "bwd_stage_ms": bwd_table,
    }))


if __name__ == "__main__":
    main()
