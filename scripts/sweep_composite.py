"""Sweep composite-kernel tuning knobs on the real device, in isolation.

Builds the bench scene's (tile, depth)-sorted record set once, then times
the isolated composite forward (and backward) for each FWD_EXIT_ROWS
setting -- the pixel-block height that doubles as the saturation
early-exit granularity. Finer blocks exit sooner on saturated regions but
pay per-block branch + small-dot overhead on 27k chunk-steps.

Run on the TPU (serialize with other python processes on this box):
    nohup python scripts/sweep_composite.py > /tmp/sweep_composite.log 2>&1 &
"""

import functools
import os
import sys
import time

import numpy as np

# Defaults = the 1M/1080p bench scene; env overrides sweep other operating
# points (e.g. the flagship clustered point: SWEEP_SPLATS=3616103
# SWEEP_W=1024 SWEEP_H=512 SWEEP_SCENE=clustered SWEEP_CAP=6291456).
NUM_SPLATS = int(os.environ.get("SWEEP_SPLATS", "1000000"))
WIDTH = int(os.environ.get("SWEEP_W", "1920"))
HEIGHT = int(os.environ.get("SWEEP_H", "1080"))
SCENE = os.environ.get("SWEEP_SCENE", "bench")
CAP = os.environ.get("SWEEP_CAP")
ITERS = int(os.environ.get("SWEEP_ITERS", "20"))
REPEATS = 3
# (power formulation, exit rows, chunk, sub_chunks, sub_gate);
# exit rows None -> whole tile; sub_chunks 1 -> whole-chunk gating
# SWEEP_FAST=1 trims to the exit-model-predicted contenders (cold compiles
# on the tunnel run ~3 min/program, so the full matrix is a multi-hour run).
VARIANTS = [
    ("direct", None, 128, 1, True), ("direct", 8, 128, 1, True),
    ("sos", None, 128, 1, True), ("sos", 8, 128, 1, True),
    ("sep", None, 128, 1, True), ("sep", 8, 128, 1, True),
    ("direct", None, 256, 1, True), ("direct", 8, 256, 1, True),
    # sub-chunks shorten the per-pair scan + min-reduce (~3*log2(sub) ops)
    # AND add record-axis exits, at ~sub gate branches per chunk;
    # sub_gate=False isolates gate cost from the scan-depth savings
    ("direct", 8, 128, 4, True), ("sep", 8, 128, 4, True),
    ("sep", 8, 128, 8, True), ("direct", 8, 256, 8, True),
    ("sep", 8, 128, 4, False), ("sep", 8, 128, 8, False),
]
BWD_VARIANTS = [("direct", None, 1), ("direct", 8, 1),
                ("sep", None, 1), ("sep", 8, 1),
                ("direct", 8, 4), ("sep", 8, 4)]

if os.environ.get("SWEEP_FAST"):
    VARIANTS = [("direct", None, 128, 1, True), ("direct", 8, 128, 1, True),
                ("sep", 8, 128, 1, True), ("sep", 8, 128, 4, True)]
    BWD_VARIANTS = [("direct", None, 1), ("direct", 8, 1), ("sep", 8, 1)]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def fence(x):
    import jax

    leaf = jax.tree.leaves(x)[0]
    return float(leaf[(0,) * leaf.ndim])


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
    from openglgaussiansplattingrenderer_tpu.ops.pallas import composite as pc
    from openglgaussiansplattingrenderer_tpu.render import camera_args

    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=32, use_pallas=True, chunk=128,
        dup_capacity_factor=3.0,  # tight-rect: 2.50M records at the bench scene
        capacity_records=int(CAP) if CAP else None)
    if SCENE == "bench":
        scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                            log_scale_range=(-5.5, -3.2))
    elif SCENE == "uniform":
        scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=99, extent=3.0,
                                            log_scale_range=(-5.8, -3.6))
    else:
        scene = ply_io.make_clustered_scene(NUM_SPLATS, seed=7, extent=3.0)
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    args = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view = jnp.asarray(args["view"])
    vp = jnp.asarray(args["vp"])
    cam_f = (args["focal_x"], args["focal_y"], args["tan_fovx"],
             args["tan_fovy"])

    sort2_fn = jax.jit(functools.partial(
        fastpath.render_fast, width=WIDTH, height=HEIGHT, cfg=cfg,
        stop_after="sort2"))
    _, aux = sort2_fn(params, view, vp, *cam_f)
    sf2 = tuple(aux["fields"])
    bounds = aux["bounds"]
    # one-element fences only -- block_until_ready over many large outputs
    # has wedged this backend
    fence(bounds)
    cap = sf2[0].shape[0]
    log(f"records sorted; capacity {cap}")

    import dataclasses

    def comp(fields, bounds, c):
        tiled, _, _ = fastpath.composite_sorted(
            fields, bounds, capacity=cap, num_tiles=c.num_tiles,
            tile_ids=jnp.arange(c.num_tiles, dtype=jnp.int32),
            width=WIDTH, height=HEIGHT, cfg=c)
        return tiled

    def comp_bwd(fields, bounds, c):
        def loss(fields):
            return jnp.mean(comp(fields, bounds, c)[:, :, 0:3] ** 2)

        return jax.value_and_grad(loss)(fields)

    for form, rows, chunk, subc, gate in (
            [] if os.environ.get("SWEEP_NO_FWD") else VARIANTS):
        pc.POWER_FORM = form
        pc.FWD_EXIT_ROWS = rows
        pc.SUB_CHUNKS = subc
        pc.SUB_GATE = gate
        pc._make_composite_op.cache_clear()
        c = dataclasses.replace(cfg, chunk=chunk)
        t0 = time.time()
        try:
            fwd_ms = time_fn(jax.jit(functools.partial(comp, c=c)),
                             sf2, bounds)
        except Exception as e:      # lowering failures must not kill the run
            log(f"form={form:6s} exit_rows={str(rows):5s} chunk={chunk} "
                f"sub={subc} gate={int(gate)}: FAILED "
                f"{type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"form={form:6s} exit_rows={str(rows):5s} chunk={chunk} "
            f"sub={subc} gate={int(gate)}: composite fwd {fwd_ms:7.2f} ms  "
            f"(compile+measure {time.time()-t0:.0f}s)")

    if os.environ.get("SWEEP_NO_BWD"):
        return
    # backward: power-form x exit-granularity x sub-chunk variants (the
    # backward recompute follows POWER_FORM and SUB_CHUNKS, so they are
    # bwd knobs too). SWEEP_BWD_CHUNK overrides the record chunk (the
    # flagship point runs 256).
    pc.FWD_EXIT_ROWS = 8   # production default -- the bwd program
    pc.SUB_GATE = True     # includes the fwd recompute
    if os.environ.get("SWEEP_BWD_CHUNK"):
        cfg = dataclasses.replace(
            cfg, chunk=int(os.environ["SWEEP_BWD_CHUNK"]))
    for form, rows, subc in BWD_VARIANTS:
        pc.POWER_FORM = form
        pc.BWD_EXIT_ROWS = rows
        pc.SUB_CHUNKS = subc
        pc._make_composite_op.cache_clear()
        t0 = time.time()
        try:
            fb_ms = time_fn(jax.jit(functools.partial(comp_bwd, c=cfg)),
                            sf2, bounds)
        except Exception as e:
            log(f"bwd form={form:6s} exit_rows={str(rows):5s} sub={subc}: "
                f"FAILED {type(e).__name__}: {str(e)[:200]}")
            continue
        log(f"bwd form={form:6s} exit_rows={str(rows):5s} sub={subc}: "
            f"composite fwd+bwd {fb_ms:7.2f} ms  "
            f"(compile+measure {time.time()-t0:.0f}s)")

    # restore module defaults so anything appended below measures what its
    # label says
    pc.POWER_FORM = "direct"
    pc.BWD_EXIT_ROWS = None
    pc.SUB_CHUNKS = 1
    pc.SUB_GATE = True
    pc._make_composite_op.cache_clear()


if __name__ == "__main__":
    main()
