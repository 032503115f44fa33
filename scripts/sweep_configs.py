"""Hardware sweep of the two pipeline shape knobs: tile size and chunk.

Pairs composited = records x tile pixels; records grow as tiles shrink
(duplication) while per-record work falls. Chunk sets the DMA/scan/early-
exit granularity and the unaligned-boundary waste (~chunk/2 masked lanes
per tile). Only a measurement can place the optimum -- compile times on
this tunnel are ~200 s/program, so each config is timed as the two real
programs (fwd, fwd+bwd) at the bench scene.

Run: PYTHONPATH=/root/repo:/root/.axon_site nohup python \
     scripts/sweep_configs.py > /tmp/sweep.log 2>&1 &
"""

import functools
import json
import sys
import time

import numpy as np

NUM_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
ITERS = 10

CONFIGS = [
    # (tile_px, chunk, dup_capacity_factor)
    (32, 256, 4.0),   # current default
    (32, 128, 4.0),
    (32, 512, 4.0),
    (24, 256, 5.0),
    (16, 256, 6.0),
]


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.render import camera_args, render_arrays

    scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                        log_scale_range=(-5.5, -3.2))
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    args = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view, vp = jnp.asarray(args["view"]), jnp.asarray(args["vp"])
    cam_f = (args["focal_x"], args["focal_y"], args["tan_fovx"],
             args["tan_fovy"])

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[(0,) * leaf.ndim])

    results = []
    for tile_px, chunk, dupf in CONFIGS:
        cfg = RenderConfig.for_resolution(
            WIDTH, HEIGHT, tile_px=tile_px, use_pallas=True, chunk=chunk,
            dup_capacity_factor=dupf)
        tag = f"tile{tile_px}/chunk{chunk}/dup{dupf}"
        log(f"--- {tag}: grid {cfg.grid_x}x{cfg.grid_y}, "
            f"capacity {cfg.capacity(NUM_SPLATS)}")

        fwd = jax.jit(functools.partial(render_arrays, width=WIDTH,
                                        height=HEIGHT, cfg=cfg))
        t0 = time.time()
        img, stats = fwd(params, view, vp, *cam_f)
        fence(img)
        over = int(stats["overflow"])
        recs = int(stats["num_records"])
        log(f"  compile+run {time.time() - t0:.0f}s, records {recs}, "
            f"overflow {over}, max_bin {int(stats['max_bin'])}")

        t0 = time.time()
        for _ in range(ITERS):
            img, _ = fwd(params, view, vp, *cam_f)
        fence(img)
        fwd_ms = (time.time() - t0) / ITERS * 1000

        def loss(p, cfg=cfg):
            img, _ = render_arrays(p, view, vp, *cam_f, WIDTH, HEIGHT, cfg)
            return jnp.mean(img[..., :3] ** 2)

        fb = jax.jit(jax.value_and_grad(loss))
        t0 = time.time()
        out = fb(params)
        fence(out)
        log(f"  fwd+bwd compile+run {time.time() - t0:.0f}s")
        t0 = time.time()
        for _ in range(ITERS):
            out = fb(params)
        fence(out)
        fb_ms = (time.time() - t0) / ITERS * 1000

        log(f"  => fwd {fwd_ms:.1f} ms, fwd+bwd {fb_ms:.1f} ms")
        results.append({"tile_px": tile_px, "chunk": chunk, "dup": dupf,
                        "records": recs, "overflow": over,
                        "fwd_ms": round(fwd_ms, 1),
                        "fwdbwd_ms": round(fb_ms, 1)})
        print(json.dumps(results[-1]), flush=True)

    log("\n==== summary ====")
    for r in results:
        log(f"tile{r['tile_px']:3d} chunk{r['chunk']:4d}: "
            f"fwd {r['fwd_ms']:7.1f}  fwd+bwd {r['fwdbwd_ms']:7.1f}  "
            f"records {r['records']}")


if __name__ == "__main__":
    main()
