"""Real-capture-scale validation: bike-big.ply's splat count, end to end.

The reference's flagship capture is bike-big.ply with 3,616,103 splats
(``/root/reference/tests/plyParseTests.cpp:69``); no capture file ships in
this environment, so this script generates a synthetic scene with the same
splat count, round-trips it through the PLY writer and the native C++
loader (mmap + multithreaded activation), and renders 1080p forward and
forward+backward on the attached device -- 3.6x the headline bench's record
count, probing capacity/HBM headroom at real-capture scale.

Run (serialize with other python on this box):
    PYTHONPATH=/root/repo:/root/.axon_site nohup python scripts/scale_test.py \
        > /tmp/scale_test.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

import numpy as np

# bike-big.ply's count by default; SCALE_SPLATS=6000000 approximates the
# README-recommended bicycle iteration_30000 capture (~6M splats,
# /root/reference/README.md:8) -- BASELINE.md config-4's scale on one chip.
NUM_SPLATS = int(os.environ.get("SCALE_SPLATS", "3616103"))
WIDTH, HEIGHT = 1920, 1080
PLY_PATH = f"/tmp/scale_synth_{NUM_SPLATS}.ply"
ITERS = 5


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

    # ---- write + load through the native path ----------------------------
    if not os.path.exists(PLY_PATH):
        t0 = time.time()
        scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=99, extent=3.0,
                                            log_scale_range=(-5.8, -3.6))
        ply_io.save_ply(PLY_PATH, scene["means"], scene["quats"],
                        scene["scales"], scene["opacities"], scene["colors"])
        log(f"wrote {PLY_PATH} ({os.path.getsize(PLY_PATH) / 1e6:.0f} MB) "
            f"in {time.time() - t0:.1f}s")

    from openglgaussiansplattingrenderer_tpu.io import native

    t0 = time.time()
    params_np = native.load_splats(PLY_PATH, 255.0)
    load_s = time.time() - t0
    n = params_np["means"].shape[0]
    assert n == NUM_SPLATS, n
    log(f"native loader: {n} splats in {load_s:.2f}s "
        f"({n / load_s / 1e6:.1f} Msplat/s)")

    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=32, use_pallas=True, chunk=128,
        dup_capacity_factor=2.2)  # tight-rect allocation shrink (r2)
    log(f"capacity {cfg.capacity(n)} records")

    params = {k: jnp.asarray(v) for k, v in params_np.items()
              if k != "sh_rest"}
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    args = camera_args(cam)
    view, vp = jnp.asarray(args["view"]), jnp.asarray(args["vp"])
    cam_f = (args["focal_x"], args["focal_y"], args["tan_fovx"],
             args["tan_fovy"])

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[(0,) * leaf.ndim])

    fwd = jax.jit(functools.partial(render_arrays, width=WIDTH,
                                    height=HEIGHT, cfg=cfg))
    t0 = time.time()
    img, stats = fwd(params, view, vp, *cam_f)
    fence(img)
    log(f"fwd compile+run {time.time() - t0:.1f}s; stats "
        f"{ {k: np.asarray(v).tolist() for k, v in stats.items()} }")
    overflow = int(stats["overflow"])

    t0 = time.time()
    for _ in range(ITERS):
        img, _ = fwd(params, view, vp, *cam_f)
    fence(img)
    fwd_ms = (time.time() - t0) / ITERS * 1000

    def loss(p):
        img, _ = render_arrays(p, view, vp, *cam_f, WIDTH, HEIGHT, cfg)
        return jnp.mean(img[..., :3] ** 2)

    fb = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    l, grads = fb(params)
    fence(grads)
    log(f"fwd+bwd compile+run {time.time() - t0:.1f}s; loss {float(l):.6f}")

    t0 = time.time()
    for _ in range(ITERS):
        l, grads = fb(params)
    fence(grads)
    fb_ms = (time.time() - t0) / ITERS * 1000

    finite = all(bool(jnp.all(jnp.isfinite(v))) for v in grads.values())
    log(f"fwd {fwd_ms:.1f} ms/frame ({1000 / fwd_ms:.2f} fps), fwd+bwd "
        f"{fb_ms:.1f} ms/frame, grads finite: {finite}, overflow {overflow}")
    print(json.dumps({
        "num_splats": n, "native_load_s": round(load_s, 2),
        "fwd_ms": round(fwd_ms, 1), "fwdbwd_ms": round(fb_ms, 1),
        "fwd_fps": round(1000 / fwd_ms, 2), "overflow": overflow,
        "grads_finite": finite,
    }))


if __name__ == "__main__":
    main()
