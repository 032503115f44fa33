"""Flagship benchmark: the reference's own operating point, forward-only.

The reference's flagship use is bike-big.ply -- 3,616,103 splats
(``/root/reference/tests/plyParseTests.cpp:69``) -- rendered interactively at
its default 1024x512 resolution (``/root/reference/include/Camera.h:55,62``,
``main.cpp:18,47``). "Match or beat" is measured HERE: forward-only fps at
that splat count and resolution, on two scene statistics:

- **uniform**: the bench generator's uniform-random cloud (same params as
  ``scripts/scale_test.py``), near-uniform tile occupancy;
- **clustered**: ``make_clustered_scene``'s Zipf-weighted Gaussian-mixture
  layout with lognormal splat sizes -- the heavy-tailed occupancy real SfM
  captures show (max_bin >> mean_bin), stressing saturation early-exit and
  load balance the way bike-big would.

Capacity is autotuned per scene (``render.autotune_capacity``): one N-sized
probe + host fetch at setup time pins the record sort length to the measured
record count + margin (the reference reads its duplicate counter back every
frame, Splats.cpp:579-583; we pay one fetch at tuning time only).

Run (serialize with other TPU jobs on this box):
    PYTHONPATH=/root/repo nohup python scripts/flagship_bench.py \
        > /tmp/flagship.log 2>&1 &
"""

import functools
import json
import os
import sys
import time

import numpy as np

NUM_SPLATS = int(os.environ.get("FLAGSHIP_SPLATS", "3616103"))
WIDTH, HEIGHT = 1024, 512
ITERS = int(os.environ.get("FLAGSHIP_ITERS", "20"))
REPEATS = 3
TILE_PX = int(os.environ.get("FLAGSHIP_TILE_PX", "32"))
CHUNK = int(os.environ.get("FLAGSHIP_CHUNK", "128"))
WITH_BWD = bool(int(os.environ.get("FLAGSHIP_BWD", "0")))
# default follows RenderConfig.hoist_depth_sort (False since r3)
HOIST = bool(int(os.environ.get("FLAGSHIP_HOIST", "0")))
DEPTH_KEY = os.environ.get("FLAGSHIP_DEPTH_KEY", "pair")
# "q16" = the packed-payload inference mode (needs DEPTH_KEY=packed)
SORT_PAYLOAD = os.environ.get("FLAGSHIP_SORT_PAYLOAD", "f32")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("FLAGSHIP_CPU"):  # smoke-test lane (sitecustomize
        jax.config.update("jax_platforms", "cpu")  # pins the TPU plugin)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    # the package __init__ re-exports render() the function, shadowing the
    # module attribute -- import the module explicitly
    import importlib

    R = importlib.import_module("openglgaussiansplattingrenderer_tpu.render")

    scenes = {
        "uniform": lambda: ply_io.make_synthetic_scene(
            NUM_SPLATS, seed=99, extent=3.0, log_scale_range=(-5.8, -3.6)),
        "clustered": lambda: ply_io.make_clustered_scene(
            NUM_SPLATS, seed=7, extent=3.0),
    }

    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    args = R.camera_args(cam)
    view, vp = jnp.asarray(args["view"]), jnp.asarray(args["vp"])
    cam_f = (args["focal_x"], args["focal_y"], args["tan_fovx"],
             args["tan_fovy"])
    base = RenderConfig.for_resolution(WIDTH, HEIGHT, tile_px=TILE_PX,
                                       use_pallas=True, chunk=CHUNK,
                                       hoist_depth_sort=HOIST,
                                       depth_key=DEPTH_KEY,
                                       sort_payload=SORT_PAYLOAD)
    log(f"grid {base.grid_x}x{base.grid_y} ({base.num_tiles} tiles)")

    def fence(x):
        jax.block_until_ready(x)
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[(0,) * leaf.ndim])

    # ---- probe record counts, share one capacity bucket across scenes ----
    params_by_scene, caps = {}, {}
    for name, gen in scenes.items():
        scene = gen()
        params = {k: jnp.asarray(v) for k, v in scene.items()
                  if k != "sh_rest"}
        params_by_scene[name] = params
        cfg_t = R.autotune_capacity(params, view, vp, *cam_f, WIDTH, HEIGHT,
                                    base)
        caps[name] = cfg_t.capacity_records
        log(f"{name}: autotuned capacity {caps[name]}")
    import dataclasses

    cap = max(caps.values())
    cfg = dataclasses.replace(base, capacity_records=cap)
    log(f"shared capacity bucket: {cap}")

    fwd = jax.jit(functools.partial(R.render_arrays, width=WIDTH,
                                    height=HEIGHT, cfg=cfg))

    def loss(p):
        img, _ = R.render_arrays(p, view, vp, *cam_f, WIDTH, HEIGHT, cfg)
        return jnp.mean(img[..., :3] ** 2)

    fb = jax.jit(jax.value_and_grad(loss))

    results = {}
    for name, params in params_by_scene.items():
        t0 = time.time()
        img, stats = fwd(params, view, vp, *cam_f)
        fence(img)
        st = {k: np.asarray(v).tolist() for k, v in stats.items()}
        log(f"{name}: fwd compile+run {time.time() - t0:.1f}s; stats {st}")
        assert int(stats["overflow"]) == 0, f"{name}: capacity overflow"

        times = []
        for _ in range(REPEATS):
            t0 = time.time()
            for _ in range(ITERS):
                img, _ = fwd(params, view, vp, *cam_f)
            fence(img)
            times.append((time.time() - t0) / ITERS * 1000)
        fwd_ms = float(np.median(times))
        out = {"scene": name, "fwd_ms": round(fwd_ms, 1),
               "fps": round(1000 / fwd_ms, 2), "capacity": cap,
               "records": st["num_records"], "binned": st["binned_records"],
               "max_bin": st["max_bin"], "mean_bin": round(st["mean_bin"], 1)}

        if WITH_BWD:
            t0 = time.time()
            l, grads = fb(params)
            fence(grads)
            log(f"{name}: fwd+bwd compile+run {time.time() - t0:.1f}s")
            times = []
            for _ in range(REPEATS):
                t0 = time.time()
                for _ in range(ITERS):
                    l, grads = fb(params)
                fence(grads)
                times.append((time.time() - t0) / ITERS * 1000)
            out["fwdbwd_ms"] = round(float(np.median(times)), 1)

        log(f"{name}: fwd {fwd_ms:.1f} ms ({1000 / fwd_ms:.2f} fps)")
        results[name] = out
        print(json.dumps(out), flush=True)

    # headline: the worse of the two scene statistics (honest floor)
    worst = min(results.values(), key=lambda r: r["fps"])
    print(json.dumps({"metric": "fps_flagship_1024x512_fwd",
                      "value": worst["fps"], "unit": "fps",
                      "vs_baseline": round(worst["fps"] / 30.0, 4)}),
          flush=True)


if __name__ == "__main__":
    main()
