"""Capture a ``jax.profiler`` device trace of the fast path (SURVEY.md
section 5, tracing row: measured per-kernel wall-clock, not a static model).

Writes a TensorBoard-loadable trace directory, prints the top device ops by
self-time parsed from the trace's ``.xplane.pb`` (no TensorBoard needed),
and aggregates them into per-stage buckets (sort / expand / composite /
scan / other) so the numbers reconcile directly against
``scripts/profile_stages.py``'s prefix timings and ``scripts/roofline.py``'s
model (VERDICT r4 weak #3: utilization was modeled, never trace-measured).

On backends whose PJRT plugin does not implement the profiler API (the axon
tunnel may not), this degrades to a clear message instead of a crash --
``scripts/profile_stages.py`` remains the measured fallback.

Run on the TPU (serialize with other python processes on this box), e.g.
the flagship operating point, forward and backward:

    TRACE_SPLATS=3616103 TRACE_W=1024 TRACE_H=512 TRACE_DEPTH_KEY=packed \
    TRACE_CHUNK=256 TRACE_BWD=1 nohup python scripts/trace_profile.py \
        > /tmp/trace_profile.log 2>&1 &
"""

import functools
import os
import sys
import time

NUM_SPLATS = int(os.environ.get("TRACE_SPLATS", "1000000"))
WIDTH = int(os.environ.get("TRACE_W", "1920"))
HEIGHT = int(os.environ.get("TRACE_H", "1080"))
CHUNK = int(os.environ.get("TRACE_CHUNK", "128"))
DEPTH_KEY = os.environ.get("TRACE_DEPTH_KEY", "pair")
SORT_PAYLOAD = os.environ.get("TRACE_SORT_PAYLOAD", "f32")
WITH_BWD = bool(int(os.environ.get("TRACE_BWD", "0")))
AUTOTUNE = bool(int(os.environ.get("TRACE_AUTOTUNE", "1")))
TRACE_DIR = os.environ.get("TRACE_DIR", "/tmp/jax_trace")
ITERS = int(os.environ.get("TRACE_ITERS", "3"))

def log(*a):
    print(*a, file=sys.stderr, flush=True)


def stage_report(trace_dir: str, iters: int, label: str):
    """Parse + print the measured device-stage table via trace_tools."""
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import trace_tools

    table, rows = trace_tools.stage_table(trace_dir, iters)
    if table is None:
        log(f"[{label}] no parseable trace in {trace_dir}")
        return None
    if rows:
        log(f"\n[{label}] top 15 device ops by self-time (ms/frame):")
        for r in rows[:15]:
            ms = (r.get("Total self time (us)") or 0) / (1000.0 * iters)
            log(f"  {ms:8.2f}  {str(r.get('HLO op category')):14s} "
                f"{str(r.get('HLO op name')):22s} "
                f"bound={r.get('Bound by')} "
                f"hbmBW={r.get('HBM BW (GiB/s)') or 0:.1f}GiB/s")
    log(f"\n[{label}] measured device-stage table (ms/frame, {iters} "
        f"traced iterations):")
    for stage, ms in sorted(table.items(), key=lambda kv: -kv[1]):
        log(f"  {stage:40s} {ms:9.2f}")
    return table


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.render import (
        autotune_capacity,
        camera_args,
        render_arrays,
    )

    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=32, use_pallas=True, chunk=CHUNK,
        dup_capacity_factor=4.0, depth_key=DEPTH_KEY,
        sort_payload=SORT_PAYLOAD)
    if NUM_SPLATS > 2_000_000:
        scene = ply_io.make_synthetic_scene(
            NUM_SPLATS, seed=99, extent=3.0, log_scale_range=(-5.8, -3.6))
    else:
        scene = ply_io.make_synthetic_scene(
            NUM_SPLATS, seed=42, extent=3.0, log_scale_range=(-5.5, -3.2))
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    a = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view, vp = jnp.asarray(a["view"]), jnp.asarray(a["vp"])
    cam_f = (a["focal_x"], a["focal_y"], a["tan_fovx"], a["tan_fovy"])
    if AUTOTUNE:
        cfg = autotune_capacity(params, view, vp, *cam_f, WIDTH, HEIGHT, cfg)
        log(f"autotuned capacity {cfg.capacity_records}")

    fwd = jax.jit(functools.partial(render_arrays, width=WIDTH, height=HEIGHT,
                                    cfg=cfg))

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[(0,) * leaf.ndim])

    def run_traced(fn, arg, label, trace_dir):
        out = fn(arg)
        fence(out)          # compile + warm outside the trace
        t0 = time.time()
        for _ in range(ITERS):
            out = fn(arg)
        fence(out)
        wall = (time.time() - t0) / ITERS * 1000
        log(f"[{label}] untraced wall {wall:.1f} ms/frame")
        try:
            with jax.profiler.trace(trace_dir):
                for _ in range(ITERS):
                    out = fn(arg)
                fence(out)
        except Exception as e:  # noqa: BLE001
            log(f"profiler unsupported on this backend: "
                f"{type(e).__name__}: {e}")
            log("fallback: scripts/profile_stages.py (measured prefix-timing)")
            return None
        stages = stage_report(trace_dir, ITERS, label)
        if stages is None:
            return None
        stages["wall_ms"] = wall
        return stages

    results = {"config": {"splats": NUM_SPLATS, "w": WIDTH, "h": HEIGHT,
                          "chunk": CHUNK, "depth_key": DEPTH_KEY,
                          "sort_payload": SORT_PAYLOAD}}
    r = run_traced(lambda p: fwd(p, view, vp, *cam_f)[0], params,
                   "fwd", TRACE_DIR + "_fwd")
    if r:
        results["fwd"] = r

    if WITH_BWD:
        def loss(p):
            img, _ = render_arrays(p, view, vp, *cam_f, WIDTH, HEIGHT, cfg)
            return jnp.mean(img[..., :3] ** 2)

        fb = jax.jit(jax.value_and_grad(loss))
        r = run_traced(lambda p: fb(p)[1], params, "fwd+bwd",
                       TRACE_DIR + "_fwdbwd")
        if r:
            results["fwdbwd"] = r

    import json

    print(json.dumps(results))


if __name__ == "__main__":
    main()
