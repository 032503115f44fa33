"""Capture a ``jax.profiler`` device trace of the fast path (SURVEY.md
section 5, tracing row: measured per-kernel wall-clock, not a static model).

Writes a TensorBoard-loadable trace directory and prints the top device ops
by self-time parsed from the trace's ``.xplane.pb`` (no TensorBoard needed).
On backends whose PJRT plugin does not implement the profiler API (the axon
tunnel may not), this degrades to a clear message instead of a crash --
``scripts/profile_stages.py`` remains the measured fallback (prefix-timing
of complete compiled programs with host fences).

Run on the TPU (serialize with other python processes on this box):
    nohup python scripts/trace_profile.py > /tmp/trace_profile.log 2>&1 &
"""

import functools
import sys
import time

NUM_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
TRACE_DIR = "/tmp/jax_trace"
ITERS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def summarize(trace_dir: str, top: int = 25) -> bool:
    """Print top device ops by self-time from the newest xplane proto."""
    import glob
    import gzip

    paths = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not paths:
        log("no .xplane.pb produced")
        return False
    try:
        from tensorflow.python.profiler.internal import _pywrap_profiler  # noqa
    except Exception:
        pass
    try:
        from xprof.convert import _pywrap_profiler_plugin  # noqa
    except Exception:
        pass
    # Parse the XSpace proto with the protobuf runtime if available via
    # tensorboard_plugin_profile; otherwise fall back to a raw scan.
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
        with open(paths[-1], "rb") as f:
            data = f.read()
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        space = xplane_pb2.XSpace.FromString(data)
        rows = []
        for plane in space.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            ev_meta = plane.event_metadata
            for line in plane.lines:
                for ev in line.events:
                    name = ev_meta[ev.metadata_id].name
                    rows.append((ev.duration_ps / 1e9, name))
        rows.sort(reverse=True)
        log(f"\ntop {top} device events by duration (ms), one iteration set:")
        for dur, name in rows[:top]:
            log(f"  {dur:9.3f}  {name[:100]}")
        return True
    except Exception as e:  # noqa: BLE001
        log(f"xplane parse unavailable ({e}); trace saved at {trace_dir} "
            f"for TensorBoard")
        return True


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.render import camera_args, render_arrays

    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=32, use_pallas=True, chunk=128,
        dup_capacity_factor=4.0)
    scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                        log_scale_range=(-5.5, -3.2))
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    a = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view, vp = jnp.asarray(a["view"]), jnp.asarray(a["vp"])
    cam_f = (a["focal_x"], a["focal_y"], a["tan_fovx"], a["tan_fovy"])

    fwd = jax.jit(functools.partial(render_arrays, width=WIDTH, height=HEIGHT,
                                    cfg=cfg))

    def fence(x):
        leaf = jax.tree.leaves(x)[0]
        return float(leaf[(0,) * leaf.ndim])

    img, _ = fwd(params, view, vp, *cam_f)
    fence(img)          # compile + warm outside the trace
    log("warmed; tracing...")
    try:
        with jax.profiler.trace(TRACE_DIR):
            for _ in range(ITERS):
                img, _ = fwd(params, view, vp, *cam_f)
            fence(img)
    except Exception as e:  # noqa: BLE001
        log(f"profiler unsupported on this backend: {type(e).__name__}: {e}")
        log("fallback: scripts/profile_stages.py (measured prefix-timing)")
        return
    t0 = time.time()
    for _ in range(ITERS):
        img, _ = fwd(params, view, vp, *cam_f)
    fence(img)
    log(f"untraced fwd {(time.time() - t0) / ITERS * 1000:.1f} ms/frame")
    summarize(TRACE_DIR)


if __name__ == "__main__":
    main()
