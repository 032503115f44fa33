"""Root-cause the bench gate's few-pixel device divergence (VERDICT r2 weak #5).

bench.py's on-device gate compares the compiled Pallas compositor against the
jnp oracle on the same chip and historically sees a handful of pixels differ
by ~4e-3 (~1/255). The standing hypothesis: Mosaic and XLA round
transcendentals (exp) differently at the ulp level, flipping the reference's
1/255 alpha-cutoff branch (draw.glsl:123) or the 0.99 saturation break
(draw.glsl:129) for borderline records. This script CONFIRMS which branch on
which record, per bad pixel:

1. render the exact gate scene both ways on the device, list bad pixels;
2. pull the (tile, depth)-sorted record stream (fields + bounds) to host;
3. replay the per-pixel blend in float64 numpy and, for every bad pixel,
   locate records whose alpha sits within FLIP_EPS of alpha_min or whose
   running transmittance sits within FLIP_EPS of (1 - saturation);
4. verify the pixel diff equals that record's blended contribution.

Output: a per-pixel table (tile, record, alpha-alpha_min or T-threshold
margin, predicted vs observed diff) and a machine-readable JSON tail. The
result feeds QUIRKS.md and pins bench.py's gate tolerance to a measured
envelope instead of an assumed one.

Run (serialize with other TPU jobs):
    PYTHONPATH=/root/repo:/root/.axon_site nohup python \
        scripts/gate_divergence.py > /tmp/gate_divergence.log 2>&1 &
"""

import dataclasses
import functools
import json
import os
import sys

import numpy as np

FLIP_EPS = 3e-6     # ulp-scale window around the branch thresholds


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    if os.environ.get("GATE_CPU"):
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.ops import fastpath
    from openglgaussiansplattingrenderer_tpu.ops.compositing import padded_dims
    from openglgaussiansplattingrenderer_tpu.ops.pallas import records as rk
    from openglgaussiansplattingrenderer_tpu.render import camera_args, render_arrays

    # exactly bench.py's gate scene
    gw, gh = 512, 512
    gcfg = RenderConfig.for_resolution(gw, gh, tile_px=32, use_pallas=True,
                                       chunk=256, dup_capacity_factor=8.0,
                                       max_per_tile=2048)
    gscene = ply_io.make_synthetic_scene(10_000, seed=7, extent=2.5)
    gparams = {k: jnp.asarray(v) for k, v in gscene.items() if k != "sh_rest"}
    gcam = Camera(0.0, 0.0, -6.0, width=gw, height=gh)
    ga = camera_args(gcam)
    gargs = (gparams, jnp.asarray(ga["view"]), jnp.asarray(ga["vp"]),
             jnp.float32(ga["focal_x"]), jnp.float32(ga["focal_y"]),
             jnp.float32(ga["tan_fovx"]), jnp.float32(ga["tan_fovy"]))

    pimg, _ = jax.jit(functools.partial(
        render_arrays, width=gw, height=gh, cfg=gcfg))(*gargs)
    jimg, _ = jax.jit(functools.partial(
        render_arrays, width=gw, height=gh,
        cfg=dataclasses.replace(gcfg, use_pallas=False)))(*gargs)
    pimg = np.asarray(pimg, np.float64)
    jimg = np.asarray(jimg, np.float64)
    d = np.abs(pimg - jimg).max(axis=-1)
    bad = np.argwhere(d > 1e-3)
    log(f"max abs diff {d.max():.3e}; {len(bad)} px > 1e-3")

    # the sorted record stream both compositors consume
    sort2 = jax.jit(functools.partial(
        fastpath.render_fast, width=gw, height=gh, cfg=gcfg,
        stop_after="sort2"))
    _, aux = sort2(*gargs)
    sf2 = np.stack([np.asarray(f) for f in aux["fields"]])  # (9, cap)
    bounds = np.asarray(aux["bounds"])

    wp, hp = padded_dims(gw, gh, gcfg)
    pw, ph = wp // gcfg.grid_x, hp // gcfg.grid_y
    a_min, a_max, sat = gcfg.alpha_min, gcfg.alpha_max, gcfg.saturation

    def replay(py, px):
        """float64 replay of draw.glsl's per-pixel loop on the sorted
        records of the pixel's tile; returns the per-record trace."""
        t = (py // ph) * gcfg.grid_x + (px // pw)
        lo, hi = bounds[t], bounds[t + 1]
        mx, my = sf2[0, lo:hi], sf2[1, lo:hi]
        A, B, Cc = sf2[2, lo:hi], sf2[3, lo:hi], sf2[4, lo:hi]
        op = sf2[5, lo:hi]
        dx, dy = mx - px, my - py
        power = -0.5 * (A * dx * dx + Cc * dy * dy) - B * dx * dy
        alpha = np.minimum(np.exp(power) * op, a_max)
        include = (power <= 0.0) & (alpha >= a_min)
        trace = []
        T = 1.0
        for k in range(hi - lo):
            if include[k]:
                trace.append((k, float(alpha[k]), float(T)))
                T *= 1.0 - alpha[k]
                if T <= 1.0 - sat:
                    break
            else:
                trace.append((k, float(alpha[k]), None))
        return t, lo, alpha, include, trace

    findings = []
    for py, px in bad:
        t, lo, alpha, include, trace = replay(py, px)
        diff = float(d[py, px])
        # borderline records: alpha within FLIP_EPS of the 1/255 cutoff, or
        # transmittance crossing within FLIP_EPS of the saturation threshold.
        # A flipped cutoff record changes the pixel by a*T*color/255 (color
        # stored 0..255, image divided back down, draw.glsl:141).
        culprits = []
        for k, a, T in trace:
            r, g, b = (sf2[6, lo + k], sf2[7, lo + k], sf2[8, lo + k])
            cmax = max(r, g, b) / 255.0
            if abs(a - a_min) < FLIP_EPS:
                pred = a * (T if T is not None else 1.0) * cmax
                culprits.append({
                    "record": int(lo + k), "branch": "alpha_min",
                    "margin": float(a - a_min),
                    "predicted_diff": float(pred),
                    "matches": bool(abs(pred - diff) < 0.35 * max(pred, diff)),
                })
            if T is not None and abs((1.0 - sat) - T * (1.0 - a)) < FLIP_EPS:
                culprits.append({"record": int(lo + k),
                                 "branch": "saturation",
                                 "margin": float(T * (1.0 - a) - (1.0 - sat))})
        findings.append({
            "px": [int(px), int(py)], "tile": int(t), "diff": diff,
            "culprits": culprits, "explained": bool(culprits),
        })
        log(f"px ({px},{py}) tile {t}: diff {diff:.3e}; "
            f"{len(culprits)} borderline record(s): {culprits}")

    n_exp = sum(f["explained"] for f in findings)
    log(f"{n_exp}/{len(findings)} bad pixels have a borderline-branch record "
        f"within {FLIP_EPS} of a threshold")
    print(json.dumps({
        "max_diff": float(d.max()), "bad_px": int(len(bad)),
        "explained": int(n_exp), "findings": findings,
    }))


if __name__ == "__main__":
    main()
