"""Early-exit work model (CPU): how much (pixel, record) pair work each
saturation-exit granularity removes on a bench-statistics scene.

The compositor evaluates every record in a tile against every tile pixel;
the 0.99-saturation break makes most of that work skippable. This script
replays the exact blend (oracle pipeline on XLA CPU for the sorted
records, numpy for the transmittance walk) and counts the pairs actually
evaluated under each granularity the kernels support:

  none         every (record, pixel) pair in every tile
  chunk        skip whole 128-record chunks once ALL tile pixels saturate
  chunk+rows   + skip per 8-pixel-row block (FWD_EXIT_ROWS=8)
  sub32        + skip 32-record sub-chunks per row block (SUB_CHUNKS=4)
  per-record   the reference's per-pixel break (draw.glsl:129) = lower bound

These counts apply to the BACKWARD verbatim (r5): the composite backward
is a forward-walk recompute with IDENTICAL saturation gating, so it
visits exactly the pairs counted here -- there is no separate backward
walk to model, and per-chunk transmittance checkpointing cannot shorten
it (T is already a running carry in the single gated pass). The 1080p
backward floor argument built on these counts + the measured trace kernel
ratio (bwd/fwd = 1.64x on identical pair work vs a >= 2.2x op-count
ratio) is in RESULTS.md r5.

Run on CPU: PYTHONPATH=/root/repo python scripts/exit_model.py
"""

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from openglgaussiansplattingrenderer_tpu.camera import Camera
from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
from openglgaussiansplattingrenderer_tpu.ops import binning, compositing, projection
from openglgaussiansplattingrenderer_tpu.ops.transforms import build_covariance
from openglgaussiansplattingrenderer_tpu.render import camera_args, effective_colors

import os

NUM_SPLATS = 1_000_000
WIDTH, HEIGHT = 1920, 1080
CHUNK, ROWS, SUB = 128, 8, 32
TILE_PX = int(os.environ.get("EXIT_MODEL_TILE_PX", "32"))


def main():
    cfg = RenderConfig.for_resolution(WIDTH, HEIGHT, tile_px=TILE_PX,
                                      use_pallas=False,
                                      dup_capacity_factor=8.0,
                                      max_per_tile=8192, chunk=64)
    scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                        log_scale_range=(-5.5, -3.2))
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    a = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}

    cov6 = build_covariance(params["scales"], params["quats"])
    prep = projection.preprocess(
        params["means"], cov6, params["opacities"], jnp.asarray(a["view"]),
        jnp.asarray(a["vp"]), WIDTH, HEIGHT, a["focal_x"], a["focal_y"],
        a["tan_fovx"], a["tan_fovy"], cfg)
    recs = binning.expand_records(prep["counts"], prep["tile_min"],
                                  prep["tile_ext"], prep["depth"], cfg,
                                  cfg.capacity(NUM_SPLATS))
    sorted_sid, bounds = binning.sort_and_bin(recs, cfg)
    g = compositing.gather_records(
        prep, effective_colors(params, jnp.asarray(a["view"]), cfg),
        sorted_sid)
    mean2d = np.asarray(g["mean2d"])
    conic = np.asarray(g["conic"])
    op = np.asarray(g["opacity"])
    bounds = np.asarray(bounds)

    pw = ph = TILE_PX
    gx = cfg.grid_x
    px = np.arange(pw, dtype=np.float32)
    py = np.arange(ph, dtype=np.float32)
    fx = np.tile(px, ph)                      # row-major tile pixels
    fy = np.repeat(py, pw)
    rows_blk = min(ROWS, ph)
    nrow_blk = ph // rows_blk
    pb = pw * rows_blk

    thresh = 1.0 - cfg.saturation             # T <= this => saturated
    work = dict.fromkeys(
        ["none", "chunk", "chunk_rows", "sub32", "per_record"], 0.0)

    for t in range(cfg.num_tiles):
        b0, b1 = bounds[t], bounds[t + 1]
        r = b1 - b0
        if r == 0:
            continue
        ox, oy = (t % gx) * pw, (t // gx) * ph
        dx = fx[None, :] + ox - mean2d[b0:b1, 0:1]      # (R, P)
        dy = fy[None, :] + oy - mean2d[b0:b1, 1:2]
        A, B, C = conic[b0:b1, 0:1], conic[b0:b1, 1:2], conic[b0:b1, 2:3]
        power = -0.5 * (A * dx * dx + C * dy * dy) - B * dx * dy
        alpha = np.minimum(cfg.alpha_max, np.exp(power) * op[b0:b1, None])
        alpha = np.where((power <= 0.0) & (alpha >= cfg.alpha_min), alpha, 0.0)
        T = np.cumprod(1.0 - alpha, axis=0)             # (R, P) inclusive
        # exit[p] = first record index k where T[k, p] <= thresh (R if never)
        sat = T <= thresh
        exit_p = np.where(sat.any(axis=0), sat.argmax(axis=0) + 1, r)

        work["none"] += r * pw * ph
        work["per_record"] += float(exit_p.sum())
        # row-block exits: a block stops after max over its pixels
        eb = exit_p.reshape(nrow_blk, pb).max(axis=1)   # (nrow_blk,)
        tile_exit = exit_p.max()

        def gran(e, q):
            return np.minimum(np.ceil(e / q) * q, r)   # tail chunk is partial
        # chunk granularity gates the whole tile per chunk
        work["chunk"] += float(gran(tile_exit, CHUNK)) * pw * ph
        # chunk DMA still whole-tile, but compute gated per row block at
        # chunk granularity
        work["chunk_rows"] += float(np.sum(gran(eb, CHUNK))) * pb
        work["sub32"] += float(np.sum(gran(eb, SUB))) * pb

    total = work["none"]
    print(f"records={bounds[-1]:,}  tiles={cfg.num_tiles}  "
          f"pairs(no exit)={total/1e9:.2f}G")
    for k in ("chunk", "chunk_rows", "sub32", "per_record"):
        print(f"{k:>10s}: {work[k]/1e9:6.2f}G pairs "
              f"({100*work[k]/total:5.1f}% of none, "
              f"{work[k]/work['per_record']:.2f}x the per-record floor)")


if __name__ == "__main__":
    main()
