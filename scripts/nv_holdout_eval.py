"""Re-evaluate a novel_view_bench checkpoint's holdout poses (PSNR + SSIM).

Reconstructs the exact GT protocol (same seeds / pose rings / holdout
interleave as scripts/novel_view_bench.py) and scores a finished run's
checkpoint on the 8 holdout poses -- used to backfill SSIM for runs whose
curve predates the SSIM column, and for ad-hoc per-pose analysis.

    PYTHONPATH=/root/repo:/root/.axon_site NV_CKPT=/tmp/nv_a.ckpt.npz \
        python scripts/nv_holdout_eval.py
Env mirrors novel_view_bench: NV_GT, NV_CAP, NV_RES, NV_POSES,
NV_HOLDOUT_EVERY, NV_GT_COLORS.
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from novel_view_bench import make_poses  # noqa: E402

CAP = int(os.environ.get("NV_CAP", "1000000"))
GT_SPLATS = int(os.environ.get("NV_GT", "500000"))
W = H = int(os.environ.get("NV_RES", "512"))
NPOSES = int(os.environ.get("NV_POSES", "72"))
HOLDOUT_EVERY = int(os.environ.get("NV_HOLDOUT_EVERY", "9"))
CKPT = os.environ.get("NV_CKPT", "/tmp/novel_view.ckpt.npz")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_traceback_in_locations_limit", 0)
    log(f"device: {jax.devices()[0]}; ckpt={CKPT}")

    import importlib

    from openglgaussiansplattingrenderer_tpu.config import RenderConfig
    from openglgaussiansplattingrenderer_tpu.io import ply as ply_io
    from openglgaussiansplattingrenderer_tpu.train import losses, trainer

    R = importlib.import_module("openglgaussiansplattingrenderer_tpu.render")

    gt = ply_io.make_clustered_scene(GT_SPLATS, seed=3, extent=2.0)
    if os.environ.get("NV_GT_COLORS", "random") == "correlated":
        m = np.asarray(gt["means"])
        phase = [np.sin(1.3 * m[:, 0] + 0.7 * m[:, 1]),
                 np.sin(0.9 * m[:, 1] - 1.1 * m[:, 2] + 2.0),
                 np.sin(1.7 * m[:, 2] + 0.5 * m[:, 0] + 4.0)]
        gt["colors"] = np.stack(
            [(0.5 + 0.5 * p) * 255.0 for p in phase],
            axis=1).astype(np.float32)
    gt_params = {k: jnp.asarray(v) for k, v in gt.items() if k != "sh_rest"}
    cams = make_poses(NPOSES, W, H)
    hold_idx = sorted(set(range(0, NPOSES, HOLDOUT_EVERY)))
    hold_cams = [cams[i] for i in hold_idx]

    base = RenderConfig.for_resolution(W, H, tile_px=32, use_pallas=True,
                                       chunk=128)
    a0 = R.camera_args(cams[0])
    cfg = R.autotune_capacity(
        gt_params, a0["view"], a0["vp"], a0["focal_x"], a0["focal_y"],
        a0["tan_fovx"], a0["tan_fovy"], W, H, base, margin=1.6)
    cap_records = max(cfg.capacity_records,
                      R.quantize_capacity(int(CAP * 2.5)))
    cfg = dataclasses.replace(cfg, capacity_records=cap_records)

    raw, step, extras = trainer.load_checkpoint_full(CKPT)
    params = trainer.params_from_raw(
        {k: jnp.asarray(v) for k, v in raw.items()})
    alive = int(np.sum(extras["alive"])) if "alive" in extras else None
    log(f"checkpoint step {step}, alive {alive}")

    rows = []
    for i, c in zip(hold_idx, hold_cams):
        gt_img, _ = R.render_stats(gt_params, c, cfg, W, H)
        t = jnp.asarray(np.asarray(gt_img)[..., :3])
        img, _ = R.render_stats(params, c, cfg, W, H)
        pred = jnp.asarray(np.asarray(img)[..., :3])
        rows.append({"pose": i,
                     "psnr": round(float(losses.psnr(pred, t)), 2),
                     "ssim": round(float(losses.ssim(pred, t)), 4)})
        log(rows[-1])

    print(json.dumps({
        "ckpt": CKPT, "step": step, "alive": alive,
        "holdout_psnr_mean": round(float(np.mean([r["psnr"]
                                                  for r in rows])), 2),
        "holdout_ssim_mean": round(float(np.mean([r["ssim"]
                                                  for r in rows])), 4),
        "per_pose": rows,
    }))


if __name__ == "__main__":
    main()
