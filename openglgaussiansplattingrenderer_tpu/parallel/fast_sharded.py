"""Multi-chip fast path: Pallas kernels under shard_map with a ragged
all-to-all record exchange.

Replaces round 1's correctness prototype (``parallel/sharded.py``: all-gather
of every record to every chip + a replicated global sort) with the scaling
design SURVEY.md section 5 prescribes (long-context row):

- **splat-sharded preprocess + expand** (Pallas): each chip runs fast-path
  stages 1-3 on its N/D splats, producing depth-ordered duplicate records
  that carry (9 fields, tile id, view depth).
- **ragged all-to-all by tile owner**: tiles are owned round-robin
  (``owner(t) = t % D`` -- balances dense screen regions across chips). Each
  chip stable-sorts its records by destination chip (preserving depth order
  within each destination), packs them into fixed-capacity per-destination
  buckets, and exchanges one ``lax.all_to_all`` over ICI. Bucket capacity is
  static (``exch_factor`` x the mean); overflowing records are dropped
  farthest-first per destination (the same depth-ordered overflow policy as
  the single-device fast path) and counted in ``stats["overflow"]``.
- **owner-side merge + Pallas composite**: the receiving chip merges the D
  depth-ordered streams with one (tile, depth) lexicographic payload sort of
  its O(C/D) records, then runs the *same* Pallas align + fused-composite
  kernels as the single-device path -- the compositor takes per-tile pixel
  origins as scalar-prefetch tables, so a chip composites its non-contiguous
  round-robin tile subset directly.
- **backward**: everything above is differentiable -- the all_to_all
  transposes to the reverse all_to_all, bucket packing is a gather (its
  transpose scatter-adds cotangents), and the sorts re-sort cotangents via
  their custom VJPs. A splat duplicated across tiles owned by different
  chips receives the exact sum of its contributions (SURVEY.md hard part #5).

Per-chip sort/composite work is O(C/D) (records ride at most two local sorts
of ~2C/D rows), vs O(C) for the round-1 all-gather design.

KNOWN-UNMEASURED RISK (single-chip hardware here; the exchange has only run
on virtual CPU meshes): the bucket packing below is an XLA gather of
(ndev*cap_exch) rows x 11 fields -- the op class round 1 measured as
pathological at record scale on TPU (ARCHITECTURE.md: (C, 16) row gather =
6.8 s at 8M). ``src`` is piecewise-contiguous ascending (records arrive
dest-sorted), so if real multi-chip profiling confirms the gather is hot,
the fix is the same one the expand kernel uses: a Pallas one-hot MXU
segment gather over 128-blocks (or sort-based packing: key each record by
its bucket row and lax.sort against ``rows`` dummy rows).

The reference is strictly single-GPU (SURVEY.md section 2.4); this layer is
the capability the north star adds on top.
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.ops import fastpath
from openglgaussiansplattingrenderer_tpu.ops.compositing import assemble_image
from openglgaussiansplattingrenderer_tpu.ops.pallas import records as rk
from openglgaussiansplattingrenderer_tpu.parallel.sharded import (
    AXIS,
    make_mesh,
    pad_scene_for_mesh,
    shard_map,
    shard_params,
)

__all__ = ["render_fast_sharded", "train_step_fast_sharded", "make_mesh",
           "pad_scene_for_mesh", "shard_params", "exchange_capacity"]


def exchange_capacity(cfg: RenderConfig, n_local: int, ndev: int,
                      exch_factor: float = 2.0) -> int:
    """Static per-destination bucket capacity for the record exchange.

    ``exch_factor`` multiplies the mean per-destination share of a chip's
    local record capacity; ``exch_factor >= ndev`` guarantees zero drops
    (worst case: every local record destined to one chip).
    """
    cap_local = rk.round_up(cfg.capacity(n_local), rk.OB * rk.EXP_OUTER)
    return rk.round_up(max(int(cap_local * exch_factor / ndev), 128), 128)


def _fast_shard_fn(params_local, view, vp, focal_x, focal_y, tan_fovx,
                   tan_fovy, *, width, height, cfg: RenderConfig, axis: str,
                   ndev: int, tiles_per_dev: int, cap_exch: int):
    """Per-device body run under shard_map. Returns (tiled, stats...)."""
    d = jax.lax.axis_index(axis)
    num_tiles = cfg.num_tiles

    # ---- stages 1-3 on the local splat shard (Pallas expand, with depth) --
    _, rec_sm, info = fastpath.expand_depth_records(
        params_local, view, vp, focal_x, focal_y, tan_fovx, tan_fovy,
        width, height, cfg, with_depth=True)
    cap_local = rec_sm.shape[1]

    # ---- destination bucketing ------------------------------------------
    tile = rec_sm[rk.NUM_FIELDS, :]                     # float row; exact
    tile_i = tile.astype(jnp.int32)
    # invalid records carry tile == num_tiles; num_tiles % ndev would alias
    # them onto a real chip, so send them to sentinel destination ndev
    dest = jnp.where(tile_i < num_tiles, tile_i % ndev, ndev)
    fields11 = tuple(rec_sm[i, :] for i in range(rk.NUM_FIELDS)) + (
        tile, rec_sm[rk.NUM_FIELDS + 1, :])             # + tile, depth
    dk, _, sfl = rk.sort_with_payload(dest, fields11)   # stable: depth order
    bnd_d = jnp.searchsorted(dk, jnp.arange(ndev + 1, dtype=jnp.int32),
                             side="left").astype(jnp.int32)
    cnt_d = bnd_d[1:] - bnd_d[:-1]                      # (ndev,) per-dest

    rows = ndev * cap_exch
    e = jnp.arange(rows, dtype=jnp.int32) // cap_exch   # dest of bucket row
    j = jnp.arange(rows, dtype=jnp.int32) % cap_exch    # slot within bucket
    src = jnp.minimum(bnd_d[e] + j, cap_local - 1)
    bvalid = j < cnt_d[e]
    packed = jnp.stack([f[src] for f in sfl], axis=1)   # (rows, 11)
    packed = jnp.where(bvalid[:, None], packed, 0.0)
    # bucket padding rows get the sentinel tile so owners sort them last
    packed = packed.at[:, rk.NUM_FIELDS].set(
        jnp.where(bvalid, packed[:, rk.NUM_FIELDS], jnp.float32(num_tiles)))

    # ---- the exchange (ICI all-to-all; transpose = reverse all-to-all) ---
    recv = jax.lax.all_to_all(packed, axis, split_axis=0, concat_axis=0,
                              tiled=True)               # (rows, 11)

    # ---- owner-side (tile, depth) merge of D depth-ordered streams -------
    gtile = recv[:, rk.NUM_FIELDS].astype(jnp.int32)
    # owned tiles are g = lt*ndev + d; local index lt = g // ndev
    lt = jnp.where(gtile < num_tiles, gtile // ndev, tiles_per_dev)
    depth = recv[:, rk.NUM_FIELDS + 1]
    fields9 = tuple(recv[:, i] for i in range(rk.NUM_FIELDS))
    (lt_s, _), _, sf2 = rk.sort_multi_with_payload((lt, depth), fields9)
    bounds_l = jnp.searchsorted(
        lt_s, jnp.arange(tiles_per_dev + 1, dtype=jnp.int32),
        side="left").astype(jnp.int32)

    # ---- Pallas align + fused composite on the owned tile subset ---------
    my_tiles = d + ndev * jnp.arange(tiles_per_dev, dtype=jnp.int32)
    tiled, _, _ = fastpath.composite_sorted(
        sf2, bounds_l, capacity=rows, num_tiles=tiles_per_dev,
        tile_ids=my_tiles, width=width, height=height, cfg=cfg)

    # ---- stats (psum -> replicated scalars) ------------------------------
    local_over = info["total_all"] - info["total"]
    bucket_over = jnp.sum(jnp.maximum(cnt_d - cap_exch, 0))
    overflow = jax.lax.psum(jnp.maximum(local_over, 0) + bucket_over, axis)
    num_records = jax.lax.psum(info["total"], axis)
    exchanged = jax.lax.psum(jnp.sum(cnt_d), axis)
    return tiled, overflow[None], num_records[None], exchanged[None]


def render_fast_sharded(params, view, vp, focal_x, focal_y, tan_fovx,
                        tan_fovy, width: int, height: int, cfg: RenderConfig,
                        mesh, axis: str = AXIS, exch_factor: float = 2.0
                        ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Multi-chip fast render. Returns ((H, W, 4) image, stats).

    ``params`` leaves must be shardable on axis 0 by the mesh size (use
    ``pad_scene_for_mesh``). ``exch_factor`` sizes the per-destination
    exchange buckets (see ``exchange_capacity``); pass ``exch_factor=ndev``
    for a zero-drop guarantee at ndev x the exchange memory.
    """
    ndev = mesh.shape[axis]
    n = params["means"].shape[0]
    if n % ndev:
        raise ValueError(f"{n} splats not divisible by {ndev} devices; "
                         "use pad_scene_for_mesh")
    if cfg.num_tiles % ndev:
        raise ValueError(f"{cfg.num_tiles} tiles not divisible by {ndev} devices")
    tpd = cfg.num_tiles // ndev
    cap_exch = exchange_capacity(cfg, n // ndev, ndev, exch_factor)

    fn = shard_map(
        functools.partial(
            _fast_shard_fn, width=width, height=height, cfg=cfg, axis=axis,
            ndev=ndev, tiles_per_dev=tpd, cap_exch=cap_exch),
        mesh=mesh,
        in_specs=(jax.sharding.PartitionSpec(axis),) + (jax.sharding.PartitionSpec(),) * 6,
        out_specs=(jax.sharding.PartitionSpec(axis),) * 4,
    )
    tiled, overflow, num_records, exchanged = fn(
        params, jnp.asarray(view), jnp.asarray(vp), jnp.float32(focal_x),
        jnp.float32(focal_y), jnp.float32(tan_fovx), jnp.float32(tan_fovy))

    # stacked order is (owner d, local lt) -> global tile lt*ndev + d;
    # un-permute to global tile order for assembly
    g = np.arange(cfg.num_tiles)
    perm = (g % ndev) * tpd + g // ndev
    tiled = tiled[perm]
    image = assemble_image(tiled[:, :, 0:3], tiled[:, :, 3], width, height,
                           cfg)
    stats = {"overflow": overflow[0], "num_records": num_records[0],
             "exchanged_records": exchanged[0]}
    return image, stats


def train_step_fast_sharded(raw, opt_state, target, view, vp, focal_x,
                            focal_y, tan_fovx, tan_fovy, *, width: int,
                            height: int, cfg: RenderConfig, mesh, optimizer,
                            axis: str = AXIS, exch_factor: float = 2.0):
    """One jittable sharded training step on the fast (Pallas) path.

    Like ``train/trainer.py`` and ``parallel.sharded.sharded_train_step``,
    optimisation happens in raw (pre-activation) space so updates cannot push
    activations out of range; ``raw`` is a ``trainer.raw_from_params`` pytree
    sharded over the mesh.
    """
    from openglgaussiansplattingrenderer_tpu.train.trainer import params_from_raw

    def loss_fn(raw):
        img, _ = render_fast_sharded(
            params_from_raw(raw), view, vp, focal_x, focal_y, tan_fovx,
            tan_fovy, width, height, cfg, mesh, axis, exch_factor)
        return jnp.mean((img[..., :3] - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(raw)
    updates, opt_state = optimizer.update(grads, opt_state, raw)
    raw = jax.tree.map(lambda a, u: a + u, raw, updates)
    return raw, opt_state, loss
