"""Production render pipeline: payload sorts + Pallas record kernels + fused
composite.

Replaces the XLA gather/searchsorted-based path (kept in ``render.py`` /
``ops/binning.py`` as the oracle) for real frame rates -- see
``ops/pallas/records.py`` for the measured motivation. Stage map:

  preprocess (jnp elementwise)
    -> sort splats by depth, fields as payloads        [lax.sort, N]
    -> cumsum duplicate counts                          [Pallas, N]
    -> expand duplicates (Pallas, MXU one-hot gather)   [C]
    -> stable sort by tile, fields as payloads          [lax.sort, C]
    -> fused composite fwd/bwd straight off the sorted
       layout (Pallas; floor-128 DMA starts + masks)    [tiles]

Everything is differentiable: the sorts re-sort cotangents, the Pallas ops
carry custom VJPs (segment-sum / reverse gather), preprocess is plain jnp.

Overflow policy: when the scene needs more than ``capacity`` records, the
tail is dropped in *depth order* (farthest splats lose duplicates first),
unlike the oracle path which drops in array order; both report
``stats["overflow"]``. Under zero overflow the two paths agree exactly.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.ops import projection
from openglgaussiansplattingrenderer_tpu.ops.compositing import assemble_image, padded_dims
from openglgaussiansplattingrenderer_tpu.ops.pallas import composite as pc
from openglgaussiansplattingrenderer_tpu.ops.pallas import records as rk
from openglgaussiansplattingrenderer_tpu.ops.transforms import build_covariance


def _floor128(x):
    return (x // 128) * 128


def _pad_row(x, length):
    out = jnp.zeros(length, x.dtype)
    return out.at[0:x.shape[0]].set(x)


def composite_sorted(
    sf2: Tuple[jnp.ndarray, ...],
    bounds: jnp.ndarray,
    *,
    capacity: int,
    num_tiles: int,
    tile_ids,
    width: int,
    height: int,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Final fast-path stage: the fused Pallas compositor over
    (tile, depth)-sorted records.

    Factored out of ``render_fast`` so the sharded path can run the same
    Pallas kernels per device on its owned tile subset: ``sf2`` is the tuple
    of 9 sorted field arrays (length ``capacity``), ``bounds`` the
    (num_tiles+1,) per-tile record ranges over those rows, and ``tile_ids``
    the *global* tile ids (length ``num_tiles``) whose pixel origins the
    compositor should render -- ``arange(T)`` for the single-device path, the
    chip's owned stripe under ``shard_map``.

    The compositor consumes the sorted layout directly (floor-128 DMA starts
    + in-kernel range masks; its backward read-modify-writes the one shared
    boundary block per tile), so no chunk-aligned copy of the record stream
    exists any more.

    Returns (tiled (num_tiles, p, 4) [rgb, transmittance], bounds, counts_t).
    """
    t = num_tiles
    chunk = cfg.chunk
    counts_t = bounds[1:] - bounds[:-1]

    # pad >= chunk zero columns past the last record for the tail DMA
    c_pad = rk.round_up(capacity + 2 * chunk, 128)
    rec_sorted = jnp.zeros((pc.NF, c_pad), jnp.float32)
    rec_sorted = rec_sorted.at[0:rk.NUM_FIELDS, 0:capacity].set(jnp.stack(sf2))

    wp, hp = padded_dims(width, height, cfg)
    pw, ph = wp // cfg.grid_x, hp // cfg.grid_y
    op = pc._make_composite_op(t, chunk, pw, ph, pw * ph,
                               float(cfg.alpha_min), float(cfg.alpha_max),
                               float(1.0 - cfg.saturation))
    ox, oy = pc.tile_origins(tile_ids, pw, ph, cfg.grid_x)
    tiled = op(rec_sorted, bounds, ox, oy)
    return tiled, bounds, counts_t


def expand_depth_records(
    params: Dict[str, jnp.ndarray],
    view, vp, focal_x, focal_y, tan_fovx, tan_fovy,
    width: int, height: int, cfg: RenderConfig,
    *,
    with_depth: bool = False,
    stop_after: str | None = None,
):
    """Stages 1-3 of the fast path: preprocess, depth sort of splats,
    duplicate expansion to splat-major (= depth-ordered) records.

    Returns ("ok", rec_sm (16, capacity), info) where rec_sm rows are the 9
    record fields, row 9 the tile id (``num_tiles`` for invalid rows), and --
    with ``with_depth`` -- row 10 the record's view depth (the sharded path's
    owner-side merge key). ``info`` carries prep/total/total_all for stats.
    With a stage-1..3 ``stop_after``, returns ("stop", obj, aux) matching
    ``render_fast``'s profiling contract.
    """
    n = params["means"].shape[0]
    cov6 = params.get("cov6")
    if cov6 is None:
        cov6 = build_covariance(params["scales"], params["quats"])
    prep = projection.preprocess(
        params["means"], cov6, params["opacities"], view, vp,
        width, height, focal_x, focal_y, tan_fovx, tan_fovy, cfg)
    from openglgaussiansplattingrenderer_tpu.render import effective_colors

    colors = effective_colors(params, view, cfg)
    if stop_after == "prep":
        return "stop", prep["mean2d"], {"conic": prep["conic"],
                                        "colors": colors,
                                        "depth": prep["depth"]}

    capacity = rk.round_up(cfg.capacity(n), rk.OB * rk.EXP_OUTER)
    t = cfg.num_tiles
    if cfg.chunk % 128 and not rk._interpret():
        raise ValueError(f"fast path needs chunk % 128 == 0, got {cfg.chunk}")
    if capacity + 2 * cfg.chunk >= (1 << 24):
        raise ValueError("record capacity exceeds exact-f32 index range")

    # ---- 1. sort splats by depth (culled to the end) ---------------------
    # With cfg.hoist_depth_sort=False this N-sized sort is skipped entirely:
    # records carry their depth (table row 14) and the C-sized tile sort in
    # ``render_fast`` becomes lexicographic (tile, depth) instead.
    hoist = cfg.hoist_depth_sort
    with_depth = with_depth or not hoist
    # optional zero "shift" added to the composited mean2d only (not the
    # binning rects) -- its gradient is the SCREEN-space positional gradient
    # 3DGS densification selects on (graphdeco's viewspace_point_tensor
    # trick); see train/trainer.py grad_stat="screen"
    mean2d = prep["mean2d"]
    if "shift2d" in params:
        mean2d = mean2d + params["shift2d"]
    fields = (
        mean2d[:, 0], mean2d[:, 1],
        prep["conic"][:, 0], prep["conic"][:, 1], prep["conic"][:, 2],
        prep["opacity"], colors[:, 0], colors[:, 1], colors[:, 2],
        prep["tile_min"][:, 0].astype(jnp.float32),
        prep["tile_min"][:, 1].astype(jnp.float32),
        prep["tile_ext"][:, 0].astype(jnp.float32),
        prep["counts"].astype(jnp.float32),
    )
    if hoist:
        key = jnp.where(prep["valid"], prep["depth"], jnp.float32(jnp.inf))
        sk, _, sf = rk.sort_with_payload(key, fields)
    else:
        sk = jnp.where(prep["valid"], prep["depth"], jnp.float32(0.0))
        sf = fields
    counts_s = sf[12].astype(jnp.int32)
    if stop_after == "sort1":
        return "stop", sf[0], {"fields": sf}

    # ---- 2. duplicate-count prefix sum (Pallas; XLA 1-D cumsum is slow) --
    from openglgaussiansplattingrenderer_tpu.ops.pallas import scan as pscan

    cum_incl_i = pscan.cumsum(counts_s)
    cum_excl_i = cum_incl_i - counts_s
    total_all = cum_incl_i[-1]
    total = jnp.minimum(total_all, capacity).astype(jnp.int32)
    if stop_after == "cumsum":
        return "stop", cum_incl_i, {"fields": sf}

    # ---- 3. expand to splat-major records (Pallas) -----------------------
    n_pad = rk.round_up(n + rk.IB, 128)
    n_seg = rk.round_up(n, rk.SB)
    cum_excl = cum_excl_i.astype(jnp.float32)
    cum_incl = cum_incl_i.astype(jnp.float32)

    zeros_row = jnp.zeros(n_pad, jnp.float32)
    # table row 14 carries per-splat depth when the expand op forwards it
    # (sort keys are stop-gradient; lax.stop_gradient keeps that explicit)
    depth_row = (_pad_row(jax.lax.stop_gradient(
        jnp.where(jnp.isfinite(sk), sk, 0.0)), n_pad)
        if with_depth else zeros_row)
    table = jnp.stack([_pad_row(r, n_pad) for r in
                       (sf[0], sf[1], sf[2], sf[3], sf[4], sf[5], sf[6],
                        sf[7], sf[8], sf[9], sf[10], sf[11], cum_excl,
                        cum_incl)] + [depth_row, zeros_row], axis=0)
    cum2_lanes = jnp.stack(
        [_pad_row(cum_excl, n_pad), _pad_row(cum_incl, n_pad)]
        + [zeros_row] * 6, axis=0)

    r0s = jnp.arange(capacity // rk.OB, dtype=jnp.int32) * rk.OB
    s0_arr = _floor128(jnp.searchsorted(cum_incl_i, r0s, side="right")
                       .astype(jnp.int32))
    meta = total[None]

    n0s = jnp.arange(n_seg // rk.SB, dtype=jnp.int32) * rk.SB
    a0_raw = cum_excl_i[jnp.minimum(n0s, n - 1)]
    a0_arr = _floor128(jnp.minimum(a0_raw, total))
    seg_end = jnp.minimum(cum_incl_i[jnp.minimum(n0s + rk.SB - 1, n - 1)], total)
    nch_arr = jnp.maximum(-(-(seg_end - a0_arr) // rk.ICH), 0).astype(jnp.int32)

    wp_e, hp_e = padded_dims(width, height, cfg)
    expand = rk.make_expand_op(capacity=capacity, gx=cfg.grid_x,
                               num_tiles=t, n_seg_pad=n_seg,
                               with_depth=with_depth,
                               pw=wp_e // cfg.grid_x, ph=hp_e // cfg.grid_y,
                               alpha_min=float(cfg.alpha_min))
    rec_sm = expand(table, cum2_lanes, s0_arr, meta, a0_arr, nch_arr)
    info = {"prep": prep, "total": total, "total_all": total_all}
    if stop_after == "expand":
        return "stop", rec_sm, {}
    return "ok", rec_sm, info


def render_fast(
    params: Dict[str, jnp.ndarray],
    view, vp, focal_x, focal_y, tan_fovx, tan_fovy,
    width: int, height: int, cfg: RenderConfig,
    stop_after: str | None = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Fast differentiable render. Returns ((H, W, 4) image, stats).

    ``stop_after`` truncates the pipeline after a named stage and returns that
    stage's outputs instead -- the hook ``scripts/profile_stages.py`` uses to
    time each stage as a complete compiled program (prefix-timing): one of
    "prep", "sort1", "cumsum", "expand", "sort2".
    """
    tag, rec_sm, info = expand_depth_records(
        params, view, vp, focal_x, focal_y, tan_fovx, tan_fovy,
        width, height, cfg, stop_after=stop_after)
    if tag == "stop":
        return rec_sm, info
    prep, total, total_all = info["prep"], info["total"], info["total_all"]
    n = params["means"].shape[0]
    capacity = rec_sm.shape[1]
    t = cfg.num_tiles

    # ---- 4. sort records into (tile, depth) order -------------------------
    tile_key = rec_sm[rk.NUM_FIELDS, :].astype(jnp.int32)
    rec_fields = tuple(rec_sm[i, :] for i in range(rk.NUM_FIELDS))
    use_radix = cfg.record_sort == "radix"
    if use_radix and cfg.hoist_depth_sort is False and cfg.depth_key != "packed":
        raise ValueError(
            "record_sort='radix' needs a single-key sort: depth_key='packed' "
            "or hoist_depth_sort=True (the 'pair' mode is two f32 keys)")
    if cfg.sort_payload == "q16" and (cfg.hoist_depth_sort
                                      or cfg.depth_key != "packed"):
        raise ValueError(
            "sort_payload='q16' packs the single-key record sort: it needs "
            "depth_key='packed' with hoist_depth_sort=False")
    if use_radix:
        from openglgaussiansplattingrenderer_tpu.ops.pallas import (
            radix_sort as rx)
    if cfg.hoist_depth_sort:
        # records arrive depth-ordered (stage 1), so a stable single-key
        # tile sort suffices
        if use_radix:
            kb = max(1, int(t).bit_length())  # tile ids 0..t (t = invalid)
            sk2u, _, sf2 = rx.radix_sort_with_payload(
                tile_key.astype(jnp.uint32), rec_fields, kb)
            sk2 = sk2u.astype(jnp.int32)
        else:
            sk2, _, sf2 = rk.sort_with_payload(tile_key, rec_fields)
        tile_bnd = jnp.arange(t + 1, dtype=jnp.int32)
    elif cfg.depth_key == "packed":
        # single u32 key = tile * 2^22 + 22-bit-quantized ndc depth -- the
        # reference's own packed-key design (preprocess.glsl:154) with FAR
        # more depth precision (its float key keeps ~14 mantissa bits at
        # hundreds of tiles; this keeps 22 at any tile count <= 512).
        # One key operand instead of two; blend order can differ from the
        # exact "pair" mode only when two same-tile records quantize to the
        # same 2^-22 depth bucket (ties then break by splat order, stable).
        if t > 512:
            raise ValueError("depth_key='packed' needs num_tiles <= 512")
        q = jnp.uint32(1 << 22)
        qd = jnp.minimum(
            (jnp.clip(rec_sm[rk.NUM_FIELDS + 1, :], 0.0, 1.0)
             * (1 << 22)).astype(jnp.uint32), q - 1)
        key = tile_key.astype(jnp.uint32) * q + qd
        # PROFILING-ONLY knob (scripts/profile_stages.py operand probe,
        # RESULTS.md "sort operand curve"): carry just the first k payload
        # fields through the record sort, the rest bypass UNSORTED --
        # images are WRONG for k < 9; identical shapes/compute elsewhere,
        # isolating the sort's in-pipeline operand-count cost (VERDICT r3
        # weak #5: the standalone probe's numbers were not comparable to
        # the in-pipeline sort). Unset = full payload sort.
        import os as _os

        _prof_k = int(_os.environ.get("GS_PROF_SORT_PAYLOADS", "-1"))
        if _prof_k >= 0 and not use_radix:
            import warnings

            warnings.warn(
                f"GS_PROF_SORT_PAYLOADS={_prof_k} is set: only the first "
                f"{_prof_k} of 9 record fields ride the sort -- rendered "
                "images are WRONG (profiling-only knob; unset it for "
                "correct output)", RuntimeWarning, stacklevel=2)
            sk2, _, sfk = rk.sort_with_payload(key, rec_fields[:_prof_k])
            sf2 = tuple(sfk) + rec_fields[_prof_k:]
        elif cfg.sort_payload == "q16":
            # inference precision mode: 9 fields packed to 5 u32 sort
            # lanes (records.sort_records_q16); 11 -> 6 sort operands
            wp_q, hp_q = padded_dims(width, height, cfg)
            sk2, sf2 = rk.sort_records_q16(key, rec_fields, wp_q, hp_q)
        elif use_radix:
            kb = 22 + max(1, int(t).bit_length())  # tile ids 0..t
            sk2, _, sf2 = rx.radix_sort_with_payload(key, rec_fields, kb)
        else:
            sk2, _, sf2 = rk.sort_with_payload(key, rec_fields)
        tile_bnd = (jnp.arange(t + 1, dtype=jnp.uint32) * q)
    else:
        # no stage-1 depth sort: lexicographic (tile, record depth) pair
        depth_row = rec_sm[rk.NUM_FIELDS + 1, :]
        (sk2, _), _, sf2 = rk.sort_multi_with_payload(
            (tile_key, depth_row), rec_fields)
        tile_bnd = jnp.arange(t + 1, dtype=jnp.int32)

    bounds = jnp.searchsorted(sk2, tile_bnd, side="left").astype(jnp.int32)
    if stop_after == "sort2":
        return sf2[0], {"fields": sf2, "bounds": bounds}

    # ---- 5. fused composite straight off the sorted layout (Pallas) ------
    tiled, _, counts_t = composite_sorted(
        sf2, bounds, capacity=capacity, num_tiles=t,
        tile_ids=jnp.arange(t, dtype=jnp.int32), width=width, height=height,
        cfg=cfg)
    image = assemble_image(tiled[:, :, 0:3], tiled[:, :, 3], width, height, cfg)

    num_visible = jnp.sum(prep["valid"])
    stats = {
        "num_splats": jnp.int32(n),
        "num_visible": num_visible,
        "num_culled": jnp.sum(prep["culled"]),
        "num_records": total,
        "num_duplicates": total - num_visible,
        "overflow": jnp.maximum(total_all - capacity, 0),
        "max_bin": jnp.max(counts_t),
        "mean_bin": jnp.mean(counts_t.astype(jnp.float32)),
        "binned_records": bounds[-1],
        # records whose Gaussian cannot reach alpha_min anywhere in their
        # tile, marked invalid by the expand kernel's reachability cull
        "culled_unreachable": total - bounds[-1],
    }
    return image, stats
