"""Fused Pallas tile-compositing kernel, forward + analytic backward.

The TPU-native ``draw.glsl``: one grid step per screen tile streams that
tile's depth-sorted record range HBM->VMEM in double-buffered chunks (the
Pallas analogue of the reference's 1024-splat shared-memory batches,
``draw.glsl:94-106``) and composites all tile pixels in parallel with the
masked-cumsum formulation proven equivalent to sequential front-to-back
blending in ``ops/compositing.py``. Early exit: once every pixel in the tile
is saturated past 0.99 accumulated alpha, remaining chunks are skipped
(``draw.glsl:129-133``'s per-pixel break, hoisted to chunk granularity --
exact, because the include mask would zero them anyway).

Layout choices (TPU/Mosaic):
- records are packed *transposed* (NF, C) float32 [mx; my; A; B; C; op; r; g;
  b; pad] so a chunk DMA slices the lane axis at chunk-aligned offsets
  (Mosaic requires lane slices aligned to 128; per-tile ranges are
  chunk-aligned by ``align_bounds``, which also keeps chunk DMAs inside their
  own tile's region -- no cross-grid-step hazards, and backward stores stay
  in-region);
- compute is (P, chunk): tile pixels on sublanes, chunk records on lanes;
  record fields broadcast as (1, chunk) rows against (P, 1) pixel columns;
- the transmittance prefix is an explicit Hillis-Steele shift-add scan along
  the lane axis (log2(chunk) steps) -- the same scan shape as the reference's
  ``prefixBins.glsl:35-47``, but over (P, chunk) vectors instead of 256
  scalars;
- output blocks are (1, P, 4) [rgb, transmittance], matching the compute
  orientation so no in-kernel transposes are needed.

Backward (capability the reference lacks): walks chunks *forward* again,
recomputing transmittance. No per-splat state is stored -- the only residual
is the kernel's own output (total rgb + final transmittance), from which the
suffix colour sum is recovered as R_total - prefix (the standard 3DGS
backward identity, here in cumsum form). Gradients flow to record fields
(mean2d, conic, opacity, colour); the gather that built the records then
segment-sums duplicated records' gradients per splat under autodiff
(SURVEY.md hard part #5).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglgaussiansplattingrenderer_tpu.config import RenderConfig
from openglgaussiansplattingrenderer_tpu.ops.compositing import assemble_image, padded_dims

NF = 16  # packed record fields (7 pad floats keep the sublane dim 8-aligned x2)


def _cumsum_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumsum along axis 1 (lanes) via Hillis-Steele shift-adds.

    Same scan as ``prefixBins.glsl:35-47``, vectorized over sublanes.
    """
    n = x.shape[1]
    s = 1
    while s < n:
        x = x + jnp.concatenate(
            [jnp.zeros(x.shape[:1] + (s,), x.dtype), x[:, :-s]], axis=1)
        s *= 2
    return x


def _cumprod_excl_lanes(x: jnp.ndarray) -> jnp.ndarray:
    """EXCLUSIVE cumprod along axis 1 via multiplicative Hillis-Steele scan.

    Computes prod_{j<k} x_j directly -- no log/exp round trip, so the
    per-record-pixel transcendental count drops from 3 to 1 (the Gaussian's
    own exp). Identity fill keeps the scan exact.
    """
    n = x.shape[1]
    ones = jnp.ones(x.shape[:1] + (1,), x.dtype)
    x = jnp.concatenate([ones, x[:, :-1]], axis=1)    # shift right, seed 1
    s = 1
    while s < n:
        x = x * jnp.concatenate(
            [jnp.ones(x.shape[:1] + (s,), x.dtype), x[:, :-s]], axis=1)
        s *= 2
    return x


def align_bounds(bounds: jnp.ndarray, chunk: int, capacity: int,
                 num_tiles: int) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Re-map sorted record rows into a chunk-aligned per-tile layout.

    Returns (src_index (C_al,), valid (C_al,), aligned_bounds (T+1,),
    counts (T,)); row r of the aligned layout reads from sorted row
    ``src_index[r]`` when valid. C_al = capacity + num_tiles*chunk is the
    static worst case (every tile padded by one partial chunk).
    """
    counts = bounds[1:] - bounds[:-1]
    aligned = -(-counts // chunk) * chunk
    ab = jnp.concatenate([jnp.zeros(1, jnp.int32), jnp.cumsum(aligned)]).astype(jnp.int32)
    c_al = capacity + num_tiles * chunk
    r = jnp.arange(c_al, dtype=jnp.int32)
    t_of = jnp.clip(jnp.searchsorted(ab, r, side="right").astype(jnp.int32) - 1,
                    0, num_tiles - 1)
    off = r - ab[t_of]
    valid = (off < counts[t_of]) & (r < ab[-1])
    src = jnp.clip(bounds[:-1][t_of] + off, 0, capacity - 1)
    return src, valid, ab, counts


def pack_records(records: Dict[str, jnp.ndarray], src: jnp.ndarray,
                 valid: jnp.ndarray) -> jnp.ndarray:
    """Gather sorted record fields into the aligned transposed (NF, C_al)
    packed array.

    Differentiable: the transpose of this gather is the segment-sum of
    aligned-record gradients back onto sorted records (and from there onto
    splats). Invalid rows are zeroed -- opacity 0 makes them no-ops.
    """
    v = valid.astype(jnp.float32)[None, :]
    fields = jnp.stack(
        [
            records["mean2d"][src, 0],   # 0 mx
            records["mean2d"][src, 1],   # 1 my
            records["conic"][src, 0],    # 2 A
            records["conic"][src, 1],    # 3 B
            records["conic"][src, 2],    # 4 C
            records["opacity"][src],     # 5 op
            records["color"][src, 0],    # 6 r
            records["color"][src, 1],    # 7 g
            records["color"][src, 2],    # 8 b
        ],
        axis=0,
    ) * v
    pad = jnp.zeros((NF - fields.shape[0], fields.shape[1]), jnp.float32)
    return jnp.concatenate([fields, pad], axis=0)


def _pixel_grid_block(ox, oy, b, pw, pb):
    """Pixel-centre coordinates of pixel-row block b (pb rows) of the tile
    with pixel origin (ox, oy), as (pw*pb, 1) columns, row-major (y outer).

    Origins arrive as per-tile scalar-prefetch tables rather than being
    derived from the grid index, so a sharded chip can composite a
    non-contiguous (round-robin) subset of global tiles with the same
    kernel."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (pw * pb, 1), 0)
    px = (ox + idx % pw).astype(jnp.float32)
    py = (oy + b * pb + idx // pw).astype(jnp.float32)
    return px, py


def _pick_pixel_block(pw: int, ph: int, chunk: int, budget: int) -> int:
    """Rows per pixel block: largest divisor of ph with pw*rows*chunk within
    the VMEM temp budget (elements). Bounds in-kernel (P_blk, chunk) temps."""
    best = 1
    for rows in range(1, ph + 1):
        if ph % rows == 0 and pw * rows * chunk <= budget:
            best = rows
    return best


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(ab_ref, cnt_ref, ox_ref, oy_ref, rec_hbm, out_ref, rec_buf,
                sem, *, chunk, pw, ph, p, pb, alpha_min, alpha_max, thresh):
    t = pl.program_id(0)
    start = ab_ref[t]
    n = cnt_ref[t]
    ox, oy = ox_ref[t], oy_ref[t]
    nch = pl.cdiv(n, chunk)
    nblk = ph // pb
    pblk = pw * pb

    out_ref[0, :, 0:3] = jnp.zeros((p, 3), jnp.float32)
    out_ref[0, :, 3:4] = jnp.ones((p, 1), jnp.float32)

    def dma(c, slot):
        off = pl.multiple_of(start + c * chunk, 128)
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, chunk)],
            rec_buf.at[slot], sem.at[slot])

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, 1 - slot).start()

        dma(c, slot).wait()

        # chunk-level early exit == draw.glsl's per-pixel 0.99 break
        @pl.when(jnp.max(out_ref[0, :, 3:4]) > thresh)
        def _():
            rec = rec_buf[slot]                       # (NF, chunk)
            k = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
            in_range = k < n
            # pixel-row blocks bound the (pblk, chunk) temps to fit VMEM
            for b in range(nblk):
                rows = slice(b * pblk, (b + 1) * pblk)
                px, py = _pixel_grid_block(ox, oy, b, pw, pb)
                trans = out_ref[0, rows, 3:4]         # (pblk, 1)
                dx = px - rec[0:1, :]                 # (pblk, chunk)
                dy = py - rec[1:2, :]
                ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
                power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
                alpha = jnp.minimum(alpha_max, jnp.exp(power) * rec[5:6, :])
                keep = in_range & (power <= 0.0) & (alpha >= alpha_min)
                alpha = jnp.where(keep, alpha, 0.0)

                one_m = 1.0 - alpha
                s_excl = trans * _cumprod_excl_lanes(one_m)
                inc = s_excl > thresh
                w = jnp.where(inc, alpha * s_excl, 0.0)
                # colour accumulation as one MXU matmul contracting lanes
                # (exact enough at HIGHEST: replaces 3 VPU mul+lane-reduces)
                out_ref[0, rows, 0:3] += jax.lax.dot_general(
                    w, rec[6:9, :],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)
                # new transmittance = inclusive prefix at the last included
                # lane; the prefix is non-increasing along lanes (factors in
                # [0,1]) and ``inc`` is a prefix mask, so it's the masked min
                # -- replaces a second log2(chunk)-step cumprod scan.
                out_ref[0, rows, 3:4] = jnp.min(
                    jnp.where(inc, s_excl * one_m, trans),
                    axis=1, keepdims=True)

    jax.lax.fori_loop(0, nch, body, None)


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(ab_ref, cnt_ref, ox_ref, oy_ref, rec_hbm, out_res_ref, g_ref,
                drec_hbm, rec_buf, dbuf, state, sem, osem,
                *, chunk, pw, ph, p, pb, alpha_min, alpha_max, thresh):
    """Forward-walk backward pass for one tile.

    state: VMEM (p, 2) scratch -- col 0 = running transmittance, col 1 = D,
    the pixel-wise dot of g_rgb with the *remaining* (suffix) colour sum,
    initialised to g . R_total and decremented chunk by chunk.
    """
    t = pl.program_id(0)
    start = ab_ref[t]
    n = cnt_ref[t]
    ox, oy = ox_ref[t], oy_ref[t]
    nch = pl.cdiv(n, chunk)
    nblk = ph // pb
    pblk = pw * pb

    state[:, 0:1] = jnp.ones((p, 1), jnp.float32)
    state[:, 1:2] = jnp.sum(g_ref[0, :, 0:3] * out_res_ref[0, :, 0:3],
                            axis=1, keepdims=True)

    def dma_in(c, slot):
        off = pl.multiple_of(start + c * chunk, 128)
        return pltpu.make_async_copy(
            rec_hbm.at[:, pl.ds(off, chunk)],
            rec_buf.at[slot], sem.at[slot])

    def dma_out(c, slot):
        off = pl.multiple_of(start + c * chunk, 128)
        return pltpu.make_async_copy(
            dbuf.at[slot], drec_hbm.at[:, pl.ds(off, chunk)], osem.at[slot])

    @pl.when(nch > 0)
    def _():
        dma_in(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma_in(c + 1, 1 - slot).start()

        dma_in(c, slot).wait()
        # drain the output DMA that used this dbuf slot two chunks ago
        @pl.when(c >= 2)
        def _():
            dma_out(c - 2, slot).wait()

        # chunk-level early exit, mirroring the forward kernel: once every
        # pixel is saturated the include mask is all-false, so the remaining
        # chunks' gradients are exactly zero -- write zeros, skip compute
        active = jnp.max(state[:, 0:1]) > thresh

        @pl.when(jnp.logical_not(active))
        def _():
            dbuf[slot] = jnp.zeros((NF, chunk), jnp.float32)

        @pl.when(active)
        def _():
            _bwd_chunk(c, slot)
        dma_out(c, slot).start()

    def _bwd_chunk(c, slot):
        rec = rec_buf[slot]                           # (NF, chunk)
        k = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1) + c * chunk
        in_range = k < n
        mx, my = rec[0:1, :], rec[1:2, :]
        ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
        op = rec[5:6, :]
        # tile-local record centres keep the moment algebra numerically small
        mxl = mx - ox.astype(jnp.float32)
        myl = my - oy.astype(jnp.float32)

        # pixel-row blocks bound the (pblk, chunk) temps; per-record grads
        # accumulate across blocks in registers (the block loop is static),
        # written to the dbuf slot once per chunk
        acc = None
        for b in range(nblk):
            rows = slice(b * pblk, (b + 1) * pblk)
            px, py = _pixel_grid_block(ox, oy, b, pw, pb)
            g_rgb = g_ref[0, rows, 0:3]               # (pblk, 3)
            g_t = g_ref[0, rows, 3:4]
            t_fin = out_res_ref[0, rows, 3:4]
            trans = state[rows, 0:1]
            d_carry = state[rows, 1:2]

            dx = px - mx
            dy = py - my
            power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
            alpha_pre = jnp.exp(power) * op
            alpha = jnp.minimum(alpha_max, alpha_pre)
            keep = in_range & (power <= 0.0) & (alpha >= alpha_min)
            alpha = jnp.where(keep, alpha, 0.0)

            one_m = 1.0 - alpha
            s_excl = trans * _cumprod_excl_lanes(one_m)   # (pblk, chunk)
            inc = s_excl > thresh
            abar = jnp.where(inc, alpha, 0.0)
            w = abar * s_excl

            # e_k = g_rgb . colour_k ; V_k = inclusive prefix of w*e
            e = (rec[6:7, :] * g_rgb[:, 0:1] + rec[7:8, :] * g_rgb[:, 1:2]
                 + rec[8:9, :] * g_rgb[:, 2:3])       # (pblk, chunk)
            we = w * e
            v = _cumsum_lanes(we)
            # d L / d abar_k = e S_k - (suffix colour + transmittance terms)
            dabar = e * s_excl - (d_carry - v + g_t * t_fin) / (1.0 - abar)
            gate = keep & inc & (alpha_pre < alpha_max)
            dalpha = jnp.where(gate, dabar, 0.0)
            dpower = dalpha * alpha

            # All per-record pixel reductions via two MXU matmuls:
            # geometric grads from basis moments of dpower (tile-local
            # coordinates: px_l <= tile size so the expansions stay exact),
            # colour grads + the D-carry decrement from [g_rgb | ones] x w.
            pxl = px - ox.astype(jnp.float32)          # (pblk, 1)
            pyl = py - oy.astype(jnp.float32)
            ones = jnp.ones((pblk, 1), jnp.float32)
            basis = jnp.concatenate(
                [ones, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
                 g_rgb, ones], axis=1)                # (pblk, 10)
            mom = jax.lax.dot_general(
                basis, jnp.concatenate([dpower, w], axis=1),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (10, 2*chunk)
            md = mom[:, 0:chunk]                       # moments of dpower
            mw = mom[:, chunk:2 * chunk]               # moments of w
            s1, sx, sy = md[0:1, :], md[1:2, :], md[2:3, :]
            sxx, sxy, syy = md[3:4, :], md[4:5, :], md[5:6, :]

            dxs = sx - mxl * s1                        # sum dpower*dx
            dys = sy - myl * s1
            grads = jnp.concatenate([
                ca * dxs + cb * dys,                   # d mx
                cc * dys + cb * dxs,                   # d my
                -0.5 * (sxx - 2.0 * mxl * sx + mxl * mxl * s1),
                -(sxy - mxl * sy - myl * sx + mxl * myl * s1),
                -0.5 * (syy - 2.0 * myl * sy + myl * myl * s1),
                # d opacity: sum dalpha*exp(power) = sum dpower / op
                # (unclamped under the gate, where alpha == exp(power)*op)
                s1 / jnp.maximum(op, 1e-12),
                mw[6:9, :],                            # d colour
            ], axis=0)                                 # (9, chunk)
            acc = grads if acc is None else acc + grads
            # carry updates: masked-min == prefix product at the last
            # included lane (see forward kernel); v's tail is the we-sum
            state[rows, 0:1] = jnp.min(
                jnp.where(inc, s_excl * one_m, trans), axis=1, keepdims=True)
            state[rows, 1:2] = d_carry - v[:, -1:]

        dbuf[slot] = jnp.concatenate(
            [acc, jnp.zeros((NF - 9, chunk), jnp.float32)], axis=0)

    jax.lax.fori_loop(0, nch, body, None)
    # drain the last (up to) two in-flight output DMAs before the grid
    # advances and another tile's kernel reuses the semaphores
    @pl.when(nch >= 2)
    def _():
        dma_out(nch - 2, jax.lax.rem(nch - 2, 2)).wait()

    @pl.when(nch >= 1)
    def _():
        dma_out(nch - 1, jax.lax.rem(nch - 1, 2)).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


FWD_TEMP_BUDGET = 320_000   # elements per (pixel-block, chunk) temp
BWD_TEMP_BUDGET = 131_072


def _fwd_call(rec, ab, counts, ox, oy, *, num_tiles, chunk, pw, ph, p,
              alpha_min, alpha_max, thresh):
    pb = _pick_pixel_block(pw, ph, chunk, FWD_TEMP_BUDGET)
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, pw=pw, ph=ph, p=p, pb=pb,
        alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((1, p, 4), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, NF, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, p, 4), jnp.float32),
        interpret=_interpret(),
    )(ab, counts, ox, oy, rec)


def _bwd_call(rec, ab, counts, ox, oy, out_res, g, *, num_tiles, chunk, pw,
              ph, p, alpha_min, alpha_max, thresh):
    pb = _pick_pixel_block(pw, ph, chunk, BWD_TEMP_BUDGET)
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, pw=pw, ph=ph, p=p, pb=pb,
        alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                      # rec
            pl.BlockSpec((1, p, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                     # out res
            pl.BlockSpec((1, p, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                     # g
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),                # drec
        scratch_shapes=[
            pltpu.VMEM((2, NF, chunk), jnp.float32),
            pltpu.VMEM((2, NF, chunk), jnp.float32),
            pltpu.VMEM((p, 2), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(rec.shape, jnp.float32),
        interpret=_interpret(),
    )(ab, counts, ox, oy, rec, out_res, g)


@functools.lru_cache(maxsize=64)
def _make_composite_op(num_tiles, chunk, pw, ph, p, alpha_min, alpha_max,
                       thresh):
    static = dict(num_tiles=num_tiles, chunk=chunk, pw=pw, ph=ph, p=p,
                  alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)

    @jax.custom_vjp
    def op(rec, ab, counts, ox, oy):
        return _fwd_call(rec, ab, counts, ox, oy, **static)

    def fwd(rec, ab, counts, ox, oy):
        out = _fwd_call(rec, ab, counts, ox, oy, **static)
        return out, (rec, ab, counts, ox, oy, out)

    def bwd(res, g):
        rec, ab, counts, ox, oy, out = res
        drec = _bwd_call(rec, ab, counts, ox, oy, out, g, **static)
        # Columns past the aligned end are never touched by any tile's DMA ->
        # uninitialized memory; zero them before they meet the gather VJP.
        col = jnp.arange(rec.shape[1], dtype=jnp.int32)
        drec = jnp.where((col < ab[-1])[None, :], drec, 0.0)
        f0 = jax.dtypes.float0
        return (drec, np.zeros(ab.shape, f0), np.zeros(counts.shape, f0),
                np.zeros(ox.shape, f0), np.zeros(oy.shape, f0))

    op.defvjp(fwd, bwd)
    return op


def tile_origins(tile_ids, pw: int, ph: int, gx: int):
    """Per-tile pixel origins (ox, oy) int32 arrays for a set of global tile
    ids -- the scalar-prefetch tables the kernels index by grid step."""
    tile_ids = jnp.asarray(tile_ids, jnp.int32)
    return (tile_ids % gx) * pw, (tile_ids // gx) * ph


def composite(
    records: Dict[str, jnp.ndarray],   # sorted (C, ...) record fields
    tile_bounds: jnp.ndarray,          # (T+1,) int32
    width: int,
    height: int,
    cfg: RenderConfig,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Pallas-path drop-in for ``ops.compositing.composite``.

    No per-tile record cap: ragged ranges are streamed chunk by chunk.
    """
    capacity = records["mean2d"].shape[0]
    wp, hp = padded_dims(width, height, cfg)
    pw, ph = wp // cfg.grid_x, hp // cfg.grid_y
    p = pw * ph
    chunk = cfg.chunk
    if chunk % 128 and not _interpret():
        raise ValueError(f"Pallas compositor needs chunk % 128 == 0, got {chunk}")

    src, valid, ab, counts = align_bounds(tile_bounds, chunk, capacity, cfg.num_tiles)
    rec = pack_records(records, src, valid)

    ox, oy = tile_origins(jnp.arange(cfg.num_tiles, dtype=jnp.int32), pw, ph,
                          cfg.grid_x)
    op = _make_composite_op(cfg.num_tiles, chunk, pw, ph, p,
                            float(cfg.alpha_min), float(cfg.alpha_max),
                            float(1.0 - cfg.saturation))
    tiled = op(rec, ab, counts, ox, oy)               # (T, p, 4)

    rgb = tiled[:, :, 0:3]                            # (T, p, 3)
    trans = tiled[:, :, 3]                            # (T, p)
    image = assemble_image(rgb, trans, width, height, cfg)
    aux = {"aligned_records": ab[-1], "final_transmittance": trans}
    return image, aux
