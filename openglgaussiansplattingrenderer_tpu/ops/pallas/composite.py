"""Fused Pallas tile-compositing kernel, forward + analytic backward.

The TPU-native ``draw.glsl``: one grid step per screen tile streams that
tile's depth-sorted record range HBM->VMEM in double-buffered chunks (the
Pallas analogue of the reference's 1024-splat shared-memory batches,
``draw.glsl:94-106``) and composites all tile pixels in parallel with the
masked-cumsum formulation proven equivalent to sequential front-to-back
blending in ``ops/compositing.py``. Early exit: once every pixel in the tile
is saturated past 0.99 accumulated alpha, remaining chunks are skipped
(``draw.glsl:129-133``'s per-pixel break, hoisted to chunk granularity --
exact, because the include mask would zero them anyway); with
``FWD_EXIT_ROWS`` set, the forward also exits per pixel-row block, and with
``SUB_CHUNKS`` > 1 both kernels additionally gate the record axis inside a
chunk (saturation mid-chunk skips the tail records) -- two granularity axes
between the reference's per-pixel break and the chunk-level one.

Layout choices (TPU/Mosaic):
- records are packed *transposed* (NF, C) float32 [mx; my; A; B; C; op; r; g;
  b; pad] and consumed straight from the (tile, depth)-sorted layout: each
  tile's chunk DMAs start at floor128(bounds[t]) (Mosaic requires lane
  slices aligned to 128) and lanes outside [bounds[t], bounds[t+1]) are
  masked out of the blend. The backward writes cotangents into the same
  layout; the single 128-lane block a tile can share with its predecessors
  is read-modify-written (grid steps run in order and drain their output
  DMAs, so the predecessor's values are already in HBM);
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


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


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


def pack_records(records: Dict[str, jnp.ndarray], c_pad: int) -> jnp.ndarray:
    """Pack sorted record fields into the transposed (NF, c_pad) array the
    kernels stream, zero-padded past the record count (the tail DMA may read
    up to ``chunk`` columns beyond the last tile's range).

    Differentiable: a plain stack -- its transpose routes cotangents back to
    the field arrays unchanged.
    """
    c = records["mean2d"].shape[0]
    fields = jnp.stack(
        [
            records["mean2d"][:, 0],   # 0 mx
            records["mean2d"][:, 1],   # 1 my
            records["conic"][:, 0],    # 2 A
            records["conic"][:, 1],    # 3 B
            records["conic"][:, 2],    # 4 C
            records["opacity"],        # 5 op
            records["color"][:, 0],    # 6 r
            records["color"][:, 1],    # 7 g
            records["color"][:, 2],    # 8 b
        ],
        axis=0,
    )
    out = jnp.zeros((NF, round_up(c_pad, 128)), jnp.float32)
    return out.at[0:fields.shape[0], 0:c].set(fields)


def _sos_chunk(rec, ox, oy, in_range):
    """Per-CHUNK record preprocessing for the sum-of-squares Gaussian
    evaluation (amortized over the block's pixels: ~15 VPU ops per record,
    not per pair).

    power = -(A dx^2 + C dy^2)/2 - B dx dy = -q/2 with q the PSD conic
    quadratic form. A naive 6-feature expansion ([1, x, y, x^2, xy, y^2] x
    coefficients) cancels catastrophically for anisotropic records binned
    far along their major axis (terms ~ A*mx^2 ~ 1e6 summing to ~1; the
    elementwise formulation rounds the same way in kernel and oracle, so
    the error only appears when formulations differ -- measured 0.26 image
    divergence). Instead, Cholesky-factor the conic per record with the
    -1/2 folded into the factors (q/2 = u^2 + v^2, u = s11 dx + s12 dy,
    v = s22 dy): u and v are LINEAR in tile-local pixel coordinates, and
    for contributing pixels |u|,|v| <= ~2.4, so cancellation error stays
    ~1e-4 on power. Per (pixel, record) pair only u, v, -(u^2+v^2) remain
    (10 VPU ops vs 11 for the direct quadratic) AND the reference's
    ``power > 0 -> skip`` test (``draw.glsl:115``) is provably a no-op
    (-(u^2+v^2) <= 0 always, and power==0 is kept by both), so its compare
    + and disappear from the pair loop. ``in_range`` (lanes inside
    [b0, b1)) is likewise folded into a pre-masked opacity row here, saving
    two more per-pair ops. An MXU formulation ((pixels, 3) x (3, 2*chunk)
    dot) was measured SLOWER: Mosaic pads the K=3 contraction to 128 and
    HIGHEST costs 6 passes (fwd 99.2 -> 110.3 ms).

    eps guards the zero-padded lanes (all-zero records -> s's all zero ->
    power 0, alpha 0 via the masked opacity).

    Returns (1, chunk) rows (s11, s12, s22, u0, v0, opm): the scaled
    Cholesky factors, the affine offsets absorbing the record centre, and
    the range-masked opacity.
    """
    mxl = rec[0:1, :] - ox.astype(jnp.float32)
    myl = rec[1:2, :] - oy.astype(jnp.float32)
    ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
    s11 = jnp.sqrt(jnp.maximum(ca * 0.5, 0.0))
    s12 = (cb * 0.5) / jnp.maximum(s11, 1e-20)
    s22 = jnp.sqrt(jnp.maximum(cc * 0.5 - s12 * s12, 0.0))
    u0 = -(s11 * mxl + s12 * myl)
    v0 = -(s22 * myl)
    opm = jnp.where(in_range, rec[5:6, :], 0.0)
    return s11, s12, s22, u0, v0, opm


def _block_coords(b, pw, pb):
    """Tile-local pixel-centre coordinates of pixel-row block b (pb rows),
    as (pw*pb, 1) columns, row-major (y outer). Tile origins arrive as
    per-tile scalar-prefetch tables rather than being derived from the grid
    index, so a sharded chip can composite a non-contiguous (round-robin)
    subset of global tiles with the same kernel; all in-kernel math is
    tile-local (the origin is absorbed into ``_sos_chunk``'s offsets)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (pw * pb, 1), 0)
    fx = (idx % pw).astype(jnp.float32)
    fy = (b * pb + idx // pw).astype(jnp.float32)
    return fx, fy


def _sos_power(s11, s12, s22, u0, v0, fx, fy):
    """-(u^2 + v^2) for one pixel block: 10 VPU ops per (pixel, record)."""
    u = s11 * fx + (s12 * fy + u0)
    v = s22 * fy + v0
    return -(u * u + v * v)


def _sep_power(s11, s12, s22, u0, v0, b, pw, pb):
    """Separable evaluation of the same power: u is affine in (x, y) and v
    depends on y only, so over a pixel-row block (pb rows x pw columns) the
    y-terms cost (pb, chunk) work and the x-term (pw, chunk) work; only the
    final add / square / add run per (pixel, record) pair (~4 VPU ops vs
    ~9 for ``_sos_power``). In exact arithmetic the operation order inside
    u, v and the final combination is unchanged -- broadcasting just
    amortizes subexpressions constant along a pixel axis -- so interpret
    mode is bit-identical to ``_sos_power`` (asserted in the test suite).
    On hardware the compiler may contract multiply-adds differently for
    the two expression shapes (ulp-level divergence on borderline pixels);
    that is within the knob-matrix oracle tolerances, and the fwd/bwd
    keep-decision match is unaffected because the backward recompute uses
    the same form as the forward. Layout: (pb, pw, chunk) temporaries put
    pw on sublanes and records on lanes; the collapse to the kernel's
    (pb*pw, chunk) compute shape is a leading-dim reshape."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, pw, 1), 1)
    fxc = idx.astype(jnp.float32)                       # (1, pw, 1)
    yrow = (jax.lax.broadcasted_iota(jnp.int32, (pb, 1, 1), 0)
            + b * pb).astype(jnp.float32)               # (pb, 1, 1)
    s11_, s12_, s22_, u0_, v0_ = (a[None] for a in (s11, s12, s22, u0, v0))
    xterm = s11_ * fxc                                  # (1, pw, chunk)
    wrow = s12_ * yrow + u0_                            # (pb, 1, chunk)
    v = s22_ * yrow + v0_
    v2 = v * v                                          # (pb, 1, chunk)
    u = xterm + wrow                                    # (pb, pw, chunk)
    return (-(u * u + v2)).reshape(pb * pw, s11.shape[1])


def _pick_pixel_block(pw: int, ph: int, chunk: int, budget: int,
                      max_rows: int | None = None) -> int:
    """Rows per pixel block: largest divisor of ph with pw*rows*chunk within
    the VMEM temp budget (elements). Bounds in-kernel (P_blk, chunk) temps.
    ``max_rows`` additionally caps the block height -- the forward kernel
    uses it to give the saturation early-exit sub-tile granularity."""
    best = 1
    cap = ph if max_rows is None else min(ph, max_rows)
    for rows in range(1, cap + 1):
        if ph % rows == 0 and pw * rows * chunk <= budget:
            best = rows
    return best


# ---------------------------------------------------------------------------
# Forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(bnd_ref, ox_ref, oy_ref, rec_hbm, out_ref, rec_buf,
                sem, *, chunk, pw, ph, p, pb, alpha_min, alpha_max, thresh):
    t = pl.program_id(0)
    b0 = bnd_ref[t]
    b1 = bnd_ref[t + 1]
    # Records are consumed straight from the (tile, depth)-sorted layout --
    # no chunk-aligned copy exists. DMA offsets must be 128-aligned (chunk
    # is a multiple of 128 on hardware), so the tile's stream starts at
    # floor_chunk(b0) and lanes outside [b0, b1) are masked out of the blend
    # (they belong to neighbouring tiles).
    start = (b0 // chunk) * chunk
    n = b1 - start
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

    def body(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, 1 - slot).start()

        dma(c, slot).wait()

        rec = rec_buf[slot]                       # (NF, chunk)
        k = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
             + (start + c * chunk))
        in_range = (k >= b0) & (k < b1)
        sos = _sos_chunk(rec, ox, oy, in_range)
        mxl = rec[0:1, :] - ox.astype(jnp.float32)
        myl = rec[1:2, :] - oy.astype(jnp.float32)
        # pixel-row blocks bound the (pblk, chunk) temps to fit VMEM
        # and give the early exit sub-tile granularity; SUB_CHUNKS
        # additionally splits the record axis so saturation mid-chunk
        # skips the tail records too (transmittance carried through
        # out_ref between sub-chunks -- with SUB_CHUNKS == 1 this is
        # exactly the previous whole-chunk computation)
        nsub = _num_sub(chunk)
        sub = chunk // nsub
        for b in range(nblk):
            rows = slice(b * pblk, (b + 1) * pblk)
            for s in range(nsub):
                sl = slice(s * sub, (s + 1) * sub)

                # (row-block, sub-chunk) early exit: saturation is
                # spatially uneven and happens mid-chunk -- both axes
                # of granularity approach draw.glsl's per-pixel break.
                # SUB_GATE=False keeps the shorter sub-chunk scans but
                # drops the per-sub-chunk branch (isolates gate cost
                # from scan-depth savings on hardware; identical values
                # either way).
                def _sub_body(b=b, rows=rows, s=s, sl=sl):
                    s11, s12, s22, u0, v0, opm = (a[:, sl] for a in sos)
                    trans = out_ref[0, rows, 3:4]     # (pblk, 1)
                    fx, fy = _block_coords(b, pw, pb)
                    if POWER_FORM == "sos":
                        power = _sos_power(s11, s12, s22, u0, v0, fx, fy)
                        alpha = jnp.minimum(alpha_max,
                                            jnp.exp(power) * opm)
                        alpha = jnp.where(alpha >= alpha_min, alpha, 0.0)
                    elif POWER_FORM == "sep":  # sos, row terms amortized
                        power = _sep_power(s11, s12, s22, u0, v0,
                                           b, pw, pb)
                        alpha = jnp.minimum(alpha_max,
                                            jnp.exp(power) * opm)
                        alpha = jnp.where(alpha >= alpha_min, alpha, 0.0)
                    else:  # direct quadratic (perf comparison; same maths)
                        dx = fx - mxl[:, sl]
                        dy = fy - myl[:, sl]
                        power = (-0.5 * (rec[2:3, sl] * dx * dx
                                         + rec[4:5, sl] * dy * dy)
                                 - rec[3:4, sl] * dx * dy)
                        alpha = jnp.minimum(alpha_max,
                                            jnp.exp(power) * opm)
                        alpha = jnp.where(
                            (power <= 0.0) & (alpha >= alpha_min),
                            alpha, 0.0)

                    one_m = 1.0 - alpha
                    s_excl = trans * _cumprod_excl_lanes(one_m)
                    inc = s_excl > thresh
                    w = jnp.where(inc, alpha * s_excl, 0.0)
                    # colour accumulation as one MXU matmul contracting
                    # lanes (exact enough at HIGHEST: replaces 3 VPU
                    # mul+lane-reduces)
                    out_ref[0, rows, 0:3] += jax.lax.dot_general(
                        w, rec[6:9, sl],
                        dimension_numbers=(((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.HIGHEST)
                    # new transmittance = inclusive prefix at the last
                    # included lane; the prefix is non-increasing along
                    # lanes (factors in [0,1]) and ``inc`` is a prefix
                    # mask, so it's the masked min -- replaces a second
                    # log2(chunk)-step cumprod scan.
                    out_ref[0, rows, 3:4] = jnp.min(
                        jnp.where(inc, s_excl * one_m, trans),
                        axis=1, keepdims=True)

                # the first sub-chunk's gate IS the row-block gate;
                # later sub-chunks gate only when SUB_GATE
                if SUB_GATE or s == 0:
                    pl.when(jnp.max(out_ref[0, rows, 3:4]) > thresh)(
                        _sub_body)
                else:
                    _sub_body()
        return c + 1

    # Chunk loop with a REAL early exit (r3): a fori_loop would still pay
    # every skipped chunk's DMA + step overhead after the tile saturates --
    # measured as the dominant composite cost on clustered scenes (tiles
    # hold 100k+ records; 40k+ chunk steps per flagship frame). The while
    # condition IS draw.glsl's 0.99 break, evaluated on the whole tile
    # (row-block/sub-chunk gates above keep the finer granularity within a
    # chunk).
    def cond(c):
        return (c < nch) & (jnp.max(out_ref[0, :, 3:4]) > thresh)

    c_end = jax.lax.while_loop(cond, body, 0)

    # drain the in-flight prefetch on early exit: body(c_end - 1) started
    # dma(c_end) when c_end < nch; leaving its semaphore pending would
    # corrupt the next grid step's waits (semaphores are reused)
    @pl.when((c_end < nch) & (c_end > 0))
    def _():
        dma(c_end, jax.lax.rem(c_end, 2)).wait()


# ---------------------------------------------------------------------------
# Backward kernel
# ---------------------------------------------------------------------------


def _bwd_kernel(bnd_ref, ox_ref, oy_ref, rec_hbm, out_res_ref, g_ref,
                zeros_ref, drec_hbm, rec_buf, dbuf, state, rmw_buf, sem,
                osem, rsem, *, chunk, pw, ph, p, pb, alpha_min, alpha_max,
                thresh):
    """Forward-walk backward pass for one tile.

    state: VMEM (p, 2) scratch -- col 0 = running transmittance, col 1 = D,
    the pixel-wise dot of g_rgb with the *remaining* (suffix) colour sum,
    initialised to g . R_total and decremented chunk by chunk.

    Cotangents are written straight into the sorted-record layout. A tile's
    first chunk can be shared with its predecessors' records (the stream
    starts at floor_chunk(b0)); grid steps execute in order and every step
    drains its output DMAs before returning, so the kernel
    read-modify-writes that first chunk: lanes < b0 keep the values already
    in HBM, lanes >= b0 take this tile's gradients. Lanes past b1 in the
    last chunk are written as zeros -- they belong to *later* tiles, which
    restore them the same way.
    """
    t = pl.program_id(0)
    b0 = bnd_ref[t]
    b1 = bnd_ref[t + 1]
    start = (b0 // chunk) * chunk
    n = b1 - start
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

    def dma_rmw():
        off = pl.multiple_of(start, 128)
        return pltpu.make_async_copy(
            drec_hbm.at[:, pl.ds(off, chunk)], rmw_buf, rsem)

    @pl.when(nch > 0)
    def _():
        dma_in(0, 0).start()

        @pl.when(b0 > start)
        def _():
            dma_rmw().start()

    def body(c):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma_in(c + 1, 1 - slot).start()

        dma_in(c, slot).wait()
        # drain the output DMA that used this dbuf slot two chunks ago
        @pl.when(c >= 2)
        def _():
            dma_out(c - 2, slot).wait()

        _bwd_chunk(c, slot)

        # first chunk: restore predecessors' lanes in the shared chunk
        @pl.when((c == 0) & (b0 > start))
        def _():
            dma_rmw().wait()
            lane = start + jax.lax.broadcasted_iota(jnp.int32, (NF, chunk), 1)
            dbuf[slot] = jnp.where(lane < b0, rmw_buf[:, :], dbuf[slot])

        dma_out(c, slot).start()
        return c + 1

    def _bwd_chunk(c, slot):
        rec = rec_buf[slot]                           # (NF, chunk)
        k = (jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
             + (start + c * chunk))
        in_range = (k >= b0) & (k < b1)
        mx, my = rec[0:1, :], rec[1:2, :]
        ca, cb, cc = rec[2:3, :], rec[3:4, :], rec[4:5, :]
        op = rec[5:6, :]
        s11, s12, s22, u0, v0, opm = _sos_chunk(rec, ox, oy, in_range)
        # tile-local record centres keep the moment algebra numerically small
        mxl = mx - ox.astype(jnp.float32)
        myl = my - oy.astype(jnp.float32)

        # pixel-row blocks bound the (pblk, chunk) temps; grads accumulate
        # by read-modify-writing the dbuf slot so every (row-block,
        # sub-chunk) can be saturation-gated like the forward: a saturated
        # block's grads and carry updates are exactly zero/no-ops. The
        # sub-chunk boundaries MUST match the forward's (shared SUB_CHUNKS
        # knob) -- transmittance carries are re-rounded at each boundary, so
        # different boundaries would flip borderline include decisions.
        nsub = _num_sub(chunk)
        sub = chunk // nsub

        def blk(b, rows, s, sl):
            g_rgb = g_ref[0, rows, 0:3]               # (pblk, 3)
            g_t = g_ref[0, rows, 3:4]
            t_fin = out_res_ref[0, rows, 3:4]
            trans = state[rows, 0:1]
            d_carry = state[rows, 1:2]
            s11_, s12_, s22_, u0_, v0_, opm_ = (
                a[:, sl] for a in (s11, s12, s22, u0, v0, opm))
            mxl_, myl_ = mxl[:, sl], myl[:, sl]
            ca_, cb_, cc_ = ca[:, sl], cb[:, sl], cc[:, sl]

            # the recompute MUST make the same keep/include decisions as the
            # forward down to the last ulp (a flipped borderline record
            # shifts transmittance for every later record in the tile), so
            # it follows POWER_FORM exactly
            fx, fy = _block_coords(b, pw, pb)
            if POWER_FORM == "sos":
                power = _sos_power(s11_, s12_, s22_, u0_, v0_, fx, fy)
                alpha_pre = jnp.exp(power) * opm_
                alpha = jnp.minimum(alpha_max, alpha_pre)
                keep = alpha >= alpha_min
            elif POWER_FORM == "sep":
                power = _sep_power(s11_, s12_, s22_, u0_, v0_, b, pw, pb)
                alpha_pre = jnp.exp(power) * opm_
                alpha = jnp.minimum(alpha_max, alpha_pre)
                keep = alpha >= alpha_min
            else:
                dx = fx - mxl_
                dy = fy - myl_
                power = (-0.5 * (ca_ * dx * dx + cc_ * dy * dy)
                         - cb_ * dx * dy)
                alpha_pre = jnp.exp(power) * opm_
                alpha = jnp.minimum(alpha_max, alpha_pre)
                keep = (power <= 0.0) & (alpha >= alpha_min)
            alpha = jnp.where(keep, alpha, 0.0)

            one_m = 1.0 - alpha
            s_excl = trans * _cumprod_excl_lanes(one_m)   # (pblk, sub)
            inc = s_excl > thresh
            abar = jnp.where(inc, alpha, 0.0)
            w = abar * s_excl

            # e_k = g_rgb . colour_k ; V_k = inclusive prefix of w*e
            e = (rec[6:7, sl] * g_rgb[:, 0:1] + rec[7:8, sl] * g_rgb[:, 1:2]
                 + rec[8:9, sl] * g_rgb[:, 2:3])      # (pblk, sub)
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
            pxl, pyl = fx, fy                          # tile-local (pblk, 1)
            ones = jnp.ones((pblk, 1), jnp.float32)
            basis = jnp.concatenate(
                [ones, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl,
                 g_rgb, ones], axis=1)                # (pblk, 10)
            mom = jax.lax.dot_general(
                basis, jnp.concatenate([dpower, w], axis=1),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)   # (10, 2*sub)
            md = mom[:, 0:sub]                         # moments of dpower
            mw = mom[:, sub:2 * sub]                   # moments of w
            s1, sx, sy = md[0:1, :], md[1:2, :], md[2:3, :]
            sxx, sxy, syy = md[3:4, :], md[4:5, :], md[5:6, :]

            dxs = sx - mxl_ * s1                       # sum dpower*dx
            dys = sy - myl_ * s1
            grads = jnp.concatenate([
                ca_ * dxs + cb_ * dys,                 # d mx
                cc_ * dys + cb_ * dxs,                 # d my
                -0.5 * (sxx - 2.0 * mxl_ * sx + mxl_ * mxl_ * s1),
                -(sxy - mxl_ * sy - myl_ * sx + mxl_ * myl_ * s1),
                -0.5 * (syy - 2.0 * myl_ * sy + myl_ * myl_ * s1),
                # d opacity: sum dalpha*exp(power) = sum dpower / op
                # (unclamped under the gate, where alpha == exp(power)*op)
                s1 / jnp.maximum(op[:, sl], 1e-12),
                mw[6:9, :],                            # d colour
            ], axis=0)                                 # (9, sub)
            # pad to the full (NF, chunk) slot width at this sub-chunk's
            # static lane offset and accumulate (lane-sliced VMEM writes at
            # non-128 offsets are not portable; a full-width add is)
            pads = []
            if s > 0:
                pads.append(jnp.zeros((9, s * sub), jnp.float32))
            pads.append(grads)
            if (s + 1) * sub < chunk:
                pads.append(jnp.zeros((9, chunk - (s + 1) * sub), jnp.float32))
            wide = jnp.concatenate(
                [jnp.concatenate(pads, axis=1),
                 jnp.zeros((NF - 9, chunk), jnp.float32)], axis=0)
            dbuf[slot] = dbuf[slot] + wide
            # carry updates: masked-min == prefix product at the last
            # included lane (see forward kernel); v's tail is the we-sum
            state[rows, 0:1] = jnp.min(
                jnp.where(inc, s_excl * one_m, trans), axis=1, keepdims=True)
            state[rows, 1:2] = d_carry - v[:, -1:]

        dbuf[slot] = jnp.zeros((NF, chunk), jnp.float32)
        for b in range(nblk):
            rows = slice(b * pblk, (b + 1) * pblk)
            for s in range(nsub):
                sl = slice(s * sub, (s + 1) * sub)
                # first sub-chunk's gate == the row-block gate; later
                # sub-chunks gate only when SUB_GATE (must mirror forward)
                if SUB_GATE or s == 0:
                    pl.when(jnp.max(state[rows, 0:1]) > thresh)(
                        functools.partial(blk, b, rows, s, sl))
                else:
                    blk(b, rows, s, sl)

    # Chunk loop with a REAL early exit (r3, mirrors the forward kernel):
    # once every pixel saturates, the remaining chunks' gradients are
    # exactly zero -- and those chunks are never visited. Their output
    # region must therefore be pre-zeroed: ``zeros_ref`` is an all-zero
    # input ALIASED to ``drec_hbm`` (input_output_aliases in _bwd_call),
    # so unvisited chunks already hold zero cotangents, and the RMW /
    # "later tiles restore their lanes" invariants hold unchanged (a
    # predecessor that exited early simply left zeros, which are its
    # correct gradients there).
    def cond(c):
        return (c < nch) & (jnp.max(state[:, 0:1]) > thresh)

    c_end = jax.lax.while_loop(cond, body, 0)
    del zeros_ref  # same buffer as drec_hbm; never read by the kernel

    # drain every in-flight DMA before the grid advances and another
    # tile's kernel reuses the semaphores: the input prefetch issued for
    # the never-visited chunk c_end, and the last (up to) two output DMAs
    @pl.when((c_end < nch) & (c_end > 0))
    def _():
        dma_in(c_end, jax.lax.rem(c_end, 2)).wait()

    @pl.when(c_end >= 2)
    def _():
        dma_out(c_end - 2, jax.lax.rem(c_end - 2, 2)).wait()

    @pl.when(c_end >= 1)
    def _():
        dma_out(c_end - 1, jax.lax.rem(c_end - 1, 2)).wait()


# ---------------------------------------------------------------------------
# pallas_call wrappers + custom_vjp
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


FWD_TEMP_BUDGET = 320_000   # elements per (pixel-block, chunk) temp
BWD_TEMP_BUDGET = 131_072
# r3 flagship-clustered sweep (scripts/sweep_composite.py, 3.6M @ 1024x512
# clustered, isolated composite fwd): sep/rows8 55.3 ms vs direct/None
# 58.6 ms; r2's 1080p sweep had the same pair within +-3%. SUB_CHUNKS > 1
# measured catastrophic there (176 ms) -- stays 1.
FWD_EXIT_ROWS = 8           # fwd pixel-block rows cap = early-exit granularity
# r4 flagship bwd sweep (chunk 256, incl. fwd recompute): rows=8 beats
# None on BOTH scene statistics -- uniform 56.4 vs 57.1 ms, clustered
# 98.5 vs 104.1 (values identical; grads past saturation are exactly zero
# at any exit granularity)
BWD_EXIT_ROWS = 8           # bwd pixel-block rows cap = early-exit granularity
POWER_FORM = "sep"          # "sos" | "sep" | "direct" (sweep knob; same
                            # semantics; "sep" == "sos" bit-exactly in
                            # interpret mode, to ulps on hardware)
SUB_CHUNKS = 1              # record-axis early-exit granularity: split each
                            # streamed chunk into this many gated sub-chunks
                            # (1 = whole-chunk, the previous behaviour). One
                            # knob for BOTH kernels: the backward recompute
                            # must carry transmittance at the same
                            # boundaries as the forward or borderline
                            # include decisions diverge.
SUB_GATE = True             # False: run sub-chunks ungated (keeps their
                            # shorter scans/reduces, drops the saturation
                            # branches; values identical either way)


def _num_sub(chunk: int) -> int:
    """Largest divisor of ``chunk`` not exceeding the SUB_CHUNKS knob."""
    n = max(1, int(SUB_CHUNKS))
    while chunk % n:
        n -= 1
    return n


def _fwd_call(rec, bounds, ox, oy, *, num_tiles, chunk, pw, ph, p,
              alpha_min, alpha_max, thresh):
    pb = _pick_pixel_block(pw, ph, chunk, FWD_TEMP_BUDGET,
                           max_rows=FWD_EXIT_ROWS)
    kernel = functools.partial(
        _fwd_kernel, chunk=chunk, pw=pw, ph=ph, p=p, pb=pb,
        alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
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
    )(bounds, ox, oy, rec)


def _bwd_call(rec, bounds, ox, oy, out_res, g, *, num_tiles, chunk, pw,
              ph, p, alpha_min, alpha_max, thresh):
    pb = _pick_pixel_block(pw, ph, chunk, BWD_TEMP_BUDGET,
                           max_rows=BWD_EXIT_ROWS)
    kernel = functools.partial(
        _bwd_kernel, chunk=chunk, pw=pw, ph=ph, p=p, pb=pb,
        alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),                      # rec
            pl.BlockSpec((1, p, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                     # out res
            pl.BlockSpec((1, p, 4), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),                     # g
            pl.BlockSpec(memory_space=pltpu.HBM),                      # zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),                # drec
        scratch_shapes=[
            pltpu.VMEM((2, NF, chunk), jnp.float32),
            pltpu.VMEM((2, NF, chunk), jnp.float32),
            pltpu.VMEM((p, 2), jnp.float32),
            pltpu.VMEM((NF, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    # zeros aliased to the output: unvisited (saturation-skipped) chunks
    # must already hold zero cotangents. Operand indices for aliasing count
    # the scalar-prefetch args: (bounds, ox, oy)=0..2, rec=3, out_res=4,
    # g=5, zeros=6 -> output 0.
    zeros = jnp.zeros(rec.shape, jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(rec.shape, jnp.float32),
        input_output_aliases={6: 0},
        interpret=_interpret(),
    )(bounds, ox, oy, rec, out_res, g, zeros)


@functools.lru_cache(maxsize=64)
def _make_composite_op(num_tiles, chunk, pw, ph, p, alpha_min, alpha_max,
                       thresh):
    """Fused compositor over (tile, depth)-sorted records.

    op(rec (NF, C_pad), bounds (T+1,), ox (T,), oy (T,)) -> (T, p, 4).
    ``rec`` is the sorted packed record array; per-tile ranges come straight
    from ``bounds`` (no chunk-aligned copy). ``C_pad`` must extend at least
    ``chunk`` columns past ``bounds[-1]`` (zero fill) for the tail DMA.
    """
    static = dict(num_tiles=num_tiles, chunk=chunk, pw=pw, ph=ph, p=p,
                  alpha_min=alpha_min, alpha_max=alpha_max, thresh=thresh)

    @jax.custom_vjp
    def op(rec, bounds, ox, oy):
        return _fwd_call(rec, bounds, ox, oy, **static)

    def fwd(rec, bounds, ox, oy):
        out = _fwd_call(rec, bounds, ox, oy, **static)
        return out, (rec, bounds, ox, oy, out)

    def bwd(res, g):
        rec, bounds, ox, oy, out = res
        drec = _bwd_call(rec, bounds, ox, oy, out, g, **static)
        # Columns past the last record are never written by any tile's DMA
        # -> uninitialized memory; zero them before they meet upstream VJPs.
        col = jnp.arange(rec.shape[1], dtype=jnp.int32)
        drec = jnp.where((col < bounds[-1])[None, :], drec, 0.0)
        f0 = jax.dtypes.float0
        return (drec, np.zeros(bounds.shape, f0),
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

    rec = pack_records(records, capacity + 2 * chunk)

    ox, oy = tile_origins(jnp.arange(cfg.num_tiles, dtype=jnp.int32), pw, ph,
                          cfg.grid_x)
    op = _make_composite_op(cfg.num_tiles, chunk, pw, ph, p,
                            float(cfg.alpha_min), float(cfg.alpha_max),
                            float(1.0 - cfg.saturation))
    tiled = op(rec, tile_bounds.astype(jnp.int32), ox, oy)  # (T, p, 4)

    rgb = tiled[:, :, 0:3]                            # (T, p, 3)
    trans = tiled[:, :, 3]                            # (T, p)
    image = assemble_image(rgb, trans, width, height, cfg)
    aux = {"final_transmittance": trans}
    return image, aux
