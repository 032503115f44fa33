"""TPU-native record pipeline: duplication, ordering and layout at HBM speed.

Why this exists: XLA's irregular 1-D ops on TPU are orders of magnitude off
roofline at multi-million-record scale (measured on v5e, 8M records: row
gather 6.8s, searchsorted 0.9-1.4s, 1-D cumsum 0.6s) while ``jax.lax.sort``
moves *full field payloads* almost for free (key+10 floats: 388ms vs 275ms
key-only). So the pipeline is redesigned around two primitives TPUs are
actually good at -- payload sorts and MXU matmuls:

  1. sort splats by depth, field columns riding as sort payloads (N-sized)
  2. expand duplicates: records in splat-major order are a *monotone* gather
     (each output block reads a bounded contiguous input span), done by a
     Pallas kernel as a one-hot MXU matmul -- an exact gather, since 0/1
     multipliers are bf16-exact and a 3-term bf16 split reconstructs f32
  3. stable sort records by tile id, fields as payloads: because step 1
     ordered splats by depth, tile-stable order == (tile, depth) order --
     the reference's packed key sort (preprocess.glsl:154) with the depth
     ordering hoisted to the cheaper N-sized sort. The compositor consumes
     this sorted layout directly (floor-128 DMA starts + range masks in
     ``pallas/composite.py``), so no alignment copy follows.

Backward: sorts un-sort by carrying the source index and re-sorting the
cotangents (a sort is its own transpose engine); the expand's transpose is a
per-splat segment-sum, again a one-hot MXU matmul over contiguous spans.
Gradient identity for duplicated splats (SURVEY.md hard part #5)
holds exactly: every record lands in exactly one segment-sum.

Mosaic layout rules obeyed throughout: bulk data lives fields-as-rows (F, C)
so all dynamic slicing is along lanes at 128-aligned offsets (block starts
are floored to 128; the slack is absorbed by the one-hot indices). All index
arithmetic runs in f32, exact for values < 2^24 (asserted).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# splat-table rows (transposed layout (ROWS, Npad)):
#  0 mx  1 my  2 A  3 B  4 C  5 op  6 r  7 g  8 b
#  9 tmin_x  10 tmin_y  11 ext_x  12 cum_excl  13 cum_incl
#  14 depth (only when the expand op is built with_depth, for the sharded
#  path's owner-side merge sort)  15 pad
# (16 rows: Mosaic requires sublane slice sizes aligned to 8)
NUM_FIELDS = 9
TABLE_ROWS = 16

import os as _os

# Expand sub-block size: every record costs IB = roundup(128 + OB + 1, 128)
# one-hot compares (VPU) and 16 x IB x 3 bf16 MACs (MXU) -- BOTH scale with
# IB, so smaller OB cuts per-record compute while the 128-floor DMA slack
# grows relatively (768/512 = 1.5 ops/record-slot at OB=512; 512/256 = 2.0
# but 512 < 768 absolute at OB=256). Env knob for the hardware sweep
# (scripts/sweep_expand.py); binds at trace time.
OB = int(_os.environ.get("GS_EXP_OB", "512"))
if OB < 128 or OB > 4096 or OB & (OB - 1):
    raise ValueError(
        f"GS_EXP_OB={OB}: expand sub-block size must be a power of two in "
        "[128, 4096] (sweep knob, scripts/sweep_expand.py)")
IB = -(-(128 + OB + 1) // 128) * 128
SB = 512          # splats per segment-sum grid step
ICH = 512         # record chunk per segment-sum inner step
# expand sub-blocks per grid step (amortizes per-step overhead, measured
# ~1.5 us/step; env knob for hardware sweeps, binds at trace time)
EXP_OUTER = int(_os.environ.get("GS_EXP_OUTER", "8"))
if EXP_OUTER < 1 or EXP_OUTER > 64:
    raise ValueError(
        f"GS_EXP_OUTER={EXP_OUTER}: expand outer-block count must be in "
        "[1, 64] (sweep knob, scripts/sweep_expand.py)")


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _interpret() -> bool:
    return jax.devices()[0].platform != "tpu"


# One-hot gathers are exact at asymmetric precision: the value side needs a
# full 3-term bf16 split (f32 has 24 mantissa bits = 3 x 8) but the 0/1
# one-hot side is bf16-exact in a single term. Mosaic does not support
# per-operand dot precision, so the split is done by hand (Dekker-style:
# each remainder subtraction is exact) and accumulated in f32 -- each
# product v_i * {0,1} is exact and the partial sums recombine disjoint bit
# ranges, so gathers reconstruct the f32 value exactly. 3 native bf16 MXU
# passes instead of HIGHEST's 6.


def _split3_bf16(a):
    """Exact decomposition a == a0 + a1 + a2 with each term bf16."""
    a0 = a.astype(jnp.bfloat16)
    r1 = a - a0.astype(jnp.float32)
    a1 = r1.astype(jnp.bfloat16)
    r2 = r1 - a1.astype(jnp.float32)
    a2 = r2.astype(jnp.bfloat16)
    return a0, a1, a2


def _dot(a, b):
    """Exact gather matmul: a = f32 values, b = 0/1 one-hot."""
    bb = b.astype(jnp.bfloat16)
    a0, a1, a2 = _split3_bf16(a)
    acc = jnp.dot(a0, bb, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(a1, bb, preferred_element_type=jnp.float32)
    return acc + jnp.dot(a2, bb, preferred_element_type=jnp.float32)


def _dot_rt(a, b):
    """a (M, K) values x b (N, K) one-hot -> (M, N), contracting lanes.

    Lets one-hots be built in (out, in) orientation so the span tables can
    stay lane-oriented (Mosaic cannot DMA narrow sublane-oriented slices).
    """
    dn = (((1,), (1,)), ((), ()))
    bb = b.astype(jnp.bfloat16)
    a0, a1, a2 = _split3_bf16(a)
    acc = jax.lax.dot_general(a0, bb, dimension_numbers=dn,
                              preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(a1, bb, dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)
    return acc + jax.lax.dot_general(a2, bb, dimension_numbers=dn,
                                     preferred_element_type=jnp.float32)


def _f0(x):
    return np.zeros(np.shape(x), jax.dtypes.float0)


# ---------------------------------------------------------------------------
# payload sort with re-sort backward
# ---------------------------------------------------------------------------

# "payload": one (2+NUM_FIELDS)-operand lax.sort -- every merge pass moves
#   ~44 B/record. "gather": sort only (key, iota) (8 B/record through the
#   sort), then apply the permutation with one XLA gather per field; the
#   backward applies the inverse permutation the same way (one 2-op sort to
#   invert + per-field gathers). Bit-identical outputs. Measured on v5e at
#   the bench record count (scripts/sort2_experiment.py, 2.5M records):
#   payload sort 21.7 ms; 2-op sort 6.1 ms but the 9 XLA gathers cost
#   244 ms (~100x off HBM bandwidth) -- TPU gather is scalar-bound, so
#   "payload" stays the default and "gather" is a measured dead end kept
#   for the record.
#
# NOTE: this flag binds at TRACE time -- jit-compiled callers cache the mode
# they were traced under and ignore later flips, and custom_vjp forward /
# backward must trace under the same mode. That is safe (the two modes are
# proven bit-identical by tests/test_sort_library.py), but flip it only at
# module import, before any pipeline function is traced.
SORT_MODE = "payload"

# Backward cotangent precision through the un-sort. The record sort's
# transpose re-sorts ~9 f32 cotangent columns at full record capacity --
# measured 57 ms of the flagship's 127 ms backward (RESULTS.md r4 bwd stage
# budget). "bf16" packs cotangent PAIRS into single u32 operands (bf16x2
# bitcast), halving the payload operand count (10 -> 6): gradients round to
# bf16 (<= 2^-8 relative) before the per-splat segment sum -- well inside
# Adam's tolerance (the fd-gradient gate is 2.2%), but NOT bit-equal to the
# f32 path, so it is opt-in: set GS_BWD_SORT=bf16 (or flip this flag before
# trace). Forward images are bit-identical either way -- only cotangents
# ride packed.
BWD_COT_PACK = _os.environ.get("GS_BWD_SORT", "f32")


def _pack2(a, b):
    """Two f32 cotangent columns -> one u32 (bf16, bf16) packed operand."""
    ah = jax.lax.bitcast_convert_type(
        a.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    bh = jax.lax.bitcast_convert_type(
        b.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    return ah * jnp.uint32(65536) + bh


def _unpack2(p):
    a = jax.lax.bitcast_convert_type(
        (p // jnp.uint32(65536)).astype(jnp.uint16), jnp.bfloat16)
    b = jax.lax.bitcast_convert_type(
        (p % jnp.uint32(65536)).astype(jnp.uint16), jnp.bfloat16)
    return a.astype(jnp.float32), b.astype(jnp.float32)


def _sort_cotangents(si, g_fields):
    """Un-sort cotangent columns by the recorded source index ``si`` --
    the payload-sort transpose, at ``BWD_COT_PACK`` precision."""
    gs = tuple(g_fields)
    if BWD_COT_PACK != "bf16":
        out = jax.lax.sort((si,) + gs, num_keys=1, is_stable=True)
        return tuple(out[1:])
    npair = len(gs) // 2
    packed = tuple(_pack2(gs[2 * i], gs[2 * i + 1]) for i in range(npair))
    rest = gs[2 * npair:]                       # odd tail stays f32
    out = jax.lax.sort((si,) + packed + rest, num_keys=1, is_stable=True)
    unpacked = []
    for p in out[1:1 + npair]:
        a, b = _unpack2(p)
        unpacked += [a, b]
    return tuple(unpacked) + tuple(out[1 + npair:])


def _permute(fields, perm):
    return tuple(jnp.take(f, perm, axis=0) for f in fields)


@jax.custom_vjp
def sort_with_payload(key, fields: Tuple[jnp.ndarray, ...]):
    """Stable sort by ``key``; returns (sorted_key, source_idx, sorted_fields).

    Differentiable w.r.t. the float field payloads: the backward pass
    re-sorts the cotangents by the recorded source index (no scatter).
    """
    idx = jnp.arange(key.shape[0], dtype=jnp.int32)
    if SORT_MODE == "gather":
        sk, si = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
        return sk, si, _permute(tuple(fields), si)
    out = jax.lax.sort((key, idx) + tuple(fields), num_keys=1, is_stable=True)
    return out[0], out[1], tuple(out[2:])


def _swp_fwd(key, fields):
    sk, si, sf = sort_with_payload(key, fields)
    return (sk, si, sf), (si, jnp.zeros((0,), key.dtype))


def _swp_bwd(res, g):
    si, key_proto = res
    _, _, g_fields = g
    if SORT_MODE == "gather":
        # si is a full permutation (idx = arange), so the cotangent of the
        # forward gather is a gather by the inverse permutation.
        idx = jnp.arange(si.shape[0], dtype=jnp.int32)
        _, inv = jax.lax.sort((si, idx), num_keys=1, is_stable=True)
        unsorted_fields = _permute(tuple(g_fields), inv)
    else:
        unsorted_fields = _sort_cotangents(si, g_fields)
    # The sort order itself carries no gradient (stop-gradient through the
    # key, as in diff-gaussian-rasterization -- SURVEY.md hard part #3).
    if jnp.issubdtype(key_proto.dtype, jnp.floating):
        d_key = jnp.zeros(si.shape, key_proto.dtype)
    else:
        d_key = _f0(si)
    return (d_key, unsorted_fields)


sort_with_payload.defvjp(_swp_fwd, _swp_bwd)


@jax.custom_vjp
def sort_multi_with_payload(keys: Tuple[jnp.ndarray, ...],
                            fields: Tuple[jnp.ndarray, ...]):
    """Stable lexicographic sort by the key tuple; payload semantics and the
    re-sort backward exactly as ``sort_with_payload``. Used by the sharded
    fast path's owner-side (tile, depth) merge of exchanged records."""
    nk = len(keys)
    idx = jnp.arange(keys[0].shape[0], dtype=jnp.int32)
    out = jax.lax.sort(tuple(keys) + (idx,) + tuple(fields), num_keys=nk,
                       is_stable=True)
    return out[0:nk], out[nk], tuple(out[nk + 1:])


def _smp_fwd(keys, fields):
    sk, si, sf = sort_multi_with_payload(keys, fields)
    return (sk, si, sf), (si, tuple(jnp.zeros((0,), k.dtype) for k in keys))


def _smp_bwd(res, g):
    si, key_protos = res
    _, _, g_fields = g
    unsorted_fields = _sort_cotangents(si, g_fields)
    d_keys = tuple(
        jnp.zeros(si.shape, p.dtype) if jnp.issubdtype(p.dtype, jnp.floating)
        else _f0(si) for p in key_protos)
    return (d_keys, unsorted_fields)


sort_multi_with_payload.defvjp(_smp_fwd, _smp_bwd)


# ---------------------------------------------------------------------------
# quantized-payload record sort (the "q16" inference precision mode)
# ---------------------------------------------------------------------------
# The record sort moves its payload operands through every merge pass, and
# the in-pipeline operand probe measured ~5.2 ms/operand at the flagship
# capacity (RESULTS.md r4 "sort operand curve": key+idx only 14.3 ms vs
# 61.1 ms with all 9 f32 fields). Inference does not need bit-exact f32
# fields, so this mode packs the 9 fields into FIVE u32 lanes before the
# sort and unpacks after:
#
#   w0 = mx:24-bit fixed over [-wp, 2*wp)  | opacity[15:8]
#   w1 = my:24-bit fixed over [-hp, 2*hp)  | opacity[7:0]
#   w2 = conic A (f16) << 16 | conic B (f16)
#   w3 = conic C (f16) << 16 | red   (f16)
#   w4 = green   (f16) << 16 | blue  (f16)
#
# Error budget (all measured end-to-end by tests/test_q16.py and gated in
# bench.py against the f32 image): 24-bit means -> <= 1.8e-4 px at 1024 wide
# (a power error ~1e-3 at the steepest alpha slope); f16 conics -> 4.9e-4
# relative, <= ~3e-3 absolute power at the 1/255 cutoff; f16 colours ->
# <= 0.12/255 units; 16-bit opacity -> 1.5e-5. Everything lands well inside
# the reference's own CPU-vs-GPU assert tolerance of 0.01
# (/root/reference/src/Splats.cpp:783-843). Means outside [-wp, 2*wp) x
# [-hp, 2*hp) clamp to the range edge (a splat that far off-screen with a
# rect still touching the image is a degenerate giant; the bench gate
# measures the aggregate effect).
#
# INFERENCE ONLY: quantization is not usefully differentiable (round/clamp
# have zero gradient a.e.), so the custom backward raises instead of
# silently returning zero cotangents. Training paths keep the f32 sort.

_Q16_POS_BITS = 24


def _q16_pack(fields, wp: int, hp: int):
    mx, my, A, B, C, op, r, g, b = fields
    m = (1 << _Q16_POS_BITS) - 1

    def fix24(x, lo, hi):
        s = float(m) / (hi - lo)
        return jnp.clip(jnp.round((x - lo) * s), 0.0, float(m)) \
            .astype(jnp.uint32)

    def f16(x):
        return jax.lax.bitcast_convert_type(
            x.astype(jnp.float16), jnp.uint16).astype(jnp.uint32)

    opq = jnp.clip(jnp.round(op * 65535.0), 0.0, 65535.0).astype(jnp.uint32)
    w0 = fix24(mx, -wp, 2.0 * wp) * jnp.uint32(256) + (opq >> 8)
    w1 = fix24(my, -hp, 2.0 * hp) * jnp.uint32(256) + (opq & jnp.uint32(255))
    w2 = f16(A) * jnp.uint32(65536) + f16(B)
    w3 = f16(C) * jnp.uint32(65536) + f16(r)
    w4 = f16(g) * jnp.uint32(65536) + f16(b)
    return (w0, w1, w2, w3, w4)


def _q16_unpack(words, wp: int, hp: int):
    w0, w1, w2, w3, w4 = words
    m = (1 << _Q16_POS_BITS) - 1

    def unfix24(q, lo, hi):
        s = (hi - lo) / float(m)
        return q.astype(jnp.float32) * s + lo

    def unf16(q):
        return jax.lax.bitcast_convert_type(
            q.astype(jnp.uint16), jnp.float16).astype(jnp.float32)

    mx = unfix24(w0 >> 8, -wp, 2.0 * wp)
    my = unfix24(w1 >> 8, -hp, 2.0 * hp)
    op = (((w0 & jnp.uint32(255)) * jnp.uint32(256)
           + (w1 & jnp.uint32(255))).astype(jnp.float32) / 65535.0)
    A, B = unf16(w2 >> 16), unf16(w2 & jnp.uint32(65535))
    C, r = unf16(w3 >> 16), unf16(w3 & jnp.uint32(65535))
    g, b = unf16(w4 >> 16), unf16(w4 & jnp.uint32(65535))
    return (mx, my, A, B, C, op, r, g, b)


# NOTE on guard placement: a custom_vjp whose differentiable path sits
# behind the integer words does NOT guard anything -- JAX prunes the int
# region out of the gradient graph entirely (silent zero grads, no
# error). Guards must span a float-in -> float-out region:
# ``sort_records_q16`` below for the single-chip sort, and
# ``parallel.fast_sharded._q16_route`` for the sharded
# pack -> exchange -> merge pipeline (both raise in their backward).

@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sort_records_q16(key, fields: Tuple[jnp.ndarray, ...], wp: int, hp: int):
    """Stable single-key record sort with the 9 fields packed to 5 u32
    payload lanes (see the q16 block comment). Returns (sorted_key,
    unpacked sorted fields). ``wp``/``hp`` are the padded image dims (the
    fixed-point position range). Inference-only: differentiating through
    it raises."""
    if len(fields) != NUM_FIELDS:
        raise ValueError(f"q16 sort packs exactly {NUM_FIELDS} fields, "
                         f"got {len(fields)}")
    out = jax.lax.sort((key,) + _q16_pack(fields, wp, hp), num_keys=1,
                       is_stable=True)
    return out[0], _q16_unpack(out[1:], wp, hp)


def _q16_fwd(key, fields, wp, hp):
    return sort_records_q16(key, fields, wp, hp), None


def _q16_bwd(wp, hp, res, g):
    raise NotImplementedError(
        "sort_payload='q16' is an inference-only precision mode: the "
        "quantized record sort has no useful gradient (round/clamp are "
        "flat a.e.). Train with sort_payload='f32'.")


sort_records_q16.defvjp(_q16_fwd, _q16_bwd)


# ---------------------------------------------------------------------------
# expand kernel: depth-sorted splat table -> splat-major records
# ---------------------------------------------------------------------------


def _expand_kernel(s0_ref, meta_ref, table_ref, out_ref,
                   tbuf, sem, *, gx, num_tiles, outer, with_depth,
                   pw, ph, alpha_min):
    """One grid step emits records [g*outer*OB, (g+1)*outer*OB) as ``outer``
    pipelined OB-sized sub-blocks (amortizing per-grid-step overhead).

    s0_ref[b]: 128-floored first splat whose span may intersect sub-block b.
    meta_ref[0]: total record count. Record r belongs to splat s iff
    cum_excl[s] <= r < cum_incl[s]; that predicate's one-hot (built in
    (out, in) orientation against the lane-resident cum rows) gathers all
    splat rows in one exact MXU matmul. Sub-block table DMAs are
    double-buffered: slot j%2 is only reused after its compute finished.

    Ellipse-reachability cull (with ``alpha_min``; needs tile pixel dims
    ``pw`` x ``ph``): the reference bins every tile of the splat's 3-sigma
    AABB (``preprocess.glsl``) and lets ``draw.glsl``'s per-pixel alpha
    cutoff reject the pairs; here each record additionally checks whether
    its Gaussian can reach alpha_min ANYWHERE in its tile's pixel rect. The
    exact minimum of the PSD conic quadratic q over the rect is the min of
    the two KKT edge candidates (clamped 1-D minimizers); if
    exp(-qmin/2) * op < alpha_min the record contributes exactly zero to
    every pixel of the tile, so it is marked invalid (tile = num_tiles):
    the tile sort pushes it past bounds[-1] and the compositor never
    streams it. Output-exact by construction (margin absorbs the f32
    formulation rounding between this test and the compositor's power);
    culls AABB-corner tiles the ellipse misses and the op-dependent
    radius shrink (contribution radius is sqrt(2 ln(op/alpha_min)) sigma,
    not 3 sigma) the reference's binning ignores. ~25 VPU ops per record,
    amortized over the tile's pw*ph pixel evaluations it saves.
    """
    g = pl.program_id(0)
    total = meta_ref[0]

    def dma(j, slot):
        s0 = pl.multiple_of(s0_ref[g * outer + j], 128)
        return pltpu.make_async_copy(
            table_ref.at[:, pl.ds(s0, IB)], tbuf.at[slot], sem.at[slot])

    dma(0, 0).start()
    for j in range(outer):
        slot = j % 2
        if j + 1 < outer:
            dma(j + 1, 1 - slot).start()
        r0 = (g * outer + j) * OB
        r_col = (r0 + jax.lax.broadcasted_iota(jnp.int32, (OB, 1), 0)
                 ).astype(jnp.float32)
        r = (r0 + jax.lax.broadcasted_iota(jnp.int32, (1, OB), 1)
             ).astype(jnp.float32)
        dma(j, slot).wait()

        tb = tbuf[slot]
        excl = tb[12:13, :]                               # (1, IB)
        incl = tb[13:14, :]
        onehot_t = jnp.where((excl <= r_col) & (r_col < incl), 1.0, 0.0)
        vals = _dot_rt(tb[:, :], onehot_t)                # (TABLE_ROWS, OB)

        joff = r - vals[12:13, :]                         # r - cum_excl[s]
        ext = jnp.maximum(vals[11:12, :], 1.0)
        q = jnp.floor((joff + 0.5) / ext)
        ty = vals[10:11, :] + q
        tx = vals[9:10, :] + (joff - q * ext)
        tile = ty * gx + tx

        keep = r < total
        if alpha_min is not None:
            mx, my = vals[0:1, :], vals[1:2, :]
            aa, bb, cc = vals[2:3, :], vals[3:4, :], vals[4:5, :]
            x0 = tx * float(pw)
            y0 = ty * float(ph)
            # nearest-bound clamps (KKT active constraints of the convex q)
            dx0 = jnp.clip(mx, x0, x0 + (pw - 1)) - mx
            dy0 = jnp.clip(my, y0, y0 + (ph - 1)) - my
            ylo = y0 - my
            xlo = x0 - mx
            # edge candidates: fix one coordinate at its bound, minimize the
            # 1-D quadratic in the other, clamped back into the rect
            dys = jnp.clip(-bb * dx0 / jnp.maximum(cc, 1e-12),
                           ylo, ylo + (ph - 1))
            q1 = (aa * dx0 * dx0 + cc * dys * dys) + 2.0 * (bb * dx0 * dys)
            dxs = jnp.clip(-bb * dy0 / jnp.maximum(aa, 1e-12),
                           xlo, xlo + (pw - 1))
            q2 = (aa * dxs * dxs + cc * dy0 * dy0) + 2.0 * (bb * dxs * dy0)
            qmin = jnp.minimum(q1, q2)
            # reachable iff exp(-qmin/2) * op >= alpha_min; the margin keeps
            # the test conservative under f32 formulation rounding
            ln_ratio = (jnp.log(jnp.maximum(vals[5:6, :], 1e-30))
                        - float(np.log(alpha_min)))
            keep = keep & (qmin * 0.49999 <= ln_ratio + 1e-4)

        valid = (r < total).astype(jnp.float32)
        cols = slice(j * OB, (j + 1) * OB)
        out_ref[0:NUM_FIELDS, cols] = vals[0:NUM_FIELDS, :] * valid
        out_ref[NUM_FIELDS:NUM_FIELDS + 1, cols] = jnp.where(
            keep, tile, jnp.float32(num_tiles))
        if with_depth:
            out_ref[NUM_FIELDS + 1:NUM_FIELDS + 2, cols] = (
                vals[14:15, :] * valid)
            out_ref[NUM_FIELDS + 2:, cols] = jnp.zeros(
                (16 - NUM_FIELDS - 2, OB), jnp.float32)
        else:
            out_ref[NUM_FIELDS + 1:, cols] = jnp.zeros(
                (16 - NUM_FIELDS - 1, OB), jnp.float32)


def _expand_call(table_t, s0_arr, meta, *, capacity, gx, num_tiles,
                 with_depth=False, pw=None, ph=None, alpha_min=None):
    assert capacity % (OB * EXP_OUTER) == 0
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(capacity // (OB * EXP_OUTER),),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # table (ROWS, Npad)
        ],
        out_specs=pl.BlockSpec((16, OB * EXP_OUTER), lambda g, s0, m: (0, g),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, TABLE_ROWS, IB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_expand_kernel, gx=gx, num_tiles=num_tiles,
                               outer=EXP_OUTER, with_depth=with_depth,
                               pw=pw, ph=ph, alpha_min=alpha_min)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, capacity), jnp.float32),
        interpret=_interpret(),
    )(s0_arr, meta, table_t)


def _segsum_kernel(a0_ref, nch_ref, drec_ref, cum2l_ref, out_ref,
                   dbuf, cbuf, sem, csem):
    """Transpose of expand: per-splat segment-sum of record cotangents.

    Grid step covers splats [n0, n0+SB); its records are the contiguous span
    [cum_excl[n0], cum_incl[n0+SB-1]), streamed in ICH chunks and reduced
    onto the splat axis by the transposed one-hot matmul. Chunk DMAs are
    double-buffered (slot c%2 reused only after its compute): the original
    start-then-wait serialization made the whole kernel DMA-latency-bound
    (~12k chunks x ~2 us at flagship capacity dominated the measured
    32.7 ms bwd stage -- RESULTS.md r4 budget).
    """
    b = pl.program_id(0)
    n0 = b * SB
    a0 = pl.multiple_of(a0_ref[b], 128)
    nch = nch_ref[b]

    cdma = pltpu.make_async_copy(
        cum2l_ref.at[:, pl.ds(n0, SB)], cbuf, csem)
    cdma.start()
    out_ref[:, :] = jnp.zeros((NUM_FIELDS, SB), jnp.float32)
    cdma.wait()
    excl = cbuf[0:1, :]                                   # (1, SB)
    incl = cbuf[1:2, :]
    del csem

    def dma(c, slot):
        return pltpu.make_async_copy(
            drec_ref.at[:, pl.ds(a0 + c * ICH, ICH)], dbuf.at[slot],
            sem.at[slot])

    @pl.when(nch >= 1)
    def _():
        dma(0, 0).start()

    def body(c, _):
        slot = jax.lax.rem(c, 2)

        @pl.when(c + 1 < nch)
        def _():
            dma(c + 1, 1 - slot).start()

        dma(c, slot).wait()
        ridx = (a0 + c * ICH
                + jax.lax.broadcasted_iota(jnp.int32, (ICH, 1), 0)
                ).astype(jnp.float32)
        onehot = jnp.where((excl <= ridx) & (ridx < incl), 1.0, 0.0)  # (ICH, SB)
        out_ref[:, :] += _dot(dbuf[slot][0:NUM_FIELDS, :], onehot)

    jax.lax.fori_loop(0, nch, body, None)


def _segsum_call(drec_padded, cum2_lanes, a0_arr, nch_arr, *, n_seg_pad):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_seg_pad // SB,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),   # drec (16, Cpad+IB)
            pl.BlockSpec(memory_space=pltpu.HBM),   # cum2 lanes (2, Npad)
        ],
        out_specs=pl.BlockSpec((NUM_FIELDS, SB), lambda b, a, n: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 16, ICH), jnp.float32),
            pltpu.VMEM((8, SB), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NUM_FIELDS, n_seg_pad), jnp.float32),
        interpret=_interpret(),
    )(a0_arr, nch_arr, drec_padded, cum2_lanes)


def make_expand_op(*, capacity: int, gx: int, num_tiles: int, n_seg_pad: int,
                   with_depth: bool = False, pw: int | None = None,
                   ph: int | None = None, alpha_min: float | None = None):
    """Differentiable duplicate expansion.

    op(table_t (TABLE_ROWS, Npad), cum2_lanes (8, Npad), s0_arr, meta,
       a0_arr, nch_arr) -> (16, capacity) records [9 fields, tile,
       depth-if-requested, zeros] in splat-major (depth) order. With
       ``with_depth`` the table's row 14 must hold per-splat depth; it rides
       along for the sharded path's owner-side merge sort (no gradient --
       sort keys are stop-gradient, as in ``sort_with_payload``).

    With ``alpha_min`` (and the tile pixel dims ``pw`` x ``ph``), records
    whose Gaussian cannot reach alpha_min anywhere in their tile are marked
    invalid -- see ``_expand_kernel``; output-exact, composite work shrinks.
    """

    @jax.custom_vjp
    def op(table_t, cum2_lanes, s0_arr, meta, a0_arr, nch_arr):
        return _expand_call(table_t, s0_arr, meta,
                            capacity=capacity, gx=gx, num_tiles=num_tiles,
                            with_depth=with_depth, pw=pw, ph=ph,
                            alpha_min=alpha_min)

    def fwd(table_t, cum2_lanes, s0_arr, meta, a0_arr, nch_arr):
        out = op(table_t, cum2_lanes, s0_arr, meta, a0_arr, nch_arr)
        return out, (table_t.shape, cum2_lanes, s0_arr, meta, a0_arr, nch_arr)

    def bwd(res, g):
        table_shape, cum2_lanes, s0_arr, meta, a0_arr, nch_arr = res
        # pad cotangents so segment-sum chunk DMAs stay in range
        g_pad = jnp.zeros((16, round_up(g.shape[1] + 2 * ICH, ICH)), jnp.float32)
        g_pad = g_pad.at[:, 0:g.shape[1]].set(g)
        d_fields = _segsum_call(g_pad, cum2_lanes, a0_arr, nch_arr,
                                n_seg_pad=n_seg_pad)
        d_table = jnp.zeros(table_shape, jnp.float32)
        d_table = d_table.at[0:NUM_FIELDS, 0:n_seg_pad].set(
            d_fields[:, 0:min(n_seg_pad, table_shape[1])])
        return (d_table, jnp.zeros_like(cum2_lanes),
                _f0(s0_arr), _f0(meta), _f0(a0_arr), _f0(nch_arr))

    op.defvjp(fwd, bwd)
    return op


