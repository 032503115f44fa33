"""TPU-native 3-phase LSD radix sort (the reference's sort library, complete).

The reference's reusable GPU sort (``src/sort.cpp:139-203``) is three phases
per 4-bit digit: per-workgroup histograms (``generateHistograms.glsl:42-66``),
a global exclusive prefix over the digit-major histogram table
(``computePrefixSum.glsl:21-49``), and a stable scatter
(``scan.glsl:73-79``) -- 8 passes over 32-bit keys. This module is the same
algorithm re-designed for Mosaic's constraints instead of translated:

* GPUs scatter with per-lane dynamic stores; Mosaic has none. Placement is
  an EXACT one-hot MXU matmul (the codebase's gather trick, records._dot_rt)
  into a 128-aligned read-modify-write window of the output, correct because
  the TPU grid is sequential (the same RMW argument the compositor backward
  uses for its shared boundary chunk).
* Inter-workgroup coordination (phase 2) is a flat Pallas prefix scan
  (``ops/pallas/scan.cumsum``) over the digit-major (chunk, digit) table --
  the direct descendant of ``computePrefixSum.glsl``.
* Keys ride as two exact-in-f32 16-bit halves (hi, lo) so digit extraction
  is floor/multiply arithmetic (the repo-wide "index math in f32" rule);
  payload rows are carried through the same placement matmuls, so like the
  reference (and ``lax.sort``) this is a payload sort: no per-record gather
  ever happens.

Status (measured -- see ARCHITECTURE.md dead-ends and
``scripts/radix_sort_bench.py``): a full multi-pass distribution sort on TPU
is far slower than ``lax.sort`` at production scale, exactly as the
carry-block level probe predicted (``scripts/bucketer_probe.py``). It ships
as a complete, exact, tested component -- selectable on the single-key fast
paths via ``RenderConfig.record_sort="radix"`` -- while ``lax.sort`` remains
the production default.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from openglgaussiansplattingrenderer_tpu.ops.pallas import scan as pscan
from openglgaussiansplattingrenderer_tpu.ops.pallas.records import (
    _dot_rt,
    _f0,
    _interpret,
    round_up,
)

R = 512            # records per chunk (one grid step)
BITS = 4           # digit width: the reference's own 4-bit plan (sort.cpp:139)
K = 1 << BITS      # 16 buckets per pass
WIN = R + 128      # RMW window: off < 128 slack + R placed records


def _digit_f32(k16, shift):
    """Digit (bits [shift, shift+BITS)) of a 16-bit key half held in f32.

    Exact: k16 < 2^16, all products/floors below 2^24.
    """
    lo = jnp.floor(k16 * (1.0 / float(1 << shift)))
    hi = jnp.floor(k16 * (1.0 / float(1 << (shift + BITS))))
    return lo - float(K) * hi


# ---------------------------------------------------------------------------
# phase 1: per-chunk digit histogram (generateHistograms.glsl)
# ---------------------------------------------------------------------------


HC = 8             # chunks histogrammed per grid step (8-sublane out blocks)


def _hist_kernel(blk_ref, out_ref, *, key_row, shift):
    # counts[i, j] = # records in sub-chunk i with digit j, as ONE exact
    # bf16 MXU dot: sub-chunk selector (HC, HC*R) x digit one-hot
    # (128, HC*R)^T -- 0/1 products, f32 accumulation
    d = _digit_f32(blk_ref[key_row:key_row + 1, :], shift)        # (1, HC*R)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (128, HC * R), 0)
    onehot = jnp.where(row_iota.astype(jnp.float32) == d, 1.0, 0.0)
    lane_chunk = jax.lax.broadcasted_iota(jnp.int32, (HC, HC * R), 1) // R
    sub_iota = jax.lax.broadcasted_iota(jnp.int32, (HC, HC * R), 0)
    sel = jnp.where(lane_chunk == sub_iota, 1.0, 0.0)             # (HC, HC*R)
    counts = jax.lax.dot_general(
        sel.astype(jnp.bfloat16), onehot.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                       # (HC, 128)
    out_ref[:, :] = counts


def _histogram(rec, *, key_row, shift, n_chunks, nr):
    assert n_chunks % HC == 0
    return pl.pallas_call(
        lambda b, o: _hist_kernel(b, o, key_row=key_row, shift=shift),
        grid=(n_chunks // HC,),
        in_specs=[pl.BlockSpec((nr, HC * R), lambda g: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((HC, 128), lambda g: (g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_chunks, 128), jnp.float32),
        interpret=_interpret(),
    )(rec)


# ---------------------------------------------------------------------------
# phase 2: digit-major exclusive prefix (computePrefixSum.glsl)
# ---------------------------------------------------------------------------


def _prefix_offsets(counts_i32):
    """(n_chunks, K) counts -> (n_chunks+1, K) global placement bases.

    P[c, k] = (# records with digit < k anywhere) + (# digit-k records in
    chunks < c); row n_chunks closes each digit's range so the scatter can
    read counts back as P[c+1, k] - P[c, k].
    """
    n_chunks = counts_i32.shape[0]
    flat = counts_i32.T.reshape(-1)                # digit-major
    incl = pscan.cumsum(flat)
    excl = incl - flat
    body = excl.reshape(K, n_chunks).T             # (n_chunks, K)
    last = incl.reshape(K, n_chunks)[:, -1]        # digit range ends
    return jnp.concatenate([body, last[None, :]], axis=0)


# ---------------------------------------------------------------------------
# phase 3: stable scatter via RMW windows (scan.glsl)
# ---------------------------------------------------------------------------


def _scatter_kernel(offs_ref, blk_ref, out_ref, win, sem, *, key_row, shift,
                    nr):
    c = pl.program_id(0)
    d = _digit_f32(blk_ref[key_row:key_row + 1, :], shift)        # (1, R)
    slot_iota = jax.lax.broadcasted_iota(
        jnp.int32, (WIN, R), 0).astype(jnp.float32)
    col_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, WIN), 1).astype(jnp.float32)
    for k in range(K):
        dest = offs_ref[c * K + k]
        cnt = offs_ref[(c + 1) * K + k] - dest
        astart = (dest // 128) * 128
        off = (dest - astart).astype(jnp.float32)

        @pl.when(cnt > 0)
        def _():
            # in-bucket rank: inclusive prefix sum over lanes
            mask = jnp.where(d == float(k), 1.0, 0.0)             # (1, R)
            x = mask
            s = 1
            while s < R:
                x = x + jnp.concatenate(
                    [jnp.zeros((1, s), jnp.float32), x[:, :-s]], axis=1)
                s *= 2
            slot = (off + x - 1.0) * mask + (1.0 - mask) * -2.0
            onehot = jnp.where(slot_iota == slot, 1.0, 0.0)       # (WIN, R)
            # read-modify-write the 128-aligned window (sequential grid)
            rd = pltpu.make_async_copy(
                out_ref.at[:, pl.ds(astart, WIN)], win, sem)
            rd.start()
            rd.wait()
            staged = _dot_rt(blk_ref[:, :], onehot)               # (nr, WIN)
            occ = (col_iota >= off) & (col_iota < off + cnt.astype(jnp.float32))
            win[:, :] = jnp.where(occ, staged, win[:, :])
            wr = pltpu.make_async_copy(
                win, out_ref.at[:, pl.ds(astart, WIN)], sem)
            wr.start()
            wr.wait()


def _scatter(rec, offs_flat, *, key_row, shift, n_chunks, nr, w_out):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_chunks,),
        in_specs=[pl.BlockSpec((nr, R), lambda g, *_: (0, g),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((nr, WIN), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        lambda o, b, out, w, s: _scatter_kernel(
            o, b, out, w, s, key_row=key_row, shift=shift, nr=nr),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nr, w_out), jnp.float32),
        interpret=_interpret(),
    )(offs_flat, rec)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def radix_sort(keys: jnp.ndarray, values: Tuple[jnp.ndarray, ...] = (),
               key_bits: int = 32):
    """Stable LSD radix sort of uint32 ``keys`` with f32 payload ``values``.

    ``key_bits`` bounds the key range (keys < 2**key_bits) and sets the pass
    count ceil(key_bits / 4) -- pass key_bits=ceil(log2(num_tiles)) for a
    tile-only sort, 32 for arbitrary keys (the reference always runs the
    full 8 passes, ``sort.cpp:147``).

    Returns (sorted_keys uint32, tuple of sorted value arrays). Exact and
    stable: equal keys keep their input order (verified against
    ``lax.sort`` in tests/test_radix_sort.py).

    Size ceiling: the scatter phase scalar-prefetches its (n_chunks+1)*16
    int32 offset table into SMEM, which is small (order 1 MB, partly
    reserved by Mosaic). The largest hardware-validated size is 2M keys
    (262 KB table, scripts/radix_sort_bench.py); above ~300 KB we raise a
    clear error instead of surfacing a Mosaic allocation failure.
    """
    if keys.dtype not in (jnp.uint32, jnp.int32):
        raise ValueError(f"radix_sort keys must be (u)int32, got {keys.dtype}")
    keys = keys.astype(jnp.uint32)
    c = keys.shape[0]
    n_passes = -(-key_bits // BITS)
    c_pad = round_up(max(c, HC * R), HC * R)
    if (c_pad // R + 1) * K * 4 > 300 * 1024:
        raise ValueError(
            f"radix_sort: {c} keys needs a {(c_pad // R + 1) * K * 4 // 1024}"
            " KB SMEM offset table, past the hardware-validated ceiling "
            "(2M keys / 262 KB); use lax.sort at this scale (it is faster "
            "there anyway, RESULTS.md)")
    f = len(values)
    nr = round_up(f + 2, 8)
    hi_row, lo_row = f, f + 1

    # rows: values..., key_hi16, key_lo16 -- both halves exact in f32
    rec = jnp.zeros((nr, c_pad), jnp.float32)
    for i, v in enumerate(values):
        if v.shape != keys.shape:
            raise ValueError("radix_sort values must match keys shape")
        rec = rec.at[i, 0:c].set(v.astype(jnp.float32))
    # padding keys = 0xFFFFFFFF sort to the end (stability keeps real
    # max-key records, which come first in input order, ahead of the pads)
    hi = jnp.full(c_pad, 65535.0, jnp.float32).at[0:c].set(
        jnp.floor_divide(keys, jnp.uint32(65536)).astype(jnp.float32))
    lo = jnp.full(c_pad, 65535.0, jnp.float32).at[0:c].set(
        jnp.remainder(keys, jnp.uint32(65536)).astype(jnp.float32))
    rec = rec.at[hi_row].set(hi).at[lo_row].set(lo)

    n_chunks = c_pad // R
    w_out = round_up(c_pad, 128) + WIN
    for p in range(n_passes):
        bit0 = p * BITS
        key_row = lo_row if bit0 < 16 else hi_row
        shift = bit0 if bit0 < 16 else bit0 - 16
        counts = _histogram(rec, key_row=key_row, shift=shift,
                            n_chunks=n_chunks, nr=nr)[:, 0:K]
        offs = _prefix_offsets(counts.astype(jnp.int32))
        rec = _scatter(rec, offs.reshape(-1),
                       key_row=key_row, shift=shift,
                       n_chunks=n_chunks, nr=nr, w_out=w_out)[:, 0:c_pad]

    out_keys = (rec[hi_row, 0:c].astype(jnp.uint32) * jnp.uint32(65536)
                + rec[lo_row, 0:c].astype(jnp.uint32))
    return out_keys, tuple(rec[i, 0:c] for i in range(f))


# ---------------------------------------------------------------------------
# pipeline adapter: sort_with_payload drop-in (single-key fast paths)
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def radix_sort_with_payload(key, fields: Tuple[jnp.ndarray, ...],
                            key_bits: int = 32):
    """``records.sort_with_payload`` semantics on the radix engine.

    Stable sort by uint32 ``key``; returns (sorted_key, source_idx,
    sorted_fields). Differentiable w.r.t. the float payloads with the same
    re-sort backward as the lax.sort path (the sort order itself carries no
    gradient -- SURVEY.md hard part #3). Requires len(key) < 2^24 so the
    carried source index stays f32-exact (the fast path asserts the same
    bound on capacity).
    """
    c = key.shape[0]
    if c >= (1 << 24):
        raise ValueError("radix_sort_with_payload needs len < 2^24")
    idx = jnp.arange(c, dtype=jnp.float32)
    sk, out = radix_sort(key, tuple(fields) + (idx,), key_bits=key_bits)
    return sk, out[-1].astype(jnp.int32), tuple(out[:-1])


def _rswp_fwd(key, fields, key_bits):
    sk, si, sf = radix_sort_with_payload(key, fields, key_bits)
    return (sk, si, sf), si


def _rswp_bwd(key_bits, si, g):
    _, _, g_fields = g
    out = jax.lax.sort((si,) + tuple(g_fields), num_keys=1, is_stable=True)
    return (_f0(si), tuple(out[1:]))


radix_sort_with_payload.defvjp(_rswp_fwd, _rswp_bwd)
