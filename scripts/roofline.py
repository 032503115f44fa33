#!/usr/bin/env python
"""Per-stage roofline model, refreshed to the round-4 flagship stage budget.

Static traffic/compute model per pipeline stage against v5e peaks, compared
with measured wall-clock (defaults are the round-4 flagship measurements,
RESULTS.md stage budget; pass --fwd-ms etc. to re-pin). The reference's
counterpart is its stage-time prints (``Splats.cpp:777-781,847-864``); this
adds the "how far from speed-of-light" column BASELINE.md asks for, and
exports ``utilization()`` so bench.py can stamp an mfu/hbm_util figure into
the BENCH json (VERDICT r3 weak #4).

v5e peaks used (approximate, public figures): HBM ~819 GB/s, VPU f32
~1.7 TFLOP/s (8x128 lanes, FMA, ~1.7 GHz), MXU bf16 ~197 TFLOP/s /
f32-equivalent-highest ~25 TFLOP/s.

Model notes (assumptions, not measurements):
- the record sort is modeled as an XLA multi-pass merge moving all operand
  columns ~log2(C) round trips -- XLA's actual network is opaque; the
  resulting "SoL" is a LOWER bound on achievable time, so % SoL for the
  sort is an upper bound on headroom;
- expand/segsum MXU flops are exact (3 bf16 passes x 16 x IB per record);
  their MFU is flops / (measured_time x bf16 peak);
- composite pairs = binned records x pixels/tile; ~40 VPU ops/pair fwd.
"""

import argparse
import json

HBM = 819e9
VPU = 1.7e12
MXU_BF16 = 197e12

# round-4 flagship stage budget (RESULTS.md): packed key, chunk 256,
# capacity 6,291,456, uniform scene, one v5e
FLAGSHIP = dict(splats=3_616_103, records=6_291_456, capacity=6_291_456,
                tiles=512, pixels_per_tile=1024, chunk=256,
                prep_ms=4.8, cumsum_ms=3.8, expand_ms=18.8,
                record_sort_ms=61.1, composite_ms=23.1,
                fwd_ms=111.6, fwdbwd_ms=236.9)


def model(p):
    """p: dict like FLAGSHIP -> list of stage rows + utilization summary."""
    import math

    n, c, cap = p["splats"], p["records"], p["capacity"]
    t, px = p["tiles"], p["pixels_per_tile"]
    rows = []

    def stage(name, ms, bytes_, flops, bound):
        peak = VPU if bound == "VPU" else MXU_BF16
        t_bw = bytes_ / HBM * 1e3
        t_fl = flops / peak * 1e3
        sol = max(t_bw, t_fl)
        rows.append(dict(name=name, ms=ms, bytes=bytes_, flops=flops,
                         bound=bound, sol_ms=sol,
                         pct_sol=round(sol / ms * 100, 1) if ms else 0.0,
                         hbm_util=round(t_bw / ms, 3) if ms else 0.0,
                         mfu=round(t_fl / ms, 3)
                         if (ms and bound == "MXU") else None))

    # preprocess: ~30 elementwise rounds over N splat columns (14 cols)
    stage("preprocess", p["prep_ms"], n * 4 * 14 * 2, n * 250, "VPU")
    # cumsum + table build: one scan over N + 16-row table write at Npad
    stage("cumsum+table", p["cumsum_ms"], n * 4 * (2 + 16 + 16), n * 10,
          "VPU")
    # expand: per record, 3 bf16 MXU passes of 16 x IB(768) one-hot dot
    # (exact flop count) + table DMA + 16-row record write
    stage("expand (Pallas)", p["expand_ms"],
          cap * (16 * 4 + 16 * 4),
          cap * 768 * 16 * 2 * 3, "MXU")
    # record sort: 12 operand columns x ~log2(C) merge round trips (model)
    passes = math.log2(max(c, 2))
    stage("record sort (lax.sort)", p["record_sort_ms"],
          int(cap * 12 * 4 * 2 * passes), cap * 50, "VPU")
    # composite fwd: stream records once + ~40 VPU ops per record-pixel
    # pair, of which the chunk/row early exits skip ~77% (exit_model.py's
    # measured 0.80G of 3.53G pairs at bench scale -> factor 0.23); the
    # naive all-pairs bound would overstate SoL ~4x
    stage("composite fwd (Pallas)", p["composite_ms"],
          cap * 64 + t * px * 16, int(c * px * 40 * 0.23), "VPU")

    sol_total = sum(r["sol_ms"] for r in rows)
    sort_row = next(r for r in rows if "sort" in r["name"])
    return rows, dict(
        fwd_ms=p["fwd_ms"],
        fwd_sol_ms=round(sol_total, 1),
        fwd_pct_sol=round(sol_total / p["fwd_ms"] * 100, 1),
        # the two well-defined utilizations: expand's flop count is exact,
        # the sort's byte count is a merge-pass model (lower bound on
        # traffic). Composite %SoL is intentionally NOT summarized -- its
        # work is data-dependent (early exits), so a single factor is
        # scene-specific; see the table row + exit_model.py.
        expand_mfu=next(r["mfu"] for r in rows if r["bound"] == "MXU"),
        sort_hbm_util_model=sort_row["hbm_util"],
        sort_model_note="sort bytes assume log2(C) merge round trips -- a "
                        "traffic lower bound; see docstring",
    )


def utilization(records=None, capacity=None, fwd_ms=None):
    """One-line utilization summary for bench.py's JSON tail. Any argument
    left None falls back to the pinned flagship operating point."""
    p = dict(FLAGSHIP)
    if records:
        p["records"] = int(records)
    if capacity:
        p["capacity"] = int(capacity)
    if fwd_ms:
        # scale the per-stage measurements by the frame-time ratio so the
        # utilization figure tracks the measured frame, not the pinned one
        s = fwd_ms / p["fwd_ms"]
        for k in ("prep_ms", "cumsum_ms", "expand_ms", "record_sort_ms",
                  "composite_ms"):
            p[k] *= s
        p["fwd_ms"] = fwd_ms
    _, summary = model(p)
    return summary


def fmt(x):
    for unit, div in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if x >= div:
            return f"{x / div:.2f} {unit}"
    return f"{x:.0f} "


def main():
    ap = argparse.ArgumentParser()
    for k, v in FLAGSHIP.items():
        ap.add_argument(f"--{k.replace('_', '-')}",
                        type=type(v), default=v)
    a = ap.parse_args()
    p = {k: getattr(a, k) for k in FLAGSHIP}

    rows, summary = model(p)
    print(f"scene: {p['splats']:,} splats, {p['records']:,} records "
          f"(cap {p['capacity']:,}), {p['tiles']} tiles x "
          f"{p['pixels_per_tile']}px")
    print(f"{'stage':26} {'ms':>8} {'bytes':>10} {'flops':>10} "
          f"{'bound':>5} {'SoL ms':>8} {'% SoL':>6}")
    for r in rows:
        print(f"{r['name']:26} {r['ms']:8.1f} {fmt(r['bytes']) + 'B':>10} "
              f"{fmt(r['flops']) + 'F':>10} {r['bound']:>5} "
              f"{r['sol_ms']:8.2f} {r['pct_sol']:5.0f}%")
    print(f"TOTAL fwd                  {p['fwd_ms']:8.1f} "
          f"(modeled SoL {summary['fwd_sol_ms']} ms = "
          f"{summary['fwd_pct_sol']}% of measured)")
    print(f"TOTAL fwd+bwd              {p['fwdbwd_ms']:8.1f}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
