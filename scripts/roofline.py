#!/usr/bin/env python
"""Per-stage roofline model for the headline bench scene.

Static traffic/compute model per pipeline stage against v5e peaks, compared
with measured wall-clock (defaults are the round-1 measurements; pass
--fwd-ms etc. to update). The reference's counterpart is its stage-time
prints (``Splats.cpp:777-781,847-864``); this adds the "how far from
speed-of-light" column BASELINE.md asks for.

v5e peaks used (approximate, public figures): HBM ~819 GB/s, VPU f32
~1.7 TFLOP/s (8x128 lanes, FMA, ~1.7 GHz), MXU f32(hi) ~25 TFLOP/s.
"""

import argparse
import json
import sys

HBM = 819e9
VPU = 1.7e12
MXU_F32 = 25e12


def fmt(x):
    for unit, div in (("G", 1e9), ("M", 1e6), ("K", 1e3)):
        if x >= div:
            return f"{x / div:.2f} {unit}"
    return f"{x:.0f} "


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splats", type=int, default=1_000_000)
    ap.add_argument("--records", type=int, default=3_443_577)
    ap.add_argument("--capacity", type=int, default=4_000_000)
    ap.add_argument("--tiles", type=int, default=2040)
    ap.add_argument("--pixels-per-tile", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=256)
    # round-1 measurements (ms); see RESULTS.md / ARCHITECTURE.md
    ap.add_argument("--prep-sort-ms", type=float, default=15.6)
    ap.add_argument("--expand-ms", type=float, default=27.0)
    ap.add_argument("--record-sort-ms", type=float, default=31.0)
    ap.add_argument("--composite-ms", type=float, default=120.0)
    ap.add_argument("--fwd-ms", type=float, default=146.8)
    ap.add_argument("--fwdbwd-ms", type=float, default=481.0)
    a = ap.parse_args()

    n, c, cap, t, p = a.splats, a.records, a.capacity, a.tiles, a.pixels_per_tile
    c_al = cap + t * a.chunk
    pairs = c * p                       # record-pixel interactions
    rows = []

    def stage(name, ms, bytes_, flops, bound):
        t_bw = bytes_ / HBM * 1e3
        t_fl = flops / (VPU if bound == "VPU" else MXU_F32) * 1e3
        sol = max(t_bw, t_fl)
        rows.append((name, ms, bytes_, flops, bound, sol,
                     sol / ms * 100 if ms else 0.0))

    # preprocess + splat sort: ~30 elementwise rounds over N + bitonic sort
    # moving 14 payload columns ~log^2(N)/2 half-passes
    stage("preprocess+splat-sort", a.prep_sort_ms,
          n * 4 * (14 * 2 + 10), n * 250, "VPU")
    # expand: table DMA per block + one-hot matmul 16xIBxOB per OB records
    stage("expand (Pallas)", a.expand_ms,
          cap * (16 * 4 + 16 * 4 * 768 // 512), cap * 768 * 16 * 2, "MXU")
    # record sort: 10 columns through ~log^2 passes (XLA internal traffic
    # dominates; model 20 round trips of 40B rows)
    stage("record-sort+align", a.record_sort_ms + 10,
          cap * 40 * 20, cap * 100, "VPU")
    # composite fwd: stream aligned records once + ~40 VPU ops per pair
    stage("composite fwd (Pallas)", a.composite_ms,
          c_al * 64 + t * p * 16, pairs * 40, "VPU")
    stage("TOTAL fwd", a.fwd_ms, 0, 0, "-")
    # backward: composite bwd ~70 ops/pair + re-sorts + segsum
    stage("TOTAL fwd+bwd", a.fwdbwd_ms, 0, 0, "-")

    print(f"scene: {n:,} splats, {c:,} records (cap {cap:,}), {t} tiles x {p}px")
    print(f"{'stage':26} {'ms':>8} {'bytes':>10} {'flops':>10} "
          f"{'bound':>5} {'SoL ms':>8} {'% SoL':>6}")
    for name, ms, b, f, bound, sol, pct in rows:
        if bound == "-":
            print(f"{name:26} {ms:8.1f} {'':>10} {'':>10} {'':>5} {'':>8} {'':>6}")
        else:
            print(f"{name:26} {ms:8.1f} {fmt(b) + 'B':>10} {fmt(f) + 'F':>10} "
                  f"{bound:>5} {sol:8.2f} {pct:5.0f}%")
    comp = next(r for r in rows if r[0].startswith("composite"))
    print(f"\ncomposite fwd achieves ~{comp[3] / (comp[1] / 1e3) / 1e12:.2f} "
          f"TFLOP/s effective VPU ({comp[6]:.0f}% of the ~{VPU/1e12:.1f} "
          f"TFLOP/s f32 VPU roofline).")
    print(json.dumps({"composite_pct_of_roofline": round(comp[6], 1)}))


if __name__ == "__main__":
    main()
