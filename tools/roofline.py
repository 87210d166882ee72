"""Per-stage speed-of-light roofline for the b128 pipeline (VERDICT r4
item 1): analytic HBM bytes and essential-op counts per scan, computed
from the kernels' actual shapes/block parameters, against v5e peaks.

Peaks assumed (public numbers; the scaling-book v5e row):
  HBM   819 GB/s
  MXU   197 Tbf16FLOP/s  = 98.5e12 bf16 MAC/s;  int8 2x = 197e12 MAC/s
  VPU   8 sublanes x 128 lanes x 4 ALUs x 0.94 GHz ~= 3.85e12 elem-ops/s

Compute roofs printed where they apply:
  * alu — essential element-ops at the VPU peak (the "if every op were a
    dense ALU op" floor);
  * permute — cross-lane data movement (sort exchanges, scan rolls,
    transposes) through the VPU crossbar at ~1 vreg (8x128x4B) per cycle
    = 3.85 TB/s of lane-shuffle traffic.  Permutes are NOT ALU ops and
    bind the sort/scan kernels;
  * mxu — one-hot matmul MACs at the bf16/i8 MXU peaks.

"achievable" columns, where present, are MEASURED floors from probe
kernels running exactly the stage's op mix on VMEM-resident data
(tools/probe_sortkernel.py for the sort network; tools/
probe_stagefloor.py for the rank cube / star rolls / window compares) —
Mosaic codegen reality, typically 2-4x above the paper floors.

Measured us/scan comes from the xplane device trace (tools/
trace_pipeline.py) — default numbers are the round-4 step-26/32 trace at
b128; pass --trace-json to refresh from a new trace dump.

The binding roof per stage is max(HBM, compute); pct_of_light =
binding_roof / measured.  This table is the quantitative backing for
PERF.md's per-stage "intrinsic cost" claims.
"""

from __future__ import annotations

import argparse
import json

# ---- machine peaks (v5e) ----
HBM_BPS = 819e9
MXU_BF16_MACS = 98.5e12
MXU_I8_MACS = 197e12
VPU_OPS = 3.85e12
# VPU crossbar: ~1 vreg (8 x 128 x 4 B) per cycle at 0.94 GHz of cross-
# lane shuffle traffic.  Probe reality (tools/probe_sortkernel.py): a
# 4-operand compare-exchange stage over 131k elements measures ~1.4 us
# vs the ~0.55 us this model gives — Mosaic achieves ~40% of the
# crossbar on sort-shaped shuffles.
PERMUTE_BPS = 3.85e12

# ---- pipeline dims (bench.py production config) ----
B = 128
N = 131072
R = 64  # rings
P = 2048  # ring capacity
G_RANK = 128  # rank one-hot lane width (R+1 -> 128 pad)
G_STAR = 384  # star beams padded (361 -> 3 lane rows)
BLK_W = 1024  # flood/marker slot block
WIN = 128  # flood/marker start/bin window (sublane tile)
PLACE_CHUNK = 2048
PLACE_COL_W = 128
GATHER_CHUNK = 8192

MB = 1e6


def stage(name, measured_us, hbm_bytes, computes, note, achievable_us=None):
    """computes: list of (kind, quantity, note); kind one of bf16_mac /
    i8_mac / vpu (elem-ops) / permute (BYTES shuffled cross-lane).
    achievable_us: probe-measured floor for the stage's exact op mix."""
    hbm_us = hbm_bytes / HBM_BPS * 1e6
    comp_us = []
    for kind, q, n in computes:
        rate = {"bf16_mac": MXU_BF16_MACS, "i8_mac": MXU_I8_MACS,
                "vpu": VPU_OPS, "permute": PERMUTE_BPS}[kind]
        comp_us.append((kind, q / rate * 1e6, n))
    binding = max([hbm_us] + [u for _, u, _ in comp_us])
    return {
        "stage": name, "measured_us": measured_us,
        "hbm_mb": hbm_bytes / MB, "hbm_us": hbm_us,
        "compute_us": comp_us, "roof_us": binding,
        "pct_of_light": 100.0 * binding / measured_us,
        "achievable_us": achievable_us,
        "pct_of_achievable": (100.0 * achievable_us / measured_us
                              if achievable_us else None),
        "note": note,
    }


def build_table(measured):
    m = measured
    f32 = 4
    rows = []

    # 1. star sort: lax.sort, 4 operands (fk i32, r f32, z f32, iota),
    # n = 131072 -> 153-stage bitonic network (98 lane + 55 sublane XOR
    # stages), each stage = 1 two-key compare + 4 operand exchanges
    # (cross-lane permutes).  tools/probe_sortkernel.py measured the
    # steady-state network at ~224 us/scan — the achievable light.
    rows.append(stage(
        "star sort (lax.sort)", m["star_sort"],
        8 * N * f32,
        [("vpu", 153 * N * 7, "153 stages x n x ~7 ops"),
         ("permute", 153 * 4 * N * f32, "153 stages x 4 operands "
          "exchanged cross-lane")],
        "permute-bound 16x above its HBM floor by design; CLOSED: "
        "operand/packing/stability variants all equal or worse; the probe "
        "network is within 5% of the in-pipeline fusion",
        achievable_us=224.0))  # tools/probe_sortkernel.py, r4

    # 2. place (tensorize, byte-limb s8 MXU): A = (13*G, C) s8 per chunk
    # (12 byte rows x y z + occupancy), pos one-hot (col_w, C); MACs =
    # 13*R_pad(64) * C * col_w per active (panel, chunk) pair; firing-order
    # chunks touch ~1.2 panels.  A-build: 12 (G, C) i32 mul + convert +
    # concat copies per chunk (VPU).
    chunks = N // PLACE_CHUNK
    place_macs = 13 * 64 * PLACE_CHUNK * PLACE_COL_W * chunks * 1.2
    place_abuild = (12 * 2 + 13) * 64 * PLACE_CHUNK * chunks
    rows.append(stage(
        "place (tensorize s8 MXU)", m["place"],
        (5 * N + 3 * R * P) * f32,
        [("i8_mac", place_macs, "13G x C x col_w x ~1.2 panels/chunk"),
         ("vpu", place_abuild, "A-tile build: 12 (G,C) i32 mul+cvt")],
        "MXU one-hot MAC volume is intrinsic at col_w=128 (the lane "
        "minimum): any factorization costs rows x N x col_w; M-stacking "
        "keeps the MXU M-dim full.  probe_stagefloor place_mix: one "
        "A-build + 1-panel dot = 0.75-1.72 us/chunk across clean runs "
        "(tunnel spread); x64 chunks x1.2 panels -> 58-132 us/scan floor; "
        "the residue vs in-pipeline is act-gating + out accumulate + "
        "per-step cost",
        achievable_us=132.0))  # upper estimate of the probe spread, r5

    # 3. flood labeled + marker pass 1 (fused): per (ring, 1024-slot
    # block): 2 sweep directions x ~2 active 128-start windows x
    # (WIN x blk_w) x ~6 ops + ~1.2 active marker bin windows x
    # (WIN x blk_w) x ~8 ops.
    n_blocks = R * (P // BLK_W)
    lab_ops = n_blocks * (4 * WIN * BLK_W * 6 + 1.2 * WIN * BLK_W * 8)
    rows.append(stage(
        "flood labeled+markerf", m["labeled_markerf"],
        (3 * R * P) * f32 + 384 * 128 * f32,
        [("vpu", lab_ops, "128 blocks x (4 sweep-wins x6 + 1.2 bin-wins "
          "x8) x (128x1024)")],
        "window-compare volume is the design's intrinsic cost; interval-"
        "query reformulations need per-slot lane gathers (measured dead-"
        "end class); sub-block windowing regressed (r3).  probe_stagefloor "
        "window_cmp: 0.311 us per active (128, 1024) window (~= the VPU "
        "paper peak); measured/0.311 = ~610 implied active windows vs the "
        "~666 modeled -> AT the window floor",
        achievable_us=0.311 * 666))

    # 4. star scan: 5 segmented prefix scans over (rows=32, 128) blocks,
    # 7 roll rounds each + 7 absorb-mask rounds + ~30 elementwise ops per
    # element + windowed hit accumulation.
    scan_rounds = 7 * (1 + 5)  # absorb flags + 5 scanned values
    star_scan_ops = N * (30 + scan_rounds * 3)
    rows.append(stage(
        "star scan (walk)", m["star_scan"],
        4 * N * f32,
        [("vpu", star_scan_ops, "42 roll rounds x3 + ~30 elem ops / pt"),
         ("permute", scan_rounds * N * f32, "42 cross-lane roll rounds")],
        "log-depth segmented scans are permute/latency-bound (serial "
        "carry chain over 32 row-blocks); rows swept (32 optimum, r4).  "
        "probe_stagefloor: the 42 roll rounds measure 8-37 us/scan "
        "(spread) — a SMALL slice of the stage; a serial VMEM-resident "
        "reimplementation of the FULL body costs 546 us/scan (2.9x "
        "WORSE), so the paper roof is unreachable for a serial-carry "
        "kernel; blocks-per-step fold swept r5: NEUTRAL (93.8-97.2 "
        "ms/step across bps 1/2/4/8 — per-step cost already amortized)"))

    # 5. rank: per 8192-pt block: LT (128,128) @ one-hot (128, 64*128)
    # bf16 MACs + (128, 64, 128) one-hot build/select cubes.
    blocks = N // (64 * 128)
    rank_macs = 128 * 128 * 64 * 128 * blocks
    rank_cube = N * G_RANK * 4  # build + select + count + base add
    rows.append(stage(
        "rank (group positions)", m["rank"],
        2 * N * f32,
        [("bf16_mac", rank_macs, "LT matmul prefix per 8k block"),
         ("vpu", rank_cube, "one-hot cubes: N x 128 lanes x ~4")],
        "cube-bound at the minimal g_pad=128 lane width (65 groups); "
        "rows/blocks_per_step swept r4; lane-gather + i8 forms are "
        "measured dead ends.  probe_stagefloor rank_cube (4 consistent "
        "runs, 8.1-8.5 us/block): the exact block op-mix on VMEM-resident "
        "data floors at 130-135 us/scan -> the stage runs at ~90% of "
        "Mosaic reality; CLOSED",
        achievable_us=135.3))

    # 6. marker candidate pass (pass 2): per (ring, 1024-slot block) x
    # ~1.2 active bin windows x (WIN x blk_w) x ~10 ops (5 payload mins).
    cand_ops = n_blocks * 1.2 * WIN * BLK_W * 10
    rows.append(stage(
        "marker candidates", m["marker_cand"],
        5 * R * P * f32,
        [("vpu", cand_ops, "128 blocks x 1.2 bin-wins x (128x1024) x10")],
        "same window-compare wall as the flood kernels"))

    # 7. flood blocked: 2 sweeps x ~2 active windows x (WIN x blk_w) x 4.
    blocked_ops = n_blocks * 4 * WIN * BLK_W * 4
    rows.append(stage(
        "flood blocked", m["blocked"],
        2 * R * P * f32 + R * 8 * 384 * f32,
        [("vpu", blocked_ops, "128 blocks x 4 sweep-wins x (128x1024) x4")],
        "same wall; whole-ring folding landed r4 (step 24)"))

    # 8. gather (labels back to points): per 8192-pt chunk: ~1.2 active
    # 128-row table panels x (128, C) one-hot MXU contraction + final
    # (g_pad, C) ring-select reduce.
    g_chunks = N // GATHER_CHUNK
    gather_macs = 128 * GATHER_CHUNK * 128 * 1.2 * g_chunks
    gather_sel = N * G_RANK * 3
    rows.append(stage(
        "gather (table->points)", m["gather"],
        (2 * N + R * P + N) * f32,
        [("bf16_mac", gather_macs, "panel one-hot contraction"),
         ("vpu", gather_sel, "ring-select reduce N x 128 x3")],
        "element-gather measured 2x WORSE than scatter on XLA (r1); this "
        "is the matmul reformulation of the open placement-class problem"))

    # 9. ring discovery (VMEM-resident greedy): 64 iterations x N x ~4
    # ops (|alpha-a| cmp + mask update + argmax tree).
    rows.append(stage(
        "ring discovery", m["discovery"],
        N * f32,
        [("vpu", 64 * N * 4, "64 greedy iterations x N x ~4")],
        "HBM touched once (r4 step 31); the 64 x N compare volume is the "
        "reference's own greedy semantics"))

    # 10. ingest prep+assign kernels: roi mask + star keys one pass
    # (~20 ops/pt), ring assign vs 128-lane table (~128 x 3 ops/pt).
    rows.append(stage(
        "ingest kernels", m["ingest"],
        (4 * N + N + 2 * N + N) * f32,
        [("vpu", N * 20 + N * 128 * 3, "prep ~20/pt + assign 128-lane "
          "table x3")],
        "fused r4 (steps 29-32); transcendentals stay XLA (no Mosaic "
        "atan2/asin)"))

    return rows


# Round-4 step-26/32 xplane trace, ms/step at b128 -> us/scan.
DEFAULT_MEASURED = {
    "star_sort": 29.9e3 / B,
    "place": 24.9e3 / B,
    "labeled_markerf": 24.3e3 / B,
    "star_scan": 23.9e3 / B,
    "rank": 19.1e3 / B,
    "marker_cand": 16.5e3 / B,
    "blocked": 9.9e3 / B,
    "gather": 9.1e3 / B,
    "discovery": 3.46e3 / B,
    "ingest": 3.6e3 / B,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trace-json", default=None,
                    help="JSON {stage: ms_per_step} to override the "
                         "round-4 trace numbers")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    measured = dict(DEFAULT_MEASURED)
    if args.trace_json:
        with open(args.trace_json) as f:
            for k, v in json.load(f).items():
                measured[k] = v * 1e3 / B

    rows = build_table(measured)
    if args.json:
        print(json.dumps(rows, indent=1))
        return

    print("| stage | meas us/scan | HBM MB (us) | compute roof us | "
          "binding roof us | % of light | achievable us (probe) | % of "
          "achievable |")
    print("|---|---|---|---|---|---|---|---|")
    tot_m = tot_r = 0.0
    for r in rows:
        comp = "; ".join(f"{k} {u:.1f}" for k, u, _ in r["compute_us"])
        ach = (f"{r['achievable_us']:.0f}" if r["achievable_us"] else "—")
        pa = (f"{r['pct_of_achievable']:.0f}%"
              if r["pct_of_achievable"] else "—")
        print(f"| {r['stage']} | {r['measured_us']:.1f} | "
              f"{r['hbm_mb']:.2f} ({r['hbm_us']:.1f}) | {comp} | "
              f"{r['roof_us']:.1f} | {r['pct_of_light']:.0f}% | {ach} | "
              f"{pa} |")
        tot_m += r["measured_us"]
        tot_r += r["roof_us"]
    print(f"| TOTAL (top stages) | {tot_m:.1f} | | | {tot_r:.1f} | "
          f"{100 * tot_r / tot_m:.0f}% | | |")
    print()
    for r in rows:
        print(f"- {r['stage']}: {r['note']}")


if __name__ == "__main__":
    main()
