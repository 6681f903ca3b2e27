#!/usr/bin/env python3
"""Compose SCALING.md from two Verify timing sidecars.

Usage: scaling_report.py <timings_sf0.01.json> <timings_sf0.1.json> [out.md]

Verify.scala writes per-key wall seconds to <outDir>/timings.json on every
sweep; two sweeps at 10x-different SFs give a measured per-key scale curve
time(sf0.1)/time(sf0.01). Keys whose ratio exceeds FLAG_RATIO (10x data +
overhead headroom) are flagged for a plan read — the empirical alarm for a
silently super-linear plan that passes every correctness gate.

Ratio caveat the report carries: sub-second denominators are dominated by
fixed per-key overhead (job scheduling, parquet commit, store-build
amortization), so the ratio floor FLOOR_NUM only flags keys whose sf0.1
time is also material; fast keys with big ratios are listed separately as
overhead-dominated.
"""
import json
import sys

FLAG_RATIO = 15.0
FLOOR_NUM = 2.0  # sf0.1 seconds below this = overhead-dominated, not a plan signal

# Root-cause annotations for flagged keys that were plan-read and found
# output-bound (the measured work product grows super-linearly in SF by
# the query's own semantics, on both engines) rather than plan-defective.
FLAG_NOTES = {
    "join_range_banded": (
        "OUTPUT-BOUND, not a plan defect: the matched pair set (every event x "
        "every user-interval containing its value) measures 1,457,721 pairs at "
        "sf0.01 vs 145,604,988 at sf0.1 — 99.9x pairs for 10x data, quadratic "
        "by construction (10x events x 10x user intervals; DuckDB does the "
        "same work). Wall time grew only 17.7x, i.e. the banded equi-join "
        "plan is ~5.6x MORE efficient per pair at the larger SF. At 100 TB "
        "the knob is the band width / interval selectivity, not the plan "
        "shape (bounded band populations, equi-join, residual filter)."),
}


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    out = sys.argv[3] if len(sys.argv) > 3 else "SCALING.md"
    keys = [k for k in big if k in small]
    rows = sorted(
        ((k, small[k], big[k], big[k] / max(small[k], 1e-9)) for k in keys),
        key=lambda r: -r[3])
    flagged = [r for r in rows if r[3] > FLAG_RATIO and r[2] >= FLOOR_NUM]
    noisy = [r for r in rows if r[3] > FLAG_RATIO and r[2] < FLOOR_NUM]
    tot_s = sum(small.values())
    tot_b = sum(big.values())
    with open(out, "w") as f:
        f.write("# SCALING — measured per-key scale curve\n\n")
        f.write(
            "Per-key wall seconds from two full `graft.Verify` sweeps "
            "(timings.json sidecars), sf0.01 vs sf0.1 — **10× the data**. "
            "Ratio = time(sf0.1)/time(sf0.01). A plan that scales linearly "
            "in data should sit well under %.0f× (10× data + constant "
            "overhead); anything above is flagged for a plan read.\n\n" % FLAG_RATIO)
        f.write("Aggregate: %.1f s → %.1f s over %d shared keys "
                "(**%.2f× total for 10× data**).\n\n" % (tot_s, tot_b, len(keys), tot_b / tot_s))
        f.write("## Flagged (ratio > %.0f and sf0.1 ≥ %.0f s — plan read required)\n\n"
                % (FLAG_RATIO, FLOOR_NUM))
        if flagged:
            f.write("| key | sf0.01 s | sf0.1 s | ratio |\n|---|---|---|---|\n")
            for k, s, b, r in flagged:
                f.write("| %s | %.2f | %.2f | %.1f |\n" % (k, s, b, r))
            for k, s, b, r in flagged:
                if k in FLAG_NOTES:
                    f.write("\n**%s** — %s\n" % (k, FLAG_NOTES[k]))
                else:
                    f.write("\n**%s** — UNREAD: plan read pending.\n" % k)
        else:
            f.write("*(none)*\n")
        f.write("\n## Ratio > %.0f but sf0.1 < %.0f s (overhead-dominated "
                "denominator, not a plan signal)\n\n" % (FLAG_RATIO, FLOOR_NUM))
        if noisy:
            f.write("| key | sf0.01 s | sf0.1 s | ratio |\n|---|---|---|---|\n")
            for k, s, b, r in noisy:
                f.write("| %s | %.2f | %.2f | %.1f |\n" % (k, s, b, r))
        else:
            f.write("*(none)*\n")
        f.write("\n## Full curve (sorted by ratio, descending)\n\n")
        f.write("| key | sf0.01 s | sf0.1 s | ratio |\n|---|---|---|---|\n")
        for k, s, b, r in rows:
            f.write("| %s | %.2f | %.2f | %.1f |\n" % (k, s, b, r))
    print("wrote %s: %d keys, %d flagged, %d overhead-dominated"
          % (out, len(keys), len(flagged), len(noisy)))
    for k, s, b, r in flagged:
        print("FLAG %s %.2f -> %.2f (%.1fx)" % (k, s, b, r))


if __name__ == "__main__":
    main()
