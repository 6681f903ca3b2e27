#!/usr/bin/env python3
"""Compose SCALING.md from two Verify timing sidecars.

Usage: scaling_report.py <timings_sf0.01.json> <timings_sf0.1.json> [out.md]
           [--third <timings_sf1.json>]

--third adds the r16 THIRD measured point (a session-local ~10x-of-sf0.1
corpus from tools/gen_scale.py, timed for the most expensive keys): two
points define a line, three expose a curve — a key whose second ratio
step grows materially faster than its first is flagged for a plan read
even if both steps individually pass the 15x alarm.

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


# Curvature annotations for third-point keys whose second step was
# plan-read (fixed-knob effects the key's doc already names, not defects).
CURVE_NOTES = {
    "join_range_banded": (
        "OUTPUT-BOUND, the r15 finding extended one decade: the matched "
        "pair set measures 145,604,988 at sf0.1 and 14,560,498,800 at "
        "sf~1 (DuckDB count of the identical join) — exactly 100x pairs "
        "for 10x data, quadratic by the query's own semantics (every "
        "event x every user value-interval containing its value; both "
        "factors grow 10x). Wall grew 89x for 100x pairs, so the banded "
        "equi-join plan's per-pair efficiency IMPROVED again at the "
        "third point. At 100 TB the knob remains interval selectivity / "
        "band width, not plan shape."),
    "jx_knn_centrality": (
        "FIXED-KNOB effect, not a plan defect: the key pins nlist=16 for "
        "its oracle, so at 10x vectors each IVF list is 10x longer and "
        "the kNN-graph candidate self-join (sum over lists of "
        "(p*|list|)^2) does ~100x work — the exact term the X3m row "
        "documents as bounded by nlist growing with n. Measured on this "
        "corpus (20k vectors): knnGraphOf at the frozen nlist=16 = "
        "168.7 s; at the scale-path nlist=160 (nlist proportional to n) "
        "= 52.4 s for the SAME 60,000 edges — 3.2x back, and the "
        "remaining growth is the linear scoring term. The 138 s key "
        "time also includes the one-per-session store build (quantizer "
        "+ graph + CC + centrality chain) that every other knn_* key "
        "then probes for free."),
    "mm_semantic_dedup": (
        "The SAME fixed-nlist term as jx_knn_centrality, in SemDeDup "
        "form: the key pins nlist=16, so at 10x payload vectors each "
        "cluster is 10x larger and the within-cluster pair scan "
        "(sum of c_i^2) does ~100x work. The X5k/X3h rows document the "
        "published mitigation — nlist proportional to n keeps cluster "
        "sizes bounded (the SemDeDup recipe's k ~ n) — and "
        "semanticDedupOfDocs/semanticDedupOf take nlist as a knob for "
        "exactly that; the driver key freezes it only so the DuckDB "
        "oracle replays a fixed chain. r17: the mitigation is now a GATED "
        "census key (sim_nlist_tuning) — at this corpus the within-list "
        "pair-work term sum(|list|^2) measures 25,018,008 at nlist=16 vs "
        "2,518,348 at nlist=160, the 10x cut the narrative claimed."),
    "join_range_tuning": (
        "r17 census over join_range_banded's knob — it MEASURES the "
        "output-bound term, so it inherits the quadratic: the dominant "
        "cost is the single width-25 matched COUNT (the same 14.56B-pair "
        "set as join_range_banded, counted not materialized: 154.7 s vs "
        "627.9 s). The census's own per-width arithmetic is band-count "
        "products over KB-scale frames (n_index_rows <= 722k rows at "
        "sf~1). Its third-point readout is the payoff: precision_pm "
        "970-984 at EVERY width — 97%+ of candidates are true matches, "
        "so the only live knob is index replication (48.1 rows/interval "
        "at width 5 vs 1.0 at width 400), exactly the r16 plan-read's "
        "conclusion, now measured."),
    "dedup_forget_pairs": (
        "COLD-STORE attribution, not a plan defect: this 7-key third-point "
        "run builds the shared minhash_pairs base store (shingle -> band "
        "join -> verify over 50k docs) inside this key's wall time — in "
        "a full sweep dedup_minhash pays that build and every later key "
        "probes it. The forget delta itself is broadcast anti-joins + "
        "affected-component CC over the KB-scale pair store. step1 = 1.1 "
        "is a sub-second floor, so any real build work reads as a big "
        "step2."),
    "text_forget_dict": (
        "COLD-STORE attribution: builds the ST24 base dictionary store "
        "(three dfPartialsOf tokenize passes over 50k docs, incl. the "
        "redelivery case) plus the affected-batch re-process — all "
        "linear in corpus size; in a full sweep stream_df_store pays the "
        "base build. Sub-second floors at both small SFs make step2 look "
        "steep."),
    "sim_forget_ivf": (
        "COLD-STORE attribution: trains quantizer_16 (three broadcast "
        "scoring passes over 20k vectors) inside this key's wall — "
        "amortized across the whole sim_* family in a full sweep. The "
        "forget itself is one broadcast anti-join on the assignment "
        "table. Linear at fixed nlist."),
}


# r17: the two scale-knob censuses READ OUT at the third point (values
# from the gated keys' own parquet outputs on /tmp/graft_sf1; the same
# keys are DuckDB-hash-gated at sf0.01). These turn the two standing
# narratives (nlist-proportional-to-n; band width is the only live range
# knob) into measured tables.
CENSUS_APPENDIX = """
### Scaled-knob census readouts at the third point (r17)

`sim_nlist_tuning` at sf~1 (20,000 vectors) — the within-list pair-work
term Σ|list|² that every within-list operator (SemDeDup / kNN graph /
decon) pays, per quantizer size:

| nlist | max list | Σ\\|list\\|² | /n² (pm) |
|---|---|---|---|
| 16 | 1,317 | 25,018,008 | 62 |
| 64 | 350 | 6,266,758 | 15 |
| 160 | 166 | 2,518,348 | 6 |

Σ|list|² ≈ n²/nlist at every corpus size measured (pair_work_pm is
scale-invariant per knob: 63/17/7 at 500 vectors, 62/15/6 at 20k), so
keeping the term LINEAR in n requires nlist ∝ n — the mitigation the
steepener notes cite, now a measured law of this quantizer rather than
a narrative. The 10× knob (16→160) cuts the term 9.9×.

`join_range_tuning` at sf~1 (1M events × 15k intervals):

| width | index rows | candidates | matched | repl/interval | precision (pm) |
|---|---|---|---|---|---|
| 5 | 721,920 | 14,789,945,100 | 14,560,498,800 | 48.1 | 984 |
| 25 | 150,660 | 14,831,261,400 | 14,560,498,800 | 10.0 | 981 |
| 100 | 42,950 | 14,898,822,000 | 14,560,498,800 | 2.9 | 977 |
| 400 | 15,290 | 14,995,587,000 | 14,560,498,800 | 1.0 | 970 |

The matched count is width-invariant (TuningSpec pins it) and ≥ 97% of
candidates are TRUE matches at every width on this data: the join is
output-bound by its own semantics, and the only live knob is index
replication — width 400 indexes each interval ~once. At 100 TB pick the
width near the median interval so replication stays O(1) per interval;
precision_pm tells you when narrowing bands stops buying anything.
"""


def main() -> None:
    args = list(sys.argv[1:])
    third = None
    if "--third" in args:
        i = args.index("--third")
        third = json.load(open(args[i + 1]))
        del args[i:i + 2]
    small = json.load(open(args[0]))
    big = json.load(open(args[1]))
    out = args[2] if len(args) > 2 else "SCALING.md"
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
        if third:
            tkeys = [k for k in third if k in big and k in small]
            trows = sorted(
                ((k, small[k], big[k], third[k],
                  big[k] / max(small[k], 1e-9),
                  third[k] / max(big[k], 1e-9)) for k in tkeys),
                key=lambda r: -r[5])
            steep = [r for r in trows
                     if r[5] > 1.5 * r[4] and r[3] >= 5.0 and r[5] > FLAG_RATIO]
            f.write("\n## Third point: sf0.1 → sf~1 (10× again; "
                    "session-local corpus from tools/gen_scale.py — "
                    "copies caesar-shifted/rotated so they do NOT near-dup "
                    "collide; 10× users, not 10× history per user)\n\n")
            f.write("Timed for the most expensive keys only (timing, no "
                    "oracle). `step1` = sf0.1/sf0.01, `step2` = sf~1/sf0.1; "
                    "a steepening curve (step2 ≫ step1) is the super-linear "
                    "signal two points cannot see.\n\n")
            f.write("| key | sf0.01 s | sf0.1 s | sf~1 s | step1 | step2 |\n")
            f.write("|---|---|---|---|---|---|\n")
            for k, s, b, t, r1, r2 in trows:
                f.write("| %s | %.2f | %.2f | %.2f | %.1f | %.1f |\n"
                        % (k, s, b, t, r1, r2))
            f.write("\n### Steepening keys (step2 > 1.5×step1, > %.0f×, "
                    "sf~1 ≥ 5 s — plan read required)\n\n" % FLAG_RATIO)
            if steep:
                for k, s, b, t, r1, r2 in steep:
                    note = CURVE_NOTES.get(k, "UNREAD: plan read pending.")
                    f.write("**%s** (%.1f× → %.1f×) — %s\n\n" % (k, r1, r2, note))
            else:
                f.write("*(none)*\n")
            f.write(CENSUS_APPENDIX)
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
