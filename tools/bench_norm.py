#!/usr/bin/env python3
"""Calibration-normalized bench adjudication (VERDICT r15 item 5).

Usage: python3 tools/bench_norm.py OLD_BENCH_FULL.json NEW_BENCH_FULL.json

Reads two bench artifacts (the one-line JSON graft.Bench writes), divides
each query's median by its regime's calibration probe — `calibration`
(scan → hash → shuffle → agg) for scan/agg-class queries,
`calibration_ckpt` (localCheckpoint write + re-read) for the
checkpoint-heavy class — and prints the normalized new/old ratio table
plus per-class geomeans. This turns the cross-round "is it code drift or
host regime?" question into arithmetic: a host-regime shift moves the
calibration and the queries together (normalized ratio ~1.0), code drift
moves only the queries.

The class map is an adjudication LENS, not ground truth: the
checkpoint class mirrors the r15 analysis of which queries swing with
block-manager disk I/O (stateful streams, iterative graph closures,
beam walks). A query in the wrong class shows up as a consistent bias,
not a wrong answer — both raw and normalized ratios are printed.
"""
import json
import math
import sys


def ckpt_class(name: str) -> bool:
    # the localCheckpoint-heavy family (r15 bench analysis): all
    # streaming queries, all iterative graph queries, the graph-beam ANN
    # family, and the checkpoint-looped dedup sweeps
    if name.startswith("x") or name.startswith("g"):
        return True
    if name in {"s31_ann_graph_beam", "s32_ann_beam_planes6",
                "s33_beam_recall", "s36_ann_beam_autoplanes",
                "s39_ann_beam_filtered", "s35_mmr_rerank",
                "d11_neardup_clusters", "d15_neardup_corpus",
                "d19_banding_sweep", "d27_cluster_purity",
                "d33_cluster_split", "d36_cluster_cohesion"}:
        return True
    return False


def load(path):
    # accept both artifact shapes: the whole file as (pretty-printed)
    # JSON — the driver's BENCH_rNN.json — or graft.Bench's one-line
    # object followed by log noise; fail with the offending path, not a
    # bare traceback (ADVICE r16)
    try:
        with open(path) as f:
            text = f.read()
        try:
            d = json.loads(text)
        except json.JSONDecodeError:
            d = json.loads(text.strip().splitlines()[0])
    except (OSError, json.JSONDecodeError, IndexError) as e:
        sys.exit(f"bench_norm: cannot read a bench JSON object from {path}: {e}")
    if "queries" not in d:
        sys.exit(f"bench_norm: {path} has no 'queries' key — "
                 "not a graft.Bench artifact")
    return d


def geomean(xs):
    xs = [x for x in xs if x > 0]
    if not xs:
        return float("nan")
    return math.exp(sum(math.log(x) for x in xs) / len(xs))


def main():
    if len(sys.argv) != 3:
        sys.exit("usage: python3 tools/bench_norm.py "
                 "OLD_BENCH_FULL.json NEW_BENCH_FULL.json")
    old, new = load(sys.argv[1]), load(sys.argv[2])
    co, cn = old.get("calibration", -1.0), new.get("calibration", -1.0)
    ko = old.get("calibration_ckpt", -1.0)
    kn = new.get("calibration_ckpt", -1.0)
    print(f"calibration      old={co:.3f}s new={cn:.3f}s "
          f"(host scan-regime ratio {cn / co:.3f})" if co > 0 and cn > 0
          else f"calibration      old={co} new={cn} (UNUSABLE — see stderr of the bench run)")
    print(f"calibration_ckpt old={ko:.3f}s new={kn:.3f}s "
          f"(host ckpt-regime ratio {kn / ko:.3f})" if ko > 0 and kn > 0
          else f"calibration_ckpt old={ko} new={kn} (UNUSABLE)")
    rows = []
    for q, tn in new["queries"].items():
        to = old["queries"].get(q)
        if to is None or to <= 0 or tn <= 0:
            continue
        is_ck = ckpt_class(q)
        raw = tn / to
        if is_ck and ko > 0 and kn > 0:
            norm = (tn / kn) / (to / ko)
        elif not is_ck and co > 0 and cn > 0:
            norm = (tn / cn) / (to / co)
        else:
            norm = float("nan")
        rows.append((q, "ckpt" if is_ck else "scan", to, tn, raw, norm))
    for cls in ("scan", "ckpt"):
        sub = [r for r in rows if r[1] == cls]
        print(f"{cls}-class: n={len(sub)} raw geomean="
              f"{geomean([r[4] for r in sub]):.3f} "
              f"normalized geomean={geomean([r[5] for r in sub]):.3f}")
    print(f"all: n={len(rows)} raw geomean={geomean([r[4] for r in rows]):.3f} "
          f"normalized geomean={geomean([r[5] for r in rows]):.3f}")
    new_only = sorted(set(new["queries"]) - set(old["queries"]))
    if new_only:
        tot = sum(new["queries"][q] for q in new_only if new["queries"][q] > 0)
        print(f"new queries (excluded from geomeans): {len(new_only)} "
              f"adding {tot:.1f}s: {', '.join(new_only)}")
    print("top normalized regressions:")
    for q, cls, to, tn, raw, norm in sorted(
            rows, key=lambda r: -(r[5] if r[5] == r[5] else 0))[:10]:
        print(f"  {q:32s} {cls} {to:7.2f}s -> {tn:7.2f}s "
              f"raw {raw:5.2f}x norm {norm:5.2f}x")


if __name__ == "__main__":
    main()
