#!/usr/bin/env python3
"""Recompute bench headline estimators from a BENCH sidecar (round-13
verdict #10): the gate tooling can adjudicate a noisy window from the
per-pass matrices alone, without builder narrative.

Usage: python3 tools/bench_headline.py [sidecar.json]   (default BENCH_FULL.json)

Reads the sidecar's full per-pass per-query matrices (passes_kept /
passes_dropped, written by graft.Bench since round 14) and recomputes:
  - kept-window estimator: sum of per-query medians over kept passes
  - all-passes estimator: sum of per-query medians over every measured
    pass (kept + dropped) — the robust choice under sustained host noise
  - spread over kept passes, and the canary-normalized per-query rate
    when the sidecar carries canary fields

Exits 0 always (it is a reader, not a gate); prints one JSON line.
"""
import json
import statistics
import sys


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_FULL.json"
    with open(path) as fh:
        art = json.load(fh)
    kept = art.get("passes_kept")
    dropped = art.get("passes_dropped", [])
    if not kept:
        print(json.dumps({"error": f"{path} has no passes_kept matrix "
                          "(pre-round-14 sidecar)"}))
        return
    names = sorted(kept[0])
    every = kept + dropped

    def med_sum(passes):
        return sum(statistics.median(p[n] for p in passes) for n in names)

    value_kept = med_sum(kept)
    value_all = med_sum(every)
    totals = [sum(p.values()) for p in kept]
    spread_pct = ((max(totals) - min(totals)) / value_kept * 100
                  if len(totals) > 1 and value_kept else 0.0)
    out = {
        "sidecar": path,
        "n_queries": len(names),
        "n_passes_kept": len(kept),
        "n_passes_dropped": len(dropped),
        "value_kept_passes": round(value_kept, 3),
        "value_all_passes": round(value_all, 3),
        "spread_pct_kept": round(spread_pct, 1),
        "healing_delta_sec": round(value_all - value_kept, 3),
    }
    canary = art.get("canary")
    record = art.get("canary_record_sec")
    if canary and record and canary in names:
        c_all = statistics.median(p[canary] for p in every)
        ratio = c_all / record if record else 0.0
        rate = value_all / len(names)
        out.update({
            "canary": canary,
            "canary_sec_all_passes": round(c_all, 3),
            "canary_ratio": round(ratio, 2),
            "raw_per_query": round(rate, 3),
            "normalized_per_query": round(rate / ratio, 3) if ratio else None,
        })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
