"""Aggregate the round-6 same-window frozen-bench runs (new tree vs the
r5 worktree, two interleaved rounds per scale factor) into the markdown
table for BENCH/R06_WINDOW.md. Per side we take the per-query MIN across
rounds (the bimodal-noise discipline from BENCH/BASELINE.md applied
across sequential runs in one evening window).

Usage: python tools/r06_bench_table.py /tmp/bench_{old,new}_sf{SF}.json \
       /tmp/bench2_{old,new}_sf{SF}.json ... (globbed internally)
"""
from __future__ import annotations

import glob
import json
import sys


def load(side: str, sf: str) -> list[dict]:
    out = []
    for p in sorted(glob.glob(f"/tmp/bench*_{side}_sf{sf}.json")):
        try:
            with open(p) as f:
                out.append(json.load(f))
        except Exception:
            pass
    return out


def agg(runs: list[dict]):
    qmin: dict[str, float] = {}
    fmin: dict[str, float] = {}
    for d in runs:
        for k, v in d["queries"].items():
            qmin[k] = min(qmin.get(k, 1e9), v)
        for k, v in d["full_scale"].items():
            fmin[k] = min(fmin.get(k, 1e9), v["sec"])
        for k, v in d["dedup_scaling_sf1"]["families"].items():
            fmin["twin_" + k] = min(fmin.get("twin_" + k, 1e9), v["sec"])
    return qmin, fmin


def main():
    for sf in ("1.0", "0.1"):
        old_runs, new_runs = load("old", sf), load("new", sf)
        if not old_runs or not new_runs:
            print(f"sf{sf}: missing runs ({len(old_runs)} old, "
                  f"{len(new_runs)} new)")
            continue
        oq, of = agg(old_runs)
        nq, nf = agg(new_runs)
        print(f"\n### sf{sf} ({len(old_runs)} old / {len(new_runs)} new "
              "runs, per-query min per side)\n")
        print("| query | r5 | r6 | Δ |")
        print("|---|---|---|---|")
        only = set(oq) ^ set(nq) | (set(of) ^ set(nf))
        if only:
            print(f"| (present on one side only, skipped: {sorted(only)}) |")
        oq = {k: v for k, v in oq.items() if k in nq}
        of = {k: v for k, v in of.items() if k in nf}
        for k in oq:
            d = (nq[k] - oq[k]) / oq[k] * 100
            print(f"| {k} | {oq[k]:.2f} | {nq[k]:.2f} | {d:+.0f}% |")
        print(f"| **headline sum** | {sum(oq.values()):.2f} | "
              f"{sum(nq.values()):.2f} | "
              f"{(sum(nq.values())-sum(oq.values()))/sum(oq.values())*100:+.0f}% |")
        for k in of:
            d = (nf[k] - of[k]) / of[k] * 100
            print(f"| {k} | {of[k]:.2f} | {nf[k]:.2f} | {d:+.0f}% |")
        print(f"| **full+twin sum** | {sum(of.values()):.2f} | "
              f"{sum(nf.values()):.2f} | "
              f"{(sum(nf.values())-sum(of.values()))/sum(of.values())*100:+.0f}% |")


if __name__ == "__main__":
    main()
