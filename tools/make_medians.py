#!/usr/bin/env python3
"""Build BENCH_MEDIANS_r<N>.json from the previous medians file plus one
or more fresh BENCH_DETAILS*-style sweeps (Bench.scala's per-query file).

The floors() machinery in Bench.scala takes the host-normalized MIN across
all runs, so carrying the previous rounds' runs keeps floors tight for
untouched rows while fresh sweeps supply floors for new/changed rows.

Usage:
  make_medians.py <prev_medians.json|-> <out.json> <note> <label:details.json> ...
"""
import json
import sys


def main():
    prev, out, note = sys.argv[1], sys.argv[2], sys.argv[3]
    runs = []
    if prev != "-":
        p = json.load(open(prev))
        for r in p.get("runs", []):
            runs.append(r)
    sf = cpus = reps = None
    for spec in sys.argv[4:]:
        label, path = spec.split(":", 1)
        d = json.load(open(path))
        sf, cpus, reps = d.get("sf"), d.get("cpus"), d.get("reps")
        runs.append({
            "label": label,
            "cal_ms": d.get("cal_ms"),
            "queries": {k: v for k, v in d["queries"].items() if v >= 0},
        })
    doc = {
        "sf": sf or "/root/testdata/sf0.1",
        "cpus": cpus or 32,
        "reps": reps or 3,
        "method": ("per-run per-query medians; floors() takes the "
                   "host-normalized min across runs (cal_ms scaling); "
                   "uncalibrated runs are skipped once a calibrated one "
                   "exists"),
        "note": note,
        "runs": runs,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{out}: {len(runs)} runs, "
          f"{len(set(k for r in runs for k in r['queries']))} distinct queries")


if __name__ == "__main__":
    main()
