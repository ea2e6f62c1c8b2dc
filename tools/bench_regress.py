#!/usr/bin/env python3
"""Per-query bench regression gate (round-4 verdict, next-round #6).

Compares two bench artifacts' per-query medians and fails (exit 1) when any
query regresses more than --threshold (default 1.5x) while its baseline
median exceeds --min-sec (default 0.5 s) — sub-half-second entries swing
with JVM noise even under the median protocol, so they are reported but
never gate.

Accepted input formats, per file:
  * a raw Bench.scala output line / logs/bench_last.json:
      {"metric":"total", ..., "queries":{"q1":1.2,...}, ...}
  * a driver round artifact BENCH_r{N}.json:
      {"n":4, "rc":0, ..., "parsed": {...}|null, "tail": "..."}
    When "parsed" is null the queries are recovered best-effort from the
    truncated tail (name:number pairs) — entries lost to truncation are
    simply absent and reported as uncomparable.

Usage:
  python3 tools/bench_regress.py CURRENT PREVIOUS [--threshold 1.5]
                                 [--min-sec 0.5]
"""
import argparse
import json
import re
import sys

PAIR_RE = re.compile(r'"([A-Za-z0-9_]+)":([0-9]+(?:\.[0-9]+)?)')
NON_QUERY_KEYS = {
    "value", "reps", "n", "rc", "cpus", "sf", "metric", "ok",
    "identify", "backup", "delete", "post_validate", "pre_validate",
    "workflow_total", "total",
    # gate-block keys (never query medians) — keep the lossy tail-regex
    # recovery from mistaking gate fields for queries
    "threshold", "min_sec", "compared", "common_ratio",
    "recheck_reps", "recheck_ratio", "queries_omitted",
}


def queries_of(path):
    with open(path) as f:
        raw = f.read()
    try:
        obj = json.loads(raw)
    except json.JSONDecodeError:
        # maybe a log with the JSON line somewhere — fall back to regex
        return _pairs(raw), "regex"
    if isinstance(obj, dict):
        if isinstance(obj.get("queries"), dict):
            return {k: float(v) for k, v in obj["queries"].items()}, "exact"
        parsed = obj.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return {k: float(v) for k, v in parsed["queries"].items()}, "exact"
        tail = obj.get("tail")
        if isinstance(tail, str):
            return _pairs(tail), "tail-regex (lossy)"
    return {}, "unrecognized"


def _pairs(text):
    out = {}
    for name, num in PAIR_RE.findall(text):
        if name not in NON_QUERY_KEYS and not name.endswith("_probe"):
            out[name] = float(num)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("current")
    ap.add_argument("previous")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.5)
    args = ap.parse_args()

    cur, cur_how = queries_of(args.current)
    prev, prev_how = queries_of(args.previous)
    print(f"current:  {args.current} ({cur_how}, {len(cur)} queries)")
    print(f"previous: {args.previous} ({prev_how}, {len(prev)} queries)")
    if not cur or not prev:
        print("FAIL: could not extract queries from one of the inputs")
        return 2

    common = sorted(set(cur) & set(prev))
    only_cur = sorted(set(cur) - set(prev))
    only_prev = sorted(set(prev) - set(cur))
    gate_fail, watch = [], []
    for name in common:
        p, c = prev[name], cur[name]
        ratio = c / p if p > 0 else float("inf")
        if ratio >= args.threshold:
            (gate_fail if p > args.min_sec else watch).append((name, p, c, ratio))

    for name, p, c, r in sorted(gate_fail, key=lambda x: -x[3]):
        print(f"REGRESSION {name}: {p:.3f}s -> {c:.3f}s ({r:.2f}x)")
    for name, p, c, r in sorted(watch, key=lambda x: -x[3]):
        print(f"watch (sub-{args.min_sec}s baseline) {name}: "
              f"{p:.3f}s -> {c:.3f}s ({r:.2f}x)")
    if only_cur:
        print(f"new entries (no baseline): {', '.join(only_cur)}")
    if only_prev:
        print(f"uncomparable (absent in current): {', '.join(only_prev)}")

    tot_p = sum(prev[n] for n in common)
    tot_c = sum(cur[n] for n in common)
    print(f"common-subset sum: {tot_p:.1f}s -> {tot_c:.1f}s "
          f"({tot_c / tot_p:.2f}x over {len(common)} queries)")
    if gate_fail:
        print(f"FAIL: {len(gate_fail)} quer{'y' if len(gate_fail) == 1 else 'ies'} "
              f"regressed >= {args.threshold}x above {args.min_sec}s")
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
