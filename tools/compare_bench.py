#!/usr/bin/env python3
"""Diff two bench outputs (BENCH_r{N}.json driver files or raw Bench
stdout lines): per-query deltas sorted by regression, plus
added/removed queries. Dev tool for round-over-round regression checks
against the standing self-baseline in BASELINE.md.

Usage: python3 tools/compare_bench.py BENCH_r03.json BENCH_r04.json
"""
import json
import re
import sys


def load(path):
    text = open(path).read()
    # driver files wrap the bench line in {"tail": "..."}; raw files are
    # the JSON line itself (possibly prefixed by sbt's "[info] ")
    try:
        outer = json.loads(text)
        if isinstance(outer, dict) and "queries" in outer:
            return outer["queries"]
        text = outer.get("tail", text) if isinstance(outer, dict) else text
    except json.JSONDecodeError:
        pass
    m = re.search(r'"queries"\s*:\s*(\{[^}]*\})', text)
    if m:
        return json.loads(m.group(1))
    # driver "tail" capture may begin mid-line (e.g. 'ies":{"q1":1.2,...');
    # the queries map itself has no nested braces, so take the first
    # brace blob that parses as a str->float map
    for blob in re.findall(r'\{[^{}]*\}', text):
        try:
            d = json.loads(blob)
            if d and all(isinstance(v, (int, float)) for v in d.values()):
                return d
        except json.JSONDecodeError:
            continue
    # last resort: the driver's tail capture can truncate the FRONT of
    # the line (no opening brace survives) — scrape "name":float pairs
    # directly; harness keys are snake_case query names, so drop the
    # envelope fields. A partial map still beats no diff, but warn.
    pairs = {m.group(1): float(m.group(2)) for m in
             re.finditer(r'"([a-z][a-z0-9_]+)"\s*:\s*([0-9.]+)', text)
             if m.group(1) not in ("value", "sf", "total", "n", "rc", "cpus")}
    if pairs:
        print(f"note: {path} parsed from a truncated tail — "
              f"{len(pairs)} queries recovered, early entries may be missing",
              file=sys.stderr)
        return pairs
    sys.exit(f"{path}: no queries map found")


def main():
    if len(sys.argv) != 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    both = sorted(set(old) & set(new), key=lambda k: old[k] - new[k])
    print(f"{'query':32s} {'old':>7s} {'new':>7s} {'delta':>8s}")
    for k in both:
        d = new[k] - old[k]
        # absolute floor 0.5s filters cold-start jitter; 20% relative keeps
        # large regressions on slow queries visible (a 6s query must not be
        # able to drift to 8.9s unflagged)
        flag = "  <-- regression" if d > max(0.5, 0.2 * old[k]) else ""
        rel = f" ({d / old[k]:+4.0%})" if old[k] > 0 else ""
        print(f"{k:32s} {old[k]:7.2f} {new[k]:7.2f} {d:+8.2f}{rel}{flag}")
    for k in sorted(set(new) - set(old)):
        print(f"{k:32s} {'-':>7s} {new[k]:7.2f}    (new)")
    for k in sorted(set(old) - set(new)):
        print(f"{k:32s} {old[k]:7.2f} {'-':>7s}    (removed)")
    t_old, t_new = sum(old.values()), sum(new.values())
    print(f"\n{'TOTAL':32s} {t_old:7.2f} {t_new:7.2f} {t_new - t_old:+8.2f}"
          f"   ({len(old)} -> {len(new)} queries)")


if __name__ == "__main__":
    main()
