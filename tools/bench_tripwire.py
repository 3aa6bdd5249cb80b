#!/usr/bin/env python3
"""Bench-regression tripwire (SURVEY.md §6 pre-commit flow).

Compares the current BENCH_LOCAL.json per-query map against the previous
committed one and exits non-zero on a regression, so a perf regression
like round 9's 7.5x t_rep_filter cannot reach the driver bench unflagged.

Rules:
  - per-query: FAIL if new > PER_QUERY_RATIO * old AND the absolute
    delta exceeds ABS_FLOOR seconds (sub-second noise on cheap queries
    must not trip it)
  - suite: FAIL if the total over COMMON queries (both sides) grows by
    more than SUITE_RATIO
  - new queries (absent from the old map) are reported, never failed
  - allowlist: tools/bench_allow.json, a JSON list of query names that
    are intentionally heavier this round (reviewed, not silenced)

Usage: python3 tools/bench_tripwire.py [current.json] [previous.json]
  current  defaults to BENCH_LOCAL.json
  previous defaults to `git show HEAD:BENCH_LOCAL.json`
"""
import json, os, subprocess, sys

PER_QUERY_RATIO = 1.5
ABS_FLOOR = 0.5   # seconds
SUITE_RATIO = 1.1


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    cur_path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_LOCAL.json"
    cur = load(cur_path)
    if len(sys.argv) > 2:
        prev = load(sys.argv[2])
    else:
        try:
            out = subprocess.run(
                ["git", "show", "HEAD:BENCH_LOCAL.json"],
                capture_output=True, text=True, check=True,
                cwd=os.path.dirname(os.path.abspath(__file__)) + "/..")
            prev = json.loads(out.stdout)
        except subprocess.CalledProcessError:
            print("tripwire: no committed BENCH_LOCAL.json to compare against — PASS (first run)")
            return 0

    allow = set()
    allow_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "bench_allow.json")
    if os.path.exists(allow_path):
        allow = set(json.load(open(allow_path)))

    cq, pq = cur["queries"], prev["queries"]
    common = sorted(set(cq) & set(pq))
    new = sorted(set(cq) - set(pq))
    failures = []
    allowed_hits = []
    for q in common:
        old, newt = pq[q], cq[q]
        if old <= 0 or newt <= 0:
            continue  # failed runs report -1; correctness gates own those
        if newt > PER_QUERY_RATIO * old and newt - old > ABS_FLOOR:
            msg = f"{q}: {old:.3f}s -> {newt:.3f}s ({newt/old:.2f}x)"
            (allowed_hits if q in allow else failures).append(msg)

    old_total = sum(pq[q] for q in common if pq[q] > 0 and cq.get(q, 0) > 0)
    new_total = sum(cq[q] for q in common if pq[q] > 0 and cq[q] > 0)
    suite_bad = old_total > 0 and new_total > SUITE_RATIO * old_total

    if new:
        print(f"tripwire: {len(new)} new queries (not compared): {', '.join(new[:10])}"
              + (" ..." if len(new) > 10 else ""))
    for m in allowed_hits:
        print(f"tripwire: ALLOWED regression {m}")
    print(f"tripwire: common-query total {old_total:.1f}s -> {new_total:.1f}s "
          f"({new_total/old_total:.3f}x over {len(common)} queries)" if old_total else
          "tripwire: no common queries")
    for m in failures:
        print(f"tripwire: FAIL {m}")
    if suite_bad:
        print(f"tripwire: FAIL suite total grew >{SUITE_RATIO}x")
    if failures or suite_bad:
        print("tripwire: REGRESSION — fix it or add the query to tools/bench_allow.json with a reason in the commit")
        return 1
    print("tripwire: PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
