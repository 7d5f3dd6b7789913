#!/usr/bin/env python3
"""Join two bench artifacts on query name and print regressions.

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--threshold 1.5]

Accepts either a raw `graft.Bench` JSON line (has a "queries" object) or a
driver-captured BENCH_r*.json (has "tail"/"parsed"); per-query times are
regex-recovered from the tail when the capture truncated the JSON.
"""
import json
import re
import sys

Q_RE = re.compile(r'"(q\d+[a-z0-9_]*)"\s*:\s*(-?[0-9]+(?:\.[0-9]+)?)')


def load(path):
    with open(path) as f:
        raw = f.read()
    try:
        d = json.loads(raw)
    except ValueError:
        d = {"tail": raw}
    if isinstance(d, dict):
        if isinstance(d.get("queries"), dict):
            return {k: float(v) for k, v in d["queries"].items()}, d.get("value")
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and isinstance(parsed.get("queries"), dict):
            return ({k: float(v) for k, v in parsed["queries"].items()},
                    parsed.get("value"))
        blob = d.get("tail", "") or raw
    else:
        blob = raw
    qs = {m.group(1): float(m.group(2)) for m in Q_RE.finditer(blob)}
    total = None
    m = re.search(r'"value"\s*:\s*([0-9]+(?:\.[0-9]+)?)', blob)
    if m:
        total = float(m.group(1))
    return qs, total


def main():
    argv, args, thr = sys.argv[1:], [], 1.5
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                i += 1
                thr = float(argv[i])
        else:
            args.append(a)
        i += 1
    if len(args) != 2:
        print(__doc__)
        return 2
    old, old_total = load(args[0])
    new, new_total = load(args[1])
    common = sorted(set(old) & set(new))
    if not common:
        print(f"no common queries ({len(old)} old, {len(new)} new)")
        return 1
    # Bench emits -1.0 for a query whose reps all failed — a sentinel,
    # not a time. Report status flips separately, never as ratios.
    broke = [q for q in common if old[q] > 0 >= new[q]]
    fixed = [q for q in common if new[q] > 0 >= old[q]]
    common = [q for q in common if old[q] > 0 and new[q] > 0]
    for q in broke:
        print(f"NOW FAILING: {q} (was {old[q]:.2f}s)")
    for q in fixed:
        print(f"now passing: {q} ({new[q]:.2f}s)")
    rows = [(q, old[q], new[q], new[q] / old[q]) for q in common]
    reg = [r for r in rows if r[3] > thr]
    imp = sorted(rows, key=lambda r: r[3])[:5]
    so, sn = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"{len(common)} common queries: {so:.1f}s -> {sn:.1f}s "
          f"({(sn / so - 1) * 100:+.0f}%)")
    if old_total and new_total:
        print(f"full-surface totals: {old_total:.1f}s -> {new_total:.1f}s")
    print(f"\nregressions >{thr}x: {len(reg)}")
    for q, o, n, r in sorted(reg, key=lambda r: -r[3]):
        print(f"  {q:<28} {o:7.2f}s -> {n:7.2f}s  {r:5.2f}x")
    print("\nbiggest improvements:")
    for q, o, n, r in imp:
        print(f"  {q:<28} {o:7.2f}s -> {n:7.2f}s  {r:5.2f}x")
    only_new = sorted(set(new) - set(old))
    if only_new:
        print(f"\nnew-only queries: {len(only_new)}")
    return 0 if not (reg or broke) else 3


if __name__ == "__main__":
    sys.exit(main())
