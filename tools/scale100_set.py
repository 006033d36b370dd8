#!/usr/bin/env python3
"""Derive the comparable 100x session's query set (round-10 verdict #2).

Usage: python3 tools/scale100_set.py bench_full.json scale_full.json \
           [--top 20] [--ratio 2.5] [--waive q70_semdedup,q80_containment] \
           [--pin q162_copurchase,...]

Set = (bench top-N by min-of-reps) UNION (every query whose 10x ratio
exceeds the cutoff) UNION explicit pins, minus explicit waivers (each
waiver AND pin must be justified in SCALECHECK.md — pins are for
post-fix re-measurements and write-path twins whose 10x behavior is
deliberately tame but whose second-decade row is the evidence that
matters). Prints the comma-separated list for SPARK_GRAFT_ONLY plus a
human-readable derivation so the set is auditable, not curated.
"""
import json
import sys


def main():
    argv = sys.argv[1:]
    args, opts = [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            opts[a.lstrip("-")] = argv[i + 1]
            i += 1
        else:
            args.append(a)
        i += 1
    bench_path, scale_path = args
    top_n = int(opts.get("top", 20))
    cutoff = float(opts.get("ratio", 2.5))
    waived = set(filter(None, opts.get("waive", "").split(",")))
    pinned = set(filter(None, opts.get("pin", "").split(",")))

    with open(bench_path) as f:
        bench = json.load(f)
    with open(scale_path) as f:
        scale = json.load(f)

    detail = bench.get("queries_detail", {})
    mins = {q: d["min"] for q, d in detail.items() if d.get("min", -1) > 0}
    top = sorted(mins, key=lambda q: -mins[q])[:top_n]

    ratios = {q: r.get("ratio", -1) for q, r in scale["queries"].items()}
    hot = sorted(q for q, r in ratios.items() if r > cutoff)

    chosen = sorted(set(top) | set(hot) | pinned)
    kept = [q for q in chosen if q not in waived]
    dropped = [q for q in chosen if q in waived]

    print(f"# bench top-{top_n} (by min-of-reps):", file=sys.stderr)
    for q in top:
        print(f"#   {q}: {mins[q]:.2f}s", file=sys.stderr)
    print(f"# 10x ratio > {cutoff}:", file=sys.stderr)
    for q in hot:
        print(f"#   {q}: {ratios[q]:.2f}x", file=sys.stderr)
    mech = set(top) | set(hot)
    extra = sorted(pinned - mech)
    if extra:
        print(f"# pinned (justify in SCALECHECK.md): {', '.join(extra)}",
              file=sys.stderr)
    if dropped:
        print(f"# waived (justify in SCALECHECK.md): {', '.join(dropped)}",
              file=sys.stderr)
    print(f"# total {len(kept)} queries", file=sys.stderr)
    print(",".join(kept))


if __name__ == "__main__":
    main()
