#!/usr/bin/env python3
"""Diff two ScaleBench artifacts (graft.ScaleBench scale_full.json).

Usage: python3 tools/scale_diff.py OLD.json NEW.json [--band 1.4] [--abs 0.5]

The 10x-session twin of bench_diff.py: compares each query's RATIO
(scaled/base — the scale-shape signal, which is what a regression in
partitioning/broadcast/pushdown moves) and flags queries whose ratio
drifts outside the band while the absolute scaled-time delta also
passes the floor (sub-second scaled times jitter; a pure ratio test
would flood on them). Also reports base-time drift separately so a
plan regression visible at 1x is not masked by a stable ratio. Exit
code 1 if any query escapes — a CI tripwire for scale-shape
regressions between rounds.

Works for ANY decade as long as both artifacts share k (it refuses a
k mismatch): compare two k=10 full sessions (scale_full.json) or two
k=100 sessions (scale100_full.json) round-over-round identically. A
query that errors in the NEW artifact is a hard failure; one that
errored only in the OLD artifact is reported informationally (a stale
historical error must not trip the wire forever).
"""
import json
import sys


def load(path):
    with open(path) as f:
        return json.load(f)


def main():
    argv = sys.argv[1:]
    args, opts = [], {}
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--"):
            if "=" in a:
                k, v = a.lstrip("-").split("=", 1)
                opts[k] = float(v)
            else:
                if i + 1 >= len(argv):
                    print(__doc__)
                    return 2
                opts[a.lstrip("-")] = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    band = opts.get("band", 1.4)
    absfloor = opts.get("abs", 0.5)
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    for path, d in ((args[0], old), (args[1], new)):
        if d.get("metric") != "scale" or "queries" not in d:
            print(f"{path}: not a ScaleBench artifact (metric != 'scale')")
            return 2
    if old.get("k") != new.get("k"):
        print(f"k differs: old k={old.get('k')} new k={new.get('k')} — "
              "ratios are not comparable across decades")
        return 2

    do, dn = old["queries"], new["queries"]
    common = sorted(set(do) & set(dn))
    only_old = sorted(set(do) - set(dn))
    only_new = sorted(set(dn) - set(do))
    if only_old:
        print(f"only in old: {', '.join(only_old)}")
    if only_new:
        print(f"only in new: {', '.join(only_new)}")

    movers = []
    fixed = []
    for q in common:
        ro, rn = do[q].get("ratio", -1), dn[q].get("ratio", -1)
        so, sn = do[q].get("scaled", -1), dn[q].get("scaled", -1)
        if rn <= 0:
            # an error in the NEW artifact is always a hard failure
            movers.append((q, ro, rn, so, sn, float("inf")))
            continue
        if ro <= 0:
            # errored only in the OLD artifact (or in both, historically):
            # the new side is healthy, so a stale historical error must not
            # permanently trip the tripwire (round-10 advice) — report
            # informationally and move on
            fixed.append((q, so, sn))
            continue
        drift = rn / ro
        if (drift > band or drift < 1 / band) and abs(sn - so) > absfloor:
            movers.append((q, ro, rn, so, sn, drift))
    if fixed:
        print("errored in old, ok in new (informational):")
        for q, so, sn in fixed:
            print(f"  {q}: scaled {so:.2f}s -> {sn:.2f}s")
    if movers:
        print(f"scale-shape drift (ratio x>{band} AND scaled-time >{absfloor}s, or errored):")
        for q, ro, rn, so, sn, drift in sorted(movers, key=lambda m: -m[5]):
            print(f"  {q}: ratio {ro:.2f} -> {rn:.2f} ({drift:.2f}x drift), "
                  f"scaled {so:.2f}s -> {sn:.2f}s")
        return 1
    print(f"no scale-shape drift across {len(common)} common queries "
          f"(band {band}x, floor {absfloor}s).")
    return 0


if __name__ == "__main__":
    sys.exit(main())
