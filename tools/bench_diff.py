#!/usr/bin/env python3
"""Diff two self-diagnosing bench artifacts (graft.Bench bench_full.json).

Usage: python3 tools/bench_diff.py OLD.json NEW.json [--band 1.3] [--abs 0.5]

Compares MIN-OF-REPS per query (the session-noise-resistant number) and
reports only queries outside BOTH the relative band and the absolute
floor — the reproducibility envelope measured in round 9 (two
back-to-back full sessions: median ratio ~1.0, p90 ~1.25; sub-second
bases jitter tens of ms, so a pure ratio test would flood on them).
Also prints the session-health footers side by side so a hot session
(loadavg high, GC heavy) is visible before any per-query conclusion is
drawn. Exit code 1 if any query escapes the envelope — usable as a CI
regression tripwire.
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
            if "=" in a:  # --band=1.3
                k, v = a.lstrip("-").split("=", 1)
                opts[k] = float(v)
            else:         # --band 1.3
                if i + 1 >= len(argv):
                    print(__doc__)
                    return 2
                opts[a.lstrip("-")] = float(argv[i + 1])
                i += 1
        else:
            args.append(a)
        i += 1
    band = opts.get("band", 1.3)
    absfloor = opts.get("abs", 0.5)
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    for path, d in ((args[0], old), (args[1], new)):
        if "queries_detail" not in d or "value" not in d:
            print(f"{path}: artifact predates the self-diagnosing format "
                  "(no queries_detail/value — produced before round 9); "
                  "re-run graft.Bench to generate a comparable artifact")
            return 2

    def health(d, tag):
        h = d.get("session_health", {})
        s, e = h.get("start", {}), h.get("end", {})
        print(f"  {tag}: n={d.get('n_queries')} last={d.get('value'):.1f}s "
              f"min={float(d.get('value_min', -1)):.1f}s "
              f"load {s.get('loadavg_1m')}->{e.get('loadavg_1m')} "
              f"gc {e.get('gc_ms_cum', 0) - s.get('gc_ms_cum', 0)}ms "
              f"cpu {float(e.get('proc_cpu_s_cum') or 0) - float(s.get('proc_cpu_s_cum') or 0):.0f}s "
              f"wall {h.get('session_wall_s')}s")

    print("session health:")
    health(old, "old")
    health(new, "new")

    do, dn = old["queries_detail"], new["queries_detail"]
    common = sorted(set(do) & set(dn))
    only_old = sorted(set(do) - set(dn))
    only_new = sorted(set(dn) - set(do))
    if only_old:
        print(f"only in old: {', '.join(only_old)}")
    if only_new:
        print(f"only in new: {', '.join(only_new)}")

    movers = []
    tot_o = tot_n = 0.0
    for q in common:
        mo, mn = do[q]["min"], dn[q]["min"]
        if mo <= 0 or mn <= 0:
            movers.append((q, mo, mn, float("inf")))
            continue
        tot_o += mo
        tot_n += mn
        r = mn / mo
        if (r > band or r < 1 / band) and abs(mn - mo) > absfloor:
            movers.append((q, mo, mn, r))
    if tot_o > 0:
        print(f"common min-of-reps totals: {tot_o:.1f}s -> {tot_n:.1f}s "
              f"({(tot_n / tot_o - 1) * 100:+.1f}%)")
    else:
        print("no common queries with positive min in both artifacts")
    if movers:
        print(f"outside envelope (>{band}x AND >{absfloor}s, or errored):")
        for q, mo, mn, r in sorted(movers, key=lambda m: -m[3]):
            # per-rep + gc/cpu detail makes the mover attributable in place
            print(f"  {q}: {mo:.2f} -> {mn:.2f} ({r:.2f}x)  "
                  f"new reps={dn[q]['reps']} gc_ms={dn[q]['gc_ms']} "
                  f"cpu_ms={dn[q]['cpu_ms']}")
        return 1
    print("no query escapes the envelope.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
