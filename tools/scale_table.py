#!/usr/bin/env python3
"""Render scale_full.json as SCALECHECK.md's two-column markdown table.

Usage: python3 tools/scale_table.py [scale_full.json]
Prints the table body (header row included) to stdout; paste into the
Result section. Queries are sorted by name; ratios > 3 are flagged so a
new super-linear row can't slip in silently.
"""
import json
import sys


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "scale_full.json"
    with open(path) as f:
        d = json.load(f)
    qs = sorted(d["queries"].items())
    half = (len(qs) + 1) // 2
    left, right = qs[:half], qs[half:]
    print("| query | base s | 10× s | ratio | | query | base s | 10× s | ratio |")
    print("|---|---|---|---|---|---|---|---|---|")

    def cell(item):
        if item is None:
            return " | | | "
        q, v = item
        flag = " ⚠" if float(v["ratio"]) > 3 else ""
        return (f"{q} | {float(v['base']):.2f} | {float(v['scaled']):.2f} | "
                f"{float(v['ratio']):.2f}{flag}")

    for i in range(half):
        r = right[i] if i < len(right) else None
        print(f"| {cell(left[i])} | | {cell(r)} |")
    over = [(q, v) for q, v in qs if float(v["ratio"]) > 3]
    print(f"\n<!-- {len(qs)} queries; >3x: "
          f"{[q for q, _ in over]} -->", file=sys.stderr)


if __name__ == "__main__":
    main()
