#!/usr/bin/env python3
"""Assemble SCALE_CURVE_100x.json from three filtered graft.Bench runs.

Usage: python3 tools/scale_curve.py bench1x.json bench10x.json bench100x.json out.json

The three runs are the same query subset (SPARK_GRAFT_ONLY) over sf0.1,
the 10x corpus, and the 100x corpus (tools/gen_10x.py applied twice —
row counts x10 and x100, constant duplicate/near-dup rates). For each
query the artifact records seconds at each scale and the 10x->100x
ratio; with 10x more rows on the same 32 cores, a linear operator lands
near 10, sub-linear below it. Queries whose 10x->100x ratio exceeds
FLAG (super-linear with headroom for fixed overhead amortization
differences) land in `super_linear`.
"""
import json, sys

FLAG = 14.0

def main():
    p1, p10, p100, out = sys.argv[1:5]
    j1 = json.load(open(p1)); j10 = json.load(open(p10)); j100 = json.load(open(p100))
    rows, flagged = {}, []
    for name in sorted(set(j1["queries"]) & set(j10["queries"]) & set(j100["queries"])):
        a, b, c = (j["queries"][name] for j in (j1, j10, j100))
        if min(a, b, c) <= 0:
            flagged.append(name); continue
        rows[name] = {
            "sec_1x": round(a, 3), "sec_10x": round(b, 3), "sec_100x": round(c, 3),
            "r_1_10": round(b / a, 2), "r_10_100": round(c / b, 2),
        }
        if c / b > FLAG:
            flagged.append(name)
    doc = {
        "dirs": [j1.get("sf"), j10.get("sf"), j100.get("sf")],
        "note": ("x10 rows per step on the same 32-core host; r_10_100 is the "
                 f"loaded-step ratio (linear = 10); > {FLAG} flagged"),
        "queries": rows,
        "super_linear": flagged,
    }
    json.dump(doc, open(out, "w"), indent=1)
    print(f"{len(rows)} queries, {len(flagged)} flagged: {flagged}")

if __name__ == "__main__":
    main()
