#!/usr/bin/env python3
"""Build SCALE_SMOKE_10x.json from two graft.Bench JSON lines.

Usage: python3 tools/scale_smoke.py benchA.json benchB.json out.json

benchA is the sf0.1 run, benchB the 10x corpus run (tools/gen_10x.py).
Emits per-query {a, b, ratio} for every data-scale-bound query present
in BOTH runs (fixture-bound lineage/metastore queries are excluded —
their runtime doesn't scale with the corpus), plus a `super_linear`
list of queries whose ratio exceeds the flag threshold. A 10x corpus
on 4x the occupied cores should land well under 10x wall time for
linear operators; we flag > RATIO_FLAG as needing a look.
"""
import json, sys

# Fixture-bound queries: runtime driven by SQL-script/metastore fixtures,
# not by the parquet corpus — a 10x corpus doesn't change their work.
FIXTURE_BOUND_PREFIXES = (
    "q60", "q61", "q62", "q63", "q64", "q65", "q66", "q67", "q68", "q69",
    "q77", "q94", "q96", "q103", "q104", "q105", "q106", "q107", "q108",
    "q109", "q112", "q113", "q114", "q116", "q121", "q122", "q124",
)
RATIO_FLAG = 12.0

def load(p):
    with open(p) as f:
        return json.load(f)

def main():
    a, b, out = sys.argv[1], sys.argv[2], sys.argv[3]
    ja, jb = load(a), load(b)
    qa, qb = ja["queries"], jb["queries"]
    # fixed-cost-bound queries (streaming drain choreography) are flagged
    # by graft.Bench itself in the bench JSON: their wall time is micro-
    # batch setup, not data work, so they're annotated (ratios stay
    # visible) but kept out of the data-scale top ranks.
    fixed_cost = set(ja.get("fixed_cost_bound", []) +
                     jb.get("fixed_cost_bound", []))
    rows, flagged = {}, []
    for name in sorted(set(qa) & set(qb)):
        if name.startswith(FIXTURE_BOUND_PREFIXES):
            continue
        ta, tb = qa[name], qb[name]
        if ta <= 0 or tb <= 0:   # negative = crashed in that run
            flagged.append(name)
            continue
        ratio = round(tb / ta, 2)
        rows[name] = {"a": round(ta, 3), "b": round(tb, 3), "ratio": ratio}
        if name in fixed_cost:
            rows[name]["fixed_cost"] = True
        if ratio > RATIO_FLAG:
            flagged.append(name)
    top_data = sorted(
        ((n, r["b"]) for n, r in rows.items() if n not in fixed_cost),
        key=lambda t: -t[1])[:10]
    doc = {
        "dirA": ja.get("sf"), "dirB": jb.get("sf"),
        "queries": rows,
        "super_linear": flagged,
        "top10_data_scale": [{"q": n, "sec": s} for n, s in top_data],
        "note": f"10x rows on the same 32-core host; ratio > {RATIO_FLAG} flagged",
    }
    with open(out, "w") as f:
        json.dump(doc, f, indent=1)
    print(f"{len(rows)} queries compared, {len(flagged)} flagged: {flagged}")

if __name__ == "__main__":
    main()
