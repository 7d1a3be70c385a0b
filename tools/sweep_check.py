#!/usr/bin/env python3
"""Per-query oracle sweep for big scale corpora (10x/100x), where one
check.py invocation over everything would serialize behind the slowest
oracle. Loops tools/check.py one query at a time with a timeout, and
skips the known-quadratic DuckDB oracles (pair-scan formulations that
hang at scale — the SPARK side of those queries is benched separately;
their correctness is pinned at sf0.01/sf0.1 where the oracle is
feasible).

Usage: python3 tools/sweep_check.py <sfDir> <outDir> [timeoutSec] [out.json]
<outDir> must already contain a graft.Verify dump for <sfDir>.

SWEEP_SKIP (env, comma-separated) adds per-invocation skips for oracles
that are polynomial-but-heavy at one scale only — e.g. q138's LSH-replay
oracle (round 6) is linear-ish and sweeps fine at 10x, but its 73M-pair
DuckDB cosine re-verify is impractical at 100x, where the Spark side is
still timed in SCALE_CURVE_100x.json.
"""
import json, os, subprocess, sys

QUADRATIC_ORACLES = {
    "q44_ngram_jaccard", "q45_minhash_lsh", "q46_simhash",
    "q48_embedding_top_pairs", "q123_embedding_neardup",
    "q146_incremental_dedup",
    # q279: the ORACLE is an all-pairs radius join (1e10+ pairs at 10x);
    # the Spark side is a linear grid equi-join, benched in SCALE_CURVE.
    "q279_grid_radius_join",
    # q366: the ORACLE is deliberately the naive OR-EXISTS (the whole
    # point of the query is that the form nested-loops); DuckDB runs it
    # quadratically at 100x (>25 min). The Spark side is the decomposed
    # union-of-semi-joins, linear, benched in SCALE_CURVE; correctness
    # is pinned at sf0.01 and 10x where the naive oracle is feasible.
    "q366_or_semi_union",
    # q390: greedy packing is inherently sequential, so the ORACLE is a
    # recursive CTE advancing one document rank per engine iteration —
    # thousands of iterations × fixed per-iteration cost times out at
    # 10x+ (the Spark side streams each group once in
    # flatMapSortedGroups and is benched in SCALE_CURVE). Correctness
    # is pinned at sf0.01 + adversarial where the replay is feasible.
    "q390_context_packing",
    # q400: same oracle class as q45/q146 — exact Jaccard over ALL
    # shingle-sharing pairs (the streaming side only ever verifies
    # band-colliding candidates inside its state layer, linear).
    # Correctness pinned at sf0.01 + adversarial; the Spark side is
    # timed in SCALE_CURVE.
    "q400_stream_lsh_dedup",
}
# Known per-SCALE heavy oracles (polynomial but impractical at 10x+),
# passed via SWEEP_SKIP by tools/release.sh so the adversarial corpus
# (sf0.01-sized) still covers them:
#  - q243 k-core: the oracle unrolls the iterative peel as a recursive
#    CTE whose working set DuckDB spills to >80 GB of temp at 10x
#    (measured round 12: .tmp grew 16 GB in the first two minutes,
#    then filled the disk). Spark side: one bounded shuffle per round,
#    timed in SCALE_CURVE.
#  - at 100x additionally q242/q244/q250/q257/q258 (pair-surface
#    replays that sweep fine at 10x), q138/q292/q321 (LSH/cosine
#    re-verify oracles over 100x pair candidates), and q209/q212
#    (triangle-count / label-propagation replays: DuckDB spilled >75 GB
#    and filled the disk at 100x, measured round 12; both pass at 10x).
QUADRATIC_ORACLES |= {
    s for s in (os.environ.get("SWEEP_SKIP") or "").split(",") if s}

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 1800
    out_json = sys.argv[4] if len(sys.argv) > 4 else None
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    passed, failed, skipped = [], [], []
    for n in sorted(oracles):
        if n in QUADRATIC_ORACLES:
            skipped.append(n)
            continue
        try:
            r = subprocess.run(
                ["python3", "tools/check.py", sf_dir, out_dir, n],
                capture_output=True, text=True, timeout=timeout)
            ok = f"ok    {n}" in r.stdout
            if not ok:
                print((r.stdout.strip().splitlines() or [f"FAIL {n}"])[0])
        except subprocess.TimeoutExpired:
            ok = False
            print(f"TIMEOUT {n}")
        (passed if ok else failed).append(n)
    print(f"\nsweep: {len(passed)} pass, {len(failed)} fail, "
          f"{len(skipped)} skipped (quadratic oracles)")
    if failed:
        print("failed:", failed)
    if out_json:
        json.dump({"sf": sf_dir, "pass": passed, "fail": failed,
                   "skipped_quadratic_oracles": skipped}, open(out_json, "w"),
                  indent=1)
    sys.exit(1 if failed else 0)

if __name__ == "__main__":
    main()
