#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads each query's Spark-written parquet from outDir, runs the oracle SQL
from oracle_sql.json in DuckDB over the sfDir tables, and compares:
column names (sorted), row counts, and values (rows sorted, exact compare
with a report of near-misses for floats).
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def canon(rows):
    def key(r):
        return tuple((v is None, str(type(v)), str(v)) for v in r)
    return sorted(rows, key=key)

def norm(v):
    if v is None: return None
    if isinstance(v, bool): return v
    if isinstance(v, float): return v
    if isinstance(v, int): return float(v) if abs(v) < 2**52 else v
    try:
        import decimal
        if isinstance(v, decimal.Decimal): return float(v)
    except Exception: pass
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    filt = sys.argv[3] if len(sys.argv) > 3 and sys.argv[3] else None
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if filt and filt not in name: continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{qdir}/*.parquet'")
        got_cols = [d[0] for d in got.description]
        got_rows = got.fetchall()
        if name not in oracles:
            print(f"----  {name}: no oracle ({len(got_rows)} rows)"); n_noracle += 1
            continue
        try:
            exp = con.execute(oracles[name])
            exp_cols = [d[0] for d in exp.description]
            exp_rows = exp.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        # type-strict: the driver hash-compares typed values, so a
        # HUGEINT/BIGINT-vs-INT oracle mismatch fails there even when the
        # numeric values are identical. DESCRIBE both sides and compare.
        try:
            gt = dict(r[:2] for r in con.execute(
                f"DESCRIBE SELECT * FROM '{qdir}/*.parquet'").fetchall())
            et = dict(r[:2] for r in con.execute(
                "DESCRIBE " + oracles[name]).fetchall())
            tdiff = {c: (gt.get(c), et.get(c)) for c in gt
                     if gt.get(c) != et.get(c)}
            if tdiff:
                print(f"FAIL {name}: column types differ (spark vs oracle): {tdiff}")
                n_fail += 1; continue
        except Exception as e:
            print(f"      {name}: type-check skipped ({e})")
        # align column order by sorted name
        gi = [got_cols.index(c) for c in sorted(got_cols)]
        ei = [exp_cols.index(c) for c in sorted(exp_cols)]
        g = canon([tuple(norm(r[i]) for i in gi) for r in got_rows])
        e = canon([tuple(norm(r[i]) for i in ei) for r in exp_rows])
        if len(g) != len(e):
            print(f"FAIL {name}: rowcount {len(g)} != {len(e)}"); n_fail += 1; continue
        bad = None
        for i, (gr, er) in enumerate(zip(g, e)):
            if gr != er:
                # measure float near-miss
                close = all(
                    (a == b) or (isinstance(a, float) and isinstance(b, float)
                                 and math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9))
                    for a, b in zip(gr, er))
                bad = (i, gr, er, close); break
        if bad:
            i, gr, er, close = bad
            tag = "NEAR" if close else "FAIL"
            print(f"{tag} {name}: row {i}\n  got {gr}\n  exp {er}")
            n_fail += 1
        else:
            print(f"ok    {name} ({len(g)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_noracle} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
