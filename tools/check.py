#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Reads each query's Spark-written parquet from outDir, runs the oracle SQL
from oracle_sql.json in DuckDB over the sfDir tables, and compares:
column names (sorted), row counts, and values (rows sorted, exact compare
with a report of near-misses for floats).

Outputs past BIG_ROWS rows skip the Python materialization (which is
O(rows) driver memory and single-threaded sort — minutes per query on the
100x corpus) and compare entirely inside DuckDB: count equality plus an
empty symmetric EXCEPT ALL difference. That is exact, multi-threaded, and
spill-capable; witnesses are printed on mismatch.
"""
import sys, json, glob, os, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

BIG_ROWS = 100_000

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
        got_cnt = con.execute(
            f"SELECT count(*) FROM '{qdir}/*.parquet'").fetchone()[0]
        if name not in oracles:
            print(f"----  {name}: no oracle ({got_cnt} rows)"); n_noracle += 1
            continue
        # DESCRIBE binds without executing — cheap schema for both sides.
        try:
            gd = con.execute(
                f"DESCRIBE SELECT * FROM '{qdir}/*.parquet'").fetchall()
            ed = con.execute("DESCRIBE " + oracles[name]).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        got_cols = [r[0] for r in gd]
        exp_cols = [r[0] for r in ed]
        if sorted(got_cols) != sorted(exp_cols):
            print(f"FAIL {name}: cols {sorted(got_cols)} != {sorted(exp_cols)}")
            n_fail += 1; continue
        # type-strict: the driver hash-compares typed values, so a
        # HUGEINT/BIGINT-vs-INT oracle mismatch fails there even when the
        # numeric values are identical.
        gt = dict(r[:2] for r in gd)
        et = dict(r[:2] for r in ed)
        tdiff = {c: (gt.get(c), et.get(c)) for c in gt if gt.get(c) != et.get(c)}
        if tdiff:
            print(f"FAIL {name}: column types differ (spark vs oracle): {tdiff}")
            n_fail += 1; continue
        cols = ", ".join(f'"{c}"' for c in sorted(got_cols))
        if got_cnt > BIG_ROWS:
            # DuckDB-side exact compare; types already verified identical.
            try:
                con.execute(f"CREATE OR REPLACE TEMP VIEW _got AS "
                            f"SELECT {cols} FROM '{qdir}/*.parquet'")
                con.execute(f"CREATE OR REPLACE TEMP VIEW _exp AS "
                            f"SELECT {cols} FROM ({oracles[name]}) _oracle")
                exp_cnt = con.execute(
                    "SELECT count(*) FROM _exp").fetchone()[0]
                if got_cnt != exp_cnt:
                    print(f"FAIL {name}: rowcount {got_cnt} != {exp_cnt}")
                    n_fail += 1; continue
                diff = con.execute(
                    "SELECT * FROM ("
                    "(SELECT * FROM _got EXCEPT ALL SELECT * FROM _exp)"
                    " UNION ALL "
                    "(SELECT * FROM _exp EXCEPT ALL SELECT * FROM _got)"
                    ") LIMIT 3").fetchall()
            except Exception as e:
                print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
            if diff:
                print(f"FAIL {name}: symmetric diff non-empty, e.g. {diff}")
                n_fail += 1
            else:
                print(f"ok    {name} ({got_cnt} rows, duckdb-side)"); n_pass += 1
            continue
        got_rows = con.execute(
            f"SELECT {cols} FROM '{qdir}/*.parquet'").fetchall()
        try:
            exp_rows = con.execute(
                f"SELECT {cols} FROM ({oracles[name]}) _oracle").fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}"); n_fail += 1; continue
        g = canon([tuple(norm(v) for v in r) for r in got_rows])
        e = canon([tuple(norm(v) for v in r) for r in exp_rows])
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

