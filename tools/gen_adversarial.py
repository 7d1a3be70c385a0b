#!/usr/bin/env python3
"""Build an adversarial verify corpus: copy a small SF dir and replace
documents.parquet with pathological content the driver fixtures never
exercise — empty tokens (consecutive spaces), empty/whitespace-only
docs, non-ASCII, CJK, surrogate pairs, exact/near dups, 1-token and
50-token docs. Running tools/verify_local.sh against the result
surfaces engine divergences masked by the clean corpus (this is how
the ascii('')=0 vs ord('')=-1 fingerprint bug and the sequence(1,0)
SimHash fold bug were confirmed fixed).

CONTRACT — MinHash band recall (q45/q146): the near-dup gates compare
band-colliding candidates against exact-Jaccard oracles. At similarity
exactly at the 0.9 threshold, the 16x4 banding misses a pair with
probability (1 - 0.9^4)^16 ~ 4e-8 — small but not zero. Engineered
near-dup document pairs in this corpus must therefore sit CLEARLY above
the threshold (e.g. one-token edits on 9-token docs, j ~ 0.8 below /
exact dups above), never at a deliberately band-borderline similarity;
a corpus that plants a j = 0.9 + epsilon pair is testing LSH luck, not
engine correctness.

Usage: python3 tools/gen_adversarial.py [srcSfDir] [outDir]
Then:  bash tools/verify_local.sh <outDir> /tmp/verify_adv
"""
import shutil, subprocess, sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/adversarial_sf"

shutil.rmtree(out, ignore_errors=True)
shutil.copytree(src, out)
subprocess.run(["chmod", "-R", "u+w", out], check=True)

docs = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "the quick brown fox jumps over the lazy dog", "en", "web"),      # exact dup
    (3, "the quick brown fox jumped over the lazy dog", "en", "web"),     # near dup
    (4, "ab  cd double  space everywhere  here", "en", "crawl"),          # empty tokens
    (5, "  leading and trailing spaces  ", "en", "crawl"),
    (6, "", "en", "empty"),                                               # empty text
    (7, "word", "en", "tiny"),                                            # single token
    (8, "héllo wörld straße naïve café über résumé", "de", "web"),        # non-ASCII
    (9, "日本語のテスト文書です これはテストです", "ja", "web"),           # CJK
    (10, "emoji test 😀 with 𝕊𝕦𝕣𝕣𝕠𝕘𝕒𝕥𝕖 pairs 🎉 here", "en", "social"),  # surrogates
    (11, "spark is mentioned here so has_spark should be true", "en", "web"),
    (12, " ".join(f"tok{i}" for i in range(50)), "en", "long"),           # 50 tokens
    (13, "   ", "en", "spaces"),                                          # only spaces
    (14, "a b c a b c a b c a b c", "en", "rep"),                         # repeating shingles
    (15, "the quick brown fox jumps over the lazy dog today", "en", "web"),
    # decomposed combining sequences (NFC must be non-identity here):
    # café vs café, Greek omega+tonos, A+ring
    (16, "cafe\u0301 caf\u00e9 \u03a9\u0301 A\u030astro\u0308m", "fr", "web"),
]
rows = [(d[0], d[1], d[2], d[3], len(d[1])) for d in docs]
con = duckdb.connect()
con.execute("CREATE TABLE t (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", rows)
con.execute(f"COPY (SELECT * FROM t ORDER BY doc_id) TO "
            f"'{out}/documents.parquet' (FORMAT PARQUET)")
print(f"adversarial corpus at {out} "
      f"({len(rows)} documents; other tables copied from {src})")

# ---- adversarial events: pathological timing and value boundaries ----
# Same-nanosecond pairs (tie-break only by event_id), same-microsecond
# different-nanosecond pairs (µs truncation collides), exact interval
# boundaries (1h join window, 24h funnel window, 6h session gap),
# filter-boundary values (190 for q165's value > 190), a cents-rounding
# tie (123.455), and one exactly-full trailing-25 window with an extreme
# value (q199). Everything nanosecond-typed through pyarrow, like the
# driver's corpus.
import pyarrow as pa
import pyarrow.parquet as paq

HOUR = 3_600 * 1_000_000_000
US = 1_000
BASE = 1_700_000_000_000_000_000  # fixed epoch ns

events = []
def add(ts, uid, typ, val):
    events.append((len(events), ts, uid, typ, val,
                   '{"k": %d}' % (len(events) % 100)))

TYPES = ["view", "click", "purchase", "error", "signup"]
# day-1 block: becomes the "late" day for q189's min_hour + 24h cut
for i in range(30):
    add(BASE + i * HOUR // 3, i % 5, TYPES[i % 5], 10.0 + i)

D2 = BASE + 30 * HOUR  # beyond the 24h cut
# u1: same NANOSECOND view+purchase
add(D2, 1, "view", 50.0); add(D2, 1, "purchase", 60.0)
# u2: same microsecond, 1ns apart
add(D2 + HOUR, 2, "view", 20.0); add(D2 + HOUR + 1, 2, "purchase", 30.0)
# u3: purchase exactly 1h after view (inclusive boundary, q125/q190)
add(D2 + 2 * HOUR, 3, "view", 10.0); add(D2 + 3 * HOUR, 3, "purchase", 40.0)
# u4: purchase 1h + 1µs after view (just outside the window)
add(D2 + 4 * HOUR, 4, "view", 10.0)
add(D2 + 5 * HOUR + US, 4, "purchase", 40.0)
# u5: funnel chain at exact 24h steps (q164 boundary is <=)
add(D2, 5, "view", 1.0)
add(D2 + 24 * HOUR, 5, "click", 2.0)
add(D2 + 48 * HOUR, 5, "purchase", 3.0)
# u6: value boundaries around q165's value > 190, plus a cents tie
for j, v in enumerate([190.0, 190.01, 189.99, 123.455, 0.0]):
    add(D2 + 6 * HOUR + j * HOUR, 6, "purchase", v)
# u7: exactly 25 events a minute apart; the last is extreme (q199 flags it)
for j in range(24):
    add(D2 + 7 * HOUR + j * 60 * 1_000_000_000, 7, "click", 100.0 + (j % 3))
add(D2 + 7 * HOUR + 24 * 60 * 1_000_000_000, 7, "click", 3000.0)
# u8: session gaps exactly 6h and 6h + 1µs (q173 boundary)
add(D2 + 60 * HOUR, 8, "view", 5.0)
add(D2 + 66 * HOUR, 8, "view", 5.0)
add(D2 + 72 * HOUR + US, 8, "view", 5.0)
# u9: events exactly on hour-aligned window starts
for j in range(4):
    add(D2 + (80 + j) * HOUR, 9, "view", 7.0)

tbl = pa.table({
    "event_id": pa.array([e[0] for e in events], pa.int64()),
    "ts": pa.array([e[1] for e in events], pa.timestamp("ns")),
    "user_id": pa.array([e[2] for e in events], pa.int64()),
    "event_type": pa.array([e[3] for e in events], pa.string()),
    "value": pa.array([e[4] for e in events], pa.float64()),
    "props": pa.array([e[5] for e in events], pa.string()),
})
paq.write_table(tbl, f"{out}/events.parquet")
print(f"adversarial events: {len(events)} rows with boundary/tie cases")

# ---- adversarial embeddings: float-extreme but well-defined vectors ----
# Exact duplicates, a 1-ulp near-duplicate, huge (1e30) and tiny (1e-30)
# magnitudes, mixed signs — cases where cosine/dot must stay IEEE-exact
# on both engines. Zero-norm vectors are deliberately NOT included: the
# engine's documented contract (VectorOps scaladoc) is that zero
# embeddings are filtered upstream — cosine is undefined for them and
# the engines disagree on double division by zero (Spark IEEE NaN/Inf,
# DuckDB NULL), so no oracle-backed answer exists.
import struct

DIM = 64
def lcg(seed):
    x = seed
    while True:
        x = (x * 1103515245 + 12345) % 2147483647
        yield x

vecs = []
g = lcg(7)
base_vec = [((next(g) % 2000) - 1000) / 1000.0 for _ in range(DIM)]
vecs.append((0, base_vec, 0))                       # normal
vecs.append((1, list(base_vec), 1))                 # exact duplicate of 0
nd = list(base_vec)
nd[0] = struct.unpack('f', struct.pack('f', nd[0]))[0] + 1e-6
vecs.append((2, nd, 2))                             # near-duplicate (tiny delta)
vecs.append((3, [1e30] * DIM, 3))                   # huge magnitude
vecs.append((4, [1e-30] * DIM, 4))                  # tiny magnitude
vecs.append((5, [(-1.0) ** i for i in range(DIM)], 5))  # alternating signs
for i in range(6, 40):                              # filler, deterministic
    vecs.append((i, [((next(g) % 2000) - 1000) / 1000.0 for _ in range(DIM)],
                 i % 8))

etbl = pa.table({
    "vec_id": pa.array([v[0] for v in vecs], pa.int64()),
    "embedding": pa.array([v[1] for v in vecs], pa.list_(pa.float32())),
    "label": pa.array([v[2] for v in vecs], pa.int32()),
})
paq.write_table(etbl, f"{out}/embeddings.parquet")
print(f"adversarial embeddings: {len(vecs)} vectors (dup/near-dup/1e30/1e-30)")

# ---- adversarial orders/lineitem: decimal boundaries, .xx5 ties, ----
# ---- same-key skew bursts, NULL-heavy optional columns           ----
# The relational tables were the last un-fuzzed fixture family. Keys stay
# inside the copied dimensions' ranges (custkey 0-149, suppkey 0-9,
# partkey 0-199) so joins still match. Magnitudes stay inside the
# engine-documented DECIMAL(12,2) contract (< 1e10) — an overflowing cast
# NULLs in one engine and raises in the other, which is outside any
# oracle-expressible semantic. The .xx5 tie values are EXACT binary
# fractions (eighths), so decimal rounding mode (half-up vs half-even)
# is genuinely exercised rather than hidden by double representation.
import datetime

D = datetime.datetime

orders2 = []
def oadd(key, cust, status, price, date, prio):
    orders2.append((key, cust, status, price, date, prio))

# skew burst: custkey 7 owns 500 orders (q16 HAVING >= 12, q198 preflight)
for i in range(500):
    oadd(10000 + i, 7, "OFP"[i % 3],
         round(100.0 + i * 0.01, 2),
         D(1992 + i % 7, 1 + i % 12, 1 + i % 28),
         ["1-URGENT", "5-LOW", "3-MEDIUM"][i % 3])
# .xx5 ties exactly representable in binary (eighths): 0.125, 2.375, ...
for j, p in enumerate([0.125, 2.375, 100.625, 9999.875, 12.5, 0.375]):
    oadd(11000 + j, j % 150, "O", p, D(1995, 3, 15), "1-URGENT")
# decimal boundary prices: DECIMAL(12,2)-max-adjacent, tiny, negative
for j, p in enumerate([9999999.99, 0.01, -0.01, -99999.99, 123456.78]):
    oadd(11100 + j, (j * 13) % 150, "F", p, D(1992 + j, 6, 30), "2-HIGH")
# NULL-heavy rows: every optional column NULL somewhere
oadd(11200, 11, None, None, None, None)
oadd(11201, 12, "P", None, D(1996, 1, 1), None)
oadd(11202, 13, None, 55.55, None, "5-LOW")
# year boundary for q183's year(o_orderdate) % 3 = 0 prune (1992, 1995, 1998)
for j, y in enumerate([1992, 1995, 1998]):
    oadd(11300 + j, 20 + j, "O", 777.0, D(y, 12, 31), "1-URGENT")

otbl = pa.table({
    "o_orderkey": pa.array([o[0] for o in orders2], pa.int64()),
    "o_custkey": pa.array([o[1] for o in orders2], pa.int64()),
    "o_orderstatus": pa.array([o[2] for o in orders2], pa.string()),
    "o_totalprice": pa.array([o[3] for o in orders2], pa.float64()),
    "o_orderdate": pa.array([o[4] for o in orders2], pa.timestamp("us")),
    "o_orderpriority": pa.array([o[5] for o in orders2], pa.string()),
})
paq.write_table(otbl, f"{out}/orders.parquet")
print(f"adversarial orders: {len(orders2)} rows (skew burst, .xx5 ties, NULLs)")

lines = []
def ladd(okey, part, supp, ln, qty, price, disc, tax, rf, ls, ship):
    lines.append((okey, part, supp, ln, qty, price, disc, tax, rf, ls, ship))

# same-key skew: one (partkey, suppkey) pair on 400 lines (q192 graph hub,
# q169/q198 skew shapes)
for i in range(400):
    ladd(10000 + i, 5, 3, 1, 1.0 + i % 50, 1000.0 + i, 0.05, 0.02,
         "NAR"[i % 3], "OF"[i % 2], D(1994, 1 + i % 12, 1 + i % 28))
# q02 boundary probes: shipdate exactly on the half-open range ends,
# discount exactly 0.05/0.07, quantity exactly 24 and just below
ladd(11000, 10, 1, 1, 23.0, 100.0, 0.05, 0.01, "N", "O", D(1996, 1, 1))
ladd(11000, 11, 2, 2, 24.0, 100.0, 0.07, 0.01, "N", "O", D(1996, 12, 31))
ladd(11001, 12, 3, 1, 23.999, 100.0, 0.06, 0.01, "A", "F", D(1997, 1, 1))
ladd(11001, 13, 4, 2, 1.0, 100.0, 0.049999, 0.01, "R", "F", D(1995, 12, 31))
# .xx5 tie prices/discounts as exact eighths; q01 decimal-cast rounding
for j, (p, d) in enumerate([(0.125, 0.125), (2.375, 0.0), (100.625, 0.25),
                            (9999.875, 0.5), (12.5, 0.375)]):
    ladd(11002, 20 + j, j % 10, j + 1, 5.0, p, d, 0.125, "N", "O",
         D(1993, 7, 4))
# negative amounts (refund rows) + decimal-boundary magnitudes
ladd(11003, 30, 5, 1, -3.0, -4999.99, 0.0, 0.0, "R", "F", D(1994, 2, 2))
ladd(11003, 31, 6, 2, 0.0, 9999999.99, 0.0, 0.08, "A", "O", D(1994, 2, 3))
# NULL-heavy rows: optional measures/dates NULL
ladd(11004, 40, 7, 1, None, None, None, None, None, None, None)
ladd(11004, 41, 8, 2, 7.0, 700.0, None, 0.01, "N", None, None)
ladd(11005, 42, 9, 1, None, 800.0, 0.02, None, None, "O", D(1998, 9, 2))
# q01 cutoff boundary: shipdate exactly 1998-09-02 (<=) and one day later
ladd(11006, 43, 0, 1, 2.0, 50.0, 0.01, 0.01, "N", "O", D(1998, 9, 2))
ladd(11006, 44, 1, 2, 2.0, 50.0, 0.01, 0.01, "N", "O", D(1998, 9, 3))

ltbl = pa.table({
    "l_orderkey": pa.array([l[0] for l in lines], pa.int64()),
    "l_partkey": pa.array([l[1] for l in lines], pa.int64()),
    "l_suppkey": pa.array([l[2] for l in lines], pa.int64()),
    "l_linenumber": pa.array([l[3] for l in lines], pa.int32()),
    "l_quantity": pa.array([l[4] for l in lines], pa.float64()),
    "l_extendedprice": pa.array([l[5] for l in lines], pa.float64()),
    "l_discount": pa.array([l[6] for l in lines], pa.float64()),
    "l_tax": pa.array([l[7] for l in lines], pa.float64()),
    "l_returnflag": pa.array([l[8] for l in lines], pa.string()),
    "l_linestatus": pa.array([l[9] for l in lines], pa.string()),
    "l_shipdate": pa.array([l[10] for l in lines], pa.timestamp("us")),
})
paq.write_table(ltbl, f"{out}/lineitem.parquet")
print(f"adversarial lineitem: {len(lines)} rows "
      f"(boundary dates/discounts, eighth-ties, NULLs, skew)")
