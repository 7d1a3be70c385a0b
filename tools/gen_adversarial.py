#!/usr/bin/env python3
"""Build an adversarial verify corpus: copy a small SF dir and replace
documents.parquet with pathological content the driver fixtures never
exercise — empty tokens (consecutive spaces), empty/whitespace-only
docs, non-ASCII, CJK, surrogate pairs, exact/near dups, 1-token and
50-token docs. Running tools/verify_local.sh against the result
surfaces engine divergences masked by the clean corpus (this is how
the ascii('')=0 vs ord('')=-1 fingerprint bug and the sequence(1,0)
SimHash fold bug were confirmed fixed).

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
