#!/usr/bin/env python3
"""Generate the session-local ~10x-of-sf0.1 corpus for the THIRD scale
point (SCALING.md's sf0.1 -> sf~1 column). Scaling measurement only — no
oracle runs against it, so determinism and realistic scale SHAPE are the
requirements, not statistical fidelity.

Derivation (seeded by the copy index k = 0..9, copy 0 = the original):
- documents: doc_id += k*N; text caesar-shifted by k (translate over
  [a-z] and [A-Z]) so copies share NO tokens/shingles/byte-windows —
  replicating text verbatim would weld each doc's 10 copies into one
  near-dup cluster and measure an artificial 10x cluster-size blowup
  instead of 10x data. Word/line structure and lengths are preserved, so
  the rule/packing/token arithmetic sees realistic documents.
- embeddings: vec_id += k*N; embedding rotated by k positions — same
  norm and value distribution, decorrelated geometry per copy.
- events: event_id/user_id += k*N — 10x users, NOT 10x history per user
  (the realistic growth shape: per-user session/interval sizes are a
  property of the product, not the corpus size).

Usage: gen_scale.py [srcDir] [outDir]
"""
import sys
import duckdb

src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_sf1"

LOWER = "abcdefghijklmnopqrstuvwxyz"
UPPER = LOWER.upper()

con = duckdb.connect()
con.execute("PRAGMA threads=16")
import os
os.makedirs(out, exist_ok=True)

def copies(sql_per_k):
    return " UNION ALL ".join(sql_per_k(k) for k in range(10))

# documents: caesar shift per copy
ndoc = con.sql(f"SELECT count(*) FROM '{src}/documents.parquet'").fetchone()[0]
def doc_copy(k):
    lo = LOWER[k:] + LOWER[:k]
    up = UPPER[k:] + UPPER[:k]
    return (f"SELECT doc_id + {k * ndoc} AS doc_id, "
            f"translate(text, '{LOWER}{UPPER}', '{lo}{up}') AS text, "
            f"lang, source, n_chars FROM '{src}/documents.parquet'")
con.execute(f"COPY ({copies(doc_copy)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")

# embeddings: rotate the vector per copy
nvec = con.sql(f"SELECT count(*) FROM '{src}/embeddings.parquet'").fetchone()[0]
def vec_copy(k):
    if k == 0:
        rot = "embedding"
    else:
        rot = (f"list_slice(embedding, {k + 1}, 64) || "
               f"list_slice(embedding, 1, {k})")
    return (f"SELECT vec_id + {k * nvec} AS vec_id, "
            f"CAST({rot} AS FLOAT[]) AS embedding, label "
            f"FROM '{src}/embeddings.parquet'")
con.execute(f"COPY ({copies(vec_copy)}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")

# events: shift ids/users per copy (10x users, same per-user history)
nev = con.sql(f"SELECT count(*) FROM '{src}/events.parquet'").fetchone()[0]
nuser = con.sql(f"SELECT max(user_id) + 1 FROM '{src}/events.parquet'").fetchone()[0]
def ev_copy(k):
    return (f"SELECT event_id + {k * nev} AS event_id, ts, "
            f"user_id + {k * nuser} AS user_id, event_type, value, props "
            f"FROM '{src}/events.parquet'")
con.execute(f"COPY ({copies(ev_copy)}) TO '{out}/events.parquet' (FORMAT PARQUET)")

for t in ("documents", "embeddings", "events"):
    n = con.sql(f"SELECT count(*) FROM '{out}/{t}.parquet'").fetchone()[0]
    print(f"{t}: {n} rows")
