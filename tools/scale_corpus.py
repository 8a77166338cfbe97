#!/usr/bin/env python3
"""Scale-validation corpus generator (dev tool only; the engine has no
Python dependency): builds an ~Nx replica of the sf0.1 harness tables
under target/scale/sfN/ so the registry's most expensive queries can be
timed at two scales and checked for superlinear growth (VERDICT r10
ask #4).

Replication is id-offset + deterministic perturbation, NOT plain
duplication: a verbatim copy would make every original a near-dup of
its replicas, quadratically exploding the dedup queries' OUTPUT for
data reasons and masking any real plan pathology. Text replicas get a
salt token interleaved every PERIOD tokens; embedding replicas get a
seeded per-replica dimension permutation plus +-0.05 hash-noise per
dim (together pushing replica cosine below the dedup taus; the r = 0
slice of every table is the source data verbatim). Events/orders/lineitem keep
their key distributions (same users/customers, Nx depth) - the growth
shape a production corpus actually has.

SALT PERIOD matters more than intended (r14 finding): at the
historical default PERIOD=3, one in three 3-token shingle windows
contains no salt, so every replica still shares ~n/3 shingles with
every other replica - cross-replica Jaccard ~0.14: BELOW the tau=0.3
publish threshold (outputs stay clean) but ABOVE zero, so the exact
posting join's candidate mass grows with replica-pair count - i.e.
the default corpus deliberately carries boilerplate-like cross-
replica overlap, a stress real corpora do exhibit. PERIOD=2 places a
salt inside EVERY 3-token window (no salt-free window exists), fully
decorrelating replicas at the shingle level - the controlled variant
for separating data-driven candidate growth from plan-structural
growth. r12's 10x measurements used PERIOD=3; keep 3 for continuity,
generate a second corpus at 2 for the control.

Row groups: DuckDB's default (~122k rows) produces SPLITTABLE files at
this size, unlike the driver's single-row-group fixtures - scan
parallelism at sfN reflects production, which is the point of the test.

Usage: python3 tools/scale_corpus.py [N] [outDir] [saltPeriod=3]
"""
import sys

import duckdb

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = "/root/testdata/sf0.1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "target/scale/sf1"
PERIOD = int(sys.argv[3]) if len(sys.argv) > 3 else 3

import os

os.makedirs(OUT, exist_ok=True)
con = duckdb.connect()
con.sql(f"SET threads TO 16")


def gen(table: str, sql: str, row_group: int = 122880) -> None:
    con.sql(f"CREATE OR REPLACE VIEW src AS SELECT * FROM '{SRC}/{table}.parquet'")
    con.sql(f"COPY ({sql}) TO '{OUT}/{table}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {row_group})")
    n = con.sql(f"SELECT count(*) FROM '{OUT}/{table}.parquet'").fetchone()[0]
    print(f"{table}: {n} rows")


reps = f"(SELECT unnest(range(0, {N})) AS r) reps"

# documents: salt every 3rd token boundary on replicas so cross-replica
# shingle/minhash/simhash similarity collapses; n_chars re-derived
gen("documents", f"""
SELECT doc_id + r * 1000000 AS doc_id,
  CASE WHEN r = 0 THEN text ELSE
    array_to_string(list_transform(string_split_regex(text, '\\s+'),
      (t, i) -> CASE WHEN i % {PERIOD} = 0
        THEN 'zz' || r || 'q' || ((hash(doc_id * 31 + i * 7 + r) % 97)::VARCHAR) || ' ' || t
        ELSE t END), ' ')
  END AS text,
  lang, source,
  CAST(length(CASE WHEN r = 0 THEN text ELSE
    array_to_string(list_transform(string_split_regex(text, '\\s+'),
      (t, i) -> CASE WHEN i % {PERIOD} = 0
        THEN 'zz' || r || 'q' || ((hash(doc_id * 31 + i * 7 + r) % 97)::VARCHAR) || ' ' || t
        ELSE t END), ' ')
  END) AS BIGINT) AS n_chars
FROM src, {reps}
""", row_group=5000)

# embeddings: replicas get a seeded per-replica DIMENSION PERMUTATION
# plus small hash-noise. A permutation decorrelates a replica from its
# original (same mechanism as the r10-r14 cyclic shift: measured
# cross-replica cosine ~0.1 vs CosTau 0.4 - additive noise alone left
# ~0.86, which would have exploded the dedup outputs quadratically for
# data reasons) while preserving the within-replica pair structure
# exactly (both members of a planted pair permute alike).
# r15 change (VERDICT r14 ask #3): the old shift i -> i + 7r lived
# mod 64, so at N > 64 replicas r and r+64 shared a shift and differed
# only by the +-0.05 noise (cosine ~0.997) - 77,297 genuine echo
# near-dups polluted the 100x recalled_cross audit. The permutation
# space is 64! per replica (keyed on r through hash), so no two
# replicas repeat a layout at any N; the RebandEval audit column is
# expected ~0 at every scale. r = 0 stays the source data verbatim.
gen("embeddings", f"""
WITH perms AS (
  SELECT r, list(i ORDER BY hash(r * 1000003 + i * 97), i) AS p
  FROM {reps}, range(1, 65) t(i)  -- harness Dim = 64
  GROUP BY r
)
SELECT vec_id + r * 1000000 AS vec_id,
  CASE WHEN r = 0 THEN embedding ELSE
    list_transform(range(1, len(embedding) + 1),
      i -> CAST(embedding[p[i]]
        + (CAST(hash(vec_id * 131 + i * 17 + r) % 1000 AS BIGINT) - 500) * 0.0001 AS FLOAT))
  END AS embedding,
  label
FROM src, perms
""", row_group=2000)

# events: id offset + deterministic sub-hour jitter; same users (Nx depth)
gen("events", f"""
SELECT event_id + r * 100000000 AS event_id,
  CASE WHEN r = 0 THEN ts
    ELSE ts + to_seconds(r * 37 + CAST(hash(event_id * 7 + r) % 601 AS BIGINT) - 300)
  END AS ts,
  user_id, event_type, value, props
FROM src, {reps}
""")

# orders/lineitem: key-offset replicas, same customers/parts (Nx depth)
gen("orders", f"""
SELECT o_orderkey + r * 100000000 AS o_orderkey, o_custkey, o_orderstatus,
  o_totalprice, o_orderdate, o_orderpriority
FROM src, {reps}
""")
gen("lineitem", f"""
SELECT l_orderkey + r * 100000000 AS l_orderkey, l_partkey, l_suppkey,
  l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
  l_returnflag, l_linestatus, l_shipdate
FROM src, {reps}
""")

for t in ["region", "nation", "customer", "supplier", "part"]:
    con.sql(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    print(f"{t}: copied")
print("done:", OUT)
