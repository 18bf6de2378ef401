#!/usr/bin/env python3
"""Synthesize a larger scale-factor fixture from an existing sf dir by
FK-consistent replication (driver-side tooling; the engine never sees
this script). Layout matches /root/testdata/sf*: one parquet per table.

Replication rules (nReps copies, replica r):
  - TPC-H keys get disjoint offsets (orders +1e7, customer/supplier/part
    +1e6, nation/region +1e3) so every copy's FK graph is internally
    consistent and copies never collide — the same offsets tools/Stress
    uses.
  - documents: doc_id +1e7; replicas r>0 prefix every token with "x<r>"
    so cross-replica shingle sets are DISJOINT (near-dup structure
    scales linearly instead of exploding quadratically with exact
    copies); n_chars recomputed from the new text.
  - embeddings: vec_id +1e7; replicas r>0 ROTATE the vector elements by
    r positions — preserves the element distribution, norms, and cell
    occupancy exactly while making replicas of the same base vector
    mutually near-orthogonal, so cross-replica near-dup structure stays
    EMPTY (like the disjoint token prefixes) and pair counts scale
    linearly. (A first attempt used scale+shift jitter; the +0.05r·1
    shift pulled every high-r replica toward the all-ones direction and
    made ~80% of the corpus mutually cosine-similar — 120M verified
    near-dup pairs. Perturbations of similarity fixtures must preserve
    SPREAD, not just break exact equality.)
  - events: event_id +1e7, user_id +1e6; ts kept (timestamp[ns] — the
    engine's nanosAsLong read path needs the NANOS annotation, so this
    table is copied via pyarrow, not DuckDB).

Replica 0 is bit-identical to the source, so fixed-id query semantics
(doc_id < 200 rigs, vec_id < 16 centroids) read the same rows at every
scale.

Organic-skew mode (--skew, replicas r > 0 only; replica 0 stays
bit-identical so fixed-id rigs read the same rows):
  - documents: Zipf-ish length tail — text repeated 8x for ~1% of docs,
    4x for ~7%, 2x for ~18% (deterministic by doc_id), n_chars
    recomputed. Long docs stress winnowing/shingling/BPE with a
    realistic work distribution instead of uniform lengths.
  - orders: 30% of each replica's orders collapse onto 3 hot customers
    (o_orderkey % 10 < 3 → custkey 1..3 of the replica) — hot join keys
    for the orders⋈customer tier, AQE skew-split territory.
  - customer: 60% of each replica's customers move to one hot nation —
    a heavy-hitter object value for the BGP/graph tier.
  - events: 30% of each replica's events collapse onto 5 hot users —
    hot stream-join and sessionization keys.
  All rules are seeded by ids (no RNG), so reruns are byte-stable and
  the DuckDB oracle sees exactly the same files.

Usage: make_sf.py SRC_DIR OUT_DIR [N_REPS=10] [--skew]
"""
import sys

import duckdb
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

OFFSETS = {
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "customer": {"c_custkey": 1_000_000, "c_nationkey": 1_000},
    "supplier": {"s_suppkey": 1_000_000, "s_nationkey": 1_000},
    "nation": {"n_nationkey": 1_000, "n_regionkey": 1_000},
    "region": {"r_regionkey": 1_000},
    "part": {"p_partkey": 1_000_000},
    "lineitem": {"l_orderkey": 10_000_000, "l_partkey": 1_000_000,
                 "l_suppkey": 1_000_000},
}


def rep_table(con, src, out, table, n_reps, skew=False):
    offs = OFFSETS[table]
    parts = []
    for r in range(n_reps):
        repl = {c: f"({c} + {r * o})" for c, o in offs.items()}
        if skew and r > 0 and table == "orders":
            # 30% of every skewed replica's orders hit base customer 1
            # (exists in replica 0, so the FK holds): ONE globally hot
            # key. Per-replica hot keys hash-spread across the shuffle
            # partitions and no partition ever reaches the AQE skew
            # factor (5x median) — the hot key count must stay far
            # below the partition count for a partition to go hot.
            repl["o_custkey"] = (
                f"(CASE WHEN o_orderkey % 10 < 3 THEN {-r * 1_000_000 + 1} "
                f"ELSE o_custkey END + {r * 1_000_000})")
        if skew and r > 0 and table == "customer":
            # 60% of the replica's customers move to one hot nation
            repl["c_nationkey"] = (
                f"(CASE WHEN c_custkey % 5 < 3 THEN 0 "
                f"ELSE c_nationkey END + {r * 1_000})")
        rs = ", ".join(f"{e} AS {c}" for c, e in repl.items())
        parts.append(
            f"SELECT * REPLACE ({rs}) FROM read_parquet('{src}/{table}.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")


def rep_documents(con, src, out, n_reps, skew=False):
    parts = []
    for r in range(n_reps):
        if r == 0:
            parts.append(f"SELECT * FROM read_parquet('{src}/documents.parquet')")
        else:
            # Factor keyed on the FIRST TOKEN's hash, not doc_id: planted
            # near-dup twins share their first tokens, so both members of
            # a pair repeat identically and pairwise Jaccard is preserved.
            # doc_id-keyed factors created (repeated, unrepeated) twin
            # pairs at J≈0.69 — inside MinHash-LSH's ~2% miss band, which
            # broke the corpus's LSH ≡ exact contract (2 missed pairs at
            # sf1). Skew rules must respect fixture CONTRACTS (the J gap
            # around the s-curve midpoint), not just spread work.
            # Short docs are exempt: a repeat seam contributes ~2 novel
            # shingles per side, which on a 10-14-token doc's ~11-shingle
            # set knocks twin Jaccard from ~0.9 to ~0.65 — into LSH's
            # miss band. On ≥30-token docs the seam is noise.
            rep = ("CASE WHEN len(string_split(text, ' ')) < 30 THEN 1 "
                   "WHEN CAST('0x' || substr(md5(string_split(text, ' ')[1]), 1, 2) AS INTEGER) % 100 < 1 THEN 8 "
                   "WHEN CAST('0x' || substr(md5(string_split(text, ' ')[1]), 1, 2) AS INTEGER) % 100 < 8 THEN 4 "
                   "WHEN CAST('0x' || substr(md5(string_split(text, ' ')[1]), 1, 2) AS INTEGER) % 100 < 26 THEN 2 "
                   "ELSE 1 END") if skew else "1"
            parts.append(f"""
              SELECT doc_id + {r * 10_000_000} AS doc_id,
                t2 AS text, lang, source, length(t2) AS n_chars
              FROM (
                SELECT *, CASE WHEN m = 1 THEN t1 ELSE
                    array_to_string(list_transform(range(m), i -> t1), ' ')
                  END AS t2
                FROM (
                  SELECT *,
                    array_to_string(list_transform(string_split(text, ' '),
                      t -> 'x{r}' || t), ' ') AS t1,
                    {rep} AS m
                  FROM read_parquet('{src}/documents.parquet')))""")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/documents.parquet' (FORMAT PARQUET)")


def rep_embeddings(con, src, out, n_reps):
    parts = []
    for r in range(n_reps):
        if r == 0:
            parts.append(f"SELECT * FROM read_parquet('{src}/embeddings.parquet')")
        else:
            # rotate elements by r positions: same values in a different
            # order — distribution/norm/cell-occupancy preserved, replica
            # directions mutually near-orthogonal (see module docstring)
            parts.append(f"""
              SELECT vec_id + {r * 10_000_000} AS vec_id,
                CAST(list_concat(embedding[{r + 1}:],
                  embedding[1:{r}]) AS FLOAT[]) AS embedding,
                label
              FROM read_parquet('{src}/embeddings.parquet')""")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/embeddings.parquet' (FORMAT PARQUET)")


def rep_events(src, out, n_reps, skew=False):
    t = pq.read_table(f"{src}/events.parquet")
    reps = []
    for r in range(n_reps):
        cols = {name: t.column(name) for name in t.column_names}
        cols["event_id"] = pc.add(cols["event_id"], r * 10_000_000)
        uid = cols["user_id"]
        if skew and r > 0:
            # 30% of the replica's events collapse onto 5 hot users
            # (pyarrow.compute has no modulo kernel — emulate with
            # truncated integer division)
            eid = t.column("event_id").combine_chunks()

            def imod(arr, m):
                q = pc.divide(arr, m)  # integer divide truncates
                return pc.subtract(arr, pc.multiply(q, m))
            hot = pc.less(imod(eid, 10), 3)
            uid = pc.if_else(hot, imod(eid, 5), uid.combine_chunks())
        cols["user_id"] = pc.add(uid, r * 1_000_000)
        reps.append(pa.table(cols))
    merged = pa.concat_tables(reps)
    # the engine reads ts through Events.withTsUs, which handles BOTH
    # fixture encodings (nanos-long and timestamp[us]) — what matters is
    # that replication preserves whichever encoding the source uses, so
    # the replica exercises the same read path as the original
    src_ts = t.schema.field("ts").type
    assert merged.schema.field("ts").type == src_ts, \
        f"events.ts changed type under replication: {src_ts} -> " \
        f"{merged.schema.field('ts').type}"
    pq.write_table(merged, f"{out}/events.parquet")


def main():
    skew = "--skew" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--skew"]
    src, out = args[0], args[1]
    n_reps = int(args[2]) if len(args) > 2 else 10
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    tag = " +skew" if skew else ""
    for table in OFFSETS:
        rep_table(con, src, out, table, n_reps, skew)
        print(f"[make_sf] {table}: replicated x{n_reps}{tag}")
    rep_documents(con, src, out, n_reps, skew)
    print(f"[make_sf] documents: replicated x{n_reps} (token-prefixed{tag})")
    rep_embeddings(con, src, out, n_reps)
    print(f"[make_sf] embeddings: replicated x{n_reps} (rotated)")
    rep_events(src, out, n_reps, skew)
    print(f"[make_sf] events: replicated x{n_reps} (source ts type kept{tag})")


if __name__ == "__main__":
    main()
