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

Usage: make_sf.py SRC_DIR OUT_DIR [N_REPS=10]
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


def rep_table(con, src, out, table, n_reps):
    offs = OFFSETS[table]
    parts = []
    for r in range(n_reps):
        repl = ", ".join(f"({c} + {r * o}) AS {c}" for c, o in offs.items())
        parts.append(
            f"SELECT * REPLACE ({repl}) FROM read_parquet('{src}/{table}.parquet')")
    con.execute(
        f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{table}.parquet' (FORMAT PARQUET)")


def rep_documents(con, src, out, n_reps):
    parts = []
    for r in range(n_reps):
        if r == 0:
            parts.append(f"SELECT * FROM read_parquet('{src}/documents.parquet')")
        else:
            parts.append(f"""
              SELECT doc_id + {r * 10_000_000} AS doc_id,
                array_to_string(list_transform(string_split(text, ' '),
                  t -> 'x{r}' || t), ' ') AS text,
                lang, source,
                length(array_to_string(list_transform(string_split(text, ' '),
                  t -> 'x{r}' || t), ' ')) AS n_chars
              FROM read_parquet('{src}/documents.parquet')""")
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


def rep_events(src, out, n_reps):
    t = pq.read_table(f"{src}/events.parquet")
    reps = []
    for r in range(n_reps):
        cols = {name: t.column(name) for name in t.column_names}
        cols["event_id"] = pc.add(cols["event_id"], r * 10_000_000)
        cols["user_id"] = pc.add(cols["user_id"], r * 1_000_000)
        reps.append(pa.table(cols))
    merged = pa.concat_tables(reps)
    assert merged.schema.field("ts").type == pa.timestamp("ns"), \
        "events.ts must stay timestamp[ns] for the engine's nanosAsLong path"
    pq.write_table(merged, f"{out}/events.parquet")


def main():
    src, out = sys.argv[1], sys.argv[2]
    n_reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in OFFSETS:
        rep_table(con, src, out, table, n_reps)
        print(f"[make_sf] {table}: replicated x{n_reps}")
    rep_documents(con, src, out, n_reps)
    print(f"[make_sf] documents: replicated x{n_reps} (token-prefixed)")
    rep_embeddings(con, src, out, n_reps)
    print(f"[make_sf] embeddings: replicated x{n_reps} (jittered)")
    rep_events(src, out, n_reps)
    print(f"[make_sf] events: replicated x{n_reps} (timestamp[ns] kept)")


if __name__ == "__main__":
    main()
