#!/usr/bin/env python3
"""Multiply the driver testdata by N copies with per-copy key offsets.

Usage: python3 tools/scale_up.py SRC_DIR DST_DIR COPIES

Follows the ScaleProbe.scala multiplication scheme (see VERDICT r5 #1):
each copy c gets every key column shifted by c*STRIDE so primary keys
stay unique and every FK relationship (orders->customer,
lineitem->orders/part/supplier) lands on the matching shifted copy.
Dimension tables (region, nation) are NOT multiplied — at 100 TB the
dims stay broadcast-size while facts grow, which is exactly the shape
this scaled corpus should reproduce.

Schema is preserved exactly via pyarrow (events keeps timestamp[ns],
embeddings keeps list<float>), so graft.Engine.registerTables and the
DuckDB oracle read the result identically to the driver-generated dirs.
"""
import sys
import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

STRIDE = 10_000_000  # > every key in sf0.1 (max o_orderkey ~600k)

# table -> key columns to offset per copy
KEYS = {
    "region": None,            # dim: single copy
    "nation": None,            # dim: single copy
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def multiply(src, dst, table, copies):
    t = pq.read_table(f"{src}/{table}.parquet")
    # drop pandas metadata; keep field types exactly
    schema = t.schema.remove_metadata()
    t = t.cast(schema)
    keys = KEYS[table]
    # stream copy-by-copy through a ParquetWriter: peak memory stays at
    # ~2x one copy, so x1000 facts (600M lineitem rows) fit comfortably.
    # Bounded row groups so Spark gets split parallelism on the big facts.
    n_out = 0
    with pq.ParquetWriter(f"{dst}/{table}.parquet", schema) as w:
        for c in range(copies if keys is not None else 1):
            if c == 0 or keys is None:
                part = t
            else:
                cols = []
                for name in schema.names:
                    col = t.column(name)
                    if name in keys:
                        col = pc.add(col, pa.scalar(c * STRIDE, type=schema.field(name).type))
                    cols.append(col)
                part = pa.table(cols, schema=schema)
            w.write_table(part, row_group_size=262_144)
            n_out += part.num_rows
    print(f"{table}: {t.num_rows} -> {n_out} rows", flush=True)


def disk_guard(src, dst, copies):
    """Fail fast if the corpus won't fit (VERDICT r9 #7).

    Projection: every fact table grows by `copies`, dims stay single-copy.
    Require free >= 2x projection so concurrent dumps/sweeps keep headroom;
    the round-9 ENOSPC killed two Verify dumps mid-write and cost the round
    its headline artifact.
    """
    import os
    import shutil
    proj = 0
    for table, keys in KEYS.items():
        sz = os.path.getsize(f"{src}/{table}.parquet")
        proj += sz * (copies if keys is not None else 1)
    free = shutil.disk_usage(dst).free
    if free < 2 * proj:
        sys.exit(
            f"[scale_up] ABORT: projected corpus ~{proj / 1e9:.1f} GB but only "
            f"{free / 1e9:.1f} GB free (< 2x headroom). Remedy: delete a stale "
            "regenerable corpus or dump dir under /root/scale (this script "
            "rebuilds any corpus in minutes), or pick a smaller COPIES.")


def main():
    src, dst, copies = sys.argv[1], sys.argv[2], int(sys.argv[3])
    import os
    os.makedirs(dst, exist_ok=True)
    disk_guard(src, dst, copies)
    for table in KEYS:
        multiply(src, dst, table, copies)


if __name__ == "__main__":
    main()
