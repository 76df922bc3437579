#!/usr/bin/env python3
"""Synthesize a larger scale factor from an existing testdata dir by
replicating each table `factor` times with shifted keys (foreign keys shift
consistently, so join cardinalities scale linearly). Copy 0 is byte-identical
to the source, so fixed-id SF gates (doc_id < 6000, vec_id caps) cover
exactly the original rows and stay constant-cost at any factor.

Documents get a per-copy suffix token (" repN") so replicas are NEAR-dups,
not exact dups — the realistic shape for the dedup pipelines. Timestamps are
written with pyarrow version 2.6 and no coercion so the events table keeps
the source's physical encoding exactly (int64-nanos or microsecond
timestamps, depending on testdata generation — the engine adapts via
QueryDef.eventsMicros either way).

Usage: make_scale.py <src_dir> <dst_dir> <factor>
"""
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# per-table key columns to shift by copy_index * stride (stride chosen far
# above any real key so copies never collide)
SHIFTS = {
    "customer": {"c_custkey": 10**7},
    "supplier": {"s_suppkey": 10**7},
    "part": {"p_partkey": 10**7},
    "orders": {"o_orderkey": 10**8, "o_custkey": 10**7},
    "lineitem": {"l_orderkey": 10**8, "l_partkey": 10**7, "l_suppkey": 10**7},
    "events": {"event_id": 10**9, "user_id": 10**9},
    "documents": {"doc_id": 10**5},
    "embeddings": {"vec_id": 10**5},
}
# tiny dimension tables keep their single copy (as in TPC-H, region/nation
# do not scale with SF)
FIXED = {"region", "nation"}


def scale_table(name, src, dst, factor):
    table = pq.read_table(f"{src}/{name}.parquet")
    if name in FIXED or factor <= 1:
        copies = [table]
    else:
        copies = [table]
        for k in range(1, factor):
            cols = {}
            for field in table.schema:
                col = table[field.name]
                shift = SHIFTS.get(name, {}).get(field.name)
                if shift is not None:
                    col = pc.add(col, pa.scalar(k * shift, type=field.type))
                elif name == "documents" and field.name == "text":
                    col = pc.binary_join_element_wise(
                        pc.cast(col, pa.string()), f" rep{k}", "")
                elif name == "documents" and field.name == "n_chars":
                    col = pc.add(col, pa.scalar(len(f" rep{k}"),
                                                type=field.type))
                cols[field.name] = col
            copies.append(pa.table(cols, schema=table.schema))
    out = pa.concat_tables(copies)
    pq.write_table(out, f"{dst}/{name}.parquet", version="2.6",
                   coerce_timestamps=None, use_deprecated_int96_timestamps=False)
    print(f"{name}: {table.num_rows} -> {out.num_rows}")


def main(src, dst, factor):
    import os
    os.makedirs(dst, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        scale_table(t, src, dst, factor)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
