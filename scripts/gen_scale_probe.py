#!/usr/bin/env python3
"""Generate a scale-probe dataset as N key-shifted replicas of a source SF.

Usage: python3 scripts/gen_scale_probe.py <srcDir> <dstDir> [replicas=10]

Dev-side tool (like selfcheck.py): builds probe data for differential and
bench runs at a decade above the largest driver-generated SF. NOT a
substitute for driver testdata — distributions are replica-cloned, not
re-sampled. Per replica r: every key domain is shifted by r*STRIDE
(referential integrity preserved: custkey/orderkey/user_id/doc_id/vec_id
move together), document text gains a per-replica token (so fingerprints
stay distinct and dedup rates keep their designed per-replica values),
and embeddings perturb dim 0 by r/1000 (distinct on the e3 grid).
region/nation are fixed dimensions and copy once. Schemas are preserved
exactly (pyarrow passthrough), including events.ts TIMESTAMP(NANOS).
"""
import sys

import pyarrow as pa
import pyarrow.parquet as pq
import pyarrow.compute as pc

STRIDE = 10_000_000

SHIFTS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
FIXED = ["region", "nation"]


def shifted(table: pa.Table, name: str, r: int) -> pa.Table:
    for col in SHIFTS[name]:
        i = table.schema.get_field_index(col)
        arr = pc.add(table.column(i), pa.scalar(r * STRIDE,
                                                table.schema.field(i).type))
        table = table.set_column(i, table.schema.field(i), arr)
    if name == "documents" and r > 0:
        i = table.schema.get_field_index("text")
        arr = pc.binary_join_element_wise(
            pc.coalesce(table.column(i), pa.scalar("", pa.string())),
            pa.scalar(f"zr{r}", pa.string()), pa.scalar(" ", pa.string()))
        table = table.set_column(i, table.schema.field(i), arr)
    if name == "embeddings" and r > 0:
        i = table.schema.get_field_index("embedding")
        col = table.column(i).combine_chunks()
        lists = col.to_pylist()
        for row in lists:
            if row:
                row[0] = row[0] + r / 1000.0
        arr = pa.array(lists, type=table.schema.field(i).type)
        table = table.set_column(i, table.schema.field(i), arr)
    return table


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    import os
    os.makedirs(dst, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} (fixed)")
    for name in SHIFTS:
        t = pq.read_table(f"{src}/{name}.parquet")
        parts = [shifted(t, name, r) for r in range(reps)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
