#!/usr/bin/env python3
"""Generate a scale-probe dataset as N key-shifted replicas of a source SF.

Usage: python3 scripts/gen_scale_probe.py <srcDir> <dstDir> [replicas=10] [mode=clique]

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

Document-text modes (round-13, verdict ask #3):
  clique (default) — the historical behavior: every replica keeps the
    base text plus one per-replica token, so all R copies of a doc are
    MUTUAL near-dups. At R=10 this inflated the audited pair relation
    53x on 10x data — the decade table ends up measuring the fixture's
    designed quadratic, not the operator.
  bounded — realistic dup structure: docs with doc_id %% 20 == 0 (5%%)
    keep near-dup text in replicas 1..3 only (max clique = 4 incl.
    base, regardless of R); every other (doc, replica>0) gets GENUINELY
    NOVEL text — each whitespace token is suffixed with the row's
    globally-unique shifted doc_id, so no shingle is shared with any
    other document. Token COUNT per doc is preserved exactly (byte mass
    inflates ~2.5x from the suffixes); exact-dup fingerprints stay
    distinct as before.
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


def novel(text, doc_id: int) -> str:
    """Rewrite every whitespace token with a suffix unique to this row's
    (already-shifted, hence globally unique) doc_id: token count is
    preserved, no shingle survives, so the doc near-dups NOTHING."""
    if text is None:
        return None
    tag = f"x{doc_id:x}"
    return " ".join(t + tag for t in text.split())


def shifted(table: pa.Table, name: str, r: int, mode: str = "clique") -> pa.Table:
    for col in SHIFTS[name]:
        i = table.schema.get_field_index(col)
        arr = pc.add(table.column(i), pa.scalar(r * STRIDE,
                                                table.schema.field(i).type))
        table = table.set_column(i, table.schema.field(i), arr)
    if name == "documents" and r > 0 and mode == "clique":
        i = table.schema.get_field_index("text")
        arr = pc.binary_join_element_wise(
            pc.coalesce(table.column(i), pa.scalar("", pa.string())),
            pa.scalar(f"zr{r}", pa.string()), pa.scalar(" ", pa.string()))
        table = table.set_column(i, table.schema.field(i), arr)
    if name == "documents" and r > 0 and mode == "bounded":
        i = table.schema.get_field_index("text")
        ids = table.column(table.schema.get_field_index("doc_id")).to_pylist()
        texts = table.column(i).to_pylist()
        out = []
        for did, txt in zip(ids, texts):
            base_id = did - r * STRIDE
            if base_id % 20 == 0 and r <= 3:  # 5% dup-seeded, clique ≤ 4
                # NULL text still gets the replica marker (mirrors the
                # clique-mode coalesce) so base and replica fingerprints
                # stay distinct for exact-dup operators.
                out.append(f"zr{r}" if txt is None else f"{txt} zr{r}")
            else:
                out.append(novel(txt, did))
        arr = pa.array(out, type=table.schema.field(i).type)
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
    mode = sys.argv[4] if len(sys.argv) > 4 else "clique"
    assert mode in ("clique", "bounded"), mode
    import os
    os.makedirs(dst, exist_ok=True)
    for name in FIXED:
        t = pq.read_table(f"{src}/{name}.parquet")
        pq.write_table(t, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} (fixed)")
    for name in SHIFTS:
        t = pq.read_table(f"{src}/{name}.parquet")
        parts = [shifted(t, name, r, mode) for r in range(reps)]
        out = pa.concat_tables(parts)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {t.num_rows} -> {out.num_rows}")


if __name__ == "__main__":
    main()
