#!/usr/bin/env python3
"""Self-check harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 scripts/selfcheck.py <sfDir> <verifyOutDir> [query ...]

For each query: load the Spark parquet result and the oracle SQL result
(DuckDB over the same sfDir tables), sort columns by name and rows by all
columns, then compare values exactly. Reports per-query PASS/FAIL with a
diff preview. Queries without oracle SQL get a rows-only (>0) check.
"""
import json, sys, glob

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    df = df[sorted(df.columns)]
    # stringify for stable compare (mirrors a hash over rendered values)
    df = df.astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def materialization_canary(con):
    """Oracle-environment contract (round-13, verdict ask #8): the graph
    oracles depend on DuckDB honoring `AS MATERIALIZED` — plain CTEs are
    INLINED and re-derived per reference, which re-ran the whole minhash
    chain once per CC round and disk-killed every sf1 replay (>70 GB
    spill) until round 12's fix. Tested-good version: duckdb 1.0.0.

    Structural check (timing is useless here — DuckDB's subplan CSE
    hides re-derivation on small canaries while the real unrolled chains
    still explode): EXPLAIN of a doubly-referenced MATERIALIZED CTE must
    contain a CTE/CTE_SCAN node. On 1.0.0 the marker is present exactly
    when the hint is honored (a plain inlined CTE's plan has neither);
    if an engine upgrade silently drops the hint, this aborts loudly
    instead of letting sf1 oracle replays spill unboundedly."""
    q = ("WITH h AS MATERIALIZED (SELECT sum(x) AS s FROM range(100) t(x)) "
         "SELECT a.s + b.s FROM h a CROSS JOIN h b")
    plan = "\n".join(str(r) for r in con.execute("EXPLAIN " + q).fetchall())
    if "CTE_SCAN" not in plan:
        sys.exit(f"CANARY FAIL: duckdb {duckdb.__version__} no longer "
                 "materializes `AS MATERIALIZED` CTEs (no CTE_SCAN in the "
                 "physical plan) — the CC-family oracles will re-derive "
                 "their chains per reference and spill unboundedly; pin "
                 "duckdb back to 1.0.0 (see BASELINE.md, oracle "
                 "environment contract)")


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    materialization_canary(con)
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    qdirs = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*"))
    n_pass = n_fail = 0
    for q in qdirs:
        if only and q not in only:
            continue
        files = glob.glob(f"{out_dir}/{q}/*.parquet")
        if not files:
            print(f"NOOUT {q}: no parquet written"); n_fail += 1; continue
        got = con.execute(f"SELECT * FROM '{out_dir}/{q}/*.parquet'").df()
        if q not in oracles:
            status = "PASS(rows-only)" if len(got) > 0 else "FAIL(rows-only: empty)"
            if len(got) > 0: n_pass += 1
            else: n_fail += 1
            print(f"{status:18s} {q}: rows={len(got)}")
            continue
        try:
            exp = con.execute(oracles[q]).df()
        except Exception as e:
            print(f"FAIL  {q}: oracle SQL error: {str(e)[:200]}"); n_fail += 1; continue
        g, e = norm(got), norm(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL  {q}: columns {list(g.columns)} vs {list(e.columns)}")
            n_fail += 1; continue
        if len(g) != len(e):
            print(f"FAIL  {q}: rows {len(g)} vs {len(e)}"); n_fail += 1; continue
        if g.equals(e):
            print(f"PASS  {q}: rows={len(g)}"); n_pass += 1
        else:
            neq = (g != e).any(axis=1)
            print(f"FAIL  {q}: {int(neq.sum())}/{len(g)} rows differ")
            print("  spark:", g[neq].head(3).to_dict("records"))
            print("  oracle:", e[neq].head(3).to_dict("records"))
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
