#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
over <sfDir>/*.parquet, load the Spark result parquet, sort columns by
name, and compare row-by-row values (the driver hashes canonicalized
values; we diff directly so mismatches are debuggable).
"""
import sys, json, glob, os
import duckdb

# Output-column types that canonicalize differently between the two
# engines' client stacks (round-1 driver gate: every DECIMAL-emitting
# query hash-mismatched; DuckDB SUM(BIGINT) -> HUGEINT did too).
# Queries must surface DOUBLE/BIGINT/STRING/TIMESTAMP instead.
RISKY_DUCK = ("DECIMAL", "HUGEINT", "DATE")

def spark_type_lint(spark_files):
    """Schema risks in a Spark result, oracled or not: DECIMAL/DATE
    canonicalize differently across engines; ARRAY/STRUCT/MAP columns
    crash the driver's pandas sort outright (round-2 stats_quantiles:
    'unhashable type: numpy.ndarray' — and it had no oracle, so only
    an all-outputs lint can catch that class)."""
    import pyarrow.parquet as pq
    risky = []
    for f in pq.read_schema(spark_files[0]):
        t = str(f.type)
        if t.startswith(("decimal", "date", "list", "large_list",
                         "struct", "map", "fixed_size_list")):
            risky.append(f"spark {f.name}:{t}")
    return risky

def type_lint(con, name, sql, spark_files):
    risky = spark_type_lint(spark_files)
    for row in con.execute(f"DESCRIBE {sql}").fetchall():
        if any(k in row[1] for k in RISKY_DUCK) or row[1].endswith("[]"):
            risky.append(f"oracle {row[0]}:{row[1]}")
    return risky

def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return str(v)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        spark_glob = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_glob:
            print(f"[MISS] {name}: no spark result parquet")
            n_bad += 1
            continue
        try:
            or_rel = con.execute(sql)
            oracle_cols = [d[0] for d in or_rel.description]
            oracle_rows = or_rel.fetchall()
        except Exception as e:
            print(f"[ORACLE-ERR] {name}: {e}")
            n_bad += 1
            continue
        sp_rel = con.execute(
            f"SELECT * FROM read_parquet({spark_glob!r})")
        spark_cols = [d[0] for d in sp_rel.description]
        spark_rows = sp_rel.fetchall()
        # driver semantics: sort columns by name, then hash values
        o_idx = sorted(range(len(oracle_cols)), key=lambda i: oracle_cols[i])
        s_idx = sorted(range(len(spark_cols)), key=lambda i: spark_cols[i])
        if sorted(oracle_cols) != sorted(spark_cols):
            print(f"[SCHEMA] {name}: oracle={sorted(oracle_cols)} spark={sorted(spark_cols)}")
            n_bad += 1
            continue
        o_canon = [tuple(canon(r[i]) for i in o_idx) for r in oracle_rows]
        s_canon = [tuple(canon(r[i]) for i in s_idx) for r in spark_rows]
        risky = type_lint(con, name, sql, spark_glob)
        if risky:
            print(f"[TYPE] {name}: driver-hash-risky output types: {risky}")
            n_bad += 1
        elif o_canon == s_canon:
            print(f"[OK]   {name}: {len(o_canon)} rows")
            n_ok += 1
        else:
            print(f"[DIFF] {name}: oracle {len(o_canon)} rows, spark {len(s_canon)} rows")
            for i, (a, b) in enumerate(zip(o_canon, s_canon)):
                if a != b:
                    print(f"   first diff at row {i}:\n   oracle: {a}\n   spark:  {b}")
                    break
            n_bad += 1
    # rows-only queries (no oracle) still flow through the driver's
    # canonicalizer — lint their schemas too
    for d in sorted(os.listdir(out_dir)):
        if d in oracle or not os.path.isdir(os.path.join(out_dir, d)):
            continue
        files = glob.glob(os.path.join(out_dir, d, "*.parquet"))
        risky = spark_type_lint(files) if files else []
        if risky:
            print(f"[TYPE] {d}: driver-hash-risky output types: {risky}")
            n_bad += 1
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)

if __name__ == "__main__":
    main()
