#!/usr/bin/env python3
"""Dev harness mimicking the driver's DuckDB-oracle correctness gate.

Not part of the library (the engine is pure Scala/Spark); this only
pre-validates oracle SQL before the driver's round gate runs.

Usage: python3 tools/check_correctness.py <sfDir> <verifyOutDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import sys, json, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/q*")):
        name = os.path.basename(qdir)
        spark_df = con.sql(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchdf()
        if name not in oracle:
            results[name] = f"rows-only: {len(spark_df)} rows"
            continue
        try:
            oracle_df = con.sql(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE SQL ERROR: {e}"
            continue
        s = spark_df.reindex(sorted(spark_df.columns), axis=1)
        o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
        if list(s.columns) != list(o.columns):
            results[name] = f"SCHEMA MISMATCH spark={list(s.columns)} oracle={list(o.columns)}"
            continue
        if len(s) != len(o):
            results[name] = f"ROWCOUNT MISMATCH spark={len(s)} oracle={len(o)}"
            continue
        s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
        o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
        mismatches = []
        for c in s.columns:
            sv, ov = s[c], o[c]
            try:
                eq = (sv == ov) | (sv.isna() & ov.isna())
            except Exception:
                eq = sv.astype(str) == ov.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mismatches.append(f"{c}[row{i}]: spark={sv[i]!r} oracle={ov[i]!r} "
                                  f"({int((~eq).sum())} diffs)")
        dtype_notes = [f"{c}: {s[c].dtype}!={o[c].dtype}" for c in s.columns
                       if str(s[c].dtype) != str(o[c].dtype)]
        if mismatches:
            results[name] = "VALUE MISMATCH " + "; ".join(mismatches[:3])
        elif dtype_notes:
            results[name] = "ok (dtype diff: " + ", ".join(dtype_notes) + ")"
        else:
            results[name] = "ok"
    npass = sum(1 for v in results.values() if v.startswith("ok") or v.startswith("rows-only"))
    for k, v in sorted(results.items()):
        flag = " " if v.startswith("ok") or v.startswith("rows-only") else "X"
        print(f"{flag} {k}: {v}")
    print(f"\n{npass}/{len(results)} pass")
    return 0 if npass == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
