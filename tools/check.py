#!/usr/bin/env python3
"""Local pre-flight mirror of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<query>/ parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB against the
same sfDir parquet tables, and compares as sorted multisets (columns
sorted by name, rows sorted, exact value equality).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    for qdir in sorted(glob.glob(os.path.join(out_dir, "*"))):
        if not os.path.isdir(qdir):
            continue
        name = os.path.basename(qdir)
        try:
            ours = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").fetchdf()
        except Exception as e:
            results[name] = f"READ_FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows_only rows={len(ours)}" + \
                (" EMPTY!" if len(ours) == 0 else "")
            continue
        try:
            ref = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            results[name] = f"ORACLE_FAIL {e}"
            continue
        ours = ours.reindex(sorted(ours.columns), axis=1)
        ref = ref.reindex(sorted(ref.columns), axis=1)
        if list(ours.columns) != list(ref.columns):
            results[name] = f"SCHEMA_MISMATCH ours={list(ours.columns)} ref={list(ref.columns)}"
            continue
        if len(ours) != len(ref):
            results[name] = f"ROWCOUNT ours={len(ours)} ref={len(ref)}"
            continue
        o = ours.sort_values(by=list(ours.columns), ignore_index=True)
        r = ref.sort_values(by=list(ref.columns), ignore_index=True)
        same_types = [str(a) for a in o.dtypes] == [str(a) for a in r.dtypes]
        try:
            eq = o.equals(r)
            if not eq:
                # tolerate dtype-representation differences, compare values
                eq = (o.astype(str).values == r.astype(str).values).all()
        except Exception as e:
            eq = False
        results[name] = ("OK" if eq else "VALUE_MISMATCH") + \
            ("" if same_types else f" (dtypes ours={[str(a) for a in o.dtypes]} ref={[str(a) for a in r.dtypes]})")
        if results[name].startswith("VALUE_MISMATCH"):
            diff = (o.astype(str).values != r.astype(str).values)
            idx = diff.any(axis=1).nonzero()[0][:3]
            for i in idx:
                results[name] += f"\n    ours: {o.iloc[i].to_dict()}\n    ref:  {r.iloc[i].to_dict()}"
    bad = 0
    for k in sorted(results):
        status = results[k]
        flag = "PASS" if status.startswith(("OK", "rows_only rows=")) and "EMPTY" not in status else "FAIL"
        if flag == "FAIL":
            bad += 1
        print(f"[{flag}] {k}: {status}")
    print(f"\n{len(results) - bad}/{len(results)} pass")
    sys.exit(1 if bad else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
