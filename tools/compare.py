#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify output
against the DuckDB oracle on the same parquet tables and diff values.

Usage: python3 tools/compare.py /root/testdata/sf0.01 /tmp/verify_out
"""
import sys, os, json, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(df):
    # sort columns by name, then rows by all values — order-insensitive diff
    df = df[sorted(df.columns)]
    df = df.sort_values(by=sorted(df.columns)).reset_index(drop=True)
    return df

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        spark_dir = f"{outdir}/{name}"
        files = glob.glob(f"{spark_dir}/*.parquet")
        if not files:
            print(f"MISSING  {name}: no spark output"); failures += 1; continue
        try:
            got = norm(con.execute(
                f"SELECT * FROM read_parquet({files!r})").fetchdf())
            want = norm(con.execute(sql).fetchdf())
        except Exception as e:
            print(f"ERROR    {name}: {e}"); failures += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"SCHEMA   {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            failures += 1; continue
        if len(got) != len(want):
            print(f"ROWS     {name}: spark={len(got)} oracle={len(want)}")
            failures += 1; continue
        if [str(d) for d in got.dtypes] != [str(d) for d in want.dtypes]:
            print(f"DTYPES   {name}: spark={list(map(str, got.dtypes))} "
                  f"oracle={list(map(str, want.dtypes))}")
            failures += 1; continue
        eq = got.equals(want)
        if not eq:
            # tolerate float repr wobble: compare with value-level check
            diff = (got != want) & ~(got.isna() & want.isna())
            ndiff = int(diff.values.sum())
            print(f"VALUES   {name}: {ndiff} differing cells")
            mism = diff.any(axis=1)
            print(got[mism].head(3)); print(want[mism].head(3))
            failures += 1
        else:
            print(f"OK       {name} ({len(got)} rows)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
