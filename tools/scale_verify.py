#!/usr/bin/env python3
"""Dev-side oracle re-check for the scale-stress harness (round-9
verdict item 1: "DuckDB oracle re-checked at sf1 for at least the
graph and dedup families").

Usage: scale_verify.py <verifyOutDir> <scaledDataDir> [query ...]

<verifyOutDir> is a graft.Verify dump made against <scaledDataDir>
(each query's Spark result as <name>/ parquet + oracle_sql.json).
For every dumped query this runs the SAME oracle SQL in DuckDB over
the amplified tables and compares row count + exact multiset
equality (EXCEPT ALL both ways) with columns aligned by sorted name,
mirroring the driver's compare semantics. Intended for the
integer-exact families (graph/dedup/vocab/tpch); float-summing
queries may differ in the last ulp and are not the target.

This is a DEV TOOL, not part of the library: it runs on the
driver-side python (duckdb) stack, never imported by Scala code.
"""
import duckdb
import glob
import json
import sys

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    out_dir, data_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        src = f"{data_dir}/{t}.parquet"
        pat = src if glob.glob(src) and not glob.glob(f"{src}/*.parquet") \
            else f"{src}/*.parquet"
        if t == "events":
            # ScaleData writes ts as BIGINT epoch-ns (the Tables
            # contract); the oracles were written against the
            # fixture's TIMESTAMP[us] read — restore that type here
            con.execute(
                f"CREATE VIEW events AS SELECT * REPLACE "
                f"(make_timestamp(ts // 1000) AS ts) "
                f"FROM read_parquet('{pat}')")
        else:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{pat}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = checked = 0
    for name in sorted(oracle):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            continue
        checked += 1
        try:
            cols = [d[0] for d in con.execute(
                f"SELECT * FROM read_parquet('{spark_glob}') LIMIT 0"
            ).description]
            collist = ", ".join(f'"{c}"' for c in sorted(cols))
            con.execute(f"CREATE OR REPLACE TEMP VIEW _s AS "
                        f"SELECT {collist} FROM read_parquet('{spark_glob}')")
            con.execute(f"CREATE OR REPLACE TEMP VIEW _o AS "
                        f"SELECT {collist} FROM ({oracle[name]})")
            ns = con.execute("SELECT count(*) FROM _s").fetchone()[0]
            no = con.execute("SELECT count(*) FROM _o").fetchone()[0]
            diff = con.execute(
                "SELECT count(*) FROM ("
                "(SELECT * FROM _s EXCEPT ALL SELECT * FROM _o) "
                "UNION ALL "
                "(SELECT * FROM _o EXCEPT ALL SELECT * FROM _s))"
            ).fetchone()[0]
            ok = ns == no and diff == 0
            print(f"{'PASS' if ok else 'FAIL'} {name}: "
                  f"spark={ns} oracle={no} diff_rows={diff}")
            fails += 0 if ok else 1
        except Exception as e:  # noqa: BLE001 — report and keep going
            print(f"ERROR {name}: {str(e).splitlines()[0][:300]}")
            fails += 1
    print(f"checked={checked} failed={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
