#!/usr/bin/env python3
"""Dev-only harness (NOT engine code): mirrors the driver's correctness
gate. Reads the parquet dumps produced by graft.Verify, runs each
oracle_sql.json entry in DuckDB over the same testdata parquet, and
compares the way the DRIVER does — through pandas — so physical-type
skew is caught, not hidden:

  * spark side:  pd.read_parquet(dump)      (pyarrow types)
  * oracle side: duckdb.sql(sql).df()       (duckdb→pandas types)

Lessons baked in (round 2 found these the hard way):
  * DuckDB materializes DECIMAL as float64; pyarrow materializes
    parquet decimal as object(Decimal) — ANY decimal output column
    mismatches in the driver regardless of precision. Final numeric
    outputs must be DOUBLE on both sides (sum in exact decimal first).
  * Spark writes TimestampType as legacy INT96 → pandas datetime64[ns];
    source TIMESTAMP_NTZ → datetime64[us]. Output timestamps must be NTZ.
  * list/array cells (numpy.ndarray) are unhashable in the driver's
    pandas sort — outputs must be scalar columns only.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]
"""
import glob
import json
import math
import sys
from collections import Counter
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def cell_key(v):
    """Type-aware canonical key, tuned to what the driver tolerates
    (verified against CORRECTNESS_r02): integer WIDTH skew and
    date-vs-midnight-timestamp skew pass; Decimal-vs-float and array
    cells fail. So ints collapse to int, date/datetime collapse to an
    isoformat instant, but Decimal stays distinct from float."""
    if v is None:
        return ("null",)
    if isinstance(v, float) and math.isnan(v):
        return ("null",)
    if isinstance(v, np.ndarray) or isinstance(v, (list, tuple)):
        raise TypeError("array cell in output (driver comparator chokes on these)")
    t = type(v).__name__
    if t in ("float64", "float32", "float"):
        return ("float", repr(float(v)))
    if t in ("int64", "int32", "int16", "int8", "int", "uint64", "uint32"):
        return ("int", int(v))
    if t == "Decimal":
        return ("Decimal", str(v))  # deliberately distinct from float
    if hasattr(v, "isoformat"):
        iso = v.isoformat()
        if len(iso) == 10:  # plain date → midnight instant
            iso += "T00:00:00"
        return ("dt", iso)
    if t in ("bool", "bool_"):
        return ("bool", bool(v))
    return (t, v if isinstance(v, (str, bytes)) else repr(v))


def frame_key(df):
    cols = sorted(df.columns)
    rows = Counter()
    for r in df[cols].itertuples(index=False, name=None):
        rows[tuple(cell_key(v) for v in r)] += 1
    return rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.loads(Path(out_dir, "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        try:
            parts = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
            sdf = pd.concat([pd.read_parquet(p) for p in parts], ignore_index=True)
            ddf = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: exception {e}")
            n_fail += 1
            continue
        scols, dcols = sorted(sdf.columns), sorted(ddf.columns)
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            n_fail += 1
            continue
        skew = {c: (str(sdf[c].dtype), str(ddf[c].dtype)) for c in scols
                if str(sdf[c].dtype) != str(ddf[c].dtype)}
        if skew:
            print(f"  note {name}: dtype skew (driver-tolerated kinds ok) {skew}")
        if len(sdf) != len(ddf):
            print(f"FAIL {name}: rowcount {len(sdf)} vs {len(ddf)}")
            n_fail += 1
            continue
        try:
            a, b = frame_key(sdf), frame_key(ddf)
        except TypeError as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if a != b:
            only_a = list((a - b).keys())[:2]
            only_b = list((b - a).keys())[:2]
            print(f"FAIL {name}: value mismatch, spark-only={only_a} duck-only={only_b}")
            n_fail += 1
            continue
        print(f"PASS {name} ({len(sdf)} rows)")
        n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
