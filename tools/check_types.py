#!/usr/bin/env python3
"""Arrow-type diff between Spark verify output and DuckDB oracle results.

The driver's hash compare is TYPE-sensitive (DuckDB widens aggregates:
sum(DECIMAL(18,2)) -> DECIMAL(38,2), sum(BIGINT) -> HUGEINT) while
check_oracle.py compares values only — run this after check_oracle.py to
catch type drift before the driver does.

Usage: check_types.py <sf_dir> <verify_out_dir>
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq


def main(sf, out):
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    sqls = json.load(open(f"{out}/oracle_sql.json"))
    bad = 0
    for name, sql in sorted(sqls.items()):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            # a missing Spark output is a failed check, not a pass — the
            # gate must not report type-identical for unchecked queries
            bad += 1
            print(f"MISSING {name}: no spark output")
            continue
        oracle_types = {f.name: str(f.type) for f in con.execute(sql).arrow().schema}
        spark_types = {f.name: str(f.type) for f in pq.read_schema(files[0])}
        diffs = {
            k: (spark_types.get(k), oracle_types.get(k))
            for k in set(oracle_types) | set(spark_types)
            if spark_types.get(k) != oracle_types.get(k)
        }
        if diffs:
            bad += 1
            print(f"TYPE-DIFF {name}: {diffs}")
        # decimal outputs of ANY scale are driver-hostile: the driver reads
        # the engine parquet via pandas (Decimal objects, str keeps
        # trailing zeros) but the oracle via duckdb .df() (float64,
        # shortest repr), so any decimal value with trailing zeros at its
        # scale hash-mismatches (round-3 repro: explains all 7 r3 hash
        # fails AND why q_star_join passed by value-luck). Ban outright.
        hostile = {
            k: t
            for side in (spark_types, oracle_types)
            for k, t in side.items()
            if t.startswith("decimal")
        }
        if hostile:
            bad += 1
            print(f"DECIMAL-OUTPUT {name}: {hostile} (driver-hostile; "
                  f"final-CAST to DOUBLE on both sides)")
    print(f"{len(sqls) - bad}/{len(sqls)} queries type-identical")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
