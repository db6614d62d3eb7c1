#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet dump (written by graft.Verify),
runs the matching oracle SQL from oracle_sql.json in DuckDB with views over
<sfDir>/*.parquet, and compares: column names (sorted), row counts, and the
multiset of row values (columns sorted by name, rows sorted).

NOT part of the shipped library — verification harness only.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # driver-style value hash: exact repr of the double
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return [c for c in sorted(cols)], out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    failures = []
    for name, sql in sorted(oracle.items()):
        dump = Path(out_dir) / name
        if not dump.exists():
            failures.append((name, "spark dump missing"))
            print(f"FAIL {name}: spark dump missing")
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{dump}/*.parquet'")
            s_cols, s_rows = norm_rows(spark_rel.columns, spark_rel.fetchall())
            duck_rel = con.sql(sql)
            d_cols, d_rows = norm_rows(duck_rel.columns, duck_rel.fetchall())
        except Exception as e:  # noqa: BLE001
            failures.append((name, str(e)))
            print(f"FAIL {name}: {e}")
            continue
        if s_cols != d_cols:
            failures.append((name, f"columns {s_cols} != {d_cols}"))
            print(f"FAIL {name}: columns spark={s_cols} duck={d_cols}")
        elif len(s_rows) != len(d_rows):
            failures.append((name, f"rows {len(s_rows)} != {len(d_rows)}"))
            print(f"FAIL {name}: rowcount spark={len(s_rows)} duck={len(d_rows)}")
        elif s_rows != d_rows:
            diff = next(i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b)
            failures.append((name, "value mismatch"))
            print(f"FAIL {name}: first diff at sorted row {diff}:")
            print(f"  spark: {s_rows[diff]}")
            print(f"  duck : {d_rows[diff]}")
        else:
            print(f"OK   {name}: {len(s_rows)} rows")

    print(f"\n{len(oracle) - len(failures)}/{len(oracle)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
