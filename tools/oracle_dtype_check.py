#!/usr/bin/env python3
"""Oracle dtype guard: run every registered oracle SQL in DuckDB against a
(small) SF dir and flag any result column whose type the driver's value
hash canonicalizes differently from Spark's parquet dump — HUGEINT and
wide DECIMAL (precision > 18, i.e. decimal128 storage).

DuckDB silently widens SUM(BIGINT) -> HUGEINT and SUM(DECIMAL) ->
DECIMAL(38,s); rows and column names still match the Spark result, so the
driver's gate reports a pure hash mismatch. This class of bug shipped in
rounds 4 (sim_class_centroids), 5 (text_heavy_hitters) and 6
(events_changepoint, q_sessionize_batch, sim_kmeans). The fix is always a
CAST in the oracle; this check makes the omission loud at dev time.

Usage: python3 tools/oracle_dtype_check.py <sfDir> <oracle_sql.json>
Exit 0 = every oracle parses, runs, and has no wide column.

NOT part of the shipped library — verification harness only (duckdb is a
driver-side tool, never a library dependency).
"""
import json
import re
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

WIDE_DECIMAL = re.compile(r"DECIMAL\((\d+)")


def wide(type_str):
    t = type_str.upper()
    if "HUGEINT" in t:  # covers HUGEINT and UHUGEINT, incl. nested in lists
        return True
    m = WIDE_DECIMAL.search(t)
    return bool(m and int(m.group(1)) > 18)


def main():
    sf_dir, oracle_json = sys.argv[1], sys.argv[2]
    oracles = json.loads(Path(oracle_json).read_text())
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    bad = []
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            cols = list(rel.columns)
            types = [str(t) for t in rel.types]
            rel.fetchall()  # force full execution: catches runtime errors
        except Exception as e:  # noqa: BLE001
            bad.append((name, f"does not run: {e}"))
            print(f"FAIL {name}: does not run: {e}")
            continue
        offenders = [f"{c}:{t}" for c, t in zip(cols, types) if wide(t)]
        if offenders:
            bad.append((name, f"wide columns {offenders}"))
            print(f"FAIL {name}: wide columns {offenders} — add CAST(... AS "
                  f"BIGINT/DOUBLE) in the oracle")
        else:
            print(f"OK   {name}")

    print(f"\n{len(oracles) - len(bad)}/{len(oracles)} oracles dtype-clean")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
