"""Simulate the external driver's correctness gate locally.

Runs every ``queries()`` entry against its ``oracle_sql()`` twin at the
given scale factor (default sf0.01, the driver's setting) and reports
rows/schema/value agreement per entry using the same canonicalization as
tests/conftest.py, plus a dtype-parity check of the oracle's DuckDB output
types against the Spark schema (round-1 DECIMAL and round-2 HUGEINT red
rows were both type-rendering divergences values alone can't see). Usage::

    python tools/driver_sim.py [--ansi] [sf_dir] [name_filter ...]

``--ansi`` runs the registry under the external driver's session config
(spark.sql.ansi.enabled=true — Spark 4 default, which the repo's own
sessions override off at session.py:54): entry code must be config-robust
because the driver builds a default session.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import duckdb  # noqa: E402

from tests.conftest import canon_result, dtype_mismatches  # noqa: E402


def main() -> int:
    argv = [a for a in sys.argv[1:] if a != "--ansi"]
    ansi = "--ansi" in sys.argv[1:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import __spark_entry__ as entry_mod
    from skripsi_mapreduce_spark.io import TABLES
    from skripsi_mapreduce_spark.session import get_spark

    spark = get_spark(app_name="driver-sim")
    if ansi:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        print("ANSI mode: spark.sql.ansi.enabled=true (driver default)")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for i, (name, fn) in enumerate(qs.items(), 1):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            s_rows = [tuple(r) for r in df.collect()]
            s_cols = [c.lower() for c in df.columns]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[{i:2d}] {name}: SPARK ERR {e}")
            continue
        if name not in oracles:
            print(f"[{i:2d}] {name}: rows={len(s_rows)} (no oracle — rows-only)")
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [c[0].lower() for c in res.description]
            d_rows = [tuple(r) for r in res.fetchall()]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"[{i:2d}] {name}: ORACLE ERR {e}")
            continue
        dt = time.time() - t0
        schema_ok = sorted(s_cols) == sorted(d_cols)
        rows_ok = len(s_rows) == len(d_rows)
        bad_types = dtype_mismatches(df.schema, con, oracles[name])
        hash_ok = schema_ok and rows_ok and not bad_types and (
            canon_result(s_cols, s_rows) == canon_result(d_cols, d_rows)
        )
        status = "PASS" if hash_ok else "FAIL"
        if not hash_ok:
            failures.append(name)
        if bad_types:
            print(f"[{i:2d}] {name}: DTYPE {bad_types}")
        print(
            f"[{i:2d}] {name}: {status} rows={len(s_rows)}/{len(d_rows)} "
            f"schema={schema_ok} ({dt:.1f}s)"
        )
        if not hash_ok and schema_ok and rows_ok:
            cs = canon_result(s_cols, s_rows)
            cd = canon_result(d_cols, d_rows)
            for a, b in list(zip(cs, cd))[:2000]:
                if a != b:
                    print(f"     spark : {a}\n     oracle: {b}")
                    break
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL GREEN")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
