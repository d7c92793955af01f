"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` on DuckDB (views pre-registered over the same parquet),
then compares row count, column names, and an order-insensitive value hash.

Usage: python tools/check_parity.py [--bare] [sf_dir] [query ...]

``--bare`` builds a minimally-configured SparkSession (like the driver's
harness) instead of the repo session factory — the strictest replica of
the correctness gate.
"""

from __future__ import annotations

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import duckdb

from stockpulse_batch_realtime_etl_spark.schemas import TESTDATA_TABLES
from stockpulse_batch_realtime_etl_spark.session import get_spark


def _norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.6g}"
    if isinstance(v, bool):
        return str(int(v))
    # timestamps/dates → ISO string, trimmed to seconds to dodge µs/ns drift
    s = str(v)
    return s


def _rowset(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], set[str]]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keyed = sorted(
        "|".join(_norm_cell(r[i]) for i in order) for r in rows
    )
    return len(rows), sorted(cols), set(keyed) if len(set(keyed)) == len(keyed) else keyed  # type: ignore


def main() -> int:
    args = sys.argv[1:]
    bare = "--bare" in args
    if bare:
        args.remove("--bare")
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    import __spark_entry__ as entry_mod

    if bare:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[32]").getOrCreate()
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        sdf = fn(spark.getActiveSession() or spark, sf_dir)
        srows = [tuple(r) for r in sdf.collect()]
        scols = list(sdf.columns)
        if name not in oracles:
            print(f"  {name}: rows-only check — {len(srows)} rows")
            continue
        orel = con.execute(oracles[name])
        ocols = [d[0] for d in orel.description]
        orows = [tuple(r) for r in orel.fetchall()]
        sn, sc, sh = _rowset(scols, srows)
        on, oc, oh = _rowset(ocols, orows)
        ok = (sn == on) and (sc == oc) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"  [{status}] {name}: spark {sn} rows vs oracle {on} rows")
        if not ok:
            failures.append(name)
            if sc != oc:
                print(f"    columns spark={sc} oracle={oc}")
            if sh != oh and sn == on and sc == oc:
                sset, oset = set(sh), set(oh)
                for d in sorted(sset - oset)[:5]:
                    print(f"    spark-only : {d}")
                for d in sorted(oset - sset)[:5]:
                    print(f"    oracle-only: {d}")
    if failures:
        print(f"FAILURES: {failures}")
        return 1
    print("all parity checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
