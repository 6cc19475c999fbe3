#!/usr/bin/env python
"""Replicate the grading driver: run every __spark_entry__ query on
Spark and its oracle on DuckDB at sf0.01, compare rows / sorted-column
values / Arrow types.  Prints one line per query + a summary."""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E  # noqa: E402
from crystal_html5_spark.sparkjob.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.01"


def norm_cell(v):
    import decimal
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm_cell(x) for x in v)
    return v


def table_key(arrow_tbl):
    cols = sorted(arrow_tbl.column_names)
    pyd = arrow_tbl.to_pydict()
    rows = list(zip(*[[norm_cell(v) for v in pyd[c]] for c in cols]))
    return cols, sorted(rows, key=repr)


def main() -> None:
    only = sys.argv[1:] or None
    spark = get_spark("verify", master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{SF}/{t}.parquet')")
    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, SF)
            arrow = sdf.toArrow()
            if name not in oracles:
                again = fn(spark, SF).toArrow()
                ok = (arrow.num_rows == again.num_rows > 0
                      and table_key(arrow) == table_key(again))
                print(f"{name:28s} rows={arrow.num_rows:>6} "
                      f"{'OK(rows-only)' if ok else 'FAIL(nondet)'}")
                if not ok:
                    fails.append(name)
                continue
            ora = con.execute(oracles[name]).arrow()
            sc, sr = table_key(arrow)
            oc, orows = table_key(ora)
            ok = sc == oc and len(sr) == len(orows) and sr == orows
            print(f"{name:28s} rows={arrow.num_rows:>6}/"
                  f"{ora.num_rows:<6} {'OK' if ok else 'FAIL'}")
            if not ok:
                fails.append(name)
                if sc != oc:
                    print(f"  cols spark={sc}\n  cols oracle={oc}")
                else:
                    for a, b in zip(sr, orows):
                        if a != b:
                            print(f"  spark : {a}\n  oracle: {b}")
                            break
        except Exception as exc:  # noqa: BLE001
            fails.append(name)
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
    n = len(only) if only else len(qs)
    print(f"\n{n - len(fails)}/{n} green; fails: {fails or 'none'}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
