"""Local replica of the driver's correctness gate: run every
__spark_entry__.queries() entry against its oracle_sql() twin on DuckDB at
the given sf_dir, compare row count / column names / order-insensitive
values. Usage: python tools/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), ignore_index=True)


def compare(name, sdf, odf) -> list[str]:
    errs = []
    if len(sdf) != len(odf):
        errs.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        errs.append(f"cols spark={sorted(sdf.columns)} "
                    f"oracle={sorted(odf.columns)}")
        return errs
    if errs:
        return errs
    a, b = canon(sdf), canon(odf)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or \
                np.issubdtype(np.asarray(bv).dtype, np.floating):
            bad = ~np.isclose(av.astype(float), bv.astype(float),
                              rtol=0, atol=0, equal_nan=True)
        else:
            bad = av != bv
        if bad.any():
            i = int(np.argmax(bad))
            errs.append(f"col {c}: {int(bad.sum())} mismatches, first at "
                        f"row {i}: spark={av[i]!r} oracle={bv[i]!r}")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    # oracle_sql() is called before any query runs, so the gate-sf latch
    # inside __spark_entry__ is still empty here — pin the oracle dir to
    # the gate dir explicitly so IVF centroid literals train on the same
    # table the Spark queries read (ADVICE r5 #1).
    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF", sf_dir)
    import __spark_entry__ as E
    from apollo_spark.session import get_spark

    spark = get_spark("check-entry")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * "
                    f"FROM '{sf_dir}/{t}.parquet'")
    qs, os_ = E.queries(), E.oracle_sql()
    fails = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        ts = time.time() - t0
        if name not in os_:
            print(f"  {name:24s} rows-only: {len(sdf)} rows "
                  f"[{ts:.1f}s] {'OK' if len(sdf) >= 0 else ''}")
            continue
        t0 = time.time()
        odf = con.execute(os_[name]).fetchdf()
        to = time.time() - t0
        errs = compare(name, sdf, odf)
        status = "OK " if not errs else "FAIL"
        print(f"  {name:24s} {status} rows={len(sdf)} "
              f"[spark {ts:.1f}s, duck {to:.1f}s]")
        for e in errs:
            print(f"      {e}")
        fails += bool(errs)
    print(f"{'ALL OK' if fails == 0 else f'{fails} FAILURES'}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
