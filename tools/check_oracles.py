"""Local stand-in for the driver's DuckDB-oracle comparison.

Runs every registered query at the given sf_dir through Spark AND its oracle
SQL through DuckDB, then compares row count, column-name sets, and
order-insensitive values (sorted frames, NaN-aware). Usage:

    python tools/check_oracles.py [sf_dir] [name_filter]
"""

from __future__ import annotations

import math
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from mtsad_spark.driver_queries import oracle_sql, queries  # noqa: E402
from mtsad_spark.session import get_spark  # noqa: E402

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def duck_con(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    out = pdf.copy()
    for c in out.columns:
        if out[c].dtype == object:
            try:
                out[c] = out[c].astype(str)
            except Exception:
                pass
        if str(out[c].dtype).startswith("datetime64[us"):
            out[c] = out[c].astype("datetime64[ns]")
        if str(out[c].dtype) in ("float32",):
            out[c] = out[c].astype("float64")
        if str(out[c].dtype).startswith("decimal"):
            out[c] = out[c].astype("float64")
    out = out[sorted(out.columns)]
    return out.sort_values(list(out.columns), na_position="last").reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if set(a.columns) != set(b.columns):
        return f"columns differ: spark={sorted(a.columns)} duck={sorted(b.columns)}"
    if len(a) != len(b):
        return f"row counts differ: spark={len(a)} duck={len(b)}"
    a, b = normalize(a), normalize(b)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating):
            ok = np.allclose(
                np.nan_to_num(av, nan=1.2345e300),
                np.nan_to_num(bv.astype("float64"), nan=1.2345e300),
                rtol=0, atol=1e-9,
            )
        else:
            ok = (pd.isna(av) == pd.isna(bv)).all() and (
                av[~pd.isna(av)] == bv[~pd.isna(bv)]
            ).all()
        if not ok:
            m = None
            for i in range(len(av)):
                x, y = av[i], bv[i]
                same = (pd.isna(x) and pd.isna(y)) or x == y
                if not same and np.issubdtype(a[c].dtype, np.floating):
                    same = bool(np.isclose(float(x), float(y), rtol=0, atol=1e-9))
                if not same:
                    m = f" first diff row {i}: {x!r} vs {y!r}"
                    break
            return f"values differ in column {c}:{m}"
    return None


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    filt = sys.argv[2] if len(sys.argv) > 2 else ""
    spark = get_spark(
        "oracle-check", master="local[4]", shuffle_partitions=4,
        extra_confs={"spark.sql.adaptive.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_con(sf_dir)
    qs, osql = queries(), oracle_sql()
    n_pass = n_fail = n_rowsonly = 0
    import re

    for name, fn in qs.items():
        if filt and not re.search(filt, name):
            continue
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: SPARK ERROR {type(e).__name__}: {str(e)[:200]}")
            n_fail += 1
            continue
        finally:
            # queries persist multi-consumer frames (LSH candidates, SAX
            # symbol frames) and return lazy results — release the blocks
            # after each consuming action so a full-registry run can't
            # accumulate caches and evict hotter ones (ADVICE r03)
            spark.catalog.clearCache()
        if name not in osql:
            print(f"rows  {name}: {len(sdf)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            ddf = con.sql(osql[name]).df()
        except Exception as e:
            print(f"FAIL  {name}: DUCKDB ERROR {str(e)[:200]}")
            n_fail += 1
            continue
        err = compare(sdf, ddf)
        if err:
            print(f"FAIL  {name}: {err}")
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sdf)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
