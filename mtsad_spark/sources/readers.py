"""File-format scans with the reference's reader knobs (SURVEY.md S1-S3, S6).

The reference reads CSV/TSV with per-script constants SEP / HEADER /
INDEX_COL / USECOLS / NROWS (/root/reference/prediction/lstm_mts.py:109-110,
prediction/config.yml:11-16) and whitespace text via np.loadtxt
(statistication/moving_average.py:145). Spark equivalents keep every knob a
plan property Catalyst can push down: usecols → select (column pruning into
the scan), nrows → limit (scan-level limit pushdown), date parsing → typed
schema or to_timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_mts_table(
    spark: SparkSession,
    path: str,
    schema: StructType | str | None = None,
    sep: str = ",",
    header: bool = True,
    ts_col: str | None = None,
    ts_format: str | None = None,
    usecols: list[str] | None = None,
    nrows: int | None = None,
) -> DataFrame:
    """S1/S2: CSV/TSV scan with the reference's knob set. An explicit schema
    is strongly preferred (inference = an extra full scan at 100 TB)."""
    reader = spark.read.option("header", header).option("sep", sep)
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    df = reader.csv(path)
    if ts_col is not None:
        col = F.to_timestamp(F.col(ts_col), ts_format) if ts_format else F.col(ts_col).cast("timestamp")
        df = df.withColumn(ts_col, col)
    if usecols:
        df = df.select(*usecols)
    if nrows is not None:
        df = df.limit(nrows)
    return df


def read_float_series(spark: SparkSession, path: str, value_name: str = "value") -> DataFrame:
    """S3: whitespace text of one float per line (np.loadtxt analog), with a
    file-order row index for positional semantics.

    Ordering: (file name, in-file offset). A single file's splits are planned
    in byte-offset order, so ``monotonically_increasing_id`` follows offset
    within a file; across a directory/glob Spark packs files by SIZE, so the
    file name must lead the sort key or the index silently scrambles.
    NOTE the global index needs one total-order window (single task) — this
    reader is for the reference's fixture-sized series inputs
    (statistication/moving_average.py:145), not a 100 TB scan path; at scale
    keep per-file indexes (drop the window, key by (_file, idx)).
    """
    from pyspark.sql import Window

    df = spark.read.text(path).select(
        F.input_file_name().alias("_file"),
        F.monotonically_increasing_id().alias("_mid"),
        F.trim(F.col("value")).alias("_raw"),
    ).filter(F.length("_raw") > 0)
    df = df.withColumn(value_name, F.col("_raw").cast("double")).drop("_raw")
    return df.withColumn(
        "idx", F.row_number().over(Window.orderBy("_file", "_mid")) - 1
    ).drop("_file", "_mid")
