"""ARFF scan (SURVEY.md S4) — driver-side parse → ``createDataFrame``.

Re-expresses the reference's ARFF ingestion path: the vendored liac-arff
parser (/root/reference/util/arff.py, NUMERIC/REAL/INTEGER/STRING/NOMINAL
attribute types, '?' missing values, sparse {i v, ...} rows) feeding
``arff_to_mtss_df`` (/root/reference/transformation/eeg_eye_state.py:169-193),
which renames the last attribute to ``tag`` and maps every non-anomaly tag
value to -1.

Clean-room implementation from the public ARFF specification (Waikato ARFF
format description) — not a port of the vendored parser. ARFF files are
reference-dataset-sized (EEG eye state ≈ 15k rows), so a driver-side parse is
the right scale call; a 100 TB pipeline would never ship ARFF.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_NOMINAL_RE = re.compile(r"^\{(.*)\}$", re.S)


def _split_csv(line: str) -> list[str]:
    """Split an ARFF data row on commas, honoring single/double quotes."""
    out, cur, quote = [], [], None
    for ch in line:
        if quote:
            if ch == quote:
                quote = None
            else:
                cur.append(ch)
        elif ch in ("'", '"'):
            quote = ch
        elif ch == ",":
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    out.append("".join(cur).strip())
    return out


def _attr_name(raw: str) -> tuple[str, str]:
    """Split '@attribute <name> <type>' payload into (name, type-string);
    the name may be quoted and contain spaces."""
    raw = raw.strip()
    if raw[0] in ("'", '"'):
        q = raw[0]
        end = raw.index(q, 1)
        return raw[1:end], raw[end + 1 :].strip()
    parts = raw.split(None, 1)
    return parts[0], parts[1].strip() if len(parts) > 1 else ""


def parse_arff(text: str) -> tuple[str, list[tuple[str, object]], list[list]]:
    """(relation, attributes, rows). Attribute type is 'NUMERIC'|'INTEGER'|
    'REAL'|'STRING' or a list of nominal values. Missing '?' → None. Sparse
    rows ({idx value, ...}) expand against per-type zeros per the spec."""
    relation, attrs, rows = "", [], []
    in_data = False
    for raw_line in text.splitlines():
        line = raw_line.strip()
        if not line or line.startswith("%"):
            continue
        low = line.lower()
        if not in_data:
            if low.startswith("@relation"):
                relation = _attr_name(line[len("@relation") :])[0]
            elif low.startswith("@attribute"):
                name, type_s = _attr_name(line[len("@attribute") :])
                m = _NOMINAL_RE.match(type_s)
                if m:
                    vals = [v.strip().strip("'\"") for v in _split_csv(m.group(1))]
                    attrs.append((name, vals))
                else:
                    t = type_s.split()[0].upper()
                    if t not in ("NUMERIC", "REAL", "INTEGER", "STRING"):
                        raise ValueError(f"unsupported ARFF attribute type {type_s!r}")
                    attrs.append((name, t))
            elif low.startswith("@data"):
                in_data = True
            continue
        if line.startswith("{"):  # sparse: unmentioned columns are zero
            row: list = [_zero(t) for _, t in attrs]
            inner = line.strip("{}").strip()
            if inner:
                for item in _split_csv(inner):
                    parts = item.split(None, 1)
                    if len(parts) != 2:
                        raise ValueError(f"malformed sparse ARFF entry {item!r}")
                    idx = int(parts[0])
                    if not 0 <= idx < len(attrs):
                        raise ValueError(
                            f"sparse ARFF index {idx} out of range "
                            f"(0..{len(attrs) - 1})"
                        )
                    row[idx] = _convert(parts[1], attrs[idx][1])
            rows.append(row)
        else:
            vals = _split_csv(line)
            if len(vals) != len(attrs):
                raise ValueError(f"row arity {len(vals)} != {len(attrs)} attributes")
            rows.append([_convert(v, t) for v, (_, t) in zip(vals, attrs)])
    return relation, attrs, rows


def _zero(t):
    if t == "STRING" or isinstance(t, list):
        return "0"
    return 0 if t == "INTEGER" else 0.0


def _convert(v: str, t):
    v = v.strip().strip("'\"")
    if v == "?":
        return None
    if isinstance(t, list) or t == "STRING":
        return v
    return int(v) if t == "INTEGER" else float(v)


def _spark_type(t):
    if isinstance(t, list) or t == "STRING":
        return StringType()
    return LongType() if t == "INTEGER" else DoubleType()


def read_arff(spark: SparkSession, path: str) -> DataFrame:
    """ARFF file → typed DataFrame (NUMERIC/REAL → double, INTEGER → long,
    STRING/NOMINAL → string; '?' → null)."""
    with open(path) as f:
        _, attrs, rows = parse_arff(f.read())
    schema = StructType([StructField(n, _spark_type(t)) for n, t in attrs])
    return spark.createDataFrame(rows, schema=schema)


def arff_to_mts2(
    spark: SparkSession, path: str, tag_anomaly: int | str = 1
) -> DataFrame:
    """The reference's ``arff_to_mtss_df`` contract: last attribute becomes
    integer ``tag`` (+1 anomaly / -1 everything else per README.md:6-7), a
    positional index column ``t`` stands in for the pandas RangeIndex, and
    feature columns are cast double (eeg_eye_state.py:180-192 semantics)."""
    with open(path) as f:
        _, attrs, rows = parse_arff(f.read())
    names = [n for n, _ in attrs]
    schema = StructType([StructField(n, _spark_type(t)) for n, t in attrs])
    indexed = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        indexed, schema=StructType([StructField("t", LongType())] + list(schema.fields))
    )
    feat_cols = names[:-1]
    # string compare covers both integer-coded and string-tagged datasets
    tag = F.when(
        F.col(names[-1]).cast("string") == str(tag_anomaly), F.lit(1)
    ).otherwise(F.lit(-1))
    return df.select(
        "t",
        *[F.col(c).cast("double") for c in feat_cols],
        tag.alias("tag"),
    )
