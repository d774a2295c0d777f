"""Reader knobs (S1-S3) + the python -m mtsad_spark CLI entrypoint."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pandas as pd


def test_read_mts_table_knobs(spark, tmp_path):
    from mtsad_spark.sources.readers import read_mts_table

    pdf = pd.DataFrame(
        {
            "t": pd.date_range("2020-01-01", periods=50, freq="h").strftime("%Y-%m-%d %H:%M:%S"),
            "v0": np.arange(50.0),
            "v1": np.arange(50.0) * 2,
            "tag": ["n"] * 50,
        }
    )
    p = str(tmp_path / "mts.tsv")
    pdf.to_csv(p, sep="\t", index=False)
    df = read_mts_table(
        spark, p, schema="t string, v0 double, v1 double, tag string",
        sep="\t", ts_col="t", usecols=["t", "v0"], nrows=10,
    )
    out = df.toPandas()
    assert list(out.columns) == ["t", "v0"]
    assert len(out) == 10
    assert str(out["t"].dtype).startswith("datetime64")


def test_read_float_series(spark, tmp_path):
    from mtsad_spark.sources.readers import read_float_series

    p = str(tmp_path / "series.txt")
    vals = np.sin(np.arange(100) / 7.0)
    with open(p, "w") as f:
        f.write("\n".join(str(v) for v in vals))
    out = read_float_series(spark, p).orderBy("idx").toPandas()
    assert len(out) == 100
    assert np.allclose(out["value"].values, vals)


def test_cli_pipeline_end_to_end(tmp_path):
    """python -m mtsad_spark --synthesize-rows ... runs the full checkpointed
    pipeline in a fresh process (the spark-submit path)."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    out_dir = str(tmp_path / "pipe")
    r = subprocess.run(
        [sys.executable, "-m", "mtsad_spark", "--input", "unused", "--output", out_dir,
         "--synthesize-rows", "5000"],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    payload = json.loads([l for l in r.stdout.splitlines() if l.startswith("{")][-1])
    stages = {s["stage"]: s["status"] for s in payload["stages"]}
    assert stages["partials_1m"] == "computed"
    assert stages["scores_1m"] == "computed"
    assert os.path.exists(f"{out_dir}/rollup_1d/_SUCCESS")


ARFF_TEXT = """% EEG-style fixture
@RELATION 'eeg eye state'
@ATTRIBUTE AF3 NUMERIC
@ATTRIBUTE F7 REAL
@ATTRIBUTE n_blinks INTEGER
@ATTRIBUTE 'eyeDetection' {0,1}
@DATA
4329.23, 4009.23, 3, 0
4324.62, 4004.62, 1, 1
% comment row
4327.69, 4006.67, ?, 0
?, 4011.28, 2, 1
"""


def test_arff_reader_matches_reference_semantics(spark, tmp_path):
    """S4 (VERDICT r01 #5): parse NUMERIC/REAL/INTEGER/NOMINAL + '?' nulls;
    arff_to_mts2 reproduces arff_to_mtss_df (eeg_eye_state.py:169-193):
    last attr → tag, +1 anomaly / -1 rest, positional index t."""
    import numpy as np

    from mtsad_spark.sources.arff_reader import arff_to_mts2, parse_arff, read_arff

    p = tmp_path / "eeg.arff"
    p.write_text(ARFF_TEXT)
    rel, attrs, rows = parse_arff(ARFF_TEXT)
    assert rel == "eeg eye state"
    assert [a[0] for a in attrs] == ["AF3", "F7", "n_blinks", "eyeDetection"]
    assert attrs[3][1] == ["0", "1"]
    assert rows[2][2] is None and rows[3][0] is None  # '?' → null

    df = read_arff(spark, str(p)).toPandas()
    assert str(df.dtypes["AF3"]) == "float64"
    assert df["n_blinks"].tolist()[:2] == [3, 1]

    mts = arff_to_mts2(spark, str(p), tag_anomaly=1).orderBy("t").toPandas()
    assert list(mts.columns) == ["t", "AF3", "F7", "n_blinks", "tag"]
    assert mts["tag"].tolist() == [-1, 1, -1, 1]
    assert mts["t"].tolist() == [0, 1, 2, 3]
    assert np.isnan(mts["AF3"].values[3])


def test_arff_sparse_rows(spark):
    from mtsad_spark.sources.arff_reader import parse_arff

    text = (
        "@relation s\n@attribute a NUMERIC\n@attribute b NUMERIC\n"
        "@attribute c {x,y}\n@data\n{0 5.0, 2 y}\n{}\n"
    )
    _, attrs, rows = parse_arff(text)
    assert rows[0] == [5.0, 0.0, "y"]
    assert rows[1] == [0.0, 0.0, "0"]  # spec: unmentioned values are zero


def test_arff_parser_roundtrip_property():
    """Property: any table serialized to ARFF text parses back identically
    (types, '?' nulls, quoted nominals/strings with spaces)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mtsad_spark.sources.arff_reader import parse_arff

    attr_type = st.sampled_from(["NUMERIC", "INTEGER", "STRING", "nominal"])

    @st.composite
    def tables(draw):
        n_attrs = draw(st.integers(1, 5))
        n_rows = draw(st.integers(0, 12))
        attrs = []
        for i in range(n_attrs):
            t = draw(attr_type)
            if t == "nominal":
                vals = draw(
                    st.lists(
                        st.text(alphabet="abcXYZ_ ", min_size=1, max_size=6).map(str.strip).filter(bool),
                        min_size=1, max_size=4, unique=True,
                    )
                )
                attrs.append((f"a{i}", vals))
            else:
                attrs.append((f"a{i}", t))
        rows = []
        for _ in range(n_rows):
            row = []
            for _, t in attrs:
                if draw(st.booleans()) and draw(st.integers(0, 4)) == 0:
                    row.append(None)
                elif isinstance(t, list):
                    row.append(draw(st.sampled_from(t)))
                elif t == "NUMERIC":
                    row.append(draw(st.floats(-1e6, 1e6, allow_nan=False)))
                elif t == "INTEGER":
                    row.append(draw(st.integers(-10**9, 10**9)))
                else:
                    row.append(draw(st.text(alphabet="abc XYZ0_", max_size=8)).strip() or "x")
            rows.append(row)
        return attrs, rows

    def serialize(attrs, rows) -> str:
        lines = ["@RELATION prop"]
        for n, t in attrs:
            if isinstance(t, list):
                lines.append(f"@ATTRIBUTE {n} {{{','.join(repr(v) for v in t)}}}")
            else:
                lines.append(f"@ATTRIBUTE {n} {t}")
        lines.append("@DATA")
        for row in rows:
            cells = []
            for v, (_, t) in zip(row, attrs):
                if v is None:
                    cells.append("?")
                elif isinstance(t, list) or t == "STRING":
                    cells.append(repr(v))  # single-quoted
                else:
                    cells.append(repr(v))
            lines.append(",".join(cells))
        return "\n".join(lines) + "\n"

    @settings(max_examples=60, deadline=None)
    @given(tables())
    def check(tbl):
        attrs, rows = tbl
        rel, got_attrs, got_rows = parse_arff(serialize(attrs, rows))
        assert rel == "prop"
        assert [a[0] for a in got_attrs] == [a[0] for a in attrs]
        assert len(got_rows) == len(rows)
        for want, got in zip(rows, got_rows):
            for v, g, (_, t) in zip(want, got, attrs):
                if v is None:
                    assert g is None
                elif t == "NUMERIC":
                    assert g == float(repr(v)), (v, g)
                elif t == "INTEGER":
                    assert g == v
                else:
                    assert g == v, (v, g)

    check()


def test_mat5_reader_roundtrip_and_shapes(spark, tmp_path):
    """S5: clean-room MAT5 parse — write with our own spec-conformant writer
    (compressed elements), read back bit-exact, and load through the
    gaussian.py consumption shape (X, Xval, yval)."""
    import numpy as np

    from mtsad_spark.sources.mat_reader import load_mat, read_mat_matrix, save_mat

    rng = np.random.RandomState(15)
    X = rng.randn(40, 3) * 5
    Xval = rng.randn(20, 3)
    yval = (rng.rand(20, 1) > 0.7).astype(np.float64)
    p = str(tmp_path / "g.mat")
    save_mat(p, {"X": X, "Xval": Xval, "yval": yval})
    got = load_mat(p)
    assert set(got) == {"X", "Xval", "yval"}
    assert (got["X"] == X).all() and (got["Xval"] == Xval).all() and (got["yval"] == yval).all()
    df = read_mat_matrix(spark, p, "X")
    pdf = df.orderBy("t").toPandas()
    assert list(pdf.columns) == ["t", "v0", "v1", "v2"]
    assert np.allclose(pdf[["v0", "v1", "v2"]].values, X)


def test_mat5_reader_small_element_and_uncompressed(tmp_path):
    """Hand-built uncompressed matrix using the SMALL data-element format
    for the name (the layout MATLAB itself emits for short names)."""
    import struct

    import numpy as np

    from mtsad_spark.sources.mat_reader import load_mat

    arr = np.arange(6, dtype="<f8").reshape(3, 2, order="F")
    body = struct.pack("<II", 6, 8) + struct.pack("<II", 6, 0)      # flags
    body += struct.pack("<II", 5, 8) + struct.pack("<ii", 3, 2)     # dims
    body += struct.pack("<HH", 1, 1) + b"A\x00\x00\x00"             # small name 'A'
    body += struct.pack("<II", 9, 48) + arr.tobytes(order="F")      # miDOUBLE
    matrix = struct.pack("<II", 14, len(body)) + body
    header = b"MATLAB 5.0 MAT-file".ljust(124) + struct.pack("<HH", 0x0100, 0x4D49)
    p = tmp_path / "u.mat"
    p.write_bytes(header + matrix)
    got = load_mat(str(p))
    assert (got["A"] == arr).all()


def test_arff_malformed_inputs_fail_loudly():
    """VERDICT r02 next #8: the clean-room parser must reject malformed
    input with specific errors, not mis-parse silently."""
    import pytest

    from mtsad_spark.sources.arff_reader import parse_arff

    head = "@RELATION r\n@ATTRIBUTE a NUMERIC\n@ATTRIBUTE c {x,y}\n@DATA\n"
    # sparse index out of range
    with pytest.raises(ValueError, match="out of range"):
        parse_arff(head + "{5 1.0}\n")
    # sparse entry without a value
    with pytest.raises(ValueError, match="malformed sparse"):
        parse_arff(head + "{0}\n")
    # unquoted nominal value containing a comma -> arity mismatch
    with pytest.raises(ValueError, match="arity"):
        parse_arff(head + "1.0,x,y\n")
    # unsupported attribute type
    with pytest.raises(ValueError, match="unsupported ARFF attribute type"):
        parse_arff("@RELATION r\n@ATTRIBUTE d DATE yyyy\n@DATA\n")


def test_mat5_malformed_inputs_fail_loudly(tmp_path):
    import struct

    import pytest

    from mtsad_spark.sources.mat_reader import load_mat, save_mat

    p = str(tmp_path / "t.mat")
    save_mat(p, {"X": np.arange(12.0).reshape(3, 4)})
    good = open(p, "rb").read()

    def write(b: bytes) -> str:
        q = str(tmp_path / "bad.mat")
        open(q, "wb").write(b)
        return q

    # short header
    with pytest.raises(ValueError, match="short header"):
        load_mat(write(good[:64]))
    # big-endian marker
    swapped = good[:126] + b"MI" + good[128:]
    with pytest.raises(ValueError, match="big-endian"):
        load_mat(write(swapped))
    # truncated top-level element payload (cut inside the compressed blob)
    with pytest.raises(ValueError, match="truncated MAT element"):
        load_mat(write(good[:-16]))
    # truncated INNER element: craft an uncompressed matrix whose real-part
    # tag announces more bytes than the buffer holds
    def element(mi_type, payload):
        pad = (-len(payload)) % 8
        return struct.pack("<II", mi_type, len(payload)) + payload + b"\x00" * pad

    body = element(6, struct.pack("<II", 6, 0))          # array flags
    body += element(5, struct.pack("<ii", 2, 2))         # dims 2x2
    body += element(1, b"X")                             # name
    body += struct.pack("<II", 9, 4 * 8)                 # real tag: 32 bytes...
    body += b"\x00" * 8                                  # ...but only 8 present
    header = good[:128]
    with pytest.raises(ValueError, match="truncated MAT element"):
        load_mat(write(header + element(14, body)))
    # real part shorter than dims claim (consistent tags, wrong count)
    body2 = element(6, struct.pack("<II", 6, 0))
    body2 += element(5, struct.pack("<ii", 3, 3))        # dims say 9 values
    body2 += element(1, b"X")
    body2 += element(9, struct.pack("<4d", 1, 2, 3, 4))  # only 4 doubles
    with pytest.raises(ValueError, match="holds 4 values"):
        load_mat(write(header + element(14, body2)))
