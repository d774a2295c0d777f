"""MATLAB .mat (Level 5) scan (SURVEY.md S5) — driver-side parse →
``createDataFrame``.

The reference loads gaussian-detector matrices with ``scipy.io.loadmat``
(/root/reference/statistication/gaussian.py:129,161: X, Xval, yval). This
sandbox has no scipy, so this is a clean-room MAT-File Level 5 reader from
the public MathWorks "MAT-File Format" specification, covering what that
path needs: real 2-D numeric matrices (double/single/int classes), normal
and small-data element tags, and miCOMPRESSED (zlib) envelopes. Cell/struct/
sparse/complex classes raise.

Like the ARFF reader (S4), .mat inputs are reference-dataset-sized — a
driver parse feeding ``createDataFrame`` is the right scale call.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
from pyspark.sql import DataFrame, SparkSession

# MAT5 data types (mi*) → numpy dtype (little-endian)
_MI_DTYPES = {
    1: "<i1", 2: "<u1", 3: "<i2", 4: "<u2", 5: "<i4", 6: "<u4",
    7: "<f4", 9: "<f8", 12: "<i8", 13: "<u8",
}
_MI_COMPRESSED = 15
_MI_MATRIX = 14
_MI_INT8 = 1
_MI_INT32 = 5
_MI_UINT32 = 6
# mxCLASS → element numpy dtype of the stored real part's LOGICAL class
_MX_NUMERIC = {6: "f8", 7: "f4", 8: "i1", 9: "u1", 10: "i2", 11: "u2", 12: "i4", 13: "u4", 14: "i8", 15: "u8"}


def _read_tag(buf: bytes, pos: int) -> tuple[int, int, int, int]:
    """(mi_type, n_bytes, payload_pos, next_pos) — handles the small-data
    element format (type in the low 16 bits, length in the high 16).
    Raises on tags or payloads running past the buffer (truncated file)."""
    if pos + 8 > len(buf):
        raise ValueError(f"truncated MAT element tag at byte {pos}")
    word = struct.unpack_from("<I", buf, pos)[0]
    if word >> 16:  # small data element: ≤4 payload bytes inside the tag
        return word & 0xFFFF, word >> 16, pos + 4, pos + 8
    n = struct.unpack_from("<I", buf, pos + 4)[0]
    payload = pos + 8
    if payload + n > len(buf):
        raise ValueError(
            f"truncated MAT element at byte {pos}: "
            f"payload of {n} bytes exceeds buffer ({len(buf)} bytes)"
        )
    nxt = payload + ((n + 7) // 8) * 8
    return word, n, payload, nxt


def _parse_matrix(buf: bytes, pos: int, end: int) -> tuple[str, np.ndarray]:
    # array flags (miUINT32, 8 bytes)
    t, n, p, pos = _read_tag(buf, pos)
    if t != _MI_UINT32 or n != 8:
        raise ValueError(f"malformed array-flags element (mi_type={t}, n={n})")
    flags = struct.unpack_from("<I", buf, p)[0]
    mx_class = flags & 0xFF
    if flags & 0x0800 or flags & 0x1000:
        raise ValueError("complex/global matrices not supported")
    if mx_class not in _MX_NUMERIC:
        raise ValueError(f"unsupported mxCLASS {mx_class} (numeric matrices only)")
    # dimensions (miINT32)
    t, n, p, pos = _read_tag(buf, pos)
    if t != _MI_INT32:
        raise ValueError(f"malformed dimensions element (mi_type={t})")
    dims = np.frombuffer(buf, dtype="<i4", count=n // 4, offset=p)
    # name (miINT8)
    t, n, p, pos = _read_tag(buf, pos)
    if t != _MI_INT8:
        raise ValueError(f"malformed name element (mi_type={t})")
    name = bytes(buf[p : p + n]).decode("ascii")
    # real part (any mi numeric type; MATLAB may store doubles compactly)
    t, n, p, pos = _read_tag(buf, pos)
    if t not in _MI_DTYPES:
        raise ValueError(f"unsupported mi data type {t} in real part")
    stored = np.frombuffer(buf, dtype=_MI_DTYPES[t], count=n // np.dtype(_MI_DTYPES[t]).itemsize, offset=p)
    if len(stored) != int(np.prod(dims)):
        raise ValueError(
            f"MAT real part holds {len(stored)} values for dims {tuple(dims)}"
        )
    arr = stored.astype(_MX_NUMERIC[mx_class]).reshape(tuple(dims), order="F")
    return name, arr


def load_mat(path: str) -> dict[str, np.ndarray]:
    """Parse a Level 5 .mat file → {variable name: 2-D ndarray}."""
    with open(path, "rb") as f:
        data = f.read()
    if len(data) < 128:
        raise ValueError("not a MAT5 file (short header)")
    version, endian = struct.unpack_from("<HH", data, 124)
    if endian != 0x4D49:  # 'IM' little-endian
        raise ValueError("big-endian MAT files not supported")
    out: dict[str, np.ndarray] = {}
    pos = 128
    while pos + 8 <= len(data):
        t, n, p, nxt = _read_tag(data, pos)
        if t == _MI_COMPRESSED:
            inner = zlib.decompress(data[p : p + n])
            it, inr, ip, _ = _read_tag(inner, 0)
            if it == _MI_MATRIX:
                name, arr = _parse_matrix(inner, ip, ip + inr)
                out[name] = arr
        elif t == _MI_MATRIX:
            name, arr = _parse_matrix(data, p, p + n)
            out[name] = arr
        pos = nxt
    return out


def save_mat(path: str, variables: dict[str, np.ndarray]) -> None:
    """Minimal MAT5 writer (double matrices, compressed elements) — the
    fixture-side counterpart so round-trips are testable without scipy."""

    def element(mi_type: int, payload: bytes) -> bytes:
        pad = (-len(payload)) % 8
        return struct.pack("<II", mi_type, len(payload)) + payload + b"\x00" * pad

    blobs = []
    for name, arr in variables.items():
        a = np.asarray(arr, dtype="<f8")
        if a.ndim == 1:
            a = a[:, None]
        body = element(_MI_UINT32, struct.pack("<II", 6, 0))  # mxDOUBLE_CLASS
        body += element(_MI_INT32, struct.pack("<ii", *a.shape))
        body += element(_MI_INT8, name.encode("ascii"))
        body += element(9, a.tobytes(order="F"))  # miDOUBLE
        matrix = element(_MI_MATRIX, body)
        blobs.append(element(_MI_COMPRESSED, zlib.compress(matrix)))
    header = b"MATLAB 5.0 MAT-file, written by mtsad_spark (clean-room)".ljust(116)
    header += b"\x00" * 8 + struct.pack("<HH", 0x0100, 0x4D49)
    with open(path, "wb") as f:
        f.write(header + b"".join(blobs))


def read_mat_matrix(
    spark: SparkSession, path: str, var: str, col_prefix: str = "v"
) -> DataFrame:
    """One .mat matrix → DataFrame (t, {prefix}0..{prefix}{d-1}) — the
    gaussian.py consumption shape (rows = observations, cols = dims)."""
    arr = load_mat(path)[var]
    cols = [f"{col_prefix}{j}" for j in range(arr.shape[1])]
    rows = [(i, *map(float, arr[i])) for i in range(arr.shape[0])]
    return spark.createDataFrame(rows, schema="t BIGINT, " + ", ".join(f"{c} DOUBLE" for c in cols))
