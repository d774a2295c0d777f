"""Time-series bitmap anomaly scoring (SURVEY.md W11/A14/J4/A15).

Re-expresses the reference's SAX-bitmap detector
(/root/reference/tsbitmaps/tsbitmapper.py, after the public "Time-series
Bitmaps" / "Assumption-Free Anomaly Detection" papers) Spark-first:

* per-series scoring — ``bitmap_scores``: an ``applyInPandas`` kernel with a
  DENSE count-vector formulation: symbols come from per-feature-window
  equal-width binning (np.digitize semantics, tsbitmapper.py:56-96), level-L
  n-grams are integer-encoded into a code space of (bins+2)^L, so each
  chunk's bitmap is one ``np.bincount`` and the lag/lead distance one
  vectorized subtraction — no Python dicts in the loop.
  NOTE a deliberate deviation: the reference normalizes a chunk's bitmap once
  and then applies raw ±1 ingress/egress updates to the normalized values
  (tsbitmapper.py:214-247), so its scores drift from the paper's definition
  after the first step. We implement the PAPER's semantics — every chunk's
  bitmap is max-normalized — and test bounded outcomes the same way the
  reference's own suite does (tsbitmaps/test/test_tsbitmaps.py:38-54).
* corpus-scale bitmap algebra — ``ngram_bitmap`` (A14: lag-concat n-gram →
  groupBy count → max-normalize) and ``bitmap_distance_join`` (J4/A15: FULL
  OUTER join on the n-gram key, ``coalesce(freq, 0)``, Σ(Δfreq)²) for series
  too large for one kernel group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType


# ----------------------------------------------------------------- kernel


def _sax_symbols(vals: np.ndarray, fw: int, n_bins: int) -> np.ndarray:
    """Per-feature-window equal-width binning, np.digitize semantics
    (tsbitmapper.py:56-96): window min/max edges, global min/max fallback for
    constant windows."""
    n = len(vals)
    gmin, gmax = vals.min(), vals.max()
    out = np.empty(n, dtype=np.int64)
    for s in range(0, n, fw):
        w = vals[s : s + fw]
        lo, hi = w.min(), w.max()
        if lo == hi:
            lo, hi = gmin, gmax
        if lo == hi:
            out[s : s + fw] = 0
            continue
        step = (hi - lo) / n_bins
        edges = np.arange(lo, hi, step)
        out[s : s + fw] = np.digitize(w, edges) - 1
    return out


def _ngram_codes(sym: np.ndarray, level: int, base: int) -> np.ndarray:
    """Integer code of the level-gram starting at each position (length
    n-level+1); symbols are offset by +1 so code 0 never collides."""
    n = len(sym)
    m = n - level + 1
    codes = np.zeros(m, dtype=np.int64)
    for l in range(level):
        codes = codes * base + (sym[l : l + m] + 1)
    return codes


def _check_fw_level(fw: int, level: int) -> None:
    """A feature window shorter than the n-gram has no complete n-gram to
    count: the slice arithmetic (ws : ws+fw-level+1) would wrap to a negative
    stop and silently mark nearly every position counted, breaking the
    incremental-equals-recount contract (ADVICE r02). Reject loudly."""
    if fw < level:
        raise ValueError(
            f"feature_window_size ({fw}) must be >= level_size ({level}): "
            "a feature window must hold at least one complete n-gram"
        )


def _chunk_bitmap(
    codes: np.ndarray, start: int, size: int, fw: int, level: int, space: int
) -> np.ndarray:
    """Max-normalized dense bitmap of chunk [start, start+size): n-grams
    counted within the chunk's OWN feature-window segmentation (full windows
    then the tail), per tsbitmapper.py:130-157."""
    _check_fw_level(fw, level)
    counts = np.zeros(space, dtype=np.int64)
    full_end = start + size - size % fw
    for ws in range(start, full_end, fw):
        sel = codes[ws : ws + fw - level + 1]
        counts += np.bincount(sel, minlength=space)
    if size % fw > 0:
        tail = codes[full_end : start + size - level + 1]
        if len(tail):
            counts += np.bincount(tail, minlength=space)
    m = counts.max()
    return counts / m if m > 0 else counts.astype(np.float64)


def _counted_pattern(size: int, fw: int, level: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(positions, left_edges, right_edges) of the translation-invariant
    counted-n-gram pattern of a chunk of ``size`` rows under feature-window
    segmentation: counted(start) = start + P with
    P = ∪_j [j·fw, j·fw + fw − level] ∪ [size − size%fw, size − level].

    Because P only depends on the chunk LENGTH, sliding the chunk by one
    shifts the whole pattern by one: the count delta is exactly −1 at each
    run's left edge and +1 one past each right edge — O(size/fw) scalar
    updates per step instead of the O(size + (size/fw)·space) full recount
    (VERDICT r01 #4). Integer counts stay bitwise-identical to
    :func:`_chunk_bitmap`'s; normalization happens at distance time, keeping
    the paper-correct per-chunk max-normalization this module deliberately
    chose over the reference's normalize-then-mutate drift."""
    _check_fw_level(fw, level)
    m = size - level + 1
    if m <= 0:
        z = np.zeros(0, dtype=np.int64)
        return z, z, z
    mask = np.zeros(m, dtype=bool)
    full = size - size % fw
    for ws in range(0, full, fw):
        mask[ws : min(ws + fw - level + 1, m)] = True
    if size % fw > 0 and full < m:
        mask[full:m] = True
    pos = np.nonzero(mask)[0]
    ext = np.r_[False, mask, False]
    lefts = np.nonzero(ext[1:-1] & ~ext[:-2])[0]
    rights = np.nonzero(ext[1:-1] & ~ext[2:])[0]
    return pos, lefts, rights


def _normalized(counts: np.ndarray) -> np.ndarray:
    m = counts.max()
    return counts / m if m > 0 else counts.astype(np.float64)


def bitmap_scores_series(
    vals: np.ndarray,
    feature_window_size: int,
    bins: int = 5,
    level_size: int = 3,
    lag_window_size: int = 200,
    lead_window_size: int = 100,
    q: float = 99.7,
) -> tuple[np.ndarray, np.ndarray]:
    """(scores, ±1 labels) for one series — the fit_predict contract
    (tsbitmapper.py:287-310): score[i] = ||bitmap(lag) − bitmap(lead)||²,
    threshold = q-percentile of the interior scores."""
    n = len(vals)
    # series too short for even one n-gram / one lag+lead split: nothing to
    # score — all-normal, all-zero (mirrors the reference's cold-start zeros)
    if n < max(level_size, lag_window_size + lead_window_size):
        return np.zeros(n), np.full(n, -1, dtype=np.int32)
    sym = _sax_symbols(np.asarray(vals, dtype=np.float64), feature_window_size, bins)
    base = bins + 2
    space = base**level_size
    codes = _ngram_codes(sym, level_size, base)
    scores = np.zeros(n)
    lag_pos, lag_l, lag_r = _counted_pattern(lag_window_size, feature_window_size, level_size)
    lead_pos, lead_l, lead_r = _counted_pattern(lead_window_size, feature_window_size, level_size)
    i0 = lag_window_size
    lag_counts = np.bincount(codes[(i0 - lag_window_size) + lag_pos], minlength=space)
    lead_counts = np.bincount(codes[i0 + lead_pos], minlength=space)
    for i in range(i0, n - lead_window_size + 1):
        if i > i0:
            s_old = i - 1 - lag_window_size  # lag chunk slides s_old → s_old+1
            np.subtract.at(lag_counts, codes[s_old + lag_l], 1)
            np.add.at(lag_counts, codes[s_old + 1 + lag_r], 1)
            np.subtract.at(lead_counts, codes[i - 1 + lead_l], 1)
            np.add.at(lead_counts, codes[i + lead_r], 1)
        d = _normalized(lag_counts) - _normalized(lead_counts)
        scores[i] = float(d @ d)
    interior = scores[lag_window_size : n - lead_window_size + 1]
    thres = np.percentile(interior, q) if len(interior) else np.inf
    labels = np.where(scores > thres, 1, -1).astype(np.int32)
    return scores, labels


def bitmap_scores_supervised_series(
    train_vals: np.ndarray,
    test_vals: np.ndarray,
    feature_window_size: int,
    bins: int = 5,
    level_size: int = 3,
    lead_window_size: int = 100,
    q: float = 99.7,
) -> tuple[np.ndarray, np.ndarray]:
    """Supervised fit/predict contract (tsbitmapper.py:270-284 fit,
    :159-187 _slide_lead_chunks, :312-341 predict): the reference bitmap is
    built from the WHOLE training series — discretized with ONE global
    min/max bin window (``fit`` calls ``discretize(ts)``, tsbitmapper.py:286,
    NOT the per-feature-window variant), while n-gram counting keeps the
    feature-window segmentation (``get_bitmap_with_feat_window``). The test
    series IS per-feature-window discretized (``_slide_lead_chunks`` →
    ``discretize_by_feat_window``, :165). A lead window slides over the test
    series; its bitmap is compared against the fixed reference. Threshold =
    q-percentile of scores[0 : -lead+1] (tsbitmapper.py:335)."""
    n = len(test_vals)
    base = bins + 2
    space = base**level_size
    if len(train_vals) < level_size or n < max(level_size, lead_window_size):
        return np.zeros(n), np.full(n, -1, dtype=np.int32)
    # global-window discretization of the train series = _sax_symbols with a
    # single feature window spanning the whole series (reference fit parity)
    tr_sym = _sax_symbols(np.asarray(train_vals, dtype=np.float64), len(train_vals), bins)
    tr_codes = _ngram_codes(tr_sym, level_size, base)
    ref = _chunk_bitmap(tr_codes, 0, len(tr_sym), feature_window_size, level_size, space)

    te_sym = _sax_symbols(np.asarray(test_vals, dtype=np.float64), feature_window_size, bins)
    te_codes = _ngram_codes(te_sym, level_size, base)
    scores = np.zeros(n)
    lead_pos, lead_l, lead_r = _counted_pattern(lead_window_size, feature_window_size, level_size)
    lead_counts = np.bincount(te_codes[0 + lead_pos], minlength=space)
    for i in range(1, n - lead_window_size + 1):
        np.subtract.at(lead_counts, te_codes[i - 1 + lead_l], 1)
        np.add.at(lead_counts, te_codes[i + lead_r], 1)
        d = ref - _normalized(lead_counts)
        scores[i] = float(d @ d)
    interior = scores[0 : n - lead_window_size + 1]
    thres = np.percentile(interior, q) if len(interior) else np.inf
    labels = np.where(scores > thres, 1, -1).astype(np.int32)
    return scores, labels


def bitmap_scores_supervised(
    test_df: DataFrame,
    train_df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    feature_window_size: int = 50,
    bins: int = 5,
    level_size: int = 3,
    lead_window_size: int = 100,
    q: float = 99.7,
) -> DataFrame:
    """Spark wrapper for the supervised path: per-key training series are
    collected into a broadcast dict (training data is reference-sized, not
    corpus-sized), then each test key group scores in one pandas kernel.
    A hard row cap guards the driver: exceeding it means the caller is
    pointing a corpus at a reference-data seam."""
    _check_fw_level(feature_window_size, level_size)  # raise at plan time
    max_train_rows = 5_000_000  # ~120 MB of (key, ts, double) — driver-safe
    n_train = train_df.count()
    if n_train > max_train_rows:
        raise ValueError(
            f"supervised bitmap training set has {n_train} rows "
            f"(cap {max_train_rows}): the reference bitmap is meant to be "
            "reference-sized; downsample or aggregate the training series"
        )
    train_pdf = (
        train_df.select(*keys, order_col, val_col)
        .toPandas()
        .sort_values([*keys, order_col], kind="mergesort")
    )
    train_map = {
        k if isinstance(k, tuple) else (k,): g[val_col].values
        for k, g in train_pdf.groupby(keys)
    }
    bc = test_df.sparkSession.sparkContext.broadcast(train_map)

    out_schema = StructType(
        list(test_df.schema.fields)
        + [StructField("score", DoubleType()), StructField("label", IntegerType())]
    )
    cols = [f.name for f in test_df.schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        k = tuple(pdf.iloc[0][c] for c in keys)
        train_vals = bc.value.get(k)
        if train_vals is None or len(pdf) < lead_window_size:
            return pdf.assign(score=0.0, label=np.int32(-1))[cols + ["score", "label"]]
        s, l = bitmap_scores_supervised_series(
            train_vals, pdf[val_col].values,
            feature_window_size, bins, level_size, lead_window_size, q,
        )
        return pdf.assign(score=s, label=l)[cols + ["score", "label"]]

    return test_df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


def bitmap_scores(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    feature_window_size: int = 50,
    bins: int = 5,
    level_size: int = 3,
    lag_window_size: int = 200,
    lead_window_size: int = 100,
    q: float = 99.7,
) -> DataFrame:
    """applyInPandas wrapper: one kernel group per series key."""
    _check_fw_level(feature_window_size, level_size)  # raise at plan time
    out_schema = StructType(
        list(df.schema.fields)
        + [StructField("score", DoubleType()), StructField("label", IntegerType())]
    )
    cols = [f.name for f in df.schema.fields]

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        s, l = bitmap_scores_series(
            pdf[val_col].values,
            feature_window_size,
            bins,
            level_size,
            lag_window_size,
            lead_window_size,
            q,
        )
        return pdf.assign(score=s, label=l)[cols + ["score", "label"]]

    return df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


# ------------------------------------------------ distributed grid scorer


def grid_offsets(size: int, fw: int, level: int) -> list[int]:
    """Counted-n-gram offsets of a chunk of ``size`` rows — the
    translation-invariant pattern P from :func:`_counted_pattern`, as plain
    ints (pure function of the chunk LENGTH, so it can be inlined as a
    literal array in both the Spark plan and a SQL oracle)."""
    pos, _, _ = _counted_pattern(size, fw, level)
    if len(pos) == 0:
        # an empty pattern would make the offset explode produce no rows and
        # the whole query silently return empty — the exact silent-degenerate
        # failure mode _check_fw_level guards against (ADVICE r03)
        raise ValueError(
            f"chunk size ({size}) must be >= level_size ({level}): "
            "a chunk must hold at least one complete n-gram"
        )
    return [int(p) for p in pos]


def bitmap_grid_scores(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    val_col: str,
    feature_window_size: int,
    bins: int = 5,
    level_size: int = 3,
    lag_window_size: int = 200,
    lead_window_size: int = 100,
) -> DataFrame:
    """W11 at corpus scale: the SAME lag/lead bitmap distance as
    :func:`bitmap_scores` (tsbitmapper.py:287-310), but fully shuffle-parallel
    — no per-key pandas kernel holding a whole series, no unsalted per-key
    window over raw rows anywhere:

    * row numbers come from per-(key, coarse-bucket) count composition
      (``scoring._global_row_numbers``),
    * per-feature-window SAX binning is a (key, window-index) groupBy + join
      (floor arithmetic — the ``sax_symbols_df`` semantics; np.digitize
      ulp-edge parity lives in the kernel path),
    * n-gram codes come from equi-self-joins on consecutive row numbers,
    * each interior position i explodes against the chunk's counted-offset
      pattern (:func:`grid_offsets`) and counts land via a (key, pos)
      equi-join + hash groupBy — the per-(key, i) groups are bounded by the
      chunk size, never by the series length.

    EXACT cross-engine algebra: instead of normalizing each bitmap by its max
    (float division per cell), the squared distance is computed as one integer
    numerator — score = Σ_c (ca_c·Mb − cb_c·Ma)² / (Ma·Mb)² — so ``score_num``
    / ``ma`` / ``mb`` are order-independent BIGINTs and ``score`` is a single
    float division, bitwise-identical across engines and parallelism levels.

    Emits ONLY interior positions i ∈ [lag, n_k − lead] (the kernel pads the
    warm-up/tail with zeros; the grid form leaves them out). Requires non-null
    ``val_col`` and a total order per key on ``order_col``.
    """
    _check_fw_level(feature_window_size, level_size)
    fw, level = feature_window_size, level_size
    lag, lead = lag_window_size, lead_window_size
    # a lag/lead chunk shorter than the n-gram counts nothing — reject loudly
    # instead of silently returning an empty frame (ADVICE r03)
    if lag < level or lead < level:
        raise ValueError(
            f"lag_window_size ({lag}) and lead_window_size ({lead}) must both "
            f"be >= level_size ({level}): a chunk must hold one complete n-gram"
        )
    base = bins + 2

    slim = df.select(*keys, order_col, val_col)
    # multi-consumer frame: codes joins (level), nk, the i×offset joins and
    # the final timestamp join all re-read it — persist per CLAUDE.md
    from mtsad_spark.plans.scope import scoped_persist

    sym = scoped_persist(
        sax_symbols_df(slim, keys, order_col, val_col, fw, bins, pos_col="pos")
        .select(*keys, order_col, "pos", F.col("symbol").cast("long").alias("symbol"))
    )

    codes = sym.select(*keys, "pos", (F.col("symbol") + 1).alias("_c"))
    expr = F.col("_c").cast("long")
    for l in range(1, level):
        nxt = sym.select(
            *keys, (F.col("pos") - l).alias("pos"), (F.col("symbol") + 1).alias(f"_c{l}")
        )
        codes = codes.join(nxt, [*keys, "pos"])
        expr = expr * base + F.col(f"_c{l}")
    codes = scoped_persist(codes.select(*keys, "pos", expr.alias("code")))

    # interior positions i ∈ [lag, n_k − lead], derived ROW-PARALLEL from the
    # existing per-position rows (ADVICE r03): a sequence(lag, n−lead) on the
    # one-row-per-key nk frame would materialize a single array proportional
    # to the SERIES length in one task (and Spark caps sequence length at
    # ~2^31) — the exact hot-key shape this operator bans everywhere else.
    nk = sym.groupBy(*keys).agg(F.count(F.lit(1)).alias("_n"))
    ii = (
        sym.select(*keys, F.col("pos").alias("i"))
        .join(nk, [*keys])
        .filter((F.col("i") >= lag) & (F.col("i") <= F.col("_n") - lead))
        .select(*keys, "i")
    )

    def _side(offsets: list[int], start_shift: int, cnt_name: str) -> DataFrame:
        need = ii.select(
            *keys,
            "i",
            F.explode(F.array(*[F.lit(p) for p in offsets])).alias("_p"),
        ).withColumn("pos", F.col("i") + F.lit(start_shift) + F.col("_p"))
        return (
            need.join(codes, [*keys, "pos"])
            .groupBy(*keys, "i", "code")
            .agg(F.count(F.lit(1)).alias(cnt_name))
        )

    lagc = _side(grid_offsets(lag, fw, level), -lag, "ca")
    leadc = _side(grid_offsets(lead, fw, level), 0, "cb")
    ma = lagc.groupBy(*keys, "i").agg(F.max("ca").alias("ma"))
    mb = leadc.groupBy(*keys, "i").agg(F.max("cb").alias("mb"))
    pair = (
        lagc.join(leadc, [*keys, "i", "code"], "full_outer")
        .join(ma, [*keys, "i"])
        .join(mb, [*keys, "i"])
    )
    term = F.coalesce(F.col("ca"), F.lit(0)) * F.col("mb") - F.coalesce(
        F.col("cb"), F.lit(0)
    ) * F.col("ma")
    num = pair.groupBy(*keys, "i").agg(
        F.sum(term * term).alias("score_num"),
        F.first("ma").alias("ma"),
        F.first("mb").alias("mb"),
    )
    den = (F.col("ma") * F.col("mb")) * (F.col("ma") * F.col("mb"))
    ts = sym.select(*keys, F.col("pos").alias("i"), order_col)
    return (
        num.join(ts, [*keys, "i"])
        .withColumn("score", F.col("score_num").cast("double") / den.cast("double"))
        .select(*keys, F.col("i").alias("pos"), order_col, "score_num", "ma", "mb", "score")
    )


# -------------------------------------------------- distributed bitmap algebra


def sax_symbols_df(
    df: DataFrame, keys: list[str], order_col: str, val_col: str,
    feature_window_size: int, bins: int, pos_col: str | None = None,
) -> DataFrame:
    """Distributed approximate SAX: per-(key, feature-window) equal-width
    binning with floor() arithmetic (boundary values can differ from
    np.digitize by one ulp-edge — exact parity lives in the kernel path).

    Scale-clean: row positions come from per-(key, coarse-bucket) count
    composition (``scoring._global_row_numbers``) and the per-window min/max
    from a groupBy + join — no window partitioned by the bare key ever spans
    the raw rows, so a hot key cannot serialize through one task. Pass
    ``pos_col`` to keep the 0-based per-key position in the output."""
    from ..operators.scoring import _global_row_numbers

    b = _global_row_numbers(df, keys, order_col).withColumn(
        "_fwi", F.floor(F.col("_rn") / feature_window_size).cast("long")
    )
    wstat = b.groupBy(*keys, "_fwi").agg(
        F.min(val_col).alias("_lo"), F.max(val_col).alias("_hi")
    )
    gstat = b.groupBy(*keys).agg(
        F.min(val_col).alias("_glo"), F.max(val_col).alias("_ghi")
    )
    j = b.join(wstat, [*keys, "_fwi"]).join(gstat, [*keys])
    lo2 = F.when(F.col("_lo") == F.col("_hi"), F.col("_glo")).otherwise(F.col("_lo"))
    hi2 = F.when(F.col("_lo") == F.col("_hi"), F.col("_ghi")).otherwise(F.col("_hi"))
    step = (hi2 - lo2) / bins
    sym = F.when(step == F.lit(0.0), F.lit(0)).otherwise(
        F.least(F.floor((F.col(val_col) - lo2) / step), F.lit(bins - 1))
    )
    out = j.withColumn("symbol", sym.cast("int"))
    if pos_col is not None:
        out = out.withColumn(pos_col, F.col("_rn"))
    return out.drop("_rn", "_fwi", "_lo", "_hi", "_glo", "_ghi")


def ngram_bitmap(
    symbols: DataFrame, keys: list[str], order_col: str, level: int = 3,
    normalize: bool = True,
) -> DataFrame:
    """A14: level-gram frequency bitmap, max-normalized, fully distributed —
    consecutive symbols gathered by equi-self-joins on composed row numbers
    (no bare-key window over raw rows), n-gram string → hash groupBy count →
    per-key max over the COUNT frame (groups bounded by the alphabet^level,
    not the series length). ``normalize=False`` keeps the raw integer counts
    (``freq`` BIGINT) — the exact-arithmetic input
    :func:`bitmap_distance_join_exact` needs."""
    from ..operators.scoring import _global_row_numbers

    b = _global_row_numbers(
        symbols.select(*keys, order_col, "symbol"), keys, order_col
    ).select(*keys, F.col("_rn").alias("_pos"), "symbol")
    g = b.select(*keys, "_pos", F.col("symbol").cast("string").alias("_p0"))
    parts = [F.col("_p0")]
    for l in range(1, level):
        nxt = b.select(
            *keys, (F.col("_pos") - l).alias("_pos"),
            F.col("symbol").cast("string").alias(f"_p{l}"),
        )
        g = g.join(nxt, [*keys, "_pos"])  # inner join drops incomplete tails
        parts.append(F.col(f"_p{l}"))
    g = g.withColumn("ngram", F.concat_ws(",", *parts))
    counts = g.groupBy(*keys, "ngram").agg(F.count("*").alias("freq"))
    if not normalize:
        return counts
    wmax = Window.partitionBy(*keys)
    return counts.withColumn("freq", F.col("freq") / F.max("freq").over(wmax))


def bitmap_distance_join(
    bm_a: DataFrame, bm_b: DataFrame, keys: list[str]
) -> DataFrame:
    """J4/A15: squared distance between two bitmaps — FULL OUTER join on the
    n-gram key, missing key ⇒ 0 (tsbitmapper.py:251-269)."""
    a = bm_a.select(*keys, "ngram", F.col("freq").alias("fa"))
    b = bm_b.select(*keys, "ngram", F.col("freq").alias("fb"))
    j = a.join(b, [*keys, "ngram"], "full_outer")
    d = F.coalesce(F.col("fa"), F.lit(0.0)) - F.coalesce(F.col("fb"), F.lit(0.0))
    return j.groupBy(*keys).agg(F.sum(d * d).alias("distance"))


def bitmap_distance_join_exact(
    cnt_a: DataFrame, cnt_b: DataFrame, keys: list[str]
) -> DataFrame:
    """J4/A15 in EXACT integer arithmetic: the same full-outer bitmap union
    (tsbitmapper.py:251-269), but over RAW counts (``ngram_bitmap(...,
    normalize=False)``): with per-key max counts Ma/Mb, the normalized
    squared distance Σ(ca/Ma − cb/Mb)² = Σ(ca·Mb − cb·Ma)² / (Ma·Mb)², so
    the sum stays a BIGINT (order-independent across any parallelism) and
    ONE final float division makes the result bitwise-identical in any
    engine — the bitmap_grid_scores integer-numerator discipline."""
    ma = cnt_a.groupBy(*keys).agg(F.max("freq").alias("_ma"))
    mb = cnt_b.groupBy(*keys).agg(F.max("freq").alias("_mb"))
    a = cnt_a.select(*keys, "ngram", F.col("freq").alias("ca"))
    b = cnt_b.select(*keys, "ngram", F.col("freq").alias("cb"))
    j = a.join(b, [*keys, "ngram"], "full_outer").join(ma, [*keys]).join(mb, [*keys])
    term = (
        F.coalesce(F.col("ca"), F.lit(0)) * F.col("_mb")
        - F.coalesce(F.col("cb"), F.lit(0)) * F.col("_ma")
    )
    num = j.groupBy(*keys).agg(
        F.sum(term * term).alias("dist_num"),
        F.first("_ma").alias("ma"),
        F.first("_mb").alias("mb"),
    )
    den = (F.col("ma") * F.col("mb")) * (F.col("ma") * F.col("mb"))
    return num.withColumn(
        "distance", F.col("dist_num").cast("double") / den.cast("double")
    )
