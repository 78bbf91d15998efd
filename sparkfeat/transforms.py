"""Transform registry T1–T11 (SURVEY.md §2.5).

Re-expresses ``alphai_feature_generation/feature/transform.py`` (registry
``FEATURE_TRANSFORMATIONS_MAPPING``, transform.py:235-246) as Spark
Column expressions over per-conversation trailing windows. Exact
semantics preserved:

* log-return clip bound ``MAX_LOG_RETURN = 0.1`` (transform.py:7);
* ±inf → null before clipping (transform.py:44) — Spark's ``log`` of a
  non-positive argument already yields null, matching
  pandas' ``replace([inf,-inf], nan)`` on ``log(pct_change+1)``;
* volatility = rolling **sample** std (ddof=1) with ``min_periods=3``
  (transform.py:108-110);
* stochastic %K ``100·(last−min)/(max−min)`` (transform.py:124-127);
* Kaufman ER: |Δ_lag| / rolling_lag_sum(|Δ_1|) (transform.py:151-158);
* EWMA ``ewm(halflife=h, adjust=True).mean()`` (transform.py:139-140) —
  the only sequential-state transform; implemented exactly via a scaled
  weighted-cumsum (see :func:`ewma`), with a distributed chunk-scan
  variant for skewed mega-conversations (:func:`ewma` with
  ``chunk_size``).

Everything except EWMA/GASF/GADF/MTF stays in whole-stage codegen.
Floats default to float64 in the plan; pass ``dtype='float'`` for the
reference's float32 hot path (transformation/financial.py:149-150).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from sparkfeat.windows import ORDER_COLS, trailing, unbounded_trailing, w_entity

#: transform.py:7
MAX_LOG_RETURN = 0.1


def _clip(c: Column, lo: float, hi: float) -> Column:
    """Null-preserving clip. NB ``F.least``/``F.greatest`` skip nulls —
    a bare least/greatest would resurrect nulls as the bound."""
    return F.when(c.isNull(), F.lit(None).cast("double")).otherwise(
        F.least(F.greatest(c, F.lit(lo)), F.lit(hi))
    )


def value(v: str | Column) -> Column:
    """T1 identity (transform.py:226-232)."""
    return F.col(v) if isinstance(v, str) else v


def log_return(
    v: str | Column,
    clip: float | None = MAX_LOG_RETURN,
    entity_col: str = "conv_id",
) -> Column:
    """T2/T3 log-return: ``log(pct_change+1)``, ±inf→null, clip ±0.1.

    transform.py:32-52 and clip variant transform.py:65-82 (same math).
    ``log(v/lag(v))``: first row per conversation → null (lag null);
    prev==0 → null (nullif); ratio ≤ 0 → null (Spark log domain), which
    is exactly pandas' inf/nan → NaN replacement.
    """
    col = value(v)
    prev = F.lag(col).over(w_entity(entity_col))
    r = F.log(col / F.nullif(prev, F.lit(0.0)))
    return _clip(r, -clip, clip) if clip is not None else r


def log_return_y(
    y: str | Column, ref: str | Column, clip: float | None = MAX_LOG_RETURN
) -> Column:
    """Target-path log-return ``log(y/ref)`` clipped (transform.py:55-62,
    :84-94): future value vs value at prediction time."""
    r = F.log(value(y) / F.nullif(value(ref), F.lit(0.0)))
    return _clip(r, -clip, clip) if clip is not None else r


def volatility(
    v: str | Column,
    window: int,
    min_periods: int = 3,
    clip: float | None = None,
    entity_col: str = "conv_id",
) -> Column:
    """T4 rolling sample std of the log-return (transform.py:97-114).

    pandas ``rolling(window, min_periods=3).std()`` counts non-NaN values
    in the frame; ``stddev_samp`` ignores nulls, so gating on
    ``count(lr) >= min_periods`` reproduces it exactly.

    NB the reference's ``TransformVolatility.transform_x`` never calls
    ``shrink_tails`` — the std runs over **unclipped** log-returns
    (transform.py:101-102), so ``clip`` defaults to None here; pass
    ``clip=MAX_LOG_RETURN`` to opt into tail shrinking.
    """
    lr = log_return(v, clip=clip, entity_col=entity_col)
    fr = trailing(window, entity_col)
    return F.when(
        F.count(lr).over(fr) >= min_periods, F.stddev_samp(lr).over(fr)
    )


def stochastic_k(v: str | Column, length: int, entity_col: str = "conv_id") -> Column:
    """T5 stochastic %K over the trailing ``length`` rows
    (transform.py:117-128): ``100·(cur−min)/(max−min)``; flat window →
    null (pandas emits ±inf/NaN there)."""
    col = value(v)
    fr = trailing(length, entity_col)
    mn, mx = F.min(col).over(fr), F.max(col).over(fr)
    return F.lit(100.0) * (col - mn) / F.nullif(mx - mn, F.lit(0.0))


def ker(v: str | Column, lag: int, entity_col: str = "conv_id") -> Column:
    """T7 Kaufman efficiency ratio (transform.py:144-166).

    ``direction=|v−v.shift(lag)|``; ``volatility=rolling(lag).sum(|Δ1|)``
    (min_periods=lag ⇒ require ``lag`` non-null single-step diffs in the
    frame); ratio, with 0-denominator → null.
    """
    col = value(v)
    w = w_entity(entity_col)
    direction = F.abs(col - F.lag(col, lag).over(w))
    d1 = F.abs(col - F.lag(col, 1).over(w))
    fr = trailing(lag, entity_col)
    vol = F.when(F.count(d1).over(fr) >= lag, F.sum(d1).over(fr))
    return direction / F.nullif(vol, F.lit(0.0))


# ---------------------------------------------------------------------------
# T6 EWMA — exact pandas ewm(halflife, adjust=True).mean() semantics.
# ---------------------------------------------------------------------------


def _ewma_sw(
    x: np.ndarray, a: float, s0: float = 0.0, w0: float = 0.0
) -> tuple[np.ndarray, np.ndarray]:
    """Weighted-cumsum EWMA state: S_t = Σ_{i≤t, valid} a^(t−i)·x_i and
    W_t = Σ_{i≤t, valid} a^(t−i)·1.

    ``ewm(adjust=True, ignore_na=False)`` weights by absolute position,
    NaNs contributing zero weight — exactly this pair; mean = S/W.
    Vectorized as a scaled cumsum, evaluated in blocks so the a^(−i)
    scale factor never overflows (block length capped by halflife).
    """
    n = len(x)
    valid = np.isfinite(x)
    xv = np.where(valid, x, 0.0)
    wv = valid.astype(np.float64)
    S = np.empty(n)
    W = np.empty(n)
    # a = 2^(-1/h)  ⇒  a^(-i) = 2^(i/h): keep i/h ≤ 900 per block.
    h = -1.0 / math.log2(a)
    block = max(1, min(n, int(900 * h)))
    s_carry = s0  # inbound state (chunked/streamed evaluation)
    w_carry = w0
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        i = np.arange(hi - lo, dtype=np.float64)
        up = a ** (-i)  # bounded by 2^900
        down = a**i
        S[lo:hi] = np.cumsum(xv[lo:hi] * up) * down + (a ** (i + 1)) * s_carry
        W[lo:hi] = np.cumsum(wv[lo:hi] * up) * down + (a ** (i + 1)) * w_carry
        s_carry = S[hi - 1]
        w_carry = W[hi - 1]
    return S, W


def ewma(
    df: DataFrame,
    v: str,
    halflife: float,
    out_col: str = "ewma",
    entity_col: str = "conv_id",
    chunk_size: int | None = None,
) -> DataFrame:
    """T6 EWMA, pandas ``ewm(halflife=h, adjust=True).mean()`` exact
    (transform.py:131-141).

    Two physical strategies:

    * ``chunk_size=None`` — one Arrow ``applyInPandas`` group per
      conversation. Right answer when conversations are bounded.
    * ``chunk_size=k`` — **distributed chunk scan** for skewed
      mega-conversations (SURVEY.md §4 "skew handling"): conversations
      are split into k-row chunks processed in parallel; each chunk
      emits local (S, W) plus its decay a^len; a tiny per-conversation
      sequential scan over chunk summaries (thousands of rows, not
      turns) produces each chunk's inbound carry, broadcast-joined back:
      ``S_global = S_local + a^(pos+1)·S_carry``. Bit-compatible with
      the unchunked path up to float addition order (verified ~1e-12 in
      tests); no single task ever holds a whole mega-conversation.
    """
    a = 0.5 ** (1.0 / halflife)
    order = list(ORDER_COLS)
    out_schema = StructType(
        df.schema.fields + [StructField(out_col, DoubleType(), True)]
    )

    if chunk_size is None:

        def _per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(order, kind="mergesort")
            S, W = _ewma_sw(pdf[v].to_numpy(dtype=np.float64), a)
            with np.errstate(invalid="ignore", divide="ignore"):
                m = S / W
            pdf[out_col] = np.where(W > 0, m, np.nan)
            return pdf

        return df.groupBy(entity_col).applyInPandas(_per_conv, schema=out_schema)

    # --- distributed chunk scan -------------------------------------------
    w = w_entity(entity_col)
    chunked = df.withColumn("_pos", F.row_number().over(w) - 1).withColumn(
        "_chunk", (F.col("_pos") / chunk_size).cast("int")
    )

    local_schema = StructType(
        chunked.schema.fields
        + [StructField("_S", DoubleType(), True), StructField("_W", DoubleType(), True)]
    )

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        S, W = _ewma_sw(pdf[v].to_numpy(dtype=np.float64), a)
        pdf["_S"] = S
        pdf["_W"] = W
        return pdf

    local = chunked.groupBy(entity_col, "_chunk").applyInPandas(_local, local_schema)

    # Chunk summaries: last row of each chunk → sequential scan per conv.
    summaries = (
        local.groupBy(entity_col, "_chunk")
        .agg(
            F.max_by("_S", "_pos").alias("_S_end"),
            F.max_by("_W", "_pos").alias("_W_end"),
            F.count(F.lit(1)).alias("_len"),
        )
    )
    carry_schema = StructType(
        [
            summaries.schema[entity_col],
            summaries.schema["_chunk"],
            StructField("_S_carry", DoubleType(), True),
            StructField("_W_carry", DoubleType(), True),
        ]
    )

    def _scan(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_chunk")
        s_c, w_c = 0.0, 0.0
        s_out, w_out = [], []
        for s_end, w_end, ln in zip(pdf["_S_end"], pdf["_W_end"], pdf["_len"]):
            s_out.append(s_c)
            w_out.append(w_c)
            decay = a ** float(ln)
            s_c = s_end + decay * s_c
            w_c = w_end + decay * w_c
        return pd.DataFrame(
            {
                pdf.columns[0]: pdf[pdf.columns[0]],
                "_chunk": pdf["_chunk"],
                "_S_carry": s_out,
                "_W_carry": w_out,
            }
        )

    carries = summaries.groupBy(entity_col).applyInPandas(_scan, carry_schema)

    joined = local.join(F.broadcast(carries), [entity_col, "_chunk"], "left")
    pos_in_chunk = F.col("_pos") - F.col("_chunk") * chunk_size
    decay_col = F.pow(F.lit(a), pos_in_chunk + 1)
    S_g = F.col("_S") + decay_col * F.coalesce(F.col("_S_carry"), F.lit(0.0))
    W_g = F.col("_W") + decay_col * F.coalesce(F.col("_W_carry"), F.lit(0.0))
    result = joined.withColumn(
        out_col, F.when(W_g > 0, S_g / W_g)
    )
    return result.drop("_pos", "_chunk", "_S", "_W", "_S_carry", "_W_carry")


def ewma_sorted(
    df: DataFrame,
    specs: list[tuple[str, float, str]],
    entity_col: str = "conv_id",
) -> DataFrame:
    """T6 EWMA fast path for entity-sorted streams: one ``mapInPandas``
    pass computing EVERY (value_col, halflife, out_col) spec at once.

    Requires the input already hash-partitioned by ``entity_col`` and
    sorted by (entity, ts, turn_idx) within partitions — true after
    :func:`sparkfeat.windows.repartition_sorted`, after any window
    stage on that order, or scanning a bucketed/Iceberg table with a
    matching sort order. Under that contract this does **one Python
    crossing per Arrow batch** (not per conversation): segment
    boundaries inside a batch are found vectorized, and a conversation
    spanning batch/chunk boundaries carries its (S, W) state forward —
    the same decayed-carry algebra as the chunked scan, so results are
    identical to pandas ``ewm(halflife, adjust=True).mean()``.

    This removes the per-group Arrow overhead that dominates
    ``applyInPandas`` when conversations are small (millions of tiny
    groups), while staying safe for mega-conversations (state is O(1)
    per spec regardless of conversation length).
    """
    from collections.abc import Iterator

    from pyspark.sql.types import StructField, StructType

    out_schema = StructType(
        df.schema.fields
        + [StructField(out, DoubleType(), True) for _, _, out in specs]
    )
    alphas = [0.5 ** (1.0 / h) for _, h, _ in specs]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        last_conv = None
        carry = [(0.0, 0.0)] * len(specs)
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                yield pdf.assign(**{out: [] for _, _, out in specs})
                continue
            convs = pdf[entity_col].to_numpy()
            change = np.flatnonzero(convs[1:] != convs[:-1]) + 1
            starts = np.concatenate(([0], change))
            ends = np.concatenate((change, [n]))
            for k, ((v, _h, out), a) in enumerate(zip(specs, alphas)):
                x = pdf[v].to_numpy(dtype=np.float64)
                res = np.empty(n)
                for s, e in zip(starts, ends):
                    s0, w0 = (
                        carry[k] if (s == 0 and convs[0] == last_conv) else (0.0, 0.0)
                    )
                    S, W = _ewma_sw(x[s:e], a, s0, w0)
                    with np.errstate(invalid="ignore", divide="ignore"):
                        res[s:e] = np.where(W > 0, S / W, np.nan)
                    if e == n:
                        carry[k] = (float(S[-1]), float(W[-1]))
                pdf[out] = res
            last_conv = convs[-1]
            yield pdf

    return df.mapInPandas(gen, out_schema)


# ---------------------------------------------------------------------------
# T8–T10 image transforms (GASF / GADF / MTF) — vectorized pandas UDF math.
# ---------------------------------------------------------------------------


def _paa(x: np.ndarray, image_size: int) -> np.ndarray:
    """Piecewise aggregate approximation: mean over image_size segments
    (the resize step pyts applies before the polar encoding)."""
    segments = np.array_split(np.arange(len(x)), image_size)
    return np.array([x[s].mean() for s in segments])


def gasf_image(x: np.ndarray, image_size: int) -> np.ndarray:
    """T8 Gramian Angular Summation Field (transform.py:169-185 semantics:
    pyts GASF with scale='-1'): PAA-resize → min-max to [-1,1] →
    φ=arccos → cos(φ_i+φ_j), flattened row-major to image_size²."""
    p = _paa(np.asarray(x, dtype=np.float64), image_size)
    rng = p.max() - p.min()
    scaled = np.zeros_like(p) if rng == 0 else (2.0 * (p - p.min()) / rng - 1.0)
    scaled = np.clip(scaled, -1.0, 1.0)
    cos = scaled
    sin = np.sqrt(np.clip(1.0 - scaled**2, 0.0, 1.0))
    return (np.outer(cos, cos) - np.outer(sin, sin)).ravel()


def gadf_image(x: np.ndarray, image_size: int) -> np.ndarray:
    """T9 Gramian Angular Difference Field (transform.py:188-204):
    sin(φ_i−φ_j) = sin_i·cos_j − cos_i·sin_j."""
    p = _paa(np.asarray(x, dtype=np.float64), image_size)
    rng = p.max() - p.min()
    scaled = np.zeros_like(p) if rng == 0 else (2.0 * (p - p.min()) / rng - 1.0)
    scaled = np.clip(scaled, -1.0, 1.0)
    cos = scaled
    sin = np.sqrt(np.clip(1.0 - scaled**2, 0.0, 1.0))
    return (np.outer(sin, cos) - np.outer(cos, sin)).ravel()


def mtf_image(x: np.ndarray, image_size: int, n_bins: int = 7) -> np.ndarray:
    """T10 Markov Transition Field (transform.py:207-223): empirical
    quantile bins (n_bins=7), first-order transition matrix normalized
    per row, field M_ij = W[q_i, q_j], PAA-averaged to image_size²."""
    x = np.asarray(x, dtype=np.float64)
    n = len(x)
    qs = np.quantile(x, np.linspace(0, 1, n_bins + 1)[1:-1])
    q = np.searchsorted(qs, x, side="right")
    W = np.zeros((n_bins, n_bins))
    np.add.at(W, (q[:-1], q[1:]), 1.0)
    row = W.sum(axis=1, keepdims=True)
    with np.errstate(invalid="ignore"):
        W = np.where(row > 0, W / row, 0.0)
    field = W[np.ix_(q, q)]
    segments = np.array_split(np.arange(n), image_size)
    out = np.empty((image_size, image_size))
    for i, si in enumerate(segments):
        for j, sj in enumerate(segments):
            out[i, j] = field[np.ix_(si, sj)].mean()
    return out.ravel()


_IMAGE_FUNCS = {"gasf": gasf_image, "gadf": gadf_image, "mtf": mtf_image}


def window_image_feature(
    df: DataFrame,
    v: str,
    length: int,
    image_size: int,
    kind: str = "gasf",
    out_col: str | None = None,
    entity_col: str = "conv_id",
    dtype: str = "float32",
) -> DataFrame:
    """Image transform over the trailing ``length``-row window of every
    turn: ``collect_list`` gathers the window JVM-side (trailing frame ⇒
    leakage-free), then one Arrow-batched pandas UDF maps each window to
    its image_size² field. Rows with fewer than ``length`` trailing
    values get null (reference rejects short windows,
    ``transformation/base.py:111-125``). ``dtype='float32'`` matches the
    reference's storage dtype; ``'float64'`` keeps the exact math (used
    by the checksum oracles)."""
    fn = _IMAGE_FUNCS[kind]
    out_col = out_col or f"{v}_{kind}"
    from pyspark.sql.types import ArrayType, DoubleType, FloatType

    np_dtype = np.float32 if dtype == "float32" else np.float64
    arr_type = ArrayType(FloatType() if dtype == "float32" else DoubleType())

    @F.pandas_udf(arr_type)
    def _img(windows: pd.Series) -> pd.Series:
        return windows.map(
            lambda w: fn(np.asarray(w, dtype=np.float64), image_size).astype(
                np_dtype
            ).tolist()
        )

    win = F.collect_list(F.col(v)).over(trailing(length, entity_col))
    df = df.withColumn("_win", win)
    return df.withColumn(
        out_col, F.when(F.size("_win") >= length, _img(F.col("_win")))
    ).drop("_win")


#: Registry mirroring FEATURE_TRANSFORMATIONS_MAPPING (transform.py:235-246).
#: Column-expression transforms map name → builder; frame-level transforms
#: (ewma, images) are DataFrame→DataFrame and flagged accordingly.
COLUMN_TRANSFORMS = {
    "value": value,
    "log-return": log_return,
    "clip-log-return": log_return,
    "volatility": volatility,
    "stochastic_k": stochastic_k,
    "ker": ker,
}
FRAME_TRANSFORMS = {
    "ewma": ewma,
    "gasf": window_image_feature,
    "gadf": window_image_feature,
    "mtf": window_image_feature,
}


def rolling_slope(
    y: str | Column,
    window: int,
    min_periods: int = 3,
    entity_col: str = "conv_id",
) -> Column:
    """Rolling OLS trend slope of ``y`` against within-window row
    position over the trailing ``window`` turns — the "is this signal
    drifting up or down right now" feature (the momentum sibling of T4
    volatility; no reference counterpart — the reference's transform
    family stops at level/return/dispersion, SURVEY.md §2 T1–T11).

    Closed form, zero UDFs: with x = row position and n/Σx/Σy/Σxy/Σx²
    as trailing-window aggregates, slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²).
    x is ``row_number`` within the conversation (any affine shift of x
    leaves the slope invariant, so window-local vs global positions are
    equivalent — global row_number keeps it ONE pass over the same
    conv_id partitioning every other transform uses; no extra
    exchange). Windows with fewer than ``min_periods`` non-null y, or
    zero x-variance (single row), yield null — the T4/T5 convention.

    Point-in-time by construction: the frame is trailing-only, so no
    value at ts_t reads turns > t (the leakage invariant
    `audit.leakage_audit` checks).

    Determinism: with integer-valued signals (text_len, token_est) and
    integer x every sum is exact in doubles, so the division is
    bit-identical in any engine; for fractional signals round the
    output (house convention) — the oracle replays the same sums.
    """
    col = value(y)
    x = F.row_number().over(w_entity(entity_col)).cast("double")
    fr = trailing(window, entity_col)
    # count only rows where y is non-null; x-moments must match the
    # SAME row subset or the normal equations mix inconsistent sums
    xv = F.when(col.isNotNull(), x)
    n = F.count(xv).over(fr).cast("double")
    sx = F.sum(xv).over(fr)
    sy = F.sum(col).over(fr)
    sxy = F.sum(xv * col).over(fr)
    sxx = F.sum(xv * xv).over(fr)
    denom = F.nullif(n * sxx - sx * sx, F.lit(0.0))
    return F.when(n >= min_periods, (n * sxy - sx * sy) / denom)


def rolling_corr(
    x: str | Column,
    y: str | Column,
    window: int,
    min_periods: int = 3,
    entity_col: str = "conv_id",
) -> Column:
    """Rolling Pearson correlation between two per-turn signals over
    the trailing ``window`` turns — the co-movement feature ("do reply
    length and tool usage rise together in this conversation right
    now?"), the bivariate sibling of :func:`rolling_slope` built from
    the same closed-form trailing-window sums (six of them), zero UDFs,
    zero extra exchanges, trailing-only frame = leakage-free.

    Rows where EITHER signal is null drop from ALL six moments (the
    pairwise-complete convention — mixing per-signal subsets corrupts
    the cross moment). Windows with fewer than ``min_periods`` complete
    pairs, or zero variance in either signal, yield null.

    Determinism: integer-valued signals keep every sum exact in a
    double; sqrt is IEEE-correctly-rounded everywhere, so the quotient
    replays bit-for-bit (round the output per the house convention).
    """
    xc, yc = value(x), value(y)
    both = xc.isNotNull() & yc.isNotNull()
    xv = F.when(both, xc)
    yv = F.when(both, yc)
    fr = trailing(window, entity_col)
    n = F.count(xv).over(fr).cast("double")
    sx, sy = F.sum(xv).over(fr), F.sum(yv).over(fr)
    sxx = F.sum(xv * xv).over(fr)
    syy = F.sum(yv * yv).over(fr)
    sxy = F.sum(xv * yv).over(fr)
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    return F.when(
        (n >= min_periods) & (vx > 0) & (vy > 0), cov / F.sqrt(vx * vy)
    )


def rolling_autocorr(
    v: str | Column,
    lag: int,
    window: int,
    min_periods: int = 3,
    entity_col: str = "conv_id",
) -> Column:
    """Rolling lag-k autocorrelation of a per-turn signal over the
    trailing ``window`` turns — the serial-dependence member of the
    closed-form window-stat family ("does this conversation's signal
    echo itself k turns later right now?"): the ACF restricted to a
    trailing frame so it stays point-in-time. The reference's transform
    family (SURVEY.md §2 T1–T11) has level (T1), per-step change
    (T2/T3), dispersion (T4) and trend-efficiency (T7) but no serial-
    correlation member — this is the standard next column of a
    time-series feature block (Box–Jenkins ACF, windowed).

    Pure composition of the two existing closed-form pieces: the
    lagged copy comes from ``lag()`` over the SAME ``(conv_id |
    ts, turn_idx)`` partitioning every other transform uses, the
    correlation from :func:`rolling_corr`'s six trailing-window sums —
    zero UDFs, zero extra exchanges (plan-asserted in
    tests/test_trend.py), trailing-only frame = leakage-free by
    construction. The first ``lag`` turns of a conversation have a
    null lagged copy and drop from all six moments (the
    pairwise-complete convention), so windows need ``min_periods``
    complete (y_t, y_{t-lag}) pairs before emitting a value."""
    c = value(v)
    prev = F.lag(c, lag).over(w_entity(entity_col))
    return rolling_corr(
        c, prev, window=window, min_periods=min_periods, entity_col=entity_col
    )


def running_drawdown(
    v: str | Column, entity_col: str = "conv_id"
) -> Column:
    """Running drawdown of a per-turn signal: 1 − value / running-max —
    how far the signal currently sits below its best level so far (0 at
    a fresh peak). The reference's transform family (value, return,
    dispersion) stops short of the peak-relative member every
    drawdown/regression analysis starts from; on transcripts it reads
    "how far has this conversation's signal degraded from its high
    -water mark" (e.g. reward, probe score, message quality).

    An expanding-window ``max`` over the same ``(conv_id | ts,
    turn_idx)`` partitioning — zero extra exchanges next to the other
    window features, trailing-only frame ⇒ leakage-free by
    construction. Non-positive running peaks yield NULL (drawdown is
    scale-relative, undefined across sign changes); null values
    propagate (the running max itself ignores them)."""
    c = value(v)
    peak = F.max(c).over(unbounded_trailing(entity_col))
    return F.when(
        c.isNotNull() & (peak > 0), F.lit(1.0) - c / peak
    )


def cumulative_log_return(
    v: str | Column, entity_col: str = "conv_id", clip: float | None = None
) -> Column:
    """Cumulative log-return since conversation start: Σ of the per-turn
    log-returns = ln(value_t / value_0) when every step is finite — the
    expanding-window companion of T2/T3 (the per-step log-return), i.e.
    "how much has the signal moved in total", additive across turns and
    robust to the per-step clip.

    Implemented as a running SUM of the (optionally clipped) per-step
    log-return over the same conv_id partitioning — one window pass,
    no extra exchange; null/±inf steps contribute nothing to the sum
    (SUM ignores nulls) exactly as the per-step feature nulls them."""
    step = log_return(v, clip=clip, entity_col=entity_col)
    return F.sum(step).over(unbounded_trailing(entity_col))
