"""Technical-indicator operators over per-key ordered series.

The reference computes exactly two indicators — trailing VWAP and
rolling stddev (`/root/reference/spark/jobs/stock_stream.py:61-77`) —
but reserves config for a model layer (`spark/init_config.py:30-35`).
These are the standard next indicators a market pipeline adds, each
expressed the Spark-idiomatic way:

- Bollinger bands / RSI: pure window functions (JVM whole-stage
  codegen; one shuffle on the partition key, no Python).
- EMA: a genuinely *recursive* series (y_i depends on y_{i-1}), which
  no SQL window frame expresses. The scale-correct Spark shape is
  ``applyInPandas`` per key: each symbol's series is small even when
  the table is 100 TB, groups process in parallel across executors,
  and Arrow moves columns in batches.

Float parity: the EMA recurrence multiplies by the *literal* doubles
``alpha`` and ``1 - alpha`` pre-computed once, so an oracle that folds
with the same literals reproduces the identical FP operation sequence.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from sparktrends_spark.caching import persist_tracked


def ema(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    alpha: float = 0.3,
    out_col: str = "ema",
) -> DataFrame:
    """Exponential moving average per key: y_0 = x_0,
    y_i = y_{i-1} * (1 - alpha) + x_i * alpha.

    Recursive ⇒ not window-expressible; runs as one Arrow-batched
    pandas group per key (keys are independent ⇒ embarrassingly
    parallel; series length per key is bounded by the key's history,
    not the table size).
    """
    partition_cols = list(partition_cols)
    one_minus = 1.0 - alpha

    # df.schema is cached on the DataFrame and StructType.add mutates in
    # place — build a fresh StructType instead of add()ing to the original.
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def _compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        out = [0.0] * len(vals)
        acc = 0.0
        for i, v in enumerate(vals):
            acc = v if i == 0 else acc * one_minus + v * alpha
            out[i] = acc
        pdf = pdf.copy()
        pdf[out_col] = out
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(_compute, schema=schema)


def macd(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    fast: int = 12,
    slow: int = 26,
    signal_n: int = 9,
) -> DataFrame:
    """MACD: EMA(fast) − EMA(slow) of the value, plus the signal line
    (EMA(signal_n) of the MACD itself) and the histogram.

    Three chained recurrences — the signal line is an EMA *of a
    derived series*, so even a recursive-window engine couldn't fuse
    it; here all three fold in one Arrow-batched pass per key (same
    per-key parallelism argument as ``ema``). Alphas are the standard
    2/(n+1), seeded y_0 = x_0, matching the oracle's fold literals.
    """
    partition_cols = list(partition_cols)
    a_fast, a_slow, a_sig = (
        2.0 / (fast + 1),
        2.0 / (slow + 1),
        2.0 / (signal_n + 1),
    )

    schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("macd", T.DoubleType()),
            T.StructField("signal", T.DoubleType()),
            T.StructField("histogram", T.DoubleType()),
        ]
    )

    def _fold(vals, alpha):
        one_minus = 1.0 - alpha
        out = [0.0] * len(vals)
        acc = 0.0
        for i, v in enumerate(vals):
            acc = v if i == 0 else acc * one_minus + v * alpha
            out[i] = acc
        return out

    def _compute(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        ema_fast = _fold(vals, a_fast)
        ema_slow = _fold(vals, a_slow)
        macd_l = [f - s for f, s in zip(ema_fast, ema_slow)]
        signal_l = _fold(macd_l, a_sig)
        pdf = pdf.copy()
        pdf["macd"] = macd_l
        pdf["signal"] = signal_l
        pdf["histogram"] = [m - s for m, s in zip(macd_l, signal_l)]
        return pdf

    return df.groupBy(*partition_cols).applyInPandas(_compute, schema=schema)


def _ema_fold_expr(arr_expr: str, alpha: float) -> str:
    """SQL ``aggregate()`` HOF that folds an array<double> into its
    running-EMA array entirely in the JVM: the accumulator carries
    (acc, out) and appends ``acc*(1-a) + x*a`` (seed y_0 = x_0) per
    element — the exact FP operation sequence of the Pandas fold, so
    the two paths are bit-identical. Literals are embedded via repr()
    (shortest round-trip decimal -> same double)."""
    om, a = 1.0 - alpha, alpha
    new_acc = f"if(size(st.out) == 0, x, st.acc * {om!r} + x * {a!r})"
    return (
        f"aggregate({arr_expr}, "
        "named_struct('acc', cast(0.0 as double), "
        "'out', cast(array() as array<double>)), "
        f"(st, x) -> named_struct('acc', {new_acc}, "
        f"'out', array_append(st.out, {new_acc})), "
        "st -> st.out)"
    )


def _collect_sorted_rows(
    df: DataFrame, order_col: str, partition_cols: list[str]
) -> DataFrame:
    """Per key: all rows as one array of structs, sorted by order_col
    (JVM array_sort; order first in the struct so it drives the
    comparison). The per-key series materializes on one task — the
    same per-key memory shape as the applyInPandas twin, minus the
    Python worker and Arrow hop."""
    pair = F.struct(
        F.col(order_col).alias("o"),
        F.struct(*[F.col(c) for c in df.columns]).alias("r"),
    )
    return df.groupBy(*partition_cols).agg(
        F.array_sort(F.collect_list(pair)).alias("_rows")
    )


def _guard_rows(max_rows_per_key: int | None):
    """Optional hard bound on the per-key materialized series: the
    collect_list paths hold one key's FULL history in one task, so a
    pathological key (a million-row symbol) can OOM an executor
    silently. With a bound set, the task fails FAST with a clear
    message pointing at the chunked variant instead."""
    def apply(grouped: DataFrame) -> DataFrame:
        if max_rows_per_key is None:
            return grouped
        return grouped.withColumn(
            "_rows",
            F.when(
                F.size("_rows") <= int(max_rows_per_key), F.col("_rows")
            ).otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            "per-key series exceeds max_rows_per_key="
                            f"{int(max_rows_per_key)} (got "
                        ),
                        F.size("_rows").cast("string"),
                        F.lit(
                            " rows); use ema_chunked for bounded memory"
                        ),
                    )
                )
            ),
        )
    return apply


def ema_jvm(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    alpha: float = 0.3,
    out_col: str = "ema",
    max_rows_per_key: int | None = None,
) -> DataFrame:
    """JVM-only EMA — same signature and bit-identical results to
    ``ema``, with no Python in the plan: collect_list -> array_sort ->
    ``aggregate()`` HOF fold -> explode. One shuffle (the groupBy);
    the sequential fold runs inside the JVM per key, keys in parallel
    across executors — the same parallelism bound as the Pandas path
    (per-key series length), without Arrow transfer or Python workers.
    """
    partition_cols = list(partition_cols)
    grouped = _guard_rows(max_rows_per_key)(
        _collect_sorted_rows(df, order_col, partition_cols)
    )
    vals = f"transform(_rows, p -> cast(p.r.{value_col} as double))"
    emas = grouped.withColumn("_emas", F.expr(_ema_fold_expr(vals, alpha)))
    return emas.select(
        F.explode(F.arrays_zip("_rows", "_emas")).alias("z")
    ).select("z._rows.r.*", F.col("z._emas").alias(out_col))


def macd_jvm(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    fast: int = 12,
    slow: int = 26,
    signal_n: int = 9,
    max_rows_per_key: int | None = None,
) -> DataFrame:
    """JVM-only MACD — same signature and bit-identical results to
    ``macd``: three chained ``aggregate()`` folds (fast/slow EMA over
    the value series, signal EMA over the derived MACD series) plus
    two ``zip_with`` differences, all inside one stage after the
    groupBy shuffle. No Python workers anywhere in the plan."""
    partition_cols = list(partition_cols)
    a_fast, a_slow, a_sig = (
        2.0 / (fast + 1),
        2.0 / (slow + 1),
        2.0 / (signal_n + 1),
    )
    grouped = _guard_rows(max_rows_per_key)(
        _collect_sorted_rows(df, order_col, partition_cols)
    )
    vals = f"transform(_rows, p -> cast(p.r.{value_col} as double))"
    step = (
        grouped.withColumn("_ef", F.expr(_ema_fold_expr(vals, a_fast)))
        .withColumn("_es", F.expr(_ema_fold_expr(vals, a_slow)))
        .withColumn("_macd", F.expr("zip_with(_ef, _es, (f, s) -> f - s)"))
        .withColumn("_sig", F.expr(_ema_fold_expr("_macd", a_sig)))
        .withColumn("_hist", F.expr("zip_with(_macd, _sig, (m, s) -> m - s)"))
    )
    return step.select(
        F.explode(F.arrays_zip("_rows", "_macd", "_sig", "_hist")).alias("z")
    ).select(
        "z._rows.r.*",
        F.col("z._macd").alias("macd"),
        F.col("z._sig").alias("signal"),
        F.col("z._hist").alias("histogram"),
    )


def ema_chunked(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    alpha: float = 0.3,
    out_col: str = "ema",
    chunk_rows: int = 100_000,
) -> DataFrame:
    """EMA with per-task memory bounded by ``chunk_rows`` — the scale
    path when one key's history is too long to materialize in a single
    task (``ema``/``ema_jvm`` hold a key's FULL series in one task).

    The recurrence is linear, so it decomposes exactly: split each
    key's series into row-count chunks; fold each chunk locally with a
    ZERO boundary (for chunk 0 the seeded fold, y_0 = x_0); then one
    tiny per-key pass over chunk summaries (end-value + decay factor
    ``(1-a)^len`` per chunk — n_chunks rows, not n_rows) computes each
    chunk's true boundary accumulator B; finally each local value is
    corrected by the decayed boundary: ``y_j = l_j + B·(1-a)^(j+1)``.

    Cost: one window pass to number rows (WindowExec spills, never
    holds a key on-heap), one Arrow-batched local fold per (key,
    chunk) group holding at most ``chunk_rows`` rows per task (a JVM
    ``aggregate()`` fold would be O(chunk²) — ``array_append`` copies
    the array per element — so the hot local fold is the Pandas path,
    same as ``ema``), one per-key summary fold over n_chunks rows, one
    (key, chunk) equi-join. Results match the sequential fold to FP
    reassociation error (~1e-12 relative — the decomposition is exact
    in real arithmetic), unlike ``ema``/``ema_jvm`` which are
    bit-identical to each other; tests assert the tolerance on a
    million-row key.
    """
    partition_cols = list(partition_cols)
    om = 1.0 - alpha
    wn = Window.partitionBy(*partition_cols).orderBy(order_col)
    chunked = df.withColumn(
        "_rn", F.row_number().over(wn) - F.lit(1)
    ).select(
        "*",
        (F.col("_rn") / F.lit(int(chunk_rows))).cast("bigint").alias("_chunk"),
        (F.col("_rn") % F.lit(int(chunk_rows))).alias("_j"),
    ).drop("_rn")

    # local fold per (key, chunk): seeded (y_0 = x_0) for chunk 0 —
    # those are already the true values — zero-boundary
    # l_j = Σ_{i<=j} a·(1-a)^(j-i)·x_i for later chunks.
    schema = T.StructType(
        list(chunked.schema.fields) + [T.StructField("_l", T.DoubleType())]
    )

    def _local(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_j", kind="mergesort")
        vals = pdf[value_col].to_numpy(dtype="float64")
        seeded = bool(len(pdf)) and pdf["_chunk"].iat[0] == 0
        out = [0.0] * len(vals)
        acc = 0.0
        for i, v in enumerate(vals):
            acc = v if (i == 0 and seeded) else acc * om + v * alpha
            out[i] = acc
        pdf = pdf.copy()
        pdf["_l"] = out
        return pdf

    local = persist_tracked(
        chunked.groupBy(*partition_cols, "_chunk").applyInPandas(
            _local, schema=schema
        )
    )

    # Per-key boundary pass over CHUNK SUMMARIES (n_chunks rows/key,
    # tiny — JVM fold is fine here): B_0 = end(local_0);
    # B_c = end(local_c) + B_{c-1}·(1-a)^len_c. b_prev joined to chunk
    # c is B_{c-1} (0.0 for chunk 0 — unused there).
    summaries = local.groupBy(*partition_cols, "_chunk").agg(
        F.max_by("_l", "_j").alias("_endv"),
        F.count(F.lit(1)).alias("_len"),
    )
    bounds = (
        summaries.groupBy(*partition_cols)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_chunk").alias("c"),
                        F.col("_endv").alias("endv"),
                        F.expr(f"power({om!r}, _len)").alias("decay"),
                    )
                )
            ).alias("_ss")
        )
        .withColumn(
            "_bs",
            F.expr(
                "aggregate(_ss, "
                "named_struct('acc', cast(0.0 as double), "
                "'out', cast(array() as array<double>)), "
                "(st, s) -> named_struct("
                "'acc', if(s.c = 0, s.endv, s.endv + st.acc * s.decay), "
                "'out', array_append(st.out, st.acc)), "
                "st -> st.out)"
            ),
        )
        .select(
            *partition_cols,
            F.explode(F.arrays_zip("_ss", "_bs")).alias("z"),
        )
        .select(
            *partition_cols,
            F.col("z._ss.c").alias("_chunk"),
            F.col("z._bs").alias("_b_prev"),
        )
    )
    corrected = local.join(bounds, partition_cols + ["_chunk"]).withColumn(
        out_col,
        F.when(F.col("_chunk") == 0, F.col("_l")).otherwise(
            F.col("_l")
            + F.col("_b_prev") * F.expr(f"power({om!r}, _j + 1)")
        ),
    )
    return corrected.drop("_chunk", "_j", "_l", "_b_prev")


def macd_chunked(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    fast: int = 12,
    slow: int = 26,
    signal_n: int = 9,
    chunk_rows: int = 100_000,
) -> DataFrame:
    """MACD with per-task memory bounded by ``chunk_rows`` — three
    ``ema_chunked`` passes composed exactly like the unchunked
    definition (fast/slow EMA of the value, signal EMA of the derived
    MACD series), so no stage ever materializes a full key history.
    Same FP-reassociation tolerance vs ``macd`` as ``ema_chunked`` vs
    ``ema``."""
    partition_cols = list(partition_cols)
    a_fast, a_slow, a_sig = (
        2.0 / (fast + 1),
        2.0 / (slow + 1),
        2.0 / (signal_n + 1),
    )
    step = ema_chunked(
        df, value_col, order_col, partition_cols,
        alpha=a_fast, out_col="_ema_fast", chunk_rows=chunk_rows,
    )
    step = ema_chunked(
        step, value_col, order_col, partition_cols,
        alpha=a_slow, out_col="_ema_slow", chunk_rows=chunk_rows,
    )
    step = step.withColumn(
        "macd", F.col("_ema_fast") - F.col("_ema_slow")
    ).drop("_ema_fast", "_ema_slow")
    step = ema_chunked(
        step, "macd", order_col, partition_cols,
        alpha=a_sig, out_col="signal", chunk_rows=chunk_rows,
    )
    return step.withColumn("histogram", F.col("macd") - F.col("signal"))


def bollinger_bands(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    n: int = 20,
    k: float = 2.0,
) -> DataFrame:
    """Trailing-n SMA ± k·σ bands and %B position within the band.

    Single window pass (one shuffle on the key); %B reuses the band
    expressions so the FP tree matches the SQL restatement exactly.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    sma = F.avg(value_col).over(w)
    sd = F.stddev_samp(value_col).over(w)
    upper = sma + F.lit(k) * sd
    lower = sma - F.lit(k) * sd
    v = F.col(value_col)
    pct_b = F.when(sd > 0, (v - lower) / (upper - lower))
    return df.select(
        *partition_cols,
        order_col,
        value_col,
        F.round(sma, 6).alias(f"sma{n}"),
        F.round(sd, 6).alias(f"sd{n}"),
        F.round(upper, 6).alias("upper_band"),
        F.round(lower, 6).alias("lower_band"),
        F.round(pct_b, 6).alias("pct_b"),
    )


def rsi(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    n: int = 14,
) -> DataFrame:
    """Cutler's RSI (simple-average gains/losses over a trailing n-row
    frame). Null until a full n deltas of history; 100 when the frame
    has no losses. Two window passes over one shuffle partitioning."""
    partition_cols = list(partition_cols)
    wlag = Window.partitionBy(*partition_cols).orderBy(order_col)
    wavg = wlag.rowsBetween(-(n - 1), Window.currentRow)

    prev = F.lag(value_col).over(wlag)
    v = F.col(value_col)
    gain = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.greatest(v - prev, F.lit(0.0))
    )
    loss = F.when(prev.isNull(), F.lit(None)).otherwise(
        F.greatest(prev - v, F.lit(0.0))
    )
    g = df.select(
        *partition_cols,
        order_col,
        value_col,
        gain.alias("_gain"),
        loss.alias("_loss"),
    )
    avg_gain = F.avg("_gain").over(wavg)
    avg_loss = F.avg("_loss").over(wavg)
    n_obs = F.count("_gain").over(wavg)
    rsi_col = F.when(
        n_obs >= n,
        F.when(avg_loss == 0, F.lit(100.0)).otherwise(
            F.round(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + avg_gain / avg_loss), 6)
        ),
    )
    return g.select(
        *partition_cols, order_col, value_col, rsi_col.alias(f"rsi_{n}")
    )


def stochastic(
    df: DataFrame,
    close_col: str,
    high_col: str,
    low_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    n: int = 14,
    d: int = 3,
) -> DataFrame:
    """Stochastic oscillator: %K = 100·(close − lowest-low_n) /
    (highest-high_n − lowest-low_n), %D = d-period SMA of %K.

    Two window passes over the SAME (partition, order) key — Spark
    plans them with a single exchange and sort; pure JVM codegen. %K is
    NULL when the trailing range is flat (hh == ll), and %D averages
    only the non-NULL %K values (avg skips NULLs in both engines).
    Reference intent: the indicator family (spark/jobs/stock_batch.py
    metric surface), extended like EMA/MACD/RSI/Bollinger."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(n - 1), Window.currentRow)
    )
    ll = F.min(low_col).over(w)
    hh = F.max(high_col).over(w)
    pct_k = F.when(
        hh > ll, F.lit(100.0) * (F.col(close_col) - ll) / (hh - ll)
    )
    staged = df.select(
        *partition_cols, order_col, close_col, pct_k.alias("_k")
    )
    wd = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(-(d - 1), Window.currentRow)
    )
    return staged.select(
        *partition_cols,
        order_col,
        close_col,
        F.round("_k", 6).alias("pct_k"),
        F.round(F.avg("_k").over(wd), 6).alias("pct_d"),
    )


def cusum(
    df: DataFrame,
    value_col: str,
    order_col: str,
    partition_cols: Iterable[str],
    slack: float = 1.0,
    threshold: float = 25.0,
) -> DataFrame:
    """Two-sided CUSUM change-point statistic per key.

    The textbook form is recursive (s+_i = max(0, s+_{i-1} + x_i - mu
    - slack)) — but it has a CLOSED window form: with P_i the running
    sum of (x_i - mu - slack), s+_i = P_i - min(0, running_min(P)).
    So unlike EMA (genuinely recursive -> applyInPandas), CUSUM stays
    pure JVM window functions: one exchange on the key, running sum +
    running min, whole-stage codegen end-to-end.

    mu is the key's full-history mean computed as an exact decimal
    window sum over the (2-decimal) values divided by the count —
    deterministic across engines; the running sums of doubles drift
    ULPs between engines, so the emitted statistics round to 6 and the
    alarm predicate is evaluated ON THE ROUNDED values (deterministic
    by construction, unlike an unrounded-predicate boundary bet).
    """
    partition_cols = list(partition_cols)
    w_all = Window.partitionBy(*partition_cols)
    w_run = (
        Window.partitionBy(*partition_cols)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    x = F.col(value_col)
    mu = (
        F.sum(x.cast("decimal(18,2)")).over(w_all).cast("double")
        / F.count(x).over(w_all)
    )
    d_pos = x - mu - F.lit(float(slack))
    d_neg = -(x - mu) - F.lit(float(slack))
    p_pos = F.sum(d_pos).over(w_run)
    p_neg = F.sum(d_neg).over(w_run)
    s_pos = F.round(p_pos - F.least(F.lit(0.0), F.min(p_pos).over(w_run)), 6)
    s_neg = F.round(p_neg - F.least(F.lit(0.0), F.min(p_neg).over(w_run)), 6)
    out = df.select(
        *partition_cols,
        order_col,
        value_col,
        s_pos.alias("cusum_pos"),
        s_neg.alias("cusum_neg"),
    )
    return out.withColumn(
        "is_alarm",
        (F.col("cusum_pos") > F.lit(float(threshold)))
        | (F.col("cusum_neg") > F.lit(float(threshold))),
    )
