"""Observation-based pipeline metrics: counted as a side effect of the
single real action, values exact, no plan re-execution."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.observability import observed
from sparktrends_spark.sources.tables import load_table


def test_observed_metrics_match_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    n_words = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))

    staged, obs_in = observed(
        docs, "ingest",
        rows_in=F.count(F.lit(1)),
        chars_in=F.sum("n_chars"),
    )
    gated = staged.withColumn("_nw", n_words).filter(F.col("_nw") >= 20)
    gated, obs_out = observed(
        gated, "gate",
        rows_kept=F.count(F.lit(1)),
        words_kept=F.sum("_nw"),
    )

    kept = gated.count()  # the ONE action; both observations piggyback

    assert obs_in.get["rows_in"] == docs.count()
    assert obs_in.get["chars_in"] == (
        docs.agg(F.sum("n_chars")).head()[0]
    )
    assert obs_out.get["rows_kept"] == kept
    exact_words = (
        docs.withColumn("_nw", n_words)
        .filter(F.col("_nw") >= 20)
        .agg(F.sum("_nw"))
        .head()[0]
    )
    assert obs_out.get["words_kept"] == exact_words


def test_observed_requires_metrics(spark):
    import pytest

    with pytest.raises(ValueError):
        observed(spark.range(1), "empty")
