"""Document deduplication: exact, n-gram Jaccard, MinHash-LSH, SimHash.

North-star operators for 100 TB training-data pipelines. Design notes:

- **Exact**: md5 over whitespace-normalized lowercased text; one hash
  aggregation, fully distributed, no shuffle beyond the groupBy.
- **N-gram Jaccard**: word n-gram shingles -> explode -> equi-join on
  shingle -> per-pair intersection counts. Exact but O(pairs sharing a
  shingle); use on candidate sets or small corpora.
- **MinHash-LSH**: the scale path. Signature = min over shingles of
  md5(permutation_index || '|' || shingle) for P permutations; band
  hashes bucket the corpus so the join only compares likely-similar
  docs. md5-as-permutation keeps the whole computation in built-in
  JVM functions AND reproducible in any engine with md5 (the DuckDB
  oracle runs the identical computation).
- **SimHash**: 64-bit signed-projection sketch using xxhash64 (JVM
  built-in); Hamming-distance buckets via band extraction. xxhash64 is
  Spark-specific, so SimHash queries get rows-only verification.

Shuffle accounting at scale: shingling is a projection (no shuffle);
signatures are a projection; LSH bucketing shuffles (band, hash) pairs
— P+B small integers per doc, not the text; candidate verification
joins only within buckets. Skewed buckets (a shingle set shared by
thousands of boilerplate docs) are bounded by ``max_bucket_size``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from sparktrends_spark.caching import persist_tracked
from sparktrends_spark.operators.pairs import (
    KEY_PREFIX,
    first_collision_pairs,
    transient_views,
)
from sparktrends_spark.text.analysis import tokens


def normalized_text(text: Column) -> Column:
    """Whitespace-collapsed, trimmed, lowercased text."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def exact_hash(text: Column) -> Column:
    return F.md5(normalized_text(text))


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per content-hash groups: surviving (min) id + duplicate count."""
    return (
        df.select(F.col(id_col), exact_hash(F.col(text_col)).alias("content_hash"))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )


def word_shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token array (empty when
    < n tokens).

    ``toks`` must be a *materialized column reference*, not a nested
    expression: it is evaluated once per shingle index inside the
    lambda, so passing ``tokens(text)`` directly would re-run the regex
    split O(tokens) times per row (measured 10x slowdown).
    """
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(
        F.when(F.size(toks) >= n, grams).otherwise(F.array().cast("array<string>"))
    )


def shingle_sets(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    # Two projections on purpose: CollapseProject keeps `_toks`
    # materialized because it is referenced many times and non-cheap.
    # The non-empty filter is phrased on token count (equivalent to
    # size(shingles) > 0, since distinct-of-nonempty is nonempty):
    # filtering on `shingles` itself would make predicate pushdown
    # inline the whole shingle expression below the repartition.
    tokenized = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size(F.col("_toks")) >= n)
    return tokenized.select(
        F.col(id_col), word_shingles(F.col("_toks"), n).alias("shingles")
    )


def jaccard_pairs(
    shingled: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.2,
    max_bucket_size: int = 1000,
) -> DataFrame:
    """Exact pairwise Jaccard over docs sharing >=1 shingle.

    ``max_bucket_size`` drops degenerate shingles shared by more docs
    than that (boilerplate), bounding the join fan-out at scale.

    ``shingled`` and the bounded exploded frame are persisted: each is
    referenced by several branches below (explode + two size joins;
    self-join sides + bucket counts), and Spark re-executes the whole
    shingling pipeline once per branch without pinning.
    """
    shingled = persist_tracked(shingled)
    exploded = shingled.select(
        F.col(id_col).alias("doc"), F.explode("shingles").alias("s")
    )
    bounded = exploded
    if max_bucket_size is not None:
        counts = exploded.groupBy("s").agg(F.count(F.lit(1)).alias("bucket_n"))
        bounded = exploded.join(
            counts.filter(F.col("bucket_n") <= max_bucket_size).select("s"), "s"
        )
    bounded = persist_tracked(bounded)
    inter = (
        bounded.alias("a")
        .join(bounded.alias("b"), on="s")
        .filter(F.col("a.doc") < F.col("b.doc"))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sizes = shingled.select(
        F.col(id_col).alias("doc"), F.size("shingles").alias("n")
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")),
        )
    )
    return out.filter(F.col("jaccard") >= threshold).select(
        "doc_a", "doc_b", "jaccard"
    )


# Affine-permutation MinHash over a 60-bit integer base hash derived
# from md5 (both Spark `conv(..., 16, 10)` and DuckDB `CAST('0x...')`
# can parse hex, so any engine reproduces the identical signatures).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1


def minhash_coeffs(num_perm: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a_p, b_p), a_p != 0."""
    coeffs = []
    for p in range(num_perm):
        a = (2_654_435_761 * (p + 1)) % MINHASH_PRIME or 1
        b = (40_503 * (p + 7) + 12_345) % MINHASH_PRIME
        coeffs.append((a, b))
    return coeffs


def _base_hash(s: Column) -> Column:
    """First 15 hex digits of md5 as a 60-bit non-negative bigint."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    shingled: DataFrame, num_perm: int = 16, id_col: str = "doc_id"
) -> DataFrame:
    """MinHash signature per doc:
    sig[p] = min over shingles of (a_p * (h(s) % P) + b_p) % P
    with h = 60-bit md5-derived integer, P = 2^31-1.

    One md5 per shingle (not one per shingle x permutation); the
    permutations are integer arithmetic folded into the same projection.
    """
    coeffs = minhash_coeffs(num_perm)

    # Materialize the base-hash array in its own projection: referencing
    # it num_perm times from `sig` must not re-run the md5 pass per
    # permutation (higher-order exprs sit outside codegen CSE).
    # Both projections build through single F.expr parses — the same
    # Catalyst trees as the per-permutation F.transform chain, minus
    # ~0.4 s of py4j round trips per build (r14 driver-latency pass).
    hashed = shingled.select(
        F.col(id_col),
        F.col("shingles"),
        F.expr(
            "transform(shingles, s -> cast(conv(substring(md5(s), 1, 15),"
            f" 16, 10) as bigint) % {MINHASH_PRIME})"
        ).alias("_hs"),
    )
    sig = F.expr(
        "array("
        + ", ".join(
            f"array_min(transform(_hs, h -> (h * {a} + {b}) % {MINHASH_PRIME}))"
            for a, b in coeffs
        )
        + ")"
    )
    return hashed.select(F.col(id_col), F.col("shingles"), sig.alias("sig"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    bands: int = 4,
    rows_per_band: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """Band the signatures and emit candidate pairs from shared buckets.

    Pair dedup across bands is first-collision-wins
    (``operators/pairs.py``) — same pair set as a DISTINCT over the
    exploded band join, without ever exchanging the pair set. The
    banded frame (one row per doc, ``bands`` md5 key columns) is
    persisted: every per-band self-join references it twice and the
    signature pipeline above it is the expensive part.
    """
    # One F.expr parse per band key — identical tree to the
    # md5/concat_ws/slice/transform Column chain, far fewer py4j calls.
    band_cols = [
        F.expr(
            "md5(concat_ws('|', slice(transform(sig, x -> cast(x as"
            f" string)), {b * rows_per_band + 1}, {rows_per_band})))"
        ).alias(f"{KEY_PREFIX}{b}")
        for b in range(bands)
    ]
    banded = persist_tracked(
        signatures.select(F.col(id_col).alias("doc"), *band_cols)
    )
    return first_collision_pairs(banded, bands, id_col="doc")


def minhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    num_perm: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> sign -> band ->
    candidates -> exact-Jaccard verify >= threshold.

    Shingle sets are persisted (they feed both the signature pipeline
    and the verification join); the banded signature frame is persisted
    inside ``lsh_candidate_pairs``, which covers the per-band self-join
    branches — the signatures themselves are consumed exactly once.

    The verification step builds through ONE ``spark.sql`` call over
    transient views of the candidate and shingle frames (guide §5):
    same Catalyst tree as the join/withColumn chain — the attach joins
    stay equi-joins on the pair ids, ``jaccard`` is the identical
    int/int double division, and the subquery projections collapse —
    minus ~6 DataFrame ops of py4j/analysis latency per build.
    """
    shingled = persist_tracked(shingle_sets(df, text_col, id_col, shingle_n))
    sigs = minhash_signatures(shingled, num_perm, id_col)
    cands = lsh_candidate_pairs(sigs, bands, num_perm // bands, id_col)
    with transient_views(cands, shingled) as (cv, shv):
        return cands.sparkSession.sql(f"""
SELECT doc_a, doc_b, jaccard FROM (
  SELECT doc_a, doc_b, inter / (n_a + n_b - inter) AS jaccard FROM (
    SELECT c.`doc_a`, c.`doc_b`,
           size(array_intersect(sa.`shingles`, sb.`shingles`)) AS inter,
           size(sa.`shingles`) AS n_a, size(sb.`shingles`) AS n_b
    FROM `{cv}` c
    JOIN `{shv}` sa ON c.`doc_a` = sa.`{id_col}`
    JOIN `{shv}` sb ON c.`doc_b` = sb.`{id_col}`
  )
) WHERE jaccard >= CAST({float(threshold)!r} AS DOUBLE)
""")


# Single-pass SimHash as a SQL expression over a `shingles` column:
# the Python shiftright/shiftleft wrappers demand literal shift counts,
# but the SQL functions take arbitrary int expressions.
_SIMHASH_SQL = """
aggregate(
  sequence(0, 63),
  cast(0 as bigint),
  (acc, i) -> acc + CASE
      WHEN element_at(_bit_sums, i + 1) > 0
      THEN shiftleft(cast(1 as bigint), cast(i as int))
      ELSE cast(0 as bigint) END
)
"""

_BIT_SUMS_SQL = """
aggregate(
  transform(shingles, s -> xxhash64(s)),
  array_repeat(0, 64),
  (acc, h) -> zip_with(
      acc,
      transform(sequence(0, 63),
                i -> CASE WHEN (shiftright(h, cast(i as int)) & 1) = 1
                          THEN 1 ELSE -1 END),
      (a, b) -> a + b)
)
"""


def with_simhash64(
    shingled: DataFrame, out_col: str = "simhash"
) -> DataFrame:
    """Add a 64-bit SimHash column computed from a ``shingles`` column.

    bit_i(doc) = sign of sum over shingles of (+1 if bit_i(xxhash64(s))
    else -1). xxhash64 is a JVM built-in — whole computation stays in
    codegen, one projection, no shuffle.
    """
    return shingled.withColumn("_bit_sums", F.expr(_BIT_SUMS_SQL)).withColumn(
        out_col, F.expr(_SIMHASH_SQL)
    ).drop("_bit_sums")


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit sketch into 4 16-bit
    blocks (pigeonhole: hamming<=3 guarantees a shared block; larger
    distances are found probabilistically), then verify exact Hamming
    distance <= max_hamming."""
    n_bands = 64 // band_bits
    tokenized = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size(F.col("_toks")) >= 2)
    shingled = tokenized.select(
        "doc", word_shingles(F.col("_toks"), 2).alias("shingles")
    )
    sh = with_simhash64(shingled, "h").select("doc", "h")
    mask = (1 << band_bits) - 1
    # Persisted: every per-band self-join references it twice; unpinned,
    # the full shingle+sketch pipeline would run once per branch. One
    # row per doc, block keys as wide columns (first-collision-wins
    # dedup — no exploded frame, no pair DISTINCT).
    banded = persist_tracked(
        sh.select(
            "doc",
            "h",
            *[
                F.shiftright(F.col("h"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias(f"{KEY_PREFIX}{b}")
                for b in range(n_bands)
            ],
        )
    )
    cands = first_collision_pairs(
        banded, n_bands, id_col="doc", carry=[("h", "h_a", "h_b")]
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# Portable 32-bit SimHash over the md5 base hash (first 8 hex digits).
# Identical in any engine with md5 + integer bit ops, so unlike the
# xxhash64 variant it is DuckDB-oracle-checkable. 32 bits trade some
# collision resistance for 2x less bit-sum work; band layout 4 x 8 bits.
_SIMHASH32_BIT_SUMS_SQL = """
aggregate(
  transform(shingles, s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)),
  array_repeat(0, 32),
  (acc, h) -> zip_with(
      acc,
      transform(sequence(0, 31),
                i -> CASE WHEN (shiftright(h, cast(i as int)) & 1) = 1
                          THEN 1 ELSE -1 END),
      (a, b) -> a + b)
)
"""

_SIMHASH32_SQL = """
aggregate(
  sequence(0, 31),
  cast(0 as bigint),
  (acc, i) -> acc + CASE
      WHEN element_at(_bit_sums, i + 1) > 0
      THEN shiftleft(cast(1 as bigint), cast(i as int))
      ELSE cast(0 as bigint) END
)
"""


def simhash32_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 6,
    band_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by the portable 32-bit md5 SimHash.

    Same banding/verify shape as ``simhash_pairs`` (pigeonhole over
    4 x 8-bit blocks, exact Hamming verify); every step restatable in
    the DuckDB oracle, so this variant carries the value-level
    correctness check for the SimHash family.
    """
    n_bands = 32 // band_bits
    # 3-gram shingles, same as the MinHash family (the xxhash variant
    # uses bigrams; 3-grams here keep the oracle CTE shared)
    tokenized = df.select(
        F.col(id_col).alias("doc"), tokens(F.col(text_col)).alias("_toks")
    ).filter(F.size(F.col("_toks")) >= 3)
    shingled = tokenized.select(
        "doc", word_shingles(F.col("_toks"), 3).alias("shingles")
    )
    sh = (
        shingled.withColumn("_bit_sums", F.expr(_SIMHASH32_BIT_SUMS_SQL))
        .withColumn("h", F.expr(_SIMHASH32_SQL))
        .select("doc", "h")
    )
    mask = (1 << band_bits) - 1
    # Persisted for the same per-band self-join reason as above.
    banded = persist_tracked(
        sh.select(
            "doc",
            "h",
            *[
                F.shiftright(F.col("h"), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias(f"{KEY_PREFIX}{b}")
                for b in range(n_bands)
            ],
        )
    )
    cands = first_collision_pairs(
        banded, n_bands, id_col="doc", carry=[("h", "h_a", "h_b")]
    )
    return (
        cands.withColumn(
            "hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
