"""Tests for text analysis / dedup beyond the oracle harness."""

from __future__ import annotations

from pyspark.sql import functions as F

from sparktrends_spark.sources.tables import load_table
from sparktrends_spark.text.dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_dedup_pairs,
    shingle_sets,
    simhash_pairs,
)


_BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while the sun sets slowly behind the tall mountains and the birds "
    "fly home to their nests in the old oak trees by the quiet meadow"
)


def _docs_with_dups(spark):
    rows = [
        (1, _BASE),
        # near-dup: one word changed in ~40 tokens (jaccard ~0.9)
        (2, _BASE.replace("river bank", "river bend")),
        # exact dup after whitespace/case normalization
        (3, _BASE.upper().replace(" ", "  ", 3)),
        (4, "completely different text about spark query engines and shuffles"),
        (5, "tiny"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_normalization(spark):
    groups = exact_dedup_groups(_docs_with_dups(spark))
    dup = groups.filter(F.col("n_docs") > 1).collect()
    assert len(dup) == 1 and dup[0].n_docs == 2 and dup[0].keep_id == 1


def test_jaccard_finds_near_dup(spark):
    shingled = shingle_sets(_docs_with_dups(spark))
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(shingled, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.6
    assert (1, 3) in pairs and pairs[(1, 3)] == 1.0
    assert all(4 not in p for p in pairs)


def test_minhash_agrees_with_exact_on_high_jaccard(spark):
    pairs = {
        (r.doc_a, r.doc_b)
        for r in minhash_dedup_pairs(_docs_with_dups(spark), threshold=0.5).collect()
    }
    # identical docs always collide in every band; high-jaccard pair almost surely
    assert (1, 3) in pairs
    assert (1, 2) in pairs


def test_simhash_pairs_on_testdata(spark, sf_dir):
    """SimHash (rows-only query) should recover most of the planted
    near-dups that exact 3-gram Jaccard >= 0.5 finds."""
    docs = load_table(spark, sf_dir, "documents")
    exact = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(shingle_sets(docs), threshold=0.5).collect()
    }
    sim = {
        (r.doc_a, r.doc_b) for r in simhash_pairs(docs, max_hamming=12).collect()
    }
    assert exact, "testdata should contain planted near-dups"
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.6, f"simhash recall too low: {recall} ({len(sim)} pairs)"


def test_chunking_udtf_matches_builtin(spark, sf_dir):
    from sparktrends_spark.text.chunking import (
        chunk_documents_builtin,
        chunk_documents_udtf,
    )

    docs = load_table(spark, sf_dir, "documents")
    a = set(map(tuple, chunk_documents_udtf(docs, 16).collect()))
    b = set(map(tuple, chunk_documents_builtin(docs, 16).collect()))
    assert a == b and a


def test_chunking_reconstructs_text(spark, sf_dir):
    """Joining a doc's chunks in order must reproduce the original
    text exactly — chunking loses nothing."""
    from sparktrends_spark.text.chunking import chunk_documents_builtin

    docs = load_table(spark, sf_dir, "documents")
    rebuilt = (
        chunk_documents_builtin(docs, 7)
        .groupBy("doc_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("chunk_id", "chunk"))),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("rebuilt")
        )
    )
    bad = (
        docs.join(rebuilt, "doc_id")
        .filter(F.col("text") != F.col("rebuilt"))
        .count()
    )
    assert bad == 0


def test_connected_components_chain(spark):
    """A 4-node chain (1-2, 2-3, 3-4) needs transitive closure —
    pairwise grouping alone cannot merge 1 and 4. Plus a separate
    2-cluster and an isolated pair direction check."""
    from sparktrends_spark.operators.components import (
        connected_components,
        dedup_clusters,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 20)],
        "doc_a long, doc_b long",
    )
    comp = {
        r["node"]: r["component_id"]
        for r in connected_components(pairs).collect()
    }
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}

    clusters = dedup_clusters(pairs).collect()
    by_id = {r["doc_id"]: r for r in clusters}
    assert by_id[4]["cluster_size"] == 4 and not by_id[4]["is_canonical"]
    assert by_id[1]["is_canonical"]
    keep = sorted(r["doc_id"] for r in clusters if r["is_canonical"])
    assert keep == [1, 10, 20]
    from sparktrends_spark.caching import release_persisted

    release_persisted()


def test_connected_components_long_chain_converges(spark):
    """A 12-node path exercises multi-round propagation (diameter 11,
    min-label needs ~11 rounds) — the max_iter guard must not clip it."""
    from sparktrends_spark.operators.components import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "doc_a long, doc_b long"
    )
    out = connected_components(pairs).collect()
    assert {r["component_id"] for r in out} == {1}
    assert len(out) == 12
    from sparktrends_spark.caching import release_persisted

    release_persisted()


def test_dup_spans_interval_union(spark, tmp_path):
    """The duplicated-span merge must union overlapping intervals, not
    just chain consecutive positions: duplicated shingle positions
    {0, 5} with K=8 cover words [0,7] and [5,12] — ONE span of 13
    words, not two spans of 8+8=16 (the gaps-and-islands diff-by-1
    bug this test pins down)."""
    from sparktrends_spark.plans.registry import QUERIES
    from sparktrends_spark.plans.text import _SPAN_K

    assert _SPAN_K == 8  # the constructions below are K=8-specific
    x = [f"x{i}" for i in range(13)]
    s = [f"s{i}" for i in range(10)]
    rows = [
        # docs 1/2: shared 10-word prefix, unique 10-word tails ->
        # dup positions {0,1,2} merge to one span [0,9]: 10 words.
        (1, " ".join(s + [f"a{i}" for i in range(10)])),
        (2, " ".join(s + [f"b{i}" for i in range(10)])),
        # doc 3 holds x0..x12 contiguously + unique tail; doc 4 holds
        # x0..x7 and x5..x12 separated by a filler, so doc 3's dup
        # positions are exactly {0, 5} (x1..x8 is NOT contiguous in
        # doc 4) -> overlapping intervals [0,7] + [5,12] -> one
        # 13-word span.
        (3, " ".join(x + [f"c{i}" for i in range(7)])),
        (4, " ".join(x[0:8] + ["fill"] + x[5:13])),
        # shorter than K: no shingles, still present in output.
        (5, "tiny doc"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in QUERIES["doc_dup_spans"](spark, str(tmp_path)).collect()
    }
    assert len(out) == 5
    r1 = out[1]
    assert (r1["n_dup_spans"], r1["dup_words"], r1["longest_span"]) == (1, 10, 10)
    assert abs(r1["dup_frac"] - 0.5) < 1e-9
    r3 = out[3]
    assert (r3["n_dup_spans"], r3["dup_words"], r3["longest_span"]) == (1, 13, 13)
    # doc 4: dup positions {0, 9} -> gap 9 > end 7, two disjoint spans.
    r4 = out[4]
    assert (r4["n_dup_spans"], r4["dup_words"], r4["longest_span"]) == (2, 16, 8)
    r5 = out[5]
    assert (r5["n_dup_spans"], r5["dup_words"], r5["n_words"]) == (0, 0, 2)


def test_dup_spans_within_doc_repeat_not_flagged(spark, tmp_path):
    """A shingle repeated twice INSIDE one document (no other doc
    shares it) must not flag: the ">= 2 distinct docs" rule is
    restated as min(doc_id) != max(doc_id) (r14 optimization — one
    h-keyed exchange instead of a distinct-dedup exchange + an h
    exchange), and a single doc's repeats give min == max. Pins the
    only edge where that restatement could drift from count_distinct."""
    from sparktrends_spark.plans.registry import QUERIES
    from sparktrends_spark.plans.text import _SPAN_K

    assert _SPAN_K == 8
    rep = [f"r{i}" for i in range(8)]
    rows = [
        # doc 1 repeats its own 8-gram twice, separated by filler
        (1, " ".join(rep + ["mid"] + rep)),
        # doc 2 shares nothing with doc 1
        (2, " ".join(f"z{i}" for i in range(20))),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in QUERIES["doc_dup_spans"](spark, str(tmp_path)).collect()
    }
    assert (out[1]["n_dup_spans"], out[1]["dup_words"]) == (0, 0)
    assert (out[2]["n_dup_spans"], out[2]["dup_words"]) == (0, 0)


def test_pii_detect_and_redact_primitives(spark):
    """Pattern-level checks independent of the injection plumbing:
    multiple matches per doc, all three types in one text, word
    boundaries (a 5-digit run is not a phone), and the exact
    redacted output string."""
    from sparktrends_spark.text.pii import pii_count, redact

    rows = [
        (1, "mail a@b.io and c.d+x@e-f.org or ping 10.0.0.1 call 555-123-4567"),
        (2, "digits 12345-678-9012 are not a phone and 1.2.3 not an ip"),
        (3, "no pii at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    t = F.col("text")
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            pii_count(t, "email").alias("e"),
            pii_count(t, "phone").alias("p"),
            pii_count(t, "ip").alias("i"),
            redact(t).alias("red"),
        ).collect()
    }
    assert (out[1]["e"], out[1]["p"], out[1]["i"]) == (2, 1, 1)
    assert out[1]["red"] == (
        "mail <EMAIL> and <EMAIL> or ping <IP> call <PHONE>"
    )
    # \b stops 12345-678-9012 matching as a phone; 1.2.3 lacks a 4th octet
    assert (out[2]["p"], out[2]["i"]) == (0, 0)
    assert out[3]["red"] == "no pii at all"


def test_dup_spans_removed_reconstructs_expected_text(spark, tmp_path):
    """Removal must cut exactly the merged spans and preserve word
    order of the remainder; two identical docs both collapse to
    empty (their whole text is one duplicated span)."""
    import hashlib

    from pyspark.sql import Row

    from sparktrends_spark.plans.registry import QUERIES

    s = [f"s{i}" for i in range(10)]
    rows = [
        (1, " ".join(s + [f"a{i}" for i in range(10)])),
        (2, " ".join(s + [f"b{i}" for i in range(10)])),
        (3, "same words everywhere alpha beta gamma delta epsilon"),
        (4, "same words everywhere alpha beta gamma delta epsilon"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    out = {
        r["doc_id"]: r
        for r in QUERIES["doc_dup_spans_removed"](
            spark, str(tmp_path)
        ).collect()
    }
    want1 = " ".join(f"a{i}" for i in range(10))
    assert out[1]["kept_words"] == 10 and out[1]["removed_words"] == 10
    assert out[1]["cleaned_fp"] == hashlib.md5(want1.encode()).hexdigest()
    empty_fp = hashlib.md5(b"").hexdigest()
    assert out[3]["kept_words"] == 0 and out[3]["cleaned_fp"] == empty_fp
    assert out[4]["cleaned_fp"] == empty_fp


def test_incremental_dedup_append_flow(spark, tmp_path):
    """The index grows with each batch's uniques: batch B's near-dup
    of the indexed corpus is flagged, its uniques are appended, and
    replaying the SAME batch then flags every shingleable doc as a
    duplicate (self-match against the appended index)."""
    from sparktrends_spark.text.dedup_index import (
        build_dedup_index,
        incremental_dedup,
    )

    idx = str(tmp_path / "idx")
    a = spark.createDataFrame(
        [(1, _BASE), (2, "unrelated corpus text about query engines")],
        "doc_id long, text string",
    )
    build_dedup_index(a, idx)

    b = spark.createDataFrame(
        [
            (11, _BASE.replace("river bank", "river bend")),  # near-dup of 1
            (12, "fresh document with completely novel words here"),
            (13, "xy"),  # too short to shingle -> always unique
        ],
        "doc_id long, text string",
    )
    first = {r["doc_id"]: r for r in incremental_dedup(b, idx).collect()}
    assert first[11]["is_dup"] and first[11]["matched_doc"] == 1
    assert not first[12]["is_dup"] and first[12]["matched_doc"] is None
    assert not first[13]["is_dup"]

    # replay the identical batch: 12 now matches its own appended entry;
    # 11 was flagged dup (NOT appended) so it still matches doc 1
    again = {r["doc_id"]: r for r in incremental_dedup(b, idx).collect()}
    assert again[12]["is_dup"] and again[12]["matched_doc"] == 12
    assert again[12]["est_jaccard"] == 1.0
    assert again[11]["is_dup"] and again[11]["matched_doc"] == 1
    assert not again[13]["is_dup"]


def test_dup_spans_against_pure_python_reference(spark, tmp_path):
    """Independent cross-check of doc_dup_spans on a randomized
    (seeded) corpus: the Spark plan and the DuckDB oracle share the
    relational formulation, so a formulation-level bug could pass
    parity — this reference implements the semantics directly in
    Python (shingle -> cross-doc membership -> interval union) and
    must agree on every row."""
    import random

    from sparktrends_spark.plans.registry import QUERIES
    from sparktrends_spark.plans.text import _SPAN_K

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for doc_id in range(30):
        n = rng.randint(2, 60)
        words = [rng.choice(vocab) for _ in range(n)]
        docs.append((doc_id, " ".join(words)))

    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(str(tmp_path / "documents.parquet"))

    # pure-Python reference
    shingles: dict[int, list[tuple[int, str]]] = {}
    owners: dict[str, set[int]] = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        sh = [
            (p, " ".join(toks[p : p + _SPAN_K]))
            for p in range(len(toks) - _SPAN_K + 1)
        ]
        shingles[doc_id] = sh
        for _p, s in sh:
            owners.setdefault(s, set()).add(doc_id)
    expected = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        covered: set[int] = set()
        for p, s in shingles.get(doc_id, []):
            if len(owners[s]) >= 2:
                covered.update(range(p, p + _SPAN_K))
        # count maximal runs of covered positions
        spans = 0
        longest = cur = 0
        for i in range(len(toks)):
            if i in covered:
                cur += 1
                if cur == 1:
                    spans += 1
                longest = max(longest, cur)
            else:
                cur = 0
        expected[doc_id] = (len(toks), spans, len(covered), longest)

    got = {
        r["doc_id"]: (
            r["n_words"], r["n_dup_spans"], r["dup_words"], r["longest_span"]
        )
        for r in QUERIES["doc_dup_spans"](spark, str(tmp_path)).collect()
    }
    assert got == expected


def test_weighted_sample_topk_plan_and_weight_dominance(spark):
    """doc_weighted_sample must plan as per-partition top-k
    (TakeOrderedAndProject) — no global sort shuffle — and the
    exponential-key scheme must favor weight: a doc 10^6x heavier
    than every other is always selected."""
    from pyspark.sql import functions as F

    from sparktrends_spark.plans import QUERIES

    df = QUERIES["doc_weighted_sample"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan

    # weight dominance on a constructed frame, via the same key math
    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") == 7, F.lit(10**9)).otherwise(F.lit(3)).alias("w"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("wsample|"), F.col("doc_id").cast("string"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    u = (h + F.lit(1.0)) / F.lit(float(16**15 + 1))
    pri = F.round(F.log(u) / F.col("w"), 6)
    top = (
        docs.select("doc_id", pri.alias("p"))
        .orderBy(F.col("p").desc(), "doc_id")
        .limit(10)
    )
    assert 7 in {r.doc_id for r in top.collect()}
