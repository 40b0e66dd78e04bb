"""Text analysis for training-data pipelines (north-star surface).

Column-level building blocks over a document text column: whitespace
tokenization, token/char statistics, marker-stopword language ID,
quality scoring, and bag-of-words fingerprinting. Everything stays in
built-in ``pyspark.sql.functions`` (JVM, whole-stage codegen) — no
Python UDFs in this hot path; at 100 TB these run inside the scan
projection with zero extra shuffles.

Semantics are deliberately expressible in ANSI SQL so every query has
a DuckDB oracle (plans/text.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Marker stopwords per language for the heuristic language ID.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "is", "in", "that"),
    "es": ("el", "la", "los", "las", "que", "de", "y", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit"),
    "fr": ("le", "la", "les", "et", "est", "une", "dans", "pour"),
}


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def mean_token_length(toks: Column) -> Column:
    """Average token length = total chars / token count."""
    total = F.aggregate(
        toks, F.lit(0.0), lambda acc, t: acc + F.length(t).cast("double")
    )
    return total / F.size(toks)


def marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    """Count of tokens that are in the marker list (with repeats)."""
    marker_arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marker_arr, t)))


def lang_guess(toks: Column) -> Column:
    """Argmax of per-language marker hits; 'und' when all are zero.

    Ties break by fixed language order (en, es, de, fr) — mirrored
    exactly by the CASE chain in the SQL oracle.
    """
    hits = {lang: marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.lit("und")
    # Build the CASE chain in reverse so earlier languages win ties.
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            out
        )
    return out


def quality_score(toks: Column) -> Column:
    """Deterministic [0,1] quality heuristic over a token array.

    0.5 * length score (saturates at 100 tokens) +
    0.5 * lexical diversity (distinct/total tokens).

    Takes tokens (not raw text) so callers materialize the split once
    and share it across every derived metric in the projection.
    """
    n = F.size(toks).cast("double")
    len_score = F.least(F.lit(1.0), n / F.lit(100.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    return len_score * 0.5 + diversity * 0.5


def bag_fingerprint(toks: Column) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set. Equal fingerprints == equal vocabulary."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(toks))))


# GPT-2-style pre-tokenizer approximation: word runs, digit runs,
# punctuation runs. Portable: same regex semantics in Spark and DuckDB.
BPE_PRETOKEN_RE = "[a-z]+|[0-9]+|[^a-z0-9\\s]+"


def bpe_pretokens(text: Column) -> Column:
    """Subword-ish pre-tokens of lowercased text (BPE front half)."""
    return F.regexp_extract_all(F.lower(text), F.lit(BPE_PRETOKEN_RE), 0)


def rolling_hash_fingerprint(text: Column, k: int = 8, keep: int = 4) -> Column:
    """Bottom-``keep`` sketch of md5 over all ``k``-char windows.

    A winnowing-style content fingerprint: robust to word reordering at
    the edges, cheap to compare (string equality / overlap), and
    engine-portable (md5 + substring only). Texts shorter than ``k``
    hash whole.
    """
    win_hashes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: F.md5(F.substring(text, i, k)),
    )
    return F.concat_ws("|", F.slice(F.array_sort(win_hashes), 1, keep))
