"""Z-order (Morton) data layout for multi-column scan pruning.

Parquet pruning is driven by per-file / per-row-group min-max stats: a
file is skipped when its [min, max] envelope misses the predicate. A
directory sorted by ONE column prunes perfectly on that column and not
at all on any other; interleaving the bits of several columns (the
Z-order curve — public technique, cf. Delta Lake OPTIMIZE ZORDER BY,
which does the same rank-then-interleave) makes every clustered column
prune, at some cost to each individually. At 100 TB this is the
difference between scanning a shelf and scanning the lake for
rectangle predicates like ``user BETWEEN a AND b AND value BETWEEN c
AND d``.

Everything here is JVM-side: the Morton key is a pure bitwise column
expression (shiftright/&/shiftleft chains inside whole-stage codegen);
the write is repartitionByRange + sortWithinPartitions on that key, so
parquet writes stats-tight files. The per-column min/max used for
normalization is a single tiny aggregate (2 scalars per column).

Reference scope note: the reference's parquet zone has no layout
management; this is engine surface a lake deployment adds for scan
efficiency.
"""

from __future__ import annotations

import os
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave(scaled: list[Column], bits: int) -> Column:
    """Morton-interleave ``bits``-wide non-negative ints, JVM-only."""
    n = len(scaled)
    parts = [
        F.shiftleft(F.shiftright(col, b).bitwiseAND(F.lit(1)), b * n + i)
        for b in range(bits)
        for i, col in enumerate(scaled)
    ]
    return reduce(lambda a, c: a.bitwiseOR(c), parts)


def zorder_key(
    cols: list[str], mins: dict[str, float], maxs: dict[str, float], bits: int = 16
) -> Column:
    """Morton key column from min-max-normalized numeric columns.

    Each column is scaled to [0, 2^bits) with the provided stats (a
    value outside the stats range clamps), then bit-interleaved. With
    k columns the key uses k*bits bits — keep k*bits <= 62 for a
    bigint."""
    if len(cols) * bits > 62:
        raise ValueError("k*bits must fit in a signed 64-bit key")
    top = (1 << bits) - 1
    scaled = []
    for c in cols:
        lo, hi = float(mins[c]), float(maxs[c])
        span = (hi - lo) or 1.0
        s = F.floor((F.col(c).cast("double") - lo) / span * top).cast("long")
        scaled.append(F.least(F.greatest(s, F.lit(0)), F.lit(top)))
    return _interleave(scaled, bits)


def zorder_write(
    df: DataFrame,
    cols: list[str],
    path: str,
    n_files: int,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``n_files`` parquet files clustered on the
    Z-order curve over ``cols``.

    One tiny min/max aggregate (collected: 2 scalars per column — the
    documented broadcast-equivalent), then range-partition + local
    sort on the Morton key so every output file covers a compact
    z-interval and its per-column min/max envelopes stay tight."""
    stats = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    mins = {c: stats[f"mn_{c}"] for c in cols}
    maxs = {c: stats[f"mx_{c}"] for c in cols}
    z = zorder_key(cols, mins, maxs, bits=bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


STATS_MANIFEST = "_stats_manifest.json"


def _file_stats(fp: str) -> dict:
    """Per-column [min, max] envelopes of one parquet file's footer
    (numeric columns with complete row-group stats only)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(fp).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out = {}
    for col, idx in names.items():
        cmin = cmax = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            if not isinstance(st.min, (int, float)):
                ok = False
                break
            cmin = st.min if cmin is None else min(cmin, st.min)
            cmax = st.max if cmax is None else max(cmax, st.max)
        if ok and cmin is not None:
            out[col] = [cmin, cmax]
    return out


def build_stats_manifest(path: str, incremental: bool = False) -> dict:
    """Collect every file's footer envelopes ONCE into
    ``path/_stats_manifest.json`` — the cached statistics a table
    format keeps in its commit log (Delta's per-file ``stats``,
    Iceberg's manifest entries), so repeated ``scan_pruned`` calls
    plan from one small JSON instead of re-reading N footers. Keyed by
    (size, mtime_ns) per file; ``scan_pruned`` falls back to the live
    footer for entries that changed since (stale entries never cause
    wrong pruning, only a footer re-read). With ``incremental=True``
    only new/rewritten files re-read their footers — O(appended files)
    maintenance; deleted files' entries drop either way."""
    import json

    prior: dict = {}
    if incremental:
        loaded = _load_stats_manifest(path)
        if loaded:
            prior = loaded.get("files", {})
    entries = {}
    for r, _d, fs in os.walk(path):
        for f in fs:
            if not f.endswith(".parquet"):
                continue
            fp = os.path.join(r, f)
            st = os.stat(fp)
            rel = os.path.relpath(fp, path)
            old = prior.get(rel)
            if (
                old is not None
                and old["size"] == st.st_size
                and old["mtime_ns"] == st.st_mtime_ns
            ):
                entries[rel] = old
                continue
            entries[rel] = {
                "size": st.st_size,
                "mtime_ns": st.st_mtime_ns,
                "cols": _file_stats(fp),
            }
    manifest = {"files": entries}
    tmp = os.path.join(path, STATS_MANIFEST + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    os.replace(tmp, os.path.join(path, STATS_MANIFEST))
    return manifest


def _load_stats_manifest(path: str) -> dict | None:
    import json

    p = os.path.join(path, STATS_MANIFEST)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def _matching_files(
    path: str, ranges: dict[str, tuple[float, float]]
) -> tuple[list[str], list[str]]:
    """(all files, files whose footer min/max envelope intersects every
    queried range). A file with no stats on a queried column cannot be
    pruned and counts as matching. Envelopes come from the cached
    ``_stats_manifest.json`` when present and current (per-file
    size+mtime check); otherwise from the live footer."""
    manifest = _load_stats_manifest(path)
    cached = manifest["files"] if manifest else {}
    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    matching = []
    for fp in files:
        rel = os.path.relpath(fp, path)
        entry = cached.get(rel)
        if entry is not None:
            st = os.stat(fp)
            if (
                entry["size"] != st.st_size
                or entry["mtime_ns"] != st.st_mtime_ns
            ):
                entry = None  # stale: file rewritten since collection
        col_stats = entry["cols"] if entry is not None else _file_stats(fp)
        hit = True
        for col, (lo, hi) in ranges.items():
            env = col_stats.get(col)
            if env is None:  # no stats -> cannot prune this file
                continue
            cmin, cmax = env
            if cmax < lo or cmin > hi:
                hit = False
                break
        if hit:
            matching.append(fp)
    return files, matching


def file_prune_stats(path: str, ranges: dict[str, tuple[float, float]]) -> dict:
    """How many files of a parquet directory a rectangle predicate can
    skip, judged ONLY by footer min/max stats (what a scan planner
    sees). Returns ``{"n_files", "n_matching", "n_pruned"}``: a file
    "matches" when every queried column's [min, max] envelope
    intersects its range."""
    files, matching = _matching_files(path, ranges)
    return {
        "n_files": len(files),
        "n_matching": len(matching),
        "n_pruned": len(files) - len(matching),
    }


def scan_pruned(
    spark, path: str, ranges: dict[str, tuple[float, float]]
) -> DataFrame:
    """Data-skipping read: consult per-file footer min/max envelopes
    (the same statistics a table format's manifest caches — Delta's
    ``stats`` column, Iceberg's manifest entries), hand Spark ONLY the
    files that can contain matching rows, then apply the exact range
    predicate to the survivors. Results are identical to filtering a
    full scan; IO is proportional to the envelope-matching file set —
    on a Z-ordered table (``zorder_write``) that is the rectangle's
    neighborhood, not the lake.

    The footer walk here reads each file's metadata once on the driver
    (the filesystem-lake stand-in for a cached stats manifest; the
    listing cost is what a real table format amortizes into its commit
    log). File-level skipping composes with Spark's own row-group-level
    pushdown — the predicate is still pushed into the surviving scans.
    """
    files, matching = _matching_files(path, ranges)
    pred = reduce(
        lambda a, b: a & b,
        [F.col(c).between(lo, hi) for c, (lo, hi) in ranges.items()],
    )
    if not matching:
        return spark.read.parquet(path).filter(F.lit(False))
    return (
        spark.read.option("basePath", path)
        .parquet(*matching)
        .filter(pred)
    )
