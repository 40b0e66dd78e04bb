"""Per-file Bloom-filter index for point lookups (file skipping).

Footer min/max envelopes (`layout.scan_pruned`) prune RANGE predicates
but are useless for point lookups over high-cardinality keys whose
values spread across every file's envelope. The lakehouse answer
(Delta bloom filter indexes, Parquet's own optional bloom pages) is a
per-file Bloom filter over the column: a membership probe with zero
false NEGATIVES, so a file whose filter rejects every probed key can
be skipped with certainty, and false positives only cost a scan.

This module keeps the filters in a sidecar JSON
(``_bloom_<col>.json``) next to the data — the filesystem-lake
stand-in for index metadata a table format would carry in its log:

- ``build_bloom_index(path, col, fpp)``: one pass per file (pyarrow),
  k-hash Bloom from md5(value||seed) — deterministic across runs and
  engines; sized from the observed distinct-ish count and ``fpp``.
- ``scan_bloom(spark, path, col, values)``: consult the sidecar, read
  ONLY files whose filter accepts at least one probed value (files
  missing from a stale index count as accepted — never a false
  negative), apply the exact IN filter.

Staleness contract mirrors the stats manifest: entries are keyed by
(size, mtime_ns); a rewritten file's entry is ignored (file treated
as accepted) until the index is rebuilt.
"""

from __future__ import annotations

import base64
import hashlib
import json
import math
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bloom_path(path: str, col: str) -> str:
    return os.path.join(path, f"_bloom_{col}.json")


# Hash-input canonicalization version; sidecars carry it so an index
# built under a different scheme is never trusted (treated as stale —
# files accepted, never skipped).
_HASH_SCHEME = "canon-v3"


def _canon_forms(value) -> list[bytes]:
    """Canonical hash keys: numerically equal values map to the same
    byte string regardless of Python/Arrow type — 1, 1.0,
    Decimal('1.00') and '1' all become b'1'. Spark's exact `isin`
    filter COERCES types (probing 1 matches a double column's 1.0), so
    hashing raw `str(value)` made a type-mismatched probe skip a file
    that contains the row — a false negative breaking the module's
    zero-false-negative guarantee.

    Integral magnitudes >= 2^53 need MORE than one form: the exact
    integer and its nearest double can differ (canon-v2 hashed the int
    as its decimal string but the equal float as repr() scientific
    notation — numerically equal, different bits, a false negative for
    a type-coerced probe). So integral doubles always hash as their
    EXACT integer string (every integral double IS an exact integer,
    at any magnitude), and big ints additionally emit their
    nearest-double integer string: builds insert every form, probes
    accept on any, so int-vs-double coercion in either direction still
    finds the file. Extra forms can only add false POSITIVES, which
    just cost a scan; the exact filter still decides."""
    import decimal

    if isinstance(value, bool):
        value = int(value)
    if isinstance(value, decimal.Decimal) and value == value.to_integral_value():
        value = int(value)
    if not isinstance(value, (int, float, decimal.Decimal)):
        s = str(value)
        try:
            value = float(s)
        except ValueError:
            return [s.encode()]
    if isinstance(value, int):
        forms = [str(value).encode()]
        if abs(value) >= 2**53:
            try:
                nearest = str(int(float(value))).encode()
            except OverflowError:
                return forms
            if nearest != forms[0]:
                forms.append(nearest)
        return forms
    f = float(value)
    if f.is_integer():
        return [str(int(f)).encode()]
    return [repr(f).encode()]


def _hashes(form: bytes, n_bits: int, k: int) -> list[int]:
    """k deterministic bit positions for one canonical form:
    md5(form||seed), engine- and run-stable (no PYTHONHASHSEED
    dependence)."""
    out = []
    for seed in range(k):
        h = hashlib.md5(form + b"|" + str(seed).encode()).digest()
        out.append(int.from_bytes(h[:8], "big") % n_bits)
    return out


def _size_for(n_items: int, fpp: float) -> tuple[int, int]:
    """(n_bits, k) for the target false-positive rate (standard Bloom
    sizing: m = -n ln p / ln2², k = m/n ln2), floored at 64 bits."""
    n = max(1, n_items)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)) + 1)
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 16)


def build_bloom_index(
    path: str, col: str, fpp: float = 0.01, incremental: bool = False
) -> dict:
    """Build/refresh the per-file Bloom sidecar for ``col``. One
    column-projected read per file; the filter is bytes, base64 in the
    JSON. With ``incremental=True``, files whose (size, mtime) entry in
    the existing sidecar is current are NOT re-read — maintenance cost
    is O(new + rewritten files), the append-workload shape (a table
    format does the same by attaching stats at write time); entries
    for deleted files are dropped either way. Returns the index."""
    import pyarrow.parquet as pq

    prior: dict = {}
    if incremental and os.path.isfile(_bloom_path(path, col)):
        with open(_bloom_path(path, col)) as fh:
            loaded = json.load(fh)
        if (
            loaded.get("col") == col
            and loaded.get("fpp") == fpp
            and loaded.get("hash_scheme") == _HASH_SCHEME
        ):
            prior = loaded.get("files", {})
    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    entries = {}
    for fp in files:
        rel = os.path.relpath(fp, path)
        st = os.stat(fp)
        old = prior.get(rel)
        if (
            old is not None
            and old["size"] == st.st_size
            and old["mtime_ns"] == st.st_mtime_ns
        ):
            entries[rel] = old
            continue
        vals = pq.read_table(fp, columns=[col]).column(col).to_pylist()
        uniq = {v for v in vals if v is not None}
        n_bits, k = _size_for(len(uniq), fpp)
        bits = bytearray((n_bits + 7) // 8)
        for v in uniq:
            for form in _canon_forms(v):
                for pos in _hashes(form, n_bits, k):
                    bits[pos >> 3] |= 1 << (pos & 7)
        entries[rel] = {
            "size": st.st_size,
            "mtime_ns": st.st_mtime_ns,
            "n_bits": n_bits,
            "k": k,
            "bits": base64.b64encode(bytes(bits)).decode(),
        }
    index = {"col": col, "fpp": fpp, "hash_scheme": _HASH_SCHEME, "files": entries}
    tmp = _bloom_path(path, col) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(index, fh, sort_keys=True)
    os.replace(tmp, _bloom_path(path, col))
    return index


def _accepts(entry: dict, values) -> bool:
    bits = base64.b64decode(entry["bits"])
    n_bits, k = entry["n_bits"], entry["k"]
    for v in values:
        if any(
            all(
                bits[pos >> 3] & (1 << (pos & 7))
                for pos in _hashes(form, n_bits, k)
            )
            for form in _canon_forms(v)
        ):
            return True
    return False


def scan_bloom(spark, path: str, col: str, values) -> DataFrame:
    """Point-lookup read: files whose Bloom filter rejects EVERY probed
    value are skipped (no false negatives by construction); survivors
    get the exact ``col IN values`` filter. Files absent from the
    index, or whose (size, mtime) changed since indexing, are treated
    as accepted — a stale index can only cost IO, never rows."""
    index_path = _bloom_path(path, col)
    if not os.path.isfile(index_path):
        raise FileNotFoundError(
            f"{index_path}: no bloom index for {col!r} — build_bloom_index first"
        )
    with open(index_path) as fh:
        index = json.load(fh)
    if index.get("hash_scheme") != _HASH_SCHEME:
        # Built under a different hash scheme: probes would hash to the
        # wrong bits — a silent false-negative factory. Trust nothing;
        # read everything (correct, just unpruned) until a rebuild.
        index = {"files": {}}
    values = list(values)
    files = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    keep = []
    for fp in files:
        rel = os.path.relpath(fp, path)
        entry = index["files"].get(rel)
        if entry is not None:
            st = os.stat(fp)
            if (
                entry["size"] != st.st_size
                or entry["mtime_ns"] != st.st_mtime_ns
            ):
                entry = None  # stale -> cannot trust, accept the file
        if entry is None or _accepts(entry, values):
            keep.append(fp)
    if not keep:
        return spark.read.parquet(path).filter(F.lit(False))
    return (
        spark.read.option("basePath", path)
        .parquet(*keep)
        .filter(F.col(col).isin(values))
    )
