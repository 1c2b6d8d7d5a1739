"""Blocked approximate string matching (entity resolution).

The reference's brandcode merge (App/etl/brandcode_etl.py) treats
near-identical code strings as exact after scrubbing; real multi-site
catalogs also carry typo'd variants, which need an edit-distance
match. All-pairs levenshtein is O(n^2) and unrunnable at catalog
scale, so the join is blocked first. Two exact blocking schemes:

- **segment pigeonhole** (default, ``blocking="segment"``) — the
  PassJoin family: each indexed string of length L is partitioned into
  ``d+1`` contiguous segments; if ``levenshtein(a, b) <= d``, at least
  one of b's ``d+1`` segments carries ZERO edits (pigeonhole over at
  most d edits), so its text appears VERBATIM in ``a`` at a start
  position shifted by the net insertions/deletions before it (``|shift|
  <= d``, and exactly 0 for segment 0). The probe side enumerates every
  (candidate length, segment index, allowed shift) substring and the
  candidate join is a plain equi-join on ``(length, seg_idx,
  seg_text)``. The join key carries the SEGMENT TEXT, so its
  cardinality is near the corpus' substring diversity — popular string
  lengths no longer concentrate on single reducers the way the
  length-band key does. Exact: no true match escapes; candidates are
  verified with the real edit distance afterwards.

- **length banding** (``blocking="length"``) — ``|len(a) - len(b)| <=
  d`` is a necessary condition for ``levenshtein(a, b) <= d``, so each
  right-side string explodes its length window ``[len-d, len+d]`` and
  the candidate join is an equi-join on the banded length. Also exact,
  and simpler — but the band key's cardinality is only the number of
  distinct lengths (a few dozen), so at fact scale popular lengths
  concentrate on few reducers and in-bucket verification approaches
  quadratic. Kept as the exactness cross-check (the property test runs
  both blockings against brute force) and for tiny dims.

Both schemes generate a candidate SUPERSET and verify with
``F.levenshtein`` (JVM-side, codegen) — blocking choice never changes
results, only the shuffle shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_bounds(length: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start, len) of segment ``i`` of ``k`` even segments of a string
    of ``length`` chars (0-indexed start; earlier segments get the
    remainder)."""
    base = F.floor(length / k).cast("int")
    rem = (length % k).cast("int")
    start = F.lit(i) * base + F.least(F.lit(i), rem)
    seg_len = base + F.when(F.lit(i) < rem, 1).otherwise(0)
    return start, seg_len


def _index_signatures(name: Column, d: int) -> Column:
    """array<struct<lb:int,seg:int,sig:string>> — the ``d+1`` segment
    signatures of the indexed-side string."""
    k = d + 1
    length = F.length(name).cast("int")
    sigs = []
    for i in range(k):
        start, seg_len = _seg_bounds(length, i, k)
        sigs.append(
            F.struct(
                length.alias("lb"),
                F.lit(i).alias("seg"),
                F.substring(name, start + 1, seg_len).alias("sig"),
            )
        )
    return F.array(*sigs)


def _probe_signatures(name: Column, d: int) -> Column:
    """array<struct<lb:int,seg:int,sig:string>> — every substring of the
    probe string that could equal an unedited segment of a match:
    candidate lengths ``lb`` in ``[la-d, la+d]``, segment index ``i``,
    start shifted by the net indels before the segment.  Shift bounds:
    0 for segment 0 (nothing precedes it), else ``|shift| <= d``
    intersected with the symmetric end constraint
    ``shift - (la - lb) in [-d, d]`` (indels after the segment are also
    at most d)."""
    k = d + 1
    la = F.length(name).cast("int")

    def sigs_for(lb: Column) -> Column:
        # Shift windows are DATA-DRIVEN sequences, not Python-unrolled
        # literals: unrolling (2d+1) shifts x (d+1) segments built a
        # ~(2d+1)(d+1)-branch expression tree whose codegen compile
        # time dominated small inputs (3.3 s for a 64-name dim at d=4).
        # With |la - lb| <= d, lo <= 0 <= hi always, so the sequence
        # never descends.
        def at_shift(start: Column, seg_len: Column, i: int):
            def probe(s: Column) -> Column:
                return F.when(
                    (start + s >= 0) & (start + s + seg_len <= la),
                    F.struct(
                        lb.cast("int").alias("lb"),
                        F.lit(i).alias("seg"),
                        F.substring(name, start + s + 1, seg_len).alias("sig"),
                    ),
                )

            return probe

        per_seg = []
        for i in range(k):
            start, seg_len = _seg_bounds(lb, i, k)
            if i == 0:
                lo, hi = F.lit(0), F.lit(0)
            else:
                lo = F.greatest(F.lit(-d), la - lb - d)
                hi = F.least(F.lit(d), la - lb + d)
            per_seg.append(
                F.transform(F.sequence(lo, hi), at_shift(start, seg_len, i))
            )
        return F.flatten(F.array(*per_seg))

    lbs = F.sequence(F.greatest(la - d, F.lit(0)), la + d)
    sigs = F.flatten(F.transform(lbs, sigs_for))
    return F.array_distinct(F.filter(sigs, lambda x: x.isNotNull()))


def _candidate_pairs(
    left_keys: DataFrame,
    right_keys: DataFrame,
    max_dist: int,
    blocking: str,
) -> DataFrame:
    """Distinct candidate (name_a, name_b) pairs from the chosen
    blocking — a superset of the true matches, pre-verification.
    ``left_keys``/``right_keys`` are single-column (name_a / name_b)
    distinct frames."""
    if blocking == "length":
        banded = right_keys.select(
            "name_b",
            F.explode(
                F.sequence(
                    F.length("name_b") - max_dist, F.length("name_b") + max_dist
                )
            ).alias("__band"),
        )
        return (
            left_keys.withColumn("__band", F.length("name_a"))
            .join(banded, "__band")
            .select("name_a", "name_b")
        )
    if blocking != "segment":
        raise ValueError(f"unknown blocking scheme: {blocking!r}")
    probes = left_keys.select(
        "name_a", F.explode(_probe_signatures(F.col("name_a"), max_dist)).alias("k")
    )
    index = right_keys.select(
        "name_b", F.explode(_index_signatures(F.col("name_b"), max_dist)).alias("k")
    )
    # One true pair can agree on several unedited segments — dedup the
    # candidate pair before the levenshtein verify.
    return probes.join(index, "k").select("name_a", "name_b").distinct()


def fuzzy_self_match(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
    blocking: str = "segment",
) -> DataFrame:
    """Distinct values of ``col`` within edit distance ``max_dist`` of
    each other, as ordered pairs (name_a < name_b, so each unordered
    pair reports once). Returns (name_a, name_b, dist).

    Blocking (segment pigeonhole by default, see module docstring)
    bounds the candidate space; the strict ``<`` ordering both dedups
    the symmetric pair and drops self-matches.
    """
    vals = df.select(F.col(col).alias("name_a")).distinct()
    pairs = _candidate_pairs(
        vals,
        vals.select(F.col("name_a").alias("name_b")),
        max_dist,
        blocking,
    )
    return (
        pairs.filter(F.col("name_a") < F.col("name_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select("name_a", "name_b", "dist")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_col: str,
    right_col: str,
    max_dist: int = 1,
    blocking: str = "segment",
) -> DataFrame:
    """Approximate equi-join: every (left, right) row pair whose key
    strings are within ``max_dist`` edits. All left columns plus the
    matched right key (``matched``) and the distance survive.

    ``matched`` and ``dist`` are RESERVED output column names — a left
    frame already carrying either is rejected up front (silently
    clobbering or duplicating a caller's column is worse than failing).
    Internals join through a collision-proof ``__fz_key`` column, so
    any left column name (including ``name_a``) is safe.

    The candidate/verify phase runs over the DISTINCT key sets only;
    fact rows then attach by an exact equi-join on their own key — so
    the signature explosion never touches the fact table, and the
    final attach shuffles on the full key string (high cardinality),
    not on a band."""
    for reserved in ("matched", "dist", "__fz_key"):
        if reserved in left.columns:
            raise ValueError(
                f"fuzzy_join: left frame already has a {reserved!r} column — "
                f"'matched'/'dist' are reserved output names (rename it first)"
            )
    keys = left.select(F.col(left_col).alias("name_a")).distinct()
    rkeys = right.select(F.col(right_col).alias("name_b")).distinct()
    matches = (
        _candidate_pairs(keys, rkeys, max_dist, blocking)
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("name_a").alias("__fz_key"),
            F.col("name_b").alias("matched"),
            "dist",
        )
    )
    return left.join(
        matches, F.col(left_col) == F.col("__fz_key")
    ).drop("__fz_key")
