"""Interval-overlap (theta) joins — J7/J8 in SURVEY.md §2.4.

The reference intersects machine stops with per-changeover windows
``[CO_start - 5min, CO_end + 15min]`` via boolean masks inside a
Python loop (reference: App/etl/transform/machine_level.py:66-73,
first_stop.py:35-43). Spark-first: a key-equi join with the range
predicate as join condition — Catalyst plans SMJ/BHJ on the keys and
post-filters the range, which is right when keys (LINE) are selective.

For 100 TB with low key cardinality, ``bucketed=True`` switches to
time-bucketing: intervals explode to every bucket they span, points
map to their bucket, the join becomes fully equi on (key, bucket) —
shuffle-partitionable regardless of key skew — and the exact range
filter runs post-join. Bucket size should be >= the typical interval
span so the explode factor stays ~1-2.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    intervals: DataFrame,
    points: DataFrame,
    on: Sequence[str],
    interval_start: str,
    interval_end: str,
    point_ts: str,
    how: str = "inner",
    bucketed: bool = False,
    bucket_seconds: int = 86400,
    point_end: str | None = None,
    max_span_buckets: int | None = None,
) -> DataFrame:
    """Join each interval row to every point row with the same keys and
    ``interval_start <= point_ts < interval_end`` (half-open, matching
    the reference's overlap predicates).

    With ``point_end``, points become intervals and the condition is
    strict overlap: ``point_end > interval_start AND point_ts <
    interval_end`` (the reference's Gantt window filter,
    machine_level.py:72-73).

    Column collisions between the two sides must be resolved by the
    caller (select/alias) — only ``on`` keys may be shared.

    ``max_span_buckets`` (bucketed path): clamp each row's bucket
    explosion — one corrupt interval with a sentinel far-future end
    (e.g. 9999-12-31 from an SCD-style extract) would otherwise emit
    millions of bucket rows and OOM the executor. Rows clamped lose
    matches beyond the cap, so set it well above the legitimate
    maximum span (or pre-filter sentinels); ``None`` = unbounded.
    """
    on = list(on)
    if bucketed:
        # The staged working names only exist on the bucketed path
        # (ADVICE r13: guarding both paths rejected previously-valid
        # plain calls); `bucketed` stays a drop-in switch for inputs
        # that don't carry dunder-staged columns — which real schemas
        # don't, and which the bucketed path must refuse anyway.
        from ..schemas import ensure_absent

        for side, frame in (("intervals", intervals), ("points", points)):
            ensure_absent(
                frame, ["__iv_id", "__pt_id", "__bucket"],
                f"interval_overlap_join ({side})",
            )

    def _range(iv, pt):
        if point_end is not None:
            return (pt[point_end] > iv[interval_start]) & (
                pt[point_ts] < iv[interval_end]
            )
        return (pt[point_ts] >= iv[interval_start]) & (pt[point_ts] < iv[interval_end])

    if not bucketed:
        cond = None
        for k in on:
            c = intervals[k] == points[k]
            cond = c if cond is None else (cond & c)
        cond = cond & _range(intervals, points)
        return intervals.join(points, cond, how)

    # Bucketed path: equi-join on (keys, bucket) then exact filter.
    # A naive outer join would null-extend an exploded interval once
    # per unmatched bucket (duplicate left rows) — 'left' is built as
    # inner + null-safe anti-join for the unmatched intervals.
    if how not in ("inner", "left"):
        raise ValueError(
            f"bucketed interval join supports how in ('inner','left') (got {how!r})"
        )
    # Per-row ids make the multi-bucket dedup and the left-path
    # anti-join exact MULTISET operations: duplicate input rows stay
    # distinct (bucketed=True must be a drop-in switch for the plain
    # path, not a distinct-ifying one). monotonically_increasing_id is
    # stable for deterministic scans; the left path's checkpoint
    # freezes the ids before they are used twice.
    iv_base = intervals.withColumn("__iv_id", F.monotonically_increasing_id())
    if how == "left":
        # the left path reads `intervals` twice (probe side + unmatched
        # anti-join) and `inner` twice (projection + matched keys);
        # without a materialization barrier Spark re-executes the whole
        # upstream lineage — for windowed session inputs that tripled
        # the query. localCheckpoint keeps attribute ids, so the
        # iv[c]/pt[c] references below still resolve.
        iv_base = iv_base.localCheckpoint(eager=False)
    b = F.lit(bucket_seconds)

    def _bucket_seq(lo: str, hi: str) -> F.Column:
        lo_b = F.floor(F.col(lo).cast("double") / b)
        hi_b = F.floor(F.col(hi).cast("double") / b)
        if max_span_buckets is not None:
            hi_b = F.least(hi_b, lo_b + F.lit(max_span_buckets))
        return F.explode(F.sequence(lo_b, hi_b))

    iv = iv_base.withColumn("__bucket", _bucket_seq(interval_start, interval_end))
    if point_end is not None:
        pt = points.withColumn(
            "__pt_id", F.monotonically_increasing_id()
        ).withColumn("__bucket", _bucket_seq(point_ts, point_end))
    else:
        pt = points.withColumn("__bucket", F.floor(F.col(point_ts).cast("double") / b))
    cond = None
    for k in on + ["__bucket"]:
        c = iv[k] == pt[k]
        cond = c if cond is None else (cond & c)
    cond = cond & _range(iv, pt)
    inner = iv.join(pt, cond, "inner").drop(iv["__bucket"]).drop(pt["__bucket"])
    if point_end is not None:
        # interval x interval can match in several buckets — dedup the
        # (interval row, point row) PAIR by id, so duplicate input rows
        # survive while bucket-induced repeat matches collapse.
        inner = inner.dropDuplicates(["__iv_id", "__pt_id"]).drop("__pt_id")
    if how == "inner":
        return inner.drop("__iv_id")
    inner = inner.localCheckpoint(eager=False)
    # left: append a single null-extended row per interval ROW (by id)
    # that matched nothing.
    pt_only = [c for c in points.columns if c not in intervals.columns]
    inner_proj = inner.select(
        *[iv[c] for c in intervals.columns], *[pt[c] for c in pt_only]
    )
    matched = inner.select(iv["__iv_id"].alias("__iv_id")).dropDuplicates()
    unmatched = iv_base.join(matched, "__iv_id", "left_anti")
    null_ext = unmatched.select(
        *[F.col(c) for c in intervals.columns],
        *[F.lit(None).cast(points.schema[c].dataType).alias(c) for c in pt_only],
    )
    return inner_proj.unionByName(null_ext)
