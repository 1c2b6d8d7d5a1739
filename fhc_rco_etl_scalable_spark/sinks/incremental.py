"""Incremental-load sinks: watermark + delete-overlap + append
(S8-S11 in SURVEY.md §2.1).

The reference re-extracts a lookback window each run, DELETEs the
overlap region from SQL Server (per line/server, with a -10 s
clock-skew pad) and appends the fresh rows
(ref/RCO_Overall_orchestrator.R:304-394,483-494); BRANDCODE master is
a read-anti-join-rewrite (:556-585) and Script_Data an
insert-or-update (:236-282,502-546).

Spark-first: on Delta/Iceberg these are MERGE INTO / replaceWhere —
one atomic commit, no read-modify-write. Those jars aren't in this
environment, so the sink implements the same semantics over plain
parquet with a **version-pointer table layout** (the same idea Delta's
transaction log and Iceberg's metadata pointer implement):

    <root>/<table>/
        _schema.json      # target schema sidecar
        _version.json     # {"version": N} — the ONLY mutable file
        v000001/ ...      # immutable data snapshots (flat or hive)

Every write materializes the next snapshot ``v{N+1}`` completely —
hard-linking the files of untouched partitions from ``v{N}`` (no data
copy, same inodes) and writing only the touched partitions fresh —
then commits by atomically replacing ``_version.json``. Readers
resolve the pointer and scan one immutable snapshot, so a reader
concurrent with a load sees either the old table or the new table,
never a mix (snapshot isolation; property-tested by
tests/test_incremental.py::test_concurrent_reader_sees_single_version).
Crash recovery is trivial by construction: a crash before the pointer
flip leaves an orphan ``v{M}`` (M > pointer) that the next write
garbage-collects; a crash after the flip is already committed. There
is no partially-swapped state to roll back — this closes the round-4
advice item on `_recover` leaving staged-only partitions behind.

``delete_overlap_append`` tables are hive-partitioned by the
delete-scope key (default ``LINE``/``Server``) and a load rewrites
ONLY the partition directories whose keys appear in the batch (the
``replaceWhere`` pattern) — survivors for those keys are read with a
partition-pruned scan, unioned with the batch, and land in the new
snapshot next to hard-links of every untouched partition. Write
amplification is O(batch partitions), not O(table). Small state
tables (brandcode master, Script_Data) snapshot whole — they are tiny
by construction.

Idempotence invariant (property-tested): loading the same window twice
yields byte-identical tables.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import align_to_schema

#: How many superseded snapshots to keep after a commit. Readers
#: resolve the pointer per read and scan immediately, so one previous
#: version is enough to cover a reader that resolved just before a
#: flip; two adds slack for slow readers. Hard links make the cost of
#: a retained version O(touched partitions), not O(table).
_KEEP_PREVIOUS_VERSIONS = 2

#: A staged (".stage-*") or claimed-but-never-committed ("v{n}" above the
#: pointer) directory younger than this is treated as a LIVE writer and
#: left alone; older ones are crashed-writer leftovers and get GC'd.
#: Generous on purpose: deleting an in-flight write to save a dot-dir a
#: reader can't even see is a terrible trade.
_STALE_GRACE_SECONDS = 24 * 3600.0


def lookback_start(now: datetime, watermark: datetime | None) -> datetime:
    """Reference lookback policy (App/utils/time_utils.py:25-51): the
    re-extraction window depends on the run hour — hour 3 → 7 d,
    20 → 2 d, 21 → 14 d, 22 → 7 d, else 3 d — and is always anchored
    at ``watermark - days`` (never wall-clock), so late modifications
    just before a stale watermark are still re-extracted.  With no
    watermark the reference falls back to ``now`` as the anchor."""
    hour = now.hour
    if hour == 3:
        days = 7
    elif hour == 20:
        days = 2
    elif hour == 21:
        days = 14
    elif hour == 22:
        days = 7
    else:
        days = 3
    anchor = watermark if watermark is not None else now
    return anchor - timedelta(days=days)


def _link_tree(src: str, dst: str, skip_rels: set[str] | None = None) -> None:
    """Recursively hard-link every file under ``src`` into ``dst``,
    skipping any subtree whose src-relative path is in ``skip_rels``.
    Hard links preserve inodes — untouched partitions in a new
    snapshot are literally the same file bytes on disk."""
    skip = skip_rels or set()

    def walk(s: str, rel: str) -> None:
        if rel in skip:
            return
        os.makedirs(os.path.join(dst, rel) if rel else dst, exist_ok=True)
        for name in os.listdir(s):
            sub = os.path.join(s, name)
            r = os.path.join(rel, name) if rel else name
            if os.path.isdir(sub):
                walk(sub, r)
            elif r not in skip:
                os.link(sub, os.path.join(dst, r))

    walk(src, "")


class ParquetIncrementalSink:
    """Directory-per-table parquet sink with the reference's
    incremental semantics and snapshot-isolated reads."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # --- version pointer --------------------------------------------------

    def _pointer_path(self, table: str) -> str:
        return os.path.join(self._path(table), "_version.json")

    def _version_dir(self, table: str, n: int) -> str:
        return os.path.join(self._path(table), f"v{n:06d}")

    def _current_version(self, table: str) -> int | None:
        pp = self._pointer_path(table)
        if not os.path.exists(pp):
            return None
        with open(pp) as f:
            return int(json.load(f)["version"])

    def _data_path(self, table: str) -> str | None:
        """Path of the current immutable snapshot (resolving the
        pointer), or the table dir itself for a legacy pre-pointer
        layout, or None if the table doesn't exist."""
        p = self._path(table)
        n = self._current_version(table)
        if n is not None:
            return self._version_dir(table, n)
        if os.path.isdir(p) and self._has_data_entries(p):
            return p  # legacy layout: data directly in the table dir
        return None

    @staticmethod
    def _has_data_entries(p: str) -> bool:
        # "_" = sidecars (_schema.json, _version.json); "." = staging
        return any(not e.startswith(("_", ".")) for e in os.listdir(p))

    def _migrate_legacy(self, table: str) -> int:
        """Move a legacy layout's data entries into ``v000001`` and
        write the pointer. Returns the resulting current version (0 if
        the table is empty/new). Only writers call this — readers
        never mutate the table."""
        p = self._path(table)
        n = self._current_version(table)
        if n is not None:
            return n
        if not (os.path.isdir(p) and self._has_data_entries(p)):
            return 0
        v1 = self._version_dir(table, 1)
        os.makedirs(v1, exist_ok=True)
        for e in os.listdir(p):
            if not e.startswith(("_", ".")) and e != os.path.basename(v1):
                os.rename(os.path.join(p, e), os.path.join(v1, e))
        self._commit_version(table, 1)
        return 1

    def _pointer_meta(self, table: str) -> dict:
        pp = self._pointer_path(table)
        if not os.path.exists(pp):
            return {}
        with open(pp) as f:
            return json.load(f)

    def _commit_version(self, table: str, n: int, meta: dict | None = None) -> None:
        """Atomically flip the pointer to snapshot ``n`` (optionally
        carrying extra commit metadata, e.g. the streaming batch id —
        written in the SAME atomic rename as the version flip), then GC
        snapshots older than ``n - _KEEP_PREVIOUS_VERSIONS`` and any
        orphan staged snapshot above ``n`` (a crashed writer's
        leftovers — its pointer flip never happened, so it was never
        visible).

        Optimistic concurrency, second line of defense: the commit
        asserts the pointer still reads ``n - 1``.  The FIRST line is
        :meth:`_publish`'s atomic rename-claim of ``v{n}`` — two racing
        writers stage in private ``.stage-*`` dirs and only one rename
        to ``v{n}`` can succeed, so neither can clobber the other's
        staged files (the pre-round-6 design had both writing the same
        ``v{n}`` directory, which let a loser delete the winner's
        staged data before either pointer flip).  Either failure mode
        surfaces as a visible conflict the caller retries — the
        single-writer-per-table contract."""
        cur = self._current_version(table)
        if cur is not None and cur != n - 1:
            raise RuntimeError(
                f"{table}: concurrent commit detected (expected current "
                f"v{n - 1}, found v{cur}) — retry the load"
            )
        p = self._path(table)
        os.makedirs(p, exist_ok=True)
        tmp = self._pointer_path(table) + ".tmp-" + uuid.uuid4().hex[:8]
        with open(tmp, "w") as f:
            json.dump({**(meta or {}), "version": n}, f)
        os.replace(tmp, self._pointer_path(table))
        for e in os.listdir(p):
            full = os.path.join(p, e)
            if e.startswith("v") and e[1:].isdigit():
                m = int(e[1:])
                if m < n - _KEEP_PREVIOUS_VERSIONS:
                    shutil.rmtree(full, ignore_errors=True)
                elif m > n and self._is_stale(full):
                    # claimed but never committed, and old enough that
                    # no live writer can still own it — evict via the
                    # same atomic rename discipline as _publish (a
                    # direct rmtree could race a writer that just
                    # evicted this orphan and claimed the path anew)
                    self._evict_orphan(table, full)
            elif e.startswith(".stage-") and self._is_stale(full):
                # a YOUNG .stage-* may be another writer mid-flight —
                # deleting it here would be the lost-update bug again,
                # one directory earlier
                shutil.rmtree(full, ignore_errors=True)
            elif e.startswith(".trash-") and self._is_stale(full):
                # a crash between _evict_orphan's rename and its rmtree
                # leaves the claimed dir parked under .trash-<uuid>;
                # no path re-creates it, so without this sweep orphaned
                # trash accumulates unboundedly. Stale-only: a YOUNG
                # .trash- belongs to an evictor mid-flight (it may still
                # restore the dir on its freshness re-check).
                shutil.rmtree(full, ignore_errors=True)

    def _evict_orphan(
        self, table: str, path: str, min_age_seconds: float | None = None
    ) -> bool:
        """Atomically move an orphaned dir out of the way and delete
        it. The rename is the claim: concurrent evictors/claimants of
        the same path cannot interleave into deleting each other's
        fresh snapshot. After winning the rename, staleness is
        re-checked on the captured dir — if a live writer's brand-new
        claim slipped in between our check and our rename, it is
        restored instead of destroyed."""
        age_limit = (
            _STALE_GRACE_SECONDS if min_age_seconds is None else min_age_seconds
        )
        if min_age_seconds is None and not self._is_stale(path):
            # Default grace path: a FRESH dir is (or may be) a live
            # writer's claim — renaming it away even briefly opens a
            # window where a concurrent pointer flip targets a missing
            # dir. Decline without touching it; the post-rename
            # re-check below remains as the second line for the race
            # where the dir turns fresh between this check and the
            # rename.
            return False
        trash = os.path.join(self._path(table), f".trash-{uuid.uuid4().hex}")
        try:
            os.rename(path, trash)
        except OSError:
            return False  # someone else evicted or committed first
        try:
            age = time.time() - os.path.getmtime(trash)
        except OSError:
            age = float("inf")
        if age <= age_limit and min_age_seconds is None:
            # fresher than the grace window: not the orphan we checked —
            # put it back (best-effort; if the path was re-claimed in
            # the meantime the rename fails and the claimant wins)
            try:
                os.rename(trash, path)
            except OSError:
                shutil.rmtree(trash, ignore_errors=True)
            return False
        shutil.rmtree(trash, ignore_errors=True)
        return True

    def reclaim_orphans(self, table: str, min_age_seconds: float | None = None) -> int:
        """Operator-driven recovery: evict claimed-but-uncommitted
        ``v{n}`` orphans (a writer that crashed between its claim and
        its pointer flip). By default only orphans older than the
        stale-grace window go; pass ``min_age_seconds=0`` when the
        claimant is KNOWN dead to unwedge the table immediately —
        without this, writes raise 'concurrent writer detected' until
        the grace window elapses. Returns the number evicted."""
        p = self._path(table)
        cur = self._current_version(table)
        if cur is None or not os.path.isdir(p):
            return 0
        evicted = 0
        for e in os.listdir(p):
            if e.startswith("v") and e[1:].isdigit() and int(e[1:]) > cur:
                if self._evict_orphan(
                    table, os.path.join(p, e), min_age_seconds
                ):
                    evicted += 1
        return evicted

    @staticmethod
    def _is_stale(path: str) -> bool:
        try:
            return (time.time() - os.path.getmtime(path)) > _STALE_GRACE_SECONDS
        except OSError:
            return False

    def _begin_write(self, table: str) -> tuple[str, int]:
        """Start a snapshot write: a PRIVATE staging dir plus the target
        version number (current + 1, fixed now so a racer committing in
        between is detected at publish/commit instead of silently
        rebased).  Writers produce the full snapshot in the stage dir,
        then :meth:`_publish` claims ``v{n}`` atomically."""
        cur = self._migrate_legacy(table)
        stage = os.path.join(self._path(table), ".stage-" + uuid.uuid4().hex[:8])
        os.makedirs(stage, exist_ok=True)
        return stage, cur + 1

    def _publish(self, table: str, stage: str, n: int) -> None:
        """Atomically claim ``v{n}`` by renaming the staged snapshot
        onto it.  rename(2) fails if ``v{n}`` already exists non-empty,
        so a racing writer's claimed-or-committed snapshot can never be
        clobbered; only a STALE orphan (crashed writer: claimed v{n},
        died before its pointer flip, so it was never visible) is
        evicted and the claim retried once.

        The eviction itself is ALSO an atomic rename (orphan ->
        private ``.trash-`` dir), never an in-place rmtree: two writers
        racing over the same stale orphan would otherwise interleave
        rmtree/rename so that one deletes the other's freshly claimed
        snapshot — exactly one eviction rename can succeed, and after
        it exactly one stage->v{n} rename can succeed.
        """
        vd = self._version_dir(table, n)
        try:
            os.rename(stage, vd)
            return
        except OSError:
            pass
        if os.path.exists(vd) and self._is_stale(vd):
            self._evict_orphan(table, vd)  # atomic rename-claim: one winner
            try:
                os.rename(stage, vd)
                return
            except OSError:
                pass
        shutil.rmtree(stage, ignore_errors=True)
        raise RuntimeError(
            f"{table}: concurrent writer detected (v{n} already claimed) "
            f"— retry the load once the other writer commits; if it is "
            f"known dead, reclaim_orphans({table!r}, min_age_seconds=0) "
            f"clears its claim immediately instead of after the "
            f"{int(_STALE_GRACE_SECONDS)}s grace window"
        )

    # --- schema sidecar (hidden from parquet readers: leading "_") ----

    def _store_schema(self, table: str, schema: T.StructType) -> None:
        os.makedirs(self._path(table), exist_ok=True)
        with open(os.path.join(self._path(table), "_schema.json"), "w") as f:
            f.write(schema.json())

    def _stored_schema(self, table: str) -> T.StructType | None:
        sp = os.path.join(self._path(table), "_schema.json")
        if not os.path.exists(sp):
            return None
        with open(sp) as f:
            return T.StructType.fromJson(json.load(f))

    def _is_partitioned(self, table: str) -> bool:
        dp = self._data_path(table)
        return dp is not None and any(
            "=" in d for d in os.listdir(dp) if os.path.isdir(os.path.join(dp, d))
        )

    def _read_raw(self, table: str) -> DataFrame:
        """Read the current snapshot with partition values kept as RAW
        strings ("01" must not become 1 — align_to_schema casts per the
        stored schema). The inference conf is session-global, so
        save/restore it around the (eager) schema+partition discovery
        instead of mutating the caller's session permanently."""
        return self._read_raw_at(self._data_path(table))

    def _read_raw_at(self, dp: str) -> DataFrame:
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, "false")
        try:
            return self.spark.read.option("basePath", dp).parquet(dp)
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def read(
        self,
        table: str,
        schema: T.StructType | None = None,
        version: int | None = None,
    ) -> DataFrame | None:
        """Snapshot-isolated read: resolve the version pointer once and
        scan that immutable snapshot. Never mutates the table (safe for
        concurrent read-only consumers).

        ``version`` time-travels to a specific retained snapshot
        (the pointer keeps the last ``_KEEP_PREVIOUS_VERSIONS`` behind
        the current one alive). Raises ValueError for a version that
        was never committed or has been GC'd — silently reading the
        wrong snapshot is worse than failing."""
        if self._data_path(table) is None:
            return None
        if version is not None:
            cur = self._current_version(table)
            vd = self._version_dir(table, version)
            if cur is None or version > cur or not os.path.isdir(vd):
                raise ValueError(
                    f"{table}: snapshot v{version} not available "
                    f"(current={cur}, retention={_KEEP_PREVIOUS_VERSIONS} back)"
                )
            df = self._read_raw_at(vd)
        else:
            df = self._read_raw(table)
        schema = schema if schema is not None else self._stored_schema(table)
        return align_to_schema(df, schema) if schema is not None else df

    # --- snapshot writers -------------------------------------------------

    def _atomic_write(self, df: DataFrame, table: str, schema: T.StructType | None = None) -> None:
        stage, n = self._begin_write(table)
        df.write.mode("overwrite").parquet(stage)
        if schema is not None:
            self._store_schema(table, schema)
        self._publish(table, stage, n)
        self._commit_version(table, n, meta=self._carry_meta(table))

    def _atomic_write_partitioned(
        self,
        df: DataFrame,
        table: str,
        schema: T.StructType,
        partition_cols: tuple[str, ...],
    ) -> None:
        stage, n = self._begin_write(table)
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(stage)
        self._store_schema(table, schema)
        self._publish(table, stage, n)
        self._commit_version(table, n, meta=self._carry_meta(table))

    @staticmethod
    def _leaf_partition_dirs(root: str, depth: int) -> list[str]:
        """Relative paths of hive partition leaf dirs (``k=v/.../k=v``)."""
        leaves: list[str] = []

        def walk(d: str, rel: str, level: int) -> None:
            for name in os.listdir(d):
                sub = os.path.join(d, name)
                if not (os.path.isdir(sub) and "=" in name):
                    continue
                r = os.path.join(rel, name) if rel else name
                if level + 1 == depth:
                    leaves.append(r)
                else:
                    walk(sub, r, level + 1)

        walk(root, "", 0)
        return leaves

    def _layout_partition_cols(self, table: str) -> list[str]:
        """Partition columns of an existing hive layout, read from the
        first leaf dir's ``k=v`` path components."""
        cols: list[str] = []
        d = self._data_path(table)
        while True:
            subs = [
                n for n in os.listdir(d)
                if "=" in n and os.path.isdir(os.path.join(d, n))
            ]
            if not subs:
                return cols
            cols.append(subs[0].split("=", 1)[0])
            d = os.path.join(d, subs[0])

    def append_aligned(self, new_rows: DataFrame, table: str, schema: T.StructType) -> None:
        """S8: append with target-schema alignment (reorder, pad
        missing with NULL, cast) — reference
        App/etl/overall_etl.py:12-43.

        The append lands in a NEW snapshot (existing files hard-linked,
        new files appended beside them, pointer flipped once) so
        concurrent readers never see a half-appended table.

        Appending into a partition-scoped table (see
        :meth:`delete_overlap_append`) follows the existing hive
        layout — a flat append there would mix layouts and break
        reads."""
        aligned = align_to_schema(new_rows, schema)
        partitioned = self._is_partitioned(table)
        stage, n = self._begin_write(table)
        if n > 1:
            _link_tree(self._version_dir(table, n - 1), stage)
        writer = aligned.write.mode("append")
        if partitioned:
            writer = writer.partitionBy(*self._layout_partition_cols(table))
        writer.parquet(stage)
        self._store_schema(table, schema)
        self._publish(table, stage, n)
        self._commit_version(table, n, meta=self._carry_meta(table))

    def delete_overlap_append(
        self,
        new_rows: DataFrame,
        table: str,
        schema: T.StructType,
        ts_col: str,
        watermark: datetime,
        partition_cols: tuple[str, ...] = ("LINE", "Server"),
        pad_seconds: float = 10.0,
    ) -> None:
        """S9: for every partition key present in the new batch, drop
        existing rows with ``ts >= watermark - pad`` then append the
        batch (reference R:304-317; -10 s pad :308, Gantt uses a
        (15+5) min pad :362).

        Delta equivalent: ``MERGE``/``replaceWhere``. Here the table is
        hive-partitioned by ``partition_cols`` and only the partition
        directories whose keys appear in the batch are rewritten:
        survivors for those keys come from a partition-pruned scan,
        union the batch, land in a new snapshot whose untouched
        partitions are hard-links of the previous snapshot's files. At
        100 TB this bounds each load's write amplification to the
        touched (LINE, Server) partitions instead of the whole table.

        Hive layout folds NULL and empty-string key values into the
        same ``__HIVE_DEFAULT_PARTITION__`` directory, which would
        corrupt the key on read-back — such batches are rejected up
        front (the reference keys LINE/Server are non-empty by
        construction, but the API is generic).
        """
        new_aligned = align_to_schema(new_rows, schema)
        # Batch partition keys: driver-side, bounded by the number of
        # (LINE, Server) combinations in one load — tiny by design.
        keys = new_aligned.select(*partition_cols).distinct().collect()
        if not keys:
            # Empty batch: the DELETE scope is the batch's keys — no
            # keys, nothing to delete or append. (Also keeps an empty
            # FIRST load from creating a rowless, schema-less dir.)
            return
        for row in keys:
            for k in partition_cols:
                if row[k] is None or row[k] == "":
                    raise ValueError(
                        f"delete_overlap_append: partition column {k!r} has a "
                        f"NULL/empty value in the batch — hive layout cannot "
                        f"round-trip it (folds into __HIVE_DEFAULT_PARTITION__)"
                    )
        if self._data_path(table) is None:
            self._atomic_write_partitioned(new_aligned, table, schema, partition_cols)
            return
        if not self._is_partitioned(table):
            # One-time migration of a legacy unpartitioned table:
            # full rewrite into the partitioned layout, then future
            # loads are partition-scoped. Migrate the files under the
            # version pointer FIRST — the read below is lazy, and the
            # snapshot write that consumes it must not race the move.
            self._migrate_legacy(table)
            legacy = self.read(table, schema)
            self._delete_overlap_full(
                legacy, new_aligned, table, schema, ts_col, watermark,
                partition_cols, pad_seconds,
            )
            return
        cutoff = watermark - timedelta(seconds=pad_seconds)
        # Partition cols read back as RAW strings (_read_raw); cast to
        # the schema type BEFORE comparing so non-string keys match
        # their hive encodings (str(True)='True' vs dir 'k=true',
        # str(1e-07) vs '1.0E-7' — a string compare would silently
        # match nothing and the new snapshot would drop pre-cutoff
        # survivors).
        types = {f.name: f.dataType for f in schema.fields}
        raw = self._read_raw(table)
        for k in partition_cols:
            raw = raw.withColumn(k, F.col(k).cast(types[k]))
        pred = None
        for row in keys:
            kc = None
            for k in partition_cols:
                kc_part = F.col(k).eqNullSafe(F.lit(row[k]).cast(types[k]))
                kc = kc_part if kc is None else kc & kc_part
            pred = kc if pred is None else pred | kc
        # coalesce: `ts >= cutoff` is NULL for NULL-ts rows and a bare
        # `~overlap` filter would silently drop them every load; the
        # reference DELETE (`ts >= cutoff`) keeps NULL-ts rows, so must we.
        overlap = F.coalesce(F.col(ts_col) >= F.lit(cutoff), F.lit(False))
        scoped = raw.filter(pred)  # partition-pruned scan (string keys cast is a no-op)
        survivors = align_to_schema(scoped.filter(~overlap), schema)
        staging = os.path.join(self._path(table), ".stage-" + uuid.uuid4().hex[:8])
        survivors.unionByName(new_aligned).write.mode("overwrite").partitionBy(
            *partition_cols
        ).parquet(staging)
        # Assemble the next snapshot IN A PRIVATE STAGE DIR: hard-link
        # every untouched partition from the current one, move the
        # freshly written touched partitions in, then claim v{n} with
        # one atomic rename and flip the pointer once.
        stage, n = self._begin_write(table)
        touched = set(self._leaf_partition_dirs(staging, len(partition_cols)))
        _link_tree(self._version_dir(table, n - 1), stage, skip_rels=touched)
        for rel in touched:
            dst = os.path.join(stage, rel)
            if os.path.exists(dst):
                shutil.rmtree(dst, ignore_errors=True)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(os.path.join(staging, rel), dst)
        shutil.rmtree(staging, ignore_errors=True)
        self._publish(table, stage, n)
        self._commit_version(table, n, meta=self._carry_meta(table))

    def _delete_overlap_full(
        self,
        existing: DataFrame,
        new_aligned: DataFrame,
        table: str,
        schema: T.StructType,
        ts_col: str,
        watermark: datetime,
        partition_cols: tuple[str, ...],
        pad_seconds: float,
    ) -> None:
        """Legacy full-rewrite path (also the partitioned-layout
        migration): same semantics, whole-snapshot rewrite."""
        cutoff = watermark - timedelta(seconds=pad_seconds)
        keys = new_aligned.select(*partition_cols).distinct()
        overlap = F.coalesce(F.col(ts_col) >= F.lit(cutoff), F.lit(False))
        in_batch = None
        for k in partition_cols:
            c = F.col(f"__k_{k}").isNotNull()
            in_batch = c if in_batch is None else (in_batch & c)
        tagged = existing.join(
            F.broadcast(
                keys.select(*[F.col(k).alias(f"__k_{k}") for k in partition_cols])
            ),
            [existing[k].eqNullSafe(F.col(f"__k_{k}")) for k in partition_cols],
            "left",
        )
        survivors = tagged.filter(~(in_batch & overlap)).select(
            *[f.name for f in schema.fields]
        )
        self._atomic_write_partitioned(
            survivors.unionByName(new_aligned), table, schema, partition_cols
        )

    def merge_dedup_overwrite(
        self,
        new_rows: DataFrame,
        table: str,
        schema: T.StructType,
        key: str | tuple[str, ...] = "BRANDCODE",
    ) -> None:
        """S10: historical rows whose key is absent from the new batch
        are kept; everything else comes from the batch (reference
        R:556-585 anti-join + rewrite). ``key`` may be composite —
        (BRANDCODE, Server) when several sites share the master table."""
        keys = [key] if isinstance(key, str) else list(key)
        new_aligned = align_to_schema(new_rows, schema).dropDuplicates(keys)
        existing = self.read(table, schema)
        if existing is None:
            self._atomic_write(new_aligned, table, schema)
            return
        keep = existing.join(new_aligned.select(*keys), keys, "left_anti")
        self._atomic_write(keep.unionByName(new_aligned), table, schema)

    def upsert_script_data(
        self,
        new_rows: DataFrame,
        table: str,
        schema: T.StructType,
        keys: tuple[str, ...] = ("System", "Server"),
    ) -> None:
        """S11: insert-or-replace state rows per (System, Server)
        (reference R:236-282 insert, :502-546 update). Delta
        equivalent: MERGE on the key."""
        new_aligned = align_to_schema(new_rows, schema).dropDuplicates(list(keys))
        existing = self.read(table, schema)
        if existing is None:
            self._atomic_write(new_aligned, table, schema)
            return
        keep = existing.join(new_aligned.select(*keys), list(keys), "left_anti")
        self._atomic_write(keep.unionByName(new_aligned), table, schema)

    def maintain_rollup(
        self,
        source_table: str,
        rollup_table: str,
        batch_keys: DataFrame,
        rollup_fn,
        group_cols: tuple[str, ...],
        rollup_schema: T.StructType | None = None,
        deleted_group_keys: DataFrame | None = None,
        source_keys_fn=None,
    ) -> None:
        """Continuous-aggregate maintenance (the TimescaleDB/Materialize
        idea expressed with snapshots): keep ``rollup_table`` equal to
        ``rollup_fn(source)`` while recomputing ONLY the groups a new
        batch touched.

        Call AFTER loading the batch into ``source_table`` (via
        ``delete_overlap_append``/``append_aligned``), passing the
        batch itself as ``batch_keys``. The affected group set is
        ``batch_keys`` projected to ``group_cols`` (distinct, tiny);
        the source is re-scanned ONLY for those groups (broadcast
        semi-join — partition-pruned when ``group_cols`` lead the
        source's hive layout) and the recomputed groups replace their
        predecessors in a new rollup snapshot.

        Recompute-from-truth, not partial-merge, on purpose: merging
        mergeable partials into the stored rollup double-counts on
        replay, while recompute is idempotent under at-least-once batch
        delivery and under delete-overlap re-extraction — the same
        replay model as the rest of this sink. Write amplification is
        O(affected groups); the untouched rollup rows carry over via
        anti-join (a rollup is orders of magnitude smaller than its
        source, so the snapshot rewrite is cheap next to one source
        scan).

        ``rollup_fn(source_rows) -> DataFrame`` must emit one row per
        group including ``group_cols``.

        **Deletion caveat**: the batch only names the groups it TOUCHES.
        A ``delete_overlap_append`` whose overlap window dropped source
        rows of groups the batch no longer contains leaves those groups'
        rollup rows stale (they carry over via the anti-join). Pass
        ``deleted_group_keys`` for such loads — the previous snapshot is
        still readable (``read(table, version=cur-1)``), so the deleted
        scope is one partition-pruned scan of the old version filtered
        to the overlap window, projected to ``group_cols``. Recomputing
        a group with zero surviving source rows correctly REMOVES its
        rollup row (rollup_fn emits nothing for it). (Group sets no
        finer than the sink's partition columns never need this:
        delete_overlap_append only deletes inside partitions the batch
        itself names, so every deletable group is already affected.)

        ``source_keys_fn`` materializes DERIVED group columns on the
        source before the scoping semi-join (e.g. ``Day`` from a
        timestamp) — required when ``group_cols`` aren't physical
        source columns; the scoped frame it returns is what
        ``rollup_fn`` receives.
        """
        source = self.read(source_table)
        if source is None:
            raise ValueError(f"{source_table}: no source to roll up")
        if source_keys_fn is not None:
            source = source_keys_fn(source)
        cols = list(group_cols)
        affected = batch_keys.select(*cols).distinct()
        if deleted_group_keys is not None:
            affected = affected.unionByName(
                deleted_group_keys.select(*cols)
            ).distinct()
        scoped = source.join(F.broadcast(affected), cols, "left_semi")
        recomputed = rollup_fn(scoped)
        existing = self.read(rollup_table, rollup_schema)
        if existing is None:
            merged = recomputed
        else:
            keep = existing.join(F.broadcast(affected), cols, "left_anti")
            merged = keep.unionByName(recomputed)
        if rollup_schema is not None:
            merged = align_to_schema(merged, rollup_schema)
        self._atomic_write(merged, rollup_table, rollup_schema)

    def read_dim_as_of(self, table: str, ts: datetime) -> DataFrame | None:
        """Point-in-time read over an SCD2 dimension (``FOR SYSTEM_TIME
        AS OF`` semantics on the VALIDITY axis, complementing
        ``read(version=)`` on the snapshot axis): the version of each
        business key that was in effect at ``ts`` — rows with
        ``valid_from <= ts < valid_to`` (open versions: valid_to NULL).
        A key first effective after ``ts`` yields no row. One
        partition-pruned scan + filter; joins against facts at their
        event time reconstruct history exactly."""
        dim = self.read(table)
        if dim is None:
            return None
        t = F.lit(ts)
        return dim.filter(
            (F.col("valid_from") <= t)
            & (F.col("valid_to").isNull() | (F.col("valid_to") > t))
        ).drop("is_current")

    def merge_scd2(
        self,
        new_dims: DataFrame,
        table: str,
        key_cols: tuple[str, ...],
        change_cols: tuple[str, ...],
        ts_col: str = "effective_ts",
    ) -> None:
        """Type-2 slowly-changing-dimension merge (the warehouse-native
        history pattern): each business key keeps a chain of versioned
        rows with ``valid_from`` / ``valid_to`` / ``is_current``.

        For each incoming (key, attributes, effective_ts):
        - unseen key            -> insert an open version;
        - changed ``change_cols`` -> close the current version at the
          batch's effective_ts and insert the new open version;
        - unchanged             -> no-op (idempotent under replay).

        All set logic, no row loops: the batch dedups to latest-per-key
        (deterministic row_number), joins the CURRENT slice once, and
        the next snapshot is history UNION closed UNION carried UNION
        inserted — written atomically, so readers never observe a
        half-merged chain. At 100 TB the join key is the dimension's
        business key: dims are the small side of every star join, and
        this merge is one shuffle of the dimension, never the facts."""
        from pyspark.sql import Window

        keys = list(key_cols)
        w = Window.partitionBy(*keys).orderBy(F.col(ts_col).desc())
        batch = (
            new_dims.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        attr_cols = [c for c in batch.columns if c not in (*keys, ts_col)]
        existing = self.read(table)
        if existing is None:
            out = batch.select(
                *keys,
                *attr_cols,
                F.col(ts_col).cast("timestamp").alias("valid_from"),
                F.lit(None).cast("timestamp").alias("valid_to"),
                F.lit(True).alias("is_current"),
            )
            self._atomic_write(out, table)
            return
        history = existing.filter(~F.col("is_current"))
        # presence markers, NOT key-null checks: the join is eqNullSafe,
        # so NULL business keys are legal and match each other — testing
        # keys[0].isNotNull() would silently drop a null-key chain from
        # the new snapshot (and discard null-key batch rows)
        current = existing.filter(F.col("is_current")).withColumn(
            "__c_present", F.lit(True)
        )
        b = batch.select(
            *[F.col(c).alias(f"__b_{c}") for c in (*keys, ts_col, *attr_cols)],
            F.lit(True).alias("__b_present"),
        )
        key_eq = [current[k].eqNullSafe(F.col(f"__b_{k}")) for k in keys]
        j = current.join(F.broadcast(b), key_eq, "full_outer")
        same = None
        for c in change_cols:
            eq = current[c].eqNullSafe(F.col(f"__b_{c}"))
            same = eq if same is None else (same & eq)
        in_batch = F.col("__b_present").isNotNull()
        in_cur = current["__c_present"].isNotNull()
        cur_cols = [current[c] for c in existing.columns]
        # current rows: carried (no batch row, or unchanged) or closed
        carried = j.filter(in_cur & (~in_batch | same)).select(*cur_cols)
        closed = j.filter(in_cur & in_batch & ~same).select(
            *[current[c] for c in (*keys, *attr_cols, "valid_from")],
            F.col(f"__b_{ts_col}").cast("timestamp").alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
        inserted = j.filter(in_batch & (~in_cur | ~same)).select(
            *[F.col(f"__b_{c}").alias(c) for c in (*keys, *attr_cols)],
            F.col(f"__b_{ts_col}").cast("timestamp").alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
        cols = existing.columns
        out = (
            history.select(*cols)
            .unionByName(carried.select(*cols))
            .unionByName(closed.select(*cols))
            .unionByName(inserted.select(*cols))
        )
        self._atomic_write(out, table)

    def changes_between(
        self, table: str, v_from: int, v_to: int, key_cols: tuple[str, ...]
    ) -> DataFrame:
        """Change feed between two retained snapshots (the CDF surface
        the version pointer makes nearly free): one full-outer join of
        the two immutable snapshots on the business key, classifying
        each key as inserted / deleted / updated / unchanged. Returns
        (key_cols..., change_type, before struct, after struct)."""
        old = self.read(table, version=v_from)
        new = self.read(table, version=v_to)
        keys = list(key_cols)
        val_cols = [c for c in new.columns if c not in keys]
        o = old.select(
            *[F.col(k).alias(f"__o_{k}") for k in keys],
            F.struct(*[F.col(c) for c in val_cols]).alias("before"),
        )
        n = new.select(
            *[F.col(k).alias(f"__n_{k}") for k in keys],
            F.struct(*[F.col(c) for c in val_cols]).alias("after"),
        )
        cond = [F.col(f"__o_{k}").eqNullSafe(F.col(f"__n_{k}")) for k in keys]
        j = o.join(n, cond, "full_outer")
        in_old = F.col(f"__o_{keys[0]}").isNotNull() | F.col("before").isNotNull()
        in_new = F.col(f"__n_{keys[0]}").isNotNull() | F.col("after").isNotNull()
        change = (
            F.when(~in_old, F.lit("inserted"))
            .when(~in_new, F.lit("deleted"))
            .when(F.col("before").eqNullSafe(F.col("after")), F.lit("unchanged"))
            .otherwise(F.lit("updated"))
        )
        return j.select(
            *[
                F.coalesce(F.col(f"__n_{k}"), F.col(f"__o_{k}")).alias(k)
                for k in keys
            ],
            change.alias("change_type"),
            "before",
            "after",
        ).filter(F.col("change_type") != "unchanged")

    def watermark(self, table: str = "Script_Data") -> datetime | None:
        """A7: max(Data_Update_Time) from the state table
        (App/utils/time_utils.py:11-14)."""
        df = self.read(table)
        if df is None:
            return None
        row = df.agg(F.max("Data_Update_Time").alias("wm")).first()
        return row.wm

    # --- maintenance + streaming bridge -----------------------------------

    def compact(self, table: str, target_files: int = 8) -> int:
        """Small-file compaction: rewrite the current snapshot with
        ``target_files`` files (per partition for hive layouts), flip
        the pointer. Data is byte-identical; only the file layout
        changes. The at-scale maintenance op for tables grown by many
        small incremental appends — scan cost is dominated by file
        count once files shrink below a row group.

        Returns the new version number. Concurrent readers keep their
        snapshot (old versions retained per the GC policy)."""
        # Migrate a legacy layout under the version pointer BEFORE the
        # (lazy) read: _begin_write's migration renames the data
        # files, which would invalidate a file index built over the
        # pre-migration paths (same ordering hazard delete_overlap_append
        # documents).
        self._migrate_legacy(table)
        df = self.read(table)
        if df is None:
            raise ValueError(f"{table}: nothing to compact")
        schema = self._stored_schema(table)
        pcols = self._layout_partition_cols(table) if self._is_partitioned(table) else []
        stage, n = self._begin_write(table)
        if pcols:
            (
                df.repartition(target_files, *[F.col(c) for c in pcols])
                .write.mode("overwrite")
                .partitionBy(*pcols)
                .parquet(stage)
            )
        else:
            df.coalesce(target_files).write.mode("overwrite").parquet(stage)
        if schema is not None:
            self._store_schema(table, schema)
        self._publish(table, stage, n)
        self._commit_version(table, n, meta=self._carry_meta(table))
        return n

    def _carry_meta(self, table: str) -> dict:
        """Commit metadata that must survive unrelated commits (e.g.
        the streaming batch id)."""
        return {
            k: v
            for k, v in self._pointer_meta(table).items()
            if k.startswith("stream_batch:")
        }

    def last_stream_batch(self, table: str, query_id: str) -> int:
        return int(
            self._pointer_meta(table).get(f"stream_batch:{query_id}", -1)
        )

    def foreach_batch_appender(self, table: str, schema: T.StructType, query_id: str):
        """Exactly-once bridge from Structured Streaming to this sink:
        pass the returned function to ``writeStream.foreachBatch``.

        Structured Streaming guarantees at-least-once foreachBatch
        delivery with a MONOTONIC batch_id (replayed after restart with
        the same id). The appender records the last committed batch id
        INSIDE the version pointer — the same atomic rename that makes
        the data visible — so a replayed batch sees itself already
        committed and becomes a no-op: at-least-once delivery + an
        idempotent transactional commit = exactly-once table state.

        ``query_id`` is the Delta ``txnAppId`` contract and has two
        REQUIREMENTS the dedup logic cannot check for you: (1) unique
        per logical stream — two streams sharing an id would dedup each
        other's batches; (2) tied to ONE checkpoint location for the
        stream's lifetime — restarting with a fresh checkpoint resets
        batch_id to 0, which this guard would read as already-committed
        replays and silently drop. When retiring a checkpoint, retire
        the query_id with it (e.g. suffix a run epoch).
        """

        def append_batch(batch_df: DataFrame, batch_id: int) -> None:
            if batch_id <= self.last_stream_batch(table, query_id):
                return  # replay of a committed batch
            aligned = align_to_schema(batch_df, schema)
            partitioned = self._is_partitioned(table)
            stage, n = self._begin_write(table)
            if n > 1:
                _link_tree(self._version_dir(table, n - 1), stage)
            if partitioned:
                # follow the existing hive layout — a flat append would
                # mix leaf depths and break partition discovery
                pcols = self._layout_partition_cols(table)
                aligned.write.mode("append").partitionBy(*pcols).parquet(stage)
            else:
                aligned.write.mode("append").parquet(stage)
            self._store_schema(table, schema)
            self._publish(table, stage, n)
            meta = self._carry_meta(table)
            meta[f"stream_batch:{query_id}"] = batch_id
            self._commit_version(table, n, meta=meta)

        return append_batch
