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
parquet: ``delete_overlap_append`` tables are hive-partitioned by the
delete-scope key (default ``LINE``/``Server``) and a load rewrites
ONLY the partition directories whose keys appear in the batch (the
``replaceWhere`` pattern) — survivors for those keys are read with a
partition-pruned scan, unioned with the batch, staged, then swapped
per-partition. Untouched partitions' files are never rewritten, so
write amplification is O(batch partitions), not O(table). Small state
tables (brandcode master, Script_Data) still swap whole — they are
tiny by construction.

Idempotence invariant (property-tested): loading the same window twice
yields byte-identical tables.
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import align_to_schema


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


class ParquetIncrementalSink:
    """Directory-per-table parquet sink with the reference's
    incremental semantics."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, table: str) -> str:
        return os.path.join(self.root, table)

    # --- schema sidecar (hidden from parquet readers: leading "_") ----

    def _store_schema(self, table: str, schema: T.StructType) -> None:
        with open(os.path.join(self._path(table), "_schema.json"), "w") as f:
            f.write(schema.json())

    def _stored_schema(self, table: str) -> T.StructType | None:
        sp = os.path.join(self._path(table), "_schema.json")
        if not os.path.exists(sp):
            return None
        with open(sp) as f:
            return T.StructType.fromJson(__import__("json").load(f))

    def _is_partitioned(self, table: str) -> bool:
        p = self._path(table)
        return os.path.isdir(p) and any(
            "=" in d for d in os.listdir(p) if os.path.isdir(os.path.join(p, d))
        )

    def _read_raw(self, table: str) -> DataFrame:
        """Read with partition values kept as RAW strings ("01" must not
        become 1 — align_to_schema casts per the stored schema). The
        inference conf is session-global, so save/restore it around the
        (eager) schema+partition discovery instead of mutating the
        caller's session permanently."""
        p = self._path(table)
        key = "spark.sql.sources.partitionColumnTypeInference.enabled"
        prev = self.spark.conf.get(key, None)
        self.spark.conf.set(key, "false")
        try:
            return self.spark.read.option("basePath", p).parquet(p)
        finally:
            if prev is None:
                self.spark.conf.unset(key)
            else:
                self.spark.conf.set(key, prev)

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame | None:
        p = self._path(table)
        self._recover(table)
        if not os.path.exists(p):
            return None
        df = self._read_raw(table)
        schema = schema if schema is not None else self._stored_schema(table)
        return align_to_schema(df, schema) if schema is not None else df

    def _atomic_write(self, df: DataFrame, table: str, schema: T.StructType | None = None) -> None:
        p = self._path(table)
        tmp = p + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        old = p + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(p):
            os.rename(p, old)
        os.rename(tmp, p)
        if schema is not None:
            self._store_schema(table, schema)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def _atomic_write_partitioned(
        self,
        df: DataFrame,
        table: str,
        schema: T.StructType,
        partition_cols: tuple[str, ...],
    ) -> None:
        p = self._path(table)
        tmp = p + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(tmp)
        old = p + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(p):
            os.rename(p, old)
        os.rename(tmp, p)
        self._store_schema(table, schema)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

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

    def _manifest_path(self, table: str) -> str:
        return self._path(table) + ".commit.json"

    def _recover(self, table: str) -> None:
        """Crash recovery for an interrupted partition swap. The
        manifest written before a swap records staging/trash paths and
        the partitions in flight; plain directory renames cannot be
        made jointly atomic, so recovery restores a consistent state:

        - staging dir still present -> the swap did not finish: roll
          BACK every manifest partition from trash (the pre-swap
          copies), then drop staging/trash. The interrupted load simply
          re-runs (loads are idempotent by design).
        - staging gone -> every partition was swapped and only cleanup
          was interrupted: roll FORWARD (drop trash + manifest).
        """
        import json

        mp = self._manifest_path(table)
        if not os.path.exists(mp):
            return
        with open(mp) as f:
            m = json.load(f)
        p = self._path(table)
        if os.path.exists(m["staging"]):
            for rel in m["partitions"]:
                tdir = os.path.join(m["trash"], rel)
                if os.path.exists(tdir):
                    dst = os.path.join(p, rel)
                    if os.path.exists(dst):
                        shutil.rmtree(dst, ignore_errors=True)
                    os.makedirs(os.path.dirname(dst), exist_ok=True)
                    os.rename(tdir, dst)
            shutil.rmtree(m["staging"], ignore_errors=True)
        shutil.rmtree(m["trash"], ignore_errors=True)
        os.remove(mp)

    def _swap_partitions(self, staging: str, table: str, depth: int) -> None:
        """Replace only the partition dirs present in ``staging`` —
        untouched partitions' files are never rewritten (asserted by
        test_incremental.test_untouched_partitions_not_rewritten).

        A commit manifest makes the multi-rename sequence recoverable
        (see :meth:`_recover`); on Delta/Iceberg this whole method is
        one atomic MERGE/replaceWhere commit."""
        import json

        p = self._path(table)
        trash = p + ".trash-" + uuid.uuid4().hex[:8]
        leaves = self._leaf_partition_dirs(staging, depth)
        mp = self._manifest_path(table)
        with open(mp, "w") as f:
            json.dump({"staging": staging, "trash": trash, "partitions": leaves}, f)
        for rel in leaves:
            src = os.path.join(staging, rel)
            dst = os.path.join(p, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            if os.path.exists(dst):
                tdir = os.path.join(trash, rel)
                os.makedirs(os.path.dirname(tdir), exist_ok=True)
                os.rename(dst, tdir)
            os.rename(src, dst)
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(trash, ignore_errors=True)
        os.remove(mp)

    def _layout_partition_cols(self, table: str) -> list[str]:
        """Partition columns of an existing hive layout, read from the
        first leaf dir's ``k=v`` path components."""
        p = self._path(table)
        cols: list[str] = []
        d = p
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

        Appending into a partition-scoped table (see
        :meth:`delete_overlap_append`) follows the existing hive
        layout — a flat append there would mix layouts and break
        reads."""
        aligned = align_to_schema(new_rows, schema)
        writer = aligned.write.mode("append")
        if self._is_partitioned(table):
            writer = writer.partitionBy(*self._layout_partition_cols(table))
        writer.parquet(self._path(table))

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
        union the batch, stage, swap per-partition. At 100 TB this
        bounds each load's write amplification to the touched
        (LINE, Server) partitions instead of the whole table.

        Note: hive layout folds NULL and empty-string key values into
        the same default partition; the reference keys (LINE, Server)
        are non-empty by construction.
        """
        self._recover(table)
        new_aligned = align_to_schema(new_rows, schema)
        # Batch partition keys: driver-side, bounded by the number of
        # (LINE, Server) combinations in one load — tiny by design.
        keys = new_aligned.select(*partition_cols).distinct().collect()
        if not keys:
            # Empty batch: the DELETE scope is the batch's keys — no
            # keys, nothing to delete or append. (Also keeps an empty
            # FIRST load from creating a rowless, schema-less dir.)
            return
        if not os.path.exists(self._path(table)):
            self._atomic_write_partitioned(new_aligned, table, schema, partition_cols)
            return
        if not self._is_partitioned(table):
            # One-time migration of a legacy unpartitioned directory:
            # full rewrite into the partitioned layout, then future
            # loads are partition-scoped.
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
        # match nothing and the swap would drop pre-cutoff survivors).
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
        staging = self._path(table) + ".stage-" + uuid.uuid4().hex[:8]
        survivors.unionByName(new_aligned).write.mode("overwrite").partitionBy(
            *partition_cols
        ).parquet(staging)
        self._swap_partitions(staging, table, len(partition_cols))

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
        migration): same semantics, whole-directory swap."""
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

    def watermark(self, table: str = "Script_Data") -> datetime | None:
        """A7: max(Data_Update_Time) from the state table
        (App/utils/time_utils.py:11-14)."""
        df = self.read(table)
        if df is None:
            return None
        row = df.agg(F.max("Data_Update_Time").alias("wm")).first()
        return row.wm
