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
environment, so the sink here implements the same semantics over
parquet directories with an atomic directory swap: rewrite = read
survivors (anti overlap) + union new + write tmp + rename. The write
amplification is bounded by partitioning the table directory by a
coarse time bucket at scale (only overlapping partitions rewrite —
the ``replaceWhere`` pattern); the harness tables are small enough to
swap whole.

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

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame | None:
        p = self._path(table)
        if not os.path.exists(p):
            return None
        df = self.spark.read.parquet(p)
        return align_to_schema(df, schema) if schema is not None else df

    def _atomic_write(self, df: DataFrame, table: str) -> None:
        p = self._path(table)
        tmp = p + ".tmp-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        old = p + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(p):
            os.rename(p, old)
        os.rename(tmp, p)
        if os.path.exists(old):
            shutil.rmtree(old, ignore_errors=True)

    def append_aligned(self, new_rows: DataFrame, table: str, schema: T.StructType) -> None:
        """S8: append with target-schema alignment (reorder, pad
        missing with NULL, cast) — reference
        App/etl/overall_etl.py:12-43."""
        align_to_schema(new_rows, schema).write.mode("append").parquet(self._path(table))

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

        Delta equivalent: ``MERGE``/``replaceWhere``; here an atomic
        swap of the table directory.
        """
        new_aligned = align_to_schema(new_rows, schema)
        existing = self.read(table, schema)
        if existing is None:
            self._atomic_write(new_aligned, table)
            return
        cutoff = watermark - timedelta(seconds=pad_seconds)
        keys = new_aligned.select(*partition_cols).distinct()
        # coalesce: `ts >= cutoff` is NULL for NULL-ts rows and the
        # survivor filter `~(in_batch & overlap)` would silently drop
        # them every load; the reference DELETE (`ts >= cutoff`) keeps
        # NULL-ts rows, so must we.
        overlap = F.coalesce(F.col(ts_col) >= F.lit(cutoff), F.lit(False))
        # survivors: rows outside the overlap window, or for partition
        # keys not in this batch
        in_batch = None
        for k in partition_cols:
            c = F.col(f"__k_{k}").isNotNull()
            in_batch = c if in_batch is None else (in_batch & c)
        tagged = existing.join(
            F.broadcast(
                keys.select(*[F.col(k).alias(f"__k_{k}") for k in partition_cols])
            ),
            [
                existing[k].eqNullSafe(F.col(f"__k_{k}"))
                for k in partition_cols
            ],
            "left",
        )
        survivors = tagged.filter(~(in_batch & overlap)).select(*[f.name for f in schema.fields])
        self._atomic_write(survivors.unionByName(new_aligned), table)

    def merge_dedup_overwrite(
        self,
        new_rows: DataFrame,
        table: str,
        schema: T.StructType,
        key: str = "BRANDCODE",
    ) -> None:
        """S10: historical rows whose key is absent from the new batch
        are kept; everything else comes from the batch (reference
        R:556-585 anti-join + rewrite)."""
        new_aligned = align_to_schema(new_rows, schema).dropDuplicates([key])
        existing = self.read(table, schema)
        if existing is None:
            self._atomic_write(new_aligned, table)
            return
        keep = existing.join(new_aligned.select(key), key, "left_anti")
        self._atomic_write(keep.unionByName(new_aligned), table)

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
            self._atomic_write(new_aligned, table)
            return
        keep = existing.join(new_aligned.select(*keys), list(keys), "left_anti")
        self._atomic_write(keep.unionByName(new_aligned), table)

    def watermark(self, table: str = "Script_Data") -> datetime | None:
        """A7: max(Data_Update_Time) from the state table
        (App/utils/time_utils.py:11-14)."""
        df = self.read(table)
        if df is None:
            return None
        row = df.agg(F.max("Data_Update_Time").alias("wm")).first()
        return row.wm
