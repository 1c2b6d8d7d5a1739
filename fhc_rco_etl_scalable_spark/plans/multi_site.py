"""Multi-site orchestration (reference E1: App/rco_main.py:70-118).

The reference iterates sites sequentially, collecting a per-site
Success/Failure dict into a JSON run log (S13). Sites are independent
— here each site's lazy DAG is submitted from its own driver thread
(Spark schedules the jobs concurrently across the shared executors;
FAIR scheduling recommended on a busy cluster), and the run log is the
same status mapping, plus the error detail the reference discards.

A failure in one site never aborts the others (reference semantics:
try/except per site, App/rco_main.py:112-117).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor
from dataclasses import dataclass
from datetime import datetime
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .rco_pipeline import SiteParams
from .site_etl import site_etl


@dataclass
class SiteRun:
    site: SiteParams
    downtime: DataFrame
    production: DataFrame | None = None
    line_config: DataFrame | None = None


def run_all_sites(
    runs: list[SiteRun],
    load: Callable[[str, dict[str, DataFrame]], None],
    max_parallel_sites: int = 4,
    data_update_time: datetime | None = None,
) -> dict[str, Any]:
    """Execute every site's ETL and hand its outputs to ``load`` (the
    side-effecting sink stage). Returns the run log:
    ``{server: 'Success' | {'Failure': <error>}}``.
    """

    def one(run: SiteRun) -> tuple[str, Any]:
        try:
            outs = site_etl(
                run.downtime,
                run.production,
                run.site,
                line_config=run.line_config,
                data_update_time=data_update_time,
            )
            load(run.site.server, outs)
            return run.site.server, "Success"
        except Exception as e:  # per-site isolation (reference :112-117)
            return run.site.server, {"Failure": f"{type(e).__name__}: {e}"}

    with ThreadPoolExecutor(max_workers=max_parallel_sites) as pool:
        return dict(pool.map(one, runs))


# ---------------------------------------------------------------------------
# Standard persistence stage: the reference orchestrator's per-table
# load semantics (ref/RCO_Overall_orchestrator.R:304-394 delete+append
# with -10 s pad, :362 Gantt (15+5) min pad, :556-585 BRANDCODE merge,
# :236-282/:502-546 Script_Data upsert), expressed over the
# partition-scoped parquet sink. ``run_all_sites(runs,
# incremental_site_loader(sink, watermark))`` is the whole E1 lifecycle.
# ---------------------------------------------------------------------------

# table -> (mode, time column | merge keys, delete-scope keys, pad seconds)
_LOAD_SPECS: dict[str, tuple] = {
    "CO_Aggregated_Data": ("delete_overlap", "CO_StartTime", ("LINE", "Server"), 10.0),
    "CO_Event_Log": ("delete_overlap", "START_TIME", ("LINE", "Server"), 10.0),
    "First_Stop_after_CO_Data": ("delete_overlap", "CO_EndTime", ("LINE", "Server"), 10.0),
    "Gantt_Data": ("delete_overlap", "StartTime", ("Line", "Server"), 1200.0),
    "Event_Log_for_Gantt": ("delete_overlap", "START_TIME", ("Line", "Server"), 1200.0),
    "Runtime_per_Day_data": ("delete_overlap", "Date", ("LINE", "Server"), 0.0),
    "BRANDCODE_data": ("merge", ("BRANDCODE", "Server"), None, None),
    "Script_Data": ("upsert", ("System", "Server"), None, None),
}


def incremental_site_loader(
    sink, watermark: datetime
) -> Callable[[str, dict[str, DataFrame]], None]:
    """Build the ``load`` callback for :func:`run_all_sites`: every
    output table lands with the reference's incremental semantics over
    a :class:`~..sinks.incremental.ParquetIncrementalSink`. ``watermark``
    is the analysis-window start (the delete cutoff anchor) — at scale
    derived per run via ``sinks.incremental.lookback_start``."""
    import threading

    from ..schemas import OUTPUT_SCHEMAS

    # The sink's read-modify-swap on a shared table directory is not
    # safe under run_all_sites' thread pool (two sites loading the same
    # table would each stage against the same pre-state and one swap
    # would win). Commits are serialized; each site's Spark jobs still
    # use the whole cluster while they hold the lock, so compute
    # parallelism is preserved within a load. (Delta/Iceberg replace
    # this lock with optimistic transactional commits.)
    lock = threading.Lock()

    def load(server: str, outputs: dict[str, DataFrame]) -> None:
        with lock:
            _load_unlocked(server, outputs)

    def _load_unlocked(server: str, outputs: dict[str, DataFrame]) -> None:
        for name, df in outputs.items():
            spec = _LOAD_SPECS.get(name)
            schema = OUTPUT_SCHEMAS.get(name)
            if spec is None or schema is None:
                continue
            mode, arg, scope, pad = spec
            if mode == "delete_overlap":
                # Date-grained tables delete whole days: floor the
                # cutoff to midnight or a mid-day watermark strands the
                # watermark-day row as a survivor while the batch
                # re-adds its recomputed twin.
                wm = watermark
                if isinstance(schema[arg].dataType, T.DateType):
                    wm = datetime.combine(watermark.date(), datetime.min.time())
                sink.delete_overlap_append(
                    df, name, schema, ts_col=arg, watermark=wm,
                    partition_cols=scope, pad_seconds=pad,
                )
            elif mode == "merge":
                sink.merge_dedup_overwrite(df, name, schema, key=arg)
            else:
                sink.upsert_script_data(df, name, schema, keys=arg)

    return load
