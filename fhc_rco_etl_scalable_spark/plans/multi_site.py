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
