"""Downtime/production event normalization: derived flags and the
constraint/exclusion filter lattice (SURVEY §2.1/2.3; reference
App/etl/extract/data_from_mdc.py:8-111).

The reference derives boolean flags row-by-row with Python lambdas
(data_from_mdc.py:62-85) then materializes four filtered copies of the
downtime frame. Here the flags are native column expressions and the
"variants" are lazy filters over ONE scan — Catalyst collapses the
lattice into predicate pushdown, so each variant reads only what it
needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BLOCKED_STARVED = ("DTMach-Blocked", "DTMach-Starved")


def with_derived_flags(
    downtime: DataFrame,
    line_config: DataFrame | None = None,
) -> DataFrame:
    """Attach isConstraint / isExcluded / isStop / Planned_Stop_Check /
    Idle_Check (reference data_from_mdc.py:62-85).

    - constraint machine name = LINE + ' ' + Constraint_Machine_String
      (broadcast join to line_config on LINE = MDC_Line_Name);
    - isExcluded: LineStatus present and != 'None' (PR-Out stretches);
    - isStop: category is a real stop, not blocked/starved propagation;
    - Planned/Idle checks: substring containment over cause level 1.
    """
    df = downtime
    if line_config is not None:
        cfg = line_config.select(
            F.col("MDC_Line_Name").alias("LINE"),
            F.concat_ws(
                " ", F.col("MDC_Line_Name"), F.col("Constraint_Machine_String")
            ).alias("__constraint_machine"),
        )
        df = df.join(F.broadcast(cfg), "LINE", "left").withColumn(
            "isConstraint",
            F.col("MACHINE").eqNullSafe(F.col("__constraint_machine")),
        ).drop("__constraint_machine")
    elif "isConstraint" not in df.columns:
        df = df.withColumn("isConstraint", F.lit(True))

    return (
        df.withColumn(
            "isExcluded",
            F.col("LineStatus").isNotNull() & (F.col("LineStatus") != "None"),
        )
        .withColumn("isStop", ~F.coalesce(F.col("dtCategory").isin(*BLOCKED_STARVED), F.lit(False)))
        .withColumn(
            "Planned_Stop_Check",
            F.when(F.coalesce(F.col("CAUSE_LEVELS_1_NAME"), F.lit("")).contains("Planned"), 1).otherwise(0),
        )
        .withColumn(
            "Idle_Check",
            F.when(F.coalesce(F.col("CAUSE_LEVELS_1_NAME"), F.lit("")).contains("Idle"), 1).otherwise(0),
        )
    )


def downtime_variants(flagged: DataFrame) -> dict[str, DataFrame]:
    """The reference's four extraction outputs (data_from_mdc.py:89-111):
    line-level vs machine-level x strict (non-excluded real stops) vs
    full. All lazy views over one frame."""
    constraint = F.col("isConstraint")
    clean: Column = (~F.col("isExcluded")) & F.col("isStop")
    return {
        "line_dt": flagged.filter(constraint & clean),
        "line_dt_full": flagged.filter(constraint),
        "machine_dt": flagged.filter(clean),
        "machine_dt_full": flagged,
    }
