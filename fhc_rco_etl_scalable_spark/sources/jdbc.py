"""JDBC source adapters (S3 in SURVEY §2.1).

The reference embeds the time predicate in SQL text per table
(ref/RCO_Maple_orchestrator.R:36-41,102-107,131-136) against SQL
Server. Spark-first: ``spark.read.jdbc`` with an explicit column list
and window predicate — Catalyst pushes both to the database, and
``partitionColumn`` bounds give parallel range scans instead of the
reference's single-cursor read.

The adapter exposes the reader *construction* (query text + options)
separately from the connect step so deployments against any warehouse
reuse it; tests exercise BOTH the construction and a live end-to-end
round-trip against embedded Derby (bundled with Spark), including the
parallel range-partitioned read path (tests/test_sources.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


@dataclass
class JdbcWindowScan:
    """A windowed table scan: SELECT <cols> FROM t WHERE ts > start AND
    ts < end, optionally range-partitioned for parallel extraction."""

    url: str
    table: str
    columns: list[str]
    ts_col: str
    start: str
    end: str
    extra_predicates: list[str] = field(default_factory=list)
    num_partitions: int | None = None
    properties: dict[str, str] = field(default_factory=dict)
    #: False for numeric window columns (epoch seconds / surrogate keys):
    #: emits unquoted bounds so strict engines (Derby, Postgres) don't
    #: reject a BIGINT-vs-CHAR comparison.
    quote_bounds: bool = True

    def query(self) -> str:
        lo, hi = (
            (f"'{self.start}'", f"'{self.end}'")
            if self.quote_bounds
            else (str(self.start), str(self.end))
        )
        preds = [
            f"{self.ts_col} > {lo}",
            f"{self.ts_col} < {hi}",
            *self.extra_predicates,
        ]
        cols = ", ".join(self.columns) if self.columns else "*"
        return f"SELECT {cols} FROM {self.table} WHERE {' AND '.join(preds)}"

    def reader(self, spark: SparkSession) -> DataFrameReader:
        r = spark.read.format("jdbc").option("url", self.url)
        if self.num_partitions:
            # parallel range extraction over the window
            r = (
                r.option("dbtable", f"({self.query()}) src")
                .option("partitionColumn", self.ts_col)
                .option("lowerBound", self.start)
                .option("upperBound", self.end)
                .option("numPartitions", str(self.num_partitions))
            )
        else:
            r = r.option("query", self.query())
        for k, v in self.properties.items():
            r = r.option(k, v)
        return r

    def load(self, spark: SparkSession) -> DataFrame:
        return self.reader(spark).load()
