"""Blocked approximate string matching (entity resolution).

The reference's brandcode merge (App/etl/brandcode_etl.py) treats
near-identical code strings as exact after scrubbing; real multi-site
catalogs also carry typo'd variants, which need an edit-distance
match. All-pairs levenshtein is O(n^2) and unrunnable at catalog
scale, so the join is blocked first:

- **length banding** — ``|len(a) - len(b)| <= d`` is a necessary
  condition for ``levenshtein(a, b) <= d``, so each right-side string
  explodes its length window ``[len-d, len+d]`` (2d+1 ints) and the
  candidate join is a plain equi-join on the banded length. Exact: no
  true match escapes the block; candidates are verified with the real
  edit distance afterwards.

At 100 TB the equi-join shuffles on the band key like any other join
(AQE handles the skewed popular lengths); production deployments add a
second blocking key (first q-gram, phonetic code) to the band tuple —
the candidate join shape stays identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_self_match(
    df: DataFrame,
    col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Distinct values of ``col`` within edit distance ``max_dist`` of
    each other, as ordered pairs (name_a < name_b, so each unordered
    pair reports once). Returns (name_a, name_b, dist).

    Length banding bounds the candidate space; the strict ``<``
    ordering both dedups the symmetric pair and drops self-matches.
    """
    vals = df.select(F.col(col).alias("name_a")).distinct()
    banded = df.select(F.col(col).alias("name_b")).distinct().select(
        "name_b",
        F.explode(
            F.sequence(
                F.length("name_b") - max_dist, F.length("name_b") + max_dist
            )
        ).alias("__band"),
    )
    return (
        vals.withColumn("__band", F.length("name_a"))
        .join(banded, "__band")
        .filter(F.col("name_a") < F.col("name_b"))
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
) -> DataFrame:
    """Approximate equi-join: every (left, right) row pair whose key
    strings are within ``max_dist`` edits. Banding as above; all left
    columns plus the matched right key (``matched``) and the distance
    survive."""
    banded = right.select(
        F.col(right_col).alias("matched"),
        F.explode(
            F.sequence(
                F.length(right_col) - max_dist, F.length(right_col) + max_dist
            )
        ).alias("__band"),
    )
    return (
        left.withColumn("__band", F.length(left_col))
        .join(banded, "__band")
        .withColumn("dist", F.levenshtein(F.col(left_col), F.col("matched")))
        .filter(F.col("dist") <= max_dist)
        .drop("__band")
    )
