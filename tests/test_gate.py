"""Tests of the correctness gate itself and the certification rotation.

Round 5 shipped two cent-level wrong answers while the local gate said
"100/100 green" because tools/check_oracle.py canonicalized floats at 6
significant digits.  Round 6 shipped three MORE greens-that-were-red
because the replica compared duckdb ``fetchall()`` tuples and collapsed
integral floats to ints, while the driver canonicalizes through pandas
(``.df()`` / ``.toPandas()`` + ``sort_values``): DuckDB HUGEINT sums
render float64 ('966.0') vs Spark's long ('966'), and a LIST output
column crashes ``sort_values`` outright.

These tests pin the rebuilt gate to the driver's pipeline: each of the
three round-6 red formulations is reproduced here in miniature and must
stay flagged — they are the gate's own regression fixtures.
"""

import sys

import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from check_oracle import canon_cell, canon_pandas, lint_oracle_types  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


class TestGateFloatPrecision:
    def test_cent_level_divergence_is_caught(self):
        # The exact round-5 wrong answer: Spark 245262.57 vs oracle
        # 245262.58 hashed IDENTICALLY under the old f"{v:.6g}" canon
        # (both -> "245263").  Full-precision repr must split them.
        assert canon_cell(245262.57) != canon_cell(245262.58)
        assert canon_cell(151818.24) != canon_cell(151818.23)
        assert canon_cell(68737.64) != canon_cell(68737.63)

    def test_tiny_float_drift_is_caught(self):
        # Order-dependent double summation drift (~1e-10 relative) must
        # no longer hash-collide: that is what round(sum(double), 2)
        # amplified into visible cents.
        assert canon_cell(0.1 + 0.2) != canon_cell(0.3)

    def test_nan_and_null_are_one_sentinel(self):
        assert canon_cell(None) == canon_cell(float("nan"))


class TestGateIsDriverFaithful:
    """Reproductions of the three round-6 official reds.  Each must be
    caught by the rebuilt canon/linter; the old replica passed all
    three as green (VERDICT r6, 'What's wrong' #1-#4)."""

    def test_integral_float_does_not_collapse_to_int(self):
        # dq_profile / tpch_late_lines class: pandas float64 966.0 (the
        # driver's rendering of DuckDB HUGEINT) must NOT hash equal to
        # Spark's int64 966.  The round-6 replica collapsed both to
        # "966" and was structurally blind to the divergence.
        assert canon_cell(966.0) != canon_cell(966)
        assert canon_cell(float(3)) != canon_cell(3)

    def test_hugeint_sum_divergence_is_caught_end_to_end(self):
        # Exactly the driver's two sides for an uncast oracle sum():
        # DuckDB .df() -> float64, Spark .toPandas() -> int64.
        duckdb = pytest.importorskip("duckdb")
        d = duckdb.sql(
            "SELECT k, sum(v) AS s FROM (VALUES ('F', 480), ('F', 486),"
            " ('O', 943)) t(k, v) GROUP BY k"
        ).df()
        assert str(d["s"].dtype) == "float64"  # HUGEINT -> pandas float64
        s = pd.DataFrame({"k": ["F", "O"], "s": pd.array([966, 943], dtype="int64")})
        assert canon_pandas(d) != canon_pandas(s)
        # ...and a BIGINT-cast oracle aligns:
        d2 = duckdb.sql(
            "SELECT k, CAST(sum(v) AS BIGINT) AS s FROM (VALUES ('F', 480),"
            " ('F', 486), ('O', 943)) t(k, v) GROUP BY k"
        ).df()
        assert canon_pandas(d2) == canon_pandas(s)

    def test_list_column_crashes_canon_like_the_driver(self):
        # encode_documents class: a raw array output column makes the
        # driver's sort_values raise 'unhashable type' — the gate must
        # surface that as a failure, not sidestep it.
        df = pd.DataFrame({"doc_id": [1, 2], "token_ids": [[1, 2], [3]]})
        with pytest.raises(TypeError):
            canon_pandas(df)

    def test_matching_frames_hash_equal_across_row_and_column_order(self):
        a = pd.DataFrame({"x": [1, 3], "y": [2.5, 4.5]})
        b = pd.DataFrame({"y": [4.5, 2.5], "x": [3, 1]})
        assert canon_pandas(a) == canon_pandas(b)

    def test_date_and_midnight_timestamp_align(self):
        # Spark dates arrive as datetime.date objects, DuckDB dates as
        # datetime64 at midnight; both canonicalize to 'YYYY-MM-DD'.
        import datetime

        a = pd.DataFrame({"d": [datetime.date(1996, 1, 1)]})
        b = pd.DataFrame({"d": pd.to_datetime(["1996-01-01"])})
        assert canon_pandas(a) == canon_pandas(b)


class TestOracleTypeLinter:
    """The static output-type linter: HUGEINT / DECIMAL / LIST / STRUCT
    / MAP oracle output columns are exactly the classes whose pandas
    materialization diverges from Spark's — banned at the source."""

    @pytest.fixture(scope="class")
    def con(self):
        duckdb = pytest.importorskip("duckdb")
        return duckdb.connect()

    def test_uncast_integer_sum_is_flagged(self, con):
        errs = lint_oracle_types(
            con, "t", "SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)"
        )
        assert errs and "HUGEINT" in errs[0]

    def test_list_output_is_flagged(self, con):
        errs = lint_oracle_types(con, "t", "SELECT [1, 2, 3] AS a")
        assert errs and "[]" in errs[0]

    def test_decimal_output_is_flagged(self, con):
        errs = lint_oracle_types(
            con, "t", "SELECT CAST(1.5 AS DECIMAL(18, 4)) AS m"
        )
        assert errs and "DECIMAL" in errs[0]

    def test_bigint_cast_and_serialized_list_pass(self, con):
        assert not lint_oracle_types(
            con, "t",
            "SELECT CAST(sum(x) AS BIGINT) AS s,"
            " array_to_string([1, 2], ' ') AS a FROM (VALUES (1), (2)) t(x)",
        )

    def test_every_catalog_oracle_is_lint_clean(self, con):
        # The whole shipped catalog must satisfy the linter against the
        # real table schemas (sf0.001 keeps typing fast).
        for t in ("region nation customer supplier part orders lineitem"
                  " events documents embeddings").split():
            con.execute(
                f"CREATE VIEW IF NOT EXISTS {t} AS SELECT *"
                f" FROM '/root/testdata/sf0.001/{t}.parquet'"
            )
        bad = []
        for name, sql in entry_mod.oracle_sql().items():
            try:
                bad += lint_oracle_types(con, name, sql)
            except Exception as e:  # a syntactically-unlintable oracle is a bug too
                bad.append(f"{name}: linter error: {e}")
        assert not bad, "\n".join(bad)


class TestCertificationRotation:
    def test_queries_and_oracles_share_order_and_names(self):
        q = list(entry_mod.queries())
        o = list(entry_mod.oracle_sql())
        assert q[: len(o)] == o[: len(q)] or q == o
        assert len(q) == len(set(q))

    def test_never_green_and_recertify_land_in_graded_window(self):
        green = entry_mod._green_history()
        q = list(entry_mod.queries())
        window = set(q[:50])
        never_green = [n for n in q if n not in green]
        missed = [n for n in never_green[:50] if n not in window]
        assert not missed, f"never-green entries outside graded window: {missed}"
        slots_left = 50 - len(never_green)
        for n in entry_mod._RECERTIFY[: max(0, slots_left)]:
            assert n in window, f"recertify entry {n} outside graded window"

    def test_rotation_is_deterministic(self):
        assert list(entry_mod.queries()) == list(entry_mod.queries())

    def test_recertify_names_exist_in_catalog(self):
        from fhc_rco_etl_scalable_spark.plans import harness_queries as hq

        unknown = [n for n in entry_mod._RECERTIFY if n not in hq.QUERIES]
        assert not unknown, f"_RECERTIFY names not in catalog: {unknown}"


class TestPartitionCountInvariance:
    """The catalog's exactness claims (integer-scaled PageRank,
    DECIMAL-moment OLS, explicit-fold EWMA, rank-window quantiles)
    assert results independent of physical partitioning. Pin it: the
    same entry under shuffle.partitions=3 and =29 must collect
    IDENTICAL rows — any order-dependent float summation or
    nondeterministic tie-break flips this before it can ship."""

    ENTRIES = [
        "pagerank_centrality",
        "trend_fit",
        "ewma_smooth",
        "exact_quantiles",
        "negative_sample",
        "sliding_distinct_users",
        # r11 (VERDICT r10 #7): the r10/r11 exactness claimers —
        # integer-sum graph aggregates, the oriented triangle census,
        # the fixed-point peel, the integer-scaled 2-round
        # propagation, and the interval-compare nearest as-of.
        "neighbor_feature_agg",
        "neighbor_feature_agg_2round",
        "kcore_filter",
        "kcore_converged",
        "triangle_count",
        "asof_nearest",
        "collocations",
        "label_propagation",
        "pivot_event_types",
        # r12 (VERDICT r11 #7): the remaining r11 exactness claimer —
        # the broadcast PIT join's "at most one version matches" —
        # plus every r12 addition: the one-shuffle pivot's DECIMAL
        # cells, the fixed-point LPA, and the md5-mixed draw.
        "scd2_pit_lookup",
        "pivot_event_types_wide",
        "label_propagation_converged",
        "negative_sample_decorrelated",
    ]

    @staticmethod
    def _canon(df):
        return sorted(map(tuple, df.collect()))

    @pytest.mark.parametrize("name", ENTRIES)
    def test_partition_count_invariance(self, spark, name):
        from fhc_rco_etl_scalable_spark.plans import harness_queries as hq

        sf = "/root/testdata/sf0.001"
        prior = spark.conf.get("spark.sql.shuffle.partitions")
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            a = self._canon(hq.QUERIES[name](spark, sf))
            spark.conf.set("spark.sql.shuffle.partitions", "29")
            b = self._canon(hq.QUERIES[name](spark, sf))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prior)
        assert a == b
