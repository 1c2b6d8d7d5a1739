"""Function-library units: rule DSL compiler, dynamic rounding,
predicate validation."""

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.functions.predicates import (
    compile_rule,
    validate_predicate,
)
from fhc_rco_etl_scalable_spark.functions.scalar import dynamic_round


@pytest.fixture(scope="module")
def causes(spark):
    return spark.createDataFrame(
        [
            ("1", "Planned Downtime", "Changeover", None),
            ("2", "Planned Downtime", "SCO cleaning", "Cisteni A"),
            ("3", "Unplanned Downtime", "Failure", None),
            ("4", None, "changeover minor", None),
        ],
        "id string, c1 string, c2 string, c3 string",
    )


def _ids(df, rule):
    return sorted(r.id for r in df.filter(compile_rule(rule)).collect())


def test_rule_dsl_catalog_shapes(causes):
    # the per-site catalog shapes (ref/condition_management_notes.md:18-124):
    # conjunction + substring + negation
    rule = {
        "all": [
            {"col": "c1", "eq": "Planned Downtime"},
            {"col": "c2", "icontains": "change"},
            {"not": {"col": "c3", "contains": "Cisteni"}},
        ]
    }
    assert _ids(causes, rule) == ["1"]
    # disjunction + case-insensitive + in-list
    rule2 = {
        "any": [
            {"col": "c2", "rlike": "(?i)^changeover"},
            {"col": "c2", "in": ["Failure"]},
        ]
    }
    assert _ids(causes, rule2) == ["1", "3", "4"]
    # null handling: ne treats NULL as 'not equal'
    assert _ids(causes, {"col": "c1", "ne": "Planned Downtime"}) == ["3", "4"]
    assert _ids(causes, {"col": "c3", "null": True}) == ["1", "3", "4"]


def test_rule_dsl_rejects_malformed():
    with pytest.raises(ValueError):
        compile_rule({"col": "c1"})  # no op
    with pytest.raises(ValueError):
        compile_rule({"col": "c1", "eq": "x", "ne": "y"})  # two ops
    with pytest.raises(ValueError):
        compile_rule({})


def test_validate_predicate_fails_fast(causes):
    col = validate_predicate(causes, "c1 = 'Planned Downtime' AND c2 LIKE '%Change%'")
    assert causes.filter(col).count() == 1
    with pytest.raises(Exception):
        validate_predicate(causes, "nope = 1")


def test_dynamic_round_precision_tiers(spark):
    # R dataframe_decimal_reducer tiers (ref/RCO_Overall_orchestrator.R:119-131)
    df = spark.createDataFrame(
        [(0.0123456, 5.123456, 555.123456)], "tiny double, mid double, big double"
    )
    out = dynamic_round(df, ["tiny", "mid", "big"]).first()
    assert out.tiny == 0.01235  # mean < 0.1 -> 5dp
    assert out.mid == 5.123    # mean < 10 -> 3dp
    assert out.big == 555.1    # mean >= 100 -> 1dp


def test_winnow_guarantee_and_density(spark):
    # Winnowing guarantee: two docs sharing a run of >= k + w - 1 = 8
    # tokens must share at least one fingerprint; fully disjoint docs
    # share none (md5-60 collisions aside).
    from pyspark.sql import functions as F

    from fhc_rco_etl_scalable_spark.functions.text import winnow_fingerprints
    from fhc_rco_etl_scalable_spark.operators.dedup import md5_60

    shared = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8 tokens
    docs = [
        (1, f"one two three {shared} four five six"),
        (2, f"seven eight nine ten {shared} eleven"),
        (3, "completely different words with no overlap at all whatsoever"),
        (4, "tiny"),  # fewer than k tokens -> one window over all
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = df.select(
        "doc_id",
        winnow_fingerprints("text", k=5, w=4, hasher=md5_60).alias("fps"),
    ).collect()
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[1] & fps[2], "docs sharing an 8-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    assert len(fps[4]) == 1  # degenerate short doc still fingerprints
    # density: selected fingerprints are a strict subset of all window
    # hashes (that's the point of winnowing)
    n_tokens = len(docs[0][1].split())
    assert 0 < len(fps[1]) < n_tokens - 5 + 1


def test_winnow_hash_array_not_reevaluated_per_window(spark):
    # The lambda-variable binding keeps the hash build O(n): a doc with
    # ~2000 tokens winnows in well under a second; the naive expression
    # (hashes referenced inside the window lambda) is O(n^2) hashing
    # and takes minutes at this size.
    import time

    from fhc_rco_etl_scalable_spark.functions.text import winnow_fingerprints

    text = " ".join(f"tok{i % 97}x{i % 13}" for i in range(2000))
    df = spark.createDataFrame([(1, text)] * 64, "doc_id long, text string")
    t0 = time.time()
    n = df.select(F.explode(winnow_fingerprints("text")).alias("fp")).count()
    assert n > 0
    # generous bound: the O(n) path takes ~1s, the O(n^2) regression
    # takes minutes; anything in between is machine-load noise, not a
    # complexity regression
    assert time.time() - t0 < 60


def test_chunk_documents_reconstruction(spark):
    # Dropping each chunk's overlap prefix (after the first) and
    # concatenating must reproduce the original token sequence exactly,
    # for lengths around every boundary condition.
    from fhc_rco_etl_scalable_spark.functions.text import chunk_documents

    size, overlap, step = 10, 3, 7
    texts = [
        (n, " ".join(f"w{i}" for i in range(n)))
        for n in [1, 5, 9, 10, 11, 17, 18, 24, 50]
    ]
    df = spark.createDataFrame(texts, "n long, text string")
    rows = df.select(
        "n", chunk_documents("text", size=size, overlap=overlap).alias("chunks")
    ).collect()
    for r in rows:
        rebuilt = []
        for j, ch in enumerate(r.chunks):
            toks = ch.split()
            assert len(toks) <= size
            rebuilt.extend(toks if j == 0 else toks[overlap:])
        assert rebuilt == [f"w{i}" for i in range(r.n)], (r.n, r.chunks)
        # consecutive chunks share exactly `overlap` tokens (when long enough)
        for a, b in zip(r.chunks, r.chunks[1:]):
            assert a.split()[-overlap:] == b.split()[:overlap] or len(b.split()) < overlap

    with pytest.raises(ValueError):
        chunk_documents("text", size=5, overlap=5)


def test_chunk_documents_tokenizer_not_reevaluated_per_chunk(spark):
    # Same O(n) guard as the winnow test: a ~2000-token doc splits into
    # ~25 chunks; with the token array bound as a lambda variable this
    # is sub-second-per-doc work, while re-tokenizing per chunk would
    # be ~25x the tokenization cost and blow the bound.
    import time

    from fhc_rco_etl_scalable_spark.functions.text import chunk_documents

    text = " ".join(f"tok{i % 89}y{i % 17}" for i in range(2000))
    df = spark.createDataFrame([(1, text)] * 64, "doc_id long, text string")
    t0 = time.time()
    n = df.select(F.explode(chunk_documents("text", size=100, overlap=20)).alias("c")).count()
    assert n == 64 * 25
    assert time.time() - t0 < 20


def test_robust_outliers_median_mad_fence(spark):
    from fhc_rco_etl_scalable_spark.functions.dq import robust_outliers

    # g: values 1..7 plus a 1e6 spike. median=4.5, MAD on absdevs
    # {3.5,2.5,1.5,.5,.5,1.5,2.5,999995.5} = 2.0; fence 3*1.4826*2 =
    # 8.8956 — only the spike crosses it. A mean/stddev rule would
    # swallow the spike into sigma and flag nothing.
    rows = [("g", float(x)) for x in range(1, 8)] + [("g", 1_000_000.0)]
    df = spark.createDataFrame(rows, "k string, x double")
    out = robust_outliers(df, ["k"], "x", k=3.0).collect()
    flagged = {r["x"] for r in out if r["is_outlier"]}
    assert flagged == {1_000_000.0}
    assert all(r["__med"] == 4.5 and r["__mad"] == 2.0 for r in out)


def test_robust_outliers_survives_heavy_contamination(spark):
    from fhc_rco_etl_scalable_spark.functions.dq import robust_outliers

    # 30% contamination at 1e6: median/MAD fences still isolate the
    # contaminated points (breakdown point 50%).
    rows = [("g", float(x)) for x in range(1, 8)] + [("g", 1_000_000.0)] * 3
    df = spark.createDataFrame(rows, "k string, x double")
    out = robust_outliers(df, ["k"], "x", k=3.0).collect()
    assert {r["x"] for r in out if r["is_outlier"]} == {1_000_000.0}
    assert sum(r["is_outlier"] for r in out) == 3
