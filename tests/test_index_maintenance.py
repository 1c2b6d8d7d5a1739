"""Persisted-index lifecycle (VERDICT r14 #5/#6): the MinHash band
index grows by appends and compacts without changing dedup results;
the IVF index appends under a frozen quantizer, reports drift, and
retrains; the IVF-PQ index round-trips parquet bit-identically."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.dedup import (
    incremental_minhash_dedup,
    minhash_bands,
)
from fhc_rco_etl_scalable_spark.operators.similarity import (
    ivf_drift_stats,
    ivf_index,
    ivf_index_append,
    ivf_topk_indexed,
    ivfpq_index,
    ivfpq_topk,
    ivfpq_topk_indexed,
)
from fhc_rco_etl_scalable_spark.sinks.incremental import ParquetIncrementalSink

BAND_SCHEMA_DDL = "doc_id long, band int, band_sig string"
SF = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _band_schema(spark):
    return spark.createDataFrame([], BAND_SCHEMA_DDL).schema


def _annotate(spark, sink, batch):
    index = sink.read("band_index")
    annotated, bands = incremental_minhash_dedup(batch, index, "doc_id", "text")
    return (
        sorted(map(tuple, annotated.select("doc_id", "dup_of", "is_new").collect())),
        bands,
    )


def test_band_index_append_compact_lifecycle(spark, tmp_path):
    """N appended batches -> compact -> IDENTICAL dedup result, fewer
    files (the verdict's done-criterion verbatim)."""
    sink = ParquetIncrementalSink(spark, str(tmp_path))
    schema = _band_schema(spark)
    base = "the quick brown fox jumps over the lazy dog and runs away fast"
    # batch i carries one clone of doc 0's text and one novel doc
    batches = [
        _docs(spark, [
            (10 * i, base),
            (10 * i + 1, f"novel text number {i} " * 4 + base[: 3 * i]),
        ])
        for i in range(4)
    ]
    sink.append_aligned(
        minhash_bands(batches[0], "doc_id", "text"), "band_index", schema
    )
    for b in batches[1:4]:
        _, bands = _annotate(spark, sink, b)
        sink.append_aligned(bands, "band_index", schema)

    probe = _docs(spark, [(99, base), (100, "entirely unseen text " * 5)])
    before, _ = _annotate(spark, sink, probe)
    # doc 99 clones doc 0's text -> dup_of the smallest colliding id
    assert (99, 0, False) in before
    assert (100, None, True) in before

    files_before = len(glob.glob(os.path.join(sink._data_path("band_index"), "*.parquet")))
    assert files_before >= 4  # one+ file per append
    sink.compact("band_index", target_files=1)
    files_after = len(glob.glob(os.path.join(sink._data_path("band_index"), "*.parquet")))
    assert files_after == 1

    after, _ = _annotate(spark, sink, probe)
    assert after == before


def test_band_index_self_replay_is_idempotent(spark, tmp_path):
    """ADVICE r14: replaying a batch whose own bands were already
    appended (at-least-once foreachBatch) must not mark the batch
    dup_of itself."""
    sink = ParquetIncrementalSink(spark, str(tmp_path))
    schema = _band_schema(spark)
    batch = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta eta theta")])
    first, bands = _annotate_empty_ok(spark, sink, batch, schema)
    sink.append_aligned(bands, "band_index", schema)
    # replay: the index now contains THIS batch's own bands
    replay, _ = _annotate(spark, sink, batch)
    assert replay == first == [(1, None, True)]


def _annotate_empty_ok(spark, sink, batch, schema):
    index = sink.read("band_index")
    if index is None:
        index = spark.createDataFrame([], BAND_SCHEMA_DDL)
    annotated, bands = incremental_minhash_dedup(batch, index, "doc_id", "text")
    return (
        sorted(map(tuple, annotated.select("doc_id", "dup_of", "is_new").collect())),
        bands,
    )


def test_ivf_index_append_matches_full_rebuild(spark):
    """Appending under the frozen quantizer assigns exactly as a full
    rebuild would when the training sample is unchanged (the sample is
    id-ordered and drawn entirely from the base slice)."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    ids = sorted(r.vec_id for r in emb.select("vec_id").collect())
    cut = ids[len(ids) // 2]
    base = emb.filter(F.col("vec_id") < cut)
    extra = emb.filter(F.col("vec_id") >= cut)
    assignments, centroids = ivf_index(base, n_cells=8, sample_size=64)
    appended = ivf_index_append(extra, centroids)
    grown = assignments.unionByName(appended)

    full_assign, full_cents = ivf_index(emb, n_cells=8, sample_size=64)
    assert sorted(map(tuple, centroids.collect())) == sorted(
        map(tuple, full_cents.collect())
    )
    a = sorted((r.vec_id, r.cell) for r in grown.collect())
    b = sorted((r.vec_id, r.cell) for r in full_assign.collect())
    assert a == b

    # and queries against the grown index equal queries against the
    # full rebuild
    queries = emb.filter("vec_id < 5")
    qa = sorted(map(tuple, ivf_topk_indexed(grown, centroids, queries, k=3, n_probe=8).collect()))
    qb = sorted(map(tuple, ivf_topk_indexed(full_assign, full_cents, queries, k=3, n_probe=8).collect()))
    assert qa == qb


def test_ivf_drift_stats_flag_shifted_appends(spark):
    """Appends far from every trained centroid sag mean_sim — the
    retrain trigger the docstring promises."""
    import numpy as np

    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    assignments, centroids = ivf_index(emb, n_cells=8, sample_size=64)
    healthy = {r.cell: r.mean_sim for r in ivf_drift_stats(assignments, centroids).collect()}
    n_before = assignments.count()

    # adversarial appends: negated copies of the trained centroids are
    # maximally far (cosine -1) from their own cell, and their best
    # available cell is whatever other centroid is least anti-aligned.
    cent_rows = centroids.collect()
    drifted = spark.createDataFrame(
        [
            (100000 + r.cell, [float(-x) for x in r.centroid])
            for r in cent_rows
        ],
        "vec_id long, embedding array<double>",
    )
    grown = assignments.unionByName(ivf_index_append(drifted, centroids))
    after = {r.cell: (r.n_vectors, r.mean_sim) for r in ivf_drift_stats(grown, centroids).collect()}
    assert sum(n for n, _ in after.values()) == n_before + len(cent_rows)
    # at least one cell's mean similarity must drop
    dropped = [c for c, (_, s) in after.items() if c in healthy and s < healthy[c] - 1e-9]
    assert dropped, (healthy, after)
    # retrain story: rebuilding over the grown corpus restores a
    # quantizer fitted to ALL the data (weighted mean sim recovers
    # vs the stale-quantizer state)
    raw_grown = emb.select("vec_id", "embedding").unionByName(drifted)
    re_assign, re_cents = ivf_index(raw_grown, n_cells=8, sample_size=64)
    stale = ivf_drift_stats(grown, centroids).agg(
        (F.sum(F.col("mean_sim") * F.col("n_vectors")) / F.sum("n_vectors")).alias("w")
    ).first().w
    fresh = ivf_drift_stats(re_assign, re_cents).agg(
        (F.sum(F.col("mean_sim") * F.col("n_vectors")) / F.sum("n_vectors")).alias("w")
    ).first().w
    assert fresh >= stale - 1e-9


def test_ivfpq_index_parquet_roundtrip_matches_oneshot(spark, tmp_path):
    """ivfpq_index frames written to parquet and read back produce
    bit-identical top-k to the one-shot ivfpq_topk (doubles round-trip
    parquet exactly; training is deterministic)."""
    emb = spark.read.parquet(os.path.join(SF, "embeddings.parquet"))
    queries = emb.filter("vec_id < 5")
    one_shot = sorted(map(tuple, ivfpq_topk(
        emb, queries, k=5, n_cells=8, n_probe=4, n_codes=16, refine=4
    ).collect()))

    assignments, centroids, codebooks = ivfpq_index(
        emb, n_cells=8, n_codes=16
    )
    for name, df in [("a", assignments), ("c", centroids), ("b", codebooks)]:
        df.write.parquet(str(tmp_path / name))
    a2 = spark.read.parquet(str(tmp_path / "a"))
    c2 = spark.read.parquet(str(tmp_path / "c"))
    b2 = spark.read.parquet(str(tmp_path / "b"))
    stored = sorted(map(tuple, ivfpq_topk_indexed(
        a2, c2, b2, queries, k=5, n_probe=4, refine=4
    ).collect()))
    assert stored == one_shot


def test_ivfpq_index_empty_corpus_typed(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    a, c, b = ivfpq_index(empty)
    assert a.count() == 0 and c.count() == 0 and b.count() == 0
    assert a.columns == ["vec_id", "unit_vec", "cell", "codes"]
    out = ivfpq_topk_indexed(a, c, b, empty)
    assert out.count() == 0
    assert out.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_ivf_index_append_requires_quantizer(spark):
    empty_cents = spark.createDataFrame([], "cell int, centroid array<double>")
    vecs = spark.createDataFrame([(1, [1.0, 0.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        ivf_index_append(vecs, empty_cents)
