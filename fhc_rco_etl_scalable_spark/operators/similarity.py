"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k — broadcast the (small)
  query set against the corpus, one shuffle for the per-query top-k
  window. The correctness baseline.
- ``lsh_topk``: random-hyperplane LSH — deterministic seeded planes,
  sign-bit bucket, candidates share a bucket (multi-probe over bit
  flips), exact re-rank inside buckets. The scale path: bucket join
  replaces the full cross product, so corpus x queries never
  materializes.

At 100 TB the corpus side stays partitioned; only signatures shuffle.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two equal-length double arrays (native
    zip_with/aggregate — no UDF)."""
    dot = F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda s, v: s + v * v))
    return dot / (na * nb)


def dot(a: Column, b: Column) -> Column:
    """Dot product of two equal-length double arrays."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _as_double(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def _unit(c: Column) -> Column:
    """Cast to double and scale to unit L2 norm — done ONCE per row so
    every pairwise cosine downstream is a bare dot product instead of
    re-deriving both norms per pair (a 3x expression saving that
    multiplies by the pair count, not the row count).

    Evaluation shape (r15, guide §1.2 per-task work): the obvious
    ``transform(d, x -> x / n)`` re-evaluates the whole norm AGGREGATE
    once per ELEMENT — higher-order lambdas get no subexpression
    elimination, so normalizing is O(dim^2) per row (~380x waste at
    dim 768). ``array_repeat`` evaluates its element expression ONCE
    and fills; zipping against it keeps the norm O(dim) per row while
    the arithmetic stays bit-identical (same ``x / n`` with the same
    ``n`` — verified element-exact on the sf0.1 corpus, and the whole
    ANN family stays oracle-green)."""
    d = _as_double(c)
    n = F.sqrt(F.aggregate(d, F.lit(0.0), lambda s, v: s + v * v))
    return F.zip_with(d, F.array_repeat(n, F.size(c)), lambda x, nn: x / nn)


# Candidate slack for the blocked-BLAS kernels: dgemm's pairwise
# summation and the native sequential fold differ by O(dim * eps) ~
# 1e-14 on unit vectors, so candidates are generated at (threshold -
# _BLAS_EPS) and every survivor is re-verified with the NATIVE dot
# expression — the engine-exact comparison the oracles certify.
_BLAS_EPS = 1e-9


def _blas_candidate_pairs(
    base: DataFrame,
    threshold: float,
    group_col: str | None = None,
    block_rows: int = 8192,
    strip_rows: int = 512,
    mask_col: str | None = None,
) -> DataFrame:
    """All unordered id pairs whose BLAS cosine clears ``threshold``,
    without ever materializing the O(n^2) pair frame through the JVM.

    ``base`` is a (__id, __v) frame of UNIT vectors (plus ``group_col``
    when pairs are restricted to rows sharing a group, e.g. an IVF
    cell). Rows hash into ~``block_rows``-sized blocks; each block PAIR
    (i <= j) becomes one ``applyInPandas`` group whose kernel runs one
    numpy matmul per ``strip_rows`` strip (bounds the score matrix to
    strip_rows x block_rows doubles) and emits only the surviving
    (id_a < id_b) pairs. Data movement is n x n_blocks rows — the
    quadratic work stays inside dgemm at memory bandwidth instead of
    surfacing as 10^10 codegen'd rows (measured 20x+ at 200k vectors).

    Callers re-verify survivors with the native ``dot`` at the exact
    threshold; this function's comparison runs at the caller's
    (already slack-adjusted) threshold, so it must only be inclusive.

    ``mask_col`` (r16): an int64 bitmask per row; a scoring pair also
    requires ``mask_a & mask_b != 0``. This is how dense multi-cell
    co-assignment (semantic_dedup's certification config, every row in
    several cells) runs as ONE global blocked pass instead of one pass
    per cell over near-identical memberships — same candidate set as
    the per-cell route + distinct, k_assign x fewer dgemm FLOPs and
    shipped rows when co-assignment is dense.
    """
    import math as _math

    id_t = base.schema["__id"].dataType.simpleString()
    if group_col is None:
        n = base.count()
    else:
        # blocks must cover the LARGEST group: sizing off the total
        # exploded row count would over-split small groups and ship
        # every row once per (oversized) block count.
        n = (
            base.groupBy(group_col).count().agg(F.max("count")).collect()[0][0]
            or 0
        )
    if n == 0:
        schema = f"id_a {id_t}, id_b {id_t}"
        return base.sparkSession.createDataFrame([], schema)
    nb = max(1, _math.ceil(n / block_rows))
    rows = base.withColumn(
        "__blk", F.pmod(F.xxhash64(F.col("__id")), F.lit(nb)).cast("int")
    )
    # a-side of pair (i, j): block i rows, for every j >= i; b-side:
    # block j rows for every i < j (the diagonal pair takes its rows
    # from the a-side only, so no row ships twice to it).
    extra = [c for c in (group_col, mask_col) if c]
    a = rows.withColumn(
        "__bj", F.explode(F.sequence(F.col("__blk"), F.lit(nb - 1)))
    ).select(
        F.col("__blk").alias("__bi"), "__bj", "__id", "__v",
        F.lit(0).alias("__side"), *extra
    )
    b = rows.withColumn(
        "__bi",
        F.explode(
            F.when(F.col("__blk") > 0, F.sequence(F.lit(0), F.col("__blk") - 1))
        ),
    ).select(
        "__bi", F.col("__blk").alias("__bj"), "__id", "__v",
        F.lit(1).alias("__side"), *extra
    )
    both = a.unionByName(b)
    keys = ([group_col] if group_col else []) + ["__bi", "__bj"]

    def kern(key, pdf):
        diag = key[-2] == key[-1]
        asub = pdf[pdf["__side"] == 0]
        ids_a = asub["__id"].to_numpy()
        if len(ids_a) == 0:
            return pd.DataFrame({"id_a": ids_a, "id_b": ids_a})
        ma = np.asarray(asub["__v"].tolist(), dtype=np.float64)
        msk_a = (
            asub[mask_col].to_numpy().astype(np.int64) if mask_col else None
        )
        if diag:
            order = np.argsort(ids_a)
            ids_a, ma = ids_a[order], ma[order]
            ids_b, mb = ids_a, ma
            if mask_col:
                msk_a = msk_a[order]
            msk_b = msk_a
        else:
            bsub = pdf[pdf["__side"] == 1]
            ids_b = bsub["__id"].to_numpy()
            if len(ids_b) == 0:
                return pd.DataFrame({"id_a": ids_b, "id_b": ids_b})
            mb = np.asarray(bsub["__v"].tolist(), dtype=np.float64)
            msk_b = (
                bsub[mask_col].to_numpy().astype(np.int64) if mask_col else None
            )
        out_a, out_b = [], []
        for s in range(0, len(ids_a), strip_rows):
            sc = ma[s : s + strip_rows] @ mb.T
            ia, ib = np.where(sc >= threshold)
            if mask_col:
                shared = (msk_a[ia + s] & msk_b[ib]) != 0
                ia, ib = ia[shared], ib[shared]
            if diag:
                # id-sorted rows: strict upper triangle == id_a < id_b
                keep = (ia + s) < ib
                ia, ib = ia[keep], ib[keep]
                out_a.append(ids_a[ia + s])
                out_b.append(ids_b[ib])
            else:
                x, y = ids_a[ia + s], ids_b[ib]
                out_a.append(np.minimum(x, y))
                out_b.append(np.maximum(x, y))
        return pd.DataFrame(
            {"id_a": np.concatenate(out_a), "id_b": np.concatenate(out_b)}
        )

    return both.groupBy(*keys).applyInPandas(kern, f"id_a {id_t}, id_b {id_t}")


def _empty_topk_result(corpus: DataFrame, id_col: str) -> DataFrame:
    """Empty (query_id, neighbor_id, cos_sim, rank) frame whose id
    columns carry the CALLER's id dtype, so schema does not depend on
    whether the corpus happened to be empty."""
    from pyspark.sql.types import DoubleType, IntegerType, StructField, StructType

    id_type = corpus.schema[id_col].dataType
    return corpus.sparkSession.createDataFrame(
        [],
        StructType(
            [
                StructField("query_id", id_type),
                StructField("neighbor_id", id_type),
                StructField("cos_sim", DoubleType()),
                StructField("rank", IntegerType()),
            ]
        ),
    )


# ---------------------------------------------------------------------------
# Local-top-k candidate kernels (r16, guide §4.2 + §8): every top-k
# query path used to evaluate the NATIVE dot — an interpreted
# ZipWith/ArrayAggregate pair that gets no codegen, measured ~70 µs per
# pair — once per (corpus row x probed query), then window-rank the
# full candidate frame. The kernels below decide with small rows
# instead: one numpy dgemm per Arrow batch scores the batch against
# every query, and only rows that could still reach the global native
# top-k — each query's per-batch top-k by approx score, plus everything
# within _APPROX_EPS of the k-th — leave Python, carrying their unit
# vectors. The NATIVE dot then re-scores this provable superset
# (k + boundary ties per query per batch, not |corpus| rows), so the
# emitted cos_sim values, the ordering, and every tie-break stay
# engine-exact — the _blas_candidate_pairs discipline applied to top-k.
#
# Soundness of the local cut: a row in the global native top-k is
# beaten natively by at most k-1 rows, hence by at most k-1 rows of its
# own batch; numpy and the native fold agree to O(dim*eps) ~ 1e-13 on
# unit vectors, so its numpy score is >= (batch k-th numpy score) -
# _APPROX_EPS. NaN scores (zero-norm degenerate vectors) are mapped to
# +inf because Spark sorts NaN above every double in DESC order — such
# rows stay in the superset and the native window ranks them exactly
# as before.
_APPROX_EPS = 1e-9


def _collect_unit_queries(queries: DataFrame, id_col: str, vec_col: str):
    """Driver-side (id, unit vector) arrays of the query set — a
    bounded collect under the same contract by which the query side
    broadcasts everywhere in this module. The vectors are the NATIVE
    ``_unit`` values, so every numpy decision starts from the exact
    doubles the engine-side re-scoring uses (probe selection stays
    bit-identical to the previous Arrow-UDF form, which also ran numpy
    over the native unit vectors).

    Also returns ``q_native`` — the (query_id, __qv) frame REBUILT from
    the collected rows (collected doubles round-trip exactly), so the
    final native re-rank broadcasts 10-ish local rows instead of
    re-scanning and re-normalizing the queries subtree as a second
    Spark job per call."""
    qid_type = queries.schema[id_col].dataType.simpleString()
    rows = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    ).collect()
    if not rows:
        return None, None, None
    q_ids = np.asarray([r["query_id"] for r in rows])
    qmat = np.asarray([r["__qv"] for r in rows], dtype=np.float64)
    q_native = queries.sparkSession.createDataFrame(
        [(r["query_id"], list(r["__qv"])) for r in rows],
        f"query_id {qid_type}, __qv array<double>",
    )
    return q_ids, qmat, q_native


def _local_topk_mask(scores: np.ndarray, k: int) -> np.ndarray:
    """Boolean keep-mask over a (batch x queries) score matrix: per
    query, everything within _APPROX_EPS of the k-th largest score
    (excluded entries are -inf and never kept)."""
    nb = scores.shape[0]
    t = min(k, nb)
    kth = np.partition(scores, nb - t, axis=0)[nb - t, :]
    keep = scores >= (kth - _APPROX_EPS)[None, :]
    keep &= scores > -np.inf
    return keep


def _probe_lut(cents: np.ndarray, qmat: np.ndarray, n_probe: int) -> np.ndarray:
    """(n_cells x n_queries) bool membership mask of each query's
    ``n_probe`` nearest cells — the same ``argsort(-(q @ cents.T))``
    the per-query probe UDFs ran, evaluated once driver-side."""
    n_probe_eff = min(n_probe, len(cents))
    probe = np.argsort(-(qmat @ cents.T), axis=1)[:, :n_probe_eff]
    nq = len(qmat)
    lut = np.zeros((len(cents), nq), dtype=bool)
    lut[probe.ravel(), np.repeat(np.arange(nq), n_probe_eff)] = True
    return lut


def _spread_if_narrow(df: DataFrame) -> DataFrame:
    """Repartition a kernel input only when it arrives with fewer
    partitions than cores (single-file stored index, tiny upstream):
    frames built by ivf_index/_pq_encode are already spread, and an
    unconditional repartition added a measurable exchange + a second
    Arrow ship of the vectors at sf0.1."""
    sc = df.sparkSession.sparkContext
    if df.rdd.getNumPartitions() < sc.defaultParallelism:
        from .skew import spread

        return spread(df)
    return df


def _use_topk_kernel(assignments: DataFrame) -> bool:
    """Size-adaptive path choice for the INDEXED query paths: the
    local-top-k kernel pays a fixed ~0.5 s Arrow pass (worker
    round-trip + vector re-ship), while the join-shaped form's cost
    grows with |candidates| (interpreted dot ~3.5 us/pair + the
    full-candidate window, plus the ADC Arrow pass on the PQ path).
    Interleaved min-of-3 A/B (r16): at a 0.8 MB / 2k-row index the
    join form wins by ~0.4 s; at 5.2 MB / 20k rows the kernel wins by
    ~1 s and keeps winning as the index grows (it touches each
    assignment row exactly once). The optimizer's sizeInBytes estimate
    of the assignment frame picks the side; parameterized via
    SPARK_GRAFT_ANN_KERNEL_MIN_BYTES (default 2 MiB, between the two
    measured operating points), and an unavailable estimate assumes
    BIG — the scale-safe default.

    Both paths are result-identical and both stay oracle-certified:
    the small fixtures (sf0.001/sf0.01/sf0.1) exercise the join form,
    the sf1eq sweep the kernel form, and pytest pins kernel == join
    == brute on the same corpus."""
    import os

    threshold = int(
        os.environ.get("SPARK_GRAFT_ANN_KERNEL_MIN_BYTES", str(2 * 1024 * 1024))
    )
    try:
        est = int(
            assignments._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:
        return True
    return est >= threshold


def _topk_candidate_kernel(
    q_ids: np.ndarray,
    qmat: np.ndarray,
    k: int,
    qid_type: str,
    nid_type: str,
    cell_lut: "np.ndarray | None" = None,
    assign_cents: "np.ndarray | None" = None,
    pq: "tuple | None" = None,
):
    """Build the mapInPandas function + schema for local-top-k
    candidate generation over a (__id, unit_vec[, cell[, codes]])
    corpus frame.

    - ``cell_lut``: restrict candidates to rows whose cell is probed by
      the query (IVF routing; rows with out-of-range cells match no
      probe, exactly like the old cell equi-join).
    - ``assign_cents``: compute the cell in-kernel via the same
      ``argmax(v @ cents.T)`` the assignment UDF ran (one-shot IVF —
      fuses away a whole Arrow pass).
    - ``pq``: (cents, books) — additionally evaluate the ADC dot for
      every candidate through the classic per-query lookup tables and
      keep each query's ADC top-k too; emit kind=1 rows carrying the
      per-(batch, query) candidate COUNT so the caller can prove the
      refine filter vacuous (see _pq_query).
    """
    nq = len(q_ids)
    if pq is not None:
        pq_cents, pq_books = pq
        base_lut = pq_cents @ qmat.T  # (n_cells, nq)
        sub = pq_books[0].shape[1]
        code_luts = [
            b @ qmat[:, j * sub : (j + 1) * sub].T for j, b in enumerate(pq_books)
        ]  # each (n_codes, nq)
        schema = (
            f"query_id {qid_type}, neighbor_id {nid_type}, "
            "unit_vec array<double>, kind int, n long"
        )
    else:
        schema = f"query_id {qid_type}, neighbor_id {nid_type}, unit_vec array<double>"

    def gen(batches):
        for pdf in batches:
            ids = pdf["__id"].to_numpy()
            nb = len(ids)
            if nb == 0:
                continue
            cv = np.asarray(pdf["unit_vec"].tolist(), dtype=np.float64)
            sc = cv @ qmat.T  # (nb, nq)
            sc[np.isnan(sc)] = np.inf  # NaN ranks first under DESC in Spark
            if assign_cents is not None:
                cells = np.argmax(cv @ assign_cents.T, axis=1)
            elif "cell" in pdf.columns:
                cells = pdf["cell"].to_numpy()
            else:
                cells = None
            if cell_lut is not None:
                ok = (cells >= 0) & (cells < cell_lut.shape[0])
                allowed = np.zeros((nb, nq), dtype=bool)
                allowed[ok] = cell_lut[cells[ok]]
            else:
                allowed = np.ones((nb, nq), dtype=bool)
            allowed &= ids[:, None] != q_ids[None, :]
            keep = _local_topk_mask(np.where(allowed, sc, -np.inf), k)
            if pq is not None:
                adc = base_lut[cells] if cells is not None else np.zeros_like(sc)
                codes = np.asarray(pdf["codes"].tolist(), dtype=np.int64)
                for j, lut in enumerate(code_luts):
                    adc = adc + lut[codes[:, j]]
                adc = np.where(allowed, adc, -np.inf)
                adc[np.isnan(adc)] = np.inf
                keep |= _local_topk_mask(adc, k)
            bi, qi = np.nonzero(keep)
            out = pd.DataFrame(
                {
                    "query_id": q_ids[qi],
                    "neighbor_id": ids[bi],
                    "unit_vec": pdf["unit_vec"].iloc[bi].to_numpy(),
                }
            )
            if pq is not None:
                out["kind"] = np.int32(0)
                out["n"] = np.int64(0)
                cnt = pd.DataFrame(
                    {
                        "query_id": q_ids,
                        "neighbor_id": np.repeat(ids[:1], nq),
                        "unit_vec": [None] * nq,
                        "kind": np.int32(1),
                        "n": allowed.sum(axis=0).astype(np.int64),
                    }
                )
                out = pd.concat([out, cnt], ignore_index=True)
            yield out

    return gen, schema


def _exact_rerank(survivors: DataFrame, q_native: DataFrame, k: int) -> DataFrame:
    """Final native top-k over a kernel's candidate superset: attach
    the NATIVE unit query vector (broadcast — tiny by contract), score
    with the NATIVE dot, and window-rank with the same
    (cos_sim DESC, neighbor_id) order every pre-kernel formulation
    used. Identical emitted values and tie-breaks; only the row count
    entering the interpreted dot and the window changed."""
    cand = survivors.join(F.broadcast(q_native), "query_id")
    cand = cand.withColumn("cos_sim", dot(F.col("__qv"), F.col("unit_vec")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k neighbors per query (excluding self-matches by id).
    Returns (query_id, neighbor_id, cos_sim, rank).

    Deliberately kept as the all-JVM crossJoin + window form (r16
    measured the local-top-k kernel ALTERNATIVE slower here at both
    sf0.1 and sf1eq: the interpreted dot costs ~3.5 us/pair at dim 64,
    so the kernel's fixed Arrow pass only amortizes past ~10^6
    candidate pairs — brute force is the small-corpus correctness
    baseline, and past that size the ANN paths are the contract)."""
    from .skew import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("__cv")
    )
    # corpus stays partitioned; the query set broadcasts.
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn("cos_sim", dot(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _hyperplanes(dim: int, n_planes: int, seed: str = "spark-graft") -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes from md5 bits (no
    RNG state, reproducible across runs/engines)."""
    planes = []
    for p in range(n_planes):
        vals = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).hexdigest()
            u = int(h[:8], 16) / 0xFFFFFFFF
            vals.append(2.0 * u - 1.0)
        norm = math.sqrt(sum(v * v for v in vals)) or 1.0
        planes.append([v / norm for v in vals])
    return planes


def _signature_udf(tables: list[list[list[float]]], probe_bits: int = 0):
    """Vectorized sign-bit signatures for ALL tables in one Arrow batch:
    (batch x dim) @ (dim x tables*planes) numpy matmul, then bit-pack.
    Dense linear algebra is the one place a Pandas UDF beats nested
    zip_with/aggregate expressions (which also fall out of codegen at
    32 nested folds).

    ``probe_bits = d`` emits, per table, the signature PLUS every flip
    of up to ``d`` plane bits (multi-probe to hamming depth d; d ==
    n_planes enumerates all 2^n_planes buckets, i.e. probe-all) — in
    numpy, because the equivalent transform/bitwiseXOR expression tree
    made query compilation the dominant cost of the whole LSH search
    at test scale."""
    from itertools import combinations

    from pyspark.sql.functions import pandas_udf

    n_tables = len(tables)
    n_planes = len(tables[0])
    # table tag rides at bit 16+, so plane bits must fit below it.
    assert n_planes <= 16, f"n_planes={n_planes} collides with table tag bits"
    mat = np.array([p for t in tables for p in t], dtype=np.float64).T  # dim x (T*k)
    masks = [0]
    for depth in range(1, min(probe_bits, n_planes) + 1):
        masks += [
            sum(1 << i for i in combo)
            for combo in combinations(range(n_planes), depth)
        ]

    @pandas_udf("array<long>")
    def sigs(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)  # batch x dim
        bits = (v @ mat) > 0  # batch x (T*k)
        out = []
        weights = np.array([1 << i for i in range(n_planes)], dtype=np.int64)
        for t in range(n_tables):
            chunk = bits[:, t * n_planes : (t + 1) * n_planes]
            base = chunk @ weights + (t << 16)
            for m in masks:  # tag bits (>=16) never flip
                out.append(base ^ m)
        arr = np.stack(out, axis=1)  # batch x (T * len(masks))
        return pd.Series(list(arr))

    return sigs


def embedding_near_dups(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.4,
    method: str = "exact",
    n_planes: int = 8,
    n_tables: int = 16,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: every (id_a < id_b) with
    ``cosine >= threshold``. Returns (id_a, id_b, cos_sim).

    ``method="exact"`` — upper-triangle comparison. The correctness
    baseline, and the right choice when one side broadcasts or the
    threshold is low (low thresholds make LSH buckets huge, so the
    bucket join degenerates toward the cross product anyway).

    ``method="lsh"`` — multi-table sign-bit buckets generate candidate
    pairs, exact cosine verifies. The 100 TB path for true near-dup
    thresholds (cos >= ~0.8): per-plane agreement p = 1 - theta/pi is
    high, so few planes isolate tiny buckets and the equi bucket join
    replaces the O(n^2) cross product; signatures (one numpy matmul
    per Arrow batch) are the only thing that shuffles besides the
    surviving candidates. Precision is exact for both methods because
    every candidate is verified; lsh recall is 1-(1-p^planes)^tables
    (property-tested on planted near-dups in test_extensions).
    """
    from .skew import spread

    base = spread(df, id_col).select(
        F.col(id_col).alias("__id"), _unit(F.col(vec_col)).alias("__v")
    )
    if method == "exact":
        # Blocked-BLAS candidate generation (slack threshold), then the
        # surviving pairs — a vanishing fraction of the upper triangle —
        # re-attach vectors and go through the NATIVE dot at the exact
        # threshold below, so emitted cos_sim values and the boundary
        # comparison are bit-identical to the pre-kernel theta-join
        # formulation the oracles certified. The theta-join evaluated
        # the codegen'd dot n^2/2 times (~100 s at 200k vectors); the
        # kernel keeps the same FLOPs inside dgemm (~5 s).
        cand = _blas_candidate_pairs(base, threshold - _BLAS_EPS)
        a = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
        b = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
        pairs = cand.join(a, "id_a").join(b, "id_b")
    elif method == "lsh":
        tables = [
            _hyperplanes(dim, n_planes, seed=f"spark-graft-nd{t}")
            for t in range(n_tables)
        ]
        sig = base.withColumn(
            "__bucket", F.explode(_signature_udf(tables)(F.col("__v")))
        )
        a = sig.select(
            F.col("__id").alias("id_a"),
            F.col("__v").alias("__va"),
            F.col("__bucket").alias("__ba"),
        )
        b = sig.select(
            F.col("__id").alias("id_b"),
            F.col("__v").alias("__vb"),
            F.col("__bucket").alias("__bb"),
        )
        pairs = a.join(
            b, (F.col("__ba") == F.col("__bb")) & (F.col("id_a") < F.col("id_b"))
        ).dropDuplicates(["id_a", "id_b"])
    else:
        raise ValueError(f"unknown method {method!r}")
    return (
        pairs.withColumn("cos_sim", dot(F.col("__va"), F.col("__vb")))
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", F.round("cos_sim", 6).alias("cos_sim"))
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    multiprobe_bits: int = 1,
) -> DataFrame:
    """Approximate top-k: standard multi-table random-hyperplane LSH —
    ``n_tables`` independent tables of ``n_planes`` sign bits each; a
    corpus vector is a candidate when it shares ANY table's bucket with
    the query (probes up to ``multiprobe_bits`` bit flips included),
    then exact cosine re-ranks.

    Recall ≈ 1-(1-p^k)^T for per-plane agreement p — tunable without
    touching the data layout. Property-tested against the brute-force
    baseline. ``multiprobe_bits == n_planes`` probes every bucket of
    every table (probe-all), which is deterministically exact — equal
    to ``brute_force_topk`` — at cross-product cost; used as the
    oracle-checkable configuration.
    """
    tables = [
        _hyperplanes(dim, n_planes, seed=f"spark-graft-t{t}") for t in range(n_tables)
    ]
    sig_udf = _signature_udf(tables)
    probe_udf = _signature_udf(tables, probe_bits=multiprobe_bits)

    from .skew import spread

    # sign-bit buckets are invariant to positive scaling, so bucketing
    # the unit vectors is identical to bucketing the raw ones.
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("__cv")
    ).withColumn("__bucket", F.explode(sig_udf(F.col("__cv"))))

    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    ).withColumn("__bucket", F.explode(probe_udf(F.col("__qv"))))

    cand = c.join(F.broadcast(q), "__bucket").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cand = cand.dropDuplicates(["query_id", "neighbor_id"]).withColumn(
        "cos_sim", dot(F.col("__qv"), F.col("__cv"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), F.col("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank")
    )


def _unit_sample(
    corpus: DataFrame, id_col: str, vec_col: str, sample_size: int
) -> "np.ndarray | None":
    """Deterministic id-ordered unit-vector training sample, collected
    driver-side. Returns None on an empty corpus.

    The ``_unit`` projection is applied AFTER the order-by + limit
    (r16): projecting before the sort evaluated the O(dim) interpreted
    normalization over EVERY corpus row inside TakeOrdered just to
    keep ``sample_size`` of them; selecting the raw vector first and
    normalizing the surviving rows computes the identical doubles
    (per-row expression over the same rows — the sample is decided by
    ``id_col`` alone)."""
    sample_rows = (
        corpus.select(F.col(id_col).alias("sid"), F.col(vec_col).alias("__raw"))
        .orderBy("sid")
        .limit(sample_size)
        .select(_unit(F.col("__raw")).alias("uv"))
        .collect()
    )
    if not sample_rows:
        return None
    return np.asarray([r.uv for r in sample_rows], dtype=np.float64)


def _kmeans_centroids(
    sample: np.ndarray, n_cells: int, iters: int = 10
) -> np.ndarray:
    """Deterministic Lloyd iterations on a fixed, id-ordered sample.
    No RNG: init = the first ``n_cells`` sample vectors, ties in
    assignment break to the lower cell index. Centroids re-normalized
    per iteration so cell assignment is by cosine (max dot on unit
    vectors)."""
    c = sample[:n_cells].copy()
    c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    for _ in range(iters):
        assign = np.argmax(sample @ c.T, axis=1)
        for j in range(n_cells):
            members = sample[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
        c /= np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
    return c


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    sample_size: int = 512,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: a coarse k-means
    quantizer partitions the corpus into ``n_cells`` cells; each query
    probes its ``n_probe`` nearest cells and exact cosine re-ranks the
    candidates. The classic ANN scale path alongside ``lsh_topk``:
    the corpus shuffles ONCE on cell id, queries broadcast, and the
    per-query candidate set is |corpus| * n_probe / n_cells instead of
    |corpus|.

    Centroids are trained driver-side on a deterministic id-ordered
    sample (k-means over <=``sample_size`` vectors is microscopic next
    to the corpus scan; at 100 TB you train on the same sample and
    broadcast the matrix — the quantizer is data, not data-scale).
    ``n_probe == n_cells`` degenerates to exhaustive search and must
    match ``brute_force_topk`` exactly (asserted in pytest).

    r16 shape: cell assignment, probe routing and candidate scoring
    fused into ONE Arrow pass over the corpus (the local-top-k kernel
    above — assignment is the same ``argmax(v @ cents.T)``, routing
    the same argsort probe list, both bit-identical to the previous
    per-stage UDFs); only each query's per-batch top-k superset leaves
    Python for the native re-rank. The pre-r16 plan shipped the
    corpus through an assignment UDF, a cell equi-join, |corpus| x
    n_probed interpreted dot products, and a full-candidate window.
    """
    from .skew import spread

    sample = _unit_sample(corpus, id_col, vec_col, sample_size)
    if sample is None:
        # empty corpus: return an empty, correctly-typed result instead
        # of crashing in the quantizer (np.linalg.norm axis error on a
        # 0-d sample) — matching brute_force_topk/lsh_topk's behavior.
        # The id dtype mirrors the caller's column, not a hardcoded long.
        return _empty_topk_result(corpus, id_col)
    cents = _kmeans_centroids(sample, min(n_cells, len(sample)))
    q_ids, qmat, q_native = _collect_unit_queries(queries, id_col, vec_col)
    if q_ids is None:
        return _empty_topk_result(corpus, id_col)
    kern, schema = _topk_candidate_kernel(
        q_ids,
        qmat,
        k,
        queries.schema[id_col].dataType.simpleString(),
        corpus.schema[id_col].dataType.simpleString(),
        cell_lut=_probe_lut(cents, qmat, n_probe),
        assign_cents=cents,
    )
    src = spread(corpus, id_col).select(
        F.col(id_col).alias("__id"), _unit(F.col(vec_col)).alias("unit_vec")
    )
    return _exact_rerank(src.mapInPandas(kern, schema), q_native, k)


def ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 512,
) -> tuple[DataFrame, DataFrame]:
    """Build the PERSISTABLE IVF index for a corpus — train the coarse
    quantizer and assign every vector ONCE, so queries never touch the
    raw corpus again (the 100 TB production shape; :func:`ivf_topk`
    retrains+reassigns per call, right for one-shot jobs, wasteful for
    a standing search service).

    Returns ``(assignments, centroids)``: ``assignments`` is one row
    per corpus vector — (id_col, cell int, unit_vec array<double>, the
    pre-normalized vector so query-time cosine is a bare dot) — and
    ``centroids`` is (cell int, centroid array<double>), ``n_cells``
    rows. Write both to tables (partition/bucket assignments by
    ``cell`` so a probe reads only its cells); re-read and hand to
    :func:`ivf_topk_indexed`. Training is the same deterministic
    Lloyd quantizer as ``ivf_topk`` (id-ordered sample, no RNG), so
    an index built from the same corpus reproduces bit-identically.
    """
    from pyspark.sql.functions import pandas_udf

    from .skew import spread

    sample = _unit_sample(corpus, id_col, vec_col, sample_size)
    if sample is None:
        # empty-input contract matches ivf_topk (ADVICE r14): empty,
        # correctly-typed frames, not a raise — an empty partition of a
        # larger build job should produce an empty index shard.
        assignments = corpus.select(
            F.col(id_col),
            _unit(F.col(vec_col)).alias("unit_vec"),
            F.lit(0).alias("cell"),
        ).limit(0)
        centroids = corpus.sparkSession.createDataFrame(
            [], "cell int, centroid array<double>"
        )
        return assignments, centroids
    cents = _kmeans_centroids(sample, min(n_cells, len(sample)))

    @pandas_udf("int")
    def assign_cell(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(v @ cents.T, axis=1).astype(np.int32))

    assignments = spread(corpus, id_col).select(
        F.col(id_col),
        _unit(F.col(vec_col)).alias("unit_vec"),
    ).withColumn("cell", assign_cell(F.col("unit_vec")))
    spark = corpus.sparkSession
    centroids = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    return assignments, centroids


def ivf_index_append(
    new_vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign NEW vectors under an EXISTING quantizer (VERDICT r14 #5
    — index maintenance for a growing corpus): returns
    :func:`ivf_index`-shaped assignment rows (id_col, unit_vec, cell)
    ready to append to the assignments table. No retrain, no touch of
    the already-indexed corpus — the steady-state ingest op; pair with
    :func:`ivf_drift_stats` to decide when accumulated appends have
    drifted far enough from the trained quantizer to justify a rebuild
    (which is just :func:`ivf_index` over the full corpus again).

    Deterministic: appending batches B1..Bn to an index built from B0
    assigns each vector exactly as a fresh ``ivf_index`` over
    B0∪..∪Bn would, PROVIDED the quantizer is the same — drift is
    about recall quality (vectors landing in cells whose centroid no
    longer represents them), not correctness of the assignment rule.
    """
    from pyspark.sql.functions import pandas_udf

    cent_rows = sorted(centroids.collect(), key=lambda r: r.cell)
    if not cent_rows:
        raise ValueError(
            "ivf_index_append: empty centroid table — build the index "
            "with ivf_index first (appends need a trained quantizer)"
        )
    cents = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)

    @pandas_udf("int")
    def assign_cell(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        return pd.Series(np.argmax(v @ cents.T, axis=1).astype(np.int32))

    return new_vectors.select(
        F.col(id_col),
        _unit(F.col(vec_col)).alias("unit_vec"),
    ).withColumn("cell", assign_cell(F.col("unit_vec")))


def ivf_drift_stats(
    assignments: DataFrame,
    centroids: DataFrame,
) -> DataFrame:
    """Per-cell health of a (possibly append-grown) IVF index: row
    count and mean cosine of each assigned vector to its cell
    centroid. Returns (cell int, n_vectors bigint, mean_sim double).

    The retrain trigger reads off this frame: a cell whose mean_sim
    has sagged (new data no longer near the trained centroid) or
    whose n_vectors dwarfs the rest (probe cost concentrates there)
    means the quantizer no longer fits the corpus — rebuild with
    :func:`ivf_index`. One broadcast join (centroids are n_cells
    rows) + one cell-keyed aggregate; never collects the corpus.
    Both halves are pure column expressions — the dot product is
    ``F.zip_with``/``F.aggregate``, no Python in the hot path.
    """
    cent = centroids.select(
        F.col("cell"), F.col("centroid").alias("__cent")
    )
    return (
        assignments.join(F.broadcast(cent), "cell")
        .withColumn("__sim", dot(F.col("unit_vec"), F.col("__cent")))
        .groupBy("cell")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.avg("__sim"), 6).alias("mean_sim"),
        )
    )


def ivf_topk_indexed(
    assignments: DataFrame,
    centroids: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
) -> DataFrame:
    """IVF top-k against a PERSISTED index (:func:`ivf_index` rows,
    typically read back from tables): queries probe their ``n_probe``
    nearest cells and exact cosine re-ranks the candidates — identical
    result contract to :func:`ivf_topk` (``n_probe == n_cells``
    degenerates to exhaustive and equals brute force, asserted in
    pytest through a parquet round-trip), but the corpus is never
    re-scanned, re-normalized, or re-assigned.

    ``centroids`` is collected driver-side — a deliberate bounded
    collect (n_cells rows; the quantizer is data, not data-scale).
    Doubles round-trip exactly through parquet, so the stored-index
    result is bit-identical to the in-memory one.

    r16 shape, size-adaptive (see :func:`_use_topk_kernel`): above the
    size threshold, probe routing + candidate scoring run as ONE Arrow
    pass over the stored assignment rows (the local-top-k kernel above;
    cell routing reads the stored ``cell`` column through the same
    membership test the cell equi-join applies); only each query's
    per-batch top-k superset leaves Python for the native re-rank.
    Below it, the join-shaped form — whose fixed cost is lower — runs
    unchanged. Both produce identical rows.
    """
    from pyspark.sql.functions import pandas_udf

    cent_rows = sorted(centroids.collect(), key=lambda r: r.cell)
    if not cent_rows:
        # empty index (built from an empty corpus) → no neighbors, same
        # typed-empty contract as ivf_index / ivf_topk.
        return _empty_topk_result(queries, id_col)
    cents = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    if _use_topk_kernel(assignments):
        q_ids, qmat, q_native = _collect_unit_queries(queries, id_col, vec_col)
        if q_ids is None:
            return _empty_topk_result(queries, id_col)
        kern, schema = _topk_candidate_kernel(
            q_ids,
            qmat,
            k,
            queries.schema[id_col].dataType.simpleString(),
            assignments.schema[id_col].dataType.simpleString(),
            cell_lut=_probe_lut(cents, qmat, n_probe),
        )
        src = _spread_if_narrow(
            assignments.select(
                F.col(id_col).alias("__id"), F.col("unit_vec"), F.col("cell")
            )
        )
        return _exact_rerank(src.mapInPandas(kern, schema), q_native, k)
    n_probe_eff = min(n_probe, len(cents))

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        order = np.argsort(-(v @ cents.T), axis=1)[:, :n_probe_eff].astype(np.int32)
        return pd.Series(list(order))

    c = assignments.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("unit_vec").alias("__cv"),
        F.col("cell").alias("__cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    ).withColumn("__cell", F.explode(probe_cells(F.col("__qv"))))
    cand = c.join(F.broadcast(q), "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cand = cand.withColumn("cos_sim", dot(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


def l2_dist(a: Column, b: Column) -> Column:
    """Euclidean distance of two equal-length double arrays."""
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda s, v: s + v,
        )
    )


def brute_force_topk_l2(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k by EUCLIDEAN distance (the metric when embeddings
    are not normalized and magnitude carries signal). Same plan shape
    as the cosine baseline: corpus partitioned, queries broadcast,
    per-query top-k via window rank. Returns
    (query_id, neighbor_id, l2, rank)."""
    from .skew import spread

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("__qv")
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("__cv")
    )
    scored = c.crossJoin(F.broadcast(q)).filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    scored = scored.withColumn("l2", l2_dist(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(F.col("l2").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("l2", 6).alias("l2"), "rank")
    )


def _kmeans_l2(sample: np.ndarray, n_codes: int, iters: int = 10) -> np.ndarray:
    """Deterministic Lloyd iterations under EUCLIDEAN distance (PQ
    codebooks quantize residual subvectors, where magnitude carries
    signal — no re-normalization, unlike the cosine coarse quantizer).
    Init = first ``n_codes`` sample rows; empty cells keep their
    previous centroid."""
    c = sample[:n_codes].copy()
    for _ in range(iters):
        d2 = ((sample[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        for j in range(len(c)):
            members = sample[assign == j]
            if len(members):
                c[j] = members.mean(axis=0)
    return c


def _pq_train(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_cells: int,
    m_subvectors: int,
    n_codes: int,
    sample_size: int,
):
    """Driver-side IVF-PQ training shared by the one-shot and
    persisted-index paths: deterministic id-ordered sample, cosine
    coarse quantizer, per-subvector L2 codebooks on the residuals.
    Returns ``(cents, books)`` numpy arrays, or ``None`` on an empty
    corpus."""
    sample = _unit_sample(corpus, id_col, vec_col, sample_size)
    if sample is None:
        return None
    dim = sample.shape[1]
    if dim % m_subvectors:
        raise ValueError(f"dim {dim} not divisible by m_subvectors {m_subvectors}")
    sub = dim // m_subvectors
    cents = _kmeans_centroids(sample, min(n_cells, len(sample)))
    resid = sample - cents[np.argmax(sample @ cents.T, axis=1)]
    books = [
        _kmeans_l2(resid[:, j * sub : (j + 1) * sub], min(n_codes, len(resid)))
        for j in range(m_subvectors)
    ]
    return cents, books


def _pq_encode(
    corpus: DataFrame,
    cents: "np.ndarray",
    books: list,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Encode every corpus vector under a trained quantizer: one Arrow
    pass emitting (id, unit_vec, cell, codes) assignment rows."""
    from pyspark.sql.functions import pandas_udf

    from .skew import spread

    m_subvectors = len(books)
    sub = books[0].shape[1]

    @pandas_udf("struct<cell:int, codes:array<int>>")
    def encode(vecs: pd.Series) -> pd.DataFrame:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        cell = np.argmax(v @ cents.T, axis=1)
        r = v - cents[cell]
        codes = np.empty((len(v), m_subvectors), dtype=np.int32)
        for j in range(m_subvectors):
            block = r[:, j * sub : (j + 1) * sub]
            d2 = ((block[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = np.argmin(d2, axis=1)
        return pd.DataFrame({"cell": cell.astype(np.int32), "codes": list(codes)})

    return (
        spread(corpus, id_col)
        .select(F.col(id_col), _unit(F.col(vec_col)).alias("unit_vec"))
        .withColumn("__enc", encode(F.col("unit_vec")))
        .select(
            id_col,
            "unit_vec",
            F.col("__enc.cell").alias("cell"),
            F.col("__enc.codes").alias("codes"),
        )
    )


def _pq_query(
    assignments: DataFrame,
    cents: "np.ndarray",
    books: list,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
    refine: int,
) -> DataFrame:
    """Probe + ADC rank + exact refine over encoded assignment rows —
    the query path shared verbatim by :func:`ivfpq_topk` (arrays fresh
    from training) and :func:`ivfpq_topk_indexed` (arrays rebuilt from
    the stored centroid/codebook tables).

    r16 two-path shape. ONE Arrow pass over the assignment rows (the
    local-top-k kernel) evaluates, for every probed candidate, both the
    ADC dot (classic per-query lookup tables over the stored codes —
    the full PQ machinery still runs per candidate) and the approx
    cosine, keeps each query's per-batch top-k of BOTH scores (plus
    _APPROX_EPS boundary ties), and emits per-(batch, query) candidate
    COUNTS. When ``refine * k >= max(per-query candidate count)`` the
    ADC refine filter is PROVABLY vacuous — every candidate is in the
    refine set, so the declared result is exactly the native-cosine
    top-k of all candidates, and the kernel's cosine superset feeds the
    native re-rank directly (the bench / oracle configuration:
    probe-all + refine-all). Otherwise — approximate configs where the
    ADC CUT is load-bearing — fall back to the original join-shaped
    exact path below, whose ADC ranking semantics are preserved
    operator-for-operator (it re-scans the assignments; those configs
    run on pytest-sized corpora).

    Below the :func:`_use_topk_kernel` size threshold the join-shaped
    path runs directly — its fixed cost is lower than the kernel's
    Arrow pass at small index sizes, and its ADC semantics are the
    reference ones for every config."""
    if not _use_topk_kernel(assignments):
        return _pq_query_refine(
            assignments, cents, books, queries, id_col, vec_col, k, n_probe, refine
        )
    q_ids, qmat, q_native = _collect_unit_queries(queries, id_col, vec_col)
    if q_ids is None:
        return _empty_topk_result(queries, id_col)
    kern, schema = _topk_candidate_kernel(
        q_ids,
        qmat,
        k,
        queries.schema[id_col].dataType.simpleString(),
        assignments.schema[id_col].dataType.simpleString(),
        cell_lut=_probe_lut(cents, qmat, n_probe),
        pq=(cents, books),
    )
    src = _spread_if_narrow(
        assignments.select(
            F.col(id_col).alias("__id"),
            F.col("unit_vec"),
            F.col("cell"),
            F.col("codes"),
        )
    )
    # Materialize the reduced frame once (it is k-superset-sized, not
    # corpus-sized) so the vacuity decision and the final plan reuse
    # one corpus pass instead of re-running the kernel per action.
    reduced = src.mapInPandas(kern, schema).localCheckpoint(eager=True)
    max_cand = (
        reduced.filter(F.col("kind") == 1)
        .groupBy("query_id")
        .agg(F.sum("n").alias("__n"))
        .agg(F.max("__n"))
        .collect()[0][0]
        or 0
    )
    if refine * k >= max_cand:
        survivors = reduced.filter(F.col("kind") == 0).select(
            "query_id", "neighbor_id", "unit_vec"
        )
        return _exact_rerank(survivors, q_native, k)
    return _pq_query_refine(
        assignments, cents, books, queries, id_col, vec_col, k, n_probe, refine
    )


def _pq_query_refine(
    assignments: DataFrame,
    cents: "np.ndarray",
    books: list,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    n_probe: int,
    refine: int,
) -> DataFrame:
    """The original join-shaped ADC-refine path — exact semantics for
    configs where ``refine * k`` genuinely cuts the candidate set."""
    from pyspark.sql.functions import pandas_udf

    m_subvectors = len(books)
    sub = books[0].shape[1]
    n_probe_eff = min(n_probe, len(cents))

    @pandas_udf("array<int>")
    def probe_cells(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        order = np.argsort(-(v @ cents.T), axis=1)[:, :n_probe_eff].astype(np.int32)
        return pd.Series(list(order))

    @pandas_udf("double")
    def adc_dot(qv: pd.Series, cell: pd.Series, codes: pd.Series) -> pd.Series:
        q = np.asarray(qv.tolist(), dtype=np.float64)
        cel = np.asarray(cell, dtype=np.int64)
        s = np.einsum("bd,bd->b", q, cents[cel])
        code = np.asarray(codes.tolist(), dtype=np.int64)
        for j in range(m_subvectors):
            qs = q[:, j * sub : (j + 1) * sub]
            vs = books[j][code[:, j]]
            s = s + np.einsum("bs,bs->b", qs, vs)
        return pd.Series(s)

    c = assignments.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("unit_vec").alias("__cv"),
        F.col("cell").alias("__cell"),
        F.col("codes").alias("__codes"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("__qv")
    ).withColumn("__cell", F.explode(probe_cells(F.col("__qv"))))
    cand = c.join(F.broadcast(q), "__cell").filter(
        F.col("query_id") != F.col("neighbor_id")
    )
    cand = cand.withColumn(
        "__adc", adc_dot(F.col("__qv"), F.col("__cell"), F.col("__codes"))
    )
    w_adc = Window.partitionBy("query_id").orderBy(
        F.col("__adc").desc(), F.col("neighbor_id")
    )
    survivors = cand.withColumn("__arank", F.row_number().over(w_adc)).filter(
        F.col("__arank") <= refine * k
    )
    survivors = survivors.withColumn("cos_sim", dot(F.col("__qv"), F.col("__cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id")
    )
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos_sim", 6).alias("cos_sim"), "rank"
        )
    )


def ivfpq_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    m_subvectors: int = 8,
    n_codes: int = 32,
    sample_size: int = 512,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the PERSISTABLE IVF-PQ index (VERDICT r14 #6 — the
    standing-service twin of :func:`ivfpq_topk`, mirroring what
    :func:`ivf_index` is to :func:`ivf_topk`): train the coarse
    quantizer + per-subvector codebooks ONCE on the deterministic
    id-ordered sample, encode every corpus vector ONCE, and never
    touch the raw corpus again at query time.

    Returns ``(assignments, centroids, codebooks)``:

    - ``assignments``: one row per corpus vector — (id_col, unit_vec
      array<double>, cell int, codes array<int>). ``codes`` is the hot
      index (m bytes/vector at scale); ``unit_vec`` is the exact-vector
      side needed only for the final refine re-rank. At 100 TB you
      would store codes and vectors as separate tables (codes hot,
      vectors cold) and semi-join the refine survivors; one frame here
      keeps the API parallel to :func:`ivf_index` — partition/bucket
      by ``cell`` either way so probes read only their cells.
    - ``centroids``: (cell int, centroid array<double>), ``n_cells``
      rows.
    - ``codebooks``: (subvector int, code int, vec array<double>),
      ``m_subvectors * n_codes`` rows — the PQ tables.

    Training is deterministic (id-ordered sample, Lloyd with fixed
    init, no RNG) and doubles round-trip parquet exactly, so an index
    built from the same corpus reproduces bit-identically and
    :func:`ivfpq_topk_indexed` over the stored index equals the
    one-shot :func:`ivfpq_topk` (which now delegates through here).
    """
    spark = corpus.sparkSession
    trained = _pq_train(
        corpus, id_col, vec_col, n_cells, m_subvectors, n_codes, sample_size
    )
    if trained is None:
        # typed-empty contract, same as ivf_index (ADVICE r14)
        assignments = corpus.select(
            F.col(id_col),
            _unit(F.col(vec_col)).alias("unit_vec"),
            F.lit(0).alias("cell"),
            F.array().cast("array<int>").alias("codes"),
        ).limit(0)
        empty_cents = spark.createDataFrame([], "cell int, centroid array<double>")
        empty_books = spark.createDataFrame(
            [], "subvector int, code int, vec array<double>"
        )
        return assignments, empty_cents, empty_books
    cents, books = trained
    assignments = _pq_encode(corpus, cents, books, id_col, vec_col)
    centroids = spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(cents)],
        "cell int, centroid array<double>",
    )
    codebooks = spark.createDataFrame(
        [
            (int(j), int(cde), [float(x) for x in vec])
            for j, book in enumerate(books)
            for cde, vec in enumerate(book)
        ],
        "subvector int, code int, vec array<double>",
    )
    return assignments, centroids, codebooks


def ivfpq_topk_indexed(
    assignments: DataFrame,
    centroids: DataFrame,
    codebooks: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    refine: int = 4,
) -> DataFrame:
    """IVF-PQ top-k against a PERSISTED index (:func:`ivfpq_index`
    frames, typically read back from tables): queries probe their
    ``n_probe`` nearest cells, rank candidates by the ADC dot product
    reconstructed from the stored codes, and exact-cosine re-rank the
    top ``refine * k`` survivors. Identical result contract to
    :func:`ivfpq_topk` (which delegates here) — ``n_probe == n_cells``
    with a big enough refine set equals brute force.

    ``centroids`` and ``codebooks`` are collected driver-side — a
    bounded-by-contract collect (n_cells + m*n_codes rows; the
    quantizer is model, not data-scale) — and broadcast as closure
    constants; the only big-side work is the cell-keyed join against
    ``assignments``. The corpus is never re-scanned or re-encoded.
    """
    cent_rows = sorted(centroids.collect(), key=lambda r: r.cell)
    if not cent_rows:
        # empty index — same typed-empty contract as ivf_topk_indexed
        return _empty_topk_result(queries, id_col)
    cents = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    book_rows = codebooks.collect()
    m_subvectors = max(r.subvector for r in book_rows) + 1
    books = []
    for j in range(m_subvectors):
        rows_j = sorted((r for r in book_rows if r.subvector == j),
                        key=lambda r: r.code)
        books.append(np.asarray([r.vec for r in rows_j], dtype=np.float64))
    return _pq_query(
        assignments, cents, books, queries, id_col, vec_col, k, n_probe, refine
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    m_subvectors: int = 8,
    n_codes: int = 32,
    refine: int = 4,
    sample_size: int = 512,
) -> DataFrame:
    """IVF-PQ (inverted file + product quantization) approximate top-k
    — the composition actually deployed for billion-vector ANN (Jegou
    et al. 2011, public methodology): a coarse quantizer routes each
    corpus vector to a cell, its RESIDUAL from the cell centroid is
    product-quantized into ``m_subvectors`` byte codes, queries probe
    ``n_probe`` cells and rank candidates by the asymmetric-distance
    (ADC) dot product reconstructed from the codes, and only the top
    ``refine * k`` ADC survivors per query are re-ranked with exact
    cosine.

    Scale story: the corpus shuffles ONCE on cell id and thereafter
    lives as (cell, m bytes) per vector — 16x smaller than the raw
    doubles — so the candidate scan is code-table reads; exact vectors
    are touched only for the refine set. Training (coarse + codebooks)
    runs driver-side on a deterministic <=``sample_size`` sample and
    broadcasts as closure constants, exactly like ``ivf_topk``.

    ``n_probe == n_cells`` with ``refine * k >= |corpus|`` re-ranks
    every candidate exactly — deterministically equal to
    ``brute_force_topk`` (the oracle configuration; the full PQ path
    still executes). Approximate recall is pytest-bounded.

    Since r15 this composes the SAME private stages the persisted
    index uses — :func:`_pq_train` → :func:`_pq_encode` →
    :func:`_pq_query` — so one-shot and indexed results are identical
    by shared code; the only thing :func:`ivfpq_index` adds is the
    centroid/codebook DataFrame round-trip, whose exactness (doubles
    through parquet) is pytest-certified separately. Skipping that
    round-trip here keeps the one-shot path free of the extra
    collect/createDataFrame jobs.
    """
    trained = _pq_train(
        corpus, id_col, vec_col, n_cells, m_subvectors, n_codes, sample_size
    )
    if trained is None:
        # empty-corpus contract: id dtype comes from the CALLER's
        # corpus frame.
        return _empty_topk_result(corpus, id_col)
    cents, books = trained
    assignments = _pq_encode(corpus, cents, books, id_col, vec_col)
    return _pq_query(
        assignments, cents, books, queries, id_col, vec_col, k, n_probe, refine
    )


def margin_pairs(
    xs: DataFrame,
    ys: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 4,
    margin_threshold: float = 1.0,
) -> DataFrame:
    """Margin-based pair mining (Artetxe & Schwenk, ACL 2019 — the
    CCMatrix/LASER bitext criterion): score every cross-side candidate
    by the RATIO margin

        margin(x, y) = cos(x, y) / (0.5 * (avg_k(x) + avg_k(y)))

    where ``avg_k(v)`` is the mean cosine of v's k nearest neighbors on
    the OTHER side; keep pairs that are each other's best match
    ("max" strategy) with margin >= threshold. The margin normalizes
    away hubness — a vector that is close to everything scores high raw
    cosine but low margin.

    Determinism contract: cosines are scaled to integer micro-units
    (round(cos * 1e6) as BIGINT) BEFORE any ranking or window sum, so
    the k-NN average is exact integer arithmetic in any accumulation
    order, and the final margin is one IEEE division of identical
    integers on both engines. Ranks tie-break on the partner id.

    Scale: the smaller side ships to every task as a closure constant
    (collected once, broadcast-sized by contract — the same boundedness
    brute_force_topk assumes of its query set); the big side streams
    through TWO Arrow passes that never materialize the pair frame:
    pass 1 reduces each batch's score matrix to per-y top-k candidate
    cosines (k rows per y per batch) whose global top-k sum is each
    y's k-NN denominator half; pass 2, with those sums as a closure
    constant, scores each batch again and emits only each x's best
    pair plus each y's per-batch best candidate. Everything after the
    kernels is a window over ~(n_batches x n_y) rows — the n_x * n_y
    pair frame exists only strip-by-strip inside dgemm. At corpus
    scale the candidate generation swaps to the ANN family (lsh_topk /
    ivf_topk feeding the same scorer) — the margin algebra is
    unchanged.
    """
    # Micro-unit rounding is away-from-zero to match round() on Spark
    # AND DuckDB exactly; k-NN sums are exact integer arithmetic in
    # any accumulation order (ties at the k-boundary have EQUAL c6, so
    # which tied partner enters the sum cannot change it).
    id_type = xs.schema[id_col].dataType.simpleString()
    # Arrow-path collect (r16, guide §6 driver transfers): row-object
    # collect of 10k x dim vectors pickled one cell at a time (~3 s at
    # sf1eq); toPandas ships the same values as Arrow batches. float32
    # -> float64 widening is exact either way.
    ypdf = ys.select(id_col, vec_col).toPandas()
    if ypdf.empty:
        # empty y side: no pairs, correctly-typed empty result
        from pyspark.sql.types import DoubleType, StructField, StructType

        it = xs.schema[id_col].dataType
        return xs.sparkSession.createDataFrame(
            [],
            StructType(
                [
                    StructField("x_id", it),
                    StructField("y_id", it),
                    StructField("margin", DoubleType()),
                ]
            ),
        )

    def _unit_rows(mat: np.ndarray) -> np.ndarray:
        # zero-norm vectors have no direction: map them to the zero
        # vector (cos 0 against everything) instead of letting 0/0
        # NaNs reach astype(int64), which would silently turn into
        # INT64_MIN and poison every window sum they touch
        n = np.linalg.norm(mat, axis=1, keepdims=True)
        n[n == 0.0] = np.inf
        return mat / n

    y_ids = ypdf[id_col].to_numpy()
    ymat = _unit_rows(np.asarray(ypdf[vec_col].tolist(), dtype=np.float64))
    # Ascending y_id order (r16): with columns id-sorted, np.argmax's
    # first-maximum IS the smallest-id tie-break, so pass 2 never
    # materializes the strip x ny tie-break candidate matrices.
    y_order = np.argsort(y_ids, kind="stable")
    y_ids, ymat = y_ids[y_order], ymat[y_order]
    ny = len(y_ids)
    strip = 512

    # Half-away-from-zero rounding via truncation (r16, guide §1.2
    # per-task work): int64 astype / np.trunc truncate TOWARD ZERO, so
    # trunc(v + copysign(0.5, v)) == where(v>=0, floor(v+0.5),
    # ceil(v-0.5)) for every double (verified bit-identical on 2M
    # random values plus exact .5-micro boundaries). The branchy form
    # evaluated floor AND ceil over the full strip x ny matrix plus a
    # where-select — 6 array passes that were 12.6 of the 15 s kernel
    # time per 10k-row batch at sf1eq; this form is 2 passes.
    def _micro(v: np.ndarray) -> np.ndarray:
        v = v * 1_000_000.0
        return (v + np.copysign(0.5, v)).astype(np.int64)

    def _round6(v: np.ndarray) -> np.ndarray:
        # F.round / DuckDB round: 6-decimal, half away from zero
        v = v * 1_000_000.0
        return np.trunc(v + np.copysign(0.5, v)) / 1_000_000.0

    # ---- pass 1: each y's k-NN sum (sy). A batch contributes its
    # per-y top-min(k, batch) candidate cosines; the global top-k per y
    # reduces over n_batches * k rows, not the pair frame. Ranking is
    # by value only — tied values are interchangeable in a SUM.
    def knn_y(batches):
        for pdf in batches:
            xm = _unit_rows(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
            tops = []
            for s in range(0, len(xm), strip):
                c6 = _micro(xm[s : s + strip] @ ymat.T)
                t = min(k, c6.shape[0])
                tops.append(np.partition(c6, c6.shape[0] - t, axis=0)[-t:, :])
            cat = np.vstack(tops)
            t = min(k, cat.shape[0])
            top = np.partition(cat, cat.shape[0] - t, axis=0)[-t:, :]
            yield pd.DataFrame(
                {
                    "__yi": np.tile(np.arange(ny, dtype=np.int32), t),
                    "__c6": top.ravel(),
                }
            )

    # Both Arrow passes hash-spread the x side first (r16, guide §2 /
    # skew.spread): a single-file parquet side arrives as 1-2 scan
    # partitions, serializing the kernel on 2 of 32 cores. Emissions
    # are partition-invariant by construction: pass 1 reduces per-y
    # candidate VALUES whose global top-k is batching-independent, and
    # pass 2 emits per-x rows from x's own complete score row plus
    # per-y batch-bests whose global (margin desc, x_id) argmax equals
    # the unbatched argmax.
    from .skew import spread

    wy = Window.partitionBy("__yi").orderBy(F.desc("__c6"))
    sy_rows = (
        spread(xs.select(vec_col))
        .mapInPandas(knn_y, "__yi int, __c6 long")
        .withColumn("__r", F.row_number().over(wy))
        .filter(F.col("__r") <= k)
        .groupBy("__yi")
        .agg(F.sum("__c6").alias("__sy"))
        .collect()
    )
    sy = np.zeros(ny, dtype=np.int64)
    for r in sy_rows:
        sy[r["__yi"]] = r["__sy"]

    # ---- pass 2: margins. sx is exact from the batch's own score rows
    # (top-k VALUES of the full row); the kernel emits one best-pair
    # row per x (kind 0) and one best-candidate row per y per batch
    # (kind 1). Comparison uses the same 6-decimal away-from-zero
    # rounding as the emitted margin, and ties break on the partner id
    # — exactly row_number() over (margin DESC, partner id).
    out_schema = (
        f"x_id {id_type}, y_id {id_type}, __c6 long, __sx long, "
        f"__sy long, __m double, __kind int"
    )
    def best_pairs(batches):
        for pdf in batches:
            xm = _unit_rows(np.asarray(pdf[vec_col].tolist(), dtype=np.float64))
            x_ids = pdf[id_col].to_numpy()
            # ascending x_id within the batch: np.argmax(axis=0)'s
            # first-maximum becomes the smallest-x_id tie-break (strip
            # composition changes are covered by the same
            # partition-invariance argument as batching itself).
            x_order = np.argsort(x_ids, kind="stable")
            x_ids, xm = x_ids[x_order], xm[x_order]
            frames = []
            for s in range(0, len(xm), strip):
                sx_ids = x_ids[s : s + strip]
                c6 = _micro(xm[s : s + strip] @ ymat.T)
                t = min(k, ny)
                # top-t SUM is order-invariant: np.partition (O(ny))
                # replaces the full row sort (O(ny log ny)) that
                # dominated this kernel at 30k-column strips.
                sx = np.partition(c6, ny - t, axis=1)[:, ny - t :].sum(axis=1)
                denom = sx[:, None] + sy[None, :]
                safe = denom != 0
                raw = np.divide(
                    2.0 * k * c6, denom, out=np.zeros_like(c6, float), where=safe
                )
                marg = _round6(raw)
                marg[~safe] = -np.inf  # NULL margin: never ranks first
                # best y per x: max margin, tie -> smallest y_id
                # (first argmax over id-sorted columns)
                jstar = np.argmax(marg, axis=1)
                rows = np.arange(len(sx_ids))
                mx = marg[rows, jstar]
                okx = np.isfinite(mx)
                frames.append(
                    pd.DataFrame(
                        {
                            "x_id": sx_ids[okx],
                            "y_id": y_ids[jstar[okx]],
                            "__c6": c6[rows[okx], jstar[okx]],
                            "__sx": sx[okx],
                            "__sy": sy[jstar[okx]],
                            "__m": mx[okx],
                            "__kind": 0,
                        }
                    )
                )
                # strip-best x per y: max margin, tie -> smallest x_id
                # (first argmax over id-sorted rows)
                istar = np.argmax(marg, axis=0)
                my = marg[istar, np.arange(ny)]
                oky = np.isfinite(my)
                frames.append(
                    pd.DataFrame(
                        {
                            "x_id": sx_ids[istar[oky]],
                            "y_id": y_ids[oky],
                            "__c6": 0,
                            "__sx": 0,
                            "__sy": 0,
                            "__m": my[oky],
                            "__kind": 1,
                        }
                    )
                )
            yield pd.concat(frames) if frames else pd.DataFrame(
                {
                    "x_id": x_ids[:0], "y_id": x_ids[:0],
                    "__c6": np.array([], np.int64),
                    "__sx": np.array([], np.int64),
                    "__sy": np.array([], np.int64),
                    "__m": np.array([], float),
                    "__kind": np.array([], np.int32),
                }
            )

    both = spread(xs.select(id_col, vec_col)).mapInPandas(best_pairs, out_schema)
    bestx = both.filter(F.col("__kind") == 0)
    wby = Window.partitionBy("y_id").orderBy(F.desc("__m"), "x_id")
    besty = (
        both.filter(F.col("__kind") == 1)
        .withColumn("__r", F.row_number().over(wby))
        .filter(F.col("__r") == 1)
        .select("x_id", "y_id")
    )
    denom = F.col("__sx") + F.col("__sy")
    return (
        bestx.join(besty, ["x_id", "y_id"])  # mutual best
        .select(
            "x_id",
            "y_id",
            # the EMITTED margin is Spark's own round over the exact
            # integer components — the engine-certified arithmetic;
            # the kernel's float rounding only ranked candidates
            F.round(F.lit(2.0 * k) * F.col("__c6") / denom, 6).alias("margin"),
        )
        .filter(F.col("margin") >= margin_threshold)
    )


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_cells: int = 16,
    n_assign: int = 1,
    sample_size: int = 512,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, public recipe): cluster the
    embedding space with the IVF coarse quantizer, then inside each
    cluster prune near-duplicate pairs above a cosine threshold,
    keeping one representative. Returns the KEPT ids (one column,
    ``id_col``'s name/dtype preserved).

    Representative choice is deterministic min-id dominance: a row is
    removed iff SOME lower-id row in a shared cluster sits within the
    threshold — no RNG, no iteration order, reproducible across runs
    and engines.

    Clustering reuses ``ivf_topk``'s machinery verbatim: centroids
    train driver-side on a deterministic id-ordered sample (bounded
    collect; the quantizer is data, not data-scale) and broadcast as a
    closure constant; assignment is one Arrow-batch matmul. The corpus
    shuffles ONCE on cell id, and the pair join is an equi-join on the
    cell — candidate count is bounded by the largest cluster squared,
    NEVER all-pairs (the published recipe's point: k-means cells make
    100 TB-scale dedup tractable because epsilon-duplicates co-cluster
    with high probability).

    ``n_assign`` co-assigns each vector to its ``n_assign`` nearest
    cells (multi-probe against boundary splits). ``n_assign ==
    n_cells`` puts every pair in some shared cell — deterministically
    exact (equal to all-pairs dedup; the oracle configuration) while
    the full cluster-route-join path still executes. ``n_assign=1`` is
    the published scale path; its recall against planted duplicates is
    pytest-bounded (tests/test_extensions.py).
    """
    from pyspark.sql.functions import pandas_udf

    from .skew import spread

    sample = _unit_sample(df, id_col, vec_col, sample_size)
    if sample is None:
        return df.select(id_col).limit(0)
    cents = _kmeans_centroids(sample, min(n_cells, len(sample)))
    n_assign_eff = min(n_assign, len(cents))

    @pandas_udf("array<int>")
    def assign_cells(vecs: pd.Series) -> pd.Series:
        v = np.asarray(vecs.tolist(), dtype=np.float64)
        order = np.argsort(-(v @ cents.T), axis=1)[:, :n_assign_eff].astype(np.int32)
        return pd.Series(list(order))

    base = spread(df, id_col).select(
        F.col(id_col).alias("__id"), _unit(F.col(vec_col)).alias("__v")
    )
    # Candidate generation is ID-ONLY: the cell equi-join and the pair
    # dedup shuffle (cell, id) rows, never the vectors — with
    # multi-assignment a pair surfaces once per shared cell, and
    # deduping WIDE rows (2 x dim doubles each) before verification
    # was measured at ~10x the whole operator's cost at 2k vectors x
    # probe-all. Vectors attach AFTER the distinct, via joins against
    # the (unit-normalized) corpus frame — broadcast when small, and
    # at scale n_assign=1 keeps the candidate side bounded per cell.
    # (id, cell) feeds BOTH sides of the candidate self-join, and Spark
    # does NOT reuse the exchange (verified: 2 ArrowEvalPython nodes),
    # so the assignment matmul runs twice. MEASURED r13: checkpointing
    # here was 1.9x SLOWER at sf0.1 (3.7 -> 6.9 s best-of-3) — the
    # materialization barrier costs more than the duplicated matmul.
    # At cluster scale with 100 TB of vectors the trade flips: persist
    # the narrow assignment frame to a table and join both sides from
    # it, paying one corpus pass instead of two.
    # Within-cell candidate generation through the blocked-BLAS kernel
    # (slack threshold): the cell-route semantics are unchanged — a
    # pair is a candidate iff it SHARES a cell — but the quadratic
    # within-cell comparison runs as dgemm strips instead of an
    # id-equi-join whose pair frame (probe-all: n_cells x upper
    # triangle before the distinct) dominated the operator at 200k
    # vectors. Survivors re-verify with the native dot at the exact
    # threshold, preserving the engine-exact boundary comparison.
    #
    # Route choice (r16): when co-assignment is DENSE — n_assign^2 >=
    # n_cells under the balanced-cell model, i.e. the per-cell pass
    # totals ~n^2 * a^2 / C dgemm FLOPs vs n^2 for one global pass —
    # the per-cell route recomputes near-identical memberships once
    # per cell (the probe-all certification config computes every pair
    # n_cells times, then distincts them away). Run ONE global blocked
    # pass instead, carrying each row's assigned cells as an int64
    # BITMASK; the kernel keeps a scoring pair iff mask_a & mask_b !=
    # 0 — exactly "shares >= 1 cell", so the candidate set is
    # identical and already duplicate-free (each unordered pair lives
    # in one block pair). The sparse published scale path (n_assign=1)
    # keeps the per-cell route, where cells genuinely partition the
    # work. Bitmask needs n_cells <= 64; larger quantizers use the
    # per-cell route regardless.
    if n_assign_eff * n_assign_eff >= len(cents) and len(cents) <= 64:

        @pandas_udf("long")
        def assign_mask(vecs: pd.Series) -> pd.Series:
            v = np.asarray(vecs.tolist(), dtype=np.float64)
            order = np.argsort(-(v @ cents.T), axis=1)[:, :n_assign_eff]
            return pd.Series(
                np.bitwise_or.reduce(
                    np.int64(1) << order.astype(np.int64), axis=1
                )
            )

        masked = base.withColumn("__mask", assign_mask(F.col("__v")))
        cand = _blas_candidate_pairs(
            masked, threshold - _BLAS_EPS, mask_col="__mask"
        )
    else:
        cells = base.withColumn(
            "__cell", F.explode(assign_cells(F.col("__v")))
        )
        cand = _blas_candidate_pairs(
            cells, threshold - _BLAS_EPS, group_col="__cell"
        ).distinct()
    va = base.select(F.col("__id").alias("id_a"), F.col("__v").alias("__va"))
    vb = base.select(F.col("__id").alias("id_b"), F.col("__v").alias("__vb"))
    removed = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .filter(dot(F.col("__va"), F.col("__vb")) >= threshold)
        .select(F.col("id_b").alias("__rm"))
        .distinct()
    )
    return df.select(id_col).join(
        removed, F.col(id_col) == F.col("__rm"), "left_anti"
    )
