"""Property tests (SURVEY §5.4): sessionization invariants over
randomized event sets, and incremental-load idempotence."""

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Window
from pyspark.sql import functions as F

from fhc_rco_etl_scalable_spark.operators.sessionize import (
    rco_session_trigger,
    sessionize,
)

T0 = datetime(2024, 1, 1)
P = 30.0

events_strategy = st.lists(
    st.tuples(
        st.sampled_from(["L1", "L2"]),                      # line
        st.integers(min_value=0, max_value=2000),           # start minute
        st.integers(min_value=0, max_value=45),             # duration min
        st.sampled_from(["CO", "Fail", None]),              # cause
        st.sampled_from(["A", "B", None]),                  # brand
    ),
    min_size=1,
    max_size=25,
)


def _sessionize(spark, rows):
    data = [
        (
            f"e{i:03d}",
            line,
            T0 + timedelta(minutes=m),
            T0 + timedelta(minutes=m + d),
            c,
            b,
        )
        for i, (line, m, d, c, b) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "id string, LINE string, START_TIME timestamp, END_TIME timestamp,"
        " cause string, BRANDCODE string",
    )
    w = Window.partitionBy("LINE").orderBy("START_TIME", "id")
    df = (
        df.withColumn("prev_end", F.lag("END_TIME").over(w))
        .withColumn("prev_cause", F.lag("cause").over(w))
        .withColumn("prev_brand", F.lag("BRANDCODE").over(w))
    )
    gap = (F.col("START_TIME").cast("double") - F.col("prev_end").cast("double")) / 60.0
    trig = rco_session_trigger(
        gap_minutes=gap,
        same_line=F.lit(True),
        same_trigger_col=F.col("cause").eqNullSafe(F.col("prev_cause")),
        same_brandcode=F.col("BRANDCODE").eqNullSafe(F.col("prev_brand")),
        p=P,
    )
    out = sessionize(df, trig, ["LINE"], ["START_TIME", "id"])
    return out.select("id", "LINE", "START_TIME", "session_num").collect()


@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionization_invariants(spark, rows):
    got = _sessionize(spark, rows)
    # 1. every event is in exactly one session
    assert len(got) == len(rows)
    per_line: dict[str, list] = {}
    for r in sorted(got, key=lambda r: (r.LINE, r.START_TIME, r.id)):
        per_line.setdefault(r.LINE, []).append(r.session_num)
    for nums in per_line.values():
        # 2. session numbers start at 1 and are monotone non-decreasing
        assert nums[0] == 1
        assert all(b - a in (0, 1) for a, b in zip(nums, nums[1:]))


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(events_strategy)
def test_sessionization_deterministic(spark, rows):
    a = sorted(map(tuple, _sessionize(spark, rows)))
    b = sorted(map(tuple, _sessionize(spark, list(reversed(rows)))))
    # input order must not matter (ids are assigned by original index, so
    # compare the (LINE, START_TIME) -> session mapping shape instead)
    sess_a = {}
    for (_, line, ts, num) in a:
        sess_a.setdefault((line, num), set()).add(ts)
    sess_b = {}
    for (_, line, ts, num) in b:
        sess_b.setdefault((line, num), set()).add(ts)
    # same partition of timestamps into sessions per line, up to ids of
    # equal-timestamp events (tie-break by id differs after reversal)
    has_dup_ts = len({(r[1], r[2]) for r in a}) != len(a)
    if not has_dup_ts:
        assert sorted(sess_a.values(), key=sorted) == sorted(
            sess_b.values(), key=sorted
        )


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    edges=st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(
            lambda e: e[0] != e[1]
        ),
        min_size=1,
        max_size=40,
    )
)
def test_connected_components_matches_union_find(spark, edges):
    # Spark propagation vs a driver-side union-find reference.
    from fhc_rco_etl_scalable_spark.operators.dedup import connected_components

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    want = {x: find(x) for x in parent}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.id: r.component for r in connected_components(df).collect()}
    assert got == want
    star = {
        r.id: r.component
        for r in connected_components(df, algorithm="star").collect()
    }
    assert star == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from("ab"), min_size=1, max_size=12).map("".join),
        min_size=2,
        max_size=12,
        unique=True,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_fuzzy_blocking_never_loses_a_pair(spark, names, max_dist):
    """Property: BOTH blocking schemes are LOSSLESS — fuzzy_self_match
    under segment pigeonhole (default) and length banding each equal
    the brute-force levenshtein pair set for any corpus and any d."""
    from fhc_rco_etl_scalable_spark.operators.fuzzy import fuzzy_self_match

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    df = spark.createDataFrame([(n,) for n in names], "name string")
    want = {
        (a, b, lev(a, b))
        for a in names
        for b in names
        if a < b and lev(a, b) <= max_dist
    }
    for blocking in ("segment", "length"):
        got = {
            (r.name_a, r.name_b, r.dist)
            for r in fuzzy_self_match(df, "name", max_dist, blocking).collect()
        }
        assert got == want, f"blocking={blocking}"


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.lists(st.sampled_from(["w1", "w2", "w3", "w4"]), min_size=1, max_size=9)
        .map(" ".join),
        min_size=1,
        max_size=8,
    ),
    st.integers(min_value=1, max_value=3),
)
def test_span_dedup_matches_reference(spark, texts, k):
    """Property: span_dedup equals a sequential reference — split each
    doc into k-word chunks, keep only first-ever occurrences (by doc
    order, then position), rebuild."""
    from fhc_rco_etl_scalable_spark.operators.dedup import span_dedup

    docs = list(enumerate(texts))
    seen, want = set(), {}
    for i, t in docs:
        ws = t.split(" ")
        kept = []
        for p in range(0, len(ws), k):
            span = " ".join(ws[p : p + k])
            if span not in seen:
                seen.add(span)
                kept.append(span)
        want[i] = (" ".join(kept), len(kept))

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r.doc_id: (r.text_dedup, r.n_spans_kept)
        for r in span_dedup(df, "doc_id", "text", span_words=k).collect()
    }
    assert got == want


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=5),    # partkey
            st.integers(min_value=0, max_value=4),    # suppkey
            st.integers(min_value=1, max_value=9),    # cost (small ints: ties likely)
        ),
        min_size=1,
        max_size=30,
    )
)
def test_q2_window_decorrelation_equals_join_form(spark, offers):
    """Property: the Q2 correlated-scalar decorrelation (window MIN
    over partkey + equality filter) returns EXACTLY the rows of the
    textbook aggregate-then-join form, including all tied minima."""
    df = spark.createDataFrame(
        offers, "partkey int, suppkey int, cost int"
    ).groupBy("partkey", "suppkey").agg(F.min("cost").alias("cost"))

    w = Window.partitionBy("partkey")
    via_window = {
        tuple(r)
        for r in df.withColumn("m", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("m"))
        .select("partkey", "suppkey", "cost")
        .collect()
    }
    mins = df.groupBy("partkey").agg(F.min("cost").alias("m"))
    via_join = {
        tuple(r)
        for r in df.join(mins, "partkey")
        .filter(F.col("cost") == F.col("m"))
        .select("partkey", "suppkey", "cost")
        .collect()
    }
    assert via_window == via_join


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),    # partkey
            st.integers(min_value=0, max_value=3),    # suppkey
            st.integers(min_value=1, max_value=20),   # qty
        ),
        min_size=1,
        max_size=30,
    )
)
def test_q20_window_total_equals_correlated_total(spark, ship_rows):
    """Property: the Q20 correlated-aggregate decorrelation (window SUM
    over partkey) marks exactly the (part, supplier) pairs whose
    quantity strictly exceeds half the part total — against a plain
    python reference, boundary (qty == total/2) excluded."""
    from collections import defaultdict

    agg = defaultdict(int)
    for p, s, q in ship_rows:
        agg[(p, s)] += q
    totals = defaultdict(int)
    for (p, s), q in agg.items():
        totals[p] += q
    want = {(p, s) for (p, s), q in agg.items() if q > 0.5 * totals[p]}

    df = spark.createDataFrame(
        ship_rows, "partkey int, suppkey int, qty int"
    ).groupBy("partkey", "suppkey").agg(F.sum("qty").alias("qty"))
    w = Window.partitionBy("partkey")
    got = {
        (r.partkey, r.suppkey)
        for r in df.withColumn("t", F.sum("qty").over(w))
        .filter(F.col("qty") > F.lit(0.5) * F.col("t"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# BPE merge loop: the driver-side greedy loop must match an
# independent reference on arbitrary word-count tables (pure python —
# no Spark per example, so the example budget is generous), and
# segmentation with the learned table must be lossless.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", min_size=1, max_size=6),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=12,
        unique_by=lambda t: t[0],
    ),
    st.integers(min_value=1, max_value=8),
)
def test_bpe_merge_loop_matches_reference(word_counts, n_merges):
    from fhc_rco_etl_scalable_spark.operators.bpe import (
        EOW,
        _merge_loop,
        segment_word,
    )

    got = _merge_loop(word_counts, n_merges)

    # independent reference
    seqs = {w: list(w) + [EOW] for w, _ in word_counts}
    counts = dict(word_counts)
    want = []
    for _ in range(n_merges):
        pw = {}
        for w, c in counts.items():
            s = seqs[w]
            for a, b in zip(s, s[1:]):
                pw[(a, b)] = pw.get((a, b), 0) + c
        if not pw:
            break
        top = max(pw.values())
        best = min(p for p, v in pw.items() if v == top)
        want.append(best)
        for w in seqs:
            s, out, i = seqs[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1]); i += 2
                else:
                    out.append(s[i]); i += 1
            seqs[w] = out
    assert got == want

    ranks = {p: i for i, p in enumerate(got)}
    for w, _ in word_counts:
        assert "".join(segment_word(w, ranks)) == w + EOW  # lossless


# ---------------------------------------------------------------------------
# URL canonicalization: the Spark expression tree must match a pure-
# python model over structured random URLs (case x port x trailing
# slash x param order x tracking x fragment).
# ---------------------------------------------------------------------------

_url_strategy = st.lists(
    st.tuples(
        st.sampled_from(["http", "HTTP", "https", "HtTpS"]),
        st.sampled_from(["Host.COM", "a.b.org", "X9.net"]),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.sampled_from(["", "/p", "/p/q", "/p/q/", "/p//"]),
        st.lists(
            st.sampled_from(
                ["a=1", "b=2", "z=9", "utm_source=s", "utm_campaign=c",
                 "gclid=g", "fbclid=f", "ref=r"]
            ),
            max_size=4,
            unique=True,
        ),
        # Fragments may themselves contain '?': the FIRST '?' of the
        # URL can sit inside the fragment, and canonicalization must
        # not mistake fragment text for a query (ADVICE r8 #2).
        st.sampled_from(["", "#frag", "#a?b=1", "#?utm_source=s"]),
    ),
    min_size=1,
    max_size=15,
)


def _canon_model(scheme, host, port, path, params, frag) -> str:
    import re as _re

    s = scheme.lower()
    h = host.lower()
    p = port
    if (s == "http" and p == ":80") or (s == "https" and p == ":443"):
        p = ""
    pa = _re.sub(r"/+$", "", path)
    keep = sorted(
        q for q in params
        if not _re.match(r"^(utm_[A-Za-z0-9_]*|gclid|fbclid)=", q)
    )
    qs = "?" + "&".join(keep) if keep else ""
    return f"{s}://{h}{p}{pa}{qs}"


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_url_strategy)
def test_url_canonicalization_matches_model(spark, urls):
    from fhc_rco_etl_scalable_spark.functions.url import canonicalize_url

    raw = [
        (f"{s}://{h}{p}{pa}" + ("?" + "&".join(q) if q else "") + f,)
        for s, h, p, pa, q, f in urls
    ]
    want = [_canon_model(*u) for u in urls]
    df = spark.createDataFrame(raw, "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == want


# ---------------------------------------------------------------------------
# ExactSubstr (substring_dedup): the Spark sliding-anchor plan must
# match a direct pure-python model of the removal rule — every
# position covered by a >=N-token substring occurring more than once
# in the corpus is removed, everything else survives in order.
# ---------------------------------------------------------------------------

_substr_corpus = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=14
    ),
    min_size=1,
    max_size=8,
)


def _substr_model(docs: list[list[str]], n: int = 4):
    from collections import Counter

    grams = Counter()
    for toks in docs:
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    out = []
    for doc_id, toks in enumerate(docs):
        covered = set()
        for i in range(len(toks) - n + 1):
            if grams[tuple(toks[i : i + n])] > 1:
                covered.update(range(i, i + n))
        spans = 0
        prev = -2
        for i in sorted(covered):
            if i != prev + 1:
                spans += 1
            prev = i
        kept = [t for i, t in enumerate(toks) if i not in covered]
        out.append(
            (doc_id, len(toks), len(covered), spans, " ".join(kept))
        )
    return sorted(out)


@settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
@given(_substr_corpus)
def test_substring_dedup_matches_model(spark, corpus):
    from fhc_rco_etl_scalable_spark.operators.dedup import substring_dedup

    docs = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(corpus)],
        "doc_id int, text string",
    )
    got = sorted(
        (r.doc_id, r.n_tokens, r.n_removed, r.n_spans, r.cleaned_text)
        for r in substring_dedup(docs, "doc_id", "text", min_tokens=4).collect()
    )
    assert got == _substr_model(corpus)


# ---------------------------------------------------------------------------
# Sliding-window distinct: the hopping-membership explode must equal a
# direct per-window set model for arbitrary (day, user) multisets.
# ---------------------------------------------------------------------------

_sliding_events = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),  # day offset
        st.integers(min_value=0, max_value=4),  # user id
    ),
    min_size=1,
    max_size=30,
)


def _sliding_model(events, size=3):
    from collections import defaultdict

    users = defaultdict(set)
    for d, u in events:
        for k in range(size):
            users[d - k].add(u)
    return {d: len(s) for d, s in users.items()}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(_sliding_events)
def test_sliding_distinct_matches_model(spark, events):
    from fhc_rco_etl_scalable_spark.operators.aggregate import sliding_distinct

    t0 = datetime(2024, 5, 1)
    df = spark.createDataFrame(
        [(t0 + timedelta(days=d, hours=3), u) for d, u in events],
        "ts timestamp, user_id long",
    )
    got = {
        (r.window_start - t0.date()).days: r.n_distinct
        for r in sliding_distinct(df, "ts", "user_id", size_days=3).collect()
    }
    assert got == _sliding_model(events)


# ---------------------------------------------------------------------------
# asof_join direction='nearest' (r11) vs a pure-python model: randomized
# left/right timestamp sets per key, unique right ids as tie-breakers.
# ---------------------------------------------------------------------------

_asof_case = st.tuples(
    st.lists(  # left rows: (key, minute)
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 120)),
        min_size=1, max_size=12,
    ),
    st.lists(  # right rows: (key, minute)
        st.tuples(st.sampled_from(["k1", "k2"]), st.integers(0, 120)),
        min_size=0, max_size=12,
    ),
    st.booleans(),                                  # strict
    st.sampled_from([None, 7, 30]),                 # tolerance minutes
)


def _nearest_model(lefts, rights, strict, tol):
    out = {}
    for li, (k, lm) in enumerate(lefts):
        def side(cands, backward):
            # candidates obeying direction + strictness; pick nearest,
            # ties within equal distance by the directional tie rule
            # (backward = LAST in (ts, id) order; forward = FIRST).
            ok = []
            for ri, (rk, rm) in enumerate(rights):
                if rk != k:
                    continue
                if backward and (rm < lm or (rm == lm and not strict)):
                    ok.append((abs(lm - rm), rm, ri))
                if not backward and (rm > lm or (rm == lm and not strict)):
                    ok.append((abs(lm - rm), rm, ri))
            if not ok:
                return None
            d = min(o[0] for o in ok)
            tied = [o for o in ok if o[0] == d]
            # right ids are unique ("r{ri}"); the engine orders by the
            # tie_break VALUE (string), so mirror lexicographic order.
            ids = sorted(f"r{o[2]}" for o in tied)
            rid = ids[-1] if backward else ids[0]
            return (d, rid)
        b, f = side(rights, True), side(rights, False)
        if tol is not None:
            b = b if b and b[0] <= tol else None
            f = f if f and f[0] <= tol else None
        if b is None and f is None:
            pick = None
        elif b is None:
            pick = f[1]
        elif f is None:
            pick = b[1]
        else:
            pick = f[1] if f[0] < b[0] else b[1]  # tie -> backward
        out[f"l{li}"] = pick
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_asof_case)
def test_asof_nearest_matches_model(spark, case):
    from fhc_rco_etl_scalable_spark.operators.asof import asof_join

    lefts, rights, strict, tol = case
    ldf = spark.createDataFrame(
        [(k, T0 + timedelta(minutes=m), f"l{i}") for i, (k, m) in enumerate(lefts)],
        "k string, lts timestamp, lid string",
    )
    rdf = spark.createDataFrame(
        [(k, T0 + timedelta(minutes=m), f"r{i}") for i, (k, m) in enumerate(rights)],
        "k string, rts timestamp, rid string",
    ) if rights else spark.createDataFrame([], "k string, rts timestamp, rid string")
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="lts", right_ts="rts",
        value_cols=["rid"], direction="nearest", strict=strict,
        tie_break=["rid"],
        tolerance=None if tol is None else f"{tol} minutes",
    )
    got = {r.lid: r.rid for r in out.collect()}
    assert got == _nearest_model(lefts, rights, strict, tol)


# ---------------------------------------------------------------------------
# r12: dual-path operators — random inputs through BOTH execution
# paths must collect identical frames. These guard the paths' shared
# contract beyond the fixed gate fixtures.
# ---------------------------------------------------------------------------

_chain_case = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),          # key
        st.integers(min_value=0, max_value=50),    # valid_from minute
        st.one_of(st.none(), st.integers(min_value=0, max_value=60)),
    ),
    min_size=0,
    max_size=8,
)
_facts_case = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C", "D"]),
        st.integers(min_value=-5, max_value=65),
    ),
    min_size=1,
    max_size=10,
)


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(_chain_case, _facts_case)
def test_pit_lookup_paths_agree_on_sound_chains(spark, versions, facts):
    """Broadcast join vs union/ffill fallback: identical output for
    every SOUND chain (the documented contract). Raw version tuples
    are normalized into a disjoint chain per key (sorted starts, each
    valid_to clipped to the next valid_from; the last stays open or
    clipped) so the generator explores layouts, not chain breakage."""
    from fhc_rco_etl_scalable_spark.operators.asof import pit_lookup

    by_key = {}
    for k, vf, vt in versions:
        by_key.setdefault(k, []).append((vf, vt))
    rows = []
    for k, vs in by_key.items():
        starts = sorted({vf for vf, _ in vs})
        for i, vf in enumerate(starts):
            raw_vt = dict(vs)[vf]
            nxt = starts[i + 1] if i + 1 < len(starts) else None
            if raw_vt is None:
                vt = nxt
            else:
                vt = raw_vt if nxt is None else min(raw_vt, nxt)
            if vt is not None and vt <= vf:
                vt = nxt if nxt is None or nxt > vf else None
            rows.append((k, vf, vt, i))
    dim = spark.createDataFrame(
        [
            (
                k,
                T0 + timedelta(minutes=vf),
                None if vt is None else T0 + timedelta(minutes=vt),
                ver,
            )
            for k, vf, vt, ver in rows
        ],
        "k string, valid_from timestamp, valid_to timestamp, ver long",
    ) if rows else spark.createDataFrame(
        [], "k string, valid_from timestamp, valid_to timestamp, ver long"
    )
    fdf = spark.createDataFrame(
        [
            (f"f{i}", k, T0 + timedelta(minutes=m))
            for i, (k, m) in enumerate(facts)
        ],
        "fid string, k string, fact_ts timestamp",
    )
    a = pit_lookup(fdf, dim, "k", "fact_ts", value_cols=["ver"],
                   broadcast_dim=True)
    b = pit_lookup(fdf, dim, "k", "fact_ts", value_cols=["ver"],
                   broadcast_dim=False)
    assert a.columns == b.columns
    ca = sorted((r.fid, r.dim_ver) for r in a.collect())
    cb = sorted((r.fid, r.dim_ver) for r in b.collect())
    assert ca == cb


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),            # group
            st.sampled_from(["x", "y", "z", "other"]),        # category
            st.integers(min_value=-1000, max_value=1000),     # value
        ),
        min_size=0,
        max_size=25,
    )
)
def test_pivot_wide_matches_api_pivot_property(spark, rows):
    """pivot_wide == groupBy().pivot() for sum/min/max/avg on random
    frames (count diverges on empty categories by documented design:
    SQL 0 vs PivotFirst NULL)."""
    from fhc_rco_etl_scalable_spark.operators.aggregate import pivot_wide

    df = spark.createDataFrame(
        rows or [(0, "zz_absent", 0)], "g long, cat string, v long"
    )
    cats = ["x", "y", "z"]
    for agg in ("sum", "min", "max", "avg"):
        api = df.groupBy("g").pivot("cat", cats).agg(
            getattr(F, agg)("v")
        )
        got = pivot_wide(df, ["g"], "cat", cats, "v", agg=agg)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, api.collect())
        ), agg


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),           # group key
            st.sampled_from(["a", "b", "c", "d"]),           # category
            st.integers(min_value=-1000, max_value=1000),    # value (exact)
            st.integers(min_value=0, max_value=9),           # second measure
        ),
        min_size=1,
        max_size=40,
    ),
    st.lists(
        st.sampled_from(["a", "b", "c", "d"]),
        min_size=1, max_size=4, unique=True,
    ),
)
def test_pivot_wide_matches_api_pivot(spark, rows, cats):
    """Property: for ANY frame and ANY explicit category list,
    pivot_wide == API pivot cell-for-cell for the NULL-skipping
    aggregates, and pivot_wide_multi's slices equal per-measure
    pivot_wide. (The count-of-empty-category 0-vs-NULL divergence is
    deliberately excluded — sum/max only here; it has its own unit
    test.) Values are exact integers so equality is bitwise."""
    from fhc_rco_etl_scalable_spark.operators.aggregate import (
        pivot_wide,
        pivot_wide_multi,
    )

    df = spark.createDataFrame(
        rows, "k int, cat string, v long, w long"
    )
    api = (
        df.groupBy("k")
        .pivot("cat", cats)
        .agg(F.sum("v").alias("vs"), F.max("w").alias("wm"))
    )
    multi = pivot_wide_multi(
        df, ["k"], "cat", cats, [("vs", "sum", "v"), ("wm", "max", "w")]
    )
    if len(cats) == 1:
        # single-category API pivot drops the value prefix
        api = api.withColumnsRenamed(
            {"vs": f"{cats[0]}_vs", "wm": f"{cats[0]}_wm"}
        )
    assert multi.columns == api.columns
    assert sorted(map(tuple, multi.collect())) == sorted(
        map(tuple, api.collect())
    )
    single = pivot_wide(df, ["k"], "cat", cats, "v", agg="sum", suffix="_vs")
    assert sorted(
        map(tuple, multi.select(*single.columns).collect())
    ) == sorted(map(tuple, single.collect()))
