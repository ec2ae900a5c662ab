"""Property-based tests (hypothesis) for the operators whose
correctness is an algebraic invariant over ADVERSARIAL inputs rather
than a fixed oracle: random document layouts and pathological numeric
distributions, bounded example counts so the suite stays fast."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@settings(**_SETTINGS)
@given(
    layout=st.lists(
        st.tuples(st.integers(0, 10**6), st.integers(0, 40)),
        min_size=1,
        max_size=25,
        unique_by=lambda t: t[0],
    ),
    budget=st.sampled_from([7, 32, 512]),
)
def test_emit_packed_reconstruction_property(spark, layout, budget):
    """For ANY doc-id layout and budget: concatenating the emitted
    sequences in seq_id order == the corpus token stream in doc_id
    order, and every sequence except the last is exactly full."""
    from smartpipeline_spark.functions.curation import emit_packed

    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(n))) for i, n in layout
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sorted(
        (r.seq_id, list(r.tokens)) for r in emit_packed(df, budget=budget).collect()
    )
    stream = [t for _, text in sorted(rows) for t in text.split()]
    got = [t for _, toks in out for t in toks]
    assert got == stream
    if stream:
        assert [s for s, _ in out] == list(range(len(out)))
        for _, toks in out[:-1]:
            assert len(toks) == budget
        assert 0 < len(out[-1][1]) <= budget
    else:
        assert out == []


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.integers(-(2**62), 2**62), min_size=1, max_size=200, unique=True
    )
)
def test_with_global_index_dense_rank_property(spark, vals):
    """For ANY set of long keys — including magnitudes beyond double's
    exact range and constant-like tight clusters — the index is the
    dense 0..n-1 rank of the sorted order and no row is lost."""
    from smartpipeline_spark.operators.scale import with_global_index

    df = spark.createDataFrame([(v,) for v in vals], "k long").repartition(4)
    got = {r.k: r.row_idx for r in with_global_index(df, "k").collect()}
    assert got == {v: i for i, v in enumerate(sorted(vals))}


@settings(**_SETTINGS)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("ab é"), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=15,
    )
)
def test_exact_dedup_partition_property(spark, texts):
    """Exact dedup partitions the corpus: every doc lands in exactly
    one group, group sizes sum to the corpus, and two docs share a
    group iff their normalized text is equal."""
    import re

    from smartpipeline_spark.functions.dedup import ext_dedup_exact
    from smartpipeline_spark.functions import EXT_QUERIES  # noqa: F401

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.createOrReplaceTempView("documents")
    # drive the library shape directly (no sf_dir table read)
    from pyspark.sql import functions as F
    from smartpipeline_spark.functions.dedup import _norm_text

    out = (
        df.select("doc_id", F.md5(_norm_text()).alias("fp"))
        .groupBy("fp")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
        .collect()
    )
    assert sum(r.n_copies for r in out) == len(rows)
    norm = {i: re.sub(r"\s+", " ", t.lower().strip()) for i, t in rows}
    assert len(out) == len(set(norm.values()))
    keepers = {r.keep_id for r in out}
    assert keepers == {
        min(i for i in norm if norm[i] == v) for v in set(norm.values())
    }


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=12).map(
            lambda ws: " ".join(ws)
        ),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.1, 0.3, 0.6]),
)
def test_jaccard_pairs_matches_python_reference(spark, docs, threshold):
    """The inverted-index join must agree with a direct O(n^2) Python
    computation of word-trigram Jaccard on ANY corpus (repeated words,
    empty docs, tiny vocab maximizing shingle collisions)."""
    from smartpipeline_spark.functions.dedup import jaccard_pairs

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d1, r.d2): r.jaccard
        for r in jaccard_pairs(df, threshold=threshold, max_df=None).collect()
    }

    def shingles(t):
        ws = t.split()
        return {" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)}

    want = {}
    for i, ti in rows:
        for j, tj in rows:
            if i >= j:
                continue
            a, b = shingles(ti), shingles(tj)
            if not a or not b:
                continue
            jac = len(a & b) / len(a | b)
            if jac >= threshold:
                import math

                want[(i, j)] = math.floor(jac * 10000.0 + 0.5) / 10000.0
    assert got == want


@settings(**_SETTINGS)
@given(
    fact_keys=st.lists(st.integers(0, 5), min_size=0, max_size=60),
    dim_keys=st.lists(st.integers(0, 5), min_size=0, max_size=6, unique=True),
    how=st.sampled_from(["inner", "left", "left_semi", "left_anti"]),
)
def test_salted_join_equals_plain_join(spark, fact_keys, dim_keys, how):
    """For every allowed join type, salting must be invisible in the
    result — including hot keys (the whole point), empty sides, and
    unmatched rows on either side."""
    from smartpipeline_spark.operators.scale import salted_join

    fact = spark.createDataFrame(
        [(k, i) for i, k in enumerate(fact_keys)], "k long, fid long"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in dim_keys], "k long, w string")
    got = sorted(tuple(r) for r in salted_join(fact, dim, "k", how=how).collect())
    want = sorted(tuple(r) for r in fact.join(dim, "k", how).collect())
    assert got == want


def _brute_duplicate_spans(texts: dict[int, str], k: int) -> set[tuple]:
    """O(n²) reference for ExactSubstr span detection: enumerate every
    word k-gram with its position, mark grams occurring >= 2 times
    corpus-wide, merge marked windows per doc when starts are within
    k of the previous (fixed-length interval islands)."""
    occ: dict[str, list[tuple[int, int]]] = {}
    for d, t in texts.items():
        w = t.lower().strip().split()
        for i in range(len(w) - k + 1):
            occ.setdefault(" ".join(w[i : i + k]), []).append((d, i + 1))
    marked: dict[int, list[int]] = {}
    for g, places in occ.items():
        if len(places) >= 2:
            for d, p in places:
                marked.setdefault(d, []).append(p)
    spans = set()
    for d, ps in marked.items():
        ps = sorted(set(ps))
        start = prev = ps[0]
        for p in ps[1:]:
            if p - prev <= k:
                prev = p
            else:
                spans.add((d, start, prev + k - 1))
                start = prev = p
        spans.add((d, start, prev + k - 1))
    return spans


@settings(**_SETTINGS)
@given(
    docs=st.lists(
        st.lists(st.sampled_from("abc"), min_size=1, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    k=st.sampled_from([2, 3]),
)
def test_substring_spans_match_brute_force_property(spark, docs, k):
    """For ANY corpus over a tiny vocabulary (maximally collision- and
    overlap-prone) the distributed span detector equals the O(n²)
    reference exactly — positions, merging, and all."""
    from smartpipeline_spark.functions.dedup import duplicate_spans

    texts = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, k=k).collect()
    }
    assert got == _brute_duplicate_spans(texts, k)


@settings(**_SETTINGS)
@given(
    a_iv=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(0, 20_000)),
        min_size=1,
        max_size=20,
    ),
    b_iv=st.lists(
        st.tuples(st.integers(0, 50_000), st.integers(1, 20_000)),
        min_size=1,
        max_size=20,
    ),
    bin_s=st.sampled_from([60, 3600, 7200]),
)
def test_binned_interval_join_property(spark, a_iv, b_iv, bin_s):
    """For ANY interval sets and bin width — spans from sub-bin to
    many-bin, boundary-touching, zero-length closed a-spans — the bin
    equi-join emits exactly the naive range join's pairs, each once.
    (b intervals are half-open so they get length >= 1s.)"""
    from smartpipeline_spark.operators.scale import binned_interval_join

    base = "2024-01-01 00:00:00"
    a = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(a_iv)],
        "a_id int, s long, e long",
    ).selectExpr(
        "a_id",
        f"timestampadd(SECOND, s, timestamp'{base}') AS a_start",
        f"timestampadd(SECOND, e, timestamp'{base}') AS a_end",
    )
    b = spark.createDataFrame(
        [(i, s, s + d) for i, (s, d) in enumerate(b_iv)],
        "b_id int, s long, e long",
    ).selectExpr(
        "b_id",
        f"timestampadd(SECOND, s, timestamp'{base}') AS b_start",
        f"timestampadd(SECOND, e, timestamp'{base}') AS b_end",
    )
    naive = {
        (r.a_id, r.b_id)
        for r in a.join(b, (a.a_start < b.b_end) & (b.b_start <= a.a_end)).collect()
    }
    got = [
        (r.a_id, r.b_id)
        for r in binned_interval_join(a, b, bin_seconds=bin_s).collect()
    ]
    assert len(got) == len(set(got))
    assert set(got) == naive


@settings(**_SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, width=32),
        min_size=4,
        max_size=300,
    ),
    n_groups=st.sampled_from([1, 3, 7]),
    b=st.sampled_from([16, 64]),
)
def test_quantile_sketch_rank_error_property(spark, vals, n_groups, b):
    """For ANY value distribution (adversarial floats included), any
    fine-grain partitioning, and any grid size: merging per-group
    quantile rollups to the global grain stays within the documented
    rank-error bound of the exact sorted answer."""
    import bisect

    from smartpipeline_spark.operators.scale import quantile_merge, quantile_rollup

    rows = [(i % n_groups, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g int, v double")
    probs = [0.25, 0.5, 0.9]
    merged = {
        r.prob: r.est
        for r in quantile_merge(quantile_rollup(df, ["g"], "v", b), [], probs).collect()
    }
    svals = sorted(v for _, v in rows)
    n = len(svals)
    bound = 1.0 / (b - 1) + 0.02
    for p in probs:
        est = merged[p]
        # rank window of the estimate (ties give a range)
        lo = bisect.bisect_left(svals, est) / n
        hi = bisect.bisect_right(svals, est) / n
        dist = 0.0 if lo - bound <= p <= hi + bound else min(abs(lo - p), abs(hi - p))
        assert dist <= bound, (p, est, lo, hi)


@settings(max_examples=50, deadline=None)
@given(
    data=st.binary(min_size=0, max_size=20_000),
    bits=st.sampled_from([4, 6, 8]),
)
def test_cdc_offsets_partition_the_bytes_exactly(data, bits):
    """For ANY byte string and mask width: CDC chunk offsets tile the
    input exactly — contiguous, non-overlapping, full coverage — and
    every chunk except possibly the last is within [min_size,
    max_size] (pure-python kernel, no Spark job per example)."""
    from smartpipeline_spark.functions.dedup import (
        _CDC_MAX,
        _CDC_MIN,
        cdc_chunk_offsets,
    )

    chunks = cdc_chunk_offsets(data, bits=bits)
    pos = 0
    for i, (off, ln) in enumerate(chunks):
        assert off == pos, "gap or overlap at chunk boundary"
        assert ln >= 1
        assert ln <= _CDC_MAX
        if i < len(chunks) - 1:
            assert ln >= _CDC_MIN
        pos = off + ln
    assert pos == len(data)
    assert (len(chunks) == 0) == (len(data) == 0)


@settings(max_examples=30, deadline=None)
@given(
    datas=st.lists(st.binary(min_size=0, max_size=4_000), max_size=8),
    bits=st.sampled_from([4, 8, 12]),
)
def test_cdc_vectorized_batch_equals_scalar_under_hypothesis(datas, bits):
    """For ANY batch of byte strings: the numpy batch kernel emits
    byte-identical chunk lists to the pure-python reference — the
    reset-free windowed-hash equivalence holds at every doc boundary
    and mask width (the doc-concat contamination window and the
    min-size eligibility rule are exactly complementary)."""
    from smartpipeline_spark.functions.dedup import (
        _cdc_offsets_batch,
        cdc_chunk_offsets,
    )

    want = [cdc_chunk_offsets(d, bits=bits) for d in datas]
    assert _cdc_offsets_batch(datas, bits=bits) == want
