"""Curation operators: hash split, PII redaction, chunk dedup.

The driver-facing query twins (ext_split/ext_redact/ext_chunk_dedup)
are DuckDB-oracled via scripts/check_oracles.py; these tests exercise
the library API on constructed inputs where the expected answer is
known exactly.
"""

from pyspark.sql import functions as F

from smartpipeline_spark.functions.curation import (
    assign_split,
    dedup_chunks,
    redact_pii,
)

from conftest import SF_SMOKE


def test_assign_split_deterministic_and_stratified(spark):
    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = assign_split(df).select("doc_id", "bucket", "split")
    a = {r.doc_id: (r.bucket, r.split) for r in out.collect()}
    b = {r.doc_id: (r.bucket, r.split) for r in assign_split(df).collect()}
    assert a == b  # rerun-stable
    # adding rows never reassigns existing keys
    bigger = assign_split(spark.range(4000).withColumnRenamed("id", "doc_id"))
    c = {r.doc_id: (r.bucket, r.split) for r in bigger.collect()}
    assert all(c[k] == v for k, v in a.items())
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    n = sum(counts.values())
    assert n == 2000
    # md5 buckets are uniform-ish: 80/10/10 within a few points at n=2000
    assert 0.75 < counts["train"] / n < 0.85
    assert 0.06 < counts["val"] / n < 0.14
    assert 0.06 < counts["test"] / n < 0.14


def test_assign_split_custom_fractions(spark):
    df = spark.range(500).withColumnRenamed("id", "doc_id")
    out = assign_split(df, fractions=(98, 1))
    counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
    assert counts["train"] > 450
    assert set(counts) <= {"train", "val", "test"}


def test_redact_pii_scrubs_and_counts(spark):
    rows = [
        {"id": 1, "text": "mail a.b@x.io and c@y.org now"},
        {"id": 2, "text": "see https://a.io/p?q=1 or http://b.co"},
        {"id": 3, "text": "call +1-555-0199 twice +1-555-0200"},
        {"id": 4, "text": "nothing sensitive here"},
    ]
    out = {
        r.id: r
        for r in redact_pii(spark.createDataFrame(rows), "text").collect()
    }
    assert out[1].n_email == 2 and "@" not in out[1].clean
    assert out[1].clean == "mail <EMAIL> and <EMAIL> now"
    assert out[2].n_url == 2 and "http" not in out[2].clean
    assert out[3].n_phone == 2 and "555" not in out[3].clean
    assert out[4].clean == "nothing sensitive here"
    assert (out[4].n_email, out[4].n_url, out[4].n_phone) == (0, 0, 0)


def test_dedup_chunks_keep_first_semantics(spark):
    ten = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    other = "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"
    rows = [
        {"doc_id": 0, "text": f"{ten} {other}"},   # first owner of both
        {"doc_id": 1, "text": f"{ten} {ten}"},     # all chunks seen at doc 0
        {"doc_id": 2, "text": other},              # dup of doc 0's 2nd chunk
        {"doc_id": 3, "text": "unique tail"},      # short doc -> 1 chunk
    ]
    out = {
        r.doc_id: r
        for r in dedup_chunks(spark.createDataFrame(rows)).collect()
    }
    assert (out[0].n_chunks, out[0].n_kept, out[0].n_dup) == (2, 2, 0)
    assert (out[1].n_chunks, out[1].n_kept, out[1].n_dup) == (2, 0, 2)
    assert (out[2].n_chunks, out[2].n_kept, out[2].n_dup) == (1, 0, 1)
    assert (out[3].n_chunks, out[3].n_kept, out[3].n_dup) == (1, 1, 0)


def test_dedup_chunks_invariants_on_corpus(spark):
    from smartpipeline_spark import sources

    d = sources.table(spark, "documents", SF_SMOKE)
    out = dedup_chunks(d)
    agg = out.agg(
        F.sum("n_chunks").alias("chunks"),
        F.sum("n_kept").alias("kept"),
        F.min(F.col("n_kept") <= F.col("n_chunks")).alias("bounded"),
    ).collect()[0]
    assert agg.bounded is True
    # kept == number of distinct chunk fingerprints in the corpus
    n_distinct = (
        d.select(
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(ceil(size(split(trim(text), '\\\\s+'))/10.0))-1), "
                    "i -> array_join(slice(split(trim(text), '\\\\s+'), i*10+1, 10), ' '))"
                )
            ).alias("pos", "chunk")
        )
        .select("chunk")
        .distinct()
        .count()
    )
    assert agg.kept == n_distinct


def test_connected_components_known_graph(spark):
    from smartpipeline_spark.functions.dedup import connected_components

    # components: {1,2,3,4} (chain), {10,11} (pair), {20,21,22} (star on 20)
    pairs = spark.createDataFrame(
        [(2, 1), (2, 3), (3, 4), (10, 11), (20, 21), (20, 22)],
        "d1 bigint, d2 bigint",
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain_converges(spark):
    from smartpipeline_spark.functions.dedup import connected_components

    # a 12-node path needs multiple propagation rounds end to end
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(11)], "d1 bigint, d2 bigint"
    )
    got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(12)}


def test_bigram_lm_scores_orders_fluency(spark):
    from smartpipeline_spark.functions.curation import bigram_lm_scores

    # "a b" appears 3x in the corpus; "x q" once: doc 10 (common bigrams)
    # must outscore doc 11 (one rare bigram)
    rows = [
        {"doc_id": 0, "text": "a b c"},
        {"doc_id": 1, "text": "a b d"},
        {"doc_id": 10, "text": "a b"},
        {"doc_id": 11, "text": "x q"},
    ]
    out = {r.doc_id: r for r in bigram_lm_scores(spark.createDataFrame(rows)).collect()}
    assert out[10].n_bigrams == 1 and out[11].n_bigrams == 1
    assert out[10].avg_logprob > out[11].avg_logprob
    # single-word doc produces no bigrams -> absent from output
    one = bigram_lm_scores(
        spark.createDataFrame([{"doc_id": 5, "text": "solo"}])
    ).count()
    assert one == 0


def test_connected_components_matches_union_find(spark):
    """Property check vs a pure-Python union-find on pseudo-random
    graphs (fixed seeds — deterministic)."""
    import random

    for seed in (7, 23, 99):
        rng = random.Random(seed)
        n_nodes, n_edges = 30, 25
        edges = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n_nodes))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        want = {x: find(x) for x in sorted(touched)}

        from smartpipeline_spark.functions.dedup import connected_components

        pairs = spark.createDataFrame(edges, "d1 bigint, d2 bigint")
        got = {r.id: r.cluster_id for r in connected_components(pairs).collect()}
        assert got == want, f"seed {seed}"


def test_stratified_sample_balances_and_is_rerun_stable(spark):
    from smartpipeline_spark.functions.curation import stratified_sample

    df = spark.createDataFrame(
        [{"doc_id": i, "lang": "en" if i % 10 < 8 else ("de" if i % 2 == 0 else "fr")}
         for i in range(3000)]
    )
    kept = stratified_sample(df).select("doc_id", "lang")
    a = sorted(r.doc_id for r in kept.collect())
    b = sorted(r.doc_id for r in stratified_sample(df).select("doc_id").collect())
    assert a == b  # rerun-stable
    counts = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    mins = min(
        r["count"] for r in df.groupBy("lang").count().collect()
    )
    # every stratum thinned to ~min stratum size (md5 buckets are
    # uniform, not exact — allow 25% slack at n=3000)
    for lang, n in counts.items():
        assert n <= mins * 1.25, (lang, n, mins)
        assert n >= mins * 0.6, (lang, n, mins)
    # smallest stratum keeps (nearly) everything: keep_lt = 10000
    assert counts["de"] >= mins * 0.95


def test_quality_gate_keeps_top_half_per_stratum(spark):
    from smartpipeline_spark.functions.curation import quality_gate

    df = spark.createDataFrame(
        [{"doc_id": i, "lang": "en" if i % 2 == 0 else "de", "n_chars": (i * 37) % 1000}
         for i in range(1000)]
    )
    kept = quality_gate(df, metric_col="n_chars", stratum_col="lang")
    rows = kept.collect()
    assert all(r.n_chars >= r.gate for r in rows)
    n_by = {r.lang: r["count"] for r in kept.groupBy("lang").count().collect()}
    tot = {r.lang: r["count"] for r in df.groupBy("lang").count().collect()}
    for lang in tot:
        frac = n_by[lang] / tot[lang]
        assert 0.45 <= frac <= 0.55, (lang, frac)


def test_contamination_report_flags_overlap_only(spark):
    from smartpipeline_spark.functions.curation import contamination_report

    corpus = spark.createDataFrame([
        {"doc_id": 1, "text": "the quick brown fox jumps over the lazy dog"},
        {"doc_id": 2, "text": "completely unrelated sentence with different words entirely here"},
        {"doc_id": 3, "text": "another copy the quick brown fox jumps over again"},
    ])
    bench = spark.createDataFrame([
        {"doc_id": 100, "text": "quiz answer the quick brown fox jumps over everything"},
    ])
    rows = {r.doc_id: (r.n_shared_shingles, r.n_bench_docs)
            for r in contamination_report(corpus, bench, n=5).collect()}
    assert set(rows) == {1, 3}  # doc 2 shares no 5-gram
    assert rows[1][1] == 1 and rows[3][1] == 1
    assert rows[1][0] >= 2  # "the quick brown fox jumps" + "quick brown fox jumps over"


def test_repetition_metrics_gates_spam(spark):
    from smartpipeline_spark.functions.curation import repetition_metrics

    spam = " ".join(["buy now"] * 30)            # one 3-gram pattern repeated
    clean = "a decent document with mostly distinct words and varied phrasing throughout"
    df = spark.createDataFrame([
        {"doc_id": 1, "text": spam},
        {"doc_id": 2, "text": clean},
        {"doc_id": 3, "text": ""},
    ])
    m = {r.doc_id: r for r in repetition_metrics(df).collect()}
    assert m[1].dup3_frac > 0.9 and m[1].top_word_frac >= 0.5 and not m[1].keep
    assert m[2].dup3_frac == 0.0 and m[2].keep
    assert m[3].dup3_frac == 0.0  # empty doc: no 3-grams, no crash


def test_stratified_sample_subset_property_random_strata(spark):
    """Property (randomized strata shapes): sampling a corpus and then
    sampling the same corpus with MORE rows appended must agree on
    every original key's keep-decision whenever its stratum's
    keep-threshold did not tighten — and the kept set is always a
    subset of the input. Uses driver-side randomization over stratum
    layouts rather than hypothesis (a Spark job per example is too
    slow for shrinking); seeds are fixed for reproducibility."""
    import random as _rnd

    from smartpipeline_spark.functions.curation import stratified_sample

    rnd = _rnd.Random(7)
    for trial in range(3):
        n_strata = rnd.randint(2, 5)
        weights = [rnd.randint(1, 10) for _ in range(n_strata)]
        rows = []
        doc_id = 0
        for s, w in enumerate(weights):
            for _ in range(w * 100):
                rows.append({"doc_id": doc_id, "lang": f"s{s}"})
                doc_id += 1
        df = spark.createDataFrame(rows)
        kept = stratified_sample(df)
        kept_ids = {r.doc_id for r in kept.select("doc_id").collect()}
        assert kept_ids <= set(range(doc_id))
        # determinism across evaluations of the same frame
        again = {r.doc_id for r in stratified_sample(df).select("doc_id").collect()}
        assert kept_ids == again, trial
        # the smallest stratum is never thinned (keep_lt = 10000)
        smallest = weights.index(min(weights))
        small_ids = {r["doc_id"] for r in rows if r["lang"] == f"s{smallest}"}
        assert small_ids <= kept_ids, trial


def test_pack_sequences_matches_naive_cumsum_and_invariants(spark):
    from pyspark.sql.window import Window

    from smartpipeline_spark.functions.curation import pack_sequences

    # adversarial id layout: sparse ids crossing bucket boundaries,
    # empty docs, a doc longer than the whole budget
    rows = [
        (i, " ".join(["w"] * n))
        for i, n in [
            (0, 3), (7, 0), (1023, 5), (1024, 700), (1025, 1),
            (5000, 12), (99999, 250), (100000, 250), (123456, 9),
        ]
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, budget=512, bucket_span=1024)
    got = {r.doc_id: r.asDict() for r in out.collect()}

    # naive single-window reference
    toks = {i: (len(t.split()) if t.strip() else 0) for i, t in rows}
    start, ref = 0, {}
    for i in sorted(toks):
        n = toks[i]
        seq = start // 512
        ref[i] = (n, start, seq, (start + max(n, 1) - 1) // 512 > seq)
        start += n
    for i, (n, s, q, st) in ref.items():
        r = got[i]
        assert (r["tokens"], r["start_off"], r["seq_id"], r["straddles"]) == (
            n, s, q, st,
        ), i

    # invariants: offsets tile the stream exactly; stream length conserved
    assert sum(toks.values()) == max(s + n for i, (n, s, _, _) in ref.items())
    # the 700-token doc must straddle (longer than one 512 sequence)
    assert got[1024]["straddles"] is True
    # decomposition insensitive to bucket_span
    alt = {
        r.doc_id: r.asDict()
        for r in pack_sequences(df, budget=512, bucket_span=17).collect()
    }
    assert alt == got


def test_emit_packed_reconstructs_the_token_stream(spark):
    """The trainer contract: concatenating the emitted sequences in
    seq_id order reproduces the corpus token stream in doc_id order
    exactly, and every sequence is exactly `budget` long except the
    last."""
    from smartpipeline_spark.functions.curation import emit_packed

    # distinct tokens per doc so reconstruction errors can't cancel;
    # same adversarial layout as the placement test (sparse ids across
    # bucket boundaries, empty docs, a doc longer than the budget)
    layout = [
        (0, 3), (7, 0), (1023, 5), (1024, 700), (1025, 1),
        (5000, 12), (99999, 250), (100000, 250), (123456, 9),
    ]
    rows = [
        (i, " ".join(f"d{i}t{j}" for j in range(n))) for i, n in layout
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    budget = 512
    out = sorted(
        (r.seq_id, r.tokens, r.n_tokens)
        for r in emit_packed(df, budget=budget).collect()
    )
    stream = [t for _, text in sorted(rows) for t in text.split()]
    n_seqs = -(-len(stream) // budget)
    assert [s for s, _, _ in out] == list(range(n_seqs))
    # every sequence full except the last
    for s, toks, n in out[:-1]:
        assert n == len(toks) == budget, s
    assert out[-1][2] == len(out[-1][1]) == len(stream) - (n_seqs - 1) * budget
    # exact stream reconstruction
    assert [t for _, toks, _ in out for t in toks] == stream
    # decomposition insensitive to bucket_span
    alt = sorted(
        (r.seq_id, r.tokens, r.n_tokens)
        for r in emit_packed(df, budget=budget, bucket_span=17).collect()
    )
    assert alt == out


def test_canonicalize_url_collapses_crawl_variants(spark):
    from smartpipeline_spark.functions.curation import canonicalize_url, url_domain

    variants = [
        "https://www.Example.com/A/b?utm_source=x",
        "http://example.com/A/b#section",
        "HTTPS://EXAMPLE.COM/a/B/",
        "example.com/a/b",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    out = df.select(
        canonicalize_url(F.col("url")).alias("c"),
    ).collect()
    assert {r.c for r in out} == {"example.com/a/b"}
    dom = df.select(url_domain(canonicalize_url(F.col("url"))).alias("d")).collect()
    assert {r.d for r in dom} == {"example.com"}


def test_mixture_sample_hits_target_proportions(spark):
    from smartpipeline_spark.functions.curation import (
        mixture_sample,
        stratified_sample,
    )

    rows = [
        {"doc_id": i, "source": f"s{i % 4}"} for i in range(8000)
    ]
    df = spark.createDataFrame(rows)
    out = mixture_sample(df, {"s0": 4.0, "s1": 2.0, "s2": 1.0}, "source")
    counts = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    assert "s3" not in counts  # unweighted stratum dropped
    # binding stratum (largest weight) kept whole; others to ratio
    assert counts["s0"] == 2000
    assert abs(counts["s1"] - 1000) < 80 and abs(counts["s2"] - 500) < 60
    # rerun-stable
    again = {r.source: r["count"] for r in
             mixture_sample(df, {"s0": 4.0, "s1": 2.0, "s2": 1.0}, "source")
             .groupBy("source").count().collect()}
    assert counts == again
    # equal weights degenerate to stratified balancing (same keep set)
    eq = mixture_sample(df, {f"s{i}": 1.0 for i in range(4)}, "source")
    strat = stratified_sample(df, "source")
    assert {r.doc_id for r in eq.collect()} == {r.doc_id for r in strat.collect()}


def test_export_dataset_manifest_attests_to_disk_content(spark, tmp_path):
    import json

    from smartpipeline_spark.functions.curation import assign_split, export_dataset

    df = assign_split(
        spark.createDataFrame(
            [(i, f"doc {i}") for i in range(300)], "doc_id long, text string"
        )
    ).select("doc_id", "text", "split")
    out = str(tmp_path / "dataset")
    man = export_dataset(df, out)

    disk = json.load(open(out + "/_manifest.json"))
    assert disk == man
    # the manifest must NOT break later reads of the dataset root
    assert spark.read.parquet(out).count() == 300
    assert sum(s["rows"] for s in man["splits"].values()) == 300
    assert set(man["splits"]) <= {"train", "val", "test"}
    # fingerprint is order-insensitive: re-export shuffled rows -> same
    man2 = export_dataset(df.repartition(7), str(tmp_path / "d2"))
    assert {k: v["fingerprint"] for k, v in man2["splits"].items()} == {
        k: v["fingerprint"] for k, v in man["splits"].items()
    }
    # ...but content-sensitive: a changed row flips its split's print
    tweaked = df.withColumn(
        "text", F.when(F.col("doc_id") == 5, F.lit("EDITED")).otherwise(F.col("text"))
    )
    man3 = export_dataset(tweaked, str(tmp_path / "d3"))
    assert man3["splits"] != man["splits"]
    # split partition dirs exist (directory-prune layout)
    import glob

    assert glob.glob(out + "/split=*")


def test_deterministic_shuffle_is_seeded_permutation(spark):
    from smartpipeline_spark.functions.curation import deterministic_shuffle

    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = [r.doc_id for r in deterministic_shuffle(df, seed=1, num_shards=8).collect()]
    b = [r.doc_id for r in deterministic_shuffle(df, seed=1, num_shards=8).collect()]
    c = [r.doc_id for r in deterministic_shuffle(df, seed=2, num_shards=8).collect()]
    assert a == b                      # rerun-stable per seed
    assert a != c                      # new seed, new permutation
    assert sorted(a) == sorted(c) == list(range(2000))  # lossless
    assert a != list(range(2000))      # actually shuffled
    # output schema is the input schema (no internal columns leak)
    out = deterministic_shuffle(df, seed=1, num_shards=8)
    assert out.columns == ["doc_id"]
    # shard-order read == global hash order (layout contract)
    ordered = [
        r.doc_id
        for r in out.withColumn(
            "h", F.xxhash64(F.col("doc_id").cast("string"), F.lit(1))
        ).orderBy("h").collect()
    ]
    assert a == ordered


def test_chunk_documents_windows_tile_with_overlap(spark):
    from smartpipeline_spark.functions.curation import chunk_documents

    text = " ".join(f"w{i}" for i in range(130))  # 130 words
    df = spark.createDataFrame(
        [(1, text), (2, "short doc"), (3, "   ")], "doc_id long, text string"
    )
    out = chunk_documents(df, chunk_words=50, stride=40).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 3 not in by_doc  # blank doc yields nothing
    assert [r.n_chunk_words for r in sorted(by_doc[2], key=lambda r: r.chunk_id)] == [2]
    c1 = sorted(by_doc[1], key=lambda r: r.chunk_id)
    # ceil((130-50)/40)+1 = 3 chunks; starts 0,40,80; last truncated
    assert [r.n_chunk_words for r in c1] == [50, 50, 50]
    assert c1[0].chunk.split()[:2] == ["w0", "w1"]
    assert c1[1].chunk.split()[0] == "w40"       # 10-word overlap
    assert c1[0].chunk.split()[-1] == "w49"
    assert c1[2].chunk.split()[-1] == "w129"     # full coverage


def test_chunk_documents_rejects_gapped_stride(spark):
    import pytest

    from smartpipeline_spark.functions.curation import chunk_documents

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(df, chunk_words=10, stride=40)


def test_contamination_bloom_equals_broadcast_path(spark):
    """The Bloom variant must return EXACTLY the broadcast result —
    fpp trades probe traffic, never answers. Checked at two fpp
    settings (a loose filter only sends more rows into the exact
    verify)."""
    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.curation import (
        assign_split,
        contamination_report,
        contamination_report_bloom,
    )
    from tests.conftest import SF_SMOKE

    d = sources.table(spark, "documents", SF_SMOKE)
    s = assign_split(d)
    train = s.filter("split != 'test'").select("doc_id", "text")
    test = s.filter("split = 'test'").select("doc_id", "text")
    exact = {
        (r.doc_id, r.n_shared_shingles, r.n_bench_docs)
        for r in contamination_report(train, test, n=5).collect()
    }
    assert exact  # fixture actually contains contamination
    for fpp in (0.01, 0.5):
        bloom = {
            (r.doc_id, r.n_shared_shingles, r.n_bench_docs)
            for r in contamination_report_bloom(train, test, n=5, fpp=fpp).collect()
        }
        assert bloom == exact, fpp


def test_contamination_bloom_empty_benchmark(spark):
    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.curation import contamination_report_bloom
    from tests.conftest import SF_SMOKE

    d = sources.table(spark, "documents", SF_SMOKE).select("doc_id", "text")
    empty = d.limit(0)
    assert contamination_report_bloom(d.limit(50), empty).count() == 0


# ---------------------------------------------------- DSIR selection


def test_dsir_selects_target_like_documents(spark):
    """Importance resampling must prefer raw documents whose hashed
    n-gram profile matches the target distribution: with a physics
    target, physics-flavored raw docs should dominate the selection
    over the cooking majority."""
    from smartpipeline_spark.functions.curation import dsir_select

    phys = "quantum wave function collapse entangled photon spin measurement"
    cook = "simmer the onion garlic butter sauce until golden then season"
    raw = spark.createDataFrame(
        [{"doc_id": i, "text": (phys if i < 5 else cook) + f" doc{i}"}
         for i in range(25)]
    )
    target = spark.createDataFrame(
        [{"doc_id": 100 + i,
          "text": "photon spin entangled measurement quantum collapse"}
         for i in range(4)]
    )
    picked = {r["doc_id"] for r in dsir_select(raw, target, frac=0.2).collect()}
    phys_ids = set(range(5))
    # at least 4 of the ~5 selected must be physics docs
    assert len(picked & phys_ids) >= 4, picked


def test_dsir_scores_are_rerun_stable(spark):
    """Scoring twice (fresh fit included) must give identical rows —
    the seeded-Gumbel / md5-bucket determinism contract."""
    from smartpipeline_spark.functions.curation import (
        dsir_logratio,
        dsir_scores,
    )

    raw = spark.createDataFrame(
        [{"doc_id": i, "text": f"alpha beta gamma delta doc{i}"}
         for i in range(10)]
    )
    target = raw.limit(3)
    a = sorted(map(tuple, dsir_scores(raw, dsir_logratio(raw, target)).collect()))
    b = sorted(map(tuple, dsir_scores(raw, dsir_logratio(raw, target)).collect()))
    assert a == b and len(a) == 10


def test_dsir_empty_raw_is_safe(spark):
    """Degenerate input guard: an empty raw pool fits an empty model
    and scores to an empty frame instead of raising on map literals."""
    from smartpipeline_spark.functions.curation import (
        dsir_logratio,
        dsir_scores,
    )

    raw = spark.createDataFrame([], "doc_id long, text string")
    target = spark.createDataFrame([{"doc_id": 1, "text": "a b c"}])
    lr = dsir_logratio(raw, target)
    assert lr == {}
    assert dsir_scores(raw, lr).count() == 0


def test_export_tar_shards_deterministic_and_bit_exact(spark, tmp_path):
    """The tar-shard sink must (a) write back-readable, bit-exact
    member bytes for string AND binary columns, (b) skip NULL members,
    (c) produce BYTE-identical shards (same sha256) on a rerun, and
    (d) report stats that match the bytes actually on disk."""
    import hashlib
    import tarfile

    from smartpipeline_spark.functions.curation import export_tar_shards

    rows = [
        {"doc_id": 1, "text": "alpha doc", "payload": b"\x00\x01\xffbin"},
        {"doc_id": 2, "text": "beta doc", "payload": None},
        {"doc_id": 3, "text": None, "payload": b"only-binary"},
        {"doc_id": 4, "text": "delta éè", "payload": b""},
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    p1, p2 = str(tmp_path / "run1"), str(tmp_path / "run2")
    members = {"text": "txt", "payload": "bin"}
    s1 = {
        r.shard: r
        for r in export_tar_shards(df, p1, members, num_shards=2).collect()
    }
    s2 = {
        r.shard: r
        for r in export_tar_shards(df, p2, members, num_shards=2).collect()
    }
    assert set(s1) == set(s2)
    got = {}
    total_payload = 0
    for sid, st in s1.items():
        assert st.sha256 == s2[sid].sha256  # rerun byte-determinism
        shard_file = f"{p1}/shard-{sid:05d}.tar"
        blob = open(shard_file, "rb").read()
        assert hashlib.sha256(blob).hexdigest() == st.sha256  # attested
        with tarfile.open(shard_file) as tar:
            for m in tar.getmembers():
                assert m.mtime == 0 and m.uid == 0  # normalized headers
                got[m.name] = tar.extractfile(m).read()
        total_payload += st.payload_bytes
    assert got["1.txt"] == b"alpha doc"
    assert got["1.bin"] == b"\x00\x01\xffbin"
    assert got["4.txt"] == "delta éè".encode("utf-8")
    assert got["3.bin"] == b"only-binary"
    assert "2.bin" not in got and "3.txt" not in got  # NULLs skipped
    assert got["4.bin"] == b""  # empty binary is a member, not a NULL
    assert total_payload == sum(len(b) for b in got.values())
    assert sum(st.n_samples for st in s1.values()) == 4


def test_read_tar_shards_roundtrip(spark, tmp_path):
    """Distributed read-back: read_tar_shards over an export_tar_shards
    directory recovers every member bit-exactly, keyed and typed."""
    from pyspark.sql import functions as F

    from smartpipeline_spark.functions.curation import (
        export_tar_shards,
        read_tar_shards,
    )

    rows = [
        {"doc_id": i, "text": f"doc number {i} body", "payload": bytes([i, 255 - i])}
        for i in range(20)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, payload binary")
    out = str(tmp_path / "shards")
    stats = export_tar_shards(
        df, out, {"text": "txt", "payload": "bin"}, num_shards=4
    ).collect()
    back = read_tar_shards(spark, out)
    got = {(r.key, r.ext): (r.shard, bytes(r.data)) for r in back.collect()}
    assert len(got) == 40  # 20 docs x 2 members
    for row in rows:
        k = str(row["doc_id"])
        assert got[(k, "txt")][1] == row["text"].encode()
        assert got[(k, "bin")][1] == row["payload"]
    # shard labels parsed from filenames agree with the export stats
    per_shard = back.groupBy("shard").agg(F.count("*").alias("n")).collect()
    assert {r.shard: r.n for r in per_shard} == {
        s.shard: s.n_samples * 2 for s in stats
    }


def test_export_tar_shards_append_stable(spark, tmp_path):
    """The md5-bucket contract: exporting a SUPERSET corpus never
    moves an existing key to a different shard, and the original
    keys' member bytes are identical in the superset's shards."""
    import tarfile

    from smartpipeline_spark.functions.curation import export_tar_shards

    base = [{"doc_id": i, "text": f"body {i}"} for i in range(30)]
    more = base + [{"doc_id": 100 + i, "text": f"late arrival {i}"} for i in range(10)]
    p1, p2 = str(tmp_path / "base"), str(tmp_path / "more")
    df1 = spark.createDataFrame(base, "doc_id long, text string")
    df2 = spark.createDataFrame(more, "doc_id long, text string")
    export_tar_shards(df1, p1, {"text": "txt"}, num_shards=4).collect()
    export_tar_shards(df2, p2, {"text": "txt"}, num_shards=4).collect()

    def members(path):
        out = {}
        import glob

        for f in sorted(glob.glob(f"{path}/shard-*.tar")):
            sid = int(f.rsplit("-", 1)[1].split(".")[0])
            with tarfile.open(f) as tar:
                for m in tar.getmembers():
                    out[m.name] = (sid, tar.extractfile(m).read())
        return out

    m1, m2 = members(p1), members(p2)
    for name, (sid, data) in m1.items():
        assert m2[name] == (sid, data)  # same shard, same bytes
    assert len(m2) == len(m1) + 10


def test_unimax_waterfill_matches_hand_computed_allocation(spark):
    """Analytic UniMax case (Chung et al. 2023): supplies 100/400/2000
    tokens, epoch cap 2 -> caps [200, 800, 4000]. At B=2500 the
    waterfill caps a and b (whole supply x2) and hands c the residual
    1500 -> rate 0.75; at B=3000 c's allocation rises to 2000 -> every
    c doc exactly once (monotone in budget). A zero-token stratum is
    allocated nothing. Gate membership is the md5 bucket, replicated
    here exactly."""
    import hashlib

    from smartpipeline_spark.functions.curation import unimax_mixture

    rows = []
    doc_id = 0
    for lang, n_docs in (("a", 10), ("b", 40), ("c", 200)):
        for _ in range(n_docs):
            rows.append((doc_id, lang, " ".join(f"w{j}" for j in range(10))))
            doc_id += 1
    for _ in range(3):  # zero-token stratum
        rows.append((doc_id, "d", "   "))
        doc_id += 1
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")

    def run(budget):
        out = {}
        got = unimax_mixture(
            df, budget_tokens=budget, max_epochs=2.0
        ).collect()
        for r in got:
            out.setdefault(r.doc_id, []).append(r.epoch)
        return {k: sorted(v) for k, v in out.items()}, {
            r.doc_id: r.lang for r in df.collect()
        }

    got, lang_of = run(2500.0)
    bucket = lambda k: int(
        hashlib.md5(str(k).encode()).hexdigest()[:8], 16
    ) % 10000
    for k, lg in lang_of.items():
        if lg in ("a", "b"):  # capped: exactly 2 epochs each
            assert got.get(k) == [1, 2], (k, lg, got.get(k))
        elif lg == "c":  # rate 0.75 remainder gate, 0 full epochs
            expect = [1] if bucket(k) < 7500 else None
            assert got.get(k) == expect, (k, got.get(k))
        else:  # zero-token stratum: nothing allocated
            assert k not in got
    got3, _ = run(3000.0)
    for k, lg in lang_of.items():
        if lg == "c":  # alloc 2000 = supply -> exactly one epoch each
            assert got3.get(k) == [1]
        elif lg in ("a", "b"):
            assert got3.get(k) == [1, 2]
    # total emitted tokens equal the gate-determined expectation
    # exactly (deterministic md5 buckets, not a statistical bound)
    expect_c_docs = sum(
        1 for k, lg in lang_of.items() if lg == "c" and bucket(k) < 7500
    )
    emitted = sum(10 * len(v) for k, v in got.items() if lang_of[k] != "d")
    assert emitted == 200 + 800 + 10 * expect_c_docs


# ---------------------------------------------- CCNet line-level dedup

def test_line_dedup_keep_first_across_and_within_docs(spark):
    from smartpipeline_spark.functions.curation import line_dedup

    df = spark.createDataFrame([
        # doc 1: boilerplate + unique line + within-doc repeat
        {"doc_id": 1, "text": "Accept our cookies\nalpha unique one\nalpha unique one"},
        # doc 2: same boilerplate (case/digit variant) + its own line
        {"doc_id": 2, "text": "accept  our COOKIES\nbeta unique two"},
        # doc 3: digit-variant of a doc-1 line never repeats -> all kept
        {"doc_id": 3, "text": "gamma unique three\n\n   \ngamma closing"},
    ])
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    # doc 1 is first: keeps boilerplate + first copy of its repeat
    assert rows[1].n_lines == 3 and rows[1].n_kept == 2
    assert rows[1].clean_text == "Accept our cookies\nalpha unique one"
    # doc 2 loses the normalized boilerplate (lowercase+ws collapse match)
    assert rows[2].n_lines == 2 and rows[2].n_kept == 1
    assert rows[2].clean_text == "beta unique two"
    # doc 3: blank lines dropped from counts, everything else survives
    assert rows[3].n_lines == 2 and rows[3].n_kept == 2
    assert rows[3].dup_frac == 0.0


def test_line_dedup_digit_bucketing_and_empty_survivor(spark):
    from smartpipeline_spark.functions.curation import line_dedup

    df = spark.createDataFrame([
        {"doc_id": 1, "text": "Page 3 of 10\nreal content here"},
        # 'page 0 of 00' normalizes identically to 'Page 3 of 10'
        {"doc_id": 2, "text": "page 0 of 00"},
    ])
    rows = {r.doc_id: r for r in line_dedup(df).collect()}
    assert rows[1].n_kept == 2
    assert rows[2].n_kept == 0 and rows[2].clean_text == ""
    assert rows[2].dup_frac == 1.0


def test_line_dedup_proxy_shape_matches_one_pass(spark):
    """The above-floor proxy shape (bodies cross only the final attach
    exchange, clean_text rebuilt row-locally from kept positions) must
    produce row-identical output to the below-floor one-pass shape on
    a corpus exercising every edge: cross-doc and within-doc dups,
    normalization collapses, blank-line gaps (explode positions are
    NOT contiguous word indexes), zero-survivor docs, and an
    all-blank doc that must be ABSENT from both outputs."""
    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.curation import line_dedup

    df = spark.createDataFrame([
        {"doc_id": 1, "text": "Accept our cookies\nalpha one\nalpha one\n\nmid gap line"},
        {"doc_id": 2, "text": "accept  our COOKIES\nbeta two"},
        {"doc_id": 3, "text": "Page 3 of 10\nreal content"},
        {"doc_id": 4, "text": "page 0 of 00"},
        {"doc_id": 5, "text": " \n\n   "},  # no non-empty lines -> no row
    ])
    one_pass = {r.doc_id: r for r in line_dedup(df, partitions=None).collect()}
    proxy = {r.doc_id: r for r in line_dedup(df, partitions=8).collect()}
    assert set(one_pass) == set(proxy) == {1, 2, 3, 4}
    for k in one_pass:
        assert one_pass[k] == proxy[k], (k, one_pass[k], proxy[k])
    # and on the real fixture corpus, full-frame equality
    d = sources.table(spark, "documents", "/root/testdata/sf0.001").select(
        "doc_id", "text"
    )
    a = line_dedup(d, partitions=None)
    b = line_dedup(d, partitions=8)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


# ------------------------------- weighted sampling without replacement

def test_weighted_sample_matches_local_es_ranking(spark):
    import hashlib
    import math

    from smartpipeline_spark.functions.curation import weighted_sample

    rows = [(i, float(1 + i % 7)) for i in range(300)]
    df = spark.createDataFrame(rows, ["doc_id", "weight"])
    got = weighted_sample(df, "weight", 25).collect()
    assert len(got) == 25
    # local reference: same md5-derived u, same ln(u)/w key
    def es(i, w):
        u = (int(hashlib.md5(str(i).encode()).hexdigest()[:12], 16) + 0.5) / 2**48
        return math.log(u) / w
    want = sorted(rows, key=lambda r: (-es(*r), r[0]))[:25]
    assert [r.doc_id for r in got] == [i for i, _ in want]
    # without replacement: all distinct
    assert len({r.doc_id for r in got}) == 25


def test_weighted_sample_weight_monotonicity(spark):
    """With identical u-ranks impossible, heavier docs must win more
    often: duplicate the id-space with 10x weights and check the
    heavy half dominates the sample."""
    from smartpipeline_spark.functions.curation import weighted_sample

    rows = [(i, 10.0 if i % 2 == 0 else 1.0) for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "weight"])
    got = weighted_sample(df, "weight", 100).collect()
    heavy = sum(1 for r in got if r.doc_id % 2 == 0)
    assert heavy > 75  # E[heavy] ~ 91 under A-ES; 75 is ~5 sigma slack


# ------------------------------------------- fuzzy decontamination

def test_fuzzy_decontam_flags_containment_not_dilution(spark):
    from smartpipeline_spark.functions.curation import fuzzy_decontamination

    bench_text = "what is the capital of france paris is the capital"
    long_train = ("padding words before the question appears " * 5
                  + bench_text + " and lots of trailing filler words after it " * 5)
    corpus = spark.createDataFrame([
        {"doc_id": 1, "text": long_train},           # contains the benchmark
        {"doc_id": 2, "text": "unrelated training document about spark partitions and shuffles"},
        {"doc_id": 3, "text": "what is the capital of spain madrid obviously"},  # partial overlap
    ])
    bench = spark.createDataFrame([{"doc_id": 100, "text": bench_text}])
    out = {r.doc_id: r for r in fuzzy_decontamination(corpus, bench, n=5, threshold=0.5).collect()}
    assert 2 not in out                      # no shared 5-gram at all
    assert out[1].contaminated               # full containment despite dilution
    assert out[1].containment == 1.0
    assert out[1].jaccard < 0.5              # jaccard alone would have missed it
    assert 3 in out and not out[3].contaminated


def test_fuzzy_decontam_empty_benchmark_and_short_docs(spark):
    from smartpipeline_spark.functions.curation import fuzzy_decontamination

    corpus = spark.createDataFrame([{"doc_id": 1, "text": "too short"}])
    bench = spark.createDataFrame([{"doc_id": 9, "text": "also tiny"}])
    assert fuzzy_decontamination(corpus, bench).count() == 0


# ------------------------------------- CCNet perplexity buckets

def test_ccnet_buckets_tercile_assignment(spark):
    from smartpipeline_spark.functions.curation import ccnet_perplexity_buckets

    # one language, clearly ordered LM scores: repeated common bigrams
    # score high (head), unique-vocabulary docs score low (tail)
    common = "the cat sat on the mat " * 5
    df = spark.createDataFrame([
        {"doc_id": 1, "lang": "en", "text": common},
        {"doc_id": 2, "lang": "en", "text": common},
        {"doc_id": 3, "lang": "en", "text": common + "slightly different tail"},
        {"doc_id": 4, "lang": "en", "text": "zx qv wk jn bp md unique gibberish tokens here"},
        {"doc_id": 5, "lang": "en", "text": "entirely novel words appear once each never repeated anywhere"},
        {"doc_id": 6, "lang": "en", "text": common + "another mild variation"},
    ])
    out = {r.doc_id: r for r in ccnet_perplexity_buckets(df).collect()}
    assert len(out) == 6
    # the two pure-common docs must be head; the two gibberish docs tail
    assert out[1].bucket == "head" and out[2].bucket == "head"
    assert out[4].bucket == "tail" and out[5].bucket == "tail"
    # scores order consistently with buckets
    order = {"head": 2, "middle": 1, "tail": 0}
    rows = sorted(out.values(), key=lambda r: r.avg_logprob)
    assert all(
        order[a.bucket] <= order[b.bucket]
        for a, b in zip(rows, rows[1:])
    )


def test_ccnet_buckets_are_per_language_terciles(spark):
    """Each language's corpus splits ~1/3 per bucket independently —
    a global split would let a low-perplexity language swallow
    another's head slots."""
    from smartpipeline_spark import sources
    from smartpipeline_spark.functions.curation import ccnet_perplexity_buckets

    d = sources.table(spark, "documents", "/root/testdata/sf0.001")
    counts = {
        (r.lang, r.bucket): r["count"]
        for r in ccnet_perplexity_buckets(d).groupBy("lang", "bucket").count().collect()
    }
    langs = {lang for lang, _ in counts}
    assert len(langs) >= 2
    for lang in langs:
        n = sum(v for (l, _), v in counts.items() if l == lang)
        for bucket in ("head", "middle", "tail"):
            frac = counts.get((lang, bucket), 0) / n
            assert 0.2 <= frac <= 0.47, (lang, bucket, frac)


# ------------------------------------- leakage-safe split

def test_leakage_safe_split_keeps_clusters_together(spark):
    from smartpipeline_spark.functions.curation import (
        assign_split,
        leakage_safe_split,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again today"
    df = spark.createDataFrame([
        {"doc_id": 1, "text": shared},
        {"doc_id": 2, "text": shared + " tiny tail"},          # near-dup of 1
        {"doc_id": 3, "text": shared + " other small suffix"}, # near-dup of 1
        {"doc_id": 4, "text": "completely unrelated document about spark shuffles and joins"},
    ])
    out = {r.doc_id: r for r in leakage_safe_split(df).collect()}
    # the whole near-dup chain shares one cluster and ONE split
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].split == out[2].split == out[3].split
    # singleton degrades to the per-doc md5 split exactly
    single = {r.doc_id: r.split for r in assign_split(df).collect()}
    assert out[4].cluster_id == 4 and out[4].split == single[4]
    # rerun-stable
    again = {r.doc_id: (r.cluster_id, r.split)
             for r in leakage_safe_split(df).collect()}
    assert again == {k: (v.cluster_id, v.split) for k, v in out.items()}


def test_leakage_safe_split_accepts_external_pairs(spark):
    """The split contract needs EDGES, not scores — MinHash candidate
    pairs (the scale path) slot in for the exact Jaccard join."""
    from smartpipeline_spark.functions.curation import leakage_safe_split

    df = spark.createDataFrame(
        [{"doc_id": i, "text": f"unique words only here {i}"} for i in range(1, 6)]
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["d1", "d2"])
    out = {r.doc_id: r for r in leakage_safe_split(df, pairs=pairs).collect()}
    assert out[1].cluster_id == out[2].cluster_id == out[3].cluster_id == 1
    assert out[1].split == out[2].split == out[3].split
    assert out[4].cluster_id == 4 and out[5].cluster_id == 5
