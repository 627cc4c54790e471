"""Quality + plumbing tests for the north-star extension operators:
sketches measured against exact ground truth, multimodal batch decode."""


from pyspark.sql import functions as F

from crypto_data_ingestion_module_spark.operators.multimodal import (
    decode_assets,
    documents_as_assets,
)
from crypto_data_ingestion_module_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
)
from crypto_data_ingestion_module_spark.operators.text_dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)
from crypto_data_ingestion_module_spark.session import load_table
from tests.conftest import SF_SMALL


def test_minhash_finds_true_near_dups(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    # ground truth at a high threshold (clear near-dups)
    truth = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(docs, threshold=0.6, n=3).collect()
    }
    cand = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, num_hashes=32, bands=8).collect()
    }
    if truth:
        recall = len(truth & cand) / len(truth)
        assert recall >= 0.8, f"minhash recall {recall} over {len(truth)} true pairs"
    # estimator sanity: est_jaccard within [0,1]
    for r in minhash_lsh_pairs(docs).limit(20).collect():
        assert 0.0 <= r.est_jaccard <= 1.0


def test_simhash_properties(spark):
    docs = load_table(spark, SF_SMALL, "documents")
    fps = simhash(docs).collect()
    assert len(fps) == docs.count()
    # deterministic across runs
    fps2 = {r.id: r.simhash for r in simhash(docs).collect()}
    assert {r.id: r.simhash for r in fps} == fps2
    # identical text → identical fingerprint
    two = spark.createDataFrame(
        [(1, "hash table scan fast"), (2, "hash table scan fast"), (3, "zzz qqq")],
        "doc_id long, text string",
    )
    out = {r.id: r.simhash for r in simhash(two).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_ann_recall_vs_brute_force(spark):
    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r.qid, r.nid)
        for r in cosine_topk(emb, queries, k=10, exact=False).collect()
    }
    approx_df = ann_lsh_topk(
        emb, queries, k=10, n_planes=4, n_tables=16, dim=64
    )
    approx = {(r.qid, r.nid) for r in approx_df.collect()}
    recall = len(exact & approx) / len(exact)
    # neighbors here sit at ~72° (weakly clustered corpus): 16 tables of
    # 4 planes give 1-(1-p^4)^16 ≈ 0.85 with p≈0.6
    assert recall >= 0.5, f"ANN recall {recall}"
    # approx similarities must be true cosines (subset correctness)
    ex_sim = {
        (r.qid, r.nid): r.cosine
        for r in cosine_topk(emb, queries, k=500, exact=False).collect()
    }
    for r in approx_df.collect():
        assert abs(ex_sim[(r.qid, r.nid)] - r.cosine) < 1e-9


def test_ann_ivf_exact_when_probing_all_lists(spark):
    from crypto_data_ingestion_module_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, SF_SMALL, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    exact = {
        (r.qid, r.nid, r.rank)
        for r in cosine_topk(emb, queries, k=10, exact=False).collect()
    }
    # nprobe == n_lists must reproduce brute force EXACTLY (same ranks):
    # every corpus vector sits in some probed list.
    full = {
        (r.qid, r.nid, r.rank)
        for r in ann_ivf_topk(emb, queries, k=10, n_lists=8, nprobe=8).collect()
    }
    assert full == exact
    # partial probing: valid subset with true cosines, monotone recall
    exact_pairs = {(q, n) for q, n, _ in exact}
    r2 = {(r.qid, r.nid) for r in ann_ivf_topk(emb, queries, k=10, n_lists=8, nprobe=2).collect()}
    r4 = {(r.qid, r.nid) for r in ann_ivf_topk(emb, queries, k=10, n_lists=8, nprobe=4).collect()}
    recall2 = len(exact_pairs & r2) / len(exact_pairs)
    recall4 = len(exact_pairs & r4) / len(exact_pairs)
    assert recall4 >= recall2 - 0.05, (recall2, recall4)
    assert recall2 > 0.1, recall2


def test_multimodal_decode_plumbing(spark):
    docs = load_table(spark, SF_SMALL, "documents").limit(50)
    assets = documents_as_assets(docs)
    decoded = decode_assets(assets)
    rows = decoded.collect()
    assert len(rows) == 50
    by_id = {r.asset_id: r for r in rows}
    # document text bytes are NOT a recognized container: the r12
    # quarantine contract returns decode_ok=false with NULL metadata
    # instead of the pre-r12 fabricated sha256 features
    doc = docs.filter(F.col("doc_id") == rows[0].asset_id).first()
    r = by_id[doc.doc_id]
    assert r.decode_ok is False
    assert r.width is None and r.height is None and r.features is None
    assert r.n_bytes == len(doc.text.encode())
    # modality routing matches doc_id % 3; nothing fabricated anywhere
    for row in rows:
        expect = ["image", "audio", "video"][row.asset_id % 3]
        assert row.modality == expect
        assert row.decode_ok is False and row.features is None


def test_multimodal_resize_plumbing(spark):
    from crypto_data_ingestion_module_spark.operators.multimodal import (
        resize_assets,
    )

    docs = load_table(spark, SF_SMALL, "documents").limit(30)
    out = resize_assets(documents_as_assets(docs), 224, 224).collect()
    assert len(out) == 30  # 1→1, quarantine included
    for r in out:
        # text payloads aren't images: quarantined, nothing synthesized
        assert r.resize_ok is False
        assert r.payload is None and r.width is None and r.height is None
    # determinism across partitionings (the quarantine row set too)
    again = {r.asset_id: r.resize_ok for r in resize_assets(
        documents_as_assets(docs).repartition(7), 224, 224).collect()}
    assert {r.asset_id: r.resize_ok for r in out} == again


def test_multimodal_frame_sampling_quarantines_unknown_containers(spark):
    from crypto_data_ingestion_module_spark.operators.multimodal import (
        sample_frames,
    )

    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    assets = documents_as_assets(docs)
    frames = sample_frames(assets).collect()
    # text payloads are no recognized video container: ONE quarantine
    # row per video asset (demux_ok=false, NULL frame), never fake
    # frames (the pre-r12 sha256 expansion is retired)
    videos = {r.asset_id for r in assets.filter(
        F.col("modality") == "video").collect()}
    assert len(frames) == len(videos)
    assert {r.asset_id for r in frames} == videos
    for r in frames:
        assert r.demux_ok is False
        assert r.frame is None and r.frame_idx is None and r.ts_ms is None


def test_near_dup_block_is_distributed_and_self_consistent(spark):
    """The registered semantic-dedup query must have no driver collect and
    no full-corpus broadcast in its plan (the round-1 scale-killer), and
    the multi-block path must emit exactly the single-block brute-force
    pair set."""
    from crypto_data_ingestion_module_spark.operators.similarity import (
        near_dup_pairs,
    )
    from crypto_data_ingestion_module_spark.sinks.bucketed import physical_plan

    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    multi = near_dup_pairs(emb, threshold=0.42, stage1="block", block_rows=64)
    plan = physical_plan(multi)
    assert "BroadcastExchange" not in plan, plan
    assert "CollectLimit" not in plan, plan

    single = near_dup_pairs(
        emb, threshold=0.42, stage1="block", block_rows=10**9
    )
    got = {(r.id_a, r.id_b): r.cosine for r in multi.collect()}
    want = {(r.id_a, r.id_b): r.cosine for r in single.collect()}
    assert len(want) > 0  # threshold must bite at this SF (nonzero-row rule)
    assert got == want  # bit-identical cosines, identical pair set


def test_near_dup_auto_stage1_selection(spark):
    """stage1="auto" must take the exact block path while replication
    volume is bounded and fall to the LSH bucket join beyond the budget
    (the r2 scale flag: nothing used to select the 100 TB path)."""
    from crypto_data_ingestion_module_spark.operators.similarity import (
        near_dup_pairs,
    )
    from crypto_data_ingestion_module_spark.sinks.bucketed import physical_plan

    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    # small corpus, generous budget -> block kernel (applyInPandas GEMM)
    blocky = near_dup_pairs(emb, threshold=0.42, stage1="auto")
    assert "FlatMapGroupsInPandas" in physical_plan(blocky)
    # tiny replication budget -> must select the LSH bucket join
    lshy = near_dup_pairs(
        emb, threshold=0.42, stage1="auto", max_replication_rows=10
    )
    plan = physical_plan(lshy)
    assert "FlatMapGroupsInPandas" not in plan
    # and the fallback is still precision-1: candidates survive the exact
    # fixed-point stage-2 filter, so every emitted pair is a true pair
    exact = {
        (r.id_a, r.id_b) for r in blocky.collect()
    }
    got = {(r.id_a, r.id_b) for r in lshy.collect()}
    assert got <= exact


def test_near_dup_lsh_stage1_recall(spark):
    """LSH stage-1 variant: candidates ⊆ exact (stage-2 filter guarantees
    precision 1 with bit-identical cosines) and recall ≥ 0.8 at the test
    threshold — by-design lossy, pinned here rather than oracle-gated."""
    from crypto_data_ingestion_module_spark.operators.similarity import (
        near_dup_pairs,
    )

    emb = load_table(spark, SF_SMALL, "embeddings").select("vec_id", "embedding")
    exact = {
        (r.id_a, r.id_b): r.cosine
        for r in near_dup_pairs(emb, threshold=0.42, stage1="block").collect()
    }
    lsh = {
        (r.id_a, r.id_b): r.cosine
        for r in near_dup_pairs(
            emb, threshold=0.42, stage1="lsh", n_planes=4, n_tables=16
        ).collect()
    }
    assert set(lsh) <= set(exact)
    for k, v in lsh.items():
        assert v == exact[k]  # same exact stage-2 arithmetic
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_stratified_reservoir_plan_and_determinism(spark):
    """rank<=N must compile to WindowGroupLimit (per-partition partial
    top-N — the thing that makes the window scale) and the sample must be
    exact-N, deterministic, and seed-sensitive."""
    from crypto_data_ingestion_module_spark.operators.sampling import (
        stratified_reservoir,
    )
    from crypto_data_ingestion_module_spark.sinks.bucketed import physical_plan

    ev = load_table(spark, SF_SMALL, "events")
    s = stratified_reservoir(ev, ["event_type"], 20, id_col="event_id")
    assert "WindowGroupLimit" in physical_plan(s)
    counts = {r.event_type: r.c for r in s.groupBy("event_type").agg(F.count("*").alias("c")).collect()}
    assert all(c == 20 for c in counts.values()), counts
    ids1 = {r.event_id for r in s.select("event_id").collect()}
    ids2 = {
        r.event_id
        for r in stratified_reservoir(ev, ["event_type"], 20, id_col="event_id")
        .select("event_id")
        .collect()
    }
    assert ids1 == ids2  # rerun-stable
    ids_seed9 = {
        r.event_id
        for r in stratified_reservoir(ev, ["event_type"], 20, id_col="event_id", seed=9)
        .select("event_id")
        .collect()
    }
    assert ids_seed9 != ids1  # seed actually participates


def test_quantile_sketch_rank_error(spark):
    """percentile_approx(accuracy=1e4): every reported quantile's true
    rank is within n*eps + 1 of the target rank, per group."""
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    approx = (
        QUERY_SPECS["value_quantiles_sketch"].spark(spark, SF_SMALL).collect()
    )
    ev = load_table(spark, SF_SMALL, "events").select(
        "event_type", F.to_date("ts").alias("day"), "value"
    )
    vals = {}
    for r in ev.collect():
        vals.setdefault((r.event_type, r.day), []).append(r.value)
    eps = 1.0 / 10_000
    assert len(approx) > 0
    for row in approx:
        group = sorted(vals[(row.event_type, row.day)])
        n = len(group)
        assert row.n_rows == n
        for p, a in zip((0.5, 0.9, 0.99), row.approx_p50_p90_p99):
            rank = sum(1 for v in group if v <= a)
            assert abs(rank - p * n) <= eps * n + 1, (row.event_type, row.day, p, rank, n)


def test_connected_components_chain_and_singletons(spark):
    """Transitive closure: a 4-chain collapses to one cluster (the min-id
    label must travel multiple propagation rounds), a separate pair forms
    its own, and corpus rows with no edges self-label as representatives."""
    from crypto_data_ingestion_module_spark.operators.graph import (
        assign_clusters,
        connected_components,
    )

    # chain 7-5-3-1 given as unordered pairs + disjoint pair (10, 12)
    pairs = spark.createDataFrame(
        [(7, 5), (3, 5), (1, 3), (12, 10)], "id_a long, id_b long"
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 3: 1, 5: 1, 7: 1, 10: 10, 12: 10}

    corpus = spark.createDataFrame(
        [(i,) for i in (1, 3, 5, 7, 10, 12, 99)], "doc_id long"
    )
    got = {
        r.doc_id: (r.cluster_id, r.is_rep)
        for r in assign_clusters(corpus, pairs).collect()
    }
    assert got[99] == (99, True)  # singleton keeps itself
    assert got[1] == (1, True) and got[7] == (1, False)
    assert got[10] == (10, True) and got[12] == (10, False)
    # exactly one representative per cluster
    reps = [d for d, (_, is_rep) in got.items() if is_rep]
    assert sorted(reps) == [1, 10, 99]


def test_pii_redact_masks_all_kinds(spark):
    from pyspark.sql import functions as F

    from crypto_data_ingestion_module_spark.functions.text import (
        pii_counts,
        pii_redact,
    )

    txt = (
        "mail a.smith+spam@sub.example.co.uk or admin@host.io, "
        "server 192.168.001.42 responds, call +44 (0) 20-7946 0958 now"
    )
    df = spark.createDataFrame([(txt,)], "text string")
    n_emails, n_ips, n_phones = pii_counts("text")
    row = df.select(
        pii_redact("text").alias("red"),
        n_emails.alias("e"),
        n_ips.alias("i"),
        n_phones.alias("p"),
    ).first()
    assert row.e == 2 and row.i == 1 and row.p == 1
    assert "<EMAIL>" in row.red and "<IP>" in row.red and "<PHONE>" in row.red
    for leak in ("example", "192.168", "7946"):
        assert leak not in row.red, row.red


def test_connected_components_matches_union_find_on_random_graphs(spark):
    """Distributed min-label propagation vs a plain union-find on seeded
    random graphs (cycles, self-merges, disjoint islands)."""
    import random

    from crypto_data_ingestion_module_spark.operators.graph import (
        connected_components,
    )

    rng = random.Random(7)
    for _ in range(3):
        n = 40
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)

        nodes = sorted({v for e in edges for v in e})
        root_min: dict[int, int] = {}
        for v in nodes:  # ascending, so first hit per root is the min id
            root_min.setdefault(find(v), v)
        expected = {v: root_min[find(v)] for v in nodes}

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r.id: r.component for r in connected_components(df).collect()}
        assert got == expected


def test_new_query_plans_have_no_cartesian_product(spark):
    """The only nested-loop joins allowed in the retrieval/curation plans
    are broadcast ones (single-row query-vector / corpus-stats sides);
    an unbroadcast CartesianProduct would be a corpus×corpus blowup."""
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    for name in ("hybrid_search_rerank", "curated_corpus", "dedup_clusters"):
        df = QUERY_SPECS[name].spark(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, (name, plan[:2000])


def test_chunk_documents_is_map_only(spark):
    """Chunking must not shuffle: tokenize -> sequence -> explode -> slice
    is a narrow pipeline, so the physical plan has no Exchange at all."""
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    df = QUERY_SPECS["chunk_documents"].spark(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan[:2000]


def test_chunk_documents_covers_every_token(spark):
    """Stride windows tile each document: first chunk starts at 0, every
    token index is inside >=1 chunk, and consecutive chunks overlap by
    chunk-stride tokens (except possibly the tail)."""
    from crypto_data_ingestion_module_spark.plans.extensions import (
        _CHUNK,
        _STRIDE,
    )
    from crypto_data_ingestion_module_spark.plans.queries import QUERY_SPECS

    rows = (
        QUERY_SPECS["chunk_documents"]
        .spark(spark, "/root/testdata/sf0.001")
        .collect()
    )
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, chunks in by_doc.items():
        chunks.sort(key=lambda r: r.chunk_start)
        assert chunks[0].chunk_start == 0
        n_tokens = chunks[-1].chunk_start + chunks[-1].n_chunk_tokens
        covered = set()
        for c in chunks:
            assert c.n_chunk_tokens <= _CHUNK
            assert c.chunk_start % _STRIDE == 0
            covered.update(range(c.chunk_start, c.chunk_start + c.n_chunk_tokens))
        assert covered == set(range(n_tokens)), doc


def test_connected_components_viral_star_skew(spark):
    """Skew hardening (VERDICT r3 item 5): a power-law duplicate cluster —
    one viral doc paired with 10^4 near-copies — must converge in the
    O(log^2 n) round budget with the hot key spread across salt lanes,
    not funneled through one reducer, and label every member correctly."""
    from pyspark.sql import functions as F

    from crypto_data_ingestion_module_spark.operators.graph import (
        _salted_min_join,
        connected_components_with_stats,
    )

    n = 10_000
    # star root is id 5 (min of its component) + a chain and a mirrored
    # star whose root is the MAX id (hits the small-star hot path)
    star = [(5, 100 + i) for i in range(n)]
    chain = [(3_000_000, 3_000_001), (3_000_001, 3_000_002)]
    mirror = [(2_000_000, 1_000_000 + i) for i in range(50)]
    df = spark.createDataFrame(
        star + chain + mirror, "id_a long, id_b long"
    )
    comp_df, rounds = connected_components_with_stats(df, skew_salt=8)
    assert rounds <= 5, rounds
    comp = {r.id: r.component for r in comp_df.collect()}
    assert comp[5] == 5
    assert all(comp[100 + i] == 5 for i in range(n))
    assert comp[3_000_002] == 3_000_000
    assert all(comp[1_000_000 + i] == 1_000_000 for i in range(50))
    assert comp[2_000_000] == 1_000_000

    # salted join output is identical to the plain join (salting only
    # re-buckets the shuffle), and the salted plan actually partitions
    # by (a, _salt) so a hot node spans salt reducers
    sym = df.select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    mins = sym.groupBy("a").agg(F.min("b").alias("_mn"))
    plain = _salted_min_join(sym, mins, 1)
    salted = _salted_min_join(sym, mins, 8)
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "_salt" in plan, plan


def test_dup_ngram_stats_span_semantics(spark):
    """Substring-level dedup signal: only gram instances shared with
    ANOTHER doc count; self-repetition alone does not, and null-text
    docs stay visible with zeros."""
    from crypto_data_ingestion_module_spark.operators.text_dedup import (
        dup_ngram_stats,
    )

    span = "alpha beta gamma delta"  # one shared 4-gram
    docs = spark.createDataFrame(
        [
            (1, f"{span} unique one tail words here"),
            (2, f"prefix words {span} other ending"),
            (3, "completely different text with no shared spans at all"),
            (4, "rep rep rep rep rep rep rep rep"),  # self-repeats only
            (5, None),
            (6, "short"),  # < n words → whole text is the single gram
            (7, "short"),  # exact dup of 6 → that gram is shared
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.dup_grams, round(r.dup_ratio, 6))
        for r in dup_ngram_stats(docs, n=4).collect()
    }
    assert set(got) == {1, 2, 3, 4, 5, 6, 7}
    # doc1: 9 words → 6 grams, exactly 1 shared (the leading span)
    assert got[1] == (6, 1, round(1 / 6, 6))
    # doc2: 8 words → 5 grams, the span sits mid-text → 1 shared
    assert got[2] == (5, 1, 0.2)
    assert got[3][1] == 0
    # self-repetition is not duplication across docs
    assert got[4][1] == 0 and got[4][0] == 5
    assert got[5] == (0, 0, 0.0)
    # <n-word twin docs share their single whole-text gram
    assert got[6] == (1, 1, 1.0) and got[7] == (1, 1, 1.0)


def test_pattern_topk_windows_exact_match_wins(spark):
    """A window identical to the pattern scores distance 0 and ranks
    first; trailing sub-length windows never appear."""
    import datetime as dt

    from crypto_data_ingestion_module_spark.operators.patterns import (
        pattern_topk_windows,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    series = [5.0, 1.0, 2.0, 3.0, 9.0, 8.0]  # pattern [1,2,3] at rn=2
    for i, v in enumerate(series):
        rows.append((i, base + dt.timedelta(minutes=i), "a", v))
    rows.append((100, base, "b", 1.0))  # type with < k rows → no window
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    got = pattern_topk_windows(df, [1.0, 2.0, 3.0], k_out=10).collect()
    assert (got[0].event_type, got[0].start_rn, got[0].dist) == ("a", 2, 0.0)
    # windows per type 'a': 6 - 3 + 1 = 4; type 'b' has none
    assert len(got) == 4
    assert all(r.event_type == "a" for r in got)
