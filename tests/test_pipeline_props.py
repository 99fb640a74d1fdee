"""Invariant tests for the LLM-pipeline suites (SURVEY §5 step 3):
properties that hold by construction, checked independently of the
DuckDB oracle gate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.text import (
    HASH_BASE,
    HASH_P,
    HASH_SEED,
    LANG_MARKERS,
    poly_hash,
    predicted_lang,
    quality_score,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
    simhash_sketch,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.simsearch import (
    ivf_centroids,
    ivf_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.topk import (
    exact_topk,
)
from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
    load_table,
    queries_view,
)


def _py_poly(s: str) -> int:
    h = HASH_SEED
    for ch in s:
        h = (h * HASH_BASE + ord(ch)) % HASH_P
    return h


def test_poly_hash_matches_python_fold(spark):
    cases = [
        "key agg row scan",
        "a",
        "",
        "x" * 200,
        "Mixed CASE 123 !@# spaces  double",
        "0123456789",
    ]
    df = spark.createDataFrame([(s,) for s in cases], ["s"])
    got = {r.s: r.h for r in df.select("s", poly_hash(F.col("s")).alias("h")).collect()}
    for s in cases:
        expected = _py_poly(s) if s else HASH_SEED
        assert got[s] == expected, s


def test_quality_score_bounded_and_lang_in_domain(spark, sf_small):
    d = load_table(spark, sf_small, "documents").select(
        quality_score(F.col("text")).alias("q"),
        predicted_lang(F.col("text")).alias("lang"),
    )
    rows = d.collect()
    assert rows
    langs = set(LANG_MARKERS) | {"und"}
    for r in rows:
        assert 0.0 <= r.q <= 1.0
        assert r.lang in langs


def test_simhash_byte_banding_is_lossless(spark, sf_small):
    """Pigeonhole: pairs within hamming 3 must all survive the
    byte-band candidate generation — banded result == quadratic scan."""
    docs = load_table(spark, sf_small, "documents")
    banded = {
        (r.id_a, r.id_b, r.hamming) for r in simhash_pairs(docs, max_hamming=3).collect()
    }
    sk = simhash_sketch(docs)
    a = sk.select(F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = sk.select(F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    quad = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= 3)
    )
    assert banded == {(r.id_a, r.id_b, r.hamming) for r in quad.collect()}


def test_dedup_pairs_respect_thresholds(spark, sf_small):
    docs = load_table(spark, sf_small, "documents")
    for r in ngram_jaccard_pairs(docs, threshold=0.05).collect():
        assert 0.05 <= r.jaccard <= 1.0
        assert r.id_a < r.id_b
    for r in minhash_lsh_pairs(docs, threshold=0.3).collect():
        assert 0.3 <= r.jaccard <= 1.0


def test_minhash_verify_is_subset_of_exact(spark, sf_small):
    """LSH banding may only *drop* pairs relative to the quadratic
    Jaccard scan, never invent or mis-score them."""
    docs = load_table(spark, sf_small, "documents")
    tau = 0.2
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(docs, threshold=tau).collect()
    }
    for r in minhash_lsh_pairs(docs, threshold=tau).collect():
        assert (r.id_a, r.id_b) in exact
        assert abs(exact[(r.id_a, r.id_b)] - r.jaccard) < 1e-9


def test_ivf_probing_all_cells_equals_exact(spark, sf_small):
    """With nprobe >= n_cells IVF degenerates to brute force: every
    cell is probed, candidates = whole corpus, result must equal the
    exact top-K bit for bit."""
    corpus = load_table(spark, sf_small, "embeddings")
    queries = queries_view(spark, sf_small)
    n_cells = ivf_centroids(corpus).count()
    k = 10
    ivf = ivf_topk(queries, corpus, k, nprobe=n_cells)
    exact = exact_topk(queries, corpus, k, metric="cosine")
    got = sorted(map(tuple, ivf.select("query_id", "rank", "neighbor_id").collect()))
    want = sorted(map(tuple, exact.select("query_id", "rank", "neighbor_id").collect()))
    assert got == want


class TestSequencePacking:
    def test_offsets_are_shardwise_cumulative(self, spark, sf_small):
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.curation import (
            pack_documents,
        )
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
            load_table,
        )
        from pyspark.sql import functions as F

        out = pack_documents(load_table(spark, sf_small, "documents")).collect()
        by_shard: dict[int, list] = {}
        for r in sorted(out, key=lambda r: (r.shard, r.doc_id)):
            by_shard.setdefault(r.shard, []).append(r)
        assert by_shard
        for rows in by_shard.values():
            cum = 0
            for r in rows:
                assert r.start_offset == cum, r
                cum += r.n_tokens

    def test_crosses_boundary_definition(self, spark, sf_small):
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.curation import (
            PACK_CTX,
            pack_documents,
        )
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
            load_table,
        )

        for r in pack_documents(load_table(spark, sf_small, "documents")).collect():
            expect = (r.start_offset % PACK_CTX) + r.n_tokens > PACK_CTX
            assert bool(r.crosses_boundary) == expect, r
            assert r.bin_id == r.start_offset // PACK_CTX


class TestChunkDedup:
    def test_copies_cover_all_chunks(self, spark, sf_small):
        """Σ n_copies over duplicate groups equals the total chunk
        count, and every canonical (doc_id, chunk_id) is a real chunk."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.operators.curation import (
            DEDUP_CHUNK_TOKENS,
            chunk_documents,
            dedup_chunks,
        )
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
            load_table,
        )

        docs = load_table(spark, sf_small, "documents")
        groups = dedup_chunks(docs).collect()
        chunks = chunk_documents(docs, chunk=DEDUP_CHUNK_TOKENS, overlap=0)
        n_chunks = chunks.count()
        assert sum(g.n_copies for g in groups) == n_chunks
        keys = {(r.doc_id, r.chunk_id) for r in chunks.select("doc_id", "chunk_id").collect()}
        assert all((g.doc_id, g.chunk_id) in keys for g in groups)


class TestDsirWeights:
    def test_weights_favor_target_language(self, spark, sf_small):
        """The importance weight is log(p_target/p_raw) with the
        English slice as the target, so English documents must score
        higher ON AVERAGE than the rest (their features define the
        target model); and every doc gets 2·n_tokens − 1 features
        (unigrams + bigrams)."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_text import (
            DSIR_TARGET_LANG,
            q_corpus_dsir_weights,
        )
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
            load_table,
        )

        docs = load_table(spark, sf_small, "documents")
        out = q_corpus_dsir_weights(spark, sf_small).join(
            docs.select("doc_id", "lang", "text"), "doc_id"
        )
        rows = out.collect()
        en = [r.dsir_weight for r in rows if r.lang == DSIR_TARGET_LANG]
        rest = [r.dsir_weight for r in rows if r.lang != DSIR_TARGET_LANG]
        assert en and rest
        assert sum(en) / len(en) > sum(rest) / len(rest)
        for r in rows[:20]:
            n_toks = len(r.text.lower().split(" "))
            assert r.n_feats == (2 * n_toks - 1 if n_toks >= 2 else n_toks)


class TestBpeMerges:
    def test_greedy_fold_semantics(self, spark):
        """[a,a,a] + merge(a,a) must give [aa, a] — the non-overlapping
        left-to-right scan of classic BPE (a merged symbol cannot
        re-merge with the next occurrence in the same pass)."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_text import (
            _BPE_MERGE_EXPR,
        )

        df = spark.createDataFrame(
            [("a a a", "a", "a"), ("a a b a a", "a", "a"), ("x y", "a", "a")],
            ["syms", "lsym", "rsym"],
        )
        got = [r.m for r in df.select(F.expr(_BPE_MERGE_EXPR).alias("m")).collect()]
        assert got == ["aa a", "aa b aa", "x y"]

    def test_merge_table_invariants(self, spark, sf_small):
        """merged_sym is the concatenation of the pair, and the best
        pair count is non-increasing across rounds (merging can only
        shrink existing pair counts, and pairs born from a merge are
        bounded by the merged pair's count)."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_text import (
            BPE_ROUNDS,
            q_bpe_merges,
        )

        rows = sorted(
            q_bpe_merges(spark, sf_small).collect(), key=lambda r: r.merge_round
        )
        assert [r.merge_round for r in rows] == list(range(BPE_ROUNDS))
        for r in rows:
            assert r.merged_sym == r.left_sym + r.right_sym
            assert r.pair_count > 0
        counts = [r.pair_count for r in rows]
        assert counts == sorted(counts, reverse=True)

    def test_token_counts_sandwich(self, spark, sf_small):
        """Per doc: n_words ≤ n_bpe_tokens ≤ n_chars + n_words (fully
        merged floor vs the unmerged char+endmarker ceiling — six
        merges can only shrink the sequence)."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_text import (
            q_bpe_token_counts,
        )
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.sources.fixtures import (
            load_table,
        )

        docs = {
            r.doc_id: r.text
            for r in load_table(spark, sf_small, "documents").collect()
        }
        for r in q_bpe_token_counts(spark, sf_small).collect():
            words = [w for w in docs[r.doc_id].lower().split() if w]
            n_chars = sum(len(w) for w in words)
            assert r.n_words == len(words)
            assert r.n_words <= r.n_bpe_tokens <= n_chars + r.n_words


def test_embedding_covariance_symmetric_psd_diagonal(spark, sf_small):
    """Covariance must be symmetric with strictly positive diagonal
    (real data, no constant coordinate); off-diagonals bounded by the
    Cauchy-Schwarz product of the diagonals."""
    import math

    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry import (
        q_embedding_covariance,
    )

    c = {(r.i, r.j): r.cov for r in q_embedding_covariance(spark, sf_small).collect()}
    d = max(i for (i, _j) in c) + 1
    assert len(c) == d * d
    for i in range(d):
        assert c[(i, i)] > 0
        for j in range(i + 1, d):
            assert c[(i, j)] == c[(j, i)]
            # rounding to 1e-6 can push a tight product over by an ulp
            assert abs(c[(i, j)]) <= math.sqrt(c[(i, i)] * c[(j, j)]) + 2e-6


class TestDsirSelect:
    def test_selection_size_and_enrichment(self, spark, sf_small):
        """Exactly ⌊frac·N⌋ documents survive, ranks are 1..k, and the
        Gumbel-perturbed selection is still weight-enriched: the mean
        log-weight of the kept set must exceed the corpus mean."""
        from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.registry_text import (
            DSIR_KEEP_FRAC,
            _dsir_scored,
            q_corpus_dsir_select,
        )

        sel = q_corpus_dsir_select(spark, sf_small).collect()
        scored = _dsir_scored(spark, sf_small).collect()
        n = len(scored)
        assert len(sel) == int(DSIR_KEEP_FRAC * n)
        assert sorted(r.sel_rank for r in sel) == list(range(1, len(sel) + 1))
        kept_mean = sum(r.w_micro for r in sel) / len(sel)
        all_mean = sum(r["__s"] for r in scored) / n
        assert kept_mean > all_mean


def test_pii_redaction_rules_and_order(spark):
    """Redaction invariants on crafted literals: every pattern class is
    caught, markers are not re-matched by later rules, and untouched
    text passes through byte-identical."""
    from bandwidth_first_ann_refinement_precision_on_demand_in_vector_databases_spark.functions.text import (
        pii_redact,
    )

    rows = [
        ("write a.b-c_9@sub.example.org now", "write <EMAIL> now"),
        ("host 192.168.0.1 and 10.0.0.255 up", "host <IP> and <IP> up"),
        ("call 555-0199 today", "call <PHONE> today"),
        # an email whose local part contains digits must redact as ONE
        # email — not leave fragments an IP/phone pass could graze
        ("mix d123@ex.io at 1.2.3.4 tel 555-0000", "mix <EMAIL> at <IP> tel <PHONE>"),
        ("no pii here at all", "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, ["raw", "want"]).select(
        "want", pii_redact(F.col("raw")).alias("got")
    )
    for r in df.collect():
        assert r.got == r.want, f"{r.got!r} != {r.want!r}"
