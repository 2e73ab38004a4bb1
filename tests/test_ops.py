"""Tests for the training-data ops ladder (dedup / similarity / text /
multimodal): pure-Python ground truths, recall gates for the approximate
passes, determinism, and the multimodal plumbing invariants."""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from apollo_spark.ops import dedup, multimodal, similarity, text


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").cache()


def _py_shingles(txt: str, w: int = 5) -> set[str]:
    t = txt.strip().split(" ")
    if len(t) <= w:
        return {" ".join(t)}
    return {" ".join(t[i:i + w]) for i in range(len(t) - w + 1)}


def _py_jaccard(a: str, b: str, w: int = 5) -> float:
    sa, sb = _py_shingles(a, w), _py_shingles(b, w)
    return len(sa & sb) / len(sa | sb)


class TestDedup:
    def test_exact_dedup_planted(self, spark):
        pdf = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                            "text": ["x y z", "a b c", "x y z", "q"]})
        out = dedup.exact_dedup(spark.createDataFrame(pdf)).toPandas() \
            .set_index("doc_id")
        assert out.loc[3, "canonical_id"] == 1
        assert out.loc[1, "canonical_id"] == 1
        assert out.loc[2, "canonical_id"] == 2

    def test_minhash_lsh_recall_vs_exhaustive(self, docs, docs_pdf):
        """LSH candidates must recover >=95% of true Jaccard>=0.8 pairs
        (with k=8, r=2, b=4: P(detect | j=0.8) = 1-(1-0.8^2)^4 ~= 0.983)."""
        truth = set()
        texts = docs_pdf.set_index("doc_id")["text"]
        sh = {i: _py_shingles(t) for i, t in texts.items()}
        ids = sorted(sh)
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                inter = len(sh[a] & sh[b])
                if inter and inter / len(sh[a] | sh[b]) >= 0.8:
                    truth.add((min(a, b), max(a, b)))
        assert truth, "fixture should contain planted near-dups"
        got = {(r.a, r.b) for r in
               dedup.minhash_dedup(docs, threshold=0.8).collect()}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.95, (recall, len(truth))
        # verification guarantees precision = 1 vs the same truth set
        assert got <= truth

    def test_ngram_jaccard_matches_python(self, docs, docs_pdf):
        out = dedup.ngram_jaccard_pairs(docs, threshold=0.5).toPandas()
        texts = docs_pdf.set_index("doc_id")["text"]
        for r in out.itertuples():
            assert abs(_py_jaccard(texts[r.a], texts[r.b]) - r.jaccard) < 1e-6

    def test_simhash_block_join_equals_bruteforce(self, docs):
        sig = dedup.simhash(docs).toPandas()
        h = sig.set_index("doc_id")["simhash"]
        ids = sorted(h.index)
        brute = {(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]
                 if bin(int(h[a]) ^ int(h[b])).count("1") <= 3}
        got = {(r.a, r.b) for r in dedup.simhash_pairs(docs).collect()}
        assert got == brute

    def test_hot_bucket_linear_mode(self, spark):
        """Skew guard + recall: 2000 identical docs put every shingle and
        every LSH band into one hot bucket. The quadratic pair step must
        emit ZERO pairs (bucket > cap), not ~2M — but the docs must NOT
        vanish from the near-dup graph (round-1 VERDICT #1): the linear-mode
        star edges re-link them, so the minhash CC path yields ONE
        2000-member component; exact dedup still collapses them too."""
        from apollo_spark.config import PipelineConfig
        from apollo_spark.stages import cc as cc_stage
        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.lit("the same caption text repeated for everyone").alias("text"))
        bands = dedup.lsh_bands(dedup.minhash_signatures(docs)) \
            .localCheckpoint()
        assert dedup.candidate_pairs(bands).count() == 0
        # linear mode: n-1 star edges, deduped across the identical bands
        hot = dedup.hot_bucket_edges(bands)
        assert hot.count() == 1999
        cc = dedup.connected_components_pairs(dedup.dup_edges(docs))
        assert cc.count() == 2000
        assert cc.select("cc_id").distinct().count() == 1
        ex = dedup.exact_dedup(docs)
        assert ex.select("canonical_id").distinct().count() == 1
        # the image path's star contraction is the same device
        memb = bands.select(
            F.col("doc_id").cast("string").alias("image_id"),
            F.col("band_idx").cast("int").alias("hashtable"),
            F.encode("band_key", "utf-8").alias("band"))
        edges = cc_stage.star_edges(memb)
        assert edges.count() == 1999
        cc2 = cc_stage.connected_components(memb, PipelineConfig())
        assert cc2.select("cc_id").distinct().count() == 1

    def test_salted_pair_join_skew(self, spark):
        """north_rule salting: one bucket holds 10% of the corpus (200 of
        2000 docs share a text, below the 512 cap). The salted join must
        (a) produce exactly the same pair set as the unsalted cross
        product, and (b) split the hot bucket across >= ceil(200/64) = 4
        salt shards with no shard's a-side above the salt target (so no
        task materializes more than ~target*n pairs)."""
        from pyspark.sql import functions as F2
        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 200,
                   "hot templated page body shared by many documents")
            .otherwise(F.expr(
                "concat_ws(' ', transform(sequence(0, 7), "
                "j -> concat('w', id, 'x', j)))"))  # no shared shingles
            .alias("text"))
        bands = dedup.lsh_bands(dedup.minhash_signatures(docs)) \
            .localCheckpoint()
        got = {(r.a, r.b) for r in dedup.candidate_pairs(bands).collect()}
        expect = {(a, b) for a in range(200) for b in range(200) if a < b}
        assert got == expect
        # shard census of the hot bucket
        ok = dedup.lsh_buckets(bands).filter("n = 200") \
            .select("band_idx", "band_key")
        hot = bands.join(ok, ["band_idx", "band_key"])
        shards = (hot.select(
            "band_idx", "band_key",
            F2.pmod(F2.xxhash64("doc_id"),
                    F2.ceil(F2.lit(200) / dedup.SALT_TARGET).cast("int"))
            .alias("salt"))
            .groupBy("band_idx", "band_key", "salt")
            .count().collect())
        per_bucket: dict = {}
        for r in shards:
            per_bucket.setdefault((r.band_idx, r.band_key), []).append(
                r["count"])
        for sizes in per_bucket.values():
            assert len(sizes) >= 4                    # really sharded
            assert max(sizes) <= 2 * dedup.SALT_TARGET  # balanced-ish

    def test_ngram_jaccard_salted_hot_shingle(self, spark):
        """round-3 VERDICT #3: the shared-shingle candidate join was the
        last unsalted bucketed self-join. With one hot shingle shared by
        120 docs (well under the 1024 df cap), the salted join must (a)
        carry the 2-D salt grid (__sa, __sb) in the physical join key and (b) return exactly the
        C(120,2) verified pairs of the identical-text block."""
        docs = spark.range(500).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 120,
                   "hot templated body shared by many documents verbatim")
            .otherwise(F.expr(
                "concat_ws(' ', transform(sequence(0, 7), "
                "j -> concat('w', id, 'x', j)))"))
            .alias("text"))
        out = dedup.ngram_jaccard_pairs(docs, threshold=0.5)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "__sa" in plan and "__sb" in plan
        got = {(r.a, r.b) for r in out.collect()}
        expect = {(a, b) for a in range(120) for b in range(120) if a < b}
        assert got == expect

    def test_cc_pairs_union_find(self, spark):
        pairs = spark.createDataFrame(
            pd.DataFrame({"a": [1, 2, 10, 11, 20],
                          "b": [2, 3, 11, 12, 21]}))
        out = {r.doc_id: r.cc_id for r in
               dedup.connected_components_pairs(pairs).collect()}
        assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10,
                       20: 20, 21: 20}

    def test_fused_bands_equal_two_step(self, docs):
        """minhash_bands_direct (one conditional-min exchange) must equal
        lsh_bands(minhash_signatures(...)) (two sequential aggs) row for
        row — the fusion is a plan change only."""
        two = {(r.doc_id, r.band_idx, r.band_key) for r in
               dedup.lsh_bands(dedup.minhash_signatures(docs)).collect()}
        one = {(r.doc_id, r.band_idx, r.band_key) for r in
               dedup.minhash_bands_direct(docs).collect()}
        assert one == two and len(one) > 0

    def test_cc_dispatch_parity(self, spark, monkeypatch):
        """Round-7 size-gated CC dispatch: the driver union-find path and
        the distributed label fixpoint must produce IDENTICAL labelings on
        the same graph (chains, a star, singleton-free components, both
        edge orientations). The cap monkeypatch pins BOTH paths in one
        test run, so a regression in either (or a divergence between
        them) fails at merge time."""
        from apollo_spark.stages import cc as cc_stage
        pdf = pd.DataFrame({
            "a": [5, 4, 3, 2, 100, 100, 100, 7, 200, 201],
            "b": [4, 3, 2, 1, 101, 102, 103, 8, 201, 202]})
        pairs = spark.createDataFrame(pdf)
        monkeypatch.setattr(cc_stage, "CC_DRIVER_EDGES_MAX", 100_000)
        small = {(r.doc_id, r.cc_id) for r in
                 dedup.connected_components_pairs(pairs).collect()}
        monkeypatch.setattr(cc_stage, "CC_DRIVER_EDGES_MAX", 0)
        big = {(r.doc_id, r.cc_id) for r in
               dedup.connected_components_pairs(pairs).collect()}
        assert small == big
        assert {c for _, c in small} == {1, 7, 100, 200}


class TestSimilarity:
    def test_bruteforce_topk_matches_numpy(self, emb):
        out = similarity.topk_neighbors(emb, n_queries=5, k=3).toPandas()
        pdf = emb.toPandas().sort_values("vec_id")
        m = np.asarray(pdf["embedding"].to_list(), dtype=np.float64)
        vid = pdf["vec_id"].to_numpy()
        norms = np.linalg.norm(m, axis=1)
        cos = (m @ m.T) / np.outer(norms, norms)
        for q in range(5):
            qi = np.where(vid == q)[0][0]
            row = np.round(cos[qi], 6)
            row[qi] = -2
            order = np.lexsort((vid, -row))[:3]
            expect = [int(vid[j]) for j in order]
            got = out[out.qid == q].sort_values("rank")["nid"].tolist()
            assert got == expect, (q, got, expect)

    def test_cosine_ann_subset_and_recall(self, emb):
        """The scale-path near-dup (LSH candidates + exact verify) must be
        a strict subset of the exact all-pairs result with identical cos
        values, at >= 0.95 recall for the shipped (nbits, ntables)."""
        exact = {(r.a, r.b): r.cos
                 for r in similarity.cosine_pairs(emb, 0.40).collect()}
        ann = {(r.a, r.b): r.cos
               for r in similarity.cosine_neardup_ann(
                   emb, 0.40, nbits=4, ntables=24).collect()}
        assert set(ann) <= set(exact)
        assert len(ann) / len(exact) >= 0.95
        assert all(exact[k] == v for k, v in ann.items())

    def test_cosine_neardup_regime_dispatch(self, spark, emb):
        """cosine_neardup routes by LSH geometry: below the crossover
        threshold the plan is the blocked GEMM (grouped-pandas kernel, no
        bucket join); at or above it the plan is the bucket equi-join.
        Both branches must agree with the exact result where they
        overlap."""
        import io
        from contextlib import redirect_stdout

        def plan(df):
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            return buf.getvalue()

        lo = similarity.cosine_neardup(emb, 0.40)
        hi = similarity.cosine_neardup(emb, 0.90, dim=8)
        p_lo, p_hi = plan(lo), plan(hi)
        assert "FlatMapGroupsInPandas" in p_lo      # GEMM tiles
        assert "bucket" not in p_lo
        assert "bucket" in p_hi                     # LSH candidate join
        assert "FlatMapGroupsInPandas" not in p_hi
        # high branch: planted near-identical vectors must be found
        rows = [(100, [1.0] * 8), (101, [1.0] * 7 + [1.001]),
                (102, [-1.0, 1.0] * 4), (103, [0.5] * 4 + [-0.5] * 4)]
        planted = spark.createDataFrame(rows, ["vec_id", "embedding"])
        found = {(r.a, r.b)
                 for r in similarity.cosine_neardup(
                     planted, 0.95, dim=8).collect()}
        assert (100, 101) in found
        assert all({a, b} == {100, 101} for a, b in found)

    def test_cosine_ivf_subset_and_recall(self, emb):
        """IVF-cell candidates + exact verify: strict subset of the exact
        result with identical cos values; multi-probe recall gated on the
        fixture (cross-cell pairs beyond the probe radius are the only
        misses)."""
        exact = {(r.a, r.b): r.cos
                 for r in similarity.cosine_pairs(emb, 0.40).collect()}
        ivf = {(r.a, r.b): r.cos
               for r in similarity.cosine_neardup_ivf(
                   emb, 0.40, n_centroids=16, nprobe=4).collect()}
        assert set(ivf) <= set(exact)
        assert len(ivf) / max(len(exact), 1) >= 0.6
        assert all(exact[k] == v for k, v in ivf.items())

    def test_ann_lsh_recall(self, emb):
        exact = similarity.topk_neighbors(emb, n_queries=30, k=5).toPandas()
        approx = similarity.ann_topk(emb, n_queries=30, k=5,
                                     nbits=6, ntables=16).toPandas()
        e = {(r.qid, r.nid) for r in exact.itertuples()}
        a = {(r.qid, r.nid) for r in approx.itertuples()}
        recall = len(e & a) / len(e)
        # uniform-random embeddings are LSH's adversarial case (neighbors
        # barely closer than random); multi-table still recovers most
        assert recall >= 0.5, recall

    def test_ivf_recall(self, emb):
        """IVF probe recall vs exact top-k; same bar as the LSH path."""
        exact = similarity.topk_neighbors(emb, n_queries=20, k=5).toPandas()
        approx = similarity.ivf_topk(emb, n_queries=20, k=5,
                                     n_centroids=8, nprobe=4).toPandas()
        ex = {(r.qid, r.nid) for r in exact.itertuples()}
        ap = {(r.qid, r.nid) for r in approx.itertuples()}
        recall = len(ex & ap) / len(ex)
        assert recall >= 0.6, f"IVF recall {recall}"
        # probing ALL cells must be exact
        full = similarity.ivf_topk(emb, n_queries=20, k=5,
                                   n_centroids=8, nprobe=8).toPandas()
        fu = {(r.qid, r.nid) for r in full.itertuples()}
        assert fu == ex

    def test_ivf_codebook_hash_sample_unbiased(self, spark):
        """round-3 VERDICT #6: the codebook used to train on the first-N
        id prefix — on a cluster-ORDERED corpus (ids sorted by true
        cluster, the crawl-ordered shape) a prefix of 128 ids sees ONLY
        cluster 0. The hash sample must land centroids in all 4 true
        clusters; determinism across calls must hold."""
        rng = np.random.default_rng(7)
        centers = np.zeros((4, 16))
        for c in range(4):
            centers[c, c] = 10.0
        rows = []
        for c in range(4):
            for i in range(256):
                v = centers[c] + rng.normal(0, 0.05, 16)
                rows.append((c * 256 + i, [float(x) for x in v]))
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>")
        cents = similarity.kmeans_centroids(emb, n_centroids=4, sample=128)
        cn = cents / np.maximum(
            np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
        tc = centers / np.linalg.norm(centers, axis=1, keepdims=True)
        covered = set(np.argmax(cn @ tc.T, axis=1).tolist())
        assert covered == {0, 1, 2, 3}, covered
        again = similarity.kmeans_centroids(emb, n_centroids=4, sample=128)
        assert np.array_equal(cents, again)

    def test_lsh_bucket_determinism(self, emb):
        a = similarity.lsh_bucketed(emb, nbits=6).toPandas() \
            .sort_values(["vec_id", "table"])["bucket"].tolist()
        b = similarity.lsh_bucketed(emb, nbits=6).toPandas() \
            .sort_values(["vec_id", "table"])["bucket"].tolist()
        assert a == b


class TestText:
    def test_token_count(self, spark):
        out = text.token_count(spark.createDataFrame(
            pd.DataFrame({"doc_id": [1], "text": ["one two three"]})
        )).collect()[0]
        assert out.n_tokens == 3 and out.n_chars_counted == 13
        assert out.n_bpe_est == 4  # ceil(13/4)

    def test_term_frequencies(self, spark):
        docs = spark.createDataFrame(
            pd.DataFrame({"doc_id": [1, 2],
                          "text": ["a b a a c", "x x"]}))
        tf = {(r.doc_id, r.token): r.tf
              for r in text.term_frequencies(docs).collect()}
        assert tf == {(1, "a"): 3, (1, "b"): 1, (1, "c"): 1, (2, "x"): 2}

    def test_lang_filter(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["the cat is on the mat and in a box of hats",
                     "zzz qqq vvv www"]}))
        kept = [r.doc_id for r in text.lang_filter(docs).collect()]
        assert kept == [1]

    def test_filter_formats(self, spark):
        from apollo_spark.stages import bags as bags_st
        imgs = spark.createDataFrame(pd.DataFrame({
            "image_id": ["a", "b", "c"], "fmt": ["png", "jpeg", "bmp"]}))
        assert bags_st.filter_formats(imgs, None).count() == 3
        got = {r.image_id
               for r in bags_st.filter_formats(imgs, ("png", "jpeg"))
               .collect()}
        assert got == {"a", "b"}

    def test_fingerprint_order_sensitive(self, spark):
        df = spark.createDataFrame(pd.DataFrame(
            {"doc_id": [1, 2], "text": ["alpha beta", "beta alpha"]}))
        fps = text.fingerprint(df).toPandas()["fingerprint"].tolist()
        assert fps[0] != fps[1]

    def test_lang_id_stopword_logic(self, spark):
        df = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2],
            "text": ["the cat is on the mat", "zr qw xx yy zz"]}))
        out = text.lang_id(df).toPandas().set_index("doc_id")
        assert out.loc[1, "pred_lang"] == "en"
        assert out.loc[2, "pred_lang"] == "unknown"

    def test_repetition_signals_hand_case(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["a b a b a b",                  # heavy repetition
                     "the quick brown fox jumps",    # clean caption
                     "x"]}))                         # degenerate: 1 token
        out = text.repetition_signals(docs).toPandas().set_index("doc_id")
        # doc 1: 2-grams [ab ba ab ba ab] -> top 'a b' 3/5; excess 2/5;
        # 3-grams [aba bab aba bab] all duplicated; tokens 6 with 2 distinct
        assert out.loc[1, "top2_mass"] == 0.6
        assert out.loc[1, "top2_excess"] == 0.4
        assert out.loc[1, "dup3_frac"] == 1.0
        assert out.loc[1, "rep_token_frac"] == round(4 / 6, 6)
        assert not out.loc[1, "keep_repetition"]
        # doc 2: all 2-grams distinct -> raw mass 1/4 but ZERO excess;
        # the flag must not reject a clean short caption (the reason the
        # keep flag thresholds excess, not raw Gopher mass)
        assert out.loc[2, "top2_mass"] == 0.25
        assert out.loc[2, "top2_excess"] == 0.0
        assert out.loc[2, "dup3_frac"] == 0.0
        assert out.loc[2, "rep_token_frac"] == 0.0
        assert bool(out.loc[2, "keep_repetition"])
        # doc 3: no 2-/3-grams at all -> all signals 0, kept
        assert out.loc[3, "top2_mass"] == 0.0
        assert bool(out.loc[3, "keep_repetition"])

    def test_repetition_signals_bounded_and_plan_narrow(self, docs):
        sdf = text.repetition_signals(docs)
        plan = sdf._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "Generate" not in plan
        out = sdf.toPandas()
        for c in ("top2_mass", "top2_excess", "dup3_frac",
                  "rep_token_frac"):
            assert out[c].between(0.0, 1.0).all(), c
        assert (out["top2_excess"] <= out["top2_mass"]).all()

    def test_quality_monotone_in_length(self, docs):
        out = text.quality_score(docs).toPandas()
        assert (out["quality"] > 0).all() and (out["quality"] <= 1).all()

    def test_span_dedup_hand_case(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d e f",    # first occurrence of both spans
                     "a b c x y z",    # leading span duplicates doc 1's
                     "d e f",          # whole doc duplicates doc 1's tail
                     "d e"]}))         # short tail span, NOT a dup of
        #                                "d e f" (span text differs)
        out = (text.span_dedup(docs, span=3).toPandas()
               .set_index("doc_id"))
        assert out.loc[1].tolist() == [2, 2, "a b c d e f"]
        assert out.loc[2].tolist() == [2, 1, "x y z"]
        assert out.loc[3].tolist() == [1, 0, ""]
        assert out.loc[4].tolist() == [1, 1, "d e"]

    @staticmethod
    def _py_span_dedup(pdf: pd.DataFrame, span: int) -> pd.DataFrame:
        seen: set[str] = set()
        rows = []
        for _, r in pdf.sort_values("doc_id").iterrows():
            toks = r["text"].strip().split(" ")
            spans = [" ".join(toks[i:i + span])
                     for i in range(0, len(toks), span)]
            kept = []
            for s in spans:
                if s not in seen:
                    seen.add(s)
                    kept.append(s)
            rows.append((int(r["doc_id"]), len(spans), len(kept),
                         " ".join(kept)))
        return pd.DataFrame(rows, columns=["doc_id", "n_spans", "n_kept",
                                           "clean_text"])

    def test_span_dedup_matches_python(self, docs, docs_pdf):
        got = (text.span_dedup(docs, span=10).toPandas()
               .sort_values("doc_id").reset_index(drop=True))
        want = self._py_span_dedup(docs_pdf, 10).astype(
            {"n_spans": "int64", "n_kept": "int64"})
        pd.testing.assert_frame_equal(got, want)
        # the sf0.001 corpus has planted dups -> the op must actually drop
        assert (got["n_kept"] < got["n_spans"]).any()

    def test_decontaminate_hand_case(self, spark):
        docs = spark.createDataFrame(pd.DataFrame({
            "doc_id": [1, 2, 3],
            "text": ["z z p q r z",   # contains bench gram 'p q r'
                     "a b c d",       # clean
                     "p q"]}))        # too short for any 3-gram
        bench = spark.createDataFrame(pd.DataFrame(
            {"text": ["p q r s"]}))
        out = (text.decontaminate(docs, bench, n=3).toPandas()
               .set_index("doc_id"))
        assert out.loc[1].tolist() == [4, True, False]
        assert out.loc[2].tolist() == [2, False, True]
        assert out.loc[3].tolist() == [0, False, True]

    def test_decontaminate_matches_python(self, docs, docs_pdf):
        n = 13
        bench_pdf = docs_pdf[docs_pdf["doc_id"] % 31 == 0]
        got = (text.decontaminate(
            docs, docs.filter((F.col("doc_id") % 31) == 0), n=n)
            .toPandas().sort_values("doc_id").reset_index(drop=True))

        def grams(t: str) -> set[str]:
            toks = t.strip().split(" ")
            return {" ".join(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}

        bench_grams = set().union(*(grams(t) for t in bench_pdf["text"]))
        for _, r in got.iterrows():
            t = docs_pdf.loc[docs_pdf["doc_id"] == r["doc_id"],
                             "text"].iloc[0]
            g = grams(t)
            ntok = len(t.strip().split(" "))
            assert r["n_grams"] == max(ntok - n + 1, 0)
            assert r["contaminated"] == bool(g & bench_grams)
            assert r["keep_decontaminated"] == (not r["contaminated"])
        # every bench doc flags itself
        assert got[got["doc_id"] % 31 == 0]["contaminated"].all()

    def test_decontaminate_broadcasts_bench_side(self, docs):
        sdf = text.decontaminate(
            docs, docs.filter((F.col("doc_id") % 31) == 0), n=13)
        plan = sdf._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan


class TestMultimodal:
    def test_byte_stats_matches_python(self, spark):
        pdf = pd.DataFrame({"doc_id": [1, 2],
                            "text": ["hello world", "a"]})
        out = multimodal.byte_stats(
            multimodal.binary_corpus(spark.createDataFrame(pdf))
        ).toPandas().set_index("doc_id")
        for i, t in zip(pdf["doc_id"], pdf["text"]):
            raw = t.encode()
            assert out.loc[i, "n_bytes"] == len(raw)
            assert out.loc[i, "byte_sum_mod"] == sum(raw) % 997
            assert out.loc[i, "first_byte"] == raw[0]
            assert out.loc[i, "crc32"] == zlib.crc32(raw)

    def test_decode_deterministic_and_shaped(self, spark, images):
        sub = images.limit(50)
        a = multimodal.decode_features(sub).toPandas() \
            .sort_values("image_id").reset_index(drop=True)
        b = multimodal.decode_features(sub).toPandas() \
            .sort_values("image_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)
        # synthetic corpus carries ASIM containers -> real decode path
        assert (a["decoder"] == "asim").all()
        assert (a["w"] > 0).all() and (a["std_px"] >= 0).all()

    def test_psnr(self):
        x = np.zeros((8, 8), dtype=np.uint8)
        assert multimodal.psnr(x, x) == float("inf")
        y = x.copy(); y[0, 0] = 255
        assert 10 < multimodal.psnr(x, y) < 40

    def test_resize_kernel_matches_plan_and_pixels(self, spark, images):
        """resize_images' MEASURED out dims == resize_dims' Catalyst math,
        and on the ASIM container the resample is the exact NN pick."""
        from apollo_spark.functions import codecs
        sub = images.limit(40)
        plan = multimodal.resize_dims(sub, max_side=24).toPandas() \
            .set_index("image_id")
        out = multimodal.resize_images(sub, max_side=24).toPandas() \
            .set_index("image_id")
        assert set(out.index) == set(plan.index)
        for rid in out.index:
            assert out.loc[rid, "out_w"] == plan.loc[rid, "out_w"]
            assert out.loc[rid, "out_h"] == plan.loc[rid, "out_h"]
        assert (out["out_w"] <= 24).all() and (out["out_h"] <= 24).all()
        assert (out["resizer"] == "asim-nn").all()
        # pixel-exact spot check against a local decode+resample
        row = sub.limit(1).collect()[0]
        px = codecs.decode(bytes(row["bytes"]))
        ow, oh = multimodal.target_dims(px.shape[1], px.shape[0], 24)
        ref = multimodal._nn_resize(px, ow, oh)
        assert out.loc[row["image_id"], "out_mean"] == \
            pytest.approx(float(ref.mean()))

    def test_target_dims_never_upscales_and_fits(self):
        for w, h in [(10, 10), (64, 64), (128, 32), (32, 128), (1, 5000)]:
            ow, oh = multimodal.target_dims(w, h, 64)
            assert max(ow, oh) <= max(64, min(w, h))
            assert ow <= w and oh <= h and ow >= 1 and oh >= 1
            if max(w, h) <= 64:
                assert (ow, oh) == (w, h)

    def test_sample_frames_matches_python(self, spark):
        """Kernel slicing == local slicing on a hand-built frame container,
        including the n_frames < k short-video case and skip rules."""
        vids = pd.DataFrame({
            "video_id": ["a", "b", "c"],
            "payload": [bytes(range(80)), bytes(range(10)), b""],
            "n_frames": [10, 1, 0],
            "frame_bytes": [8, 8, 8]})
        out = multimodal.sample_frames(
            spark.createDataFrame(vids), k=4).toPandas()
        assert set(out["video_id"]) == {"a", "b"}  # c skipped (0 frames)
        a = out[out["video_id"] == "a"].sort_values("frame_idx")
        assert a["frame_idx"].tolist() == [0, 2, 5, 7]  # floor(j*10/4)
        for _, r in out.iterrows():
            raw = vids.set_index("video_id").loc[r["video_id"], "payload"]
            fb = 8
            frame = raw[r["frame_idx"] * fb:(r["frame_idx"] + 1) * fb]
            assert r["frame_sum_mod"] == sum(frame) % 997
            assert r["n_frame_bytes"] == len(frame)
        b = out[out["video_id"] == "b"]
        assert b["frame_idx"].tolist() == [0]  # min(k, n_frames) = 1


class TestSaltedPairs:
    """ops/skew.py — the shared skew device (round-2 VERDICT #1-#3):
    semantics-free sharding with bounded per-shard fan-in."""

    def test_equivalent_to_unsalted_and_bounded(self, spark):
        from pyspark.sql import functions as F
        from apollo_spark.ops.skew import salted_pairs
        # one hot bucket: 300 of 400 rows share key 0 (VERDICT: 'one block
        # value covering 10% of the corpus' — this is 75%, harsher)
        rows = [(i, 0 if i < 300 else 1 + i % 7, i * 31 % 997)
                for i in range(400)]
        df = spark.createDataFrame(rows, "id long, k long, payload long")
        got = salted_pairs(df, ["k"], "id", payload=("payload",),
                           salt_target=16)
        pairs = {(r["a"], r["b"]) for r in got.collect()}
        brute = {(r["a"], r["b"]) for r in
                 df.alias("x").join(df.alias("y"), "k")
                 .filter(F.col("x.id") < F.col("y.id"))
                 .select(F.col("x.id").alias("a"), F.col("y.id").alias("b"))
                 .collect()}
        assert pairs == brute and len(pairs) > 44_000
        # payload carried through correctly on a sample
        one = got.filter("a = 0 AND b = 1").first()
        assert one["payload_a"] == 0 and one["payload_b"] == 31

    def test_shard_fanin_bounded(self, spark):
        """The a-side of every (key, salt) shard holds <= ~salt_target rows
        — the per-task pair count is salt_target * n, not n²."""
        from pyspark.sql import functions as F
        rows = [(i, 0) for i in range(1000)]
        df = spark.createDataFrame(rows, "id long, k long")
        target = 8
        nshards = -(-1000 // target)  # ceil = 125
        salted = df.withColumn(
            "salt", F.pmod(F.xxhash64("id"), F.lit(nshards)).cast("int"))
        per_shard = salted.groupBy("salt").count()
        assert per_shard.count() == nshards
        mx = per_shard.agg(F.max("count")).first()[0]
        # expected 8 per shard; allow generous hash variance, but nothing
        # near the unsalted 1000
        assert mx <= 4 * target

    def test_planted_hot_key_partition_balance(self, spark):
        """Miniaturized skew-probe regression guard (round-5 VERDICT #7):
        the 480k probe caught two real scale-killers by TASK timings —
        (a) one-sided salting bounding per-cell output only by
        salt_target*n, (b) AQE broadcast-converting the salted join so
        the whole hot block landed on one stream task. This pins the fix
        at merge time via the REST-less route: a 20k-row corpus with a
        planted 1000-dup hot bucket goes through salted_pairs, and the
        JOIN OUTPUT's physical row distribution (spark_partition_id
        before any downstream exchange) must spread the hot block's
        C(1000,2) pairs across the shuffle grid. Under the 2-D s x s
        grid (s = 16 here) the 256 cells hash across ~all 64 shuffle
        partitions nearly evenly; a reverted one-sided salt collapses to
        <= 16 distinct join keys (three quarters of the partitions
        empty — verified to fail this test when simulated) and a
        dropped shuffle_hash pin fails test_salt_in_join_key_plan. Two AQE
        rescues are disabled for the measurement only: partition
        coalescing (legitimately merges small partitions, blurs the
        count) and skew-join splitting — the documented BACKSTOP, which
        at THIS miniature scale happily re-splits a one-sided salt's 16
        fat cells and would mask the structural regression the 480k
        probe proved the backstop cannot absorb (8.91x max/median). The
        salt grid must balance on its own; the backstop stays on in
        production for residual imbalance."""
        from apollo_spark.ops.skew import salted_pairs
        hot, rows = 1000, 20_000
        df = spark.range(rows).select(
            F.concat(F.lit("d"), F.col("id")).alias("id"),
            F.when(F.col("id") < hot, F.lit(0))
            .otherwise(F.col("id")).alias("k"))
        # 64 shuffle partitions for the measurement: the discrimination
        # needs MORE partitions than a one-sided salt's s=16 cells (the
        # suite's 8 would let 16 fat cells fill every partition and hide
        # the collapse); the 2-D grid's 256 cells spread over all 64
        knobs = {"spark.sql.adaptive.coalescePartitions.enabled": "false",
                 "spark.sql.adaptive.skewJoin.enabled": "false",
                 "spark.sql.shuffle.partitions": "64"}
        saved = {k: spark.conf.get(k) for k in knobs}
        for k, v in knobs.items():
            spark.conf.set(k, v)
        try:
            counts = (salted_pairs(df, ["k"], "id")
                      .withColumn("pid", F.spark_partition_id())
                      .groupBy("pid").count().collect())
        finally:
            for k, v in saved.items():
                spark.conf.set(k, v)
        total = sum(r["count"] for r in counts)
        assert total == hot * (hot - 1) // 2    # every hot pair, exactly once
        ideal = total / 64
        assert len(counts) >= 48, \
            "hot-block pairs collapsed onto few partitions (one-sided salt?)"
        assert max(r["count"] for r in counts) <= 3 * ideal, \
            "one partition holds a hot bucket's cross product"

    def test_salt_in_join_key_plan(self, spark):
        """The physical plan joins on (key, __sa, __sb) — the 2-D skew grid
        key is actually in the shuffle, not just in the code — AND the join
        is pinned to shuffle_hash: the round-5 480k probe measured AQE
        broadcast-converting this join (build side under 10 MB), which
        re-serializes the hot bucket onto whichever STREAM task holds its
        partition (302 s vs 3.3 s median) while the salt grid sits unused
        inside the broadcast map."""
        from apollo_spark.ops.skew import salted_pairs
        df = spark.createDataFrame([(i, 0) for i in range(10)],
                                   "id long, k long")
        plan = salted_pairs(df, ["k"], "id")._jdf.queryExecution() \
            .executedPlan().toString()
        assert "__sa" in plan and "__sb" in plan
        assert "ShuffledHashJoin" in plan
        assert "BroadcastHashJoin" not in plan


class TestBucketPathParity:
    def test_numpy_and_sql_buckets_identical(self, spark, emb):
        """lsh_bucketed (NumPy matmul, production) and lsh_buckets_sql
        (Catalyst folds, oracle-parity) share the half-up 6dp grid and the
        same seed-derived planes, so their buckets are bit-identical —
        this is what lets ann_lsh_topk keep the fast path AND a DuckDB
        oracle (VERDICT r2 #6)."""
        from apollo_spark.ops import similarity
        sub = emb.limit(400)
        np_bk = {(r["vec_id"], r["table"], r["bucket"])
                 for r in similarity.lsh_bucketed(
                     sub, nbits=6, seed=42, ntables=16).collect()}
        sql_bk = {(r["vec_id"], r["tbl"], r["bucket"])
                  for r in similarity.lsh_buckets_sql(
                      sub, nbits=6, ntables=16, seed=42).collect()}
        assert np_bk == sql_bk and len(np_bk) == 400 * 16


class TestSimhashSkew:
    def test_simhash_pairs_hot_block_equivalence(self, spark):
        """60% of the corpus shares one simhash (identical text) — every
        block value is hot. The salted join must still return exactly the
        brute-force Hamming-ball result (salting is semantics-free) while
        sharding the hot blocks (VERDICT r2 #1 skew test)."""
        from pyspark.sql import functions as F
        from apollo_spark.ops import dedup
        rows = [(i, "the quick brown fox jumps over the lazy dog")
                for i in range(60)]
        rows += [(100 + i, f"unique caption number {i} tokens "
                  f"w{i} x{i} y{i} z{i} q{i}") for i in range(40)]
        docs = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["a"], r["b"], r["hamming"])
               for r in dedup.simhash_pairs(docs).collect()}
        sig = dedup.simhash(docs)
        brute = {(r["a"], r["b"], r["h"]) for r in
                 sig.alias("x").join(
                     sig.alias("y"),
                     F.col("x.doc_id") < F.col("y.doc_id"))
                 .select(F.col("x.doc_id").alias("a"),
                         F.col("y.doc_id").alias("b"),
                         F.bit_count(F.col("x.simhash")
                                     .bitwiseXOR(F.col("y.simhash")))
                         .cast("long").alias("h"))
                 .filter("h <= 3").collect()}
        assert got == brute
        # the identical-text block really is hot: all 60C2 pairs present
        assert len([p for p in got if p[0] < 60 and p[1] < 60]) == 1770


class TestKmeansParity:
    def test_local_codebook_bitwise_matches_spark(self, spark, tmp_path):
        """kmeans_centroids_local (pyarrow + pure-Python XXH64 sample)
        must produce the SAME codebook, bit for bit, as the Spark path —
        the honesty condition of the r5 centroid-literal IVF oracles."""
        rng = np.random.default_rng(11)
        rows = [(int(i) * 7 - 300, [float(x) for x in rng.normal(0, 1, 12)])
                for i in range(400)]
        emb = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>")
        path = str(tmp_path / "emb.parquet")
        emb.coalesce(1).write.parquet(path)
        c_spark = similarity.kmeans_centroids(
            spark.read.parquet(path), n_centroids=8, sample=128)
        c_local = similarity.kmeans_centroids_local(
            path, n_centroids=8, sample=128)
        assert np.array_equal(c_spark, c_local)

    def test_single_action_sampling(self, spark):
        """ADVICE r4: the codebook build must run ONE action over the
        (possibly expensive) emb lineage, not a count + a collect."""
        # count row evaluations via a Spark accumulator in the lineage
        acc = spark.sparkContext.accumulator(0)
        from pyspark.sql import functions as F

        @F.udf("long")
        def tick(v):
            acc.add(1)
            return v
        rng = np.random.default_rng(5)
        emb = spark.createDataFrame(
            [(i, [float(x) for x in rng.normal(0, 1, 8)])
             for i in range(200)],
            "vec_id long, embedding array<double>") \
            .withColumn("vec_id", tick("vec_id"))
        similarity.kmeans_centroids(emb, n_centroids=4, sample=64)
        assert acc.value == 200  # each row evaluated exactly once
