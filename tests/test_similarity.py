"""Similarity-search tests: brute-force exactness, LSH plumbing, and the
IVF identity property (nprobe == n_clusters -> identical to brute force)
plus a partial-probe recall floor."""

from __future__ import annotations

from pyspark.sql import functions as F


def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet") \
        .select("vec_id", "embedding")


class TestIVF:
    def test_full_probe_equals_brute_force(self, spark, sf_dir):
        from docling_eval_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        emb = _emb(spark, sf_dir)
        queries = emb.where(F.col("vec_id") < 5)
        exact = brute_force_topk(queries, emb, k=5).collect()
        ivf = ivf_topk(queries, emb, k=5, n_clusters=8, nprobe=8).collect()
        assert [tuple(r) for r in ivf] == [tuple(r) for r in exact]

    def test_partial_probe_recall(self, spark, sf_dir):
        from docling_eval_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )

        emb = _emb(spark, sf_dir)
        queries = emb.where(F.col("vec_id") < 10)
        exact = brute_force_topk(queries, emb, k=3).collect()
        approx = ivf_topk(queries, emb, k=3, n_clusters=8, nprobe=3).collect()
        truth = {(r["query_id"], r["neighbor_id"]) for r in exact}
        got = {(r["query_id"], r["neighbor_id"]) for r in approx}
        recall = len(truth & got) / len(truth)
        assert recall >= 0.5, recall  # deterministic given seed/data

    def test_train_deterministic(self, spark, sf_dir):
        from docling_eval_spark.operators.similarity import ivf_train

        emb = _emb(spark, sf_dir)
        c1 = ivf_train(emb, n_clusters=4, iters=1)
        c2 = ivf_train(emb, n_clusters=4, iters=1)
        assert (c1 == c2).all()


class TestLSH:
    def test_gemm_signature_matches_expression_path(self, spark, sf_dir):
        """with_lsh_signature (Arrow GEMM, plan size independent of dim)
        must assign the exact buckets the expression-tree lsh_signature
        does — the two implementations cross-check each other."""
        from docling_eval_spark.operators.similarity import (
            _as_double,
            _random_planes,
            lsh_signature,
            with_lsh_signature,
        )

        emb = _emb(spark, sf_dir)
        dim = len(emb.first()["embedding"])
        planes = _random_planes(dim, n_planes=8, seed=7)
        base = emb.select("vec_id", _as_double(F.col("embedding")).alias("v"))
        expr = {r["vec_id"]: r["b"] for r in base.select(
            "vec_id", lsh_signature(F.col("v"), planes).alias("b")).collect()}
        gemm = {r["vec_id"]: r["bucket"]
                for r in with_lsh_signature(base, "v", planes).collect()}
        assert expr == gemm
        assert len(set(gemm.values())) > 1  # corpus actually spreads

    def test_scaled_copy_pairs_always_found(self, spark, sf_dir):
        from docling_eval_spark.operators.similarity import (
            lsh_near_dup_pairs,
            with_scaled_copies,
        )

        emb = _emb(spark, sf_dir)
        n = emb.count()
        pairs = lsh_near_dup_pairs(with_scaled_copies(emb)).collect()
        assert len(pairs) == n  # every (v, 2v) pair, nothing else
        assert all(r["cosine"] == 1.0 for r in pairs)
        assert all(r["b"] - r["a"] == 1_000_000_000 for r in pairs)

    def test_hot_bucket_cap_engages(self, spark):
        """10k parallel vectors land in ONE hyperplane bucket; the cap
        must anti-join the bucket away (no quadratic 5*10^7-pair
        self-join) and the drop accounting must show it."""
        from docling_eval_spark.operators.similarity import (
            embedding_hot_buckets,
            lsh_near_dup_pairs,
        )

        n = 10_000
        base = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(*[(F.col("id") % 97 + 1).cast("double") * F.lit(s)
                      for s in (1.0, 2.0, 3.0, 5.0)]).alias("embedding"))
        # every vector is a scalar multiple of (1,2,3,5): one bucket
        capped = lsh_near_dup_pairs(base, n_planes=8, max_bucket_size=100)
        assert capped.count() == 0  # whole family dropped, not scored
        hot = embedding_hot_buckets(base, 100, n_planes=8).collect()
        assert len(hot) == 1 and hot[0]["n"] == n  # drops are visible
        # and with the cap off, a small slice really is all-pairs
        tiny = base.where(F.col("vec_id") < 5)
        pairs = lsh_near_dup_pairs(tiny, n_planes=8, max_bucket_size=None)
        assert pairs.count() == 10  # C(5,2) parallel pairs

    def test_auto_n_planes_scales_with_corpus(self):
        from docling_eval_spark.operators.similarity import auto_n_planes

        assert auto_n_planes(600) == 8            # small corpora keep 256
        assert auto_n_planes(10_000_000) == 18    # buckets track corpus
        assert auto_n_planes(10**12) == 30        # capped: one bigint sig
        assert auto_n_planes(0) == 8


class TestSemanticDedup:
    def test_keep_min_within_cluster_and_capped(self, spark):
        """SemDeDup drops every vector with a smaller-id same-cluster
        neighbor above threshold; hot clusters skip accountably."""
        from pyspark.sql import functions as F

        from docling_eval_spark.operators.similarity import semantic_dedup

        rows = [
            (1, [1.0, 0.0, 0.0], 0),
            (2, [2.0, 0.0, 0.0], 0),     # same direction as 1 -> drop
            (3, [0.0, 1.0, 0.0], 0),     # orthogonal -> keep
            (4, [1.0, 0.0, 0.0], 1),     # duplicate DIRECTION of 1 but
                                         # other cluster -> keep (by design)
            (5, [3.0, 0.0, 0.0], 1),     # same cluster as 4 -> drop
        ]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>, cl long")
        out = {r["vec_id"]: (r["semdedup_keep"], r["cluster_capped"])
               for r in semantic_dedup(df, threshold=0.95,
                                       bucket_col="cl").collect()}
        assert out == {1: (True, False), 2: (False, False),
                       3: (True, False), 4: (True, False),
                       5: (False, False)}
        # cap: cluster 0 (3 rows) past a cap of 2 -> everything kept,
        # flagged capped; cluster 1 (2 rows) still dedups
        capped = {r["vec_id"]: (r["semdedup_keep"], r["cluster_capped"])
                  for r in semantic_dedup(df, threshold=0.95,
                                          bucket_col="cl",
                                          max_cluster_size=2).collect()}
        assert capped[2] == (True, True) and capped[5] == (False, False)

    def test_kmeans_path_separated_clusters(self, spark):
        """Without a precomputed assignment, ivf_train clusters; well-
        separated direction families dedup within themselves only."""
        from docling_eval_spark.operators.similarity import semantic_dedup

        rows = []
        for g in range(4):
            base = [0.0] * 8
            base[g] = 1.0
            for i in range(6):
                v = list(base)
                v[g] = 1.0 + 0.001 * i        # near-identical directions
                rows.append((g * 10 + i, v))
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = semantic_dedup(df, threshold=0.95, n_clusters=4).collect()
        kept = sorted(r["vec_id"] for r in out if r["semdedup_keep"])
        # exactly one survivor per direction family, the min id
        assert kept == [0, 10, 20, 30]
