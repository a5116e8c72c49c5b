"""Similarity search over an embedding column (array<float>).

Training-data-pipeline extension (no reference analog). Two paths:

  * ``cosine_topk`` — brute-force exact top-k: broadcast the (small)
    probe set against the full corpus; the dot product is a JVM-side
    ``aggregate(zip_with(...))`` fold, so the scan stays inside
    whole-stage codegen — no Python in the hot path, no shuffle except
    the final per-probe top-k window.
  * ``ivf_topk`` — the scale path: corpus pre-bucketed by a coarse
    quantizer column (here the `label` column plays the IVF centroid-id
    role; a real deployment would assign cells via k-means), probes
    search only their own bucket — the equi-join prunes the candidate
    set exactly like an IVF inverted list.

Cosines are computed in float64 and rounded to 4 decimals before
ranking so ordering is reproducible across engines (oracle parity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def _cosine(a, b):
    """Sequential-fold cosine of two array<float> columns, in double."""
    def dot(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def cosine_topk(embeddings: DataFrame, probe_ids, k: int = 5) -> DataFrame:
    """Exact brute-force top-k cosine neighbors for each probe vector.

    probe_ids: iterable of vec_id values to use as probes. Returns
    (probe_id, vec_id, cos_sim, rank); self-matches excluded.
    """
    probes = (embeddings
              .filter(F.col("vec_id").isin(list(probe_ids)))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").alias("probe_emb")))
    cand = embeddings.crossJoin(F.broadcast(probes)) \
        .filter(F.col("vec_id") != F.col("probe_id"))
    cand = cand.withColumn(
        "cos_sim", F.round(_cosine(F.col("probe_emb"), F.col("embedding")), 4))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "cos_sim", "rank"))


def ivf_topk(embeddings: DataFrame, probe_ids, k: int = 5,
             bucket_col: str = "label") -> DataFrame:
    """IVF-style bucketed ANN: probes only scan their own coarse bucket.

    The bucket equi-join replaces the brute-force cross join — at 100 TB
    this is the difference between scanning the corpus per probe and
    scanning one inverted list per probe. Recall < 1 by construction
    (neighbors outside the probe's bucket are missed), exactly like IVF
    with nprobe=1. Returns (probe_id, vec_id, cos_sim, rank).
    """
    probes = (embeddings
              .filter(F.col("vec_id").isin(list(probe_ids)))
              .select(F.col("vec_id").alias("probe_id"),
                      F.col("embedding").alias("probe_emb"),
                      F.col(bucket_col).alias("bucket")))
    corpus = embeddings.withColumnRenamed(bucket_col, "bucket")
    cand = corpus.join(F.broadcast(probes), "bucket") \
        .filter(F.col("vec_id") != F.col("probe_id"))
    cand = cand.withColumn(
        "cos_sim", F.round(_cosine(F.col("probe_emb"), F.col("embedding")), 4))
    w = Window.partitionBy("probe_id").orderBy(
        F.col("cos_sim").desc(), F.col("vec_id"))
    return (cand.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("probe_id", "vec_id", "cos_sim", "rank"))


def embedding_dedup_pairs(embeddings: DataFrame,
                          threshold: float = 0.999,
                          bucket_col: str = "label") -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse buckets.

    (vec_a, vec_b, cos_sim) for pairs with cosine >= threshold; the
    bucket equi-join bounds the pair space (near-dups land in the same
    coarse cell with high probability).
    """
    a = embeddings.select(F.col("vec_id").alias("vec_a"),
                          F.col("embedding").alias("emb_a"),
                          F.col(bucket_col).alias("bucket"))
    b = embeddings.select(F.col("vec_id").alias("vec_b"),
                          F.col("embedding").alias("emb_b"),
                          F.col(bucket_col).alias("bucket"))
    pairs = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    pairs = pairs.withColumn(
        "cos_sim", F.round(_cosine(F.col("emb_a"), F.col("emb_b")), 4))
    return (pairs.filter(F.col("cos_sim") >= threshold)
            .select("vec_a", "vec_b", "cos_sim"))
