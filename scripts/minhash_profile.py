"""A/B profile: minhash_lsh_pairs with vs without the shingle
dedup exchange (round-5 change: non-distinct shingles feed MinHash
min + collect_set, both duplicate-insensitive).

Usage: python scripts/minhash_profile.py [sf_dir] [reps]
Prints per-variant min wall and checks row parity.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark import StorageLevel
from pyspark.sql import functions as F

from tilemaker_spark.operators import dedup as D
from tilemaker_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3


def lsh_pairs_distinct(docs):
    """Round-4 shape: distinct shingle table (the old default)."""
    sh = D.shingles(docs, 2, distinct=True).persist(
        StorageLevel.MEMORY_AND_DISK)
    sig = D._signatures_from_shingles(sh, 16).persist(
        StorageLevel.MEMORY_AND_DISK)
    banded = D._band_explode(sig, 16, 2)
    a = banded.select(F.col("doc_id").alias("doc_a"), "band_id", "band_hash")
    b = banded.select(F.col("doc_id").alias("doc_b"), "band_id", "band_hash")
    cand = (a.join(b, ["band_id", "band_hash"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").dropDuplicates()
            .persist(StorageLevel.MEMORY_AND_DISK))
    cand_ids = (cand.select(F.col("doc_a").alias("doc_id"))
                .union(cand.select(F.col("doc_b").alias("doc_id")))
                .dropDuplicates())
    sets = (sh.join(cand_ids, "doc_id", "left_semi")
            .groupBy("doc_id").agg(F.collect_set("shingle").alias("sh_set")))
    seta = sets.select(F.col("doc_id").alias("doc_a"),
                       F.col("sh_set").alias("set_a"))
    setb = sets.select(F.col("doc_id").alias("doc_b"),
                       F.col("sh_set").alias("set_b"))
    size_ok = (F.least(F.size("set_a"), F.size("set_b")) >=
               F.greatest(F.size("set_a"), F.size("set_b")) * 0.35)
    inter = F.size(F.array_intersect("set_a", "set_b"))
    union = F.size("set_a") + F.size("set_b") - inter
    out = (cand.join(seta, "doc_a").join(setb, "doc_b")
           .filter(size_ok)
           .withColumn("jaccard", F.round(inter / union, 6))
           .filter(F.col("jaccard") >= 0.35)
           .select("doc_a", "doc_b", "jaccard"))
    out._internal_persists = [sh, sig, cand]
    return out


def main():
    spark = get_spark("minhash_profile")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet") \
        .select("doc_id", "text")

    variants = {
        "distinct (r4)": lsh_pairs_distinct,
        "raw (r5)": lambda d: D.minhash_lsh_pairs(d),
    }
    rows = {}
    for name, fn in variants.items():
        times = []
        for _ in range(REPS):
            t0 = time.time()
            df = fn(docs)
            n = df.count()
            times.append(round(time.time() - t0, 2))
            for h in getattr(df, "_internal_persists", []):
                h.unpersist()
        rows[name] = n
        print(f"{name:16s} rows={n} walls={times} min={min(times)}")
    assert len(set(rows.values())) == 1, rows
    print("row parity OK")


if __name__ == "__main__":
    main()
