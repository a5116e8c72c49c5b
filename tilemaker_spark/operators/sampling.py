"""Deterministic corpus sampling for training-data mixes.

Training pipelines don't use rand() for subsetting: a sample must be
reproducible across reruns and stable under corpus growth (a doc's
in/out decision can't depend on which executor saw it). The standard
trick is a content/key hash compared against a threshold, which these
operators implement Spark-side with the same md5-derived 60-bit key
recipe the dedup operators use — so the DuckDB oracle twin reproduces
every decision bit-for-bit.

No reference analog (training-data extension, like the dedup family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# 2^60: the key below is 15 hex digits of md5, i.e. uniform on [0, 2^60)
_KEY_SPACE = 1 << 60


def _hash_key(col: str = "doc_id") -> F.Column:
    """Deterministic 60-bit sampling key: first 15 hex digits of
    md5(doc_id as string), parsed base-16. Uniform, reproducible,
    engine-portable (DuckDB computes the identical value)."""
    return (F.conv(F.substring(F.md5(F.col(col).cast("string")), 1, 15),
                   16, 10).cast("long"))


def hash_sample(docs: DataFrame, fraction: float,
                key_col: str = "doc_id") -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose hash key
    falls below fraction * 2^60. Pure filter — no shuffle, fully
    pushed into the scan's partition work, and the same rows survive
    on every rerun and every cluster size."""
    return docs.filter(_hash_key(key_col) < int(fraction * _KEY_SPACE))


def stratified_sample(docs: DataFrame, group_col: str,
                      fractions: dict[str, float],
                      default_fraction: float = 0.0,
                      key_col: str = "doc_id") -> DataFrame:
    """Per-group deterministic sampling with explicit per-stratum
    rates (the "mix 50% web, 10% forums" shape). The rate lookup is a
    CASE expression — no join, no shuffle; groups absent from
    `fractions` get default_fraction."""
    thr = F.lit(int(default_fraction * _KEY_SPACE))
    for g, frac in sorted(fractions.items()):
        thr = F.when(F.col(group_col) == g,
                     F.lit(int(frac * _KEY_SPACE))).otherwise(thr)
    return docs.filter(_hash_key(key_col) < thr)


def token_budget_sample(docs: DataFrame, group_col: str,
                        budget_tokens: int,
                        key_col: str = "doc_id") -> DataFrame:
    """Fill each group up to a token budget, in deterministic hash
    order: rows are ranked by the 60-bit key within their group and
    kept while the RUNNING token total (inclusive of the current doc)
    stays <= budget — so reruns and corpus-growth reshuffles admit the
    same prefix, and the first doc of a group is admitted even if it
    alone exceeds the budget (a budget that admits nothing is a
    configuration error, not a sample).

    One window per group (sort by key within the group's partition);
    the per-group state is a running sum, not a collect — groups
    stream through executors. A group hot enough to dominate a
    partition at 100 TB is the same skew story as any windowed
    operator: pre-filter with hash_sample to an upper bound first,
    then budget-fill the survivors.

    Returns the surviving docs plus (n_tokens, cum_tokens, take_rank).
    """
    n_tokens = F.size(F.split("text", " "))
    w = (Window.partitionBy(group_col)
         .orderBy(_hash_key(key_col), F.col(key_col)))
    ranked = (docs
              .withColumn("n_tokens", n_tokens.cast("long"))
              .withColumn("take_rank", F.row_number().over(w))
              .withColumn("cum_tokens",
                          F.sum("n_tokens").over(
                              w.rowsBetween(Window.unboundedPreceding, 0))))
    return ranked.filter((F.col("cum_tokens") <= budget_tokens) |
                         (F.col("take_rank") == 1))
