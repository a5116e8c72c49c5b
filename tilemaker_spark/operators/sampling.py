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
    """Deterministic 60-bit sampling key — the shared
    :func:`tilemaker_spark.operators.dedup.hash_key60` recipe, so one
    definition backs every hand-written DuckDB twin."""
    from tilemaker_spark.operators.dedup import hash_key60
    return hash_key60(col)


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


def token_budget_sample_naive(docs: DataFrame, group_col: str,
                              budget_tokens: int,
                              key_col: str = "doc_id") -> DataFrame:
    """Single-window reference formulation of :func:`token_budget_sample`
    — one `Window.partitionBy(group)` running sum, a literal transcription
    of the DuckDB oracle twin, so the two sides share the exact same plan
    shape and cannot diverge. This is the ORACLE-FACING variant: fine at
    contract scale (sf0.01), but a whole language lands in one partition,
    so production pipelines use the bucketed :func:`token_budget_sample`,
    which pytest pins equal to this one row-for-row."""
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = Window.partitionBy(group_col).orderBy("_key", key_col)
    ranked = (docs
              .withColumn("n_tokens", n_tokens)
              .withColumn("_key", _hash_key(key_col))
              .withColumn("take_rank", F.row_number().over(w).cast("int"))
              .withColumn("cum_tokens",
                          F.sum("n_tokens").over(
                              w.rowsBetween(Window.unboundedPreceding, 0))))
    return (ranked
            .filter((F.col("cum_tokens") <= budget_tokens) |
                    (F.col("take_rank") == 1))
            .drop("_key"))


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

    Scale shape: a naive `Window.partitionBy(group)` running sum puts
    an entire group (a LANGUAGE, at corpus scale) in one partition —
    the classic windowed-operator straggler. Instead the running sum is
    computed in two levels keyed by the top 12 bits of the hash key
    (4096 buckets, an order-preserving prefix of the sort key):

    1. a per-(group, bucket) token/count histogram — one map-side
       combinable groupBy, ~4096 rows per group;
    2. a per-group running sum OVER BUCKETS (window of <= 4096 rows),
       broadcast-joined back;
    3. per-(group, bucket) doc windows — each at most 1/4096th of the
       group — offset by the bucket's exclusive prefix totals.

    Global rank and running total are reconstructed exactly, so the
    output is identical to the single-window formulation (the DuckDB
    oracle twin IS that formulation). Costs one extra pass over
    (group, key, n_tokens) for the histogram; at web scale you would
    materialize a token-count column so that pass never touches text.

    Returns the surviving docs plus (n_tokens, cum_tokens, take_rank).
    """
    n_tokens = F.size(F.split("text", " ")).cast("long")
    key = _hash_key(key_col)
    bucket = F.shiftrightunsigned(key, 48)

    base = (docs
            .withColumn("n_tokens", n_tokens)
            .withColumn("_key", key)
            .withColumn("_bucket", bucket))

    hist = (base.groupBy(F.col(group_col).alias("_g"), "_bucket")
            .agg(F.sum("n_tokens").alias("_btok"),
                 F.count("*").alias("_bcnt")))
    wb = Window.partitionBy("_g").orderBy("_bucket")
    prefix = (hist
              .withColumn("_tok_excl",
                          F.coalesce(
                              F.sum("_btok").over(
                                  wb.rowsBetween(Window.unboundedPreceding,
                                                 -1)), F.lit(0)))
              .withColumn("_cnt_excl",
                          F.coalesce(
                              F.sum("_bcnt").over(
                                  wb.rowsBetween(Window.unboundedPreceding,
                                                 -1)), F.lit(0)))
              # buckets whose whole prefix already exceeds the budget
              # can admit nothing (rank-1 lives in the first bucket) —
              # prune them before the doc-level window
              .filter((F.col("_tok_excl") <= budget_tokens) |
                      (F.col("_cnt_excl") == 0))
              .select("_g", F.col("_bucket").alias("_pb"),
                      "_tok_excl", "_cnt_excl"))

    wd = (Window.partitionBy(group_col, "_bucket")
          .orderBy("_key", F.col(key_col)))
    ranked = (base.join(
                  F.broadcast(prefix),
                  (F.col(group_col) == F.col("_g")) &
                  (F.col("_bucket") == F.col("_pb")))
              .withColumn("take_rank",
                          (F.col("_cnt_excl") +
                           F.row_number().over(wd)).cast("int"))
              .withColumn("cum_tokens",
                          F.col("_tok_excl") +
                          F.sum("n_tokens").over(
                              wd.rowsBetween(Window.unboundedPreceding, 0))))
    return (ranked
            .filter((F.col("cum_tokens") <= budget_tokens) |
                    (F.col("take_rank") == 1))
            .drop("_g", "_pb", "_key", "_bucket", "_tok_excl",
                  "_cnt_excl"))


def pack_chunks_naive(docs: DataFrame, seq_len: int,
                      key_col: str = "doc_id") -> DataFrame:
    """Sequence packing (concat-and-chunk), single-window reference
    formulation — the ORACLE-FACING variant, a literal transcription of
    the DuckDB twin (same lesson as :func:`token_budget_sample_naive`).

    Pretraining pipelines don't feed one document per sequence: docs
    are concatenated in a deterministic order into one global token
    stream, which is cut into fixed-length training sequences of
    `seq_len` tokens (GPT-3 appendix B; "packing"). This computes, per
    document, which sequences (chunks) it lands in and the exact token
    spans: output (chunk_id, doc_id, tok_start, tok_end, chunk_pos,
    n_tokens) where [tok_start, tok_end) is the WITHIN-DOC token range
    that chunk takes and chunk_pos is where it sits inside the chunk.
    Every chunk except the last sums to exactly seq_len tokens; docs
    longer than seq_len straddle multiple chunks (truncation-free).

    Order is the shared 60-bit hash key (rerun- and growth-stable up
    to the stream suffix). The global window here puts the whole
    corpus in ONE partition — contract-scale only; production uses the
    bucketed :func:`pack_chunks`, pinned row-identical by pytest.
    """
    n_tokens = F.size(F.split("text", " ")).cast("long")
    w = (Window.orderBy("_key", key_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    base = (docs
            .withColumn("n_tokens", n_tokens)
            .withColumn("_key", _hash_key(key_col))
            .withColumn("_start", F.coalesce(F.sum("n_tokens").over(w),
                                             F.lit(0))))
    return _finish_pack(base, seq_len)


def _finish_pack(base: DataFrame, seq_len: int) -> DataFrame:
    """Explode (doc, _start, n_tokens) into per-chunk span rows —
    shared tail of both packer formulations."""
    first = F.floor(F.col("_start") / seq_len).cast("long")
    last = (F.floor((F.col("_start") + F.col("n_tokens") - 1) / seq_len)
            .cast("long"))
    exploded = base.withColumn(
        "chunk_id", F.explode(F.sequence(first, last)))
    cstart = F.col("chunk_id") * seq_len
    tok_start = F.greatest(F.lit(0), cstart - F.col("_start"))
    tok_end = F.least(F.col("n_tokens"),
                      cstart + seq_len - F.col("_start"))
    chunk_pos = F.greatest(cstart, F.col("_start")) - cstart
    return (exploded
            .select("chunk_id", "doc_id",
                    tok_start.cast("long").alias("tok_start"),
                    tok_end.cast("long").alias("tok_end"),
                    chunk_pos.cast("long").alias("chunk_pos"),
                    "n_tokens"))


def pack_chunks(docs: DataFrame, seq_len: int,
                key_col: str = "doc_id") -> DataFrame:
    """Scale-path sequence packing: identical output to
    :func:`pack_chunks_naive`, with the global exclusive prefix sum
    computed in two levels keyed by the top 12 bits of the hash key
    (the :func:`token_budget_sample` recipe, minus the group column):

    1. per-bucket token totals — one map-side combinable groupBy into
       <= 4096 rows;
    2. a running sum over those buckets — a single window over <= 4096
       rows (the one intentionally tiny single-partition window),
       broadcast back;
    3. per-bucket doc windows (each ~1/4096th of the corpus) offset by
       the bucket's exclusive total.

    Global token offsets are reconstructed exactly, so chunk identity,
    spans and positions match the naive plan bit-for-bit (pinned by
    tests/test_sampling.py). Cost: one extra pass over (key, n_tokens)
    for the histogram; at web scale materialize the token-count column
    so that pass never touches text.
    """
    n_tokens = F.size(F.split("text", " ")).cast("long")
    key = _hash_key(key_col)
    base = (docs
            .withColumn("n_tokens", n_tokens)
            .withColumn("_key", key)
            .withColumn("_bucket", F.shiftrightunsigned("_key", 48)))

    hist = base.groupBy("_bucket").agg(F.sum("n_tokens").alias("_btok"))
    wb = Window.orderBy("_bucket")
    prefix = (hist
              .withColumn("_tok_excl",
                          F.coalesce(
                              F.sum("_btok").over(
                                  wb.rowsBetween(Window.unboundedPreceding,
                                                 -1)), F.lit(0)))
              .select(F.col("_bucket").alias("_pb"), "_tok_excl"))

    wd = (Window.partitionBy("_bucket").orderBy("_key", key_col)
          .rowsBetween(Window.unboundedPreceding, -1))
    offset = (base.join(F.broadcast(prefix),
                        F.col("_bucket") == F.col("_pb"))
              .withColumn("_start",
                          F.col("_tok_excl") +
                          F.coalesce(F.sum("n_tokens").over(wd), F.lit(0))))
    return _finish_pack(offset, seq_len)


def dsir_score(docs: DataFrame, target: DataFrame,
               n_buckets: int = 64,
               threshold: float | None = None) -> DataFrame:
    """DSIR-shaped data selection (Xie et al. 2023, arXiv:2302.03169,
    "Data Selection for Language Models via Importance Resampling"):
    score every raw-corpus document by how much its hashed n-gram
    features look like a small TARGET domain, then keep the
    target-like slice.

    Features are DSIR's: token bigrams hashed into ``n_buckets``
    buckets (the paper uses hashed unigram+bigram counts). The
    per-doc statistic here is the RATIO OF INTEGER MASSES

        score = (Σ_f c_f(x) · t_f) / (Σ_f c_f(x) · r_f)

    where c_f(x) is the doc's count of feature f and t_f / r_f are the
    feature's global occurrence counts in the target / raw corpora —
    i.e. the average target-affinity of the doc's feature occurrences.
    The paper's importance weight is Π_f (p_t/p_r)^{c_f}; its log-sum
    needs ln(), whose last ulp is not portable across engines (the
    tfidf_keywords / lm_corpus_fit lesson), so this linearized
    surrogate keeps everything in exact integer sums plus ONE
    correctly-rounded IEEE division — bit-identical on any engine.
    Docs with fewer than 2 tokens have no features and are excluded
    (DSIR can't place them either way).

    ``threshold``: keep decision ``selected = score >= threshold`` — a
    pure filter, no global sort (an exact global top-N would need the
    bucketed-rank recipe from ``build_vocab``; a threshold is the
    growth-stable form). None → selected computed against the corpus
    mean ratio is NOT offered: pick an explicit, documented constant.

    Returns (doc_id, n_feats, tgt_mass, raw_mass, score, selected).

    Scale shape: the raw token stream is shuffled ONCE, as
    map-side-combinable (doc_id, f) partial counts; the two global
    feature tables are partial aggs reduced to ``n_buckets`` rows and
    broadcast; the final per-doc reduction is one more partial-agg
    groupBy. Corpus text never shuffles; nothing quadratic; the only
    driver-side object is the O(n_buckets) broadcast.
    """
    from tilemaker_spark.operators.dedup import hash_key60
    from tilemaker_spark.operators.text_analysis import _doc_bigrams

    def feats(d: DataFrame) -> DataFrame:
        fb = _doc_bigrams(d)
        return fb.select(
            "doc_id",
            (hash_key60(F.concat_ws(" ", "w1", "w2"))
             % n_buckets).alias("f"))

    tgt = feats(target).groupBy("f").agg(F.count("*").alias("t_f"))
    # the raw feature stream feeds BOTH the global counts and the
    # per-doc counts — persist once, caller releases (house rule)
    raw_feats = feats(docs).persist()
    raw = raw_feats.groupBy("f").agg(F.count("*").alias("r_f"))
    weights = (raw.join(tgt, "f", "left")
               .select("f", F.coalesce("t_f", F.lit(0)).alias("t_f"),
                       "r_f"))
    doc_feat = raw_feats.groupBy("doc_id", "f").agg(
        F.count("*").alias("c"))
    scored = (doc_feat.join(F.broadcast(weights), "f")
              .groupBy("doc_id")
              .agg(F.sum("c").alias("n_feats"),
                   F.sum(F.col("c") * F.col("t_f")).alias("tgt_mass"),
                   F.sum(F.col("c") * F.col("r_f")).alias("raw_mass")))
    score = F.round(F.col("tgt_mass") / F.col("raw_mass"), 6)
    out = scored.select("doc_id", "n_feats", "tgt_mass", "raw_mass",
                        score.alias("score"))
    if threshold is not None:
        out = out.withColumn("selected", F.col("score") >= threshold)
    out._internal_persists = [raw_feats]
    return out
