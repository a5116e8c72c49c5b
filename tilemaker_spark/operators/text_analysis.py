"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

Training-data-pipeline extensions (no reference analog). Everything
except the winnowing fingerprint is pure Column expressions (JVM-side,
codegen) with exact ANSI-SQL twins for the DuckDB oracle; the winnowing
fingerprint is a vectorized pandas UDF (Arrow-batched, no per-row
Python at the Spark API level).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf

STOPWORDS = ["the", "a", "of", "and", "to", "in"]


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics.

    (doc_id, n_chars_txt, n_tokens, n_uniq, avg_token_len, uniq_ratio)
    — whitespace tokenization; ratios rounded to 6 for oracle parity.
    """
    toks = F.split("text", " ")
    n_tokens = F.size(toks)
    n_uniq = F.size(F.array_distinct(toks))
    n_chars = F.length("text")
    avg_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 6)
    return docs.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_txt"),
        n_tokens.cast("long").alias("n_tokens"),
        n_uniq.cast("long").alias("n_uniq"),
        avg_len.alias("avg_token_len"),
        F.round(n_uniq.cast("double") / n_tokens, 6).alias("uniq_ratio"),
    )


# GPT-2-style pre-tokenizer classes, RE2-safe (no lookaheads, so the
# Java-regex Spark side and the RE2 DuckDB oracle agree exactly):
# a letter run, a digit run, or a punctuation run; whitespace separates.
BPE_TOKEN_RE = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \\t\\n]+"


def bpe_token_count(docs: DataFrame) -> DataFrame:
    """BPE-ish token accounting per document (training-data budgeting):
    pre-tokenizer piece count via one JVM-side regexp_count — the
    standard proxy for tokenizer load before running a real BPE merge
    table. Returns (doc_id, n_bpe_tokens, n_ws_tokens,
    chars_per_token) with the ratio rounded to 6 (oracle parity)."""
    n_bpe = F.regexp_count("text", F.lit(BPE_TOKEN_RE))
    n_ws = F.size(F.split("text", " "))
    return docs.select(
        "doc_id",
        n_bpe.cast("long").alias("n_bpe_tokens"),
        n_ws.cast("long").alias("n_ws_tokens"),
        F.round(F.length("text") / F.greatest(n_bpe, F.lit(1)), 6)
        .alias("chars_per_token"),
    )


def quality_score(docs: DataFrame, min_tokens: int = 20,
                  max_stop_ratio: float = 0.4) -> DataFrame:
    """Heuristic quality score per document.

    score = 0.5*min(1, n_tokens/100) + 0.3*uniq_ratio
          + 0.2*(1 - stop_ratio); keep = score >= 0.5 and
    n_tokens >= min_tokens and stop_ratio <= max_stop_ratio.
    Returns (doc_id, n_tokens, stop_ratio, uniq_ratio, score, keep).
    """
    toks = F.split("text", " ")
    n_tokens = F.size(toks).cast("double")
    n_uniq = F.size(F.array_distinct(toks)).cast("double")
    stops = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t))) \
        .cast("double")
    stop_ratio = F.round(n_stop / n_tokens, 6)
    uniq_ratio = F.round(n_uniq / n_tokens, 6)
    score = F.round(
        F.lit(0.5) * F.least(F.lit(1.0), n_tokens / F.lit(100.0))
        + F.lit(0.3) * (n_uniq / n_tokens)
        + F.lit(0.2) * (F.lit(1.0) - n_stop / n_tokens), 6)
    return docs.select(
        "doc_id",
        n_tokens.cast("long").alias("n_tokens"),
        stop_ratio.alias("stop_ratio"),
        uniq_ratio.alias("uniq_ratio"),
        score.alias("score"),
        ((score >= 0.5) & (n_tokens >= min_tokens)
         & (stop_ratio <= max_stop_ratio)).alias("keep"),
    )


# Deterministic char-class markers per language for the rule-based
# language-ID heuristic (n-gram-frequency stand-in that both Spark and
# the SQL oracle can evaluate identically on the synthetic corpus).
_LANG_MARKERS = [
    ("en", ["the", "is", "and"]),
    ("de", ["der", "und", "ist"]),
    ("fr", ["le", "et", "est"]),
    ("es", ["el", "y", "es"]),
    ("zh", []),
]


def lang_id(docs: DataFrame) -> DataFrame:
    """Rule-based language ID: first language whose marker stopword
    appears among the tokens wins; fallback 'und'. Returns
    (doc_id, lang, lang_pred, agree)."""
    toks = F.split("text", " ")
    pred = F.lit("und")
    for lang, markers in reversed(_LANG_MARKERS):
        if not markers:
            continue
        cond = None
        for m in markers:
            c = F.array_contains(toks, m)
            cond = c if cond is None else (cond | c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    return docs.select("doc_id", "lang", pred.alias("lang_pred"),
                       (F.col("lang") == pred).alias("agree"))


# ------------------------------------------- bigram LM corpus fit

def _doc_bigrams(docs: DataFrame) -> DataFrame:
    """Token bigram occurrences per document, with multiplicity:
    (doc_id, w1, w2). Docs under 2 tokens yield nothing (the size
    guard also keeps Spark's descending sequence(1, 0) corner out)."""
    toks = (docs.select("doc_id", F.split("text", " ").alias("w"))
            .filter(F.size("w") >= 2))
    return (toks.select("doc_id", F.explode(F.expr(
        "transform(sequence(1, size(w) - 1), i -> struct("
        "element_at(w, i) AS w1, element_at(w, i + 1) AS w2))"))
        .alias("b"))
        .select("doc_id", "b.w1", "b.w2"))


def bigram_lm_score(score_docs: DataFrame, train_docs: DataFrame,
                    alpha: float = 0.5) -> DataFrame:
    """Corpus-fit scoring via a bigram LM trained on the corpus — the
    CCNet perplexity-filter shape (train a small LM, score every doc,
    drop the tails), self-contained with an add-alpha bigram model.

    TRAIN: bigram counts C(w1,w2) and prefix counts C(w1) are two
    map-side-combined groupBys over the training bigram stream
    (persisted once); vocabulary size V is a one-row broadcast.
    SCORE: each scored doc's bigrams left-join the two count tables
    (plain equi-joins; the hot-prefix skew on w1 — think "the" — is
    AQE skew-join territory at 100 TB), then one groupBy folds
    per-doc totals. Linear end to end, nothing driver-side.

    Returns (doc_id, n_bigrams, oov_bigrams, avg_bigram_df, oov_ratio,
    xent, ppl):

    - n_bigrams/oov_bigrams and the two ratios are exact integer
      arithmetic — the oracle-checkable columns;
    - xent = -mean log2 p(w2|w1), ppl = 2^xent with
      p = (C(w1,w2)+alpha) / (C(w1)+alpha*V) — float columns verified
      by brute-force pytest, NOT hash-pinned: a groupBy float sum's
      addition order is nondeterministic across engines.
    """
    from pyspark import StorageLevel
    tb = _doc_bigrams(train_docs).persist(StorageLevel.MEMORY_AND_DISK)
    cb = tb.groupBy("w1", "w2").agg(F.count("*").alias("cb"))
    cw = tb.groupBy("w1").agg(F.count("*").alias("cw"))
    vocab = (train_docs
             .select(F.explode(F.split("text", " ")).alias("t"))
             .agg(F.count_distinct("t").alias("v")))
    sb = _doc_bigrams(score_docs)
    j = (sb.join(cb, ["w1", "w2"], "left")
         .join(cw, "w1", "left")
         .crossJoin(F.broadcast(vocab))
         .withColumn("cb", F.coalesce("cb", F.lit(0)))
         .withColumn("cw", F.coalesce("cw", F.lit(0))))
    p = (F.col("cb") + F.lit(alpha)) / (F.col("cw") + F.lit(alpha) * F.col("v"))
    j = j.withColumn("lp", F.log(2.0, p))
    out = (j.groupBy("doc_id")
           .agg(F.count("*").alias("n_bigrams"),
                F.sum(F.when(F.col("cb") == 0, 1).otherwise(0))
                .cast("long").alias("oov_bigrams"),
                F.sum("cb").alias("sum_bigram_df"),
                F.sum("lp").alias("sum_lp"))
           .withColumn("avg_bigram_df",
                       F.round(F.col("sum_bigram_df") / F.col("n_bigrams"), 6))
           .withColumn("oov_ratio",
                       F.round(F.col("oov_bigrams") / F.col("n_bigrams"), 6))
           .withColumn("xent", -F.col("sum_lp") / F.col("n_bigrams"))
           .select("doc_id", "n_bigrams", "oov_bigrams", "avg_bigram_df",
                   "oov_ratio", F.round("xent", 4).alias("xent"),
                   F.round(F.pow(F.lit(2.0), F.col("xent")), 4).alias("ppl")))
    out._internal_persists = [tb]
    return out


# --------------------------------------------- html -> text extraction

def extract_text_from_html(pages: DataFrame,
                           html_col: str = "html") -> DataFrame:
    """HTML -> text extraction over the binary ``html`` column — the
    Common-Crawl ingest step of the mandated pages table
    (url, warc_ts, html:binary, text, lang). The north-rule per-row
    invariant is that the EXTRACTED text is byte-identical per url;
    this operator makes that checkable end-to-end instead of treating
    the stored ``text`` column as given.

    Entirely JVM-side Column expressions (regexp_replace / replace
    under whole-stage codegen — no Python in the hot path), with an
    exact ANSI-SQL twin for the DuckDB oracle. Extraction rules, in
    order (each step is deterministic and oracle-reproducible):

      1. decode the bytes as UTF-8;
      2. drop <script>...</script> and <style>...</style> blocks
         including their content (case-insensitive, dot-matches-all,
         lazy — so a ``<`` inside script text never leaks);
      3. replace every remaining tag ``<...>`` with a space (block
         tags separate words; the whitespace collapse below undoes
         the cost for inline tags);
      4. unescape the five named XML entities, ``&amp;`` LAST so an
         escaped entity (``&amp;lt;``) does not double-decode;
      5. collapse whitespace runs to a single space and trim.

    Returns the input plus ``text_extracted``. Regexes avoid
    backreferences and lookaround so the Java-regex Spark side and
    the RE2 DuckDB side agree byte-for-byte.
    """
    s = F.decode(F.col(html_col), "utf-8")
    s = F.regexp_replace(s, r"(?is)<script[^>]*>.*?</script>", " ")
    s = F.regexp_replace(s, r"(?is)<style[^>]*>.*?</style>", " ")
    s = F.regexp_replace(s, r"<[^>]*>", " ")
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&#39;", "'"), ("&amp;", "&")):
        s = F.replace(s, F.lit(ent), F.lit(ch))
    s = F.trim(F.regexp_replace(s, r"\s+", " "))
    return pages.withColumn("text_extracted", s)


#: DuckDB/ANSI-SQL twin of :func:`extract_text_from_html` — a SQL
#: expression template over a VARCHAR column name (RE2 'g' flag makes
#: regexp_replace global like Java's default).
SQL_EXTRACT_TEXT = (
    "trim(regexp_replace("
    "replace(replace(replace(replace(replace("
    "regexp_replace(regexp_replace(regexp_replace({col}, "
    "'(?is)<script[^>]*>.*?</script>', ' ', 'g'), "
    "'(?is)<style[^>]*>.*?</style>', ' ', 'g'), "
    "'<[^>]*>', ' ', 'g'), "
    "'&lt;', '<'), '&gt;', '>'), '&quot;', '\"'), "
    "'&#39;', ''''), '&amp;', '&'), "
    "'\\s+', ' ', 'g'))"
)


# --------------------------------------------- winnowing fingerprint

def winnow_fingerprints(docs: DataFrame, k: int = 5, window: int = 4) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03):
    rolling polynomial hash over k-grams of characters, minimum per
    sliding window, rightmost-min tie-break. Vectorized pandas UDF.

    Returns (doc_id, fingerprints: array<long>) — the selected hash set
    in document order (deduplicated, order of first occurrence).
    """
    B, M = 257, (1 << 61) - 1
    # Per-digit mod tables: T[j][v] = v * B^(k-1-j) mod M, so the k-gram
    # hash is a TABLE-LOOKUP SUM — k uint64 adds per position, no
    # per-character Python. Sum bound: k * (M-1) < 2^64 for k <= 8, so
    # uint64 accumulates exactly; one final % M gives values identical
    # to the sequential Horner/rolling formulation.
    assert k <= 8, "k <= 8 keeps the uint64 accumulator overflow-free"
    tables = np.array(
        [[(v * pow(B, k - 1 - j, M)) % M for v in range(256)]
         for j in range(k)], dtype=np.uint64)

    @pandas_udf("array<long>")
    def winnow(texts: pd.Series) -> pd.Series:
        from numpy.lib.stride_tricks import sliding_window_view
        out = []
        for t in texts:
            s = t or ""
            vals = np.frombuffer(s.encode("utf-8", "replace"), dtype=np.uint8)
            n = len(vals)
            if n < k:
                out.append([])
                continue
            m = n - k + 1
            acc = np.zeros(m, dtype=np.uint64)
            for j in range(k):
                acc += tables[j][vals[j:j + m]]
            h = (acc % np.uint64(M)).astype(np.int64)
            if len(h) <= window:
                out.append([int(h.min())])
                continue
            # rightmost window minimum: argmin over REVERSED windows
            # (argmin picks the first occurrence = rightmost original)
            W = sliding_window_view(h, window)[:, ::-1]
            amin = W.argmin(axis=1)
            j_sel = np.arange(len(W)) + (window - 1) - amin
            keep = np.empty(len(j_sel), dtype=bool)
            keep[0] = True
            np.not_equal(j_sel[1:], j_sel[:-1], out=keep[1:])
            out.append(pd.unique(h[j_sel[keep]]).tolist())
        return pd.Series(out)

    return docs.select("doc_id", winnow(F.col("text")).alias("fingerprints"))


# ------------------------------------------------- event sessionization

def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gaps-and-islands sessionization over an event stream (classic
    large-pipeline op; no reference analog): a new session starts when
    a user's inter-event gap exceeds ``gap_minutes``.

    Pure window functions — lag to flag session starts, a running sum
    to number them — so the single shuffle is the user_id partition;
    session aggregation then reuses the same partitioning (no second
    exchange under Catalyst). Returns one row per session:
    (user_id, session_no, n_events, started_epoch, duration_s,
    total_value).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(
        F.lag("ts").over(w))
    flagged = events.withColumn(
        "_new", F.when(gap.isNull() | (gap > gap_minutes * 60), 1)
        .otherwise(0))
    numbered = flagged.withColumn(
        "session_no", F.sum("_new").over(
            Window.partitionBy("user_id").orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
    return (numbered.groupBy("user_id", "session_no")
            .agg(F.count("*").alias("n_events"),
                 F.min(F.unix_timestamp("ts")).alias("started_epoch"),
                 (F.max(F.unix_timestamp("ts"))
                  - F.min(F.unix_timestamp("ts"))).alias("duration_s"),
                 F.round(F.sum("value"), 6).alias("total_value"))
            .select("user_id", "session_no", "n_events", "started_epoch",
                    "duration_s", "total_value"))


def classifier_score(docs: DataFrame, weights: DataFrame,
                     n_buckets: int = 1024, bias: float = 0.0,
                     threshold: float = 0.5,
                     round_decimals: int = 6) -> DataFrame:
    """Hashed linear quality-classifier inference — the
    fasttext-style "classifier filter" stage of a GPT-3/LLaMA-shape
    curation pipeline (score every document against a trained linear
    model over hashed bag-of-words features, keep above threshold).
    Training happens offline; this is the corpus-scale INFERENCE pass.

    ``weights`` is the model: (bucket: long, weight: double) with
    buckets in [0, n_buckets). Each token hashes to a bucket via the
    shared md5 60-bit key recipe mod n_buckets (the engine-portable
    feature-hashing trick — no vocab file to ship, collisions are part
    of the model exactly as in fasttext's hashing trick);
    logit = bias + mean(bucket weights over the doc's tokens);
    prob = sigmoid(logit). Returns (doc_id, n_tokens, logit, prob,
    keep). logit is rounded to ``round_decimals`` BEFORE the sigmoid
    so a DuckDB oracle computes exp() from the identical double
    (round-before-use rule), and prob is rounded after.

    Scale shape: one explode, one BROADCAST join against the O(buckets)
    weight vector (a model of any realistic width fits), one
    map-side-combinable groupBy(doc_id) — the corpus text is scanned
    once and never shuffled; only (doc_id, partial sums) move.
    """
    toks = docs.select("doc_id",
                       F.explode(F.split("text", " ")).alias("tok"))
    bucket = (F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10)
              .cast("long") % n_buckets)
    agg = (toks.withColumn("bucket", bucket)
           .join(F.broadcast(weights), "bucket")
           .groupBy("doc_id")
           .agg(F.sum("weight").alias("_wsum"),
                F.count("*").alias("n_tokens")))
    logit = F.round(F.lit(bias) + F.col("_wsum") / F.col("n_tokens"),
                    round_decimals)
    return (agg
            .withColumn("logit", logit)
            .withColumn("prob",
                        F.round(F.lit(1.0) /
                                (F.lit(1.0) + F.exp(-F.col("logit"))),
                                round_decimals))
            .withColumn("keep", (F.col("prob") >= threshold))
            .select("doc_id", "n_tokens", "logit", "prob", "keep"))


def tfidf_keywords(docs: DataFrame, k: int = 5, min_len: int = 2,
                   round_decimals: int = 6) -> DataFrame:
    """Per-document keyword extraction: the top-k terms of each doc by
    a tf-idf-shape rarity score (topic tagging / corpus-drift analysis
    over a crawl — "what is this page about" without a model).

    Score = tf / df — term frequency in the doc over document
    frequency in the corpus. A single IEEE-754 division is CORRECTLY
    ROUNDED by spec, so Spark and any SQL oracle compute the identical
    double from identical integer inputs; the classical tf·ln(N/df)
    ranks by a libm call whose last ulp is NOT portable across engines
    (same reason lm_corpus_fit hash-pins only integer columns). tf/df
    is monotone in tf and anti-monotone in df — the same keyword
    ordering tf-idf targets. Rounded BEFORE ranking (round-before-use
    rule), ties broken by term.

    Returns (doc_id, term, tf, df, score, rnk), rnk 1..k per doc.

    Scale shape: tokenize-and-count is one map-side-combinable
    groupBy(doc_id, term); df is a second partial agg over that result
    (already distinct per doc — no countDistinct shuffle of raw
    tokens); the join back is term-keyed on two already-aggregated
    O(doc·vocab) tables, never the raw token stream. The per-doc
    window partitions on doc_id — millions of independent partitions,
    each bounded by the doc's vocabulary, no global sort. The doc-term
    table feeds two branches, so it is persisted and exposed via
    ``_internal_persists`` (caller releases).
    """
    from pyspark.sql import Window

    toks = (docs.select("doc_id",
                        F.explode(F.split("text", " ")).alias("term"))
            .filter(F.length("term") >= min_len))
    dt = (toks.groupBy("doc_id", "term")
          .agg(F.count("*").alias("tf"))
          .persist())
    dfreq = dt.groupBy("term").agg(F.count("*").alias("df"))
    scored = (dt.join(dfreq, "term")
              .withColumn("score",
                          F.round(F.col("tf") / F.col("df"),
                                  round_decimals)))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"),
                                             F.asc("term"))
    out = (scored.withColumn("rnk", F.row_number().over(w))
           .filter(F.col("rnk") <= k)
           .select("doc_id", "term", "tf", "df", "score", "rnk"))
    out._internal_persists = [dt]
    return out


def _vocab_counts(docs, min_count: int):
    return (docs.select(F.explode(F.split("text", " ")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("term").agg(F.count("*").alias("n"))
            .filter(F.col("n") >= min_count))


def build_vocab_naive(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """Frequency-ranked vocabulary construction (the tokenizer-vocab /
    BPE-init step): (term, n, vocab_id) with 0-based ids assigned by
    (count desc, term asc). NAIVE formulation — one global row_number
    window, i.e. a single-partition sort of the whole vocabulary. This
    is the oracle-facing twin; `build_vocab` is the scale path and is
    pinned row-identical by tests/test_text_lm.py.
    """
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("n"), F.asc("term"))
    return (_vocab_counts(docs, min_count)
            .withColumn("vocab_id",
                        (F.row_number().over(w) - 1).cast("long"))
            .select("term", "n", "vocab_id"))


def build_vocab(docs: DataFrame, min_count: int = 1) -> DataFrame:
    """Scale-path vocabulary construction: identical output to
    :func:`build_vocab_naive` with NO global single-partition sort.
    The global rank decomposes exactly (the pack_chunks two-level
    prefix-sum recipe, generalized to the (count desc, term asc) key):

      vocab_id = |terms with higher count|                      (A)
               + |same-count terms in earlier term-prefix buckets| (B)
               + rank within the (count, prefix) bucket - 1      (C)

    (A) is an exclusive prefix sum over the COUNT HISTOGRAM — O(distinct
    counts) rows (Zipf: ~sqrt(total tokens)), one intentionally tiny
    single-partition window, broadcast back. (B) likewise over the
    (count, 1-char term prefix) histogram, partitioned by count. (C) is
    a row_number windowed per (count, prefix) bucket — the hot
    count=1 tail is split across the alphabet instead of one mega
    partition; a deeper prefix is a drop-in if a corpus needs it.
    """
    from pyspark.sql import Window

    tf = (_vocab_counts(docs, min_count)
          .withColumn("_pfx", F.substring("term", 1, 1)))

    ch = tf.groupBy("n").agg(F.count("*").alias("_nt"))
    wa = Window.orderBy(F.desc("n")) \
        .rowsBetween(Window.unboundedPreceding, -1)
    ahead = (ch.withColumn("_a", F.coalesce(F.sum("_nt").over(wa),
                                            F.lit(0)))
             .select(F.col("n").alias("_an"), "_a"))

    ph = tf.groupBy("n", "_pfx").agg(F.count("*").alias("_pt"))
    wb = Window.partitionBy("n").orderBy("_pfx") \
        .rowsBetween(Window.unboundedPreceding, -1)
    pref = (ph.withColumn("_b", F.coalesce(F.sum("_pt").over(wb),
                                           F.lit(0)))
            .select(F.col("n").alias("_pn"), F.col("_pfx").alias("_pp"),
                    "_b"))

    wc = Window.partitionBy("n", "_pfx").orderBy("term")
    return (tf
            .join(F.broadcast(ahead), F.col("n") == F.col("_an"))
            .join(F.broadcast(pref), (F.col("n") == F.col("_pn")) &
                                     (F.col("_pfx") == F.col("_pp")))
            .withColumn("vocab_id",
                        (F.col("_a") + F.col("_b") +
                         F.row_number().over(wc) - 1).cast("long"))
            .select("term", "n", "vocab_id"))


def gopher_rules(docs: DataFrame, min_words: int = 50,
                 max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 min_stop_hits: int = 2,
                 min_alpha_ratio: float = 0.8) -> DataFrame:
    """Gopher-style quality rule battery (the published rule-list
    filter: word-count bounds, mean-word-length bounds, a
    must-contain-stopwords rule, and an alphabetic-word-ratio rule) —
    the deterministic rule screen that runs before any learned quality
    model. Complements `quality_score` (weighted heuristic score):
    this is the per-rule boolean battery with keep = AND of all rules.

    Returns (doc_id, n_words, mean_word_len, stop_hits, alpha_ratio,
    r_words, r_wordlen, r_stop, r_alpha, keep). Ratios are rounded to
    6 BEFORE the threshold comparisons (round-before-use rule), and
    stop_hits counts DISTINCT stopwords present via a fixed sum of
    array_contains terms — the same closed form the SQL oracle runs.

    Scale shape: pure Column expressions over one pass of the text —
    zero shuffles, whole-stage codegen, trivially 1000-executor
    parallel.
    """
    toks = F.split("text", " ")
    n_words = F.size(toks).cast("long")
    word_chars = F.aggregate(
        toks, F.lit(0), lambda acc, t: acc + F.length(t)).cast("double")
    mean_len = F.round(word_chars / n_words, 6)
    stop_hits = sum(
        (F.array_contains(toks, s).cast("int") for s in STOPWORDS),
        F.lit(0)).cast("long")
    n_alpha = F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]")))
    alpha_ratio = F.round(n_alpha.cast("double") / n_words, 6)
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_wordlen = (mean_len >= min_mean_word_len) & \
                (mean_len <= max_mean_word_len)
    r_stop = stop_hits >= min_stop_hits
    r_alpha = alpha_ratio >= min_alpha_ratio
    return docs.select(
        "doc_id", n_words.alias("n_words"), mean_len.alias("mean_word_len"),
        stop_hits.alias("stop_hits"), alpha_ratio.alias("alpha_ratio"),
        r_words.alias("r_words"), r_wordlen.alias("r_wordlen"),
        r_stop.alias("r_stop"), r_alpha.alias("r_alpha"),
        (r_words & r_wordlen & r_stop & r_alpha).alias("keep"))


# ------------------------------------------------- BPE merge training

#: replace passes per merge step — a padded-separator replace consumes
#: the shared boundary pipe, so one pass merges only alternating
#: occurrences inside a run of the same pair; each pass halves the
#: remainder, and 5 passes reach the fixpoint for runs up to 2^5
#: adjacent occurrences (words far longer than any real token).
_BPE_REPLACE_PASSES = 5


def learn_bpe_merges(docs: DataFrame, n_merges: int = 3) -> DataFrame:
    """BPE merge training (Sennrich et al. 2016, arXiv:1508.07909) —
    learn the first ``n_merges`` byte-pair merges from the corpus:
    repeatedly find the adjacent symbol pair with the highest total
    frequency (weighted by word count) and fuse it into one symbol.
    `build_vocab` is the init step of this algorithm; this is the
    iterative half that actually learns a tokenizer.

    Symbol sequences are pipe-padded strings (``|h|e|l|l|o|``) so the
    merge is a plain substring replace — identical non-overlapping
    left-to-right semantics on any engine — applied
    ``_BPE_REPLACE_PASSES`` times per step (see the constant; a single
    pass misses alternating occurrences inside a same-pair run).
    Ties on pair frequency break lexicographically on (lhs, rhs) —
    binary string order, identical across engines for the SQL twin.
    Words containing a literal ``|`` would corrupt the padding; both
    engines transform them identically so parity holds, but callers
    should pre-filter such tokens for semantic correctness.

    Returns (rank, lhs, rhs, pair_n): the learned merge table in
    order, pair_n the merged pair's weighted frequency at learn time.

    Scale shape: training runs on the DISTINCT-WORD count table (the
    classic BPE trick — corpus scale enters only through the one
    word-count groupBy; at 10¹² docs the word table is ~10⁸ rows).
    Each step is one map-side-combinable pair-count groupBy plus a
    driver-side argmax of ONE row (``limit(1)`` — the same bounded
    driver action as k-means' centroid pull), then a codegen string
    replace. Driver traffic is O(n_merges) rows total.
    """
    spark = docs.sparkSession
    wc = (docs.select(F.explode(F.split("text", " ")).alias("word"))
          .filter(F.length("word") > 0)
          .groupBy("word").agg(F.count("*").alias("wn")))
    cur = wc.select(
        F.concat(F.lit("|"),
                 F.regexp_replace("word", "(.)", "$1|")).alias("seq"),
        "wn").persist()

    merges = []
    handles = [cur]
    for rank in range(1, n_merges + 1):
        toks = cur.select(
            F.split(F.expr("trim(BOTH '|' FROM seq)"), "[|]").alias("t"),
            "wn").filter(F.size("t") >= 2)
        pairs = toks.select(F.explode(F.expr(
            "transform(sequence(1, size(t) - 1), i -> struct("
            "element_at(t, i) AS lhs, element_at(t, i + 1) AS rhs))"))
            .alias("p"), "wn")
        pc = pairs.groupBy("p.lhs", "p.rhs").agg(F.sum("wn").alias("pair_n"))
        top = pc.orderBy(F.desc("pair_n"), "lhs", "rhs").limit(1).collect()
        if not top:
            break
        t = top[0]
        merges.append((rank, t.lhs, t.rhs, t.pair_n))
        pat = f"|{t.lhs}|{t.rhs}|"
        rep = f"|{t.lhs}{t.rhs}|"
        s = F.col("seq")
        for _ in range(_BPE_REPLACE_PASSES):
            s = F.replace(s, F.lit(pat), F.lit(rep))
        nxt = cur.select(s.alias("seq"), "wn").persist()
        handles.append(nxt)
        cur = nxt
    out = spark.createDataFrame(
        merges, "rank int, lhs string, rhs string, pair_n long")
    out._internal_persists = handles
    return out


def apply_bpe(docs: DataFrame, merges) -> DataFrame:
    """Apply a learned BPE merge table (`learn_bpe_merges` output) to
    the corpus: per document, the token count after the merges — the
    train→apply loop of a real tokenizer (`bpe_token_count` is the
    regex PRE-tokenizer; this applies LEARNED merges).

    ``merges`` is an ordered iterable of (lhs, rhs) pairs or the
    DataFrame returned by `learn_bpe_merges` (collected driver-side —
    merge tables are vocab-sized, not corpus-sized). Each merge is the
    same padded `_BPE_REPLACE_PASSES`-pass substring replace the
    trainer used, applied in rank order, so apply∘learn is
    self-consistent by construction.

    Returns (doc_id, n_words, n_chars, n_bpe_tokens).

    Scale shape: a pure codegen Column chain over one scan — zero
    shuffles before the final per-doc partial-agg groupBy. The chain
    grows with the merge count; for production vocab sizes (tens of
    thousands of merges) swap the expression chain for an Arrow-batched
    pandas UDF applying the same merges with a pair-priority heap —
    the semantics stay those pinned here on bounded tables.
    """
    if isinstance(merges, DataFrame):
        merges = [(r.lhs, r.rhs)
                  for r in merges.orderBy("rank").collect()]
    w = (docs.select("doc_id",
                     F.explode(F.split("text", " ")).alias("word"))
         .filter(F.length("word") > 0))
    s = F.concat(F.lit("|"), F.regexp_replace("word", "(.)", "$1|"))
    for lhs, rhs in merges:
        pat, rep = f"|{lhs}|{rhs}|", f"|{lhs}{rhs}|"
        for _ in range(_BPE_REPLACE_PASSES):
            s = F.replace(s, F.lit(pat), F.lit(rep))
    return (w.withColumn("_seq", s)
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_words"),
                 F.sum(F.length("word")).cast("long").alias("n_chars"),
                 F.sum(F.size(F.split(
                     F.expr("trim(BOTH '|' FROM _seq)"), "[|]")))
                  .cast("long").alias("n_bpe_tokens")))


def token_percentiles(docs: DataFrame, group_col: str = "lang",
                      ps=((1, 2), (9, 10), (99, 100))) -> DataFrame:
    """Per-group EXACT token-count percentiles — the corpus size
    report every training-mix decision starts from (how long are the
    docs of each language/source, where do the tails sit).

    Percentiles are given as integer rationals (num, den): the p-th
    percentile is the smallest token count whose cumulative doc count
    reaches ``ceil(num·n/den)``, computed with INTEGER arithmetic
    (``(num·n + den - 1) div den``) — ``0.9 * n`` in floats crosses
    ceil boundaries (0.9·500 → 450.0000…03 → ceil 451), the same class
    of bug as the dyadic-sum rule, so no float ever touches the rank.

    Returns one row per group: (group, n_docs, total_tokens,
    p{num}_{den}... as p50-style names) — columns ``p_num_den``.

    Scale shape: the build_vocab count-histogram recipe — ONE
    map-side-combinable groupBy(group, n_tokens), a per-group window
    over the HISTOGRAM (rows = distinct token counts per group, never
    docs), and a broadcast-size totals join. A naive per-group
    percentile window would sort every doc of a language in one
    partition; this never materializes doc-level order at all.
    """
    from pyspark.sql import Window

    nt = F.size(F.split("text", " ")).cast("long")
    hist = (docs.select(F.col(group_col).alias("g"), nt.alias("nt"))
            .groupBy("g", "nt").agg(F.count("*").alias("c"))
            .persist())
    totals = hist.groupBy("g").agg(
        F.sum("c").alias("n_docs"),
        F.sum(F.col("nt") * F.col("c")).alias("total_tokens"))
    w = (Window.partitionBy("g").orderBy("nt")
         .rowsBetween(Window.unboundedPreceding, 0))
    cum = hist.withColumn("cum", F.sum("c").over(w)).join(totals, "g")

    out = totals
    for num, den in ps:
        # `div` is INTEGER division — (num·n + den-1)/den in doubles
        # can sit a ulp off an exact ceil boundary
        thr = F.expr(f"({num} * n_docs + {den - 1}) div {den}")
        pcol = (cum.filter(F.col("cum") >= thr)
                .groupBy("g")
                .agg(F.min("nt").alias(f"p{num}_{den}")))
        out = out.join(pcol, "g")
    out = out.withColumnRenamed("g", group_col)
    out._internal_persists = [hist]
    return out
