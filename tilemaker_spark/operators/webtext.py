"""Web-corpus curation operators over the mandated pages table
(url, warc_ts, html, text, lang): URL host normalization + per-domain
stats, PII detection/redaction, latest-snapshot-per-url dedup, and
Gopher-style bigram repetition signals.

Training-data-pipeline extensions (no reference analog — the reference
is a tile engine; these are the curation steps a Common-Crawl-scale
corpus needs before the geo/tiling stages). Everything is pure Column
expressions or a single shuffle keyed exactly how a 1000-executor run
would want it:

* `url_host_stats` — one regexp_extract + one groupBy(host): map-side
  partial aggregation, no skew beyond real domain skew.
* `pii_scrub` — regexp_count/regexp_replace chains, zero shuffles,
  whole-stage codegen; patterns are written in the Java/RE2 common
  subset so the DuckDB oracle replays them byte-identically.
* `url_dedup_latest` — one window over url (the natural dedup key for
  re-crawled pages); at scale this is a single hash shuffle on url.
* `repetition_signals` — bigrams exploded then two partial-agg
  groupBys on (doc_id, bigram) / (doc_id); no per-row Python.
* `extract_links` / `anchor_terms` — one codegen scan of the HTML
  bytes; only (host, host) / (host, term) pairs ever shuffle.
* `filter_blocked_urls` — UT1-style screen; suffix rules become an
  equi-join over each host's exploded suffix chain.
* `remove_boilerplate_lines` / `decontaminate*` — line/n-gram
  hygiene with broadcast hot-sets; corpus text shuffles at most once.
* `host_pagerank` — O(hosts) rank vector iterated with
  checkpoint-truncated lineage; `crawl_delta` — one full-outer join
  of (url, md5) projections across crawl snapshots.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Java-regex / RE2 common-subset patterns (no lookaround, no backrefs)
# so Spark and the DuckDB oracle match the same spans.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
IPV4_RE = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
PHONE_RE = "\\b[0-9]{3}-[0-9]{4}\\b"
HOST_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)"


def url_host_stats(pages: DataFrame) -> DataFrame:
    """Per-host corpus stats: page count, distinct-language count,
    total/avg extracted-text chars. Host is lowercased with a leading
    ``www.`` stripped; `domain` is the last-two-label registrable
    approximation (a public-suffix list is a drop-in upgrade)."""
    raw = F.lower(F.regexp_extract("url", HOST_RE, 1))
    host = F.regexp_replace(raw, "^www\\.", "")
    return (pages
            .withColumn("host", host)
            .groupBy("host")
            .agg(F.count("*").alias("n_pages"),
                 F.countDistinct("lang").alias("n_langs"),
                 F.sum(F.length("text")).cast("long").alias("total_chars"),
                 F.round(F.avg(F.length("text")), 6).alias("avg_chars"))
            .withColumn("domain",
                        F.regexp_extract("host", "([^.]+\\.[^.]+)$", 1))
            .select("host", "domain", "n_pages", "n_langs",
                    "total_chars", "avg_chars"))


def extract_links(pages: DataFrame, html_col: str = "html",
                  url_col: str = "url") -> DataFrame:
    """Outlink extraction and host-level link-graph aggregation — the
    ingest step that turns raw crawled HTML into the (src_host,
    dst_host, n_links) edge list `host_pagerank` consumes (and
    anchor-graph analyses generally).

    Parses double-quoted ``href="..."`` attributes out of the page
    bytes with one regexp_extract_all (Java/RE2 common subset — no
    lookaround; single-quoted/unquoted attributes are a documented
    non-goal of the synthetic contract), keeps absolute http(s)
    targets only (relative links never cross hosts), normalizes src
    and dst hosts exactly like `url_host_stats` (lowercase, leading
    ``www.`` stripped, port/path/query dropped by the host capture),
    drops self-loops and hostless targets, and aggregates.

    Scale shape: the HTML bytes are scanned ONCE in whole-stage
    codegen (decode + regexp_extract_all + explode — no Python, and
    page bodies are never shuffled); only (src_host, dst_host) pairs
    enter the single map-side-combinable groupBy, so the shuffle moves
    the link graph, never the corpus.
    """
    hrefs = F.regexp_extract_all(
        F.decode(F.col(html_col), "UTF-8"), F.lit('href="([^"]*)"'), 1)
    src = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, HOST_RE, 1)), "^www\\.", "")
    links = (pages
             .select(src.alias("src_host"),
                     F.explode(hrefs).alias("href"))
             .filter(F.col("href").rlike("^[Hh][Tt][Tt][Pp][Ss]?://")))
    dst = F.regexp_replace(
        F.lower(F.regexp_extract("href", HOST_RE, 1)), "^www\\.", "")
    return (links.withColumn("dst_host", dst)
            .filter((F.col("dst_host") != "") &
                    (F.col("dst_host") != F.col("src_host")))
            .groupBy("src_host", "dst_host")
            .agg(F.count("*").alias("n_links")))


def anchor_terms(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Anchor-text aggregation — the classic "anchor text describes
    the target" IR signal: for every destination host, the term counts
    of all anchor texts pointing at it across the crawl (feeds target
    summarization, query-independent relevance, and link-spam
    screens).

    Parses ``href="..." ... >TEXT</a>`` pairs with two
    regexp_extract_all passes over the same pattern (group 1 = href,
    group 2 = inner text) zipped positionally — same match set by
    construction. Keeps absolute http(s) targets, normalizes the
    destination host like `extract_links`, whitespace-tokenizes the
    anchor text, and aggregates to (dst_host, term, n).

    Scale shape: identical to `extract_links` — one codegen scan of
    the page bytes, no Python, and only (dst_host, term) pairs reach
    the single map-side-combinable groupBy.
    """
    pat = 'href="([^"]*)"[^>]*>([^<]*)</a>'
    html = F.decode(F.col(html_col), "UTF-8")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(pat), 1).alias("href"),
        F.regexp_extract_all(html, F.lit(pat), 2).alias("txt"))
    a = (pages.select(F.explode(pairs).alias("a"))
         .select(F.col("a.href").alias("href"), F.col("a.txt").alias("txt"))
         .filter(F.col("href").rlike("^[Hh][Tt][Tt][Pp][Ss]?://")))
    dst = F.regexp_replace(
        F.lower(F.regexp_extract("href", HOST_RE, 1)), "^www\\.", "")
    return (a.withColumn("dst_host", dst)
            .filter(F.col("dst_host") != "")
            .select("dst_host",
                    F.explode(F.split("txt", " ")).alias("term"))
            .filter(F.col("term") != "")
            .groupBy("dst_host", "term")
            .agg(F.count("*").alias("n")))


def filter_blocked_urls(pages: DataFrame, rules: DataFrame,
                        url_col: str = "url",
                        id_col: str = "doc_id") -> DataFrame:
    """UT1-style URL blocklist filtering — the adult/spam/malware
    domain-and-path screen every web-curation pipeline runs before
    content-quality stages (RefinedWeb/CCNet shape).

    ``rules`` is (rule_id: long, kind: string, pattern: string) with
    kind one of:

    * ``host``          — exact normalized-host match;
    * ``host_suffix``   — the pattern domain and every subdomain of it
      (UT1 blocklist semantics);
    * ``path_contains`` — lowercase substring of the path+query part.

    Hosts are normalized like `url_host_stats` (lowercase, leading
    ``www.`` stripped). Returns the input columns plus (host, rule_id,
    blocked); when several rules hit, the smallest rule_id wins
    (deterministic reason).

    Scale shape: page bodies stay out of the match entirely — only
    (id, url) enters, and the wide rows are re-attached by one id-keyed
    left join of a tiny (id, rule_id) match table. Host rules are an
    equi-join (broadcastable at UT1's ~4M hosts, AQE falls back to a
    hash join beyond). Suffix rules become an equi-join too: each host
    explodes into its ≤~10-label suffix chain and joins suffix ==
    pattern — no nested-loop over a multi-million-entry list. Only the
    path_contains rules (typically a few hundred) pay a broadcast
    nested loop.
    """
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url_col, HOST_RE, 1)), "^www\\.", "")
    path = F.lower(F.regexp_extract(
        url_col, "^[A-Za-z][A-Za-z0-9+.-]*://[^/]*(/.*)?$", 1))
    p = (pages.select(F.col(id_col).alias("_pid"),
                      host.alias("_h"), path.alias("_p"))
         .withColumn("_labels", F.split("_h", "\\.")))

    host_r = rules.filter(F.col("kind") == "host")
    m_host = (p.join(host_r.hint("broadcast"),
                     p["_h"] == host_r["pattern"])
              .select("_pid", "rule_id"))

    suf_r = rules.filter(F.col("kind") == "host_suffix")
    sufs = F.expr("transform(sequence(1, size(_labels)), i -> "
                  "array_join(slice(_labels, i, size(_labels) - i + 1),"
                  " '.'))")
    m_suf = (p.select("_pid", F.explode(sufs).alias("_suf"))
             .join(suf_r.hint("broadcast"),
                   F.col("_suf") == suf_r["pattern"])
             .select("_pid", "rule_id"))

    path_r = rules.filter(F.col("kind") == "path_contains")
    m_path = (p.crossJoin(F.broadcast(path_r))
              .filter(F.col("_p").contains(F.col("pattern")))
              .select("_pid", "rule_id"))

    matches = (m_host.unionByName(m_suf).unionByName(m_path)
               .groupBy("_pid").agg(F.min("rule_id").alias("rule_id")))
    return (pages
            .withColumn("host", host)
            .join(matches, F.col(id_col) == F.col("_pid"), "left")
            .drop("_pid")
            .withColumn("blocked", F.col("rule_id").isNotNull()))


def pii_scrub(pages: DataFrame, text_col: str = "text") -> DataFrame:
    """Detect and redact common PII spans (emails, IPv4 addresses,
    short phone numbers). Returns per-page counts plus the scrubbed
    text; replacement order (email -> ip -> phone) is part of the
    contract so reruns and the oracle agree byte-for-byte."""
    # Each class is counted on the text AFTER the earlier classes were
    # redacted, so n_* always equals the number of that class's
    # replacement tokens in text_scrubbed (counting every class on the
    # original text over-reports when classes overlap — a phone-shaped
    # local part inside an email is consumed by <EMAIL> and must not
    # also count as a phone).
    t = F.col(text_col)
    after_email = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    scrubbed = F.regexp_replace(after_ip, PHONE_RE, "<PHONE>")
    return pages.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(IPV4_RE)).cast("long")
        .alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PHONE_RE)).cast("long")
        .alias("n_phones"),
        scrubbed.alias("text_scrubbed"),
    )


def url_dedup_latest(pages: DataFrame) -> DataFrame:
    """Keep the newest crawl snapshot per url (warc_ts desc, doc_id
    desc as the deterministic tiebreak) — the canonical re-crawl dedup
    for a Common-Crawl-style corpus. One hash shuffle on url."""
    w = Window.partitionBy("url").orderBy(F.col("warc_ts").desc(),
                                          F.col("doc_id").desc())
    return (pages
            .withColumn("_rn", F.row_number().over(w))
            .withColumn("n_snapshots", F.count("*").over(
                Window.partitionBy("url")))
            .filter(F.col("_rn") == 1)
            .select("url", F.col("doc_id").alias("kept_doc"),
                    F.col("warc_ts").alias("latest_ts"),
                    F.col("n_snapshots").cast("long").alias("n_snapshots")))


def repetition_signals(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style duplicate-n-gram quality signals per document:
    bigram totals, distinct count, most-frequent-bigram count, and the
    two standard ratios (top-bigram fraction, duplicate-bigram
    fraction). Bigram construction is the shared with-multiplicity
    k-gram builder (``dedup._word_spans`` with k=2 — ONE tokenization
    definition for every oracle twin), exploded into two partial-agg
    groupBys — the same plan shape at 100 TB, keyed by
    (doc_id, bigram)."""
    from tilemaker_spark.operators.dedup import _word_spans

    per_bigram = (_word_spans(
                      docs.select("doc_id",
                                  F.col(text_col).alias("text")), 2)
                  .withColumnRenamed("span", "bigram")
                  .groupBy("doc_id", "bigram")
                  .agg(F.count("*").alias("c")))
    return (per_bigram
            .groupBy("doc_id")
            .agg(F.sum("c").cast("long").alias("n_bigrams"),
                 F.count("*").alias("n_uniq_bigrams"),
                 F.max("c").cast("long").alias("top_count"))
            .select(
                "doc_id", "n_bigrams", "n_uniq_bigrams", "top_count",
                F.round(F.col("top_count") / F.col("n_bigrams"), 6)
                .alias("top_frac"),
                F.round(1.0 - F.col("n_uniq_bigrams") / F.col("n_bigrams"), 6)
                .alias("dup_frac")))


def decontaminate(docs: DataFrame, benchmark: DataFrame,
                  n: int = 8, min_hits: int = 1) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing >=
    ``min_hits`` distinct word ``n``-grams with an eval/benchmark set
    (the GPT-3-appendix / Gopher 8-13-gram overlap rule — the step that
    keeps test questions out of the training mix).

    Scale shape: the benchmark n-gram set is tiny next to the corpus
    (eval suites are MBs, the corpus is TBs), so its DISTINCT n-grams
    are BROADCAST; the corpus side is one NON-distinct shingle explode
    filtered map-side by the broadcast join, then one partial-agg
    groupBy(doc_id) counting DISTINCT matched grams — the within-doc
    dedup happens AFTER the broadcast filter, on the tiny hit set,
    instead of shuffling the full corpus shingle table first (at
    corpus scale that pre-dedup exchange would dominate the whole
    job). The corpus text is never shuffled and the scan stays pruned
    to (doc_id, text). Docs with zero hits are recovered with a left
    join against the doc-id spine so the output is total over
    ``docs``.

    Returns (doc_id, ngram_hits, contaminated) where ngram_hits counts
    DISTINCT overlapping n-grams per document.
    """
    from tilemaker_spark.operators.dedup import shingles

    bench_grams = (shingles(benchmark, n, distinct=False)
                   .select("shingle").dropDuplicates())
    hits = (shingles(docs, n, distinct=False)
            .join(F.broadcast(bench_grams), "shingle")
            .groupBy("doc_id")
            .agg(F.count_distinct("shingle").alias("ngram_hits")))
    return (docs.select("doc_id")
            .join(hits, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("ngram_hits", F.lit(0)).cast("long")
                    .alias("ngram_hits"))
            .withColumn("contaminated",
                        (F.col("ngram_hits") >= min_hits).cast("boolean")))


def decontaminate_fuzzy(docs: DataFrame, benchmark: DataFrame,
                        n: int = 2, k: int = 16,
                        rows_per_band: int = 2,
                        threshold: float = 0.5) -> DataFrame:
    """Near-duplicate decontamination: flag training documents whose
    text is a NEAR-duplicate of any benchmark doc (exact Jaccard >=
    threshold, LSH-candidated) — catches paraphrased / lightly edited
    eval leakage that :func:`decontaminate`'s exact n-gram overlap
    misses. The two are complementary and real pipelines run both.

    Scale shape: the cross-set LSH path
    (:func:`~tilemaker_spark.operators.dedup.incremental_lsh_pairs`
    with the benchmark as the stored 'corpus' side and
    ``cross_only=True``): the training side is banded only to PROBE
    the benchmark index — no training x training self-join and no
    verification of training-internal pairs ever happens — and
    training text is read for verification only on candidate matches
    into the benchmark. Doc ids of ``docs`` and ``benchmark`` must be
    disjoint.

    Returns (doc_id, n_matches, max_jaccard, contaminated) covering
    only flagged docs (anti-join the result to drop them).
    """
    from tilemaker_spark.operators.dedup import incremental_lsh_pairs

    pairs = incremental_lsh_pairs(
        docs, benchmark, n=n, k=k, rows_per_band=rows_per_band,
        threshold=threshold, cross_only=True)
    out = (pairs.groupBy(F.col("new_id").alias("doc_id"))
           .agg(F.count("*").alias("n_matches"),
                F.max("jaccard").alias("max_jaccard"))
           .withColumn("contaminated", F.lit(True)))
    out._internal_persists = getattr(pairs, "_internal_persists", [])
    return out


def remove_boilerplate_lines(docs: DataFrame, max_line_df: int = 2,
                             text_col: str = "text") -> DataFrame:
    """Line-level boilerplate removal (the RefinedWeb "line-wise
    corrections" / CCNet paragraph-dedup shape): drop every line whose
    exact trimmed form appears in MORE THAN ``max_line_df`` distinct
    documents — cookie banners, nav bars, copyright footers — and
    rebuild each document's text from its surviving lines in original
    order. Blank lines are document structure, not boilerplate: they
    are excluded from the frequency statistics and never removed.

    Returns one row per input doc (total over ``docs``):
    (doc_id, text_clean, n_lines, n_removed).

    Scale shape (no reference analog; corpus-curation extension):
    1. `posexplode(split(text))` — pure per-partition fan-out;
    2. line document-frequency — ONE map-side-combinable groupBy on
       the md5 of the trimmed line. Boilerplate lines are by
       definition the hot keys, but partial aggregation collapses
       each executor's occurrences to one row before the exchange,
       so the shuffle moves O(distinct lines), not O(occurrences);
    3. the hot set (df > threshold) flows into a LEFT ANTI equi-join
       — AQE broadcasts it when small (the usual case: boilerplate
       is a tiny fraction of distinct lines), and degrades to a hash
       join, never a driver collect, when it isn't;
    4. reconstruction — one groupBy(doc_id) with
       array_sort(collect_list(struct(pos, line))): a single hash
       shuffle on doc_id, the same key the downstream per-doc
       operators already partition by. A doc-id spine left-join makes
       all-boilerplate docs come back as empty strings instead of
       vanishing.
    """
    lines = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"))
    key = F.md5(F.trim("line"))
    hot = (lines
           .filter(F.trim("line") != "")
           .groupBy(key.alias("_lh"))
           .agg(F.count_distinct("doc_id").alias("_df"))
           .filter(F.col("_df") > max_line_df)
           .select("_lh"))
    kept = (lines
            .filter(F.trim("line") != "")
            .join(hot, key == F.col("_lh"), "left_anti")
            .unionByName(lines.filter(F.trim("line") == "")))
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.array_join(
                        F.transform(
                            F.array_sort(F.collect_list(
                                F.struct("pos", "line"))),
                            lambda s: s["line"]),
                        "\n").alias("text_clean"),
                    F.count("*").alias("_n_kept")))
    totals = lines.groupBy("doc_id").agg(F.count("*").alias("n_lines"))
    return (docs.select("doc_id")
            .join(totals, "doc_id")
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("text_clean", F.lit("")).alias("text_clean"),
                    F.col("n_lines").cast("long").alias("n_lines"),
                    (F.col("n_lines") -
                     F.coalesce("_n_kept", F.lit(0))).cast("long")
                    .alias("n_removed")))


def host_pagerank(edges: DataFrame, iters: int = 3, damping: float = 0.85,
                  round_decimals: int = 6, src_col: str = "src",
                  dst_col: str = "dst") -> DataFrame:
    """Host-level PageRank over the web link graph — the link-based
    quality signal large crawls rank hosts by (the Common-Crawl
    host-ranking shape) and a standard doc-quality weighting input for
    training-mix curation. Input is an edge list (src host, dst host);
    multi-edges count as parallel links. Returns (node, rank) for every
    host that appears on either side, after ``iters`` rounds of

        rank'(v) = (1 - d)/N + d * (SUM_{u->v} rank(u)/deg(u)
                                     + dangling_mass/N)

    with the dangling (no-outlink) mass redistributed uniformly —
    the correct handling, not the drop-it shortcut.

    Engine-portability contract: the rank is ROUNDED to
    ``round_decimals`` at EVERY iteration, so a DuckDB oracle running
    the same chained-CTE recurrence sees bit-identical inputs each
    round and the only cross-engine difference is summation order
    (last-ulp noise far below the rounding grain) — the same
    round-before-use rule the kNN/cosine contract queries follow.

    Scale shape: each iteration is one equi-join of the rank vector
    against the edge list plus one map-side-combinable groupBy(dst) —
    the rank vector is O(hosts), orders of magnitude smaller than the
    corpus, and the dangling mass and 1/N terms ride along as
    broadcast one-row scalars (no driver collect; the single
    ``count()`` action sizes N = number of hosts). Lineage is
    checkpoint-truncated every round exactly like
    :func:`~tilemaker_spark.operators.dedup.connected_components`
    (Catalyst re-analysis goes superlinear on a growing iterative
    plan otherwise).
    """
    from pyspark import StorageLevel

    e = edges.select(F.col(src_col).alias("src"),
                     F.col(dst_col).alias("dst")) \
        .persist(StorageLevel.MEMORY_AND_DISK)
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct().persist(StorageLevel.MEMORY_AND_DISK))
    n = nodes.count()
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))

    sc = edges.sparkSession.sparkContext
    has_ckpt_dir = sc._jsc.sc().getCheckpointDir().isDefined()

    def truncate(df):
        return df.checkpoint(eager=True) if has_ckpt_dir \
            else df.localCheckpoint(eager=True)

    base = F.lit(1.0 - damping) / F.lit(n)
    ranks = truncate(nodes.withColumn(
        "rank", F.round(F.lit(1.0) / F.lit(n), round_decimals)))
    persists = [e, nodes]
    for _ in range(iters):
        contrib = (e.join(ranks.withColumnRenamed("node", "src"), "src")
                   .join(deg, "src")
                   .groupBy(F.col("dst").alias("node"))
                   .agg(F.sum(F.col("rank") / F.col("deg"))
                        .alias("contrib")))
        dang = (ranks.join(deg.select(F.col("src").alias("node")),
                           "node", "left_anti")
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")))
        ranks = truncate(
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dang))
            .select("node",
                    F.round(base + F.lit(damping) *
                            (F.coalesce("contrib", F.lit(0.0)) +
                             F.col("dang") / F.lit(n)),
                            round_decimals).alias("rank")))
    ranks._internal_persists = persists
    return ranks


def crawl_delta(old_pages: DataFrame, new_pages: DataFrame,
                key_col: str = "url",
                text_col: str = "text") -> DataFrame:
    """Cross-snapshot crawl delta — the re-crawl accounting step: which
    urls were added, removed, changed, or unchanged between two crawl
    snapshots (drives incremental processing: only 'added'/'changed'
    pages need to re-enter the curation pipeline; pairs with
    `url_dedup_latest` and the incremental dedup band index).

    Content identity is md5 of the extracted text. Returns
    (url, old_hash, new_hash, status).

    Scale shape: both snapshots are pre-projected to (url, hash) —
    page bodies never shuffle; the delta is ONE full-outer equi-join
    on url, the natural key both snapshot layouts can be bucketed on
    to make the join exchange-free (write_osm_bucketed-style layout
    applies verbatim).
    """
    o = old_pages.select(F.col(key_col).alias(key_col),
                         F.md5(F.col(text_col)).alias("old_hash"))
    n = new_pages.select(F.col(key_col).alias(key_col),
                         F.md5(F.col(text_col)).alias("new_hash"))
    status = (F.when(F.col("old_hash").isNull(), "added")
              .when(F.col("new_hash").isNull(), "removed")
              .when(F.col("old_hash") == F.col("new_hash"), "unchanged")
              .otherwise("changed"))
    return (o.join(n, key_col, "full_outer")
            .select(key_col, "old_hash", "new_hash",
                    status.alias("status")))


def _norm_host() -> F.Column:
    """Lowercased host with a leading ``www.`` stripped — the shared
    normalization of `url_host_stats`."""
    raw = F.lower(F.regexp_extract("url", HOST_RE, 1))
    return F.regexp_replace(raw, "^www\\.", "")


def cap_per_host_naive(pages: DataFrame, max_per_host: int = 2,
                       key_col: str = "url") -> DataFrame:
    """Per-domain quota cap, single-window reference formulation (the
    ORACLE-FACING variant, same split as `token_budget_sample_naive`):
    keep at most ``max_per_host`` pages per normalized host, chosen as
    the lowest 60-bit url-hash keys — deterministic across reruns and
    executor placement. One `Window.partitionBy(host)` puts an entire
    host in one partition (a mega-host is the classic straggler), so
    production uses the bucketed :func:`cap_per_host`, pinned
    row-identical by pytest.

    Returns the surviving pages + (host, n_host_pages, host_rank)."""
    from tilemaker_spark.operators.dedup import hash_key60

    p = (pages.withColumn("host", _norm_host())
         .withColumn("_key", hash_key60(key_col)))
    w = Window.partitionBy("host").orderBy("_key", key_col)
    wc = Window.partitionBy("host")
    return (p.withColumn("n_host_pages",
                         F.count("*").over(wc).cast("long"))
            .withColumn("host_rank", F.row_number().over(w).cast("int"))
            .filter(F.col("host_rank") <= max_per_host)
            .drop("_key"))


def cap_per_host(pages: DataFrame, max_per_host: int = 2,
                 key_col: str = "url") -> DataFrame:
    """Per-domain quota cap (domain balancing — the C4/RefinedWeb-style
    "no single domain dominates the mix" stage): keep at most
    ``max_per_host`` pages per normalized host, deterministically (the
    ``max_per_host`` lowest 60-bit url-hash keys win, ties broken by
    url), with per-host accounting columns.

    Scale shape — the two-level bucket decomposition of
    `token_budget_sample`, re-keyed for an UNBOUNDED group set (hosts
    are millions, so nothing here is broadcast):

    1. per-(host, bucket) counts, bucket = top 12 bits of the hash key
       (one map-side-combinable groupBy; <= 4096 rows per host);
    2. per-host exclusive prefix counts over buckets — a window of
       <= 4096 rows per host, millions of independent partitions;
    3. buckets whose whole prefix already holds ``max_per_host`` rows
       are pruned BEFORE the doc-level work (for small caps that drops
       ~all of a mega-host's pages without ranking them);
    4. survivors rank within (host, bucket) — partition size bounded by
       host_pages/4096, so a mega-host becomes 4096 small sorts instead
       of one straggler — offset by the bucket's exclusive prefix.

    The prefix/totals joins are plain host-keyed equi-joins (NOT
    broadcasts): both sides hash-partition on host, and under a
    host-bucketed layout they are exchange-free. Output is identical
    to :func:`cap_per_host_naive` row-for-row (pytest-pinned).

    Returns the surviving pages + (host, n_host_pages, host_rank)."""
    from tilemaker_spark.operators.dedup import hash_key60

    key = hash_key60(key_col)
    base = (pages.withColumn("host", _norm_host())
            .withColumn("_key", key)
            .withColumn("_bucket", F.shiftrightunsigned("_key", 48)))

    hist = (base.groupBy("host", "_bucket")
            .agg(F.count("*").alias("_bcnt")))
    wb = Window.partitionBy("host").orderBy("_bucket")
    prefix = (hist
              .withColumn("_cnt_excl",
                          F.coalesce(
                              F.sum("_bcnt").over(
                                  wb.rowsBetween(Window.unboundedPreceding,
                                                 -1)), F.lit(0)))
              .filter(F.col("_cnt_excl") < max_per_host)
              .select("host", "_bucket", "_cnt_excl"))
    totals = hist.groupBy("host").agg(
        F.sum("_bcnt").cast("long").alias("n_host_pages"))

    wd = Window.partitionBy("host", "_bucket").orderBy("_key", key_col)
    return (base.join(prefix, ["host", "_bucket"])
            .withColumn("host_rank",
                        (F.col("_cnt_excl") +
                         F.row_number().over(wd)).cast("int"))
            .filter(F.col("host_rank") <= max_per_host)
            .join(totals, "host")
            .drop("_key", "_bucket", "_cnt_excl"))


def curation_funnel(pages: DataFrame, rules: DataFrame,
                    **gopher_kwargs) -> DataFrame:
    """The chained web-curation screen (C4/CCNet/RefinedWeb shape) as
    ONE operator with per-document drop-reason accounting — the funnel
    a corpus owner actually monitors at 100 TB:

      1. ``blocked``  — UT1-style URL blocklist (`filter_blocked_urls`);
      2. ``stale``    — not the latest snapshot of its url among
         unblocked pages (`url_dedup_latest` semantics);
      3. (extract)    — HTML -> text (`extract_text_from_html`), no drop;
      4. ``dup``      — exact duplicate of an earlier (lower doc_id)
         SURVIVOR's extracted text (keep-first, CCNet order: dedup
         before the quality model);
      5. ``quality``  — fails the Gopher rule battery (`gopher_rules`);
      6. ``kept``     — survived everything.

    Each stage is evaluated on the survivors of the previous ones, so
    the reason is the FIRST failing stage. pages needs (doc_id, url,
    warc_ts, html); rules as in `filter_blocked_urls`. Returns one row
    per input page: (doc_id, host, reason, kept).

    Scale shape: page bodies never shuffle — every flag is computed on
    a slim projection ((doc_id, url, warc_ts) for block/stale;
    (doc_id, md5(text_extracted)) for dup; extraction and the rule
    battery are shuffle-free codegen on the scan side) and the final
    assembly is doc_id-keyed joins of those flag tables. The one
    content shuffle moves 32-byte hashes; the stale window is the
    url_dedup shuffle. The survivor-hash table feeds two branches
    (keeper min + dup join) — persisted once, caller releases.
    """
    from tilemaker_spark.operators.text_analysis import (
        extract_text_from_html, gopher_rules)

    slim = pages.select("doc_id", "url", "warc_ts")
    b = filter_blocked_urls(slim, rules).select("doc_id", "host", "blocked")
    w = Window.partitionBy("url").orderBy(F.desc("warc_ts"),
                                          F.desc("doc_id"))
    fresh = (slim
             .join(b.filter(~F.col("blocked")).select("doc_id"), "doc_id")
             .withColumn("_rn", F.row_number().over(w))
             .select("doc_id", (F.col("_rn") > 1).alias("stale")))

    ext = extract_text_from_html(pages.select("doc_id", "html"))
    hashes = ext.select("doc_id", F.md5("text_extracted").alias("_h"))
    g = (gopher_rules(ext.select(
             "doc_id", F.col("text_extracted").alias("text")),
             **gopher_kwargs)
         .select("doc_id", F.col("keep").alias("_q_keep")))

    surv = (hashes
            .join(fresh.filter(~F.col("stale")).select("doc_id"), "doc_id")
            .persist())
    keepers = surv.groupBy("_h").agg(F.min("doc_id").alias("_keeper"))
    dup = (surv.join(keepers, "_h")
           .select("doc_id",
                   (F.col("doc_id") != F.col("_keeper")).alias("is_dup")))

    reason = (F.when(F.col("blocked"), "blocked")
              .when(F.col("stale"), "stale")
              .when(F.col("is_dup"), "dup")
              .when(~F.col("_q_keep"), "quality")
              .otherwise("kept"))
    out = (b.join(fresh, "doc_id", "left")
           .join(dup, "doc_id", "left")
           .join(g, "doc_id")
           .withColumn("reason", reason)
           .select("doc_id", "host", "reason",
                   (F.col("reason") == "kept").alias("kept")))
    out._internal_persists = [surv]
    return out


#: bounded regex passes for path dot-segment resolution — each global
#: pass resolves one nesting level ('a/b/../../' needs two), so 8
#: passes cover paths nested 8 deep; both engines run the same count.
_CANON_DOT_PASSES = 8

#: tracking query parameters every crawl pipeline strips (the
#: utm_/click-id family); compared by prefix before the '=' split.
CANON_DROP_PARAMS = ("utm_", "ref=", "fbclid=", "gclid=")


def canonicalize_urls(pages: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """URL canonicalization (the pre-step `url_dedup_latest` and
    `crawl_delta` assume): a documented RFC 3986 subset plus standard
    crawl practice, as pure Column expressions with an exact ANSI-SQL
    twin —

      1. scheme and host lowercased;
      2. default ports stripped (http:80, https:443);
      3. fragment removed;
      4. path ``.`` / ``..`` segments resolved by bounded global
         regex passes (``_CANON_DOT_PASSES`` nesting levels — both
         engines run identical passes, so parity holds even past the
         bound); empty path becomes ``/``;
      5. query parameters: empties and the ``CANON_DROP_PARAMS``
         tracking family dropped, the rest sorted bytewise and
         rejoined (param order never splits a dedup key again).

    Adds ``url_canon``. Zero shuffles — whole-stage codegen over the
    scan, trivially 1000-executor parallel.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    hostport = F.lower(F.regexp_extract(
        u, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.when(scheme == "http",
                  F.regexp_replace(hostport, ":80$", "")) \
        .when(scheme == "https",
              F.regexp_replace(hostport, ":443$", "")) \
        .otherwise(hostport)
    nofrag = F.regexp_replace(u, "#.*$", "")
    path = F.regexp_extract(
        nofrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    for _ in range(_CANON_DOT_PASSES):
        path = F.regexp_replace(path, "/\\./", "/")
        path = F.regexp_replace(path, "/[^/]+/\\.\\./", "/")
    path = F.regexp_replace(path, "/\\.$", "/")
    path = F.regexp_replace(path, "/[^/]+/\\.\\.$", "/")
    # root-level '..' clamps to '/' (RFC 3986 remove_dot_segments)
    for _ in range(_CANON_DOT_PASSES):
        path = F.regexp_replace(path, "^/\\.\\./", "/")
    path = F.regexp_replace(path, "^/\\.\\.$", "/")
    query = F.regexp_extract(nofrag, "\\?(.*)$", 1)
    keep = F.filter(
        F.split(query, "&"),
        lambda x: (x != "") & ~x.startswith("utm_")
        & ~x.startswith("ref=") & ~x.startswith("fbclid=")
        & ~x.startswith("gclid="))
    qs = F.array_join(F.array_sort(keep), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)))
    return pages.withColumn("url_canon", canon)


def parse_robots_rules(robots: DataFrame, host_col: str = "host",
                       txt_col: str = "robots_txt") -> DataFrame:
    """Parse robots.txt bodies into (host, kind, prefix) rules for the
    ``*`` user-agent group(s) — the crawl-permission gate before any
    fetch enters the corpus.

    Grouping follows the spec: a rule line belongs to the most recent
    ``User-agent:`` line above it; only ``*`` groups are kept (a
    stricter bot-specific group must not leak into the generic crawl).
    The carry is one ``last(..., ignorenulls)`` window per host over
    the LINE table — robots files are tiny, so this window is bounded
    by the file's line count. CRLF bodies are normalized; empty
    Disallow lines (allow-all) drop out naturally. Documented subset:
    plain path prefixes only (no ``*``/``$`` wildcards)."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(txt_col, "\n")).alias("i", "line"))
    lines = lines.withColumn(
        "line", F.regexp_replace("line", "\\r$", ""))
    agent = F.when(F.col("line").startswith("User-agent:"),
                   F.trim(F.expr("substring(line, 12)")))
    w = (Window.partitionBy("host").orderBy("i")
         .rowsBetween(Window.unboundedPreceding, 0))
    g = lines.withColumn("grp", F.last(agent, ignorenulls=True).over(w))
    kind = (F.when(F.col("line").startswith("Allow:"), "allow")
            .when(F.col("line").startswith("Disallow:"), "disallow"))
    prefix = (F.when(F.col("line").startswith("Allow:"),
                     F.trim(F.expr("substring(line, 7)")))
              .otherwise(F.trim(F.expr("substring(line, 10)"))))
    return (g.filter(F.col("grp") == "*")
            .withColumn("kind", kind)
            .withColumn("prefix", prefix)
            .filter(F.col("kind").isNotNull() & (F.col("prefix") != ""))
            .select("host", "kind", "prefix"))


def robots_screen(pages: DataFrame, robots: DataFrame) -> DataFrame:
    """Apply robots.txt rules to crawled pages: per page, the winning
    rule under longest-prefix-match with Allow beating Disallow on
    ties (the published Google semantics), missing robots or no match
    = allowed. ``robots`` is (host, robots_txt) keyed by NORMALIZED
    host (lowercase, www-stripped — `url_host_stats` normalization).

    Returns (doc_id, url, host, path, rule_kind, matched_prefix,
    crawl_allowed) for every page.

    Scale shape: the rule table is O(hosts × rules-per-file) — a
    host-keyed equi-join against the page projection (broadcastable
    for bounded rule sets, hash join beyond); the winner is one
    map-side-combinable max-of-struct groupBy; page bodies never enter
    the match."""
    rules = parse_robots_rules(robots)
    path = F.regexp_extract(
        "url", "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    p = (pages.withColumn("host", _norm_host())
         .withColumn("path",
                     F.when(path == "", F.lit("/")).otherwise(path)))
    m = (p.select("doc_id", "host", "path")
         .join(rules, "host")
         .filter(F.col("path").startswith(F.col("prefix")))
         .groupBy("doc_id")
         .agg(F.max(F.struct(
             F.length("prefix").alias("l"),
             (F.col("kind") == "allow").cast("int").alias("a"),
             F.col("prefix").alias("prefix"),
             F.col("kind").alias("kind"))).alias("m")))
    return (p.join(m, "doc_id", "left")
            .select("doc_id", "url", "host", "path",
                    F.coalesce(F.col("m.kind"), F.lit("none"))
                     .alias("rule_kind"),
                    F.coalesce(F.col("m.prefix"), F.lit(""))
                     .alias("matched_prefix"),
                    (F.col("m.kind").isNull() |
                     (F.col("m.kind") == "allow"))
                    .alias("crawl_allowed")))
