"""Webtext curation operators: closed-form fixtures for PII scrubbing,
host normalization, latest-snapshot dedup, and repetition signals."""

import datetime

from pyspark.sql import functions as F

from tilemaker_spark.operators.webtext import (
    pii_scrub, repetition_signals, url_dedup_latest, url_host_stats)


def test_pii_scrub_redacts_known_spans(spark):
    df = spark.createDataFrame(
        [(1, "mail bob.smith+x@corp.example.com then 192.168.0.1 "
             "and 555-0199 end"),
         (2, "clean text no pii 1234567 10.1 a@b")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (out[1]["n_emails"], out[1]["n_ips"], out[1]["n_phones"]) == (1, 1, 1)
    assert out[1]["text_scrubbed"] == "mail <EMAIL> then <IP> and <PHONE> end"
    # 'a@b' has no TLD, '10.1' is not 4 octets, '1234567' has no dash
    assert (out[2]["n_emails"], out[2]["n_ips"], out[2]["n_phones"]) == (0, 0, 0)
    assert out[2]["text_scrubbed"] == out[2]["text_scrubbed"]


def test_url_host_stats_normalizes(spark):
    df = spark.createDataFrame(
        [(1, "https://www.Example.COM/a", "hello world", "en"),
         (2, "https://example.com/b", "bye", "de"),
         (3, "http://sub.other.org/c?x=1", "hi", "en")],
        "doc_id long, url string, text string, lang string")
    rows = {r["host"]: r for r in url_host_stats(df).collect()}
    assert rows["example.com"]["n_pages"] == 2
    assert rows["example.com"]["n_langs"] == 2
    assert rows["example.com"]["domain"] == "example.com"
    assert rows["example.com"]["total_chars"] == 14
    assert rows["sub.other.org"]["domain"] == "other.org"


def test_url_dedup_latest_keeps_newest(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(1, "u/a", t0),
            (2, "u/a", t0 + datetime.timedelta(hours=2)),
            (3, "u/a", t0 + datetime.timedelta(hours=1)),
            (4, "u/b", t0)]
    df = spark.createDataFrame(rows, "doc_id long, url string, warc_ts timestamp")
    out = {r["url"]: r for r in url_dedup_latest(df).collect()}
    assert out["u/a"]["kept_doc"] == 2 and out["u/a"]["n_snapshots"] == 3
    assert out["u/b"]["kept_doc"] == 4 and out["u/b"]["n_snapshots"] == 1
    # deterministic tiebreak: equal timestamps keep the larger doc_id
    df2 = spark.createDataFrame([(1, "u", t0), (9, "u", t0)],
                                "doc_id long, url string, warc_ts timestamp")
    assert url_dedup_latest(df2).collect()[0]["kept_doc"] == 9


def test_repetition_signals_closed_form(spark):
    # "a b a b a" -> bigrams [a b, b a, a b, b a]: 4 total, 2 uniq, top 2
    df = spark.createDataFrame([(1, "a b a b a"), (2, "x y z")],
                               "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_signals(df).collect()}
    assert (out[1]["n_bigrams"], out[1]["n_uniq_bigrams"],
            out[1]["top_count"]) == (4, 2, 2)
    assert out[1]["top_frac"] == 0.5 and out[1]["dup_frac"] == 0.5
    assert (out[2]["n_bigrams"], out[2]["n_uniq_bigrams"],
            out[2]["top_count"]) == (2, 2, 1)
    assert out[2]["dup_frac"] == 0.0


def test_decontaminate_planted(spark):
    """A corpus doc embedding a benchmark 4-gram is flagged; clean and
    sub-n docs report zero hits but stay in the output spine."""
    from tilemaker_spark.operators.webtext import decontaminate

    bench = spark.createDataFrame(
        [(100, "what is the capital of france paris"),
         (101, "unrelated eval question here")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, "some page asking what is the capital of france today"),
         (1, "a perfectly clean training document about cooking"),
         (2, "too short")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in
           decontaminate(docs, bench, n=4, min_hits=1).collect()}
    assert set(out) == {0, 1, 2}
    # doc 0 shares the 4-grams sliding through "what is the capital of
    # france": windows fully inside the shared 6-token run = 3
    assert out[0].ngram_hits == 3 and out[0].contaminated
    assert out[1].ngram_hits == 0 and not out[1].contaminated
    assert out[2].ngram_hits == 0 and not out[2].contaminated


def test_decontaminate_min_hits_threshold(spark):
    from tilemaker_spark.operators.webtext import decontaminate

    bench = spark.createDataFrame([(10, "alpha beta gamma delta")],
                                  "doc_id long, text string")
    docs = spark.createDataFrame([(0, "alpha beta gamma delta epsilon")],
                                 "doc_id long, text string")
    # doc 0's windows are [alpha beta gamma delta] and [beta gamma
    # delta epsilon]; only the first is in the benchmark -> 1 hit
    one = decontaminate(docs, bench, n=4, min_hits=1).collect()[0]
    two = decontaminate(docs, bench, n=4, min_hits=2).collect()[0]
    assert one.ngram_hits == 1 and one.contaminated
    assert two.ngram_hits == 1 and not two.contaminated


def test_decontaminate_fuzzy_planted(spark):
    """A lightly-edited copy of a benchmark doc is flagged with high
    jaccard; unrelated docs are not; docs near-dupping EACH OTHER but
    not the benchmark are not flagged."""
    from tilemaker_spark.operators.webtext import decontaminate_fuzzy

    bench_text = " ".join(f"b{i} b{i}x" for i in range(40))
    other = " ".join(f"c{i} c{i}y" for i in range(40))
    bench = spark.createDataFrame([(1000, bench_text)],
                                  "doc_id long, text string")
    docs = spark.createDataFrame(
        [(0, bench_text + " tail"),     # near-dup of the benchmark
         (1, other),                    # near-dup of doc 2, NOT bench
         (2, other + " tail"),
         (3, " ".join(f"u{i} u{i}z" for i in range(40)))],  # unique
        "doc_id long, text string")
    out = decontaminate_fuzzy(docs, bench, threshold=0.5)
    rows = {r.doc_id: r for r in out.collect()}
    for h in getattr(out, "_internal_persists", []):
        h.unpersist()
    assert set(rows) == {0}
    assert rows[0].n_matches == 1 and rows[0].max_jaccard >= 0.5
    assert rows[0].contaminated


def test_remove_boilerplate_lines_matches_replay(spark):
    """Line-level boilerplate removal vs a plain Python replay on a
    randomized corpus with planted boilerplate: exact line df across
    docs, trimmed matching, blank lines preserved, original order
    reconstruction, all-boilerplate docs kept as empty strings."""
    import random

    from tilemaker_spark.operators.webtext import remove_boilerplate_lines

    rng = random.Random(7)
    boiler = ["COOKIE NOTICE", "(c) 2026 Example Corp", "Home | About"]
    docs = []
    for d in range(80):
        lines = []
        if rng.random() < 0.8:
            lines.append(rng.choice(boiler))
        for _ in range(rng.randint(0, 6)):
            pick = rng.random()
            if pick < 0.15:
                lines.append("")                       # blank structure
            elif pick < 0.3:
                lines.append("  %s  " % rng.choice(boiler))  # padded dup
            else:
                lines.append(f"body {d} {rng.randint(0, 9)}")
        if rng.random() < 0.3:
            lines.append(rng.choice(boiler))
        docs.append((d, "\n".join(lines)))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    k = 5
    got = {r.doc_id: (r.text_clean, r.n_lines, r.n_removed)
           for r in remove_boilerplate_lines(df, max_line_df=k).collect()}

    dfreq = {}
    for doc_id, text in docs:
        for ln in {l.strip() for l in text.split("\n") if l.strip()}:
            dfreq[ln] = dfreq.get(ln, 0) + 1
    want = {}
    for doc_id, text in docs:
        lines = text.split("\n")
        kept = [l for l in lines
                if not l.strip() or dfreq[l.strip()] <= k]
        want[doc_id] = ("\n".join(kept), len(lines),
                        len(lines) - len(kept))
    assert got == want
    # the planted boilerplate is actually hot (sanity of the fixture)
    assert all(dfreq[b] > k for b in boiler)
    # and at least one doc lost a padded (trim-matched) variant
    assert any(g[2] > 0 for g in got.values())


def test_host_pagerank_matches_replay_and_conserves_mass(spark):
    """PageRank vs a plain Python replay of the same rounded
    recurrence on a random multigraph with dangling nodes; rank mass
    stays 1 (dangling redistribution really happens)."""
    import collections
    import random

    from tilemaker_spark.operators.webtext import host_pagerank

    rng = random.Random(11)
    edges = [(rng.randrange(40), rng.randrange(50)) for _ in range(300)]
    edges = [(s, d) for s, d in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long")

    for iters, damping in ((1, 0.85), (4, 0.85), (3, 0.5)):
        out = host_pagerank(df, iters=iters, damping=damping)
        got = {r.node: r.rank for r in out.collect()}
        for h in out._internal_persists:
            h.unpersist()

        nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
        n = len(nodes)
        deg = collections.Counter(s for s, _ in edges)
        r = {v: round(1.0 / n, 6) for v in nodes}
        for _ in range(iters):
            contrib = collections.defaultdict(float)
            for s, d in edges:
                contrib[d] += r[s] / deg[s]
            dang = sum(r[v] for v in nodes if deg[v] == 0)
            r = {v: round((1 - damping) / n +
                          damping * (contrib.get(v, 0.0) + dang / n), 6)
                 for v in nodes}
        assert got == r, f"diverged at iters={iters}, d={damping}"
        assert abs(sum(got.values()) - 1.0) < 1e-3


def test_classifier_score_matches_replay(spark):
    """Hashed linear classifier inference vs a Python replay: md5
    feature hashing, mean-of-weights logit, rounded-logit sigmoid,
    threshold keep — on a random corpus with a deterministic
    md5-derived weight vector."""
    import hashlib
    import math
    import random

    from tilemaker_spark.operators.text_analysis import classifier_score

    n_buckets = 64
    rng = random.Random(13)
    docs = [(d, " ".join(f"w{rng.randint(0, 200)}"
                         for _ in range(rng.randint(1, 40))))
            for d in range(120)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    # dyadic denominator: weights (and so their sums) are exact doubles,
    # making the replay independent of summation order — same rule the
    # contract query follows
    wrows = [(b, ((b * 37) % 21 - 10) / 16.0) for b in range(n_buckets)]
    wdf = spark.createDataFrame(wrows, "bucket long, weight double")

    got = {r.doc_id: (r.n_tokens, r.logit, r.prob, r.keep)
           for r in classifier_score(ddf, wdf, n_buckets=n_buckets,
                                     bias=0.25).collect()}

    w = dict(wrows)

    def bucket(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % n_buckets

    # engine rounding semantics: Spark's F.round (and DuckDB's round)
    # round HALF AWAY FROM ZERO on the shortest decimal representation
    # (Java BigDecimal.valueOf); Python's round is half-to-even on the
    # exact double — they differ on true decimal ties, which this
    # fixture hits (dyadic wsum / n with n divisible by 5 lands on
    # exact 7-decimal values like 0.2796875)
    import decimal

    def eround(x, nd=6):
        return float(decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(f"1e-{nd}"),
            rounding=decimal.ROUND_HALF_UP))

    want = {}
    for doc_id, text in docs:
        toks = text.split(" ")
        logit = eround(0.25 + sum(w[bucket(t)] for t in toks) / len(toks))
        prob = eround(1.0 / (1.0 + math.exp(-logit)))
        want[doc_id] = (len(toks), logit, prob, prob >= 0.5)
    assert got == want
    # fixture sanity: both classes occur
    assert {v[3] for v in got.values()} == {True, False}


def test_tfidf_keywords_matches_replay(spark):
    """Top-k keyword extraction vs a Python replay: whitespace
    tokenization with a min-length gate, tf/df exact-division score
    rounded before ranking, term tie-break, rnk 1..k per doc."""
    import decimal
    import random
    from collections import Counter

    from tilemaker_spark.operators.text_analysis import tfidf_keywords

    rng = random.Random(7)
    # short skewed vocab: common terms (low score) vs rare terms (high),
    # plus 1-char tokens the min_len gate must drop
    vocab = [f"t{i}" for i in range(30)] + ["x"]
    docs = [(d, " ".join(rng.choice(vocab[: rng.randint(3, len(vocab))])
                         for _ in range(rng.randint(2, 50))))
            for d in range(80)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")

    k = 4
    res = tfidf_keywords(ddf, k=k, min_len=2)
    got = {(r.doc_id, r.rnk): (r.term, r.tf, r.df, r.score)
           for r in res.collect()}
    for h in res._internal_persists:
        h.unpersist()

    def eround(x, nd=6):
        return float(decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(f"1e-{nd}"),
            rounding=decimal.ROUND_HALF_UP))

    tf = {d: Counter(t for t in text.split(" ") if len(t) >= 2)
          for d, text in docs}
    df = Counter(t for c in tf.values() for t in c)
    want = {}
    for d, c in tf.items():
        ranked = sorted(((eround(n / df[t]), t, n) for t, n in c.items()),
                        key=lambda s: (-s[0], s[1]))
        for i, (score, t, n) in enumerate(ranked[:k], 1):
            want[(d, i)] = (t, n, df[t], score)
    assert got == want
    # fixture sanity: gate dropped 1-char tokens; scores discriminate
    assert not any(v[0] == "x" for v in got.values())
    assert len({v[3] for v in got.values()}) > 5


def test_extract_links_edge_cases(spark):
    """href parsing over adversarial cases: relative links, mailto,
    empty host, uppercase scheme, www/case normalization, ports and
    query strings stopping the host capture, self-loops dropped,
    multi-edge counting."""
    from tilemaker_spark.operators.webtext import extract_links

    pages = [
        # two links to b.com (one www/uppercase), one to c.org:8080,
        # plus droppables: relative, mailto, anchor-only, empty host
        ("https://www.A.com/page1",
         '<a href="https://b.com/x">1</a>'
         '<a href="HTTPS://WWW.B.COM/y?q=1">2</a>'
         '<a href="http://c.org:8080/z">3</a>'
         '<a href="/relative">r</a>'
         '<a href="mailto:u@d.com">m</a>'
         '<a href="#frag">f</a>'
         '<a href="https://">empty</a>'),
        # self-loop (www-stripped both sides) dropped; ftp scheme dropped
        ("http://a.com/page2",
         '<a href="https://www.a.com/self">s</a>'
         '<a href="ftp://d.net/f">ftp</a>'
         '<a href="https://b.com/again">4</a>'),
        # page with no links at all
        ("https://lonely.net/", "<html>no anchors</html>"),
    ]
    pdf = spark.createDataFrame(
        [(u, h.encode()) for u, h in pages], "url string, html binary")
    got = {(r.src_host, r.dst_host): r.n_links
           for r in extract_links(pdf).collect()}
    assert got == {("a.com", "b.com"): 3, ("a.com", "c.org"): 1}


def test_filter_blocked_urls_rule_kinds(spark):
    """Blocklist semantics: exact host (www-normalized), host_suffix
    over deep subdomain chains (equality + dot-boundary, no substring
    false-positives), path_contains on path+query, min-rule_id tie
    break, and untouched pages pass through with blocked=False."""
    from tilemaker_spark.operators.webtext import filter_blocked_urls

    pages = spark.createDataFrame(
        [(0, "https://www.Bad.example/x"),        # host exact via www-strip
         (1, "https://a.b.bad.example/y"),         # suffix, 2 labels deep
         (2, "https://bad.example/z"),             # suffix equality
         (3, "https://notbad.example/w"),          # substring must NOT hit
         (4, "https://ok.example/p?utm=spam&x=1"), # path_contains in query
         (5, "https://bad.example/p?utm=spam"),    # rules 2+3 -> min = 2
         (6, "https://clean.example/c"),           # no rule
         ],
        "doc_id long, url string")
    rules = spark.createDataFrame(
        [(1, "host", "bad.example"),
         (2, "host_suffix", "bad.example"),
         (3, "path_contains", "utm=spam")],
        "rule_id long, kind string, pattern string")
    got = {r.doc_id: (r.host, r.blocked, r.rule_id)
           for r in filter_blocked_urls(pages, rules).collect()}
    assert got == {
        0: ("bad.example", True, 1),
        1: ("a.b.bad.example", True, 2),
        2: ("bad.example", True, 1),   # exact host rule outranks suffix
        3: ("notbad.example", False, None),
        4: ("ok.example", True, 3),
        5: ("bad.example", True, 1),
        6: ("clean.example", False, None),
    }


def test_anchor_terms_pairing_and_filters(spark):
    """href/text pair zipping stays aligned across attribute gaps and
    dropped anchors; relative/mailto anchor texts never count; empty
    anchor texts contribute nothing; counts aggregate across pages."""
    from tilemaker_spark.operators.webtext import anchor_terms

    pages = [
        # attribute gap + two absolute anchors with overlapping terms
        '<a href="https://t1.example/a" rel="nofollow">great site</a>'
        '<a href="/local">local noise</a>'
        '<a href="https://www.T2.example/b">great deal</a>',
        # empty anchor text; mailto dropped; repeat term to t1
        '<a href="https://t1.example/c"></a>'
        '<a href="mailto:x@y">mail words</a>'
        '<a href="https://t1.example/d">site</a>',
    ]
    pdf = spark.createDataFrame([(h.encode(),) for h in pages],
                                "html binary")
    got = {(r.dst_host, r.term): r.n for r in anchor_terms(pdf).collect()}
    assert got == {("t1.example", "great"): 1, ("t1.example", "site"): 2,
                   ("t2.example", "great"): 1, ("t2.example", "deal"): 1}


def test_crawl_delta_statuses(spark):
    """All four delta statuses from two tiny snapshots, with hashes
    agreeing with hashlib and url coalesced across the outer join."""
    import hashlib

    from tilemaker_spark.operators.webtext import crawl_delta

    old = spark.createDataFrame(
        [("u1", "same"), ("u2", "before"), ("u3", "gone")],
        "url string, text string")
    new = spark.createDataFrame(
        [("u1", "same"), ("u2", "after"), ("u4", "fresh")],
        "url string, text string")
    h = lambda s: hashlib.md5(s.encode()).hexdigest()
    got = {r.url: (r.old_hash, r.new_hash, r.status)
           for r in crawl_delta(old, new).collect()}
    assert got == {
        "u1": (h("same"), h("same"), "unchanged"),
        "u2": (h("before"), h("after"), "changed"),
        "u3": (h("gone"), None, "removed"),
        "u4": (None, h("fresh"), "added"),
    }


def test_gopher_rules_boundaries(spark):
    """Each rule flips exactly at its boundary: word-count bounds,
    mean-word-length bounds, distinct-stopword minimum (repeats don't
    double-count), and the alphabetic-word ratio."""
    from tilemaker_spark.operators.text_analysis import gopher_rules

    base = ("the and " + "word " * 47).strip()          # 49 words, passes all but r_words
    docs = [
        (0, base),                                      # n_words=49 -> r_words False
        (1, base + " word"),                            # n_words=50 -> r_words True
        (2, "the and " + "ab " * 48),                   # mean len (2*3+48*2)/50=2.16 -> r_wordlen False
        (3, "the the the " + "word " * 47),             # 1 distinct stopword -> r_stop False
        (4, "the and " + "word " * 36 + "12 " * 12),    # alpha 38/50=0.76 -> r_alpha False
    ]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: (r.n_words, r.r_words, r.r_wordlen, r.r_stop,
                      r.r_alpha, r.keep)
           for r in gopher_rules(ddf).collect()}
    assert got[0] == (49, False, True, True, True, False)
    assert got[1] == (50, True, True, True, True, True)
    assert got[2][2] is False and got[2][5] is False
    assert got[3][3] is False and got[3][5] is False
    assert got[4][4] is False and got[4][5] is False


def test_cap_per_host_scale_matches_naive(spark):
    """Bucketed cap_per_host == single-window naive, row for row,
    including a planted mega-host and hosts under the cap."""
    from tilemaker_spark.operators.webtext import (
        cap_per_host, cap_per_host_naive)

    rows = []
    for i in range(400):
        host = "mega.example" if i % 2 == 0 else f"s{i % 7}.example"
        www = "www." if i % 3 == 0 else ""
        rows.append((i, f"https://{www}{host}/p/{i}"))
    pages = spark.createDataFrame(rows, "doc_id long, url string")

    cols = ["doc_id", "url", "host", "n_host_pages", "host_rank"]
    for cap in (1, 3, 1000):
        a = sorted(map(tuple, cap_per_host(pages, cap)
                       .select(*cols).collect()))
        b = sorted(map(tuple, cap_per_host_naive(pages, cap)
                       .select(*cols).collect()))
        assert a == b, f"cap={cap}"
        hosts = {}
        for _, _, h, n, r in a:
            hosts.setdefault(h, []).append((r, n))
        for h, rs in hosts.items():
            ranks = sorted(r for r, _ in rs)
            assert ranks == list(range(1, min(cap, rs[0][1]) + 1)), h
    # cap=1000 exceeds every host's size: nothing dropped
    assert len(a) == 400


def test_cap_per_host_deterministic_keepers(spark):
    """The kept set is a pure function of the urls — rerun-identical
    and unaffected by input partitioning."""
    from tilemaker_spark.operators.webtext import cap_per_host

    rows = [(i, f"https://h{i % 5}.example/p/{i}") for i in range(200)]
    pages = spark.createDataFrame(rows, "doc_id long, url string")
    k1 = {r.url for r in cap_per_host(pages, 4).collect()}
    k2 = {r.url for r in
          cap_per_host(pages.repartition(13), 4).collect()}
    assert k1 == k2
    assert len(k1) == 20  # 5 hosts x cap 4


def test_curation_funnel_replay_all_reasons(spark):
    """curation_funnel == a pure-Python replay of the staged screen on
    a small crawl planted to exercise every drop reason, including the
    stage ORDER (a blocked page never shows as stale/dup, a stale
    page's text never claims dup-keeper status)."""
    import hashlib
    import re

    from tilemaker_spark.operators.webtext import curation_funnel

    good = ("the quick brown fox and a dog of the town go to market in "
            "the morning and talk of many things " * 3).strip()
    rows = []
    for i in range(60):
        host = "bad.example" if i % 6 == 0 else f"h{i % 5}.example"
        url = f"https://{host}/p/{i % 20}"  # 3 snapshots per url
        body = good if i % 4 else "tiny text"       # some fail quality
        if i in (41, 53):
            body = "shared duplicate body"          # planted dup pair...
        if i == 57:
            body = "shared duplicate body"          # ...plus a third
        rows.append((i, url, i, f"<html><body><p>{body}</p></body></html>"))
    pages = spark.createDataFrame(
        rows, "doc_id long, url string, warc_ts long, html string") \
        .withColumn("html", F.encode("html", "utf-8"))
    rules = spark.createDataFrame([(1, "host", "bad.example")],
                                  "rule_id long, kind string, pattern string")
    out = {r.doc_id: r for r in curation_funnel(pages, rules,
                                                min_words=10).collect()}
    assert len(out) == 60

    # pure-Python replay
    def extract(html):
        s = re.sub(r"<[^>]*>", " ", html)
        return re.sub(r"\s+", " ", s).strip()

    blocked = {i for i, u, t, h in rows if "bad.example" in u}
    latest = {}
    for i, u, t, h in rows:
        if i in blocked:
            continue
        if u not in latest or t > latest[u][1]:
            latest[u] = (i, t)
    fresh = {v[0] for v in latest.values()}
    texts = {i: extract(h) for i, u, t, h in rows}
    keeper = {}
    for i in sorted(fresh):
        keeper.setdefault(hashlib.md5(texts[i].encode()).hexdigest(), i)
    for i, u, t, h in rows:
        if i in blocked:
            exp = "blocked"
        elif i not in fresh:
            exp = "stale"
        elif keeper[hashlib.md5(texts[i].encode()).hexdigest()] != i:
            exp = "dup"
        elif len(texts[i].split(" ")) < 10:
            exp = "quality"
        else:
            exp = "kept"
        assert out[i].reason == exp, (i, out[i].reason, exp)
        assert out[i].kept == (exp == "kept")
    reasons = {r.reason for r in out.values()}
    assert reasons == {"blocked", "stale", "dup", "quality", "kept"}


def test_cap_per_host_property_fuzz(spark):
    """Hypothesis fuzz: bucketed cap_per_host == naive single-window
    on random host-skew distributions and caps (one Spark comparison
    per drawn case)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from tilemaker_spark.operators.webtext import (
        cap_per_host, cap_per_host_naive)

    @given(st.lists(st.integers(min_value=0, max_value=6),
                    min_size=1, max_size=120),
           st.integers(min_value=1, max_value=9))
    @settings(max_examples=12, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    def run(host_ids, cap):
        rows = [(i, f"https://h{h}.example/p/{i}")
                for i, h in enumerate(host_ids)]
        pages = spark.createDataFrame(rows, "doc_id long, url string")
        cols = ["doc_id", "host", "n_host_pages", "host_rank"]
        a = sorted(map(tuple,
                       cap_per_host(pages, cap).select(*cols).collect()))
        b = sorted(map(tuple, cap_per_host_naive(pages, cap)
                       .select(*cols).collect()))
        assert a == b

    run()


def test_canonicalize_urls_edge_cases(spark):
    """Every canonicalization rule on hand-picked adversarial urls:
    case, default vs non-default ports, nested and root-level dot
    segments, fragments, tracking/empty params, duplicate params,
    missing path."""
    from tilemaker_spark.operators.webtext import canonicalize_urls

    cases = [
        ("HTTPS://Example.COM:443/a/./b/../c?z=1&utm_source=x&a=2&#f",
         "https://example.com/a/c?a=2&z=1"),
        ("http://Site.example:80/", "http://site.example/"),
        ("http://site.example", "http://site.example/"),
        ("https://s.example/a/b/c/../../d?ref=promo",
         "https://s.example/a/d"),
        ("https://s.example/x/../..", "https://s.example/"),
        ("https://s.example/../../a", "https://s.example/a"),
        ("https://s.example/p?b=2&a=1&a=0",
         "https://s.example/p?a=0&a=1&b=2"),
        ("https://s.example:8443/p", "https://s.example:8443/p"),
        ("https://s.example/p?utm_a=1&utm_b=2", "https://s.example/p"),
        ("https://s.example/p/./././q#x?y", "https://s.example/p/q"),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)],
        "doc_id long, url string")
    out = {r.doc_id: r.url_canon for r in canonicalize_urls(df).collect()}
    for i, (u, exp) in enumerate(cases):
        assert out[i] == exp, (u, out[i], exp)
    # canonical urls are fixpoints
    df2 = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(cases)],
        "doc_id long, url string")
    out2 = {r.doc_id: r.url_canon
            for r in canonicalize_urls(df2).collect()}
    for i, (_, c) in enumerate(cases):
        assert out2[i] == c


def test_robots_screen_semantics(spark):
    """robots.txt rule semantics: * -group scoping (bot rules don't
    leak), longest-prefix match, Allow beats Disallow on equal length,
    CRLF lines, empty Disallow ignored, missing robots = allowed."""
    from tilemaker_spark.operators.webtext import robots_screen

    robots = spark.createDataFrame([
        ("a.example",
         "User-agent: bot\nDisallow: /\r\n"
         "User-agent: *\nAllow: /pub\nDisallow: /p\nDisallow:"),
        ("b.example", "User-agent: *\nAllow: /x\nDisallow: /x"),
    ], "host string, robots_txt string")
    pages = spark.createDataFrame([
        (0, "https://a.example/p/1"),        # disallow via /p
        (1, "https://a.example/pub/1"),      # allow /pub (len 4 > 2)
        (2, "https://a.example/other"),      # no match -> allowed
        (3, "https://www.A.example/p/2"),    # www+case normalized
        (4, "https://b.example/x/1"),        # equal len: Allow wins
        (5, "https://c.example/p/9"),        # no robots -> allowed
    ], "doc_id long, url string")
    got = {r.doc_id: (r.rule_kind, r.matched_prefix, r.crawl_allowed)
           for r in robots_screen(pages, robots).collect()}
    assert got[0] == ("disallow", "/p", False)
    assert got[1] == ("allow", "/pub", True)
    assert got[2] == ("none", "", True)
    assert got[3] == ("disallow", "/p", False)
    assert got[4] == ("allow", "/x", True)
    assert got[5] == ("none", "", True)
