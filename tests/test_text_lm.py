"""Brute-force verification of the bigram-LM corpus-fit scorer.

The integer columns are contract-checked against DuckDB (query
`lm_corpus_fit`); the float columns (xent, ppl) can't be hash-pinned —
groupBy float-sum order is engine-nondeterministic — so they are
verified here against a plain-Python reference within tolerance.
"""

import math
import random
from collections import Counter

import pytest


def _brute(score_rows, train_rows, alpha=0.5):
    cb, cw = Counter(), Counter()
    vocab = set()
    for _, text in train_rows:
        w = text.split(" ")
        vocab.update(w)
        for a, b in zip(w, w[1:]):
            cb[(a, b)] += 1
            cw[a] += 1
    v = len(vocab)
    out = {}
    for doc_id, text in score_rows:
        w = text.split(" ")
        bgs = list(zip(w, w[1:]))
        if not bgs:
            continue
        n = len(bgs)
        oov = sum(1 for g in bgs if cb[g] == 0)
        sum_df = sum(cb[g] for g in bgs)
        xent = -sum(
            math.log2((cb[g] + alpha) / (cw[g[0]] + alpha * v))
            for g in bgs) / n
        out[doc_id] = (n, oov, round(sum_df / n, 6), round(oov / n, 6),
                       xent, 2 ** xent)
    return out


def test_bigram_lm_score_vs_bruteforce(spark):
    from tilemaker_spark.operators.text_analysis import bigram_lm_score

    rng = random.Random(11)
    vocab = [f"w{i}" for i in range(25)]
    rows = [(d, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 40))))
            for d in range(80)]
    train = [r for r in rows if r[0] % 4 != 0]
    score = [r for r in rows if r[0] % 4 == 0]
    sdf = spark.createDataFrame(score, "doc_id long, text string")
    tdf = spark.createDataFrame(train, "doc_id long, text string")
    res = bigram_lm_score(sdf, tdf)
    got = {r.doc_id: (r.n_bigrams, r.oov_bigrams, r.avg_bigram_df,
                      r.oov_ratio, r.xent, r.ppl)
           for r in res.collect()}
    for h in getattr(res, "_internal_persists", []):
        h.unpersist()
    exp = _brute(score, train)
    assert set(got) == set(exp)
    for d, (n, oov, adf, ovr, xent, ppl) in exp.items():
        gn, goov, gadf, govr, gxent, gppl = got[d]
        assert (gn, goov) == (n, oov)
        assert gadf == adf and govr == ovr
        assert gxent == pytest.approx(xent, abs=2e-4)
        assert gppl == pytest.approx(ppl, rel=1e-3)


def test_bigram_lm_oov_and_short_docs(spark):
    from tilemaker_spark.operators.text_analysis import bigram_lm_score

    tdf = spark.createDataFrame(
        [(1, "a b c a b")], "doc_id long, text string")
    sdf = spark.createDataFrame(
        [(10, "a b z"),   # 'a b' seen twice, 'b z' unseen
         (20, "solo")],   # single token: no bigrams, no row
        "doc_id long, text string")
    res = bigram_lm_score(sdf, tdf)
    got = {r.doc_id: r for r in res.collect()}
    for h in getattr(res, "_internal_persists", []):
        h.unpersist()
    assert set(got) == {10}
    r = got[10]
    assert r.n_bigrams == 2 and r.oov_bigrams == 1
    assert r.avg_bigram_df == 1.0       # (2 + 0) / 2
    assert r.oov_ratio == 0.5
    # unseen bigram is smoothed, not -inf
    assert math.isfinite(r.xent) and r.ppl > 1


def test_build_vocab_scale_path_matches_naive_and_replay(spark):
    """Bucketed-rank vocabulary == naive global-window vocabulary,
    row for row, on a random corpus with heavy count collisions
    (forces the within-count term ordering and multi-bucket prefixes),
    and both match a Python replay; min_count filter honored."""
    import random
    from collections import Counter

    from tilemaker_spark.operators.text_analysis import (
        build_vocab, build_vocab_naive)

    rng = random.Random(4)
    vocab = ([f"a{i}" for i in range(40)] + [f"b{i}" for i in range(40)]
             + [f"zz{i}" for i in range(20)])
    docs = [(d, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(1, 30))))
            for d in range(150)]
    ddf = spark.createDataFrame(docs, "doc_id long, text string")

    for mc in (1, 3):
        naive = sorted(build_vocab_naive(ddf, min_count=mc).collect())
        scale = sorted(build_vocab(ddf, min_count=mc).collect())
        assert naive == scale

        cnt = Counter(t for _, text in docs for t in text.split(" "))
        ranked = sorted(((n, t) for t, n in cnt.items() if n >= mc),
                        key=lambda s: (-s[0], s[1]))
        want = sorted((t, n, i) for i, (n, t) in enumerate(ranked))
        assert [(r.term, r.n, r.vocab_id) for r in naive] == want
    # fixture sanity: count ties exist (within-count ordering exercised)
    top = Counter(t for _, text in docs for t in text.split(" "))
    assert len(set(top.values())) < len(top)


def _bpe_replay(texts, n_merges, passes=5):
    """Pure-Python replay of learn_bpe_merges' DEFINED semantics:
    weighted pair argmax with (lhs, rhs) tie-break, then the padded
    5-pass substring replace."""
    wc = {}
    for t in texts:
        for w in t.split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    seqs = {("|" + "|".join(w) + "|"): n for w, n in wc.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = {}
        for s, n in seqs.items():
            toks = s.strip("|").split("|")
            for a, b in zip(toks, toks[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        if not pc:
            break
        (l, r), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, n))
        pat, rep = f"|{l}|{r}|", f"|{l}{r}|"
        nxt = {}
        for s, cnt in seqs.items():
            for _ in range(passes):
                s = s.replace(pat, rep)
            nxt[s] = nxt.get(s, 0) + cnt
        seqs = nxt
    return merges


def test_bpe_merges_matches_python_replay(spark):
    """learn_bpe_merges == the pure-Python replay on synthetic docs,
    including repeated-pair runs (aaaa) that need multiple replace
    passes and frequency ties broken lexicographically."""
    from tilemaker_spark.operators.text_analysis import learn_bpe_merges

    texts = ["the theme thesis " * 4 + "aaaa aaaa baab",
             "zz zz zz the other theory " * 3,
             "ab ab ab cd cd"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    out = learn_bpe_merges(docs, n_merges=5)
    got = [tuple(r) for r in out.collect()]
    for h in out._internal_persists:
        h.unpersist()
    assert got == _bpe_replay(texts, 5)


def test_bpe_merges_canonical_on_runfree_words(spark):
    """On words with no same-pair runs the defined semantics coincide
    with canonical BPE (every occurrence merged per step) — checked
    against an independent canonical implementation."""
    from tilemaker_spark.operators.text_analysis import learn_bpe_merges

    texts = ["lower lowest low newer newest new " * 3]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    out = learn_bpe_merges(docs, n_merges=4)
    got = [(r.lhs, r.rhs) for r in out.collect()]
    for h in out._internal_persists:
        h.unpersist()

    # canonical BPE (Sennrich alg. 1, no end-of-word marker), same ties
    wc = {}
    for w in texts[0].split(" "):
        if w:
            wc[w] = wc.get(w, 0) + 1
    vocab = {tuple(w): n for w, n in wc.items()}
    exp = []
    for _ in range(4):
        pc = {}
        for sym, n in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        (l, r), _n = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        exp.append((l, r))
        nv = {}
        for sym, n in vocab.items():
            out_sym, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    out_sym.append(l + r)
                    i += 2
                else:
                    out_sym.append(sym[i])
                    i += 1
            nv[tuple(out_sym)] = nv.get(tuple(out_sym), 0) + n
        vocab = nv
    assert got == exp


def test_apply_bpe_matches_replay_and_counts(spark):
    """apply_bpe == the padded-replace replay per word; token count =
    chars when no merges, and drops by one per applied merge."""
    from tilemaker_spark.operators.text_analysis import (
        _BPE_REPLACE_PASSES, apply_bpe, learn_bpe_merges)

    texts = ["the theme then " * 3, "aaaa abab the", "xy"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    merges_df = learn_bpe_merges(docs, n_merges=3)
    merges = [(r.lhs, r.rhs) for r in merges_df.orderBy("rank").collect()]
    out = {r.doc_id: r for r in apply_bpe(docs, merges_df).collect()}
    for h in merges_df._internal_persists:
        h.unpersist()

    for i, t in enumerate(texts):
        words = [w for w in t.split(" ") if w]
        n_tok = 0
        for w in words:
            s = "|" + "|".join(w) + "|"
            for lhs, rhs in merges:
                pat, rep = f"|{lhs}|{rhs}|", f"|{lhs}{rhs}|"
                for _ in range(_BPE_REPLACE_PASSES):
                    s = s.replace(pat, rep)
            n_tok += len(s.strip("|").split("|"))
        r = out[i]
        assert r.n_words == len(words)
        assert r.n_chars == sum(len(w) for w in words)
        assert r.n_bpe_tokens == n_tok
        assert r.n_bpe_tokens <= r.n_chars  # merges only shrink
    # no merges -> token count degenerates to char count
    out0 = {r.doc_id: r for r in apply_bpe(docs, []).collect()}
    for i in out0:
        assert out0[i].n_bpe_tokens == out0[i].n_chars


def test_token_percentiles_brute_force(spark):
    """Histogram-decomposed percentiles == a per-group sort replay,
    including groups of size 1 and ceil-boundary group sizes (n=10
    with p=9/10 lands exactly on the boundary the float path gets
    wrong)."""
    import collections

    from tilemaker_spark.operators.text_analysis import token_percentiles

    rows, did = [], 0
    for lang, sizes in [("a", [3, 7, 7, 9, 20]), ("b", [5]),
                        ("c", list(range(1, 11)))]:
        for s in sizes:
            rows.append((did, " ".join("w" for _ in range(s)), lang))
            did += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = token_percentiles(docs)
    got = {r.lang: tuple(r)[1:] for r in out.collect()}
    for h in out._internal_persists:
        h.unpersist()

    data = collections.defaultdict(list)
    for _, t, lg in rows:
        data[lg].append(len(t.split(" ")))
    for lg, nts in data.items():
        nts.sort()
        n = len(nts)
        exp = tuple(nts[-(-num * n // den) - 1]
                    for num, den in ((1, 2), (9, 10), (99, 100)))
        assert got[lg] == (n, sum(nts)) + exp, (lg, got[lg], exp)
