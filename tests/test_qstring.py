"""Query-string search end-to-end: every clause type of the documented
Lucene-classic subset, rank/score-identical to pure-Python oracles built
from the same corpus (BM25 scoring via OracleIndex; phrase/NEAR match sets
recomputed from tokenized document text)."""

import math

import pytest

from colbert_spark.functions.tokenizer import py_tokenize
from colbert_spark.index.build import build_index
from colbert_spark.oracle import OracleIndex
from colbert_spark.query.phrase import PositionalSearcher
from colbert_spark.query.qstring import compile_query, search_query_strings
from colbert_spark.query.wand import IndexSearcher

K = 10


@pytest.fixture(scope="module")
def qidx(spark, tiny_corpus, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("idx_qs"))
    build_index(
        spark, spark.createDataFrame(tiny_corpus), d,
        bucket_size=127, positions=True,
    )
    ordered = tiny_corpus.sort_values("url").reset_index(drop=True)
    oracle = OracleIndex.build(list(zip(range(len(ordered)), ordered["text"])))
    toks = {i: py_tokenize(t) for i, t in zip(range(len(ordered)), ordered["text"])}
    s = IndexSearcher(spark, d)
    pos = PositionalSearcher(spark, d)
    return s, pos, oracle, toks


def _phrase_docs(toks, phrase):
    want = py_tokenize(phrase)
    n = len(want)
    return {
        d
        for d, ts in toks.items()
        if any(ts[i : i + n] == want for i in range(len(ts) - n + 1))
    }


def _near_docs(toks, t1, t2, w):
    out = set()
    for d, ts in toks.items():
        p1 = [i for i, t in enumerate(ts) if t == t1]
        p2 = [i for i, t in enumerate(ts) if t == t2]
        if any(abs(a - b) <= w for a in p1 for b in p2):
            out.add(d)
    return out


def _expect(oracle, weighted, require=None, exclude=None, allowed=None, k=K):
    """Oracle ranking for weighted terms (int weights via repetition) under
    boolean constraints and an optional allowed doc set."""
    q = " ".join(t for t, w in weighted for _ in range(int(w)))
    scores = oracle.score_all(q)
    if require:
        for grp in require:
            members = set()
            for t in grp:
                members.update(d for d, _ in oracle.postings.get(t, ()))
            if not members:
                return []
            scores = {d: s for d, s in scores.items() if d in members}
    if exclude:
        banned = set()
        for t in exclude:
            banned.update(d for d, _ in oracle.postings.get(t, ()))
        scores = {d: s for d, s in scores.items() if d not in banned}
    if allowed is not None:
        scores = {d: s for d, s in scores.items() if d in allowed}
    return sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def _run(spark, s, pos, qstrings, k=K):
    res = search_query_strings(
        s, list(enumerate(qstrings)), k=k, positional=pos
    ).collect()
    got = {}
    for r in res:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    return {q: sorted(v) for q, v in got.items()}


def _check(have, want):
    assert len(have) == len(want), (have, want)
    for (rank, doc, sc), (odoc, osc) in zip(have, want):
        assert doc == odoc, (rank, doc, odoc)
        assert math.isclose(sc, osc, rel_tol=1e-9), (rank, sc, osc)


def test_free_terms_match_plain_search(spark, qidx):
    s, pos, oracle, _ = qidx
    got = _run(spark, s, pos, ["term00000 term00003"])
    _check(got[0], _expect(oracle, [("term00000", 1), ("term00003", 1)]))


def test_must_and_must_not(spark, qidx):
    s, pos, oracle, _ = qidx
    got = _run(spark, s, pos, ["term00000 +term00003 -term00009"])
    want = _expect(
        oracle,
        [("term00000", 1), ("term00003", 1)],
        require=[["term00003"]],
        exclude=["term00009"],
    )
    _check(got[0], want)


def test_and_keyword_promotes_both(spark, qidx):
    s, pos, oracle, _ = qidx
    got = _run(spark, s, pos, ["term00002 AND term00005"])
    want = _expect(
        oracle,
        [("term00002", 1), ("term00005", 1)],
        require=[["term00002"], ["term00005"]],
    )
    _check(got[0], want)


def test_boost_is_qtf(spark, qidx):
    s, pos, oracle, _ = qidx
    got = _run(spark, s, pos, ["term00000^3 term00007"])
    _check(got[0], _expect(oracle, [("term00000", 3), ("term00007", 1)]))


def test_wildcard_scored_expansion(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = sorted(t for t in oracle.postings if t.startswith("term0000"))
    assert s.expand_like("term0000%") == exps  # engine expansion agrees
    got = _run(spark, s, pos, ["term0000*"])
    _check(got[0], _expect(oracle, [(t, 1) for t in exps]))


def test_required_wildcard_is_one_group(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = sorted(t for t in oracle.postings if t.startswith("term0000"))
    got = _run(spark, s, pos, ["term00020 +term0000*"])
    want = _expect(
        oracle,
        [("term00020", 1)] + [(t, 1) for t in exps],
        require=[exps],
    )
    _check(got[0], want)


def test_required_wildcard_no_expansion_kills_query(spark, qidx):
    s, pos, oracle, _ = qidx
    got = _run(spark, s, pos, ["term00000 +zzz*"])
    assert got.get(0) is None


def test_range_clause(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = sorted(
        t for t in oracle.postings if "term00003" <= t <= "term00007"
    )
    assert s.expand_term_range("term00003", "term00007") == exps
    got = _run(spark, s, pos, ["[term00003 TO term00007]"])
    _check(got[0], _expect(oracle, [(t, 1) for t in exps]))


def test_excluded_wildcard(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = sorted(t for t in oracle.postings if t.startswith("term0001"))
    got = _run(spark, s, pos, ["term00000 -term0001*"])
    _check(got[0], _expect(oracle, [("term00000", 1)], exclude=exps))


def test_mixed_phrase_filters_candidates(spark, qidx):
    s, pos, oracle, toks = qidx
    phrase = "term00000 term00001"
    allowed = _phrase_docs(toks, phrase)
    assert allowed  # fixture sanity: the phrase occurs at this scale
    got = _run(spark, s, pos, [f'term00005 "{phrase}"'])
    want = _expect(oracle, [("term00005", 1)], allowed=allowed)
    _check(got.get(0, []), want)


def test_pure_phrase_scores_like_phrase_bm25(spark, qidx):
    s, pos, oracle, toks = qidx
    phrase = "term00000 term00001"
    got = _run(spark, s, pos, [f'"{phrase}"'])
    ref = {
        (r["rank"], r["doc_id"], r["score"])
        for r in pos.phrase_bm25(
            spark.createDataFrame(
                [(0, phrase)], "phrase_id long, phrase string"
            ),
            k=K,
        ).collect()
    }
    assert set(got.get(0, [])) == ref
    assert ref  # matched something


def test_near_slop_filter(spark, qidx):
    # "a b"~N = the 2 distinct tokens within 2+N consecutive positions
    # (|Δpos| ≤ N+1) — the same convention as the k-token WITHIN path
    s, pos, oracle, toks = qidx
    allowed = _near_docs(toks, "term00000", "term00002", 4)
    got = _run(spark, s, pos, ['term00004 "term00000 term00002"~3'])
    want = _expect(oracle, [("term00004", 1)], allowed=allowed)
    _check(got.get(0, []), want)


def test_sloppy_pair_boundary_convention(spark, qidx):
    # slop 0 stays the exact (ordered) phrase filter for every k; slop ≥ 1
    # shares ONE unordered convention across the k=2/k=3 boundary: the k
    # distinct tokens within k + slop consecutive positions, so "a b"~1
    # compiles to NEAR with |Δpos| ≤ 2 (span ≤ 3), exactly what dropping a
    # token from "a b c"~1 (WITHIN window 4) would suggest
    s, pos, oracle, toks = qidx
    cq0 = compile_query(s, 0, 'term00004 "term00000 term00001"~0')
    assert cq0.phrases == ["term00000 term00001"] and not cq0.nears
    cq1 = compile_query(s, 0, '"term00000 term00001"~1')
    assert cq1.nears == [("term00000", "term00001", 2)]
    allowed = _near_docs(toks, "term00000", "term00001", 2)
    assert allowed
    got = _run(spark, s, pos, ['term00004 "term00000 term00001"~1'])
    want = _expect(oracle, [("term00004", 1)], allowed=allowed)
    _check(got.get(0, []), want)


def test_sloppy_phrase_dedups_before_window(spark, qidx):
    # duplicates carry no extra match requirement under within()'s set
    # semantics, so they must not inflate the window: "a b a"~1 ≡ "a b"~1
    s, pos, oracle, toks = qidx
    cq = compile_query(s, 0, '"term00000 term00001 term00000"~1')
    assert cq.nears == [("term00000", "term00001", 2)]
    assert not cq.withins


def test_filter_only_query_scores_phrase_tokens(spark, qidx):
    s, pos, oracle, toks = qidx
    phrase = "term00000 term00001"
    allowed = _phrase_docs(toks, phrase)
    got = _run(spark, s, pos, [f'"{phrase}" -term00015'])
    want = _expect(
        oracle,
        [("term00000", 1), ("term00001", 1)],
        exclude=["term00015"],
        allowed=allowed,
    )
    _check(got.get(0, []), want)


def test_heterogeneous_batch_one_call(spark, qidx):
    """All clause families in ONE batch: each qid's results are identical
    to its solo run (the batch plans must not cross-contaminate)."""
    s, pos, oracle, toks = qidx
    qs = [
        "term00000 term00003",
        "term00002 AND term00005",
        "term0000*",
        'term00005 "term00000 term00001"',
        '"term00000 term00001"',
        "term00000 +zzz*",
        "term00020 -term00001",
    ]
    batch = _run(spark, s, pos, qs)
    for i, q in enumerate(qs):
        solo = _run(spark, s, pos, [q])
        assert batch.get(i) == solo.get(0), (i, q)


def test_fielded_clause_rejected(spark, qidx):
    s, pos, _, _ = qidx
    with pytest.raises(ValueError, match="fielded"):
        compile_query(s, 0, "title:hash")


def test_long_slop_phrase_compiles_to_within(spark, qidx):
    # k > 2 sloppy phrases are no longer rejected: they compile to an
    # unordered WITHIN filter of window k + slop
    s, pos, _, _ = qidx
    cq = compile_query(s, 0, '"term00000 term00001 term00002"~2')
    assert cq.withins == [(["term00000", "term00001", "term00002"], 5)]
    assert not cq.nears and not cq.phrases


def test_expansion_cap(spark, qidx):
    s, pos, _, _ = qidx
    s2 = IndexSearcher(spark, s.index_dir)
    s2.max_expansions = 3
    with pytest.raises(ValueError, match="max_expansions"):
        s2.expand_like("term%")


def test_expansion_lru_schedules_no_second_job(spark, qidx):
    s, pos, _, _ = qidx
    s2 = IndexSearcher(spark, s.index_dir)
    first = s2.expand_like("term0000%")
    jobs_after_first = s2._dict_lookup_jobs  # noqa: F841 (expansion isn't a dict lookup)
    again = s2.expand_like("term0000%")
    assert first == again
    assert ("like", "term0000%") in s2._expand_cache


# --- fuzzy clauses (Lucene FuzzyQuery, `term~N`) -------------------------


def _lev(a, b):
    """Plain Levenshtein — the test's independent model of expand_fuzzy."""
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _fuzzy_vocab(oracle, q, n):
    return sorted(t for t in oracle.postings if _lev(q, t) <= n)


def test_expand_fuzzy_matches_pure_levenshtein(spark, qidx):
    s, _, oracle, _ = qidx
    got = s.expand_fuzzy("term00042", 1)
    assert got == _fuzzy_vocab(oracle, "term00042", 1)
    assert "term00042" in got  # the exact term is its own distance-0 match
    assert s.expand_fuzzy("term00042", 0) == ["term00042"]
    with pytest.raises(ValueError):
        s.expand_fuzzy("term00042", 3)


def test_fuzzy_scored_expansion(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = _fuzzy_vocab(oracle, "term00042", 1)
    assert len(exps) > 1  # the digit grid guarantees real neighbors
    have = _run(spark, s, pos, ["term00042~1"])
    _check(have[0], _expect(oracle, [(t, 1) for t in exps]))


def test_required_fuzzy_is_one_group(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = _fuzzy_vocab(oracle, "term00042", 1)
    have = _run(spark, s, pos, ["+term00042~1 term00007"])
    want = _expect(
        oracle,
        [(t, 1) for t in exps] + [("term00007", 1)],
        require=[exps],
    )
    _check(have[0], want)


def test_excluded_fuzzy(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = _fuzzy_vocab(oracle, "term00042", 1)
    have = _run(spark, s, pos, ["term00007 -term00042~1"])
    _check(have[0], _expect(oracle, [("term00007", 1)], exclude=exps))


def test_required_fuzzy_no_expansion_kills_query(spark, qidx):
    s, pos, oracle, _ = qidx
    have = _run(spark, s, pos, ["+zzzzzzzzzzzz~1 term00007"])
    assert have == {}


def test_fuzzy_boost_is_qtf(spark, qidx):
    s, pos, oracle, _ = qidx
    exps = _fuzzy_vocab(oracle, "term00042", 1)
    have = _run(spark, s, pos, ["term00042~1^3 term00007"])
    want = _expect(
        oracle, [(t, 3) for t in exps] + [("term00007", 1)]
    )
    _check(have[0], want)


# --- k-token sloppy phrases → unordered WITHIN filters -------------------


def _within_docs(toks, terms, window):
    """Independent model of the WITHIN filter: docs where some window of
    `window` consecutive positions contains every term in `terms`."""
    out = set()
    want = list(dict.fromkeys(terms))
    k = len(want)
    for d, ts in toks.items():
        occ = sorted(
            (p, want.index(t)) for p, t in enumerate(ts) if t in want
        )
        counts = [0] * k
        missing, left = k, 0
        best = None
        for right in range(len(occ)):
            c = occ[right][1]
            if counts[c] == 0:
                missing -= 1
            counts[c] += 1
            while missing == 0:
                span = occ[right][0] - occ[left][0] + 1
                if best is None or span < best:
                    best = span
                cl = occ[left][1]
                counts[cl] -= 1
                if counts[cl] == 0:
                    missing += 1
                left += 1
        if best is not None and best <= window:
            out.add(d)
    return out


def _three_cooccurring_terms(toks):
    """Three distinct terms adjacent in some document — guaranteed to have
    a non-empty WITHIN match set at small windows."""
    for d, ts in toks.items():
        for i in range(len(ts) - 2):
            tri = ts[i : i + 3]
            if len(set(tri)) == 3:
                return tri
    raise AssertionError("corpus has no 3 distinct adjacent tokens")


def test_multi_token_sloppy_phrase_is_within_filter(spark, qidx):
    s, pos, oracle, toks = qidx
    t1, t2, t3 = _three_cooccurring_terms(toks)
    slop = 2
    window = 3 + slop
    allowed = _within_docs(toks, [t1, t2, t3], window)
    assert allowed
    q = f'term00007 "{t1} {t2} {t3}"~{slop}'
    have = _run(spark, s, pos, [q])
    want = _expect(oracle, [("term00007", 1)], allowed=allowed)
    _check(have.get(0, []), want)


def test_filter_only_within_scores_its_tokens(spark, qidx):
    s, pos, oracle, toks = qidx
    t1, t2, t3 = _three_cooccurring_terms(toks)
    window = 3 + 1
    allowed = _within_docs(toks, [t1, t2, t3], window)
    have = _run(spark, s, pos, [f'"{t1} {t2} {t3}"~1'])
    want = _expect(
        oracle, [(t1, 1), (t2, 1), (t3, 1)], allowed=allowed
    )
    _check(have.get(0, []), want)


def test_within_direct_matches_model(spark, qidx):
    s, pos, oracle, toks = qidx
    t1, t2, t3 = _three_cooccurring_terms(toks)
    for window in (3, 5, 8):
        groups = spark.createDataFrame(
            [(0, f"{t1} {t2} {t3}")], "group_id long, terms string"
        )
        got = {
            r["doc_id"] for r in pos.within(groups, window=window).collect()
        }
        assert got == _within_docs(toks, [t1, t2, t3], window), window


def test_within_oov_term_matches_nothing(spark, qidx):
    s, pos, oracle, toks = qidx
    t1, t2, _ = _three_cooccurring_terms(toks)
    groups = spark.createDataFrame(
        [(0, f"{t1} {t2} zzzznotaterm")], "group_id long, terms string"
    )
    assert pos.within(groups, window=50).count() == 0


def test_large_qstring_batch_compiles_streaming(spark, qidx, monkeypatch):
    """A DataFrame batch past resolve_collect_max must stream through
    toLocalIterator (partition-at-a-time driver residency — the qstring
    analog of the plain-text path's distributed-resolution contract), with
    results identical to the list-input run."""
    # patch the CLASSIC class: pyspark 4's pyspark.sql.DataFrame is a
    # facade, and classic instances dispatch to their own override
    from pyspark.sql.classic.dataframe import DataFrame

    s, pos, oracle, toks = qidx
    qs = [(i, f"term{i % 20:05d} term{(i + 3) % 20:05d}") for i in range(40)]
    want = _run(spark, s, pos, [q for _, q in qs])

    calls = {"n": 0}
    orig = DataFrame.toLocalIterator

    def counting(self, *a, **kw):
        calls["n"] += 1
        return orig(self, *a, **kw)

    monkeypatch.setattr(DataFrame, "toLocalIterator", counting)
    s2 = IndexSearcher(spark, s.index_dir)
    s2.resolve_collect_max = 5  # force the streaming branch (40 > 5)
    qdf = spark.createDataFrame(qs, "qid long, query string")
    got_rows = search_query_strings(s2, qdf, k=K, positional=pos).collect()
    assert calls["n"] >= 1  # the streaming ingress actually engaged
    got = {}
    for r in got_rows:
        got.setdefault(r["qid"], []).append((r["rank"], r["doc_id"], r["score"]))
    got = {q: sorted(v) for q, v in got.items()}
    assert got == want and got

    # under the cap the serving shape stays: ONE collect, no iterator
    calls["n"] = 0
    s2.resolve_collect_max = 10_000
    small = spark.createDataFrame(qs[:8], "qid long, query string")
    r_small = search_query_strings(s2, small, k=K, positional=pos).collect()
    assert calls["n"] == 0
    assert len(r_small) > 0
