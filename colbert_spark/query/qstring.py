"""Query-string search: Lucene classic syntax in, one engine plan out.

This is the execution half of `query/parser.py` — it compiles a parsed
clause list onto the engine's STRUCTURED channels (`IndexSearcher.
search_compiled`) so terms travel final (tokenized + analyzed exactly once,
wildcards/ranges already expanded against the dictionary) and never round-
trip through the string columns.

Compilation rules (the documented subset; reference exposes retrieval as a
programmatic API — ``awutils/search_utils.py`` — so the query language is
an engine-surface addition, mirrored on Lucene classic / ES `query_string`):

  SHOULD term            → scored (weight = ^boost; qtf semantics)
  MUST term (+x, AND)    → scored AND a singleton require group (Lucene's
                           scored-MUST: constrains and contributes)
  MUST_NOT term (-x,NOT) → exclude
  wildcard / [lo TO hi] / term~N
                         → dictionary expansion (`expand_like` /
                           `expand_term_range` / `expand_fuzzy`: LIKE with a
                           pushed prefix range, inclusive range, or
                           threshold-bounded Levenshtein ≤ N — Lucene
                           FuzzyQuery — over a length band), pruned scan,
                           capped at
                           `max_expansions`); SHOULD expansions score
                           individually (the engine's scored-PrefixQuery
                           precedent, `fts_prefix_bm25`); a MUST expansion
                           is ONE require group (≥1 of the expansions) whose
                           members also score; a MUST_NOT expansion excludes
                           every expansion. A MUST wildcard expanding to
                           NOTHING kills its query (matches no document).
  "phrase" (slop 0)      → a per-query FILTER on the exact-phrase match set
                           (ES bool-`filter`: constrains, does not score),
                           computed by the positional kernel and kept
                           DISTRIBUTED (cogrouped into the filtered kernel,
                           never collected). A query whose ONLY clause is
                           one exact phrase instead delegates to
                           `phrase_bm25` — true Lucene PhraseQuery scoring
                           (tf = occurrence count, idf = Σ idf(tokenᵢ)).
  "a b"~N (slop)         → unordered proximity filter with ONE convention
                           for every k: the k DISTINCT analyzed tokens
                           (within()'s documented set semantics — "a b a"
                           ≡ "a b") must fit inside a window of k + N
                           consecutive positions, so slop 0 = adjacency
                           and each slop unit widens the window by 1
                           (Indri #uwN; the unordered reading of ES
                           sloppy phrase). k = 2 routes through the
                           pair-optimized NEAR kernel (span ≤ 2 + N ⇔
                           |Δpos| ≤ N + 1); k ≠ 2 through
                           `PositionalSearcher.within`.
  no scored clause       → phrase/filter-only queries score by the BM25 of
                           their phrase tokens over the filtered set (so a
                           bare "hash join" + filters still ranks sensibly).
  field:x                → rejected here (ValueError): fielded scoring is
                           BM25F's job (`fts_bm25f*`); a query-string
                           field clause cannot score correctly against a
                           single-field index.

Scale shape: parsing + expansion are driver-side string work over LRUs
(novel wildcard = one range-pruned dictionary scan); the batch then runs
ONE `search_compiled` plan — a single pruned segment scan for all queries
without phrase filters, plus (only if some query carries a phrase) one
positional scan and one cogrouped filtered scan. Phrase match sets stay
distributed end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.functions.analyzer import py_analyze
from colbert_spark.functions.tokenizer import py_tokenize
from colbert_spark.query.parser import ParsedQuery, parse_query

TOPK_SCHEMA = "qid long, rank int, doc_id long, score double"


class CompiledQuery:
    """One query string, compiled: structured scored/require/exclude lists
    plus phrase-filter specs. `dead` marks a query that can match nothing
    (a MUST wildcard with zero expansions)."""

    __slots__ = ("qid", "scored", "require", "exclude", "phrases", "nears",
                 "withins", "dead", "pure_phrase")

    def __init__(self, qid: int):
        self.qid = qid
        self.scored: list[tuple[str, float]] = []
        self.require: list[list[str]] = []
        self.exclude: list[str] = []
        self.phrases: list[str] = []  # exact-phrase filter texts
        self.nears: list[tuple[str, str, int]] = []  # (t1, t2, |Δpos| bound)
        self.withins: list[tuple[list[str], int]] = []  # (tokens, window)
        self.dead = False
        self.pure_phrase: str | None = None  # delegate to phrase_bm25


def _analyze(text: str, analyzer) -> list[str]:
    return py_analyze(py_tokenize(text), analyzer)


def compile_query(searcher, qid: int, qstring: str) -> CompiledQuery:
    """Parse + compile ONE query string against `searcher`'s dictionary.
    Raises ValueError on syntax outside the documented subset (fielded
    clauses, slop on non-pair phrases — see module docstring)."""
    parsed: ParsedQuery = parse_query(qstring)
    cq = CompiledQuery(qid)
    analyzer = searcher._analyzer

    for c in parsed.clauses:
        if c.field is not None:
            raise ValueError(
                f"fielded clause {c.field}:{c.text!r} — query strings score "
                "single-field indexes; use the BM25F surface for fields"
            )

    # pure single-exact-phrase query: true PhraseQuery scoring downstream
    if (
        len(parsed.clauses) == 1
        and parsed.clauses[0].kind == "phrase"
        and parsed.clauses[0].slop == 0
        and parsed.clauses[0].occur != "must_not"
    ):
        cq.pure_phrase = parsed.clauses[0].text
        return cq

    for c in parsed.clauses:
        if c.kind == "phrase":
            toks = _analyze(c.text, analyzer)
            if not toks:
                continue  # tokenless phrase constrains nothing
            if c.slop == 0:
                cq.phrases.append(c.text)
            else:
                # sloppy phrase → unordered proximity filter, ONE
                # convention for every k (module docstring): the k
                # DISTINCT tokens within k + slop consecutive positions
                # — slop 0 = adjacency, each slop unit widens by 1.
                # Dedup FIRST (within()'s set semantics) so duplicates
                # never inflate the window; the k = 2 case rides the
                # pair-optimized NEAR kernel (span ≤ 2 + slop ⇔
                # |Δpos| ≤ slop + 1), k = 1 degenerates to term
                # presence (window 1 + slop ≥ min_span 1 always).
                uniq = list(dict.fromkeys(toks))
                if len(uniq) == 2:
                    cq.nears.append((uniq[0], uniq[1], c.slop + 1))
                else:
                    cq.withins.append((uniq, len(uniq) + c.slop))
            continue
        if c.kind == "term":
            toks = _analyze(c.text, analyzer)
            for t in toks:
                if c.occur == "must_not":
                    cq.exclude.append(t)
                else:
                    cq.scored.append((t, float(c.boost)))
                    if c.occur == "must":
                        cq.require.append([t])
            continue
        # wildcard / range / fuzzy: expand against the dictionary (LRU'd,
        # predicate-pruned scan, ValueError above max_expansions)
        if c.kind == "wildcard":
            exps = searcher.expand_like(c.dict_pattern().lower())
        elif c.kind == "fuzzy":
            toks = _analyze(c.text, analyzer)
            if len(toks) != 1:
                raise ValueError(
                    f"{c.text!r}~{c.fuzz}: a fuzzy clause must analyze to "
                    "exactly one token"
                )
            exps = searcher.expand_fuzzy(toks[0], c.fuzz)
        else:
            exps = searcher.expand_term_range(c.lo.lower(), c.hi.lower())
        if c.occur == "must_not":
            cq.exclude.extend(exps)
            continue
        for t in exps:
            cq.scored.append((t, float(c.boost)))
        if c.occur == "must":
            if not exps:
                cq.dead = True  # required expansion matched no term
            else:
                cq.require.append(list(exps))

    if not cq.scored and (cq.phrases or cq.nears or cq.withins):
        # filter-only query: rank the filtered set by its phrase tokens
        for p in cq.phrases:
            for t in _analyze(p, analyzer):
                cq.scored.append((t, 1.0))
        for t1, t2, _ in cq.nears:
            cq.scored.extend([(t1, 1.0), (t2, 1.0)])
        for toks, _ in cq.withins:
            cq.scored.extend((t, 1.0) for t in toks)
    return cq


def iter_query_strings(queries: DataFrame | list, cap: int):
    """(qid, qstring) iterator with BOUNDED driver ingress: a DataFrame
    batch of ≤ `cap` rows collects once (one job — the serving shape); a
    larger batch streams `toLocalIterator`, so at most one partition's
    question strings are driver-resident at a time (each string becomes
    garbage as soon as it compiles). The plain-text path's
    `resolve_collect_max` contract (`wand.py`), applied to query strings —
    a 10^6-string offline batch (query-log relabeling) no longer
    materializes on the driver."""
    if not isinstance(queries, DataFrame):
        yield from queries
        return
    sel = queries.select("qid", "query")
    head = sel.limit(cap + 1).collect()
    if len(head) <= cap:
        for r in head:
            yield (r[0], r[1])
        return
    del head  # over the cap: re-read streaming, partition at a time
    for r in sel.toLocalIterator(prefetchPartitions=True):
        yield (r[0], r[1])


def search_query_strings(
    searcher,
    queries: DataFrame | list,
    k: int = 10,
    positional=None,
) -> DataFrame:
    """Batch query-string search → (qid, rank, doc_id, score), rank 1..k per
    qid by (−score, doc_id) — `IndexSearcher.search`'s contract, with the
    full query language.

    `queries`: DataFrame with (qid, query) columns or a list of (qid,
    qstring) pairs. `positional` (a `PositionalSearcher` over the same
    index) is required only when some query carries a phrase clause; pass
    None for boolean/wildcard-only workloads on positionless indexes.

    Jobs scheduled: ONE `search_compiled` plan for all unfiltered queries;
    if any query carries phrase/NEAR filters, one positional scan producing
    the (still-distributed) per-qid allowed sets plus one cogrouped
    filtered plan; pure single-phrase queries batch into one `phrase_bm25`.
    Compilation itself is driver-side (expansion LRUs; a cache-hot batch
    schedules no dictionary job). DataFrame batches past the searcher's
    `resolve_collect_max` stream through `iter_query_strings` — the driver
    compiles partition-sized slices and never holds the full string set."""
    cap = int(getattr(searcher, "resolve_collect_max", 10_000))
    compiled = [
        compile_query(searcher, int(qid), q)
        for qid, q in iter_query_strings(queries, cap)
    ]
    return execute_compiled(searcher, compiled, k, positional)


def execute_compiled(
    searcher, compiled: list, k: int = 10, positional=None
) -> DataFrame:
    """Run already-compiled queries (`CompiledQuery` list) against one
    searcher — the execution half of `search_query_strings`, split out so
    a federation can compile ONCE (union-dictionary expansion) and execute
    the same structured payload per shard (phrase/NEAR/WITHIN filters are
    per-shard-exact: a doc's positions live in its own shard)."""
    spark: SparkSession = searcher.spark
    plain: list = []  # no phrase filters → the standard single-scan plan
    filtered: list = []  # phrase/NEAR filters → cogrouped filtered plan
    pure: list[tuple[int, str]] = []
    for cq in compiled:
        if cq.dead:
            continue
        if cq.pure_phrase is not None:
            pure.append((cq.qid, cq.pure_phrase))
        elif cq.phrases or cq.nears or cq.withins:
            filtered.append(cq)
        elif cq.scored:
            plain.append(cq)

    out: list[DataFrame] = []
    empty = spark.createDataFrame([], TOPK_SCHEMA)

    if plain:
        out.append(
            searcher.search_compiled(
                [(c.qid, c.scored, c.require, c.exclude) for c in plain], k
            )
        )

    if pure or filtered:
        if positional is None:
            raise ValueError(
                "phrase clauses need a PositionalSearcher over the same "
                "index (build with positions=True); pass positional="
            )

    if pure:
        pdf = spark.createDataFrame(pure, "phrase_id long, phrase string")
        out.append(
            positional.phrase_bm25(pdf, k=k).select(
                F.col("phrase_id").alias("qid"), "rank", "doc_id", "score"
            )
        )

    if filtered:
        # ONE positional batch for every phrase filter in the whole query
        # batch; per-qid AND across a query's multiple filters = hit-count
        # equality against the per-qid filter count (exchange-free beyond
        # the positional scan's own)
        specs: list[tuple[int, int]] = []  # (fid, qid)
        phr_rows, near_rows = [], []
        by_slop: dict[int, list] = {}
        by_window: dict[int, list] = {}  # k-token WITHIN filters
        fid = 0
        for cq in filtered:
            for p in cq.phrases:
                specs.append((fid, cq.qid))
                phr_rows.append((fid, p))
                fid += 1
            for t1, t2, win in cq.nears:
                specs.append((fid, cq.qid))
                by_slop.setdefault(win, []).append((fid, t1, t2))
                fid += 1
            for toks, window in cq.withins:
                specs.append((fid, cq.qid))
                by_window.setdefault(window, []).append(
                    (fid, " ".join(toks))
                )
                fid += 1
        hit_parts = []
        if phr_rows:
            hit_parts.append(
                positional.phrase(
                    spark.createDataFrame(
                        phr_rows, "phrase_id long, phrase string"
                    )
                ).select(F.col("phrase_id").alias("fid"), "doc_id")
            )
        for win, prs in by_slop.items():  # one scan per distinct window
            hit_parts.append(
                positional.near(
                    spark.createDataFrame(
                        prs, "pair_id long, t1 string, t2 string"
                    ),
                    window=win,
                ).select(F.col("pair_id").alias("fid"), "doc_id")
            )
        for window, grs in by_window.items():  # k-token unordered WITHIN
            hit_parts.append(
                positional.within(
                    spark.createDataFrame(
                        grs, "group_id long, terms string"
                    ),
                    window=window,
                ).select(F.col("group_id").alias("fid"), "doc_id")
            )
        hits = hit_parts[0]
        for h in hit_parts[1:]:
            hits = hits.unionByName(h)
        fid2qid = F.create_map(
            *[x for f, q in specs for x in (F.lit(f), F.lit(q))]
        )
        want: dict[int, int] = {}
        for _, q in specs:
            want[q] = want.get(q, 0) + 1
        want_col = F.create_map(
            *[x for q, n in want.items() for x in (F.lit(q), F.lit(n))]
        )
        allowed = (
            hits.select(fid2qid[F.col("fid")].alias("qid"), "doc_id")
            .groupBy("qid", "doc_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") == want_col[F.col("qid")])
            .select("qid", "doc_id")
        )
        out.append(
            searcher.search_compiled(
                [(c.qid, c.scored, c.require, c.exclude) for c in filtered],
                k,
                allowed=allowed,
                filtered_qids=frozenset(c.qid for c in filtered),
            )
        )

    if not out:
        return empty
    res = out[0]
    for df in out[1:]:
        res = res.unionByName(df)
    return res
