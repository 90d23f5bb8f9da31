"""End-to-end CLI smoke: the documented `main.py` subcommands — synth →
index → append → compact → query (live + time-travel) — run in-process and
produce a valid index and JSONL results. This is the spark-submit surface
(README "Run"), so a regression here breaks the advertised cluster entry."""

import json

import pytest

from colbert_spark.__main__ import main


@pytest.fixture(scope="module")
def cli_index(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    corpus, extra, idx = str(root / "pages"), str(root / "extra"), str(root / "idx")
    assert main(["synth", "--output", corpus, "--docs", "600", "--partitions", "4"]) == 0
    assert main(["index", "--input", corpus, "--output", idx, "--bucket-size", "200"]) == 0
    # second epoch from a disjoint synthetic slice (different seed via docs offset:
    # write a fresh corpus and append it — urls differ by seeded generator draw)
    from colbert_spark.sources.synth import synth_web_pages

    pages = synth_web_pages(900).iloc[600:]
    spark.createDataFrame(pages).write.mode("overwrite").parquet(extra)
    assert main(["append", "--input", extra, "--index", idx]) == 0
    return idx


def _run_query(idx, tmp_path, args=()):
    qfile = tmp_path / "q.txt"
    qfile.write_text("term00001 term00008\nterm00012 term00066\n")
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["query", "--index", idx, "--questions", str(qfile), "--k", "5", *args])
    assert rc == 0
    rows = [json.loads(line) for line in buf.getvalue().splitlines() if line.strip()]
    for r in rows:
        assert set(r) == {"qid", "rank", "doc_id", "score"}
    return rows


def test_cli_index_query_compact_roundtrip(cli_index, tmp_path):
    before = _run_query(cli_index, tmp_path)
    assert before, "query returned no rows"
    before_e0 = _run_query(cli_index, tmp_path, ["--as-of-epoch", "0"])

    assert main(["compact", "--index", cli_index]) == 0
    stats = json.load(open(f"{cli_index}/stats.json"))
    assert stats["compactions"] == 1
    assert stats["n_blocks_after"] < stats["n_blocks_before"]

    assert _run_query(cli_index, tmp_path) == before
    assert _run_query(cli_index, tmp_path, ["--as-of-epoch", "0"]) == before_e0


def test_cli_negation_excludes_docs(cli_index, tmp_path, spark):
    """`-term` in a CLI question line removes every doc containing it: the
    plain top hit disappears when one of its own terms is negated, no
    surviving doc contains the banned term, and survivors keep their exact
    plain-path scores."""
    import contextlib
    import io

    import pandas as pd

    from colbert_spark.functions.tokenizer import py_tokenize
    from colbert_spark.sources.synth import synth_web_pages

    # reconstruct the corpus the fixture indexed (synth is deterministic):
    # 600 base pages + the appended slice 600..900
    corpus = pd.concat(
        [synth_web_pages(600), synth_web_pages(900).iloc[600:]], ignore_index=True
    )
    url_text = dict(zip(corpus["url"], corpus["text"]))
    doc_text = {
        r["doc_id"]: url_text[r["url"]]
        for r in spark.read.parquet(f"{cli_index}/docs").collect()
    }

    qfile = tmp_path / "qneg.txt"

    def run(text):
        qfile.write_text(text)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = main(["query", "--index", cli_index, "--questions", str(qfile),
                       "--k", "5"])
        assert rc == 0
        return [json.loads(line) for line in buf.getvalue().splitlines() if line.strip()]

    plain = run("term00001 term00008\n")
    assert plain
    # ban a term the top hit contains but the query does not
    top_tokens = set(py_tokenize(doc_text[plain[0]["doc_id"]]))
    banned_term = sorted(top_tokens - {"term00001", "term00008"})[0]
    banned_docs = {d for d, t in doc_text.items() if banned_term in py_tokenize(t)}

    neg = run(f"term00001 term00008 -{banned_term}\n")
    assert plain[0]["doc_id"] in banned_docs
    assert all(d["doc_id"] not in banned_docs for d in neg)
    # negation only removes: survivors keep their exact plain-path score
    plain_scores = {d["doc_id"]: d["score"] for d in plain}
    for d in neg:
        if d["doc_id"] in plain_scores:
            assert abs(d["score"] - plain_scores[d["doc_id"]]) < 1e-9


def test_cli_merge_and_analyzer(spark, tmp_path):
    import contextlib
    import io

    root = tmp_path
    a_pages, b_pages = str(root / "pa"), str(root / "pb")
    assert main(["synth", "--output", a_pages, "--docs", "300", "--partitions", "2"]) == 0
    from colbert_spark.sources.synth import synth_web_pages

    spark.createDataFrame(synth_web_pages(600).iloc[300:]).write.parquet(b_pages)
    a_idx, b_idx, fused = str(root / "ia"), str(root / "ib"), str(root / "fused")
    assert main(["index", "--input", a_pages, "--output", a_idx, "--bucket-size", "100"]) == 0
    assert main(["index", "--input", b_pages, "--output", b_idx, "--bucket-size", "100"]) == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["merge", "--inputs", a_idx, b_idx, "--output", fused])
    assert rc == 0
    stats = json.loads(buf.getvalue().splitlines()[-1])
    assert stats["N"] == 600
    rows = _run_query(fused, root)
    assert rows and all(r["rank"] >= 1 for r in rows)

    # --analyzer is recorded in stats.json and applied at query time
    s_idx = str(root / "stem")
    assert main([
        "index", "--input", a_pages, "--output", s_idx,
        "--bucket-size", "100", "--analyzer", "s_stem",
    ]) == 0
    with open(s_idx + "/stats.json") as f:
        assert json.load(f)["analyzer"] == "s_stem"


def test_cli_qsearch_single_and_federated(cli_index, tmp_path, spark):
    """`qsearch` serves the query language from the CLI: boolean + fuzzy +
    wildcard strings against one index, and the boolean fragment against a
    2-shard federation (repeat --index)."""
    import contextlib
    import io

    qfile = tmp_path / "qs.txt"
    qfile.write_text(
        "term00001 +term00008\nterm00012~1\nterm0006* -term00001\n"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main(["qsearch", "--index", cli_index, "--queries", str(qfile), "--k", "5"])
    assert rc == 0
    rows = [json.loads(x) for x in buf.getvalue().splitlines() if x.strip()]
    assert rows and {r["qid"] for r in rows} >= {0, 1}
    for r in rows:
        assert set(r) == {"qid", "rank", "doc_id", "score"}

    # federation: split the same corpus into two shard indexes
    root = tmp_path
    a_pages, b_pages = str(root / "qa_pages"), str(root / "qb_pages")
    a_idx, b_idx = str(root / "qa_idx"), str(root / "qb_idx")
    assert main(["synth", "--output", a_pages, "--docs", "200", "--partitions", "2"]) == 0
    from colbert_spark.sources.synth import synth_web_pages

    pages = synth_web_pages(400).iloc[200:]
    spark.createDataFrame(pages).write.mode("overwrite").parquet(b_pages)
    assert main(["index", "--input", a_pages, "--output", a_idx, "--bucket-size", "100"]) == 0
    assert main(["index", "--input", b_pages, "--output", b_idx, "--bucket-size", "100"]) == 0
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rc = main([
            "qsearch", "--index", a_idx, "--index", b_idx,
            "--queries", str(qfile), "--k", "5",
        ])
    assert rc == 0
    rows = [json.loads(x) for x in buf.getvalue().splitlines() if x.strip()]
    assert rows
    for r in rows:
        assert set(r) == {"qid", "rank", "url", "score"}
