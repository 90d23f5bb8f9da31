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
