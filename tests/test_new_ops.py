"""Unit tests for the training-pipeline operators added beyond the core
engine (multimodal stubs, LSH paths, streaming). Cross-engine value equality
is covered exhaustively by tests/test_driver_contract.py — these tests check
the properties the SQL oracles can't express."""

import pytest

SF = "/root/testdata/sf0.001"


def test_decode_real_is_stubbed():
    from colbert_spark.operators.multimodal import decode_real

    with pytest.raises(NotImplementedError):
        decode_real(b"\x89PNG", "image/png")


def test_media_table_schema(spark):
    from colbert_spark.operators.multimodal import media_table

    df = media_table(spark, SF)
    fields = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert fields == {
        "doc_id": "bigint",
        "media": "binary",
        "media_type": "string",
    }
    row = df.orderBy("doc_id").first()
    assert isinstance(row["media"], (bytes, bytearray))
    assert row["media_type"] in ("image/png", "audio/wav", "video/mp4")


def test_ann_lsh_is_subset_of_exact_ranking(spark):
    """Every (qid, cand) pair LSH returns must carry the same cosine the
    exact brute-force path computes — the bucket join must not corrupt
    scores, only shrink the candidate set."""
    from colbert_spark.operators.similarity import ann_lsh_topk, knn_cosine_topk

    exact = {
        (r["qid"], r["cand_id"]): r["sim_r"]
        for r in knn_cosine_topk(spark, SF).collect()
    }
    # exact top-10 per query; LSH pairs that appear in it must agree on sim
    ann = ann_lsh_topk(spark, SF).collect()
    assert len(ann) > 0
    for r in ann:
        key = (r["qid"], r["cand_id"])
        if key in exact:
            assert abs(exact[key] - r["sim_r"]) < 1e-9


@pytest.fixture(scope="module")
def dup_sf_dir(spark, tmp_path_factory):
    """sf_dir with a documents table that CONTAINS duplicates (the public
    fixture has none): 20 base docs, docs 100-104 duplicate docs 0-4."""
    d = tmp_path_factory.mktemp("dupsf")
    base = [
        (i, f"alpha bravo term{i:05d} charlie delta echo foxtrot golf term{i % 7:05d} hotel")
        for i in range(20)
    ]
    dups = [(100 + i, base[i][1]) for i in range(5)]
    spark.createDataFrame(base + dups, "doc_id long, text string").write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def test_minhash_lsh_finds_exact_duplicates(spark, dup_sf_dir):
    """Identical texts must collide in every band → surface as pairs."""
    from colbert_spark.operators.dedup import minhash_lsh_pairs

    pairs = {
        (r["a_id"], r["b_id"])
        for r in minhash_lsh_pairs(spark, dup_sf_dir).collect()
    }
    for i in range(5):
        assert (i, 100 + i) in pairs


def test_simhash_identical_for_duplicate_docs(spark, dup_sf_dir):
    """Exact duplicate texts get identical simhash signatures; distinct base
    docs (different rare terms) get distinct ones somewhere in the set."""
    from colbert_spark.operators.dedup import simhash32

    sigs = {r["doc_id"]: r["simhash"] for r in simhash32(spark, dup_sf_dir).collect()}
    for i in range(5):
        assert sigs[i] == sigs[100 + i]
    assert len(set(sigs.values())) > 1


def test_cli_roundtrip(tmp_path, spark):
    """python -m colbert_spark synth → index → query, in-process."""
    from colbert_spark.__main__ import main

    wp = str(tmp_path / "wp")
    idx = str(tmp_path / "idx")
    qf = tmp_path / "q.txt"
    assert main(["synth", "--output", wp, "--docs", "300", "--partitions", "4"]) == 0
    assert main(["index", "--input", wp, "--output", idx, "--bucket-size", "100"]) == 0
    qf.write_text("term00001 term00002\n")
    assert main(["query", "--index", idx, "--questions", str(qf), "--k", "5"]) == 0


def test_pq_refine_improves_on_raw_adc(spark):
    """PQ sanity: the exact-refine stage must not hurt — refined recall@10 vs
    the exact ranking ≥ raw ADC recall, and both are measured (the
    scale-path-needs-a-recall-number rule). Depth is the recall dial."""
    from colbert_spark.operators.similarity import (
        ann_pq_refine,
        ann_pq_topk,
        knn_cosine_topk,
    )

    sf = "/root/testdata/sf0.01"
    exact = {(r["qid"], r["cand_id"]) for r in knn_cosine_topk(spark, sf).collect()}
    raw = {(r["qid"], r["cand_id"]) for r in ann_pq_topk(spark, sf).collect()}
    ref = {(r["qid"], r["cand_id"]) for r in ann_pq_refine(spark, sf).collect()}
    r_raw = len(exact & raw) / len(exact)
    r_ref = len(exact & ref) / len(exact)
    assert r_ref >= r_raw
    assert r_ref > 0
