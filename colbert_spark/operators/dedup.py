"""Deduplication operators over `documents` — the training-data-pipeline side
of the engine (exact hash dedup, MinHash signatures, n-gram Jaccard).

Hashing is md5 (hex string) in both engines so signatures are bit-identical
across Spark and DuckDB. Shingles are 3-gram word shingles built with
higher-order array functions (JVM-side in Spark, list_transform in DuckDB) —
no Python in the pipeline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from colbert_spark.functions.tokenizer import duckdb_tokens_sql, tokens_col
from colbert_spark.sources.tables import load_table

N_HASHES = 16  # minhash permutations
LSH_BANDS = 4  # 16 hashes → 4 bands × 4 rows (band-bucket join = scale path)
SIMHASH_BITS = 32  # one md5 hex char per bit; packed signature fits BIGINT
NEARDUP_COS = 0.3  # synthetic embeddings are near-orthogonal; 0.3 exercises the pair path
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")
_TOK = duckdb_tokens_sql("text")


def shingles_col(terms: Column, n: int = 3) -> Column:
    """3-gram word shingles as array<string> (empty if doc shorter than n).

    Built as a zip_with chain over length-aligned slices — ~4× cheaper than
    the transform(sequence)+element_at formulation (per-element array
    indexing inside an interpreted lambda dominated the old plan; zip_with
    walks the three slices in lockstep)."""
    cnt = F.greatest(F.size(terms) - (n - 1), F.lit(0))
    out = F.slice(terms, 1, cnt)
    for j in range(1, n):
        out = F.zip_with(
            out, F.slice(terms, j + 1, cnt), lambda x, y: F.concat_ws(" ", x, y)
        )
    return out


def _duckdb_shingles(lst: str) -> str:
    return (
        f"CASE WHEN len({lst}) >= 3 THEN "
        f"list_transform(generate_series(1, greatest(len({lst}) - 2, 0)), "
        f"i -> {lst}[i] || ' ' || {lst}[i+1] || ' ' || {lst}[i+2]) "
        f"ELSE [] END"
    )


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: md5-of-text groups with the kept representative (min id)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.md5(F.col("text").cast("binary")).alias("h"), "doc_id")
        .groupBy("h")
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("copies"))
        .orderBy("h")
    )


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signature matrix: 16 md5-permutation minima per doc.

    Scale path: shingle explode → (doc, j) partial-agg min — a single shuffle
    keyed by (doc_id, j), no skew (uniform key)."""
    return _minhash_sig(spark, sf_dir).orderBy("doc_id", "j")


def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard for doc pairs (restricted to doc_id < 60 — the
    quadratic exact baseline; MinHash-LSH is the scale path)."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"))).alias("sh")
    ).distinct()
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("a_id"), F.col("b.doc_id").alias("b_id"))
        .agg(F.count("*").alias("i"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    return (
        inter.join(sa, F.col("a_id") == F.col("sa.doc_id"))
        .join(sb, F.col("b_id") == F.col("sb.doc_id"))
        .select(
            "a_id",
            "b_id",
            F.round(
                F.col("i") / (F.col("sa.sz") + F.col("sb.sz") - F.col("i")), 6
            ).alias("jaccard_r"),
        )
        .orderBy("a_id", "b_id")
    )


def _minhash_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide MinHash signature matrix: (doc_id, m0..m15) in ONE shuffle.

    The 16 permutation minima are 16 partial-agg `min` columns over the SAME
    shingle rows — the exchange carries one row per (doc, shingle), not ×16
    (the old crossJoin-with-j replicated every shingle 16 times through the
    shuffle; at 10^12 docs that ×16 exchange is the build's bottleneck).
    The md5 work is identical and happens map-side. No shingle-dedup shuffle:
    `min` over the duplicate-bearing multiset equals `min` over the set, so
    the only exchange is the 16-column partial-agg one."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id", F.explode(shingles_col(tokens_col("text"))).alias("sh")
    )
    return sh.groupBy("doc_id").agg(
        *[
            F.min(
                F.md5(F.concat_ws(":", F.lit(str(j)), F.col("sh")).cast("binary"))
            ).alias(f"m{j}")
            for j in range(N_HASHES)
        ]
    )


def _minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-form (doc_id, j, mh) view of the wide signature matrix — the
    stack is a per-row array explode AFTER the single aggregation shuffle."""
    wide = _minhash_wide(spark, sf_dir)
    stacked = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).cast("int").alias("j"), F.col(f"m{j}").alias("mh")
                )
                for j in range(N_HASHES)
            ]
        )
    )
    return wide.select("doc_id", stacked.alias("s")).select(
        "doc_id", F.col("s.j").alias("j"), F.col("s.mh").alias("mh")
    )


def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH candidate pairs — the 10^12-doc near-dup scale path.

    Signatures → band keys (band = md5 of the 4 row-hashes concatenated in
    row order) → STAR pairs per (band, key) bucket: every member pairs with
    the bucket's min-doc_id representative, not with every other member.
    A duplicate-heavy corpus puts thousands of docs into one band bucket;
    clique output is O(bucket²) inside that bucket, star output is O(bucket)
    and yields the same connected components for dedup resolution. Work is
    two bucket-keyed aggregations/joins — proportional to bucket sizes, never
    n² (the quadratic `ngram_jaccard_pairs` is the exact baseline). Mirrors
    the reference's IVF bucketing (`faiss_indexers.py:195-222`): coarse
    buckets shortlist candidates, exact scoring refines.
    """
    wide = _minhash_wide(spark, sf_dir)
    rows_per_band = N_HASHES // LSH_BANDS
    band_structs = []
    for bnd in range(LSH_BANDS):
        entries = F.array_sort(
            F.array(
                *[
                    F.concat_ws("=", F.lit(str(j)), F.col(f"m{j}"))
                    for j in range(bnd * rows_per_band, (bnd + 1) * rows_per_band)
                ]
            )
        )
        band_structs.append(
            F.struct(
                F.lit(bnd).cast("int").alias("band"),
                F.md5(F.concat_ws(":", entries).cast("binary")).alias("key"),
            )
        )
    bands = wide.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("s")
    ).select("doc_id", F.col("s.band").alias("band"), F.col("s.key").alias("key"))
    reps = bands.groupBy("band", "key").agg(F.min("doc_id").alias("rep"))
    return (
        bands.join(reps, ["band", "key"])
        .filter(F.col("doc_id") > F.col("rep"))
        .select(F.col("rep").alias("a_id"), F.col("doc_id").alias("b_id"))
        .distinct()
        .orderBy("a_id", "b_id")
    )


def _simhash_bit(j: int):
    """±1 pseudo-random bit for (term, j): parity of hex char j of md5(term)."""
    c = F.substring(F.md5(F.col("term").cast("binary")), j + 1, 1)
    return F.when(c.isin(*_ODD_HEX), F.lit(1)).otherwise(F.lit(-1))


def simhash32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup signature: 32-bit packed signature per doc
    (one md5 hex char of the term hash per bit).

    bit_j = sign of Σ_terms tf · (±1 from md5-hex parity of (term, j)).
    One shuffle (groupBy doc_id with 32 partial-agg sums) — no per-bit
    explode, so the exchange stays proportional to postings, not ×32.
    """
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(tokens_col("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(F.col("tf") * _simhash_bit(j)).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    packed = sums.select(
        "doc_id",
        sum(
            F.when(F.col(f"b{j}") > 0, F.lit(float(2**j))).otherwise(F.lit(0.0))
            for j in range(SIMHASH_BITS)
        ).cast("long").alias("simhash"),
    )
    return packed.orderBy("doc_id")


EMB_BANDS = 4  # banded random-hyperplane LSH: candidate iff ANY band matches
EMB_BAND_PLANES = 6  # planes per band; 2^R ≈ target corpus/bucket ratio.
# Recall dial: P(candidate) = 1 − (1 − p^R)^B with p = 1 − acos(cos)/π.
# At 10^12 rows you raise R (keeps buckets ∝ n/2^R small) and raise B to
# recover recall; the exchange stays ∝ B·n rows and the pair work ∝ Σ bucket².


def embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: banded-LSH-blocked exact cosine ≥ 0.3.

    Blocking keys are EMB_BANDS independent random-hyperplane signatures of
    EMB_BAND_PLANES planes each (`similarity._lsh_sig`, identical md5-derived
    projections in both engines): a pair is a candidate iff it collides in at
    least one band — the same band/rows recall construction as MinHash-LSH,
    applied to hyperplane signs. Candidate pairs form only WITHIN a band
    bucket (work ∝ Σ bucket², E[bucket] = n/2^R), never the O(n²/L) of
    the old few-distinct-labels blocking. Exact float64 cosine refines; the
    multi-band DISTINCT dedups pairs colliding in several bands.
    """
    from colbert_spark.operators.similarity import _lsh_sig

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    norm = F.sqrt(F.aggregate(F.transform("v", lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    e = emb.withColumn("nrm", norm).filter(F.col("nrm") > 0)
    band_structs = [
        F.struct(
            F.lit(bnd).cast("int").alias("band"),
            _lsh_sig(
                F.col("v"),
                range(bnd * EMB_BAND_PLANES, (bnd + 1) * EMB_BAND_PLANES),
            ).alias("bsig"),
        )
        for bnd in range(EMB_BANDS)
    ]
    keyed = e.select(
        "vec_id", "v", "nrm", F.explode(F.array(*band_structs)).alias("s")
    ).select("vec_id", "v", "nrm", F.col("s.band").alias("band"), F.col("s.bsig").alias("bsig"))
    from colbert_spark.operators.similarity import cosine_rerank

    a, b = keyed.alias("a"), keyed.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bsig") == F.col("b.bsig"))
        & (F.col("a.vec_id") < F.col("b.vec_id")),
    ).select(
        F.col("a.vec_id").alias("a_id"),
        F.col("b.vec_id").alias("b_id"),
        F.col("a.v").alias("av"),
        F.col("b.v").alias("bv"),
    )
    # vectorized exact refine (cosine_rerank recomputes the norms with the
    # identical fold order, so cos_r is bit-for-bit the old dot/(nrm·nrm))
    return (
        cosine_rerank(pairs, "av", "bv", out="cos")
        .select("a_id", "b_id", F.round("cos", 6).alias("cos_r"))
        .filter(F.col("cos_r") >= NEARDUP_COS)
        .distinct()
        .orderBy("a_id", "b_id")
    )


_SH = _duckdb_shingles(_TOK)

_BAND_ROWS = N_HASHES // LSH_BANDS

_SIMHASH_BITS_SQL = ", ".join(
    "sum(tf * (CASE WHEN substring(md5(term), {p}, 1) IN {odds} THEN 1 ELSE -1 END)) AS b{j}".format(
        p=j + 1, odds=repr(_ODD_HEX), j=j
    )
    for j in range(SIMHASH_BITS)
)
_SIMHASH_PACK_SQL = " + ".join(
    f"(CASE WHEN b{j} > 0 THEN {float(2 ** j)} ELSE 0.0 END)" for j in range(SIMHASH_BITS)
)

ORACLES = {
    "dedup_exact": """
        SELECT md5(text) AS h, min(doc_id) AS keep_id, count(*)::BIGINT AS copies
        FROM documents GROUP BY md5(text) ORDER BY h
    """,
    "minhash_signatures": f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest({_SH}) AS sh FROM documents),
        sig AS (
          SELECT doc_id, j.j::INT AS j, min(md5(j.j || ':' || sh)) AS mh
          FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS j) j
          GROUP BY doc_id, j.j)
        SELECT doc_id, j, mh FROM sig ORDER BY doc_id, j
    """,
    "ngram_jaccard_pairs": f"""
        WITH sh AS (
          SELECT DISTINCT doc_id, unnest({_SH}) AS sh
          FROM documents WHERE doc_id < 60),
        sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
        inter AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS i
          FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id)
        SELECT a_id, b_id,
               round(i / (sa.sz + sb.sz - i), 6) AS jaccard_r
        FROM inter
        JOIN sizes sa ON inter.a_id = sa.doc_id
        JOIN sizes sb ON inter.b_id = sb.doc_id
        ORDER BY a_id, b_id
    """,
}

ORACLES["minhash_lsh_pairs"] = f"""
    WITH sh AS (
      SELECT DISTINCT doc_id, unnest({_SH}) AS sh FROM documents),
    sig AS (
      SELECT doc_id, j.j::INT AS j, min(md5(j.j || ':' || sh)) AS mh
      FROM sh CROSS JOIN (SELECT unnest(generate_series(0, {N_HASHES - 1})) AS j) j
      GROUP BY doc_id, j.j),
    bands AS (
      SELECT doc_id, (j // {_BAND_ROWS})::INT AS band,
             md5(string_agg(j || '=' || mh, ':' ORDER BY j || '=' || mh)) AS key
      FROM sig GROUP BY doc_id, (j // {_BAND_ROWS})::INT),
    reps AS (
      SELECT band, key, min(doc_id) AS rep FROM bands GROUP BY band, key)
    SELECT DISTINCT r.rep AS a_id, b.doc_id AS b_id
    FROM bands b JOIN reps r ON b.band = r.band AND b.key = r.key
    WHERE b.doc_id > r.rep
    ORDER BY a_id, b_id
"""

ORACLES["simhash32"] = f"""
    WITH tf AS (
      SELECT doc_id, term, count(*) AS tf
      FROM (SELECT doc_id, unnest({_TOK}) AS term FROM documents)
      GROUP BY doc_id, term),
    sums AS (
      SELECT doc_id, {_SIMHASH_BITS_SQL}
      FROM tf GROUP BY doc_id)
    SELECT doc_id, ({_SIMHASH_PACK_SQL})::BIGINT AS simhash
    FROM sums ORDER BY doc_id
"""

def _neardup_oracle() -> str:
    from colbert_spark.operators.similarity import _duckdb_sig

    band_rows = " UNION ALL ".join(
        f"SELECT vec_id, v, nrm, {bnd} AS band, "
        f"{_duckdb_sig('v', range(bnd * EMB_BAND_PLANES, (bnd + 1) * EMB_BAND_PLANES))} AS bsig "
        f"FROM nz"
        for bnd in range(EMB_BANDS)
    )
    return f"""
    WITH e AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x*x))) AS nrm
      FROM embeddings),
    nz AS (SELECT vec_id, v, nrm FROM e WHERE nrm > 0),
    keyed AS ({band_rows})
    SELECT DISTINCT a.vec_id AS a_id, b.vec_id AS b_id,
           round(list_sum(list_transform(generate_series(1, len(a.v)),
                                         i -> a.v[i] * b.v[i]))
                 / (a.nrm * b.nrm), 6) AS cos_r
    FROM keyed a JOIN keyed b
      ON a.band = b.band AND a.bsig = b.bsig AND a.vec_id < b.vec_id
    WHERE round(list_sum(list_transform(generate_series(1, len(a.v)),
                                        i -> a.v[i] * b.v[i]))
                / (a.nrm * b.nrm), 6) >= 0.3
    ORDER BY a_id, b_id
"""


ORACLES["embedding_neardup"] = _neardup_oracle()

def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-CLUSTER resolution: connected components over the
    MinHash-LSH candidate pairs → (doc_id, component_id = min doc_id of the
    component). This is the step that turns pairwise candidates into "keep
    one per cluster" decisions in a dedup pipeline.

    Iterative min-label propagation: each round is ONE edge⋈label join plus
    a groupBy-min — the Spark shape of the large-star/small-star connected-
    components algorithm, converging in O(component diameter) rounds (near-dup
    graphs are star/clique-like, so 2-4 rounds in practice; the loop bound is
    a safety net). Convergence is detected with an aggregate-only job (never
    collects labels); per-round persists truncate recompute lineage. Docs in
    no candidate pair are singletons and not emitted (pair-table semantics).
    """
    pairs = minhash_lsh_pairs(spark, sf_dir).select("a_id", "b_id")
    edges = pairs.union(
        pairs.select(F.col("b_id").alias("a_id"), F.col("a_id").alias("b_id"))
    ).persist()
    labels = (
        edges.select(F.col("a_id").alias("id"))
        .distinct()
        .withColumn("comp", F.col("id"))
        .persist()
    )
    for _ in range(32):  # safety bound ≥ any plausible diameter
        msgs = edges.join(
            labels.withColumnRenamed("id", "a_id"), "a_id"
        ).select(F.col("b_id").alias("id"), "comp")
        new_labels = (
            labels.unionByName(msgs).groupBy("id").agg(F.min("comp").alias("comp"))
        ).persist()
        changed = (
            new_labels.join(labels.withColumnRenamed("comp", "old"), "id")
            .filter(F.col("comp") != F.col("old"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"), F.col("comp").alias("component_id")
    ).orderBy("doc_id")


QUERIES = {
    "dedup_exact": dedup_exact,
    "minhash_signatures": minhash_signatures,
    "minhash_lsh_pairs": minhash_lsh_pairs,
    "ngram_jaccard_pairs": ngram_jaccard_pairs,
    "simhash32": simhash32,
    "embedding_neardup": embedding_neardup,
    "dedup_components": dedup_components,
}

# transitive closure of the (symmetric) LSH candidate edges, as a recursive
# CTE over the SAME pairs oracle — min reachable id == component id
ORACLES["dedup_components"] = f"""
    WITH RECURSIVE pairs AS ({{_PAIRS}}),
    edges AS (
      SELECT a_id AS a, b_id AS b FROM pairs
      UNION ALL
      SELECT b_id, a_id FROM pairs),
    verts AS (SELECT DISTINCT a AS id FROM edges),
    reach(id, r) AS (
      SELECT id, id FROM verts
      UNION
      SELECT e.b, reach.r FROM edges e JOIN reach ON e.a = reach.id),
    comp AS (SELECT id, min(r) AS component_id FROM reach GROUP BY id)
    SELECT id AS doc_id, component_id::BIGINT AS component_id
    FROM comp ORDER BY doc_id
""".replace("{_PAIRS}", ORACLES["minhash_lsh_pairs"].strip())
