"""The engine's query suite: one entry per implemented operator
(SURVEY.md §2 inventory + web-scale pipeline ops), each as a
``(spark, sf_dir) -> DataFrame`` callable with a matching DuckDB oracle
SQL string (driver contract, ``__spark_entry__.py``).

Naming convention: every computed column is explicitly aliased and
cast (BIGINT/STRING) identically on both sides — the driver's compare
sorts columns by name and hashes values.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from .operators import dedup as D
from .operators import packing as P
from .operators import similarity as S
from .operators import textstats as T
from .operators.extract import (
    count_matches_program,
    explode_nodes,
    extract_main_text,
    run_program,
    scrape_tables,
    select_first_program,
)
from .sources.pages import BYTESPAN_HTML_EXPR, synth_pages, synth_table_pages
from . import matchers as m

# ----------------------------------------------------------------------
# helpers
# ----------------------------------------------------------------------
def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread here: the textstats/dedup/packing consumers are
    # JVM-expression queries whose heavy spots (per-word explodes,
    # signature aggregates) already apply ensure_min_parallelism
    # themselves; an unconditional exchange would tax the cheap
    # map-only queries (lang_id, quality_stats, classifier) with a
    # shuffle they never need.  The page-synthesis families spread at
    # sources.pages.load_documents instead.
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# DuckDB word-3-gram shingles CTE (mirrors dedup.SHINGLE_EXPR)
_DUCK_SHINGLES = (
    "sh AS (SELECT doc_id, unnest(list_distinct(list_transform("
    "generate_series(1, len(string_split(text, ' ')) - 2), "
    "j -> array_to_string(string_split(text, ' ')[j:j+2], ' ')))) AS sh "
    "FROM documents WHERE len(string_split(text, ' ')) >= 3)"
)


def _duck_simhash_sql() -> str:
    # 63-bit mirror of dedup.simhash63_sql (bit j = majority vote of
    # bit j of md5(word); hex-digit bit extraction, exact int math)
    votes = []
    sel = []
    for j in range(D.SIMHASH_BITS):
        hexpos = 1 + j // 4
        p = 2 ** (3 - j % 4)
        v = f"(instr('0123456789abcdef', substr(md5(w), {hexpos}, 1)) - 1)"
        bit = f"(CAST(floor({v} / {p}) AS BIGINT) % 2)"
        votes.append(f"sum(2 * {bit} - 1) AS v{j}")
        sel.append(f"(CASE WHEN v{j} > 0 THEN CAST({2 ** j} AS BIGINT) ELSE 0 END)")
    return (
        "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents), "
        "votes AS (SELECT doc_id, " + ", ".join(votes) + " FROM w GROUP BY doc_id) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(" + " + ".join(sel) + " AS BIGINT) AS simhash FROM votes"
    )


def _duck_simhash_pairs_sql(max_hamming: int = 2) -> str:
    # all-pairs xor+popcount — the banded Spark join is exact for
    # hamming <= 2 by pigeonhole, so the two sides agree bit-for-bit
    return (
        f"WITH s AS ({_duck_simhash_sql()}) "
        "SELECT CAST(x.doc_id AS BIGINT) AS a, CAST(y.doc_id AS BIGINT) AS b, "
        "CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming "
        "FROM s x JOIN s y ON x.doc_id < y.doc_id "
        f"WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}"
    )


def _duck_mh_bands(n_hashes: int, n_bands: int) -> tuple[str, str]:
    """(sig column list, band UNION ALL selects) for an (n_hashes,
    n_bands) MinHash config — mirrors dedup.minhash_signatures /
    dedup._band_explode (bkey = concat of rows-per-band consecutive
    minhashes)."""
    rows = n_hashes // n_bands
    mh = ", ".join(f"min(md5('{k}|' || sh)) AS mh{k}" for k in range(n_hashes))
    bands = " UNION ALL ".join(
        f"SELECT doc_id, {bd} AS band, "
        + " || ".join(f"mh{rows * bd + j}" for j in range(rows))
        + " AS bkey FROM sig"
        for bd in range(n_bands)
    )
    return mh, bands


def _duck_minhash_between_cte(
    split_at: int = 250,
    n_hashes: int = D.N_MINHASHES,
    n_bands: int = D.N_BANDS,
    min_equal: int = 4,
    bucket_cap: int = 64,
) -> str:
    # mirror of dedup.minhash_lsh_pairs_between: per-side bucket caps,
    # candidates only BETWEEN the two sides
    mh, bands = _duck_mh_bands(n_hashes, n_bands)
    eq = " + ".join(
        f"(CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END)" for k in range(n_hashes)
    )
    return (
        f"WITH {_DUCK_SHINGLES}, "
        f"sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
        f"bands AS ({bands}), "
        f"bn AS (SELECT * FROM bands WHERE doc_id >= {split_at}), "
        f"bo AS (SELECT * FROM bands WHERE doc_id < {split_at}), "
        f"smalln AS (SELECT band, bkey FROM bn GROUP BY band, bkey HAVING count(*) <= {bucket_cap}), "
        f"smallo AS (SELECT band, bkey FROM bo GROUP BY band, bkey HAVING count(*) <= {bucket_cap}), "
        "bnf AS (SELECT b.* FROM bn b JOIN smalln USING (band, bkey)), "
        "bof AS (SELECT b.* FROM bo b JOIN smallo USING (band, bkey)), "
        "cand AS (SELECT DISTINCT n.doc_id AS new_id, o.doc_id AS prior_id "
        "FROM bnf n JOIN bof o ON n.band = o.band AND n.bkey = o.bkey) "
        f"SELECT CAST(new_id AS BIGINT) AS new_id, CAST(prior_id AS BIGINT) AS prior_id, "
        f"CAST({eq} AS BIGINT) AS n_eq "
        "FROM cand JOIN sig sa ON cand.new_id = sa.doc_id "
        "JOIN sig sb ON cand.prior_id = sb.doc_id "
        f"WHERE {eq} >= {min_equal}"
    )


def _duck_minhash_cte(
    n_hashes: int = D.N_MINHASHES,
    n_bands: int = D.N_BANDS,
    min_equal: int = 4,
    bucket_cap: int = 64,
) -> str:
    mh, bands = _duck_mh_bands(n_hashes, n_bands)
    eq = " + ".join(
        f"(CASE WHEN sa.mh{k} = sb.mh{k} THEN 1 ELSE 0 END)" for k in range(n_hashes)
    )
    return (
        f"WITH {_DUCK_SHINGLES}, "
        f"sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
        f"bands AS ({bands}), "
        # mirror of dedup.minhash_lsh_pairs bucket_cap
        f"small AS (SELECT band, bkey FROM bands GROUP BY band, bkey HAVING count(*) <= {bucket_cap}), "
        "bandsf AS (SELECT b.* FROM bands b JOIN small USING (band, bkey)), "
        "cand AS (SELECT DISTINCT x.doc_id AS a_id, y.doc_id AS b_id FROM bandsf x "
        "JOIN bandsf y ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id) "
        f"SELECT CAST(a_id AS BIGINT) AS a, CAST(b_id AS BIGINT) AS b, CAST({eq} AS BIGINT) AS n_eq "
        "FROM cand JOIN sig sa ON cand.a_id = sa.doc_id JOIN sig sb ON cand.b_id = sb.doc_id "
        f"WHERE {eq} >= {min_equal}"
    )


def _duck_ivf_topk_sql(k: int = 3, nprobe: int = 2) -> str:
    # mirror of similarity.ivf_topk: pivots = vec_id % 25 = 7 (the
    # deterministic coarse quantizer), queries = vec_id % 100 = 0
    return (
        "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm "
        "FROM embeddings), "
        "base AS (SELECT * FROM n WHERE norm > 0), "
        "p AS (SELECT vec_id AS pivot_id, v AS pv, norm AS pnorm FROM base WHERE vec_id % 25 = 7), "
        "q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM base WHERE vec_id % 100 = 0), "
        "assigned AS (SELECT vec_id, v, norm, pivot_id FROM ("
        "SELECT b.vec_id, b.v, b.norm, p.pivot_id, row_number() OVER "
        "(PARTITION BY b.vec_id ORDER BY list_dot_product(b.v, p.pv) / (b.norm * p.pnorm) DESC, p.pivot_id) AS r "
        "FROM base b CROSS JOIN p) WHERE r = 1), "
        "probes AS (SELECT query_id, qv, qnorm, pivot_id FROM ("
        "SELECT q.query_id, q.qv, q.qnorm, p.pivot_id, row_number() OVER "
        "(PARTITION BY q.query_id ORDER BY list_dot_product(q.qv, p.pv) / (q.qnorm * p.pnorm) DESC, p.pivot_id) AS r "
        f"FROM q CROSS JOIN p) WHERE r <= {nprobe}), "
        "scored AS (SELECT pr.query_id, a.vec_id, "
        "list_dot_product(a.v, pr.qv) / (a.norm * pr.qnorm) AS cos "
        "FROM assigned a JOIN probes pr USING (pivot_id) WHERE a.vec_id <> pr.query_id), "
        "ranked AS (SELECT query_id, vec_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS neighbor_id, "
        f"CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}"
    )


def _duck_ivf_recall_sql() -> str:
    return (
        f"WITH exact AS ({_DUCK_EXACT_TOPK}), approx AS ({_duck_ivf_topk_sql()}), "
        "hit AS (SELECT count(*) AS n_hit FROM exact e "
        "WHERE EXISTS (SELECT 1 FROM approx a "
        "WHERE a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)) "
        "SELECT CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries, "
        "CAST(count(*) AS BIGINT) AS n_exact, "
        "CAST((SELECT n_hit FROM hit) AS BIGINT) AS n_hit, "
        "CAST(round((SELECT n_hit FROM hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 "
        "FROM exact e"
    )


def _duck_semantic_dedup_sql(threshold: float = 0.35) -> str:
    # mirror of similarity.semantic_dedup: IVF coarse assignment
    # (pivots = vec_id % 25 = 7, ties to the smaller pivot_id), then
    # within-cluster pairs only; a doc is dropped iff some lower-id
    # cluster-mate sits at cosine >= threshold
    return (
        "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm "
        "FROM embeddings), "
        "base AS (SELECT * FROM n WHERE norm > 0), "
        "p AS (SELECT vec_id AS pivot_id, v AS pv, norm AS pnorm FROM base WHERE vec_id % 25 = 7), "
        "assigned AS (SELECT vec_id, v, norm, pivot_id FROM ("
        "SELECT b.vec_id, b.v, b.norm, p.pivot_id, row_number() OVER "
        "(PARTITION BY b.vec_id ORDER BY list_dot_product(b.v, p.pv) / (b.norm * p.pnorm) DESC, p.pivot_id) AS r "
        "FROM base b CROSS JOIN p) WHERE r = 1), "
        "dropped AS (SELECT DISTINCT y.vec_id AS b FROM assigned x "
        "JOIN assigned y USING (pivot_id) WHERE x.vec_id < y.vec_id "
        f"AND list_dot_product(x.v, y.v) / (x.norm * y.norm) >= {threshold}) "
        "SELECT CAST(a.vec_id AS BIGINT) AS vec_id, CAST(a.pivot_id AS BIGINT) AS pivot_id, "
        "(d.b IS NULL) AS keep FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.b"
    )


def _duck_components_cte() -> str:
    # transitive closure over the minhash pair graph (fine at oracle
    # scale; the Spark side uses O(log n) large-star/small-star
    # rounds instead — closure would be quadratic at 100 TB)
    return (
        f"WITH RECURSIVE pairs AS ({_duck_minhash_cte()}), "
        "edges AS (SELECT a AS u, b AS v FROM pairs "
        "UNION SELECT b AS u, a AS v FROM pairs), "
        "reach(node, r) AS (SELECT u, u FROM edges "
        "UNION SELECT e.v, r.r FROM reach r JOIN edges e ON e.u = r.node), "
        "comp AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node) "
    )


def _duck_components_sql() -> str:
    return (
        _duck_components_cte()
        + "SELECT CAST(node AS BIGINT) AS doc_id, "
        "CAST(component AS BIGINT) AS component FROM comp"
    )


def _duck_canonical_sql() -> str:
    return (
        _duck_components_cte()
        + "SELECT CAST(d.doc_id AS BIGINT) AS doc_id, "
        "CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component, "
        "CAST(CASE WHEN COALESCE(c.component, d.doc_id) = d.doc_id "
        "THEN 1 ELSE 0 END AS BIGINT) AS is_canonical "
        "FROM documents d LEFT JOIN comp c ON d.doc_id = c.node"
    )


def _duck_lsh_stats_cte() -> str:
    mh, bands = _duck_mh_bands(D.N_MINHASHES, D.N_BANDS)
    return (
        f"WITH {_DUCK_SHINGLES}, "
        f"sig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
        f"bands AS ({bands}), "
        "sz AS (SELECT band, bkey, count(*) AS bn FROM bands GROUP BY band, bkey) "
        "SELECT CAST(count(*) AS BIGINT) AS n_buckets, "
        "CAST(sum(CASE WHEN bn > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_overfull, "
        "CAST(sum(CASE WHEN bn > 64 THEN bn ELSE 0 END) AS BIGINT) AS members_in_overfull "
        "FROM sz"
    )


_DUCK_SHINGLE_STATS = (
    f"WITH {_DUCK_SHINGLES}, "
    "f AS (SELECT sh, count(*) AS df FROM sh GROUP BY sh) "
    "SELECT CAST(count(*) AS BIGINT) AS n_shingles, "
    "CAST(sum(CASE WHEN df > 64 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped, "
    "CAST(sum(CASE WHEN df > 64 THEN df ELSE 0 END) AS BIGINT) AS postings_capped "
    "FROM f"
)


_DUCK_EXACT_TOPK = (
    "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
    "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm "
    "FROM embeddings), "
    "base AS (SELECT * FROM n WHERE norm > 0), "
    "q AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm FROM base WHERE vec_id % 100 = 0), "
    "scored AS (SELECT q.query_id, b.vec_id, "
    "list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS cos "
    "FROM base b CROSS JOIN q WHERE b.vec_id <> q.query_id), "
    "ranked AS (SELECT query_id, vec_id, row_number() OVER "
    "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) "
    "SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS neighbor_id, "
    "CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= 3"
)


def _duck_lsh_topk_sql(k: int = 3, dim: int = 64, n_planes: int = 4) -> str:
    # mirror of similarity.lsh_cosine_topk (precomputed literal signs,
    # multi-probe over the n_planes hamming-1 buckets)
    bucket_terms = []
    for p in range(n_planes):
        lits = ", ".join(str(s) for s in S.plane_signs(p, dim))
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]) > 0 THEN {2 ** p} ELSE 0 END)"
        )
    bucket = "(" + " + ".join(bucket_terms) + ")"
    probes = ", ".join(f"xor(bucket, {2 ** p})" for p in range(n_planes))
    return (
        "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm "
        "FROM embeddings), "
        f"base AS (SELECT vec_id, v, norm, {bucket} AS bucket FROM n WHERE norm > 0), "
        "q0 AS (SELECT vec_id AS query_id, v AS qv, norm AS qnorm, bucket "
        "FROM base WHERE vec_id % 100 = 0), "
        f"q AS (SELECT query_id, qv, qnorm, unnest([bucket, {probes}]) AS bucket FROM q0), "
        "scored AS (SELECT q.query_id, b.vec_id, "
        "list_dot_product(b.v, q.qv) / (b.norm * q.qnorm) AS cos "
        "FROM base b JOIN q ON b.bucket = q.bucket WHERE b.vec_id <> q.query_id), "
        "ranked AS (SELECT query_id, vec_id, row_number() OVER "
        "(PARTITION BY query_id ORDER BY cos DESC, vec_id) AS rank FROM scored) "
        "SELECT CAST(query_id AS BIGINT) AS query_id, CAST(vec_id AS BIGINT) AS neighbor_id, "
        f"CAST(rank AS BIGINT) AS rank FROM ranked WHERE rank <= {k}"
    )


def _duck_near_dup_sql(threshold: float = 0.35, dim: int = 64, n_planes: int = 4) -> str:
    # mirror of similarity.cosine_near_dup_pairs: hyperplane-LSH
    # bucket blocking (plan-time literal signs) with hamming-1
    # multi-probe on the smaller-id side
    bucket_terms = []
    for p in range(n_planes):
        lits = ", ".join(str(s) for s in S.plane_signs(p, dim))
        bucket_terms.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]) > 0 THEN {2 ** p} ELSE 0 END)"
        )
    bucket = "(" + " + ".join(bucket_terms) + ")"
    probes = ", ".join(f"xor(bucket, {2 ** p})" for p in range(n_planes))
    return (
        "WITH n AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v, "
        "sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x))) AS norm "
        "FROM embeddings), "
        f"base AS (SELECT vec_id, v, norm, {bucket} AS bucket FROM n WHERE norm > 0), "
        f"a AS (SELECT vec_id, v, norm, unnest([bucket, {probes}]) AS block FROM base), "
        "b AS (SELECT vec_id, v, norm, bucket AS block FROM base), "
        "p AS (SELECT a.vec_id AS a, b.vec_id AS b, "
        "list_dot_product(a.v, b.v) / (a.norm * b.norm) AS cos "
        "FROM a JOIN b ON a.block = b.block AND a.vec_id < b.vec_id) "
        "SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, "
        "CAST(round(cos * 1000000) AS BIGINT) AS cos_e6 FROM p "
        f"WHERE cos >= {threshold}"
    )


def _duck_lsh_recall_sql() -> str:
    return (
        f"WITH exact AS ({_DUCK_EXACT_TOPK}), approx AS ({_duck_lsh_topk_sql()}), "
        "hit AS (SELECT count(*) AS n_hit FROM exact e "
        "WHERE EXISTS (SELECT 1 FROM approx a "
        "WHERE a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id)) "
        "SELECT CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries, "
        "CAST(count(*) AS BIGINT) AS n_exact, "
        "CAST((SELECT n_hit FROM hit) AS BIGINT) AS n_hit, "
        "CAST(round((SELECT n_hit FROM hit) * 10000.0 / count(*)) AS BIGINT) AS recall_e4 "
        "FROM exact e"
    )


def _duck_multimodal_sql() -> str:
    # mirror of multimodal.image_features over multimodal.synth_media:
    # the md5-CTR keystream is a hex-string chain (block c =
    # md5(md5(text) || '|' || c)), all feature math integer-exact
    blk = "md5(seed || '|' || CAST((k // 16) AS VARCHAR))"
    bv = (
        f"(16 * (instr('0123456789abcdef', substr({blk}, 1 + 2 * (k % 16), 1)) - 1) "
        f"+ instr('0123456789abcdef', substr({blk}, 2 + 2 * (k % 16), 1)) - 1)"
    )
    return (
        "WITH m AS (SELECT CAST(doc_id AS BIGINT) AS media_id, md5(text) AS seed, "
        "16 + (n_chars % 8) * 8 AS w, 16 + (n_chars % 5) * 8 AS h "
        "FROM documents WHERE doc_id % 3 = 0), "
        "idx AS (SELECT media_id, seed, w, h, "
        "unnest(generate_series(0, w * h * 3 - 1)) AS k FROM m), "
        f"b AS (SELECT media_id, w, h, k % 3 AS ch, (k // 3) AS p, {bv} AS bv FROM idx), "
        "chan AS (SELECT media_id, "
        "sum(CASE WHEN ch = 0 THEN bv ELSE 0 END) AS sum_r, "
        "sum(CASE WHEN ch = 1 THEN bv ELSE 0 END) AS sum_g, "
        "sum(CASE WHEN ch = 2 THEN bv ELSE 0 END) AS sum_b "
        "FROM b GROUP BY media_id), "
        "grid AS (SELECT media_id, "
        "((p // w) // (h // 8)) * 8 + ((p % w) // (w // 8)) AS i, sum(bv) AS gsum "
        "FROM b GROUP BY media_id, i), "
        "med AS (SELECT media_id, sum(CASE WHEN rn IN (32, 33) THEN gsum ELSE 0 END) AS med2 "
        "FROM (SELECT media_id, gsum, row_number() OVER "
        "(PARTITION BY media_id ORDER BY gsum) AS rn FROM grid) GROUP BY media_id), "
        "ph AS (SELECT g.media_id, sum(CASE WHEN 2 * gsum > med2 AND i < 63 "
        "THEN (CAST(1 AS BIGINT) << i) ELSE CAST(0 AS BIGINT) END) AS phash "
        "FROM grid g JOIN med USING (media_id) GROUP BY g.media_id) "
        "SELECT m.media_id, CAST(sum_r AS BIGINT) AS sum_r, "
        "CAST(sum_g AS BIGINT) AS sum_g, CAST(sum_b AS BIGINT) AS sum_b, "
        "CAST(m.w * m.h AS BIGINT) AS n_px, CAST(ph.phash AS BIGINT) AS phash "
        "FROM m JOIN chan USING (media_id) JOIN ph USING (media_id)"
    )


# page-template fragments for oracle span arithmetic (sources/pages.py)
_DUCK_ESC = "replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
_DUCK_PREFIX_LEN = (
    "length('<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title></head><body>'"
    " || '<nav class=\"menu\"><ul><li><a href=\"https://site.example/' || CAST(doc_id AS STRING) || '\">home</a></li></ul></nav>'"
    " || '<div id=\"doc-' || CAST(doc_id AS STRING) || '\" class=\"doc ' || lang || '\">'"
    " || '<main><article><h1>Heading ' || CAST(doc_id AS STRING) || '</h1>'"
    " || '<p class=\"body\">')"
)


# ----------------------------------------------------------------------
# HTML parse/select/extract queries (exercise the in-UDF engine; the
# oracle recomputes expected output from the deterministic template)
# ----------------------------------------------------------------------
def q_html_main_text(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    out = extract_main_text(pages, passthrough=("doc_id",))
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), F.col("text").alias("main_text"))


def q_html_title(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    prog = select_first_program(m.tag.TITLE, {"title": "content"})
    return run_program(pages, prog, "title string", passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "title")


def q_html_anchor(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    prog = select_first_program(m.tag.A, {"href": "attr:href", "anchor_text": "content"})
    return run_program(pages, prog, "href string, anchor_text string", passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "href", "anchor_text")


def q_html_node_count(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    out = extract_main_text(pages, passthrough=("doc_id",))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_nodes").cast("bigint").alias("n_nodes"),
        F.col("parse_errors").cast("bigint").alias("parse_errors"),
    )


def q_html_dom_stats(spark, sf_dir):
    # link-density boilerplate signals (n_elements, links, textual
    # mass, text inside <a>, max depth) — the oracle derives every
    # value analytically from the page template
    from .operators.extract import dom_stats

    pages = synth_pages(spark, sf_dir)
    out = dom_stats(pages, passthrough=("doc_id",))
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"),
                      "n_elements", "n_links", "text_chars",
                      "link_text_chars", "max_depth", "link_density_e4")


def q_html_article_text(spark, sf_dir):
    # content_text of <article> INCLUDES comment text
    # (gumbo_text.h:23-58 default branch) — pinned via oracle
    pages = synth_pages(spark, sf_dir)
    prog = select_first_program(m.tag.ARTICLE, {"article_text": "content"})
    return run_program(pages, prog, "article_text string", passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "article_text")


def q_html_class_match(spark, sf_dir):
    # whole-class-value equality (gumbo_matchers.h:466-476)
    pages = synth_pages(spark, sf_dir)
    prog = count_matches_program(m.class_type.is_("doc en"))
    return run_program(pages, prog, "n_matches int", passthrough=("doc_id",)) \
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_matches").cast("bigint").alias("n_doc_en"),
        )


def q_html_spans(spark, sf_dir):
    pages = synth_pages(spark, sf_dir)
    prog = select_first_program(
        m.tag.P & m.class_type.is_("body"),
        {
            "outer_start": "start",
            "inner_start": "inner_start",
            "inner_end": "inner_end",
            "outer_end": "end",
        },
    )
    out = run_program(
        pages, prog,
        "outer_start bigint, inner_start bigint, inner_end bigint, outer_end bigint",
        passthrough=("doc_id",),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "outer_start", "inner_start", "inner_end", "outer_end",
    )


def q_html_spans_bytes(spark, sf_dir):
    # byte-offset span contract (gumbo_util.h:121-146 byte-offset
    # model) on pages where it DIVERGES from decoded offsets: 2/3/4-byte
    # UTF-8 chars + CRLF newlines.  The oracle recomputes char offsets
    # over the CRLF-normalized page and byte offsets over the raw page.
    from .sources.pages import synth_bytespan_pages

    pages = synth_bytespan_pages(spark, sf_dir)
    prog = select_first_program(
        m.tag.P & m.class_type.is_("bytes"),
        {
            "outer_start": "start",
            "outer_end": "end",
            "start_byte": "start_byte",
            "end_byte": "end_byte",
        },
    )
    out = run_program(
        pages, prog,
        "outer_start bigint, outer_end bigint, start_byte bigint, end_byte bigint",
        passthrough=("doc_id",),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "outer_start", "outer_end", "start_byte", "end_byte",
    )


def q_html_outer_inner(spark, sf_dir):
    # raw-source slice extraction (node_outer_text/node_inner_text,
    # gumbo_text.h:60-108) at corpus scale: outer of the doc div,
    # inner of the footer paragraph
    pages = synth_pages(spark, sf_dir)
    prog_div = select_first_program(
        m.tag.DIV & m.attribute.value.starts_with("id", "doc-"),
        {"div_outer": "outer"},
    )
    prog_fine = select_first_program(
        m.tag.P & m.class_type.is_("fine"), {"fine_inner": "inner"}
    )

    def program(nt):
        return {**prog_div(nt), **prog_fine(nt)}

    return run_program(pages, program, "div_outer string, fine_inner string",
                       passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "div_outer", "fine_inner")


def q_html_selector_ir(spark, sf_dir):
    # serializable selector program (selector.py) driving the
    # content_text matcher family end-to-end: count of nodes whose
    # recursive content text ends with the en-only comment text —
    # matches the comment node itself (its text IS its content_text,
    # gumbo_text.h:55-57), <article>, <main> and the doc div, iff lang='en'
    from .selector import compile_selector

    pages = synth_pages(spark, sf_dir)
    sel = compile_selector(["content_ends_with", "promoted"])
    prog = count_matches_program(sel)
    return run_program(pages, prog, "n_matches int", passthrough=("doc_id",)) \
        .select(
            F.col("doc_id").cast("bigint").alias("doc_id"),
            F.col("n_matches").cast("bigint").alias("n_promoted"),
        )


def q_html_table_scrape(spark, sf_dir):
    pages = synth_table_pages(spark, sf_dir)
    return scrape_tables(pages, "important_table", passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "csv")


def q_html_spans_mojibake(spark, sf_dir):
    # round-7: the INVALID-UTF-8 span/text contract end to end — a
    # stray 0xFF and a truncated 0xC2 lead inside each page become
    # U+FFFD exactly as Python's errors='replace', with char offsets
    # into the normalized decoded string and TRUE byte offsets into
    # the raw bytes (the C batch path's prep_decode must agree with
    # parser/bytemap.py; the oracle predicts all four numbers and the
    # decoded text from the deterministic construction)
    from .sources.pages import synth_mojibake_pages

    pages = synth_mojibake_pages(spark, sf_dir)
    prog = select_first_program(
        m.tag.P & m.class_type.is_("mix"),
        {
            "outer_start": "start",
            "outer_end": "end",
            "start_byte": "start_byte",
            "end_byte": "end_byte",
            "content": "content",
        },
    )
    out = run_program(
        pages, prog,
        "outer_start bigint, outer_end bigint, start_byte bigint, "
        "end_byte bigint, content string",
        passthrough=("doc_id",),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "outer_start", "outer_end", "start_byte", "end_byte", "content",
    )


def q_html_tag_histogram(spark, sf_dir):
    # dataset-level node table: parse → explode → SQL aggregation over
    # nodes (the [D] level of SURVEY.md §2 mappings)
    pages = synth_pages(spark, sf_dir)
    nodes = explode_nodes(pages, passthrough=("doc_id",))
    return (
        nodes.where(F.col("tag") != "")
        .groupBy("tag")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def q_html_first_div_content(spark, sf_dir):
    # first-match + content_text expressed entirely DATASET-level over
    # the exploded node table (SURVEY.md §2.2: std::find_if ≡ min
    # node_id; subtree ≡ interval containment; content_text ≡ ordered
    # string-agg of text-like rows in the interval)
    pages = synth_pages(spark, sf_dir)
    explode_nodes(pages, passthrough=("doc_id",)).createOrReplaceTempView("nodes")
    return spark.sql(
        """
        WITH first_div AS (
          SELECT doc_id, min(node_id) AS div_id
          FROM nodes WHERE tag = 'div' GROUP BY doc_id),
        div_span AS (
          SELECT n.doc_id, n.node_id AS div_id, n.subtree_end AS div_end
          FROM nodes n JOIN first_div f
            ON n.doc_id = f.doc_id AND n.node_id = f.div_id),
        inside AS (
          SELECT t.doc_id, t.node_id, t.text
          FROM nodes t JOIN div_span d
            ON t.doc_id = d.doc_id
           AND t.node_id >= d.div_id AND t.node_id < d.div_end
          WHERE t.node_type BETWEEN 2 AND 5)
        SELECT CAST(doc_id AS BIGINT) AS doc_id,
               concat_ws('', transform(array_sort(collect_list(struct(node_id, text))),
                                        s -> s.text)) AS div_text
        FROM inside GROUP BY doc_id
        """
    )


def q_html_misnested(spark, sf_dir):
    # full adoption-agency tree shape (<b>B<p>P</b>tail</p>): the clone
    # wraps only the block's pre-end-tag children, the tail text is a
    # DIRECT child of the block, and no third <b> is reconstructed
    from .sources.pages import synth_misnested_pages

    pages = synth_misnested_pages(spark, sf_dir)

    def program(nt):
        import numpy as np

        p_ids = np.nonzero(nt.tag_name == "p")[0]
        b_ids = np.nonzero(nt.tag_name == "b")[0]
        p = int(p_ids[0]) if len(p_ids) else -1
        tail = ""
        if p >= 0:
            kids = nt.children_ids(p)
            texts = [nt.text[int(k)] for k in kids if nt.type[int(k)] == 2]
            tail = "".join(texts)
        return {
            "p_text": nt.content_text(p) if p >= 0 else "",
            "n_b": int(len(b_ids)),
            "clone_text": nt.content_text(int(b_ids[1])) if len(b_ids) > 1 else "",
            "tail_text": tail,
        }

    return run_program(
        pages, program,
        "p_text string, n_b int, clone_text string, tail_text string",
        passthrough=("doc_id",),
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "p_text",
        F.col("n_b").cast("bigint").alias("n_b"),
        "clone_text",
        "tail_text",
    )


def q_html_parse_errors(spark, sf_dir):
    # per-document parse-error RECORDS (code, offset) — the reference's
    # errors() vector (gumbo_node_iterator.h:247-249) — PLUS the
    # round-3 category histogram (tokenizer vs tree-construction,
    # mirroring GumboErrorType's coarse split).  The page family is the
    # misnested template (one adoption-agency tree error at a
    # computable offset) with an injected '<?x?>' processing
    # instruction and an empty '</>' end tag (two tokenizer errors).
    from .parser.html5 import error_category
    from .sources.pages import synth_misnested_pages

    pages = synth_misnested_pages(spark, sf_dir).selectExpr(
        "doc_id",
        "CAST(encode(replace(CAST(html AS STRING), '</body>', "
        "'<?x?></></body>'), 'UTF-8') AS BINARY) AS html",
    )

    def program(nt):
        recs = nt.error_records
        return {
            "n_errors": int(nt.parse_errors),
            "first_code": recs[0][0] if recs else "",
            "first_offset": int(recs[0][1]) if recs else -1,
            "n_tokenizer": sum(1 for c, _ in recs if error_category(c) == "tokenizer"),
            "n_tree": sum(1 for c, _ in recs if error_category(c) == "tree-construction"),
        }

    return run_program(
        pages, program,
        "n_errors int, first_code string, first_offset bigint, "
        "n_tokenizer int, n_tree int",
        passthrough=("doc_id",),
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_errors").cast("bigint").alias("n_errors"),
        "first_code",
        "first_offset",
        F.col("n_tokenizer").cast("bigint").alias("n_tokenizer"),
        F.col("n_tree").cast("bigint").alias("n_tree"),
    )


def q_html_foreign_content(spark, sf_dir):
    # SVG/MathML namespaces, attribute case adjustment (viewbox →
    # viewBox), HTML integration points (foreignObject children are
    # HTML-ns; annotation-xml encoding=text/html likewise), MathML text
    # integration points (mi content parses as HTML)
    from .nodetable import NS_MATHML, NS_SVG
    from .sources.pages import synth_foreign_pages

    pages = synth_foreign_pages(spark, sf_dir)

    def program(nt):
        import numpy as np

        svg_mask = nt.tag_name == "svg"
        svg = int(np.argmax(svg_mask)) if svg_mask.any() else -1
        classes = nt.class_values()
        fo_div = -1
        ax_p = -1
        for i in range(nt.n):
            if classes[i] == "fo" and fo_div < 0:
                fo_div = i
            elif classes[i] == "ax" and ax_p < 0:
                ax_p = i
        mi_mask = nt.tag_name == "mi"
        mi = int(np.argmax(mi_mask)) if mi_mask.any() else -1
        return {
            "svg_viewbox": nt.node_attribute_value(svg, "viewBox") if svg >= 0 else "",
            "svg_text": nt.content_text(svg) if svg >= 0 else "",
            "fo_div_text": nt.content_text(fo_div) if fo_div >= 0 else "",
            "mi_text": nt.content_text(mi) if mi >= 0 else "",
            "ax_text": nt.content_text(ax_p) if ax_p >= 0 else "",
            "n_svg_ns": int((nt.ns == NS_SVG).sum()),
            "n_math_ns": int((nt.ns == NS_MATHML).sum()),
        }

    return run_program(
        pages, program,
        "svg_viewbox string, svg_text string, fo_div_text string, "
        "mi_text string, ax_text string, n_svg_ns int, n_math_ns int",
        passthrough=("doc_id",),
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "svg_viewbox", "svg_text", "fo_div_text", "mi_text", "ax_text",
        F.col("n_svg_ns").cast("bigint").alias("n_svg_ns"),
        F.col("n_math_ns").cast("bigint").alias("n_math_ns"),
    )


def q_html_doc_content_text(spark, sf_dir):
    # whole-document content_text incl. whitespace nodes: pins the
    # before-head / after-head / after-body whitespace insertion modes
    pages = synth_table_pages(spark, sf_dir)

    def program(nt):
        return {"doc_text": nt.content_text(0)}

    return run_program(pages, program, "doc_text string", passthrough=("doc_id",)) \
        .select(F.col("doc_id").cast("bigint").alias("doc_id"), "doc_text")


# ----------------------------------------------------------------------
# corpus pipeline queries (dataset-level, pure DataFrame ops)
# ----------------------------------------------------------------------
def q_dedup_exact(spark, sf_dir):
    return D.exact_dedup(_docs(spark, sf_dir))


def q_dedup_jaccard(spark, sf_dir):
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5, min_shared=5)


def q_dedup_minhash(spark, sf_dir):
    return D.minhash_lsh_pairs(_docs(spark, sf_dir), min_equal=4)


def q_dedup_components(spark, sf_dir):
    # pair graph -> per-doc component (smallest reachable doc_id):
    # large-star/small-star, O(log n) distributed rounds
    docs = _docs(spark, sf_dir)
    return D.connected_components(D.minhash_lsh_pairs(docs, min_equal=4))


def q_component_stats(spark, sf_dir):
    # near-dup cluster-size histogram (monitoring view of component
    # resolution)
    docs = _docs(spark, sf_dir)
    return D.component_stats(D.minhash_lsh_pairs(docs, min_equal=4))


def q_dedup_minhash32(spark, sf_dir):
    # production-realism config (VERDICT r6 #2): 32 permutations in 8
    # bands of 4 rows — candidate knee ≈ 0.6 jaccard with far lower
    # false-positive band mass than the 8/4 demo default; min_equal=16
    # keeps the estimated-jaccard cut at 0.5.  Same plan shape (one
    # candidate shuffle, 2 joins) at any (n_hashes, n_bands).
    return D.minhash_lsh_pairs(
        _docs(spark, sf_dir), min_equal=16, n_hashes=32, n_bands=8
    )


def q_incremental_dedup(spark, sf_dir):
    # rolling-crawl exact dedup: docs >= 250 are the "new batch", the
    # prior corpus contributes only its digest column
    docs = _docs(spark, sf_dir)
    prior = docs.where("doc_id < 250").select(F.md5("text").alias("fp_md5"))
    return D.incremental_dedup(docs.where("doc_id >= 250"), prior).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source"
    )


def q_dedup_lsh_between(spark, sf_dir):
    # cross-corpus near-dup candidates: new batch vs shipped corpus,
    # no within-side pairs
    docs = _docs(spark, sf_dir)
    return D.minhash_lsh_pairs_between(
        docs.where("doc_id >= 250"), docs.where("doc_id < 250"), min_equal=4
    )


def q_dedup_verified(spark, sf_dir):
    # candidate -> exact-verify: LSH prunes, exact shingle Jaccard
    # decides (the 100 TB dedup decision shape)
    return D.minhash_verified_pairs(
        _docs(spark, sf_dir), min_equal=4, min_jaccard_e4=5000
    )


def q_dedup_canonical(spark, sf_dir):
    # the end-to-end dedup DECISION: one kept representative per
    # near-dup cluster, every other member flagged for drop
    docs = _docs(spark, sf_dir)
    pairs = D.minhash_lsh_pairs(docs, min_equal=4)
    return D.canonical_docs(docs, pairs).select("doc_id", "component", "is_canonical")


def q_decontaminate(spark, sf_dir):
    # eval set derived deterministically from the corpus itself (no
    # external data in the sandbox): every 41st doc contributes words
    # 5..40 as a synthetic benchmark prompt; 13-gram contamination
    # must then flag (at least) those source documents
    docs = _docs(spark, sf_dir)
    evals = docs.where(F.col("doc_id") % 41 == 0).select(
        F.concat_ws(" ", F.slice(F.split("text", " "), 5, 36)).alias("text")
    )
    return T.contamination(docs, evals, n=13)


# sentence-structured corpus for the sentence-level decontamination
# family: re-chunk the word-salad text into 8-word '. '-joined
# sentences (the synthetic tables carry no punctuation of their own)
_SENT_DOCS_EXPR = (
    "concat_ws('. ', transform(sequence(1, size(split(text, ' ')), 8), "
    "j -> concat_ws(' ', slice(split(text, ' '), j, 8))))"
)


def q_decontaminate_sentences(spark, sf_dir):
    # eval prompts = words 17..24 of every 37th doc — exactly the third
    # sentence of the re-chunked corpus, so 8-gram sentence-level decon
    # must drop (at least) that sentence from the source documents
    # while keeping every document alive
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", f"{_SENT_DOCS_EXPR} AS text"
    )
    evals = _docs(spark, sf_dir).where(F.col("doc_id") % 37 == 0).select(
        F.concat_ws(" ", F.slice(F.split("text", " "), 17, 8)).alias("text")
    )
    return T.decontaminate_sentences(docs, evals, n=8)


def q_repeated_windows(spark, sf_dir):
    # exact-substring repetition (windowed suffix-array approximation,
    # Lee et al. 2022): 20-word windows shared across >= 2 docs
    return T.repeated_windows(_docs(spark, sf_dir), width=20)


def q_repeated_spans(spark, sf_dir):
    return T.repeated_spans(_docs(spark, sf_dir), width=20)


def q_repeated_window_stats(spark, sf_dir):
    # no-silent-caps accounting for the repeated-windows df_cap
    return T.repeated_window_stats(_docs(spark, sf_dir), width=20)


def q_oov_stats(spark, sf_dir):
    # deterministic perplexity-bucketing cousin: OOV share vs the
    # corpus' own top-16 vocabulary (synthetic corpus has 31 distinct
    # words; 16 puts the cut at a tie-free boundary)
    return T.oov_stats(_docs(spark, sf_dir), vocab_size=16)


def q_lm_coverage(spark, sf_dir):
    # integer-exact CCNet-perplexity stand-in: bigram-LM coverage vs
    # the corpus' own top-64 bigram model (the ~960-bigram synthetic
    # vocabulary makes a 64-bigram LM selective; ties at the cut break
    # lexicographically on both engines)
    return T.lm_coverage(_docs(spark, sf_dir), lm_size=64)


# gopher-rules fixture: the 8-word sentence corpus with deterministic
# decoration — segments whose md5 starts 0/1 become bullet lines,
# 2/3 gain a trailing ellipsis (both engines hash identically)
_SENT_ARRAY_EXPR = (
    "transform(sequence(1, size(split(text, ' ')), 8), "
    "j -> concat_ws(' ', slice(split(text, ' '), j, 8)))"
)
_GOPHER_TEXT_EXPR = (
    f"concat_ws('. ', transform({_SENT_ARRAY_EXPR}, "
    "s -> CASE WHEN substring(md5(s), 1, 1) IN ('0', '1') THEN '- ' || s "
    "WHEN substring(md5(s), 1, 1) IN ('2', '3') THEN s || '...' "
    "ELSE s END))"
)


def q_gopher_rules(spark, sf_dir):
    # the synthetic vocabulary carries only 'the' of the Gopher
    # stopword panel -> min_stopwords=1 keeps the verdict driven by the
    # other rules (length / ellipsis fractions vary per doc)
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", f"{_GOPHER_TEXT_EXPR} AS text"
    )
    return T.gopher_rules(
        docs, line_sep_regex="[.] ", min_words=40, min_stopwords=1
    )


def q_mirror_hosts(spark, sf_dir):
    # undeclared mirror detection: 13 distinct synthetic content
    # classes spread over the 100-host assignment — hosts sharing >= 3
    # exact fingerprints pair up
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"{_HOSTED_EXPR} AS host",
        "'shared content block ' || CAST(doc_id % 13 AS STRING) AS text",
    )
    return T.mirror_hosts(docs, min_shared=3)


def q_remove_boilerplate(spark, sf_dir):
    # per-host boilerplate strip: every document of a host carries the
    # same footer segment ('. '-delimited), which min_docs=3 flags and
    # the rebuild removes; organic repeats are handled identically on
    # both sides
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        f"{_HOSTED_EXPR} AS host",
        f"concat({_SENT_DOCS_EXPR}, '. visit ', {_HOSTED_EXPR}, ' for more') AS text",
    )
    return T.remove_boilerplate(docs, min_docs=3)


def q_select_token_budget(spark, sf_dir):
    # greedy corpus assembly: highest-LM-coverage docs until a 15k
    # token budget is exhausted (boundary-score tie handling exercised)
    docs = _docs(spark, sf_dir)
    cov = T.lm_coverage(docs, lm_size=64).select(
        "doc_id", F.col("coverage_e4").alias("score")
    )
    scored = docs.join(cov, "doc_id").select("doc_id", "score", "text")
    return P.select_token_budget(scored, budget_tokens=15000, score_col="score")


MIXTURE_TARGETS_E4 = {"src0": 5000, "src1": 3000, "src2": 2000}


def q_mixture_rates(spark, sf_dir):
    # mixture calibration: acceptance rates reshaping three sources to
    # a 50/30/20 token split (others dropped); rates are one integer
    # floor division each — bit-exact vs the oracle
    return T.mixture_rates(_docs(spark, sf_dir), MIXTURE_TARGETS_E4)


def q_corpus_report(spark, sf_dir):
    # the one-row dataset card (release datasheet summary)
    return T.corpus_report(_docs(spark, sf_dir))


def q_vocab_drift(spark, sf_dir):
    # drift monitor between the two halves of the corpus (top-16 union
    # vocabulary + per-side OOV bucket; TV distance integer-exact)
    docs = _docs(spark, sf_dir)
    return T.vocab_drift(
        docs.where("doc_id < 250"), docs.where("doc_id >= 250"), vocab_size=16
    )


def q_simhash(spark, sf_dir):
    return D.simhash(_docs(spark, sf_dir))


def q_lsh_bucket_stats(spark, sf_dir):
    # no-silent-caps accounting for the minhash bucket_cap (how much
    # candidate mass the hot-bucket drop removed)
    return D.lsh_bucket_stats(_docs(spark, sf_dir), bucket_cap=64)


def q_shingle_df_stats(spark, sf_dir):
    # no-silent-caps accounting for the jaccard df_cap
    return D.shingle_df_stats(_docs(spark, sf_dir), df_cap=64)


def q_ann_cosine(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return S.cosine_topk(emb, queries, k=3)


def q_simhash_pairs(spark, sf_dir):
    # near-dup pairs by simhash hamming distance over 3-band candidates
    # (exact for hamming<=2 by pigeonhole → matches the all-pairs oracle)
    return D.simhash_pairs(_docs(spark, sf_dir), max_hamming=2)


def q_ann_lsh(spark, sf_dir):
    # bucketed ANN scale path (deterministic hyperplane signs +
    # multi-probe — fully oracle-reproducible)
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return S.lsh_cosine_topk(emb, queries, k=3, dim=64, n_planes=4)


def q_ann_lsh_recall(spark, sf_dir):
    # measured recall@k of the LSH path vs the exact baseline — the
    # ANN rollout gate, recomputed bit-for-bit by the oracle
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    return S.lsh_recall_vs_exact(emb, queries, k=3, dim=64, n_planes=4)


def q_ann_ivf(spark, sf_dir):
    # IVF-Flat scale path: deterministic sampled coarse quantizer
    # (every 25th vector), nprobe=2 inverted-list search
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    pivots = emb.where(F.col("vec_id") % 25 == 7)
    return S.ivf_topk(emb, queries, pivots, k=3, nprobe=2)


def q_ann_ivf_recall(spark, sf_dir):
    emb = _tbl(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") % 100 == 0)
    pivots = emb.where(F.col("vec_id") % 25 == 7)
    return S.ivf_recall_vs_exact(emb, queries, pivots, k=3, nprobe=2)


def q_multimodal_features(spark, sf_dir):
    # integer-exact features over the hex-chain fake decode → the
    # DuckDB oracle recomputes the keystream and features bit-for-bit
    from .operators.multimodal import image_features, synth_media

    return image_features(synth_media(spark, sf_dir))


def q_embedding_near_dup(spark, sf_dir):
    # embedding-cosine near-dup pairs (threshold tuned to the synthetic
    # random-vector corpus: max pairwise cosine ≈ 0.44)
    return S.cosine_near_dup_pairs(_tbl(spark, sf_dir, "embeddings"), threshold=0.35)


def q_length_quantiles(spark, sf_dir):
    # exact token-length quantiles from the length histogram - no
    # global sort, no driver collect
    from .operators import sketches as SK

    return SK.length_quantiles(_docs(spark, sf_dir))


_DUCK_LENGTH_QUANTILES = (
    "WITH lens AS (SELECT len(string_split(text, ' ')) AS len, count(*) AS cnt "
    "FROM documents GROUP BY 1), "
    "cum AS (SELECT len, sum(cnt) OVER (ORDER BY len) AS cum, "
    "sum(cnt) OVER () AS total FROM lens), "
    "probs AS (SELECT unnest([25, 50, 75, 90, 99]) AS p_e2) "
    "SELECT CAST(p_e2 AS BIGINT) AS p_e2, CAST(min(len) AS BIGINT) AS value "
    "FROM cum CROSS JOIN probs WHERE cum * 100 >= p_e2 * total GROUP BY p_e2"
)


def q_grouped_quantiles(spark, sf_dir):
    # per-source length profiles (mixture-calibration input); window
    # partitioned by group — no single-partition stage at any group
    # count
    from .operators import sketches as SK

    return SK.grouped_length_quantiles(
        _docs(spark, sf_dir), group_col="source", probs_e2=(50, 90)
    )


_DUCK_GROUPED_QUANTILES = (
    "WITH lens AS (SELECT source AS grp, len(string_split(text, ' ')) AS len, "
    "count(*) AS cnt FROM documents GROUP BY 1, 2), "
    "cum AS (SELECT grp, len, sum(cnt) OVER (PARTITION BY grp ORDER BY len) AS cum, "
    "sum(cnt) OVER (PARTITION BY grp) AS total FROM lens), "
    "probs AS (SELECT unnest([50, 90]) AS p_e2) "
    "SELECT grp, CAST(p_e2 AS BIGINT) AS p_e2, CAST(min(len) AS BIGINT) AS value "
    "FROM cum CROSS JOIN probs WHERE cum * 100 >= p_e2 * total GROUP BY grp, p_e2"
)


def q_multiformat_text(spark, sf_dir):
    # multi-format ingestion: HTML pages and PDFs of the same corpus
    # extracted by their format-specific parsers into ONE normalized
    # (doc_id, fmt, text) table — the union is by construction, each
    # branch stays its own map-only stage
    from .operators.extract import extract_main_text
    from .operators.pdf import extract_pdf_text
    from .sources.pdfs import synth_pdfs

    html = extract_main_text(synth_pages(spark, sf_dir), passthrough=("doc_id",)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit("html").alias("fmt"),
        "text",
    )
    pdf = extract_pdf_text(synth_pdfs(spark, sf_dir), passthrough=("doc_id",)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.lit("pdf").alias("fmt"),
        "text",
    )
    return html.unionByName(pdf)


_DUCK_MULTIFORMAT = (
    # html branch: title heading + body; pdf branch: the pdf_text oracle
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, 'html' AS fmt, "
    "'Heading ' || CAST(doc_id AS VARCHAR) || text AS text FROM documents "
    "UNION ALL "
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, 'pdf' AS fmt, "
    "'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || "
    "array_to_string(list_transform("
    "generate_series(1, CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT)), "
    "i -> array_to_string(string_split(text, ' ')[(i-1)*8+1 : i*8], ' ')), chr(10)) AS text "
    "FROM documents"
)


def q_word_freq_histogram(spark, sf_dir):
    # Zipf frequency-of-frequencies corpus health check
    return T.word_freq_histogram(_docs(spark, sf_dir))


def q_holdout_split(spark, sf_dir):
    # leakage-free split keyed on source (the host proxy): documents
    # sharing a group can never straddle train/val
    return T.holdout_split(_docs(spark, sf_dir))


def q_shard_manifest(spark, sf_dir):
    # training-export integrity manifest: md5-uniform shard assignment
    # + order-independent xor checksum per shard
    return P.shard_manifest(_docs(spark, sf_dir))


_DUCK_SHARD_MANIFEST = (
    "SELECT shard, CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(sum(n_toks) AS BIGINT) AS n_tokens, "
    "CAST(min(doc_id) AS BIGINT) AS min_doc, CAST(max(doc_id) AS BIGINT) AS max_doc, "
    "CAST(bit_xor(th) AS BIGINT) AS checksum FROM ("
    "SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8 AS shard, "
    "doc_id, len(string_split(text, ' ')) AS n_toks, "
    "('0x' || substr(md5(text), 1, 8))::BIGINT AS th FROM documents) GROUP BY shard"
)


def q_pdf_text(spark, sf_dir):
    # PDF/layout parse (north rule): real FlateDecode PDFs generated
    # from the documents table, parsed back by the from-spec content-
    # stream tokenizer with layout (y-desc, x-asc) ordering
    from .operators.pdf import extract_pdf_text
    from .sources.pdfs import synth_pdfs

    return extract_pdf_text(synth_pdfs(spark, sf_dir)).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "text", "n_pages", "parse_ok"
    )


_DUCK_PDF_TEXT = (
    "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
    "'Doc ' || CAST(doc_id AS VARCHAR) || chr(10) || "
    "array_to_string(list_transform("
    "generate_series(1, CAST(ceil(len(string_split(text, ' ')) / 8.0) AS INT)), "
    "i -> array_to_string(string_split(text, ' ')[(i-1)*8+1 : i*8], ' ')), chr(10)) AS text, "
    "CAST(CASE WHEN doc_id % 7 = 0 THEN 2 ELSE 1 END AS BIGINT) AS n_pages, "
    "true AS parse_ok "
    "FROM documents"
)


def q_head_meta(spark, sf_dir):
    # crawl-hygiene head signals (rel=canonical, meta robots, title)
    # selected via CSS-string programs; indexable = no noindex
    # directive (absent meta defaults indexable)
    from .operators.extract import extract_head_meta
    from .sources.pages import synth_meta_pages

    out = extract_head_meta(synth_meta_pages(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "title", "canonical", "robots", "indexable",
    )


def q_charset_extract(spark, sf_dir):
    # WHATWG encoding sniff (BOM → meta prescan → windows-1252
    # default) + transcode ahead of the parse: the same logical page
    # arrives as utf-8/meta, iso-8859-1/meta, utf-16le/BOM and
    # undeclared windows-1252 bytes; all four decode to identical text
    from .css import css
    from .operators.encoding import sniff_and_transcode
    from .operators.extract import run_program, select_first_program
    from .sources.pages import synth_charset_pages

    pages = synth_charset_pages(spark, sf_dir)
    dec = sniff_and_transcode(pages)

    title_p = select_first_program(css("head > title"), {"title": "content"})
    body_p = select_first_program(css("body"), {"text": "content"})

    def program(nt):
        out = title_p(nt)
        out.update(body_p(nt))
        return out

    out = run_program(
        dec, program, "title string, text string",
        passthrough=("doc_id", "encoding", "enc_src"),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "encoding", "enc_src", "title", "text",
    )


def q_html_markdown(spark, sf_dir):
    # HTML → Markdown serialization (the training-data interchange
    # tier): map-only render over the NodeTable, no re-parse; the
    # paragraph round-trips documents.text through entity escape →
    # parse → whitespace collapse
    from .operators.markdown import to_markdown
    from .sources.pages import synth_md_pages

    out = to_markdown(synth_md_pages(spark, sf_dir))
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "markdown")


def q_page_meta(spark, sf_dir):
    # provenance metadata tier: OpenGraph metas via CSS programs, the
    # raw ld+json payload shipped once per page, JSON paths evaluated
    # JVM-side (get_json_object in codegen, not Python)
    from .operators.extract import extract_page_meta
    from .sources.pages import synth_og_pages

    out = extract_page_meta(synth_og_pages(spark, sf_dir))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "og_title", "og_type", "published",
        "ld_type", "ld_headline", "ld_published",
    )


def q_robots_gate(spark, sf_dir):
    # RFC 9309 politeness gate: hosts-sized robots table broadcast
    # onto the corpus, longest-match/allow-wins rule evaluation in an
    # Arrow kernel with a per-worker compiled-rules cache.  The rule
    # set disallows /doc/*1$ for gumbobot with a tie-length allow for
    # /doc/11$ (allow wins ties), everything for other agents.
    from .operators.robots import robots_filter
    from .sources.pages import synth_pages

    pages = synth_pages(spark, sf_dir).select("doc_id", "url")
    hosts = (
        _docs(spark, sf_dir)
        .select(F.concat("source", F.lit(".example.com")).alias("host"))
        .distinct()
    )
    txt = (
        "User-agent: gumbobot\nDisallow: /doc/*1$\nAllow: /doc/11$\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    robots = hosts.withColumn("robots_txt", F.lit(txt))
    out = robots_filter(pages, robots, agent="gumbobot/1.0")
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "url", "crawl_allowed"
    )


def q_crawl_schedule(spark, sf_dir):
    # per-host politeness schedule from the Crawl-delay extension:
    # delay = 1 + length(host) % 3 seconds for gumbobot, other agents
    # fall through to the delay-less * group (default applies)
    from .operators.robots import crawl_schedule

    hosts = (
        _docs(spark, sf_dir)
        .select(F.concat("source", F.lit(".example.com")).alias("host"))
        .distinct()
    )
    robots = hosts.withColumn(
        "robots_txt",
        F.expr(
            "concat('User-agent: gumbobot\\nCrawl-delay: ', "
            "CAST(1 + length(host) % 3 AS STRING), "
            "'\\nDisallow: /private\\n\\nUser-agent: *\\nDisallow: /\\n')"
        ),
    )
    return crawl_schedule(robots, agent="gumbobot/1.0", window_sec=60)


def q_shard_frontier(spark, sf_dir):
    # frontier → politeness windows: per-host md5-ordered rank (exact
    # via prefix-bucket offsets, never one task per host) divided into
    # fetch windows by the crawl_schedule budget
    from .operators.robots import crawl_schedule, shard_frontier
    from .sources.pages import synth_pages

    pages = synth_pages(spark, sf_dir).select(
        F.expr("regexp_extract(url, 'https?://([^/]+)', 1)").alias("host"),
        "url",
    )
    hosts = (
        _docs(spark, sf_dir)
        .select(F.concat("source", F.lit(".example.com")).alias("host"))
        .distinct()
    )
    robots = hosts.withColumn(
        "robots_txt",
        F.expr(
            "concat('User-agent: gumbobot\\nCrawl-delay: ', "
            "CAST(1 + length(host) % 3 AS STRING), "
            "'\\nDisallow: /private\\n\\nUser-agent: *\\nDisallow: /\\n')"
        ),
    )
    sched = crawl_schedule(robots, agent="gumbobot/1.0", window_sec=60)
    return shard_frontier(pages, sched)


def q_sitemap_frontier(spark, sf_dir):
    # crawl frontier = sitemap entries (JVM-side from_xml + explode,
    # zero Python) gated by RFC 9309 robots rules (broadcast join)
    from .operators.robots import robots_filter
    from .sources.sitemaps import parse_sitemaps, synth_sitemaps

    sm = synth_sitemaps(spark, sf_dir)
    entries = parse_sitemaps(sm)
    robots = sm.select(
        "host",
        F.lit(
            "User-agent: gumbobot\nDisallow: /doc/*1$\nAllow: /doc/11$\n\n"
            "User-agent: *\nDisallow: /\n"
        ).alias("robots_txt"),
    )
    out = robots_filter(entries, robots, agent="gumbobot/1.0", url_col="loc")
    return out.select("host", "loc", "lastmod", "priority", "crawl_allowed")


def q_url_features(spark, sf_dir):
    # URL-layer quality signals over a three-shape url family
    # (tracking query / deep path / bare root) — parse_url + string
    # kernels, all codegen, map-only
    from .operators.textstats import url_features

    docs = _docs(spark, sf_dir)
    urls = docs.selectExpr(
        "doc_id",
        "CASE CAST(doc_id % 3 AS INT) "
        "WHEN 0 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id AS STRING) "
        "  || '?utm_source=x&ref=' || CAST(doc_id AS STRING) "
        "WHEN 1 THEN 'http://' || source || '.example.com/a/b/doc/' || CAST(doc_id AS STRING) "
        "ELSE 'https://' || source || '.example.com/' END AS url",
    )
    out = url_features(urls)
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "url", "host", "tld", "path_depth", "n_params",
        "is_https", "has_tracking", "url_len",
    )


def q_anchor_texts(spark, sf_dir):
    # per-target anchor-text profile (what the web calls a page): one
    # href-keyed shuffle with map-side combine over parsed anchors
    from .operators.extract import anchor_text_stats, extract_anchor_texts
    from .sources.pages import synth_link_pages

    pairs = extract_anchor_texts(synth_link_pages(spark, sf_dir))
    return anchor_text_stats(pairs)


def q_canonical_collapse(spark, sf_dir):
    # declared mirror-cluster collapse: head_meta's rel=canonical
    # targets grouped into clusters (one shuffle, map-side combine);
    # rep = smallest member id, mirroring canonical_docs
    from .operators.dedup import canonical_url_collapse
    from .operators.extract import extract_head_meta
    from .sources.pages import synth_meta_pages

    meta = extract_head_meta(synth_meta_pages(spark, sf_dir))
    return canonical_url_collapse(meta)


def q_html_density_extract(spark, sf_dir):
    # DOM-heuristic (readability/boilerpipe-family) main-block
    # selection: density scoring with link penalty + negative class/id
    # hints.  On the template the wrapper chain body>div>main>article
    # resolves to <article> via the smallest-subtree tie-break, with
    # nav/footer excluded before scoring.
    from .operators.extract import density_extract

    out = density_extract(synth_pages(spark, sf_dir), passthrough=("doc_id",))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "block_tag",
        "block_text",
        F.col("text_chars").cast("bigint").alias("text_chars"),
        F.col("link_chars").cast("bigint").alias("link_chars"),
        F.col("n_candidates").cast("bigint").alias("n_candidates"),
    )


def q_html_css_select(spark, sf_dir):
    # CSS selector strings compiled onto the matcher algebra (css.py)
    # — one query exercising all four combinators (descendant, child,
    # +, ~) plus class-token / attr-prefix simple selectors, against
    # the deterministic page template
    from .css import css

    sels = {
        "h1_text": (css("body > div.doc main > article > h1"), "content"),
        "body_text": (css("h1 + p.body"), "content"),
        "fine_text": (css("nav.menu ~ footer p.fine"), "content"),
        "home_href": (css("nav.menu li > a[href^='https://site.example/']"), "attr:href"),
    }
    progs = [
        select_first_program(mt, {k: spec}) for k, (mt, spec) in sels.items()
    ]

    def program(nt):
        out = {}
        for p in progs:
            out.update(p(nt))
        return out

    out = run_program(
        synth_pages(spark, sf_dir),
        program,
        "h1_text string, body_text string, fine_text string, home_href string",
        passthrough=("doc_id",),
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "h1_text", "body_text", "fine_text", "home_href",
    )


def q_warc_extract(spark, sf_dir):
    # WARC crawl-to-text round trip (north rule: "Common-Crawl-style
    # web pages"): pages → spec-written .warc.gz (one gzip member per
    # record, CC layout) + CDX sidecar → ranged-read CDX source →
    # flagship extraction; doc_id recovered from WARC-Target-URI.  The
    # write happens once per sf_dir (atomic _SUCCESS marker) — re-runs
    # only exercise the read path, like a real crawl archive.
    import hashlib
    import os

    from .sources.warc import read_warc_cdx, write_warc_corpus

    out_dir = os.path.join(
        os.environ.get("TMPDIR", "/tmp"),
        "gumbo_pp_spark_warc_" + hashlib.md5(sf_dir.encode()).hexdigest()[:12],
    )
    marker = os.path.join(out_dir, "_SUCCESS")
    if not os.path.exists(marker):
        write_warc_corpus(synth_pages(spark, sf_dir), out_dir, n_files=8)
        with open(marker, "w") as f:
            f.write("")
    pages = read_warc_cdx(spark, out_dir).filter("warc_ok")
    ids = pages.withColumn(
        "doc_id", F.regexp_extract("url", r"/doc/(\d+)$", 1).cast("bigint")
    )
    out = extract_main_text(ids, passthrough=("doc_id",))
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("text").alias("main_text"),
    )


def q_link_graph(spark, sf_dir):
    # web-graph construction from PARSED anchors (the parser feeds the
    # graph stage); oracle = ground truth of the synthetic page shape
    # (one anchor per page, href host site.example, url host
    # <source>.example.com)
    from .operators.extract import link_graph

    return link_graph(synth_pages(spark, sf_dir))


def q_pagerank(spark, sf_dir):
    # integer-exact PageRank over a deterministic doc-link graph
    # (every doc links to doc (id*17+3) mod 512 — a hub-heavy shape);
    # 3 rounds, damping 0.85, ranks as 1e9-scaled bigints
    from .operators import graph as G

    docs = _docs(spark, sf_dir).select("doc_id")
    edges = (
        docs.selectExpr("doc_id AS src", "(doc_id * 17 + 3) % 512 AS dst_key")
        .join(docs.selectExpr("doc_id AS dst"), F.col("dst_key") == F.col("dst"))
        .select("src", "dst")
    )
    return G.pagerank(edges, n_iter=3)


def _duck_pagerank_sql(n_iter: int = 3, damping_e2: int = 85, scale: int = 10**9) -> str:
    base = (100 - damping_e2) * scale // 100
    sql = (
        "WITH edges AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a "
        "JOIN documents b ON b.doc_id = (a.doc_id * 17 + 3) % 512), "
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges), "
        "outdeg AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY src), "
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank FROM nodes)"
    )
    prev = "r0"
    for i in range(1, n_iter + 1):
        sql += (
            f", c{i} AS (SELECT e.dst, SUM(r.rank // o.deg) AS s FROM edges e "
            f"JOIN outdeg o ON o.node = e.src JOIN {prev} r ON r.node = e.src GROUP BY e.dst)"
            f", r{i} AS (SELECT n.node, CAST({base} + ({damping_e2} * COALESCE(c.s, 0)) // 100 AS BIGINT) AS rank "
            f"FROM nodes n LEFT JOIN c{i} c ON n.node = c.dst)"
        )
        prev = f"r{i}"
    return sql + f" SELECT CAST(node AS BIGINT) AS node, rank FROM {prev}"


def q_hits(spark, sf_dir):
    # integer-exact HITS over the same deterministic doc-link family as
    # pagerank; max-normalized per pass, 1e6-scaled bigints
    from .operators import graph as G

    docs = _docs(spark, sf_dir).select("doc_id")
    edges = (
        docs.selectExpr("doc_id AS src", "(doc_id * 17 + 3) % 512 AS dst_key")
        .join(docs.selectExpr("doc_id AS dst"), F.col("dst_key") == F.col("dst"))
        .select("src", "dst")
    )
    return G.hits(edges, n_iter=3)


def _duck_hits_sql(n_iter: int = 3, scale: int = 10**6) -> str:
    sql = (
        "WITH edges AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a "
        "JOIN documents b ON b.doc_id = (a.doc_id * 17 + 3) % 512), "
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges), "
        f"h0 AS (SELECT node, CAST({scale} AS BIGINT) AS h FROM nodes)"
    )
    ph = "h0"
    for i in range(1, n_iter + 1):
        sql += (
            f", ar{i} AS (SELECT e.dst AS node, CAST(SUM(x.h) AS BIGINT) AS a "
            f"FROM edges e JOIN {ph} x ON x.node = e.src GROUP BY e.dst)"
            f", am{i} AS (SELECT COALESCE(MAX(a), 1) AS m FROM ar{i})"
            f", a{i} AS (SELECT n.node, CAST(COALESCE(r.a, 0) * {scale} // m AS BIGINT) AS a "
            f"FROM nodes n LEFT JOIN ar{i} r ON n.node = r.node, am{i})"
            f", hr{i} AS (SELECT e.src AS node, CAST(SUM(x.a) AS BIGINT) AS h "
            f"FROM edges e JOIN a{i} x ON x.node = e.dst GROUP BY e.src)"
            f", hm{i} AS (SELECT COALESCE(MAX(h), 1) AS m FROM hr{i})"
            f", h{i} AS (SELECT n.node, CAST(COALESCE(r.h, 0) * {scale} // m AS BIGINT) AS h "
            f"FROM nodes n LEFT JOIN hr{i} r ON n.node = r.node, hm{i})"
        )
        ph = f"h{i}"
    return sql + (
        f" SELECT CAST(n.node AS BIGINT) AS node, h{n_iter}.h AS hub, "
        f"a{n_iter}.a AS authority FROM nodes n "
        f"JOIN h{n_iter} ON n.node = h{n_iter}.node "
        f"JOIN a{n_iter} ON n.node = a{n_iter}.node"
    )


def q_degree_stats(spark, sf_dir):
    # link-graph degree histogram over the deterministic doc-link family
    from .operators import graph as G

    docs = _docs(spark, sf_dir).select("doc_id")
    edges = (
        docs.selectExpr("doc_id AS src", "(doc_id * 17 + 3) % 512 AS dst_key")
        .join(docs.selectExpr("doc_id AS dst"), F.col("dst_key") == F.col("dst"))
        .select("src", "dst")
    )
    return G.degree_stats(edges)


def q_top_docs_per_source(spark, sf_dir):
    # best-5 longest docs per source (ties by doc_id) — cap_per_host's
    # salted two-phase rank generalized to a score ordering
    out = T.top_k_per_group(
        _docs(spark, sf_dir),
        k=5,
        group_col="source",
        order_expr="-n_chars",
    )
    return out.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        "source",
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


def q_kmv_distinct(spark, sf_dir):
    # bottom-k distinct-count sketch over the token stream (k=16 of a
    # 31-word vocabulary: the estimator genuinely extrapolates)
    from .operators import sketches as SK

    return SK.kmv_distinct(_docs(spark, sf_dir))


_DUCK_KMV = (
    "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents), "
    "h AS (SELECT DISTINCT ('0x' || substr(md5(word), 1, 8))::BIGINT AS h FROM toks), "
    "b AS (SELECT h FROM h ORDER BY h LIMIT 16) "
    "SELECT CAST(count(*) AS BIGINT) AS k_used, CAST(max(h) AS BIGINT) AS kth_hash, "
    "CAST((count(*) - 1) * 4294967296 // max(h) AS BIGINT) AS est_distinct FROM b"
)


def q_cms_heavy_hitters(spark, sf_dir):
    # Count-Min sketch heavy hitters; width 16 over a 31-word synthetic
    # vocabulary so counter collisions genuinely occur and the
    # one-sided (est >= true) error is exercised, not just mirrored
    from .operators import sketches as SK

    return SK.cms_heavy_hitters(_docs(spark, sf_dir))


def _duck_cms_sql(width: int = 16, depth: int = 3, min_count: int = 100) -> str:
    def bucket(r: int) -> str:
        return f"('0x' || substr(md5('{r}|' || word), 1, 8))::BIGINT % {width}"

    stacked = " UNION ALL ".join(
        f"SELECT {r} AS row, {bucket(r)} AS bucket FROM toks" for r in range(depth)
    )
    probes = " UNION ALL ".join(
        f"SELECT word, {r} AS row, {bucket(r)} AS bucket FROM words"
        for r in range(depth)
    )
    return (
        "WITH toks AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents), "
        f"stacked AS ({stacked}), "
        "sketch AS (SELECT row, bucket, count(*) AS cnt FROM stacked GROUP BY row, bucket), "
        "words AS (SELECT DISTINCT word FROM toks), "
        f"probes AS ({probes}), "
        "est AS (SELECT word, min(cnt) AS est FROM probes JOIN sketch USING (row, bucket) GROUP BY word) "
        f"SELECT word, CAST(est AS BIGINT) AS est FROM est WHERE est >= {min_count}"
    )


def q_quality_classifier(spark, sf_dir):
    # hashed linear (fastText/CCNet-style) quality classifier; the
    # B-bucket integer model is a plan-time literal in BOTH engines
    return T.quality_classifier(_docs(spark, sf_dir))


def _duck_quality_classifier_sql(n_buckets: int = 256) -> str:
    w = T.classifier_weights(n_buckets)
    warr = "[" + ",".join(str(x) for x in w) + "]"
    score = (
        f"list_sum(list_transform(string_split(text, ' '), "
        f"t -> {warr}[CAST(('0x' || substr(md5(t), 1, 8))::BIGINT % {n_buckets} AS INT) + 1]))"
    )
    return (
        "SELECT doc_id, n_tokens, score, score > 0 AS label FROM ("
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        f"CAST({score} AS BIGINT) AS score FROM documents)"
    )


def q_semantic_dedup(spark, sf_dir):
    # SemDeDup-style cluster-then-compare dedup over the embedding
    # column; same deterministic coarse quantizer as the IVF queries,
    # threshold tuned to the synthetic corpus (within-cluster max
    # cosine ≈ 0.49 at sf0.01, 68 over-threshold pairs)
    emb = _tbl(spark, sf_dir, "embeddings")
    pivots = emb.where(F.col("vec_id") % 25 == 7)
    return S.semantic_dedup(emb, pivots, threshold=0.35)


def q_quality(spark, sf_dir):
    return T.quality_stats(_docs(spark, sf_dir))


def q_lang_id(spark, sf_dir):
    return T.lang_id(_docs(spark, sf_dir))


def q_normalize_text(spark, sf_dir):
    return T.normalize_text(_docs(spark, sf_dir))


def q_scrub_pii(spark, sf_dir):
    # synthesize PII deterministically so redaction is observable
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 3 = 0 THEN text || ' contact user' || CAST(doc_id AS STRING) "
        "|| '@mail.example.org now' "
        "WHEN doc_id % 3 = 1 THEN text || ' call +1 (555) 010-' "
        "|| substr(CAST(10000 + doc_id AS STRING), 2, 4) || ' today' "
        "ELSE text END AS text",
    )
    return T.scrub_pii(docs)


def q_quality_filter(spark, sf_dir):
    return T.quality_filter(_docs(spark, sf_dir), min_tokens=40,
                            min_stopword_ratio_e4=100, min_alpha_ratio_e4=7000)


def q_fingerprints(spark, sf_dir):
    return T.fingerprints(_docs(spark, sf_dir))


def q_token_counts(spark, sf_dir):
    return T.token_counts(_docs(spark, sf_dir))


def q_repetition_stats(spark, sf_dir):
    # Gopher-style repetition quality signals (distinct-word ratio,
    # top word/bigram share) — the standard anti-boilerplate gate
    return T.repetition_stats(_docs(spark, sf_dir))


def q_dedup_paragraphs(spark, sf_dir):
    # sub-document dedup: 10-word chunks shared across documents
    return T.dedup_paragraphs(_docs(spark, sf_dir))


def q_canonical_urls(spark, sf_dir):
    # crawl-frontier URL canonicalization over deterministic variants
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id",
        "CASE WHEN doc_id % 3 = 0 THEN 'https://Site.Example/p/' || CAST(doc_id AS STRING) "
        "|| '?utm_source=feed&x=1#frag' "
        "WHEN doc_id % 3 = 1 THEN 'https://site.example/p/' || CAST(doc_id AS STRING) "
        "|| '?utm_campaign=a' "
        "ELSE 'https://site.example/p/' || CAST(doc_id AS STRING) || '?x=2' END AS url",
    )
    return T.canonical_urls(docs)


def q_sample_by_hash(spark, sf_dir):
    # deterministic 10% evaluation slice (md5-domain uniform, no RNG)
    return T.sample_by_hash(
        _docs(spark, sf_dir).select("doc_id", "n_chars"), rate_e4=1000
    ).select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
    )


#: per-source acceptance rates for the stratified-sampling query —
#: mixture weighting policy, mirrored verbatim into the oracle CASE
STRATA_RATES_E4 = {f"src{i}": (10000, 5000, 2500)[i % 3] for i in range(20)}


def q_stratified_sample(spark, sf_dir):
    # mixture weighting: per-source deterministic acceptance rates
    # (full / half / quarter by source index), map-only plan
    return T.stratified_sample(_docs(spark, sf_dir), STRATA_RATES_E4).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "source"
    )


def q_cap_per_host(spark, sf_dir):
    # anti-domination gate: at most 15 docs per host, deterministic pick
    docs = _docs(spark, sf_dir).selectExpr(
        "doc_id", "source || '.example.com' AS host"
    )
    return T.cap_per_host(docs, cap=15).select(
        F.col("doc_id").cast("bigint").alias("doc_id"), "host"
    )


def q_host_stats(spark, sf_dir):
    # host-level corpus stats over the pages table (the salting key's
    # real-world aggregation path)
    pages = synth_pages(spark, sf_dir)
    return (
        pages.withColumn("host", F.regexp_extract("url", "https?://([^/]+)", 1))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pages"),
            F.sum(F.length("html")).cast("bigint").alias("html_bytes"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
    )


# deterministic 100-host synthetic assignment for the domain-gate
# family: 20 sources × 5 doc_id residues
_HOSTED_EXPR = "source || '-' || CAST(doc_id % 5 AS STRING) || '.example.com'"


def _hosted_docs(spark, sf_dir):
    return _docs(spark, sf_dir).selectExpr(
        "doc_id", "text", f"{_HOSTED_EXPR} AS host"
    )


def q_host_quality_stats(spark, sf_dir):
    # per-domain roll-up of the doc-level quality gate (same thresholds
    # as q_quality_filter so the family is internally consistent)
    return T.host_quality_stats(
        _hosted_docs(spark, sf_dir),
        min_tokens=40,
        min_stopword_ratio_e4=100,
        min_alpha_ratio_e4=7000,
    )


def q_host_quality_gate(spark, sf_dir):
    # domain blocklist gate: drop all docs of hosts with > 35% bad docs
    # (min 3 observations); survivors keep their original columns
    out = T.host_quality_gate(
        _hosted_docs(spark, sf_dir),
        min_docs=3,
        max_bad_frac_e4=3500,
        min_tokens=40,
        min_stopword_ratio_e4=100,
        min_alpha_ratio_e4=7000,
    )
    return out.select(F.col("doc_id").cast("bigint").alias("doc_id"), "host")


def q_top_terms(spark, sf_dir):
    # corpus top-20 terms: explode → count → global top-k with
    # deterministic tiebreak (classic shuffle+limit path)
    docs = _docs(spark, sf_dir)
    return (
        docs.select(F.explode(F.split("text", " ")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "term")
        .limit(20)
    )


# ----------------------------------------------------------------------
# relational surface (scans/filters/agg/window/sort/limit — §2.5)
# ----------------------------------------------------------------------
def q_lineitem_agg(spark, sf_dir):
    li = _tbl(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") < F.lit("2025-06-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity")).cast("bigint").alias("sum_qty"),
            F.round(F.sum("l_extendedprice") * 100).cast("bigint").alias("sum_price_e2"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )


def q_revenue_by_nation(spark, sf_dir):
    # TPC-H Q5 analogue: local-supplier revenue per nation of one
    # region in one order-date year.  Plan shape at scale: region/
    # nation/customer/supplier are dim tables (broadcast — the big
    # lineitem side is never shuffled for them); lineitem↔orders is
    # the one big equi-join; the supplier join carries the Q5
    # local-supply conjunct (s_nationkey = c_nationkey).
    r = _tbl(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = _tbl(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = _tbl(spark, sf_dir, "customer").join(
        F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey")
    )
    o = (
        _tbl(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
    )
    s = _tbl(spark, sf_dir, "supplier")
    li = (
        _tbl(spark, sf_dir, "lineitem")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        li.groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .cast("bigint")
            .alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
        )
    )


def q_top_orders_per_segment(spark, sf_dir):
    from pyspark.sql.window import Window

    orders = _tbl(spark, sf_dir, "orders")
    cust = _tbl(spark, sf_dir, "customer")
    joined = orders.join(
        F.broadcast(cust.select("c_custkey", "c_mktsegment")),
        orders.o_custkey == cust.c_custkey,
    )
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
    return (
        joined.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 3)
        .select(
            "c_mktsegment",
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def q_events_hourly(spark, sf_dir):
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.groupBy(F.col("event_type"), F.date_trunc("hour", "ts").alias("h"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.sum("value") * 100).cast("bigint").alias("sum_value_e2"),
        )
    )


def q_events_props_json(spark, sf_dir):
    # JSON scalar functions over the semi-structured props column
    ev = _tbl(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("bigint").alias("sum_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
    )


def q_events_retention(spark, sf_dir):
    # cohort retention: users grouped by first-seen day, counted at
    # each later active day.  Scale shape: distinct (user, day) and
    # the cohort min are both user-keyed map-side-combined aggs, so
    # the join arrives co-partitioned (no extra exchange); the final
    # rollup is cohort×age-sized.
    ev = _tbl(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.expr("CAST(date_trunc('DAY', ts) AS DATE)").alias("day")
    ).distinct()
    cohort = days.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        days.join(cohort, "user_id")
        .select(
            "user_id",
            "cohort_day",
            F.expr("CAST(datediff(day, cohort_day) AS BIGINT)").alias("age_days"),
        )
        .groupBy("cohort_day", "age_days")
        .agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    )


def q_events_sessions(spark, sf_dir):
    from pyspark.sql.window import Window

    ev = _tbl(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.withColumn(
        "new_sess",
        F.when(F.lag("ts").over(w).isNull(), 0)
        .when(F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w)) > 1800, 1)
        .otherwise(0),
    ).withColumn("session_id", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return flagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).cast("bigint").alias("dur_s"),
    ).select(
        F.col("user_id").cast("bigint").alias("user_id"),
        F.col("session_id").cast("bigint").alias("session_id"),
        "n_events",
        "dur_s",
    )


def q_pack_sequences(spark, sf_dir):
    # GPT-style concat-and-split packing: seq_len 64 so the synthetic
    # docs span sequence cuts; 8 shards = 8 independent token streams
    # (the scale story — no global sort, shard-partitioned prefix sum)
    return P.pack_sequences(_docs(spark, sf_dir), seq_len=64, n_shards=8)


def q_chunk_tokens(spark, sf_dir):
    # overlapping RAG/embedding chunks: width 12, stride 8 → 4-token
    # overlap; map-only explode
    return P.chunk_tokens(_docs(spark, sf_dir), width=12, stride=8)


def q_tfidf_top_terms(spark, sf_dir):
    return T.tfidf_top_terms(_docs(spark, sf_dir), k=3)


def q_importance_sample(spark, sf_dir):
    return T.importance_sample(_docs(spark, sf_dir))


def q_decontaminate_fuzzy(spark, sf_dir):
    # near-duplicate benchmark decontamination: the same synthetic eval
    # derivation as q_decontaminate (words 5..40 of every 41st doc —
    # a paraphrase-like fragment of its source), flagged via shared
    # MinHash LSH bands instead of exact 13-grams
    docs = _docs(spark, sf_dir)
    evals = docs.where(F.col("doc_id") % 41 == 0).select(
        F.col("doc_id").alias("eval_id"),
        F.concat_ws(" ", F.slice(F.split("text", " "), 5, 36)).alias("text"),
    )
    return D.minhash_contamination(docs, evals, min_equal=4)


def _duck_fuzzy_contamination_sql(
    n_hashes: int = D.N_MINHASHES, n_bands: int = D.N_BANDS, min_equal: int = 4
) -> str:
    # mirror of q_decontaminate_fuzzy: eval texts = words 5..40 of
    # every 41st doc, minhash/banding generated from the same params
    rows = n_hashes // n_bands
    mh = ", ".join(f"min(md5('{k}|' || sh)) AS mh{k}" for k in range(n_hashes))
    cbands = " UNION ALL ".join(
        f"SELECT doc_id, {bd} AS band, "
        + " || ".join(f"mh{rows * bd + j}" for j in range(rows))
        + " AS bkey FROM csig"
        for bd in range(n_bands)
    )
    ebands = " UNION ALL ".join(
        f"SELECT eval_id, {bd} AS band, "
        + " || ".join(f"mh{rows * bd + j}" for j in range(rows))
        + " AS bkey FROM esig"
        for bd in range(n_bands)
    )
    eq = " + ".join(
        f"(CASE WHEN c.mh{k} = e.mh{k} THEN 1 ELSE 0 END)" for k in range(n_hashes)
    )
    return (
        f"WITH {_DUCK_SHINGLES}, "
        "ev AS (SELECT doc_id AS eval_id, "
        "array_to_string(string_split(text, ' ')[5:40], ' ') AS text "
        "FROM documents WHERE doc_id % 41 = 0), "
        "esh AS (SELECT eval_id, unnest(list_distinct(list_transform("
        "generate_series(1, len(string_split(text, ' ')) - 2), "
        "j -> array_to_string(string_split(text, ' ')[j:j+2], ' ')))) AS sh "
        "FROM ev WHERE len(string_split(text, ' ')) >= 3), "
        f"csig AS (SELECT doc_id, {mh} FROM sh GROUP BY doc_id), "
        f"esig AS (SELECT eval_id, {mh} FROM esh GROUP BY eval_id), "
        f"cb AS ({cbands}), eb AS ({ebands}), "
        "cand AS (SELECT DISTINCT cb.doc_id, eb.eval_id FROM cb "
        "JOIN eb ON cb.band = eb.band AND cb.bkey = eb.bkey), "
        f"m AS (SELECT cand.doc_id, cand.eval_id, {eq} AS n_eq FROM cand "
        "JOIN csig c ON cand.doc_id = c.doc_id "
        "JOIN esig e ON cand.eval_id = e.eval_id) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(count(*) AS BIGINT) AS n_eval_matches, "
        "CAST(max(n_eq) AS BIGINT) AS max_n_eq "
        f"FROM m WHERE n_eq >= {min_equal} GROUP BY doc_id"
    )


# ======================================================================
# registry
# ======================================================================
QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "html_main_text": q_html_main_text,
    "html_title": q_html_title,
    "html_anchor": q_html_anchor,
    "html_node_count": q_html_node_count,
    "html_article_text": q_html_article_text,
    "html_class_match": q_html_class_match,
    "html_spans": q_html_spans,
    "html_spans_bytes": q_html_spans_bytes,
    "html_spans_mojibake": q_html_spans_mojibake,
    "html_dom_stats": q_html_dom_stats,
    "html_tag_histogram": q_html_tag_histogram,
    "html_first_div_content": q_html_first_div_content,
    "html_outer_inner": q_html_outer_inner,
    "html_selector_ir": q_html_selector_ir,
    "html_table_scrape": q_html_table_scrape,
    "html_doc_content_text": q_html_doc_content_text,
    "html_misnested": q_html_misnested,
    "html_foreign_content": q_html_foreign_content,
    "html_parse_errors": q_html_parse_errors,
    "simhash_pairs": q_simhash_pairs,
    "ann_lsh_topk": q_ann_lsh,
    "ann_lsh_recall": q_ann_lsh_recall,
    "ann_ivf_topk": q_ann_ivf,
    "ann_ivf_recall": q_ann_ivf_recall,
    "multimodal_image_features": q_multimodal_features,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash,
    "dedup_minhash_lsh32": q_dedup_minhash32,
    "dedup_verified": q_dedup_verified,
    "incremental_dedup": q_incremental_dedup,
    "dedup_lsh_between": q_dedup_lsh_between,
    "dedup_components": q_dedup_components,
    "component_stats": q_component_stats,
    "dedup_canonical": q_dedup_canonical,
    "decontaminate": q_decontaminate,
    "decontaminate_sentences": q_decontaminate_sentences,
    "repeated_windows": q_repeated_windows,
    "repeated_spans": q_repeated_spans,
    "repeated_window_stats": q_repeated_window_stats,
    "oov_stats": q_oov_stats,
    "lm_coverage": q_lm_coverage,
    "mixture_rates": q_mixture_rates,
    "vocab_drift": q_vocab_drift,
    "corpus_report": q_corpus_report,
    "crawl_schedule": q_crawl_schedule,
    "shard_frontier": q_shard_frontier,
    "remove_boilerplate": q_remove_boilerplate,
    "select_token_budget": q_select_token_budget,
    "mirror_hosts": q_mirror_hosts,
    "gopher_rules": q_gopher_rules,
    "lsh_bucket_stats": q_lsh_bucket_stats,
    "shingle_df_stats": q_shingle_df_stats,
    "simhash": q_simhash,
    "ann_cosine_topk": q_ann_cosine,
    "embedding_near_dup": q_embedding_near_dup,
    "semantic_dedup": q_semantic_dedup,
    "quality_classifier": q_quality_classifier,
    "cms_heavy_hitters": q_cms_heavy_hitters,
    "kmv_distinct": q_kmv_distinct,
    "pagerank": q_pagerank,
    "hits": q_hits,
    "degree_stats": q_degree_stats,
    "top_docs_per_source": q_top_docs_per_source,
    "link_graph": q_link_graph,
    "pdf_text": q_pdf_text,
    "warc_extract": q_warc_extract,
    "html_css_select": q_html_css_select,
    "html_density_extract": q_html_density_extract,
    "head_meta": q_head_meta,
    "canonical_collapse": q_canonical_collapse,
    "charset_extract": q_charset_extract,
    "html_markdown": q_html_markdown,
    "page_meta": q_page_meta,
    "robots_gate": q_robots_gate,
    "sitemap_frontier": q_sitemap_frontier,
    "url_features": q_url_features,
    "anchor_texts": q_anchor_texts,
    "shard_manifest": q_shard_manifest,
    "word_freq_histogram": q_word_freq_histogram,
    "multiformat_text": q_multiformat_text,
    "length_quantiles": q_length_quantiles,
    "grouped_quantiles": q_grouped_quantiles,
    "holdout_split": q_holdout_split,
    "text_quality": q_quality,
    "lang_id": q_lang_id,
    "normalize_text": q_normalize_text,
    "scrub_pii": q_scrub_pii,
    "quality_filter": q_quality_filter,
    "doc_fingerprints": q_fingerprints,
    "token_counts": q_token_counts,
    "repetition_stats": q_repetition_stats,
    "sample_by_hash": q_sample_by_hash,
    "stratified_sample": q_stratified_sample,
    "cap_per_host": q_cap_per_host,
    "dedup_paragraphs": q_dedup_paragraphs,
    "canonical_urls": q_canonical_urls,
    "host_stats": q_host_stats,
    "host_quality_stats": q_host_quality_stats,
    "host_quality_gate": q_host_quality_gate,
    "top_terms": q_top_terms,
    "lineitem_agg": q_lineitem_agg,
    "top_orders_per_segment": q_top_orders_per_segment,
    "revenue_by_nation": q_revenue_by_nation,
    "events_hourly": q_events_hourly,
    "events_props_json": q_events_props_json,
    "events_sessions": q_events_sessions,
    "events_retention": q_events_retention,
    "pack_sequences": q_pack_sequences,
    "chunk_tokens": q_chunk_tokens,
    "tfidf_top_terms": q_tfidf_top_terms,
    "importance_sample": q_importance_sample,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
}

# DuckDB mirrors of _SENT_DOCS_EXPR / _HOSTED_EXPR (8-word '. '-joined
# sentences; 100-host synthetic assignment)
_DUCK_SENT = (
    "array_to_string(list_transform(generate_series(1, len(string_split(text, ' ')), 8), "
    "j -> array_to_string(string_split(text, ' ')[j:j+7], ' ')), '. ')"
)
_DUCK_HOST = "source || '-' || CAST(doc_id % 5 AS VARCHAR) || '.example.com'"

# lang-ID argmax CASE (mirror of textstats._lang_case), shared by the
# lang_id and corpus_report oracles
_DUCK_LANG_CASE = (
    "CASE "
    "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) "
    "AND len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) "
    "AND len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'en' "
    "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) "
    "AND len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'es' "
    "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'de' "
    "ELSE 'fr' END"
)

# doc-level bad flag shared by the host_quality_* oracles (thresholds
# 40 / 100 / 7000 — the q_quality_filter family settings)
_DUCK_IS_BAD = (
    "(len(string_split(text, ' ')) < 40 "
    "OR round(10000.0 * len(list_filter(string_split(text, ' '), "
    "w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for'))) "
    "/ len(string_split(text, ' '))) < 100 "
    "OR round(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) "
    "/ length(text)) < 7000)"
)

ORACLES: dict[str, str] = {
    "html_main_text": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Heading ' || CAST(doc_id AS STRING) || text AS main_text FROM documents"
    ),
    "html_title": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Doc ' || CAST(doc_id AS STRING) AS title FROM documents"
    ),
    "html_anchor": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'https://site.example/' || CAST(doc_id AS STRING) AS href, "
        "'home' AS anchor_text FROM documents"
    ),
    "html_node_count": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(CASE WHEN lang = 'en' THEN 22 ELSE 21 END AS BIGINT) AS n_nodes, "
        "CAST(0 AS BIGINT) AS parse_errors FROM documents"
    ),
    "html_article_text": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Heading ' || CAST(doc_id AS STRING) || text || "
        "CASE WHEN lang = 'en' THEN 'promoted' ELSE '' END AS article_text FROM documents"
    ),
    "html_class_match": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) AS n_doc_en FROM documents"
    ),
    "html_spans": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        f"CAST({_DUCK_PREFIX_LEN} - 16 AS BIGINT) AS outer_start, "
        f"CAST({_DUCK_PREFIX_LEN} AS BIGINT) AS inner_start, "
        f"CAST({_DUCK_PREFIX_LEN} + length({_DUCK_ESC}) AS BIGINT) AS inner_end, "
        f"CAST({_DUCK_PREFIX_LEN} + length({_DUCK_ESC}) + 4 AS BIGINT) AS outer_end "
        "FROM documents"
    ),
    "html_spans_mojibake": (
        # fixed construction: normalized prefix '<html><body>\n' = 13
        # chars / 14 raw bytes; '<p class=\"mix\">' = 15; content =
        # FFFD + 'é ' + text + ' ' + FFFD + 'tail' (chars 9+len,
        # bytes 10+len: 0xFF->1, 'é '->3, 0xC2->1); '</p>' = 4
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(13 AS BIGINT) AS outer_start, "
        "CAST(41 + length(text) AS BIGINT) AS outer_end, "
        "CAST(14 AS BIGINT) AS start_byte, "
        "CAST(43 + length(text) AS BIGINT) AS end_byte, "
        "chr(65533) || 'é ' || text || ' ' || chr(65533) || 'tail' AS content "
        "FROM documents"
    ),
    "html_spans_bytes": (
        "WITH r AS (SELECT doc_id, " + BYTESPAN_HTML_EXPR + " AS R FROM documents), "
        "p AS (SELECT doc_id, R, replace(R, chr(13) || chr(10), chr(10)) AS N FROM r) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(strpos(N, '<p class=\"bytes\"') - 1 AS BIGINT) AS outer_start, "
        "CAST(strpos(N, '</p>') + 3 AS BIGINT) AS outer_end, "
        "CAST(octet_length(encode(left(R, strpos(R, '<p class=\"bytes\"') - 1))) AS BIGINT) AS start_byte, "
        "CAST(octet_length(encode(left(R, strpos(R, '</p>') + 3))) AS BIGINT) AS end_byte "
        "FROM p"
    ),
    "html_dom_stats": (
        # template-derived: 15 elements, 1 link ("home", 4 chars),
        # deepest chain body>div>main>article>h1>text = depth 7;
        # text mass = "Doc {id}" + "home" + "Heading {id}" + text +
        # "source {source}"
        "WITH s AS (SELECT doc_id, "
        "4 + length(CAST(doc_id AS STRING)) + 4 + 8 + length(CAST(doc_id AS STRING)) "
        "+ length(text) + 7 + length(source) AS tc FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(15 AS BIGINT) AS n_elements, CAST(1 AS BIGINT) AS n_links, "
        "CAST(tc AS BIGINT) AS text_chars, CAST(4 AS BIGINT) AS link_text_chars, "
        "CAST(7 AS BIGINT) AS max_depth, "
        "CAST(round(10000.0 * 4 / tc) AS BIGINT) AS link_density_e4 FROM s"
    ),
    "html_tag_histogram": (
        "WITH c AS (SELECT count(*) AS total FROM documents) "
        "SELECT t.tag, CAST(t.m * c.total AS BIGINT) AS n FROM c, "
        "(VALUES ('html', 1), ('head', 1), ('title', 1), ('body', 1), "
        "('nav', 1), ('ul', 1), ('li', 1), ('a', 1), ('div', 1), "
        "('main', 1), ('article', 1), ('h1', 1), ('p', 2), ('footer', 1)"
        ") AS t(tag, m)"
    ),
    "html_first_div_content": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Heading ' || CAST(doc_id AS STRING) || text || "
        "CASE WHEN lang = 'en' THEN 'promoted' ELSE '' END AS div_text FROM documents"
    ),
    "html_outer_inner": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'<div id=\"doc-' || CAST(doc_id AS STRING) || '\" class=\"doc ' || lang || '\">'"
        " || '<main><article><h1>Heading ' || CAST(doc_id AS STRING) || '</h1>'"
        " || '<p class=\"body\">' || " + _DUCK_ESC + " || '</p>'"
        " || CASE WHEN lang = 'en' THEN '<!--promoted-->' ELSE '' END"
        " || '</article></main>' || '</div>' AS div_outer, "
        "'source ' || source AS fine_inner FROM documents"
    ),
    "html_selector_ir": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(CASE WHEN lang = 'en' THEN 4 ELSE 0 END AS BIGINT) AS n_promoted "
        "FROM documents"
    ),
    "html_table_scrape": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'k,v' || chr(10) || 'lang,' || lang || chr(10) || "
        "'source,' || source || chr(10) || "
        "'chars,' || CAST(n_chars AS STRING) || chr(10) AS csv FROM documents"
    ),
    "html_doc_content_text": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'T' || CAST(doc_id AS STRING) || chr(10) || chr(10) || "
        "'kvlang' || lang || 'source' || source || 'chars' || CAST(n_chars AS STRING) "
        "|| chr(10) || chr(10) AS doc_text FROM documents"
    ),
    "html_misnested": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'P' || CAST(doc_id AS STRING) || text AS p_text, "
        "CAST(2 AS BIGINT) AS n_b, "
        "'P' || CAST(doc_id AS STRING) AS clone_text, "
        "text AS tail_text FROM documents"
    ),
    "html_parse_errors": (
        # one adoption-agency error per page at the '</b>' offset:
        # len('<html><head><title>M')=20 + len(id) + 21 + '<b>B'(4)
        # + len(id) + '<p>P'(4) + len(id) = 49 + 3*len(id)
        # plus the injected '<?x?>' (processing-instruction) and '</>'
        # (empty-end-tag) tokenizer errors → 3 total, 2 tokenizer
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(3 AS BIGINT) AS n_errors, "
        "'adoption-agency' AS first_code, "
        "CAST(49 + 3 * length(CAST(doc_id AS STRING)) AS BIGINT) AS first_offset, "
        "CAST(2 AS BIGINT) AS n_tokenizer, CAST(1 AS BIGINT) AS n_tree "
        "FROM documents"
    ),
    "html_foreign_content": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'0 0 10 10' AS svg_viewbox, "
        "'S' || CAST(doc_id AS STRING) || text AS svg_text, "
        "text AS fo_div_text, "
        "'x' || CAST(doc_id AS STRING) AS mi_text, "
        "'A' || CAST(doc_id AS STRING) AS ax_text, "
        "CAST(4 AS BIGINT) AS n_svg_ns, "
        "CAST(3 AS BIGINT) AS n_math_ns FROM documents"
    ),
    "dedup_exact": (
        "SELECT substr(text, 1, 30) AS dup_key, CAST(min(doc_id) AS BIGINT) AS keep_id, "
        "CAST(count(*) AS BIGINT) AS n_dups FROM documents GROUP BY substr(text, 1, 30)"
    ),
    "dedup_ngram_jaccard": (
        f"WITH {_DUCK_SHINGLES}, "
        # mirror of dedup.ngram_jaccard_pairs df_cap=64
        "rare AS (SELECT sh FROM sh GROUP BY sh HAVING count(*) <= 64), "
        "shc AS (SELECT s.doc_id, s.sh FROM sh s JOIN rare USING (sh)), "
        "sizes AS (SELECT doc_id, count(*) AS n_sh FROM shc GROUP BY doc_id), "
        "shared AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS shared "
        "FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id "
        "GROUP BY a.doc_id, b.doc_id HAVING count(*) >= 5) "
        "SELECT CAST(a_id AS BIGINT) AS a, CAST(b_id AS BIGINT) AS b, "
        "CAST(round(10000.0 * shared / (sa.n_sh + sb.n_sh - shared)) AS BIGINT) AS jaccard_e4 "
        "FROM shared JOIN sizes sa ON shared.a_id = sa.doc_id "
        "JOIN sizes sb ON shared.b_id = sb.doc_id "
        "WHERE 1.0 * shared / (sa.n_sh + sb.n_sh - shared) >= 0.5"
    ),
    "dedup_minhash_lsh": _duck_minhash_cte(),
    "dedup_minhash_lsh32": _duck_minhash_cte(n_hashes=32, n_bands=8, min_equal=16),
    "incremental_dedup": (
        "WITH prior AS (SELECT DISTINCT md5(text) AS fp FROM documents "
        "WHERE doc_id < 250) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents "
        "WHERE doc_id >= 250 AND md5(text) NOT IN (SELECT fp FROM prior)"
    ),
    "dedup_lsh_between": _duck_minhash_between_cte(),
    "dedup_verified": (
        # LSH candidates re-scored with exact shingle Jaccard (mirror
        # of q_dedup_verified); inner sh CTE of the pairs subquery is
        # scoped, the outer one feeds the verify stage
        f"WITH pairs AS ({_duck_minhash_cte()}), "
        f"{_DUCK_SHINGLES}, "
        "sizes AS (SELECT doc_id, count(*) AS nsh FROM sh GROUP BY doc_id), "
        "inter AS (SELECT p.a, p.b, CAST(count(*) AS BIGINT) AS n_shared "
        "FROM pairs p JOIN sh sa ON sa.doc_id = p.a "
        "JOIN sh sb ON sb.doc_id = p.b AND sb.sh = sa.sh GROUP BY p.a, p.b), "
        "scored AS (SELECT i.a, i.b, i.n_shared, "
        "CAST(round(10000.0 * i.n_shared / (za.nsh + zb.nsh - i.n_shared)) AS BIGINT) "
        "AS jaccard_e4 FROM inter i "
        "JOIN sizes za ON za.doc_id = i.a JOIN sizes zb ON zb.doc_id = i.b) "
        "SELECT a, b, n_shared, jaccard_e4 FROM scored WHERE jaccard_e4 >= 5000"
    ),
    "dedup_components": _duck_components_sql(),
    "component_stats": (
        _duck_components_cte()
        + "SELECT CAST(size AS BIGINT) AS size, "
        "CAST(count(*) AS BIGINT) AS n_components FROM "
        "(SELECT component, count(*) AS size FROM comp GROUP BY component) "
        "GROUP BY size"
    ),
    "dedup_canonical": _duck_canonical_sql(),
    "repeated_windows": (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents "
        "WHERE len(string_split(text, ' ')) >= 20), "
        "flat AS (SELECT doc_id, md5(array_to_string(ws[j:j+19], ' ')) AS wh "
        "FROM ws, unnest(generate_series(1, len(ws) - 19)) AS t(j)) "
        "SELECT wh, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(count(*) AS BIGINT) AS n_occurrences "
        "FROM flat GROUP BY wh "
        "HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 1024"
    ),
    "repeated_spans": (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents "
        "WHERE len(string_split(text, ' ')) >= 20), "
        "flat AS (SELECT doc_id, j - 1 AS pos, "
        "md5(array_to_string(ws[j:j+19], ' ')) AS wh "
        "FROM ws, unnest(generate_series(1, len(ws) - 19)) AS t(j)), "
        "rep AS (SELECT wh FROM flat GROUP BY wh "
        "HAVING count(DISTINCT doc_id) >= 2 AND count(*) <= 1024) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(pos AS BIGINT) AS pos, "
        "flat.wh AS wh FROM flat JOIN rep USING (wh)"
    ),
    "oov_stats": (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS word FROM documents), "
        "c AS (SELECT word, count(*) AS n FROM w GROUP BY word), "
        "v AS (SELECT word FROM c ORDER BY n DESC, word LIMIT 16), "
        "t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents) "
        "SELECT CAST(t.doc_id AS BIGINT) AS doc_id, "
        "CAST(count(*) AS BIGINT) AS n_tokens, "
        "CAST(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, "
        "CAST(round(sum(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) * 10000.0 / count(*)) AS BIGINT) "
        "AS oov_ratio_e4 FROM t LEFT JOIN v ON t.word = v.word GROUP BY t.doc_id"
    ),
    "lm_coverage": (
        # top-64 corpus bigram LM; coverage = known-bigram share
        # (mirror of q_lm_coverage)
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents "
        "WHERE len(string_split(text, ' ')) >= 2), "
        "bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1), "
        "j -> ws[j] || ' ' || ws[j+1])) AS bigram FROM w), "
        "c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram), "
        "lm AS (SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 64), "
        "j AS (SELECT bg.doc_id, lm.n FROM bg LEFT JOIN lm USING (bigram)) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(count(*) AS BIGINT) AS n_bigrams, "
        "CAST(count(n) AS BIGINT) AS n_known, "
        "CAST(coalesce(sum(n), 0) AS BIGINT) AS known_mass, "
        "CAST(round(count(n) * 10000.0 / count(*)) AS BIGINT) AS coverage_e4 "
        "FROM j GROUP BY doc_id"
    ),
    "mixture_rates": (
        # 50/30/20 token-mixture calibration (mirror of q_mixture_rates)
        "WITH tok AS (SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) "
        "AS n_tokens FROM documents GROUP BY source), "
        "p AS (SELECT source, n_tokens, CAST(CASE source "
        "WHEN 'src0' THEN 5000 WHEN 'src1' THEN 3000 WHEN 'src2' THEN 2000 "
        "ELSE 0 END AS BIGINT) AS p_e4 FROM tok), "
        "q AS (SELECT * FROM p WHERE p_e4 > 0), "
        "b AS (SELECT n_tokens AS tb, p_e4 AS pb FROM q "
        "ORDER BY CAST(n_tokens AS DOUBLE) / p_e4, source LIMIT 1) "
        "SELECT source, n_tokens, "
        "CAST(least(10000, (10000 * p_e4 * tb) // (pb * n_tokens)) AS BIGINT) AS rate_e4 "
        "FROM q, b"
    ),
    "gopher_rules": (
        # mirror of q_gopher_rules over the md5-decorated sentence
        # corpus; every ratio is one e4 division of integers
        "WITH base AS (SELECT doc_id, array_to_string(list_transform("
        "list_transform(generate_series(1, len(string_split(text, ' ')), 8), "
        "j -> array_to_string(string_split(text, ' ')[j:j+7], ' ')), "
        "s -> CASE WHEN substr(md5(s), 1, 1) IN ('0', '1') THEN '- ' || s "
        "WHEN substr(md5(s), 1, 1) IN ('2', '3') THEN s || '...' "
        "ELSE s END), '. ') AS text FROM documents), "
        "m AS (SELECT doc_id, string_split(text, ' ') AS ws, "
        "string_split(text, '. ') AS ls, "
        "len(regexp_extract_all(text, '#')) + len(regexp_extract_all(text, '[.]{3}')) AS n_symbols "
        "FROM base), "
        "r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(ws) AS BIGINT) AS n_words, "
        "CAST(round(10000.0 * list_aggregate(list_transform(ws, w -> length(w)), 'sum') / len(ws)) AS BIGINT) AS mean_word_len_e4, "
        "CAST(round(10000.0 * n_symbols / len(ws)) AS BIGINT) AS symbol_ratio_e4, "
        "CAST(round(10000.0 * len(list_filter(ls, l -> l LIKE '- %' OR l LIKE '* %' OR l LIKE '• %')) / len(ls)) AS BIGINT) AS bullet_frac_e4, "
        "CAST(round(10000.0 * len(list_filter(ls, l -> l LIKE '%...')) / len(ls)) AS BIGINT) AS ellipsis_frac_e4, "
        "CAST(round(10000.0 * len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) / len(ws)) AS BIGINT) AS alpha_word_frac_e4, "
        "CAST((CASE WHEN list_contains(ws, 'the') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'be') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'to') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'of') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'and') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'that') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'have') THEN 1 ELSE 0 END) + "
        "(CASE WHEN list_contains(ws, 'with') THEN 1 ELSE 0 END) AS BIGINT) AS n_stopwords_present "
        "FROM m) "
        "SELECT *, CAST(CASE WHEN n_words >= 40 AND n_words <= 100000 "
        "AND mean_word_len_e4 >= 30000 AND mean_word_len_e4 <= 100000 "
        "AND symbol_ratio_e4 <= 1000 AND bullet_frac_e4 <= 9000 "
        "AND ellipsis_frac_e4 <= 3000 AND alpha_word_frac_e4 >= 8000 "
        "AND n_stopwords_present >= 1 THEN 1 ELSE 0 END AS BIGINT) AS gopher_pass "
        "FROM r"
    ),
    "mirror_hosts": (
        # mirror of q_mirror_hosts: distinct (host, fp), fp_cap=64
        # hot-fp guard, ordered pair self-join, Jaccard over per-host
        # fingerprint-set sizes
        "WITH d AS (SELECT " + _DUCK_HOST + " AS host, "
        "md5('shared content block ' || CAST(doc_id % 13 AS VARCHAR)) AS fp "
        "FROM documents), "
        "fps AS (SELECT DISTINCT host, fp FROM d), "
        "per_host AS (SELECT host, count(*) AS n_fps FROM fps GROUP BY host), "
        "cool AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= 64), "
        "f2 AS (SELECT fps.host, fps.fp FROM fps JOIN cool USING (fp)), "
        "pairs AS (SELECT a.host AS host_a, b.host AS host_b, "
        "CAST(count(*) AS BIGINT) AS n_shared "
        "FROM f2 a JOIN f2 b ON a.fp = b.fp AND a.host < b.host "
        "GROUP BY a.host, b.host HAVING count(*) >= 3) "
        "SELECT host_a, host_b, n_shared, "
        "CAST(round(n_shared * 10000.0 / (na.n_fps + nb.n_fps - n_shared)) AS BIGINT) "
        "AS jaccard_e4 "
        "FROM pairs JOIN per_host na ON pairs.host_a = na.host "
        "JOIN per_host nb ON pairs.host_b = nb.host"
    ),
    "remove_boilerplate": (
        # per-host footer strip (mirror of q_remove_boilerplate)
        "WITH d AS (SELECT doc_id, " + _DUCK_HOST + " AS host, "
        + _DUCK_SENT + " || '. visit ' || " + _DUCK_HOST + " || ' for more' AS text "
        "FROM documents), "
        "s AS (SELECT doc_id, host, unnest(string_split(text, '. ')) AS seg, "
        "unnest(generate_series(0, len(string_split(text, '. ')) - 1)) AS pos FROM d), "
        "bp AS (SELECT host, md5(seg) AS h FROM s GROUP BY host, md5(seg) "
        "HAVING count(DISTINCT doc_id) >= 3), "
        "bad AS (SELECT doc_id, pos FROM s JOIN bp "
        "ON s.host = bp.host AND md5(s.seg) = bp.h) "
        "SELECT CAST(s.doc_id AS BIGINT) AS doc_id, "
        "coalesce(string_agg(CASE WHEN bad.doc_id IS NULL THEN s.seg END, "
        "'. ' ORDER BY s.pos), '') AS clean_text, "
        "CAST(count(bad.doc_id) AS BIGINT) AS n_dropped "
        "FROM s LEFT JOIN bad ON s.doc_id = bad.doc_id AND s.pos = bad.pos "
        "GROUP BY s.doc_id"
    ),
    "select_token_budget": (
        # greedy budget prefix over LM-coverage scores (mirror of
        # q_select_token_budget; window cumsum is the oracle-side
        # formulation of the histogram+boundary plan)
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents "
        "WHERE len(string_split(text, ' ')) >= 2), "
        "bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1), "
        "j -> ws[j] || ' ' || ws[j+1])) AS bigram FROM w), "
        "c AS (SELECT bigram, count(*) AS n FROM bg GROUP BY bigram), "
        "lm AS (SELECT bigram, n FROM c ORDER BY n DESC, bigram LIMIT 64), "
        "j AS (SELECT bg.doc_id, lm.n FROM bg LEFT JOIN lm USING (bigram)), "
        "cov AS (SELECT doc_id, CAST(round(count(n) * 10000.0 / count(*)) AS BIGINT) "
        "AS score FROM j GROUP BY doc_id), "
        "base AS (SELECT d.doc_id, cov.score, "
        "CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tokens "
        "FROM documents d JOIN cov USING (doc_id)), "
        "o AS (SELECT doc_id, score, n_tokens, "
        "sum(n_tokens) OVER (ORDER BY score DESC, doc_id) AS cum FROM base) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, score, n_tokens "
        "FROM o WHERE cum <= 15000"
    ),
    "shard_frontier": (
        # mirror of q_shard_frontier: window cumdiv over the md5-ordered
        # per-host rank, budget = 60000 // ((1 + len(host) % 3) * 1000)
        "WITH f AS (SELECT source || '.example.com' AS host, "
        "'https://' || source || '.example.com/doc/' || CAST(doc_id AS STRING) AS url "
        "FROM documents), "
        "r AS (SELECT host, url, row_number() OVER "
        "(PARTITION BY host ORDER BY md5(url), url) AS fetch_rank FROM f), "
        "d AS (SELECT DISTINCT host, 60000 // ((1 + length(host) % 3) * 1000) "
        "AS fetch_budget FROM f) "
        "SELECT r.host, r.url, CAST(fetch_rank AS BIGINT) AS fetch_rank, "
        "CAST((fetch_rank - 1) // fetch_budget AS BIGINT) AS fetch_window "
        "FROM r JOIN d ON r.host = d.host"
    ),
    "crawl_schedule": (
        # mirror of q_crawl_schedule: delay = (1 + length(host) % 3) s
        "WITH hosts AS (SELECT DISTINCT source || '.example.com' AS host "
        "FROM documents), "
        "d AS (SELECT host, (1 + length(host) % 3) * 1000 AS crawl_delay_ms "
        "FROM hosts) "
        "SELECT host, CAST(crawl_delay_ms AS BIGINT) AS crawl_delay_ms, "
        "CAST(60000 // crawl_delay_ms AS BIGINT) AS fetch_budget FROM d"
    ),
    "corpus_report": (
        # mirror of q_corpus_report (thresholds = the quality_filter
        # family settings 40/100/7000)
        "WITH p AS (SELECT md5(text) AS fp, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks, "
        "CAST(length(text) AS BIGINT) AS nc, "
        "CASE WHEN " + _DUCK_IS_BAD + " THEN 0 ELSE 1 END AS ok, "
        + _DUCK_LANG_CASE + " AS lang FROM documents), "
        "a AS (SELECT count(*) AS n_docs, sum(n_toks) AS n_tokens, "
        "sum(nc) AS n_chars, count(DISTINCT fp) AS nd, sum(ok) AS nq, "
        "sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en, "
        "sum(CASE WHEN lang = 'es' THEN 1 ELSE 0 END) AS n_es, "
        "sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS n_de, "
        "sum(CASE WHEN lang = 'fr' THEN 1 ELSE 0 END) AS n_fr FROM p) "
        "SELECT CAST(n_docs AS BIGINT) AS n_docs, "
        "CAST(n_tokens AS BIGINT) AS n_tokens, "
        "CAST(n_chars AS BIGINT) AS n_chars, "
        "CAST(round(n_tokens * 10000.0 / n_docs) AS BIGINT) AS mean_doc_tokens_e4, "
        "CAST(nd AS BIGINT) AS n_distinct_md5, "
        "CAST(n_docs - nd AS BIGINT) AS n_exact_dup_docs, "
        "CAST(nq AS BIGINT) AS n_quality_pass, "
        "CAST(n_en AS BIGINT) AS n_en, CAST(n_es AS BIGINT) AS n_es, "
        "CAST(n_de AS BIGINT) AS n_de, CAST(n_fr AS BIGINT) AS n_fr FROM a"
    ),
    "vocab_drift": (
        # mirror of q_vocab_drift: TV distance over the union top-16
        # vocabulary + OOV buckets, one final division
        "WITH wa AS (SELECT w AS word, count(*) AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id < 250) "
        "GROUP BY w), "
        "wb AS (SELECT w AS word, count(*) AS c FROM "
        "(SELECT unnest(string_split(text, ' ')) AS w FROM documents WHERE doc_id >= 250) "
        "GROUP BY w), "
        "va AS (SELECT word FROM wa ORDER BY c DESC, word LIMIT 16), "
        "vb AS (SELECT word FROM wb ORDER BY c DESC, word LIMIT 16), "
        "uni AS (SELECT DISTINCT word FROM "
        "(SELECT word FROM va UNION ALL SELECT word FROM vb)), "
        "j AS (SELECT coalesce(wa.c, 0) AS ca, coalesce(wb.c, 0) AS cb "
        "FROM uni LEFT JOIN wa USING (word) LEFT JOIN wb USING (word)), "
        "tot AS (SELECT (SELECT sum(c) FROM wa) AS ta, (SELECT sum(c) FROM wb) AS tb), "
        "core AS (SELECT count(*) AS n_vocab, sum(abs(ca * tb - cb * ta)) AS s_in, "
        "sum(ca) AS ia, sum(cb) AS ib, any_value(ta) AS ta, any_value(tb) AS tb "
        "FROM j, tot) "
        "SELECT CAST(n_vocab AS BIGINT) AS n_vocab, "
        "CAST(ta AS BIGINT) AS n_words_a, CAST(tb AS BIGINT) AS n_words_b, "
        "CAST(round((s_in + abs((ta - ia) * tb - (tb - ib) * ta)) * 10000.0 "
        "/ (2 * ta * tb)) AS BIGINT) AS tv_distance_e4 FROM core"
    ),
    "repeated_window_stats": (
        "WITH ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents "
        "WHERE len(string_split(text, ' ')) >= 20), "
        "flat AS (SELECT doc_id, md5(array_to_string(ws[j:j+19], ' ')) AS wh "
        "FROM ws, unnest(generate_series(1, len(ws) - 19)) AS t(j)), "
        "per AS (SELECT wh, count(DISTINCT doc_id) AS nd, count(*) AS no "
        "FROM flat GROUP BY wh) "
        "SELECT CAST(count(*) AS BIGINT) AS n_window_hashes, "
        "CAST(sum(CASE WHEN nd >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_repeated, "
        "CAST(sum(CASE WHEN nd >= 2 AND no > 1024 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped, "
        "CAST(coalesce(sum(CASE WHEN nd >= 2 AND no > 1024 THEN no ELSE 0 END), 0) AS BIGINT) "
        "AS occurrences_capped FROM per"
    ),
    "decontaminate": (
        # 13-gram benchmark decontamination; eval texts = words 5..40
        # of every 41st doc (mirror of q_decontaminate)
        "WITH ev AS (SELECT array_to_string(string_split(text, ' ')[5:40], ' ') AS text "
        "FROM documents WHERE doc_id % 41 = 0), "
        "eg AS (SELECT DISTINCT unnest(list_distinct(list_transform("
        "generate_series(1, len(string_split(text, ' ')) - 12), "
        "j -> array_to_string(string_split(text, ' ')[j:j+12], ' ')))) AS gram "
        "FROM ev WHERE len(string_split(text, ' ')) >= 13), "
        "dg AS (SELECT doc_id, unnest(list_distinct(list_transform("
        "generate_series(1, len(string_split(text, ' ')) - 12), "
        "j -> array_to_string(string_split(text, ' ')[j:j+12], ' ')))) AS gram "
        "FROM documents WHERE len(string_split(text, ' ')) >= 13) "
        "SELECT CAST(dg.doc_id AS BIGINT) AS doc_id, "
        "CAST(count(*) AS BIGINT) AS n_contaminated "
        "FROM dg JOIN eg USING (gram) GROUP BY dg.doc_id"
    ),
    "decontaminate_sentences": (
        # 8-gram sentence-level decontamination over the re-chunked
        # 8-word-sentence corpus; eval = words 17..24 of every 37th doc
        # (mirror of q_decontaminate_sentences); zipped unnest gives
        # the 0-based sentence position
        "WITH sdocs AS (SELECT doc_id, array_to_string(list_transform("
        "generate_series(1, len(string_split(text, ' ')), 8), "
        "j -> array_to_string(string_split(text, ' ')[j:j+7], ' ')), '. ') AS text "
        "FROM documents), "
        "ev AS (SELECT array_to_string(string_split(text, ' ')[17:24], ' ') AS text "
        "FROM documents WHERE doc_id % 37 = 0), "
        "eg AS (SELECT DISTINCT unnest(list_distinct(list_transform("
        "generate_series(1, len(string_split(text, ' ')) - 7), "
        "j -> array_to_string(string_split(text, ' ')[j:j+7], ' ')))) AS gram "
        "FROM ev WHERE len(string_split(text, ' ')) >= 8), "
        "s AS (SELECT doc_id, unnest(string_split(text, '. ')) AS sent, "
        "unnest(generate_series(0, len(string_split(text, '. ')) - 1)) AS pos "
        "FROM sdocs), "
        "sg AS (SELECT doc_id, pos, unnest(list_distinct(list_transform("
        "generate_series(1, len(string_split(sent, ' ')) - 7), "
        "j -> array_to_string(string_split(sent, ' ')[j:j+7], ' ')))) AS gram "
        "FROM s WHERE len(string_split(sent, ' ')) >= 8), "
        "bad AS (SELECT DISTINCT doc_id, pos FROM sg JOIN eg USING (gram)) "
        "SELECT CAST(s.doc_id AS BIGINT) AS doc_id, "
        "coalesce(string_agg(CASE WHEN bad.doc_id IS NULL THEN s.sent END, "
        "'. ' ORDER BY s.pos), '') AS clean_text, "
        "CAST(count(bad.doc_id) AS BIGINT) AS n_dropped "
        "FROM s LEFT JOIN bad ON s.doc_id = bad.doc_id AND s.pos = bad.pos "
        "GROUP BY s.doc_id"
    ),
    "lsh_bucket_stats": _duck_lsh_stats_cte(),
    "shingle_df_stats": _DUCK_SHINGLE_STATS,
    "simhash": _duck_simhash_sql(),
    "simhash_pairs": _duck_simhash_pairs_sql(),
    "ann_cosine_topk": _DUCK_EXACT_TOPK,
    "ann_lsh_topk": _duck_lsh_topk_sql(),
    "ann_lsh_recall": _duck_lsh_recall_sql(),
    "ann_ivf_topk": _duck_ivf_topk_sql(),
    "ann_ivf_recall": _duck_ivf_recall_sql(),
    "multimodal_image_features": _duck_multimodal_sql(),
    "embedding_near_dup": _duck_near_dup_sql(),
    "semantic_dedup": _duck_semantic_dedup_sql(),
    "quality_classifier": _duck_quality_classifier_sql(),
    "cms_heavy_hitters": _duck_cms_sql(),
    "kmv_distinct": _DUCK_KMV,
    "pagerank": _duck_pagerank_sql(),
    "hits": _duck_hits_sql(),
    "degree_stats": (
        "WITH edges AS (SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a "
        "JOIN documents b ON b.doc_id = (a.doc_id * 17 + 3) % 512), "
        "o AS (SELECT src AS node, count(*) AS degree FROM edges GROUP BY src), "
        "i AS (SELECT dst AS node, count(*) AS degree FROM edges GROUP BY dst) "
        "SELECT 'out' AS direction, CAST(degree AS BIGINT) AS degree, "
        "CAST(count(*) AS BIGINT) AS n_nodes FROM o GROUP BY degree "
        "UNION ALL "
        "SELECT 'in' AS direction, CAST(degree AS BIGINT) AS degree, "
        "CAST(count(*) AS BIGINT) AS n_nodes FROM i GROUP BY degree"
    ),
    "top_docs_per_source": (
        "WITH r AS (SELECT doc_id, source, n_chars, row_number() OVER "
        "(PARTITION BY source ORDER BY -n_chars, doc_id) AS rk FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, source, "
        "CAST(n_chars AS BIGINT) AS n_chars FROM r WHERE rk <= 5"
    ),
    "pdf_text": _DUCK_PDF_TEXT,
    # WARC round trip lands on the same extracted text as the direct
    # html path — the archive adds framing, not content
    "warc_extract": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Heading ' || CAST(doc_id AS STRING) || text AS main_text FROM documents"
    ),
    "html_css_select": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Heading ' || CAST(doc_id AS STRING) AS h1_text, "
        "text AS body_text, "
        "'source ' || source AS fine_text, "
        "'https://site.example/' || CAST(doc_id AS STRING) AS home_href "
        "FROM documents"
    ),
    "head_meta": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'Doc ' || CAST(doc_id AS STRING) AS title, "
        "'https://' || source || '.example.com/doc/' || CAST(doc_id % 100 AS STRING) AS canonical, "
        "CASE WHEN doc_id % 10 = 3 THEN 'noindex,nofollow' ELSE 'index,follow' END AS robots, "
        "(doc_id % 10 <> 3) AS indexable "
        "FROM documents"
    ),
    "canonical_collapse": (
        "SELECT canonical, MIN(doc_id) AS rep_doc_id, "
        "COUNT(*) AS n_members, "
        "CAST(SUM(CASE WHEN doc_id % 10 <> 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_indexable "
        "FROM (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'https://' || source || '.example.com/doc/' || CAST(doc_id % 100 AS STRING) AS canonical "
        "FROM documents) GROUP BY canonical"
    ),
    "charset_extract": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'utf-8' "
        "  WHEN 2 THEN 'utf-16le' ELSE 'windows-1252' END AS encoding, "
        "CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'meta' WHEN 1 THEN 'meta' "
        "  WHEN 2 THEN 'bom' ELSE 'default' END AS enc_src, "
        "'Doc ' || CAST(doc_id AS STRING) AS title, "
        "'café nº ' || CAST(doc_id AS STRING) AS text "
        "FROM documents"
    ),
    # expected markdown is closed-form: blocks joined by blank lines;
    # the text paragraph mirrors the serializer's whitespace collapse
    "html_markdown": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'# Title ' || CAST(doc_id AS STRING) || chr(10) || chr(10) || "
        "trim(regexp_replace(text, '\\s+', ' ', 'g')) || chr(10) || chr(10) || "
        "'Intro **bold ' || CAST(doc_id AS STRING) || '** and "
        "[link](https://x/' || CAST(doc_id AS STRING) || ').' || chr(10) || chr(10) || "
        "'- alpha' || chr(10) || '- beta ' || CAST(doc_id AS STRING) || chr(10) || chr(10) || "
        "'```' || chr(10) || 'code ' || CAST(doc_id AS STRING) || chr(10) || '```' || chr(10) || chr(10) || "
        "'> quote ' || CAST(doc_id AS STRING) AS markdown "
        "FROM documents"
    ),
    "page_meta": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'OG Doc ' || CAST(doc_id AS STRING) AS og_title, "
        "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'article' "
        "  WHEN 1 THEN 'website' ELSE 'video.other' END AS og_type, "
        "'2024-' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') "
        "  || '-01T00:00:00Z' AS published, "
        "CASE WHEN doc_id % 2 = 0 THEN 'NewsArticle' END AS ld_type, "
        "CASE WHEN doc_id % 2 = 0 THEN 'Doc ' || CAST(doc_id AS STRING) END AS ld_headline, "
        "CASE WHEN doc_id % 2 = 0 THEN "
        "  '2024-' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '-01' "
        "END AS ld_published "
        "FROM documents"
    ),
    # gumbobot: Disallow /doc/*1$ with a tie-length Allow /doc/11$
    # (RFC 9309 allow-wins-ties) → blocked iff id ends in 1, except 11
    "robots_gate": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'https://' || source || '.example.com/doc/' || CAST(doc_id AS STRING) AS url, "
        "(CAST(doc_id AS STRING) NOT LIKE '%1' OR doc_id = 11) AS crawl_allowed "
        "FROM documents"
    ),
    "anchor_texts": (
        "WITH pairs AS ("
        "  SELECT 'https://site.example/doc/' || CAST(doc_id % 100 AS STRING) AS href, "
        "         'ref ' || CAST(doc_id % 100 AS STRING) AS anchor_text FROM documents "
        "  UNION ALL "
        "  SELECT 'https://site.example/doc/' || CAST((doc_id * 7) % 100 AS STRING), "
        "         'see also' FROM documents) "
        "SELECT href, COUNT(*) AS n_refs, "
        "CAST(COUNT(DISTINCT anchor_text) AS BIGINT) AS n_texts, "
        "MIN(anchor_text) AS min_text FROM pairs GROUP BY href"
    ),
    "url_features": (
        "WITH u AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source, "
        "  CASE CAST(doc_id % 3 AS INT) "
        "  WHEN 0 THEN 'https://' || source || '.example.com/doc/' || CAST(doc_id AS STRING) "
        "    || '?utm_source=x&ref=' || CAST(doc_id AS STRING) "
        "  WHEN 1 THEN 'http://' || source || '.example.com/a/b/doc/' || CAST(doc_id AS STRING) "
        "  ELSE 'https://' || source || '.example.com/' END AS url "
        "  FROM documents) "
        "SELECT doc_id, url, source || '.example.com' AS host, 'com' AS tld, "
        "CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 2 WHEN 1 THEN 4 ELSE 0 END AS BIGINT) AS path_depth, "
        "CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 0 END AS BIGINT) AS n_params, "
        "(doc_id % 3 <> 1) AS is_https, "
        "(doc_id % 3 = 0) AS has_tracking, "
        "CAST(length(url) AS BIGINT) AS url_len "
        "FROM u"
    ),
    "sitemap_frontier": (
        "SELECT source || '.example.com' AS host, "
        "'https://' || source || '.example.com/doc/' || CAST(doc_id AS STRING) AS loc, "
        "'2024-' || lpad(CAST(doc_id % 12 + 1 AS STRING), 2, '0') || '-01' AS lastmod, "
        "CAST('0.' || CAST(doc_id % 10 AS STRING) AS DOUBLE) AS priority, "
        "(CAST(doc_id AS STRING) NOT LIKE '%1' OR doc_id = 11) AS crawl_allowed "
        "FROM documents"
    ),
    # density winner = <article> (nav/footer excluded → body/div/main/
    # article tie on score, smallest subtree wins); candidates left
    # after exclusion: body, div.doc, main, article
    "html_density_extract": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "'article' AS block_tag, "
        "'Heading ' || CAST(doc_id AS STRING) || text AS block_text, "
        "CAST(length('Heading ' || CAST(doc_id AS STRING) || text) AS BIGINT) AS text_chars, "
        "CAST(0 AS BIGINT) AS link_chars, "
        "CAST(4 AS BIGINT) AS n_candidates "
        "FROM documents"
    ),
    "shard_manifest": _DUCK_SHARD_MANIFEST,
    "multiformat_text": _DUCK_MULTIFORMAT,
    "length_quantiles": _DUCK_LENGTH_QUANTILES,
    "grouped_quantiles": _DUCK_GROUPED_QUANTILES,
    "word_freq_histogram": (
        "SELECT CAST(freq AS BIGINT) AS freq, CAST(count(*) AS BIGINT) AS n_words FROM ("
        "SELECT word, count(*) AS freq FROM ("
        "SELECT unnest(string_split(text, ' ')) AS word FROM documents) GROUP BY word"
        ") GROUP BY freq"
    ),
    "holdout_split": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, source, "
        f"CASE WHEN ('0x' || substr(md5(source), 1, 8))::BIGINT < {(10 * (1 << 32)) // 100} "
        "THEN 'val' ELSE 'train' END AS split FROM documents"
    ),
    "link_graph": (
        "SELECT source || '.example.com' AS src_host, "
        "'site.example' AS dst_host, CAST(count(*) AS BIGINT) AS n_links "
        "FROM documents GROUP BY source"
    ),
    "text_quality": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(round(10000.0 * (length(text) - len(string_split(text, ' ')) + 1) "
        "/ len(string_split(text, ' '))) AS BIGINT) AS avg_token_len_e4, "
        "CAST(round(10000.0 * len(list_filter(string_split(text, ' '), "
        "w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for'))) "
        "/ len(string_split(text, ' '))) AS BIGINT) AS stopword_ratio_e4, "
        "CAST(round(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) "
        "/ length(text)) AS BIGINT) AS alpha_ratio_e4 FROM documents"
    ),
    "lang_id": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CASE "
        "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) "
        "AND len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) "
        "AND len(list_filter(string_split(text, ' '), w -> w IN ('the','is','and','of'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'en' "
        "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) "
        "AND len(list_filter(string_split(text, ' '), w -> w IN ('el','la','de','que'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'es' "
        "WHEN len(list_filter(string_split(text, ' '), w -> w IN ('der','die','und','das'))) >= len(list_filter(string_split(text, ' '), w -> w IN ('le','la','de','les'))) THEN 'de' "
        "ELSE 'fr' END AS pred_lang FROM documents"
    ),
    "normalize_text": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), "
        "' +', ' ', 'g')) AS norm_text FROM documents"
    ),
    "scrub_pii": (
        "WITH d AS (SELECT doc_id, CASE "
        "WHEN doc_id % 3 = 0 THEN text || ' contact user' || CAST(doc_id AS STRING) || '@mail.example.org now' "
        "WHEN doc_id % 3 = 1 THEN text || ' call +1 (555) 010-' || substr(CAST(10000 + doc_id AS STRING), 2, 4) || ' today' "
        "ELSE text END AS text FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "regexp_replace(regexp_replace(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}', '<EMAIL>', 'g'), "
        "'[+]?[0-9][0-9() -]{7,}[0-9]', '<PHONE>', 'g') AS clean_text, "
        "CAST(len(regexp_extract_all(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+[.][a-zA-Z]{2,}')) AS BIGINT) AS n_emails, "
        "CAST(len(regexp_extract_all(text, '[+]?[0-9][0-9() -]{7,}[0-9]')) AS BIGINT) AS n_phones "
        "FROM d"
    ),
    "quality_filter": (
        "WITH s AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens, "
        "CAST(round(10000.0 * len(list_filter(string_split(text, ' '), "
        "w -> w IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'on', 'for'))) "
        "/ len(string_split(text, ' '))) AS BIGINT) AS stop_e4, "
        "CAST(round(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) "
        "/ length(text)) AS BIGINT) AS alpha_e4 FROM documents) "
        "SELECT doc_id, n_tokens FROM s "
        "WHERE n_tokens >= 40 AND stop_e4 >= 100 AND alpha_e4 >= 7000"
    ),
    "doc_fingerprints": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, md5(text) AS fp_md5, "
        "list_aggregate(list_transform(generate_series(1, greatest(length(text) - 7, 1), 4), "
        "j -> md5(substr(text, j, 8))), 'min') AS fp_winnow FROM documents"
    ),
    "sample_by_hash": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(n_chars AS BIGINT) AS n_chars "
        "FROM documents "
        f"WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT < {(1000 * (1 << 32)) // 10000}"
    ),
    "stratified_sample": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, source FROM documents "
        "WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT < "
        "((CASE source "
        + " ".join(
            f"WHEN '{s}' THEN {r}" for s, r in sorted(STRATA_RATES_E4.items())
        )
        + f" ELSE 0 END) * {1 << 32}) // 10000"
    ),
    "cap_per_host": (
        "WITH d AS (SELECT doc_id, source || '.example.com' AS host FROM documents), "
        "r AS (SELECT doc_id, host, row_number() OVER "
        "(PARTITION BY host ORDER BY md5(CAST(doc_id AS STRING)), doc_id) AS rk FROM d) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, host FROM r WHERE rk <= 15"
    ),
    "repetition_stats": (
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
        "e AS (SELECT doc_id, unnest(ws) AS g FROM w), "
        "tw AS (SELECT doc_id, max(c) AS top_word_n, count(*) AS n_distinct FROM "
        "(SELECT doc_id, g, count(*) AS c FROM e GROUP BY doc_id, g) GROUP BY doc_id), "
        "bg AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ws) - 1), "
        "j -> ws[j] || ' ' || ws[j+1])) AS g FROM w), "
        "tb AS (SELECT doc_id, max(c) AS top_bigram_n FROM "
        "(SELECT doc_id, g, count(*) AS c FROM bg GROUP BY doc_id, g) GROUP BY doc_id) "
        "SELECT CAST(w.doc_id AS BIGINT) AS doc_id, "
        "CAST(round(10000.0 * tw.n_distinct / len(w.ws)) AS BIGINT) AS distinct_ratio_e4, "
        "CAST(round(10000.0 * tw.top_word_n / len(w.ws)) AS BIGINT) AS top_word_frac_e4, "
        "CAST(round(10000.0 * tb.top_bigram_n / (len(w.ws) - 1)) AS BIGINT) AS top_bigram_frac_e4 "
        "FROM w JOIN tw ON w.doc_id = tw.doc_id JOIN tb ON w.doc_id = tb.doc_id"
    ),
    "dedup_paragraphs": (
        "WITH ch AS (SELECT doc_id, unnest(list_transform("
        "generate_series(1, len(string_split(text, ' ')), 10), "
        "j -> array_to_string(string_split(text, ' ')[j:j+9], ' '))) AS chunk "
        "FROM documents) "
        "SELECT md5(chunk) AS chunk_md5, "
        "CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs, "
        "CAST(min(doc_id) AS BIGINT) AS keep_doc "
        "FROM ch GROUP BY md5(chunk) HAVING count(DISTINCT doc_id) > 1"
    ),
    "canonical_urls": (
        "WITH u AS (SELECT doc_id, CASE "
        "WHEN doc_id % 3 = 0 THEN 'https://Site.Example/p/' || CAST(doc_id AS STRING) || '?utm_source=feed&x=1#frag' "
        "WHEN doc_id % 3 = 1 THEN 'https://site.example/p/' || CAST(doc_id AS STRING) || '?utm_campaign=a' "
        "ELSE 'https://site.example/p/' || CAST(doc_id AS STRING) || '?x=2' END AS url FROM documents), "
        "s AS (SELECT doc_id, url, regexp_replace(regexp_replace(regexp_replace("
        "regexp_replace(url, '#.*', ''), "
        "'[?]utm_[a-z]+=[^&#]*[&]', '?'), '[&]utm_[a-z]+=[^&#]*', ''), "
        "'[?]utm_[a-z]+=[^&#]*$', '') AS p3 FROM u), "
        "h AS (SELECT doc_id, url, p3, regexp_extract(p3, '^[a-zA-Z]+://[^/]*', 0) AS hp FROM s) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "lower(hp) || substring(p3, length(hp) + 1) AS canon_url, "
        "CAST(CASE WHEN regexp_matches(url, '[?&]utm_') THEN 1 ELSE 0 END AS BIGINT) AS had_tracking "
        "FROM h"
    ),
    "token_counts": (
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(len(string_split_regex(text, ' +')) AS BIGINT) AS ws_tokens, "
        "CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS word_tokens "
        "FROM documents"
    ),
    "host_stats": (
        "WITH pages AS (SELECT doc_id, source || '.example.com' AS host, "
        "length(" + _DUCK_PREFIX_LEN.replace("length(", "", 1)[:-1] + " || "
        + _DUCK_ESC + " || '</p>'"
        " || CASE WHEN lang = 'en' THEN '<!--promoted-->' ELSE '' END"
        " || '</article></main></div>'"
        " || '<footer><p class=\"fine\">source ' || source || '</p></footer>'"
        " || '</body></html>') AS html_len FROM documents) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_pages, "
        "CAST(sum(html_len) AS BIGINT) AS html_bytes, "
        "CAST(min(doc_id) AS BIGINT) AS first_doc FROM pages GROUP BY host"
    ),
    "host_quality_stats": (
        "WITH d AS (SELECT doc_id, text, "
        "source || '-' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host "
        "FROM documents), "
        "s AS (SELECT host, CASE WHEN " + _DUCK_IS_BAD + " THEN 1 ELSE 0 END AS is_bad "
        "FROM d) "
        "SELECT host, CAST(count(*) AS BIGINT) AS n_docs, "
        "CAST(sum(is_bad) AS BIGINT) AS n_bad, "
        "CAST(round(10000.0 * sum(is_bad) / count(*)) AS BIGINT) AS bad_frac_e4 "
        "FROM s GROUP BY host"
    ),
    "host_quality_gate": (
        "WITH d AS (SELECT doc_id, text, "
        "source || '-' || CAST(doc_id % 5 AS VARCHAR) || '.example.com' AS host "
        "FROM documents), "
        "s AS (SELECT host, CASE WHEN " + _DUCK_IS_BAD + " THEN 1 ELSE 0 END AS is_bad "
        "FROM d), "
        "h AS (SELECT host, count(*) AS n_docs, sum(is_bad) AS n_bad FROM s GROUP BY host), "
        "blocked AS (SELECT host FROM h WHERE n_docs >= 3 AND n_bad * 10000 > n_docs * 3500) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, host FROM d "
        "WHERE host NOT IN (SELECT host FROM blocked)"
    ),
    "top_terms": (
        "WITH w AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents) "
        "SELECT term, CAST(count(*) AS BIGINT) AS n FROM w "
        "GROUP BY term ORDER BY n DESC, term LIMIT 20"
    ),
    "lineitem_agg": (
        "SELECT l_returnflag, l_linestatus, "
        "CAST(round(sum(l_quantity)) AS BIGINT) AS sum_qty, "
        "CAST(round(sum(l_extendedprice) * 100) AS BIGINT) AS sum_price_e2, "
        "CAST(count(*) AS BIGINT) AS n_rows "
        "FROM lineitem WHERE l_shipdate < TIMESTAMP '2025-06-01' "
        "GROUP BY l_returnflag, l_linestatus"
    ),
    "revenue_by_nation": (
        "SELECT n_name, "
        "CAST(round(sum(l_extendedprice * (1 - l_discount))) AS BIGINT) AS revenue, "
        "CAST(count(*) AS BIGINT) AS n_items "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' "
        "AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name"
    ),
    "top_orders_per_segment": (
        "WITH j AS (SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice "
        "FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey), "
        "r AS (SELECT c_mktsegment, o_orderkey, row_number() OVER "
        "(PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rank FROM j) "
        "SELECT c_mktsegment, CAST(o_orderkey AS BIGINT) AS o_orderkey, "
        "CAST(rank AS BIGINT) AS rank FROM r WHERE rank <= 3"
    ),
    "events_hourly": (
        "SELECT event_type, date_trunc('hour', ts) AS h, "
        "CAST(count(*) AS BIGINT) AS n, "
        "CAST(round(sum(value) * 100) AS BIGINT) AS sum_value_e2 "
        "FROM events GROUP BY event_type, date_trunc('hour', ts)"
    ),
    "events_props_json": (
        "SELECT event_type, "
        "CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k, "
        "CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k, "
        "CAST(count(*) AS BIGINT) AS n FROM events GROUP BY event_type"
    ),
    "events_retention": (
        "WITH d AS (SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day "
        "FROM events), "
        "c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id) "
        "SELECT c.cohort_day, CAST(date_diff('day', c.cohort_day, d.day) AS BIGINT) "
        "AS age_days, CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_users "
        "FROM d JOIN c ON d.user_id = c.user_id GROUP BY 1, 2"
    ),
    "events_sessions": (
        "WITH flagged AS (SELECT user_id, event_id, ts, "
        "CASE WHEN lag(ts) OVER w IS NULL THEN 0 "
        "WHEN CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) > 1800 THEN 1 "
        "ELSE 0 END AS new_sess FROM events "
        "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)), "
        "sess AS (SELECT user_id, ts, sum(new_sess) OVER "
        "(PARTITION BY user_id ORDER BY ts, event_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id FROM flagged) "
        "SELECT CAST(user_id AS BIGINT) AS user_id, CAST(session_id AS BIGINT) AS session_id, "
        "CAST(count(*) AS BIGINT) AS n_events, "
        "CAST(floor(epoch(max(ts))) - floor(epoch(min(ts))) AS BIGINT) AS dur_s "
        "FROM sess GROUP BY user_id, session_id"
    ),
    "pack_sequences": (
        # mirror of packing.pack_sequences(seq_len=64, n_shards=8):
        # shard-partitioned running token offset, floor-mapped to
        # sequence ids
        "WITH t AS (SELECT doc_id, doc_id % 8 AS shard, "
        "len(string_split(text, ' ')) AS n_tokens FROM documents), "
        "c AS (SELECT doc_id, shard, n_tokens, "
        "coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start_tok FROM t) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(shard AS BIGINT) AS shard, "
        "CAST(n_tokens AS BIGINT) AS n_tokens, CAST(start_tok AS BIGINT) AS start_tok, "
        "CAST(floor(start_tok / 64) AS BIGINT) AS first_seq, "
        "CAST(floor((start_tok + n_tokens - 1) / 64) AS BIGINT) AS last_seq, "
        "CAST(floor((start_tok + n_tokens - 1) / 64) - floor(start_tok / 64) + 1 "
        "AS BIGINT) AS n_seqs FROM c"
    ),
    "chunk_tokens": (
        # mirror of packing.chunk_tokens(width=12, stride=8)
        "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(floor((j - 1) / 8) AS BIGINT) AS chunk_id, "
        "CAST(j - 1 AS BIGINT) AS start_tok, "
        "CAST(least(12, len(ws) - j + 1) AS BIGINT) AS n_chunk_tokens, "
        "array_to_string(ws[j:j+11], ' ') AS chunk "
        "FROM w, unnest(generate_series(1, len(ws), 8)) AS t(j)"
    ),
    "tfidf_top_terms": (
        "WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), "
        "tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY doc_id, word), "
        "dfs AS (SELECT word, count(*) AS df FROM tf GROUP BY word), "
        "sc AS (SELECT doc_id, tf.word AS word, tf, df, "
        "CAST(round(10000.0 * tf / df) AS BIGINT) AS score_e4 FROM tf JOIN dfs USING (word)), "
        "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id "
        "ORDER BY score_e4 DESC, word) AS rank FROM sc) "
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, word, CAST(tf AS BIGINT) AS tf, "
        "CAST(df AS BIGINT) AS df, score_e4, CAST(rank AS BIGINT) AS rank "
        "FROM r WHERE rank <= 3"
    ),
    "importance_sample": (
        # keep ⇔ u32(md5(doc_id)) · 10000 < weight_e4 · 2^32
        "SELECT CAST(doc_id AS BIGINT) AS doc_id, "
        "CAST(round(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) "
        "/ length(text)) AS BIGINT) AS weight_e4 FROM documents "
        "WHERE ('0x' || substr(md5(CAST(doc_id AS STRING)), 1, 8))::BIGINT * 10000 < "
        "CAST(round(10000.0 * length(regexp_replace(text, '[^a-z]', '', 'g')) "
        "/ length(text)) AS BIGINT) * 4294967296"
    ),
    "decontaminate_fuzzy": _duck_fuzzy_contamination_sql(),
}
