"""Driver-facing queries: corpus-curation wave — duplicate-cluster
resolution (connected components over LSH candidate pairs),
cross-document chunk dedup (the paragraph-level CCNet shape), HTML
boilerplate stripping, and URL normalization/domain statistics.

Synthetic inputs (planted markup, planted URLs) are deterministic
functions of doc_id/source so the Spark plan and DuckDB oracle see
identical data; same aliasing/rounding conventions as queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import text as T
from .operators import dedup as DD
from .operators.graph import dedup_clusters
from .queries import query
from .queries_llm import NEAR_DUP_SQL, NORM_SQL, _minhash_sql, _near_dup_corpus
from .sources.tables import read_table

# ---------------------------------------------------------------------------
# dd9 — duplicate clusters (connected components over LSH candidates)
# ---------------------------------------------------------------------------

_PAIRS_SQL = f"""
    WITH sigs AS ({_minhash_sql(8, NEAR_DUP_SQL)}),
    buckets AS (
      SELECT doc_id, 0 AS band_id,
             md5(CAST(mh0 AS VARCHAR) || '_' || CAST(mh1 AS VARCHAR) || '_' ||
                 CAST(mh2 AS VARCHAR) || '_' || CAST(mh3 AS VARCHAR)) AS band_hash
      FROM sigs
      UNION ALL
      SELECT doc_id, 1 AS band_id,
             md5(CAST(mh4 AS VARCHAR) || '_' || CAST(mh5 AS VARCHAR) || '_' ||
                 CAST(mh6 AS VARCHAR) || '_' || CAST(mh7 AS VARCHAR)) AS band_hash
      FROM sigs
    )
    SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b
    FROM buckets l JOIN buckets r
      ON l.band_id = r.band_id AND l.band_hash = r.band_hash AND l.doc_id < r.doc_id
"""


@query(
    "dd9_dup_clusters",
    f"""
    WITH RECURSIVE pairs AS ({_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
    ),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    cc AS (
      SELECT node, node AS comp FROM nodes
      UNION
      SELECT e.dst AS node, cc.comp FROM cc JOIN edges e ON cc.node = e.src
    ),
    lab AS (SELECT node, MIN(comp) AS comp FROM cc GROUP BY node),
    sz AS (SELECT comp, COUNT(*) AS cluster_size FROM lab GROUP BY comp)
    SELECT lab.node AS doc_id, lab.comp AS cluster_id, sz.cluster_size,
           (lab.node = lab.comp) AS is_canonical
    FROM lab JOIN sz USING (comp)
    """,
)
def dd9_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd9 — near-dup *cluster* resolution: MinHash-LSH candidate
    pairs (dd3) resolved into connected components, each cluster's
    minimum doc_id elected canonical survivor. Pairs alone can't drive
    dedup (A~B, B~C must drop only two of {A,B,C}); components make
    the keep/drop decision transitive and deterministic. Spark side is
    iterative min-label propagation — joins + hash aggregates with
    per-sweep lineage truncation (operators/graph.py); the oracle is
    the same fixpoint via a recursive CTE."""
    sigs = DD.minhash_signatures(_near_dup_corpus(spark, sf_dir), num_hashes=8)
    pairs = DD.minhash_lsh_candidates(sigs, num_hashes=8, bands=2)
    return dedup_clusters(pairs)


# ---------------------------------------------------------------------------
# dd10 — cross-document chunk dedup (paragraph-level CCNet shape)
# ---------------------------------------------------------------------------

@query(
    "dd10_chunk_dedup",
    f"""
    WITH w AS (SELECT doc_id, string_split({NORM_SQL}, ' ') AS toks FROM documents),
    c AS (
      SELECT doc_id, CAST(i AS INTEGER) AS chunk_idx,
             array_to_string(toks[CAST(i AS INTEGER) * 40 + 1 :
                                  CAST(i AS INTEGER) * 40 + 40], ' ') AS chunk
      FROM w, UNNEST(range(0, CAST(floor((greatest(len(toks), 1) - 1) / 40.0) AS BIGINT) + 1)) AS t(i)
    ),
    h AS (
      SELECT doc_id, chunk_idx, md5(chunk) AS chunk_hash
      FROM c WHERE chunk <> ''
    ),
    r AS (
      SELECT doc_id, chunk_idx,
             row_number() OVER (PARTITION BY chunk_hash
                                ORDER BY doc_id, chunk_idx) AS rn
      FROM h
    )
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           COUNT(*) FILTER (WHERE rn > 1) AS n_dup_chunks,
           ROUND(COUNT(*) FILTER (WHERE rn > 1) / COUNT(*), 4) AS dup_frac
    FROM r GROUP BY doc_id
    """,
)
def dd10_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dd10 — cross-document span dedup at chunk granularity (the
    paragraph-level pass CCNet/RefinedWeb run before document-level
    dedup): split every document into non-overlapping 40-token
    chunks, hash them, keep the first occurrence corpus-wide (ordered
    by (doc_id, chunk_idx) — deterministic first-wins, the D1 rule
    applied to spans), and report each document's duplicated-span
    fraction. Only (id, idx, hash) tuples shuffle — chunk text never
    leaves the scan stage; the first-wins window partitions BY HASH so
    it parallelizes over the corpus."""
    d = read_table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id", F.split(DD.normalized_text("text"), " ").alias("_w")
    ).select(
        "doc_id",
        F.posexplode(T.chunk_texts(F.col("_w"), 40, 40)).alias("chunk_idx", "chunk"),
    ).where(F.col("chunk") != "")
    h = chunks.select("doc_id", "chunk_idx", F.md5("chunk").alias("chunk_hash"))
    w = Window.partitionBy("chunk_hash").orderBy("doc_id", "chunk_idx")
    r = h.withColumn("rn", F.row_number().over(w))
    dup = F.count(F.when(F.col("rn") > 1, 1)).alias("n_dup_chunks")
    return r.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        dup,
        F.round(
            F.count(F.when(F.col("rn") > 1, 1)) / F.count(F.lit(1)), 4
        ).alias("dup_frac"),
    )


# ---------------------------------------------------------------------------
# tx12 — HTML boilerplate stripping
# ---------------------------------------------------------------------------

_PAGE_SQL = (
    "'<html><body><h1>' || source || '</h1><p>' || coalesce(text, '') || '</p>'"
    " || CASE WHEN doc_id % 3 = 0 THEN '<script>var x = 1;</script>' ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN '<div class=\"ad\">BUY &amp; SAVE &lt;NOW&gt;</div>' ELSE '' END"
    " || '</body></html>'"
)


@query(
    "tx12_html_strip",
    f"""
    WITH p AS (SELECT doc_id, {_PAGE_SQL} AS page FROM documents),
    s AS (
      SELECT doc_id, page,
             regexp_replace(page, '<script[^>]*>.*?</script>', ' ', 'g') AS no_script
      FROM p
    ),
    t AS (
      SELECT doc_id, page,
             regexp_replace(no_script, '<[^>]*>', ' ', 'g') AS no_tags
      FROM s
    ),
    d AS (
      SELECT doc_id, page,
             trim(regexp_replace(
               regexp_replace(regexp_replace(regexp_replace(no_tags,
                 '&lt;', '<', 'g'), '&gt;', '>', 'g'), '&amp;', '&', 'g'),
               '\\s+', ' ', 'g')) AS clean
      FROM t
    )
    SELECT doc_id,
           len(regexp_extract_all(page, '<[^>]*>')) AS n_tags,
           len(clean) AS clean_len,
           md5(clean) AS clean_hash
    FROM d
    """,
)
def tx12_html_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tx12 — HTML boilerplate stripping: drop <script> blocks, strip
    all tags, decode the common entities, squeeze whitespace. Markup
    is planted deterministically around the document text so both
    engines clean identical pages. Pure vectorized regex — the whole
    cleaner runs inside the scan stage (no UDF, no shuffle), which is
    exactly what a 100 TB web-crawl ingest needs; output carries the
    md5 of the cleaned text, not the text itself."""
    d = read_table(spark, sf_dir, "documents")
    page = F.concat(
        F.lit("<html><body><h1>"), F.col("source"), F.lit("</h1><p>"),
        F.coalesce(F.col("text"), F.lit("")), F.lit("</p>"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("<script>var x = 1;</script>")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0,
               F.lit('<div class="ad">BUY &amp; SAVE &lt;NOW&gt;</div>')).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    no_script = F.regexp_replace(page, "<script[^>]*>.*?</script>", " ")
    no_tags = F.regexp_replace(no_script, "<[^>]*>", " ")
    decoded = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(no_tags, "&lt;", "<"), "&gt;", ">"),
        "&amp;", "&",
    )
    clean = F.trim(F.regexp_replace(decoded, "\\s+", " "))
    return d.select(
        "doc_id",
        F.regexp_count(page, F.lit("<[^>]*>")).cast("long").alias("n_tags"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_hash"),
    )


# ---------------------------------------------------------------------------
# tx13 — URL normalization + per-domain stats
# ---------------------------------------------------------------------------

_URL_SQL = (
    "CASE WHEN doc_id % 2 = 0 THEN 'https://www.' ELSE 'HTTP://' END"
    " || source || '.example.com/' || lang || '/p/' || CAST(doc_id AS VARCHAR)"
    " || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&ref=abc' ELSE '' END"
)


@query(
    "tx13_url_domain_stats",
    f"""
    WITH u AS (SELECT doc_id, {_URL_SQL} AS url FROM documents),
    n AS (
      SELECT doc_id, url,
             lower(regexp_extract(url, '^([A-Za-z]+)://', 1)) AS scheme,
             regexp_replace(lower(regexp_extract(url, '://([^/?]+)', 1)),
                            '^www\\.', '') AS domain,
             regexp_extract(url, '://[^/?]+(/[^?]*)', 1) AS path
      FROM u
    )
    SELECT domain,
           COUNT(*) AS n_urls,
           COUNT(*) FILTER (WHERE scheme = 'https') AS n_https,
           COUNT(*) FILTER (WHERE url LIKE '%utm_%') AS n_utm,
           COUNT(DISTINCT path) AS n_paths
    FROM n GROUP BY domain
    """,
)
def tx13_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tx13 — URL normalization (lowercase scheme/host, strip www.,
    split path from tracking query) and per-domain corpus statistics —
    the crawl-curation step that feeds domain-level quality filtering
    and per-domain sampling caps. URLs are planted deterministically
    from (source, lang, doc_id). Regex-only normalization keeps it
    scan-local; the per-domain aggregate partial-aggregates map-side,
    so domain cardinality (small) bounds the shuffle, not corpus
    size."""
    d = read_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://www.")).otherwise(F.lit("HTTP://")),
        F.col("source"), F.lit(".example.com/"), F.col("lang"), F.lit("/p/"),
        F.col("doc_id").cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("?utm_source=feed&ref=abc")).otherwise(F.lit("")),
    )
    n = d.select(
        "doc_id", url.alias("url"),
        F.lower(F.regexp_extract(url, "^([A-Za-z]+)://", 1)).alias("scheme"),
        F.regexp_replace(
            F.lower(F.regexp_extract(url, "://([^/?]+)", 1)), "^www\\.", ""
        ).alias("domain"),
        F.regexp_extract(url, "://[^/?]+(/[^?]*)", 1).alias("path"),
    )
    return n.groupBy("domain").agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.count(F.when(F.col("scheme") == "https", 1)).alias("n_https"),
        F.count(F.when(F.col("url").contains("utm_"), 1)).alias("n_utm"),
        F.count_distinct("path").alias("n_paths"),
    )
