"""Driver-facing queries: second wave of large-scale pipeline
operators — event-time as-of join, benchmark decontamination, PII
redaction, repetition-based quality signals (Gopher-style), and
TF-IDF distinctive terms.

Same conventions as queries.py: every computed column aliased
identically on both sides, floats rounded (2dp money, 4dp ratios)
before hashing, all synthetic inputs built deterministically from the
driver's parquet tables.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .operators import layout as LAYOUT
from .operators.asof import asof_join
from .operators.dedup import _shingle_rows, normalized_text
from .queries import query, sales_cte
from .queries_llm import NORM_SQL, SHINGLES_SQL
from .sources.tables import read_table

# ---------------------------------------------------------------------------
# J7 — event-time as-of join
# ---------------------------------------------------------------------------

@query(
    "j7_asof_join",
    """
    WITH clicks AS (
      SELECT user_id, ts, ROUND(MAX(value), 2) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ), p AS (
      SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
           ROUND(p.value, 2) AS amount,
           c.click_value AS last_click_value
    FROM p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def j7_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 — as-of join (the engine analog of the reference's
    human bank-statement matching, SURVEY J5 generalized to event
    time): each purchase picks up the latest at-or-before click value
    for the same user. Implemented as the union-window as-of (one
    shuffle on the key, no inequality join, no cross product): tag
    both sides, sort (ts, side) within the key, carry the last
    non-null right value forward. Right side is pre-aggregated per
    (key, ts) so ties are deterministic in both engines."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("amount")
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.round(F.max("value"), 2).alias("click_value"))
    )
    joined = asof_join(
        purchases, clicks, key="user_id", ts="ts", value_col="click_value"
    )
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_str"),
        "amount",
        F.col("click_value").alias("last_click_value"),
    )


# ---------------------------------------------------------------------------
# dd8 — benchmark decontamination (n-gram containment)
# ---------------------------------------------------------------------------

BENCH_SQL = "SELECT doc_id AS bench_id, text FROM documents WHERE doc_id % 23 = 0"


@query(
    "dd8_decontamination",
    f"""
    WITH bench AS ({BENCH_SQL}),
    bsh AS (SELECT bench_id, unnest({SHINGLES_SQL}) AS shingle FROM bench),
    bsz AS (SELECT bench_id, COUNT(*) AS bench_sz FROM bsh GROUP BY bench_id),
    csh AS (SELECT doc_id, unnest({SHINGLES_SQL}) AS shingle FROM documents),
    hits AS (
      SELECT c.doc_id, b.bench_id, COUNT(*) AS n_shared
      FROM csh c JOIN bsh b ON c.shingle = b.shingle
      GROUP BY c.doc_id, b.bench_id
    )
    SELECT h.doc_id, h.bench_id, h.n_shared,
           ROUND(h.n_shared / s.bench_sz, 4) AS containment
    FROM hits h JOIN bsz s USING (bench_id)
    WHERE h.n_shared / s.bench_sz >= 0.8
    """,
)
def dd8_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Test-set decontamination: flag corpus documents whose distinct
    word-3-gram overlap *contains* ≥80% of a benchmark document's
    shingles (the standard n-gram containment check run before
    training). The benchmark posting list is tiny relative to the
    corpus, so it broadcasts — the 100 TB corpus never shuffles; each
    scan task probes the broadcast shingle set map-side and only the
    (doc, bench, count) hits move."""
    # register the shared documents-shingle persist (also read by dd2):
    # the corpus-side explode below then resolves to the one
    # materialized copy instead of re-shingling the corpus per run
    from .queries_llm import _documents_shingles

    _documents_shingles(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    bench = docs.where(F.col("doc_id") % 23 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    bsh = _shingle_rows(bench, "text", "bench_id", 3)
    bsz = bsh.groupBy("bench_id").agg(F.count(F.lit(1)).alias("bench_sz"))
    csh = _shingle_rows(docs, "text", "doc_id", 3)
    hits = (
        csh.join(F.broadcast(bsh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        hits.join(F.broadcast(bsz), "bench_id")
        .where(F.col("n_shared") / F.col("bench_sz") >= 0.8)
        .select(
            "doc_id", "bench_id", "n_shared",
            F.round(F.col("n_shared") / F.col("bench_sz"), 4).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# tx9 — PII detection & redaction
# ---------------------------------------------------------------------------

EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}-[0-9]{4}"

PII_TEXT_SQL = (
    "coalesce(text, '') || ' contact user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com call 555-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


@query(
    "tx9_pii_redaction",
    f"""
    WITH p AS (SELECT doc_id, {PII_TEXT_SQL} AS t FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(t, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t, '{PHONE_RE}')) AS n_phones,
           md5(regexp_replace(regexp_replace(t, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_hash
    FROM p
    """,
)
def tx9_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction: count and mask email addresses and
    phone-shaped numbers with vectorized regex (no UDF — the whole
    redaction runs inside the scan stage). PII is planted
    deterministically from doc_id so both engines see identical
    inputs; output carries the md5 of the redacted text so the full
    redacted payload never leaves the stage."""
    d = read_table(spark, sf_dir, "documents")
    t = F.concat(
        F.coalesce(F.col("text"), F.lit("")),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail.example.com call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return d.select(
        "doc_id",
        F.regexp_count(t, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(t, F.lit(PHONE_RE)).cast("long").alias("n_phones"),
        F.md5(redacted).alias("redacted_hash"),
    )


# ---------------------------------------------------------------------------
# tx10 — repetition quality signals (Gopher-style)
# ---------------------------------------------------------------------------

@query(
    "tx10_repetition_metrics",
    f"""
    WITH w AS (
      SELECT doc_id,
             CASE WHEN {NORM_SQL} = '' THEN []::VARCHAR[]
                  ELSE string_split({NORM_SQL}, ' ') END AS toks
      FROM documents
    ), g AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(0, len(toks) - 1),
                       i -> toks[i+1] || ' ' || toks[i+2])
                  ELSE []::VARCHAR[] END AS bigrams
      FROM w
    )
    SELECT doc_id, CAST(n AS BIGINT) AS n_tok,
           CASE WHEN n > 0
                THEN ROUND(1.0 - len(list_distinct(toks)) / n, 4)
                ELSE 0.0 END AS dup_word_frac,
           CASE WHEN len(bigrams) > 0
                THEN ROUND(1.0 - len(list_distinct(bigrams)) / len(bigrams), 4)
                ELSE 0.0 END AS dup_bigram_frac
    FROM g
    """,
)
def tx10_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition-based quality signals (the Gopher/C4 rules):
    duplicate-word fraction and duplicate-bigram fraction per
    document. Pure array expressions over one materialized token array
    — zero shuffle, zero UDF; at 100 TB this is a free rider on the
    ingest scan alongside tx1-tx4."""
    d = read_table(spark, sf_dir, "documents")
    norm = normalized_text("text")
    w = d.select(
        "doc_id",
        F.when(norm == "", F.array().cast("array<string>"))
        .otherwise(F.split(norm, " "))
        .alias("toks"),
    )
    n = F.size(F.col("toks"))
    bigrams = F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(0), n - 2),
            lambda i: F.concat_ws(" ", F.element_at(F.col("toks"), i + 1),
                                  F.element_at(F.col("toks"), i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    g = w.select("doc_id", "toks", n.alias("n"), bigrams.alias("bigrams"))
    nb = F.size(F.col("bigrams"))
    return g.select(
        "doc_id",
        F.col("n").cast("long").alias("n_tok"),
        F.when(F.col("n") > 0,
               F.round(1.0 - F.size(F.array_distinct("toks")) / F.col("n"), 4))
        .otherwise(F.lit(0.0)).alias("dup_word_frac"),
        F.when(nb > 0, F.round(1.0 - F.size(F.array_distinct("bigrams")) / nb, 4))
        .otherwise(F.lit(0.0)).alias("dup_bigram_frac"),
    )


# ---------------------------------------------------------------------------
# tx11 — TF-IDF distinctive terms per language
# ---------------------------------------------------------------------------

@query(
    "tx11_tfidf_top_terms",
    f"""
    WITH ex AS (
      SELECT doc_id, lang, unnest(string_split({NORM_SQL}, ' ')) AS token
      FROM documents WHERE {NORM_SQL} <> ''
    ), tfl AS (
      SELECT lang, token, COUNT(*) AS tf FROM ex GROUP BY lang, token
    ), dfc AS (
      SELECT token, COUNT(DISTINCT doc_id) AS df_docs FROM ex GROUP BY token
    ), n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT lang, token, tf, df_docs,
             ROUND(tf * ln((n_docs + 1.0) / (df_docs + 1.0)), 4) AS tfidf
      FROM tfl JOIN dfc USING (token) CROSS JOIN n
    )
    SELECT lang, token, tf, df_docs, tfidf, rank FROM (
      SELECT *, row_number() OVER (PARTITION BY lang
                                   ORDER BY tfidf DESC, token ASC) AS rank
      FROM scored) WHERE rank <= 5
    """,
)
def tx11_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF distinctive terms: top-5 tokens per language by
    tf·ln((N+1)/(df+1)). Two hash aggregates over the exploded token
    stream (both partial-aggregated map-side) + one broadcast of the
    1-row corpus count; the per-language top-k window ranks on the
    ROUNDED score with a token tie-break so the cutoff is
    deterministic across engines."""
    d = read_table(spark, sf_dir, "documents")
    norm = normalized_text("text")
    ex = (
        d.select("doc_id", "lang", norm.alias("_n"))
        .where(F.col("_n") != "")
        .select("doc_id", "lang", F.explode(F.split("_n", " ")).alias("token"))
    )
    tfl = ex.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("tf"))
    dfc = ex.groupBy("token").agg(F.count_distinct("doc_id").alias("df_docs"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tfl.join(dfc, "token")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "lang", "token", "tf", "df_docs",
            F.round(
                F.col("tf") * F.log((F.col("n_docs") + 1.0) / (F.col("df_docs") + 1.0)), 4
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("lang").orderBy(F.col("tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= 5)
        .select("lang", "token", "tf", "df_docs", "tfidf", "rank")
    )


# ---------------------------------------------------------------------------
# ST5 / J9 — interval (range) join, the stream-stream join shape
# ---------------------------------------------------------------------------

@query(
    "st5_interval_join",
    """
    WITH p AS (
      SELECT event_id, user_id, ts, ROUND(value, 2) AS amount
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts AS click_ts, ROUND(MAX(value), 2) AS click_value
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts_str,
           strftime(c.click_ts, '%Y-%m-%d %H:%M:%S') AS click_ts_str,
           p.amount, c.click_value
    FROM p JOIN c
      ON p.user_id = c.user_id
     AND c.click_ts >= p.ts - INTERVAL 30 MINUTE
     AND c.click_ts <= p.ts
    """,
)
def st5_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST5 — interval (range) join: every click within the 30 minutes
    before a purchase, per user (attribution window). Where J7 keeps
    only the *latest* prior click, this keeps the full window — the
    one-to-many range-join shape. Executed as a hash join on user_id
    with the time range as a residual filter (no cross product); the
    identical expression runs as a watermarked stream-stream join
    (tests/test_streaming.py::test_stream_stream_interval_join), the
    bounded range being what lets Spark expire join state."""
    from .operators.asof import interval_join

    e = read_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.round("value", 2).alias("amount")
    )
    clicks = (
        e.where(F.col("event_type") == "click")
        .groupBy("user_id", F.col("ts").alias("click_ts"))
        .agg(F.round(F.max("value"), 2).alias("click_value"))
    )
    joined = interval_join(
        purchases, clicks, key="user_id", left_ts="ts", right_ts="click_ts",
        lookback="30 minutes",
    )
    return joined.select(
        "event_id", "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts_str"),
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts_str"),
        "amount", "click_value",
    )


# ---------------------------------------------------------------------------
# TX19 — rule-based quality gate with reason codes (Gopher-style)
# ---------------------------------------------------------------------------

@query(
    "tx19_gopher_rules",
    """
    WITH m AS (
      SELECT doc_id,
             length(text) AS n_chars,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_words,
             length(regexp_replace(text, '\\s', '', 'g')) AS nonspace_chars,
             length(regexp_replace(text, '[^0-9]', '', 'g')) AS digit_chars,
             length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g')) AS symbol_chars,
             (CASE WHEN ' ' || lower(text) || ' ' LIKE '% the %' THEN 1 ELSE 0 END
              + CASE WHEN ' ' || lower(text) || ' ' LIKE '% and %' THEN 1 ELSE 0 END
              + CASE WHEN ' ' || lower(text) || ' ' LIKE '% of %' THEN 1 ELSE 0 END
              + CASE WHEN ' ' || lower(text) || ' ' LIKE '% to %' THEN 1 ELSE 0 END
              + CASE WHEN ' ' || lower(text) || ' ' LIKE '% in %' THEN 1 ELSE 0 END) AS stop_hits
      FROM documents
    ), r AS (
      SELECT doc_id, n_words,
             n_words BETWEEN 10 AND 100000 AS wc_ok,
             2 * nonspace_chars >= 5 * n_words AND nonspace_chars <= 10 * n_words AS mwl_ok,
             digit_chars * 5 < n_chars AS digit_ok,
             symbol_chars * 4 < n_chars AS symbol_ok,
             stop_hits >= 2 AS stop_ok
      FROM m
    )
    SELECT doc_id, n_words,
           wc_ok AND mwl_ok AND digit_ok AND symbol_ok AND stop_ok AS keep,
           trim(TRAILING ',' FROM
                (CASE WHEN wc_ok THEN '' ELSE 'word_count,' END)
             || (CASE WHEN mwl_ok THEN '' ELSE 'mean_word_len,' END)
             || (CASE WHEN digit_ok THEN '' ELSE 'digit_ratio,' END)
             || (CASE WHEN symbol_ok THEN '' ELSE 'symbol_ratio,' END)
             || (CASE WHEN stop_ok THEN '' ELSE 'stopwords,' END)) AS reject_reasons
    FROM r
    """,
)
def tx19_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TX19 — the Gopher/C4-style rule battery as a FILTER WITH REASON
    CODES: each document gets independent boolean gates (word count,
    mean word length, digit ratio, symbol ratio, stopword presence)
    plus the ordered list of failed rules — the shape a curation
    pipeline needs for per-rule removal accounting (what fraction did
    each rule kill?). All gates are integer arithmetic over counts
    (ratio thresholds cross-multiplied), so no float ever enters the
    comparison — bit-stable across engines and cluster sizes; one
    scan, no shuffle, pure codegen."""
    d = read_table(spark, sf_dir, "documents")
    txt = F.col("text")
    padded = F.concat(F.lit(" "), F.lower(txt), F.lit(" "))
    stop_hits = sum(
        F.when(padded.like(f"% {w} %"), 1).otherwise(0)
        for w in ["the", "and", "of", "to", "in"]
    )
    m = d.select(
        "doc_id",
        F.length(txt).alias("n_chars"),
        F.when(F.trim(txt) == "", 0)
        .otherwise(F.size(F.split(F.trim(txt), r"\s+")))
        .alias("n_words"),
        F.length(F.regexp_replace(txt, r"\s", "")).alias("nonspace_chars"),
        F.length(F.regexp_replace(txt, r"[^0-9]", "")).alias("digit_chars"),
        F.length(F.regexp_replace(txt, r"[A-Za-z0-9\s]", "")).alias("symbol_chars"),
        stop_hits.alias("stop_hits"),
    )
    r = m.select(
        "doc_id", "n_words",
        F.col("n_words").between(10, 100000).alias("wc_ok"),
        (
            (2 * F.col("nonspace_chars") >= 5 * F.col("n_words"))
            & (F.col("nonspace_chars") <= 10 * F.col("n_words"))
        ).alias("mwl_ok"),
        (F.col("digit_chars") * 5 < F.col("n_chars")).alias("digit_ok"),
        (F.col("symbol_chars") * 4 < F.col("n_chars")).alias("symbol_ok"),
        (F.col("stop_hits") >= 2).alias("stop_ok"),
    )

    def tag(ok: str, label: str) -> F.Column:
        return F.when(F.col(ok), "").otherwise(label + ",")

    reasons = F.concat(
        tag("wc_ok", "word_count"), tag("mwl_ok", "mean_word_len"),
        tag("digit_ok", "digit_ratio"), tag("symbol_ok", "symbol_ratio"),
        tag("stop_ok", "stopwords"),
    )
    return r.select(
        "doc_id", "n_words",
        (
            F.col("wc_ok") & F.col("mwl_ok") & F.col("digit_ok")
            & F.col("symbol_ok") & F.col("stop_ok")
        ).alias("keep"),
        F.regexp_replace(reasons, ",$", "").alias("reject_reasons"),
    )



# ---------------------------------------------------------------------------
# Shared staging lifecycle for source-format roundtrip queries
# ---------------------------------------------------------------------------

#: staging dirs per (applicationId, tag, sf_dir) — written once per
#: session, reaped at interpreter exit.
_STAGED_DIRS: dict[tuple, str] = {}


def _staged_dir(spark: SparkSession, sf_dir: str, tag: str, write_fn) -> str:
    """Idempotent per-(session, sf_dir) staging directory: ``write_fn``
    runs exactly once to materialize the staged files; later
    invocations reuse the directory (the shared lifecycle of every
    file-format roundtrip query — jl1/jl2/csv1/orc1/b2)."""
    import atexit
    import shutil
    import tempfile

    key = (spark.sparkContext.applicationId, tag, sf_dir)
    staged = _STAGED_DIRS.get(key)
    if staged is None:
        staged = tempfile.mkdtemp(prefix=f"spark_graft_{tag}_")
        write_fn(staged)
        _STAGED_DIRS[key] = staged
        atexit.register(shutil.rmtree, staged, ignore_errors=True)
    return staged


# ---------------------------------------------------------------------------
# JL1 — JSONL source roundtrip (the training-data interchange format)
# ---------------------------------------------------------------------------

@query(
    "jl1_jsonl_roundtrip",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS text_xor
    FROM documents GROUP BY lang, source
    """,
)
def jl1_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL1 — JSONL as a first-class source/sink: the corpus is written
    out as JSON Lines (the de-facto training-data interchange format)
    and read back with an EXPLICIT schema — never schema inference,
    which at 100 TB costs a full extra pass and can silently widen
    types between batches. The XOR text digest in the oracle (computed
    from the original parquet) proves the JSON encode→decode roundtrip
    loses nothing: every document's full text survives byte-exact.
    Writes are per-session idempotent; splittable line format means
    the read parallelizes like parquet (minus column pruning — which
    is why parquet stays the at-rest format and JSONL the interchange)."""
    staged = _staged_dir(
        spark, sf_dir, "jl1",
        lambda d: read_table(spark, sf_dir, "documents").write.mode("overwrite").json(d),
    )
    docs = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(staged)
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return (
        docs.withColumn("h60", h60)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("bit_xor(h60)").alias("text_xor"),
        )
    )


# ---------------------------------------------------------------------------
# CSV1 — CSV source roundtrip with hostile quoting (RFC 4180 path)
# ---------------------------------------------------------------------------

@query(
    "csv1_csv_roundtrip",
    """
    WITH salted AS (
      SELECT doc_id, lang, source,
             text || ',"' || chr(10) || 'end' AS text
      FROM documents
    )
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(length(text)) AS BIGINT) AS total_chars,
           bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS text_xor
    FROM salted GROUP BY lang, source
    """,
)
def csv1_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV1 — CSV as a source/sink under HOSTILE content: every text is
    salted with an embedded comma, double-quote and newline before the
    write, so the roundtrip only survives if RFC-4180 quoting
    (quote-doubling escape, multiLine read) actually works — exactly
    the failure mode that silently corrupts naive splitters. Read uses
    an EXPLICIT schema (same rationale as jl1). The oracle recomputes
    the salted text straight from parquet; the XOR digest therefore
    proves byte-exact survival through the CSV encode→decode. Scale
    caveat, documented not hidden: multiLine CSV files are NOT
    splittable (a quoted newline can cross any byte offset), so at
    100 TB the ingest keeps files small-many — or lands data in
    parquet/JSONL instead; this operator exists for the sources that
    only speak CSV."""
    salted = read_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source",
        F.concat(F.col("text"), F.lit(',"'), F.lit("\n"), F.lit("end")).alias("text"),
    )
    staged = _staged_dir(
        spark, sf_dir, "csv1",
        lambda d: salted.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(d),
    )
    docs = (
        spark.read.schema("doc_id long, lang string, source string, text string")
        .option("header", True)
        .option("multiLine", True)
        .option("escape", '"')
        .csv(staged)
    )
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return (
        docs.withColumn("h60", h60)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("long").alias("total_chars"),
            F.expr("bit_xor(h60)").alias("text_xor"),
        )
    )


# ---------------------------------------------------------------------------
# JL2 — malformed-record ingest (PERMISSIVE + corrupt-record routing)
# ---------------------------------------------------------------------------

@query(
    "jl2_malformed_jsonl",
    """
    SELECT CASE WHEN doc_id % 13 = 0 THEN '_corrupt' ELSE lang END AS lang,
           CASE WHEN doc_id % 13 = 0 THEN '_corrupt' ELSE source END AS source,
           COUNT(*) AS n_docs,
           bit_xor(CASE WHEN doc_id % 13 = 0 THEN NULL
                        ELSE CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) END) AS text_xor
    FROM documents GROUP BY 1, 2
    """,
)
def jl2_malformed_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JL2 — the ingest-robustness contract for line formats: every
    13th record is deterministically corrupted (closing brace cut off)
    before the write, and the PERMISSIVE read must route exactly those
    lines to the corrupt-record column — never silently drop them
    (FAILFAST would kill a 100 TB job for one bad line; DROPMALFORMED
    loses data with no audit trail). Good rows aggregate as in jl1;
    corrupt rows bucket under '_corrupt' with a NULL digest. The
    oracle knows which ids were corrupted, so a hash match proves the
    router classified every line correctly — the reference's own
    S8-repair philosophy (validate, quarantine, continue;
    Code.gs:362-414) applied to file ingest."""
    def write_corrupted(dest: str) -> None:
        d = read_table(spark, sf_dir, "documents")
        line = F.to_json(F.struct("doc_id", "text", "lang", "source", "n_chars"))
        staged_df = d.select("doc_id", line.alias("line")).select(
            F.when(
                F.col("doc_id") % 13 == 0,
                # cutting the last 5 chars always removes the closing
                # brace -> guaranteed-invalid JSON
                F.expr("substring(line, 1, length(line) - 5)"),
            )
            .otherwise(F.col("line"))
            .alias("line")
        )
        staged_df.write.mode("overwrite").text(dest)

    staged = _staged_dir(spark, sf_dir, "jl2", write_corrupted)
    docs = (
        spark.read.schema(
            "doc_id long, text string, lang string, source string, n_chars long, _bad string"
        )
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_bad")
        .json(staged)
    )
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return (
        docs.withColumn("h60", h60)
        .groupBy(
            F.coalesce(F.col("lang"), F.lit("_corrupt")).alias("lang"),
            F.coalesce(F.col("source"), F.lit("_corrupt")).alias("source"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.expr("bit_xor(h60)").alias("text_xor"),
        )
    )


# ---------------------------------------------------------------------------
# ORC1 — ORC source/sink roundtrip (the other columnar at-rest format)
# ---------------------------------------------------------------------------

@query(
    "orc1_orc_roundtrip",
    """
    SELECT lang, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           bit_xor(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT)) AS text_xor
    FROM documents GROUP BY lang, source
    """,
)
def orc1_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC1 — ORC as a first-class columnar source/sink: the corpus is
    written as ORC and read back with an explicit schema; the XOR
    digest (computed by the oracle from the original parquet) proves
    the encode→decode loses nothing. ORC keeps what matters at 100 TB
    — splittable stripes, column projection, predicate pushdown via
    stripe/row-group min-max — so a lake standardized on ORC gets the
    same scan behavior the parquet paths assert in test_plans.py.
    Spark's native vectorized ORC reader covers it with zero extra
    dependencies; writes are per-session idempotent (same staging
    lifecycle as jl1/csv1)."""
    staged = _staged_dir(
        spark, sf_dir, "orc1",
        lambda d: read_table(spark, sf_dir, "documents").write.mode("overwrite").orc(d),
    )
    docs = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).orc(staged)
    h60 = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("long")
    return (
        docs.withColumn("h60", h60)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.expr("bit_xor(h60)").alias("text_xor"),
        )
    )


# ---------------------------------------------------------------------------
# B2 — hive-partitioned sink + static partition pruning on read-back
# ---------------------------------------------------------------------------

@query(
    "b2_partitioned_write_pruning",
    sales_cte(
        """
    SELECT strftime(sale_date, '%Y-%m') AS month,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(monto * 100) AS BIGINT)) AS BIGINT) AS total_cents,
           bit_xor(CAST(('0x' || substr(md5(folio), 1, 15)) AS BIGINT)) AS folio_xor
    FROM sales
    WHERE strftime(sale_date, '%Y-%m') IN ('1998-03', '1998-04', '1998-05')
    GROUP BY 1
    """
    ),
)
def b2_partitioned_write_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B2 — the engine's own warehouse layout, proven end-to-end: the
    cleaned sales feed is LANDED as a hive-partitioned parquet table
    (``month=YYYY-MM/`` directories — the reference's one-sheet-per-
    month made literal, SURVEY S1) and read back with a partition
    predicate. Directory-level pruning means a 3-month query opens 3
    directories out of the whole history — no footer of any other
    month's file is even touched, which is the difference between a
    3-month and a 10-year scan at 100 TB. The digest proves the
    partitioned rewrite relocated every row into the right partition
    losslessly (a row in the wrong month directory would flip both
    its own group's hash and its true month's row count)."""
    from .sources.tables import sales_view

    staged = _staged_dir(
        spark, sf_dir, "b2",
        lambda d: sales_view(spark, sf_dir)
        .withColumn("month", F.date_format("sale_date", "yyyy-MM"))
        .write.mode("overwrite")
        .partitionBy("month")
        .parquet(d),
    )
    landed = spark.read.parquet(staged).where(
        F.col("month").isin("1998-03", "1998-04", "1998-05")
    )
    h60 = F.conv(F.substring(F.md5(F.col("folio")), 1, 15), 16, 10).cast("long")
    return (
        landed.withColumn("h60", h60)
        .groupBy("month")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("monto") * 100).cast("long")).cast("long").alias("total_cents"),
            F.expr("bit_xor(h60)").alias("folio_xor"),
        )
    )


# ---------------------------------------------------------------------------
# TX20 — boilerplate line removal (corpus-frequency sentence filter)
# ---------------------------------------------------------------------------

@query(
    "tx20_boilerplate_lines",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    s AS (
      SELECT doc_id, i.i,
             array_to_string(w[i.i * 10 + 1 : i.i * 10 + 10], ' ') AS sent
      FROM t, LATERAL (SELECT unnest(range(0, (len(w) + 9) // 10)) AS i) i
    ),
    boiler AS (
      SELECT sent FROM s GROUP BY sent HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    kept AS (
      SELECT s.doc_id, s.i, s.sent,
             (b.sent IS NULL) AS keep
      FROM s LEFT JOIN boiler b ON b.sent = s.sent
    )
    SELECT doc_id,
           COUNT(*) AS n_sents,
           CAST(COUNT(*) FILTER (NOT keep) AS BIGINT) AS n_boiler,
           md5(string_agg(CASE WHEN keep THEN sent END, ' ' ORDER BY i)) AS retained_hash,
           ROUND(COUNT(*) FILTER (keep) / COUNT(*), 4) AS kept_ratio
    FROM kept GROUP BY doc_id
    """,
)
def tx20_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TX20 — boilerplate removal by corpus frequency (the C4/CCNet
    move): fixed 10-token sentence windows that appear in ≥2 distinct
    documents are navigation/template noise, and every occurrence is
    dropped from every document — frequency-based removal, distinct
    from dd10's first-wins chunk dedup (which keeps ONE copy).

    Scale shape: pass 1 aggregates (sentence-hash → distinct-doc
    count) — only hashes shuffle; the boilerplate set is by
    definition the head of the frequency distribution, so it stays
    small relative to the corpus and is collapsed to ONE broadcast
    row. Pass 2 is then a pure per-row projection: re-split, drop
    members of the broadcast set, rebuild the retained text — zero
    shuffle of any document text, no re-keying join for reassembly.
    (At extreme corpus sizes the set is capped by taking only hashes
    above the threshold — exactly the rows this aggregate emits.)
    Output fingerprints the retained text so the full cleaned payload
    never leaves the stage."""
    d = read_table(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    sents = F.transform(
        F.sequence(F.lit(0), ((F.size(w) - 1) / 10).cast("int")),
        lambda i: F.array_join(F.slice(w, i * 10 + 1, 10), " "),
    )
    s = d.select("doc_id", F.explode(sents).alias("sent"))
    boiler_row = (
        s.groupBy(F.md5("sent").alias("h"))
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") >= 2)
        .agg(F.array_sort(F.collect_list("h")).alias("boiler"))
    )
    keep = lambda x: ~F.array_contains(F.col("boiler"), F.md5(x))  # noqa: E731
    per_doc = d.crossJoin(F.broadcast(boiler_row)).select(
        "doc_id",
        sents.alias("sents"),
        F.filter(sents, keep).alias("kept"),
    )
    return per_doc.select(
        "doc_id",
        F.size("sents").cast("long").alias("n_sents"),
        (F.size("sents") - F.size("kept")).cast("long").alias("n_boiler"),
        F.when(F.size("kept") > 0, F.md5(F.array_join("kept", " "))).alias("retained_hash"),
        F.round(F.size("kept") / F.size("sents"), 4).alias("kept_ratio"),
    )


# ---------------------------------------------------------------------------
# XLSX1 — workbook source/sink roundtrip (the reference's native format)
# ---------------------------------------------------------------------------

@query(
    "xlsx1_workbook_roundtrip",
    """
    WITH t AS (
      SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice,
             o_orderpriority || ' <&"> ' AS comment,
             (o_orderkey % 40 = 0) AS flag
      FROM orders WHERE o_orderkey % 20 = 0
    )
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS total_cents,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(o_orderdate AS VARCHAR) || '|' || comment), 1, 15)) AS BIGINT))
             AS payload_xor,
           CAST(COUNT(*) FILTER (flag) AS BIGINT) AS n_flagged
    FROM t GROUP BY month
    """,
)
def xlsx1_workbook_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XLSX1 — the reference's native format as a source/sink: a typed
    slice of ``orders`` (long, date, double, hostile-XML string with
    trailing whitespace, bool) is written to a real .xlsx by the
    stdlib writer and read back by the stdlib reader
    (``sources/xlsx.py``); the oracle recomputes the same digests
    straight from parquet, so a hash match proves dates, floats,
    booleans and XML-escaped text all survive the workbook encode →
    decode byte-exact.

    Scale boundary, stated not hidden: a workbook is a driver-side
    artifact by design — xlsx is a non-splittable zip bounded by the
    spreadsheet row limit, a small-dimension format, never the 100 TB
    fact path. The collect here IS the architecture (extract once →
    typed staging → distributed scans downstream; see the xlsx module
    docstring), and the slice is dimension-sized by construction."""
    from .sources.xlsx import read_workbook, write_workbook

    schema = (
        "o_orderkey long, o_orderdate date, o_totalprice double, "
        "comment string, flag boolean"
    )

    def write_xlsx(d: str) -> None:
        rows = (
            read_table(spark, sf_dir, "orders")
            .where(F.col("o_orderkey") % 20 == 0)
            .select(
                "o_orderkey",
                F.to_date("o_orderdate").alias("o_orderdate"),
                "o_totalprice",
                F.concat(F.col("o_orderpriority"), F.lit(' <&"> ')).alias("comment"),
                (F.col("o_orderkey") % 40 == 0).alias("flag"),
            )
            .collect()
        )
        write_workbook(
            os.path.join(d, "orders.xlsx"),
            {"orders": [list(schema_names)] + [list(r) for r in rows]},
        )

    schema_names = ("o_orderkey", "o_orderdate", "o_totalprice", "comment", "flag")
    staged = _staged_dir(spark, sf_dir, "xlsx1", write_xlsx)
    book = read_workbook(os.path.join(staged, "orders.xlsx"))["orders"]
    back = spark.createDataFrame([tuple(r) for r in book[1:]], schema)
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderdate").cast("string"), F.lit("|"), F.col("comment"))),
            1, 15,
        ), 16, 10,
    ).cast("long")
    return (
        back.withColumn("h60", h60)
        .groupBy(F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).cast("long").alias("total_cents"),
            F.expr("bit_xor(h60)").alias("payload_xor"),
            F.sum(F.col("flag").cast("long")).cast("long").alias("n_flagged"),
        )
    )


# ---------------------------------------------------------------------------
# B3 — Z-order (space-filling-curve) clustering + zone-map pruning
# ---------------------------------------------------------------------------

_B3_ZONES_SQL = f"""
    WITH li AS (
      SELECT l_partkey AS x, l_suppkey AS y FROM lineitem
    ), stats AS (
      SELECT MIN(x) AS xmin, MAX(x) AS xmax, MIN(y) AS ymin, MAX(y) AS ymax
      FROM li
    ), binned AS (
      SELECT x, y,
             ((x - xmin) * 256) // (xmax - xmin + 1) AS bx,
             ((y - ymin) * 256) // (ymax - ymin + 1) AS by,
             xmin + (xmax - xmin + 1) * 2 // 5 AS qx1,
             xmin + (xmax - xmin + 1) * 3 // 5 AS qx2,
             ymin + (ymax - ymin + 1) * 2 // 5 AS qy1,
             ymin + (ymax - ymin + 1) * 3 // 5 AS qy2
      FROM li, stats
    ), zed AS (
      SELECT *, ({LAYOUT.z_value_sql('bx', 'by')}) AS z FROM binned
    ), layouts AS (
      SELECT 'zorder' AS layout, z // 256 AS file_id, * FROM zed
      UNION ALL
      SELECT 'linear' AS layout, bx AS file_id, * FROM zed
    ), zones AS (
      SELECT layout, file_id, COUNT(*) AS n_rows,
             MIN(x) AS min_x, MAX(x) AS max_x,
             MIN(y) AS min_y, MAX(y) AS max_y,
             COUNT(*) FILTER (x BETWEEN qx1 AND qx2 AND y BETWEEN qy1 AND qy2)
               AS n_match,
             MIN(qx1) AS qx1, MIN(qx2) AS qx2, MIN(qy1) AS qy1, MIN(qy2) AS qy2
      FROM layouts GROUP BY layout, file_id
    )
"""


@query(
    "b3_zorder_layout",
    f"""
    {_B3_ZONES_SQL}
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_files,
           CAST(COUNT(*) FILTER (max_x >= qx1 AND min_x <= qx2
                                 AND max_y >= qy1 AND min_y <= qy2)
                AS BIGINT) AS files_hit,
           CAST(COALESCE(SUM(n_rows) FILTER (max_x >= qx1 AND min_x <= qx2
                                             AND max_y >= qy1 AND min_y <= qy2),
                         0) AS BIGINT) AS rows_scanned,
           CAST(SUM(n_match) AS BIGINT) AS rows_matching
    FROM zones GROUP BY layout
    """,
)
def b3_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3 — multi-dimensional clustering: Z-order (Morton) interleave
    of two fixed-width-binned dimensions vs a single-dimension sort,
    judged by the zone maps (per-file min/max) each layout yields.
    The reference clusters on one dimension only (a tab per month,
    Code.gs:234-240); this is the 100 TB generalization — the
    lakehouse ``OPTIMIZE ZORDER BY`` pattern — where a file layout
    must serve predicates on MORE than the partition column.

    Per layout the query reports how many of its files a center-box
    probe (middle fifth of both dimensions' ranges) must open
    (``files_hit``) and how many rows those files hold
    (``rows_scanned``) against the true selectivity
    (``rows_matching``, identical across layouts by construction —
    the built-in sanity check that both layouts cover every matching
    row). Z-order prunes in BOTH dimensions (~files_hit/n_files ≈
    box area), linear only in its sort dimension (≈ box side).

    Shape: one 1-row min/max aggregate broadcast back, then pure
    map-side integer arithmetic (``operators/layout.py`` — unrolled
    bit interleave inside whole-stage codegen, files as fixed
    z-ranges so no global row_number), one groupBy per zone map.
    At 100 TB the same z column is what ``repartitionByRange(z)`` +
    ``sortWithinPartitions(z)`` would feed the parquet writer; here
    the zone maps themselves are the driver-verified output."""
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("x"), F.col("l_suppkey").alias("y")
    )
    stats = li.agg(
        F.min("x").alias("xmin"), F.max("x").alias("xmax"),
        F.min("y").alias("ymin"), F.max("y").alias("ymax"),
    )
    binned = li.crossJoin(F.broadcast(stats)).selectExpr(
        "x", "y",
        "((x - xmin) * 256) div (xmax - xmin + 1) AS bx",
        "((y - ymin) * 256) div (ymax - ymin + 1) AS by",
        "xmin + (xmax - xmin + 1) * 2 div 5 AS qx1",
        "xmin + (xmax - xmin + 1) * 3 div 5 AS qx2",
        "ymin + (ymax - ymin + 1) * 2 div 5 AS qy1",
        "ymin + (ymax - ymin + 1) * 3 div 5 AS qy2",
    )
    zed = binned.withColumn("z", LAYOUT.z_value(F.col("bx"), F.col("by")))
    zord = zed.select(
        F.lit("zorder").alias("layout"), F.expr("z div 256").alias("file_id"), "*"
    )
    lin = zed.select(
        F.lit("linear").alias("layout"), F.col("bx").alias("file_id"), "*"
    )
    in_box = (
        F.col("x").between(F.col("qx1"), F.col("qx2"))
        & F.col("y").between(F.col("qy1"), F.col("qy2"))
    ).cast("long")
    zones = (
        zord.unionByName(lin)
        .groupBy("layout", "file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"), F.max("x").alias("max_x"),
            F.min("y").alias("min_y"), F.max("y").alias("max_y"),
            F.sum(in_box).alias("n_match"),
            F.min("qx1").alias("qx1"), F.min("qx2").alias("qx2"),
            F.min("qy1").alias("qy1"), F.min("qy2").alias("qy2"),
        )
    )
    hit = (
        (F.col("max_x") >= F.col("qx1")) & (F.col("min_x") <= F.col("qx2"))
        & (F.col("max_y") >= F.col("qy1")) & (F.col("min_y") <= F.col("qy2"))
    ).cast("long")
    return zones.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(hit).cast("long").alias("files_hit"),
        F.coalesce(F.sum(F.col("n_rows") * hit), F.lit(0)).cast("long").alias("rows_scanned"),
        F.sum("n_match").cast("long").alias("rows_matching"),
    )


# ---------------------------------------------------------------------------
# TX21 — BPE vocabulary construction: first merge-iteration pair counts
# ---------------------------------------------------------------------------

@query(
    "tx21_bpe_merge_pairs",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '[a-z]+')) AS word
      FROM documents
    ), wf AS (
      SELECT word, COUNT(*) AS freq FROM toks GROUP BY word
    ), pairs AS (
      SELECT unnest([substr(word, CAST(i AS INT), 2)
                     for i in generate_series(1, length(word) - 1)]) AS pair,
             freq
      FROM wf WHERE length(word) >= 2
    ), pc AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count FROM pairs GROUP BY pair
    )
    SELECT * FROM (
      SELECT pair, pair_count,
             CAST(row_number() OVER (ORDER BY pair_count DESC, pair) AS BIGINT)
               AS merge_rank
      FROM pc
    ) ranked WHERE merge_rank <= 50
    """,
)
def tx21_bpe_merge_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TX21 — the tokenizer-training step the token COUNTING queries
    (tx1/tx8) presuppose: the first BPE merge iteration — count every
    adjacent symbol pair by corpus frequency and rank the merge
    candidates (Sennrich et al. 2016, the byte-pair-encoding vocab
    build every modern LM tokenizer starts from).

    Scale shape is the classic BPE corpus compression: pair counting
    runs over the DISTINCT-WORD table weighted by word frequency
    (one groupBy collapses the corpus from |tokens| to |vocab| rows —
    at 100 TB that's the difference between shuffling trillions of
    token instances and millions of distinct words), then adjacent
    pairs explode from each distinct word once. The final top-50
    window sorts a table bounded by the symbol alphabet squared
    (≤ 26² for lowercase ASCII) — constant-size regardless of corpus
    scale, so the single-partition window is not a bottleneck.
    Deterministic across engines: exact integer counts, ties broken
    by pair string."""
    d = read_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.coalesce(F.col("text"), F.lit(""))),
                F.lit("[a-z]+"), F.lit(0),
            )
        ).alias("word")
    )
    wf = toks.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.where(F.length("word") >= 2).select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "freq",
    )
    pc = pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("pair_count"))
    w = Window.orderBy(F.col("pair_count").desc(), F.col("pair"))
    return pc.select(
        "pair", "pair_count", F.row_number().over(w).cast("long").alias("merge_rank")
    ).where(F.col("merge_rank") <= 50)
