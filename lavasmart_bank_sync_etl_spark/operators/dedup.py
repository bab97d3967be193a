"""Deduplication operators (SURVEY.md §2.3 D1 + the LLM-pipeline
near-dup family from BASELINE.json).

D1 is the reference's first-wins key dedup; the rest are the
large-scale training-data operators: exact hash dedup, MinHash+LSH,
SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale notes baked into each implementation:
- first_wins: one window shuffle on the key — the same shuffle the
  downstream merge join needs, so AQE can reuse the exchange.
- minhash/simhash: signatures computed in the scan stage from an
  exploded shingle set; candidate pairs come from an equi-join on
  (band_id, band_hash) buckets, never an O(n²) cross join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def first_wins_dedup(
    df: DataFrame,
    key: str = "folio",
    order_cols: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """D1 — first-wins dedup by business key in explicit scan order
    (Code.gs:752-765).

    The reference's "scan order" (day asc, row position asc) is not a
    Spark concept, so callers must provide ``order_cols`` that pin it
    (SURVEY §4: e.g. ``["sale_date", "src_row_idx"]``). Returns
    (winners, losers); losers feed the DUPLICADO EN ORIGEN audit
    append (Code.gs:834-843).
    """
    order_cols = order_cols or ["sale_date", "src_row_idx"]
    w = Window.partitionBy(key).orderBy(*[F.col(c).asc_nulls_last() for c in order_cols])
    ranked = df.withColumn("_rn", F.row_number().over(w))
    winners = ranked.where(F.col("_rn") == 1).drop("_rn")
    losers = ranked.where(F.col("_rn") > 1).drop("_rn")
    return winners, losers


# ---------------------------------------------------------------------------
# LLM-pipeline dedup family (documents table)
# ---------------------------------------------------------------------------

def normalized_text(col: Column | str) -> Column:
    """Canonical text normalization used by all near-dup operators:
    lowercase, collapse whitespace, strip non-alphanumerics (keeps
    spaces)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.lower(F.coalesce(c, F.lit("")))
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: group by content hash, keep min-id representative.

    md5 over normalized text → 2-col shuffle of (hash, id) only; at
    100 TB the payload never moves, just the fingerprints.
    """
    h = F.md5(normalized_text(text_col))
    return (
        df.select(h.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingles_from_words(words: Column, k: int = 3) -> Column:
    """Word k-shingles from a materialized words array.

    ``words`` MUST be a plain column reference (not a nested expression
    tree): higher-order-function lambdas re-evaluate every expression
    they capture once per element, so shingling over an inline
    ``split(regexp_replace(...))`` re-runs the regex per shingle —
    O(doc_len²) per document. Materialize the array first, then
    shingle from the attribute.
    """
    n = F.size(words)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(
        n >= k,
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)))
        ),
    ).otherwise(F.array(F.concat_ws(" ", words)))


def shingles(col: Column | str, k: int = 3) -> Column:
    """Word k-shingles of normalized text as an array<string>.

    Built with transform over a split — no UDF; stays JVM-side.
    Prefer ``shingles_from_words`` over a materialized array column in
    hot paths (see its docstring for why).
    """
    return shingles_from_words(F.split(normalized_text(col), " "), k)


def _shingle_rows(
    df: DataFrame, text_col: str, id_col: str, k: int
) -> DataFrame:
    """(id, shingle) rows: repartition the (narrow) doc projection for
    parallelism — a single small parquet file otherwise pins the whole
    explode+hash pipeline to one task — then shingle from a
    materialized words array."""
    p = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w"))
        .repartition(p)
        .select(F.col(id_col), F.explode(shingles_from_words(F.col("_w"), k)).alias("shingle"))
    )


def _hash64(col: Column, seed: int) -> Column:
    """Deterministic 60-bit hash reproducible in DuckDB:
    ``CAST(('0x' || substr(md5(seed || s), 1, 15)) AS BIGINT)``.
    Spark side uses conv(hex→dec); both are pure builtins.
    """
    return F.conv(F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), col)), 1, 15), 16, 10).cast("long")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    k: int = 3,
) -> DataFrame:
    """MinHash signatures: explode shingles once, take per-seed mins in
    one aggregation (num_hashes min() columns — a single shuffle of
    (id, 16×8B), not one pass per hash function)."""
    exploded = _shingle_rows(df, text_col, id_col, k)
    aggs = [F.min(_hash64(F.col("shingle"), s)).alias(f"mh{s}") for s in range(num_hashes)]
    return exploded.groupBy(id_col).agg(*aggs)


def _band_buckets(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    extra_cols: list[str] | None = None,
) -> DataFrame:
    """(id, band_id, band_hash [, extra…]) bucket rows for LSH banding,
    with singleton buckets (unique band-hashes — the majority) dropped:
    they can't form a pair, and the pruning window rides the same
    (band_id, band_hash) partitioning the candidate join needs, so AQE
    reuses the exchange."""
    rows_per_band = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh{i}").cast("string") for i in range(b * rows_per_band, (b + 1) * rows_per_band)]
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), F.md5(F.concat_ws("_", *cols)).alias("band_hash"))
        )
    keep = [id_col, *(extra_cols or [])]
    buckets = sigs.select(*keep, F.explode(F.array(*band_cols)).alias("b")).select(
        *keep, F.col("b.band_id").alias("band_id"), F.col("b.band_hash").alias("band_hash")
    )
    return buckets.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_hash"))
    ).where(F.col("_n") > 1).drop("_n")


def minhash_lsh_candidates(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: signature → ``bands`` band-hashes; candidate pairs
    are ids sharing any (band_id, band_hash) bucket — an equi-join on
    the bucket key, the scale path that replaces all-pairs comparison.
    Returns distinct candidate pairs (id_a < id_b)."""
    buckets = _band_buckets(sigs, id_col, num_hashes, bands)
    left = buckets.alias("l")
    right = buckets.alias("r")
    pairs = (
        left.join(
            right,
            on=[
                F.col(f"l.band_id") == F.col(f"r.band_id"),
                F.col(f"l.band_hash") == F.col(f"r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )
    return pairs


def incremental_lsh_candidates(
    index_sigs: DataFrame,
    delta_sigs: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """Incremental dedup — the shape a production ingest runs daily:
    candidate pairs involving at least one NEW document (new-vs-new or
    new-vs-index), never re-deriving index-vs-index pairs that earlier
    runs already emitted.

    ``index_sigs`` is the stored signature table of the already-
    deduplicated corpus (at 100 TB: a parquet/bucketed table maintained
    by prior runs — computed once per document, ever); ``delta_sigs``
    are the new batch's signatures. Both band the same way; the
    candidate join is bucket-equi as in ``minhash_lsh_candidates`` but
    post-filtered to pairs touching the delta. Cost scales with
    |delta| × bucket collision rate, not |corpus|² — the dedup twin of
    the T7 incremental-aggregate pattern.

    Result equals ``minhash_lsh_candidates(index ∪ delta)`` minus the
    pairs internal to the index (the equivalence the dd15 oracle
    checks).
    """
    tagged = index_sigs.withColumn("_new", F.lit(0)).unionByName(
        delta_sigs.withColumn("_new", F.lit(1))
    )
    buckets = _band_buckets(tagged, id_col, num_hashes, bands, extra_cols=["_new"])
    left = buckets.alias("l")
    right = buckets.alias("r")
    return (
        left.join(
            right,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_hash") == F.col("r.band_hash"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .where((F.col("l._new") == 1) | (F.col("r._new") == 1))
        .select(F.col(f"l.{id_col}").alias("id_a"), F.col(f"r.{id_col}").alias("id_b"))
        .distinct()
    )


def shingle_sizes(sh_rows: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Per-doc shingle cardinality (``id_col``, sz) from exploded
    (id, shingle) rows — the union/min denominator every pair scorer
    joins twice. A staged shingle index materializes this beside the
    posting lists, once per corpus snapshot."""
    return sh_rows.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))


def shingle_postings(
    sh_rows: DataFrame,
    id_col: str = "doc_id",
    max_posting: int = 1000,
) -> DataFrame:
    """Multi-doc posting lists (shingle, ids) from exploded (id,
    shingle) rows: capped at ``max_posting`` ids (deterministic — first
    ids by sort order), sorted, singletons dropped. This IS the shingle
    index's posting-list table: the expensive shuffle+sort over every
    shingle row happens here, once per corpus snapshot; pair emission
    downstream touches only shingles shared by ≥2 docs."""
    capped = cap_postings(sh_rows, ["shingle"], [id_col], max_posting).select(
        "shingle", id_col
    )
    return (
        capped.groupBy("shingle")
        .agg(F.sort_array(F.collect_list(id_col)).alias("ids"))
        .where(F.size("ids") > 1)
    )


def _pair_counts_from_postings(postings: DataFrame) -> DataFrame:
    """(id_a, id_b, inter) from posting lists: emit each within-list
    pair via an array expression over the (primitive long) ids, count
    per pair — one narrow pass, no self-join (see ngram_jaccard_pairs
    docstring for the shape's rationale and skew bounds)."""
    ids = F.col("ids")
    pairs = postings.select(
        F.explode(
            F.flatten(
                F.transform(
                    ids,
                    lambda x, i: F.transform(
                        F.slice(ids, i + 2, F.size(ids)),
                        lambda y: F.struct(x.alias("a"), y.alias("b")),
                    ),
                )
            )
        ).alias("p")
    )
    return (
        pairs.select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    max_posting: int = 1000,
) -> DataFrame:
    """n-gram Jaccard near-dup: explode shingles, self-join on shingle
    to count intersections, derive |A∪B| from per-doc sizes.

    Pair generation is grouped, not self-joined: group by shingle,
    collect the (sorted) posting list, emit each within-list pair via
    an array expression, then count pairs — one shuffle of the shingle
    rows instead of a join that re-shuffles both sides, and only docs
    sharing a shingle ever meet (singleton shingles — the majority —
    drop out at ``size > 1``).

    Stop-shingle skew cap: a shingle shared by p docs emits p·(p-1)/2
    pairs, so one boilerplate shingle ("all rights reserved …") in p
    = 1e6 docs would emit 5e11 rows. Posting lists are truncated to
    the first ``max_posting`` doc_ids (row_number over the same
    shuffle — the collect_list then holds ≤ max_posting ids, bounding
    both pair count and per-group memory). Truncation only UNDER-
    counts intersections for pairs whose shared shingles are all
    hot — those are boilerplate matches far below any useful Jaccard
    threshold; the union denominator stays exact. Deterministic:
    lists are sorted by id before the cut. At 100 TB, additionally
    put the band/LSH prefilter (minhash_lsh_candidates) in front of
    this exact scorer.
    """
    sh = _shingle_rows(df, text_col, id_col, k)
    # |A| must count every shingle (union denominator) — before any filter.
    # The cap rides one sorted window pass (row_number over the same
    # shuffle the aggregate needs); singletons drop after the collect
    # (size > 1) as before. A second count-window for pre-filtering
    # singletons was measured: Spark plans it as a separate WindowExec
    # (different frame), costing more than the agg it would save.
    sizes = shingle_sizes(sh, id_col)
    inter = _pair_counts_from_postings(shingle_postings(sh, id_col, max_posting))
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def candidate_shingle_sets(
    df: DataFrame,
    candidates: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """(id, sh) shingle-set table for docs appearing in a candidate
    pair: the corpus is pruned with a semi-join against the candidate
    id set BEFORE shingle arrays are built, so set construction tracks
    |candidates|, not corpus size. The set-side artifact of the staged
    shingle index — persist it per corpus snapshot and every
    verification pass reads it."""
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    # the candidate id set is tiny relative to the corpus by
    # construction — broadcast it so the corpus side never shuffles for
    # the prune (size estimates after the union+distinct are unreliable,
    # so the hint, not the planner, carries this at scale)
    return (
        df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w"))
        .join(F.broadcast(cand_ids), id_col, "left_semi")
        .select(F.col(id_col), shingles_from_words(F.col("_w"), k).alias("sh"))
    )


def lsh_prefiltered_jaccard(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.8,
    candidates: DataFrame | None = None,
    shingle_sets: DataFrame | None = None,
) -> DataFrame:
    """The composed at-scale near-dup shape: MinHash+LSH candidate
    generation feeding EXACT n-gram-Jaccard verification restricted to
    the candidate pairs — the two-stage pipeline the dd3/dd4 docstrings
    prescribe for 100 TB, as one operator.

    Stage 1 (recall): ``minhash_lsh_candidates`` — bucketed equi-join,
    O(collisions) pairs, never all-pairs.
    Stage 2 (precision): exact Jaccard, but ONLY for candidate docs.
    The corpus is pruned with a left-semi join against the candidate id
    set before shingle arrays are built, so at 100 TB the exact scorer
    touches |candidates| documents, not the corpus; the verification
    itself is two id-equi-joins of the (small) pair list against the
    pruned shingle-set table plus ``array_intersect`` — no shingle
    self-join, no posting lists, no skew cap needed.

    ``candidates`` lets callers inject precomputed/persisted stage-1
    pairs (e.g. the shared dd3 output) — pass sigs built with the SAME
    num_hashes/bands. ``shingle_sets`` likewise injects the candidate
    docs' (id, sh) shingle-set table (``candidate_shingle_sets``
    output, e.g. session-persisted — the set-side artifact of the
    staged shingle index), so the verification pass reads it instead
    of re-normalizing and re-shingling the candidate docs per run;
    must be built with the SAME k over the SAME corpus/candidates.
    """
    if candidates is None:
        sigs = minhash_signatures(df, text_col, id_col, num_hashes, k)
        candidates = minhash_lsh_candidates(sigs, id_col, num_hashes, bands)
    if shingle_sets is None:
        shingle_sets = candidate_shingle_sets(df, candidates, text_col, id_col, k)
    a = shingle_sets.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = shingle_sets.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("jaccard", F.round(inter / union, 4))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per-token 32-bit hashes; fingerprint bit i
    is the sign of the sum over tokens of (bit set ? +1 : −1).

    Expressed as explode + groupBy with one SUM per bit-bucket via
    bit-extraction expressions; no UDF. 32 bits keeps the aggregate
    row narrow (32 longs) while remaining discriminative for dedup.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    tokens = (
        df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w"))
        .repartition(p)
        .select(F.col(id_col), F.explode(F.col("_w")).alias("tok"))
    )
    th = _hash64(F.col("tok"), 0)
    aggs = [
        F.sum(F.when(((th.bitwiseAND(F.lit(1 << i))) != 0), 1).otherwise(-1)).alias(f"b{i}")
        for i in range(bits)
    ]
    per_doc = tokens.groupBy(id_col).agg(*aggs)
    fp = None
    for i in range(bits):
        contrib = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        fp = contrib if fp is None else (fp + contrib)
    return per_doc.select(F.col(id_col), fp.cast("long").alias("simhash"))


def cap_postings(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    max_posting: int = 1000,
) -> DataFrame:
    """dd4's posting-list skew cap as a reusable primitive: keep the
    first ``max_posting`` rows per bucket key (deterministic order),
    bounding any downstream self-join's per-bucket fanout at
    max_posting² instead of letting degenerate content (one hash for
    every frame, one band value for boilerplate docs) quadratic-blow a
    single bucket. Truncation is measurable, never silent — see
    ``posting_cap_audit``."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        df.withColumn("_cap_rn", F.row_number().over(w))
        .where(F.col("_cap_rn") <= max_posting)
        .drop("_cap_rn")
    )


def simhash_hamming_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    sim_col: str = "simhash",
    bits: int = 32,
    bands: int = 4,
    max_hamming: int = 3,
    max_posting: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairing: candidates share at least one of
    ``bands`` byte-bands of the fingerprint, then verified with
    popcount(xor) ≤ ``max_hamming``.

    With ``max_hamming < bands`` the pigeonhole principle makes the
    band lookup EXACT (any pair within the Hamming ball must agree on
    ≥1 full band) — the default (3 < 4) returns precisely the
    Hamming-≤3 pairs with no all-pairs comparison. Raising
    ``max_hamming`` past ``bands-1`` trades exactness for recall.
    Singleton bands are dropped pre-join; surviving band buckets are
    truncated at ``max_posting`` ids (``cap_postings``) so degenerate
    content — a corpus of near-identical fingerprints collapsing into
    one band value — bounds the self-join at max_posting² per bucket
    instead of going quadratic in the corpus. Below the cap the
    pigeonhole exactness is untouched; above it the miss is bounded to
    capped buckets and measurable via ``posting_cap_audit``'s pattern.
    """
    band_width = bits // bands
    mask = (1 << band_width) - 1
    band_structs = [
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col(sim_col), b * band_width).bitwiseAND(F.lit(mask)).alias("band_val"),
        )
        for b in range(bands)
    ]
    banded = sigs.select(
        F.col(id_col), F.col(sim_col), F.explode(F.array(*band_structs)).alias("b")
    ).select(
        id_col, sim_col, F.col("b.band_id").alias("band_id"), F.col("b.band_val").alias("band_val")
    )
    banded = banded.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("band_id", "band_val"))
    ).where(F.col("_n") > 1).drop("_n")
    banded = cap_postings(banded, ["band_id", "band_val"], [id_col], max_posting)
    l, r = banded.alias("l"), banded.alias("r")
    pairs = (
        l.join(
            r,
            on=[
                F.col("l.band_id") == F.col("r.band_id"),
                F.col("l.band_val") == F.col("r.band_val"),
                F.col(f"l.{id_col}") < F.col(f"r.{id_col}"),
            ],
        )
        .select(
            F.col(f"l.{id_col}").alias("id_a"),
            F.col(f"r.{id_col}").alias("id_b"),
            F.bit_count(F.col(f"l.{sim_col}").bitwiseXOR(F.col(f"r.{sim_col}"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
    return pairs


def duplicate_passage_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    max_posting: int = 50,
    min_tokens: int = 16,
) -> DataFrame:
    """Cross-document duplicate PASSAGE detection at arbitrary
    alignment — the distributed approximation of suffix-array
    substring dedup (Lee et al., "Deduplicating Training Data Makes
    Language Models Better"): fixed-boundary chunk hashing (dd10)
    misses a copied paragraph that starts mid-chunk; this catches it.

    Shape: every doc emits rolling k-token window hashes WITH
    POSITIONS (stride 1); windows colliding across docs become match
    points (pa, pb); match points on the same alignment diagonal
    (pa − pb) with consecutive pa merge into maximal spans via the
    gaps-and-islands window (pa − row_number is constant within a
    run). Returns (id_a, id_b, start_a, start_b, span_tokens) for
    spans ≥ ``min_tokens``.

    Scale: only (id, pos, hash) tuples shuffle — window text never
    leaves the scan stage; posting lists per hash are capped at
    ``max_posting`` (ordered (doc, pos) — deterministic) exactly like
    ngram_jaccard_pairs, bounding hot-window (boilerplate) blowup;
    the island merge partitions by (pair, diagonal), so it
    parallelizes over pairs. A true suffix array beats this on one
    machine; this is the shape that runs on 1000 executors.
    """
    p = df.sparkSession.sparkContext.defaultParallelism
    words = (
        df.select(F.col(id_col), F.split(normalized_text(text_col), " ").alias("_w"))
        .repartition(p)
    )
    n = F.size("_w")
    idx = F.when(n >= k, F.sequence(F.lit(0), n - k)).otherwise(
        F.array().cast("array<int>")
    )
    wins = words.select(
        F.col(id_col),
        F.explode(
            F.transform(
                idx,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.concat_ws(" ", F.slice(F.col("_w"), i + 1, k)).alias("win"),
                ),
            )
        ).alias("s"),
    ).select(
        F.col(id_col),
        F.col("s.pos").cast("int").alias("pos"),
        _hash64(F.col("s.win"), 99).alias("h"),
    )
    wcap = Window.partitionBy("h").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    capped = (
        wins.withColumn("_rn", F.row_number().over(wcap))
        .where(F.col("_rn") <= max_posting)
        .drop("_rn")
    )
    a, b = capped.alias("a"), capped.alias("b")
    matches = a.join(
        b,
        on=[
            F.col("a.h") == F.col("b.h"),
            F.col(f"a.{id_col}") < F.col(f"b.{id_col}"),
        ],
    ).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
        F.col("a.pos").alias("pa"),
        F.col("b.pos").alias("pb"),
    )
    diag = (F.col("pa") - F.col("pb")).alias("diag")
    wisl = Window.partitionBy("id_a", "id_b", "diag").orderBy(F.col("pa").asc())
    islands = matches.select("id_a", "id_b", "pa", "pb", diag).withColumn(
        "isl", F.col("pa") - F.row_number().over(wisl)
    )
    return (
        islands.groupBy("id_a", "id_b", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.count(F.lit(1)) + F.lit(k - 1)).cast("long").alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_tokens)
        .select("id_a", "id_b", "start_a", "start_b", "span_tokens")
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.9,
    max_posting: int = 1000,
    postings: DataFrame | None = None,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup: containment (overlap coefficient) —
    ``|A∩B| / min(|A|, |B|)`` over k-shingle sets. Catches the case
    symmetric Jaccard misses by construction: a document quoted IN
    FULL inside a much larger one scores Jaccard ≈ |A|/|B| (→ 0 as B
    grows) but containment 1.0 — the embedded-duplicate rule curation
    pipelines (C4/RealNews lineage) apply beside symmetric dedup.

    Same machinery and scale bounds as ``ngram_jaccard_pairs`` (one
    shingle shuffle, grouped pair emission, ``max_posting`` skew cap
    — the cap can only under-count intersections of boilerplate-only
    pairs); only the denominator differs, so both scores ride one
    pass and are emitted together for contrast.

    ``postings``/``sizes`` let callers inject the staged shingle-index
    artifacts (``shingle_postings`` / ``shingle_sizes`` output, e.g.
    session-persisted tables built once per corpus snapshot) so the
    per-run plan touches only the small multi-doc posting lists — at
    100 TB the index is materialized beside the corpus and every pair
    pass reads it instead of re-shuffling all shingle rows. Must be
    built with the SAME k/max_posting over the SAME corpus.

    Output: id_a < id_b, containment (4dp), jaccard (4dp).
    """
    if postings is None or sizes is None:
        sh = _shingle_rows(df, text_col, id_col, k)
        if sizes is None:
            sizes = shingle_sizes(sh, id_col)
        if postings is None:
            postings = shingle_postings(sh, id_col, max_posting)
    inter = _pair_counts_from_postings(postings)
    sz_a = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sz_b = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sz_a, "id_a").join(sz_b, "id_b")
        .withColumn(
            "containment",
            F.round(F.col("inter") / F.least("sz_a", "sz_b"), 4),
        )
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4),
        )
        .where(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment", "jaccard")
    )


def posting_cap_audit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    max_posting: int = 1000,
) -> DataFrame:
    """Measure — not assert — what the shingle posting-list cap drops.

    ``ngram_jaccard_pairs`` / ``ngram_containment_pairs`` truncate each
    shingle's posting list at ``max_posting`` ids (the stop-shingle
    skew cap). The cap is sound on organic corpora but SILENT: a
    boilerplate-heavy corpus where many shingles exceed it would
    under-count intersections without a trace. This audit rides the
    same single shingle shuffle the pair queries use and reports, in
    one row: distinct shingles, how many hit the cap, how many
    (doc, shingle) postings the cap drops, and the longest posting
    list — the "no silent caps" companion every capped-pair run should
    log beside its pairs.

    Scale: one groupBy on the shingle key (the exact shuffle dd4
    already pays) collapsed to per-shingle counts, then a one-row
    aggregate; nothing text-sized survives the first exchange.
    """
    posting = (
        _shingle_rows(df, text_col, id_col, k)
        .groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # Sums coalesce to 0 on an EMPTY posting frame (the degenerate
    # input an audit must handle) to match the oracle's COALESCE;
    # max_posting_len stays NULL-on-empty on both engines.
    return posting.agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.coalesce(
            F.sum((F.col("n") > max_posting).cast("long")), F.lit(0)
        ).alias("capped_shingles"),
        F.coalesce(
            F.sum(F.greatest(F.col("n") - max_posting, F.lit(0))), F.lit(0)
        ).alias("dropped_postings"),
        F.max("n").alias("max_posting_len"),
    )
