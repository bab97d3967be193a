"""Degenerate-input behavior of the text/dedup operator family:
empty, null, whitespace-only, sub-shingle-length, and symbol-only
documents must flow through every operator without nulls, crashes, or
surprise rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from lavasmart_bank_sync_etl_spark.functions import text as T
from lavasmart_bank_sync_etl_spark.operators import dedup as DD

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, ""),                       # empty
    (3, None),                     # null
    (4, "   \t  "),                # whitespace only
    (5, "two words"),              # below shingle length k=3
    (6, "!!! ??? ***"),            # symbols only → normalizes to ''
    (7, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_counts_degenerate(spark):
    d = docs_df(spark)
    got = {r["doc_id"]: (r["ws"], r["bpe"]) for r in d.select(
        "doc_id",
        T.token_count_ws("text").alias("ws"),
        T.token_count_bpe_ish("text").alias("bpe"),
    ).collect()}
    assert got[1] == (9, 9)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)
    assert got[4] == (0, 0)
    assert got[6][0] == 0 and got[6][1] == 9  # 9 symbol tokens BPE-ish


def test_exact_dedup_degenerate(spark):
    out = {r["keep_id"]: r["n_copies"] for r in DD.exact_dedup(docs_df(spark)).collect()}
    # doc 1 and 7 collapse; empty-normalizing docs 2,3,4,6 collapse together
    assert out[1] == 2
    assert out[2] == 4
    assert out[5] == 1


def test_shingles_fallback_below_k(spark):
    d = docs_df(spark)
    got = {
        r["doc_id"]: r["sh"]
        for r in d.select(
            "doc_id", DD.shingles(F.col("text"), 3).alias("sh")
        ).collect()
    }
    assert got[5] == ["two words"]  # whole normalized text as the one shingle
    assert got[2] == [""]
    assert got[1][0] == "the quick brown"


def test_minhash_and_simhash_no_nulls(spark):
    d = docs_df(spark)
    sigs = DD.minhash_signatures(d, num_hashes=4).collect()
    assert len(sigs) == len(DOCS)
    assert all(r[f"mh{i}"] is not None for r in sigs for i in range(4))
    sh = DD.simhash(d).collect()
    assert len(sh) == len(DOCS)
    assert all(r["simhash"] is not None for r in sh)


def test_incremental_lsh_equals_full_minus_index_pairs(spark):
    """dd15's contract: incremental candidates (delta vs index+delta)
    must equal the full-corpus candidate set minus pairs internal to
    the index — no pair lost, no index-vs-index pair re-derived."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again tonight"),
        (3, "completely different text about database systems and joins"),
        (10, "the quick brown fox jumps over the lazy dog again today"),
        (11, "completely different text about database systems and joins"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = DD.minhash_signatures(d, num_hashes=8)
    index_sigs = sigs.where(F.col("doc_id") < 10)
    delta_sigs = sigs.where(F.col("doc_id") >= 10)

    full = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_candidates(sigs, num_hashes=8, bands=2).collect()
    }
    expected = {(a, b) for a, b in full if a >= 10 or b >= 10}
    got = {
        (r["id_a"], r["id_b"])
        for r in DD.incremental_lsh_candidates(
            index_sigs, delta_sigs, num_hashes=8, bands=2
        ).collect()
    }
    assert got == expected
    assert any(a < 10 <= b for a, b in got)  # new-vs-index pairs exist
    assert all(not (a < 10 and b < 10) for a, b in got)


def test_rolling_fp_is_order_sensitive(spark):
    rows = [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["fp"]
        for r in d.select("doc_id", T.tokens("text").alias("_w"))
        .select("doc_id", T.rolling_fingerprint(F.col("_w")).alias("fp"))
        .collect()
    }
    assert got[1] == got[3]
    assert got[1] != got[2]  # same tokens, different order → different fp
    # content hash (tx4) is also order-sensitive over raw text, but the
    # 60-bit rolling fp must stay in range
    assert 0 <= got[1] < (1 << 40)


def test_quality_and_language_degenerate(spark):
    d = docs_df(spark)
    got = {r["doc_id"]: (r["q"], r["lang"]) for r in d.select(
        "doc_id",
        T.quality_score("text").alias("q"),
        T.detect_language("text").alias("lang"),
    ).collect()}
    assert got[2] == (0.0, "und")
    assert got[3] == (0.0, "und")
    assert got[1][1] == "en"
    for q, _ in got.values():
        assert 0.0 <= q <= 1.0


def test_compression_ratio_values(spark):
    """Pin exact zlib ratios (no SQL oracle exists for tx16): repeated
    text compresses far below distinct text; empty -> 1.0."""
    import zlib

    from lavasmart_bank_sync_etl_spark.functions.text import compression_ratio

    rows = [
        (0, "abc " * 200),
        (1, " ".join(f"w{i}" for i in range(200))),
        (2, ""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["r"] for r in df.select(
        "doc_id", compression_ratio("text").alias("r")).collect()}
    for doc_id, text in rows:
        if not text:
            assert got[doc_id] == 1.0
        else:
            b = text.encode()
            assert got[doc_id] == round(len(zlib.compress(b, 6)) / len(b), 4)
    assert got[0] < 0.05 < got[1]


def test_ngram_jaccard_stop_shingle_cap(spark):
    """dd4 skew cap: a shingle shared by p docs must emit pairs from at
    most max_posting of them — p·(p-1)/2 uncapped would explode
    quadratically at scale — while docs whose overlap doesn't rely on
    the hot shingle alone are unaffected."""
    # 40 docs all sharing one boilerplate shingle, otherwise disjoint
    hot = [(i, f"all rights reserved tok{i}a tok{i}b tok{i}c") for i in range(40)]
    df = spark.createDataFrame(hot, "doc_id long, text string")

    capped = DD.ngram_jaccard_pairs(df, threshold=0.0, max_posting=5).collect()
    # the boilerplate shingles' posting lists are cut to 5 ids -> every
    # emitted pair has both endpoints among the 5 smallest doc_ids
    assert capped, "cap must truncate, not erase"
    assert all(r["id_a"] < 5 and r["id_b"] < 5 for r in capped)
    assert len(capped) <= 5 * 4 / 2

    uncapped = DD.ngram_jaccard_pairs(df, threshold=0.0, max_posting=10_000)
    assert uncapped.count() == 40 * 39 / 2  # all pairs share a shingle


def test_ngram_jaccard_cap_no_op_on_normal_corpus(spark):
    """With no posting list past the cap, results are identical to the
    uncapped operator (the registered dd4 contract: hash unchanged on
    normal corpora)."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text about spark partitions here"),
        (4, "the quick brown fox jumps over the lazy dog"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    a = sorted(map(tuple, DD.ngram_jaccard_pairs(df, threshold=0.2).collect()))
    b = sorted(map(tuple, DD.ngram_jaccard_pairs(df, threshold=0.2, max_posting=10_000).collect()))
    assert a == b and a


def test_simhash_band_cap_bounds_degenerate_corpus(spark):
    """dd7's banded join under DEGENERATE content: many docs with the
    IDENTICAL fingerprint collapse into one band bucket per band; the
    posting cap must bound the pair join at max_posting² instead of
    n², and every emitted pair comes from the cap's survivors (the
    lowest ids). An organic corpus below the cap is untouched."""
    n = 200
    sigs = spark.createDataFrame(
        [(i, 0b1010_1010_1010_1010) for i in range(n)], "doc_id long, simhash long"
    )
    capped = DD.simhash_hamming_pairs(sigs, max_posting=10).collect()
    assert capped, "cap must truncate, not erase"
    assert all(r["id_a"] < 10 and r["id_b"] < 10 for r in capped)
    assert len(capped) == 10 * 9 / 2  # identical hashes: every kept pair
    # below the cap: identical to uncapped
    small = spark.createDataFrame(
        [(1, 7), (2, 7), (3, 6), (4, 1 << 20)], "doc_id long, simhash long"
    )
    a = sorted(map(tuple, DD.simhash_hamming_pairs(small).collect()))
    b = sorted(map(tuple, DD.simhash_hamming_pairs(small, max_posting=10_000).collect()))
    assert a == b and a


def test_mm6_cap_bounds_identical_frames(spark):
    """mm6's hash-pair join under a corpus of ALL-IDENTICAL frames:
    cap_postings on the hash bucket keeps the join bounded (the
    'video full of black frames' case). 300 frames of one hash with
    cap 20 → only the 20 smallest (video, fidx) survive the bucket."""
    fh = spark.createDataFrame(
        [(v, f, "0" * 64) for v in range(75) for f in range(4)],
        "video_id long, fidx long, dhash_bits string",
    )
    kept = DD.cap_postings(fh, ["dhash_bits"], ["video_id", "fidx"], 20)
    rows = kept.collect()
    assert len(rows) == 20
    assert all(r["video_id"] < 5 for r in rows)  # 5 videos × 4 frames
    pairs = (
        kept.alias("a")
        .join(kept.alias("b"), "dhash_bits")
        .where(F.col("a.video_id") < F.col("b.video_id"))
    )
    assert pairs.count() == (20 * 20 - 20 * 4) / 2  # bounded, not 300²


def test_boilerplate_removal_drops_shared_windows(spark, sf_dir):
    """tx20 contract on the real corpus: a document whose every
    sentence is unique keeps ratio 1.0; documents sharing a window
    lose exactly those windows; totals reconcile."""
    from lavasmart_bank_sync_etl_spark.queries_pipeline import tx20_boilerplate_lines

    rows = {r["doc_id"]: r for r in tx20_boilerplate_lines(spark, sf_dir).collect()}
    assert rows  # every document emits one row
    for r in rows.values():
        assert 0 <= r["n_boiler"] <= r["n_sents"]
        if r["n_boiler"] == 0:
            assert r["kept_ratio"] == 1.0 and r["retained_hash"] is not None
        if r["n_boiler"] == r["n_sents"]:
            assert r["retained_hash"] is None
    # the corpus genuinely contains cross-doc repeated windows
    assert any(r["n_boiler"] > 0 for r in rows.values())


def test_injected_shingle_index_matches_internal_path(spark):
    """dd17's staged shingle-index injection: ngram_containment_pairs
    fed pre-built posting-list/size tables (shingle_postings /
    shingle_sizes — what the query layer session-persists) must emit
    exactly the rows of the self-contained path."""
    near = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (12, "one two three four five six seven eight nine ten"),
        (13, "completely different words with no overlap whatsoever here"),
    ]
    d = spark.createDataFrame(near, "doc_id long, text string")
    base = DD.ngram_containment_pairs(d, threshold=0.5)
    sh = DD._shingle_rows(d, "text", "doc_id", 3)
    injected = DD.ngram_containment_pairs(
        d,
        threshold=0.5,
        postings=DD.shingle_postings(sh),
        sizes=DD.shingle_sizes(sh),
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, injected.collect())
    )
    assert base.collect()  # the fixture genuinely produces pairs


def test_injected_shingle_sets_match_internal_path(spark):
    """dd13's set-side index injection: lsh_prefiltered_jaccard fed a
    pre-built candidate shingle-set table (candidate_shingle_sets —
    what the query layer session-persists) must emit exactly the rows
    of the self-contained path."""
    near = [
        (10, "alpha beta gamma delta epsilon zeta eta theta"),
        (11, "alpha beta gamma delta epsilon zeta eta theta iota"),
        (12, "one two three four five six seven eight nine ten"),
        (13, "one two three four five six seven eight nine eleven"),
    ]
    d = spark.createDataFrame(near, "doc_id long, text string")
    sigs = DD.minhash_signatures(d, num_hashes=8)
    cands = DD.minhash_lsh_candidates(sigs, num_hashes=8, bands=2)
    base = DD.lsh_prefiltered_jaccard(d, threshold=0.3, candidates=cands)
    injected = DD.lsh_prefiltered_jaccard(
        d,
        threshold=0.3,
        candidates=cands,
        shingle_sets=DD.candidate_shingle_sets(d, cands),
    )
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, injected.collect())
    )
    assert base.collect()  # candidates genuinely survive verification
