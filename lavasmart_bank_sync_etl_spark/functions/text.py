"""Text-analysis functions for the training-data pipeline
(BASELINE.json north-star: language-ID, quality scoring, token
counting, document fingerprinting).

All pure column expressions over ``documents.text`` — they run inside
the scan stage, vectorized, with zero Python. At 100 TB these are the
cheapest possible per-document features: one pass, no shuffle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import normalized_text

#: Minimal per-language stopword marker sets for the n-gram heuristic.
#: Public knowledge (standard closed-class words).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "fr": ["le", "la", "les", "et", "une"],
    "de": ["der", "die", "das", "und", "ist"],
}

#: BPE-ish tokenizer regex: word pieces, numbers, or single
#: non-space symbols — the standard pre-tokenization split.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of normalized text as array<string>."""
    return F.split(normalized_text(col), " ")


def token_count_ws(col: Column | str) -> Column:
    """Whitespace token count."""
    t = tokens(col)
    return F.when(F.size(t) == 1, F.when(F.element_at(t, 1) == "", 0).otherwise(1)).otherwise(
        F.size(t)
    )


def token_count_bpe_ish(col: Column | str) -> Column:
    """BPE-ish token count: alpha runs + digit runs + individual
    symbols (regexp_count — one vectorized pass)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.coalesce(c, F.lit("")), F.lit(BPE_ISH_PATTERN))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of tokens that are marker stopwords for ``lang``."""
    t = tokens(col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(t, lambda x: F.array_contains(markers, x)))


def detect_language(col: Column | str) -> Column:
    """Language-ID heuristic: the language whose marker-stopword hit
    count is highest wins; ties/zero → 'und'. Deterministic tie-break
    by fixed language order en > es > fr > de."""
    best = F.lit("und")
    best_hits = F.lit(0)
    for lang in ["de", "fr", "es", "en"]:  # reverse priority; later wins ties via >=
        h = stopword_hits(col, lang)
        cond = h > best_hits
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_hits = F.when(cond, h).otherwise(best_hits)
    return best


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are punctuation/symbols (4dp)."""
    c = F.coalesce((F.col(col) if isinstance(col, str) else col), F.lit(""))
    n = F.length(c)
    p = F.length(F.regexp_replace(c, r"[A-Za-z0-9\s]", ""))
    return F.when(n > 0, F.round(p / n, 4)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Composite quality score ∈ [0,1] (4dp): length sweet-spot ×
    low-punctuation × stopword presence — the standard cheap quality
    gate for pretraining corpora."""
    c = F.coalesce((F.col(col) if isinstance(col, str) else col), F.lit(""))
    n_chars = F.length(c)
    len_score = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_penalty = F.lit(1.0) - F.least(punct_ratio(c) * 5, F.lit(1.0))
    n_tok = token_count_ws(c)
    sw = stopword_hits(c, "en")
    sw_score = F.when(n_tok > 0, F.least(sw / F.greatest(n_tok * 0.05, F.lit(1.0)), F.lit(1.0))).otherwise(F.lit(0.0))
    return F.round(len_score * punct_penalty * (F.lit(0.5) + F.lit(0.5) * sw_score), 4)


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: 60-bit integer hash of normalized text
    (md5-derived, reproducible in DuckDB as
    CAST('0x'||substr(md5(s),1,15) AS BIGINT))."""
    return F.conv(F.substring(F.md5(normalized_text(col)), 1, 15), 16, 10).cast("long")


def chunk_starts(words: Column, chunk_size: int, stride: int) -> Column:
    """0-based token offsets of each chunk window: 0, stride, 2·stride…
    while the start is inside the document."""
    n = F.size(words)
    last = F.floor((F.greatest(n, F.lit(1)) - 1) / stride).cast("int")
    return F.transform(F.sequence(F.lit(0), last), lambda i: i * stride)


def chunk_texts(words: Column, chunk_size: int = 50, stride: int = 40) -> Column:
    """Sliding token-window chunks (size ``chunk_size``, overlap
    ``chunk_size − stride``) as array<string> — the standard context-
    window split for embedding/pretraining pipelines. Pure array
    expressions over a MATERIALIZED words column (HOF capture rule,
    see operators.dedup.shingles_from_words)."""
    return F.transform(
        chunk_starts(words, chunk_size, stride),
        lambda s: F.concat_ws(" ", F.slice(words, s + 1, chunk_size)),
    )


#: modulus for the rolling hash — keeps acc*31 + token_hash < 2^63
#: under ANSI arithmetic (Spark 4 default) and DuckDB BIGINT alike.
ROLLING_MOD = 1 << 40


def rolling_fingerprint(words: Column) -> Column:
    """Order-sensitive polynomial rolling hash over a materialized
    token array: fold((acc·31 + h(tok)) mod 2⁴⁰). Unlike
    ``fingerprint`` (content hash), token *order* changes the value —
    the standard shift-register fingerprint for chunk-level dedup.

    ``words`` must be a plain column reference (see
    operators.dedup.shingles_from_words for why: HOF lambdas
    re-evaluate captured expression trees per element)."""
    mod = F.lit(ROLLING_MOD)
    return F.aggregate(
        words,
        F.lit(0).cast("long"),
        lambda acc, t: F.pmod(
            acc * F.lit(31)
            + F.pmod(
                F.conv(F.substring(F.md5(F.concat(F.lit("0|"), t)), 1, 15), 16, 10).cast("long"),
                mod,
            ),
            mod,
        ),
    )


def compression_ratio(col: Column | str) -> Column:
    """zlib compression ratio of the UTF-8 text (compressed/original,
    4dp; empty -> 1.0) — the cheap entropy proxy quality filters use
    to catch boilerplate and degenerate repetition (highly compressible
    => low-information text).

    This is the repo's one scalar ``pandas_udf``: zlib has no SQL
    equivalent, so it rides the Arrow batch path — columnar transfer,
    one Python call per batch, never per row. At 100 TB it remains
    scan-local (no shuffle) and scales with executor Python workers."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if t is None or t == "":
                return 1.0
            b = t.encode("utf-8")
            return round(len(zlib.compress(b, 6)) / len(b), 4)

        return s.map(one).astype("float64")

    return _ratio(F.col(col) if isinstance(col, str) else col)
