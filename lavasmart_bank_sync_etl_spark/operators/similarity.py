"""Similarity search over embedding columns (BASELINE.json
north-star): brute-force cosine top-k baseline + LSH-bucketed scale
path.

Scale design: brute force is a broadcast of the (small) query set
against the corpus — O(|corpus|·|queries|) work but embarrassingly
parallel, no shuffle of the corpus. The LSH variant buckets by
random-hyperplane sign bits so candidate generation is an equi-join on
the bucket key; at 100 TB only same-bucket pairs are scored. For IVF
semantics, replace the hyperplane bucket with a nearest-centroid
assignment — same join shape.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, LongType, StructField, StructType,
)

from ..functions.vectors import cosine, dot


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query: broadcast queries × corpus,
    score with the built-in cosine expression, keep rank ≤ k via a
    per-query window. Excludes self-matches.

    Output: query_id, neighbor_id, score (4dp), rank.
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        q.crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def hyperplane_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH bucket id: one sign bit per plane,
    packed into an int. Planes are fixed constants → pure expression,
    evaluated at scan time."""
    bucket = F.lit(0)
    for i, p in enumerate(planes):
        prods = F.zip_with(
            vec, F.array(*[F.lit(float(x)) for x in p]), lambda a, b: a.cast("double") * b
        )
        d = F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)
        bucket = bucket + F.when(d >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    planes: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only candidates sharing the query's
    hyperplane bucket (equi-join on bucket id — the 100 TB path where
    a cross join is impossible). Recall is tuned by the number of
    planes (fewer planes → bigger buckets → higher recall & cost)."""
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    scored = (
        F.broadcast(qb)
        .join(cb, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 4).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return scored.withColumn("rank", F.row_number().over(w).cast("long")).where(F.col("rank") <= k)


def ivf_cells(
    corpus: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """IVF index build: deterministic seed partition (``id % n_cells``)
    → element-wise mean centroids (one k-means step) → every vector
    re-assigned to its nearest centroid by cosine.

    Returns (centroids, assignment): ``centroids(cell, cvec)`` is tiny
    (n_cells rows — broadcast side), ``assignment(id, vec, cell)`` adds
    the inverted-list key to the corpus. Centroid coordinates are
    rounded to 6dp so the downstream plan is reproducible across
    engines regardless of aggregation order.

    Scale notes: centroid build is two narrow shuffles (posexplode →
    (cell,pos) agg → n_cells·dim rows). Assignment costs ZERO corpus
    shuffle and zero row blowup: the n_cells centroids are collapsed
    into a one-row array, broadcast, and each corpus row computes all
    n_cells cosines inside one ``transform`` + takes ``array_max``
    over (score, -cell) structs — a pure projection in the scan
    stage. (The previous shape — explode to n_cells rows per vector +
    groupBy(vid) argmax — shuffled n_cells copies of every embedding.)
    """
    seeded = _seeded(corpus, n_cells, id_col, vec_col)
    centroids = _build_centroids(seeded)
    return centroids, _assign(seeded, _centroid_array(centroids))


def _seeded(corpus: DataFrame, n_cells: int, id_col: str, vec_col: str) -> DataFrame:
    return corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).alias("vec"),
        F.pmod(F.col(id_col), F.lit(n_cells)).alias("cell0"),
    )


def _build_centroids(seeded: DataFrame) -> DataFrame:
    by_pos = seeded.select("cell0", F.posexplode("vec").alias("pos", "val"))
    return (
        by_pos.groupBy("cell0", "pos")
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("cv"))
        .groupBy("cell0")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("cvec")
        )
        .select(F.col("cell0").alias("cell"), "cvec")
    )


def _assign(seeded: DataFrame, cent_arr: DataFrame) -> DataFrame:
    return seeded.crossJoin(F.broadcast(cent_arr)).select(
        "vid",
        "vec",
        F.array_max(_cell_scores(F.col("vec")))["cell"].alias("cell"),
    )


def _centroid_row(seeded: DataFrame) -> DataFrame:
    """``_centroid_array(_build_centroids(seeded))`` fused into TWO
    aggregations instead of three (r13, guide §2.4): the (cell, pos)
    mean rows collapse straight into the one-row cid-sorted,
    unit-normalized ``cents`` array in a single global agg — identical
    doubles (same 6dp-rounded means, same normalization expression,
    same cell order via the sorted collect)."""
    by_pos = seeded.select("cell0", F.posexplode("vec").alias("pos", "val"))
    means = by_pos.groupBy("cell0", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("cv")
    )

    def unit(cvec):
        n = F.sqrt(F.aggregate(cvec, F.lit(0.0), lambda a, x: a + x * x))
        return F.when(n > 0, F.transform(cvec, lambda x: x / n)).otherwise(
            F.transform(cvec, lambda x: x * 0.0)
        )

    def cvec_of(c):
        return F.transform(F.filter("s", lambda x: x["cell0"] == c), lambda x: x["cv"])

    return (
        means.agg(F.array_sort(F.collect_list(F.struct("cell0", "pos", "cv"))).alias("s"))
        .select(
            F.transform(
                F.array_distinct(F.transform("s", lambda x: x["cell0"])),
                lambda c: F.struct(c.alias("cell"), unit(cvec_of(c)).alias("cvec_n")),
            ).alias("cents")
        )
    )


def _centroid_array(centroids: DataFrame) -> DataFrame:
    """All centroids as ONE row ``cents: array<struct<cell, cvec_n>>``
    (sorted by cell, centroid pre-normalized to unit length; an
    all-zero centroid stays zero) — the broadcast-as-array side of the
    shuffle-free nearest-centroid projection."""
    from ..functions.vectors import norm

    n = norm(F.col("cvec"))
    unit = F.when(
        n > 0, F.transform(F.col("cvec"), lambda x: x / n)
    ).otherwise(F.transform(F.col("cvec"), lambda x: x * 0.0))
    return centroids.select("cell", unit.alias("cvec_n")).agg(
        F.array_sort(F.collect_list(F.struct("cell", "cvec_n"))).alias("cents")
    )


def _cell_scores(vec: Column) -> Column:
    """Per-row array of ``struct(cscore, ncell, cell)`` against the
    broadcast pre-normalized ``cents`` column, ranked by DOT product:
    dot(v, ĉ) = cosine(v, c)·‖v‖, and ‖v‖ > 0 is constant within the
    row, so argmax/sort order over cells is exactly the cosine order
    (all-zero v ⇒ all dots 0 ⇒ same min-cell tie-break) — while
    skipping 2·n_cells norm recomputations per row. Struct comparison
    is lexicographic: (score, -cell) ⟺ score desc then cell asc —
    identical tie-breaking to the previous aggregate/window forms."""
    return F.transform(
        F.col("cents"),
        lambda c: F.struct(
            dot(vec, c["cvec_n"]).alias("cscore"),
            (-c["cell"]).alias("ncell"),
            c["cell"].alias("cell"),
        ),
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: queries probe their ``nprobe`` nearest
    cells; only vectors assigned to a probed cell are scored — the
    inverted-file analog of the LSH bucket join. At 100 TB the
    assignment is a stored partition/bucket column, so the candidate
    join prunes to nprobe/n_cells of the corpus.

    The one-row centroid array — the IVF *index* — is built once and
    persisted for the invocation: both consumers (corpus assignment,
    query probe selection) read the cached row instead of re-running
    the centroid aggregation's two shuffles (at 100 TB the analog is a
    stored index table, computed once per corpus snapshot)."""
    seeded = _seeded(corpus, n_cells, id_col, vec_col)
    cent_arr = _centroid_row(seeded).persist()
    assignment = _assign(seeded, cent_arr)
    qs = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # nprobe nearest cells per query with the same shuffle-free array
    # projection as the assignment: sort the n_cells (score, -cell)
    # structs descending, slice nprobe, explode — no window, no
    # queries×n_cells intermediate.
    probes = (
        qs.crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id",
            "q_vec",
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(_cell_scores(F.col("q_vec")))),
                    1,
                    nprobe,
                )["cell"]
            ).alias("cell"),
        )
    )
    cands = (
        F.broadcast(probes)
        .join(assignment, on="cell")
        .where(F.col("query_id") != F.col("vid"))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            F.round(cosine(F.col("q_vec"), F.col("vec")), 4).alias("score"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("neighbor_id").asc())
    return cands.withColumn("rank", F.row_number().over(wk).cast("long")).where(F.col("rank") <= k)


def auto_num_blocks(
    n_rows: int,
    dim: int,
    target_block_bytes: int = 64 << 20,
    max_blocks: int = 4096,
) -> int:
    """Self-sizing block count for the blocked all-pairs kernel: the
    smallest B such that one block's dense float64 matrix (n/B rows ×
    dim × 8 bytes) fits ``target_block_bytes`` of executor memory.
    Monotone non-decreasing in both ``n_rows`` and ``dim``; clamped to
    [1, max_blocks] so block-pair task count B·(B+1)/2 stays bounded
    (past that, the LSH ``planes`` path is the right tool, not more
    blocks)."""
    if n_rows <= 0 or dim <= 0:
        return 1
    rows_per_block = max(1, target_block_bytes // (dim * 8))
    b = -(-n_rows // rows_per_block)  # ceil division
    return max(1, min(b, max_blocks))


def embedding_near_dup(
    corpus: DataFrame,
    threshold: float = 0.95,
    planes: list[list[float]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cosine ≥
    threshold). With ``planes``, candidates come from LSH buckets
    (scale path); without, exact all-pairs via a **blocked
    block-nested-loop**: rows are hashed into ``num_blocks`` blocks,
    each of the B·(B+1)/2 unordered block pairs is co-grouped, and the
    block×block score matrix is computed with one vectorized numpy
    matmul per pair (Arrow-batched ``applyInPandas`` cogroup).

    Scale notes: shuffle volume is (B+1)/2 copies of the corpus.
    ``num_blocks=None`` self-sizes via ``auto_num_blocks`` — one
    count+width metadata job at plan-build time derives the smallest B
    whose per-block matrix fits a 64 MiB budget, so the kernel holds
    its memory bound as the corpus grows instead of relying on a
    hand-tuned constant. Work is B·(B+1)/2 independent tasks.
    All-pairs is inherently O(n²) score work at any engine; beyond
    memory-feasible n, put the LSH bucketer (``planes``) in front so
    only same-bucket pairs are scored.
    """
    if planes is not None:
        a = corpus.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
        b = corpus.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
        a = a.withColumn("bucket", hyperplane_bucket(F.col("va"), planes))
        b = b.withColumn("bucket", hyperplane_bucket(F.col("vb"), planes))
        pairs = a.join(b, on="bucket").where(F.col("id_a") < F.col("id_b"))
        return (
            pairs.select(
                "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 4).alias("cos_sim")
            )
            .where(F.col("cos_sim") >= threshold)
        )

    spark = corpus.sparkSession
    if num_blocks is None:
        meta = corpus.agg(
            F.count(F.lit(1)).alias("n"), F.max(F.size(F.col(vec_col))).alias("dim")
        ).first()
        num_blocks = auto_num_blocks(int(meta["n"] or 0), int(meta["dim"] or 0))
    B = num_blocks
    base = corpus.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(B)).alias("blk"),
    )
    # (i, j) block-pair keys, i <= j — tiny driver-side relation
    def keys() -> DataFrame:
        return spark.range(B * B).select(
            (F.col("id") / B).cast("int").alias("i"), (F.col("id") % B).cast("int").alias("j")
        ).where(F.col("i") <= F.col("j"))

    left = (
        base.alias("bl")
        .join(F.broadcast(keys().alias("kl")), F.col("bl.blk") == F.col("kl.i"))
        .select(F.col("kl.i").alias("i"), F.col("kl.j").alias("j"),
                F.col("bl.vid").alias("vid"), F.col("bl.vec").alias("vec"))
    )
    right = (
        base.alias("br")
        .join(F.broadcast(keys().alias("kr")), F.col("br.blk") == F.col("kr.j"))
        .select(F.col("kr.i").alias("i"), F.col("kr.j").alias("j"),
                F.col("br.vid").alias("vid"), F.col("br.vec").alias("vec"))
    )

    out_schema = StructType([
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cos_sim", DoubleType()),
    ])

    def score_block(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"id_a": [], "id_b": [], "cos_sim": []})
        la = np.stack(lpdf["vec"].to_numpy())
        rb = np.stack(rpdf["vec"].to_numpy())
        lid = lpdf["vid"].to_numpy()
        rid = rpdf["vid"].to_numpy()
        ln = np.sqrt(np.einsum("ij,ij->i", la, la))
        rn = np.sqrt(np.einsum("ij,ij->i", rb, rb))
        denom = np.outer(ln, rn)
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = np.where(denom > 0, (la @ rb.T) / denom, 0.0)
        cos = np.round(cos, 4)
        if lpdf["i"].iloc[0] == lpdf["j"].iloc[0]:
            # diagonal block: both sides are the same rows — order by id
            ia, ib = np.nonzero((cos >= threshold) & (lid[:, None] < rid[None, :]))
            id_a, id_b = lid[ia], rid[ib]
        else:
            # off-diagonal: each unordered row pair appears exactly once
            ia, ib = np.nonzero(cos >= threshold)
            id_a = np.minimum(lid[ia], rid[ib])
            id_b = np.maximum(lid[ia], rid[ib])
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": cos[ia, ib]})

    return (
        left.groupBy("i", "j")
        .cogroup(right.groupBy("i", "j"))
        .applyInPandas(score_block, schema=out_schema)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) + asymmetric-distance (ADC) top-k
# ---------------------------------------------------------------------------

def _fp(vec: Column) -> Column:
    """Fixed-point copy of an embedding (×10000 → long): every
    distance downstream is an exact integer, so argmin/rank order and
    the driver's value hash cannot drift on float summation order
    across engines (the tx18 rationale applied to vector search)."""
    return F.transform(vec, lambda x: F.round(x.cast("double") * 10000).cast("long"))


def _sub_d2(a: Column, b: Column) -> Column:
    """Exact integer squared L2 between two long-vectors."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_encode(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """PQ index build: split each vector into ``n_sub`` subvectors and
    encode each as the id of its nearest codebook entry — the corpus
    side of the index carries ``n_sub`` small ints instead of the full
    float vector (here 8 codes for 64 floats: a 32× working-set
    compression, the reason PQ is the at-scale ANN memory format).

    The codebook is a deterministic *sampling* codebook — the
    ``n_codes`` lowest-id vectors, whatever those ids are (top-k via
    sort+limit = TakeOrdered, never a full sort; a k-means codebook
    like ml1's drops in without changing any downstream shape). It is
    collapsed to ONE broadcast row exactly like the IVF centroid
    array, so encoding is a shuffle-free projection over the corpus
    scan: per row, ``n_sub × n_codes`` integer subdistances + an
    ``array_min`` argmin. A code is the entry's POSITION in the
    id-sorted codebook (0-based) — not the entry's id — so downstream
    ``element_at(cb, code+1)`` lookups hold for ANY id distribution
    (gaps, offsets). Ties break to the smallest position.

    Returns ``(codebook_row, encoded)`` where ``codebook_row`` is the
    single-row ``cb: array<struct<k, subs>>`` (position-indexed,
    fixed-point, pre-split into subvectors so no slice runs inside
    the per-row argmin) and ``encoded`` is ``(vid, e, codes)``
    (``e`` fixed-point, kept for exact-rerank calibration; a pure
    ANN deployment would drop it)."""
    fp = corpus.select(
        F.col(id_col).alias("vid"), _fp(F.col(vec_col)).alias("e")
    )
    cb_row = (
        fp.orderBy("vid")
        .limit(n_codes)
        .select(F.struct(F.col("vid").alias("vid"), F.col("e")).alias("s"))
        .agg(F.array_sort(F.collect_list("s")).alias("cb0"))
        .select(
            F.transform(
                F.col("cb0"),
                lambda c, pos: F.struct(
                    pos.cast("long").alias("k"),
                    _split_subs(c["e"], n_sub).alias("subs"),
                ),
            ).alias("cb")
        )
    )
    # each row slices its vector into subvectors ONCE; the 16-way
    # argmin then indexes pre-split arrays (both sides) — 8+0 slices
    # per row instead of 8×(16+1)
    codes = F.transform(
        _split_subs(F.col("e"), n_sub),
        lambda sv, m: F.array_min(
            F.transform(
                F.col("cb"),
                lambda c: F.struct(
                    _sub_d2(sv, F.element_at(c["subs"], m + 1)).alias("d2"),
                    c["k"].alias("k"),
                ),
            )
        )["k"],
    )
    encoded = fp.crossJoin(F.broadcast(cb_row)).select(
        "vid", "e", codes.alias("codes")
    )
    return cb_row, encoded


def _split_subs(vec: Column, n_sub: int) -> Column:
    """Split a vector column into ``n_sub`` equal subvectors. A
    dimension not divisible by ``n_sub`` raises at execution instead
    of silently truncating the tail dims out of codes/ADC (which
    would desynchronize them from the full-vector exact distance)."""
    dim_per = (F.size(vec) / n_sub).cast("int")
    ok = F.size(vec) % n_sub == 0
    return F.when(
        ok,
        F.transform(
            F.sequence(F.lit(0), F.lit(n_sub - 1)),
            lambda m: F.slice(vec, (m * dim_per + 1).cast("int"), dim_per),
        ),
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"pq: vector dim not divisible by n_sub={n_sub}: "),
                F.size(vec).cast("string"),
            )
        )
    )


def _adc_d2(codes: Column, qsubs: Column, cb: Column) -> Column:
    """Asymmetric distance: Σ over subspaces of exact integer
    d²(query subvector, codebook[code]) — the PQ search kernel,
    shared by the flat (ss6) and IVF-restricted (ss8) scorers."""
    return F.aggregate(
        F.transform(
            codes,
            lambda code, m: _sub_d2(
                F.element_at(qsubs, m + 1),
                F.element_at(
                    F.element_at(cb, (code + 1).cast("int"))["subs"], m + 1
                ),
            ),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over the PQ index: the query
    keeps its exact (fixed-point) vector; each corpus vector is
    represented ONLY by its codes, and the approximate distance is the
    sum over subspaces of d²(query subvector, codebook[code]) — the
    standard PQ search. Alongside it the exact distance is computed
    from the retained vectors, so the result doubles as the
    quantization-error calibration (the a9/a10 pattern: approximate
    operator + exact truth in one row).

    Scale shape: queries broadcast (as in ss1); the corpus side of the
    scoring join carries 8 longs per row, not the vector — at 100 TB
    the codes column is ~3% of the float column, which is the entire
    point of PQ. Per (query, m) the codebook distances form a LUT; the
    oracle materializes that LUT join explicitly, this side inlines it
    as an expression over the same integers — both exact, so they
    agree bit-for-bit. Rank ties break by neighbor id."""
    cb_row, encoded = pq_encode(corpus, n_sub, n_codes, id_col, vec_col)
    # queries pre-split once (the per-query LUT's input); the per-pair
    # work is then n_sub pre-split lookups + integer sums only
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _fp(F.col(vec_col)).alias("qe"),
    ).withColumn("qsubs", _split_subs(F.col("qe"), n_sub))
    adc = _adc_d2(F.col("codes"), F.col("qsubs"), F.col("cb"))
    pairs = (
        F.broadcast(q)
        .crossJoin(encoded)
        .where(F.col("query_id") != F.col("vid"))
        .crossJoin(F.broadcast(cb_row))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            adc.alias("adc_d2"),
            _sub_d2(F.col("qe"), F.col("e")).alias("true_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k — the production ANN composition
    (Jégou et al., the FAISS ``IVFx,PQy`` shape): the inverted file
    restricts WHICH vectors are scored (ss3's candidate pruning) and
    product quantization decides HOW they are scored (ss6's 8-byte
    codes + integer ADC). Index build joins the two per-vector keys —
    ``(vid, cell)`` from nearest-centroid assignment and ``(vid,
    codes)`` from PQ encoding — into one index relation; queries
    probe their ``nprobe`` nearest cells and ADC-score only those
    inverted lists.

    Scale shape: at 100 TB the index relation is the stored table
    (cell = partition/bucket column, codes ≈ 3% of the float column —
    the only per-vector payload the search ever reads; the raw
    embedding column stays behind for reranking). Candidate volume is
    nprobe/n_cells of the corpus and each candidate moves 8 longs,
    which is the whole reason this composition is the at-scale
    default. Probes broadcast (queries are small); centroids and
    codebook are one-row broadcast arrays; the corpus never shuffles
    in the search path — the only corpus-wide shuffle is the
    build-time vid-equi-join assembling the index, the analog of
    writing the index table once per snapshot.

    Fixed-point integer ADC end-to-end (ss6's rationale): ranks are
    bit-identical across engines by construction.

    Output: query_id, neighbor_id, adc_d2, rank (≤ k).
    """
    if index is None:
        index = ivf_pq_index(corpus, n_cells, n_sub, n_codes, id_col, vec_col)
    return ivf_pq_search(
        index, queries, nprobe=nprobe, n_sub=n_sub, k=k,
        id_col=id_col, vec_col=vec_col,
    )


def ivf_pq_index(
    corpus: DataFrame,
    n_cells: int = 16,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    meta_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Build the IVF-PQ index once per corpus snapshot — the three
    stored relations a production deployment writes and every search
    reads: ``cent_arr`` (one-row centroid array, persisted),
    ``cb_row`` (one-row PQ codebook), and ``index`` (vid, codes,
    cell) — the only per-vector payload the search path touches.
    Callers that run several searches against the same corpus (ss8's
    flat search, ss9's shortlist) share one build instead of paying
    the corpus-wide assembly join per query."""
    seeded = _seeded(corpus, n_cells, id_col, vec_col)
    cent_arr = _centroid_row(seeded).persist()
    assignment = _assign(seeded, cent_arr).select("vid", "cell")
    cb_row, encoded = pq_encode(corpus, n_sub, n_codes, id_col, vec_col)
    index = encoded.select("vid", "codes").join(assignment, on="vid")
    if meta_cols:
        # filtered search needs the predicate columns IN the index —
        # the metadata rides the 8-byte codes, so a filter never
        # touches the raw corpus (the attribute-payload of a real
        # vector store's index segment)
        index = index.join(
            corpus.select(F.col(id_col).alias("vid"), *meta_cols), on="vid"
        )
    return cent_arr, cb_row, index


def ivf_pq_search(
    index_parts: tuple[DataFrame, DataFrame, DataFrame],
    queries: DataFrame,
    nprobe: int = 4,
    n_sub: int = 8,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    match_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Search the stored IVF-PQ index (``ivf_pq_index`` output):
    queries probe their ``nprobe`` nearest cells and ADC-score only
    those inverted lists. Probes broadcast; the corpus never moves.

    ``match_cols`` is FILTERED search: columns present in both the
    query set and the index (built with ``meta_cols``) are added to
    the candidate join key, so e.g. ``("label",)`` restricts each
    query to same-label candidates inside the hash join itself — no
    post-filter pass, no corpus access, and at scale the equi-key
    (cell, label) is exactly the composite the index layout prunes
    by."""
    cent_arr, cb_row, index = index_parts
    qs = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"), *match_cols
    )
    probes = (
        qs.crossJoin(F.broadcast(cent_arr))
        .select(
            "query_id",
            *match_cols,
            _fp(F.col("q_vec")).alias("qe"),
            F.explode(
                F.slice(
                    F.reverse(F.array_sort(_cell_scores(F.col("q_vec")))),
                    1,
                    nprobe,
                )["cell"]
            ).alias("cell"),
        )
        .withColumn("qsubs", _split_subs(F.col("qe"), n_sub))
        .drop("qe")
    )
    pairs = (
        F.broadcast(probes)
        .join(index, on=["cell", *match_cols])
        .where(F.col("query_id") != F.col("vid"))
        .crossJoin(F.broadcast(cb_row))
        .select(
            "query_id",
            F.col("vid").alias("neighbor_id"),
            _adc_d2(F.col("codes"), F.col("qsubs"), F.col("cb")).alias("adc_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_pq_rerank_topk(
    corpus: DataFrame,
    queries: DataFrame,
    shortlist_k: int = 30,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Two-stage retrieval — the full production ANN pipeline: IVF-PQ
    produces a ``shortlist_k`` candidate set per query from codes
    alone (ss8), then ONLY those candidates' raw vectors are fetched
    and re-scored exactly, and the final top-``k`` ranks by true
    distance. This is the standard shape (shortlist by compressed
    index, rerank by exact distance) that recovers most of the recall
    PQ quantization loses while still never scanning raw vectors.

    Scale shape: the shortlist is |queries|·shortlist_k rows —
    broadcast into the rerank join, so fetching candidate vectors is
    a broadcast-hash lookup against the corpus (the storage analog:
    point reads of shortlist ids), and the corpus never shuffles.
    Exact scoring touches shortlist_k vectors per query instead of
    the whole corpus. Fixed-point integer distances throughout, so
    ranks are bit-identical across engines.

    Output: query_id, neighbor_id, true_d2, rank (≤ k).
    """
    short = ivf_pq_topk(
        corpus, queries, n_cells, nprobe, n_sub, n_codes,
        k=shortlist_k, id_col=id_col, vec_col=vec_col, index=index,
    ).select("query_id", "neighbor_id")
    fpc = corpus.select(
        F.col(id_col).alias("neighbor_id"), _fp(F.col(vec_col)).alias("ce")
    )
    fpq = queries.select(
        F.col(id_col).alias("query_id"), _fp(F.col(vec_col)).alias("qe")
    )
    rescored = (
        F.broadcast(short.join(F.broadcast(fpq), "query_id"))
        .join(fpc, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _sub_d2(F.col("qe"), F.col("ce")).alias("true_d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("true_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def save_ivf_pq_index(
    index_parts: tuple[DataFrame, DataFrame, DataFrame], path: str
) -> None:
    """Persist the IVF-PQ index as three parquet relations under
    ``path`` (centroids/, codebook/, index/) — the literal form of
    "the index is a stored table written once per corpus snapshot".
    The index/ relation is written partitioned BY CELL, so a search
    that probes nprobe cells prunes to nprobe/n_cells of the index
    files at scan time (the inverted-file access pattern expressed as
    partition pruning)."""
    cent_arr, cb_row, index = index_parts
    cent_arr.write.mode("overwrite").parquet(f"{path}/centroids")
    cb_row.write.mode("overwrite").parquet(f"{path}/codebook")
    index.write.mode("overwrite").partitionBy("cell").parquet(f"{path}/index")


def load_ivf_pq_index(
    spark, path: str
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Load a saved IVF-PQ index; the returned parts drop into
    ``ivf_pq_search`` / ``ivf_pq_rerank_topk(index=...)`` unchanged.
    Searches against the loaded index read sketch-sized relations and
    never touch the raw corpus (rerank excepted, by design)."""
    cent_arr = spark.read.parquet(f"{path}/centroids")
    cb_row = spark.read.parquet(f"{path}/codebook")
    index = spark.read.parquet(f"{path}/index")
    return cent_arr, cb_row, index
