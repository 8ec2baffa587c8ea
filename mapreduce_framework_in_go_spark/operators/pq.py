"""Product quantization (PQ) — the memory-compression half of
billion-scale ANN that IVF alone doesn't give you.

IVF (operators/similarity.py) prunes WHICH vectors a query scores;
PQ shrinks WHAT is stored per vector: the 64-dim float array (256 B)
becomes 4 subspace code ids (~4 bytes at 256 codewords), and
query scoring runs against a per-query lookup table of
query-subvector x codeword inner products (ADC — asymmetric distance
computation), never against the original vectors. At 100 TB of
embeddings that is the difference between an index that fits executor
memory and one that doesn't.

Everything here is EXACT INTEGER dataflow so the DuckDB oracle replays
each stage bitwise (same discipline as supplier_pagerank): vectors are
fixed-pointed once (round(x * 1e6) -> BIGINT), codeword assignment
minimizes an integer squared-L2 distance with (dist, seed_id)
tie-breaks, the ADC lookup table holds integer inner products, and
approximate scores are integer sums — no float fold order anywhere, so
ranking needs no rounding safety net at all. Codebooks are the
deterministic seed sample (vec_id % ~sqrt(N), the self-scaling
broadcast-modulus rule ann_ivf uses).

Scale shape: encoding joins the corpus against the BROADCAST seed
subvectors (map-side, like IVF cell assignment); the ADC table is
|queries| x |seeds| x M rows, chunked over queries at scale exactly as
_bruteforce_topk chunks its broadcasts; scoring shuffles (query, vec)
partial sums — M small integers per pair, not vectors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.tables import table
from .similarity import QUERY_MOD

PQ_M = 4  # subspaces per vector
PQ_SCALE = 1_000_000  # fixed-point scale applied once to raw floats
PQ_TOP_K = 10

_FIXED_SQL = (
    "list_transform({0}::DOUBLE[], x -> CAST(round(x * 1000000) AS BIGINT))"
)
_CMOD = "(SELECT greatest(1, CAST(floor(sqrt(count(*))) AS BIGINT)) FROM embeddings)"


def _fixed(col: Column) -> Column:
    return F.transform(
        col, lambda x: F.round(x.cast("double") * PQ_SCALE).cast("long")
    )


def _sub(v: Column, m: Column) -> Column:
    """m-th of PQ_M equal slices of an integer vector (1-based slice)."""
    sd = (F.size(v) / PQ_M).cast("int")
    return F.slice(v, m.cast("int") * sd + 1, sd)


def _isum(zipped: Column) -> Column:
    return F.aggregate(zipped, F.lit(0).cast("long"), lambda a, v: a + v)


def _explode_subs(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """One row per (id, subspace): integer subvector."""
    return df.select(
        id_col,
        F.explode(F.sequence(F.lit(0), F.lit(PQ_M - 1))).alias("m"),
        F.col(vec_col).alias("_v"),
    ).select(id_col, "m", _sub(F.col("_v"), F.col("m")).alias("sub"))


def _codes(emb_fixed: DataFrame, seeds_sub: DataFrame) -> DataFrame:
    """PQ encoding: per (vector, subspace) the seed whose subvector
    minimizes integer squared L2, ties to the smallest seed id.

    r13 (guide §4.2): the codebook is the bounded broadcast artifact
    (~sqrt(N) x M subvectors) PQ is built around, so encode inside ONE
    ``mapInPandas`` pass — each Arrow batch of vectors meets the
    codebook as numpy int64 matrices. Squared-L2 distances and the
    (dist, seed_id) argmin are exact int64 in ANY evaluation order
    (seed rows sorted ascending, argmin takes the first minimum), so
    the output is bitwise identical to the former per-element Catalyst
    fold, which re-evaluated an interpreted lambda per (vector, seed,
    m, component) — measured 3.0 s -> 0.25 s for the sf0.1 flat-PQ
    encode. Products are bounded by (2e7)^2 * sd << 2^63 at the 1e6
    fixed-point scale, same bound the fold relied on."""
    import numpy as np
    import pandas as pd

    spark = emb_fixed.sparkSession
    # driver-side collect of the bounded codebook (the C-row-prior /
    # broadcast-table pattern): ~sqrt(N) rows x PQ_M subvectors, an
    # O(sqrt(N)) driver transfer at ANY corpus size (31k rows per
    # billion vectors) riding the Arrow toPandas path. r14 measured the
    # executor-packed alternative (PQ_M rows of
    # array_sort(collect_list(struct))) at +1-3 s of driver build time
    # per encode — nested Rows collect over the pickle path — and
    # reverted it; the N-proportional case this pattern must avoid is
    # the GT query slice, fixed in ivfpq._exact_ground_truth.
    spd = seeds_sub.toPandas().sort_values(["m", "seed_id"])
    by_m = {
        int(m): (
            grp["seed_id"].to_numpy(dtype=np.int64),
            np.array(grp["ssub"].tolist(), dtype=np.int64),
        )
        for m, grp in spd.groupby("m")
    }
    bc = spark.sparkContext.broadcast(by_m)

    def _encode(it):
        seed_tabs = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            v = np.array(pdf["v"].tolist(), dtype=np.int64)
            sd = v.shape[1] // PQ_M
            vec_ids = pdf["vec_id"].to_numpy()
            frames = []
            for m in range(PQ_M):
                seed_ids, s = seed_tabs[m]
                sub = v[:, m * sd : (m + 1) * sd]
                # (n, n_seeds): exact integer squared L2
                d = ((sub[:, None, :] - s[None, :, :]) ** 2).sum(axis=2)
                frames.append(
                    pd.DataFrame(
                        {
                            "vec_id": vec_ids,
                            "m": np.full(len(vec_ids), m, dtype=np.int32),
                            "code": seed_ids[d.argmin(axis=1)],
                        }
                    )
                )
            yield pd.concat(frames)

    # NO low-partition repartition guard here (ADVICE r13 weighed, r14
    # measured): the vectorized encode's per-row work is one small
    # int64 matmul, and the guard's round-robin exchange (+ its
    # sort-before-repartition) of the fixed-point corpus cost more
    # than single-split encode saves — ann_pq regressed 2.0 -> 4.6 s
    # with it. The heavy-per-row GT scoring pass keeps the guard
    # (ivfpq._exact_ground_truth); at cluster scale scans have
    # thousands of splits and neither path needs it.
    return emb_fixed.select("vec_id", "v").mapInPandas(
        _encode, schema="vec_id long, m int, code long"
    )


def _pq_frames(spark: SparkSession, sf_dir: str):
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", _fixed("embedding").alias("v")
    )
    cmod = emb.agg(
        F.greatest(F.lit(1), F.floor(F.sqrt(F.count("*"))))
        .cast("long")
        .alias("cmod")
    )
    seeds = (
        emb.crossJoin(F.broadcast(cmod))
        .where(F.col("vec_id") % F.col("cmod") == 0)
        .select(F.col("vec_id").alias("seed_id"), "v")
    )
    seeds_sub = _explode_subs(seeds, "seed_id", "v").withColumnRenamed(
        "sub", "ssub"
    )
    return emb, seeds_sub


_PQ_CORE_SQL = f"""
    fixed AS (
      SELECT vec_id, {_FIXED_SQL.format('embedding')} AS v, len(embedding) AS dim
      FROM embeddings
    ),
    subs AS (
      SELECT vec_id, m, v[m * (dim // {PQ_M}) + 1 : (m + 1) * (dim // {PQ_M})]
               AS sub
      FROM fixed, unnest(generate_series(0, {PQ_M} - 1)) AS u(m)
    ),
    seeds_sub AS (
      SELECT vec_id AS seed_id, m, sub AS ssub FROM subs
      WHERE vec_id % {_CMOD} = 0
    ),
    dists AS (
      SELECT s.vec_id, s.m, d.seed_id,
             list_sum(list_transform(list_zip(s.sub, d.ssub),
                      p -> (p[1] - p[2]) * (p[1] - p[2]))) AS dist
      FROM subs s JOIN seeds_sub d USING (m)
    ),
    codes AS (
      SELECT vec_id, m, seed_id AS code FROM (
        SELECT *, row_number() OVER (
          PARTITION BY vec_id, m ORDER BY dist, seed_id) AS rn
        FROM dists
      ) WHERE rn = 1
    )
"""


@register(
    "ann_pq",
    oracle=f"""
    WITH {_PQ_CORE_SQL},
    lut AS (
      SELECT q.vec_id AS query_id, q.m, d.seed_id,
             list_sum(list_transform(list_zip(q.sub, d.ssub),
                      p -> p[1] * p[2])) AS dp
      FROM subs q JOIN seeds_sub d USING (m)
      WHERE q.vec_id % {QUERY_MOD} = 0
    ),
    scored AS (
      SELECT l.query_id, c.vec_id AS neighbor_id, sum(l.dp) AS score
      FROM codes c
      JOIN lut l ON l.m = c.m AND l.seed_id = c.code
      WHERE c.vec_id <> l.query_id
      GROUP BY 1, 2
    )
    SELECT query_id, neighbor_id,
           CAST(row_number() OVER (
             PARTITION BY query_id ORDER BY score DESC, neighbor_id)
             AS BIGINT) AS rank,
           CAST(score AS BIGINT) AS score_scaled
    FROM scored
    QUALIFY rank <= {PQ_TOP_K}
    """,
    doc=f"PQ/ADC approximate top-{PQ_TOP_K} by inner product: vectors "
    f"fixed-pointed to BIGINT, encoded as {PQ_M} nearest-seed-subvector "
    "codes (integer L2, deterministic ties), queries scored against the "
    "integer inner-product lookup table of their own subvectors x "
    "codewords — the stored corpus is never touched at query time. "
    "All-integer dataflow; the oracle replays encoding, LUT, and "
    "ranking bitwise. See module doc for the 100 TB memory story.",
    tags=["similarity", "pq"],
)
def ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb, seeds_sub = _pq_frames(spark, sf_dir)
    codes = _codes(emb, seeds_sub)
    q_sub = _explode_subs(
        emb.where(F.col("vec_id") % QUERY_MOD == 0).withColumnRenamed(
            "vec_id", "query_id"
        ),
        "query_id",
        "v",
    )
    lut = q_sub.join(F.broadcast(seeds_sub), "m").select(
        "query_id",
        "m",
        F.col("seed_id").alias("code"),
        _isum(
            F.zip_with(F.col("sub"), F.col("ssub"), lambda a, b: a * b)
        ).alias("dp"),
    )
    scored = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .where(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dp").alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= PQ_TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            F.col("score").cast("long").alias("score_scaled"),
        )
    )


@register(
    "ann_pq_recall",
    oracle=f"""
    WITH {_PQ_CORE_SQL},
    lut AS (
      SELECT q.vec_id AS query_id, q.m, d.seed_id,
             list_sum(list_transform(list_zip(q.sub, d.ssub),
                      p -> p[1] * p[2])) AS dp
      FROM subs q JOIN seeds_sub d USING (m)
      WHERE q.vec_id % {QUERY_MOD} = 0
    ),
    pq_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT l.query_id, c.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY l.query_id
                 ORDER BY sum(l.dp) DESC, c.vec_id) AS rank
        FROM codes c
        JOIN lut l ON l.m = c.m AND l.seed_id = c.code
        WHERE c.vec_id <> l.query_id
        GROUP BY l.query_id, c.vec_id
      ) WHERE rank <= {PQ_TOP_K}
    ),
    exact_top AS (
      SELECT query_id, neighbor_id FROM (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_sum(list_transform(list_zip(q.v, n.v),
                                   p -> p[1] * p[2])) DESC, n.vec_id) AS rank
        FROM fixed q JOIN fixed n ON n.vec_id <> q.vec_id
        WHERE q.vec_id % {QUERY_MOD} = 0
      ) WHERE rank <= {PQ_TOP_K}
    )
    SELECT CAST({PQ_TOP_K} AS BIGINT) AS k,
           CAST(count(DISTINCT e.query_id) AS BIGINT) AS n_queries,
           round(sum(CASE WHEN p.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
                 * 1.0 / count(*), 6) AS recall_at_k
    FROM exact_top e
    LEFT JOIN pq_top p USING (query_id, neighbor_id)
    """,
    doc=f"Recall@{PQ_TOP_K} of the PQ/ADC index against the exact "
    "integer-inner-product top-k over the same fixed-point vectors — "
    "the tune-before-the-full-pass metric for choosing M and codebook "
    "size. Both rankings and the recall arithmetic are exact integers; "
    "the oracle reproduces the number bitwise, not within a bound.",
    tags=["similarity", "pq"],
)
def ann_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    pq_top = ann_pq(spark, sf_dir).select("query_id", "neighbor_id")
    emb, _ = _pq_frames(spark, sf_dir)
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv")
    )
    dp = _isum(F.zip_with(F.col("qv"), F.col("v"), lambda a, b: a * b))
    w = Window.partitionBy("query_id").orderBy(F.col("dp").desc(), "neighbor_id")
    exact_top = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), dp.alias("dp"))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= PQ_TOP_K)
        .select("query_id", "neighbor_id")
    )
    pq_marked = pq_top.select(
        "query_id", "neighbor_id", F.lit(1).alias("pq_hit")
    )
    joined = exact_top.join(pq_marked, ["query_id", "neighbor_id"], "left")
    return joined.agg(
        F.lit(PQ_TOP_K).cast("long").alias("k"),
        F.count_distinct("query_id").alias("n_queries"),
        F.round(
            F.sum(F.coalesce("pq_hit", F.lit(0))) / F.count("*"), 6
        ).alias("recall_at_k"),
    )


SQ_LEVELS = 255  # int8 code range 0..255
SQ_ERR_SCALE = 10**12  # per-element squared error snapped to this grid


@register(
    "embedding_int8_quantize",
    oracle=f"""
    WITH q AS (
      SELECT vec_id,
             embedding::DOUBLE[] AS v,
             list_min(embedding::DOUBLE[]) AS mn,
             list_max(embedding::DOUBLE[]) AS mx
      FROM embeddings
    ),
    c AS (
      SELECT vec_id, mn, mx, len(v) AS dim,
             CASE WHEN mx > mn
                  THEN list_transform(v, x -> CAST(round(
                         (x - mn) / ((mx - mn) / {SQ_LEVELS})) AS BIGINT))
                  ELSE list_transform(v, x -> CAST(0 AS BIGINT))
             END AS codes,
             (mx - mn) / {SQ_LEVELS} AS scale
      FROM q
    )
    SELECT vec_id,
           CAST(dim AS BIGINT) AS dim,
           round(mn, 6) AS vmin,
           round(mx, 6) AS vmax,
           CAST(list_sum(codes) AS BIGINT) AS code_checksum,
           round(list_max(list_transform(range(1, dim + 1),
                 i -> abs(mn + codes[i] * scale - c.v[i]))), 9)
             AS max_abs_err,
           CAST(list_sum(list_transform(range(1, dim + 1),
                 i -> CAST(round(
                   (mn + codes[i] * scale - c.v[i])
                   * (mn + codes[i] * scale - c.v[i])
                   * {SQ_ERR_SCALE}) AS BIGINT))) AS BIGINT)
             AS sse_scaled
    FROM (SELECT c.*, q.v FROM c JOIN q USING (vec_id)) c
    """,
    doc=f"Per-vector int8 scalar quantization (min-max, {SQ_LEVELS + 1} "
    "levels) with its reconstruction-error audit — the cheap 4x "
    "compression tier below product quantization (ann_pq): codes are "
    "integer-exact, max-abs and sum-of-squares reconstruction errors "
    "are computed per vector with squared-error terms snapped to an "
    "integer grid so every fold is order-free. Entirely map-side — "
    "zero shuffles, partitioned like the input; the code arrays are "
    "what a vector store would persist (4 bytes/dim -> 1 byte/dim + "
    "two floats).",
    tags=["similarity", "compression"],
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    q = emb.select(
        "vec_id",
        v.alias("v"),
        F.array_min(v).alias("mn"),
        F.array_max(v).alias("mx"),
    )
    scale = (F.col("mx") - F.col("mn")) / SQ_LEVELS
    codes = F.when(
        F.col("mx") > F.col("mn"),
        F.transform(
            "v",
            lambda x: F.round((x - F.col("mn")) / scale).cast("long"),
        ),
    ).otherwise(F.transform("v", lambda x: F.lit(0).cast("long")))
    c = q.select(
        "vec_id",
        "v",
        "mn",
        "mx",
        F.size("v").alias("dim"),
        codes.alias("codes"),
        scale.alias("scale"),
    )
    recon_err = F.zip_with(
        "codes",
        "v",
        lambda code, x: F.col("mn") + code * F.col("scale") - x,
    )
    return c.select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.round("mn", 6).alias("vmin"),
        F.round("mx", 6).alias("vmax"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("code_checksum"),
        F.round(
            F.array_max(F.transform(recon_err, lambda e: F.abs(e))), 9
        ).alias("max_abs_err"),
        F.aggregate(
            F.transform(
                recon_err,
                lambda e: F.round(e * e * SQ_ERR_SCALE).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("sse_scaled"),
    )


JL_IN_DIM = 64  # corpus embedding dimensionality
JL_OUT_DIM = 16  # projected dimensionality (4x flop/byte reduction)
JL_SCALE = 0.25  # 1/sqrt(JL_OUT_DIM) — EXACT dyadic, one exact multiply
JL_RATIO_LO, JL_RATIO_HI = 0.4, 1.6  # asserted distortion envelope


def _jl_sign(i: int, j: int) -> float:
    """Deterministic +/-1 entry of the projection matrix — the
    md5_long32 convention, reproduced by the oracle inline."""
    import hashlib

    h = int(hashlib.md5(f"R:{i}:{j}".encode()).hexdigest()[:8], 16)
    return 1.0 if h % 2 == 0 else -1.0


_JL_SIGN_SQL = (
    "CASE WHEN ('0x' || substr(md5('R:' || CAST(i AS VARCHAR) || ':' "
    "|| CAST(j - 1 AS VARCHAR)), 1, 8))::BIGINT % 2 = 0 "
    "THEN 1.0 ELSE -1.0 END"
)


@register(
    "jl_project_audit",
    oracle=f"""
    WITH v AS (
      SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    sg AS (
      SELECT i, list(s ORDER BY j) AS srow FROM (
        SELECT i, j, {_JL_SIGN_SQL} AS s
        FROM (SELECT unnest(range(0, {JL_OUT_DIM})) AS i)
        CROSS JOIN (SELECT unnest(range(1, {JL_IN_DIM} + 1)) AS j)
      ) GROUP BY i
    ),
    p AS (
      SELECT vec_id, list(c ORDER BY i) AS pv FROM (
        SELECT v.vec_id, sg.i,
               {JL_SCALE} * list_reduce(
                 list_transform(range(1, {JL_IN_DIM} + 1),
                               j -> sg.srow[j] * v.e[j]),
                 (a, b) -> a + b) AS c
        FROM v CROSS JOIN sg
      ) GROUP BY vec_id
    ),
    bv AS (SELECT v.vec_id, v.e, p.pv FROM v JOIN p USING (vec_id)),
    pr AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             sqrt(list_reduce(list_transform(range(1, {JL_IN_DIM} + 1),
                  j -> (a.e[j] - b.e[j]) * (a.e[j] - b.e[j])),
                  (x, y) -> x + y)) AS l2_orig,
             sqrt(list_reduce(list_transform(range(1, {JL_OUT_DIM} + 1),
                  i -> (a.pv[i] - b.pv[i]) * (a.pv[i] - b.pv[i])),
                  (x, y) -> x + y)) AS l2_proj
      FROM bv a JOIN bv b ON a.vec_id + 1 = b.vec_id
    )
    SELECT vec_a, vec_b,
           round(l2_orig, 6) AS l2_orig,
           round(l2_proj, 6) AS l2_proj,
           round(l2_proj / l2_orig, 6) AS ratio,
           l2_proj / l2_orig BETWEEN {JL_RATIO_LO} AND {JL_RATIO_HI}
             AS within_envelope
    FROM pr
    """,
    doc=f"Johnson-Lindenstrauss random projection "
    f"(R^{JL_IN_DIM} -> R^{JL_OUT_DIM}, deterministic +/-1 "
    "Achlioptas-style matrix from the md5 hash convention, scaled by "
    f"the exact dyadic 1/sqrt({JL_OUT_DIM})) with the "
    "distance-preservation audit a pipeline runs before pointing ANN "
    "at the reduced vectors: per consecutive-id pair, the original and "
    "projected L2 distances and their ratio, plus the distortion-"
    "envelope flag — all computed on IDENTICAL IEEE trees both sides "
    "(in-order left folds; the sign matrix is a compile-time constant "
    "engine-side and an inline md5 CTE oracle-side). Scale: the "
    f"projection is MAP-ONLY against a broadcast {JL_OUT_DIM}x"
    f"{JL_IN_DIM} constant — a 4x cut in every downstream ANN flop, "
    "byte, and broadcast; the audit rides a deterministic O(N) "
    "consecutive-pair sample, never all pairs.",
    tags=["similarity", "compression"],
)
def jl_project_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    signs = F.array(
        *[
            F.array(
                *[
                    F.lit(_jl_sign(i, j))
                    for j in range(JL_IN_DIM)
                ]
            )
            for i in range(JL_OUT_DIM)
        ]
    )
    emb = table(spark, sf_dir, "embeddings")
    proj = F.transform(
        F.sequence(F.lit(0), F.lit(JL_OUT_DIM - 1)),
        lambda i: F.lit(JL_SCALE)
        * F.aggregate(
            F.zip_with(
                F.col("e"),
                F.element_at(signs, (i + 1).cast("int")),
                lambda x, s: s * x,
            ),
            F.lit(0.0),
            lambda a, b: a + b,
        ),
    )
    # stage the projected array behind a Generate (it feeds the pair
    # join twice: the distance fold references both sides' arrays)
    both = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    ).select(
        "vec_id",
        "e",
        F.explode(F.array(proj)).alias("pv"),
    )

    def l2(a, b, dim: int):
        return F.sqrt(
            F.aggregate(
                F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda x, y: x + y,
            )
        )

    a = both.select(
        F.col("vec_id").alias("vec_a"),
        F.col("e").alias("ea"),
        F.col("pv").alias("pa"),
    )
    b = both.select(
        F.col("vec_id").alias("vec_b"),
        F.col("e").alias("eb"),
        F.col("pv").alias("pb"),
    )
    pr = a.join(b, F.col("vec_a") + 1 == F.col("vec_b")).select(
        "vec_a",
        "vec_b",
        l2(F.col("ea"), F.col("eb"), JL_IN_DIM).alias("l2_orig"),
        l2(F.col("pa"), F.col("pb"), JL_OUT_DIM).alias("l2_proj"),
    )
    ratio = F.col("l2_proj") / F.col("l2_orig")
    return pr.select(
        "vec_a",
        "vec_b",
        F.round("l2_orig", 6).alias("l2_orig"),
        F.round("l2_proj", 6).alias("l2_proj"),
        F.round(ratio, 6).alias("ratio"),
        ((ratio >= JL_RATIO_LO) & (ratio <= JL_RATIO_HI)).alias(
            "within_envelope"
        ),
    )
