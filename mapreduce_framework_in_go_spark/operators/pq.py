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
    minimizes integer squared L2, ties to the smallest seed id."""
    vec_sub = _explode_subs(emb_fixed, "vec_id", "v")
    dist = _isum(
        F.zip_with(
            F.col("sub"), F.col("ssub"), lambda a, b: (a - b) * (a - b)
        )
    )
    return (
        vec_sub.join(F.broadcast(seeds_sub), "m")
        .select("vec_id", "m", F.struct(dist.alias("d"), "seed_id").alias("ds"))
        .groupBy("vec_id", "m")
        .agg(F.min("ds").alias("best"))
        .select("vec_id", "m", F.col("best.seed_id").alias("code"))
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
