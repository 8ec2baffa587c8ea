"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (the exact baseline), an IVF (inverted-file) variant (the scale
path), and per-label vector aggregation.

Determinism contract: every ranking orders by (round(cosine, 6) DESC,
vec_id ASC) so engine and oracle rank identically even though raw
doubles could differ in the last ulp. Dot products are double-precision
left folds over the array — bit-identical between Spark's
``aggregate`` and DuckDB's ``list_cosine_similarity`` on DOUBLE[]
(verified empirically; see tests).

Scale notes (100 TB / billions of vectors):

- brute force is O(|Q| * |N| * d) with the corpus side partitioned and
  the query side broadcast — correct as long as Q is small; it is the
  per-cell verifier inside IVF, not the top-level plan.
- IVF: centroid assignment is a broadcast join (centroid table is
  KB-MB), so building the cell index is one map pass + one shuffle on
  cell_id. Queries probe nprobe cells; the candidate join hits only
  |N| * nprobe / n_cells vectors per query. On a real cluster the cell
  assignment would be written bucketed-by-cell so probes prune
  partitions. Centroids here are a deterministic sample (vec_id % C)
  instead of k-means iterations — the plumbing, partitioning, and probe
  plan are identical; swapping in trained centroids changes recall,
  not the dataflow.
- label centroids: posexplode to (label, dim) then two-level agg —
  partial aggregation map-side makes the shuffle O(labels * d), not
  O(rows * d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_from_norms, l2_norm
from ..registry import register
from ..sources.tables import table

QUERY_MOD = 50  # vec_id % QUERY_MOD == 0 => a query vector
CENTROID_MOD = 37  # vec_id % CENTROID_MOD == 0 => a centroid
TOP_K = 10
IVF_TOP_K = 5
NPROBE = 2

_COS_SQL = (
    "round(list_cosine_similarity({0}.embedding::DOUBLE[], "
    "{1}.embedding::DOUBLE[]), 6)"
)


@register(
    "ann_topk_bruteforce",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             {_COS_SQL.format('q', 'n')} AS cosine
      FROM q JOIN embeddings n ON n.vec_id <> q.vec_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {TOP_K}
    """,
    doc=f"Exact cosine top-{TOP_K} for every query vector "
    f"(vec_id % {QUERY_MOD} = 0) by brute force: broadcast the query "
    "side, JVM-side double-precision dot products over the partitioned "
    "corpus, per-query window rank. The exact baseline ANN variants "
    "are measured against.",
    tags=["similarity"],
)
def ann_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("nn")
    )
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("nn").alias("qn"),
    )
    scored = (
        F.broadcast(q)
        .join(emb, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                cosine_from_norms(
                    F.col("qe"), F.col("embedding"), F.col("qn"), F.col("nn")
                ),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@register(
    "ann_ivf",
    oracle=f"""
    WITH cent AS (SELECT * FROM embeddings WHERE vec_id % {CENTROID_MOD} = 0),
    assign_scored AS (
      SELECT v.vec_id, c.vec_id AS cell_id,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {_COS_SQL.format('v', 'c')} DESC, c.vec_id) AS rn
      FROM embeddings v JOIN cent c ON TRUE
    ),
    assign AS (
      SELECT vec_id, cell_id FROM assign_scored WHERE rn = 1
    ),
    q AS (SELECT * FROM embeddings WHERE vec_id % {QUERY_MOD} = 0),
    probe_scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS cell_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY {_COS_SQL.format('q', 'c')} DESC, c.vec_id) AS rn
      FROM q JOIN cent c ON TRUE
    ),
    probes AS (
      SELECT query_id, cell_id FROM probe_scored WHERE rn <= {NPROBE}
    ),
    scored AS (
      SELECT p.query_id, a.vec_id AS neighbor_id,
             {_COS_SQL.format('q', 'n')} AS cosine
      FROM probes p
      JOIN assign a USING (cell_id)
      JOIN embeddings n ON n.vec_id = a.vec_id
      JOIN embeddings q ON q.vec_id = p.query_id
      WHERE a.vec_id <> p.query_id
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY query_id
               ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine
    FROM ranked WHERE rank <= {IVF_TOP_K}
    """,
    doc=f"IVF approximate nearest neighbors: vectors are assigned to "
    f"their nearest centroid cell (centroids = vec_id % {CENTROID_MOD} "
    f"sample, broadcast); each query probes its {NPROBE} nearest cells "
    f"and ranks only those cells' members, returning top-{IVF_TOP_K}. "
    "Cost per query drops from |N| to |N|*nprobe/cells; on a cluster "
    "the assignment table is bucketed by cell_id so probes prune "
    "partitions.",
    tags=["similarity"],
)
def ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", l2_norm(F.col("embedding")).alias("vn")
    )
    cent = emb.where(F.col("vec_id") % CENTROID_MOD == 0).select(
        F.col("vec_id").alias("cell_id"),
        F.col("embedding").alias("ce"),
        F.col("vn").alias("cn"),
    )

    def nearest_cells(vecs: DataFrame, id_col: str, n: int) -> DataFrame:
        scored = vecs.join(F.broadcast(cent)).select(
            id_col,
            "cell_id",
            F.round(
                cosine_from_norms(
                    F.col("embedding"), F.col("ce"), F.col("vn"), F.col("cn")
                ),
                6,
            ).alias("c"),
        )
        w = Window.partitionBy(id_col).orderBy(F.col("c").desc(), F.col("cell_id"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= n)
            .select(id_col, "cell_id")
        )

    assign = nearest_cells(emb, "vec_id", 1)
    q = emb.where(F.col("vec_id") % QUERY_MOD == 0)
    probes = nearest_cells(
        q.select(F.col("vec_id").alias("query_id"), "embedding", "vn"),
        "query_id",
        NPROBE,
    )

    members = assign.join(
        emb.select("vec_id", F.col("embedding").alias("ne"), F.col("vn").alias("nn")),
        "vec_id",
    )
    scored = (
        probes.join(members, "cell_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .join(
            F.broadcast(
                q.select(
                    F.col("vec_id").alias("query_id"),
                    F.col("embedding").alias("qe"),
                    F.col("vn").alias("qn"),
                )
            ),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(
                cosine_from_norms(F.col("qe"), F.col("ne"), F.col("qn"), F.col("nn")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


@register(
    "embedding_label_centroids",
    oracle="""
    WITH norms AS (
      SELECT label, vec_id,
             sqrt(list_reduce(
               list_prepend(0.0, list_transform(embedding::DOUBLE[], x -> x * x)),
               (a, b) -> a + b)) AS vnorm
      FROM embeddings
    ),
    dims AS (
      SELECT label, i AS pos, avg(embedding[i]::DOUBLE) AS dim_avg
      FROM embeddings, unnest(range(1, len(embedding) + 1)) u(i)
      GROUP BY 1, 2
    ),
    cent AS (
      SELECT label, sqrt(sum(dim_avg * dim_avg)) AS centroid_norm
      FROM dims GROUP BY label
    )
    SELECT n.label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(avg(n.vnorm), 6) AS avg_norm,
           round(any_value(c.centroid_norm), 6) AS centroid_norm
    FROM norms n JOIN cent c USING (label)
    GROUP BY n.label
    """,
    doc="Per-label vector aggregation: count, mean L2 norm, and the "
    "norm of the mean vector (centroid). posexplode to (label, dim) "
    "rows then aggregate — map-side partial aggregation makes the "
    "shuffle O(labels * dims), independent of row count.",
    tags=["similarity"],
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    norms = emb.select(
        "label", "vec_id", l2_norm(F.col("embedding")).alias("vnorm")
    )
    per_label = norms.groupBy("label").agg(
        F.count("*").alias("n_vecs"), F.round(F.avg("vnorm"), 6).alias("avg_norm")
    )
    dims = (
        emb.select("label", F.posexplode("embedding").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(F.avg(F.col("val").cast("double")).alias("dim_avg"))
    )
    cent = dims.groupBy("label").agg(
        F.round(F.sqrt(F.sum(F.col("dim_avg") * F.col("dim_avg"))), 6).alias(
            "centroid_norm"
        )
    )
    return per_label.join(cent, "label").select(
        "label", "n_vecs", "avg_norm", "centroid_norm"
    )
