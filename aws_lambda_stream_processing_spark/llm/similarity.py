"""Similarity search over embeddings (SURVEY.md §2.J: q_llm_cosine_topk,
q_llm_knn).

Embeddings are L2-normalized 64-dim float vectors (FIXTURES.md §2), so
cosine ≡ dot product. Dot products are computed with JVM higher-order
expressions (zip_with + aggregate over doubles) — codegen'd, no Python on
the hot path; both engines left-fold the same IEEE doubles, so similarity
values are bit-identical before the defensive rounding.

Scale path (documented, exercised at test scale by the same code):
  - brute-force top-k here is a pruned self-join — O(n²·d) but shuffle-free
    per block with AQE handling the pairing;
  - at 100 TB you bucket vectors first (LSH hyperplanes, or IVF coarse
    centroids), run the same exact kernel within buckets, and union —
    the kernel below is reused unchanged (see q_llm_minhash_lsh for the
    banding pattern).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


def dot_double(a: Column | str, b: Column | str) -> Column:
    """Exact double-precision dot product of two float vectors (elementwise
    cast to double, left-fold — bit-identical on Spark and DuckDB)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


# DuckDB twin of dot_double (list_dot_product computes in float32 and drifts
# ~1e-7 from the double fold — measured; never use it for parity).
SQL_DOT = (
    "list_reduce(list_transform(list_zip({a}, {b}), "
    "s -> CAST(s[1] AS DOUBLE) * CAST(s[2] AS DOUBLE)), (x, y) -> x + y)"
)


@query(
    "q_llm_cosine_topk",
    oracle=f"""
    WITH pairs AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
             {SQL_DOT.format(a="a.embedding", b="b.embedding")} AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    )
    SELECT vec_a, vec_b, ROUND(sim, 4) AS cosine
    FROM pairs
    ORDER BY sim DESC, vec_a, vec_b
    LIMIT 50
    """,
    category="2.J",
)
def q_llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 most-similar embedding pairs (cosine = dot on the normalized
    vectors). TakeOrderedAndProject keeps a 50-heap per task — the full
    pair set never materializes past the map side. Tiebreak on ids keeps
    the cut deterministic."""
    e = load_table(spark, sf_dir, "embeddings")
    a = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b")).withColumn(
        "sim", dot_double("ea", "eb")
    )
    return (
        pairs.orderBy(F.desc("sim"), F.asc("vec_a"), F.asc("vec_b"))
        .limit(50)
        .select("vec_a", "vec_b", F.round("sim", 4).alias("cosine"))
    )


@query(
    "q_llm_knn",
    oracle=f"""
    WITH scored AS (
      SELECT p.vec_id AS probe_id, c.vec_id AS neighbor_id, c.label,
             {SQL_DOT.format(a="p.embedding", b="c.embedding")} AS sim,
             row_number() OVER (
               PARTITION BY p.vec_id
               ORDER BY {SQL_DOT.format(a="p.embedding", b="c.embedding")} DESC,
                        c.vec_id) AS rnk
      FROM (SELECT * FROM embeddings WHERE vec_id < 10) p
      JOIN (SELECT * FROM embeddings WHERE vec_id >= 10) c ON true
    )
    SELECT probe_id, neighbor_id, label, rnk, ROUND(sim, 4) AS cosine
    FROM scored WHERE rnk <= 5
    """,
    category="2.J",
)
def q_llm_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification shape: for each of 10 probe vectors, the 5
    nearest corpus vectors (with labels) by cosine. Probes broadcast to
    every corpus partition; per-group top-k runs as a WindowGroupLimit so
    only 5 rows per probe survive the exchange."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    corpus = e.where(F.col("vec_id") >= 10).select(
        F.col("vec_id").alias("neighbor_id"), "label",
        F.col("embedding").alias("ce"),
    )
    scored = corpus.crossJoin(F.broadcast(probes)).withColumn(
        "sim", dot_double("pe", "ce")
    )
    w = Window.partitionBy("probe_id").orderBy(
        F.desc("sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= 5)
        .select(
            "probe_id", "neighbor_id", "label", "rnk",
            F.round("sim", 4).alias("cosine"),
        )
    )
