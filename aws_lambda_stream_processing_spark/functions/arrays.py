"""Array & higher-order function families (SURVEY.md §2.H: q_array_funcs,
q_higher_order).

Arrays are first-class here because embeddings are arrays (FIXTURES.md §2)
and every similarity operator builds on elementwise lambda math. Parity
rules: array results are projected to sorted joined strings (SURVEY §2
conv. 4); float lambdas cast elements to double *before* arithmetic so both
engines fold identical IEEE doubles in identical (left-to-right) order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::INT AS nt,
           list_contains(string_split(text, ' '), 'data') AS hasdata,
           len(list_distinct(string_split(text, ' ')))::INT AS ndist,
           array_to_string(list_sort(string_split(text, ' '))[1:5], ',')
             AS sorted5,
           string_split(text, ' ')[2] AS second_tok
    FROM documents
    """,
    category="2.H",
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/array_contains/array_distinct/sort_array/slice/element_at/
    array_join over tokenized text."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("nt"),
        F.array_contains(toks, "data").alias("hasdata"),
        F.size(F.array_distinct(toks)).alias("ndist"),
        F.array_join(F.slice(F.sort_array(toks), 1, 5), ",").alias("sorted5"),
        F.element_at(toks, 2).alias("second_tok"),
    )


@query(
    "q_higher_order",
    oracle="""
    SELECT vec_id,
           len(embedding)::INT AS dim,
           ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                             (a, b) -> a + b), 4) AS vsum,
           ROUND(list_reduce(list_transform(embedding,
                                            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                             (a, b) -> a + b), 4) AS dot_self,
           len(list_filter(embedding, x -> x > 0))::INT AS npos
    FROM embeddings
    """,
    category="2.H",
)
def q_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """transform / filter / aggregate / zip_with lambda expressions on the
    embedding vectors — the building blocks of the cosine similarity ops
    (§2.J). dot_self ≈ 1.0 confirms the L2-normalization invariant.

    Both engines left-fold the element list in order over doubles, so sums
    are bit-identical before the (defensive) rounding.
    """
    e = load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    squares = F.zip_with(
        F.col("embedding"),
        F.col("embedding"),
        lambda x, y: x.cast("double") * y.cast("double"),
    )
    fold = lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)  # noqa: E731
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(fold(as_double), 4).alias("vsum"),
        F.round(fold(squares), 4).alias("dot_self"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).alias("npos"),
    )


@query(
    "q_array_posexplode",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    idx AS (
      SELECT doc_id, t, unnest(generate_series(1, len(t))) AS p FROM toks
    )
    SELECT doc_id, p - 1 AS pos, t[p] AS tok FROM idx
    """,
    category="2.H",
)
def q_array_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode — array → rows WITH position (the lateral-view /
    WITH ORDINALITY shape): tokenize every document into (doc_id, pos,
    token) rows natively, no UDTF (q_udtf_python is the user-defined twin
    of this built-in path). Positions are 0-based in Spark vs 1-based list
    indexing in the oracle (DuckDB 1.0 lacks WITH ORDINALITY — the oracle
    enumerates via generate_series and subtracts 1). Generator runs inside
    whole-stage codegen; output is partition-local (no shuffle)."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )


@query(
    "q_array_set_ops",
    oracle="""
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    halves AS (
      SELECT doc_id,
             list_distinct(toks[1 : n // 2]) AS a,
             list_distinct(toks[n // 2 + 1 : n]) AS b
      FROM t
    )
    SELECT doc_id,
           CAST(len(list_distinct(list_concat(a, b))) AS INTEGER)
             AS n_union,
           CAST(len(list_filter(a, x -> list_contains(b, x))) AS INTEGER)
             AS n_intersect,
           CAST(len(list_filter(a, x -> NOT list_contains(b, x)))
                AS INTEGER) AS n_except,
           list_aggregate(list_sort(list_filter(a,
               x -> list_contains(b, x))), 'string_agg', ',')
             AS shared_sorted
    FROM halves ORDER BY doc_id
    """,
    category="2.H",
)
def q_array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array SET algebra — array_union / array_intersect / array_except
    between each document's first-half and second-half vocabularies (a
    per-row "does the doc change topic?" probe). Both engines produce
    set results in engine-specific order, so everything leaving the row
    is either a SIZE (int) or a SORTED joined string — the only portable
    serializations of a set. Pure per-row columnar lambdas, zero
    shuffle."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    )
    halves = t.select(
        "doc_id",
        F.array_distinct(
            F.expr("slice(toks, 1, n div 2)")
        ).alias("a"),
        F.array_distinct(
            F.expr("slice(toks, n div 2 + 1, n - n div 2)")
        ).alias("b"),
    )
    return halves.select(
        "doc_id",
        F.size(F.array_union("a", "b")).alias("n_union"),
        F.size(F.array_intersect("a", "b")).alias("n_intersect"),
        F.size(F.array_except("a", "b")).alias("n_except"),
        F.when(
            F.size(F.array_intersect("a", "b")) > 0,
            F.array_join(F.array_sort(F.array_intersect("a", "b")), ","),
        ).alias("shared_sorted"),
    ).orderBy("doc_id")
