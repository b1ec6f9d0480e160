"""Deduplication operators (SURVEY.md §2.J): exact, near-dup (Jaccard with
prefix filtering), and MinHash-LSH — the training-corpus cleaning pipeline.

Scale ladder (the whole point of having three):
  exact hash dedup      — one shuffle on a 32-byte key; works at any size.
  Jaccard + prefix      — lossless candidate pruning (PPJoin-style): only the
                          (1-τ) rarest tokens of each doc are indexed, so the
                          inverted-index join never degenerates into the
                          all-pairs explosion a naive token join produces on
                          a small vocabulary.
  MinHash-LSH           — constant-size signatures + banding; the 100 TB path
                          where even prefix postings are too big. Approximate
                          → weak check by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table

JACCARD_TAU = 0.95


@query(
    "q_llm_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_hash,
           MIN(doc_id) AS survivor_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY sha256(text)
    """,
    category="2.J",
)
def q_llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup: SHA-256 the text, keep min(doc_id) as the
    deterministic survivor. One hash-aggregate; at 100 TB the 32-byte hash
    shuffles instead of the document bodies."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy(F.sha2("text", 256).alias("content_hash")).agg(
        F.min("doc_id").alias("survivor_id"),
        F.count("*").alias("n_copies"),
    )


@query(
    "q_llm_neardup_jaccard",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
      FROM documents
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS o
      FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(o * 1.0 / (x.n + y.n - o), 4) AS jaccard
    FROM inter
    JOIN sz x ON doc_a = x.doc_id
    JOIN sz y ON doc_b = y.doc_id
    WHERE o * 1.0 / (x.n + y.n - o) >= {JACCARD_TAU}
    """,
    category="2.J",
)
def q_llm_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with token-set Jaccard >= τ, via lossless prefix
    filtering: sort each doc's tokens by global rarity, index only the first
    |T| - ceil(τ|T|) + 1 tokens (any pair with overlap >= ceil(τ|T|) must
    share a prefix token), verify candidates with an exact array_intersect.

    The naive all-shared-tokens join is Θ(Σ df²) — quadratic on this small
    vocabulary; the prefix join is bounded by the (1-τ) tail. The DuckDB
    oracle uses the naive form (correct at oracle scale); results are
    identical because prefix filtering is lossless.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    postings = docs.select("doc_id", F.explode("toks").alias("tok"))
    df_count = postings.groupBy("tok").agg(F.count("*").alias("df"))
    # rank tokens within each doc by global rarity (df asc, tok asc)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("tok"))
    ranked = (
        postings.join(F.broadcast(df_count), "tok")
        .withColumn("pos", F.row_number().over(w))
        .withColumn("n", F.count("*").over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.where(
        F.col("pos") <= F.col("n") - F.ceil(F.lit(JACCARD_TAU) * F.col("n")) + 1
    ).select("doc_id", "tok")
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cand.join(docs.select(F.col("doc_id").alias("doc_a"),
                              F.col("toks").alias("toks_a")), "doc_a")
        .join(docs.select(F.col("doc_id").alias("doc_b"),
                          F.col("toks").alias("toks_b")), "doc_b")
        .withColumn("o", F.size(F.array_intersect("toks_a", "toks_b")))
        .withColumn(
            "jaccard_raw",
            F.col("o")
            / (F.size("toks_a") + F.size("toks_b") - F.col("o")),
        )
        .where(F.col("jaccard_raw") >= JACCARD_TAU)
    )
    return verified.select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


# Deterministic MinHash family: h_i(x) = (a_i * x + b_i) mod p, over Spark's
# murmur3 token hash. Fixed constants → reproducible signatures run-to-run.
_MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_N_HASHES = 16
_BANDS = 4  # 4 rows per band → catches jaccard ≳ 0.8 reliably


@query("q_llm_minhash_lsh", oracle=None, category="2.J", tags=("weak",))
def q_llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup detection — the sub-quadratic 100 TB
    path. Per doc: 16 minhashes over murmur3 token hashes with a fixed
    affine family, grouped into 4 bands of 4; docs sharing any band bucket
    become candidates; candidates are verified with exact Jaccard >= τ.

    Approximate (signature collisions are engine-specific) → weak check;
    q_llm_neardup_jaccard is the exact-oracle twin.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("toks")
    )
    def _minhash(a: int, b: int):
        # closure factory: the returned lambda must be unary for Spark
        return lambda t: (F.abs(F.hash(t).cast("long")) * a + b) % _MINHASH_P

    sig_cols = []
    for i in range(_N_HASHES):
        a, b = 2 * i + 1, 7 * i + 3  # odd multiplier, fixed offsets
        sig_cols.append(
            F.array_min(F.transform("toks", _minhash(a, b))).alias(f"mh_{i}")
        )
    sigs = docs.select("doc_id", "toks", *sig_cols)
    rows_per_band = _N_HASHES // _BANDS
    band_cols = [
        F.hash(
            F.lit(band),
            *[F.col(f"mh_{band * rows_per_band + r}") for r in range(rows_per_band)],
        ).alias(f"band_{band}")
        for band in range(_BANDS)
    ]
    banded = sigs.select("doc_id", "toks", *band_cols)
    buckets = banded.select(
        "doc_id",
        "toks",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("band"),
                               F.col(f"band_{i}").alias("bucket"))
                      for i in range(_BANDS)])
        ).alias("bb"),
    ).select("doc_id", "toks", "bb.band", "bb.bucket")
    cand = (
        buckets.alias("x")
        .join(
            buckets.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"),
            F.col("y.doc_id").alias("doc_b"),
            F.col("x.toks").alias("toks_a"),
            F.col("y.toks").alias("toks_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    verified = cand.withColumn(
        "o", F.size(F.array_intersect("toks_a", "toks_b"))
    ).withColumn(
        "jaccard_raw",
        F.col("o") / (F.size("toks_a") + F.size("toks_b") - F.col("o")),
    ).where(F.col("jaccard_raw") >= JACCARD_TAU)
    return verified.select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )
