"""Deterministic sketch operators (SURVEY.md §2, round 2): Count-Min,
Bloom filter, and KMV distinct-count — the sketches a 100 TB pipeline
actually ships between stages, built from EXPLICIT integer hash
arithmetic instead of engine-native sketch aggregates, so every one has
an exact cross-engine oracle (the same reason `q_llm_minhash_exact`
exists beside `q_llm_minhash_lsh` — whose own oracle has replayed the
full signature/band pipeline since r9: engine-internal sketches
(HLL, datasketches) are implementation-defined; these are
specification-defined).

All hashes are (a*x + b) mod P with P = 2^31-1 over int64 — no overflow
(a, x < 2^31 so a*x < 2^62), no floats, identical in Spark and DuckDB.
String keys fold to integers once on the DISTINCT vocabulary and join
back (the `q_llm_minhash_exact` pattern — vocabulary-sized work, not
corpus-sized).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table

_P = 2_147_483_647  # Mersenne prime 2^31-1
_TOK_MOD = 1_000_000_007

# (a, b) pairs — classic public LCG multipliers, same family as the
# MinHash seeds in llm/dedup.py.
_SEEDS = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
]

_CMS_W = 256
_CMS_D = 4
_BLOOM_M = 2048
_BLOOM_K = 3
_KMV_K = 64

_TOKHASH_SQL = f"""
    SELECT tok,
           list_reduce(
             list_prepend(CAST(7 AS BIGINT),
               list_transform(string_split(tok, ''),
                              c -> CAST(ascii(c) AS BIGINT))),
             (acc, x) -> (acc * 131 + x) % {_TOK_MOD}) AS h
    FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS tok
          FROM documents)
"""


def _tok_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-fold polynomial hash per DISTINCT token (Spark side of
    _TOKHASH_SQL): aggregate-lambda over the character codes — JVM-side,
    vocabulary-sized."""
    d = load_table(spark, sf_dir, "documents")
    vocab = d.select(
        F.explode(F.split("text", " ")).alias("tok")
    ).distinct()
    return vocab.select(
        "tok",
        F.expr(
            "aggregate(transform(split(tok, ''), c -> CAST(ascii(c) AS BIGINT)),"
            f" CAST(7 AS BIGINT), (acc, x) -> (acc * 131 + x) % {_TOK_MOD})"
        ).alias("h"),
    )


_CMS_SEED_ROWS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_SEEDS[:_CMS_D])
)


@query(
    "q_sketch_countmin",
    oracle=f"""
    WITH th AS ({_TOKHASH_SQL}),
    occ AS (
      SELECT t.tok, th.h
      FROM (SELECT unnest(string_split(text, ' ')) AS tok
            FROM documents) t
      JOIN th ON th.tok = t.tok
    ),
    seeds(s, a, b) AS (VALUES {_CMS_SEED_ROWS}),
    counters AS (
      SELECT s, (a * h + b) % {_P} % {_CMS_W} AS cell,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ CROSS JOIN seeds
      GROUP BY s, (a * h + b) % {_P} % {_CMS_W}
    ),
    top AS (
      SELECT tok, h, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM occ GROUP BY tok, h
      ORDER BY true_count DESC, tok LIMIT 20
    )
    SELECT top.tok AS token, top.true_count,
           CAST(MIN(c.cnt) AS BIGINT) AS cms_estimate
    FROM top
    CROSS JOIN seeds
    JOIN counters c
      ON c.s = seeds.s AND c.cell = (seeds.a * top.h + seeds.b) % {_P} % {_CMS_W}
    GROUP BY top.tok, top.true_count
    ORDER BY true_count DESC, token
    """,
    category="2.D",
)
def q_sketch_countmin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch (d={d}, w={w}) of corpus token frequencies, then
    the estimate-vs-truth report for the top-20 tokens: estimate = min
    over rows of counter[s, h_s(tok)], always >= true count (the CMS
    guarantee — visible in the output as overcount on a {w}-cell width).

    Scale shape: building the sketch is ONE hash agg of (seed, cell)
    pairs — d*corpus rows in, d*w rows out, the partial agg collapses to
    the sketch size on every map task, which is exactly why CMS is the
    shuffle-a-sketch-not-the-data primitive. The probe side touches only
    the 20 queried tokens x d cells via broadcast joins."""
    th = _tok_hashes(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents")
    occ = d.select(F.explode(F.split("text", " ")).alias("tok")).join(
        F.broadcast(th), "tok"
    )
    seeds = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_SEEDS[:_CMS_D])],
        "s int, a long, b long",
    )
    cell = (F.col("a") * F.col("h") + F.col("b")) % _P % _CMS_W
    counters = (
        occ.crossJoin(F.broadcast(seeds))
        .groupBy("s", cell.alias("cell"))
        .agg(F.count("*").alias("cnt"))
    )
    top = (
        occ.groupBy("tok", "h")
        .agg(F.count("*").alias("true_count"))
        .orderBy(F.desc("true_count"), "tok")
        .limit(20)
    )
    probe = top.crossJoin(F.broadcast(seeds)).select(
        "tok", "true_count", "s", cell.alias("cell")
    )
    return (
        probe.join(counters, ["s", "cell"])
        .groupBy(F.col("tok").alias("token"), "true_count")
        .agg(F.min("cnt").alias("cms_estimate"))
        .orderBy(F.desc("true_count"), "token")
    )


q_sketch_countmin.__doc__ = q_sketch_countmin.__doc__.format(
    d=_CMS_D, w=_CMS_W
)

_BLOOM_SEED_ROWS = ", ".join(
    f"({i}, {a}, {b})" for i, (a, b) in enumerate(_SEEDS[:_BLOOM_K])
)


@query(
    "q_sketch_bloom",
    oracle=f"""
    WITH seeds(s, a, b) AS (VALUES {_BLOOM_SEED_ROWS}),
    ins AS (
      SELECT DISTINCT o_custkey AS key FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS (
      SELECT DISTINCT (a * key + b) % {_P} % {_BLOOM_M} AS bit
      FROM ins CROSS JOIN seeds
    ),
    probe AS (
      SELECT c_custkey AS key,
             (a * c_custkey + b) % {_P} % {_BLOOM_M} AS bit
      FROM customer CROSS JOIN seeds
    ),
    hits AS (
      SELECT p.key, CAST(COUNT(*) AS BIGINT) AS nbits
      FROM probe p JOIN bits ON bits.bit = p.bit
      GROUP BY p.key
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_probed,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM ins) AS n_members,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM hits
            WHERE nbits = {_BLOOM_K}) AS n_bloom_positives
    """,
    category="2.D",
)
def q_sketch_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter (m={m} bits, k={k} hashes) over the urgent-order
    customer set, probed with every customer: a probe is positive iff all
    {k} bit positions are set. n_bloom_positives >= n_members exposes the
    false-positive overhang at this m/n ratio — the number a pipeline
    checks before trusting a Bloom pre-join filter.

    Scale shape: the filter build is a DISTINCT over at most m integer
    bit positions (the sketch, not the keys, is what shuffles); the probe
    is an equi join of (key, bit) pairs against those m rows — broadcast,
    since a Bloom filter is by definition small enough to ship to every
    executor. This is the semantic core of Spark's own runtime Bloom
    pushdown, spelled out as relational algebra."""
    seeds = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(_SEEDS[:_BLOOM_K])],
        "s int, a long, b long",
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    ins = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("key"))
        .distinct()
    )
    bit = (F.col("a") * F.col("key") + F.col("b")) % _P % _BLOOM_M
    bits = (
        ins.crossJoin(F.broadcast(seeds)).select(bit.alias("bit")).distinct()
    )
    probe = c.select(F.col("c_custkey").alias("key")).crossJoin(
        F.broadcast(seeds)
    ).select("key", bit.alias("bit"))
    hits = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("key")
        .agg(F.count("*").alias("nbits"))
    )
    n_pos = hits.where(F.col("nbits") == _BLOOM_K).agg(
        F.count("*").alias("n_bloom_positives")
    )
    n_probed = c.agg(F.count("*").alias("n_probed"))
    n_members = ins.agg(F.count("*").alias("n_members"))
    return n_probed.crossJoin(F.broadcast(n_members)).crossJoin(
        F.broadcast(n_pos)
    )


q_sketch_bloom.__doc__ = q_sketch_bloom.__doc__.format(
    m=_BLOOM_M, k=_BLOOM_K
)


@query(
    "q_sketch_kmv",
    oracle=f"""
    WITH keys AS (SELECT DISTINCT o_orderkey AS key FROM orders),
    h AS (
      SELECT key, (1103515245 * key + 12345) % {_P} AS hv
      FROM keys
    ),
    ranked AS (
      SELECT hv, row_number() OVER (ORDER BY hv, key) AS rn FROM h
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM keys) AS true_distinct,
           CAST(hv AS BIGINT) AS kth_min_hash,
           CAST(CAST({_KMV_K} - 1 AS BIGINT) * CAST({_P} AS BIGINT) // hv
                AS BIGINT) AS kmv_estimate
    FROM ranked WHERE rn = {_KMV_K}
    """,
    category="2.D",
)
def q_sketch_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k minimum values, k={k}) distinct-count sketch over order
    keys: hash every distinct key, keep the k smallest hashes, estimate
    |D| ~= (k-1) * P / h_(k) — the unbiased KMV estimator, here in floor
    integer division so both engines agree bit-for-bit. Output is the
    truth, the k-th minimum, and the estimate side by side.

    Scale shape: 'k smallest of a distributed set' is a per-partition
    top-k (each task keeps its local k minima — constant memory) merged
    once; Spark plans the sort+limit exactly that way (TakeOrderedAndProject),
    never a global sort. This is the mergeable-summary property that lets
    KMV run over 100 TB: the sketch IS the k minima, union = merge+trim."""
    o = load_table(spark, sf_dir, "orders")
    keys = o.select(F.col("o_orderkey").alias("key")).distinct()
    h = keys.select(
        "key", ((F.lit(1103515245) * F.col("key") + 12345) % _P).alias("hv")
    )
    kth = (
        h.orderBy("hv", "key")
        .limit(_KMV_K)
        .agg(F.max("hv").alias("kth_min_hash"))
    )
    truth = keys.agg(F.count("*").alias("true_distinct"))
    return truth.crossJoin(F.broadcast(kth)).select(
        "true_distinct",
        "kth_min_hash",
        F.expr(
            f"CAST({_KMV_K} - 1 AS BIGINT) * CAST({_P} AS BIGINT)"
            " div kth_min_hash"
        ).alias("kmv_estimate"),
    )


q_sketch_kmv.__doc__ = q_sketch_kmv.__doc__.format(k=_KMV_K)
