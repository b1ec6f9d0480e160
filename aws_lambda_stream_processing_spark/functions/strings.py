"""String function family (SURVEY.md §2.H: q_str_*).

All JVM-side codegen'd expressions — the text-analysis hot path never drops
into Python. Parity traps handled here: substring is 1-based on both engines;
DuckDB length/strpos return BIGINT (oracle casts to INT to match Spark);
DuckDB regexp_replace needs the 'g' flag to match Spark's replace-all.
Regex patterns stay POSIX-simple (Java regex vs RE2 dialects agree there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import query
from aws_lambda_stream_processing_spark.tables import load_table


@query(
    "q_str_basic",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up,
           lower(p_brand) AS lo,
           length(p_name)::INT AS nlen,
           substring(p_name, 1, 4) AS sub4,
           concat(p_brand, ':', p_name) AS catted,
           lpad(p_type, 10, '_') AS lp,
           rpad(p_type, 10, '_') AS rp,
           reverse(p_name) AS rev,
           trim(concat('  ', p_name, '  ')) AS tr,
           ltrim(concat('  ', p_name, '  ')) AS ltr,
           rtrim(concat('  ', p_name, '  ')) AS rtr
    FROM part
    """,
    category="2.H",
)
def q_str_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/length/substring/concat/pad/reverse/trim family."""
    p = load_table(spark, sf_dir, "part")
    padded = F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("up"),
        F.lower("p_brand").alias("lo"),
        F.length("p_name").alias("nlen"),
        F.substring("p_name", 1, 4).alias("sub4"),
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_name")).alias("catted"),
        F.lpad("p_type", 10, "_").alias("lp"),
        F.rpad("p_type", 10, "_").alias("rp"),
        F.reverse("p_name").alias("rev"),
        F.trim(padded).alias("tr"),
        F.ltrim(padded).alias("ltr"),
        F.rtrim(padded).alias("rtr"),
    )


@query(
    "q_str_position",
    oracle="""
    SELECT p_partkey,
           strpos(p_name, 'a')::INT AS pos_a,
           starts_with(p_brand, 'Brand#1') AS sw,
           p_name LIKE '%t' AS ew,
           contains(p_name, 'id') AS ct
    FROM part
    """,
    category="2.H",
)
def q_str_position(spark: SparkSession, sf_dir: str) -> DataFrame:
    """instr/startswith/endswith/contains (endswith oracled as LIKE '%t' —
    same semantics, avoids DuckDB-version alias drift)."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.instr("p_name", "a").alias("pos_a"),
        F.startswith(F.col("p_brand"), F.lit("Brand#1")).alias("sw"),
        F.endswith(F.col("p_name"), F.lit("t")).alias("ew"),
        F.contains(F.col("p_name"), F.lit("id")).alias("ct"),
    )


@query(
    "q_str_regexp",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '([a-z]+) ([a-z]+)', 2) AS second_word,
           regexp_replace(substring(text, 1, 30), '[aeiou]', '_', 'g') AS devoweled,
           regexp_matches(text, 'data [a-z]+ query') AS has_pattern
    FROM documents
    """,
    category="2.H",
)
def q_str_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract / regexp_replace / rlike. DuckDB (RE2) needs the 'g'
    flag for replace-all; Spark (java.util.regex) replaces all by default."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("text", r"([a-z]+) ([a-z]+)", 2).alias("second_word"),
        F.regexp_replace(F.substring("text", 1, 30), r"[aeiou]", "_").alias(
            "devoweled"
        ),
        F.col("text").rlike("data [a-z]+ query").alias("has_pattern"),
    )


@query(
    "q_str_split",
    oracle="""
    SELECT doc_id,
           len(string_split(text, ' '))::INT AS n_tokens,
           string_split(text, ' ')[1] AS first_tok,
           string_split(text, ' ')[3] AS third_tok
    FROM documents
    """,
    category="2.H",
)
def q_str_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenization: split + size + element access (1-based on both sides —
    Spark element_at, DuckDB list indexing)."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_tok"),
        F.element_at(toks, 3).alias("third_tok"),
    )


@query(
    "q_str_fuzzy_match",
    oracle="""
    WITH vocab AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    scored AS (
      SELECT v.tok, c.tok AS nearest,
             levenshtein(v.tok, c.tok) AS dist,
             row_number() OVER (
               PARTITION BY v.tok
               ORDER BY levenshtein(v.tok, c.tok), c.tok) AS rn
      FROM vocab v JOIN vocab c ON v.tok <> c.tok
    )
    SELECT tok, nearest, dist FROM scored WHERE rn = 1
    """,
    category="2.H",
)
def q_str_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching: each vocabulary token's nearest other token
    by Levenshtein edit distance (deterministic tie-break: distance, then
    lexicographic) — the spell-canonicalization / fuzzy-join shape. Both
    engines implement unit-cost Levenshtein identically, so the oracle is
    exact. Scale path: the dictionary side broadcasts (vocabularies are
    small relative to corpora); candidate pruning (length bands, q-gram
    prefilter) bounds the cross product when it isn't."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .distinct()
    )
    cand = vocab.select(F.col("tok").alias("nearest"))
    scored = (
        vocab.join(F.broadcast(cand), F.col("tok") != F.col("nearest"))
        .withColumn("dist", F.levenshtein("tok", "nearest"))
    )
    w = Window.partitionBy("tok").orderBy("dist", "nearest")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("tok", "nearest", "dist")
    )


@query(
    "q_url_funcs",
    oracle="""
    WITH u AS (
      SELECT event_id,
             'https://shop' || CAST(user_id % 5 AS VARCHAR)
               || '.example.com/' || event_type
               || '?uid=' || CAST(user_id AS VARCHAR)
               || '&v=' || CAST(event_id % 100 AS VARCHAR) AS url
      FROM events
    )
    SELECT event_id,
           regexp_extract(url, '^https://([^/]+)/', 1) AS host,
           regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]uid=([^&]*)', 1) AS uid
    FROM u
    ORDER BY event_id
    """,
    category="2.H",
)
def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL decomposition — the web-corpus curation primitive (host-level
    dedup, per-domain quotas, query-param stripping all start here).
    URLs are synthesized deterministically from events (the corpus ships
    none), then split with Spark's dedicated parse_url expression
    (HOST / PATH / QUERY / keyed QUERY) — JVM codegen, no regex cost on
    the Spark side; the oracle recovers identical parts with anchored
    RE2 regexes. Pure map stage: no shuffle, scales linearly, and at
    100 TB the parse feeds directly into a host-keyed groupBy without
    rereading text."""
    e = load_table(spark, sf_dir, "events")
    url = F.concat(
        F.lit("https://shop"), (F.col("user_id") % 5).cast("string"),
        F.lit(".example.com/"), F.col("event_type"),
        F.lit("?uid="), F.col("user_id").cast("string"),
        F.lit("&v="), (F.col("event_id") % 100).cast("string"),
    )
    return (
        e.select("event_id", url.alias("url"))
        .select(
            "event_id",
            F.parse_url("url", F.lit("HOST")).alias("host"),
            F.parse_url("url", F.lit("PATH")).alias("path"),
            F.parse_url("url", F.lit("QUERY")).alias("query"),
            F.parse_url("url", F.lit("QUERY"), F.lit("uid")).alias("uid"),
        )
        .orderBy("event_id")
    )


@query(
    "q_str_collation",
    oracle="""
    WITH mixed AS (
      SELECT event_id,
             CASE WHEN event_id % 3 = 0 THEN upper(event_type)
                  WHEN event_id % 3 = 1
                    THEN upper(substr(event_type, 1, 1))
                         || substr(event_type, 2)
                  ELSE event_type END AS label
      FROM events
    )
    SELECT min(label) AS canon,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT label) AS BIGINT) AS n_variants
    FROM mixed
    GROUP BY lower(label)
    """,
    category="2.H",
)
def q_str_collation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collation-aware aggregation (Spark 4 string collations): group a
    mixed-case label column under UTF8_LCASE so 'CLICK'/'Click'/'click'
    are ONE group — the collation travels with the column through the
    hash aggregate instead of a lower() wrapper around every reference.
    Mixed case is synthesized deterministically from event_id (the
    corpus ships lowercase-only strings). The output canonicalizes each
    group via min(label) under binary collation — a deterministic
    representative; the raw UTF8_LCASE group key is a nondeterministic
    first-seen representative AND would carry a collated string type
    into the result schema, so it is dropped. The oracle is the
    classic lower()-key formulation. At 100 TB the collated groupBy
    hashes the collation key directly in Tungsten rows — same shuffle
    volume as the lower() rewrite, but filters/joins on the column stay
    sargable and readable."""
    e = load_table(spark, sf_dir, "events")
    label = (
        F.when(
            F.col("event_id") % 3 == 0, F.upper("event_type")
        )
        .when(
            F.col("event_id") % 3 == 1,
            F.concat(
                F.upper(F.substring("event_type", 1, 1)),
                F.expr("substr(event_type, 2)"),
            ),
        )
        .otherwise(F.col("event_type"))
    )
    return (
        e.select(label.alias("label"))
        .groupBy(F.collate("label", "UTF8_LCASE").alias("k"))
        .agg(
            F.min(F.col("label").cast("string COLLATE UTF8_BINARY"))
            .alias("canon"),
            F.count("*").alias("n"),
            F.countDistinct(
                F.col("label").cast("string COLLATE UTF8_BINARY")
            ).alias("n_variants"),
        )
        .drop("k")
        .select("canon", "n", "n_variants")
    )


@query(
    "q_str_mask_builtin",
    oracle="""
    SELECT c_custkey,
           regexp_replace(regexp_replace(regexp_replace(
               c_name, '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'),
               '[0-9]', 'n', 'g') AS masked_default,
           regexp_replace(regexp_replace(
               c_name, '[A-Z]', '?', 'g'), '[0-9]', '*', 'g')
               AS masked_custom
    FROM customer ORDER BY c_custkey
    """,
    category="2.H",
)
def q_str_mask_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `mask()` BUILTIN (Spark 3.4+) — the engine's own PII-masking
    scalar, complementing q_proj_masking's hand-rolled projection: by
    default uppercase→'X', lowercase→'x', digits→'n', other chars kept;
    every class character is overridable (upper→'?', digits→'*',
    lowercase kept via the NULL override in the custom variant here).
    The oracle spells the same classification as regexp_replace chains
    (the portable definition), so the rung certifies the builtin's
    CLASS BOUNDARIES — which characters count as upper/lower/digit —
    not just the happy path. Codegen'd JVM expression: masking at 100
    TB rides the projection like any string function, and the builtin
    is the form a column-level masking POLICY compiles to. Kept
    ORDER BY custkey so torn rows can't hide in multiset equality."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.mask("c_name").alias("masked_default"),
        F.mask(
            "c_name",
            F.lit("?"),
            F.lit(None).cast("string"),
            F.lit("*"),
            F.lit(None).cast("string"),
        ).alias("masked_custom"),
    ).orderBy("c_custkey")
