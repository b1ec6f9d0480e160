"""Training-data curation operators (SURVEY.md §2.J, round 2): the four
dataset-construction steps every LLM pipeline runs between "raw corpus"
and "training mixture" — eval-set decontamination, deterministic
stratified sampling, context-window sequence packing, and per-language
length-band filtering.

Evidence: driver mandate BASELINE.json:6-7 ("add the LLM-data-pipeline
operators ... design every operator for 100 TB scale"); the reference
snapshot ships no code (SURVEY §0), so the public data-curation recipes
(Gopher / RefinedWeb / Dolma-style) define the semantics.

All four stay in whole-stage codegen (explode + window + hash-agg; no
Python UDFs) and every one has an exact DuckDB oracle — the sampler uses
integer hashing, not random(), precisely so sampling IS reproducible and
cross-engine checkable (the only sane choice at 100 TB, where "re-run the
job" must yield the same dataset).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.parity import fround
from aws_lambda_stream_processing_spark.registry import (
    query,
    tracked_local_checkpoint,
)
from aws_lambda_stream_processing_spark.tables import load_table

# Held-out eval sources: the contamination check treats these as the
# benchmark set and everything else as the training pool.
EVAL_SOURCES = ("src18", "src19")


@query(
    "q_llm_contamination",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                  || ' ' || t[i+4] AS g
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
    ),
    train AS (
      SELECT DISTINCT g FROM sh WHERE source NOT IN ('src18', 'src19')
    ),
    ev AS (
      SELECT DISTINCT doc_id, g FROM sh WHERE source IN ('src18', 'src19')
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY doc_id),
    hit AS (
      SELECT ev.doc_id, COUNT(*) AS n_hit
      FROM ev JOIN train USING (g) GROUP BY ev.doc_id
    )
    SELECT tot.doc_id, n_grams,
           COALESCE(n_hit, 0) AS n_hit,
           floor(COALESCE(n_hit, 0) * 1.0 / n_grams * 10000.0 + 0.5)
             / 10000.0 AS contam_frac
    FROM tot LEFT JOIN hit USING (doc_id)
    """,
    category="2.J",
)
def q_llm_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination (the GPT-3/PaLM 13-gram check, scaled to
    this corpus's ~50-token docs as 5-grams): for each held-out eval doc,
    the fraction of its distinct 5-gram shingles that appear anywhere in
    the training pool. Docs above a cut are contaminated benchmarks.

    Shape: posexplode + 4 lead() columns per doc builds shingles in ONE
    window pass (stays codegen; the interpreted transform-with-index
    lambda costs ~10 µs/element, SURVEY §8 law 1). The train side
    collapses to DISTINCT shingles before the join — at 100 TB that is
    the decisive move: the join carries one row per unique shingle, not
    per occurrence. Scale path: pre-hash shingles to int64 (xxhash64) so
    the exchange shuffles 8-byte keys, then string-verify the matched
    pairs to kill collisions; here the string join is exact and the
    corpus is small enough that the hash leg would be pure overhead."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles5(d)
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    train = sh.where(~is_eval).select("g").distinct()
    ev = sh.where(is_eval).select("doc_id", "g").distinct()
    tot = ev.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    hit = (
        ev.join(train, "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0).cast("long"))
    return tot.join(hit, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        n_hit.alias("n_hit"),
        fround(n_hit / F.col("n_grams"), 4, "contam_frac"),
    )


@query(
    "q_llm_stratified_sample",
    oracle="""
    WITH rates(lang, keep_per_mille) AS (
      VALUES ('en', 100), ('fr', 250), ('es', 250), ('de', 500), ('zh', 1000)
    ),
    h AS (
      SELECT doc_id, lang,
             (doc_id * 2654435761) % 4294967296 % 1000 AS bucket
      FROM documents
    )
    SELECT h.doc_id, h.lang, h.bucket
    FROM h JOIN rates USING (lang)
    WHERE bucket < keep_per_mille
    """,
    category="2.J",
)
def q_llm_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling — the mixture-rebalancing
    step (downsample the dominant language, keep all of the low-resource
    ones). Sampling is a Knuth multiplicative hash of the stable doc_id,
    NOT random(): at 100 TB a re-run must reproduce the exact same
    dataset, membership must be decidable per-row with no coordination,
    and a second engine must be able to verify it — which is why this op
    hashes its rows exactly while `q_sample_seeded` (engine-RNG sampling)
    hashes deterministic certificates about its sample instead.
    Pure scan + broadcast of a 5-row rate table: no shuffle at
    all. Overflow: doc_id·2654435761 < 2^63 through doc_id ≈ 3.5e9 —
    beyond that, hash the id string (xxhash64) instead."""
    d = load_table(spark, sf_dir, "documents")
    rates = spark.createDataFrame(
        [("en", 100), ("fr", 250), ("es", 250), ("de", 500), ("zh", 1000)],
        "lang string, keep_per_mille int",
    )
    h = d.select(
        "doc_id",
        "lang",
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
         % F.lit(1000)).alias("bucket"),
    )
    return (
        h.join(F.broadcast(rates), "lang")
        .where(F.col("bucket") < F.col("keep_per_mille"))
        .select("doc_id", "lang", "bucket")
    )


@query(
    "q_llm_seq_pack",
    oracle="""
    WITH docs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS tok_cnt FROM documents
    ),
    c AS (
      SELECT doc_id, tok_cnt,
             COALESCE(SUM(tok_cnt) OVER (
               ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_before
      FROM docs
    )
    SELECT CAST(floor(cum_before / 512) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(tok_cnt) AS BIGINT) AS total_tokens
    FROM c GROUP BY bin_id
    """,
    category="2.J",
)
def q_llm_seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing (concat-and-chunk, the GPT-style
    pretraining layout): stream docs in stable doc_id order, concatenate
    token counts, and assign each doc to the 512-token bin where it
    starts. Output is the bin manifest (docs per bin, tokens per bin).

    The global running sum is the DISTRIBUTED two-phase prefix sum this
    query pioneered in round 2, since extracted into
    operators/dprefix.two_phase_cumsum (and reused by q_pareto_abc,
    q_agg_gini, q_rfm_segmentation, q_llm_perplexity_band,
    q_llm_domain_quota): phase 1 computes each range-partition's local
    cumsum + per-partition total; phase 2 folds the (tiny, one row per
    partition) totals into exclusive offsets via a triangular broadcast
    join — zero partition-less WindowExec anywhere in the plan. A naive
    `Window.orderBy(doc_id)` with no partitionBy funnels 100 TB through
    ONE task; this shape keeps every stage parallel."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cumsum,
    )

    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("tok_cnt")
    )
    c = two_phase_cumsum(
        docs, [("doc_id", True)], "tok_cnt", out="cum_before",
        inclusive=False,
    )
    return (
        # floor(x / 512): power-of-two division is exact in doubles, so
        # floor is deterministic; a bare CAST would round in DuckDB but
        # truncate in Spark.
        c.select(
            F.floor(F.col("cum_before") / 512).alias("bin_id"),
            "tok_cnt",
        )
        .groupBy("bin_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("tok_cnt").alias("total_tokens"),
        )
    )


@query(
    "q_llm_length_band_filter",
    oracle="""
    WITH r AS (
      SELECT doc_id, lang, n_chars,
             percent_rank() OVER (PARTITION BY lang ORDER BY n_chars) AS pr
      FROM documents
    )
    SELECT doc_id, lang, n_chars FROM r WHERE pr >= 0.1 AND pr <= 0.9
    """,
    category="2.J",
)
def q_llm_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-band filter: keep docs inside the [p10, p90]
    length band of their language — the outlier cut (truncated boilerplate
    at the short end, concatenation junk at the long end) applied
    per-stratum so low-resource languages aren't filtered against the
    dominant language's distribution. percent_rank is rank-based, so ties
    (equal n_chars) land identically in both engines — exact, unlike a
    value-interpolating percentile cut. Scale: one shuffle on lang; lang
    is low-cardinality/skewed, so at 100 TB swap the window for per-lang
    approx-quantile cuts computed in ONE pass and broadcast as a 5-row
    filter table (same output modulo the approx cut placement)."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("n_chars")
    r = d.select(
        "doc_id", "lang", "n_chars", F.percent_rank().over(w).alias("pr")
    )
    return r.where((F.col("pr") >= 0.1) & (F.col("pr") <= 0.9)).select(
        "doc_id", "lang", "n_chars"
    )


def _shingles5(d: DataFrame) -> DataFrame:
    """(doc_id, source, g): every 5-token shingle of every doc — one
    posexplode + one window pass (see q_llm_contamination)."""
    toks = d.select(
        "doc_id",
        "source",
        F.posexplode(F.split("text", " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    t1, t2, t3, t4 = (F.lead("tok", i).over(w) for i in (1, 2, 3, 4))
    return toks.select(
        "doc_id",
        "source",
        F.concat_ws(" ", "tok", t1, t2, t3, t4).alias("g"),
        t4.alias("last"),
    ).where(F.col("last").isNotNull())


@query(
    "q_llm_contamination_matrix",
    oracle="""
    WITH toks AS (
      SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
    ),
    sh AS (
      SELECT doc_id, source,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                  || ' ' || t[i+4] AS g
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 3)) AS i)
    ),
    ev AS (
      SELECT DISTINCT source AS eval_source, g FROM sh
      WHERE source IN ('src18', 'src19')
    ),
    tr AS (
      SELECT DISTINCT source AS train_source, g FROM sh
      WHERE source NOT IN ('src18', 'src19')
    )
    SELECT eval_source, train_source, COUNT(*) AS shared_grams
    FROM ev JOIN tr USING (g)
    GROUP BY eval_source, train_source
    """,
    category="2.J",
)
def q_llm_contamination_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination provenance matrix: for each (eval source, train
    source) pair, the number of distinct 5-gram shingles they share —
    q_llm_contamination answers "how contaminated is this eval doc";
    this answers "WHICH training source leaked it", the question a
    curation team acts on (drop/clean the offending source).

    Both sides collapse to source-level DISTINCT shingle sets before the
    join, so the exchange carries unique (source, shingle) pairs — at
    100 TB that is |sources| × vocabulary, not the corpus. Output is
    bounded by |eval sources| × |train sources|."""
    d = load_table(spark, sf_dir, "documents")
    sh = _shingles5(d)
    is_eval = F.col("source").isin(*EVAL_SOURCES)
    ev = (
        sh.where(is_eval)
        .select(F.col("source").alias("eval_source"), "g")
        .distinct()
    )
    tr = (
        sh.where(~is_eval)
        .select(F.col("source").alias("train_source"), "g")
        .distinct()
    )
    return (
        ev.join(tr, "g")
        .groupBy("eval_source", "train_source")
        .agg(F.count("*").alias("shared_grams"))
    )


@query(
    "q_llm_pii_scrub",
    oracle="""
    WITH seeded AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@mail' || CAST(doc_id % 7 AS VARCHAR)
                  || '.com or call 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  AS text2
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all(
               text2, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(
               text2, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
           CAST(length(regexp_replace(
               regexp_replace(text2, '[a-z0-9]+@[a-z0-9]+\\.[a-z]+',
                              '[EMAIL]', 'g'),
               '555-[0-9]{4}', '[PHONE]', 'g')) AS BIGINT) AS scrubbed_len
    FROM seeded
    ORDER BY doc_id
    """,
    category="2.J",
)
def q_llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass over the corpus — the compliance step every
    training pipeline runs before anything else sees the text. The corpus
    ships no PII, so a deterministic synthetic email + phone is appended
    per doc (keyed off doc_id — reproducible on both engines), then both
    are detected (regexp_count) and redacted (regexp_replace → [EMAIL] /
    [PHONE] placeholders). Patterns stay in the ASCII subset where Java
    and RE2 regex dialects agree. Everything is whole-stage codegen
    string ops — no Python in the loop; at 100 TB this is a pure map
    stage, no shuffle at all (the ORDER BY is presentation-only)."""
    d = load_table(spark, sf_dir, "documents")
    text2 = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@mail"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".com or call 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    email_re = r"[a-z0-9]+@[a-z0-9]+\.[a-z]+"
    phone_re = r"555-[0-9]{4}"
    scrubbed = F.regexp_replace(
        F.regexp_replace(text2, email_re, "[EMAIL]"), phone_re, "[PHONE]"
    )
    return (
        d.select(
            "doc_id",
            F.regexp_count(text2, F.lit(email_re)).cast("long").alias("n_emails"),
            F.regexp_count(text2, F.lit(phone_re)).cast("long").alias("n_phones"),
            F.length(scrubbed).cast("long").alias("scrubbed_len"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_llm_weighted_sample",
    oracle="""
    WITH w AS (
      SELECT doc_id, source, CAST(n_chars AS BIGINT) AS wt,
             (doc_id * 2654435761) % 4294967296 AS h,
             (SELECT CAST(MAX(n_chars) AS BIGINT) FROM documents) AS max_wt
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN h * max_wt < wt * 4294967296
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN h * max_wt < wt * 4294967296
                         THEN wt ELSE 0 END) AS BIGINT) AS kept_weight
    FROM w GROUP BY source ORDER BY source
    """,
    category="2.J",
)
def q_llm_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic WEIGHTED sampling: keep doc i with probability
    w_i / max_w (here w = n_chars — longer docs are worth more tokens),
    decided by the pure-integer predicate h(id)·max_w < w_i·2³² with the
    Knuth multiplicative hash (q_llm_stratified_sample's idiom) — no
    RNG, so the SAME docs are kept on every engine, every run, every
    partitioning: the only sane reproducibility story at 100 TB, and
    the standard first stage of token-budget mixture construction.
    All-int64 comparisons (h ≤ 2³², max_w ≤ 577 ⇒ no overflow), one
    broadcast scalar (max weight), one agg. Zero shuffles beyond the
    final per-source collapse."""
    d = load_table(spark, sf_dir, "documents")
    max_wt = d.agg(F.max("n_chars").alias("max_wt"))
    w = d.select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("wt")
    ).crossJoin(F.broadcast(max_wt))
    h = (F.col("doc_id") * F.lit(2654435761)) % F.lit(4294967296)
    keep = (h * F.col("max_wt")) < (F.col("wt") * F.lit(4294967296))
    return (
        w.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(keep, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(keep, F.col("wt")).otherwise(0)).alias("kept_weight"),
        )
        .orderBy("source")
    )


@query(
    "q_llm_dataset_split",
    oracle="""
    WITH assign AS (
      SELECT source,
             CASE WHEN (doc_id * 2654435761) % 100 < 90 THEN 'train'
                  WHEN (doc_id * 2654435761) % 100 < 95 THEN 'val'
                  ELSE 'test' END AS split,
             CAST(n_chars AS BIGINT) AS nc
      FROM documents
    )
    SELECT split, source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(nc) AS BIGINT) AS total_chars
    FROM assign GROUP BY split, source
    ORDER BY split, source
    """,
    category="2.J",
)
def q_llm_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by Knuth-hash modulus
    of doc_id — the split assignment that must be STABLE across reruns,
    engines and partitionings or eval sets silently contaminate train
    (the q_llm_contamination failure mode, caused upstream). Per
    (split, source) doc and char counts verify both the ratios and that
    no source is starved in val/test. Pure integer predicate + one hash
    agg; zero extra shuffles at any scale."""
    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(2654435761)) % 100
    split = (
        F.when(h < 90, "train").when(h < 95, "val").otherwise("test")
    )
    return (
        d.select(
            split.alias("split"), "source",
            F.col("n_chars").cast("long").alias("nc"),
        )
        .groupBy("split", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("nc").alias("total_chars"),
        )
        .orderBy("split", "source")
    )


@query(
    "q_llm_code_detect",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(length(text) AS BIGINT) AS n_chars,
             CAST(length(text)
                  - length(regexp_replace(text, '[;{}()\\[\\]=<>|&]', '', 'g'))
                  AS BIGINT) AS n_symbols,
             CAST(length(text) - length(replace(text, ' ', '')) + 1
                  AS BIGINT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, n_symbols,
           floor(CAST(n_symbols AS DOUBLE) / n_chars * 10000.0 + 0.5)
               / 10000.0 AS symbol_ratio,
           floor(CAST(n_chars AS DOUBLE) / n_tokens * 100.0 + 0.5)
               / 100.0 AS avg_token_len,
           (CAST(n_symbols AS DOUBLE) / n_chars) >= 0.05 AS looks_like_code
    FROM f ORDER BY doc_id
    """,
    category="2.J",
)
def q_llm_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose detection by symbol-density heuristics — the
    routing step that sends code to a code-specific pipeline (different
    dedup granularity, different quality rules) and keeps it out of the
    prose mix. Features: density of structural symbols (;{}()[]=<>|&),
    mean token length — the classic fast pre-filter before an expensive
    classifier. Every feature is an exact integer count; ratios are
    single divisions floor-rounded (4dp/2dp), and the decision boundary
    compares the IDENTICAL double on both engines. Pure map stage +
    presentation sort; this corpus is all prose, so the flag fires
    nowhere — the point is the certified feature pipeline, not this
    corpus's labels."""
    d = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text").cast("long")
    n_symbols = (
        F.length("text")
        - F.length(F.regexp_replace("text", r"[;{}()\[\]=<>|&]", ""))
    ).cast("long")
    n_tokens = (
        F.length("text")
        - F.length(F.replace(F.col("text"), F.lit(" "), F.lit("")))
        + 1
    ).cast("long")
    ratio = n_symbols.cast("double") / n_chars
    atl = n_chars.cast("double") / n_tokens
    return d.select(
        "doc_id",
        n_symbols.alias("n_symbols"),
        (F.floor(ratio * 10000.0 + F.lit(0.5)) / 10000.0).alias(
            "symbol_ratio"
        ),
        (F.floor(atl * 100.0 + F.lit(0.5)) / 100.0).alias("avg_token_len"),
        (ratio >= 0.05).alias("looks_like_code"),
    ).orderBy("doc_id")


@query(
    "q_llm_gopher_rules",
    oracle="""
    WITH q AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) AS du,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a'))) AS ds
      FROM documents
    ),
    m AS (
      SELECT doc_id, n, du, ds, n_chars - n + 1 AS chars_net FROM q
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_words,
           ROUND(chars_net * 1.0 / n, 4) AS mean_word_len,
           (n BETWEEN 30 AND 80) AS r_len,
           (7 * n <= 2 * chars_net AND 2 * chars_net <= 9 * n) AS r_mwl,
           (20 * ds >= n) AS r_stop,
           (5 * du >= n) AS r_uniq,
           (n BETWEEN 30 AND 80
            AND 7 * n <= 2 * chars_net AND 2 * chars_net <= 9 * n
            AND 20 * ds >= n AND 5 * du >= n) AS keep
    FROM m
    """,
    category="2.J",
)
def q_llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule-based quality gate (round 3) — the public
    pre-filter recipe (Rae et al. 2021, table A1 shape) every web-scale
    pipeline runs before model-based scoring: word-count band, mean-
    word-length band, stopword floor, lexical-diversity floor, and the
    conjunctive keep flag. Every rule is evaluated in PURE INTEGER
    arithmetic (e.g. mean-word-length ∈ [3.5, 4.5] is `7n ≤ 2·chars ≤
    9n`) so the booleans cannot straddle a float threshold between
    engines; the only float in the output is the display-rounded mean.
    Per-row columnar math over one scan — zero shuffles, embarrassingly
    parallel at 100 TB. Complements q_llm_quality_score (continuous
    score) with the hard-gate semantics."""
    from aws_lambda_stream_processing_spark.llm.text import STOPWORDS, _toks

    d = _toks(load_table(spark, sf_dir, "documents"))
    n = F.size("t")
    du = F.size(F.array_distinct("t"))
    ds = F.size(F.filter("t", lambda x: x.isin(*STOPWORDS)))
    chars_net = F.col("n_chars") - n + 1
    r_len = n.between(30, 80)
    r_mwl = (7 * n <= 2 * chars_net) & (2 * chars_net <= 9 * n)
    r_stop = 20 * ds >= n
    r_uniq = 5 * du >= n
    return d.select(
        "doc_id",
        n.cast("long").alias("n_words"),
        F.round(chars_net / n, 4).alias("mean_word_len"),
        r_len.alias("r_len"),
        r_mwl.alias("r_mwl"),
        r_stop.alias("r_stop"),
        r_uniq.alias("r_uniq"),
        (r_len & r_mwl & r_stop & r_uniq).alias("keep"),
    )


# Per-source document cap for q_llm_domain_quota (C4's per-domain dedup
# rung generalized to a quota): small enough to bite at every test SF.
DOMAIN_QUOTA = 10


@query(
    "q_llm_domain_quota",
    oracle=f"""
    WITH r AS (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY source ORDER BY doc_id)
               AS rank_in_source
      FROM documents
    )
    SELECT doc_id, source, CAST(rank_in_source AS BIGINT) AS rank_in_source
    FROM r WHERE rank_in_source <= {DOMAIN_QUOTA}
    """,
    category="2.J",
)
def q_llm_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source document quota (round 3) — the C4/RefinedWeb "don't let
    one domain dominate the mixture" cap: keep the first K docs of each
    source in stable doc_id order. The per-source ranking does NOT use a
    `partitionBy(source)` window — with a handful of hot domains that is
    the q_agg_winsorize fat-task shape — but derives per-source rank from
    the GLOBAL two-phase rank (operators/dprefix.py) over (source,
    doc_id): rank_in_source = global_rn − min(global_rn per source) + 1,
    where the per-source minima are a |sources|-row broadcast. Every
    data-scaled stage is the range-shuffled two-phase pipeline; sources
    are the only bounded relation."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_row_number,
    )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    ranked = two_phase_row_number(
        d, [("source", True), ("doc_id", True)], rn="__rn"
    )
    base = ranked.groupBy("source").agg(F.min("__rn").alias("__rn0"))
    return (
        ranked.join(F.broadcast(base), "source")
        .withColumn(
            "rank_in_source", (F.col("__rn") - F.col("__rn0") + 1)
        )
        .where(F.col("rank_in_source") <= DOMAIN_QUOTA)
        .select("doc_id", "source", "rank_in_source")
    )


# DSIR feature space: hashed word-bigram buckets (Xie et al. 2023 use
# hashed n-grams for exactly this reason — the feature space stays a
# fixed-width table no matter the corpus size).
_DSIR_BUCKETS = 256


@query(
    "q_llm_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, lang, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, lang,
             (ascii(t[i]) * 31 + ascii(t[i + 1]) * 17
              + length(t[i]) * 7 + length(t[i + 1])) % {_DSIR_BUCKETS}
               AS bucket
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    raw AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS r FROM bg GROUP BY bucket
    ),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS tc
      FROM bg WHERE lang = 'en' GROUP BY bucket
    ),
    tot AS (
      SELECT (SELECT SUM(r) FROM raw) AS rtot,
             (SELECT COALESCE(SUM(tc), 0) FROM tgt) AS ttot
    ),
    w AS (
      SELECT raw.bucket,
             ln(CAST((COALESCE(tgt.tc, 0) + 1)
                     * (tot.rtot + {_DSIR_BUCKETS}) AS DOUBLE)
                / CAST((tot.ttot + {_DSIR_BUCKETS})
                       * (raw.r + 1) AS DOUBLE)) AS wb
      FROM raw LEFT JOIN tgt ON raw.bucket = tgt.bucket CROSS JOIN tot
    ),
    db AS (
      SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bg GROUP BY doc_id, bucket
    )
    SELECT db.doc_id,
           CAST(SUM(cnt) AS BIGINT) AS n_bigrams,
           floor(CAST(SUM(CAST(wb * cnt AS DECIMAL(38, 18))) AS DOUBLE)
                 / SUM(cnt) * 100000000.0 + 0.5) / 100000000.0
             AS dsir_score
    FROM db JOIN w ON db.bucket = w.bucket
    GROUP BY db.doc_id
    """,
    category="2.J",
)
def q_llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (round 3) — Data Selection via Importance
    Resampling (Xie et al. 2023, the public recipe): score every raw doc
    by the mean log-likelihood ratio of its hashed-bigram features under
    the TARGET distribution (here lang='en', the domain being matched)
    vs the RAW corpus distribution, add-1 smoothed. High scores =
    target-like docs to up-sample into the mixture.

    Exactness: the per-bucket ratio ((t+1)(R+256)) / ((T+256)(r+1)) is a
    quotient of exact int64 products (< 2^53 at every test SF, so both
    engines build the identical double) and takes ONE transcendental ln;
    per-doc sums run through DECIMAL(38,18) (order-independence) with
    the floor-half-up 8dp final rounding — the q_agg_entropy law-18
    discipline. At 100 TB the products overflow 64-bit: switch the
    weight to ln(t+1)−ln(T+B)−ln(r+1)+ln(R+B) (the bucket table is 256
    rows — recomputing it is free; only the ulp discipline changes).

    Shape: one bigram scan feeds three hash-aggs (global bucket counts
    for raw + target = 256-row broadcasts; per-(doc, bucket) counts =
    the only data-scaled shuffle, on doc_id); the weight table broadcast-
    joins back. No window, no collect, no Python."""
    from aws_lambda_stream_processing_spark.llm.text import _toks

    d = _toks(load_table(spark, sf_dir, "documents"))
    bg = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1), "
                "i -> struct(element_at(t, i) AS w1, "
                "element_at(t, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select(
        "doc_id",
        "lang",
        (
            (
                F.ascii("b.w1") * 31
                + F.ascii("b.w2") * 17
                + F.length("b.w1") * 7
                + F.length("b.w2")
            )
            % _DSIR_BUCKETS
        ).alias("bucket"),
    )
    # Three consumers (raw counts, target counts, per-doc counts) would
    # each re-explode the corpus; materialize the slim (doc, lang, bucket)
    # stream once (the dprefix `materialize` rationale — measured 8.5 s →
    # ~2 s at sf0.1).
    bg = tracked_local_checkpoint(bg, eager=False)
    raw = bg.groupBy("bucket").agg(F.count("*").alias("r"))
    tgt = (
        bg.where(F.col("lang") == "en")
        .groupBy("bucket")
        .agg(F.count("*").alias("tc"))
    )
    tot = raw.agg(F.sum("r").alias("rtot")).crossJoin(
        tgt.agg(F.coalesce(F.sum("tc"), F.lit(0)).alias("ttot"))
    )
    w = (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.log(
                (
                    (F.coalesce(F.col("tc"), F.lit(0)) + 1)
                    * (F.col("rtot") + _DSIR_BUCKETS)
                ).cast("double")
                / (
                    (F.col("ttot") + _DSIR_BUCKETS) * (F.col("r") + 1)
                ).cast("double")
            ).alias("wb"),
        )
    )
    db = bg.groupBy("doc_id", "bucket").agg(F.count("*").alias("cnt"))
    # Multiply in DOUBLES, then cast the product to decimal: a
    # decimal(38,18) x bigint product would trip Spark's precision-loss
    # promotion (scale truncated toward 6 digits, ~1e-7 drift vs DuckDB's
    # 128-bit decimals — measured). The double product is the identical
    # IEEE op on both engines; the decimal sum restores order-independence.
    term = (F.col("wb") * F.col("cnt")).cast("decimal(38,18)")
    return (
        db.join(F.broadcast(w), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_bigrams"),
            (
                F.floor(
                    F.sum(term).cast("double") / F.sum("cnt")
                    * 100000000.0
                    + F.lit(0.5)
                )
                / 100000000.0
            ).alias("dsir_score"),
        )
    )


# Per-source TOKEN budget for q_llm_token_budget_quota — the data-mixture
# cap measured in what actually costs training compute (tokens), not doc
# count. Small enough to bite at every test SF.
TOKEN_BUDGET = 300


@query(
    "q_llm_token_budget_quota",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS tok_cnt
      FROM documents
    ),
    c AS (
      SELECT doc_id, source, tok_cnt,
             CAST(SUM(tok_cnt) OVER (
               PARTITION BY source
               ORDER BY tok_cnt DESC, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS cum_tokens
      FROM d
    )
    SELECT doc_id, source, tok_cnt, cum_tokens
    FROM c WHERE cum_tokens <= {TOKEN_BUDGET}
    ORDER BY source, cum_tokens
    """,
    category="2.J",
)
def q_llm_token_budget_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOKEN-budget quota (round-4 candidate landed early) —
    the mixture cap that matters for training cost: greedily keep each
    source's longest documents until the source's token budget is spent.
    Like q_llm_domain_quota, the per-source running sum is NOT a
    partitionBy(source) window (hot-domain fat task): ONE global
    two-phase cumsum (operators/dprefix.py) over (source, tok_cnt desc,
    doc_id) — sources are contiguous in that order, so
    within-source cumsum = global cumsum − source base, where the bases
    (min of exclusive cum per source) are a |sources|-row broadcast.
    Every data-scaled stage stays range-parallel; the budget filter is
    exact int64."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cumsum,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("tok_cnt"),
    )
    order = [("source", True), ("tok_cnt", False), ("doc_id", True)]
    c = two_phase_cumsum(d, order, "tok_cnt", out="__gcum", inclusive=True)
    base = c.groupBy("source").agg(
        F.min(F.col("__gcum") - F.col("tok_cnt")).alias("__base")
    )
    return (
        c.join(F.broadcast(base), "source")
        .withColumn("cum_tokens", F.col("__gcum") - F.col("__base"))
        .where(F.col("cum_tokens") <= TOKEN_BUDGET)
        .select("doc_id", "source", "tok_cnt", "cum_tokens")
        .orderBy("source", "cum_tokens")
    )


# Per-language sample size for q_llm_reservoir_sample.
RESERVOIR_K = 20


@query(
    "q_llm_reservoir_sample",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id, lang,
             md5(CAST(doc_id AS VARCHAR)) AS skey
      FROM documents
    ),
    r AS (
      SELECT doc_id, lang, skey,
             row_number() OVER (PARTITION BY lang
                                ORDER BY skey, doc_id) AS rk
      FROM keyed
    )
    SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
    FROM r WHERE rk <= {RESERVOIR_K}
    ORDER BY lang, rk
    """,
    category="2.J",
)
def q_llm_reservoir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-size per-language sample — the distributed
    stand-in for reservoir sampling: rank docs by a uniform hash key
    (md5 of the id — identical hex on both engines) and keep the first K
    per language. Statistically this IS a uniform k-sample, but unlike a
    sequential reservoir it is order-insensitive, mergeable, and
    reproducible across runs/engines — the property a 1000-executor
    ingest needs. Per-language rank derives from the GLOBAL two-phase
    rank over (lang, key) minus a |langs|-row broadcast base (the
    q_llm_domain_quota shape) — no bounded-key window, no single-task
    sort; at 100 TB you'd add a per-partition pre-filter to its local
    top-K before the range shuffle (same winners by a subset argument)."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_row_number,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "lang",
        F.md5(F.col("doc_id").cast("string")).alias("skey"),
    )
    ranked = two_phase_row_number(
        d, [("lang", True), ("skey", True), ("doc_id", True)], rn="__rn"
    )
    base = ranked.groupBy("lang").agg(F.min("__rn").alias("__rn0"))
    return (
        ranked.join(F.broadcast(base), "lang")
        .withColumn("rk", F.col("__rn") - F.col("__rn0") + 1)
        .where(F.col("rk") <= RESERVOIR_K)
        .select("doc_id", "lang", "rk")
        .orderBy("lang", "rk")
    )


@query(
    "q_llm_span_corruption",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    piece AS (
      SELECT doc_id, i,
             len(t) AS n_tokens,
             CASE WHEN ((doc_id + (i - 1) // 3) * 2654435761) % 97 >= 20
                  THEN t[i]
                  WHEN (i - 1) % 3 = 0 THEN '<X>'
                  END AS keep,
             CASE WHEN ((doc_id + (i - 1) // 3) * 2654435761) % 97 < 20
                  THEN t[i] END AS dropped
      FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
    )
    SELECT doc_id, MAX(n_tokens) AS n_tokens,
           CAST(COUNT(dropped) AS BIGINT) AS n_masked,
           string_agg(keep, ' ' ORDER BY i) AS masked_text,
           string_agg(dropped, ' ' ORDER BY i) AS targets
    FROM piece GROUP BY doc_id
    ORDER BY doc_id
    """,
    category="2.J",
)
def q_llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (Raffel et al. 2020) as a deterministic
    batch transform: tokens partition into aligned 3-token spans, ~20%
    of spans (a Knuth multiplicative hash of (doc_id, span) — the same
    selection on every engine and every run, unlike RNG masking) are
    replaced by ONE '<X>' sentinel, and the dropped tokens become the
    target sequence. This is the map that turns a curated corpus into
    denoising training pairs. Pure per-row array expressions — zero
    shuffles, embarrassingly parallel; the oracle rebuilds it through
    unnest + ordered string_agg."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.split("text", " ").alias("t"))
    sel = (
        "((doc_id + (i div 3)) * 2654435761) % 97 < 20"
    )
    pieces = F.expr(
        f"transform(t, (x, i) -> CASE WHEN NOT ({sel}) THEN x "
        f"WHEN i % 3 = 0 THEN '<X>' ELSE NULL END)"
    )
    dropped = F.expr(
        f"filter(transform(t, (x, i) -> CASE WHEN {sel} THEN x END), "
        "x -> x IS NOT NULL)"
    )
    return (
        t.select(
            "doc_id",
            F.size("t").cast("long").alias("n_tokens"),
            pieces.alias("pieces"),
            dropped.alias("drops"),
        )
        .select(
            "doc_id",
            "n_tokens",
            F.size("drops").cast("long").alias("n_masked"),
            F.concat_ws(
                " ", F.expr("filter(pieces, x -> x IS NOT NULL)")
            ).alias("masked_text"),
            F.when(F.size("drops") > 0, F.concat_ws(" ", "drops")).alias(
                "targets"
            ),
        )
        .orderBy("doc_id")
    )


from aws_lambda_stream_processing_spark.llm.text import SQL_QUALITY


@query(
    "q_llm_quality_calibration",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, {SQL_QUALITY} AS quality,
             sha256(text) AS h
      FROM documents
    ),
    dup AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS copies FROM q GROUP BY h
    ),
    deciled AS (
      SELECT q.doc_id, q.quality,
             CASE WHEN d.copies > 1 THEN 1 ELSE 0 END AS is_dup,
             ntile(10) OVER (ORDER BY q.quality, q.doc_id) AS decile
      FROM q JOIN dup d USING (h)
    )
    SELECT CAST(decile AS INTEGER) AS decile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(is_dup) AS BIGINT) AS n_dups,
           floor(CAST(SUM(is_dup) AS BIGINT) * 1.0 / COUNT(*)
                 * 10000.0 + 0.5) / 10000.0 AS dup_rate,
           floor(CAST(SUM(CAST(quality AS DECIMAL(38, 18))) AS DOUBLE)
                 / COUNT(*) * 1000000.0 + 0.5) / 1000000.0 AS avg_quality
    FROM deciled GROUP BY decile ORDER BY decile
    """,
    category="2.J",
)
def q_llm_quality_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score calibration against duplication — "do low-quality
    deciles carry the duplicate mass?", the sanity check run before
    trusting a quality filter to also thin duplicates (they correlate in
    web corpora; if they don't here, the pipeline needs both stages).
    Composition of three proven pieces: the exact-integer quality blend
    (quality_expr), SHA-256 exact-dup detection (32-byte keys on the
    shuffle), and decile assignment via the distributed two-phase rank +
    integer ntile reconstruction (operators/dprefix.py — ntile over a
    data-scaled relation never runs partition-less). Per-decile dup rate
    is one int division 4dp; mean quality is DECIMAL-summed 6dp."""
    from aws_lambda_stream_processing_spark.llm.text import (
        _toks, quality_expr,
    )
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        ntile_from_rank, two_phase_row_number,
    )

    d = _toks(load_table(spark, sf_dir, "documents"))
    q = d.select(
        "doc_id",
        quality_expr().alias("quality"),
        F.sha2("text", 256).alias("h"),
    )
    dup = q.groupBy("h").agg(F.count("*").alias("copies"))
    flagged = q.join(dup, "h").select(
        "doc_id", "quality",
        (F.col("copies") > 1).cast("long").alias("is_dup"),
    )
    ranked = two_phase_row_number(
        flagged, [("quality", True), ("doc_id", True)], rn="__rn", total="__n"
    )
    deciled = ranked.withColumn(
        "decile", ntile_from_rank("__rn", "__n", 10)
    )
    return (
        deciled.groupBy("decile")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("is_dup").alias("n_dups"),
            (
                F.floor(
                    F.sum("is_dup") * 1.0 / F.count("*") * 10000.0
                    + F.lit(0.5)
                )
                / 10000.0
            ).alias("dup_rate"),
            (
                F.floor(
                    F.sum(F.col("quality").cast("decimal(38,18)"))
                    .cast("double")
                    / F.count("*")
                    * 1000000.0
                    + F.lit(0.5)
                )
                / 1000000.0
            ).alias("avg_quality"),
        )
        .orderBy("decile")
    )


@query(
    "q_llm_shard_balance",
    oracle="""
    WITH sh AS (
      SELECT (doc_id * 2654435761) % 1000003 % 32 AS shard,
             len(string_split(text, ' ')) AS toks
      FROM documents
    ),
    per AS (
      SELECT shard,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(toks) AS BIGINT) AS n_tokens
      FROM sh GROUP BY shard
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(n_docs) AS BIGINT) AS total_docs,
           CAST(MIN(n_tokens) AS BIGINT) AS min_shard_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_shard_tokens,
           floor(CAST(MAX(n_tokens) AS DOUBLE) * COUNT(*)
                 / SUM(n_tokens) * 10000.0 + 0.5) / 10000.0
             AS max_over_mean
    FROM per
    """,
    category="2.J",
)
def q_llm_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-balance audit for the hash-sharded corpus layout every
    100 TB training job writes: docs scatter into 32 Knuth-hash shards
    and the audit reports the token-mass imbalance (max/mean ratio —
    the straggler predictor: the slowest shard IS the epoch time).
    Deterministic hash → the same layout every run and engine; exact
    integer masses, one rounded ratio. One map-side agg to 32 rows —
    the audit costs one scan no matter the corpus."""
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        ((F.col("doc_id") * 2654435761) % 1000003 % 32).alias("shard"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    per = sh.groupBy("shard").agg(
        F.count("*").alias("n_docs"), F.sum("toks").alias("n_tokens")
    )
    return per.agg(
        F.count("*").alias("n_shards"),
        F.sum("n_docs").alias("total_docs"),
        F.min("n_tokens").alias("min_shard_tokens"),
        F.max("n_tokens").alias("max_shard_tokens"),
        (
            F.floor(
                F.max("n_tokens").cast("double")
                * F.count("*")
                / F.sum("n_tokens")
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("max_over_mean"),
    )


@query(
    "q_llm_pack_efficiency",
    oracle="""
    WITH d AS (
      SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, toks,
             CAST(SUM(toks) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) - toks AS cum_before
      FROM d
    ),
    bins AS (
      SELECT cum_before // 512 AS bin_id,
             CAST(SUM(toks) AS BIGINT) AS bin_tokens,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM c GROUP BY 1
    ),
    closed AS (SELECT * FROM bins WHERE bin_id < (SELECT MAX(bin_id) FROM bins))
    SELECT CAST(COUNT(*) AS BIGINT) AS n_closed_bins,
           CAST(MIN(bin_tokens) AS BIGINT) AS min_fill,
           CAST(MAX(bin_tokens) AS BIGINT) AS max_fill,
           floor(CAST(SUM(CASE WHEN bin_tokens >= 512 THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*) * 10000.0 + 0.5) / 10000.0
             AS frac_full,
           floor(CAST(SUM(LEAST(bin_tokens, 512)) AS DOUBLE)
                 / (512.0 * COUNT(*)) * 10000.0 + 0.5) / 10000.0
             AS utilization
    FROM closed
    """,
    category="2.J",
)
def q_llm_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency audit for the q_llm_seq_pack layout — the
    number that decides whether concat-and-chunk is good enough or a
    bin-packing pass is worth its shuffle: per closed 512-token bin
    (the open tail bin excluded — it is legitimately unfull), the fill
    distribution, the fraction that reached capacity, and overall
    utilization = usable/(capacity*bins). Reuses the dprefix two-phase
    cumsum for the global token offsets (zero partition-less windows);
    bin aggregates are exact int64, ratios floor-4dp."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cumsum,
    )

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    c = two_phase_cumsum(
        d, [("doc_id", True)], "toks", out="cum_before", inclusive=False
    )
    bins = (
        c.select(
            F.floor(F.col("cum_before") / 512).alias("bin_id"), "toks"
        )
        .groupBy("bin_id")
        .agg(
            F.sum("toks").alias("bin_tokens"),
            F.count("*").alias("n_docs"),
        )
    )
    last = bins.agg(F.max("bin_id").alias("last_bin"))
    closed = bins.crossJoin(F.broadcast(last)).where(
        F.col("bin_id") < F.col("last_bin")
    )
    return closed.agg(
        F.count("*").alias("n_closed_bins"),
        F.min("bin_tokens").alias("min_fill"),
        F.max("bin_tokens").alias("max_fill"),
        (
            F.floor(
                F.sum(
                    F.when(F.col("bin_tokens") >= 512, 1).otherwise(0)
                ).cast("double")
                / F.count("*")
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("frac_full"),
        (
            F.floor(
                F.sum(F.least(F.col("bin_tokens"), F.lit(512)))
                .cast("double")
                / (512.0 * F.count("*"))
                * 10000.0
                + F.lit(0.5)
            )
            / 10000.0
        ).alias("utilization"),
    )


@query(
    "q_llm_temperature_mix",
    oracle="""
    WITH s AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source
    ),
    q AS (
      SELECT source, n_docs, n_tokens,
             CAST(floor(sqrt(CAST(n_tokens AS DOUBLE)) * 1000.0) AS BIGINT)
               AS s_i
      FROM s
    ),
    t AS (
      SELECT CAST(SUM(s_i) AS BIGINT) AS s_tot,
             CAST(SUM(n_tokens) AS BIGINT) AS n_tot
      FROM q
    )
    SELECT source, n_docs, n_tokens,
           floor(CAST(s_i AS DOUBLE) / s_tot * 100000000.0) / 100000000.0
             AS weight,
           floor(CAST(s_i AS DOUBLE) * n_tot / (CAST(s_tot AS DOUBLE) * n_tokens)
                 * 1000000.0) / 1000000.0 AS boost
    FROM q, t
    """,
    category="2.J",
)
def q_llm_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source sampling weights — the multilingual /
    multi-domain mixture rule (mBERT/mT5 exponential smoothing, here
    α = 1/2): sample source i with probability ∝ n_tokens(i)^α, which
    up-weights the tail and down-weights the head relative to natural
    token share; `boost` reports exactly that up/down-sampling factor
    (weight ÷ natural share). Complements q_llm_mixture_weights
    (natural shares) and q_llm_dsir_weights (importance weights).

    Exactness discipline: the ONLY float ops are IEEE-correctly-rounded
    on both engines — sqrt, one multiply by 1000, floor — giving an
    exact integer score s_i = floor(1000·√tokens); the normalizing sum
    then runs over INTEGERS (no float-summation-order hazard across
    sources), and each output is a single exact-int division, floored
    to fixed precision. Scale: one hash-agg on source (map-side
    combining), a 1-row broadcast total, zero data-scaled shuffles
    beyond the agg."""
    d = load_table(spark, sf_dir, "documents")
    s = d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    q = s.withColumn(
        "s_i",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000.0).cast(
            "long"
        ),
    )
    t = q.agg(
        F.sum("s_i").alias("s_tot"), F.sum("n_tokens").alias("n_tot")
    )
    return q.crossJoin(F.broadcast(t)).select(
        "source",
        "n_docs",
        "n_tokens",
        (
            F.floor(
                F.col("s_i").cast("double") / F.col("s_tot") * 100000000.0
            )
            / 100000000.0
        ).alias("weight"),
        (
            F.floor(
                F.col("s_i").cast("double")
                * F.col("n_tot")
                / (F.col("s_tot").cast("double") * F.col("n_tokens"))
                * 1000000.0
            )
            / 1000000.0
        ).alias("boost"),
    )


# q_llm_chunking: fixed-token chunking with overlap — size/stride chosen
# so chunks overlap (RAG / embedding-prep shape) and every doc in the
# corpus produces multiple chunks.
CHUNK_TOKENS = 32
CHUNK_STRIDE = 24


@query(
    "q_llm_chunking",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, string_split(text, ' ') AS t,
             len(string_split(text, ' ')) AS n
      FROM documents
    ),
    c AS (
      SELECT doc_id, t, n,
             unnest(generate_series(0, n - 1, {CHUNK_STRIDE})) AS start
      FROM d
    )
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           CAST(start AS BIGINT) AS start_tok,
           CAST(LEAST({CHUNK_TOKENS}, n - start) AS BIGINT) AS n_toks,
           t[start + 1] AS first_tok,
           t[start + LEAST({CHUNK_TOKENS}, n - start)] AS last_tok
    FROM c
    """,
    category="2.J",
)
def q_llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token chunking with overlap — the retrieval/embedding prep
    step (split every document into {CHUNK_TOKENS}-token windows at a
    {CHUNK_STRIDE}-token stride so consecutive chunks share context):
    one row per chunk with its position, length, and boundary tokens.
    Complements q_llm_seq_pack (training packing concatenates docs;
    chunking splits them). Pure built-ins: split → sequence → explode —
    per-row generation, zero shuffles, whole-stage codegen; at 100 TB
    this is an embarrassingly parallel map with output ~n/stride rows
    per doc. Exact oracle: the identical stride arithmetic via
    generate_series."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("t")
    ).withColumn("n", F.size("t"))
    c = d.select(
        "doc_id", "t", "n",
        F.explode(
            F.sequence(F.lit(0), F.col("n") - 1, F.lit(CHUNK_STRIDE))
        ).alias("start"),
    )
    n_toks = F.least(F.lit(CHUNK_TOKENS), F.col("n") - F.col("start"))
    return c.select(
        "doc_id",
        F.floor(F.col("start") / CHUNK_STRIDE).cast("long").alias("chunk_id"),
        F.col("start").cast("long").alias("start_tok"),
        n_toks.cast("long").alias("n_toks"),
        F.element_at("t", F.col("start") + 1).alias("first_tok"),
        F.element_at("t", F.col("start") + n_toks).alias("last_tok"),
    )


@query(
    "q_llm_forget_cascade",
    oracle=f"""
    WITH del AS (
      SELECT doc_id FROM documents WHERE doc_id % 97 = 0
    ),
    chunks AS (
      SELECT doc_id,
             CAST(len(generate_series(
               0, len(string_split(text, ' ')) - 1, {CHUNK_STRIDE}
             )) AS BIGINT) AS n_chunks
      FROM documents
    ),
    emb AS (
      SELECT vec_id FROM embeddings
    )
    SELECT
      CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS docs_deleted,
      CAST((SELECT COALESCE(SUM(n_chunks), 0) FROM chunks
            WHERE doc_id IN (SELECT doc_id FROM del)) AS BIGINT)
        AS chunks_deleted,
      CAST((SELECT COUNT(*) FROM emb
            WHERE vec_id IN (SELECT doc_id % 500 FROM del)) AS BIGINT)
        AS vecs_flagged,
      CAST((SELECT COUNT(*) FROM documents) AS BIGINT)
        - CAST((SELECT COUNT(*) FROM del) AS BIGINT) AS docs_remaining
    """,
    category="2.J",
)
def q_llm_forget_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deletion-request propagation (the right-to-be-forgotten pipeline
    op): given a deletion set (here the deterministic doc_id % 97 = 0
    cohort standing in for a GDPR request list), account for every
    derived artifact that must go with it — chunk rows (the
    q_llm_chunking derivation), referenced embedding vectors (the
    q_llm_multimodal_pack emb_ref mapping doc→vec_id), and the
    surviving corpus size. A real platform runs exactly this audit
    before the destructive pass, and the counts are the compliance
    receipt.

    Scale shape: the deletion set is REQUEST-sized, not corpus-sized —
    it broadcasts into semi-joins against each derived table (no
    shuffle of the big sides); the chunk count is arithmetic on token
    counts, not a materialized chunk table. One row out, exact
    integers."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    dele = d.where(F.col("doc_id") % 97 == 0).select("doc_id")
    n_chunks = F.ceil(F.size(F.split("text", " ")) / CHUNK_STRIDE).cast(
        "long"
    )
    chunks_deleted = (
        d.join(F.broadcast(dele), "doc_id", "left_semi")
        .agg(F.coalesce(F.sum(n_chunks), F.lit(0)).alias("v"))
    )
    vecs_flagged = e.join(
        F.broadcast(dele.select((F.col("doc_id") % 500).alias("vec_id"))),
        "vec_id",
        "left_semi",
    ).agg(F.count("*").alias("v"))
    totals = d.agg(
        F.count("*").alias("n_docs"),
        F.sum(F.when(F.col("doc_id") % 97 == 0, 1).otherwise(0)).alias(
            "n_del"
        ),
    )
    return (
        totals.crossJoin(F.broadcast(chunks_deleted.select(
            F.col("v").alias("chunks_deleted")
        )))
        .crossJoin(F.broadcast(vecs_flagged.select(
            F.col("v").alias("vecs_flagged")
        )))
        .select(
            F.col("n_del").cast("long").alias("docs_deleted"),
            F.col("chunks_deleted").cast("long"),
            F.col("vecs_flagged").cast("long"),
            (F.col("n_docs") - F.col("n_del")).cast("long").alias(
                "docs_remaining"
            ),
        )
    )


@query(
    "q_llm_curation_funnel",
    oracle="""
    WITH q AS (
      SELECT doc_id, source, text, n_chars,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) AS du,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a'))) AS ds
      FROM documents
    ),
    m AS (
      SELECT *, n_chars - n + 1 AS cn,
             (n BETWEEN 30 AND 80) AS r_len,
             (n BETWEEN 30 AND 80 AND 7 * n <= 2 * (n_chars - n + 1)
              AND 2 * (n_chars - n + 1) <= 9 * n
              AND 20 * ds >= n AND 5 * du >= n) AS keep
      FROM q
    ),
    d AS (
      SELECT *, doc_id = MIN(doc_id) OVER (PARTITION BY sha256(text))
               AS survivor
      FROM m
    ),
    adm AS (
      SELECT doc_id FROM (
        SELECT doc_id,
               SUM(CAST(n AS BIGINT)) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS UNBOUNDED PRECEDING) AS cum
        FROM d WHERE keep AND survivor
      ) WHERE cum <= 200
    )
    SELECT 0 AS stage, 'raw' AS name,
           CAST(COUNT(*) AS BIGINT) AS docs FROM m
    UNION ALL
    SELECT 1, 'length_band', CAST(COUNT(*) AS BIGINT)
    FROM m WHERE r_len
    UNION ALL
    SELECT 2, 'gopher_keep', CAST(COUNT(*) AS BIGINT)
    FROM m WHERE keep
    UNION ALL
    SELECT 3, 'exact_dedup', CAST(COUNT(*) AS BIGINT)
    FROM d WHERE keep AND survivor
    UNION ALL
    SELECT 4, 'token_quota', CAST(COUNT(*) AS BIGINT) FROM adm
    """,
    category="2.J",
)
def q_llm_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch curation funnel — per-stage attrition of the full pipeline
    (raw → length band → Gopher conjunctive gate → exact dedup → per-
    source arrival-order token quota), the audit every data team reads
    before shipping a corpus cut ("which stage is eating my data?").
    The stages reuse the EXACT semantics of their standalone queries
    (q_llm_length_band_filter / q_llm_gopher_rules / q_llm_exact_dedup /
    the q_stream_llm_curation quota with the same 200-token budget), so
    the funnel numbers reconcile against each of them; the streaming
    composition proves incremental==batch, this one reports the batch
    accounting. Scale: everything is one corpus pass + one hash-key
    shuffle (dedup window) + the per-source quota's co-keyed window —
    the funnel adds counters, not new exchanges. 5 rows out, exact
    integers."""
    from aws_lambda_stream_processing_spark.llm.text import STOPWORDS

    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    n = F.size(t)
    du = F.size(F.array_distinct(t))
    ds = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    cn = F.col("n_chars") - n + 1
    r_len = n.between(30, 80)
    keep = (
        r_len & (7 * n <= 2 * cn) & (2 * cn <= 9 * n)
        & (20 * ds >= n) & (5 * du >= n)
    )
    # pin the one corpus pass: the 5 stage counters below are unioned
    # independent aggregations, and without the pin each arm re-ran the
    # split+sha2 scan (the q_events_audience_overlap union-of-aggs
    # re-execution class). m is (doc-count x 6 narrow cols).
    m = tracked_local_checkpoint(
        d.select(
            "doc_id", "source",
            n.cast("long").alias("n"),
            r_len.alias("r_len"),
            keep.alias("keep"),
            F.sha2("text", 256).alias("h"),
        ),
        eager=False,
    )
    w_h = Window.partitionBy("h")
    dd = m.withColumn(
        "survivor", F.col("doc_id") == F.min("doc_id").over(w_h)
    )
    # pinned too: both the dedup stage counter and the quota chain fork
    # from it (same class as above, one dedup window instead of two)
    kept = tracked_local_checkpoint(dd.where("keep AND survivor"), eager=False)
    # per-source quota via the distributed two-phase cumsum (the
    # q_llm_token_budget_quota pattern) — a partitionBy(source) window
    # is 20 fat tasks at 100 TB, the exact shape this repo fences.
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_cumsum,
    )

    c = two_phase_cumsum(
        kept.select("doc_id", "source", "n"),
        [("source", True), ("doc_id", True)],
        "n",
        out="__gcum",
        inclusive=True,
    )
    base = c.groupBy("source").agg(
        F.min(F.col("__gcum") - F.col("n")).alias("__base")
    )
    adm = (
        c.join(F.broadcast(base), "source")
        .withColumn("cum", F.col("__gcum") - F.col("__base"))
        .where(F.col("cum") <= 200)
    )

    def stage(i, name, df):
        return df.agg(
            F.lit(i).alias("stage"),
            F.lit(name).alias("name"),
            F.count("*").alias("docs"),
        )

    return (
        stage(0, "raw", m)
        .unionByName(stage(1, "length_band", m.where("r_len")))
        .unionByName(stage(2, "gopher_keep", m.where("keep")))
        .unionByName(stage(3, "exact_dedup", kept))
        .unionByName(stage(4, "token_quota", adm))
    )


@query(
    "q_llm_corpus_diff",
    oracle="""
    WITH cur AS (SELECT doc_id, sha256(text) AS h FROM documents),
    prev AS (
      -- simulated previous generation, derived deterministically:
      -- ids % 7 = 0 had different content then; ids % 7 = 1 did not
      -- exist yet; 50 synthetic ids beyond the current range existed
      -- and were since removed; everything else is unchanged.
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
                  THEN sha256(text || '#prev') ELSE sha256(text) END AS h
      FROM documents WHERE doc_id % 7 <> 1
      UNION ALL
      SELECT m.mx + i AS doc_id, sha256(CAST(i AS VARCHAR)) AS h
      FROM (SELECT MAX(doc_id) AS mx FROM documents) m,
           (SELECT unnest(generate_series(1, 50)) AS i)
    ),
    j AS (
      SELECT COALESCE(c.doc_id, p.doc_id) AS doc_id,
             CASE WHEN p.doc_id IS NULL THEN 'added'
                  WHEN c.doc_id IS NULL THEN 'removed'
                  WHEN c.h <> p.h THEN 'changed'
                  ELSE 'unchanged' END AS status
      FROM cur c FULL OUTER JOIN prev p ON c.doc_id = p.doc_id
    )
    SELECT status, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM j GROUP BY status
    """,
    category="2.J",
)
def q_llm_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot DIFF — the incremental-refresh accounting every
    recurring corpus build starts with: full-outer join today's corpus
    against the previous generation on doc_id, classify every id as
    added / removed / changed (content hash moved) / unchanged, and
    count. The delta decides what downstream stages re-run (changed +
    added re-enter dedup and curation; removed cascades through
    q_llm_forget_cascade). The previous generation is SIMULATED
    deterministically from the current one (1/7 of ids changed, 1/7
    newly added, 50 ids since removed) so all four classes are
    populated at every SF and both engines derive the identical
    snapshot; a real deployment replaces the derivation with yesterday's
    manifest path. Only 32-byte (id, hash) projections cross the join —
    document text never moves; at 100 TB both sides shuffle once on
    doc_id (or co-partitioned snapshots skip even that). The diff grain
    is the id space, not the byte volume."""
    d = load_table(spark, sf_dir, "documents")
    cur = d.select("doc_id", F.sha2("text", 256).alias("h"))
    prev_core = d.where(F.col("doc_id") % 7 != 1).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.sha2(F.concat(F.col("text"), F.lit("#prev")), 256),
        )
        .otherwise(F.sha2("text", 256))
        .alias("h"),
    )
    mx = d.agg(F.max("doc_id").alias("mx"))
    prev_gone = (
        mx.select(
            F.explode(F.sequence(F.lit(1), F.lit(50))).alias("i"), "mx"
        )
        .select(
            (F.col("mx") + F.col("i")).alias("doc_id"),
            F.sha2(F.col("i").cast("string"), 256).alias("h"),
        )
    )
    prev = prev_core.unionByName(prev_gone).select(
        F.col("doc_id").alias("pid"), F.col("h").alias("hp")
    )
    j = cur.join(prev, cur.doc_id == prev.pid, "full_outer")
    status = (
        F.when(F.col("pid").isNull(), "added")
        .when(F.col("doc_id").isNull(), "removed")
        .when(F.col("h") != F.col("hp"), "changed")
        .otherwise("unchanged")
    )
    return j.groupBy(status.alias("status")).agg(
        F.count("*").alias("n_docs")
    )


@query(
    "q_llm_rater_kappa",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n,
             len(list_distinct(string_split(text, ' '))) AS du,
             len(list_filter(string_split(text, ' '),
                             x -> x IN ('the', 'a'))) AS ds
      FROM documents
    ),
    flags AS (
      SELECT doc_id,
             (n BETWEEN 30 AND 80
              AND 7 * n <= 2 * (n_chars - n + 1)
              AND 2 * (n_chars - n + 1) <= 9 * n
              AND 20 * ds >= n AND 5 * du >= n) AS gopher_keep,
             (16 * du + 8 * (n - ds)
              + LEAST(n_chars - n + 1, 8 * n)) / (32.0 * n) >= 0.7
                 AS quality_keep
      FROM q
    ),
    cells AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN gopher_keep AND quality_keep
                      THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN gopher_keep AND NOT quality_keep
                      THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN NOT gopher_keep AND quality_keep
                      THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN NOT gopher_keep AND NOT quality_keep
                      THEN 1 ELSE 0 END) AS BIGINT) AS d
      FROM flags
    )
    SELECT n, a, b, c, d,
           floor((a + d) * 1.0 / n * 1000000.0 + 0.5) / 1000000.0
               AS p_observed,
           floor((((a + b) * 1.0 * (a + c)
                   + (c + d) * 1.0 * (b + d)) / n / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS p_expected,
           floor(((a + d) * 1.0 / n
                  - ((a + b) * 1.0 * (a + c)
                     + (c + d) * 1.0 * (b + d)) / n / n)
                 / (1.0 - ((a + b) * 1.0 * (a + c)
                           + (c + d) * 1.0 * (b + d)) / n / n)
                 * 1000000.0 + 0.5) / 1000000.0 AS kappa
    FROM cells
    """,
    category="2.J",
)
def q_llm_rater_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COHEN'S KAPPA between the repo's two document-keep classifiers
    (the Gopher rule set and the quality>=0.7 threshold) — the
    chance-corrected agreement a curation pipeline reports before
    trusting two filters as interchangeable: raw agreement (a+d)/n
    flatters any pair of imbalanced raters (two filters that both
    keep ~everything 'agree' by accident); kappa subtracts the
    agreement their marginals predict. The 2x2 cells are exact int64
    from ONE pass computing both verdicts per doc (the rule algebra
    is integer-only on the gopher side and the certified quality
    expression tree on the other), kappa a single fixed IEEE tree
    floor-6dp. Agreement metrics close the curation loop: gopher
    (rules), quality score (continuous), calibration (vs labels),
    and now RATER CONSISTENCY (vs each other). One scan, 1-row
    output at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    du = F.size(F.array_distinct(toks))
    ds = F.size(
        F.filter(toks, lambda x: x.isin("the", "a"))
    )
    chars_net = F.col("n_chars") - n + 1
    gopher = (
        n.between(30, 80)
        & (7 * n <= 2 * chars_net)
        & (2 * chars_net <= 9 * n)
        & (20 * ds >= n)
        & (5 * du >= n)
    )
    quality = (
        (16 * du + 8 * (n - ds) + F.least(chars_net, 8 * n))
        / (32.0 * n)
        >= 0.7
    )
    cells = d.select(
        gopher.alias("g"), quality.alias("q")
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.sum((F.col("g") & F.col("q")).cast("long")).cast("long")
        .alias("a"),
        F.sum((F.col("g") & ~F.col("q")).cast("long")).cast("long")
        .alias("b"),
        F.sum((~F.col("g") & F.col("q")).cast("long")).cast("long")
        .alias("c"),
        F.sum((~F.col("g") & ~F.col("q")).cast("long")).cast("long")
        .alias("d"),
    )
    nn = F.col("n")
    a, b, c, dd = F.col("a"), F.col("b"), F.col("c"), F.col("d")
    po = (a + dd) * 1.0 / nn
    pe = ((a + b) * 1.0 * (a + c) + (c + dd) * 1.0 * (b + dd)) / nn / nn
    f6 = lambda x: F.floor(x * 1000000.0 + 0.5) / 1000000.0  # noqa: E731
    return cells.select(
        "n", "a", "b", "c", "d",
        f6(po).alias("p_observed"),
        f6(pe).alias("p_expected"),
        f6((po - pe) / (1.0 - pe)).alias("kappa"),
    )


@query(
    "q_llm_rrf_fusion",
    oracle="""
    WITH m AS (
      SELECT doc_id, n_chars,
             (CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
              * 1000000)
             // CAST(len(string_split(text, ' ')) AS BIGINT) AS ttr6
      FROM documents
    ),
    r1 AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rn
      FROM m
    ),
    r2 AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY ttr6 DESC, doc_id) AS rn
      FROM m
    ),
    fused AS (
      SELECT r1.doc_id,
             CAST(1000000000 // (60 + r1.rn)
                  + 1000000000 // (60 + r2.rn) AS BIGINT) AS rrf_x1e9,
             CAST(r1.rn AS BIGINT) AS rank_len,
             CAST(r2.rn AS BIGINT) AS rank_ttr
      FROM r1 JOIN r2 USING (doc_id)
    )
    SELECT doc_id, rank_len, rank_ttr, rrf_x1e9,
           CAST(row_number() OVER (ORDER BY rrf_x1e9 DESC, doc_id) AS INT)
             AS rank
    FROM fused
    ORDER BY rrf_x1e9 DESC, doc_id LIMIT 20
    """,
    category="2.J",
)
def q_llm_rrf_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion (RRF, Cormack 2009 — the standard
    hybrid-retrieval/curation combiner): rank the corpus by two
    independent signals — document length and type-token ratio (a
    lexical-diversity quality proxy, integer ppm via floor division) —
    and fuse with RRF(d) = Σ 1/(60+rank_i), selecting the top-20. The
    RRF contribution is computed as floor(10⁹/(60+rank)) so the fused
    score is an exact int64 sum — no float ever touches a rank
    boundary, and the oracle replays both rankings and the fusion
    bit-for-bit.

    Scale: both global rankings run through
    dprefix.two_phase_row_number (range exchange + broadcast offsets —
    no partition-less window), the fusion is one doc_id equi-join, and
    the final cut is a top-20 TakeOrderedAndProject. The same plan
    fuses any k ranking signals at 100 TB."""
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        two_phase_row_number,
    )

    d = load_table(spark, sf_dir, "documents")
    m = tracked_local_checkpoint(
        d.select(
            "doc_id",
            "n_chars",
            F.expr(
                "(CAST(size(array_distinct(split(text, ' '))) AS BIGINT)"
                " * 1000000) div CAST(size(split(text, ' ')) AS BIGINT)"
            ).alias("ttr6"),
        ),
        eager=False,
    )
    r1 = two_phase_row_number(
        m.select("doc_id", "n_chars"),
        [("n_chars", False), ("doc_id", True)],
        rn="rn1",
    ).select("doc_id", "rn1")
    r2 = two_phase_row_number(
        m.select("doc_id", "ttr6"),
        [("ttr6", False), ("doc_id", True)],
        rn="rn2",
    ).select("doc_id", "rn2")
    fused = r1.join(r2, "doc_id").select(
        "doc_id",
        F.col("rn1").alias("rank_len"),
        F.col("rn2").alias("rank_ttr"),
        (
            F.expr("1000000000 div (60 + rn1)")
            + F.expr("1000000000 div (60 + rn2)")
        ).alias("rrf_x1e9"),
    )
    w = Window.orderBy(F.desc("rrf_x1e9"), F.asc("doc_id"))
    return (
        fused.orderBy(F.desc("rrf_x1e9"), F.asc("doc_id"))
        .limit(20)
        .withColumn("rank", F.row_number().over(w))
        .select("doc_id", "rank_len", "rank_ttr", "rrf_x1e9", "rank")
    )


@query(
    "q_llm_curriculum_order",
    oracle=f"""
    WITH q AS (
      SELECT doc_id, source, {SQL_QUALITY} AS quality FROM documents
    ),
    b AS (
      SELECT doc_id, source,
             ntile(4) OVER (ORDER BY quality DESC, doc_id) AS band,
             (doc_id * 2654435761) % 2147483648 AS hkey
      FROM q
    ),
    c AS (
      SELECT CAST(row_number() OVER (ORDER BY band, hkey, doc_id)
                  AS BIGINT) AS pos,
             doc_id, CAST(band AS INTEGER) AS band, source
      FROM b
    )
    SELECT pos, doc_id, band, source FROM c WHERE pos <= 40 ORDER BY pos
    """,
    category="2.J",
)
def q_llm_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering — the deterministic schedule a staged training
    run feeds its loader: quality QUARTILE bands easy→hard (band 1 = top
    quality), and WITHIN each band a seedless deterministic shuffle (the
    Knuth multiplicative hash of the stable doc_id, the
    q_llm_weighted_sample discipline) so no band replays its docs in
    source/crawl order — source-burst runs inside a band are exactly the
    ordering pathology curriculum loaders shuffle away, and a re-run
    must produce the IDENTICAL schedule (hash, not rand(), so a resumed
    100 TB job can recompute any shard's slice independently). Output:
    the first 40 schedule positions with band and source.

    Scale shape: band assignment is the two-phase global rank + integer
    ntile reconstruction (operators/dprefix.py — ntile over the
    data-scaled doc relation never runs partition-less), the schedule
    position is a second two-phase rank over (band, hash, doc_id), and
    the pos<=40 cut filters AFTER a distributed rank (no global sort;
    the rank is the product, the limit is the sample). Overflow bound:
    doc_id·2654435761 < 2^63 through doc_id ≈ 3.5e9, same as
    q_llm_weighted_sample."""
    from aws_lambda_stream_processing_spark.llm.text import quality_expr
    from aws_lambda_stream_processing_spark.operators.dprefix import (
        ntile_from_rank, two_phase_row_number,
    )

    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id", "source", "n_chars",
        F.split("text", " ").alias("t"),
    ).select("doc_id", "source", quality_expr().alias("quality"))
    r1 = two_phase_row_number(
        q, [("quality", False), ("doc_id", True)], rn="qrn", total="n"
    )
    banded = r1.select(
        "doc_id", "source",
        ntile_from_rank("qrn", "n", 4).cast("int").alias("band"),
        ((F.col("doc_id") * F.lit(2654435761)) % F.lit(2147483648)).alias(
            "hkey"
        ),
    )
    pos = two_phase_row_number(
        banded,
        [("band", True), ("hkey", True), ("doc_id", True)],
        rn="pos",
    )
    return (
        pos.where(F.col("pos") <= 40)
        .select(F.col("pos").cast("long").alias("pos"),
                "doc_id", "band", "source")
        .orderBy("pos")
    )
