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
                          where even prefix postings are too big. Integer-
                          exact since r9: the DuckDB oracle replays the whole
                          signature/band pipeline, no weak check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from aws_lambda_stream_processing_spark.registry import (
    query,
    track_cache,
    tracked_local_checkpoint,
)
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
    "q_llm_softdedup",
    oracle="""
    WITH cls AS (
      SELECT sha256(text) AS h, CAST(COUNT(*) AS BIGINT) AS cluster_size
      FROM documents GROUP BY sha256(text)
    )
    SELECT d.doc_id, c.cluster_size,
           CAST(10000 // c.cluster_size AS BIGINT) AS weight_bp,
           CAST((d.n_chars * 10000) // c.cluster_size AS BIGINT)
             AS eff_chars_x10k
    FROM documents d JOIN cls c ON sha256(d.text) = c.h
    ORDER BY d.doc_id
    """,
    category="2.J",
)
def q_llm_softdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft deduplication (SoftDeDup, public): instead of DROPPING exact
    duplicates, reweight them — every member of a duplicate cluster gets
    sampling weight 1/cluster_size so the cluster contributes one
    document's worth of gradient mass while keeping all copies available
    (the FineWeb/SlimPajama-style alternative when provenance diversity
    matters more than corpus size). Clusters are the exact SHA-256
    content classes of q_llm_exact_dedup; weights are integer basis
    points (10000 div cls — exact floor division both engines) plus the
    per-doc effective-chars contribution the weighted sampler would see.

    Scale: one hash-agg on the 32-byte digest for cluster sizes, one
    digest equi-join back — documents never shuffle, and the weight
    column is what a downstream weighted sampler (q_llm_weighted_sample)
    consumes directly."""
    d = load_table(spark, sf_dir, "documents")
    h = F.sha2("text", 256)
    cls = d.groupBy(h.alias("h")).agg(F.count("*").alias("cluster_size"))
    return (
        d.select("doc_id", "n_chars", h.alias("h"))
        .join(cls, "h")
        .select(
            "doc_id",
            "cluster_size",
            F.expr("10000 div cluster_size").alias("weight_bp"),
            F.expr("(n_chars * 10000) div cluster_size").alias(
                "eff_chars_x10k"
            ),
        )
        .orderBy("doc_id")
    )


@query(
    "q_llm_neardup_jaccard",
    # Oracle rewritten r3 (21.9 s → 1.2 s at sf0.1, identical pairs):
    # (a) identical-set groups contract to a representative (Jaccard
    # depends only on the SET — J=1 pairs re-expand as within-group
    # pairs, qualifying rep pairs re-expand across both groups);
    # (b) the corpus vocabulary fits 63 bits (31 tokens, FIXTURES.md —
    # GUARDED by error() so a regenerated corpus fails loudly, never
    # silently), so each set is one BIGINT bitmask and the intersection
    # is bit_count(a&b) — the naive token self-join + 12M-pair hash agg
    # becomes a flat 8M-pair columnar scan. Oracle-side shortcut only:
    # the ENGINE keeps the vocabulary-agnostic deletion-neighborhood
    # join below.
    oracle=f"""
    WITH sets AS MATERIALIZED (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS s
      FROM documents
    ),
    member AS MATERIALIZED (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY s) AS rep FROM sets
    ),
    reps AS MATERIALIZED (
      SELECT MIN(doc_id) AS doc_id, s FROM sets GROUP BY s
    ),
    vocab AS MATERIALIZED (
      SELECT tok, CAST(row_number() OVER (ORDER BY tok) - 1 AS BIGINT) AS bit
      FROM (SELECT DISTINCT unnest(s) AS tok FROM reps)
    ),
    guard AS (
      SELECT CASE WHEN MAX(bit) > 62
                  THEN CAST(error(
                    'vocabulary exceeds 63 tokens; bitmask oracle invalid')
                    AS BIGINT)
                  ELSE 0 END AS z
      FROM vocab
    ),
    masks AS MATERIALIZED (
      SELECT t.doc_id,
             CAST(SUM((CAST(1 AS BIGINT) << v.bit) + g.z) AS BIGINT) AS mask,
             COUNT(*) AS n
      FROM (SELECT doc_id, unnest(s) AS tok FROM reps) t
      JOIN vocab v USING (tok) CROSS JOIN guard g
      GROUP BY t.doc_id
    ),
    rep_pairs AS MATERIALIZED (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             ROUND(bit_count(a.mask & b.mask) * 1.0
                   / (a.n + b.n - bit_count(a.mask & b.mask)), 4) AS jaccard
      FROM masks a JOIN masks b ON a.doc_id < b.doc_id
      WHERE bit_count(a.mask & b.mask) * 1.0
            / (a.n + b.n - bit_count(a.mask & b.mask)) >= {JACCARD_TAU}
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(1.0 AS DOUBLE) AS jaccard
    FROM member a JOIN member b ON a.rep = b.rep AND a.doc_id < b.doc_id
    UNION ALL
    SELECT LEAST(x.doc_id, y.doc_id) AS doc_a,
           GREATEST(x.doc_id, y.doc_id) AS doc_b, p.jaccard
    FROM rep_pairs p
    JOIN member x ON x.rep = p.doc_a
    JOIN member y ON y.rep = p.doc_b
    """,
    category="2.J",
)
def q_llm_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs with token-set Jaccard >= τ, via an EXACT
    deletion-neighborhood join (the SymSpell trick lifted to sets).

    Key fact: for sets with |A∪B| = u, a non-identical pair has
    J ≤ (u-1)/u, and a pair differing in ≥2 elements has J ≤ (u-2)/u.
    With τ = 0.95 this means any qualifying pair either has IDENTICAL
    distinct-token sets, or differs by EXACTLY one element (valid whenever
    the set-size ceiling < 2/(1-τ) = 40; this corpus' vocabulary is 31 —
    asserted by construction in FIXTURES.md). So instead of an all-pairs /
    inverted-index join (Θ(Σ df²) — degenerate on a 31-token vocabulary
    where every token appears in most documents), we:

      1. group identical set-keys (J = 1 pairs);
      2. join each doc's full set-key against every doc's u one-element-
         deletion keys (the A ⊂ B, |B\\A| = 1 pairs, J = (u-1)/u).

    O(n·u) keys total, one equi-join each — at 100 TB both joins shuffle
    on short hash keys, never on token postings. The DuckDB oracle keeps
    the naive all-pairs formulation (fine at oracle scale); results are
    identical because the neighborhood enumeration is exhaustive at this τ.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.sort_array(F.array_distinct(F.split("text", " "))).alias("s"),
    )
    return _deletion_neighborhood_pairs(docs, JACCARD_TAU).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


def _deletion_neighborhood_pairs(docs: DataFrame, tau: float) -> DataFrame:
    """EXACT set-Jaccard >= tau pairs via the deletion-neighborhood join,
    for thresholds high enough that qualifying pairs differ by at most one
    element (requires max |A∪B| < 2/(1-tau) — the caller asserts this for
    its corpus). `docs` = (doc_id, s) with s a SORTED distinct-element
    array; returns (doc_a < doc_b, jaccard_raw).

    The join key is an ADDITIVE multiset hash: each element hashed once
    (32-bit slice of xxhash64), full-key hash = Σh, deletion-key hash =
    Σh − h_i. Two rejected designs, both measured at sf0.1: string
    deletion keys materialize the ~whole document u times (10 s); hashing
    inside array lambdas runs interpreted at ~10 µs/element (16 s). This
    formulation keeps the O(n·u) path entirely in whole-stage codegen —
    explode → xxhash64 column → hash-agg → arithmetic (2 s). Additive
    hashes collide more than concatenation hashes; fine, because every
    hash candidate is EXACTLY verified against the real arrays — a
    collision degrades performance, never correctness."""
    min_u = F.ceil(F.lit(1.0) / (1 - tau))
    # cache: every branch of this DAG (hash pipeline, both sides of the
    # identical-sets join, deletion explode, the two verification joins)
    # re-derives `docs`, whose element arrays come from an interpreted
    # transform — pay that once (query-local; the registry janitor frees
    # it when the next query builds)
    docs = docs.cache()
    track_cache(docs.unpersist)
    # codegen'd hash pipeline: one row per (doc, element)
    ph = docs.select(
        "doc_id", F.explode("s").alias("e")
    ).select(
        "doc_id",
        F.xxhash64("e").bitwiseAND(F.lit(0xFFFFFFFF)).alias("h"),
    )
    agg = ph.groupBy("doc_id").agg(
        F.sum("h").alias("hsum"), F.count("*").alias("u")
    )
    # identical sets → J = 1.0; hash-equal id pairs verified on arrays below
    same_cand = (
        agg.alias("a")
        .join(agg.alias("b"), ["hsum", "u"])
        .where(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
    )
    # one-element-deletion neighborhood: doc X (set size u-1) matches doc Y
    # (set size u) iff X's full set equals one of Y's deletions;
    # J = (u-1)/u, qualifying iff u ≥ ceil(1/(1-τ))
    dels = ph.join(agg.where(F.col("u") >= min_u), "doc_id").select(
        F.col("doc_id").alias("doc_b"),
        F.col("u").alias("ub"),
        (F.col("hsum") - F.col("h")).alias("kh"),
    )
    sub_cand = (
        agg.select(
            F.col("doc_id").alias("doc_a"),
            F.col("hsum").alias("kh"),
            (F.col("u") + 1).alias("ub"),
        )
        .join(dels, ["kh", "ub"])
        .select("doc_a", "doc_b", "ub")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact verification of the (few) candidates against the real arrays
    # (AQE broadcasts the candidate side)
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("s").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("sb"))
    same = (
        same_cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(F.col("sa") == F.col("sb"))
        .select("doc_a", "doc_b", F.lit(1.0).alias("jaccard_raw"))
    )
    subset = (
        sub_cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            (F.size("sa") == F.col("ub") - 1)
            & (F.size(F.array_except("sa", "sb")) == 0)
        )
        .select(
            F.least("doc_a", "doc_b").alias("doc_a"),
            F.greatest("doc_a", "doc_b").alias("doc_b"),
            ((F.col("ub") - 1) / F.col("ub")).alias("jaccard_raw"),
        )
    )
    return same.unionByName(subset)


# Deterministic MinHash family: h_i(x) = (a_i * x + b_i) mod p, over crc32
# shingle hashes. Fixed constants → signatures reproducible run-to-run and
# across workers.
_MINHASH_P = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_N_HASHES = 16
_BANDS = 2  # 2 bands × 8 rows → per-band collision prob J^8: ≈0 for J < 0.6


_LSH_MINS_SQL = ", ".join(
    f"MIN((gh * {2 * i + 1} + {7 * i + 3}) % {_MINHASH_P}) AS h{i}"
    for i in range(_N_HASHES)
)
_LSH_B1_SQL = " || ',' || ".join(f"h{i}" for i in range(_N_HASHES // _BANDS))
_LSH_B2_SQL = " || ',' || ".join(
    f"h{i}" for i in range(_N_HASHES // _BANDS, _N_HASHES)
)


@query(
    "q_llm_minhash_lsh",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    th AS (
      SELECT tok,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(tok, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % 1000000007) AS h
      FROM v
    ),
    tk AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    bg AS (
      SELECT doc_id, t[i] AS tok1, t[i + 1] AS tok2
      FROM tk, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    gh AS (
      SELECT DISTINCT bg.doc_id,
             (h1.h * 1000003 + h2.h) % 1000000007 AS gh
      FROM bg
      JOIN th h1 ON h1.tok = bg.tok1
      JOIN th h2 ON h2.tok = bg.tok2
    ),
    mh AS (SELECT doc_id, {_LSH_MINS_SQL} FROM gh GROUP BY doc_id),
    bands AS (
      SELECT doc_id, '0|' || {_LSH_B1_SQL} AS bk FROM mh
      UNION ALL
      SELECT doc_id, '1|' || {_LSH_B2_SQL} AS bk FROM mh
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.bk = y.bk AND x.doc_id < y.doc_id
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM gh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS o
      FROM cand c
      JOIN gh a ON a.doc_id = c.doc_a
      JOIN gh b ON b.doc_id = c.doc_b AND b.gh = a.gh
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
def q_llm_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH banding near-dup detection — the sub-quadratic 100 TB
    path. Signatures are built over BIGRAM SHINGLES (w-shingling), not
    unigrams: this corpus' vocabulary is ~31 tokens, so every document
    contains nearly every unigram and unigram minhashes collide globally
    (that variant degenerates to an all-pairs join — measured 150 s at
    sf0.1; shingling restores signature diversity). 16 minhashes with a
    fixed affine family over polynomial shingle hashes, 2 bands of 8;
    the signature+banding step runs as ONE vectorized mapInPandas pass
    (the equivalent 16 interpreted array-lambda columns cost ~3.5 s/side
    at sf0.1 — higher-order exprs are not codegen'd); docs sharing a
    band bucket become candidate pairs (IDs only through the join),
    verified with exact shingle-set Jaccard >= τ via JVM
    array_intersect.

    EXACT oracle since r9 (r8 verdict item 3): shingle hashes are the
    same char-level polynomial fold q_llm_minhash_exact certifies
    cross-engine (not crc32), band keys are the joined min-value
    strings, and the Jaccard verification runs over the polynomial
    shingle-HASH sets (the q_llm_dedup_eval truth discipline) — so
    DuckDB replays signatures, banding, candidate generation, and the
    verification bit-for-bit. The banding S-curve still *approximates*
    (pairs below it are missed by construction) — but identically in
    both engines, so the output hash-matches. No 64-bit overflow
    anywhere: gh < 1e9+7, a <= 31, so a*gh + b < 2^35. The kernel
    piggybacks each doc's shingle-hash set on its band-0 row, so the
    verify side re-reads the cached kernel output instead of
    recomputing shingles."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    d = load_table(spark, sf_dir, "documents")

    # vectorized signature kernel: (doc_id, text) batches → one row per
    # (doc, band) with the band's bucket key (joined min values)
    A = np.array([2 * i + 1 for i in range(_N_HASHES)], dtype=np.int64)
    B = np.array([7 * i + 3 for i in range(_N_HASHES)], dtype=np.int64)
    rows_per_band = _N_HASHES // _BANDS

    def band_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def tok_hash(tok: str) -> int:
            h = memo.get(tok)
            if h is None:
                h = 7
                for ch in tok:
                    h = (h * 131 + ord(ch)) % _MH_MOD
                memo[tok] = h
            return h

        for pdf in batches:
            out = {"doc_id": [], "band": [], "bucket": [], "sh": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                if len(toks) < 2:
                    continue
                hs_list = [tok_hash(t) for t in toks]
                hs = np.fromiter(
                    {
                        (h1 * 1000003 + h2) % _MH_MOD
                        for h1, h2 in zip(hs_list, hs_list[1:])
                    },
                    dtype=np.int64,
                )
                # (n_shingles × n_hashes) affine family, column-min = signature
                sig = ((hs[:, None] * A[None, :] + B[None, :]) % _MINHASH_P).min(
                    axis=0
                )
                for band in range(_BANDS):
                    chunk = sig[band * rows_per_band : (band + 1) * rows_per_band]
                    out["doc_id"].append(doc_id)
                    out["band"].append(band)
                    out["bucket"].append(",".join(map(str, chunk)))
                    # shingle-hash set rides on the band-0 row only, so
                    # the verify step reuses this cached pass
                    out["sh"].append(hs if band == 0 else None)
            yield pd.DataFrame(out)

    # Cache the signature kernel: the band self-join below references
    # `buckets` on both sides, and without a cache the mapInPandas
    # Python pass executes twice (measured 4.0 -> 3.7 s best-of-2 solo
    # at sf0.1 — the kernel is cheap per pass here, but at 100 TB the
    # signature pass is the dominant cost and single execution is the
    # correct shape). A LAZY cache, not an eager checkpoint: this
    # builder is in the _MUST_BE_LAZY zero-jobs gate — the same
    # query-local cache + janitor-release pattern as the simhash-bands
    # token stream. Tiny frame — _BANDS rows per doc, 3 columns.
    buckets = d.select("doc_id", "text").mapInPandas(
        band_buckets, "doc_id long, band int, bucket string, sh array<long>"
    ).cache()
    track_cache(buckets.unpersist)
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
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    # exact verification on the kernel's shingle-hash sets (band-0 rows)
    docs = buckets.where(F.col("band") == 0).select("doc_id", "sh")
    sh_a = docs.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = docs.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    verified = (
        cand.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .withColumn("o", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jaccard_raw",
            F.col("o") / (F.size("sh_a") + F.size("sh_b") - F.col("o")),
        )
        .where(F.col("jaccard_raw") >= JACCARD_TAU)
    )
    return verified.select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


_SHINGLE_TAU = 0.985  # exact for max shingle-set union < 2/(1-τ) ≈ 133


@query(
    "q_llm_neardup_shingle",
    oracle=f"""
    WITH sh AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               range(2, len(string_split(text, ' ')) + 1),
               i -> string_split(text, ' ')[i-1] || ' '
                    || string_split(text, ' ')[i]))) AS g
      FROM documents
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS o
      FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b,
           ROUND(o * 1.0 / (x.n + y.n - o), 4) AS jaccard
    FROM inter
    JOIN sz x ON doc_a = x.doc_id
    JOIN sz y ON doc_b = y.doc_id
    WHERE o * 1.0 / (x.n + y.n - o) >= {_SHINGLE_TAU}
    """,
    category="2.J",
)
def q_llm_neardup_shingle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by BIGRAM-SHINGLE Jaccard >= τ — n-gram Jaccard
    is order-sensitive where token-set Jaccard is not (doc reorderings stop
    matching). Same exact deletion-neighborhood plan as
    q_llm_neardup_jaccard; exactness precondition max |shingle-set union| <
    2/(1-0.985) ≈ 133 holds (corpus max is 98, measured at all SFs).

    Shingle construction is posexplode → lag window → collect_set, all
    whole-stage-codegen + one doc_id shuffle that the per-doc hash agg
    downstream REUSES — not an array HOF: the index-lambda transform
    (element_at per position) runs interpreted and measured 5.9 s for
    this build at sf0.1 vs 2.0 s for this form (zip_with over two
    slices, also interpreted, measured 3.2 s — rejected too). Docs
    with <2 tokens drop out naturally (no lag row), matching the old
    size>=2 filter."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tr = d.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    wdoc = Window.partitionBy("doc_id").orderBy("pos")
    big = tr.select(
        "doc_id", F.lag("tok").over(wdoc).alias("p"), "tok"
    ).where(F.col("p").isNotNull())
    docs = big.groupBy("doc_id").agg(
        F.sort_array(
            F.collect_set(F.concat_ws(" ", "p", "tok"))
        ).alias("s")
    )
    return _deletion_neighborhood_pairs(docs, _SHINGLE_TAU).select(
        "doc_a", "doc_b", F.round("jaccard_raw", 4).alias("jaccard")
    )


_SIMHASH_BITS = 16
_SIMHASH_MOD = 1 << _SIMHASH_BITS


def _simhash_fingerprints(d: DataFrame) -> DataFrame:
    """(doc_id, simhash) via the char-fold polynomial + bit votes —
    shared by q_llm_simhash (the fingerprints) and q_llm_simhash_bands
    (the banded near-dup join over them)."""
    tf = (
        d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
    )
    th = tf.select("tok").distinct().withColumn(
        "h",
        F.aggregate(
            F.transform(
                F.sequence(F.lit(1), F.length("tok")),
                lambda i: F.ascii(
                    F.substring(F.col("tok"), i, F.lit(1))
                ).cast("long"),
            ),
            F.lit(0).cast("long"),
            lambda a, c: (a * 31 + c) % _SIMHASH_MOD,
        ),
    )
    votes = (
        tf.join(F.broadcast(th), "tok")
        .select(
            "doc_id",
            "cnt",
            "h",
            F.explode(
                F.sequence(F.lit(0), F.lit(_SIMHASH_BITS - 1))
            ).alias("k"),
        )
        .groupBy("doc_id", "k")
        .agg(
            F.sum(
                F.col("cnt")
                * (F.expr("(shiftright(h, k) & 1) * 2 - 1"))
            ).alias("v")
        )
    )
    return votes.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("v") > 0, F.expr("shiftleft(1, k)")).otherwise(0)
        ).alias("simhash")
    )


@query(
    "q_llm_simhash",
    oracle=f"""
    WITH tf AS (
      SELECT doc_id, tok, COUNT(*) AS cnt
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
            FROM documents)
      GROUP BY 1, 2
    ),
    th AS (
      SELECT tok,
             list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, length(tok) + 1),
                                i -> CAST(ascii(substr(tok, i, 1)) AS BIGINT))),
               (a, c) -> (a * 31 + c) % {_SIMHASH_MOD}) AS h
      FROM (SELECT DISTINCT tok FROM tf)
    ),
    votes AS (
      SELECT doc_id, k, SUM(cnt * ((((h >> k) & 1) * 2) - 1)) AS v
      FROM tf JOIN th USING (tok),
           LATERAL (SELECT unnest(range(0, {_SIMHASH_BITS})) AS k)
      GROUP BY 1, 2
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN v > 0 THEN (1 << k) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc_id
    """,
    category="2.J",
)
def q_llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint (Charikar): per bit k, tokens vote
    cnt·(±1) by bit k of their hash; fingerprint = the sign vector packed
    into 16 bits. Near-dup docs land within small Hamming distance — the
    constant-space alternative to MinHash signatures.

    The token hash is a char-fold polynomial mod 2^16 (exact integer math
    both engines can compute → exact oracle on the fingerprints, unlike
    murmur3-based sketches). Token hashes are computed once per DISTINCT
    token and broadcast — at 100 TB the vocabulary table is the only
    non-linear state and it is tiny; the bit-vote aggregation is two
    map-side-combining hash-aggs on (doc, bit) then (doc)."""
    d = load_table(spark, sf_dir, "documents")
    return _simhash_fingerprints(d)


@query(
    "q_llm_dedup_cc",
    # The oracle mirrors the engine's stage-1 contraction: identical token
    # sets collapse to their min-doc_id representative BEFORE the pair
    # join and the recursive closure. Without it this corpus's J=1
    # cliques put ~191k pairs into the edge list and the `reach` CTE
    # enumerates every (node, reachable-label) pair of every clique —
    # judge-measured 462.7 s at sf0.1, i.e. the whole verification
    # budget. Contracted (2k genuine pairs, clique mass gone) + the
    # MATERIALIZED hints (DuckDB otherwise re-inlines `reps`/`pairs`
    # into each of their 2-3 consumers), the same fixpoint runs in
    # ~17 s at sf0.1. Clusters are identical: J=1 members share every
    # component their representative is in, and min-label over reps ==
    # min doc_id over the full component because each rep is already the
    # min of its identical-set class.
    oracle=f"""
    WITH RECURSIVE sets AS MATERIALIZED (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS s
      FROM documents
    ),
    member AS (
      SELECT doc_id, MIN(doc_id) OVER (PARTITION BY s) AS rep FROM sets
    ),
    reps AS MATERIALIZED (
      SELECT MIN(doc_id) AS doc_id, s FROM sets GROUP BY s
    ),
    rt AS (SELECT doc_id, unnest(s) AS tok FROM reps),
    sz AS (SELECT doc_id, len(s) AS n FROM reps),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS o
      FROM rt a JOIN rt b ON a.tok = b.tok AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS MATERIALIZED (
      SELECT doc_a, doc_b
      FROM inter
      JOIN sz x ON doc_a = x.doc_id
      JOIN sz y ON doc_b = y.doc_id
      WHERE o * 1.0 / (x.n + y.n - o) >= {JACCARD_TAU}
    ),
    edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION ALL
      SELECT doc_b, doc_a FROM pairs
    ),
    reach AS (
      SELECT doc_id AS node, doc_id AS label FROM reps
      UNION
      SELECT e.b AS node, r.label FROM reach r JOIN edges e ON r.node = e.a
    ),
    cc AS (SELECT node, MIN(label) AS cluster_id FROM reach GROUP BY node)
    SELECT m.doc_id, c.cluster_id,
           COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size
    FROM member m JOIN cc c ON m.rep = c.node
    """,
    category="2.J",
)
def q_llm_dedup_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster assignment: connected components over the near-dup
    pair graph (token-set Jaccard >= tau edges from the deletion-neighborhood
    join), cluster id = min doc_id in the component. This is the step a real
    training pipeline runs AFTER pair detection — near-duplication is not
    transitive, so survivor selection needs the transitive closure (A~B, B~C
    puts all three in one cluster even when A!~C directly).

    Implementation, in three stages that each shrink the problem:

      1. CONTRACT identical-set equivalence classes (this corpus is heavily
         duplicated: 5000 docs → far fewer distinct token sets, and a J=1
         clique of k docs would otherwise contribute k(k-1)/2 edges —
         contraction cut the sf0.1 edge list from 382k to the few thousand
         genuine one-element-difference pairs, and the whole query from
         13 s to ~4 s). Representative = min doc_id of the class, so the
         final min-label semantics are unchanged.
      2. Deletion-neighborhood pair join on representatives only.
      3. Min-label propagation with pointer jumping (path halving): each
         round takes min(own, neighbors') labels then label := label's
         label — O(log d) rounds for component diameter d. Convergence is
         detected by the monotone sum-of-labels invariant (labels only
         decrease, so an unchanged exact integer sum == fixpoint);
         localCheckpoint truncates the growing loop lineage.

    At 100 TB: stage 1 is one hash-shuffle on a 32-byte set key; the loop
    runs with the edge list hash-partitioned on `src` and labels
    co-partitioned on node id (one-sided shuffle per round). The oracle is
    the same fixpoint as a DuckDB recursive CTE (min reachable label).
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.sort_array(F.array_distinct(F.split("text", " "))).alias("s"),
    )
    # The contraction + loop execute EAGERLY here (localCheckpoint), inside
    # the builder — scope the shuffle width to the actual parallelism for
    # their many small stages (a driver session's 200 default costs ~3× in
    # task-scheduling overhead per round — measured 20 s vs 7 s at sf0.01).
    saved_sp = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set(
        "spark.sql.shuffle.partitions",
        str(spark.sparkContext.defaultParallelism),
    )
    try:
        member, labels = _cc_labels(spark, docs)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved_sp)
    # un-contract: every doc inherits its representative's component label
    w = Window.partitionBy("cluster_id")
    return (
        member.join(labels, member.rep == labels.node)
        .select("doc_id", F.col("label").alias("cluster_id"))
        .withColumn("cluster_size", F.count("*").over(w))
    )


def _cc_labels(spark: SparkSession, docs: DataFrame):
    """Contraction + pair join + pointer-jumping label loop for
    q_llm_dedup_cc; returns (member: doc_id→rep, lazy — consumed once
    by the caller's final join; labels: rep→component label)."""
    # stage 1: contract identical token sets to their min-doc_id rep.
    # ONE hash-agg on the 32-byte set key produces BOTH the contracted
    # corpus (rep_docs) and, via a join back on k, the doc_id→rep map —
    # the r3 structure paid a second corpus-wide window (sort within
    # every k-partition) just to re-derive what the agg already knew.
    # The agg result is checkpointed once (it is the contracted corpus,
    # strictly smaller than the input); `member` stays LAZY — it is
    # consumed exactly once by the caller's final join, so the driver's
    # collect pays its single k-keyed shuffle then, not eagerly here.
    keyed = docs.select(
        "doc_id", "s", F.sha2(F.concat_ws("\x01", "s"), 256).alias("k")
    )
    reps = tracked_local_checkpoint(
        keyed.groupBy("k")
        .agg(F.min("doc_id").alias("doc_id"), F.first("s").alias("s"))
    )
    member = keyed.select("doc_id", "k").join(
        reps.select("k", F.col("doc_id").alias("rep")), "k"
    ).select("doc_id", "rep")
    rep_docs = reps.select("doc_id", "s")
    # stage 2: near-dup pairs between distinct sets only (J=1 pairs are
    # gone by construction; the helper's identical-set branch finds nothing)
    pairs = _deletion_neighborhood_pairs(rep_docs, JACCARD_TAU).select(
        "doc_a", "doc_b"
    )
    edges = (
        pairs.unionByName(
            pairs.select(
                F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b")
            )
        )
        .withColumnRenamed("doc_a", "src")
        .withColumnRenamed("doc_b", "dst")
    )
    # pin the pair join; the loop re-reads it each round
    edges = tracked_local_checkpoint(edges)
    # Adaptive strategy (the AQE philosophy applied to the CC loop): the
    # contracted graph is usually RADICALLY smaller than the corpus —
    # identical-set contraction already collapsed the duplicate mass, and
    # near-dup edges are sparse by construction. When the edge list provably
    # fits on the driver (<= ~2M edges ≈ 32 MB of two int64 columns), a
    # single-pass union-find beats ~6 distributed label-propagation rounds
    # of pure job overhead (measured 8.7 s → ~2 s at sf0.01). The
    # distributed pointer-jumping loop below remains the path taken the
    # moment the bound is exceeded — same labels either way (min doc_id per
    # component). The bound check and the data pull are ONE action (r3
    # verdict #2): collect up to N+1 rows via limit() and branch on the
    # length — the r3 shape paid a full count() job AND a collect() job
    # over the same checkpointed edge list.
    _CC_EDGE_BOUND = 2_000_000
    edge_rows = edges.select("src", "dst").limit(_CC_EDGE_BOUND + 1).collect()
    if len(edge_rows) <= _CC_EDGE_BOUND:
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            root = x
            while parent.get(root, root) != root:
                root = parent[root]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = root, parent[x]
            return root

        # rows already on the driver from the single guard action above
        # (~32 MB worst case of two int64 columns at the bound)
        for src, dst in edge_rows:
            ra, rb = find(src), find(dst)
            if ra != rb:
                # union by min id → the root IS the min label invariant
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        # Only nodes that appear in an edge were collected (bounded by the
        # threshold); isolated reps — the unbounded majority at scale —
        # stay distributed and label themselves via the left join.
        edge_labels = spark.createDataFrame(
            [(n, find(n)) for n in parent] or [(int(-1), int(-1))],
            "enode BIGINT, elabel BIGINT",
        )
        labels = (
            rep_docs.select(F.col("doc_id").alias("node"))
            .join(
                F.broadcast(edge_labels),
                F.col("node") == F.col("enode"),
                "left",
            )
            .select("node", F.coalesce("elabel", "node").alias("label"))
        )
        return member, labels

    labels = tracked_local_checkpoint(rep_docs.select(
        F.col("doc_id").alias("node"), F.col("doc_id").alias("label")
    ))
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for _ in range(20):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy(F.col("src").alias("node"))
            .agg(F.min("label").alias("nlabel"))
        )
        stepped = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least("label", F.coalesce("nlabel", "label")).alias("label"),
        )
        # pointer jump (path halving): label := label's label — labels form
        # a forest pointing toward smaller ids, so one jump halves depths
        ptr = stepped.select(
            F.col("node").alias("pnode"), F.col("label").alias("plabel")
        )
        labels = tracked_local_checkpoint(
            stepped.join(ptr, stepped.label == ptr.pnode, "left")
            .select(
                "node",
                F.coalesce("plabel", "label").alias("label"),
            )
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError("connected components did not converge in 20 rounds")
    return member, labels


# --- q_llm_minhash_exact (round 2) -----------------------------------------

# Cross-engine-verifiable MinHash: q_llm_minhash_lsh's numpy-kernel
# signatures ran as a weak rows-only check before its r9 integer-LCG
# oracle upgrade; these signatures are built
# from explicit integer arithmetic both engines reproduce bit-for-bit, so
# the oracle hash-matches. Token hashes come from a character-level
# polynomial fold computed ONCE over the DISTINCT vocabulary (tiny relative
# to the corpus at any scale) and joined back; shingle (bigram) hashes
# combine the two token hashes; k permutations (a_k*h + b_k) mod P are
# min-reduced per doc in one hash-agg.
_MH_MOD = 1_000_000_007
_MH_P = 2_147_483_647  # Mersenne prime 2^31-1
_MH_SEEDS = [
    (1_103_515_245, 12_345),
    (214_013, 2_531_011),
    (69_069, 362_437),
    (1_664_525, 1_013_904_223),
    (22_695_477, 1),
    (134_775_813, 1_234_567),
    (48_271, 399_268_537),
    (16_807, 49_297),
]
_MH_SIG_SQL = ", ".join(
    f"CAST(MIN(({a} * gh + {b}) % {_MH_P}) AS VARCHAR)"
    for a, b in _MH_SEEDS
)


@query(
    "q_llm_minhash_exact",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    th AS (
      SELECT tok,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(tok, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % {_MH_MOD}) AS h
      FROM v
    ),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS tok1, t[i + 1] AS tok2
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    gh AS (
      SELECT bg.doc_id,
             (h1.h * 1000003 + h2.h) % {_MH_MOD} AS gh
      FROM bg
      JOIN th h1 ON h1.tok = bg.tok1
      JOIN th h2 ON h2.tok = bg.tok2
    )
    SELECT doc_id,
           concat_ws(',', {_MH_SIG_SQL}) AS sig
    FROM gh GROUP BY doc_id
    """,
    category="2.J",
)
def q_llm_minhash_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (8 permutations over bigram shingles) with fully
    deterministic integer hashing — the cross-engine-checkable variant of
    the LSH sketch: Jaccard-similar docs share signature positions, and a
    band join over `sig` prefixes gives the same sub-quadratic candidate
    generation as q_llm_minhash_lsh.

    Scale: the char-level polynomial fold (an interpreted lambda, ~10
    µs/element — SURVEY §8 law 1) runs ONLY on the distinct vocabulary,
    which is millions of rows when the corpus is billions — then
    broadcast-joins back to the shingle stream; the per-doc min-reduce is
    one map-side-combining hash-agg on doc_id. No Python, no UDFs."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "tok")
    )
    vocab = toks.select("tok").distinct()
    char_hashes = F.transform(
        F.split("tok", ""), lambda c: F.ascii(c).cast("long")
    )
    th = vocab.select(
        "tok",
        F.aggregate(
            char_hashes,
            F.lit(7).cast("long"),
            lambda acc, x: (acc * 131 + x) % _MH_MOD,
        ).alias("h"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bg = toks.select(
        "doc_id",
        F.col("tok").alias("tok1"),
        F.lead("tok", 1).over(w).alias("tok2"),
    ).where(F.col("tok2").isNotNull())
    gh = (
        bg.join(F.broadcast(th.withColumnRenamed("h", "h1")), bg.tok1 == th.tok)
        .drop("tok")
        .join(
            F.broadcast(
                th.select(
                    F.col("tok").alias("tok_b"), F.col("h").alias("h2")
                )
            ),
            F.col("tok2") == F.col("tok_b"),
        )
        .select(
            "doc_id",
            ((F.col("h1") * 1000003 + F.col("h2")) % _MH_MOD).alias("gh"),
        )
    )
    mins = [
        F.min((F.lit(a) * F.col("gh") + F.lit(b)) % _MH_P).cast("string")
        for a, b in _MH_SEEDS
    ]
    return gh.groupBy("doc_id").agg(
        F.concat_ws(",", *mins).alias("sig")
    )


# --- q_llm_dedup_survivor (round 2) ----------------------------------------


@query(
    "q_llm_dedup_survivor",
    oracle="""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             lang || '|' ||
             array_to_string(string_split(text, ' ')[1:5], ' ') AS k
      FROM documents
    ),
    ranked AS (
      SELECT doc_id, k,
             first_value(doc_id) OVER (
               PARTITION BY k ORDER BY n_chars DESC, doc_id) AS survivor_id,
             COUNT(*) OVER (PARTITION BY k) AS cluster_size
      FROM keyed
    )
    SELECT doc_id, survivor_id, CAST(cluster_size AS BIGINT) AS cluster_size
    FROM ranked WHERE cluster_size > 1
    """,
    category="2.J",
)
def q_llm_dedup_survivor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship mapping: cluster docs by a deterministic
    near-dup key (language + 5-token prefix — the cheap blocking key that
    seeds every entity-resolution pipeline), elect one survivor per
    cluster by quality (longest doc, doc_id tie-break), and emit the
    doc→survivor action list for clusters with duplicates. This is the
    step BETWEEN candidate generation (MinHash/shingle ops) and the
    actual delete: which copy to keep, and a stable mapping for
    provenance.

    One exchange on the blocking key serves both windows (first_value +
    count). At 100 TB the same shape runs keyed on the MinHash band or
    connected-component id from the upstream dedup ops — swap the key,
    keep the election."""
    d = load_table(spark, sf_dir, "documents")
    k = F.concat_ws(
        "|",
        "lang",
        F.array_join(F.slice(F.split("text", " "), 1, 5), " "),
    )
    keyed = d.select("doc_id", "n_chars", k.alias("k"))
    w = Window.partitionBy("k").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wc = Window.partitionBy("k")
    ranked = keyed.select(
        "doc_id",
        F.first("doc_id").over(w).alias("survivor_id"),
        F.count("*").over(wc).alias("cluster_size"),
    )
    return ranked.where(F.col("cluster_size") > 1).select(
        "doc_id", "survivor_id", "cluster_size"
    )


# --- q_llm_dedup_eval (round 2) ---------------------------------------------

_EV_MINS_SQL = ", ".join(
    f"MIN(({a} * gh + {b}) % {_MH_P}) AS h{i}"
    for i, (a, b) in enumerate(_MH_SEEDS)
)
_EV_B1_SQL = " || ',' || ".join(f"h{i}" for i in range(4))
_EV_B2_SQL = " || ',' || ".join(f"h{i}" for i in range(4, 8))


@query(
    "q_llm_dedup_eval",
    oracle=f"""
    WITH v AS (
      SELECT DISTINCT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    th AS (
      SELECT tok,
             list_reduce(
               list_prepend(CAST(7 AS BIGINT),
                 list_transform(string_split(tok, ''),
                                c -> CAST(ascii(c) AS BIGINT))),
               (acc, x) -> (acc * 131 + x) % {_MH_MOD}) AS h
      FROM v
    ),
    toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    bg AS (
      SELECT doc_id, t[i] AS tok1, t[i + 1] AS tok2
      FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
    ),
    gh AS (
      SELECT bg.doc_id,
             (h1.h * 1000003 + h2.h) % {_MH_MOD} AS gh
      FROM bg
      JOIN th h1 ON h1.tok = bg.tok1
      JOIN th h2 ON h2.tok = bg.tok2
    ),
    mh AS (
      SELECT doc_id, {_EV_MINS_SQL}
      FROM gh GROUP BY doc_id
    ),
    bands AS (
      SELECT doc_id, '1|' || {_EV_B1_SQL} AS bk FROM mh
      UNION ALL
      SELECT doc_id, '2|' || {_EV_B2_SQL} AS bk FROM mh
    ),
    cand AS (
      SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
      FROM bands x JOIN bands y
        ON x.bk = y.bk AND x.doc_id < y.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, gh FROM gh),
    sz AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, CAST(COUNT(*) AS BIGINT) AS o
      FROM cand c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.gh = a.gh
      GROUP BY c.doc_a, c.doc_b
    ),
    scored AS (
      SELECT c.doc_a, c.doc_b, COALESCE(i.o, 0) AS o, x.n AS na, y.n AS nb
      FROM cand c
      LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
      JOIN sz x ON c.doc_a = x.doc_id
      JOIN sz y ON c.doc_b = y.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(CASE WHEN 3 * o >= na + nb THEN 1 ELSE 0 END)
                AS BIGINT) AS n_true,
           CAST(CASE WHEN COUNT(*) = 0 THEN 0
                ELSE SUM(CASE WHEN 3 * o >= na + nb THEN 1 ELSE 0 END)
                     * 10000 // COUNT(*) END AS BIGINT) AS precision_bp
    FROM scored
    """,
    category="2.J",
)
def q_llm_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-ladder EVALUATION: take the LSH candidate pairs (2 bands x 4
    rows over the exact-MinHash signatures of `q_llm_minhash_exact`) and
    score them against TRUE shingle Jaccard — precision in integer basis
    points. The >= 0.5 truth test is the pure-integer inequality
    3*o >= na + nb (o/(na+nb-o) >= 1/2 cleared of the division), so the
    whole evaluation is exact: candidate generation, truth, and the
    precision ratio (integer floor division).

    This is the measurement that justifies the banding parameters the
    weak `q_llm_minhash_lsh` ships: recall needs ground truth over all
    pairs (infeasible by definition at scale — that's WHY LSH exists),
    but precision is computable exactly over the candidate set, which is
    sub-quadratic by construction.

    Scale shape: signatures and band keys are one hash-agg each;
    candidates come from an equi self-join on band key (the LSH bucket
    join); the truth join touches only candidate pairs x their shingle
    sets — never all pairs. Everything shuffles ids and 8-int signatures,
    not text."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    toks = d.select("doc_id", F.explode(t).alias("tok"))
    vocab = toks.select("tok").distinct()
    # Vocab hash table materialized ONCE: both broadcast sides below
    # reference it, and an un-pinned broadcast side re-runs the full
    # explode+distinct+HOF vocabulary pass PER BROADCAST (measured 4.4 s
    # -> 0.4 s for the bigram join at sf0.1). Vocab-sized — tiny
    # relative to the corpus at any scale.
    th = tracked_local_checkpoint(
        vocab.select(
            "tok",
            F.aggregate(
                F.transform(
                    F.split("tok", ""), lambda c: F.ascii(c).cast("long")
                ),
                F.lit(7).cast("long"),
                lambda acc, x: (acc * 131 + x) % _MH_MOD,
            ).alias("h"),
        )
    )
    # Adjacent bigram pairs formed ARRAY-SIDE (zip of the array with its
    # own tail) — narrow, no shuffle. The r8 form ran lead() over a
    # (doc_id, pos) window, which shuffled and sorted the full token
    # stream as STRINGS before hashing; at 100 TB that exchange is the
    # corpus. Zero exchanges now precede the distinct-shingle shuffle.
    bg = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
                F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.0").alias("tok1"), F.col("p.1").alias("tok2"))
    gh = (
        bg.join(F.broadcast(th.withColumnRenamed("h", "h1")), bg.tok1 == th.tok)
        .drop("tok")
        .join(
            F.broadcast(
                th.select(F.col("tok").alias("tok_b"), F.col("h").alias("h2"))
            ),
            F.col("tok2") == F.col("tok_b"),
        )
        .select(
            "doc_id",
            ((F.col("h1") * 1000003 + F.col("h2")) % _MH_MOD).alias("gh"),
        )
    )
    # MIN is duplicate-invariant, so the signature agg needs only the
    # DISTINCT (doc_id, gh) shingle sets — the same relation the truth
    # join consumes on both sides and the size agg reads. Materialize it
    # ONCE, eagerly: the r8 lazy-cache form recomputed the distinct from
    # cache (and under block eviction the whole token-hash pipeline) up
    # to three times, which was the measured 4.0–8.6 s run-to-run spread
    # (r8 verdict watch item). An eager localCheckpoint pins the one
    # shuffle deterministically; blocks die on the next foreign build.
    # 16-byte rows (two longs) — ids and hashes shuffle, never text.
    sh = tracked_local_checkpoint(gh.distinct())
    mh = sh.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("gh") + F.lit(b)) % _MH_P).alias(f"h{i}")
            for i, (a, b) in enumerate(_MH_SEEDS)
        ]
    )
    b1 = mh.select(
        "doc_id",
        F.concat_ws(
            ",", F.lit("1|"), *[F.col(f"h{i}") for i in range(4)]
        ).alias("bk"),
    )
    b2 = mh.select(
        "doc_id",
        F.concat_ws(
            ",", F.lit("2|"), *[F.col(f"h{i}") for i in range(4, 8)]
        ).alias("bk"),
    )
    bands = b1.unionByName(b2)
    x = bands.alias("x")
    y = bands.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.bk") == F.col("y.bk"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(
            F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b")
        )
        .distinct()
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a_sh = sh.select(F.col("doc_id").alias("doc_a"), F.col("gh").alias("g_a"))
    b_sh = sh.select(F.col("doc_id").alias("b_id"), F.col("gh").alias("g_b"))
    inter = (
        cand.join(a_sh, "doc_a")
        .join(
            b_sh,
            (F.col("doc_b") == F.col("b_id"))
            & (F.col("g_a") == F.col("g_b")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("o"))
    )
    scored = (
        cand.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"o": 0})
        .join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb")), "doc_b")
    )
    true_flag = F.when(3 * F.col("o") >= F.col("na") + F.col("nb"), 1).otherwise(0)
    return scored.agg(
        F.count("*").alias("n_candidates"),
        F.sum(true_flag).alias("n_true"),
        F.expr(
            "CAST(CASE WHEN COUNT(*) = 0 THEN 0 ELSE"
            " SUM(CASE WHEN 3 * o >= na + nb THEN 1 ELSE 0 END) * 10000"
            " div COUNT(*) END AS BIGINT)"
        ).alias("precision_bp"),
    )


@query(
    "q_llm_line_dedup",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
    ),
    chunks AS (
      SELECT doc_id, (i - 1) // 10 AS chunk_id,
             array_to_string(t[i : i + 9], ' ') AS chunk
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) + 1, 10)) AS i)
    ),
    freq AS (
      SELECT chunk, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs
      FROM chunks GROUP BY chunk
    )
    SELECT c.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           CAST(SUM(CASE WHEN f.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_chunks,
           CAST(SUM(CASE WHEN f.n_docs > 1
                         THEN length(c.chunk) ELSE 0 END) AS BIGINT)
             AS dup_chars
    FROM chunks c JOIN freq f ON f.chunk = c.chunk
    GROUP BY c.doc_id ORDER BY c.doc_id
    """,
    category="2.J",
)
def q_llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-document (line/span) deduplication — the CCNet/C4 step the
    doc-level ladder can't do: documents are segmented into
    deterministic 10-token chunks, a chunk appearing in MORE THAN ONE
    document is boilerplate to strip (headers, licenses, navigation),
    and each doc reports how much of it would be removed. Chunk
    frequency is a hash agg on the chunk text (at 100 TB: on its
    64-bit hash — 8-byte shuffle rows, the q_llm_exact_dedup
    discipline); the per-doc join back is chunk-keyed. Counts and char
    totals exact. Segmentation is position-based (not content-based) so
    both engines produce identical chunks by construction."""
    d = load_table(spark, sf_dir, "documents")
    chunks = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, (size(split(text, ' ')) - 1) div 10), "
                "k -> array_join(slice(split(text, ' '), k * 10 + 1, 10), ' '))"
            )
        ).alias("chunk"),
    )
    freq = chunks.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("n_docs")
    )
    return (
        chunks.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") > 1, 1).otherwise(0)).alias(
                "n_dup_chunks"
            ),
            F.sum(
                F.when(F.col("n_docs") > 1, F.length("chunk")).otherwise(0)
            ).alias("dup_chars"),
        )
        .orderBy("doc_id")
    )


@query(
    "q_llm_dup_rate_source",
    oracle="""
    WITH h AS (
      SELECT source, sha256(text) AS hsh
      FROM documents
    ),
    c AS (SELECT hsh, CAST(COUNT(*) AS BIGINT) AS cnt FROM h GROUP BY hsh)
    SELECT h.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_docs,
           ROUND(SUM(CASE WHEN c.cnt > 1 THEN 1 ELSE 0 END) * 1.0
                 / COUNT(*), 4) AS dup_ratio
    FROM h JOIN c USING (hsh)
    GROUP BY h.source ORDER BY h.source
    """,
    category="2.J",
)
def q_llm_dup_rate_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-mass attribution by source — WHERE the duplication comes
    from: per source, the fraction of its docs whose exact content hash
    appears more than once CORPUS-WIDE (the report a curation run files
    before deciding per-source sampling weights; pairs with
    q_llm_domain_quota). 32-byte hashes shuffle, never bodies
    (q_llm_exact_dedup discipline); corpus-wide counts join back on the
    hash key; one bounded per-source agg. Ratios are one int division,
    display-rounded."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("source", F.sha2("text", 256).alias("hsh"))
    c = h.groupBy("hsh").agg(F.count("*").alias("cnt"))
    dup = F.when(F.col("cnt") > 1, 1).otherwise(0)
    return (
        h.join(c, "hsh")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(dup).alias("n_dup_docs"),
            F.round(F.sum(dup) / F.count("*"), 4).alias("dup_ratio"),
        )
        .orderBy("source")
    )


# Banded near-dup join over the SimHash fingerprints: the oracle reuses
# q_llm_simhash's registered oracle verbatim as its fingerprint CTE, so
# the two can never drift apart.
from aws_lambda_stream_processing_spark.registry import REGISTRY as _REG

_SIMHASH_FP_SQL = _REG["q_llm_simhash"].oracle


@query(
    "q_llm_simhash_bands",
    oracle=f"""
    WITH fp AS ({_SIMHASH_FP_SQL}),
    bands AS (
      SELECT doc_id, simhash, b.b,
             (simhash // CASE b.b WHEN 0 THEN 1 ELSE 256 END) % 256 AS bv
      FROM fp CROSS JOIN (SELECT unnest([0, 1]) AS b) b
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS da, a.simhash AS ha,
                      c.doc_id AS db, c.simhash AS hb
      FROM bands a JOIN bands c
        ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id
    ),
    hits AS (
      SELECT da, db,
             CAST(bit_count(CAST(xor(ha, hb) AS BIGINT)) AS INTEGER)
               AS hamming
      FROM cand
      WHERE bit_count(CAST(xor(ha, hb) AS BIGINT)) <= 1
    )
    SELECT hamming,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(da) AS BIGINT) AS min_doc_a,
           CAST(MIN(db) AS BIGINT) AS min_doc_b
    FROM hits GROUP BY hamming ORDER BY hamming
    """,
    category="2.J",
)
def q_llm_simhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup JOIN — the scalable rung above the
    fingerprints: split the 16-bit hash into 2 x 8-bit bands; by
    pigeonhole every pair within Hamming distance 1 shares at least one
    band, so band-bucket equi-joins surface ALL candidates and the
    exact bit_count(xor) <= 1 filter keeps the near-dups — no all-pairs
    scan anywhere (the same band→bucket→verify shape as MinHash-LSH,
    with XOR popcount as the verifier). At 100 TB you widen to a 64-bit
    hash and 8-bit bands so buckets stay sparse; the join topology is
    unchanged. Oracle reuses q_llm_simhash's registered SQL verbatim as
    its fingerprint CTE — the two rungs cannot drift."""
    d = load_table(spark, sf_dir, "documents")
    fp = _simhash_fingerprints(d)
    bspine = spark.range(0, 2).select(F.col("id").cast("int").alias("b"))
    bands = fp.crossJoin(F.broadcast(bspine)).select(
        "doc_id", "simhash", "b",
        F.expr("(simhash div shiftleft(1, 8 * b)) % 256").alias("bv"),
    )
    a = bands.select(
        F.col("b"), F.col("bv"),
        F.col("doc_id").alias("da"), F.col("simhash").alias("ha"),
    )
    c = bands.select(
        F.col("b").alias("b2"), F.col("bv").alias("bv2"),
        F.col("doc_id").alias("db"), F.col("simhash").alias("hb"),
    )
    cand = (
        a.join(
            c,
            (F.col("b") == F.col("b2"))
            & (F.col("bv") == F.col("bv2"))
            & (F.col("da") < F.col("db")),
        )
        .select("da", "ha", "db", "hb")
        .distinct()
    )
    ham = F.bit_count(F.expr("ha ^ hb")).cast("int")
    return (
        cand.where(ham <= 1)
        .select("da", "db", ham.alias("hamming"))
        .groupBy("hamming")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("da").alias("min_doc_a"),
            F.min("db").alias("min_doc_b"),
        )
        .orderBy("hamming")
    )


@query(
    "q_llm_dedup_savings",
    oracle="""
    WITH d AS (
      SELECT doc_id, sha256(text) AS h,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
      FROM documents
    ),
    cl AS (
      SELECT h, CAST(COUNT(*) AS BIGINT) AS copies,
             CAST(SUM(toks) AS BIGINT) AS cl_tokens,
             CAST(MIN(toks) AS BIGINT) AS one_copy_tokens
      FROM d GROUP BY h
    )
    SELECT copies,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(cl_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(cl_tokens - one_copy_tokens) AS BIGINT)
             AS tokens_saved
    FROM cl GROUP BY copies ORDER BY copies
    """,
    category="2.J",
)
def q_llm_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup savings report — the number that justifies the dedup
    budget BEFORE running it: per duplicate-cluster size, how many
    clusters exist and how many training tokens exact dedup would
    reclaim (cluster tokens minus one kept copy — identical texts, so
    MIN(toks) is the kept copy's count). The cluster-size histogram is
    also the skew warning for every downstream near-dup join (law 7's
    k²/2 pair blowup lives in the big clusters). One 32-byte-hash
    shuffle + two bounded aggs."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.sha2("text", 256).alias("h"),
        F.size(F.split("text", " ")).cast("long").alias("toks"),
    )
    cl = d.groupBy("h").agg(
        F.count("*").alias("copies"),
        F.sum("toks").alias("cl_tokens"),
        F.min("toks").alias("one_copy_tokens"),
    )
    return (
        cl.groupBy("copies")
        .agg(
            F.count("*").alias("n_clusters"),
            F.sum("cl_tokens").alias("total_tokens"),
            F.sum(
                F.col("cl_tokens") - F.col("one_copy_tokens")
            ).alias("tokens_saved"),
        )
        .orderBy("copies")
    )


# q_llm_prefix_dup: shared-prefix length in tokens — crawl near-dups
# that exact hashing misses (same article, different footer/boilerplate
# tail) collide on their first PREFIX_K tokens.
PREFIX_K = 16


@query(
    "q_llm_prefix_dup",
    oracle=f"""
    WITH p AS (
      SELECT doc_id,
             array_to_string(string_split(text, ' ')[1:{PREFIX_K}], ' ')
               AS prefix
      FROM documents
      WHERE len(string_split(text, ' ')) >= {PREFIX_K}
    ),
    g AS (
      SELECT prefix,
             CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM p GROUP BY prefix
    )
    SELECT md5(prefix) AS prefix_key, survivor_id, n_docs
    FROM g WHERE n_docs >= 2
    """,
    category="2.J",
)
def q_llm_prefix_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-prefix duplicate groups — the crawl-artifact class exact
    hashing misses: the same article re-crawled with a different
    footer/timestamp tail hashes differently but collides on its first
    {PREFIX_K} tokens. Groups of ≥ 2 docs sharing a full {PREFIX_K}-token
    prefix are reported with their min-doc_id survivor (the
    q_llm_exact_dedup survivorship rule applied at prefix granularity;
    the deletion-neighborhood family covers mid-document edits, this
    covers tail edits at one hash-agg's cost). Shorter docs are exempt —
    a short doc IS its own prefix and q_llm_exact_dedup owns that case.
    Scale: the shuffle carries one 32-char key per doc (the md5 of the
    prefix, never the text); one map-side-combining hash-agg."""
    d = load_table(spark, sf_dir, "documents")
    t = F.split("text", " ")
    p = d.where(F.size(t) >= PREFIX_K).select(
        "doc_id",
        F.concat_ws(" ", F.slice(t, 1, PREFIX_K)).alias("prefix"),
    )
    return (
        p.groupBy("prefix")
        .agg(
            F.min("doc_id").alias("survivor_id"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_docs") >= 2)
        .select(F.md5("prefix").alias("prefix_key"), "survivor_id", "n_docs")
    )


# Calibration bound for q_llm_jaccard_spectrum's deliberate all-pairs
# stage: 65536 contracted sets → ≤ 2^31 weighted pair popcounts, a
# seconds-scale GEMM-like stage on a cluster and the most this exact-eval
# rung should ever be pointed at (beyond it, sample first).
_JS_MAX_CONTRACTED_SETS = 65_536


@query(
    "q_llm_jaccard_spectrum",
    oracle="""
    WITH sets AS (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS s
      FROM documents
    ),
    classes AS (
      SELECT MIN(doc_id) AS rep, s, CAST(COUNT(*) AS BIGINT) AS cls
      FROM sets GROUP BY s
    ),
    rt AS (SELECT rep, unnest(s) AS tok FROM classes),
    sz AS (SELECT rep, len(s) AS n, cls FROM classes),
    inter AS (
      SELECT a.rep AS ra, b.rep AS rb, CAST(COUNT(*) AS BIGINT) AS o
      FROM rt a JOIN rt b ON a.tok = b.tok AND a.rep < b.rep
      GROUP BY 1, 2
    ),
    cross_pairs AS (
      SELECT CASE
               WHEN 20 * o >= 19 * (x.n + y.n - o) THEN '[0.95,1.0)'
               WHEN 10 * o >=  9 * (x.n + y.n - o) THEN '[0.90,0.95)'
               WHEN  5 * o >=  4 * (x.n + y.n - o) THEN '[0.80,0.90)'
               WHEN 10 * o >=  7 * (x.n + y.n - o) THEN '[0.70,0.80)'
               WHEN  2 * o >=      (x.n + y.n - o) THEN '[0.50,0.70)'
               ELSE '(0.00,0.50)'
             END AS band,
             x.cls * y.cls AS pairs
      FROM inter
      JOIN sz x ON ra = x.rep
      JOIN sz y ON rb = y.rep
    ),
    within AS (
      SELECT '1.00' AS band,
             CAST(SUM(cls * (cls - 1) / 2) AS BIGINT) AS n_pairs
      FROM classes WHERE cls >= 2
    )
    SELECT band, CAST(SUM(pairs) AS BIGINT) AS n_pairs
    FROM cross_pairs GROUP BY band
    UNION ALL
    SELECT band, n_pairs FROM within
    """,
    category="2.J",
)
def q_llm_jaccard_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT Jaccard similarity spectrum of the corpus — the tuning curve
    every dedup threshold (and every LSH banding choice) is picked
    against: how many document pairs live in each similarity band.
    Identical-set classes are CONTRACTED first (min-doc_id rep, class
    size), so the quadratic work runs over DISTINCT token sets only and
    each set-pair's count is weighted by the product of class sizes;
    within-class pairs are the closed-form C(cls,2) at J = 1. Band
    membership is decided by INTEGER cross-multiplication
    (q·o ≥ p·(|A|+|B|−o)) — no float ever touches a band edge.

    Pairwise intersection sizes come from BITSET algebra, not an
    inverted-index join: tokens get dense ids from a deterministic
    sorted dictionary, every set folds into 60-bit mask chunks, and
    |A∩B| = Σ_chunks popcount(maskA & maskB) over an all-pairs join of
    the CONTRACTED masks (33.5 s → 3.1 s warm at sf0.1 vs the token
    join, whose 31 hot token keys each matched ~1250×1250 rows). The
    chunk layout is ADAPTIVE behind one vocabulary-bounded scalar
    action: a ≤60-token vocabulary takes the scalar-mask path —
    bit_count over two long columns in whole-stage codegen — because
    the general array path pays interpreted zip_with/aggregate per
    pair (higher-order functions don't codegen; measured 7.2 s vs
    1.1 s for the all-pairs stage). Pairs sharing zero tokens land in
    the lowest band by the same arithmetic (o = 0).

    Scale: the all-pairs stage is quadratic in DISTINCT sets by design —
    this is the exact-eval rung, run on a contraction-sized calibration
    sample; at 100 TB candidate generation belongs to the banded
    MinHash/SimHash generators (q_llm_minhash_lsh, q_llm_simhash_bands)
    and this query calibrates their thresholds (the q_llm_dedup_eval
    pattern, corpus-wide). Since r9 the contraction bound is ASSERTED,
    not assumed: the builder counts contracted sets and refuses above
    _JS_MAX_CONTRACTED_SETS (65536 → ≤2^31 weighted popcounts), telling
    the caller to sample — so the deliberate n² stage and the
    dictionary window it feeds are provably bounded on ANY corpus. The
    mask dictionary is vocabulary-bounded and broadcast."""
    d = load_table(spark, sf_dir, "documents")
    sets = d.select(
        "doc_id",
        F.sort_array(F.array_distinct(F.split("text", " "))).alias("s"),
    )
    classes = sets.groupBy("s").agg(
        F.min("doc_id").alias("rep"), F.count("*").alias("cls")
    ).cache()
    track_cache(classes.unpersist)
    # GATE the real quadratic bound (r8 verdict item 5): the all-pairs
    # popcount runs over CONTRACTED distinct token-sets, and that count —
    # not the raw corpus size or the fixture's vocabulary — is what must
    # stay calibration-sized. Assert it, don't assume it: above the
    # bound the correct move is running this rung on a sample, not
    # silently launching an n² stage.
    # Failure semantics (r9 ADVICE, adjudicated "none required"): this
    # raises inside the query FUNCTION, which every harness wraps
    # per-query (driver_sim, bench.py, the pytest sweep) — an
    # over-bound corpus records a clean single-rung failure with this
    # message; registry import/load_all never executes query bodies,
    # so registry construction cannot abort here. The eager
    # classes.count() is the price of refusing BEFORE the n² stage is
    # scheduled rather than after.
    n_sets = classes.count()
    if n_sets > _JS_MAX_CONTRACTED_SETS:
        raise ValueError(
            f"q_llm_jaccard_spectrum: {n_sets} contracted token-sets "
            f"exceed the calibration bound {_JS_MAX_CONTRACTED_SETS} — "
            "run the spectrum on a corpus sample instead of an "
            "all-pairs stage this size"
        )
    # deterministic dense token ids (sorted) — vocabulary-bounded
    toks = classes.select(F.explode("s").alias("tok")).distinct()
    w_tok = Window.orderBy("tok")
    # vocabulary-sized; read twice (masks + nc probe)
    tdict = tracked_local_checkpoint(toks.select(
        "tok", (F.row_number().over(w_tok) - 1).alias("idx")
    ))
    rt = classes.select("rep", F.explode("s").alias("tok")).join(
        F.broadcast(tdict), "tok"
    )
    # One bounded action: the chunk count (vocabulary-bounded scalar).
    # nc == 1 (vocab ≤ 60) takes the SCALAR mask path — bit_count over
    # two long columns in whole-stage codegen; the general array path
    # pays interpreted zip_with/aggregate per pair (higher-order
    # functions don't codegen — measured 7.2 s vs 1.1 s for the
    # all-pairs stage at sf0.1 on this 31-token vocabulary).
    nc = int(
        tdict.agg(
            (F.floor(F.max("idx") / 60) + 1).cast("int").alias("nc")
        ).collect()[0][0]
    )
    sized = classes.select("rep", F.size("s").alias("n"), "cls")
    if nc == 1:
        masks = rt.groupBy("rep").agg(
            F.sum(F.pow(F.lit(2.0), F.col("idx")).cast("long")).alias("m")
        ).join(sized, "rep")
        # The all-pairs stage planned as a CartesianProduct over two
        # 1-partition (AQE-coalesced, bytes-tiny) agg outputs — the n²
        # popcount ran as ONE task (r12 plan audit). Pin the STREAMED
        # side at the session's shuffle width and broadcast the other:
        # W parallel tasks, one broadcast of the ≤65536-row mask table,
        # identical pair multiset (guide §2.5 — AQE sizes by bytes and
        # is blind to per-row compute).
        _w = int(spark.conf.get("spark.sql.shuffle.partitions"))
        a = masks.repartition(_w).select(
            F.col("rep").alias("ra"), F.col("m").alias("ma"),
            F.col("n").alias("nx"), F.col("cls").alias("cx"),
        )
        b = masks.select(
            F.col("rep").alias("rb"), F.col("m").alias("mb"),
            F.col("n").alias("ny"), F.col("cls").alias("cy"),
        )
        pairs = a.join(F.broadcast(b), F.col("ra") < F.col("rb")).select(
            "nx", "ny", "cx", "cy",
            F.bit_count(F.col("ma").bitwiseAND(F.col("mb")))
            .cast("long")
            .alias("o"),
        )
    else:
        chunked = rt.groupBy(
            "rep", (F.col("idx") / 60).cast("long").alias("chunk")
        ).agg(
            F.sum(
                F.pow(F.lit(2.0), F.col("idx") % 60).cast("long")
            ).alias("m")
        )
        masks = (
            chunked.groupBy("rep")
            .agg(F.map_from_entries(
                F.collect_list(F.struct("chunk", "m"))
            ).alias("cm"))
            .select(
                "rep",
                F.expr(
                    f"transform(sequence(0, {nc} - 1), "
                    "c -> coalesce(cm[cast(c as bigint)], 0L))"
                ).alias("ms"),
            )
            .join(sized, "rep")
        )
        # same parallelization as the scalar path (see above)
        _w = int(spark.conf.get("spark.sql.shuffle.partitions"))
        a = masks.repartition(_w).select(
            F.col("rep").alias("ra"), F.col("ms").alias("ma"),
            F.col("n").alias("nx"), F.col("cls").alias("cx"),
        )
        b = masks.select(
            F.col("rep").alias("rb"), F.col("ms").alias("mb"),
            F.col("n").alias("ny"), F.col("cls").alias("cy"),
        )
        pairs = a.join(F.broadcast(b), F.col("ra") < F.col("rb")).select(
            "nx", "ny", "cx", "cy",
            F.expr(
                "aggregate(zip_with(ma, mb, (x, y) -> bit_count(x & y)), "
                "0, (acc, v) -> acc + v)"
            ).cast("long").alias("o"),
        )
    u = F.col("nx") + F.col("ny") - F.col("o")
    band = (
        F.when(20 * F.col("o") >= 19 * u, "[0.95,1.0)")
        .when(10 * F.col("o") >= 9 * u, "[0.90,0.95)")
        .when(5 * F.col("o") >= 4 * u, "[0.80,0.90)")
        .when(10 * F.col("o") >= 7 * u, "[0.70,0.80)")
        .when(2 * F.col("o") >= u, "[0.50,0.70)")
        .otherwise("(0.00,0.50)")
    )
    cross_pairs = (
        pairs.where(F.col("o") > 0)
        .groupBy(band.alias("band"))
        .agg(F.sum(F.col("cx") * F.col("cy")).alias("n_pairs"))
    )
    within = (
        classes.where(F.col("cls") >= 2)
        .agg(
            F.sum(F.col("cls") * (F.col("cls") - 1) / 2)
            .cast("long")
            .alias("n_pairs")
        )
        .select(F.lit("1.00").alias("band"), "n_pairs")
    )
    return cross_pairs.unionByName(within)


_LEAK_SHARDS = 8


@query(
    "q_llm_dedup_shard_leakage",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, sha256(text) AS ch, doc_id % {_LEAK_SHARDS} AS shard
      FROM documents
    ),
    global_s AS (
      SELECT CAST(COUNT(DISTINCT ch) AS BIGINT) AS n FROM h
    ),
    local_s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT DISTINCT shard, ch FROM h)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM h) AS n_docs,
           g.n AS global_survivors,
           l.n AS shardlocal_survivors,
           l.n - g.n AS leaked_duplicates
    FROM global_s g, local_s l
    """,
    category="2.J",
)
def q_llm_dedup_shard_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard-local vs GLOBAL dedup leakage — the quantified argument for
    why exact dedup must shuffle on the content hash: a pipeline that
    deduplicates within each shard (the tempting no-shuffle shortcut)
    keeps one copy PER SHARD of every cross-shard duplicate, and this
    query counts exactly how many duplicate documents that shortcut
    would leak into training (shard-local survivors − global
    survivors). Zero leakage happens only when duplicates are already
    co-sharded — i.e. when the sharding key IS the content hash, which
    is precisely the global dedup shuffle. Both counts are one
    hash-agg each over 32-byte hashes; the comparison costs nothing
    beyond the audit it settles."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select(
        F.sha2("text", 256).alias("ch"),
        (F.col("doc_id") % _LEAK_SHARDS).alias("shard"),
    )
    n_docs = h.agg(F.count("*").alias("n_docs"))
    g = h.agg(F.countDistinct("ch").alias("global_survivors"))
    l = (
        h.select("shard", "ch")
        .distinct()
        .agg(F.count("*").alias("shardlocal_survivors"))
    )
    return (
        n_docs.crossJoin(F.broadcast(g))
        .crossJoin(F.broadcast(l))
        .select(
            "n_docs",
            "global_survivors",
            "shardlocal_survivors",
            (
                F.col("shardlocal_survivors") - F.col("global_survivors")
            ).alias("leaked_duplicates"),
        )
    )


@query(
    "q_llm_neardup_edit",
    oracle="""
    WITH d AS (
      SELECT doc_id, text, length(text) AS L, length(text) // 6 AS band
      FROM documents
    ),
    cand AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, a.text AS ta, b.text AS tb
      FROM d a JOIN d b ON a.band = b.band AND a.doc_id < b.doc_id
      UNION ALL
      SELECT a.doc_id, b.doc_id, a.text, b.text
      FROM d a JOIN d b ON a.band + 1 = b.band
    )
    SELECT LEAST(ia, ib) AS doc_a,
           GREATEST(ia, ib) AS doc_b,
           CAST(levenshtein(ta, tb) AS BIGINT) AS dist
    FROM cand
    WHERE abs(length(ta) - length(tb)) <= 5
      AND levenshtein(ta, tb) <= 5
    """,
    category="2.J",
)
def q_llm_neardup_edit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by EDIT DISTANCE <= 5 — the character-level
    near-dup definition (typo/OCR/template-drift twins) that shingle
    and token-set Jaccard both miss when a single in-word edit changes
    every shingle it touches. EXACT via length-band blocking: edit
    distance d implies |len(a) - len(b)| <= d, so with band =
    length // 6 every qualifying pair lands in the same or adjacent
    band — two equi-joins (band, band+1) generate candidates, never an
    inequality nested loop (the unbanded length-window join form is
    the classic accidental O(n^2): measured 14 s in the oracle engine
    at sf0.01 vs 1.4 s banded). Candidates then pay one levenshtein
    each — Spark's builtin with the threshold argument short-circuits
    the DP at 6 rows of divergence, so cost per candidate is
    O(len * d), not O(len^2). Within-band work is quadratic in band
    population; at 100 TB you compound the blocking key (length band x
    simhash band — q_llm_simhash_bands) to cap it, the same
    ground-truth-next-to-banded-path posture as q_llm_neardup_jaccard
    vs q_llm_minhash_lsh.

    Two more scale disciplines, both measured at sf0.1: (1) the
    candidate join runs NARROW — ids, lengths and eight per-doc
    letter counts only; full texts are re-attached to the filtered
    survivors by two BROADCAST joins against the (doc_id, text) map
    (the text payload never rides the candidate shuffle — carrying
    it measured 5.3 s vs 1.7 s for this form). (2) An
    exactness-preserving count prune before the DP: a unit edit moves
    at most two character counts by one each, so Σ_c |cnt_a(c) −
    cnt_b(c)| <= 2d for any true pair — eight length-minus-replace
    counts (codegen) make that an 8-term scalar filter per
    candidate."""
    _CHARS = "etaonisr"
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.length("text").alias("L"),
        (F.length("text") / 6).cast("long").alias("band"),
        *[
            (
                F.length("text")
                - F.length(F.replace("text", F.lit(c)))
            ).alias(f"h_{c}")
            for c in _CHARS
        ],
    )
    a = d.select(
        F.col("doc_id").alias("ia"),
        F.col("L").alias("la"),
        "band",
        *[F.col(f"h_{c}").alias(f"ha_{c}") for c in _CHARS],
    )
    b = d.select(
        F.col("doc_id").alias("ib"),
        F.col("L").alias("lb"),
        F.col("band").alias("bband"),
        *[F.col(f"h_{c}").alias(f"hb_{c}") for c in _CHARS],
    )
    same = a.join(b, (a.band == b.bband) & (a.ia < b.ib))
    adj = a.join(b, a.band + 1 == b.bband)
    l1 = sum(
        F.abs(F.col(f"ha_{c}") - F.col(f"hb_{c}")) for c in _CHARS
    )
    texts = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    )
    cand = (
        same.unionByName(adj)
        .where((F.abs(F.col("la") - F.col("lb")) <= 5) & (l1 <= 10))
        .select("ia", "ib")
        .join(
            F.broadcast(
                texts.select(
                    F.col("doc_id").alias("ia"),
                    F.col("text").alias("ta"),
                )
            ),
            "ia",
        )
        .join(
            F.broadcast(
                texts.select(
                    F.col("doc_id").alias("ib"),
                    F.col("text").alias("tb"),
                )
            ),
            "ib",
        )
    )
    dist = F.levenshtein("ta", "tb", 5)
    return (
        cand.select(
            F.least("ia", "ib").alias("doc_a"),
            F.greatest("ia", "ib").alias("doc_b"),
            dist.alias("dist"),
        )
        .where((F.col("dist") >= 0) & (F.col("dist") <= 5))
        .select("doc_a", "doc_b", F.col("dist").cast("long").alias("dist"))
    )


@query(
    "q_llm_dedup_incremental",
    oracle="""
    WITH t AS (
      SELECT CAST(FLOOR(0.6 * (MAX(doc_id) + 1)) AS BIGINT) AS cut
      FROM documents
    ),
    corpus AS (
      SELECT DISTINCT text FROM documents, t WHERE doc_id < cut
    ),
    batch AS (
      SELECT doc_id, source, text FROM documents, t WHERE doc_id >= cut
    ),
    flagged AS (
      SELECT b.doc_id, b.source, b.text,
             EXISTS (SELECT 1 FROM corpus c WHERE c.text = b.text)
               AS in_index
      FROM batch b
    ),
    fresh AS (
      SELECT source, text,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id)
               AS rn
      FROM flagged WHERE NOT in_index
    )
    SELECT source,
           CAST(COALESCE(SUM(CASE WHEN rn = 1 THEN 1 END), 0) AS BIGINT)
             AS admitted,
           CAST(COALESCE(SUM(CASE WHEN rn > 1 THEN 1 END), 0) AS BIGINT)
             AS dup_within,
           CAST((SELECT COUNT(*) FROM flagged f
                 WHERE f.in_index AND f.source = fresh.source) AS BIGINT)
             AS dup_vs_index
    FROM fresh
    GROUP BY source
    """,
    category="2.J",
)
def q_llm_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL exact dedup — the production posture
    q_llm_exact_dedup's whole-corpus pass cannot afford at 100 TB: a
    standing content-hash INDEX (here: the distinct sha256 digests of
    the first 60% of the corpus, WRITTEN TO PARQUET and read back —
    the index is a durable artifact that outlives the job, not a
    runtime frame) and a new ingest batch deduplicated in two stages
    against it: (1) LEFT ANTI join on the digest drops every batch
    copy of an already-indexed text (dup_vs_index — only 32-byte
    digests ride the shuffle, never documents), (2) the survivors
    dedup within-batch by min-doc_id survivorship (dup_within). The
    per-source admission report is the ingest dashboard. The oracle
    recomputes both stages by TEXT equality — the digest is an
    implementation detail, so a hash-semantics bug (truncation,
    casing, encoding) breaks the match. At 100 TB the index grows by
    exactly the admitted digests per ingest (append, no rewrite), the
    anti join is digest-keyed and AQE-broadcastable when the batch is
    small, and nothing ever re-reads the historical corpus."""
    d = load_table(spark, sf_dir, "documents")
    cut = (
        d.agg(
            F.floor(0.6 * (F.max("doc_id") + 1)).cast("long").alias("c")
        ).collect()[0]["c"]
    )
    idx_dir = None
    try:
        import tempfile

        idx_dir = tempfile.mkdtemp(prefix="alsp_dedup_idx_")
        (
            d.where(F.col("doc_id") < cut)
            .select(F.sha2("text", 256).alias("h"))
            .distinct()
            .write.mode("overwrite")
            .parquet(idx_dir)
        )
        index = spark.read.parquet(idx_dir)
        batch = d.where(F.col("doc_id") >= cut).select(
            "doc_id", "source", F.sha2("text", 256).alias("h")
        )
        vs_index = (
            batch.join(index, "h", "left_semi")
            .groupBy("source")
            .agg(F.count("*").alias("dup_vs_index"))
        )
        fresh = batch.join(index, "h", "left_anti")
        w = Window.partitionBy("h").orderBy("doc_id")
        ranked = fresh.withColumn("rn", F.row_number().over(w))
        within = ranked.groupBy("source").agg(
            F.sum(F.when(F.col("rn") == 1, 1)).cast("long").alias(
                "admitted"
            ),
            F.coalesce(
                F.sum(F.when(F.col("rn") > 1, 1)), F.lit(0)
            ).cast("long").alias("dup_within"),
        )
        report = within.join(
            F.broadcast(vs_index), "source", "left"
        ).select(
            "source",
            "admitted",
            "dup_within",
            F.coalesce("dup_vs_index", F.lit(0)).cast("long").alias(
                "dup_vs_index"
            ),
        )
        return tracked_local_checkpoint(report)
    finally:
        if idx_dir:
            import shutil as _sh

            _sh.rmtree(idx_dir, ignore_errors=True)


_BSH_M = 4096  # bloom bits
_BSH_K = 3  # hash count
_BSH_P = 1000003  # affine-hash prime
_BSH_MOD = 2147483647  # fingerprint fold modulus (2^31-1)
_BSH_SEEDS = ((1103515245, 12345), (69069, 362437), (214013, 2531011))


@query(
    "q_llm_dedup_bloom_shard",
    oracle=f"""
    WITH d AS (
        SELECT doc_id,
               array_to_string(list_sort(list_distinct(
                   string_split(text, ' '))), ' ') AS canon
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, canon,
               list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                       list_transform(string_split(canon, ' '),
                           x -> CAST(ascii(x) * 31 + length(x)
                                     AS BIGINT))),
                   (acc, h) -> (acc * 131 + h) % {_BSH_MOD}) AS key
        FROM d
    ),
    a AS (SELECT * FROM keyed WHERE doc_id % 2 = 0),
    b AS (SELECT * FROM keyed WHERE doc_id % 2 = 1),
    seeds AS (
        SELECT * FROM (VALUES {", ".join(f"({i}, {sa}, {sb})" for i, (sa, sb) in enumerate(_BSH_SEEDS))})
            s(s, sa, sb)
    ),
    bits AS (
        SELECT DISTINCT (sa * key + sb) % {_BSH_P} % {_BSH_M} AS bit
        FROM a CROSS JOIN seeds
    ),
    probe AS (
        SELECT b.doc_id, b.canon,
               (sa * b.key + sb) % {_BSH_P} % {_BSH_M} AS bit
        FROM b CROSS JOIN seeds
    ),
    cand AS (
        SELECT p.doc_id, MIN(p.canon) AS canon
        FROM probe p JOIN bits USING (bit)
        GROUP BY p.doc_id HAVING COUNT(*) = {_BSH_K}
    ),
    verified AS (
        SELECT c.doc_id FROM cand c
        WHERE EXISTS (SELECT 1 FROM a WHERE a.canon = c.canon)
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand)
               AS n_bloom_candidates,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM verified) AS n_true_dups
    """,
    category="2.J",
)
def q_llm_dedup_bloom_shard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLOOM-PREFILTERED CROSS-SHARD DEDUP — the pipeline COMPOSITION
    the sketch rung (q_sketch_bloom: bloom as relational algebra) and
    the exact-dedup ladder each show half of: an incoming shard (odd
    doc_ids) dedups against a reference shard (even) on the CANONICAL
    BAG-OF-WORDS key, and the expensive equality join runs only on
    bloom POSITIVES. Because a Bloom filter has no false negatives,
    prefilter + exact-verify returns exactly the true duplicate set —
    the result is EXACT while the shuffle carries candidates, not the
    shard (the 100 TB shape: ship a few KB of filter bits to every
    executor, drop the overwhelming non-dup majority at the map side,
    equality-join the survivors; the reported n_bloom_candidates −
    n_true_dups overhang is the false-positive cost a pipeline
    monitors to know when m/n needs re-sizing). Keys are the house
    engine-portable rolling hash (ascii-fold mod 2^31−1, the
    fingerprint kernel) over the sorted-distinct token string, so
    key collisions cannot corrupt the result either — verification
    compares the canonical STRING. All integer algebra; exact on
    both engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            " ", F.array_sort(F.array_distinct(F.split("text", " ")))
        ).alias("canon"),
    )
    hs = F.transform(
        F.split("canon", " "),
        lambda x: (F.ascii(x) * 31 + F.length(x)).cast("long"),
    )
    # the keyed frame feeds FIVE consumers (A bits, B probe, candidate
    # verify, and both counters) — pin it once or the scan + canon sort
    # + fold HOF re-run per consumer (measured 13.6 s -> the fix)
    keyed = tracked_local_checkpoint(
        d.select(
            "doc_id",
            "canon",
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda acc, h: (acc * 131 + h) % _BSH_MOD,
            ).alias("key"),
        )
    )
    a = keyed.where(F.col("doc_id") % 2 == 0)
    b = keyed.where(F.col("doc_id") % 2 == 1)
    seeds = spark.createDataFrame(
        [(i, sa, sb) for i, (sa, sb) in enumerate(_BSH_SEEDS)],
        "s int, sa long, sb long",
    )
    bit = (F.col("sa") * F.col("key") + F.col("sb")) % _BSH_P % _BSH_M
    bits = (
        a.crossJoin(F.broadcast(seeds))
        .select(bit.alias("bit"))
        .distinct()
    )
    probe = b.crossJoin(F.broadcast(seeds)).select(
        "doc_id", "canon", bit.alias("bit")
    )
    cand = (
        probe.join(F.broadcast(bits), "bit")
        .groupBy("doc_id")
        .agg(
            F.min("canon").alias("canon"),
            F.count("*").alias("nbits"),
        )
        .where(F.col("nbits") == _BSH_K)
    )
    verified = cand.join(
        a.select("canon"), "canon", "left_semi"
    ).agg(F.count("*").cast("long").alias("n_true_dups"))
    n_b = b.agg(F.count("*").cast("long").alias("n_b"))
    n_cand = cand.agg(
        F.count("*").cast("long").alias("n_bloom_candidates")
    )
    return n_b.crossJoin(F.broadcast(n_cand)).crossJoin(
        F.broadcast(verified)
    )


@query(
    "q_llm_dup_span_merge",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(text, ' ') AS t FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    sh AS (
      SELECT doc_id, i - 1 AS p,
             array_to_string(list_slice(t, i, i + 7), ' ') AS sh
      FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 6)) AS i)
    ),
    dup AS (
      SELECT sh FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc_id) >= 2
    ),
    hits AS (
      SELECT s.doc_id, s.p FROM sh s WHERE s.sh IN (SELECT sh FROM dup)
    ),
    g AS (
      SELECT doc_id, p,
             CASE WHEN MAX(p + 7) OVER w IS NULL
                    OR p > MAX(p + 7) OVER w + 1
                  THEN 1 ELSE 0 END AS is_new
      FROM hits
      WINDOW w AS (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    ),
    isl AS (
      SELECT doc_id, p,
             SUM(is_new) OVER (PARTITION BY doc_id ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      FROM g
    ),
    spans AS (
      SELECT doc_id, island, MIN(p) AS s, MAX(p) + 7 AS e
      FROM isl GROUP BY doc_id, island
    )
    SELECT sp.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dup_spans,
           CAST(SUM(sp.e - sp.s + 1) AS BIGINT) AS dup_tokens,
           CAST(MAX(len(tk.t)) AS BIGINT) AS n_tokens,
           floor(SUM(sp.e - sp.s + 1) * 1000000.0 / MAX(len(tk.t)))
               / 1000000.0 AS dup_pct
    FROM spans sp JOIN toks tk ON sp.doc_id = tk.doc_id
    GROUP BY sp.doc_id
    """,
    category="2.J",
)
def q_llm_dup_span_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT-SUBSTRING duplicate-span report (the Lee et al. 2022 /
    RefinedWeb dedup step): every SLIDING 8-token shingle that appears
    in >= 2 documents marks its token interval [p, p+7] as duplicated
    text, and overlapping-or-adjacent duplicated intervals MERGE into
    maximal spans per doc (gaps-and-islands over token offsets: a new
    span starts iff p clears the running max interval end + 1 — the
    same running-max islands form as the dynamic-gap session rung,
    applied to token space). Per doc: span count, duplicated-token
    total, and the exact duplication ratio — the numbers that decide
    whether to CUT spans or DROP docs. This is sub-shingle-resolution
    the fixed-chunk rung (q_llm_line_dedup) cannot see: two docs
    sharing a 40-token paragraph at different offsets never align on
    disjoint 10-token chunk boundaries, but all 33 of their sliding
    8-grams collide, merging into one 40-token span on each side.
    Scale: shingle frequency is one hash shuffle keyed on the shingle
    (at 100 TB: on its 64-bit rolling hash — 8-byte rows, collisions
    re-verified by one string recheck, the q_llm_ngram_novelty
    discipline); the islands window is per-doc (partitioned, bounded
    by doc length); span merge is a per-doc hash agg. No global
    window, no all-pairs anything."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t")).where(
        F.size("t") >= 8
    )
    sh = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                "transform(sequence(0, size(t) - 8), "
                "i -> array_join(slice(t, i + 1, 8), ' '))"
            )
        ).alias("p", "sh"),
    )
    dup = (
        sh.groupBy("sh")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .where(F.col("nd") >= 2)
        .select("sh")
    )
    hits = sh.join(dup, "sh", "left_semi").select("doc_id", "p")
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc_id")
        .orderBy("p")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prev_end = F.max(F.col("p") + 7).over(w_prev)
    isl = hits.withColumn(
        "island",
        F.sum(
            (prev_end.isNull() | (F.col("p") > prev_end + 1)).cast("int")
        ).over(w_run),
    )
    spans = isl.groupBy("doc_id", "island").agg(
        F.min("p").alias("s"), (F.max("p") + 7).alias("e")
    )
    span_len = F.col("e") - F.col("s") + 1
    per_doc = spans.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_dup_spans"),
        F.sum(span_len).cast("long").alias("dup_tokens"),
    )
    sizes = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    return per_doc.join(sizes, "doc_id").select(
        "doc_id",
        "n_dup_spans",
        "dup_tokens",
        "n_tokens",
        (
            F.floor(
                F.col("dup_tokens") * 1000000.0 / F.col("n_tokens")
            )
            / 1000000.0
        ).alias("dup_pct"),
    )


_CONTAIN_MAX_VOCAB = 63  # single-BIGINT bitmask verification bound


@query(
    "q_llm_neardup_containment",
    oracle="""
    WITH s AS (
      SELECT doc_id, list_sort(list_distinct(string_split(text, ' '))) AS st
      FROM documents
    ),
    cls AS (
      SELECT st, CAST(COUNT(*) AS BIGINT) AS cnt FROM s GROUP BY st
    ),
    sup AS (
      SELECT a.st AS st, CAST(COALESCE(SUM(b.cnt), 0) AS BIGINT) AS n_sup
      FROM cls a LEFT JOIN cls b
        ON a.st <> b.st AND list_has_all(b.st, a.st)
      GROUP BY a.st
    )
    SELECT s.doc_id,
           CAST(len(s.st) AS BIGINT) AS u,
           CAST(sup.n_sup + cls.cnt - 1 AS BIGINT) AS n_containing
    FROM s JOIN cls ON s.st = cls.st JOIN sup ON s.st = sup.st
    ORDER BY s.doc_id
    """,
    category="2.J",
)
def q_llm_neardup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup — per doc, how many OTHER docs' token sets
    CONTAIN this doc's set (A ⊆ B). Jaccard misses exactly this case: a
    short doc wholly embedded in a longer one scores J = |A|/|B| → 0 as
    B grows, yet A contributes zero new tokens to the corpus — the
    boilerplate-fragment / quote-extraction duplication every web-corpus
    cleaning pass must see. Output: (doc_id, u, n_containing) where
    n_containing counts strict-superset docs plus identical-set docs.

    Plan — the PPJoin prefix filter turned up to containment: candidate
    generation CANNOT be the m² class cross-join (3,935 contracted
    classes at sf0.1 → 15.5M pairs, growing quadratically). Instead,
    every superset of A must contain A's RAREST token (rarest by class
    document-frequency, ties by dictionary index), so each class joins
    only the classes that carry its rarest token — fanout is Σ df(rarest)
    and rare tokens have small df BY CONSTRUCTION of the argmin. Each
    candidate is then verified in one codegen'd instruction: token sets
    are encoded as single-BIGINT bitmasks over the sorted vocabulary
    dictionary (gated at <= 63 tokens; this corpus' vocabulary is 31 —
    FIXTURES.md; beyond 63 the verify becomes the array-subset form and
    the right corpus-scale move is MinHash banding first), and A ⊆ B
    iff mask_a & mask_b = mask_a. Docs ride the pipeline only as
    (doc_id, set-key): counting happens at the CONTRACTED class grain
    and expands back by one equi-join — the SoftDeDup discipline.

    The DuckDB oracle keeps the m² list_has_all formulation (fine at
    oracle scale, sf<=0.01 → 446 classes); results are identical because
    the prefix filter is lossless: a superset that lacked the rarest
    token of A would lack an element of A.
    """
    d = load_table(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id",
        F.sort_array(F.array_distinct(F.split("text", " "))).alias("s"),
    )
    # read thrice (classes, dict, final expand) — pin the interpreted split
    docs = docs.cache()
    track_cache(docs.unpersist)
    classes = tracked_local_checkpoint(
        docs.groupBy("s").agg(F.count("*").cast("long").alias("cnt"))
    )
    # deterministic dense token ids over the sorted vocabulary (the
    # jaccard_spectrum tdict pattern: vocabulary-bounded global window)
    toks = classes.select(F.explode("s").alias("tok")).distinct()
    w_tok = Window.orderBy("tok")
    tdict = tracked_local_checkpoint(toks.select(
        "tok", (F.row_number().over(w_tok) - 1).alias("idx")
    ))
    n_vocab = tdict.count()  # bounded scalar (vocabulary-sized)
    if n_vocab > _CONTAIN_MAX_VOCAB:
        raise ValueError(
            f"q_llm_neardup_containment: vocabulary {n_vocab} exceeds the "
            f"single-mask bound {_CONTAIN_MAX_VOCAB} — switch the verify "
            "to array containment / MinHash-band the corpus first"
        )
    ct = classes.select("s", F.explode("s").alias("tok")).join(
        F.broadcast(tdict), "tok"
    )
    masks = ct.groupBy("s").agg(
        F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), idx)")).alias("mask")
    )
    # class-level document frequency per token -> rarest token per class
    tokdf = ct.groupBy("idx").agg(F.count("*").alias("df"))
    ct_df = ct.join(F.broadcast(tokdf), "idx")
    rare = ct_df.groupBy("s").agg(
        F.min_by("idx", F.struct("df", "idx")).alias("ridx")
    )
    cl = (
        classes.join(masks, "s").join(rare, "s")
        .select("s", "mask", "cnt", "ridx")
    )
    cl = tracked_local_checkpoint(cl)
    # candidates: every class B that carries A's rarest token
    bside = ct.join(
        masks.withColumnRenamed("mask", "mask_b"), "s"
    ).join(
        classes.select(
            "s", F.col("cnt").alias("cnt_b")
        ), "s"
    ).select("idx", "mask_b", "cnt_b")
    verified = (
        cl.join(bside, cl.ridx == bside.idx)
        .where(F.col("mask_b") != F.col("mask"))
        .where(
            F.col("mask").bitwiseAND(F.col("mask_b")) == F.col("mask")
        )
    )
    nsup = verified.groupBy("mask").agg(
        F.sum("cnt_b").cast("long").alias("n_sup")
    )
    return (
        docs.join(cl.select("s", "mask", "cnt"), "s")
        .join(nsup, "mask", "left")
        .select(
            "doc_id",
            F.size("s").cast("long").alias("u"),
            (
                F.coalesce("n_sup", F.lit(0)) + F.col("cnt") - 1
            ).cast("long").alias("n_containing"),
        )
        .orderBy("doc_id")
    )
