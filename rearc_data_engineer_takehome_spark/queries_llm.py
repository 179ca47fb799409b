"""Extension-tier parity queries: text analysis, dedup, similarity
search, event windows, multimodal plumbing.

Registered into the same REGISTRY as the core relational queries. The
deterministic operators (token stats, quality scores, language ID,
fingerprints, exact/Jaccard/MinHash-signature dedup, blocked cosine,
brute-force kNN, tumbling/sliding/session windows, JSON extraction) all
carry full DuckDB oracles — including the MinHash signatures, which are
md5-derived and therefore bit-identical across engines. Only the
LSH-bucketed variants (probabilistic recall) and the mapInPandas
multimodal path (not SQL-expressible) are rows-only; pytest gates their
recall/shape instead (tests/test_llm_ops.py).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from .functions.hashing import MERSENNE_31, _affine_params, stable_hash64_sql
from .functions.text import BPE_PATTERN, PUNCT_PATTERN, WS_PATTERN, word_shingles_sql
from .operators import dedup, multimodal, similarity
from .operators import text as text_ops
from .queries import _t, query
from .streaming import windows as win

# DuckDB expression fragments — single-sourced from functions/text.py so
# the Spark expression and its oracle can never drift apart.
_TOKS = f"regexp_split_to_array(trim(text), '{WS_PATTERN}')"
_SHINGLES3 = word_shingles_sql("t", 3)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "doc_token_stats",
    f"""
    WITH feat AS (
        SELECT lang,
               len({_TOKS}) AS ws,
               len(regexp_extract_all(text, '{BPE_PATTERN}'))  AS bpe,
               n_chars
        FROM documents
    )
    SELECT lang,
           count(*)                 AS n_docs,
           sum(ws)::BIGINT          AS total_tokens_ws,
           sum(bpe)::BIGINT         AS total_tokens_bpe,
           round(avg(ws), 4)        AS avg_tokens_ws,
           round(avg(n_chars), 4)   AS avg_chars
    FROM feat GROUP BY lang
    """,
    doc="Token counting (whitespace + BPE-ish regex) aggregated per "
    "language — single projection + one hash agg; regex dialect restricted "
    "to the Java∩RE2 intersection so both engines tokenize identically.",
)
def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            "lang",
            "n_chars",
            text_ops.token_count_ws(F.col("text")).alias("ws"),
            text_ops.token_count_bpe(F.col("text")).alias("bpe"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").cast("bigint").alias("total_tokens_ws"),
            F.sum("bpe").cast("bigint").alias("total_tokens_bpe"),
            F.round(F.avg("ws"), 4).alias("avg_tokens_ws"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_EN_STOP_SQL = "['the','and','of','to','in','is','it','that','for','was']"


@query(
    "doc_quality_scores",
    f"""
    WITH f AS (
        SELECT doc_id,
               length(text) AS n_char,
               len({_TOKS}) AS n_tok,
               len(list_filter(list_transform({_TOKS}, x -> lower(x)),
                               x -> list_contains({_EN_STOP_SQL}, x))) AS stop_hits,
               len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS n_punct,
               len(regexp_extract_all(text, '[0-9]'))           AS n_digit
        FROM documents
    )
    SELECT doc_id, n_char,
           n_tok AS n_tokens_ws,
           round(n_punct / greatest(n_char, 1), 6)  AS punct_ratio,
           round(stop_hits / greatest(n_tok, 1), 6) AS stopword_ratio,
           round(least(greatest(
               0.4 * least(n_tok / 64.0, 1.0)
             + 0.3 * (1.0 - round(n_punct / greatest(n_char, 1), 6))
             + 0.2 * least(round(stop_hits / greatest(n_tok, 1), 6) * 5.0, 1.0)
             + 0.1 * (1.0 - round(n_digit / greatest(n_char, 1), 6)), 0.0), 1.0), 6)
               AS quality_score
    FROM f
    """,
    doc="Gopher/C4-style quality heuristics (length, punctuation ratio, "
    "stopword ratio, digit ratio) blended into a clamped [0,1] score — one "
    "codegen'd projection per document, no shuffle.",
)
def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    feat = text_ops.quality_features(docs)
    return feat.select(
        "doc_id",
        "n_char",
        F.col("n_tokens_ws").cast("bigint").alias("n_tokens_ws"),
        "punct_ratio",
        "stopword_ratio",
        "quality_score",
    )


def _lang_scores_sql() -> str:
    toks_lower = f"list_transform({_TOKS}, x -> lower(x))"
    parts = []
    for lang, words in text_ops.STOPWORDS.items():
        lex = "[" + ",".join(f"'{w}'" for w in words) + "]"
        parts.append(
            f"len(list_filter({toks_lower}, x -> list_contains({lex}, x)))"
            f" / greatest(len({_TOKS}), 1) AS s_{lang}"
        )
    return ", ".join(parts)


@query(
    "doc_language_id",
    f"""
    WITH s AS (SELECT doc_id, {_lang_scores_sql()} FROM documents),
    m AS (SELECT doc_id, s_en, s_es, s_fr, s_de, s_zh,
                 greatest(s_en, s_es, s_fr, s_de, s_zh) AS best FROM s)
    SELECT doc_id,
           round(best, 6) AS lang_score,
           CASE WHEN best = 0 THEN 'und'
                WHEN s_en = best THEN 'en'
                WHEN s_es = best THEN 'es'
                WHEN s_fr = best THEN 'fr'
                WHEN s_de = best THEN 'de'
                ELSE 'zh' END AS lang_pred
    FROM m
    """,
    doc="Heuristic language ID: argmax of per-language stopword-hit ratios "
    "with deterministic tie-break by lexicon order; 'und' when all zero.",
)
def doc_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.language_id(docs).select("doc_id", "lang_score", "lang_pred")


@query(
    "doc_fingerprints",
    f"""
    WITH toks AS (SELECT doc_id, text, {_TOKS} AS t FROM documents)
    SELECT doc_id,
           md5(text) AS content_md5,
           list_min(list_transform({word_shingles_sql("t", 5)},
                    s -> {stable_hash64_sql("s")})) AS min_shingle_hash
    FROM toks
    """,
    doc="Document fingerprinting: exact content digest + rolling-hash "
    "structural fingerprint (min 5-word-shingle hash, winnowing-lite). "
    "Both md5-derived → bit-identical across engines.",
)
def doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return text_ops.fingerprint(docs, k=5).select(
        "doc_id", "content_md5", "min_shingle_hash"
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_docs",
    """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    doc="Exact dedup via content-digest groupBy — shuffles 40-byte digests, "
    "never raw documents (the feasibility difference at 100 TB). Canonical "
    "representative = min id.",
)
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.exact_dedup(_t(spark, sf_dir, "documents"))


@query(
    "dedup_ngram_jaccard",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, unnest({_SHINGLES3}) AS s FROM toks),
    p AS (SELECT DISTINCT doc_id, {stable_hash64_sql("s")} AS h FROM sh),
    sizes AS (SELECT doc_id, count(*) AS n FROM p GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
        FROM p a JOIN p b ON a.h = b.h AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(c / (na.n + nb.n - c), 6) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = common.id_a
    JOIN sizes nb ON nb.doc_id = common.id_b
    WHERE round(c / (na.n + nb.n - c), 6) >= 0.8
    """,
    doc="EXACT n-gram (3-word shingle) Jaccard near-dup pairs via "
    "inverted-index self-join — the ground truth the LSH variant is "
    "recall-tested against. The fixtures contain planted near-dups "
    "(J≈0.98), so the result is non-trivial.",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.8
    )


def _minhash_sig_sql(n_perm: int, seed: int = 7) -> str:
    base = f"{stable_hash64_sql('s')} % {MERSENNE_31}"
    mins = []
    for j, (a, b) in enumerate(_affine_params(n_perm, seed)):
        mins.append(
            f"list_min(list_transform(sh, s -> ({a} * ({base}) + {b}) % {MERSENNE_31})) AS m{j}"
        )
    return ", ".join(mins)


_N_PERM = 8


@query(
    "minhash_signatures",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    sh AS (SELECT doc_id, {_SHINGLES3} AS sh FROM toks),
    sig AS (SELECT doc_id, {_minhash_sig_sql(_N_PERM)} FROM sh)
    SELECT doc_id, u.perm::INT AS perm, u.minhash
    FROM sig, LATERAL (
        SELECT unnest(generate_series(0, {_N_PERM - 1})) AS perm,
               unnest([{", ".join(f"m{j}" for j in range(_N_PERM))}]) AS minhash
    ) u
    """,
    doc="MinHash signatures (md5-based affine permutations mod Mersenne-31) "
    "exploded to (doc_id, perm, minhash) — the deterministic core of "
    "MinHash-LSH, verified bit-identical against DuckDB. Computed as one "
    "array projection: transform + array_min, no explode/shuffle.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = dedup.minhash_signatures(
        _t(spark, sf_dir, "documents"), n_perm=_N_PERM, seed=7
    )
    # PERF: never posexplode the computed array directly — Catalyst inlines
    # the whole signature lambda-expression into Generate, which then
    # evaluates it interpreted per OUTPUT row (45 s vs 2 s at sf0.1).
    # Referencing the alias 8× in a getItem projection makes CollapseProject
    # keep it as a real node (non-cheap expr, multiple refs), so the explode
    # only touches plain column refs.
    wide = sig.select(
        "doc_id",
        *[F.col("signature").getItem(i).alias(f"m{i}") for i in range(_N_PERM)],
    )
    return wide.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("perm"),
                        F.col(f"m{i}").alias("minhash"),
                    )
                    for i in range(_N_PERM)
                ]
            )
        ).alias("pm"),
    ).select("doc_id", "pm.perm", "pm.minhash")


@query(
    "dedup_minhash_lsh",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
    shl AS (SELECT doc_id, {_SHINGLES3} AS sh FROM toks),
    sig AS (SELECT doc_id, {_minhash_sig_sql(8)} FROM shl),
    bands AS (
        SELECT doc_id, u.band, u.bh FROM sig, LATERAL (
            SELECT unnest([0, 1, 2, 3]) AS band,
                   unnest([md5(m0::VARCHAR || ',' || m1::VARCHAR),
                           md5(m2::VARCHAR || ',' || m3::VARCHAR),
                           md5(m4::VARCHAR || ',' || m5::VARCHAR),
                           md5(m6::VARCHAR || ',' || m7::VARCHAR)]) AS bh
        ) u
    ),
    cand AS (
        SELECT DISTINCT x.doc_id AS id_a, y.doc_id AS id_b
        FROM bands x JOIN bands y
          ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
    ),
    p AS (SELECT DISTINCT doc_id, {stable_hash64_sql("s")} AS h
          FROM (SELECT doc_id, unnest(sh) AS s FROM shl)),
    sizes AS (SELECT doc_id, count(*) AS n FROM p GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, count(*) AS cmn
        FROM cand c
        JOIN p a ON a.doc_id = c.id_a
        JOIN p b ON b.doc_id = c.id_b AND b.h = a.h
        GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, round(cmn / (na.n + nb.n - cmn), 6) AS jaccard
    FROM common
    JOIN sizes na ON na.doc_id = common.id_a
    JOIN sizes nb ON nb.doc_id = common.id_b
    WHERE round(cmn / (na.n + nb.n - cmn), 6) >= 0.8
    """,
    doc="MinHash+LSH near-dup pairs (8 perms, 4 bands), exact-Jaccard "
    "verified candidates. Despite being 'approximate', the whole "
    "pipeline is DETERMINISTIC (md5-derived signatures, md5 band "
    "hashes, exact verification) so the oracle replays banding + "
    "verification in SQL and value-hashes must match; "
    "tests/test_llm_ops.py additionally gates recall ≥ 0.95 against "
    "the exact operator at J≥0.8.",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), n_perm=_N_PERM, bands=4, threshold=0.8
    )


_SIMHASH_BITS = 16


def _simhash_sql(bits: int) -> str:
    h = f"({stable_hash64_sql('tk')})"
    terms = []
    for j in range(bits):
        vote = (
            f"list_sum(list_transform(t, tk -> "
            f"CASE WHEN ({h} >> {j}) & 1 = 1 THEN 1 ELSE -1 END))"
        )
        terms.append(f"(CASE WHEN {vote} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


@query(
    "dedup_simhash",
    f"""
    WITH toks AS (SELECT doc_id, {_TOKS} AS t FROM documents)
    SELECT doc_id, ({_simhash_sql(_SIMHASH_BITS)})::BIGINT AS simhash
    FROM toks
    """,
    doc="SimHash fingerprints (16-bit, per-bit majority vote over token "
    "hashes) — packed bigint, bit-identical across engines. Near-dup pairs "
    "via byte-band buckets + Hamming verify are tested in pytest "
    "(pigeonhole guarantee: hamming ≤ bands-1 ⇒ shared band).",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.simhash_fingerprints(
        _t(spark, sf_dir, "documents"), bits=_SIMHASH_BITS
    )


from .functions.vectors import cosine_sql

_COS_SQL = cosine_sql("a.embedding", "b.embedding")


@query(
    "dedup_embedding_cosine",
    f"""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round({_COS_SQL}, 6) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round({_COS_SQL}, 6) >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs BLOCKED by label: one shuffle "
    "on the block key, per-block BLAS cosine matrix + 6dp-rounded "
    "threshold inside applyInPandas (the O(block²) candidates never "
    "become Spark rows). Threshold 0.4 chosen to be non-trivial on the "
    "fixture distribution (max within-label cosine ≈ 0.47). The "
    "pure-JVM twin (dedup.embedding_near_dup_pairs) is "
    "equivalence-tested against this one.",
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup.embedding_near_dup_pairs_vectorized(
        _t(spark, sf_dir, "embeddings"), block_col="label", threshold=0.4
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


def _query_vec(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        _t(spark, sf_dir, "embeddings").where(F.col("vec_id") == vec_id).head()
    )
    return [float(x) for x in row["embedding"]]


@query(
    "knn_bruteforce",
    f"""
    WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    scored AS (
        SELECT e.vec_id,
               round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
                     (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> 0
    )
    SELECT vec_id, cos_sim FROM scored
    ORDER BY cos_sim DESC, vec_id ASC LIMIT 10
    """,
    doc="Exact cosine top-10 against a query vector (vec_id 0): scan + "
    "zip_with/aggregate dot product + TakeOrderedAndProject. The "
    "correctness baseline every ANN variant is recall-tested against.",
)
def knn_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    return similarity.bruteforce_topk(emb, q, k=10)


@query(
    "knn_all_pairs_topk",
    f"""
    WITH scored AS (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round({_COS_SQL}, 6) AS cos_sim,
               row_number() OVER (PARTITION BY a.vec_id
                                  ORDER BY round({_COS_SQL}, 6) DESC, b.vec_id ASC) AS rn
        FROM embeddings a
        JOIN embeddings b ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT id_a, id_b, cos_sim FROM scored WHERE rn <= 3
    """,
    doc="k-NN for EVERY vector (k=3), blocked by label: one shuffle on "
    "the block key, then each block computes its cosine matrix with one "
    "BLAS matmul and keeps top-k in-block (applyInPandas) — the O(block²) "
    "pair rows never reach a Spark shuffle or window. Swap the block key "
    "for an LSH/IVF bucket at 100 TB. The pure-JVM twin "
    "(similarity.all_pairs_topk) is equivalence-tested against this one.",
)
def knn_all_pairs_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return similarity.all_pairs_topk_vectorized(
        _t(spark, sf_dir, "embeddings"), k=3, block_col="label"
    )


@query(
    "knn_lsh",
    None,  # probabilistic bucket recall → rows-only; pytest gates recall
    doc="Sign-random-projection LSH top-k (6 bits × 3 tables, multi-probe "
    "radius 2): near-boundary sign flips are recovered by probing adjacent "
    "buckets instead of adding tables. pytest asserts recall ≥ 0.6 vs "
    "brute force on the fixture (tests/test_llm_ops.py); tuned to 1.0 "
    "there — random-ish fixture vectors are LSH's worst case.",
)
def knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    indexed = similarity.lsh_index(emb, dim=len(q), bits=6, n_tables=3)
    return similarity.lsh_topk(indexed, q, k=10, bits=6, n_tables=3, probe_radius=2)


@query(
    "knn_ivf",
    None,  # centroid pruning drops true neighbours by design → rows-only
    doc="IVF-flat search: label column as the coarse quantizer cell, "
    "centroids from elementwise aggregation, probe the best 2 cells only. "
    "pytest asserts the probed-cell results equal brute force restricted "
    "to those cells.",
)
def knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    q = _query_vec(spark, sf_dir, 0)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    cents = similarity.ivf_centroids(emb, cell_col="label")
    return similarity.ivf_topk(emb, q, cents, k=10, n_probe=2, cell_col="label")


# ---------------------------------------------------------------------------
# Event-time windows + JSON props
# ---------------------------------------------------------------------------


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load the events fixture, whose parquet timestamps are NANOS —
    Spark rejects those outright (PARQUET_TYPE_ILLEGAL), so they are read
    as raw int64 via the nanosAsLong conf (runtime-settable, works in the
    driver's default session too) and converted to a proper event-time
    timestamp with timestamp_micros. All downstream window bounds are
    emitted as absolute epoch seconds — tz-independent in both engines."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _t(spark, sf_dir, "events")
    # integer division (div), NOT / 1000: Divide casts int64 nanos to
    # double whose ULP at ~1.7e18 is 256 ns, so a value within 128 ns of
    # a boundary could round into the wrong microsecond/bucket while the
    # DuckDB oracle keeps exact nanos.
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


@query(
    "events_hourly",
    """
    SELECT floor(epoch(time_bucket(INTERVAL 1 HOUR, ts)))::BIGINT AS window_start,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1-hour event-time windows per type (batch F.window). "
    "In Structured Streaming the same transformation runs with a watermark "
    "(streaming/windows.py, tested against this batch result).",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return win.tumbling_agg(_events(spark, sf_dir), "ts", "1 hour", keys=["event_type"])


@query(
    "events_sliding",
    """
    WITH grid AS (
        SELECT floor(epoch(time_bucket(INTERVAL 1 HOUR, ts)))::BIGINT AS window_start,
               value FROM events
        UNION ALL
        SELECT floor(epoch(time_bucket(INTERVAL 1 HOUR, ts, INTERVAL 30 MINUTE)))::BIGINT
               AS window_start,
               value FROM events
    )
    SELECT window_start, count(*) AS n_events, round(sum(value), 2) AS sum_value
    FROM grid GROUP BY 1
    """,
    doc="Sliding windows (1 h window, 30 min slide): every event lands in "
    "two windows. Oracle reconstructs the overlap as a union of two offset "
    "tumbling grids — semantics identical to Spark's window(ts, 1h, 30m).",
)
def events_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return win.sliding_agg(_events(spark, sf_dir), "ts", "1 hour", "30 minutes")


@query(
    "events_sessionize",
    """
    WITH g AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR floor(epoch(ts)) - floor(epoch(lag(ts) OVER w)) > 1800
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), s AS (
        SELECT user_id, ts, value,
               sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
        FROM g
    )
    SELECT user_id, session_seq, count(*) AS n_events,
           floor(epoch(min(ts)))::BIGINT AS session_start,
           floor(epoch(max(ts)))::BIGINT AS session_end,
           round(sum(value), 2) AS sum_value
    FROM s GROUP BY user_id, session_seq
    """,
    doc="Gap-based sessionization (30 min) via lag + running sum — the "
    "batch twin of Structured Streaming session windows; custom stateful "
    "logic expressed relationally so it stays oracle-verifiable. Gaps are "
    "measured on second-truncated epochs (identical semantics in both "
    "engines, unlike timestampdiff/date_diff).",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return win.sessionize(_events(spark, sf_dir), "ts", "user_id", 30)


@query(
    "events_props_typed",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INT) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INT) > 80
    """,
    doc="Typed semi-structured parse: from_json with a DECLARED schema "
    "(struct<k:int>) instead of per-path string extraction — one parse "
    "per row regardless of field count, the scale-correct shape when "
    "many fields are read.",
)
def events_props_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    parsed = ev.select(
        "event_id", F.from_json("props", "k INT").alias("p")
    ).select("event_id", F.col("p.k").alias("k"))
    return parsed.where(F.col("k") > 80)


@query(
    "events_hypertable_rollup",
    """
    WITH hourly AS (
        SELECT (floor(epoch(ts) / 3600) * 3600)::BIGINT AS bucket_start,
               count(*) AS n_events, sum(value) AS sum_value
        FROM events GROUP BY 1
    )
    SELECT 'hour' AS granularity, bucket_start, n_events,
           round(sum_value, 2) AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day', (floor(bucket_start / 86400) * 86400)::BIGINT,
           sum(n_events), round(sum(sum_value), 2)
    FROM hourly GROUP BY 2
    UNION ALL
    SELECT 'week', (floor(bucket_start / 604800) * 604800)::BIGINT,
           sum(n_events), round(sum(sum_value), 2)
    FROM hourly GROUP BY 2
    """,
    doc="Hypertable-style multi-granularity rollup (continuous-aggregate "
    "pattern): hour buckets aggregate the raw events ONCE; day and week "
    "buckets re-aggregate FROM the hourly rollup — coarse granularities "
    "never rescan raw data (one fact pass instead of three at 100 TB). "
    "Buckets are floor-epoch aligned in both engines (time_bucket's week "
    "origin differs between engines, so it is avoided).",
)
def events_hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return win.hypertable_rollup(_events(spark, sf_dir), "ts")


@query(
    "events_range_join_errors_signups",
    """
    SELECT e.event_id, s.event_id AS event_id_right,
           e.user_id,
           (floor(epoch(e.ts)) - floor(epoch(s.ts)))::BIGINT AS gap_s
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'error') e
    JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id
     AND abs(floor(epoch(e.ts)) - floor(epoch(s.ts))) <= 3600
    """,
    doc="Range/interval join (Spark has no primitive): error events "
    "paired with same-user signups within ±1 h. Time-bucket blocking "
    "turns the range predicate into an equi-join on (key, bucket) with "
    "±1-bucket probes — bounded per-task pairs even under key skew, "
    "never a per-key cartesian. Gap computed on second-truncated epochs "
    "for exact cross-engine agreement.",
)
def events_range_join_errors_signups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import range_join

    ev = _events(spark, sf_dir)
    base = ev.select(
        "event_id", "user_id", F.col("ts").cast("long").alias("tsec"), "event_type"
    )
    errors = base.where(F.col("event_type") == "error").drop("event_type")
    signups = base.where(F.col("event_type") == "signup").drop("event_type")
    out = range_join(
        errors, signups, on="user_id", left_ts="tsec", right_ts="tsec",
        max_gap=3600,
    )
    return out.select(
        "event_id",
        "event_id_right",
        "user_id",
        (F.col("tsec") - F.col("tsec_right")).alias("gap_s"),
    )


@query(
    "events_json_props",
    """
    SELECT event_type,
           count(*) AS n,
           sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS sum_k,
           round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS avg_k
    FROM events GROUP BY event_type
    """,
    doc="Semi-structured JSON property extraction (get_json_object) + "
    "aggregation — the schema-on-read path for event payloads.",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    k = F.get_json_object("props", "$.k").cast("bigint")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(k).alias("sum_k"),
        F.round(F.avg(k), 4).alias("avg_k"),
    )


@query(
    "corpus_split_sizes",
    f"""
    WITH b AS (
        SELECT lang,
               {stable_hash64_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 10000 AS bucket
        FROM documents
    )
    SELECT lang,
           sum(CASE WHEN bucket < 8000 THEN 1 ELSE 0 END) AS n_train,
           sum(CASE WHEN bucket >= 8000 AND bucket < 9000 THEN 1 ELSE 0 END) AS n_val,
           sum(CASE WHEN bucket >= 9000 THEN 1 ELSE 0 END) AS n_test
    FROM b GROUP BY lang
    """,
    doc="Content-deterministic train/val/test split (operators/sampling."
    "hash_split): bucket = md5('split:'||key) mod 10000 → 80/10/10 "
    "ranges. Pure function of the key, so assignment survives "
    "re-ingestion, repartitioning, and engine changes (no leakage) — "
    "and is therefore fully oracle-verifiable, unlike Bernoulli sampling.",
)
def corpus_split_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import hash_split

    docs = _t(spark, sf_dir, "documents")
    train, val, test = hash_split(docs, "doc_id", [0.8, 0.1, 0.1])
    parts = [
        train.select("lang").withColumn("part", F.lit("n_train")),
        val.select("lang").withColumn("part", F.lit("n_val")),
        test.select("lang").withColumn("part", F.lit("n_test")),
    ]
    unioned = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        unioned.groupBy("lang")
        .pivot("part", ["n_train", "n_val", "n_test"])
        .agg(F.count(F.lit(1)))
        .select(
            "lang",
            *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
              for c in ("n_train", "n_val", "n_test")],
        )
    )


@query(
    "dedup_clusters",
    None,  # iterative label propagation — not single-query SQL; pytest gates
    doc="Near-dup clustering: exact-Jaccard pairs (J≥0.8) → connected "
    "components via iterative min-label propagation (O(diameter) join "
    "rounds) → (doc_id, cluster_id). The canonical-doc selection step of "
    "a production dedup pipeline; union-find equivalence tested in "
    "tests/test_llm_ops.py.",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dedup.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), k=3, threshold=0.8
    )
    return dedup.cluster_pairs(pairs)


@query(
    "curation_pipeline",
    f"""
    WITH q AS (
        SELECT doc_id, lang,
               len({_TOKS}) AS n_tok,
               len(regexp_extract_all(text, '{PUNCT_PATTERN}')) AS n_punct,
               length(text) AS n_char,
               md5(text) AS digest
        FROM documents
    ), scored AS (
        SELECT doc_id, lang, digest,
               0.5 * least(n_tok / 64.0, 1.0)
             + 0.5 * (1.0 - round(n_punct / greatest(n_char, 1), 6)) AS score
        FROM q
    ), kept AS (
        SELECT min(doc_id) AS doc_id, min_by(lang, doc_id) AS lang,
               max(score) AS score
        FROM scored
        WHERE score >= 0.6
        GROUP BY digest
    )
    SELECT lang, count(*) AS n_docs, round(avg(score), 6) AS avg_score
    FROM kept GROUP BY lang
    """,
    doc="Composed curation pipeline — the end-to-end shape of a training-"
    "data filter: quality-score → threshold filter → exact dedup "
    "(canonical min-id per digest) → per-language yield stats. One plan; "
    "Catalyst fuses the scoring projection into the scan and the dedup "
    "shuffles digests only.",
)
def curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), WS_PATTERN)
    n_tok = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(F.col("text"), F.lit(PUNCT_PATTERN), 0))
    score = 0.5 * F.least(n_tok / 64.0, F.lit(1.0)) + 0.5 * (
        1.0 - F.round(n_punct / F.greatest(F.length("text"), F.lit(1)), 6)
    )
    scored = docs.select(
        "doc_id", "lang", F.md5("text").alias("digest"), score.alias("score")
    ).where(F.col("score") >= 0.6)
    kept = scored.groupBy("digest").agg(
        F.min("doc_id").alias("doc_id"),
        # min_by, not any_value: the lang feeds the final GROUP BY key,
        # so a nondeterministic pick could diverge between engines when
        # identical texts carry different lang labels
        F.min_by("lang", "doc_id").alias("lang"),
        F.max("score").alias("score"),
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("score"), 6).alias("avg_score"),
    )


# ---------------------------------------------------------------------------
# As-of join (events: each error matched to the user's latest prior signup)
# ---------------------------------------------------------------------------


@query(
    "events_asof_last_signup",
    """
    SELECT e.event_id, e.user_id, s.event_id AS signup_event_id
    FROM (SELECT event_id, user_id, epoch_ns(ts) AS tns
          FROM events WHERE event_type = 'error') e
    ASOF LEFT JOIN (SELECT event_id, user_id, epoch_ns(ts) AS tns
                    FROM events WHERE event_type = 'signup') s
      ON e.user_id = s.user_id AND e.tns >= s.tns
    """,
    doc="As-of join (Spark lacks the primitive): for each error event, "
    "the user's most recent signup at or before it. Implemented as "
    "union-and-carry — tag both sides, one shuffle on the key, sort "
    "within partitions, last(ignorenulls) over an unbounded-preceding "
    "window. Same cost as one sort-merge join; never a range cross-join. "
    "Verified against DuckDB's native ASOF LEFT JOIN on raw nanosecond "
    "timestamps (no truncation on either side).",
)
def events_asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.joins import asof_join

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = _t(spark, sf_dir, "events")  # ts stays raw int64 nanos: exact
    errors = raw.where(F.col("event_type") == "error").select(
        "event_id", "user_id", F.col("ts").alias("tns")
    )
    signups = raw.where(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_event_id"), "user_id", F.col("ts").alias("tns")
    )
    out = asof_join(
        errors, signups, on="user_id", left_ts="tns", right_ts="tns", suffix=""
    )
    return out.select("event_id", "user_id", "signup_event_id")


# ---------------------------------------------------------------------------
# Remaining DQ/profiling parity (V7-V9, A9-A10) + set operations
# ---------------------------------------------------------------------------


@query(
    "cardinality_sketch",
    None,  # HLL++/GK sketches differ engine-to-engine → rows-only
    doc="Approximate profiling — the 100 TB variants of A4/A10: "
    "approx_count_distinct (HyperLogLog++, one pass, no distinct "
    "shuffle) and percentile_approx (Greenwald-Khanna sketch). Sketch "
    "internals differ across engines so this is rows-only; the EXACT "
    "twins (cardinality_profile, iqr_outliers_price) are oracle-gated.",
)
def cardinality_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.02).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.percentile_approx("l_extendedprice", 0.5, 1000).alias("approx_median_price"),
        F.percentile_approx("l_extendedprice", 0.99, 1000).alias("approx_p99_price"),
    )


@query(
    "iqr_outliers_price",
    """
    WITH b AS (
        SELECT quantile_cont(l_extendedprice, 0.25) AS q1,
               quantile_cont(l_extendedprice, 0.75) AS q3
        FROM lineitem
    )
    SELECT l.l_orderkey, l.l_linenumber,
           round(l.l_extendedprice, 2) AS price
    FROM lineitem l, b
    WHERE l.l_extendedprice < b.q1 - 1.5 * (b.q3 - b.q1)
       OR l.l_extendedprice > b.q3 + 1.5 * (b.q3 - b.q1)
    """,
    doc="V9/A10: IQR outlier detection with quantiles computed IN-PLAN "
    "(exact percentile, verified bit-identical to DuckDB quantile_cont) "
    "and broadcast back — one job, no driver round-trip, unlike the "
    "reference's collected approxQuantile (21_EDA.ipynb:2309-2319). "
    "operators/quality.iqr_outliers is the percentile_approx variant for "
    "100 TB (single-pass sketch).",
)
def iqr_outliers_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.relational import spread_compute

    li = _t(spark, sf_dir, "lineitem")
    # exact percentile merges per-partition count maps, so spreading the
    # AGG input parallelizes the partial phase (merge is order-invariant).
    # Only the bounds branch is repartitioned — the outlier filter branch
    # parallelizes by file splits and must not pay a full-table shuffle.
    bounds = spread_compute(li).agg(
        F.expr("percentile(l_extendedprice, array(0.25, 0.75))").alias("q13"),
    ).select(
        F.col("q13").getItem(0).alias("q1"),
        F.col("q13").getItem(1).alias("q3"),
    ).select(
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lower"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("upper"),
    )
    return (
        li.join(F.broadcast(bounds))
        .where(
            (F.col("l_extendedprice") < F.col("lower"))
            | (F.col("l_extendedprice") > F.col("upper"))
        )
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_extendedprice", 2).alias("price"),
        )
    )


@query(
    "events_user_completeness",
    """
    SELECT user_id,
           count(DISTINCT floor(epoch(ts) / 86400)::BIGINT) AS n_active_days,
           count(DISTINCT floor(epoch(ts) / 86400)::BIGINT) >= 30 AS is_complete
    FROM events GROUP BY user_id
    """,
    doc="V8 completeness: per-user distinct active epoch-days vs the "
    "expected 30-day span (the reference checks quarters-per-series-year "
    "vs 4, 21_EDA.ipynb:1875-1890). Epoch-day arithmetic keeps it "
    "tz-independent.",
)
def events_user_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    epoch_day = F.floor(F.col("ts").cast("long") / 86400)
    return ev.groupBy("user_id").agg(
        F.countDistinct(epoch_day).alias("n_active_days"),
        (F.countDistinct(epoch_day) >= 30).alias("is_complete"),
    )


@query(
    "orders_priority_union",
    """
    WITH tagged AS (
        SELECT 'urgent' AS tier, o_totalprice FROM orders
        WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        UNION ALL
        SELECT 'normal' AS tier, o_totalprice FROM orders
        WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
    )
    SELECT tier, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM tagged GROUP BY tier
    """,
    doc="Set operation (unionByName) composing two filtered branches — "
    "absent from the reference (SURVEY §2.7) but required for pipeline "
    "composition; Catalyst pushes each branch's filter to its own scan.",
)
def orders_priority_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _t(spark, sf_dir, "orders")
    urgent = orders.where(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.lit("urgent").alias("tier"), "o_totalprice")
    normal = orders.where(
        ~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    ).select(F.lit("normal").alias("tier"), "o_totalprice")
    return (
        urgent.unionByName(normal)
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@query(
    "describe_lineitem",
    """
    SELECT count(l_quantity)                  AS qty_count,
           round(avg(l_quantity), 4)          AS qty_mean,
           round(stddev(l_quantity), 4)       AS qty_stddev,
           round(min(l_quantity), 2)          AS qty_min,
           round(max(l_quantity), 2)          AS qty_max,
           round(avg(l_extendedprice), 4)     AS price_mean,
           round(stddev(l_extendedprice), 4)  AS price_stddev,
           round(median(l_extendedprice), 4)  AS price_median
    FROM lineitem
    """,
    doc="A9: describe()-style descriptive statistics as explicit "
    "aggregates (count/mean/stddev/min/max/median) — the reference's "
    "df.describe() profiling (21_EDA.ipynb:2121-2124) with deterministic "
    "aliases and an exact median both engines agree on.",
)
def describe_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("l_quantity").alias("qty_count"),
        F.round(F.avg("l_quantity"), 4).alias("qty_mean"),
        F.round(F.stddev("l_quantity"), 4).alias("qty_stddev"),
        F.round(F.min("l_quantity"), 2).alias("qty_min"),
        F.round(F.max("l_quantity"), 2).alias("qty_max"),
        F.round(F.avg("l_extendedprice"), 4).alias("price_mean"),
        F.round(F.stddev("l_extendedprice"), 4).alias("price_stddev"),
        F.round(F.expr("median(l_extendedprice)"), 4).alias("price_median"),
    )


@query(
    "events_value_domain",
    """
    SELECT event_type,
           sum(CASE WHEN value < 0 THEN 1 ELSE 0 END) AS n_negative,
           sum(CASE WHEN value = 0 THEN 1 ELSE 0 END) AS n_zero,
           round(min(value), 2) AS min_value,
           round(max(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
    doc="V7 domain/sign checks per event type (the reference's "
    "negative-value and sign-constraint profiling, 21_EDA.ipynb:1376).",
)
def events_value_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.sum((F.col("value") < 0).cast("int")).alias("n_negative"),
        F.sum((F.col("value") == 0).cast("int")).alias("n_zero"),
        F.round(F.min("value"), 2).alias("min_value"),
        F.round(F.max("value"), 2).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (mapInPandas — rows-only)
# ---------------------------------------------------------------------------


@query(
    "multimodal_inventory",
    """
    SELECT (['image', 'audio', 'video'])[(doc_id % 3 + 1)::INT] AS modality,
           count(*) AS n_assets,
           sum(strlen(text))::BIGINT AS total_bytes,
           count(DISTINCT lang) AS n_langs
    FROM documents
    GROUP BY 1
    """,
    doc="Multimodal asset inventory: the deterministic (non-UDF) half of "
    "the multimodal path — binary payload synthesis, typed metadata, "
    "per-modality accounting — oracle-gated; the mapInPandas decode half "
    "is multimodal_features (rows-only). Spark element_at and DuckDB list "
    "indexing are both 1-based, so the modality cycles align verbatim.",
)
def multimodal_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthesize_assets(spark, docs)
    meta = assets.join(
        docs.select("doc_id", "lang"),
        assets.asset_id == F.col("doc_id"),
    )
    return meta.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.countDistinct("lang").alias("n_langs"),
    )


@query(
    "doc_metadata_consistency",
    """
    SELECT count(*) AS n_rows,
           sum(CASE WHEN n_chars <> length(text) THEN 1 ELSE 0 END) AS n_chars_mismatch,
           sum(CASE WHEN doc_id IS NULL OR text IS NULL THEN 1 ELSE 0 END) AS n_null_critical,
           count(DISTINCT doc_id) AS n_distinct_ids
    FROM documents
    """,
    doc="Cross-field DQ validation (V-battery extension): stored metadata "
    "(n_chars) must agree with the recomputed value; critical fields "
    "non-null; id uniqueness — one aggregation pass.",
)
def doc_metadata_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("n_chars") != F.length("text")).cast("int")).alias(
            "n_chars_mismatch"
        ),
        F.sum(
            (F.col("doc_id").isNull() | F.col("text").isNull()).cast("int")
        ).alias("n_null_critical"),
        F.countDistinct("doc_id").alias("n_distinct_ids"),
    )


@query(
    "multimodal_features",
    None,  # mapInPandas decode path — not SQL-expressible; pytest checks shape
    doc="Binary-column multimodal pipeline: documents → synthetic assets "
    "(binary payload + typed metadata) → Arrow-batched mapInPandas feature "
    "extraction with per-asset error isolation → per-modality stats. The "
    "decode step is a deterministic stub (no media libs in container); the "
    "Spark plumbing (schema, batching, one-to-many expansion) is real.",
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    assets = multimodal.synthesize_assets(spark, docs)
    feats = multimodal.extract_features(assets, decoder="fake")
    return feats.groupBy("modality").agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum("n_bytes").alias("total_bytes"),
        F.round(F.avg("feature_mean"), 6).alias("avg_feature"),
        F.sum((F.col("decode_error").isNotNull()).cast("int")).alias("n_errors"),
    )


@query(
    "doc_chunks",
    """
    WITH exploded AS (
        SELECT doc_id,
               unnest(list_transform(
                   range(0, greatest(CAST(floor((length(text) - 1) / 96.0)
                                          AS BIGINT), 0) + 1),
                   i -> struct_pack(
                       chunk_id := i,
                       chunk_text := substring(text, CAST(i * 96 + 1 AS INT), 128)
                   ))) AS ch
        FROM documents
    )
    SELECT doc_id, CAST(ch.chunk_id AS INT) AS chunk_id,
           ch.chunk_text AS chunk_text,
           length(ch.chunk_text) AS chunk_len
    FROM exploded
    """,
    doc="Fixed-window document chunking (text_ops.chunk_fixed): 128-char "
    "windows every 96 chars (overlapping) — the pre-tokenization shape for "
    "LLM training/embedding pipelines. sequence→transform→posexplode, all "
    "codegen, no shuffle; oracle is a correlated generate_series.",
)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = text_ops.chunk_fixed(docs, "text", size=128, stride=96)
    return out.select(
        "doc_id", "chunk_id", "chunk_text", F.length("chunk_text").alias("chunk_len")
    )


@query(
    "doc_pii_redaction",
    """
    WITH enriched AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or 10.0.'
                    || doc_id % 256 || '.7 tel 555-867-5309' AS raw
        FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
             '(?:\\+?\\d{1,3}[-. ])?(?:\\(\\d{3}\\)|\\b\\d{3})[-. ]\\d{3}[-. ]\\d{4}\\b',
             '<PHONE>', 'g') AS redacted,
           length(raw) AS raw_len
    FROM enriched
    """,
    doc="PII redaction (text_ops.redact_pii): email/IPv4/phone scrubbing via "
    "chained regexp_replace in the Java∩RE2 dialect intersection. The query "
    "plants synthetic PII (the corpus has none) so the patterns provably "
    "fire; oracle applies the identical patterns with DuckDB's 'g' flag.",
)
def doc_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 tel 555-867-5309"),
    )
    return docs.select(
        "doc_id",
        text_ops.redact_pii(raw).alias("redacted"),
        F.length(raw).alias("raw_len"),
    )


@query(
    "events_gapfill_daily",
    """
    WITH daily AS (
        SELECT event_type,
               floor(epoch(time_bucket(INTERVAL 1 DAY, ts)))::BIGINT AS day_start,
               round(avg(value), 4) AS val
        FROM events WHERE value > 220
        GROUP BY 1, 2
    ), bounds AS (
        SELECT min(day_start) AS lo, max(day_start) AS hi FROM daily
    ), grid AS (
        SELECT k.event_type,
               unnest(generate_series(b.lo, b.hi, 86400)) AS day_start
        FROM (SELECT DISTINCT event_type FROM daily) k, bounds b
    ), dense AS (
        SELECT g.event_type, g.day_start, d.val
        FROM grid g LEFT JOIN daily d
          ON g.event_type = d.event_type AND g.day_start = d.day_start
    )
    SELECT event_type, day_start,
           last_value(val IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day_start
                     ROWS UNBOUNDED PRECEDING) AS val_filled,
           (val IS NULL) AS is_gap
    FROM dense
    """,
    doc="Time-series gap filling + forward fill (win.gapfill_daily — "
    "TimescaleDB time_bucket_gapfill/locf analog): sparse daily series "
    "densified onto the full epoch-aligned day grid, last observation "
    "carried forward, filled rows flagged. Filter value>220 creates real "
    "gaps (12-23 of 30 days present per type at sf0.01). Day buckets are "
    "epoch-second longs — tz-independent in both engines.",
)
def events_gapfill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("value") > 220)
    return win.gapfill_daily(ev, "event_type", "ts", "value")


@query(
    "doc_bm25_topk",
    f"""
    WITH toks AS (
        SELECT doc_id, len({_TOKS}) AS dl,
               unnest(list_transform({_TOKS}, x -> lower(x))) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM toks WHERE term IN ('spark', 'join', 'merge')
        GROUP BY doc_id, dl, term
    ), corpus AS (
        SELECT count(*) AS n, sum(len({_TOKS})) AS sumdl FROM documents
    ), dft AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), scored AS (
        SELECT t.doc_id,
               round(sum(
                   round(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 8)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / (c.sumdl / c.n)))
               ), 4) AS bm25,
               count(*) AS n_terms_hit
        FROM tf t JOIN dft d USING (term), corpus c
        GROUP BY t.doc_id
    )
    SELECT doc_id, bm25, n_terms_hit,
           CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS INT) AS rank
    FROM scored
    ORDER BY bm25 DESC, doc_id ASC
    LIMIT 20
    """,
    doc="BM25 keyword-search top-k (operators/search.bm25_topk): the "
    "lexical half of hybrid retrieval next to the kNN tier. Token stream "
    "filtered to query terms BEFORE the tf shuffle; |query|-row df "
    "aggregate broadcast back; N/avgdl are 2 driver scalars (integer-exact "
    "sums, so bit-identical); idf rounded 8dp to neutralize libm ln() "
    "differences; top-k via TakeOrderedAndProject.",
)
def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.search import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, ["spark", "join", "merge"], k=20)


@query(
    "sample_weighted_docs",
    """
    WITH keyed AS (
        SELECT doc_id, n_chars,
               round(ln(((('0x' || substr(md5('wsample:' || doc_id::VARCHAR),
                                          1, 15))::BIGINT)::DOUBLE + 0.5)
                         / 1152921504606846976.0) / n_chars, 8) AS wkey
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, n_chars, wkey
    FROM keyed ORDER BY wkey DESC, doc_id ASC LIMIT 50
    """,
    doc="Weighted sampling without replacement (sampling.weighted_sample, "
    "Efraimidis-Spirakis A-ES): rank by ln(u)/w with u from the portable "
    "md5 hash — P(selected) ∝ n_chars, one distributed pass, reproducible "
    "across engines (key rounded 8dp + id tie-break to absorb libm "
    "differences). Top-m via TakeOrderedAndProject, no global sort.",
)
def sample_weighted_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, "n_chars", m=50, key_col="doc_id")


@query(
    "hybrid_retrieval_rrf",
    f"""
    WITH toks AS (
        SELECT doc_id, len({_TOKS}) AS dl,
               unnest(list_transform({_TOKS}, x -> lower(x))) AS term
        FROM documents
    ), tf AS (
        SELECT doc_id, dl, term, count(*) AS tf
        FROM toks WHERE term IN ('spark', 'join', 'merge')
        GROUP BY doc_id, dl, term
    ), corpus AS (
        SELECT count(*) AS n, sum(len({_TOKS})) AS sumdl FROM documents
    ), dft AS (
        SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
    ), bm25 AS (
        SELECT t.doc_id,
               round(sum(
                   round(ln((c.n - d.df + 0.5) / (d.df + 0.5) + 1.0), 8)
                   * (t.tf * 2.2)
                   / (t.tf + 1.2 * (1 - 0.75 + 0.75 * t.dl / (c.sumdl / c.n)))
               ), 4) AS s
        FROM tf t JOIN dft d USING (term), corpus c
        GROUP BY t.doc_id
    ), lex AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
        FROM bm25 ORDER BY s DESC, doc_id ASC LIMIT 50
    ), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    cos AS (
        SELECT e.vec_id AS doc_id,
               round(list_dot_product(e.embedding::DOUBLE[], q.qv::DOUBLE[]) /
                     (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
                      sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6) AS s
        FROM embeddings e, q WHERE e.vec_id <> 0
    ), vec AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id ASC) AS rank
        FROM cos ORDER BY s DESC, doc_id ASC LIMIT 50
    ), fused AS (
        SELECT coalesce(l.doc_id, v.doc_id) AS doc_id,
               round(coalesce(1.0 / (60 + l.rank), 0)
                     + coalesce(1.0 / (60 + v.rank), 0), 9) AS rrf_score,
               ((l.rank IS NOT NULL)::INT + (v.rank IS NOT NULL)::INT) AS n_rankers
        FROM lex l FULL OUTER JOIN vec v USING (doc_id)
    )
    SELECT doc_id, rrf_score, n_rankers
    FROM fused ORDER BY rrf_score DESC, doc_id ASC LIMIT 20
    """,
    doc="Hybrid retrieval: BM25 lexical top-50 + exact-cosine vector "
    "top-50 (query vec_id 0) fused by reciprocal rank fusion "
    "(search.rrf_fuse, score = Σ 1/(60+rank)) — the standard score-free "
    "combiner for incomparable scales. Candidate generation does the "
    "distributed work; fusion joins two 50-row lists.",
)
def hybrid_retrieval_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.search import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    lex = bm25_topk(docs, ["spark", "join", "merge"], k=50).select("doc_id", "rank")

    q = _query_vec(spark, sf_dir, 0)
    emb = _t(spark, sf_dir, "embeddings").where(F.col("vec_id") != 0)
    cos = similarity.bruteforce_topk(emb, q, k=50)
    vw = Window.orderBy(F.col("cos_sim").desc(), F.col("vec_id").asc())
    vec = cos.withColumn("rank", F.row_number().over(vw)).select(
        F.col("vec_id").alias("doc_id"), "rank"
    )
    return rrf_fuse([lex, vec], id_col="doc_id", k=60, top=20)


@query(
    "events_gapfill_interpolated",
    """
    WITH daily AS (
        SELECT event_type,
               floor(epoch(time_bucket(INTERVAL 1 DAY, ts)))::BIGINT AS day_start,
               round(avg(value), 4) AS val
        FROM events WHERE value > 220
        GROUP BY 1, 2
    ), bounds AS (
        SELECT min(day_start) AS lo, max(day_start) AS hi FROM daily
    ), grid AS (
        SELECT k.event_type,
               unnest(generate_series(b.lo, b.hi, 86400)) AS day_start
        FROM (SELECT DISTINCT event_type FROM daily) k, bounds b
    ), dense AS (
        SELECT g.event_type, g.day_start, d.val
        FROM grid g LEFT JOIN daily d
          ON g.event_type = d.event_type AND g.day_start = d.day_start
    ), w AS (
        SELECT event_type, day_start, val,
               last_value(val IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day_start
                    ROWS UNBOUNDED PRECEDING) AS pv,
               first_value(val IGNORE NULLS) OVER
                   (PARTITION BY event_type ORDER BY day_start
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
               last_value(CASE WHEN val IS NOT NULL THEN day_start END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day_start
                         ROWS UNBOUNDED PRECEDING) AS pt,
               first_value(CASE WHEN val IS NOT NULL THEN day_start END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY day_start
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM dense
    )
    SELECT event_type, day_start,
           round(coalesce(val,
               CASE WHEN pv IS NOT NULL AND nv IS NOT NULL AND nt != pt
                    THEN pv + (nv - pv) * (day_start - pt) / (nt - pt)
                    ELSE coalesce(pv, nv) END), 4) AS val_interp,
           (val IS NULL) AS is_gap
    FROM w
    """,
    doc="Gap filling by linear interpolation between nearest observed "
    "neighbours (win.gapfill_daily_interpolate) — the smooth counterpart "
    "to events_gapfill_daily's step-function locf; edge gaps extend the "
    "single available neighbour. Same epoch-long day grid.",
)
def events_gapfill_interpolated(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir).where(F.col("value") > 220)
    return win.gapfill_daily_interpolate(ev, "event_type", "ts", "value")


@query(
    "events_rolling_7d",
    """
    WITH daily AS (
        SELECT event_type,
               floor(epoch(time_bucket(INTERVAL 1 DAY, ts)))::BIGINT AS day_start,
               count(*) AS n,
               round(sum(value), 2) AS day_value
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, day_start,
           sum(n) OVER w AS n_7d,
           round(sum(day_value) OVER w, 2) AS sum_7d,
           round(avg(day_value) OVER w, 4) AS avg_7d
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day_start
                 RANGE BETWEEN 518400 PRECEDING AND CURRENT ROW)
    """,
    doc="Rolling 7-day aggregates per type over the daily series using a "
    "RANGE frame on epoch-long day buckets (6×86400 preceding + current "
    "day) — frames follow TIME distance, not row count, so missing days "
    "shrink the window honestly. Daily pre-aggregation first: the window "
    "runs over days×types rows, never the fact table. Inner sums rounded "
    "2dp so both engines window identical inputs.",
)
def events_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        _events(spark, sf_dir)
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("day_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("day_start"), "event_type", "n",
            "day_value",
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_start")
        .rangeBetween(-6 * 86400, 0)
    )
    return daily.select(
        "event_type",
        "day_start",
        F.sum("n").over(w).alias("n_7d"),
        F.round(F.sum("day_value").over(w), 2).alias("sum_7d"),
        F.round(F.avg("day_value").over(w), 4).alias("avg_7d"),
    )


@query(
    "events_funnel",
    """
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    )
    SELECT 'signup' AS step, 1 AS step_n, (SELECT count(*) FROM s1) AS n_users
    UNION ALL
    SELECT 'signup>click', 2, (SELECT count(*) FROM s2)
    UNION ALL
    SELECT 'signup>click>purchase', 3, (SELECT count(*) FROM s3)
    """,
    doc="Ordered funnel analysis: users completing signup → click → "
    "purchase with strictly increasing event times. Each stage is a "
    "conditional min-aggregate joined to the previous stage's completion "
    "times — stage tables shrink monotonically, so every join after the "
    "first runs on survivors only. Raw nanos compare exactly; no "
    "timestamp arithmetic.",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    # each stage table feeds BOTH the next stage's join and its own
    # count; materialized once per stage or stage N re-runs stages 1..N
    # (the funnel re-read the events scan 6x instead of 3x)
    s1 = (
        ev.where(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .localCheckpoint()
    )
    s2 = (
        ev.where(F.col("event_type") == "click")
        .join(s1, "user_id")
        .where(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .localCheckpoint()
    )
    s3 = (
        ev.where(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .where(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )

    def stage_count(df: DataFrame, step: str, step_n: int) -> DataFrame:
        return df.agg(
            F.lit(step).alias("step"),
            F.lit(step_n).alias("step_n"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        stage_count(s1, "signup", 1)
        .unionByName(stage_count(s2, "signup>click", 2))
        .unionByName(stage_count(s3, "signup>click>purchase", 3))
    )


@query(
    "events_zscore_anomalies",
    """
    WITH stats AS (
        SELECT event_type,
               round(avg(value), 6) AS mu,
               round(stddev_samp(value), 6) AS sigma
        FROM events GROUP BY event_type
    )
    SELECT e.event_type,
           count(*) AS n_anomalies,
           round(min(e.value), 2) AS min_anomalous_value,
           round(max(e.value), 2) AS max_anomalous_value
    FROM events e JOIN stats s ON e.event_type = s.event_type
    WHERE abs((e.value - s.mu) / s.sigma) > 3
    GROUP BY e.event_type
    """,
    doc="Z-score anomaly detection per group: per-type mean/stddev "
    "computed in-plan (rounded 6dp so both engines threshold identical "
    "z values) and broadcast back; |z|>3 rows summarized per type. The "
    "two-pass shape (tiny stats aggregate + full scan filter) is the "
    "standard distributed anomaly sweep — no per-row window needed.",
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = _t(spark, sf_dir, "events").select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 6).alias("mu"),
        F.round(F.stddev_samp("value"), 6).alias("sigma"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .where(F.abs(z) > 3)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_anomalies"),
            F.round(F.min("value"), 2).alias("min_anomalous_value"),
            F.round(F.max("value"), 2).alias("max_anomalous_value"),
        )
    )
