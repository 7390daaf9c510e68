"""Text-analysis queries over the `documents` table, oracle-checked.

Binds operators/text.py to the driver's synthetic corpus. Every
expression here is engine-portable: whitespace tokenization via
regexp_extract_all, md5 fingerprints, integer/double arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import (
    dround,
    oracle_dround,
    oracle_hash32,
    stage_filter,
)
from multichannel_commerce_data_pipeline_spark.operators import text as T
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import (
    load,
    parallelize_small_scan,
    parquet_memo,
    session_memo,
)

_STOP_IN = ", ".join(f"'{w}'" for w in T.STOPWORDS)


# Doc-term frequency index — the corpus's term-statistics artifact
# (what an inverted index's postings carry), persisted per corpus
# version and hash-partitioned on token (the storage-investment rule,
# same as the shingle/LSH/basket indexes). Consumers:
#   - tfidf_top_terms reads it twice (document frequency + the scored
#     join); without the persisted index the tokenize→explode→TF
#     subtree executes once per consumer (no DataFrame-level CSE) and
#     the token join re-shuffles the (doc, token) frame;
#   - bm25_search derives its per-doc length + per-term tf row from it
#     (sum of tf replaces re-tokenizing the corpus).
# Build order matters for skew: the TF aggregate runs FIRST on its
# natural (doc_id, token) key — partial aggregation collapses each
# mapper's copies of a hot token ("the") before any shuffle — and only
# the aggregated tf rows are re-laid-out on token for serving. A
# pre-aggregation repartition on token would funnel every occurrence
# of a hot token through one reducer. The serving layout makes the
# df-aggregate and the token join exchange-free.
_TF_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}


def _doc_term_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        from pyspark import StorageLevel

        d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        tok = d.select(
            "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
        )
        n_parts = spark.sparkContext.defaultParallelism
        tf = (
            tok.groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .repartition(n_parts, "token")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        tf.count()
        return tf

    return session_memo(spark, _TF_INDEX_CACHE, sf_dir, build)


@query(
    "text_token_stats",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    )
    SELECT
      doc_id,
      len(toks) AS n_tokens,
      ROUND(CASE WHEN len(toks) > 0
            THEN list_aggregate(list_transform(toks, t -> length(t)), 'sum') / len(toks)
            ELSE 0.0 END, 4) AS avg_token_len,
      ROUND(CASE WHEN len(toks) > 0
            THEN len(list_filter(toks, t -> t IN ({_STOP_IN}))) / len(toks)
            ELSE 0.0 END, 4) AS stopword_ratio,
      ROUND(CASE WHEN length(text) > 0
            THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text)
            ELSE 0.0 END, 4) AS alpha_ratio
    FROM tok
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: token counting + quality features (length, stopword ratio,
    alpha ratio) — the per-document statistics a C4/Gopher-style quality
    filter consumes. Pure Column expressions, no UDFs."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    # tokenize ONCE in a staged projection — the three token stats
    # reference the token list six times between them, and an inlined
    # tokenizer re-runs per reference (r16 optimization round, guide
    # §4.2)
    toked = d.select(
        "doc_id", "text", T.tokens(F.col("text")).alias("__toks")
    )
    toks = F.col("__toks")
    return toked.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.round(T.avg_token_len(toks), 4).alias("avg_token_len"),
        F.round(T.stopword_ratio(toks), 4).alias("stopword_ratio"),
        F.round(T.alpha_ratio(F.col("text")), 4).alias("alpha_ratio"),
    )


@query(
    "text_quality_filter",
    oracle=rf"""
    WITH feats AS (
      SELECT
        doc_id, lang, source,
        regexp_extract_all(lower(text), '\S+') AS toks,
        text
      FROM documents
    ), scored AS (
      SELECT
        doc_id, lang, source,
        ROUND(
          (CASE WHEN len(toks) BETWEEN 5 AND 1000 THEN 0.4 ELSE 0.0 END)
          + (CASE WHEN len(toks) > 0
               AND len(list_filter(toks, t -> t IN ({_STOP_IN}))) / len(toks) >= 0.05
             THEN 0.3 ELSE 0.0 END)
          + (CASE WHEN length(text) > 0
             THEN length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text)
             ELSE 0.0 END) * 0.3
        , 4) AS quality_score
      FROM feats
    )
    SELECT doc_id, lang, source, quality_score
    FROM scored
    WHERE quality_score >= 0.5
    """,
)
def text_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: composite quality score + keep-filter — the canonical
    'filter the crawl' step of a training-data pipeline."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    # tokenize ONCE in a staged projection (the composite score
    # references the token list three times; an inlined tokenizer
    # re-runs per reference — r16 optimization round, guide §4.2);
    # stage_filter then keeps the composite-score predicate above the
    # small-scan fan-out instead of serialized into the scan task
    toked = d.select(
        "doc_id",
        "lang",
        "source",
        "text",
        T.tokens(F.col("text")).alias("__toks"),
    )
    return stage_filter(
        toked.select(
            "doc_id",
            "lang",
            "source",
            T.quality_score_from(F.col("__toks"), F.col("text")).alias(
                "quality_score"
            ),
        ),
        F.col("quality_score") >= 0.5,
    )


@query(
    "doc_fingerprint",
    oracle=r"""
    SELECT
      doc_id,
      md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: deterministic document fingerprint — md5 of the
    whitespace-normalized text; the key for exact dedup at scale."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return d.select("doc_id", T.fingerprint(F.col("text")).alias("fingerprint"))


# Hoisted for the curation signal mart (same single-sourcing rule).
LANG_ID_ORACLE = """
    WITH padded AS (
      SELECT doc_id, lang, concat(' ', lower(text), ' ') AS t FROM documents
    )
    SELECT
      doc_id,
      lang AS labeled_lang,
      CASE
        WHEN t LIKE '% the %' OR t LIKE '% a %'  THEN 'en'
        WHEN t LIKE '% der %' OR t LIKE '% und %' THEN 'de'
        WHEN t LIKE '% el %'  OR t LIKE '% la %'  THEN 'es'
        ELSE 'und'
      END AS guessed_lang
    FROM padded
    """


@query("lang_id_heuristic", oracle=LANG_ID_ORACLE)
def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: language-ID via stopword-marker heuristic (n-gram-profile
    shape; deterministic CASE so it is oracle-checkable)."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        T.lang_guess(F.col("text")).alias("guessed_lang"),
    )


@query(
    "subword_token_count",
    oracle=rf"""
    SELECT
      doc_id,
      len(regexp_extract_all(lower(text), '\S+')) AS n_words,
      len(regexp_extract_all(lower(text), '{T.SUBWORD_PATTERN}')) AS n_subwords
    FROM documents
    """,
)
def subword_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: BPE-ish token counting — GPT-2-style pre-tokens (letter runs
    / digit runs / single punctuation) next to whitespace words; the
    per-document 'how many tokens will the tokenizer emit' estimate a
    training-data pipeline budgets with."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    text = F.col("text")
    return d.select(
        "doc_id",
        T.token_count(text).alias("n_words"),
        T.subword_count(text).alias("n_subwords"),
    )


@query(
    "rolling_fingerprints",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    )
    SELECT
      doc_id,
      CASE WHEN len(toks) > 0 THEN
        list_reduce(
          list_transform(toks, t -> {oracle_hash32('t', 7)} % {T.ROLL_M}),
          (acc, x) -> (acc * {T.ROLL_B} + x) % {T.ROLL_M})
      ELSE 0 END AS roll_fp
    FROM tok
    """,
)
def rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: Rabin-Karp polynomial rolling-hash fingerprint over token
    hashes — order-sensitive (unlike the md5-of-normalized-text
    fingerprint) and incrementally computable, the primitive for
    shift-resistant chunk dedup. Fold stays JVM-side via F.aggregate;
    DuckDB's list_reduce (which seeds from the first element) matches
    because Spark's zero-seeded first step reduces to the same value."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    toked = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    return toked.select(
        "doc_id", T.rolling_fingerprint(F.col("toks")).alias("roll_fp")
    )


_EN_IN = ", ".join(f"'{b}'" for b in T.EN_BIGRAMS)


@query(
    "lang_bigram_score",
    oracle=rf"""
    WITH c AS (
      SELECT doc_id, lang,
             regexp_replace(lower(text), '[^a-z]', '', 'g') AS clean
      FROM documents
    ),
    b AS (
      SELECT doc_id, lang,
             CASE WHEN length(clean) >= 2 THEN
               list_transform(range(1, length(clean)), i -> substr(clean, i, 2))
             ELSE [] END AS bg
      FROM c
    )
    SELECT doc_id, lang AS labeled_lang,
           {oracle_dround(
               "CASE WHEN len(bg) > 0 THEN "
               f"len(list_filter(bg, x -> x IN ({_EN_IN}))) / len(bg) "
               "ELSE 0.0 END", 4)} AS en_score
    FROM b
    """,
)
def lang_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: character-bigram profile scoring — the real n-gram-heuristic
    language-ID statistic (per-doc fraction of top-20 English bigrams),
    computed with JVM array ops over a materialized cleaned column."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    cleaned = d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        F.regexp_replace(F.lower("text"), "[^a-z]", "").alias("clean"),
    )
    with_bg = cleaned.select(
        "doc_id", "labeled_lang", T.char_bigrams(F.col("clean")).alias("bg")
    )
    return with_bg.select(
        "doc_id",
        "labeled_lang",
        dround(T.en_bigram_score(F.col("bg")), 4).alias("en_score"),
    )


_CHUNK, _STRIDE = 64, 48  # 16-token overlap


@query(
    "chunk_documents",
    oracle=rf"""
    WITH tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ),
    spans AS (
      SELECT doc_id, toks, len(toks) AS n,
             CASE WHEN len(toks) > {_CHUNK}
                  THEN CAST(ceil((len(toks) - {_CHUNK}) / CAST({_STRIDE} AS DOUBLE)) AS BIGINT) + 1
                  WHEN len(toks) > 0 THEN 1 ELSE 0 END AS n_chunks
      FROM tok
    ),
    exploded AS (
      SELECT doc_id, toks, n, unnest(range(0, n_chunks)) AS chunk_idx
      FROM spans
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
           CAST(least({_CHUNK}, n - chunk_idx * {_STRIDE}) AS INT) AS n_chunk_tokens,
           array_to_string(
             list_slice(toks, chunk_idx * {_STRIDE} + 1,
                        chunk_idx * {_STRIDE} + least({_CHUNK}, n - chunk_idx * {_STRIDE})),
             ' ') AS chunk_text
    FROM exploded
    """,
)
def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: context-window chunking — 64-token windows every 48 tokens
    (16-token overlap), the chunker that turns documents into
    training-context rows. Spans are computed map-side from the
    materialized token array; explode is a narrow op, so chunking adds
    zero shuffles."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    toked = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    spans = toked.select(
        "doc_id",
        "toks",
        F.posexplode(T.chunk_spans(F.col("toks"), _CHUNK, _STRIDE)).alias(
            "chunk_idx", "span"
        ),
    )
    return spans.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("span.len").cast("int").alias("n_chunk_tokens"),
        F.concat_ws(
            " ", F.slice(F.col("toks"), F.col("span.start"), F.col("span.len"))
        ).alias("chunk_text"),
    )


@query(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
      FROM documents
    ),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token
    ),
    df_t AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             CAST(ROUND(CAST((tf.tf * ln(n.n_docs / df_t.df)) AS DECIMAL(38,8)), 4)
               AS DOUBLE) AS tfidf
      FROM tf JOIN df_t USING (token) CROSS JOIN n
    )
    SELECT doc_id, token, tfidf, rank FROM (
      SELECT doc_id, token, tfidf,
             ROW_NUMBER() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, token) AS rank
      FROM scored
    ) WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: TF-IDF top-5 terms per document — term frequency served
    from the persisted token-partitioned doc-term index (see
    _doc_term_index: before r10 the tokenize→TF subtree executed once
    per consumer and the token join re-shuffled it), document
    frequency counting rows of that already-distinct frame (no second
    distinct, no exchange on the cached layout), corpus size as a
    broadcast scalar, keyed row_number for top-k. The salient-keyword
    extraction step of a corpus summarizer."""
    tf = _doc_term_index(spark, sf_dir)
    df_t = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = load(spark, sf_dir, "documents").agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    scored = (
        tf.join(df_t, "token")
        .join(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            dround(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4).alias(
                "tfidf"
            ),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "token")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("doc_id", "token", "tfidf", "rank")
    )


_MIX = {"en": 0.5, "de": 1.0, "es": 1.0, "fr": 0.25, "zh": 0.75}


def _mix_oracle() -> str:
    from multichannel_commerce_data_pipeline_spark.operators.bucketing import (
        oracle_bucket_sql,
    )

    cases = " ".join(
        f"WHEN lang = '{v}' THEN bucket < {int(round(f * 1000))}"
        for v, f in _MIX.items()
    )
    return f"""
    WITH b AS (
      SELECT doc_id, lang, source,
             {oracle_bucket_sql('doc_id', 1000)} AS bucket
      FROM documents
    )
    SELECT doc_id, lang, source FROM b
    WHERE CASE {cases} ELSE FALSE END
    """


@query("stratified_sample_mix", oracle=_mix_oracle())
def stratified_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/data-mixing: deterministic stratified sampling — per-language
    keep fractions (down-weight en, drop 3/4 of fr, keep all de/es)
    applied as a pure hash-bucket filter: reproducible row-for-row, no
    shuffle, pushes down like any predicate. The knob that retargets a
    corpus mixture without materializing intermediate copies."""
    from multichannel_commerce_data_pipeline_spark.operators.bucketing import (
        stratified_sample,
    )

    d = load(spark, sf_dir, "documents")
    keep = stratified_sample(F.col("doc_id"), F.col("lang"), _MIX)
    return d.filter(keep).select("doc_id", "lang", "source")


@query(
    "corpus_top_terms",
    oracle=r"""
    SELECT token, n, rank FROM (
      SELECT token, COUNT(*) AS n,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, token) AS rank
      FROM (
        SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS token
        FROM documents
      )
      GROUP BY token
    ) WHERE rank <= 20
    """,
)
def corpus_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: corpus vocabulary head — exact top-20 terms by frequency.
    The aggregated term frame is VOCABULARY-sized (hundreds of millions
    of rows at 100 TB), so the top-k must never be an unpartitioned
    window over it: ``orderBy(...).limit(20)`` plans as
    TakeOrderedAndProject (per-partition heaps, a 20-row merge on the
    driver), and the rank window then runs over the ≤20 survivors —
    the bpe_pair_counts idiom. Identical results: row_number over the
    exact top-20 under the same total order."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    counts = (
        d.select(F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window

    top = counts.orderBy(F.desc("n"), F.asc("token")).limit(20)
    w = Window.orderBy(F.desc("n"), "token")
    return top.withColumn("rank", F.row_number().over(w)).select(
        "token", "n", "rank"
    )


@query(
    "corpus_composition",
    oracle=rf"""
    SELECT
      source, lang,
      COUNT(*) AS docs,
      CAST(SUM(len(regexp_extract_all(lower(text), '\S+'))) AS BIGINT) AS tokens,
      CAST(SUM(length(text)) AS BIGINT) AS chars,
      {oracle_dround(
          "AVG(CASE WHEN length(text) > 0 THEN "
          "length(regexp_replace(text, '[^A-Za-z ]', '', 'g')) / length(text) "
          "ELSE 0.0 END)", 4)} AS avg_alpha_ratio
    FROM documents
    GROUP BY source, lang
    """,
)
def corpus_composition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: the corpus card — per (source, language) document/token/char
    volumes and mean cleanliness, the composition report every dataset
    release ships and every mixing decision starts from. One
    partial-aggregated group-by."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(T.token_count(F.col("text"))).alias("tokens"),
        F.sum(F.length("text")).alias("chars"),
        dround(F.avg(T.alpha_ratio(F.col("text"))), 4).alias("avg_alpha_ratio"),
    )


# deterministic PII fixture: the synthetic corpus has no real PII, so
# the query plants one email/phone/IP per doc (derived from doc_id)
# before scrubbing — the redaction path is exercised on every row and
# the oracle rebuilds the identical input.
_PII_SUFFIX_SPARK = (
    "concat(' contact user', CAST(doc_id AS STRING), '@example.com or "
    "call 555-867-5309 from 10.1.2.', CAST(doc_id % 256 AS STRING))"
)


@query(
    "pii_redaction",
    oracle=f"""
    SELECT doc_id,
      {T.oracle_redact_pii(
          "(text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com"
          " or call 555-867-5309 from 10.1.2.' || CAST(doc_id % 256 AS VARCHAR))"
      )} AS clean_text
    FROM documents
    """,
)
def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/privacy: email/phone/IPv4 scrubbing to typed placeholders —
    the pre-training privacy pass, as chained JVM-side regexp_replace
    (RE2-compatible patterns, so DuckDB reproduces the redaction
    byte-for-byte). Pure narrow map: no shuffle, scales with scan."""
    d = load(spark, sf_dir, "documents")
    planted = F.concat(F.col("text"), F.expr(_PII_SUFFIX_SPARK))
    return d.select("doc_id", T.redact_pii(planted).alias("clean_text"))


# deterministic Unicode-hygiene fixture: the synthetic corpus is clean
# ASCII, so the query plants the dirty characters the operator exists
# to scrub (zero-width space inside a word, soft hyphen, C0 control,
# NBSP, RTL mark, vertical tab, doubled/trailing whitespace) before
# normalizing — every row exercises every stage, and the oracle
# rebuilds the identical planted input from printable chr() calls.
_NORM_PLANT = (
    "  zer\u200bo-wid\u00adth bell\x07 nb\u00a0sp\u200f end\x0b\t"
)


def _sql_chars(text: str) -> str:
    """A printable-ASCII SQL expression producing ``text`` exactly
    (non-ASCII / control chars via chr(codepoint)) — keeps invisible
    bytes out of the oracle source."""
    parts: list[str] = []
    buf = ""
    for ch in text:
        if 32 <= ord(ch) < 127 and ch != "'":
            buf += ch
        else:
            if buf:
                parts.append(f"'{buf}'")
                buf = ""
            parts.append(f"chr({ord(ch)})")
    if buf:
        parts.append(f"'{buf}'")
    return " || ".join(parts)


@query(
    "text_normalize",
    oracle=f"""
    SELECT doc_id,
      {T.oracle_normalize_text(f"(text || {_sql_chars(_NORM_PLANT)})")}
        AS clean_text
    FROM documents
    """,
)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: Unicode hygiene — the normalize-before-anything curation
    pass (CCNet/Dolma run an equivalent before hashing or lang-ID,
    because a zero-width space inside a boilerplate line defeats every
    digest-based dedup): control and format characters stripped, NBSP
    to space, whitespace runs collapsed, trimmed. Chained JVM-side
    regexp_replace with character classes spelled so Java regex and
    RE2 compile identically (operators/text.py NORMALIZE_STAGES);
    pure narrow map, no shuffle, scales with scan."""
    d = load(spark, sf_dir, "documents")
    planted = F.concat(F.col("text"), F.lit(_NORM_PLANT))
    return d.select("doc_id", T.normalize_text(planted).alias("clean_text"))


# Hoisted so the curation signal mart can embed the identical flag SQL
# as a sub-select (single-sourced; a drift fails both hash compares).
GOPHER_ORACLE = rf"""
    WITH t AS (
      SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ),
    m AS (
      SELECT doc_id,
        len(toks) AS n_words,
        CASE WHEN len(toks) > 0
             THEN list_reduce(list_transform(toks, t -> CAST(length(t) AS DOUBLE)),
                              (a, x) -> a + x) / len(toks)
             ELSE 0.0 END AS mean_word_len_raw,
        CASE WHEN len(toks) > 0
             THEN CAST(len(regexp_extract_all(text, '[#\.\{{\}}\[\]<>\|\\\\]'))
                       AS DOUBLE) / len(toks)
             ELSE 0.0 END AS symbol_ratio_raw,
        len(list_distinct(list_filter(toks,
            t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))) AS n_stopword_kinds
      FROM t
    )
    SELECT doc_id, n_words,
      {oracle_dround('mean_word_len_raw', 4)} AS mean_word_len,
      {oracle_dround('symbol_ratio_raw', 4)} AS symbol_ratio,
      n_stopword_kinds,
      (n_words >= 5 AND n_words <= 10000) AS ok_word_count,
      (mean_word_len_raw >= 2.0 AND mean_word_len_raw <= 12.0) AS ok_word_len,
      (symbol_ratio_raw <= 0.1) AS ok_symbols,
      (n_stopword_kinds >= 2) AS ok_stopwords
    FROM m
    """


@query("gopher_quality_flags", oracle=GOPHER_ORACLE)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: Gopher-rule quality flags (Rae et al. 2021 A1 subset) — word
    count / mean word length / symbol ratio bounds and stopword
    presence, emitted as independent boolean flags so the keep decision
    can be re-thresholded per corpus without recomputing features. One
    tokenizer materialization, zero shuffles."""
    d = load(spark, sf_dir, "documents")
    # stage 0: tokenize ONCE; stage 1: the four scalar signals ONCE
    # (mean_word_len's aggregate fold carries a lambda, so inline
    # references re-run it per consumer — r16 optimization round,
    # guide §4.2); stage 2: flags derive from the staged scalars via
    # the single-sourced threshold helper
    toked = d.select("doc_id", "text", T.tokens(F.col("text")).alias("toks"))
    flags = T.gopher_flags_from(F.col("toks"), F.col("text"))
    scalars = toked.select(
        "doc_id",
        flags["n_words"].alias("n_words"),
        flags["mean_word_len"].alias("__mwl"),
        flags["symbol_ratio"].alias("__sr"),
        flags["n_stopword_kinds"].alias("n_stopword_kinds"),
    )
    ok = T.gopher_ok_flags(
        F.col("n_words"),
        F.col("__mwl"),
        F.col("__sr"),
        F.col("n_stopword_kinds"),
    )
    return scalars.select(
        "doc_id",
        "n_words",
        dround(F.col("__mwl"), 4).alias("mean_word_len"),
        dround(F.col("__sr"), 4).alias("symbol_ratio"),
        "n_stopword_kinds",
        ok["ok_word_count"].alias("ok_word_count"),
        ok["ok_word_len"].alias("ok_word_len"),
        ok["ok_symbols"].alias("ok_symbols"),
        ok["ok_stopwords"].alias("ok_stopwords"),
    )


@query(
    "bpe_pair_counts",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
    ),
    pairs AS (
      SELECT unnest(
               CASE WHEN len(t) >= 2 THEN
                 list_transform(range(1, len(t)),
                                i -> t[i] || ' ' || t[i + 1])
               ELSE [] END
             ) AS pair
      FROM toks
    ),
    counted AS (
      SELECT pair, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM pairs GROUP BY pair
    )
    SELECT pair, n_occurrences, rank FROM (
      SELECT pair, n_occurrences,
             ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, pair) AS rank
      FROM counted
    ) WHERE rank <= 50
    """,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X6: the inner loop of BPE tokenizer training — corpus-wide
    counts of adjacent token pairs, ranked; the top pair is the next
    merge a BPE trainer would take. Pairs are built map-side with
    zip_with over two slices of the materialized token array (no
    token-level explode of wide rows — only the pair strings shuffle
    into a partial-aggregated count), and the top-50 is a
    TakeOrderedAndProject, never a global sort."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    toked = d.select(T.tokens(F.col("text")).alias("t"))
    pairs = toked.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.zip_with(
                    F.slice("t", 1, F.size("t") - 1),
                    F.slice("t", 2, F.size("t") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                ),
            ).otherwise(F.slice("t", 1, 0))
        ).alias("pair")
    )
    from pyspark.sql import Window

    counted = pairs.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    # top-50 via orderBy+limit = TakeOrderedAndProject (per-partition
    # heaps, never a full sort); the rank window then runs over ≤50
    # rows, so its single partition is bounded, not corpus-sized.
    top = counted.orderBy(F.desc("n_occurrences"), F.asc("pair")).limit(50)
    w = Window.orderBy(F.desc("n_occurrences"), F.asc("pair"))
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "dedup_report",
    oracle="""
    WITH keyed AS (
      SELECT source, md5(text) AS h FROM documents
    ),
    per AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique
      FROM keyed GROUP BY source
    )
    SELECT source, n_docs, n_unique,
           CAST(ROUND(CAST((1.0 - CAST(n_unique AS DOUBLE)
                 / CAST(n_docs AS DOUBLE)) AS DECIMAL(38,10)), 6) AS DOUBLE)
             AS dup_rate
    FROM per
    """,
)
def dedup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup observability: per-source exact-duplicate rate (md5 text
    fingerprint) — the report a corpus pipeline publishes after every
    dedup run to catch a feed gone pathological (one source suddenly
    90% duplicates means an upstream retry loop, not organic data).
    One partial-aggregated group-by; COUNT DISTINCT of the 128-bit
    fingerprint never moves raw text through the exchange. At 100 TB
    swap the exact distinct for approx_count_distinct and this becomes
    a single-pass sketch aggregate (the approx_distinct_kpi shape)."""
    d = load(spark, sf_dir, "documents").select(
        "source", F.md5(F.col("text")).alias("h")
    )
    per = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("h")).alias("n_unique"),
    )
    rate = dround(
        F.lit(1.0)
        - F.col("n_unique").cast("double") / F.col("n_docs").cast("double"),
        6,
    )
    return per.select("source", "n_docs", "n_unique", rate.alias("dup_rate"))


_BM25_TERMS = ("spark", "query", "join")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_STATS_CACHE: dict[str, object] = {}


def _bm25_oracle() -> str:
    terms = ", ".join(f"'{t}'" for t in _BM25_TERMS)
    idf = "ln(1 + (n.n_docs - df_t.df + 0.5) / (df_t.df + 0.5))"
    tf_norm = (
        f"(tf.tf * {_BM25_K1 + 1.0!r}) / (tf.tf + {_BM25_K1!r} *"
        f" (1 - {_BM25_B!r} + {_BM25_B!r} * dl.dl / a.avgdl))"
    )
    contrib_q = (
        f"CAST(ROUND(CAST(({idf} * {tf_norm}) AS DECIMAL(38,10)), 6)"
        " AS DECIMAL(28,6))"
    )
    return rf"""
    WITH tok AS (
      SELECT doc_id, unnest(regexp_extract_all(lower(text), '\S+')) AS token
      FROM documents
    ),
    dl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS dl FROM tok GROUP BY 1),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ({terms}) GROUP BY doc_id, token
    ),
    df_t AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY token),
    n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    a AS (
      SELECT CAST(SUM(dl) AS DOUBLE) / MAX(n.n_docs) AS avgdl
      FROM dl CROSS JOIN n
    ),
    contrib AS (
      SELECT tf.doc_id, {contrib_q} AS cq
      FROM tf
      JOIN df_t USING (token)
      JOIN dl USING (doc_id)
      CROSS JOIN n CROSS JOIN a
    )
    SELECT doc_id,
           CAST(SUM(cq) AS DOUBLE) AS bm25,
           CAST(COUNT(*) AS BIGINT) AS n_terms_matched
    FROM contrib GROUP BY doc_id
    """


@query("bm25_search", oracle=_bm25_oracle())
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X2 sparse-retrieval ranking: Okapi BM25 (k1=1.2, b=0.75) of
    every document against a fixed term set — the lexical scorer behind
    the sparse side of hybrid search (hybrid_search_rrf ranks by raw
    tf; this is the production formula with saturation and length
    normalization). A single keyed aggregation over the persisted
    doc-term index produces doc length AND one conditional tf counter
    per query term (columns, not rows — |Q| is small by definition),
    so the whole query is one doc-keyed shuffle of tf-sized rows —
    the corpus is never re-tokenized per call (r10; before, one
    explode over the raw text per invocation). The corpus
    model (N, avgdl, per-term df) is one bounded collect off that
    frame, entering the scoring projection as literals — the
    fit-then-broadcast shape every model query here uses. Per-term
    contributions quantize to DECIMAL(28,6) BEFORE the fixed-order sum
    — addition-order-independent, so the cross-engine compare is exact
    (the decayed_popularity convention); ln() itself agrees
    cross-engine per the tfidf_top_terms precedent (the oracle fits
    the same model relationally — same values, different plan)."""
    # doc length and per-term tf fold out of the persisted doc-term
    # index (sum of tf == token count): the corpus is not re-tokenized
    # per call, and the shuffle to doc_id carries tf-sized rows
    tf_idx = _doc_term_index(spark, sf_dir)
    per_doc = tf_idx.groupBy("doc_id").agg(
        F.sum("tf").cast("long").alias("dl"),
        *[
            F.sum(F.when(F.col("token") == t, F.col("tf")).otherwise(0)).alias(
                f"tf_{i}"
            )
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    # corpus model (N, avgdl, df) fitted once per sf_dir — training
    # state like the PQ codebooks, not per-query state
    if sf_dir not in _BM25_STATS_CACHE:
        _BM25_STATS_CACHE[sf_dir] = per_doc.agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("dl").cast("double").alias("dl_sum"),
            *[
                F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(
                    f"df_{i}"
                )
                for i in range(len(_BM25_TERMS))
            ],
        ).collect()[0]
    stats = _BM25_STATS_CACHE[sf_dir]
    avgdl = stats.dl_sum / stats.n_docs
    score = F.lit(None).cast("decimal(28,6)")
    contribs = []
    for i in range(len(_BM25_TERMS)):
        df = stats[f"df_{i}"]
        idf = F.log(F.lit(1 + (stats.n_docs - df + 0.5) / (df + 0.5)))
        tf = F.col(f"tf_{i}")
        tf_norm = (tf * (_BM25_K1 + 1.0)) / (
            tf
            + _BM25_K1 * (1 - _BM25_B + _BM25_B * F.col("dl") / F.lit(avgdl))
        )
        contribs.append(
            F.when(
                tf > 0,
                F.round((idf * tf_norm).cast("decimal(38,10)"), 6).cast(
                    "decimal(28,6)"
                ),
            ).otherwise(F.lit(0).cast("decimal(28,6)"))
        )
    score = contribs[0]
    for c in contribs[1:]:
        score = score + c
    matched = sum(
        F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)
        for i in range(len(_BM25_TERMS))
    ).cast("long")
    return (
        per_doc.withColumn("n_terms_matched", matched)
        .filter(F.col("n_terms_matched") > 0)
        .select(
            "doc_id",
            score.cast("double").alias("bm25"),
            "n_terms_matched",
        )
    )


_RAKE_MAX_LEN = 4
_RAKE_TOP = 20


def _rake_oracle() -> str:
    ratio = oracle_dround("CAST(deg AS DOUBLE) / freq", 6)
    score = oracle_dround("CAST(SUM(CAST(r AS DECIMAL(28,6))) AS DOUBLE)", 6)
    return rf"""
    WITH tok AS (
      SELECT doc_id AS doc, regexp_extract_all(lower(text), '\S+') AS toks
      FROM documents
    ),
    pe AS (
      SELECT doc, pos, toks[pos] AS tk FROM (
        SELECT doc, toks, unnest(range(1, len(toks) + 1)) AS pos FROM tok
      )
    ),
    marked AS (
      SELECT doc, pos, tk,
             CASE WHEN tk IN ({_STOP_IN}) THEN 1 ELSE 0 END AS brk
      FROM pe
    ),
    islands AS (
      SELECT doc, pos, tk, brk,
             SUM(brk) OVER (PARTITION BY doc ORDER BY pos
                            ROWS UNBOUNDED PRECEDING) AS pid
      FROM marked
    ),
    phr AS (
      SELECT doc, pid,
             string_agg(tk, ' ' ORDER BY pos) AS phrase,
             CAST(COUNT(*) AS BIGINT) AS plen
      FROM islands WHERE brk = 0
      GROUP BY doc, pid
      HAVING COUNT(*) <= {_RAKE_MAX_LEN}
    ),
    wocc AS (
      SELECT unnest(string_split(phrase, ' ')) AS w, plen FROM phr
    ),
    wstats AS (
      SELECT w, CAST(COUNT(*) AS BIGINT) AS freq,
             CAST(SUM(plen) AS BIGINT) AS deg
      FROM wocc GROUP BY w
    ),
    pcounts AS (
      SELECT phrase, CAST(COUNT(*) AS BIGINT) AS n_occurrences
      FROM phr GROUP BY phrase
    ),
    pscore AS (
      SELECT p.phrase, {score} AS score
      FROM (SELECT DISTINCT phrase FROM phr) p,
           unnest(string_split(p.phrase, ' ')) AS u(w)
      JOIN wstats s ON s.w = u.w,
      LATERAL (SELECT {ratio} AS r) x
      GROUP BY p.phrase
    )
    SELECT phrase, n_occurrences, score, rank FROM (
      SELECT c.phrase, c.n_occurrences, s.score,
             ROW_NUMBER() OVER (ORDER BY s.score DESC, c.phrase) AS rank
      FROM pcounts c JOIN pscore s ON c.phrase = s.phrase
    ) WHERE rank <= {_RAKE_TOP}
    """


@query("keyword_extraction", oracle=_rake_oracle())
def keyword_extraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3: RAKE-style keyword extraction — candidate phrases are the
    maximal stopword-free token runs (gaps-and-islands over the token
    stream, capped at 4 words), scored by the classic degree/frequency
    word statistic: deg(w) = total length of phrases containing w,
    freq(w) = occurrences, phrase score = sum of deg/freq over its
    words. Corpus-level keyword surfacing with zero model weights —
    the cheap first pass before embedding-based topic work. Plan: one
    tokenize + posexplode, ONE keyed running-sum window per document
    (pos-ordered, doc-bounded frames), ONE phrase-census rollup
    materialized per run (everything downstream — word stats, scores,
    ranks — derives from the census, so the document chain executes
    once, not once per consumer), and the per-word ratios re-joined
    onto distinct phrases with DECIMAL-quantized addends so the
    <=4-term score sum is order-independent. Top-20 via
    TakeOrderedAndProject with the rank window over the survivors (the
    corpus_top_terms lesson)."""
    from pyspark.sql import Window

    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    toks = d.select(
        F.col("doc_id").alias("doc"), T.tokens(F.col("text")).alias("toks")
    )
    pe = toks.select(
        "doc", F.posexplode_outer("toks").alias("pos0", "tk")
    ).filter(F.col("tk").isNotNull())
    marked = pe.select(
        "doc",
        (F.col("pos0") + 1).alias("pos"),
        "tk",
        F.when(F.col("tk").isin(*T.STOPWORDS), F.lit(1))
        .otherwise(F.lit(0))
        .alias("brk"),
    )
    wi = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = marked.withColumn("pid", F.sum("brk").over(wi))
    phr = (
        islands.filter(F.col("brk") == 0)
        .groupBy("doc", "pid")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tk"))),
                    lambda s: s["tk"],
                ),
            ).alias("phrase"),
            F.count(F.lit(1)).alias("plen"),
        )
        .filter(F.col("plen") <= _RAKE_MAX_LEN)
    )
    # The phrase census is the ONLY consumer of the document chain:
    # materialize it once (eager localCheckpoint — recomputed on every
    # invocation, small: distinct phrases) and derive everything else
    # from the census. Spark has no DataFrame-level CSE, so the old
    # shape (wstats from phr, pcounts from phr, two consumers of
    # pcounts) re-executed the tokenize+posexplode+island-window chain
    # three times per run (r16 optimization round, guide §1.2/§3.3 —
    # three `Scan parquet documents` copies in the before plan).
    pcounts = (
        phr.groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .localCheckpoint(eager=True)
    )
    # Word stats re-derived from the census: a distinct phrase with
    # occurrence count n contributes each of its word positions n
    # times, so freq(w) = SUM(n_occurrences) and deg(w) =
    # SUM(n_occurrences * plen) over exploded census rows — the same
    # integers the per-occurrence explode produced (plen is a function
    # of the phrase: its word count).
    pw = pcounts.select(
        "n_occurrences",
        F.size(F.split("phrase", " ")).alias("plen"),
        F.explode(F.split("phrase", " ")).alias("w"),
    )
    wstats = pw.groupBy("w").agg(
        F.sum("n_occurrences").alias("freq"),
        F.sum(F.col("n_occurrences") * F.col("plen")).alias("deg"),
    )
    pwords = pcounts.select(
        "phrase", F.explode(F.split("phrase", " ")).alias("w")
    ).join(wstats, "w")
    pscore = pwords.groupBy("phrase").agg(
        dround(
            F.sum(
                dround(F.col("deg").cast("double") / F.col("freq"), 6).cast(
                    "decimal(28,6)"
                )
            ).cast("double"),
            6,
        ).alias("score")
    )
    ranked = pcounts.join(pscore, "phrase")
    top = ranked.orderBy(F.desc("score"), F.asc("phrase")).limit(_RAKE_TOP)
    wr = Window.orderBy(F.desc("score"), F.asc("phrase"))
    return top.withColumn("rank", F.row_number().over(wr)).select(
        "phrase", "n_occurrences", "score", "rank"
    )


# --- positional phrase search (r15) ----------------------------------
# The positional postings index: (doc_id, pos, token), built once per
# (session, sf_dir) like _doc_term_index and repartitioned on token so
# every phrase probe's term filter lands on the cached layout. At
# 100 TB this is the inverted index you persist bucketed by token;
# a phrase probe then reads ONLY the phrase terms' postings.
_POS_INDEX_CACHE: dict[tuple[str, str], DataFrame] = {}
_PHRASE = ("hash", "join")


def _doc_pos_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        from pyspark import StorageLevel

        d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        toks = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
        # posexplode_outer + null filter: a bare generator would make
        # InferFiltersFromGenerate push the whole tokenizer into the
        # scan filter (the shingle lesson)
        post = toks.select(
            "doc_id", F.posexplode_outer("toks").alias("pos", "token")
        ).filter(F.col("token").isNotNull())
        n_parts = spark.sparkContext.defaultParallelism
        idx = post.repartition(n_parts, "token").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        idx.count()
        return idx

    return session_memo(spark, _POS_INDEX_CACHE, sf_dir, build)


def phrase_probe(idx, terms: tuple[str, ...]):
    """Positional intersection for an n-token phrase: the first term's
    postings, successively equi-joined with each later term's postings
    shifted back by its phrase offset — n-1 joins on (doc_id, pos),
    each side pre-filtered to ONE term's posting list, so probe cost
    scales with the posting lists (selective sides broadcast under
    AQE), never the corpus. Returns (doc_id, pos) per occurrence, pos
    = the first term's 0-based position."""
    out = idx.filter(F.col("token") == terms[0]).select("doc_id", "pos")
    for i, t in enumerate(terms[1:], 1):
        nxt = idx.filter(F.col("token") == t).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        out = out.join(nxt, ["doc_id", "pos"])
    return out


@query(
    "phrase_search",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS arr
      FROM documents
    ),
    post AS (
      SELECT doc_id, unnest(arr) AS token,
             generate_subscripts(arr, 1) AS pos
      FROM toks
    ),
    p1 AS (SELECT doc_id, pos FROM post WHERE token = '{_PHRASE[0]}'),
    p2 AS (SELECT doc_id, pos - 1 AS pos FROM post
           WHERE token = '{_PHRASE[1]}')
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches,
           CAST(MIN(pos) AS BIGINT) AS first_pos
    FROM p1 JOIN p2 USING (doc_id, pos)
    GROUP BY doc_id
    """,
)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16 (r15): exact PHRASE query over the positional postings
    index — the retrieval primitive bm25_search cannot express (BM25
    is bag-of-words; "hash join" the phrase is not "hash" and "join"
    anywhere in the document). Classic positional-intersection: the
    phrase's first term's postings equi-join the second term's
    postings shifted by one position on (doc_id, pos); n-token
    phrases chain n-1 such joins. Returns per matching document the
    occurrence count and the first match position (1-based).

    Scale shape: the corpus is tokenized ONCE into a persisted
    positional index partitioned on token (_doc_pos_index — the
    positional sibling of bm25's _doc_term_index); each probe filters
    that cached layout down to the phrase terms' postings before any
    shuffle, so probe cost scales with the TERMS' posting lists, not
    the corpus — the reason search engines store positions in the
    index instead of rescanning text. The equi-join is
    AQE-broadcastable for selective terms."""
    idx = _doc_pos_index(spark, sf_dir)
    j = phrase_probe(idx, _PHRASE)
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matches"),
        (F.min("pos") + 1).cast("long").alias("first_pos"),
    )


# --- incremental search-index maintenance (r16) ----------------------
# The last stored artifact without an incremental path: bm25/tfidf
# serve from the doc-term index and phrase_search from its positional
# sibling, but a growing corpus refreshed them only by re-tokenizing
# everything. Postings over DISJOINT doc sets merge by plain union
# (no arithmetic at all — the strongest merge law in the statistics
# family), so an index refresh need only tokenize the arriving docs.
_PDM_TERMS = ("spark", "query", "join")  # probe terms (bm25's set)


def ensure_postings_state(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the stored doc-term postings STATE over the base
    corpus slice (doc_id % 10 != 7 — the ivf_index_merge arriving-
    batch convention): (doc_id, token, tf), laid out on token like
    the serving index. Once per source fingerprint, atomically
    published."""
    import tempfile
    from pathlib import Path

    from multichannel_commerce_data_pipeline_spark.queries.warehouse_queries import (
        _materialize_atomic,
        _source_fingerprint,
    )

    tag = _source_fingerprint(sf_dir, "documents")
    base = Path(tempfile.gettempdir()) / "mcdp_warehouse" / tag / "postings_state"

    def build(path: str) -> None:
        d = parallelize_small_scan(
            spark, load(spark, sf_dir, "documents")
        ).filter(F.col("doc_id") % 10 != 7)
        tok = d.select(
            "doc_id", F.explode(T.tokens(F.col("text"))).alias("token")
        )
        n_parts = spark.sparkContext.defaultParallelism
        (
            tok.groupBy("doc_id", "token")
            .agg(F.count(F.lit(1)).alias("tf"))
            .repartition(n_parts, "token")
            .write.mode("overwrite")
            .parquet(path)
        )

    return _materialize_atomic(base, build)


def _pdm_oracle() -> str:
    from multichannel_commerce_data_pipeline_spark.operators.reconcile import (
        oracle_row_fingerprint,
    )

    fp = oracle_row_fingerprint(["doc_id", "token", "tf"])
    terms = ", ".join(f"'{t}'" for t in _PDM_TERMS)

    def tf(pred: str) -> str:
        return rf"""
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '\S+')) AS token
            FROM documents WHERE {pred})
      GROUP BY doc_id, token"""

    def rollup(rel: str) -> str:
        return f"""
      SELECT token AS term, CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS tf_sum, bit_xor({fp}) AS digest
      FROM {rel} WHERE token IN ({terms}) GROUP BY token
      UNION ALL
      SELECT 'ALL', CAST(COUNT(*) AS BIGINT), CAST(SUM(tf) AS BIGINT),
             bit_xor({fp})
      FROM {rel}"""

    return f"""
    WITH base_tf AS ({tf("doc_id % 10 <> 7")}),
    delta_tf AS ({tf("doc_id % 10 = 7")}),
    merged AS (SELECT * FROM base_tf UNION ALL SELECT * FROM delta_tf),
    full_tf AS ({tf("TRUE")}),
    m1 AS ({rollup("merged")}),
    f1 AS ({rollup("full_tf")})
    SELECT m1.term, m1.df, m1.tf_sum, m1.digest,
           (m1.df = f1.df AND m1.tf_sum = f1.tf_sum
            AND m1.digest = f1.digest) AS merge_matches_full
    FROM m1 JOIN f1 ON m1.term = f1.term
    """


@query("postings_delta_merge", oracle=_pdm_oracle())
def postings_delta_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X16+ (r16): INCREMENTAL search-index maintenance — the
    doc-term postings that bm25_search/tfidf_top_terms serve from,
    refreshed by tokenizing ONLY the arriving docs (doc_id % 10 == 7,
    the ivf_index_merge ingest convention) and UNIONING their
    (doc_id, token, tf) rows into the stored base-slice state.
    Postings over disjoint doc sets merge by plain union — no
    arithmetic, the strongest merge law in the maintained-artifact
    family (histogram: accumulator fold; NDV: register MIN; MV:
    algebraic add; postings: set union) — and every derived statistic
    the scorers need (df by addition, N by addition, dl sums by
    addition) inherits mergeability from it. This replaces the
    re-tokenize-everything refresh: at 100 TB the refresh cost tracks
    the arriving batch, never the corpus.

    The report proves the merge against the from-scratch index —
    which is the SESSION-CACHED _doc_term_index the scorers already
    built (the harness is free: no second full tokenize) — per probe
    term and globally ('ALL'): postings count (= df), tf mass, and
    the order-independent XOR of (doc_id, token, tf) fingerprints,
    all driver-compared against the oracle's relational recomputation
    of BOTH sides, so a lost posting, a double-counted doc, or a
    drifted tf anywhere turns the row red."""
    from multichannel_commerce_data_pipeline_spark.operators.reconcile import (
        row_fingerprint,
    )

    state = parquet_memo(spark, ensure_postings_state(spark, sf_dir))
    delta = (
        parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") % 10 == 7)
        .select("doc_id", F.explode(T.tokens(F.col("text"))).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    merged = state.unionByName(delta)
    full = _doc_term_index(spark, sf_dir)

    def rollup(df: DataFrame, suffix: str) -> DataFrame:
        # ONE grouping-sets pass produces the per-term rows AND the
        # grand total: a union of two aggregates over the same subtree
        # would re-EXECUTE it per consumer (no DataFrame-level CSE —
        # the delta tokenize ran twice per side in the union form;
        # plan-asserted down to one Generate now)
        fp = row_fingerprint(
            [F.col("doc_id"), F.col("token"), F.col("tf")]
        )
        term_key = (
            F.when(F.col("token").isin(*_PDM_TERMS), F.col("token"))
            .otherwise(F.lit("__OTHER"))
        )
        keyed = df.select(term_key.alias("term_key"), "tf", fp.alias("fp"))
        r = keyed.rollup("term_key").agg(
            F.count(F.lit(1)).cast("long").alias(f"df{suffix}"),
            F.sum("tf").cast("long").alias(f"tf_sum{suffix}"),
            F.bit_xor("fp").alias(f"digest{suffix}"),
        )
        # data rows never carry a NULL term_key, so the NULL row IS
        # the rollup total; __OTHER partials are dropped
        return r.filter(
            F.col("term_key").isNull()
            | F.col("term_key").isin(*_PDM_TERMS)
        ).select(
            F.coalesce(F.col("term_key"), F.lit("ALL")).alias("term"),
            f"df{suffix}",
            f"tf_sum{suffix}",
            f"digest{suffix}",
        )

    m = rollup(merged, "")
    f = rollup(full, "_f")
    return m.join(F.broadcast(f), "term").select(
        "term",
        "df",
        "tf_sum",
        "digest",
        (
            (F.col("df") == F.col("df_f"))
            & (F.col("tf_sum") == F.col("tf_sum_f"))
            & (F.col("digest") == F.col("digest_f"))
        ).alias("merge_matches_full"),
    )
