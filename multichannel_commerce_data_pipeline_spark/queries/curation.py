"""The curation signal mart: one wide per-document frame composing the
engine's existing quality signals — the RedPajama-V2 "signals, not
decisions" surface. A curator re-thresholds keep/drop rules by querying
this table instead of recomputing features; every signal column is
single-sourced from the operator (and oracle SQL) of its standalone
query, so the mart can never drift from the individual reports.

Signals (per train document, doc_id >= the eval cut):
  - Gopher quality flags (Rae et al. 2021 A1 subset)  — gopher_quality_flags
  - duplicate n-gram fractions                        — repetition_quality
  - language-ID heuristic                             — lang_id_heuristic
  - hashed-bigram LM perplexity (CCNet-style)         — lm_perplexity_score
  - naive-Bayes language posterior (fastText-style)   — nb_lang_posterior
  - eval-contamination window count (GPT-3 app. C)    — decontaminate family

Plan shape: every model-backed signal scores MAP-SIDE against its
cached fitted model (the lm/nb fits are bounded aggregates collected
once per corpus version, shared with their standalone queries), so the
whole signal block is one projection chain over the scan — zero
exchanges. Only the contamination count shuffles: one keyed groupBy on
doc over the (persisted) gram index restricted to eval-matching
digests, plus the final left join back onto the mart — <= 2 keyed
exchanges total (asserted in tests/test_plans.py), with the
eval-digest distinct bounded by the eval slice and broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import dround
from multichannel_commerce_data_pipeline_spark.operators import dedup as D
from multichannel_commerce_data_pipeline_spark.operators import importance as I
from multichannel_commerce_data_pipeline_spark.operators import text as T
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.queries.dedup import (
    _BENCH_CUT,
    _SUBSTR_WS_GRAMS,
    _substring_gram_index,
)
from multichannel_commerce_data_pipeline_spark.queries.importance import (
    _LM_D,
    _LM_SEED,
    LM_ORACLE,
    NB_ORACLE,
    lm_model,
    nb_best_struct,
    nb_model,
)
from multichannel_commerce_data_pipeline_spark.queries.text import (
    GOPHER_ORACLE,
    LANG_ID_ORACLE,
)
from multichannel_commerce_data_pipeline_spark.queries.dedup import (
    REPETITION_ORACLE,
)
from multichannel_commerce_data_pipeline_spark.tables import (
    load,
    parallelize_small_scan,
)


def _signal_oracle() -> str:
    """Each signal's FULL standalone oracle embeds verbatim as a
    sub-select (DuckDB allows a WITH inside a parenthesized subquery),
    filtered to the train slice at the outer level — so the mart's
    oracle is definitionally the join of the standalone oracles and a
    drift in any one fails BOTH hash compares."""
    cut = _BENCH_CUT
    return rf"""
    WITH gop AS (SELECT * FROM ({GOPHER_ORACLE}) WHERE doc_id >= {cut}),
    rep AS (SELECT * FROM ({REPETITION_ORACLE}) WHERE doc_id >= {cut}),
    lg AS (
      SELECT doc_id, guessed_lang FROM ({LANG_ID_ORACLE})
      WHERE doc_id >= {cut}
    ),
    lm AS (SELECT doc_id, ppl FROM ({LM_ORACLE}) WHERE doc_id >= {cut}),
    nb AS (
      SELECT doc_id, pred_lang, best_logp FROM ({NB_ORACLE})
      WHERE doc_id >= {cut}
    ),
    allg AS ({_SUBSTR_WS_GRAMS} SELECT doc_id, g FROM grams),
    ct AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS contam_windows
      FROM allg
      WHERE doc_id >= {cut}
        AND g IN (SELECT DISTINCT g FROM allg WHERE doc_id < {cut})
      GROUP BY doc_id
    )
    SELECT gop.doc_id, gop.n_words, gop.mean_word_len, gop.symbol_ratio,
           gop.n_stopword_kinds, gop.ok_word_count, gop.ok_word_len,
           gop.ok_symbols, gop.ok_stopwords,
           rep.dup_bigram_frac, rep.dup_trigram_frac,
           lg.guessed_lang,
           lm.ppl,
           nb.pred_lang AS nb_pred_lang,
           CAST(nb.best_logp AS DOUBLE) AS nb_logp,
           CAST(COALESCE(ct.contam_windows, 0) AS BIGINT) AS contam_windows
    FROM gop
    JOIN rep USING (doc_id)
    JOIN lg USING (doc_id)
    LEFT JOIN lm USING (doc_id)
    LEFT JOIN nb USING (doc_id)
    LEFT JOIN ct USING (doc_id)
    """


@query("curation_signal_table", oracle=_signal_oracle())
def curation_signal_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3/X6: the curation signal mart — one wide per-train-document
    frame of every quality signal the engine computes (Gopher flags,
    repetition fractions, lang-ID, LM perplexity, NB posterior,
    eval-contamination window count), the RedPajama-V2 "signals, not
    decisions" surface that lets a user re-threshold keep/drop rules
    without recomputing features. Model-backed signals score map-side
    against the SAME cached fits as their standalone queries (one fit
    per corpus version); only the contamination count shuffles — a
    keyed count over the persisted gram index plus the final left
    join, <= 2 keyed exchanges in the whole plan."""
    d = parallelize_small_scan(
        spark,
        load(spark, sf_dir, "documents")
        .select("doc_id", "lang", "text")
        .filter(F.col("doc_id") >= _BENCH_CUT),
    )
    # stage 1: materialize each expensive per-row array exactly once
    staged = d.select(
        "doc_id",
        "text",
        T.tokens(F.col("text")).alias("toks"),
        I.feature_buckets(F.col("text")).alias("bs"),
        I.bigram_bucket_keys(F.col("text"), _LM_D, _LM_SEED).alias("ks"),
    )
    # stage 2: n-gram multisets derive from the staged token array
    grammed = staged.select(
        "*",
        D.ngram_multiset(F.col("toks"), 2).alias("g2"),
        D.ngram_multiset(F.col("toks"), 3).alias("g3"),
    )
    flags = T.gopher_flags(F.col("text"))
    lmm = lm_model(spark, sf_dir)
    sizes, (priors, lls) = nb_model(spark, sf_dir)
    best = nb_best_struct(F.col("bs"), sizes, priors, lls)
    lm_avg = I.score_buckets(F.col("ks"), lmm).cast("double") / F.size("ks")
    signals = grammed.select(
        "doc_id",
        flags["n_words"].alias("n_words"),
        dround(flags["mean_word_len"], 4).alias("mean_word_len"),
        dround(flags["symbol_ratio"], 4).alias("symbol_ratio"),
        flags["n_stopword_kinds"].alias("n_stopword_kinds"),
        flags["ok_word_count"].alias("ok_word_count"),
        flags["ok_word_len"].alias("ok_word_len"),
        flags["ok_symbols"].alias("ok_symbols"),
        flags["ok_stopwords"].alias("ok_stopwords"),
        dround(D.dup_ngram_fraction(F.col("g2")), 4).alias("dup_bigram_frac"),
        dround(D.dup_ngram_fraction(F.col("g3")), 4).alias("dup_trigram_frac"),
        T.lang_guess(F.col("text")).alias("guessed_lang"),
        # docs too short for a bigram have no LM row: NULL, like the
        # standalone query's inner-join absence
        F.when(F.size("ks") > 0, dround(F.exp(-lm_avg), 4)).alias("ppl"),
        F.when(F.size("bs") > 0, best["c"]).alias("nb_pred_lang"),
        F.when(F.size("bs") > 0, best["s"].cast("double")).alias("nb_logp"),
    )
    grams = _substring_gram_index(spark, sf_dir)
    ev = grams.filter(F.col("doc") < _BENCH_CUT).select("pdigest").distinct()
    ct = (
        grams.filter(F.col("doc") >= _BENCH_CUT)
        .join(F.broadcast(ev), "pdigest")
        .groupBy("doc")
        .agg(F.count(F.lit(1)).cast("long").alias("__ct"))
        .select(F.col("doc").alias("doc_id"), "__ct")
    )
    return signals.join(ct, "doc_id", "left").select(
        *[c for c in signals.columns],
        F.coalesce(F.col("__ct"), F.lit(0).cast("long")).alias(
            "contam_windows"
        ),
    )
