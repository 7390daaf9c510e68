"""Dedup queries over the `documents` table, oracle-checked (X1/X2).

Binds operators/dedup.py to the driver's synthetic corpus. Every hash is
the portable md5-derived form (functions.portable_hash64), so DuckDB
reproduces signatures, band collisions, and Jaccard values exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from multichannel_commerce_data_pipeline_spark.functions import (
    dround,
    oracle_dround,
    oracle_hash32,
    oracle_hash64,
)
from multichannel_commerce_data_pipeline_spark.operators import dedup as D
from multichannel_commerce_data_pipeline_spark.operators import text as T
from multichannel_commerce_data_pipeline_spark.queries import query
from multichannel_commerce_data_pipeline_spark.tables import (
    load,
    parallelize_small_scan,
    session_memo,
)

# Shared DuckDB fragments reproducing shingles()/doc_shingles():
# tok → 3-gram distinct shingles per doc → exploded (doc, n_sh, shingle).
_SHINGLE_CTES = r"""
    tok AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents
    ),
    shs AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3 THEN
               list_distinct(list_transform(range(1, len(toks) - 1),
                 i -> concat_ws(' ', toks[i], toks[i + 1], toks[i + 2])))
             ELSE [] END AS sh
      FROM tok
    ),
    ex AS (
      SELECT doc_id AS doc, len(sh) AS n_sh, unnest(sh) AS shingle FROM shs
    )
"""

_JACCARD = "shared / (n_a + n_b - shared)"

_THRESHOLD = 0.14  # chosen so the synthetic corpus yields a non-empty pair set


@query(
    "exact_dedup_docs",
    oracle=r"""
    WITH fp AS (
      SELECT doc_id, source,
             md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint
      FROM documents
    )
    SELECT doc_id, source, fingerprint FROM (
      SELECT doc_id, source, fingerprint,
             ROW_NUMBER() OVER (PARTITION BY fingerprint ORDER BY doc_id) AS rn
      FROM fp
    ) WHERE rn = 1
    """,
)
def exact_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1: exact dedup — one survivor per content fingerprint, chosen
    deterministically (min doc_id) via a keyed row_number, which beats
    dropDuplicates' physical-order-dependent survivor at any scale."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", "source", T.fingerprint(F.col("text")).alias("fingerprint")
    )
    return D.exact_dedup(d, ["fingerprint"], "doc_id")


def _jaccard_oracle(threshold: float, df_cap: int | None) -> str:
    cap_cte = (
        f""",
    rare AS (
      SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {df_cap}
    ),
    exc AS (
      SELECT ex.* FROM ex JOIN rare USING (shingle)
    )"""
        if df_cap is not None
        else """,
    exc AS (SELECT * FROM ex)"""
    )
    return f"""
    WITH {_SHINGLE_CTES}{cap_cte},
    shared_cte AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, {oracle_dround(_JACCARD, 4)} AS jaccard
    FROM shared_cte
    WHERE {_JACCARD} >= {threshold}
    """


# The capped (doc, n_sh, shingle) frame is the corpus's shingle INDEX:
# the exact-Jaccard and containment self-joins each read it from both
# sides plus the df-cap aggregate, and rebuilding it per side
# re-tokenizes the corpus 3-4x per call (4 scans / 14 inlined regexp
# nodes in the un-cached plan — constraint propagation inlines the
# n_sh expression into scan filters on top). Persisted per corpus
# version, hash-partitioned on the join key so neither join side
# re-shuffles.
_CAPPED_SH_CACHE: dict[tuple[str, str], DataFrame] = {}


def _capped_shingle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        from pyspark import StorageLevel

        d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        sh = D._capped_shingles(d, "doc_id", "text", 3, 400).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        sh.count()
        return sh

    return session_memo(spark, _CAPPED_SH_CACHE, sf_dir, build)


@query("jaccard_near_dupes", oracle=_jaccard_oracle(_THRESHOLD, df_cap=400))
def jaccard_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: exact n-gram Jaccard near-dup pairs with a document-frequency
    cap on hot shingles (the scale guard: no boilerplate shingle may
    produce a quadratic candidate partition). Reads the per-corpus
    persisted shingle index, so the self-join's two sides and the cap
    aggregate share ONE tokenization pass."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=_THRESHOLD, df_cap=400,
        shingle_frame=_capped_shingle_index(spark, sf_dir),
    )


def _containment_oracle(threshold: float, df_cap: int) -> str:
    return f"""
    WITH {_SHINGLE_CTES},
    rare AS (
      SELECT shingle FROM ex GROUP BY shingle HAVING COUNT(*) <= {df_cap}
    ),
    exc AS (
      SELECT ex.* FROM ex JOIN rare USING (shingle)
    ),
    shared_cte AS (
      SELECT a.doc AS doc_a, b.doc AS doc_b, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM exc a JOIN exc b ON a.shingle = b.shingle AND a.doc < b.doc
      GROUP BY 1, 2, 3, 4
    ),
    dirs AS (
      SELECT doc_a AS doc, doc_b AS container,
             CAST(shared AS DOUBLE) / n_a AS c
      FROM shared_cte
      UNION ALL
      SELECT doc_b AS doc, doc_a AS container,
             CAST(shared AS DOUBLE) / n_b AS c
      FROM shared_cte
    )
    SELECT doc, container, {oracle_dround("c", 4)} AS containment
    FROM dirs WHERE c >= {threshold}
    """


@query("containment_dupes", oracle=_containment_oracle(0.5, df_cap=400))
def containment_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: asymmetric shingle-containment detection — finds documents
    whose shingle set is >= 50% embedded in another document (quote
    farms, wrapper pages, aggregator chaff). The signal Jaccard misses
    by construction: a short doc fully contained in a long one has
    near-zero Jaccard but containment 1.0. Same df-capped shingle
    equi-join as jaccard_near_dupes (cost Σ df², bounded by the cap);
    one shared-count per unordered pair fans map-side into both
    directed readings, each filtered on its own denominator. Shares
    the per-corpus persisted shingle index with jaccard_near_dupes."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.containment_pairs(
        d, "doc_id", "text", n=3, threshold=0.5, df_cap=400,
        shingle_frame=_capped_shingle_index(spark, sf_dir),
    )


def _mh_keyed_ctes(k: int, bands: int) -> str:
    """Shared oracle CTE chain: shingle md5s -> KM hash pair -> k
    minhash slots -> exploded (doc, band, band-key) rows. Used by both
    the self-join (corpus) and probe-vs-index (incremental) oracles."""
    rows = k // bands
    mins = ",\n        ".join(
        f"MIN(h1 + {j} * h2) AS mh_{j}" for j in range(k)
    )
    band_cases = "\n          ".join(
        f"WHEN {b} THEN [{', '.join(f'mh_{b * rows + r}' for r in range(rows))}]"
        for b in range(bands)
    )
    return f"""{_SHINGLE_CTES},
    hx AS (
      SELECT doc, n_sh, md5(concat('1:', shingle)) AS hex FROM ex
    ),
    hashed AS (
      -- one md5 sliced into both KM hashes, mirroring the engine
      SELECT doc, n_sh,
             CAST(('0x' || substr(hex, 1, 15)) AS BIGINT) AS h1,
             CAST(('0x' || substr(hex, 17, 8)) AS BIGINT) AS h2
      FROM hx
    ),
    mh AS (
      SELECT doc,
        {mins}
      FROM hashed GROUP BY doc
    ),
    keyed AS (
      SELECT doc, b,
        CASE b
          {band_cases}
        END AS bh
      FROM mh, (SELECT unnest(range(0, {bands})) AS b) AS bands_
    )"""


def _minhash_lsh_oracle(k: int, bands: int, threshold: float) -> str:
    return f"""
    WITH {_mh_keyed_ctes(k, bands)},
    cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
      FROM keyed x JOIN keyed y ON x.b = y.b AND x.bh = y.bh
      WHERE x.doc < y.doc
    ),
    shared_cte AS (
      -- verification joins on the 60-bit h1 shingle hash, mirroring the
      -- engine (identical md5-derived values => identical counts)
      SELECT c.doc_a, c.doc_b, a.n_sh AS n_a, b.n_sh AS n_b, COUNT(*) AS shared
      FROM cand c
      JOIN hashed a ON a.doc = c.doc_a
      JOIN hashed b ON b.doc = c.doc_b AND b.h1 = a.h1
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b, {oracle_dround(_JACCARD, 4)} AS jaccard
    FROM shared_cte
    WHERE {_JACCARD} >= {threshold}
    """


@query("minhash_lsh_dupes", oracle=_minhash_lsh_oracle(16, 8, _THRESHOLD))
def minhash_lsh_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: MinHash + banded LSH candidate generation (k=16, 8 bands of
    2), exact-Jaccard verified — the sub-quadratic near-dup path. Band
    keys are the raw minhash value pairs, so DuckDB reproduces the
    candidate set exactly.

    persist stays at the default True: without the cached signature
    frame the md5 pass recomputes for every plan branch — measured
    5.3 s vs 1.5 s warm at sf0.1 in a clean JVM. (An earlier profile
    suggesting the opposite was contaminated: a prior persist=True run
    in the same session leaves its InMemoryRelation in the
    CacheManager, which plan-matches the unpersisted query and hides
    the recompute. A/B persist flags in fresh sessions only.)"""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, n=3, threshold=_THRESHOLD
    )


def _incremental_lsh_oracle(k: int, bands: int, threshold: float) -> str:
    return f"""
    WITH {_mh_keyed_ctes(k, bands)},
    cand AS (
      SELECT DISTINCT x.doc AS new_doc, y.doc AS dup_of
      FROM keyed x JOIN keyed y ON x.b = y.b AND x.bh = y.bh
      WHERE x.doc % 2 = 1 AND y.doc % 2 = 0
    ),
    shared_cte AS (
      SELECT c.new_doc, c.dup_of, a.n_sh AS n_a, b.n_sh AS n_b,
             COUNT(*) AS shared
      FROM cand c
      JOIN hashed a ON a.doc = c.new_doc
      JOIN hashed b ON b.doc = c.dup_of AND b.h1 = a.h1
      GROUP BY 1, 2, 3, 4
    )
    SELECT new_doc, dup_of, {oracle_dround(_JACCARD, 4)} AS jaccard
    FROM shared_cte
    WHERE {_JACCARD} >= {threshold}
    """


@query("incremental_lsh_dedup", oracle=_incremental_lsh_oracle(16, 8, _THRESHOLD))
def incremental_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: incremental near-dup detection — a NEW ingest batch (odd
    doc_ids) probed against the EXISTING corpus signature index (even
    doc_ids) via band-key join, never an index self-join or corpus
    rescan. This is how continuous ingest deduplicates against a
    100 TB corpus: the index (``minhash_lsh_index``) is persisted and
    bucketed by band key at deployment, so each batch pays only its own
    signature pass plus a join that prunes to the collided buckets;
    here both sides are derived in-plan from the parity split so the
    oracle can re-create the exact same state."""
    idx, new_sig = _lsh_signature_frames(spark, sf_dir)
    return D.minhash_lsh_probe(idx, new_sig, k=16, bands=8, threshold=_THRESHOLD)


_LSH_SIG_CACHE: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _lsh_signature_frames(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(index, batch) signature frames for incremental_lsh_dedup, built
    once per sf_dir. Both persist (MEMORY_AND_DISK): each is read twice
    per execution (band keys + verification join) — standing in for the
    PERSISTED index table a deployment reads instead of recomputing.
    Caching the DataFrames themselves (not just relying on CacheManager
    plan-matching) also skips rebuilding the signature expression trees
    per call (~1 s of plan-construction time)."""

    def build() -> tuple[DataFrame, DataFrame]:
        from pyspark import StorageLevel

        d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        corpus = d.filter(F.col("doc_id") % 2 == 0)
        batch = d.filter(F.col("doc_id") % 2 == 1)
        idx = D.minhash_lsh_index(corpus, "doc_id", "text", k=16, n=3).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        new_sig = D.minhash_lsh_index(batch, "doc_id", "text", k=16, n=3).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        return (idx, new_sig)

    return session_memo(spark, _LSH_SIG_CACHE, sf_dir, build)


def _simhash_oracle(bits: int) -> str:
    return f"""
    WITH tokx AS (
      SELECT doc_id AS doc, unnest(regexp_extract_all(lower(text), '\\S+')) AS token
      FROM documents
    ),
    h AS (SELECT doc, {oracle_hash64("token", 0)} AS h FROM tokx),
    votes AS (
      SELECT doc, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(0, {bits})) AS b) AS bits_
      GROUP BY doc, b
    )
    SELECT doc,
           CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT)
             AS simhash
    FROM votes GROUP BY doc
    """


@query("simhash_fingerprints", oracle=_simhash_oracle(16))
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: SimHash fingerprints (16-bit) — near-duplicates land at small
    Hamming distance; one explode + one group-by."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.simhash(d, "doc_id", "text", bits=16)


def _simhash_pairs_oracle(bits: int, bands: int, max_hamming: int) -> str:
    rows = bits // bands
    mask = (1 << rows) - 1
    return f"""
    WITH tokx AS (
      SELECT doc_id AS doc, unnest(regexp_extract_all(lower(text), '\\S+')) AS token
      FROM documents
    ),
    h AS (SELECT doc, {oracle_hash64("token", 0)} AS h FROM tokx),
    votes AS (
      SELECT doc, b,
             SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
      FROM h, (SELECT unnest(range(0, {bits})) AS b) AS bits_
      GROUP BY doc, b
    ),
    sims AS (
      SELECT doc,
             CAST(SUM(CASE WHEN v > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END)
                  AS BIGINT) AS simhash
      FROM votes GROUP BY doc
    ),
    keyed AS (
      SELECT doc, simhash, b, (simhash >> (b * {rows})) & {mask} AS bk
      FROM sims, (SELECT unnest(range(0, {bands})) AS b) AS bands_
    ),
    cand AS (
      SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b,
             x.simhash AS sa, y.simhash AS sb
      FROM keyed x JOIN keyed y ON x.b = y.b AND x.bk = y.bk
      WHERE x.doc < y.doc
    )
    SELECT doc_a, doc_b, bit_count(xor(sa, sb)) AS hamming
    FROM cand WHERE bit_count(xor(sa, sb)) <= {max_hamming}
    """


@query("simhash_near_dupes", oracle=_simhash_pairs_oracle(16, 4, 3))
def simhash_near_dupes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2: SimHash near-dup pairs — banded Hamming search (4 bands of 4
    bits; Hamming ≤ 3 must share a band by pigeonhole, so recall at the
    bound is exactly 1). Candidates from a band equi-join shipping only
    (doc, fingerprint) longs, verified with popcount of the XOR."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.simhash_pairs(
        d, "doc_id", "text", bits=16, bands=4, max_hamming=3
    )


def _clusters_oracle() -> str:
    pair_sql = _minhash_lsh_oracle(16, 8, _THRESHOLD)
    return f"""
    WITH RECURSIVE
    prs AS (SELECT doc_a, doc_b FROM ({pair_sql})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT u AS doc, MIN(v) AS cluster_id FROM reach GROUP BY u
    """


@query("dedup_clusters", oracle=_clusters_oracle())
def dedup_clusters_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X2 composed: transitive duplicate CLUSTERS over the LSH
    near-dup pairs — min-label propagation engine-side (the iterative
    connected-components algorithm; each round one join + one group-by),
    a recursive transitive closure oracle-side. The cluster id is the
    group's min doc id, i.e. the deterministic survivor key for
    keep-one-per-cluster dedup."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, n=3, threshold=_THRESHOLD
    )
    return D.dedup_clusters(pairs)


@query("dedup_clusters_star", oracle=_clusters_oracle())
def dedup_clusters_star_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planet-scale clustering path on the same LSH pairs:
    large-star/small-star contraction (O(log^2 n) rounds independent of
    graph diameter — what :func:`operators.dedup.dedup_clusters` falls
    back to when a component outlives its round budget). Identical
    labels to min-label propagation, so the oracle is the same
    recursive transitive closure."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, n=3, threshold=_THRESHOLD
    )
    return D.star_contract(pairs)


_FUZZY_PREFIX = 16
_FUZZY_DIST = 2


@query(
    "fuzzy_name_pairs",
    oracle=f"""
    WITH base AS (
      SELECT c_custkey AS rid, c_name AS nm, c_nationkey,
             substr(c_name, 1, {_FUZZY_PREFIX}) AS pfx
      FROM customer
    )
    SELECT a.rid AS id_a, b.rid AS id_b,
           levenshtein(a.nm, b.nm) AS edit_dist
    FROM base a JOIN base b
      ON a.c_nationkey = b.c_nationkey AND a.pfx = b.pfx AND a.rid < b.rid
    WHERE levenshtein(a.nm, b.nm) <= {_FUZZY_DIST}
    """,
)
def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 (cheap path): blocked Levenshtein fuzzy matching on customer
    names — the buyer-name dedup the reference's wholesale channel would
    need. Blocking key = (nation, 16-char name prefix); exact edit
    distance ≤ 2 verifies within blocks, never across the full n²."""
    c = load(spark, sf_dir, "customer")
    return D.blocked_levenshtein_pairs(
        c,
        "c_custkey",
        "c_name",
        ["c_nationkey"],
        prefix_len=_FUZZY_PREFIX,
        max_dist=_FUZZY_DIST,
    )


def _dedup_corpus_oracle() -> str:
    return f"""
    WITH RECURSIVE
    prs AS (SELECT doc_a, doc_b FROM ({_minhash_lsh_oracle(16, 8, _THRESHOLD)})),
    edges AS (
      SELECT doc_a AS u, doc_b AS v FROM prs
      UNION
      SELECT doc_b AS u, doc_a AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    drops AS (
      SELECT u AS doc FROM reach GROUP BY u HAVING u <> MIN(v)
    )
    SELECT doc_id, source FROM documents
    WHERE doc_id NOT IN (SELECT doc FROM drops)
    """


@query("dedup_corpus", oracle=_dedup_corpus_oracle())
def dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The terminal dedup artifact: the corpus with every non-survivor
    of a transitive near-dup cluster removed (survivor = cluster min
    doc id). Composes LSH pairs → connected components → a broadcast
    anti-join of the (tiny) drop set against the corpus — the full
    keep-list pipeline a training-data run ships."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    pairs = D.minhash_lsh_pairs(
        d, "doc_id", "text", k=16, bands=8, n=3, threshold=_THRESHOLD
    )
    clusters = D.dedup_clusters(pairs)
    drops = clusters.filter(F.col("doc") != F.col("cluster_id")).select(
        F.col("doc").alias("doc_id")
    )
    return load(spark, sf_dir, "documents").join(
        F.broadcast(drops), "doc_id", "left_anti"
    ).select("doc_id", "source")


_DECON_N = 6
_BENCH_CUT = 20  # doc_id < 20 plays the held-out benchmark set


@query(
    "benchmark_decontamination",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(CASE WHEN len(t) >= {_DECON_N} THEN
               list_distinct(list_transform(range(1, len(t) - {_DECON_N} + 2),
                 i -> array_to_string(t[i:i+{_DECON_N}-1], ' ')))
             ELSE [] END) AS g
      FROM toks
    ),
    bench AS (SELECT DISTINCT g FROM grams WHERE doc_id < {_BENCH_CUT}),
    hits AS (
      SELECT grams.doc_id, COUNT(*) AS n_contaminated_ngrams
      FROM grams JOIN bench USING (g)
      WHERE grams.doc_id >= {_BENCH_CUT}
      GROUP BY grams.doc_id
    )
    SELECT doc_id AS doc, n_contaminated_ngrams FROM hits
    """,
)
def benchmark_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination: flag training docs sharing any {n}-gram with a
    held-out benchmark slice (docs 0..19 stand in for the eval set) —
    the hygiene pass run before every pre-training job. The benchmark
    reduces to a tiny DISTINCT n-gram frame and is broadcast; the train
    side stays one narrow pass (shingle map-side → broadcast join), so
    the corpus never shuffles and cost scales with scan + hits."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    bench = d.filter(F.col("doc_id") < _BENCH_CUT)
    train = d.filter(F.col("doc_id") >= _BENCH_CUT)
    return D.decontaminate_flags(train, bench, n=_DECON_N)


# Hoisted so the curation signal mart can embed the identical
# repetition SQL as a sub-select (single-sourced).
REPETITION_ORACLE = rf"""
    WITH toks AS (
      SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS t FROM documents
    ),
    grams AS (
      SELECT doc_id,
        CASE WHEN len(t) >= 2 THEN
          list_transform(range(1, len(t)), i -> array_to_string(t[i:i+1], ' '))
        ELSE [] END AS g2,
        CASE WHEN len(t) >= 3 THEN
          list_transform(range(1, len(t) - 1), i -> array_to_string(t[i:i+2], ' '))
        ELSE [] END AS g3
      FROM toks
    )
    SELECT doc_id,
      {oracle_dround("CASE WHEN len(g2) > 0 THEN 1.0 - CAST(len(list_distinct(g2)) AS DOUBLE) / len(g2) ELSE 0.0 END", 4)} AS dup_bigram_frac,
      {oracle_dround("CASE WHEN len(g3) > 0 THEN 1.0 - CAST(len(list_distinct(g3)) AS DOUBLE) / len(g3) ELSE 0.0 END", 4)} AS dup_trigram_frac
    FROM grams
    """


@query("repetition_quality", oracle=REPETITION_ORACLE)
def repetition_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition (Gopher's duplicate-n-gram rules):
    fraction of bigram/trigram occurrences that are repeats. Staged
    projections (tokens → multisets → fractions) so each expensive
    array expression materializes once per row; zero shuffles."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    toked = d.select("doc_id", T.tokens(F.col("text")).alias("toks"))
    grammed = toked.select(
        "doc_id",
        D.ngram_multiset(F.col("toks"), 2).alias("g2"),
        D.ngram_multiset(F.col("toks"), 3).alias("g3"),
    )
    return grammed.select(
        "doc_id",
        dround(D.dup_ngram_fraction(F.col("g2")), 4).alias("dup_bigram_frac"),
        dround(D.dup_ngram_fraction(F.col("g3")), 4).alias("dup_trigram_frac"),
    )


@query(
    "passage_dedup_docs",
    oracle=r"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS k
      FROM ws
    ),
    pass AS (
      SELECT doc_id, k AS pidx,
             array_to_string(list_slice(w, k * 10 + 1, k * 10 + 10), ' ')
               AS passage
      FROM idx
    ),
    ranked AS (
      SELECT doc_id, pidx, passage,
             ROW_NUMBER() OVER (PARTITION BY passage
                                ORDER BY doc_id, pidx) AS rn
      FROM pass
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(passage, ' ' ORDER BY pidx) AS clean_text
      FROM ranked WHERE rn = 1 GROUP BY doc_id
    )
    SELECT ws.doc_id,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT) AS n_passages,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT)
             - CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_dropped,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM ws LEFT JOIN agg USING (doc_id)
    """,
)
def passage_dedup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+: passage-level exact dedup (Lee et al. 2022 style) — remove
    every repeated 10-word passage corpus-wide except its first
    occurrence, rebuilding each document from its survivors. Catches
    the cross-document boilerplate that doc-level fingerprint dedup
    (exact_dedup_docs) cannot. The dedup decision shuffles only
    (doc, pidx, md5) triples; text never leaves the map side."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.passage_dedup(d, "doc_id", "text", passage_words=10)


@query(
    "boilerplate_line_removal",
    oracle=r"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    idx AS (
      SELECT doc_id, w,
             unnest(range(CAST(ceil(len(w) / 10.0) AS BIGINT))) AS k
      FROM ws
    ),
    ln AS (
      SELECT doc_id, k AS lidx,
             array_to_string(list_slice(w, k * 10 + 1, k * 10 + 10), ' ')
               AS line
      FROM idx
    ),
    dfq AS (
      SELECT line, COUNT(DISTINCT doc_id) AS dfreq FROM ln GROUP BY line
    ),
    kept AS (
      SELECT ln.doc_id, ln.lidx, ln.line
      FROM ln JOIN dfq USING (line) WHERE dfq.dfreq <= 2
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, ' ' ORDER BY lidx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT ws.doc_id,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT) AS n_lines,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT)
             - CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM ws LEFT JOIN agg USING (doc_id)
    """,
)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1+: C4/CCNet-style corpus-frequency boilerplate removal — any
    10-word line appearing verbatim in MORE THAN 2 distinct documents
    is removed from every document (no survivor), and each document is
    rebuilt from its surviving lines. Complements the survivor-based
    dedup family: passage/substring dedup keep a first occurrence;
    boilerplate removal kills the over-threshold line everywhere. The
    df decision shuffles only (doc, lidx, md5) triples; the removal cut
    is a broadcast anti-join; line text never leaves the map side."""
    d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    return D.boilerplate_lines(
        d, "doc_id", "text", line_words=10, df_threshold=2
    )


def _golden_oracle() -> str:
    return f"""
    WITH RECURSIVE
    base AS (
      SELECT c_custkey AS rid, c_name AS nm, c_nationkey, c_acctbal,
             substr(c_name, 1, {_FUZZY_PREFIX}) AS pfx
      FROM customer
    ),
    prs AS (
      SELECT a.rid AS ia, b.rid AS ib
      FROM base a JOIN base b
        ON a.c_nationkey = b.c_nationkey AND a.pfx = b.pfx AND a.rid < b.rid
      WHERE levenshtein(a.nm, b.nm) <= {_FUZZY_DIST}
    ),
    edges AS (
      SELECT ia AS u, ib AS v FROM prs
      UNION
      SELECT ib AS u, ia AS v FROM prs
    ),
    reach(u, v) AS (
      SELECT u, u FROM (SELECT DISTINCT u FROM edges)
      UNION
      SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    asg AS (SELECT u AS rid, MIN(v) AS cid FROM reach GROUP BY u),
    mem AS (
      SELECT b.rid, b.c_acctbal, COALESCE(a.cid, b.rid) AS cluster_id
      FROM base b LEFT JOIN asg a ON b.rid = a.rid
    ),
    golden AS (
      SELECT cluster_id, rid, c_acctbal FROM (
        SELECT cluster_id, rid, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY cluster_id
                                  ORDER BY c_acctbal DESC, rid) AS rn
        FROM mem
      ) WHERE rn = 1
    )
    SELECT m.cluster_id,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           MIN(g.rid) AS golden_custkey,
           MIN(g.c_acctbal) AS golden_acctbal
    FROM mem m JOIN golden g ON m.cluster_id = g.cluster_id
    GROUP BY m.cluster_id
    """


_IDENTITY_CACHE: dict[tuple[str, str], DataFrame] = {}


def _identity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc, cluster_id) over the blocked-Levenshtein customer match
    graph — the identity map, built once per sf_dir and persisted
    repartitioned on ``doc`` so the serving join needs no re-exchange
    of the cached side."""

    def build() -> DataFrame:
        c = load(spark, sf_dir, "customer").select(
            "c_custkey", "c_name", "c_nationkey"
        )
        pairs = D.blocked_levenshtein_pairs(
            c, "c_custkey", "c_name", ["c_nationkey"],
            prefix_len=_FUZZY_PREFIX, max_dist=_FUZZY_DIST,
        ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))
        labels = D.dedup_clusters(pairs).repartition(32, "doc").persist()
        labels.count()
        return labels

    return session_memo(spark, _IDENTITY_CACHE, sf_dir, build)


@query("entity_golden_record", oracle=_golden_oracle())
def entity_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X-surface composed end-to-end entity resolution — the
    cross-channel customer-identity problem a multichannel warehouse
    actually has (the same buyer arrives via wholesale, shopify, and
    livestream feeds with name variants): blocking + Levenshtein
    match (fuzzy_name_pairs' operator) -> connected components over the
    match graph (dedup_clusters' operator, min-label with star-contract
    fallback) -> one GOLDEN RECORD per identity cluster, chosen by a
    deterministic survivorship rule (max acctbal, then min custkey —
    the argmax is a partial-aggregated max(struct), no window over the
    full table). Singletons are their own cluster via the left join +
    coalesce, so every customer appears exactly once downstream.
    Scale: blocking bounds the pair join, CC is the O(log^2 n)
    machinery already probed at 200k-node chains (SCALING.md), and the
    golden pick + rollup are one partial-aggregated group-by each. The
    identity-cluster map is a corpus-version artifact cached per
    sf_dir (persisted repartitioned on its join key — the same
    storage-investment rule as the LSH signature index): serving the
    golden view re-runs only the join + survivorship rollup, never the
    match-pair generation or CC."""
    c = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal"
    )
    asg = _identity_clusters(spark, sf_dir)
    mem = c.join(asg, c.c_custkey == asg.doc, "left").select(
        F.col("c_custkey").alias("rid"),
        "c_acctbal",
        F.coalesce(F.col("cluster_id"), F.col("c_custkey")).alias("cluster_id"),
    )
    picked = mem.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max(
            F.struct(
                F.col("c_acctbal").alias("a"),
                (-F.col("rid")).alias("negid"),
            )
        ).alias("m"),
    )
    return picked.select(
        "cluster_id",
        "n_members",
        (-F.col("m.negid")).cast("long").alias("golden_custkey"),
        F.col("m.a").alias("golden_acctbal"),
    )


# Fellegi-Sunter field comparisons between the customer and supplier
# registries. m/u are no longer hand-set constants: fs_em_fit learns
# them in-engine from the blocked pairs (operators/linkage.fs_em_fit,
# 2 unrolled DECIMAL-quantized EM rounds), and fs_record_linkage
# consumes the fitted model — the same trained-artifact pattern as
# kmeans_centroid_fit retiring its pre-trained-centroid caveat.
_FS_FIELD_NAMES = ("regno", "band", "sign")
_FS_EM_ITERS = 2
_FS_EM_M0, _FS_EM_U0, _FS_EM_P0 = 0.8, 0.1, 0.1
_FS_LINK_T = 2.0
_FS_POSSIBLE_T = 0.5

_FS_CONFORM_CTES = """cust AS (
      SELECT c_custkey, c_nationkey,
             CAST(substr(c_name, 10) AS BIGINT) AS regno,
             CAST(floor(c_acctbal / 500.0) AS BIGINT) AS band,
             (c_acctbal >= 0) AS sign
      FROM customer
    ),
    supp AS (
      SELECT s_suppkey, s_nationkey,
             CAST(substr(s_name, 10) AS BIGINT) AS regno,
             CAST(floor(s_acctbal / 500.0) AS BIGINT) AS band,
             (s_acctbal >= 0) AS sign
      FROM supplier
    )"""

# Agreement-pattern counts: the EM fit's sufficient statistic (≤2^3
# rows), reduced from the nation-blocked pair frame by one group-by.
_FS_PAT_CTE = (
    _FS_CONFORM_CTES
    + """,
    pat AS (
      SELECT [CASE WHEN c.regno = s.regno THEN 1 ELSE 0 END,
              CASE WHEN c.band = s.band THEN 1 ELSE 0 END,
              CASE WHEN c.sign = s.sign THEN 1 ELSE 0 END] AS a,
             COUNT(*) AS cnt
      FROM cust c JOIN supp s ON c.c_nationkey = s.s_nationkey
      GROUP BY 1
    )"""
)


def _fs_conform(df, id_col, name_col, nat_col, bal_col):
    return df.select(
        F.col(id_col),
        F.col(nat_col).alias("nk"),
        F.substring(F.col(name_col), 10, 18).cast("long").alias("regno"),
        F.floor(F.col(bal_col) / 500.0).cast("long").alias("band"),
        (F.col(bal_col) >= 0).alias("sign"),
    )


def _fs_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    cust = _fs_conform(
        load(spark, sf_dir, "customer"),
        "c_custkey", "c_name", "c_nationkey", "c_acctbal",
    )
    supp = _fs_conform(
        load(spark, sf_dir, "supplier"),
        "s_suppkey", "s_name", "s_nationkey", "s_acctbal",
    ).withColumnsRenamed(
        {"regno": "s_regno", "band": "s_band", "sign": "s_sign"}
    )
    return cust, supp


# The fitted (m, u, p) model is a per-corpus-version artifact like the
# k-means centroids: the pattern reduction + 2 EM rounds run once per
# (session, sf_dir); scoring reads the persisted 1-row frame.
_FS_MODEL_CACHE: dict[tuple[str, str], DataFrame] = {}
_FS_CONST_CACHE: dict[tuple[str, str], tuple[list, list, float]] = {}


def _fs_model(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        from pyspark import StorageLevel

        from multichannel_commerce_data_pipeline_spark.operators.linkage import (
            fs_em_fit,
        )

        cust, supp = _fs_sides(spark, sf_dir)
        pairs = cust.join(F.broadcast(supp), "nk")
        patterns = (
            pairs.select(
                F.array(
                    (F.col("regno") == F.col("s_regno")).cast("int"),
                    (F.col("band") == F.col("s_band")).cast("int"),
                    (F.col("sign") == F.col("s_sign")).cast("int"),
                ).alias("a")
            )
            .groupBy("a")
            .agg(F.count(F.lit(1)).alias("cnt"))
            # ≤2^3 rows; persisted because the unrolled EM plan reads
            # the pattern frame several times per round and Spark has
            # no DataFrame-level CSE.
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        patterns.count()
        params = fs_em_fit(
            patterns,
            n_fields=len(_FS_FIELD_NAMES),
            n_iters=_FS_EM_ITERS,
            m0=_FS_EM_M0,
            u0=_FS_EM_U0,
            p0=_FS_EM_P0,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        params.count()
        patterns.unpersist()
        return params

    return session_memo(spark, _FS_MODEL_CACHE, sf_dir, build)


def _fs_fitted(spark: SparkSession, sf_dir: str) -> tuple[list, list, float]:
    """Collected fitted constants (bounded model collect: 2 arrays of 3
    doubles + a prior) for driver-side weight folding."""
    def build() -> tuple[list, list, float]:
        row = _fs_model(spark, sf_dir).collect()[0]
        return (list(row["m"]), list(row["u"]), float(row["p"]))

    return session_memo(spark, _FS_CONST_CACHE, sf_dir, build)


def _fs_em_chain() -> str:
    from multichannel_commerce_data_pipeline_spark.operators.linkage import (
        oracle_fs_em_chain,
    )

    return oracle_fs_em_chain(
        _FS_PAT_CTE,
        n_fields=len(_FS_FIELD_NAMES),
        n_iters=_FS_EM_ITERS,
        m0=_FS_EM_M0,
        u0=_FS_EM_U0,
        p0=_FS_EM_P0,
    )


def _fs_em_oracle() -> str:
    return f"""
    WITH {_fs_em_chain()}
    SELECT CASE i WHEN 1 THEN 'regno' WHEN 2 THEN 'band'
                  ELSE 'sign' END AS field,
           m[i] AS m_fit, u[i] AS u_fit, p AS match_prior
    FROM e{_FS_EM_ITERS} CROSS JOIN sp
    """


@query("fs_em_fit", oracle=_fs_em_oracle())
def fs_em_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14: unsupervised Fellegi-Sunter parameter ESTIMATION in-engine
    (Winkler 1988 EM) — retires the r7 verdict's "m/u are a deployment
    swap" caveat the same way kmeans_centroid_fit retired the
    pre-trained-centroid one. Conditional independence makes the
    agreement-pattern counts a sufficient statistic, so one partial-
    aggregated group-by reduces the nation-blocked pair frame (the only
    O(pairs) step, shared with the scorer) to ≤2^3 rows, and the two
    unrolled EM rounds run over that bounded frame: broadcast E-step,
    k-bounded posexplode M-step, every update DECIMAL-quantized to
    9 dp so the DuckDB oracle replays the fit to a hash match
    (operators/linkage.fs_em_fit). On the synthetic registries the fit
    discovers the band+sign co-agreement cluster as its match class —
    what unlabeled EM converges to here; the point driver-checked is
    the learning machinery, not gold labels. Output: one row per field
    with fitted m, u, and the shared match prior."""
    params = _fs_model(spark, sf_dir)
    names = F.array(*[F.lit(n) for n in _FS_FIELD_NAMES])
    return params.select(
        "p", F.posexplode(F.arrays_zip("m", "u")).alias("i", "mu")
    ).select(
        F.element_at(names, F.col("i") + 1).alias("field"),
        F.col("mu.m").alias("m_fit"),
        F.col("mu.u").alias("u_fit"),
        F.col("p").alias("match_prior"),
    )


# Degenerate-fit guard (splink-style): an EM fit that quantizes a u_i
# to 0.0 (or an m_i to 1.0) at 9 dp would make the log-odds infinite —
# CPython math.log raises, DuckDB ln() errors on the matching cast.
# Both engines clamp the fitted probabilities into [_FS_EPS, 1-_FS_EPS]
# BEFORE the logs, with the same decimal literals so the folded doubles
# stay bit-identical (both sides parse '1e-9'/'0.999999999' to the same
# nearest double; no arithmetic like 1-eps that could differ by an
# ulp). No-op on non-degenerate fits — the current registries' fitted
# m/u sit well inside the clamp.
_FS_EPS_LO = "1e-9"
_FS_EPS_HI = "0.999999999"


def _fs_clamp_sql(expr: str) -> str:
    return f"LEAST(GREATEST({expr}, {_FS_EPS_LO}), {_FS_EPS_HI})"


def _fs_clamp_py(x: float) -> float:
    return min(max(x, float(_FS_EPS_LO)), float(_FS_EPS_HI))


def _fs_oracle() -> str:
    n_agree = (
        "(CASE WHEN c.regno = s.regno THEN 1 ELSE 0 END"
        " + CASE WHEN c.band = s.band THEN 1 ELSE 0 END"
        " + CASE WHEN c.sign = s.sign THEN 1 ELSE 0 END)"
    )
    score = (
        "(0.0"
        " + CASE WHEN c.regno = s.regno THEN wa[1] ELSE wd[1] END"
        " + CASE WHEN c.band = s.band THEN wa[2] ELSE wd[2] END"
        " + CASE WHEN c.sign = s.sign THEN wa[3] ELSE wd[3] END)"
    )
    return f"""
    WITH {_fs_em_chain()},
    wts AS (
      SELECT list({oracle_dround('ln(mi / ui)', 6)} ORDER BY i) AS wa,
             list({oracle_dround('ln((1.0 - mi) / (1.0 - ui))', 6)} ORDER BY i) AS wd
      FROM (SELECT i, {_fs_clamp_sql('m[i]')} AS mi, {_fs_clamp_sql('u[i]')} AS ui
            FROM e{_FS_EM_ITERS} CROSS JOIN sp)
    ),
    scored AS (
      SELECT c.c_custkey, s.s_suppkey,
             {oracle_dround(score, 6)} AS score,
             CAST({n_agree} AS BIGINT) AS n_agree
      FROM cust c JOIN supp s ON c.c_nationkey = s.s_nationkey
      CROSS JOIN wts
    )
    SELECT c_custkey, s_suppkey, score, n_agree,
           CASE WHEN score >= {_FS_LINK_T!r} THEN 'link'
                ELSE 'possible' END AS decision
    FROM scored WHERE score >= {_FS_POSSIBLE_T!r}
    """


@query("fs_record_linkage", oracle=_fs_oracle())
def fs_record_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X14 probabilistic half: Fellegi-Sunter record linkage between
    the customer and supplier registries (the cross-table "is this the
    same business entity" question a multichannel warehouse asks when
    one party appears as both buyer and vendor). Candidate pairs come
    from nation blocking (never all-pairs); each pair scores the SUM
    of per-field log-odds under the EM-FITTED model (fs_em_fit's
    per-corpus artifact — no hand-set m/u anywhere): agreement on a
    field adds ln(m/u), disagreement adds ln((1-m)/(1-u)), thresholds
    split link / possible. Fitted probabilities are clamped into
    [1e-9, 1-1e-9] on both engines before the logs (_fs_clamp_py /
    _fs_clamp_sql) so a degenerate fit cannot blow up either ln(). The ln() runs driver-side on the collected
    3-field fit and is quantized with functions.py_dround, so both
    engines fold bit-identical double literals into the scoring plan
    (CPython math.log and DuckDB ln() are the same libm on this host
    — verified bit-equal over 200k samples — and the quantization
    removes even last-ulp exposure). Scoring is map-side arithmetic on
    the pair frame: the only shuffle is the blocking join itself, and
    the pattern reduction feeding the fit rides the same join."""
    import math

    from multichannel_commerce_data_pipeline_spark.functions import py_dround
    from multichannel_commerce_data_pipeline_spark.operators.linkage import (
        fs_score_from_weights,
    )

    m, u, p = _fs_fitted(spark, sf_dir)
    m = [_fs_clamp_py(v) for v in m]
    u = [_fs_clamp_py(v) for v in u]
    cust, supp = _fs_sides(spark, sf_dir)
    agree_cols = [
        F.col("regno") == F.col("s_regno"),
        F.col("band") == F.col("s_band"),
        F.col("sign") == F.col("s_sign"),
    ]
    weighted = [
        (
            agree_cols[i],
            py_dround(math.log(m[i] / u[i]), 6),
            py_dround(math.log((1.0 - m[i]) / (1.0 - u[i])), 6),
        )
        for i in range(len(_FS_FIELD_NAMES))
    ]
    n_agree = sum(
        F.when(a, 1).otherwise(0) for a in agree_cols
    ).cast("long")
    scored = cust.join(F.broadcast(supp), "nk").select(
        "c_custkey",
        "s_suppkey",
        dround(fs_score_from_weights(weighted), 6).alias("score"),
        n_agree.alias("n_agree"),
    )
    return scored.filter(F.col("score") >= _FS_POSSIBLE_T).select(
        "c_custkey", "s_suppkey", "score", "n_agree",
        F.when(F.col("score") >= _FS_LINK_T, "link")
        .otherwise("possible")
        .alias("decision"),
    )


# Substring-dedup gram index, persisted per corpus version and
# hash-partitioned on the window digest (the storage-investment rule):
# the survivor aggregate and the non-survivor mark join both consume it
# on that key, so neither pays an exchange, and the tokenize→hash
# subtree executes once instead of once per consumer (Spark has no
# DataFrame-level CSE).
_SUBSTR_GRAM_CACHE: dict[tuple[str, str], DataFrame] = {}
_SUBSTR_MIN_WORDS = 8


def _substring_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    def build() -> DataFrame:
        from pyspark import StorageLevel

        d = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
        g = D.substring_grams(
            D.doc_words(d, "doc_id", "text"), _SUBSTR_MIN_WORDS
        )
        n_parts = spark.sparkContext.defaultParallelism
        g = g.repartition(n_parts, "pdigest").persist(
            StorageLevel.MEMORY_AND_DISK
        )
        g.count()
        return g

    return session_memo(spark, _SUBSTR_GRAM_CACHE, sf_dir, build)


# The spans pipeline as shared SQL fragments: every substring query
# (the dedup span report, the rewrite, and substring decontamination)
# verifies against the identical gram + islands oracle text, so a
# semantics drift in one shows up as a hash mismatch in all.
_SUBSTR_WS_GRAMS = rf"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    grams AS (
      SELECT doc_id, i AS pos,
             array_to_string(
               list_slice(w, i, i + {_SUBSTR_MIN_WORDS - 1}), ' ') AS g
      FROM ws, LATERAL unnest(
        generate_series(1, greatest(len(w) - {_SUBSTR_MIN_WORDS - 1}, 0))
      ) AS t(i)
    )"""

# gaps-and-islands over a `starts(doc_id, pos)` CTE -> spans(doc_id, s, e)
_SUBSTR_ISLANDS_TAIL = rf""",
    flagged AS (
      SELECT doc_id, pos,
             CASE WHEN pos - LAG(pos) OVER (PARTITION BY doc_id
                                            ORDER BY pos)
                       <= {_SUBSTR_MIN_WORDS}
                  THEN 0 ELSE 1 END AS brk
      FROM starts
    ),
    islands AS (
      SELECT doc_id, pos,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS isl
      FROM flagged
    ),
    spans AS (
      SELECT doc_id, MIN(pos) AS s,
             MAX(pos) + {_SUBSTR_MIN_WORDS - 1} AS e
      FROM islands GROUP BY doc_id, isl
    )
"""

_SUBSTR_SPAN_CTES = (
    _SUBSTR_WS_GRAMS
    + rf""",
    marked AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY g) AS c,
             ROW_NUMBER() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
      FROM grams
    ),
    starts AS (
      SELECT doc_id, pos FROM marked WHERE c >= 2 AND rn > 1
    )"""
    + _SUBSTR_ISLANDS_TAIL
)

# final projection shared by the span-report queries
_SUBSTR_SPAN_SELECT = r"""
    SELECT sp.doc_id,
           CAST(sp.s AS BIGINT) AS span_start,
           CAST(sp.e AS BIGINT) AS span_end,
           CAST(sp.e - sp.s + 1 AS BIGINT) AS span_words,
           array_to_string(list_slice(ws.w, sp.s, sp.e), ' ') AS span_text
    FROM spans sp JOIN ws USING (doc_id)
    """


@query(
    "substring_dedup_spans",
    oracle=_SUBSTR_SPAN_CTES + _SUBSTR_SPAN_SELECT,
)
def substring_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1++: exact-substring dedup at arbitrary granularity — the
    actual Lee et al. 2022 ExactSubstr semantics (every duplicated
    substring of >= 8 words, removed at all but its globally-first
    occurrence), where passage_dedup_docs is the fixed-boundary
    approximation that misses spans straddling a passage cut. Emits
    the maximal removable (doc_id, span_start, span_end, span_words,
    span_text) spans. The reference algorithm's corpus-wide suffix
    array is replaced by a sharded hash group-by over sliding-window
    digests + a per-document gaps-and-islands coalesce — no global
    sort, no all-pairs, text never shuffles (operators/dedup.py
    substring_dedup_spans has the full 100 TB shape)."""
    grams = _substring_gram_index(spark, sf_dir)
    # no fan-out repartition here: the words frame only feeds the final
    # span re-slice join (the compute-heavy gram build happens inside
    # the persisted index), so an extra round-robin exchange of the
    # full text would be pure cost
    words = D.doc_words(load(spark, sf_dir, "documents"), "doc_id", "text")
    return D.substring_dedup_spans(grams, words, _SUBSTR_MIN_WORDS).select(
        F.col("doc").alias("doc_id"),
        "span_start",
        "span_end",
        "span_words",
        "span_text",
    )


@query(
    "substring_dedup_rewrite",
    oracle=_SUBSTR_SPAN_CTES
    + r"""
    , kept AS (
      SELECT ws.doc_id, string_agg(ws.w[i], ' ' ORDER BY i) AS clean_text,
             COUNT(*) AS n_kept
      FROM ws, LATERAL unnest(generate_series(1, len(ws.w))) AS t(i)
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = ws.doc_id AND i BETWEEN sp.s AND sp.e
      )
      GROUP BY ws.doc_id
    )
    SELECT ws.doc_id,
           CAST(len(ws.w) AS BIGINT) AS n_words,
           CAST(len(ws.w) - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(kept.clean_text, '') AS clean_text
    FROM ws LEFT JOIN kept USING (doc_id)
    """,
)
def substring_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1++: the REMOVE step of ExactSubstr dedup — every removable
    span from substring_dedup_spans is cut and the document rebuilt
    from its surviving words (Lee et al. 2022 drop the duplicated
    bytes; this is that, at 8-word granularity). Total over the
    corpus: unduplicated docs pass through unchanged; a doc that first
    appeared elsewhere in full survives with empty text. The rewrite
    itself is map-side array math over the per-doc span list — no
    per-word explode, no extra shuffle (operators/dedup.py
    substring_dedup_rewrite)."""
    grams = _substring_gram_index(spark, sf_dir)
    words = D.doc_words(load(spark, sf_dir, "documents"), "doc_id", "text")
    spans = D.substring_span_bounds(grams, _SUBSTR_MIN_WORDS)
    return D.substring_dedup_rewrite(spans, words).select(
        F.col("doc").alias("doc_id"), "n_words", "n_removed", "clean_text"
    )


# One drain of the streaming decontaminate-on-ingest job per
# (session, sf_dir) — same side-effecting-run rationale as below.
_STREAM_DECON_DIRS: dict[tuple[str, str], str] = {}


def _stream_decon_run(spark: SparkSession, sf_dir: str) -> str:
    def build() -> str:
        import hashlib

        from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
            fresh_stream_dir,
            stream_decontaminate,
        )

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        tmp = fresh_stream_dir(f"mcdp_sdecon_{tag}_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        train = d.filter(F.col("doc_id") >= _BENCH_CUT)
        # two arrival chunks (even/odd doc_id): the cut must come out
        # right per-micro-batch, not because everything shared a batch
        train.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b0")
        train.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        # eval grams from the shared persisted index (fifth consumer)
        eval_grams = _substring_gram_index(spark, sf_dir).filter(
            F.col("doc") < _BENCH_CUT
        )
        stream_decontaminate(
            spark,
            f"{src}/b*",
            "doc_id bigint, text string",
            out,
            ckpt,
            eval_grams,
            _SUBSTR_MIN_WORDS,
        )
        return out

    return session_memo(spark, _STREAM_DECON_DIRS, sf_dir, build)


@query(
    "stream_decontaminate_rollup",
    oracle=_SUBSTR_WS_GRAMS
    + rf""",
    ev AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < {_BENCH_CUT}
    ),
    starts AS (
      SELECT doc_id, pos FROM grams
      WHERE doc_id >= {_BENCH_CUT} AND g IN (SELECT g FROM ev)
    )"""
    + _SUBSTR_ISLANDS_TAIL
    + rf""",
    tr AS (
      SELECT doc_id, w FROM ws WHERE doc_id >= {_BENCH_CUT}
    ),
    kept AS (
      SELECT tr.doc_id, string_agg(tr.w[i], ' ' ORDER BY i) AS clean_text,
             COUNT(*) AS n_kept
      FROM tr, LATERAL unnest(generate_series(1, len(tr.w))) AS t(i)
      WHERE NOT EXISTS (
        SELECT 1 FROM spans sp
        WHERE sp.doc_id = tr.doc_id AND i BETWEEN sp.s AND sp.e
      )
      GROUP BY tr.doc_id
    )
    SELECT tr.doc_id,
           CAST(len(tr.w) AS BIGINT) AS n_words,
           CAST(len(tr.w) - COALESCE(kept.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(kept.clean_text, '') AS clean_text
    FROM tr LEFT JOIN kept USING (doc_id)
    """,
)
def stream_decontaminate_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 x T5: decontaminate-on-ingest — training documents arrive as
    a feed (two checkpointed micro-batches) and every >= 8-word span
    also present in the held-out eval slice (docs 0..19) is CUT before
    landing, so leaked spans never touch the corpus. Each micro-batch
    runs the exact batch operators inside foreachBatch
    (contamination_span_bounds -> substring_dedup_rewrite; the eval
    digest set broadcasts, the arriving batch never shuffles for the
    marking), and the driver oracle is the BATCH decontamination SQL
    over the same docs — stream ≡ batch is driver evidence, the
    stream_ann_assign pattern applied to the curation path
    (streaming/jobs.stream_decontaminate)."""
    from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
        read_stream_assignments,
    )

    out = _stream_decon_run(spark, sf_dir)
    return read_stream_assignments(spark, out).select(
        F.col("doc").alias("doc_id"), "n_words", "n_removed", "clean_text"
    )


# One drain of the streaming line-df sketch per (session, sf_dir): the
# checkpointed stream is a side-effecting run; re-draining per
# DataFrame build would only re-prove what the first drain landed
# (same rationale as the stream_ann_assign run).
_STREAM_LINEDF_DIRS: dict[tuple[str, str], str] = {}
_LINEDF_W, _LINEDF_D, _LINEDF_SEED = 64, 3, 131
_LINEDF_PROBE_CUT = 20  # probe the distinct lines of docs 0..19


def _stream_linedf_run(spark: SparkSession, sf_dir: str) -> str:
    def build() -> str:
        import hashlib

        from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
            fresh_stream_dir,
            stream_line_df_sketch,
        )

        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        tmp = fresh_stream_dir(f"mcdp_linedf_{tag}_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        # two arrival chunks (even/odd doc_id) -> two micro-batches:
        # the cumulative grid must come out right INCREMENTALLY
        d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b0")
        d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        stream_line_df_sketch(
            spark,
            f"{src}/b*",
            "doc_id bigint, text string",
            out,
            ckpt,
            w=_LINEDF_W,
            d=_LINEDF_D,
            seed=_LINEDF_SEED,
        )
        return out

    return session_memo(spark, _STREAM_LINEDF_DIRS, sf_dir, build)


def _linedf_oracle() -> str:
    from multichannel_commerce_data_pipeline_spark.operators.bloom import (
        _oracle_pos,
    )

    inc = " UNION ALL ".join(
        f"SELECT {j} AS j,"
        f" {_oracle_pos('ldig', _LINEDF_W, j, _LINEDF_SEED)} AS bucket"
        " FROM dln"
        for j in range(_LINEDF_D)
    )
    ppos = " UNION ALL ".join(
        f"SELECT ldigest, {j} AS j,"
        f" {_oracle_pos('ldigest', _LINEDF_W, j, _LINEDF_SEED)} AS bucket"
        " FROM probes"
        for j in range(_LINEDF_D)
    )
    return rf"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    ln AS (
      SELECT doc_id,
             array_to_string(list_slice(w, k * 10 + 1, k * 10 + 10), ' ')
               AS line
      FROM ws, LATERAL unnest(
        range(CAST(ceil(len(w) / 10.0) AS BIGINT))
      ) AS t(k)
    ),
    dln AS (
      SELECT DISTINCT doc_id, md5(line) AS ldig FROM ln
    ),
    inc AS ({inc}),
    sketch AS (SELECT j, bucket, COUNT(*) AS cell FROM inc GROUP BY 1, 2),
    probes AS (
      SELECT DISTINCT ldig AS ldigest FROM dln WHERE doc_id < {_LINEDF_PROBE_CUT}
    ),
    ppos AS ({ppos}),
    est AS (
      SELECT ldigest, MIN(COALESCE(s.cell, 0)) AS est_df
      FROM ppos p LEFT JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
      GROUP BY ldigest
    ),
    exact AS (
      SELECT ldig AS ldigest, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS exact_df
      FROM dln GROUP BY 1
    )
    SELECT e.ldigest, est_df, exact_df, est_df - exact_df AS overcount
    FROM est e JOIN exact x USING (ldigest)
    """


@query("stream_boilerplate_sketch", oracle=_linedf_oracle())
def stream_boilerplate_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 x T5 x X12: streaming boilerplate df maintenance — the
    at-scale deployment of boilerplate_line_removal, where the crawl
    ARRIVES as a feed and the per-line document-frequency signal is
    maintained incrementally in a BOUNDED Count-Min grid instead of an
    unbounded per-distinct-line counter table. Within-doc dedup is
    map-side (a document is one stream row: array_distinct over its
    line digests needs no state), df merges by addition, so Structured
    Streaming's stateful aggregation IS the maintenance (two
    checkpointed micro-batches here, cumulative complete-mode grid,
    idempotent per-batch landing). The driver oracle rebuilds the grid
    and the probe estimates in batch SQL: stream output must equal the
    from-scratch batch sketch cell-for-cell, and est_df >= exact df
    always (thresholding the estimate gives a conservative cut — never
    misses a hot line). Probes: the distinct lines of docs 0..19
    (streaming/jobs.stream_line_df_sketch)."""
    from multichannel_commerce_data_pipeline_spark.operators.frequency import (
        cm_estimate,
    )
    from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
        read_latest_cm_sketch,
    )

    out = _stream_linedf_run(spark, sf_dir)
    grid = read_latest_cm_sketch(spark, out)
    docs = parallelize_small_scan(spark, load(spark, sf_dir, "documents"))
    ws = F.split(F.col("text"), " ")
    n_lines = F.ceil(F.size(ws) / F.lit(10)).cast("int")
    digs = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), n_lines - 1),
            lambda k: F.md5(F.concat_ws(" ", F.slice(ws, k * 10 + 1, 10))),
        )
    )
    per_doc = (
        docs.select("doc_id", F.explode_outer(digs).alias("ldigest"))
        .filter(F.col("ldigest").isNotNull())
    )
    probes = (
        per_doc.filter(F.col("doc_id") < _LINEDF_PROBE_CUT)
        .select("ldigest")
        .distinct()
    )
    est = cm_estimate(
        grid, probes, "ldigest", w=_LINEDF_W, d=_LINEDF_D, seed=_LINEDF_SEED
    ).withColumnRenamed("est_count", "est_df")
    exact = (
        per_doc.select("doc_id", "ldigest")
        .distinct()
        .groupBy("ldigest")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_df"))
    )
    return est.join(exact, "ldigest").select(
        "ldigest",
        "est_df",
        "exact_df",
        (F.col("est_df") - F.col("exact_df")).alias("overcount"),
    )


# One drain of the cut-on-ingest stream per (session, sf_dir); the
# maintain half is the memoized line-df sketch drain above.
_STREAM_BPCUT_DIRS: dict[tuple[str, str], str] = {}


def _stream_bpcut_run(spark: SparkSession, sf_dir: str) -> str:
    def build() -> str:
        import hashlib

        from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
            fresh_stream_dir,
            read_latest_cm_sketch,
            stream_boilerplate_cut,
        )

        # maintain half: the landed cumulative grid (memoized drain)
        grid_rows = read_latest_cm_sketch(
            spark, _stream_linedf_run(spark, sf_dir)
        ).collect()
        cells = [0] * (_LINEDF_D * _LINEDF_W)
        for r in grid_rows:
            cells[r.j * _LINEDF_W + r.bucket] = int(r.cell)
        tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
        tmp = fresh_stream_dir(f"mcdp_bpcut_{tag}_")
        src, out, ckpt = f"{tmp}/src", f"{tmp}/out", f"{tmp}/ckpt"
        d = load(spark, sf_dir, "documents").select("doc_id", "text")
        # two arrival chunks -> two micro-batches: the cut must come
        # out right per-micro-batch against the fixed landed grid
        d.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b0")
        d.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{src}/b1")
        stream_boilerplate_cut(
            spark,
            f"{src}/b*",
            "doc_id bigint, text string",
            out,
            ckpt,
            cells,
            line_words=10,
            df_threshold=2,
            w=_LINEDF_W,
            d=_LINEDF_D,
            seed=_LINEDF_SEED,
        )
        return out

    return session_memo(spark, _STREAM_BPCUT_DIRS, sf_dir, build)


def _bpcut_oracle() -> str:
    from multichannel_commerce_data_pipeline_spark.operators.bloom import (
        _oracle_pos,
    )

    inc = " UNION ALL ".join(
        f"SELECT {j} AS j,"
        f" {_oracle_pos('ldig', _LINEDF_W, j, _LINEDF_SEED)} AS bucket"
        " FROM dln"
        for j in range(_LINEDF_D)
    )
    ppos = " UNION ALL ".join(
        f"SELECT ldigest, {j} AS j,"
        f" {_oracle_pos('ldigest', _LINEDF_W, j, _LINEDF_SEED)} AS bucket"
        " FROM probes"
        for j in range(_LINEDF_D)
    )
    return rf"""
    WITH ws AS (
      SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    ln AS (
      SELECT doc_id, k AS lidx,
             array_to_string(list_slice(w, k * 10 + 1, k * 10 + 10), ' ')
               AS line
      FROM ws, LATERAL unnest(
        range(CAST(ceil(len(w) / 10.0) AS BIGINT))
      ) AS t(k)
    ),
    dln AS (
      SELECT DISTINCT doc_id, md5(line) AS ldig FROM ln
    ),
    inc AS ({inc}),
    sketch AS (SELECT j, bucket, COUNT(*) AS cell FROM inc GROUP BY 1, 2),
    probes AS (SELECT DISTINCT md5(line) AS ldigest FROM ln),
    ppos AS ({ppos}),
    est AS (
      SELECT ldigest, MIN(COALESCE(s.cell, 0)) AS est_df
      FROM ppos p LEFT JOIN sketch s ON p.j = s.j AND p.bucket = s.bucket
      GROUP BY ldigest
    ),
    kept AS (
      SELECT ln.doc_id, ln.lidx, ln.line
      FROM ln JOIN est ON md5(ln.line) = est.ldigest
      WHERE est.est_df <= 2
    ),
    agg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(line, ' ' ORDER BY lidx) AS clean_text
      FROM kept GROUP BY doc_id
    )
    SELECT ws.doc_id,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT) AS n_lines,
           CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(ceil(len(ws.w) / 10.0) AS BIGINT)
             - CAST(COALESCE(agg.n_kept, 0) AS BIGINT) AS n_removed,
           COALESCE(agg.clean_text, '') AS clean_text
    FROM ws LEFT JOIN agg USING (doc_id)
    """


@query("stream_boilerplate_cut_rollup", oracle=_bpcut_oracle())
def stream_boilerplate_cut_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 x T5 x X12: boilerplate-cut-on-ingest — the APPLY side
    composing with stream_boilerplate_sketch's MAINTAIN side, closing
    the maintain -> threshold -> cut streaming story end-to-end:
    documents arrive as a feed (two checkpointed micro-batches) and
    every line whose sketch-ESTIMATED corpus df exceeds 2 is removed
    before landing — the two-pass C4/CCNet recipe with the stats pass
    replaced by the bounded streaming Count-Min grid. Each micro-batch
    runs the batch operator (boilerplate_cut_with_sketch: the landed
    grid enters as one foldable literal, so a micro-batch pays ZERO
    shuffles) inside foreachBatch; the driver oracle rebuilds the
    sketch AND the cut in batch SQL, so stream ≡ batch is driver
    evidence. est >= exact keeps the cut conservative — collisions may
    kill a few extra cold lines, never spare a hot one
    (streaming/jobs.stream_boilerplate_cut)."""
    from multichannel_commerce_data_pipeline_spark.streaming.jobs import (
        read_stream_assignments,
    )

    out = _stream_bpcut_run(spark, sf_dir)
    return read_stream_assignments(spark, out).select(
        "doc_id", "n_lines", "n_kept", "n_removed", "clean_text"
    )


@query(
    "eval_overlap_report",
    oracle=_SUBSTR_WS_GRAMS
    + rf""",
    tr AS (
      SELECT DISTINCT g FROM grams WHERE doc_id >= {_BENCH_CUT}
    ),
    ev AS (
      SELECT doc_id, g FROM grams WHERE doc_id < {_BENCH_CUT}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_windows,
           CAST(SUM(CASE WHEN g IN (SELECT g FROM tr) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           {oracle_dround(
               "SUM(CASE WHEN g IN (SELECT g FROM tr) THEN 1 ELSE 0 END) "
               "* 1.0 / COUNT(*)", 6)} AS overlap_frac
    FROM ev GROUP BY doc_id
    """,
)
def eval_overlap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3: benchmark-integrity report — the reverse direction of
    decontaminate_spans: per EVAL document (docs 0..19), the fraction
    of its 8-word windows reproducible from the training corpus (docs
    >= 20). Decontamination cuts the train side; this measures how
    compromised each benchmark document already is — the per-benchmark
    overlap statistic GPT-3 appendix C and Lee et al. 2022 §6 publish
    before trusting an eval number. Fourth consumer of the persisted
    gram index; the train corpus never shuffles (broadcast eval
    digests, partial-aggregated matched-digest distinct bounded by the
    eval set; operators/dedup.py eval_overlap_counts)."""
    grams = _substring_gram_index(spark, sf_dir)
    counts = D.eval_overlap_counts(
        grams.filter(F.col("doc") >= _BENCH_CUT),
        grams.filter(F.col("doc") < _BENCH_CUT),
    )
    return counts.select(
        F.col("doc").alias("doc_id"),
        "n_windows",
        "n_contaminated",
        dround(
            F.col("n_contaminated").cast("double") / F.col("n_windows"), 6
        ).alias("overlap_frac"),
    )


@query(
    "dup_span_histogram",
    oracle=_SUBSTR_SPAN_CTES
    + r"""
    SELECT CAST(sp.e - sp.s + 1 AS BIGINT) AS span_words,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(COUNT(DISTINCT sp.doc_id) AS BIGINT) AS n_docs,
           CAST(SUM(sp.e - sp.s + 1) AS BIGINT) AS dup_words
    FROM spans sp
    GROUP BY 1
    """,
)
def dup_span_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1++: duplication-profile observability — the train-train dual
    of eval_overlap_report: the distribution of maximal duplicated-span
    lengths across the corpus (how many spans, how many documents, and
    how much text is duplicated at each length >= 8 words). This is
    the "how dirty is my crawl" report a curator reads BEFORE choosing
    dedup thresholds: a corpus whose duplication mass sits in 8-word
    spans wants line/passage removal, one dominated by 200-word spans
    wants whole-document dedup. Derived entirely from the existing
    machinery — the persisted gram index feeds the same
    gaps-and-islands span bounds as substring_dedup_spans (narrow
    boundaries frame, no text join), then one bounded aggregate keyed
    on span length; no new shuffle shape, and the output is at most
    max-doc-words rows regardless of corpus size."""
    grams = _substring_gram_index(spark, sf_dir)
    bounds = D.substring_span_bounds(grams, _SUBSTR_MIN_WORDS)
    lens = bounds.select(
        "doc",
        (F.col("span_end") - F.col("span_start") + 1)
        .cast("long")
        .alias("span_words"),
    )
    return lens.groupBy("span_words").agg(
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.count_distinct("doc").cast("long").alias("n_docs"),
        F.sum("span_words").cast("long").alias("dup_words"),
    )


@query(
    "decontaminate_spans",
    oracle=_SUBSTR_WS_GRAMS
    + rf""",
    ev AS (
      SELECT DISTINCT g FROM grams WHERE doc_id < {_BENCH_CUT}
    ),
    starts AS (
      SELECT doc_id, pos FROM grams
      WHERE doc_id >= {_BENCH_CUT} AND g IN (SELECT g FROM ev)
    )"""
    + _SUBSTR_ISLANDS_TAIL
    + _SUBSTR_SPAN_SELECT,
)
def decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1/X3: substring-level benchmark decontamination — every maximal
    span of a training document (docs >= 20) reproducing >= 8
    consecutive words found anywhere in the held-out benchmark slice
    (docs 0..19), with exact word boundaries, so the leaked span can be
    cut instead of dropping or keeping the whole document — the
    localization the doc-level flag pass (benchmark_decontamination)
    cannot provide, and the train-vs-test form of the Lee et al. 2022
    dedup. No survivor rule here: EVERY train occurrence of an eval
    window is contaminated. Serves the same persisted gram index as
    the substring-dedup family (third consumer); the eval side reduces
    to a broadcast digest set, so the train corpus never shuffles for
    the marking (operators/dedup.py contamination_spans)."""
    grams = _substring_gram_index(spark, sf_dir)
    train_grams = grams.filter(F.col("doc") >= _BENCH_CUT)
    eval_grams = grams.filter(F.col("doc") < _BENCH_CUT)
    words = D.doc_words(
        load(spark, sf_dir, "documents"), "doc_id", "text"
    ).filter(F.col("doc") >= _BENCH_CUT)
    return D.contamination_spans(
        train_grams, eval_grams, words, _SUBSTR_MIN_WORDS
    ).select(
        F.col("doc").alias("doc_id"),
        "span_start",
        "span_end",
        "span_words",
        "span_text",
    )
