"""Driver-checkable query library for the LLM-pipeline operators
(SURVEY.md §2.12): every operator in ``llm/`` exposed as a
``(spark, sf_dir) -> DataFrame`` callable plus a DuckDB oracle twin.

Oracle twins are GENERATED from the same constants as the Spark
expressions (marker dicts, band counts, frozen LSH planes) — the two
engines can't drift apart silently.  ``doc_near_dup_minhash_ml`` is
the one rows-only entry: its hash family is Spark-internal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from yelp_review_data_analysis_using_big_data_technologies_spark.functions.casemap import bucketize
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import bpe as lbpe
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import clusters as lcc
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import decontam as ldec
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import dedup as ldd
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import quality as lq
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import staging as lstg
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import multimodal as lmm
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import packing as lpk
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import sampling as lsmp
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import spans as lsp
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import terms as ltm
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import text as ltx
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import vectors as lvec
from yelp_review_data_analysis_using_big_data_technologies_spark.llm import winnow as lwin
from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import VEC_OK_SQL
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import (
    k_core_sql as kcsql,
    pagerank,
    pagerank_sql,
    triangle_counts_sql,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.operators.relational import (
    dedup_keyed_deterministic,
)
from yelp_review_data_analysis_using_big_data_technologies_spark.sources.readers import load_table



def _load_embeddings(spark, sf_dir: str):
    """Embeddings with the WELL-SHAPED entry gate applied (r8): the
    pipeline's declared dimensionality (EMBEDDING_DIM — the dim the
    frozen LSH planes are drawn at) plus finite non-NULL components
    and nonzero norm.  Ragged/zero/empty/NULL vectors otherwise
    job-abort the cosine (ANSI DIVIDE_BY_ZERO), hard-abort DuckDB's
    list_inner_product, or NULL-pad zip_with — the r8 ragged-vector
    probe hit all three.  SQL twins carry the same gate via
    VEC_OK_SQL; operators stay dim-agnostic for reuse."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import EMBEDDING_DIM, finite_vec

    return load_table(spark, sf_dir, "embeddings").filter(
        finite_vec("embedding", dim=EMBEDDING_DIM)
    )

_STOPWORD_LIT = "[" + ", ".join(f"'{w}'" for w in ltx.STOPWORDS) + "]"
_TOK = "regexp_split_to_array(text, '[ \\t\\n\\x0B\\f\\r]+')"


# --------------------------------------------------------------------------
# documents: dedup family
# --------------------------------------------------------------------------


def doc_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on sha2(text,256); survivor = min doc_id."""
    return ldd.exact_dedup(load_table(spark, sf_dir, "documents"))


def doc_normalized_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-exact dedup on a normalized key (lowercased, combining-
    marks-stripped 40-char prefix) — collapses templated/prefix-shared
    docs that full-hash dedup misses; same single hash-aggregate shape.

    The key strips ``\\p{Mn}`` AFTER lowering: engine casefold tables
    disagree on exactly the codepoints whose lowercase carries a
    combining mark (Java ``lower('İ')`` = 'i'+U+0307 vs utf8proc's
    bare 'i' — found by the r8 unicode injection probe), and the
    strip collapses both to the same bytes.  It also makes the key
    insensitive to NFC-vs-NFD mark encoding in the prefix.  Full
    canonical-equivalence dedup (precomposed é == e+mark) is the
    ingest-stage ``normalize_text`` operator's job, not this key's."""
    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.withColumn(
        "norm_key",
        F.sha2(
            F.regexp_replace(
                F.lower(F.substring("text", 1, 40)), r"\p{Mn}", ""
            ),
            256,
        ),
    )
    return dedup_keyed_deterministic(
        keyed, keys=["norm_key"], tiebreak=["doc_id"]
    ).select("doc_id", "norm_key")


def doc_unicode_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NFC ingest-normalization audit (llm/normalize.py): per doc, the
    hash of the NFC-normalized content and whether normalization
    changed the bytes.  An ingest job writes the normalized text +
    this flag once; every downstream byte-exact dedup then treats
    canonically-equivalent NFC/NFD encodings as the same document.
    Arrow-batched pandas UDF (Spark has no built-in normalizer);
    oracle twin is DuckDB's native ``nfc_normalize``."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.normalize import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    normed = normalize_text(docs, col="text", form="NFC", flag_col="changed")
    return normed.select(
        "doc_id", F.sha2(F.col("text"), 256).alias("nfc_hash"), "changed"
    )


def doc_near_dup_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash-LSH near-dup pairs + exact-Jaccard verification."""
    return ldd.near_dup_pairs_banded(
        load_table(spark, sf_dir, "documents")
    ).orderBy("id_a", "id_b")


def doc_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup graph (operators/graph.py): which
    member of each duplicate cluster is its CENTER — the natural
    keep-candidate for representative dedup.  Edges are the banded-LSH
    verified pairs; 5 fixed iterations so the unrolled DuckDB twin
    hashes identically (convergence-test termination would couple the
    result to float noise)."""
    pairs = ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
    return pagerank(pairs).withColumnRenamed("id", "doc_id")


def doc_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-core of the near-dup graph (operators/graph.py::k_core,
    6 fixed peel rounds): the density filter separating clique-shaped
    duplicate blobs (which survive) from incidental chains (which peel
    away entirely) — run before per-cluster representative work."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import k_core

    pairs = ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
    return k_core(pairs).withColumnRenamed("id", "doc_id")


def doc_pagerank_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jaccard-WEIGHTED PageRank over the near-dup graph: a node
    spreads rank proportionally to edge similarity (share = r·w/Σw),
    so centrality follows HOW similar the duplicates are, not just
    how many — the better keep-candidate signal when a cluster mixes
    strong and borderline pairs.  Weights are the verified 6-dp
    Jaccard scores the pair relation already carries (identical in
    both engines by construction)."""
    pairs = ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
    return pagerank(pairs, weight="jaccard").withColumnRenamed(
        "id", "doc_id"
    )


def corpus_keep_central(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Representative dedup by CENTRALITY — the three-operator
    composition the library exists for: banded-LSH pairs → connected
    components (cluster labels) × fixed-iteration PageRank (cluster
    centers) → per cluster keep the highest-ranked member (ties to
    the smallest id).  corpus_keep_best keeps the best-QUALITY
    member; this keeps the most-CONNECTED one — the copy most other
    near-duplicates derive from, which is the archival choice when
    quality scores are unreliable.

    The pair relation is staged once and feeds both algorithms; the
    keeper argmax runs over the rounded rank (exact in both engines),
    window bounded by cluster size."""
    pairs = lstg.stage(
        ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
        .select("id_a", "id_b")
    )
    cc = lcc.connected_components(pairs).withColumnRenamed("id", "doc_id")
    pr = pagerank(pairs).withColumnRenamed("id", "doc_id")
    j = cc.join(pr, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("rank"), F.asc("doc_id")
    )
    members = Window.partitionBy("cluster_id")
    return (
        j.withColumn("__rn", F.row_number().over(w))
        .withColumn("n_members", F.count(F.lit(1)).over(members))
        .where(F.col("__rn") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.col("n_members").cast("long").alias("n_members"),
            F.col("rank").alias("keep_rank"),
            F.col("degree").alias("keep_degree"),
        )
        .orderBy("cluster_id")
    )


def doc_prefix_contained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-containment dedup (llm/dedup.py::prefix_contained): docs
    whose full text is a prefix of another doc (truncated re-crawls,
    paginated shards) — one sorted-neighborhood window, no pair join."""
    return ldd.prefix_contained(load_table(spark, sf_dir, "documents"))


def doc_band_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degenerate-clique diagnostic (llm/dedup.py::band_bucket_profile):
    band-bucket population profile + oversize-bucket count at the
    default cap — the pre-flight an ingest pipeline runs before the
    LSH pair join to detect the boilerplate-clique regime."""
    return ldd.band_bucket_profile(load_table(spark, sf_dir, "documents"))


def doc_near_dup_minhash_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pyspark.ml MinHashLSH approxSimilarityJoin variant (rows-only)."""
    return ldd.near_dup_pairs_ml(load_table(spark, sf_dir, "documents"))


def doc_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard pairs via inverted shingle index (df-capped
    posting lists; no all-pairs join)."""
    docs = load_table(spark, sf_dir, "documents")
    return ldd.ngram_jaccard_pairs(docs, threshold=0.3)


def doc_ngram_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin prefix-filtered exact Jaccard pairs
    (llm/dedup.py::ngram_jaccard_pairs_prefix): identical result to
    doc_ngram_jaccard — the twin IS ngram_jaccard_sql — with candidate
    generation bounded by rarest-first prefixes instead of whole
    posting lists."""
    docs = load_table(spark, sf_dir, "documents")
    return ldd.ngram_jaccard_pairs_prefix(docs, threshold=0.3)


def doc_ngram_jaccard_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regime-selected exact Jaccard pairs
    (llm/dedup.py::ngram_jaccard_pairs_auto): tokenize once, run the
    one-pass candidate-volume profile, dispatch to the PPJoin prefix
    plan only when it predicts a >= 2x candidate cut (on the bench
    documents at t=0.3 the profile predicts ~1.5x, so this entry
    exercises the base-plan arm — the favorable arm is pinned in
    tests/test_prefix_jaccard.py).  Identical result either way; the
    twin IS ngram_jaccard_sql."""
    docs = load_table(spark, sf_dir, "documents")
    return ldd.ngram_jaccard_pairs_auto(docs, threshold=0.3)


def corpus_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training order (llm/sampling.py::corpus_shuffle):
    seeded md5-rank permutation + round-robin shard assignment via the
    two-level rank (bucket offsets over a 256-row subtotal relation,
    per-bucket row_number) — never a global sort of the corpus.  The
    twin is the textbook one-window rank, so the hash proves the
    decomposition."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.sampling import corpus_shuffle

    docs = load_table(spark, sf_dir, "documents")
    return corpus_shuffle(docs).orderBy("position")


def pipeline_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→eval CONTAMINATION report: compose the deterministic
    split (llm/sampling.py::split_assign) with the cross-corpus R-S
    Jaccard join (llm/dedup.py::ngram_jaccard_join) — per eval split,
    how many held-out docs near-duplicate a TRAIN doc (the benchmark
    leakage every eval pipeline must audit before trusting a score).
    One row per eval split: n_docs, n_leaked (distinct leaked docs),
    n_pairs, max_jaccard (NULL when clean), leak_frac.  Candidates
    are bounded by shared-shingle df products exactly as in the
    cross-corpus entry — never |train|×|eval|."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.sampling import split_assign

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    assigned = split_assign(docs)
    train = assigned.where(F.col("split") == "train")
    ev = assigned.where(F.col("split").isin("val", "test"))
    pairs = ldd.ngram_jaccard_join(train, ev, threshold=0.3)
    tag = ev.select(F.col("doc_id").alias("id_r"), "split")
    leaks = (
        pairs.join(tag, on="id_r")
        .groupBy("split")
        .agg(
            F.countDistinct("id_r").alias("__leaked"),
            F.count(F.lit(1)).alias("__pairs"),
            F.max("jaccard").alias("__maxj"),
        )
    )
    base = ev.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        base.join(leaks, on="split", how="left")
        .select(
            "split",
            "n_docs",
            F.coalesce(F.col("__leaked"), F.lit(0)).alias("n_leaked"),
            F.coalesce(F.col("__pairs"), F.lit(0)).alias("n_pairs"),
            F.round(F.col("__maxj"), 6).alias("max_jaccard"),
            F.round(
                F.coalesce(F.col("__leaked"), F.lit(0))
                / F.col("n_docs").cast("double"),
                6,
            ).alias("leak_frac"),
        )
        .orderBy("split")
    )


def doc_cross_corpus_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus R-S Jaccard join (llm/dedup.py::ngram_jaccard_join):
    which docs of the 'new crawl' (odd doc_ids) near-duplicate which
    docs of the 'reference corpus' (even doc_ids) — the audit surface
    behind an admission decision, with scores.  Candidates are
    Σ df_L·df_R per shared shingle (df-capped across both sides),
    never |L|×|R|."""
    docs = load_table(spark, sf_dir, "documents")
    left = docs.where(F.col("doc_id") % 2 == 0)
    right = docs.where(F.col("doc_id") % 2 == 1)
    return ldd.ngram_jaccard_join(left, right, threshold=0.3).orderBy(
        "id_l", "id_r"
    )


def doc_graph_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration label-propagation communities over the near-dup
    graph (llm/clusters.py::label_propagation): the neighbor-majority
    view that a single bridge pair cannot out-vote — the community
    complement to the CC panel's transitive closure."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.clusters import label_propagation

    pairs = ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
    return label_propagation(pairs)


def doc_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counts + local clustering coefficient over the
    banded near-dup graph (operators/graph.py::triangle_counts): the
    density diagnostic telling representative dedup whether clusters
    are clique-shaped (safe to keep one) or chains (A~B~C with A≁C —
    keep-one-per-component would merge non-duplicates)."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.operators.graph import triangle_counts

    pairs = ldd.near_dup_pairs_banded(load_table(spark, sf_dir, "documents"))
    return triangle_counts(pairs).withColumnRenamed("id", "doc_id")


def doc_near_dup_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect near-dup pairs, then drop the larger id of each pair —
    the full dedup pipeline a training corpus actually runs."""
    return ldd.near_dup_removal(load_table(spark, sf_dir, "documents"))


def doc_simhash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash value histogram; count>1 buckets are near-dup groups."""
    return ldd.simhash_buckets(load_table(spark, sf_dir, "documents"))


def doc_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs with Hamming-band candidates and
    exact bit_count(xor) verification (exact recall for Hamming <= 3)."""
    return ldd.simhash_near_dup_pairs(
        load_table(spark, sf_dir, "documents")
    ).orderBy("id_a", "id_b")


def doc_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transitive closure of the banded-LSH near-dup pairs: iterative
    min-label connected components — the duplicate GROUPS a corpus
    dedup keeps one survivor from (pairs alone miss A~B~C chains)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ldd.near_dup_pairs_banded(docs).select("id_a", "id_b")
    return lcc.connected_components(pairs).orderBy("doc_id")


def corpus_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware dedup retention (round 5): near-dup clusters keep
    their HIGHEST-:func:`llm.text.quality_score` member instead of the
    arbitrary min-id — the retention policy a training pipeline
    actually wants (dedup should discard the low-quality copy of a
    template, not whichever happened to have the larger id).

    Composition: banded-LSH pairs → connected components → left-join
    labels onto the corpus (unpaired docs form singleton clusters
    labeled by their own id) → one window argmax per cluster
    (quality desc, doc_id asc tie-break).  The window partitions on
    ``cluster_id``, so the only new shuffle beyond the CC step is
    cluster-keyed and aggregate-sized.  Oracle: the recursive-CTE CC
    twin + the identical quality expression + the same window."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ldd.near_dup_pairs_banded(docs).select("id_a", "id_b")
    labels = lcc.connected_components(pairs)
    scored = docs.join(labels, on="doc_id", how="left").select(
        "doc_id",
        F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"),
        ltx.quality_score("text").alias("__q"),
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("__q"), F.asc("doc_id")
    )
    return (
        scored.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select("doc_id", "cluster_id", F.round("__q", 6).alias("quality"))
        .orderBy("doc_id")
    )


def doc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level dedup accounting (round 5): overlapping token
    chunks (:func:`llm.terms.token_chunks`) dedup on their content
    hash CORPUS-WIDE — the granularity at which boilerplate recurs
    across documents that doc-level dedup keeps.  Survivor = first
    occurrence in ``(doc_id, chunk_idx)`` order; output is the per-doc
    retention profile (chunks, kept, duplicate ratio).

    Plan: one window rank partitioned by ``chunk_hash`` (shuffle key =
    content hash — uniform by construction), one per-doc partial agg.
    No joins; both shuffles are key-bounded at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    chunks = ltm.token_chunks(docs)
    w = Window.partitionBy("chunk_hash").orderBy(
        F.asc("doc_id"), F.asc("chunk_idx")
    )
    flagged = chunks.withColumn("__rk", F.row_number().over(w))
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("__rk") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
        )
        .withColumn(
            "dup_ratio",
            F.round(
                F.lit(1.0) - F.col("n_kept") / F.col("n_chunks"), 6
            ),
        )
        .orderBy("doc_id")
    )


def doc_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing (round 5): greedy contiguous
    bin assignment via the two-level distributed prefix sum
    (:mod:`llm.packing`); the oracle runs the naive single-window
    prefix sum, so the hash check proves the scalable decomposition
    computes the textbook integers."""
    docs = load_table(spark, sf_dir, "documents")
    return lpk.pack_bins(docs, budget=512).orderBy("doc_id")


def doc_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (round 5): 100 docs drawn by
    priority sampling (Duffield-Lund-Thorup) with ``n_chars`` as the
    weight — longer docs proportionally likelier, same sample on
    every run/engine (salted-md5 uniform draw, correctly-rounded
    arithmetic only; see :func:`llm.sampling.weighted_priority`)."""
    docs = load_table(spark, sf_dir, "documents")
    out = lsmp.weighted_take(
        docs.select("doc_id", "n_chars"), k=100, weight_col="n_chars"
    )
    return out.withColumn("priority", F.round("priority", 6)).orderBy(
        "doc_id"
    )


#: Target language mixture for :func:`corpus_mixture_sample` — boost
#: English, rebalance the rest to equal shares (the corpus is ~44% en).
_MIXTURE_WEIGHTS = {
    "de": 0.15,
    "en": 0.4,
    "es": 0.15,
    "fr": 0.15,
    "zh": 0.15,
}


def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixture rebalancing (round 5): derive per-language keep
    rates IN-ENGINE from the corpus's token totals so the sampled
    corpus's token shares hit ``_MIXTURE_WEIGHTS`` (no upsampling —
    the binding domain keeps everything, the rest downsample
    deterministically via the salted-md5 draw).  Output is the
    accounting panel: totals, rate, kept docs/tokens, achieved share.
    The oracle re-derives the SAME rates from the same data
    (correctly-rounded ``*``, ``/``, ``min`` only), so the hash check
    covers the whole chain: totals → feasible budget → thresholds →
    membership → achieved mixture.  See
    :func:`llm.sampling.mixture_report`."""
    docs = load_table(spark, sf_dir, "documents")
    return lsmp.mixture_report(
        docs,
        _MIXTURE_WEIGHTS,
        domain_col="lang",
        tokens=ltx.token_count("text"),
    )


# --------------------------------------------------------------------------
# documents: text analysis
# --------------------------------------------------------------------------


def doc_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus profile: doc count, token/char/punctuation/
    stopword statistics — one partial-aggregated groupBy over per-doc
    codegen'd expressions."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select(
        "lang",
        ltx.token_count("text").alias("__tok"),
        F.length("text").alias("__chars"),
        ltx.punct_ratio("text").alias("__punct"),
        ltx.stopword_ratio("text").alias("__stop"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("__tok"), 4).alias("avg_tokens"),
            F.round(F.avg("__chars"), 4).alias("avg_chars"),
            F.round(F.avg("__punct"), 6).alias("avg_punct_ratio"),
            F.round(F.avg("__stop"), 6).alias("avg_stopword_ratio"),
        )
        .orderBy("lang")
    )


def doc_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc whitespace + BPE-ish token counts (the LLM token-cost
    first-order estimate)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        ltx.token_count("text").alias("ws_tokens"),
        ltx.bpe_token_count("text").alias("bpe_tokens"),
        F.length("text").alias("n_chars_live"),
    )


def doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID confusion table: labeled lang × predicted."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", ltx.lang_id("text").alias("lang_pred"))
        .groupBy("lang", "lang_pred")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("lang", "lang_pred")
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc rolling-hash fingerprint (min-md5 3-gram shingle),
    staged via ``shingled`` so the tokenizer runs once per doc."""
    docs = load_table(spark, sf_dir, "documents")
    return ltx.shingled(docs, ["doc_id"]).select(
        "doc_id",
        F.array_min(F.transform(F.col("__sh"), F.md5)).alias("fp"),
    )


def doc_quality_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-score banding — the filter stage of a data pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        bucketize(
            ltx.quality_score("text"), [(0.5, "low"), (0.75, "mid")], "high"
        ).alias("band")
    )
    return scored.groupBy("band").agg(F.count(F.lit(1)).alias("n_docs"))


def doc_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc text-analysis panel: whitespace + BPE-ish token counts,
    min-shingle fingerprint, and quality band in ONE corpus pass.

    The token array is staged in its own projection and every
    downstream stat derives from the bound column — the naive form
    (each stat calling ``tokens(text)``) plants 12 independent
    tokenizer evaluations per row in the plan.  One driver row
    verifies token counting, fingerprinting, and quality banding
    together."""
    docs = load_table(spark, sf_dir, "documents")
    staged = docs.select(
        "doc_id",
        ltx.tokens("text").alias("__tk"),
        ltx.bpe_token_count("text").alias("bpe_tokens"),
        ltx.punct_ratio("text").alias("__punct"),
    )
    ntok = F.size("__tk").cast("double")
    atl = F.aggregate(
        F.col("__tk"), F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.size("__tk")
    quality = (
        F.lit(0.4) * F.least(ntok / F.lit(64.0), F.lit(1.0))
        + F.lit(0.3)
        * (F.lit(1.0) - F.least(F.col("__punct") * F.lit(5.0), F.lit(1.0)))
        + F.lit(0.3)
        * F.when((atl >= 3.0) & (atl <= 10.0), F.lit(1.0)).otherwise(F.lit(0.0))
    )
    return staged.select(
        "doc_id",
        F.size("__tk").alias("ws_tokens"),
        "bpe_tokens",
        F.array_min(
            F.transform(ltx.shingles_from_tokens("__tk"), F.md5)
        ).alias("fp"),
        bucketize(quality, [(0.5, "low"), (0.75, "mid")], "high").alias("band"),
    )


def corpus_clean_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite a training-data pipeline actually runs, end to
    end: exact dedup → near-dup removal (banded LSH) → quality filter
    → per-language token accounting.  Each stage is an already-oracled
    operator; the composition verifies they chain without semantic
    drift (column contracts, survivor rules)."""
    docs = load_table(spark, sf_dir, "documents")
    # Stage the exact-dedup survivors: the relation feeds BOTH the LSH
    # pair generation (via shingling) and the anti-join left side —
    # unstaged, the min(struct) dedup aggregate executes twice.
    stage1 = lstg.stage(ldd.exact_dedup(docs).drop("content_hash"))
    stage2 = ldd.near_dup_removal(stage1)
    stage3 = stage2.filter(ltx.quality_score("text") > 0.5)
    return (
        stage3.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ltx.token_count("text")).alias("total_tokens"),
        )
        .orderBy("lang")
    )


def _freeze_manifest(
    spark: SparkSession, sf_dir: str, balance: str = "lang"
) -> DataFrame:
    """The END-TO-END pretraining-data FREEZE (r14): the ONE artifact
    a training run actually consumes — a deterministic per-document
    manifest ``(doc_id, lang, n_tokens, position, shard,
    offset_tokens, bin_id)`` produced by composing every pipeline
    stage in production order:

      1. exact dedup (sha256, keep min doc_id)
      2. near-dup removal (banded MinHash LSH over the deduped set)
      3. decontamination against the benchmark carve-out
         (``doc_id % 20 = 0`` plays the eval suite; its docs also
         leave the corpus — eval text must never be trained on)
      4. quality filter (``quality_score > 0.5``)
      5. token-mixture rebalancing to ``_MIXTURE_WEIGHTS`` over lang
      6. deterministic shuffle → global training ``position`` +
         round-robin ``shard``
      7. greedy token-budget packing IN TRAINING ORDER (the prefix
         sum runs over ``position``, not ``doc_id`` — bins pack what
         the loader will actually read back-to-back)

    Every stage is an already-oracled operator; the composition is
    what catches contract mismatches between them (the r5
    ``corpus_clean_pipeline`` lesson).  Reference analogue: the
    master-table pipeline IS this composition for the BI layer
    (/root/reference/scripts/glue_job.py:20-92).

    Scale shape: no new shuffle classes beyond the members' own —
    LSH band buckets, the broadcast benchmark fingerprint, the
    |domains|-row broadcast mixture rates, the two-level shuffle/pack
    prefix sums.  ``good``, ``sampled`` and ``manifest`` each feed two
    consumers (rates + membership; order + manifest; packer + final
    join) — they are NARROW (doc_id, lang, n_tokens[, position,
    shard]) and eagerly ``localCheckpoint``-ed so every consumer reads
    materialized rows; a lazy persist only fills during the single
    freeze execution, and its unfilled cache let the tail re-run the
    whole upstream dedup chain per reference (r15 opt)."""
    docs = load_table(spark, sf_dir, "documents")
    # 1-2: exact dedup survivors feed BOTH the LSH pair generation and
    # the anti-join left side (same staging as corpus_clean_pipeline)
    clean = lstg.stage(ldd.exact_dedup(docs).drop("content_hash"))
    # STAGED: decontaminate consumes its corpus twice (the shingle
    # projection AND the anti-join left side).  At sf0.1 local the
    # A/B is neutral (Spark's ReusedExchange already dedups the twin
    # subplans); staged anyway so the single-execution guarantee is
    # structural, not an optimizer artifact — exchange reuse does not
    # survive AQE replanning splits on a real cluster.
    deduped = lstg.stage(
        ldd.near_dup_removal(clean).filter(F.expr(_CORPUS_PRED))
    )
    # 3: benchmark fingerprint comes from the RAW table (the eval
    # suite is fixed before any corpus processing); bench rows leave
    # the training corpus outright
    bench = docs.filter(F.expr(_BENCH_PRED))
    decont = ldec.decontaminate(deduped, bench)
    # 4: quality gate, then shed text — downstream stages only need
    # (doc_id, lang, n_tokens).  EAGER localCheckpoint, not persist
    # (r15 opt, guide §1.2/§5): from here down the chain is narrow,
    # and a lazy persist only fills its cache DURING the single freeze
    # query — the mixture/shuffle/pack tail references these frames
    # 2-3× each, and with an unfilled cache those references re-ran
    # the whole upstream dedup chain inside one execution (measured:
    # the pack+final-join tail added +12 s to a chain whose pieces are
    # sub-second once materialized; the full entry dropped 31→6 s cold
    # / 10→5 s warm with the three narrow stages checkpointed).  Rows
    # are identical — only when they materialize changes.
    good = (
        decont.filter(ltx.quality_score("text") > 0.5)
        .select(
            "doc_id",
            "lang",
            ltx.token_count("text").cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    # 5: mixture membership (rates derived in-engine from good's own
    # token totals; |domains|-row broadcast, no corpus shuffle).
    # balance="cluster" (r15, optional stage) swaps the declared-lang
    # mixture for the semantic cluster balance: even token mass
    # across frozen-seed embedding clusters (SemDeDup-style
    # curation) via the SAME membership machinery.
    if balance == "cluster":
        sampled = (
            lsmp.cluster_balance_sample(
                good, _load_embeddings(spark, sf_dir), n_cells=8
            )
            .drop("cluster_id")
            .localCheckpoint(eager=True)
        )
    else:
        sampled = (
            lsmp.mixture_sample(
                good, _MIXTURE_WEIGHTS, domain_col="lang", tokens="n_tokens"
            )
            .localCheckpoint(eager=True)
        )
    # 6: deterministic training order + shard; manifest STAGED — it
    # feeds both the packer and the final join (same ReusedExchange
    # caveat as `deduped` above: neutral locally, structural at scale)
    order = lsmp.corpus_shuffle(sampled)
    manifest = sampled.join(order, on="doc_id").localCheckpoint(eager=True)
    # 7: pack in POSITION order (positions are dense, so the
    # two-level prefix-sum bucketing stays balanced by construction)
    packed = lpk.pack_bins(
        manifest, budget=512, id_col="position", tokens_col="n_tokens"
    ).drop("n_tokens")
    return manifest.join(packed, on="position").select(
        "doc_id",
        "lang",
        "n_tokens",
        "position",
        "shard",
        "offset_tokens",
        "bin_id",
    )


def corpus_training_freeze(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Presentation wrapper over :func:`_freeze_manifest` (the full
    docstring lives there): the driver entry returns the manifest in
    training order.  :func:`corpus_freeze_stats` consumes the UNSORTED
    core instead — its aggregates never needed the global sort."""
    return _freeze_manifest(spark, sf_dir).orderBy("position")


def corpus_freeze_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accounting panel over the :func:`corpus_training_freeze`
    manifest — the "did my freeze come out balanced" answer an
    operator needs before shipping the artifact to a training run:
    per-SHARD doc/token counts with token share (round-robin sharding
    should land within one doc of even), per-LANG achieved shares
    (the mixture contract, post-freeze), and the bin-fill summary
    (mean/max fill fraction vs the 512-token budget — the straddle
    rule means max can exceed 1 by one doc's tokens).

    ONE grouped pass over the staged manifest for every breakdown
    (r15, the r14 verdict's #2 — the ``dashboard_metrics_panel``
    pattern, replacing the per-stat legs of r14): each manifest row
    explodes into three (grp, key) structs — shard, lang, bin — so a
    single hash shuffle computes all three partial-aggregate
    breakdowns; the per-bin rows then re-aggregate into the 2-row
    fill summary and the share ratios divide by a per-grp window
    total, both over the already-tiny grouped relation.  Plan: 3
    hash shuffles + the output sort above the manifest (was 10+),
    and the manifest cache is scanned ONCE.  The twin nests the SAME
    freeze SQL (:func:`_training_freeze_sql`) so the hash re-proves
    the whole composition en route to the accounting."""
    m = _freeze_manifest(spark, sf_dir).select(
        "lang", "n_tokens", "shard", "bin_id"
    )
    grouped = lstg.stage(
        m.select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("shard").alias("grp"),
                        F.col("shard").cast("string").alias("key"),
                    ),
                    F.struct(
                        F.lit("lang").alias("grp"),
                        F.col("lang").cast("string").alias("key"),
                    ),
                    F.struct(
                        F.lit("__bin").alias("grp"),
                        F.col("bin_id").cast("string").alias("key"),
                    ),
                )
            ).alias("gk"),
            "n_tokens",
        )
        .groupBy(F.col("gk.grp").alias("grp"), F.col("gk.key").alias("key"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("n_tokens").alias("tok"),
        )
    )
    # staged: the 1-row summary feeds BOTH the bin_fill rows and the
    # grand-total broadcast below — one computation, two consumers
    fill = lstg.stage(
        grouped.filter(F.col("grp") == "__bin").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("tok").alias("tok"),
            F.round(F.avg(F.col("tok") / F.lit(512.0)), 6).alias("__mean"),
            F.round(F.max(F.col("tok") / F.lit(512.0)), 6).alias("__max"),
        )
    )
    # every manifest row lands in each grp exactly once, so the bin
    # summary's token sum IS the corpus total — the share ratios
    # divide by a 1-row broadcast of it rather than re-scanning the
    # manifest (or windowing) for a grand total
    shares = (
        grouped.filter(F.col("grp") != "__bin")
        .crossJoin(
            F.broadcast(fill.select(F.col("tok").cast("double").alias("__tot")))
        )
        .select(
            "grp",
            "key",
            "n",
            "tok",
            F.round(F.col("tok") / F.col("__tot"), 6).alias("ratio"),
        )
    )
    # one consumer of the 1-row fill agg: explode the two summary
    # rows out of it instead of unioning two projections of the same
    # aggregate subtree
    bin_rows = fill.select(
        F.lit("bin_fill").alias("grp"),
        "n",
        "tok",
        F.explode(
            F.array(
                F.struct(
                    F.lit("mean").alias("key"),
                    F.col("__mean").alias("ratio"),
                ),
                F.struct(
                    F.lit("max").alias("key"),
                    F.col("__max").alias("ratio"),
                ),
            )
        ).alias("kr"),
    ).select("grp", F.col("kr.key").alias("key"), "n", "tok", F.col("kr.ratio").alias("ratio"))
    return shares.unionByName(bin_rows).orderBy("grp", "key")


#: Split point for the incremental-dedup entry: rows below are the
#: "existing corpus", rows at/above are the "new ingestion batch".
_DELTA_SPLIT_ID = 400


def doc_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup (llm/dedup.py::dedup_against_corpus):
    documents below id 400 play the existing corpus, the rest the new
    batch; admitted = batch rows that are neither exact (sha256) nor
    banded-LSH near duplicates of the corpus.  Oracle = the full-table
    pair SQL restricted to cross pairs (corpus ids sort below batch
    ids, so cross pairs are exactly ``id_a < split ≤ id_b``) plus the
    hash anti-join."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < _DELTA_SPLIT_ID)
    delta = docs.filter(F.col("doc_id") >= _DELTA_SPLIT_ID)
    return (
        ldd.dedup_against_corpus(corpus, delta)
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def corpus_freeze_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INCREMENTAL freeze admission (r14, the freeze family's N+δ
    shape): in production nobody re-freezes the corpus per ingestion
    batch — a delta is ADMITTED against the frozen state.  Documents
    below id 400 play the frozen corpus, the rest the new batch; a
    delta row is admitted iff it is (i) neither an exact nor a
    banded-LSH near duplicate of the corpus
    (:func:`llm.dedup.dedup_against_corpus` — cost ∝ delta × bucket
    overlap, never corpus²), (ii) not part of, and not contaminated
    by, the benchmark carve-out, and (iii) above the quality gate —
    the same admission rules the full :func:`corpus_training_freeze`
    applies, phrased incrementally.  Output: the admitted manifest
    rows ``(doc_id, lang, n_tokens)`` ready to extend the frozen
    corpus (positions/bins are assigned at the next freeze point —
    appending to a frozen permutation would break its determinism
    contract).

    Staged once: the admitted relation feeds decontaminate's two
    consumers (shingle projection + anti-join left side)."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") < _DELTA_SPLIT_ID)
    delta = docs.filter(F.col("doc_id") >= _DELTA_SPLIT_ID)
    admitted = lstg.stage(
        ldd.dedup_against_corpus(corpus, delta).filter(
            F.expr(_CORPUS_PRED)
        )
    )
    bench = docs.filter(F.expr(_BENCH_PRED))
    decont = ldec.decontaminate(admitted, bench)
    return (
        decont.filter(ltx.quality_score("text") > 0.5)
        .select(
            "doc_id",
            "lang",
            ltx.token_count("text").cast("bigint").alias("n_tokens"),
        )
        .orderBy("doc_id")
    )


def corpus_freeze_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drop-attribution audit for the training freeze (r15, the r14
    verdict's #3): when a freeze comes out smaller than expected, the
    first question a data engineer asks is WHICH stage ate the docs.
    Re-runs the freeze admission stages in production order and tags
    every non-surviving document with the stage that removed it —
    ``exact_dup`` → ``near_dup`` → ``benchmark_eval`` (the carve-out
    leaving the corpus) → ``contaminated`` → ``low_quality`` →
    ``mixture_cap`` — plus the ``kept`` row, each with doc and token
    counts (``grp='stage'``).  The ``grp='also'`` rows are the
    overlap matrix: of the docs an EARLIER stage removed, how many
    would a later per-doc criterion have caught anyway — quality
    evaluated inline on each dropped doc's text, contamination by
    fingerprinting the early-dropped (non-benchmark) docs against
    the same benchmark carve-out.  High overlap means the stages are
    redundant; low overlap means each earns its place.

    Scale: every leg is an anti-join between adjacent survivor sets
    on the id (the corpus never shuffles wide); the overlap
    contamination pass fingerprints ONLY the early-dropped docs —
    cost ∝ |dropped|, not |corpus|.  Zero-count cells are absent
    rows (GROUP BY semantics) on both engines.  Twin: the SAME stage
    SQL generators as :func:`corpus_training_freeze`, composed with
    tagged anti-join legs."""
    docs = load_table(spark, sf_dir, "documents")
    # staged: each stage frame feeds the next stage AND its own
    # drop anti-join leg
    clean = lstg.stage(ldd.exact_dedup(docs).drop("content_hash"))
    nd_surv = lstg.stage(ldd.near_dup_removal(clean))
    corpus = lstg.stage(nd_surv.filter(F.expr(_CORPUS_PRED)))
    bench = docs.filter(F.expr(_BENCH_PRED))
    decont = lstg.stage(ldec.decontaminate(corpus, bench))
    # narrow from here down — eager localCheckpoint, not lazy persist
    # (r15 opt, the _freeze_manifest finding): each frame feeds 2-3
    # consumers inside ONE query, and an unfilled lazy cache lets
    # those references re-run the whole upstream dedup chain
    good = (
        decont.filter(ltx.quality_score("text") > 0.5)
        .select(
            "doc_id",
            "lang",
            ltx.token_count("text").cast("bigint").alias("n_tokens"),
        )
        .localCheckpoint(eager=True)
    )
    kept = lsmp.mixture_sample(
        good, _MIXTURE_WEIGHTS, domain_col="lang", tokens="n_tokens"
    ).localCheckpoint(eager=True)

    def _tag(df: DataFrame, stage: str) -> DataFrame:
        return df.select("doc_id", "text", F.lit(stage).alias("stage"))

    # the tagged drop relation feeds the stage counts, the quality
    # overlap, and the contamination-overlap candidate set — three
    # consumers, so it is ALSO checkpointed eagerly (it carries the
    # dropped docs' text, the same bytes the old persist cached)
    drops = (
        _tag(
            docs.join(clean.select("doc_id"), "doc_id", "left_anti"),
            "exact_dup",
        )
        .unionByName(
            _tag(
                clean.join(nd_surv.select("doc_id"), "doc_id", "left_anti"),
                "near_dup",
            )
        )
        .unionByName(
            _tag(nd_surv.filter(~F.expr(_CORPUS_PRED)), "benchmark_eval")
        )
        .unionByName(
            _tag(
                corpus.join(decont.select("doc_id"), "doc_id", "left_anti"),
                "contaminated",
            )
        )
        .unionByName(
            _tag(
                decont.join(good.select("doc_id"), "doc_id", "left_anti"),
                "low_quality",
            )
        )
        .localCheckpoint(eager=True)
    )
    ntok = ltx.token_count("text").cast("bigint")

    def _panel(df: DataFrame, grp: str, key) -> DataFrame:
        return df.groupBy(key.alias("key")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(ntok).alias("n_tokens"),
        ).select(F.lit(grp).alias("grp"), "key", "n_docs", "n_tokens")

    stage_rows = _panel(drops, "stage", F.col("stage"))
    mix_drop = good.join(kept.select("doc_id"), "doc_id", "left_anti")
    tail_rows = (
        mix_drop.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
        )
        .select(
            F.lit("stage").alias("grp"),
            F.lit("mixture_cap").alias("key"),
            "n_docs",
            "n_tokens",
        )
        .unionByName(
            kept.agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
            ).select(
                F.lit("stage").alias("grp"),
                F.lit("kept").alias("key"),
                "n_docs",
                "n_tokens",
            )
        )
    )
    # overlap: would a later per-doc criterion have dropped it anyway
    lowq_rows = _panel(
        drops.filter(F.col("stage") != "low_quality").filter(
            ~(ltx.quality_score("text") > 0.5)
        ),
        "also",
        F.concat(F.col("stage"), F.lit("&low_quality")),
    )
    cand = drops.filter(
        F.col("stage").isin("exact_dup", "near_dup")
    ).filter(F.expr(_CORPUS_PRED))
    contam_rows = _panel(
        cand.join(
            ldec.contamination_overlap(cand, bench).select("doc_id"),
            "doc_id",
            "left_semi",
        ),
        "also",
        F.concat(F.col("stage"), F.lit("&contaminated")),
    )
    return (
        stage_rows.unionByName(tail_rows)
        .unionByName(lowq_rows)
        .unionByName(contam_rows)
        .orderBy("grp", "key")
    )


def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed BPE-style tokenizer pair-merge training (r15, the
    r14 verdict's #4 — llm/bpe.py): six iterative top-pair merges
    over the documents token stream, emitting the learned merge
    table with the post-merge stream accounting per step
    (pair_count, greedy non-overlap n_merged, vocab_size,
    n_symbols).  Completes the tokenizer-prep story that
    ``doc_token_counts`` / ``doc_vocab_coverage`` begins: the merge
    table is exactly what a word-level BPE tokenizer persists.  Twin:
    the K rounds unrolled as CTE blocks with the tie order pinned
    (count DESC, pair lexicographic)."""
    return lbpe.bpe_merge_steps(
        load_table(spark, sf_dir, "documents"), k=6
    )


def corpus_cluster_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic cluster-balanced curation (r15, the r14 verdict's #5
    — llm/sampling.py::cluster_balance_sample): the quality-gated
    corpus is assigned to frozen-seed embedding centroids (the SAME
    deterministic quantizer + SQL twin the IVF index family shares)
    and token mass is rebalanced EVENLY across the 8 semantic
    clusters through the mixture membership machinery — the
    SemDeDup/cluster-curation shape, so the freeze can balance by
    topic, not just declared lang.  Also wired as the optional
    ``balance="cluster"`` stage of :func:`_freeze_manifest` (pinned
    in tests/test_cluster_balance.py).  Output: kept rows with their
    cluster id."""
    docs = load_table(spark, sf_dir, "documents")
    good = docs.filter(ltx.quality_score("text") > 0.5).select(
        "doc_id",
        "lang",
        ltx.token_count("text").cast("bigint").alias("n_tokens"),
    )
    return (
        lsmp.cluster_balance_sample(
            good, _load_embeddings(spark, sf_dir), n_cells=8
        )
        .select("doc_id", "lang", "n_tokens", "cluster_id")
        .orderBy("doc_id")
    )


def corpus_freeze_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cluster-balanced training freeze END-TO-END (r15): the
    full admission chain of :func:`corpus_training_freeze` with the
    optional ``balance="cluster"`` stage live — mixture over
    frozen-seed embedding clusters instead of declared lang — through
    the same deterministic shuffle-shard and packing.  Proves the
    optional stage composes with every downstream contract under a
    driver hash, not just a unit test; twin = the shared freeze SQL
    with the kept CTE swapped to the shared cluster-balance SQL."""
    return _freeze_manifest(spark, sf_dir, balance="cluster").orderBy(
        "position"
    )


def vocab_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the learned BPE merges (r15 follow-on to
    :func:`vocab_bpe_merges` — llm/bpe.py::bpe_encode_stats): re-run
    the six deterministic merge rounds and report the per-document
    encoding effect (tokens before vs symbols after, compression
    ratio) — the tokenizer-validation half of the train/apply pair.
    Twin: the same unrolled round blocks aggregated per doc."""
    return lbpe.bpe_encode_stats(
        load_table(spark, sf_dir, "documents"), k=6
    )


def corpus_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC near-dup removal: candidate pairs come from the
    EMBEDDING space (banded sign-LSH + exact cosine verify,
    llm/vectors.py::cosine_near_dup_pairs) instead of the text
    shingles, then the loser ids (greedy keep-smallest-id) anti-join
    the documents table — catching paraphrases and translations that
    shingle overlap can't see.  embeddings.vec_id is the documents
    row's doc_id, the usual side-table layout for a corpus with a
    computed embedding column.

    Scale: the pair set is bounded by the LSH bucket population (the
    production path derives planes from corpus size); the loser
    anti-join is a plain hash join — the loser set grows with the
    corpus dup RATE (30% near-dup corpora are normal), so unlike the
    decontamination fingerprint (small by construction) it must not be
    pinned broadcast; AQE promotes it when it actually fits."""
    docs = load_table(spark, sf_dir, "documents")
    emb = _load_embeddings(spark, sf_dir)
    # 3×4 planes pinned for the static SQL twin (production default
    # derives n_planes from corpus size — see vec_cosine_near_dup).
    pairs = lvec.cosine_near_dup_pairs(emb, n_bands=3, n_planes=4)
    losers = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    return (
        docs.join(losers, on="doc_id", how="left_anti")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


# --------------------------------------------------------------------------
# documents: dataset splitting / sampling / term stats / chunking
# --------------------------------------------------------------------------

#: Deterministic per-language sampling fractions for the stratified
#: sample (downsample dominant en, keep mid langs, thin the tail).
STRAT_FRACTIONS: dict[str, float] = {
    "en": 0.5,
    "de": 0.8,
    "fr": 0.8,
    "es": 0.8,
    "zh": 0.25,
}

#: Exact per-language row cap for the take-per-stratum panel branch.
_TAKE_K = 20


#: Metadata-sanity ceiling for per-doc character counts (r8 extreme-
#: magnitude probe): a single document cannot exceed ~4 TB of text, so
#: anything above is corrupt METADATA, not a big doc.  Out-of-bounds
#: (negative or absurd) n_chars is summed as NULL — the doc still
#: counts in n_docs (it exists; its metadata is broken) but cannot
#: poison the char accounting.  Without the arm, TWO corrupt rows of
#: 5e18 overflow the BIGINT sum: Spark ANSI JOB-ABORTS
#: (ARITHMETIC_OVERFLOW) while DuckDB silently promotes to HUGEINT —
#: the worst divergence class (abort vs wrong-dtype answer).  With the
#: bound, overflow needs >9 exabytes of REAL text in one group.
SANE_CHARS_MAX = 4_000_000_000_000

def _sane_chars():
    return F.when(
        F.col("n_chars").between(0, SANE_CHARS_MAX), F.col("n_chars")
    )
_SANE_CHARS_SQL = (
    f"CASE WHEN n_chars BETWEEN 0 AND {SANE_CHARS_MAX} THEN n_chars END"
)


def pipeline_split_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-preparation panel in one driver row: (a) deterministic
    md5-hash train/val/test assignment with per-split doc/char
    accounting, (b) deterministic per-language stratified sample with
    per-language survivor counts, (c) exact-k per-language take
    (eval-set carve-out: exactly min(k, |stratum|) rows, window-ranked
    on an independent salted draw).  (a)/(b) are pure
    projections/filters; (c) pays one stratum-key shuffle for the
    exact count — all three reproducible at any scale, no rand()."""
    docs = load_table(spark, sf_dir, "documents")
    split_rows = (
        lsmp.split_assign(docs)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_sane_chars()).alias("sum_chars"),
        )
        .select(
            F.lit("split").alias("op"),
            F.col("split").alias("grp"),
            "n_docs",
            "sum_chars",
        )
    )
    strat_rows = (
        lsmp.stratified_sample(docs, "lang", STRAT_FRACTIONS)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_sane_chars()).alias("sum_chars"),
        )
        .select(
            F.lit("stratified").alias("op"),
            F.col("lang").alias("grp"),
            "n_docs",
            "sum_chars",
        )
    )
    take_rows = (
        lsmp.take_per_stratum(docs, "lang", k=_TAKE_K)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(_sane_chars()).alias("sum_chars"),
        )
        .select(
            F.lit("take").alias("op"),
            F.col("lang").alias("grp"),
            "n_docs",
            "sum_chars",
        )
    )
    return (
        split_rows.unionByName(strat_rows)
        .unionByName(take_rows)
        .orderBy("op", "grp")
    )


def doc_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (keyword extraction)."""
    return ltm.tf_idf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


def doc_token_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-stride token windows (64 tokens every 48) with content
    hashes — the context-window packing step."""
    return ltm.token_chunks(
        load_table(spark, sf_dir, "documents"), chunk=64, stride=48
    )


def doc_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine pairs (lexical rarity-weighted near-dup
    signal): df-capped posting-list self-join, kept-space L2 norm.

    Corpus note: the synthetic documents table draws from a ~31-term
    vocabulary with exactly one term under the df-cap, so every pair
    here is a 1-dimensional kept space (sim = 1.0, n_shared_terms =
    1) — a property of the fixture, not the operator; graded cosines
    on richer vocabularies are pinned in tests/test_tfidf_pairs.py."""
    return ltm.tfidf_cosine_pairs(load_table(spark, sf_dir, "documents"))


def doc_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-passage spans (llm/spans.py): merged token intervals
    whose every k=5-gram occurs at least twice corpus-wide — the
    distributed k-gram relaxation of exact-substring training-data
    dedup (Lee et al. 2022).  Occurrence semantics: within-document
    repeats flag both copies."""
    return lsp.dup_spans(load_table(spark, sf_dir, "documents"), k=5)


def doc_dup_span_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remediation half of substring dedup: excise duplicated
    k=5-gram spans, keep-first occurrence exempt (one copy of repeated
    content survives, the CCNet line-dedup rule).  Fully-excised docs
    yield NULL clean_text (the empty-array portability contract)."""
    return lsp.remove_dup_spans(load_table(spark, sf_dir, "documents"), k=5)


def doc_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) positional fingerprints: per doc the distinct
    (position, hash) selections of the k=3/w=4 sliding-window min —
    any shared 6-token run between two docs shares a fingerprint."""
    return lwin.winnow_fingerprints(load_table(spark, sf_dir, "documents"))


def doc_winnow_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate pairs from shared winnowing fingerprints
    (inverted-index self-join, df-capped like the ngram family)."""
    fps = lwin.winnow_fingerprints(load_table(spark, sf_dir, "documents"))
    return lwin.winnow_pairs(fps)


def doc_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document average negative log-likelihood under a corpus
    bigram LM (CCNet-style perplexity quality signal)."""
    return ltm.bigram_lm_nll(load_table(spark, sf_dir, "documents"))


def doc_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher §A1.1 quality-rule panel (per-doc metrics + pass flag)."""
    return lq.gopher_rules(load_table(spark, sf_dir, "documents"))


def doc_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights: hashed-ngram log-likelihood ratio of
    each doc against the English slice as the target distribution."""
    docs = load_table(spark, sf_dir, "documents")
    return ltm.importance_weights(docs, docs.filter("lang = 'en'"))


def doc_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-wide line dedup: first occurrence of each
    long line survives; documents reassembled in order."""
    return ldd.line_dedup(load_table(spark, sf_dir, "documents"))


def doc_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 §2.2 line-level cleaning rules with auditable retention."""
    return lq.c4_line_filter(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# embeddings: similarity search
# --------------------------------------------------------------------------

_N_QUERIES = 5
_TOP_K = 5
_IVF_CELLS = 8
_IVF_PROBE = 2


def _query_set(embeddings: DataFrame) -> DataFrame:
    return embeddings.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def vec_top_k_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k for a broadcast query set."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.top_k_bruteforce(emb, _query_set(emb), k=_TOP_K)


#: fixed lexical query over the synthetic vocabulary (df-diverse) and
#: the fixed query vector id for the hybrid entry
_BM25_QUERY = ("spark", "vector", "merge")
_HYBRID_QVEC_ID = 7
_HYBRID_LIST_K = 20
_RRF_K = 60


def doc_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 lexical top-10 (llm/terms.py::bm25_topk) — keyword
    retrieval over the documents table: broadcast query-term filter
    collapses the token explode before any aggregate; df and corpus
    stats ride tiny broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    return ltm.bm25_topk(docs, _BM25_QUERY, k=10)


def doc_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-construction audit (llm/terms.py::vocab_coverage):
    top-50 corpus tokens with share and cumulative coverage — the
    "how big a vocab covers X% of the stream" question; counts are
    one partial agg and the cut a distributed TakeOrderedAndProject,
    so the rank windows see ≤ 50 rows."""
    docs = load_table(spark, sf_dir, "documents")
    return ltm.vocab_coverage(docs, v=50)


_PRF_FEEDBACK_K = 5
_PRF_EXPAND_M = 3


def doc_prf_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pseudo-relevance-feedback expansion audit
    (llm/terms.py::prf_expansion_terms): which terms the BM25 top-5
    feedback docs nominate (idf · feedback-tf, the RM3-lite loop) —
    exposed as its own entry so the expansion step the PRF search
    consumes is independently hash-verified."""
    docs = load_table(spark, sf_dir, "documents")
    return ltm.prf_expansion_terms(
        docs, _BM25_QUERY, feedback_k=_PRF_FEEDBACK_K, expand_m=_PRF_EXPAND_M
    )


def doc_bm25_prf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 with one pseudo-relevance-feedback round
    (llm/terms.py::bm25_prf_topk): re-query with the original terms ∪
    the top-3 expansion terms — the recall loop lexical stacks run
    when the original query is short.  The bounded expansion list is
    the only driver-side state (≤ 3 strings); the twin derives the
    SAME expanded set in-SQL."""
    docs = load_table(spark, sf_dir, "documents")
    return ltm.bm25_prf_topk(
        docs,
        _BM25_QUERY,
        k=10,
        feedback_k=_PRF_FEEDBACK_K,
        expand_m=_PRF_EXPAND_M,
    )


_MMR_K = 8
_MMR_POOL = 20
_MMR_LAMBDA = 0.7


def vec_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversity re-rank (llm/vectors.py::mmr_rerank) — greedy
    λ·relevance − (1−λ)·max-sim-to-selected over the exact-cosine
    top-20 pool for the standard 5-query set; the post-retrieval pass
    that keeps the final list from being near-duplicates of the best
    hit."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.mmr_rerank(
        emb, _query_set(emb), k=_MMR_K, pool=_MMR_POOL, lam=_MMR_LAMBDA
    )


#: Delta split for the incremental embedding dedup (the doc-side
#: _DELTA_SPLIT_ID analogue): corpus = vec_id < split, delta = rest.
_VEC_DELTA_SPLIT = 250


def vec_dedup_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental SEMANTIC dedup at the embedding level (r12): admit
    only delta vectors (``vec_id ≥ _VEC_DELTA_SPLIT``) with no cosine
    near-duplicate (≥ 0.4) in the earlier corpus —
    :func:`llm.vectors.cosine_dedup_delta`, the vector analogue of
    ``doc_dedup_delta``.  R-S banded sign-LSH: delta band keys join
    corpus band keys, so per-batch cost ∝ delta × collision fan-in
    while the corpus contributes one narrow key projection — the
    shape that holds when the accumulated corpus is 100 TB and the
    delta is a day's ingest.

    ``n_planes`` is PINNED to 4 (the ``vec_cosine_near_dup_pinned``
    precedent): the default derives planes from the corpus+delta
    count at runtime, so past ``target_bucket_size`` rows the engine
    would silently widen its band keys while the DuckDB twin stays at
    ``_band_planes(3, 4)`` and the hash would diverge with scale
    factor."""
    emb = _load_embeddings(spark, sf_dir)
    corpus = emb.where(F.col("vec_id") < _VEC_DELTA_SPLIT)
    delta = emb.where(F.col("vec_id") >= _VEC_DELTA_SPLIT)
    return (
        lvec.cosine_dedup_delta(corpus, delta, n_planes=4)
        .select("vec_id", "label")
        .orderBy("vec_id")
    )


def vec_mmr_rerank_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DISTRIBUTED MMR greedy (r12, the r11 verdict's #6): the
    identical query set and dials as ``vec_mmr_rerank`` but forced
    down the Arrow-batched ``applyInPandas`` grouped-map path — one
    group per query_id, driver state O(1) — the shape a large query
    batch (|Q| in the thousands) runs, where collecting |Q|·pool²
    similarity rows to the driver stops being bounded.  Both paths
    execute the same :func:`llm.vectors._mmr_greedy_pool` arithmetic,
    so this entry SHARES vec_mmr_rerank's DuckDB twin — the driver
    hash proves the dispatch is semantically invisible."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.mmr_rerank(
        emb,
        _query_set(emb),
        k=_MMR_K,
        pool=_MMR_POOL,
        lam=_MMR_LAMBDA,
        distributed=True,
    )


def doc_hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval: BM25 lexical top-20 × exact-cosine vector
    top-20 (query = embedding of vec_id 7), fused by reciprocal-rank
    fusion (llm/terms.py::rrf_fuse, k=60) — the calibration-free
    combiner real search stacks run; final cut = fused top-10 with
    deterministic (score DESC, id) ranking."""
    docs = load_table(spark, sf_dir, "documents")
    emb = _load_embeddings(spark, sf_dir)
    lex = ltm.bm25_topk(docs, _BM25_QUERY, k=_HYBRID_LIST_K).select(
        "doc_id", "rk"
    )
    q = emb.filter(F.col("vec_id") == _HYBRID_QVEC_ID).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = lvec.top_k_bruteforce(emb, q, k=_HYBRID_LIST_K).select(
        F.col("vec_id").alias("doc_id"), "rk"
    )
    fused = ltm.rrf_fuse([lex, vec], rrf_k=_RRF_K)
    from pyspark.sql import Window

    # fused is bounded by the two input lists (≤ 2·_HYBRID_LIST_K
    # rows) but the same TakeOrderedAndProject-then-rank shape as
    # bm25_topk keeps the final window's input ≤ 10 rows regardless.
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(10)
        .withColumn("rk", F.row_number().over(w))
        .select(
            "doc_id",
            "rrf_score",
            F.col("n_lists").cast("int").alias("n_lists"),
            F.col("rk").cast("int").alias("rk"),
        )
        .orderBy("rk")
    )


_SERVE_POOL = 12
_SERVE_K = 6


def retrieval_serving_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """END-TO-END retrieval serving composition (r11, PRF leg r12):
    :func:`llm.vectors.search_ivf_index` (ANN candidates off the
    PERSISTED cell-partitioned index — directory-level partition
    pruning, the raw corpus is never scanned) × BM25 lexical leg ×
    RM3-expanded BM25 leg (:func:`llm.terms.bm25_prf_topk` — the
    pseudo-relevance-feedback re-query, so the fusion covers the full
    published stack BM25 + RM3 + ANN) → :func:`llm.terms.rrf_fuse` →
    :func:`llm.vectors.mmr_rerank_candidates` diversity re-rank with
    ``rel`` = the RRF fusion score.  This is the shape a 100-TB
    retrieval user actually runs — each stage was individually green
    before r11; this entry oracle-checks the COMPOSITION (the r10
    verdict's #3; third leg = the r11 verdict's #5).  Pool cut =
    top-``_SERVE_POOL`` fused candidates that have a well-formed
    embedding (no geometry → cannot be diversified), deterministic on
    (rrf_score DESC, doc_id)."""
    import os
    import tempfile

    docs = load_table(spark, sf_dir, "documents")
    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_serve", sf_tag
    )
    cent = lvec.build_ivf_index(emb, path, n_cells=_IVF_CELLS)
    q = emb.filter(F.col("vec_id") == _HYBRID_QVEC_ID).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    vec = lvec.search_ivf_index(
        spark, path, q, k=_HYBRID_LIST_K, n_probe=_IVF_PROBE,
        cent_rows=cent,
    ).select(F.col("vec_id").alias("doc_id"), "rk")
    # one shared tokenize pass across the lexical leg and the whole
    # PRF round (r15 opt — previously 4 independent corpus tokenizes)
    tk = ltm.tokenized_corpus(docs)
    lex = ltm.bm25_topk(
        docs, _BM25_QUERY, k=_HYBRID_LIST_K, tokenized=tk
    ).select("doc_id", "rk")
    lex_prf = ltm.bm25_prf_topk(
        docs,
        _BM25_QUERY,
        k=_HYBRID_LIST_K,
        feedback_k=_PRF_FEEDBACK_K,
        expand_m=_PRF_EXPAND_M,
        tokenized=tk,
    ).select("doc_id", "rk")
    fused = ltm.rrf_fuse([lex, lex_prf, vec], rrf_k=_RRF_K)
    valid = emb.filter(lvec.finite_vec("embedding", lvec.EMBEDDING_DIM)).select(
        F.col("vec_id").alias("doc_id")
    )
    pool = (
        fused.join(valid, on="doc_id", how="left_semi")
        .orderBy(F.desc("rrf_score"), F.asc("doc_id"))
        .limit(_SERVE_POOL)
    )
    cand = pool.select(
        F.lit(_HYBRID_QVEC_ID).cast("bigint").alias("query_id"),
        F.col("doc_id").alias("vec_id"),
        F.col("rrf_score").alias("rel"),
    )
    return lvec.mmr_rerank_candidates(
        cand, emb, k=_SERVE_K, lam=_MMR_LAMBDA
    ).orderBy("rk")


def vec_top_k_ann_signlsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH bucketed approximate top-k (bucket equi-join, no
    all-pairs)."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.top_k_ann_signlsh(emb, _query_set(emb), k=_TOP_K)


def vec_top_k_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k: deterministic seeded coarse
    quantizer, inverted-list equi-join, n_probe recall dial."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.top_k_ann_ivf(
        emb, _query_set(emb), k=_TOP_K, n_cells=_IVF_CELLS, n_probe=_IVF_PROBE
    )


def vec_ivf_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index IVF search (round 5): build the cell-partitioned
    parquet index (:func:`llm.vectors.build_ivf_index`) and answer the
    query set from it with directory-level partition pruning — only
    the probed cells' files are read.  Same deterministic seed
    quantizer and dials as ``vec_top_k_ann_ivf``, so the results (and
    the SQL oracle twin) are identical; the driver hash therefore
    proves the persisted round-trip is lossless AND the pruned search
    returns exactly what the in-memory operator does."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_index", sf_tag
    )
    # r16 opt: thread the frozen centroids the build just returned
    cent = lvec.build_ivf_index(emb, path, n_cells=_IVF_CELLS)
    return lvec.search_ivf_index(
        spark, path, _query_set(emb), k=_TOP_K, n_probe=_IVF_PROBE,
        cent_rows=cent,
    ).orderBy("query_id", "rk")


def vec_ivf_index_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted-index LIFECYCLE end-to-end (r13): bootstrap the IVF
    index from the first corpus slice (vec_id < 100 — contains the 8
    id-ordered seed rows, so the frozen centroids equal a full-corpus
    build's), merge two delta batches (:func:`llm.vectors
    .add_to_ivf_index`, each rewriting only its touched cells), then
    COMPACT the accreted per-cell files
    (:func:`llm.vectors.compact_ivf_index`) and search with the
    standard dials.  Shares ``vec_ivf_index_search``'s DuckDB twin —
    a green hash proves build → merge → merge → compact → search is
    lossless, i.e. the maintenance operations a long-running 100-TB
    serving index actually undergoes never change an answer."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_compact", sf_tag
    )
    # the bootstrap build statically overwrites the cells dir, so the
    # entry is idempotent across bench repeats
    # r16 opt: centroids are FROZEN across merge+compact, so the
    # build's returned rows thread through both merges and the search
    # (this build writes no metadata columns — stored_meta=[])
    cent = lvec.build_ivf_index(
        emb.where(F.col("vec_id") < 100), path, n_cells=_IVF_CELLS
    )
    lvec.add_to_ivf_index(
        emb.where((F.col("vec_id") >= 100) & (F.col("vec_id") < 300)),
        path,
        cent_rows=cent,
        stored_meta=[],
    )
    lvec.add_to_ivf_index(
        emb.where(F.col("vec_id") >= 300), path, cent_rows=cent,
        stored_meta=[],
    )
    lvec.compact_ivf_index(spark, path)
    return lvec.search_ivf_index(
        spark, path, _query_set(emb), k=_TOP_K, n_probe=_IVF_PROBE,
        cent_rows=cent,
    ).orderBy("query_id", "rk")


def vec_index_forget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-layer ERASURE end-to-end (r13): build the persisted IVF
    index over the corpus ∪ a shifted-id CLONE of every vector
    (vec_id + 10⁷, same embedding — exact ties with the originals, so
    an un-forgotten clone WOULD displace real rows from the top-k),
    then :func:`llm.vectors.delete_from_ivf_index` the clone ids and
    search with the standard dials.  Shares ``vec_ivf_index_search``'s
    twin: a green hash proves the delete removed exactly the clones —
    every one of them (ties would leak into the results) and nothing
    else (missing real rows would change the results).  The
    right-to-be-forgotten path a serving vector store actually needs:
    only cells holding a target id rewrite; no rebuild."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_forget", sf_tag
    )
    clones = emb.select(
        (F.col("vec_id") + F.lit(10_000_000)).alias("vec_id"), "embedding"
    )
    # clone ids are all LARGER than every real id, so the 8 id-ordered
    # seed centroids equal the clean build's; the bootstrap build
    # statically overwrites the cells dir (idempotent across repeats)
    cent = lvec.build_ivf_index(
        emb.select("vec_id", "embedding").unionByName(clones),
        path,
        n_cells=_IVF_CELLS,
    )
    lvec.delete_from_ivf_index(clones.select("vec_id"), path)
    # r16 opt: erasure never touches the centroid relation — the
    # build's returned rows thread into the search
    return lvec.search_ivf_index(
        spark, path, _query_set(emb), k=_TOP_K, n_probe=_IVF_PROBE,
        cent_rows=cent,
    ).orderBy("query_id", "rk")


_FILTER_LABELS = (1, 3, 5, 7, 9)

#: Selective predicate for the FILTERED-ANN entry (~1.7% of the
#: corpus): sparse enough that the first probe rung genuinely starves
#: at the tested scale factors, so the deterministic probe-widening
#: ladder actually exercises (at sf0.01 several queries widen to the
#: full rung).  Spelled once — the Spark scan filter and the DuckDB
#: twin share the string verbatim.
_FILTERED_ANN_PRED = "label = 3 AND vec_id % 7 = 0"


def vec_filtered_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN over the PERSISTED IVF index (r12, the r11
    verdict's #2): the metadata predicate rides the pruned index —
    ``label`` is carried into the cell files (``meta_cols``), so the
    scan sees BOTH ``cell_id isin(probes)`` as PartitionFilters and
    the label predicate as a pushed data filter (pinned in
    tests/test_plans.py).  k is guaranteed by the deterministic
    probe-widening ladder (:func:`llm.vectors.probe_ladder`):
    a query whose probed cells starve under the selective predicate
    escalates 2→4→8 probes rather than returning < k rows — the
    recall contract vector stores document for filtered search.
    ``vec_filtered_topk`` keeps the exact-bruteforce form; this is
    the shape that survives 100 TB (reads ``eff_p/n_cells`` of the
    index bytes per query)."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivf_filtered", sf_tag
    )
    cent = lvec.build_ivf_index(
        emb, path, n_cells=_IVF_CELLS, meta_cols=["label"]
    )
    return lvec.search_ivf_index_filtered(
        spark,
        path,
        _query_set(emb),
        where=_FILTERED_ANN_PRED,
        k=_TOP_K,
        n_probe=_IVF_PROBE,
        cent_rows=cent,
    ).orderBy("query_id", "rk")


def vec_filtered_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered ANN over the persisted IVF-PQ index (r14, the r12
    verdict's #6 carried through r13): the PRODUCTION serving reality
    — metadata predicate AND compressed codes at once.  ``label``
    rides the CODE files (``meta_cols``), so the scan sees ``cell_id
    isin(probes)`` as PartitionFilters and the label predicate as a
    pushed data filter (plan-pinned in tests/test_filtered_ann.py);
    the probe ladder re-derives each query's effective probe count
    from the FILTERED cell populations (starvation-escalation pinned);
    raw vectors are fetched BY ID only for the exact re-rank of the
    ≤ rerank·k survivors.

    Rows-only driver check, like every production-dial PQ entry (the
    per-subspace KMeans codebooks are engine-specific); the
    exhaustive-dial collapse to filtered bruteforce is unit-pinned."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivfpq_filtered", sf_tag
    )
    cent, codes = lvec.build_ivfpq_index(
        emb, path, n_cells=_IVF_CELLS, meta_cols=["label"]
    )
    return lvec.search_ivfpq_index_filtered(
        spark,
        path,
        _query_set(emb),
        where=_FILTERED_ANN_PRED,
        k=_TOP_K,
        n_probe=_IVF_PROBE,
        rerank=4,
        cent_rows=cent,
        by_sub=codes,
    ).orderBy("query_id", "rk")


def vec_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — the metadata-predicate + similarity
    composition every vector store serves ("nearest docs WHERE
    lang='en'"): exact cosine top-k restricted to corpus vectors with
    an odd label.  The predicate is applied BEFORE scoring, so
    Catalyst pushes it into the parquet scan (pre-filter semantics —
    the top-k is over the filtered corpus, never a post-filtered
    top-k that can return < k rows)."""
    emb = _load_embeddings(spark, sf_dir)
    corpus = emb.where(F.col("label").isin(*_FILTER_LABELS))
    return lvec.top_k_bruteforce(corpus, _query_set(emb), k=_TOP_K)


_RECALL_PROBES = (1, 2, 4, 8)
_RECALL_PLANES = (4, 6, 8)


def vec_ann_recall_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k-vs-dial curve — the dial a 100-TB ANN
    operator otherwise tunes blind (r10 verdict #7): for each IVF
    ``n_probe`` in {1,2,4,8} (and the sign-LSH point at its frozen
    plane count), the fraction of exact bruteforce top-k rows the ANN
    variant reproduces → ``(method, dial, matched, truth, recall)``.
    ``n_probe = n_cells`` probes every cell, so the curve must END at
    recall 1.0 (pinned, with monotonicity, in tests/test_llm.py).
    All legs are deterministic (seeded centroids, frozen planes), so
    the whole curve has a DuckDB twin — no rows-only concession."""
    emb = _load_embeddings(spark, sf_dir)
    q = _query_set(emb)
    bf = lstg.stage(
        lvec.top_k_bruteforce(emb, q, k=_TOP_K).select("query_id", "vec_id")
    )
    # eager fill (r15 opt): bf feeds the 1-row truth broadcast AND one
    # join side of every recall leg — seven references in the final
    # unioned query plus a broadcast build that races them; an
    # unfilled lazy cache re-ran the bruteforce per reference (the
    # freeze-manifest finding)
    bf.count()
    truth = F.broadcast(bf.agg(F.count(F.lit(1)).alias("truth")))

    def _leg(ann: DataFrame, method: str, dial: int) -> DataFrame:
        return (
            ann.select("query_id", "vec_id")
            .join(bf, on=["query_id", "vec_id"])
            .agg(F.count(F.lit(1)).alias("matched"))
            .crossJoin(truth)  # 1-row totals relation
            .select(
                F.lit(method).alias("method"),
                F.lit(dial).cast("int").alias("dial"),
                "matched",
                "truth",
                F.round(F.col("matched") / F.col("truth"), 6).alias("recall"),
            )
        )

    # all four n_probe dials from ONE corpus assignment + scoring pass
    # (lvec.top_k_ann_ivf_multidial, r15 opt — row-identical to four
    # independent top_k_ann_ivf calls; the twin is unchanged)
    legs = [
        _leg(ann, "ivf_n_probe", p)
        for p, ann in lvec.top_k_ann_ivf_multidial(
            emb, q, k=_TOP_K, n_cells=_IVF_CELLS, probes=_RECALL_PROBES
        )
    ]
    # sign-LSH dial: FEWER planes = coarser buckets = more candidates
    # (an n-plane bucket refines every prefix bucket), so recall is
    # monotone NONINCREASING in plane count — the mirror dial of
    # n_probe, pinned in the same test
    legs.extend(
        _leg(
            lvec.top_k_ann_signlsh(
                emb, q, k=_TOP_K, planes=lvec.PLANE_POOL[:n]
            ),
            "signlsh_n_planes",
            n,
        )
        for n in _RECALL_PLANES
    )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("method", "dial")


_PQ_RECALL_RERANK = (1, 2, 4)


def vec_ann_recall_profile_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured recall@k-vs-dial curve for the COMPRESSED index (r12,
    the r11 verdict's #8): the IVF-PQ operator's ``rerank`` dial
    swept at production probes, plus the exhaustive verification
    endpoint (probe everything, full re-rank) which provably
    collapses to bruteforce — recall 1.0.  Monotone NONDECREASING in
    ``rerank``: a larger candidate set can only add truth rows (any
    global-top-k member in the candidate set survives the exact
    re-rank), pinned with the endpoint in tests/test_ivfpq_index.py.

    Rows-only driver check (KMeans codebooks are engine-specific,
    same declaration as vec_top_k_ann_ivfpq); the RAW-index curve
    (``vec_ann_recall_profile``) stays fully hash-checked.

    Shape: train-once/sweep-many — the seeded centroids + codebooks
    are trained ONCE (:func:`llm.vectors.train_ivfpq_params`, both
    bounded local relations) and passed to every leg instead of each
    leg re-training the identical quantizer.  Measured honestly
    (scripts/bench_isolated.py, 4 runs each): locally ≈ NEUTRAL
    (12.5 s vs 12.8 s median — the trainings are cheap driver fits;
    ADC scoring + the bruteforce truth joins dominate), kept for the
    single-training cleanliness.  The persisted build-once form was
    measured too and LOSES at bench scale (four pruned searches pay
    4× parquet round-trips where the in-memory legs share one staged
    corpus) while being the form that wins at 100 TB; the dial sweep
    uses the in-memory one because its job is measuring recall, not
    serving."""
    emb = _load_embeddings(spark, sf_dir)
    q = _query_set(emb)
    cents, books = lvec.train_ivfpq_params(emb, n_cells=_IVF_CELLS)
    bf = lstg.stage(
        lvec.top_k_bruteforce(emb, q, k=_TOP_K).select("query_id", "vec_id")
    )
    # eager fill — same multi-reference shape as vec_ann_recall_profile
    bf.count()
    truth = F.broadcast(bf.agg(F.count(F.lit(1)).alias("truth")))

    def _leg(ann: DataFrame, method: str, dial: int) -> DataFrame:
        return (
            ann.select("query_id", "vec_id")
            .join(bf, on=["query_id", "vec_id"])
            .agg(F.count(F.lit(1)).alias("matched"))
            .crossJoin(truth)  # 1-row totals relation
            .select(
                F.lit(method).alias("method"),
                F.lit(dial).cast("int").alias("dial"),
                "matched",
                "truth",
                F.round(F.col("matched") / F.col("truth"), 6).alias("recall"),
            )
        )

    # all rerank dials from ONE encode + ADC + widest-cut exact-re-rank
    # pass (lvec.top_k_ann_ivfpq_multirerank, r15 opt — row-identical
    # to the independent per-dial calls)
    legs = [
        _leg(ann, "ivfpq_rerank", r)
        for r, ann in lvec.top_k_ann_ivfpq_multirerank(
            emb,
            q,
            k=_TOP_K,
            reranks=_PQ_RECALL_RERANK,
            n_cells=_IVF_CELLS,
            n_probe=_IVF_PROBE,
            centroids=cents,
            codebooks=books,
        )
    ]
    legs.append(
        _leg(
            lvec.top_k_ann_ivfpq(
                emb,
                q,
                k=_TOP_K,
                n_cells=_IVF_CELLS,
                n_probe=_IVF_CELLS,
                rerank=1 << 30,
                centroids=cents,
                codebooks=books,
            ),
            "ivfpq_exhaustive",
            _IVF_CELLS,
        )
    )
    out = legs[0]
    for leg in legs[1:]:
        out = out.unionByName(leg)
    return out.orderBy("method", "dial")


def vec_top_k_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k over KMEANS-trained centroids — the
    production coarse quantizer (pyspark.ml Lloyd iterations run
    distributed), plugged into the same literal-centroid search plan
    as the seeded IVF entry.

    Rows-only driver check (no oracle): the KMeans fit is iterative
    and engine-specific, so no static SQL can reproduce the cell
    boundaries.  Quality is pinned by tests/test_llm.py's
    recall@k-vs-bruteforce assertion instead."""
    emb = _load_embeddings(spark, sf_dir)
    cents = lvec.train_centroids_kmeans(emb, n_cells=_IVF_CELLS)
    return lvec.top_k_ann_ivf(
        emb,
        _query_set(emb),
        k=_TOP_K,
        n_cells=_IVF_CELLS,
        n_probe=_IVF_PROBE,
        centroids=cents,
    ).orderBy("query_id", "rk")


def vec_top_k_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-k with asymmetric distance computation
    and exact re-ranking (FAISS IVFADC shape; Jégou et al., TPAMI'11):
    the corpus carries 16-bit PQ codes of the cell residual instead of
    raw vectors, the probe join scores candidates from a per-query
    m×k lookup table, and the top ``rerank·k`` candidates re-rank on
    exact cosine by id — the billion-scale retrieval layout where the
    scan reads codes, not vectors.

    Rows-only driver check (no oracle): the per-subspace KMeans
    codebooks are engine-specific.  Quality is pinned by
    tests/test_llm.py — exhaustive probe+rerank reproduces bruteforce
    exactly, and recall@5 ≥ 0.6 at production dials."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.top_k_ann_ivfpq(
        emb,
        _query_set(emb),
        k=_TOP_K,
        n_cells=_IVF_CELLS,
        n_probe=_IVF_PROBE,
        rerank=4,
    ).orderBy("query_id", "rk")


def vec_ivfpq_index_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Search over the PERSISTED IVF-PQ index (r12, the r11 verdict's
    #3): :func:`llm.vectors.build_ivfpq_index` stores 16-bit PQ codes
    per cell (partitioned — probes prune at the directory level and
    read ~30× fewer bytes than the raw-vector index, ratio pinned in
    tests/test_ivfpq_index.py) plus a separate raw-vector relation
    fetched BY ID for the exact re-rank.  Same dials as the in-memory
    ``vec_top_k_ann_ivfpq``, and the persisted round-trip is pinned
    IDENTICAL to it by unit test.

    Rows-only driver check (no oracle): the per-subspace KMeans
    codebooks are engine-specific (same declaration as the in-memory
    entry); recall@5 vs bruteforce floor is unit-pinned."""
    import os
    import tempfile

    emb = _load_embeddings(spark, sf_dir)
    sf_tag = os.path.basename(os.path.normpath(sf_dir))
    path = os.path.join(
        tempfile.gettempdir(), "spark_graft_ivfpq_index", sf_tag
    )
    # r16 opt (guide §2.4): the build returns the frozen parameters
    # it just wrote; threading them into the search skips two bounded
    # re-collect jobs (doubles round-trip parquet exactly — identical)
    cent, codes = lvec.build_ivfpq_index(emb, path, n_cells=_IVF_CELLS)
    return lvec.search_ivfpq_index(
        spark,
        path,
        _query_set(emb),
        k=_TOP_K,
        n_probe=_IVF_PROBE,
        rerank=4,
        cent_rows=cent,
        by_sub=codes,
    ).orderBy("query_id", "rk")


def vec_ann_exhaustive_equiv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ at the VERIFICATION dials — exhaustive probe
    (``n_probe = n_cells``) and full re-rank (``rerank·k`` ≥ corpus) —
    which provably collapses to exact bruteforce top-k: every corpus
    vector is a candidate and the final ordering is the exact-cosine
    re-rank with the same ``(cos DESC, vec_id)`` tie-break and the same
    ``dot``/``norm`` accumulation as :func:`llm.vectors
    .top_k_bruteforce`.  The oracle is therefore the BRUTEFORCE SQL
    twin, turning the KMeans-backed retrieval path (coarse quantizer,
    residual PQ encode, ADC scoring, candidate window, id re-rank join)
    into a driver HASH-verified entry — the engine-specific codebooks
    cancel out of the final ordering at these dials.  Production dials
    (`vec_top_k_ann_ivfpq`) stay rows-only with unit-pinned recall."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.top_k_ann_ivfpq(
        emb,
        _query_set(emb),
        k=_TOP_K,
        n_cells=_IVF_CELLS,
        n_probe=_IVF_CELLS,  # probe every cell
        rerank=1 << 30,  # rerank·k ≥ any corpus → exact over all
    ).orderBy("query_id", "rk")


def vec_cosine_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via BANDED sign-LSH at the
    PRODUCTION dials: ``n_planes`` omitted, so the plane count derives
    from the corpus size and bucket population stays ~constant at any
    N.  The static SQL twin pins 4 planes — valid because
    ``derive_n_planes`` resolves to exactly 4 at every test scale
    (≤16384 vectors), which ``tests/test_llm.py::
    test_headline_production_dials_match_static_twin`` asserts loudly;
    if the fixtures ever outgrow that, the twin must re-pin (or the
    entry falls back to :func:`vec_cosine_near_dup_pinned`)."""
    return lvec.cosine_near_dup_pairs(
        _load_embeddings(spark, sf_dir), n_bands=3
    ).orderBy("id_a", "id_b")


def vec_cosine_near_dup_pinned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-dial variant (3 bands × 4 planes) for the static SQL
    oracle — the checkable twin of the production entry above; kept
    past the driver window so dial changes to the headline can't
    silently desync from the SQL."""
    return lvec.cosine_near_dup_pairs(
        _load_embeddings(spark, sf_dir), n_bands=3, n_planes=4
    ).orderBy("id_a", "id_b")


def vec_centroid_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF building block: per-label centroids + cosine of each vector
    to its own centroid."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.centroid_distances(emb)


def vec_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension min-max int8 quantization of the embedding
    column: exact code hashes + mean squared dequantization error."""
    emb = _load_embeddings(spark, sf_dir)
    return lvec.quantize_int8(emb).orderBy("vec_id")


# --------------------------------------------------------------------------
# multimodal plumbing
# --------------------------------------------------------------------------


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via Arrow-batched mapInPandas
    (deterministic fake decode — see llm.multimodal)."""
    docs = load_table(spark, sf_dir, "documents")
    return lmm.extract_features(lmm.documents_as_media(docs), decode="fake")


def multimodal_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte format audit + exact payload dedup over a media
    table with REAL container magics spliced per doc (and a planted
    labeling defect every 7th id) — the pre-decode data-quality gate
    (llm/multimodal.py::media_integrity_audit).  Detection, hashing
    JVM-side on the scan; dedup shuffles the 64-char sha, never the
    payload bytes."""
    docs = load_table(spark, sf_dir, "documents")
    return lmm.media_integrity_audit(lmm.documents_as_mixed_media(docs))


def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-shaped frame sampling end-to-end: Arrow mapInPandas
    decode (deterministic fake codec) → JVM-side ``posexplode`` frame
    fan-out → even-coverage indices with a deterministic
    min-``sample_idx`` collapse when samples outnumber frames
    (:func:`llm.multimodal.sample_frames`).  The oracle replays the
    byte-length-derived frame counts and the same floor arithmetic, so
    the hash covers the full sampling rule."""
    docs = load_table(spark, sf_dir, "documents")
    media = lmm.documents_as_media(docs)
    return lmm.sample_frames(media, n_samples=4).orderBy(
        "media_id", "sample_idx"
    )


# --------------------------------------------------------------------------
# content hygiene: decontamination, repetition, PII (round 4)
# --------------------------------------------------------------------------

#: Deterministic benchmark carve-out for the decontamination entry:
#: every 20th doc plays the eval set; the rest is the corpus.
_BENCH_PRED = "doc_id % 20 = 0"
_CORPUS_PRED = "doc_id % 20 <> 0"


def vec_quantize_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product quantization (m=4 subspaces × k=16 learned centroids →
    16-bit codes): per-subspace KMeans codebooks, literal-inlined
    encode, reconstruction MSE.  Rows-only driver check (KMeans cell
    boundaries are engine-specific); reconstruction quality is pinned
    by unit tests (tests/test_pipeline_ops.py).

    The ``pq_codes`` array is serialized to a comma-joined string for
    the DRIVER ENTRY only: the driver's rows-only canonicalizer sorts
    result columns through pandas, which cannot hash list cells (every
    returned column must be scalar — pinned for all driver entries by
    tests/test_plan_lint.py).  Library callers use
    :func:`llm.vectors.quantize_pq` and get the raw ``array<int>``."""
    emb = _load_embeddings(spark, sf_dir)
    return (
        lvec.quantize_pq(emb, m=4, k=16)
        .withColumn(
            "pq_codes", F.concat_ws(",", F.col("pq_codes").cast("array<string>"))
        )
        .orderBy("vec_id")
    )


def doc_dup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate clusters via alternating large-star/small-star
    contraction — the O(log² n)-round CC path for long-diameter
    graphs; same oracle as the min-label entry (the closure is the
    closure)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ldd.near_dup_pairs_banded(docs).select("id_a", "id_b")
    return lcc.connected_components_alternating(pairs).orderBy("doc_id")


def doc_dup_clusters_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BOTH connected-components algorithms over ONE staged pair set,
    tagged and stacked: min-label propagation (diameter-bounded
    rounds) and alternating large-star/small-star (O(log² n) rounds).
    The pair generation — which dominates either single entry's cost —
    runs once, and the panel hash verifies the two algorithms agree
    EXACTLY on every component label (they must: the closure is the
    closure; the oracle is one recursive CTE emitted under both
    tags)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lstg.stage(
        ldd.near_dup_pairs_banded(docs).select("id_a", "id_b")
    )
    cc = lcc.connected_components(pairs).select(
        F.lit("min_label").alias("algo"), "doc_id", "cluster_id"
    )
    star = lcc.connected_components_alternating(pairs).select(
        F.lit("star").alias("algo"), "doc_id", "cluster_id"
    )
    return cc.unionByName(star).orderBy("algo", "doc_id")


def doc_decontaminated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-decontamination overlap: corpus docs sharing ≥2
    distinct 3-gram shingles with the (broadcast) benchmark carve-out.
    The benchmark fingerprint is tiny → map-side semi-join; the only
    shuffle is the per-doc overlap count."""
    docs = load_table(spark, sf_dir, "documents")
    corpus = docs.filter(F.expr(_CORPUS_PRED))
    bench = docs.filter(F.expr(_BENCH_PRED))
    return ldec.contamination_overlap(
        corpus, bench, shingle_n=3, min_shared=2
    ).orderBy("doc_id")


def doc_repetition_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition metrics per doc (top-token fraction +
    duplicated-trigram fraction)."""
    docs = load_table(spark, sf_dir, "documents")
    return lq.repetition_profile(docs).orderBy("doc_id")


def doc_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction over deterministically PII-seeded text (the
    synthetic corpus carries none, so emails/IPs/phones derived from
    doc_id are appended identically in Spark and the SQL twin; the
    operator then masks them and counts matches)."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id"),
            F.lit("@mail.example.com from 10.2."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit(".7 call 555-123-4567"),
        ).alias("text"),
    )
    return (
        lq.redact_pii(seeded)
        .select(
            "doc_id",
            "clean_text",
            F.col("n_redactions").cast("long").alias("n_redactions"),
        )
        .orderBy("doc_id")
    )


QUERIES = {
    "doc_exact_dedup": doc_exact_dedup,
    "doc_normalized_dedup": doc_normalized_dedup,
    "doc_near_dup_banded": doc_near_dup_banded,
    "doc_pagerank": doc_pagerank,
    "doc_pagerank_weighted": doc_pagerank_weighted,
    "corpus_keep_central": corpus_keep_central,
    "doc_ngram_jaccard": doc_ngram_jaccard,
    "doc_ngram_jaccard_prefix": doc_ngram_jaccard_prefix,
    "doc_ngram_jaccard_auto": doc_ngram_jaccard_auto,
    "doc_cross_corpus_jaccard": doc_cross_corpus_jaccard,
    "pipeline_split_leakage": pipeline_split_leakage,
    "doc_graph_triangles": doc_graph_triangles,
    "doc_graph_communities": doc_graph_communities,
    "corpus_shuffle_order": corpus_shuffle_order,
    "doc_near_dup_minhash_ml": doc_near_dup_minhash_ml,
    "doc_near_dup_removal": doc_near_dup_removal,
    "corpus_clean_pipeline": corpus_clean_pipeline,
    "corpus_training_freeze": corpus_training_freeze,
    "corpus_freeze_stats": corpus_freeze_stats,
    "corpus_freeze_delta": corpus_freeze_delta,
    "corpus_freeze_audit": corpus_freeze_audit,
    "vocab_bpe_merges": vocab_bpe_merges,
    "corpus_cluster_balance": corpus_cluster_balance,
    "vocab_bpe_encode": vocab_bpe_encode,
    "corpus_freeze_clustered": corpus_freeze_clustered,
    "corpus_semantic_dedup": corpus_semantic_dedup,
    "doc_dedup_delta": doc_dedup_delta,
    "doc_simhash_buckets": doc_simhash_buckets,
    "doc_simhash_near_dup": doc_simhash_near_dup,
    "doc_dup_clusters": doc_dup_clusters,
    "doc_dup_clusters_star": doc_dup_clusters_star,
    "doc_dup_clusters_panel": doc_dup_clusters_panel,
    "corpus_keep_best": corpus_keep_best,
    "doc_chunk_dedup": doc_chunk_dedup,
    "doc_weighted_sample": doc_weighted_sample,
    "corpus_mixture_sample": corpus_mixture_sample,
    "doc_pack_bins": doc_pack_bins,
    "doc_decontaminated": doc_decontaminated,
    "doc_repetition_profile": doc_repetition_profile,
    "doc_pii_redact": doc_pii_redact,
    "pipeline_split_panel": pipeline_split_panel,
    "doc_tfidf_top_terms": doc_tfidf_top_terms,
    "doc_token_chunks": doc_token_chunks,
    "doc_lm_quality": doc_lm_quality,
    "doc_tfidf_cosine_pairs": doc_tfidf_cosine_pairs,
    "doc_dup_spans": doc_dup_spans,
    "doc_dup_span_removal": doc_dup_span_removal,
    "doc_winnow_fingerprints": doc_winnow_fingerprints,
    "doc_winnow_pairs": doc_winnow_pairs,
    "doc_gopher_rules": doc_gopher_rules,
    "doc_importance_weights": doc_importance_weights,
    "doc_line_dedup": doc_line_dedup,
    "doc_c4_clean": doc_c4_clean,
    "vec_quantize_int8": vec_quantize_int8,
    "vec_quantize_pq": vec_quantize_pq,
    "vec_cosine_near_dup": vec_cosine_near_dup,
    "vec_cosine_near_dup_pinned": vec_cosine_near_dup_pinned,
    "doc_text_stats": doc_text_stats,
    "doc_token_counts": doc_token_counts,
    "doc_lang_id": doc_lang_id,
    "doc_fingerprint": doc_fingerprint,
    "doc_profile": doc_profile,
    "doc_quality_bands": doc_quality_bands,
    "vec_top_k_bruteforce": vec_top_k_bruteforce,
    "vec_top_k_ann_signlsh": vec_top_k_ann_signlsh,
    "vec_top_k_ann_ivf": vec_top_k_ann_ivf,
    "vec_ivf_index_search": vec_ivf_index_search,
    "vec_ann_recall_profile": vec_ann_recall_profile,
    "vec_ann_recall_profile_pq": vec_ann_recall_profile_pq,
    "vec_filtered_topk": vec_filtered_topk,
    "vec_filtered_ann": vec_filtered_ann,
    "vec_filtered_ann_pq": vec_filtered_ann_pq,
    "vec_top_k_ann_ivf_kmeans": vec_top_k_ann_ivf_kmeans,
    "vec_ivfpq_index_search": vec_ivfpq_index_search,
    "vec_ann_exhaustive_equiv": vec_ann_exhaustive_equiv,
    "vec_centroid_distance": vec_centroid_distance,
    "multimodal_features": multimodal_features,
    "multimodal_frame_sample": multimodal_frame_sample,
    "multimodal_integrity_audit": multimodal_integrity_audit,
    "doc_bm25_topk": doc_bm25_topk,
    "doc_hybrid_search_rrf": doc_hybrid_search_rrf,
    "vec_mmr_rerank": vec_mmr_rerank,
    "vec_mmr_rerank_batch": vec_mmr_rerank_batch,
    "vec_dedup_delta": vec_dedup_delta,
    "retrieval_serving_pipeline": retrieval_serving_pipeline,
    "doc_prf_expansion": doc_prf_expansion,
    "doc_bm25_prf_topk": doc_bm25_prf_topk,
    "doc_vocab_coverage": doc_vocab_coverage,
    "doc_graph_kcore": doc_graph_kcore,
}


def _quality_score_sql() -> str:
    """DuckDB twin of llm.text.quality_score — same term order so the
    doubles agree bit-for-bit."""
    ntok = f"len({_TOK})"
    punct = (
        "(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "length(regexp_replace(text, '[\\w \\t\\n\\x0B\\f\\r]', '', 'g')) * 1.0 "
        "/ length(text) END)"
    )
    atl = f"(list_sum(list_transform({_TOK}, t -> length(t))) * 1.0 / len({_TOK}))"
    return (
        f"(0.4 * least({ntok} / 64.0, 1.0)"
        f" + 0.3 * (1.0 - least({punct} * 5.0, 1.0))"
        f" + 0.3 * (CASE WHEN {atl} >= 3.0 AND {atl} <= 10.0 THEN 1.0 ELSE 0.0 END))"
    )


_FP_SQL = (
    f"list_aggregate(list_transform("
    f"CASE WHEN len({_TOK}) < 3 THEN CAST([] AS VARCHAR[]) "
    f"ELSE list_transform(range(len({_TOK}) - 2), "
    f"i -> concat_ws(' ', {_TOK}[i+1], {_TOK}[i+2], {_TOK}[i+3])) END, "
    f"x -> md5(x)), 'min')"
)

# IVF twin (llm.vectors.top_k_ann_ivf): same seeded centroids (the
# _IVF_CELLS smallest vec_ids), same nearest-cell assignment with
# (sim DESC, cell_id) tie-break, same n_probe cell pruning.
# Kept as a .format template so compositions (the serving pipeline)
# can re-dial query predicate / k without duplicating the twin.
_IVF_TOP_K_TEMPLATE = f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE {VEC_OK_SQL} ORDER BY vec_id LIMIT {{cells}})
), c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {VEC_OK_SQL}
), assigned AS (
  SELECT c.vec_id, c.v, cents.cell_id
  FROM c CROSS JOIN cents
  QUALIFY row_number() OVER (PARTITION BY c.vec_id
      ORDER BY list_cosine_similarity(c.v, cents.cv) DESC, cents.cell_id) = 1
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE {{qpred}} AND {VEC_OK_SQL}
), probes AS (
  SELECT q.query_id, q.qv, cents.cell_id
  FROM q CROSS JOIN cents
  QUALIFY row_number() OVER (PARTITION BY q.query_id
      ORDER BY list_cosine_similarity(q.qv, cents.cv) DESC, cents.cell_id)
      <= {{probe}}
), scored AS (
  SELECT p.query_id, a.vec_id, list_cosine_similarity(a.v, p.qv) AS cos,
         row_number() OVER (PARTITION BY p.query_id
             ORDER BY list_cosine_similarity(a.v, p.qv) DESC, a.vec_id) AS rk
  FROM assigned a JOIN probes p ON a.cell_id = p.cell_id
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rk AS INTEGER) AS rk
FROM scored WHERE rk <= {{k}}
"""

_IVF_TOP_K_SQL = _IVF_TOP_K_TEMPLATE.format(
    cells=_IVF_CELLS,
    qpred=f"vec_id < {_N_QUERIES}",
    probe=_IVF_PROBE,
    k=_TOP_K,
)


def _ivf_filtered_sql(
    pred: str, k: int, cells: int, n_probe: int, qpred: str
) -> str:
    """DuckDB twin of llm.vectors.search_ivf_index_filtered: same
    seeded centroids and cell assignment as the IVF twin, the corpus
    pre-filtered by ``pred``, and each query's effective probe count
    derived from the SAME widening ladder — the first rung whose
    top-p cells hold ≥ k filtered vectors, else the final
    probe-everything rung (expressed as a first-match CASE over
    cumulative per-cell-rank counts)."""
    from yelp_review_data_analysis_using_big_data_technologies_spark.llm.vectors import probe_ladder

    ladder = probe_ladder(n_probe, cells)
    if len(ladder) == 1:
        # n_probe >= n_cells: one probe-everything rung.  A CASE with
        # zero WHEN clauses (`CASE ELSE n END`) is a syntax error, so
        # emit the literal.
        eff_case = str(ladder[-1])
    else:
        eff_case = (
            "CASE "
            + " ".join(
                f"WHEN sum(CASE WHEN crk <= {p} THEN cnt ELSE 0 END) "
                f">= {k} THEN {p}"
                for p in ladder[:-1]
            )
            + f" ELSE {ladder[-1]} END"
        )
    return f"""
WITH cents AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell_id,
         CAST(embedding AS DOUBLE[]) AS cv
  FROM (SELECT vec_id, embedding FROM embeddings
        WHERE {VEC_OK_SQL} ORDER BY vec_id LIMIT {cells})
), c AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {VEC_OK_SQL}
), assigned AS (
  SELECT c.vec_id, c.label, c.v, cents.cell_id
  FROM c CROSS JOIN cents
  QUALIFY row_number() OVER (PARTITION BY c.vec_id
      ORDER BY list_cosine_similarity(c.v, cents.cv) DESC, cents.cell_id) = 1
), cand AS (
  SELECT * FROM assigned WHERE {pred}
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE {qpred} AND {VEC_OK_SQL}
), qcells AS (
  SELECT q.query_id, q.qv, cents.cell_id,
         row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qv, cents.cv) DESC,
                      cents.cell_id) AS crk
  FROM q CROSS JOIN cents
), cellcnt AS (
  SELECT cell_id, count(*) AS cnt FROM cand GROUP BY 1
), eff AS (
  SELECT query_id, {eff_case} AS eff_p
  FROM (SELECT qc.query_id, qc.crk, coalesce(cc.cnt, 0) AS cnt
        FROM qcells qc LEFT JOIN cellcnt cc USING (cell_id))
  GROUP BY query_id
), scored AS (
  SELECT qc.query_id, a.vec_id,
         list_cosine_similarity(a.v, qc.qv) AS cos,
         row_number() OVER (PARTITION BY qc.query_id
             ORDER BY list_cosine_similarity(a.v, qc.qv) DESC,
                      a.vec_id) AS rk
  FROM cand a
  JOIN qcells qc ON a.cell_id = qc.cell_id
  JOIN eff e ON e.query_id = qc.query_id AND qc.crk <= e.eff_p
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rk AS INTEGER) AS rk
FROM scored WHERE rk <= {k} ORDER BY query_id, rk
"""

_COS_CENTROID_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {VEC_OK_SQL}
), x AS (
  SELECT label, unnest(v) AS val, unnest(range(len(v))) AS dim FROM e
), cen AS (
  SELECT label, list(m ORDER BY dim) AS c
  FROM (SELECT label, dim, avg(val) AS m FROM x GROUP BY 1, 2) GROUP BY label
)
SELECT e.vec_id, e.label,
       round(list_cosine_similarity(e.v, cen.c), 6) AS cos_to_centroid
FROM e JOIN cen USING (label)
"""


def _top_k_sql(
    bucketed: bool, planes=None, corpus_pred: str = ""
) -> str:
    bucket_sel = (
        f", {lvec.sign_bucket_sql('embedding', planes or lvec.PLANES)} AS bucket"
        if bucketed
        else ""
    )
    join_cond = "c.bucket = q.bucket" if bucketed else "TRUE"
    pred = f" AND {corpus_pred}" if corpus_pred else ""
    return f"""
WITH c AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v{bucket_sel} FROM embeddings
  WHERE {VEC_OK_SQL}{pred}
), q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv{bucket_sel}
  FROM embeddings WHERE vec_id < {_N_QUERIES} AND {VEC_OK_SQL}
), scored AS (
  SELECT q.query_id, c.vec_id, list_cosine_similarity(c.v, q.qv) AS cos,
         row_number() OVER (
           PARTITION BY q.query_id
           ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id
         ) AS rk
  FROM c JOIN q ON {join_cond}
)
SELECT query_id, vec_id, round(cos, 6) AS cos_sim, CAST(rk AS INTEGER) AS rk
FROM scored WHERE rk <= {_TOP_K}
"""


#: DuckDB twin of the deterministic PII seeding in doc_pii_redact.
_PII_SEEDED = (
    "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
    "'@mail.example.com from 10.2.' || CAST(doc_id % 256 AS VARCHAR) || "
    "'.7 call 555-123-4567'"
)
_PII_CLEAN_SQL, _PII_COUNT_SQL = lq.redact_pii_sql(_PII_SEEDED)

def _training_freeze_sql(balance: str = "lang") -> str:
    """DuckDB twin of :func:`corpus_training_freeze` (no final
    ORDER BY — composable as a derived table): nests the SAME
    generators the single entries hash — exact-dedup QUALIFY ->
    banded near-dup NOT EXISTS -> contamination overlap ->
    quality expr -> mixture membership -> textbook shuffle rank
    -> naive-window pack.  Shared by the freeze entry and the
    freeze-stats accounting panel.  ``balance="cluster"`` (r15)
    swaps the lang mixture for the semantic cluster balance — the
    same optional stage :func:`_freeze_manifest` wires."""
    kept_cluster = (
        "SELECT doc_id, lang, n_tokens FROM ("
        + lsmp.cluster_balance_sample_sql(
            "good", n_cells=8, cols="doc_id, lang, n_tokens"
        )
        + ")"
    )
    return (
        "WITH clean1 AS ("
        "  SELECT doc_id, text, lang, source, n_chars FROM documents"
        "  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1"
        "), clean2 AS ("
        "  SELECT d.* FROM clean1 d WHERE NOT EXISTS ("
        "    SELECT 1 FROM ("
        f"      SELECT id_b FROM ({ldd.near_dup_banded_sql(table='clean1')})"
        "    ) p WHERE p.id_b = d.doc_id)"
        "), corpus AS ("
        f"  SELECT * FROM clean2 WHERE {_CORPUS_PRED}"
        "), flagged AS ("
        + ldec.contamination_overlap_sql(
            "corpus", f"(SELECT * FROM documents WHERE {_BENCH_PRED})"
        )
        + "), decont AS ("
        "  SELECT c.* FROM corpus c WHERE NOT EXISTS ("
        "    SELECT 1 FROM flagged f WHERE f.doc_id = c.doc_id)"
        "), good AS ("
        f"  SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_tokens"
        f"  FROM decont WHERE {_quality_score_sql()} > 0.5"
        "), kept AS ("
        + (
            kept_cluster
            if balance == "cluster"
            else lsmp.mixture_sample_sql(
                _MIXTURE_WEIGHTS,
                table="good",
                domain_expr="lang",
                id_expr="doc_id",
                tokens_expr="n_tokens",
                cols="doc_id, lang, n_tokens",
            )
        )
        + "), ordered AS ("
        + lsmp.corpus_shuffle_sql(table="kept")
        + "), packed AS ("
        "  SELECT k.doc_id, k.lang, k.n_tokens, o.position, o.shard,"
        "         CAST(coalesce(sum(k.n_tokens) OVER (ORDER BY o.position"
        "           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        "           AS BIGINT) AS offset_tokens"
        "  FROM kept k JOIN ordered o USING (doc_id)"
        ") "
        "SELECT doc_id, lang, n_tokens, position, shard, offset_tokens, "
        "CAST(offset_tokens // 512 AS BIGINT) AS bin_id "
        "FROM packed"
    )


def _freeze_audit_sql() -> str:
    """DuckDB twin of :func:`corpus_freeze_audit`: the SAME stage
    generators as :func:`_training_freeze_sql`, composed with tagged
    anti-join legs (the r14 verdict's construction) plus the
    overlap-matrix aggregates."""
    ntok = f"CAST(len({_TOK}) AS BIGINT)"
    return (
        "WITH clean1 AS ("
        "  SELECT doc_id, text, lang, source, n_chars FROM documents"
        "  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1"
        "), clean2 AS ("
        "  SELECT d.* FROM clean1 d WHERE NOT EXISTS ("
        "    SELECT 1 FROM ("
        f"      SELECT id_b FROM ({ldd.near_dup_banded_sql(table='clean1')})"
        "    ) p WHERE p.id_b = d.doc_id)"
        "), corpus AS ("
        f"  SELECT * FROM clean2 WHERE {_CORPUS_PRED}"
        "), flagged AS ("
        + ldec.contamination_overlap_sql(
            "corpus", f"(SELECT * FROM documents WHERE {_BENCH_PRED})"
        )
        + "), decont AS ("
        "  SELECT c.* FROM corpus c WHERE NOT EXISTS ("
        "    SELECT 1 FROM flagged f WHERE f.doc_id = c.doc_id)"
        "), good AS ("
        f"  SELECT doc_id, lang, {ntok} AS n_tokens"
        f"  FROM decont WHERE {_quality_score_sql()} > 0.5"
        "), kept AS ("
        + lsmp.mixture_sample_sql(
            _MIXTURE_WEIGHTS,
            table="good",
            domain_expr="lang",
            id_expr="doc_id",
            tokens_expr="n_tokens",
            cols="doc_id, lang, n_tokens",
        )
        + "), drops AS ("
        "  SELECT d.doc_id, d.text, 'exact_dup' AS stage FROM documents d"
        "  WHERE NOT EXISTS (SELECT 1 FROM clean1 c WHERE c.doc_id = d.doc_id)"
        "  UNION ALL"
        "  SELECT d.doc_id, d.text, 'near_dup' FROM clean1 d"
        "  WHERE NOT EXISTS (SELECT 1 FROM clean2 c WHERE c.doc_id = d.doc_id)"
        "  UNION ALL"
        f"  SELECT doc_id, text, 'benchmark_eval' FROM clean2 WHERE NOT ({_CORPUS_PRED})"
        "  UNION ALL"
        "  SELECT d.doc_id, d.text, 'contaminated' FROM corpus d"
        "  WHERE NOT EXISTS (SELECT 1 FROM decont c WHERE c.doc_id = d.doc_id)"
        "  UNION ALL"
        "  SELECT d.doc_id, d.text, 'low_quality' FROM decont d"
        "  WHERE NOT EXISTS (SELECT 1 FROM good g WHERE g.doc_id = d.doc_id)"
        "), audflag AS ("
        + ldec.contamination_overlap_sql(
            "(SELECT doc_id, text FROM drops WHERE stage IN "
            f"('exact_dup', 'near_dup') AND {_CORPUS_PRED})",
            f"(SELECT * FROM documents WHERE {_BENCH_PRED})",
        )
        + ") "
        "SELECT 'stage' AS grp, stage AS key, count(*) AS n_docs, "
        f"CAST(SUM(len({_TOK})) AS BIGINT) AS n_tokens "
        "FROM drops GROUP BY stage "
        "UNION ALL "
        "SELECT 'stage', 'mixture_cap', count(*), CAST(SUM(n_tokens) AS BIGINT) "
        "FROM good g WHERE NOT EXISTS (SELECT 1 FROM kept k WHERE k.doc_id = g.doc_id) "
        "UNION ALL "
        "SELECT 'stage', 'kept', count(*), CAST(SUM(n_tokens) AS BIGINT) FROM kept "
        "UNION ALL "
        "SELECT 'also', stage || '&low_quality', count(*), "
        f"CAST(SUM(len({_TOK})) AS BIGINT) "
        f"FROM drops WHERE stage <> 'low_quality' AND NOT ({_quality_score_sql()} > 0.5) "
        "GROUP BY stage "
        "UNION ALL "
        "SELECT 'also', d.stage || '&contaminated', count(*), "
        f"CAST(SUM(len({_TOK})) AS BIGINT) "
        "FROM drops d JOIN audflag f ON f.doc_id = d.doc_id GROUP BY d.stage "
        "ORDER BY grp, key"
    )


ORACLES = {
    "doc_tfidf_cosine_pairs": ltm.tfidf_cosine_pairs_sql(),
    "doc_dup_spans": lsp.dup_spans_sql(k=5),
    "doc_dup_span_removal": lsp.remove_dup_spans_sql(k=5),
    "doc_winnow_fingerprints": lwin.winnow_fingerprints_sql(),
    "doc_winnow_pairs": lwin.winnow_pairs_sql(),
    "doc_exact_dedup": (
        "SELECT doc_id, text, lang, source, n_chars, sha256(text) AS content_hash "
        "FROM documents QUALIFY row_number() OVER "
        "(PARTITION BY sha256(text) ORDER BY doc_id) = 1"
    ),
    "doc_normalized_dedup": (
        # \p{Mn} strip after lower(): see doc_normalized_dedup's
        # docstring (engine casefold tables diverge on İ-class chars)
        "SELECT doc_id, sha256(regexp_replace(lower(substr(text, 1, 40)), "
        "'\\p{Mn}', '', 'g')) AS norm_key "
        "FROM documents QUALIFY row_number() OVER "
        "(PARTITION BY sha256(regexp_replace(lower(substr(text, 1, 40)), "
        "'\\p{Mn}', '', 'g')) ORDER BY doc_id) = 1"
    ),
    "doc_unicode_normalized": (
        "SELECT doc_id, sha256(nfc_normalize(text)) AS nfc_hash, "
        "coalesce(nfc_normalize(text) <> text, FALSE) AS changed "
        "FROM documents"
    ),
    "doc_near_dup_banded": ldd.near_dup_banded_sql(),
    "doc_pagerank": pagerank_sql(ldd.near_dup_banded_sql(), id_out="doc_id"),
    "doc_graph_kcore": kcsql(ldd.near_dup_banded_sql(), id_out="doc_id"),
    "doc_graph_triangles": triangle_counts_sql(
        ldd.near_dup_banded_sql(), id_out="doc_id"
    ),
    "doc_pagerank_weighted": pagerank_sql(
        ldd.near_dup_banded_sql(), id_out="doc_id", weight="jaccard"
    ),
    "corpus_shuffle_order": (
        lsmp.corpus_shuffle_sql() + " ORDER BY position"
    ),
    "doc_graph_communities": lcc.label_propagation_sql(
        ldd.near_dup_banded_sql()
    ),
    # split leakage: the split CASE and the R-S join twin are the
    # same generators the single entries hash — composition only
    "pipeline_split_leakage": (
        lambda _case, _pairs: f"""
SELECT s.split, s.n_docs,
       COALESCE(l.n_leaked, 0) AS n_leaked,
       COALESCE(l.n_pairs, 0) AS n_pairs,
       round(l.max_jaccard, 6) AS max_jaccard,
       round(COALESCE(l.n_leaked, 0) / CAST(s.n_docs AS DOUBLE), 6)
         AS leak_frac
FROM (SELECT {_case} AS split, count(*) AS n_docs FROM documents
      WHERE {_case} IN ('val', 'test') GROUP BY 1) s
LEFT JOIN (
  SELECT a.split, count(DISTINCT p.id_r) AS n_leaked,
         count(*) AS n_pairs, max(p.jaccard) AS max_jaccard
  FROM ({_pairs}) p
  JOIN (SELECT doc_id, {_case} AS split FROM documents) a
    ON a.doc_id = p.id_r
  GROUP BY a.split) l USING (split)
ORDER BY s.split
"""
    )(
        lsmp.split_case_sql(),
        ldd.ngram_jaccard_join_sql(
            "(SELECT * FROM documents WHERE "
            + lsmp.split_case_sql()
            + " = 'train')",
            "(SELECT * FROM documents WHERE "
            + lsmp.split_case_sql()
            + " IN ('val', 'test'))",
            threshold=0.3,
        ),
    ),
    "corpus_keep_central": (
        # the two sub-twins nest as derived tables (each carries its
        # own WITH/WITH RECURSIVE); keeper = rank DESC, doc_id ASC
        "WITH j AS ("
        "  SELECT cc.doc_id, cc.cluster_id, pr.degree, pr.rank"
        f"  FROM ({lcc.connected_components_sql(ldd.near_dup_banded_sql())}) cc"
        f"  JOIN ({pagerank_sql(ldd.near_dup_banded_sql(), id_out='doc_id')}) pr"
        "  USING (doc_id)"
        ") "
        "SELECT cluster_id, doc_id AS keep_doc_id, "
        "CAST(count(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS n_members, "
        "rank AS keep_rank, degree AS keep_degree "
        "FROM j "
        "QUALIFY row_number() OVER (PARTITION BY cluster_id "
        "ORDER BY rank DESC, doc_id ASC) = 1 "
        "ORDER BY cluster_id"
    ),
    "doc_band_bucket_profile": ldd.band_bucket_profile_sql(),
    "doc_prefix_contained": ldd.prefix_contained_sql(),
    "doc_ngram_jaccard": ldd.ngram_jaccard_sql(threshold=0.3),
    "doc_cross_corpus_jaccard": (
        ldd.ngram_jaccard_join_sql(
            "(SELECT * FROM documents WHERE doc_id % 2 = 0)",
            "(SELECT * FROM documents WHERE doc_id % 2 = 1)",
            threshold=0.3,
        )
        + " ORDER BY id_l, id_r"
    ),
    # prefix filtering is candidate-pruning only — the oracle is the
    # SAME SQL as the unfiltered join (transparency proved by hash);
    # ditto the regime dispatcher, whichever plan it picks
    "doc_ngram_jaccard_prefix": ldd.ngram_jaccard_sql(threshold=0.3),
    "doc_ngram_jaccard_auto": ldd.ngram_jaccard_sql(threshold=0.3),
    # doc_near_dup_minhash_ml: intentionally absent (rows-only check).
    "doc_near_dup_removal": (
        "SELECT d.* FROM documents d WHERE NOT EXISTS ("
        "  SELECT 1 FROM ("
        f"    SELECT id_b FROM ({ldd.near_dup_banded_sql()})"
        "  ) p WHERE p.id_b = d.doc_id)"
    ),
    "corpus_clean_pipeline": (
        "WITH clean1 AS ("
        "  SELECT doc_id, text, lang, source, n_chars FROM documents"
        "  QUALIFY row_number() OVER (PARTITION BY sha256(text) ORDER BY doc_id) = 1"
        "), clean2 AS ("
        "  SELECT d.* FROM clean1 d WHERE NOT EXISTS ("
        "    SELECT 1 FROM ("
        f"      SELECT id_b FROM ({ldd.near_dup_banded_sql(table='clean1')})"
        "    ) p WHERE p.id_b = d.doc_id)"
        "), clean3 AS ("
        f"  SELECT * FROM clean2 WHERE {_quality_score_sql()} > 0.5"
        ") "
        "SELECT lang, count(*) AS n_docs, "
        f"CAST(sum(len({_TOK})) AS BIGINT) AS total_tokens "
        "FROM clean3 GROUP BY lang ORDER BY lang"
    ),
    "corpus_training_freeze": _training_freeze_sql() + " ORDER BY position",
    "corpus_freeze_stats": (
        # balance/fill accounting over the SAME freeze twin (nested as
        # a derived table): per-shard and per-lang doc/token shares +
        # bin-fill summary — CASTs pin BIGINT (DuckDB SUM->HUGEINT)
        f"WITH fz AS ({_training_freeze_sql()}), "
        "tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM fz), "
        "bins AS (SELECT bin_id, CAST(SUM(n_tokens) AS BIGINT) AS bt "
        "FROM fz GROUP BY bin_id) "
        "SELECT 'shard' AS grp, CAST(shard AS VARCHAR) AS key, "
        "count(*) AS n, CAST(SUM(n_tokens) AS BIGINT) AS tok, "
        "round(CAST(SUM(n_tokens) AS BIGINT) / (SELECT CAST(t AS DOUBLE) FROM tot), 6) AS ratio "
        "FROM fz GROUP BY shard "
        "UNION ALL "
        "SELECT 'lang', lang, count(*), CAST(SUM(n_tokens) AS BIGINT), "
        "round(CAST(SUM(n_tokens) AS BIGINT) / (SELECT CAST(t AS DOUBLE) FROM tot), 6) "
        "FROM fz GROUP BY lang "
        "UNION ALL "
        "SELECT 'bin_fill', 'mean', count(*), CAST(SUM(bt) AS BIGINT), "
        "round(AVG(bt / 512.0), 6) FROM bins "
        "UNION ALL "
        "SELECT 'bin_fill', 'max', count(*), CAST(SUM(bt) AS BIGINT), "
        "round(MAX(bt / 512.0), 6) FROM bins "
        "ORDER BY grp, key"
    ),
    "corpus_freeze_audit": _freeze_audit_sql(),
    "vocab_bpe_merges": lbpe.bpe_merge_steps_sql(k=6),
    "vocab_bpe_encode": lbpe.bpe_encode_stats_sql(k=6),
    "corpus_freeze_clustered": (
        _training_freeze_sql(balance="cluster") + " ORDER BY position"
    ),
    "corpus_cluster_balance": (
        "WITH good AS ("
        f"  SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_tokens"
        f"  FROM documents WHERE {_quality_score_sql()} > 0.5"
        ") SELECT doc_id, lang, n_tokens, cluster_id FROM ("
        + lsmp.cluster_balance_sample_sql(
            "good", n_cells=8, cols="doc_id, lang, n_tokens, cluster_id"
        )
        + ") ORDER BY doc_id"
    ),
    "corpus_semantic_dedup": (
        f"WITH pairs AS ({lvec.cosine_near_dup_sql()}) "
        "SELECT doc_id, lang, n_chars FROM documents d "
        "WHERE NOT EXISTS (SELECT 1 FROM pairs p WHERE p.id_b = d.doc_id) "
        "ORDER BY doc_id"
    ),
    "doc_dedup_delta": (
        f"WITH pairs AS ({ldd.near_dup_banded_sql()}) "
        "SELECT doc_id, lang, n_chars FROM documents d "
        f"WHERE d.doc_id >= {_DELTA_SPLIT_ID} "
        # NOT EXISTS (not NOT IN): a NULL corpus text would make NOT IN
        # three-valued-NULL out EVERY delta row, while Spark's left_anti
        # keeps non-matching rows — NOT EXISTS matches anti-join null
        # semantics exactly.
        "AND NOT EXISTS (SELECT 1 FROM documents c "
        f"  WHERE c.doc_id < {_DELTA_SPLIT_ID} "
        "  AND sha256(c.text) = sha256(d.text)) "
        "AND NOT EXISTS (SELECT 1 FROM pairs p "
        f"  WHERE p.id_a < {_DELTA_SPLIT_ID} AND p.id_b = d.doc_id) "
        "ORDER BY doc_id"
    ),
    "corpus_freeze_delta": (
        # same cross-pair restriction as doc_dedup_delta (corpus ids
        # sort below batch ids), composed with the contamination and
        # quality generators the freeze twin uses
        f"WITH pairs AS ({ldd.near_dup_banded_sql()}), "
        "adm AS ("
        "  SELECT * FROM documents d "
        f" WHERE d.doc_id >= {_DELTA_SPLIT_ID} AND {_CORPUS_PRED} "
        "  AND NOT EXISTS (SELECT 1 FROM documents c "
        f"    WHERE c.doc_id < {_DELTA_SPLIT_ID} "
        "    AND sha256(c.text) = sha256(d.text)) "
        "  AND NOT EXISTS (SELECT 1 FROM pairs p "
        f"    WHERE p.id_a < {_DELTA_SPLIT_ID} AND p.id_b = d.doc_id)"
        "), flagged AS ("
        + ldec.contamination_overlap_sql(
            "adm", f"(SELECT * FROM documents WHERE {_BENCH_PRED})"
        )
        + ") "
        f"SELECT doc_id, lang, CAST(len({_TOK}) AS BIGINT) AS n_tokens "
        "FROM adm a "
        "WHERE NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = a.doc_id) "
        f"AND {_quality_score_sql()} > 0.5 "
        "ORDER BY doc_id"
    ),
    "doc_dup_clusters": lcc.connected_components_sql(ldd.near_dup_banded_sql()),
    "corpus_keep_best": (
        f"WITH __cc AS ({lcc.connected_components_sql(ldd.near_dup_banded_sql())}), "
        "__scored AS ("
        "  SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id, "
        f"         {_quality_score_sql()} AS __q "
        "  FROM documents d LEFT JOIN __cc c ON c.doc_id = d.doc_id"
        ") "
        "SELECT doc_id, cluster_id, round(__q, 6) AS quality "
        "FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY cluster_id "
        "ORDER BY __q DESC, doc_id) AS __rk FROM __scored) "
        "WHERE __rk = 1 ORDER BY doc_id"
    ),
    "doc_chunk_dedup": (
        f"WITH __ch AS ({ltm.token_chunks_sql()}), "
        "__r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY chunk_hash "
        "ORDER BY doc_id, chunk_idx) AS __rk FROM __ch) "
        "SELECT doc_id, count(*) AS n_chunks, "
        "CAST(sum(CASE WHEN __rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept, "
        "round(1.0 - CAST(sum(CASE WHEN __rk = 1 THEN 1 ELSE 0 END) AS BIGINT) "
        "/ count(*), 6) AS dup_ratio "
        "FROM __r GROUP BY doc_id ORDER BY doc_id"
    ),
    "doc_pack_bins": lpk.pack_bins_sql(budget=512),
    "doc_weighted_sample": (
        "SELECT doc_id, n_chars, round(priority, 6) AS priority FROM ("
        + lsmp.weighted_take_sql(
            "documents", 100, "n_chars", cols="doc_id, n_chars"
        )
        + ") ORDER BY doc_id"
    ),
    "corpus_mixture_sample": lsmp.mixture_report_sql(
        _MIXTURE_WEIGHTS, domain_expr="lang", tokens_expr=f"len({_TOK})"
    ),
    "doc_dup_clusters_panel": (
        "WITH cc AS ("
        + lcc.connected_components_sql(ldd.near_dup_banded_sql())
        + ") SELECT 'min_label' AS algo, doc_id, cluster_id FROM cc "
        "UNION ALL SELECT 'star', doc_id, cluster_id FROM cc "
        "ORDER BY algo, doc_id"
    ),
    "doc_dup_clusters_star": lcc.connected_components_sql(
        ldd.near_dup_banded_sql()
    ),
    "doc_decontaminated": (
        ldec.decontaminate_sql(
            corpus_where=_CORPUS_PRED.replace("<>", "!="),
            benchmark_where=_BENCH_PRED,
            shingle_n=3,
            min_shared=2,
        )
        + " ORDER BY doc_id"
    ),
    "doc_repetition_profile": (
        lq.repetition_profile_sql(shingle_n=3) + " ORDER BY doc_id"
    ),
    "doc_pii_redact": (
        f"SELECT doc_id, {_PII_CLEAN_SQL} AS clean_text, "
        f"CAST({_PII_COUNT_SQL} AS BIGINT) AS n_redactions "
        "FROM documents ORDER BY doc_id"
    ),
    "pipeline_split_panel": (
        # _SANE_CHARS_SQL = the sane-chars CASE (see SANE_CHARS_MAX)
        f"SELECT 'split' AS op, {lsmp.split_case_sql()} AS grp, "
        f"count(*) AS n_docs, CAST(sum({_SANE_CHARS_SQL}) AS BIGINT) AS sum_chars "
        "FROM documents GROUP BY 2 "
        "UNION ALL "
        f"SELECT 'stratified', lang, count(*), CAST(sum({_SANE_CHARS_SQL}) AS BIGINT) "
        "FROM documents "
        f"WHERE {lsmp.stratified_pred_sql('lang', STRAT_FRACTIONS)} "
        "GROUP BY 2 "
        "UNION ALL "
        f"SELECT 'take', lang, count(*), CAST(sum({_SANE_CHARS_SQL}) AS BIGINT) FROM ("
        + lsmp.take_per_stratum_sql("documents", "lang", _TAKE_K)
        + ") GROUP BY 2 ORDER BY op, grp"
    ),
    "doc_tfidf_top_terms": ltm.tf_idf_top_terms_sql(k=3),
    "doc_token_chunks": ltm.token_chunks_sql(chunk=64, stride=48),
    "doc_lm_quality": ltm.bigram_lm_nll_sql(),
    "doc_gopher_rules": lq.gopher_rules_sql(),
    "doc_importance_weights": ltm.importance_weights_sql(),
    "doc_line_dedup": ldd.line_dedup_sql(),
    "doc_c4_clean": lq.c4_line_filter_sql(),
    "vec_quantize_int8": lvec.quantize_int8_sql(),
    "vec_cosine_near_dup": lvec.cosine_near_dup_sql(),
    "vec_cosine_near_dup_pinned": lvec.cosine_near_dup_sql(),
    "doc_simhash_buckets": (
        f"SELECT {ldd.simhash_sql('text')} AS simhash, count(*) AS n_docs "
        "FROM documents WHERE text IS NOT NULL GROUP BY 1"
    ),
    "doc_simhash_near_dup": ldd.simhash_near_dup_sql(),
    "doc_text_stats": (
        "SELECT lang, count(*) AS n_docs, "
        f"round(avg(len({_TOK})), 4) AS avg_tokens, "
        "round(avg(length(text)), 4) AS avg_chars, "
        "round(avg(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
        "length(regexp_replace(text, '[\\w \\t\\n\\x0B\\f\\r]', '', 'g')) * 1.0 "
        "  / length(text) END), 6) AS avg_punct_ratio, "
        f"round(avg(len(list_filter({_TOK}, t -> list_contains({_STOPWORD_LIT}, t)))"
        f" * 1.0 / len({_TOK})), 6) AS avg_stopword_ratio "
        "FROM documents GROUP BY lang ORDER BY lang"
    ),
    "doc_token_counts": (
        f"SELECT doc_id, len({_TOK}) AS ws_tokens, "
        "len(regexp_extract_all(text, '\\w+|[^\\w \\t\\n\\x0B\\f\\r]+')) AS bpe_tokens, "
        "length(text) AS n_chars_live FROM documents"
    ),
    "doc_lang_id": (
        f"SELECT lang, {ltx.lang_id_sql('text')} AS lang_pred, count(*) AS n "
        "FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred"
    ),
    "doc_fingerprint": f"SELECT doc_id, {_FP_SQL} AS fp FROM documents",
    "doc_profile": (
        f"SELECT doc_id, len({_TOK}) AS ws_tokens, "
        "len(regexp_extract_all(text, '\\w+|[^\\w \\t\\n\\x0B\\f\\r]+')) AS bpe_tokens, "
        f"{_FP_SQL} AS fp, "
        f"CASE WHEN {_quality_score_sql()} <= 0.5 THEN 'low' "
        f"WHEN {_quality_score_sql()} <= 0.75 THEN 'mid' ELSE 'high' END AS band "
        "FROM documents"
    ),
    "doc_quality_bands": (
        f"SELECT CASE WHEN {_quality_score_sql()} <= 0.5 THEN 'low' "
        f"WHEN {_quality_score_sql()} <= 0.75 THEN 'mid' ELSE 'high' END AS band, "
        "count(*) AS n_docs FROM documents GROUP BY 1"
    ),
    # incremental embedding dedup: R-S form of the cosine-near-dup
    # twin (same frozen planes/buckets; NOT EXISTS matches the
    # engine's left_anti NULL semantics, the doc_dedup_delta rule)
    "vec_dedup_delta": f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
         [{", ".join(lvec.sign_bucket_sql("embedding", planes) for planes in lvec._band_planes(3, 4))}] AS bk
  FROM embeddings WHERE {VEC_OK_SQL}
), k AS (
  SELECT vec_id, unnest(range(3)) AS band, unnest(bk) AS bucket FROM e
), matched AS (
  SELECT DISTINCT d.vec_id AS id_d
  FROM k d JOIN k c ON d.band = c.band AND d.bucket = c.bucket
  JOIN e ed ON ed.vec_id = d.vec_id
  JOIN e ec ON ec.vec_id = c.vec_id
  WHERE d.vec_id >= {_VEC_DELTA_SPLIT} AND c.vec_id < {_VEC_DELTA_SPLIT}
    AND round(list_cosine_similarity(ed.v, ec.v), 6) >= 0.4
)
SELECT emb.vec_id, emb.label FROM embeddings emb
WHERE emb.vec_id >= {_VEC_DELTA_SPLIT} AND {VEC_OK_SQL.replace("embedding", "emb.embedding").replace("vec_id", "emb.vec_id")}
  AND NOT EXISTS (SELECT 1 FROM matched m WHERE m.id_d = emb.vec_id)
ORDER BY emb.vec_id
""",
    "vec_top_k_bruteforce": _top_k_sql(bucketed=False),
    # vec_ann_exhaustive_equiv: exhaustive-probe + full-rerank IVF-PQ
    # reduces to exact bruteforce, so the bruteforce twin IS its oracle.
    "vec_ann_exhaustive_equiv": _top_k_sql(bucketed=False),
    "vec_top_k_ann_signlsh": _top_k_sql(bucketed=True),
    "vec_top_k_ann_ivf": _IVF_TOP_K_SQL,
    # recall curve: every leg is deterministic, so the twin composes
    # the bruteforce twin with one IVF twin per probe dial + the LSH
    # twin — the monotone floor is additionally unit-pinned
    "vec_ann_recall_profile": (
        "WITH bf AS (" + _top_k_sql(bucketed=False) + "),\n"
        + ",\n".join(
            f"lsh{n} AS ("
            + _top_k_sql(bucketed=True, planes=lvec.PLANE_POOL[:n])
            + ")"
            for n in _RECALL_PLANES
        )
        + ",\n"
        + ",\n".join(
            f"ivf{p} AS ("
            + _IVF_TOP_K_TEMPLATE.format(
                cells=_IVF_CELLS,
                qpred=f"vec_id < {_N_QUERIES}",
                probe=p,
                k=_TOP_K,
            )
            + ")"
            for p in _RECALL_PROBES
        )
        + ",\nt AS (SELECT CAST(count(*) AS BIGINT) AS truth FROM bf)\n"
        "SELECT * FROM (\n"
        + "\nUNION ALL\n".join(
            f"SELECT 'ivf_n_probe' AS method, CAST({p} AS INT) AS dial, "
            f"m.matched, t.truth, round(m.matched * 1.0 / t.truth, 6) AS recall "
            f"FROM (SELECT CAST(count(*) AS BIGINT) AS matched FROM ivf{p} "
            f"JOIN bf USING (query_id, vec_id)) m CROSS JOIN t"
            for p in _RECALL_PROBES
        )
        + "\nUNION ALL\n"
        + "\nUNION ALL\n".join(
            f"SELECT 'signlsh_n_planes', CAST({n} AS INT), "
            "m.matched, t.truth, round(m.matched * 1.0 / t.truth, 6) "
            f"FROM (SELECT CAST(count(*) AS BIGINT) AS matched FROM lsh{n} "
            "JOIN bf USING (query_id, vec_id)) m CROSS JOIN t"
            for n in _RECALL_PLANES
        )
        + "\n) ORDER BY method, dial"
    ),
    "vec_filtered_topk": _top_k_sql(
        bucketed=False,
        corpus_pred=f"label IN ({', '.join(map(str, _FILTER_LABELS))})",
    ),
    # filtered-ANN twin: the widening ladder is part of the semantics,
    # derived from the SAME probe_ladder rungs as the engine
    "vec_filtered_ann": _ivf_filtered_sql(
        _FILTERED_ANN_PRED,
        k=_TOP_K,
        cells=_IVF_CELLS,
        n_probe=_IVF_PROBE,
        qpred=f"vec_id < {_N_QUERIES}",
    ),
    # the persisted-index search shares seeds/dials with the in-memory
    # operator, so the same twin proves the round-trip lossless
    "vec_ivf_index_search": _IVF_TOP_K_SQL,
    # compaction is search-invisible by contract, so the lifecycle
    # entry hashes against the SAME static IVF twin
    "vec_ivf_index_compacted": _IVF_TOP_K_SQL,
    # erasure must leave EXACTLY the clean index (clone ties would
    # leak into the top-k if any survived) — same static twin
    "vec_index_forget": _IVF_TOP_K_SQL,
    "vec_centroid_distance": _COS_CENTROID_SQL,
    # coalesce(strlen,0): the Spark fake decode treats a NULL payload
    # as b"" — the twin must score a NULL text identically
    "multimodal_integrity_audit": lmm.mixed_media_audit_sql(),
    "doc_bm25_topk": ltm.bm25_topk_sql(_BM25_QUERY, k=10),
    "doc_prf_expansion": ltm.prf_expansion_terms_sql(
        _BM25_QUERY, feedback_k=_PRF_FEEDBACK_K, expand_m=_PRF_EXPAND_M
    ),
    "doc_bm25_prf_topk": ltm.bm25_prf_topk_sql(
        _BM25_QUERY, k=10, feedback_k=_PRF_FEEDBACK_K, expand_m=_PRF_EXPAND_M
    ),
    "vec_mmr_rerank": lvec.mmr_rerank_sql(
        k=_MMR_K, pool=_MMR_POOL, lam=_MMR_LAMBDA, n_queries=_N_QUERIES
    ),
    # the distributed grouped-map dispatch runs the same greedy
    # arithmetic, so it shares the same twin — the hash proves the
    # dispatch invisible
    "vec_mmr_rerank_batch": lvec.mmr_rerank_sql(
        k=_MMR_K, pool=_MMR_POOL, lam=_MMR_LAMBDA, n_queries=_N_QUERIES
    ),
    # serving composition: the IVF leg is the SAME template as
    # vec_ivf_index_search's twin (single query, list-k dial), fused
    # with the BM25 twin by the RRF formula, pool-cut on diversifiable
    # candidates, then the shared greedy-MMR chain with rel=rrf_score
    "retrieval_serving_pipeline": lvec.mmr_greedy_sql(
        f"""  SELECT CAST({_HYBRID_QVEC_ID} AS BIGINT) AS query_id,
         f.doc_id AS vec_id, f.rrf_score AS rel, e.v
  FROM fused f JOIN emb_ok e ON e.vec_id = f.doc_id
  QUALIFY row_number() OVER (ORDER BY f.rrf_score DESC, f.doc_id)
          <= {_SERVE_POOL}""",
        k=_SERVE_K,
        lam=_MMR_LAMBDA,
        pre_ctes=f"""lex AS ({ltm.bm25_topk_sql(_BM25_QUERY, k=_HYBRID_LIST_K)}),
lexprf AS ({ltm.bm25_prf_topk_sql(_BM25_QUERY, k=_HYBRID_LIST_K, feedback_k=_PRF_FEEDBACK_K, expand_m=_PRF_EXPAND_M)}),
ivf AS ({_IVF_TOP_K_TEMPLATE.format(cells=_IVF_CELLS, qpred=f"vec_id = {_HYBRID_QVEC_ID}", probe=_IVF_PROBE, k=_HYBRID_LIST_K)}),
unioned AS (
  SELECT doc_id, 1.0 / ({_RRF_K} + rk) AS c FROM lex
  UNION ALL SELECT doc_id, 1.0 / ({_RRF_K} + rk) FROM lexprf
  UNION ALL SELECT vec_id, 1.0 / ({_RRF_K} + rk) FROM ivf
), fused AS (
  SELECT doc_id, round(sum(c), 6) AS rrf_score FROM unioned GROUP BY doc_id
), emb_ok AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
  WHERE {VEC_OK_SQL}
), """,
    ),
    "doc_vocab_coverage": ltm.vocab_coverage_sql(v=50),
    "doc_hybrid_search_rrf": f"""
WITH lex AS ({ltm.bm25_topk_sql(_BM25_QUERY, k=_HYBRID_LIST_K)}),
vec AS (
  SELECT c.vec_id AS doc_id,
         row_number() OVER (
           ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id
         ) AS rk
  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        WHERE {VEC_OK_SQL}) c
  CROSS JOIN (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
              WHERE vec_id = {_HYBRID_QVEC_ID} AND {VEC_OK_SQL}) q
  QUALIFY rk <= {_HYBRID_LIST_K}
), unioned AS (
  SELECT doc_id, 1.0 / ({_RRF_K} + rk) AS c FROM lex
  UNION ALL SELECT doc_id, 1.0 / ({_RRF_K} + rk) FROM vec
), fused AS (
  SELECT doc_id, round(sum(c), 6) AS rrf_score,
         CAST(count(*) AS INT) AS n_lists
  FROM unioned GROUP BY doc_id
)
SELECT doc_id, rrf_score, n_lists,
       CAST(row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS INT) AS rk
FROM fused QUALIFY rk <= 10 ORDER BY rk
""",
    "multimodal_features": (
        "SELECT doc_id AS media_id, "
        "CAST(coalesce(strlen(text), 0) AS BIGINT) AS n_bytes, "
        "CAST(coalesce(strlen(text), 0) % 64 + 1 AS INTEGER) AS width, "
        "CAST(coalesce(strlen(text), 0) // 64 + 1 AS INTEGER) AS height, "
        "CAST(coalesce(strlen(text), 0) % 16 + 1 AS INTEGER) AS n_frames "
        "FROM documents"
    ),
    "multimodal_frame_sample": (
        "WITH __f AS (SELECT doc_id AS media_id, "
        "CAST(coalesce(strlen(text), 0) % 16 + 1 AS INTEGER) AS n_frames "
        "FROM documents), "
        "__s AS (SELECT media_id, n_frames, unnest(range(4)) AS __i FROM __f), "
        "__x AS (SELECT media_id, CAST(__i AS INTEGER) AS sample_idx, "
        "CAST(floor(__i * n_frames / 4) AS INTEGER) AS frame_idx, n_frames "
        "FROM __s) "
        "SELECT media_id, MIN(sample_idx) AS sample_idx, frame_idx, "
        "MIN(n_frames) AS n_frames "
        "FROM __x WHERE frame_idx < n_frames "
        "GROUP BY media_id, frame_idx ORDER BY media_id, sample_idx"
    ),
}
