"""End-to-end training-corpus cleaning plan — the C4/RefinedWeb shape,
composed from the engine's own operators in the order a pretraining
pipeline runs them:

    1. language filter        (operators/text.lang_id_col)
    2. quality filter         (operators/text.quality_score_col,
                               integer-exact q40 encoding)
    3. exact dedup            (operators/dedup.exact_dedup, min-id win)
    4. near-dup removal       (minhash_lsh_pairs -> connected
                               components -> survivor = min id)
    5. boilerplate line dedup (operators/text.line_dedup)

Everything stays one lazy DataFrame program, so Catalyst plans the
whole pipeline together (filters before shuffles, semi-joins for the
survivor sets). Scale shape: two hash-agg shuffles (fingerprint,
line count), the banded LSH self-join, and the bounded component loop
— nothing quadratic, no collect. The driver pair (q_clean_corpus)
verifies the COMPOSITION end-to-end against a single DuckDB statement,
not just each stage alone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from biothings_crawler_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)
from biothings_crawler_spark.operators.text import (
    lang_id_col,
    line_dedup,
    quality_score_col,
    token_count_col,
)


def clean_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    lang: str = "en",
    min_q40: int = 20,
    jaccard: float = 0.5,
    n_perm: int = 16,
    bands: int = 16,
    max_line_occ: int = 10,
    shingle_impl: str = "pandas",
) -> DataFrame:
    """documents -> cleaned corpus (id, clean_text, n_kept, n_removed,
    n_tokens). ``min_q40`` is the quality threshold on the exact
    integer encoding (score*40); default 20 = 0.5. ``bands=n_perm``
    gives 1-row LSH bands (recall ~1 at the verify threshold) — lower
    it for cheaper candidate generation at scale."""
    base = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("text"))
    q40 = F.round(quality_score_col(F.col("text")) * 40).cast("long")
    # the filtered corpus is read by five downstream consumers (dedup
    # agg, semi-join, LSH base, CC nodes, survivor join) — materialize
    # the lang/quality pass once instead of re-running it per consumer
    kept = base.filter(lang_id_col(F.col("text")) == lang).filter(
        q40 >= min_q40
    ).localCheckpoint(eager=True)

    exact_winners = exact_dedup(kept, "id", "text").select("id")
    d2 = kept.join(exact_winners, "id", "left_semi")

    pairs = minhash_lsh_pairs(
        d2, "id", "text", n_perm=n_perm, bands=bands,
        verify_threshold=jaccard, shingle_impl=shingle_impl,
    )
    comp = connected_components(pairs, d2.select("id"))
    survivors = d2.join(
        comp.filter(F.col("id") == F.col("component")).select("id"),
        "id", "left_semi",
    )

    cleaned = line_dedup(survivors, "id", "text", max_occurrences=max_line_occ)
    return cleaned.select(
        "id", "clean_text", "n_kept", "n_removed",
        token_count_col(F.col("clean_text")).cast("long").alias("n_tokens"),
    )


def web_pipeline(
    pages: DataFrame,
    id_col: str,
    html_col: str,
    query_terms: list[str],
    jaccard: float = 0.5,
    n_perm: int = 16,
    bands: int = 4,
    chunk_range: int = 1 << 12,
    k: int = 20,
    shingle_impl: str = "pandas",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The COMPOSED crawl-output-to-search pipeline a 100-TB operator
    actually runs, end to end: crawled pages -> html->text extraction
    -> PII scrub -> exact dedup (min-id winner) -> MinHash-LSH near-dup
    removal (connected components, min-id survivor) -> bounded-chunk
    inverted index -> BM25 ranked retrieval.

    Returns (survivors, chunks, topk) — survivors is the cleaned
    corpus (id, text), chunks the serialized index, topk the query
    result. The caller decides what to materialize; a production run
    persists `survivors` once (the cleaned-corpus artifact) and builds
    the index from it, exactly like bench.py's mega_pipeline entry.

    Scale shape: extraction + scrubbing are codegen projections riding
    the scan; exact dedup is one fingerprint hash-agg; the LSH
    candidate join carries only (id, band) keys; CC is the bounded
    component loop; the index is the chunked hash-agg form
    (operators/bm25.postings_chunks) whose per-group memory is bounded
    regardless of stop-word heat. Nothing quadratic, no collect."""
    from biothings_crawler_spark.operators.bm25 import (
        bm25_topk,
        inverted_postings,
        postings_chunks,
    )
    from biothings_crawler_spark.operators.extract import html_to_text_col
    from biothings_crawler_spark.operators.pii import pii_scrub_col

    txt = pages.select(
        F.col(id_col).alias("id"),
        html_to_text_col(F.col(html_col)).alias("raw_text"),
    )
    # extraction + scrubbing materialize ONCE: downstream the cleaned
    # text is read by the dedup agg, the semi-join, the LSH base, the
    # CC node set and the survivor join — without the cut each consumer
    # re-runs the whole regex chain over the raw HTML (measured 4
    # full re-evaluations at sf0.1).  At 10^10 rows this is the
    # extracted-text table a production run writes anyway.
    scrubbed = txt.select(
        "id", pii_scrub_col(F.col("raw_text")).alias("text")
    ).localCheckpoint(eager=True)

    exact_winners = exact_dedup(scrubbed, "id", "text").select("id")
    d2 = scrubbed.join(exact_winners, "id", "left_semi")

    pairs = minhash_lsh_pairs(
        d2, "id", "text", n_perm=n_perm, bands=bands,
        verify_threshold=jaccard, shingle_impl=shingle_impl,
    )
    comp = connected_components(pairs, d2.select("id"))
    survivors = d2.join(
        comp.filter(F.col("id") == F.col("component")).select("id"),
        "id", "left_semi",
    )

    chunks = postings_chunks(
        inverted_postings(survivors, "id", "text"), chunk_range=chunk_range
    )
    topk = bm25_topk(survivors, "id", "text", query_terms, k=k)
    return survivors, chunks, topk


def training_prep(
    pages: DataFrame,
    id_col: str,
    text_col: str,
    capacity: int = 128,
    n_shards: int = 8,
    lm_min_count: int = 2,
) -> DataFrame:
    """The COMPOSED training-data tail a pretraining pipeline runs on
    cleaned web text: C4 line/page quality filtering
    (operators/text.c4_quality_filter) -> CCNet-style bigram-LM
    scoring with the model trained on the even-id half
    (operators/lm) -> drop the 'tail' bucket -> greedy per-shard
    sequence packing into capacity-bounded context bins
    (operators/packing.pack_sequences).

    Returns the per-doc packing assignment ``(id, shard, bin, tok,
    fill_after, oversized)``.  Scale shape: the C4 stage is a
    row-local projection; LM is two hash aggs + a model equi-join;
    packing is one shard-keyed agg — the whole tail adds three keyed
    shuffles to the corpus, nothing quadratic, no Python.  The driver
    pair (q_training_prep) verifies the COMPOSITION against one DuckDB
    statement, like q_clean_corpus.
    """
    from biothings_crawler_spark.operators.lm import lm_score, train_bigram_lm
    from biothings_crawler_spark.operators.packing import pack_sequences
    from biothings_crawler_spark.operators.text import c4_quality_filter

    c4 = c4_quality_filter(pages, id_col, text_col)
    kept = c4.filter("keep").select("id", F.col("clean_text").alias("text"))
    model = train_bigram_lm(
        kept.filter("id % 2 = 0"), "id", "text", min_count=lm_min_count
    )
    scored = lm_score(kept, model, "id", "text")
    good = kept.join(
        scored.filter("bucket <> 'tail'").select("id"), "id", "left_semi"
    )
    base = good.select(
        "id",
        token_count_col(F.col("text")).alias("n_tok"),
        (F.col("id") % n_shards).alias("shard"),
    )
    return pack_sequences(base, "id", "n_tok", capacity, "shard")
