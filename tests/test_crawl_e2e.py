"""End-to-end: engine BFS crawl == frozen oracle simulator, and
kill/resume produces identical results (north_rule)."""

import pytest

from biothings_crawler_spark.fixtures import corpus
from biothings_crawler_spark.oracle.bfs import CrawlConfig, simulate_crawl
from biothings_crawler_spark.plans.crawl import run_crawl

N = 300
CFG = CrawlConfig(
    max_rounds=5,
    default_budget=15,
    round_seconds=10.0,     # zenodo: 10, omicsdi: 5, clic: 20, dataverse: 1
    obey_robots=True,
    n_segments=8,
    bloom_bits_per_segment=1 << 12,  # deliberately small -> real FPP exercised
    bloom_hashes=5,
)


@pytest.fixture(scope="module")
def oracle_result():
    pages = {r["url"]: r["html"].decode("utf-8") for r in corpus.gen_pages(N)}
    return simulate_crawl(
        pages, corpus.gen_seeds(N), corpus.gen_robots(), corpus.POLICIES, CFG
    )


def _run_engine(spark, tmpdir, cfg=CFG):
    return run_crawl(
        spark,
        corpus.pages_df(spark, N),
        corpus.seeds_df(spark, N),
        corpus.robots_df(spark),
        corpus.gen_policies(),
        str(tmpdir),
        cfg,
    )


def _engine_tables(spark, tmpdir):
    from biothings_crawler_spark.catalog import ParquetManifestCatalog

    cat = ParquetManifestCatalog(str(tmpdir))
    sched = cat.read(spark, "scheduled")
    docs = cat.read(spark, "docs")
    texts = cat.read(spark, "page_texts")
    return sched, docs, texts


def test_engine_matches_oracle(spark, tmp_path, oracle_result):
    summary = _run_engine(spark, tmp_path / "cp")
    assert summary["rounds"] >= 3
    sched, docs, texts = _engine_tables(spark, tmp_path / "cp")

    engine_ordering = sorted(
        (r["round"], r["host"], r["sched_rank"], r["url_canon"])
        for r in sched.select("round", "host", "sched_rank", "url_canon").collect()
    )
    assert engine_ordering == sorted(oracle_result.ordering)

    engine_docs = sorted(
        (r["round"], r["url_canon"], r["doc_json"])
        for r in docs.select("round", "url_canon", "doc_json").collect()
    )
    assert engine_docs == sorted(oracle_result.docs)

    engine_seen = {r["url_canon"] for r in sched.select("url_canon").collect()}
    assert engine_seen == oracle_result.seen


def test_page_texts_byte_identical_to_corpus_golden(spark, tmp_path, oracle_result):
    _run_engine(spark, tmp_path / "cp")
    _, _, texts = _engine_tables(spark, tmp_path / "cp")
    golden = {r["url"]: r["text"] for r in corpus.gen_pages(N)}
    rows = texts.select("url", "text").collect()
    assert rows, "crawl extracted nothing"
    bad = [r["url"] for r in rows if golden.get(r["url"]) != r["text"]]
    assert bad == [], f"text mismatches: {bad[:5]}"


def test_metrics_match_oracle(spark, tmp_path, oracle_result):
    _run_engine(spark, tmp_path / "cp")
    from biothings_crawler_spark.catalog import ParquetManifestCatalog

    cat = ParquetManifestCatalog(str(tmp_path / "cp"))
    m = cat.read(spark, "metrics")
    engine = {
        (r["round"], r["host"], r["metric"]): r["value"]
        for r in m.collect()
        if r["metric"] in ("scheduled", "fetched", "docs", "links")
    }
    for (rnd, host), counters in oracle_result.metrics.items():
        for k, v in counters.items():
            if v:
                assert engine.get((rnd, host, k), 0) == v, (rnd, host, k)


def test_refetch_round_docs_and_resume(spark):
    """The incremental-crawl composition (diff -> changed queue ->
    catalog semi-join -> one-round refetch crawl on corpus v2) must
    (a) re-extract exactly the simulator's expected docs, (b) resume
    as a no-op: re-invoking the finished refetch crawl on its own
    checkpoint schedules nothing new and leaves the docs byte-
    identical, and (c) leave the round-1 checkpoint untouched."""
    import duckdb

    from biothings_crawler_spark.oracle import golden
    from biothings_crawler_spark.plans.driver_queries import (
        _run_fixture_crawl,
        _run_refetch_crawl,
        q_crawl_refetch_round,
    )
    from biothings_crawler_spark.oracle.bfs import CrawlConfig

    got = sorted(
        (r["round"], r["url_canon"], r["doc_json"])
        for r in q_crawl_refetch_round(spark, "/root/testdata/sf0.001").collect()
    )
    want = sorted(
        map(tuple,
            duckdb.sql(
                "SELECT round, url_canon, doc_json FROM "
                f"read_parquet('{golden.paths()['refetch_docs']}')"
            ).fetchall())
    )
    assert got == want and len(got) > 0

    # resume no-op: the refetch checkpoint is complete; re-running the
    # crawl on it must schedule 0 new rounds and keep docs identical
    cat2 = _run_refetch_crawl(spark)
    pol2 = [dict(p, follow=False) for p in corpus.gen_policies()]
    cfg = CrawlConfig(**{**golden.CRAWL_CFG, "max_rounds": 1})
    summary = run_crawl(
        spark, corpus.pages_v2_df(spark, golden.CRAWL_N).coalesce(4),
        corpus.seeds_df(spark, golden.CRAWL_N).coalesce(1),
        corpus.robots_df(spark).coalesce(1), pol2, str(cat2.root), cfg,
    )
    assert summary["rounds"] == 0
    again = sorted(
        (r["round"], r["url_canon"], r["doc_json"])
        for r in cat2.read(spark, "docs")
        .select("round", "url_canon", "doc_json").collect()
    )
    assert [(int(r), u, j) for r, u, j in again] == got

    # round-1 checkpoint untouched by the refetch run
    cat1 = _run_fixture_crawl(spark)
    assert cat1.latest_round() == golden.CRAWL_CFG["max_rounds"] - 1


def test_resume_identical_after_kill(spark, tmp_path, oracle_result):
    """Kill after round 1, resume -> byte-identical ordering + docs."""
    cut = CrawlConfig(**{**CFG.__dict__, "max_rounds": 2})
    _run_engine(spark, tmp_path / "cut", cut)     # killed after 2 rounds
    _run_engine(spark, tmp_path / "cut", CFG)     # resume to completion
    _run_engine(spark, tmp_path / "full", CFG)    # uninterrupted reference

    for table in ("scheduled", "docs"):
        from biothings_crawler_spark.catalog import ParquetManifestCatalog

        a = ParquetManifestCatalog(str(tmp_path / "cut")).read(spark, table)
        b = ParquetManifestCatalog(str(tmp_path / "full")).read(spark, table)
        cols = sorted(set(a.columns) & set(b.columns))
        key = lambda t: tuple((v is None, str(v)) for v in t)  # noqa: E731
        ra = sorted((tuple(r[c] for c in cols) for r in a.select(*cols).collect()), key=key)
        rb = sorted((tuple(r[c] for c in cols) for r in b.select(*cols).collect()), key=key)
        assert ra == rb, table
