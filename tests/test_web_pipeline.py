"""Website-ingestor pipeline: env config → fetch → clean → split →
chunk → embed → store, end to end (reference W flow)."""

from __future__ import annotations

from data_ingestion_spark.plans.config import IngestionConfig
from data_ingestion_spark.plans.web_ingestion import run_website_ingestion
from data_ingestion_spark.query_api import EngineQuery
from data_ingestion_spark.sources.sinks import ParquetVectorStore

PAGE = """
<html><body>
<h1>Product&nbsp;Guide</h1>
<p>{intro}</p>
<h2>Install</h2><p>{body}</p>
<h3>Verify</h3><pre class="screen">cmd --check</pre>
</body></html>
""".format(intro="Welcome. " * 30, body="Run the installer. " * 60)


def test_config_from_env(monkeypatch):
    monkeypatch.setenv("WEBSITE_URL", "https://site/x")
    monkeypatch.setenv("VECTORDB_INDEX", "My-Index.v2")
    monkeypatch.setenv("CHUNK_SIZE", "256")
    cfg = IngestionConfig.from_env(store_path="/tmp/s")
    assert cfg.website_url == "https://site/x"
    assert cfg.index_name == "My-Index.v2"
    assert cfg.chunk_size == 256 and cfg.store_path == "/tmp/s"


def test_website_ingestion_end_to_end(spark, tmp_path):
    cfg = IngestionConfig(
        index_name="Site-Docs.v1",
        website_url="https://site/docs",
        store_path=str(tmp_path / "store"),
        chunk_size=200,
        chunk_overlap=40,
        md_split_depth=4,
        embed_dim=8,
    )
    n = run_website_ingestion(spark, cfg, fetcher=lambda u: PAGE)
    assert n > 3  # several sections x chunks

    store = ParquetVectorStore(spark, cfg.store_path)
    assert store.list_collections() == ["site_docs_v1"]  # name normalized

    rows = store.read_collection("site_docs_v1").collect()
    assert all(r.title == "Product Guide" for r in rows)  # nbsp handled
    assert all(len(r.embedding) == 8 for r in rows)
    assert all(r.chunk_text.startswith("Section: Product Guide /") for r in rows)

    # the ingested store is queryable through the reference-shaped API
    eq = EngineQuery(spark, store, embed_dim=8)
    hits = eq.similarity_search("site_docs_v1", "run the installer", k=2).collect()
    assert len(hits) == 2 and "installer" in hits[0].chunk_text.lower()

    # idempotent re-run (the reference's skip-if-exists semantics)
    n2 = run_website_ingestion(spark, cfg, fetcher=lambda u: PAGE)
    assert n2 == n


SITE = {
    # index -> two child sitemaps; one child is itself listed twice
    "https://site/sitemap.xml": (
        "<sitemapindex><sitemap><loc>https://site/sm-a.xml</loc></sitemap>"
        "<sitemap><loc>https://site/sm-b.xml</loc></sitemap></sitemapindex>"
    ),
    "https://site/sm-a.xml": (
        "<urlset><url><loc>https://site/docs/install</loc></url>"
        "<url><loc> https://site/docs/verify </loc></url></urlset>"
    ),
    "https://site/sm-b.xml": (
        "<urlset><url><loc>https://site/docs/install</loc></url></urlset>"  # dup
    ),
    "https://site/docs/install": PAGE,
    "https://site/docs/verify": PAGE.replace("Product&nbsp;Guide", "Verify&nbsp;Guide"),
}


def test_sitemap_seeded_ingestion_end_to_end(spark):
    """r09: the crawl-shaped plan — sitemapindex → sitemaps → page
    frontier (deduped) → the full clean/split/chunk/embed pipeline."""
    from data_ingestion_spark.plans.web_ingestion import (
        sitemap_seeded_urls,
        website_ingestion_from_sitemap,
    )

    urls = {
        r["url"]
        for r in sitemap_seeded_urls(
            spark, "https://site/sitemap.xml", fetcher=SITE.__getitem__
        ).collect()
    }
    assert urls == {"https://site/docs/install", "https://site/docs/verify"}

    cfg = IngestionConfig(
        index_name="Crawl.v1",
        website_url="https://site/sitemap.xml",
        store_path="/unused",
        chunk_size=200,
        chunk_overlap=40,
        md_split_depth=4,
        embed_dim=8,
    )
    rows = website_ingestion_from_sitemap(spark, cfg, fetcher=SITE.__getitem__).collect()
    assert len(rows) > 6  # both pages x sections x chunks
    titles = {r.title for r in rows}
    assert titles == {"Product Guide", "Verify Guide"}
    assert {r.url for r in rows} == urls  # every frontier page ingested
    assert all(len(r.embedding) == 8 for r in rows)


def test_sitemap_seeding_fetches_each_sitemap_once(spark, tmp_path):
    """r09 self-review regression: lazily-composed seeding re-executed
    the level-N fetch from both the pages and the seeds branch (root
    fetched 2x, a twice-listed child 2x per action). localCheckpoint
    per level + pre-fetch dedup must fetch each sitemap EXACTLY once,
    and downstream actions must not re-fetch. Counted via an
    append-only log the executor-side fetcher writes (a closure
    counter lives in the python worker, not the driver)."""
    import collections
    import os

    from data_ingestion_spark.plans.web_ingestion import sitemap_seeded_urls

    log = str(tmp_path / "fetches.log")

    def fetcher(u: str) -> str:
        fd = os.open(log, os.O_WRONLY | os.O_APPEND | os.O_CREAT, 0o644)
        os.write(fd, (u + "\n").encode())
        os.close(fd)
        return SITE[u]

    urls = sitemap_seeded_urls(spark, "https://site/sitemap.xml", fetcher=fetcher)
    got = {r["url"] for r in urls.collect()}
    assert got == {"https://site/docs/install", "https://site/docs/verify"}
    # a second action over the checkpointed frontier: no re-fetch
    assert urls.count() == 2
    counts = collections.Counter(open(log).read().split())
    assert counts == {
        "https://site/sitemap.xml": 1,
        "https://site/sm-a.xml": 1,
        "https://site/sm-b.xml": 1,
    }, counts
