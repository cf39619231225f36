"""HTML clean/convert/crawl tests (reference behaviors, SURVEY §2.9 T1-T2)."""

from __future__ import annotations

from pyspark.sql import Row

from data_ingestion_spark.functions.html import (
    clean_html,
    discover_frontier,
    fetch_pages,
    html_to_markdown,
)

SAMPLE = """
<html><body>
  <div class="breadcrumb">Home &gt; Docs</div>
  <h1 class="title">Install&nbsp;Guide</h1>
  <p>Welcome to the <a href="/intro">introduction</a> page.</p>
  <h2>Prerequisites</h2>
  <ul><li>CPU</li><li>RAM</li></ul>
  <dl><dt>option</dt><dd>what it does</dd></dl>
  <pre class="programlisting">x = 1
print(x)</pre>
  <hr/>
  <a href="/legal">Legal Notice</a>
  <h3>Next steps</h3>
  <p>Read <a href="/en/documentation/pkg/html/install">this</a>.</p>
</body></html>
"""


def test_html_to_markdown_kernel():
    title, md = html_to_markdown(SAMPLE)
    assert title == "Install Guide"  # nbsp normalized, h1 extracted
    assert "# Install Guide" in md
    assert "## Prerequisites" in md
    assert "### Next steps" in md
    assert "- CPU" in md and "- RAM" in md
    assert "-> option" in md
    assert "```programlisting\nx = 1\nprint(x)\n```" in md
    assert "Home > Docs" not in md  # breadcrumb class dropped
    assert "Legal Notice" not in md  # boilerplate anchor dropped
    assert "introduction" in md  # normal anchor text kept


def test_clean_html_stage(spark):
    df = spark.createDataFrame([Row(doc_id=1, html=SAMPLE), Row(doc_id=2, html="<p>hi</p>")])
    out = clean_html(df).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].title == "Install Guide"
    assert by_id[1].page_content.startswith("# Install Guide")
    assert by_id[2].title == "" and by_id[2].page_content == "hi"


def test_discover_frontier(spark):
    html = (
        '<a href="/en/documentation/pkg/html/install">a</a>'
        '<a href="/en/documentation/pkg/html/config">b</a>'
        '<a href="/en/documentation/pkg/pdf/other">no-html</a>'
        '<a href="/fr/documentation/pkg/html/x">wrong-prefix</a>'
    )
    df = spark.createDataFrame([Row(html=html)])
    urls = sorted(r.url for r in discover_frontier(df).collect())
    assert urls == [
        "https://docs.example.com/en/documentation/pkg/html-single/config",
        "https://docs.example.com/en/documentation/pkg/html-single/install",
    ]


def test_fetch_pages_injectable(spark):
    df = spark.createDataFrame([Row(url="u1"), Row(url="u2")])
    out = fetch_pages(df, fetcher=lambda u: f"<h1>{u}</h1>").collect()
    assert {r.url: r.html for r in out} == {"u1": "<h1>u1</h1>", "u2": "<h1>u2</h1>"}


def test_web_pipeline_end_to_end(spark):
    """S2→T1/T2→T3/T4 composition: fake-fetch → clean → markdown split
    → chunk (the website-ingestor flow, website-ingestion-pipeline.py:230-245)."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.textops import (
        chunk_fixed_overlap,
        split_markdown_headers,
    )

    urls = spark.createDataFrame([Row(url=f"https://x/{i}") for i in range(4)])
    pages = fetch_pages(urls, fetcher=lambda u: SAMPLE.replace("Install", u.split("/")[-1]))
    docs = clean_html(pages)
    sections = split_markdown_headers(docs, "page_content")
    chunks = chunk_fixed_overlap(
        sections.select("url", F.explode("sections").alias("sec")),
        text_col="sec",
        id_cols=("url",),
        size=64,
        overlap=16,
    )
    out = chunks.collect()
    assert len(out) >= 4 * 3  # ≥3 sections per page
    assert all(len(r.chunk_text) <= 64 for r in out)


def test_split_markdown_sections_h4_scoping(spark):
    """T3 depth parity with the website pipeline (splits on #### too,
    website-ingestion-pipeline.py:147-152): h4 attaches to bodies under
    the #### header, stays scoped to its h3 span, and RESETS when any
    shallower header appears."""
    from pyspark.sql import Row

    from data_ingestion_spark.functions.textops import split_markdown_sections

    md = "\n".join(
        [
            "# Top",
            "intro",
            "### Deep",
            "## Mid",          # h2 after h3: h3/h4 must reset
            "### S1",
            "#### S1a",
            "body-a",
            "#### S1b",
            "body-b",
            "## Next",         # resets h3 AND h4
            "body-c",
        ]
    )
    df = spark.createDataFrame([Row(doc_id=1, md_text=md)])
    rows = {r.section_text: r for r in split_markdown_sections(df, "md_text").collect()}

    assert rows["intro"].h1 == "Top" and rows["intro"].h4 is None
    a = rows["body-a"]
    assert (a.h1, a.h2, a.h3, a.h4) == ("Top", "Mid", "S1", "S1a")
    b = rows["body-b"]
    assert (b.h1, b.h2, b.h3, b.h4) == ("Top", "Mid", "S1", "S1b")
    c = rows["body-c"]
    assert (c.h2, c.h3, c.h4) == ("Next", None, None)


def test_sitemap_frontier(spark):
    """<loc> extraction is namespace-agnostic, entity-decoding, and
    flags sitemap-index docs whose locs are further sitemaps."""
    from data_ingestion_spark.functions.html import sitemap_frontier

    urlset = (
        '<?xml version="1.0"?><urlset xmlns="http://www.sitemaps.org/'
        'schemas/sitemap/0.9"><url><loc> https://ex.com/a?x=1&amp;y=2 '
        "</loc><lastmod>2026-01-01</lastmod></url>"
        "<url><loc>https://ex.com/b</loc></url>"
        "<url><loc>https://ex.com/b</loc></url></urlset>"  # dup
    )
    index = (
        "<sitemapindex><sitemap><loc>https://ex.com/sitemap-1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame([(urlset,), (index,), ("<html>no locs</html>",)], "xml string")
    rows = {(r["url"], r["is_index"]) for r in sitemap_frontier(df).collect()}
    assert rows == {
        ("https://ex.com/a?x=1&y=2", False),
        ("https://ex.com/b", False),
        ("https://ex.com/sitemap-1.xml", True),
    }
    # plan stays JVM-side: no Python eval in the frontier
    plan = sitemap_frontier(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_sitemap_entity_decode_order(spark):
    """ADVICE r08: &amp; must decode LAST — a correctly-encoded URL
    containing the literal text '&lt;' arrives as '&amp;lt;' and must
    decode to '&lt;', not double-decode to '<'."""
    from data_ingestion_spark.functions.html import sitemap_frontier

    xml = (
        "<urlset><url><loc>https://ex.com/q?m=&amp;lt;tag&amp;gt;</loc>"
        "</url><url><loc>https://ex.com/r?a=1&amp;b=2</loc></url></urlset>"
    )
    df = spark.createDataFrame([(xml,)], "xml string")
    urls = {r["url"] for r in sitemap_frontier(df).collect()}
    assert urls == {
        "https://ex.com/q?m=&lt;tag&gt;",
        "https://ex.com/r?a=1&b=2",
    }


def test_crawl_frontier_dq_plan_and_semantics(spark):
    """The r09 crawl_frontier DQ: sitemap seeds + HTML links unioned,
    index locs excluded, trailing slash normalized, plan JVM-only."""
    import data_ingestion_spark.queries_extra  # noqa: F401  (registers)
    from data_ingestion_spark.queries import SPARK_QUERIES

    df = SPARK_QUERIES["crawl_frontier"](spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    urls = [r["url"] for r in df.collect()]
    assert len(urls) == len(set(urls))  # deduped
    assert not any(u.endswith("/") for u in urls)  # normalized
    assert not any("sitemaps/" in u for u in urls)  # index locs recursed, not emitted
    assert any("?a=1&b=2" in u for u in urls)  # entity-decoded seed
    assert any("/html-single/doc" in u for u in urls)  # rewritten HTML link
    assert not any("/other/" in u or "/pdf/" in u for u in urls)  # filters held


def test_canonical_url_cases(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.html import canonical_url

    cases = [
        ("HTTP://Example.COM:80/A/b/?utm_source=x&b=2&a=1#frag", "http://example.com/A/b?a=1&b=2"),
        ("https://ex.com:443/path/", "https://ex.com/path"),
        ("https://ex.com/path?a=1", "https://ex.com/path?a=1"),
        ("https://ex.com/p?gclid=99&fbclid=z", "https://ex.com/p"),
        ("https://ex.com/p?", "https://ex.com/p"),
        ("http://ex.com:8080/q?z=1&y=2", "http://ex.com:8080/q?y=2&z=1"),  # non-default port kept
        ("http://ex.com:443/x", "http://ex.com:443/x"),  # 443 is NOT http's default
        ("https://EX.com/CaseKept/Path", "https://ex.com/CaseKept/Path"),
        ("https://ex.com/utm_keep?xutm_a=1", "https://ex.com/utm_keep?xutm_a=1"),  # only param PREFIX matches
        # a '?' INSIDE the fragment is not a query (SPA hash routes):
        # resurrecting it would collide the page with a real ?x=1 resource
        ("http://ex.com/a#frag?x=1", "http://ex.com/a"),
        ("https://ex.com/app#/route?tab=1&b=2", "https://ex.com/app"),
        ("https://ex.com/p?a=1#f?x=2", "https://ex.com/p?a=1"),  # real query kept, fragment's ignored
        # percent-encoding normalization (RFC 3986 6.2.2): unreserved
        # escapes decode, everything else keeps (uppercased) encoding
        ("https://ex.com/%7euser", "https://ex.com/~user"),
        ("https://ex.com/%41%62c", "https://ex.com/Abc"),
        ("https://ex.com/a%2fb", "https://ex.com/a%2Fb"),      # %2F reserved: encoded, hex uppercased
        ("https://ex.com/caf%c3%a9", "https://ex.com/caf%C3%A9"),  # non-ASCII stays encoded
        ("https://ex.com/p%25q", "https://ex.com/p%25q"),      # %25 (the escape char) never decodes
        ("https://ex.com/100%", "https://ex.com/100%"),        # stray % is not an escape
        ("https://ex.com/p?%63=2&b=1", "https://ex.com/p?b=1&c=2"),  # decode BEFORE param sort
        ("https://ex.com/p?x=%7e&y=2", "https://ex.com/p?x=~&y=2"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_canonical_url_non_absolute_passthrough(spark):
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.html import canonical_url

    cases = ["/relative/path", "mailto:a@b.c", "not a url", ""]
    df = spark.createDataFrame([(u,) for u in cases], "url string")
    got = [r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == cases  # unchanged, never collapsed to ''


def test_canonical_url_idempotent(spark):
    """A dedup key must be a fixed point: canon(canon(u)) == canon(u)
    over a messy generated URL family plus hostile shapes."""
    import random

    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.html import canonical_url

    rng = random.Random(99)
    schemes = ["http://", "HTTP://", "https://", "HTTPS://", ""]
    hosts = ["Ex.COM", "ex.com", "a.b.c", "", ":80"]
    ports = ["", ":80", ":443", ":8080"]
    paths = ["", "/", "/A/b/", "/x//", "/p", "/%7e", "/a%2fb", "/caf%c3%a9", "/100%", "/%zz"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=x", "?a=/&z=1", "?a=1&a=1"]
    frags = ["", "#f", "#", "#/r?tab=1", "#?x=1"]
    urls = [
        rng.choice(schemes) + rng.choice(hosts) + rng.choice(ports)
        + rng.choice(paths) + rng.choice(queries) + rng.choice(frags)
        for _ in range(300)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    bad = [(r.c1, r.c2) for r in out if r.c1 != r.c2]
    assert not bad, bad[:5]


def test_idn_host_normalize_split_path(spark):
    """IDN hosts punycode; ASCII hosts never cross the Python
    boundary (plan shows the Arrow stage only on the filtered
    slice); unencodable and non-URL rows pass through."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.html import idn_ascii_url, idn_host_normalize

    rows = [
        (0, "https://MÜNCHEN.de/a?x=1"),
        (1, "https://user@köln.example:8080/p"),
        (2, "https://plain.Example.com/q"),     # ASCII: untouched (case kept)
        (3, "not a url"),
        (4, "https://tokyo日本.example/d"),
    ]
    df = spark.createDataFrame(rows, "id long, url string")
    got = {r.id: r.url for r in idn_host_normalize(df).collect()}
    assert got[0] == "https://xn--mnchen-3ya.de/a?x=1"
    assert got[1] == "https://user@xn--kln-sna.example:8080/p"
    assert got[2] == "https://plain.Example.com/q"
    assert got[3] == "not a url"
    assert got[4] == "https://xn--tokyo-6e1k07e.example/d"
    # kernel: port/userinfo preserved, idempotent on already-ascii
    assert idn_ascii_url(got[0]) == got[0]
    # composes with canonical_url: IDN first, then the JVM chain
    from data_ingestion_spark.functions.html import canonical_url

    canon = {
        r.id: r.c
        for r in idn_host_normalize(df)
        .select("id", canonical_url(F.col("url")).alias("c"))
        .collect()
    }
    assert canon[0] == "https://xn--mnchen-3ya.de/a?x=1"


def test_idn_host_normalize_preserves_null_rows(spark):
    """r10 ADVICE: a NULL url made both split-path predicates SQL
    NULL, dropping the row from both slices. The null-safe predicate
    routes NULL/empty rows down the passthrough slice — row count is
    preserved and the NULL survives as NULL."""
    from data_ingestion_spark.functions.html import idn_host_normalize

    rows = [(0, "https://MÜNCHEN.de/a"), (1, None), (2, ""), (3, "relative/path")]
    df = spark.createDataFrame(rows, "id long, url string")
    out = idn_host_normalize(df).collect()
    assert len(out) == 4  # nothing dropped
    got = {r.id: r.url for r in out}
    assert got[0] == "https://xn--mnchen-3ya.de/a"
    assert got[1] is None
    assert got[2] == ""
    assert got[3] == "relative/path"


def test_extract_main_content_heuristics(spark):
    from data_ingestion_spark.functions.html import (
        extract_main_content,
        extract_main_content_stage,
    )

    article = (
        "This is the actual article content with enough characters to matter "
        "and no links at all."
    )
    page = (
        '<nav><a href="/">Home</a> <a href="/a">About</a></nav>'
        "<header><h1>Banner</h1></header>"
        f"<article><p>{article}</p></article>"
        '<div><a href="/r1">A long related-story link title here</a> '
        '<a href="/r2">Another long related link text block</a></div>'
        '<footer>© 2026 <a href="/l">Legal</a></footer>'
    )
    out = extract_main_content(page)
    assert out == article                      # boilerplate fully gone
    # link-dominated long block drops even outside boiler tags
    linky = '<div><a href="/x">' + "link words " * 10 + "</a></div>"
    assert extract_main_content(linky) == ""
    # a long link-free div survives; min_chars dial works
    keep = "<div>" + "real words " * 10 + "</div>"
    assert "real words" in extract_main_content(keep)
    assert extract_main_content("<p>tiny</p>") == ""
    assert extract_main_content("<p>tiny</p>", min_chars=3) == "tiny"
    # nested boiler: article inside a nav is still boilerplate
    nested = f"<nav><article><p>{article}</p></article></nav>"
    assert extract_main_content(nested) == ""
    # hostile markup never raises
    for h in ["", None, "<<<><p unclosed", "<a><a><a>" + "x" * 100, "\x00\xff<div>"]:
        extract_main_content(h)
    # Spark stage: passthrough + main_text schema
    df = spark.createDataFrame([(1, page), (2, "<p>tiny</p>")], "doc_id long, html string")
    rows = {r.doc_id: r.main_text for r in extract_main_content_stage(df).collect()}
    assert rows[1] == article and rows[2] == ""


def test_extract_anchor_edges(spark):
    from data_ingestion_spark.functions.html import extract_anchor_edges

    html = (
        '<a href="/x">plain</a>'
        '<a class="z" href="/y" id="k"><b>bold</b>  text\nwrapped</a>'
        '<a href="/empty"></a>'
        '<a name="no-href">not a link</a>'
        "<a href='single-quoted'>skipped by design</a>"
    )
    df = spark.createDataFrame([("https://ex.com/p", html)], "url string, html string")
    rows = extract_anchor_edges(df).collect()
    got = {(r.dst, r.anchor_text) for r in rows}
    assert got == {
        ("/x", "plain"),
        ("/y", "bold text wrapped"),   # nested tag stripped, whitespace collapsed
        ("/empty", ""),
    }
    assert all(r.src == "https://ex.com/p" for r in rows)
    # JVM-only plan (link-graph extraction must not cross into Python)
    plan = extract_anchor_edges(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_repair_mojibake_kernel_and_split_path(spark):
    """ftfy-core repair: single/double unwind, precision on clean
    accents and ASCII, null-safety, and the ASCII slice staying out
    of the Arrow stage."""
    from pyspark.sql import functions as F

    from data_ingestion_spark.functions.textops import (
        repair_mojibake,
        repair_mojibake_text,
    )

    assert repair_mojibake_text("cafÃ©") == "café"            # single
    assert repair_mojibake_text("cafÃƒÂ©") == "café"  # double
    assert repair_mojibake_text("café") == "café"                        # precision
    assert repair_mojibake_text("À bientôt") == "À bientôt"
    assert repair_mojibake_text("plain ascii") == "plain ascii"
    assert repair_mojibake_text("") == ""

    rows = [(0, "plain"), (1, "cafÃ©"), (2, None), (3, "café")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = repair_mojibake(df)
    got = {r.id: r.text for r in out.collect()}
    assert got == {0: "plain", 1: "café", 2: None, 3: "café"}
    # the ASCII/NULL slice is a plain filter with no Python stage
    plan = df.filter(
        ~F.coalesce(F.col("text").rlike(r"[^\x00-\x7F]"), F.lit(False))
    )._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan
