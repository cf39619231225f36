"""HTML ingestion: fetch, link discovery, clean, convert to Markdown.

Re-expresses the reference's loader/cleaner stack (SURVEY.md §2.1
S2-S4, §2.9 T1-T2) without LangChain/BeautifulSoup — a stdlib
``html.parser`` state machine inside Arrow-batched ``mapInPandas``:

- title extraction from the first <h1> (ingestion-pipeline.py:73)
- drop unwanted container classes and "Legal Notice" anchors
  (ingestion-pipeline.py:86-115, 149-151)
- attribute stripping is inherent (the parser emits text, not markup)
- <hr> dropped (ingestion-pipeline.py:113)
- <dt> rendered as '-> ' items (ingestion-pipeline.py:117)
- <pre class="programlisting|screen"> → fenced code blocks tagged
  with the language class (ingestion-pipeline.py:122-147)
- non-breaking spaces normalized (ingestion-pipeline.py:154)
- h1..h6 → ATX headings, p/li/br → Markdown text (the
  Html2TextTransformer role, ingestion-pipeline.py:201-202)

Link discovery (the crawl frontier, ingestion-pipeline.py:166-191)
stays fully JVM-side: ``regexp_extract_all`` over raw HTML + explode.
Network fetch is injectable (no network in tests; at scale you want a
rate-limited client per executor anyway).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType, StructField, StructType

#: container classes dropped wholesale, mirroring the reference's
#: decompose list (ingestion-pipeline.py:86-115; generic names — the
#: *mechanism* is the operator, the list is config)
DEFAULT_DROP_CLASSES = frozenset(
    {"breadcrumb", "producttitle", "subtitle", "abstract", "legal-notice", "docs-metadata"}
)

#: pre classes rendered as fenced code with a language tag
CODE_PRE_CLASSES = {"programlisting", "screen"}


class _MarkdownConverter(HTMLParser):
    """Single-pass HTML → Markdown with class-based pruning."""

    BLOCK_BREAK = {"p", "div", "section", "article", "ul", "ol", "dl", "table", "tr"}

    def __init__(self, drop_classes: frozenset[str] = DEFAULT_DROP_CLASSES):
        super().__init__(convert_charrefs=True)
        self.drop_classes = drop_classes
        self.out: list[str] = []
        self.title: str | None = None
        self._skip_depth = 0
        self._heading: int | None = None
        self._in_title_h1 = False
        self._fence: str | None = None
        self._anchor_buf: list[str] | None = None

    # -- helpers
    def _classes(self, attrs) -> set[str]:
        for k, v in attrs:
            if k == "class" and v:
                return set(v.split())
        return set()

    def _emit(self, text: str) -> None:
        if self._skip_depth:
            return
        self.out.append(text)

    # -- parser hooks
    def handle_starttag(self, tag, attrs):
        classes = self._classes(attrs)
        if self._skip_depth or (classes & self.drop_classes) or tag == "hr":
            if tag not in ("br", "hr", "img", "input", "meta", "link"):
                self._skip_depth += 1
            return
        if tag in {"script", "style"}:
            self._skip_depth += 1
            return
        if tag in {"h1", "h2", "h3", "h4", "h5", "h6"}:
            level = int(tag[1])
            self._heading = level
            self._in_title_h1 = tag == "h1" and self.title is None
            self._emit("\n\n" + "#" * level + " ")
        elif tag == "pre":
            lang = next(iter(classes & CODE_PRE_CLASSES), None)
            self._fence = lang or ""
            self._emit(f"\n\n```{self._fence}\n")
        elif tag == "li":
            self._emit("\n- ")
        elif tag == "dt":
            self._emit("\n-> ")
        elif tag == "br":
            self._emit("\n")
        elif tag == "a":
            self._anchor_buf = []
        elif tag in self.BLOCK_BREAK:
            self._emit("\n\n")

    def handle_endtag(self, tag):
        if tag in {"script", "style"} or (self._skip_depth and tag not in ("br", "hr")):
            self._skip_depth = max(0, self._skip_depth - 1)
            return
        if tag in {"h1", "h2", "h3", "h4", "h5", "h6"}:
            self._heading = None
            self._in_title_h1 = False
            self._emit("\n")
        elif tag == "pre" and self._fence is not None:
            self._fence = None
            self._emit("\n```\n")
        elif tag == "a" and self._anchor_buf is not None:
            text = "".join(self._anchor_buf)
            self._anchor_buf = None
            # drop boilerplate anchors (ingestion-pipeline.py:149-151)
            if text.strip().lower() != "legal notice":
                self._emit(text)

    def handle_data(self, data):
        if self._skip_depth:
            return
        text = data.replace("\xa0", " ")
        if self._fence is None:
            text = text.replace("\r", "")
        if self._in_title_h1:
            self.title = (self.title or "") + text
        if self._anchor_buf is not None:
            self._anchor_buf.append(text)
        else:
            self._emit(text)

    # -- result
    def result(self) -> tuple[str, str]:
        md = "".join(self.out)
        lines = [ln.rstrip() for ln in md.split("\n")]
        cleaned: list[str] = []
        blank = 0
        fenced = False
        for ln in lines:
            if ln.startswith("```"):
                fenced = not fenced
            if not fenced and not ln.strip():
                blank += 1
                if blank > 1:
                    continue
            else:
                blank = 0
            cleaned.append(ln if fenced else ln.strip())
        return (self.title or "").strip(), "\n".join(cleaned).strip()


def html_to_markdown(
    html: str, drop_classes: frozenset[str] = DEFAULT_DROP_CLASSES
) -> tuple[str, str]:
    """T1+T2 kernel: clean HTML and convert to Markdown. Returns
    (title, markdown)."""
    conv = _MarkdownConverter(drop_classes)
    conv.feed(html or "")
    conv.close()
    return conv.result()


CLEAN_SCHEMA = StructType(
    [StructField("title", StringType()), StructField("page_content", StringType())]
)


def clean_html(df: DataFrame, html_col: str = "html") -> DataFrame:
    """S4/T1/T2 stage: HTML → (title, page_content markdown), Arrow-
    batched. Pure Python is unavoidable here (a real parser state
    machine); batches keep the interpreter crossing amortized."""
    passthrough = [c for c in df.columns if c != html_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != html_col] + list(CLEAN_SCHEMA.fields)
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            res = [html_to_markdown(h) for h in pdf[html_col]]
            out = pdf[passthrough].copy()
            out["title"] = [t for t, _ in res]
            out["page_content"] = [m for _, m in res]
            yield out

    return df.mapInPandas(run, schema)


#: href extraction pattern (crawl frontier, ingestion-pipeline.py:183-190)
HREF_PATTERN = r'href="([^"]+)"'


def extract_links(html_col: Column) -> Column:
    """S3: link discovery — fully JVM-side regexp_extract_all; callers
    explode + filter (F1/F2) + rewrite (F3)."""
    return F.regexp_extract_all(html_col, F.lit(HREF_PATTERN), 1)


def discover_frontier(
    df: DataFrame,
    html_col: str = "html",
    prefix: str = "/en/documentation",
    contains: str = "/html/",
    rewrite: tuple[str, str] = ("/html/", "/html-single/"),
    base_url: str = "https://docs.example.com",
    dedup: bool = True,
) -> DataFrame:
    """The reference's get_pages composition (ingestion-pipeline.py:
    166-191): extract → explode → prefix filter → contains filter →
    single-page rewrite → absolute URL. ``dedup=False`` skips the
    final distinct for callers that union several frontiers and
    dedup ONCE at the end (one exchange instead of three —
    crawl_frontier)."""
    links = df.select(F.explode(extract_links(F.col(html_col))).alias("url"))
    out = (
        links.filter(F.col("url").startswith(prefix))
        .filter(F.col("url").contains(contains))
        .select(
            F.concat(
                F.lit(base_url), F.replace(F.col("url"), F.lit(rewrite[0]), F.lit(rewrite[1]))
            ).alias("url")
        )
    )
    return out.distinct() if dedup else out


def sitemap_frontier(
    df: DataFrame, xml_col: str = "xml", dedup: bool = True
) -> DataFrame:
    """Crawl-frontier seeding from sitemap.xml — the step every real
    crawl runs before link discovery (the reference scrapes a given
    URL list; at corpus scale the list COMES from sitemaps). Fully
    JVM-side, honoring the repo's 'JVM-side first' rule: ``<loc>``
    entries extracted via regexp_extract_all (namespace-agnostic — a
    regexp over ``<loc>`` doesn't care about xmlns prefixes the way a
    strict parser does), the five XML entities decoded, plus an
    ``is_index`` flag (true when the document is a <sitemapindex>,
    whose locs are MORE sitemaps to fetch — the caller loops those
    through fetch_pages, exactly like frontier recursion). Output:
    one row per loc (url, is_index), distinct."""
    locs = df.select(
        F.explode(
            F.regexp_extract_all(
                F.col(xml_col), F.lit(r"<loc>\s*([^<]+?)\s*</loc>"), F.lit(1)
            )
        ).alias("url"),
        F.col(xml_col).contains("<sitemapindex").alias("is_index"),
    )
    url = F.col("url")
    # Standard XML entity-decode ordering: &amp; LAST, so a correctly
    # encoded literal entity ("&amp;lt;") decodes to "&lt;", not "<".
    for ent, ch in (
        ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", '"'), ("&apos;", "'"), ("&amp;", "&"),
    ):
        url = F.replace(url, F.lit(ent), F.lit(ch))
    out = locs.select(url.alias("url"), "is_index")
    return out.distinct() if dedup else out


Fetcher = Callable[[str], str]


def fetch_pages(df: DataFrame, url_col: str = "url", fetcher: Fetcher | None = None) -> DataFrame:
    """S2: page fetch as a mapInPandas stage with an injectable
    fetcher (tests inject a fake; production injects a rate-limited
    session). Using the default urllib fetcher requires network."""

    def default_fetch(url: str) -> str:
        import urllib.request

        with urllib.request.urlopen(url, timeout=30) as r:  # pragma: no cover
            return r.read().decode("utf-8", "replace")

    fetch = fetcher or default_fetch
    passthrough = [c for c in df.columns]
    schema = StructType(list(df.schema.fields) + [StructField("html", StringType())])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough].copy()
            out["html"] = [fetch(u) for u in pdf[url_col]]
            yield out

    return df.mapInPandas(run, schema)


#: tracking query params stripped by canonical_url — the industry-
#: standard removal set (analytics decoration that fragments crawl
#: dedup keys without changing the resource)
_TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid)="

#: RFC 3986 unreserved characters: percent-escapes of these decode to
#: the literal char (they never affect parsing, so '%7Euser' and
#: '~user' are the same resource); every OTHER escape — reserved
#: chars like %2F, %25 itself, non-ASCII bytes — must stay encoded
#: (decoding them would change component boundaries or meaning) and
#: only gets its hex digits uppercased.
_UNRESERVED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-._~"
)


def pct_normalize(col: Column) -> Column:
    """Percent-encoding normalization (RFC 3986 §6.2.2.1–2) as a pure
    JVM regexp chain: uppercase the hex digits of every valid escape
    (two passes of six single-digit rewrites per position — '%3f' →
    '%3F'), then decode escapes of unreserved characters ('%7E' →
    '~'). '%' followed by non-hex is not an escape and passes
    untouched; '%25' is reserved and stays encoded, which is what
    makes the rewrite idempotent (no decoded char can re-form an
    escape)."""
    for d in "abcdef":
        col = F.regexp_replace(col, f"%{d}([0-9A-Fa-f])", f"%{d.upper()}$1")
    for d in "abcdef":
        col = F.regexp_replace(col, f"%([0-9A-F]){d}", f"%$1{d.upper()}")
    for ch in _UNRESERVED:
        col = F.regexp_replace(col, "%%%02X" % ord(ch), ch)
    return col


def canonical_url(url: Column) -> Column:
    """Canonicalize an absolute http(s) URL into a crawl dedup key —
    the hygiene step between frontier/WARC ingestion and URL-level
    dedup (the same page arrives as Http://EX.com:80/a/?utm_source=x
    and http://ex.com/a across crawls; naive distinct treats them as
    different documents).

    Steps, all JVM expressions (DuckDB-twin-able for the oracle):
    lowercase scheme+authority (path case is significant and kept);
    strip the scheme's default port (:80 http, :443 https — other
    ports kept); drop the fragment; drop tracking params
    (utm_*/gclid/fbclid); sort surviving query params byte-wise;
    strip trailing path slashes; drop an empty '?'.

    Percent-encoding is normalized FIRST (``pct_normalize``: hex
    digits uppercased, unreserved-char escapes decoded — '%7Euser',
    '%7euser' and '~user' become one key) and BEFORE param sorting,
    so '?%63=2&b=1' and '?c=2&b=1' sort identically. Reserved
    escapes (%2F, %25, non-ASCII bytes) stay encoded — decoding them
    would change component boundaries — so the rewrite cannot move a
    '?' or '#' and is idempotent.

    NOT done (documented limits): IDN host normalization (needs
    codec tables — a Python stage if ever required) and dot-segment
    resolution (absent from crawl frontiers in practice). Inputs
    that are not scheme://authority URLs (relative paths, mailto:,
    NULL-ish strings) pass through UNCHANGED — collapsing them to
    '' would silently merge every malformed row into one dedup key.
    """
    norm = pct_normalize(url)  # passthrough below returns the ORIGINAL
    head = F.regexp_extract(norm, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1)
    path = F.regexp_extract(norm, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    # lazy pre-fragment prefix: [^#] cannot cross '#', so a '?' that
    # only appears inside the fragment ('/a#/r?tab=1', SPA hash
    # routes) yields NO query instead of resurrecting fragment
    # content as one — which would collide the page with a genuinely
    # different resource
    query = F.regexp_extract(norm, r"^[^#]*?\?([^#]*)", 1)
    head = F.lower(head)
    head = F.regexp_replace(head, r"^(http://[^/?#:]*):80$", "$1")
    head = F.regexp_replace(head, r"^(https://[^/?#:]*):443$", "$1")
    path = F.regexp_replace(path, r"/+$", "")
    params = F.filter(
        F.split(query, "&"),
        lambda x: (F.length(x) > 0) & ~x.rlike(_TRACKING_PARAM_RE),
    )
    q = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        head, path, F.when(F.length(q) > 0, F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )
    return F.when(F.length(head) > 0, canon).otherwise(url)


# ---------------------------------------------------------------- IDN hosts

def idn_ascii_url(url: str) -> str:
    """Punycode-normalize one URL's host (RFC 3490 via the stdlib
    'idna' codec: per-label lowercase + xn-- encoding) — 'MÜNCHEN.de'
    and 'münchen.de' become the same 'xn--mnchen-3ya.de' dedup key a
    DNS resolver actually sees. Userinfo/port/path/query are
    untouched; unencodable hosts (hostile labels the codec rejects)
    return the URL unchanged rather than corrupting the row."""
    import re as _re

    m = _re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://)([^/?#]*)([\s\S]*)$", url or "")
    if not m:
        return url
    scheme, auth, rest = m.groups()
    userinfo, sep, hostport = auth.rpartition("@")
    hm = _re.match(r"^([\s\S]*?)(:\d*)?$", hostport)
    host, port = hm.group(1), hm.group(2) or ""
    if not host:
        return url
    try:
        enc = host.encode("idna").decode("ascii")
    except (UnicodeError, ValueError):
        return url
    return scheme + userinfo + sep + enc + port + rest


def idn_host_normalize(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Batch IDN normalization, split-path for scale: rows whose host
    is pure ASCII (the overwhelming majority of any crawl) never
    cross the Python boundary — only the non-ASCII-host slice runs
    the Arrow stage, then the two slices union back. Closes the IDN
    half of canonical_url's documented limit (run this BEFORE
    canonical_url; the output host is ASCII so the JVM chain's
    lowercase/port logic applies cleanly)."""
    host = F.regexp_extract(
        F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1
    )
    needs = F.length(host) > 0
    non_ascii = host.rlike(r"[^\x00-\x7F]")

    @F.pandas_udf(StringType())
    def _idn(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: idn_ascii_url(u if isinstance(u, str) else ""))

    # Null-safe: for a NULL url both `needs & non_ascii` and its
    # negation evaluate to SQL NULL, which would drop the row from
    # BOTH slices of the split-path union. coalesce(..., False)
    # routes NULL/malformed rows down the passthrough slice, matching
    # canonical_url's preserve-malformed-rows contract (r10 ADVICE).
    cond = F.coalesce(needs & non_ascii, F.lit(False))
    keep = df.filter(~cond)
    fix = df.filter(cond).withColumn(url_col, _idn(F.col(url_col)))
    return keep.unionByName(fix)


# ------------------------------------------------------- main content

#: containers dropped wholesale by the main-content extractor —
#: structural boilerplate regardless of content
BOILER_TAGS = frozenset(
    {"nav", "header", "footer", "aside", "menu", "form", "script", "style", "noscript"}
)

#: block-level containers that delimit candidate text blocks
_BLOCK_TAGS = frozenset(
    {"p", "div", "section", "article", "main", "li", "td", "pre",
     "blockquote", "h1", "h2", "h3", "h4", "h5", "h6"}
)


class _MainContentExtractor(HTMLParser):
    """Boilerpipe/arc90-style main-content heuristic: split the page
    into block-level text runs, score each by length and link
    density, keep the content-like blocks. Text inside BOILER_TAGS
    never becomes a candidate."""

    def __init__(self, min_chars: int = 25, max_link_density: float = 0.33):
        super().__init__(convert_charrefs=True)
        self.min_chars = min_chars
        self.max_link_density = max_link_density
        self.blocks: list[str] = []
        self._boiler_depth = 0
        self._text: list[str] = []
        self._link_chars = 0
        self._anchor_depth = 0

    def _flush(self) -> None:
        text = " ".join("".join(self._text).split())
        link_chars = self._link_chars
        self._text, self._link_chars = [], 0
        if len(text) < self.min_chars:
            return
        if link_chars / max(len(text), 1) > self.max_link_density:
            return
        self.blocks.append(text)

    def handle_starttag(self, tag, attrs):
        if tag in BOILER_TAGS:
            self._boiler_depth += 1
            return
        if self._boiler_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth += 1

    def handle_endtag(self, tag):
        if tag in BOILER_TAGS:
            self._boiler_depth = max(0, self._boiler_depth - 1)
            return
        if self._boiler_depth:
            return
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a":
            self._anchor_depth = max(0, self._anchor_depth - 1)

    def handle_data(self, data):
        if self._boiler_depth:
            return
        self._text.append(data)
        if self._anchor_depth:
            self._link_chars += len(data)

    def result(self) -> str:
        self._flush()
        return "\n\n".join(self.blocks)


def extract_main_content(
    html: str, min_chars: int = 25, max_link_density: float = 0.33
) -> str:
    """Boilerplate removal for crawl pages (the step between WARC
    decode and chunking that the reference's docs-site pipeline gets
    away without — its class-based drop list assumes ONE site's
    markup; a general crawl needs a structural heuristic). Blocks
    inside nav/header/footer/aside are dropped wholesale; remaining
    block-level text runs survive if they are long enough and not
    link-dominated (boilerpipe's shallow-text classifier, ~the
    arc90-readability rule). Deterministic, stdlib-only, never
    raises on hostile markup."""
    ex = _MainContentExtractor(min_chars, max_link_density)
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:
        pass  # hostile markup: keep whatever blocks were completed
    return ex.result()


def extract_main_content_stage(df: DataFrame, html_col: str = "html") -> DataFrame:
    """Arrow-batched mapInPandas stage over pages: passthrough columns
    + ``main_text``. Same narrow-map contract as clean_html."""
    passthrough = [c for c in df.columns if c != html_col]
    schema = StructType(
        [f for f in df.schema.fields if f.name != html_col]
        + [StructField("main_text", StringType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[passthrough].copy()
            out["main_text"] = [extract_main_content(h) for h in pdf[html_col]]
            yield out

    return df.mapInPandas(run, schema)


# ---------------------------------------------------------- anchor edges

#: one <a> element: href attribute + inner body (lazy, cross-line)
ANCHOR_PATTERN = r'<a\s[^>]*href="([^"]*)"[^>]*>([\s\S]*?)</a>'


def extract_anchor_edges(
    df: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """The LINK GRAPH with anchor text: (src, dst, anchor_text) rows
    from raw HTML — pure JVM regexp (extract whole <a> elements,
    explode, re-extract href + body per element, strip nested tags,
    collapse whitespace). Two consumers at crawl scale: the edge
    list feeds `graph.pagerank_scores` for frontier prioritization,
    and anchor text is a training signal in its own right (link text
    describes the TARGET page — the classic anchor-text corpus).
    Zero Python, zero shuffles beyond the explode's row growth."""
    m = F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_PATTERN), 0)
    return (
        df.select(F.col(url_col).alias("src"), F.explode(m).alias("__a"))
        .select(
            "src",
            F.regexp_extract("__a", ANCHOR_PATTERN, 1).alias("dst"),
            F.trim(
                F.regexp_replace(
                    F.regexp_replace(
                        F.regexp_extract("__a", ANCHOR_PATTERN, 2),
                        r"<[^>]*>",
                        " ",
                    ),
                    r"\s+",
                    " ",
                )
            ).alias("anchor_text"),
        )
    )
