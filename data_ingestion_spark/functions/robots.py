"""robots.txt politeness gate for the crawl frontier.

Reference anchor: the reference's website pipeline crawls live URLs
(website-ingestion-pipeline.py, the crawl step P:166-191) with no
robots gate — acceptable for its own docs site, not for a general
crawler. Any real user re-fetching `snapshot_diff`'s added/changed
set must filter through the target hosts' robots.txt first; this
module is that gate, engine-side.

Semantics (documented, oracle-able): the Google REP / RFC 9309
model — rules are (path-pattern, allow/disallow) taken from the
most specific matching ``User-agent`` group (longest group value
that is a case-insensitive prefix of the crawler's product token;
all groups with the winning value merge; fall back to ``*``). A
pattern matches against the URL's path INCLUDING the query string;
``*`` in a pattern matches any character run and a trailing ``$``
anchors the match at the end (a ``$`` elsewhere is literal, per
Google REP). The MOST SPECIFIC matching rule decides — specificity
is the pattern's octet length — an allow wins a specificity tie,
and a URL matching no rule is allowed. Patterns without ``*``/``$``
take the literal-prefix fast path (plain ``startswith``, no regex;
this is also the pinned fallback semantics for any rule the regex
translation cannot express). Crawl-delay scheduling lives in
``politeness_waves`` (a rate concern for the fetcher, not a filter
concern).

The 100 TB shape: robots bodies are one tiny document per HOST —
parsing them in an Arrow-batched Python stage costs nothing next to
the fetch, and the resulting rule table is |hosts| x ~10 rows. The
frontier join is host-keyed: broadcast when the rule table is small
(the default here), a plain shuffled equi-join when a crawl spans more
hosts than a broadcast can carry; either way the decision reduces
per-URL with an ordinary max aggregate — no window over skewed host
partitions, no Python in the per-URL hot path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

#: parsed-rule schema: one row per (host, pattern, allow, regex) —
#: ``rule_regex`` is NULL for literal-prefix patterns (the fast
#: path) and a start-anchored Java-compatible regex when the
#: pattern carries ``*`` wildcards or a trailing ``$`` anchor
RULES_SCHEMA = "host string, rule_path string, allow boolean, rule_regex string"


def rule_pattern_to_regex(pattern: str) -> str | None:
    """Translate one REP path pattern to a start-anchored regex, or
    None when the pattern is a plain literal prefix (no ``*``, no
    trailing ``$``) — the caller then uses ``startswith``, which is
    both the fast path and the documented fallback semantics. Per
    the Google REP draft: ``*`` matches any run of characters, a
    ``$`` at the END anchors the match, a ``$`` anywhere else is a
    literal character."""
    import re as _re

    if "*" not in pattern and not pattern.endswith("$"):
        return None
    body = pattern[:-1] if pattern.endswith("$") else pattern
    rx = "^" + "".join(".*" if ch == "*" else _re.escape(ch) for ch in body)
    if pattern.endswith("$"):
        rx += "$"
    return rx


def _parse_groups(body: str):
    """robots.txt → [(ua_values, rules, crawl_delay)] per group.
    Group logic per REP: consecutive User-agent lines open a group;
    the first Allow/Disallow/Crawl-delay closes the group's UA list;
    an empty ``Disallow:`` means 'allow all' and contributes no
    rule; malformed delays are ignored. Comments (#) and unknown
    directives are ignored; parsing never raises on hostile
    input."""
    groups: list[tuple[list[str], list[tuple[str, bool]], float | None]] = []
    uas: list[str] = []
    cur_rules: list[tuple[str, bool]] = []
    cur_delay: float | None = None
    group_open = False

    def close() -> None:
        nonlocal uas, cur_rules, cur_delay, group_open
        if uas:
            groups.append((uas, cur_rules, cur_delay))
        uas, cur_rules, cur_delay, group_open = [], [], None, False

    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if group_open:
                close()
            uas.append(value.lower())
        elif key in ("allow", "disallow"):
            group_open = True
            if value:
                cur_rules.append((value, key == "allow"))
        elif key == "crawl-delay":
            group_open = True
            try:
                d = float(value)
                if d >= 0:
                    cur_delay = d
            except ValueError:
                pass
    close()
    return groups


def _select_groups(groups, agent: str):
    """The groups that govern ``agent``: longest UA value that
    case-insensitively prefixes the product token wins, all groups
    carrying the winning value merge; ``*`` groups are the
    fallback."""
    agent_l = (agent or "*").lower()
    named = [
        (ua, g)
        for g in groups
        for ua in g[0]
        if ua != "*" and agent_l != "*" and agent_l.startswith(ua)
    ]
    if named:
        best = max(len(ua) for ua, _ in named)
        return [g for ua, g in named if len(ua) == best]
    return [g for g in groups if "*" in g[0]]


def robots_rules_for_agent(body: str, agent: str = "*") -> list[tuple[str, bool]]:
    """Parse one robots.txt body into the (path-pattern, allow)
    rules of the group that governs ``agent`` — the most specific
    matching ``User-agent`` value wins (longest value that is a
    case-insensitive prefix of the agent's product token, so a
    ``graftbot-news`` crawler obeys a ``graftbot`` group), ALL
    groups carrying the winning value merge, and ``*`` groups are
    the fallback when no named group matches. See ``_parse_groups``
    for the group grammar; parsing never raises on hostile input."""
    return [r for g in _select_groups(_parse_groups(body), agent) for r in g[1]]


def robots_crawl_delay_for_agent(body: str, agent: str = "*") -> float | None:
    """The ``Crawl-delay`` (seconds) governing ``agent`` — the SAME
    group selection as the rule parser (a named bot obeys ITS
    group's delay, not the ``*`` group's), the last declaration
    among the selected groups winning. None when the governing
    group declares no delay."""
    delay: float | None = None
    for g in _select_groups(_parse_groups(body), agent):
        if g[2] is not None:
            delay = g[2]
    return delay


def robots_rules_for_star(body: str) -> list[tuple[str, bool]]:
    """The ``User-agent: *`` group's rules (the pre-r11 surface,
    kept as the default-agent shorthand)."""
    return robots_rules_for_agent(body, "*")


def robots_crawl_delay_for_star(body: str) -> float | None:
    """The ``*`` group's Crawl-delay (the pre-r11 surface, kept as
    the default-agent shorthand)."""
    return robots_crawl_delay_for_agent(body, "*")


def parse_robots_delays(
    robots_df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_body",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_body) → (host, delay_s) for hosts whose group
    governing ``agent`` declares a ``Crawl-delay`` (others absent) —
    the same most-specific-UA selection as ``parse_robots_rules``,
    so a named bot schedules by ITS delay, not the ``*`` group's."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                d = robots_crawl_delay_for_agent(
                    body if isinstance(body, str) else "", agent
                )
                if d is not None:
                    rows.append((host, float(d)))
            yield pd.DataFrame(rows, columns=["host", "delay_s"])

    return robots_df.select(host_col, body_col).mapInPandas(
        run, "host string, delay_s double"
    )


def parse_robots_rules(
    robots_df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_body",
    agent: str = "*",
) -> DataFrame:
    """(host, robots_body) rows → the ``RULES_SCHEMA`` rule table
    for the group governing ``agent`` (most specific UA group wins,
    ``*`` fallback). Wildcard/anchor patterns carry their translated
    regex in ``rule_regex`` (NULL = literal prefix, the fast path).
    One Arrow-batched narrow stage; robots bodies are tiny (one per
    host) so this is never the hot path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for path, allow in robots_rules_for_agent(
                    body if isinstance(body, str) else "", agent
                ):
                    rows.append((host, path, allow, rule_pattern_to_regex(path)))
            yield pd.DataFrame(
                rows, columns=["host", "rule_path", "allow", "rule_regex"]
            )

    return robots_df.select(host_col, body_col).mapInPandas(run, RULES_SCHEMA)


def robots_decisions(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Attach the robots verdict to every frontier row: frontier
    columns + ``allowed`` boolean. Host and path-with-query come
    from the URL (REP matches patterns against the path INCLUDING
    the query string — ``Disallow: /*?sessionid`` must bite); rules
    join host-equi (broadcast by default — pass
    ``broadcast_rules=False`` for a crawl whose rule table outgrows
    a broadcast). A literal rule matches by prefix (JVM
    ``startswith``); a wildcard/anchor rule matches its translated
    ``rule_regex`` (JVM ``rlike`` — still no Python per URL). The
    per-URL decision is one max aggregate over
    ``struct(len(pattern), allow)`` — most specific rule wins,
    allow wins the tie, no match ⇒ allowed. One shuffle (the
    groupBy). Byte-identical duplicate frontier rows are preserved:
    each row is tagged with a per-partition unique id before the
    join so the regroup keys on the row, not its values (r10
    ADVICE)."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    pathq = F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    pathq = (
        F.when(F.length(pathq) == 0, F.lit("/"))
        .when(~pathq.startswith("/"), F.concat(F.lit("/"), pathq))
        .otherwise(pathq)
    )
    tagged = (
        frontier.withColumn("__rowid", F.monotonically_increasing_id())
        .withColumn("__host", host)
        .withColumn("__path", pathq)
    )
    r = rules.select(
        F.col("host").alias("__rhost"),
        F.col("rule_path").alias("__rpath"),
        F.col("allow").alias("__rallow"),
        F.col("rule_regex").alias("__rregex"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    rule_hits = (
        F.when(
            F.col("__rregex").isNotNull(),
            F.regexp_like(F.col("__path"), F.col("__rregex")),
        ).otherwise(F.col("__path").startswith(F.col("__rpath")))
    )
    joined = tagged.join(
        r,
        (F.col("__host") == F.col("__rhost")) & rule_hits,
        "left_outer",
    )
    decided = (
        joined.groupBy(F.col("__rowid"), *[F.col(c) for c in frontier.columns], "__host", "__path")
        .agg(
            F.max(
                F.struct(
                    F.length("__rpath").alias("l"), F.col("__rallow").alias("a")
                )
            ).alias("__best")
        )
        .withColumn(
            "allowed",
            F.when(F.col("__best").isNull(), F.lit(True)).otherwise(
                F.coalesce(F.col("__best.a"), F.lit(True))
            ),
        )
    )
    return decided.select(*frontier.columns, "allowed")


def politeness_waves(
    frontier: DataFrame,
    url_col: str = "url",
    per_host_per_wave: int = 10,
    delays: DataFrame | None = None,
    wave_seconds: float = 10.0,
    order_by: list | None = None,
) -> DataFrame:
    """Host-rate shaping: assign every frontier URL a fetch ``wave``
    so no host receives more than ``per_host_per_wave`` requests per
    wave — the scheduling half of politeness (robots_filter is the
    permission half; Crawl-delay generalizes to the wave width).
    wave = (rank of the URL within its host − 1) // cap, rank ordered
    by URL for determinism. A fetcher drains wave 0 across ALL hosts
    concurrently (maximum fleet parallelism), then wave 1, … —
    host-level backpressure without a serial per-host queue. One
    window over the host partition; rank state is O(1) and
    spillable, so a single dominant host degrades to one long — but
    never out-of-memory — task.

    ``delays`` (from ``parse_robots_delays``) makes the cap
    Crawl-delay-aware: if a wave takes ``wave_seconds`` of wall
    clock, a host demanding ``delay_s`` between requests may receive
    at most ``max(1, wave_seconds // delay_s)`` requests per wave;
    hosts without a declared delay keep ``per_host_per_wave``. The
    delays table is per-host (tiny) and broadcasts.

    ``order_by`` (r11): the within-host ordering that fills waves —
    default ``[url]`` (determinism); pass e.g.
    ``[F.col("rank_micros").desc(), F.col("url")]`` so a
    PageRank-prioritized queue drains highest-centrality URLs in the
    earliest waves instead of alphabetically."""
    from pyspark.sql import Window

    host = F.lower(
        F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    tagged = frontier.withColumn("__host", host)
    if delays is not None:
        d = delays.select(F.col("host").alias("__host"), "delay_s")
        tagged = tagged.join(F.broadcast(d), "__host", "left_outer").withColumn(
            "__cap",
            F.when(
                F.col("delay_s").isNotNull() & (F.col("delay_s") > 0),
                F.greatest(
                    F.lit(1), F.floor(F.lit(wave_seconds) / F.col("delay_s"))
                ),
            )
            .otherwise(F.lit(per_host_per_wave))
            .cast("int"),
        ).drop("delay_s")
    else:
        tagged = tagged.withColumn("__cap", F.lit(per_host_per_wave))
    w = Window.partitionBy("__host").orderBy(
        *(order_by if order_by is not None else [F.col(url_col)])
    )
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .withColumn("wave", F.expr("CAST((__rn - 1) div __cap AS INT)"))
        .drop("__host", "__rn", "__cap")
    )


def robots_filter(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Frontier rows whose URL the ``*`` group permits — the gate to
    run between `snapshot_diff`'s added/changed output and the
    re-fetch stage."""
    return robots_decisions(frontier, rules, url_col, broadcast_rules).filter(
        F.col("allowed")
    ).drop("allowed")
