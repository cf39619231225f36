"""robots.txt politeness gate for the crawl frontier.

Reference anchor: the reference's website pipeline crawls live URLs
(website-ingestion-pipeline.py, the crawl step P:166-191) with no
robots gate — acceptable for its own docs site, not for a general
crawler. Any real user re-fetching `snapshot_diff`'s added/changed
set must filter through the target hosts' robots.txt first; this
module is that gate, engine-side.

Semantics (documented, oracle-able): the Google REP prefix model,
simplified — rules are (path-prefix, allow/disallow) taken from the
``User-agent: *`` group(s); a rule matches a URL when the URL's path
starts with the rule's path; the LONGEST matching rule decides, an
allow wins a length tie, and a URL matching no rule is allowed.
NOT implemented (documented limits): ``*`` wildcards and ``$``
anchors inside rule paths (both rare; a matching rule containing
``*`` is kept as a literal prefix), per-bot user-agent groups
(we always take ``*``), and Crawl-delay scheduling (a rate concern
for the fetcher, not a filter concern).

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

#: parsed-rule schema: one row per (host, prefix, allow)
RULES_SCHEMA = "host string, rule_path string, allow boolean"


def robots_rules_for_star(body: str) -> list[tuple[str, bool]]:
    """Parse one robots.txt body into the ``User-agent: *`` group's
    (path-prefix, allow) rules. Group logic per REP: consecutive
    User-agent lines open a group; the first Allow/Disallow closes
    the group's UA list; an empty ``Disallow:`` means 'allow all'
    and contributes no rule. Comments (#) and unknown directives
    are ignored; parsing never raises on hostile input."""
    rules: list[tuple[str, bool]] = []
    uas: list[str] = []
    group_has_rules = False
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if group_has_rules:
                uas = []
                group_has_rules = False
            uas.append(value.lower())
        elif key in ("allow", "disallow"):
            group_has_rules = True
            if "*" in uas and value:
                rules.append((value, key == "allow"))
    return rules


def robots_crawl_delay_for_star(body: str) -> float | None:
    """The ``Crawl-delay`` (seconds) of the ``User-agent: *`` group,
    or None. Same group logic as the rule parser; a malformed number
    is ignored (never raises)."""
    uas: list[str] = []
    group_has_rules = False
    delay: float | None = None
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if group_has_rules:
                uas = []
                group_has_rules = False
            uas.append(value.lower())
        elif key in ("allow", "disallow", "crawl-delay"):
            group_has_rules = True
            if key == "crawl-delay" and "*" in uas:
                try:
                    d = float(value)
                    if d >= 0:
                        delay = d
                except ValueError:
                    pass
    return delay


def parse_robots_delays(
    robots_df: DataFrame, host_col: str = "host", body_col: str = "robots_body"
) -> DataFrame:
    """(host, robots_body) → (host, delay_s) for hosts that declare a
    ``Crawl-delay`` in their ``*`` group (others absent)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                d = robots_crawl_delay_for_star(
                    body if isinstance(body, str) else ""
                )
                if d is not None:
                    rows.append((host, float(d)))
            yield pd.DataFrame(rows, columns=["host", "delay_s"])

    return robots_df.select(host_col, body_col).mapInPandas(
        run, "host string, delay_s double"
    )


def parse_robots_rules(
    robots_df: DataFrame, host_col: str = "host", body_col: str = "robots_body"
) -> DataFrame:
    """(host, robots_body) rows → the ``RULES_SCHEMA`` rule table.
    One Arrow-batched narrow stage; robots bodies are tiny (one per
    host) so this is never the hot path."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[body_col]):
                for path, allow in robots_rules_for_star(
                    body if isinstance(body, str) else ""
                ):
                    rows.append((host, path, allow))
            yield pd.DataFrame(rows, columns=["host", "rule_path", "allow"])

    return robots_df.select(host_col, body_col).mapInPandas(run, RULES_SCHEMA)


def robots_decisions(
    frontier: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """Attach the robots verdict to every frontier row: frontier
    columns + ``allowed`` boolean. Host and path come from the URL;
    rules join host-equi (broadcast by default — pass
    ``broadcast_rules=False`` for a crawl whose rule table outgrows
    a broadcast), a matching rule requires the path to start with the
    rule's prefix, and the per-URL decision is one max aggregate over
    ``struct(len(prefix), allow)`` — longest rule wins, allow wins
    the tie, no match ⇒ allowed. No Python per URL; one shuffle
    (the groupBy). Byte-identical duplicate frontier rows are
    preserved: each row is tagged with a per-partition unique id
    before the join so the regroup keys on the row, not its values
    (r10 ADVICE)."""
    host = F.lower(F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    path = F.regexp_extract(F.col(url_col), r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(F.length(path) > 0, path).otherwise(F.lit("/"))
    tagged = (
        frontier.withColumn("__rowid", F.monotonically_increasing_id())
        .withColumn("__host", host)
        .withColumn("__path", path)
    )
    r = rules.select(
        F.col("host").alias("__rhost"),
        F.col("rule_path").alias("__rpath"),
        F.col("allow").alias("__rallow"),
    )
    if broadcast_rules:
        r = F.broadcast(r)
    joined = tagged.join(
        r,
        (F.col("__host") == F.col("__rhost"))
        & F.col("__path").startswith(F.col("__rpath")),
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
    delays table is per-host (tiny) and broadcasts."""
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
    w = Window.partitionBy("__host").orderBy(F.col(url_col))
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
