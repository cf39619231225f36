"""robots.txt gate: parser group logic, longest-prefix decision
semantics, and the broadcast-join plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_ingestion_spark.functions.robots import (
    parse_robots_rules,
    robots_decisions,
    robots_filter,
    robots_rules_for_star,
)


def test_rules_parser_groups_and_noise():
    body = (
        "# header comment\n"
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: other\n"
        "User-agent: *\n"          # consecutive UA lines share a group
        "Disallow: /a/  # inline comment\n"
        "Allow: /a/b\n"
        "Crawl-delay: 10\n"        # unknown-to-us directive ignored
        "\n"
        "User-agent: last\n"
        "Disallow: /only-last/\n"
    )
    assert robots_rules_for_star(body) == [("/a/", False), ("/a/b", True)]


def test_rules_parser_star_only_and_empty_disallow():
    # empty Disallow: == allow all -> no rule rows
    assert robots_rules_for_star("User-agent: *\nDisallow:\n") == []
    # no * group at all
    assert robots_rules_for_star("User-agent: bot\nDisallow: /\n") == []
    # hostile input never raises
    assert robots_rules_for_star("") == []
    assert robots_rules_for_star(None) == []
    assert robots_rules_for_star("no colons here\n\x00\xff") == []
    # a second * group later in the file also contributes
    two = "User-agent: *\nDisallow: /x/\n\nUser-agent: *\nDisallow: /y/\n"
    assert robots_rules_for_star(two) == [("/x/", False), ("/y/", False)]


def test_decisions_longest_prefix_allow_ties_and_default(spark):
    robots = spark.createDataFrame(
        [
            ("a.com", "User-agent: *\nDisallow: /p/\nAllow: /p/pub/\n"),
            ("b.com", "User-agent: *\nDisallow: /t\nAllow: /t\n"),  # tie: allow wins
            ("c.com", "User-agent: *\nDisallow:\n"),
        ],
        "host string, robots_body string",
    )
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [
            (0, "https://a.com/p/pub/x"),   # deeper allow beats /p/
            (1, "https://a.com/p/x"),       # disallowed
            (2, "https://a.com/q"),         # no matching rule
            (3, "https://b.com/tail"),      # tie at len 2 -> allow
            (4, "https://c.com/anything"),  # host with zero rules
            (5, "https://d.com/x"),         # host with no robots at all
            (6, "https://A.COM/p/x"),       # host matching is case-insensitive
            (7, "https://a.com"),           # empty path treated as '/'
        ],
        "id long, url string",
    )
    got = {r.id: r.allowed for r in robots_decisions(frontier, rules).collect()}
    assert got == {0: True, 1: False, 2: True, 3: True, 4: True, 5: True, 6: False, 7: True}
    kept = {r.id for r in robots_filter(frontier, rules).collect()}
    assert kept == {0, 2, 3, 4, 5, 7}


def test_decisions_preserve_duplicate_frontier_rows(spark):
    """r10 ADVICE: byte-identical duplicate frontier rows were
    collapsed by the value-keyed regroup; the __rowid tag keys the
    regroup on the physical row, so every input row gets its verdict."""
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p/\n")],
        "host string, robots_body string",
    )
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [(1, "https://a.com/p/x")] * 3 + [(2, "https://a.com/q")],
        "id long, url string",
    )
    out = robots_decisions(frontier, rules).collect()
    assert len(out) == 4  # duplicates preserved
    assert sorted((r.id, r.allowed) for r in out) == [
        (1, False), (1, False), (1, False), (2, True)
    ]
    assert [c for c in robots_decisions(frontier, rules).columns] == ["id", "url", "allowed"]


def test_decisions_plan_broadcasts_rules(spark):
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /p/\n")],
        "host string, robots_body string",
    )
    frontier = spark.createDataFrame([(1, "https://a.com/p/x")], "id long, url string")
    plan = (
        robots_decisions(frontier, parse_robots_rules(robots))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_politeness_waves_cap_and_determinism(spark):
    from data_ingestion_spark.functions.robots import politeness_waves

    rows = [(i, f"https://h{i % 3}.ex.com/p{i:03d}") for i in range(70)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = politeness_waves(df, per_host_per_wave=5).collect()
    # cap: no (host, wave) bucket exceeds 5 urls
    buckets = {}
    for r in out:
        host = r.url.split("/")[2]
        buckets.setdefault((host, r.wave), []).append(r.url)
    assert all(len(v) <= 5 for v in buckets.values())
    # waves are dense from 0 per host
    for h in ["h0.ex.com", "h1.ex.com", "h2.ex.com"]:
        waves = sorted({w for (hh, w) in buckets if hh == h})
        assert waves == list(range(len(waves))) and waves[0] == 0
    # deterministic: same input -> same assignment
    again = politeness_waves(df, per_host_per_wave=5).collect()
    assert {r.id: r.wave for r in out} == {r.id: r.wave for r in again}


def test_crawl_delay_parse_and_wave_cap(spark):
    from data_ingestion_spark.functions.robots import (
        parse_robots_delays,
        politeness_waves,
        robots_crawl_delay_for_star,
    )

    # parser: * group only, bot-group delay ignored, malformed ignored
    assert robots_crawl_delay_for_star("User-agent: *\nCrawl-delay: 2.5\n") == 2.5
    assert robots_crawl_delay_for_star("User-agent: bot\nCrawl-delay: 9\n") is None
    assert robots_crawl_delay_for_star("User-agent: *\nCrawl-delay: nope\n") is None
    assert robots_crawl_delay_for_star("User-agent: *\nDisallow: /x\n") is None

    robots = spark.createDataFrame(
        [
            ("slow.com", "User-agent: *\nCrawl-delay: 5\nDisallow:\n"),
            ("fast.com", "User-agent: *\nDisallow:\n"),
        ],
        "host string, robots_body string",
    )
    delays = parse_robots_delays(robots)
    assert {r.host: r.delay_s for r in delays.collect()} == {"slow.com": 5.0}
    rows = [(i, f"https://{'slow' if i % 2 else 'fast'}.com/p{i:03d}") for i in range(40)]
    df = spark.createDataFrame(rows, "id long, url string")
    out = politeness_waves(df, per_host_per_wave=10, delays=delays, wave_seconds=10.0)
    buckets = {}
    for r in out.collect():
        host = r.url.split("/")[2]
        buckets.setdefault((host, r.wave), 0)
        buckets[(host, r.wave)] += 1
    # slow.com: cap floor(10/5)=2 per wave; fast.com keeps 10
    assert all(n <= 2 for (h, _), n in buckets.items() if h == "slow.com")
    assert max(n for (h, _), n in buckets.items() if h == "slow.com") == 2
    assert all(n <= 10 for (h, _), n in buckets.items() if h == "fast.com")
    assert max(n for (h, _), n in buckets.items() if h == "fast.com") == 10


def test_agent_group_selection_most_specific_wins():
    """RFC 9309 / Google REP group selection: longest UA value that
    case-insensitively prefixes the crawler token wins; all groups
    with the winning value merge; * is the fallback."""
    from data_ingestion_spark.functions.robots import robots_rules_for_agent

    body = (
        "User-agent: graftbot\nDisallow: /a\n\n"
        "User-agent: graftbot-news\nDisallow: /b\n\n"
        "User-agent: graftbot-news\nAllow: /b/ok\n\n"
        "User-agent: *\nDisallow: /\n"
    )
    # exact token: most specific group(s) merge, both same-value groups
    assert robots_rules_for_agent(body, "graftbot-news") == [
        ("/b", False), ("/b/ok", True)
    ]
    # prefix semantics: 'graftbot-video' falls to the 'graftbot' group
    assert robots_rules_for_agent(body, "graftbot-video") == [("/a", False)]
    # case-insensitive
    assert robots_rules_for_agent(body, "GraftBot-NEWS") == [
        ("/b", False), ("/b/ok", True)
    ]
    # unknown bot: * fallback
    assert robots_rules_for_agent(body, "otherbot") == [("/", False)]
    # star never matches named groups
    assert robots_rules_for_agent(body, "*") == [("/", False)]


def test_rule_pattern_to_regex_translation():
    """Wildcards/anchors translate per Google REP; plain literals
    return None (the startswith fast path AND the pinned fallback
    semantics for rules regex can't express)."""
    from data_ingestion_spark.functions.robots import rule_pattern_to_regex

    assert rule_pattern_to_regex("/plain/prefix") is None
    assert rule_pattern_to_regex("/*?sessionid=") == r"^/.*\?sessionid="
    assert rule_pattern_to_regex("/ok$") == "^/ok$"
    # $ not at the end is a literal character, not an anchor
    assert rule_pattern_to_regex("/a$b") is None
    assert rule_pattern_to_regex("/a$b*") == r"^/a\$b.*"
    # regex metacharacters in the path are escaped
    assert rule_pattern_to_regex("/p.(x)+*") == r"^/p\.\(x\)\+.*"


def test_decisions_wildcard_anchor_and_query_matching(spark):
    """Full-REP decisions: the wildcard bites the query string (REP
    matches path INCLUDING query), the end anchor matches exactly,
    a longer anchored allow outranks a shorter literal disallow,
    and a bare-host-with-query URL normalizes to '/?...'."""
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /*?sessionid=\nAllow: /ok$\nDisallow: /o\n")],
        "host string, robots_body string",
    )
    rules = parse_robots_rules(robots)
    frontier = spark.createDataFrame(
        [
            (0, "https://a.com/page?sessionid=abc"),  # wildcard bites query
            (1, "https://a.com/ok"),                  # anchor exact: /ok$ beats /o
            (2, "https://a.com/okay"),                # anchor no-match; literal /o bites
            (3, "https://a.com/page?x=1"),            # no rule matches
            (4, "https://a.com?sessionid=1"),         # '/?sessionid=1' — wildcard bites
        ],
        "id long, url string",
    )
    got = {r.id: r.allowed for r in robots_decisions(frontier, rules).collect()}
    assert got == {0: False, 1: True, 2: False, 3: True, 4: False}
    # the plan stays JVM-side: regexp_like / startswith, no Python in
    # the per-URL path (the parse stage is the only Arrow stage)
    plan = robots_decisions(frontier, rules)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan


def test_parse_rules_emits_regex_column_per_agent(spark):
    """parse_robots_rules carries the translated regex (NULL for
    literals) and selects the agent's group."""
    robots = spark.createDataFrame(
        [("a.com", "User-agent: graftbot\nDisallow: /t/*x$\n\nUser-agent: *\nDisallow: /\n")],
        "host string, robots_body string",
    )
    rows = parse_robots_rules(robots, agent="graftbot").collect()
    assert [(r.rule_path, r.allow, r.rule_regex) for r in rows] == [
        ("/t/*x$", False, r"^/t/.*x$")
    ]
    star = parse_robots_rules(robots).collect()
    assert [(r.rule_path, r.rule_regex) for r in star] == [("/", None)]


def test_crawl_delay_agent_group_selection(spark):
    """Crawl-delay follows the SAME group selection as rules (r11):
    a named bot obeys its own group's delay, falls back to *, and
    the harsher * delay never leaks into a governed bot."""
    from data_ingestion_spark.functions.robots import (
        parse_robots_delays,
        robots_crawl_delay_for_agent,
    )

    body = (
        "User-agent: graftbot\nCrawl-delay: 1\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 30\nDisallow:\n"
    )
    assert robots_crawl_delay_for_agent(body, "graftbot") == 1.0
    assert robots_crawl_delay_for_agent(body, "graftbot-news") == 1.0
    assert robots_crawl_delay_for_agent(body, "otherbot") == 30.0
    assert robots_crawl_delay_for_agent(body, "*") == 30.0
    # governed group with NO delay: None, not the * fallback (the
    # named group fully replaces *)
    body2 = "User-agent: graftbot\nDisallow: /x\n\nUser-agent: *\nCrawl-delay: 9\n"
    assert robots_crawl_delay_for_agent(body2, "graftbot") is None

    robots = spark.createDataFrame(
        [("a.com", body), ("b.com", body2)], "host string, robots_body string"
    )
    assert {r.host: r.delay_s for r in parse_robots_delays(robots, agent="graftbot").collect()} == {"a.com": 1.0}
    assert {r.host: r.delay_s for r in parse_robots_delays(robots).collect()} == {"a.com": 30.0, "b.com": 9.0}
