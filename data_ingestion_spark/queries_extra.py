"""Additional oracle-checked coverage: native session windows, exact
percentiles, corpus-statistics quality scoring, null semantics,
positional explode, and a string-function battery.

Same parity rules as queries.py (aliases, casts, rounding)."""

from __future__ import annotations

from pyspark.sql import functions as F

from .queries import _d, _t, q


def _materialized(df, handles):
    """Materialize a persisted-fixture query's (small) result and
    release the big intermediate caches (r14 ADVICE: the graph DQs'
    MEMORY_AND_DISK persists outlived the query and compounded across
    the suite). ``localCheckpoint(eager=True)`` computes the result
    while the caches are hot and pins only result-sized blocks; the
    handles then unpersist immediately instead of at session end."""
    out = df.localCheckpoint(eager=True)
    for h in handles:
        h.unpersist()
    return out


@q(
    "session_window_native",
    "WITH g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
    "OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, ts, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM g) "
    "SELECT user_id, min(ts) AS session_start, CAST(count(*) AS BIGINT) AS n_events "
    "FROM s GROUP BY user_id, sid",
)
def session_window_native(spark, sf_dir):
    """ST4 in batch: Spark's native ``session_window`` (30-min gap)
    checked against a first-principles lag+cumsum oracle. Window END
    differs by definition (Spark pads the gap), so the comparison key
    is (user, session_start, n_events)."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )
    return out


@q(
    "agg_percentiles",
    "SELECT l_returnflag, "
    "round(median(l_extendedprice), 4) AS med_price, "
    "round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price, "
    "round(quantile_cont(l_quantity, 0.5), 4) AS med_qty "
    "FROM lineitem GROUP BY l_returnflag",
)
def agg_percentiles(spark, sf_dir):
    """A4 extension: exact median / interpolated percentiles (both
    engines compute exact order statistics — deterministic, unlike the
    approx sketch variants)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.median("l_extendedprice"), 4).alias("med_price"),
        F.round(F.percentile("l_extendedprice", F.lit(0.9)), 4).alias("p90_price"),
        F.round(F.percentile("l_quantity", F.lit(0.5)), 4).alias("med_qty"),
    )


@q(
    "quality_unigram_logprob",
    "WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents), "
    "freq AS (SELECT word, count(*) AS c FROM w GROUP BY word), "
    "tot AS (SELECT sum(c) AS t FROM freq) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words, "
    "round(avg(ln(freq.c / tot.t)), 6) AS avg_logprob "
    "FROM w JOIN freq USING (word) CROSS JOIN tot GROUP BY doc_id",
)
def quality_unigram_logprob(spark, sf_dir):
    """Text-analysis: corpus-statistics quality score — average
    unigram log-probability per document (the classic cheap fluency
    proxy).

    Shuffle diet (r08): the original computed the freq table in TWO
    broadcast subtrees (once for ``freq``, once inside the scalar
    ``tot = freq.agg(sum)``), each re-scanning and RE-EXPLODING
    ``documents``. The corpus total doesn't need the freq table at
    all — it's ``sum(size(split(text)))``, a scan with no explode —
    so it becomes a cheap 1-row broadcast crossJoined onto the freq
    table before the single word-level broadcast. Per-word
    ``log(c/t)`` stays the exact expression the oracle evaluates
    (same integer inputs, same double division), so float parity is
    bit-identical. At 100 TB the freq table of a natural-language
    corpus is ~millions of rows — still broadcastable after a
    min-count floor."""
    d = _d(spark, sf_dir)
    w = d.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))
    freq = w.groupBy("word").agg(F.count(F.lit(1)).alias("c"))
    tot = d.select(F.sum(F.size(F.split(F.col("text"), " "))).alias("t"))
    freq_lp = freq.crossJoin(F.broadcast(tot)).select(
        "word", F.log(F.col("c") / F.col("t")).alias("lp")
    )
    return (
        w.join(F.broadcast(freq_lp), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.round(F.avg("lp"), 6).alias("avg_logprob"),
        )
    )


@q(
    "null_semantics",
    "SELECT c.c_custkey, "
    "coalesce(CAST(o.o_orderkey AS BIGINT), -1) AS order_or_default, "
    "CAST(o.o_orderkey IS NOT DISTINCT FROM NULL AS INTEGER) AS is_unmatched, "
    "nullif(c.c_mktsegment, 'MACHINERY') AS seg_nullified "
    "FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey "
    "AND o.o_totalprice > 400000",
)
def null_semantics(spark, sf_dir):
    """Null-handling battery over outer-join nulls: coalesce default,
    null-safe equality (<=> ↔ IS NOT DISTINCT FROM), nullif."""
    c = _t(spark, sf_dir, "customer").alias("c")
    o = _t(spark, sf_dir, "orders").alias("o")
    j = c.join(
        o,
        (F.col("o.o_custkey") == F.col("c.c_custkey"))
        & (F.col("o.o_totalprice") > 400000),
        "left",
    )
    return j.select(
        F.col("c.c_custkey"),
        F.coalesce(F.col("o.o_orderkey"), F.lit(-1).cast("bigint")).alias(
            "order_or_default"
        ),
        F.col("o.o_orderkey").eqNullSafe(F.lit(None).cast("bigint")).cast("int").alias(
            "is_unmatched"
        ),
        F.nullif(F.col("c.c_mktsegment"), F.lit("MACHINERY")).alias("seg_nullified"),
    )


@q(
    "array_posexplode",
    "SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS pos, d.words[t.i] AS word FROM ("
    "SELECT doc_id, string_split(text, ' ') AS words FROM documents) d, "
    "unnest(generate_series(1, len(d.words))) AS t(i) WHERE length(d.words[t.i]) > 5",
)
def array_posexplode(spark, sf_dir):
    """X9 extension: positional explode (token index survives the
    flatten — needed for positional n-grams / winnowing offsets)."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "word"))
        .filter(F.length("word") > 5)
        .select("doc_id", F.col("pos").cast("int").alias("pos"), "word")
    )


@q(
    "string_funcs_battery",
    "SELECT doc_id, upper(lang) AS lang_up, lpad(CAST(doc_id AS VARCHAR), 8, '0') AS id_pad, "
    "split_part(source, 'c', 1) AS src_head, reverse(lang) AS lang_rev, "
    "repeat('-', 5) AS rule, trim(' x ' ) AS trimmed, "
    "CAST(strpos(text, 'spark') AS INTEGER) AS spark_pos, "
    "left(text, 10) AS head10, right(text, 10) AS tail10 "
    "FROM documents",
)
def string_funcs_battery(spark, sf_dir):
    """X-battery: the common scalar string zoo in one checked query."""
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.upper("lang").alias("lang_up"),
        F.lpad(F.col("doc_id").cast("string"), 8, "0").alias("id_pad"),
        F.split_part(F.col("source"), F.lit("c"), F.lit(1)).alias("src_head"),
        F.reverse(F.col("lang")).alias("lang_rev"),
        F.repeat(F.lit("-"), 5).alias("rule"),
        F.trim(F.lit(" x ")).alias("trimmed"),
        F.instr(F.col("text"), "spark").cast("int").alias("spark_pos"),
        F.substring(F.col("text"), 1, 10).alias("head10"),
        F.col("text").substr(F.length("text") - 9, F.lit(10)).alias("tail10"),
    )


@q(
    "split_markdown_sections",
    "WITH md AS (SELECT doc_id, '# T ' || source || chr(10) || substr(text, 1, 80) || chr(10) "
    "|| '## A' || chr(10) || substr(text, 81, 80) || chr(10) || '### A1' || chr(10) "
    "|| substr(text, 161, 80) || chr(10) || '#### A1a' || chr(10) || substr(text, 321, 80) "
    "|| chr(10) || '## B' || chr(10) || substr(text, 241, 80) "
    "AS md_text FROM documents), "
    "l AS (SELECT doc_id, i - 1 AS ln, lines[i] AS line, "
    "CASE WHEN starts_with(lines[i], '#### ') THEN 4 "
    "WHEN starts_with(lines[i], '### ') THEN 3 WHEN starts_with(lines[i], '## ') THEN 2 "
    "WHEN starts_with(lines[i], '# ') THEN 1 ELSE 0 END AS lvl "
    "FROM (SELECT doc_id, string_split(md_text, chr(10)) AS lines FROM md) t, "
    "unnest(generate_series(1, len(lines))) AS u(i)), "
    "s AS (SELECT *, sum(CASE WHEN lvl > 0 THEN 1 ELSE 0 END) OVER wp AS section_id, "
    "sum(CASE WHEN lvl = 1 THEN 1 ELSE 0 END) OVER wp AS h1_id, "
    "sum(CASE WHEN lvl = 2 THEN 1 ELSE 0 END) OVER wp AS h2_id, "
    "sum(CASE WHEN lvl = 3 THEN 1 ELSE 0 END) OVER wp AS h3_id, "
    "last_value(CASE WHEN lvl = 1 THEN substr(line, 3) END IGNORE NULLS) OVER wp AS h1 "
    "FROM l WINDOW wp AS (PARTITION BY doc_id ORDER BY ln ROWS UNBOUNDED PRECEDING)), "
    "s2 AS (SELECT *, last_value(CASE WHEN lvl = 2 THEN substr(line, 4) END IGNORE NULLS) "
    "OVER (PARTITION BY doc_id, h1_id ORDER BY ln ROWS UNBOUNDED PRECEDING) AS h2 FROM s), "
    "s3 AS (SELECT *, last_value(CASE WHEN lvl = 3 THEN substr(line, 5) END IGNORE NULLS) "
    "OVER (PARTITION BY doc_id, h1_id, h2_id ORDER BY ln ROWS UNBOUNDED PRECEDING) AS h3 FROM s2), "
    "s4 AS (SELECT *, last_value(CASE WHEN lvl = 4 THEN substr(line, 6) END IGNORE NULLS) "
    "OVER (PARTITION BY doc_id, h1_id, h2_id, h3_id ORDER BY ln ROWS UNBOUNDED PRECEDING) AS h4 FROM s3) "
    "SELECT doc_id, CAST(section_id AS BIGINT) AS section_id, h1, h2, h3, h4, "
    "string_agg(line, chr(10) ORDER BY ln) AS section_text "
    "FROM s4 WHERE lvl = 0 AND length(trim(line)) > 0 "
    "GROUP BY doc_id, section_id, h1, h2, h3, h4",
)
def split_markdown_sections(spark, sf_dir):
    """T3 full form: header-aware split with Header1..4 metadata and
    shallower-header resets (ingestion-pipeline.py:204-216; the
    website pipeline's splitter goes to #### —
    website-ingestion-pipeline.py:147-152), pure SQL on both engines.
    Markdown assembled from each doc (the synthetic corpus has no
    headers of its own); the H4 section draws from a distinct text
    span so its body is non-empty for long docs and empty (hence
    absent, both engines) for short ones."""
    from .functions.textops import split_markdown_sections as split_md

    d = _d(spark, sf_dir)
    md = d.select(
        "doc_id",
        F.concat(
            F.lit("# T "), F.col("source"), F.lit("\n"),
            F.substring("text", 1, 80), F.lit("\n"),
            F.lit("## A"), F.lit("\n"), F.substring("text", 81, 80), F.lit("\n"),
            F.lit("### A1"), F.lit("\n"), F.substring("text", 161, 80), F.lit("\n"),
            F.lit("#### A1a"), F.lit("\n"), F.substring("text", 321, 80), F.lit("\n"),
            F.lit("## B"), F.lit("\n"), F.substring("text", 241, 80),
        ).alias("md_text"),
    )
    out = split_md(md, "md_text")
    return out.select(
        "doc_id", F.col("section_id").cast("bigint").alias("section_id"),
        "h1", "h2", "h3", "h4", "section_text",
    )


def _drain_streaming_dq(spark, staging, ckpt, start_query):
    """Shared drain/cleanup for the streaming DQs: start the
    AvailableNow query, require it to actually terminate within the
    timeout (a timed-out drain would silently return a partially
    filled memory sink), and clean up the staging/checkpoint dirs
    even when the drain fails."""
    import shutil

    try:
        q_handle = start_query()
        try:
            if not q_handle.awaitTermination(300):
                raise TimeoutError(
                    "AvailableNow drain did not finish within 300s"
                )
        finally:
            q_handle.stop()
        return spark.table(q_handle.name)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


@q(
    "streaming_tumbling_availablenow",
    "WITH b AS (SELECT date_trunc('hour', ts) AS hour_ts, event_type, "
    "CAST(count(*) AS BIGINT) AS n, round(sum(value), 4) AS sum_value "
    "FROM events GROUP BY 1, 2) "
    "SELECT CAST(count(*) AS BIGINT) AS n_stream_rows, "
    "CAST(count(*) AS BIGINT) AS n_batch_rows, "
    "CAST(0 AS BIGINT) AS sym_diff FROM b",
)
def streaming_tumbling_availablenow(spark, sf_dir):
    """ST1+ST2 executed for real, now VALUE-checked (was rows-only
    through r08): stage the events table as a file-stream input, drain
    it with Trigger.AvailableNow through a watermarked tumbling-window
    aggregation into a memory sink, then emit a one-row summary —
    (stream row count, batch-twin row count, exceptAll symmetric-diff
    count). The oracle computes the batch aggregation's cardinality in
    DuckDB for BOTH counts and pins sym_diff to 0, so a stream result
    that dropped a window, duplicated a row, or mis-summed a value
    flips the hash. (The raw stream rows can't be oracled directly
    only because the drain is a side-effecting run, not a SQL
    expression — the VALUES are fully compared via the diff against
    the oracled batch twin.)"""
    import tempfile
    import uuid

    from .queries import window_tumbling_batch
    from .sources.catalog import load_table
    from .streaming.pipeline import (
        run_query_availablenow,
        stream_events_from_dir,
        tumbling_counts,
    )

    staging = tempfile.mkdtemp(prefix="dq_stream_in_")
    ckpt = tempfile.mkdtemp(prefix="dq_stream_ckpt_")
    load_table(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").parquet(staging)
    sink = f"dq_stream_sink_{uuid.uuid4().hex[:8]}"
    s = _drain_streaming_dq(
        spark, staging, ckpt,
        lambda: run_query_availablenow(
            tumbling_counts(stream_events_from_dir(spark, staging)), ckpt, sink
        ),
    )
    # window.start is LTZ (watermarks need it); session tz is pinned
    # UTC so the cast back to NTZ is the identity on the values
    s = s.select(
        F.col("hour_ts").cast("timestamp_ntz").alias("hour_ts"),
        "event_type", "n", "sum_value",
    )
    b = window_tumbling_batch(spark, sf_dir)
    sym = s.exceptAll(b).unionAll(b.exceptAll(s))
    return (
        s.agg(F.count(F.lit(1)).alias("n_stream_rows"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_batch_rows")))
        .crossJoin(sym.agg(F.count(F.lit(1)).alias("sym_diff")))
    )


@q("streaming_stateful_first_seen", "SELECT DISTINCT user_id FROM events")
def streaming_stateful_first_seen(spark, sf_dir):
    """§2.11 custom stateful streaming operator, executed for real —
    and the one streaming DQ with a FULL value-hash oracle: the
    applyInPandasWithState first-seen gate emits each user_id exactly
    once across micro-batches (4 staged files, 2 per trigger, so
    cross-batch state is genuinely exercised), making the drained
    output equal to SELECT DISTINCT user_id regardless of batching.
    Mirrors the reference's skip-if-exists idempotence ledger
    (website-ingestion-pipeline.py:116-118) as explicit typed
    per-key state."""
    import tempfile
    import uuid

    from .sources.catalog import load_table
    from .streaming.pipeline import (
        run_query_availablenow,
        stateful_first_seen,
        stream_events_from_dir,
    )

    staging = tempfile.mkdtemp(prefix="dq_state_in_")
    ckpt = tempfile.mkdtemp(prefix="dq_state_ckpt_")
    load_table(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").parquet(staging)
    sink = f"dq_state_sink_{uuid.uuid4().hex[:8]}"
    return _drain_streaming_dq(
        spark, staging, ckpt,
        lambda: run_query_availablenow(
            stateful_first_seen(
                stream_events_from_dir(spark, staging, max_files_per_trigger=2)
            ),
            ckpt,
            sink,
            output_mode="append",
        ),
    )


@q(
    "streaming_session_availablenow",
    "WITH g AS (SELECT user_id, ts, CASE WHEN lag(ts) OVER w IS NULL "
    "OR epoch(ts) - epoch(lag(ts) OVER w) > 1800 THEN 1 ELSE 0 END AS is_new "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)), "
    "s AS (SELECT user_id, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts "
    "ROWS UNBOUNDED PRECEDING) AS sid FROM g), "
    "b AS (SELECT user_id, CAST(max(sid) AS BIGINT) AS ns FROM s GROUP BY user_id) "
    # coalesce: on an EMPTY events table sum() is NULL but the Spark
    # side's counts are 0 — the empty-partition contract (r09
    # self-review; same fix class as agg_approx_distinct)
    "SELECT CAST(coalesce(sum(ns), 0) AS BIGINT) AS n_stream_rows, "
    "CAST(coalesce(sum(ns), 0) AS BIGINT) AS n_batch_rows, "
    "CAST(0 AS BIGINT) AS sym_diff FROM b",
)
def streaming_session_availablenow(spark, sf_dir):
    """ST4 executed for real, now VALUE-checked (was rows-only through
    r08): the STATEFUL session-window path under the driver —
    file-stream the events table, drain with Trigger.AvailableNow
    through a watermarked session_window aggregation (dynamic-length
    windows closed by a 30-min gap per user), then emit the one-row
    (stream session count, batch-twin session count, per-session
    exceptAll symmetric diff). The batch side is the INDEPENDENT
    first-principles lag+cumsum sessionize (operators/relational.py)
    with boundaries reconstructed as [min(ts), max(ts)+gap) — exactly
    session_window's definition — so sym_diff==0 certifies the full
    (user, start, end, n_events) session set, and the oracle computes
    the total session count in DuckDB for both count columns."""
    import tempfile
    import uuid

    from .operators import relational as R
    from .sources.catalog import load_table
    from .streaming.pipeline import (
        run_query_availablenow,
        session_counts,
        stream_events_from_dir,
    )

    staging = tempfile.mkdtemp(prefix="dq_sess_in_")
    ckpt = tempfile.mkdtemp(prefix="dq_sess_ckpt_")
    load_table(spark, sf_dir, "events").coalesce(4).write.mode("overwrite").parquet(staging)
    sink = f"dq_sess_sink_{uuid.uuid4().hex[:8]}"
    s = _drain_streaming_dq(
        spark, staging, ckpt,
        lambda: run_query_availablenow(
            session_counts(stream_events_from_dir(spark, staging)), ckpt, sink
        ),
    )
    s = s.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )
    b = (
        R.sessionize(
            _t(spark, sf_dir, "events").select("user_id", "ts"),
            key="user_id", ts="ts", gap_minutes=30,
        )
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("INTERVAL 30 MINUTES")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    sym = s.exceptAll(b).unionAll(b.exceptAll(s))
    return (
        s.agg(F.count(F.lit(1)).alias("n_stream_rows"))
        .crossJoin(b.agg(F.count(F.lit(1)).alias("n_batch_rows")))
        .crossJoin(sym.agg(F.count(F.lit(1)).alias("sym_diff")))
    )


@q(
    "window_sliding_batch",
    "WITH b AS (SELECT *, date_trunc('minute', ts) - "
    "to_minutes(CAST(extract(minute FROM ts) % 30 AS BIGINT)) AS w0 FROM events) "
    "SELECT t.win_start, CAST(count(*) AS BIGINT) AS n, round(sum(e.value), 4) AS sum_value "
    "FROM b e, unnest([e.w0, e.w0 - INTERVAL 30 MINUTE]) AS t(win_start) "
    "WHERE e.ts >= t.win_start AND e.ts < t.win_start + INTERVAL 1 HOUR "
    "GROUP BY t.win_start",
)
def window_sliding_batch(spark, sf_dir):
    """ST2 sliding twin in batch: width 1h, slide 30m — every event
    lands in exactly width/slide windows via a 2-element explode of
    candidate window starts (the generalization Spark's F.window does
    natively; expressed here so DuckDB can oracle it)."""
    e = _t(spark, sf_dir, "events")
    out = (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
        .select(F.col("w.start").alias("win_start"), "n", "sum_value")
    )
    return out


@q(
    "join_range_bucketed",
    "SELECT p.event_id, CAST(count(c.event_id) AS BIGINT) AS n_any_clicks "
    "FROM events p LEFT JOIN events c ON c.event_type = 'click' "
    "AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts <= p.ts "
    "WHERE p.event_type = 'purchase' GROUP BY p.event_id",
)
def join_range_bucketed(spark, sf_dir):
    """J6 without an equi anchor: clicks (any user) within 10 minutes
    before each purchase. Spark plans a pure time-range join as a
    nested loop; operators.relational.bucketed_range_join manufactures
    a time-bucket equi key instead (left outer emulated by counting
    over the inner result unioned with zero rows)."""
    from .operators.relational import bucketed_range_join

    e = _t(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select("event_id", "ts")
    c = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("c_event_id"), F.col("ts").alias("c_ts")
    )
    inner = bucketed_range_join(
        p, c, left_ts="ts", right_ts="c_ts", lo_offset_s=-600, hi_offset_s=0
    )
    counts = inner.groupBy("event_id").agg(
        F.count(F.col("c_event_id")).alias("n_any_clicks")
    )
    # left-outer completion: purchases with zero clicks in range
    return (
        p.select("event_id")
        .join(counts, on="event_id", how="left")
        .select(
            "event_id", F.coalesce("n_any_clicks", F.lit(0)).cast("bigint").alias("n_any_clicks")
        )
    )


@q(
    "agg_grouped_pandas_iqr",
    "SELECT l_returnflag, round(quantile_cont(l_extendedprice, 0.75) - "
    "quantile_cont(l_extendedprice, 0.25), 4) AS iqr_price FROM lineitem "
    "GROUP BY l_returnflag",
)
def agg_grouped_pandas_iqr(spark, sf_dir):
    """§2.11 UDAF surface: a pandas GROUPED_AGG UDF (inter-quartile
    range). pandas' linear-interpolation quantile matches DuckDB's
    quantile_cont, so even the Python aggregation path is oracle-
    checked. Arrow moves each group as one series; at scale pair with
    a salting pre-agg if a single group outgrows executor memory.
    The UDF lives in functions/udafs.py (no postponed annotations)
    so GROUPED_AGG is inferred from its type hints — the explicit
    PandasUDFType flag is deprecated since Spark 3.0."""
    from .functions.udafs import iqr

    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(iqr(F.col("l_extendedprice")), 4).alias("iqr_price")
    )


_SOURCES = [f"src{i}" for i in range(20)]
_PIVOT_ORACLE_COLS = ", ".join(
    f"CAST(count(*) FILTER (WHERE source = '{s}') AS BIGINT) AS {s}" for s in _SOURCES
)


@q(
    "pivot_counts",
    f"SELECT lang, {_PIVOT_ORACLE_COLS} FROM documents GROUP BY lang",
)
def pivot_counts(spark, sf_dir):
    """A-extension: pivot (long→wide) — docs per (lang, source) as a
    source-column matrix. Spark's pivot with an explicit value list
    (one pass; without the list it runs a distinct pre-query)."""
    d = _t(spark, sf_dir, "documents")
    wide = d.groupBy("lang").pivot("source", _SOURCES).agg(F.count(F.lit(1)))
    # absent (lang, source) groups surface as nulls AFTER the pivot
    return wide.select(
        "lang",
        *[F.coalesce(F.col(s), F.lit(0)).cast("bigint").alias(s) for s in _SOURCES],
    )


@q(
    "agg_cube",
    "SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS cnt "
    "FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)",
)
def agg_cube(spark, sf_dir):
    """A6 completion: cube — all 4 grouping-set combinations."""
    return (
        _t(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@q(
    "window_rank_navigation",
    "SELECT l_orderkey, l_linenumber, "
    "CAST(ntile(4) OVER w AS INTEGER) AS quartile, "
    "first_value(l_quantity) OVER w AS first_qty, "
    "round(l_quantity - first_value(l_quantity) OVER w, 2) AS qty_vs_first, "
    "CAST(dense_rank() OVER (PARTITION BY l_orderkey ORDER BY l_quantity) AS INTEGER) AS qty_rank "
    "FROM lineitem WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity "
    "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
)
def window_rank_navigation(spark, sf_dir):
    """W-extension: navigation/ranking battery — ntile, first_value,
    dense_rank. Ordering includes l_quantity so ties are value-
    identical (order-invariant outputs, same rule as window_lag_frame)."""
    from pyspark.sql import Window

    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    w = (
        Window.partitionBy("l_orderkey")
        .orderBy("l_linenumber", "l_quantity")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wr = Window.partitionBy("l_orderkey").orderBy("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.ntile(4).over(Window.partitionBy("l_orderkey").orderBy("l_linenumber", "l_quantity")).cast("int").alias("quartile"),
        F.first("l_quantity").over(w).alias("first_qty"),
        F.round(F.col("l_quantity") - F.first("l_quantity").over(w), 2).alias("qty_vs_first"),
        F.dense_rank().over(wr).cast("int").alias("qty_rank"),
    )


@q(
    "zscore_grouped_pandas",
    "SELECT doc_id, lang, round((n_chars - avg(n_chars) OVER (PARTITION BY lang)) / "
    "stddev_samp(n_chars) OVER (PARTITION BY lang), 6) AS z_chars FROM documents",
)
def zscore_grouped_pandas(spark, sf_dir):
    """§2.11 grouped-map surface: per-language z-score normalization
    via ``applyInPandas`` (each group arrives as one pandas frame —
    the whole-partition model-inference shape, SURVEY §2.11). The
    oracle recomputes the same statistic with window functions, so the
    Python path is value-checked. At scale: groups must fit executor
    memory — key by a bounded-cardinality column or pre-split."""
    import pandas as pd

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        mu = pdf["n_chars"].mean()
        sd = pdf["n_chars"].std(ddof=1)
        out = pdf[["doc_id", "lang"]].copy()
        out["z_chars"] = ((pdf["n_chars"] - mu) / sd).round(6)
        return out

    return d.groupBy("lang").applyInPandas(
        zscore, schema="doc_id bigint, lang string, z_chars double"
    )


@q(
    "corpus_report",
    "SELECT CAST(count(*) AS BIGINT) AS n_docs, "
    "CAST(count(DISTINCT lang) AS BIGINT) AS n_langs, "
    "CAST(count(DISTINCT source) AS BIGINT) AS n_sources, "
    "CAST(sum(n_chars) AS BIGINT) AS total_chars, "
    "round(avg(n_chars), 4) AS avg_chars, "
    "CAST(min(n_chars) AS BIGINT) AS min_chars, "
    "CAST(max(n_chars) AS BIGINT) AS max_chars, "
    "CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique_texts "
    "FROM documents",
)
def corpus_report(spark, sf_dir):
    """The ingestion report in one multi-aggregate pass: volumes,
    dimension cardinalities, length stats, exact-dup cardinality —
    what the reference eyeballs via get_record_count per collection
    (ingestion-pipeline-website-local.py:94-118), as a single scan."""
    d = _t(spark, sf_dir, "documents")
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        F.min("n_chars").cast("bigint").alias("min_chars"),
        F.max("n_chars").cast("bigint").alias("max_chars"),
        F.countDistinct(F.md5("text")).alias("n_unique_texts"),
    )


@q(
    "top_words_zipf",
    "SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM ("
    "SELECT unnest(string_split(text, ' ')) AS word FROM documents) t "
    "GROUP BY word ORDER BY cnt DESC, word LIMIT 50",
)
def top_words_zipf(spark, sf_dir):
    """Corpus vocabulary head (Zipf check): explode → count → top-50
    with lexicographic tiebreak. TakeOrderedAndProject over the agg."""
    d = _d(spark, sf_dir)
    return (
        d.select(F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("word"))
        .limit(50)
    )


@q(
    "scalar_subquery",
    "SELECT c_custkey, CAST((SELECT count(*) FROM orders o "
    "WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders, "
    "round((SELECT coalesce(max(o_totalprice), 0.0) FROM orders o "
    "WHERE o.o_custkey = c.c_custkey), 2) AS max_spent "
    "FROM customer c",
)
def scalar_subquery(spark, sf_dir):
    """Correlated scalar subqueries in the SELECT list — Catalyst
    de-correlates them into left-outer aggregate joins (no per-row
    re-execution, unlike the reference's per-collection count loop)."""
    from .sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey,
               CAST((SELECT count(*) FROM orders o
                     WHERE o.o_custkey = c.c_custkey) AS BIGINT) AS n_orders,
               round((SELECT coalesce(max(o_totalprice), 0.0) FROM orders o
                      WHERE o.o_custkey = c.c_custkey), 2) AS max_spent
        FROM customer c
        """
    )


@q(
    "lateral_join_topn",
    "SELECT c.c_custkey, t.o_orderkey, t.o_totalprice FROM customer c, "
    "LATERAL (SELECT o_orderkey, o_totalprice FROM orders o "
    "WHERE o.o_custkey = c.c_custkey "
    "ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t",
)
def lateral_join_topn(spark, sf_dir):
    """LATERAL correlated subquery: top-2 orders per customer — the
    per-key-top-n idiom as SQL text (the DataFrame twin is
    operators.relational.top_k_per_group's rank-filter)."""
    from .sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice FROM customer c,
        LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
                 WHERE o.o_custkey = c.c_custkey
                 ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@q(
    "explode_outer_semantics",
    "WITH t AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN [] "
    "ELSE string_split(substr(text, 1, 20), ' ') END AS words FROM documents) "
    "SELECT doc_id, CASE WHEN len(words) = 0 THEN NULL ELSE unnest(words) END AS word "
    "FROM t WHERE len(words) > 0 "
    "UNION ALL SELECT doc_id, NULL AS word FROM t WHERE len(words) = 0",
)
def explode_outer_semantics(spark, sf_dir):
    """X9: explode_outer — rows with empty arrays survive with NULL
    (plain explode would drop them; the distinction matters when a
    splitter yields nothing for a document but the doc must persist)."""
    d = _t(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.array().cast("array<string>"))
        .otherwise(F.split(F.substring("text", 1, 20), " "))
        .alias("words"),
    )
    return t.select("doc_id", F.explode_outer("words").alias("word"))


@q(
    "normalize_unicode",
    "SELECT doc_id, lower(nfc_normalize(text || ' Cafe' || chr(769))) AS norm_text "
    "FROM documents",
)
def normalize_unicode(spark, sf_dir):
    """Text-cleaning: Unicode NFC normalization + case fold — the
    first stage of any multilingual LLM corpus pipeline (combining
    marks collapse so 'é' == 'é'). Spark has no builtin normalizer, so
    this crosses to Python via Arrow batches (unicodedata implements
    the same Unicode standard DuckDB's nfc_normalize does); a
    combining-accent suffix is appended to prove the collapse."""
    import pandas as pd
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    d = _d(spark, sf_dir).select("doc_id", "text")

    def run(batches):
        import unicodedata

        for pdf in batches:
            out = pd.DataFrame()
            out["doc_id"] = pdf["doc_id"]
            out["norm_text"] = [
                unicodedata.normalize("NFC", t + " Cafe\u0301").lower()
                .replace("café", "café")  # guard: already-NFC input
                for t in pdf["text"]
            ]
            yield out

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("norm_text", StringType())]
    )
    return d.mapInPandas(run, schema)


_RCTE_SQL = """
WITH RECURSIVE edges AS (
  SELECT a.doc_id AS src, b.doc_id AS dst FROM documents a
  JOIN documents b ON b.doc_id = a.doc_id + 1 AND a.lang = b.lang
), reach(src, dst) AS (
  SELECT src, dst FROM edges
  UNION ALL
  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src
)
SELECT src AS doc_id, CAST(count(*) AS BIGINT) AS n_reachable,
       CAST(max(dst) AS BIGINT) AS run_end
FROM reach GROUP BY src
"""


@q("recursive_cte_closure", _RCTE_SQL)
def recursive_cte_closure(spark, sf_dir):
    """WITH RECURSIVE in Spark SQL (4.x): transitive closure over the
    same-language consecutive-id DAG — the IDENTICAL SQL text runs on
    both engines (the only DQ where oracle and query are one string).
    Iterative DataFrame twins (dup_clusters) remain the scale path;
    this pins the language-feature parity."""
    from .sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RCTE_SQL)


@q(
    "agg_argminmax",
    "SELECT o_custkey, CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS biggest_order, "
    "CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS smallest_order, "
    "round(max(o_totalprice), 2) AS max_price FROM orders GROUP BY o_custkey",
)
def agg_argminmax(spark, sf_dir):
    """A-extension: argmax/argmin aggregates (which order was the
    biggest?) — max_by/min_by ↔ arg_max/arg_min. Deterministic on this
    data (verified tie-free per customer); with ties you'd wrap the
    ordering value in a struct with a unique tiebreak."""
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("biggest_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("smallest_order"),
        F.round(F.max("o_totalprice"), 2).alias("max_price"),
    )


@q(
    "quality_repetition_signals",
    "WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents), "
    "base AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words, "
    "round(list_aggregate(list_transform(ws, x -> CAST(length(x) AS DOUBLE)), 'sum') "
    "/ len(ws), 6) AS mean_word_len, "
    "round(len(list_filter(ws, x -> regexp_full_match(x, '[A-Za-z]+'))) "
    "/ CAST(len(ws) AS DOUBLE), 6) AS frac_alpha_words FROM w), "
    "g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g "
    "FROM w, unnest(generate_series(1, len(ws) - 1)) u(i)), "
    "c2 AS (SELECT doc_id, count(*) AS c FROM g2 GROUP BY doc_id, g), "
    "t2 AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) "
    "AS top_2gram_frac FROM c2 GROUP BY doc_id), "
    "g3 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS g "
    "FROM w, unnest(generate_series(1, len(ws) - 2)) u(i)), "
    "c3 AS (SELECT doc_id, count(*) AS c FROM g3 GROUP BY doc_id, g), "
    "d3 AS (SELECT doc_id, round((sum(c) - count(*)) / CAST(sum(c) AS DOUBLE), 6) "
    "AS dup_3gram_frac FROM c3 GROUP BY doc_id) "
    "SELECT base.doc_id, n_words, mean_word_len, frac_alpha_words, "
    "coalesce(top_2gram_frac, 0.0) AS top_2gram_frac, "
    "coalesce(dup_3gram_frac, 0.0) AS dup_3gram_frac "
    "FROM base LEFT JOIN t2 USING (doc_id) LEFT JOIN d3 USING (doc_id)",
)
def quality_repetition_signals(spark, sf_dir):
    """Gopher/Dolma-family repetition filters: per-doc top-2-gram
    fraction and duplicate-3-gram fraction alongside word-composition
    basics — the standard 'repetitious document' kill signals for LLM
    corpus cleaning, all JVM-side (array exprs + two doc-keyed
    gram aggregations)."""
    from .functions.textops import repetition_signals

    return repetition_signals(_d(spark, sf_dir), "text", "doc_id")


@q(
    "join_salted_skew",
    "SELECT s_name, "
    "CAST(round(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))), 2) "
    "AS DOUBLE) AS revenue, CAST(count(*) AS BIGINT) AS n_items "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
    "GROUP BY s_name",
)
def join_salted_skew(spark, sf_dir):
    """Skew remedy as a first-class operator: the fact side salts its
    join key deterministically (xxhash64 of the row identity mod 8),
    the dim side replicates 8x, and the join runs on (key, salt) so a
    hot supplier spreads over 8 reducers. The oracle is the PLAIN
    join+aggregate — salting must be result-invisible."""
    from .operators.skew import salted_skew_join

    li = _t(spark, sf_dir, "lineitem").withColumnRenamed("l_suppkey", "s_suppkey")
    su = _t(spark, sf_dir, "supplier")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = salted_skew_join(
        li, su, "s_suppkey", salt_cols=["l_orderkey", "l_linenumber"], n_salt=8
    )
    return j.groupBy("s_name").agg(
        F.round(F.sum(rev.cast("decimal(18,6)")), 2).cast("double").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@q(
    "pii_scrub",
    "WITH p AS (SELECT doc_id, 'contact ' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6) "
    "|| '@example.com or 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-' "
    "|| lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || ' ' || text AS raw FROM documents) "
    "SELECT doc_id, "
    "CAST(len(regexp_extract_all(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+')) AS INTEGER) AS n_emails, "
    "CAST(len(regexp_extract_all(raw, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones, "
    "substr(regexp_replace(regexp_replace(raw, '[a-z0-9]+@[a-z]+\\.[a-z]+', '<EMAIL>', 'g'), "
    "'[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'), 1, 120) AS scrubbed_head "
    "FROM p",
)
def pii_scrub(spark, sf_dir):
    """Dolma-style PII redaction: email/phone regex scrub with
    per-document redaction counts. PII is synthesized deterministically
    per doc (the corpus has none), then removed — both the detector
    (regexp_count) and the scrubber (regexp_replace) are JVM
    expressions; patterns are kept to portable character-class regex
    so Java and RE2 agree. At 100 TB this is a pure map stage."""
    d = _d(spark, sf_dir)
    email = r"[a-z0-9]+@[a-z]+\.[a-z]+"
    phone = r"[0-9]{3}-[0-9]{3}-[0-9]{4}"
    raw = F.concat(
        F.lit("contact "),
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6),
        F.lit("@example.com or 555-"),
        F.lpad((F.col("doc_id") % 1000).cast("string"), 3, "0"),
        F.lit("-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" "),
        F.col("text"),
    )
    p = d.select("doc_id", raw.alias("raw"))
    return p.select(
        "doc_id",
        F.regexp_count("raw", F.lit(email)).cast("int").alias("n_emails"),
        F.regexp_count("raw", F.lit(phone)).cast("int").alias("n_phones"),
        F.substring(
            F.regexp_replace(
                F.regexp_replace("raw", email, "<EMAIL>"), phone, "<PHONE>"
            ),
            1,
            120,
        ).alias("scrubbed_head"),
    )


@q(
    "scan_csv_roundtrip",
    "SELECT n.n_name, r.r_name, CAST(count(*) AS BIGINT) AS n FROM nation n "
    "JOIN region r ON n.n_regionkey = r.r_regionkey GROUP BY n.n_name, r.r_name",
)
def scan_csv_roundtrip(spark, sf_dir):
    """S5/S6 format breadth: the dims round-trip through CSV (header,
    explicit schema on read — never inferSchema at scale: it is a
    full extra pass) before the join. The oracle reads the original
    parquet, so any quoting/typing loss in the CSV hop fails the
    hash."""
    import tempfile

    from .sources.catalog import load_table

    tmp = tempfile.mkdtemp(prefix="csv_rt_")
    out = {}
    for t in ["nation", "region"]:
        df = load_table(spark, sf_dir, t)
        path = f"{tmp}/{t}"
        df.write.mode("overwrite").option("header", True).csv(path)
        out[t] = spark.read.schema(df.schema).option("header", True).csv(path)
    j = out["nation"].join(
        out["region"],
        out["nation"].n_regionkey == out["region"].r_regionkey,
    )
    return j.groupBy("n_name", "r_name").agg(F.count(F.lit(1)).alias("n"))


@q(
    "scan_jsonl_roundtrip",
    "SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders, "
    "CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total "
    "FROM orders GROUP BY o_orderpriority",
)
def scan_jsonl_roundtrip(spark, sf_dir):
    """S5/S6 format breadth: the orders fact round-trips through
    JSON-lines (the interchange format of most crawl/corpus drops)
    with an explicit schema on read. Doubles survive JSON exactly
    (Spark prints round-trippable repr); the decimal-sum oracle on
    the original parquet catches any loss."""
    import tempfile

    from .sources.catalog import load_table

    tmp = tempfile.mkdtemp(prefix="jsonl_rt_")
    df = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    df.write.mode("overwrite").json(tmp + "/orders")
    back = spark.read.schema(df.schema).json(tmp + "/orders")
    return back.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total"),
    )


@q(
    "scan_orc_roundtrip",
    "SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n, "
    "CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty "
    "FROM lineitem GROUP BY l_returnflag, l_linestatus",
)
def scan_orc_roundtrip(spark, sf_dir):
    """S5/S6 format breadth: the lineitem fact round-trips through ORC
    (the other columnar interchange format; native Spark source with
    predicate pushdown and column pruning like parquet). The oracle
    aggregates the original parquet, so any typing drift in the ORC
    hop fails the hash."""
    import tempfile

    from .sources.catalog import load_table

    tmp = tempfile.mkdtemp(prefix="orc_rt_")
    df = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_quantity"
    )
    df.write.mode("overwrite").orc(tmp + "/lineitem")
    back = spark.read.schema(df.schema).orc(tmp + "/lineitem")
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("qty"),
    )


@q(
    "rollup_time_cascade",
    "SELECT 'minute' AS grain, date_trunc('minute', ts) AS bucket, event_type, "
    "CAST(count(*) AS BIGINT) AS n_events, "
    "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value "
    "FROM events GROUP BY date_trunc('minute', ts), event_type "
    "UNION ALL "
    "SELECT 'hour' AS grain, date_trunc('hour', ts) AS bucket, event_type, "
    "CAST(count(*) AS BIGINT), "
    "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) "
    "FROM events GROUP BY date_trunc('hour', ts), event_type "
    "UNION ALL "
    "SELECT 'day' AS grain, date_trunc('day', ts) AS bucket, event_type, "
    "CAST(count(*) AS BIGINT), "
    "CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) "
    "FROM events GROUP BY date_trunc('day', ts), event_type",
)
def rollup_time_cascade(spark, sf_dir):
    """Hypertable-style continuous-aggregate cascade: the minute
    rollup is computed from raw events ONCE; hour re-aggregates the
    minute rollup and day re-aggregates hour — at 100 TB the coarser
    grains cost ~nothing (input is already ~1/1000th the raw size)
    where the naive form scans raw three times. The static plan shows
    the minute subtree under each union branch, but sharing happens
    at runtime: AQE shuffle-stage reuse executes the duplicated
    exchanges once (verified: 2 ReusedExchange nodes in the final
    adaptive plan). Bit-identical to the oracle's direct per-grain
    aggregation because decimal addition is associative (a double sum
    would NOT survive the regrouping)."""
    e = _t(spark, sf_dir, "events")
    minute = e.groupBy(
        F.date_trunc("minute", "ts").alias("bucket"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("s"),
    )
    hour = minute.groupBy(
        F.date_trunc("hour", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    day = hour.groupBy(
        F.date_trunc("day", "bucket").alias("bucket"), "event_type"
    ).agg(F.sum("n").alias("n"), F.sum("s").alias("s"))

    def finalize(df, grain):
        return df.select(
            F.lit(grain).alias("grain"),
            "bucket",
            "event_type",
            F.col("n").cast("bigint").alias("n_events"),
            F.round(F.col("s"), 2).cast("double").alias("total_value"),
        )

    return (
        finalize(minute, "minute")
        .unionByName(finalize(hour, "hour"))
        .unionByName(finalize(day, "day"))
    )


@q(
    "variant_json_tolerant",
    "WITH j AS (SELECT event_type, CASE WHEN event_id % 7 = 0 "
    "THEN ']garbage' || props ELSE props END AS js FROM events) "
    "SELECT event_type, "
    "CAST(sum(CASE WHEN json_valid(js) THEN 0 ELSE 1 END) AS BIGINT) AS n_corrupt, "
    "CAST(sum(CASE WHEN json_valid(js) THEN 1 ELSE 0 END) AS BIGINT) AS n_valid, "
    "CAST(sum(CASE WHEN json_valid(js) THEN CAST(json_extract(js, '$.k') AS BIGINT) "
    "END) AS BIGINT) AS sum_k "
    "FROM j GROUP BY event_type",
)
def variant_json_tolerant(spark, sf_dir):
    """Semi-structured ingestion with Spark 4 VARIANT: try_parse_json
    yields NULL for malformed payloads (corruption synthesized by
    prepending garbage to every 7th event; trailing garbage would be
    ambiguous — Spark's parser tolerates it, DuckDB's does not) instead of failing the batch — the
    bad-records-quarantine posture a crawl pipeline needs — and
    variant_get extracts typed fields from the open-schema rest.
    Oracle twin via DuckDB json_valid/json_extract."""
    e = _t(spark, sf_dir, "events")
    js = F.when(
        F.col("event_id") % 7 == 0, F.concat(F.lit("]garbage"), F.col("props"))
    ).otherwise(F.col("props"))
    v = F.try_parse_json(js)
    parsed = e.select(
        "event_type",
        v.isNull().cast("int").alias("corrupt"),
        F.variant_get(v, "$.k", "long").alias("k"),
    )
    return parsed.groupBy("event_type").agg(
        F.sum("corrupt").cast("bigint").alias("n_corrupt"),
        F.sum(1 - F.col("corrupt")).cast("bigint").alias("n_valid"),
        F.sum("k").cast("bigint").alias("sum_k"),
    )


_RANGE_FRAME_SQL = """
SELECT user_id, ts, event_type,
       CAST(count(*) OVER w AS BIGINT) AS n_last_hour,
       CAST(round(sum(CAST(value AS DECIMAL(18,6))) OVER w, 2) AS DOUBLE)
           AS val_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts
             RANGE BETWEEN INTERVAL '1' HOUR PRECEDING AND CURRENT ROW)
"""


@q("window_range_frame", _RANGE_FRAME_SQL.replace("INTERVAL '1' HOUR", "INTERVAL 1 HOUR"))
def window_range_frame(spark, sf_dir):
    """W3 extension: value-based (RANGE) frame over a timestamp order
    key — 'events in the trailing hour' per user. Unlike a ROWS frame
    this is tie-stable by definition (all ts peers share the frame),
    and the interval bound needs no epoch conversion on either
    engine, so TIMESTAMP_NTZ never round-trips through a session
    timezone. Decimal sums keep the frame aggregates bit-exact."""
    from .sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_RANGE_FRAME_SQL)


_GROUPING_SETS_SQL = """
SELECT coalesce(l_returnflag, 'ALL') AS rf,
       coalesce(l_linestatus, 'ALL') AS ls,
       CAST(grouping(l_returnflag) AS INTEGER) AS g_rf,
       CAST(grouping(l_linestatus) AS INTEGER) AS g_ls,
       CAST(count(*) AS BIGINT) AS n,
       CAST(round(sum(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS qty
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
"""


@q("agg_grouping_sets", _GROUPING_SETS_SQL)
def agg_grouping_sets(spark, sf_dir):
    """A6 completion: arbitrary GROUPING SETS (fine, per-flag, grand
    total in one pass — rollup/cube are the special cases already
    covered) with grouping() indicators disambiguating real NULLs
    from subtotal rows. One expand + one aggregate exchange."""
    from .sources.catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_GROUPING_SETS_SQL)


@q(
    "corpus_filter_pipeline",
    "WITH w AS (SELECT doc_id, lang, string_split(text, ' ') AS ws FROM documents), "
    "base AS (SELECT doc_id, lang, CAST(len(ws) AS BIGINT) AS n_words, "
    "round(len(list_filter(ws, x -> regexp_full_match(x, '[A-Za-z]+'))) "
    "/ CAST(len(ws) AS DOUBLE), 6) AS frac_alpha FROM w), "
    "g2 AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS g "
    "FROM w, unnest(generate_series(1, len(ws) - 1)) u(i)), "
    "c2 AS (SELECT doc_id, count(*) AS c FROM g2 GROUP BY doc_id, g), "
    "t2 AS (SELECT doc_id, round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top2 "
    "FROM c2 GROUP BY doc_id), "
    "sig AS (SELECT base.*, coalesce(top2, 0.0) AS top2 "
    "FROM base LEFT JOIN t2 USING (doc_id)) "
    "SELECT doc_id, concat_ws(',', "
    "CASE WHEN n_words < 30 THEN 'too_short' END, "
    "CASE WHEN frac_alpha < 0.5 THEN 'low_alpha' END, "
    "CASE WHEN top2 > 0.1 THEN 'repetitive' END, "
    "CASE WHEN lang NOT IN ('en', 'de', 'es', 'fr') THEN 'lang_excluded' END) "
    "AS drop_reasons, "
    "CAST(CASE WHEN n_words >= 30 AND frac_alpha >= 0.5 AND top2 <= 0.1 "
    "AND lang IN ('en', 'de', 'es', 'fr') THEN 1 ELSE 0 END AS INTEGER) AS keep "
    "FROM sig",
)
def corpus_filter_pipeline(spark, sf_dir):
    """The Dolma/Gopher-style cleaning pipeline as ONE declared plan:
    composition signals (word count, alphabetic fraction), repetition
    (top-2-gram fraction) and a language allowlist produce a per-doc
    keep/drop verdict with named reasons (concat_ws skips the NULL
    CASE arms identically on both engines). At 100 TB this whole
    filter is the scalar expressions plus one doc-keyed gram
    aggregation — no UDF, no collect, one pass over the corpus."""
    from .functions.textops import repetition_signals

    d = _d(spark, sf_dir)
    sig = repetition_signals(d, "text", "doc_id").join(
        d.select("doc_id", "lang"), "doc_id"
    )
    lang_ok = F.col("lang").isin("en", "de", "es", "fr")
    reasons = F.concat_ws(
        ",",
        F.when(F.col("n_words") < 30, "too_short"),
        F.when(F.col("frac_alpha_words") < 0.5, "low_alpha"),
        F.when(F.col("top_2gram_frac") > 0.1, "repetitive"),
        F.when(~lang_ok, "lang_excluded"),
    )
    keep = (
        (F.col("n_words") >= 30)
        & (F.col("frac_alpha_words") >= 0.5)
        & (F.col("top_2gram_frac") <= 0.1)
        & lang_ok
    )
    return sig.select(
        "doc_id",
        reasons.alias("drop_reasons"),
        keep.cast("int").alias("keep"),
    )


@q(
    "crawl_frontier",
    "WITH ux AS (SELECT '<urlset><url><loc> https://ex.com/d/' || "
    "CAST(doc_id AS VARCHAR) || '?a=1&amp;b=2 </loc></url><url><loc>"
    "https://ex.com/d/' || CAST(doc_id AS VARCHAR) || "
    "'/page/</loc></url></urlset>' AS xml FROM documents WHERE doc_id % 2 = 0), "
    "sx AS (SELECT replace(replace(replace(replace(replace(u, '&lt;', '<'), "
    "'&gt;', '>'), '&quot;', '\"'), '&apos;', ''''), '&amp;', '&') AS url "
    "FROM ux, unnest(regexp_extract_all(xml, '<loc>\\s*([^<]+?)\\s*</loc>', 1)) AS t(u)), "
    "h AS (SELECT '<a href=\"/en/documentation/html/doc' || CAST(doc_id AS VARCHAR) || "
    "'/\">x</a><a href=\"/other/o' || CAST(doc_id AS VARCHAR) || "
    "'\">y</a><a href=\"/en/documentation/pdf/doc' || CAST(doc_id AS VARCHAR) || "
    "'\">z</a>' AS html FROM documents), "
    "hl AS (SELECT u FROM h, unnest(regexp_extract_all(html, 'href=\"([^\"]+)\"', 1)) AS t(u)), "
    "hf AS (SELECT 'https://docs.example.com' || replace(u, '/html/', '/html-single/') AS url "
    "FROM hl WHERE u LIKE '/en/documentation%' AND u LIKE '%/html/%') "
    "SELECT DISTINCT regexp_replace(url, '/$', '') AS url "
    "FROM (SELECT url FROM sx UNION ALL SELECT url FROM hf)",
)
def crawl_frontier(spark, sf_dir):
    """S3 under the driver for the first time (VERDICT r08 #6): one
    crawl-frontier DQ wiring the pytest-only pieces together. A
    fixture sitemap table is built deterministically from documents
    rows — even doc_ids publish a <urlset> with two locs (one
    entity-encoded, one with a trailing slash), odd doc_ids publish a
    <sitemapindex> whose locs are further SITEMAPS (is_index=true →
    recursed through fetch_pages, never emitted as frontier). That
    seed set is unioned with the HTML-link frontier
    (discover_frontier: href extraction → prefix filter → contains
    filter → single-page rewrite → absolute URL; the reference's
    get_pages, ingestion-pipeline.py:166-191), then normalized
    (trailing slash stripped) and deduped. Pure JVM expressions
    end-to-end (regexp_extract_all / replace / union / distinct — no
    Python eval in the plan, asserted in tests), so the DuckDB string
    oracle replicates every step. At 100 TB: scalar string work plus
    one distinct — a single shuffle over the (tiny relative to corpus)
    URL universe."""
    from .functions.html import discover_frontier, sitemap_frontier

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id").cast("string")
    xml = d.filter(F.col("doc_id") % 2 == 0).select(
        F.concat(
            F.lit("<urlset><url><loc> https://ex.com/d/"), did,
            F.lit("?a=1&amp;b=2 </loc></url><url><loc>https://ex.com/d/"),
            did, F.lit("/page/</loc></url></urlset>"),
        ).alias("xml")
    )
    idx = d.filter(F.col("doc_id") % 2 == 1).select(
        F.concat(
            F.lit("<sitemapindex><sitemap><loc>https://ex.com/sitemaps/"),
            did, F.lit(".xml</loc></sitemap></sitemapindex>"),
        ).alias("xml")
    )
    # dedup=False on both helpers: the union dedups ONCE at the end —
    # one exchange for the whole frontier instead of three (the
    # intermediate distincts would shuffle the full pre-normalized
    # URL sets only to be re-shuffled; r09 self-review)
    seeds = (
        sitemap_frontier(xml.unionAll(idx), dedup=False)
        .filter(~F.col("is_index"))
        .select("url")
    )
    html = d.select(
        F.concat(
            F.lit('<a href="/en/documentation/html/doc'), did,
            F.lit('/">x</a><a href="/other/o'), did,
            F.lit('">y</a><a href="/en/documentation/pdf/doc'), did,
            F.lit('">z</a>'),
        ).alias("html")
    )
    links = discover_frontier(html, dedup=False).select("url")
    return (
        seeds.unionAll(links)
        .select(F.regexp_replace("url", "/$", "").alias("url"))
        .distinct()
    )


@q(
    "warc_extract",
    "SELECT doc_id, CAST(3 AS INTEGER) AS n_records, "
    "CAST(200 AS INTEGER) AS http_status, "
    "'text/html; charset=utf-8' AS content_type, "
    "CAST(octet_length(encode(text)) AS INTEGER) AS body_bytes, "
    "md5(text) AS body_md5 FROM documents",
)
def warc_extract(spark, sf_dir):
    """The Common Crawl-shaped source under the driver (S2/S4 at
    archive scale): each doc is encoded as a REAL 3-record .warc.gz
    shard — warcinfo + request + response, each its own gzip member
    per the ISO 28500 storage layout, with the HTTP response body
    chunked-transfer-encoded on doc_id%3==0 and gzip
    content-encoded on doc_id%5==0 (both when both divide) — then
    parsed back by the production stdlib parser
    (sources/warc.py: member walk → record grammar → HTTP parse →
    dechunk → gunzip). The query emits per-doc record count, status,
    content type, and the decoded body's byte length + md5; the
    oracle predicts all of them from the documents table directly
    (md5 over the text's UTF-8 bytes) — values a parser that
    mis-framed members, mis-dechunked, or skipped the gunzip could
    not reproduce. One groupBy shuffle; the parse itself is a narrow
    Arrow-batched map, the exact stage shape the 100 TB
    read-the-crawl plan runs (plans/web_ingestion.py
    website_ingestion_from_warc)."""
    from .sources.warc import attach_synthetic_warc, warc_records

    d = _d(spark, sf_dir).select("doc_id", "text")
    shards = attach_synthetic_warc(d).select(
        F.col("doc_id").cast("string").alias("path"), "payload"
    )
    recs = warc_records(shards, payload_col="payload", path_col="path")
    resp = F.col("record_type") == "response"
    return recs.groupBy(F.col("path").cast("bigint").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("int").alias("n_records"),
        F.max(F.when(resp, F.col("http_status"))).alias("http_status"),
        F.max(F.when(resp, F.col("content_type"))).alias("content_type"),
        F.max(F.when(resp, F.octet_length("body"))).alias("body_bytes"),
        F.max(F.when(resp, F.md5("body"))).alias("body_md5"),
    )


_WARC_CHARSET_ORACLE = (
    "WITH m AS (SELECT doc_id, "
    "CASE CAST(doc_id % 4 AS INTEGER) "
    "WHEN 0 THEN '£é¥ ' "
    "WHEN 1 THEN '<meta charset=\"shift_jis\">日本語 ' "
    "WHEN 2 THEN 'Ünïcode ' ELSE 'Çafé ' END || text AS html, "
    "CASE CAST(doc_id % 4 AS INTEGER) "
    "WHEN 0 THEN 'windows-1252' WHEN 1 THEN 'shift_jis' "
    "WHEN 2 THEN 'utf-8-sig' ELSE 'utf-8' END AS charset FROM documents) "
    "SELECT doc_id, charset, md5(html) AS body_md5, "
    "length(html) AS body_chars FROM m"
)


@q("warc_extract_charset", _WARC_CHARSET_ORACLE)
def warc_extract_charset(spark, sf_dir):
    """Charset-aware crawl decode (the gap a real crawl user hits
    first: 15–20% of web pages are legacy-charset and UTF-8-casting
    them makes mojibake). Each doc becomes a real .warc.gz shard whose
    response body is a non-ASCII marker + the text encoded in a
    rotating charset, declared four different ways: the iso-8859-1
    HEADER label (alias-normalized to windows-1252, as browsers do),
    a <meta charset=shift_jis> tag with a param-less header (the
    sniff path), a UTF-8 BOM with no declaration at all, and
    undeclared non-ASCII UTF-8 (the strict-probe path) — on top of
    the chunked/gzip transfer rotation. The production parser +
    charset-aware decoder (sources/warc.py resolve_charset:
    BOM > header > meta > probe > windows-1252) must recover the
    exact original string: the oracle predicts the decoded md5,
    char length, and detected charset from the documents table.
    A decoder that UTF-8-cast, skipped the alias map, missed the
    meta sniff, or emitted the BOM as U+FEFF cannot match. Narrow
    Arrow stages end-to-end — zero shuffles."""
    from .sources.warc import attach_synthetic_warc, warc_records, warc_response_docs

    d = _d(spark, sf_dir).select("doc_id", "text")
    shards = attach_synthetic_warc(d, charsets=True).select(
        F.col("doc_id").cast("string").alias("path"), "payload"
    )
    recs = warc_records(shards, payload_col="payload", path_col="path")
    docs = warc_response_docs(recs, with_charset=True)
    return docs.select(
        F.regexp_extract("url", r"/d/(\d+)$", 1).cast("bigint").alias("doc_id"),
        "charset",
        F.md5("html").alias("body_md5"),
        F.length("html").cast("bigint").alias("body_chars"),
    )


def _canon_pct_sql(expr: str) -> str:
    """DuckDB twin of html.pct_normalize: the same 12 hex-uppercase
    rewrites + 66 unreserved-escape decodes, nested (DuckDB
    regexp_replace needs the explicit 'g' flag — it replaces only
    the first match by default)."""
    from .functions.html import _UNRESERVED

    for d in "abcdef":
        expr = f"regexp_replace({expr}, '%{d}([0-9A-Fa-f])', '%{d.upper()}\\1', 'g')"
    for d in "abcdef":
        expr = f"regexp_replace({expr}, '%([0-9A-F]){d}', '%\\1{d.upper()}', 'g')"
    for ch in _UNRESERVED:
        expr = f"regexp_replace({expr}, '%{ord(ch):02X}', '{ch}', 'g')"
    return expr


_CANON_ORACLE = (
    "WITH u AS (SELECT doc_id, "
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP://Ex' ELSE 'HTTPS://Ex' END) "
    "|| CAST(doc_id % 3 AS VARCHAR) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '.COM:80/Docs/' ELSE '.COM:443/Docs/' END) "
    "|| CAST(doc_id AS VARCHAR) || "
    "(CASE CAST(doc_id % 7 AS INTEGER) "
    "WHEN 0 THEN '/%7euser' WHEN 1 THEN '/%41%62c' "
    "WHEN 2 THEN '/a%2fb' WHEN 3 THEN '/caf%c3%a9' ELSE '' END) || "
    "(CASE CAST(doc_id % 5 AS INTEGER) "
    "WHEN 0 THEN '/?utm_source=mail&b=2&a=1#sec' "
    "WHEN 1 THEN '?z=9&y=8&utm_campaign=c&%63=1' "
    "WHEN 2 THEN '/' WHEN 3 THEN '#/route?tab=1' ELSE '' END) AS url FROM documents), "
    "n AS (SELECT doc_id, " + _canon_pct_sql("url") + " AS url FROM u), "
    "s1 AS (SELECT doc_id, "
    "regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1) AS head, "
    "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1) AS path, "
    "regexp_extract(url, '^[^#]*?\\?([^#]*)', 1) AS query FROM n), "
    "s2 AS (SELECT doc_id, "
    "regexp_replace(regexp_replace(lower(head), '^(http://[^/?#:]*):80$', '\\1'), "
    "'^(https://[^/?#:]*):443$', '\\1') AS head2, "
    "regexp_replace(path, '/+$', '') AS path2, "
    "array_to_string(list_sort(list_filter(string_split(query, '&'), "
    "x -> len(x) > 0 AND NOT regexp_matches(x, '^(utm_[^=]*|gclid|fbclid)='))), '&') AS q2 "
    "FROM s1) "
    "SELECT doc_id, head2 || path2 || "
    "CASE WHEN len(q2) > 0 THEN '?' || q2 ELSE '' END AS url FROM s2"
)


@q("url_canonicalize", _CANON_ORACLE)
def url_canonicalize(spark, sf_dir):
    """Crawl hygiene for the WARC/frontier path: the same page
    arrives as Http://EX.com:80/a/?utm_source=x and http://ex.com/a
    across crawls, and naive URL-distinct treats them as different
    documents. Fixture URLs are built from doc_id with rotating mess
    (uppercase scheme+host, scheme-default ports, tracking params,
    unsorted queries, trailing slashes, fragments incl. hash-route
    '?', and percent-escapes: unreserved '%7e'/'%41%62', reserved
    '%2f', non-ASCII '%c3%a9', an encoded '%63=' param that must
    decode BEFORE the byte-sort — construction mirrored in the
    oracle, the crawl_frontier pattern) and
    html.canonical_url normalizes them: lowercase authority, default
    port stripped (scheme-matched), fragment dropped, utm_*/gclid/
    fbclid dropped, params byte-sorted, trailing slash stripped.
    Pure JVM expressions both sides — zero shuffles beyond the local
    respread."""
    from .functions.html import canonical_url

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    url = F.concat(
        F.when(did % 2 == 0, F.lit("HTTP://Ex")).otherwise(F.lit("HTTPS://Ex")),
        (did % 3).cast("string"),
        F.when(did % 2 == 0, F.lit(".COM:80/Docs/")).otherwise(
            F.lit(".COM:443/Docs/")
        ),
        did.cast("string"),
        F.when(did % 7 == 0, F.lit("/%7euser"))
        .when(did % 7 == 1, F.lit("/%41%62c"))
        .when(did % 7 == 2, F.lit("/a%2fb"))
        .when(did % 7 == 3, F.lit("/caf%c3%a9"))
        .otherwise(F.lit("")),
        F.when(did % 5 == 0, F.lit("/?utm_source=mail&b=2&a=1#sec"))
        .when(did % 5 == 1, F.lit("?z=9&y=8&utm_campaign=c&%63=1"))
        .when(did % 5 == 2, F.lit("/"))
        .when(did % 5 == 3, F.lit("#/route?tab=1"))
        .otherwise(F.lit("")),
    )
    return d.select("doc_id", canonical_url(url).alias("url"))


@q(
    "crawl_snapshot_diff",
    "WITH a AS (SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS url, "
    "md5(text) AS body_md5 FROM documents WHERE doc_id % 11 <> 3), "
    "b AS (SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS url, "
    "md5(CASE WHEN doc_id % 7 = 0 THEN text || ' updated' ELSE text END) AS body_md5 "
    "FROM documents WHERE doc_id % 11 <> 7) "
    "SELECT coalesce(a.url, b.url) AS url, "
    "CASE WHEN a.url IS NULL THEN 'added' "
    "WHEN b.url IS NULL THEN 'removed' "
    "WHEN a.body_md5 <> b.body_md5 THEN 'changed' "
    "ELSE 'unchanged' END AS status "
    "FROM a FULL OUTER JOIN b ON a.url = b.url",
)
def crawl_snapshot_diff(spark, sf_dir):
    """The delta between two crawl generations — what incremental
    re-ingestion actually consumes (re-embed 'added'+'changed',
    delete 'removed' from the index, skip 'unchanged'; the
    document-granular upgrade of the reference's collection-level
    skip-if-exists, W:116-118). Two snapshot fixtures derive from
    documents (generation A misses doc_id%11==3 → 'added' in B;
    B misses %11==7 → 'removed'; %7==0 bodies edited → 'changed');
    operators.relational.snapshot_diff full-outer joins 32-byte md5
    fingerprints — at 100 TB the shuffle carries digests, never
    bodies. All JVM expressions; two key-hashed exchanges."""
    from .operators.relational import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    url = F.concat(F.lit("https://ex.com/d/"), F.col("doc_id").cast("string"))
    gen_a = d.filter(F.col("doc_id") % 11 != 3).select(
        url.alias("url"), F.md5(F.encode("text", "utf-8")).alias("body_md5")
    )
    gen_b = d.filter(F.col("doc_id") % 11 != 7).select(
        url.alias("url"),
        F.md5(
            F.encode(
                F.when(
                    F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" updated"))
                ).otherwise(F.col("text")),
                "utf-8",
            )
        ).alias("body_md5"),
    )
    return snapshot_diff(gen_a, gen_b, "url", "body_md5")


_ROBOTS_BODIES = [
    # k%3==0: disallow a subtree, re-allow a deeper one (most
    # specific wins); * group only — a named agent falls back here
    "User-agent: *\nDisallow: /private/\nAllow: /private/pub/\n",
    # k%3==1: named-UA selection — the DQ crawls as 'graftbot', so
    # the graftbot group governs and the harsher * group must be
    # IGNORED; comment + blank-line noise
    "User-agent: graftbot\nDisallow: /tmp/\nAllow: /tmp/ok\n\n# politeness\nUser-agent: *\nDisallow: /\n",
    # k%3==2: full-REP wildcard + anchor rules — the session-id
    # wildcard (the classic large-site pattern), an end-anchored
    # allow, and a short literal disallow the anchor must outrank
    "User-agent: *\nDisallow: /*?sessionid=\nAllow: /ok$\nDisallow: /o\n",
]

_ROBOTS_PATHS = [
    "/private/pub/x", "/private/x", "/tmp/okay", "/tmp/zz", "/ok",
    "/page?sessionid=abc", "/okay",
]

#: expected parse of _ROBOTS_BODIES for hosts h0..h5 (k%3 rotation)
#: under agent='graftbot' — the parser (group selection, wildcard →
#: regex translation) is pinned by pytest; the oracle replicates the
#: MATCH semantics (regex for wildcard/anchor rules, prefix for
#: literals; most specific pattern wins, allow wins ties, no
#: match=allow). Regexes here are the exact translations
#: rule_pattern_to_regex emits.
_ROBOTS_RULE_VALUES = ", ".join(
    f"('h{k}.ex.com', '{p}', {str(a).lower()}, "
    + ("NULL" if rx is None else f"'{rx}'") + ")"
    for k in range(6)
    for p, a, rx in {
        0: [("/private/", False, None), ("/private/pub/", True, None)],
        1: [("/tmp/", False, None), ("/tmp/ok", True, None)],
        2: [
            ("/*?sessionid=", False, r"^/.*\?sessionid="),
            ("/ok$", True, "^/ok$"),
            ("/o", False, None),
        ],
    }[k % 3]
)

_ROBOTS_ORACLE = (
    "WITH f AS (SELECT doc_id, "
    "'h' || CAST(doc_id % 6 AS VARCHAR) || '.ex.com' AS host, "
    "CASE CAST(doc_id % 7 AS INTEGER) "
    "WHEN 0 THEN '/private/pub/x' WHEN 1 THEN '/private/x' "
    "WHEN 2 THEN '/tmp/okay' WHEN 3 THEN '/tmp/zz' WHEN 4 THEN '/ok' "
    "WHEN 5 THEN '/page?sessionid=abc' ELSE '/okay' END AS path "
    "FROM documents), "
    f"r(host, rule_path, allow, rule_regex) AS (VALUES {_ROBOTS_RULE_VALUES}), "
    "j AS (SELECT f.doc_id, 'https://' || f.host || f.path AS url, "
    # sortable match key: zero-padded pattern length + allow bit —
    # max() picks the most specific rule, allow breaking length ties
    "max(CASE WHEN r.rule_path IS NULL THEN NULL "
    "ELSE lpad(CAST(len(r.rule_path) AS VARCHAR), 4, '0') || "
    "(CASE WHEN r.allow THEN '1' ELSE '0' END) END) AS best "
    "FROM f LEFT JOIN r ON f.host = r.host "
    "AND (CASE WHEN r.rule_regex IS NOT NULL "
    "THEN regexp_matches(f.path, r.rule_regex) "
    "ELSE starts_with(f.path, r.rule_path) END) "
    "GROUP BY f.doc_id, f.host, f.path) "
    "SELECT doc_id, url, "
    "CASE WHEN best IS NULL THEN true ELSE best LIKE '%1' END AS allowed FROM j"
)


_NB_ORACLE = (
    "WITH base AS (SELECT doc_id, list_filter(regexp_split_to_array("
    "lower(text), '[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents), "
    "lbl AS (SELECT doc_id, ws, CASE WHEN "
    "len(list_filter(ws, x -> x = 'spark' OR x = 'query')) > "
    "len(list_filter(ws, x -> x = 'customer' OR x = 'order')) "
    "THEN 'a' ELSE 'b' END AS label FROM base), "
    "tr AS (SELECT * FROM lbl WHERE doc_id % 5 <> 0), "
    "ttok AS (SELECT label, unnest(ws) AS token FROM tr), "
    "counts AS (SELECT label, token, count(*) AS n FROM ttok GROUP BY label, token), "
    "voc AS (SELECT CAST(count(DISTINCT token) AS DOUBLE) AS v FROM counts), "
    "ctot AS (SELECT label, CAST(sum(n) AS DOUBLE) AS tot FROM counts GROUP BY label), "
    "dc AS (SELECT label, count(*) AS docs FROM tr GROUP BY label), "
    "nd AS (SELECT CAST(count(*) AS DOUBLE) AS nd FROM tr), "
    "model AS (SELECT c.label, c.token, "
    "CAST(round(ln((c.n + 1.0) / (t.tot + v.v)) * 1000000.0) AS BIGINT) AS lp "
    "FROM counts c JOIN ctot t ON c.label = t.label, voc v), "
    "cls AS (SELECT d.label, "
    "CAST(round(ln(d.docs / n.nd) * 1000000.0) AS BIGINT) AS prior, "
    "CAST(round(ln(1.0 / (t.tot + v.v)) * 1000000.0) AS BIGINT) AS unseen "
    "FROM dc d JOIN ctot t ON d.label = t.label, voc v, nd n), "
    "atok AS (SELECT doc_id, unnest(ws) AS token FROM lbl), "
    "ex AS (SELECT a.doc_id, c.label, coalesce(m.lp, c.unseen) AS lp "
    "FROM atok a CROSS JOIN cls c "
    "LEFT JOIN model m ON m.label = c.label AND m.token = a.token), "
    "sc AS (SELECT doc_id, label, sum(lp) AS s FROM ex GROUP BY doc_id, label), "
    "fin AS (SELECT sc.doc_id, sc.label, sc.s + c.prior AS score, "
    "row_number() OVER (PARTITION BY sc.doc_id "
    "ORDER BY sc.s + c.prior DESC, sc.label) AS rn "
    "FROM sc JOIN cls c ON c.label = sc.label) "
    "SELECT doc_id, label AS predicted, CAST(score AS BIGINT) AS score_micros "
    "FROM fin WHERE rn = 1"
)


@q("nb_quality_classify", _NB_ORACLE)
def nb_quality_classify(spark, sf_dir):
    """Model-based corpus filtering wholly in the engine — the
    GPT-3/CCNet-style classifier gate (train a cheap text model on
    labeled slices, score every document) as pure relational
    algebra: multinomial Naive Bayes with Laplace smoothing
    (functions/nbayes.py). Fixture labels derive from token content
    ('spark'/'query' vs 'customer'/'order' dominance), training uses
    the doc_id%5!=0 slice, and EVERY doc is then classified.
    Determinism is the batch-BM25 pattern: log-probs are computed
    once at train time and stored as integer micros, per-document
    class scores are exact BIGINT sums, argmax ties break on class
    name — the DuckDB oracle replicates the entire train+apply
    pipeline and predictions hash-match bit-exactly. The model
    table broadcasts (|vocab| x |classes| rows); 100 TB classify
    cost is one broadcast join + one (doc, class) groupBy."""
    from .functions.nbayes import nb_classify, nb_train

    d = _d(spark, sf_dir).select("doc_id", "text")
    ws = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )
    def nmatch(*terms):
        conds = None
        for t in terms:
            c = F.size(F.filter(ws, _term_eq_factory(t)))
            conds = c if conds is None else conds + c
        return conds

    lbl = d.withColumn(
        "label",
        F.when(nmatch("spark", "query") > nmatch("customer", "order"), "a").otherwise("b"),
    )
    model, classes = nb_train(lbl.filter(F.col("doc_id") % 5 != 0))
    return nb_classify(lbl, model, classes)


def _term_eq_factory(t):
    # factory closure (not a defaulted lambda param: PySpark treats a
    # two-param lambda's second arg as the array index column)
    return lambda x: x == F.lit(t)


@q(
    "funnel_conversion",
    "WITH s0 AS (SELECT user_id, ts, event_type, "
    "min(CASE WHEN event_type = 'view' THEN ts END) "
    "OVER (PARTITION BY user_id) AS t_view FROM events), "
    "s1 AS (SELECT *, min(CASE WHEN event_type = 'click' AND ts > t_view "
    "THEN ts END) OVER (PARTITION BY user_id) AS t_click FROM s0), "
    "s2 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND ts > t_click "
    "THEN ts END) OVER (PARTITION BY user_id) AS t_purchase FROM s1), "
    "u AS (SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click, "
    "min(t_purchase) AS t_purchase FROM s2 GROUP BY user_id) "
    "SELECT user_id, t_view, t_click, t_purchase, "
    "CAST(CASE WHEN t_purchase IS NOT NULL THEN 3 "
    "WHEN t_click IS NOT NULL THEN 2 ELSE 1 END AS INTEGER) AS reached "
    "FROM u WHERE t_view IS NOT NULL",
)
def funnel_conversion(spark, sf_dir):
    """Ordered-funnel analysis (view → click → purchase) with
    first-touch attribution: per entrant, the earliest completion of
    each step strictly after the previous one, plus funnel depth.
    ONE shuffle for the whole funnel — each step time is a
    conditional window-min chained over the SAME user partitioning
    (k steps = k window passes over already-partitioned data, not
    k joins), and the per-user reduce rides the same hash
    partitioning. The oracle is the identical chained-window
    construction in DuckDB."""
    from .operators.relational import funnel_steps

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return funnel_steps(e, ["view", "click", "purchase"]).select(
        "user_id", "t_view", "t_click", "t_purchase", "reached"
    )


@q(
    "html_main_content",
    "SELECT doc_id, trim(regexp_replace(text, '[ \t\r\n]+', ' ', 'g')) "
    "AS main_text FROM documents",
)
def html_main_content(spark, sf_dir):
    """Boilerplate removal (boilerpipe/arc90 heuristic) — the step
    between WARC decode and chunking a general crawl needs where the
    reference's class-based drop list assumes one site's markup.
    Each doc becomes a page with nav/header/footer/related-links
    boilerplate wrapped around an <article> holding the doc text;
    the extractor (functions/html.py::extract_main_content: boiler
    tags dropped wholesale, blocks scored by length + link density)
    must return exactly the whitespace-normalized article text —
    the oracle predicts it from documents directly, so any leaked
    nav item or dropped content sentence breaks the hash. One Arrow
    stage, zero shuffles."""
    from .functions.html import extract_main_content_stage

    d = _d(spark, sf_dir).select("doc_id", "text")
    pages = d.select(
        "doc_id",
        F.concat(
            F.lit('<html><body><nav><a href="/">Home</a> <a href="/x">More</a>'
                  '</nav><header><h1>Site Banner</h1></header><article><p>'),
            F.col("text"),
            F.lit('</p></article><div><a href="/r1">Related story one link</a> '
                  '<a href="/r2">Related two link text</a></div>'
                  '<footer>© <a href="/legal">Legal</a></footer></body></html>'),
        ).alias("html"),
    )
    return extract_main_content_stage(pages)


@q(
    "url_dedup_pipeline",
    "SELECT 'https://xn--mnchen-3ya.example/Docs/' "
    "|| CAST(doc_id // 3 AS VARCHAR) AS url, "
    "CAST(count(*) AS BIGINT) AS n_raw FROM documents GROUP BY 1",
)
def url_dedup_pipeline(spark, sf_dir):
    """The complete URL-dedup-key pipeline, end to end: three raw
    spellings of the same resource — a unicode IDN host with the
    https default port, a tracking param and a trailing slash; the
    punycoded host bare; the punycoded host UPPERCASED with a
    fragment — must collapse to ONE canonical key per resource
    through idn_host_normalize (split-path punycode) → canonical_url
    (percent/port/fragment/tracking/case normalization) → groupBy.
    The oracle is the INDEPENDENT expectation ('every group of three
    collapses to https://xn--mnchen-3ya.example/Docs/<gid>'), not a
    replication of the chain — any variant the pipeline fails to
    collapse, or any over-merge, breaks both the key and the count."""
    from .functions.html import canonical_url, idn_host_normalize

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    gid = F.expr("doc_id div 3").cast("string")
    raw = d.select(
        F.when(
            did % 3 == 0,
            F.concat(F.lit("https://MÜnchen.example:443/Docs/"), gid, F.lit("/?utm_source=x")),
        )
        .when(
            did % 3 == 1,
            F.concat(F.lit("https://xn--mnchen-3ya.example/Docs/"), gid),
        )
        .otherwise(
            F.concat(F.lit("HTTPS://XN--MNCHEN-3YA.EXAMPLE/Docs/"), gid, F.lit("#frag")),
        )
        .alias("url"),
    )
    canon = idn_host_normalize(raw).select(canonical_url(F.col("url")).alias("url"))
    return canon.groupBy("url").agg(F.count(F.lit(1)).alias("n_raw"))


#: IDN fixture hosts (mixed case to prove the codec's per-label
#: lowercase) and their RFC 3490 punycode forms, precomputed via the
#: stdlib codec at oracle-build time (DuckDB cannot punycode; the
#: expected literals are the oracle, the runtime path is the real
#: split-path Arrow stage)
_IDN_HOSTS = ["MÜnchen", "köln", "tokyo日本", "plain-ascii"]
_IDN_EXPECTED = [
    (h + ".example").encode("idna").decode("ascii") for h in _IDN_HOSTS[:3]
] + ["plain-ascii.example"]


@q(
    "url_idn_host",
    "SELECT doc_id, 'https://' || CASE CAST(doc_id % 4 AS INTEGER) "
    + " ".join(
        f"WHEN {i} THEN '{host}'" for i, host in enumerate(_IDN_EXPECTED[:3])
    )
    + f" ELSE '{_IDN_EXPECTED[3]}' END || '/d/' || CAST(doc_id AS VARCHAR) AS url "
    "FROM documents",
)
def url_idn_host(spark, sf_dir):
    """IDN host normalization — the other half of the URL-dedup-key
    story next to canonical_url (its documented IDN limit, now
    closed): 'MÜnchen.example' and 'xn--mnchen-3ya.example' are the
    same host to a resolver but distinct dedup keys to a byte
    compare. idn_host_normalize is split-path for scale: ASCII-host
    rows (the overwhelming majority of a crawl) never cross the
    Python boundary; only the non-ASCII slice runs the stdlib-idna
    Arrow stage, then unions back. Fixture rotates three IDN hosts
    (mixed case proving the codec's per-label lowercase) plus an
    ASCII host that must pass through untouched; the oracle carries
    the RFC 3490 expected forms."""
    from .functions.html import idn_host_normalize

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.when(did % 4 == 0, F.lit(_IDN_HOSTS[0]))
            .when(did % 4 == 1, F.lit(_IDN_HOSTS[1]))
            .when(did % 4 == 2, F.lit(_IDN_HOSTS[2]))
            .otherwise(F.lit(_IDN_HOSTS[3])),
            F.lit(".example/d/"),
            did.cast("string"),
        ).alias("url"),
    )
    return idn_host_normalize(frontier)


@q(
    "crawl_politeness_waves",
    "WITH f AS (SELECT doc_id, doc_id % 7 AS h, "
    "'https://h' || CAST(doc_id % 7 AS VARCHAR) || '.ex.com/d/' "
    "|| CAST(doc_id AS VARCHAR) AS url FROM documents), "
    # even hosts declare Crawl-delay: 2 -> cap floor(10/2)=5; odd
    # hosts keep the default 10
    "r AS (SELECT doc_id, url, "
    "CASE WHEN h % 2 = 0 THEN 5 ELSE 10 END AS cap, "
    "row_number() OVER (PARTITION BY h ORDER BY url) AS rn FROM f) "
    "SELECT doc_id, url, CAST((rn - 1) // cap AS INTEGER) AS wave FROM r",
)
def crawl_politeness_waves(spark, sf_dir):
    """Host-rate shaping for the fetcher, Crawl-delay-aware: every
    URL gets a wave index so no host exceeds its per-wave request
    cap — the default 10, or ``floor(wave_seconds / Crawl-delay)``
    for hosts whose robots.txt declares a delay (parsed by the REAL
    parser from inline bodies: even fixture hosts say
    'Crawl-delay: 2', giving cap 5 at the 10 s wave width). The
    scheduling half of politeness next to crawl_robots_gate. A
    fetcher drains wave 0 across all hosts in parallel, then wave
    1 — host backpressure at full fleet parallelism. One window
    exchange; the per-host delay table broadcasts."""
    from .functions.robots import parse_robots_delays, politeness_waves

    d = _t(spark, sf_dir, "documents").select("doc_id")
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
            F.lit(".ex.com/d/"), F.col("doc_id").cast("string"),
        ).alias("url"),
    )
    robots = spark.range(7).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".ex.com")).alias("host"),
        F.when(
            F.col("id") % 2 == 0,
            F.lit("User-agent: *\nCrawl-delay: 2\nDisallow:\n"),
        )
        .otherwise(F.lit("User-agent: *\nDisallow:\n"))
        .alias("robots_body"),
    )
    delays = parse_robots_delays(robots)
    return politeness_waves(
        frontier, per_host_per_wave=10, delays=delays, wave_seconds=10.0
    )


_CMS_PROBES = ["data", "spark", "the", "zzqx", "query"]


def _cms_oracle() -> str:
    def bucket(j_expr: str, v_expr: str) -> str:
        return (
            f"CAST(CAST('0x' || substr(md5(CAST({j_expr} AS VARCHAR) || '|' || {v_expr}), "
            f"1, 15) AS BIGINT) % 256 AS INTEGER)"
        )

    probes = ", ".join(f"('{p}')" for p in _CMS_PROBES)
    return (
        "WITH w AS (SELECT unnest(list_filter(regexp_split_to_array("
        "lower(text), '[^a-z0-9]+'), x -> len(x) > 0)) AS v FROM documents), "
        "e AS (SELECT v, j.j FROM w, (VALUES (0), (1), (2), (3)) j(j)), "
        f"b AS (SELECT j, {bucket('j', 'v')} AS bucket FROM e), "
        "s AS (SELECT j, bucket, count(*) AS cnt FROM b GROUP BY j, bucket), "
        f"p(item) AS (VALUES {probes}), "
        f"pe AS (SELECT item, j.j, {bucket('j.j', 'item')} AS bucket "
        "FROM p, (VALUES (0), (1), (2), (3)) j(j)), "
        "est AS (SELECT item, min(coalesce(s.cnt, 0)) AS estimate "
        "FROM pe LEFT JOIN s ON s.j = pe.j AND s.bucket = pe.bucket GROUP BY item) "
        "SELECT item, CAST(estimate AS BIGINT) AS estimate FROM est"
    )


@q("cms_token_freq", _cms_oracle())
def cms_token_freq(spark, sf_dir):
    """Count-min sketch frequency estimation over the corpus token
    stream — the constant-size summary that answers 'how often does
    this token occur across 100 TB' without a full-cardinality
    groupBy (boilerplate detection, stopword discovery, skew-key
    identification for salting). Sketch = 4x256 md5-bucketed
    counters (partial agg: the exchange moves at most partitions x
    depth x width rows no matter the corpus); estimates = min over
    depth rows, >= truth always. The DuckDB oracle replicates the
    exact md5 bucket arithmetic and the sketch build — estimates
    hash-match exactly, including the collision overestimate on the
    absent probe."""
    from .functions.sketches import cms_build, cms_estimate

    d = _d(spark, sf_dir).select("text")
    tokens = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("token")
    )
    sketch = cms_build(tokens, "token")
    probes = spark.createDataFrame([(p,) for p in _CMS_PROBES], "item string")
    return cms_estimate(sketch, probes)


_ANCHOR_SQL_PAT = '<a\\s[^>]*href="([^"]*)"[^>]*>([\\s\\S]*?)</a>'

@q(
    "crawl_anchor_edges",
    "WITH pages AS (SELECT doc_id, "
    "'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS src, "
    "'<p>intro</p><a href=\"/d/' || CAST((doc_id * 7 + 1) % 500 AS VARCHAR) "
    "|| '\" class=\"x\">  first <b>link</b>' || chr(10) || 'text  </a>"
    "<a id=\"k\" href=\"/d/' || CAST((doc_id * 13 + 2) % 500 AS VARCHAR) "
    "|| '\">doc ' || CAST(doc_id AS VARCHAR) || '</a>' AS html FROM documents), "
    f"a AS (SELECT src, unnest(regexp_extract_all(html, '{_ANCHOR_SQL_PAT}', 0)) "
    "AS el FROM pages) "
    f"SELECT src, regexp_extract(el, '{_ANCHOR_SQL_PAT}', 1) AS dst, "
    f"trim(regexp_replace(regexp_replace(regexp_extract(el, '{_ANCHOR_SQL_PAT}', 2), "
    "'<[^>]*>', ' ', 'g'), '[ \\t\\r\\n]+', ' ', 'g')) AS anchor_text FROM a",
)
def crawl_anchor_edges(spark, sf_dir):
    """The link graph WITH anchor text from raw HTML — pure JVM
    regexp (whole-<a> extraction, explode, per-element href/body
    re-extract, nested-tag strip, whitespace collapse). The edge
    list is pagerank_scores' input; the anchor text is the classic
    link-text corpus (link text describes the TARGET page). Fixture
    pages carry two attribute-noisy anchors with a nested <b> and a
    newline inside the body; the oracle replicates the extraction
    pipeline in DuckDB. Zero Python; only the explode's row growth."""
    from .functions.html import extract_anchor_edges

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    pages = d.select(
        F.concat(F.lit("https://ex.com/d/"), did.cast("string")).alias("url"),
        F.concat(
            F.lit('<p>intro</p><a href="/d/'),
            ((did * 7 + 1) % 500).cast("string"),
            F.lit('" class="x">  first <b>link</b>\ntext  </a><a id="k" href="/d/'),
            ((did * 13 + 2) % 500).cast("string"),
            F.lit('">doc '),
            did.cast("string"),
            F.lit("</a>"),
        ).alias("html"),
    )
    return extract_anchor_edges(pages)


@q(
    "heavy_hitters_per_lang",
    "SELECT lang, token, CAST(count(*) AS BIGINT) AS n FROM ("
    "SELECT lang, unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> len(x) > 0)) AS token FROM documents) "
    "GROUP BY lang, token HAVING count(*) >= 50",
)
def heavy_hitters_per_lang(spark, sf_dir):
    """Exact heavy hitters PER GROUP (r12) — the tokens appearing >=
    50 times WITHIN each language, the per-language boilerplate/
    stopword report: pass 1 builds a per-group count-min sketch
    ((group, depth, bucket) cells, broadcastable at report-scale
    group counts), pass 2 estimates each (lang, token) via depth
    broadcast joins keyed on (group, bucket) and exact-counts only
    the survivors. No false negatives (CMS never underestimates), so
    the result EQUALS the naive GROUP BY lang, token HAVING — that
    equality IS the oracle — while the final aggregation state is
    bounded by per-group candidates instead of |groups| x vocabulary.
    width=64 deliberately forces collision pressure: the exact pass
    provably drops the false positives."""
    from .functions.sketches import heavy_hitters_grouped

    toks = _t(spark, sf_dir, "documents").select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.lower("text"), "[^a-z0-9]+"), lambda x: F.length(x) > 0
            )
        ).alias("token"),
    )
    return heavy_hitters_grouped(toks, "lang", "token", 50, width=64, depth=4)


@q(
    "heavy_hitters_two_pass",
    "SELECT token, CAST(count(*) AS BIGINT) AS n FROM ("
    "SELECT unnest(list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> len(x) > 0)) AS token FROM documents) "
    "GROUP BY token HAVING count(*) >= 800",
)
def heavy_hitters_two_pass(spark, sf_dir):
    """Exact heavy hitters at sketch cost: CMS pass finds candidate
    tokens (never-underestimate ⇒ no false negatives), a second pass
    exact-counts only rows whose value cleared the estimate filter —
    the aggregation state is bounded by |heavy values| instead of
    the vocabulary, the property that makes 'which tokens/URLs/
    fingerprints exceed N occurrences in 100 TB' affordable. The
    result provably EQUALS plain GROUP BY ... HAVING count >= N —
    which is exactly the oracle, so the driver verifies the sketch
    pipeline converges to exact truth."""
    from .functions.sketches import heavy_hitters

    d = _d(spark, sf_dir).select("text")
    tokens = d.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col("text")), "[^a-z0-9]+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("token")
    )
    return heavy_hitters(tokens, "token", min_count=800)


def _zorder_oracle() -> str:
    from .operators.layout import zorder_key_n_sql

    return (
        "SELECT event_id, "
        + zorder_key_n_sql(
            [
                "(user_id % 4096)",
                "(event_id % 4096)",
                "(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) % 4096)",
            ],
            bits=12,
        )
        + " AS zkey FROM events"
    )


@q("zorder_cluster_key", _zorder_oracle())
def zorder_cluster_key(spark, sf_dir):
    """Morton (Z-order) clustering key — the layout operator behind
    multi-dimensional data skipping (Delta/Iceberg OPTIMIZE ZORDER
    BY takes N columns; the reference writes unclustered parquet).
    Round-robin interleaves the low 12 bits of THREE pre-bucketed
    dimensions (user, event, epoch-day — the host/date/size shape a
    crawl store clusters by) as pure JVM bit arithmetic, 36 key
    bits; cluster_by_zorder range-partitions + sorts by this key so
    parquet row-group min/max stats prune on ANY of the predicates.
    Oracle is the generated ANSI twin of the exact same bit
    expression — zero shuffles, scan-side scalar math."""
    from .operators.layout import zorder_key_n

    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    day = F.datediff(F.col("ts"), F.lit("1970-01-01").cast("date"))
    return e.select(
        "event_id",
        zorder_key_n(
            [F.col("user_id") % 4096, F.col("event_id") % 4096, day % 4096],
            bits=12,
        ).alias("zkey"),
    )


def _pagerank_oracle(
    iters: int = 5,
    edges_cte: str = (
        "n AS (SELECT count(*) AS c FROM documents), "
        "e AS (SELECT doc_id AS src, (doc_id * 7 + 13 * j.j) % n.c AS dst "
        "FROM documents, n, (VALUES (1), (2), (3)) j(j))"
    ),
    select: str = "SELECT node, r AS rank_micros FROM it{last}",
) -> str:
    base = (1_000_000 * 15) // 100
    parts = [
        f"WITH {edges_cte}, "
        "deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src), "
        "nodes AS (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e), "
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes)"
    ]
    for t in range(1, iters + 1):
        parts.append(
            f", it{t} AS (SELECT nodes.node, "
            f"CAST({base} + coalesce(s.m, 0) AS BIGINT) AS r FROM nodes "
            f"LEFT JOIN (SELECT e.dst AS node, "
            f"sum((r.r * 85) // (100 * deg.deg)) AS m "
            f"FROM e JOIN deg ON e.src = deg.src "
            f"JOIN {'r0' if t == 1 else f'it{t - 1}'} r ON r.node = e.src "
            f"GROUP BY e.dst) s ON s.node = nodes.node)"
        )
    parts.append(" " + select.format(last=iters))
    return "".join(parts)


@q("crawl_pagerank", _pagerank_oracle())
def crawl_pagerank(spark, sf_dir):
    """Link-graph centrality for crawl prioritization (the frontier
    ranking signal Common Crawl publishes as harmonic centrality;
    the reference crawls in discovery order). Five integer power
    iterations of functions/graph.py::pagerank_scores over a
    deterministic 3-out-edges-per-doc pseudo-graph (dst = (src*7 +
    13j) mod |docs|, the 1-row count broadcast pattern). Every rank
    is BIGINT micro-units and every transfer integer-div — the
    DuckDB oracle unrolls the same five iterations and the result
    is bit-identical regardless of aggregation order or
    partitioning. 2 shuffles per iteration (src-keyed join +
    dst-keyed sum), the canonical iterative-join pattern; at real
    scale persist the edge list partitioned by src once."""
    from .functions.graph import pagerank_scores

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    edges = (
        d.join(F.broadcast(n_row))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            "__n",
        )
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 13 * F.col("j")) % F.col("__n")).alias("dst"),
        )
    )
    handles: list = []
    return _materialized(
        pagerank_scores(edges, iters=5, cache_handles=handles), handles
    )


_RANK_EDGES_CTE = (
    "e AS (SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS src, "
    "'https://ex.com/d/' || CAST((doc_id * 7 + 1) % 500 AS VARCHAR) AS dst "
    "FROM documents UNION ALL "
    "SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR), "
    "'https://ex.com/d/' || CAST((doc_id * 13 + 2) % 500 AS VARCHAR) "
    "FROM documents)"
)


@q(
    "crawl_rank_pipeline",
    _pagerank_oracle(
        edges_cte=_RANK_EDGES_CTE,
        select=(
            "SELECT node AS url, r AS rank_micros FROM ("
            "SELECT node, r, row_number() OVER (ORDER BY r DESC, node) AS rn "
            "FROM it{last}) WHERE rn <= 20"
        ),
    ),
)
def crawl_rank_pipeline(spark, sf_dir):
    """The frontier-prioritization capstone, end to end in ONE plan:
    raw HTML pages → anchor-edge extraction (JVM regexp) → relative
    hrefs resolved against the source authority → five integer
    PageRank rounds over the resulting URL graph → top-20 URLs to
    fetch first. This is what replaces the reference's
    discovery-order crawl at scale: the fetch queue is ordered by
    link centrality computed from the crawl itself. The oracle
    constructs the expected edge list independently from doc_id
    arithmetic (extraction parity is crawl_anchor_edges' job) and
    unrolls the same bit-exact integer iterations."""
    from .functions.graph import pagerank_scores
    from .functions.html import extract_anchor_edges

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    pages = d.select(
        F.concat(F.lit("https://ex.com/d/"), did.cast("string")).alias("url"),
        F.concat(
            F.lit('<p>intro</p><a href="/d/'),
            ((did * 7 + 1) % 500).cast("string"),
            F.lit('" class="x">  first <b>link</b>\ntext  </a><a id="k" href="/d/'),
            ((did * 13 + 2) % 500).cast("string"),
            F.lit('">doc '),
            did.cast("string"),
            F.lit("</a>"),
        ).alias("html"),
    )
    edges = extract_anchor_edges(pages).select(
        "src",
        F.concat(
            F.regexp_extract("src", r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)", 1),
            F.col("dst"),
        ).alias("dst"),
    )
    handles: list = []
    ranks = pagerank_scores(edges, iters=5, cache_handles=handles)
    return _materialized(
        ranks.orderBy(F.col("rank_micros").desc(), F.col("node"))
        .limit(20)
        .select(F.col("node").alias("url"), "rank_micros"),
        handles,
    )


@q("crawl_robots_gate", _ROBOTS_ORACLE)
def crawl_robots_gate(spark, sf_dir):
    """robots.txt politeness gate — the filter a production crawler
    runs between snapshot_diff's added/changed set and the re-fetch
    stage (the reference's crawl step, website-ingestion-pipeline.py
    P:166-191, has no robots gate; a general crawler needs one).
    Six fixture hosts rotate three robots bodies — a subtree
    disallow with a deeper re-allow, a named ``graftbot`` group that
    must GOVERN (the DQ crawls as graftbot; the harsher ``*`` group
    in the same body must be ignored), and a full-REP body mixing a
    ``/*?sessionid=`` wildcard, an end-anchored ``/ok$`` allow, and
    a short literal ``/o`` disallow the anchor must outrank.
    Frontier URLs rotate seven paths (42 host×path combos),
    including a query-string URL the wildcard must bite. The REAL
    parser (functions/robots.py, Arrow stage over the tiny per-host
    bodies; group selection + wildcard→regex translation) produces
    the rule table; the decision is a broadcast host-equi join
    (literal rules via JVM startswith, wildcard/anchor rules via
    JVM regexp_like) + one max-of-struct aggregate — most specific
    pattern wins, allow wins ties, no match allows. The oracle
    replicates the match semantics in DuckDB from the expected
    parse (parser pinned separately by pytest). One shuffle (the
    per-URL groupBy)."""
    from .functions.robots import parse_robots_rules, robots_decisions

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    frontier = d.select(
        "doc_id",
        F.concat(
            F.lit("https://h"), (did % 6).cast("string"), F.lit(".ex.com"),
            F.when(did % 7 == 0, F.lit("/private/pub/x"))
            .when(did % 7 == 1, F.lit("/private/x"))
            .when(did % 7 == 2, F.lit("/tmp/okay"))
            .when(did % 7 == 3, F.lit("/tmp/zz"))
            .when(did % 7 == 4, F.lit("/ok"))
            .when(did % 7 == 5, F.lit("/page?sessionid=abc"))
            .otherwise(F.lit("/okay")),
        ).alias("url"),
    )
    hosts = spark.range(6).select(
        F.concat(F.lit("h"), F.col("id").cast("string"), F.lit(".ex.com")).alias("host"),
        (F.col("id") % 3).cast("int").alias("k"),
    )
    robots = hosts.select(
        "host",
        F.when(F.col("k") == 0, F.lit(_ROBOTS_BODIES[0]))
        .when(F.col("k") == 1, F.lit(_ROBOTS_BODIES[1]))
        .otherwise(F.lit(_ROBOTS_BODIES[2]))
        .alias("robots_body"),
    )
    rules = parse_robots_rules(robots, agent="graftbot")
    return robots_decisions(frontier, rules)


_RECRAWL_EDGES_CTE = (
    "n AS (SELECT count(*) AS c FROM documents), "
    "e AS (SELECT 'https://h' || CAST(doc_id % 4 AS VARCHAR) || '.ex.com/d/' "
    "|| CAST(doc_id AS VARCHAR) AS src, "
    "'https://h' || CAST(((doc_id * 7 + 13 * j.j) % n.c) % 4 AS VARCHAR) "
    "|| '.ex.com/d/' || CAST((doc_id * 7 + 13 * j.j) % n.c AS VARCHAR) AS dst "
    "FROM documents, n, (VALUES (1), (2)) j(j))"
)

#: the queue/wave expectation is constructed from FIXTURE ARITHMETIC,
#: not by replicating the chain: re-fetch set = doc_id%10<=1 (added =
#: %10==0, changed = %10==1), the wildcard robots block = exactly the
#: added rows on host h0 (doc_id%4==0 and %10==0 -> the /d/*0$ rule),
#: the Crawl-delay cap = 2 on h1 (floor(10s/5s)) and 3 elsewhere; only
#: the rank column unrolls the published integer recurrence (the same
#: accepted pattern as crawl_rank_pipeline).
_RECRAWL_SELECT = (
    ", q AS (SELECT doc_id, "
    "'https://h' || CAST(doc_id % 4 AS VARCHAR) || '.ex.com/d/' "
    "|| CAST(doc_id AS VARCHAR) AS url, "
    "CASE WHEN doc_id % 10 = 0 THEN 'added' ELSE 'changed' END AS status, "
    "CAST(doc_id % 4 AS INTEGER) AS h FROM documents "
    "WHERE doc_id % 10 <= 1 AND NOT (doc_id % 4 = 0 AND doc_id % 10 = 0)), "
    "qr AS (SELECT q.url, q.status, q.h, r.r AS rank_micros "
    "FROM q JOIN it{last} r ON r.node = q.url) "
    "SELECT url, status, rank_micros, "
    "CAST((row_number() OVER (PARTITION BY h "
    "ORDER BY rank_micros DESC, url) - 1) "
    "// (CASE WHEN h = 1 THEN 2 ELSE 3 END) AS INTEGER) AS wave FROM qr"
)


@q(
    "incremental_recrawl_pipeline",
    _pagerank_oracle(iters=3, edges_cte=_RECRAWL_EDGES_CTE, select=_RECRAWL_SELECT),
)
def incremental_recrawl_pipeline(spark, sf_dir):
    """The incremental re-crawl capstone (r10 verdict #4) — the
    decision pipeline a re-crawl actually runs, end to end in ONE
    plan: snapshot_diff over two crawl generations (old is missing
    every 10th page, every 10th-plus-one page changed its
    fingerprint) -> the added+changed re-fetch set -> full-REP
    robots gate (h0's ``Disallow: /d/*0$`` wildcard blocks exactly
    the added pages whose id ends in 0) -> integer-PageRank priority
    over the full URL link graph (3 rounds, 2 out-edges/page) ->
    Crawl-delay-aware politeness waves FILLED IN RANK ORDER (h1
    declares Crawl-delay: 5 -> cap floor(10/5)=2 per wave; others
    cap 3) — the fetch queue drains highest-centrality URLs first
    without ever exceeding any host's polite rate. The oracle
    constructs the expected queue independently from fixture
    arithmetic (diff membership, wildcard block, caps) and unrolls
    only the rank recurrence. Shuffle shape: the full-outer diff (2
    exchanges), 2/iter for the rank rounds, one window for the
    waves; robots rules + delays broadcast."""
    from .functions.graph import pagerank_scores
    from .functions.robots import (
        parse_robots_delays,
        parse_robots_rules,
        politeness_waves,
        robots_filter,
    )
    from .operators.relational import snapshot_diff

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")

    def url_of(c):
        return F.concat(
            F.lit("https://h"), (c % 4).cast("string"),
            F.lit(".ex.com/d/"), c.cast("string"),
        )

    fp_new = F.concat(F.lit("f"), did.cast("string"))
    new = d.select(url_of(did).alias("url"), fp_new.alias("body_md5"))
    old = d.filter(did % 10 != 0).select(
        url_of(did).alias("url"),
        F.when(did % 10 == 1, F.concat(F.lit("old"), did.cast("string")))
        .otherwise(fp_new)
        .alias("body_md5"),
    )
    refetch = snapshot_diff(old, new).filter(
        F.col("status").isin("added", "changed")
    )

    robots = spark.createDataFrame(
        [
            ("h0.ex.com", "User-agent: *\nDisallow: /d/*0$\n"),
            ("h1.ex.com", "User-agent: *\nCrawl-delay: 5\nDisallow:\n"),
            ("h2.ex.com", "User-agent: *\nDisallow: /private/\n"),
        ],
        "host string, robots_body string",
    )
    gated = robots_filter(refetch, parse_robots_rules(robots))

    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    edges = (
        d.join(F.broadcast(n_row))
        .select("doc_id", F.explode(F.array(F.lit(1), F.lit(2))).alias("j"), "__n")
        .select(
            url_of(did).alias("src"),
            url_of((did * 7 + 13 * F.col("j")) % F.col("__n")).alias("dst"),
        )
    )
    handles: list = []
    ranks = pagerank_scores(edges, iters=3, cache_handles=handles)

    queue = gated.join(ranks.withColumnRenamed("node", "url"), "url")
    waved = politeness_waves(
        queue,
        per_host_per_wave=3,
        delays=parse_robots_delays(robots),
        wave_seconds=10.0,
        order_by=[F.col("rank_micros").desc(), F.col("url")],
    )
    return _materialized(
        waved.select("url", "status", "rank_micros", "wave"), handles
    )


def _hll_oracle() -> str:
    """DuckDB twin of the FULL HLL register pipeline (p=11, m=2048,
    60-bit md5 hash, trailing-zero rho in exact integer arithmetic,
    BIGINT harmonic denominator) — registers, estimate, and bound
    all replicate; only the final scalar ln/round are float, the
    NB-micros precedent."""
    m, k = 2048, 50  # p=11; K = 60 - 11 + 1... rho saturates at 50
    return (
        "WITH h AS (SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) "
        "AS BIGINT) AS h FROM (SELECT DISTINCT user_id FROM events "
        "WHERE user_id IS NOT NULL)), "
        f"bw AS (SELECT h % {m} AS bucket, h // {m} AS w FROM h), "
        f"reg AS (SELECT bucket, max(CASE WHEN w = 0 THEN {k} "
        "ELSE 1 + bit_count((w & -w) - 1) END) AS rho FROM bw GROUP BY bucket), "
        "agg AS (SELECT count(*) AS nonzero, "
        f"sum(CAST(1 AS BIGINT) << ({k} - rho)) AS s_nz FROM reg), "
        f"st AS (SELECT CAST({m} AS INTEGER) AS m, CAST(nonzero AS BIGINT) AS nonzero, "
        f"CAST(coalesce(s_nz, 0) + ({m} - nonzero) * (CAST(1 AS BIGINT) << {k}) "
        "AS BIGINT) AS inv_sum_scaled FROM agg), "
        f"e AS (SELECT m, nonzero, inv_sum_scaled, "
        f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0 * "
        f"CAST(CAST(1 AS BIGINT) << {k} AS DOUBLE) / inv_sum_scaled AS raw "
        "FROM st), "
        "est AS (SELECT m, nonzero, inv_sum_scaled, "
        f"CAST(CASE WHEN raw <= 2.5 * {m} AND (m - nonzero) > 0 "
        f"THEN round({m}.0 * ln({m}.0 / CAST(m - nonzero AS DOUBLE))) "
        "ELSE round(raw) END AS BIGINT) AS est FROM e), "
        "x AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS exact FROM events "
        "WHERE user_id IS NOT NULL) "
        "SELECT m, nonzero, inv_sum_scaled, est, exact, "
        "abs(est - exact) <= 0.05 * exact AS within_5pct FROM est, x"
    )


@q("hll_distinct_users", _hll_oracle())
def hll_distinct_users(spark, sf_dir):
    """HyperLogLog cardinality (r11 D-series) — "how many distinct
    users/URLs/fingerprints in 100 TB" at CONSTANT state: 2048
    registers forever, mergeable across shards by per-bucket max
    (pytest), vs a full-cardinality groupBy whose hash state grows
    with the answer. Registers are exact integers end-to-end (md5
    hash, trailing-zero rho via bit_count — never float log2; BIGINT
    harmonic denominator, associative so partitioning cannot flap
    it); the DuckDB oracle replicates the whole pipeline register
    for register and the small-range linear-counting branch. Output:
    one row (m, nonzero, inv_sum_scaled, est, exact, within_5pct) —
    the driver verifies sketch AND accuracy bound."""
    from .functions.sketches import hll_build, hll_estimate

    ev = _t(spark, sf_dir, "events").select("user_id").filter(
        F.col("user_id").isNotNull()
    )
    est = hll_estimate(hll_build(ev, "user_id"))
    exact = ev.agg(F.countDistinct("user_id").cast("bigint").alias("exact"))
    return est.join(F.broadcast(exact)).withColumn(
        "within_5pct", F.abs(F.col("est") - F.col("exact")) <= 0.05 * F.col("exact")
    )


def _hll_grouped_oracle() -> str:
    """The _hll_oracle register pipeline with a group dimension —
    registers, per-group BIGINT denominators, LC branch, and the
    accuracy bound all replicate per event_type."""
    m, k = 2048, 50
    return (
        "WITH h AS (SELECT event_type AS g, "
        "CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15) AS BIGINT) AS h "
        "FROM (SELECT DISTINCT event_type, user_id FROM events "
        "WHERE user_id IS NOT NULL AND event_type IS NOT NULL)), "
        f"bw AS (SELECT g, h % {m} AS bucket, h // {m} AS w FROM h), "
        f"reg AS (SELECT g, bucket, max(CASE WHEN w = 0 THEN {k} "
        "ELSE 1 + bit_count((w & -w) - 1) END) AS rho FROM bw GROUP BY g, bucket), "
        "agg AS (SELECT g, count(*) AS nonzero, "
        f"sum(CAST(1 AS BIGINT) << ({k} - rho)) AS s_nz FROM reg GROUP BY g), "
        f"st AS (SELECT g, CAST({m} AS INTEGER) AS m, CAST(nonzero AS BIGINT) AS nonzero, "
        f"CAST(coalesce(s_nz, 0) + ({m} - nonzero) * (CAST(1 AS BIGINT) << {k}) "
        "AS BIGINT) AS inv_sum_scaled FROM agg), "
        f"e AS (SELECT g, m, nonzero, inv_sum_scaled, "
        f"0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * {m}.0 * "
        f"CAST(CAST(1 AS BIGINT) << {k} AS DOUBLE) / inv_sum_scaled AS raw "
        "FROM st), "
        "est AS (SELECT g, m, nonzero, inv_sum_scaled, "
        f"CAST(CASE WHEN raw <= 2.5 * {m} AND (m - nonzero) > 0 "
        f"THEN round({m}.0 * ln({m}.0 / CAST(m - nonzero AS DOUBLE))) "
        "ELSE round(raw) END AS BIGINT) AS est FROM e) "
        "SELECT est.g AS event_type, m, nonzero, inv_sum_scaled, est, exact, "
        "abs(est - exact) <= 0.05 * exact AS within_5pct "
        "FROM est JOIN (SELECT event_type AS g, "
        "CAST(count(DISTINCT user_id) AS BIGINT) AS exact FROM events "
        "WHERE user_id IS NOT NULL AND event_type IS NOT NULL GROUP BY event_type) x "
        "ON x.g = est.g"
    )


@q("hll_distinct_users_per_type", _hll_grouped_oracle())
def hll_distinct_users_per_type(spark, sf_dir):
    """Per-group HyperLogLog (r12) — distinct users PER EVENT TYPE at
    CONSTANT per-group state (≤ 2^p register rows per group,
    mergeable across shards by per-(group, bucket) max), the
    curation-report cardinality shape where countDistinct-per-group
    carries answer-sized hash state. Same integer-exact register
    discipline as hll_distinct_users; the oracle replicates the
    grouped register pipeline + LC branch and the driver verifies
    sketch AND per-group accuracy bound."""
    from .functions.sketches import hll_build_grouped, hll_estimate_grouped

    ev = _t(spark, sf_dir, "events").select("event_type", "user_id")
    est = hll_estimate_grouped(
        hll_build_grouped(ev, "event_type", "user_id"), "event_type"
    )
    exact = (
        ev.filter(F.col("user_id").isNotNull() & F.col("event_type").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("bigint").alias("exact"))
    )
    return est.join(exact, "event_type").withColumn(
        "within_5pct", F.abs(F.col("est") - F.col("exact")) <= 0.05 * F.col("exact")
    )


def _bloom_oracle() -> str:
    """DuckDB twin of the FULL bloom pipeline: md5 positions, BIGINT
    word bitmap via bit_or, k-hit probe — exact deterministic
    equality (bit_or is idempotent/associative, so both engines
    build the identical bitmap regardless of order)."""
    mbits, k = 1 << 17, 4
    js = ", ".join(f"({i})" for i in range(k))
    url = "'https://ex.com/d/' || CAST(doc_id AS VARCHAR)"
    pos = (
        "CAST('0x' || substr(md5(CAST(j.j AS VARCHAR) || '|' || url), 1, 15) "
        f"AS BIGINT) % {mbits}"
    )
    return (
        f"WITH crawled AS (SELECT {url} AS url FROM documents WHERE doc_id % 3 <> 0), "
        f"pos AS (SELECT {pos} AS p FROM crawled, (VALUES {js}) j(j)), "
        "words AS (SELECT p // 63 AS word_idx, "
        "bit_or(CAST(1 AS BIGINT) << CAST(p % 63 AS INTEGER)) AS word "
        "FROM pos GROUP BY p // 63), "
        f"cand AS (SELECT doc_id, {url} AS url FROM documents), "
        f"cp AS (SELECT doc_id, {pos} AS p FROM cand, (VALUES {js}) j(j)), "
        "hits AS (SELECT cp.doc_id, sum(CASE WHEN (coalesce(w.word, 0) & "
        "(CAST(1 AS BIGINT) << CAST(cp.p % 63 AS INTEGER))) <> 0 "
        "THEN 1 ELSE 0 END) AS h FROM cp LEFT JOIN words w "
        "ON w.word_idx = cp.p // 63 GROUP BY cp.doc_id) "
        f"SELECT doc_id, h = {k} AS maybe_seen, doc_id % 3 <> 0 AS truly_seen "
        "FROM hits"
    )


@q("bloom_frontier_seen", _bloom_oracle())
def bloom_frontier_seen(spark, sf_dir):
    """Bloom-filter frontier dedup (r11 D-series) — "have we crawled
    this URL" as a BROADCAST probe instead of shuffling the
    candidate stream against the seen-set: the filter is a real
    bitmap in relational form (word_idx, 63-bit BIGINT word; ≤ ⌈m/63⌉ rows
    forever, bit_or-mergeable across shards), built over the crawled
    2/3 of the fixture URLs and probed by the full frontier. No
    false negatives by construction (every crawled URL's k bits are
    set); false positives at the standard rate — the safe direction
    for a frontier. The oracle replicates positions, bitmap, and the
    k-hit probe exactly; truly_seen rides along so the driver pins
    the no-false-negative direction too."""
    from pyspark import StorageLevel

    from .functions.sketches import bloom_build, bloom_probe

    d = _t(spark, sf_dir, "documents").select("doc_id")
    did = F.col("doc_id")
    url = F.concat(F.lit("https://ex.com/d/"), did.cast("string"))
    crawled = d.filter(did % 3 != 0).select(url.alias("url"))
    cand = d.select("doc_id", url.alias("url"))
    # caller-owned persist (the bloom_probe ownership contract): the
    # filter feeds k broadcast subtrees; process-lifetime cache is the
    # right scope for a DQ run
    bf = bloom_build(crawled, "url").persist(StorageLevel.MEMORY_AND_DISK)
    out = bloom_probe(cand, bf, "url")
    return out.select(
        "doc_id", "maybe_seen", (did % 3 != 0).alias("truly_seen")
    )


def _quantiles_oracle() -> str:
    """Independent oracle: the two-pass histogram machinery is NOT
    replicated — the expected answer is simply the value at global
    rank max(1, ceil(q*n)) over the sorted multiset (row_number
    form, deterministic even with ties)."""
    qs = [0.5, 0.9, 0.99]
    sel = " UNION ALL ".join(
        f"SELECT {q} AS q, (SELECT value FROM r WHERE rn = "
        f"greatest(1, CAST(ceil({q} * (SELECT n FROM c)) AS BIGINT))) AS value"
        for q in qs
    )
    return (
        "WITH v AS (SELECT value FROM events WHERE value IS NOT NULL "
        "AND isfinite(value)), "
        "c AS (SELECT count(*) AS n FROM v), "
        "r AS (SELECT value, row_number() OVER (ORDER BY value) AS rn FROM v) "
        + sel
    )


@q("quantiles_two_pass", _quantiles_oracle())
def quantiles_two_pass(spark, sf_dir):
    """Exact distributed quantiles (r11 D-series) — p50/p90/p99 of
    the events value column via the bounded-state two-pass shape
    (operators/quantiles.py): constant-size histogram pass, driver
    bucket probe, pushed-down pass-2 scan of ~n/1024 rows per
    target bucket, per-bucket row_number for the exact element. No
    global sort, no approx error. The oracle is INDEPENDENT: it
    sorts outright and reads the value at rank ceil(q*n) — any
    histogram/offset bug mismatches the value."""
    from .operators.quantiles import exact_quantiles_two_pass

    ev = _t(spark, sf_dir, "events").select("value")
    return exact_quantiles_two_pass(ev, "value", [0.5, 0.9, 0.99])


@q(
    "mojibake_repair",
    # independent expectation from fixture arithmetic: every class
    # converges to the clean ' café' suffix — class 0 because it
    # was never broken (precision: the repair must NOT touch it),
    # classes 1/2 because one/two decode passes unwind them
    "SELECT doc_id, text || ' café' AS fixed_text FROM documents",
)
def mojibake_repair(spark, sf_dir):
    """Mojibake repair (r11 D-series) — the cleaning step AFTER
    charset decode (R8): a correct decode of already-corrupted bytes
    cannot undo upstream UTF-8-as-cp1252 damage ('café' that some
    origin served as 'cafÃ©'). Fixture: each ASCII doc gains a
    suffix rotating clean ' café' (must pass through untouched —
    precision), singly-encoded ' cafÃ©' (one unwind), and
    doubly-encoded ' cafÃƒÂ©' (two unwinds). The repair is the
    round-trip-gated ftfy core in a split-path Arrow stage (ASCII
    rows never cross Python); the oracle is the INDEPENDENT
    expectation — every class converges to the same clean suffix, so
    any over- or under-repair breaks the hash."""
    from .functions.textops import repair_mojibake

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    did = F.col("doc_id")
    suffix = (
        F.when(did % 3 == 0, F.lit(" café"))
        .when(did % 3 == 1, F.lit(" cafÃ©"))
        .otherwise(F.lit(" cafÃƒÂ©"))
    )
    broken = d.select("doc_id", F.concat(F.col("text"), suffix).alias("text"))
    return repair_mojibake(broken).select(
        "doc_id", F.col("text").alias("fixed_text")
    )


def _moved_oracle() -> str:
    """Naive all-pairs twin: simhash every added and removed page
    (the 16-vote md5 pipeline of _simhash_oracle) and keep pairs
    with hamming <= 2 — deliberately IGNORING the engine's
    pigeonhole banding, so the driver verifies the banding loses no
    pair."""
    hexhi = "('8','9','a','b','c','d','e','f')"

    def votes(expr: str) -> str:
        return ", ".join(
            f"sum(CASE WHEN substr(md5('sh' || word), {j + 1}, 1) IN {hexhi} "
            f"THEN 1 ELSE -1 END) AS v{j}"
            for j in range(16)
        )

    bits = ", ".join(f"CASE WHEN v{j} > 0 THEN '1' ELSE '0' END" for j in range(16))
    ham = " + ".join(
        f"CASE WHEN substr(a.sh, {j + 1}, 1) <> substr(r.sh, {j + 1}, 1) "
        "THEN 1 ELSE 0 END"
        for j in range(16)
    )
    return (
        # added side: moved re-hosts (i%10=7, same text) + fresh extras
        # (i%10=3, text with an appended tail)
        "WITH addedt AS ("
        "SELECT 'https://ex.com/moved/' || CAST(doc_id AS VARCHAR) AS url, text "
        "FROM documents WHERE doc_id % 10 = 7 "
        "UNION ALL SELECT 'https://ex.com/extra/' || CAST(doc_id AS VARCHAR), "
        "text || ' fresh content xyz' FROM documents WHERE doc_id % 10 = 3), "
        "removedt AS (SELECT 'https://ex.com/d/' || CAST(doc_id AS VARCHAR) AS url, "
        "text FROM documents WHERE doc_id % 10 = 7), "
        "aw AS (SELECT url, unnest(string_split(text, ' ')) AS word FROM addedt), "
        f"av AS (SELECT url, {votes('a')} FROM aw GROUP BY url), "
        f"asim AS (SELECT url, concat({bits}) AS sh FROM av), "
        "rw AS (SELECT url, unnest(string_split(text, ' ')) AS word FROM removedt), "
        f"rv AS (SELECT url, {votes('r')} FROM rw GROUP BY url), "
        f"rsim AS (SELECT url, concat({bits}) AS sh FROM rv) "
        f"SELECT a.url AS new_url, r.url AS old_url, CAST({ham} AS INTEGER) AS hamming "
        f"FROM asim a, rsim r WHERE {ham} <= 2"
    )


@q("recrawl_moved_content", _moved_oracle())
def recrawl_moved_content(spark, sf_dir):
    """Moved-content detection across crawl generations (r11
    D-series): old gen holds every page at /d/i; in the new gen,
    every 10th-plus-7 page DISAPPEARS from /d/i and REAPPEARS with
    identical text at /moved/i, while every 10th-plus-3 page also
    gains a genuinely-new /extra/i variant (appended tail — the
    noise that must not pair unless simhash chance-collides, which
    both engines then agree on). moved_content_pairs computes
    added/removed via anti-joins, 16-bit simhashes, PIGEONHOLE
    banded candidates (hamming ≤ 2 ⇒ ≥1 of 3 bands equal — never an
    added×removed cross product) and exact hamming verify; the
    oracle runs the naive ALL-PAIRS filter, so the hash match
    proves banding completeness too."""
    from .functions.dedup import moved_content_pairs

    # _d, not _t (r17 triage sweep, 7.8 s): both generations' simhash
    # passes (16 md5-vote aggregates per doc) run before the first
    # shuffle — single-task on the local one-split file without the
    # conditional respread.
    d = _d(spark, sf_dir).select("doc_id", "text")
    did = F.col("doc_id")
    old_gen = d.select(
        F.concat(F.lit("https://ex.com/d/"), did.cast("string")).alias("url"),
        "text",
    )
    new_gen = (
        d.filter(did % 10 != 7)
        .select(
            F.concat(F.lit("https://ex.com/d/"), did.cast("string")).alias("url"),
            "text",
        )
        .unionByName(
            d.filter(did % 10 == 7).select(
                F.concat(F.lit("https://ex.com/moved/"), did.cast("string")).alias("url"),
                "text",
            )
        )
        .unionByName(
            d.filter(did % 10 == 3).select(
                F.concat(F.lit("https://ex.com/extra/"), did.cast("string")).alias("url"),
                F.concat(F.col("text"), F.lit(" fresh content xyz")).alias("text"),
            )
        )
    )
    return moved_content_pairs(old_gen, new_gen)


_CDC_CUT = (
    "list_filter(range(16, len(text)), i -> "
    "CAST('0x' || substr(md5(substr(text, i - 15, 16)), 1, 15) AS BIGINT) "
    "% 64 = 0)"
)

@q(
    "chunk_content_defined",
    "WITH c AS (SELECT doc_id, text, "
    f"list_concat(list_concat([CAST(0 AS BIGINT)], {_CDC_CUT}), "
    "[CAST(len(text) AS BIGINT)]) AS b "
    "FROM documents WHERE text IS NOT NULL) "
    "SELECT doc_id, CAST(t.i - 1 AS INTEGER) AS chunk_idx, "
    "substr(text, b[t.i] + 1, b[t.i + 1] - b[t.i]) AS chunk_text, "
    "md5(substr(text, b[t.i] + 1, b[t.i + 1] - b[t.i])) AS chunk_md5 "
    "FROM c, unnest(generate_series(1, len(b) - 1)) AS t(i)",
)
def chunk_content_defined(spark, sf_dir):
    """Content-defined chunking (r11 D-series) — the FastCDC/rsync
    boundary rule as pure JVM higher-order functions: cut after
    position i when md5 of the trailing 16 chars ≡ 0 mod 64
    (expected 64-char chunks). The dedup property fixed-stride
    chunking lacks: boundaries depend only on LOCAL content, so an
    edit early in a document re-fingerprints one chunk, not the
    whole tail (pinned in pytest: 48/49 chunk hashes survive a
    front insertion). Zero Python — sequence → filter → transform →
    posexplode over the scan (the only exchange is the conditional
    input respread, identity at cluster scale); the oracle
    replicates the boundary pipeline with DuckDB list lambdas."""
    from .functions.textops import chunk_content_defined as cdc

    # _d, not _t (r17 triage sweep): the boundary-hash HOFs evaluate
    # ~len(text) interpreted md5 expressions per doc, all BEFORE any
    # shuffle — on the local single-split file that ran in ONE task
    # (73.7 s at sf0.1). spread_scan restores scan-stage parallelism
    # and is the identity at cluster scale (guide §2.5 input skew).
    d = _d(spark, sf_dir).select("doc_id", "text")
    return cdc(d)


@q(
    "doc_winnow_fingerprints",
    "WITH g AS (SELECT doc_id, list_transform("
    "range(1, greatest(len(text) - 7, 1) + 1), "
    "i -> md5(substr(text, CAST(i AS INTEGER), 8))) AS grams "
    "FROM documents WHERE text IS NOT NULL), "
    "sel AS (SELECT doc_id, list_distinct(list_transform("
    "range(1, greatest(len(grams) - 7, 1) + 1), "
    "j -> list_min(grams[CAST(j AS INTEGER):CAST(j + 7 AS INTEGER)]))) AS fps "
    "FROM g) "
    "SELECT doc_id, unnest(fps) AS fp FROM sel",
)
def doc_winnow_fingerprints(spark, sf_dir):
    """Winnowing fingerprints (r11 D-series) — the MOSS selection:
    md5 every 8-char gram, keep each 8-window's minimum, dedupe.
    Guarantees any shared substring ≥ 15 chars between two docs
    shares ≥1 fingerprint at ~2/9 gram density — the principled
    middle ground between one global min (fingerprint_rolling) and
    full shingling. Pure JVM higher-order functions; the oracle
    replicates grams → sliding list_min → distinct with DuckDB list
    lambdas."""
    from .functions.textops import winnow_fingerprints

    # _d, not _t: same single-task trap as chunk_content_defined but
    # worse — per doc, ~n grams hash PLUS ~n sliding array_min(8)
    # windows, all interpreted HOF lambdas before any shuffle (the
    # r17 triage sweep clocked the un-spread shape in the minutes).
    d = _d(spark, sf_dir).select("doc_id", "text")
    return winnow_fingerprints(d)


def _pctl_filter_oracle() -> str:
    """Quality CTE (the text_quality_score twin) + lang, per-language
    exact p25 threshold by window rank (type-1 quantile — the VALUE
    at rank ceil(0.25·n), well-defined under score ties), then the
    survivor filter."""
    return (
        "WITH b AS (SELECT doc_id, lang, length(text) AS n_chars0, "
        "len(string_split(text, ' ')) AS n_words, "
        "len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct, "
        "len(regexp_extract_all(text, '\\b(the|a|of|and|to|in)\\b')) AS n_stop "
        "FROM documents), "
        "r AS (SELECT doc_id, lang, "
        "round(n_stop / greatest(n_words, 1), 6) AS stop_ratio, "
        "round(n_punct / greatest(n_chars0, 1), 6) AS punct_ratio, n_words FROM b), "
        "s AS (SELECT doc_id, lang, "
        "round(least(1.0, n_words / 100.0) * 0.5 + least(1.0, stop_ratio * 5.0) * 0.4 "
        "+ (1.0 - least(1.0, punct_ratio * 10.0)) * 0.1, 6) AS quality_score FROM r), "
        "rk AS (SELECT lang, quality_score, "
        "row_number() OVER (PARTITION BY lang ORDER BY quality_score) AS rn, "
        "count(*) OVER (PARTITION BY lang) AS n FROM s), "
        "th AS (SELECT lang, quality_score AS th FROM rk "
        "WHERE rn = greatest(1, CAST(ceil(0.25 * n) AS BIGINT))) "
        "SELECT s.doc_id, s.lang, s.quality_score, th.th AS lang_p25 "
        "FROM s JOIN th ON th.lang = s.lang WHERE s.quality_score >= th.th"
    )


@q("quality_percentile_filter", _pctl_filter_oracle())
def quality_percentile_filter(spark, sf_dir):
    """Percentile-thresholded curation capstone (r12) — drop the
    worst quality quartile PER LANGUAGE, the standard corpus-curation
    move where an absolute threshold would gut low-resource
    languages: quality scores (X-series blend, 6dp-stable) feed
    ``exact_group_quantiles`` for each language's EXACT p25 (type-1,
    no approx error — an approx threshold would flap survivors at
    the boundary), the 1-row-per-language threshold table broadcasts
    back, and survivors are an engine-stable >= filter. Composition
    of two already-oracled operators in one plan; the oracle rebuilds
    score + window-rank threshold + filter independently."""
    from .functions import textops as T
    from .operators.quantiles import exact_group_quantiles

    # _d, not _t (r17 triage sweep, 9.6 s): the per-doc regex battery
    # runs pre-shuffle and is referenced by both the threshold probe
    # and the survivor join — single-task twice without the respread.
    d = _d(spark, sf_dir).select("doc_id", "lang", "text")
    scored = T.text_quality(d, "text").select("doc_id", "lang", "quality_score")
    th = exact_group_quantiles(scored, "lang", "quality_score", [0.25]).select(
        "lang", F.col("value").alias("lang_p25")
    )
    return (
        scored.join(F.broadcast(th), "lang")
        .filter(F.col("quality_score") >= F.col("lang_p25"))
        .select("doc_id", "lang", "quality_score", "lang_p25")
    )


@q(
    "quantiles_per_group",
    "WITH v AS (SELECT lang, value FROM ("
    "SELECT lang, CAST(length(text) AS DOUBLE) AS value FROM documents) "
    "WHERE value IS NOT NULL AND isfinite(value)), "
    "r AS (SELECT lang, value, row_number() OVER "
    "(PARTITION BY lang ORDER BY value) AS rn, "
    "count(*) OVER (PARTITION BY lang) AS n FROM v) "
    "SELECT lang, q.q, value FROM r JOIN (VALUES (0.5), (0.9), (0.99)) q(q) "
    "ON rn = greatest(1, CAST(ceil(q.q * n) AS BIGINT))",
)
def quantiles_per_group(spark, sf_dir):
    """Per-group exact quantiles (r11 D-series) — p50/p90/p99 of
    document length PER LANGUAGE, the standard curation report:
    one window over the group partition (rank + count share the
    sort), broadcast qs join picks the element at rank ceil(q·n_g).
    Exact, no approx error; the oracle replicates the rank pick
    with the same window arithmetic."""
    from .operators.quantiles import exact_group_quantiles

    d = _t(spark, sf_dir, "documents").select(
        "lang", F.length("text").cast("double").alias("doc_len")
    )
    return exact_group_quantiles(d, "lang", "doc_len", [0.5, 0.9, 0.99])


# =====================================================================
# r13 W-series: second crawl-centrality signal + corpus co-occurrence
# =====================================================================


def _hits_oracle(iters: int = 3) -> str:
    """Unrolled integer HITS twin — the _pagerank_oracle discipline:
    same pseudo-graph, same micro-unit L1 normalization as
    functions/graph.py::hits_scores, bit-identical by construction."""
    parts = [
        "WITH n AS (SELECT count(*) AS c FROM documents), "
        "e AS (SELECT DISTINCT doc_id AS src, "
        "(doc_id * 7 + 13 * j.j) % n.c AS dst "
        "FROM documents, n, (VALUES (1), (2), (3)) j(j)), "
        "nodes AS (SELECT DISTINCT src AS node FROM e "
        "UNION SELECT DISTINCT dst FROM e), "
        # seed 1, not 1e6: normalization is scale-invariant and the
        # micro seed would overflow int64 at crawl-scale in-degrees
        "h0 AS (SELECT node, CAST(1 AS BIGINT) AS h FROM nodes)"
    ]
    for t in range(1, iters + 1):
        prev_h = f"h{t - 1}"
        parts.append(
            f", ra{t} AS (SELECT e.dst AS node, sum(p.h) AS raw "
            f"FROM e JOIN {prev_h} p ON p.node = e.src GROUP BY e.dst)"
            f", sa{t} AS (SELECT sum(raw) AS s FROM ra{t})"
            f", a{t} AS (SELECT nodes.node, CAST(coalesce("
            f"(ra{t}.raw * 1000000) // sa{t}.s, 0) AS BIGINT) AS a "
            f"FROM nodes LEFT JOIN ra{t} ON ra{t}.node = nodes.node, sa{t})"
            f", rh{t} AS (SELECT e.src AS node, sum(p.a) AS raw "
            f"FROM e JOIN a{t} p ON p.node = e.dst GROUP BY e.src)"
            f", sh{t} AS (SELECT sum(raw) AS s FROM rh{t})"
            f", h{t} AS (SELECT nodes.node, CAST(coalesce("
            f"(rh{t}.raw * 1000000) // sh{t}.s, 0) AS BIGINT) AS h "
            f"FROM nodes LEFT JOIN rh{t} ON rh{t}.node = nodes.node, sh{t})"
        )
    parts.append(
        f" SELECT h{iters}.node, h{iters}.h AS hub_micros, "
        f"a{iters}.a AS auth_micros FROM h{iters} "
        f"JOIN a{iters} ON a{iters}.node = h{iters}.node"
    )
    return "".join(parts)


@q("crawl_hits_scores", _hits_oracle())
def crawl_hits_scores(spark, sf_dir):
    """HITS hubs & authorities (r13 W-series) — the complementary
    crawl-centrality signal to crawl_pagerank: a hub page (links to
    many authorities) is the frontier-DISCOVERY asset PageRank
    underscores; CC-style crawl schedulers track both. Three exact
    integer iterations of functions/graph.py::hits_scores over the
    same deterministic 3-out-edges pseudo-graph as crawl_pagerank
    (dst = (src*7 + 13j) mod |docs|, parallel edges collapsed) —
    every score BIGINT micro-units, every L1 normalization an
    integer division by the 1-row broadcast total, so the DuckDB
    twin unrolling the identical rounds hash-matches bit-for-bit.
    2 shuffles per half-round over a persisted edge list."""
    from .functions.graph import hits_scores

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    edges = (
        d.join(F.broadcast(n_row))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            "__n",
        )
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 13 * F.col("j")) % F.col("__n")).alias("dst"),
        )
    )
    handles: list = []
    return _materialized(
        hits_scores(edges, iters=3, cache_handles=handles), handles
    )


@q(
    "pmi_bigram_collocations",
    "WITH w AS (SELECT list_filter(regexp_split_to_array(lower(text), "
    "'[^a-z0-9]+'), x -> len(x) > 0) AS ws FROM documents), "
    "un AS (SELECT t, count(*) AS c FROM "
    "(SELECT unnest(ws) AS t FROM w) GROUP BY t), "
    "nu AS (SELECT sum(c) AS n FROM un), "
    "pr AS (SELECT unnest(list_transform(range(1, len(ws)), "
    "i -> struct_pack(w1 := ws[CAST(i AS INTEGER)], "
    "w2 := ws[CAST(i + 1 AS INTEGER)]))) AS p FROM w WHERE len(ws) >= 2), "
    "bi AS (SELECT p.w1 AS w1, p.w2 AS w2, count(*) AS c FROM pr "
    "GROUP BY p.w1, p.w2), "
    "nb AS (SELECT sum(c) AS n FROM bi) "
    "SELECT bi.w1, bi.w2, CAST(bi.c AS BIGINT) AS n_pair, "
    "CAST(round(ln((CAST(bi.c AS DOUBLE) * nu.n * nu.n) / "
    "(CAST(nb.n AS DOUBLE) * a.c * b.c)) * 1000000.0) AS BIGINT) AS pmi_micros "
    "FROM bi JOIN un a ON a.t = bi.w1 JOIN un b ON b.t = bi.w2, nu, nb "
    "WHERE bi.c >= 5",
)
def pmi_bigram_collocations(spark, sf_dir):
    """Corpus collocation mining (r13 W-series) — PMI of adjacent
    token pairs over the documents table, the standard phrase-mining
    / tokenizer-merge-audit report (functions/textops.py::
    pmi_bigrams): one tokenize pass, JVM zip_with bigrams (no
    positional self-join), two partial-agg count shuffles, 1-row
    broadcast totals, ln-micros from exact integer counts with the
    BM25 cross-engine float discipline. The DuckDB twin rebuilds
    counts AND the exact double expression shape, so the hash
    certifies tokenization, pairing, counting, and the PMI
    arithmetic together."""
    from .functions.textops import pmi_bigrams

    return pmi_bigrams(_d(spark, sf_dir), "text", min_count=5)



# =====================================================================
# data-quality expectation gate (round 14 Y-series)
# =====================================================================

_EXPECT_ORACLE = (
    "WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total, "
    "CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0, "
    "CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS v1, "
    "CAST(count(o_custkey) - count(DISTINCT o_custkey) AS BIGINT) AS v2, "
    "CAST(sum(CASE WHEN o_totalprice IS NOT NULL AND "
    "(o_totalprice < 0 OR o_totalprice > 300000) THEN 1 ELSE 0 END) AS BIGINT) AS v3, "
    "CAST(sum(CASE WHEN o_orderpriority IS NOT NULL AND "
    "NOT regexp_matches(o_orderpriority, '^[1-5]-') THEN 1 ELSE 0 END) AS BIGINT) AS v4, "
    "CAST(sum(CASE WHEN o_orderstatus IS NOT NULL AND "
    "o_orderstatus NOT IN ('O', 'F') THEN 1 ELSE 0 END) AS BIGINT) AS v5 "
    "FROM orders) "
    "SELECT 'not_null(o_custkey)' AS rule, v0 AS violations, total, v0 = 0 AS ok FROM t "
    "UNION ALL SELECT 'unique(o_orderkey)', v1, total, v1 = 0 FROM t "
    "UNION ALL SELECT 'unique(o_custkey)', v2, total, v2 = 0 FROM t "
    "UNION ALL SELECT 'range(o_totalprice,0,300000)', v3, total, v3 = 0 FROM t "
    "UNION ALL SELECT 'regex(o_orderpriority,^[1-5]-)', v4, total, v4 = 0 FROM t "
    "UNION ALL SELECT 'accepted_values(o_orderstatus,[O,F])', v5, total, v5 = 0 FROM t "
    "UNION ALL SELECT 'min_rows(100)', "
    "CAST(CASE WHEN total < 100 THEN 1 ELSE 0 END AS BIGINT), total, total >= 100 FROM t "
    "UNION ALL SELECT 'min_rows(10000000)', "
    "CAST(CASE WHEN total < 10000000 THEN 1 ELSE 0 END AS BIGINT), total, "
    "total >= 10000000 FROM t"
)


@q("dq_expectations", _EXPECT_ORACLE)
def dq_expectations(spark, sf_dir):
    """Data-quality expectation gate (r14 Y-series): eight
    declarative rules over the orders fact — null check, two exact
    uniqueness checks (one passing on the key, one failing on the
    repeated customer fk, so the Expand-planned distinct path is
    exercised in both verdicts), a range rule that real rows violate,
    an anchored-regex rule, an accepted-values rule that catches the
    'P' status, and a passing + failing min_rows pair — ALL evaluated
    in ONE aggregation pass (`expectations.expect_report`). The hash
    certifies violation counts, totals, and ok verdicts together."""
    from .functions.expectations import expect_report

    orders = _t(spark, sf_dir, "orders")
    return expect_report(
        orders,
        [
            {"rule": "not_null", "col": "o_custkey"},
            {"rule": "unique", "col": "o_orderkey"},
            {"rule": "unique", "col": "o_custkey"},
            {"rule": "range", "col": "o_totalprice", "lo": 0, "hi": 300000},
            {"rule": "regex", "col": "o_orderpriority", "pattern": "^[1-5]-"},
            {"rule": "accepted_values", "col": "o_orderstatus", "values": ["O", "F"]},
            {"rule": "min_rows", "n": 100},
            {"rule": "min_rows", "n": 10000000},
        ],
    )


# =====================================================================
# unicode normalization (round 14 Y-series)
# =====================================================================

_NFC_SUFFIX_SQL = (
    "'re' || chr(769) || 'sume' || chr(769) || ' | n a' || chr(776) "
    "|| ' o' || chr(770) || ' u' || chr(768)"
)


@q(
    "unicode_nfc_normalize",
    "WITH fix AS (SELECT doc_id, substr(text, 1, 40) || "
    + _NFC_SUFFIX_SQL
    + " AS s FROM documents) "
    "SELECT doc_id, nfc_normalize(s) AS text_nfc, "
    "CAST(length(s) AS BIGINT) AS len_raw, "
    "CAST(length(nfc_normalize(s)) AS BIGINT) AS len_nfc "
    "FROM fix",
)
def unicode_nfc_normalize(spark, sf_dir):
    """Unicode NFC normalization (r14 Y-series): the canonical-form
    pass hash-keyed dedup needs — decomposed 'e'+COMBINING-ACUTE and
    composed 'é' are different md5 keys until normalized, so an
    un-normalized crawl silently under-deduplicates. The fixture
    appends a decomposed suffix (five combining marks: acute,
    diaeresis, circumflex, grave) to every document; the engine's
    Arrow-batched Python unicodedata pass must agree with DuckDB's
    utf8proc nfc_normalize BOTH on the composed text and on the
    codepoint-count contraction (len_raw - len_nfc == 5 per row) —
    two independent UAX #15 implementations pinned equal."""
    from .functions.textops import unicode_normalize

    d = _d(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 40),
            F.lit("re\u0301sume\u0301 | n a\u0308 o\u0302 u\u0300"),
        ).alias("s"),
    )
    return d.select(
        "doc_id",
        unicode_normalize(F.col("s")).alias("text_nfc"),
        F.length("s").cast("bigint").alias("len_raw"),
        F.length(unicode_normalize(F.col("s"))).cast("bigint").alias("len_nfc"),
    )


@q(
    "dedup_exact_normalized",
    "WITH fix AS ("
    "SELECT doc_id, substr(text, 1, 60) || "
    "(CASE WHEN doc_id % 2 = 0 THEN 'e' || chr(769) ELSE chr(233) END) "
    "|| CAST(doc_id // 10 AS VARCHAR) AS s "
    "FROM documents WHERE doc_id < 200), "
    "keyed AS (SELECT doc_id, md5(nfc_normalize(s)) AS h FROM fix), "
    "g AS (SELECT h, CAST(count(*) AS BIGINT) AS group_size, "
    "CAST(min(doc_id) AS BIGINT) AS keep_id FROM keyed GROUP BY h) "
    "SELECT k.doc_id, g.group_size, g.keep_id, "
    "CAST(k.doc_id = g.keep_id AS BOOLEAN) AS is_survivor "
    "FROM keyed k JOIN g ON k.h = g.h",
)
def dedup_exact_normalized(spark, sf_dir):
    """Composition DQ (r14 Y-series): exact dedup over NFC-NORMALIZED
    keys — the reason unicode_normalize exists. Fixture: adjacent
    docs (doc_id//10 buckets) get byte-DIFFERENT but canonically-
    EQUAL suffixes (even ids: 'e'+COMBINING ACUTE; odd ids: composed
    'é'), so md5-on-raw-text sees ~2 groups per bucket while
    md5-on-NFC sees one — the under-deduplication un-normalized
    corpora silently suffer, made measurable. Engine: Arrow
    unicodedata pass → md5 → one groupBy + join-back (the
    exact_dedup_groups shape with survivor decision). The hash
    certifies normalization, keying, group sizes and min-id survivor
    pick together against DuckDB's independent utf8proc pipeline."""
    from .functions.textops import unicode_normalize

    d = _d(spark, sf_dir).filter(F.col("doc_id") < 200)
    fix = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 60),
            F.when(F.col("doc_id") % 2 == 0, F.lit("é")).otherwise(
                F.lit("é")
            ),
            (F.col("doc_id") / 10).cast("int").cast("string"),
        ).alias("s"),
    )
    keyed = fix.select(
        "doc_id", F.md5(unicode_normalize(F.col("s"))).alias("h")
    )
    g = keyed.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("group_size"),
        F.min("doc_id").cast("bigint").alias("keep_id"),
    )
    return keyed.join(g, "h").select(
        "doc_id",
        "group_size",
        "keep_id",
        (F.col("doc_id") == F.col("keep_id")).alias("is_survivor"),
    )


# =====================================================================
# round-14 wave-4 Z-series: graph structure, product analytics,
# record linkage
# =====================================================================


@q(
    "graph_triangle_count",
    "WITH n AS (SELECT count(*) AS c FROM documents), "
    "raw AS (SELECT DISTINCT doc_id AS s, (doc_id * 7 + 13 * j.j) % n.c AS d "
    "FROM documents, n, (VALUES (1), (2), (3)) j(j)), "
    "e AS (SELECT DISTINCT least(s, d) AS u, greatest(s, d) AS v "
    "FROM raw WHERE s <> d), "
    "t AS (SELECT a.u AS x, a.v AS y, b.v AS z FROM e a "
    "JOIN e b ON b.u = a.v JOIN e c ON c.u = a.u AND c.v = b.v), "
    "corners AS (SELECT x AS node FROM t UNION ALL SELECT y FROM t "
    "UNION ALL SELECT z FROM t) "
    "SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM corners GROUP BY node",
)
def graph_triangle_count(spark, sf_dir):
    """Per-node triangle participation (round-14 Z-series) — the
    local-clustering crawl signal separating organic neighborhoods
    from link-farm cliques (functions/graph.py::triangle_count,
    degree-ordered node-iterator: every triangle counted exactly
    once at its lowest-(degree, id) corner, wedge fan-out bounded by
    the O(sqrt(m)) oriented out-degree). Same deterministic 3-out
    pseudo-graph as crawl_pagerank / crawl_hits_scores; the DuckDB
    twin enumerates x<y<z corner triples over the canonical
    undirected edge set — a different orientation of the SAME
    triangle set, so the hash certifies undirection, orientation,
    wedge closure, and the corner fan-out together."""
    from .functions.graph import triangle_count

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    edges = (
        d.join(F.broadcast(n_row))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            "__n",
        )
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 13 * F.col("j")) % F.col("__n")).alias("dst"),
        )
    )
    handles: list = []
    return _materialized(
        triangle_count(edges, cache_handles=handles), handles
    )


@q(
    "cohort_retention_weekly",
    "WITH f AS (SELECT user_id, date_trunc('week', min(ts)) AS cw "
    "FROM events GROUP BY user_id), "
    "a AS (SELECT DISTINCT e.user_id, f.cw, "
    "CAST(datediff('day', f.cw, date_trunc('week', e.ts)) // 7 AS INTEGER) AS wo "
    "FROM events e JOIN f ON f.user_id = e.user_id) "
    "SELECT strftime(CAST(cw AS DATE), '%Y-%m-%d') AS cohort_week, "
    "wo AS week_offset, "
    "CAST(count(*) AS BIGINT) AS n_users FROM a GROUP BY cw, wo",
)
def cohort_retention_weekly(spark, sf_dir):
    """Weekly cohort-retention matrix (round-14 Z-series) — the
    return-rate readout funnel_conversion doesn't cover
    (operators/relational.py::cohort_retention: per-user min-ts agg,
    exchange-reusing join back, distinct-(cohort, offset, user)
    count — 3 shuffles, no event-scale window). Monday-truncated
    weeks in both engines; offsets are exact multiples of 7 days so
    the integer division is lossless cross-engine. cohort_week rides
    as a yyyy-MM-dd string (the repo's cross-engine date parity
    convention — DATE surfaces as date-vs-Timestamp across the two
    pandas bridges)."""
    from .operators.relational import cohort_retention

    out = cohort_retention(_t(spark, sf_dir, "events"))
    return out.select(
        F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
        "week_offset",
        "n_users",
    )


@q(
    "markov_transitions",
    "WITH p AS (SELECT event_type AS ft, lead(event_type) OVER "
    "(PARTITION BY user_id ORDER BY ts, event_id) AS tt FROM events), "
    "c AS (SELECT ft, tt, CAST(count(*) AS BIGINT) AS n FROM p "
    "WHERE tt IS NOT NULL GROUP BY ft, tt) "
    "SELECT ft AS from_type, tt AS to_type, n, "
    "CAST((n * 1000000) // sum(n) OVER (PARTITION BY ft) AS BIGINT) AS p_micros "
    "FROM c",
)
def markov_transitions(spark, sf_dir):
    """First-order Markov next-event matrix (round-14 Z-series) —
    (from, to, n, conditional-probability micros) over each user's
    (ts, event_id)-ordered stream (operators/relational.py::
    transition_matrix: ONE event-scale window + count agg; the
    row normalization is a window over the |types|² matrix, free).
    Integer-micros division keeps the hash exact cross-engine; the
    event_id tiebreak makes equal-timestamp ordering deterministic,
    which the oracle mirrors."""
    from .operators.relational import transition_matrix

    return transition_matrix(_t(spark, sf_dir, "events"))


@q(
    "er_fuzzy_blocked",
    "WITH p AS (SELECT p_partkey, p_name FROM part WHERE length(p_name) >= 6), "
    "c AS (SELECT p_partkey AS c_key, concat("
    "substr(p_name, 1, CAST(2 + p_partkey % (length(p_name) - 2) AS INTEGER)), "
    "substr(p_name, CAST(4 + p_partkey % (length(p_name) - 2) AS INTEGER))"
    ") AS c_name FROM p), "
    "m AS (SELECT c.c_key, c.c_name, p.p_partkey AS match_key, "
    "levenshtein(c.c_name, p.p_name) AS dist FROM c JOIN p ON "
    "substr(c.c_name, 1, 2) = substr(p.p_name, 1, 2) AND "
    "abs(length(c.c_name) - length(p.p_name)) <= 1 "
    "WHERE levenshtein(c.c_name, p.p_name) <= 1), "
    "r AS (SELECT m.*, row_number() OVER (PARTITION BY c_key "
    "ORDER BY dist, match_key) AS rn FROM m) "
    "SELECT c_key, c_name, match_key, CAST(dist AS INTEGER) AS dist "
    "FROM r WHERE rn = 1",
)
def er_fuzzy_blocked(spark, sf_dir):
    """Blocked fuzzy entity resolution (round-14 Z-series) — the
    record-linkage primitive in edit-distance space (functions/
    dedup.py::fuzzy_join_blocked: (prefix, length-band) equi-join
    blocking, JVM levenshtein verify inside blocks only — never the
    n² cross product). Fixture: every part name (len ≥ 6) gets a
    deterministic one-char-deletion twin (position 3 +
    key % (len-2), so the 2-char block prefix provably survives and
    the blocking is COMPLETE for the planted edits); each twin is
    resolved back against the clean catalog, best match = (min dist,
    min key). The oracle applies the IDENTICAL block + verify + pick
    in SQL, certifying corruption, blocking completeness, the
    levenshtein verify, and the deterministic tie-break in one
    hash."""
    from .functions.dedup import fuzzy_join_blocked
    from .sources.catalog import spread_scan

    # spread_scan (r17 triage sweep, 40 s isolated): the probe side of
    # the block join is the bare one-split part scan and the length
    # fan-out side broadcasts, so the WHOLE 32M-pair block expansion +
    # levenshtein verify ran in ONE task. Identity at cluster scale.
    p = spread_scan(_t(spark, sf_dir, "part")).where(F.length("p_name") >= 6)
    d_off = "p_partkey % (length(p_name) - 2)"
    corrupt = p.select(
        F.col("p_partkey").alias("c_key"),
        F.expr(
            f"concat(substr(p_name, 1, cast(2 + {d_off} as int)), "
            f"substr(p_name, cast(4 + {d_off} as int)))"
        ).alias("c_name"),
    )
    clean = p.select("p_partkey", "p_name")
    m = fuzzy_join_blocked(corrupt, clean, "c_name", "p_name", max_dist=1)
    # best-match pick as a partial-aggregatable min(struct) instead of
    # a row_number window (r17 guide §2.3 "aggregate before you
    # shuffle"): the TPCH name vocabulary makes the verified pair set
    # ~6.3M rows at sf0.1, and the window shuffled + sorted ALL of
    # them; lexicographic min(struct(dist, match_key)) is exactly the
    # (dist ASC, match_key ASC) rank-1 row and map-side partial agg
    # cuts the exchange to one row per (c_key, partition). c_name is
    # functionally determined by c_key (one corrupt row per key), so
    # grouping on both keeps it without changing the groups.
    return (
        m.groupBy("c_key", "c_name")
        .agg(
            F.min(
                F.struct(
                    F.col("dist").cast("int").alias("dist"),
                    F.col("p_partkey").alias("match_key"),
                )
            ).alias("__best")
        )
        .select(
            "c_key",
            "c_name",
            F.col("__best.match_key").alias("match_key"),
            F.col("__best.dist").alias("dist"),
        )
    )


def _hyperball_oracle(radius: int = 3) -> str:
    """Unrolled DuckDB twin of the FULL HyperBall pipeline — the
    _pagerank_oracle/_hits_oracle discipline applied to a sketch
    algorithm: registers (the _hll_oracle idiom), the per-round
    merge-along-edges, the group-wise estimate, and the clamped
    integer-micros harmonic sum all replicate round by round, so the
    hash certifies the ENTIRE approximate computation, not a
    tolerance band around it."""
    m, sat = 2048, 50  # p=11; rho saturates at 60-11+1
    est = (
        "{name} AS (SELECT node, CAST(CASE WHEN raw <= 2.5 * {m} AND "
        "({m} - nonzero) > 0 THEN round({m}.0 * ln({m}.0 / "
        "CAST({m} - nonzero AS DOUBLE))) ELSE round(raw) END AS BIGINT) AS est "
        "FROM (SELECT node, nonzero, 0.7213 / (1.0 + 1.079 / {m}.0) * {m}.0 * "
        "{m}.0 * CAST(CAST(1 AS BIGINT) << {sat} AS DOUBLE) / inv AS raw "
        "FROM (SELECT node, count(*) AS nonzero, "
        "CAST(coalesce(sum(CAST(1 AS BIGINT) << ({sat} - rho)), 0) + "
        "({m} - count(*)) * (CAST(1 AS BIGINT) << {sat}) AS BIGINT) AS inv "
        "FROM {src} GROUP BY node)))"
    )
    parts = [
        "WITH n AS (SELECT count(*) AS c FROM documents), "
        "e AS (SELECT DISTINCT doc_id AS u, (doc_id * 7 + 13 * j.j) % n.c AS v "
        "FROM documents, n, (VALUES (1), (2), (3)) j(j)), "
        "nodes AS (SELECT u AS node FROM e UNION SELECT v FROM e), "
        "s0 AS (SELECT node, CAST(h % {m} AS INTEGER) AS bucket, "
        "CAST(CASE WHEN h // {m} = 0 THEN {sat} ELSE 1 + "
        "bit_count(((h // {m}) & -(h // {m})) - 1) END AS INTEGER) AS rho "
        "FROM (SELECT node, CAST('0x' || substr(md5(CAST(node AS VARCHAR)), 1, 15) "
        "AS BIGINT) AS h FROM nodes)), ".format(m=m, sat=sat),
        est.format(name="e0", src="s0", m=m, sat=sat),
    ]
    for r in range(1, radius + 1):
        parts.append(
            ", s{r} AS (SELECT node, bucket, max(rho) AS rho FROM ("
            "SELECT node, bucket, rho FROM s{pr} UNION ALL "
            "SELECT e.v AS node, s.bucket, s.rho FROM s{pr} s "
            "JOIN e ON s.node = e.u) GROUP BY node, bucket), ".format(
                r=r, pr=r - 1
            )
        )
        parts.append(est.format(name=f"e{r}", src=f"s{r}", m=m, sat=sat))
    terms = " + ".join(
        f"(greatest(e{r}.est - e{r - 1}.est, CAST(0 AS BIGINT)) * 1000000) // {r}"
        for r in range(1, radius + 1)
    )
    joins = " ".join(
        f"JOIN e{r} ON e{r}.node = e0.node" for r in range(1, radius + 1)
    )
    parts.append(
        f" SELECT e0.node, e{radius}.est AS reach_est, "
        f"CAST({terms} AS BIGINT) AS harmonic_micros FROM e0 {joins}"
    )
    return "".join(parts)


@q("crawl_harmonic_centrality", _hyperball_oracle())
def crawl_harmonic_centrality(spark, sf_dir):
    """Approximate truncated harmonic centrality via HyperBall
    (round-14 Z-series) — THE Common Crawl frontier-ranking signal
    (Boldi & Vigna WWW'13), closing the centrality trio this module
    opened with PageRank and HITS (functions/graph.py::
    harmonic_centrality): each node's reachable-ball is 2^11 HLL
    registers from sketches.py's integer-exact md5 substrate, each
    round is one equi-join + per-(node, bucket) max (sketch union IS
    register max — the pagerank iteration shape), estimates are the
    group-wise fixed-order HLL expression, and the harmonic sum is
    clamped BIGINT micros. Because every step is deterministic
    relational algebra, the DuckDB twin unrolls the IDENTICAL three
    rounds — registers, merges, estimates, micros — and the hash
    certifies the whole approximate pipeline bit-for-bit. Same
    deterministic 3-out pseudo-graph as crawl_pagerank /
    crawl_hits_scores, mode='in' (link-authority direction)."""
    from .functions.graph import harmonic_centrality

    d = _t(spark, sf_dir, "documents").select("doc_id")
    n_row = d.agg(F.count(F.lit(1)).alias("__n"))
    edges = (
        d.join(F.broadcast(n_row))
        .select(
            "doc_id",
            F.explode(F.array(F.lit(1), F.lit(2), F.lit(3))).alias("j"),
            "__n",
        )
        .select(
            F.col("doc_id").alias("src"),
            ((F.col("doc_id") * 7 + 13 * F.col("j")) % F.col("__n")).alias("dst"),
        )
    )
    return harmonic_centrality(edges, radius=3, p=11, mode="in")


_LM_TOK = (
    "list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), "
    "x -> len(x) > 0)"
)


@q(
    "quality_lm_logprob",
    f"WITH tok AS (SELECT doc_id, {_LM_TOK} AS ws FROM documents), "
    "bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM tok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    f"rtok AS (SELECT {_LM_TOK} AS ws FROM documents WHERE lang = 'en'), "
    "rbi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM rtok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    "model AS (SELECT w1, w2, count(*) AS cp FROM rbi GROUP BY 1, 2), "
    "ctx AS (SELECT w1, sum(cp) AS cc FROM model GROUP BY 1), "
    "v AS (SELECT count(DISTINCT t) AS v FROM "
    "(SELECT unnest(ws) AS t FROM rtok)), "
    "scored AS (SELECT b.doc_id, CAST(round(ln("
    "(COALESCE(c.cc, 0) + 1.0 * (SELECT v FROM v)) * 1.0 / "
    "(COALESCE(m.cp, 0) + 1)) * 1000000) AS BIGINT) AS nlp "
    "FROM bi b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2 "
    "LEFT JOIN ctx c ON b.w1 = c.w1) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams, "
    "CAST(sum(nlp) // count(*) AS BIGINT) AS nll_micros "
    "FROM scored GROUP BY doc_id",
)
def quality_lm_logprob(spark, sf_dir):
    """CCNet-style LM quality scoring (r15; textops.py::
    bigram_lm_score): train an add-1 bigram model on the English
    slice (the 'curated reference' stand-in — CCNet trains KenLM on
    Wikipedia), score EVERY document by mean negative bigram
    log-likelihood. Non-English and gibberish documents score high
    NLL (their transitions never appear in the reference and degrade
    to the ln(cc + V) smoothing floor); English documents score low
    — the perplexity-bucket quality filter of Wenzek et al. 2020 in
    exact-arithmetic engine-native form. Per-bigram NLL rounds to
    BIGINT micros BEFORE the mean (positive-numerator integer
    division — truncation ≡ floor, so Spark div and DuckDB // agree)
    and the oracle replays model training, smoothing, and scoring
    end to end."""
    from .functions.textops import bigram_lm_score

    d = _t(spark, sf_dir, "documents")
    return bigram_lm_score(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("text"),
    )


@q(
    "quality_lm_logprob_trigram",
    f"WITH tok AS (SELECT doc_id, {_LM_TOK} AS ws FROM documents), "
    "dtri AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 "
    "FROM tok, unnest(generate_series(1, len(ws) - 2)) AS t(i) "
    "WHERE len(ws) >= 3), "
    f"rtok AS (SELECT {_LM_TOK} AS ws FROM documents WHERE lang = 'en'), "
    "rtri AS (SELECT ws[i] AS w1, ws[i + 1] AS w2, ws[i + 2] AS w3 "
    "FROM rtok, unnest(generate_series(1, len(ws) - 2)) AS t(i) "
    "WHERE len(ws) >= 3), "
    "rbi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM rtok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    "runi AS (SELECT unnest(ws) AS t FROM rtok), "
    "tm AS (SELECT w1, w2, w3, count(*) AS tcp FROM rtri GROUP BY 1, 2, 3), "
    "tctx AS (SELECT w1, w2, sum(tcp) AS tcc FROM tm GROUP BY 1, 2), "
    "bm AS (SELECT w1, w2, count(*) AS bcp FROM rbi GROUP BY 1, 2), "
    "bctx AS (SELECT w1, sum(bcp) AS bcc FROM bm GROUP BY 1), "
    "um AS (SELECT t, count(*) AS ucp FROM runi GROUP BY 1), "
    "s AS (SELECT count(*) AS n, count(DISTINCT t) AS v FROM runi), "
    "scored AS (SELECT d.doc_id, CAST(round(CASE "
    "WHEN tm.tcp IS NOT NULL THEN ln(tctx.tcc * 1.0 / tm.tcp) "
    "WHEN bm.bcp IS NOT NULL THEN ln(bctx.bcc * 1.0 / (0.4 * bm.bcp)) "
    "ELSE ln((s.n + s.v) * 1.0 / (0.16 * (COALESCE(um.ucp, 0) + 1))) "
    "END * 1000000) AS BIGINT) AS nlp FROM dtri d "
    "LEFT JOIN tm ON d.w1 = tm.w1 AND d.w2 = tm.w2 AND d.w3 = tm.w3 "
    "LEFT JOIN tctx ON d.w1 = tctx.w1 AND d.w2 = tctx.w2 "
    "LEFT JOIN bm ON d.w2 = bm.w1 AND d.w3 = bm.w2 "
    "LEFT JOIN bctx ON d.w2 = bctx.w1 "
    "LEFT JOIN um ON d.w3 = um.t "
    "CROSS JOIN s) "
    "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams, "
    "CAST(sum(nlp) // count(*) AS BIGINT) AS nll_micros "
    "FROM scored GROUP BY doc_id",
)
def quality_lm_logprob_trigram(spark, sf_dir):
    """Trigram stupid-backoff LM quality scoring (r15 verdict #3;
    textops.py::trigram_lm_score): the order-3 sharpening of
    ``quality_lm_logprob`` — CCNet's filter is a 5-gram KenLM, and a
    backoff trigram separates reference-like word ORDER from merely
    reference-like word CHOICE where the add-k bigram saturates.
    Stupid backoff (Brants et al. 2007) is count-table joins all the
    way down — seen trigram ⇒ c(w123)/c(w12); else 0.4·c(w23)/c(w2);
    else the add-1 unigram floor 0.16·(c(w3)+1)/(N+V) — so the oracle
    replays training and all three tiers end to end. Per-trigram NLL
    rounds to BIGINT micros BEFORE the mean (positive numerator:
    every tier's ratio ≤ 1, so the negated log is positive and Spark
    ``div`` ≡ DuckDB ``//``); backoff constants are double literals
    spelled identically on both engines."""
    from .functions.textops import trigram_lm_score

    d = _t(spark, sf_dir, "documents")
    return trigram_lm_score(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("text"),
    )


@q(
    "quality_ppl_buckets",
    f"WITH tok AS (SELECT doc_id, {_LM_TOK} AS ws FROM documents), "
    "bi AS (SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2 FROM tok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    f"rtok AS (SELECT {_LM_TOK} AS ws FROM documents WHERE lang = 'en'), "
    "rbi AS (SELECT ws[i] AS w1, ws[i + 1] AS w2 FROM rtok, "
    "unnest(generate_series(1, len(ws) - 1)) AS t(i) WHERE len(ws) >= 2), "
    "model AS (SELECT w1, w2, count(*) AS cp FROM rbi GROUP BY 1, 2), "
    "ctx AS (SELECT w1, sum(cp) AS cc FROM model GROUP BY 1), "
    "v AS (SELECT count(DISTINCT t) AS v FROM "
    "(SELECT unnest(ws) AS t FROM rtok)), "
    "scored AS (SELECT b.doc_id, CAST(round(ln("
    "(COALESCE(c.cc, 0) + 1.0 * (SELECT v FROM v)) * 1.0 / "
    "(COALESCE(m.cp, 0) + 1)) * 1000000) AS BIGINT) AS nlp "
    "FROM bi b LEFT JOIN model m ON b.w1 = m.w1 AND b.w2 = m.w2 "
    "LEFT JOIN ctx c ON b.w1 = c.w1), "
    "doc AS (SELECT doc_id, CAST(sum(nlp) // count(*) AS BIGINT) AS "
    "nll_micros FROM scored GROUP BY doc_id) "
    "SELECT doc_id, nll_micros, CASE ntile(3) OVER "
    "(ORDER BY nll_micros, doc_id) WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
    "ELSE 'tail' END AS bucket FROM doc",
)
def quality_ppl_buckets(spark, sf_dir):
    """CCNet's head/middle/tail perplexity split (r15 — the step
    AFTER quality_lm_logprob in Wenzek et al. 2020: rank the corpus
    by reference-LM perplexity and cut it into terciles; training
    recipes keep head+middle and drop or downsample tail).

    r16 (r15 verdict #2): the tercile cut is now SCALE-SAFE by
    default — ``operators.quantiles.ntile_buckets`` computes the two
    boundary ELEMENTS at NTILE's exact ranks (ceil-split of N) via
    the two-pass bounded-histogram rank select and buckets every row
    with a broadcast CASE; row-for-row identical to
    ``NTILE(3) OVER (ORDER BY nll_micros, doc_id)`` (the unique
    doc_id tiebreak makes the assignment a pure function of the
    composite key — pinned in tests/test_quantiles.py), but the plan
    has NO unpartitioned window: the only window runs per histogram
    bucket. The score table persists across the count/boundary/bucket
    passes and releases via the graph DQs' localCheckpoint pattern.
    The DuckDB oracle keeps the literal ``ntile(3)`` spelling — the
    equivalence IS the claim being checked."""
    from .functions.textops import bigram_lm_score
    from .operators.quantiles import ntile_buckets

    d = _t(spark, sf_dir, "documents")
    nll = bigram_lm_score(
        d.select("doc_id", "text"),
        d.filter(F.col("lang") == "en").select("text"),
    ).select("doc_id", "nll_micros").persist()
    out = ntile_buckets(
        nll, "nll_micros", "doc_id", 3, labels=["head", "middle", "tail"]
    ).select("doc_id", "nll_micros", "bucket")
    return _materialized(out, [nll])
