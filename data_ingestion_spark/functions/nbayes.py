"""Multinomial Naive Bayes over token streams — train AND apply
wholly in the engine.

Reference anchor: none — the reference has no model-based filtering.
The LLM-data mandate does: production corpus curation gates documents
with a cheap text classifier (the GPT-3/CCNet-style quality filter,
fastText language filters) trained on labeled slices. Multinomial NB
with Laplace smoothing is that shape as pure relational algebra:
training is two groupBys over the exploded token stream, and
classification is a join + per-document sum + argmax.

Determinism (the bm25_rank_batch pattern): every log-probability is
computed in doubles ONCE at train time, scaled to integer MICROS,
and stored; per-document class scores are then exact BIGINT sums —
associative, so no aggregation order can flap a prediction — with a
deterministic argmax tie-break (class name ascending).

The 100 TB shape: the model is |vocab| x |classes| rows — broadcast
when it fits (the normal case for a quality/language filter), an
ordinary token-keyed equi-join when it doesn't. Unknown tokens get
the per-class smoothed floor via left-join + per-class coalesce, so
out-of-vocabulary text degrades exactly like the textbook formula
says, not silently to zero.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _tokens(col: Column) -> Column:
    return F.filter(
        F.split(F.lower(col), "[^a-z0-9]+"), lambda x: F.length(x) > 0
    )


def nb_train(
    df: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    alpha: float = 1.0,
) -> tuple[DataFrame, DataFrame]:
    """Train multinomial NB. Returns ``(model, classes)``:

    - model: (label, token, lp_micros) — round(ln((count + alpha) /
      (class_total + alpha * V)) * 1e6) per in-vocabulary token;
    - classes: (label, prior_micros, unseen_micros) — the log-prior
      and the smoothed floor an out-of-vocabulary token contributes.

    V is the cross-class vocabulary size (standard multinomial NB).
    Two groupBys over the exploded stream; V and doc totals are
    1-row/`|classes|`-row aggregates.
    """
    toks = df.select(
        F.col(label_col).alias("label"),
        F.explode(_tokens(F.col(text_col))).alias("token"),
    )
    counts = toks.groupBy("label", "token").agg(F.count(F.lit(1)).alias("__n"))
    vocab = counts.select("token").distinct().count()
    class_tot = counts.groupBy("label").agg(F.sum("__n").alias("__tot"))
    ndocs = df.count()
    doc_counts = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).alias("__docs")
    )
    model = (
        counts.join(class_tot, "label")
        .select(
            "label",
            "token",
            F.round(
                F.log(
                    (F.col("__n") + F.lit(alpha))
                    / (F.col("__tot") + F.lit(alpha * vocab))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("lp_micros"),
        )
    )
    classes = (
        doc_counts.join(class_tot, "label")
        .select(
            "label",
            F.round(F.log(F.col("__docs") / F.lit(float(ndocs))) * 1e6)
            .cast("bigint")
            .alias("prior_micros"),
            F.round(
                F.log(F.lit(alpha) / (F.col("__tot") + F.lit(alpha * vocab))) * 1e6
            )
            .cast("bigint")
            .alias("unseen_micros"),
        )
    )
    return model, classes


def nb_classify(
    df: DataFrame,
    model: DataFrame,
    classes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_model: bool = True,
    default_label: str | None = None,
) -> DataFrame:
    """(id, predicted, score_micros): argmax over classes of
    prior + Σ_token lp(token|class), unknown tokens contributing the
    class's smoothed floor. Exact integer arithmetic end-to-end;
    ties break on class name ascending.

    Zero-token documents (r10 verdict #6 — total-function
    contract): by default they produce NO row (no evidence to
    score), which a keep/drop curation gate composing this must not
    read as 'rejected'. Pass ``default_label`` to make the function
    total: every input id appears, and evidence-free docs get
    ``(default_label, NULL score_micros)`` — the NULL score keeps
    defaulted rows distinguishable from genuinely-scored ones."""
    toks = df.select(F.col(id_col), F.explode(_tokens(F.col(text_col))).alias("token"))
    cls = classes.select("label", "prior_micros", "unseen_micros")
    m = model
    if broadcast_model:
        m = F.broadcast(m)
        cls = F.broadcast(cls)
    # every token row × every class, then the class-conditional
    # probability or the class's unseen floor
    expanded = toks.join(cls.select("label", "unseen_micros"), how="cross").join(
        m, ["label", "token"], "left_outer"
    )
    scores = (
        expanded.select(
            id_col,
            "label",
            F.coalesce(F.col("lp_micros"), F.col("unseen_micros")).alias("__lp"),
        )
        .groupBy(id_col, "label")
        .agg(F.sum("__lp").alias("__sum"))
        .join(cls.select("label", "prior_micros"), "label")
        .withColumn("__score", F.col("__sum") + F.col("prior_micros"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(
        F.col("__score").desc(), F.col("label").asc()
    )
    out = (
        scores.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            id_col,
            F.col("label").alias("predicted"),
            F.col("__score").alias("score_micros"),
        )
    )
    if default_label is None:
        return out
    # total-function path: left-join the scored rows back onto the
    # full id set; evidence-free docs surface with the default label
    # and a NULL score (distinguishable from scored rows)
    ids = df.select(F.col(id_col)).distinct()
    return ids.join(out, id_col, "left_outer").select(
        id_col,
        F.coalesce(F.col("predicted"), F.lit(default_label)).alias("predicted"),
        "score_micros",
    )
