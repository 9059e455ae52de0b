"""Ordered-funnel and cohort-retention analysis over event streams.

Two classic event-analytics operators (the product-analytics staples a
warehouse team would otherwise hand-roll per query), expressed as pure
relational plans so an ANSI-SQL oracle mirrors them exactly:

* :func:`funnel_steps` — per user, the earliest time each funnel step
  was reached IN ORDER (step k counts only events strictly after the
  user's step-(k-1) time).
* :func:`cohort_retention` — users grouped by first-activity period,
  counted per periods-since-cohort.

Reference scope note: the reference engine (PySpark-Skyline) exposes
generic keyed aggregation this composes from; these operators extend
the engine's standard-analytics surface the same way the LLM-pipeline
family does (SURVEY.md §2.3 "beyond the reference" extensions).

100 TB design: both operators are compositions of filtered hash
aggregates and equi-joins on the user key — no windows, no global
ordering, no driver-side state. ``funnel_steps`` runs one aggregate
per step over a monotonically SHRINKING per-user table (step-k input
is semi-filtered by step-(k-1) survivors), all shuffling on the same
user key so AQE/exchange reuse co-locates them; skewed users cost one
hot aggregation key, not a blown-up join. ``cohort_retention`` is two
aggregates and one join whose outputs are counts — at most
|users| × |periods| rows leave the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["funnel_steps", "cohort_retention"]


def funnel_steps(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
) -> DataFrame:
    """Ordered funnel: one row per user who reached step 1, with
    ``step{i}_ts`` = the earliest event of type ``steps[i-1]`` strictly
    after that user's ``step{i-1}_ts`` (NULL once the funnel drops),
    and ``reached`` = the number of steps completed.

    Strict ``>`` ordering: a click at the exact same instant as the
    view does NOT advance the funnel (same-timestamp events cannot
    prove ordering). Deterministic — every column is a ``min`` over a
    filtered set.
    """
    if not steps or len(set(steps)) != len(steps):
        raise ValueError("steps must be a non-empty list of distinct event types")
    ev = df.select(
        F.col(user_col),
        F.col(ts_col).alias("__ts"),
        F.col(type_col).alias("__et"),
    )
    out = (
        ev.filter(F.col("__et") == steps[0])
        .groupBy(user_col)
        .agg(F.min("__ts").alias("step1_ts"))
    )
    # the step-(k-1) survivors ARE the previous iteration's aggregate —
    # carrying it forward keeps the step-k gate subplan O(1) deep
    # instead of re-filtering the accumulated left-join chain (an
    # O(S²) plan relying on exchange reuse)
    reached_prev = out
    for i, step in enumerate(steps[1:], start=2):
        prev = f"step{i - 1}_ts"
        nxt = (
            ev.filter(F.col("__et") == step)
            .join(reached_prev.select(user_col, prev), user_col)
            .filter(F.col("__ts") > F.col(prev))
            .groupBy(user_col)
            .agg(F.min("__ts").alias(f"step{i}_ts"))
        )
        out = out.join(nxt, user_col, "left")
        reached_prev = nxt
    reached = F.lit(1)
    for i in range(2, len(steps) + 1):
        reached = reached + F.when(F.col(f"step{i}_ts").isNotNull(), 1).otherwise(0)
    return out.withColumn("reached", reached.cast("long"))


def cohort_retention(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    period: str = "week",
) -> DataFrame:
    """Cohort retention: users are cohorted by the ``period``-truncated
    time of their FIRST event; for every (cohort, k) the output counts
    the distinct users active k periods after their cohort period.
    Returns (cohort, period_k, n_users); k=0 rows are each cohort's
    size. All-integer outputs — nothing to disagree on across engines.

    ``period``: "week" (ISO Monday truncation — identical in Spark and
    DuckDB) or "day".
    """
    if period not in ("week", "day"):
        raise ValueError(f"period must be 'week' or 'day', got {period!r}")
    days_per = 7 if period == "week" else 1
    ev = df.select(
        F.col(user_col), F.date_trunc(period, F.col(ts_col)).alias("__p")
    ).filter(F.col("__p").isNotNull())
    first = ev.groupBy(user_col).agg(F.min("__p").alias("__cohort"))
    activity = ev.distinct()
    return (
        activity.join(first, user_col)
        .select(
            F.col("__cohort").alias("cohort"),
            (
                F.datediff(F.col("__p").cast("date"), F.col("__cohort").cast("date"))
                / days_per
            )
            .cast("long")
            .alias("period_k"),
            F.col(user_col),
        )
        .groupBy("cohort", "period_k")
        # plain count, not countDistinct: activity is distinct on
        # (user, period) and the period is uniquely determined by
        # (cohort, period_k) — cohort + days_per·k exactly, both being
        # period-truncated — so each user appears at most once per
        # group and the two-phase distinct aggregate would be waste
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
