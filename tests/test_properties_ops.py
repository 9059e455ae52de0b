"""Property-based checks (Hypothesis) for the newer relational
operators: salted_join ≡ plain join on arbitrary key/value data, and
merge_upsert laws (idempotence, last-write-wins, key partition)."""

from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark_skyline_spark.operators.skewjoin import salted_join
from pyspark_skyline_spark.operators.upsert import merge_upsert

KEYS = st.integers(min_value=0, max_value=6)  # few keys -> heavy collisions
VALS = st.integers(min_value=-100, max_value=100)

fact_rows = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=25)
dim_rows = st.lists(st.tuples(KEYS, VALS), min_size=0, max_size=10)

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _counted(df):
    return {tuple(r): c for *r, c in df.groupBy(*df.columns).count().collect()}


@given(fact=fact_rows, dim=dim_rows, n_salts=st.integers(1, 5))
@_SETTINGS
def test_salted_join_equals_plain_join(spark, fact, dim, n_salts):
    fdf = spark.createDataFrame(fact, "k int, v int") if fact else spark.createDataFrame([], "k int, v int")
    ddf = spark.createDataFrame(dim, "k int, d int") if dim else spark.createDataFrame([], "k int, d int")
    for how in ("inner", "left_outer"):
        plain = fdf.join(ddf, ["k"], how)
        salted = salted_join(fdf, ddf, ["k"], n_salts=n_salts, how=how)
        assert _counted(salted) == _counted(plain)


upd_rows = st.lists(
    st.tuples(KEYS, VALS, st.integers(0, 50)), min_size=0, max_size=15
)
cur_rows = st.lists(
    st.tuples(KEYS, VALS, st.integers(0, 50)), min_size=0, max_size=15, unique_by=lambda t: t[0]
)


@given(cur=cur_rows, upd=upd_rows)
@_SETTINGS
def test_merge_upsert_laws(spark, cur, upd):
    schema = "k int, v int, ord int"
    cdf = spark.createDataFrame(cur, schema) if cur else spark.createDataFrame([], schema)
    udf_ = spark.createDataFrame(upd, schema) if upd else spark.createDataFrame([], schema)
    merged = merge_upsert(cdf, udf_, ["k"], order_col="ord")
    rows = merged.collect()
    keys = [r.k for r in rows]
    # key partition: one row per key, keys = current ∪ update keys
    assert sorted(keys) == sorted(set(keys))
    assert set(keys) == {t[0] for t in cur} | {t[0] for t in upd}
    # updated keys carry the max-ord update row's ord value
    by_key = {}
    for k, v, o in upd:
        if k not in by_key or o > by_key[k]:
            by_key[k] = o
    for r in rows:
        if r.k in by_key:
            assert r.ord == by_key[r.k]
    # idempotence: applying the same batch again changes nothing
    again = merge_upsert(merged, udf_, ["k"], order_col="ord")
    assert _counted(again) == _counted(merged)


# grouped_row_number ≡ Window.partitionBy(group).orderBy(order) row_number
# on arbitrary data with NULL groups, delimiter bytes, and collisions —
# the skew-free machinery must be observationally identical to the
# window form it replaces
_GROUPS = st.one_of(
    st.none(), st.sampled_from(["", "x", "x\x1f", "\x1fx", "a|b", "∅"])
)
_grp_rows = st.lists(
    st.tuples(_GROUPS, st.integers(0, 50)), min_size=0, max_size=30, unique=True
)


@given(rows=_grp_rows, nparts=st.integers(1, 5))
@_SETTINGS
def test_grouped_row_number_equals_window(spark, rows, nparts):
    from pyspark.sql import Window, functions as F

    from pyspark_skyline_spark.operators.shuffle import grouped_row_number

    schema = "g string, k int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {
        (r["g"], r["k"]): r["rn"]
        for r in grouped_row_number(
            df, ["g"], ["k"], pos_col="rn", num_partitions=nparts
        ).collect()
    }
    w = Window.partitionBy("g").orderBy("k")
    ref = {
        (r["g"], r["k"]): r["rn"]
        for r in df.withColumn("rn", F.row_number().over(w) - 1).collect()
    }
    assert got == ref


# ntile_by_group ≡ ntile(n) OVER (PARTITION BY g ORDER BY k) on arbitrary
# data with NULL groups and any bucket count — the broadcast-count
# arithmetic must reproduce SQL's remainder rule exactly
@given(rows=_grp_rows, n=st.integers(1, 7))
@_SETTINGS
def test_ntile_by_group_equals_window(spark, rows, n):
    from pyspark.sql import Window, functions as F

    from pyspark_skyline_spark.operators.shuffle import ntile_by_group

    schema = "g string, k int"
    df = (
        spark.createDataFrame(rows, schema)
        if rows
        else spark.createDataFrame([], schema)
    )
    got = {
        (r["g"], r["k"]): r["tile"]
        for r in ntile_by_group(df, ["g"], ["k"], n, num_partitions=3).collect()
    }
    w = Window.partitionBy("g").orderBy("k")
    ref = {
        (r["g"], r["k"]): r["t"]
        for r in df.withColumn("t", F.ntile(n).over(w)).collect()
    }
    assert got == ref
