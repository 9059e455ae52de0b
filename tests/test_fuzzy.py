"""Fuzzy string matching (operators/fuzzy.py): exact equivalence with
the brute-force all-pairs levenshtein join, including the repetitive
strings that break a distinct-gram count filter."""

import random

import pytest
from pyspark.sql import functions as F

from pyspark_skyline_spark.operators.fuzzy import fuzzy_pairs


def _brute(rows, d):
    def lev(a, b):
        if a is None or b is None:
            return None
        m, n = len(a), len(b)
        dp = list(range(n + 1))
        for i in range(1, m + 1):
            prev, dp[0] = dp[0], i
            for j in range(1, n + 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
                )
        return dp[n]

    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1 :]:
            if sa is None or sb is None:
                continue
            dist = lev(sa, sb)
            if dist <= d:
                out.add((min(ia, ib), max(ia, ib), dist))
    return out


def _spark_pairs(spark, rows, d, **kw):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r.id_a, r.id_b, r.dist)
        for r in fuzzy_pairs(df, "id", "s", max_dist=d, **kw).collect()
    }


def test_fuzzy_matches_brute_force_random(spark):
    rng = random.Random(11)
    words = ["spark", "skyline", "parquet", "shuffle", "catalyst", "tungsten"]
    rows = []
    for i in range(120):
        w = " ".join(rng.choice(words) for _ in range(rng.randint(1, 3)))
        if rng.random() < 0.5:  # perturb: sub/ins/del
            w = list(w)
            for _ in range(rng.randint(1, 2)):
                op = rng.choice("sid")
                pos = rng.randrange(len(w))
                if op == "s":
                    w[pos] = rng.choice("abcxyz")
                elif op == "i":
                    w.insert(pos, rng.choice("abcxyz"))
                elif len(w) > 1:
                    del w[pos]
            w = "".join(w)
        rows.append((i, w))
    for d in (1, 2):
        assert _spark_pairs(spark, rows, d) == _brute(rows, d), d


def test_fuzzy_strategies_agree(spark):
    """segment (PassJoin pigeonhole) and qgram (positional Gravano) are
    both exact filters, so they must produce identical output — on a
    small-alphabet composed-word corpus (qgram's worst case) AND on
    perturbed free text."""
    rng = random.Random(5)
    words = ["aa", "ab", "ba", "bb", "ccc"]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(1, 5))))
        for i in range(100)
    ]
    rows += [(200, ""), (201, "a"), (202, None), (203, "aa ab ba"), (204, "aa ab bb")]
    for d in (0, 1, 2, 3):
        truth = _brute(rows, d)
        assert _spark_pairs(spark, rows, d, strategy="segment") == truth, d
        assert _spark_pairs(spark, rows, d, strategy="qgram") == truth, d
        assert _spark_pairs(spark, rows, d, strategy="auto") == truth, d
    with pytest.raises(ValueError):
        _spark_pairs(spark, rows, 1, strategy="nope")


def test_fuzzy_auto_strategy_probe(spark):
    """strategy="auto" differential on BOTH fixture regimes (the
    verdict-6 ask): the result must equal both fixed strategies
    everywhere, and the probe must pick qgram on diverse-alphabet data
    and segment on the small-alphabet composed-word shape that sent
    the gram join quadratic at sf1."""
    from pyspark_skyline_spark.operators.fuzzy import _choose_strategy

    rng = random.Random(7)
    # regime 1: diverse alphabet — grams nearly unique
    diverse = []
    for i in range(150):
        s = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(14))
        diverse.append((i, s))
        if rng.random() < 0.3:  # plant a near-dup
            t = list(s)
            t[rng.randrange(len(t))] = rng.choice("abcxyz")
            diverse.append((1000 + i, "".join(t)))
    # regime 2: tiny vocab composed words — every gram ubiquitous
    words = ["aa", "ab", "ba", "bb"]
    smallalpha = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 6))))
        for i in range(150)
    ]
    for rows in (diverse, smallalpha):
        for d in (1, 2):
            truth = _brute(rows, d)
            assert _spark_pairs(spark, rows, d, strategy="auto") == truth, d
            assert _spark_pairs(spark, rows, d, strategy="segment") == truth, d
            assert _spark_pairs(spark, rows, d, strategy="qgram") == truth, d

    def probe(rows, d=2, q=3):
        df = spark.createDataFrame(rows, "id long, s string")
        vals = (
            df.select(F.col("s").alias("__s"))
            .where(F.col("__s").isNotNull())
            .distinct()
            .withColumn("__len", F.length("__s"))
        )
        return _choose_strategy(vals, d, q)

    assert probe(diverse) == "qgram"
    assert probe(smallalpha) == "segment"
    # degenerate inputs: empty / all-short corpora fall to the robust default
    assert probe([(0, "ab")]) == "segment"
    assert probe([]) == "segment"


def test_fuzzy_repetitive_strings_not_lost(spark):
    """The case a distinct-gram counter rejects: repeated grams collapse
    its count below threshold while the true distance is 1."""
    rows = [
        (0, "aaaaaaaaaa"),
        (1, "aaaaabaaaa"),   # one substitution
        (2, "ababababab"),
        (3, "abababababX"),  # one insertion
        (4, "completely different"),
    ]
    got = _spark_pairs(spark, rows, 1)
    assert got == _brute(rows, 1)
    assert (0, 1, 1) in got and (2, 3, 1) in got


def test_fuzzy_short_and_boundary_strings(spark):
    rows = [
        (0, "cat"), (1, "bat"), (2, "cart"), (3, "ca"),
        (4, "x"), (5, ""), (6, None), (7, "catalogue"),
    ]
    for d in (1, 2):
        assert _spark_pairs(spark, rows, d) == _brute(rows, d), d


def test_fuzzy_zero_distance_is_exact_duplicates(spark):
    rows = [(0, "same"), (1, "same"), (2, "sane"), (3, "samesame")]
    assert _spark_pairs(spark, rows, 0) == {(0, 1, 0)}


def test_fuzzy_validates(spark):
    df = spark.createDataFrame([(0, "x")], "id long, s string")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", max_dist=-1)
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "nope")
    with pytest.raises(ValueError):
        fuzzy_pairs(df, "id", "s", q=0)


def test_fuzzy_on_part_names(spark, sf_dir):
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    out = fuzzy_pairs(part, "p_partkey", "p_name", max_dist=2)
    # sanity: symmetric contract + verified distances only
    bad = out.where((F.col("dist") > 2) | (F.col("id_a") >= F.col("id_b"))).count()
    assert bad == 0


def test_fuzzy_plan_has_no_nested_loop_join(spark):
    """The r3 long-x-short boundary leg was a crossJoin broadcasting the
    entire short-string side; the length-band equi-join replaced it.
    Guard the plan shape: every join in fuzzy_pairs must be hash-based."""
    from pyspark_skyline_spark.plans.explain import formatted_plan

    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(["cat", "catalogue", "cart", "x"])],
        "id long, s string",
    )
    plan = formatted_plan(fuzzy_pairs(df, "id", "s", max_dist=2))
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan, plan
