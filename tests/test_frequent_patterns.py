"""Frequent-itemset mining + association rules (operators/
frequent_patterns.py) vs hand computation and a brute-force
itertools oracle."""

from itertools import combinations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dask_ml_spark.operators.frequent_patterns import (
    association_rules,
    frequent_itemsets,
)

TOY = [(1, "a"), (1, "b"), (1, "c"), (2, "a"), (2, "b"), (3, "a"),
       (3, "b"), (3, "c"), (4, "a"), (4, "c"), (5, "b"), (5, "d"),
       (1, "a")]  # duplicate (1, a) must not inflate support


def test_frequent_itemsets_hand_computed(spark):
    df = spark.createDataFrame(TOY, ["basket_id", "item"])
    got = {(tuple(r["items"]), r["size"]): r["support"]
           for r in frequent_itemsets(df, min_count=2, max_len=3).collect()}
    want = {(("a",), 1): 4, (("b",), 1): 4, (("c",), 1): 3,
            (("a", "b"), 2): 3, (("a", "c"), 2): 3, (("b", "c"), 2): 2,
            (("a", "b", "c"), 3): 2}
    assert got == want
    # max_len truncation and the d-below-threshold exclusion
    got2 = frequent_itemsets(df, min_count=2, max_len=1).collect()
    assert {tuple(r["items"]) for r in got2} == {("a",), ("b",), ("c",)}


def test_association_rules_hand_computed(spark):
    df = spark.createDataFrame(TOY, ["basket_id", "item"])
    got = {(r["antecedent"], r["consequent"]):
           (r["support"], r["confidence"], r["lift"])
           for r in association_rules(df, min_count=2).collect()}
    n = 5
    supp = {"a": 4, "b": 4, "c": 3}
    pair = {("a", "b"): 3, ("a", "c"): 3, ("b", "c"): 2}
    want = {}
    for (x, y), s in pair.items():
        want[(x, y)] = (s, s / supp[x], (s / supp[x]) * n / supp[y])
        want[(y, x)] = (s, s / supp[y], (s / supp[y]) * n / supp[x])
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-12
        assert abs(got[k][2] - want[k][2]) < 1e-12
    # min_confidence filter
    conf = association_rules(df, min_count=2, min_confidence=0.9).collect()
    assert {(r["antecedent"], r["consequent"]) for r in conf} == {("c", "a")}


def test_frequent_itemsets_brute_force_random(spark):
    """Random baskets vs an itertools enumeration of every candidate
    itemset — catches member-pruning or combination-generation bugs
    the toy example is too small to hit."""
    rng = np.random.RandomState(3)
    rows = []
    baskets = {}
    for b in range(60):
        items = sorted(str(i) for i in rng.choice(
            list("abcdefgh"), size=rng.randint(1, 6), replace=False))
        baskets[b] = set(items)
        rows += [(b, i) for i in items]
    df = spark.createDataFrame(rows, ["basket_id", "item"]).repartition(7)

    want = {}
    for size in (1, 2, 3):
        for combo in combinations("abcdefgh", size):
            s = sum(1 for its in baskets.values() if set(combo) <= its)
            if s >= 3:
                want[(combo, size)] = s
    got = {(tuple(r["items"]), r["size"]): r["support"]
           for r in frequent_itemsets(df, min_count=3, max_len=3).collect()}
    assert got == want


def test_frequent_itemsets_guards(spark):
    df = spark.createDataFrame(TOY, ["basket_id", "item"])
    with pytest.raises(ValueError, match="max_len"):
        frequent_itemsets(df, max_len=4)
    with pytest.raises(ValueError, match="min_count"):
        frequent_itemsets(df, min_count=0)
    # a basket over the explode bound fails fast, job-side
    big = spark.createDataFrame(
        [(b, f"i{j}") for b in (1, 2) for j in range(30)],
        ["basket_id", "item"])
    with pytest.raises(Exception, match="max_basket_items"):
        frequent_itemsets(big, min_count=2, max_basket_items=10).collect()


def test_frequent_itemsets_plan_no_self_join(spark):
    """Combination generation is a per-basket HOF over the collected
    array — the plan must contain no cartesian/broadcast-nested-loop
    basket x basket join."""
    df = spark.createDataFrame(TOY, ["basket_id", "item"])
    plan = frequent_itemsets(df, min_count=2, max_len=3) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented triangle counting vs an itertools enumeration
    on a random graph (with self-loops, parallel and reversed
    duplicate edges thrown in to exercise normalization)."""
    from dask_ml_spark.datapipe.graph import triangle_count

    rng = np.random.RandomState(11)
    n = 40
    und = set()
    for _ in range(220):
        u, v = rng.randint(0, n, 2)
        if u != v:
            und.add((min(u, v), max(u, v)))
    rows = []
    for u, v in und:
        rows.append((int(u), int(v)))
        if rng.rand() < 0.3:
            rows.append((int(v), int(u)))  # reversed duplicate
        if rng.rand() < 0.2:
            rows.append((int(u), int(v)))  # parallel duplicate
    rows += [(3, 3), (7, 7)]  # self-loops
    df = spark.createDataFrame(rows, ["src", "dst"]).repartition(5)

    adj = {i: set() for i in range(n)}
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    want = {i: 0 for i in range(n)}
    total = 0
    for a, b, c in combinations(range(n), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            total += 1
            want[a] += 1
            want[b] += 1
            want[c] += 1
    got = {r["node"]: r["triangles"]
           for r in triangle_count(df).collect()}
    assert total > 50  # non-degenerate fixture
    for i in range(n):
        if want[i] or i in got:
            assert got.get(i, 0) == want[i]
    assert sum(got.values()) == 3 * total
