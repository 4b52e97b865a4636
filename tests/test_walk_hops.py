"""X2 walk ⊖ hop subtraction — edge-case matrix + differential fuzz.

Semantics under test: ProjektorState.cs:178-221 (see operators/walk_hops.py).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F, types as T

from open_ftth_relational_projector_spark.operators.walk_hops import (
    subtract_hops,
    subtract_hops_py,
)

HOP_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("from_node_id", T.StringType()),
            T.StructField("to_node_id", T.StringType()),
        ]
    )
)
SCHEMA = T.StructType(
    [
        T.StructField("walk", T.ArrayType(T.StringType())),
        T.StructField("hops", HOP_T),
    ]
)

CASES = [
    # (walk, hops, expected)
    (["a", "b", "c", "d"], None, ["a", "b", "c", "d"]),           # null hops → copy
    (["a", "b", "c", "d"], [], ["a", "b", "c", "d"]),             # empty hops
    (["a", "b", "c", "d"], [("b", "d")], ["a", "d"]),             # interior hop, [from,to)
    (["a", "b", "c"], [("a", "c")], ["c"]),                       # hop at walk start
    (["a", "b", "c"], [("b", "c")], ["a", "c"]),                  # hop ending at last
    (["a", "b", "c"], [("b", "z")], ["a"]),                       # ToNode absent → tail dropped
    (["a", "b", "c", "d", "e"], [("b", "c"), ("c", "e")], ["a", "e"]),  # back-to-back
    (["a", "b", "c"], [("z", "c")], ["a", "b", "c"]),             # FromNode absent → hop inert
    (["a", "b", "c", "d"], [("z", "x"), ("b", "d")], ["a", "b", "c", "d"]),  # stack blocked
    (["a", "b", "c"], [("a", "a")], []),                          # to==from → search never finds (forward-only)
    (["a"], [("a", "a")], []),                                    # single element consumed by hop
    ([], [("a", "b")], []),                                       # empty walk
    (["a", "b", "c", "d"], [("c", "d"), ("a", "b")], ["a", "b", "d"]),  # out-of-order hops: second blocked behind first until c seen
]


def _expected_note():
    # sanity: the python oracle agrees with the hand-computed table
    for walk, hops, expected in CASES:
        h = None if hops is None else [
            {"from_node_id": f, "to_node_id": t} for f, t in hops
        ]
        assert subtract_hops_py(walk, h) == expected, (walk, hops)


_expected_note()


@pytest.fixture(scope="module")
def case_df(spark):
    rows = [
        (
            walk,
            None
            if hops is None
            else [{"from_node_id": f, "to_node_id": t} for f, t in hops],
        )
        for walk, hops, _ in CASES
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_hof_matches_goldens(case_df):
    got = case_df.select(
        subtract_hops(F.col("walk"), F.col("hops")).alias("out")
    ).collect()
    for (walk, hops, expected), row in zip(CASES, got):
        assert row["out"] == expected, (walk, hops, row["out"])


def test_hof_matches_python_fuzz(spark):
    rng = random.Random(42)
    rows = []
    for _ in range(300):
        n = rng.randint(0, 12)
        walk = rng.sample([f"n{i}" for i in range(20)], n)  # unique elements
        n_hops = rng.randint(0, 4)
        hops = []
        pool = walk + [f"x{i}" for i in range(3)]
        for _ in range(n_hops):
            if not pool:
                break
            hops.append(
                {
                    "from_node_id": rng.choice(pool),
                    "to_node_id": rng.choice(pool),
                }
            )
        rows.append((walk, hops if rng.random() > 0.2 else None))
    df = spark.createDataFrame(rows, SCHEMA)
    got = df.select("walk", "hops", subtract_hops(F.col("walk"), F.col("hops")).alias("out")).collect()
    for row in got:
        hops = None if row["hops"] is None else [h.asDict() for h in row["hops"]]
        assert row["out"] == subtract_hops_py(row["walk"], hops), (
            row["walk"],
            hops,
        )
