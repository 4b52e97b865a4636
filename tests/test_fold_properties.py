"""Property tests (SURVEY §5.5): fold_entity and asof_join vs literal
Python models of the reference semantics, over hypothesis-generated op
sequences — creations/updates/removals in arbitrary interleavings, null
writes included.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F, types as T

from open_ftth_relational_projector_spark.operators.asof import asof_join
from open_ftth_relational_projector_spark.operators.lww import touched
from open_ftth_relational_projector_spark.projections.base import fold_entity

KEYS = ["k1", "k2", "k3"]
VALS = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))

OP = st.one_of(
    st.tuples(st.just("create"), st.sampled_from(KEYS), VALS, VALS),
    st.tuples(st.just("upd_x"), st.sampled_from(KEYS), VALS),
    st.tuples(st.just("upd_y"), st.sampled_from(KEYS), VALS),
    st.tuples(st.just("remove"), st.sampled_from(KEYS)),
)


def _model(ops):
    """Literal dict-fold of the reference protocol (ProjektorState.cs:145,
    551, 604 pattern): creations define all fields, updates overwrite their
    subset only when the entity exists, removals delete, re-creation
    revives."""
    state: dict[str, dict] = {}
    for seq, op in enumerate(ops, start=1):
        kind, key = op[0], op[1]
        if kind == "create":
            state[key] = {"x": op[2], "y": op[3]}
        elif kind == "upd_x":
            if key in state:
                state[key]["x"] = op[2]
        elif kind == "upd_y":
            if key in state:
                state[key]["y"] = op[2]
        elif kind == "remove":
            state.pop(key, None)
    return {k: (v["x"], v["y"]) for k, v in state.items()}


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ops=st.lists(OP, min_size=1, max_size=25))
def test_fold_entity_matches_dict_fold(spark, ops):
    creations, upd_x, upd_y, removals = [], [], [], []
    for seq, op in enumerate(ops, start=1):
        if op[0] == "create":
            creations.append((op[1], seq, op[2], op[3]))
        elif op[0] == "upd_x":
            upd_x.append((op[1], seq, op[2]))
        elif op[0] == "upd_y":
            upd_y.append((op[1], seq, op[2]))
        else:
            removals.append((op[1], seq))

    sch_c = "id string, seq long, x string, y string"
    sch_u = "id string, seq long, v string"
    sch_r = "id string, seq long"
    base = spark.createDataFrame(creations, sch_c).select(
        "id", "seq", touched(F.col("x")).alias("x"), touched(F.col("y")).alias("y")
    )
    ux = spark.createDataFrame(upd_x, sch_u).select(
        "id", "seq", touched(F.col("v")).alias("x")
    )
    uy = spark.createDataFrame(upd_y, sch_u).select(
        "id", "seq", touched(F.col("v")).alias("y")
    )
    rm = spark.createDataFrame(removals, sch_r)

    out = fold_entity(
        [base], [ux, uy], "id", {"x": "string", "y": "string"}, removals=rm
    )
    got = {r["id"]: (r["x"], r["y"]) for r in out.collect()}
    assert got == _model(ops)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    versions=st.lists(
        st.tuples(st.sampled_from(KEYS), st.sampled_from(["p", "q", "r", None])),
        max_size=15,
    ),
    facts=st.lists(st.sampled_from(KEYS), min_size=1, max_size=10),
)
def test_asof_join_matches_scan(spark, versions, facts):
    # interleave: odd seqs = versions, even seqs = facts
    v_rows = [(k, 2 * i + 1, val) for i, (k, val) in enumerate(versions)]
    f_rows = [(k, 2 * (i + 1)) for i, k in enumerate(facts)]
    v_df = spark.createDataFrame(v_rows, "k string, seq long, val string")
    f_df = spark.createDataFrame(f_rows, "k string, seq long")

    out = asof_join(f_df, v_df, "k")
    got = {(r["k"], r["seq"]): r["val"] for r in out.collect()}

    expected = {}
    for k, fseq in f_rows:
        cands = [(s, val) for (vk, s, val) in v_rows if vk == k and s < fseq]
        expected[(k, fseq)] = max(cands)[1] if cands else None
    assert got == expected


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# --- sketch invariants over random corpora ---------------------------------

WORDS = st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "echo", "foxtrot", "golf", "hotel"]
)
DOC = st.lists(WORDS, min_size=1, max_size=30).map(" ".join)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=1, max_size=12))
def test_cms_never_undercounts_on_random_corpora(spark, texts):
    """The Count-Min structural guarantee holds on EVERY corpus, not just
    the fixture: for the top-k tokens, estimate ≥ exact even with w=4
    (heavy forced collisions)."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        count_min_heavy_hitters,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = count_min_heavy_hitters(df, d=2, w=4, k=5).collect()
    assert out, "at least one token must surface"
    assert all(r["cms_n"] >= r["exact_n"] for r in out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=2, max_size=10))
def test_bloom_decontamination_never_false_negative_randomized(spark, texts):
    """Bloom guarantee on every corpus: bloom hits ≥ true hits per doc,
    even with a 32-bit filter (false positives abound, negatives never).
    Short docs (< n_shingle tokens) legitimately drop out of the report
    on BOTH paths — the invariant applies to every emitted row."""
    from open_ftth_relational_projector_spark.functions.sketches import (
        bloom_probe_decontamination,
    )

    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    out = bloom_probe_decontamination(
        df, eval_mod=2, n_bits=32, n_hashes=2, n_shingle=3
    ).collect()
    assert all(r["n_bloom_hits"] >= r["n_true_hits"] for r in out)
    assert all(r["no_false_negatives"] for r in out)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pre=st.lists(WORDS, min_size=0, max_size=6),
    mid=st.lists(WORDS, min_size=8, max_size=12),
    post=st.lists(WORDS, min_size=0, max_size=6),
)
def test_winnowing_guarantee_randomized(spark, pre, mid, post):
    """Schleimer's guarantee on arbitrary docs: two documents sharing a
    token run of length ≥ window + k − 1 (= 8 for k=4, w=5) always share
    at least one winnowed fingerprint."""
    from open_ftth_relational_projector_spark.functions.dedup import (
        winnow_fingerprints,
    )

    shared = " ".join(mid)
    d1 = " ".join(["x1"] * 3) + " " + shared + " " + " ".join(pre)
    d2 = " ".join(post) + " " + shared + " " + " ".join(["z9"] * 2)
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    fp = winnow_fingerprints(df, k=4, window=5)
    f1 = {r["fingerprint"] for r in fp.filter("doc_id = 1").collect()}
    f2 = {r["fingerprint"] for r in fp.filter("doc_id = 2").collect()}
    assert f1 & f2


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=st.lists(DOC, min_size=4, max_size=10))
def test_incremental_dedup_consistent_with_full_join(spark, texts):
    """The append-only screen must agree with the full-corpus exact join
    restricted to new×old pairs: a new doc is an exact_dup iff an
    identical old text exists; near-dup verdicts match the Jaccard pairs
    crossing the boundary."""
    from open_ftth_relational_projector_spark.functions.dedup import (
        incremental_dedup_report,
        ngram_jaccard_pairs,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    old = df.filter("doc_id % 2 = 0")
    new = df.filter("doc_id % 2 = 1")
    rep = {
        r["doc_id"]: r
        for r in incremental_dedup_report(new, old, threshold=0.3).collect()
    }
    old_texts = {r["text"]: r["doc_id"] for r in sorted(old.collect(), key=lambda r: -r["doc_id"])}
    cross = {
        (r["doc_a"], r["doc_b"])
        for r in ngram_jaccard_pairs(df, threshold=0.3, n=3).collect()
        if (r["doc_a"] % 2) != (r["doc_b"] % 2)
    }
    for doc_id, r in rep.items():
        text = texts[doc_id]
        if text in old_texts:
            assert r["verdict"] == "exact_dup"
        elif any(doc_id in p for p in cross):
            assert r["verdict"] in ("near_dup", "exact_dup")
        else:
            assert r["verdict"] == "unique"


# --- session-addition operators: property checks -----------------------------

IVL = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=0, max_value=40),
    st.integers(min_value=1, max_value=15),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(ivs=st.lists(IVL, min_size=1, max_size=20))
def test_merge_intervals_matches_point_cover(spark, ivs):
    """Merged spans must cover exactly the integer points the raw
    intervals cover, be disjoint, non-touching, and each span's bounds
    must come from input interval bounds."""
    from open_ftth_relational_projector_spark.operators.range_join import (
        merge_intervals,
    )

    rows = [(k, s, s + ln) for k, s, ln in ivs]
    df = spark.createDataFrame(rows, "k string, start long, end long")
    merged = merge_intervals(df, ["k"], "start", "end").collect()

    def cover(spans):
        pts = set()
        for s, e in spans:
            pts.update(range(s, e))
        return pts

    for key in {r[0] for r in rows}:
        raw = [(s, e) for k, s, e in rows if k == key]
        out = sorted((r["start"], r["end"]) for r in merged if r["k"] == key)
        assert cover(raw) == cover(out)
        for (s1, e1), (s2, e2) in zip(out, out[1:]):
            assert e1 < s2  # disjoint AND non-touching (touching merges)


PT = st.tuples(
    st.integers(min_value=0, max_value=15),
    st.integers(min_value=0, max_value=15),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pts=st.lists(PT, min_size=1, max_size=25))
def test_skyline_matches_dominance_definition(spark, pts):
    """Sweep skyline ≡ quadratic NOT-EXISTS dominance on arbitrary point
    sets with heavy ties/duplicates."""
    from open_ftth_relational_projector_spark.operators.skyline import skyline_2d

    rows = [(i, float(x), y) for i, (x, y) in enumerate(pts)]
    df = spark.createDataFrame(rows, "pid long, price double, size int")
    got = sorted(r["pid"] for r in skyline_2d(df, "price", "size").collect())

    def dominated(p, q):
        return q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])

    brute = sorted(
        p[0] for p in rows if not any(dominated(p, q) for q in rows if q[0] != p[0])
    )
    assert got == brute


# --- streaming OLS moment fold: batching invariance (r5 continuation) -------


class _FakeState:
    """Minimal GroupState stand-in for driving a fold function directly."""

    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=0, max_value=10_000),
        ),
        max_size=60,
    ),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=4),
)
@settings(max_examples=200, deadline=None)
def test_ols_fold_batching_invariant(rows, cuts):
    """Folding any micro-batch split of the rows (including empty batches)
    must end in exactly the state of one all-at-once fold, and that state
    must equal direct integer sums — the mergeable-moments contract
    stream_ols_sim's oracle relies on."""
    import pandas as pd

    from open_ftth_relational_projector_spark.streaming.stateful import (
        _ols_fold,
    )

    def pdf(chunk):
        return pd.DataFrame(
            {
                "x1": [a for a, _, _ in chunk],
                "x2": [a for _, a, _ in chunk],
                "y": [a for _, _, a in chunk],
            },
            dtype="int64",
        )

    bounds = sorted({min(c, len(rows)) for c in cuts} | {0, len(rows)})
    batches = [
        rows[a:b] for a, b in zip(bounds, bounds[1:])
    ] or [rows]

    split_state = _FakeState()
    for batch in batches:
        list(_ols_fold(("g",), iter([pdf(batch)]), split_state))
    whole_state = _FakeState()
    list(_ols_fold(("g",), iter([pdf(rows)]), whole_state))
    assert split_state.get == whole_state.get

    n = len(rows)
    want = (
        n,
        sum(a for a, _, _ in rows),
        sum(b for _, b, _ in rows),
        sum(c for _, _, c in rows),
        sum(a * a for a, _, _ in rows),
        sum(a * b for a, b, _ in rows),
        sum(b * b for _, b, _ in rows),
        sum(a * c for a, _, c in rows),
        sum(b * c for _, b, c in rows),
        sum(c * c for _, _, c in rows),
    )
    assert tuple(whole_state.get) == want
