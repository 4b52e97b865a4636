"""Batch/streaming equivalence (SURVEY §5.4) + exactly-once semantics (T5).

The invariant under test: for ANY split of one event log into dehydration
prefix + incremental micro-batches, the sink's final 8 tables equal the
all-batch fold. This pins the reference's bulk-vs-catch-up duality
(RelationalDatabaseProjection.cs:27, 226-264, 460-495) without replicating
its per-event DML.
"""

from __future__ import annotations

import random
import shutil
import tempfile

import pytest

from open_ftth_relational_projector_spark.events.generator import (
    generate,
    to_envelope_rows,
)
from open_ftth_relational_projector_spark.events.reader import EventLog
from open_ftth_relational_projector_spark.events.schemas import ENVELOPE_SCHEMA
from open_ftth_relational_projector_spark.projections import project_all
from open_ftth_relational_projector_spark.sinks import DuckDBSink
from open_ftth_relational_projector_spark.sinks.ddl import PROJECTION_TABLES
from open_ftth_relational_projector_spark.streaming.runner import (
    ProjectionStream,
    apply_batch,
    dehydrate,
    write_envelope_batch,
)


def _canon(pdf, cols):
    return (
        pdf[cols].astype(str).sort_values(cols).reset_index(drop=True)
    )


def _assert_sink_matches(sink, expected):
    for name, exp in expected.items():
        got = sink.read_table(name)
        cols = list(exp.columns)
        assert _canon(exp, cols).equals(_canon(got, cols)), (
            f"{name}: batch fold ({len(exp)} rows) != streamed sink "
            f"({len(got)} rows)"
        )


@pytest.fixture(scope="module")
def envelopes(spark):
    rows = to_envelope_rows(generate(seed=11, scale=4))
    df = spark.createDataFrame(rows, ENVELOPE_SCHEMA).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def expected_tables(envelopes):
    tables = project_all(EventLog.from_envelopes(envelopes))
    return {n: tables[n].toPandas() for n in PROJECTION_TABLES}


def _stream_split(spark, envelopes, bounds, sink):
    dehydrate(envelopes.filter(f"seq <= {bounds[0]}"), sink)
    for i in range(len(bounds) - 1):
        lo, hi = bounds[i], bounds[i + 1]
        batch = envelopes.filter(f"seq > {lo} AND seq <= {hi}")
        full = envelopes.filter(f"seq <= {hi}")
        apply_batch(full, batch, sink, batch_id=i)


@pytest.mark.parametrize("seed,n_cuts", [(42, 3), (7, 5), (1234, 2)])
def test_streaming_equivalence_random_split(
    spark, envelopes, expected_tables, seed, n_cuts
):
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    rng = random.Random(seed)
    cuts = sorted(rng.sample(range(1, max_seq), n_cuts))
    bounds = [*cuts, max_seq]
    sink = DuckDBSink()
    _stream_split(spark, envelopes, bounds, sink)
    _assert_sink_matches(sink, expected_tables)


def test_streaming_equivalence_per_event_tail(spark, envelopes, expected_tables):
    """Smallest batches: dehydrate all but the last 5 events, then apply
    them one at a time — the reference's steady-state shape."""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    bounds = list(range(max_seq - 5, max_seq + 1))
    sink = DuckDBSink()
    _stream_split(spark, envelopes, bounds, sink)
    _assert_sink_matches(sink, expected_tables)


def test_dehydrate_only_equals_batch(spark, envelopes, expected_tables):
    sink = DuckDBSink()
    dehydrate(envelopes, sink)
    _assert_sink_matches(sink, expected_tables)


def test_batch_id_replay_skipped(spark, envelopes, expected_tables):
    """T5: a re-delivered (batch_id, data) pair is a no-op, and a genuine
    re-application of the same data is idempotent."""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    cut = max_seq // 2
    sink = DuckDBSink()
    dehydrate(envelopes.filter(f"seq <= {cut}"), sink)
    batch = envelopes.filter(f"seq > {cut}")
    assert apply_batch(envelopes, batch, sink, batch_id=0) is True
    # same batch_id → skipped
    assert apply_batch(envelopes, batch, sink, batch_id=0) is False
    # different batch_id, same data → idempotent recompute
    assert apply_batch(envelopes, batch, sink, batch_id=1) is True
    _assert_sink_matches(sink, expected_tables)


def test_failed_apply_batch_leaves_sink_unchanged(
    spark, envelopes, expected_tables
):
    """T5 atomicity: a sink failure mid-batch rolls the whole micro-batch
    back — tables, aux state, and batch bookkeeping all revert, and the
    same batch then re-applies cleanly. (The reference's per-statement
    autocommit can strand a half-applied batch; PostgresWriter.cs:72-112.)"""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    cut = max_seq // 2
    sink = DuckDBSink()
    dehydrate(envelopes.filter(f"seq <= {cut}"), sink)
    before = {n: sink.read_table(n) for n in PROJECTION_TABLES}
    batch = envelopes.filter(f"seq > {cut}")

    orig_set_meta = sink.set_meta

    def failing_set_meta(key, value):
        # fires inside the transaction, after every table mutation
        if key == "applied_batch":
            raise RuntimeError("sink failure mid-batch")
        orig_set_meta(key, value)

    sink.set_meta = failing_set_meta
    with pytest.raises(RuntimeError, match="sink failure mid-batch"):
        apply_batch(envelopes, batch, sink, batch_id=0)
    sink.set_meta = orig_set_meta

    assert sink.get_meta("applied_batch") is None
    for name, exp in before.items():
        got = sink.read_table(name)
        cols = list(exp.columns)
        assert _canon(exp, cols).equals(_canon(got, cols)), (
            f"{name} changed by a failed batch"
        )
    # the same batch applies cleanly after the failure
    assert apply_batch(envelopes, batch, sink, batch_id=0) is True
    _assert_sink_matches(sink, expected_tables)


def test_structured_streaming_available_now(spark, envelopes, expected_tables):
    """Real readStream → foreachBatch drain over a file source (S2/T1)."""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    cut = max_seq // 3
    tmp = tempfile.mkdtemp(prefix="ofrp_stream_")
    events_dir, bronze, cp = f"{tmp}/in", f"{tmp}/bronze", f"{tmp}/cp"
    try:
        sink = DuckDBSink()
        prefix = envelopes.filter(f"seq <= {cut}")
        dehydrate(prefix, sink)
        prefix.write.mode("overwrite").parquet(bronze)

        third = (max_seq - cut) // 2
        write_envelope_batch(
            envelopes.filter(f"seq > {cut} AND seq <= {cut + third}"),
            events_dir,
            0,
        )
        write_envelope_batch(
            envelopes.filter(f"seq > {cut + third}"), events_dir, 1
        )

        stream = ProjectionStream(spark, events_dir, sink, bronze, cp)
        q = stream.start(available_now=True)
        assert stream.healthy() or q.isActive is False
        q.awaitTermination(240)
        _assert_sink_matches(sink, expected_tables)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_latest_before_strict():
    from open_ftth_relational_projector_spark.streaming.incremental import (
        _latest_before,
    )

    versions = [(2, "a"), (5, None), (9, "b")]
    assert _latest_before(versions, 1) is None
    assert _latest_before(versions, 2) is None  # strict: vseq < seq
    assert _latest_before(versions, 3) == (2, "a")
    assert _latest_before(versions, 6) == (5, None)  # tombstone visible
    assert _latest_before(versions, 100) == (9, "b")


def test_edge_context_resolves_against_sink_registry(spark):
    """A batch affix referencing a root segment REGISTERED IN AN EARLIER
    BATCH must resolve through the sink aux registry, and an intervening
    removal must tombstone it."""
    from open_ftth_relational_projector_spark.events.reader import EventLog
    from open_ftth_relational_projector_spark.streaming.incremental import (
        build_edge_context,
    )

    sink = DuckDBSink()
    sink.ensure_schema()
    sink.append(
        "_aux_root_segment",
        __import__("pyarrow").table(
            {
                "root_segment_id": ["seg-p1", "seg-p2", "seg-p2"],
                "seq": [1, 2, 6],
                "parent_id": ["p1", "p2", None],  # p2 removed at seq 6
            }
        ),
    )
    parsed = [
        (10, "SpanEquipmentAffixedToParent",
         {"spanEquipmentId": "c1",
          "newUtilityHopList": [{"parentAffixes": [{"spanSegmentId": "seg-p1"}]}]}),
        (11, "SpanEquipmentAffixedToParent",
         {"spanEquipmentId": "c2",
          "newUtilityHopList": [{"parentAffixes": [{"spanSegmentId": "seg-p2"}]}]}),
    ]
    ids = {"span": ["c1", "c2"], "cable": ["c1", "c2"]}
    full = EventLog.from_typed(spark, {})
    ctx = build_edge_context(full, parsed, ids, sink)
    resolved = sorted(
        zip(
            ctx.new_edges.column("child_id").to_pylist(),
            ctx.new_edges.column("parent_id").to_pylist(),
        )
    )
    # c1 -> p1 resolves; c2's parent was tombstoned before the affix
    assert resolved == [("c1", "p1")]
    assert set(ctx.all_eq) == {"c1", "c2", "p1"}


def test_spec_only_batch_feeds_later_placements(spark, envelopes, expected_tables):
    """A batch containing ONLY spec-add events (no span entities) must still
    land in the aux spec registry, so placements in LATER batches resolve
    spec_name/outer_diameter — the regression behind the seed-42 split."""
    from open_ftth_relational_projector_spark.streaming.replay import (
        fold_spec_registry,
    )

    parsed = [
        (2, "SpanStructureSpecificationAdded",
         {"specification": {"id": "ss1", "outerDiameter": 40}}),
        (3, "SpanEquipmentSpecificationAdded",
         {"specification": {"id": "sp1", "name": "Conduit Ø40",
                            "rootTemplate": {"spanStructureSpecificationId": "ss1"}}}),
        # same key re-added later in the batch: last one wins
        (4, "SpanEquipmentSpecificationAdded",
         {"specification": {"id": "sp1", "name": "Conduit Ø40 v2",
                            "rootTemplate": {"spanStructureSpecificationId": "ss1"}}}),
    ]
    out = fold_spec_registry(parsed)
    assert out["_aux_span_spec"].to_pylist() == [
        {"spec_id": "sp1", "name": "Conduit Ø40 v2", "struct_spec_id": "ss1",
         "is_cable": None}
    ]
    assert out["_aux_struct_spec"].to_pylist() == [
        {"struct_spec_id": "ss1", "outer_diameter": 40}
    ]
    assert fold_spec_registry([(1, "SpanEquipmentMoved", {})]) == {}

    # end-to-end: batch boundaries straddling the generator's spec block
    # (seqs 14-40 at scale=4/seed=11 are all spec adds)
    sink = DuckDBSink()
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    _stream_split(spark, envelopes, [10, 30, max_seq], sink)
    _assert_sink_matches(sink, expected_tables)


def test_fold_has_child_matches_spark_fold(spark):
    """The driver-side has-child fold must agree with the Spark
    _has_child_final over a full generated log's edge/detach sets."""
    from open_ftth_relational_projector_spark.projections.core import (
        _has_child_final,
        _parent_edges,
    )
    from open_ftth_relational_projector_spark.streaming.incremental import (
        _fold_has_child,
    )
    from pyspark.sql import functions as F

    env = spark.createDataFrame(
        to_envelope_rows(generate(seed=7, scale=15)), ENVELOPE_SCHEMA
    )
    log = EventLog.from_envelopes(env)
    edges_df = _parent_edges(log)
    edges = [
        (r.child_id, r.seq, r.parent_id)
        for r in edges_df.select("child_id", "seq", "parent_id").collect()
    ]
    detaches = [
        (r.child_id, r.seq)
        for r in log.of("SpanEquipmentDetachedFromParent")
        .select(F.col("spanEquipmentId").alias("child_id"), "seq")
        .collect()
    ]
    spark_rows = {
        (r.id, r.has_child) for r in _has_child_final(log).collect()
    }
    driver_rows = set(_fold_has_child(edges, detaches))
    assert driver_rows == spark_rows
    assert len(driver_rows) > 0


def test_apply_batch_large_batch_fallback(spark, monkeypatch):
    """Batches above MAX_DRIVER_BATCH_ROWS never reach the driver in
    full: only the bounded size PROBE (cap+1 rows) is collected — touched
    keys come from a distributed distinct aggregation, the driver-side
    edge path is skipped, and the distributed full-recompute fallback
    produces the same tables — the bounded-catch-up guarantee for a
    post-downtime backlog batch."""
    import open_ftth_relational_projector_spark.streaming.incremental as I
    import open_ftth_relational_projector_spark.streaming.runner as R

    env = spark.createDataFrame(
        to_envelope_rows(generate(seed=21, scale=6)), ENVELOPE_SCHEMA
    ).cache()
    tables = project_all(EventLog.from_envelopes(env))
    expected = {n: tables[n].toPandas() for n in PROJECTION_TABLES}

    max_seq = env.agg({"seq": "max"}).collect()[0][0]
    cut = int(max_seq * 0.5)
    monkeypatch.setattr(I, "MAX_DRIVER_BATCH_ROWS", 0)

    real_probe = R._probe_collect
    collected_sizes = []

    def bounded_probe(batch_envelopes, cap):
        rows = real_probe(batch_envelopes, cap)
        collected_sizes.append(len(rows))
        return rows

    monkeypatch.setattr(R, "_probe_collect", bounded_probe)
    sink = DuckDBSink()
    dehydrate(env.filter(f"seq <= {cut}"), sink)
    apply_batch(env, env.filter(f"seq > {cut}"), sink, batch_id=0)
    # with the cap at 0, every collect was the 1-row probe — the batch
    # body (hundreds of rows) never reached the driver
    assert collected_sizes and max(collected_sizes) <= 1
    _assert_sink_matches(sink, expected)


def test_affected_ids_distributed_matches_driver_extraction(spark):
    """The no-collect key extraction must name exactly the same touched
    entities per domain as the driver-side parsed-payload walk."""
    from open_ftth_relational_projector_spark.streaming.incremental import (
        affected_ids_distributed,
        affected_ids_from_rows,
        collect_batch,
    )

    env = spark.createDataFrame(
        to_envelope_rows(generate(seed=33, scale=5)), ENVELOPE_SCHEMA
    ).cache()
    max_seq = env.agg({"seq": "max"}).collect()[0][0]
    batch = env.filter(f"seq > {int(max_seq * 0.4)}")
    via_driver = affected_ids_from_rows(collect_batch(batch))
    via_spark = affected_ids_distributed(EventLog.from_envelopes(batch))
    assert via_spark == via_driver


def test_backlog_replay_bounded_batches(spark, envelopes, expected_tables):
    """Long-downtime catch-up: many landed batch files drain under
    maxFilesPerTrigger=1, so every micro-batch holds one poll interval of
    events (bounded driver rows) instead of the whole backlog — and the
    final tables still equal the batch replay."""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    cut = max_seq // 3
    tmp = tempfile.mkdtemp(prefix="ofrp_backlog_")
    events_dir, bronze, cp = f"{tmp}/in", f"{tmp}/bronze", f"{tmp}/cp"
    try:
        sink = DuckDBSink()
        prefix = envelopes.filter(f"seq <= {cut}")
        dehydrate(prefix, sink)
        prefix.write.mode("overwrite").parquet(bronze)

        # the "downtime backlog": 5 poll intervals landed before restart
        n_files = 5
        step = (max_seq - cut) // n_files + 1
        for i in range(n_files):
            lo, hi = cut + i * step, min(cut + (i + 1) * step, max_seq)
            if lo >= max_seq:
                break
            write_envelope_batch(
                envelopes.filter(f"seq > {lo} AND seq <= {hi}"), events_dir, i
            )

        stream = ProjectionStream(
            spark, events_dir, sink, bronze, cp, max_files_per_trigger=1
        )
        batch_sizes = []
        orig_process = stream._process

        def counting_process(batch_df, batch_id):
            batch_sizes.append(batch_df.count())
            orig_process(batch_df, batch_id)

        stream._process = counting_process
        q = stream.start(available_now=True)
        q.awaitTermination(240)
        # one landed file per micro-batch: the backlog drained in ≥ n_files
        # bounded slices, never as one giant batch
        assert len(batch_sizes) >= n_files
        total = envelopes.filter(f"seq > {cut}").count()
        assert sum(batch_sizes) == total
        assert max(batch_sizes) < total
        _assert_sink_matches(sink, expected_tables)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_cable_nonretrigger_and_walk_version_resolution(spark):
    """Hand-crafted adversarial sequence for the driver-side cable replay:

    * batch 1 re-places the equipment with a NON-cable spec AND modifies
      the walk — NOT a valid trigger, so the cable rows must stay at the
      original placement's walk resolution (the distributed path would
      rewrite identical rows; the replay must not delete them);
    * batch 2 affixes the equipment — a real trigger — so the rows must
      re-resolve against the MODIFIED walk.
    Final state is checked against the full-log batch fold at each step.
    """
    import json

    from open_ftth_relational_projector_spark.operators.arrays import EMPTY_GUID

    def seg(root):
        return [{"spanSegments": [{
            "id": root, "fromNodeOfInterestIndex": 0,
            "toNodeOfInterestIndex": 1,
            "fromTerminalId": EMPTY_GUID, "toTerminalId": EMPTY_GUID,
        }]}]

    E, I, P = "eq-1", "int-1", "parent-1"
    events = [
        (1, "SpanStructureSpecificationAdded",
         {"specification": {"id": "ss", "outerDiameter": 40}}),
        (2, "SpanEquipmentSpecificationAdded",
         {"specification": {"id": "cable-spec", "name": "Fiber", "isCable": True,
                            "rootTemplate": {"spanStructureSpecificationId": "ss"}}}),
        (3, "SpanEquipmentSpecificationAdded",
         {"specification": {"id": "plain-spec", "name": "Conduit", "isCable": False,
                            "rootTemplate": {"spanStructureSpecificationId": "ss"}}}),
        (4, "WalkOfInterestRegistered",
         {"interest": {"id": I, "routeNetworkElementRefs": ["n1", "n2", "n3"]}}),
        (5, "WalkOfInterestRegistered",
         {"interest": {"id": "int-p", "routeNetworkElementRefs": ["n1", "n9"]}}),
        (6, "SpanEquipmentPlacedInRouteNetwork",
         {"equipment": {"id": P, "name": "parent", "specificationId": "plain-spec",
                        "walkOfInterestId": "int-p", "nodesOfInterestIds": ["n1", "n9"],
                        "isCable": False, "spanStructures": seg("rs-p"),
                        "utilityNetworkHops": None, "addressInfo": None}}),
        (7, "SpanEquipmentPlacedInRouteNetwork",  # cable trigger @7
         {"equipment": {"id": E, "name": "cable", "specificationId": "cable-spec",
                        "walkOfInterestId": I, "nodesOfInterestIds": ["n1", "n3"],
                        "isCable": True, "spanStructures": seg("rs-e"),
                        "utilityNetworkHops": None, "addressInfo": None}}),
        # --- batch 1: walk modified, then NON-cable re-placement (no trigger)
        (8, "WalkOfInterestRouteNetworkElementsModified",
         {"interestId": I, "routeNetworkElementIds": ["n4", "n5"]}),
        (9, "SpanEquipmentPlacedInRouteNetwork",
         {"equipment": {"id": E, "name": "cable2", "specificationId": "plain-spec",
                        "walkOfInterestId": I, "nodesOfInterestIds": ["n4", "n5"],
                        "isCable": False, "spanStructures": seg("rs-e"),
                        "utilityNetworkHops": None, "addressInfo": None}}),
        # --- batch 2: affix = real trigger → resolves the MODIFIED walk
        (10, "SpanEquipmentAffixedToParent",
         {"spanEquipmentId": E,
          "newUtilityHopList": [{"fromNodeId": "zz", "toNodeId": "zz",
                                 "parentAffixes": [{"spanSegmentId": "rs-p"}]}]}),
    ]
    rows = [(s, t, json.dumps(p)) for s, t, p in events]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA).cache()

    def rel_rows(sink):
        return sorted(
            map(
                tuple,
                sink.fetch_df(
                    'SELECT fiber_cable_id, route_network_element_id, seq_no '
                    'FROM utility_network."rel_fiber_cable_to_route_element"'
                ).itertuples(index=False, name=None),
            )
        )

    sink = DuckDBSink()
    dehydrate(env.filter("seq <= 7"), sink)
    assert rel_rows(sink) == [(E, "n1", 1), (E, "n2", 2), (E, "n3", 3)]

    apply_batch(env.filter("seq <= 9"), env.filter("seq IN (8, 9)"), sink, batch_id=0)
    # non-trigger batch: rows still resolve the ORIGINAL placement's walk
    assert rel_rows(sink) == [(E, "n1", 1), (E, "n2", 2), (E, "n3", 3)]

    apply_batch(env.filter("seq <= 10"), env.filter("seq = 10"), sink, batch_id=1)
    # affix trigger re-resolves against the modified walk
    assert rel_rows(sink) == [(E, "n4", 1), (E, "n5", 2)]

    # and the whole sink equals the batch fold of the full log
    tables = project_all(EventLog.from_envelopes(env))
    _assert_sink_matches(
        sink, {n: tables[n].toPandas() for n in PROJECTION_TABLES}
    )


def test_service_termination_giveup_guards_across_batches(spark):
    """The three give-up guards under batch boundaries: a terminal placed
    (a) after its container was removed in a PREVIOUS batch → dropped,
    (b) before its spec exists (spec arrives later in the SAME batch) →
    dropped (frozen-at-use as-of semantics: late specs don't resurrect),
    (c) with everything resolvable → kept, with the container's node."""
    import json

    events = [
        (1, "NodeContainerSpecificationAdded",
         {"specification": {"id": "ncs", "name": "Cab", "category": "cab"}}),
        (2, "TerminalEquipmentSpecificationAdded",
         {"specification": {"id": "ts-ok", "isCustomerTermination": True}}),
        (3, "NodeContainerPlacedInRouteNetwork",
         {"container": {"id": "c1", "routeNodeId": "rn1", "specificationId": "ncs"}}),
        (4, "NodeContainerPlacedInRouteNetwork",
         {"container": {"id": "c2", "routeNodeId": "rn2", "specificationId": "ncs"}}),
        # --- batch 1: c2 removed
        (5, "NodeContainerRemovedFromRouteNetwork", {"nodeContainerId": "c2"}),
        # --- batch 2: three placements exercising the guards
        (6, "TerminalEquipmentPlacedInNodeContainer",  # (a) container gone
         {"equipment": {"id": "t-a", "name": "A", "specificationId": "ts-ok",
                        "nodeContainerId": "c2", "addressInfo": None}}),
        (7, "TerminalEquipmentPlacedInNodeContainer",  # (b) spec not yet added
         {"equipment": {"id": "t-b", "name": "B", "specificationId": "ts-late",
                        "nodeContainerId": "c1", "addressInfo": None}}),
        (8, "TerminalEquipmentSpecificationAdded",  # arrives AFTER t-b
         {"specification": {"id": "ts-late", "isCustomerTermination": True}}),
        (9, "TerminalEquipmentPlacedInNodeContainer",  # (c) all resolvable
         {"equipment": {"id": "t-c", "name": "C", "specificationId": "ts-ok",
                        "nodeContainerId": "c1",
                        "addressInfo": {"accessAddressId": "aa",
                                        "unitAddressId": None}}}),
    ]
    rows = [(s, t, json.dumps(p)) for s, t, p in events]
    env = spark.createDataFrame(rows, ENVELOPE_SCHEMA).cache()

    sink = DuckDBSink()
    dehydrate(env.filter("seq <= 4"), sink)
    apply_batch(env.filter("seq <= 5"), env.filter("seq = 5"), sink, batch_id=0)
    apply_batch(env.filter("seq <= 9"), env.filter("seq > 5"), sink, batch_id=1)

    got = sorted(
        map(tuple, sink.fetch_df(
            'SELECT id, route_node_id, name FROM utility_network."service_termination"'
        ).itertuples(index=False, name=None))
    )
    assert got == [("t-c", "rn1", "C")]

    tables = project_all(EventLog.from_envelopes(env))
    _assert_sink_matches(
        sink, {n: tables[n].toPandas() for n in PROJECTION_TABLES}
    )


def test_projection_stream_checkpoint_restart(spark, envelopes, expected_tables):
    """T2/T5 across process generations: drain part of the backlog, STOP
    the query, land more files, start a FRESH ProjectionStream on the
    same checkpoint — the restarted query must resume from the
    checkpoint (not re-apply run 1's files) and the final tables must
    equal the batch replay."""
    max_seq = envelopes.agg({"seq": "max"}).collect()[0][0]
    cut = max_seq // 3
    mid = cut + (max_seq - cut) // 2
    tmp = tempfile.mkdtemp(prefix="ofrp_restart_")
    events_dir, bronze, cp = f"{tmp}/in", f"{tmp}/bronze", f"{tmp}/cp"
    try:
        sink = DuckDBSink()
        prefix = envelopes.filter(f"seq <= {cut}")
        dehydrate(prefix, sink)
        prefix.write.mode("overwrite").parquet(bronze)

        write_envelope_batch(
            envelopes.filter(f"seq > {cut} AND seq <= {mid}"), events_dir, 0
        )
        s1 = ProjectionStream(spark, events_dir, sink, bronze, cp)
        q1 = s1.start(available_now=True)
        q1.awaitTermination(240)

        # second generation: new files, fresh query object, same checkpoint
        write_envelope_batch(
            envelopes.filter(f"seq > {mid}"), events_dir, 1
        )
        applied_before = sink.get_meta("applied_batch")
        s2 = ProjectionStream(spark, events_dir, sink, bronze, cp)
        q2 = s2.start(available_now=True)
        q2.awaitTermination(240)

        # the restarted query processed only the NEW file (batch ids
        # continue, they don't reset to 0 and re-apply run 1's data)
        assert sink.get_meta("applied_batch") != applied_before
        _assert_sink_matches(sink, expected_tables)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_apply_batch_probe_seq_first_skips_payload_pull(spark, monkeypatch):
    """probe_seq_first=True (the backlog-plausible first batch after a
    (re)start): an OVERSIZED batch must never collect payload rows at all
    — the seq-only probe sizes it, min/max come from the distributed
    aggregate, and the result still matches the full recompute. A
    driver-sized batch under the same flag still collects its (bounded)
    body once and applies identically."""
    import open_ftth_relational_projector_spark.streaming.incremental as I
    import open_ftth_relational_projector_spark.streaming.runner as R

    env = spark.createDataFrame(
        to_envelope_rows(generate(seed=23, scale=6)), ENVELOPE_SCHEMA
    ).cache()
    tables = project_all(EventLog.from_envelopes(env))
    expected = {n: tables[n].toPandas() for n in PROJECTION_TABLES}

    max_seq = env.agg({"seq": "max"}).collect()[0][0]
    cut = int(max_seq * 0.5)

    payload_pulls = []
    real_probe = R._probe_collect

    def counting_probe(batch_envelopes, cap):
        rows = real_probe(batch_envelopes, cap)
        payload_pulls.append(len(rows))
        return rows

    monkeypatch.setattr(R, "_probe_collect", counting_probe)

    # oversized (cap 0): payload probe must not run at all
    monkeypatch.setattr(I, "MAX_DRIVER_BATCH_ROWS", 0)
    sink = DuckDBSink()
    dehydrate(env.filter(f"seq <= {cut}"), sink)
    apply_batch(
        env, env.filter(f"seq > {cut}"), sink, batch_id=0, probe_seq_first=True
    )
    assert payload_pulls == []
    _assert_sink_matches(sink, expected)

    # driver-sized under the flag: one bounded payload pull, same result
    monkeypatch.setattr(I, "MAX_DRIVER_BATCH_ROWS", 10_000)
    sink2 = DuckDBSink()
    dehydrate(env.filter(f"seq <= {cut}"), sink2)
    apply_batch(
        env, env.filter(f"seq > {cut}"), sink2, batch_id=0, probe_seq_first=True
    )
    assert len(payload_pulls) == 1
    _assert_sink_matches(sink2, expected)
