"""Property-based CDC semantics: for ANY op sequence per key, the
pipeline's table state equals a pure-Python latest-wins-then-delete
oracle (SURVEY §5e). Catches ordering, tie-break, and routing bugs the
fixed demo batches can't."""

from datetime import datetime, timezone

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from automation_of_building_a_transactional_data_lake_spark.formats.parquet_cow import (
    ParquetCowTable,
    temp_warehouse,
)
from automation_of_building_a_transactional_data_lake_spark.pipeline import apply_cdc_batch
from automation_of_building_a_transactional_data_lake_spark.spec import TableSpec

_OP_RANK = {"I": 0, "U": 1, "D": 2}

# Per key: whether it pre-exists, plus a sequence of ops at distinct
# times (distinct so the only tie-breaking exercised is the op rank,
# which both implementations define identically).
key_history = st.tuples(
    st.booleans(),
    st.lists(st.sampled_from("IUD"), min_size=0, max_size=5),
)


def python_oracle(initial: dict, cdc_rows: list) -> dict:
    """latest (ts, op-rank) wins; D deletes, I/U upserts."""
    state = dict(initial)
    latest: dict = {}
    for key, ts, op, val in cdc_rows:
        cur = latest.get(key)
        if cur is None or (ts, _OP_RANK[op]) > (cur[0], _OP_RANK[cur[1]]):
            latest[key] = (ts, op, val)
    for key, (_ts, op, val) in latest.items():
        if op == "D":
            state.pop(key, None)
        else:
            state[key] = val
    return state


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(histories=st.dictionaries(st.integers(0, 9), key_history, min_size=1, max_size=6))
def test_cdc_apply_matches_python_oracle(spark, histories):
    initial = {k: "init" for k, (pre, _ops) in histories.items() if pre}
    cdc_rows = [
        (k, ts, op, f"{k}@{ts}:{op}")
        for k, (_pre, ops) in histories.items()
        for ts, op in enumerate(ops)
    ]

    spec = TableSpec("prop_t", "id", None, None, "propdb")
    tbl = ParquetCowTable(spark, temp_warehouse("prop_"), spec)
    tbl.create(
        spark.createDataFrame(
            [(k, v) for k, v in initial.items()] or [(None, None)],
            "id long, val string",
        ).filter("id IS NOT NULL")
    )
    if cdc_rows:
        batch = spark.createDataFrame(
            [
                ("%s" % op, datetime(2023, 1, 1, 0, 0, ts, tzinfo=timezone.utc), k, v)
                for (k, ts, op, v) in cdc_rows
            ],
            "Op string, timestamp timestamp, id long, val string",
        )
        apply_cdc_batch(batch, tbl, spec, clock=datetime(2023, 2, 1, tzinfo=timezone.utc))

    got = {r.id: r.val for r in tbl.read().select("id", "val").collect()}
    assert got == python_oracle(initial, cdc_rows)


# -- model-based merge sequences across formats ------------------------------

# A batch maps key -> upsert value or delete marker (unique keys per
# batch, as MERGE requires). Partition value derives from the key with
# a NULL branch, so sequences exercise null partitions, Hive-default
# routing, and cross-partition moves under the round-3 merge rewrite.
_batch = st.dictionaries(
    st.integers(0, 9),
    st.one_of(st.none(), st.text("abX", min_size=1, max_size=3)),
    min_size=1,
    max_size=5,
)


def _cat(k: int) -> str | None:
    return None if k % 3 == 0 else str(k % 3)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(batches=st.lists(_batch, min_size=1, max_size=3))
def test_merge_sequences_match_dict_model_across_formats(spark, batches):
    """ANY sequence of upsert/delete merge batches leaves the
    partitioned-CoW table and the MoR table equal to a plain dict
    model — format equivalence and merge semantics under arbitrary
    interleavings, not just the fixed demo batches."""
    from automation_of_building_a_transactional_data_lake_spark.formats.parquet_mor import (
        ParquetMorTable,
    )

    initial = {k: "init" for k in (0, 1, 2)}
    model = dict(initial)
    spec_cow = TableSpec("seq_cow", "id", "cat", None, "propdb")
    spec_mor = TableSpec("seq_mor", "id", None, None, "propdb")
    spec_dv = TableSpec("seq_dv", "id", None, None, "propdb")
    cow = ParquetCowTable(spark, temp_warehouse("seq_"), spec_cow)
    mor = ParquetMorTable(spark, temp_warehouse("seq_"), spec_mor)
    # Deletion-vector MoR joins the same model (r7: the DV read path
    # must agree with classic reconcile under ANY merge interleaving).
    dv = ParquetMorTable(
        spark, temp_warehouse("seq_"), spec_dv, deletion_vectors=True
    )
    init_rows = [(k, v, _cat(k)) for k, v in initial.items()]
    cow.create(spark.createDataFrame(init_rows, "id long, val string, cat string"))
    mor.create(spark.createDataFrame(init_rows, "id long, val string, cat string"))
    dv.create(spark.createDataFrame(init_rows, "id long, val string, cat string"))

    for batch in batches:
        ups = {k: v for k, v in batch.items() if v is not None}
        dels = [k for k, v in batch.items() if v is None]
        if ups:
            src = spark.createDataFrame(
                [(k, v, _cat(k)) for k, v in ups.items()],
                "id long, val string, cat string",
            )
            cow.merge_upsert(src)
            mor.merge_upsert(src)
            dv.merge_upsert(src)
            model.update(ups)
        if dels:
            src = spark.createDataFrame([(k,) for k in dels], "id long")
            cow.merge_delete(src)
            mor.merge_delete(src)
            dv.merge_delete(src)
            for k in dels:
                model.pop(k, None)

    got_cow = {r.id: (r.val, r.cat) for r in cow.read().collect()}
    got_mor = {r.id: (r.val, r.cat) for r in mor.read().collect()}
    got_dv = {r.id: (r.val, r.cat) for r in dv.read().collect()}
    want = {k: (v, _cat(k)) for k, v in model.items()}
    assert got_cow == want
    assert got_mor == want
    assert got_dv == want


# -- stats skipping is never lossy -------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    vals=st.lists(st.integers(-1000, 1000), min_size=1, max_size=40),
    lo=st.integers(-1100, 1100),
    span=st.integers(0, 500),
)
def test_read_skipping_equals_full_filter(spark, vals, lo, span):
    """SAFETY property of file-level stats skipping: for ANY data
    layout and ANY range (including empty and out-of-bounds ranges),
    the skipped read returns exactly the rows of the full-scan filter
    — pruning may open fewer files, never lose rows."""
    hi = lo + span
    spec = TableSpec("skip_prop", "id", None, None, "propdb")
    tbl = ParquetCowTable(spark, temp_warehouse("skip_"), spec)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "id long, v long"
    ).repartition(3)
    tbl.create(df)
    got = sorted((r.id, r.v) for r in tbl.read_skipping("v", lo, hi).collect())
    want = sorted(
        (r.id, r.v) for r in tbl.read().filter(f"v >= {lo} AND v <= {hi}").collect()
    )
    assert got == want
