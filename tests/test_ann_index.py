"""ManagedAnnIndex: CDC-maintained ANN index over a managed table.

The round-5 review's gap: per-call IVF/PQ builds mean a full index
rebuild after every merge at scale. These gates pin the incremental
path: refresh encodes ONLY the change feed's rows (plan + telemetry
asserts), the incremental state equals a frozen-quantizer full
re-encode after a random merge sequence, and the pipeline wiring
(`maintain_all(ann_indexes=)`) drives it end-to-end.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from automation_of_building_a_transactional_data_lake_spark.catalog import Catalog
from automation_of_building_a_transactional_data_lake_spark.operators.ann_index import (
    ManagedAnnIndex,
)
from automation_of_building_a_transactional_data_lake_spark.pipeline import maintain_all
from automation_of_building_a_transactional_data_lake_spark.spec import TableSpec

SPEC = TableSpec("emb_src", "vec_id", database="testdb")
DIM = 8


def _vec(rng):
    return [float(x) for x in rng.rand(DIM)]


def _mk(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _seed_source(spark, warehouse, n=120, seed=7):
    rng = np.random.RandomState(seed)
    cat = Catalog(spark, warehouse)
    cat.table(SPEC).create(_mk(spark, [(i, _vec(rng)) for i in range(n)]))
    return cat, rng


def _index_state(idx):
    """Comparable index contents (vectors rounded to kill any
    float-formatting noise; kernels are deterministic so exact match
    is expected anyway)."""
    rows = idx._table().read().collect()
    out = set()
    for r in rows:
        d = r.asDict()
        key = (d["vec_id"], d["cluster_id"])
        if "pq_code" in d:
            key += (bytes(d["pq_code"]),)
        if "embedding" in d:
            key += (tuple(round(v, 12) for v in d["embedding"]),)
        out.add(key)
    return out


def _frozen_full_reencode_state(idx):
    """What a from-scratch encode of the CURRENT source under the SAME
    frozen quantizer yields — the equivalence target for any sequence
    of incremental refreshes."""
    df = idx._encode(idx._source().read(), idx._read_meta())
    out = set()
    for r in df.collect():
        d = r.asDict()
        key = (d["vec_id"], d["cluster_id"])
        if "pq_code" in d:
            key += (bytes(d["pq_code"]),)
        if "embedding" in d:
            key += (tuple(round(v, 12) for v in d["embedding"]),)
        out.add(key)
    return out


@pytest.mark.parametrize("pq_m", [None, 4])
def test_incremental_refresh_equals_frozen_full_rebuild(spark, tmp_path, pq_m):
    """A random merge sequence (inserts + vector updates + deletes),
    refreshing after every merge, must leave the index EXACTLY equal to
    one full re-encode of the final source under the frozen quantizer —
    and each refresh must report having encoded exactly the rows that
    changed, nothing more."""
    cat, rng = _seed_source(spark, str(tmp_path))
    src = cat.table(SPEC)
    idx = ManagedAnnIndex(cat, SPEC, ivf_k=4, pq_m=pq_m)
    assert idx.build()["action"] == "built"

    live = set(range(120))
    next_id = 120
    for _ in range(3):
        upd = list(rng.choice(sorted(live), size=5, replace=False))
        ins = list(range(next_id, next_id + 3))
        next_id += 3
        src.merge_upsert(_mk(spark, [(int(i), _vec(rng)) for i in upd + ins]))
        live |= set(ins)
        dels = [int(x) for x in rng.choice(sorted(live), size=2, replace=False)]
        src.merge_delete(spark.createDataFrame([(d,) for d in dels], "vec_id long"))
        live -= set(dels)

        t = idx.refresh()
        assert t["action"] == "refreshed"
        # Deleted-then-reinserted interplay aside (ids are fresh), the
        # refresh touches exactly the merged keys: 5 updates + 3
        # inserts encoded, 2 deletes removed.
        assert t["encoded"] == 8
        assert t["deleted"] == 2
        # The encode kernels ran over the CDF-derived changed subset —
        # the plan carries the change feed's anti/semi joins, not a
        # bare source scan.
        assert "LeftAnti" in idx.last_refresh_encode_plan

    assert _index_state(idx) == _frozen_full_reencode_state(idx)
    assert idx._table().read().count() == len(live)


def test_refresh_noop_and_vacuum_fallback(spark, tmp_path):
    """No source change -> noop without touching the index. Once vacuum
    drops the indexed snapshot, refresh must fall back to ONE full
    re-encode under the same frozen quantizer (never a retrain) and
    still converge to the correct state."""
    cat, rng = _seed_source(spark, str(tmp_path))
    src = cat.table(SPEC)
    idx = ManagedAnnIndex(cat, SPEC, ivf_k=4)
    idx.build()
    centroids_before = idx._read_meta()["centroids"]
    assert idx.refresh()["action"] == "noop"

    # Two merges + a vacuum retaining only the head: the indexed
    # version is gone, the incremental diff impossible.
    src.merge_upsert(_mk(spark, [(200, _vec(rng)), (201, _vec(rng))]))
    src.merge_upsert(_mk(spark, [(0, _vec(rng))]))
    src.vacuum(retain_last=1)
    t = idx.refresh()
    assert t["action"] == "reencoded_full"
    assert idx._read_meta()["centroids"] == centroids_before  # frozen
    assert _index_state(idx) == _frozen_full_reencode_state(idx)


def test_maintain_all_refreshes_index_before_vacuum(spark, tmp_path):
    """Pipeline wiring: maintain_all(ann_indexes=) refreshes the index
    incrementally BEFORE vacuum can drop the diff window, and reports
    telemetry. The index table itself lives in the catalog like any
    other managed table."""
    cat, rng = _seed_source(spark, str(tmp_path))
    src = cat.table(SPEC)
    idx = ManagedAnnIndex(cat, SPEC, ivf_k=4)
    idx.build()
    src.merge_upsert(_mk(spark, [(300, _vec(rng)), (5, _vec(rng))]))

    reports = maintain_all(cat, [SPEC], vacuum_retain_last=1, ann_indexes=[idx])
    by_table = {r.table: r for r in reports}
    ann = by_table["emb_src_ann_idx"]
    assert ann.action == "ann_refreshed"
    assert ann.telemetry["encoded"] == 2 and ann.telemetry["deleted"] == 0
    assert _index_state(idx) == _frozen_full_reencode_state(idx)
    assert "emb_src_ann_idx" in cat.list_tables("testdb")


def test_index_topk_matches_bruteforce_when_exhaustive(spark, tmp_path):
    """Search through the maintained index: with nprobe == ivf_k the
    probe set is exhaustive, so vector-mode top-k must equal brute
    force exactly; PQ mode with a corpus-wide re-rank likewise."""
    cat, rng = _seed_source(spark, str(tmp_path), n=80)
    src = cat.table(SPEC)
    q = _vec(rng)

    from automation_of_building_a_transactional_data_lake_spark.operators.similarity import (
        cosine_similarity_col,
    )

    qcol = F.array(*[F.lit(v) for v in q])
    brute = [
        (r.vec_id, round(r.cos_sim, 9))
        for r in src.read()
        .withColumn("cos_sim", cosine_similarity_col(F.col("embedding"), qcol))
        .orderBy(F.col("cos_sim").desc(), "vec_id")
        .limit(5)
        .collect()
    ]

    ivf = ManagedAnnIndex(cat, SPEC, ivf_k=4)
    ivf.build()
    got = [(r.vec_id, round(r.cos_sim, 9)) for r in ivf.topk(q, k=5, nprobe=4).collect()]
    assert got == brute

    pq = ManagedAnnIndex(cat, SPEC, ivf_k=4, pq_m=4, index_name="emb_src_ann_idx_pq")
    pq.build()
    got_pq = [
        (r.vec_id, round(r.cos_sim, 9))
        for r in pq.topk(q, k=5, nprobe=4, rerank=200).collect()
    ]
    assert got_pq == brute


def test_cdc_pipeline_to_index_refresh_end_to_end(spark, tmp_path):
    """The full loop a production deployment runs: raw-zone initial
    load -> build index -> CDC batch (envelope Op/timestamp) merges
    upserts+deletes -> maintain_all refreshes the index incrementally
    — final index state equals the frozen-quantizer re-encode of the
    post-CDC table, and the refresh touched only the batch's keys."""
    import numpy as np

    from automation_of_building_a_transactional_data_lake_spark.pipeline import (
        cdc_load,
        initial_load,
    )

    rng = np.random.RandomState(11)
    spec = TableSpec("emb_cdc", "vec_id", None, None, "testdb")
    raw = tmp_path / "raw"
    init_dir = raw / "initial-load" / "testdb" / "emb_cdc"
    cdc_dir = raw / "cdc-load" / "testdb" / "emb_cdc"
    spark.createDataFrame(
        [(i, _vec(rng)) for i in range(90)], "vec_id long, embedding array<double>"
    ).write.parquet(str(init_dir))
    # CDC envelope: 2 updates, 1 insert, 1 delete.
    spark.createDataFrame(
        [
            ("U", "2024-01-02 00:00:00", 3, _vec(rng)),
            ("U", "2024-01-02 00:00:00", 7, _vec(rng)),
            ("I", "2024-01-02 00:00:00", 90, _vec(rng)),
            ("D", "2024-01-02 00:00:00", 11, _vec(rng)),
        ],
        "Op string, timestamp string, vec_id long, embedding array<double>",
    ).write.parquet(str(cdc_dir))

    cat = Catalog(spark, str(tmp_path / "wh"))
    assert initial_load(spark, cat, spec, str(raw)).action == "created"
    idx = ManagedAnnIndex(cat, spec, ivf_k=4)
    idx.build()

    r = cdc_load(spark, cat, spec, str(raw))
    assert r.action == "merged" and r.telemetry["D"] == 1
    reports = maintain_all(cat, [spec], ann_indexes=[idx])
    ann = {x.table: x for x in reports}["emb_cdc_ann_idx"]
    assert ann.telemetry["encoded"] == 3 and ann.telemetry["deleted"] == 1
    assert _index_state(idx) == _frozen_full_reencode_state(idx)
    assert idx._table().read().count() == 90  # 90 - 1 delete + 1 insert


def test_refresh_serialized_by_maintenance_lock(spark, tmp_path):
    """build/refresh are serialized per index (r6 advisory: the
    merge+meta sequence in refresh is not atomic, so two interleaved
    refreshes could pin indexed_version to a head whose change window
    ran under the other writer's meta). A held maintenance lock makes a
    concurrent refresh raise a timeout conflict, not interleave; a
    STALE lock (crashed maintainer) is broken and the refresh proceeds."""
    import os
    import time

    from automation_of_building_a_transactional_data_lake_spark.formats.parquet_cow import (
        ConcurrentWriteError,
    )
    from automation_of_building_a_transactional_data_lake_spark.operators.ann_index import (
        _MAINT_LOCK,
    )

    cat, rng = _seed_source(spark, str(tmp_path))
    idx = ManagedAnnIndex(cat, SPEC, ivf_k=4)
    idx.build()
    lock = os.path.join(idx._table().path, _MAINT_LOCK)

    # Fresh lock held by a live maintainer: the second refresh conflicts.
    with idx._maintenance_lock():
        assert os.path.exists(lock)
        with pytest.raises(ConcurrentWriteError, match="maintenance lock"):
            with idx._maintenance_lock(wait_s=0.2):
                pass
    assert not os.path.exists(lock)

    # Stale lock (crashed maintainer): broken, refresh proceeds.
    open(lock, "w").close()
    old = time.time() - 7200
    os.utime(lock, (old, old))
    assert idx.refresh()["action"] == "noop"
    assert not os.path.exists(lock)


def test_refresh_driven_by_cow_change_stream(spark, tmp_path):
    """r7 verdict #3 end-to-end gate: the incremental ANN refresh is
    DRIVEN from the STREAMING change feed of a copy-on-write source
    table — the feed (write-time _changelog capture) delivers each
    merge's rows as a micro-batch, the consumer refreshes the index
    per micro-batch, and the final index equals a frozen-quantizer
    full re-encode. The streamed rows themselves must be exactly the
    merged batches (keys + ops), proving the notification channel
    carries the same content the refresh consumed."""
    from automation_of_building_a_transactional_data_lake_spark.sources.lake_datasource import (
        register_lake_datasource,
    )

    cat, rng = _seed_source(spark, str(tmp_path / "wh"))
    src = cat.table(SPEC)
    idx = ManagedAnnIndex(cat, SPEC, ivf_k=4)
    assert idx.build()["action"] == "built"
    indexed_v = idx._read_meta()["indexed_version"]
    register_lake_datasource(spark)

    src.merge_upsert(_mk(spark, [(5, _vec(rng)), (200, _vec(rng))]))
    src.merge_delete(spark.createDataFrame([(7,)], "vec_id long"))

    seen: list = []
    actions: list = []

    def on_batch(df, _epoch):
        seen.extend((r.vec_id, r._change_op) for r in df.collect())
        actions.append(idx.refresh()["action"])

    q = (
        spark.readStream.format("lakehouse")
        .option("path", src.path)
        .option("feed", "changes")
        .option("starting_version", str(indexed_v))
        .load()
        .writeStream.foreachBatch(on_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert sorted(seen) == [(5, "U"), (7, "D"), (200, "U")]
    assert "refreshed" in actions
    assert _index_state(idx) == _frozen_full_reencode_state(idx)
    live = (set(range(120)) | {200}) - {7}
    assert idx._table().read().count() == len(live)
