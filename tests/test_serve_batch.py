"""Distributed batch evaluation over the sharded service (own module: the
sharded-serving module fixture holds 3 full-CPU shard actors for its whole
module lifetime, and Ray Data's repartition/read tasks need a full CPU — at
the 4-CPU test budget the two cannot coexist; module isolation tears the
fixture down first)."""

from engine.queries import QUERY_SET


def test_batch_topk_sharded_bit_identity(ray_session, tiny_index):
    """Shared shard pool + coordinator actors == the replica batch path,
    bit-for-bit, for every query in the fixed set."""
    from engine.query import batch_topk
    from engine.serve import batch_topk_sharded

    a = batch_topk(QUERY_SET, tiny_index, concurrency=2)
    b = batch_topk_sharded(
        QUERY_SET, tiny_index, n_shards=2, concurrency=2, shard_num_cpus=0.25
    )
    assert a.num_rows == b.num_rows > 0
    cols = ["query_id", "rank", "doc_id", "score"]
    aa, bb = a.select(cols), b.select(cols)
    assert aa.sort_by([("query_id", "ascending"), ("rank", "ascending")]).equals(
        bb.sort_by([("query_id", "ascending"), ("rank", "ascending")])
    )


def test_query_metrics_counters(ray_session, tiny_index):
    """Serving metrics: decode/cache counters move as expected on a fresh
    handle, and QueryService.metrics() sums across replicas."""
    from engine.query import Bm25Index
    from engine.serve import QueryService

    bm = Bm25Index(tiny_index)
    m0 = bm.metrics()
    assert m0["queries_served"] == 0 and m0["runs_decoded"] == 0
    bm.topk("w00000 zqmarker0", 5)
    m1 = bm.metrics()
    assert m1["queries_served"] == 1
    assert m1["runs_decoded"] > 0 and m1["payload_column_reads"] > 0
    bm.topk("w00000 zqmarker0", 5)  # same terms -> cache hits, no new decode
    m2 = bm.metrics()
    assert m2["queries_served"] == 2
    assert m2["postings_cache_hits"] > m1["postings_cache_hits"]
    assert m2["runs_decoded"] == m1["runs_decoded"]
    assert m2["parts_quarantined"] == 0

    svc = QueryService(tiny_index, n_replicas=2, num_cpus=0.25)
    try:
        svc.topk("w00000", 5)
        svc.topk("zqmarker0", 5)
        m = svc.metrics()
        assert m["n_replicas"] == 2 and m["queries_served"] == 2
    finally:
        svc.shutdown()
