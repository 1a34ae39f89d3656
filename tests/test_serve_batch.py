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
