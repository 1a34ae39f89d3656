"""Sharded scatter/gather serving: bit-identity with the single-reader engine.

The replica model (engine.serve.QueryService) holds the WHOLE index per actor;
ShardedQueryService partitions part files across shard actors and gathers term
runs per query. The gate: every query path (pruned top-k, conjunctive) over
the gathered view must produce BIT-identical docIDs and scores.
"""

import numpy as np
import pytest

from engine.queries import QUERY_SET


@pytest.fixture(scope="module")
def sharded(ray_session, tiny_index):
    from engine.serve import ShardedQueryService

    svc = ShardedQueryService(tiny_index, n_shards=3)
    yield svc
    svc.shutdown()


def test_sharded_bit_identity(sharded, tiny_index):
    from engine.query import Bm25Index

    bm = Bm25Index(tiny_index)
    n = 0
    for q in QUERY_SET:
        for conj in (False, True):
            d1, s1 = (bm.conjunctive_topk if conj else bm.topk)(q["text"], q["k"])
            d2, s2 = sharded.topk(q["text"], q["k"], conjunctive=conj)
            np.testing.assert_array_equal(d1, d2, err_msg=f"{q['text']} conj={conj}")
            np.testing.assert_array_equal(
                np.asarray(s1).view(np.uint64), np.asarray(s2).view(np.uint64)
            )
            n += 1
    assert n == 2 * len(QUERY_SET)


def test_sharded_absent_term(sharded):
    d, s = sharded.topk("zzzabsentzzz", 5)
    assert len(d) == 0 and len(s) == 0


def test_shards_partition_all_parts(sharded):
    """Every part is owned by exactly one shard (no gaps, no overlap)."""
    import ray

    owned = ray.get([s.__ray_ready__.remote() for s in sharded._shards]) and [
        ray.get(s.fetch.remote([])) for s in sharded._shards
    ]
    r = sharded._bm.reader
    n_parts = r.n_buckets * r.n_salts
    assign = [p % sharded.n_shards for p in range(n_parts)]
    assert sorted(set(assign)) == list(range(sharded.n_shards))
    assert owned is not None  # actors alive and responsive
