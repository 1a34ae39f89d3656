"""Replicated-shard serving: failover keeps answers EXACT (never partial).

Shard replicas serve immutable index files, so a replacement replica is
interchangeable with a dead one — the failover gate is bit-identity with the
single-reader engine before, during (surviving replica), and after (respawned
replica) actor kills, plus an explicit refusal (ShardUnavailable) when every
replica of a touched shard is gone and respawn is disabled.
"""

import numpy as np
import pytest
import ray

from engine.queries import QUERY_SET


def _assert_identical(bm, svc, items):
    for text, k in items:
        d1, s1 = bm.topk(text, k)
        d2, s2 = svc.topk(text, k)
        np.testing.assert_array_equal(d1, d2, err_msg=text)
        np.testing.assert_array_equal(
            np.asarray(s1).view(np.uint64), np.asarray(s2).view(np.uint64)
        )


def test_replica_failover_and_respawn(ray_session, tiny_index):
    from engine.query import Bm25Index
    from engine.serve import ShardedQueryService

    bm = Bm25Index(tiny_index)
    items = [(q["text"], q["k"]) for q in QUERY_SET]
    svc = ShardedQueryService(tiny_index, n_shards=2, n_replicas=2, num_cpus=0.25)
    try:
        _assert_identical(bm, svc, items[:4])  # warm, both replicas healthy
        originals = [list(reps) for reps in svc._replicas]
        for s in range(svc.n_shards):  # kill replica slot 0 of every shard
            ray.kill(svc._replicas[s][0])
        # round-robin keeps routing some calls at the dead slot: failover
        # must retry on the survivor AND respawn the slot, bit-identically
        _assert_identical(bm, svc, items)
        m = svc.replica_metrics()
        assert m["failovers"] >= 1 and m["respawns"] >= 1
        respawned = any(
            svc._replicas[s][0] is not originals[s][0] for s in range(svc.n_shards)
        )
        assert respawned
        # now kill the SURVIVING original replicas: only respawned actors left
        for s in range(svc.n_shards):
            ray.kill(originals[s][1])
        _assert_identical(bm, svc, items[:4])
    finally:
        svc.shutdown()


def test_single_replica_respawn_survives_kill(ray_session, tiny_index):
    """n_replicas=1 with respawn: the fresh actor is a retry target, so one
    kill degrades latency, not availability."""
    from engine.query import Bm25Index
    from engine.serve import ShardedQueryService

    bm = Bm25Index(tiny_index)
    svc = ShardedQueryService(tiny_index, n_shards=2, n_replicas=1, num_cpus=0.25)
    try:
        for s in range(svc.n_shards):
            ray.kill(svc._replicas[s][0])
        _assert_identical(bm, svc, [(q["text"], q["k"]) for q in QUERY_SET[:5]])
        assert svc.replica_metrics()["respawns"] >= 1
    finally:
        svc.shutdown()


def test_shard_unavailable_refusal(ray_session, tiny_index):
    """No respawn + every replica dead -> typed refusal, never a silently
    partial (wrong-stats) result."""
    from engine.serve import ShardedQueryService, ShardUnavailable

    svc = ShardedQueryService(
        tiny_index, n_shards=2, n_replicas=1, respawn=False, num_cpus=0.25
    )
    try:
        for s in range(svc.n_shards):
            ray.kill(svc._replicas[s][0])
        with pytest.raises(ShardUnavailable):
            svc.topk("w00000", 5)
    finally:
        svc.shutdown()


def test_fuzzy_path_failover(ray_session, tiny_index):
    """The vocab-expansion fan-out (every shard) rides the same failover."""
    from engine.query import Bm25Index
    from engine.serve import ShardedQueryService

    bm = Bm25Index(tiny_index)
    svc = ShardedQueryService(tiny_index, n_shards=2, n_replicas=2, num_cpus=0.25)
    try:
        text = "w00000"
        d1, s1 = bm.fuzzy_topk([text], 10)
        for s in range(svc.n_shards):
            ray.kill(svc._replicas[s][0])
        d2, s2 = svc.fuzzy_topk(text, 10)
        np.testing.assert_array_equal(d1, d2)
        np.testing.assert_array_equal(
            np.asarray(s1).view(np.uint64), np.asarray(s2).view(np.uint64)
        )
    finally:
        svc.shutdown()
