"""Query serving — long-lived replica actors + per-query timeout.

The reference scales query serving by running N single-JVM replicas behind the
RCSB service layer (SURVEY §4 "Scale-out") and wraps every query in a
per-query executor with a deadline (DefaultStrucmotifRuntime.java:244-278,
``query-timeout`` in StrucmotifConfig.java:125; QueryTimeoutTest). Ours:

- ``QueryService``: a pool of ``@ray.remote`` replica actors, each holding a
  full ``Bm25Index`` (segments + docmap + caches loaded ONCE in ``__init__``
  — the T3 stateful-stage pattern). Queries round-robin across replicas;
  ``timeout_s`` maps to ``ray.get(ref, timeout=...)`` and raises
  ``QueryTimeout`` (the reference throws on deadline, :269-277).
- Batch evaluation stays on the ``Bm25Queryer`` actor-pool ``map_batches``
  path in engine.query; this module is the latency path.
"""

from __future__ import annotations

import ray


class QueryTimeout(Exception):
    """Raised when a query exceeds its deadline (query-timeout analog)."""


@ray.remote
class _Replica:
    """One serving replica: whole index resident (the reference's replica=
    one JVM with the full ffindex bundle + structure cache)."""

    def __init__(self, index_dir: str):
        from .query import Bm25Index

        self.bm = Bm25Index(index_dir)

    def topk(self, text: str, k: int, conjunctive: bool = False):
        fn = self.bm.conjunctive_topk if conjunctive else self.bm.topk
        doc, score = fn(text, k)
        return doc, score

    def warm(self, queries: list[str], k: int = 10) -> int:
        for q in queries:
            self.bm.topk(q, k)
        return len(queries)


class QueryService:
    """Round-robin front over N replica actors.

    >>> svc = QueryService(index_dir, n_replicas=2)
    >>> doc_ids, scores = svc.topk("some query", k=10, timeout_s=1.0)
    """

    def __init__(self, index_dir: str, n_replicas: int = 2, num_cpus: float = 1):
        self._replicas = [
            _Replica.options(num_cpus=num_cpus).remote(index_dir)
            for _ in range(n_replicas)
        ]
        self._next = 0

    def _pick(self):
        r = self._replicas[self._next % len(self._replicas)]
        self._next += 1
        return r

    def topk(self, text: str, k: int, conjunctive: bool = False,
             timeout_s: float | None = None):
        ref = self._pick().topk.remote(text, k, conjunctive)
        try:
            return ray.get(ref, timeout=timeout_s)
        except ray.exceptions.GetTimeoutError as e:
            ray.cancel(ref, force=False)
            raise QueryTimeout(f"query exceeded {timeout_s}s") from e

    def warm(self, texts: list[str], k: int = 10) -> None:
        ray.get([r.warm.remote(texts, k) for r in self._replicas])

    def shutdown(self) -> None:
        for r in self._replicas:
            ray.kill(r)
        self._replicas = []
