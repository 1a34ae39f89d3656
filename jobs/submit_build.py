"""ray-job-submit entrypoint for the index build + query smoke.

On a real multi-node cluster (the north rule's execution mode):

    ray job submit --working-dir . -- \
      python jobs/submit_build.py --corpus s3://bucket/corpus --index /shared/idx

    # N vs 4N scaling evidence: run the same job on clusters of both sizes
    # and compare the printed turns/sec (this sandbox proxies that with
    # bench.py --scaling at 2 and 8 CPUs in fresh processes — see BASELINE.md).

Inside `ray job submit` the driver pod already has a cluster: connect with
address="auto" and NEVER pin num_cpus (the cluster's size IS the resource
budget). Standalone (no cluster), fall back to a local session so the same
script works in dev. The engine library itself never calls ray.init — only
entrypoints like this one own a session (the driver contract).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(prog="jobs/submit_build.py")
    p.add_argument("--corpus", required=True, help="parquet corpus dir/glob")
    p.add_argument("--index", required=True, help="output index dir (shared fs)")
    p.add_argument("--buckets", default="auto")
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--positions", action="store_true")
    p.add_argument("--postings-codec", default="varint")
    p.add_argument("--no-resume", action="store_true")
    p.add_argument(
        "--id-col",
        default=None,
        help="doc id column for plain-document corpora (e.g. doc_id); omit "
        "for transcripts corpora, whose ids are minted from conv_id/turn_idx",
    )
    p.add_argument("--smoke-query", default=None, help="optional post-build top-10 query")
    args = p.parse_args()

    import ray

    if not ray.is_initialized():
        # in a `ray job submit` runtime RAY_ADDRESS is set by the job agent;
        # address="auto" joins that cluster, local mode otherwise. Workers
        # must import the engine package: ship the repo root on PYTHONPATH
        # (under job submit, --working-dir already does this; harmless then)
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        init_kwargs = dict(
            include_dashboard=False,
            logging_level="ERROR",
            runtime_env={"env_vars": {"PYTHONPATH": repo}},
        )
        try:
            ray.init(address=os.environ.get("RAY_ADDRESS", "auto"), **init_kwargs)
        except ConnectionError:
            # no running cluster and RAY_ADDRESS unset: address="auto" raises
            # instead of starting one (ADVICE r4) — fall back to a local
            # session so the documented standalone/dev mode works
            ray.init(address="local", **init_kwargs)
    from engine.build import build_index

    buckets = args.buckets if args.buckets == "auto" else int(args.buckets)
    t0 = time.perf_counter()
    build_index(
        args.corpus,
        args.index,
        id_col=args.id_col,
        n_buckets=buckets,
        n_salts=args.salts,
        positions=args.positions,
        postings_codec=args.postings_codec,
        resume=not args.no_resume,
    )
    dt = time.perf_counter() - t0
    with open(os.path.join(args.index, "stats.json")) as f:
        stats = json.load(f)
    line = {
        "built": args.index,
        "n_docs": stats["n_docs"],
        "sec": round(dt, 3),
        "turns_per_sec": round(stats["n_docs"] / dt, 1) if dt else None,
        "cluster_cpus": int(ray.cluster_resources().get("CPU", 0)),
    }
    if args.smoke_query:
        from engine.query import Bm25Index

        doc, score = Bm25Index(args.index).topk(args.smoke_query, 10, rank_round=6)
        line["smoke_hits"] = [[int(d), float(s)] for d, s in zip(doc, score)]
    print(json.dumps(line))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
