"""Command-line entry points — the ``StrucmotifUpdate.main`` analog
(UPD/StrucmotifUpdate.java:73-167: one binary, operation verbs, id lists).

    python -m engine.cli build  <corpus_dir> <index_dir> [--buckets N] [--salts N] [--no-resume]
    python -m engine.cli add    <index_dir> <parquet>
    python -m engine.cli remove <index_dir> --conv <conv_id> [...]
    python -m engine.cli compact <index_dir>
    python -m engine.cli query  <index_dir> "text" [-k N] [--and] [--csv out.csv]
    python -m engine.cli stats  <index_dir>

Owns its Ray session (guarded init) per the driver contract: library code
never calls ray.init; CLIs and benches do.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    return ray


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="engine.cli")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build (or resume) an index over a parquet corpus")
    b.add_argument("corpus")
    b.add_argument("index_dir")
    b.add_argument("--buckets", type=int, default=32)
    b.add_argument("--salts", type=int, default=8)
    b.add_argument("--id-col", default=None, help="doc id column (omit for transcripts mode)")
    b.add_argument("--no-resume", action="store_true")

    a = sub.add_parser("add", help="incrementally add documents")
    a.add_argument("index_dir")
    a.add_argument("parquet")
    a.add_argument("--id-col", default=None)

    r = sub.add_parser("remove", help="remove documents")
    r.add_argument("index_dir")
    r.add_argument("--conv", action="append", default=[], help="conv_id to remove (repeatable)")
    r.add_argument("--doc", action="append", type=int, default=[], help="doc_id to remove (repeatable)")

    c = sub.add_parser("compact", help="re-encode segments under live stats")
    c.add_argument("index_dir")

    q = sub.add_parser("query", help="top-k BM25 query")
    q.add_argument("index_dir")
    q.add_argument("text")
    q.add_argument("-k", type=int, default=10)
    q.add_argument("--and", dest="conjunctive", action="store_true", help="all terms must match")
    q.add_argument("--csv", default=None, help="write hits to CSV (result-sink analog)")

    s = sub.add_parser("stats", help="print index stats.json")
    s.add_argument("index_dir")

    args = p.parse_args(argv)

    if args.cmd == "build":
        _ray()
        from .build import build_index

        rep = build_index(
            args.corpus,
            args.index_dir,
            id_col=args.id_col,
            n_buckets=args.buckets,
            n_salts=args.salts,
            resume=not args.no_resume,
        )
        print(json.dumps({k: rep[k] for k in ("n_docs", "n_parts", "n_postings", "timings_sec", "parts_written_this_run")}))
    elif args.cmd == "add":
        _ray()
        import ray.data

        from .update import add_documents

        rep = add_documents(args.index_dir, ray.data.read_parquet(args.parquet), id_col=args.id_col)
        print(json.dumps(rep))
    elif args.cmd == "remove":
        if not args.conv and not args.doc:
            p.error("remove requires --conv or --doc")
        from .update import remove_documents

        rep = remove_documents(
            args.index_dir,
            conv_ids=args.conv or None,
            doc_ids=args.doc or None,
        )
        print(json.dumps(rep))
    elif args.cmd == "compact":
        from .update import compact_index

        print(json.dumps(compact_index(args.index_dir)))
    elif args.cmd == "query":
        from .query import Bm25Index, write_hits_csv

        bm = Bm25Index(args.index_dir)
        tbl = bm.topk_table("cli", args.text, args.k, conjunctive=args.conjunctive)
        if args.csv:
            write_hits_csv(tbl, args.csv)
        for i in range(tbl.num_rows):
            print(
                json.dumps(
                    {
                        "rank": tbl["rank"][i].as_py(),
                        "doc_id": tbl["doc_id"][i].as_py(),
                        "score": round(tbl["score"][i].as_py(), 6),
                    }
                )
            )
    elif args.cmd == "stats":
        from .state import read_stats

        print(json.dumps(read_stats(args.index_dir), indent=2))
    return 0


if __name__ == "__main__":
    sys.exit(main())
