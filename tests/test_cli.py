"""CLI smoke tests (StrucmotifUpdate.main analog) — run in-process via
engine.cli.main so the session Ray fixture is reused."""

import csv
import json
import os

import pytest


def _jsonl(out: str) -> list[dict]:
    """Parse the CLI's JSONL stdout, skipping interleaved Ray worker-log
    lines (sharded/actor verbs let raylet chatter reach captured stdout)."""
    return [
        json.loads(l) for l in out.strip().splitlines() if l.lstrip().startswith("{")
    ]


def test_cli_query_and_csv(ray_session, tiny_index, tmp_path, capsys):
    from engine.cli import main

    out_csv = str(tmp_path / "hits.csv")
    rc = main(["query", tiny_index, "zqmarker0", "-k", "5", "--csv", out_csv])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert lines and lines[0]["rank"] == 1
    with open(out_csv) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == len(lines)
    assert {"query_id", "rank", "doc_id", "score"} <= set(rows[0])


def test_cli_stats(tiny_index, capsys):
    from engine.cli import main

    assert main(["stats", tiny_index]) == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["n_docs"] > 0 and stats["n_parts"] > 0


def test_cli_remove_requires_target(tiny_index):
    from engine.cli import main

    with pytest.raises(SystemExit):
        main(["remove", tiny_index])


def test_cli_conjunctive_query(ray_session, tiny_index, capsys):
    from engine.cli import main

    rc = main(["query", tiny_index, "qqqabsenttermqqq zqmarker0", "-k", "5", "--and"])
    assert rc == 0
    assert capsys.readouterr().out.strip() == ""  # AND with absent term -> empty


def test_cli_expand(ray_session, tiny_index, capsys):
    from engine.cli import main

    rc = main(["expand", tiny_index, "--slot", "zqmarker0|zqmarker1", "--slot", "w00000", "-k", "5"])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert lines and lines[0]["rank"] == 1 and lines[0]["score"] > 0


def test_cli_phrase_and_positional_build(ray_session, tiny_corpus, tmp_path, capsys):
    from engine.cli import main

    idx = str(tmp_path / "cli_pos")
    rc = main(["build", tiny_corpus, idx, "--buckets", "8", "--salts", "2", "--positions"])
    assert rc == 0
    build_out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert build_out["n_docs"] > 0
    # harvest a real bigram from the corpus so the phrase must hit
    import pyarrow.parquet as pq

    from engine.tokenize import tokenize_text

    first = pq.read_table(tiny_corpus, columns=["text"])["text"][0].as_py()
    toks = tokenize_text(first)
    rc = main(["phrase", idx, f"{toks[0]} {toks[1]}"])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert lines and all(r["n_matches"] >= 1 for r in lines)
    # the adjacent pair must also co-occur within any window >= 1
    if toks[0] != toks[1]:
        rc = main(["proximity", idx, toks[0], toks[1], "--window", "1", "--ordered"])
        assert rc == 0
        plines = _jsonl(capsys.readouterr().out)
        assert plines and all(r["n_pairs"] >= 1 for r in plines)


def test_cli_sharded_query(ray_session, tiny_index, capsys):
    from engine.cli import main

    rc = main(["query", tiny_index, "zqmarker0", "-k", "5", "--sharded", "2"])
    assert rc == 0
    sharded_lines = _jsonl(capsys.readouterr().out)
    rc = main(["query", tiny_index, "zqmarker0", "-k", "5"])
    assert rc == 0
    plain_lines = _jsonl(capsys.readouterr().out)
    assert [(r["doc_id"], r["rank"]) for r in sharded_lines] == [
        (r["doc_id"], r["rank"]) for r in plain_lines
    ]


def test_cli_fuzzy(ray_session, tiny_index, capsys):
    """A one-character typo of a real corpus term must still rank docs; the
    fuzzy result equals the exact query when the typo'd term's neighborhood
    is exactly the original term."""
    from engine.cli import main

    rc = main(["fuzzy", tiny_index, "zqmarker0x", "-k", "5"])
    assert rc == 0
    fuzzy_lines = _jsonl(capsys.readouterr().out)
    assert fuzzy_lines and fuzzy_lines[0]["rank"] == 1 and fuzzy_lines[0]["score"] > 0


def test_cli_qld(ray_session, tiny_index, capsys):
    from engine.cli import main

    rc = main(["qld", tiny_index, "zqmarker0", "-k", "5"])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert lines and lines[0]["rank"] == 1 and lines[0]["score"] < 0  # log-probs


def test_cli_doc_and_mlt(ray_session, tiny_index, capsys):
    """Doc-store surfaces: fetch stored text by id; docID-as-query ranks the
    source doc itself first (it always matches its own top terms best)."""
    from engine.cli import main

    assert main(["doc", tiny_index, "0", "999999999"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows[0]["doc_id"] == 0 and rows[0]["text"]
    assert rows[1]["text"] is None  # absent id -> null, not an error

    assert main(["mlt", tiny_index, "0", "-k", "3"]) == 0
    hits = _jsonl(capsys.readouterr().out)
    assert hits and hits[0]["doc_id"] == 0 and hits[0]["rank"] == 1


def test_cli_snippets(ray_session, tiny_corpus, tmp_path, capsys):
    from engine.build import build_index
    from engine.cli import main

    idx = str(tmp_path / "pos_sn")
    build_index(tiny_corpus, idx, n_buckets=8, n_salts=2, positions=True)
    capsys.readouterr()
    assert main(["snippets", idx, "w00000", "--limit", "5"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows and all("w00000" in r["snippet"] for r in rows)


def test_cli_build_from_csv(ray_session, tmp_path, capsys):
    """Non-parquet ingestion: the same build pipeline over a CSV corpus."""
    import numpy as np

    csv_path = str(tmp_path / "docs.csv")
    with open(csv_path, "w") as f:
        f.write("doc_id,text\n0,apple pie crust\n1,banana bread loaf\n2,apple cake\n")
    idx = str(tmp_path / "csv_idx")
    from engine.cli import main

    assert main(["build", csv_path, idx, "--buckets", "4", "--salts", "2",
                 "--id-col", "doc_id", "--format", "csv"]) == 0
    capsys.readouterr()
    from engine.query import Bm25Index

    d, s = Bm25Index(idx).topk("apple", 5)
    assert set(d) == {0, 2} and (np.asarray(s) > 0).all()


def test_cli_verify_detects_corruption(ray_session, tiny_index, tmp_path, capsys):
    """Integrity gate (read-error-strategy analog): clean index verifies rc=0;
    a flipped byte in one segment is caught by its manifest CRC, rc=1."""
    import glob
    import shutil

    from engine.cli import main

    assert main(["verify", tiny_index]) == 0
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["parts_corrupt"] == [] and rep["parts_ok"] == rep["parts_committed"] > 0

    idx = str(tmp_path / "corrupt")
    shutil.copytree(tiny_index, idx)
    seg = sorted(glob.glob(f"{idx}/segment-*.parquet"))[0]
    with open(seg, "r+b") as f:
        f.seek(100)
        b = f.read(1)
        f.seek(100)
        f.write(bytes([b[0] ^ 0xFF]))
    assert main(["verify", idx]) == 1
    rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(rep["parts_corrupt"]) == 1


def test_cli_percolate(ray_session, tiny_index, tmp_path, capsys):
    """Streamed percolation from the command line: stored queries match the
    docs that contain their terms; scores are positive."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array(["w00000 w00001", "w00777 only", "nothing relevant"]),
        }
    )
    path = str(tmp_path / "docs.parquet")
    pq.write_table(docs, path)
    from engine.cli import main

    rc = main(["percolate", tiny_index, path, "--query", "q_a:w00000", "--query", "q_b:w00777"])
    assert rc == 0
    # Ray occasionally emits a progress line on stdout under load; parse only
    # the JSON records the CLI itself prints.
    rows = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    got = {(r["doc_id"], r["query_id"]) for r in rows}
    assert got == {(0, "q_a"), (1, "q_b")}
    assert all(r["score"] > 0 for r in rows)


def test_cli_dedup_and_outliers(ray_session, tmp_path, capsys):
    """dedup (passage mode) and outliers verbs produce JSON-line reports."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.cli import main

    docs = pa.table(
        {
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["a b c d e f g h", "a b c d x y z w"]),
        }
    )
    dpath = str(tmp_path / "docs.parquet")
    pq.write_table(docs, dpath)
    assert main(["dedup", dpath, "--mode", "passage", "--window", "4"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert {(r["doc_id"], r["passage_idx"]): r["n_copies"] for r in rows} == {
        (0, 0): 2, (0, 1): 1, (1, 1): 1,
    }

    sf = tmp_path / "sf"
    sf.mkdir()
    ev = pa.table(
        {
            "event_id": pa.array(range(11), pa.int64()),
            "user_id": pa.array([1] * 11, pa.int64()),
            "value": pa.array([10.0] * 10 + [99.0], pa.float64()),
        }
    )
    pq.write_table(ev, str(sf / "events.parquet"))
    assert main(["outliers", str(sf), "-t", "2.5"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert [r["event_id"] for r in rows] == [10]


def test_cli_boolean(ray_session, tiny_index, capsys):
    from engine.cli import main

    rc = main(["boolean", tiny_index, "(zqmarker0 OR zqmarker1) AND NOT zzzabsent", "-k", "5"])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert lines and lines[0]["rank"] == 1 and lines[0]["score"] > 0


def test_cli_convsearch(ray_session, tiny_corpus, tmp_path, capsys):
    from engine.build import build_index
    from engine.cli import main

    idx = str(tmp_path / "cli_conv")
    build_index(tiny_corpus, idx, n_buckets=8, n_salts=2, category_col="role")
    rc = main(["convsearch", idx, "w00000 zqmarker0", "-k", "3", "--weight", "tool=0.5"])
    assert rc == 0
    lines = _jsonl(capsys.readouterr().out)
    assert len(lines) == 3 and lines[0]["conv_id"].startswith("conv")


def test_cli_sort_and_range(ray_session, tiny_corpus, tmp_path, capsys):
    """Doc-values surfaces from the command line: build --docvalues ts, field
    sort with a search_after cursor page, and a --range filtered query."""
    from engine.cli import main

    idx = str(tmp_path / "dv_idx")
    assert main(["build", tiny_corpus, idx, "--buckets", "4", "--salts", "2",
                 "--docvalues", "ts"]) == 0
    capsys.readouterr()
    assert main(["sort", idx, "w00000", "ts", "-k", "3"]) == 0
    page1 = _jsonl(capsys.readouterr().out)
    assert len(page1) == 3 and page1[0]["value"] >= page1[-1]["value"]
    cur = f'{page1[-1]["value"]}:{page1[-1]["doc_id"]}'
    assert main(["sort", idx, "w00000", "ts", "-k", "3", "--after", cur]) == 0
    page2 = _jsonl(capsys.readouterr().out)
    assert page2 and not {r["doc_id"] for r in page2} & {r["doc_id"] for r in page1}
    assert page2[0]["value"] <= page1[-1]["value"]

    lo, hi = page1[-1]["value"], page1[0]["value"]
    assert main(["query", idx, "w00000", "-k", "50",
                 "--range", f"ts:{lo}:{hi}"]) == 0
    hits = _jsonl(capsys.readouterr().out)
    assert hits
    in_window = {r["doc_id"] for r in page1}
    assert {r["doc_id"] for r in hits} <= in_window | {r["doc_id"] for r in page2}


def test_cli_fedquery(ray_session, tiny_corpus, tmp_path, capsys):
    """Federated CLI: two ts-sliced member indexes behind one alias; --range
    restricted to one slice reports members_searched=1 (can_match pruning)."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from engine.build import build_index
    from engine.cli import main

    corpus = pa.concat_tables(
        pq.read_table(p) for p in sorted(glob.glob(tiny_corpus + "/*.parquet"))
    )
    corpus = corpus.append_column(
        "doc_id", pa.array(np.arange(corpus.num_rows, dtype=np.int64))
    )
    ts = corpus["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
    mid = int((ts.min() + ts.max()) // 2)
    a, b = str(tmp_path / "fa"), str(tmp_path / "fb")
    kw = dict(n_buckets=4, n_salts=2, id_col="doc_id", docvalues=["ts"])
    build_index(ray.data.from_arrow(corpus.filter(pa.array(ts < mid))), a, **kw)
    build_index(ray.data.from_arrow(corpus.filter(pa.array(ts >= mid))), b, **kw)
    capsys.readouterr()

    assert main(["fedquery", "w00000", a, b, "-k", "5"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows[-1] == {"members_searched": 2, "members_total": 2}
    assert len(rows) == 6 and rows[0]["rank"] == 1

    lo_only = f"ts:{int(ts.min())}:{mid - 1}"
    assert main(["fedquery", "w00000", a, b, "-k", "5", "--range", lo_only]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows[-1] == {"members_searched": 1, "members_total": 2}
    assert all(r["doc_id"] < corpus.num_rows for r in rows[:-1])


def test_alias_registry_and_query(ray_session, tiny_index, tmp_path, capsys):
    """Alias lifecycle: set -> query through the alias == direct query;
    atomic repoint to a second index changes what the alias serves; remove
    and dangling-target failures are loud."""
    from engine import aliases
    from engine.cli import main

    reg = str(tmp_path / "reg")
    # set + list
    assert main(["alias", reg, "set", "prod", tiny_index]) == 0
    capsys.readouterr()
    assert main(["alias", reg, "list"]) == 0
    m = json.loads(capsys.readouterr().out)
    assert m == {"prod": os.path.abspath(tiny_index)}
    # resolve verb
    assert main(["alias", reg, "resolve", "prod"]) == 0
    assert capsys.readouterr().out.strip() == os.path.abspath(tiny_index)
    # query through the alias == direct query
    assert main(["query", "prod", "zqmarker0", "-k", "5", "--registry", reg]) == 0
    via_alias = _jsonl(capsys.readouterr().out)
    assert main(["query", tiny_index, "zqmarker0", "-k", "5"]) == 0
    direct = _jsonl(capsys.readouterr().out)
    assert via_alias == direct
    # swap to a second index (different corpus slice): alias now serves it
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.build import build_index

    corpus2 = str(tmp_path / "c2")
    os.makedirs(corpus2)
    pq.write_table(
        pa.table(
            {
                "conv_id": pa.array(["c1"] * 2),
                "turn_idx": pa.array([0, 1], pa.int32()),
                "role": pa.array(["user", "assistant"]),
                "text": pa.array(["swapped corpus marker", "other words"]),
                "tool": pa.array(["", ""]),
                "ts": pa.array([0, 1], pa.timestamp("us")),
            }
        ),
        f"{corpus2}/part-00000.parquet",
    )
    idx2 = str(tmp_path / "idx2")
    build_index(corpus2, idx2, n_buckets=2, n_salts=1)
    assert main(["alias", reg, "set", "prod", idx2]) == 0
    capsys.readouterr()
    assert main(["query", "prod", "swapped", "-k", "5", "--registry", reg]) == 0
    hits = _jsonl(capsys.readouterr().out)
    assert len(hits) == 1  # only the new corpus has the term
    # remove; resolving then fails
    assert main(["alias", reg, "remove", "prod"]) == 0
    with pytest.raises(KeyError):
        aliases.resolve("prod", reg)
    # guardrails: path-like names and uncommitted targets refused
    with pytest.raises(ValueError):
        aliases.set_alias(reg, "a/b", tiny_index)
    with pytest.raises(FileNotFoundError):
        aliases.set_alias(reg, "x", str(tmp_path / "nope"))
    # a same-named directory in the CWD must NOT shadow a registered alias
    # (registry is consulted FIRST for bare names — ADVICE r4)
    aliases.set_alias(reg, "shadowed", tiny_index)
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        os.makedirs("shadowed", exist_ok=True)
        assert aliases.resolve("shadowed", reg) == os.path.abspath(tiny_index)
        # bare non-alias name that IS a local dir still passes through
        os.makedirs("plaindir", exist_ok=True)
        assert aliases.resolve("plaindir", reg) == "plaindir"
    finally:
        os.chdir(cwd)


def test_cli_corpus_and_incremental_dedup(ray_session, tmp_path, capsys):
    """corpus verb (gopher/trim/drift/hitters) + dedup incremental modes
    produce JSONL with the expected shapes over a small parquet."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.cli import main

    docs = str(tmp_path / "docs.parquet")
    base = "the a " + " ".join(f"word{i}" for i in range(30))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(
                    [base, base + " tail", "tiny", base.replace("word0", "quad0"),
                     "the a " + " ".join(f"verb{i}" for i in range(25)), ""]
                ),
                "lang": pa.array(["en", "en", "de", "en", "de", "en"]),
            }
        ),
        docs,
    )
    assert main(["corpus", docs, "--mode", "gopher"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows and {"doc_id", "n_tokens", "n_stop"} <= set(rows[0])
    assert main(["corpus", docs, "--mode", "trim", "--window", "4"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert len(rows) == 6 and "text_clean" in rows[0]
    assert main(["corpus", docs, "--mode", "drift", "--min-df", "2"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows and "logratio_r" in rows[0]
    assert main(["corpus", docs, "--mode", "hitters"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows and rows[0]["rank"] == 1
    assert main(["corpus", docs, "--mode", "trainmix"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    # no doc_id % 100 == 0 survives (eval slice) and rows carry the mixture gate
    assert all({"doc_id", "lang", "bucket"} <= set(r) for r in rows)
    assert all(r["doc_id"] % 100 != 0 for r in rows)
    assert main(["dedup", docs, "--mode", "incremental", "--window", "4"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert all(r["doc_id"] % 2 == 1 for r in rows)
    assert main(["dedup", docs, "--mode", "near-incremental"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert all(r["doc_id"] % 2 == 1 for r in rows)


def test_rollover_group_lifecycle(ray_session, tmp_path, capsys):
    """ILM rollover: capped write member rolls to a new index when full;
    federated group search is bit-identical to one monolithic build."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine import rollover as ro
    from engine.build import build_index
    from engine.cli import main
    from engine.query import Bm25Index

    rng = np.random.default_rng(5)
    vocab = ["table", "scan", "join", "fast", "slow", "merge", "key", "row"]

    def mk(ids):
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array(
                    [" ".join(rng.choice(vocab, size=12)) for _ in ids]
                ),
            }
        )

    batches = [mk(range(0, 6)), mk(range(6, 10)), mk(range(10, 18))]
    paths = []
    for i, t in enumerate(batches):
        p = str(tmp_path / f"b{i}.parquet")
        pq.write_table(t, p)
        paths.append(p)

    grp = str(tmp_path / "grp")
    assert main(["rollover", grp, "init", "--max-docs", "8"]) == 0
    capsys.readouterr()
    import ray.data

    # batch 0 (6 docs) -> new member m-000001 (6 < 8: next add appends)
    r0 = ro.add(grp, ray.data.read_parquet(paths[0]))
    assert (r0["member"], r0["rolled"], r0["n_docs"]) == ("m-000001", False, 6)
    # batch 1 (4 docs) -> appends into m-000001 (now 10 >= 8: next rolls)
    r1 = ro.add(grp, ray.data.read_parquet(paths[1]))
    assert (r1["member"], r1["rolled"], r1["n_docs"]) == ("m-000001", False, 10)
    # batch 2 -> rolls to m-000002
    r2 = ro.add(grp, ray.data.read_parquet(paths[2]))
    assert (r2["member"], r2["rolled"], r2["n_docs"]) == ("m-000002", True, 8)
    st = ro.status(grp)
    assert [m["n_docs"] for m in st["members"]] == [10, 8]

    # federated group search == one monolithic build over all batches
    mono_src = str(tmp_path / "mono")
    import os

    os.makedirs(mono_src)
    pq.write_table(pa.concat_tables(batches), f"{mono_src}/all.parquet")
    mono = str(tmp_path / "mono_idx")
    build_index(
        ray.data.read_parquet(f"{mono_src}/all.parquet"), mono,
        id_col="doc_id", n_buckets=8, n_salts=4,
    )
    bm = Bm25Index(mono)
    for q in ["table scan", "fast join merge", "slow row"]:
        dg, sg = ro.topk(grp, q, 10, rank_round=9)
        dm, sm = bm.topk(q, 10, rank_round=9)
        assert dg.tolist() == dm.tolist(), q
        np.testing.assert_array_equal(sg, sm)

    # CLI query surface
    assert main(["rollover", grp, "query", "table scan", "-k", "3"]) == 0
    rows = _jsonl(capsys.readouterr().out)
    assert rows and rows[0]["rank"] == 1
    with pytest.raises(FileExistsError):
        ro.init_group(grp, 8)


def test_rollover_crash_between_build_and_publish(ray_session, tmp_path, monkeypatch):
    """A crash AFTER the member build but BEFORE the group-file publish
    leaves an unreferenced member dir; the retry wipes it and rebuilds from
    ITS OWN delta — no half-state, no cross-delta contamination."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from engine import rollover as ro
    from engine import state

    rng = np.random.default_rng(9)
    vocab = ["table", "scan", "join", "fast"]

    def mk(ids):
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": pa.array([" ".join(rng.choice(vocab, size=8)) for _ in ids]),
            }
        )

    grp = str(tmp_path / "grp")
    ro.init_group(grp, max_docs=4)
    ro.add(grp, ray.data.from_arrow(mk(range(0, 5))))  # member 1, 5 >= 4: full

    # crash simulation: _save raises after the second member's build commits
    real_save = ro._save
    calls = {"n": 0}

    def boom(group_dir, g):
        calls["n"] += 1
        raise RuntimeError("simulated crash before publish")

    monkeypatch.setattr(ro, "_save", boom)
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="simulated crash"):
        ro.add(grp, ray.data.from_arrow(mk(range(5, 8))))
    monkeypatch.setattr(ro, "_save", real_save)

    # the orphan exists on disk but the group doesn't reference it
    import os

    assert os.path.exists(os.path.join(grp, "m-000002", "stats.json"))
    assert [m["member"] for m in ro.status(grp)["members"]] == ["m-000001"]

    # retry with a DIFFERENT delta: orphan wiped, rebuilt from this delta
    rep = ro.add(grp, ray.data.from_arrow(mk(range(100, 103))))
    assert rep == {"member": "m-000002", "rolled": True, "n_docs": 3}
    st = state.read_stats(os.path.join(grp, "m-000002"))
    assert int(st["n_docs"]) == 3
    # group search sees exactly the published members' docs
    doc, _ = ro.topk(grp, "table scan join fast", 50, rank_round=9)
    assert set(doc.tolist()) <= set(range(0, 5)) | set(range(100, 103))
