"""CLI smoke tests (StrucmotifUpdate.main analog) — run in-process via
engine.cli.main so the session Ray fixture is reused."""

import csv
import json
import os

import pytest


def test_cli_query_and_csv(ray_session, tiny_index, tmp_path, capsys):
    from engine.cli import main

    out_csv = str(tmp_path / "hits.csv")
    rc = main(["query", tiny_index, "zqmarker0", "-k", "5", "--csv", out_csv])
    assert rc == 0
    lines = [json.loads(l) for l in capsys.readouterr().out.strip().splitlines()]
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
