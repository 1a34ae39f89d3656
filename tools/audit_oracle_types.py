"""Audit every oracle_sql() entry for DuckDB result columns that type as
HUGEINT/UHUGEINT: pandas materializes those as float64 while the engine
emits int64, which breaks the driver's value-hash even when values match
(the round-4 `sliding_window` red — VERDICT r4 "What's wrong" #1).

Runs DuckDB only (no Ray); seconds at sf0.001.

Usage: python tools/audit_oracle_types.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __ray_entry__ as entry_mod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    oracles = entry_mod.oracle_sql()
    n_bad = 0
    for name, sql in sorted(oracles.items()):
        try:
            rel = con.sql(sql)
            bad = [
                (c, str(ty))
                for c, ty in zip(rel.columns, rel.types)
                if str(ty) in ("HUGEINT", "UHUGEINT")
            ]
        except Exception as e:
            print(f"[ERR] {name}: oracle raised: {str(e)[:200]}")
            n_bad += 1
            continue
        if bad:
            print(f"[HUGEINT] {name}: {bad}")
            n_bad += 1
    print(f"\n{len(oracles)} oracles audited, {n_bad} flagged")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
