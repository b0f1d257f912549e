#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (Spark output), runs the matching
SQL from <verifyOutDir>/oracle_sql.json in DuckDB against <sfDir>'s tables,
sorts columns by name on both sides, and compares row count, schema, and
values. Dev-only tool — not part of the shipped library.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        qdir = Path(out_dir) / name
        if not qdir.exists():
            print(f"FAIL {name}: no Spark output dir")
            n_fail += 1
            continue
        try:
            got = pd.read_parquet(qdir)
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            n_fail += 1
            continue
        got = got[sorted(got.columns)].reset_index(drop=True)
        exp = exp[sorted(exp.columns)].reset_index(drop=True)
        problems = []
        if list(got.columns) != list(exp.columns):
            problems.append(f"schema: spark={list(got.columns)} duck={list(exp.columns)}")
        elif len(got) != len(exp):
            problems.append(f"rows: spark={len(got)} duck={len(exp)}")
        else:
            for c in got.columns:
                g, e = got[c], exp[c]
                try:
                    if str(g.dtype) != str(e.dtype):
                        problems.append(f"dtype[{c}]: spark={g.dtype} duck={e.dtype}")
                    neq = ~((g == e) | (g.isna() & e.isna()))
                    if neq.any():
                        i = int(neq.idxmax())
                        problems.append(
                            f"values[{c}]: {int(neq.sum())} diffs, first@row{i}: "
                            f"spark={g.iloc[i]!r} duck={e.iloc[i]!r}")
                except Exception as ex:
                    problems.append(f"compare[{c}]: {ex}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
