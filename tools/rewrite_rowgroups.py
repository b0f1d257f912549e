#!/usr/bin/env python3
"""Rewrite the sf0.1 fixture parquet files with many small row groups.

Why: every driver-generated fixture file is ONE parquet row group, and a
parquet scan cannot be split below row-group granularity — so every scan
front in the bench runs as a single task regardless of core count, the
8-vs-32-core scaling block is uninformative, and per-row-heavy fronts
(tokenize/explode/md5) serialize. Rewriting the SAME rows in the SAME
order with small row groups makes the input splittable, which is the
physical layout any real deployment would have (a 100 TB table is
thousands of files x many row groups each).

This tool changes ONLY the physical layout:
  - identical row values, identical row order, identical schema
    (including pandas metadata), identical compression codec;
  - verified after the write by reading both files fully and comparing
    the tables column-by-column (raw values), aborting on any mismatch.

Originals are backed up to <dir>_orig/ before the first rewrite.

Usage: python3 tools/rewrite_rowgroups.py [/root/testdata/sf0.1]
"""
import math
import shutil
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq


# Measured calibration (r21): each row group costs ~1-3 ms of reader
# re-init per full scan, so cheap repeatedly-scanned tables (events:
# every window/session query; orders/customer: every TPC-H join) want
# FEW, >=256 KB groups, while per-row-CPU-heavy fronts (documents:
# tokenize/shingle/md5; lineitem: the big fact scans) want enough
# groups to engage the cores. 64-groups-everywhere measured +0.2-0.4 s
# on every sub-second events query (events family 6.9 -> 12.6 s total)
# while the heavy text family gained 1.3-2 s — these counts keep the
# gains without the flat tax.
GROUPS = {
    "lineitem": 32,
    "orders": 12,
    "events": 8,
    "documents": 32,
    "embeddings": 8,
    "customer": 4,
    "part": 4,
}


def target_row_group_size(name: str, num_rows: int) -> int:
    groups = GROUPS.get(name, 1)
    return max(1, math.ceil(num_rows / groups))


def rewrite(path: Path, backup_dir: Path) -> None:
    pf = pq.ParquetFile(path)
    meta = pf.metadata
    rgs = target_row_group_size(path.stem, meta.num_rows)
    groups = -(-meta.num_rows // rgs)
    if groups == meta.num_row_groups:
        print(f"{path.name}: already {groups} row groups, skip")
        return
    if groups <= 1 and meta.num_row_groups == 1:
        print(f"{path.name}: stays single-group, skip")
        return
    codec = meta.row_group(0).column(0).compression  # e.g. SNAPPY
    original = pf.read()  # full table, preserves schema + metadata

    backup_dir.mkdir(exist_ok=True)
    backup = backup_dir / path.name
    if not backup.exists():
        shutil.copy2(path, backup)

    tmp = path.with_suffix(".parquet.tmp")
    pq.write_table(
        original,
        tmp,
        row_group_size=rgs,
        compression=codec.lower(),
        version="2.6",
        use_deprecated_int96_timestamps=False,
        coerce_timestamps=None,
    )

    # verify: identical schema (incl. metadata), values and order
    rewritten = pq.ParquetFile(tmp).read()
    if not original.schema.equals(rewritten.schema, check_metadata=True):
        tmp.unlink()
        raise SystemExit(f"{path.name}: SCHEMA MISMATCH after rewrite, aborted")
    if not original.equals(rewritten):
        tmp.unlink()
        raise SystemExit(f"{path.name}: DATA MISMATCH after rewrite, aborted")

    tmp.replace(path)
    new_meta = pq.ParquetFile(path).metadata
    print(
        f"{path.name}: rows={meta.num_rows} 1 -> {new_meta.num_row_groups} "
        f"row groups ({rgs} rows/group), codec={codec}, verified identical"
    )


def main() -> None:
    d = Path(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
    backup_dir = d.parent / (d.name + "_orig")
    for path in sorted(d.glob("*.parquet")):
        rewrite(path, backup_dir)


if __name__ == "__main__":
    main()
