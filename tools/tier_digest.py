#!/usr/bin/env python3
"""Per-table CONTENT digests + physical-layout fingerprints for the
test-data tiers -> TIERS.json.

Two distinct jobs, one manifest (r14 VERDICT items 1+2):

1. CONTENT digest (order-insensitive): `count(*)` plus the HUGEINT sum
   of DuckDB's 64-bit row `hash()` over all columns (sorted by name).
   Row order, file layout, and row-group geometry do NOT affect it —
   only the row multiset does. A regenerated tier whose digests equal
   the recorded ones is CONTENT-IDENTICAL to the tier the standing
   CORRECTNESS results were measured on, so carry-over claims cite
   digest equality instead of determinism-by-construction.

2. LAYOUT fingerprint: per table, file count / total bytes / parquet
   row-group count / row-group row distribution. Content digests can
   match while layouts differ (different partitioning at write time),
   and layout is exactly the variable the sf5 bench question needs
   pinned: cross-round bench deltas are only comparable against the
   SAME layout fingerprint.

Usage:
    tools/tier_digest.py TIER_DIR [TIER_DIR ...] [--out=TIERS.json]

Each TIER_DIR becomes a key in the output manifest (merged with any
existing file, so tiers can be re-digested one at a time). Comparing
two generations of one tier:
    tools/tier_digest.py testdata-local5/sf5 --out=/tmp/a.json
    tools/tier_digest.py /tmp/sf5_regen --out=/tmp/b.json
and diff the per-table `content` strings (equality = identical rows)
and `layout` blocks (equality = identical physical geometry).
"""
import glob
import json
import os
import sys

import duckdb
import pyarrow.parquet as pq

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def table_files(tier, t):
    p = f"{tier}/{t}.parquet"
    if os.path.isdir(p):
        return sorted(glob.glob(f"{p}/*.parquet"))
    return [p] if os.path.exists(p) else []


def content_digest(con, files):
    """count + order-insensitive HUGEINT sum of per-row 64-bit hashes,
    columns sorted by name so column order at write time is irrelevant.
    Sum (not xor): xor cancels duplicate pairs, and duplicate rows are
    load-bearing in the dedup tables."""
    cols = [r[0] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()]
    collist = ", ".join(f'"{c}"' for c in sorted(cols))
    n, s = con.execute(
        f"SELECT count(*), sum(hash({collist})::HUGEINT) "
        f"FROM read_parquet({files!r})").fetchone()
    return f"{n}:{int(s or 0):x}", int(n), sorted(cols)


def layout_fingerprint(files):
    total_bytes = 0
    row_groups = 0
    rg_rows = []
    for f in files:
        total_bytes += os.path.getsize(f)
        m = pq.ParquetFile(f).metadata
        row_groups += m.num_row_groups
        rg_rows.extend(m.row_group(i).num_rows for i in range(m.num_row_groups))
    return {
        "files": len(files),
        "bytes": total_bytes,
        "row_groups": row_groups,
        "row_group_rows_min": min(rg_rows) if rg_rows else 0,
        "row_group_rows_max": max(rg_rows) if rg_rows else 0,
    }


def digest_tier(tier):
    con = duckdb.connect()
    out = {}
    for t in TABLES:
        files = table_files(tier, t)
        if not files:
            continue
        digest, n, cols = content_digest(con, files)
        out[t] = {
            "rows": n,
            "content": digest,
            "columns": cols,
            "layout": layout_fingerprint(files),
        }
        print(f"[digest] {tier}/{t}: rows={n} content={digest[:40]}... "
              f"files={out[t]['layout']['files']} "
              f"row_groups={out[t]['layout']['row_groups']}")
    con.close()
    return out


def main():
    out_path = "TIERS.json"
    tiers = []
    for a in sys.argv[1:]:
        if a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        else:
            tiers.append(a)
    if not tiers:
        sys.exit(__doc__)
    manifest = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            manifest = json.load(f)
    manifest.setdefault("note", (
        "content = '<rows>:<hex>' order-insensitive per-table digest "
        "(HUGEINT sum of DuckDB hash() over name-sorted columns); equal "
        "content across regenerations = identical row multisets. layout "
        "= the physical geometry bench numbers are only comparable "
        "against. Regenerate any tier -> re-run tools/tier_digest.py "
        "on it before citing standing results."))
    for tier in tiers:
        key = os.path.normpath(tier)
        manifest[key] = digest_tier(tier)
    with open(out_path, "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
        f.write("\n")
    print(f"[digest] wrote {out_path}")


if __name__ == "__main__":
    main()
