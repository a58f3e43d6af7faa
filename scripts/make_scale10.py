"""Materialize a 10x replica of an existing scale-factor directory
("sf1" from sf0.1) for scale-curve measurement — the driver's testdata
is read-only, so the replica lands in a gitignored work dir.

Replication is SELF-UNION WITH KEY OFFSETS (the r6 methodology,
extended to the whole star schema): every fact/dimension that scales
with sf gets 10 copies with replica r adding ``r * (max(key)+1)`` to
its primary key AND to every foreign key that references a scaled
parent, so joins stay referentially intact and selectivities match the
1x data. ``region``/``nation`` are fixed-size in TPC-H (5/25 rows at
every sf) and are copied verbatim — nationkey references remain valid.
Non-key attributes are unchanged, so filters hit the same fractions
and value distributions 10x over.

Single-file parquet per table (duckdb COPY) because the bench proxy
reads ``'{dir}/{t}.parquet'`` as a file path — but with EXPLICIT row
groups sized for ~32-way scan parallelism: Spark splits a parquet file
at row-group boundaries, and DuckDB's default single huge row group
turned every scan of the small/medium tables into ONE task (measured:
simhash 16x / knn 9x / text ops 4-5x wall at 10x data purely from
serial scans; at warehouse scale inputs arrive in thousands of splits,
so a single-split measurement understates the engine, not the data).

Usage: python scripts/make_scale10.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
DST = (
    sys.argv[2]
    if len(sys.argv) > 2
    else os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scale10", "sf1")
)
FACTOR = int(sys.argv[3]) if len(sys.argv) > 3 else 10

# key column -> (table providing the domain, key column) for offsets;
# a table's own PK and the FKs it carries share the parent's offset
OFFSET_DOMAIN = {
    "c_custkey": ("customer", "c_custkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "p_partkey": ("part", "p_partkey"),
    "ps_partkey": ("part", "p_partkey"),
    "ps_suppkey": ("supplier", "s_suppkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}
FIXED_TABLES = ("region", "nation")
SCALED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    offsets: dict[tuple[str, str], int] = {}
    for col, (tab, key) in OFFSET_DOMAIN.items():
        dom = (tab, key)
        if dom not in offsets:
            offsets[dom] = (
                con.sql(
                    f"SELECT max({key}) + 1 FROM '{SRC}/{tab}.parquet'"
                ).fetchone()[0]
            )
    for t in FIXED_TABLES:
        con.sql(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{DST}/{t}.parquet' (FORMAT PARQUET)"
        )
        print(f"{t}: copied verbatim (fixed-size dimension)")
    for t in SCALED_TABLES:
        cols = [
            r[0]
            for r in con.sql(
                f"DESCRIBE SELECT * FROM '{SRC}/{t}.parquet'"
            ).fetchall()
        ]
        sel = []
        for c in cols:
            if c in OFFSET_DOMAIN:
                off = offsets[OFFSET_DOMAIN[c]]
                sel.append(f"{c} + g.r * {off} AS {c}")
            else:
                sel.append(c)
        n_src = con.sql(
            f"SELECT count(*) FROM '{SRC}/{t}.parquet'"
        ).fetchone()[0]
        # ~32 row groups per table (min 2048 rows each) => every scan
        # can fan out across the local executor threads
        rg = max(2048, (n_src * FACTOR) // 32)
        con.sql(
            f"COPY (SELECT {', '.join(sel)} FROM '{SRC}/{t}.parquet', "
            f"(SELECT unnest(generate_series(0, {FACTOR - 1})) AS r) g) "
            f"TO '{DST}/{t}.parquet' (FORMAT PARQUET, ROW_GROUP_SIZE {rg})"
        )
        n = con.sql(f"SELECT count(*) FROM '{DST}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows ({FACTOR}x, row_group {rg})")


if __name__ == "__main__":
    main()
