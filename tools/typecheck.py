#!/usr/bin/env python3
"""Declared-type parity audit (r5 verdict item 3, generalized): for
every query, DESCRIBE the Spark parquet output and the DuckDB oracle
result and demand IDENTICAL column types. Values being equal is not
enough — the driver's hash gate stringifies by declared type, and r5
lost 5 queries to DECIMAL(38,0)-vs-HUGEINT / DECIMAL(22,2)-vs-
DECIMAL(38,2) drift that tools/check.py (value-level) cannot see."""
import glob
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def types_of(con, rel_sql):
    rows = con.sql(f"DESCRIBE {rel_sql}").fetchall()
    return {r[0]: r[1] for r in rows}


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    # optional name filter (argv[3:]) mirrors Verify's dev-only
    # single-query mode — without it a partial dump would drown in
    # spurious MISSING-OUTPUT lines
    only = set(sys.argv[3:])
    n_ok = n_bad = 0
    # iterate the ORACLE list, not the output listing: a query that
    # crashed before writing must show up as MISSING-OUTPUT, not fall
    # out of the audit silently
    for name in sorted(only if only else oracle):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        try:
            st = types_of(con, f"SELECT * FROM read_parquet({files!r})")
            ot = types_of(con, f"({oracle[name]})")
        except Exception as e:
            print(f"ERROR          {name}: {e}")
            n_bad += 1
            continue
        diffs = []
        for c in sorted(set(st) | set(ot)):
            a, b = st.get(c, "<absent>"), ot.get(c, "<absent>")
            if a != b:
                diffs.append(f"{c}: spark={a} oracle={b}")
        # r6 verdict items 1-2: the driver's hash renderer treats
        # DECIMAL cells asymmetrically between its Spark-parquet and
        # DuckDB-oracle paths, so NO query may emit DECIMAL (or the
        # DuckDB-only HUGEINT) at its output edge even when both sides
        # declare the identical type — cast to BIGINT inside the
        # envelope, VARCHAR beyond it. Empirical: r6 had a perfect
        # 12/12 vs 0/199 correlation between DECIMAL-at-edge and
        # hash-fail with byte-identical values.
        # (spark columns only: an oracle-only column is already a
        # TYPE-MISMATCH above, and type parity means a banned oracle
        # type implies a banned spark type)
        banned = [f"{c}: {t}" for c, t in sorted(st.items())
                  if "DECIMAL" in t or "HUGEINT" in t]
        if diffs:
            n_bad += 1
            print(f"TYPE-MISMATCH  {name}: " + "; ".join(diffs))
        elif banned:
            n_bad += 1
            print(f"DECIMAL-AT-EDGE {name}: " + "; ".join(banned))
        else:
            n_ok += 1
    print(f"\n{n_ok} type-identical, {n_bad} mismatched")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
