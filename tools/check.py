#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL
in DuckDB over the sf parquet tables and compare (columns sorted by
name, row-sorted, value-hashed) against the Verify parquet output.

Comparison is EXACT-precision (r6 verdict item 2): values come from
`fetchall()` as native Python objects and stringify losslessly —
`Decimal` via fixed-point `:f` (never scientific), `float` via `repr`
(shortest round-trip). The previous pandas `fetchdf()` path round-
tripped DECIMAL(38,0) through float64, which is lossy above 2**53 and
rendering-normalizing — it reported OK for 11 queries the driver's
hash gate failed."""
import decimal
import glob
import hashlib
import json
import os
import sys

import duckdb

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def cell(v):
    if isinstance(v, decimal.Decimal):
        return f"{v:f}"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, list):
        return "[" + ", ".join(cell(x) for x in v) + "]"
    return str(v)


def canon(con, rel_sql):
    rel = con.sql(rel_sql)
    cols = list(rel.columns)
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    types = {cols[i]: str(rel.types[i]) for i in order}
    rows = [tuple(cell(r[i]) for i in order) for r in rel.fetchall()]
    rows.sort()
    h = hashlib.md5(repr(rows).encode()).hexdigest()
    return types, len(rows), h, rows


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        files = glob.glob(f"{d}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}")
            n_bad += 1
            continue
        spark_rel = f"SELECT * FROM read_parquet({files!r})"
        if name not in oracle:
            n = con.sql(f"SELECT count(*) FROM ({spark_rel})").fetchone()[0]
            print(f"ROWS-ONLY      {name}: {n} rows")
            continue
        try:
            stypes, sn, sh, srows = canon(con, spark_rel)
            otypes, on, oh, orows = canon(con, oracle[name])
        except Exception as e:
            print(f"ERROR          {name}: {e}")
            n_bad += 1
            continue
        if sh == oh:
            print(f"OK             {name}: {sn} rows")
            n_ok += 1
        else:
            n_bad += 1
            print(f"MISMATCH       {name}: spark {sn} rows vs oracle {on} rows")
            if list(stypes) != list(otypes):
                print(f"  spark cols:  {stypes}")
                print(f"  oracle cols: {otypes}")
            shown = 0
            for a, b in zip(srows, orows):
                if a != b and shown < 3:
                    print(f"  spark:  {a}\n  oracle: {b}")
                    shown += 1
            if sn != on:
                sset, oset = set(srows), set(orows)
                for r in list(sset - oset)[:2]:
                    print(f"  only-spark:  {r}")
                for r in list(oset - sset)[:2]:
                    print(f"  only-oracle: {r}")
    print(f"\n{n_ok} ok, {n_bad} bad")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
