#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run DuckDB oracle SQL
against the sf parquet tables and compare with Verify's parquet dumps.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pyarrow.parquet as pq

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(rows, cols):
    # sort columns by name, then rows by value tuple (driver-style compare)
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(r[i] for i in idx) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return [c for c in sorted(cols)], out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        import pyarrow as pa
        tbl = pa.concat_tables([pq.read_table(f) for f in files])
        scols = tbl.column_names
        srows = [tuple(row[c] for c in scols) for row in tbl.to_pylist()]
        try:
            res = con.sql(sql)
            dcols = res.columns
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        sc, sr = norm(srows, scols)
        dc, dr = norm(drows, dcols)
        if [c.lower() for c in sc] != [c.lower() for c in dc]:
            print(f"FAIL {name}: columns {sc} vs {dc}")
            failures += 1
        elif sr != dr:
            print(f"FAIL {name}: rows {len(sr)} vs {len(dr)}")
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:5]
            for a, b in diff:
                print(f"   spark={a}\n   duck ={b}")
            if len(sr) != len(dr):
                print(f"   spark head: {sr[:3]}\n   duck head : {dr[:3]}")
            failures += 1
        else:
            print(f"OK   {name}: {len(sr)} rows")
    print(f"{'ALL OK' if failures == 0 else str(failures) + ' FAILURES'}")
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
