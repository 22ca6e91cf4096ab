#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/crosscheck.py /root/testdata/sf0.01 /tmp/verify_out

Registers each sf parquet table as a DuckDB view, runs every oracle in
oracle_sql.json, and compares (sorted rows, column names sorted) against the
parquet the Spark Verify main dumped.
"""
import json, math, sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(val):
    if val is None:
        return "\0NULL"
    if isinstance(val, float):
        if math.isnan(val):
            return "NaN"
        return f"{val:.10g}"
    return str(val)


def rows_key(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = con.sql(sql)
            want_cols = [d[0] for d in want.description]
            want_rows = want.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failures += 1
            continue
        try:
            got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = [d[0] for d in got.description]
            got_rows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark output missing: {e}")
            failures += 1
            continue
        if sorted(want_cols) != sorted(got_cols):
            print(f"FAIL {name}: columns differ: oracle={sorted(want_cols)} spark={sorted(got_cols)}")
            failures += 1
            continue
        wk, gk = rows_key(want_cols, want_rows), rows_key(got_cols, got_rows)
        if wk != gk:
            print(f"FAIL {name}: rows differ (oracle {len(wk)} vs spark {len(gk)})")
            for i, (w, g) in enumerate(zip(wk, gk)):
                if w != g:
                    print(f"  first diff at {i}:\n    oracle: {w}\n    spark:  {g}")
                    break
            else:
                side = "oracle" if len(wk) > len(gk) else "spark"
                extra = (wk if len(wk) > len(gk) else gk)[min(len(wk), len(gk)):][:3]
                print(f"  extra rows on {side}: {extra}")
            failures += 1
        else:
            print(f"OK   {name} ({len(gk)} rows)")
    no_oracle = [d for d in sorted(__import__('os').listdir(out_dir))
                 if d.startswith('q') and d not in oracle]
    for d in no_oracle:
        n = con.sql(f"SELECT count(*) FROM '{out_dir}/{d}/*.parquet'").fetchone()[0]
        print(f"ROWS {d} ({n} rows, no oracle)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
