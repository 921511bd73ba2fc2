#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run graft.Verify's
parquet dumps against the DuckDB oracle SQL and diff them.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
(Uses the driver-side duckdb/pyarrow installs — build code must not.)
"""
import sys, os, json, glob
import duckdb


def load_table_views(con, sf_dir):
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.splitext(os.path.basename(p))[0]
        con.execute(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM read_parquet('{p}')")


def normalize(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=repr)
    return [sorted(c for c in cols)] + out


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    load_table_views(con, sf_dir)
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name, sql in sorted(oracles.items()):
        spark_dir = os.path.join(out_dir, name + ".parquet")
        if not os.path.isdir(spark_dir):
            spark_dir = os.path.join(out_dir, name)
        if not os.path.isdir(spark_dir):
            print(f"MISSING  {name}: no spark output dir")
            n_fail += 1
            continue
        try:
            oracle = con.execute(sql)
            ocols = [d[0] for d in oracle.description]
            orows = oracle.fetchall()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}")
            n_fail += 1
            continue
        try:
            sq = con.execute(f"SELECT * FROM read_parquet('{spark_dir}/*.parquet')")
            scols = [d[0] for d in sq.description]
            srows = sq.fetchall()
        except Exception as e:
            print(f"SPARK-ERR {name}: {e}")
            n_fail += 1
            continue
        a, b = normalize(srows, scols), normalize(orows, ocols)
        if a == b:
            print(f"PASS     {name}: {len(srows)} rows")
            n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL     {name}: spark {len(srows)} rows cols={sorted(scols)} vs oracle {len(orows)} rows cols={sorted(ocols)}")
            sa, sb = set(map(repr, a[1:])), set(map(repr, b[1:]))
            for x in list(sa - sb)[:3]:
                print(f"         spark-only: {x}")
            for x in list(sb - sa)[:3]:
                print(f"         oracle-only: {x}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
