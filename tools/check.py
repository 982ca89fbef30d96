#!/usr/bin/env python3
"""Local correctness pre-check mimicking the driver's DuckDB-oracle gate.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`:
    python3 tools/check.py <sfDir> <outDir>

For each <outDir>/<name> parquet result, runs <outDir>/oracle_sql.json[name]
in DuckDB with views over <sfDir>/*.parquet, sorts columns by name,
sorts rows, and compares values (exact for non-floats; floats must agree
to full precision — the driver hash-compares, so treat any FP diff as FAIL).

This is local dev tooling only; the Scala library never depends on it.
"""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return v
    return v


def load_result(path):
    # Verify writes a directory of part files
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        return None
    import pyarrow as pa
    tbl = pa.concat_tables([pq.read_table(f) for f in files])
    return tbl


def rows_of(tbl):
    cols = sorted(tbl.column_names)
    data = {c: tbl.column(c).to_pylist() for c in cols}
    n = tbl.num_rows
    return cols, [tuple(data[c][i] for c in cols) for i in range(n)]


def canon(v):
    # canonicalize for cross-engine compare: decimals -> float? no: exact str
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, datetime.date):
        return ("ts", datetime.datetime(v.year, v.month, v.day).isoformat())
    if isinstance(v, float):
        return ("f", repr(v))
    if isinstance(v, int):
        return ("i", v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (e.g. the sf1 replica)
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        rpath = os.path.join(out_dir, name)
        got_tbl = load_result(rpath)
        if got_tbl is None:
            print(f"FAIL {name}: no spark result at {rpath}")
            n_fail += 1
            continue
        try:
            exp = con.execute(sql).fetch_arrow_table()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            n_fail += 1
            continue
        gc, gr = rows_of(got_tbl)
        ec, er = rows_of(exp)
        if [c.lower() for c in gc] != [c.lower() for c in ec]:
            print(f"FAIL {name}: columns differ spark={gc} duck={ec}")
            n_fail += 1
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rowcount spark={len(gr)} duck={len(er)}")
            n_fail += 1
            continue
        grs = sorted((tuple(canon(x) for x in r) for r in gr), key=repr)
        ers = sorted((tuple(canon(x) for x in r) for r in er), key=repr)
        bad = [(a, b) for a, b in zip(grs, ers) if a != b]
        if bad:
            print(f"FAIL {name}: {len(bad)}/{len(grs)} rows differ; first: spark={bad[0][0]} duck={bad[0][1]}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(gr)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
