#!/usr/bin/env python3
"""DuckDB baseline timing, mirroring graft.Bench's protocol.

Usage: python3 tools/duckbench.py <sfDir> <oracle_sql.json> [out.json]
       python3 tools/duckbench.py <sfDir> <oracle_sql.json> --merge <bench_results.json>

With --merge, per-query DuckDB seconds are folded INTO the file
graft.Bench wrote (each entry gains "duckdb_s" and "ratio", the top
level gains "duckdb_total") so one JSON carries the whole pair of
record.

Creates views over <sfDir>/*.parquet, then for every oracle query runs
one untimed warmup pass followed by two timed passes and records the
minimum — the same warm/min-of-2 protocol graft.Bench applies to the
Spark side, so the comparison in BENCH_NOTES.md is symmetric.
Streaming entries (st*) have no DuckDB counterpart; their oracle SQL is
their batch twin, which is what gets timed. Local dev tooling only.
"""
import sys, os, json, time, glob
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, oracle_path = sys.argv[1], sys.argv[2]
    merge_path = None
    out_path = None
    if len(sys.argv) > 3:
        if sys.argv[3] == "--merge":
            # fail BEFORE the multi-minute battery runs, not at sys.argv[4]
            if len(sys.argv) < 5:
                sys.exit("usage: duckbench.py <sfDir> <oracle.json> --merge <bench_results.json>")
            merge_path = sys.argv[4]
        else:
            out_path = sys.argv[3]
    with open(oracle_path) as f:
        oracle = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table dir (e.g. sf1/sf10 replicas)
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    results = {}
    for name in sorted(oracle):
        sql = oracle[name]
        try:
            con.execute(sql).fetchall()  # warmup
            times = []
            for _ in range(2):
                t0 = time.time()
                con.execute(sql).fetchall()
                times.append(time.time() - t0)
            results[name] = min(times)
        except Exception as e:
            print(f"FAIL {name}: {e}", file=sys.stderr)
            results[name] = None
    total = sum(v for v in results.values() if v is not None)
    doc = {"metric": "total", "value": total, "unit": "sec",
           "queries": results, "sf": sf_dir}
    line = json.dumps(doc)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line)
    if merge_path:
        with open(merge_path) as f:
            bench = json.load(f)
        duck_total = 0.0
        for name, entry in bench.get("queries", {}).items():
            d = results.get(name)
            entry["duckdb_s"] = d
            if d is not None:
                duck_total += d
                if d > 0:
                    entry["ratio"] = round(entry["spark_s"] / d, 3)
        bench["duckdb_total"] = duck_total
        with open(merge_path, "w") as f:
            json.dump(bench, f, indent=2)
        print(f"merged {sum(1 for v in results.values() if v is not None)} "
              f"duckdb timings into {merge_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
