#!/usr/bin/env python3
"""Local bench baseline: time every SparkEntry oracle in DuckDB.

BASELINE.md publishes no timings at any scale factor, so the "within 2x
of baseline" bench gate has had no denominator in rounds 1-6. This
manufactures one: DuckDB is the same engine the driver trusts for
correctness, it runs the SAME SQL over the SAME parquet tables, and it
is a strong single-node columnar baseline — beating or tracking it at
sf0.1 is meaningful evidence the Spark plans are sane (Spark carries
JVM/codegen/scheduling overhead DuckDB doesn't, so parity-ish at this
scale is the realistic target; Spark's win is that the same plans
scale out).

Methodology mirrors graft.Bench: per query one warm-up run, then two
timed runs, min-of-two reported; results fully materialized
(fetchall). Threads default to the same CPU count the Spark bench
uses. Output: BASELINE_LOCAL.json {sf, engine, threads, total_s,
queries:{name: sec}}.

Usage: dev/baseline.py [sfdir] [oracle_sql.json] [out.json]
"""
import sys, os, json, time, threading
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main(sfdir, oracle_path, out_path, threads=32):
    con = duckdb.connect()
    con.execute(f"SET threads={threads}")
    for t in TABLES:
        # ScaleUp-tiled corpora are Spark-style directories of part
        # files (the dev/compare.py rule) — glob in that case
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(oracle_path))
    times = {}

    # Oracles are written for CORRECTNESS at sf0.01 (several are
    # deliberately brute-force, e.g. all-pairs similarity sweeps); at
    # sf0.1 one of those could run for hours. A watchdog interrupt
    # bounds every run; a timed-out query records -2 and the Spark/
    # DuckDB ratio for it is reported as ">Nx in Spark's favor".
    def run_bounded(sql, budget_s=180.0):
        done = threading.Event()

        def watchdog():
            if not done.wait(budget_s):
                con.interrupt()
        w = threading.Thread(target=watchdog, daemon=True)
        w.start()
        try:
            con.execute(sql).fetchall()
        finally:
            done.set()
            w.join()

    for name in sorted(oracles):
        sql = oracles[name]
        try:
            run_bounded(sql)  # warm-up: page cache + plan
            runs = []
            for _ in range(2):
                t0 = time.perf_counter()
                run_bounded(sql)
                runs.append(time.perf_counter() - t0)
            times[name] = round(min(runs), 3)
            print(f"{name:28s} {times[name]:7.3f}s", file=sys.stderr)
        except duckdb.InterruptException:
            times[name] = -2.0
            print(f"{name:28s} TIMEOUT (>180s)", file=sys.stderr)
        except Exception as e:
            times[name] = -1.0
            print(f"{name:28s} FAILED: {e}", file=sys.stderr)
    total = round(sum(v for v in times.values() if v >= 0), 3)
    out = {"sf": sfdir, "engine": f"duckdb {duckdb.__version__}",
           "threads": threads, "total_s": total, "queries": times}
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"== duckdb total {total}s over "
          f"{sum(1 for v in times.values() if v >= 0)} queries -> {out_path} ==",
          file=sys.stderr)


if __name__ == "__main__":
    sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    oracle = sys.argv[2] if len(sys.argv) > 2 else "/tmp/oracle_sql.json"
    out = sys.argv[3] if len(sys.argv) > 3 else "/root/repo/BASELINE_LOCAL.json"
    main(sfdir, oracle, out)
