#!/usr/bin/env python3
"""DuckDB oracle compare, mimicking the driver's correctness gate.

For each query dir under OUT: read Spark's parquet result, run the
oracle SQL from oracle_sql.json against DuckDB views of the same sf
tables, sort columns by name and rows by all columns, then compare
cell-by-cell (exact; floats reported with max-abs-diff so near-misses
are visible before they become hash mismatches)."""
import sys, os, json, glob
import duckdb
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sfdir, outdir):
    con = duckdb.connect()
    for t in TABLES:
        # driver testdata is one file per table; ScaleUp output is a
        # Spark-style directory of part files — glob in that case
        path = f"{sfdir}/{t}.parquet"
        if os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name in sorted(oracles):
        qdir = os.path.join(outdir, name)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            got = pq.read_table(files[0]).to_pandas()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}"); n_fail += 1; continue
        try:
            exp = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); n_fail += 1; continue
        cols_g, cols_e = sorted(got.columns), sorted(exp.columns)
        if cols_g != cols_e:
            print(f"FAIL {name}: columns differ spark={cols_g} oracle={cols_e}"); n_fail += 1; continue
        got = got[cols_g].sort_values(cols_g, ignore_index=True)
        exp = exp[cols_g].sort_values(cols_g, ignore_index=True)
        if len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}"); n_fail += 1; continue
        bad = []
        for c in cols_g:
            g, e = got[c], exp[c]
            # Driver proxy: the driver hashes STRING cells, so an
            # int64 column on one side and float64 on the other ("450"
            # vs "450.0") fails its hash even when the values agree.
            # The float branch below would silently absorb that — fail
            # the type drift first (the events_growth r5 failure class).
            kg, ke = g.dtype.kind, e.dtype.kind
            if kg in "iuf" and ke in "iuf" and (kg in "iu") != (ke in "iu"):
                bad.append(f"{c}: dtype drift spark={g.dtype} oracle={e.dtype} "
                           "(driver string-hash would mismatch)")
                continue
            if g.dtype.kind == "f" or e.dtype.kind == "f":
                import numpy as np
                ga, ea = g.astype(float).values, e.astype(float).values
                both_nan = (ga != ga) & (ea != ea)
                diff = abs(ga - ea)
                diff[both_nan] = 0.0
                md = float(diff.max()) if len(diff) else 0.0
                if md > 0:
                    bad.append(f"{c}: max_abs_diff={md:.3e}")
            else:
                neq = (g.astype(str) != e.astype(str))
                if neq.any():
                    i = int(neq.idxmax())
                    bad.append(f"{c}: row{i} spark={g[i]!r} oracle={e[i]!r} ({int(neq.sum())} cells)")
        if bad:
            print(f"FAIL {name}: " + "; ".join(bad)); n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
