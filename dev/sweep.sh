#!/bin/bash
# The scale sweep as one command (r7 verdict task 4, generalized in r9
# past 10x): materialize tiles x sf0.1 via graft.ScaleUp (composed
# word-parity rotations keep tiles shingle-disjoint up to 676), run the
# graft.Bench suite at both scales back-to-back on an (ideally idle)
# box, and emit <outJson> + a ratio table to stdout.
# Usage: dev/sweep.sh [srcSf=/root/testdata/sf0.1] [outDir=/tmp/sf1] \
#                     [tiles=10] [outJson=BENCH_SF1.json]
# Env: SPARK_GRAFT_ONLY=q1,q2 restricts both bench runs to a family;
# SPARK_GRAFT_EXCLUDE overrides the scaled run's exclusion list (at
# tiles >= 100 it defaults to the exhaustive-exact-baseline family —
# see BRUTE_FAMILY below — and the artifact records the exclusion);
# SPARK_GRAFT_REUSE_BASE=/path.json reuses a base-run artifact from an
# earlier sweep of the SAME code on the SAME $SRC (two sweeps launched
# back-to-back share one idle base run instead of paying it twice) —
# the artifact records the reuse and keeps the base's own cal/spread.
set -eo pipefail
cd /root/repo
SRC=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/sf1}
TILES=${3:-10}
OUTJSON=${4:-BENCH_SF1.json}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
# -XX:GCLockerRetryAllocationCount: the r11 full sweep's scaled JVM
# died with "Retried waiting for GCLocker too often allocating 3
# words" ~75 min in (JNI critical sections from parquet/compression
# starving tiny allocations; the JDK default retry count is 2) — the
# standard mitigation is raising the retry count. 64g heap for the
# 100x ANN/lifecycle stages' headroom on the 128g box.
J="java $ADD_OPENS -Xmx64g -XX:+UnlockDiagnosticVMOptions -XX:GCLockerRetryAllocationCount=64 -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

sbt -batch compile | tail -1
# SPARK_GRAFT_KEEP_TILES=1 reuses an already-materialized $OUT (e.g. a
# family sweep followed by the full suite at the same tile count) —
# ScaleUp is deterministic, so the tiles are identical either way.
if [ "${SPARK_GRAFT_KEEP_TILES:-0}" = "1" ] && [ -d "$OUT" ]; then
  echo "reusing tiles at $OUT"
else
  rm -rf "$OUT"
  $J graft.ScaleUp "$SRC" "$OUT" "$TILES" 2>&1 | grep scaleup
fi

# No default exclusion at any tile count since r13: the ANN oracle
# workload is a FIXED-size query sample (Similarity.QuerySample), so
# the exact-baseline family is O(Q*N) with constant Q — linear in the
# corpus like everything else. (Pre-r13 the sample was vec_id % 100,
# Q = N/100 made that family tiles^2 by construction and it had to be
# dropped at >= 100x.) SPARK_GRAFT_EXCLUDE stays available as an
# explicit caller override, recorded in the artifact.
SCALED_EXCLUDE=${SPARK_GRAFT_EXCLUDE:-}

# bench stderr goes to a side log, not /dev/null: when a multi-hour
# scaled run dies (OOM, kill) the [bench]/JVM diagnostics there are
# the only evidence of which query was running and why it died.
# SPARK_GRAFT_BENCH_OUT writes each run's full artifact to its OWN
# path: r11's sweep lost its completed scaled half because the shared
# bench_full.json was overwritten by a concurrent bench between the
# run's last write and the cp that used to live here.
if [ -n "${SPARK_GRAFT_REUSE_BASE:-}" ] && [ -f "$SPARK_GRAFT_REUSE_BASE" ]; then
  echo "== bench $SRC == (reusing base artifact $SPARK_GRAFT_REUSE_BASE)"
  cp "$SPARK_GRAFT_REUSE_BASE" /tmp/sweep_base.json
  BASE_REUSED="$SPARK_GRAFT_REUSE_BASE"
else
  echo "== bench $SRC =="
  SPARK_GRAFT_SF_DIR=$SRC SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT=/tmp/sweep_base.json \
    $J graft.Bench 2>/tmp/sweep_bench_base.err | tail -1
  BASE_REUSED=""
fi
echo "== bench $OUT =="
SPARK_GRAFT_SF_DIR=$OUT SPARK_GRAFT_CPUS=32 SPARK_GRAFT_BENCH_OUT=/tmp/sweep_scaled.json \
  SPARK_GRAFT_EXCLUDE="$SCALED_EXCLUDE" \
  $J graft.Bench 2>/tmp/sweep_bench_scaled.err | tail -1

SWEEP_EXCLUDED="$SCALED_EXCLUDE" SWEEP_BASE_REUSED="$BASE_REUSED" \
  python3 - "$TILES" "$OUTJSON" <<'EOF'
import json, sys, statistics
tiles = int(sys.argv[1])
outjson = sys.argv[2]
a = json.load(open('/tmp/sweep_base.json'))
b = json.load(open('/tmp/sweep_scaled.json'))
import os
qa, qb = a['queries'], b['queries']
# scaled-side exclusions (tiles>=100 brute-family) are EXPLICIT in the
# artifact: a query in the base run but not the scaled one must be on
# the declared exclusion list, anything else is a silent hole.
excluded = sorted(x for x in os.environ.get('SWEEP_EXCLUDED', '').split(',') if x)
holes = sorted(set(qa) - set(qb) - set(excluded))
if holes:
    print(f"queries missing from the scaled run but NOT declared excluded: {holes}")
    sys.exit(1)
# ...and the other direction (r12 advice): a query timed at scale but
# absent from a REUSED base artifact (stale SPARK_GRAFT_REUSE_BASE
# from an older code rev) would otherwise be silently dropped from
# the ratio table by the `q in qb` filter below.
base_holes = sorted(set(qb) - set(qa))
if base_holes:
    print(f"queries timed in the scaled run but absent from the base artifact "
          f"(stale SPARK_GRAFT_REUSE_BASE?): {base_holes}")
    sys.exit(1)
failed = sorted([q for q in qa if qa[q] < 0] + [q for q in qb if qb[q] < 0])
if failed:
    # a query that FAILS at either scale is the sweep's loudest
    # possible finding — surface it instead of letting a -1 produce a
    # negative 'ratio' that sails under the superlinear gate
    print(f"FAILED queries in sweep: {failed}")
    sys.exit(1)
ratios = {q: round(qb[q] / qa[q], 2) for q in qa if qa[q] > 0 and q in qb}
out = {
    "note": f"{tiles}x scale sweep via dev/sweep.sh: ScaleUp-tiled corpus, "
            "graft.Bench both scales back-to-back, min-of-runs per query",
    "tiles": tiles,
    "excluded_at_scale": excluded,
    "excluded_reason": ("exhaustive exact-baseline scaffolding: O(Q*N) with "
                        "Q = N/100 is tiles^2 by construction — hours per query "
                        "at >=100x; priced at 1x/10x/26x instead" if excluded else None),
    "base": {"sf": a["sf"], "total_sec": a["value"], "cal_ms": a.get("cal"),
             "contended": a.get("contended"), "spread": a.get("spread"),
             "reused_from": os.environ.get('SWEEP_BASE_REUSED') or None,
             "queries": qa},
    "scaled": {"sf": b["sf"], "total_sec": b["value"], "cal_ms": b.get("cal"),
               "contended": b.get("contended"), "spread": b.get("spread"), "queries": qb},
    "ratio_scaled_over_base": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    "runs_scaled": b["runs"], "shuffle_mb_scaled": b["shuffle_mb"],
}
if a.get("contended") or b.get("contended"):
    print("WARNING: a bench run flagged itself CONTENDED — numbers are suspect")
json.dump(out, open(outjson, 'w'), indent=1)
top = sorted(ratios.items(), key=lambda kv: -kv[1])[:12]
print(f"{'query':28s} {'base':>7s} {'scaled':>8s} {'ratio':>6s}")
for q, r in top:
    print(f"{q:28s} {qa[q]:7.2f} {qb[q]:8.2f} {r:6.1f}")
print(f"median ratio {statistics.median(ratios.values()):.2f}, "
      f"total {a['value']:.1f}s -> {b['value']:.1f}s; {outjson} written")
# superlinear gate scales with the tile count: linear growth is
# `tiles`x, the old 10x gate allowed 1.3x headroom — keep that margin.
# Since r13 EVERY query is held to the linear envelope: the ANN oracle
# workload is a fixed-size query sample, so the former tiles^2
# scaffolding allowance (Q = N/100) no longer has a justification.
bad = [q for q, r in ratios.items() if r > tiles * 1.3]
if bad:
    print(f"SUPERLINEAR (beyond the linear envelope): {bad}")
    sys.exit(1)
EOF
echo "== sweep complete =="
