#!/bin/bash
# The 10x scale sweep as one command (r7 verdict task 4, kept
# reproducible): materialize sf1 from sf0.1 via graft.ScaleUp, run the
# full graft.Bench at both scales back-to-back on an (ideally idle)
# box, and emit BENCH_SF1.json + a ratio table to stdout.
# Usage: dev/sweep.sh [srcSf=/root/testdata/sf0.1] [outDir=/tmp/sf1] [tiles=10]
set -eo pipefail
cd /root/repo
SRC=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/sf1}
TILES=${3:-10}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
J="java $ADD_OPENS -Xmx24g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"

sbt -batch compile | tail -1
rm -rf "$OUT"
$J graft.ScaleUp "$SRC" "$OUT" "$TILES" 2>&1 | grep scaleup

echo "== bench $SRC =="
SPARK_GRAFT_SF_DIR=$SRC SPARK_GRAFT_CPUS=32 $J graft.Bench 2>/dev/null | tail -1
cp bench_full.json /tmp/sweep_base.json
echo "== bench $OUT =="
SPARK_GRAFT_SF_DIR=$OUT SPARK_GRAFT_CPUS=32 $J graft.Bench 2>/dev/null | tail -1
cp bench_full.json /tmp/sweep_scaled.json

python3 - "$TILES" <<'EOF'
import json, sys, statistics
tiles = sys.argv[1]
a = json.load(open('/tmp/sweep_base.json'))
b = json.load(open('/tmp/sweep_scaled.json'))
qa, qb = a['queries'], b['queries']
failed = sorted([q for q in qa if qa[q] < 0] + [q for q in qb if qb[q] < 0])
if failed:
    # a query that FAILS at either scale is the sweep's loudest
    # possible finding — surface it instead of letting a -1 produce a
    # negative 'ratio' that sails under the superlinear gate
    print(f"FAILED queries in sweep: {failed}")
    sys.exit(1)
ratios = {q: round(qb[q] / qa[q], 2) for q in qa if qa[q] > 0}
out = {
    "note": f"{tiles}x scale sweep via dev/sweep.sh: ScaleUp-tiled corpus, "
            "full graft.Bench both scales back-to-back, min-of-runs per query",
    "sf0.1": {"total_sec": a["value"], "queries": qa},
    "sf1": {"total_sec": b["value"], "queries": qb},
    "ratio_sf1_over_sf0.1": dict(sorted(ratios.items(), key=lambda kv: -kv[1])),
    "runs_sf1": b["runs"], "shuffle_mb_sf1": b["shuffle_mb"],
}
json.dump(out, open('BENCH_SF1.json', 'w'), indent=1)
top = sorted(ratios.items(), key=lambda kv: -kv[1])[:12]
print(f"{'query':28s} {'base':>7s} {'scaled':>8s} {'ratio':>6s}")
for q, r in top:
    print(f"{q:28s} {qa[q]:7.2f} {qb[q]:8.2f} {r:6.1f}")
print(f"median ratio {statistics.median(ratios.values()):.2f}, "
      f"total {a['value']:.1f}s -> {b['value']:.1f}s; BENCH_SF1.json written")
bad = [q for q, r in ratios.items() if r > 13]
if bad:
    print(f"SUPERLINEAR (>13x): {bad}")
    sys.exit(1)
EOF
echo "== sweep complete =="
