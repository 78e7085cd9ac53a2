#!/bin/bash
# Persisted-IVF measurement at K = dynCentroids(N) with two-level
# assignment on the 10x ScaleUp tile set (r13 verdict task 3).
# Usage: dev/ivf_dynk.sh [srcSf=/root/testdata/sf0.1] [tileDir=/tmp/sf1] [tiles=10]
# Reuses an already-materialized tile dir (ScaleUp is deterministic).
set -eo pipefail
cd /root/repo
SRC=${1:-/root/testdata/sf0.1}
OUT=${2:-/tmp/sf1}
TILES=${3:-10}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
J="java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC -cp $CP"
if [ ! -d "$OUT" ]; then
  $J graft.ScaleUp "$SRC" "$OUT" "$TILES" 2>&1 | grep scaleup
fi
SPARK_GRAFT_SF_DIR="$OUT" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} $J graft.IvfDynK
