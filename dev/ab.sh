#!/bin/bash
# Cal-matched isolated A/B for the optimization round: runs the SAME
# SPARK_GRAFT_ONLY bench once against the OLD classes (a worktree of
# the pre-change commit, arg 3) and once against the NEW classes
# (/root/repo), interleaved order new,old,new,old via two passes when
# arg 4 = 2. Usage: dev/ab.sh <only-list> <sfdir> <old-tree> [passes]
set -e
ONLY=$1
SF=${2:-/root/testdata/sf0.1}
OLD=${3:-/tmp/graft_old}
PASSES=${4:-1}
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
JARS=$(ls /opt/spark/jars/*.jar | tr '\n' ':')
run() { # $1=tree $2=tag $3=pass
  SPARK_GRAFT_ONLY=$ONLY SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
  SPARK_GRAFT_BENCH_OUT=/tmp/ab_$2_$3.json \
  java $ADD_OPENS -Xmx48g -Dspark.ui.enabled=false \
    -cp "$1/target/scala-2.13/classes:$JARS" graft.Bench 2>/dev/null
}
for p in $(seq 1 "$PASSES"); do
  echo "--- pass $p NEW ---"; (cd /root/repo && run /root/repo new "$p")
  echo "--- pass $p OLD ---"; (cd "$OLD" && run "$OLD" old "$p")
done
