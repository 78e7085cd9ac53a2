#!/bin/bash
# Gate a benchmark launch on a QUIET box (the r13 lesson: this VM's
# host noise arrives in multi-minute bursts — idle cal swung 506↔683
# within an hour at zero guest load and zero steal, and any 15-minute
# bench that overlapped a burst flagged itself contended). Probes the
# single-thread cal via a minimal graft.Bench run (~45 s); after two
# consecutive probes under the threshold, runs the given command. If
# the command exits 2 (the convention for "my own base run flagged
# contended — try again"), resumes watching instead of giving up.
#
# Usage: dev/calwatch.sh <command...>
# Env:   SPARK_GRAFT_CAL_QUIET_MS  probe threshold, default 545
#        (tonight's idle band was 500-515; keep the probe threshold
#        under the bench's own 550 contended flag so an accepted
#        launch usually yields an unflagged run)
# Log:   /tmp/cal_watch.log
set -uo pipefail
cd /root/repo
QUIET=${SPARK_GRAFT_CAL_QUIET_MS:-545}
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"
probe() {
  rm -f /tmp/cal_probe.json
  # timeout (r13 advice): a probe JVM hung by a severe host burst or a
  # wedged Spark init would otherwise block the watcher forever; a
  # timed-out probe reads as cal=9999 (missing json) and keeps cycling
  SPARK_GRAFT_ONLY=date_filter SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
    SPARK_GRAFT_CPUS=8 SPARK_GRAFT_BENCH_OUT=/tmp/cal_probe.json \
    timeout 180 java $ADD_OPENS -Xmx4g -Dspark.ui.enabled=false \
    -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench >/dev/null 2>&1
  python3 -c "import json; print(int(json.load(open('/tmp/cal_probe.json'))['cal']))" 2>/dev/null || echo 9999
}
streak=0
while true; do
  c=$(probe)
  echo "$(date +%H:%M:%S) cal $c streak $streak (quiet<$QUIET)" >> /tmp/cal_watch.log
  if [ "$c" -lt "$QUIET" ]; then streak=$((streak+1)); else streak=0; fi
  if [ "$streak" -ge 2 ]; then
    echo "$(date +%H:%M:%S) LAUNCHING: $*" >> /tmp/cal_watch.log
    "$@"
    rc=$?
    if [ "$rc" -eq 2 ]; then
      echo "$(date +%H:%M:%S) command asked to rewatch (rc=2)" >> /tmp/cal_watch.log
      streak=0
    else
      echo "$(date +%H:%M:%S) command exited rc=$rc" >> /tmp/cal_watch.log
      exit $rc
    fi
  fi
  sleep 420
done
