#!/bin/bash
# Replicates the round driver's sequence end-to-end:
#   1. Bench at sf0.1 (one JSON line) — FIRST, on an idle box, so round
#      artifacts stop mixing idle and contended numbers (r6 verdict: the
#      full suite before bench inflated totals ~25% via box contention)
#   2. entry smoke (sf0.001, rows>0)
#   3. Verify + DuckDB oracle replay at sf0.01 (the correctness gate)
# Exits non-zero on any failure.
set -e
cd /root/repo
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS="--add-opens=java.base/java.lang=ALL-UNNAMED --add-opens=java.base/java.lang.invoke=ALL-UNNAMED --add-opens=java.base/java.lang.reflect=ALL-UNNAMED --add-opens=java.base/java.io=ALL-UNNAMED --add-opens=java.base/java.net=ALL-UNNAMED --add-opens=java.base/java.nio=ALL-UNNAMED --add-opens=java.base/java.util=ALL-UNNAMED --add-opens=java.base/java.util.concurrent=ALL-UNNAMED --add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED --add-opens=java.base/sun.nio.ch=ALL-UNNAMED --add-opens=java.base/sun.nio.cs=ALL-UNNAMED --add-opens=java.base/sun.security.action=ALL-UNNAMED --add-opens=java.base/sun.util.calendar=ALL-UNNAMED"

sbt -batch compile | tail -1

echo "== 1/3 bench (sf0.1, idle box) =="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS=32 \
  java $ADD_OPENS -Xmx24g -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -cp "$CP" graft.Bench 2>/dev/null \
  > /tmp/graft_bench_stdout.txt
tail -1 /tmp/graft_bench_stdout.txt
# The driver tail-captures ~2.3 KB of stdout: assert the JSON line
# survives a 2 KB truncation intact (parseable, with the headline
# "value" field present). This is the gate that was parsed:null in
# rounds 1-6.
tail -c 2048 /tmp/graft_bench_stdout.txt > /tmp/graft_bench_tail.txt
# NOTE the tail goes through a FILE, not a pipe: `cmd | python3 - <<EOF`
# hands the heredoc to fd 0, so the program would read an EMPTY stdin
# and die on [-1] (observed r8: IndexError after a perfectly good line).
python3 - /tmp/graft_bench_tail.txt <<'EOF'
import json, sys
tail = open(sys.argv[1]).read()
line = [l for l in tail.splitlines() if l.strip()][-1]
d = json.loads(line)
assert "value" in d and d["value"] > 0, d
assert "slowest" in d and len(d["slowest"]) > 0, d
print(f"bench line parses after 2KB tail-truncation: value={d['value']}s n={d['n']}")
EOF

echo "== 2/3 entry smoke (sf0.001) =="
cat > /tmp/graft_smoke.scala <<'EOF'
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]").config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"entry rows: $n")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
EOF
scala -cp "$CP" $ADD_OPENS /tmp/graft_smoke.scala 2>/dev/null || \
  java $ADD_OPENS -Xmx4g -cp "$CP" graft.Explain flatten_courses > /dev/null

echo "== 3/3 correctness gate (sf0.01) =="
dev/check.sh /root/testdata/sf0.01 /tmp/dryrun_verify
echo "== dry run complete =="
