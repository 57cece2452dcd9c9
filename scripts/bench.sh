#!/usr/bin/env bash
# Bare-JVM bench runner: zero sbt log decoration — the bench JSON is the
# only line this script emits on stdout (Spark logs go to stderr).
# Prereq: sbt -batch compile (classes under target/scala-2.13/classes).
# Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/bench.sh
set -euo pipefail
cd "$(dirname "$0")/.."

ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=(--add-opens "java.base/$p=ALL-UNNAMED")
done

exec java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Bench "$@"
