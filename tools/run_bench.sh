#!/bin/bash
# Plain-java launcher for graft bench mains (no sbt lock): replicates
# build.sbt's forked-run JVM flags (JDK17 add-opens, heap pretouch).
# Usage: tools/run_bench.sh <mainClass> [args...]
# Env: SPARK_DRIVER_MEM (default 48g), GRAFT_PRETOUCH=1, GRAFT_STAGESTATS
set -u
MAIN="$1"; shift
MEM="${SPARK_DRIVER_MEM:-48g}"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
PRETOUCH=""
if [ "${GRAFT_PRETOUCH:-}" = "1" ]; then PRETOUCH="-Xms$MEM -XX:+AlwaysPreTouch"; fi
exec java $ADD_OPENS -Xmx"$MEM" $PRETOUCH \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "${GRAFT_CLASSES:-/root/repo/target/scala-2.13/classes}:/opt/spark/jars/*" \
  "$MAIN" "$@"
