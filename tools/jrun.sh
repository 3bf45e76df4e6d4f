#!/bin/bash
# Direct-JVM runner for graft mains: identical JVM flags to build.sbt's
# forked `run`, but without the sbt project lock or startup cost. Used by
# the optimization round for plan captures and targeted probes so a
# long-running sbt task (test/verify) never serializes a quick probe.
# Usage: tools/jrun.sh <mainClass> [args...]
set -euo pipefail
CP="/root/repo/target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-48g}" \
  -XX:ReservedCodeCacheSize=1g \
  -cp "$CP" "$@"
