#!/usr/bin/env bash
# Run a graft main class directly on the compiled classes (no sbt lock):
#   scripts/run_main.sh graft.tools.ExplainAll [args...]
# Mirrors build.sbt's forked-JVM options (JDK17 add-opens, UTC, codegen
# cache). Compile first with `sbt compile`.
set -euo pipefail
cd "$(dirname "$0")/.."
OPENS=""
for p in java.base/java.lang java.base/java.lang.invoke \
  java.base/java.lang.reflect java.base/java.io java.base/java.net \
  java.base/java.nio java.base/java.util java.base/java.util.concurrent \
  java.base/java.util.concurrent.atomic java.base/sun.nio.ch \
  java.base/sun.nio.cs java.base/sun.security.action \
  java.base/sun.util.calendar; do
  OPENS="$OPENS --add-opens=$p=ALL-UNNAMED"
done
exec java $OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Dspark.sql.codegen.cache.maxEntries=2000 \
  -Xmx"${SPARK_DRIVER_MEM:-24g}" -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" "$@"
