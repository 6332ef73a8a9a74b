#!/bin/bash
# Fast runner: java with the compiled classes + Spark jars (skips sbt startup).
# Usage: scripts/run.sh <mainClass> [args...]
set -e
cd "$(dirname "$0")/.."
CP="target/scala-2.13/classes:target/scala-2.13/test-classes:/opt/spark/jars/*"
for j in $HOME/.cache/coursier/v1/https/repo1.maven.org/maven2/org/scalatest/*/*/*.jar \
         $HOME/.cache/coursier/v1/https/repo1.maven.org/maven2/org/scalactic/*/*/*.jar; do
  [ -e "$j" ] && CP="$CP:$j"
done
OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net java.nio \
         java.util java.util.concurrent java.util.concurrent.atomic; do
  OPENS="$OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
OPENS="$OPENS --add-opens java.base/sun.nio.ch=ALL-UNNAMED --add-opens java.base/sun.nio.cs=ALL-UNNAMED"
OPENS="$OPENS --add-opens java.base/sun.security.action=ALL-UNNAMED --add-opens java.base/sun.util.calendar=ALL-UNNAMED"
# Large code cache: 20+ sequential queries' generated classes otherwise
# exhaust the 240 MB default and the JIT stops compiling (see build.sbt).
# GRAFT_JAVA_OPTS: extra JVM flags (e.g. -Xlog:safepoint for stall diagnosis).
exec java $OPENS -Xmx${SPARK_DRIVER_MEM:-8g} \
  -XX:ReservedCodeCacheSize=1g -XX:+UseCodeCacheFlushing \
  ${GRAFT_JAVA_OPTS:-} \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -cp "$CP" "$@"
