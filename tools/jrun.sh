#!/usr/bin/env bash
# Run a graft main class directly on the compiled classpath — the exact
# JVM flags build.sbt's forked `run` uses, minus sbt itself. Lets plan
# capture / profiling runs proceed while sbt owns the project lock (e.g.
# during a test sweep); recompile with `sbt compile` before use after
# editing sources.
#
# Usage: tools/jrun.sh <mainClass> [args...]   (env passes through)
set -euo pipefail
cd "$(dirname "$0")/.."
CP_FILE=/tmp/graft_cp.txt
[ -f "$CP_FILE" ] || sbt -batch "export Runtime/fullClasspath" 2>/dev/null | tail -1 > "$CP_FILE"
ADD_OPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
for p in sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS="$ADD_OPENS --add-opens java.base/$p=ALL-UNNAMED"
done
exec java $ADD_OPENS \
  -Dspark.ui.enabled=false -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" -XX:ReservedCodeCacheSize=1g -XX:MaxNewSize=2g \
  ${GRAFT_EXTRA_JVM:-} \
  -cp "$(cat "$CP_FILE")" "$@"
