#!/usr/bin/env bash
# Spill/memory evidence runner (SCALE.md): graft.SpillProbe under a pinched
# unified memory pool, same JVM flags as scripts/bench.sh. Dev tooling only.
#
# Usage: scripts/spill_probe.sh          (run `sbt compile` first)
#   env: SPARK_GRAFT_MEM_FRACTION (default 0.05)
#        SPARK_GRAFT_CPUS (default 32), SPARK_DRIVER_MEM (default 8g)
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ]; then
  echo "error: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=("--add-opens=java.base/$p=ALL-UNNAMED")
done
java "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.SpillProbe
