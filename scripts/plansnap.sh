#!/usr/bin/env bash
# Regenerate the committed plan-shape snapshots — PLANSNAP.json (every
# query at sf0.001) and PLANSNAP_SF01.json (the top-30 heaviest at
# sf0.1) — see src/main/scala/graft/PlanSnap.scala for what they pin
# and why. Run after an INTENTIONAL plan change (new Spark, deliberate
# conf move, a query rewrite) when PlanSnapSpec reports drift; commit
# the one-line diff it produces.
# Usage: scripts/plansnap.sh                      # both artifacts
#        scripts/plansnap.sh sfDir out.json [ALL|BENCH30|q1,q2,...]
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
  graft.PlanSnap "$@"
