#!/usr/bin/env bash
# Decade correctness sweep: run the FULL oracle board at the stacked ~sf1
# decade (ScaleProbe's 10x key-offset stack) — the third scale the driver
# gate never sees. Dev tooling; r10 ran this and it caught a real latent
# bug (limit_n's non-unique LIMIT tiebreak) that sf0.001/sf0.01 masked by
# scan-order luck.
#
# Known by-design non-match: dedup_embed (over-cap LSH recall trade — the
# engine answers from sign-LSH sub-buckets at measured ~91.8% recall when
# label blocks exceed the exact cap, while the oracle replays exact
# blocked all-pairs; see TextSim's dedup_embed scaladoc). Expect
# 242/243-style results with exactly that row failing on ROWS.
#
# Usage: scripts/decade_check.sh          (run `sbt compile` first;
#   builds the stack on first use via ScaleProbe.buildStack through any
#   probe run, or reuses /tmp/graft_sf1ish)
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
SF1=${SPARK_GRAFT_SF1_DIR:-/tmp/graft_sf1ish}
OUT=${1:-/tmp/graft_decade_verify}
if [ ! -d "$CLASSES" ]; then
  echo "error: $CLASSES missing — run 'sbt compile' first" >&2; exit 1
fi
if [ ! -f "$SF1/_STACK_OK" ]; then
  echo "error: $SF1 missing — run a ScaleProbe subset once to build it" >&2
  exit 1
fi
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=("--add-opens=java.base/$p=ALL-UNNAMED")
done
rm -rf "$OUT"
java "${ADD_OPENS[@]}" -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC -Xmx"${SPARK_DRIVER_MEM:-24g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Verify "$SF1" "$OUT" 2>&1 | grep '\[verify\]' || true
python3 scripts/check_oracle.py "$SF1" "$OUT"
