#!/usr/bin/env bash
# Decade correctness sweep: run the FULL oracle board at the stacked ~sf1
# decade (ScaleProbe's 10x key-offset stack) — the third scale the driver
# gate never sees. Dev tooling; r10 ran this and it caught a real latent
# bug (limit_n's non-unique LIMIT tiebreak) that sf0.001/sf0.01 masked by
# scan-order luck.
#
# r11: dedup_embed's over-cap LSH path is now part of the declared
# cross-engine contract (the oracle mirrors the sign-LSH sub-bucketing
# from the same plane literals), so the full board is expected GREEN at
# the decade — 243/243-style. A machine artifact in the CORRECTNESS_rN
# shape is written per run (default DECADE.json in the repo root; set
# DECADE_JSON to place it, e.g. DECADE_JSON=DECADE_r11.json).
#
# Usage: scripts/decade_check.sh [outdir]  (run `sbt compile` first;
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
python3 scripts/check_oracle.py "$SF1" "$OUT" --json "${DECADE_JSON:-DECADE.json}"
# Coverage gate (r11 gap: DECADE_r11.json covered 273 of 285 queries
# because the sweep ran before the round's last additions — nothing
# compared the swept set to the declared board). Fail loudly when the
# artifact's query set ≠ graft.Board's, so a stale sweep can't ship.
python3 - "${DECADE_JSON:-DECADE.json}" <<'PYEOF'
import json, re, subprocess, sys
art = json.load(open(sys.argv[1]))
swept = set(art.get("queries", {}))
bo = subprocess.run(
    ['java', '-cp', 'target/scala-2.13/classes:/opt/spark/jars/*',
     'graft.Board'], capture_output=True, text=True, timeout=120)
# Parse ONLY between the BOARD_BEGIN/BOARD_END sentinels and validate the
# query-name shape — stray log4j/JDK stdout tokens must not become
# phantom declared queries that hard-fail the decade gate.
declared, inside = set(), False
for ln in bo.stdout.splitlines():
    t = ln.strip()
    if t == 'BOARD_BEGIN':
        inside = True
    elif t == 'BOARD_END':
        inside = False
    elif inside and re.fullmatch(r'[a-z0-9_]+', t):
        declared.add(t)
    elif inside and t:
        # A non-empty line inside the sentinels that fails the shape check
        # is a board bug — fail loudly, don't silently shrink the declared
        # set (same contract as scripts/bench_gate.sh).
        sys.exit(f"decade_check: malformed board entry {t!r} between "
                 "BOARD_BEGIN/BOARD_END — query names must match [a-z0-9_]+")
missing = sorted(declared - swept)
if bo.returncode != 0 or not declared:
    print("decade coverage: graft.Board failed — cannot verify coverage")
    sys.exit(1)
if missing:
    print(f"decade coverage: PARTIAL — {len(missing)} declared queries "
          f"missing from the sweep: {missing}")
    sys.exit(1)
print(f"decade coverage: full board ({len(declared)} queries)")
PYEOF
