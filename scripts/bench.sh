#!/usr/bin/env bash
# Machine-parseable bench runner: stdout is EXACTLY one JSON line.
# (The driver's BENCH gate scraped the sbt tail and recorded "parsed": null
# in r1/r2 — sbt wraps every line in [info] noise. This runner launches the
# compiled classes directly and prints only the JSON artifact.)
#
# Usage: scripts/bench.sh            (run `sbt compile` first)
#   env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
#        SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_BENCH_RUNS (default 3)
set -euo pipefail
cd "$(dirname "$0")/.."
CLASSES=target/scala-2.13/classes
if [ ! -d "$CLASSES" ]; then
  echo "error: $CLASSES missing — run 'sbt compile' first" >&2
  exit 1
fi
OUT=$(mktemp)
trap 'rm -f "$OUT"' EXIT
# Same JVM flags as build.sbt's forked run (Spark 4.x on JDK 17 outside
# spark-submit needs the add-opens set).
ADD_OPENS=()
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADD_OPENS+=("--add-opens=java.base/$p=ALL-UNNAMED")
done
# Bench-hygiene guard (r7 verdict task 2): a busy host inflates medians
# ~20% (r7 measured dq_profile at 9.5s vs 1.9s clean), so capture the
# 1-minute load average BEFORE the timed runs and stamp the artifact
# contaminated when the host wasn't quiet at launch.
LOAD1=$(cut -d' ' -f1 /proc/loadavg)
SPARK_GRAFT_BENCH_OUT="$OUT" java \
  "${ADD_OPENS[@]}" \
  -Dspark.ui.enabled=false \
  -Dspark.sql.session.timeZone=UTC \
  -Xmx"${SPARK_DRIVER_MEM:-8g}" \
  -cp "$CLASSES:/opt/spark/jars/*" \
  graft.Bench 1>&2
# Durability (r6 verdict task 1): the driver's BENCH_r{N}.json keeps only a
# tail window of the ~5.5 KB line, which in r5/r6 landed inside the
# `spread` map — per-query MEDIANS survived only by luck in /tmp. Persist
# the full machine line into the repo as BENCH_r{N}_full.json, with N
# inferred as (highest existing driver BENCH_r*.json) + 1 = the round in
# progress. Skipped for dev-subset runs so partial timings never
# masquerade as a round artifact.
if [ -z "${SPARK_GRAFT_BENCH_ONLY:-}" ]; then
  last=$(ls BENCH_r[0-9]*.json 2>/dev/null \
    | sed -nE 's/^BENCH_r0*([0-9]+)\.json$/\1/p' | sort -n | tail -1)
  round=$(( ${last:-0} + 1 ))
else
  round=0
fi
# Append the guard fields to the artifact JSON (at the END of the object,
# so the driver's tail-window scrape keeps them): loadavg at launch, a
# contaminated flag (load1 > 4 on this 32-core host means something else
# was running), and a `suspect` list of queries whose median regressed
# >2x vs the previous round's committed full artifact — re-test those
# with median-of-5 before believing them (host noise, not code, is the
# usual culprit: BASELINE.md "Bench noise").
python3 - "$OUT" "$LOAD1" "$round" <<'PYEOF'
import json, sys, glob, re, subprocess
out, load1, rnd = sys.argv[1], float(sys.argv[2]), int(sys.argv[3])
d = json.load(open(out))
prev, prev_name = None, None
fulls = glob.glob('BENCH_r[0-9]*_full.json')
cand = [f for f in fulls
        if int(re.search(r'r0*(\d+)', f).group(1)) < rnd or rnd == 0]
if cand:
    # numeric max (lexicographic [-1] breaks at r100)
    prev_name = max(cand, key=lambda f: int(re.search(r'r0*(\d+)', f).group(1)))
    prev = json.load(open(prev_name)).get('queries', {})
d['loadavg_before'] = load1
d['contaminated'] = load1 > 4.0
if prev:
    d['suspect_vs'] = prev_name
    d['suspect'] = sorted(
        q for q, t in d.get('queries', {}).items()
        if q in prev and prev[q] > 0.05 and t > 2.0 * prev[q])
    # embed the spread-aware gate verdict (scripts/bench_gate.sh) so each
    # round's artifact carries its own round-over-round comparison. ONE
    # prev-resolution (above) feeds both the legacy suspect field and the
    # gate; the verdict travels via subprocess stdout, not a shell splice.
    try:
        gate_out = subprocess.run(
            ['scripts/bench_gate.sh', out, prev_name],
            capture_output=True, text=True, timeout=120)
        d['gate'] = json.loads(gate_out.stdout.strip().splitlines()[-1])
    except Exception:
        d['gate'] = {"gate": "bench", "verdict": "gate_error"}
json.dump(d, open(out, 'w'), separators=(',', ':'))
PYEOF
# Guard BOTH ways before publishing the round artifact: a subset run
# (BENCH_ONLY set) must not overwrite it, and neither must a degenerate
# run — BENCH_ONLY set-but-EMPTY selects zero queries and once clobbered
# the artifact with a 0-query result.
NQ=$(python3 -c "import json,sys; print(len(json.load(open(sys.argv[1])).get('queries',{})))" "$OUT")
if [ -z "${SPARK_GRAFT_BENCH_ONLY:-}" ] && [ "$NQ" -gt 0 ]; then
  cp "$OUT" "$(printf 'BENCH_r%02d_full.json' "$round")"
fi
cat "$OUT"
