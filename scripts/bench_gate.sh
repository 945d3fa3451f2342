#!/usr/bin/env bash
# Spread-aware round-over-round bench gate: compares a bench artifact's
# per-query medians against the previous round's committed full artifact
# and emits ONE JSON verdict line on stdout.
#
# This promotes BASELINE.md's manual guard workflow ("suspect = >2x the
# previous round; re-test with median-of-5 before believing it") to a
# machine check. Two refinements over the raw 2x rule:
#   - spread-aware: a flagged regression must ALSO exceed the max of the
#     two rounds' observed max-min spreads plus a 0.3s fresh-JVM floor —
#     BASELINE.md documents 1.2-1.4s spreads producing false 2x flags on
#     0.2s queries (win_trailing7, date_seq, date_parse all tripped the
#     raw rule and re-tested clean).
#   - common-subset totals: the only fair round-over-round total is over
#     queries present in BOTH artifacts (suites grow every round).
#   - movers list (r15): queries at ratio >1.3x (but under the 2x suspect
#     bar) AND above the same spread/0.3s absolute-delta floor — the
#     round-open adjudication queue of BASELINE.md's mover protocol,
#     machine-computed so sub-floor wobble never becomes adjudication
#     debt. Movers do NOT flip the verdict.
#
# Exit code is ALWAYS 0: the verdict is advisory (flag-then-re-test), not
# a build blocker — a busy host must not fail CI. Consumers read .verdict.
#
# Usage: scripts/bench_gate.sh CUR.json [PREV.json]
#   PREV defaults to the highest-numbered BENCH_r*_full.json whose round
#   is lower than CUR's (or the highest of all if CUR is not round-named).
set -euo pipefail
cd "$(dirname "$0")/.."
python3 - "$1" "${2:-}" <<'PYEOF'
import json, sys, glob, re, os, subprocess

cur_path, prev_path = sys.argv[1], sys.argv[2] if len(sys.argv) > 2 else ""
cur = json.load(open(cur_path))

def round_of(p):
    m = re.search(r'r0*(\d+)', os.path.basename(p))
    return int(m.group(1)) if m else None

if not prev_path:
    cur_round = round_of(cur_path)
    cands = [(round_of(f), f) for f in glob.glob('BENCH_r[0-9]*_full.json')]
    cands = [(r, f) for r, f in cands
             if r is not None and (cur_round is None or r < cur_round)
             and os.path.abspath(f) != os.path.abspath(cur_path)]
    if not cands:
        print(json.dumps({"gate": "bench", "verdict": "no_prev",
                          "cur": cur_path}))
        sys.exit(0)
    prev_path = max(cands)[1]
prev = json.load(open(prev_path))

cq, pq = cur.get('queries', {}), prev.get('queries', {})
cs, ps = cur.get('spread', {}), prev.get('spread', {})
FLOOR = 0.3   # fresh-JVM JIT noise floor (sec) — see BASELINE.md
MIN_PREV = 0.05  # below this the timer is all noise

common = sorted(q for q in cq if q in pq
                and cq[q] is not None and pq[q] is not None)
# suspects flip the verdict (>2x); movers are the round-open adjudication
# queue (>1.3x) per BASELINE.md's mover protocol. BOTH apply the same
# absolute-delta floor: a ratio on a sub-0.3s query is timer noise (the
# r14 round closed with six "movers" of <=0.15s delta, all noise-band),
# so a query qualifies only when its delta ALSO exceeds the max of the
# two rounds' observed spreads and the 0.3s fresh-JVM floor.
suspects, movers = [], []
for q in common:
    c, p = cq[q], pq[q]
    if p <= MIN_PREV:
        continue
    band = max(cs.get(q, 0.0), ps.get(q, 0.0), FLOOR)
    if (c - p) <= band:
        continue
    row = {"q": q, "prev": p, "cur": c,
           "ratio": round(c / p, 2), "band": round(band, 3)}
    if c > 2.0 * p:
        suspects.append(row)
    elif c > 1.3 * p:
        movers.append(row)
suspects.sort(key=lambda s: -s["ratio"])
movers.sort(key=lambda s: -s["ratio"])

tot_c = sum(cq[q] for q in common)
tot_p = sum(pq[q] for q in common)
ratio = round(tot_c / tot_p, 3) if tot_p > 0 else None
verdict = "pass"
if suspects:
    verdict = "suspect"          # re-test each with median-of-5
elif ratio is not None and ratio > 1.15:
    verdict = "drift"            # broad host drift, no per-query culprit

# Coverage vs the DECLARED board (graft.Board): r11's clean bench covered
# 256 of 285 queries and this gate said "pass" — nothing compared the
# benched set against SparkEntry.queries. A bench of a stale board now
# stamps the artifact partial and the verdict says so. Requires compiled
# classes; when they're absent (CI checkout without a build) coverage is
# reported as unknown rather than silently skipped.
# GATE_NO_COVERAGE=1 skips the JVM coverage probe (a second Spark-free
# java process with a 120s timeout) — set by BenchGateSpec so the unit
# test of the classification rule stays hermetic and fast.
coverage = {"declared": None, "benched": len(cq), "missing_n": None}
if os.environ.get('GATE_NO_COVERAGE'):
    coverage = {"declared": None, "benched": len(cq),
                "missing_n": None, "skipped": True}
elif os.path.isdir('target/scala-2.13/classes'):
    try:
        bo = subprocess.run(
            ['java', '-cp', 'target/scala-2.13/classes:/opt/spark/jars/*',
             'graft.Board'], capture_output=True, text=True, timeout=120)
        # Parse ONLY between the BOARD_BEGIN/BOARD_END sentinels and
        # validate the query-name shape: raw JVM stdout can carry log4j
        # warnings whose tokens would otherwise become phantom declared
        # queries and flip the verdict to a spurious 'partial'.
        lines = bo.stdout.splitlines()
        inside, declared = False, []
        for ln in lines:
            t = ln.strip()
            if t == 'BOARD_BEGIN':
                inside = True
            elif t == 'BOARD_END':
                inside = False
            elif inside and re.fullmatch(r'[a-z0-9_]+', t):
                declared.append(t)
            elif inside and t:
                # A non-empty line INSIDE the sentinels that fails the
                # query-name shape is a board bug (e.g. a query named
                # with an uppercase letter or dash) — fail loudly
                # instead of silently dropping it from the declared set,
                # which would let its missing bench coverage pass.
                raise SystemExit(
                    f"bench_gate: malformed board entry {t!r} between "
                    "BOARD_BEGIN/BOARD_END — query names must match "
                    "[a-z0-9_]+")
        declared = sorted(declared)
        if bo.returncode == 0 and declared:
            missing = sorted(set(declared) - set(cq))
            coverage = {"declared": len(declared), "benched": len(cq),
                        "missing_n": len(missing), "missing": missing[:40]}
            if missing:
                verdict = "partial"
    except Exception:
        pass

print(json.dumps({
    "gate": "bench", "verdict": verdict,
    "cur": os.path.basename(cur_path), "prev": os.path.basename(prev_path),
    "n_common": len(common),
    "common_total_cur": round(tot_c, 2), "common_total_prev": round(tot_p, 2),
    "ratio": ratio,
    "coverage": coverage,
    "new_queries": sorted(set(cq) - set(pq)),
    "lost_queries": sorted(set(pq) - set(cq)),
    "suspects": suspects,
    "movers": movers,
}, separators=(',', ':')))
PYEOF
