#!/bin/bash
# Keep full-run camps alive until every requested level has a CLEAN
# banked full-pipeline sample for the current workload hash (camps exit
# immediately when their level is already clean). Camps coordinate
# through BENCH/.camp.lock, so concurrent levels never fire together.
#
# Usage: camp_babysit.sh [SYNTH_DIR] [TOTAL_BUDGET_S] [LEVELS...]
set -u
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SYNTH="${1:-$REPO/.synth/sf3}"
TOTAL="${2:-14400}"
# shift only what was actually passed: `shift 2` with one arg fails and
# leaves $1 in $@, which then leaks into LEVELS as a bogus core count
shift $(( $# < 2 ? $# : 2 ))
LEVELS=("${@:-}")
[ -z "${LEVELS[0]:-}" ] && LEVELS=(8 2 32)
T0=$(date +%s)
while [ $(( $(date +%s) - T0 )) -lt "$TOTAL" ]; do
  for c in "${LEVELS[@]}"; do
    log="/tmp/camp2_$(basename "$SYNTH")_c${c}_full.log"
    # stop respawning once the level reports clean
    grep -aq "already clean\|exit clean=True" "$log" 2>/dev/null && continue
    if ! pgrep -f "stage camp --cores $c --synth $SYNTH" >/dev/null; then
      left=$(( TOTAL - ($(date +%s) - T0) ))
      [ "$left" -le 120 ] && break 2
      budget=$(( left < 3000 ? left : 3000 ))
      # no --gate: bench.py defaults to fire_gate(cores), the single
      # per-level source for the trigger (ADVICE r4: the values were
      # hand-mirrored here and drifted risk); the post-hoc self-load-
      # aware clean gates, not the trigger, do the grading.
      nohup python "$REPO/bench.py" --stage camp --cores "$c" \
        --synth "$SYNTH" --budget "$budget" --full \
        >> "/tmp/camp2_$(basename "$SYNTH")_c${c}_full.log" 2>&1 &
      sleep 5
    fi
  done
  sleep 60
done
