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
      # per-level fire gate: the post-hoc clean gates are self-load-aware
      # (in-run <= 2.5x at c2 / 4x at c8 / 8x at c32), so during a mild
      # sustained phase (ambient 2-3x) the high levels can still land
      # CLEAN shots that a flat 1.3 trigger would starve; the merge keeps
      # only the cleanest/fastest sample either way.
      case "$c" in
        2)  gate=1.6 ;;   # mild phases (1.3-1.6) starve a 1.3 trigger;
            # a 1.45-fired c2 shot graded clean in-run (1.86, r4).
            # 1.6 is the headroom ceiling: the post-hoc c2 in-run gate
            # is 2.5x and self-load reads ~1.3-1.9x on top of ambient,
            # so shots fired above ~1.6 ambient grade dirty with
            # certainty — a higher trigger only burns windows.
        8)  gate=2.0 ;;
        *)  gate=3.0 ;;
      esac
      nohup python "$REPO/bench.py" --stage camp --cores "$c" \
        --synth "$SYNTH" --budget "$budget" --full --gate "$gate" \
        >> "/tmp/camp2_$(basename "$SYNTH")_c${c}_full.log" 2>&1 &
      sleep 5
    fi
  done
  sleep 60
done
