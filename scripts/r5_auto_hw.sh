#!/bin/bash
# Round-5 auto-runner: poll the axon tunnel; when it revives, run the
# hardware checklist ONE step at a time (single TPU process rule), each
# under its own timeout so one hang cannot sink the batch (P0's int8
# dot_general hung the remote compiler on 2026-08-19). Done-markers let
# the runner resume where it left off across tunnel outages.
#
# Usage: bash scripts/r5_auto_hw.sh        # loop until all steps done
#        bash scripts/r5_auto_hw.sh once   # single pass, no polling loop
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
LOG=hwlogs
mkdir -p "$LOG/done"

probe() {
  timeout 90 python -u -c "import jax; assert jax.devices()" >/dev/null 2>&1
}

run_step() { # name timeout_s cmd...
  local name=$1 to=$2
  shift 2
  [ -e "$LOG/done/$name" ] && return 0
  echo "== $name start $(date -u +%FT%TZ) ==" >> "$LOG/$name.log"
  timeout "$to" "$@" >> "$LOG/$name.log" 2>&1
  local rc=$?
  echo "== $name rc=$rc $(date -u +%FT%TZ) ==" >> "$LOG/$name.log"
  if [ $rc -eq 0 ]; then
    touch "$LOG/done/$name"
  else
    # a killed TPU client can wedge the tunnel: back off to the poll loop
    return 1
  fi
  return 0
}

pass() {
  # priority order: certified-path verdict first, headline artifact second
  run_step p3     1800 python -u scripts/r4_mfu_probe.py p3      || return 1
  run_step bench  6000 python -u bench.py                        || return 1
  run_step bisect 2400 python -u scripts/r5_build_bisect.py      || return 1
  run_step p1     2400 python -u scripts/r4_mfu_probe.py p1 p1b p2 || return 1
  run_step bloom  1200 python -u scripts/r4_bloom_delta.py       || return 1
  run_step p0      600 python -u scripts/r4_mfu_probe.py p0      || return 1
  return 0
}

alldone() {
  for s in p3 bench bisect p1 bloom p0; do
    [ -e "$LOG/done/$s" ] || return 1
  done
  return 0
}

if [ "${1:-}" = once ]; then
  probe && pass
  exit $?
fi

while :; do
  if alldone; then
    echo "auto_hw: all steps done $(date -u +%FT%TZ)" >> "$LOG/runner.log"
    exit 0
  fi
  if probe; then
    echo "auto_hw: tunnel alive, running pass $(date -u +%FT%TZ)" >> "$LOG/runner.log"
    pass || echo "auto_hw: pass interrupted $(date -u +%FT%TZ)" >> "$LOG/runner.log"
  else
    echo "auto_hw: tunnel down $(date -u +%FT%TZ)" >> "$LOG/runner.log"
  fi
  sleep 120
done
