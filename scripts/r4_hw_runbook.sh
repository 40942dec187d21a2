#!/bin/bash
# Round-4 hardware runbook: everything queued behind the axon tunnel outage,
# in priority order. Run ONE at a time (single TPU process rule).
# Usage: bash scripts/r4_hw_runbook.sh [step]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/.axon_site
STEP="${1:-all}"

probe() {
  timeout 90 python -u -c "import jax; print('devices:', jax.devices())" \
    || { echo "tunnel still down"; exit 1; }
}

case "$STEP" in
  probe) probe ;;
  fuzz|all)
    probe
    echo "== differential fuzz (kernel vs XLA panel, quick) =="
    timeout 1800 python -u scripts/tpu_differential_fuzz.py || exit 1
    [ "$STEP" = fuzz ] && exit 0 ;;&
  mfu|all)
    echo "== MFU probes (P0 int8 rate, P1 phase split, P2 tiles, P3 cert) =="
    timeout 3600 python -u scripts/r4_mfu_probe.py || exit 1
    [ "$STEP" = mfu ] && exit 0 ;;&
  bench|all)
    echo "== full bench (records certificate + dispersion) =="
    timeout 6000 python -u bench.py || exit 1
    ;;
esac
echo "runbook done"
