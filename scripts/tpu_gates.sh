#!/usr/bin/env bash
# One-shot TPU validation: runs every TPU-only gate + the bench triplet.
# Use after any change to the compute path, or after a tunnel outage, to
# re-establish the full TPU evidence in one command:
#   nohup bash scripts/tpu_gates.sh > /tmp/tpu_gates.log 2>&1 &
# Each stage prints a BEGIN/END marker so a partial log shows where it died.
set -u
cd "$(dirname "$0")/.."

run() {
  echo "===== BEGIN $1"
  shift
  "$@"
  local rc=$?
  echo "===== END rc=$rc"
  if [ "$rc" -eq 124 ]; then
    # a timeout-killed TPU process can leave the NEXT compile hung for
    # minutes (CLAUDE.md) — give the tunnel a settle window before the
    # following stage so one slow stage doesn't cascade into false FAILs
    echo "===== stage timed out; letting the tunnel settle 20s"
    sleep 20
  fi
}

# Attach stall: the FIRST device sync of a fresh process can block up to
# ~15 min inside axon server recovery after a previous process's detach
# (CLAUDE.md) — the probe's generous timeout absorbs it so a stalled
# attach doesn't get timeout-killed (which would poison the tunnel for
# every later stage).
run "probe (absorbs attach stall)" timeout 1200 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); print('TPU OK', float((x@x).sum()))"

run "host-init equality gate" timeout 600 python scripts/check_host_init.py
run "attention-dropout gate" timeout 600 python scripts/check_attention_dropout.py
run "fused-train-kernel gate" timeout 600 python scripts/check_train_kernels.py
run "bench eval" timeout 600 python bench.py
run "bench train" timeout 600 python bench.py --train
run "bench sweep" timeout 600 python bench.py --sweep
