#!/bin/bash
# Second relay-window batch: validate the streaming-scan kernels on-chip,
# re-time the 248 MB run with the fixed (scalar-fetch) timing, and measure
# the scan kernels' effect on the bench.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/tpu_meas

wait_relay() {
  for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(int(jax.jit(lambda a:(a*2).sum())(jnp.arange(8))))" >/dev/null 2>&1; then
      return 0
    fi
    echo "  relay down (try $i), sleeping 60s"
    sleep 60
  done
  return 1
}

run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  wait_relay || { echo "=== $name SKIPPED (relay dead) ==="; return; }
  timeout "$tmo" "$@" > "/tmp/tpu_meas/$name.log" 2>&1
  rc=$?
  tail -25 "/tmp/tpu_meas/$name.log" | grep -v WARNING
  echo "=== $name rc=$rc ==="
}



run bench4       2400 python bench.py
run validate_dev2 7200 env GECOZ_ACCEL=1 python -m gecoz_tpu.tools.validate_scale --profile hg38 --mb 248 --backend device -t 2 --out /tmp/gcz_scale_dev2
