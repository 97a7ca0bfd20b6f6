#!/bin/bash
# Third relay-window batch: measure the token re-densify + p<=5 packing
# (commit 8087c22) on the real chip — bench (4 + 64 MiB points) and the
# standalone runs-SA at 64/128/248 MB for comparison with
# artifacts/SCALE_r3_device_sa.log.
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

run bench6    2400 python bench.py
run sa_scale6 3600 python tools/probe_scale.py --run 64 128
