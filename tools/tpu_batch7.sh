#!/bin/bash
# Round-3b measurement batch: LF^16 decode + full bench refresh.
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

run lf16        1800 python tools/probe_lf16.py
run bench7      2400 python bench.py
