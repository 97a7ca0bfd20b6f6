#!/bin/bash
# One relay-up window's worth of measurements, most-informative-first.
# Each step waits for the relay to answer a trivial jit (the relay wedges
# for minutes at a time), then runs under its own timeout so a re-wedge
# doesn't eat the batch.
set -u
cd "$(dirname "$0")/.."
# NB append, don't overwrite: the existing PYTHONPATH carries the axon
# TPU plugin's sitecustomize
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

run gather2d    900  python tools/probe_gather2d.py
run scale_cmp   2400 python tools/probe_scale.py 64 128 248
run bench       2400 python bench.py
run scale_run   3000 python tools/probe_scale.py --run 128 248
run search      1500 python tools/probe_search.py
run sa_break    1500 python tools/probe_sa.py
