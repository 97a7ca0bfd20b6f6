#!/bin/bash
# Round-4 measurement queue, most-informative-first.  Each step waits for
# the relay to answer a trivial jit (the relay wedges for minutes at a
# time), then runs under its own timeout so a re-wedge doesn't eat the
# batch.
set -u
cd "$(dirname "$0")/.."
# NB append, don't overwrite: the existing PYTHONPATH carries the axon
# TPU plugin's sitecustomize
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/tpu_meas

wait_relay() {
  for i in $(seq 1 60); do
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
  tail -30 "/tmp/tpu_meas/$name.log" | grep -v WARNING
  echo "=== $name rc=$rc ==="
}

run sa64      2400 python tools/probe_sa64.py
run bench_r4  3000 python bench.py
run pallas    1200 python tools/probe_pallas.py
run hg38_dev  5400 python -m gecoz_tpu.tools.validate_scale --profile hg38 \
                   --backend device --out /tmp/gcz_scale_r4dev
