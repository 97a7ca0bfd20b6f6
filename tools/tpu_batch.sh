#!/bin/bash
# One relay-up window's worth of measurements, most-informative-first.
# Each step has its own timeout so a re-wedged relay doesn't eat the batch.
set -u
cd "$(dirname "$0")/.."
# NB append, don't overwrite: the existing PYTHONPATH carries the axon
# TPU plugin's sitecustomize
export PYTHONPATH="$PWD${PYTHONPATH:+:$PYTHONPATH}"
mkdir -p /tmp/tpu_meas
run() {
  name=$1; shift; tmo=$1; shift
  echo "=== $name ($(date +%H:%M:%S)) ==="
  timeout "$tmo" "$@" > "/tmp/tpu_meas/$name.log" 2>&1
  rc=$?
  tail -20 "/tmp/tpu_meas/$name.log"
  echo "=== $name rc=$rc ==="
}
run probe_nr22     900 python tools/probe_nr.py 22
run probe_sa       1200 python tools/probe_sa.py
run probe_search   1200 python tools/probe_search.py
run probe_nr26     900 python tools/probe_nr.py 26
run bench          2400 python bench.py
