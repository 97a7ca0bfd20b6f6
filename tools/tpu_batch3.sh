#!/bin/bash
# Third relay-window batch: the complete device-tier chr1-scale proof —
# hg38-profile (248 MB chr1 block) fa -> .gcz/.gcx -> fa bit-exact through
# the production drivers with --backend device, plus count/range/--check.
set -u
cd "$(dirname "$0")/.."
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

run validate_device 7200 env GECOZ_ACCEL=1 python -m gecoz_tpu.tools.validate_scale \
  --profile hg38 --mb 248 --backend device -t 2 --out /tmp/gcz_scale_dev
