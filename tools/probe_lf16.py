"""Probe: fused LF^16 vs LF^8 decode throughput on the real chip.

Builds the same 64 MiB block twice — once with the k=16 table (shipped
default for rate%16==0) and once with the k=8 table (the previous
default, forced here by pretending the rate is only 8-divisible) — and
times decode_text_jit through each.  Run via tools/tpu_batch.sh or
directly; prints ns/symbol and MB/s for both.
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, "/root/repo")
    from bench import _checksum, synth_dna, timeit
    from gecoz_tpu.ops import fmq
    from gecoz_tpu.ops.pipeline import index_block

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 26
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)
    data = synth_dna(n, seed=11)
    d = jax.device_put(jnp.asarray(data), dev)
    base = jax.jit(index_block)(d)

    decode_ck = jax.jit(lambda b: _checksum(fmq.decode_text_jit(b)))
    for label, k in (("k16", 16), ("k8", 8)):
        if k == 8:
            # force the k=8 branch: build the table under a pretend
            # rate of 8 (sf is static trace-time metadata), then restore
            # the real sf so the walk itself is identical (32 steps/walk)
            blk8 = jax.jit(lambda b: fmq.with_lf_table(b))(
                base._replace(sf=3))
            blk = blk8._replace(sf=base.sf)
            assert blk.lfk_k == 8, blk.lfk_k
        else:
            blk = jax.jit(lambda b: fmq.with_lf_table(b))(base)
            assert blk.lfk_k == 16, blk.lfk_k
        t0 = time.perf_counter()
        int(np.asarray(decode_ck(blk)))
        print(f"# {label} compile+run {time.perf_counter()-t0:.1f}s",
              file=sys.stderr)
        t = timeit(decode_ck, blk, repeat=3)
        print(f"{label}: {t*1e3:.1f} ms  {n/1e6/t:.1f} MB/s  "
              f"{t/n*1e9:.2f} ns/sym")
        out = np.asarray(fmq.decode_text_jit(blk))
        assert np.array_equal(out, data), f"{label} decode mismatch"
        del blk


if __name__ == "__main__":
    main()
