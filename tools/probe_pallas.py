"""Probe: Pallas LF-walk kernel feasibility on the real chip.

Decode/locate walks are chains of data-dependent table lookups
(GSSA.java:241-251); the XLA path pays one HBM-latency gather per fused
step.  A Pallas kernel can beat that ONLY for tables resident in VMEM
(random access to HBM inside a kernel means per-element DMA).  The gating
unknown is whether Mosaic lowers a *vectorized dynamic gather from a VMEM
ref*; this probe answers that, then times the candidate kernel.

Steps (each survives the others failing):
  1  tiny vector gather from VMEM: jnp.take / ref[idx] spellings
  2  fused 32-step LF-walk kernel on a 2 MiB block, vs the XLA lfk path
  3  XLA gather with random vs sorted indices at 32Mi rows (does index
     locality help the TPU gather unit at all?)

Run on the real chip:  python tools/probe_pallas.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def step1_vmem_gather():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T, B = 2048, 512
    tab = jnp.arange(T, dtype=jnp.int32) * 3
    idx = jnp.asarray(np.random.default_rng(0).integers(0, T, B), jnp.int32)
    want = np.asarray(tab)[np.asarray(idx)]

    def k_take(tab_ref, idx_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:], axis=0)

    def k_bracket(tab_ref, idx_ref, out_ref):
        out_ref[:] = tab_ref[idx_ref[:]]

    for name, kern in [("jnp.take", k_take), ("ref[idx]", k_bracket)]:
        try:
            out = pl.pallas_call(
                kern,
                out_shape=jax.ShapeDtypeStruct((B,), jnp.int32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                          pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            )(tab, idx)
            ok = np.array_equal(np.asarray(out), want)
            print(f"step1 {name}: compiled, correct={ok}")
        except Exception as ex:   # noqa: BLE001
            print(f"step1 {name}: FAILED {type(ex).__name__}: "
                  f"{str(ex).splitlines()[0][:200]}")


def step2_lf_walk_kernel():
    import jax
    import jax.numpy as jnp
    from bench import synth_dna, timeit, _checksum
    from gecoz_tpu.ops.fmq import decode_text_jit, with_lf_table
    from gecoz_tpu.ops.pipeline import index_block

    n = 2 << 20
    data = synth_dna(n)
    block = jax.jit(lambda s: with_lf_table(index_block(s)))(
        jnp.asarray(data))
    block = jax.block_until_ready(block)

    # XLA baseline (fused lfk table)
    ck = jax.jit(lambda b: _checksum(decode_text_jit(b)))
    int(np.asarray(ck(block)))
    t_xla = timeit(ck, block)
    print(f"step2 XLA decode {n >> 20}MiB: {t_xla * 1e3:.1f} ms "
          f"({n / 1e6 / t_xla:.0f} MB/s)")

    # The Pallas LF-walk kernel was deleted in round 4: Mosaic cannot
    # lower the 1D walk gather ("Only 2D gather is supported"), so the
    # kernel never ran on-chip (see artifacts/PROBE_r4_pallas.log for the
    # final on-device probe).  The XLA fused-LF^k number above is the
    # production decode path.
    print("step2 Pallas decode: kernel removed in r4 (Mosaic rejects the "
          "1D walk gather); XLA fused-LF^k is the production path")


def step3_sorted_gather():
    import jax
    import jax.numpy as jnp
    from bench import timeit

    n, B = 1 << 25, 1 << 21
    rng = np.random.default_rng(1)
    tab = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32))
    ridx = rng.integers(0, n, B).astype(np.int32)
    sidx = np.sort(ridx)
    for name, idx in [("random", ridx), ("sorted", sidx)]:
        d = jnp.asarray(idx)
        f = jax.jit(lambda t, i: jnp.sum(t[i].astype(jnp.int32)))
        int(np.asarray(f(tab, d)))
        t = timeit(f, tab, d)
        print(f"step3 gather {B >> 20}Mi of {n >> 20}Mi rows, {name}: "
              f"{t * 1e3:.2f} ms ({t / B * 1e9:.1f} ns/elem)")


def main():
    import jax
    print(f"# device: {jax.devices()[0]}")
    for step in (step1_vmem_gather, step2_lf_walk_kernel,
                 step3_sorted_gather):
        t0 = time.time()
        try:
            step()
        except Exception as ex:   # noqa: BLE001
            print(f"{step.__name__} crashed: {type(ex).__name__}: {ex}")
        print(f"# {step.__name__}: {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main()
