"""Probe: backward-search gather-locality experiments (VERDICT r1 #7).

The lockstep search loop is HBM-latency-bound: each step does two
plane-pair gathers at data-dependent addresses (GSSA.java:187-197 does the
same 2|P| occ calls one query at a time).  Hypothesis from ROADMAP: sorting
the live query set by sp between steps makes the gather addresses monotone,
letting the memory system coalesce nearby lines.

Variants measured here on a 4 MiB DNA block, 64k 16-mers:
  A  search_batch as shipped (k-mer seeded, unsorted gathers)
  B  sp-sorted each step: (sp, qid, ep) re-sorted before the occ gathers;
     pattern column fetched via a [L,B] transposed table; results
     unpermuted once at the end
  C  B but sorting every other step (halve the sort overhead)

Run on the real chip:  python tools/probe_search.py [n] [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main() -> None:
    import jax
    import jax.numpy as jnp

    from bench import synth_dna, timeit, _checksum
    from gecoz_tpu.ops.fmq import (occ_inclusive, search_batch,
                                   with_kmer_table, with_lf_table)
    from gecoz_tpu.ops.pipeline import index_block
    from gecoz_tpu.ops.sa_device import apply_perm

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    L = 16
    dev = jax.devices()[0]
    print(f"# device: {dev}  n={n>>20}MiB B={B}", file=sys.stderr)

    data = synth_dna(n)
    d = jax.device_put(jnp.asarray(data), dev)
    block = jax.jit(lambda s: with_kmer_table(with_lf_table(index_block(s))))(d)
    block = jax.block_until_ready(block)

    rng = np.random.default_rng(3)
    starts = rng.integers(0, n - L, size=B)
    pats = np.stack([data[s:s + L] for s in starts]).astype(np.uint8)
    lens = np.full(B, L, np.int32)
    pats_d = jax.device_put(jnp.asarray(pats), dev)
    lens_d = jax.device_put(jnp.asarray(lens), dev)

    def seeded(block, patterns, lengths):
        """Replicate search_batch's k-mer seeding; return sp0, ep0, start_col."""
        Bq, Lq = patterns.shape
        bits, k = block.kmer_bits, min(block.kmer_k, Lq)
        from gecoz_tpu.ops.fmq import _kmer_offset
        code = jnp.zeros((Bq,), jnp.int32)
        bad = jnp.zeros((Bq,), jnp.bool_)
        for t in range(k):
            row = block.sym_plane[patterns[:, Lq - 1 - t].astype(jnp.int32)]
            code = code | (jnp.maximum(row, 0) << (bits * t))
            bad = bad | ((row < 0) & (t < lengths))
        j = jnp.clip(lengths, 1, k)
        code = code & ((1 << (bits * j)) - 1)
        offs = jnp.asarray(
            np.array([_kmer_offset(bits, int(jj)) for jj in range(k + 2)],
                     dtype=np.int32))
        seed = block.kmer_tab[offs[j] + code]
        sp0 = jnp.where(bad, 1, seed[:, 0])
        ep0 = jnp.where(bad, 0, seed[:, 1])
        return sp0, ep0, Lq - k

    def search_sorted(block, patterns, lengths, every: int = 1):
        Bq, Lq = patterns.shape
        sp, ep, start_col = seeded(block, patterns, lengths)
        qid = jnp.arange(Bq, dtype=jnp.int32)
        patT = patterns.T                       # [L, B] column store
        lns = lengths

        def body(i, state):
            sp, ep, qid, lns = state
            col = start_col - 1 - i
            ch = patT[col][qid].astype(jnp.int32)
            active = (col >= Lq - lns) & (sp <= ep)
            nsp = block.c[ch] + occ_inclusive(block, ch, sp - 1)
            nep = block.c[ch] + occ_inclusive(block, ch, ep) - 1
            sp = jnp.where(active, nsp, sp)
            ep = jnp.where(active, nep, ep)
            do_sort = (i % every) == (every - 1) if every > 1 else True
            if do_sort is True:
                sp, qid, ep, lns = jax.lax.sort(
                    (sp, qid, ep, lns), num_keys=2)
            else:
                sp, qid, ep, lns = jax.lax.cond(
                    do_sort,
                    lambda t: jax.lax.sort(t, num_keys=2),
                    lambda t: t, (sp, qid, ep, lns))
            return sp, ep, qid, lns

        sp, ep, qid, _ = jax.lax.fori_loop(
            0, start_col, body, (sp, ep, qid, lns))
        sp, ep = apply_perm(qid, sp, ep)
        return sp, ep

    ref = jax.jit(lambda b, p, l: _checksum(search_batch(b, p, l)))
    va = jax.jit(lambda b, p, l: _checksum(search_sorted(b, p, l, 1)))
    vc = jax.jit(lambda b, p, l: _checksum(search_sorted(b, p, l, 2)))

    # correctness first
    got_a = jax.jit(search_batch)(block, pats_d, lens_d)
    got_b = jax.jit(lambda b, p, l: search_sorted(b, p, l, 1))(
        block, pats_d, lens_d)
    assert np.array_equal(np.asarray(got_a[0]), np.asarray(got_b[0]))
    assert np.array_equal(np.asarray(got_a[1]), np.asarray(got_b[1]))
    print("# sorted variant bit-exact vs shipped", file=sys.stderr)

    for name, fn in [("A shipped", ref), ("B sort-every-step", va),
                     ("C sort-every-2", vc)]:
        t0 = time.perf_counter()
        int(np.asarray(fn(block, pats_d, lens_d)))
        compile_s = time.perf_counter() - t0
        t = timeit(fn, block, pats_d, lens_d, repeat=5)
        print(f"{name}: {t*1e3:7.2f} ms/batch  {B/t/1e6:6.2f} Mq/s  "
              f"(compile {compile_s:.1f}s)")


if __name__ == "__main__":
    main()
