"""Benchmark: single-chip FM-index pipeline throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "MB/s", "vs_baseline": N}

The reference (redmitry/gecoz) publishes no throughput numbers
(BASELINE.md), so `vs_baseline` is the ratio of the on-device pipeline to
the single-core host (numpy) implementation of the same algorithms — the
stand-in for the reference's single-threaded Java path.

Timing methodology: each measured step is a single jitted program whose
only fetched output is a scalar checksum folded over every result array,
so one host round-trip per measurement (dispatch latency is measured
separately and reported as `rtt_ms`).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def synth_dna(n: int, seed: int = 7) -> np.ndarray:
    rng = np.random.default_rng(seed)
    syms = np.frombuffer(b"ACGT", np.uint8)
    data = rng.choice(syms, size=n, p=[0.29, 0.21, 0.21, 0.29]).astype(np.uint8)
    data[: n // 200] = ord("N")
    cuts = np.sort(rng.choice(np.arange(1, n - 1), size=3, replace=False))
    data[cuts] = 0
    data[n - 1] = 0
    return data


def _checksum(tree):
    """Fold every array into one int32 scalar (forces full execution)."""
    import jax
    import jax.numpy as jnp
    acc = jnp.int32(0)
    for leaf in jax.tree_util.tree_leaves(tree):
        l = leaf.ravel()
        probe = l[:: max(1, l.shape[0] // 64)].astype(jnp.int32)
        acc = acc + jnp.sum(probe, dtype=jnp.int32)
    return acc


def timeit(fn, *args, repeat=3):
    best = float("inf")
    for _ in range(repeat):
        t0 = time.perf_counter()
        out = fn(*args)
        int(np.asarray(out))            # scalar fetch = full sync
        best = min(best, time.perf_counter() - t0)
    return best


def _probe_accelerator(timeout_s: int = 180, attempts: int = 6) -> bool:
    """True if the default JAX backend completes a trivial jit in time.

    The remote-TPU relay in some environments can wedge or need cool-down
    after a previous client; probe a few times before giving up (a dead
    backend would otherwise hang the whole benchmark)."""
    import subprocess
    code = ("import jax, jax.numpy as jnp;"
            "print(int(jax.jit(lambda a:(a*2).sum())(jnp.arange(8))))")
    for attempt in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               timeout=timeout_s, capture_output=True)
            if r.returncode == 0:
                return True
        except subprocess.TimeoutExpired:
            pass
        print(f"# accelerator probe {attempt + 1}/{attempts} failed",
              file=sys.stderr)
        # the relay wedges for minutes at a time and recovers; wait out a
        # typical wedge before conceding to the CPU fallback
        time.sleep(60)
    return False


def main() -> None:
    platform = "default"
    if not _probe_accelerator():
        print("# accelerator unresponsive; falling back to CPU backend",
              file=sys.stderr)
        import os
        os.environ["JAX_PLATFORMS"] = "cpu"
        platform = "cpu-fallback"
    import jax
    if platform == "cpu-fallback":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gecoz_tpu.ops.fmq import decode_text_jit, search_batch
    from gecoz_tpu.ops.pipeline import index_block

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 22   # 4 MiB
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    data = synth_dna(n)
    d = jax.device_put(jnp.asarray(data), dev)

    # dispatch-latency floor
    null = jax.jit(lambda x: jnp.sum(x[:8].astype(jnp.int32)))
    null(d)
    rtt = timeit(null, d, repeat=5)
    print(f"# rtt floor: {rtt*1e3:.1f} ms", file=sys.stderr)

    from gecoz_tpu.ops.pipeline import DNA_SYMBOLS
    from gecoz_tpu.ops.sa_device import (runs_ell_bits, runs_m_pad,
                                         runs_r1_keys, runs_token_table)

    def _index_ck_fn(arr):
        # host-precomputed accelerators: static run-count/run-length
        # bounds + traced run-key table (one compiled program per
        # (n, m_pad, ell_bits) — the table is a runtime operand, so it
        # does NOT fragment the compile cache)
        mp = runs_m_pad(arr)
        ebs = runs_ell_bits(arr)
        tab = runs_token_table(arr, DNA_SYMBOLS, ell_bits=ebs)
        rk = runs_r1_keys(tab)
        fn = jax.jit(lambda x, t: _checksum(index_block(
            x, m_pad=mp, tok_table=t, ell_bits=ebs, r1_keys=rk)))
        tdev = None if tab is None else jnp.asarray(tab)
        return lambda x: fn(x, tdev)

    index_ck = _index_ck_fn(data)
    t0 = time.perf_counter()
    int(np.asarray(index_ck(d)))
    print(f"# index compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t_index = timeit(index_ck, d)
    mbps_index = n / 1e6 / t_index
    print(f"# index: {t_index*1e3:.1f} ms -> {mbps_index:.1f} MB/s",
          file=sys.stderr)

    from gecoz_tpu.ops.fmq import with_kmer_table, with_lf_table
    block = jax.jit(lambda b: with_kmer_table(with_lf_table(b)))(
        index_block(d))
    decode_ck = jax.jit(lambda b: _checksum(decode_text_jit(b)))
    t0 = time.perf_counter()
    int(np.asarray(decode_ck(block)))
    print(f"# decode compile+run: {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    t_decode = timeit(decode_ck, block)
    mbps_decode = n / 1e6 / t_decode
    print(f"# decode: {t_decode*1e3:.1f} ms -> {mbps_decode:.1f} MB/s",
          file=sys.stderr)
    # correctness spot check through the full transfer once
    assert np.array_equal(np.asarray(decode_text_jit(block)), data), \
        "decode mismatch"

    # search at B = 1M queries (like locate) so the dispatch RTT is a
    # reported share, not ~55% of the number (VERDICT r4 #2); the
    # kernel-side rate (RTT subtracted) is reported alongside
    rng = np.random.default_rng(3)
    B, L = 1 << 20, 16
    starts = rng.integers(0, n - L, size=B)
    pats = data[starts[:, None] + np.arange(L)].astype(np.uint8)
    lens = np.full(B, L, np.int32)
    pats_d = jax.device_put(jnp.asarray(pats), dev)
    lens_d = jax.device_put(jnp.asarray(lens), dev)
    search_ck = jax.jit(
        lambda b, p, l: _checksum(search_batch(b, p, l)))
    int(np.asarray(search_ck(block, pats_d, lens_d)))
    t_search = timeit(search_ck, block, pats_d, lens_d)
    qps = B / t_search / 1e6
    search_rtt_pct = rtt / t_search * 100
    qps_kernel = B / max(t_search - rtt, 1e-9) / 1e6
    print(f"# search: {qps:.2f} Mqueries/s ({L}-mers, B={B}), "
          f"{t_search*1e3:.1f} ms/batch, rtt {search_rtt_pct:.1f}%, "
          f"kernel-side {qps_kernel:.2f} Mq/s", file=sys.stderr)

    # locate: SA values for 1M random hit rows.  Two engines: the fused-LF
    # walk (~rate 4-byte gathers per query; the round-3 path) and the
    # pointer-doubled locate table (ONE 8-byte gather per query)
    from gecoz_tpu.ops.fmq import locate_batch, with_locate_table
    Bl = 1 << 20
    lrows = rng.integers(0, n, size=Bl).astype(np.int32)
    lrows_d = jax.device_put(jnp.asarray(lrows), dev)
    locate_ck = jax.jit(lambda b, r: _checksum(locate_batch(b, r)))
    int(np.asarray(locate_ck(block, lrows_d)))
    t_lwalk = timeit(locate_ck, block, lrows_d)
    block_loc = jax.jit(with_locate_table)(block)
    int(np.asarray(locate_ck(block_loc, lrows_d)))
    t_ltab = timeit(locate_ck, block_loc, lrows_d)
    loc_qps, locw_qps = Bl / t_ltab / 1e6, Bl / t_lwalk / 1e6
    print(f"# locate: {loc_qps:.2f} Mlocates/s (table) vs "
          f"{locw_qps:.2f} (walk), {t_ltab*1e3:.1f} ms/batch",
          file=sys.stderr)
    del block_loc

    # hardware roofline context (VERDICT r4 #7): the SA kernel is a sort
    # cascade, so the honest "is it actually fast" yardstick is the
    # chip's own raw 2-operand UNSTABLE lax.sort rate at the same width
    # (the kernels sort unstable everywhere — stability costs XLA an
    # implicit index-tiebreaker operand, measured +50% at 64 Mi).  The
    # r5 census puts the 64 MiB index at ~8.4 such units — SA: compact
    # 1.0 + round-one 6-operand 0.75n-wide 2.1 + rerank 0.75 + nr
    # delivery 1.0 + final 3-operand 1.45, block build: mark partition +
    # plane packing ~2.1 (each k-operand n'-wide sort counted as
    # (1 + 0.45(k-2)) * n'/n units) — so
    # sort_roofline_pct = 100 * 8.4 / (t_index / t_raw_sort).
    CENSUS_SORTS = 8.4
    sort_extra = {}
    if platform != "cpu-fallback":
        try:
            sn = 1 << 26
            sk = jnp.asarray(rng.integers(0, 1 << 30, sn).astype(np.int32))
            sv = jnp.arange(sn, dtype=jnp.int32)
            raw_sort = jax.jit(lambda k, v: _checksum(
                jax.lax.sort((k, v), num_keys=1, is_stable=False)))
            int(np.asarray(raw_sort(sk, sv)))
            t_sort = timeit(raw_sort, sk, sv, repeat=2)
            sort_rate = sn / t_sort / 1e6
            print(f"# raw 2-op sort, 64 Mi: {t_sort*1e3:.0f} ms "
                  f"({sort_rate:.0f} Melem/s)", file=sys.stderr)
            sort_extra = {"sort64_ms": round(t_sort * 1e3, 1),
                          "sort64_Melem_s": round(sort_rate, 1)}
            del sk, sv
        except Exception as ex:        # noqa: BLE001 — context only
            print(f"# sort roofline skipped: {ex}", file=sys.stderr)

    # large-block point: same pipeline at a size where dispatch RTT is
    # negligible (<2% of the measure) — the scale the reference was built
    # for (chr1-class blocks).  Skipped on the CPU fallback (the device
    # pipeline's sort cascade is not the CPU algorithm of record).
    large_extra = {}
    ln = int(sys.argv[2]) if len(sys.argv) > 2 else 1 << 26   # 64 MiB
    if platform != "cpu-fallback" and ln > n:
        ldata = synth_dna(ln, seed=11)
        ld = jax.device_put(jnp.asarray(ldata), dev)
        lindex_ck = _index_ck_fn(ldata)
        t0 = time.perf_counter()
        int(np.asarray(lindex_ck(ld)))
        print(f"# large index compile+run: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        t_lindex = timeit(lindex_ck, ld, repeat=2)
        lmbps_index = ln / 1e6 / t_lindex
        print(f"# large index ({ln >> 20} MiB): {t_lindex*1e3:.0f} ms -> "
              f"{lmbps_index:.1f} MB/s (rtt {rtt / t_lindex * 100:.1f}%)",
              file=sys.stderr)
        if sort_extra:
            sa_units = t_lindex / (sort_extra["sort64_ms"] / 1e3)
            roofline = 100.0 * CENSUS_SORTS / sa_units
            print(f"# SA costs {sa_units:.1f} raw-sort units; "
                  f"sort roofline {roofline:.0f}%", file=sys.stderr)
            sort_extra["sa_in_sort_units"] = round(sa_units, 2)
            sort_extra["sort_roofline_pct"] = round(roofline, 1)
        lblock = jax.jit(lambda b: with_lf_table(b))(index_block(ld))
        t0 = time.perf_counter()
        int(np.asarray(decode_ck(lblock)))
        print(f"# large decode compile+run: {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        t_ldecode = timeit(decode_ck, lblock, repeat=2)
        lmbps_decode = ln / 1e6 / t_ldecode
        print(f"# large decode: {t_ldecode*1e3:.0f} ms -> "
              f"{lmbps_decode:.1f} MB/s", file=sys.stderr)
        assert np.array_equal(np.asarray(decode_text_jit(lblock)), ldata), \
            "large decode mismatch"
        lloc = jax.jit(with_locate_table)(lblock)
        llrows_d = jax.device_put(jnp.asarray(
            rng.integers(0, ln, size=Bl).astype(np.int32)), dev)
        int(np.asarray(locate_ck(lloc, llrows_d)))
        t_lloc = timeit(locate_ck, lloc, llrows_d, repeat=2)
        lloc_qps = Bl / t_lloc / 1e6
        print(f"# large locate: {lloc_qps:.2f} Mlocates/s", file=sys.stderr)
        large_extra = {
            "large_block_MiB": ln >> 20,
            "large_index_MBps": round(lmbps_index, 2),
            "large_decode_MBps": round(lmbps_decode, 2),
            "large_locate_Mqps": round(lloc_qps, 3),
            "large_rtt_pct": round(rtt / t_lindex * 100, 2),
        }
        del ld, lblock, lloc

    # chr1 point: the reference's design case (README.md:42-44 — blocks
    # are capped at the largest sequence, chr1 = 248 MB for hg38).  The
    # upload goes 2-bit packed (utils/xfer) so the relay is off the
    # timed path like every scale artifact; one repeat (the kernel is
    # ~8 s, flat from 64 MiB, SCALE_r4_device_sa.log).  GECOZ_BENCH_CHR1=0
    # skips (driver escape hatch); failures degrade to the 64 MiB series.
    chr1_extra = {}
    import os as _os
    cn = 248 << 20
    if platform != "cpu-fallback" and \
            _os.environ.get("GECOZ_BENCH_CHR1", "1") != "0":
        try:
            from gecoz_tpu.utils.hostmem import warm_for_block
            warm_for_block(cn * 2)
            cdata = synth_dna(cn, seed=13)
            from gecoz_tpu.utils import xfer
            t0 = time.perf_counter()
            cd = jax.block_until_ready(xfer.put_packed(cdata))
            print(f"# chr1 packed upload: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr)
            # at chr1 scale the FUSED index_block program exceeds HBM
            # (XLA holds SA-phase and block-build buffers concurrently:
            # ~25 GB peak vs ~16); two sequential programs each fit —
            # the wall-clock sum is the honest end-to-end index time
            from gecoz_tpu.ops.fmq import build_device_block_jit
            from gecoz_tpu.ops.sa_device import _suffix_array_runs_jit
            mp = runs_m_pad(cdata)
            ebs = runs_ell_bits(cdata)
            tab = runs_token_table(cdata, DNA_SYMBOLS, ell_bits=ebs)
            rk = runs_r1_keys(tab)
            if tab is None:
                raise RuntimeError("no run-key table at chr1 scale")
            tdev = jnp.asarray(tab)
            # AOT lower+compile: the implicit jit dispatch path tripped
            # the remote compile helper at this size; the explicit AOT
            # path compiles reliably and shares the persistent cache
            sa_fn = jax.jit(lambda x, t: _suffix_array_runs_jit(
                x, syms=DNA_SYMBOLS, m_pad=mp, tok_table=t, ell_bits=ebs,
                r1_keys=rk)).lower(
                jax.ShapeDtypeStruct((cn,), jnp.uint8),
                jax.ShapeDtypeStruct((tab.shape[0],), jnp.int32)).compile()
            blk_fn = jax.jit(lambda bwt, sa: _checksum(
                build_device_block_jit(bwt, sa, 5, DNA_SYMBOLS))).lower(
                jax.ShapeDtypeStruct((cn,), jnp.uint8),
                jax.ShapeDtypeStruct((cn,), jnp.int32)).compile()

            def chr1_run(x):
                sa, bwt = sa_fn(x, tdev)
                return blk_fn(bwt, sa)
            t0 = time.perf_counter()
            int(np.asarray(chr1_run(cd)))
            print(f"# chr1 index compile+run: "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            t_cindex = timeit(chr1_run, cd, repeat=1)
            cmbps = cn / 1e6 / t_cindex
            print(f"# chr1 index (248 MiB): {t_cindex*1e3:.0f} ms -> "
                  f"{cmbps:.1f} MB/s", file=sys.stderr)
            chr1_extra = {"chr1_index_MBps": round(cmbps, 2)}
            del cd, cdata
        except Exception as ex:        # noqa: BLE001 — chr1 is additive
            print(f"# chr1 point skipped: {type(ex).__name__}: {ex}",
                  file=sys.stderr)

    # host single-core baseline on a smaller slice
    from gecoz_tpu.index.hswt import HSWT
    from gecoz_tpu.index.shape import HSWTShape
    from gecoz_tpu.index.ssa import SampledSAIndex
    from gecoz_tpu.ops.sa import bwt_from_sa, suffix_array, suffix_array_numpy

    hn = min(n, 1 << 20)
    hdata = data[:hn].copy()
    hdata[-1] = 0
    t0 = time.perf_counter()
    sa = suffix_array_numpy(hdata)
    bwt = bwt_from_sa(hdata, sa)
    shape = HSWTShape.from_counts(np.bincount(hdata, minlength=256))
    HSWT.build(bwt, shape)
    SampledSAIndex.build(sa, 32)
    t_host = time.perf_counter() - t0
    host_mbps = hn / 1e6 / t_host
    print(f"# host baseline: {host_mbps:.2f} MB/s ({hn >> 20} MiB)",
          file=sys.stderr)

    # native tier (the repo's own C++ SA-IS) on the full block: the honest
    # single-core comparison point — `vs_native` is the chip's edge over
    # the best host implementation shipped in this repo.
    from gecoz_tpu.utils.hostmem import warm_for_block
    warm_for_block(n * 6)
    t0 = time.perf_counter()
    nsa = suffix_array(data, backend="native")
    nbwt = bwt_from_sa(data, nsa)
    nshape = HSWTShape.from_counts(np.bincount(data, minlength=256))
    HSWT.build(nbwt, nshape)
    SampledSAIndex.build(nsa, 32)
    t_native = time.perf_counter() - t0
    native_mbps = n / 1e6 / t_native
    print(f"# native tier: {native_mbps:.2f} MB/s ({n >> 20} MiB)",
          file=sys.stderr)
    del nsa, nbwt

    result = {
        "metric": "FM-index encode throughput, single chip "
                  f"({n >> 20} MiB DNA block: SA+BWT+query-state)",
        "value": round(mbps_index, 2),
        "unit": "MB/s",
        "vs_baseline": round(mbps_index / host_mbps, 2),
        "extra": {
            "decode_MBps": round(mbps_decode, 2),
            "search_Mqps_16mer": round(qps, 3),
            "search_B": B,
            "search_rtt_pct": round(search_rtt_pct, 1),
            "search_kernel_Mqps": round(qps_kernel, 3),
            "locate_Mqps": round(loc_qps, 3),
            "locate_walk_Mqps": round(locw_qps, 3),
            "host_single_core_MBps": round(host_mbps, 2),
            "native_tier_MBps": round(native_mbps, 2),
            "vs_native": round(mbps_index / native_mbps, 2),
            "rtt_ms": round(rtt * 1e3, 1),
            "device": str(dev),
            "platform": platform,
            **sort_extra,
            **large_extra,
            **chr1_extra,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
