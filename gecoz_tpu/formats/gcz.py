"""`.gcz` / `.gcx` container format: block headers, writer, reader.

Byte-compatible with the reference container (nova-formats gecoz/):

* GecozRefBlockHeader.java:39-137 — "GecozBWT", version 1, size u64 LE,
  len u64 LE, ``\\0``-separated header list, double-``\\0`` terminated.
* GecozSSABlockHeader.java:38-79 — "GecozSSA", version 1, len u64 LE,
  headers-hash u64 LE; fixed 25 bytes.
* GecozFileWriter.java:61-310 — per block: [ref header | RFC1951 lengths
  table (byte aligned) | HSWT nodes pre-order]; `.gcx`: [ssa header | rank
  vector | index wavelet tree].
* GecozFileReader.java:58-200 — chained header scan; sampling factor
  re-derived from total `.gcx` size (140-149).
"""

from __future__ import annotations

import struct
import threading
from dataclasses import dataclass
from pathlib import Path

import numpy as np

from gecoz_tpu.index.fm import FMIndex
from gecoz_tpu.index.hswt import HSWT
from gecoz_tpu.index.shape import HSWTShape
from gecoz_tpu.index.ssa import SampledSAIndex, index_size
from gecoz_tpu.ops.sa import bwt_from_sa, suffix_array

REF_MAGIC = b"GecozBWT"
SSA_MAGIC = b"GecozSSA"
VERSION = 1
SSA_HEADER_LEN = 25
DEFAULT_SAMPLING_RATE = 32


def header_hash(headers: list[str]) -> int:
    """Java-style 31x string hash over all headers, mod 2^64
    (GecozRefBlockHeader.getBlockHeaderHash:120-128)."""
    h = 1125899906842597
    for header in headers:
        for ch in header:
            h = ((h << 5) - h + ord(ch)) & 0xFFFFFFFFFFFFFFFF
    return h


@dataclass
class RefBlockHeader:
    headers: list[str]
    size: int   # total block size incl. this header
    len: int    # generalized string length

    @property
    def header_length(self) -> int:
        return ref_header_length(self.headers)

    def write(self) -> bytes:
        out = bytearray()
        out += REF_MAGIC
        out.append(VERSION)
        out += struct.pack("<QQ", self.size, self.len)
        for h in self.headers:
            out += h.encode() + b"\0"
        out += b"\0"
        return bytes(out)

    @classmethod
    def parse(cls, buf: bytes, offset: int) -> "RefBlockHeader":
        # NB the reference ignores magic/version mismatches silently
        # (GecozRefBlockHeader.java:64-66); we validate.
        if buf[offset:offset + 8] != REF_MAGIC or buf[offset + 8] != VERSION:
            raise ValueError("bad gcz block header")
        size, length = struct.unpack_from("<QQ", buf, offset + 9)
        headers = []
        p = offset + 25
        while buf[p] != 0:
            q = buf.index(b"\0", p)
            headers.append(buf[p:q].decode())
            p = q + 1
        return cls(headers=headers, size=size, len=length)


def ref_header_length(headers: list[str]) -> int:
    return 26 + sum(len(h.encode()) + 1 for h in headers)


def write_ssa_header(headers: list[str], idx_size: int) -> bytes:
    return SSA_MAGIC + bytes([VERSION]) + struct.pack(
        "<QQ", idx_size, header_hash(headers))


def parse_ssa_header(buf: bytes, offset: int) -> tuple[int, int]:
    if buf[offset:offset + 8] != SSA_MAGIC or buf[offset + 8] != VERSION:
        raise ValueError("bad gcx block header")
    length, hsh = struct.unpack_from("<QQ", buf, offset + 9)
    return length, hsh


# -- block encode ----------------------------------------------------------

# device dispatch is serialized: concurrent whole-block programs from the
# threaded writer would contend for HBM (the pool parallelism is for the
# host tiers; the device pipelines internally)
_DEVICE_LOCK = threading.Lock()


def _encode_on_device(data: np.ndarray, shape: HSWTShape):
    """Device tier: SA + BWT + wavelet bit planes on the TPU.

    Blocks whose suffix-sort working set exceeds one device's HBM take
    the in-block sharded kernel over all attached devices
    (parallel/sharded_sa) instead of failing over to the host tier."""
    import jax

    from gecoz_tpu.ops.sa_device import suffix_array_device
    from gecoz_tpu.ops.wavelet import build_hswt_device
    from gecoz_tpu.utils import accel

    with _DEVICE_LOCK:
        if accel.needs_sharded_sa(len(data)) and len(jax.devices()) > 1:
            from gecoz_tpu.parallel.sharded_sa import suffix_array_sharded
            sa_sh, bwt_sh = suffix_array_sharded(data)
            sa = np.asarray(sa_sh).astype(np.int64)
            bwt = np.asarray(bwt_sh)
        else:
            # pass the HOST array: suffix_array_device precomputes the
            # run-count/run-length bounds + run-key table from it (one
            # cheap host pass each) before the device dispatch; the BWT
            # comes back as a free operand of the final sort (runs) or
            # one fused on-device gather (kmer).  The upload itself goes
            # 2-bit packed with run exceptions (utils/xfer) — ~3.5x
            # fewer transport bytes on slow relays.
            from gecoz_tpu.utils import xfer
            s_dev = xfer.put_packed(data)
            sa_dev, bwt_dev_arr = suffix_array_device(
                data, with_bwt=True, s_dev=s_dev)
            bwt = np.asarray(bwt_dev_arr)
            sa = np.asarray(sa_dev).astype(np.int64)
        hswt = HSWT.from_packed(shape, build_hswt_device(bwt, shape))
    return sa, bwt, hswt


def encode_block(data: np.ndarray, headers: list[str],
                 sampling_rate: int = DEFAULT_SAMPLING_RATE,
                 backend: str = "auto") -> tuple[bytes, bytes]:
    """Encode one generalized string block -> (gcz_block, gcx_block).

    Pipeline (GecozFileWriter.write:124-159 + BlockWriter.run:257-284):
    histogram -> shape -> suffix array -> BWT -> wavelet nodes + sampled SA.

    backend 'auto' uses the TPU when a functioning accelerator is attached
    and the block is large enough to amortize dispatch; any device failure
    (incl. OOM) falls back to the host tier — the elastic-degradation
    analog of the reference's pool-shrink-on-OOM (GecozFileWriter.java:
    204-226), with static exact-size planning doing the rest.
    """
    data = np.asarray(data, dtype=np.uint8)
    n = len(data)
    if n >= 1 << 31:
        # same ceiling as the reference (int[] SA, SAIS.java:103); the
        # block merge policy caps blocks at the largest single sequence,
        # so only a >=2 GiB single sequence can reach here
        raise ValueError("blocks are capped at 2^31 bytes by the int32-SA "
                         "contract (SAIS.java:103)")
    from gecoz_tpu.utils.hostmem import warm_for_block
    warm_for_block(n)
    counts = np.bincount(data, minlength=256).astype(np.int64)
    shape = HSWTShape.from_counts(counts)

    if backend == "auto":
        from gecoz_tpu.utils import accel
        if accel.device_worthwhile(n) and accel.accelerator_ok() \
                and accel.encode_device_wins(n):
            backend = "device"

    sa = None
    if backend == "device":
        try:
            sa, bwt, hswt = _encode_on_device(data, shape)
        except Exception as ex:             # noqa: BLE001 — any device
            import logging
            logging.getLogger("gecoz").warning(
                "device encode failed (%s: %s); using the host tier",
                type(ex).__name__, ex)
    if sa is None:
        sa = suffix_array(data, backend="auto" if backend == "device"
                          else backend)
        bwt = bwt_from_sa(data, sa)
        hswt = HSWT.build(bwt, shape)
    ssa = SampledSAIndex.build(sa, sampling_rate)

    block_size = ref_header_length(headers) + shape.size
    ref = RefBlockHeader(headers, block_size, n)
    gcz = ref.write() + hswt.serialize()
    assert len(gcz) == block_size, (len(gcz), block_size)

    sf = sampling_rate.bit_length() - 1
    idx_size = index_size(n, sf)
    gcx = write_ssa_header(headers, idx_size) + ssa.serialize()
    assert len(gcx) == SSA_HEADER_LEN + idx_size, (len(gcx), idx_size)
    return gcz, gcx


class GecozWriter:
    """Streaming multi-block writer for a .gcz/.gcx pair."""

    def __init__(self, ref_path: str | Path, ssa_path: str | Path | None = None,
                 sampling_rate: int = DEFAULT_SAMPLING_RATE,
                 backend: str = "auto", append: bool = False):
        ref_path = Path(ref_path)
        if ssa_path is None:
            ssa_path = default_gcx_path(ref_path)
        mode = "ab" if append else "wb"
        self.ref = open(ref_path, mode)
        self.ssa = open(ssa_path, mode)
        self.sampling_rate = sampling_rate
        self.backend = backend

    def write(self, headers: list[str], data: np.ndarray) -> None:
        gcz, gcx = encode_block(data, headers, self.sampling_rate,
                                self.backend)
        self.ref.write(gcz)
        self.ssa.write(gcx)

    def write_encoded(self, gcz: bytes, gcx: bytes) -> None:
        """Append pre-encoded blocks (multi-host gather path)."""
        self.ref.write(gcz)
        self.ssa.write(gcx)

    def close(self) -> None:
        self.ref.close()
        self.ssa.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def default_gcx_path(ref_path: Path) -> Path:
    name = ref_path.name
    if name.endswith(".gcz"):
        name = name[:-3]
    return ref_path.with_name(name + "gcx")


class GecozReader:
    """Reader for a .gcz (+ optional .gcx) pair."""

    def __init__(self, ref_path: str | Path):
        ref_path = Path(ref_path)
        # memory-mapped: block reads touch only their own byte ranges
        # (the reference mmaps per block, GecozFileReader.java:123)
        self.ref_data = np.memmap(ref_path, dtype=np.uint8, mode="r")
        ssa_path = default_gcx_path(ref_path)
        self.ssa_data = (np.memmap(ssa_path, dtype=np.uint8, mode="r")
                         if ssa_path.is_file() else None)

        self.headers: list[RefBlockHeader] = []
        self.offsets: list[int] = []
        pos = 0
        total = len(self.ref_data)
        while pos < total:
            # headers are small; parse from a bounded window
            win = bytes(self.ref_data[pos:pos + (1 << 16)])
            h = RefBlockHeader.parse(win, 0)
            self.headers.append(h)
            self.offsets.append(pos)
            pos += h.size

        self.sampling_factor = self._derive_sampling_factor()

    def _derive_sampling_factor(self) -> int | None:
        """GecozFileReader.java:134-149."""
        if self.ssa_data is None:
            return None
        data_len = len(self.ssa_data) - len(self.headers) * SSA_HEADER_LEN
        sf = -1
        while True:
            sf += 1
            total = sum(index_size(h.len, sf) for h in self.headers)
            if data_len >= total:
                return sf
            if sf > 40:
                raise ValueError("cannot derive sampling factor")

    def find_block(self, header: str) -> RefBlockHeader | None:
        for h in self.headers:
            if header in h.headers:
                return h
        return None

    def read(self, bheader: RefBlockHeader) -> FMIndex:
        i = self.headers.index(bheader)
        off = self.offsets[i] + bheader.header_length
        hswt = HSWT.read(self.ref_data[off:self.offsets[i] + bheader.size],
                         bheader.len)
        if self.ssa_data is None:
            # counting still works (occ-only); locate/extract need samples.
            # NB the reference silently builds a broken index here
            # (GSSAIndex.java:88-127) and then hangs/corrupts on locate;
            # we expose a count-only FM-index instead.
            return FMIndex(hswt, None)
        sf = self.sampling_factor
        ssa_pos = 0
        for h in self.headers:
            if h is bheader:
                break
            ssa_pos += SSA_HEADER_LEN + index_size(h.len, sf)
        blen, hsh = parse_ssa_header(
            bytes(self.ssa_data[ssa_pos:ssa_pos + SSA_HEADER_LEN + len(REF_MAGIC)]), 0)
        if hsh != header_hash(bheader.headers):
            raise ValueError("gcx header hash mismatch")
        if blen != index_size(bheader.len, sf):
            raise ValueError("gcx block length mismatch")
        ssa = SampledSAIndex.deserialize(
            self.ssa_data[ssa_pos + SSA_HEADER_LEN:], bheader.len, sf)
        return FMIndex(hswt, ssa)

    def check_format(self) -> bool:
        return bytes(self.ref_data[:8]) == REF_MAGIC


def check_format(path: str | Path) -> bool:
    try:
        with open(path, "rb") as f:
            return f.read(8) == REF_MAGIC
    except OSError:
        return False
