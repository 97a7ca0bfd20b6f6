"""Deflate/gzip/BGZF codec tests: round trips + interop with an
independent implementation (stdlib zlib/gzip, test-only oracle)."""

import gzip as stdgzip
import zlib

import numpy as np
import pytest

from gecoz_tpu.codec.deflate import deflate_bytes, inflate_bytes
from gecoz_tpu.codec.gzip_file import (GzipFileReader, GzipFileWriter,
                                       gzip_compress, gzip_decompress)
from conftest import random_dna


CORPORA = [
    b"",
    b"a",
    b"abcabcabcabcabc",
    b"the quick brown fox jumps over the lazy dog " * 300,
]


@pytest.fixture
def corpora(rng):
    return CORPORA + [
        bytes(rng.integers(0, 256, size=40000, dtype=np.uint8)),
        bytes(random_dna(rng, 120000)),
        b"\x00" * 50000,
    ]


@pytest.mark.parametrize("matcher", ["hash", "sa"])
def test_deflate_roundtrip_and_zlib_interop(matcher, corpora):
    for data in corpora:
        comp = deflate_bytes(data, matcher)
        assert inflate_bytes(comp) == data
        assert zlib.decompress(comp, wbits=-15) == data


def test_deflate_ratio_near_zlib9(rng):
    """Compression-ratio parity (BASELINE.md target 1's deflate-path data
    point): the SA matcher + final-table gain re-check lands within a few
    percent of zlib level 9 on DNA, text and binary corpora
    (Deflater.java ~150-190 gain model, LZ77.java SA matcher)."""
    def raw_zlib(data, level):
        c = zlib.compressobj(level, zlib.DEFLATED, -15)
        return c.compress(data) + c.flush()

    words = (b"the quick brown fox jumps over the lazy dog and then some "
             b"more lorem ipsum dolor sit amet consectetur adipiscing elit ")
    binry = bytearray()
    while len(binry) < 96 * 1024:
        binry += bytes(rng.integers(0, 256, size=64,
                                    dtype=np.uint8)) * 3 + b"\x00" * 32
    corpora = {
        "dna": bytes(random_dna(rng, 96 * 1024)),
        "text": bytes((words * 900)[:96 * 1024]),
        "binary": bytes(binry[:96 * 1024]),
    }
    for name, data in corpora.items():
        ours = deflate_bytes(data, "sa")
        assert inflate_bytes(ours) == data, name
        z9 = len(raw_zlib(data, 9))
        assert len(ours) <= z9 * 1.10, \
            f"{name}: {len(ours)} vs zlib9 {z9} ({len(ours) / z9:.3f}x)"


def test_inflate_zlib_streams(corpora):
    for level in (1, 9):
        for data in corpora:
            raw = zlib.compress(data, level)[2:-4]
            assert inflate_bytes(raw) == data


def test_gzip_roundtrip(corpora):
    for data in corpora:
        g = gzip_compress(data)
        assert gzip_decompress(g) == data
        # stdlib can read ours and we can read stdlib's
        assert stdgzip.decompress(g) == data
        assert gzip_decompress(stdgzip.compress(data)) == data


def test_gzip_file_multi_member(tmp_path, rng):
    a, b = bytes(random_dna(rng, 5000)), bytes(random_dna(rng, 3000))
    p = tmp_path / "two.gz"
    p.write_bytes(gzip_compress(a) + gzip_compress(b))
    assert GzipFileReader(p).read_all() == a + b


def test_bgzf_write_read(tmp_path, rng):
    data = bytes(random_dna(rng, 300000))
    p = tmp_path / "x.bgzf"
    with GzipFileWriter(p, bgzf=True) as w:
        w.write(data)
    r = GzipFileReader(p)
    assert r.read_all() == data
    members = r.members()
    assert len(members) >= 5            # 64K-capped members + EOF block
    assert all(m.bsize > 0 for m in members)
    # stdlib gzip reads BGZF fine (it is valid multi-member gzip)
    assert stdgzip.decompress(p.read_bytes()) == data


def test_bgzf_virtual_offset(tmp_path, rng):
    data = bytes(random_dna(rng, 200000))
    p = tmp_path / "x.bgzf"
    with GzipFileWriter(p, bgzf=True) as w:
        w.write(data)
    r = GzipFileReader(p)
    members = r.members()
    # address bytes inside the second member
    m = members[1]
    first_len = GzipFileWriter.MEMBER
    voff = (m.offset << 16) | 100
    got = r.read_from_virtual(voff, 50)
    assert got == data[first_len + 100:first_len + 150]


def test_streaming_plain_gzip(tmp_path, rng):
    import gzip as sg
    data = bytes(random_dna(rng, 200_000))
    p = tmp_path / "s.gz"
    with GzipFileWriter(p, bgzf=False, name="orig.fa") as w:
        for i in range(0, len(data), 7777):   # dribble writes
            w.write(data[i:i + 7777])
    assert GzipFileReader(p).read_all() == data
    assert sg.decompress(p.read_bytes()) == data
    m = GzipFileReader(p).members()[0]
    assert m.name == "orig.fa"


def test_corrupt_crc_detected(tmp_path, rng):
    data = bytes(random_dna(rng, 1000))
    g = bytearray(gzip_compress(data))
    g[-6] ^= 0xFF                       # flip a CRC byte
    with pytest.raises(ValueError):
        gzip_decompress(bytes(g))


def test_gzipped_fasta_input(tmp_path, rng):
    from gecoz_tpu.formats.fasta import iter_fasta
    from gecoz_tpu.tools import driver
    seq = random_dna(rng, 3000)
    raw = b">chrG test\n"
    raw += b"\n".join(bytes(seq[i:i + 60]) for i in range(0, len(seq), 60))
    raw += b"\n"
    fa = tmp_path / "in.fa.gz"
    fa.write_bytes(gzip_compress(raw))
    recs = list(iter_fasta(fa))
    assert recs[0].header == "chrG test"
    assert bytes(recs[0].data) == bytes(seq)
    # full pipeline from gzipped input
    gcz = tmp_path / "o.gcz"
    driver.index_fasta(fa, gcz)
    out = tmp_path / "back.fa"
    driver.decompress(gcz, out)
    back = list(iter_fasta(out))
    assert bytes(back[0].data) == bytes(seq)


def test_native_lpf_matches_python_oracle(rng):
    """native/lpf.cpp vs the pure-python exact-LPF matcher (VERDICT r3 #8:
    the SA matcher is now production speed — C pipeline, python oracle)."""
    import unittest.mock as um

    import gecoz_tpu.codec.deflate as D
    from gecoz_tpu import native
    from gecoz_tpu.ops.sa import suffix_array
    if not native.available():
        pytest.skip("native tier unavailable")
    wins = [
        rng.integers(65, 69, size=8192).astype(np.uint8),
        np.tile(np.frombuffer(b"abcabcabd", np.uint8), 1000)[:8000],
        np.zeros(4000, np.uint8),
    ]
    for win in wins:
        sa = np.asarray(suffix_array(win), dtype=np.int64)
        ln, dn = native.lpf(win, sa, D._MIN_MATCH, D._MAX_MATCH)
        with um.patch.object(native, "available", lambda: False):
            lp, dp = D._find_matches_sa(win)
        assert np.array_equal(ln, lp) and np.array_equal(dn, dp)


def test_sa_matcher_roundtrip(rng):
    from gecoz_tpu.codec.deflate import Deflater, inflate_bytes
    data = bytes(rng.integers(60, 80, size=200_000).astype(np.uint8))
    out = Deflater("sa").deflate(data).getvalue()
    assert inflate_bytes(out) == data


def test_native_sa_matcher_roundtrip_and_ratio(rng):
    """The native SA-LPF encoder (deflate_enc.cpp::gecoz_deflate_sa —
    the reference's production matcher architecture, LZ77.java:26-180):
    valid RFC1951 through BOTH this repo's inflater and zlib, and a
    strictly better ratio than the hash chain on genomic text."""
    import zlib

    from gecoz_tpu import native
    from gecoz_tpu.codec.deflate import inflate_bytes
    if not native.available():
        import pytest
        pytest.skip("native library unavailable")
    syms = np.frombuffer(b"ACGTN", np.uint8)
    data = rng.choice(syms, size=1 << 18,
                      p=[.29, .2, .2, .29, .02]).astype(np.uint8).tobytes()
    sa = native.deflate(data, matcher="sa")
    assert zlib.decompress(sa, wbits=-15) == data
    assert inflate_bytes(sa) == data
    assert len(sa) < len(native.deflate(data, matcher="hash"))
    # edge cases: empty + tiny + all-equal
    for payload in (b"", b"A", b"AAAAAAAAAAAAAAAA" * 100):
        enc = native.deflate(payload, matcher="sa")
        assert zlib.decompress(enc, wbits=-15) == payload


def test_bgzf_member_auto_uses_sa_and_roundtrips(tmp_path, rng):
    """GzipFileWriter(auto) BGZF members ride the SA matcher by default
    and stay readable by the repo reader AND stdlib gzip."""
    import gzip as stdgzip

    from gecoz_tpu.codec.gzip_file import GzipFileReader, GzipFileWriter
    syms = np.frombuffer(b"ACGT", np.uint8)
    data = rng.choice(syms, size=200_000).astype(np.uint8).tobytes()
    p = tmp_path / "x.bgzf.gz"
    with GzipFileWriter(p, bgzf=True) as w:
        w.write(data)
    assert stdgzip.decompress(p.read_bytes()) == data
    assert GzipFileReader(p).read_all() == data
