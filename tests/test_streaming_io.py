"""Streaming input tier: windowed gzip reading, inflate-once FASTA cache,
lazy line-streaming scan (FileChannelBitInputStream.java:41-243 +
FastaFileReader.java:~70-80 equivalents)."""

import io

import numpy as np
import pytest

from gecoz_tpu.codec.gzip_file import (GzipFileReader, GzipFileWriter,
                                       gzip_compress)
from gecoz_tpu.formats import fasta
from gecoz_tpu.formats.fasta import iter_fasta, read_sequence
from conftest import random_dna


def _write_gz_fasta(path, records):
    with GzipFileWriter(path) as w:
        for header, seq in records:
            w.write(b">" + header.encode() + b"\n")
            s = bytes(seq)
            for i in range(0, len(s), 60):
                w.write(s[i:i + 60] + b"\n")


def test_inflate_to_matches_read_all(tmp_path, rng):
    payload = bytes(random_dna(rng, 300_000)) + b"x" * 5000
    # multi-member: BGZF (many 64 KiB members) and plain gzip
    for bgzf in (False, True):
        p = tmp_path / f"t{bgzf}.gz"
        with GzipFileWriter(p, bgzf=bgzf) as w:
            w.write(payload)
        r = GzipFileReader(p)
        out = io.BytesIO()
        n = r.inflate_to(out)
        assert n == len(payload)
        assert out.getvalue() == payload == GzipFileReader(p).read_all()


def test_inflate_to_fd_streaming(tmp_path, rng):
    """File-descriptor output takes the native bounded-window path."""
    payload = bytes(random_dna(rng, 1_000_000))
    p = tmp_path / "t.gz"
    (tmp_path / "t.gz").write_bytes(gzip_compress(payload))
    with open(tmp_path / "out.bin", "wb") as f:
        n = GzipFileReader(p).inflate_to(f)
    assert n == len(payload)
    assert (tmp_path / "out.bin").read_bytes() == payload


def test_streaming_crc_verified(tmp_path, rng):
    payload = bytes(random_dna(rng, 50_000))
    blob = bytearray(gzip_compress(payload))
    blob[-6] ^= 0xFF            # corrupt the CRC field
    p = tmp_path / "bad.gz"
    p.write_bytes(blob)
    with pytest.raises(ValueError):
        with open(tmp_path / "o.bin", "wb") as f:
            GzipFileReader(p).inflate_to(f)


def test_gzipped_fasta_inflates_exactly_once(tmp_path, rng):
    records = [(f"chr{i}", random_dna(rng, 5000)) for i in range(6)]
    p = tmp_path / "in.fa.gz"
    _write_gz_fasta(p, records)
    fasta._INFLATED_CACHE.clear()
    before = fasta._INFLATE_COUNT
    seqs = list(iter_fasta(p, lazy=True))
    assert [s.header for s in seqs] == [h for h, _ in records]
    # every read_sequence shares the one inflation
    for s, (_, want) in zip(seqs, records):
        got = read_sequence(p, s)
        assert bytes(got) == bytes(want)
    assert fasta._INFLATE_COUNT == before + 1


def test_lazy_scan_is_streaming(tmp_path, rng):
    """Peak traced allocation stays O(line), not O(file)."""
    import tracemalloc
    n = 4_000_000
    seq = random_dna(rng, n)
    p = tmp_path / "big.fa"
    with open(p, "wb") as f:
        f.write(b">chrBig\n")
        for i in range(0, n, 80):
            f.write(seq[i:i + 80].tobytes() + b"\n")
    tracemalloc.start()
    seqs = list(iter_fasta(p, lazy=True))
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    assert seqs[0].length == n
    assert peak < n // 4, f"lazy scan allocated {peak} bytes"


def test_fastq_and_mixed_parsing(tmp_path):
    """FASTQ quality sections (incl. '@'/'+' inside quality) are skipped."""
    blob = (b">fa1\nACGT\nACG\n"
            b"@fq1\nACGTACG\n+\n@#+!ABC\n"
            b"@fq2 desc\nTTTT\n+fq2\n!!!!\n"
            b">fa2\nGG\n")
    p = tmp_path / "mix.fa"
    p.write_bytes(blob)
    seqs = list(iter_fasta(p))
    assert [(s.header, bytes(s.data)) for s in seqs] == [
        ("fa1", b"ACGTACG"), ("fq1", b"ACGTACG"),
        ("fq2 desc", b"TTTT"), ("fa2", b"GG")]
    lazy = list(iter_fasta(p, lazy=True))
    for s, l in zip(seqs, lazy):
        assert (s.header, s.length, s.position) == \
            (l.header, l.length, l.position)
        assert bytes(read_sequence(p, l)) == bytes(s.data)
