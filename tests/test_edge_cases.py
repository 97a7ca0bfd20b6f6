"""Edge inputs: empty sequences, tiny blocks, big alphabets, deep codes."""

import numpy as np
import pytest

from gecoz_tpu.formats.gcz import encode_block
from gecoz_tpu.formats.fasta import iter_fasta
from gecoz_tpu.tools import driver
from test_fm import build_fm
from test_gcz_files import write_fasta
from conftest import random_dna


def test_zero_length_sequence_block():
    # a header with no data: block = just the terminator
    data = np.zeros(1, dtype=np.uint8)
    fm = build_fm(data, rate=4)
    assert fm.nseq == 1
    assert fm.seq_length(0) == 0
    assert fm.extract(0) == b""
    gcz, gcx = encode_block(data, ["empty"])
    assert len(gcz) > 26


def test_single_symbol_block():
    data = np.frombuffer(b"AAAAAAAA\0", dtype=np.uint8)
    fm = build_fm(data, rate=4)
    assert bytes(fm.decode_text()) == bytes(data)
    assert fm.count_total(b"AAA") == 6
    assert fm.extract(0) == b"AAAAAAAA"


def test_mixed_empty_and_real_sequences(tmp_path, rng):
    fa = tmp_path / "in.fa"
    fa.write_bytes(b">a\nACGTACGT\n>b\n>c\nGGG\n")
    gcz = tmp_path / "o.gcz"
    driver.index_fasta(fa, gcz)
    out = tmp_path / "back.fa"
    driver.decompress(gcz, out)
    back = {s.header: bytes(s.data) for s in iter_fasta(out)}
    assert back == {"a": b"ACGTACGT", "b": b"", "c": b"GGG"}


def test_protein_alphabet_roundtrip(tmp_path, rng):
    # >16 symbols: host wavelet path (device plane engine refuses)
    protein = b"ACDEFGHIKLMNPQRSTVWY"
    seq = rng.choice(np.frombuffer(protein, np.uint8), size=5000)
    fa = tmp_path / "p.fa"
    write_fasta(fa, [("prot1", seq)])
    gcz = tmp_path / "p.gcz"
    driver.index_fasta(fa, gcz)
    out = tmp_path / "p.out.fa"
    driver.decompress(gcz, out)
    back = list(iter_fasta(out))
    assert bytes(back[0].data) == bytes(seq)


def test_full_byte_alphabet_block(rng):
    data = rng.integers(1, 256, size=4000).astype(np.uint8)
    data = np.concatenate([data, np.zeros(1, np.uint8)])
    fm = build_fm(data, rate=8)
    assert bytes(fm.decode_text()) == bytes(data)
    pat = bytes(data[100:104])
    if 0 not in pat:
        sp, ep = fm.search_range(pat)
        assert ep >= sp


def test_skewed_counts_deep_codes(rng):
    # fibonacci-ish counts drive max-depth Huffman codes through the
    # 15-bit restriction; round-trip through the full block pipeline
    parts = []
    fib = [1, 1]
    for _ in range(20):
        fib.append(fib[-1] + fib[-2])
    for i, f in enumerate(fib[:18]):
        parts.append(np.full(min(f, 3000), 32 + i, dtype=np.uint8))
    data = np.concatenate(parts + [np.zeros(1, np.uint8)])
    rng.shuffle(data[:-1])
    gcz, gcx = encode_block(data, ["skew"])
    import tempfile
    from pathlib import Path
    from gecoz_tpu.formats.gcz import GecozReader
    with tempfile.TemporaryDirectory() as d:
        (Path(d) / "s.gcz").write_bytes(gcz)
        (Path(d) / "s.gcx").write_bytes(gcx)
        r = GecozReader(Path(d) / "s.gcz")
        fm = r.read(r.headers[0])
        assert bytes(fm.decode_text()) == bytes(data)


def test_crlf_fasta(tmp_path):
    fa = tmp_path / "crlf.fa"
    fa.write_bytes(b">x desc\r\nACGT\r\nACGT\r\n")
    recs = list(iter_fasta(fa))
    assert recs[0].header == "x desc"
    assert bytes(recs[0].data) == b"ACGTACGT"


def test_fastq_input(tmp_path):
    fq = tmp_path / "r.fq"
    fq.write_bytes(b"@read1\nACGTACGT\n+\nIIIIIIII\n@read2\nGGGG\n+\n!!!!\n")
    recs = list(iter_fasta(fq))
    assert [(r.header, bytes(r.data)) for r in recs] == \
        [("read1", b"ACGTACGT"), ("read2", b"GGGG")]
