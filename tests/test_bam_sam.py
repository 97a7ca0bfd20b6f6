"""BAM/SAM layer: record codecs, header parsing, BAI range queries."""

import numpy as np
import pytest

from gecoz_tpu.formats.bam import (BAI, BAMFileReader, BAMFileWriter,
                                   BAMHeader, reg2bin, reg2bins)
from gecoz_tpu.formats.sam import (SAMHeader, SAMRecord, SAMTag,
                                   decode_cigar, encode_cigar,
                                   reference_span)
from conftest import random_dna


def test_cigar_roundtrip():
    ops = decode_cigar("10M2I5D3S")
    assert ops == [(10, "M"), (2, "I"), (5, "D"), (3, "S")]
    assert encode_cigar(ops) == "10M2I5D3S"
    assert reference_span(ops) == 15
    assert decode_cigar("*") == []
    with pytest.raises(ValueError):
        decode_cigar("10Q")


def test_sam_record_roundtrip():
    line = ("r001\t99\tchr1\t7\t30\t8M2I4M1D3M\t=\t37\t39\t"
            "TTAGATAAAGGATACTG\t*\tNM:i:1\tXX:Z:hello\tXB:B:c,1,-2,3")
    rec = SAMRecord.parse(line)
    assert rec.qname == "r001" and rec.pos == 7
    assert rec.get_tag("NM").value == 1
    assert rec.get_tag("XB").value == ("c", [1, -2, 3])
    assert rec.format() == line
    assert rec.position_end() == 7 + 16 - 1


def test_sam_header_roundtrip():
    text = ("@HD\tVN:1.6\tSO:coordinate\n"
            "@SQ\tSN:chr1\tLN:1000\n@SQ\tSN:chr2\tLN:500\n"
            "@RG\tID:rg1\tPL:ILLUMINA\n@PG\tID:p1\tPN:gecoz\n@CO\thello\n")
    h = SAMHeader.parse(text)
    assert h.version == "1.6" and h.sort_order == "coordinate"
    assert [r["SN"] for r in h.references] == ["chr1", "chr2"]
    assert h.format() == text


def _make_bam(tmp_path, rng, nrec=200, reflen=100000):
    header = BAMHeader(text="@HD\tVN:1.6\n@SQ\tSN:chrT\tLN:100000\n",
                       ref_names=["chrT", "chrU"],
                       ref_lengths=[reflen, 50000])
    path = tmp_path / "t.bam"
    recs = []
    positions = np.sort(rng.integers(0, reflen - 200, size=nrec))
    with BAMFileWriter(path, header) as w:
        for i, pos in enumerate(positions):
            seq = bytes(random_dna(rng, 50)).decode()
            rec = SAMRecord(qname=f"r{i:04d}", flag=0, rname="chrT",
                            pos=int(pos) + 1, mapq=60, cigar="50M",
                            seq=seq, qual="I" * 50,
                            tags=[SAMTag("NM", "i", i % 5)])
            recs.append(rec)
            w.write(rec)
    return path, recs


def test_bam_write_read_roundtrip(tmp_path, rng):
    path, recs = _make_bam(tmp_path, rng, nrec=50)
    r = BAMFileReader(path)
    assert r.header.ref_names == ["chrT", "chrU"]
    got = [rec for rec, _ in r.records()]
    assert len(got) == 50
    for a, b in zip(got, recs):
        assert a.qname == b.qname and a.pos == b.pos
        assert a.seq == b.seq and a.cigar == b.cigar
        assert a.get_tag("NM").value == b.get_tag("NM").value
        assert a.rname == "chrT"


def test_bam_search_vs_brute(tmp_path, rng):
    path, recs = _make_bam(tmp_path, rng, nrec=300)
    r = BAMFileReader(path)
    for (start, end) in [(0, 1000), (50000, 52000), (99000, 100000),
                         (0, 100000)]:
        got = r.search(0, start, end)
        want = [x for x in recs
                if x.pos - 1 < end and x.pos - 1 + 50 > start]
        assert len(got) == len(want), (start, end)
        assert [g.qname for g in got] == [w.qname for w in want]


def test_bai_save_load(tmp_path, rng):
    path, recs = _make_bam(tmp_path, rng, nrec=100)
    r = BAMFileReader(path)
    bai = r.make_index()
    bp = tmp_path / "t.bam.bai"
    bai.save(bp)
    back = BAI.load(bp)
    assert back.n_ref == bai.n_ref
    assert back.bins == bai.bins
    assert back.linear == bai.linear
    # reader picks up the sibling .bai automatically
    r2 = BAMFileReader(path)
    assert r2.bai is not None
    assert len(r2.search(0, 0, 100000)) == 100


def test_reg2bin_scheme():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 15) == 585
    assert 4681 + (12345 >> 14) in reg2bins(12345, 12346)
    assert 0 in reg2bins(0, 1 << 29)


def test_sam_bam_sam_roundtrip(tmp_path, rng):
    from gecoz_tpu.formats.bam import bam_to_sam, sam_to_bam
    sam = tmp_path / "a.sam"
    sam.write_text(
        "@HD\tVN:1.6\tSO:coordinate\n@SQ\tSN:chrQ\tLN:5000\n"
        "r1\t0\tchrQ\t100\t60\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII\tNM:i:0\n"
        "r2\t16\tchrQ\t220\t37\t4M1I3M\t*\t0\t0\tGGGGTCCC\tFFFFFFFF\n")
    bam = tmp_path / "a.bam"
    sam_to_bam(sam, bam)
    back = tmp_path / "b.sam"
    bam_to_sam(bam, back)
    orig_recs = [l for l in sam.read_text().splitlines() if not l.startswith("@")]
    back_recs = [l for l in back.read_text().splitlines() if not l.startswith("@")]
    assert orig_recs == back_recs


def test_sam_tag_registry():
    """Data-driven SAMTagEnum equivalent: canonical types + validation
    (reference sam/tag/SAMTagEnum.java:37-45)."""
    from gecoz_tpu.formats.sam import (SAM_TAG_TYPES, SAMRecord, SAMTag,
                                       validate_tag)
    assert SAM_TAG_TYPES["NM"] == "i" and SAM_TAG_TYPES["MD"] == "Z"
    assert len(SAM_TAG_TYPES) == 59
    # consistent: predefined with right type, int width variants, local
    assert validate_tag("NM", "i") is None
    assert validate_tag("NM", "c") is None        # BAM narrow int widths
    assert validate_tag("XX", "f") is None        # local namespace
    assert validate_tag("za", "Z") is None        # lowercase = local
    assert validate_tag("GC", "Z") is None        # reserved '?' tag
    # inconsistent
    assert validate_tag("NM", "Z") is not None
    assert validate_tag("MD", "i") is not None
    assert validate_tag("QQ", "i") is not None    # unknown predefined-style
    rec = SAMRecord.parse(
        "r1\t0\tchr1\t100\t60\t4M\t*\t0\t0\tACGT\tFFFF\tNM:i:1\tMD:Z:4")
    assert rec.validate_tags() == []
    rec.tags.append(SAMTag("NM", "Z", "oops"))
    assert len(rec.validate_tags()) == 1
    assert rec.get_tag("NM").canonical_type() == "i"
