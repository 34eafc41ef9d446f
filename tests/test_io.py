"""I/O substrate tests: BGZF codec round-trip, BAM parse of the real demo file,
BAM write/read round-trip, FASTA round-trip."""

import os

import numpy as np
import pytest

from longcallr_tpu.io import bam as bamio
from longcallr_tpu.io import bgzf, fasta


def test_bgzf_roundtrip(tmp_path):
    payload = os.urandom(300_000) + b"compressible" * 10_000
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as f:
        with bgzf.BgzfWriter(f) as w:
            w.write(payload)
    back = bgzf.decompress_file(str(p), check_crc=True)
    assert back == payload


def test_bgzf_virtual_offsets(tmp_path):
    payload = bytes(range(256)) * 1024  # 256 KiB, multiple blocks
    p = tmp_path / "x.bgzf"
    with open(p, "wb") as f:
        with bgzf.BgzfWriter(f) as w:
            w.write(payload)
    data = open(p, "rb").read()
    d = bgzf.BgzfDecompressor(data)
    # read across a block boundary from uoffset 100 of the first block
    got = d.read_from(100, 70_000)
    assert got == payload[100:100 + 70_000]


def test_demo_bam_parse(demo_bam_path):
    bf = bamio.BamFile(demo_bam_path)
    assert "chr20" in bf.references
    assert bf.lengths[bf.tid("chr20")] == 64_444_167
    assert bf.n_records > 0
    # all demo reads are on chr20
    assert set(bf.ref_id.tolist()) == {bf.tid("chr20")}
    # coordinate sorted
    assert np.all(np.diff(bf.pos) >= 0)
    r = bf.read(0)
    assert r.l_seq == len(r.seq) == len(r.qual)
    assert r.qname.startswith("m84036")
    # cigar query length must equal l_seq for mapped reads with seq
    qlen = int(r.cigar_lens[bamio.CONSUMES_QUERY[r.cigar_ops]].sum())
    assert qlen == r.l_seq
    assert isinstance(r.get_tag("de"), float)
    assert r.get_tag("ts") in ("+", "-")
    assert r.get_tag("NM") is not None
    # reference_end sane
    assert r.reference_end() > r.pos


def test_demo_bam_full_scan_consistency(demo_bam_path):
    bf = bamio.BamFile(demo_bam_path)
    total_qlen = 0
    for r in bf:
        qlen = int(r.cigar_lens[bamio.CONSUMES_QUERY[r.cigar_ops]].sum())
        assert qlen == r.l_seq, r.qname
        total_qlen += qlen
    assert total_qlen > 1_000_000


def test_bam_write_roundtrip(tmp_path):
    path = str(tmp_path / "t.bam")
    cigar = bamio.encode_cigar([(3, "S"), (10, "M"), (2, "D"), (5, "M"), (4, "N"), (6, "M")])
    seq = b"ACGTACGTACGTACGTACGTACGT"
    qual = np.arange(len(seq)) % 40
    tags = bamio.make_tag_bytes("de", "f", 0.01) + bamio.make_tag_bytes("ts", "A", "+")
    with bamio.BamWriter(path, ["chrT"], [1000]) as w:
        w.write_record(qname="read1", flag=0, ref_id=0, pos=100, mapq=60,
                       cigar=cigar, seq=seq, qual=qual, tags=tags)
        w.write_record(qname="read2", flag=16, ref_id=0, pos=150, mapq=60,
                       cigar=bamio.encode_cigar([(24, "M")]), seq=seq, qual=qual)
    bf = bamio.BamFile(path)
    assert bf.n_records == 2
    r = bf.read(0)
    assert r.qname == "read1"
    assert r.pos == 100
    assert bytes(r.seq) == seq
    assert np.array_equal(r.qual, qual)
    assert r.leading_softclips() == 3
    assert r.trailing_softclips() == 0
    assert r.reference_end() == 100 + 10 + 2 + 5 + 4 + 6
    assert abs(r.get_tag("de") - 0.01) < 1e-6
    assert r.get_tag("ts") == "+"
    r2 = bf.read(1)
    assert r2.strand == 1
    # raw pass-through with appended tag
    path2 = str(tmp_path / "t2.bam")
    with bamio.BamWriter(path2, ["chrT"], [1000]) as w:
        w.write_raw(bf.read(0).raw_record(),
                    extra_tags=bamio.make_tag_bytes("HP", "i", 2))
    bf2 = bamio.BamFile(path2)
    rr = bf2.read(0)
    assert rr.get_tag("HP") == 2
    assert rr.get_tag("de") is not None
    assert bytes(rr.seq) == seq


def test_bam_fetch(tmp_path):
    path = str(tmp_path / "f.bam")
    with bamio.BamWriter(path, ["chrT"], [10000]) as w:
        for i, pos in enumerate([100, 200, 300, 400]):
            w.write_record(qname=f"r{i}", flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar([(50, "M")]),
                           seq=b"A" * 50, qual=np.full(50, 30))
    bf = bamio.BamFile(path)
    # r0 spans [100,150) which overlaps [120,310): included
    got = [r.qname for r in bf.fetch("chrT", 120, 310)]
    assert got == ["r0", "r1", "r2"]
    got = [r.qname for r in bf.fetch("chrT", 150, 200)]
    assert got == []  # r0 ends exactly at 150 (exclusive), r1 starts at 200
    got = [r.qname for r in bf.fetch("chrT")]
    assert got == ["r0", "r1", "r2", "r3"]


def test_fasta_roundtrip(tmp_path):
    path = str(tmp_path / "r.fa")
    seqs = {"chrA": b"ACGT" * 100 + b"GG", "chrB": b"ttnnACGT" * 33}
    fasta.write_fasta(path, seqs, line_width=37)
    fa = fasta.FastaFile(path)
    assert fa.references == ["chrA", "chrB"]
    assert fa.length("chrA") == 402
    assert bytes(fa.fetch("chrA")) == seqs["chrA"]
    assert bytes(fa.fetch("chrB")) == seqs["chrB"]  # case preserved
    assert fasta.parse_fai(path + ".fai") == [("chrA", 402), ("chrB", 264)]


def _bcf_typed_str(s: bytes) -> bytes:
    assert len(s) < 15
    return bytes([(len(s) << 4) | 7]) + s


def _encode_bcf(records, contig="chrS", with_idx=False):
    """Minimal BCF2.2 encoder for round-trip tests: records are
    (pos0, qual, gt) with gt like '0/1', '1|1', './1', or a tuple of such
    strings for multi-sample records (all samples ploidy 2). ``qual=None``
    encodes the missing-QUAL bit pattern (0x7F800001)."""
    import struct
    idx = lambda i: f",IDX={i}" if with_idx else ""
    header = "\n".join([
        "##fileformat=VCFv4.2",
        f'##FILTER=<ID=PASS,Description="P"{idx(0)}>',
        f'##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="g"{idx(1)}>',
        f'##FORMAT=<ID=GT,Number=1,Type=String,Description="G"{idx(2)}>',
        f'##contig=<ID={contig}{idx(0)}>',
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1",
    ]) + "\n\x00"
    gt_key = 2
    body = b""
    for pos0, qual, gt in records:
        gts = [gt] if isinstance(gt, str) else list(gt)
        enc_all = b""
        for g in gts:
            phased = "|" in g
            al = g.replace("|", "/").split("/")
            enc = []
            for j, a in enumerate(al):
                v = 0 if a == "." else ((int(a) + 1) << 1)
                enc.append(v | (1 if (phased and j > 0 and v) else 0))
            enc_all += bytes(enc)
        qbits = (struct.pack("<I", 0x7F800001) if qual is None
                 else struct.pack("<f", qual))
        shared = struct.pack("<iii", 0, pos0, 1) + qbits + struct.pack(
            "<II", (2 << 16) | 0, (1 << 24) | len(gts))
        shared += b"\x07"                 # ID: empty string
        shared += _bcf_typed_str(b"A")    # REF
        shared += _bcf_typed_str(b"C")    # ALT
        shared += b"\x11\x00"             # FILTER: one int8 = 0 (PASS)
        indiv = bytes([0x11, gt_key])     # fmt key: typed int8
        indiv += bytes([(2 << 4) | 1]) + enc_all   # int8 vector ×samples
        body += struct.pack("<II", len(shared), len(indiv)) + shared + indiv
    raw = b"BCF\x02\x02" + struct.pack("<I", len(header)) + header.encode()
    return raw + body


def test_bcf_input_candidates(tmp_path):
    """-v accepts binary BCF (vcf.rs:400-410 via rust-htslib): BCF records
    decode to the same map as the equivalent text VCF, for plain, BGZF, and
    IDX-annotated headers."""
    from longcallr_tpu.io.bgzf import compress_block
    from longcallr_tpu.io.vcf import load_input_candidates

    records = [(99, 60.0, "0/1"), (199, 31.5, "1|1"), (299, 10.0, "0/0"),
               (399, 55.0, "1/2"), (499, 20.0, "./1"), (599, 12.0, "0|1")]
    text = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1"]
    for pos0, qual, gt in records:
        text.append(f"chrS\t{pos0+1}\t.\tA\tC\t{qual}\tPASS\t.\tGT\t{gt}")
    vcf_path = str(tmp_path / "in.vcf")
    with open(vcf_path, "w") as f:
        f.write("\n".join(text) + "\n")
    want = load_input_candidates(vcf_path)

    for tag, with_idx in (("plain", False), ("idx", True)):
        raw = _encode_bcf(records, with_idx=with_idx)
        bcf_path = str(tmp_path / f"in_{tag}.bcf")
        with open(bcf_path, "wb") as f:
            f.write(compress_block(raw))
            f.write(compress_block(b""))  # EOF block
        got = load_input_candidates(bcf_path)
        assert set(got) == {"chrS"}
        assert {p: (g.genotype, g.quality, g.phased)
                for p, g in got["chrS"].items()} == \
               {p: (g.genotype, g.quality, g.phased)
                for p, g in want["chrS"].items()}, tag

    # uncompressed BCF stream is also accepted
    ub = str(tmp_path / "u.bcf")
    with open(ub, "wb") as f:
        f.write(_encode_bcf(records))
    got = load_input_candidates(ub)
    assert len(got["chrS"]) == len(want["chrS"])


def test_vcf_gz_roundtrip_input(tmp_path):
    """.vcf.gz input: BGZF-compressed text VCF decodes like plain text."""
    from longcallr_tpu.io.bgzf import compress_block
    from longcallr_tpu.io.vcf import load_input_candidates

    text = ("##fileformat=VCFv4.2\n"
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
            "chrS\t100\t.\tA\tC\t60\tPASS\t.\tGT\t0|1\n")
    plain = str(tmp_path / "a.vcf")
    with open(plain, "w") as f:
        f.write(text)
    gz = str(tmp_path / "a.vcf.gz")
    with open(gz, "wb") as f:
        f.write(compress_block(text.encode()))
        f.write(compress_block(b""))
    a = load_input_candidates(plain)
    b = load_input_candidates(gz)
    assert a.keys() == b.keys()
    assert {p: (g.genotype, g.quality, g.phased) for p, g in a["chrS"].items()} \
        == {p: (g.genotype, g.quality, g.phased) for p, g in b["chrS"].items()}


def test_input_candidates_multisample_last_wins(tmp_path):
    """vcf.rs:414-455 loops ALL samples with last-valid-wins insert and a
    record-sticky `phased` flag (set by any earlier sample's second-allele
    phase bit, never reset) — both text and BCF paths replicate it."""
    from longcallr_tpu.io.bgzf import compress_block
    from longcallr_tpu.io.vcf import load_input_candidates

    # (pos0, qual, per-sample GTs, expected (genotype, phased))
    cases = [
        (99, 60.0, ("0/1", "1/1"), (2, False)),    # last sample wins
        (199, 31.5, ("1|1", "0/1"), (1, True)),    # phased sticky across
        (299, 10.0, ("0/1/1", "0/0"), (0, False)),  # non-diploid skipped
        (399, 55.0, ("1/2", "0|0"), (0, True)),
        (499, 20.0, ("./1",), (4, False)),
    ]
    text = ["##fileformat=VCFv4.2",
            "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2"]
    for pos0, qual, gts, _ in cases:
        cols = "\t".join(gts + (".",) * (2 - len(gts)))
        text.append(f"chrS\t{pos0+1}\t.\tA\tC\t{qual}\tPASS\t.\tGT\t{cols}")
    vcf_path = str(tmp_path / "ms.vcf")
    with open(vcf_path, "w") as f:
        f.write("\n".join(text) + "\n")
    got_text = load_input_candidates(vcf_path)["chrS"]
    for pos0, qual, gts, (code, phased) in cases:
        g = got_text[pos0]
        assert (g.genotype, g.phased) == (code, phased), pos0

    # BCF path (diploid-encodable cases only) agrees
    bcf_cases = [(p, q, g) for p, q, g, _ in cases
                 if all(len(x.replace("|", "/").split("/")) == 2 for x in g)]
    raw = _encode_bcf(bcf_cases)
    bcf_path = str(tmp_path / "ms.bcf")
    with open(bcf_path, "wb") as f:
        f.write(compress_block(raw))
        f.write(compress_block(b""))
    got_bcf = load_input_candidates(bcf_path)["chrS"]
    for pos0, _, _, (code, phased) in cases:
        if pos0 == 299:
            continue   # the triploid-sample case is text-only
        assert (got_bcf[pos0].genotype, got_bcf[pos0].phased) == (code, phased)


def test_input_candidates_missing_qual_is_nan(tmp_path):
    """Missing QUAL propagates as NaN like rust-htslib's record.qual(): the
    import gate `quality < min_variant_qual` (candidate.rs:550) is then
    false → record kept, and _as_i32(NaN) → 0 on emission."""
    import math

    from longcallr_tpu.io.bgzf import compress_block
    from longcallr_tpu.io.vcf import _as_i32, load_input_candidates

    vcf_path = str(tmp_path / "mq.vcf")
    with open(vcf_path, "w") as f:
        f.write("##fileformat=VCFv4.2\n"
                "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\n"
                "chrS\t100\t.\tA\tC\t.\tPASS\t.\tGT\t0|1\n")
    g = load_input_candidates(vcf_path)["chrS"][99]
    assert math.isnan(g.quality)
    assert not (g.quality < 2.0)       # import gate keeps the record
    assert _as_i32(g.quality) == 0     # Rust `NaN as i32` == 0

    raw = _encode_bcf([(99, None, "0|1")])
    bcf_path = str(tmp_path / "mq.bcf")
    with open(bcf_path, "wb") as f:
        f.write(compress_block(raw))
        f.write(compress_block(b""))
    gb = load_input_candidates(bcf_path)["chrS"][99]
    assert math.isnan(gb.quality)
