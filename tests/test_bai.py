"""BAI index: reader vs the real htslib-made demo index, writer round-trips,
and BAI-windowed BamFile loading."""

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.io.bai import BaiIndex, build_bai, reg2bin, reg2bins
from longcallr_tpu.io.bam import BamFile

from simulate import make_reference, plant_snps, simulate_bam

DEMO_BAM = "/root/reference/demo/demo.bam"
DEMO_REGION = ("chr20", 16729960, 16743217)


def test_reg2bin_levels():
    # SAM spec §5.3 examples: bin of a whole-chromosome interval is 0
    assert reg2bin(0, 1 << 29) == 0
    # a sub-16kb interval lands in the deepest level (4681 + beg>>14)
    assert reg2bin(16384, 16385) == 4681 + 1
    assert 4681 + 1 in reg2bins(16384, 16385)
    assert 0 in reg2bins(123, 456)


def test_load_real_htslib_index():
    bai = BaiIndex.load(DEMO_BAM + ".bai")
    chrom, s, e = DEMO_REGION
    full = BamFile(DEMO_BAM)
    tid = full.references.index(chrom)
    span = bai.chunk_span(tid, s, e)
    assert span is not None
    cbeg, cend = span
    assert cbeg < cend
    # the span must cover every record overlapping the region
    lo, hi, mask = full.overlap_range(chrom, s, e)
    assert hi > lo


def test_windowed_load_matches_full_demo():
    """BAI-windowed load with the REAL htslib index == full load, filtered."""
    chrom, s, e = DEMO_REGION
    full = BamFile(DEMO_BAM)
    win = BamFile(DEMO_BAM, region=(chrom, s, e))
    assert win.references == full.references
    assert len(win._data) < len(full._data)
    lo_f, hi_f, mask_f = full.overlap_range(chrom, s, e)
    lo_w, hi_w, mask_w = win.overlap_range(chrom, s, e)
    assert hi_f - lo_f == hi_w - lo_w and mask_f.sum() == mask_w.sum()
    fsel = np.flatnonzero(
        (full.ref_id == full.references.index(chrom))
        & (full.ref_end > s) & (full.pos < e))
    wsel = np.flatnonzero(
        (win.ref_id == win.references.index(chrom))
        & (win.ref_end > s) & (win.pos < e))
    assert len(fsel) == len(wsel)
    for i, j in zip(fsel[:20], wsel[:20]):
        rf, rw = full.read(int(i)), win.read(int(j))
        assert rf.qname == rw.qname
        assert np.array_equal(rf.seq, rw.seq)
        assert np.array_equal(rf.qual, rw.qual)


def test_build_bai_windowed_load(tmp_path, rng):
    """Our own index on a simulated multi-block BAM drives windowed loads
    that agree with the full load."""
    ref = make_reference(rng, 60000)
    truth = plant_snps(rng, ref, n_het=4, n_hom=0, min_gap=12000)
    path = str(tmp_path / "big.bam")
    simulate_bam(path, rng, ref, truth, n_reads=500, read_len=3000,
                 err_rate=0.01)
    bai_path = build_bai(path)
    assert bai_path == path + ".bai"
    full = BamFile(path)
    for (s, e) in [(1000, 9000), (30000, 34000), (55000, 59999)]:
        win = BamFile(path, region=("chrS", s, e))
        fsel = np.flatnonzero((full.ref_end > s) & (full.pos < e)
                              & (full.ref_id == 0))
        wsel = np.flatnonzero((win.ref_end > s) & (win.pos < e)
                              & (win.ref_id == 0))
        assert len(fsel) == len(wsel), (s, e)
        fq = {full.read(int(i)).qname for i in fsel}
        wq = {win.read(int(j)).qname for j in wsel}
        assert fq == wq
    # windowed image strictly smaller than the whole stream
    win = BamFile(path, region=("chrS", 1000, 9000))
    assert len(win._data) < len(full._data)


def test_windowed_load_empty_and_missing(tmp_path, rng):
    ref = make_reference(rng, 30000)
    truth = plant_snps(rng, ref, n_het=2, n_hom=0, min_gap=9000)
    path = str(tmp_path / "w.bam")
    # reads only in the first ~12kb
    simulate_bam(path, rng, ref[:12000], truth, n_reads=40, read_len=2000,
                 err_rate=0.01)
    build_bai(path)
    win = BamFile(path, region=("chrS", 20000, 25000))
    assert win.n_records == 0            # no chunks → empty, references kept
    assert win.references == ["chrS"]
    missing = BamFile(path, region=("chrNOPE", 0, 100))
    assert missing.n_records == 0
    # without a .bai the region argument falls back to a full load
    import os
    os.rename(path + ".bai", path + ".bai.hidden")
    full = BamFile(path, region=("chrS", 20000, 25000))
    assert full.n_records == 40


def test_build_bai_rejects_unsorted(tmp_path, rng):
    from longcallr_tpu.io.bam import BamWriter
    path = str(tmp_path / "unsorted.bam")
    w = BamWriter(path, references=["c1"], lengths=[10000])
    cig = np.asarray([(50 << 4) | 0], dtype=np.uint32)
    for pos in (5000, 100):              # descending → not coordinate-sorted
        w.write_record(qname=f"r{pos}", flag=0, ref_id=0, pos=pos, mapq=60,
                       cigar=cig, seq=b"A" * 50,
                       qual=np.full(50, 30, np.uint8))
    w.close()
    with pytest.raises(ValueError, match="coordinate-sorted"):
        build_bai(path)


def test_build_bai_on_demo_matches_htslib_windowing(tmp_path):
    """Index the demo BAM with OUR writer; windowed loads through our index
    and through the real htslib index select the same records."""
    ours = build_bai(DEMO_BAM, out_path=str(tmp_path / "demo.bai"))
    chrom, s, e = DEMO_REGION
    win_h = BamFile(DEMO_BAM, region=(chrom, s, e))
    win_o = BamFile(DEMO_BAM, region=(chrom, s, e), bai_path=ours)
    qh = {win_h.read(i).qname for i in range(win_h.n_records)
          if win_h.ref_end[i] > s and win_h.pos[i] < e}
    qo = {win_o.read(i).qname for i in range(win_o.n_records)
          if win_o.ref_end[i] > s and win_o.pos[i] < e}
    assert qh and qh == qo


def test_region_beyond_contig(tmp_path, rng):
    """Out-of-contig regions: clean error past the end, clamp when
    straddling (htslib fetch semantics; previously a shape crash)."""
    from longcallr_tpu.tiles.pileup import build_pileup
    from longcallr_tpu.tiles.regions import Region
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=2, n_hom=0, min_gap=2500)
    path = str(tmp_path / "obo.bam")
    simulate_bam(path, rng, ref, truth, n_reads=30, read_len=2000,
                 err_rate=0.01)
    bam = BamFile(path)
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    with pytest.raises(ValueError, match="beyond the end"):
        build_pileup(bam, Region(chr="chrS", start=9000, end=9500), ref, cfg)
    pl = build_pileup(bam, Region(chr="chrS", start=7500, end=9000), ref, cfg)
    assert pl.length == pl.cnt.shape[0] == 8000 - 7500 + 1


def _merge_two_contigs(tmp_path, rng, name="twoc"):
    """Two simulated loci on two contigs in ONE coordinate-sorted BAM
    (+ two-contig FASTA + .bai)."""
    from longcallr_tpu.io.bam import BamWriter
    from longcallr_tpu.io.fasta import write_fasta

    parts = []
    for tag in ("A", "B"):
        ref = make_reference(rng, 9000)
        truth = plant_snps(rng, ref, n_het=5, n_hom=1, min_gap=1300)
        p = str(tmp_path / f"part{tag}.bam")
        simulate_bam(p, rng, ref, truth, n_reads=50, read_len=3000,
                     err_rate=0.01)
        parts.append((ref, p))
    bam_path = str(tmp_path / f"{name}.bam")
    refs = [f"chr{t}" for t in ("A", "B")]
    lens = [len(parts[0][0]), len(parts[1][0])]
    w = BamWriter(bam_path, references=refs, lengths=lens)
    for tid, (_, p) in enumerate(parts):
        src = BamFile(p)
        for i in range(src.n_records):
            r = src.read(i)
            w.write_record(qname=f"c{tid}_{r.qname}", flag=int(r.flag),
                           ref_id=tid, pos=int(r.pos), mapq=int(r.mapq),
                           cigar=r.cigar, seq=bytes(r.seq), qual=r.qual,
                           tags=r.aux_bytes())
    w.close()
    fa_path = str(tmp_path / f"{name}.fa")
    write_fasta(fa_path, {f"chr{t}": bytes(parts[i][0])
                          for i, t in enumerate(("A", "B"))})
    build_bai(bam_path)
    return bam_path, fa_path


def test_run_streaming_matches_run(tmp_path, rng):
    """--stream (per-contig BAI windows) produces the same VCF and the same
    HP/PS tags as the all-resident pipeline on a 2-contig BAM."""
    from longcallr_tpu.pipeline.caller import run, run_streaming
    bam_path, fa_path = _merge_two_contigs(tmp_path, rng)
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    full = run(bam_path, fa_path, str(tmp_path / "full"), cfg)
    stream = run_streaming(bam_path, fa_path, str(tmp_path / "stream"), cfg)
    assert stream.n_records == full.n_records > 0
    with open(full.vcf_path) as f:
        v_full = f.read()
    with open(stream.vcf_path) as f:
        v_stream = f.read()
    assert v_full == v_stream
    fb = BamFile(full.phased_bam_path)
    sb = BamFile(stream.phased_bam_path)
    assert fb.n_records == sb.n_records
    t_f = {fb.read(i).qname: (fb.read(i).get_tag("HP"),
                              fb.read(i).get_tag("PS"))
           for i in range(fb.n_records)}
    t_s = {sb.read(i).qname: (sb.read(i).get_tag("HP"),
                              sb.read(i).get_tag("PS"))
           for i in range(sb.n_records)}
    assert t_f == t_s
    # contig restriction drops the other contig entirely
    only_b = run_streaming(bam_path, fa_path, str(tmp_path / "onlyB"), cfg,
                           contigs=["chrB"])
    with open(only_b.vcf_path) as f:
        body = [l for l in f if not l.startswith("#")]
    assert body and all(l.split("\t")[0] == "chrB" for l in body)


def test_run_streaming_needs_bai(tmp_path, rng):
    from longcallr_tpu.pipeline.caller import run_streaming
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=2, n_hom=0, min_gap=2000)
    p = str(tmp_path / "nobai.bam")
    simulate_bam(p, rng, ref, truth, n_reads=20, read_len=2500, err_rate=0.01)
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    with pytest.raises(ValueError, match="needs a BAM index"):
        run_streaming(p, p.replace(".bam", ".fa"), str(tmp_path / "x"), cfg)


def test_run_streaming_with_input_vcf_and_annotation(tmp_path, rng):
    """--stream composes with -v (input candidates) and -a/--exon-only,
    matching the resident pipeline byte-for-byte."""
    from longcallr_tpu.pipeline.caller import run, run_streaming
    bam_path, fa_path = _merge_two_contigs(tmp_path, rng, name="sva")
    cfg = preset("hifi-masseq").replace(min_read_length=100)

    # input-VCF mode: feed the discovery run's calls back as candidates
    disc = run(bam_path, fa_path, str(tmp_path / "disc"), cfg)
    full_v = run(bam_path, fa_path, str(tmp_path / "fullv"), cfg,
                 input_vcf=disc.vcf_path)
    strm_v = run_streaming(bam_path, fa_path, str(tmp_path / "strmv"), cfg,
                           input_vcf=disc.vcf_path)
    assert open(full_v.vcf_path).read() == open(strm_v.vcf_path).read()
    assert full_v.n_records == strm_v.n_records > 0

    # exon-only mode: genes covering both loci on both contigs
    anno = str(tmp_path / "sva.gtf")
    with open(anno, "w") as f:
        for chrom in ("chrA", "chrB"):
            f.write(f'{chrom}\tsrc\tgene\t1\t9000\t.\t+\t.\tgene_id "g{chrom}";\n')
            f.write(f'{chrom}\tsrc\tCDS\t1\t9000\t.\t+\t.\tgene_id "g{chrom}";\n')
    cfg_eo = cfg.replace(exon_only=True)
    full_a = run(bam_path, fa_path, str(tmp_path / "fulla"), cfg_eo,
                 anno_path=anno)
    strm_a = run_streaming(bam_path, fa_path, str(tmp_path / "strma"),
                           cfg_eo, anno_path=anno)
    assert open(full_a.vcf_path).read() == open(strm_a.vcf_path).read()


def test_run_streaming_resume(tmp_path, rng):
    """--stream --resume: a rerun skips completed regions via the region
    checkpoint and produces identical outputs."""
    from longcallr_tpu.pipeline.caller import run_streaming
    bam_path, fa_path = _merge_two_contigs(tmp_path, rng, name="sr")
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    out1 = run_streaming(bam_path, fa_path, str(tmp_path / "sr"), cfg,
                         resume=True)
    ckpt = tmp_path / "sr.regions.ckpt"
    assert ckpt.exists()
    n_lines = len(ckpt.read_text().splitlines())
    assert n_lines == out1.n_regions + 1  # +1: config-key header
    out2 = run_streaming(bam_path, fa_path, str(tmp_path / "sr"), cfg,
                         resume=True)
    with open(out1.vcf_path) as f:
        v1 = f.read()
    with open(out2.vcf_path) as f:
        v2 = f.read()
    assert v1 == v2 and out2.n_records == out1.n_records
    # checkpoint not regrown: completed regions were skipped, not re-put
    assert len(ckpt.read_text().splitlines()) == n_lines


def test_truncated_bai_falls_back_to_full_load(tmp_path, rng):
    """A truncated/partially-written .bai must raise ValueError from
    BaiIndex.load (not position-dependent struct.error/IndexError), so the
    windowed loader's documented fallback — a full load — engages."""
    ref = make_reference(rng, 40000)
    truth = plant_snps(rng, ref, n_het=3, n_hom=0, min_gap=9000)
    path = str(tmp_path / "tr.bam")
    simulate_bam(path, rng, ref, truth, n_reads=300, read_len=3000,
                 err_rate=0.01)
    bai_path = build_bai(path)
    good = open(bai_path, "rb").read()
    for cut in range(5, len(good), max(1, len(good) // 23)):
        with open(bai_path, "wb") as f:
            f.write(good[:cut])
        with pytest.raises(ValueError):
            BaiIndex.load(bai_path)
        win = BamFile(path, region=("chrS", 1000, 9000))  # full-load fallback
        assert win.n_records == BamFile(path).n_records


def test_bgzf_truncated_headers_raise_bgzf_error():
    """_block_size_at on a buffer cut inside a block header must raise the
    BgzfTruncated subclass (grow/stop signal), never struct.error or
    IndexError — every prefix length of a real stream parses or raises a
    BgzfError."""
    import zlib

    from longcallr_tpu.io.bgzf import (BgzfError, BgzfTruncated,
                                       _block_size_at, compress_block)
    block = compress_block(b"x" * 1000, 6)
    for cut in range(0, len(block)):
        try:
            _block_size_at(block[:cut], 0)
        except BgzfTruncated:
            assert cut < 12 + 6  # header+xlen region only
        except BgzfError:
            pass                 # structurally invalid (short magic)
        # anything else (struct.error, IndexError) fails the test
    assert _block_size_at(block, 0) == len(block)


def test_bam_writer_double_close(tmp_path):
    """Explicit close + with-block __exit__ must be a no-op second close:
    no duplicate EOF block, no write to a closed file."""
    from longcallr_tpu.io.bam import BamWriter
    from longcallr_tpu.io.bgzf import BGZF_EOF

    path = str(tmp_path / "dc.bam")
    with BamWriter(path, ["c"], [100]) as w:
        w.write_record(qname="r", flag=0, ref_id=0, pos=1, mapq=60,
                       cigar=np.array([(5 << 4)], np.uint32), seq=b"ACGTA",
                       qual=np.full(5, 30))
        w.close()                       # first close inside the with-block
    data = open(path, "rb").read()
    assert data.endswith(BGZF_EOF)
    assert not data[:-len(BGZF_EOF)].endswith(BGZF_EOF)  # exactly one EOF
    assert BamFile(path).n_records == 1


def test_build_bai_placed_unmapped_record(tmp_path, rng):
    """A placed-unmapped record (RNAME set, POS=-1) must not corrupt the
    linear index (it used to negative-index the last window)."""
    from longcallr_tpu.io.bam import BamWriter

    ref = make_reference(rng, 50000)
    path = str(tmp_path / "pu.bam")
    with BamWriter(path, ["chrS"], [len(ref)]) as w:
        # placed-unmapped first (pos -1 sorts before every mapped record)
        w.write_record(qname="u", flag=4, ref_id=0, pos=-1, mapq=0,
                       cigar=np.zeros(0, np.uint32), seq=b"ACGT",
                       qual=np.full(4, 30))
        for i, pos in enumerate(range(1000, 41000, 200)):
            w.write_record(qname=f"r{i}", flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=np.array([(3000 << 4)], np.uint32),
                           seq=bytes(ref[pos:pos + 3000]),
                           qual=np.full(3000, 30))
    build_bai(path)
    full = BamFile(path)
    win = BamFile(path, region=("chrS", 30000, 40000))
    fsel = np.flatnonzero((full.ref_end > 30000) & (full.pos < 40000)
                          & (full.pos >= 0) & (full.ref_id == 0))
    wsel = np.flatnonzero((win.ref_end > 30000) & (win.pos < 40000)
                          & (win.pos >= 0) & (win.ref_id == 0))
    assert len(fsel) == len(wsel) > 0


def test_bai_2pow29_limits():
    """build_bai refuses coordinates past the BAI 2^29 limit (samtools
    requires CSI there); chunk_span clamps oversized queries so an
    htslib metadata pseudo-bin (37450) can never enter the chunk merge."""
    from longcallr_tpu.io.bai import _MAX_COORD, _reg2bin_vec

    # chunk_span with a synthetic index carrying the htslib pseudo-bin:
    # the count payloads (huge voffs) must not leak into the span
    bins = [{4681: np.array([[100 << 16, 200 << 16]], np.uint64),
             37450: np.array([[(1 << 60), (1 << 62)]], np.uint64)}]
    idx = BaiIndex(bins, [np.zeros(1, np.uint64)])
    span = idx.chunk_span(0, 0, 10 ** 10)      # query far past 2^29
    assert span == (100 << 16, 200 << 16)
    # vectorized binning is exactly the scalar formula
    rng2 = np.random.default_rng(7)
    begs = rng2.integers(0, _MAX_COORD - 2, 2000)
    ends = begs + rng2.integers(1, 100000, 2000)
    np.clip(ends, None, _MAX_COORD, out=ends)
    want = np.array([reg2bin(int(b), int(e)) for b, e in zip(begs, ends)])
    got = _reg2bin_vec(begs.astype(np.int64), ends.astype(np.int64))
    assert np.array_equal(got, want)


def test_build_bai_refuses_past_2pow29(tmp_path):
    from longcallr_tpu.io.bam import BamWriter

    path = str(tmp_path / "huge.bam")
    with BamWriter(path, ["big"], [(1 << 29) + 10_000]) as w:
        w.write_record(qname="r", flag=0, ref_id=0, pos=(1 << 29) - 100,
                       mapq=60, cigar=np.array([(3000 << 4)], np.uint32),
                       seq=b"A" * 3000, qual=np.full(3000, 30))
    with pytest.raises(ValueError, match="2\\^29"):
        build_bai(path)
