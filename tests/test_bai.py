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
