"""Pileup engine: vectorized implementation vs the scalar oracle (a literal
transcription of util.rs:621-949), on synthetic reads and on the demo BAM."""

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.tiles.pileup import build_pileup
from longcallr_tpu.tiles.regions import (Region, extract_isolated_regions_parallel,
                                         read_qc_mask)

from oracle_pileup import scalar_pileup
from simulate import make_reference, plant_snps, simulate_bam


def _assert_tensors_equal(a, b):
    for name in ("cnt", "n_intron", "n_del", "n_ins", "fwd", "bwd",
                 "strands", "ts", "bq_pass"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=name)
    for name in ("s_err", "s_1merr"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name), err_msg=name)


@pytest.mark.parametrize("preset_name", ["hifi-masseq", "ont-cdna"])
@pytest.mark.parametrize("with_introns,softclip", [(False, 0), (True, 7)])
def test_pileup_matches_oracle(tmp_path, rng, preset_name, with_introns, softclip):
    cfg = preset(preset_name).replace(min_read_length=100)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref)
    path = str(tmp_path / "sim.bam")
    simulate_bam(path, rng, ref, truth, n_reads=50, read_len=2500,
                 err_rate=0.02, with_introns=with_introns, softclip=softclip)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    got = build_pileup(bam, region, ref, cfg)
    want = scalar_pileup(bam, region, ref, cfg)
    _assert_tensors_equal(got, want)
    assert got.cnt.sum() > 0


def test_pileup_window_clipping(tmp_path, rng):
    """Sub-regions (window smaller than read span) must clip identically."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 4000)
    truth = plant_snps(rng, ref, n_het=5, n_hom=2)
    path = str(tmp_path / "simw.bam")
    simulate_bam(path, rng, ref, truth, n_reads=40, read_len=1500,
                 err_rate=0.02, with_introns=True)
    bam = BamFile(path)
    for (s, e) in [(1000, 1600), (1, 350), (3500, 4001), (1999, 2001)]:
        region = Region(chr="chrS", start=s, end=e)
        got = build_pileup(bam, region, ref, cfg)
        want = scalar_pileup(bam, region, ref, cfg)
        _assert_tensors_equal(got, want)


def test_pileup_polya_masking(tmp_path, rng):
    """A poly-A run near a read end must be masked on HiFi."""
    cfg = preset("hifi-masseq").replace(min_read_length=10,
                                        distance_to_read_end=40,
                                        polya_tail_length=5)
    # reference has C's; read carries an A-homopolymer near its end
    ref = np.frombuffer(b"C" * 200, dtype=np.uint8).copy()
    from longcallr_tpu.io import bam as bamio
    path = str(tmp_path / "pa.bam")
    seq = b"C" * 150 + b"A" * 20 + b"C" * 30
    with bamio.BamWriter(path, ["chrS"], [200]) as w:
        w.write_record(qname="r", flag=0, ref_id=0, pos=0, mapq=60,
                       cigar=bamio.encode_cigar([(200, "M")]), seq=seq,
                       qual=np.full(200, 30), tags=b"")
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=201)
    got = build_pileup(bam, region, ref, cfg)
    want = scalar_pileup(bam, region, ref, cfg)
    _assert_tensors_equal(got, want)
    # A-run columns within distance_to_read_end of the end (qpos>=161) masked
    assert got.cnt[161:170].sum() == 0
    # A-run columns outside the near-end zone are NOT masked (qpos 150..160)
    assert got.cnt[150:161, 0].sum() == 11
    # mid-read columns far from the end are kept
    assert got.cnt[100, 1] == 1  # C at column 100


def test_region_discovery(tmp_path, rng):
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 5000)
    truth = plant_snps(rng, ref, n_het=3, n_hom=1)
    from longcallr_tpu.io import bam as bamio
    path = str(tmp_path / "rd.bam")
    # two clusters of reads with a gap between
    reads = [(100, 700), (300, 1100), (2000, 2600), (2100, 3000)]
    with bamio.BamWriter(path, ["chrS"], [len(ref)]) as w:
        for i, (s, e) in enumerate(reads):
            ln = e - s
            w.write_record(qname=f"r{i}", flag=0, ref_id=0, pos=s, mapq=60,
                           cigar=bamio.encode_cigar([(ln, "M")]),
                           seq=bytes(ref[s:e]), qual=np.full(ln, 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    bam = BamFile(path)
    regs = extract_isolated_regions_parallel(bam, [("chrS", len(ref))], cfg)
    assert [(r.start, r.end, r.max_coverage) for r in regs] == [
        (101, 1101, 2),  # run [100,1100] 0-based → (101, 1102)? see below
        (2001, 3001, 2),
    ] or len(regs) == 2
    # exact boundary semantics: run covers 0-based [100, 1099] (end exclusive
    # 1100), so start=101, end=1101
    assert regs[0].start == 101 and regs[0].end == 1101
    assert regs[1].start == 2001 and regs[1].end == 3001
    assert regs[0].max_coverage == 2 and regs[1].max_coverage == 2


def test_region_discovery_single_column_run(tmp_path):
    """Single-column depth runs are skipped but their depth folds into the
    next region's max_coverage (util.rs:290-318)."""
    from longcallr_tpu.io import bam as bamio
    cfg = preset("hifi-masseq").replace(min_read_length=1)
    path = str(tmp_path / "sc.bam")
    with bamio.BamWriter(path, ["chrS"], [100]) as w:
        # 5 reads covering only column 10 (single-column run, depth 5)
        for i in range(5):
            w.write_record(qname=f"s{i}", flag=0, ref_id=0, pos=10, mapq=60,
                           cigar=bamio.encode_cigar([(1, "M")]), seq=b"A",
                           qual=np.array([30]))
        # then a 2-column run at 20-21, depth 1
        w.write_record(qname="t", flag=0, ref_id=0, pos=20, mapq=60,
                       cigar=bamio.encode_cigar([(2, "M")]), seq=b"AA",
                       qual=np.array([30, 30]))
    bam = BamFile(path)
    regs = extract_isolated_regions_parallel(bam, [("chrS", 100)], cfg)
    assert len(regs) == 1
    assert (regs[0].start, regs[0].end) == (21, 23)
    assert regs[0].max_coverage == 5  # carried from the skipped run


def test_demo_pileup_oracle(demo_bam_path, rng):
    """Vectorized pileup equals the scalar oracle on a real demo region,
    using a consensus pseudo-reference (chr20.fa is not vendored)."""
    cfg = preset("hifi-masseq")
    bam = BamFile(demo_bam_path)
    regs = extract_isolated_regions_parallel(bam, [("chr20", 64_444_167)], cfg)
    assert len(regs) > 0
    reg = max(regs, key=lambda r: r.length)
    # consensus pseudo-reference over this window only
    sub = Region(chr="chr20", start=reg.start, end=min(reg.end, reg.start + 3000))
    ref = np.full(64_444_167, ord("N"), dtype=np.uint8)
    tmp = build_pileup(bam, sub, ref, cfg)
    cons = np.frombuffer(b"ACGT", dtype=np.uint8)[np.argmax(tmp.cnt, axis=1)]
    cons[tmp.cnt.sum(axis=1) == 0] = ord("N")
    ref[sub.start - 1: sub.end - 1] = cons
    got = build_pileup(bam, sub, ref, cfg)
    want = scalar_pileup(bam, sub, ref, cfg)
    _assert_tensors_equal(got, want)
    assert got.cnt.sum() > 100


def test_region_discovery_truncation(tmp_path, rng):
    """--truncation: columns deeper than truncation_coverage break regions
    (util.rs:290-318); the break column's depth still folds into the
    running max before the emit check."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 3000)
    from longcallr_tpu.io import bam as bamio
    path = str(tmp_path / "tr.bam")
    # depth profile: [100,400)=2, [400,900)=6, [900,1200)=4
    reads = [(100, 900)] * 2 + [(400, 1200)] * 4
    with bamio.BamWriter(path, ["chrS"], [len(ref)]) as w:
        for i, (s, e) in enumerate(reads):
            ln = e - s
            w.write_record(qname=f"r{i}", flag=0, ref_id=0, pos=s, mapq=60,
                           cigar=bamio.encode_cigar([(ln, "M")]),
                           seq=bytes(ref[s:e]), qual=np.full(ln, 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    bam = BamFile(path)
    plain = extract_isolated_regions_parallel(bam, [("chrS", len(ref))], cfg)
    assert [(r.start, r.end) for r in plain] == [(101, 1201)]
    assert plain[0].max_coverage == 6
    tr = extract_isolated_regions_parallel(
        bam, [("chrS", len(ref))],
        cfg.replace(truncation=True, truncation_coverage=3))
    # deep columns [400,1200) dropped: only the shallow prefix survives
    assert [(r.start, r.end) for r in tr] == [(101, 401)]


@pytest.mark.parametrize("preset_name", ["hifi-masseq", "ont-cdna"])
def test_pileup_run_dense_near_ends_matches_oracle(tmp_path, rng, preset_name):
    """Adversarial workload for the near-read-end poly-A/homopolymer scan
    (native UniZone tables + numpy _homopoly_near vs the scalar rescan):
    a two-letter alphabet makes uniform windows dense near read ends, and
    soft clips + introns shift the near zones through lead_sc/boundary_end.
    Native and numpy must match the scalar oracle bit-exactly."""
    from longcallr_tpu.io import bam as bamio

    cfg = preset(preset_name).replace(min_read_length=50,
                                      distance_to_read_end=40)
    n = 2600
    # reference drawn from {A, C} with long runs: ~every uniform window
    # class (all-A matching ref, all-A mismatching, all-C) occurs
    runs = []
    while sum(len(r) for r in runs) < n:
        runs.append(bytes([int(rng.choice([65, 67]))]) *
                    int(rng.integers(1, 12)))
    ref = np.frombuffer(b"".join(runs)[:n], dtype=np.uint8).copy()
    path = str(tmp_path / "rd.bam")
    with bamio.BamWriter(path, ["chrS"], [n]) as w:
        for i in range(40):
            pos = int(rng.integers(0, n - 800))
            sc = int(rng.integers(0, 3)) * 5
            mid = 700
            seq = bytearray(rng.integers(0, 2, size=sc).astype(np.uint8) * 2 + 65)
            ops = [(sc, "S")] if sc else []
            # body with occasional D/I/N breaking the M ops
            left = mid
            p = pos
            while left > 0:
                ln = min(left, int(rng.integers(60, 200)), n - p)
                if ln <= 0:
                    break
                body = ref[p:p + ln].copy()
                # sprinkle errors biased toward runs (A<->C flips)
                errs = rng.random(ln) < 0.08
                body[errs] = 65 + 67 - body[errs]
                seq += bytes(body)
                ops.append((ln, "M"))
                p += ln
                left -= ln
                if left > 0:
                    kind = int(rng.integers(0, 3))
                    if kind == 0:
                        dl = int(rng.integers(1, 4))
                        ops.append((dl, "D")); p += dl
                    elif kind == 1:
                        il = int(rng.integers(1, 4))
                        seq += bytes([65] * il)   # poly-A insertion
                        ops.append((il, "I"))
                    else:
                        nl = int(rng.integers(5, 30))
                        ops.append((nl, "N")); p += nl
            if sc:
                seq += bytes([65] * sc)           # poly-A tail clip
                ops.append((sc, "S"))
            quals = rng.integers(10, 31, size=len(seq)).astype(np.uint8)
            w.write_record(qname=f"r{i}", flag=0 if i % 2 else 16, ref_id=0,
                           pos=pos, mapq=60,
                           cigar=bamio.encode_cigar(ops), seq=bytes(seq),
                           qual=quals, tags=bamio.make_tag_bytes("de", "f", 0.01))
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=n + 1)
    nat = build_pileup(bam, region, ref, cfg, use_native=True)
    npy = build_pileup(bam, region, ref, cfg, use_native=False)
    want = scalar_pileup(bam, region, ref, cfg)
    _assert_tensors_equal(nat, want)
    _assert_tensors_equal(npy, want)
    assert nat.cnt.sum() > 0


@pytest.mark.parametrize("L", [0, -1, -2])
def test_pileup_degenerate_polya_len_matches_oracle(tmp_path, rng, L):
    """--polya-tail-length accepts any int: for L in {0, -1} the scalar t0
    loop trivially reaches the threshold (every near base masked); for
    L < -1 the loop is empty (no base ever masked). Both the native path
    (UniZone guard) and the vectorised numpy form (_homopoly_near) must
    keep both degenerate semantics bit-exactly."""
    cfg = preset("hifi-masseq").replace(min_read_length=10,
                                        distance_to_read_end=40,
                                        polya_tail_length=L)
    ref = np.frombuffer(b"C" * 200, dtype=np.uint8).copy()
    from longcallr_tpu.io import bam as bamio
    path = str(tmp_path / f"dg{L}.bam")
    seq = b"C" * 150 + b"A" * 20 + b"C" * 30
    with bamio.BamWriter(path, ["chrS"], [200]) as w:
        w.write_record(qname="r", flag=0, ref_id=0, pos=0, mapq=60,
                       cigar=bamio.encode_cigar([(200, "M")]), seq=seq,
                       qual=np.full(200, 30), tags=b"")
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=201)
    want = scalar_pileup(bam, region, ref, cfg)
    for use_native in (True, False):
        got = build_pileup(bam, region, ref, cfg, use_native=use_native)
        _assert_tensors_equal(got, want)
        if L >= -1:
            assert got.cnt[:40].sum() == 0   # near-head bases all masked
        else:
            assert got.cnt[:40].sum() > 0    # empty scan: nothing masked
