"""Native C++ decoders must produce bit-identical results to the numpy
reference implementations."""

import numpy as np
import pytest

from longcallr_tpu import native
from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.ops.candidates import select_candidates
from longcallr_tpu.phasing.fragments import get_fragments
from longcallr_tpu.tiles.pileup import build_pileup
from longcallr_tpu.tiles.regions import Region

from simulate import make_reference, plant_snps, simulate_bam

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


def _cmp_pileup(a, b):
    for name in ("cnt", "n_intron", "n_del", "n_ins", "fwd", "bwd",
                 "strands", "ts", "bq_pass", "s_err", "s_1merr"):
        np.testing.assert_array_equal(getattr(a, name), getattr(b, name),
                                      err_msg=name)


@pytest.mark.parametrize("preset_name", ["hifi-masseq", "ont-cdna"])
def test_native_pileup_equals_numpy(tmp_path, rng, preset_name):
    cfg = preset(preset_name).replace(min_read_length=100)
    ref = make_reference(rng, 5000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=2)
    path = str(tmp_path / "n.bam")
    simulate_bam(path, rng, ref, truth, n_reads=60, read_len=2200,
                 err_rate=0.02, with_introns=True, softclip=5)
    bam = BamFile(path)
    for (s, e) in [(1, len(ref) + 1), (1200, 2600)]:
        region = Region(chr="chrS", start=s, end=e)
        a = build_pileup(bam, region, ref, cfg, use_native=True)
        b = build_pileup(bam, region, ref, cfg, use_native=False)
        _cmp_pileup(a, b)


def test_native_fragments_equal_numpy(tmp_path, rng):
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=2)
    path = str(tmp_path / "nf.bam")
    simulate_bam(path, rng, ref, truth, n_reads=70, read_len=2500,
                 err_rate=0.02, with_introns=True)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    fa = get_fragments(bam, region, cands, cfg, use_native=True)
    fb = get_fragments(bam, region, cands, cfg, use_native=False)
    assert fa.qnames == fb.qnames
    np.testing.assert_array_equal(fa.p, fb.p)
    np.testing.assert_array_equal(fa.baseq, fb.baseq)
    np.testing.assert_array_equal(fa.num_hete_links, fb.num_hete_links)
    assert set(fa.ld_counts) == set(fb.ld_counts)
    for k in fa.ld_counts:
        np.testing.assert_array_equal(fa.ld_counts[k], fb.ld_counts[k])


def test_native_demo_region(demo_bam_path):
    """Native vs numpy on real reads (consensus ref over the demo locus)."""
    import os
    cfg = preset("hifi-masseq")
    bam = BamFile(demo_bam_path)
    from longcallr_tpu.tiles.regions import extract_isolated_regions_parallel
    regs = extract_isolated_regions_parallel(bam, [("chr20", 64_444_167)], cfg)
    reg = regs[0]
    sub = Region(chr="chr20", start=reg.start, end=min(reg.end, reg.start + 4000))
    ref = np.full(64_444_167, ord("N"), dtype=np.uint8)
    tmp = build_pileup(bam, sub, ref, cfg, use_native=False)
    cons = np.frombuffer(b"ACGT", dtype=np.uint8)[np.argmax(tmp.cnt, axis=1)]
    cons[tmp.cnt.sum(axis=1) == 0] = ord("N")
    ref[sub.start - 1: sub.end - 1] = cons
    a = build_pileup(bam, sub, ref, cfg, use_native=True)
    b = build_pileup(bam, sub, ref, cfg, use_native=False)
    _cmp_pileup(a, b)


def test_native_pileup_mt_matches_serial(tmp_path, rng, monkeypatch):
    """Chunk-parallel pileup: int tensors exactly equal the serial fill,
    f64 log-qual sums within reassociation tolerance, and the result is
    identical for every thread count (fixed 16-chunk in-order reduction)."""
    if not native.available() or not hasattr(native.lib(), "pileup_fill_mt"):
        pytest.skip("native mt not available")
    from longcallr_tpu.tiles import pileup as PL
    cfg = preset("hifi-masseq").replace(min_read_length=100, threads=4)
    ref = make_reference(rng, 12000)
    truth = plant_snps(rng, ref, n_het=6, n_hom=1, min_gap=1500)
    path = str(tmp_path / "mt.bam")
    simulate_bam(path, rng, ref, truth, n_reads=300, read_len=3000,
                 err_rate=0.01)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    serial = build_pileup(bam, region, ref, cfg.replace(threads=1))
    monkeypatch.setattr(PL, "PILEUP_MT_MIN", 1)
    outs = {}
    for th in (2, 4, 7):
        outs[th] = build_pileup(bam, region, ref, cfg.replace(threads=th))
    for th, mt in outs.items():
        for f in ("cnt", "n_intron", "n_del", "n_ins", "fwd", "bwd",
                  "strands", "ts", "bq_pass"):
            np.testing.assert_array_equal(getattr(mt, f), getattr(serial, f),
                                          err_msg=f"{f}@t{th}")
        np.testing.assert_allclose(mt.s_err, serial.s_err, rtol=1e-12,
                                   err_msg=f"s_err@t{th}")
        np.testing.assert_allclose(mt.s_1merr, serial.s_1merr, rtol=1e-12,
                                   err_msg=f"s_1merr@t{th}")
    # thread-count invariance must be EXACT (same chunking, same order)
    for f in ("s_err", "s_1merr"):
        np.testing.assert_array_equal(getattr(outs[2], f),
                                      getattr(outs[4], f), err_msg=f)
        np.testing.assert_array_equal(getattr(outs[4], f),
                                      getattr(outs[7], f), err_msg=f)


def test_native_bgzf_deflate_identical(rng):
    """bgzf_deflate_many emits valid BGZF blocks with the compress_block
    framing, with per-chunk fallback for incompressible payloads. The zlib
    build is byte-identical to the Python path; the libdeflate build (like
    htslib's) produces different deflate bytes, checked by round-trip + CRC
    instead."""
    from longcallr_tpu.io import bgzf

    nlib = native.lib()
    libdeflate = bool(getattr(nlib, "bgzf_native_backend", lambda: 0)())
    chunks = [
        rng.integers(0, 4, size=65536, dtype=np.uint8).tobytes(),  # text-ish
        bytes(65536),                                              # zeros
        rng.integers(0, 256, size=65536, dtype=np.uint8).tobytes(),  # random
        rng.integers(0, 256, size=1000, dtype=np.uint8).tobytes(),   # short
        b"ACGT" * 16384,                                            # repetitive
    ]
    for level in (1, 6, 9):
        got = bgzf._compress_chunks_native(chunks, level, threads=3)
        assert got is not None
        if not libdeflate:
            want = [bgzf.compress_block(c, level) for c in chunks]
            assert [bytes(g) for g in got] == want, f"level {level}"
        # every block parses (BSIZE subfield) and round-trips with CRC checks
        data = b"".join(bytes(g) for g in got) + bgzf.BGZF_EOF
        spans = list(bgzf.iter_block_spans(data))
        assert sum(b for _, b in spans) == len(data)
        parts = [bgzf.decompress_block(data, o, b, check_crc=True)
                 for o, b in spans]
        assert b"".join(parts) == b"".join(chunks), f"level {level}"


def test_ld_dense_equals_pair_loop(tmp_path, rng, monkeypatch):
    """The dense Gram-matmul LD tables equal the per-read pair-key loop
    (the giant-I fallback path)."""
    from longcallr_tpu.phasing import fragments as F

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=2)
    path = str(tmp_path / "ld.bam")
    simulate_bam(path, rng, ref, truth, n_reads=70, read_len=2500,
                 err_rate=0.02, with_introns=True)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    fd = get_fragments(bam, region, cands, cfg)
    monkeypatch.setattr(F, "LD_DENSE_MAX_I", 0)    # force the pair loop
    fl = get_fragments(bam, region, cands, cfg)
    assert set(fd.ld_counts) == set(fl.ld_counts)
    assert fd.ld_counts, "fixture produced no LD pairs"
    for k in fd.ld_counts:
        np.testing.assert_array_equal(fd.ld_counts[k], fl.ld_counts[k], err_msg=str(k))


def test_ld_popcount_equals_dense(rng):
    """The bit-packed popcount LD kernel (native ld_pair_counts) emits
    exactly the dense Gram-matmul builder's tables — integer counts, so
    equality is exact — across ragged shapes, sparse coverage bands, and
    column subsets."""
    from longcallr_tpu import native
    from longcallr_tpu.phasing.fragments import (_ld_counts_dense,
                                                 _ld_counts_native)

    nlib = native.lib()
    if nlib is None or not hasattr(nlib, "ld_pair_counts"):
        import pytest
        pytest.skip("native library unavailable")
    for _ in range(5):
        K = int(rng.integers(1, 3000))
        I = int(rng.integers(2, 400))
        P = rng.choice(np.array([-1, 0, 0, 1], np.int8), size=(K, I))
        # banded coverage (coordinate-sorted reads → contiguous column spans)
        if K > 10:
            for k in range(K):
                c0 = (k * I) // K
                P[k, :max(0, c0 - 30)] = 0
                P[k, min(I, c0 + 30):] = 0
        ld_cols = rng.random(I) < 0.7
        d = _ld_counts_dense(P, ld_cols)
        n = _ld_counts_native(nlib, P, ld_cols, 3)
        assert set(d) == set(n)
        for k in d:
            np.testing.assert_array_equal(d[k], n[k], err_msg=str(k))


def test_write_tagged_records_native_equals_fallback(tmp_path, rng, monkeypatch):
    """bam_emit_tagged produces the same records as the per-read Python
    writer loop (HP only when nonzero, PS when present)."""
    from longcallr_tpu.io import bam as B

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 4000)
    truth = plant_snps(rng, ref, n_het=4, n_hom=1)
    src = str(tmp_path / "src.bam")
    simulate_bam(src, rng, ref, truth, n_reads=40, read_len=1500,
                 err_rate=0.02)
    bam = BamFile(src)
    ridxs = list(range(bam.n_records))
    qn = bam.qnames_at(ridxs)
    assignments = {q: int(rng.integers(0, 3)) for q in qn[::2]}
    phasesets = {q: int(rng.integers(1, 10000)) for q in qn[::3]}

    def emit(path, force_fallback):
        if force_fallback:
            monkeypatch.setattr(B, "make_tag_bytes", B.make_tag_bytes)
            import longcallr_tpu.native as N
            monkeypatch.setattr(N, "lib", lambda: None)
        else:
            monkeypatch.undo()
        with B.BamWriter(path, bam.references, bam.lengths,
                         header_text=bam.header_text) as w:
            B.write_tagged_records(bam, ridxs, assignments, phasesets, w)

    pa, pb = str(tmp_path / "a.bam"), str(tmp_path / "b.bam")
    emit(pa, False)
    emit(pb, True)
    a, b = BamFile(pa), BamFile(pb)
    assert a.n_records == b.n_records == len(ridxs)
    n_hp = n_ps = 0
    for i in range(a.n_records):
        ra, rb = a.read(i), b.read(i)
        assert ra.raw_record() == rb.raw_record(), i
        if assignments.get(ra.qname):
            assert ra.get_tag("HP") == assignments[ra.qname]
            n_hp += 1
        if ra.qname in phasesets:
            assert ra.get_tag("PS") == phasesets[ra.qname]
            n_ps += 1
    assert n_hp and n_ps


def test_native_pileup_mt_leading_insertion(tmp_path, rng, monkeypatch):
    """Regression: a read whose first aligned op is an insertion writes
    n_ins one column BELOW its start position; the span-restricted MT
    reduction must include that column."""
    from longcallr_tpu.io.bam import BamWriter
    from longcallr_tpu.tiles import pileup as PL

    ref = make_reference(rng, 3000)
    path = str(tmp_path / "li.bam")
    with BamWriter(path, ["chrS"], [len(ref)]) as w:
        for k in range(64):
            pos = 500 + 7 * k
            seq = ("ACG" + "".join(chr(c) for c in ref[pos:pos + 800]))
            qual = np.full(len(seq), 30, np.uint8)
            cigar = np.asarray([(3 << 4) | 1, (800 << 4) | 0], np.uint32)
            w.write_record(qname=f"r{k}", flag=0, ref_id=0, pos=pos,
                           mapq=60, cigar=cigar, seq=seq.encode(), qual=qual)
    bam = BamFile(path)
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    serial = build_pileup(bam, region, ref, cfg.replace(threads=1))
    assert serial.n_ins.sum() > 0, "fixture produced no leading insertions"
    monkeypatch.setattr(PL, "PILEUP_MT_MIN", 1)
    mt = build_pileup(bam, region, ref, cfg.replace(threads=4))
    np.testing.assert_array_equal(mt.n_ins, serial.n_ins)
    np.testing.assert_array_equal(mt.cnt, serial.cnt)


def test_native_fragments_mt_equals_serial(tmp_path, rng, monkeypatch):
    """fragment_cells_mt: identical flat outputs to the serial walk for
    several thread counts."""
    from longcallr_tpu.phasing import fragments as F

    nlib = native.lib()
    if not hasattr(nlib, "fragment_cells_mt"):
        pytest.skip("mt entry point unavailable")
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=12, n_hom=2)
    path = str(tmp_path / "fm.bam")
    simulate_bam(path, rng, ref, truth, n_reads=200, read_len=2500,
                 err_rate=0.02, with_introns=True)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    monkeypatch.setattr(F, "FRAG_MT_MIN", 1)
    serial = get_fragments(bam, region, cands, cfg.replace(threads=1))
    for th in (2, 4, 7):
        mt = get_fragments(bam, region, cands, cfg.replace(threads=th))
        np.testing.assert_array_equal(mt.p, serial.p, err_msg=f"t{th}")
        np.testing.assert_array_equal(mt.baseq, serial.baseq,
                                      err_msg=f"t{th}")
        np.testing.assert_array_equal(mt.num_hete_links,
                                      serial.num_hete_links)
        assert set(mt.ld_counts) == set(serial.ld_counts)
        for k in mt.ld_counts:
            np.testing.assert_array_equal(mt.ld_counts[k],
                                          serial.ld_counts[k])


def test_assign_hist_equals_gemm(rng, monkeypatch):
    """The assignment layer's native histogram kernels (assign_group_hist /
    assign_read_sums) agree with the GEMM formulation: integer count blocks
    exactly, f64 sums at reassociation tolerance, and full
    assign_reads_haplotype outputs (the decision logic compares q vs qn, so
    assignments must agree exactly on non-knife-edge fuzz inputs)."""
    import copy

    from longcallr_tpu.phasing import assign as A
    from longcallr_tpu.phasing.kernels import make_cell_tables_np
    from test_assign import _synth_large

    nlib = native.lib()
    if nlib is None or not hasattr(nlib, "assign_group_hist"):
        pytest.skip("native library unavailable")
    cfg = preset("hifi-masseq")
    for K, I in [(400, 3000), (37, 19), (1, 5), (1200, 150)]:
        frags, cands = _synth_large(rng, K=max(K, 2), I=max(I, 50))
        frags.p = frags.p[:K, :I].copy()
        frags.baseq = frags.baseq[:K, :I].copy()
        frags.cells_off = None  # re-derive CSR for the sliced matrices
        for name in ("num_hete_links", "for_phasing", "downsampled",
                     "haplotag", "assignment", "assignment_score"):
            setattr(frags, name, getattr(frags, name)[:K].copy())
        frags.qnames = frags.qnames[:K]
        ct = make_cell_tables_np(frags.p, frags.baseq)
        mask = rng.random(K) < 0.8
        monkeypatch.setenv("LONGCALLR_NATIVE_ASSIGN", "0")
        gs_gemm = A._group_sums(frags, ct, mask)
        monkeypatch.setenv("LONGCALLR_NATIVE_ASSIGN", "1")
        gs_nat = A._group_sums(frags, ct, mask)
        np.testing.assert_array_equal(gs_nat[:, 3 * I:], gs_gemm[:, 3 * I:])
        np.testing.assert_allclose(gs_nat, gs_gemm, rtol=1e-12, atol=1e-12)

        c1 = copy.deepcopy(cands)
        import dataclasses
        # slice candidate arrays to I columns
        for f in dataclasses.fields(c1):
            v = getattr(c1, f.name)
            if isinstance(v, np.ndarray) and v.shape[:1] == (cands.n,):
                setattr(c1, f.name, v[:I].copy())
        f1 = copy.deepcopy(frags)
        monkeypatch.setenv("LONGCALLR_NATIVE_ASSIGN", "0")
        r1 = A.assign_reads_haplotype(f1, copy.deepcopy(c1), cfg, ct, False)
        f2 = copy.deepcopy(frags)
        monkeypatch.setenv("LONGCALLR_NATIVE_ASSIGN", "1")
        r2 = A.assign_reads_haplotype(f2, copy.deepcopy(c1), cfg, ct, False)
        assert r1 == r2
        np.testing.assert_array_equal(f1.assignment, f2.assignment)
        np.testing.assert_array_equal(f1.haplotag, f2.haplotag)
        np.testing.assert_allclose(f1.assignment_score, f2.assignment_score,
                                   rtol=1e-12, atol=1e-12)


def test_assign_hist_q0_matches_scalar(rng, monkeypatch):
    """q=0 cells (err=1 → log10(1-err) = -inf): the histogram path must
    reproduce the reference's scalar-sum semantics — -inf exactly where a
    GATHERED read has a matched q=0 cell, finite elsewhere. (The GEMM
    formulation NaNs these columns through 0·(-inf) products of EXCLUDED
    rows — the histogram path is the more faithful one, so it is compared
    against a scalar loop, not the GEMM.)"""
    from longcallr_tpu.phasing import assign as A
    from longcallr_tpu.phasing.kernels import (LOG10_1MERR_T, LOG10_ERR_T,
                                               make_cell_tables_np)
    from test_assign import _synth_large

    nlib = native.lib()
    if nlib is None or not hasattr(nlib, "assign_group_hist"):
        pytest.skip("native library unavailable")
    K, I = 60, 60
    frags, _ = _synth_large(rng, K=K, I=200)
    frags.p = frags.p[:, :I].copy()
    frags.baseq = frags.baseq[:, :I].copy()
    sel = (frags.p != 0) & (rng.random((K, I)) < 0.1)
    frags.baseq[sel] = 0
    frags.cells_off = None
    ct = make_cell_tables_np(frags.p, frags.baseq)
    mask = rng.random(K) < 0.7
    monkeypatch.setenv("LONGCALLR_NATIVE_ASSIGN", "1")
    gs = A._group_sums(frags, ct, mask)
    sig, asg, p, q = frags.haplotag, frags.assignment, frags.p, frags.baseq
    groups = [mask & (sig == 1), mask & (sig == -1), mask & (sig == 0),
              mask & (asg == 1), mask & (asg == 2), mask]
    exp = np.zeros((6, 4 * I))
    for g, gm in enumerate(groups):
        for i in range(I):
            a = b = e = c = 0.0
            for k in np.nonzero(gm)[0]:
                if p[k, i] == 0:
                    continue
                l1, le = LOG10_1MERR_T[q[k, i]], LOG10_ERR_T[q[k, i]]
                a += l1 if p[k, i] > 0 else le
                b += l1 if p[k, i] < 0 else le
                e += le
                c += 1
            exp[g, [i, I + i, 2 * I + i, 3 * I + i]] = a, b, e, c
    fin = np.isfinite(exp)
    np.testing.assert_array_equal(np.isfinite(gs), fin)
    np.testing.assert_allclose(gs[fin], exp[fin], rtol=1e-9, atol=1e-12)
    np.testing.assert_array_equal(gs[~fin], exp[~fin])


def test_assign_hist_thread_invariant(rng):
    """assign_group_hist's multi-threaded split (private histograms merged
    by integer addition) is exactly thread-count-invariant."""
    import ctypes

    nlib = native.lib()
    if nlib is None or not hasattr(nlib, "assign_group_hist"):
        pytest.skip("native library unavailable")
    K, I, NQ = 700, 90, 31
    counts = rng.integers(0, 400, size=K)
    off = np.zeros(K + 1, np.int64)
    np.cumsum(counts, out=off[1:])
    nnz = int(off[-1])
    ci = rng.integers(0, I, size=nnz).astype(np.int32)
    cp = rng.choice(np.array([-1, 1], np.int8), size=nnz)
    cq = rng.integers(0, 31, size=nnz).astype(np.uint8)
    gcode = rng.choice(np.array([0xFF, 0, 1, 2, 5, 6, 9, 10], np.uint8),
                       size=K)

    def run(nt):
        H = np.zeros((6, I, 2, NQ), np.int32)
        nlib.assign_group_hist(
            K, I, off.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ci.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cp.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
            cq.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            gcode.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            NQ, H.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), nt)
        return H

    h1 = run(1)
    for nt in (2, 3, 4, 8):
        np.testing.assert_array_equal(run(nt), h1)
    assert h1.sum() >= nnz  # every cell lands in >= 1 group
