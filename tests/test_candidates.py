"""Candidate selection: fused JAX kernel vs scalar oracle transcription of
candidate.rs, plus truth-recall checks on simulated diploid data."""

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.ops import candidates as cand
from longcallr_tpu.tiles.pileup import build_pileup
from longcallr_tpu.tiles.regions import Region

from oracle_candidates import apply_dense_filters, scalar_candidates
from oracle_pileup import scalar_pileup
from simulate import make_reference, plant_snps, simulate_bam


def _compare(cs: cand.CandidateSet, oracle_out, oracle_idx):
    assert cs.n == len(oracle_out), (
        cs.pos.tolist(), [o["pos"] for o in oracle_out])
    for i, o in enumerate(oracle_out):
        assert cs.pos[i] == o["pos"]
        assert chr(cs.ref_base[i]) == o["reference"]
        assert (chr(cs.alleles[i, 0]), chr(cs.alleles[i, 1])) == o["alleles"]
        np.testing.assert_allclose(cs.allele_freqs[i], o["allele_freqs"], rtol=1e-6)
        assert cs.depth[i] == o["depth"]
        np.testing.assert_allclose(cs.variant_quality[i], o["variant_quality"],
                                   rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(cs.genotype_quality[i], o["genotype_quality"],
                                   rtol=1e-9, atol=1e-9)
        assert cs.variant_type[i] == o["variant_type"], (i, o)
        assert cs.genotype[i] == o["genotype"]
        assert bool(cs.rna_editing[i]) == o["rna_editing"]
        assert bool(cs.cand_somatic[i]) == o["cand_somatic"]
        assert bool(cs.dense[i]) == o["dense"], (i, o)
        assert bool(cs.hom_var[i]) == o["hom_var"]
        assert bool(cs.het_var[i]) == o["het_var"]
        assert bool(cs.for_phasing[i]) == o["for_phasing"]
    assert cs.idx_of("het").tolist() == [
        i for i in oracle_idx["het"] if not oracle_out[i]["dense"]]
    assert cs.idx_of("hom").tolist() == [
        i for i in oracle_idx["hom"] if not oracle_out[i]["dense"]]
    assert cs.idx_of("edit").tolist() == oracle_idx["edit"]
    assert cs.idx_of("somatic").tolist() == oracle_idx["somatic"]


@pytest.mark.parametrize("preset_name", ["hifi-masseq", "hifi-isoseq", "ont-cdna"])
def test_kernel_matches_oracle(tmp_path, rng, preset_name):
    cfg = preset(preset_name).replace(min_read_length=100)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=12, n_hom=4)
    path = str(tmp_path / "c.bam")
    simulate_bam(path, rng, ref, truth, n_reads=80, read_len=2500, err_rate=0.01,
                 with_introns=True)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    quals = {}
    pl_o = scalar_pileup(bam, region, ref, cfg, qual_lists=quals)
    np.testing.assert_array_equal(pl.cnt, pl_o.cnt)
    cs = cand.select_candidates(pl, cfg)
    out, idx = scalar_candidates(pl_o, quals, cfg)
    apply_dense_filters(out, idx["het"], idx["hom"],
                        cfg.dense_win_size, cfg.min_dense_cnt)
    _compare(cs, out, idx)
    # recall: every planted het covered with decent depth should be found
    found = set(cs.pos[cs.het_var | cs.hom_var].tolist())
    het_hit = sum(1 for p in truth.het_snps if p in found)
    assert het_hit >= len(truth.het_snps) * 0.7


def test_dense_region_filtered(tmp_path, rng):
    """A cluster of many close het SNPs must be flagged dense."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 4000)
    truth = plant_snps(rng, ref, n_het=0, n_hom=0)
    # plant 8 het snps within 60 bp (dense_win_size=100, min_dense_cnt=5)
    base_pos = 2000
    from simulate import BASES
    for k in range(8):
        p = base_pos + k * 8
        refb = int(ref[p])
        altb = int(BASES[(list(BASES).index(refb) + 1) % 4])
        truth.het_snps[p] = (refb, altb)
    path = str(tmp_path / "d.bam")
    simulate_bam(path, rng, ref, truth, n_reads=60, read_len=3000, err_rate=0.002)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cs = cand.select_candidates(pl, cfg)
    in_cluster = (cs.pos >= base_pos) & (cs.pos < base_pos + 64)
    assert in_cluster.sum() >= 6
    assert cs.dense[in_cluster].sum() >= in_cluster.sum() - 1  # tail quirk
    # oracle agreement
    quals = {}
    pl_o = scalar_pileup(bam, region, ref, cfg, qual_lists=quals)
    out, idx = scalar_candidates(pl_o, quals, cfg)
    apply_dense_filters(out, idx["het"], idx["hom"],
                        cfg.dense_win_size, cfg.min_dense_cnt)
    _compare(cs, out, idx)


def test_strand_bias_filter(tmp_path, rng):
    """Alt allele on a single strand must be rejected when strand_bias=True."""
    from longcallr_tpu.io import bam as bamio
    cfg = preset("ont-cdna").replace(min_read_length=10, min_depth=6,
                                     distance_to_read_end=0)
    ref = np.frombuffer(b"ACGTACGTACGT" * 50, dtype=np.uint8).copy()
    L = len(ref)
    path = str(tmp_path / "sb.bam")
    # 20 reads: 10 forward / 10 reverse; alt 'T' at pos 300 only on forward
    with bamio.BamWriter(path, ["chrS"], [L]) as w:
        rows = []
        for i in range(20):
            fwd = i < 10
            seq = ref[100:500].copy()
            if fwd:
                seq[200] = ord("T")  # pos 300 alt only on forward reads
            rows.append((100, f"r{i}", 0 if fwd else 16, seq))
        for pos, q, fl, seq in rows:
            w.write_record(qname=q, flag=fl, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar([(400, "M")]),
                           seq=bytes(seq), qual=np.full(400, 30))
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=L + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cs = cand.select_candidates(pl, cfg)
    assert 300 not in cs.pos.tolist()
    # without strand bias the site is found
    cs2 = cand.select_candidates(pl, cfg.replace(strand_bias=False))
    assert 300 in cs2.pos.tolist()
    # oracle agreement on both configs
    quals = {}
    pl_o = scalar_pileup(bam, region, ref, cfg, qual_lists=quals)
    for c in (cfg, cfg.replace(strand_bias=False)):
        out, idx = scalar_candidates(pl_o, quals, c)
        apply_dense_filters(out, idx["het"], idx["hom"],
                            c.dense_win_size, c.min_dense_cnt)
        _compare(cand.select_candidates(pl, c), out, idx)


def test_rna_edit_classification(tmp_path, rng):
    """A->G variant with forward-dominant transcript strand → edit_snps."""
    from longcallr_tpu.io import bam as bamio
    cfg = preset("hifi-masseq").replace(min_read_length=10,
                                        distance_to_read_end=0)
    ref = np.frombuffer(b"CCAG" * 250, dtype=np.uint8).copy()
    L = len(ref)
    pos_a = 402  # an 'A' (CCAG pattern: index 2 mod 4 is A)
    assert ref[pos_a] == ord("A")
    path = str(tmp_path / "ed.bam")
    with bamio.BamWriter(path, ["chrS"], [L]) as w:
        for i in range(20):
            seq = ref[200:700].copy()
            if i % 2 == 0:
                seq[pos_a - 200] = ord("G")  # ~50% A->G
            tags = bamio.make_tag_bytes("ts", "A", "+")
            w.write_record(qname=f"e{i}", flag=0, ref_id=0, pos=200, mapq=60,
                           cigar=bamio.encode_cigar([(500, "M")]),
                           seq=bytes(seq), qual=np.full(500, 30), tags=tags)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=L + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cs = cand.select_candidates(pl, cfg)
    i = np.nonzero(cs.pos == pos_a)[0]
    assert i.size == 1
    assert cs.rna_editing[i[0]]
    assert not cs.for_phasing[i[0]]


def test_select_candidates_batched_equals_serial(tmp_path, rng, monkeypatch):
    """Concatenated-column batched selection (and its wave chunking) matches
    per-region select_candidates field for field."""
    from longcallr_tpu import ops
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.ops import candidates as C
    from longcallr_tpu.tiles.pileup import build_pileup
    from longcallr_tpu.tiles.regions import Region
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=3)
    path = str(tmp_path / "cb.bam")
    simulate_bam(path, rng, ref, truth, n_reads=90, read_len=2500,
                 err_rate=0.02, with_introns=True)
    bam = BamFile(path)
    regions = [Region(chr="chrS", start=s, end=e)
               for s, e in [(1, 3100), (3100, 6200), (6200, 9001)]]
    pileups = [build_pileup(bam, r, ref, cfg) for r in regions]
    serial = [C.select_candidates(pl, cfg) for pl in pileups]
    for batch_cols in (1 << 20, 1):      # one wave, then one region per wave
        monkeypatch.setattr(C, "CAND_BATCH_COLS", batch_cols)
        batched = C.select_candidates_batched(pileups, cfg)
        assert len(batched) == len(serial)
        total = 0
        for a, b in zip(batched, serial):
            np.testing.assert_array_equal(a.pos, b.pos)
            np.testing.assert_array_equal(a.alleles, b.alleles)
            np.testing.assert_array_equal(a.variant_type, b.variant_type)
            np.testing.assert_array_equal(a.genotype, b.genotype)
            np.testing.assert_array_equal(a.dense, b.dense)
            np.testing.assert_array_equal(a.for_phasing, b.for_phasing)
            np.testing.assert_allclose(a.variant_quality, b.variant_quality,
                                       rtol=1e-12, atol=1e-12)
            np.testing.assert_allclose(a.genotype_quality, b.genotype_quality,
                                       rtol=1e-12, atol=1e-12)
            total += a.n
        assert total > 0


def test_dense_mask_matches_scalar_oracle():
    """Vectorised dense_mask == literal scalar transcription across random
    position sets, both scan variants, and the tail-exclusion quirk."""
    import numpy as np
    from longcallr_tpu.ops.candidates import dense_mask
    from oracle_candidates import dense_mask_scalar
    rng = np.random.default_rng(11)
    for trial in range(40):
        n = int(rng.integers(0, 60))
        pos = np.sort(rng.choice(2000, size=n, replace=False)).astype(np.int64)
        win = int(rng.integers(1, 300))
        min_cnt = int(rng.integers(1, 8))
        strict = bool(rng.integers(0, 2))
        got = dense_mask(pos, win, min_cnt, strict)
        want = dense_mask_scalar(pos, win, min_cnt, strict)
        assert np.array_equal(got, want), (trial, pos, win, min_cnt, strict)
    # pathological cluster: thousands of candidates in one window stays fast
    import time
    pos = np.arange(20000, dtype=np.int64) * 3
    t0 = time.monotonic()
    m = dense_mask(pos, 100, 5, True)
    assert time.monotonic() - t0 < 0.1
    assert m[:-1].all() and not m[-1]
