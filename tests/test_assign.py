"""Assignment layer vs scalar oracle transcriptions of snpfrags.rs."""

import copy

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.ops.candidates import select_candidates
from longcallr_tpu.phasing import assign as A
from longcallr_tpu.phasing.fragments import get_fragments
from longcallr_tpu.phasing.kernels import make_cell_tables_np
from longcallr_tpu.phasing.optimize import phase_region
from longcallr_tpu.tiles.pileup import build_pileup
from longcallr_tpu.tiles.regions import Region

import oracle_assign as OA
from simulate import make_reference, plant_snps, simulate_bam


def _setup(tmp_path, rng, n_het=12):
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=n_het, n_hom=2, min_gap=500)
    path = str(tmp_path / "as.bam")
    simulate_bam(path, rng, ref, truth, n_reads=70, read_len=3500, err_rate=0.015)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    frags = get_fragments(bam, region, cands, cfg)
    st = phase_region(frags, cands, cfg, seed=1)
    frags.haplotag = np.sign(np.asarray(st.sigma)).astype(np.int8)
    cands.haplotype = np.sign(np.asarray(st.delta)).astype(np.int8)
    cands.genotype = np.asarray(st.eta).astype(np.int8)
    return cfg, cands, frags


def _clone(cands, frags):
    c = copy.deepcopy(cands)
    f = copy.deepcopy(frags)
    return c, f


def test_assign_reads_matches_oracle(tmp_path, rng):
    cfg, cands, frags = _setup(tmp_path, rng)
    c2, f2 = _clone(cands, frags)
    ct = make_cell_tables_np(frags.p, frags.baseq)
    got = A.assign_reads_haplotype(frags, cands, cfg, ct, False)
    want = OA.assign_reads_haplotype(f2, c2, cfg, False)
    assert got == want
    np.testing.assert_array_equal(frags.assignment, f2.assignment)
    np.testing.assert_array_equal(frags.haplotag, f2.haplotag)
    np.testing.assert_allclose(frags.assignment_score, f2.assignment_score,
                               rtol=1e-12, atol=1e-12)
    assert (frags.assignment != 0).sum() > 20


def test_assign_snp_matches_oracle(tmp_path, rng):
    cfg, cands, frags = _setup(tmp_path, rng)
    ct = make_cell_tables_np(frags.p, frags.baseq)
    A.assign_reads_haplotype(frags, cands, cfg, ct, False)
    c2, f2 = _clone(cands, frags)
    A.assign_snp_haplotype_genotype(frags, cands, cfg, ct, False)
    OA.assign_snp_haplotype_genotype(f2, c2, cfg, False)
    np.testing.assert_array_equal(cands.haplotype, c2.haplotype)
    np.testing.assert_array_equal(cands.genotype, c2.genotype)
    np.testing.assert_array_equal(cands.variant_type, c2.variant_type)
    np.testing.assert_array_equal(cands.non_selected, c2.non_selected)
    np.testing.assert_array_equal(cands.single, c2.single)
    np.testing.assert_allclose(cands.phase_score, c2.phase_score,
                               rtol=1e-12, atol=1e-12)
    assert (cands.phase_score > 0).sum() >= 5


def test_full_assignment_sequence_matches_oracle(tmp_path, rng):
    """The double assign pass sequence (thread.rs:168-172) end to end."""
    cfg, cands, frags = _setup(tmp_path, rng, n_het=9)
    c2, f2 = _clone(cands, frags)
    ct = make_cell_tables_np(frags.p, frags.baseq)
    for _ in range(2):
        A.assign_reads_haplotype(frags, cands, cfg, ct, False)
        A.assign_snp_haplotype_genotype(frags, cands, cfg, ct, False)
        OA.assign_reads_haplotype(f2, c2, cfg, False)
        OA.assign_snp_haplotype_genotype(f2, c2, cfg, False)
    np.testing.assert_array_equal(frags.assignment, f2.assignment)
    np.testing.assert_array_equal(cands.genotype, c2.genotype)
    np.testing.assert_allclose(cands.phase_score, c2.phase_score,
                               rtol=1e-12, atol=1e-12)
