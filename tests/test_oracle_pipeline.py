"""Gating test for the stage *wiring*: the end-to-end scalar oracle
(tests/oracle_pipeline.py — a literal transcription of the reference
per-region closure thread.rs:77-222 composed from the per-stage oracles)
must reproduce the fast pipeline's VCF lines, read assignments and phase
sets byte-exactly on simulated diploid inputs. A mistranscription of the
pass ordering, flag routing, or seed plumbing in either implementation
fails this test even when every per-stage formula is individually right."""

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.pipeline.engine import process_region
from longcallr_tpu.tiles.regions import Region

from oracle_pipeline import scalar_process_region
from simulate import make_reference, plant_snps, simulate_bam


def _compare(tmp_path, rng, cfg, ref_len, sim_kwargs, region=None):
    ref = make_reference(rng, ref_len)
    truth = plant_snps(rng, ref, **sim_kwargs.pop("plant"))
    bam_path = str(tmp_path / "sim.bam")
    simulate_bam(bam_path, rng, ref, truth, **sim_kwargs)
    bam = BamFile(bam_path)
    if region is None:
        region = Region(chr="chrS", start=1, end=len(ref) + 1)

    fast = process_region(bam, region, ref, cfg)
    o_lines, o_assign, o_ps = scalar_process_region(bam, region, ref, cfg)

    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps
    # sanity: the case actually produced work at every stage
    assert len(o_lines) > 0 and len(o_assign) > 0
    return fast


def test_oracle_pipeline_enumeration_path(tmp_path, rng):
    """Few candidates → 2^n enumeration branch (phase.rs:1097-1122)."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    fast = _compare(tmp_path, rng, cfg, 4500,
                    dict(plant=dict(n_het=4, n_hom=1, min_gap=500),
                         n_reads=40, read_len=2200, err_rate=0.002))
    assert 0 < fast.n_candidates <= cfg.max_enum_snps


import pytest


@pytest.mark.parametrize("salt", [0, 1, 2])
def test_oracle_pipeline_iterative_path(tmp_path, rng, salt):
    """Many candidates → LD init + ascent + perturbation schedule
    (phase.rs:1123-1294), incl. phase sets across the whole region.
    Parametrized over simulation seeds: each salt is a fresh random
    workload through the same byte-exact wiring gate."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    rng2 = np.random.default_rng([rng.integers(1 << 30), salt])
    fast = _compare(tmp_path, rng2, cfg, 9000,
                    dict(plant=dict(n_het=14, n_hom=3, min_gap=420),
                         n_reads=90, read_len=4000, err_rate=0.01))
    assert fast.n_candidates > cfg.max_enum_snps
    assert len(fast.phase_sets) > 0


def test_oracle_pipeline_downsampled(tmp_path, rng):
    """Downsampling on (thread.rs:144-151): the apply_ds routing through
    phase/assign/rescue and the final full-depth assignment pass."""
    cfg = preset("hifi-masseq").replace(min_read_length=100, downsample=True,
                                        downsample_depth=40)
    _compare(tmp_path, rng, cfg, 8000,
             dict(plant=dict(n_het=12, n_hom=2, min_gap=450),
                  n_reads=80, read_len=3500, err_rate=0.01))


def test_oracle_pipeline_ont_preset(tmp_path, rng):
    """ONT preset: different thresholds, noisier reads → dense windows and
    rescue candidates exercise the noselect/RnaEdit VCF branches."""
    cfg = preset("ont-cdna").replace(min_read_length=100)
    _compare(tmp_path, rng, cfg, 9000,
             dict(plant=dict(n_het=12, n_hom=2, min_gap=300),
                  n_reads=80, read_len=3500, err_rate=0.03))


def test_oracle_pipeline_demo_region(demo_bam_path):
    """Full-pipeline oracle on REAL demo reads (reference README demo,
    hifi-masseq): a window of the demo chr20 locus against the consensus
    pseudo-reference (utils/demo.py). Slow (pure-Python phasing over real
    depth) — deselect together with test_demo_pileup_oracle for quick runs."""
    import os
    from longcallr_tpu.io.fasta import FastaFile
    from longcallr_tpu.utils.demo import make_consensus_reference
    from longcallr_tpu.tiles.regions import extract_isolated_regions_parallel

    cfg = preset("hifi-masseq")
    data_dir = os.path.join(os.path.dirname(__file__), "..", "data")
    ref_fa = os.path.join(data_dir, "demo_chr20_consensus.fa")
    make_consensus_reference(demo_bam_path, ref_fa)
    ref = np.frombuffer(FastaFile(ref_fa).fetch("chr20"), dtype=np.uint8).copy()

    bam = BamFile(demo_bam_path)
    regs = extract_isolated_regions_parallel(bam, [("chr20", len(ref))], cfg)
    reg = max(regs, key=lambda r: r.length)
    sub = Region(chr="chr20", start=reg.start, end=min(reg.end, reg.start + 6000))

    fast = process_region(bam, sub, ref, cfg)
    o_lines, o_assign, o_ps = scalar_process_region(bam, sub, ref, cfg)
    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps
    assert len(o_lines) > 0


def test_oracle_pipeline_input_vcf(tmp_path, rng):
    """-v wiring: candidates imported from an input VCF (discovery and the
    dense filters skipped) through phasing/assignment/emission — oracle ==
    fast, byte-exact. The input VCF is a prior discovery run's output, so
    it carries 0/1, 1/1 and phased records."""
    from longcallr_tpu.io.vcf import load_input_candidates
    from longcallr_tpu.pipeline.caller import run

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 7000)
    truth = plant_snps(rng, ref, n_het=12, n_hom=2, min_gap=400)
    bam_path = str(tmp_path / "v.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=70, read_len=3000,
                 err_rate=0.01)
    first = run(bam_path, bam_path.replace(".bam", ".fa"),
                str(tmp_path / "first"), cfg)
    cands = load_input_candidates(first.vcf_path)
    assert sum(len(v) for v in cands.values()) > 5

    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    fast = process_region(bam, region, ref, cfg, input_candidates=cands)
    o_lines, o_assign, o_ps = scalar_process_region(
        bam, region, ref, cfg, input_candidates=cands)
    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps
    assert len(o_lines) > 0 and len(o_assign) > 0


def test_oracle_pipeline_exon_mask(tmp_path, rng):
    """--exon-only wiring: a per-column exon mask restricts discovery;
    oracle == fast byte-exact, and masked-out planted SNPs are absent."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 7000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=1, min_gap=450)
    bam_path = str(tmp_path / "ex.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=60, read_len=3000,
                 err_rate=0.01)
    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    L = region.end - region.start
    exon_mask = np.zeros(L, bool)
    exon_mask[1500:5500] = True        # middle "exon" only

    fast = process_region(bam, region, ref, cfg, exon_mask=exon_mask)
    o_lines, o_assign, o_ps = scalar_process_region(
        bam, region, ref, cfg, exon_mask=exon_mask)
    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps
    assert len(o_lines) > 0
    # every record position lies inside the exon window
    for line in o_lines:
        pos1 = int(line.split("\t")[1])
        assert 1500 < pos1 <= 5501


# ---------------------------------------------------------------------------
# Fuzzed oracle sweep: presets × stress shapes × seeds. Each case id feeds the
# per-test rng fixture (seeded by nodeid), so every row is an independent
# random workload through the byte-exact wiring gate. This sweep is the
# standing hedge against transcription error while the Rust binary is
# unbuildable here (SURVEY.md §4): shapes target the quirk-bearing branches —
# strand-bias rejection (candidate.rs:199-234), ONT read-end trimming
# (util.rs:745-751), dense windows incl. the hard-coded 5bp/≥3 pass
# (candidate.rs:471-523), triallelic hets (candidate.rs:419-455),
# downsampling (thread.rs:144-151), spliced reads + soft clips.
FUZZ_CASES = [
    # (id, preset, cfg_overrides, plant_kwargs, sim_kwargs, inject)
    ("mq-s0", "hifi-masseq", {}, dict(n_het=9, n_hom=2, min_gap=380),
     dict(n_reads=50, read_len=2600, err_rate=0.01), None),
    ("mq-s1", "hifi-masseq", {}, dict(n_het=9, n_hom=2, min_gap=380),
     dict(n_reads=50, read_len=2600, err_rate=0.01), None),
    ("mq-s2", "hifi-masseq", {}, dict(n_het=11, n_hom=1, min_gap=340),
     dict(n_reads=55, read_len=2800, err_rate=0.008), None),
    ("mq-tri", "hifi-masseq", {}, dict(n_het=8, n_hom=1, n_tri=3, min_gap=360),
     dict(n_reads=55, read_len=2800, err_rate=0.008), None),
    ("mq-dense100", "hifi-masseq", {}, dict(n_het=8, n_hom=1, min_gap=380),
     dict(n_reads=50, read_len=2600, err_rate=0.01), "dense100"),
    ("mq-dense5bp", "hifi-masseq", {}, dict(n_het=8, n_hom=1, min_gap=380),
     dict(n_reads=50, read_len=2600, err_rate=0.01), "dense5bp"),
    ("mq-ds", "hifi-masseq", dict(downsample=True, downsample_depth=30),
     dict(n_het=10, n_hom=2, min_gap=360),
     dict(n_reads=60, read_len=2600, err_rate=0.01), None),
    ("iso-sb", "hifi-isoseq", {}, dict(n_het=9, n_hom=1, min_gap=380),
     dict(n_reads=50, read_len=2600, err_rate=0.008), "biased"),
    ("cdna-noisy", "ont-cdna", {}, dict(n_het=10, n_hom=2, min_gap=300),
     dict(n_reads=50, read_len=2600, err_rate=0.03), None),
    ("drna-trim", "ont-drna", {}, dict(n_het=10, n_hom=1, min_gap=340),
     dict(n_reads=50, read_len=2600, err_rate=0.02), None),
    ("mq-spliced-s0", "hifi-masseq", {}, dict(n_het=10, n_hom=2, min_gap=360),
     dict(n_reads=55, read_len=2800, err_rate=0.01, with_introns=True,
          softclip=5), None),
    ("mq-spliced-s1", "hifi-masseq", {}, dict(n_het=10, n_hom=2, min_gap=360),
     dict(n_reads=55, read_len=2800, err_rate=0.01, with_introns=True,
          softclip=5), None),
]


@pytest.mark.parametrize("case", FUZZ_CASES, ids=[c[0] for c in FUZZ_CASES])
def test_oracle_pipeline_fuzz(tmp_path, rng, case):
    from simulate import BASES

    cid, pname, over, plant, sim, inject = case
    cfg = preset(pname).replace(min_read_length=100, **over)
    ref = make_reference(rng, 6500)
    truth = plant_snps(rng, ref, **plant)

    def _alt(p):
        refb = int(ref[p])
        return int(BASES[(list(BASES).index(refb) + 1) % 4])

    if inject == "dense5bp":
        # three het SNPs within 4 bp → the hard-coded 5bp/≥3 dense pass
        for d in (0, 2, 4):
            truth.het_snps[3210 + d] = (int(ref[3210 + d]), _alt(3210 + d))
    elif inject == "dense100":
        # five het SNPs spanning 88 bp → the (dense_win_size=100, ≥5) pass
        for d in (0, 22, 44, 66, 88):
            truth.het_snps[2950 + d] = (int(ref[2950 + d]), _alt(2950 + d))
    elif inject == "biased":
        # alt written on plus-strand reads only → SOR / binomial rejection
        sim = dict(sim, biased_sites={2913: _alt(2913), 4471: _alt(4471)})

    bam_path = str(tmp_path / "fuzz.bam")
    simulate_bam(bam_path, rng, ref, truth, **sim)
    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)

    fast = process_region(bam, region, ref, cfg)
    o_lines, o_assign, o_ps = scalar_process_region(bam, region, ref, cfg)
    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps
    assert len(o_lines) > 0
    if inject in ("dense5bp", "dense100"):
        # the injected cluster actually fired the dense filter
        assert any("\tdn\t" in l for l in o_lines)


@pytest.mark.parametrize("campaign_case", [47, 78])
def test_oracle_pipeline_structural_ties(tmp_path, campaign_case):
    """Regression: fuzz-campaign workloads whose optima TIE at exact
    arithmetic (e.g. a read with perfectly balanced evidence — its σ and −σ
    log-sums hold the same terms in different orders). Before the
    TIE_TOL-quantized decisions (kernels.TIE_TOL, PARITY.md deviation #8),
    strict float comparisons resolved these by summation-order rounding and
    the fast pipeline diverged from the scalar oracle (case 47's iterative
    trajectory landed 27 log-units worse; case 78's enumeration picked a
    different equally-optimal config). Fixed seeds reproduce the exact
    campaign workloads."""
    from simulate import BASES

    rng = np.random.default_rng([777, campaign_case])
    pname = ["hifi-masseq", "hifi-isoseq", "ont-cdna",
             "ont-drna"][campaign_case % 4]
    over = {}
    if rng.random() < 0.25:
        over = dict(downsample=True, downsample_depth=int(rng.integers(25, 60)))
    cfg = preset(pname).replace(min_read_length=100, **over)
    ref_len = int(rng.integers(4000, 8000))
    ref = make_reference(rng, ref_len)
    truth = plant_snps(rng, ref, n_het=int(rng.integers(3, 14)),
                       n_hom=int(rng.integers(0, 4)),
                       n_tri=int(rng.integers(0, 3)),
                       min_gap=int(rng.integers(120, 500)))
    inject = rng.random()
    if inject < 0.15:
        p0 = int(rng.integers(1000, ref_len - 1000))
        for d in (0, 2, 4):
            refb = int(ref[p0 + d])
            truth.het_snps[p0 + d] = (
                refb, int(BASES[(list(BASES).index(refb) + 1) % 4]))
    sim = dict(n_reads=int(rng.integers(25, 70)),
               read_len=int(rng.integers(1200, 3200)),
               err_rate=float(rng.choice([0.002, 0.008, 0.02, 0.035])))
    if rng.random() < 0.3:
        sim.update(with_introns=True, softclip=int(rng.integers(0, 8)))
    elif rng.random() < 0.2:
        p1 = int(rng.integers(1000, ref_len - 1000))
        refb = int(ref[p1])
        sim["biased_sites"] = {
            p1: int(BASES[(list(BASES).index(refb) + 1) % 4])}
    bam_path = str(tmp_path / "tie.bam")
    simulate_bam(bam_path, rng, ref, truth, **sim)
    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)

    fast = process_region(bam, region, ref, cfg)
    o_lines, o_assign, o_ps = scalar_process_region(bam, region, ref, cfg)
    assert fast.vcf_lines == o_lines
    assert fast.read_assignments == o_assign
    assert fast.phase_sets == o_ps


def test_oracle_pipeline_spliced_reads(tmp_path, rng):
    """Spliced long reads (N cigar ops) + soft clips: the fragment CIGAR
    walk, pileup and downstream wiring gate byte-exactly on the domain's
    defining read shape."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    _compare(tmp_path, rng, cfg, 9000,
             dict(plant=dict(n_het=12, n_hom=2, min_gap=420),
                  n_reads=90, read_len=4000, err_rate=0.01,
                  with_introns=True, softclip=6))
