"""VCF emission branch coverage: synthetic CandidateSets through
format_region_records, checking exact byte formatting (vcf.rs:27-306)."""

import numpy as np

from longcallr_tpu.io.vcf import _as_i32, format_region_records
from longcallr_tpu.ops.candidates import CandidateSet


def _cs(n, **kw):
    d = dict(
        chrom="chrT",
        pos=np.arange(100, 100 + n, dtype=np.int64),
        ref_base=np.full(n, ord("A"), np.uint8),
        alleles=np.tile(np.frombuffer(b"AG", np.uint8), (n, 1)),
        allele_freqs=np.tile(np.asarray([0.6, 0.4], np.float32), (n, 1)),
        alt_frac=np.zeros((n, 2), np.float32),
        depth=np.full(n, 30, np.int32),
        variant_quality=np.full(n, 57.8),
        genotype_quality=np.full(n, 33.2),
        genotype_prob=np.zeros((n, 3)),
        variant_type=np.full(n, 1, np.int8),
        genotype=np.zeros(n, np.int8),
        haplotype=np.ones(n, np.int8),
        rna_editing=np.zeros(n, bool),
        cand_somatic=np.zeros(n, bool),
        dense=np.zeros(n, bool),
        hom_var=np.zeros(n, bool),
        het_var=np.ones(n, bool),
        for_phasing=np.ones(n, bool),
        single=np.zeros(n, bool),
        non_selected=np.zeros(n, bool),
        somatic=np.zeros(n, bool),
        somatic_score=np.zeros(n),
        phase_score=np.full(n, 25.123),
        phase_set=np.full(n, 101, np.uint32),
    )
    d.update(kw)
    return CandidateSet(**d)


def test_selected_phased_record():
    cs = _cs(1)
    [line] = format_region_records(cs, 11.0)
    assert line == ("chrT\t101\t.\tA\tG\t57\tPASS\tRDS=select\t"
                    "GT:GQ:PS:DP:AF:PQ\t0|1:33:101:30:0.40:25.12")


def test_selected_hap_negative_and_no_ps():
    cs = _cs(1, haplotype=np.asarray([-1], np.int8),
             phase_set=np.zeros(1, np.uint32))
    [line] = format_region_records(cs, 11.0)
    assert "\t1|0:33:.:30:0.40:25.12" in line


def test_low_phase_score_unphased():
    cs = _cs(1, phase_score=np.asarray([5.0]))
    [line] = format_region_records(cs, 11.0)
    assert "\tLowQual\t" in line
    assert "\t0/1:33:101:30:0.40:5.00" in line


def test_dense_record():
    cs = _cs(1, dense=np.ones(1, bool))
    [line] = format_region_records(cs, 11.0)
    assert line == ("chrT\t101\t.\tA\tG\t57\tdn\tRDS=dense_snp\t"
                    "GT:GQ:DP:AF\t0/1:33:30:0.40")


def test_dense_triallelic():
    cs = _cs(1, dense=np.ones(1, bool),
             variant_type=np.asarray([3], np.int8),
             alleles=np.tile(np.frombuffer(b"GT", np.uint8), (1, 1)))
    [line] = format_region_records(cs, 11.0)
    fields = line.split("\t")
    assert fields[4] == "G,T"
    assert fields[9] == "1/2:33:30:0.60,0.40"


def test_rna_edit_record():
    cs = _cs(1, non_selected=np.ones(1, bool), rna_editing=np.ones(1, bool))
    [line] = format_region_records(cs, 11.0)
    f = line.split("\t")
    assert f[6] == "RnaEdit" and f[7] == "RDS=noselect"
    assert f[9] == "0/1:33:30:0.40"


def test_noselect_homref_and_hom():
    cs = _cs(2, non_selected=np.ones(2, bool),
             variant_type=np.asarray([0, 2], np.int8))
    lines = format_region_records(cs, 11.0)
    assert "\tHomRef\t" in lines[0] and "\t0/0:" in lines[0].split("RDS")[1] or True
    f0 = lines[0].split("\t")
    f1 = lines[1].split("\t")
    assert f0[6] == "HomRef" and f0[9].startswith("0/0:")
    assert f1[6] == "PASS" and f1[9].startswith("1/1:")


def test_selected_multiallelic():
    cs = _cs(1, variant_type=np.asarray([3], np.int8),
             phase_score=np.asarray([5.0]),
             alleles=np.tile(np.frombuffer(b"GT", np.uint8), (1, 1)))
    [line] = format_region_records(cs, 11.0)
    f = line.split("\t")
    assert f[4] == "G,T" and f[6] == "Multiallelic"
    assert f[9] == "1/2:33:101:30:0.60,0.40:5.00"


def test_selected_high_ps_but_not_het_dropped():
    """ps >= min_phase_score with vt != 1 → empty ALT → record dropped
    (thread.rs:265-304 writes only 1- or 2-alt records)."""
    cs = _cs(1, variant_type=np.asarray([2], np.int8))
    assert format_region_records(cs, 11.0) == []


def test_gq_saturation():
    """GQ=inf prints i32::MAX (Rust saturating `as i32`)."""
    cs = _cs(1, genotype_quality=np.asarray([np.inf]))
    [line] = format_region_records(cs, 11.0)
    assert ":2147483647:" in line.replace("\t", ":")
    assert _as_i32(float("inf")) == 2147483647
    assert _as_i32(float("-inf")) == -2147483648
    assert _as_i32(3.99) == 3
