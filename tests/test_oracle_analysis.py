"""Standing differential gate for the ASE/ASJ analysis layer: production
``analysis/{ase,asj}.py`` vs the scalar oracle transcriptions
(``oracle_ase.py``/``oracle_asj.py``) on seeded random scenarios
(``simulate_analysis.py``), byte-exact on every output TSV.

The long campaign lives in ``experiments/fuzz_campaign.py --analysis``
(>=200 cases); this suite gate runs a smaller seeded slice of the same
space every run. Seeds here are frozen — extend, don't renumber.
"""

import os

import numpy as np
import pytest

from longcallr_tpu.analysis import ase, asj

from oracle_ase import oracle_analyze_ase
from oracle_asj import oracle_analyze_asj
from simulate_analysis import make_scenario


def _ase_case(tmp_path, seed, mode):
    rng = np.random.default_rng([4101, seed])
    sc = make_scenario(rng, str(tmp_path))
    min_support = int(rng.integers(1, 9))
    overdispersion = float(rng.choice([0.001, 0.01]))
    gene_types = {"protein_coding", "lncRNA"} if rng.random() < 0.8 \
        else {"protein_coding"}
    out_tsv = str(tmp_path / f"case.{mode}.tsv")
    kw = {}
    if mode == "patmat":
        kw = dict(vcf1=sc["rna_vcf"], vcf2=sc["dna_phased_vcf"])
    elif mode == "filter":
        kw = dict(vcf1=sc["rna_vcf"], vcf3=sc["dna_vcf"])
    ase.analyze_ase_genes(sc["anno"], sc["bam"], out_tsv, threads=1,
                          gene_types=gene_types, min_support=min_support,
                          overdispersion=overdispersion, **kw)
    got = open(out_tsv).read()
    want = oracle_analyze_ase(
        sc["anno"], sc["bam"], 1, gene_types, min_support, overdispersion,
        vcf1=kw.get("vcf1"), vcf2=kw.get("vcf2"), vcf3=kw.get("vcf3"))
    assert got == want, (seed, mode)
    return got


def _asj_case(tmp_path, seed, filtering=False):
    rng = np.random.default_rng([4202, seed])
    sc = make_scenario(rng, str(tmp_path))
    min_count = int(rng.integers(1, 8))
    min_junctions = int(rng.integers(0, 3))
    cluster_with_exons = bool(rng.random() < 0.5)
    no_gtag = bool(rng.random() < 0.3)
    gene_types = {"protein_coding", "lncRNA"}
    prefix = str(tmp_path / "asjcase")
    dna_vcfs = rna_vcfs = None
    dna_vcf = rna_vcf = None
    if filtering:
        from longcallr_tpu.analysis.ase import (load_dna_vcf,
                                                load_longcallr_phased_vcf)
        dna_vcf, rna_vcf = sc["dna_vcf"], sc["rna_vcf"]
        dna_vcfs = load_dna_vcf(dna_vcf)
        rna_vcfs = load_longcallr_phased_vcf(rna_vcf, with_dp_af=False)
    asj.analyze(sc["anno"], sc["bam"], sc["fa"], prefix,
                min_count=min_count, gene_types=gene_types, threads=1,
                no_gtag=no_gtag, min_junctions=min_junctions,
                cluster_with_exons=cluster_with_exons,
                dna_vcfs=dna_vcfs, rna_vcfs=rna_vcfs)
    want = oracle_analyze_asj(
        sc["anno"], sc["bam"], sc["fa"], min_count=min_count,
        gene_types=gene_types, no_gtag=no_gtag, min_junctions=min_junctions,
        cluster_with_exons=cluster_with_exons, dna_vcf=dna_vcf,
        rna_vcf=rna_vcf)
    got = (open(prefix + ".asj.tsv").read(),
           open(prefix + ".asj_gene.tsv").read(),
           open(prefix + ".gene_coverage.tsv").read())
    assert got[2] == want[2], (seed, "gene_coverage")
    assert got[0] == want[0], (seed, "asj")
    assert got[1] == want[1], (seed, "asj_gene")
    return got


@pytest.mark.parametrize("seed", range(6))
def test_ase_plain_matches_oracle(tmp_path, seed):
    _ase_case(tmp_path, seed, "plain")


@pytest.mark.parametrize("seed", range(6, 10))
def test_ase_patmat_matches_oracle(tmp_path, seed):
    _ase_case(tmp_path, seed, "patmat")


@pytest.mark.parametrize("seed", range(10, 14))
def test_ase_filter_matches_oracle(tmp_path, seed):
    _ase_case(tmp_path, seed, "filter")


@pytest.mark.parametrize("seed", range(8))
def test_asj_matches_oracle(tmp_path, seed):
    _asj_case(tmp_path, seed, filtering=False)


@pytest.mark.parametrize("seed", range(8, 12))
def test_asj_filtering_matches_oracle(tmp_path, seed):
    _asj_case(tmp_path, seed, filtering=True)
