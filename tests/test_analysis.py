"""ASE analysis on a simulated phased BAM with a synthetic annotation."""

import numpy as np
import pytest

from longcallr_tpu.analysis import ase
from longcallr_tpu.config import preset
from longcallr_tpu.pipeline.caller import run
from longcallr_tpu.utils.stats import beta_binomial_two_sided, fdr_bh

from simulate import make_reference, plant_snps, simulate_bam


def _write_gtf(path, chrom, genes):
    """genes: list of (gene_id, gene_name, start, end, exons[(s,e)])."""
    with open(path, "w") as f:
        for gid, gname, s, e, exons in genes:
            attrs = (f'gene_id "{gid}"; gene_type "protein_coding"; '
                     f'gene_name "{gname}";')
            f.write(f"{chrom}\thv\tgene\t{s}\t{e}\t.\t+\t.\t{attrs}\n")
            for (es, ee) in exons:
                ta = attrs + f' transcript_id "{gid}.t1";'
                f.write(f"{chrom}\thv\texon\t{es}\t{ee}\t.\t+\t.\t{ta}\n")


def test_fdr_bh_matches_reference_values():
    p = [0.01, 0.02, 0.03, 0.5, 0.04]
    _, adj = fdr_bh(p)
    # classic BH: p_i * n / rank, monotone from the top
    np.testing.assert_allclose(adj, [0.05, 0.05, 0.05, 0.5, 0.05])


def test_beta_binomial_two_sided():
    # balanced observation → p == 1
    assert beta_binomial_two_sided(5, 10, 0.5, 0.001) > 0.9
    # extreme imbalance → tiny p
    assert beta_binomial_two_sided(50, 50, 0.5, 0.001) < 1e-9
    # symmetric
    a = beta_binomial_two_sided(10, 50, 0.5, 0.001)
    b = beta_binomial_two_sided(40, 50, 0.5, 0.001)
    np.testing.assert_allclose(a, b, rtol=1e-9)


def test_ase_pipeline(tmp_path, rng):
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=0, min_gap=500)
    bam_path = str(tmp_path / "a.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=80, read_len=4000,
                 err_rate=0.01)
    out = run(bam_path, bam_path.replace(".bam", ".fa"), str(tmp_path / "o"), cfg)
    gtf = str(tmp_path / "genes.gtf")
    _write_gtf(gtf, "chrS", [
        ("G1", "GENE1", 1, 4500, [(1, 4500)]),
        ("G2", "GENE2", 4501, 9000, [(4501, 9000)]),
    ])
    out_tsv = str(tmp_path / "res.ase.tsv")
    ase.analyze_ase_genes(gtf, out.phased_bam_path, out_tsv, threads=1,
                          gene_types={"protein_coding"}, min_support=5,
                          overdispersion=0.001)
    lines = open(out_tsv).read().splitlines()
    assert lines[0].startswith("#Gene_name")
    rows = [l.split("\t") for l in lines[1:]]
    assert len(rows) >= 1
    # reads were simulated 50/50 per haplotype → no significant ASE
    for r in rows:
        h1, h2, p = int(r[3]), int(r[4]), float(r[5])
        assert h1 + h2 >= 5
        assert p > 0.001, r  # balanced expression


def test_ase_detects_imbalance(tmp_path, rng):
    """A gene with 70/30 haplotype expression should get a small p (stronger
    imbalance would push the minor allele fraction below min_allele_freq and
    suppress het calling altogether)."""
    from longcallr_tpu.io import bam as bamio
    from simulate import haplotype_seq, Truth, BASES

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=0, min_gap=500)
    # simulate imbalanced haplotype counts
    haps = {1: haplotype_seq(truth, ref, 1), 2: haplotype_seq(truth, ref, 2)}
    rows = []
    for i in range(80):
        hap = 1 if i % 10 < 7 else 2
        pos = int(rng.integers(0, 2000))
        span = 3500
        seq = haps[hap][pos:pos + span].copy()
        errs = rng.random(span) < 0.01
        seq[errs] = BASES[rng.integers(0, 4, size=int(errs.sum()))]
        truth.hap_of_read[f"r{i:04d}"] = hap
        rows.append((pos, f"r{i:04d}", seq))
    rows.sort(key=lambda t: t[0])
    bam_path = str(tmp_path / "im.bam")
    with bamio.BamWriter(bam_path, ["chrS"], [len(ref)]) as w:
        for pos, qn, seq in rows:
            w.write_record(qname=qn, flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar([(len(seq), "M")]),
                           seq=bytes(seq), qual=np.full(len(seq), 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    from longcallr_tpu.io.fasta import write_fasta
    write_fasta(bam_path.replace(".bam", ".fa"), {"chrS": bytes(ref)})
    out = run(bam_path, bam_path.replace(".bam", ".fa"), str(tmp_path / "oi"), cfg)
    gtf = str(tmp_path / "g.gtf")
    _write_gtf(gtf, "chrS", [("G1", "GENE1", 1, 6000, [(1, 6000)])])
    out_tsv = str(tmp_path / "imb.ase.tsv")
    ase.analyze_ase_genes(gtf, out.phased_bam_path, out_tsv, threads=1,
                          gene_types={"protein_coding"}, min_support=5,
                          overdispersion=0.001)
    rows2 = [l.split("\t") for l in open(out_tsv).read().splitlines()[1:]]
    assert len(rows2) == 1
    h1, h2, p = int(rows2[0][3]), int(rows2[0][4]), float(rows2[0][5])
    assert max(h1, h2) / (h1 + h2) > 0.6
    assert p < 0.05
