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


def test_asj_detects_haplotype_specific_junction(tmp_path, rng):
    """A junction present only on hap1 reads must be reported significant;
    a junction shared by both haplotypes must not."""
    from longcallr_tpu.analysis import asj
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.fasta import write_fasta

    L = 9000
    ref = make_reference(rng, L)
    # canonical splice signals for intron1 (2001-2499) and intron2 (4501-4999)
    ref[2000:2002] = np.frombuffer(b"GT", np.uint8)
    ref[2497:2499] = np.frombuffer(b"AG", np.uint8)
    ref[4500:4502] = np.frombuffer(b"GT", np.uint8)
    ref[4997:4999] = np.frombuffer(b"AG", np.uint8)
    fa_path = str(tmp_path / "asj.fa")
    write_fasta(fa_path, {"chrS": bytes(ref)})

    gtf = str(tmp_path / "asj.gtf")
    attrs = 'gene_id "G1"; gene_type "protein_coding"; gene_name "GENE1";'
    with open(gtf, "w") as f:
        f.write(f"chrS\thv\tgene\t1\t9000\t.\t+\t.\t{attrs}\n")
        for (s, e) in [(1, 2000), (2500, 4500), (5000, 9000)]:
            f.write(f'chrS\thv\texon\t{s}\t{e}\t.\t+\t.\t{attrs} '
                    f'transcript_id "G1.t1";\n')

    bam_path = str(tmp_path / "asj.bam")
    with bamio.BamWriter(bam_path, ["chrS"], [L]) as w:
        for i in range(40):
            hap = 1 if i % 2 == 0 else 2
            tags = (bamio.make_tag_bytes("HP", "i", hap)
                    + bamio.make_tag_bytes("PS", "i", 1000))
            if hap == 1:
                # both introns spliced out
                cigar = bamio.encode_cigar([(2000, "M"), (499, "N"),
                                            (2001, "M"), (499, "N"),
                                            (3500, "M")])
                seq = np.concatenate([ref[0:2000], ref[2499:4500],
                                      ref[4999:8499]])
            else:
                # only intron2 spliced (intron1 retained)
                cigar = bamio.encode_cigar([(4500, "M"), (499, "N"),
                                            (3500, "M")])
                seq = np.concatenate([ref[0:4500], ref[4999:8499]])
            w.write_record(qname=f"j{i:03d}", flag=0, ref_id=0, pos=0,
                           mapq=60, cigar=cigar, seq=bytes(seq),
                           qual=np.full(len(seq), 30), tags=tags)

    out_prefix = str(tmp_path / "asjout")
    asj.analyze(gtf, bam_path, fa_path, out_prefix, min_count=5,
                gene_types={"protein_coding"}, min_junctions=0)
    rows = [l.split("\t") for l in
            open(out_prefix + ".asj.tsv").read().splitlines()[1:]]
    assert rows, "no junctions reported"
    by_junc = {r[0]: r for r in rows}
    j1 = by_junc.get("chrS:2001-2499")
    j2 = by_junc.get("chrS:4501-4999")
    assert j1 is not None and j2 is not None, by_junc.keys()
    # intron1: hap1 present / hap2 absent → significant
    assert float(j1[8]) < 1e-4, j1
    assert j1[11] == "True"  # GT-AG canonical
    assert j1[10] == "False"  # annotated (not novel)
    # intron2: both haplotypes → not significant
    assert float(j2[8]) > 0.05, j2
    # gene summary exists
    gene_rows = open(out_prefix + ".asj_gene.tsv").read().splitlines()[1:]
    assert len(gene_rows) == 1 and gene_rows[0].startswith("GENE1")
    # coverage file
    cov = open(out_prefix + ".gene_coverage.tsv").read().splitlines()[1]
    assert cov.startswith("GENE1") and int(cov.split("\t")[4]) == 40
    # BED conversion
    from longcallr_tpu.analysis.asj_to_bed import convert_asj_to_bed
    import io as _io
    buf = _io.StringIO()
    convert_asj_to_bed(out_prefix + ".asj.tsv", 1e-4, out=buf)
    bed = buf.getvalue().splitlines()
    assert len(bed) == 1 and bed[0].startswith("chrS\t2000\t2499\tGENE1")


def test_somatic_posterior():
    """calculate_prob_somatic matches the reference formulas on hand cases."""
    from longcallr_tpu.ops.somatic import calculate_prob_somatic
    # hap1: clean ref (many high-qual ref bases, no alt) → class 0
    c1, p1, c2, p2 = calculate_prob_somatic(
        [30] * 20, [], [30] * 10, [30] * 6, purity=0.3)
    assert c1 == 0 and p1 > 0.99
    # hap2: 6/16 alt at q30 → somatic beats het prior at 30% purity? at
    # minimum it should NOT be called clean ref
    assert c2 != 0
    # balanced alt fraction ~purity → somatic class dominates het
    c1b, _, c2b, _ = calculate_prob_somatic([], [], [30] * 7, [30] * 3, 0.3)
    assert c2b == 2


def test_somatic_flag_end_to_end(tmp_path, rng):
    """--somatic: a low-frac variant confined to one haplotype is scored."""
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.fasta import write_fasta
    from longcallr_tpu.pipeline.engine import process_region
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.tiles.regions import Region
    from simulate import haplotype_seq, BASES

    cfg = preset("hifi-masseq").replace(min_read_length=100, somatic=True)
    ref = make_reference(rng, 6000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=0, min_gap=500)
    haps = {1: haplotype_seq(truth, ref, 1), 2: haplotype_seq(truth, ref, 2)}
    som_pos = 3000
    while som_pos in truth.het_snps:
        som_pos += 17
    som_alt = int(BASES[(list(BASES).index(int(ref[som_pos])) + 1) % 4])
    rows = []
    for i in range(60):
        hap = 1 if i % 2 == 0 else 2
        seq = haps[hap][500:5500].copy()
        # somatic: ~25% of hap1 reads carry the alt at som_pos
        if hap == 1 and i % 8 == 0:
            seq[som_pos - 500] = som_alt
        errs = rng.random(len(seq)) < 0.005
        seq[errs] = BASES[rng.integers(0, 4, size=int(errs.sum()))]
        rows.append((500, f"s{i:03d}", seq))
    bam_path = str(tmp_path / "som.bam")
    with bamio.BamWriter(bam_path, ["chrS"], [len(ref)]) as w:
        for pos, qn, seq in rows:
            w.write_record(qname=qn, flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar([(len(seq), "M")]),
                           seq=bytes(seq), qual=np.full(len(seq), 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    write_fasta(bam_path.replace(".bam", ".fa"), {"chrS": bytes(ref)})
    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    res = process_region(bam, region, ref, cfg)
    # the somatic flag ran without breaking the pipeline; if the site was
    # retained as a cand-somatic and each hap had reads, it gets scored
    assert res.n_candidates > 0


def test_somatic_third_pass_oracle(tmp_path, rng):
    """The production somatic path (third-pass baseq gather + classifier)
    matches a scalar transcription of snpfrags.rs:56-189 + 735-771 +
    somatic.rs:5-80 bit-exactly, including the reference's read-set quirk:
    the third pass re-walks every mapped primary record whose qname has a
    phased fragment, with NO mapq/length/divergence re-check — so a
    low-mapq record sharing a qname with a QC-passed one contributes quals
    the fragment matrix never saw."""
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.io.fasta import write_fasta
    from longcallr_tpu.ops.candidates import select_candidates
    from longcallr_tpu.ops.somatic import detect_somatic_by_het
    from longcallr_tpu.phasing.fragments import (get_fragments,
                                                 gather_somatic_hap_quals)
    from longcallr_tpu.tiles.pileup import build_pileup
    from longcallr_tpu.tiles.regions import Region
    from simulate import BASES
    from oracle_somatic import scalar_detect, scalar_gather

    cfg = preset("hifi-masseq").replace(min_read_length=100, somatic=True)
    ref = make_reference(rng, 6000)
    L = len(ref)

    def pick_alt(refb):
        # avoid the RNA-edit pairs A->G / T->C (candidate.rs:379-407)
        for b in BASES.tolist():
            if b != refb and (refb, b) not in ((65, 71), (84, 67)):
                return b

    site_a, site_b = 2500, 3700            # 0-based; af 8/60 < 0.15 → somatic
    alt_a = pick_alt(int(ref[site_a]))
    alt_b = pick_alt(int(ref[site_b]))
    rows = []
    for i in range(60):
        hap = 1 if i % 2 == 0 else 2
        seq = ref[500:5500].copy()
        if hap == 1 and i % 8 == 0:
            seq[site_a - 500] = alt_a      # 8 hap1 reads carry alt at A
        if hap == 2 and i % 8 == 1:
            seq[site_b - 500] = alt_b      # 8 hap2 reads carry alt at B
        rows.append((f"s{i:03d}", 0, 60, seq))
    # low-mapq second primary sharing qname s000: in the third pass, not in
    # the fragment matrix (fails min_mapq=20 there)
    dup = ref[500:5500].copy()
    dup[site_a - 500] = alt_a
    rows.append(("s000", 0, 10, dup))
    # supplementary record: excluded by both passes
    rows.append(("s001", 0x800, 60, dup.copy()))

    bam_path = str(tmp_path / "som3.bam")
    with bamio.BamWriter(bam_path, ["chrS"], [L]) as w:
        for qn, flag, mapq, seq in rows:
            w.write_record(qname=qn, flag=flag, ref_id=0, pos=500, mapq=mapq,
                           cigar=bamio.encode_cigar([(len(seq), "M")]),
                           seq=bytes(seq), qual=np.full(len(seq), 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    write_fasta(bam_path.replace(".bam", ".fa"), {"chrS": bytes(ref)})
    bam = BamFile(bam_path)
    region = Region(chr="chrS", start=1, end=L + 1)

    pileup = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pileup, cfg)
    ia = int(np.nonzero(cands.pos == site_a)[0][0])
    ib = int(np.nonzero(cands.pos == site_b)[0][0])
    assert cands.cand_somatic[ia] and cands.cand_somatic[ib]

    frags = get_fragments(bam, region, cands, cfg)
    gather = gather_somatic_hap_quals(bam, region, cands)
    # 60 QC-clean reads + the low-mapq duplicate; supplementary excluded
    assert len(gather.rec_qnames) == 61
    assert gather.rec_qnames.count("s000") == 2

    # assign by construction (reads of even index → hap 1); two excluded
    for k, qn in enumerate(frags.qnames):
        i = int(qn[1:])
        frags.assignment[k] = 1 if i % 2 == 0 else 2
    for k, qn in enumerate(frags.qnames):
        if qn in ("s058", "s059"):
            frags.assignment[k] = 0

    phased = {qn: int(a) for qn, a in zip(frags.qnames, frags.assignment)
              if a in (1, 2)}
    expected = scalar_detect(cands, scalar_gather(bam, region, cands, phased),
                             cfg.somatic_purity)
    assert ia in expected and ib in expected

    # fallback path first (no gather): misses the duplicate record's quals
    cands_fb = select_candidates(pileup, cfg)
    frags.somatic_gather = None
    detect_somatic_by_het(frags, cands_fb, cfg.somatic_purity)

    frags.somatic_gather = gather
    detect_somatic_by_het(frags, cands, cfg.somatic_purity)
    for i in np.nonzero(cands.cand_somatic)[0].tolist():
        exp = expected.get(i)
        if exp is None:
            assert not cands.somatic[i]
        else:
            assert bool(cands.somatic[i]) and int(cands.variant_type[i]) == 1
            assert cands.somatic_score[i] == exp[2]   # bit-exact
    # the duplicate record shifts hap1's bucket at site A → fallback differs
    assert cands_fb.somatic_score[ia] != cands.somatic_score[ia]
    # site B has no duplicate-qname records → the two paths agree there
    assert cands_fb.somatic_score[ib] == cands.somatic_score[ib]


def _phased_setup(tmp_path, rng, n_reads=60):
    """Simulated phased BAM + caller VCF + matching GTF for ASE modes."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=0, min_gap=600)
    bam_path = str(tmp_path / "pm.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=n_reads, read_len=4000,
                 err_rate=0.01)
    out = run(bam_path, bam_path.replace(".bam", ".fa"), str(tmp_path / "pm"), cfg)
    gtf = str(tmp_path / "pm.gtf")
    _write_gtf(gtf, "chrS", [("G1", "GENE1", 1, 8000, [(1, 8000)])])
    return truth, out, gtf


def test_ase_patmat_mode(tmp_path, rng):
    """--vcf1 + --vcf2: haplotypes resolved to paternal/maternal via a
    phased DNA VCF (longcallR-ase.py:481-553)."""
    truth, out, gtf = _phased_setup(tmp_path, rng)
    # phased DNA VCF: declare ALT (carried by hap1 in simulation truth) as
    # paternal at every het site → one haplotype should be all-paternal
    dna_vcf = str(tmp_path / "dna.vcf")
    with open(dna_vcf, "w") as f:
        f.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for p, (refb, altb) in sorted(truth.het_snps.items()):
            f.write(f"chrS\t{p+1}\t.\t{chr(refb)}\t{chr(altb)}\t60\tPASS\t.\t"
                    f"GT\t0|1\n")
    out_tsv = str(tmp_path / "pm.patmat_ase.tsv")
    ase.analyze_ase_genes(gtf, out.phased_bam_path, out_tsv, threads=1,
                          gene_types={"protein_coding"}, min_support=5,
                          overdispersion=0.001,
                          vcf1=out.vcf_path, vcf2=dna_vcf)
    rows = [l.split("\t") for l in open(out_tsv).read().splitlines()[1:]]
    assert len(rows) == 1
    hdr = open(out_tsv).read().splitlines()[0].split("\t")
    assert hdr[-4:] == ["H1_Paternal", "H1_Maternal", "H2_Paternal",
                        "H2_Maternal"]
    h1p, h1m, h2p, h2m = (int(x) for x in rows[0][6:10])
    # each haplotype's reads resolve consistently to one parent
    assert h1p + h1m > 0 and h2p + h2m > 0
    assert (h1p == 0 or h1m == 0) and (h2p == 0 or h2m == 0)
    # and the two haplotypes resolve to OPPOSITE parents
    assert (h1p > 0) != (h2p > 0)


def test_ase_filtering_mode(tmp_path, rng):
    """--vcf1 + --vcf3: genes kept only when a DNA-supported phase-set
    variant shows significantly imbalanced allele fraction
    (longcallR-ase.py:583-595 — balanced hets do NOT count as support)."""
    # imbalanced 70/30 haplotype expression → called het sites have af≈0.3
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.fasta import write_fasta
    from simulate import haplotype_seq, BASES
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=0, min_gap=600)
    haps = {1: haplotype_seq(truth, ref, 1), 2: haplotype_seq(truth, ref, 2)}
    rows = []
    for i in range(80):
        hap = 1 if i % 10 < 3 else 2
        pos = int(rng.integers(0, 3000))
        seq = haps[hap][pos:pos + 4500].copy()
        errs = rng.random(len(seq)) < 0.01
        seq[errs] = BASES[rng.integers(0, 4, size=int(errs.sum()))]
        truth.hap_of_read[f"f{i:03d}"] = hap
        rows.append((pos, f"f{i:03d}", seq))
    rows.sort(key=lambda t: t[0])
    bam_path = str(tmp_path / "fm.bam")
    with bamio.BamWriter(bam_path, ["chrS"], [len(ref)]) as w:
        for pos, qn, seq in rows:
            w.write_record(qname=qn, flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar([(len(seq), "M")]),
                           seq=bytes(seq), qual=np.full(len(seq), 30),
                           tags=bamio.make_tag_bytes("de", "f", 0.001))
    write_fasta(bam_path.replace(".bam", ".fa"), {"chrS": bytes(ref)})
    out = run(bam_path, bam_path.replace(".bam", ".fa"), str(tmp_path / "fm"), cfg)
    gtf = str(tmp_path / "fm.gtf")
    _write_gtf(gtf, "chrS", [("G1", "GENE1", 1, 8000, [(1, 8000)])])
    # DNA VCF supporting the called het sites
    dna_vcf = str(tmp_path / "dna3.vcf")
    with open(dna_vcf, "w") as f:
        f.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
        for p, (refb, altb) in sorted(truth.het_snps.items()):
            f.write(f"chrS\t{p+1}\t.\t{chr(refb)}\t{chr(altb)}\t60\tPASS\t.\t"
                    f"GT\t0/1\n")
    out_tsv = str(tmp_path / "pm.filter_ase.tsv")
    ase.analyze_ase_genes(gtf, out.phased_bam_path, out_tsv, threads=1,
                          gene_types={"protein_coding"}, min_support=5,
                          overdispersion=0.001,
                          vcf1=out.vcf_path, vcf3=dna_vcf)
    rows = [l.split("\t") for l in open(out_tsv).read().splitlines()[1:]]
    assert len(rows) == 1  # gene retained (DNA-supported)
    # empty DNA VCF → gene filtered out (h1=h2=0 rows are dropped)
    empty_vcf = str(tmp_path / "empty.vcf")
    with open(empty_vcf, "w") as f:
        f.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL\t"
                "FILTER\tINFO\tFORMAT\tS\n")
    out_tsv2 = str(tmp_path / "pm2.filter_ase.tsv")
    ase.analyze_ase_genes(gtf, out.phased_bam_path, out_tsv2, threads=1,
                          gene_types={"protein_coding"}, min_support=5,
                          overdispersion=0.001,
                          vcf1=out.vcf_path, vcf3=empty_vcf)
    rows2 = [l.split("\t") for l in open(out_tsv2).read().splitlines()[1:]]
    assert len(rows2) == 0


def test_beta_binomial_matches_scipy(rng):
    """The gammaln-composed pmf reproduces scipy.stats.betabinom (the
    implementation the reference script uses) and the flattened many-path
    equals the scalar path."""
    from scipy.stats import betabinom
    from longcallr_tpu.utils.stats import (beta_binomial_two_sided,
                                           beta_binomial_two_sided_many,
                                           convert_mu_rho_to_alpha_beta)
    mu, rho = 0.5, 0.02
    a, b = convert_mu_rho_to_alpha_beta(mu, rho)
    ks, ns = [], []
    for _ in range(60):
        n = int(rng.integers(1, 500))
        ks.append(int(rng.integers(0, n + 1)))
        ns.append(n)
    for k, n in zip(ks[:20], ns[:20]):
        bb = betabinom(n, a, b)
        pmf = bb.pmf(np.arange(n + 1))
        want = float(pmf[pmf <= bb.pmf(k)].sum())
        got = beta_binomial_two_sided(k, n, mu, rho)
        assert abs(got - want) < 1e-10, (k, n)
    many = beta_binomial_two_sided_many(np.array(ks), np.array(ns), mu, rho)
    scal = [beta_binomial_two_sided(k, n, mu, rho) for k, n in zip(ks, ns)]
    # the many-path composes the pmf via gammaln and sums via bincount; the
    # scalar path is reference-exact (scipy betabinom + sequential sum)
    np.testing.assert_allclose(many, scal, rtol=1e-12, atol=1e-14)
    # n == 0 rows come back as p = 1
    out = beta_binomial_two_sided_many(np.array([0, 2]), np.array([0, 7]),
                                       mu, rho)
    assert out[0] == 1.0


def _run_pool_driver(tmp_path, script, *argv):
    """Run a pool-equality driver in a fresh subprocess: no live JAX backend
    there, so the fork-based pool engages via its own auto gate (forking the
    pytest process, which has a live backend, is exactly what the gate
    forbids)."""
    import os
    import subprocess
    import sys

    drv = str(tmp_path / "driver.py")
    with open(drv, "w") as f:
        f.write(script)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    r = subprocess.run([sys.executable, drv, *argv], cwd=repo, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "POOL_OK" in r.stdout, r.stdout


_ASE_DRIVER = r"""
import sys
bam_path, gtf = sys.argv[1:3]
from longcallr_tpu.analysis import ase
from longcallr_tpu.io.bam import BamFile
ase.ASE_CHUNK_MIN = 8
assert ase._fork_pool_ok(), "fork pool gate closed in a fresh process"
_, _, _, exon_regions = ase.get_gene_regions(gtf, {"protein_coding"})
merged = ase.merge_gene_exon_regions(exon_regions)
bam = BamFile(bam_path)
serial = ase.assign_reads_to_gene(bam, merged, threads=1)
pooled = ase.assign_reads_to_gene(bam, merged, threads=3)
assert serial and pooled == serial, (len(serial), len(pooled))
print("POOL_OK")
"""


def test_ase_assignment_parallel_equals_serial(tmp_path, rng):
    """The fork-pool chunked read→gene assignment equals the serial walk
    (exercised in a jax-backend-free subprocess)."""
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=0, min_gap=600)
    bam_path = str(tmp_path / "pp.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=120, read_len=3000,
                 err_rate=0.01, with_introns=True)
    gtf = str(tmp_path / "genes.gtf")
    _write_gtf(gtf, "chrS", [
        ("G1", "GENE1", 1, 4500, [(1, 2000), (2600, 4500)]),
        ("G2", "GENE2", 4501, 9000, [(4501, 9000)]),
    ])
    _run_pool_driver(tmp_path, _ASE_DRIVER, bam_path, gtf)


_ASJ_DRIVER = r"""
import sys
bam_path, gtf = sys.argv[1:3]
from longcallr_tpu.analysis import ase, asj
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.io.fasta import FastaFile
ase.ASE_CHUNK_MIN = 1
assert ase._fork_pool_ok(), "fork pool gate closed in a fresh process"
_, _, _, exon_regions = ase.get_gene_regions(gtf, {"protein_coding"})
merged = ase.merge_gene_exon_regions(exon_regions)
bam = BamFile(bam_path)
fasta = FastaFile(bam_path.replace(".bam", ".fa"))
serial = asj.load_reads(bam, fasta, merged, no_gtag=False, threads=1)
pooled = asj.load_reads(bam, fasta, merged, no_gtag=False, threads=3)
assert serial[0], "no assignments"
# the duplicate qname whose LAST record has no junctions must be absent
# from positions/tags in BOTH variants (cross-chunk delete semantics)
assert "dup_read" not in serial[1] and "dup_read" not in serial[2]
for a, b in zip(serial, pooled):
    assert a == b
print("POOL_OK")
"""


def test_asj_load_reads_parallel_equals_serial(tmp_path, rng):
    """ASJ's fork-pool chunked load_reads equals the serial walk, including
    a duplicate qname whose later record deletes entries across chunks."""
    import numpy as _np

    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.io.fasta import write_fasta

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=0, min_gap=600)
    bam_path = str(tmp_path / "aj.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=100, read_len=3000,
                 err_rate=0.01, with_introns=True)
    # append a duplicate-qname pair: early spliced record, late junction-free
    # record (sorted far apart → lands in a different chunk)
    src = BamFile(bam_path)
    with bamio.BamWriter(bam_path, ["chrS"], [len(ref)]) as w:
        def emit(pos, cigar_items, qname):
            ln = sum(l for l, op in cigar_items if op in ("M",))
            seq = bytes(ref[pos:pos + 600]) + bytes(ref[pos:pos + 600])
            seq = seq[:sum(l for l, op in cigar_items if op in ("M", "I"))]
            w.write_record(qname=qname, flag=0, ref_id=0, pos=pos, mapq=60,
                           cigar=bamio.encode_cigar(cigar_items),
                           seq=seq, qual=_np.full(len(seq), 30, _np.uint8))
        wrote_dup_early = False
        for i in range(src.n_records):
            r = src.read(i)
            if not wrote_dup_early and r.pos > 200:
                emit(150, [(300, "M"), (200, "N"), (300, "M")], "dup_read")
                wrote_dup_early = True
            w.write_record(qname=r.qname, flag=int(r.flag), ref_id=0,
                           pos=int(r.pos), mapq=int(r.mapq), cigar=r.cigar,
                           seq=bytes(r.seq), qual=r.qual,
                           tags=r.aux_bytes())
        emit(8200, [(600, "M")], "dup_read")   # junction-free, last
    write_fasta(bam_path.replace(".bam", ".fa"), {"chrS": bytes(ref)})
    gtf = str(tmp_path / "genes.gtf")
    _write_gtf(gtf, "chrS", [
        ("G1", "GENE1", 1, 9000, [(1, 4000), (4600, 9000)]),
    ])
    _run_pool_driver(tmp_path, _ASJ_DRIVER, bam_path, gtf)
