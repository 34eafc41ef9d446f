"""Annotation parsing (CDS-as-exon quirk) and --exon-only end-to-end."""

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.pipeline.annotation import (intersect_gene_regions,
                                               lapper_intervals,
                                               parse_annotation)
from longcallr_tpu.pipeline.caller import run
from longcallr_tpu.tiles.regions import Region

from simulate import make_reference, plant_snps, simulate_bam


def _write_anno(path, chrom, genes):
    """genes: list of (gene_id, start, end, cds_list) 1-based inclusive."""
    with open(path, "w") as f:
        for gid, s, e, cds in genes:
            f.write(f'{chrom}\tsrc\tgene\t{s}\t{e}\t.\t+\t.\tgene_id "{gid}";\n')
            for (cs, ce) in cds:
                f.write(f'{chrom}\tsrc\tCDS\t{cs}\t{ce}\t.\t+\t.\tgene_id "{gid}";\n')


def test_parse_annotation_merge_and_cds(tmp_path):
    p = str(tmp_path / "a.gtf")
    _write_anno(p, "chrS", [
        ("G1", 100, 500, [(120, 200), (300, 450)]),
        ("G2", 450, 900, [(460, 600)]),     # overlaps G1 → merged
        ("G3", 2000, 2500, [(2100, 2400)]),
    ])
    gene_regions, exon_regions = parse_annotation(p)
    regs = gene_regions["chrS"]
    # G1 and G2 merged (overlap), gene_ids comma-joined (util.rs:397-407)
    assert len(regs) == 2
    assert regs[0].start == 100 and regs[0].end == 901
    assert regs[0].gene_id == "G1,G2"
    assert regs[1].gene_id == "G3"
    # CDS (not exon) intervals per gene, [start, end+1)
    assert exon_regions["G1"] == [(120, 201), (300, 451)]
    assert exon_regions["G2"] == [(460, 601)]


def test_parse_annotation_gff3_format(tmp_path):
    p = str(tmp_path / "a.gff3")
    with open(p, "w") as f:
        f.write("chrS\tsrc\tgene\t10\t90\t.\t+\t.\tgene_id=GX;other=1\n")
        f.write("chrS\tsrc\tCDS\t20\t60\t.\t+\t.\tgene_id=GX\n")
    gene_regions, exon_regions = parse_annotation(p)
    assert gene_regions["chrS"][0].gene_id == "GX"
    assert exon_regions["GX"] == [(20, 61)]


def test_unsorted_annotation_raises(tmp_path):
    p = str(tmp_path / "u.gtf")
    _write_anno(p, "chrS", [("G2", 500, 900, []), ("G1", 100, 300, [])])
    with pytest.raises(ValueError, match="not sorted"):
        parse_annotation(p)


def test_lapper_intervals_merge_split():
    targets = [Region(chr="chrS", start=100, end=500, gene_id="G1"),
               Region(chr="chrS", start=600, end=900, gene_id="G2")]
    queries = [Region(chr="chrS", start=50, end=700, max_coverage=9)]
    out = lapper_intervals(queries, targets, merge=True)
    assert [(r.start, r.end, r.gene_id) for r in out] == [
        (100, 500, "G1"), (600, 700, "G2")]


def test_exon_only_end_to_end(tmp_path, rng):
    cfg = preset("hifi-masseq").replace(min_read_length=100, exon_only=True)
    ref = make_reference(rng, 8000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=0, min_gap=700)
    bam_path = str(tmp_path / "eo.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=70, read_len=4000,
                 err_rate=0.01)
    anno = str(tmp_path / "eo.gtf")
    # gene covering [1, 4000] with CDS over [1, 4000]; SNPs beyond 4000
    # must not be called
    _write_anno(anno, "chrS", [("G1", 1, 4000, [(1, 4000)])])
    out = run(bam_path, bam_path.replace(".bam", ".fa"), str(tmp_path / "oe"),
              cfg, anno_path=anno)
    import re
    pos = [int(l.split("\t")[1]) for l in open(out.vcf_path)
           if not l.startswith("#")]
    assert pos, "no records"
    assert max(pos) <= 4000
    inside = [p for p in truth.het_snps if p < 3900]
    found = sum(1 for p in inside if (p + 1) in pos)
    assert found >= max(1, int(len(inside) * 0.6))
