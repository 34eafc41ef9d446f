"""Golden regression gates for the non-demo presets (round-2 review).

The demo golden (tests/test_end_to_end.py::test_demo_golden_records) covers
only the hifi-masseq configuration, whose distinctive code paths exclude the
strand-bias filter (strand_bias=false) and ONT end trimming. These gates
byte-freeze records + haplotags for deterministic simulated workloads under
the other three presets — with the preset-specific code ACTIVE:

  * ont-cdna  — strand_bias=true (candidate.rs:199-234) AND ONT end trimming
                (util.rs:745-751), via a planted single-strand artifact site
                that the SOR/binomial filter must reject;
  * ont-drna  — trimming active, strand_bias=false: the SAME artifact site
                is *not* filtered (the two ONT goldens must differ there);
  * hifi-isoseq — strand_bias=true without trimming;

plus an ``--exon-only`` workload (annotation intersect + exon coverage mask,
thread.rs:80-92 / util.rs:518-556) under hifi-masseq.

Regenerate after a VERIFIED intended change with
``LONGCALLR_REGEN_GOLDEN=1 python -m pytest tests/test_golden_presets.py``.
"""

import os

import numpy as np
import pytest

from longcallr_tpu.config import preset
from longcallr_tpu.pipeline.caller import run

from simulate import make_reference, plant_snps, simulate_bam

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
REGEN = os.environ.get("LONGCALLR_REGEN_GOLDEN") == "1"

# fixed per-preset seeds → fully deterministic workloads and pipelines
_SEEDS = {"ont-cdna": 101, "ont-drna": 102, "hifi-isoseq": 103,
          "exon-only": 104}


def _artifact_site(truth, ref, lo=4400, min_dist=150):
    """A position ≥min_dist from every planted SNP, with a fixed alt."""
    planted = sorted(set(truth.het_snps) | set(truth.hom_snps))
    p = lo
    while any(abs(p - q) < min_dist for q in planted):
        p += 37
    refb = int(ref[p])
    alt = int(b"ACGT"[(b"ACGT".index(bytes([refb])) + 2) % 4])
    return p, alt


def _mk_workload(tmp_path, name):
    rng = np.random.default_rng(_SEEDS[name])
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=2, min_gap=400)
    site, alt = _artifact_site(truth, ref)
    bam = str(tmp_path / f"{name}.bam")
    simulate_bam(bam, rng, ref, truth, n_reads=90, read_len=2500,
                 err_rate=0.01, biased_sites={site: alt})
    return bam, bam.replace(".bam", ".fa"), truth, site


def _records_and_tags(out):
    from longcallr_tpu.io.bam import BamFile

    with open(out.vcf_path) as f:
        records = [l for l in f if not l.startswith("#")]
    rows = []
    pb = BamFile(out.phased_bam_path)
    for i in range(pb.n_records):
        r = pb.read(i)
        hp = r.get_tag("HP")
        if hp is not None:
            rows.append(f"{r.qname}\t{hp}\t{r.get_tag('PS')}\n")
    rows.sort()
    return records, rows


def _check_golden(tag, records, tags):
    rec_path = os.path.join(GOLDEN_DIR, f"preset_{tag}_records.vcf")
    tag_path = os.path.join(GOLDEN_DIR, f"preset_{tag}_tags.tsv")
    if REGEN:
        with open(rec_path, "w") as f:
            f.writelines(records)
        with open(tag_path, "w") as f:
            f.writelines(tags)
        pytest.skip(f"regenerated golden for {tag}")
    with open(rec_path) as f:
        assert records == f.readlines(), f"{tag}: records drifted"
    with open(tag_path) as f:
        assert tags == f.readlines(), f"{tag}: haplotags drifted"


@pytest.mark.parametrize("name", ["ont-cdna", "ont-drna", "hifi-isoseq"])
def test_preset_golden(tmp_path, name):
    bam, fa, truth, site = _mk_workload(tmp_path, name)
    cfg = preset(name).replace(threads=2)
    out = run(bam, fa, str(tmp_path / "out"), cfg)
    records, tags = _records_and_tags(out)
    assert records and tags, "workload produced no output to freeze"
    # the preset's distinctive path is ACTIVE: the single-strand artifact
    # site must be absent (or non-selected) under strand_bias=true presets
    # and called under ont-drna (strand_bias=false)
    site_recs = [r for r in records if int(r.split("\t")[1]) == site + 1]
    if cfg.strand_bias:
        assert not site_recs, \
            f"{name}: strand-biased site escaped the SOR/binomial filter"
    else:
        assert site_recs, \
            f"{name}: expected the unfiltered artifact site to be reported"
    _check_golden(name, records, tags)


def test_exon_only_golden(tmp_path):
    """--exon-only with a GTF: gene intersect (merge=True) + CDS-as-exon
    coverage mask; the frozen surface includes regions clipped to genes and
    candidates suppressed outside CDS."""
    rng = np.random.default_rng(_SEEDS["exon-only"])
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=2, min_gap=400)
    bam = str(tmp_path / "exon.bam")
    simulate_bam(bam, rng, ref, truth, n_reads=90, read_len=2500,
                 err_rate=0.01)
    fa = bam.replace(".bam", ".fa")
    anno = str(tmp_path / "exon.gtf")
    # one gene over the left 2/3 with CDS blocks covering only part of it:
    # planted SNPs inside CDS survive; in-gene-outside-CDS are masked
    with open(anno, "w") as f:
        f.write('chrS\tsrc\tgene\t1\t6000\t.\t+\t.\tgene_id "G1";\n')
        f.write('chrS\tsrc\tCDS\t400\t2600\t.\t+\t.\tgene_id "G1";\n')
        f.write('chrS\tsrc\tCDS\t3200\t5400\t.\t+\t.\tgene_id "G1";\n')
    cfg = preset("hifi-masseq").replace(threads=2, exon_only=True)
    out = run(bam, fa, str(tmp_path / "out"), cfg, anno_path=anno)
    records, tags = _records_and_tags(out)
    assert records and tags
    # nothing called outside the gene span or inside the CDS gap
    for r in records:
        pos1 = int(r.split("\t")[1])
        assert pos1 <= 6000
    _check_golden("exon_only", records, tags)
