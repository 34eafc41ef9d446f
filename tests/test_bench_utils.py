"""Bench-side utilities: the standing accuracy leg's metric math and the
truth sidecars written by the workload generators."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_accuracy_metrics_counts(tmp_path):
    """TP/FP/FN, precision/recall/F1 and switch-error counting: orientation
    flips between consecutive truth hets inside one PS are switches; global
    per-PS flips are not; wrong-allele or off-truth hets are FPs."""
    from bench import accuracy_metrics

    truth = {"chrA": [[99, "A", "C"], [199, "G", "T"], [299, "C", "A"],
                      [399, "T", "G"]],
             "chrB": [[49, "A", "T"], [149, "C", "G"]]}
    lines = [
        "##x", "#CHROM\tPOS\t...",
        # chrA PS=100: 0|1, 1|0 (switch), 1|0 (no switch)
        "chrA\t100\t.\tA\tC\t60\tPASS\tRDS=select\tGT:GQ:PS:DP:AF:PQ\t"
        "0|1:20:100:30:0.5:30",
        "chrA\t200\t.\tG\tT\t60\tPASS\tRDS=select\tGT:GQ:PS:DP:AF:PQ\t"
        "1|0:20:100:30:0.5:30",
        "chrA\t300\t.\tC\tA\t60\tPASS\tRDS=select\tGT:GQ:PS:DP:AF:PQ\t"
        "1|0:20:100:30:0.5:30",
        # chrA 400: truth site but WRONG alt -> FP (and the truth site is FN)
        "chrA\t400\t.\tT\tC\t60\tPASS\tRDS=select\tGT:GQ:DP:AF\t0/1:20:30:0.5",
        # chrB PS=50: globally flipped orientation (1|0 then 1|0) -> no switch
        "chrB\t50\t.\tA\tT\t60\tPASS\tRDS=select\tGT:GQ:PS:DP:AF:PQ\t"
        "1|0:20:50:30:0.5:30",
        "chrB\t150\t.\tC\tG\t60\tPASS\tRDS=select\tGT:GQ:PS:DP:AF:PQ\t"
        "1|0:20:50:30:0.5:30",
        # off-truth het -> FP; hom and non-het records ignored
        "chrB\t500\t.\tG\tA\t60\tPASS\tRDS=select\tGT:GQ:DP:AF\t0/1:20:30:0.5",
        "chrB\t600\t.\tG\tA\t60\tPASS\tRDS=noselect\tGT:GQ:DP:AF\t1/1:20:30:0.9",
    ]
    vcf = str(tmp_path / "acc.vcf")
    with open(vcf, "w") as f:
        f.write("\n".join(lines) + "\n")
    m = accuracy_metrics(vcf, truth)
    assert m["acc_truth_sites"] == 6
    assert m["acc_tp"] == 5 and m["acc_fp"] == 2 and m["acc_fn"] == 1
    assert m["acc_phased_tp"] == 5
    assert m["acc_switch_pairs"] == 3 and m["acc_switch_errors"] == 1
    assert abs(m["acc_precision"] - 5 / 7) < 1e-4   # rounded to 5 decimals
    assert abs(m["acc_recall"] - 5 / 6) < 1e-4


def test_workload_truth_sidecar(tmp_path):
    """The generators persist the planted truth (pos0/ref/alt per contig);
    the planted alt differs from ref and avoids A→G / T→C editing pairs."""
    from longcallr_tpu.utils.bench_workload import make_genome_workload

    bam = str(tmp_path / "g.bam")
    fa = str(tmp_path / "g.fa")
    spec = [("chrA", [(6_000, 25, 300)]), ("chrB", [(5_000, 25, 400)])]
    params = make_genome_workload(bam, fa, contigs=spec)
    assert set(params["truth"]) == {"chrA", "chrB"}
    n = sum(len(v) for v in params["truth"].values())
    assert n == params["n_snps"] > 10
    for tri in params["truth"]["chrA"]:
        p, r, a = tri
        assert r != a and (r, a) not in (("A", "G"), ("T", "C"))
    # cached reuse returns the same truth
    with open(bam + ".params.json") as f:
        side = json.load(f)
    again = make_genome_workload(bam, fa, contigs=spec)
    assert again["truth"] == side["truth"] == params["truth"]

def test_accuracy_fn_reasons(tmp_path):
    """The acc_fn_reasons classifier: a missed truth site whose BAM depth is
    below min_depth is 'below_min_depth' (correct reference filtering);
    a missed site at full depth is 'uncalled_other'. A truth site called
    with the WRONG allele still counts as a FN to classify."""
    import numpy as np
    from bench import accuracy_metrics
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.bai import build_bai

    bam = str(tmp_path / "d.bam")
    with bamio.BamWriter(bam, ["chrA"], [10_000]) as w:
        qual = np.full(500, 30, np.uint8)
        # deep coverage at 1000-1500 (8 reads), single read at 3000
        for i in range(8):
            w.write_record(qname=f"r{i}", flag=0, ref_id=0, pos=1000,
                           mapq=60, cigar=bamio.encode_cigar([(500, "M")]),
                           seq=b"A" * 500, qual=qual)
        w.write_record(qname="lone", flag=0, ref_id=0, pos=3000, mapq=60,
                       cigar=bamio.encode_cigar([(500, "M")]),
                       seq=b"A" * 500, qual=qual)
    build_bai(bam)
    truth = {"chrA": [[1100, "A", "C"], [1200, "A", "T"], [3100, "A", "G"]]}
    vcf = str(tmp_path / "a.vcf")
    with open(vcf, "w") as f:
        f.write("#h\n"
                # 1100 matched; 1200 wrong alt (FP + FN at full depth)
                "chrA\t1101\t.\tA\tC\t60\tPASS\t.\tGT\t0/1\n"
                "chrA\t1201\t.\tA\tG\t60\tPASS\t.\tGT\t0/1\n")
    m = accuracy_metrics(vcf, truth, bam_path=bam, min_depth=6)
    assert m["acc_tp"] == 1 and m["acc_fn"] == 2
    assert m["acc_fn_reasons"] == {"below_min_depth": 1, "uncalled_other": 1}
