#!/usr/bin/env python
"""Differential fuzz campaign: N random preset x shape workloads through the
fast pipeline vs the end-to-end scalar oracle (tests/oracle_pipeline.py),
gated byte-exactly on VCF lines, read assignments and phase sets.

This is the tool that found the structural-tie divergences fixed by
LONGCALLR_TIE_TOL (PARITY.md deviation #8): 4/200 random regions chose
their optimum by summation-order rounding. Run it after any change to the
phasing decision logic:

    python experiments/fuzz_campaign.py 200

Each case is fully reproducible from its index (seed [777, case]); failing
cases print their parameters and can be frozen into
tests/test_oracle_pipeline.py::test_oracle_pipeline_structural_ties.
"""
import os, sys, time, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests'))
import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)
import numpy as np
from longcallr_tpu.config import preset
from longcallr_tpu.io.bam import BamFile
from longcallr_tpu.pipeline.engine import process_region
from longcallr_tpu.tiles.regions import Region
from longcallr_tpu.utils import malloc_tune; malloc_tune.tune()
from oracle_pipeline import scalar_process_region
from simulate import BASES, make_reference, plant_snps, simulate_bam
import tempfile, shutil

MULTI = "--multi" in sys.argv
ANALYSIS = "--analysis" in sys.argv
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
N_CASES = int(argv[0]) if argv else 150
PRESETS = ["hifi-masseq", "hifi-isoseq", "ont-cdna", "ont-drna"]
t_start = time.monotonic()
if MULTI or ANALYSIS:
    N_SINGLE = 0
else:
    N_SINGLE = N_CASES
fails = []
for case in range(N_SINGLE):
    rng = np.random.default_rng([777, case])
    pname = PRESETS[case % 4]
    over = {}
    if rng.random() < 0.25:
        over = dict(downsample=True, downsample_depth=int(rng.integers(25, 60)))
    cfg = preset(pname).replace(min_read_length=100, **over)
    ref_len = int(rng.integers(4000, 8000))
    ref = make_reference(rng, ref_len)
    n_het = int(rng.integers(3, 14))
    n_hom = int(rng.integers(0, 4))
    n_tri = int(rng.integers(0, 3))
    min_gap = int(rng.integers(120, 500))
    truth = plant_snps(rng, ref, n_het=n_het, n_hom=n_hom, n_tri=n_tri,
                       min_gap=min_gap)
    # random stress injections
    inject = rng.random()
    if inject < 0.15:
        p0 = int(rng.integers(1000, ref_len - 1000))
        for d in (0, 2, 4):
            refb = int(ref[p0 + d])
            altb = int(BASES[(list(BASES).index(refb) + 1) % 4])
            truth.het_snps[p0 + d] = (refb, altb)
    sim = dict(n_reads=int(rng.integers(25, 70)),
               read_len=int(rng.integers(1200, 3200)),
               err_rate=float(rng.choice([0.002, 0.008, 0.02, 0.035])))
    if rng.random() < 0.3:
        sim.update(with_introns=True, softclip=int(rng.integers(0, 8)))
    elif rng.random() < 0.2:
        p1 = int(rng.integers(1000, ref_len - 1000))
        refb = int(ref[p1])
        sim["biased_sites"] = {p1: int(BASES[(list(BASES).index(refb)+1) % 4])}
    d = tempfile.mkdtemp()
    try:
        bam_path = os.path.join(d, "f.bam")
        simulate_bam(bam_path, rng, ref, truth, **sim)
        bam = BamFile(bam_path)
        region = Region(chr="chrS", start=1, end=len(ref) + 1)
        fast = process_region(bam, region, ref, cfg)
        o_lines, o_assign, o_ps = scalar_process_region(bam, region, ref, cfg)
        ok = (fast.vcf_lines == o_lines and fast.read_assignments == o_assign
              and fast.phase_sets == o_ps)
        if not ok:
            fails.append(case)
            print(json.dumps(dict(case=case, preset=pname, over=over,
                                  sim={k: v for k, v in sim.items()
                                       if k != "biased_sites"},
                                  lines=(len(fast.vcf_lines), len(o_lines)))),
                  flush=True)
    finally:
        shutil.rmtree(d, ignore_errors=True)
    if case % 25 == 24:
        print(f"... {case+1}/{N_CASES} cases, {len(fails)} failures, "
              f"{round(time.monotonic()-t_start,1)}s", flush=True)
if not MULTI:
    print(json.dumps(dict(cases=N_CASES, failures=fails,
                          wall_s=round(time.monotonic() - t_start, 1))), flush=True)


def run_multi_campaign(n_cases: int) -> list:
    """Multi-region mode: 2-4 coverage-isolated loci on one contig through
    run(batched=True) — waves, bucket composition, the batched candidate
    kernel, ordered merge, first-wins haplotags — against the per-region
    scalar-oracle composition. Gated on VCF body lines and phased-BAM
    HP/PS tags."""
    import tempfile, shutil
    from longcallr_tpu.pipeline.caller import run
    from longcallr_tpu.tiles.regions import extract_isolated_regions_parallel
    from longcallr_tpu.io import bam as bamio
    from longcallr_tpu.io.fasta import write_fasta
    from simulate import BASES, make_reference, haplotype_seq, Truth

    fails = []
    t0 = time.monotonic()
    for case in range(n_cases):
        rng = np.random.default_rng([888, case])
        pname = PRESETS[case % 4]
        cfg = preset(pname).replace(min_read_length=100,
                                    threads=int(rng.integers(1, 5)))
        n_loci = int(rng.integers(2, 5))
        locus_len = int(rng.integers(2500, 5000))
        gap = int(rng.integers(1500, 4000))
        L = n_loci * (locus_len + gap) + 1000
        ref = make_reference(rng, L)
        truth = Truth(ref=bytes(ref))
        spans = []
        for li in range(n_loci):
            s = 500 + li * (locus_len + gap)
            spans.append((s, s + locus_len))
            n_het = int(rng.integers(2, 10))
            cursor = s + 150
            while cursor < s + locus_len - 150 and n_het > 0:
                refb = int(ref[cursor])
                altb = int(BASES[(list(BASES).index(refb)
                                  + int(rng.integers(1, 4))) % 4])
                truth.het_snps[cursor] = (refb, altb)
                cursor += int(rng.integers(200, 450))
                n_het -= 1
        haps = {1: haplotype_seq(truth, ref, 1),
                2: haplotype_seq(truth, ref, 2)}
        reads = []
        qi = 0
        err = float(rng.choice([0.004, 0.01, 0.025]))
        for (s, e) in spans:
            for _ in range(int(rng.integers(18, 45))):
                hap = int(rng.integers(1, 3))
                rl = min(int(rng.integers(800, locus_len - 100)), e - s - 1)
                pos = int(rng.integers(s, e - rl))
                seq = haps[hap][pos:pos + rl].copy()
                em = rng.random(rl) < err
                if em.any():
                    seq[em] = BASES[rng.integers(0, 4, size=int(em.sum()))]
                reads.append((pos, f"m{qi:05d}", 16 * (qi % 2), seq))
                qi += 1
        reads.sort(key=lambda t: t[0])
        d = tempfile.mkdtemp()
        try:
            bam_path = os.path.join(d, "m.bam")
            with bamio.BamWriter(bam_path, ["chrM"], [L]) as w:
                for pos, qn, flag, seq in reads:
                    w.write_record(qname=qn, flag=flag, ref_id=0, pos=pos,
                                   mapq=60,
                                   cigar=bamio.encode_cigar([(len(seq), "M")]),
                                   seq=bytes(seq),
                                   qual=np.full(len(seq), 30),
                                   tags=bamio.make_tag_bytes("de", "f", 0.001))
            fa_path = os.path.join(d, "m.fa")
            write_fasta(fa_path, {"chrM": bytes(ref)})
            out = run(bam_path, fa_path, os.path.join(d, "out"), cfg,
                      batched=True)
            with open(out.vcf_path) as f:
                got = [l.rstrip("\n") for l in f if not l.startswith("#")]
            # oracle: per-region scalar composition in (contig, start) order
            bam = BamFile(bam_path)
            regions = extract_isolated_regions_parallel(bam, [("chrM", L)],
                                                        cfg)
            want = []
            ra = {}
            ps = {}
            for reg in sorted(regions, key=lambda r: r.start):
                lines, a, p = scalar_process_region(bam, reg, ref, cfg)
                want.extend(lines)
                for k, v in a.items():
                    ra.setdefault(k, v)
                for k, v in p.items():
                    ps.setdefault(k, v)
            ok = got == want
            if ok and out.phased_bam_path:
                pb = BamFile(out.phased_bam_path)
                for i in range(pb.n_records):
                    r = pb.read(i)
                    hp = r.get_tag("HP")
                    want_hp = ra.get(r.qname)
                    want_hp = want_hp if want_hp not in (None, 0) else None
                    want_ps = ps.get(r.qname)
                    if hp != want_hp or r.get_tag("PS") != want_ps:
                        ok = False
                        break
            if not ok:
                fails.append(case)
                print(json.dumps(dict(mode="multi", case=case, preset=pname,
                                      n_loci=n_loci,
                                      lines=(len(got), len(want)))),
                      flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        if case % 25 == 24:
            print(f"... multi {case+1}/{n_cases}, {len(fails)} failures, "
                  f"{round(time.monotonic()-t0,1)}s", flush=True)
    print(json.dumps(dict(mode="multi", cases=n_cases, failures=fails,
                          wall_s=round(time.monotonic() - t0, 1))), flush=True)
    return fails


def run_analysis_campaign(n_cases: int) -> list:
    """Analysis-layer mode (--analysis): random annotation + phased-BAM +
    VCF scenarios (tests/simulate_analysis.py) through the production
    ASE/ASJ tools vs their scalar oracle transcriptions
    (tests/oracle_{ase,asj}.py), byte-exact on every TSV. Cases cycle
    through the five modes: ase-plain, ase-patmat, ase-filter, asj,
    asj-filter. Seeds [4101|4202, case] match the standing suite gate
    (tests/test_oracle_analysis.py) — a failure here can be frozen there."""
    from longcallr_tpu.analysis import ase as A
    from longcallr_tpu.analysis import asj as J
    from oracle_ase import oracle_analyze_ase
    from oracle_asj import oracle_analyze_asj
    from simulate_analysis import make_scenario

    fails = []
    t0 = time.monotonic()
    modes = ["ase-plain", "ase-patmat", "ase-filter", "asj", "asj-filter"]
    for case in range(n_cases):
        mode = modes[case % len(modes)]
        d = tempfile.mkdtemp()
        try:
            if mode.startswith("ase"):
                rng = np.random.default_rng([4101, case])
                sc = make_scenario(rng, d)
                min_support = int(rng.integers(1, 9))
                od = float(rng.choice([0.001, 0.01]))
                gt = {"protein_coding", "lncRNA"} if rng.random() < 0.8 \
                    else {"protein_coding"}
                kw = {}
                if mode == "ase-patmat":
                    kw = dict(vcf1=sc["rna_vcf"], vcf2=sc["dna_phased_vcf"])
                elif mode == "ase-filter":
                    kw = dict(vcf1=sc["rna_vcf"], vcf3=sc["dna_vcf"])
                out_tsv = os.path.join(d, "o.tsv")
                A.analyze_ase_genes(sc["anno"], sc["bam"], out_tsv, 1, gt,
                                    min_support, od, **kw)
                got = [open(out_tsv).read()]
                want = [oracle_analyze_ase(sc["anno"], sc["bam"], 1, gt,
                                           min_support, od,
                                           vcf1=kw.get("vcf1"),
                                           vcf2=kw.get("vcf2"),
                                           vcf3=kw.get("vcf3"))]
            else:
                rng = np.random.default_rng([4202, case])
                sc = make_scenario(rng, d)
                min_count = int(rng.integers(1, 8))
                min_junctions = int(rng.integers(0, 3))
                cwe = bool(rng.random() < 0.5)
                no_gtag = bool(rng.random() < 0.3)
                gt = {"protein_coding", "lncRNA"}
                dna_vcfs = rna_vcfs = dna_vcf = rna_vcf = None
                if mode == "asj-filter":
                    dna_vcf, rna_vcf = sc["dna_vcf"], sc["rna_vcf"]
                    dna_vcfs = A.load_dna_vcf(dna_vcf)
                    rna_vcfs = A.load_longcallr_phased_vcf(rna_vcf)
                prefix = os.path.join(d, "aj")
                J.analyze(sc["anno"], sc["bam"], sc["fa"], prefix,
                          min_count=min_count, gene_types=gt, threads=1,
                          no_gtag=no_gtag, min_junctions=min_junctions,
                          cluster_with_exons=cwe, dna_vcfs=dna_vcfs,
                          rna_vcfs=rna_vcfs)
                got = [open(prefix + ".asj.tsv").read(),
                       open(prefix + ".asj_gene.tsv").read(),
                       open(prefix + ".gene_coverage.tsv").read()]
                want = list(oracle_analyze_asj(
                    sc["anno"], sc["bam"], sc["fa"], min_count=min_count,
                    gene_types=gt, no_gtag=no_gtag,
                    min_junctions=min_junctions, cluster_with_exons=cwe,
                    dna_vcf=dna_vcf, rna_vcf=rna_vcf))
            if got != want:
                fails.append(case)
                which = [i for i, (g, w) in enumerate(zip(got, want))
                         if g != w]
                print(json.dumps(dict(mode=mode, case=case, files=which)),
                      flush=True)
        finally:
            shutil.rmtree(d, ignore_errors=True)
        if case % 25 == 24:
            print(f"... analysis {case+1}/{n_cases}, {len(fails)} failures, "
                  f"{round(time.monotonic()-t0,1)}s", flush=True)
    print(json.dumps(dict(mode="analysis", cases=n_cases, failures=fails,
                          wall_s=round(time.monotonic() - t0, 1))),
          flush=True)
    return fails


if MULTI:
    run_multi_campaign(N_CASES)
if ANALYSIS:
    run_analysis_campaign(N_CASES)
