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

N_CASES = int(sys.argv[1]) if len(sys.argv) > 1 else 150
PRESETS = ["hifi-masseq", "hifi-isoseq", "ont-cdna", "ont-drna"]
t_start = time.monotonic()
fails = []
for case in range(N_CASES):
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
print(json.dumps(dict(cases=N_CASES, failures=fails,
                      wall_s=round(time.monotonic() - t_start, 1))), flush=True)
