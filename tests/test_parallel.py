"""Device-mesh sharding: batched phasing sweep and reads-axis psum sums on
the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from longcallr_tpu.parallel.mesh import (BatchedRegions, batched_phase_step,
                                         make_mesh, read_sharded_snp_sums)
from longcallr_tpu.phasing.kernels import make_cell_tables
from longcallr_tpu.phasing.optimize import PhaseState, _sigma_step, _snp_step


def _batch(rng, B, K, I):
    p = rng.choice([-1, 0, 1], size=(B, K, I), p=[0.3, 0.4, 0.3]).astype(np.int8)
    q = rng.integers(5, 31, size=(B, K, I)).astype(np.uint8)
    batch = BatchedRegions(
        p=jnp.asarray(p),
        q=jnp.asarray(q),
        read_base=jnp.ones((B, K), bool),
        site_mask=jnp.ones((B, I), bool),
        conserved=jnp.zeros((B, I), bool),
    )
    sigma = jnp.asarray(rng.choice([-1.0, 1.0], size=(B, K)))
    delta = jnp.asarray(rng.choice([-1.0, 1.0], size=(B, I)))
    eta = jnp.zeros((B, I), jnp.float64)
    return batch, sigma, delta, eta


def test_batched_step_matches_unbatched(rng):
    B, K, I = 8, 32, 8
    batch, sigma, delta, eta = _batch(rng, B, K, I)
    ns, nd, ne, imp = batched_phase_step(batch, sigma, delta, eta,
                                         with_genotype=True)
    # per-region reference computation (host-expanded tables: must equal
    # the programs' on-device expansion bit-exactly)
    for b in range(B):
        ct = make_cell_tables(np.asarray(batch.p[b]), np.asarray(batch.q[b]))
        st = PhaseState(sigma[b], delta[b], eta[b])
        s1, _ = _sigma_step(ct, st, batch.read_base[b], batch.site_mask[b])
        st = st._replace(sigma=s1)
        d1, e1, _ = _snp_step(ct, st, batch.read_base[b], batch.site_mask[b],
                              batch.conserved[b], True, False)
        np.testing.assert_array_equal(np.asarray(ns[b]), np.asarray(s1))
        np.testing.assert_array_equal(np.asarray(nd[b]), np.asarray(d1))
        np.testing.assert_array_equal(np.asarray(ne[b]), np.asarray(e1))


def test_batched_step_sharded_over_mesh(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(4, 2)
    B, K, I = 8, 32, 8
    batch, sigma, delta, eta = _batch(rng, B, K, I)
    ns_m, nd_m, ne_m, _ = batched_phase_step(batch, sigma, delta, eta,
                                             with_genotype=True, mesh=mesh)
    ns_u, nd_u, ne_u, _ = batched_phase_step(batch, sigma, delta, eta,
                                             with_genotype=True)
    np.testing.assert_array_equal(np.asarray(ns_m), np.asarray(ns_u))
    np.testing.assert_array_equal(np.asarray(nd_m), np.asarray(nd_u))
    np.testing.assert_array_equal(np.asarray(ne_m), np.asarray(ne_u))


def test_read_sharded_sums_psum(rng):
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(1, 8)
    fn = read_sharded_snp_sums(mesh)
    K, I = 64, 16
    p = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], size=(K, I)))
    lerr = jnp.where(p != 0, -1.5, 0.0)
    l1m = jnp.where(p != 0, -0.02, 0.0)
    sigma = jnp.asarray(rng.choice([-1.0, 1.0], size=K))
    rm = jnp.asarray(rng.random(K) < 0.9)
    sm = jnp.ones(I, bool)
    dl = jnp.asarray(rng.choice([-1.0, 1.0], size=I))
    s_match, s_flip, s_refe, s_alte, cov = fn(p, lerr, l1m, sigma, rm, sm, dl)
    pn = np.asarray(p)
    m = (pn != 0) & np.asarray(rm)[:, None]
    x = np.asarray(sigma)[:, None] * np.asarray(dl)[None, :]
    t = lambda xv: np.where(np.asarray(p) == xv, np.asarray(l1m), np.asarray(lerr))
    np.testing.assert_allclose(np.asarray(s_match),
                               np.where(m, t(x), 0.0).sum(0), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(s_alte),
                               np.where(m, t(-1.0), 0.0).sum(0), rtol=1e-12)
    np.testing.assert_array_equal(np.asarray(cov), m.sum(0))


def test_sharded_cross_optimize_matches_unsharded(rng):
    """The reads-sharded ascent converges to the same state/objective as the
    single-device fast-kernel ascent (psum reorders f64 sums at the ulp)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from longcallr_tpu.parallel.mesh import sharded_cross_optimize
    from longcallr_tpu.phasing.optimize import (PhaseState,
                                                _cross_optimize_fast_loop)
    mesh = make_mesh(1, 8)
    K, I = 128, 24
    p = rng.choice([-1, 0, 1], size=(K, I), p=[0.3, 0.4, 0.3]).astype(np.float64)
    q = rng.integers(3, 31, size=(K, I)).astype(np.uint8)
    ct = make_cell_tables(p.astype(np.int8), q)
    sigma0 = jnp.asarray(np.where(rng.random(K) < 0.5, -1.0, 1.0))
    delta0 = jnp.asarray(rng.choice([-1.0, 1.0], size=I))
    eta0 = jnp.zeros(I, jnp.float64)
    rb = jnp.ones(K, bool)
    sm = jnp.ones(I, bool)
    cons = jnp.zeros(I, bool)
    fn = sharded_cross_optimize(mesh, with_genotype=True)
    sg_s, dl_s, et_s, prob_s = fn(jnp.asarray(p.astype(np.int8)),
                                  jnp.asarray(q), sigma0, delta0,
                                  eta0, rb, sm, cons)
    st_u, prob_u = _cross_optimize_fast_loop(
        ct, PhaseState(sigma0, delta0, eta0), rb, sm, cons, True, False)
    np.testing.assert_allclose(float(prob_s), float(prob_u), rtol=1e-9)
    assert (np.asarray(sg_s) == np.asarray(st_u.sigma)).mean() > 0.95
    np.testing.assert_array_equal(np.asarray(dl_s), np.asarray(st_u.delta))


def test_shard_regions_balanced():
    from longcallr_tpu.parallel.multihost import shard_regions
    from longcallr_tpu.tiles.regions import Region
    regions = [Region(chr="c", start=1, end=1 + ln, max_coverage=cov)
               for ln, cov in [(1000, 100), (5000, 10), (200, 2000),
                               (800, 50), (3000, 30), (100, 10)]]
    shards = [shard_regions(regions, 3, p) for p in range(3)]
    # every region assigned exactly once
    allidx = sorted(i for s in shards for i in s)
    assert allidx == list(range(len(regions)))
    # loads roughly balanced (largest items spread out)
    loads = [sum(regions[i].length * regions[i].max_coverage for i in s)
             for s in shards]
    work = [r.length * r.max_coverage for r in regions]
    # LPT bound: no shard exceeds ideal + one largest item
    assert max(loads) <= sum(work) / 3 + max(work)


def test_run_multihost_single_process(tmp_path, rng):
    """process_count==1 degenerates to the standard pipeline."""
    from longcallr_tpu.config import preset
    from longcallr_tpu.parallel.multihost import run_multihost
    from simulate import make_reference, plant_snps, simulate_bam
    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 5000)
    truth = plant_snps(rng, ref, n_het=5, n_hom=1)
    bam_path = str(tmp_path / "mh.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=40, read_len=2500,
                 err_rate=0.01)
    out = run_multihost(bam_path, bam_path.replace(".bam", ".fa"),
                        str(tmp_path / "mh"), cfg)
    assert out.n_records > 0


def test_gather_results_identity():
    from longcallr_tpu.parallel.multihost import gather_results
    local = {3: {"vcf_lines": ["a\tb"], "n_fragments": 7}}
    assert gather_results(local) == local


def test_phase_region_sharded_truth(tmp_path, rng, monkeypatch):
    """Giant-region routing: with the threshold forced to 0 the iterative
    path runs through parallel/giant.py (reads-sharded ascent on the 8-device
    mesh); the result matches simulation truth and reruns are deterministic."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.ops.candidates import select_candidates
    from longcallr_tpu.parallel import giant
    from longcallr_tpu.phasing.fragments import get_fragments
    from longcallr_tpu.phasing.optimize import phase_region
    from longcallr_tpu.tiles.pileup import build_pileup
    from longcallr_tpu.tiles.regions import Region
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=18, n_hom=0, min_gap=8000 // 19)
    path = str(tmp_path / "giant.bam")
    simulate_bam(path, rng, ref, truth, n_reads=80, read_len=4000,
                 err_rate=0.01)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    assert cands.n > cfg.max_enum_snps  # iterative path
    frags = get_fragments(bam, region, cands, cfg)

    calls = []
    orig = giant.phase_region_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(giant, "GIANT_CELLS", 0)
    monkeypatch.setattr(giant, "phase_region_sharded", spy)
    st = phase_region(frags, cands, cfg, seed=1)
    assert calls, "giant routing not taken"

    sig = np.sign(np.asarray(st.sigma))
    hap_true = np.array([truth.hap_of_read[qn] for qn in frags.qnames])
    act = sig != 0
    same = (sig[act] == np.where(hap_true[act] == 1, 1, -1)).mean()
    assert same > 0.9 or same < 0.1, same
    het_pos = set(truth.het_snps)
    delta = np.sign(np.asarray(st.delta))
    sel = [i for i in range(cands.n)
           if int(cands.pos[i]) in het_pos and cands.for_phasing[i]]
    if sel:
        d = delta[sel]
        assert (d == d[0]).mean() > 0.85

    st2 = phase_region(frags, cands, cfg, seed=1)  # deterministic rerun
    np.testing.assert_array_equal(np.asarray(st.sigma), np.asarray(st2.sigma))
    np.testing.assert_array_equal(np.asarray(st.delta), np.asarray(st2.delta))
    np.testing.assert_array_equal(np.asarray(st.eta), np.asarray(st2.eta))


def test_multihost_shard_merge_retry(tmp_path, rng):
    """Fake a 2-process split in one process: run both shards through
    run_local_shard, drop one region from the merge (simulated peer crash),
    and let serialize_outputs retry it — the VCF and phased BAM must equal
    the single-process pipeline's outputs."""
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.io.fasta import FastaFile
    from longcallr_tpu.parallel.multihost import (run_local_shard,
                                                  serialize_outputs,
                                                  shard_regions)
    from longcallr_tpu.pipeline.caller import build_regions, run
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    # two separated loci → two regions
    ref = make_reference(rng, 16000)
    truth = plant_snps(rng, ref, n_het=6, n_hom=1, min_gap=1800)
    bam_path = str(tmp_path / "mh2.bam")
    rng2 = np.random.default_rng(7)
    # reads over two windows with a gap between
    from simulate import simulate_bam as _sim
    _sim(bam_path, rng, ref, truth, n_reads=60, read_len=3000, err_rate=0.01)
    fa = bam_path.replace(".bam", ".fa")

    single = run(bam_path, fa, str(tmp_path / "single"), cfg)

    bam = BamFile(bam_path)
    fasta = FastaFile(fa)
    regions, _ = build_regions(bam, fasta, cfg)
    assert regions
    sh0 = shard_regions(regions, 2, 0)
    sh1 = shard_regions(regions, 2, 1)
    loc0, f0 = run_local_shard(bam, fasta, regions, sh0, cfg)
    loc1, f1 = run_local_shard(bam, fasta, regions, sh1, cfg)
    assert not f0 and not f1
    merged = {**loc0, **loc1}
    # simulated peer crash: one region's payload never arrives
    dropped = sorted(merged)[0]
    del merged[dropped]
    out = serialize_outputs(bam, fasta, regions, merged, cfg,
                            str(tmp_path / "pod"))
    assert out["n_retried"] == 1
    with open(out["vcf_path"]) as f:
        pod_vcf = f.read()
    with open(single.vcf_path) as f:
        single_vcf = f.read()
    assert pod_vcf == single_vcf
    # phased BAMs: same reads, same HP/PS tags
    pb = BamFile(out["phased_bam_path"])
    sb = BamFile(single.phased_bam_path)
    assert pb.n_records == sb.n_records
    tags_p = {pb.read(i).qname: (pb.read(i).get_tag("HP"),
                                 pb.read(i).get_tag("PS"))
              for i in range(pb.n_records)}
    tags_s = {sb.read(i).qname: (sb.read(i).get_tag("HP"),
                                 sb.read(i).get_tag("PS"))
              for i in range(sb.n_records)}
    assert tags_p == tags_s


def test_multihost_honors_input_vcf_and_resume(tmp_path, rng):
    """The sharded path threads -v candidates and the resume checkpoint
    exactly like pipeline/caller.run (round-1 gap: run_local_shard ignored
    them, so pod runs silently diverged from single-process runs)."""
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.io.fasta import FastaFile
    from longcallr_tpu.io.vcf import load_input_candidates
    from longcallr_tpu.parallel.multihost import (run_local_shard,
                                                  serialize_outputs,
                                                  shard_regions)
    from longcallr_tpu.pipeline.caller import build_regions, run
    from longcallr_tpu.pipeline.resume import RegionCheckpoint, config_key
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 12000)
    truth = plant_snps(rng, ref, n_het=6, n_hom=0, min_gap=1500)
    bam_path = str(tmp_path / "mhv.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=60, read_len=3000,
                 err_rate=0.01)
    fa = bam_path.replace(".bam", ".fa")
    vcf_in = str(tmp_path / "in.vcf")
    with open(vcf_in, "w") as f:
        f.write("##fileformat=VCFv4.3\n#CHROM\tPOS\tID\tREF\tALT\tQUAL"
                "\tFILTER\tINFO\tFORMAT\tS\n")
        for p, (refb, altb) in sorted(truth.het_snps.items()):
            f.write(f"chrS\t{p+1}\t.\t{chr(refb)}\t{chr(altb)}\t60\tPASS"
                    f"\t.\tGT\t0/1\n")

    single = run(bam_path, fa, str(tmp_path / "sv"), cfg, input_vcf=vcf_in)

    bam = BamFile(bam_path)
    fasta = FastaFile(fa)
    regions, _ = build_regions(bam, fasta, cfg)
    cands_in = load_input_candidates(vcf_in)
    ckpt = RegionCheckpoint(str(tmp_path / "pod.regions.p0.ckpt"),
                            key=config_key(cfg, vcf_in, None))
    sh0 = shard_regions(regions, 2, 0)
    sh1 = shard_regions(regions, 2, 1)
    loc0, f0 = run_local_shard(bam, fasta, regions, sh0, cfg,
                               input_candidates=cands_in, ckpt=ckpt)
    loc1, f1 = run_local_shard(bam, fasta, regions, sh1, cfg,
                               input_candidates=cands_in)
    assert not f0 and not f1
    out = serialize_outputs(bam, fasta, regions, {**loc0, **loc1}, cfg,
                            str(tmp_path / "pod"),
                            input_candidates=cands_in)
    with open(out["vcf_path"]) as f:
        pod_vcf = f.read()
    with open(single.vcf_path) as f:
        single_vcf = f.read()
    assert pod_vcf == single_vcf
    # only the imported sites are called (the -v contract)
    body = [ln for ln in pod_vcf.splitlines() if not ln.startswith("#")]
    got = {int(ln.split("\t")[1]) - 1 for ln in body}
    assert got == set(truth.het_snps)
    # resume: a second shard pass reuses the checkpoint (results identical)
    ckpt2 = RegionCheckpoint(str(tmp_path / "pod.regions.p0.ckpt"),
                             key=config_key(cfg, vcf_in, None))
    assert ckpt2.n_done == len(loc0)
    loc0b, _ = run_local_shard(bam, fasta, regions, sh0, cfg,
                               input_candidates=cands_in, ckpt=ckpt2)
    assert {k: v["vcf_lines"] for k, v in loc0b.items()} == \
           {k: v["vcf_lines"] for k, v in loc0.items()}


def test_batched_driver_routes_giant_items(tmp_path, rng, monkeypatch):
    """phase_regions_batched keeps giant regions out of padded buckets and
    sends them through phase_region (→ sharded ascent when a mesh exists)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.ops.candidates import select_candidates
    from longcallr_tpu.parallel import giant
    from longcallr_tpu.phasing.batch_driver import phase_regions_batched
    from longcallr_tpu.phasing.fragments import get_fragments
    from longcallr_tpu.tiles.pileup import build_pileup
    from longcallr_tpu.tiles.regions import Region
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=18, n_hom=0, min_gap=8000 // 19)
    path = str(tmp_path / "gb.bam")
    simulate_bam(path, rng, ref, truth, n_reads=80, read_len=4000,
                 err_rate=0.01)
    bam = BamFile(path)
    region = Region(chr="chrS", start=1, end=len(ref) + 1)
    pl = build_pileup(bam, region, ref, cfg)
    cands = select_candidates(pl, cfg)
    frags = get_fragments(bam, region, cands, cfg)

    calls = []
    orig = giant.phase_region_sharded

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(giant, "GIANT_CELLS", 0)
    monkeypatch.setattr(giant, "phase_region_sharded", spy)
    states = phase_regions_batched([(frags, cands, 1, False)], cfg)
    assert calls, "batched driver did not route the giant item"
    assert states[0] is not None
    sig = np.sign(np.asarray(states[0].sigma))
    hap_true = np.array([truth.hap_of_read[qn] for qn in frags.qnames])
    act = sig != 0
    same = (sig[act] == np.where(hap_true[act] == 1, 1, -1)).mean()
    assert same > 0.9 or same < 0.1, same


def test_gather_results_timeout(monkeypatch):
    """A peer stuck inside the allgather: the timeout wrapper returns the
    local payloads so process 0 can retry the rest serially."""
    import time
    import jax as _jax
    from longcallr_tpu.parallel import multihost as mh

    monkeypatch.setattr(_jax, "process_count", lambda: 2)
    monkeypatch.setattr(mh, "_gather_collective",
                        lambda local: time.sleep(30) or dict(local))
    local = {5: {"vcf_lines": ["x"], "n_fragments": 1}}
    t0 = time.monotonic()
    out = mh.gather_results(local, timeout_s=0.3)
    assert time.monotonic() - t0 < 5
    assert out == local
    # the timed-out thread is still parked in the collective: the module
    # poisons itself so a later collective fails loudly instead of desyncing
    import pytest
    with pytest.raises(RuntimeError, match="timed out"):
        mh.gather_results(local, timeout_s=5.0)
    monkeypatch.setattr(mh, "_gather_poisoned", False)
    # fast peer: completes inside the timeout
    monkeypatch.setattr(mh, "_gather_collective",
                        lambda local: {**local, 9: {"vcf_lines": []}})
    out2 = mh.gather_results(local, timeout_s=5.0)
    assert 9 in out2


_POD_WORKER = r"""
import sys
port, pid, bam, fa, out = sys.argv[1:6]
import jax
jax.config.update("jax_platforms", "cpu")     # BEFORE distributed init
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", 2, int(pid))
from longcallr_tpu.config import preset
from longcallr_tpu.parallel.multihost import run_multihost
cfg = preset("hifi-masseq").replace(min_read_length=100, threads=1)
res = run_multihost(bam, fa, out, cfg)
print("DONE", jax.process_index(), flush=True)
"""


def test_run_multihost_two_process_pod(tmp_path, rng):
    """A REAL 2-process jax.distributed pod on the CPU platform: both
    workers shard the regions, gather, and process 0's outputs equal a
    single-process run."""
    import os
    import socket
    import subprocess
    import sys

    from longcallr_tpu.config import preset
    from longcallr_tpu.pipeline.caller import run
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 9000)
    truth = plant_snps(rng, ref, n_het=8, n_hom=1, min_gap=500)
    bam_path = str(tmp_path / "pod.bam")
    simulate_bam(bam_path, rng, ref, truth, n_reads=60, read_len=2500,
                 err_rate=0.01)
    fa = bam_path.replace(".bam", ".fa")
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as f:
        f.write(_POD_WORKER)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_ENABLE_X64="1")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), bam_path, fa,
         str(tmp_path / "pod")],
        cwd=repo_root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
        assert "DONE" in so
    single = run(bam_path, fa, str(tmp_path / "single"), cfg)
    with open(str(tmp_path / "pod.vcf")) as f:
        pod_vcf = f.read()
    with open(single.vcf_path) as f:
        single_vcf = f.read()
    assert pod_vcf == single_vcf


_POD_WORKER_DYING = r"""
import os
import signal
import sys
port, pid, bam, fa, out, marker = sys.argv[1:7]
import jax
jax.config.update("jax_platforms", "cpu")     # BEFORE distributed init
jax.config.update("jax_enable_x64", True)
# heartbeat tolerance must outlive the survivor's recovery work: once the
# coordination service declares the dead peer unhealthy it error-polls a
# FATAL into every remaining task (uncatchable C++ LOG(FATAL)); the gather
# timeout — not the heartbeat detector — is this pipeline's failure signal
jax.distributed.initialize(f"localhost:{port}", 2, int(pid),
                           heartbeat_timeout_seconds=600)
if pid == "1":
    # die MID-SHARD: after the phasing pass, before finalize/gather — an
    # abrupt real SIGKILL (no cleanup, no socket shutdown), the failure
    # mode of a preempted/OOM-killed pod worker
    import longcallr_tpu.phasing.batch_driver as bd
    orig = bd.phase_regions_batched
    def dying(items, cfg, mesh=None):
        res = orig(items, cfg, mesh=mesh)
        with open(marker, "w") as f:
            f.write("mid-shard")
        os.kill(os.getpid(), signal.SIGKILL)
        return res
    bd.phase_regions_batched = dying
from longcallr_tpu.config import preset
from longcallr_tpu.parallel.multihost import run_multihost
cfg = preset("hifi-masseq").replace(min_read_length=100, threads=1)
res = run_multihost(bam, fa, out, cfg)
print("DONE", jax.process_index(), res.get("n_retried"), flush=True)
# degraded pod: the atexit distributed shutdown would block on a barrier
# the dead peer can never join and end in the same coordination fatal —
# skip it; the pod is already broken and orchestration restarts it
os._exit(0)
"""


def test_run_multihost_survives_sigkilled_peer(tmp_path, rng):
    """REAL-peer fault injection (no monkeypatched fakes in process 0): a
    2-process pod where worker 1 is SIGKILLed mid-shard. Process 0's gather
    times out (LONGCALLR_GATHER_TIMEOUT), it continues with its local
    results, retries the dead peer's regions serially, and its outputs are
    byte-identical to a single-process run."""
    import os
    import socket
    import subprocess
    import sys

    from longcallr_tpu.config import preset
    from longcallr_tpu.pipeline.caller import run
    from simulate import make_reference, plant_snps, simulate_bam

    cfg = preset("hifi-masseq").replace(min_read_length=100)
    ref = make_reference(rng, 14000)
    truth = plant_snps(rng, ref, n_het=10, n_hom=1, min_gap=500, hi=7000)
    t2 = plant_snps(rng, ref, n_het=8, n_hom=0, lo=9000, hi=13500,
                    min_gap=500)
    truth.het_snps.update(t2.het_snps)
    bam_path = str(tmp_path / "podk.bam")
    # two separated loci → ≥2 regions, so both shards get real work
    simulate_bam(bam_path, rng, ref, truth, n_reads=50, read_len=2500,
                 err_rate=0.01)
    import longcallr_tpu.io.bam as bamio
    src = bamio.BamFile(bam_path)
    with bamio.BamWriter(str(tmp_path / "podk2.bam"), ["chrS"],
                         [len(ref)]) as w:
        for i in range(src.n_records):
            r = src.read(i)
            if 7000 <= r.pos < 9000:
                continue          # coverage gap splits the regions
            w.write_record(qname=r.qname, flag=int(r.flag), ref_id=0,
                           pos=int(r.pos), mapq=int(r.mapq), cigar=r.cigar,
                           seq=bytes(r.seq), qual=r.qual,
                           tags=r.aux_bytes())
    bam_path = str(tmp_path / "podk2.bam")
    fa = str(tmp_path / "podk.fa")
    from longcallr_tpu.io.fasta import write_fasta
    write_fasta(fa, {"chrS": bytes(ref)})

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = str(tmp_path / "worker_dying.py")
    with open(worker, "w") as f:
        f.write(_POD_WORKER_DYING)
    marker = str(tmp_path / "died.marker")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_ENABLE_X64="1", LONGCALLR_GATHER_TIMEOUT="8")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), bam_path, fa,
         str(tmp_path / "podk"), marker],
        cwd=repo_root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    out0 = procs[0].communicate(timeout=300)
    out1 = procs[1].communicate(timeout=60)
    # worker 1 really died by SIGKILL after starting its shard
    assert procs[1].returncode == -9, (procs[1].returncode, out1[1][-500:])
    assert os.path.exists(marker)
    # process 0 survived the dead peer and wrote complete outputs
    assert procs[0].returncode == 0, out0[1][-2000:]
    assert "DONE 0" in out0[0]
    retried = int(out0[0].split("DONE 0")[1].strip().split()[0])
    assert retried > 0            # the dead peer's regions were re-run
    single = run(bam_path, fa, str(tmp_path / "singlek"), cfg)
    with open(str(tmp_path / "podk.vcf")) as f:
        pod_vcf = f.read()
    with open(single.vcf_path) as f:
        single_vcf = f.read()
    assert pod_vcf == single_vcf


_POD_WORKER_STREAM = r"""
import sys
port, pid, bam, fa, out = sys.argv[1:6]
import jax
jax.config.update("jax_platforms", "cpu")     # BEFORE distributed init
jax.config.update("jax_enable_x64", True)
jax.distributed.initialize(f"localhost:{port}", 2, int(pid))
from longcallr_tpu.config import preset
from longcallr_tpu.parallel.multihost import run_multihost
cfg = preset("hifi-masseq").replace(min_read_length=100, threads=1)
res = run_multihost(bam, fa, out, cfg, stream=True)
print("DONE", jax.process_index(), res.get("stream"), flush=True)
"""


def test_run_multihost_streaming_pod(tmp_path):
    """Pod + whole-genome: a REAL 2-process pod in streaming mode (each
    process holds one contig window of its shard at a time, never the whole
    BAM); process 0's outputs equal a single-process resident run."""
    import os
    import socket
    import subprocess
    import sys

    from longcallr_tpu.config import preset
    from longcallr_tpu.pipeline.caller import run
    from longcallr_tpu.utils.bench_workload import make_genome_workload

    bam_path = str(tmp_path / "podg.bam")
    fa = str(tmp_path / "podg.fa")
    make_genome_workload(bam_path, fa, contigs=[
        ("chrA", [(15_000, 40, 200)]),
        ("chrB", [(12_000, 60, 200), (8_000, 40, 160)]),
        ("chrC", [(10_000, 50, 180)]),
    ])
    cfg = preset("hifi-masseq").replace(min_read_length=100)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = str(tmp_path / "worker_stream.py")
    with open(worker, "w") as f:
        f.write(_POD_WORKER_STREAM)
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_ENABLE_X64="1")
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(pid), bam_path, fa,
         str(tmp_path / "podg")],
        cwd=repo_root, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=300) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se[-2000:]
        assert "DONE" in so
    assert "DONE 0 True" in outs[0][0]

    single = run(bam_path, fa, str(tmp_path / "singleg"), cfg)
    with open(str(tmp_path / "podg.vcf")) as f:
        pod_vcf = f.read()
    with open(single.vcf_path) as f:
        single_vcf = f.read()
    assert pod_vcf == single_vcf
    # phased BAM tags match the single-process run
    from longcallr_tpu.io.bam import BamFile
    pb = BamFile(str(tmp_path / "podg.phased.bam"))
    sb = BamFile(single.phased_bam_path)
    assert pb.n_records == sb.n_records
    t_p = {pb.read(i).qname: (pb.read(i).get_tag("HP"),
                              pb.read(i).get_tag("PS"))
           for i in range(pb.n_records)}
    t_s = {sb.read(i).qname: (sb.read(i).get_tag("HP"),
                              sb.read(i).get_tag("PS"))
           for i in range(sb.n_records)}
    assert t_p == t_s


def test_batched_block_flip_sharded_over_mesh(rng, monkeypatch):
    """The device block-flip program shards over the regions axis of the
    mesh with bit-equal states and margins (f32 mode forced: the split
    tables are the kernel's operands)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from longcallr_tpu.parallel.mesh import batched_block_flip, make_mesh
    from longcallr_tpu.phasing import optimize as opt

    monkeypatch.setattr(opt, "USE_F32_KERNELS", True)
    jax.clear_caches()
    try:
        mesh = make_mesh(4, 2)
        B, K, I = 8, 32, 8
        batch, sigma, delta, eta = _batch(rng, B, K, I)
        bid = np.full((B, I), -1, np.int32)
        bid[:, 0:2] = 0                    # two 2-column blocks per region
        bid[:, 3:5] = 1
        bid = jnp.asarray(bid)
        sg_m, dl_m, pr_m, mg_m = batched_block_flip(batch, sigma, delta,
                                                    eta, bid, mesh=mesh)
        sg_u, dl_u, pr_u, mg_u = batched_block_flip(batch, sigma, delta,
                                                    eta, bid)
        np.testing.assert_array_equal(np.asarray(sg_m), np.asarray(sg_u))
        np.testing.assert_array_equal(np.asarray(dl_m), np.asarray(dl_u))
        np.testing.assert_array_equal(np.asarray(pr_m), np.asarray(pr_u))
        np.testing.assert_array_equal(np.asarray(mg_m), np.asarray(mg_u))
        # the in-kernel flip score must be bit-equal to the standalone
        # scoring program (same expression, same tables) — the flip-accept
        # comparison relies on this when a fallback region is rescored
        from longcallr_tpu.parallel.mesh import batched_overall_probability
        pr_s = batched_overall_probability(batch, sg_u, dl_u, eta)
        np.testing.assert_array_equal(np.asarray(pr_u), np.asarray(pr_s))
    finally:
        jax.clear_caches()


def test_batched_phase_fused_bit_identical_to_staged(rng, monkeypatch):
    """batched_phase_fused (one program: ascent1 → flip → keep-best →
    schedule over one shared table build) is bit-identical to the staged
    sequence the driver otherwise runs — this is what lets the driver pick
    fused vs staged per bucket without affecting any region's result."""
    from longcallr_tpu.parallel.mesh import (batched_block_flip,
                                             batched_cross_optimize,
                                             batched_perturbation_phase,
                                             batched_phase_fused)
    from longcallr_tpu.phasing import optimize as opt

    monkeypatch.setattr(opt, "USE_F32_KERNELS", True)
    jax.clear_caches()
    try:
        B, K, I = 3, 64, 16
        r = np.random.default_rng(17)
        # planted structure so flips/perturbations do real work
        hap = r.choice([-1, 1], size=(B, K))
        td = r.choice([-1.0, 1.0], size=(B, I))
        exists = r.random((B, K, I)) < 0.6
        p = (hap[:, :, None] * td[:, None, :]).astype(np.int8)
        p = np.where(r.random((B, K, I)) < 0.05, -p, p)
        p = np.where(exists, p, 0).astype(np.int8)
        q = r.integers(3, 31, size=(B, K, I)).astype(np.uint8)
        rb = r.random((B, K)) < 0.95
        sg0 = jnp.asarray(np.where(rb, r.choice([-1.0, 1.0], size=(B, K)), 0.0))
        dl0 = jnp.asarray(r.choice([-1.0, 1.0], size=(B, I)))
        et0 = jnp.zeros((B, I))
        bid = np.full((B, I), -1, np.int32)
        bid[:, 0:3] = 0
        bid[:, 4:6] = 1
        batch = BatchedRegions(
            p=jnp.asarray(p), q=jnp.asarray(q), read_base=jnp.asarray(rb),
            site_mask=jnp.ones((B, I), bool), conserved=jnp.zeros((B, I), bool))
        n_rounds = jnp.asarray(np.full(B, I // 4 + 1, np.int32))
        keys = jnp.stack([jax.random.PRNGKey(7 + b) for b in range(B)])

        # staged sequence (mirrors batch_driver's f32 branch)
        sg, dl, et, pr1 = batched_cross_optimize(
            batch, sg0, dl0, et0, keep_conserved=True, with_genotype=False)
        sg2, dl2, pr2, mg = batched_block_flip(batch, sg, dl, et,
                                               jnp.asarray(bid))
        better = np.asarray(pr2) > np.asarray(pr1)
        bsg = np.where(better[:, None], np.asarray(sg2), np.asarray(sg))
        bdl = np.where(better[:, None], np.asarray(dl2), np.asarray(dl))
        bpr = np.where(better, np.asarray(pr2), np.asarray(pr1))
        sgf_s, dlf_s, etf_s, prf_s = batched_perturbation_phase(
            batch, jnp.asarray(bsg), jnp.asarray(bdl), et,
            jnp.asarray(bpr), n_rounds, keys)

        sgf_f, dlf_f, etf_f, prf_f, mg_f = batched_phase_fused(
            batch, sg0, dl0, et0, jnp.asarray(bid), n_rounds, keys)

        np.testing.assert_array_equal(np.asarray(mg_f), np.asarray(mg))
        np.testing.assert_array_equal(np.asarray(sgf_f), np.asarray(sgf_s))
        np.testing.assert_array_equal(np.asarray(dlf_f), np.asarray(dlf_s))
        np.testing.assert_array_equal(np.asarray(etf_f), np.asarray(etf_s))
        np.testing.assert_array_equal(np.asarray(prf_f), np.asarray(prf_s))
    finally:
        jax.clear_caches()
