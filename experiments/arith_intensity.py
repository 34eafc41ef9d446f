#!/usr/bin/env python
"""Arithmetic-intensity experiments on the production deep-phasing kernel
(VERDICT round-3 #9): run on the real TPU chip, results recorded in
BASELINE.md (round 4).

1. B-sweep: the fused bucket perturbation program
   (parallel/mesh.py::batched_perturbation_phase_stats) at B = 1/2/4/8/16
   regions of the deep bench's real (K=4096, I=512) loci. Measures
   dispatch-floor amortization and the VMEM-residency cliff: the stacked
   split tables are ~16.8 MB/region, so ~7 regions fill the v5e's 128 MB
   VMEM — beyond that the ascent matvecs fall back to HBM streaming.

2. X-sweep: the dual split-matvec (kernels_fast._matvec_rows) with stacked
   [I, X] operands — the matmul form a multi-proposal perturbation sweep
   would use (X flip vectors evaluated per pass over the tables). Records
   the per-column amortization curve. NOTE: a proposal sweep is
   byte-INCOMPATIBLE with the reference's sequential keep-best rounds
   (phase.rs:1198-1233) — this measures what the form would buy, it is not
   shipped.

Usage: python experiments/arith_intensity.py   (needs data/deep_bench.bam
from a prior bench.py run; single device process — do not run concurrently
with bench.py)
"""

import json
import os
import sys
import time

os.environ.setdefault("LONGCALLR_FAST_KERNELS", "1")

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main() -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_enable_x64", True)
    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.io.fasta import FastaFile
    from longcallr_tpu.parallel.mesh import (BatchedRegions,
                                             batched_cross_optimize,
                                             batched_perturbation_phase_stats)
    from longcallr_tpu.phasing import kernels_fast as KF
    from longcallr_tpu.phasing import optimize as O
    from longcallr_tpu.pipeline.engine import prepare_region
    from longcallr_tpu.tiles.regions import extract_isolated_regions_parallel
    from longcallr_tpu.utils import malloc_tune
    from longcallr_tpu.utils.device import setup_compile_cache

    malloc_tune.tune()
    data = os.path.join(HERE, "data")
    setup_compile_cache(data)
    cfg = preset("hifi-masseq").replace(threads=os.cpu_count() or 4)
    bam_path = os.path.join(data, "deep_bench.bam")
    fa_path = os.path.join(data, "deep_bench.fa")

    with open(fa_path + ".fai") as f:
        contig, clen = f.readline().split("\t")[:2]
    ref = np.frombuffer(FastaFile(fa_path).fetch(contig), np.uint8).copy()
    bam = BamFile(bam_path, threads=cfg.threads)
    regs = extract_isolated_regions_parallel(bam, [(contig, int(clen))], cfg)
    prepared = [prepare_region(bam, r, ref, cfg) for r in regs]
    groups = {}
    for cands, frags, _ in prepared:
        K0, I0 = frags.p.shape
        kb = (O._bucket(max(1, K0)), O._bucket(max(1, I0)))
        groups.setdefault(kb, []).append((cands, frags))
    (K, I), group = max(groups.items(), key=lambda kv: len(kv[1]))
    out = {"K": K, "I": I, "regions_available": len(group),
           "platform": jax.devices()[0].platform,
           "table_mb_per_region": round(2 * K * I * 4 / 1e6, 1)}

    def run_schedule(B: int, rep: int) -> tuple:
        gb = [group[i % len(group)] for i in range(B)]
        p = np.zeros((B, K, I), np.int8)
        bq = np.zeros((B, K, I), np.uint8)
        rb = np.zeros((B, K), bool)
        sm = np.zeros((B, I), bool)
        n_rounds = np.zeros(B, np.int32)
        rng = np.random.default_rng(100 + rep)
        sigma0 = np.zeros((B, K))
        delta0 = np.zeros((B, I))
        for b, (cands, frags) in enumerate(gb):
            K0, I0 = frags.p.shape
            p[b, :K0, :I0] = frags.p
            bq[b, :K0, :I0] = frags.baseq
            rb[b, :K0] = frags.for_phasing
            sm[b, :I0] = cands.for_phasing
            n_rounds[b] = I0 // 4 + 1
            sigma0[b] = np.where(rb[b], rng.choice([-1.0, 1.0], K), 0.0)
            delta0[b] = rng.choice([-1.0, 1.0], I)
        batch = BatchedRegions(p=jnp.asarray(p), q=jnp.asarray(bq),
                               read_base=jnp.asarray(rb),
                               site_mask=jnp.asarray(sm),
                               conserved=jnp.zeros((B, I), bool))
        sg1, dl1, et1, prob1 = batched_cross_optimize(
            batch, jnp.asarray(sigma0), jnp.asarray(delta0),
            jnp.zeros((B, I)), keep_conserved=False, with_genotype=False)
        keys = jnp.stack([jax.random.PRNGKey(1000 * rep + b)
                          for b in range(B)])
        args = (batch, sg1, dl1, et1, prob1, jnp.asarray(n_rounds), keys)
        bsg, _, _, bp, iters = batched_perturbation_phase_stats(*args)
        np.asarray(bp)          # force (axon block_until_ready is a no-op)
        t0 = time.monotonic()
        bsg, _, _, bp, iters = batched_perturbation_phase_stats(*args)
        np.asarray(bsg), np.asarray(bp)
        return time.monotonic() - t0, int(iters)

    # X-sweep: dual split matvec with stacked [I, X] operands, chained
    # INSIDE one jit (rows then cols per step — one ascent iteration's
    # structure — with a data dependence so XLA cannot parallelise steps).
    # The per-iteration cost is the SLOPE between two chain lengths, which
    # cancels the ~30-45 ms tunnel dispatch+readback that dominates any
    # per-call measurement on this axon link.
    from functools import partial

    import jax.lax as lax

    rngx = np.random.default_rng(5)
    dpf = rngx.standard_normal((K, I))
    hi = dpf.astype(np.float32)
    dp2 = jnp.stack([jnp.asarray(hi),
                     jnp.asarray((dpf - hi.astype(np.float64)),
                                 ).astype(jnp.float32)])

    @partial(jax.jit, static_argnums=2)
    def chain(dp2, x, n):
        def body(_, y):
            r = KF._matvec_rows(dp2, y)                       # [K, X]
            z = jax.vmap(lambda s: KF._matvec_cols(dp2, s),
                         in_axes=1, out_axes=1)(r)            # [I, X]
            return z * 1e-6                                   # keep finite
        return lax.fori_loop(0, n, body, x)

    N1, N2 = 128, 2048
    x_rows = []
    for X in (1, 2, 4, 8, 16, 32):
        try:
            x0 = jnp.asarray(np.random.default_rng(10 * X)
                             .standard_normal((I, X)))
            np.asarray(chain(dp2, x0, N1))        # compile + warm
            np.asarray(chain(dp2, x0, N2))
            t1 = t2 = float("inf")
            for rep in range(3):
                xr = jnp.asarray(np.random.default_rng(10 * X + 1 + rep)
                                 .standard_normal((I, X)))
                t0 = time.monotonic()
                np.asarray(chain(dp2, xr, N1))
                t1 = min(t1, time.monotonic() - t0)
                t0 = time.monotonic()
                np.asarray(chain(dp2, xr, N2))
                t2 = min(t2, time.monotonic() - t0)
            per_iter_us = (t2 - t1) / (N2 - N1) * 1e6
        except Exception as e:
            x_rows.append({"X": X, "error": repr(e)[:200]})
            print(json.dumps(x_rows[-1]), flush=True)
            continue
        row = {"X": X, "us_per_iter": round(per_iter_us, 1),
               "us_per_column_iter": round(per_iter_us / X, 2),
               # rows+cols stream the split tables twice per iteration
               "eff_gb_per_s": round(16 * K * I / (per_iter_us / 1e6) / 1e9,
                                     1)}
        x_rows.append(row)
        print(json.dumps(row), flush=True)
    out["x_sweep"] = x_rows

    b_rows = []
    for B in (4, 1, 2, 8, 16):                    # B=4 first: cached compile
        try:
            run_schedule(B, 0)                    # compile + warm
            best = None
            for rep in (1, 2):                    # varied inputs (axon cache)
                dt, it = run_schedule(B, rep)
                per_it_us = dt / max(1, it) * 1e6
                if best is None or per_it_us < best[0]:
                    best = (per_it_us, dt, it)
            per_it_us, dt, it = best
        except Exception as e:                    # transient tunnel faults
            b_rows.append({"B": B, "error": repr(e)[:200]})
            print(json.dumps(b_rows[-1]), flush=True)
            continue
        # algorithmic bytes per batch iteration: stream the B stacked split
        # tables twice (rows + cols matvec) = 16·B·K·I
        eff_gbs = 16 * B * K * I / (per_it_us / 1e6) / 1e9
        row = {"B": B, "wall_ms": round(dt * 1e3, 1), "iters": it,
               "us_per_batch_iter": round(per_it_us, 1),
               "us_per_region_iter": round(per_it_us / B, 2),
               "eff_gb_per_s": round(eff_gbs, 1),
               "tables_mb": round(2 * K * I * 4 * B / 1e6, 1)}
        b_rows.append(row)
        print(json.dumps(row), flush=True)
    out["b_sweep"] = sorted(b_rows, key=lambda r: r["B"])


    with open(os.path.join(data, "arith_intensity.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
