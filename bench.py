#!/usr/bin/env python
"""Benchmark: full pipeline (region discovery → pileup → candidates →
phasing → assignment → VCF + phased BAM) on the reference repo's real demo
reads (chr20 HiFi MAS-seq, preset hifi-masseq), against a cached consensus
pseudo-reference (demo/chr20.fa is not vendored — see
longcallr_tpu/utils/demo.py).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference publishes no numbers and the Rust toolchain is not
available in this image (BASELINE.md), so vs_baseline is measured against
the round-1 recording of this same benchmark (BASELINE_READS_PER_S below);
values > 1.0 are speedups over round 1.
"""

import json
import os
import sys
import time

# matvec-form phasing kernels (equivalence-tested vs the reference-form
# kernels at 1e-12; ~3x less HBM traffic per ascent iteration)
os.environ.setdefault("LONGCALLR_FAST_KERNELS", "1")
# hi/lo f32-split Dp matvecs on the MXU (demo outputs byte-identical to the
# f64 fast kernels; phase stage 0.26s → 0.09s on the real chip)
os.environ.setdefault("LONGCALLR_F32_KERNELS", "1")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Round-1 recorded throughput (reads/s) of this benchmark on one TPU v5
# litepod chip host. Updated when the baseline is re-recorded.
BASELINE_READS_PER_S = 104.0


def main() -> int:
    os.environ.setdefault("JAX_ENABLE_X64", "1")
    import jax

    jax.config.update("jax_enable_x64", True)
    from longcallr_tpu.utils.device import ensure_cpu_backend_registered
    ensure_cpu_backend_registered()

    # The tunneled TPU can wedge (stale remote claim): initialize the
    # backend under a watchdog; on timeout re-exec this script pinned to
    # the CPU platform so the benchmark always completes. (A separate probe
    # process would itself claim the device and wedge the real run.) Tiny
    # per-region problems route to CPU anyway (utils/device.py).
    if os.environ.get("LONGCALLR_BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    else:
        import threading

        ready = threading.Event()

        def _watchdog():
            if not ready.wait(
                    float(os.environ.get("LONGCALLR_DEVICE_PROBE_S", "90"))):
                print('{"note": "device init timed out; re-exec on cpu"}',
                      file=sys.stderr, flush=True)
                env = dict(os.environ, LONGCALLR_BENCH_CPU="1")
                os.execve(sys.executable,
                          [sys.executable, os.path.abspath(__file__)], env)

        threading.Thread(target=_watchdog, daemon=True).start()
        jax.devices()  # may block on a wedged remote claim
        ready.set()

    from longcallr_tpu.config import preset
    from longcallr_tpu.io.bam import BamFile
    from longcallr_tpu.pipeline.caller import run
    from longcallr_tpu.utils import malloc_tune
    from longcallr_tpu.utils.demo import DEMO_BAM, make_consensus_reference

    malloc_tune.tune()
    here = os.path.dirname(os.path.abspath(__file__))
    data_dir = os.path.join(here, "data")
    os.makedirs(data_dir, exist_ok=True)
    from longcallr_tpu.utils.device import setup_compile_cache
    setup_compile_cache(os.path.join(data_dir))
    from longcallr_tpu.utils.demo import make_scaled_demo

    ref_fa = os.path.join(data_dir, "demo_chr20_consensus.fa")
    make_consensus_reference(DEMO_BAM, ref_fa)

    cfg = preset("hifi-masseq").replace(threads=os.cpu_count() or 4)
    out_prefix = os.path.join(data_dir, "bench_out")

    bam = BamFile(DEMO_BAM, threads=cfg.threads)
    n_reads = bam.n_records
    # warmup run: pays jit compiles / device tunnel setup once, so the
    # measured runs reflect steady-state throughput; best-of-5 damps the
    # high-variance tunnel latency on sub-second measurements
    run(DEMO_BAM, ref_fa, out_prefix, cfg)
    from longcallr_tpu.pipeline import engine as _eng
    _eng.STAGE_TOTALS.clear()
    wall = float("inf")
    for _ in range(5):
        t0 = time.monotonic()
        out = run(DEMO_BAM, ref_fa, out_prefix, cfg)
        wall = min(wall, time.monotonic() - t0)
    reads_per_s = n_reads / wall

    result = {
        "metric": "demo_pipeline_reads_per_s",
        "value": round(reads_per_s, 3),
        "unit": "reads/s",
        "vs_baseline": round(reads_per_s / BASELINE_READS_PER_S, 3),
    }
    print(json.dumps(result), flush=True)

    # scaled multi-region workload (demo x16) through the batched pipeline
    scaled_bam = os.path.join(data_dir, "demo_x16.bam")
    scaled_fa = os.path.join(data_dir, "demo_x16.fa")
    scaled = {}
    try:
        make_scaled_demo(DEMO_BAM, scaled_bam, scaled_fa, copies=16)
        sb = BamFile(scaled_bam, threads=cfg.threads)
        run(scaled_bam, scaled_fa, out_prefix + "16", cfg, batched=True)
        wall16 = float("inf")
        for _ in range(2):      # best-of-2 damps the tunnel-latency noise
            t1 = time.monotonic()
            out16 = run(scaled_bam, scaled_fa, out_prefix + "16", cfg,
                        batched=True)
            wall16 = min(wall16, time.monotonic() - t1)
        scaled = {"scaled16_reads_per_s": round(sb.n_records / wall16, 3),
                  "scaled16_wall_s": round(wall16, 3),
                  "scaled16_regions": out16.n_regions,
                  "scaled16_records": out16.n_records}
    except Exception as e:  # scaled bench is auxiliary; never break the metric
        scaled = {"scaled16_error": repr(e)[:200]}

    from longcallr_tpu.pipeline import engine as _engine
    extra = {
        "wall_s": round(wall, 3),
        **scaled,
        "engine_stages": {k: round(v, 3) for k, v in _engine.STAGE_TOTALS.items()},
        "n_reads": n_reads,
        "n_regions": out.n_regions,
        "n_records": out.n_records,
        "stages": {k: round(v, 3) for k, v in out.stage_seconds.items()},
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(extra), file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
