"""Compute-device routing.

Small per-region problems are dispatched to the host CPU backend when the
default device is a (possibly remote) accelerator: for tiny tensors the
accelerator's dispatch + compile latency dwarfs the math, exactly like the
small-matrix heuristics in BLAS/accelerator libraries. Large regions and
batched work go to the default (TPU) device.

Threshold in cells (reads × SNPs), override with LONGCALLR_TPU_MIN_CELLS.
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Optional

from .. import _jaxcfg  # noqa: F401  (x64 before any trace)
import jax

log = logging.getLogger("longcallr_tpu")

# Degraded-placement observability (round-2 review): when WORK-based routing
# wants the accelerator but the default backend is CPU (device wedge, missing
# plugin, forced-CPU env), the deep path silently runs ~100x slower with only
# this heuristic deciding. Count every such landing and warn once per process
# so the regression is visible (caller.py copies the count into
# CallerOutputs.n_degraded_placements).
DEGRADED_PLACEMENTS = 0
_degraded_lock = threading.Lock()
_warned_degraded = False


def _note_degraded_placement(work: int) -> None:
    global DEGRADED_PLACEMENTS, _warned_degraded
    with _degraded_lock:
        DEGRADED_PLACEMENTS += 1
        if not _warned_degraded:
            _warned_degraded = True
            log.warning(
                "accelerator-scale phase problem (work=%d >= %d) is running "
                "on the host CPU backend because no accelerator device is "
                "available — expect ~100x slower deep phasing", work,
                MIN_ACCEL_PHASE_WORK)

MIN_ACCEL_CELLS = int(os.environ.get("LONGCALLR_TPU_MIN_CELLS", str(1 << 24)))

# Phase-stage routing is WORK-based, not cell-based: the ascent schedule
# costs ~(rounds × iterations) passes over the cell matrix, so a region
# with 2M cells and 129 perturbation rounds is ~15s of host CPU work while
# a 2M-cell single pass is milliseconds. Work unit: cells × rounds
# (B·K·I_pad·(I//4+1) for the iterative path; B·2^I·K·I_pad for the
# enumeration path — per-config ascents play the rounds role).
# Calibration (this host, K=4096 I=512 rounds=129): host CPU ≈ 17M work/s,
# tunneled TPU ≈ 1.8G work/s with ~0.5s fixed dispatch+transfer cost →
# crossover ≈ 10M. Default slightly below: transfers amortize with K.
MIN_ACCEL_PHASE_WORK = int(os.environ.get("LONGCALLR_TPU_MIN_PHASE_WORK",
                                          str(1 << 23)))


def ensure_cpu_backend_registered() -> None:
    """Allow 'cpu' alongside the default platform (call before first jax
    backend initialisation; no-op afterwards or when already present)."""
    try:
        plats = jax.config.jax_platforms
        if plats and "cpu" not in plats:
            jax.config.update("jax_platforms", plats + ",cpu")
    except Exception:
        pass


def small_problem_device(n_cells: int) -> Optional[jax.Device]:
    """CPU device for sub-threshold problems, else None (default device)."""
    if n_cells >= MIN_ACCEL_CELLS:
        return None
    return _cpu_or_none()


def phase_problem_device(work: int) -> Optional[jax.Device]:
    """CPU device for sub-threshold PHASE problems (work = cells × rounds,
    see MIN_ACCEL_PHASE_WORK), else None (default device)."""
    if work >= MIN_ACCEL_PHASE_WORK:
        # wants the accelerator; if the default backend is CPU the problem
        # lands there anyway — surface the silent ~100x degradation
        try:
            if jax.devices()[0].platform == "cpu":
                _note_degraded_placement(work)
        except RuntimeError:
            pass
        return None
    return _cpu_or_none()


def accel_placement() -> bool:
    """True when programs traced HERE will run on an accelerator (same
    placement resolution as optimize._f32_mode's auto: an explicit
    jax.default_device context wins, else the default backend). Gates
    host-side work that only pays off for a device target — e.g. the
    1-byte cell packing for transfer (kernels.pack_cells_np)."""
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform != "cpu"
        return jax.default_backend() != "cpu"
    except Exception:
        return False


def _cpu_or_none() -> Optional[jax.Device]:
    try:
        default = jax.devices()[0]
        if default.platform == "cpu":
            return None
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


def setup_compile_cache(cache_root: Optional[str] = None) -> None:
    """Enable the persistent XLA compile cache, scoped by a host fingerprint
    (remote compilation can bake CPU AOT artifacts for a different ISA)."""
    import hashlib
    import platform as _plat

    try:
        base = cache_root or os.path.join(
            os.path.expanduser("~"), ".cache", "longcallr_tpu")
        cpuinfo = ""
        try:
            with open("/proc/cpuinfo") as f:
                raw = f.read()
            # model name + ALL flags lines (the feature sets XLA bakes into
            # CPU AOT artifacts; a truncated prefix once collided across
            # driver hosts and tripped the loader's SIGILL warning)
            cpuinfo = "\n".join(l for l in raw.splitlines()
                                if l.startswith(("model name", "flags")))
        except OSError:
            pass
        ver = ""
        try:
            import jaxlib
            ver = jax.__version__ + getattr(jaxlib, "__version__", "")
        except Exception:
            ver = jax.__version__
        fp = hashlib.sha1(
            (_plat.machine() + _plat.processor() + cpuinfo + ver).encode()
        ).hexdigest()[:12]
        path = os.path.join(base, f"jax_cache_{fp}")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        pass
