"""Pallas TPU kernels for the phasing ascent's hot contractions.

The ascent's per-iteration cost is streaming the split emission matrix
``Dp = Dp_hi + Dp_lo`` (hi/lo f32 pair, f64-exact to ~2⁻⁴⁸ — see
kernels_fast.py) from HBM through the MXU. The XLA path runs each matvec as
chunked f32 einsums whose per-chunk partials are combined in f64 outside.

These kernels improve on that in two ways:

* **one HBM pass**: both operand columns (u, v) — and both split halves —
  are contracted while each ``Dp`` tile is resident in VMEM;
* **in-kernel float-float accumulation**: f64 is not available on the TPU
  vector units, so the chunk partials are accumulated in *double-f32*
  (TwoSum) arithmetic — an (hi, lo) f32 pair carrying ~48 bits of mantissa,
  the classic compensated-summation construction. The host combines
  ``f64(hi) + f64(lo)``, matching the f64 reference matvec to ~1e-9
  relative (tested), slightly better than the chunked-einsum scheme.

Eligibility: K ≥ 8 and I ≥ 128 (profitability floor). Unaligned shapes are
zero-padded to f32 tile multiples inside the wrappers — exact, since padded
rows/columns contribute nothing to the contractions and padded outputs are
sliced away. The kernels run under ``interpret=True`` on CPU for the test
suite.

Reference semantics: the sums these matvecs feed are the log-emission
kernels of ``longcallR/src/phase.rs:14-276`` (see kernels.py).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

from .. import _jaxcfg  # noqa: F401  (x64 before any trace)
import jax
import jax.numpy as jnp
import numpy as np

f32 = jnp.float32
f64 = jnp.float64

# operand tile sizes (f32 min tile is (8, 128); lane dim always 128)
_TK = 512
_TI = 512

# tri-state like LONGCALLR_F32_KERNELS: unset → auto (TPU backends only)
_ENV = os.environ.get("LONGCALLR_PALLAS")
USE_PALLAS = None if _ENV is None else _ENV == "1"
# tests force interpret mode to exercise the kernels on the CPU backend
INTERPRET = False


_probe_result = None


def _in_trace() -> bool:
    """True when called under an active jax trace. Probing must not happen
    there: a jit-wrapped probe call inside an outer trace is *inlined into
    the outer jaxpr* instead of compiling eagerly, so it cannot observe a
    compile rejection — it would "succeed" and then poison the outer
    program with a kernel the backend rejects. Private-module sniff; if the
    API moves on a jax upgrade, report in-trace (the conservative answer:
    unprimed traces stay on the einsum path)."""
    try:
        from jax._src import core as _core
        return not _core.trace_state_clean()
    except Exception:
        return True


def prime_probe() -> bool:
    """Run the one-time probe compile eagerly (host level, outside any
    trace). Call sites that may trace the kernels (the ascent dispatchers)
    invoke this first so auto mode can observe the backend's verdict."""
    global _probe_result
    if USE_PALLAS is not None:
        return USE_PALLAS
    if _probe_result is None and not _in_trace():
        try:
            out = dual_matvec_rows(jnp.zeros((8, 128), f32),
                                   jnp.zeros((8, 128), f32),
                                   jnp.zeros((128, 2)), interpret=False)
            jax.block_until_ready(out)
            _probe_result = True
        except Exception:
            _probe_result = False
    return bool(_probe_result)


def _pallas_available() -> bool:
    """Auto mode: TPU backend AND a successful one-time probe compile of a
    minimal kernel (some remote-compile backends — e.g. the tunneled axon
    service — reject ALL Mosaic programs; the probe makes the fallback to
    the einsum path automatic there). Inside a trace an unprimed probe
    resolves to False rather than probing (see _in_trace)."""
    if USE_PALLAS is not None:
        return USE_PALLAS
    try:
        dev = jax.config.jax_default_device
        plat = dev.platform if dev is not None else jax.default_backend()
    except Exception:
        return False
    if plat != "tpu":
        return False
    if _probe_result is None:
        return prime_probe()
    return _probe_result


def eligible(K: int, I: int) -> bool:
    """Shapes worth routing to the kernels. Alignment is no longer required
    — the wrappers zero-pad operands up to tile multiples (exact for these
    contractions: padded rows/cols contribute 0 and padded outputs are
    sliced away); the floor only gates profitability (tiny problems stay on
    the einsum path)."""
    return K >= 8 and I >= 128


def _padded(n: int, tile: int, big: int) -> int:
    """Target size: next multiple of the min tile, or of the block size once
    the dim exceeds one block (grid tiling needs whole blocks)."""
    if n <= big:
        return max(tile, ((n + tile - 1) // tile) * tile)
    return ((n + big - 1) // big) * big


def _two_sum(acc_hi, acc_lo, x):
    """TwoSum compensated accumulation: (acc_hi, acc_lo) += x exactly."""
    s = acc_hi + x
    b = s - acc_hi
    err = (acc_hi - (s - b)) + (x - b)
    return s, acc_lo + err


def _rows_kernel(hi_ref, lo_ref, x_ref, out_hi_ref, out_lo_ref):
    """One (k, i) grid step: contract a [TK, TI] tile of both split halves
    against x[TI, 2]; accumulate into the revisited [TK, 2] outputs in
    double-f32."""
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        out_hi_ref[:] = jnp.zeros_like(out_hi_ref)
        out_lo_ref[:] = jnp.zeros_like(out_lo_ref)

    xt = x_ref[:]                                    # [2, TI]
    ph = jax.lax.dot_general(hi_ref[:], xt,
                             dimension_numbers=(((1,), (1,)), ((), ())),
                             preferred_element_type=f32)   # [TK, 2]
    pl_ = jax.lax.dot_general(lo_ref[:], xt,
                              dimension_numbers=(((1,), (1,)), ((), ())),
                              preferred_element_type=f32)
    acc_hi, acc_lo = _two_sum(out_hi_ref[:], out_lo_ref[:], ph)
    # the lo half contributes at the compensation level by construction
    out_hi_ref[:] = acc_hi
    out_lo_ref[:] = acc_lo + pl_


def _cols_kernel(hi_ref, lo_ref, s_ref, out_hi_ref, out_lo_ref):
    """One (i, k) grid step: contract a [TK, TI] tile against σ[1, TK];
    accumulate [1, TI] outputs in double-f32."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_hi_ref[:] = jnp.zeros_like(out_hi_ref)
        out_lo_ref[:] = jnp.zeros_like(out_lo_ref)

    st = s_ref[:]                                    # [1, TK]
    ph = jax.lax.dot_general(st, hi_ref[:],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=f32)   # [1, TI]
    pl_ = jax.lax.dot_general(st, lo_ref[:],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    acc_hi, acc_lo = _two_sum(out_hi_ref[:], out_lo_ref[:], ph)
    out_hi_ref[:] = acc_hi
    out_lo_ref[:] = acc_lo + pl_


try:  # pallas imports lazily degrade on backends without Mosaic support
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False


@functools.partial(jax.jit, static_argnames=("interpret",))
def dual_matvec_rows(dp_hi, dp_lo, x2, interpret: bool = False):
    """``dp @ x2`` for x2 [I, 2] (both operands in one pass over dp).
    Returns [K, 2] f64. Unaligned shapes are zero-padded to tile multiples
    (XLA hoists the loop-invariant pad of dp out of the ascent while_loop)."""
    K0, I0 = dp_hi.shape
    K = _padded(K0, 8, _TK)
    I = _padded(I0, 128, _TI)
    if (K, I) != (K0, I0):
        dp_hi = jnp.pad(dp_hi, ((0, K - K0), (0, I - I0)))
        dp_lo = jnp.pad(dp_lo, ((0, K - K0), (0, I - I0)))
        x2 = jnp.pad(x2, ((0, I - I0), (0, 0)))
    tk = min(_TK, K)
    ti = min(_TI, I)
    grid = (pl.cdiv(K, tk), pl.cdiv(I, ti))
    xt = x2.astype(f32).T                            # [2, I]
    out_hi, out_lo = pl.pallas_call(
        _rows_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, ti), lambda k, i: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, ti), lambda k, i: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, ti), lambda k, i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tk, 2), lambda k, i: (k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, 2), lambda k, i: (k, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((K, 2), f32),
                   jax.ShapeDtypeStruct((K, 2), f32)],
        interpret=interpret,
    )(dp_hi, dp_lo, xt)
    return (out_hi.astype(f64) + out_lo.astype(f64))[:K0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def matvec_cols(dp_hi, dp_lo, s, interpret: bool = False):
    """``dp.T @ s`` → [I] f64. Unaligned shapes are zero-padded (exact)."""
    K0, I0 = dp_hi.shape
    K = _padded(K0, 8, _TK)
    I = _padded(I0, 128, _TI)
    if (K, I) != (K0, I0):
        dp_hi = jnp.pad(dp_hi, ((0, K - K0), (0, I - I0)))
        dp_lo = jnp.pad(dp_lo, ((0, K - K0), (0, I - I0)))
        s = jnp.pad(s, (0, K - K0))
    tk = min(_TK, K)
    ti = min(_TI, I)
    grid = (pl.cdiv(I, ti), pl.cdiv(K, tk))
    st = s.astype(f32)[None, :]                      # [1, K]
    out_hi, out_lo = pl.pallas_call(
        _cols_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tk, ti), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, ti), lambda i, k: (k, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk), lambda i, k: (0, k),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, ti), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ti), lambda i, k: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, I), f32),
                   jax.ShapeDtypeStruct((1, I), f32)],
        interpret=interpret,
    )(dp_hi, dp_lo, st)
    return (out_hi[0].astype(f64) + out_lo[0].astype(f64))[:I0]
