"""longcallR-TPU: TPU-native long-read RNA-seq SNP calling and phasing.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
huangnengCSU/longcallR (Rust, CPU). Host side handles BAM/FASTA I/O and
ragged-to-dense tiling; all per-site/per-read/per-iteration math runs as
batched JAX ops and kernels on TPU; regions are the unit of data parallelism
across a device mesh.
"""

__version__ = "0.1.0"

import jax as _jax

# The calling/phasing math is float64 by specification (the reference is
# f64 throughout); enable x64 before any kernel is traced.
_jax.config.update("jax_enable_x64", True)

from .config import CallerConfig, preset  # noqa: F401
