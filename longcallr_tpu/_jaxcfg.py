"""Import-time JAX configuration for every jax-using module.

The calling/phasing math is float64 by specification (the reference is f64
throughout — SURVEY.md §7 hard part (c)), so x64 must be enabled before any
kernel is traced. Each module that imports jax imports this one first; the
package ``__init__`` deliberately does NOT, so jax-free entry points (the
ASE/ASJ analysis tools, plain I/O use) never pay the jax import or inherit
its thread pool (which would make their fork()-based process pools unsafe).
"""

import jax

jax.config.update("jax_enable_x64", True)
