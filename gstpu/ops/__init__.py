"""Kernel library (L3'): JAX/Pallas DSP kernels.

All kernels are pure functions (state, block, uniforms) -> (state, out)
over static shapes, batched over a leading stream axis where useful.
f64 is enabled because several reference elements do their internal
math in f64 (audioecho imp.rs:78-85, audioloudnorm requires F64
caps) and the exactness gates in BASELINE.md demand parity.
"""

import jax

jax.config.update("jax_enable_x64", True)
