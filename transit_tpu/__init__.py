"""transit_tpu: a TPU-native line-by-line radiative-transfer framework.

A from-scratch JAX/XLA/Pallas implementation with the capabilities of the
transit C code (atmospheric transmission/emission spectra from line lists),
redesigned for TPU: dense (layer x wavenumber) kernels, path integrals as
MXU matmuls, mask-based control flow, and wavenumber-sharded multi-chip
execution.
"""

__version__ = "0.1.0"


def enable_double_precision():
    """Enable float64 in JAX (the reference's precision contract is double
    everywhere except float32 Voigt profiles; types_tr.h:8-14).  Call before
    creating any arrays.  TPU executes f64 via emulation — use the default
    f32 path for production benchmarks."""
    import jax
    jax.config.update("jax_enable_x64", True)
