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


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache for transit_tpu runs.

    The framework's programs are static per (config, plan shape), so every
    process after the first reuses the compiled executables — measured
    ~30-300 s of XLA compile per program on the remote-TPU backends drops
    to ~0.1 s.  Called by the CLI and bench harness; set
    TRANSIT_TPU_NO_COMPILE_CACHE=1 to opt out, TRANSIT_TPU_CACHE_DIR to
    relocate (default ~/.cache/transit_tpu/xla).
    """
    import os
    if os.environ.get("TRANSIT_TPU_NO_COMPILE_CACHE"):
        return
    if path is None:
        path = os.environ.get(
            "TRANSIT_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "transit_tpu",
                         "xla"))
    os.makedirs(path, exist_ok=True)
    import jax
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
