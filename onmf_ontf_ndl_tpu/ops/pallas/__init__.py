"""Pallas TPU kernels and backend selection."""

import jax

from onmf_ontf_ndl_tpu.ops.pallas.coder_kernel import (
    coder_sweeps,
    dict_update_sweep,
)

__all__ = ["coder_sweeps", "dict_update_sweep", "resolve_backend"]


def resolve_backend(backend: str, use_stopping: bool) -> str:
    """Resolve "auto" to "pallas" on TPU-like backends for the
    fixed-sweep path, otherwise "xla". The early-stopping coder
    (spectral-norm while_loop) has no kernel form and always runs XLA.
    """
    if backend == "auto":
        plat = jax.default_backend()
        on_tpu = plat not in ("cpu", "gpu", "cuda", "rocm")
        return "pallas" if (on_tpu and not use_stopping) else "xla"
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    if backend == "pallas" and use_stopping:
        # the kernels have no early-stopping form; honor the stopping
        # semantics over the explicit backend request
        return "xla"
    return backend
