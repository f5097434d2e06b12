"""Pallas TPU kernels and backend selection."""

import jax

from onmf_ontf_ndl_tpu.ops.pallas.coder_kernel import (
    coder_sweeps,
    coder_sweeps_earlystop,
    dict_update_sweep,
    fista_sweeps,
)

__all__ = [
    "coder_sweeps", "coder_sweeps_earlystop", "dict_update_sweep",
    "fista_sweeps", "resolve_backend",
]

# Backends the Mosaic kernels lower on. Allowlist, not a denylist: an
# unknown platform name (a future plugin) must fall back to XLA rather
# than attempt a TPU-only lowering. The axon TPU plugin reports "tpu".
_PALLAS_PLATFORMS = ("tpu",)


def resolve_backend(backend: str, use_stopping: bool) -> str:
    """Resolve "auto" to "pallas" on TPU, otherwise "xla".

    Both coder modes have fused kernel forms: fixed-sweep
    (:func:`coder_sweeps`) and early-stopping
    (:func:`coder_sweeps_earlystop`, per-column-tile masked convergence
    — the reference-semantics default path).
    """
    del use_stopping  # both modes have kernels now
    if backend == "auto":
        return ("pallas" if jax.default_backend() in _PALLAS_PLATFORMS
                else "xla")
    if backend not in ("xla", "pallas"):
        raise ValueError(f"unknown backend {backend!r}")
    return backend
