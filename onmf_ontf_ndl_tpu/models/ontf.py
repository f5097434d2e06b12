"""Online nonnegative tensor factorization (ONTF) by matricization.

The reference ``Online_NTF`` (``/root/reference/src/ontf.py:19-244``)
reduces the tensor problem to online NMF on a mode-``m`` unfolding of the
input tensor (optionally transposed, for a "joint" dictionary over the
complementary modes), and runs the identical step: sparse code, ``t^-beta``
aggregate update, column-BCD dictionary update. (``khatri_rao`` / CP are
imported there but never called — the README defers proper CP to OCPDL.)

Differences handled here:

- the reference codes with sklearn's ``SparseCoder(lasso_lars,
  positive_code=True, transform_alpha=2 default)``
  (``/root/reference/src/ontf.py:79-86``). sklearn's internal
  ``alpha/n_features`` scaling makes ``transform_alpha`` correspond exactly
  to the L1 weight of the unscaled objective
  ``0.5|x - Wh|^2 + alpha*|h|_1`` — the same objective our projected-GD
  coder solves — so we reuse :func:`nonneg_code_gram` with the same alpha.
  LARS path solutions and PGD iterates differ coefficient-wise;
  reconstruction-level parity is what the tests assert (SURVEY.md §7
  hard-part b).
- the transposed code convention (H is samples x topics,
  ``/root/reference/src/ontf.py:147-148``) is an internal detail: the
  aggregates ``A = agg H^T H``, ``B = agg H^T X^T`` are identical to the
  ONMF ones under H -> H^T, so the ONMF scan core is reused directly.
- aggregate threading across iterations is already correct in the
  reference ONTF (``/root/reference/src/ontf.py:236``); ours matches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from onmf_ontf_ndl_tpu.models.state import init_state
from onmf_ontf_ndl_tpu.models.onmf import train_dict as _train_dict
from onmf_ontf_ndl_tpu.ops.unfold import unfold

__all__ = ["OnlineNTF", "resolve_tensor_coder"]


def resolve_tensor_coder(coder: str, knob: int,
                         coder_sub_iter: int | None) -> tuple[str, int]:
    """The ONTF-surface coder policy (PARITY.md deviation #11), shared
    by :class:`OnlineNTF` and ``ImageReconstructorTensor``.

    The reference's tensor coder is an EXACT sklearn LARS solve
    (``src/ontf.py:80-86``), and the driver knob threaded into the
    sweep-count slot (``block_iterations``/``sub_iterations``, as low as
    2-4 in the reference's own configs) is stored-but-unused there
    (``src/ontf.py:47``). Default ``coder="exact"``: accelerated
    projected gradient run to convergence (sweep floor 100) on the same
    objective — the parity match for that exact solve. ``"bcd"`` /
    ``"fista"`` remain selectable with a floor of 30 sweeps so the
    reference configs' tiny knobs don't cripple coding quality
    (SURVEY.md §7 hard-part b).

    Returns ``(method, sub_iter)`` with ``method`` the underlying coder
    implementation (``"exact"`` maps to ``"fista"``)."""
    method = "fista" if coder == "exact" else coder
    floor = 100 if coder == "exact" else 30
    sub_iter = (int(coder_sub_iter) if coder_sub_iter is not None
                else max(int(knob), floor))
    return method, sub_iter


class OnlineNTF:
    """Online NTF via mode unfolding; contract matches the reference driver.

    ``OnlineNTF(X, ...).train_dict_single()`` returns ``(W, At, Bt, code)``
    as consumed by ``/root/reference/image_reconstruction_tensor.py:240,254``.
    """

    def __init__(
        self,
        X,
        n_components: int = 100,
        iterations: int = 500,
        sub_iterations: int = 10,
        batch_size: int = 20,
        ini_dict=None,
        ini_A=None,
        ini_B=None,
        history: float = 0.0,
        mode: int = 0,
        learn_joint_dict: bool = False,
        alpha: float | None = None,
        beta: float | None = None,
        subsample: bool = True,
        coder: str = "exact",
        coder_sub_iter: int | None = None,
        key: jax.Array | None = None,
        seed: int = 0,
        dtype=jnp.float32,
    ):
        self.X = jnp.asarray(X, dtype)
        self.n_components = n_components
        self.iterations = iterations
        # sub_iterations = number of coder sweeps per step (the reference
        # threads it through as "block_iterations" from the tensor driver).
        self.sub_iterations = sub_iterations
        self.batch_size = batch_size
        self.mode = mode
        self.learn_joint_dict = learn_joint_dict
        # sklearn SparseCoder default transform_alpha=2 when alpha is None
        # (/root/reference/src/ontf.py:79-82).
        self.alpha = 2.0 if alpha is None else float(alpha)
        self.beta = 1.0 if beta is None else float(beta)
        self.subsample = subsample
        self.coder = coder
        # ONTF-surface coder policy (exact-by-default, PARITY.md #11):
        # see resolve_tensor_coder
        self._coder_method, self.coder_sub_iter = resolve_tensor_coder(
            coder, sub_iterations, coder_sub_iter)
        self.dtype = dtype

        X_unfold = unfold(self.X, mode)
        if learn_joint_dict:
            X_unfold = X_unfold.T
        self.X_unfold = X_unfold
        d = X_unfold.shape[0]

        if key is None:
            key = jax.random.key(seed)
        self.state = init_state(
            key, d, n_components, track_xxt=False, dtype=dtype,
            W=ini_dict, A=ini_A, B=ini_B, t=float(history),
        )
        # kept for pass-through parity; the reference never accumulates it
        # (/root/reference/src/ontf.py:237 is commented out).
        self.code = jnp.zeros((self.X.shape[1], n_components), dtype)

    @property
    def history(self) -> float:
        return float(self.state.t)

    def joint_sparse_code_tensor(self, X, W):
        """Code unfolded data against W; returns H as samples x topics,
        the reference's transposed convention
        (``/root/reference/src/ontf.py:59-89``)."""
        from onmf_ontf_ndl_tpu.ops.coder import nonneg_code

        X = jnp.asarray(X, self.dtype)
        W = jnp.asarray(W, self.dtype)
        # deterministic H0 key (str hashes are randomized per process)
        key = jax.random.fold_in(jax.random.key(202), X.shape[1])
        H = nonneg_code(
            X, W, key=key, alpha=self.alpha,
            sub_iter=self.coder_sub_iter, stopping_diff=0.01,
            method=self._coder_method,
        )
        return H.T

    def train_dict_single(self):
        """Learn the mode dictionary; returns ``(W, At, Bt, code)``."""
        self.state, _ = _train_dict(
            self.state, self.X_unfold,
            iterations=self.iterations, batch_size=self.batch_size,
            subsample=self.subsample, alpha=self.alpha, beta=self.beta,
            sub_iter=self.coder_sub_iter, stopping_diff=0.01,
            track_code=False, coder=self._coder_method,
        )
        st = self.state
        return st.W, st.A, st.B, self.code
