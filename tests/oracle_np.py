"""Pure-NumPy oracle of the reference ONMF numerics, for golden tests.

A fresh, vector-style reimplementation of the algorithms in
``/root/reference/src/onmf.py`` (coder :233-271, dict update :92-116, step
:119-167) kept semantically exact: same sweep orders, step sizes,
projections, and stopping rules. The training-loop oracle threads the
aggregates correctly across iterations (the canonical semantics per
SURVEY.md §3.1 — matching ``ontf.py:236`` and the paper, not the
``onmf.py:217`` rebuild-from-initial bug).
"""

from __future__ import annotations

import numpy as np


def specnorm(M):
    return np.linalg.norm(M, ord=2)


def code_oracle(X, W, H0, alpha=0.0, sub_iter=10, stopping_diff=0.01, radius=None):
    """Row-wise projected-GD nonnegative LASSO, Gauss-Seidel over rows."""
    gram = W.T @ W
    proj = W.T @ X
    H = H0.copy()
    anchor = H0.copy()
    i = 0
    rel_change = np.inf
    while i < sub_iter and (stopping_diff is None or rel_change > stopping_diff):
        H_prev = H.copy()
        for k in range(H.shape[0]):
            g = gram[k] @ H - proj[k] + alpha
            H[k] = np.maximum(H[k] - g / (np.sqrt(i + 10.0) * (gram[k, k] + 1.0)), 0.0)
            if radius is not None:
                dev = specnorm(H - anchor)
                H = anchor + (radius / max(radius, dev)) * (H - anchor)
                anchor = H.copy()
        if stopping_diff is not None:
            rel_change = specnorm(H - H_prev) / specnorm(H_prev)
        i += 1
    return H


def dict_oracle(W, A, B):
    """Column BCD pass with nonnegativity + unit-ball projection."""
    W = W.copy()
    for j in range(W.shape[1]):
        col = W[:, j] - (W @ A[:, j] - B[j]) / (A[j, j] + 1.0)
        col = np.maximum(col, 0.0)
        W[:, j] = col / max(1.0, np.linalg.norm(col))
    return W


def step_oracle(X, W, A, B, C, t, H0, alpha=0.0, beta=1.0, sub_iter=10,
                stopping_diff=0.01, dict_from="stale"):
    """One online step: code, aggregate update with weight t^-beta, BCD."""
    H = code_oracle(X, W, H0, alpha=alpha, sub_iter=sub_iter,
                    stopping_diff=stopping_diff)
    w = float(t) ** (-beta)
    A1 = (1 - w) * A + w * (H @ H.T)
    B1 = (1 - w) * B + w * (H @ X.T)
    C1 = None if C is None else (1 - w) * C + w * (X @ X.T)
    if dict_from == "stale":
        W1 = dict_oracle(W, A, B)
    else:
        W1 = dict_oracle(W, A1, B1)
    return H, A1, B1, C1, W1


def train_oracle(X, W, iterations, batches, H0s, A=None, B=None, C=None,
                 t0=0.0, alpha=0.0, beta=1.0, sub_iter=10, stopping_diff=0.01):
    """Deterministic training oracle: the caller supplies the subsample
    index arrays (``batches``) and code initializations (``H0s``) so no RNG
    is involved. Aggregates thread correctly across iterations."""
    r = W.shape[1]
    A = np.zeros((r, r)) if A is None else A.copy()
    B = np.zeros((r, X.shape[0])) if B is None else B.copy()
    code = np.zeros((r, X.shape[1]))
    for step_i, i in enumerate(range(1, iterations)):
        idx = batches[step_i]
        Xb = X[:, idx]
        H, A, B, C, W = step_oracle(
            Xb, W, A, B, C, t0 + i, H0s[step_i], alpha=alpha, beta=beta,
            sub_iter=sub_iter, stopping_diff=stopping_diff,
        )
        np.add.at(code, (slice(None), idx), H)
    t_final = t0 + iterations if iterations > 1 else t0
    return W, A, B, C, code, t_final
