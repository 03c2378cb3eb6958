"""Batched entropy / FFT kernels: many same-length windows at once.

The fused windowed kernel groups windows by length and calls these — one
vectorized evaluation per distinct window length instead of one Python call
per window. Semantics identical to the single-series kernels in entropy.py /
fda.py (same reference parity, see those modules for citations); asserted
equal in tests.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "batched_sample_approx_entropy",
    "batched_permutation_entropy",
    "batched_fft_band_energies",
]


def batched_sample_approx_entropy(W: np.ndarray, m: int, r: np.ndarray):
    """SampEn + ApEn for a (k, L) matrix of windows with per-window tolerance
    ``r``. Returns (sampen[k], apen[k]); inf/nan semantics match
    entropy.sample_entropy / approximate_entropy."""
    k, L = W.shape
    if L < m + 1:
        return np.full(k, np.nan), np.full(k, np.nan)
    A = np.abs(W[:, :, None] - W[:, None, :])  # (k, L, L) pairwise
    t_m = L - m + 1
    t_m1 = L - m

    Dm = A[:, :t_m, :t_m].copy()
    for off in range(1, m):
        np.maximum(Dm, A[:, off : off + t_m, off : off + t_m], out=Dm)
    # length-(m+1) template distances extend the length-m ones by one offset
    Dm1 = np.maximum(Dm[:, :t_m1, :t_m1], A[:, m : m + t_m1, m : m + t_m1])
    rr = r[:, None, None]
    hits_m = Dm <= rr
    hits_m1 = Dm1 <= rr
    # matrices are symmetric with an all-True diagonal: i<j pairs = (total - diag)/2
    b = ((hits_m.sum(axis=(1, 2)) - t_m) / 2).astype(np.float64)
    a = ((hits_m1.sum(axis=(1, 2)) - t_m1) / 2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi_m = b / float(L - m)
        phi_m1 = a / float(L - m - 1)
        samp = np.where((b == 0) | (phi_m1 == 0.0), np.inf, -np.log(phi_m1 / phi_m))
    # ApEn: Phi = mean_i ln(matches_i / T), self-matches included
    cm = hits_m.sum(axis=2).astype(np.float64)  # (k, t_m)
    cm1 = hits_m1.sum(axis=2).astype(np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        phi_big_m = np.where(cm > 0, np.log(cm / t_m), 0.0).sum(axis=1) / t_m
        phi_big_m1 = np.where(cm1 > 0, np.log(cm1 / t_m1), 0.0).sum(axis=1) / t_m1
    return samp, phi_big_m - phi_big_m1


def batched_permutation_entropy(W: np.ndarray, m: int, delay: int) -> np.ndarray:
    """Permutation entropy for a (k, L) matrix of windows; natural log,
    stable-argsort tie-handling (matches entropy.permutation_entropy)."""
    k, L = W.shape
    if L < m * delay or m < 2:
        return np.full(k, np.nan)
    cnt = L - (m - 1) * delay
    idx = np.arange(cnt)[:, None] + np.arange(m)[None, :] * delay  # (cnt, m)
    pats = W[:, idx]  # (k, cnt, m)
    ranks = np.argsort(pats, axis=2, kind="stable")
    base = m ** np.arange(m, dtype=np.int64)
    codes = (ranks * base).sum(axis=2)  # (k, cnt)
    sc = np.sort(codes, axis=1)
    # per-row run-length entropy without a Python loop:
    new_run = np.ones_like(sc, dtype=bool)
    new_run[:, 1:] = sc[:, 1:] != sc[:, :-1]
    flat = new_run.ravel()
    run_starts = np.flatnonzero(flat)
    run_len = np.diff(np.concatenate((run_starts, [sc.size])))
    # runs never span rows because each row's first element starts a run
    row_of_run = run_starts // cnt
    p = run_len / float(cnt)
    contrib = -p * np.log(p)
    ent = np.zeros(k)
    np.add.at(ent, row_of_run, contrib)
    return ent


def batched_fft_band_energies(W: np.ndarray, n_bands: int) -> np.ndarray:
    """|rfft|^2 band sums for a (k, L) matrix → (k, n_bands)
    (matches fda.fft_band_energies)."""
    spec = np.abs(np.fft.rfft(W, axis=1)) ** 2  # (k, L//2+1)
    edges = np.linspace(0, spec.shape[1], n_bands + 1).astype(np.int64)
    out = np.zeros((W.shape[0], n_bands))
    for b in range(n_bands):
        out[:, b] = spec[:, edges[b] : edges[b + 1]].sum(axis=1)
    return out
