"""Entropy / information-theoretic kernels (pure NumPy).

Parity target: /root/reference/src/entropy/mod.rs.

The reference's SampEn/ApEn are O(n^2) pairwise template matching; windows in
the rollup engine bound n (tier windows hold at most a few thousand points and
the engine additionally clamps via ``max_points`` guards in the rollup stage),
so a broadcasted NumPy pairwise matrix is the right trade-off.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sample_entropy",
    "approximate_entropy",
    "permutation_entropy",
    "lempel_ziv_complexity",
    "multiscale_entropy",
]


def _chebyshev_template_matches(x: np.ndarray, m: int) -> np.ndarray:
    """Pairwise Chebyshev distances between all length-m templates.

    Returns the (T,T) matrix D[i,j] = max_{k<m} |x[i+k]-x[j+k]| where
    T = n-m+1 (templates start at every i in 0..=n-m, src/entropy/mod.rs:204)."""
    n = x.size
    t = n - m + 1
    a = np.abs(x[:, None] - x[None, :])  # (n, n)
    d = a[:t, :t].copy()
    for k in range(1, m):
        np.maximum(d, a[k : k + t, k : k + t], out=d)
    return d


def _count_matches(x: np.ndarray, m: int, r: float) -> int:
    """Count of i<j template pairs with Chebyshev distance <= r
    (src/entropy/mod.rs:200-222)."""
    d = _chebyshev_template_matches(x, m)
    hits = d <= r
    # strict upper triangle (i < j)
    return int(np.triu(hits, k=1).sum())


def sample_entropy(x, m: int, r: float) -> float:
    """SampEn = -ln(phi_{m+1}/phi_m) with the reference's exact normalization
    phi_m = B/(n-m), phi_{m+1} = A/(n-m-1) (src/entropy/mod.rs:139-158);
    +inf when there are no matches."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < m + 1:
        raise ValueError("Time series too short for given pattern length")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    a = _count_matches(x, m + 1, r)
    b = _count_matches(x, m, r)
    if b == 0:
        return float("inf")
    phi_m = b / float(n - m)
    phi_m1 = a / float(n - m - 1)
    if phi_m1 == 0.0:
        return float("inf")
    return float(-np.log(phi_m1 / phi_m))


def _phi(x: np.ndarray, m: int, r: float) -> float:
    """ApEn Phi(m): mean over templates of ln(matches/T), self-matches included
    (src/entropy/mod.rs:167-194)."""
    d = _chebyshev_template_matches(x, m)
    t = d.shape[0]
    matches = (d <= r).sum(axis=1)  # includes self
    nz = matches > 0
    return float(np.log(matches[nz] / float(t)).sum() / t)


def approximate_entropy(x, m: int, r: float) -> float:
    """ApEn = Phi(m) - Phi(m+1) (src/entropy/mod.rs:160-165)."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < m + 1:
        raise ValueError("Time series too short for given pattern length")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    return _phi(x, m, r) - _phi(x, m + 1, r)


def permutation_entropy(x, m: int, delay: int) -> float:
    """Ordinal-pattern Shannon entropy, natural log
    (src/entropy/mod.rs:224-256). Ties keep original index order (the
    reference's stable sort_by), matched by np.argsort(kind='stable')."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n < m * delay:
        raise ValueError("Time series too short for given embedding dimension and delay")
    if m < 2:
        raise ValueError("Embedding dimension must be at least 2")
    if delay < 1:
        raise ValueError("Delay must be at least 1")
    count = n - (m - 1) * delay
    idx = np.arange(count)[:, None] + np.arange(m)[None, :] * delay
    windows = x[idx]  # (count, m)
    ranks = np.argsort(windows, axis=1, kind="stable")
    # hash each pattern into a single integer (m <= ~20 → fits in int64)
    base = m ** np.arange(m, dtype=np.int64)
    codes = (ranks * base).sum(axis=1)
    _, counts = np.unique(codes, return_counts=True)
    p = counts / float(count)
    return float(-(p * np.log(p)).sum())


def lempel_ziv_complexity(x, threshold: float | None = None) -> float:
    """LZ76-style new-substring count over the binarized series
    (src/entropy/mod.rs:258-303). Default threshold = sorted[n/2] (the
    reference's 'median' = upper middle element)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.size
    if n == 0:
        raise ValueError("Input time series cannot be empty")
    if threshold is None:
        threshold = float(np.sort(x)[n // 2])
    bits = (x >= threshold).astype(np.uint8).tobytes()
    complexity = 0
    i = 0
    while i < n:
        j = 1
        # longest prefix bits[i:i+j] already present fully inside bits[:i]
        while i + j <= n:
            if bits.find(bits[i : i + j], 0, i) < 0:
                break
            j += 1
        complexity += 1
        i += max(j, 1)
    return float(complexity)


def _coarse_grain(x: np.ndarray, scale: int) -> np.ndarray:
    """Non-overlapping window means (src/entropy/mod.rs:326-339)."""
    n = x.size
    m = n // scale
    return x[: m * scale].reshape(m, scale).mean(axis=1)


def multiscale_entropy(x, m: int, r: float, max_scale: int) -> list[float]:
    """SampEn of coarse-grained series per scale (src/entropy/mod.rs:305-324);
    scale 1 equals sample_entropy exactly; NaN when too short."""
    x = np.asarray(x, dtype=np.float64)
    if x.size < (m + 1) * max_scale:
        raise ValueError("Time series too short for given parameters")
    if r <= 0.0:
        raise ValueError("Tolerance r must be positive")
    if max_scale < 1:
        raise ValueError("Max scale must be at least 1")
    out = []
    for scale in range(1, max_scale + 1):
        cg = _coarse_grain(x, scale)
        if cg.size >= m + 1:
            out.append(sample_entropy(cg, m, r))
        else:
            out.append(float("nan"))
    return out
