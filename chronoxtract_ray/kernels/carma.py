"""CARMA(p,q) model kernels (pure NumPy).

Parity target: /root/reference/src/carma/ (PyO3/Rust). Implements the same
rotated (diagonalized) state-space formulation:

- AR roots via companion-matrix eigenvalues (src/carma/math.rs:22-64)
- observation vector = Re[MA polynomial at the AR roots]
  (src/carma/math.rs:76-110)
- base process noise Q_ii = sigma^2 / (2|Re lambda_i|), diagonal
  (src/carma/math.rs:122-146)
- stationary covariance X_ij = -Q_ij / Re(lambda_i + conj(lambda_j))
  (src/carma/math.rs:148-186)
- per-step integrated noise Q(dt)_ij = (1 - exp((li+conj(lj)) dt)) /
  (li+conj(lj)), row-scaled by the base Q (src/carma/kalman.rs:208-245)
- per-point predict/update with loglik contribution
  -0.5*(nu^2/S + ln S + 2 ln(pi))  — NOTE: the reference uses 2*ln(pi), not
  ln(2*pi) (src/carma/kalman.rs:197-203); replicated verbatim for parity.
- MLE = seeded random multi-start EVALUATION (the reference's optimizer is a
  TODO — "grid search ... for now", src/carma/mle.rs:17-19); order selection
  = AICc grid (src/carma/selection.rs:24-95).

Documented divergences: the reference's random starts use Rust StdRng
streams; this engine uses numpy default_rng with the same per-start integer
seeds — start VALUES differ, the multi-start evaluation semantics match.
Like the reference, complex AR roots raise in the transition-matrix
exponential (math.rs:201-220).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

__all__ = [
    "McmcParams",
    "carma_mcmc",
    "CarmaParams",
    "compute_ar_roots",
    "carma_loglikelihood",
    "carma_kalman_filter",
    "carma_mle",
    "carma_choose_order",
    "carma_predict",
    "information_criteria",
]


@dataclass
class CarmaParams:
    """CARMA(p,q) parameters (src/carma/types.rs:52-94): requires p >= 1 and
    q < p; ma_coeffs has length q+1 with beta_0 leading."""

    p: int
    q: int
    ar_coeffs: list[float] = field(default_factory=list)
    ma_coeffs: list[float] = field(default_factory=list)
    sigma: float = 1.0

    def __post_init__(self):
        if self.p == 0 or self.q >= self.p:
            raise ValueError(f"Invalid CARMA order: p={self.p}, q={self.q} (need p>=1, q<p)")
        if not self.ar_coeffs:
            self.ar_coeffs = [1.0] * self.p
        if not self.ma_coeffs:
            self.ma_coeffs = [1.0] + [0.0] * self.q
        if len(self.ar_coeffs) != self.p:
            raise ValueError("ar_coeffs must have length p")
        if len(self.ma_coeffs) != self.q + 1:
            raise ValueError("ma_coeffs must have length q+1")


def compute_ar_roots(ar_coeffs) -> np.ndarray:
    """Roots of s^p + a1 s^(p-1) + ... + ap via the companion matrix
    (src/carma/math.rs:22-64)."""
    a = np.asarray(ar_coeffs, dtype=np.float64)
    p = a.size
    if p == 0:
        raise ValueError("Empty AR coefficients")
    if p == 1:
        return np.array([complex(-a[0], 0.0)])
    companion = np.zeros((p, p))
    companion[np.arange(p - 1), np.arange(1, p)] = 1.0
    companion[p - 1, :] = -a[::-1]
    return np.linalg.eigvals(companion).astype(np.complex128)


def _validate_series(times, values, errors=None):
    """src/carma/math.rs:281-334."""
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    if t.size == 0 or v.size == 0:
        raise ValueError("Empty time series")
    if t.size != v.size:
        raise ValueError("Time and value arrays have different lengths")
    if errors is not None:
        e = np.asarray(errors, dtype=np.float64)
        if e.size != t.size:
            raise ValueError("Error array length doesn't match time series length")
        if ((e <= 0) | ~np.isfinite(e)).any():
            raise ValueError("All measurement errors must be positive and finite")
    if (~np.isfinite(t)).any() or (~np.isfinite(v)).any():
        raise ValueError("Times/values contain non-finite values")
    if not (np.diff(t) > 0).all():
        raise ValueError("Times must be in strictly ascending order")
    if t.size < 3:
        raise ValueError("Need at least 3 data points for CARMA fitting")


class _StateSpace:
    """Rotated state space (src/carma/types.rs:415-445)."""

    def __init__(self, params: CarmaParams):
        lam = compute_ar_roots(params.ar_coeffs)
        if (lam.real >= 0).any():
            raise ValueError("Non-stationary CARMA model (AR root with non-negative real part)")
        self.lam = lam
        p = params.p
        # observation vector: Re[MA polynomial at each root]
        ma = np.asarray(params.ma_coeffs, dtype=np.float64)
        powers = lam[:, None] ** np.arange(ma.size)[None, :]
        self.h = (powers @ ma).real  # (p,)
        # base process noise: diagonal sigma^2 / (2 |Re lambda|)
        self.q_base = np.diag(params.sigma**2 / (2.0 * np.abs(lam.real)))
        # stationary covariance: -Q_ij / Re(li + conj(lj))
        denom = lam[:, None] + np.conj(lam)[None, :]
        if (np.abs(denom) < 1e-12).any():
            raise ValueError("Singular denominator in Lyapunov equation")
        self.stationary_cov = -self.q_base / denom.real
        self.p = p

    def transition(self, dt: float) -> np.ndarray:
        """diag(exp(lambda dt)); raises on materially complex entries
        (src/carma/math.rs:201-220)."""
        e = np.exp(self.lam * dt)
        if (np.abs(e.imag) > 1e-12).any():
            raise ValueError("Complex eigenvalues require special handling")
        return np.diag(e.real)

    def q_dt(self, dt: float) -> np.ndarray:
        """Integrated process noise, row-scaled by base Q.

        DOCUMENTED BUG FIX vs the reference: src/carma/kalman.rs:208-245
        computes (1 - exp(s*dt))/s which is NEGATIVE for stationary roots
        (s = li + conj(lj) < 0), so its filter adds negative process noise
        and fails with 'Non-positive innovation variance' whenever the
        observation gap exceeds ~0.7/|Re lambda|. The standard integral is
        (exp(s*dt) - 1)/s (positive), which is also the unique choice
        consistent with the reference's own stationary covariance
        (lim dt→inf Q(dt) = -Q_base/s = stationary_cov)."""
        s = self.lam[:, None] + np.conj(self.lam)[None, :]
        small = np.abs(s) < 1e-12
        with np.errstate(invalid="ignore", divide="ignore", over="ignore"):
            integ = ((np.exp(s * dt) - 1.0) / np.where(small, 1.0, s)).real
        qm = np.where(small, dt, integ)
        return self.q_base @ qm


def carma_kalman_filter(times, values, errors, params: CarmaParams) -> dict:
    """Full Kalman pass (src/carma/kalman.rs:261-389). Returns dict with
    loglikelihood, predicted_observations, innovations, innovation_variances,
    filtered_means."""
    _validate_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    ss = _StateSpace(params)
    x = np.zeros(ss.p)
    P = ss.stationary_cov.copy()
    n = t.size
    pred = np.empty(n)
    innov = np.empty(n)
    ivar = np.empty(n)
    means = np.empty((n, ss.p))
    loglik = 0.0
    prev_t = None
    h = ss.h
    for i in range(n):
        if prev_t is not None:
            dt = t[i] - prev_t
            if dt > 0:
                phi = ss.transition(dt)
                x = phi @ x
                P = phi @ P @ phi.T + ss.q_dt(dt)
        y_hat = h @ x
        nu = v[i] - y_hat
        S = h @ P @ h + e[i] * e[i]
        if S <= 0:
            raise ValueError("Non-positive innovation variance")
        K = (P @ h) / S
        x = x + K * nu
        P = (np.eye(ss.p) - np.outer(K, h)) @ P
        # reference formula uses 2*ln(pi) (src/carma/kalman.rs:197-203)
        loglik += -0.5 * (nu * nu / S + np.log(S) + 2.0 * np.log(np.pi))
        pred[i] = y_hat
        innov[i] = nu
        ivar[i] = S
        means[i] = x
        prev_t = t[i]
    return {
        "loglikelihood": float(loglik),
        "predicted_observations": pred,
        "innovations": innov,
        "innovation_variances": ivar,
        "filtered_means": means,
    }


def carma_loglikelihood(times, values, errors, params: CarmaParams) -> float:
    return carma_kalman_filter(times, values, errors, params)["loglikelihood"]


def information_criteria(loglik: float, n_params: int, n_data: int):
    """(AIC, AICc, BIC) per src/carma/math.rs:345-367."""
    k, n = float(n_params), float(n_data)
    aic = 2.0 * k - 2.0 * loglik
    aicc = aic + (2.0 * k * (k + 1.0)) / (n - k - 1.0) if n > k + 1.0 else float("inf")
    bic = k * np.log(n) - 2.0 * loglik
    return aic, aicc, bic


def _random_start(p: int, q: int, seed: int) -> CarmaParams:
    """Seeded random starting point (src/carma/mle.rs:118-138; numpy RNG
    stream, documented divergence)."""
    rng = np.random.default_rng(seed)
    params = CarmaParams(p, q)
    params.ar_coeffs = list(rng.standard_normal(p) * 0.3)
    ma = rng.standard_normal(q + 1) * 0.3
    ma[0] = 1.0
    params.ma_coeffs = list(ma)
    params.sigma = max(abs(rng.standard_normal()) + 0.1, 0.01)
    return params


def carma_predict(times, values, errors, params: CarmaParams, pred_times) -> dict:
    """Real Kalman FORECAST at ``pred_times`` (this EXCEEDS the reference:
    its own carma_predict is a placeholder returning zeros,
    /root/reference/src/carma/predict.rs:38-39).

    One chronological pass over the merged stream of observations and
    prediction points: observations propagate + update the state; a
    prediction point propagates the state to its time and records the
    predictive mean h'x and variance h'Ph (process only — no measurement
    noise), WITHOUT updating. Propagation composes exactly across the
    inserted points (Phi(a+b) = Phi(b)Phi(a); Q accumulates accordingly), so
    later observations see the same filter they would without predictions.
    Prediction points before the first observation report the stationary
    prior. Returns {'pred_times','pred_means','pred_variances'}.
    """
    _validate_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    pt = np.asarray(pred_times, dtype=np.float64)
    if pt.size == 0:
        return {"pred_times": pt, "pred_means": pt.copy(), "pred_variances": pt.copy()}
    order = np.argsort(pt, kind="stable")
    ss = _StateSpace(params)
    h = ss.h
    x = np.zeros(ss.p)
    P = ss.stationary_cov.copy()
    means = np.empty(pt.size)
    variances = np.empty(pt.size)
    # merge: walk observations; flush predictions that fall before each obs
    pi = 0
    prev_t: float | None = None

    def _advance(to_t: float):
        nonlocal x, P, prev_t
        if prev_t is not None:
            dt = to_t - prev_t
            if dt > 0:
                phi = ss.transition(dt)
                x = phi @ x
                P = phi @ P @ phi.T + ss.q_dt(dt)
                prev_t = to_t
        # before the first observation the state IS the stationary prior —
        # time passage changes nothing, so leave prev_t unset

    for i in range(t.size):
        while pi < pt.size and pt[order[pi]] <= t[i]:
            k = order[pi]
            _advance(pt[k])
            means[k] = float(h @ x)
            variances[k] = float(h @ P @ h)
            pi += 1
        _advance(t[i])
        if prev_t is None:
            prev_t = t[i]
        y_hat = h @ x
        nu = v[i] - y_hat
        S = h @ P @ h + e[i] * e[i]
        if S <= 0:
            raise ValueError("Non-positive innovation variance")
        K = (P @ h) / S
        x = x + K * nu
        P = (np.eye(ss.p) - np.outer(K, h)) @ P
    while pi < pt.size:
        k = order[pi]
        _advance(pt[k])
        means[k] = float(h @ x)
        variances[k] = float(h @ P @ h)
        pi += 1
    return {"pred_times": pt, "pred_means": means, "pred_variances": variances}


def carma_mle(times, values, errors, p: int, q: int, n_starts: int = 8, max_iter: int = 1000) -> dict:
    """Multi-start random evaluation (NOT gradient optimization — matching
    the reference's current behavior, src/carma/mle.rs:32-115)."""
    _validate_series(times, values, errors)
    if p == 0 or q >= p:
        raise ValueError(f"Invalid CARMA order: p={p}, q={q}")
    best = None
    best_ll = -np.inf
    for i in range(n_starts):
        cand = _random_start(p, q, i)
        try:
            ll = carma_loglikelihood(times, values, errors, cand)
        except ValueError:
            continue
        if np.isfinite(ll) and ll > best_ll:
            best_ll = ll
            best = cand
    if best is None:
        raise RuntimeError("All parameter evaluations failed")
    n_params = p + (q + 1) + 1
    aic, aicc, bic = information_criteria(best_ll, n_params, len(np.asarray(times)))
    return {
        "params": best,
        "loglikelihood": best_ll,
        "aic": aic,
        "aicc": aicc,
        "bic": bic,
        "iterations": 1,
        "converged": True,
    }


def carma_choose_order(times, values, errors, max_p: int, max_q: int, n_starts: int = 4) -> dict:
    """AICc grid over (p, q) with q < p (src/carma/selection.rs:24-95)."""
    aicc_grid = np.full((max_p, max_q + 1), np.nan)
    best = (1, 0, np.inf)
    for p in range(1, max_p + 1):
        for q in range(0, min(p, max_q + 1)):
            try:
                res = carma_mle(times, values, errors, p, q, n_starts=n_starts, max_iter=500)
            except (ValueError, RuntimeError):
                continue
            aicc_grid[p - 1, q] = res["aicc"]
            if res["aicc"] < best[2]:
                best = (p, q, res["aicc"])
    return {
        "best_p": best[0],
        "best_q": best[1],
        "best_aicc": best[2],
        "aicc_grid": aicc_grid,
        "p_values": np.arange(1, max_p + 1),
        "q_values": np.arange(0, max_q + 1),
    }


# ---- MCMC with parallel tempering (src/carma/mcmc.rs) ----


@dataclass
class McmcParams:
    """MCMC parameterization (src/carma/types.rs:150-224): ysigma,
    measerr_scale, mu + raw AR/MA vectors; to_carma maps ar directly and
    ma -> [1.0, ma...]."""

    p: int
    q: int
    ysigma: float = 1.0
    measerr_scale: float = 1.0
    mu: float = 0.0
    ar_params: np.ndarray | None = None
    ma_params: np.ndarray | None = None

    def __post_init__(self):
        if self.p == 0 or self.q >= self.p:
            raise ValueError(f"Invalid CARMA order: p={self.p}, q={self.q}")
        if self.ar_params is None:
            self.ar_params = np.zeros(self.p)
        if self.ma_params is None:
            self.ma_params = np.zeros(self.q)

    def to_carma_params(self) -> CarmaParams:
        return CarmaParams(
            self.p,
            self.q,
            ar_coeffs=list(self.ar_params),
            ma_coeffs=[1.0] + list(self.ma_params),
            sigma=self.ysigma,
        )

    def to_vector(self) -> np.ndarray:
        return np.concatenate(
            [self.ar_params, self.ma_params, [np.log(self.ysigma), np.log(self.measerr_scale), self.mu]]
        )

    @classmethod
    def from_vector(cls, p: int, q: int, vec: np.ndarray) -> "McmcParams":
        return cls(
            p, q,
            ysigma=float(np.exp(vec[p + q])),
            measerr_scale=float(np.exp(vec[p + q + 1])),
            mu=float(vec[p + q + 2]),
            ar_params=vec[:p].copy(),
            ma_params=vec[p : p + q].copy(),
        )


def _log_prior(mp: McmcParams) -> float:
    """N(0,2) on AR/MA, N(0,1) on ln ysigma, N(0,0.5) on ln measerr,
    N(0,5) on mu (src/carma/mcmc.rs:100-125)."""

    def lnpdf(x, s):
        return -0.5 * (x / s) ** 2 - np.log(s * np.sqrt(2 * np.pi))

    lp = float(np.sum(lnpdf(mp.ar_params, 2.0)) + np.sum(lnpdf(mp.ma_params, 2.0)))
    lp += float(lnpdf(np.log(mp.ysigma), 1.0))
    lp += float(lnpdf(np.log(mp.measerr_scale), 0.5))
    lp += float(lnpdf(mp.mu, 5.0))
    return lp


class _Chain:
    def __init__(self, params: McmcParams, temperature: float, seed: int):
        self.params = params
        self.temperature = temperature
        self.rng = np.random.default_rng(seed)
        d = params.p + params.q + 3
        self.prop_var = np.full(d, 0.01)  # diagonal proposal (mcmc.rs:41,135)
        self.loglik = -np.inf
        self.logprior = 0.0
        self.n_accepted = 0
        self.n_total = 0

    def propose(self) -> np.ndarray:
        vec = self.params.to_vector()
        return vec + self.rng.standard_normal(vec.size) * np.sqrt(self.prop_var)

    def update_cov(self, samples: np.ndarray):
        """2.38^2/d scaling + 1e-6 jitter (mcmc.rs:168-196); diagonal used."""
        if samples.shape[0] < 10:
            return
        d = samples.shape[1]
        var = samples.var(axis=0, ddof=1)
        self.prop_var = var * (2.38**2) / d + 1e-6


def carma_mcmc(
    times, values, errors, p: int, q: int, n_samples: int,
    n_burn: int | None = None, n_chains: int = 4, seed: int = 42,
) -> dict:
    """Adaptive Metropolis within parallel tempering
    (src/carma/mcmc.rs:387-501): temperature ladder 1.0,1.5,...; swaps every
    10 (burn) / 5 (sample) iterations; proposal covariance re-estimated every
    100 burn iterations from the last 200 samples; cold-chain extraction;
    split-free R-hat + simple ESS (mcmc.rs:504-566).

    Documented divergences: numpy RNG streams (values differ from Rust
    StdRng); proposals whose likelihood fails to evaluate (non-stationary AR)
    are rejected with loglik = -inf instead of aborting the whole run (the
    reference's `?` operator aborts, which kills most runs in practice).
    """
    _validate_series(times, values, errors)
    t = np.asarray(times, dtype=np.float64)
    v = np.asarray(values, dtype=np.float64)
    e = np.asarray(errors, dtype=np.float64)
    n_burn = n_burn if n_burn is not None else n_samples // 4
    d = p + q + 3

    init = McmcParams(p, q)
    init.ysigma = float(np.sqrt((v**2).sum()) / np.sqrt(v.size))
    init.mu = float(v.mean())
    rng0 = np.random.default_rng(seed)
    init.ar_params = rng0.uniform(-0.1, 0.1, p)
    init.ma_params = rng0.uniform(-0.1, 0.1, q)

    def loglik_of(mp: McmcParams) -> float:
        try:
            return carma_loglikelihood(t, v - mp.mu, e * mp.measerr_scale, mp.to_carma_params())
        except (ValueError, FloatingPointError):
            return -np.inf

    chains = [
        _Chain(
            McmcParams(p, q, init.ysigma, init.measerr_scale, init.mu,
                       init.ar_params.copy(), init.ma_params.copy()),
            1.0 + 0.5 * i,
            seed + i * 1000,
        )
        for i in range(n_chains)
    ]
    for c in chains:
        c.loglik = loglik_of(c.params)
        c.logprior = _log_prior(c.params)

    n_swap_att = n_swap_acc = 0

    def step():
        for c in chains:
            prop_vec = c.propose()
            try:
                prop = McmcParams.from_vector(p, q, prop_vec)
            except (ValueError, OverflowError):
                c.n_total += 1
                continue
            ll = loglik_of(prop)
            lp = _log_prior(prop)
            log_alpha = ((ll + lp) - (c.loglik + c.logprior)) / c.temperature
            c.n_total += 1
            if np.log(c.rng.random() + 1e-300) < log_alpha:
                c.params, c.loglik, c.logprior = prop, ll, lp
                c.n_accepted += 1

    def swaps():
        nonlocal n_swap_att, n_swap_acc
        for i in range(n_chains - 1):
            beta_i = 1.0 / chains[i].temperature
            beta_j = 1.0 / chains[i + 1].temperature
            log_alpha = (beta_i - beta_j) * (chains[i + 1].loglik - chains[i].loglik)
            n_swap_att += 1
            if chains[0].rng.random() < min(np.exp(min(log_alpha, 0.0)) if log_alpha < 0 else 1.0, 1.0):
                a, b = chains[i], chains[i + 1]
                a.params, b.params = b.params, a.params
                a.loglik, b.loglik = b.loglik, a.loglik
                a.logprior, b.logprior = b.logprior, a.logprior
                n_swap_acc += 1

    # adaptation phase
    adapt_hist = [[] for _ in range(n_chains)]
    for it in range(n_burn):
        step()
        for ci, c in enumerate(chains):
            adapt_hist[ci].append(c.params.to_vector())
        if it % 10 == 0:
            swaps()
        if it % 100 == 99 and it > 200:
            for ci, c in enumerate(chains):
                c.update_cov(np.asarray(adapt_hist[ci][-200:]))

    # sampling phase
    all_samples = np.empty((n_chains, n_samples, d))
    for it in range(n_samples):
        step()
        for ci, c in enumerate(chains):
            all_samples[ci, it] = c.params.to_vector()
        if it % 5 == 0:
            swaps()

    cold = all_samples[0]
    logliks = np.array([loglik_of(McmcParams.from_vector(p, q, s)) for s in cold])

    # R-hat + simple ESS (mcmc.rs:504-566)
    if n_chains < 2:
        rhat = np.ones(d)
        ess = np.full(d, float(n_samples))
    else:
        chain_means = all_samples.mean(axis=1)  # (chains, d)
        chain_vars = all_samples.var(axis=1, ddof=1)
        overall = chain_means.mean(axis=0)
        between = n_samples * ((chain_means - overall) ** 2).sum(axis=0) / (n_chains - 1)
        within = chain_vars.mean(axis=0)
        var_est = ((n_samples - 1) * within + between) / n_samples
        with np.errstate(invalid="ignore", divide="ignore"):
            rhat = np.where(within > 0, np.sqrt(var_est / within), 1.0)
            ess = np.where(var_est > 0, n_chains * n_samples / (1.0 + 2.0 * rhat), n_chains * n_samples)

    return {
        "samples": cold,
        "loglikelihoods": logliks,
        "acceptance_rate": chains[0].n_accepted / max(chains[0].n_total, 1),
        "swap_acceptance_rate": n_swap_acc / max(n_swap_att, 1),
        "rhat": rhat,
        "effective_sample_size": ess,
        "n_samples": n_samples,
        "n_burn": n_burn,
        "p": p,
        "q": q,
    }
