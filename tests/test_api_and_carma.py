"""Dataset-level API surface + CARMA kernel tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import chronoxtract_ray.api as api
from chronoxtract_ray.kernels import carma


def _ou_series(n=120, tau=5.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.sort(rng.uniform(0, 60, n)) + np.arange(n) * 1e-6
    x = np.zeros(n)
    for i in range(1, n):
        a = np.exp(-(t[i] - t[i - 1]) / tau)
        x[i] = a * x[i - 1] + np.sqrt(1 - a * a) * rng.standard_normal()
    e = np.full(n, 0.05)
    return t, x + e * rng.standard_normal(n), e


class TestCarma:
    def test_loglik_prefers_true_params(self):
        t, y, e = _ou_series()
        tau = 5.0
        good = carma.CarmaParams(1, 0, ar_coeffs=[1 / tau], sigma=np.sqrt(2 / tau))
        bad = carma.CarmaParams(1, 0, ar_coeffs=[5.0], sigma=1.0)
        assert carma.carma_loglikelihood(t, y, e, good) > carma.carma_loglikelihood(t, y, e, bad)

    def test_kalman_outputs(self):
        t, y, e = _ou_series(80)
        kf = carma.carma_kalman_filter(t, y, e, carma.CarmaParams(1, 0, ar_coeffs=[0.2], sigma=0.6))
        assert kf["innovations"].shape == (80,)
        assert (kf["innovation_variances"] > 0).all()
        assert np.isfinite(kf["loglikelihood"])

    def test_mle_and_order_selection(self):
        t, y, e = _ou_series(100)
        res = carma.carma_mle(t, y, e, 1, 0, n_starts=6)
        assert np.isfinite(res["loglikelihood"]) and res["aicc"] > res["aic"]
        order = carma.carma_choose_order(t, y, e, 2, 1, n_starts=2)
        assert order["best_p"] in (1, 2)

    def test_validation(self):
        with pytest.raises(ValueError):
            carma.CarmaParams(2, 2)
        with pytest.raises(ValueError):
            carma.carma_loglikelihood([1, 2], [1, 2], [1, 1], carma.CarmaParams(1, 0))  # <3 points
        with pytest.raises(ValueError):
            carma.carma_loglikelihood([3, 2, 1], [1, 2, 3], [1, 1, 1], carma.CarmaParams(1, 0))  # descending
        with pytest.raises(ValueError):
            # non-stationary (negative AR coeff → positive root)
            carma.carma_loglikelihood([1, 2, 3], [1, 2, 3], [1, 1, 1], carma.CarmaParams(1, 0, ar_coeffs=[-1.0]))

    def test_qdt_limits_to_stationary_cov(self):
        """Regression pin for the documented sign fix (kernels/carma.py q_dt):
        the integrated process noise must start at ~0, grow monotonically with
        the gap, and converge to the stationary covariance — the property the
        reference's (1-exp(s dt))/s sign violates (negative noise, filter
        blow-up on gaps). Exact for p=1; diagonal entries for p=2 (q_base is
        diagonal in the rotated basis, so stationary_cov is too)."""
        p1 = carma.CarmaParams(1, 0, ar_coeffs=[0.25], sigma=0.7)
        ss1 = carma._StateSpace(p1)
        np.testing.assert_allclose(ss1.q_dt(1e6), ss1.stationary_cov, rtol=1e-12)
        np.testing.assert_allclose(ss1.q_dt(1e-14), np.zeros((1, 1)), atol=1e-12)
        assert ss1.q_dt(5.0)[0, 0] >= ss1.q_dt(0.5)[0, 0] > 0

        p2 = carma.CarmaParams(2, 1, ar_coeffs=[0.9, 0.2], ma_coeffs=[1.0, 0.3], sigma=0.5)
        ss2 = carma._StateSpace(p2)
        np.testing.assert_allclose(
            np.diag(ss2.q_dt(1e6)), np.diag(ss2.stationary_cov), rtol=1e-10
        )
        # the end-to-end property the fix buys: a filter over a series with a
        # huge observation gap stays PSD and finite (upstream raises here)
        t = np.array([0.0, 1.0, 2.0, 500.0, 501.0])
        y = np.array([0.1, -0.2, 0.3, 0.0, 0.1])
        e = np.full(5, 0.05)
        kf = carma.carma_kalman_filter(t, y, e, p1)
        assert np.isfinite(kf["loglikelihood"]) and (kf["innovation_variances"] > 0).all()

    def test_predict_one_step_matches_filter(self):
        """Forecasting the held-out last point from the first n-1 must equal
        the full filter's own one-step prediction at that point (and its
        innovation variance minus the measurement noise)."""
        t, y, e = _ou_series(80)
        p = carma.CarmaParams(1, 0, ar_coeffs=[0.2], sigma=0.6)
        kf = carma.carma_kalman_filter(t, y, e, p)
        pred = carma.carma_predict(t[:-1], y[:-1], e[:-1], p, [t[-1]])
        np.testing.assert_allclose(pred["pred_means"][0], kf["predicted_observations"][-1], rtol=1e-12)
        np.testing.assert_allclose(
            pred["pred_variances"][0], kf["innovation_variances"][-1] - e[-1] ** 2, rtol=1e-10
        )

    def test_predict_horizon_limits(self):
        """Long-horizon forecast relaxes to the stationary process: mean → 0,
        variance → h'Σh monotonically; predictions before the first
        observation report the stationary prior exactly."""
        t, y, e = _ou_series(60)
        p = carma.CarmaParams(1, 0, ar_coeffs=[0.5], sigma=0.8)
        ss = carma._StateSpace(p)
        stat_var = float(ss.h @ ss.stationary_cov @ ss.h)
        horizons = t[-1] + np.array([1.0, 5.0, 50.0, 500.0])
        pred = carma.carma_predict(t, y, e, p, horizons)
        assert abs(pred["pred_means"][-1]) < 1e-6
        np.testing.assert_allclose(pred["pred_variances"][-1], stat_var, rtol=1e-8)
        assert (np.diff(pred["pred_variances"]) >= -1e-12).all()
        before = carma.carma_predict(t, y, e, p, [t[0] - 100.0])
        assert before["pred_means"][0] == 0.0
        np.testing.assert_allclose(before["pred_variances"][0], stat_var, rtol=1e-12)

    def test_carma2_runs(self):
        t, y, e = _ou_series(100)
        p = carma.CarmaParams(2, 1, ar_coeffs=[0.9, 0.2], ma_coeffs=[1.0, 0.3], sigma=0.5)
        ll = carma.carma_loglikelihood(t, y, e, p)
        assert np.isfinite(ll)


@pytest.fixture(scope="module")
def tiny_ds(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    rows = []
    for conv in ("a", "b", "c"):
        n = 40
        ts = np.cumsum(rng.integers(1, 5, n)).astype(np.int64)
        vals = np.abs(rng.normal(50, 10, n))
        for i in range(n):
            rows.append({"conv_id": conv, "ts_us": int(ts[i]), "turn_idx": i, "value": float(vals[i])})
    return rd.from_items(rows)


class TestDatasetAPI:
    def test_summary(self, tiny_ds):
        df = api.time_series_summary(tiny_ds).to_pandas()
        assert len(df) == 3 and "mean" in df and "q95" in df

    def test_rolling_list_column(self, tiny_ds):
        df = api.rolling_mean(tiny_ds, window=5).to_pandas()
        assert len(df) == 3
        assert all(len(r) == 36 for r in df["rolling_mean"])

    def test_entropy_and_hjorth(self, tiny_ds):
        df = api.sample_entropy(tiny_ds, m=2, r=5.0).to_pandas()
        assert np.isfinite(df["sample_entropy"]).all()
        dh = api.hjorth_parameters(tiny_ds).to_pandas()
        assert (dh["activity"] > 0).all()

    def test_fvar_with_default_errors(self, tiny_ds):
        df = api.fractional_variability(tiny_ds).to_pandas()
        assert len(df) == 3 and (df["fvar"] >= 0).all()

    def test_matrices_flattened(self, tiny_ds):
        df = api.markov_transition_field(tiny_ds, num_bins=3).to_pandas()
        assert all(len(r) == 40 * 40 for r in df["mtf"])

    def test_acf_dict_output(self, tiny_ds):
        df = api.acf(tiny_ds, lag_min=-20.0, lag_max=20.0, lag_bin_width=5.0).to_pandas()
        assert "correlations" in df.columns

    def test_carma_over_dataset(self, tiny_ds):
        df = api.carma_loglikelihood(tiny_ds, p=1, q=0, ar_coeffs=[0.5], sigma=10.0).to_pandas()
        assert len(df) == 3 and np.isfinite(df["loglik"]).all()

    def test_error_rows_not_fatal(self, ray_session):
        import ray.data as rd

        ds = rd.from_items([{"conv_id": "x", "ts_us": 1, "turn_idx": 0, "value": 1.0}])
        df = api.hjorth_parameters(ds).to_pandas()  # needs >=3 points → error column
        assert "error" in df.columns

    def test_function_registry_covers_reference_surface(self):
        # every reference-registered function family has a dataset-level entry
        expected = [
            "time_series_summary", "calculate_mean", "calculate_mode", "calculate_quantiles",
            "rolling_mean", "rolling_variance", "expanding_sum", "exponential_moving_average",
            "sliding_window_entropy", "sample_entropy", "approximate_entropy",
            "permutation_entropy", "lempel_ziv_complexity", "multiscale_entropy",
            "hjorth_parameters", "zero_crossing_rate", "slope_features", "variability_features",
            "turning_points", "energy_distribution", "enhanced_peak_stats",
            "peak_to_peak_amplitude", "find_peaks", "peak_prominence", "perform_fft",
            "lomb_scargle", "simple_stl_decomposition", "seasonal_trend_strength",
            "detect_seasonality", "detrended_fluctuation_analysis", "fractional_variability",
            "calc_variability_timescale", "variability_statistics", "acf", "zdcf_self",
            "time_delay_embedding", "gramian_angular_summation_field", "markov_transition_field",
            "carma_loglikelihood", "carma_mle", "carma_choose_order",
        ]
        for name in expected:
            assert name in api.FUNCTIONS, name


class TestCarmaMcmc:
    def test_mcmc_runs_and_is_deterministic(self):
        t, y, e = _ou_series(50)
        kwargs = dict(n_samples=120, n_burn=120, n_chains=3, seed=7)
        a = carma.carma_mcmc(t, y, e, 1, 0, **kwargs)
        b = carma.carma_mcmc(t, y, e, 1, 0, **kwargs)
        assert np.array_equal(a["samples"], b["samples"])
        assert a["samples"].shape == (120, 4)  # p + q + 3 params
        assert 0.0 < a["acceptance_rate"] < 1.0
        assert np.isfinite(a["loglikelihoods"]).all()
        assert a["rhat"].shape == (4,)

    def test_mcmc_posterior_tracks_likelihood(self):
        t, y, e = _ou_series(60)
        res = carma.carma_mcmc(t, y, e, 1, 0, n_samples=200, n_burn=200, n_chains=2, seed=3)
        # posterior samples should beat the (bad) initial guess on average
        init = carma.CarmaParams(1, 0, ar_coeffs=[0.05], sigma=1.0)
        base = carma.carma_loglikelihood(t, y - y.mean(), e, init)
        assert np.median(res["loglikelihoods"]) >= base - 5.0


def test_dcf_pairs_distributed_join(tiny_ds):
    df = api.dcf_pairs(tiny_ds, [("a", "b"), ("b", "c")], -50.0, 50.0, 10.0).to_pandas()
    assert len(df) == 2
    assert "correlations" in df.columns
    assert all(len(r) > 0 for r in df["correlations"])


def test_dcf_pairs_hash_join_lag_recovery_10k_pairs(ray_session):
    """Large-pair-list regime: the pair list rides the HASH-JOIN path (no
    driver broadcast) and every pair's DCF must recover the planted +6h lag.
    100 'early'-bump x 100 'late'-bump series -> 10,000 pairs."""
    import ray.data as rd

    t = np.arange(24, dtype=np.float64)
    cols = {"conv_id": [], "ts_us": [], "turn_idx": [], "value": []}
    for i in range(100):
        for name, c in ((f"early{i:03d}", 6.0), (f"late{i:03d}", 12.0)):
            v = np.exp(-((t - c) ** 2) / 8.0) + 0.01 * np.sin(t + i)
            cols["conv_id"].extend([name] * t.size)
            cols["ts_us"].extend(t)
            cols["turn_idx"].extend(range(t.size))
            cols["value"].extend(v)
    ds = rd.from_arrow(pa.table(cols))
    pairs = [(f"early{i:03d}", f"late{j:03d}") for i in range(100) for j in range(100)]
    out = api.dcf_pairs(
        ds, pairs, -16.0, 16.0, 4.0, broadcast_pairs=False, num_partitions=8
    ).take_all()
    assert len(out) == 10_000
    good = 0
    for r in out:
        lags = np.asarray(r["lags"], dtype=np.float64)
        corr = np.asarray(r["correlations"], dtype=np.float64)
        if lags.size and abs(lags[int(np.argmax(corr))] - 6.0) <= 2.0:
            good += 1
    assert good == 10_000, f"lag recovered in only {good}/10000 pairs"
