"""Dataset-level API: every reference function, Ray-Data-first.

The reference exposes ~57 functions over ONE in-memory numpy series
(src/lib.rs:143-248). A data engine works over tables of many series, so
each function here has the shape::

    api.<name>(ds, by="conv_id", ts="ts_us", value="value", **params) -> Dataset

with one output row per series (group), computed via
``groupby(by).map_groups`` with a deterministic (ts, turn) sort inside the
group. Scalar/tuple outputs become named float columns; array outputs become
``list<float64>`` columns; dict outputs (DCF/ACF/ZDCF) become one list
column per key.

Columns default to the derive-stage schema; pass ``ts``/``value``/``by`` to
run over any table (e.g. events: by="user_id", ts="ts_us").

Example::

    import chronoxtract_ray.api as api
    ds = rd.read_parquet(...).map_batches(make_derive(HOUR_US), ...)
    api.time_series_summary(ds).to_pandas()
    api.rolling_mean(ds, window=5)
    api.sample_entropy(ds, m=2, r=0.2)
    api.carma_mle(ds, p=1, q=0)
"""

from __future__ import annotations

import sys
from collections.abc import Callable

import numpy as np
import pyarrow as pa

from chronoxtract_ray import kernels as K
from chronoxtract_ray.kernels import carma as KC

__all__ = ["apply_per_series", "FUNCTIONS"]


def _as_table(group_out: dict) -> pa.Table:
    arrays = {}
    for name, val in group_out.items():
        if isinstance(val, np.ndarray) and val.ndim == 1:
            arrays[name] = pa.array([val.astype(np.float64)], pa.list_(pa.float64()))
        elif isinstance(val, np.ndarray) and val.ndim == 2:
            arrays[name] = pa.array([val.astype(np.float64).ravel()], pa.list_(pa.float64()))
            arrays[name + "_ncols"] = pa.array([val.shape[1]], pa.int64())
        elif isinstance(val, (list, tuple)):
            arrays[name] = pa.array([list(map(float, val))], pa.list_(pa.float64()))
        elif val is None:
            arrays[name] = pa.array([None], pa.float64())
        elif isinstance(val, bool):
            arrays[name] = pa.array([val], pa.bool_())
        elif isinstance(val, str):
            arrays[name] = pa.array([val], pa.string())
        else:
            arrays[name] = pa.array([float(val)], pa.float64())
    return arrays


def apply_per_series(
    ds,
    fn: Callable[..., dict],
    *,
    by: str = "conv_id",
    ts: str = "ts_us",
    value: str = "value",
    needs_ts: bool = False,
    error: str | None = None,
    **kwargs,
):
    """Run ``fn(series_values, [times], [errors], **kwargs) -> dict`` once per
    series; dict values become columns (arrays → list columns)."""

    def group_fn(g: pa.Table) -> pa.Table:
        order_cols = [c for c in (ts, "turn_idx", "turn") if c in g.column_names]
        if order_cols:
            keys = tuple(g[c].to_numpy() for c in reversed(order_cols))
            order = np.lexsort(keys)
        else:
            order = np.arange(g.num_rows)
        v = g[value].to_numpy().astype(np.float64)[order]
        args = [v]
        if needs_ts:
            args.insert(0, g[ts].to_numpy().astype(np.float64)[order])
        if error is not None:
            if error in g.column_names:
                args.append(g[error].to_numpy().astype(np.float64)[order])
            else:
                args.append(np.ones_like(v))
        try:
            out = fn(*args, **kwargs)
        except (ValueError, RuntimeError) as exc:
            out = {"error": f"{type(exc).__name__}: {exc}"}
        key_val = g[by][0].as_py()
        arrays = {by: pa.array([key_val])}
        arrays.update(_as_table(out))
        return pa.table(arrays)

    return ds.groupby(by).map_groups(group_fn, batch_format="pyarrow")


def _d(**kv):
    return kv


# name -> (kernel adapter, needs_ts, needs_error)
FUNCTIONS: dict[str, tuple[Callable, bool, bool]] = {
    # summary statistics (src/stats/, src/lib.rs)
    "time_series_summary": (lambda v: K.time_series_summary(v), False, False),
    "time_series_mean_median_mode": (
        lambda v: _d(mean=K.calculate_mean(v), median=K.calculate_median(v), mode=K.calculate_mode(v)),
        False, False,
    ),
    "calculate_mean": (lambda v: _d(mean=K.calculate_mean(v)), False, False),
    "calculate_median": (lambda v: _d(median=K.calculate_median(v)), False, False),
    "calculate_mode": (lambda v: _d(mode=K.calculate_mode(v)), False, False),
    "calculate_variance": (lambda v: _d(variance=K.calculate_variance(v)), False, False),
    "calculate_std_dev": (lambda v: _d(std_dev=K.calculate_std_dev(v)), False, False),
    "calculate_skewness": (lambda v: _d(skewness=K.calculate_skewness(v)), False, False),
    "calculate_kurtosis": (lambda v: _d(kurtosis=K.calculate_kurtosis(v)), False, False),
    "calculate_min_max_range": (
        lambda v: dict(zip(("min", "max", "range"), K.calculate_min_max_range(v))), False, False,
    ),
    "calculate_quantiles": (lambda v: _d(quantiles=K.calculate_quantiles(v)), False, False),
    "calculate_sum": (lambda v: _d(sum=K.calculate_sum(v)), False, False),
    "calculate_absolute_energy": (lambda v: _d(energy=K.calculate_absolute_energy(v)), False, False),
    "higher_moments": (
        lambda v: dict(zip(("m5", "m6", "m7", "m8"), K.higher_moments(v))), False, False,
    ),
    "central_moment_5": (lambda v: _d(m5=K.central_moment(v, 5)), False, False),
    "central_moment_6": (lambda v: _d(m6=K.central_moment(v, 6)), False, False),
    "central_moment_7": (lambda v: _d(m7=K.central_moment(v, 7)), False, False),
    "central_moment_8": (lambda v: _d(m8=K.central_moment(v, 8)), False, False),
    # rolling (src/rollingstats/)
    "rolling_mean": (lambda v, window: _d(rolling_mean=K.rolling_mean(v, window)), False, False),
    "rolling_variance": (lambda v, window: _d(rolling_variance=K.rolling_variance(v, window)), False, False),
    "expanding_sum": (lambda v: _d(expanding_sum=K.expanding_sum(v)), False, False),
    "exponential_moving_average": (
        lambda v, alpha: _d(ema=K.exponential_moving_average(v, alpha)), False, False,
    ),
    "sliding_window_entropy": (
        lambda v, window, bins: _d(entropy=K.sliding_window_entropy(v, window, bins)), False, False,
    ),
    # entropy (src/entropy/)
    "sample_entropy": (lambda v, m=2, r=0.2: _d(sample_entropy=K.sample_entropy(v, m, r)), False, False),
    "approximate_entropy": (
        lambda v, m=2, r=0.2: _d(approx_entropy=K.approximate_entropy(v, m, r)), False, False,
    ),
    "permutation_entropy": (
        lambda v, m=3, delay=1: _d(perm_entropy=K.permutation_entropy(v, m, delay)), False, False,
    ),
    "lempel_ziv_complexity": (
        lambda v, threshold=None: _d(lzc=K.lempel_ziv_complexity(v, threshold)), False, False,
    ),
    "multiscale_entropy": (
        lambda v, m=2, r=0.2, max_scale=3: _d(mse=np.asarray(K.multiscale_entropy(v, m, r, max_scale))),
        False, False,
    ),
    # hjorth (src/higherorder/)
    "hjorth_parameters": (
        lambda v: dict(zip(("activity", "mobility", "complexity"), K.hjorth_parameters(v))), False, False,
    ),
    "hjorth_activity": (lambda v: _d(activity=K.hjorth_activity(v)), False, False),
    "hjorth_mobility": (lambda v: _d(mobility=K.hjorth_mobility(v)), False, False),
    "hjorth_complexity": (lambda v: _d(complexity=K.hjorth_complexity(v)), False, False),
    # shape (src/shape/)
    "zero_crossing_rate": (lambda v: _d(zcr=K.zero_crossing_rate(v)), False, False),
    "slope_features": (
        lambda v: dict(zip(("mean_slope", "slope_variance", "max_slope"), K.slope_features(v))), False, False,
    ),
    "mean_slope": (lambda v: _d(mean_slope=K.mean_slope(v)), False, False),
    "slope_variance": (lambda v: _d(slope_variance=K.slope_variance(v)), False, False),
    "max_slope": (lambda v: _d(max_slope=K.max_slope(v)), False, False),
    "variability_features": (
        lambda v: dict(zip(("cv", "qcd", "mad", "iqr"), K.variability_features(v))), False, False,
    ),
    "turning_points": (
        lambda v: dict(zip(("n_turning_points", "turning_point_rate"), K.turning_points(v))), False, False,
    ),
    "energy_distribution": (
        lambda v: dict(zip(("energy_entropy", "normalized_energy", "energy_concentration"), K.energy_distribution(v))),
        False, False,
    ),
    "enhanced_peak_stats": (
        lambda v, min_prominence=0.1, min_distance=1: dict(
            zip(
                ("n_peaks", "mean_prominence", "mean_spacing", "mean_width", "max_p2p", "peak_density"),
                K.enhanced_peak_stats(v, min_prominence, min_distance),
            )
        ),
        False, False,
    ),
    "peak_to_peak_amplitude": (
        lambda v: dict(zip(("max_p2p", "mean_p2p", "std_p2p"), K.peak_to_peak_amplitude(v))), False, False,
    ),
    # peaks (src/peaks/)
    "find_peaks": (
        lambda v, height=None, distance=None: _d(peaks=K.find_peaks(v, height, distance).astype(np.float64)),
        False, False,
    ),
    "peak_prominence": (
        lambda v, height=None, distance=None: _d(
            prominences=K.peak_prominence(v, K.find_peaks(v, height, distance))
        ),
        False, False,
    ),
    # frequency domain (src/fda/)
    "perform_fft": (
        lambda v: (lambda F: _d(fft_re=F.real, fft_im=F.imag))(np.fft.fft(v)), False, False,
    ),
    "fft_band_energies": (
        lambda v, n_bands=4: _d(band_energies=K.fft_band_energies(v, n_bands)), False, False,
    ),
    "lomb_scargle": (
        lambda t, v, freqs: _d(power=K.lomb_scargle(t, v, np.asarray(freqs))), True, False,
    ),
    # seasonality (src/seasonality/)
    "simple_stl_decomposition": (
        lambda v, period: dict(zip(("trend", "seasonal", "remainder"), K.simple_stl_decomposition(v, period))),
        False, False,
    ),
    "seasonal_trend_strength": (
        lambda v, period: dict(zip(("seasonal_strength", "trend_strength"), K.seasonal_trend_strength(v, period))),
        False, False,
    ),
    "seasonal_strength": (lambda v, period: _d(seasonal_strength=K.seasonal_strength(v, period)), False, False),
    "trend_strength": (lambda v, period: _d(trend_strength=K.trend_strength(v, period)), False, False),
    "detect_seasonality": (
        lambda v, period, threshold=None: _d(seasonal=K.detect_seasonality(v, period, threshold)), False, False,
    ),
    "detrended_fluctuation_analysis": (
        lambda v, min_window=4, max_window=64, num_windows=10: _d(
            dfa_alpha=K.detrended_fluctuation_analysis(v, min_window, max_window, num_windows)
        ),
        False, False,
    ),
    # variability (src/misc/)
    "fractional_variability": (
        lambda v, e: _d(fvar=K.fractional_variability(np.abs(v), e)), False, True,
    ),
    "fractional_variability_error": (
        lambda v, e: _d(fvar_err=K.fractional_variability_error(np.abs(v), e)), False, True,
    ),
    "rolling_fractional_variability": (
        lambda v, e, window_size=5: dict(
            zip(("fvar", "fvar_err"), K.rolling_fractional_variability(np.abs(v), e, window_size))
        ),
        False, True,
    ),
    "calc_variability_timescale": (
        lambda t, v, e: _d(tau=K.calc_variability_timescale(t, np.abs(v), e)), True, True,
    ),
    "variability_statistics": (
        lambda t, v, e: {f"tau_{k}": x for k, x in K.variability_statistics(t, np.abs(v), e).items()},
        True, True,
    ),
    # correlation (src/correlation/)
    "acf": (
        lambda t, v, e, lag_min=-10.0, lag_max=10.0, lag_bin_width=1.0: K.acf(t, v, e, lag_min, lag_max, lag_bin_width),
        True, True,
    ),
    "zdcf_self": (
        lambda t, v, e, min_points=11, num_mc=50, seed=0: K.zdcf(t, v, e, t, v, e, min_points, num_mc, seed),
        True, True,
    ),
    # matrices (src/matrices/)
    "time_delay_embedding": (
        lambda v, window_length: _d(hankel=K.time_delay_embedding(v, window_length)), False, False,
    ),
    "gramian_angular_summation_field": (
        lambda v: _d(gasf=K.gramian_angular_summation_field(v)), False, False,
    ),
    "markov_transition_field": (
        lambda v, num_bins=4: _d(mtf=K.markov_transition_field(v, num_bins)), False, False,
    ),
    # carma (src/carma/)
    "carma_loglikelihood": (
        lambda t, v, e, p=1, q=0, ar_coeffs=None, ma_coeffs=None, sigma=1.0: _d(
            loglik=KC.carma_loglikelihood(
                t, v, e, KC.CarmaParams(p, q, list(ar_coeffs or []), list(ma_coeffs or []), sigma)
            )
        ),
        True, True,
    ),
    "carma_mle": (
        lambda t, v, e, p=1, q=0, n_starts=8: {
            k: val
            for k, val in KC.carma_mle(t, v, e, p, q, n_starts).items()
            if k in ("loglikelihood", "aic", "aicc", "bic")
        },
        True, True,
    ),
    "carma_predict": (
        lambda t, v, e, p=1, q=0, ar_coeffs=None, ma_coeffs=None, sigma=1.0, n_ahead=5: (
            lambda res: _d(
                pred_t=res["pred_times"], pred_mean=res["pred_means"], pred_var=res["pred_variances"]
            )
        )(
            KC.carma_predict(
                t, v, e,
                KC.CarmaParams(p, q, list(ar_coeffs or []), list(ma_coeffs or []), sigma),
                t[-1] + (np.median(np.diff(t)) if len(t) > 1 else 1.0) * np.arange(1, n_ahead + 1),
            )
        ),
        True, True,
    ),
    "carma_choose_order": (
        lambda t, v, e, max_p=2, max_q=1: {
            k: float(val)
            for k, val in KC.carma_choose_order(t, v, e, max_p, max_q).items()
            if k in ("best_p", "best_q", "best_aicc")
        },
        True, True,
    ),
}


def _make_api(name: str, fn: Callable, needs_ts: bool, needs_err: bool):
    def api_fn(ds, *, by: str = "conv_id", ts: str = "ts_us", value: str = "value", error: str | None = None, **kwargs):
        err_col = error if needs_err is False else (error or "__ones__")
        return apply_per_series(
            ds,
            fn,
            by=by,
            ts=ts,
            value=value,
            needs_ts=needs_ts,
            error=err_col if needs_err else None,
            **kwargs,
        )

    api_fn.__name__ = name
    api_fn.__doc__ = f"Per-series {name} over a Dataset (see module docstring)."
    return api_fn


def dcf_pairs(
    ds,
    pairs: list[tuple],
    lag_min: float,
    lag_max: float,
    lag_bin_width: float,
    *,
    by: str = "conv_id",
    ts: str = "ts_us",
    value: str = "value",
    error: str | None = None,
    broadcast_pairs: bool | None = None,
    num_partitions: int | None = None,
):
    """Cross-series Edelson-Krolik DCF for explicit series pairs — the
    distributed pair-join form of the reference's dcf_py (which only ever
    sees two in-memory arrays, src/correlation/mod.rs:37-96).

    Two scale regimes, picked automatically (override with
    ``broadcast_pairs``):

    - SMALL pair lists (<= ~100k memberships): the pair list is broadcast
      (small side); a map_batches stage replicates each row once per pair
      membership tagged (pair_id, side). No shuffle for the tagging step.
    - LARGE pair lists: the pair list becomes a Dataset of
      (pair_key, pair_id, side) memberships and is HASH-JOINED against the
      series rows on the series key — the pair list itself stays
      distributed, so the operator scales past the driver/object-store
      broadcast limit (billions of pairs at 100 TB).

    Either way one groupby(pair_id) then co-locates both series of a pair
    and the DCF kernel runs per group. Returns one row per pair with list
    columns."""
    from chronoxtract_ray.kernels.correlation import dcf as dcf_kernel

    use_broadcast = broadcast_pairs if broadcast_pairs is not None else (len(pairs) <= 50_000)

    def _tagged_broadcast(ds):
        import pandas as pd

        mem_df = pd.DataFrame(
            {
                "k": [k for ab in pairs for k in ab],
                "pair_id": np.repeat(np.arange(len(pairs), dtype=np.int64), 2),
                "side": np.tile(np.array([0, 1], dtype=np.int64), len(pairs)),
            }
        )

        def tag(batch: pa.Table) -> pa.Table:
            # vectorized membership fan-out: one merge replicates each row
            # once per (pair, side) it participates in — no per-row Python
            bdf = pd.DataFrame(
                {
                    "k": batch[by].to_numpy(zero_copy_only=False),
                    "i": np.arange(batch.num_rows, dtype=np.int64),
                }
            )
            j = bdf.merge(mem_df, on="k", sort=False)
            sub = batch.take(pa.array(j["i"].to_numpy(), pa.int64()))
            sub = sub.append_column("pair_id", pa.array(j["pair_id"].to_numpy(), pa.int64()))
            return sub.append_column("side", pa.array(j["side"].to_numpy(), pa.int64()))

        return ds.map_batches(tag, batch_format="pyarrow")

    def _tagged_join(ds):
        import ray
        import ray.data as rd

        keys = [k for ab in pairs for k in ab]
        mem = pa.table(
            {
                "pair_key": pa.array(keys),
                "pair_id": pa.array([i for i in range(len(pairs)) for _ in (0, 1)], pa.int64()),
                "side": pa.array([s for _ in pairs for s in (0, 1)], pa.int64()),
            }
        )
        P = num_partitions or max(
            2 * int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 16, 16
        )
        return ds.join(
            rd.from_arrow(mem), "inner", P, on=(by,), right_on=("pair_key",)
        )

    def per_pair(g: pa.Table) -> pa.Table:
        side = g["side"].to_numpy()
        t = g[ts].to_numpy().astype(np.float64)
        v = g[value].to_numpy().astype(np.float64)
        e = g[error].to_numpy().astype(np.float64) if error and error in g.column_names else np.ones_like(v)
        out_cols = {"pair_id": pa.array([g["pair_id"][0].as_py()], pa.int64())}
        m0, m1 = side == 0, side == 1
        if m0.sum() < 2 or m1.sum() < 2:
            out_cols["error"] = pa.array(["pair side has < 2 points"], pa.string())
            return pa.table(out_cols)
        o0, o1 = np.argsort(t[m0], kind="stable"), np.argsort(t[m1], kind="stable")
        res = dcf_kernel(
            t[m0][o0], v[m0][o0], e[m0][o0], t[m1][o1], v[m1][o1], e[m1][o1],
            lag_min, lag_max, lag_bin_width,
        )
        out_cols.update(_as_table(res))
        return pa.table(out_cols)

    tagged = _tagged_broadcast(ds) if use_broadcast else _tagged_join(ds)
    return tagged.groupby("pair_id").map_groups(per_pair, batch_format="pyarrow")


__all__.append("dcf_pairs")

_mod = sys.modules[__name__]
for _name, (_fn, _nts, _nerr) in FUNCTIONS.items():
    setattr(_mod, _name, _make_api(_name, _fn, _nts, _nerr))
    __all__.append(_name)
