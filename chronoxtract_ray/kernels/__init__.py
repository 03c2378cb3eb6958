"""Feature-kernel namespace + user-extension registry.

Mirrors the reference's flat function namespace (the ``chronoxtract`` module
registered at /root/reference/src/lib.rs:143-248) as plain NumPy functions,
plus a ``register_feature`` extension point consumed by the windowed rollup
stage (the engine-side equivalent of adding a ``#[pyfunction]``).
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

from chronoxtract_ray.kernels.moments import (  # noqa: F401
    calculate_absolute_energy,
    calculate_kurtosis,
    calculate_mean,
    calculate_median,
    calculate_min_max_range,
    calculate_mode,
    calculate_quantiles,
    calculate_skewness,
    calculate_std_dev,
    calculate_sum,
    calculate_variance,
    central_moment,
    higher_moments,
    median_and_quantiles,
    summary_statistics,
    time_series_summary,
)
from chronoxtract_ray.kernels.hjorth import (  # noqa: F401
    hjorth_activity,
    hjorth_complexity,
    hjorth_mobility,
    hjorth_parameters,
)
from chronoxtract_ray.kernels.rolling import (  # noqa: F401
    expanding_sum,
    exponential_moving_average,
    rolling_mean,
    rolling_variance,
    sliding_window_entropy,
)
from chronoxtract_ray.kernels.entropy import (  # noqa: F401
    approximate_entropy,
    lempel_ziv_complexity,
    multiscale_entropy,
    permutation_entropy,
    sample_entropy,
)
from chronoxtract_ray.kernels.shape import (  # noqa: F401
    energy_distribution,
    enhanced_peak_stats,
    max_slope,
    mean_slope,
    peak_to_peak_amplitude,
    slope_features,
    slope_variance,
    turning_points,
    variability_features,
    zero_crossing_rate,
)
from chronoxtract_ray.kernels.peaks import find_peaks, peak_prominence  # noqa: F401
from chronoxtract_ray.kernels.fda import fft_band_energies, lomb_scargle, perform_fft  # noqa: F401
from chronoxtract_ray.kernels.seasonality import (  # noqa: F401
    autocorrelation,
    detect_seasonality,
    detrended_fluctuation_analysis,
    seasonal_strength,
    seasonal_trend_strength,
    simple_stl_decomposition,
    trend_strength,
)
from chronoxtract_ray.kernels.variability import (  # noqa: F401
    calc_variability_timescale,
    fractional_variability,
    fractional_variability_error,
    rolling_fractional_variability,
    variability_statistics,
)
from chronoxtract_ray.kernels.matrices import (  # noqa: F401
    gramian_angular_summation_field,
    markov_transition_field,
    time_delay_embedding,
)
from chronoxtract_ray.kernels.correlation import acf, dcf, zdcf  # noqa: F401
from chronoxtract_ray.kernels.windowed import (  # noqa: F401
    FEATURE_COLUMNS,
    FeatureSpec,
    compute_windowed_features,
)

# ---- user-extension surface -------------------------------------------------
# fn(values: np.ndarray) -> float, evaluated once per (conv_id, window) by the
# rollup stage when its name appears in RollupConfig.extra_features.
_CUSTOM_FEATURES: dict[str, Callable[[np.ndarray], float]] = {}


def register_feature(name: str, fn: Callable[[np.ndarray], float]) -> None:
    """Register a custom scalar per-window feature kernel."""
    if not name.isidentifier():
        raise ValueError(f"feature name must be an identifier: {name!r}")
    _CUSTOM_FEATURES[name] = fn


def custom_features() -> dict[str, Callable[[np.ndarray], float]]:
    return dict(_CUSTOM_FEATURES)
