"""Driver-checkable queries for the per-series feature kernels that were
previously pytest-only: peak stacks, variability/shape features, rolling
variance, energy distribution, sliding-window entropy, higher moments,
matrix transforms (TDE / GASF / MTF) and binned ACF — each paired with an
ANSI-SQL oracle where SQL can express it (see each SQL constant) —
including DCF pairs (lag-binned cross join) and multiscale entropy
(coarse-grain + SampEn self-join); CARMA forecasting stays rows-only.

Execution shape: every query is ONE Ray pipeline — read_parquet (pruned
columns) → map_batches prep → groupby(user_id).map_groups(kernel) — the
driver only collects the small result table. Float policy matches the rest
of the suite: 6-dp half-away-from-zero rounding on both sides, identical
expression association where interpolation/normalization amplifies ulps
(GASF/MTF/bins are bit-exact by construction), and magnitude-normalized
outputs where raw values span too many decades for fixed-decimal rounding
(standardized higher moments).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chronoxtract_ray.stages.util import collect_table

from chronoxtract_ray.pipelines.queries_events import _events, _prep, _round

__all__ = []  # query functions are registered via __ray_entry__


def _grouped(sf_dir: str, fn):
    ds = _events(sf_dir).map_batches(_prep, batch_format="pyarrow")
    return collect_table(ds.groupby("user_id").map_groups(fn, batch_format="pyarrow"))


def _sorted_series(group: pa.Table) -> tuple[int, np.ndarray, np.ndarray, np.ndarray]:
    ts = group["ts_us"].to_numpy()
    turn = group["turn"].to_numpy()
    val = group["value"].to_numpy()
    order = np.lexsort((turn, ts))
    return group["user_id"][0].as_py(), ts[order], val[order], turn[order]


# ---- scipy-like peak stack (src/peaks/peak_func.rs) ----


def q_find_peaks(sf_dir: str):
    """Plateau-aware find_peaks + walk-out peak_prominence per user series
    (kernels/peaks.py; reference src/peaks/peak_func.rs:1-63). The oracle
    expresses the same detection for distinct-valued series (the test data
    has no exact ties, so plateaus never arise): strict rise + >= fall via
    lag/lead, prominence via the bounded side-minima the walk-out visits."""
    from chronoxtract_ray.kernels.peaks import find_peaks, peak_prominence

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        peaks = find_peaks(val)
        proms = peak_prominence(val, peaks)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), peaks.size), pa.int64()),
                "peak_idx": pa.array(peaks, pa.int64()),
                "value": pa.array(_round(val[peaks]), pa.float64()),
                "prominence": pa.array(_round(proms), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_FIND_PEAKS = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i
  FROM events
), f AS (
  -- gaps-and-islands: maximal runs of consecutive EQUAL values. The engine
  -- (kernels/peaks.py, reference peak_func.rs) is plateau-aware: a peak is
  -- a run strictly above BOTH neighbor runs, reported at the run midpoint;
  -- leading/trailing runs are never peaks. A naive per-element
  -- (>prev AND >=next) predicate false-positives on rising plateaus and
  -- mis-indexes falling plateaus of length >= 3.
  SELECT user_id, value, i,
    CASE WHEN lag(value) OVER (PARTITION BY user_id ORDER BY i)
         IS DISTINCT FROM value THEN 1 ELSE 0 END AS brk
  FROM o
), r AS (
  SELECT user_id, value, i,
    sum(brk) OVER (PARTITION BY user_id ORDER BY i) AS run_id
  FROM f
), runs AS (
  SELECT user_id, run_id, min(i) AS s, max(i) AS e, min(value) AS v
  FROM r GROUP BY user_id, run_id
), nb AS (
  SELECT user_id, s, e, v,
    lag(v)  OVER (PARTITION BY user_id ORDER BY run_id) AS pv_,
    lead(v) OVER (PARTITION BY user_id ORDER BY run_id) AS nv_
  FROM runs
), p AS (
  SELECT user_id, s + (e - s) // 2 AS pk, v AS pv
  FROM nb
  WHERE pv_ IS NOT NULL AND nv_ IS NOT NULL AND v > pv_ AND v > nv_
), prom AS (
  SELECT p.user_id, p.pk, p.pv,
    (SELECT min(o.value) FROM o
      WHERE o.user_id = p.user_id AND o.i < p.pk
        AND o.i > coalesce((SELECT max(o2.i) FROM o o2
                            WHERE o2.user_id = p.user_id AND o2.i < p.pk
                              AND o2.value > p.pv), -1)) AS lmin,
    (SELECT min(o.value) FROM o
      WHERE o.user_id = p.user_id AND o.i > p.pk
        AND o.i < coalesce((SELECT min(o2.i) FROM o o2
                            WHERE o2.user_id = p.user_id AND o2.i > p.pk
                              AND o2.value > p.pv), 9223372036854775807)) AS rmin
  FROM p
)
SELECT user_id, pk AS peak_idx, ROUND(pv, 6) AS value,
  ROUND(pv - CASE
    WHEN lmin IS NOT NULL AND rmin IS NOT NULL THEN greatest(lmin, rmin)
    WHEN lmin IS NOT NULL THEN lmin
    WHEN rmin IS NOT NULL THEN rmin
    ELSE pv END, 6) AS prominence
FROM prom
"""


# ---- shape-module peak stack (src/shape/mod.rs:224-390) ----


def q_peak_to_peak(sf_dir: str):
    """(max, mean, std-pop) of between-consecutive-peak amplitudes with the
    shape stack's global-side-minima prominence >= 0.01 and min_distance 1
    (kernels/shape.py peak_to_peak_amplitude; src/shape/mod.rs:354-369)."""
    from chronoxtract_ray.kernels.shape import peak_to_peak_amplitude

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < 3:
            return pa.table({"user_id": pa.array([], pa.int64()), "max_p2p": pa.array([], pa.float64()), "mean_p2p": pa.array([], pa.float64()), "std_p2p": pa.array([], pa.float64())})
        mx, mean, std = peak_to_peak_amplitude(val)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "max_p2p": pa.array(_round(np.array([mx])), pa.float64()),
                "mean_p2p": pa.array(_round(np.array([mean])), pa.float64()),
                "std_p2p": pa.array(_round(np.array([std])), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


# shared SQL fragment: the shape stack's peaks = strict local maxima with
# global-side-minima prominence (pv - max(min(before), min(after)))
_SHAPE_PEAKS = """
o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), sp AS (
  SELECT user_id, i AS pk, value AS pv, n,
    min(value) OVER (PARTITION BY user_id ORDER BY i
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lmin,
    min(value) OVER (PARTITION BY user_id ORDER BY i
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS rmin,
    lag(value)  OVER (PARTITION BY user_id ORDER BY i) AS pv_prev,
    lead(value) OVER (PARTITION BY user_id ORDER BY i) AS pv_next
  FROM o
), pk AS (
  SELECT user_id, pk, pv, n, pv - greatest(lmin, rmin) AS prom
  FROM sp
  WHERE pv_prev IS NOT NULL AND pv_next IS NOT NULL
    AND pv > pv_prev AND pv > pv_next
    AND pv - greatest(lmin, rmin) >= {prom}
)
"""


SQL_PEAK_TO_PEAK = (
    "WITH "
    + _SHAPE_PEAKS.format(prom="0.01")
    + """,
cons AS (
  SELECT user_id, pk AS a, lead(pk) OVER (PARTITION BY user_id ORDER BY pk) AS b, pv AS va,
    lead(pv) OVER (PARTITION BY user_id ORDER BY pk) AS vb
  FROM pk
), amp AS (
  SELECT c.user_id, c.a, c.b,
    greatest(c.va - min(o.value), c.vb - min(o.value)) AS amp
  FROM cons c JOIN o ON o.user_id = c.user_id AND o.i BETWEEN c.a AND c.b
  WHERE c.b IS NOT NULL
  GROUP BY c.user_id, c.a, c.b, c.va, c.vb
), agg AS (
  SELECT user_id, max(amp) AS mx, avg(amp) AS mean, count(*) AS na
  FROM amp GROUP BY 1
), agg2 AS (
  SELECT a.user_id, a.mx, a.mean,
    sqrt(sum((amp.amp - a.mean) * (amp.amp - a.mean)) / a.na) AS std
  FROM agg a JOIN amp ON amp.user_id = a.user_id
  GROUP BY a.user_id, a.mx, a.mean, a.na
), base AS (SELECT DISTINCT user_id FROM o WHERE n >= 3)
SELECT b.user_id,
  ROUND(coalesce(g.mx, 0.0), 6) AS max_p2p,
  ROUND(coalesce(g.mean, 0.0), 6) AS mean_p2p,
  ROUND(coalesce(g.std, 0.0), 6) AS std_p2p
FROM base b LEFT JOIN agg2 g ON g.user_id = b.user_id
"""
)


def q_peak_stats_sql(sf_dir: str):
    """enhanced_peak_stats (n, mean prominence, mean spacing, density) with
    min_prominence=1.0, min_distance=1 — the same values the rows-only
    ``peak_stats`` query reports via the dataset API, here with a SQL oracle
    (mean spacing of integer peak indices telescopes to
    (last-first)/(n-1))."""
    from chronoxtract_ray.kernels.shape import enhanced_peak_stats

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < 3:
            return pa.table({"user_id": pa.array([], pa.int64()), "n_peaks": pa.array([], pa.int64()), "mean_prominence": pa.array([], pa.float64()), "mean_spacing": pa.array([], pa.float64()), "peak_density": pa.array([], pa.float64())})
        n, mp, sp, _w, _a, dens = enhanced_peak_stats(val, 1.0, 1)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "n_peaks": pa.array([int(n)], pa.int64()),
                "mean_prominence": pa.array(_round(np.array([mp])), pa.float64()),
                "mean_spacing": pa.array(_round(np.array([sp])), pa.float64()),
                "peak_density": pa.array(_round(np.array([dens])), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_PEAK_STATS = (
    "WITH "
    + _SHAPE_PEAKS.format(prom="1.0")
    + """,
agg AS (
  SELECT user_id, count(*) AS np, avg(prom) AS mp,
    CASE WHEN count(*) > 1
         THEN (max(pk) - min(pk))::DOUBLE / (count(*) - 1) ELSE 0.0 END AS sp,
    count(*)::DOUBLE / any_value(n) AS dens
  FROM pk GROUP BY 1
), base AS (SELECT DISTINCT user_id, n FROM o WHERE n >= 3)
SELECT b.user_id, coalesce(g.np, 0) AS n_peaks,
  ROUND(coalesce(g.mp, 0.0), 6) AS mean_prominence,
  ROUND(coalesce(g.sp, 0.0), 6) AS mean_spacing,
  ROUND(coalesce(g.dens, 0.0), 6) AS peak_density
FROM base b LEFT JOIN agg g ON g.user_id = b.user_id
"""
)


# ---- variability / shape scalars ----


def q_variability_features(sf_dir: str):
    """(CV, quartile coeff of dispersion, MAD, IQR) with INDEX-based
    quartiles sorted[n/4], sorted[n/2], sorted[3n/4] (kernels/shape.py
    variability_features; src/shape/mod.rs:408-431)."""
    from chronoxtract_ray.kernels.shape import variability_features

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        cv, qcd, mad, iqr = variability_features(val)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "cv": pa.array(_round(np.array([cv])), pa.float64()),
                "qcd": pa.array(_round(np.array([qcd])), pa.float64()),
                "mad": pa.array(_round(np.array([mad])), pa.float64()),
                "iqr": pa.array(_round(np.array([iqr])), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_VARIABILITY_FEATURES = """
WITH o AS (
  SELECT user_id, value, count(*) OVER (PARTITION BY user_id) AS n,
    row_number() OVER (PARTITION BY user_id ORDER BY value) - 1 AS rk
  FROM events
), st AS (
  SELECT user_id, any_value(n) AS n, sum(value) / any_value(n) AS mean
  FROM o GROUP BY 1
), sd AS (
  SELECT o.user_id,
    sqrt(sum((o.value - st.mean) * (o.value - st.mean)) / st.n) AS std,
    any_value(st.mean) AS mean
  FROM o JOIN st ON st.user_id = o.user_id
  GROUP BY o.user_id, st.n
), q AS (
  SELECT user_id,
    max(CASE WHEN rk = n // 4 THEN value END) AS q1,
    max(CASE WHEN rk = n // 2 THEN value END) AS q2,
    max(CASE WHEN rk = (3 * n) // 4 THEN value END) AS q3
  FROM o GROUP BY 1
), dev AS (
  SELECT o.user_id, abs(o.value - q.q2) AS d, o.n,
    row_number() OVER (PARTITION BY o.user_id ORDER BY abs(o.value - q.q2)) - 1 AS rk
  FROM o JOIN q ON q.user_id = o.user_id
), mad AS (
  SELECT user_id, max(CASE WHEN rk = n // 2 THEN d END) AS mad FROM dev GROUP BY 1
)
SELECT sd.user_id,
  ROUND(CASE WHEN sd.mean != 0.0 THEN sd.std / abs(sd.mean) ELSE 0.0 END, 6) AS cv,
  ROUND(CASE WHEN q.q1 + q.q3 != 0.0 THEN (q.q3 - q.q1) / (q.q3 + q.q1) ELSE 0.0 END, 6) AS qcd,
  ROUND(mad.mad, 6) AS mad,
  ROUND(q.q3 - q.q1, 6) AS iqr
FROM sd JOIN q ON q.user_id = sd.user_id JOIN mad ON mad.user_id = sd.user_id
"""


def q_zero_crossing_rate(sf_dir: str):
    """Sign-change (>= 0 convention) rate per user series
    (kernels/shape.py zero_crossing_rate; src/shape/mod.rs:180-194)."""
    from chronoxtract_ray.kernels.shape import zero_crossing_rate

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < 2:
            return pa.table({"user_id": pa.array([], pa.int64()), "zcr": pa.array([], pa.float64())})
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "zcr": pa.array(_round(np.array([zero_crossing_rate(val)])), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ZERO_CROSSING_RATE = """
WITH o AS (
  SELECT user_id, (value >= 0) AS nn,
    lag(value >= 0) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pn
  FROM events
)
SELECT user_id,
  ROUND(count(*) FILTER (WHERE pn IS NOT NULL AND nn != pn)::DOUBLE
        / (count(*) - 1), 6) AS zcr
FROM o GROUP BY 1 HAVING count(*) >= 2
"""


def q_energy_distribution(sf_dir: str):
    """Energy entropy [nats] + top-ceil(10%) energy concentration per user
    (kernels/shape.py energy_distribution; src/shape/mod.rs:461-498)."""
    from chronoxtract_ray.kernels.shape import energy_distribution

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        ent, _mean_e, conc = energy_distribution(val)
        # mean energy (= sum(e)/n) is deliberately NOT emitted here: the
        # synthetic values carry fixed decimal precision, so total/n can land
        # EXACTLY on a decimal rounding boundary where cross-engine 1-ulp
        # summation noise flips the rounded digit at any depth. The sum/count
        # surface is already hash-verified by window_moments (vsum/energy);
        # this query checks the two novel outputs. (Kernel parity for the
        # mean-energy component stays covered by the golden kernel tests.)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "energy_entropy": pa.array(_round(np.array([ent])), pa.float64()),
                "energy_concentration": pa.array(_round(np.array([conc])), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ENERGY_DISTRIBUTION = """
WITH o AS (
  SELECT user_id, value * value AS e,
    row_number() OVER (PARTITION BY user_id ORDER BY value * value DESC) AS rk_desc,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), t AS (
  SELECT user_id, sum(e) AS total, any_value(n) AS n FROM o GROUP BY 1
)
SELECT o.user_id,
  ROUND(CASE WHEN t.total = 0 THEN 0.0 ELSE
    -sum((o.e / t.total) * ln(CASE WHEN o.e > 0 THEN o.e / t.total ELSE 1 END))
      FILTER (WHERE o.e > 0) END, 6) AS energy_entropy,
  ROUND(CASE WHEN t.total = 0 THEN 0.0 ELSE
    sum(o.e) FILTER (WHERE o.rk_desc <= ceil(t.n * 0.1)) / t.total END, 6) AS energy_concentration
FROM o JOIN t ON t.user_id = o.user_id
GROUP BY o.user_id, t.total, t.n
"""


def q_higher_moments(sf_dir: str):
    """STANDARDIZED central moments m5/σ⁵ … m8/σ⁸ per user
    (kernels/moments.py central_moment; src/higherorder/mod.rs:63-71,
    192-203). Standardization keeps outputs O(1)-O(100): raw k-th moments
    span ~10 decades across users, so fixed 6-decimal rounding would sit
    inside their float noise; the σ-normalized form is the hash-stable
    surface (raw moments stay covered by golden kernel tests). Guarded to
    variance > 1e-12 on both sides."""
    from chronoxtract_ray.kernels.moments import central_moment

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        var = central_moment(val, 2)
        if var <= 1e-12:
            return pa.table({"user_id": pa.array([], pa.int64()), "std_m5": pa.array([], pa.float64()), "std_m6": pa.array([], pa.float64()), "std_m7": pa.array([], pa.float64()), "std_m8": pa.array([], pa.float64())})
        cols = {"user_id": pa.array([np.int64(uid)], pa.int64())}
        for k in (5, 6, 7, 8):
            cols[f"std_m{k}"] = pa.array(_round(np.array([central_moment(val, k) / var ** (k / 2.0)])), pa.float64())
        return pa.table(cols)

    return _grouped(sf_dir, fn)


SQL_HIGHER_MOMENTS = """
WITH st AS (
  SELECT user_id, count(*) AS n, sum(value) / count(*) AS mean
  FROM events GROUP BY 1
), d AS (
  SELECT e.user_id, st.n, e.value - st.mean AS d
  FROM events e JOIN st ON st.user_id = e.user_id
), m AS (
  SELECT user_id,
    sum(d * d) / any_value(n) AS m2,
    sum(d * d * d * d * d) / any_value(n) AS m5,
    sum(d * d * d * d * d * d) / any_value(n) AS m6,
    sum(d * d * d * d * d * d * d) / any_value(n) AS m7,
    sum(d * d * d * d * d * d * d * d) / any_value(n) AS m8
  FROM d GROUP BY 1
)
SELECT user_id,
  ROUND(m5 / pow(m2, 2.5), 6) AS std_m5,
  ROUND(m6 / pow(m2, 3.0), 6) AS std_m6,
  ROUND(m7 / pow(m2, 3.5), 6) AS std_m7,
  ROUND(m8 / pow(m2, 4.0), 6) AS std_m8
FROM m WHERE m2 > 1e-12
"""


# ---- rolling scans ----


def q_rolling_variance(sf_dir: str):
    """Rolling population variance window=5, two-pass per window exactly
    like the kernel (kernels/rolling.py rolling_variance;
    src/rollingstats/mod.rs:23-35); keyed by the window-END event_id."""
    from chronoxtract_ray.kernels.rolling import rolling_variance

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, turn = _sorted_series(group)
        w = 5
        if val.size < w:
            return pa.table({"user_id": pa.array([], pa.int64()), "event_id": pa.array([], pa.int64()), "rvar": pa.array([], pa.float64())})
        rv = rolling_variance(val, w)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), rv.size), pa.int64()),
                "event_id": pa.array(turn[w - 1 :], pa.int64()),
                "rvar": pa.array(_round(rv), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ROLLING_VARIANCE = """
WITH o AS (
  SELECT user_id, event_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), m AS (
  SELECT user_id, event_id, rn,
    avg(value) OVER (PARTITION BY user_id ORDER BY rn
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mu
  FROM o
)
SELECT m.user_id, m.event_id,
  ROUND(avg((o.value - m.mu) * (o.value - m.mu)), 6) AS rvar
FROM m JOIN o ON o.user_id = m.user_id AND o.rn BETWEEN m.rn - 4 AND m.rn
WHERE m.rn >= 5
GROUP BY m.user_id, m.event_id
"""


def q_sliding_window_entropy(sf_dir: str):
    """Per-window (w=8) min-max histogram Shannon entropy in bits, 4 bins
    (kernels/rolling.py sliding_window_entropy;
    src/rollingstats/mod.rs:68-104); binning arithmetic is association-
    identical on both sides so bin boundaries are bit-exact."""
    from chronoxtract_ray.kernels.rolling import sliding_window_entropy

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, turn = _sorted_series(group)
        w, bins = 8, 4
        if val.size < w:
            return pa.table({"user_id": pa.array([], pa.int64()), "event_id": pa.array([], pa.int64()), "entropy": pa.array([], pa.float64())})
        ent = sliding_window_entropy(val, w, bins)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), ent.size), pa.int64()),
                "event_id": pa.array(turn[w - 1 :], pa.int64()),
                "entropy": pa.array(_round(ent), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_SLIDING_WINDOW_ENTROPY = """
WITH o AS (
  SELECT user_id, event_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), w AS (
  SELECT m.user_id, m.rn AS rn_end, m.event_id,
    min(o.value) AS mn, max(o.value) AS mx
  FROM o m JOIN o ON o.user_id = m.user_id AND o.rn BETWEEN m.rn - 7 AND m.rn
  WHERE m.rn >= 8
  GROUP BY m.user_id, m.rn, m.event_id
), b AS (
  SELECT w.user_id, w.rn_end, w.event_id, (w.mx - w.mn = 0.0) AS zero_range,
    CASE WHEN w.mx - w.mn = 0.0 THEN 0
         ELSE greatest(least(floor((o.value - w.mn) / (w.mx - w.mn) * 4)::BIGINT, 3), 0)
    END AS bin
  FROM w JOIN o ON o.user_id = w.user_id AND o.rn BETWEEN w.rn_end - 7 AND w.rn_end
), c AS (
  SELECT user_id, rn_end, event_id, any_value(zero_range) AS zero_range, bin, count(*) AS cnt
  FROM b GROUP BY user_id, rn_end, event_id, bin
)
SELECT user_id, event_id,
  ROUND(CASE WHEN any_value(zero_range) THEN 0.0
        ELSE -sum((cnt / 8.0) * log2(cnt / 8.0)) END, 6) AS entropy
FROM c GROUP BY user_id, rn_end, event_id
"""


# ---- matrix transforms (src/matrices/mod.rs) ----

_CORNER = 12  # emitted sub-matrix size for GASF / MTF element checks


def q_tde(sf_dir: str):
    """Time-delay (Hankel) embedding L=4 flattened to (row, col, value)
    element assertions (kernels/matrices.py time_delay_embedding;
    src/matrices/mod.rs:52-97: H[i,j] = x[i+j])."""
    from chronoxtract_ray.kernels.matrices import time_delay_embedding

    L = 4

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < L:
            return pa.table({"user_id": pa.array([], pa.int64()), "row_idx": pa.array([], pa.int64()), "col_idx": pa.array([], pa.int64()), "v": pa.array([], pa.float64())})
        H = time_delay_embedding(val, L)
        r, c = np.divmod(np.arange(H.size), L)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), H.size), pa.int64()),
                "row_idx": pa.array(r, pa.int64()),
                "col_idx": pa.array(c, pa.int64()),
                "v": pa.array(_round(H.ravel()), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_TDE = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), j AS (SELECT unnest([0, 1, 2, 3]) AS jj)
SELECT a.user_id, a.i AS row_idx, j.jj AS col_idx, ROUND(b.value, 6) AS v
FROM o a CROSS JOIN j
JOIN o b ON b.user_id = a.user_id AND b.i = a.i + j.jj
WHERE a.i + 3 <= a.n - 1
"""


# shared SQL fragment: per-user min/max + the degenerate-range guard +
# min-max scaling exactly as kernels/matrices.py computes it
_SCALED = """
o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    min(value) OVER (PARTITION BY user_id) AS mn,
    max(value) OVER (PARTITION BY user_id) AS mx
  FROM events
), g AS (
  SELECT *, (abs(mx - mn) <= 1e-12 * greatest(abs(mn), abs(mx), 1.0)) AS deg
  FROM o
)
"""


def q_gasf(sf_dir: str):
    """GASF elements for the top-left 12x12 corner (scaling uses the FULL
    series min/max; kernels/matrices.py gramian_angular_summation_field;
    src/matrices/mod.rs:122-171). Bit-exact: both sides compute
    norm = clip(2(x-mn)/(mx-mn) - 1), s = sqrt(max(1-norm²,0)),
    G[i,j] = norm_i·norm_j − s_i·s_j with identical association."""
    from chronoxtract_ray.kernels.matrices import gramian_angular_summation_field

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        G = gramian_angular_summation_field(val)[: _CORNER, : _CORNER]
        r, c = np.divmod(np.arange(G.size), G.shape[1])
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), G.size), pa.int64()),
                "row_idx": pa.array(r, pa.int64()),
                "col_idx": pa.array(c, pa.int64()),
                "v": pa.array(_round(G.ravel()), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_GASF = (
    "WITH "
    + _SCALED
    + f""", nrm AS (
  SELECT user_id, i,
    CASE WHEN deg THEN 0.0
         ELSE least(greatest(2.0 * (value - mn) / (mx - mn) - 1.0, -1.0), 1.0)
    END AS nv
  FROM g
), ns AS (
  SELECT user_id, i, nv, sqrt(greatest(1.0 - nv * nv, 0.0)) AS s FROM nrm
)
SELECT a.user_id, a.i AS row_idx, b.i AS col_idx,
  ROUND(a.nv * b.nv - a.s * b.s, 6) AS v
FROM ns a JOIN ns b ON b.user_id = a.user_id
WHERE a.i < {_CORNER} AND b.i < {_CORNER}
"""
)


def q_mtf(sf_dir: str):
    """MTF elements for the top-left 12x12 corner, 4 min-max bins
    (kernels/matrices.py markov_transition_field;
    src/matrices/mod.rs:197-269). Bit-exact: bin assignment and the
    count/rowsum division use identical operands on both sides."""
    from chronoxtract_ray.kernels.matrices import markov_transition_field

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        M = markov_transition_field(val, 4)[: _CORNER, : _CORNER]
        r, c = np.divmod(np.arange(M.size), M.shape[1])
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), M.size), pa.int64()),
                "row_idx": pa.array(r, pa.int64()),
                "col_idx": pa.array(c, pa.int64()),
                "v": pa.array(_round(M.ravel()), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_MTF = (
    "WITH "
    + _SCALED
    + f""", bn AS (
  SELECT user_id, i,
    CASE WHEN deg THEN 0
         ELSE least(floor(least(greatest((value - mn) / (mx - mn), 0.0), 1.0) * 4)::BIGINT, 3)
    END AS bin
  FROM g
), tr AS (
  SELECT a.user_id, a.bin AS ba, b.bin AS bb, count(*) AS cnt
  FROM bn a JOIN bn b ON b.user_id = a.user_id AND b.i = a.i + 1
  GROUP BY 1, 2, 3
), rs AS (
  SELECT user_id, ba, sum(cnt) AS total FROM tr GROUP BY 1, 2
), W AS (
  SELECT tr.user_id, tr.ba, tr.bb, tr.cnt::DOUBLE / rs.total AS w
  FROM tr JOIN rs ON rs.user_id = tr.user_id AND rs.ba = tr.ba
)
SELECT a.user_id, a.i AS row_idx, b.i AS col_idx,
  ROUND(coalesce(W.w, 0.0), 6) AS v
FROM bn a JOIN bn b ON b.user_id = a.user_id
LEFT JOIN W ON W.user_id = a.user_id AND W.ba = a.bin AND W.bb = b.bin
WHERE a.i < {_CORNER} AND b.i < {_CORNER}
"""
)


# ---- binned autocorrelation (Edelson-Krolik DCF with self) ----

_ACF_EDGES = [-24.0, -16.0, -8.0, 0.0, 8.0, 16.0, 24.0]  # hours, dyadic-exact


def q_acf_binned(sf_dir: str):
    """Edelson-Krolik ACF (DCF of a series with itself) over dyadic lag bins
    in hours (kernels/correlation.py acf; src/correlation/{dcf,acf}.rs).
    The kernel's float-accumulated bin edges equal these literals exactly
    (all dyadic), so bin membership matches the SQL interval join."""
    from chronoxtract_ray.kernels.correlation import acf

    def fn(group: pa.Table) -> pa.Table:
        uid, ts, val, _ = _sorted_series(group)
        if val.size < 2:
            return pa.table({"user_id": pa.array([], pa.int64()), "lag": pa.array([], pa.float64()), "corr": pa.array([], pa.float64())})
        t_hours = ts / 3.6e9
        out = acf(t_hours, val, np.ones_like(val), _ACF_EDGES[0], _ACF_EDGES[-1], 8.0)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), out["lags"].size), pa.int64()),
                "lag": pa.array(out["lags"], pa.float64()),
                "corr": pa.array(_round(out["correlations"]), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ACF_BINNED = """
WITH o AS (
  SELECT user_id, epoch_us(ts) / 3600000000.0 AS t, value FROM events
), st AS (
  SELECT user_id, count(*) AS n, sum(value) / count(*) AS mean
  FROM o GROUP BY 1 HAVING count(*) >= 2
), sd AS (
  SELECT o.user_id, any_value(st.mean) AS mean,
    sqrt(sum((o.value - st.mean) * (o.value - st.mean)) / (st.n - 1)) AS std
  FROM o JOIN st ON st.user_id = o.user_id
  GROUP BY o.user_id, st.n
), bins AS (
  SELECT * FROM (VALUES (-24.0, -16.0), (-16.0, -8.0), (-8.0, 0.0),
                        (0.0, 8.0), (8.0, 16.0), (16.0, 24.0)) b(lo, hi)
), pairs AS (
  SELECT a.user_id, bins.lo, bins.hi,
    ((a.value - sd.mean) * (b.value - sd.mean)) / (sd.std * sd.std) AS udcf
  FROM o a
  JOIN o b ON b.user_id = a.user_id
  JOIN sd ON sd.user_id = a.user_id
  JOIN bins ON (b.t - a.t) >= bins.lo AND (b.t - a.t) < bins.hi
)
SELECT user_id, (lo + hi) / 2.0 AS lag, ROUND(avg(udcf), 6) AS corr
FROM pairs GROUP BY user_id, lo, hi
"""


# ---- variability timescale (tau distribution, SQL-checked in hours) ----


def q_variability_tau(sf_dir: str):
    """Tau-distribution statistics over significant adjacent flux pairs in
    HOURS (kernels/variability.py _tau_values / variability_statistics;
    src/misc/var.rs:7-150): tau = dt / |ln(f2/f1)| for pairs with dt > 0,
    positive fluxes and |f2-f1| >= sqrt(2) (unit errors). Median is the
    reference's index-based definition. The µs-unit api surface stays
    covered by the rows-only variability_timescale query; hours keep every
    output O(1)-O(100) so 6-dp rounding dominates the float noise."""
    from chronoxtract_ray.kernels.variability import variability_statistics

    def fn(group: pa.Table) -> pa.Table:
        uid, ts, val, _ = _sorted_series(group)
        if val.size < 2:
            return _EMPTY_TAU
        stats = variability_statistics(ts / 3.6e9, np.abs(val), np.ones_like(val))
        if stats["count"] == 0:
            return _EMPTY_TAU
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "tau_min": pa.array(_round(np.array([stats["min"]])), pa.float64()),
                "tau_max": pa.array(_round(np.array([stats["max"]])), pa.float64()),
                "tau_mean": pa.array(_round(np.array([stats["mean"]])), pa.float64()),
                "tau_median": pa.array(_round(np.array([stats["median"]])), pa.float64()),
                "tau_std": pa.array(_round(np.array([stats["std_dev"]])), pa.float64()),
                "tau_count": pa.array([int(stats["count"])], pa.int64()),
            }
        )

    return _grouped(sf_dir, fn)


_EMPTY_TAU = pa.table(
    {
        "user_id": pa.array([], pa.int64()),
        "tau_min": pa.array([], pa.float64()),
        "tau_max": pa.array([], pa.float64()),
        "tau_mean": pa.array([], pa.float64()),
        "tau_median": pa.array([], pa.float64()),
        "tau_std": pa.array([], pa.float64()),
        "tau_count": pa.array([], pa.int64()),
    }
)


SQL_VARIABILITY_TAU = """
WITH o AS (
  SELECT user_id, epoch_us(ts) / 3600000000.0 AS t, abs(value) AS f,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), pr AS (
  SELECT user_id, t, f,
    lag(t) OVER (PARTITION BY user_id ORDER BY rn) AS pt,
    lag(f) OVER (PARTITION BY user_id ORDER BY rn) AS pf
  FROM o
), tau AS (
  SELECT user_id, (t - pt) / abs(ln(f / pf)) AS tau
  FROM pr
  WHERE pt IS NOT NULL AND t - pt > 0 AND pf > 0 AND f > 0
    AND ln(f / pf) != 0 AND abs(f - pf) >= sqrt(2.0)
), rk AS (
  SELECT user_id, tau, count(*) OVER (PARTITION BY user_id) AS cnt,
    row_number() OVER (PARTITION BY user_id ORDER BY tau) - 1 AS rk
  FROM tau
), med AS (
  SELECT user_id,
    CASE WHEN max(cnt) % 2 = 0
         THEN (max(CASE WHEN rk = cnt // 2 - 1 THEN tau END)
             + max(CASE WHEN rk = cnt // 2 THEN tau END)) / 2.0
         ELSE max(CASE WHEN rk = cnt // 2 THEN tau END) END AS median
  FROM rk GROUP BY user_id
), st AS (
  SELECT user_id, min(tau) AS mn, max(tau) AS mx, count(*) AS cnt,
    sum(tau) / count(*) AS mean
  FROM tau GROUP BY 1
), sd AS (
  SELECT tau.user_id,
    sqrt(sum((tau.tau - st.mean) * (tau.tau - st.mean)) / st.cnt) AS std
  FROM tau JOIN st ON st.user_id = tau.user_id
  GROUP BY tau.user_id, st.cnt
)
SELECT st.user_id, ROUND(st.mn, 6) AS tau_min, ROUND(st.mx, 6) AS tau_max,
  ROUND(st.mean, 6) AS tau_mean, ROUND(med.median, 6) AS tau_median,
  ROUND(sd.std, 6) AS tau_std, st.cnt AS tau_count
FROM st JOIN med ON med.user_id = st.user_id JOIN sd ON sd.user_id = st.user_id
"""


# ---- STL seasonal/trend strengths (oracle for the api-path query) ----

# Oracle for queries_events.q_stl_strengths (api seasonal_trend_strength,
# period=12): trend = clipped centered MA (window 18 → the SQL frame's edge
# clipping IS the kernel's index clipping), seasonal = per-phase mean of the
# detrended series, strengths = 1 - popvar(rem)/popvar(component+rem)
# clamped to [0, ..]; every composite (rem, seasonal+rem, trend+rem) is
# built with the kernel's exact operand order and popvar is the kernel's
# two-pass form (kernels/seasonality.py:21-25, 41-72).
SQL_STL_STRENGTHS = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), tr AS (
  SELECT user_id, i, n, value,
    avg(value) OVER (PARTITION BY user_id ORDER BY i
                     ROWS BETWEEN 9 PRECEDING AND 9 FOLLOWING) AS trend
  FROM o
), det AS (
  SELECT user_id, i, value, trend, value - trend AS detr, i % 12 AS phase
  FROM tr WHERE n >= 24
), pat AS (
  SELECT user_id, phase, sum(detr) / count(*) AS pattern FROM det GROUP BY 1, 2
), comp AS (
  SELECT d.user_id, d.detr - p.pattern AS rem,
    p.pattern + (d.detr - p.pattern) AS sr,
    d.trend + (d.detr - p.pattern) AS trp
  FROM det d JOIN pat p ON p.user_id = d.user_id AND p.phase = d.phase
), mn AS (
  SELECT user_id, count(*) AS cnt, sum(rem) / count(*) AS m_r,
    sum(sr) / count(*) AS m_sr, sum(trp) / count(*) AS m_tr
  FROM comp GROUP BY 1
), v AS (
  SELECT c.user_id,
    sum((c.rem - mn.m_r) * (c.rem - mn.m_r)) / mn.cnt AS var_r,
    sum((c.sr - mn.m_sr) * (c.sr - mn.m_sr)) / mn.cnt AS var_sr,
    sum((c.trp - mn.m_tr) * (c.trp - mn.m_tr)) / mn.cnt AS var_tr
  FROM comp c JOIN mn ON mn.user_id = c.user_id
  GROUP BY c.user_id, mn.cnt
)
SELECT user_id,
  ROUND(greatest(CASE WHEN var_sr > 0 THEN 1.0 - greatest(var_r / var_sr, 0.0)
                 ELSE 0.0 END, 0.0), 6) AS seasonal_strength,
  ROUND(greatest(CASE WHEN var_tr > 0 THEN 1.0 - greatest(var_r / var_tr, 0.0)
                 ELSE 0.0 END, 0.0), 6) AS trend_strength
FROM v
"""


# Oracle for queries_events.q_dfa (api detrended_fluctuation_analysis,
# min_window=4, max_window=32, num_windows=6): the kernel's log-spaced
# int(round(exp(...))) window sizes constant-fold to [4, 6, 9, 14, 21, 32];
# integrated profile = running sum of (x - mean); per (w, segment) OLS
# detrend via the kernel's closed-form index sums; F(w) = sqrt(mean of
# per-segment residual-SS/w); alpha = OLS slope of ln F over ln w
# (kernels/seasonality.py:267-332).
SQL_DFA = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), st AS (
  SELECT user_id, any_value(n) AS n, sum(value) / any_value(n) AS mean
  FROM o GROUP BY 1 HAVING any_value(n) >= 32
), ig AS (
  SELECT o.user_id, o.i, st.n,
    sum(o.value - st.mean) OVER (PARTITION BY o.user_id ORDER BY o.i
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS y
  FROM o JOIN st ON st.user_id = o.user_id
), ws AS (SELECT unnest([4, 6, 9, 14, 21, 32]) AS w
), seg AS (
  SELECT ig.user_id, ws.w, ig.i // ws.w AS s, ig.i % ws.w AS j, ig.y
  FROM ig JOIN ws ON ig.i < (ig.n // ws.w) * ws.w
), ols AS (
  SELECT user_id, w, s, sum(y) AS sy, sum(j * y) AS sjy
  FROM seg GROUP BY 1, 2, 3
), fit AS (
  SELECT user_id, w, s,
    (w * sjy - (w * (w - 1) / 2.0) * sy)
      / (w * (w * (w - 1) * (2 * w - 1) / 6.0)
         - (w * (w - 1) / 2.0) * (w * (w - 1) / 2.0)) AS slope,
    sy
  FROM ols
), fit2 AS (
  SELECT user_id, w, s, slope,
    (sy - slope * (w * (w - 1) / 2.0)) / w AS icept
  FROM fit
), rss AS (
  SELECT g.user_id, g.w, g.s,
    sum((g.y - (f.slope * g.j + f.icept)) * (g.y - (f.slope * g.j + f.icept))) AS ss
  FROM seg g JOIN fit2 f ON f.user_id = g.user_id AND f.w = g.w AND f.s = g.s
  GROUP BY g.user_id, g.w, g.s
), fw AS (
  SELECT user_id, w, sqrt(sum(ss / w) / count(*)) AS fl FROM rss GROUP BY 1, 2
), ll AS (
  SELECT user_id, ln(w::DOUBLE) AS lx, ln(fl) AS ly FROM fw
), fin AS (
  SELECT user_id, count(*) AS m, sum(lx) AS sx, sum(ly) AS sy,
    sum(lx * lx) AS sxx, sum(lx * ly) AS sxy
  FROM ll GROUP BY 1
)
SELECT user_id,
  ROUND((m * sxy - sx * sy) / (m * sxx - sx * sx), 6) AS dfa_alpha
FROM fin
"""


# Oracle for queries_events.q_lzc (api lempel_ziv_complexity): binarize by
# the reference's 'median' (sorted[n/2], the upper middle element), then the
# LZ76 parse as a recursive CTE — one iteration per phrase, the shortest
# prefix of the remainder absent from the already-seen prefix found via a
# correlated min-over-j substring search (absence is monotone in j, so the
# minimum is exactly where the kernel's scan breaks;
# kernels/entropy.py:112-134).
SQL_LZC = """
WITH RECURSIVE o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn,
    row_number() OVER (PARTITION BY user_id ORDER BY value) AS vr,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), thr AS (
  SELECT user_id, max(CASE WHEN vr = n // 2 + 1 THEN value END) AS t FROM o GROUP BY 1
), sq AS (
  SELECT o.user_id,
    string_agg(CASE WHEN o.value >= thr.t THEN '1' ELSE '0' END, '' ORDER BY o.rn) AS seq,
    any_value(o.n) AS n
  FROM o JOIN thr ON thr.user_id = o.user_id GROUP BY o.user_id
), js AS (SELECT unnest(range(1, 20000)) AS j
), r AS (
  SELECT user_id, 1 AS i, 0 AS c, seq, n FROM sq
  UNION ALL
  SELECT user_id, i + j AS i, c + 1 AS c, seq, n FROM (
    SELECT user_id, i, c, seq, n,
      coalesce((SELECT min(js.j) FROM js WHERE js.j <= rr.n - rr.i + 1
                AND position(substr(rr.seq, rr.i, js.j) IN substr(rr.seq, 1, rr.i - 1)) = 0),
               rr.n - rr.i + 1) AS j
    FROM r rr WHERE i <= n
  )
)
SELECT user_id, ROUND(max(c)::DOUBLE, 6) AS lzc FROM r GROUP BY 1
"""


# ---- rows-only: multiscale entropy + distributed DCF pairs ----


def q_multiscale_entropy(sf_dir: str):
    """Multiscale sample entropy, scales 1..3 (kernels/entropy.py
    multiscale_entropy; src/entropy/mod.rs:305-339). SQL-checked: the
    coarse-grain is a GROUP BY i//scale mean and SampEn (fixed r=0.2, no
    std-derived tolerance) is the same self-join construction as
    SQL_ENTROPY_FEATURES, so the O(n^2) template matching is exact at
    oracle scale; +inf (no template matches) reproduces on both sides."""
    from chronoxtract_ray.kernels.entropy import multiscale_entropy

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < 12:
            return pa.table({"user_id": pa.array([], pa.int64()), "mse1": pa.array([], pa.float64()), "mse2": pa.array([], pa.float64()), "mse3": pa.array([], pa.float64())})
        mse = np.asarray(multiscale_entropy(val, 2, 0.2, 3), dtype=np.float64)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "mse1": pa.array(_round(mse[:1]), pa.float64()),
                "mse2": pa.array(_round(mse[1:2]), pa.float64()),
                "mse3": pa.array(_round(mse[2:3]), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


# Coarse-grain (mean of i//s groups, complete groups only) + the SampEn
# self-join of SQL_ENTROPY_FEATURES with FIXED tolerance r=0.2 and the
# engine's exact normalization phi_m = b/(len-2), phi_{m+1} = a/(len-3).
SQL_MULTISCALE_ENTROPY = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), base AS (
  SELECT user_id FROM o GROUP BY 1 HAVING count(*) >= 12
), scales AS (SELECT unnest([1, 2, 3]) AS s
), cg AS (
  SELECT o.user_id, scales.s, o.i // scales.s AS j, sum(o.value) / scales.s AS v
  FROM o JOIN base USING (user_id) CROSS JOIN scales
  WHERE o.i < (o.n // scales.s) * scales.s
  GROUP BY o.user_id, scales.s, o.i // scales.s
), w AS (
  SELECT user_id, s, j, v,
    lead(v, 1) OVER (PARTITION BY user_id, s ORDER BY j) AS v1,
    lead(v, 2) OVER (PARTITION BY user_id, s ORDER BY j) AS v2,
    count(*) OVER (PARTITION BY user_id, s) AS m
  FROM cg
), bc AS (
  SELECT p.user_id, p.s, any_value(p.m) AS m,
    count(*) FILTER (greatest(abs(p.v-q.v), abs(p.v1-q.v1)) <= 0.2) AS b,
    count(*) FILTER (p.v2 IS NOT NULL AND q.v2 IS NOT NULL
      AND greatest(abs(p.v-q.v), abs(p.v1-q.v1), abs(p.v2-q.v2)) <= 0.2) AS a
  FROM w p JOIN w q ON p.user_id = q.user_id AND p.s = q.s AND p.j < q.j
  WHERE p.v1 IS NOT NULL AND q.v1 IS NOT NULL
  GROUP BY 1, 2
), se AS (
  SELECT user_id, s,
    ROUND(CASE WHEN b = 0 OR a = 0 THEN 'infinity'::DOUBLE
          ELSE -ln((a / (m - 3.0)) / (b / (m - 2.0))) END, 6) AS v
  FROM bc
)
SELECT user_id,
  max(CASE WHEN s = 1 THEN v END) AS mse1,
  max(CASE WHEN s = 2 THEN v END) AS mse2,
  max(CASE WHEN s = 3 THEN v END) AS mse3
FROM se GROUP BY 1
"""


def q_carma_forecast(sf_dir: str):
    """Kalman FORECAST 3 steps (of 1h) past each user's last observation
    under a fixed CAR(1) model (kernels/carma.py carma_predict — exceeds the
    reference, whose own predict returns zeros: src/carma/predict.rs:38).
    SQL-checked: for CAR(1) the filter is the same scalar recursion as
    SQL_CARMA_LOGLIK; the three propagate-only horizons chain as LATERAL
    steps (mean = e^{lam dt} x, var = (e^{lam dt} P) e^{lam dt} + Q(dt),
    no measurement update), mirroring carma_predict's sequential merge."""
    from chronoxtract_ray.kernels.carma import CarmaParams, carma_predict

    params = CarmaParams(1, 0, ar_coeffs=[0.1], sigma=1.0)

    def fn(group: pa.Table) -> pa.Table:
        uid, ts, val, _ = _sorted_series(group)
        if val.size < 3:
            return pa.table({"user_id": pa.array([], pa.int64()), "step": pa.array([], pa.int64()), "pred_mean": pa.array([], pa.float64()), "pred_var": pa.array([], pa.float64())})
        t_hours = ts / 3.6e9
        t_hours = t_hours + np.arange(t_hours.size) * 1e-9  # break exact ties
        horizons = t_hours[-1] + np.arange(1, 4, dtype=np.float64)
        res = carma_predict(t_hours, val, np.ones_like(val), params, horizons)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), 3), pa.int64()),
                "step": pa.array(np.arange(1, 4), pa.int64()),
                "pred_mean": pa.array(_round(res["pred_means"]), pa.float64()),
                "pred_var": pa.array(_round(res["pred_variances"]), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


# CAR(1) forecast oracle: the carma_loglik recursive filter (lam=-0.1,
# sigma=1 -> qb=5, P0=25, unit errors, 1e-9-tiebroken hour timestamps) plus
# three chained propagate-only LATERAL steps for horizons t_n+1..3.
SQL_CARMA_FORECAST = """
WITH RECURSIVE o AS (
  SELECT user_id, value,
    CAST(epoch_us(ts) AS DOUBLE) / 3600000000.0
      + CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS DOUBLE) * 0.000000001 AS t,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), base AS (SELECT user_id FROM o GROUP BY 1 HAVING count(*) >= 3
), c AS (SELECT -0.1 AS lam, (1.0 * 1.0) / (2.0 * abs(-0.1)) AS qb
), rec AS (
  SELECT o.user_id, o.i, o.t, o.n,
    ((-c.qb) / (c.lam + c.lam)) / (((-c.qb) / (c.lam + c.lam)) + 1.0) * o.value AS x,
    (1.0 - ((-c.qb) / (c.lam + c.lam)) / (((-c.qb) / (c.lam + c.lam)) + 1.0)) * ((-c.qb) / (c.lam + c.lam)) AS p
  FROM o CROSS JOIN c JOIN base ON base.user_id = o.user_id
  WHERE o.i = 0
  UNION ALL
  SELECT o.user_id, o.i, o.t, o.n,
    st.xp + (st.pp / (st.pp + 1.0)) * (o.value - st.xp) AS x,
    (1.0 - st.pp / (st.pp + 1.0)) * st.pp AS p
  FROM rec r
  JOIN o ON o.user_id = r.user_id AND o.i = r.i + 1
  CROSS JOIN c,
  LATERAL (
    SELECT exp(c.lam * (o.t - r.t)) * r.x AS xp,
      (exp(c.lam * (o.t - r.t)) * r.p) * exp(c.lam * (o.t - r.t))
        + c.qb * ((exp((c.lam + c.lam) * (o.t - r.t)) - 1.0) / (c.lam + c.lam)) AS pp
  ) st
), fin AS (
  SELECT user_id, t, x, p FROM rec WHERE i = n - 1
), f AS (
  SELECT fin.user_id,
    s1.x1, s1.p1, s2.x2, s2.p2, s3.x3, s3.p3
  FROM fin CROSS JOIN c,
  LATERAL (
    SELECT exp(c.lam * ((fin.t + 1.0) - fin.t)) * fin.x AS x1,
      (exp(c.lam * ((fin.t + 1.0) - fin.t)) * fin.p) * exp(c.lam * ((fin.t + 1.0) - fin.t))
        + c.qb * ((exp((c.lam + c.lam) * ((fin.t + 1.0) - fin.t)) - 1.0) / (c.lam + c.lam)) AS p1
  ) s1,
  LATERAL (
    SELECT exp(c.lam * ((fin.t + 2.0) - (fin.t + 1.0))) * s1.x1 AS x2,
      (exp(c.lam * ((fin.t + 2.0) - (fin.t + 1.0))) * s1.p1) * exp(c.lam * ((fin.t + 2.0) - (fin.t + 1.0)))
        + c.qb * ((exp((c.lam + c.lam) * ((fin.t + 2.0) - (fin.t + 1.0))) - 1.0) / (c.lam + c.lam)) AS p2
  ) s2,
  LATERAL (
    SELECT exp(c.lam * ((fin.t + 3.0) - (fin.t + 2.0))) * s2.x2 AS x3,
      (exp(c.lam * ((fin.t + 3.0) - (fin.t + 2.0))) * s2.p2) * exp(c.lam * ((fin.t + 3.0) - (fin.t + 2.0)))
        + c.qb * ((exp((c.lam + c.lam) * ((fin.t + 3.0) - (fin.t + 2.0))) - 1.0) / (c.lam + c.lam)) AS p3
  ) s3
)
SELECT user_id, CAST(u.step AS BIGINT) AS step,
  ROUND(CASE u.step WHEN 1 THEN x1 WHEN 2 THEN x2 ELSE x3 END, 6) AS pred_mean,
  ROUND(CASE u.step WHEN 1 THEN p1 WHEN 2 THEN p2 ELSE p3 END, 6) AS pred_var
FROM f CROSS JOIN (SELECT unnest([1, 2, 3]) AS step) u
"""


def q_dcf_pairs(sf_dir: str):
    """Distributed cross-series DCF (api.dcf_pairs): correlate user 2k with
    user 2k+1 over dyadic hour lag bins. SQL-checked: the Edelson-Krolik
    UDCF (kernels/correlation.py:17, src/correlation/dcf.rs:25-75) is a
    cross join of the two series binned by pairwise lag; sample means/stds
    and dyadic-exact bin edges reproduce pair-for-pair, so the oracle
    verifies the distributed pair-join path end to end."""
    import chronoxtract_ray.api as api

    from chronoxtract_ray.pipelines.queries_events import _events_series

    def to_hours(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "conv_id": t["conv_id"],
                "ts_us": pa.array(t["ts_us"].to_numpy() / 3.6e9, pa.float64()),
                "turn_idx": t["turn_idx"],
                "value": t["value"],
            }
        )

    ds = _events_series(sf_dir).map_batches(to_hours, batch_format="pyarrow")
    pairs = [(a, a + 1) for a in range(0, 20, 2)]
    rows = api.dcf_pairs(
        ds, pairs, lag_min=_ACF_EDGES[0], lag_max=_ACF_EDGES[-1], lag_bin_width=8.0
    ).take_all()
    pid_out, lag_out, corr_out = [], [], []
    for r in sorted(rows, key=lambda r: r["pair_id"]):
        lags = r.get("lags")
        if lags is None:  # a pair side with < 2 points reports an error row
            continue
        corr = np.asarray(r["correlations"], dtype=np.float64)
        pid_out.extend([r["pair_id"]] * len(lags))
        lag_out.extend(float(x) for x in lags)
        corr_out.extend(_round(corr))
    return pa.table(
        {
            "pair_id": pa.array(pid_out, pa.int64()),
            "lag": pa.array(lag_out, pa.float64()),
            "corr": pa.array(corr_out, pa.float64()),
        }
    )


# Cross-series DCF as a lag-binned cross join: UDCF_ij =
# (a_i - mean_a)(b_j - mean_b)/(std_a std_b) with SAMPLE stds (n-1), bin
# membership lag in [lo, hi) on dyadic-exact hour edges; DCF = per-bin mean.
# Pairs whose either side has < 2 points drop out via the HAVING (the engine
# reports those as error rows and skips them identically).
SQL_DCF_PAIRS = """
WITH o AS (
  SELECT user_id, epoch_us(ts) / 3600000000.0 AS t, value FROM events WHERE user_id < 20
), st AS (
  SELECT user_id, count(*) AS n, sum(value)/count(*) AS mean FROM o GROUP BY 1 HAVING count(*) >= 2
), sd AS (
  SELECT o.user_id, any_value(st.mean) AS mean,
    sqrt(sum((o.value - st.mean)*(o.value - st.mean)) / (st.n - 1)) AS std
  FROM o JOIN st USING (user_id) GROUP BY o.user_id, st.n
), bins AS (SELECT * FROM (VALUES (-24.0,-16.0),(-16.0,-8.0),(-8.0,0.0),(0.0,8.0),(8.0,16.0),(16.0,24.0)) b(lo,hi)
), pr AS (
  SELECT a.user_id // 2 AS pair_id, bins.lo, bins.hi,
    ((a.value - sa.mean) * (b.value - sb.mean)) / (sa.std * sb.std) AS udcf
  FROM o a
  JOIN o b ON b.user_id = a.user_id + 1
  JOIN sd sa ON sa.user_id = a.user_id
  JOIN sd sb ON sb.user_id = b.user_id
  JOIN bins ON (b.t - a.t) >= bins.lo AND (b.t - a.t) < bins.hi
  WHERE a.user_id % 2 = 0
)
SELECT pair_id, (lo + hi) / 2.0 AS lag, ROUND(avg(udcf), 6) AS corr
FROM pr GROUP BY pair_id, lo, hi
"""


# ---- seasonality detection (|ACF(period)| > threshold) ----


def q_detect_seasonality(sf_dir: str):
    """detect_seasonality per user at period=12 over the (ts, event)-sorted
    series (kernels/seasonality.py:95; reference src/seasonality/mod.rs:99-110):
    biased-denominator single-lag ACF, detected = |acf| > 0.3 (threshold
    applied to the UNROUNDED acf on both sides). Oracle: the same num/den
    sums via an offset self-join on row_number."""
    from chronoxtract_ray.kernels.seasonality import autocorrelation

    period = 12

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < period + 1:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "acf_lag12": pa.array([], pa.float64()), "detected": pa.array([], pa.bool_())}
            )
        a = autocorrelation(val, period)
        return pa.table(
            {
                "user_id": pa.array([np.int64(uid)], pa.int64()),
                "acf_lag12": pa.array(_round(np.array([a])), pa.float64()),
                "detected": pa.array([bool(abs(a) > 0.3)], pa.bool_()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_DETECT_SEASONALITY = """
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i
  FROM events
), st AS (
  SELECT user_id, count(*) AS n, avg(value) AS mean
  FROM o GROUP BY 1 HAVING count(*) >= 13
), num AS (
  SELECT a.user_id, sum((a.value - st.mean) * (b.value - st.mean)) AS v
  FROM o a
  JOIN o b ON b.user_id = a.user_id AND b.i = a.i + 12
  JOIN st ON st.user_id = a.user_id
  GROUP BY 1
), den AS (
  SELECT o.user_id, sum((o.value - st.mean) * (o.value - st.mean)) AS v
  FROM o JOIN st ON st.user_id = o.user_id GROUP BY 1
), acf AS (
  SELECT num.user_id,
    CASE WHEN den.v > 0 THEN num.v / den.v ELSE 0.0 END AS a
  FROM num JOIN den ON den.user_id = num.user_id
)
SELECT user_id, ROUND(a, 6) AS acf_lag12, (abs(a) > 0.3) AS detected FROM acf
"""


# ---- rolling fractional variability (sliding-window Fvar) ----

_RFV_W = 16


def q_rolling_fvar(sf_dir: str):
    """rolling_fractional_variability per user (kernels/variability.py:63;
    reference src/misc/frac.rs:95-115): sliding window of 16 |value| samples
    with unit errors, emitting (window start index, fvar, fvar_err). Oracle:
    windowed var_samp/avg over ROWS BETWEEN 15 PRECEDING AND CURRENT ROW —
    same terms as the hash-green SQL_FVAR_PER_USER, per window."""
    from chronoxtract_ray.kernels.variability import rolling_fractional_variability

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < _RFV_W:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "win_idx": pa.array([], pa.int64()), "fvar": pa.array([], pa.float64()), "fvar_err": pa.array([], pa.float64())}
            )
        fv, fe = rolling_fractional_variability(np.abs(val), np.ones_like(val), _RFV_W)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), fv.size), pa.int64()),
                "win_idx": pa.array(np.arange(fv.size), pa.int64()),
                "fvar": pa.array(_round(fv), pa.float64()),
                "fvar_err": pa.array(_round(fe), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ROLLING_FVAR = f"""
WITH o AS (
  SELECT user_id, abs(value) AS f,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i
  FROM events
), w AS (
  SELECT user_id, i,
    count(*) OVER win AS n,
    avg(f) OVER win AS m,
    var_samp(f) OVER win AS v
  FROM o
  WINDOW win AS (PARTITION BY user_id ORDER BY i
                 ROWS BETWEEN {_RFV_W - 1} PRECEDING AND CURRENT ROW)
)
SELECT user_id, i - {_RFV_W - 1} AS win_idx,
  ROUND(CASE WHEN v <= 1.0 THEN 0.0 ELSE sqrt(v - 1.0) / m END, 6) AS fvar,
  ROUND(CASE WHEN v <= 1.0 THEN 0.0 ELSE
    sqrt( pow(sqrt(1.0/(2*{_RFV_W})) * 1.0 / (m*m*(sqrt(v - 1.0)/m)), 2)
        + pow(sqrt(1.0/{_RFV_W}.0) / m, 2) ) END, 6) AS fvar_err
FROM w WHERE n = {_RFV_W}
"""


# ---- STL decomposition (full trend/seasonal/remainder arrays) ----

_STL_PERIOD = 12


def q_stl_decompose(sf_dir: str):
    """simple_stl_decomposition per user at period=12
    (kernels/seasonality.py:40; reference src/seasonality/mod.rs:172-213):
    trend = edge-clipped centered MA (window int(1.5*12)=18 -> half=9),
    seasonal = per-phase mean of detrended, remainder = x - t - s. The
    oracle maps 1:1 onto SQL window/group functions: AVG OVER ROWS BETWEEN
    9 PRECEDING AND 9 FOLLOWING clips at partition edges exactly like the
    kernel's [i-half, i+half] window."""
    from chronoxtract_ray.kernels.seasonality import simple_stl_decomposition

    def fn(group: pa.Table) -> pa.Table:
        uid, _, val, _ = _sorted_series(group)
        if val.size < 2 * _STL_PERIOD:
            return pa.table(
                {"user_id": pa.array([], pa.int64()), "i": pa.array([], pa.int64()), "trend": pa.array([], pa.float64()), "seasonal": pa.array([], pa.float64()), "remainder": pa.array([], pa.float64())}
            )
        t, s, r = simple_stl_decomposition(val, _STL_PERIOD)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), val.size), pa.int64()),
                "i": pa.array(np.arange(val.size), pa.int64()),
                "trend": pa.array(_round(t), pa.float64()),
                "seasonal": pa.array(_round(s), pa.float64()),
                "remainder": pa.array(_round(r), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


# Float-parity notes: the kernel builds the trend from a prefix cumsum
# (sequential adds) and the seasonal pattern from np.bincount (sequential
# adds in i order). A plain windowed AVG / grouped AVG differs from those in
# summation ORDER by ~1e-12, which lands ~1-in-1e6 values on the opposite
# side of a 6-dp rounding boundary — so the oracle mirrors BOTH: trend as a
# difference of running cumulative sums (DuckDB computes cumulative frames
# by sequential accumulation too), pattern as list_sum over an i-ordered
# list. Identical doubles then flow through the identical final expression.
SQL_STL_DECOMPOSE = f"""
WITH o AS (
  SELECT user_id, value,
    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS i,
    count(*) OVER (PARTITION BY user_id) AS n
  FROM events
), cs AS (
  SELECT user_id, i, n, value,
    sum(value) OVER (PARTITION BY user_id ORDER BY i
                     ROWS UNBOUNDED PRECEDING) AS c
  FROM o WHERE n >= {2 * _STL_PERIOD}
), t AS (
  SELECT a.user_id, a.i, a.value,
    (hi.c - COALESCE(lo.c, 0.0))
      / (LEAST(a.i + 10, a.n) - GREATEST(a.i - 9, 0)) AS trend
  FROM cs a
  JOIN cs hi ON hi.user_id = a.user_id AND hi.i = LEAST(a.i + 9, a.n - 1)
  LEFT JOIN cs lo ON lo.user_id = a.user_id AND lo.i = GREATEST(a.i - 9, 0) - 1
), d AS (
  SELECT *, value - trend AS det, i % {_STL_PERIOD} AS phase FROM t
), pat AS (
  SELECT user_id, phase,
    list_sum(list(det ORDER BY i)) / count(*) AS pattern
  FROM d GROUP BY 1, 2
)
SELECT d.user_id, d.i, ROUND(d.trend, 6) AS trend,
  ROUND(pat.pattern, 6) AS seasonal,
  ROUND(d.value - d.trend - pat.pattern, 6) AS remainder
FROM d JOIN pat ON pat.user_id = d.user_id AND pat.phase = d.phase
"""


# ---- ZDCF (Alexander z-transformed DCF; seeded Monte Carlo -> rows-only) --


def q_zdcf(sf_dir: str):
    """Alexander ZDCF between adjacent-user series pairs (users < 8 paired
    as (0,1),(2,3),...; kernels/correlation.py:124, reference
    src/correlation/zdcf.rs:182-239). Rows-only: the seeded 100-draw
    Monte-Carlo error perturbation is deterministic but not SQL-expressible;
    determinism and zero-lag behavior are pinned in tests."""
    import pyarrow.compute as pc

    from chronoxtract_ray.kernels.correlation import zdcf

    ds = _events(sf_dir).map_batches(_prep, batch_format="pyarrow")

    def keep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["user_id"], 8))
        return t.append_column("pair_id", pc.floor(pc.divide(t["user_id"], 2)).cast(pa.int64()))

    def fn(group: pa.Table) -> pa.Table:
        pid = group["pair_id"][0].as_py()
        uids = group["user_id"].to_numpy()
        lo, hi = 2 * pid, 2 * pid + 1
        empty = pa.table({"pair_id": pa.array([], pa.int64()), "lag": pa.array([], pa.float64()), "r": pa.array([], pa.float64()), "err": pa.array([], pa.float64())})
        if not ((uids == lo).any() and (uids == hi).any()):
            return empty
        def series(uid):
            m = uids == uid
            ts = group["ts_us"].to_numpy()[m] / 3.6e9
            turn = group["turn"].to_numpy()[m]
            val = group["value"].to_numpy()[m]
            order = np.lexsort((turn, ts))
            return ts[order], val[order]
        t1, v1 = series(lo)
        t2, v2 = series(hi)
        out = zdcf(t1, v1, np.ones_like(v1), t2, v2, np.ones_like(v2), min_points=11, num_mc=100, seed=0)
        n = out["lags"].size
        return pa.table(
            {
                "pair_id": pa.array(np.repeat(np.int64(pid), n), pa.int64()),
                "lag": pa.array(_round(out["lags"]), pa.float64()),
                "r": pa.array(_round(out["correlations"]), pa.float64()),
                "err": pa.array(_round(out["errors"]), pa.float64()),
            }
        )

    sub = ds.map_batches(keep, batch_format="pyarrow")
    return collect_table(sub.groupby("pair_id").map_groups(fn, batch_format="pyarrow"))
