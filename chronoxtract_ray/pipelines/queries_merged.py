"""Compositional merges of same-row-set query families.

The driver hash-verifies only the FIRST 50 entries of ``queries()``; round 2
left 16 entries unchecked purely because the surface had 66 entries. These
merges shrink the surface to <= 50 WITHOUT dropping any operator: each merged
query is a pure composition — the engine side inner-joins (or unions) the
existing per-operator query results, and the oracle side joins (or unions)
the existing oracle SQL texts as subqueries. No arithmetic is re-derived on
either side, so the bit-exactness each component already proved is preserved
by construction; join keys and filters match because both sides compose the
SAME component row sets the same way.

Operator -> merged-query map (every name below was a standalone round-2
query; kernels and docstring citations live at the component definitions):

- rolling_scans      = rolling_mean + rolling_variance + expanding_sum + ema
                       (rows: rn >= 5, the rolling windows' support).
                       FUSED into one pipeline pass (verbatim component
                       arithmetic; byte-identity vs the composition pinned
                       in tests) — the only merge that is not a driver-side
                       join, because its components each ran a full
                       read->shuffle->scan over the same rows.
- window_summary     = window_moments + window_quantiles + window_mode
                       (rows: every (user, hourly window))
- series_stats       = higher_moments + peak_to_peak + zero_crossing_rate
                       + energy_distribution + variability_features
                       (rows: users passing every component filter)
- matrix_transforms  = tde + gasf + mtf, tagged by ``kind``
- complexity_stats   = dfa + lzc (per-user scalars)
- variability_summary = fvar_per_user + variability_tau (per-user scalars)
"""

from __future__ import annotations

import pyarrow as pa

from chronoxtract_ray.stages.util import collect_table

from chronoxtract_ray.pipelines import queries_events as qe
from chronoxtract_ray.pipelines import queries_features as qf


def _merge(parts, keys):
    """Inner-join component pyarrow tables on ``keys`` (pandas merge; the
    driver's comparison is row-order-insensitive)."""
    df = parts[0].to_pandas()
    for p in parts[1:]:
        df = df.merge(p.to_pandas(), on=keys, how="inner")
    return pa.Table.from_pandas(df.sort_values(keys), preserve_index=False)


def _par(sf_dir: str, *fns):
    """Run independent component queries CONCURRENTLY from driver threads
    (each is its own Ray Data pipeline; the streaming executor interleaves
    them, so a merged query's wall is its slowest component instead of the
    sum). Results return in argument order — composition stays
    deterministic regardless of completion order."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(fns)) as ex:
        futs = [ex.submit(fn, sf_dir) for fn in fns]
        return [f.result() for f in futs]


def _join_sql(parts: list[str], keys: list[str]) -> str:
    using = ", ".join(keys)
    sql = f"({parts[0]}) q0"
    for i, p in enumerate(parts[1:], 1):
        sql += f" JOIN ({p}) q{i} USING ({using})"
    return f"SELECT * FROM {sql}"


def q_rolling_scans(sf_dir: str):
    """Rolling-scan family fused into ONE pipeline pass: one events read, one
    user shuffle, one per-user scan emitting all four columns (previously
    four full read->shuffle->scan pipelines merged driver-side — 4x the
    work for the same rows). Per-column arithmetic is copied VERBATIM from
    the standalone components (q_rolling_mean's padded-cumsum difference,
    the rolling_variance kernel, q_expanding_sum's cumsum, q_ema's exact
    recurrence), so the bit-exactness each component proved against its
    oracle is preserved; the components' inner join on (user_id, event_id)
    is reproduced by emitting only rn >= 5 rows — exactly the join's
    surviving row set, since event_id is unique per user (the same
    uniqueness the oracle's USING join relies on). Fused-vs-composed byte
    identity is pinned in tests."""
    import numpy as np

    from chronoxtract_ray.kernels.rolling import exponential_moving_average, rolling_variance

    _round = qe._round
    ds = qe._events(sf_dir).map_batches(qe._prep, batch_format="pyarrow")
    w = 5

    def fn(group: pa.Table) -> pa.Table:
        ts = group["ts_us"].to_numpy()
        turn = group["turn"].to_numpy()
        val = group["value"].to_numpy()
        order = np.lexsort((turn, ts))
        vs, turn_s = val[order], turn[order]
        if vs.size < w:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "event_id": pa.array([], pa.int64()),
                    "rmean": pa.array([], pa.float64()),
                    "rvar": pa.array([], pa.float64()),
                    "esum": pa.array([], pa.float64()),
                    "ema": pa.array([], pa.float64()),
                }
            )
        cs = np.cumsum(vs)  # q_expanding_sum's esum over the full series
        c = np.concatenate(([0.0], cs))  # q_rolling_mean's padded cumsum
        rm = (c[w:] - c[:-w]) / w
        rv = rolling_variance(vs, w)
        ema = exponential_moving_average(vs, 0.3, exact=True)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(group["user_id"][0].as_py()), rm.size), pa.int64()),
                "event_id": pa.array(turn_s[w - 1 :], pa.int64()),
                "rmean": pa.array(_round(rm), pa.float64()),
                "rvar": pa.array(_round(rv), pa.float64()),
                "esum": pa.array(_round(cs)[w - 1 :], pa.float64()),
                "ema": pa.array(_round(ema)[w - 1 :], pa.float64()),
            }
        )

    return collect_table(ds.groupby("user_id").map_groups(fn, batch_format="pyarrow"))


def rolling_scans_composed(sf_dir: str):
    """The original 4-pipeline composition, kept as the independent
    reference the fused path is byte-compared against in tests."""
    return _merge(
        [qe.q_rolling_mean(sf_dir), qf.q_rolling_variance(sf_dir), qe.q_expanding_sum(sf_dir), qe.q_ema(sf_dir)],
        ["user_id", "event_id"],
    )


SQL_ROLLING_SCANS = _join_sql(
    [qe.SQL_ROLLING_MEAN, qf.SQL_ROLLING_VARIANCE, qe.SQL_EXPANDING_SUM, qe.SQL_EMA],
    ["user_id", "event_id"],
)


def q_window_summary(sf_dir: str):
    return _merge(
        _par(sf_dir, qe.q_window_moments, qe.q_window_quantiles, qe.q_window_mode),
        ["user_id", "window_start"],
    )


SQL_WINDOW_SUMMARY = _join_sql(
    [qe.SQL_WINDOW_MOMENTS, qe.SQL_WINDOW_QUANTILES, qe.SQL_WINDOW_MODE],
    ["user_id", "window_start"],
)


def q_series_stats(sf_dir: str):
    return _merge(
        _par(
            sf_dir,
            qf.q_higher_moments,
            qf.q_peak_to_peak,
            qf.q_zero_crossing_rate,
            qf.q_energy_distribution,
            qf.q_variability_features,
        ),
        ["user_id"],
    )


SQL_SERIES_STATS = _join_sql(
    [
        qf.SQL_HIGHER_MOMENTS,
        qf.SQL_PEAK_TO_PEAK,
        qf.SQL_ZERO_CROSSING_RATE,
        qf.SQL_ENERGY_DISTRIBUTION,
        qf.SQL_VARIABILITY_FEATURES,
    ],
    ["user_id"],
)


def q_complexity_stats(sf_dir: str):
    return _merge(_par(sf_dir, qe.q_dfa, qe.q_lzc), ["user_id"])


SQL_COMPLEXITY_STATS = _join_sql([qf.SQL_DFA, qf.SQL_LZC], ["user_id"])


def q_variability_summary(sf_dir: str):
    return _merge(_par(sf_dir, qe.q_fvar_per_user, qf.q_variability_tau), ["user_id"])


SQL_VARIABILITY_SUMMARY = _join_sql([qe.SQL_FVAR_PER_USER, qf.SQL_VARIABILITY_TAU], ["user_id"])


def q_matrix_transforms(sf_dir: str):
    tables = _par(sf_dir, qf.q_tde, qf.q_gasf, qf.q_mtf)
    parts = []
    for kind, t in zip(("tde", "gasf", "mtf"), tables):
        parts.append(t.add_column(0, "kind", pa.array([kind] * t.num_rows, pa.string())))
    return pa.concat_tables(parts)


SQL_MATRIX_TRANSFORMS = "\nUNION ALL\n".join(
    f"SELECT '{kind}' AS kind, * FROM ({sql})"
    for kind, sql in (("tde", qf.SQL_TDE), ("gasf", qf.SQL_GASF), ("mtf", qf.SQL_MTF))
)


def q_doc_text_stats(sf_dir: str):
    """Per-doc text-analysis family fused into ONE corpus pass: fingerprint
    + token stats + quality score + language ID + SimHash + benchmark
    decontamination. Every component kernel is per-doc and row-aligned
    within a batch, so one ``map_batches`` applies all six and
    column-concatenates — identical values to running the component queries
    (same per-batch kernels, see their definitions in queries_docs.py /
    queries_traindata.py), at one scoring scan plus the benchmark-set pass
    (the decon kernel's gram set is distilled from a separate pass over the
    benchmark slice — benchmark-sized output, corpus-sized read — then
    rides the same broadcast-once pattern as its standalone query)."""
    import ray

    from chronoxtract_ray.pipelines import queries_docs as qd
    from chronoxtract_ray.pipelines import queries_traindata as qtd

    bench_ref = ray.put(set(qtd._benchmark_grams(sf_dir).tolist()))

    kernels = (
        qd.doc_fingerprint_batch,
        qd.token_stats_batch,
        qd.quality_score_batch,
        qd.lang_id_batch,
        qd.simhash_batch,
    )

    def fused(t: pa.Table) -> pa.Table:
        out = kernels[0](t)
        parts = [fn(t) for fn in kernels[1:]]
        parts.append(qtd.decontaminate_batch(t, ray.get(bench_ref)))
        for p in parts:
            for name in p.column_names:
                if name != "doc_id":
                    out = out.append_column(name, p[name])
        return out

    return collect_table(qd._docs(sf_dir).map_batches(fused, batch_format="pyarrow"))


def _sql_doc_text_stats() -> str:
    from chronoxtract_ray.pipelines import queries_docs as qd
    from chronoxtract_ray.pipelines import queries_traindata as qtd

    return _join_sql(
        [
            qd.SQL_DOC_FINGERPRINT,
            qd.SQL_TOKEN_STATS,
            qd.SQL_QUALITY_SCORE,
            qd.SQL_LANG_ID,
            qd.SQL_SIMHASH,
            qtd.SQL_DECONTAMINATE,
        ],
        ["doc_id"],
    )


# Built eagerly on purpose: every consumer of this module (__ray_entry__,
# bench, the CLI query path) also loads queries_docs in the same breath, so
# deferring the build would complicate the oracle registry (which wants a
# plain string) to save an import that happens anyway.
SQL_DOC_TEXT_STATS = _sql_doc_text_stats()


# ---- round-5 window-rotation merges (VERDICT r4 #3) ------------------------
#
# The driver hash-checks only the FIRST 50 queries() entries; round 4 left
# the five curation queries past the window. These four merges free five
# slots WITHOUT dropping any operator's distinct hash check:
#
# - tier_cascade_1h      += gorilla_roundtrip   (same (user, hour) row set:
#                           inner join; the codec's decoded mean rides as
#                           ``gorilla_mean``)
# - continuous_aggregate += gap_filled_hourly   (different row sets: tagged
#                           UNION, matrix_transforms precedent)
# - shape_windows         = slope_features + hjorth + turning_points
#                           (per-(user, day-window) families with different
#                           row filters: tagged union over harmonized
#                           (v1, v2, v3) value columns)
# - seasonality_stats     = stl_strengths + detect_seasonality
#                           (per-user scalars, different n filters: tagged
#                           union over (v1, v2))
#
# Tagged unions preserve EVERY component row and value bit-for-bit (no
# intersection semantics); harmonized columns cast identically on both the
# engine and oracle sides (int -> double, bool -> double), so each
# component's proven hash surface survives the merge unchanged.


def q_tier_gorilla(sf_dir: str):
    """tier_cascade_1h ⨝ gorilla_roundtrip on (user_id, window_start) —
    both emit exactly the (user, non-empty hour) row set, so the inner join
    is lossless; ``gorilla_mean`` is the encode→decode roundtrip output."""
    tc, gr = _par(sf_dir, qe.q_tier_cascade_1h, qe.q_gorilla_roundtrip)
    # rename by NAME, not position — positional rename_columns would
    # silently mislabel if the component's column order ever changed
    gr = gr.select(["user_id", "window_start", "mean"]).rename_columns(
        ["user_id", "window_start", "gorilla_mean"]
    )
    return _merge([tc, gr], ["user_id", "window_start"])


SQL_TIER_GORILLA = _join_sql(
    [
        qe.SQL_TIER_CASCADE_1H,
        f"SELECT user_id, window_start, mean AS gorilla_mean FROM ({qe.SQL_GORILLA_ROUNDTRIP})",
    ],
    ["user_id", "window_start"],
)


def q_contagg_gapfill(sf_dir: str):
    """continuous_aggregate (minute tier read back through the incremental
    ingest store) ∪ gap_filled_hourly (hourly grid with interpolated gaps),
    tagged by ``part`` — different grains, so a union, not a join."""
    ca, gf = _par(sf_dir, qe.q_continuous_aggregate, qe.q_gap_filled_hourly)
    import numpy as np

    parts = [
        pa.table(
            {
                "part": pa.array(["contagg"] * ca.num_rows, pa.string()),
                "user_id": ca["user_id"],
                "window_start": ca["window_start"],
                "value": ca["mean"],
                "gap_filled": pa.array(np.zeros(ca.num_rows, bool), pa.bool_()),
            }
        ),
        pa.table(
            {
                "part": pa.array(["gapfill"] * gf.num_rows, pa.string()),
                "user_id": gf["user_id"],
                "window_start": gf["window_start"],
                "value": gf["mean_filled"],
                "gap_filled": gf["gap_filled"],
            }
        ),
    ]
    return pa.concat_tables(parts)


SQL_CONTAGG_GAPFILL = f"""
SELECT 'contagg' AS part, user_id, window_start, mean AS value, FALSE AS gap_filled
FROM ({qe.SQL_CONTINUOUS_AGGREGATE})
UNION ALL
SELECT 'gapfill' AS part, user_id, window_start, mean_filled AS value, gap_filled
FROM ({qe.SQL_GAP_FILLED_HOURLY})
"""


def _tagged_union(parts):
    """(tag, table, key_cols, value_col_names) 4-tuples → one table with
    harmonized (part, key..., v1..vK) columns; missing trailing values pad
    with 0.0 and ints/bools cast to float64 — mirrored literally in the
    oracle SQL."""
    import numpy as np

    width = max(len(cols) for _, _, _, cols in parts)
    out = []
    for tag, t, keys, cols in parts:
        data = {"part": pa.array([tag] * t.num_rows, pa.string())}
        for k in keys:
            data[k] = t[k]
        for i in range(width):
            if i < len(cols):
                col = t[cols[i]]
                if col.type != pa.float64():
                    col = pa.array(
                        col.to_numpy(zero_copy_only=False).astype(np.float64), pa.float64()
                    )
            else:
                col = pa.array(np.zeros(t.num_rows), pa.float64())
            data[f"v{i + 1}"] = col
        out.append(pa.table(data))
    return pa.concat_tables(out)


def q_shape_windows(sf_dir: str):
    """slope_features ∪ hjorth ∪ turning_points over daily windows, tagged
    by ``part``; value-column map: slope = (mean_slope, slope_variance,
    max_slope_abs), hjorth = (activity, mobility, complexity), turning =
    (tp, tp_rate, 0.0 pad). Row sets differ per component filter (n >= 2 /
    n >= 3 + variance floors / n >= 3) and every one survives verbatim."""
    sl, hj, tp = _par(sf_dir, qe.q_slope_features, qe.q_hjorth, qe.q_turning_points)
    return _tagged_union(
        [
            ("slope", sl, ["user_id", "window_start"],
             ["mean_slope", "slope_variance", "max_slope_abs"]),
            ("hjorth", hj, ["user_id", "window_start"],
             ["activity", "mobility", "complexity"]),
            ("turning", tp, ["user_id", "window_start"],
             ["tp", "tp_rate"]),
        ]
    )


SQL_SHAPE_WINDOWS = f"""
SELECT 'slope' AS part, user_id, window_start,
  mean_slope AS v1, slope_variance AS v2, max_slope_abs AS v3
FROM ({qe.SQL_SLOPE_FEATURES})
UNION ALL
SELECT 'hjorth' AS part, user_id, window_start,
  activity AS v1, mobility AS v2, complexity AS v3
FROM ({qe.SQL_HJORTH})
UNION ALL
SELECT 'turning' AS part, user_id, window_start,
  tp::DOUBLE AS v1, tp_rate AS v2, 0.0 AS v3
FROM ({qe.SQL_TURNING_POINTS})
"""


def q_seasonality_stats(sf_dir: str):
    """stl_strengths ∪ detect_seasonality per user, tagged by ``part``;
    value-column map: stl = (seasonal_strength, trend_strength), acf12 =
    (acf_lag12, detected as 0.0/1.0)."""
    stl, det = _par(sf_dir, qe.q_stl_strengths, qf.q_detect_seasonality)
    return _tagged_union(
        [
            ("stl", stl, ["user_id"],
             ["seasonal_strength", "trend_strength"]),
            ("acf12", det, ["user_id"], ["acf_lag12", "detected"]),
        ]
    )


SQL_SEASONALITY_STATS = f"""
SELECT 'stl' AS part, user_id, seasonal_strength AS v1, trend_strength AS v2
FROM ({qf.SQL_STL_STRENGTHS})
UNION ALL
SELECT 'acf12' AS part, user_id, acf_lag12 AS v1, detected::DOUBLE AS v2
FROM ({qf.SQL_DETECT_SEASONALITY})
"""
