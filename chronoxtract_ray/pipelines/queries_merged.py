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
        [qe.q_window_moments(sf_dir), qe.q_window_quantiles(sf_dir), qe.q_window_mode(sf_dir)],
        ["user_id", "window_start"],
    )


SQL_WINDOW_SUMMARY = _join_sql(
    [qe.SQL_WINDOW_MOMENTS, qe.SQL_WINDOW_QUANTILES, qe.SQL_WINDOW_MODE],
    ["user_id", "window_start"],
)


def q_series_stats(sf_dir: str):
    return _merge(
        [
            qf.q_higher_moments(sf_dir),
            qf.q_peak_to_peak(sf_dir),
            qf.q_zero_crossing_rate(sf_dir),
            qf.q_energy_distribution(sf_dir),
            qf.q_variability_features(sf_dir),
        ],
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
    return _merge([qe.q_dfa(sf_dir), qe.q_lzc(sf_dir)], ["user_id"])


SQL_COMPLEXITY_STATS = _join_sql([qf.SQL_DFA, qf.SQL_LZC], ["user_id"])


def q_variability_summary(sf_dir: str):
    return _merge([qe.q_fvar_per_user(sf_dir), qf.q_variability_tau(sf_dir)], ["user_id"])


SQL_VARIABILITY_SUMMARY = _join_sql([qe.SQL_FVAR_PER_USER, qf.SQL_VARIABILITY_TAU], ["user_id"])


def q_matrix_transforms(sf_dir: str):
    parts = []
    for kind, fn in (("tde", qf.q_tde), ("gasf", qf.q_gasf), ("mtf", qf.q_mtf)):
        t = fn(sf_dir)
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
