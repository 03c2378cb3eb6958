"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship transcript rollup pipeline on sf0.001 (events
adapted to the transcript schema). ``queries()``/``oracle_sql()`` expose one
entry per implemented operator family from SURVEY.md §2 + the training-data
extensions; SQL oracles are provided for everything ANSI-SQL can express,
and the remaining entries (entropy/FFT/sketches/LSH) are rows-only.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from chronoxtract_ray.pipelines import queries_docs as qd
from chronoxtract_ray.pipelines import queries_events as qe
from chronoxtract_ray.pipelines import queries_features as qf
from chronoxtract_ray.pipelines import queries_joins as qj
from chronoxtract_ray.pipelines import queries_merged as qm
from chronoxtract_ray.pipelines import queries_textqc as qt
from chronoxtract_ray.pipelines import queries_traindata as qtd
from chronoxtract_ray.pipelines import queries_vec as qv

SF0001 = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline on sf0.001: events → transcript schema → derive →
    salted windowed rollup → 1m/1h/1d cascade with gap-fill → Gorilla chunks
    → partitioned parquet; returns the 1m tier."""
    import shutil

    import pyarrow as pa

    from chronoxtract_ray.pipelines.rollup_pipeline import (
        PipelineConfig,
        run_rollup_pipeline,
        tier_table,
    )

    def as_transcripts(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        uid5 = pc.utf8_lpad(pc.cast(t["user_id"], pa.string()), 5, "0")
        return pa.table(
            {
                "conv_id": pc.binary_join_element_wise(pa.scalar("user-"), uid5, ""),
                "turn_idx": t["event_id"].cast(pa.int32()),
                "role": t["event_type"],
                "text": t["props"],
                "tool": pc.replace_substring_regex(t["event_type"], ".*", ""),
                "ts": t["ts"],
            }
        )

    from chronoxtract_ray.stages.util import read_parquet_clean

    ds = read_parquet_clean(
        f"{SF0001}/events.parquet", columns=["user_id", "event_id", "event_type", "props", "ts"]
    ).map_batches(as_transcripts, batch_format="pyarrow")
    out = "/tmp/ctx_entry_out"
    shutil.rmtree(out, ignore_errors=True)
    run_rollup_pipeline(ds, out, PipelineConfig(num_parts=4))
    return tier_table(out, "1m").to_pandas()


def queries() -> dict[str, Callable[[str], Any]]:
    """54 entries: every operator family from SURVEY.md §2 + the
    training-data extensions (dedup/ANN/text-QC/sampling/curation), with
    same-family queries merged into compositional queries
    (queries_merged.py, knn_ann, sampling_policies) so that the 50 slots of
    the driver's check window each hash-verify a DISTINCT operator — the r5
    rotation (VERDICT r4 #3) folded gorilla_roundtrip into tier_cascade_1h,
    gap_filled_hourly into continuous_aggregate, slope/hjorth/turning into
    shape_windows and stl_strengths/detect_seasonality into
    seasonality_stats (tagged unions/joins, no component row or value lost
    — see queries_merged.py round-5 section), bringing ALL five curation
    queries inside the window. The only entries past slot 50 are the four
    non-SQL-expressible ones (seeded MC / MCMC / µs-surface / multimodal)."""
    return {
        # ---- dedup + text analysis over documents ----
        "dedup_exact": qd.q_dedup_exact,
        "doc_text_stats": qm.q_doc_text_stats,  # fingerprint+tokens+quality+lang+simhash
        "c4_filters": qt.q_c4_filters,
        "vocab_topk": qt.q_vocab_topk,
        "unigram_logprob": qt.q_unigram_logprob,
        # both deterministic sampling policies (stratified top-K + token
        # budget), method-tagged in one query (knn_ann precedent); the key
        # keeps its round-1 name for cross-round comparability
        "stratified_sample": qtd.q_sampling_policies,
        "minhash_neardup": qd.q_minhash_neardup,
        "ngram_jaccard_pairs": qd.q_ngram_jaccard_pairs,
        "dedup_clusters": qd.q_dedup_clusters,
        # ---- similarity search over embeddings ----
        "knn_bruteforce": qv.q_knn_bruteforce,
        "embedding_neardup": qv.q_embedding_neardup,
        "knn_ann": qv.q_knn_ann,  # lsh + ivf, method-tagged
        "pii_scrub": qt.q_pii_scrub,
        # ---- joins / sort-limit / aggregates ----
        "range_join": qj.q_range_join,
        "top_energy_windows": qe.q_top_energy_windows,
        "event_type_stats": qe.q_event_type_stats,
        # ---- entropy + model fitting (hash-checked since r3) ----
        "entropy_features": qe.q_entropy_features,
        "carma_mle": qe.q_carma_mle,
        "carma_order": qe.q_carma_order,
        # ---- tiers / gap-fill / compression ----
        # r5 merges: continuous_aggregate ∪ gap_filled_hourly (tagged),
        # tier_cascade_1h ⨝ gorilla_roundtrip (same row set)
        "continuous_aggregate": qm.q_contagg_gapfill,
        "tier_cascade_1h": qm.q_tier_gorilla,
        "retention_prune": qe.q_retention_prune,
        # ---- windowed feature rollups over events (time-series core) ----
        "window_summary": qm.q_window_summary,  # moments + quantiles + mode
        "window_skew_kurt": qe.q_window_skew_kurt,
        "shape_windows": qm.q_shape_windows,  # slope + hjorth + turning, tagged
        # ---- rolling scans ----
        "rolling_scans": qm.q_rolling_scans,  # mean + variance + esum + ema
        "sliding_window_entropy": qf.q_sliding_window_entropy,
        # ---- spectral / entropy / seasonality ----
        "fft_bands": qe.q_fft_bands,
        "lomb_scargle": qe.q_lomb_scargle,
        "seasonality_stats": qm.q_seasonality_stats,  # stl strengths + acf12, tagged
        "complexity_stats": qm.q_complexity_stats,  # dfa + lzc
        "multiscale_entropy": qf.q_multiscale_entropy,
        "stl_decompose": qf.q_stl_decompose,
        "rolling_fvar": qf.q_rolling_fvar,
        # ---- temporal joins ----
        "sessionize": qj.q_sessionize,
        "asof_join": qj.q_asof_join,
        # ---- whole-series / astronomy / model fitting ----
        "variability_summary": qm.q_variability_summary,  # fvar + tau stats
        "carma_loglik": qe.q_carma_loglik,
        "carma_forecast": qf.q_carma_forecast,
        "acf_binned": qf.q_acf_binned,
        "dcf_pairs": qf.q_dcf_pairs,
        "peak_stats": qf.q_peak_stats_sql,
        "find_peaks": qf.q_find_peaks,
        "matrix_transforms": qm.q_matrix_transforms,  # tde + gasf + mtf
        "series_stats": qm.q_series_stats,  # m5-m8 + p2p + zcr + energy + cv
        # ---- training-data curation family (in-window since r5; each has a
        # full SQL oracle below + pytest strict-hash parity at sf0.001/0.01;
        # decontaminate/token_budget_sample ALSO ride the doc_text_stats
        # fusion / sampling_policies union hash checks) ----
        "decontaminate": qtd.q_decontaminate,
        "token_budget_sample": qtd.q_token_budget_sample,
        "source_mix": qtd.q_source_mix,
        "semdedup": qtd.q_semdedup,
        "curation_pipeline": qtd.q_curation_pipeline,
        # ==== entries 51+: rows-only by declared reason (see oracle_sql
        # trailing comment); everything hash-checkable sits above ====
        "zdcf_pairs": qf.q_zdcf,
        "carma_mcmc": qe.q_carma_mcmc,
        "variability_timescale": qe.q_variability_timescale,
        "multimodal_features": qt.q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    return {
        # merged families (queries_merged.py): joins/unions of the component
        # oracle texts as subqueries — no re-derived arithmetic
        "window_summary": qm.SQL_WINDOW_SUMMARY,
        "rolling_scans": qm.SQL_ROLLING_SCANS,
        "complexity_stats": qm.SQL_COMPLEXITY_STATS,
        "variability_summary": qm.SQL_VARIABILITY_SUMMARY,
        "matrix_transforms": qm.SQL_MATRIX_TRANSFORMS,
        "series_stats": qm.SQL_SERIES_STATS,
        "window_skew_kurt": qe.SQL_WINDOW_SKEW_KURT,
        "shape_windows": qm.SQL_SHAPE_WINDOWS,
        "tier_cascade_1h": qm.SQL_TIER_GORILLA,
        "retention_prune": qe.SQL_RETENTION_PRUNE,
        "continuous_aggregate": qm.SQL_CONTAGG_GAPFILL,
        "sessionize": qj.SQL_SESSIONIZE,
        "asof_join": qj.SQL_ASOF_JOIN,
        "range_join": qj.SQL_RANGE_JOIN,
        "top_energy_windows": qe.SQL_TOP_ENERGY_WINDOWS,
        "event_type_stats": qe.SQL_EVENT_TYPE_STATS,
        "dedup_exact": qd.SQL_DEDUP_EXACT,
        "doc_text_stats": qm.SQL_DOC_TEXT_STATS,
        "c4_filters": qt.SQL_C4_FILTERS,
        "vocab_topk": qt.SQL_VOCAB_TOPK,
        "unigram_logprob": qt.SQL_UNIGRAM_LOGPROB,
        "stratified_sample": qtd.SQL_SAMPLING_POLICIES,
        "ngram_jaccard_pairs": qd.SQL_NGRAM_JACCARD_PAIRS,
        "dedup_clusters": qd.SQL_DEDUP_CLUSTERS,
        "minhash_neardup": qd.SQL_MINHASH_NEARDUP,
        "knn_bruteforce": qv.SQL_KNN_BRUTEFORCE,
        "embedding_neardup": qv.SQL_EMBEDDING_NEARDUP,
        "peak_stats": qf.SQL_PEAK_STATS,
        "find_peaks": qf.SQL_FIND_PEAKS,
        "sliding_window_entropy": qf.SQL_SLIDING_WINDOW_ENTROPY,
        "seasonality_stats": qm.SQL_SEASONALITY_STATS,
        "fft_bands": qe.SQL_FFT_BANDS,
        "entropy_features": qe.SQL_ENTROPY_FEATURES,
        "lomb_scargle": qe.SQL_LOMB_SCARGLE,
        "acf_binned": qf.SQL_ACF_BINNED,
        "dcf_pairs": qf.SQL_DCF_PAIRS,
        "multiscale_entropy": qf.SQL_MULTISCALE_ENTROPY,
        "carma_loglik": qe.SQL_CARMA_LOGLIK,
        "carma_forecast": qf.SQL_CARMA_FORECAST,
        # Seeded ANN state embedded as SQL literals (hyperplane matrix) /
        # reconstructed deterministically (strided k-means init + unrolled
        # Lloyd iterations) — see queries_vec.py oracle comments.
        "knn_ann": qv.SQL_KNN_ANN,
        "pii_scrub": qt.SQL_PII_SCRUB,
        # Seeded CAR(1) multi-start constants embedded as SQL literals
        # (knn_lsh precedent); the Kalman recursion is the carma_loglik CTE.
        "carma_mle": qe.SQL_CARMA_MLE,
        "carma_order": qe.SQL_CARMA_ORDER,
        "rolling_fvar": qf.SQL_ROLLING_FVAR,
        "stl_decompose": qf.SQL_STL_DECOMPOSE,
        # Still rows-only:
        # zdcf_pairs (seeded 100-draw Monte-Carlo error perturbation —
        # deterministic, not SQL-expressible; determinism + zero-lag tests),
        # carma_mcmc (PT-MCMC posterior sampling is not SQL-expressible;
        # the underlying Kalman recursion IS hash-checked via carma_loglik,
        # carma_forecast, carma_mle and carma_order),
        # variability_timescale (µs api surface; the hours variant IS
        # hash-checked inside variability_summary; µs-scale taus exceed
        # fixed-decimal rounding's noise floor),
        # multimodal_features (pixel/sample math through the real PPM/WAV
        # actor-pool decode path — not SQL-expressible; kernel parity vs
        # direct numpy pinned in tests/test_multimodal.py, determinism and
        # shape pinned in tests/test_textqc.py).
        #
        # Curation family: IN-WINDOW since the r5 rotation (slots 46-50);
        # strict hash parity additionally pinned in tests/test_traindata.py
        # at sf0.001/sf0.01, and decontaminate / token_budget_sample also
        # ride the doc_text_stats fusion / sampling_policies union checks.
        "decontaminate": qtd.SQL_DECONTAMINATE,
        "token_budget_sample": qtd.SQL_TOKEN_BUDGET_SAMPLE,
        "source_mix": qtd.SQL_SOURCE_MIX,
        "semdedup": qtd.SQL_SEMDEDUP,
        "curation_pipeline": qtd.SQL_CURATION_PIPELINE,
    }
