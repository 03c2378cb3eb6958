"""Semantic tests for the text-QC extension family (queries_textqc.py) —
oracle parity runs separately in test_queries_oracle.py; these pin the
behavioral contracts: discrimination, determinism, sample-size bounds, and
the shared-histogram memoization."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tq(ray_session):
    from chronoxtract_ray.pipelines import queries_textqc as m

    return m


def test_c4_filters_discriminate(tq):
    t = tq.q_c4_filters(SF).to_pandas()
    assert t.doc_id.is_unique and len(t) == 500
    rate = t.keep.mean()
    assert 0.0 < rate < 1.0, f"filter should split the corpus, keep rate {rate}"
    # the keep flag must be consistent with its own reported columns
    recomputed = (
        (t.n_words >= tq._MIN_WORDS)
        & (t.mean_word_len >= tq._MEAN_WL_LO)
        & (t.mean_word_len <= tq._MEAN_WL_HI)
        & (t.max_word_len <= tq._MAX_WORD_LEN)
        & (t.alpha_ratio >= tq._MIN_ALPHA_RATIO)
    )
    assert (t.keep == recomputed).all()


def test_vocab_topk_sorted_and_deterministic(tq):
    a = tq.q_vocab_topk(SF).to_pandas()
    n = a.n.to_numpy()
    assert (np.diff(n) <= 0).all(), "counts must be non-increasing"
    # deterministic tie-break: equal counts appear in ascending token order
    for _, grp in a.groupby("n"):
        toks = grp.token.tolist()
        assert toks == sorted(toks)
    b = tq.q_vocab_topk(SF).to_pandas()
    pd.testing.assert_frame_equal(a, b)


def test_token_counts_memoized_and_consistent(tq):
    df1 = tq._token_counts(SF)
    df2 = tq._token_counts(SF)
    assert df1 is df2, "histogram must be computed once per sf_dir"
    # total token mass equals the whitespace token count of the corpus
    docs = pd.read_parquet(f"{SF}/documents.parquet", columns=["text"])
    total = docs.text.str.strip().str.split().str.len().fillna(0).sum()
    assert df1.n.sum() == total


def test_unigram_logprob_semantics(tq):
    t = tq.q_unigram_logprob(SF).to_pandas()
    assert (t.mean_logprob < 0).all(), "log-probabilities are negative"
    assert t.doc_id.is_unique
    # a doc made of the corpus's most frequent token would score ln(p_max):
    # every real doc's mean can never beat that bound
    freq = tq._token_counts(SF)
    lp_max = np.log(freq.n.max() / freq.n.sum())
    assert (t.mean_logprob <= np.round(lp_max, 6) + 1e-9).all()


def test_stratified_sample_size_and_reproducibility(tq):
    t = tq.q_stratified_sample(SF).to_pandas()
    per = t.groupby("source").size()
    assert (per == tq._SAMPLE_K).all(), "every stratum has >= K docs at sf0.001"
    assert t.doc_id.is_unique
    u = tq.q_stratified_sample(SF).to_pandas()
    key = ["source", "sample_key", "doc_id"]
    pd.testing.assert_frame_equal(
        t.sort_values(key).reset_index(drop=True), u.sort_values(key).reset_index(drop=True)
    )


def test_pii_scrub_matches_oracle_on_events(tq):
    import duckdb

    got = tq.q_pii_scrub(SF).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')")
    exp = con.execute(tq.SQL_PII_SCRUB + " ORDER BY event_id").fetchdf()
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    assert (got.n_number > 0).any(), "events props contain digits to redact"


def test_pii_scrub_kernel_on_synthetic_pii(tq):
    import duckdb
    import pyarrow as pa

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "props": [
                "contact a.b+x@mail-site.co.uk now",
                "call +1 (415) 555-0199 or 4155550199",
                '{"k": 69}',
                "no pii here",
            ],
        }
    )
    got = tq.pii_scrub_batch(pa.Table.from_pandas(df)).to_pandas()
    con = duckdb.connect()
    con.register("events", df)
    exp = con.execute(tq.SQL_PII_SCRUB + " ORDER BY event_id").fetchdf()
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp, check_dtype=False)
    assert got.n_email.sum() == 1 and got.n_phone.sum() == 2 and got.n_number.sum() == 1


def test_multimodal_features_query(tq):
    t = tq.q_multimodal_features(SF).to_pandas()
    assert len(t) == 500 and t.media_id.is_unique
    assert t.decode_ok.all(), "all synthesized payloads must decode"
    assert set(t.kind) == {"image", "audio"}
    fcols = [c for c in t.columns if c.startswith("f")]
    assert len(fcols) == 16 and np.isfinite(t[fcols].to_numpy()).all()
    # image rows lead with (w, h) = (8, 8); audio rows with (sr, n) = (8000, 256)
    img, aud = t[t.kind == "image"], t[t.kind == "audio"]
    assert (img.f00 == 8).all() and (img.f01 == 8).all()
    assert (aud.f00 == 8000).all() and (aud.f01 == 256).all()
    # deterministic across runs
    u = tq.q_multimodal_features(SF).to_pandas().sort_values("media_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(t.sort_values("media_id").reset_index(drop=True), u)


def test_file_cache_key_identity(tmp_path):
    """file_cache_key: None (uncacheable) for a missing file; changes when
    the file is regenerated in place — a path-only key would serve stale
    memoized results against a fresh oracle read (r4 review)."""
    import os

    from chronoxtract_ray.stages.util import file_cache_key

    p = tmp_path / "x.parquet"
    assert file_cache_key(str(p)) is None
    p.write_bytes(b"abc")
    k1 = file_cache_key(str(p))
    assert k1 is not None
    os.utime(p, ns=(k1[1] + 7, k1[1] + 7))
    k2 = file_cache_key(str(p))
    assert k2 is not None and k2 != k1


def test_freq_cache_invalidates_on_regenerated_corpus(tq, ray_session, tmp_path):
    """Regenerating documents.parquet at the SAME path must invalidate the
    memoized histogram — the engine would otherwise serve the old counts
    while the SQL oracle reads the new file (hash mismatch masquerading as
    an engine bug)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                  "text": pa.array(["aa aa bb", "aa"], pa.string())}), p)
    df1 = tq._token_counts(str(tmp_path))
    assert dict(zip(df1.token, df1.n)) == {"aa": 3, "bb": 1}
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array(["cc cc cc"], pa.string())}), p)
    st = os.stat(p)
    os.utime(p, ns=(st.st_mtime_ns + 1, st.st_mtime_ns + 1))  # force new identity
    df2 = tq._token_counts(str(tmp_path))
    assert dict(zip(df2.token, df2.n)) == {"cc": 3}


def test_repetition_metrics_hand_computed(tq, ray_session, tmp_path):
    """Gopher-style repetition fractions pinned on hand-built docs:
    a heavily repetitive doc, a no-repeat doc, and degenerate (< 3 token)
    docs that must emit 0.0 fractions with rep_keep=false."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    docs = [
        # "x y x y x y": topw=3/6, top bigram ("x y")=3/5,
        # trigrams: xyx, yxy, xyx, yxy -> tot=4 dis=2 -> dup=0.5
        "x y x y x y",
        # all distinct: topw=1/5, topb=1/4, dup=0
        "a b c d e",
        # degenerate: 1 and 2 tokens
        "solo",
        "two tokens",
    ]
    p = os.path.join(tmp_path, "documents.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs, pa.string())}), p)
    t = tq.q_c4_filters(str(tmp_path)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert t.top_word_frac.tolist() == [0.5, 0.2, 0.0, 0.0]
    assert t.top_bigram_frac.tolist() == [0.6, 0.25, 0.0, 0.0]
    assert t.dup_trigram_frac.tolist() == [0.5, 0.0, 0.0, 0.0]
    # doc 0 trips every repetition rule; doc 1 trips top_word (0.2 > 0.10);
    # degenerates are rep-rejected by the n >= 3 guard
    assert t.rep_keep.tolist() == [False, False, False, False]
    # and a genuinely diverse long doc passes
    long_doc = " ".join(f"w{i}" for i in range(50))
    pq.write_table(
        pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([long_doc], pa.string())}), p)
    st = os.stat(p)
    os.utime(p, ns=(st.st_mtime_ns + 1, st.st_mtime_ns + 1))
    t2 = tq.q_c4_filters(str(tmp_path)).to_pandas()
    assert bool(t2.rep_keep[0]) is True
    assert float(t2.dup_trigram_frac[0]) == 0.0
