"""Corpus-level text QC for training-data pipelines: C4-style quality
filters, a global token histogram, unigram language-model scoring, and
deterministic stratified sampling — the filter/score/sample trio every
LLM-data pipeline runs in front of dedup (reference has no counterpart;
these extend SURVEY.md §2.12's engine-side surface like queries_docs.py).

Dataflow shapes (the point at 100 TB):

* ``c4_filters``       — stateless vectorized ``map_batches``; no shuffle.
* ``vocab_topk``       — per-batch PARTIAL token counts (pandas
  ``value_counts`` inside the batch) → one small ``groupby(token).sum``
  shuffle whose input is vocab-sized per batch, not token-occurrence-sized:
  the pre-aggregate-before-groupby combiner pattern.
* ``unigram_logprob``  — the same distributed histogram, collected once
  (vocab-sized, tiny) and BROADCAST into a scoring ``map_batches`` via
  ``ray.put`` — small-side broadcast instead of a token-level join.
* ``stratified_sample``— per-stratum deterministic top-k by a content hash
  (md5 of the key): a uniform per-group sample that is reproducible across
  runs/workers and needs only a per-group bounded heap, never a global sort.

Bit-exactness vs the DuckDB oracles: integer counts divide as float64 on
both sides (exact); the unigram score accumulates count·ln(freq) terms
SEQUENTIALLY in token-ascending order on both sides (engine: one
vectorized-across-docs pass per vocab token; oracle:
``list_aggregate(list(term ORDER BY token), 'sum')``) so the float
summation tree is identical — zero-count terms add ``±0.0`` which is
bitwise-neutral. Verified exact at sf0.001 before wiring.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from chronoxtract_ray.stages.util import collect_table, from_pandas_clean

from chronoxtract_ray.pipelines.queries_docs import _docs, _round

# ---- C4-style quality filters --------------------------------------------

_MIN_WORDS = 40  # splits the synthetic corpus ~69/31 (10..99 words/doc)
_MEAN_WL_LO, _MEAN_WL_HI = 3.0, 10.0
_MAX_WORD_LEN = 15
_MIN_ALPHA_RATIO = 0.6
# Gopher-style repetition thresholds (Rae et al. 2021 §A1.1 shape, values
# picked to split THIS corpus meaningfully: top-word ~0.05-0.25 here).
# Thresholds compare UNROUNDED fractions on both sides (the
# detect_seasonality precedent).
_REP_TOP_WORD = 0.10
_REP_TOP_BIGRAM = 0.05
_REP_DUP_TRIGRAM = 0.01


def c4_flags_batch(t: pa.Table) -> pa.Table:
    """Module-level C4+Gopher per-batch kernel so q_curation_pipeline can
    fuse it with the decontamination / fingerprint kernels in one corpus
    pass (same pattern as queries_merged's fused doc_text_stats)."""
    import pyarrow.compute as pc

    # all-Arrow/numpy: the previous pandas form boxed every text through
    # to_pylist and ran a Python lambda per row for max word length —
    # this is the per-doc projection a 100-TB corpus streams through
    txt = pc.fill_null(t["text"], "") if t["text"].null_count else t["text"]
    ndocs = t.num_rows
    topw = np.zeros(ndocs, np.int64)
    topb = np.zeros(ndocs, np.int64)
    tot3 = np.zeros(ndocs, np.int64)
    dis3 = np.zeros(ndocs, np.int64)
    if ndocs == 0:
        n_words = word_chars = max_wl = n_chars = n_alpha = np.empty(0, np.int64)
    else:
        tr = pc.utf8_trim_whitespace(txt)
        sp = pc.utf8_split_whitespace(tr)  # [''] for whitespace-only rows
        counts = pc.list_value_length(sp).to_numpy().astype(np.int64)
        flat_tok = pc.list_flatten(sp)
        if isinstance(flat_tok, pa.ChunkedArray):
            flat_tok = flat_tok.combine_chunks()
        flat_len = pc.utf8_length(flat_tok).to_numpy().astype(np.int64)
        offsets = np.concatenate(([0], np.cumsum(counts)))[:-1]
        word_chars = np.add.reduceat(flat_len, offsets)  # '' token adds 0
        max_wl = np.maximum.reduceat(flat_len, offsets)
        n_words = np.where(pc.utf8_length(tr).to_numpy().astype(np.int64) == 0, 0, counts)
        n_chars = pc.utf8_length(txt).to_numpy().astype(np.int64)
        n_alpha = pc.count_substring_regex(txt, "[A-Za-z]").to_numpy().astype(np.int64)
        # ---- repetition n-gram counts over dictionary-encoded tokens:
        # per-doc group keys are doc*K + gram_id (hierarchical ids keep
        # every key far inside int64), counted with one np.unique pass
        tid = pc.dictionary_encode(flat_tok).indices.to_numpy().astype(np.int64)
        V = np.int64(max(int(tid.max(initial=-1)) + 1, 1))
        doc_idx = np.repeat(np.arange(ndocs, dtype=np.int64), counts)
        uk, ck = np.unique(doc_idx * V + tid, return_counts=True)
        np.maximum.at(topw, uk // V, ck)
        adj = doc_idx[1:] == doc_idx[:-1]
        if adj.any():
            bdoc = doc_idx[:-1][adj]
            pu, pinv = np.unique(tid[:-1][adj] * V + tid[1:][adj], return_inverse=True)
            P = np.int64(pu.size)
            ukb, ckb = np.unique(bdoc * P + pinv, return_counts=True)
            np.maximum.at(topb, ukb // P, ckb)
            adj2 = adj[1:] & adj[:-1]
            if adj2.any():
                pair_full = np.full(tid.size - 1, -1, np.int64)
                pair_full[adj] = pinv
                tdoc = doc_idx[2:][adj2]
                _tu, tinv = np.unique(pair_full[:-1][adj2] * V + tid[2:][adj2], return_inverse=True)
                T = np.int64(_tu.size)
                ukt = np.unique(tdoc * T + tinv)
                np.add.at(dis3, ukt // T, 1)
                tot3 = np.bincount(tdoc, minlength=ndocs).astype(np.int64)
    mwl = np.where(n_words > 0, word_chars / np.maximum(n_words, 1), 0.0)
    ar = np.where(n_chars > 0, n_alpha / np.maximum(n_chars, 1), 0.0)
    keep = (
        (n_words >= _MIN_WORDS)
        & (mwl >= _MEAN_WL_LO)
        & (mwl <= _MEAN_WL_HI)
        & (max_wl <= _MAX_WORD_LEN)
        & (ar >= _MIN_ALPHA_RATIO)
    )
    # docs under 3 tokens have no defined repetition stats: 0.0 on both
    # sides (the oracle CASE-guards identically) so the hash stays exact
    ok = n_words >= 3
    fw = np.where(ok, topw / np.maximum(n_words, 1), 0.0)
    fb = np.where(ok, topb / np.maximum(n_words - 1, 1), 0.0)
    fd = np.where(ok, (tot3 - dis3) / np.maximum(tot3, 1), 0.0)
    rep_keep = ok & (fw <= _REP_TOP_WORD) & (fb <= _REP_TOP_BIGRAM) & (fd <= _REP_DUP_TRIGRAM)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_words": pa.array(n_words, pa.int64()),
            "max_word_len": pa.array(max_wl, pa.int64()),
            "mean_word_len": pa.array(_round(mwl), pa.float64()),
            "alpha_ratio": pa.array(_round(ar), pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
            "top_word_frac": pa.array(_round(fw), pa.float64()),
            "top_bigram_frac": pa.array(_round(fb), pa.float64()),
            "dup_trigram_frac": pa.array(_round(fd), pa.float64()),
            "rep_keep": pa.array(rep_keep, pa.bool_()),
        }
    )



def q_c4_filters(sf_dir: str):
    """Per-doc C4-style filter verdict (word count, mean/max word length,
    alphabetic-character ratio → ``keep``) PLUS Gopher-style repetition
    metrics (top-word fraction, top-bigram fraction, duplicated-trigram
    occurrence fraction → ``rep_keep``; Rae et al. 2021 §A1.1). One
    stateless vectorized map_batches — at 100 TB this runs as a pure
    streaming projection with no shuffle and no driver contact; n-gram
    counting is dictionary-encode + integer-key np.unique, never a Python
    loop over tokens (kernel: c4_flags_batch)."""
    return collect_table(_docs(sf_dir).map_batches(c4_flags_batch, batch_format="pyarrow"))


SQL_C4_FILTERS = rf"""
WITH w AS (
  SELECT doc_id, length(text) AS n_chars,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\s+')) END AS n_words,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_replace(trim(text), '\s+', '', 'g')) END AS word_chars,
    CASE WHEN trim(text) = '' THEN 0
         ELSE list_max(list_transform(regexp_split_to_array(trim(text), '\s+'), x -> length(x))) END
      AS max_word_len
  FROM documents
), tok AS (
  SELECT doc_id, u.t AS tok, u.i AS i
  FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS arr
        FROM documents WHERE trim(text) != '') d,
  LATERAL (SELECT unnest(arr) AS t, unnest(range(1, len(arr) + 1)) AS i) u
), tw AS (
  SELECT doc_id, max(c) AS topw
  FROM (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY 1, 2) GROUP BY 1
), bg AS (
  SELECT doc_id, tok, lead(tok) OVER (PARTITION BY doc_id ORDER BY i) AS nxt FROM tok
), tb AS (
  SELECT doc_id, max(c) AS topb
  FROM (SELECT doc_id, tok, nxt, count(*) AS c FROM bg WHERE nxt IS NOT NULL GROUP BY 1, 2, 3)
  GROUP BY 1
), tg AS (
  SELECT doc_id, tok, lead(tok) OVER win AS t2, lead(tok, 2) OVER win AS t3
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
), tgc AS (
  SELECT doc_id, count(*) AS tot, count(DISTINCT (tok, t2, t3)) AS dis
  FROM tg WHERE t3 IS NOT NULL GROUP BY 1
), rep AS (
  SELECT w.doc_id,
    CASE WHEN w.n_words >= 3 THEN tw.topw / w.n_words::DOUBLE ELSE 0.0 END AS fw,
    CASE WHEN w.n_words >= 3 THEN tb.topb / (w.n_words - 1)::DOUBLE ELSE 0.0 END AS fb,
    CASE WHEN w.n_words >= 3 THEN (tgc.tot - tgc.dis) / tgc.tot::DOUBLE ELSE 0.0 END AS fd
  FROM w
  LEFT JOIN tw ON tw.doc_id = w.doc_id
  LEFT JOIN tb ON tb.doc_id = w.doc_id
  LEFT JOIN tgc ON tgc.doc_id = w.doc_id
)
SELECT w.doc_id, n_words, max_word_len,
  ROUND(CASE WHEN n_words > 0 THEN word_chars::DOUBLE / n_words ELSE 0 END, 6) AS mean_word_len,
  ROUND(CASE WHEN n_chars > 0 THEN n_alpha::DOUBLE / n_chars ELSE 0 END, 6) AS alpha_ratio,
  (n_words >= {_MIN_WORDS}
   AND (CASE WHEN n_words > 0 THEN word_chars::DOUBLE / n_words ELSE 0 END)
       BETWEEN {_MEAN_WL_LO} AND {_MEAN_WL_HI}
   AND max_word_len <= {_MAX_WORD_LEN}
   AND (CASE WHEN n_chars > 0 THEN n_alpha::DOUBLE / n_chars ELSE 0 END) >= {_MIN_ALPHA_RATIO}) AS keep,
  ROUND(rep.fw, 6) AS top_word_frac,
  ROUND(rep.fb, 6) AS top_bigram_frac,
  ROUND(rep.fd, 6) AS dup_trigram_frac,
  (n_words >= 3 AND rep.fw <= {_REP_TOP_WORD} AND rep.fb <= {_REP_TOP_BIGRAM}
   AND rep.fd <= {_REP_DUP_TRIGRAM}) AS rep_keep
FROM w JOIN rep ON rep.doc_id = w.doc_id
"""


# ---- global token histogram (combiner-before-shuffle) ---------------------

_TOPK = 200
# distributed histograms memoized per corpus FILE IDENTITY (path, mtime,
# size — the _EDGE_CACHE precedent): vocab_topk and unigram_logprob share
# one pass. A path-only key serves a stale histogram after the corpus is
# regenerated in place (the oracle reads the new file → hash mismatch that
# looks like an engine bug); un-stat-able files are uncacheable.
_FREQ_CACHE: dict[tuple, pd.DataFrame] = {}


def _freq_cache_key(sf_dir: str):
    from chronoxtract_ray.stages.util import file_cache_key

    return file_cache_key(f"{sf_dir}/documents.parquet")


def _partial_token_counts(t: pa.Table) -> pa.Table:
    """Per-batch token histogram (all-Arrow split/flatten/value_counts — no
    Python string boxing): the shuffle after this moves one row per DISTINCT
    token per batch, not one per occurrence — the partial/combiner pattern
    SURVEY §4.3 prescribes."""
    import pyarrow.compute as pc

    txt = pc.fill_null(t["text"], "") if t["text"].null_count else t["text"]
    flat = pc.list_flatten(pc.utf8_split_whitespace(pc.utf8_trim_whitespace(txt)))
    flat = flat.filter(pc.not_equal(flat, ""))  # whitespace-only rows split to ['']
    vc = pc.value_counts(flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat)
    return pa.table(
        {
            "token": vc.field("values"),
            "n": vc.field("counts"),
        }
    )


def _token_counts(sf_dir: str) -> pd.DataFrame:
    """FULL distributed whitespace-token histogram, collected to the driver.
    Used only to build the unigram MODEL (q_unigram_logprob), whose contract
    is that the model is broadcastable — like any LM's vocab it must fit one
    worker's memory; a production pipeline caps it (top-V + OOV bucket)
    before broadcast. Pure top-K consumers use q_vocab_topk's bounded path
    instead."""
    key = _freq_cache_key(sf_dir)
    if key is not None and key in _FREQ_CACHE:
        return _FREQ_CACHE[key]
    ds = _docs(sf_dir)
    df = (
        collect_table(ds.map_batches(_partial_token_counts, batch_format="pyarrow").groupby("token").sum("n"))
        .to_pandas()
        .rename(columns={"sum(n)": "n"})
        .sort_values("token", kind="stable")
        .reset_index(drop=True)
    )
    if key is not None:
        _FREQ_CACHE[key] = df
    return df


def q_vocab_topk(sf_dir: str):
    """Top-K corpus vocabulary by frequency, deterministic tie-break on the
    token itself (count desc, token asc).

    The driver never sees the full vocabulary: after ``groupby(token).sum``
    every block holds a disjoint, fully-aggregated token range, so a LOCAL
    top-K per block is exact and the driver merges at most K·n_blocks rows
    — a heavy-tailed 100-TB vocabulary never materializes in one place.
    (When the full histogram is already memoized for the unigram model,
    reuse it instead of a second pass.)"""
    key = _freq_cache_key(sf_dir)
    if key is not None and key in _FREQ_CACHE:
        df = _FREQ_CACHE[key]
        out = df.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(_TOPK)
        return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)
    ds = _docs(sf_dir)

    def local_topk(t: pa.Table) -> pa.Table:
        df = t.to_pandas().rename(columns={"sum(n)": "n"})
        return from_pandas_clean(
            df.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(_TOPK)
        )

    df = collect_table(
        ds.map_batches(_partial_token_counts, batch_format="pyarrow")
        .groupby("token")
        .sum("n")
        .map_batches(local_topk, batch_format="pyarrow")
    ).to_pandas()
    out = df.sort_values(["n", "token"], ascending=[False, True], kind="stable").head(_TOPK)
    return pa.Table.from_pandas(out.reset_index(drop=True), preserve_index=False)


SQL_VOCAB_TOPK = rf"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
)
SELECT token, count(*) AS n FROM toks GROUP BY 1
ORDER BY n DESC, token LIMIT {_TOPK}
"""


# ---- unigram LM scoring (broadcast small side) -----------------------------


def q_unigram_logprob(sf_dir: str):
    """Per-doc mean unigram log-probability under the corpus's own unigram
    model — the classic LM-based quality signal. Two passes: the distributed
    histogram above, then a scoring ``map_batches`` that reads the
    vocab-sized (token → ln p) table from ONE ``ray.put`` broadcast (never
    re-shipped per batch, never joined at token granularity).

    Accumulation order is pinned for bit-exactness vs the oracle: per doc,
    terms ``count(token)·ln(p)`` add sequentially in token-ascending order
    (a vectorized-across-docs loop over the small vocab); absent tokens
    contribute ``±0.0`` which never perturbs bits."""
    import ray

    freq = _token_counts(sf_dir)  # token-ascending
    vocab = freq["token"].to_numpy()
    total = float(freq["n"].to_numpy().sum())
    lp = np.log(freq["n"].to_numpy().astype(np.float64) / total)
    # vocab ships as an Arrow array so scoring maps token->index with ONE
    # vectorized hash lookup (pc.index_in) instead of a Python dict lookup
    # per token occurrence; index_in positions == the old dict's values
    # because both are the same token-ascending vocab order
    ref = ray.put({"vocab": pa.array(vocab, pa.string()), "lp": lp})
    ds = _docs(sf_dir)

    def score(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from chronoxtract_ray.pipelines.queries_docs import _tokenized

        model = ray.get(ref)
        vocab_arr, lpv = model["vocab"], model["lp"]
        # sparse accumulation, O(token occurrences) — a dense
        # (rows x vocab) matrix is a memory bomb at real vocab sizes.
        # Bit-exactness vs the oracle is preserved: terms are applied with
        # np.add.at (unbuffered, processes strictly in the given order)
        # after a (doc, token) lexsort, i.e. sequentially token-ascending
        # per doc — identical fp order to the old dense vocab loop, whose
        # absent-token terms were ±0.0 no-ops.
        acc = np.zeros(t.num_rows, dtype=np.float64)
        n_tok = np.zeros(t.num_rows, dtype=np.int64)
        if t.num_rows:
            txt = pc.fill_null(t["text"], "") if t["text"].null_count else t["text"]
            _, flat, offsets = _tokenized(txt)
            rows = np.repeat(
                np.arange(t.num_rows, dtype=np.int64),
                np.diff(np.append(offsets, len(flat))),
            )
            keep_tok = pc.not_equal(flat, "").to_numpy(zero_copy_only=False)
        else:
            keep_tok = np.empty(0, bool)
        if keep_tok.any():
            rows = rows[keep_tok]
            toks = (
                pc.index_in(flat.filter(pa.array(keep_tok)), value_set=vocab_arr)
                .to_numpy(zero_copy_only=False)
                .astype(np.int64)
            )
            order = np.lexsort((toks, rows))
            rows_s, toks_s = rows[order], toks[order]
            run_start = np.ones(len(rows_s), dtype=bool)
            run_start[1:] = (rows_s[1:] != rows_s[:-1]) | (toks_s[1:] != toks_s[:-1])
            starts = np.flatnonzero(run_start)
            counts = np.diff(np.append(starts, len(rows_s)))
            terms = counts * lpv[toks_s[starts]]
            np.add.at(acc, rows_s[starts], terms)
            n_tok += np.bincount(rows, minlength=t.num_rows)
        keep = n_tok > 0
        mean_lp = acc[keep] / n_tok[keep]
        return pa.table(
            {
                "doc_id": t["doc_id"].filter(pa.array(keep)),
                "n_tokens": pa.array(n_tok[keep], pa.int64()),
                "mean_logprob": pa.array(_round(mean_lp), pa.float64()),
            }
        )

    return collect_table(ds.map_batches(score, batch_format="pyarrow"))


SQL_UNIGRAM_LOGPROB = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents WHERE trim(text) <> ''
), freq AS (SELECT token, count(*) AS c FROM toks GROUP BY 1),
tot AS (SELECT sum(c)::DOUBLE AS t FROM freq),
dt AS (SELECT doc_id, token, count(*) AS cd FROM toks GROUP BY 1, 2),
terms AS (
  SELECT dt.doc_id, dt.token, dt.cd, dt.cd * ln(freq.c / tot.t) AS term
  FROM dt JOIN freq USING (token) CROSS JOIN tot
)
SELECT doc_id, CAST(sum(cd) AS BIGINT) AS n_tokens,
  ROUND(list_aggregate(list(term ORDER BY token), 'sum') / sum(cd), 6) AS mean_logprob
FROM terms GROUP BY doc_id
"""


# ---- deterministic stratified sampling -------------------------------------

_SAMPLE_K = 5


def q_stratified_sample(sf_dir: str):
    """K docs per ``source`` stratum, chosen as the K smallest
    ``md5(doc_id)`` — a uniform, reproducible sample (hash order is
    independent of ingestion order, identical across workers/runs).

    Top-K-by-hash is a combiner-friendly aggregate: a LOCAL per-batch
    head(K) per stratum runs before the shuffle, so the ``groupby(source)``
    moves at most K rows per stratum per batch and the per-group final
    head sees K·n_batches rows — never the stratum's full corpus slice
    (which would have to fit one block)."""
    ds = _docs(sf_dir, columns=("doc_id", "source"))

    def local_head(t: pa.Table) -> pa.Table:
        ks = [hashlib.md5(str(d).encode()).hexdigest() for d in t["doc_id"].to_pylist()]
        df = (
            t.append_column("sample_key", pa.array(ks, pa.string()))
            .to_pandas()
            .sort_values(["sample_key", "doc_id"], kind="stable")
            .groupby("source", sort=False)
            .head(_SAMPLE_K)
        )
        return from_pandas_clean(df)

    def head(group: pa.Table) -> pa.Table:
        df = group.to_pandas().sort_values(["sample_key", "doc_id"], kind="stable").head(_SAMPLE_K)
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(local_head, batch_format="pyarrow")
        .groupby("source")
        .map_groups(head, batch_format="pyarrow")
    )
    return collect_table(out)


# The registered oracle for the 'stratified_sample' driver slot lives in
# queries_traindata.SQL_SAMPLING_POLICIES (method-tagged union of this
# top-K policy + the token-budget policy, r4); this component's selection
# is pinned against q_sampling_policies' 'topk' half in
# tests/test_traindata.py so the two can't drift.


# ---- PII scrubbing ---------------------------------------------------------
#
# Sequential pattern cascade (email → phone → number): each pattern counts
# and redacts on the PREVIOUS pattern's output, so a phone number inside an
# already-redacted email can't double-count. Declared rows-only to the
# driver (the 50-oracle check window is full), but hash-checked in pytest
# against SQL_PII_SCRUB on both real events data and a synthetic PII frame
# (tests/test_textqc.py) — promotable to the driver window as-is.

import re as _re

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d\s().-]{7,}\d"
_PII_NUMBER = r"\d+"
_PII_CASCADE = (
    ("n_email", _re.compile(_PII_EMAIL), "[EMAIL]"),
    ("n_phone", _re.compile(_PII_PHONE), "[PHONE]"),
    ("n_number", _re.compile(_PII_NUMBER), "[NUM]"),
)


def pii_scrub_batch(t: pa.Table, text_col: str = "props", key_col: str = "event_id") -> pa.Table:
    """Vectorized redaction kernel (compiled patterns at module import;
    pandas str kernels run the regex loop in C)."""
    cur = pd.Series(t[text_col].to_pylist())
    cols: dict = {key_col: t[key_col]}
    counts = []
    for name, pat, repl in _PII_CASCADE:
        c = cur.str.count(pat).to_numpy(np.int64)
        counts.append(c)
        cur = cur.str.replace(pat, repl, regex=True)
        cols[name] = pa.array(c, pa.int64())
    cols["scrubbed"] = pa.array(cur.to_numpy(), pa.string())
    cols["n_redactions"] = pa.array(np.sum(counts, axis=0), pa.int64())
    return pa.table(cols)


def q_pii_scrub(sf_dir: str):
    """Redact emails / phone numbers / digit runs from ``events.props`` —
    the PII-scrub stage every training-data pipeline runs before
    publishing. Stateless vectorized map_batches; no shuffle."""
    from chronoxtract_ray.stages.util import ensure_sort_shuffle, read_parquet_clean

    ds = ensure_sort_shuffle(
        read_parquet_clean(f"{sf_dir}/events.parquet", columns=["event_id", "props"])
    )
    return collect_table(ds.map_batches(pii_scrub_batch, batch_format="pyarrow"))


SQL_PII_SCRUB = f"""
WITH s1 AS (SELECT event_id, props,
    len(regexp_extract_all(props, '{_PII_EMAIL}')) AS n_email,
    regexp_replace(props, '{_PII_EMAIL}', '[EMAIL]', 'g') AS t1 FROM events),
s2 AS (SELECT event_id, n_email,
    len(regexp_extract_all(t1, '{_PII_PHONE}')) AS n_phone,
    regexp_replace(t1, '{_PII_PHONE}', '[PHONE]', 'g') AS t2 FROM s1),
s3 AS (SELECT event_id, n_email, n_phone,
    len(regexp_extract_all(t2, '{_PII_NUMBER}')) AS n_number,
    regexp_replace(t2, '{_PII_NUMBER}', '[NUM]', 'g') AS scrubbed FROM s2)
SELECT event_id, scrubbed, n_email, n_phone, n_number,
  n_email + n_phone + n_number AS n_redactions FROM s3
"""


# ---- multimodal decode (driver-visible demo of the real codec path) --------


def q_multimodal_features(sf_dir: str):
    """Deterministic multimodal decode as a driver query: synthesize one raw
    media payload per doc (doc_id % 4 == 0 → 8×8 PPM image, % 4 == 2 →
    the SAME class of image as a COMPRESSED PNG (real stdlib-zlib codec,
    r5), odd → 256-sample PCM16 WAV; bytes seeded from md5(doc_id) — no
    external data), then run the REAL actor-pool decode stage
    (``stages/multimodal.decode_media``, decoder='raw': pure-numpy
    PPM/PNG/WAV codecs, per-actor projection state in ``__init__``) and
    return pixel/sample-derived feature vectors.

    Rows-only to the driver (pixel math isn't SQL-expressible); the feature
    kernels' parity vs direct numpy, PNG↔PPM cross-codec feature equality
    and corrupt-payload tolerance are pinned in tests/test_multimodal.py."""
    from chronoxtract_ray.stages.multimodal import decode_media, encode_png, encode_ppm, encode_wav

    ds = _docs(sf_dir, columns=("doc_id",))

    def synth(t: pa.Table) -> pa.Table:
        ids, kinds, payloads = [], [], []
        for d in t["doc_id"].to_pylist():
            seed = int.from_bytes(hashlib.md5(str(d).encode()).digest()[:8], "little")
            rng = np.random.default_rng(seed)
            if d % 2 == 0:
                img = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
                kinds.append("image")
                payloads.append(encode_ppm(img) if d % 4 == 0 else encode_png(img))
            else:
                x = (rng.standard_normal(256) * 8000.0).astype(np.int16)
                kinds.append("audio")
                payloads.append(encode_wav(8000, x))
            ids.append(d)
        return pa.table(
            {
                # MEDIA_SCHEMA declares media_id:string (and frame_sample
                # hard-casts to string) — emit the declared type
                "media_id": pa.array([str(i) for i in ids], pa.string()),
                "kind": pa.array(kinds, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    feats = decode_media(ds.map_batches(synth, batch_format="pyarrow"), decoder="raw")

    def flatten(t: pa.Table) -> pa.Table:
        f = np.asarray(t["features"].to_pylist(), dtype=np.float64)
        cols = {
            "media_id": t["media_id"],
            "kind": t["kind"],
            "n_bytes": t["n_bytes"],
            "decode_ok": t["decode_ok"],
        }
        for k in range(f.shape[1] if f.size else 0):
            cols[f"f{k:02d}"] = pa.array(f[:, k], pa.float64())
        return pa.table(cols)

    return collect_table(feats.map_batches(flatten, batch_format="pyarrow"))
