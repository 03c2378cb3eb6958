"""Training-data curation beyond the dedup/QC families: benchmark
DECONTAMINATION (n-gram overlap against a held-out eval set), SOURCE MIX
statistics (the per-domain token accounting behind mixture weighting),
TOKEN-BUDGET sampling (fill a per-source token budget deterministically),
and SemDeDup-style SEMANTIC deduplication (Abbas et al. 2023 shape:
k-means clusters, then prune near-duplicates within each cluster).

Reference parity: none — like queries_docs/queries_textqc these extend
SURVEY.md §2.12's engine-side surface with the curation operators a
100-TB LLM-data pipeline runs that the reference library does not have.

Dataflow shapes (the point at scale):

* ``decontaminate``      — TWO passes over documents: pass 1 distills the
  BENCHMARK (docs with ``doc_id % 20 == 0``) into a distinct-trigram set
  (benchmark-sized by definition — eval sets are tiny next to the corpus),
  broadcast once with ``ray.put``; pass 2 is a stateless vectorized
  ``map_batches`` scoring every doc's distinct trigrams against the set.
  No shuffle touches the corpus.
* ``source_mix``         — per-batch PARTIAL (source, lang) aggregates →
  one group-count-sized ``groupby([source, lang]).sum`` shuffle → shares
  computed on the tiny aggregate table: the combiner pattern (vocab_topk
  precedent).
* ``token_budget_sample``— per-(source) hash-ordered prefix until the
  token budget fills. The local combiner keeps each batch's qualifying
  PREFIX plus one RESIDUAL-MASS MARKER row carrying the pruned suffix's
  token total, so the final per-group cumsum is exact while the shuffle
  stays budget-bounded (proof sketch in _sample_local_prune; pinned by a
  random-batch-split property test).
* ``semdedup``           — the IVF quantizer (queries_vec._ivf_centroids,
  broadcast, n_lists = ceil(n / _SEM_CLUSTER_TARGET) so expected cluster
  size is CONSTANT in corpus size) assigns every vector a cluster in one
  map_batches; ONE ``groupby(cluster)`` shuffle co-locates each in-cap
  cluster, whose near-dup scan is a tile-chunked matmul; clusters past
  _SEM_DENSE_CAP (k-means skew) are pruned by a per-cluster block
  self-join (_sem_block_prune) — no single block ever holds an oversized
  cluster, no worker holds more than two sub-blocks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

from chronoxtract_ray.stages.util import collect_table, from_pandas_clean
from chronoxtract_ray.stages.util import round_half_away as _round

from chronoxtract_ray.pipelines.queries_docs import _docs

_BENCH_MOD = 20  # benchmark = docs with doc_id % 20 == 0 (5% of the corpus)
_NGRAM = 3  # word n-gram order for contamination overlap
_BUDGET_TOKENS = 600  # per-source token budget for budget sampling
_SEM_TAU = 0.40  # within-cluster cosine near-dup threshold. Chosen off the
# data's cliff: the synthetic embeddings' within-cluster pairwise cosines
# keep min|sim - 0.40| >= 1.2e-4 at sf0.001/0.01/0.1 (measured), ~10^8x the
# engine-vs-DuckDB summation-order noise on a 64-dim dot product, so the
# unrounded >= compare is stable across engines (detect_seasonality
# precedent). Same band as embedding_neardup's 0.40.
_SEM_LISTS_MIN = 8  # floor; n_lists GROWS with the corpus (see _sem_n_lists)
_SEM_ITERS = 10
# Expected rows per IVF list: n_lists = ceil(n / TARGET) keeps the expected
# cluster size constant as the corpus grows, so the within-cluster prune
# stays bounded at 100 TB instead of scaling as corpus/8 (VERDICT r4 #2).
_SEM_CLUSTER_TARGET = 4096
# A cluster above this row count does NOT go through groupby().map_groups
# (whole-cluster-in-one-block assumption) — it routes through the block
# self-join fallback instead (queries_vec q_embedding_neardup machinery).
# Skew guard: k-means offers no balance guarantee, so a degenerate corpus
# (all vectors identical) can put everything in ONE list no matter how
# n_lists scales.
_SEM_DENSE_CAP = 8192
# Matmul tile budget for the chunked dense prune (bytes of float64).
_SEM_TILE_BYTES = 64 * (1 << 20)


def _sem_n_lists(n: int) -> int:
    """Corpus-derived IVF list count (the queries_vec._derive_n_blocks
    precedent). NOTE: the registered SQL oracle embeds the quantizer for
    n_lists == _SEM_LISTS_MIN, which this returns for every oracle-checked
    corpus (n <= _SEM_LISTS_MIN * _SEM_CLUSTER_TARGET = 32768 rows covers
    sf0.001/0.01/0.1 embeddings); past that the engine keeps scaling and
    the fixed-n_lists oracle simply no longer applies."""
    return max(_SEM_LISTS_MIN, -(-max(n, 1) // _SEM_CLUSTER_TARGET))


# ---- shared tokenization (must match the SQL oracles' regexp_split) -------


def _doc_trigrams(t: pa.Table) -> pd.DataFrame:
    """Distinct word trigrams per doc: DataFrame(d=row index, g=gram).
    Tokenization matches ``regexp_split_to_array(trim(text), '\\s+')`` on
    non-empty-trim docs (parity established by c4_filters' n_words, which
    hash-passes on the same split). Vectorized: one Arrow split, one
    object-array concat, one drop_duplicates — no per-token Python loop."""
    import pyarrow.compute as pc

    txt = pc.fill_null(t["text"], "") if t["text"].null_count else t["text"]
    tr = pc.utf8_trim_whitespace(txt)
    sp = pc.utf8_split_whitespace(tr)  # [''] for whitespace-only rows
    counts = pc.list_value_length(sp).to_numpy().astype(np.int64)
    flat = pc.list_flatten(sp)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    tok = flat.to_numpy(zero_copy_only=False)  # object array of str
    doc_idx = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
    if tok.size < _NGRAM:
        return pd.DataFrame({"d": np.empty(0, np.int64), "g": np.empty(0, object)})
    same = doc_idx[: -(_NGRAM - 1)] == doc_idx[_NGRAM - 1 :]
    # whitespace-only rows contribute a single '' token which can never
    # anchor a trigram within its doc unless the doc has >= 3 tokens — and
    # trim=='' rows have exactly one, so they drop out here like the SQL's
    # ``WHERE trim(text) != ''``
    anchors = tok.size - (_NGRAM - 1)  # slices derived from _NGRAM (ADVICE r4)
    g = tok[:anchors][same]
    for off in range(1, _NGRAM):
        g = g + " " + tok[off : anchors + off][same]
    return pd.DataFrame({"d": doc_idx[:anchors][same], "g": g}).drop_duplicates()


def _n_words(t: pa.Table) -> np.ndarray:
    """Whitespace word count per row — ONE tokenization contract for the
    whole doc family: delegates to queries_docs._tokenized (the kernel the
    SQL oracles are proven against) instead of re-deriving the
    empty-trim/[''] handling here."""
    import pyarrow.compute as pc

    from chronoxtract_ray.pipelines.queries_docs import _tokenized

    txt = pc.fill_null(t["text"], "") if t["text"].null_count else t["text"]
    n_tokens, _flat, _offsets = _tokenized(txt)
    return n_tokens


# ---- benchmark decontamination ---------------------------------------------


def _benchmark_grams(sf_dir: str) -> np.ndarray:
    """Distinct trigram vocabulary of the benchmark slice, built THROUGH
    Ray (per-batch filter + local distinct; only benchmark-sized gram sets
    reach the driver)."""
    import pyarrow.compute as pc

    def bench_batch(t: pa.Table) -> pa.Table:
        # numpy mask: pyarrow.compute ships no modulo kernel to keep this
        # in-Arrow (VERDICT r4 "cosmetic" note checked and found inapplicable)
        sel = t.filter(pa.array(t["doc_id"].to_numpy() % _BENCH_MOD == 0))
        df = _doc_trigrams(sel)
        return pa.table({"g": pa.array(df["g"].unique(), pa.string())})

    tbl = collect_table(_docs(sf_dir).map_batches(bench_batch, batch_format="pyarrow"))
    if tbl.num_rows == 0:
        return np.empty(0, object)
    return pd.unique(tbl["g"].to_numpy(zero_copy_only=False))


def decontaminate_batch(t: pa.Table, bench: set) -> pa.Table:
    """Per-doc contamination scores against a broadcast benchmark gram set.
    Row-aligned with the input batch (doc_text_stats fusion contract)."""
    n = t.num_rows
    doc_id = t["doc_id"].to_numpy()
    n_grams = np.zeros(n, np.int64)
    n_overlap = np.zeros(n, np.int64)
    df = _doc_trigrams(t)
    if len(df):
        per = df.groupby("d", sort=False).size()
        n_grams[per.index.to_numpy()] = per.to_numpy()
        hit = df["g"].isin(bench).to_numpy()
        if hit.any():
            ov = df.loc[hit].groupby("d", sort=False).size()
            n_overlap[ov.index.to_numpy()] = ov.to_numpy()
    is_bench = doc_id % _BENCH_MOD == 0
    rate = n_overlap / np.maximum(n_grams, 1)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "is_benchmark": pa.array(is_bench, pa.bool_()),
            "n_trigrams": pa.array(n_grams, pa.int64()),
            "n_bench_overlap": pa.array(n_overlap, pa.int64()),
            "bench_overlap_rate": pa.array(_round(rate), pa.float64()),
            "contaminated": pa.array((~is_bench) & (n_overlap > 0), pa.bool_()),
        }
    )


def q_decontaminate(sf_dir: str):
    """Benchmark decontamination: flag corpus docs sharing any word trigram
    with the held-out benchmark slice (train/test overlap removal — the
    standard pre-training hygiene pass). Broadcast-set + stateless scan;
    also fused into doc_text_stats for the driver's hash check."""
    import ray

    bench = _benchmark_grams(sf_dir)
    ref = ray.put(set(bench.tolist()))

    def score(t: pa.Table) -> pa.Table:
        return decontaminate_batch(t, ray.get(ref))

    return collect_table(_docs(sf_dir).map_batches(score, batch_format="pyarrow"))


SQL_DECONTAMINATE = f"""
WITH d AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS arr
  FROM documents WHERE trim(text) != ''
), tok AS (
  SELECT doc_id, u.t AS tok, u.i AS i
  FROM d, LATERAL (SELECT unnest(arr) AS t, unnest(range(1, len(arr) + 1)) AS i) u
), tg AS (
  SELECT doc_id,
    tok || ' ' || lead(tok) OVER win || ' ' || lead(tok, 2) OVER win AS g,
    lead(tok, 2) OVER win AS t3
  FROM tok WINDOW win AS (PARTITION BY doc_id ORDER BY i)
), dg AS (
  SELECT DISTINCT doc_id, g FROM tg WHERE t3 IS NOT NULL
), bench AS (
  SELECT DISTINCT g FROM dg WHERE doc_id % {_BENCH_MOD} = 0
), per AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
    CAST(count(*) FILTER (WHERE g IN (SELECT g FROM bench)) AS BIGINT) AS n_bench_overlap
  FROM dg GROUP BY 1
)
SELECT doc.doc_id, (doc.doc_id % {_BENCH_MOD} = 0) AS is_benchmark,
  CAST(coalesce(per.n_trigrams, 0) AS BIGINT) AS n_trigrams,
  CAST(coalesce(per.n_bench_overlap, 0) AS BIGINT) AS n_bench_overlap,
  ROUND(coalesce(per.n_bench_overlap, 0) /
        GREATEST(coalesce(per.n_trigrams, 0), 1)::DOUBLE, 6) AS bench_overlap_rate,
  (doc.doc_id % {_BENCH_MOD} != 0 AND coalesce(per.n_bench_overlap, 0) > 0) AS contaminated
FROM documents doc LEFT JOIN per ON per.doc_id = doc.doc_id
"""


# ---- source mixture statistics ---------------------------------------------


def q_source_mix(sf_dir: str):
    """Per-(source, lang) doc/token accounting + corpus shares — the
    numbers behind data-mixture weighting. Combiner pattern: per-batch
    pandas groupby partials, then one tiny groupby([source, lang]) shuffle;
    shares derive from the aggregate table's own integer totals (summation
    order irrelevant: int64 adds are associative)."""
    ds = _docs(sf_dir, columns=("doc_id", "text", "source", "lang"))

    def partial(t: pa.Table) -> pa.Table:
        nw = _n_words(t)
        df = pd.DataFrame(
            {
                "source": t["source"].to_numpy(zero_copy_only=False),
                "lang": t["lang"].to_numpy(zero_copy_only=False),
                "n_tokens": nw,
            }
        )
        g = df.groupby(["source", "lang"], sort=False).agg(
            n_docs=("n_tokens", "size"), n_tokens=("n_tokens", "sum")
        )
        g = g.reset_index()
        return from_pandas_clean(g)

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["source", "lang"])
        .aggregate(Sum("n_docs"), Sum("n_tokens"))
    )
    tbl = collect_table(agg)
    n_docs = tbl["sum(n_docs)"].to_numpy().astype(np.int64)
    n_tokens = tbl["sum(n_tokens)"].to_numpy().astype(np.int64)
    td, tt = n_docs.sum(), n_tokens.sum()
    return pa.table(
        {
            "source": tbl["source"],
            "lang": tbl["lang"],
            "n_docs": pa.array(n_docs, pa.int64()),
            "n_tokens": pa.array(n_tokens, pa.int64()),
            "mean_tokens": pa.array(_round(n_tokens / np.maximum(n_docs, 1)), pa.float64()),
            "doc_share": pa.array(_round(n_docs / max(td, 1)), pa.float64()),
            "token_share": pa.array(_round(n_tokens / max(tt, 1)), pa.float64()),
        }
    )


SQL_SOURCE_MIX = """
WITH w AS (
  SELECT source, lang,
    CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS nw
  FROM documents
), g AS (
  SELECT source, lang, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(nw) AS BIGINT) AS n_tokens
  FROM w GROUP BY 1, 2
), t AS (
  SELECT CAST(sum(n_docs) AS BIGINT) AS td, CAST(sum(n_tokens) AS BIGINT) AS tt FROM g
)
SELECT source, lang, n_docs, n_tokens,
  ROUND(n_tokens / GREATEST(n_docs, 1)::DOUBLE, 6) AS mean_tokens,
  ROUND(n_docs / GREATEST(t.td, 1)::DOUBLE, 6) AS doc_share,
  ROUND(n_tokens / GREATEST(t.tt, 1)::DOUBLE, 6) AS token_share
FROM g, t
"""


# ---- token-budget sampling --------------------------------------------------


def _doc_sample_stream(sf_dir: str):
    """(source, doc_id, sample_key, n_tokens) stream: md5(doc_id) hash key
    (stratified_sample's key, so hash-order parity is already proven) plus
    the c4-semantics token count."""
    ds = _docs(sf_dir, columns=("doc_id", "text", "source"))

    def prep(t: pa.Table) -> pa.Table:
        dids = t["doc_id"].to_numpy()
        # doc_id=-1 is the residual-mass marker sentinel downstream
        # (_sample_local_prune / _sample_final); a negative REAL doc_id
        # would silently corrupt rank and selection (ADVICE r4)
        if dids.size and dids.min() < 0:
            raise ValueError("sampling requires non-negative doc_id (doc_id=-1 is the marker sentinel)")
        ks = [hashlib.md5(str(d).encode()).hexdigest() for d in dids.tolist()]
        return pa.table(
            {
                "source": t["source"],
                "doc_id": t["doc_id"],
                "sample_key": pa.array(ks, pa.string()),
                "n_tokens": pa.array(_n_words(t), pa.int64()),
            }
        )

    return ds.map_batches(prep, batch_format="pyarrow")


def _sample_local_prune(t: pa.Table, k: int, budget: int) -> pa.Table:
    """Per-batch combiner for BOTH sampling policies. Keeps, per source,
    the batch's hash-order prefix qualifying under either rule (rank <= k
    OR batch-cum <= budget) plus one residual-mass MARKER row (doc_id=-1,
    sample_key = first pruned key, n_tokens = pruned token total).

    Exactness argument: both rules are monotone prefix rules, so pruned
    rows form a SUFFIX of each batch's hash order. Every globally
    qualifying row's predecessors therefore all survive (its global rank /
    cum bounds theirs), so qualifying rows' final cums are exact. A pruned
    suffix's mass is re-injected at its first key, which sorts AFTER every
    globally qualifying row (a pruned row's batch-cum > budget bounds any
    qualifying row's global cum below its own), so markers only inflate
    already-disqualified rows — never a false positive, never a false
    negative. Pinned by the random-batch-split property test."""
    df = (
        t.to_pandas()
        .sort_values(["sample_key", "doc_id"], kind="stable")
        .reset_index(drop=True)
    )
    g = df.groupby("source", sort=False)
    rank = g.cumcount().to_numpy()
    cum = g["n_tokens"].cumsum().to_numpy()
    keep = (rank < k) | (cum <= budget)
    pruned = df[~keep]
    out = df[keep]
    if len(pruned):
        m = pruned.groupby("source", sort=False).agg(
            sample_key=("sample_key", "first"), n_tokens=("n_tokens", "sum")
        )
        m = m.reset_index()
        m["doc_id"] = np.int64(-1)
        out = pd.concat([out, m[["source", "doc_id", "sample_key", "n_tokens"]]], ignore_index=True)
    return from_pandas_clean(out)


def _sample_final(group: pa.Table, k: int, budget: int) -> pd.DataFrame:
    """Per-source finalization: exact global rank/cum over survivors+markers
    (see _sample_local_prune), returning rows tagged by qualifying policy."""
    df = (
        group.to_pandas()
        .sort_values(["sample_key", "doc_id"], kind="stable")
        .reset_index(drop=True)
    )
    cum = df["n_tokens"].cumsum().to_numpy()  # markers included: exact mass
    real = (df["doc_id"] >= 0).to_numpy()
    rank = np.cumsum(real) - 1  # rank among real rows only
    df["cum_tokens"] = cum
    parts = []
    topk = df[real & (rank < k)].copy()
    topk.insert(0, "method", "topk")
    parts.append(topk)
    bud = df[real & (cum <= budget)].copy()
    bud.insert(0, "method", "budget")
    parts.append(bud)
    return pd.concat(parts, ignore_index=True)


def q_token_budget_sample(sf_dir: str, budget: int = _BUDGET_TOKENS):
    """Deterministic per-source token-budget fill: docs in md5-hash order
    until the source's cumulative token count exceeds ``budget`` — the
    fixed-token-mixture sampling a data-curation pipeline runs after
    weighting. Output is budget-bounded per source regardless of corpus
    size; the shuffle is bounded by the combiner (see _sample_local_prune)."""
    ds = _doc_sample_stream(sf_dir)

    def prune(t: pa.Table) -> pa.Table:
        return _sample_local_prune(t, 0, budget)

    def final(group: pa.Table) -> pa.Table:
        df = _sample_final(group, 0, budget)
        df = df[df["method"] == "budget"].drop(columns=["method"])
        return pa.Table.from_pandas(df, preserve_index=False)

    out = (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )
    return collect_table(out)


SQL_TOKEN_BUDGET_SAMPLE = f"""
WITH w AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *, CAST(sum(n_tokens) OVER (
      PARTITION BY source ORDER BY sample_key, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM w
)
SELECT source, doc_id, sample_key, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
"""


def _sample_k_default() -> int:
    """stratified_sample's K — referenced, not duplicated, so the union's
    topk half can never drift from the component query."""
    from chronoxtract_ray.pipelines.queries_textqc import _SAMPLE_K

    return _SAMPLE_K


def q_sampling_policies(sf_dir: str, k: int | None = None, budget: int = _BUDGET_TOKENS):
    """BOTH deterministic sampling policies as one method-tagged query
    (knn_ann precedent): 'topk' = stratified_sample's K-smallest-hash rows
    per source (same selection, now with token accounting), 'budget' = the
    token-budget prefix. One read, one combiner, one shuffle for both.
    NOTE: SQL_SAMPLING_POLICIES is built for the DEFAULTS (k=_SAMPLE_K,
    budget=_BUDGET_TOKENS); non-default arguments are for library callers
    and have no registered oracle."""
    if k is None:
        k = _sample_k_default()
    ds = _doc_sample_stream(sf_dir)

    def prune(t: pa.Table) -> pa.Table:
        return _sample_local_prune(t, k, budget)

    def final(group: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(_sample_final(group, k, budget), preserve_index=False)

    out = (
        ds.map_batches(prune, batch_format="pyarrow")
        .groupby("source")
        .map_groups(final, batch_format="pyarrow")
    )
    return collect_table(out)


def _sampling_policies_sql() -> str:
    return f"""
WITH w AS (
  SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS sample_key,
    CAST(CASE WHEN trim(text) = '' THEN 0
         ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT *,
    row_number() OVER (PARTITION BY source ORDER BY sample_key, doc_id) AS rn,
    CAST(sum(n_tokens) OVER (
      PARTITION BY source ORDER BY sample_key, doc_id
      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
  FROM w
)
SELECT 'topk' AS method, source, doc_id, sample_key, n_tokens, cum_tokens
FROM c WHERE rn <= {_sample_k_default()}
UNION ALL
SELECT 'budget' AS method, source, doc_id, sample_key, n_tokens, cum_tokens
FROM c WHERE cum_tokens <= {_BUDGET_TOKENS}
"""


SQL_SAMPLING_POLICIES = _sampling_policies_sql()


# ---- SemDeDup-style semantic deduplication ----------------------------------


def _sem_max_lower_dense(ids: np.ndarray, Mn: np.ndarray) -> np.ndarray:
    """Per-vector max cosine to a LOWER-id member of the same (id-sorted)
    normalized matrix, -inf when none. Chunked over columns so the live
    similarity tile is ~_SEM_TILE_BYTES regardless of cluster size (the
    old full n_c x n_c ``np.triu`` materialization was the r4 OOM finding)."""
    n = ids.size
    max_lower = np.full(n, -np.inf)
    step = max(1, _SEM_TILE_BYTES // max(8 * n, 1))
    for s in range(0, n, step):
        e = min(s + step, n)
        S = Mn @ Mn[s:e].T  # (n, chunk): S[i, k] = sim(i, s + k)
        mask = np.arange(n)[:, None] < np.arange(s, e)[None, :]  # strict lower ids
        max_lower[s:e] = np.where(mask, S, -np.inf).max(axis=0)
    return max_lower


def _sem_finalize(ids, clusters, max_lower) -> pa.Table:
    has_lower = np.isfinite(max_lower)
    return pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "cluster": pa.array(clusters, pa.int64()),
            "is_dup": pa.array(has_lower & (max_lower >= _SEM_TAU), pa.bool_()),
            "max_sim_lower": pa.array(
                _round(np.where(has_lower, max_lower, 0.0)), pa.float64()
            ),
        }
    )


def _sem_block_prune(big_ds, sizes: dict, cap: int):
    """Oversized-cluster fallback: a BLOCK SELF-JOIN inside each cluster
    (q_embedding_neardup's two-block task machinery re-targeted at the
    max-sim-to-lower-id reduction). Members of each oversized cluster are
    normalized once and staged as (cluster, block) parquet; the
    B(B+1)/2-per-cluster block-pair tasks each read two blocks, emit
    per-vector PARTIAL maxes (both orientations of a cross pair), and a
    groupby(vec_id) max over partials + a -2.0 sentinel row per member
    (cosine >= -1, so max > -1.5 <=> some lower-id mate exists) reconstructs
    exactly the dense path's (is_dup, max_sim_lower). No task ever holds
    more than two blocks; no group ever holds a whole cluster. Block
    assignment HASHES the id (splitmix-style multiply-shift) before the
    modulo so residue-structured id spaces (stride-replicated corpora)
    can't collapse a cluster into one block, and a driver-built footer
    manifest of per-(cluster, block) row counts is validated inside every
    score task — a staging path invisible to a worker (mis-pointed
    CTX_SCRATCH_DIR on multi-node) raises instead of silently reporting
    is_dup=False (r5 review findings #1/#2)."""
    import glob
    import os
    import shutil
    import tempfile

    import ray
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    from chronoxtract_ray.pipelines.queries_vec import _TILE_BUDGET_BYTES, _to_matrix

    nb = {int(c): -(-int(n) // cap) for c, n in sizes.items()}
    nb_ref = ray.put(nb)
    scratch_root = os.environ.get("CTX_SCRATCH_DIR")
    tmp = tempfile.mkdtemp(prefix="ctx_semdedup_blocks_", dir=scratch_root)

    def norm_block(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        cl = t["cluster"].to_numpy()
        nbm = ray.get(nb_ref)
        # hash before modulo: a bare ids % B puts a residue-class-structured
        # id space (e.g. stride-k replication) entirely into one block
        h = (ids.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(17)
        blocks = (h % np.array([nbm[int(c)] for c in cl], dtype=np.uint64)).astype(np.int64)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array(list(Mn), pa.list_(pa.float64())),
                "cluster": pa.array(cl, pa.int64()),
                "block": pa.array(blocks, pa.int64()),
            }
        )

    try:
        big_ds.map_batches(norm_block, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["cluster", "block"]
        )

        # driver-built manifest from parquet FOOTERS (metadata reads only):
        # per-(cluster, block) row counts, cross-checked against the known
        # oversized-member total so a torn stage fails HERE, and validated
        # again inside every score task so a worker that cannot see the
        # staging path fails LOUDLY instead of scoring empty blocks
        manifest: dict[tuple, int] = {}
        import pyarrow.parquet as _pqm

        for f in glob.glob(f"{tmp}/cluster=*/block=*/*.parquet"):
            parts = f.split(os.sep)
            c = int(parts[-3].split("=")[1])
            b = int(parts[-2].split("=")[1])
            manifest[(c, b)] = manifest.get((c, b), 0) + _pqm.ParquetFile(f).metadata.num_rows
        expected_total = sum(int(n) for n in sizes.values())
        staged_total = sum(manifest.values())
        if staged_total != expected_total:
            raise RuntimeError(
                f"semdedup block stage torn: staged {staged_total} rows vs "
                f"{expected_total} oversized-cluster members under {tmp}"
            )
        man_ref = ray.put(manifest)

        def _read_block(c: int, b: int):
            import pyarrow.parquet as pq

            expected = ray.get(man_ref).get((c, b), 0)
            files = sorted(glob.glob(f"{tmp}/cluster={c}/block={b}/*.parquet"))
            if not files:
                if expected:
                    raise RuntimeError(
                        f"semdedup score task cannot see staged block "
                        f"cluster={c}/block={b} ({expected} rows) under {tmp} — "
                        "is CTX_SCRATCH_DIR cluster-visible?"
                    )
                return np.array([], np.int64), np.zeros((0, 1), np.float64)
            t = pa.concat_tables([pq.read_table(f, columns=["vec_id", "embedding"]) for f in files])
            ids, M = _to_matrix(t)
            if ids.size != expected:
                raise RuntimeError(
                    f"semdedup staged block cluster={c}/block={b} read "
                    f"{ids.size} rows, manifest says {expected}"
                )
            return ids, M

        def score(t: pa.Table) -> pa.Table:
            outs = [pa.table({"vec_id": pa.array([], pa.int64()),
                              "cluster": pa.array([], pa.int64()),
                              "p": pa.array([], pa.float64())})]
            for c, bi, bj in zip(
                t["cluster"].to_pylist(), t["bi"].to_pylist(), t["bj"].to_pylist()
            ):
                ids_i, Mi = _read_block(c, bi)
                ids_j, Mj = (ids_i, Mi) if bj == bi else _read_block(c, bj)
                if not ids_i.size or not ids_j.size:
                    continue
                step = max(1, _TILE_BUDGET_BYTES // max(8 * ids_j.size, 1))
                vids, ps = [], []
                for s in range(0, ids_i.size, step):
                    S = Mi[s : s + step] @ Mj.T  # (chunk_i, n_j)
                    ci = ids_i[s : s + step]
                    # j-side partials: max over lower-id i rows
                    mj = np.where(ci[:, None] < ids_j[None, :], S, -np.inf).max(axis=0)
                    vids.append(ids_j)
                    ps.append(mj)
                    if bj != bi:
                        # i-side partials: max over lower-id j columns (self
                        # pairs are symmetric — one orientation suffices)
                        mi = np.where(ids_j[None, :] < ci[:, None], S, -np.inf).max(axis=1)
                        vids.append(ci)
                        ps.append(mi)
                v = np.concatenate(vids)
                p = np.concatenate(ps)
                fin = np.isfinite(p)
                outs.append(
                    pa.table(
                        {
                            "vec_id": pa.array(v[fin], pa.int64()),
                            "cluster": pa.array(np.full(fin.sum(), c, np.int64), pa.int64()),
                            "p": pa.array(p[fin], pa.float64()),
                        }
                    )
                )
            return pa.concat_tables(outs)

        tasks = [
            {"cluster": c, "bi": i, "bj": j}
            for c, B in nb.items()
            for i in range(B)
            for j in range(i, B)
        ]
        partials = rd.from_items(tasks, override_num_blocks=len(tasks)).map_batches(
            score, batch_format="pyarrow", batch_size=1
        )

        def sentinel(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "vec_id": t["vec_id"],
                    "cluster": t["cluster"],
                    "p": pa.array(np.full(t.num_rows, -2.0), pa.float64()),
                }
            )

        agg = (
            partials.union(big_ds.map_batches(sentinel, batch_format="pyarrow"))
            .groupby("vec_id")
            .aggregate(Max("p"), Min("cluster"))
        )
        tbl = collect_table(agg)  # oversized-cluster member count, not corpus
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    ml = tbl["max(p)"].to_numpy()
    return _sem_finalize(
        tbl["vec_id"].to_numpy(),
        tbl["min(cluster)"].to_numpy(),
        np.where(ml > -1.5, ml, -np.inf),
    )


def q_semdedup(sf_dir: str):
    """Semantic near-dup pruning (SemDeDup shape): assign every embedding
    to its IVF cluster (shared quantizer: queries_vec._ivf_centroids,
    n_lists derived from corpus size so clusters stay ~constant-sized at
    any scale), then within each cluster mark vec v a duplicate iff some
    lower-id member u has cosine(u, v) >= {tau}. Keep-lowest-id is the
    deterministic stand-in for SemDeDup's keep-one-per-neighborhood.
    Clusters within _SEM_DENSE_CAP prune in-group with a tile-chunked
    matmul; oversized clusters (k-means skew) route through the block
    self-join fallback (_sem_block_prune) instead of OOMing a single
    worker. Output: per-vec cluster, is_dup flag, and the max similarity
    to a lower-id cluster-mate.""".format(tau=_SEM_TAU)
    import ray

    from chronoxtract_ray.pipelines.queries_vec import _emb, _ivf_centroids, _to_matrix

    ds = _emb(sf_dir)
    n_vecs = ds.count()  # parquet metadata, no scan
    n_lists = _sem_n_lists(n_vecs)
    C = _ivf_centroids(ds, n_lists, _SEM_ITERS)
    ref = ray.put(C)

    def assign(t: pa.Table) -> pa.Table:
        ids, M = _to_matrix(t)
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        lab = np.argmax(Mn @ ray.get(ref).T, axis=1).astype(np.int64)
        return t.append_column("cluster", pa.array(lab, pa.int64()))

    assigned = ds.map_batches(assign, batch_format="pyarrow")
    if n_vecs <= _SEM_DENSE_CAP:
        # no cluster can exceed the cap when the whole corpus fits under it:
        # skip the census (one shuffle) and the materialize (single consumer)
        sizes, big = {}, set()
    else:
        # materialized: consumed by the size census + one or two prune paths
        assigned = assigned.materialize()
        sizes_tbl = collect_table(assigned.groupby("cluster").count())  # n_lists rows
        sizes = dict(
            zip(sizes_tbl["cluster"].to_pylist(), sizes_tbl["count()"].to_pylist())
        )
        big = {c for c, n in sizes.items() if n > _SEM_DENSE_CAP}
    big_ref = ray.put(np.array(sorted(big), dtype=np.int64))

    def take_small(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(~np.isin(t["cluster"].to_numpy(), ray.get(big_ref))))

    def take_big(t: pa.Table) -> pa.Table:
        return t.filter(pa.array(np.isin(t["cluster"].to_numpy(), ray.get(big_ref))))

    def prune(group: pa.Table) -> pa.Table:
        if group.num_rows > _SEM_DENSE_CAP:
            # routing above guarantees this; a clear error beats a silent OOM
            raise RuntimeError(
                f"semdedup dense prune got a {group.num_rows}-row cluster "
                f"(> cap {_SEM_DENSE_CAP}); oversized clusters must route "
                "through _sem_block_prune"
            )
        ids, M = _to_matrix(group)
        order = np.argsort(ids, kind="stable")
        ids, M = ids[order], M[order]
        Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
        max_lower = _sem_max_lower_dense(ids, Mn)
        return _sem_finalize(
            ids, np.repeat(group["cluster"][0].as_py(), ids.size), max_lower
        )

    small_out = collect_table(
        assigned.map_batches(take_small, batch_format="pyarrow")
        .groupby("cluster")
        .map_groups(prune, batch_format="pyarrow")
    )
    if not big:
        return small_out
    big_out = _sem_block_prune(
        assigned.map_batches(take_big, batch_format="pyarrow"),
        {c: sizes[c] for c in big},
        _SEM_DENSE_CAP,
    )
    if small_out.num_rows == 0:  # every cluster oversized: schema-less empty
        return big_out
    return pa.concat_tables([small_out, big_out])


def _semdedup_sql() -> str:
    from chronoxtract_ray.pipelines.queries_vec import _kmeans_assign_sql

    return (
        # oracle quantizer is generated for the n_lists FLOOR — exactly what
        # _sem_n_lists yields for every oracle-checked corpus (see its doc)
        _kmeans_assign_sql(_SEM_LISTS_MIN, _SEM_ITERS)
        + f""",
pairs AS (
  SELECT b.vec_id AS vb, list_cosine_similarity(ea.emb, eb.emb) AS sim
  FROM vl a JOIN vl b ON b.k = a.k AND b.vec_id > a.vec_id
  JOIN e ea ON ea.vec_id = a.vec_id
  JOIN e eb ON eb.vec_id = b.vec_id
), dup AS (
  SELECT vb AS vec_id, max(sim) AS ms FROM pairs GROUP BY 1
)
SELECT v.vec_id, CAST(v.k AS BIGINT) AS cluster,
  (coalesce(d.ms, -2.0) >= {_SEM_TAU}) AS is_dup,
  ROUND(coalesce(d.ms, 0.0), 6) AS max_sim_lower
FROM vl v LEFT JOIN dup d ON d.vec_id = v.vec_id"""
    )


SQL_SEMDEDUP = _semdedup_sql()


# ---- composed curation pipeline ---------------------------------------------


def q_curation_pipeline(sf_dir: str):
    """The end-to-end keep/drop decision a curation run produces: quality
    filters -> repetition filters -> benchmark decontamination -> exact
    dedup -> MinHash near-dup, with the FIRST failing stage as the drop
    reason (the standard funnel ordering: cheap stateless filters first,
    shuffle-bearing dedup last). Re-expressed distributed in r5 (VERDICT r4
    #1): the three stateless per-doc stages (C4+Gopher flags, decontamination
    scoring, md5 fingerprint) FUSE into ONE corpus pass — the corpus pays the
    Python-loop md5 exactly once for the whole funnel (VERDICT r4 #6) — the
    exact-dedup keeper derives from that same materialized base via a native
    Min aggregate, and the keeper table reaches each doc through a Ray
    ``Dataset.join`` hash join on the fingerprint (the
    _exact_jaccard_edges precedent), so NO corpus-sized table ever lands on
    the driver: the only collected artifacts are the near-dup doc_b id set
    (near-dup-population-sized, broadcast once via ray.put) and the final
    (doc_id, kept, drop_reason) result. Kernels are the SAME per-batch
    functions the hash-proven component queries run (c4_flags_batch,
    decontaminate_batch, doc_fingerprint_batch), so no arithmetic is
    re-derived; outputs are bools/strings only, representation-cliff-free.
    Dedup keep policy: lowest doc_id survives (exact: the groupby-min
    keeper; near-dup: a doc is dropped iff it appears as doc_b in a
    verified pair — pairs are emitted doc_a < doc_b)."""
    import ray
    from ray.data.aggregate import Min

    from chronoxtract_ray.pipelines.queries_docs import (
        _minhash_pairs_ds,
        doc_fingerprint_batch,
    )
    from chronoxtract_ray.pipelines.queries_textqc import c4_flags_batch

    bench_ref = ray.put(set(_benchmark_grams(sf_dir).tolist()))

    def base(t: pa.Table) -> pa.Table:
        c4 = c4_flags_batch(t)
        dec = decontaminate_batch(t, ray.get(bench_ref))
        fp = doc_fingerprint_batch(t)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "keep": c4["keep"],
                "rep_keep": c4["rep_keep"],
                "contaminated": dec["contaminated"],
                "fingerprint": fp["fingerprint"],
            }
        )

    # materialized so its TWO consumers (keeper aggregate, final join) don't
    # re-run the fused pass; rows are (int64, 3 bools, 32-char hash) — far
    # smaller than the corpus text, and object-store blocks spill, not driver
    base_ds = _docs(sf_dir).map_batches(base, batch_format="pyarrow").materialize()
    n_docs = base_ds.count()
    n_parts = max(2, min(64, n_docs // 65536 + 1))

    keepers = base_ds.groupby("fingerprint").aggregate(Min("doc_id"))

    def rename_keeper(t: pa.Table) -> pa.Table:
        return pa.table(
            {"content_hash": t["fingerprint"], "keeper_doc_id": t["min(doc_id)"].cast(pa.int64())}
        )

    keeper_ds = keepers.map_batches(rename_keeper, batch_format="pyarrow")

    # near-dup drop set: distinct doc_b over verified pairs — the pair
    # population, NOT the corpus; small enough to broadcast (same argument
    # as the benchmark gram set)
    nd_tbl = collect_table(
        _minhash_pairs_ds(sf_dir, min_sig_jaccard=0.5).select_columns(["doc_b"])
    )
    nd_ref = ray.put(np.unique(nd_tbl["doc_b"].to_numpy()) if nd_tbl.num_rows else np.empty(0, np.int64))

    joined = base_ds.join(
        keeper_ds, join_type="inner", num_partitions=n_parts,
        on=("fingerprint",), right_on=("content_hash",),
    )

    def reasons(t: pa.Table) -> pa.Table:
        doc_id = t["doc_id"].to_numpy()
        keep = t["keep"].to_numpy(zero_copy_only=False)
        rep = t["rep_keep"].to_numpy(zero_copy_only=False)
        cont = t["contaminated"].to_numpy(zero_copy_only=False)
        exact_dup = doc_id != t["keeper_doc_id"].to_numpy()
        near_dup = np.isin(doc_id, ray.get(nd_ref))
        reason = np.select(
            [~keep, ~rep, cont, exact_dup, near_dup],
            ["quality", "repetition", "contaminated", "exact_dup", "near_dup"],
            default="kept",
        )
        return pa.table(
            {
                "doc_id": pa.array(doc_id, pa.int64()),
                "kept": pa.array(reason == "kept", pa.bool_()),
                "drop_reason": pa.array(reason, pa.string()),
            }
        )

    return collect_table(joined.map_batches(reasons, batch_format="pyarrow"))


def _curation_sql() -> str:
    from chronoxtract_ray.pipelines.queries_docs import SQL_DEDUP_EXACT, SQL_MINHASH_NEARDUP
    from chronoxtract_ray.pipelines.queries_textqc import SQL_C4_FILTERS

    return f"""
SELECT j.doc_id,
  (j.keep AND j.rep_keep AND NOT j.contaminated
   AND NOT j.exact_dup AND NOT j.near_dup) AS kept,
  CASE WHEN NOT j.keep THEN 'quality'
       WHEN NOT j.rep_keep THEN 'repetition'
       WHEN j.contaminated THEN 'contaminated'
       WHEN j.exact_dup THEN 'exact_dup'
       WHEN j.near_dup THEN 'near_dup'
       ELSE 'kept' END AS drop_reason
FROM (
  SELECT c4.doc_id, c4.keep, c4.rep_keep, dec.contaminated,
    (dup.keeper_doc_id != c4.doc_id) AS exact_dup,
    (nd.doc_b IS NOT NULL) AS near_dup
  FROM ({SQL_C4_FILTERS}) c4
  JOIN ({SQL_DECONTAMINATE}) dec USING (doc_id)
  JOIN documents d ON d.doc_id = c4.doc_id
  JOIN ({SQL_DEDUP_EXACT}) dup ON dup.content_hash = md5(d.text)
  LEFT JOIN (SELECT DISTINCT doc_b FROM ({SQL_MINHASH_NEARDUP})) nd
    ON nd.doc_b = c4.doc_id
) j
"""


SQL_CURATION_PIPELINE = _curation_sql()
