"""sf1.0 (10x) scaling sweep of the dedup/curation family (VERDICT r4 #8).

The families whose cost is DATA-DEPENDENT (candidate populations, cluster
sizes) can hide superlinear behavior that fixed-shape queries can't, so this
sweep times exactly those queries at sf0.1 and at a deterministic 10x
replication of it, and reports the wall-clock ratio per query.

Replication is designed so the TRUE workload scales linearly — any
superlinear wall-clock is then the engine's fault, not the data's:

* documents: 10 replicas, each under a seeded per-replica a-z/A-Z
  SUBSTITUTION CIPHER. A shared injective character map preserves every
  within-replica shingle/token relation bit-for-bit (Jaccard values, token
  counts, repetition stats are invariant), while cross-replica shingle
  overlap collapses — so near-dup pairs, LSH bucket structure and cluster
  sizes replicate exactly 10x instead of exploding quadratically the way
  verbatim copies would. doc_id offsets are multiples of 20 so the
  benchmark slice (doc_id % 20 == 0) replicates consistently.
* embeddings: 10 replicas, each rotated by a seeded ORTHOGONAL matrix
  (QR of a seeded gaussian). Rotation preserves all within-replica cosines
  exactly; cross-replica cosines concentrate near 0 (64 dims), far below
  every threshold in use.

Usage: python tools/scale_sweep.py [--regen]
Writes the 10x corpus to /tmp/ctx_sf1.0 and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = "/tmp/ctx_sf1.0"
REPLICAS = 10
DOC_STRIDE = 10_000_000  # multiple of 20: preserves the benchmark slice
QUERIES = (
    "dedup_exact",
    "minhash_neardup",
    "ngram_jaccard_pairs",
    "dedup_clusters",
    "doc_text_stats",
    "c4_filters",
    "decontaminate",
    "token_budget_sample",
    "source_mix",
    "semdedup",
    "curation_pipeline",
)


def _cipher_table(k: int) -> np.ndarray:
    """Replica-k codepoint map: a seeded permutation of a-z and A-Z,
    identity elsewhere (digits/space/punct keep the corpus' shape stats)."""
    table = np.arange(0x110000, dtype=np.uint32)
    rng = np.random.default_rng(1000 + k)
    lo = np.frombuffer("abcdefghijklmnopqrstuvwxyz".encode("utf-32-le"), dtype=np.uint32)
    up = np.frombuffer("ABCDEFGHIJKLMNOPQRSTUVWXYZ".encode("utf-32-le"), dtype=np.uint32)
    table[lo] = lo[rng.permutation(26)]
    table[up] = up[rng.permutation(26)]
    return table


def _apply_cipher(texts: list[str], table: np.ndarray) -> list[str]:
    out = []
    for t in texts:
        if t is None:  # null text is a legal corpus state (kernels fill_null)
            out.append(None)
            continue
        cp = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
        out.append(table[cp].tobytes().decode("utf-32-le"))
    return out


def regen() -> None:
    import shutil

    shutil.rmtree(DST, ignore_errors=True)
    os.makedirs(DST, exist_ok=True)
    docs = pq.read_table(f"{SRC}/documents.parquet")
    texts = docs["text"].to_pylist()
    ids = docs["doc_id"].to_numpy()
    parts = []
    for k in range(REPLICAS):
        table = _cipher_table(k)
        t = pa.table(
            {
                "doc_id": pa.array(ids + k * DOC_STRIDE, pa.int64()),
                "text": pa.array(texts if k == 0 else _apply_cipher(texts, table), pa.string()),
                "source": docs["source"],
                "lang": docs["lang"],
            }
        )
        parts.append(t)
    pq.write_table(pa.concat_tables(parts), f"{DST}/documents.parquet")

    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    vids = emb["vec_id"].to_numpy()
    col = emb["embedding"].combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    dim = flat.size // vids.size
    M = flat.reshape(vids.size, dim)
    parts = []
    for k in range(REPLICAS):
        if k == 0:
            Mk = M
        else:
            Q, _ = np.linalg.qr(np.random.default_rng(2000 + k).standard_normal((dim, dim)))
            Mk = M @ Q
        parts.append(
            pa.table(
                {
                    "vec_id": pa.array(vids + k * DOC_STRIDE, pa.int64()),
                    "embedding": pa.array(list(Mk.astype(np.float32)), pa.list_(pa.float32())),
                }
            )
        )
    pq.write_table(pa.concat_tables(parts), f"{DST}/embeddings.parquet")


def main() -> None:
    import ray

    if "--regen" in sys.argv or not os.path.exists(f"{DST}/documents.parquet"):
        regen()
    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
            include_dashboard=False,
        )
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    out = {"sf_small": SRC, "sf_big": DST, "replicas": REPLICAS, "queries": {}}
    for name in QUERIES:
        r = {}
        for tag, sf in (("small", SRC), ("big", DST)):
            t0 = time.time()
            res = qs[name](sf)
            r[f"t_{tag}"] = round(time.time() - t0, 2)
            r[f"rows_{tag}"] = res.num_rows if hasattr(res, "num_rows") else len(res)
        r["wall_ratio"] = round(r["t_big"] / max(r["t_small"], 1e-9), 2)
        r["row_ratio"] = round(r["rows_big"] / max(r["rows_small"], 1), 2)
        out["queries"][name] = r
        print(f"# {name}: {r}", file=sys.stderr)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
