"""Stateful Gorilla-encoding stage (actor pool).

Turns tier point rows into compressed chunk rows:
``(conv_id, chunk_start, n_points, first_window, last_window,
gorilla_timestamps:binary, gorilla_values:binary)``.

Ray Data shape: ``groupby(["conv_id", "chunk_start"]).map_groups(
GorillaEncoder, batch_format="pyarrow", concurrency=N)`` — the UDF is a
CLASS, so Ray runs it in an actor pool; each actor holds its per-partition
encoder state (reusable scratch buffers + running compression metrics)
across every chunk it encodes (north rule: "Gorilla encoders live in a
stateful actor pool carrying per-partition compression state").

Chunk boundaries are deterministic — ``chunk_start = window_start //
chunk_span * chunk_span`` — so re-runs and resumed runs produce identical
chunk rows regardless of parallelism.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chronoxtract_ray.state import gorilla

__all__ = ["GorillaEncoder", "encode_tier", "decode_chunks", "add_chunk_key"]


class GorillaEncoder:
    """Actor-pool UDF: one (conv_id, chunk) group → one compressed chunk row.

    Per-actor state: cumulative (points, raw_bytes, encoded_bytes) metrics —
    surfaced in each output row so the pipeline can aggregate compression
    stats without a side channel; scratch allocation stays warm per actor.
    """

    def __init__(self, value_col: str = "mean"):
        self.value_col = value_col
        self.points = 0
        self.raw_bytes = 0
        self.enc_bytes = 0

    def __call__(self, group: pa.Table) -> pa.Table:
        win = group["window_start"].to_numpy()
        val = group[self.value_col].to_numpy()
        order = np.argsort(win, kind="stable")
        win, val = win[order], val[order]
        ts_blob = gorilla.encode_timestamps(win)
        v_blob = gorilla.encode_values(val)
        self.points += win.size
        self.raw_bytes += 16 * win.size
        self.enc_bytes += len(ts_blob) + len(v_blob)
        return pa.table(
            {
                "conv_id": pa.array([group["conv_id"][0].as_py()], pa.string()),
                "chunk_start": pa.array([group["chunk_start"][0].as_py()], pa.int64()),
                "n_points": pa.array([win.size], pa.int64()),
                "first_window": pa.array([int(win[0])], pa.int64()),
                "last_window": pa.array([int(win[-1])], pa.int64()),
                "gorilla_timestamps": pa.array([ts_blob], pa.binary()),
                "gorilla_values": pa.array([v_blob], pa.binary()),
                "actor_points_total": pa.array([self.points], pa.int64()),
            }
        )


def add_chunk_key(tier_ds, chunk_span_us: int):
    """Vectorized chunk-key derivation (map_batches, zero-copy Arrow)."""
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        ck = pc.multiply(pc.divide(t["window_start"], chunk_span_us), chunk_span_us)
        return t.append_column("chunk_start", ck)

    return tier_ds.map_batches(fn, batch_format="pyarrow")


def encode_tier(tier_ds, width_us: int, value_col: str = "mean", points_per_chunk: int = 1024, concurrency=(1, 8)):
    """Tier points → deterministic compressed chunks via an actor pool."""
    span = width_us * points_per_chunk
    keyed = add_chunk_key(tier_ds.select_columns(["conv_id", "window_start", value_col]), span)
    return keyed.groupby(["conv_id", "chunk_start"]).map_groups(
        GorillaEncoder,
        fn_constructor_args=(value_col,),
        batch_format="pyarrow",
        concurrency=concurrency,
    )


def decode_chunks(chunks: pa.Table) -> pa.Table:
    """Chunk rows → point rows (conv_id, window_start, value); query path /
    roundtrip tests."""
    convs: list[str] = []
    wins: list[np.ndarray] = []
    vals: list[np.ndarray] = []
    for i in range(chunks.num_rows):
        w = gorilla.decode_timestamps(chunks["gorilla_timestamps"][i].as_py())
        v = gorilla.decode_values(chunks["gorilla_values"][i].as_py())
        convs.extend([str(chunks["conv_id"][i])] * w.size)
        wins.append(w)
        vals.append(v)
    return pa.table(
        {
            "conv_id": pa.array(convs, pa.string()),
            "window_start": pa.array(np.concatenate(wins) if wins else np.empty(0, np.int64), pa.int64()),
            "value": pa.array(np.concatenate(vals) if vals else np.empty(0, np.float64), pa.float64()),
        }
    )
