"""Temporal-join operators the Dataset API lacks as primitives — expressed
as compositions the brief prescribes (map_batches + groupby().map_groups):

- ``sessionize``: windowed aggregate / session split (gap > 2 h starts a new
  session) — one groupby(user), sessions built vectorized per group.
- ``asof_join``: each event joined to the most recent COMPLETED hourly
  rollup of its own user (hour_end <= ts) — the classic as-of join, oracled
  by DuckDB's native ASOF JOIN.
- ``range_join``: interval join across adjacent users — user u's sessions
  counted against user u+1's raw events (``ts BETWEEN start AND end``).
  Implemented by the key-duplication pattern: each event is emitted into at
  most TWO pair groups (as "self" for pair u, as "neighbor" for pair u-1),
  then ONE hash shuffle co-locates every pair; no broadcast, no cross join.

Partitioning assumption (all three): a user's full series fits one group —
the same assumption the rollup/cascade stages document. At 100 TB the groupby
is the only all-to-all exchange; the range join doubles the shuffled rows
(bounded 2x fan-out), which is the documented cost of interval co-location.

Float policy matches the suite: 6-dp half-away-from-zero rounding on both
sides (see queries_events._round), integer microsecond timestamps.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from chronoxtract_ray.stages.util import collect_table

from chronoxtract_ray.pipelines.queries_events import HOUR_US, _events, _prep, _round

SESSION_GAP_US = 7_200_000_000  # 2 h of inactivity starts a new session


def _grouped(sf_dir: str, fn):
    ds = _events(sf_dir).map_batches(_prep, batch_format="pyarrow")
    return collect_table(ds.groupby("user_id").map_groups(fn, batch_format="pyarrow"))


def _sorted_group(group: pa.Table) -> tuple[int, np.ndarray, np.ndarray]:
    ts = group["ts_us"].to_numpy()
    turn = group["turn"].to_numpy()
    val = group["value"].to_numpy()
    order = np.lexsort((turn, ts))
    return group["user_id"][0].as_py(), ts[order], val[order]


def _session_bounds(ts: np.ndarray, gap_us: int = SESSION_GAP_US) -> np.ndarray:
    """Start offsets of each session in a ts-sorted series (first is 0)."""
    brk = np.empty(ts.size, dtype=bool)
    brk[0] = True
    brk[1:] = np.diff(ts) > gap_us
    return np.flatnonzero(brk)


# ---- sessionization (windowed aggregate over inactivity gaps) ----


def q_sessionize(sf_dir: str):
    """Per-user sessions: a gap > 2 h starts a new session; per session emit
    n_events, start/end (µs), duration (s) and mean value. Vectorized:
    diff → cumsum session ids → reduceat segment sums. Oracle: lag/partition
    window-function gap flags + running sum, the standard SQL sessionize."""

    def fn(group: pa.Table) -> pa.Table:
        uid, ts, val = _sorted_group(group)
        starts = _session_bounds(ts)
        ends = np.append(starts[1:], ts.size) - 1  # inclusive last index
        n = np.diff(np.append(starts, ts.size))
        vsum = np.add.reduceat(val, starts)
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), starts.size), pa.int64()),
                "session_id": pa.array(np.arange(starts.size, dtype=np.int64), pa.int64()),
                "n_events": pa.array(n.astype(np.int64), pa.int64()),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends], pa.int64()),
                "duration_s": pa.array(_round((ts[ends] - ts[starts]) / 1e6), pa.float64()),
                "mean_value": pa.array(_round(vsum / n), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_SESSIONIZE = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t, event_id, value FROM events
), b AS (
  SELECT *, CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                      > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
)
SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
  min(t) AS start_us, max(t) AS end_us,
  ROUND((max(t) - min(t)) / 1000000.0, 6) AS duration_s,
  ROUND(avg(value), 6) AS mean_value
FROM s GROUP BY 1, 2
"""


# ---- as-of join (event -> most recent completed hourly rollup) ----


def q_asof_join(sf_dir: str):
    """Each event joined to its user's most recent COMPLETED hourly mean
    (hour_end <= event ts; events in the user's first hour have no match and
    are dropped, matching inner ASOF semantics). Per group: hourly means via
    reduceat over the sorted hour index, then one searchsorted over hour
    ends — O(n log h) per user, no join blow-up. Oracle: DuckDB ASOF JOIN."""

    def fn(group: pa.Table) -> pa.Table:
        uid, ts, val = _sorted_group(group)
        hour = ts // HOUR_US
        starts = np.flatnonzero(np.r_[True, np.diff(hour) > 0])
        n = np.diff(np.append(starts, ts.size))
        hmean = np.add.reduceat(val, starts) / n
        hour_end = (hour[starts] + 1) * HOUR_US
        pos = np.searchsorted(hour_end, ts, side="right") - 1
        ok = pos >= 0
        pos = pos[ok]
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(uid), int(ok.sum())), pa.int64()),
                "event_ts_us": pa.array(ts[ok], pa.int64()),
                "prev_hour_start": pa.array(hour[starts][pos] * HOUR_US, pa.int64()),
                "prev_hour_mean": pa.array(_round(hmean[pos]), pa.float64()),
            }
        )

    return _grouped(sf_dir, fn)


SQL_ASOF_JOIN = f"""
WITH h AS (
  SELECT user_id, (epoch_us(ts) // {HOUR_US}) * {HOUR_US} AS hs,
         (epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US} AS he,
         avg(value) AS hmean
  FROM events GROUP BY 1, 2, 3
), e AS (
  SELECT user_id, epoch_us(ts) AS t FROM events
)
SELECT e.user_id, e.t AS event_ts_us,
       h.hs AS prev_hour_start, ROUND(h.hmean, 6) AS prev_hour_mean
FROM e ASOF JOIN h ON e.user_id = h.user_id AND e.t >= h.he
"""


# ---- range (interval) join across adjacent users ----


def q_range_join(sf_dir: str):
    """User u's sessions counted against user u+1's raw events that fall
    inside [start, end] (inclusive). Distribution: each event row is emitted
    into pair group u (tag self) AND pair group u-1 (tag neighbor) — a
    bounded 2x fan-out — then one groupby(pair) co-locates each session
    stream with its neighbor stream; counts are two searchsorteds per
    session. Sessions of the max user simply count 0 (left-join semantics).
    Oracle: LEFT JOIN on BETWEEN over the window-function sessionize."""

    def dup(batch: pa.Table) -> pa.Table:
        # project to what fn() consumes BEFORE the 2x fan-out: value is
        # never read (by engine or oracle), so carrying it would add ~25%
        # to the bytes of this query's single all-to-all exchange
        uid = batch["user_id"].to_numpy()
        ts = batch["ts_us"].to_numpy()
        turn = batch["turn"].to_numpy()
        return pa.table(
            {
                "pair": pa.array(np.concatenate([uid, uid - 1]), pa.int64()),
                "tag": pa.array(
                    np.concatenate([np.zeros(uid.size, np.int8), np.ones(uid.size, np.int8)])
                ),
                "ts_us": pa.array(np.concatenate([ts, ts]), pa.int64()),
                "turn": pa.array(np.concatenate([turn, turn]), pa.int64()),
            }
        )

    def fn(group: pa.Table) -> pa.Table:
        pair = group["pair"][0].as_py()
        tag = group["tag"].to_numpy()
        ts = group["ts_us"].to_numpy()
        turn = group["turn"].to_numpy()
        self_m = tag == 0
        if not self_m.any():  # pair below the min user: neighbor rows only
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "session_id": pa.array([], pa.int64()),
                             "start_us": pa.array([], pa.int64()),
                             "end_us": pa.array([], pa.int64()),
                             "n_neighbor_events": pa.array([], pa.int64())})
        sts, sturn = ts[self_m], turn[self_m]
        order = np.lexsort((sturn, sts))
        sts = sts[order]
        starts = _session_bounds(sts)
        ends = np.append(starts[1:], sts.size) - 1
        nts = np.sort(ts[~self_m])
        lo = np.searchsorted(nts, sts[starts], side="left")
        hi = np.searchsorted(nts, sts[ends], side="right")
        return pa.table(
            {
                "user_id": pa.array(np.repeat(np.int64(pair), starts.size), pa.int64()),
                "session_id": pa.array(np.arange(starts.size, dtype=np.int64), pa.int64()),
                "start_us": pa.array(sts[starts], pa.int64()),
                "end_us": pa.array(sts[ends], pa.int64()),
                "n_neighbor_events": pa.array((hi - lo).astype(np.int64), pa.int64()),
            }
        )

    ds = _events(sf_dir).map_batches(_prep, batch_format="pyarrow").map_batches(dup, batch_format="pyarrow")
    return collect_table(ds.groupby("pair").map_groups(fn, batch_format="pyarrow"))


SQL_RANGE_JOIN = f"""
WITH o AS (
  SELECT user_id, epoch_us(ts) AS t, event_id FROM events
), b AS (
  SELECT *, CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
                      > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM o
), s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM b
), sess AS (
  SELECT user_id, CAST(sid AS BIGINT) AS session_id,
         min(t) AS start_us, max(t) AS end_us
  FROM s GROUP BY 1, 2
)
SELECT sess.user_id, sess.session_id, sess.start_us, sess.end_us,
       count(ev.t) AS n_neighbor_events
FROM sess LEFT JOIN o ev
  ON ev.user_id = sess.user_id + 1 AND ev.t BETWEEN sess.start_us AND sess.end_us
GROUP BY 1, 2, 3, 4
"""
