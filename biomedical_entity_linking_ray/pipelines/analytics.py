"""Temporal joins, hopping windows, exact distributed quantiles and
distinct counts (exact + HyperLogLog sketch) over the events/lineitem tables.

This is the "custom operators Ray Data lacks" family (SURVEY.md 2.10 and the
training-data-pipeline chapter): each operator documents the partitioning
assumption it relies on and composes vectorized map_batches partials with ONE
grouped shuffle -- the shape that holds at 100 TB:

- as-of join        -> hash-bucket by the equi key, sorted merge inside groups
- range join        -> band quantization + probe replication (+/-1 band)
- hopping windows   -> k-fold skinny expansion + per-batch partial aggregation
- exact quantiles   -> counting method (shuffle carries (group,value,count))
- distinct count    -> local-dedup combiner + two grouped stages
- HLL sketch        -> O(groups * 2^p) register merge independent of row count

All SQL oracles live in ``SQL`` keyed by query name, same column names and
rounding on both sides.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Sum

from biomedical_entity_linking_ray.config import default_buckets
from biomedical_entity_linking_ray.functions import groups, hashing


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


# ---------------------------------------------------------------------------
# as-of join (Ray Data has no native one)
# ---------------------------------------------------------------------------

def events_asof_prior(
    sf_dir: str,
    left_type: str = "click",
    right_type: str = "purchase",
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """As-of join: for each `left_type` event, the most recent STRICTLY prior
    `right_type` event by the same user (ties on ts break to max event_id),
    emitting (event_id, prior_event_id, gap_us).

    Scale pattern: hash-bucket BOTH sides by the equi key (user_id) in one
    shuffle, then run a vectorized sorted merge (pandas merge_asof) inside
    each group. Partitioning assumption: one user's history fits one group --
    true whenever per-key history fits a worker; salt by time range for
    pathological keys. Events with no prior match are dropped (inner)."""
    n_buckets = n_buckets or default_buckets()

    def sides(t: pa.Table) -> pa.Table:
        et = t["event_type"]
        keep = pc.or_(pc.equal(et, left_type), pc.equal(et, right_type))
        t = t.filter(keep)
        u = t["user_id"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(u) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({
            "__bucket": pa.array(b),
            "user_id": t["user_id"],
            "event_id": t["event_id"],
            "ts": t["ts"],
            "is_right": pc.equal(t["event_type"], right_type),
        })

    def _empty() -> pd.DataFrame:
        return pd.DataFrame({
            "event_id": pd.Series([], dtype=np.int64),
            "prior_event_id": pd.Series([], dtype=np.int64),
            "gap_us": pd.Series([], dtype=np.int64),
        })

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        left = g[~g["is_right"]].sort_values("ts", kind="mergesort")
        right = g[g["is_right"]].sort_values(
            ["ts", "event_id"], kind="mergesort")
        if len(left) == 0 or len(right) == 0:
            return _empty()
        right = right.rename(columns={"event_id": "prior_event_id"})
        right = right.assign(prior_ts=right["ts"])
        # backward + sorted-by-(ts, event_id) right side => among equal prior
        # timestamps the LAST row wins = max prior_event_id (the SQL tiebreak)
        m = pd.merge_asof(
            left[["event_id", "ts", "user_id"]],
            right[["prior_event_id", "prior_ts", "ts", "user_id"]],
            on="ts", by="user_id", direction="backward",
            allow_exact_matches=False)
        m = m.dropna(subset=["prior_event_id"])
        if len(m) == 0:
            return _empty()
        gap = (m["ts"].to_numpy() - m["prior_ts"].to_numpy()) \
            .astype("timedelta64[us]").astype(np.int64)
        return pd.DataFrame({
            "event_id": m["event_id"].to_numpy(np.int64),
            "prior_event_id": m["prior_event_id"].to_numpy(np.int64),
            "gap_us": gap,
        })

    return _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(sides, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# banded range self-join
# ---------------------------------------------------------------------------

def events_nearby(
    sf_dir: str, radius_minutes: int = 60, n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Banded range self-join: per event, count and value-sum of OTHER events
    by the same user within +/- radius, as (event_id, n_nearby, sum_nearby).

    Range joins at scale: quantize time into bands of width == radius and
    replicate the PROBE side into (band-1, band, band+1); every true match
    then shares a (user_id, band) key with exactly one probe replica, so one
    grouped shuffle co-locates candidates, and a final skinny groupby merges
    per-bucket partials (a probe's three replicas can land in different
    buckets). Inside each group the predicate is applied WITHOUT
    materializing pairs: build rows are sorted on a collision-free
    (key, time-offset) composite, each probe's neighbour range is two
    vectorized searchsorted bounds, counts are range widths and value sums
    are prefix-sum differences -- O((B+P) log B) per group instead of the
    O(B*P) pair merge. Events with zero neighbours are dropped (inner,
    mirrors the SQL join)."""
    n_buckets = n_buckets or default_buckets()
    radius_us = np.int64(radius_minutes) * np.int64(60_000_000)

    def expand(t: pa.Table) -> pa.Table:
        u = t["user_id"].to_numpy().astype(np.uint64)
        ts = t["ts"].cast(pa.int64()).to_numpy()
        band = ts // radius_us
        eid = t["event_id"].to_numpy()
        val = t["value"].to_numpy()
        n = len(u)

        def mk(users, bands, eids, tss, vals, probe: bool) -> pa.Table:
            key = hashing.splitmix64(
                users * np.uint64(0x9E3779B97F4A7C15) ^ bands.astype(np.uint64))
            return pa.table({
                "__bucket": pa.array((key % np.uint64(n_buckets)).astype(np.int64)),
                "user_id": pa.array(users.astype(np.int64)),
                "band": pa.array(bands),
                "event_id": pa.array(eids),
                "ts_us": pa.array(tss),
                "value": pa.array(vals),
                "is_probe": pa.array(np.full(len(users), probe)),
            })

        build = mk(u, band, eid, ts, val, False)
        probe = mk(
            np.repeat(u, 3),
            np.repeat(band, 3) + np.tile(np.array([-1, 0, 1], dtype=np.int64), n),
            np.repeat(eid, 3), np.repeat(ts, 3),
            np.repeat(val, 3),  # own value, for exact self-exclusion
            True)
        return pa.concat_tables([build, probe])

    def join(g: pd.DataFrame) -> pd.DataFrame:
        is_probe = g["is_probe"].to_numpy()
        # dense (user_id, band) codes shared by both sides (C groupby path)
        k = g.groupby(["user_id", "band"], sort=False).ngroup().to_numpy()
        band = g["band"].to_numpy()
        ts = g["ts_us"].to_numpy()
        # collision-free composite: build offsets land in [2r, 3r) of each
        # key's 5r-wide slot; probe windows stay inside [0, 5r) of the same
        # slot because replica offsets span [-r, 2r)
        c = k * (5 * radius_us) + (ts - band * radius_us) + 2 * radius_us

        cb, vb = c[~is_probe], g["value"].to_numpy()[~is_probe]
        order = np.argsort(cb, kind="stable")
        cb = cb[order]
        csum = np.concatenate(([0.0], np.cumsum(vb[order])))

        cp = c[is_probe]
        lb = np.searchsorted(cb, cp - radius_us, side="left")
        ub = np.searchsorted(cb, cp + radius_us, side="right")
        n = (ub - lb).astype(np.int64)
        s = csum[ub] - csum[lb]
        # the replica whose band equals the probe's true band contains the
        # probe itself in the build side: remove it from count and sum
        self_here = band[is_probe] == (ts[is_probe] // radius_us)
        n -= self_here
        s -= np.where(self_here, g["value"].to_numpy()[is_probe], 0.0)

        keep = n > 0
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy()[is_probe][keep],
            "n_nearby": n[keep],
            "sum_nearby": s[keep],
        })

    partials = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]) \
        .map_batches(expand, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(join, batch_format="pandas")
    # event_id cardinality scales with the corpus: merge the <=3 replica
    # partials per event through the bucketed path, not Dataset.aggregate
    # (which pays per-group Python overhead -- functions/groups.py docstring)
    merged = groups.bucketed_aggregate(
        partials, ["event_id"],
        {"n_nearby": ("n_nearby", "sum"), "sum_nearby": ("sum_nearby", "sum")},
        n_buckets=n_buckets)

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "n_nearby": t["n_nearby"],
            "sum_nearby": pc.round(t["sum_nearby"], ndigits=4),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# hopping (overlapping) windows
# ---------------------------------------------------------------------------

def events_hopping(
    sf_dir: str, size_hours: int = 2, hop_hours: int = 1,
) -> "ray.data.Dataset":
    """Hopping windows (size 2h, hop 1h by default): each event contributes
    to size/hop overlapping windows, as (event_type, window_start, n,
    sum_value). Completes the windowing family next to events_hourly
    (tumbling) and user_sessions (session).

    Vectorized k-fold expansion of the SKINNY projected columns inside
    map_batches, partial aggregation per batch (combiner), then one tiny
    grouped merge -- the expansion multiplies partial-agg input, never the
    shuffle, so the pattern is safe at any scale."""
    k = size_hours // hop_hours
    hop_us = np.int64(hop_hours) * np.int64(3_600_000_000)

    def partial(t: pa.Table) -> pa.Table:
        ts = t["ts"].cast(pa.int64()).to_numpy()
        anchor = (ts // hop_us) * hop_us
        et = t["event_type"].to_numpy(zero_copy_only=False)
        val = t["value"].to_numpy()
        df = pd.concat(
            [pd.DataFrame({"event_type": et,
                           "window_start": anchor - np.int64(i) * hop_us,
                           "value": val}) for i in range(k)],
            ignore_index=True)
        g = df.groupby(["event_type", "window_start"], as_index=False).agg(
            n=("value", "size"), sum_value=("value", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    # window cardinality grows with the covered time span: bucketed merge
    ds = groups.bucketed_aggregate(
        _read(sf_dir, "events", ["event_type", "ts", "value"])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536),
        ["event_type", "window_start"],
        {"n": ("n", "sum"), "sum_value": ("sum_value", "sum")})

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "window_start": t["window_start"].cast(pa.timestamp("us")),
            "n": t["n"],
            "sum_value": pc.round(t["sum_value"], ndigits=4),
        })

    return ds.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# cumulative window: per-key running sum
# ---------------------------------------------------------------------------

def user_running_value(sf_dir: str, n_buckets: int | None = None) -> "ray.data.Dataset":
    """Cumulative window function: per-user running sum of `value` in
    (ts, event_id) order, as (event_id, running_value) -- the SUM() OVER
    (PARTITION BY ... ORDER BY ... ROWS UNBOUNDED PRECEDING) shape.

    Running aggregates need per-key ORDER, not global order: hash-bucket by
    user (one shuffle, bounded group count), then one vectorized sort +
    grouped cumsum per bucket. Accumulation order matches the SQL frame
    order exactly, so the float results are comparable. Partitioning
    assumption: one user's history fits a worker."""
    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        rv = g.groupby("user_id", sort=False)["value"].cumsum()
        return pd.DataFrame({
            "event_id": g["event_id"].to_numpy(np.int64),
            "running_value": rv.to_numpy(np.float64).round(4),
        })

    return _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(run, batch_format="pandas")


# ---------------------------------------------------------------------------
# exact distributed quantiles via counting
# ---------------------------------------------------------------------------

def quantity_quantiles(sf_dir: str) -> "ray.data.Dataset":
    """Exact per-group quantiles by the counting method: per-batch value
    counts per (group, value) -> grouped count merge -> per-group cumulative
    pick at index ceil(q*n)-1 of the sorted domain (DuckDB quantile_disc
    semantics), as (l_returnflag, median_qty, p90_qty).

    The shuffle carries (group, value, count) triples -- NOT rows -- so this
    stays exact and tiny whenever the per-group distinct-value set fits one
    worker (quantities, prices, scores, durations); unbounded continuous
    domains must fall back to a mergeable sketch."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        g = df.groupby(["l_returnflag", "l_quantity"], as_index=False).agg(
            cnt=("l_quantity", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=131072) \
        .groupby(["l_returnflag", "l_quantity"]).aggregate(
            Sum("cnt", alias_name="cnt"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("l_quantity").reset_index(drop=True)
        c = g["cnt"].to_numpy().cumsum()
        n = int(c[-1])
        row = {"l_returnflag": g["l_returnflag"].iloc[0]}
        for q, name in ((0.5, "median_qty"), (0.9, "p90_qty")):
            idx = int(np.searchsorted(c, int(np.ceil(q * n)), side="left"))
            row[name] = float(g["l_quantity"].iloc[idx])
        return pd.DataFrame([row])

    return counts.groupby("l_returnflag").map_groups(
        pick, batch_format="pandas")


# ---------------------------------------------------------------------------
# approximate quantiles for UNBOUNDED domains: deterministic bottom-k sample
# ---------------------------------------------------------------------------

def value_quantiles_sampled(sf_dir: str, k: int = 256) -> "ray.data.Dataset":
    """Approximate per-type quantiles of the CONTINUOUS `value` column via a
    mergeable bottom-k sample, as (event_type, median_est, p90_est).

    quantity_quantiles' counting method needs a bounded distinct-value
    domain; a continuous domain needs a sketch. The k rows with the smallest
    splitmix64(event_id) per group are a uniform random sample that is
    mergeable (union, keep k smallest) and DETERMINISTIC -- so the whole
    estimator is replicated in the SQL oracle, not just pinned
    approximately. Per-batch partial bottom-k is the combiner; the shuffle
    carries <= k rows per (batch, group)."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_type": t["event_type"].to_pandas(),
            "h": hashing.splitmix64(t["event_id"].to_numpy().astype(np.uint64)),
            "value": t["value"].to_numpy(),
        })
        top = df.sort_values("h", kind="mergesort") \
                .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(top, preserve_index=False)

    def est(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g.nsmallest(k, "h")["value"].to_numpy())
        n = len(v)
        row = {"event_type": g["event_type"].iloc[0]}
        for q, name in ((0.5, "median_est"), (0.9, "p90_est")):
            row[name] = round(float(v[int(np.ceil(q * n)) - 1]), 4)
        return pd.DataFrame([row])

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("event_type").map_groups(est, batch_format="pandas")


def _sampled_quantiles_sql(k: int = 256) -> str:
    """The bottom-k sample + quantile pick replicated in DuckDB: same
    splitmix64-over-HUGEINT chain, rank by hash (event_id is unique, so the
    order is total), quantile_disc over the sampled values."""
    return f"""
        WITH s1 AS (SELECT event_type, value,
                           (event_id::HUGEINT + 11400714819323198485::HUGEINT)
                               % {_M} AS x
                    FROM events),
        s2 AS (SELECT event_type, value,
                      {_mulmod('xor(x, x // 1073741824::HUGEINT)', 0xBF58476D1CE4E5B9)} AS x
               FROM s1),
        s3 AS (SELECT event_type, value,
                      {_mulmod('xor(x, x // 134217728::HUGEINT)', 0x94D049BB133111EB)} AS x
               FROM s2),
        hv AS (SELECT event_type, value,
                      xor(x, x // 2147483648::HUGEINT) AS h FROM s3),
        ranked AS (SELECT event_type, value,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM hv)
        SELECT event_type,
               round(quantile_disc(value, 0.5), 4) AS median_est,
               round(quantile_disc(value, 0.9), 4) AS p90_est
        FROM ranked WHERE rn <= {k}
        GROUP BY event_type
    """


# ---------------------------------------------------------------------------
# grouped distinct count: exact + HyperLogLog sketch twin
# ---------------------------------------------------------------------------

def distinct_users_by_type(sf_dir: str) -> "ray.data.Dataset":
    """Exact grouped distinct count as two grouped stages: per-batch local
    dedup (combiner), bucketed (type, user) distinct (key cardinality scales
    with users, so Dataset.aggregate's per-group overhead is avoided), then a
    tiny per-type count -- the shuffle carries pre-deduped pairs, never raw
    events."""

    def local_dedup(t: pa.Table) -> pa.Table:
        return pa.Table.from_pandas(
            t.to_pandas().drop_duplicates(), preserve_index=False)

    pairs = groups.bucketed_distinct(
        _read(sf_dir, "events", ["event_type", "user_id"])
        .map_batches(local_dedup, batch_format="pyarrow", batch_size=131072),
        ["event_type", "user_id"])
    return pairs.groupby("event_type").aggregate(Count(alias_name="n_users"))


def distinct_users_hll(sf_dir: str, p: int = 12) -> "ray.data.Dataset":
    """HyperLogLog distinct-count sketch per event_type. The sketch itself is
    deterministic given splitmix64, so the DuckDB oracle replicates the WHOLE
    estimator closed-form (hash over HUGEINT, exact integer rank via bin()
    length, register max, bias constant + linear-counting branch) and the
    driver value-checks it; pytest additionally pins it within 5% of the
    exact twin distinct_users_by_type.

    Per-batch partial registers (2^p bytes per group) merged by elementwise
    max: the shuffle moves O(groups * 2^p) bytes REGARDLESS of row count --
    the only distinct-count shape whose exchange volume is constant at
    100 TB. Standard HLL bias constant + linear-counting small-range
    correction (Flajolet et al. 2007)."""
    m = 1 << p
    bits = 64 - p

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        out_types: list[str] = []
        out_regs: list[bytes] = []
        for et, g in df.groupby("event_type"):
            h = hashing.splitmix64(g["user_id"].to_numpy().astype(np.uint64))
            idx = (h >> np.uint64(bits)).astype(np.int64)
            rest = h & np.uint64((1 << bits) - 1)
            rank = np.empty(len(h), dtype=np.uint8)
            z = rest == 0
            rank[z] = bits + 1
            # rest < 2^52 for p >= 12, so float64 represents it exactly and
            # frexp's exponent e gives floor(log2(rest)) = e - 1
            e = np.frexp(rest[~z].astype(np.float64))[1]
            rank[~z] = (bits - (e - 1)).astype(np.uint8)
            reg = np.zeros(m, dtype=np.uint8)
            np.maximum.at(reg, idx, rank)
            out_types.append(et)
            out_regs.append(reg.tobytes())
        return pa.table({
            "event_type": pa.array(out_types, pa.string()),
            "registers": pa.array(out_regs, pa.binary()),
        })

    def estimate(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.stack([np.frombuffer(b, dtype=np.uint8)
                         for b in g["registers"]])
        reg = regs.max(axis=0)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.exp2(-reg.astype(np.float64))))
        zeros = int((reg == 0).sum())
        if est <= 2.5 * m and zeros > 0:
            est = m * np.log(m / zeros)
        return pd.DataFrame([{"event_type": g["event_type"].iloc[0],
                              "n_users_est": float(round(est, 4))}])

    return _read(sf_dir, "events", ["event_type", "user_id"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=131072) \
        .groupby("event_type").map_groups(estimate, batch_format="pandas")


# ---------------------------------------------------------------------------
# SQL oracles (DuckDB, same column names and rounding)
# ---------------------------------------------------------------------------

SQL: dict[str, str] = {
    "events_asof_prior": """
        SELECT event_id, prior_event_id, gap_us FROM (
            SELECT a.event_id,
                   b.event_id AS prior_event_id,
                   epoch_us(a.ts) - epoch_us(b.ts) AS gap_us,
                   row_number() OVER (PARTITION BY a.event_id
                                      ORDER BY b.ts DESC, b.event_id DESC) AS rn
            FROM events a JOIN events b
              ON b.user_id = a.user_id AND b.ts < a.ts
            WHERE a.event_type = 'click' AND b.event_type = 'purchase'
        ) WHERE rn = 1
    """,
    "events_nearby": """
        SELECT a.event_id,
               count(*) AS n_nearby,
               round(sum(b.value), 4) AS sum_nearby
        FROM events a JOIN events b
          ON b.user_id = a.user_id AND b.event_id <> a.event_id
         AND b.ts BETWEEN a.ts - INTERVAL 1 HOUR AND a.ts + INTERVAL 1 HOUR
        GROUP BY a.event_id
    """,
    "events_hopping": """
        WITH w AS (
            SELECT event_type, date_trunc('hour', ts) AS window_start, value
            FROM events
            UNION ALL
            SELECT event_type, date_trunc('hour', ts) - INTERVAL 1 HOUR, value
            FROM events
        )
        SELECT event_type, window_start,
               count(*) AS n, round(sum(value), 4) AS sum_value
        FROM w GROUP BY event_type, window_start
    """,
    "user_running_value": """
        SELECT event_id,
               round(sum(value) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id
                                      ROWS UNBOUNDED PRECEDING), 4)
                   AS running_value
        FROM events
    """,
    "quantity_quantiles": """
        SELECT l_returnflag,
               quantile_disc(l_quantity, 0.5) AS median_qty,
               quantile_disc(l_quantity, 0.9) AS p90_qty
        FROM lineitem GROUP BY l_returnflag
    """,
    "distinct_users_by_type": """
        SELECT event_type, count(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type
    """,
}


# splitmix64 re-expressed over HUGEINT for the SQL oracles: split
# multiplication (hi/lo 32-bit halves) keeps products under 2^96 -- a plain
# 64x64 multiply overflows INT128.
_M = "18446744073709551616::HUGEINT"


def _mulmod(x: str, c: int) -> str:
    hi, lo = c >> 32, c & 0xFFFFFFFF
    return (f"((({x}) * {lo}::HUGEINT) % {_M} + "
            f"((({x}) * {hi}::HUGEINT) % 4294967296::HUGEINT)"
            f" * 4294967296::HUGEINT) % {_M}")


def _hll_sql(p: int = 12) -> str:
    """The HLL estimator replicated closed-form in DuckDB: splitmix64 over
    HUGEINT, rank as an EXACT integer via length(bin(rest)) -- floor(log2)
    through floats is wrong near 2^k boundaries -- then register max, the
    alpha bias constant and the linear-counting small-range branch, rounded
    like the Ray side."""
    m, bits = 1 << p, 64 - p
    alpha = 0.7213 / (1.0 + 1.079 / m)
    M, mulmod = _M, _mulmod

    return f"""
        WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
        s1 AS (SELECT event_type,
                      (user_id::HUGEINT + 11400714819323198485::HUGEINT) % {M} AS x
               FROM u),
        s2 AS (SELECT event_type,
                      {mulmod('xor(x, x // 1073741824::HUGEINT)', 0xBF58476D1CE4E5B9)} AS x
               FROM s1),
        s3 AS (SELECT event_type,
                      {mulmod('xor(x, x // 134217728::HUGEINT)', 0x94D049BB133111EB)} AS x
               FROM s2),
        hv AS (SELECT event_type, xor(x, x // 2147483648::HUGEINT) AS h FROM s3),
        parts AS (SELECT event_type,
                         (h // {1 << bits}::HUGEINT)::BIGINT AS idx,
                         (h % {1 << bits}::HUGEINT)::BIGINT AS rest
                  FROM hv),
        regs AS (SELECT event_type, idx,
                        max(CASE WHEN rest = 0 THEN {bits + 1}
                                 ELSE {bits + 1} - length(bin(rest)) END) AS reg
                 FROM parts GROUP BY event_type, idx),
        stats AS (SELECT event_type,
                         sum(power(2.0, -reg)) + ({m} - count(*)) AS denom,
                         {m} - count(*) AS zeros
                  FROM regs GROUP BY event_type)
        SELECT event_type,
               round(CASE WHEN raw <= {2.5 * m!r}::DOUBLE AND zeros > 0
                          THEN {m} * ln({float(m)!r}::DOUBLE / zeros)
                          ELSE raw END, 4) AS n_users_est
        FROM (SELECT event_type,
                     {alpha!r}::DOUBLE * {m} * {m} / denom AS raw, zeros
              FROM stats)
    """


SQL["distinct_users_hll"] = _hll_sql()
SQL["value_quantiles_sampled"] = _sampled_quantiles_sql()


def events_sample_k(sf_dir: str, k: int = 50) -> "ray.data.Dataset":
    """Exact-size deterministic reservoir sample: the k events with the
    smallest splitmix64(event_id) per event_type, as the rows themselves
    -> (event_id, event_type, value).

    Distributed reservoir sampling without RNG state: bottom-k by a keyed
    hash is mergeable (union, keep k smallest) and a pure function of the
    row keys, so the sample is identical across reruns, partitionings and
    cluster sizes, and resumable jobs re-draw the same rows. Per-batch
    partial bottom-k is the combiner -- the shuffle carries <= k rows per
    (batch, group) regardless of corpus size; the same sketch underlies
    `value_quantiles_sampled`, here emitting the sample instead of a
    quantile estimate."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({
            "event_id": t["event_id"].to_pandas(),
            "event_type": t["event_type"].to_pandas(),
            "value": t["value"].to_numpy(),
            "h": hashing.splitmix64(t["event_id"].to_numpy().astype(np.uint64)),
        })
        top = df.sort_values("h", kind="mergesort") \
                .groupby("event_type", sort=False).head(k)
        return pa.Table.from_pandas(top, preserve_index=False)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(k, "h")[["event_id", "event_type", "value"]]

    return _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(partial, batch_format="pyarrow", batch_size=65536) \
        .groupby("event_type").map_groups(final, batch_format="pandas")


def _sample_k_sql(k: int = 50) -> str:
    """The bottom-k reservoir replicated in DuckDB: same splitmix64 chain,
    rank by hash within group (event_id unique -> total order)."""
    return f"""
        WITH s1 AS (SELECT event_id, event_type, value,
                           (event_id::HUGEINT + 11400714819323198485::HUGEINT)
                               % {_M} AS x
                    FROM events),
        s2 AS (SELECT event_id, event_type, value,
                      {_mulmod('xor(x, x // 1073741824::HUGEINT)', 0xBF58476D1CE4E5B9)} AS x
               FROM s1),
        s3 AS (SELECT event_id, event_type, value,
                      {_mulmod('xor(x, x // 134217728::HUGEINT)', 0x94D049BB133111EB)} AS x
               FROM s2),
        hv AS (SELECT event_id, event_type, value,
                      xor(x, x // 2147483648::HUGEINT) AS h FROM s3),
        ranked AS (SELECT event_id, event_type, value,
                          row_number() OVER (PARTITION BY event_type
                                             ORDER BY h) AS rn
                   FROM hv)
        SELECT event_id, event_type, value FROM ranked WHERE rn <= {k}
    """


SQL["events_sample_k"] = _sample_k_sql()
