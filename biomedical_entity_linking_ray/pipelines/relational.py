"""Generic relational operator battery over the TPC-H-ish testdata tables.

Each function is one Ray-Data-first operator pattern from SURVEY.md 2
(aggregation with partial pre-agg, broadcast join, anti/semi join, top-k,
windowed enumeration, union, value counts, tumbling windows), paired with an
ANSI-SQL oracle string in ``SQL`` keyed by the same name. Float aggregates are
rounded to 4 decimals on BOTH sides so the driver's value-hash comparison is
insensitive to summation order.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)


def _round_cols(ds: "ray.data.Dataset", cols: list[str], nd: int = 4) -> "ray.data.Dataset":
    def fn(t: pa.Table) -> pa.Table:
        for c in cols:
            t = t.set_column(t.schema.get_field_index(c), c, pc.round(t[c], ndigits=nd))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# A1/A5 analog: grouped aggregate with map-side partial aggregation
# ---------------------------------------------------------------------------

def pricing_summary(sf_dir: str, batch_size: int = 65536) -> "ray.data.Dataset":
    """TPC-H-Q1-shaped summary: pre-aggregate per batch inside map_batches
    (combiner), then groupby-sum the tiny partials -- the at-scale pattern for
    skewless aggregation (reference analog: pandas groupby A1,
    bigbio_utils.py:256-268, without the single-node materialization).
    Results are bit-identical at ANY batch_size/partitioning (int64-micros
    money sums are associative+commutative)."""

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        # money sums in integer micros: int64 addition is associative and
        # commutative, so the distributed sum is EXACTLY reproducible at any
        # partitioning (float64 partial sums differ in the 4th decimal at
        # ~10^5 rows/group and drift further at scale). Headroom: at TPC-H
        # price magnitudes (~4e10 micros/row) an int64 group sum overflows
        # SILENTLY around ~2e8 rows/group (~sf300), so deployments beyond
        # ~1e8 rows per group must widen to decimal128 -- that, not 1e12
        # total rows, is the migration trigger
        df["bp_micros"] = np.round(df["l_extendedprice"] * 1e6).astype(np.int64)
        df["rev_micros"] = np.round(
            df["l_extendedprice"] * (1.0 - df["l_discount"]) * 1e6
        ).astype(np.int64)
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            sum_qty=("l_quantity", "sum"),
            bp_micros=("bp_micros", "sum"),
            rev_micros=("rev_micros", "sum"),
            n_rows=("l_quantity", "size"),
        )
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(partial, batch_format="pyarrow", batch_size=batch_size)

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("bp_micros", alias_name="bp_micros"),
        Sum("rev_micros", alias_name="rev_micros"),
        Sum("n_rows", alias_name="n_rows"),
    )

    def to_money(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": t["sum_qty"],
            "sum_base_price": pc.divide(pc.cast(t["bp_micros"], pa.float64()), 1e6),
            "sum_revenue": pc.divide(pc.cast(t["rev_micros"], pa.float64()), 1e6),
            "n_rows": t["n_rows"],
        })

    out = out.map_batches(to_money, batch_format="pyarrow")
    return _round_cols(out, ["sum_qty", "sum_base_price", "sum_revenue"])


# ---------------------------------------------------------------------------
# O2/O3 analog: global top-k with deterministic tie-break
# ---------------------------------------------------------------------------

def top_orders(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Global top-k with limit pushdown: each block keeps its local top-k
    (vectorized lexsort), so the global sort -- still the O1 all-to-all sort
    operator -- runs over <= k x num_blocks rows instead of the full table.
    At 100 TB the full-table sort+limit would shuffle everything for 10 rows."""
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        price = t["o_totalprice"].to_numpy()
        keys = t["o_orderkey"].to_numpy()
        order = np.lexsort((keys, -price))[:k]
        return t.take(pa.array(order))

    partials = ds.map_batches(local_topk, batch_format="pyarrow")
    return _round_cols(
        partials.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(k),
        ["o_totalprice"],
    )


# ---------------------------------------------------------------------------
# J1/J6 analog: broadcast (map-side) join of small dimension tables
# ---------------------------------------------------------------------------

def revenue_by_nation(sf_dir: str, broadcast_side_max: int = 2_000_000) -> "ray.data.Dataset":
    """orders |> join customer(+nation) |> grouped revenue.

    nation (25 rows) is always a broadcast. customer scales WITH the fact
    table, so its delivery is bounded like every other broadcast in the repo:
    while the customer dimension fits `broadcast_side_max` it is read once
    driver-side, `ray.put` once, and each fact batch does a vectorized pandas
    merge (no shuffle of the fact table -- reference analog: every join in the
    reference is a broadcast dict lookup, SURVEY.md 2.4); beyond the bound the
    fact table hash-joins against the customer Dataset (the 10^12-row path)
    and only the tiny post-join partials shuffle again for the merge."""
    import pyarrow.parquet as pq

    nat = pq.read_table(os.path.join(sf_dir, "nation.parquet"),
                        columns=["n_nationkey", "n_name"]).to_pandas()
    cust_path = os.path.join(sf_dir, "customer.parquet")
    n_cust = pq.ParquetFile(cust_path).metadata.num_rows
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    _P_SCHEMA = pa.schema([("n_name", pa.string()),
                           ("rev_micros", pa.int64()), ("n_orders", pa.int64())])

    def partial_agg(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return _P_SCHEMA.empty_table()
        # same integer-micros exact-sum treatment as pricing_summary
        df["rev_micros"] = np.round(df["o_totalprice"] * 1e6).astype(np.int64)
        g = df.groupby("n_name", as_index=False).agg(
            rev_micros=("rev_micros", "sum"), n_orders=("o_orderkey", "size"))
        return pa.Table.from_pandas(g, preserve_index=False, schema=_P_SCHEMA)

    if n_cust <= broadcast_side_max:
        cust = pq.read_table(cust_path,
                             columns=["c_custkey", "c_nationkey"]).to_pandas()
        dim = cust.merge(nat, left_on="c_nationkey", right_on="n_nationkey")[
            ["c_custkey", "n_name"]]
        dim_ref = ray.put(dim)

        def join_batch(t: pa.Table) -> pa.Table:
            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            d = cached_broadcast(dim_ref)
            df = t.to_pandas().merge(d, left_on="o_custkey", right_on="c_custkey",
                                     how="inner")
            return partial_agg(df)

        partials = orders.map_batches(
            join_batch, batch_format="pyarrow", batch_size=65536)
    else:
        from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection

        nat_ref = ray.put(dict(zip(nat["n_nationkey"], nat["n_name"])))
        cust_ds = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

        def add_nation(t: pa.Table) -> pa.Table:
            from biomedical_entity_linking_ray.functions.joins import cached_broadcast

            nm = cached_broadcast(nat_ref)
            names = pd.Series(t["c_nationkey"].to_numpy()).map(nm)
            return pa.table({"c_custkey": t["c_custkey"],
                             "n_name": pa.array(names, pa.string())})

        dim_ds = cust_ds.map_batches(add_nation, batch_format="pyarrow")
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        joined = hash_join(orders, dim_ds, "inner", max(8, cpus),
                           on=("o_custkey",), right_on=("c_custkey",))
        partials = joined.map_batches(
            heal_projection(_P_SCHEMA, lambda t: partial_agg(
                t.select(["o_orderkey", "o_totalprice", "n_name"]).to_pandas())),
            batch_format="pyarrow", batch_size=65536)
    out = partials.groupby("n_name").aggregate(
        Sum("rev_micros", alias_name="rev_micros"), Sum("n_orders", alias_name="n_orders")
    )

    def to_money(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({
            "n_name": t["n_name"],
            "revenue": pc.divide(pc.cast(t["rev_micros"], pa.float64()), 1e6),
            "n_orders": t["n_orders"],
        })

    out = out.map_batches(to_money, batch_format="pyarrow")
    return _round_cols(out, ["revenue"])


# ---------------------------------------------------------------------------
# J9 analog: anti join via broadcast key set
# ---------------------------------------------------------------------------

def customers_without_orders(sf_dir: str, min_price: float = 300000.0) -> "ray.data.Dataset":
    """Customers with no order above `min_price` -- anti join as a broadcast
    key-set filter (guide: 'Semi / anti join'). The price floor keeps the
    result non-empty at test scale."""
    import pyarrow.parquet as pq

    okeys = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey"],
        filters=[("o_totalprice", ">", min_price)],
    )["o_custkey"]
    # broadcast the deduplicated Arrow array itself: zero-copy read per task,
    # vectorized is_in per batch (no Python membership loop, no per-batch
    # set -> array rebuild)
    key_ref = ray.put(pc.unique(okeys.combine_chunks()))

    def anti(t: pa.Table) -> pa.Table:
        keys = ray.get(key_ref)
        mask = pc.invert(pc.is_in(t["c_custkey"], value_set=keys))
        return t.filter(mask)

    return _read(sf_dir, "customer", ["c_custkey", "c_name"]).map_batches(
        anti, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# J10 analog: semi join via broadcast key set
# ---------------------------------------------------------------------------

def parts_with_lineitems(sf_dir: str) -> "ray.data.Dataset":
    import pyarrow.parquet as pq

    pkeys = pq.read_table(os.path.join(sf_dir, "lineitem.parquet"),
                          columns=["l_partkey"])["l_partkey"]
    # dedup once driver-side, broadcast the Arrow array (read zero-copy per
    # task -- never rebuilt per batch)
    key_ref = ray.put(pc.unique(pkeys.combine_chunks()))

    def semi(t: pa.Table) -> pa.Table:
        mask = pc.is_in(t["p_partkey"], value_set=ray.get(key_ref))
        return t.filter(mask)

    return _round_cols(
        _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"]).map_batches(
            semi, batch_format="pyarrow"
        ),
        ["p_retailprice"],
    )


def parts_with_lineitems_bloom(sf_dir: str, n_bits: int = 1 << 20) -> "ray.data.Dataset":
    """The same semi join through the SCALE path: when the filter side's key
    set is too big to broadcast exactly, a Bloom filter (~10 bits/key) prunes
    the probe map-side and an exact hash semi join over the survivors removes
    the false positives (functions/joins.py bloom_semi_join). Identical
    result to parts_with_lineitems -- the oracle checks exactness THROUGH the
    probabilistic pruning."""
    from biomedical_entity_linking_ray.functions.joins import bloom_semi_join

    probe = _read(sf_dir, "part", ["p_partkey", "p_name", "p_retailprice"])
    flt = _read(sf_dir, "lineitem", ["l_partkey"])
    out = bloom_semi_join(probe, flt, "p_partkey", "l_partkey", n_bits=n_bits)
    return _round_cols(out, ["p_retailprice"])


# ---------------------------------------------------------------------------
# A11 analog: value counts
# ---------------------------------------------------------------------------

def event_type_counts(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "events", ["event_type", "value"])
    out = ds.groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("value", alias_name="sum_value"),
        Mean("value", alias_name="avg_value"),
    )
    return _round_cols(out, ["sum_value", "avg_value"])


# ---------------------------------------------------------------------------
# D6 analog: union of filtered splits
# ---------------------------------------------------------------------------

def union_order_extremes(sf_dir: str) -> "ray.data.Dataset":
    ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderpriority"])
    hi = ds.filter(expr="o_totalprice > 400000.0")
    lo = ds.filter(expr="o_totalprice < 1000.0")
    return _round_cols(hi.union(lo), ["o_totalprice"])


# ---------------------------------------------------------------------------
# A10/O1 analog: within-group ordered enumeration (mention-id assignment)
# ---------------------------------------------------------------------------

def lineitem_sequence(sf_dir: str, n_buckets: int | None = None) -> "ray.data.Dataset":
    """Per-order line sequencing by (shipdate, linenumber) -- the target-domain
    analog of per-document mention-id assignment (`make_mention_id`,
    bigbio_utils.py:122-127): ordering is needed only WITHIN a group, never
    globally. Orders are hash-bucketed (one shuffle whose group count is
    `n_buckets`, independent of order cardinality -- the per-group-overhead
    fix in functions/groups.py) and each bucket does ONE vectorized
    sort + groupby.cumcount over all its orders."""
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def seq_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["l_orderkey", "l_shipdate", "l_linenumber"],
                          kind="mergesort").reset_index(drop=True)
        g["seq"] = g.groupby("l_orderkey").cumcount().to_numpy() + 1
        return g[["l_orderkey", "l_linenumber", "seq"]]

    return _read(sf_dir, "lineitem", ["l_orderkey", "l_linenumber", "l_shipdate"]) \
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(seq_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# A2/S8 analog: set-union aggregate per key (UMLS alias-set shape)
# ---------------------------------------------------------------------------

def part_returnflag_sets(sf_dir: str) -> "ray.data.Dataset":
    """(l_partkey, flag_set): sorted distinct return flags per part, joined to
    one string -- the reference's groupby(cui).agg(alias=set) KB shape
    (ontology.py:357-369) via the bucketed 'set' aggregate; string-joined so
    the value hashes identically across engines."""
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    sets = bucketed_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]),
        ["l_partkey"], {"flags": ("l_returnflag", "set")},
    )

    def join_str(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_partkey": t["l_partkey"],
            "flag_set": pa.array(["|".join(x) for x in t["flags"].to_pylist()],
                                 pa.string()),
        })

    return sets.map_batches(join_str, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# O7 analog: deterministic seeded sampling (keyed hash, oracle-reproducible)
# ---------------------------------------------------------------------------

def orders_sample(sf_dir: str, rate: float = 0.1, seed: int = 42) -> "ray.data.Dataset":
    """~10% deterministic sample of orders by keyed md5 hash (reference O7:
    seeded entity drop, BiEncoderLightningDataModule.py:209-227 -- done
    parallel-safe: the decision depends only on (key, seed))."""
    from biomedical_entity_linking_ray.functions.sampling import keyed_sample

    ds = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
    return _round_cols(keyed_sample(ds, "o_orderkey", rate, seed), ["o_totalprice"])


# Per-stratum sampling rates: the training-data rebalance shape (downsample
# the dominant crawl-like strata, keep all of the rare valuable ones).
STRATA_RATES: dict[str, float] = {
    "click": 0.05, "view": 0.1, "error": 0.25, "purchase": 1.0, "signup": 1.0,
}


def events_stratified_sample(
    sf_dir: str, rates: dict[str, float] | None = None, seed: int = 42,
) -> "ray.data.Dataset":
    """Stratified deterministic sample: each event_type keeps its own
    keyed-md5 rate (unlisted strata drop). Pure map-side -- the decision
    depends only on (event_id, seed, stratum rate), so it is reproducible at
    any parallelism and needs no shuffle; generalizes O7's uniform
    keyed_sample to per-group rates."""
    import hashlib

    from biomedical_entity_linking_ray.functions.sampling import keyed_sample_threshold

    th = {k: keyed_sample_threshold(v) for k, v in (rates or STRATA_RATES).items()}

    def flt(t: pa.Table) -> pa.Table:
        ids = t["event_id"].to_pylist()
        ets = t["event_type"].to_pylist()
        keep = [
            hashlib.md5(f"{i}:{seed}".encode()).hexdigest()[:8] < th.get(e, "")
            for i, e in zip(ids, ets)
        ]
        return t.filter(pa.array(keep))

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"]) \
        .map_batches(flt, batch_format="pyarrow")
    return _round_cols(ds, ["value"])


# ---------------------------------------------------------------------------
# D2 analog: rank-preserving dedup (first-occurrence order survives)
# ---------------------------------------------------------------------------

def order_flag_sequences(sf_dir: str, n_buckets: int | None = None) -> "ray.data.Dataset":
    """(l_orderkey, flag_seq): return flags in first-occurrence order along
    the (shipdate, linenumber) line sequence, duplicates dropped
    rank-preservingly (reference D2: deduplicate_candidates keeps first
    occurrence rank, evaluate.py:81-119; krissbert dedup_ids :48-56)."""
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["l_orderkey"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def seq_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # l_returnflag last: (shipdate, linenumber) is NOT unique in the data
        # (84 duplicate triples at sf0.1), so without it "first occurrence"
        # is engine-dependent; with it the order is total and deterministic
        # (remaining ties are identical in every projected column)
        g = g.sort_values(
            ["l_orderkey", "l_shipdate", "l_linenumber", "l_returnflag"],
            kind="mergesort")
        first = g.drop_duplicates(["l_orderkey", "l_returnflag"], keep="first")
        out = first.groupby("l_orderkey", sort=False)["l_returnflag"] \
            .agg("|".join).reset_index()
        return out.rename(columns={"l_returnflag": "flag_seq"})

    return _read(sf_dir, "lineitem",
                 ["l_orderkey", "l_linenumber", "l_shipdate", "l_returnflag"]) \
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(seq_bucket, batch_format="pandas")


# ---------------------------------------------------------------------------
# A5 analog: dataset statistics (uniques / overlaps between key sets)
# ---------------------------------------------------------------------------

def order_stats(sf_dir: str) -> "ray.data.Dataset":
    """One-row summary: row counts, distinct-key counts, and the overlap /
    difference between the customer sets of orders and customer tables
    (reference A5: dataset statistics with uniques + per-split overlaps,
    bioel/bioel/utils/statistics.py:6-75; D7 set intersect/difference
    :20-61). Distincts are per-batch pre-deduped then globally merged; the
    overlap is a broadcast membership count -- no shuffle of either table."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Count

    from biomedical_entity_linking_ray.functions.groups import bucketed_distinct

    orders = _read(sf_dir, "orders", ["o_custkey"])
    n_orders = orders.count()
    o_cust = bucketed_distinct(orders, ["o_custkey"])
    n_order_cust = o_cust.count()
    ckeys = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                          columns=["c_custkey"])["c_custkey"]
    n_customers = len(ckeys)
    key_ref = ray.put(pc.unique(ckeys.combine_chunks()))

    def overlap_partial(t: pa.Table) -> pa.Table:
        inside = pc.sum(
            pc.is_in(t["o_custkey"], value_set=ray.get(key_ref)).cast(pa.int64())
        ).as_py() or 0
        return pa.table({"n": pa.array([inside], pa.int64())})

    from ray.data.aggregate import Sum

    n_overlap = o_cust.map_batches(overlap_partial, batch_format="pyarrow") \
        .aggregate(Sum("n"))["sum(n)"]
    return ray.data.from_arrow(pa.table({
        "n_orders": pa.array([n_orders], pa.int64()),
        "n_customers": pa.array([n_customers], pa.int64()),
        "n_ordering_customers": pa.array([n_order_cust], pa.int64()),
        "n_overlap": pa.array([int(n_overlap)], pa.int64()),
        "n_customers_without_orders": pa.array([n_customers - int(n_overlap)], pa.int64()),
    }))


# ---------------------------------------------------------------------------
# A3 analog: grouped top-1 by rank (canonical-name selection shape)
# ---------------------------------------------------------------------------

def top_order_per_customer(sf_dir: str, n_buckets: int | None = None) -> "ray.data.Dataset":
    """(o_custkey, o_orderkey, o_totalprice): each customer's single
    highest-value order, ties broken by smallest order key (reference A3:
    rank-ordered first alias per cui, umls_utils.py:183-237 -- grouped top-1
    with a deterministic priority order). Bucketed by customer; one
    vectorized sort + drop_duplicates per bucket."""
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["o_custkey"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def top1(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        return g.drop_duplicates("o_custkey", keep="first")[
            ["o_custkey", "o_orderkey", "o_totalprice"]]

    return _round_cols(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__bucket").map_groups(top1, batch_format="pandas"),
        ["o_totalprice"],
    )


# ---------------------------------------------------------------------------
# streaming-shaped: tumbling window aggregate over the events log
# ---------------------------------------------------------------------------

def events_hourly(sf_dir: str) -> "ray.data.Dataset":
    """Tumbling 1-hour windows per event_type: floor the timestamp inside
    map_batches (no shuffle), then one grouped aggregate (guide:
    'Streaming-shaped workloads')."""

    def floor_hour(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "hour": pc.floor_temporal(t["ts"], unit="hour"),
            "value": t["value"],
        })

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
        floor_hour, batch_format="pyarrow"
    )
    out = ds.groupby(["event_type", "hour"]).aggregate(
        Count(alias_name="n"), Sum("value", alias_name="sum_value")
    )
    return _round_cols(out, ["sum_value"])


# ---------------------------------------------------------------------------
# streaming-shaped: session windows (gap-based, per user)
# ---------------------------------------------------------------------------

def user_sessions(
    sf_dir: str, gap_minutes: int = 30, n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(user_id, session_id, n_events, sum_value, session_start, session_end):
    consecutive events of a user closer than `gap_minutes` share a session.

    The gap rule needs per-user ORDER, not global order: users are
    hash-bucketed (one shuffle, bounded group count) and each bucket does one
    vectorized sort + shift/cumsum sessionization + groupby aggregate."""
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        keys = t["user_id"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    gap = pd.Timedelta(minutes=gap_minutes)

    def sess(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"],
                          kind="mergesort").reset_index(drop=True)
        new_user = g["user_id"].ne(g["user_id"].shift())
        brk = ((g["ts"] - g["ts"].shift()) > gap) & ~new_user
        g["session_id"] = brk.groupby(g["user_id"]).cumsum().astype(np.int64)
        out = g.groupby(["user_id", "session_id"], as_index=False).agg(
            n_events=("event_id", "size"), sum_value=("value", "sum"),
            session_start=("ts", "min"), session_end=("ts", "max"))
        return out

    ds = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"]) \
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536) \
        .groupby("__bucket").map_groups(sess, batch_format="pandas")
    return _round_cols(ds, ["sum_value"])


# ---------------------------------------------------------------------------
# scalar JSON extraction (SURVEY.md 2.9: json load/dump everywhere)
# ---------------------------------------------------------------------------

def event_props_k(sf_dir: str) -> "ray.data.Dataset":
    """(event_id, k): integer property extracted from the JSON `props` column
    (reference: ujson-loaded dict fields throughout, e.g. abbreviations.json
    bigbio_utils.py:57)."""
    import json

    def extract(t: pa.Table) -> pa.Table:
        ks = [json.loads(p).get("k") for p in t["props"].to_pylist()]
        return pa.table({
            "event_id": t["event_id"],
            "k": pa.array(ks, pa.int64()),
        })

    return _read(sf_dir, "events", ["event_id", "props"]).map_batches(
        extract, batch_format="pyarrow", batch_size=65536)


# ---------------------------------------------------------------------------
# M12/M3 analog: predicate filter + projection pushed to the read
# ---------------------------------------------------------------------------

def high_value_lineitems(sf_dir: str) -> "ray.data.Dataset":
    """Row filter pushed into the parquet scan (row-group pruning) + computed
    column -- prune-at-the-read pattern."""
    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"],
        filter=(pc.field("l_extendedprice") > 4000.0),
    )

    def net(t: pa.Table) -> pa.Table:
        return t.append_column(
            "net_price",
            pc.round(pc.multiply(t["l_extendedprice"],
                                 pc.subtract(pa.scalar(1.0), t["l_discount"])), ndigits=4),
        )

    return _round_cols(ds.map_batches(net, batch_format="pyarrow"), ["l_extendedprice", "l_discount"])


# ---------------------------------------------------------------------------
# SQL oracles (DuckDB, same column names and rounding)
# ---------------------------------------------------------------------------

SQL: dict[str, str] = {
    "pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               ROUND(SUM(l_quantity), 4) AS sum_qty,
               ROUND(SUM(CAST(ROUND(l_extendedprice * 1000000) AS BIGINT))
                     / 1000000.0, 4) AS sum_base_price,
               ROUND(SUM(CAST(ROUND(l_extendedprice * (1 - l_discount) * 1000000)
                              AS BIGINT)) / 1000000.0, 4) AS sum_revenue,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
    """,
    "top_orders": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 10
    """,
    "revenue_by_nation": """
        SELECT n_name,
               ROUND(SUM(CAST(ROUND(o_totalprice * 1000000) AS BIGINT))
                     / 1000000.0, 4) AS revenue,
               COUNT(*) AS n_orders
        FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
    """,
    "customers_without_orders": """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN
              (SELECT o_custkey FROM orders WHERE o_totalprice > 300000.0)
    """,
    "parts_with_lineitems": """
        SELECT p_partkey, p_name, ROUND(p_retailprice, 4) AS p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
    "parts_with_lineitems_bloom": """
        SELECT p_partkey, p_name, ROUND(p_retailprice, 4) AS p_retailprice
        FROM part
        WHERE p_partkey IN (SELECT l_partkey FROM lineitem)
    """,
    "event_type_counts": """
        SELECT event_type, COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value,
               ROUND(AVG(value), 4) AS avg_value
        FROM events
        GROUP BY event_type
    """,
    "union_order_extremes": """
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice > 400000.0
        UNION ALL
        SELECT o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice, o_orderpriority
        FROM orders WHERE o_totalprice < 1000.0
    """,
    "lineitem_sequence": """
        SELECT l_orderkey, l_linenumber,
               ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                  ORDER BY l_shipdate, l_linenumber) AS seq
        FROM lineitem
    """,
    "events_hourly": """
        SELECT event_type, date_trunc('hour', ts) AS hour, COUNT(*) AS n,
               ROUND(SUM(value), 4) AS sum_value
        FROM events
        GROUP BY event_type, date_trunc('hour', ts)
    """,
    "part_returnflag_sets": """
        SELECT l_partkey,
               array_to_string(list_sort(list(DISTINCT l_returnflag)), '|') AS flag_set
        FROM lineitem
        GROUP BY l_partkey
    """,
    "orders_sample": """
        SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM orders
        WHERE substr(md5(CAST(o_orderkey AS VARCHAR) || ':42'), 1, 8)
              < '19999999'
    """,
    "order_stats": """
        SELECT (SELECT COUNT(*) FROM orders) AS n_orders,
               (SELECT COUNT(*) FROM customer) AS n_customers,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders) AS n_ordering_customers,
               (SELECT COUNT(DISTINCT o_custkey) FROM orders
                WHERE o_custkey IN (SELECT c_custkey FROM customer)) AS n_overlap,
               (SELECT COUNT(*) FROM customer
                WHERE c_custkey NOT IN (SELECT o_custkey FROM orders))
                   AS n_customers_without_orders
    """,
    "top_order_per_customer": """
        SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 4) AS o_totalprice
        FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
            FROM orders
        ) WHERE rn = 1
    """,
    "order_flag_sequences": """
        WITH r AS (
            SELECT l_orderkey, l_returnflag,
                   ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                      ORDER BY l_shipdate, l_linenumber,
                                               l_returnflag) AS rn
            FROM lineitem
        ),
        f AS (
            SELECT l_orderkey, l_returnflag, MIN(rn) AS first_rn
            FROM r GROUP BY l_orderkey, l_returnflag
        )
        SELECT l_orderkey,
               string_agg(l_returnflag, '|' ORDER BY first_rn) AS flag_seq
        FROM f GROUP BY l_orderkey
    """,
    "user_sessions": """
        WITH o AS (
            SELECT user_id, event_id, ts, value,
                   CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                                ORDER BY ts, event_id)
                             > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
            FROM events
        ),
        s AS (
            SELECT user_id, ts, value,
                   CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_id
            FROM o
        )
        SELECT user_id, session_id, COUNT(*) AS n_events,
               ROUND(SUM(value), 4) AS sum_value,
               MIN(ts) AS session_start, MAX(ts) AS session_end
        FROM s GROUP BY user_id, session_id
    """,
    "event_props_k": """
        SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
    """,
    "high_value_lineitems": """
        SELECT l_orderkey, l_linenumber,
               ROUND(l_extendedprice, 4) AS l_extendedprice,
               ROUND(l_discount, 4) AS l_discount,
               ROUND(l_extendedprice * (1 - l_discount), 4) AS net_price
        FROM lineitem
        WHERE l_extendedprice > 4000.0
    """,
}


def _stratified_sql() -> str:
    """Same per-stratum md5 thresholds as events_stratified_sample, derived
    from the one shared rate table so the literals cannot drift."""
    from biomedical_entity_linking_ray.functions.sampling import keyed_sample_threshold

    cases = " ".join(
        f"WHEN '{k}' THEN '{keyed_sample_threshold(v)}'"
        for k, v in STRATA_RATES.items())
    return f"""
        SELECT event_id, event_type, ROUND(value, 4) AS value
        FROM events
        WHERE substr(md5(CAST(event_id AS VARCHAR) || ':42'), 1, 8) <
              CASE event_type {cases} ELSE '' END
    """


SQL["events_stratified_sample"] = _stratified_sql()


def customer_order_counts(
    sf_dir: str, min_price: float = 300000.0, join_partitions: int = 8,
) -> "ray.data.Dataset":
    """(c_custkey, n_orders, total_spent): per-customer count and spend over
    orders above `min_price`, for EVERY customer -- customers with none kept
    with zeros (the null-preserving LEFT OUTER join the anti-join battery
    implies but never materializes; the price floor makes the null branch
    non-empty at test scale, same device as customers_without_orders).

    Scale shape: the fact table is pre-aggregated FIRST (bucketed partial
    sums -- the combiner), so the outer join runs dimension-vs-aggregate:
    both sides are one-row-per-customer, never fact-cardinality. The outer
    side's null slots become integer/decimal zeros map-side."""
    import pyarrow.compute as pc

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import hash_join

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_custkey", "o_totalprice"],
        filter=(pc.field("o_totalprice") > min_price))

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    agg = bucketed_aggregate(
        orders.map_batches(add_one, batch_format="pyarrow"),
        ["o_custkey"],
        {"n_orders": ("one", "sum"), "spent": ("o_totalprice", "sum")})

    customers = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"), columns=["c_custkey"])
    # empty aggregate side: Ray 2.49's join crashes on a schema-less empty
    # input ("No match for key field reference"); every customer is an
    # outer-null row then, so skip the join and zero-fill directly
    agg = agg.materialize()
    if agg.count() == 0:
        joined = customers
    else:
        joined = hash_join(customers, agg, "left_outer", join_partitions,
                           on=("c_custkey",), right_on=("o_custkey",))

    def finish(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t["n_orders"], 0) if "n_orders" in t.schema.names \
            else pa.array(np.zeros(t.num_rows, np.int64))
        s = pc.fill_null(t["spent"], 0.0) if "spent" in t.schema.names \
            else pa.array(np.zeros(t.num_rows, np.float64))
        return pa.table({
            "c_custkey": t["c_custkey"],
            "n_orders": n.cast(pa.int64()),
            "total_spent": pc.round(s.cast(pa.float64()), 2),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


def order_rollup(sf_dir: str) -> "ray.data.Dataset":
    """(o_orderstatus, o_orderpriority, n_orders, total_price) at THREE
    grouping levels -- (status, priority), per-status subtotal, grand total --
    rollup slots marked 'ALL' (GROUP BY ROLLUP analog; sentinel instead of
    NULL so the driver's value hash has no null-ordering ambiguity).

    Textbook rollup shape: the corpus crosses the wire ONCE, into the
    finest-grain bucketed aggregate (per-batch partial sums, key cardinality
    = |status| x |priority| -- bounded, not data-scaled); coarser levels roll
    up FROM that aggregate driver-side. No second pass, no second shuffle."""
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def add_one(t: pa.Table) -> pa.Table:
        return t.append_column(
            "one", pa.array(np.ones(t.num_rows, dtype=np.int64)))

    fine = bucketed_aggregate(
        ds.map_batches(add_one, batch_format="pyarrow"),
        ["o_orderstatus", "o_orderpriority"],
        {"n_orders": ("one", "sum"), "s": ("o_totalprice", "sum")},
    ).to_pandas()
    if len(fine) == 0:  # empty table: grand-total zero row only
        return ray.data.from_arrow(pa.table({
            "o_orderstatus": pa.array(["ALL"]),
            "o_orderpriority": pa.array(["ALL"]),
            "n_orders": pa.array([0], pa.int64()),
            "total_price": pa.array([0.0], pa.float64()),
        }))

    by_status = fine.groupby("o_orderstatus", as_index=False)[
        ["n_orders", "s"]].sum()
    by_status["o_orderpriority"] = "ALL"
    total = pd.DataFrame({
        "o_orderstatus": ["ALL"], "o_orderpriority": ["ALL"],
        "n_orders": [fine["n_orders"].sum()], "s": [fine["s"].sum()],
    })
    out = pd.concat([fine, by_status, total], ignore_index=True)
    out["total_price"] = out.pop("s").round(2)
    out["n_orders"] = out["n_orders"].astype(np.int64)
    cols = ["o_orderstatus", "o_orderpriority", "n_orders", "total_price"]
    return ray.data.from_arrow(pa.Table.from_pandas(out[cols],
                                                    preserve_index=False))


def topk_orders_per_customer(
    sf_dir: str, k: int = 3, n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """(o_custkey, rnk, o_orderkey, o_totalprice): each customer's top-k
    orders by value, rank ties broken by smallest order key (grouped top-k;
    the k>1 generalization of top_order_per_customer). Map-side top-k cut
    per batch FIRST (a batch can only contribute k rows per customer), so
    the bucket shuffle carries <= k rows per (batch, customer) -- the
    grouped analog of top_orders' limit pushdown."""
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def local_cut(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["o_custkey", "o_totalprice", "o_orderkey"],
                          ascending=[True, False, True], kind="mergesort")
        return g.groupby("o_custkey", sort=False).head(k)

    def add_bucket(t: pa.Table) -> pa.Table:
        df = local_cut(t.to_pandas())
        keys = df["o_custkey"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(keys) % np.uint64(n_buckets)).astype(np.int64)
        df["__bucket"] = b
        return pa.Table.from_pandas(df, preserve_index=False)

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        g = local_cut(g)
        g["rnk"] = g.groupby("o_custkey", sort=False).cumcount() + 1
        return g[["o_custkey", "rnk", "o_orderkey", "o_totalprice"]]

    return _round_cols(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])
        .map_batches(add_bucket, batch_format="pyarrow", batch_size=65536)
        .groupby("__bucket").map_groups(topk, batch_format="pandas"),
        ["o_totalprice"],
    )
