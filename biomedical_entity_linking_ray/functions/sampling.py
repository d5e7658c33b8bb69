"""Deterministic seeded sampling operators (reference O7).

The reference samples with process-local RNG (seeded 10% entity drop,
BiEncoderLightningDataModule.py:209-227; <=50 pairs/cui,
sapbert/data/utils.py:39-57; and one UNSEEDED gold-label choice,
data_utils.py:291-294 -- the carelessness SURVEY.md 7.4 calls out). Under
unordered parallel execution an RNG stream is nondeterministic, so sampling
here is keyed-hash: a row survives iff md5(key:seed) falls under the rate
threshold. Same key + seed -> same decision on any worker, any run, any
engine -- md5 specifically so a SQL oracle can reproduce the exact sample.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data


def keyed_sample_threshold(rate: float) -> str:
    """Hex threshold such that md5(key)[:8] < threshold keeps ~rate of keys."""
    return format(min(int(rate * 16**8), 16**8 - 1), "08x")


def keyed_sample(
    ds: "ray.data.Dataset", key_col: str, rate: float, seed: int = 42,
) -> "ray.data.Dataset":
    """Keep ~`rate` of rows, decided by md5 of (key, seed) -- deterministic
    at any parallelism. Comparison is on the first 8 hex chars (fixed-width
    lowercase hex compares like the underlying 32-bit integer)."""
    thresh = keyed_sample_threshold(rate)

    def flt(t: pa.Table) -> pa.Table:
        keys = t[key_col].to_pylist()
        keep = [
            hashlib.md5(f"{k}:{seed}".encode()).hexdigest()[:8] < thresh
            for k in keys
        ]
        return t.filter(pa.array(keep))

    return ds.map_batches(flt, batch_format="pyarrow")
