"""Training-data SELECTION operators: leakage-safe dataset splits and
DSIR-style importance weighting.

Two pillars of LLM corpus curation that sit downstream of dedup:

* `cluster_split` -- train/val/test assignment where the atomic unit is a
  NEAR-DUPLICATE CLUSTER, not a document.  Splitting docs independently
  leaks near-copies of training docs into eval (the classic contamination
  failure measured by Lee et al. 2022 "Deduplicating Training Data Makes
  Language Models Better"); hashing the cluster canonical instead puts the
  whole component on one side of every boundary by construction.

* `dsir_log_weights` / `dsir_select` -- Data Selection via Importance
  Resampling (Xie et al. 2023, NeurIPS): hashed-n-gram bag-of-words models
  for a target distribution vs the raw corpus, per-document log importance
  weight, and top-k selection.  The feature space is hashed unigrams +
  bigrams over the same `[a-z0-9_]+` lowercase tokenizer the text-analysis
  family uses (oracle parity for the tokenizer is already proven by
  `top_bigrams`).

Reference analog: the reference curates its corpus with static per-dataset
filters (bioel data_utils.py dataset splits are random at mention level);
these operators are the scale-correct replacements a 100-TB corpus needs.

Scale shape:
- split assignment is a PURE FUNCTION of the canonical id -- zero shuffle
  on top of the dedup assignments it composes with;
- the DSIR model is a 2 x n_buckets count table built by per-batch
  bincount combiners (the shuffle carries (bucket, partial) rows, never
  token streams); the fitted log-ratio array is ~32 KB and ships to the
  scoring pass by closure (well under any broadcast bound);
- scoring is a second streaming pass: one bincount per batch, no shuffle.
  Two passes over the text mirror the DSIR paper's fit-then-score design;
  at 10^12 docs the fit pass can run on a sample without changing shape.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from biomedical_entity_linking_ray.functions import hashing
from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
from biomedical_entity_linking_ray.pipelines.text_analysis import (
    _LOWER_WORD,
    read_documents,
)

# floor(0.8 * 2^64) and floor(0.9 * 2^64): exact integer literals shared
# with the SQL oracle so the uint64-hash split boundaries match bit-for-bit
T_TRAIN_DEFAULT = (2**64 * 8) // 10
T_VAL_DEFAULT = (2**64 * 9) // 10


def cluster_split(
    sf_dir: str,
    seed: int = 42,
    t_train: int = T_TRAIN_DEFAULT,
    t_val: int = T_VAL_DEFAULT,
) -> "ray.data.Dataset":
    """(doc_id, canonical_id, split): leakage-safe train/val/test split.

    Composes the oracle-green `minhash_dedup_assignments` (doc -> near-dup
    cluster canonical) with a deterministic per-CLUSTER hash split:
    h = splitmix64(canonical ^ seed); h < t_train -> 'train',
    h < t_val -> 'val', else 'test'.  Every member of a near-dup component
    shares a canonical, hence a split -- no near-duplicate pair ever
    straddles a boundary.  Fractions are uint64 thresholds (defaults
    0.8/0.1/0.1) so the decision is exact integer compare, reproducible
    across runs, partitionings and cluster sizes.
    """
    from biomedical_entity_linking_ray.pipelines import dedup

    asg = dedup.minhash_dedup_assignments(sf_dir)
    tt = np.uint64(t_train)
    tv = np.uint64(t_val)
    sd = np.uint64(seed)

    def attach(t: pa.Table) -> pa.Table:
        c = t["canonical_id"].to_numpy().astype(np.uint64)
        h = hashing.splitmix64(c ^ sd)
        split = np.where(h < tt, "train", np.where(h < tv, "val", "test"))
        return pa.table({
            "doc_id": t["doc_id"],
            "canonical_id": t["canonical_id"],
            "split": pa.array(split, pa.string()),
        })

    return asg.map_batches(attach, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# DSIR hashed-n-gram importance weighting
# ---------------------------------------------------------------------------

_ROTR1_HIGH = np.uint64(1) << np.uint64(63)


def _pack8(tokens: list[str]) -> np.ndarray:
    """uint64 key per token: first 8 bytes little-endian, NUL-padded.

    Tokens come from the `[a-z0-9_]+` tokenizer so they are pure ASCII by
    construction -- byte j equals the codepoint of char j, which is exactly
    what the SQL oracle recomputes with unicode(substr(tok, j, 1)).  Longer
    tokens hash on their 8-byte prefix (a deterministic collision both
    sides share; DSIR's hashing is lossy by design).
    """
    if not tokens:
        return np.zeros(0, dtype=np.uint64)
    b = np.array(tokens, dtype="S8")  # ASCII by tokenizer construction
    # an S8 element's 8 bytes ARE the little-endian uint64 packing: one
    # zero-copy view instead of a (n, 8) shift matrix (measured 30x); the
    # explicit '<u8' keeps the value platform-independent
    return np.ascontiguousarray(b).view(np.dtype("<u8")).astype(
        np.uint64, copy=False)


def _doc_features(
    texts: list[str], n_buckets: int
) -> tuple[np.ndarray, np.ndarray]:
    """Hashed unigram+bigram bucket stream for a batch of documents.

    Returns (buckets, row_ids): one int64 bucket in [0, n_buckets) per
    n-gram occurrence, with the document row it came from.  Unigram bucket
    = splitmix64(pack8(tok)) % B; bigram bucket mixes the two unigram
    hashes asymmetrically (a ^ rotr1(b), then one more splitmix64) so
    ("x y") and ("y x") land apart.  All numpy; the only per-row Python is
    the regex findall the whole text-analysis family already uses.
    """
    toks_per_doc = [_LOWER_WORD.findall(s.lower()) for s in texts]
    counts = np.fromiter((len(t) for t in toks_per_doc), dtype=np.int64,
                         count=len(toks_per_doc))
    flat = [tok for toks in toks_per_doc for tok in toks]
    hu = hashing.splitmix64(_pack8(flat))
    offs = np.zeros(counts.size + 1, dtype=np.int64)
    np.cumsum(counts, out=offs[1:])
    B = np.uint64(n_buckets)

    uni = (hu % B).astype(np.int64)
    uni_rows = np.repeat(np.arange(counts.size, dtype=np.int64), counts)

    if hu.size >= 2:
        a, b = hu[:-1], hu[1:]
        rot = (b >> np.uint64(1)) | ((b & np.uint64(1)) << np.uint64(63))
        hb = hashing.splitmix64(a ^ rot)
        keep = np.ones(hu.size - 1, dtype=bool)
        # no bigram across a doc boundary; empty docs make boundaries
        # coincide (or fall outside the valid bigram range), hence the mask
        cut = offs[1:-1]
        cut = cut[(cut > 0) & (cut < hu.size)]
        keep[cut - 1] = False
        bi = (hb[keep] % B).astype(np.int64)
        bi_rows = np.repeat(np.arange(counts.size, dtype=np.int64),
                            np.maximum(counts - 1, 0))
    else:
        bi = np.zeros(0, dtype=np.int64)
        bi_rows = np.zeros(0, dtype=np.int64)

    return np.concatenate([uni, bi]), np.concatenate([uni_rows, bi_rows])


def _fit_dsir_ratios(
    sf_dir: str, target_lang: str, n_buckets: int
) -> np.ndarray:
    """Fit the DSIR model: per-bucket log((p_target)/(p_raw)) with add-one
    smoothing.  Per-batch bincount combiners emit (bucket, nt, nq) partials
    (<= n_buckets rows per batch regardless of batch token volume), one
    small bucketed groupby merges them, and the 2 x B count table collapses
    to a B-float ratio array on the driver (~32 KB at B=4096)."""
    bidx = np.arange(n_buckets, dtype=np.int64)

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = np.asarray(t["lang"].to_pylist(), dtype=object)
        buckets, rows = _doc_features(texts, n_buckets)
        nq = np.bincount(buckets, minlength=n_buckets)
        is_t = (langs == target_lang)[rows]
        nt = np.bincount(buckets[is_t], minlength=n_buckets)
        return pa.table({
            "bucket": pa.array(bidx),
            "nt": pa.array(nt.astype(np.int64)),
            "nq": pa.array(nq.astype(np.int64)),
        })

    counts = bucketed_aggregate(
        read_documents(sf_dir, ["text", "lang"]).map_batches(
            partial, batch_format="pyarrow", batch_size=2048),
        ["bucket"], {"nt": ("nt", "sum"), "nq": ("nq", "sum")},
    ).to_pandas()

    nt = np.zeros(n_buckets, dtype=np.int64)
    nq = np.zeros(n_buckets, dtype=np.int64)
    nt[counts["bucket"].to_numpy()] = counts["nt"].to_numpy()
    nq[counts["bucket"].to_numpy()] = counts["nq"].to_numpy()
    tt = int(nt.sum())
    tq = int(nq.sum())
    # log p_target(b) - log p_raw(b), add-one smoothed (Xie et al. 2023 §3)
    return (np.log(nt + 1.0) - np.log(float(tt + n_buckets))
            - np.log(nq + 1.0) + np.log(float(tq + n_buckets)))


def dsir_log_weights(
    sf_dir: str, target_lang: str = "en", n_buckets: int = 4096
) -> "ray.data.Dataset":
    """(doc_id, n_features, log_weight): DSIR importance weight per doc.

    log_weight = sum over the doc's hashed n-gram occurrences of
    log(p_target(bucket)) - log(p_raw(bucket)); target = docs whose `lang`
    equals `target_lang`, raw = the whole corpus.  Rounded to 4 decimals
    (the knn/cosine oracle convention) so ranking and hashing agree with
    the SQL oracle to the last kept digit.  Docs with zero tokens carry
    (0, 0.0).
    """
    r = _fit_dsir_ratios(sf_dir, target_lang, n_buckets)

    def score(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        buckets, rows = _doc_features(texts, n_buckets)
        logw = np.bincount(rows, weights=r[buckets], minlength=n)
        nfeat = np.bincount(rows, minlength=n)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_features": pa.array(nfeat.astype(np.int64)),
            # + 0.0 normalizes IEEE -0.0 so the value-hash matches SQL
            "log_weight": pa.array(np.round(logw, 4) + 0.0),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        score, batch_format="pyarrow", batch_size=2048)


def dsir_select(
    sf_dir: str, k: int = 200, target_lang: str = "en", n_buckets: int = 4096
) -> "ray.data.Dataset":
    """Top-k docs by DSIR importance weight (ties broken by doc_id asc) --
    the deterministic-selection variant of the paper's Gumbel resampling
    (seeded Gumbel noise would bolt on via splitmix64(doc_id ^ seed) without
    changing the shape).  Ranking happens on the ROUNDED weight, so the
    order is reproducible and oracle-exact."""
    w = dsir_log_weights(sf_dir, target_lang=target_lang, n_buckets=n_buckets)
    return (w.select_columns(["doc_id", "log_weight"])
             .sort(["log_weight", "doc_id"], descending=[True, False])
             .limit(k))


_U64_DENOM = float(2**64)


def dsir_resample(
    sf_dir: str,
    k: int = 200,
    seed: int = 7,
    target_lang: str = "en",
    n_buckets: int = 4096,
) -> "ray.data.Dataset":
    """Gumbel top-k importance RESAMPLING -- the sampler the DSIR paper
    actually uses (sampling k docs without replacement with probability
    proportional to exp(log_weight), via the Gumbel-max trick).

    gumbel_key = log_weight + g,  g = -ln(-ln(u)),
    u = (splitmix64(doc_id ^ seed) + 0.5) / 2^64

    The noise is a pure function of (doc_id, seed), so the sample is
    deterministic across runs, partitionings and cluster sizes -- the same
    contract every sampling operator in this engine honors -- and the
    DuckDB oracle replays it exactly (same splitmix64 chain, same double
    conversion, ROUND(.,4) on the key before ranking with doc_id
    tiebreak).  Shape: one extra vectorized map over the (doc_id,
    log_weight) stream + the same sort/limit top-k as dsir_select.
    """
    sd = np.uint64(seed)
    w = dsir_log_weights(sf_dir, target_lang=target_lang, n_buckets=n_buckets)

    def add_key(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy().astype(np.uint64)
        h = hashing.splitmix64(ids ^ sd)
        u = (h.astype(np.float64) + 0.5) / _U64_DENOM
        g = -np.log(-np.log(u))
        lw = t["log_weight"].to_numpy()
        return pa.table({
            "doc_id": t["doc_id"],
            "log_weight": t["log_weight"],
            "gumbel_key": pa.array(np.round(lw + g, 4) + 0.0),
        })

    return (w.select_columns(["doc_id", "log_weight"])
             .map_batches(add_key, batch_format="pyarrow")
             .sort(["gumbel_key", "doc_id"], descending=[True, False])
             .limit(k))


def domain_mix(
    sf_dir: str,
    weights: dict[str, int] | None = None,
    seed: int = 42,
) -> "ray.data.Dataset":
    """(doc_id, source): deterministic subsample whose SOURCE MIXTURE
    follows the given integer weights -- the domain-reweighting step of an
    LLM corpus recipe (the Pile / DoReMi-style mixture tables), as a
    map-side filter.

    Semantics: with per-source counts n_s and weights w_s (default 1;
    sources absent from `weights` get 1, weight 0 excludes the source),
    the feasible budget is T = min_s floor(n_s / w_s) "units", the
    per-source target is w_s * T docs, and a doc survives iff
    splitmix64(doc_id ^ seed) < (w_s * T * 2^64) // n_s.  All integer
    arithmetic, so the SQL oracle replays the decision bit-for-bit; sampled
    counts are Binomial around the target (the price of the zero-shuffle
    hash-threshold design -- an exact-count variant would need a
    per-source rank, i.e. a shuffle).

    Scale shape: one combiner pass for the per-source count table (the
    shuffle carries (source, partial_count) rows -- domains number in the
    hundreds, not the billions), thresholds fold to a tiny driver dict,
    and the filter itself is a pure map over the stream.
    """
    docs = read_documents(sf_dir, ["doc_id", "source"])

    def count_partial(t: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(t["source"].to_pylist()).value_counts()
        return pa.table({
            "source": pa.array(vc.index.to_numpy(), pa.string()),
            "n": pa.array(vc.to_numpy(np.int64)),
        })

    cnt = bucketed_aggregate(
        docs.map_batches(count_partial, batch_format="pyarrow",
                         batch_size=4096),
        ["source"], {"n": ("n", "sum")},
    ).to_pandas()
    w = weights or {}
    n_by_src = dict(zip(cnt["source"], cnt["n"].astype(int)))
    per_unit = [n // w.get(s, 1) for s, n in n_by_src.items()
                if w.get(s, 1) > 0]
    t_units = min(per_unit) if per_unit else 0
    # threshold as exact Python ints; stored as thr-1 so the uint64 compare
    # below never has to represent 2^64 (thr == 2^64 means accept-all)
    thr = {s: (w.get(s, 1) * t_units * 2**64) // n
           for s, n in n_by_src.items()}
    srcs = list(thr)
    thr_m1 = np.array([max(thr[s], 1) - 1 for s in srcs], dtype=np.uint64)
    nonzero = np.array([thr[s] > 0 for s in srcs], dtype=bool)
    sd = np.uint64(seed)

    def pick(t: pa.Table) -> pa.Table:
        import pandas as pd

        idx = pd.Index(srcs).get_indexer(t["source"].to_pylist())
        h = hashing.splitmix64(
            t["doc_id"].to_numpy().astype(np.uint64) ^ sd)
        keep = nonzero[idx] & (h <= thr_m1[idx])
        sel = pa.array(np.flatnonzero(keep), pa.int64())
        return pa.table({"doc_id": t["doc_id"].take(sel),
                         "source": t["source"].take(sel)})

    return docs.map_batches(pick, batch_format="pyarrow")
