"""Text-analysis operators over the `documents` table.

Large-scale training-data hygiene stages, each a vectorized `map_batches`
over zero-copy Arrow (reference analogs: mention-text normalization M1-M5 and
dataset statistics A5 in SURVEY.md 2.2/2.5):

- token counting       (whitespace/word-regex tokens; SQL-oracle-able)
- quality scoring      (length / punctuation / stopword / repetition ratios)
- language ID          (stopword-profile n-gram heuristic; no oracle)
- fingerprinting       (rolling min-hash document fingerprint; rows-only)
- token packing        (concat-then-chunk training bins via a distributed
                        prefix scan; SQL-oracle-able window function)

Every function takes `sf_dir` and reads only the columns it needs.
"""

from __future__ import annotations

import os
import re

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_WORD = re.compile(r"[A-Za-z0-9_]+")

# tiny per-language stopword profiles for the heuristic language ID
# (deterministic, vocabulary-based -- a standard n-gram/stopword LID shape)
_LID_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "it", "for", "on"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "para", "que"},
    "zh": set(),  # CJK handled by a codepoint-ratio rule below
}


def read_documents(sf_dir: str, columns: list[str]) -> "ray.data.Dataset":
    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def token_counts(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tokens, n_chars_norm): word-regex token count per doc."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = np.fromiter((len(_WORD.findall(s)) for s in texts), dtype=np.int64, count=len(texts))
        n_chr = np.fromiter((len(s) for s in texts), dtype=np.int64, count=len(texts))
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_chars_norm": pa.array(n_chr),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def repetition_scores(sf_dir: str) -> "ray.data.Dataset":
    """(doc_id, n_tokens, dup_token_frac, top_token_frac, top_bigram_frac):
    intra-document repetition signals -- the Gopher-style quality-filter
    family (Rae et al. 2021, 'Scaling Language Models', app. A1.3: duplicate
    n-gram / top-n-gram fractions), the filters a training-data pipeline
    applies before dedup to drop boilerplate and degenerate repetition.
    Zero-token docs emit no row (they have no repetition statistics).

    Shape at scale: one content pass, no shuffle -- all three fractions are
    per-doc, computed from one vectorized FNV pass over the batch's tokens
    plus np.unique counts per doc (count-on-64-bit-hash == count-on-string
    whp; a collision needs two distinct tokens of one doc to collide in
    2^64). Streams to the sink."""
    from biomedical_entity_linking_ray.functions import hashing

    P = np.uint64(0x100000001B3)

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        toks = [_WORD.findall(s) for s in texts]
        flat = [w for ws in toks for w in ws]
        h = (hashing.fnv1a_fixed(flat, width=32) if flat
             else np.zeros(0, np.uint64))
        keep: list[int] = []
        n_tok: list[int] = []
        dup_f: list[float] = []
        top_t: list[float] = []
        top_b: list[float] = []
        pos = 0
        with np.errstate(over="ignore"):
            for i, ws in enumerate(toks):
                m = len(ws)
                hh = h[pos:pos + m]
                pos += m
                if m == 0:
                    continue
                _, counts = np.unique(hh, return_counts=True)
                keep.append(i)
                n_tok.append(m)
                dup_f.append(1.0 - counts.size / m)
                top_t.append(counts.max() / m)
                if m < 2:
                    top_b.append(0.0)
                else:
                    bg = hashing.splitmix64(hh[:-1] * P + hh[1:])
                    _, bc = np.unique(bg, return_counts=True)
                    top_b.append(bc.max() / (m - 1))
        ids = t["doc_id"].take(pa.array(keep, pa.int64()))
        return pa.table({
            "doc_id": ids,
            "n_tokens": pa.array(np.asarray(n_tok, dtype=np.int64)),
            "dup_token_frac": pa.array(np.asarray(dup_f, dtype=np.float64)),
            "top_token_frac": pa.array(np.asarray(top_t, dtype=np.float64)),
            "top_bigram_frac": pa.array(np.asarray(top_b, dtype=np.float64)),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096)


class QualityScorer:
    """Actor-pool callable: compiled regexes + stopword set as per-actor state.

    Outputs are exact integers (token / stopword / punctuation / distinct-token
    / char counts) plus `quality_q4`, the blended score quantized to 1e-4 as an
    integer via floor(q*10000 + 0.5). Both choices exist so a SQL oracle can
    reproduce the result bit-for-bit: ratios rounded as floats trip over
    round-half-to-even vs round-half-away at exact binary halves, whereas the
    identical IEEE expression + floor is engine-independent. Punctuation is
    the explicit ASCII class [^A-Za-z0-9_ \\t\\n\\r] (``\\w``/``\\s`` are
    unicode-dependent and differ between regex engines).
    """

    def __init__(self):
        self.word = _WORD
        self.punct = re.compile(r"[^A-Za-z0-9_ \t\n\r]")
        self.stop = _LID_PROFILES["en"]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        n_tok = np.empty(n, np.int64)
        n_stop = np.empty(n, np.int64)
        n_punct = np.empty(n, np.int64)
        n_uniq = np.empty(n, np.int64)
        n_chars = np.empty(n, np.int64)
        for i, s in enumerate(texts):
            toks = self.word.findall(s.lower())
            n_tok[i] = len(toks)
            n_stop[i] = sum(1 for w in toks if w in self.stop)
            n_punct[i] = len(self.punct.findall(s))
            n_uniq[i] = len(set(toks))
            n_chars[i] = len(s)
        denom_tok = np.maximum(n_tok, 1)
        quality = (
            np.minimum(n_tok / 32.0, 1.0) * 0.3
            + (1.0 - n_punct / np.maximum(n_chars, 1)) * 0.2
            + (n_uniq / denom_tok) * 0.3
            + np.minimum(n_stop / denom_tok * 4, 1.0) * 0.2
        )
        quality_q4 = np.floor(quality * 10000 + 0.5).astype(np.int64)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_tokens": pa.array(n_tok),
            "n_stopwords": pa.array(n_stop),
            "n_punct": pa.array(n_punct),
            "n_unique_tokens": pa.array(n_uniq),
            "n_chars": pa.array(n_chars),
            "quality_q4": pa.array(quality_q4),
        })


def quality_scores(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        QualityScorer, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


class LanguageId:
    """Stopword-profile language identifier (actor pool; profiles built once)."""

    def __init__(self):
        self.profiles = {k: v for k, v in _LID_PROFILES.items() if v}
        self.word = _WORD

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        langs = []
        for s in texts:
            cjk = sum(1 for ch in s[:400] if "一" <= ch <= "鿿")
            if cjk > len(s[:400]) * 0.05:
                langs.append("zh")
                continue
            toks = set(self.word.findall(s.lower())[:200])
            best, best_hits = "unknown", 0
            for lang, prof in self.profiles.items():
                hits = len(toks & prof)
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best if best_hits >= 1 else "unknown")
        return pa.table({
            "doc_id": t["doc_id"],
            "lang_true": t["lang"],
            "lang_pred": pa.array(langs, pa.string()),
        })


def language_id(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    return read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        LanguageId, batch_format="pyarrow", batch_size=4096, concurrency=concurrency
    )


# fixed probe dictionary for the broadcast-extractor query: words planted in
# the synthetic documents vocabulary (TESTDATA.md)
EXTRACT_TERMS = ["table", "value", "batch", "merge", "scan", "hash", "row", "fast"]


def dictionary_extract(sf_dir: str, concurrency: int = 2) -> "ray.data.Dataset":
    """(doc_id, term, n_occurrences): broadcast-dictionary scan of documents
    (reference M14/T12: trie entity extractor with per-worker unpickled state,
    extract_pubmed_entities.py:40-128). The term list is `ray.put` once and
    each actor builds its matcher in __init__."""
    from biomedical_entity_linking_ray.stages.extraction import dictionary_match_counts

    docs = read_documents(sf_dir, ["doc_id", "text"])
    return dictionary_match_counts(docs, EXTRACT_TERMS, concurrency=concurrency)


def token_packing(
    sf_dir: str, capacity: int = 512, n_ranges: int | None = None,
) -> "ray.data.Dataset":
    """(doc_id, n_tokens, bin_id, bin_offset): greedy concat-then-chunk packing.

    Documents are concatenated in doc_id order into one token stream and cut
    into fixed-`capacity` training bins (the standard pretraining packing
    shape); each doc reports the bin and in-bin offset where its first token
    lands. Docs may span bins -- exactly the chunked-stream semantics.

    Distributed prefix scan (ONE content pass, one skinny shuffle):
    1. per-doc token counts via map_batches (content read once, then dropped);
    2. contiguous doc_id ranges; per-range token sums aggregate to one row
       per range, whose exclusive prefix is computed driver-side (n_ranges
       scalars -- at 10^12 docs the driver holds range sums, never rows)
       and broadcast;
    3. per-range vectorized in-order cumsum + broadcast base offset.
    """
    import ray as _ray
    from ray.data.aggregate import Max, Min

    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    # cluster-derived: a range's pack_range group holds ~N/n_ranges skinny
    # (id, count) rows, so a fixed literal would grow per-task memory with
    # the corpus; the driver still only ever holds n_ranges scalars
    n_ranges = n_ranges or default_buckets()

    def count_fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n_tok = np.fromiter((len(_WORD.findall(s)) for s in texts),
                            dtype=np.int64, count=len(texts))
        return pa.table({"doc_id": t["doc_id"], "n_tokens": pa.array(n_tok)})

    counts = read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        count_fn, batch_format="pyarrow", batch_size=4096
    ).materialize()  # skinny (id, count); branch-consumed below
    if counts.count() == 0:
        return ray.data.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("n_tokens", pa.int64()),
             ("bin_id", pa.int64()), ("bin_offset", pa.int64())]).empty_table())

    mm = counts.aggregate(Min("doc_id"), Max("doc_id"))
    lo, hi = int(mm["min(doc_id)"]), int(mm["max(doc_id)"])
    span = max(1, (hi - lo + n_ranges) // n_ranges)

    def add_range(t: pa.Table) -> pa.Table:
        r = (t["doc_id"].to_numpy() - lo) // span
        return t.append_column("__range", pa.array(r.astype(np.int64)))

    ranged = counts.map_batches(add_range, batch_format="pyarrow")
    range_sums = bucketed_aggregate(
        ranged, ["__range"], {"tok_sum": ("n_tokens", "sum")}, n_buckets=16,
    ).to_pandas().sort_values("__range")
    base = dict(zip(
        range_sums["__range"],
        np.concatenate([[0], np.cumsum(range_sums["tok_sum"].to_numpy())[:-1]]),
    ))
    base_ref = _ray.put(base)

    def pack_range(g: pd.DataFrame) -> pd.DataFrame:
        b = cached_broadcast(base_ref)
        g = g.sort_values("doc_id").reset_index(drop=True)
        ntok = g["n_tokens"].to_numpy()
        prev = np.cumsum(ntok) - ntok + int(b[int(g["__range"].iloc[0])])
        return pd.DataFrame({
            "doc_id": g["doc_id"], "n_tokens": g["n_tokens"],
            "bin_id": prev // capacity, "bin_offset": prev % capacity,
        })

    return ranged.groupby("__range").map_groups(pack_range, batch_format="pandas")


def fingerprints(sf_dir: str, window: int = 32) -> "ray.data.Dataset":
    """(doc_id, fingerprint): winnowing-style rolling-hash min fingerprint."""
    from biomedical_entity_linking_ray.functions import hashing

    def fn(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        fps = np.fromiter(
            (hashing.rolling_fingerprint(s, window) for s in texts),
            dtype=np.uint64, count=len(texts),
        )
        return pa.table({"doc_id": t["doc_id"], "fingerprint": pa.array(fps)})

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


_LOWER_WORD = re.compile(r"[a-z0-9_]+")


def top_bigrams(sf_dir: str, k: int = 100) -> "ray.data.Dataset":
    """Corpus-level bigram frequency, global top-k by (count desc, bigram
    asc) -- the n-gram statistics pass of a training-data pipeline
    (contamination screens, boilerplate detection).

    Shape at scale: per-batch value_counts is the combiner (the shuffle
    carries (bigram, partial_count), never token streams); the exact merge
    goes through the bucketed path because bigram cardinality scales with
    the corpus; then a per-block top-k cut -- each bigram exists exactly
    once after the merge, so any member of the global top-k is beaten by
    fewer than k rows within its own block and survives the cut -- leaves
    the final all-to-all sort with <= k x num_blocks rows."""
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        bigs: list[str] = []
        for s in t["text"].to_pylist():
            w = _LOWER_WORD.findall(s.lower())
            bigs.extend(map(" ".join, zip(w, w[1:])))
        if not bigs:
            return pa.table({"bigram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(bigs).value_counts()
        return pa.table({"bigram": pa.array(vc.index.to_numpy(), pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = bucketed_aggregate(
        read_documents(sf_dir, ["text"]).map_batches(
            partial, batch_format="pyarrow", batch_size=4096),
        ["bigram"], {"n": ("n", "sum")})

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(["n", "bigram"],
                              ascending=[False, True]).head(k)

    return counts.map_batches(local_topk, batch_format="pandas") \
        .sort(["n", "bigram"], descending=[True, False]).limit(k)


def chunk_documents(
    sf_dir: str, chunk_size: int = 32, overlap: int = 8,
) -> "ray.data.Dataset":
    """(doc_id, chunk_idx, chunk_start, n_tokens, chunk_text): sliding-window
    token chunks -- the context-window prep pass of a training/RAG pipeline
    (reference analog: the mention context windows of data_process.py, as a
    corpus-wide op). Starts at 0, stride, 2*stride, ... (stride = chunk_size
    - overlap) while start < n_tokens; the tail chunk is short; empty docs
    emit no chunks.

    Shape at scale: a pure flat map -- one content pass, rows fan out
    ~tokens/stride per doc, no shuffle, streaming all the way to the sink.
    Regex tokenization is inherently per-string (same shape as
    token_counts); everything around it is array building."""
    stride = chunk_size - overlap
    if stride <= 0:
        raise ValueError("overlap must be < chunk_size")

    def fn(t: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        cidx: list[int] = []
        cstart: list[int] = []
        ntok: list[int] = []
        ctext: list[str] = []
        for d, s in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            w = _WORD.findall(s)
            for j, st in enumerate(range(0, len(w), stride)):
                seg = w[st:st + chunk_size]
                doc_ids.append(d)
                cidx.append(j)
                cstart.append(st)
                ntok.append(len(seg))
                ctext.append(" ".join(seg))
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "chunk_idx": pa.array(cidx, pa.int64()),
            "chunk_start": pa.array(cstart, pa.int64()),
            "n_tokens": pa.array(ntok, pa.int64()),
            "chunk_text": pa.array(ctext, pa.string()),
        })

    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", batch_size=2048)


class PatternScrubber:
    """Actor-pool callable: compiled scrub patterns as per-actor state.

    Policy scrubbing / PII-removal shape: every match of each named pattern
    is replaced with ``[<NAME>]`` and counted; patterns apply IN ORDER, each
    over the previous pattern's output (so a later pattern never re-matches
    inside an earlier redaction marker, and the oracle can replicate the
    cascade step by step). Defaults target emails and long digit runs; the
    pattern list is a constructor arg so deployments swap in their policy."""

    DEFAULT_PATTERNS = (
        ("email", r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+\.[A-Za-z0-9.-]+"),
        ("number", r"[0-9]{6,}"),
    )

    def __init__(self, patterns=None):
        pats = tuple(patterns) if patterns is not None else self.DEFAULT_PATTERNS
        self.pats = [(name, re.compile(rx)) for name, rx in pats]

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        cols: dict = {"doc_id": t["doc_id"]}
        cur = texts
        for name, rx in self.pats:
            marker = f"[{name.upper()}]"
            nxt: list[str] = []
            cnt = np.zeros(len(cur), dtype=np.int64)
            for i, s in enumerate(cur):
                s2, k = rx.subn(marker, s)
                cnt[i] = k
                nxt.append(s2)
            cols[f"n_{name}"] = pa.array(cnt)
            cur = nxt
        cols["clean_text"] = pa.array(cur, pa.string())
        return pa.table(cols)


def scrub_patterns(
    sf_dir: str, patterns=None, concurrency: int = 2,
) -> "ray.data.Dataset":
    """(doc_id, n_<pattern>..., clean_text): sequential regex redaction over
    documents. Actor pool so the compiled pattern set is per-actor state."""
    return read_documents(sf_dir, ["doc_id", "text"]).map_batches(
        PatternScrubber,
        fn_constructor_kwargs={"patterns": patterns},
        concurrency=concurrency, batch_size=2048, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# per-language quality gate (quantile-thresholded filtering)
# ---------------------------------------------------------------------------

_QS_CACHE: list = []


def _scored_with_lang(sf_dir: str) -> "ray.data.Dataset":
    """Materialized skinny (doc_id, lang, quality_q4) table — the shared
    input of the quantile gate and the percentile normalizer."""

    def score_lang(t: pa.Table) -> pa.Table:
        if not _QS_CACHE:
            _QS_CACHE.append(QualityScorer())
        out = _QS_CACHE[0](t)
        return pa.table({
            "doc_id": out["doc_id"],
            "lang": t["lang"],
            "quality_q4": out["quality_q4"],
        })

    return read_documents(sf_dir, ["doc_id", "text", "lang"]).map_batches(
        score_lang, batch_format="pyarrow", batch_size=2048).materialize()


def quality_filtered(sf_dir: str, q: float = 0.8) -> "ray.data.Dataset":
    """Keep documents whose quality score is at or above their LANGUAGE's
    q-quantile -> (doc_id, lang, quality_q4). The Gopher/FineWeb-style
    quality gate, with the cut set per group rather than globally so a
    verbose language can't crowd out a terse one.

    The threshold is the exact discrete quantile (DuckDB `quantile_disc`
    semantics: element ceil(q*n)-1 of the sorted multiset), computed by the
    counting method -- quality_q4 is an integer in [0, 10000], so the
    threshold shuffle carries only (lang, value, count) triples regardless
    of corpus size (same trick as analytics.quantity_quantiles). The scored
    table is materialized once and reused by both the threshold aggregation
    and the filter pass; the per-language threshold map (|langs| rows) rides
    to the filter as a broadcast."""
    import math

    import ray as _ray
    from ray.data.aggregate import Sum

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    scored = _scored_with_lang(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["lang", "quality_q4"], as_index=False) \
            .agg(cnt=("quality_q4", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = scored.map_batches(partial, batch_format="pyarrow",
                                batch_size=131072) \
        .groupby(["lang", "quality_q4"]).aggregate(Sum("cnt", alias_name="cnt"))

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("quality_q4").reset_index(drop=True)
        c = g["cnt"].to_numpy().cumsum()
        n = int(c[-1])
        idx = max(math.ceil(q * n) - 1, 0)
        v = g.loc[np.searchsorted(c, idx + 1), "quality_q4"]
        return pd.DataFrame({"lang": [g.loc[0, "lang"]], "thr": [int(v)]})

    thr = counts.groupby("lang").map_groups(pick, batch_format="pandas") \
        .to_pandas()
    ref = _ray.put(thr)

    def keep(t: pa.Table) -> pa.Table:
        m = cached_broadcast(ref, lambda df: dict(zip(df["lang"], df["thr"])))
        th = t["lang"].to_pandas().map(m).to_numpy()
        mask = t["quality_q4"].to_numpy(zero_copy_only=False) >= th
        return t.filter(pa.array(mask))

    return scored.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# deterministic global shuffle + sharding (training output order)
# ---------------------------------------------------------------------------

def shuffle_shards(sf_dir: str, n_shards: int = 16,
                   seed: int = 42) -> "ray.data.Dataset":
    """Reproducible global shuffle for training output: (doc_id, shard, pos)
    with shard = splitmix64(doc_id ^ seed) % n_shards and pos = the 1-based
    rank of the hash within its shard (hash ties broken by doc_id, so the
    order is total and engine-independent).

    A seeded random permutation as a PURE FUNCTION of the row key -- unlike
    `Dataset.random_shuffle`, the assignment is stable across reruns,
    cluster sizes and partitionings, so a resumed job rebuilds byte-identical
    shards. One grouped shuffle on the bounded shard id; each shard sorts
    its (hash, doc_id) pairs vectorized -- payload columns would be attached
    AFTER sharding, never carried through the sort."""
    from biomedical_entity_linking_ray.functions import hashing

    def add(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = hashing.splitmix64(ids ^ np.uint64(seed))
        return pa.table({
            "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
            "shard": pa.array((h % np.uint64(n_shards)).astype(np.int64)),
            "h": pa.array(h, pa.uint64()),
        })

    def order(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["h", "doc_id"], kind="mergesort").reset_index(drop=True)
        g["pos"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["doc_id", "shard", "pos"]]

    return read_documents(sf_dir, ["doc_id"]).map_batches(
        add, batch_format="pyarrow", batch_size=65536) \
        .groupby("shard").map_groups(order, batch_format="pandas")


def quality_percentiles(sf_dir: str) -> "ray.data.Dataset":
    """Per-language percent-rank normalization of the quality score ->
    (doc_id, lang, quality_q4, pct_q4): pct_q4 = floor(percent_rank * 10000
    + 0.5) with percent_rank = (rank-1)/(n-1), ties sharing the minimum rank
    (SQL PERCENT_RANK() semantics; 0 for single-row groups).

    Score calibration across heterogeneous groups (a 0.7 raw score means
    different things in different languages). Same counting-method shape as
    `quality_filtered`: the rank table is built from (lang, value, count)
    triples -- bounded by |langs| x 10001 regardless of corpus size -- and
    broadcast back to the scored scan, where the percentile attach is one
    vectorized hash-map probe per row."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    scored = _scored_with_lang(sf_dir)

    def partial(t: pa.Table) -> pa.Table:
        g = t.to_pandas().groupby(["lang", "quality_q4"], as_index=False) \
            .agg(cnt=("quality_q4", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    counts = scored.map_batches(partial, batch_format="pyarrow",
                                batch_size=131072) \
        .groupby(["lang", "quality_q4"]).aggregate(Sum("cnt", alias_name="cnt")) \
        .to_pandas()  # bounded: <= |langs| * 10001 rows by construction

    pct_of: dict = {}
    for lang, g in counts.groupby("lang"):
        g = g.sort_values("quality_q4").reset_index(drop=True)
        c = g["cnt"].to_numpy()
        n = int(c.sum())
        rank_min = np.concatenate([[0], np.cumsum(c)[:-1]]) + 1  # ties: min rank
        if n > 1:
            pct = np.floor((rank_min - 1) / (n - 1) * 10000 + 0.5).astype(np.int64)
        else:
            pct = np.zeros(len(g), dtype=np.int64)
        for v, p in zip(g["quality_q4"].to_numpy(), pct):
            pct_of[(lang, int(v))] = int(p)
    ref = _ray.put(pct_of)

    def attach(t: pa.Table) -> pa.Table:
        # every (lang, quality_q4) the attach scan sees MUST be in the counts
        # map: both passes read the same materialized `scored` dataset
        # (_scored_with_lang caches/materializes), so a miss means the two
        # passes diverged -- fail loudly rather than emit a wrong percentile
        m = cached_broadcast(ref)
        langs = t["lang"].to_pylist()
        q4 = t["quality_q4"].to_numpy(zero_copy_only=False)

        def look(i: int) -> int:
            key = (langs[i], int(q4[i]))
            got = m.get(key)
            if got is None:
                raise KeyError(
                    f"quality_percentiles: {key} absent from the rank table; "
                    "the attach scan diverged from the counts pass")
            return got

        pct = np.fromiter((look(i) for i in range(len(q4))),
                          dtype=np.int64, count=len(q4))
        return t.append_column("pct_q4", pa.array(pct, pa.int64()))

    return scored.map_batches(attach, batch_format="pyarrow")


def top_tokens_by_lang(sf_dir: str, k: int = 10) -> "ray.data.Dataset":
    """Per-language heavy hitters: the k most frequent tokens within each
    language, (lang, token, n), ties by token ascending.

    Grouped variant of `top_bigrams`: per-batch (lang, token) value_counts
    is the combiner, the exact merge rides the bucketed path (token
    cardinality scales with the corpus), and the final per-group cut is ONE
    fine-grained groupby on the BOUNDED lang key -- each (lang, token)
    exists exactly once after the merge, so the in-group vectorized top-k
    is exact."""
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def partial(t: pa.Table) -> pa.Table:
        langs_out: list[str] = []
        toks_out: list[str] = []
        rows = []
        for lang, s in zip(t["lang"].to_pylist(), t["text"].to_pylist()):
            for w in _LOWER_WORD.findall(s.lower()):
                rows.append((lang, w))
        if not rows:
            return pa.table({"lang": pa.array([], pa.string()),
                             "token": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        vc = pd.Series(rows).value_counts()
        langs_out = [a for a, _ in vc.index]
        toks_out = [b for _, b in vc.index]
        return pa.table({"lang": pa.array(langs_out, pa.string()),
                         "token": pa.array(toks_out, pa.string()),
                         "n": pa.array(vc.to_numpy(np.int64))})

    counts = bucketed_aggregate(
        read_documents(sf_dir, ["text", "lang"]).map_batches(
            partial, batch_format="pyarrow", batch_size=4096),
        ["lang", "token"], {"n": ("n", "sum")})

    def topk(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["n", "token"],
                             ascending=[False, True]).head(k)

    return counts.groupby("lang").map_groups(topk, batch_format="pandas")


# ---------------------------------------------------------------------------
# Count-Min-sketch heavy hitters (exact THROUGH the probabilistic prune)
# ---------------------------------------------------------------------------

def _word_ngrams_flat(texts, n: int) -> pa.Array:
    """All word n-grams (space-joined) of a string column, flattened
    doc-major, fully vectorized: one split_pattern, one
    binary_join_element_wise over n shifted views of the flat word array,
    and an offset mask dropping grams that straddle a document boundary.
    Tokenization is a literal single-space split (string_split parity:
    empties kept), so the SQL oracle can replicate it verbatim."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    words = pc.split_pattern(texts, " ")
    flat = words.flatten()
    L = len(flat)
    if L < n:
        return pa.array([], pa.string())
    offs = words.offsets.to_numpy().astype(np.int64)
    parts = [flat.slice(i, L - n + 1) for i in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    idx = np.arange(L - n + 1, dtype=np.int64)
    doc_of = np.searchsorted(offs, idx, side="right") - 1
    keep = idx + n <= offs[doc_of + 1]
    return grams.filter(pa.array(keep))


from biomedical_entity_linking_ray.functions import hashing as _hashing

_CMS_SEEDS = _hashing.splitmix64(
    np.arange(1, 65, dtype=np.uint64) * np.uint64(0x9E3779B97F4A7C15))


def _cms_rows(grams_np: np.ndarray, depth: int, width: int):
    """Yield (d, bincount-ready row indices) per sketch row for a gram batch."""
    h = _hashing.fnv1a_fixed(grams_np, width=64)
    for d in range(depth):
        yield d, (_hashing.splitmix64(h ^ _CMS_SEEDS[d]) % np.uint64(width)) \
            .astype(np.int64)


def heavy_hitter_ngrams(
    sf_dir: str, n: int = 3, threshold: int = 4,
    depth: int = 4, width: int = 1 << 14,
) -> "ray.data.Dataset":
    """(gram, n): every word n-gram occurring >= `threshold` times across
    the corpus, with its EXACT count -- heavy-hitter mining via a Count-Min
    sketch prune (Cormode & Muthukrishnan 2005), the n-gram analog of the
    repo's bloom_semi_join contract: probabilistic structure prunes, exact
    pass verifies, result is value-exact.

    Why this shape at 100 TB: the naive plan is one groupby over EVERY gram
    occurrence -- an all-to-all whose key cardinality scales with the corpus.
    Here pass 1 folds the corpus into a depth x width integer sketch via
    Ray Data's native AggregateFn tree merge (per-block bincount combiner;
    the exchange carries O(blocks) fixed-size sketches, never grams). Pass 2
    re-scans map-side, keeping only grams whose sketch estimate clears the
    threshold -- CMS never underestimates, so survivors are a SUPERSET of the
    true heavy hitters regardless of collisions (hash truncation included).
    Pass 3 exact-counts the survivors through the bucketed groupby: its key
    cardinality is the (tiny) candidate set, not the vocabulary. Final
    filter n >= threshold discharges the false positives -- the output equals
    the oracle's GROUP BY ... HAVING exactly."""
    from ray.data.aggregate import AggregateFn

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    docs = read_documents(sf_dir, ["text"])
    _EMPTY_HH = pa.schema([("gram", pa.string()), ("n", pa.int64())])
    if docs.count() == 0:  # aggregate() returns None on an empty dataset
        return ray.data.from_arrow(_EMPTY_HH.empty_table())

    def acc_block(acc: np.ndarray, block) -> np.ndarray:
        texts = block["text"] if isinstance(block, pa.Table) \
            else pa.array(block["text"])
        grams = _word_ngrams_flat(texts, n)
        if len(grams):
            g = grams.to_numpy(zero_copy_only=False)
            for d, idx in _cms_rows(g, depth, width):
                acc[d] += np.bincount(idx, minlength=width)
        return acc

    cms = docs.aggregate(AggregateFn(
        init=lambda _k: np.zeros((depth, width), np.int64),
        accumulate_block=acc_block,
        merge=lambda a, b: a + b,
        name="cms"))["cms"]
    cms_ref = ray.put(cms)

    def survivors(t: pa.Table) -> pa.Table:
        sk = cached_broadcast(cms_ref)
        grams = _word_ngrams_flat(t["text"], n)
        if len(grams) == 0:
            return pa.table({"gram": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        uniq, cnt = np.unique(grams.to_numpy(zero_copy_only=False),
                              return_counts=True)
        est = np.full(uniq.size, np.iinfo(np.int64).max)
        for d, idx in _cms_rows(uniq, depth, width):
            np.minimum(est, sk[d][idx], out=est)
        keep = est >= threshold
        return pa.table({"gram": pa.array(uniq[keep], pa.string()),
                         "n": pa.array(cnt[keep], pa.int64())})

    cand = docs.map_batches(survivors, batch_format="pyarrow")
    counts = bucketed_aggregate(cand, ["gram"], {"n": ("n", "sum")})
    return counts.filter(expr=f"n >= {threshold}")
