"""Broadcast-dictionary text extraction (reference M13/M14/T12).

The reference builds a char-trie over an entity dictionary, unpickles it once
per worker and scans document text at word starts, then resolves overlapping
hits (extract_pubmed_entities.py:8-128). Here the same shape is Ray-native:

- the dictionary is `ray.put` ONCE and each actor builds its matcher state
  (compiled alternation regex = the scanning automaton) in ``__init__`` --
  the canonical broadcast-big-state-into-actor-pool pattern (T12);
- `DictionaryMatcher` emits per-(doc, term) non-overlapping occurrence
  counts (SQL-oracle-able);
- `extract_spans` emits (doc_id, term, start, end) hits and
  `filter_overlapping_spans` keeps leftmost-longest spans per doc (M13).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


class DictionaryMatcher:
    """Actor-pool callable: per-(doc, term) substring occurrence counts.

    `terms_ref` is a `ray.put` ObjectRef of the term list -- fetched once per
    actor in __init__, never per batch. Counts are non-overlapping
    left-to-right (`str.count` semantics, reproducible in SQL via
    length-delta / replace).
    """

    def __init__(self, terms_ref):
        self.terms = sorted(set(ray.get(terms_ref)))

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, terms, counts = [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            low = text.lower()
            for term in self.terms:
                c = low.count(term)
                if c:
                    doc_ids.append(doc_id)
                    terms.append(term)
                    counts.append(c)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "n_occurrences": pa.array(counts, pa.int64()),
        })


def dictionary_match_counts(
    docs: "ray.data.Dataset", terms: list[str], concurrency: int = 2,
) -> "ray.data.Dataset":
    """docs(doc_id, text) x broadcast term dictionary -> occurrence counts."""
    terms_ref = ray.put(list(terms))
    return docs.map_batches(
        DictionaryMatcher,
        fn_constructor_args=(terms_ref,),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


class SpanExtractor:
    """Actor-pool callable emitting (doc_id, term, start, end) spans.

    The compiled alternation regex (longest terms first, so regex alternation
    prefers the longest match at each position -- the trie's longest-match
    rule, extract_pubmed_entities.py:75-102) is built once per actor.
    """

    def __init__(self, terms_ref):
        terms = sorted(set(ray.get(terms_ref)), key=lambda s: (-len(s), s))
        self.pat = re.compile("|".join(re.escape(x) for x in terms))

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids, terms, starts, ends = [], [], [], []
        for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
            for m in self.pat.finditer(text.lower()):
                doc_ids.append(doc_id)
                terms.append(m.group(0))
                starts.append(m.start())
                ends.append(m.end())
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "term": pa.array(terms, pa.string()),
            "start": pa.array(starts, pa.int64()),
            "end": pa.array(ends, pa.int64()),
        })


def extract_spans(
    docs: "ray.data.Dataset", terms: list[str], concurrency: int = 2,
) -> "ray.data.Dataset":
    terms_ref = ray.put(list(terms))
    return docs.map_batches(
        SpanExtractor,
        fn_constructor_args=(terms_ref,),
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=concurrency,
    )


def resolve_abbreviations(
    spans: "ray.data.Dataset",
    abbrev_map: dict,
) -> "ray.data.Dataset":
    """Append a deabbreviated term column using a per-document abbreviation
    map (reference M4: resolve_abbreviation / add_deabbreviations,
    bigbio_utils.py:322-341 and :40-76 -- `abbreviations.json` is a
    doc_id -> {short: long} dict loaded once and applied per mention).

    The map is broadcast via `ray.put` and fetched once per worker; rows keep
    the original term when no expansion exists.
    """
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    ref = ray.put(abbrev_map)

    def apply(t: pa.Table) -> pa.Table:
        m = cached_broadcast(ref)
        out = [
            m.get(d, {}).get(term, term)
            for d, term in zip(t["doc_id"].to_pylist(), t["term"].to_pylist())
        ]
        return t.append_column("term_resolved", pa.array(out, pa.string()))

    return spans.map_batches(apply, batch_format="pyarrow")


def attach_context_windows(
    spans: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    window: int = 16,
    n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Attach left/right word-window context around each span (reference M5:
    get_left_context/get_right_context, bigbio_utils.py:302-319 -- word
    windows capped at `window` tokens on each side).

    Spans and documents are co-bucketed by doc id (one shuffle each, bounded
    group count) so the window slicing reads each document exactly once per
    bucket -- text never fans out per span.
    """
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def tag(col):
        def fn(t: pa.Table) -> pa.Table:
            d = t[col].to_numpy().astype(np.uint64)
            b = (hashing.splitmix64(d) % np.uint64(n_buckets)).astype(np.int64)
            return t.append_column("__bucket", pa.array(b))
        return fn

    s = spans.map_batches(tag("doc_id"), batch_format="pyarrow")
    d = docs.select_columns(["doc_id", "text"]).map_batches(
        tag("doc_id"), batch_format="pyarrow"
    ).map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": t["text"],
                            "__bucket": t["__bucket"],
                            "term": pa.nulls(t.num_rows, pa.string()),
                            "start": pa.nulls(t.num_rows, pa.int64()),
                            "end": pa.nulls(t.num_rows, pa.int64())}),
        batch_format="pyarrow",
    )
    s2 = s.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "text": pa.nulls(t.num_rows, pa.string()),
                            "__bucket": t["__bucket"], "term": t["term"],
                            "start": t["start"], "end": t["end"]}),
        batch_format="pyarrow",
    )

    def windows(g: pd.DataFrame) -> pd.DataFrame:
        texts = {r.doc_id: r.text for r in g[g["text"].notna()].itertuples()}
        sp = g[g["text"].isna()]
        ctx_l, ctx_r = [], []
        for r in sp.itertuples():
            text = texts.get(r.doc_id, "")
            ctx_l.append(" ".join(text[: int(r.start)].split()[-window:]))
            ctx_r.append(" ".join(text[int(r.end):].split()[:window]))
        out = sp[["doc_id", "term", "start", "end"]].copy()
        out["ctx_left"] = ctx_l
        out["ctx_right"] = ctx_r
        return out

    return s2.union(d).groupby("__bucket").map_groups(windows, batch_format="pandas")


def build_entity_descriptions(entities: "ray.data.Dataset") -> "ray.data.Dataset":
    """(entity_id, description_text): 'name (synonyms) [definition]' strings
    (reference M11: entity description builder, arboel data_utils.py:114-156
    -- the flattened dictionary text fed to the candidate encoder)."""

    def fmt(t: pa.Table) -> pa.Table:
        out = []
        for name, syn, dfn in zip(t["name"].to_pylist(), t["synonyms"].to_pylist(),
                                  t["definition"].to_pylist()):
            s = name or ""
            if syn:
                s += f" ({syn.replace('|', ', ')})"
            if dfn:
                s += f" [{dfn}]"
            out.append(s)
        return pa.table({
            "entity_id": t["entity_id"],
            "description_text": pa.array(out, pa.string()),
        })

    return entities.map_batches(fmt, batch_format="pyarrow")


def filter_overlapping_spans(
    spans: "ray.data.Dataset", n_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Keep leftmost-longest non-overlapping spans per document (M13 analog:
    overlapping trie hits resolved keeping non-partial spans,
    extract_pubmed_entities.py:8-37).

    Documents are hash-bucketed (bounded group count); inside a bucket one
    vectorized sort orders spans by (doc, start, -len) and a linear sweep
    drops any span starting before the previous kept span's end.
    """
    from biomedical_entity_linking_ray.config import default_buckets
    from biomedical_entity_linking_ray.functions import hashing

    n_buckets = n_buckets or default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy().astype(np.uint64)
        b = (hashing.splitmix64(d) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("__bucket", pa.array(b))

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(__len=g["end"] - g["start"]).sort_values(
            ["doc_id", "start", "__len"], ascending=[True, True, False],
            kind="mergesort").reset_index(drop=True)
        doc = g["doc_id"].to_numpy()
        start = g["start"].to_numpy()
        end = g["end"].to_numpy()
        keep = np.zeros(len(g), dtype=bool)
        last_doc, last_end = None, -1
        for i in range(len(g)):
            if doc[i] != last_doc:
                last_doc, last_end = doc[i], -1
            if start[i] >= last_end:
                keep[i] = True
                last_end = end[i]
        return g.loc[keep, ["doc_id", "term", "start", "end"]]

    return spans.map_batches(add_bucket, batch_format="pyarrow") \
        .groupby("__bucket").map_groups(sweep, batch_format="pandas")


_PAREN_SF = None  # compiled lazily (workers import this module independently)


def _sh_long_form(short: str, before: str) -> str | None:
    """Schwartz & Hearst 2003 best-long-form search (the algorithm the
    reference outsources to the Ab3P binary, solve_abbreviations.py:41-96 --
    here the standard published procedure, implemented directly): scan the
    short form right-to-left through the text preceding the '(',  requiring
    the FIRST short-form character to match at the start of a word; the long
    form is the suffix beginning at the word containing that first match."""
    s_idx = len(short) - 1
    l_idx = len(before) - 1
    while s_idx >= 0:
        c = short[s_idx].lower()
        if not c.isalnum():
            s_idx -= 1
            continue
        while l_idx >= 0 and (
            before[l_idx].lower() != c
            or (s_idx == 0 and l_idx > 0 and before[l_idx - 1].isalnum())
        ):
            l_idx -= 1
        if l_idx < 0:
            return None
        l_idx -= 1
        s_idx -= 1
    lf = before[l_idx + 1:].strip()
    return lf or None


def detect_abbreviations(
    docs: "ray.data.Dataset", text_col: str = "text",
) -> "ray.data.Dataset":
    """(doc_id, short_form, long_form): parenthesized-abbreviation detection
    over a document table -- the in-engine replacement for the reference's
    external Ab3P step (solve_abbreviations.py:41-96), using the public
    Schwartz-Hearst algorithm.

    Candidate = '(SF)' where SF is 2-10 chars, starts alphanumeric, contains
    an uppercase letter and is not purely digits; the long-form window is the
    min(|SF| + 5, |SF| * 2) words before the '(' (the S&H window rule), and
    the match must consume the window per `_sh_long_form`. Stateless
    map_batches; the regex scan + per-candidate matcher touch only the
    sparse candidate set, not every token."""
    import re

    global _PAREN_SF
    if _PAREN_SF is None:
        _PAREN_SF = re.compile(r"\(([A-Za-z0-9][A-Za-z0-9\-\.]{1,9})\)")

    def scan(t: pa.Table) -> pa.Table:
        ids, sfs, lfs = [], [], []
        doc_ids = t["doc_id"].to_pylist()
        for d, text in zip(doc_ids, t[text_col].to_pylist()):
            for m in _PAREN_SF.finditer(text):
                sf = m.group(1)
                if sf.isdigit() or not any(ch.isupper() for ch in sf):
                    continue
                words = text[:m.start()].split()
                if not words:
                    continue
                window = words[-min(len(sf) + 5, len(sf) * 2):]
                lf = _sh_long_form(sf, " ".join(window))
                if lf is not None and len(lf.split()) <= len(window):
                    ids.append(d)
                    sfs.append(sf)
                    lfs.append(lf)
        id_type = t.schema.field("doc_id").type
        return pa.table({
            "doc_id": pa.array(ids, id_type),
            "short_form": pa.array(sfs, pa.string()),
            "long_form": pa.array(lfs, pa.string()),
        })

    return docs.map_batches(scan, batch_format="pyarrow", batch_size=2048)
