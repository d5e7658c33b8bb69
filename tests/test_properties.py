"""Property-based tests (hypothesis): differential checks of the hot kernels
and distributed primitives against independent reference implementations.

- The C Jaro-Winkler kernel vs the pure-Python implementation (two genuinely
  independent codepaths that ship in this repo).
- Distributed primitives (bucketed_aggregate, hash_join, connected_components)
  vs pandas / a ten-line union-find on randomized inputs.
- Algebraic invariants of the sketch kernels (permutation/multiset invariance
  of OPH MinHash, unit norm of hashed TF, winnowing monotonicity).

Ray examples are kept tiny and few (the session fixture owns one Ray; each
example exercises the driver-fast paths), so the module adds ~1 min at 4 CPUs.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from biomedical_entity_linking_ray.functions import hashing as H
from biomedical_entity_linking_ray.functions import strings as S

# path-ish alphabet + a few non-ASCII codepoints: what production paths and
# contents actually contain, plus the encoding edge the C kernel must match
_ALPHA = st.sampled_from(list("abcxyz_/.-0189") + ["é", "λ", "中"])
_STR = st.text(alphabet=_ALPHA, min_size=0, max_size=24)

_PURE_SETTINGS = settings(max_examples=60, deadline=None)
_RAY_SETTINGS = settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)


# ---------------------------------------------------------------------------
# Jaro-Winkler: C kernel vs pure Python (differential)
# ---------------------------------------------------------------------------

@_PURE_SETTINGS
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=16))
def test_jw_c_kernel_matches_pure_python(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    got = S.jaro_winkler_pairs(a, b)
    want = np.array([S.jaro_winkler(x, y) for x, y in pairs])
    np.testing.assert_allclose(got, want, atol=1e-12)


@_PURE_SETTINGS
@given(_STR, _STR)
def test_jw_bounds_symmetry_identity(a, b):
    v = S.jaro_winkler(a, b)
    assert 0.0 <= v <= 1.0
    assert S.jaro_winkler(b, a) == v          # symmetric (shared prefix is)
    assert S.jaro_winkler(a, a) == 1.0
    assert S.jaro(a, b) == S.jaro(b, a)


# ---------------------------------------------------------------------------
# Sketch kernels: algebraic invariants
# ---------------------------------------------------------------------------

_U64 = st.integers(min_value=0, max_value=2**64 - 1)


@_PURE_SETTINGS
@given(st.lists(_U64, min_size=1, max_size=64), st.randoms(use_true_random=False))
def test_minhash_signature_is_a_set_function(vals, rnd):
    """OPH signature depends on the shingle SET only: invariant under
    permutation and duplication of the input multiset."""
    mh = H.MinHasher(num_perm=16, seed=7)
    x = np.array(vals, dtype=np.uint64)
    base = mh.signature(x)
    shuf = x.copy()
    rnd.shuffle(shuf)
    np.testing.assert_array_equal(base, mh.signature(shuf))
    np.testing.assert_array_equal(base, mh.signature(np.concatenate([x, x])))
    # banding of equal signatures agrees on every band
    np.testing.assert_array_equal(H.band_hashes(base, 4), H.band_hashes(base, 4))


@_PURE_SETTINGS
@given(st.lists(_U64, min_size=1, max_size=64))
def test_hashed_tf_unit_norm(vals):
    v = H.hashed_tf_vector(np.array(vals, dtype=np.uint64), dim=64)
    n = float(np.linalg.norm(v))
    # all-signed-cancellation can zero the vector; otherwise it is unit
    assert n == 0.0 or abs(n - 1.0) < 1e-5


@_PURE_SETTINGS
@given(st.lists(_U64, min_size=1, max_size=32))
def test_simhash_identical_input_zero_hamming(vals):
    x = np.array(vals, dtype=np.uint64)
    h1, h2 = H.simhash64(x), H.simhash64(x)
    assert h1 == h2
    assert H.hamming64(np.array([h1], dtype=np.uint64),
                       np.array([h2], dtype=np.uint64))[0] == 0


@_PURE_SETTINGS
@given(st.text(alphabet=st.sampled_from(list("abc ")), min_size=64, max_size=96),
       st.text(alphabet=st.sampled_from(list("abc ")), min_size=0, max_size=32))
def test_rolling_fingerprint_extension_monotone(a, b):
    """Appending text only ADDS windows, so the min-hash fingerprint can
    never increase (the winnowing stability property)."""
    assert H.rolling_fingerprint(a + b) <= H.rolling_fingerprint(a)


# ---------------------------------------------------------------------------
# Distributed primitives vs single-process references
# ---------------------------------------------------------------------------

_KEY = st.sampled_from(["k0", "k1", "k2", "k3"])
_VAL = st.integers(min_value=-10**6, max_value=10**6)


@_RAY_SETTINGS
@given(st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=40))
def test_bucketed_aggregate_matches_pandas(rows):
    import ray.data as rd

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    df = pd.DataFrame(rows, columns=["k", "v"])
    got = bucketed_aggregate(
        rd.from_arrow(pa.Table.from_pandas(df)), ["k"],
        {"mn": ("v", "min"), "mx": ("v", "max"),
         "sm": ("v", "sum"), "ct": (None, "count")},
        n_buckets=4,
    ).to_pandas().sort_values("k").reset_index(drop=True)
    want = df.groupby("k", as_index=False).agg(
        mn=("v", "min"), mx=("v", "max"), sm=("v", "sum"), ct=("v", "size")
    ).sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got[["k", "mn", "mx", "sm", "ct"]], want, check_dtype=False)


@_RAY_SETTINGS
@given(st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=24),
       st.lists(st.tuples(_KEY, _VAL), min_size=1, max_size=24))
def test_hash_join_inner_matches_pandas_merge(lrows, rrows):
    import ray.data as rd

    from biomedical_entity_linking_ray.functions.joins import hash_join

    ldf = pd.DataFrame(lrows, columns=["k", "lv"])
    rdf = pd.DataFrame(rrows, columns=["k", "rv"])
    got = hash_join(
        rd.from_arrow(pa.Table.from_pandas(ldf)),
        rd.from_arrow(pa.Table.from_pandas(rdf)),
        "inner", 4, on=("k",),
    ).to_pandas()
    want = ldf.merge(rdf, on="k", how="inner")
    if len(want) == 0:
        # Ray 2.49 returns a SCHEMA-LESS empty table for a zero-row join
        # (why production wraps joins in heal_projection); rows are the claim
        assert len(got) == 0
        return
    cols = ["k", "lv", "rv"]
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _uf_reference(n_nodes: int, edges: list) -> dict:
    """Ten-line union-find: node -> min node id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in range(n_nodes)}


@_RAY_SETTINGS
@given(st.integers(min_value=1, max_value=24),
       st.lists(st.tuples(st.integers(0, 23), st.integers(0, 23)), max_size=40))
def test_connected_components_matches_union_find(n_nodes, raw_edges):
    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.stages.clustering import connected_components

    edges = [(a % n_nodes, b % n_nodes) for a, b in raw_edges]
    ids = [f"n{i:03d}" for i in range(n_nodes)]
    nodes = rd.from_arrow(pa.table({"file_id": pa.array(ids, pa.string())}))
    etab = pa.table({
        "id_a": pa.array([ids[a] for a, _ in edges] or [], pa.string()),
        "id_b": pa.array([ids[b] for _, b in edges] or [], pa.string()),
    })
    got = connected_components(
        rd.from_arrow(etab), nodes, LinkageConfig(join_partitions=4)
    ).to_pandas()
    want = {ids[i]: ids[r] for i, r in _uf_reference(n_nodes, edges).items()}
    assert dict(zip(got["file_id"], got["cluster_id"])) == want
    # canonical = cluster representative by construction
    assert (got["cluster_id"] == got["canonical_id"]).all()


# ---------------------------------------------------------------------------
# sub-document dedup kernels: vectorized offset arithmetic vs pure Python
# ---------------------------------------------------------------------------

_DOC_WORD = st.text(alphabet=st.sampled_from(list("abxy0")), min_size=0, max_size=4)
_DOC = st.lists(_DOC_WORD, min_size=0, max_size=20).map(" ".join)


@_PURE_SETTINGS
@given(st.lists(_DOC, min_size=1, max_size=12),
       st.integers(min_value=1, max_value=7))
def test_segment_lists_window_matches_pure_python(texts, window):
    """The offset-windowed Arrow segmenter == str.split chunking per doc."""
    from biomedical_entity_linking_ray.pipelines.dedup import _segment_lists

    paras, n_parts = _segment_lists(pa.array(texts, pa.string()), window, None)
    got = paras.to_pylist()
    pos = 0
    for i, s in enumerate(texts):
        ws = s.split(" ")
        exp = [" ".join(ws[j:j + window]) for j in range(0, len(ws), window)]
        assert n_parts[i] == len(exp)
        assert got[pos:pos + len(exp)] == exp, (s, window)
        pos += len(exp)
    assert pos == len(got)


@_PURE_SETTINGS
@given(st.lists(_DOC, min_size=1, max_size=12))
def test_segment_lists_delim_matches_str_split(texts):
    from biomedical_entity_linking_ray.pipelines.dedup import _segment_lists

    paras, n_parts = _segment_lists(pa.array(texts, pa.string()), None, "b")
    got = paras.to_pylist()
    pos = 0
    for i, s in enumerate(texts):
        exp = s.split("b")
        assert n_parts[i] == len(exp)
        assert got[pos:pos + len(exp)] == exp
        pos += len(exp)


@_PURE_SETTINGS
@given(st.lists(_DOC, min_size=1, max_size=10),
       st.integers(min_value=1, max_value=6))
def test_gram_occurrences_match_pure_python(texts, n):
    """Shifted-slice element-wise-join gram enumeration == nested loops,
    including exact cross-document boundary masking."""
    from biomedical_entity_linking_ray.pipelines.dedup import _gram_occurrences

    t = pa.table({
        "doc_id": pa.array(range(100, 100 + len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    doc_rep, i_idx, grams = _gram_occurrences(t, n)
    got = list(zip(doc_rep.tolist(), i_idx.tolist(), grams.to_pylist()))
    exp = []
    for d, s in enumerate(texts):
        ws = s.split(" ")
        for i in range(len(ws) - n + 1):
            exp.append((100 + d, i, " ".join(ws[i:i + n])))
    assert got == exp


# ---------------------------------------------------------------------------
# Levenshtein batch DP: differential vs the textbook scalar recurrence
# ---------------------------------------------------------------------------

def _lev_ref(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
            prev = cur
    return dp[-1]


@_PURE_SETTINGS
@given(st.lists(st.tuples(_STR, _STR), min_size=1, max_size=16))
def test_levenshtein_batch_matches_scalar(pairs):
    got = S.levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [_lev_ref(a, b) for a, b in pairs]


@_PURE_SETTINGS
@given(_STR, _STR)
def test_levenshtein_metric_properties(a, b):
    d_ab = int(S.levenshtein_batch([a], [b])[0])
    d_ba = int(S.levenshtein_batch([b], [a])[0])
    assert d_ab == d_ba                      # symmetry
    assert (d_ab == 0) == (a == b)           # identity
    assert d_ab <= max(len(a), len(b))       # upper bound
    assert d_ab >= abs(len(a) - len(b))      # length lower bound
