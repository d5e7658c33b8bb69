"""Unit tests for the deterministic hashing/sketch kernels."""

import numpy as np

from biomedical_entity_linking_ray.functions import hashing, strings


def test_fnv1a_deterministic():
    assert hashing.fnv1a_str("hello") == hashing.fnv1a_str("hello")
    assert hashing.fnv1a_str("hello") != hashing.fnv1a_str("hellp")
    # reference value of FNV-1a 64 for empty input is the offset basis
    assert hashing.fnv1a_bytes(b"") == 0xCBF29CE484222325


def test_char_shingles():
    h = hashing.char_shingle_hashes("abcdef", 3)
    assert h.size == 4  # abc bcd cde def
    assert np.unique(h).size == 4  # distinct shingles hash distinctly
    # multiset semantics: repeats are kept (MinHash is duplicate-insensitive)
    assert hashing.char_shingle_hashes("aaaa", 2).size == 3
    # short text still produces one shingle
    assert hashing.char_shingle_hashes("ab", 5).size == 1
    assert hashing.char_shingle_hashes("", 5).size == 1


def test_minhash_jaccard_estimate():
    rng = np.random.RandomState(7)
    base = rng.randint(0, 2**63, size=1000).astype(np.uint64)
    # 80% overlap set
    other = np.concatenate([base[:800], rng.randint(0, 2**63, size=200).astype(np.uint64)])
    mh = hashing.MinHasher(256, seed=42)
    sa, sb = mh.signature(np.unique(base)), mh.signature(np.unique(other))
    true_j = 800 / 1200
    est = hashing.MinHasher.estimate_jaccard(sa, sb)
    assert abs(est - true_j) < 0.08
    # identical input -> identical signature
    assert np.array_equal(mh.signature(base), mh.signature(base.copy()))


def test_band_hashes_consistency():
    mh = hashing.MinHasher(128, seed=1)
    s = mh.signature(np.arange(100, dtype=np.uint64))
    b1 = hashing.band_hashes(s, 21)
    b2 = hashing.band_hashes_batch(s[None, :], 21)[0]
    assert np.array_equal(b1, b2)


def test_hashed_tf_vector_unit_norm():
    v = hashing.hashed_tf_vector(np.arange(50, dtype=np.uint64), 128)
    assert abs(np.linalg.norm(v) - 1.0) < 1e-5
    assert hashing.hashed_tf_vector(np.zeros(0, dtype=np.uint64), 128).sum() == 0.0


def test_simhash_near_far():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 2**63, size=500).astype(np.uint64)
    near = np.concatenate([a[:450], rng.randint(0, 2**63, size=50).astype(np.uint64)])
    far = rng.randint(0, 2**63, size=500).astype(np.uint64)
    ha, hn, hf = (hashing.simhash64(x) for x in (a, near, far))
    d_near = hashing.hamming64(np.array([ha], dtype=np.uint64), np.array([hn], dtype=np.uint64))[0]
    d_far = hashing.hamming64(np.array([ha], dtype=np.uint64), np.array([hf], dtype=np.uint64))[0]
    assert d_near < d_far


def test_hamming64():
    a = np.array([0b1010, 0], dtype=np.uint64)
    b = np.array([0b0101, np.iinfo(np.uint64).max], dtype=np.uint64)
    d = hashing.hamming64(a, b)
    assert d.tolist() == [4, 64]


def test_jaro_winkler():
    assert strings.jaro_winkler("abc", "abc") == 1.0
    assert strings.jaro_winkler("", "abc") == 0.0
    # classic textbook value: MARTHA vs MARHTA
    assert abs(strings.jaro_winkler("martha", "marhta") - 0.9611) < 0.001
    assert strings.jaro_winkler("src/a/util.py", "src/b/util.py") > 0.8


def test_path_helpers():
    assert strings.path_stem("src/A/Util_v2.PY") == "util_v2"
    assert strings.path_tokens("src/a/b.py") == ["src", "a", "b", "py"]


def test_batched_content_kernels_match_per_row():
    """The batched kernels (one concatenated pass) must reproduce the
    per-row functions row by row: same shingle MULTISET, same MinHash
    signature, same TF vector (to float rounding)."""
    rng = np.random.RandomState(7)
    texts = [
        "", "a", "ab", "abcd", "xyzz" * 3,
        "the quick brown fox jumps over the lazy dog " * 40,
        "éèê unicode café " * 30,
        "".join(chr(rng.randint(97, 123)) for _ in range(5000)),  # over cap
    ]
    k, cap, mod, P, dim = 5, 1024, 4, 128, 64
    mh = hashing.MinHasher(P, seed=11)
    vals, offs = hashing.shingle_hashes_batch(texts, k, cap)
    svals, soffs = hashing.sample_shingles_batch(vals, offs, mod)
    sig_b = mh.signature_batch(svals, soffs)
    tf_b = hashing.hashed_tf_batch(svals, soffs, dim)
    for i, t in enumerate(texts):
        per = hashing.char_shingle_hashes(t, k, cap)
        batch_row = vals[offs[i]:offs[i + 1]]
        assert np.array_equal(np.sort(per), np.sort(batch_row)), i
        samp = hashing.sample_shingles(per, mod)
        samp_b = svals[soffs[i]:soffs[i + 1]]
        assert np.array_equal(np.sort(samp), np.sort(samp_b)), i
        assert np.array_equal(mh.signature(samp), sig_b[i]), i
        assert np.allclose(
            hashing.hashed_tf_vector(samp, dim), tf_b[i], atol=1e-6), i
    # non-power-of-two bin path
    mh3 = hashing.MinHasher(96, seed=3)
    sig3 = mh3.signature_batch(svals, soffs)
    for i, t in enumerate(texts):
        samp = hashing.sample_shingles(
            hashing.char_shingle_hashes(t, k, cap), mod)
        assert np.array_equal(mh3.signature(samp), sig3[i]), i


def test_jaro_winkler_pairs_kernel_and_fallback_agree():
    """The batched path must give the per-pair scalar result both with the
    compiled C kernel and with the pure-Python fallback (no compiler)."""
    import numpy as np

    rng = np.random.RandomState(5)
    alpha = list("abcdef/._-")
    A = np.array(["".join(rng.choice(alpha, rng.randint(0, 20))) for _ in range(500)],
                 dtype=object)
    B = A.copy()
    B[::3] = np.array(["".join(rng.choice(alpha, rng.randint(0, 20)))
                       for _ in range(len(B[::3]))], dtype=object)
    want = np.array([strings.jaro_winkler(a, b) for a, b in zip(A, B)])
    got_kernel = strings.jaro_winkler_pairs(A, B)
    saved = strings._JW_LIB
    try:
        strings._JW_LIB = False  # force the pure-Python fallback branch
        got_py = strings.jaro_winkler_pairs(A, B)
    finally:
        strings._JW_LIB = saved
    assert np.array_equal(got_py, want)
    if saved:  # compiler present in this container
        assert np.array_equal(got_kernel, want)


def test_hex16_batch_matches_format():
    """Vectorized %016x must be byte-identical to Python formatting,
    including edge values (0, 2**64-1) and random uint64 draws."""
    import numpy as np

    rng = np.random.RandomState(11)
    vals = np.concatenate([
        np.array([0, 1, 0xFF, 2**32, 2**64 - 1], dtype=np.uint64),
        rng.randint(0, 2**63, size=1000).astype(np.uint64) * np.uint64(2)
        + rng.randint(0, 2, size=1000).astype(np.uint64),
    ])
    got = hashing.hex16_batch(vals)
    want = np.array([f"{int(v):016x}" for v in vals], dtype="U16")
    assert np.array_equal(got, want)
    assert hashing.hex16_batch(np.empty(0, dtype=np.uint64)).shape == (0,)


def test_list_column_to_matrix_matches_topylist_and_guards():
    import numpy as np
    import pyarrow as pa
    import pytest

    from biomedical_entity_linking_ray.functions.vectors import list_column_to_matrix

    rng = np.random.RandomState(7)
    m = rng.randn(50, 8).astype(np.float32)
    col = pa.chunked_array([pa.array(list(m[:20]), pa.list_(pa.float32())),
                            pa.array(list(m[20:]), pa.list_(pa.float32()))])
    for dt in (np.float64, np.float32):
        want = np.array(col.to_pylist(), dtype=dt)
        got = list_column_to_matrix(col, dt)
        assert got.dtype == dt and np.array_equal(want, got)
    # sliced input: offsets no longer start at 0
    sl = col.combine_chunks().slice(3, 10)
    assert np.array_equal(list_column_to_matrix(sl, np.float64),
                          np.array(sl.to_pylist(), dtype=np.float64))
    assert list_column_to_matrix(pa.array([], pa.list_(pa.float32()))).size == 0
    with pytest.raises(ValueError, match="ragged"):
        list_column_to_matrix(pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float64())))
    with pytest.raises(ValueError, match="null"):
        list_column_to_matrix(pa.array([[1.0], None], pa.list_(pa.float64())))
