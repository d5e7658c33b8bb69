"""Round-5 hardening tests: zero-copy binary views, adaptive SNM boundary
sampling, strict exhaustive-pair mode, declared empty-payload columns,
band/window validation, empty heavy-hitter input."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from tests.conftest import SF_DIR


# ---------------------------------------------------------------------------
# binary_column_to_matrix
# ---------------------------------------------------------------------------

def _join_path(values: list[bytes], dtype, width: int) -> np.ndarray:
    return np.frombuffer(b"".join(values), dtype=dtype).reshape(-1, width)


def test_binary_matrix_variable_binary_zero_copy_parity():
    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    rng = np.random.default_rng(7)
    rows = [rng.integers(0, 2**63, 16, dtype=np.uint64).tobytes()
            for _ in range(50)]
    col = pa.chunked_array([pa.array(rows[:20], pa.binary()),
                            pa.array(rows[20:], pa.binary())])
    out = binary_column_to_matrix(col, np.uint64, 16)
    np.testing.assert_array_equal(out, _join_path(rows, np.uint64, 16))


def test_binary_matrix_fixed_size_and_sliced_chunks():
    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    rng = np.random.default_rng(11)
    rows = [rng.integers(0, 65535, 8, dtype=np.uint16).tobytes()
            for _ in range(30)]
    fixed = pa.array(rows, pa.binary(16))
    np.testing.assert_array_equal(
        binary_column_to_matrix(fixed, np.uint16, 8),
        _join_path(rows, np.uint16, 8))
    # a SLICED chunk exercises the offset arithmetic on both layouts
    np.testing.assert_array_equal(
        binary_column_to_matrix(fixed.slice(5, 12), np.uint16, 8),
        _join_path(rows[5:17], np.uint16, 8))
    var = pa.array(rows, pa.binary()).slice(3, 20)
    np.testing.assert_array_equal(
        binary_column_to_matrix(var, np.uint16, 8),
        _join_path(rows[3:23], np.uint16, 8))


def test_binary_matrix_large_binary_and_empty():
    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    rows = [np.arange(i, i + 4, dtype=np.float64).tobytes() for i in range(9)]
    col = pa.array(rows, pa.large_binary())
    np.testing.assert_array_equal(
        binary_column_to_matrix(col, np.float64, 4),
        _join_path(rows, np.float64, 4))
    empty = binary_column_to_matrix(pa.array([], pa.binary()), np.uint64, 3)
    assert empty.shape == (0, 3)


def test_binary_matrix_irregular_falls_back():
    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    # ragged raw widths but total bytes still reshape-compatible: the
    # fallback join path must be taken (offsets not uniform) and stay exact
    rows = [b"\x01" * 8, b"\x02" * 24, b"\x03" * 16]
    col = pa.array(rows, pa.binary())
    out = binary_column_to_matrix(col, np.uint64, 2)
    np.testing.assert_array_equal(
        out, np.frombuffer(b"".join(rows), dtype=np.uint64).reshape(-1, 2))


# ---------------------------------------------------------------------------
# within_key_pairs: strict mode + declared empty payload
# ---------------------------------------------------------------------------

def test_within_key_pairs_strict_raises_on_oversize_block():
    from biomedical_entity_linking_ray.functions.candidate_pairs import (
        within_key_pairs,
    )

    rows = rd.from_items(
        [{"k": "hot", "id": i} for i in range(12)]
        + [{"k": "cold", "id": 100 + i} for i in range(3)])
    with pytest.raises(Exception) as exc_info:
        within_key_pairs(rows, "k", "id", all_pairs_max=8,
                         strict_all_pairs=True).materialize()
    assert "all_pairs_max" in str(exc_info.value)
    # non-strict: same input degrades to window pairs and completes
    out = within_key_pairs(rows, "k", "id", all_pairs_max=8,
                           window=2).to_pandas()
    assert len(out) > 0


def test_within_key_pairs_declared_empty_payload_columns():
    from biomedical_entity_linking_ray.functions.candidate_pairs import (
        within_key_pairs,
    )

    rows = rd.from_items([{"k": "a", "id": 1}, {"k": "a", "id": 2}])
    empty_payload = rd.from_items([
        {"id": 1, "name": "x"}]).filter(lambda r: False)

    def emit(g: pd.DataFrame, ia: np.ndarray, ib: np.ndarray) -> pd.DataFrame:
        # must NOT KeyError even though the payload table is empty
        names = g["name"].to_numpy()
        ids = g["id"].to_numpy()
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib],
                             "name_a": names[ia], "name_b": names[ib]})

    out = within_key_pairs(
        rows, "k", "id", emit=emit, payload=empty_payload, payload_on="id",
        payload_columns=["name"]).to_pandas()
    assert len(out) == 1
    assert out["name_a"].isna().all() and out["name_b"].isna().all()


# ---------------------------------------------------------------------------
# sorted_neighborhood_pairs: adaptive sampling + band clamp
# ---------------------------------------------------------------------------

def test_snm_band_leq_window_clamped_exact():
    """band <= window used to silently drop pairs spanning 2+ boundaries;
    the clamp makes any band value produce the exact window-pair set."""
    from biomedical_entity_linking_ray.pipelines.similarity import (
        sorted_neighborhood_pairs,
    )

    tight = sorted_neighborhood_pairs(
        SF_DIR, window=4, band=2).to_pandas()
    wide = sorted_neighborhood_pairs(
        SF_DIR, window=4, band=4096).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        tight.sort_values(key).reset_index(drop=True),
        wide.sort_values(key).reset_index(drop=True))


def test_snm_adaptive_sample_modulus_bounds_driver_pull():
    """The boundary-sample modulus must grow with distinct-key cardinality so
    the driver pull stays ~64*n_ranges regardless of corpus size."""
    import biomedical_entity_linking_ray.pipelines.similarity as sim

    # replicate the in-function derivation at three cardinalities
    def derived_mod(n_keys: int, n_ranges: int) -> int:
        sample_target = max(64 * n_ranges, 256)
        return max(1, 1 << max(
            0, int(n_keys / sample_target - 1).bit_length()))

    assert derived_mod(1_000, 16) == 1            # small: keep every key
    assert derived_mod(10_000_000, 16) >= 8_192   # 10M keys: <=~1.2k sampled
    big = derived_mod(10**12, 16)
    assert 10**12 / big <= 2 * 64 * 16            # 1T keys: still bounded
    # and the production function still matches its exhaustive twin
    out = sim.sorted_neighborhood_pairs(SF_DIR, window=3).to_pandas()
    assert (out["gap"] <= 3).all() and (out["gap"] >= 1).all()


# ---------------------------------------------------------------------------
# heavy_hitter_ngrams: zero-row documents table
# ---------------------------------------------------------------------------

def test_heavy_hitters_empty_documents(tmp_path):
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.text_analysis import (
        heavy_hitter_ngrams,
    )

    pq.write_table(
        pa.table({"doc_id": pa.array([], pa.int64()),
                  "text": pa.array([], pa.string())}),
        tmp_path / "documents.parquet")
    out = heavy_hitter_ngrams(str(tmp_path))
    assert out.count() == 0
    # to_pandas() drops columns on an empty Dataset; the schema carries them
    assert set(out.schema().names) == {"gram", "n"}


# ---------------------------------------------------------------------------
# fuzzy_name_join stays exact under the strict contract
# ---------------------------------------------------------------------------

def test_fuzzy_name_join_strict_contract():
    from biomedical_entity_linking_ray.pipelines.similarity import (
        fuzzy_name_join,
    )

    # sf0.001 blocks are far below the cap: strict mode must not raise and
    # results stay deterministic
    a = fuzzy_name_join(SF_DIR, max_dist=3).to_pandas()
    b = fuzzy_name_join(SF_DIR, max_dist=3).to_pandas()
    key = ["id_a", "id_b"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True))
    # an artificially tiny cap must surface as an error, not silent windows
    with pytest.raises(Exception):
        fuzzy_name_join(SF_DIR, max_dist=3, all_pairs_max=2).materialize()


# ---------------------------------------------------------------------------
# transformer encoder registry entry (reference T5-T7 real-model slot)
# ---------------------------------------------------------------------------

def _has_model_runtime() -> bool:
    try:
        import sentence_transformers  # noqa: F401
        return True
    except ImportError:
        pass
    try:
        import torch  # noqa: F401
        import transformers  # noqa: F401
        return True
    except ImportError:
        return False


def test_transformer_encoder_registered_and_guarded():
    from biomedical_entity_linking_ray.stages.encoding import (
        ENCODER_REGISTRY,
        TransformerEncoder,
        resolve_encoder,
    )

    assert resolve_encoder("transformer") is TransformerEncoder
    assert "projection" in ENCODER_REGISTRY
    if not _has_model_runtime():
        with pytest.raises(ImportError, match="projection"):
            TransformerEncoder()


@pytest.mark.skipif(not _has_model_runtime(),
                    reason="no torch/sentence-transformers in container")
def test_transformer_encoder_encodes(tmp_path):
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.stages.encoding import (
        embed_documents_pipeline,
    )

    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["hello world", "goodbye world"], pa.string()),
    }), tmp_path / "documents.parquet")
    out = embed_documents_pipeline(str(tmp_path), encoder="transformer") \
        .to_pandas()
    assert len(out) == 2
    assert all(len(e) > 0 for e in out["embedding"])


def test_encode_documents_num_gpus_plumbing():
    """num_gpus must reach map_batches without breaking the CPU path when
    left unset (this box has no GPU, so only the unset path executes)."""
    import ray.data as rd

    from biomedical_entity_linking_ray.stages.encoding import encode_documents

    docs = rd.from_items([{"doc_id": 1, "text": "alpha beta"}])
    out = encode_documents(docs, concurrency=1).to_pandas()
    assert len(out) == 1 and len(out["embedding"].iloc[0]) == 64


def test_binary_matrix_hypothesis_differential():
    """Randomized chunk layouts (chunk splits x slices x dtypes) must match
    the portable join decode bit-exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from biomedical_entity_linking_ray.functions.vectors import (
        binary_column_to_matrix,
    )

    @settings(max_examples=60, deadline=None)
    @given(
        n=st.integers(0, 40),
        width=st.integers(1, 9),
        dt=st.sampled_from(["<u2", "<u8", "<f8"]),
        split=st.integers(0, 40),
        off=st.integers(0, 8),
        fixed=st.booleans(),
        data=st.data(),
    )
    def check(n, width, dt, split, off, fixed, data):
        dtype = np.dtype(dt)
        rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
        rows = [rng.integers(0, 255, width * dtype.itemsize,
                             dtype=np.uint8).tobytes() for _ in range(n)]
        typ = pa.binary(width * dtype.itemsize) if fixed else pa.binary()
        split = min(split, n)
        col = pa.chunked_array(
            [pa.array(rows[:split], typ), pa.array(rows[split:], typ)]
            if 0 < split < n else [pa.array(rows, typ)])
        off = min(off, len(col))
        sliced = col.slice(off)
        want = _join_path(rows[off:], dtype, width) if n - off else \
            np.empty((0, width), dtype)
        got = binary_column_to_matrix(sliced, dtype, width)
        np.testing.assert_array_equal(got, want)

    check()
