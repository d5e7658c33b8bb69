"""Zero-copy Arrow list-column <-> numpy matrix conversion.

Every embedding consumer (k-NN, embedding near-dup, k-means/SemDeDup) turns
a `list<float>` Arrow column into an (n, dim) matrix per batch. Doing that
through `to_pylist()` materializes n x dim Python float objects first --
~90x slower than flattening the child values buffer (measured on the sf0.1
embeddings table: 63 ms vs 0.7 ms per 2000 x 64 batch) and churns the GC in
the hot path of every vector pipeline. This helper reshapes the contiguous
values buffer directly; values are bit-identical to the to_pylist path
(float32 -> float64 widening is exact either way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_matrix(col, dtype=np.float64) -> np.ndarray:
    """`list<numeric>` column (Array or ChunkedArray) -> (n, dim) ndarray.

    Requires a rectangular, null-free column (embeddings always are); raises
    on ragged rows or nulls rather than silently misaligning, because
    `flatten()` drops null slots and a ragged reshape would shear rows.
    """
    ca = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(ca)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if ca.null_count:
        raise ValueError("list column contains null rows")
    widths = np.diff(ca.offsets.to_numpy())
    if widths.min() != widths.max():
        raise ValueError(
            f"ragged list column: row widths span "
            f"[{widths.min()}, {widths.max()}]")
    flat = ca.flatten().to_numpy(zero_copy_only=False)
    return flat.astype(dtype, copy=False).reshape(n, int(widths[0]))


def binary_column_to_matrix(col, dtype, width: int) -> np.ndarray:
    """Fixed-width `binary` sketch column -> (n, width) ndarray, zero-copy.

    Every signature consumer (MinHash band explode, SimHash verify, pair
    scoring, LSH plane projection) stores per-row sketches as equal-length
    `binary` values. The portable decode -- ``b"".join(col.to_pylist())`` --
    materializes n Python bytes objects plus one full copy per batch; on the
    measured flagship that path is part of the 8.1 s s0/explode wall at
    32 CPUs. Equal-width null-free binary values are laid out contiguously
    in the Arrow data buffer, so this helper views that buffer directly
    (``np.frombuffer`` on the chunk's data buffer, sliced by the chunk's
    value offsets) and reshapes -- no per-row objects, no copy. Values are
    bit-identical to the join path; irregular layouts (ragged widths,
    non-contiguous offsets) fall back to the join path per chunk. Null
    values raise a ValueError — a sketch column must be null-free, and the
    join path would otherwise die on an opaque TypeError.

    `width` is the element count per row at `dtype` (e.g. num_perm uint64
    words), used both for the reshape and the regularity check.
    """
    item = np.dtype(dtype).itemsize
    row_bytes = width * item
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    outs: list[np.ndarray] = []
    for ch in chunks:
        n = len(ch)
        if n == 0:
            continue
        if pa.types.is_fixed_size_binary(ch.type) and ch.null_count == 0:
            if ch.type.byte_width != row_bytes:
                raise ValueError(
                    f"fixed_size_binary width {ch.type.byte_width} != "
                    f"expected {row_bytes}")
            raw = np.frombuffer(ch.buffers()[1], dtype=np.uint8)
            start = ch.offset * row_bytes
            outs.append(raw[start:start + n * row_bytes]
                        .view(dtype).reshape(n, width))
            continue
        if (pa.types.is_binary(ch.type) or pa.types.is_large_binary(ch.type)) \
                and ch.null_count == 0:
            off_dtype = np.int64 if pa.types.is_large_binary(ch.type) \
                else np.int32
            offs = np.frombuffer(ch.buffers()[1], dtype=off_dtype)[
                ch.offset:ch.offset + n + 1].astype(np.int64)
            steps = np.diff(offs)
            if steps.size and steps.min() == row_bytes \
                    and steps.max() == row_bytes:
                raw = np.frombuffer(ch.buffers()[2], dtype=np.uint8)
                outs.append(raw[offs[0]:offs[-1]]
                            .view(dtype).reshape(n, width))
                continue
        # irregular chunk (ragged / unexpected type): portable path
        if ch.null_count:
            raise ValueError(
                f"binary sketch column contains {ch.null_count} null "
                "values; sketches must be null-free")
        outs.append(np.frombuffer(b"".join(ch.to_pylist()), dtype=dtype)
                    .reshape(-1, width))
    if not outs:
        return np.empty((0, width), dtype=dtype)
    return outs[0] if len(outs) == 1 else np.concatenate(outs, axis=0)
