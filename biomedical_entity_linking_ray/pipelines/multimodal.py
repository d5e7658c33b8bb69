"""Multimodal column plumbing: opaque binary payloads + actor-pool codecs.

Images/audio/video are carried as Arrow ``binary`` columns with typed
metadata columns alongside (mime, width/height or duration). The Ray-side
plumbing -- schema, batch sizing for wide rows, actor-pool codec signature,
output layout -- is real and tested; the actual decode is STUBBED because no
image/audio library ships in this container:

- if PIL/np-image decoding were available, `ImageDecoder.__init__` would load
  it once per actor; instead a clearly-marked deterministic fake codec parses
  our self-describing synthetic payload header.

Batch sizing note (guide: 'Memory-aware'): binary rows are orders of
magnitude wider than text rows -- the default batch_size here is 64, not
4096, so batch x concurrency stays inside a worker heap at real payload
sizes.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

import ray.data

_MAGIC = b"FAKEIMG1"


def synthesize_image_payloads(
    docs: "ray.data.Dataset", max_side: int = 64, seed: int = 42
) -> "ray.data.Dataset":
    """Attach a deterministic fake 'image' binary column to each row.

    Payload layout: 8-byte magic | uint16 w | uint16 h | w*h bytes derived
    from a seeded per-row hash -- self-describing, so the decoder stub can
    'decode' it for real and the plumbing round-trips.
    """
    from biomedical_entity_linking_ray.functions import hashing

    def attach(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_pylist()
        payloads = []
        for i in ids:
            h = hashing.splitmix64(np.array([np.uint64(i) ^ np.uint64(seed)], dtype=np.uint64))[0]
            w = 8 + int(h % np.uint64(max_side - 8))
            hgt = 8 + int((h >> np.uint64(16)) % np.uint64(max_side - 8))
            rng = np.random.RandomState(int(h % np.uint64(2**31)))
            body = rng.randint(0, 256, size=w * hgt, dtype=np.uint8).tobytes()
            payloads.append(_MAGIC + struct.pack("<HH", w, hgt) + body)
        return t.append_column("image", pa.array(payloads, pa.binary()))

    return docs.map_batches(attach, batch_format="pyarrow", batch_size=256)


class ImageDecoder:
    """Actor-pool codec: decode + feature-extract the binary image column.

    STUB: a real deployment loads PIL/torchvision ONCE here in ``__init__``
    (reference analog: per-worker model state, T5-T7 in SURVEY.md 2.3) and
    decodes in ``__call__``; this container has no image library, so the
    deterministic fake payload is parsed instead. The stage signature,
    batch handling and output schema are the real thing.
    """

    def __init__(self):
        try:  # pragma: no cover - PIL absent in this container
            import PIL.Image  # noqa: F401

            self.backend = "pil"
        except ImportError:
            self.backend = "fake"

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.backend != "fake":  # pragma: no cover
            raise NotImplementedError("real decode path requires PIL")
        widths, heights, means = [], [], []
        for payload in t["image"].to_pylist():
            if payload[:8] != _MAGIC:
                raise ValueError("unknown image payload")
            w, h = struct.unpack("<HH", payload[8:12])
            body = np.frombuffer(payload[12:12 + w * h], dtype=np.uint8)
            widths.append(w)
            heights.append(h)
            means.append(float(body.mean()))
        return pa.table({
            "doc_id": t["doc_id"],
            "width": pa.array(widths, pa.int32()),
            "height": pa.array(heights, pa.int32()),
            "pixel_mean": pa.array(means, pa.float64()),
        })


def decode_images(
    with_images: "ray.data.Dataset", concurrency: int | None = None
) -> "ray.data.Dataset":
    from biomedical_entity_linking_ray.stages.normalize import pool_size

    return with_images.map_batches(
        ImageDecoder,
        batch_format="pyarrow",
        batch_size=64,          # wide binary rows: small batches by design
        concurrency=pool_size(concurrency or 4),
    )


def image_feature_pipeline(sf_dir: str) -> "ray.data.Dataset":
    """documents -> synthetic image payloads -> actor-pool decode -> features.

    The queries() entry exercising the full multimodal plumbing end to end.
    """
    import os

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id"]
    )
    return decode_images(synthesize_image_payloads(docs))
