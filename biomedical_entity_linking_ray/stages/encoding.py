"""Warm-state document encoder actor pool (reference T5-T7).

The reference's encoder stages load a BERT-family model once per worker and
batch-encode mentions/entities (embed_and_index, data_process.py:565-684;
krissbert generate_vectors, usage/utils.py:450-501; sapbert embed_dense,
model_wrapper.py:169-233). No transformer ships in this container, so the
model here is a deterministic hashed-TF -> random-projection encoder: the
projection matrix IS real per-actor state -- built once in ``__init__`` from
a seed (the "model load"), applied per batch as one matmul. The pipeline
shape (actor pool, batch size, encode -> parquet embedding table -> k-NN
over it) is exactly the reference's embed-and-index flow; swapping the
matrix for real model weights changes nothing else.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data

from biomedical_entity_linking_ray.functions import hashing, strings


class DocEncoder:
    """Actor-pool callable: encoder state built once per actor.

    State: seeded Gaussian projection (tf_dim x out_dim, orthonormalized) --
    the stand-in for model weights. __call__ hashes content to a TF vector
    and projects it; output embeddings are L2-normalized float32 lists.
    """

    def __init__(self, tf_dim: int = 256, out_dim: int = 64,
                 shingle_k: int = 4, seed: int = 42):
        rng = np.random.RandomState(seed)
        m = rng.randn(tf_dim, out_dim)
        q, _ = np.linalg.qr(m)  # orthonormal columns: distance-preserving
        self.proj = q.astype(np.float32)
        self.tf_dim = tf_dim
        self.shingle_k = shingle_k

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        n = len(texts)
        tf = np.empty((n, self.tf_dim), dtype=np.float32)
        for i, s in enumerate(texts):
            sh = hashing.char_shingle_hashes(
                strings.normalize_content(s), self.shingle_k, 4096)
            tf[i] = hashing.hashed_tf_vector(sh, self.tf_dim)
        emb = tf @ self.proj  # one matmul per batch -- the batched encode
        nrm = np.linalg.norm(emb, axis=1, keepdims=True)
        nrm[nrm == 0] = 1.0
        emb = (emb / nrm).astype(np.float32)
        return pa.table({
            "doc_id": t["doc_id"],
            "embedding": pa.array([row.tolist() for row in emb],
                                  pa.list_(pa.float32())),
        })


# ---------------------------------------------------------------------------
# Encoder registry (SURVEY 2.11 extension surface)
# ---------------------------------------------------------------------------
# The reference hangs its whole model zoo off one slot: a config-named encoder
# class constructed once per worker and applied per batch (model registry,
# bioel model.py:31-206; embed_and_index, data_process.py:565-684; sapbert
# embed_dense, model_wrapper.py:169-233). Same contract here:
#
#   class MyEncoder:
#       def __init__(self, **kwargs): ...      # model load -- ONCE per actor
#       def __call__(self, t: pa.Table) -> pa.Table:
#           # (doc_id, text) -> (doc_id, embedding list<float32>)
#
# register_encoder("my_model", MyEncoder) makes it reachable by name from
# encode_documents / embed_documents_pipeline (and so from job configs, which
# carry plain strings). The default "projection" encoder is the deterministic
# stand-in above; a real transformer drops in without touching pipeline code.

class TransformerEncoder:
    """Real pretrained-model encoder (reference T5-T7: the GPU BERT actor
    pool of embed_and_index, data_process.py:565-684, and sapbert
    embed_dense, model_wrapper.py:169-233).

    Import-guarded: this container ships no torch, so construction raises a
    clear ImportError unless `sentence_transformers` (preferred) or
    `transformers`+`torch` are installed -- the registry entry exists either
    way so job configs naming it fail fast with an actionable message rather
    than a KeyError. When the dependency exists the model loads ONCE per
    actor (__init__) and __call__ does one batched forward per Arrow batch,
    mean-pooled + L2-normalized when going through raw transformers. Pass
    `num_gpus` to `encode_documents` to reserve GPUs per actor."""

    def __init__(self, model_name: str = "sentence-transformers/all-MiniLM-L6-v2",
                 device: str | None = None, max_length: int = 256):
        self.max_length = max_length
        try:
            from sentence_transformers import SentenceTransformer  # type: ignore

            self._st = SentenceTransformer(model_name, device=device)
            self._mode = "st"
            return
        except ImportError:
            pass
        try:
            import torch  # type: ignore
            from transformers import AutoModel, AutoTokenizer  # type: ignore

            self._torch = torch
            self._tok = AutoTokenizer.from_pretrained(model_name)
            self._model = AutoModel.from_pretrained(model_name)
            if device:
                self._model = self._model.to(device)
            self._model.eval()
            self._device = device
            self._mode = "hf"
        except ImportError as e:
            raise ImportError(
                "TransformerEncoder needs `sentence_transformers` or "
                "`transformers`+`torch`; neither is installed. Use the "
                "default 'projection' encoder or install a model runtime."
            ) from e

    def __call__(self, t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        if self._mode == "st":
            emb = self._st.encode(
                texts, batch_size=len(texts), convert_to_numpy=True,
                normalize_embeddings=True)
        else:
            torch = self._torch
            enc = self._tok(texts, padding=True, truncation=True,
                            max_length=self.max_length, return_tensors="pt")
            if getattr(self, "_device", None):
                enc = {k: v.to(self._device) for k, v in enc.items()}
            with torch.no_grad():
                out = self._model(**enc).last_hidden_state
            mask = enc["attention_mask"].unsqueeze(-1).to(out.dtype)
            emb = ((out * mask).sum(1) / mask.sum(1).clamp(min=1)) \
                .cpu().numpy()
            nrm = np.linalg.norm(emb, axis=1, keepdims=True)
            nrm[nrm == 0] = 1.0
            emb = emb / nrm
        emb = emb.astype(np.float32)
        return pa.table({
            "doc_id": t["doc_id"],
            "embedding": pa.array([row.tolist() for row in emb],
                                  pa.list_(pa.float32())),
        })


ENCODER_REGISTRY: dict[str, type] = {
    "projection": DocEncoder,
    "transformer": TransformerEncoder,
}


def register_encoder(name: str, cls: type) -> None:
    """Register an encoder class under a config-addressable name."""
    ENCODER_REGISTRY[name] = cls


def resolve_encoder(encoder: "str | type") -> type:
    """Name -> class via the registry; a class passes through unchanged."""
    if isinstance(encoder, str):
        try:
            return ENCODER_REGISTRY[encoder]
        except KeyError:
            raise KeyError(
                f"unknown encoder {encoder!r}; registered: "
                f"{sorted(ENCODER_REGISTRY)}") from None
    return encoder


def encode_documents(
    docs: "ray.data.Dataset",
    out_dim: int = 64,
    concurrency: int | None = None,
    batch_size: int = 512,
    encoder: "str | type" = "projection",
    encoder_kwargs: dict | None = None,
    num_gpus: float | None = None,
) -> "ray.data.Dataset":
    """docs(doc_id, text) -> (doc_id, embedding list<float32>) via the warm
    encoder actor pool. `encoder` is a registry name or a class honoring the
    registry contract; kwargs reach its __init__ (once per actor).
    `num_gpus` reserves GPU fractions per actor for real-model encoders
    (the reference's GPU BERT pool, data_process.py:565-684)."""
    from biomedical_entity_linking_ray.stages.normalize import pool_size

    cls = resolve_encoder(encoder)
    kwargs = dict(encoder_kwargs or {})
    if cls is DocEncoder:
        kwargs.setdefault("out_dim", out_dim)
    extra: dict = {}
    if num_gpus is not None:
        extra["num_gpus"] = num_gpus
    return docs.map_batches(
        cls,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=pool_size(concurrency or 4),
        **extra,
    )


def embed_documents_pipeline(
    sf_dir: str,
    out_dir: str | None = None,
    encoder: "str | type" = "projection",
    encoder_kwargs: dict | None = None,
) -> "ray.data.Dataset":
    """documents -> encoder actor pool -> embedding table (optionally written
    as partitioned parquet -- the reference's embedding cache, T8)."""
    import os

    docs = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"])
    emb = encode_documents(docs, encoder=encoder, encoder_kwargs=encoder_kwargs)
    if out_dir is not None:
        emb.write_parquet(out_dir)
        return ray.data.read_parquet(out_dir)
    return emb
