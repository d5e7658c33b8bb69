"""Deterministic synthetic source-code corpus with planted clone clusters.

Implements the FIXTURES.md generator contract: a `(repo, path, commit, lang,
content)` files table (BASELINE.json input_hint shape) plus gold labeled pairs
and gold cluster assignments. Seed-fixed: same seed -> byte-identical tables.

Planted taxonomy (FIXTURES.md 4):
- exact duplicates         -> caught by sha256 exact blocking key
- near duplicates (<=5% token edits) -> MinHash/LSH band keys + Jaccard score
- path-renamed copies      -> content keys + Jaro-Winkler(path) score
- one hot block (vendored file in ~hot_block_size repos) -> salting must hold
- singletons + hard negatives (same lang, similar path, different content)
- cross-lang decoys (same path tokens, different lang)

Reference analog: the corpus plays the role of BigBio datasets with gold CUIs
(bioel/bioel/utils/bigbio_utils.py:182-194) and `compute_gold_clusters`
(bioel/.../data/data_process.py:491-514). No Ray here -- plain numpy/pyarrow;
small enough to build driver-side and feed via `ray.data.from_arrow`.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from biomedical_entity_linking_ray.config import SynthConfig
from biomedical_entity_linking_ray.functions.ids import file_id_of

_IDENTS = [
    "value", "result", "buffer", "index", "count", "total", "node", "item",
    "accum", "offset", "cursor", "window", "batch", "record", "queue", "stack",
    "payload", "handle", "token", "stream",
]
_FN_NAMES = [
    "process", "transform", "compute", "merge", "split", "encode", "decode",
    "validate", "normalize", "collect", "reduce", "filter_rows", "scan",
]
_COMMENTS = [
    "fast path", "TODO optimize", "see issue tracker", "legacy behavior",
    "bounds checked above", "hot loop", "do not reorder", "copied from spec",
]


@dataclass
class SynthCorpus:
    files: pa.Table          # repo, path, commit, lang, content
    gold_pairs: pa.Table     # id_a, id_b, label (1 pos / 0 neg)
    gold_clusters: pa.Table  # file_id, cluster_id, canonical_id


def _gen_program(rng: np.random.RandomState, n_lines: int) -> list[str]:
    """A code-like token-line program; list of lines so edits are line/token-local."""
    lines = [f"# module m{rng.randint(1_000_000)}"]
    lines.append("import os")
    lines.append("import sys")
    for _ in range(n_lines):
        kind = rng.randint(5)
        a, b, c = (rng.choice(_IDENTS) for _ in range(3))
        k1, k2 = rng.randint(1000), rng.randint(1000)
        if kind == 0:
            fn = rng.choice(_FN_NAMES)
            lines.append(f"def {fn}_{k1}({a}, {b}):")
            lines.append(f"    {c} = {a} + {b} * {k2}")
            lines.append(f"    return {c}")
        elif kind == 1:
            lines.append(f"{a} = {b} - {k1}")
        elif kind == 2:
            lines.append(f"if {a} > {k1}:")
            lines.append(f"    {b} = {a} % {k2}")
        elif kind == 3:
            lines.append(f"# {rng.choice(_COMMENTS)}")
        else:
            lines.append(f"{a} = [{b} for {b} in range({k1})]")
    return lines


def _near_dup(rng: np.random.RandomState, lines: list[str], edit_rate: float) -> list[str]:
    """Token-level edits at <= edit_rate: rename one identifier globally,
    mutate some constants, churn comments, swap adjacent lines."""
    out = list(lines)
    # global identifier rename (abbreviation-resolution analog, FIXTURES.md 5)
    src = rng.choice(_IDENTS)
    dst = f"{src}_{rng.randint(100)}"
    out = [l.replace(src, dst) for l in out]
    n_edits = max(1, int(len(out) * edit_rate))
    for _ in range(n_edits):
        i = rng.randint(len(out))
        op = rng.randint(3)
        if op == 0:
            out[i] = f"# {rng.choice(_COMMENTS)} {rng.randint(100)}"
        elif op == 1 and i + 1 < len(out):
            out[i], out[i + 1] = out[i + 1], out[i]
        else:
            out.insert(i, f"# pad {rng.randint(100)}")
    return out


def _rand_path(rng: np.random.RandomState, lang: str, stem: str | None = None) -> str:
    ext = {"python": "py", "java": "java", "js": "js", "c": "c", "go": "go", "text": "txt"}[lang]
    dirs = rng.choice(["src", "lib", "core", "pkg", "internal", "app"], size=rng.randint(1, 4))
    stem = stem or f"{rng.choice(_FN_NAMES)}_{rng.randint(10_000)}"
    return "/".join(list(dirs) + [f"{stem}.{ext}"])


def _commit(rng: np.random.RandomState) -> str:
    return "".join(rng.choice(list("0123456789abcdef"), size=40))


def generate_corpus(cfg: SynthConfig) -> SynthCorpus:
    rng = np.random.RandomState(cfg.seed)
    cs = max(1.0, float(cfg.content_scale))
    def nl(n):  # content-length knob: line counts scale together
        return max(1, int(n * cs))
    rows: list[tuple[str, str, str, str, str]] = []  # repo, path, commit, lang, content
    cluster_of: list[tuple[int, str]] = []  # (row_idx, cluster_id)
    neg_pairs: list[tuple[int, int]] = []   # explicit negative row-index pairs

    n_repos = max(20, (cfg.n_singletons + cfg.hot_block_size) // 10)
    repos = [f"org{i % 37}/repo{i}" for i in range(n_repos)]

    def add_row(repo, path, commit, lang, content, cluster_id=None) -> int:
        rows.append((repo, path, commit, lang, content))
        if cluster_id is not None:
            cluster_of.append((len(rows) - 1, cluster_id))
        return len(rows) - 1

    cl_n = 0

    def plant_cluster(size: int, lang: str) -> list[int]:
        nonlocal cl_n
        cid = f"cl{cl_n:06d}"
        cl_n += 1
        base = _gen_program(rng, nl(rng.randint(20, 60)))
        stem = f"{rng.choice(_FN_NAMES)}_{rng.randint(10_000)}"
        members = []
        for m in range(size):
            kind = rng.randint(3) if m > 0 else 0
            if kind == 0 or m == 0:   # exact duplicate (or the original)
                content = "\n".join(base)
            else:                      # near duplicate
                content = "\n".join(_near_dup(rng, base, cfg.near_dup_edit_rate))
            if rng.rand() < 0.3 and m > 0:  # path-renamed copy
                path = _rand_path(rng, lang)
            else:
                path = _rand_path(rng, lang, stem=stem)
            members.append(add_row(rng.choice(repos), path, _commit(rng), lang, content, cid))
        return members

    # small clusters 2-5
    for _ in range(cfg.n_small_clusters):
        plant_cluster(int(rng.randint(2, 6)), str(rng.choice(cfg.langs)))
    # medium clusters ~50
    for _ in range(cfg.n_medium_clusters):
        plant_cluster(int(rng.randint(40, 60)), str(rng.choice(cfg.langs)))
    # hot block: one vendored file in many repos -- ~2/3 byte-identical copies
    # (collapsed by exact contraction) and ~1/3 lightly-edited variants, so the
    # post-contraction representative set is still a hot near-dup family that
    # exercises salting + windowed pair generation.
    vend_cid = f"cl{cl_n:06d}"; cl_n += 1
    vend_lines = _gen_program(rng, nl(30))
    vend_content = "\n".join(vend_lines)
    for i in range(cfg.hot_block_size):
        if i > 0 and i % 3 == 0:
            content = "\n".join(_near_dup(rng, vend_lines, cfg.near_dup_edit_rate))
        else:
            content = vend_content
        add_row(repos[i % len(repos)], "vendor/thirdparty/licence.txt", _commit(rng),
                "text", content, vend_cid)

    # singletons
    for _ in range(cfg.n_singletons):
        lang = str(rng.choice(cfg.langs))
        add_row(rng.choice(repos), _rand_path(rng, lang), _commit(rng), lang,
                "\n".join(_gen_program(rng, nl(rng.randint(10, 50)))))

    # hard negatives: same lang + same path stem, different content
    for _ in range(cfg.n_hard_negatives):
        lang = str(rng.choice(cfg.langs))
        stem = f"{rng.choice(_FN_NAMES)}_{rng.randint(10_000)}"
        i = add_row(rng.choice(repos), _rand_path(rng, lang, stem=stem), _commit(rng),
                    lang, "\n".join(_gen_program(rng, nl(rng.randint(10, 40)))))
        j = add_row(rng.choice(repos), _rand_path(rng, lang, stem=stem), _commit(rng),
                    lang, "\n".join(_gen_program(rng, nl(rng.randint(10, 40)))))
        neg_pairs.append((i, j))

    # cross-lang decoys: same path tokens, different lang, different content
    lang_list = list(cfg.langs)
    for _ in range(cfg.n_cross_lang_decoys):
        la, lb = rng.choice(len(lang_list), size=2, replace=False)
        stem = f"{rng.choice(_FN_NAMES)}_{rng.randint(10_000)}"
        i = add_row(rng.choice(repos), _rand_path(rng, lang_list[la], stem=stem), _commit(rng),
                    lang_list[la], "\n".join(_gen_program(rng, nl(rng.randint(10, 40)))))
        j = add_row(rng.choice(repos), _rand_path(rng, lang_list[lb], stem=stem), _commit(rng),
                    lang_list[lb], "\n".join(_gen_program(rng, nl(rng.randint(10, 40)))))
        neg_pairs.append((i, j))

    # ---- assemble tables ----
    repo_c, path_c, commit_c, lang_c, content_c = (list(c) for c in zip(*rows))
    fids = [file_id_of(r, p, c) for r, p, c in zip(repo_c, path_c, commit_c)]
    files = pa.table({
        "repo": pa.array(repo_c, pa.string()),
        "path": pa.array(path_c, pa.string()),
        "commit": pa.array(commit_c, pa.string()),
        "lang": pa.array(lang_c, pa.string()),
        "content": pa.array(content_c, pa.string()),
    })

    # gold clusters (only clusters with >=2 members matter, but keep all planted)
    members_by_cid: dict[str, list[str]] = {}
    for ridx, cid in cluster_of:
        members_by_cid.setdefault(cid, []).append(fids[ridx])
    gc_fid, gc_cid, gc_canon = [], [], []
    for cid, ms in members_by_cid.items():
        canon = min(ms)
        for f in ms:
            gc_fid.append(f); gc_cid.append(cid); gc_canon.append(canon)
    gold_clusters = pa.table({
        "file_id": pa.array(gc_fid, pa.string()),
        "cluster_id": pa.array(gc_cid, pa.string()),
        "canonical_id": pa.array(gc_canon, pa.string()),
    })

    # gold pairs: positives within clusters (capped deterministically for huge
    # clusters: ring + seeded sample), plus explicit negatives
    pa_a, pa_b, pa_lbl = [], [], []

    def emit_pair(fa: str, fb: str, lbl: int):
        a, b = (fa, fb) if fa < fb else (fb, fa)
        pa_a.append(a); pa_b.append(b); pa_lbl.append(lbl)

    for cid, ms in members_by_cid.items():
        ms = sorted(ms)
        n = len(ms)
        if n * (n - 1) // 2 <= 5000:
            for i in range(n):
                for j in range(i + 1, n):
                    emit_pair(ms[i], ms[j], 1)
        else:
            for i in range(n):            # ring keeps the pair set connected
                emit_pair(ms[i], ms[(i + 1) % n], 1)
            k = min(5 * n, 20000)
            ii = rng.randint(0, n, size=k)
            jj = rng.randint(0, n, size=k)
            for i, j in zip(ii, jj):
                if i != j:
                    emit_pair(ms[i], ms[j], 1)
    for i, j in neg_pairs:
        emit_pair(fids[i], fids[j], 0)
    # random cross-cluster negatives for precision pressure
    all_cids = {f: c for (ridx, c) in cluster_of for f in [fids[ridx]]}
    n_rand_neg = len(neg_pairs)
    ii = rng.randint(0, len(fids), size=n_rand_neg * 4)
    jj = rng.randint(0, len(fids), size=n_rand_neg * 4)
    added = 0
    for i, j in zip(ii, jj):
        if added >= n_rand_neg:
            break
        if i == j:
            continue
        ca, cb = all_cids.get(fids[i]), all_cids.get(fids[j])
        if ca is not None and ca == cb:
            continue
        emit_pair(fids[i], fids[j], 0)
        added += 1

    gold_pairs = pa.table({
        "id_a": pa.array(pa_a, pa.string()),
        "id_b": pa.array(pa_b, pa.string()),
        "label": pa.array(pa_lbl, pa.int8()),
    })
    # drop duplicate pair rows (ring+sample may repeat); keep max label
    import pandas as pd
    gp = gold_pairs.to_pandas().groupby(["id_a", "id_b"], as_index=False)["label"].max()
    gold_pairs = pa.Table.from_pandas(gp, preserve_index=False).cast(gold_pairs.schema)

    return SynthCorpus(files=files, gold_pairs=gold_pairs, gold_clusters=gold_clusters)


# ---------------------------------------------------------------------------
# Cached materialization (tests / queries() / bench share one corpus per scale)
# ---------------------------------------------------------------------------

def corpus_dir(cfg: SynthConfig, root: str = "/tmp/bel_ray_synth") -> str:
    key = (f"seed{cfg.seed}_s{cfg.n_singletons}_c{cfg.n_small_clusters}"
           f"_m{cfg.n_medium_clusters}_h{cfg.hot_block_size}"
           + (f"_cs{cfg.content_scale:g}" if cfg.content_scale != 1.0 else ""))
    return os.path.join(root, key)


def generate_corpus_sharded(cfg: SynthConfig, shards: int) -> SynthCorpus:
    """Parallel generation: the corpus is split into `shards` independent
    sub-corpora (seed + shard index), generated as Ray tasks and concatenated.
    Deterministic given (seed, shards); used for large bench corpora where
    sequential generation would take tens of minutes."""
    import ray as _ray

    sub = cfg.scaled(1.0 / shards)

    @_ray.remote(num_cpus=1)
    def gen(shard: int) -> tuple:
        c = generate_corpus(SynthConfig(**{**sub.__dict__, "seed": cfg.seed + 1000 * shard}))
        # cluster ids restart at cl000000 inside every shard: prefix with the
        # shard index so concatenated gold labels never conflate two planted
        # clusters from different shards
        gc = c.gold_clusters
        cids = pa.array([f"sh{shard:02d}_{x}" for x in gc["cluster_id"].to_pylist()],
                        pa.string())
        gc = gc.set_column(gc.schema.get_field_index("cluster_id"), "cluster_id", cids)
        return c.files, c.gold_pairs, gc

    parts = _ray.get([gen.remote(i) for i in range(shards)])
    files = pa.concat_tables(p[0] for p in parts)
    gold_pairs = pa.concat_tables(p[1] for p in parts)
    gold_clusters = pa.concat_tables(p[2] for p in parts)
    return SynthCorpus(files=files, gold_pairs=gold_pairs, gold_clusters=gold_clusters)


def _write_sharded(table: pa.Table, path_dir: str, shards: int) -> None:
    """One parquet file per shard so a Dataset read parallelizes (a single
    file = a single read task = a serial scan)."""
    os.makedirs(path_dir, exist_ok=True)
    n = table.num_rows
    step = (n + shards - 1) // shards
    for i in range(shards):
        sl = table.slice(i * step, step)
        if sl.num_rows:
            pq.write_table(sl, os.path.join(path_dir, f"part-{i:04d}.parquet"))


def materialize_corpus(
    cfg: SynthConfig, root: str = "/tmp/bel_ray_synth", shards: int = 1
) -> str:
    """Write the corpus to parquet once; return its directory (idempotent)."""
    d = corpus_dir(cfg, root) + (f"_sh{shards}" if shards > 1 else "")
    done = os.path.join(d, "_SUCCESS")
    if os.path.exists(done):
        return d
    os.makedirs(d, exist_ok=True)
    corpus = generate_corpus(cfg) if shards <= 1 else generate_corpus_sharded(cfg, shards)
    # Always land files.parquet as a directory of ~4k-row parts: a single
    # parquet file is a single read task (a serial scan that the whole
    # pipeline then trails behind); part files give the read real fan-out.
    # Row content and order are identical to the unsharded write.
    write_shards = shards if shards > 1 else max(
        1, min(32, (corpus.files.num_rows + 4095) // 4096))
    if write_shards > 1:
        _write_sharded(corpus.files, os.path.join(d, "files.parquet"), write_shards)
    else:
        pq.write_table(corpus.files, os.path.join(d, "files.parquet"))
    pq.write_table(corpus.gold_pairs, os.path.join(d, "gold_pairs.parquet"))
    pq.write_table(corpus.gold_clusters, os.path.join(d, "gold_clusters.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return d


def synth_config_for_sf_dir(sf_dir: str) -> SynthConfig:
    """Map the driver's sf dir to a corpus scale: sf0.01 -> factor 1.0."""
    name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.01
    return SynthConfig().scaled(max(sf * 100.0, 0.05))


# ---------------------------------------------------------------------------
# Planted oracle corpus for the DEFAULT flagship config
# ---------------------------------------------------------------------------

PLANTED_TOKENS = 24  # sha256-hex tokens per planted file (~1.6 KB content)


def _planted_token(d: int, v: int, i: int) -> str:
    """Token i of variant v of doc d. Mirrored EXACTLY by the SQL oracle in
    __ray_entry__ (CASE over the same three branches)."""
    import hashlib

    if v >= 1 and i == PLANTED_TOKENS - 1:
        return hashlib.sha256(f"{d}:a1".encode()).hexdigest()
    if v == 2 and i == 0:
        return hashlib.sha256(f"{d}:a2".encode()).hexdigest()
    return hashlib.sha256(f"{d}:t:{i}".encode()).hexdigest()


def planted_files_from_docs(sf_dir: str) -> "object":
    """Files table derived deterministically from documents.doc_id ONLY, for
    which the DEFAULT LinkageConfig provably produces clusters == planted
    per-doc groups -- the value-exact oracle corpus for `linkage_assignments`.

    Per doc_id d (group = d), by d % 4 (commit = 'v{v}c{k}' so every file has
    a distinct (path, commit) identity; k indexes the exact copy):
    - 0: variants {base, v1, v2} x copies {0, 1}      (6 files; v1 = base with
         the last sha-token replaced, v2 = v1 with the first replaced -- a
         near-dup CHAIN, so connected components must transit v1)
    - 1: base x copies {0, 1}                         (exact-dup pair)
    - 2: base x copy {0}                              (singleton)
    - 3: {base, v1} x copy {0}                        (near-dup-only pair)

    Why the prediction is sound under the DEFAULT config:
    - within a group every file shares path `docs/f{d}.txt` and lang, so the
      path-stem block key co-blocks the group's reps DETERMINISTICALLY
      (banding adds further co-blocks; all groups are far below salt_cap);
    - within-group rep pairs differ in <= 2 of 24 high-entropy sha tokens:
      Jaro-Winkler(path)=1.0, minhash-Jaccard >= ~0.85, TF-cosine >= ~0.9,
      so score >= ~0.85 >> tau=0.62 with a margin no estimator noise crosses
      (and the v2 chain makes the cluster robust even to a lost single edge);
    - across groups contents are disjoint sha-hex streams (shingle Jaccard
      ~0.01): a shared band needs 6 consecutive equal 16-bit slots
      (~1e-12/band/pair -- absent at every test sf, and even then the pair
      scores ~0.25 < tau because stems differ and sketches disagree).

    Reference analog: gold-cluster construction from deterministic keys,
    bioel data_process.py:491-514; evaluated end to end like
    eval_cluster_linking.py:90-146.
    """
    import ray.data as rd

    docs = rd.read_parquet(os.path.join(sf_dir, "documents.parquet"),
                           columns=["doc_id"])

    def to_files(t: pa.Table) -> pa.Table:
        repos, paths, commits, langs, contents = [], [], [], [], []
        for d in t["doc_id"].to_pylist():
            d = int(d)
            m = d % 4
            variants = (0, 1, 2) if m == 0 else (0, 1) if m == 3 else (0,)
            copies = (0, 1) if m in (0, 1) else (0,)
            path = f"docs/f{d}.txt"
            for v in variants:
                content = " ".join(
                    _planted_token(d, v, i) for i in range(PLANTED_TOKENS))
                for k in copies:
                    repos.append("corpus")
                    paths.append(path)
                    commits.append(f"v{v}c{k}")
                    langs.append("txt")
                    contents.append(content)
        return pa.table({
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "content": pa.array(contents, pa.string()),
        })

    return docs.map_batches(to_files, batch_format="pyarrow")
