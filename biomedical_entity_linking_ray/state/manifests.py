"""Resumable per-stage Parquet checkpoints with manifests.

The reference resumes via pickle-if-exists gates scattered through every
model (top_cands.py:41-66, BiEncoderLightningModule.py:350-370,
umls_utils.py:88-95, sapbert/utils.py:138-156 -- SURVEY.md 4 "Checkpoint /
resume"). Here that pattern is systematized:

    <root>/<stage>/data/*.parquet     the stage output (partitioned files)
    <root>/<stage>/manifest.json      rows, per-partition file inventory,
                                      stage counters, config fingerprint,
                                      wall time -- written ATOMICALLY (tmp +
                                      rename) only after the data lands

A rerun with the same root + config fingerprint skips every stage whose
manifest is complete (reads its parquet back instead); changing the config
invalidates downstream stages automatically because the fingerprint is part
of the manifest. Output layout is a directory of part files per stage --
never one giant file -- so a failed run resumes at stage granularity and the
per-partition inventory makes partial-write detection trivial.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict

import ray.data


def _config_fingerprint(cfg) -> str:
    payload = json.dumps(asdict(cfg), sort_keys=True, default=str)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


class CheckpointedRun:
    def __init__(self, root: str, cfg):
        self.root = root
        self.cfg = cfg
        self.fingerprint = _config_fingerprint(cfg)
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self._stage_dir(stage), "manifest.json")

    # -- queries ----------------------------------------------------------
    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        if m is None or m.get("fingerprint") != self.fingerprint:
            return False
        # verify the per-partition inventory is still intact on disk
        data_dir = os.path.join(self._stage_dir(stage), "data")
        for part in m.get("partitions", []):
            if not os.path.exists(os.path.join(data_dir, part["file"])):
                return False
        return True

    # -- write / read -----------------------------------------------------
    def write_stage(
        self,
        stage: str,
        ds: "ray.data.Dataset",
        counters: dict | None = None,
    ) -> "ray.data.Dataset":
        """Materialize `ds` into the stage checkpoint; returns a dataset
        reading back from the checkpoint (so downstream lineage is the files,
        not the in-memory plan)."""
        t0 = time.time()
        sdir = self._stage_dir(stage)
        data_dir = os.path.join(sdir, "data")
        tmp_dir = os.path.join(sdir, f".tmp.{os.getpid()}")
        # clean slate for this attempt
        import shutil

        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(data_dir, ignore_errors=True)
        os.makedirs(tmp_dir, exist_ok=True)
        ds.write_parquet(tmp_dir)
        os.replace(tmp_dir, data_dir)  # atomic publish of the data directory

        import pyarrow.parquet as pq

        partitions = []
        total_rows = 0
        for f in sorted(os.listdir(data_dir)):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(data_dir, f)).metadata
            partitions.append({"file": f, "rows": md.num_rows,
                               "bytes": os.path.getsize(os.path.join(data_dir, f))})
            total_rows += md.num_rows

        manifest = {
            "stage": stage,
            "fingerprint": self.fingerprint,
            "rows": total_rows,
            "partitions": partitions,
            "counters": counters or {},
            "wall_sec": round(time.time() - t0, 3),
            "completed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        mp = self._manifest_path(stage)
        with open(mp + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.replace(mp + ".tmp", mp)  # manifest lands only after data did
        return self.read_stage(stage)

    def read_stage(self, stage: str) -> "ray.data.Dataset":
        return ray.data.read_parquet(os.path.join(self._stage_dir(stage), "data"))

    def stage(self, name: str, build) -> "ray.data.Dataset":
        """Return the checkpointed stage output, computing it only if needed.

        `build()` must return (dataset, counters_dict)."""
        if self.is_complete(name):
            return self.read_stage(name)
        ds, counters = build()
        return self.write_stage(name, ds, counters)

    def summary(self) -> dict:
        out = {}
        for stage in sorted(os.listdir(self.root)):
            m = self.manifest(stage)
            if m:
                out[stage] = {k: m[k] for k in ("rows", "wall_sec", "counters")}
        return out


def run_linkage_checkpointed(
    files: "ray.data.Dataset",
    cfg,
    root: str,
) -> "ray.data.Dataset":
    """Checkpointed flagship pipeline: each stage lands in <root>/<stage>/
    and a rerun (same root + config) resumes after the last complete stage.

    Returns the final assignments dataset (read from its checkpoint).
    """
    from biomedical_entity_linking_ray.functions.joins import hash_join, heal_projection
    from biomedical_entity_linking_ray.pipelines import linkage as L
    from biomedical_entity_linking_ray.stages import (
        blocking, clustering, contraction, normalize, scoring,
    )
    import pyarrow as pa

    run = CheckpointedRun(root, cfg)

    feats = run.stage("s0_features", lambda: (
        normalize.compute_features(files.repartition(32), cfg), {}))

    def _contract():
        members, reps = contraction.exact_contract(feats, cfg)
        return members, {"note": "reps checkpointed separately"}

    members = run.stage("s1_members", _contract)
    reps = run.stage("s1_reps", lambda: (
        contraction.exact_contract(feats, cfg)[1], {}))

    blocks = run.stage("s2_blocks", lambda: (
        blocking.salt_hot_keys(blocking.emit_block_keys(reps, cfg), cfg), {}))

    pairs = run.stage("s3_pairs", lambda: (
        blocking.generate_pairs(blocks, cfg), {}))

    def _score():
        if pairs.count() == 0:
            return ray.data.from_arrow(scoring.EMPTY_SCORED), {"pairs_scored": 0}
        scored = scoring.score_pairs(blocking.attach_pair_features(pairs, reps, cfg), cfg)
        return scored, {"pairs_scored": pairs.count()}

    scored = run.stage("s4_scored", _score)

    edges = run.stage("s5_edges", lambda: (
        scoring.threshold_edges(scored, cfg), {"tau": cfg.tau}))

    rep_assign = run.stage("s6_clusters", lambda: (
        clustering.connected_components(edges, reps, cfg), {}))

    def _final():
        P = cfg.join_partitions
        assign = hash_join(
            members, rep_assign, "inner", P, on=("rep_id",), right_on=("file_id",),
            right_suffix="_rep",
        ).map_batches(
            heal_projection(L._ASSIGN_SCHEMA, lambda t: pa.table({
                "file_id": t["file_id"], "cluster_id": t["cluster_id"],
                "canonical_id": t["canonical_id"], "content_sha": t["content_sha"],
            })),
            batch_format="pyarrow",
        )
        lineage = feats.select_columns(["file_id", "repo", "path", "commit", "lang"])
        full = hash_join(assign, lineage, "inner", P, on=("file_id",)).map_batches(
            heal_projection(L._FULL_SCHEMA, lambda t: pa.table(
                {c: t[c] for c in L._FULL_SCHEMA.names})),
            batch_format="pyarrow",
        )
        return full, {}

    return run.stage("s7_assignments", _final)
