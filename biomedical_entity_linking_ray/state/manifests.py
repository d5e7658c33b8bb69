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
        if not any(f.endswith(".parquet") for f in os.listdir(tmp_dir)):
            # empty dataset: land one schema-typed empty file so read_stage
            # round-trips (write_parquet writes nothing for zero rows)
            import pyarrow as pa
            import pyarrow.parquet as _pq

            schema = ds.schema()
            _pq.write_table(
                pa.schema(zip(schema.names, schema.types)).empty_table(),
                os.path.join(tmp_dir, "empty_000.parquet"),
            )
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

    Thin wrapper over ``run_linkage(checkpoint_root=...)`` -- the checkpointed
    and in-memory paths share ONE implementation (fused in-block scoring, no
    standalone pair-join/score actor pool), so the two cannot drift and the
    CPU-reservation profile is identical (the round-1 un-fused checkpoint path
    deadlocked the 4-CPU test session with idle scorer + aggregator actors).

    Returns the final assignments dataset (read from its checkpoint).
    """
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    return run_linkage(files, cfg, checkpoint_root=root).assignments
