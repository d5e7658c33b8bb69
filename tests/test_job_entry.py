"""The `ray job submit` entrypoint (`python -m biomedical_entity_linking_ray`).

The sandbox has no dashboard so the HTTP submission path can't run; the job
manager ultimately executes the submitted command line in a fresh process on
the cluster, which is exactly what these tests do. Ref analog: the reference
is driven by `python evaluate.py` CLI invocations (bioel/bioel/evaluate.py
__main__); this is that surface re-expressed as a Ray job driver.
"""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_job(extra, tmp_path, name):
    out = str(tmp_path / f"{name}_out")
    metrics = str(tmp_path / f"{name}_metrics.json")
    from biomedical_entity_linking_ray.config import SynthConfig
    from biomedical_entity_linking_ray.synth import materialize_corpus

    d = materialize_corpus(SynthConfig().scaled(0.1))
    env = {**os.environ, "RAY_ADDRESS": "local"}
    cmd = [sys.executable, "-m", "biomedical_entity_linking_ray",
           "--input", os.path.join(d, "files.parquet"),
           "--output", out, "--metrics-out", metrics,
           "--num-cpus", "2", *extra]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-4000:]
    with open(metrics) as f:
        m = json.loads(f.read())
    return out, m


def test_job_entry_end_to_end(tmp_path):
    out, m = _run_job(["--assignments-only"], tmp_path, "ao")
    t = pq.read_table(out)
    assert t.num_rows == m["rows_out"] > 0
    assert {"file_id", "cluster_id", "canonical_id", "content_sha"} <= set(
        t.column_names)
    assert m["n_clusters"] > 0
    assert m["assignments_only"] is True and m["checkpointed"] is False
    # every row carries the content-sha invariant
    assert t["content_sha"].null_count == 0


def test_job_entry_checkpointed_partitioned(tmp_path):
    ckpt = str(tmp_path / "ckpt")
    out, m = _run_job(
        ["--assignments-only", "--checkpoint-root", ckpt,
         "--partition-cols", "lang"], tmp_path, "ck")
    # hive-partitioned output: lang=<value> subdirectories, never one file
    parts = [p for p in os.listdir(out) if p.startswith("lang=")]
    assert parts, os.listdir(out)
    # per-stage manifests landed with row counts
    assert m["checkpointed"] is True
    assert m["stages"].get("s0_features", {}).get("rows", 0) > 0
    assert m["stages"].get("s7_assignments", {}).get("rows") == m["rows_out"]
    assert os.path.exists(os.path.join(ckpt, "s6_clusters", "manifest.json"))


def test_job_entry_resubmission_resumes(tmp_path):
    """Resubmitting the same job (same checkpoint root + config) must skip
    every completed stage and emit identical assignments — the pre-emption
    recovery contract of the job entrypoint."""
    ckpt = str(tmp_path / "ckpt_resume")
    out1, m1 = _run_job(["--assignments-only", "--checkpoint-root", ckpt],
                        tmp_path, "r1")
    stamps = {}
    for st, info in m1["stages"].items():
        p = os.path.join(ckpt, st, "manifest.json")
        with open(p) as f:
            stamps[st] = json.load(f).get("completed_at")
    assert stamps, m1["stages"]

    out2, m2 = _run_job(["--assignments-only", "--checkpoint-root", ckpt],
                        tmp_path, "r2")
    # completed stages were read back, not recomputed: manifests untouched
    for st, stamp in stamps.items():
        with open(os.path.join(ckpt, st, "manifest.json")) as f:
            assert json.load(f).get("completed_at") == stamp, st
    # and the resumed output is identical, row order aside
    import pandas as pd
    a = pq.read_table(out1).to_pandas().sort_values("file_id").reset_index(drop=True)
    b = pq.read_table(out2).to_pandas().sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])
    assert m2["rows_out"] == m1["rows_out"]
    assert m2["n_clusters"] == m1["n_clusters"]


def test_job_entry_incremental(tmp_path):
    """Deployment loop: a batch job writes the prior checkpoint, then an
    incremental job links the day's delta against it — full updated table
    identical to the batch run over base ∪ delta (library contract, here
    checked through the CLI surface end-to-end)."""
    import pandas as pd
    import ray.data as rd

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import planted_files_from_docs

    files = planted_files_from_docs("/root/testdata/sf0.001").materialize()
    base = files.filter(expr="commit == 'v0c0' or commit == 'v1c0'")
    delta = files.filter(expr="commit != 'v0c0' and commit != 'v1c0'")
    base_p = str(tmp_path / "base_parquet")
    delta_p = str(tmp_path / "delta_parquet")
    base.write_parquet(base_p)
    delta.write_parquet(delta_p)

    ckpt = str(tmp_path / "prior_ckpt")
    env = {**os.environ, "RAY_ADDRESS": "local"}

    def run(extra, name):
        out = str(tmp_path / f"{name}_out")
        metrics = str(tmp_path / f"{name}_metrics.json")
        cmd = [sys.executable, "-m", "biomedical_entity_linking_ray",
               "--output", out, "--metrics-out", metrics,
               "--num-cpus", "2", *extra]
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == 0, proc.stderr[-4000:]
        with open(metrics) as f:
            return out, json.loads(f.read())

    run(["--input", base_p, "--checkpoint-root", ckpt], "base")
    out_inc, m = run(["--input", delta_p, "--prior-checkpoint", ckpt], "inc")
    assert m["mode"] == "incremental"
    assert m["incremental"]["n_delta_files"] == delta.count()

    # value-exact vs the in-process batch run over base ∪ delta
    want = (run_linkage(files, LinkageConfig()).assignments.to_pandas()
            .sort_values("file_id").reset_index(drop=True))
    got = (pq.read_table(out_inc).to_pandas()
           .sort_values("file_id").reset_index(drop=True))
    cols = ["file_id", "cluster_id", "canonical_id", "content_sha"]
    pd.testing.assert_frame_equal(got[cols], want[cols])

    # delta-only view: exactly the delta rows
    out_d, md = run(["--input", delta_p, "--prior-checkpoint", ckpt,
                     "--delta-only"], "incd")
    assert md["rows_out"] == delta.count()

    # config drift against the prior checkpoint must fail loudly, not read
    # stale stages
    cmd = [sys.executable, "-m", "biomedical_entity_linking_ray",
           "--input", delta_p, "--output", str(tmp_path / "bad_out"),
           "--prior-checkpoint", ckpt, "--tau", "0.9", "--num-cpus", "2"]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=600)
    assert proc.returncode == 2
    assert "stale fingerprint" in proc.stderr


def test_job_entry_incremental_chained(tmp_path):
    """Two delta waves through the CLI: wave 1 persists its updated prior
    with --update-checkpoint, wave 2 links against THAT — final table equals
    the batch run over all three waves."""
    import pandas as pd

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage
    from biomedical_entity_linking_ray.synth import planted_files_from_docs

    files = planted_files_from_docs("/root/testdata/sf0.001").materialize()
    parts = {
        "base": "commit == 'v0c0' or commit == 'v1c0'",
        "d1": "commit == 'v2c0' or commit == 'v0c1'",
        "d2": "commit == 'v1c1' or commit == 'v2c1'",
    }
    paths = {}
    for name, expr in parts.items():
        paths[name] = str(tmp_path / f"{name}_parquet")
        files.filter(expr=expr).write_parquet(paths[name])

    ck0 = str(tmp_path / "ck0")
    ck1 = str(tmp_path / "ck1")
    env = {**os.environ, "RAY_ADDRESS": "local"}

    def run(extra, name, want_rc=0):
        out = str(tmp_path / f"{name}_out")
        metrics = str(tmp_path / f"{name}_metrics.json")
        cmd = [sys.executable, "-m", "biomedical_entity_linking_ray",
               "--output", out, "--metrics-out", metrics,
               "--num-cpus", "2", *extra]
        proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                              text=True, timeout=600)
        assert proc.returncode == want_rc, proc.stderr[-4000:]
        if want_rc:
            return proc.stderr, None
        with open(metrics) as f:
            return out, json.loads(f.read())

    run(["--input", paths["base"], "--checkpoint-root", ck0], "w0")
    _, m1 = run(["--input", paths["d1"], "--prior-checkpoint", ck0,
                 "--update-checkpoint", ck1], "w1")
    assert m1["incremental"]["updated_prior_root"] == ck1
    out2, _ = run(["--input", paths["d2"], "--prior-checkpoint", ck1], "w2")

    want = (run_linkage(files, LinkageConfig()).assignments.to_pandas()
            .sort_values("file_id").reset_index(drop=True))
    got = (pq.read_table(out2).to_pandas()
           .sort_values("file_id").reset_index(drop=True))
    cols = ["file_id", "cluster_id", "canonical_id", "content_sha"]
    pd.testing.assert_frame_equal(got[cols], want[cols])

    # guard rails: writeback onto the derivation root / flag without mode
    err, _ = run(["--input", paths["d2"], "--prior-checkpoint", ck1,
                  "--update-checkpoint", ck1], "bad1", want_rc=2)
    assert "fresh root" in err
    err, _ = run(["--input", paths["d2"], "--update-checkpoint",
                  str(tmp_path / "x")], "bad2", want_rc=2)
    assert "only applies to incremental" in err


def test_job_entry_anchored(tmp_path):
    """--anchors refines clusters so each keeps >= 1 anchor row (reference
    special_partition invariant) while preserving the job output contract."""
    import numpy as np
    import pyarrow as pa

    from biomedical_entity_linking_ray.config import SynthConfig
    from biomedical_entity_linking_ray.synth import materialize_corpus

    d = materialize_corpus(SynthConfig().scaled(0.1))
    # anchors: a deterministic half of the corpus by repo/path hash -- built
    # from the INPUT (file_id = sha256(repo|path|commit), same derivation as
    # the engine's)
    from biomedical_entity_linking_ray.functions.ids import file_id_of

    t = pq.read_table(os.path.join(d, "files.parquet"),
                      columns=["repo", "path", "commit"])
    fids = [file_id_of(r, p, c) for r, p, c in
            zip(t["repo"].to_pylist(), t["path"].to_pylist(),
                t["commit"].to_pylist())]
    anchors = sorted(fids)[::2]
    pq.write_table(pa.table({"file_id": pa.array(anchors, pa.string())}),
                   tmp_path / "anchors.parquet")

    out, m = _run_job(["--anchors", str(tmp_path / "anchors.parquet"),
                       "--partition-cols", "lang"],
                      tmp_path, "anch")
    # lineage columns preserved -> hive partitioning works on anchored output
    assert [p for p in os.listdir(out) if p.startswith("lang=")]
    res = pq.read_table(out).to_pandas()
    assert len(res) == m["rows_out"] > 0
    assert {"file_id", "cluster_id", "canonical_id", "content_sha",
            "repo", "path", "commit", "lang"} <= set(res.columns)
    assert res["content_sha"].notna().all()
    assert not res["file_id"].duplicated().any()
    # invariant: every multi-member cluster containing any anchor-reachable
    # node keeps >= 1 anchor; here anchors cover half the corpus, so check
    # the weaker universally-true form: a cluster with an anchor keeps it,
    # and canonical_id of anchored clusters IS an anchor
    aset = set(anchors)
    grp = res.groupby("cluster_id")
    for cl, sub in grp:
        has_anchor = any(f in aset for f in sub["file_id"])
        if has_anchor:
            assert sub["canonical_id"].iloc[0] in aset

    # --anchors + --assignments-only must be rejected (needs scored pairs)
    env = {**os.environ, "RAY_ADDRESS": "local"}
    cmd = [sys.executable, "-m", "biomedical_entity_linking_ray",
           "--input", os.path.join(d, "files.parquet"),
           "--output", str(tmp_path / "rejected"),
           "--assignments-only",
           "--anchors", str(tmp_path / "anchors.parquet")]
    proc = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                          text=True, timeout=300)
    assert proc.returncode == 2
    assert "--assignments-only" in proc.stderr
