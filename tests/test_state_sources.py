"""Checkpoint/resume (manifests) and source-reader tests."""

import json
import os
import shutil

import pandas as pd
import pytest

import ray.data as rd


@pytest.fixture(scope="module")
def ckpt_root(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ckpt"))


def test_checkpointed_run_resumes(small_corpus, ckpt_root):
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.state.manifests import (
        CheckpointedRun, run_linkage_checkpointed,
    )

    cfg = LinkageConfig(salt_cap=32, join_partitions=4, scorer_concurrency=2)
    files = rd.from_arrow(small_corpus.files)
    root = os.path.join(ckpt_root, "run1")

    out1 = run_linkage_checkpointed(files, cfg, root).to_pandas()
    assert len(out1) == small_corpus.files.num_rows

    run = CheckpointedRun(root, cfg)
    # every stage is complete with per-partition inventory + counters
    for stage in ["s0_features", "s1_members", "s1_reps", "s2_blocks",
                  "s4_scored", "s5_stars",
                  "s6_clusters", "s7_assignments"]:
        assert run.is_complete(stage), stage
        m = run.manifest(stage)
        assert m["rows"] == sum(p["rows"] for p in m["partitions"])
    assert run.manifest("s4_scored")["counters"]["pairs_scored"] > 0

    # kill the tail stages; rerun must resume, keep early outputs untouched
    # (byte-identical data dir mtimes) and reproduce identical assignments
    early_mtime = os.path.getmtime(os.path.join(root, "s0_features", "manifest.json"))
    shutil.rmtree(os.path.join(root, "s6_clusters"))
    shutil.rmtree(os.path.join(root, "s7_assignments"))
    out2 = run_linkage_checkpointed(files, cfg, root).to_pandas()
    assert os.path.getmtime(os.path.join(root, "s0_features", "manifest.json")) == early_mtime
    a = out1.sort_values("file_id").reset_index(drop=True)
    b = out2.sort_values("file_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_config_change_invalidates(small_corpus, ckpt_root):
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.state.manifests import CheckpointedRun

    root = os.path.join(ckpt_root, "run1")
    cfg2 = LinkageConfig(salt_cap=16, join_partitions=4, scorer_concurrency=2)
    run = CheckpointedRun(root, cfg2)
    assert not run.is_complete("s0_features")  # fingerprint mismatch


def test_alias_dictionary_reader(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_alias_dictionary

    p = tmp_path / "dict.txt"
    p.write_text("C1|C2||Heart Attack\nC3||stroke\nC9||HEART ATTACK\n\nbadline\n")
    df = read_alias_dictionary(str(p)).to_pandas().sort_values("alias")
    # alias lowercased + deduped (first wins, reference S10 semantics)
    assert list(df["alias"]) == ["heart attack", "stroke"]
    assert set(df["ids"]) <= {"C1|C2", "C3", "C9"}


def test_record_block_reader(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_record_blocks

    p = tmp_path / "corpus.txt"
    p.write_text(
        "d1|t|Title One\nd1|a|Body one.\nd1\t0\t5\tspan\ttype\tid\n"
        "\n"
        "d2|t|Title Two\nd2|a|Body two.\n"
    )
    df = read_record_blocks(str(p)).to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == ["d1", "d2"]
    assert df.iloc[0]["n_annotations"] == 1
    assert df.iloc[1]["title"] == "Title Two"


def test_delimited_reader(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_delimited_table

    p = tmp_path / "mr.psv"
    p.write_text("a|1|x\nb|2|y\n")
    df = read_delimited_table(str(p), column_names=["k", "n", "v"]).to_pandas()
    assert list(df["k"]) == ["a", "b"]
    assert list(df["n"]) == [1, 2]


def test_files_table_reader_prunes(small_corpus, tmp_path):
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.sources.readers import read_files_table

    p = tmp_path / "files.parquet"
    pq.write_table(small_corpus.files, str(p))
    ds = read_files_table(str(p), columns=["repo", "lang"], lang="python")
    df = ds.to_pandas()
    assert set(df.columns) == {"repo", "lang"}
    assert (df["lang"] == "python").all()


def test_read_umls_composite(tmp_path):
    """S8 composite loader on a tiny MRCONSO/MRRANK fixture: rank-canonical
    name, alias set minus name, lang filter, unranked-(sab,tty) drop,
    UMLS: prefix (ref umls_utils.py:83-237 + ontology.py:326-408)."""
    from biomedical_entity_linking_ray.sources.readers import read_umls

    def conso_line(cui, lng, sab, tty, alias):
        fields = [cui, lng, "P", "L1", "PF", "S1", "Y", "A1", "", "", "",
                  sab, tty, "K1", alias, "0", "N", ""]
        return "|".join(fields) + "|"

    (tmp_path / "MRCONSO.RRF").write_text("\n".join([
        conso_line("C1", "ENG", "MSH", "MH", "b name"),     # rank 850-700=150
        conso_line("C1", "ENG", "MSH", "MH", "a name"),     # ties -> min alias
        conso_line("C1", "ENG", "SNOMED", "PT", "z alias"), # rank 850-800=50 -> canonical
        conso_line("C1", "ENG", "JUNK", "XX", "dropped"),   # unranked -> inner-merge drop
        conso_line("C1", "FRE", "MSH", "MH", "nom"),        # lang filter
        conso_line("C2", "ENG", "MSH", "MH", "only"),       # singleton alias == name
    ]) + "\n")
    (tmp_path / "MRRANK.RRF").write_text("800|SNOMED|PT|N|\n700|MSH|MH|N|\n")

    out = read_umls(str(tmp_path)).to_pandas().sort_values("cui").reset_index(drop=True)
    assert list(out["cui"]) == ["UMLS:C1", "UMLS:C2"]
    assert list(out["name"]) == ["z alias", "only"]
    assert list(out["aliases"][0]) == ["a name", "b name"]
    assert list(out["aliases"][1]) == []
    assert list(out["num_aliases"]) == [2, 0]


def test_read_ab3p_blocks(tmp_path):
    """Block parse + confidence filter of the Ab3P raw format (S-family:
    ref abbreviations_utils.py:76-120)."""
    from biomedical_entity_linking_ray.sources.readers import read_ab3p

    p = tmp_path / "raw_abbreviations.txt"
    p.write_text(
        "101 | some doc text\n"
        "  HSTF|heat shock transcription factor|0.999\n"
        "  LOW|too uncertain|0.40\n"
        "\n"
        "202 | another doc | with a pipe in text\n"
        "  GEF|guanine nucleotide exchange factor|0.97\n"
        "\n"
        "303 | doc with no abbreviations\n"
    )
    df = read_ab3p(str(p)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert df["doc_id"].tolist() == ["101", "202"]
    assert df["short_form"].tolist() == ["HSTF", "GEF"]
    assert df["confidence"].tolist() == [0.999, 0.97]


def test_detect_abbreviations_schwartz_hearst():
    """S&H detector: positive matches, window-bound rejection, digit/case
    candidate gating, empty-prefix guard."""
    import pyarrow as pa
    import ray.data as rd

    from biomedical_entity_linking_ray.stages.extraction import detect_abbreviations

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], pa.int64()),
        "text": pa.array([
            "study of heat shock transcription factor (HSTF) in mice",
            "the ras guanine nucleotide exchange factor (GEF) acts",
            "unrelated words only here (XYZ) nothing matches",
            "numbers are not candidates (123) at all",
            "lowercase forms are skipped (abc) too",
            "(SF) leading paren has no long-form window",
        ]),
    }))
    df = detect_abbreviations(docs).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    assert df["doc_id"].tolist() == [1, 2]
    assert df["long_form"].tolist() == [
        "heat shock transcription factor",
        "guanine nucleotide exchange factor",
    ]


def test_parquet_exchange_matches_objectstore_dedup(small_corpus, ckpt_root):
    """Checkpointed runs route the scored-pair/star dedup through the Parquet
    disk exchange (groups.parquet_exchange_*); every artifact must be
    value-identical to the in-memory object-store path, and the scratch
    exchange dir must be reclaimed once s4/s5 are durable."""
    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    cfg = LinkageConfig(salt_cap=32, join_partitions=4, scorer_concurrency=2)
    files = rd.from_arrow(small_corpus.files)

    def canon(ds, cols):
        return ds.to_pandas()[cols].sort_values(cols).reset_index(drop=True)

    pair_cols = ["id_a", "id_b", "block_key", "score_jw", "score_jaccard",
                 "score_cosine", "score"]
    mem = run_linkage(files, cfg)
    root = os.path.join(ckpt_root, "run_exchange")
    ck = run_linkage(files, cfg, checkpoint_root=root)
    pd.testing.assert_frame_equal(
        canon(mem.scored_pairs, pair_cols), canon(ck.scored_pairs, pair_cols))
    pd.testing.assert_frame_equal(
        canon(mem.star_edges, ["id_a", "id_b", "block_key"]),
        canon(ck.star_edges, ["id_a", "id_b", "block_key"]))
    pd.testing.assert_frame_equal(
        canon(mem.assignments, ["file_id", "cluster_id"]),
        canon(ck.assignments, ["file_id", "cluster_id"]))
    assert not os.path.exists(os.path.join(root, "s3_exchange"))


def test_parquet_exchange_aggregate_generic(tmp_path):
    """parquet_exchange_write/aggregate vs a plain pandas groupby on random
    keyed data -- the generic contract, independent of the flagship."""
    import numpy as np
    import pyarrow as pa

    from biomedical_entity_linking_ray.functions.groups import (
        parquet_exchange_aggregate, parquet_exchange_write)

    rng = np.random.RandomState(7)
    n = 5000
    df = pd.DataFrame({
        "k1": rng.choice([f"k{i}" for i in range(40)], n),
        "k2": rng.randint(0, 5, n).astype(np.int64),
        "v": rng.rand(n),
        "w": rng.randint(0, 1000, n).astype(np.int64),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    spill = str(tmp_path / "xchg")
    parquet_exchange_write(ds, ["k1", "k2"], spill, n_buckets=7)
    got = parquet_exchange_aggregate(
        spill, ["k1", "k2"],
        {"v_max": ("v", "max"), "w_min": ("w", "min"), "n": ("w", "count")},
    ).to_pandas().sort_values(["k1", "k2"]).reset_index(drop=True)
    want = df.groupby(["k1", "k2"], as_index=False).agg(
        v_max=("v", "max"), w_min=("w", "min"), n=("w", "size")
    ).sort_values(["k1", "k2"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_parquet_exchange_unicode_and_filter(tmp_path):
    """Exchange correctness with unicode / empty-string keys (FNV prefix
    hashing path) and the pre_filter split used by the pair/star dedup."""
    import numpy as np
    import pyarrow as pa

    from biomedical_entity_linking_ray.functions.groups import (
        parquet_exchange_aggregate, parquet_exchange_write)

    rng = np.random.RandomState(11)
    keys = ["", "a", "clé", "ключ", "鍵", "k" * 200]  # includes > width=96 prefix
    n = 800
    df = pd.DataFrame({
        "k": rng.choice(keys, n),
        "kind": rng.choice(["p", "s"], n),
        "v": rng.rand(n),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df))
    spill = str(tmp_path / "xchg_u")
    parquet_exchange_write(ds, ["k"], spill, n_buckets=3)
    for kind in ["p", "s"]:
        got = parquet_exchange_aggregate(
            spill, ["k"], {"v_max": ("v", "max"), "n": ("v", "count")},
            pre_filter=("kind", kind),
        ).to_pandas().sort_values("k").reset_index(drop=True)
        want = df[df["kind"] == kind].groupby("k", as_index=False).agg(
            v_max=("v", "max"), n=("v", "size")
        ).sort_values("k").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
