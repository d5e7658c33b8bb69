"""Tests for round-2 operators: extraction, sampling, set-agg, readers,
per-lang eval, per-cluster MST, retrieval recall."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from tests.conftest import SF_DIR


def test_dictionary_extract_counts():
    from biomedical_entity_linking_ray.pipelines.text_analysis import dictionary_extract

    df = dictionary_extract(SF_DIR).to_pandas()
    assert set(df.columns) == {"doc_id", "term", "n_occurrences"}
    assert (df["n_occurrences"] >= 1).all()
    # determinism
    df2 = dictionary_extract(SF_DIR).to_pandas()
    key = ["doc_id", "term"]
    pd.testing.assert_frame_equal(
        df.sort_values(key).reset_index(drop=True),
        df2.sort_values(key).reset_index(drop=True))


def test_span_extract_and_overlap_filter():
    from biomedical_entity_linking_ray.stages.extraction import (
        extract_spans, filter_overlapping_spans,
    )

    docs = rd.from_items([
        {"doc_id": 1, "text": "tablet on the table top"},
        {"doc_id": 2, "text": "hash hashhash"},
    ])
    spans = extract_spans(docs, ["table", "tablet", "hash"], concurrency=1)
    kept = filter_overlapping_spans(spans).to_pandas().sort_values(
        ["doc_id", "start"]).reset_index(drop=True)
    d1 = kept[kept["doc_id"] == 1]
    # longest-match wins at position 0 ('tablet', not 'table')
    assert list(d1["term"]) == ["tablet", "table"]
    d2 = kept[kept["doc_id"] == 2]
    assert list(d2["term"]) == ["hash", "hash", "hash"]
    # non-overlapping invariant
    for _, g in kept.groupby("doc_id"):
        g = g.sort_values("start")
        assert (g["start"].to_numpy()[1:] >= g["end"].to_numpy()[:-1]).all()


def test_keyed_sample_deterministic_and_rate():
    from biomedical_entity_linking_ray.functions.sampling import keyed_sample

    ds = rd.range(10000)
    a = keyed_sample(ds, "id", 0.2, seed=7).to_pandas()
    b = keyed_sample(rd.range(10000), "id", 0.2, seed=7).to_pandas()
    pd.testing.assert_frame_equal(
        a.sort_values("id").reset_index(drop=True),
        b.sort_values("id").reset_index(drop=True))
    assert 0.15 < len(a) / 10000 < 0.25
    c = keyed_sample(rd.range(10000), "id", 0.2, seed=8).to_pandas()
    assert set(c["id"]) != set(a["id"])  # seed changes the sample


def test_set_union_aggregate():
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    ds = rd.from_items([
        {"k": 1, "v": "b"}, {"k": 1, "v": "a"}, {"k": 1, "v": "b"},
        {"k": 2, "v": "z"},
    ])
    out = bucketed_aggregate(ds, ["k"], {"vals": ("v", "set")}).to_pandas()
    got = {r["k"]: list(r["vals"]) for _, r in out.iterrows()}
    assert got == {1: ["a", "b"], 2: ["z"]}


def test_xml_corpus_reader(tmp_path):
    import gzip

    from biomedical_entity_linking_ray.sources.readers import read_xml_corpus

    xml = (b"<articles><article id='a1'><title>T1</title>"
           b"<abstract>A1</abstract></article>"
           b"<article id='a2'><title>T2</title><abstract>A2</abstract>"
           b"</article></articles>")
    (tmp_path / "c1.xml").write_bytes(xml)
    (tmp_path / "c2.xml.gz").write_bytes(gzip.compress(
        b"<articles><article id='b1'><title>T3</title>"
        b"<abstract>A3</abstract></article></articles>"))
    df = read_xml_corpus([str(tmp_path / "c1.xml"), str(tmp_path / "c2.xml.gz")]) \
        .to_pandas().sort_values("doc_id")
    assert list(df["doc_id"]) == ["a1", "a2", "b1"]
    assert list(df["title"]) == ["T1", "T2", "T3"]


def test_obo_reader(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_obo_ontology

    (tmp_path / "o.obo").write_text(
        "format-version: 1.2\n\n"
        "[Term]\nid: X:1\nname: alpha\nsynonym: \"al\" EXACT []\n"
        "synonym: \"alp\" RELATED []\nalt_id: X:9\n\n"
        "[Term]\nid: X:2\nname: beta\nis_obsolete: true\n\n"
        "[Typedef]\nid: part_of\n")
    df = read_obo_ontology(str(tmp_path / "o.obo")).to_pandas().sort_values("term_id")
    assert list(df["term_id"]) == ["X:1", "X:2"]
    r = df.iloc[0]
    assert r["name"] == "alpha" and r["synonyms"] == "al|alp" and r["alt_ids"] == "X:9"
    assert not r["is_obsolete"] and bool(df.iloc[1]["is_obsolete"])


def test_medic_reader(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_medic_table

    (tmp_path / "medic.tsv").write_text(
        "# DiseaseName\tDiseaseID\tAltDiseaseIDs\tDefinition\n"
        "Asthma\tMESH:D001249\tOMIM:600807\tA chronic disease\n"
        "Zeta\tMESH:D001249\t\t\n"              # duplicate id: min name wins
        "Flu\tMESH:D007251\t\tViral infection\n")
    df = read_medic_table(str(tmp_path / "medic.tsv")).to_pandas().sort_values("entity_id")
    assert list(df["entity_id"]) == ["MESH:D001249", "MESH:D007251"]
    assert df.iloc[0]["name"] == "Asthma"


def test_gene_info_reader_filters(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_gene_info

    (tmp_path / "gene_info.tsv").write_text(
        "#tax_id\tGeneID\tSymbol\tSynonyms\tdescription\ttype_of_gene\n"
        "9606\t1\tA1BG\talpha\talpha-1-B glycoprotein\tprotein-coding\n"
        "9606\t2\tTRX9\t-\tsome tRNA\ttRNA\n"                      # type drop
        "9606\t3\tLOC999\t-\tuncharacterized\tprotein-coding\n"    # LOC drop
        "9606\t4\tHYP1\t-\thypothetical protein X\tprotein-coding\n"  # hyp drop
        "10090\t5\tMm1\t-\tmouse gene\tprotein-coding\n")
    df = read_gene_info(str(tmp_path / "gene_info.tsv")).to_pandas()
    assert sorted(df["symbol"]) == ["A1BG", "Mm1"]
    df_h = read_gene_info(str(tmp_path / "gene_info.tsv"), taxon=9606).to_pandas()
    assert list(df_h["symbol"]) == ["A1BG"]


def test_abbreviation_resolution_and_context():
    from biomedical_entity_linking_ray.stages.extraction import (
        attach_context_windows, extract_spans, resolve_abbreviations,
    )

    docs = rd.from_items([
        {"doc_id": 7, "text": "the fast scan uses a hash table for the scan"},
    ])
    spans = extract_spans(docs, ["scan", "hash"], concurrency=1)
    resolved = resolve_abbreviations(
        spans, {7: {"scan": "sequential scan"}}).to_pandas()
    assert set(resolved[resolved["term"] == "scan"]["term_resolved"]) == {"sequential scan"}
    assert set(resolved[resolved["term"] == "hash"]["term_resolved"]) == {"hash"}

    ctx = attach_context_windows(spans, docs, window=2).to_pandas().sort_values("start")
    first_scan = ctx.iloc[0]
    assert first_scan["ctx_left"] == "the fast"
    assert first_scan["ctx_right"] == "uses a"


def test_entity_description_builder(tmp_path):
    from biomedical_entity_linking_ray.sources.readers import read_medic_table
    from biomedical_entity_linking_ray.stages.extraction import build_entity_descriptions

    (tmp_path / "m.tsv").write_text(
        "Asthma\tMESH:D001249\t\tA chronic disease\tAsthma, Bronchial|Asthmas\n")
    ents = read_medic_table(str(tmp_path / "m.tsv"))
    df = build_entity_descriptions(ents).to_pandas()
    assert df.iloc[0]["description_text"] == \
        "Asthma (Asthma, Bronchial, Asthmas) [A chronic disease]"


def test_per_lang_f1_breakdown(small_corpus, linkage_result):
    from biomedical_entity_linking_ray.stages.evaluation import pairwise_f1_by_group

    cfg, res = linkage_result
    gp = small_corpus.gold_pairs.to_pandas()
    bd = pairwise_f1_by_group(gp, res.assignments, res.block_rows, res.members)
    assert len(bd) >= 2  # several langs present
    assert bd["n"].sum() > 0
    assert (bd["f1"] >= 0.9).all(), bd  # every lang near-perfect on planted data


def test_per_cluster_mst(linkage_result):
    from biomedical_entity_linking_ray.stages.mst import per_cluster_mst

    cfg, res = linkage_result
    forest = per_cluster_mst(res.edges, res.assignments, cfg).to_pandas()
    if len(forest) == 0:
        pytest.skip("no thresholded edges at this scale")
    sizes = res.assignments.to_pandas().groupby("cluster_id").size()
    per_cl = forest.groupby("cluster_id").size()
    # a spanning forest has at most size-1 edges per cluster, and the kept
    # edges never leave their cluster
    for cid, n_edges in per_cl.items():
        assert n_edges <= sizes[cid] - 1, (cid, n_edges, sizes[cid])
    assign = res.assignments.to_pandas().set_index("file_id")["cluster_id"]
    assert (forest["id_a"].map(assign) == forest["cluster_id"]).all()
    assert (forest["id_b"].map(assign) == forest["cluster_id"]).all()


def test_knn_ivf_self_retrieval():
    from biomedical_entity_linking_ray.pipelines.similarity import knn_bruteforce, knn_ivf

    ap = knn_ivf(SF_DIR, k=3, n_queries=8).to_pandas()
    # a query's own vector shares its cell, and its top probe IS that cell
    r1 = ap[ap["rank"] == 1]
    assert (r1["query_id"].values == r1["vec_id"].values).all()
    bf = knn_bruteforce(SF_DIR, k=3, n_queries=8).to_pandas()
    assert len(ap) <= len(bf)  # pruning never invents results


def test_doc_encoder_warm_state(tmp_path):
    from biomedical_entity_linking_ray.stages.encoding import embed_documents_pipeline

    out = str(tmp_path / "emb")
    df = embed_documents_pipeline(SF_DIR, out_dir=out).to_pandas().sort_values("doc_id")
    assert len(df) == 500
    v = np.array(df["embedding"].tolist(), dtype=np.float32)
    assert v.shape[1] == 64
    n = np.linalg.norm(v, axis=1)
    assert np.allclose(n[n > 0], 1.0, atol=1e-4)  # unit embeddings
    # determinism across a fresh pool (seeded projection = the model weights)
    df2 = embed_documents_pipeline(SF_DIR).to_pandas().sort_values("doc_id")
    v2 = np.array(df2["embedding"].tolist(), dtype=np.float32)
    assert np.allclose(v, v2, atol=1e-6)


def test_degenerate_rows_linkage():
    """Verify-skill probes as a regression test: empty contents collapse to
    ONE cluster via exact contraction; unicode and oversized rows survive;
    every input row gets exactly one assignment."""
    import pyarrow as pa

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.pipelines.linkage import run_linkage

    rows = {
        "repo": ["r/a", "r/b", "r/c", "r/u", "r/h", "r/n"],
        "path": ["x/empty1.py", "y/empty2.py", "z/empty3.py",
                 "u/unicode.py", "h/huge.py", "n/normal.py"],
        "commit": [f"{i:040x}" for i in range(6)],
        "lang": ["python"] * 6,
        "content": ["", "", "", "def f():\n    return 'é中文\U0001f600'",
                    "x = 1\n" * 200_000, "def g():\n    return 42"],
    }
    files = rd.from_arrow(pa.table(rows))
    res = run_linkage(files, LinkageConfig(join_partitions=4, scorer_concurrency=2),
                      feature_concurrency=2)
    df = res.assignments.to_pandas()
    assert len(df) == 6
    empties = df[df["path"].str.contains("empty")]
    assert empties["cluster_id"].nunique() == 1  # one cluster via contraction
    assert df["file_id"].nunique() == 6


def test_label_recall_monotone():
    from biomedical_entity_linking_ray.pipelines.similarity import label_recall_at_k

    t = label_recall_at_k(SF_DIR).to_pandas()
    assert list(t["k"]) == [1, 3, 5]
    # recall@k is monotone nondecreasing in k
    assert (np.diff(t["recall"].to_numpy()) >= -1e-12).all()
    assert ((0 <= t["recall"]) & (t["recall"] <= 1)).all()


def test_token_packing_prefix_scan():
    from biomedical_entity_linking_ray.pipelines.text_analysis import token_packing

    df = token_packing(SF_DIR, capacity=128).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert len(df) == 500
    # the packed stream is exactly the global exclusive prefix sum in id order
    prev = df["n_tokens"].cumsum().shift(fill_value=0).to_numpy()
    assert (df["bin_id"].to_numpy() == prev // 128).all()
    assert (df["bin_offset"].to_numpy() == prev % 128).all()
    # partitioning-invariant: a different range count changes only the
    # parallel decomposition, never the stream
    df2 = token_packing(SF_DIR, capacity=128, n_ranges=7).to_pandas(
    ).sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(df, df2)


def test_encoder_registry_pluggable():
    """SURVEY 2.11 extension surface: a user encoder class registered by name
    is constructed ONCE per actor and applied per batch (reference model-zoo
    slot, bioel model.py:31-206 / data_process.py:565-684)."""
    import os
    import uuid

    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from biomedical_entity_linking_ray.stages import encoding

    class CountingEncoder:
        def __init__(self, dim: int = 4):
            self.dim = dim
            self.instance = uuid.uuid4().hex  # unique per construction
            self.n_constructed = getattr(CountingEncoder, "_n", 0) + 1
            CountingEncoder._n = self.n_constructed

        def __call__(self, t: pa.Table) -> pa.Table:
            n = t.num_rows
            emb = np.full((n, self.dim), 0.5, dtype=np.float32)
            return pa.table({
                "doc_id": t["doc_id"],
                "embedding": pa.array([r.tolist() for r in emb],
                                      pa.list_(pa.float32())),
                "instance": pa.array([self.instance] * n, pa.string()),
                "pid": pa.array([os.getpid()] * n, pa.int64()),
                "n_constructed": pa.array([self.n_constructed] * n, pa.int64()),
            })

    encoding.register_encoder("counting", CountingEncoder)
    assert encoding.resolve_encoder("counting") is CountingEncoder
    docs = rd.from_items(
        [{"doc_id": i, "text": f"doc {i}"} for i in range(200)])
    out = encoding.encode_documents(
        docs, encoder="counting", encoder_kwargs={"dim": 8},
        concurrency=2, batch_size=16,
    ).to_pandas()
    assert len(out) == 200
    assert all(len(e) == 8 for e in out["embedding"])
    # one instance per worker process: every batch a given actor handled
    # reports the same instance id, and that actor constructed exactly once
    per_pid = out.groupby("pid")["instance"].nunique()
    assert (per_pid == 1).all(), per_pid
    assert (out["n_constructed"] == 1).all()

    import pytest

    with pytest.raises(KeyError):
        encoding.resolve_encoder("no_such_model")


def test_recall_matrix_multi_run():
    """Joint multi-run eval report (ref Evaluate, evaluate.py:410-588): join N
    runs' candidate lists to gold by mention_id, per-model recall@k matrix."""
    import ray.data as rd

    from biomedical_entity_linking_ray.stages.evaluation import recall_matrix

    gold = rd.from_items([
        {"mention_id": f"m{i}", "gold_id": f"C{i}"} for i in range(8)])
    # model A: perfect at k=1; model B: gold at rank 3 for half, missing else
    run_a = rd.from_items([
        {"mention_id": f"m{i}", "candidates": [f"C{i}", "Cx", "Cy"]}
        for i in range(8)])
    run_b = rd.from_items(
        [{"mention_id": f"m{i}", "candidates": ["Cx", "Cy", f"C{i}"]}
         for i in range(4)]
        + [{"mention_id": f"m{i}", "candidates": ["Cx"]} for i in range(4, 8)]
        + [{"mention_id": "zz_not_in_gold", "candidates": ["C0"]}])  # dropped

    out = recall_matrix(gold, {"A": run_a, "B": run_b}, ks=(1, 3)).to_pandas()
    out = out.set_index(["model", "k"])["recall"]
    assert out[("A", 1)] == 1.0 and out[("A", 3)] == 1.0
    assert out[("B", 1)] == 0.0 and out[("B", 3)] == 0.5


def test_bloom_semi_join_exact_even_when_saturated():
    """A deliberately undersized filter (256 bits for ~143 keys x 3 hashes)
    saturates and passes nearly every probe row -- the exact-verify stage
    must still produce exactly the semi join. Also checks the prune-only
    superset contract and string-key hashing."""
    from biomedical_entity_linking_ray.functions.joins import bloom_semi_join

    probe = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 0.5}))
    flt = rd.from_pandas(pd.DataFrame(
        {"fk": np.array(list(range(0, 1000, 7)) * 3, dtype=np.int64)}))
    expected = list(range(0, 1000, 7))

    out = bloom_semi_join(probe, flt, "k", "fk",
                          n_bits=256, n_hashes=3, num_partitions=4).to_pandas()
    assert sorted(out["k"]) == expected
    assert list(out.columns) == ["k", "v"]

    # prune-only path: a superset that a roomy filter keeps tight
    sup = bloom_semi_join(probe, flt, "k", "fk", n_bits=1 << 16,
                          n_hashes=4, exact=False).to_pandas()
    assert set(expected) <= set(sup["k"])
    assert len(sup) <= len(expected) + 25

    # string keys hash through the FNV path
    probe_s = rd.from_pandas(pd.DataFrame({"k": [f"id{i}" for i in range(200)]}))
    flt_s = rd.from_pandas(pd.DataFrame({"k": [f"id{i}" for i in range(0, 200, 5)]}))
    out_s = bloom_semi_join(probe_s, flt_s, "k", "k",
                            n_bits=1 << 14, num_partitions=4).to_pandas()
    assert sorted(out_s["k"]) == sorted(f"id{i}" for i in range(0, 200, 5))


def test_blocker_registry_extends_block_keys():
    """SURVEY 2.11 blocker slot: a registered blocker's keys join the
    built-in minhash/path keys; extras are trimmed to (block_key, file_id);
    direct callables pass through; unknown names fail fast driver-side."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from biomedical_entity_linking_ray.config import LinkageConfig
    from biomedical_entity_linking_ray.stages import blocking

    def first_char(batch: pa.Table, cfg) -> pa.Table:
        keys = pc.binary_join_element_wise(
            pa.array(["x"] * batch.num_rows, pa.string()),
            pc.utf8_slice_codeunits(batch["stem"], 0, 1), ":")
        return pa.table({
            "block_key": keys,
            "file_id": batch["file_id"],
            "extra_payload": batch["stem"],  # must be trimmed away
        })

    blocking.register_blocker("first_char", first_char)
    assert blocking.resolve_blocker("first_char") is first_char
    assert blocking.resolve_blocker(first_char) is first_char
    with pytest.raises(ValueError, match="unknown blocker"):
        blocking.resolve_blocker("no_such_blocker")

    reps = rd.from_arrow(pa.table({
        "file_id": pa.array(["a", "b", "c"], pa.string()),
        "lang": pa.array(["py"] * 3, pa.string()),
        "stem": pa.array(["foo", "fob", "bar"], pa.string()),
    }))

    # extras only (built-ins off): exactly the custom keys, trimmed schema
    cfg = LinkageConfig(use_minhash_keys=False, use_path_key=False,
                        extra_blockers=("first_char",))
    out = blocking.emit_block_keys(reps, cfg).to_pandas()
    assert set(out.columns) == {"block_key", "file_id"}
    assert set(zip(out["block_key"], out["file_id"])) == {
        ("x:f", "a"), ("x:f", "b"), ("x:b", "c")}

    # alongside the path key, by direct callable
    cfg2 = LinkageConfig(use_minhash_keys=False, use_path_key=True,
                         extra_blockers=(first_char,))
    out2 = blocking.emit_block_keys(reps, cfg2).to_pandas()
    got = set(zip(out2["block_key"], out2["file_id"]))
    assert ("p:py:foo", "a") in got and ("x:b", "c") in got
    assert len(out2) == 6


def test_canonical_policy_relabel():
    """G5 canonical-policy slot: max_tokens re-picks each cluster's canonical
    (min-file_id tie-break), min_id works featureless, custom registrations
    resolve, unknown names fail fast."""
    from biomedical_entity_linking_ray.stages.clustering import (
        register_canonical_policy,
        relabel_canonical,
        resolve_canonical_policy,
    )

    assignments = rd.from_items([
        {"file_id": "a1", "cluster_id": "c1"},
        {"file_id": "a2", "cluster_id": "c1"},
        {"file_id": "a3", "cluster_id": "c1"},
        {"file_id": "b1", "cluster_id": "c2"},
        {"file_id": "b2", "cluster_id": "c2"},
        {"file_id": "s1", "cluster_id": "s1"},
    ])
    feats = rd.from_items([
        {"file_id": "a1", "n_tokens": 5},
        {"file_id": "a2", "n_tokens": 9},
        {"file_id": "a3", "n_tokens": 9},   # tie -> min file_id a2
        {"file_id": "b1", "n_tokens": 1},
        {"file_id": "b2", "n_tokens": 1},   # tie -> b1
        {"file_id": "s1", "n_tokens": 0},
    ])

    out = relabel_canonical(assignments, feats, policy="max_tokens",
                            n_buckets=4, num_partitions=2).to_pandas()
    canon = out.drop_duplicates("cluster_id").set_index("cluster_id")["canonical_id"]
    assert canon["c1"] == "a2" and canon["c2"] == "b1" and canon["s1"] == "s1"
    # every member row survives with its cluster intact
    assert sorted(out["file_id"]) == ["a1", "a2", "a3", "b1", "b2", "s1"]
    assert out.groupby("cluster_id")["canonical_id"].nunique().max() == 1

    # featureless min_id policy (no join path)
    out2 = relabel_canonical(assignments, policy="min_id",
                             feature_cols=(), n_buckets=4).to_pandas()
    canon2 = out2.drop_duplicates("cluster_id").set_index("cluster_id")["canonical_id"]
    assert canon2["c1"] == "a1" and canon2["c2"] == "b1"

    # custom policy by name
    register_canonical_policy(
        "max_id", lambda m: m.groupby("cluster_id", as_index=False)
        .agg(canonical_id=("file_id", "max")))
    out3 = relabel_canonical(assignments, policy="max_id",
                             feature_cols=(), n_buckets=4).to_pandas()
    canon3 = out3.drop_duplicates("cluster_id").set_index("cluster_id")["canonical_id"]
    assert canon3["c1"] == "a3" and canon3["c2"] == "b2"

    with pytest.raises(ValueError, match="unknown canonical policy"):
        resolve_canonical_policy("no_such_policy")


def test_chunk_documents_reconstructs_token_stream():
    """Sliding-window chunking (chunk=32, overlap=8, stride 24): chunk j
    starts at 24j, overlapping tokens dedup away on reconstruction, tail
    chunks are short, empty docs emit nothing."""
    import re

    from biomedical_entity_linking_ray.pipelines.text_analysis import chunk_documents

    df = chunk_documents(SF_DIR).to_pandas()
    assert (df["chunk_start"] == df["chunk_idx"] * 24).all()
    assert df["n_tokens"].between(1, 32).all()
    assert (df["chunk_text"].str.split().str.len() == df["n_tokens"]).all()

    # exact reconstruction: chunk0 ++ chunk_j[8:] == the doc's token stream
    word = re.compile(r"[A-Za-z0-9_]+")
    import pyarrow.parquet as pq
    docs = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    texts = docs.set_index("doc_id")["text"]
    for doc_id, g in df.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        toks: list = []
        for j, t in enumerate(g["chunk_text"]):
            w = t.split()
            toks.extend(w if j == 0 else w[8:])
        assert toks == word.findall(texts[doc_id]), doc_id
    # every non-empty doc is covered
    n_expected = (texts.str.count(r"[A-Za-z0-9_]+") > 0).sum()
    assert df["doc_id"].nunique() == n_expected


def test_pattern_scrubber_cascade():
    """Sequential redaction: each pattern counts/replaces over the previous
    pattern's output; defaults hit emails + long digit runs; markers never
    re-match later patterns."""
    import pyarrow as pa

    from biomedical_entity_linking_ray.pipelines.text_analysis import PatternScrubber

    t = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "mail bob@example.com and alice@test.org card 1234567890",
            "no pii here",
            "xx 999999 yy 123 zz",   # 123 too short for the number pattern
        ], pa.string()),
    })
    out = PatternScrubber()(t).to_pandas()
    assert list(out["n_email"]) == [2, 0, 0]
    assert list(out["n_number"]) == [1, 0, 1]
    assert out["clean_text"][0] == "mail [EMAIL] and [EMAIL] card [NUMBER]"
    assert out["clean_text"][2] == "xx [NUMBER] yy 123 zz"

    # cascade order: second pattern runs over the first one's output
    s = PatternScrubber(patterns=(("a", r"foo+"), ("b", r"fo")))
    out2 = s(pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["foooo fo foo"], pa.string())})).to_pandas()
    assert out2["n_a"][0] == 2 and out2["n_b"][0] == 1
    assert out2["clean_text"][0] == "[A] [B] [A]"


def test_bloom_anti_join_exact_and_shortcut():
    """Bloom anti join: exact result even with a saturated undersized filter
    (everything routed through the verify branch), and with a roomy filter
    (most rows take the map-side novel shortcut); string keys; column set
    preserved."""
    from biomedical_entity_linking_ray.functions.joins import bloom_anti_join

    probe = rd.from_pandas(pd.DataFrame(
        {"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 0.5}))
    flt = rd.from_pandas(pd.DataFrame(
        {"fk": np.array(list(range(0, 1000, 7)) * 2, dtype=np.int64)}))
    expected = [i for i in range(1000) if i % 7 != 0]

    for bits in (256, 1 << 16):   # saturated and roomy
        out = bloom_anti_join(probe, flt, "k", "fk",
                              n_bits=bits, n_hashes=3,
                              num_partitions=4).to_pandas()
        assert sorted(out["k"]) == expected, bits
        assert set(out.columns) == {"k", "v"}

    # string keys; empty filter side -> everything is novel
    probe_s = rd.from_pandas(pd.DataFrame({"k": [f"id{i}" for i in range(50)]}))
    flt_s = rd.from_pandas(pd.DataFrame({"k": ["id1", "id2"]}))
    out_s = bloom_anti_join(probe_s, flt_s, "k", "k",
                            n_bits=1 << 12, num_partitions=2).to_pandas()
    assert sorted(out_s["k"]) == sorted(
        f"id{i}" for i in range(50) if i not in (1, 2))


def test_decontaminate_documents_planted(tmp_path):
    """Test-set decontamination on a handcrafted corpus: bench = doc_id %
    7 == 0; a train doc is dropped iff it shares a word 4-gram with bench.
    Covers: interior-overlap hit, exact-copy hit, no-overlap keep,
    under-4-token keep, and 3-gram-only-overlap keep (boundary)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from biomedical_entity_linking_ray.pipelines.dedup import decontaminate_documents

    texts = {
        0: "alpha beta gamma delta epsilon",      # bench
        1: "xx beta gamma delta epsilon yy",      # hit: interior 4-gram
        2: "zeta eta theta iota kappa",           # clean: no shared gram
        3: "one two three",                       # clean: < 4 tokens
        4: "alpha beta gamma delta epsilon",      # hit: exact copy of bench
        5: "beta gamma delta QQQ xx",             # clean: only a 3-gram shared
        6: "mu nu xi omicron pi",                 # clean
        7: "rho sigma tau upsilon phi",           # bench
        8: "chi rho sigma tau upsilon psi",       # hit: 4-gram from doc 7
    }
    tbl = pa.table({
        "doc_id": pa.array(sorted(texts), pa.int64()),
        "text": pa.array([texts[k] for k in sorted(texts)], pa.string()),
        "lang": pa.array(["en"] * len(texts), pa.string()),
        "n_chars": pa.array([len(texts[k]) for k in sorted(texts)], pa.int64()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = decontaminate_documents(str(tmp_path)).to_pandas()
    assert sorted(out["doc_id"]) == [2, 3, 5, 6]
    assert set(out.columns) == {"doc_id", "lang", "n_chars"}


def test_repetition_scores_planted(tmp_path):
    """Repetition quality signals on handcrafted docs: all-same-token,
    all-distinct, single-token (bigram frac 0), and zero-token docs (no
    row emitted)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from biomedical_entity_linking_ray.pipelines.text_analysis import repetition_scores

    docs = [
        (0, "a a a a"),     # dup 0.75, top_token 1.0, top_bigram 1.0
        (1, "a b c d"),     # dup 0.0, top_token 0.25, top_bigram 1/3
        (2, "solo"),        # n=1: bigram frac 0.0
        (3, ""),            # zero tokens: no row
        (4, "!!! ???"),     # zero word tokens: no row
        (5, "x y x y x"),   # dup 0.6, top_token 3/5, bigrams: x y (2), y x (2) -> 0.5
    ]
    tbl = pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs], pa.string()),
    })
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    out = repetition_scores(str(tmp_path)).to_pandas().set_index("doc_id")
    assert sorted(out.index) == [0, 1, 2, 5]
    assert out.loc[0, "dup_token_frac"] == pytest.approx(0.75)
    assert out.loc[0, "top_token_frac"] == pytest.approx(1.0)
    assert out.loc[0, "top_bigram_frac"] == pytest.approx(1.0)
    assert out.loc[1, "dup_token_frac"] == pytest.approx(0.0)
    assert out.loc[1, "top_token_frac"] == pytest.approx(0.25)
    assert out.loc[1, "top_bigram_frac"] == pytest.approx(1 / 3)
    assert out.loc[2, "n_tokens"] == 1
    assert out.loc[2, "top_bigram_frac"] == 0.0
    assert out.loc[5, "dup_token_frac"] == pytest.approx(0.6)
    assert out.loc[5, "top_token_frac"] == pytest.approx(0.6)
    assert out.loc[5, "top_bigram_frac"] == pytest.approx(0.5)


def test_paragraph_dedup_delimiter_mode(tmp_path):
    """Planted newline corpus: the shared boilerplate line survives only in
    its globally-first position (doc 1, line 0); intra-doc repeats drop too;
    the broadcast and hash-join delivery paths agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.dedup import paragraph_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "license header\nalpha body one\nalpha body one",   # intra-dup
            "license header\nbeta body two",                    # cross-dup
            "gamma solo",
        ]),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    out = paragraph_dedup(str(d), window=None, delim="\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert out["text_clean"].tolist() == [
        "license header\nalpha body one", "beta body two", "gamma solo"]
    assert out["n_parts"].tolist() == [3, 2, 1]
    assert out["n_kept"].tolist() == [2, 1, 1]

    via_join = paragraph_dedup(str(d), window=None, delim="\n",
                               broadcast_max=0) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, via_join[out.columns.tolist()],
                                  check_dtype=False)


def test_paragraph_dedup_window_roundtrip():
    """A corpus with no duplicated window reassembles to the original text
    (kept == parts, text_clean == text)."""
    from biomedical_entity_linking_ray.pipelines.dedup import paragraph_dedup

    out = paragraph_dedup(SF_DIR, window=1_000_000).to_pandas()
    import pyarrow.parquet as pq

    orig = pq.read_table(f"{SF_DIR}/documents.parquet",
                         columns=["doc_id", "text"]).to_pandas()
    m = out.merge(orig, on="doc_id")
    # window >= doc length -> one part per doc == whole-document exact dedup;
    # only true full-text duplicates lose their text
    dup_mask = m["n_kept"] == 0
    assert (m.loc[~dup_mask, "text_clean"] == m.loc[~dup_mask, "text"]).all()
    assert (m["n_parts"] == 1).all()


def test_substring_dedup_planted(tmp_path):
    """A 10-word span copied verbatim into doc 2 is scrubbed there and only
    there; a doc with no >=n-word repeat is untouched; broadcast and
    hash-join delivery paths agree."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.dedup import substring_dedup

    span = "q w e r t y u i o p"                     # 10 words
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            f"aa bb {span} cc dd",
            f"xx yy {span} zz",
            "one two three four five six seven eight nine",
        ]),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    out = substring_dedup(str(d), n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out.loc[0, "text_clean"] == f"aa bb {span} cc dd"   # first wins
    assert out.loc[0, "n_removed"] == 0
    assert out.loc[1, "text_clean"] == "xx yy zz"
    assert out.loc[1, "n_removed"] == 10
    assert out.loc[2, "n_removed"] == 0

    via_join = substring_dedup(str(d), n=8, broadcast_max=0).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(out, via_join[out.columns.tolist()],
                                  check_dtype=False)


def test_minhash_dedup_keep_one_per_cluster():
    """Fuzzy-dedup assignments: canonical ids are closed under the pair
    graph (both endpoints of every near-dup pair share a canonical), every
    canonical is the min of its cluster, and exact duplicates (subset of
    near-dups at jaccard 1.0) collapse at least as far as exact_dedup."""
    from biomedical_entity_linking_ray.pipelines.dedup import (
        exact_dedup, minhash_dedup_assignments, minhash_near_dup_pairs,
    )

    assign = minhash_dedup_assignments(SF_DIR).to_pandas()
    canon_of = dict(zip(assign.doc_id, assign.canonical_id))
    pairs = minhash_near_dup_pairs(SF_DIR).to_pandas()
    for a, b in zip(pairs.id_a, pairs.id_b):
        assert canon_of[a] == canon_of[b]
    grp = assign.groupby("canonical_id")["doc_id"].min()
    assert (grp.index == grp.values).all()
    ex = exact_dedup(SF_DIR).to_pandas()
    ex_canon = dict(zip(ex.doc_id, ex.canonical_id))
    for d, c in ex_canon.items():
        assert canon_of[d] == canon_of[c]


def test_substring_dedup_spill_dir(tmp_path):
    """The Parquet spill path for the occurrence table returns the same
    result as the object-store default."""
    from biomedical_entity_linking_ray.pipelines.dedup import substring_dedup

    a = substring_dedup(SF_DIR, n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    b = substring_dedup(SF_DIR, n=8, spill_dir=str(tmp_path / "occ")) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()], check_dtype=False)


def test_subdoc_dedup_degenerate_inputs(tmp_path):
    """Empty documents and intra-document repeated spans through the full
    pipelines: an empty text is one empty part (kept at its first global
    occurrence, dropped elsewhere); a >=n-word span repeated INSIDE one doc
    is scrubbed at its second occurrence only."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.dedup import (
        paragraph_dedup, substring_dedup,
    )

    span = "a b c d e f g h"                       # exactly n=8 words
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "",                                    # empty doc (first '' part)
            f"{span} mid {span}",                  # intra-doc repeated span
            "",                                    # duplicate empty doc
            "solo words only here",
        ]),
    })
    d = tmp_path / "corpus"
    d.mkdir()
    pq.write_table(docs, d / "documents.parquet")

    pd_out = paragraph_dedup(str(d), window=None, delim="\n") \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert pd_out["n_parts"].tolist() == [1, 1, 1, 1]
    # doc 1 keeps its empty part; doc 3's identical empty part is dropped
    assert pd_out.loc[0, "n_kept"] == 1 and pd_out.loc[0, "text_clean"] == ""
    assert pd_out.loc[2, "n_kept"] == 0 and pd_out.loc[2, "text_clean"] == ""
    assert pd_out.loc[1, "n_kept"] == 1 and pd_out.loc[3, "n_kept"] == 1

    sd = substring_dedup(str(d), n=8).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    # doc 2: 17 words; the second span occurrence (positions 9..16) is
    # covered, the first occurrence and the separator word survive
    assert sd.loc[1, "n_words"] == 17
    assert sd.loc[1, "n_removed"] == 8
    assert sd.loc[1, "text_clean"] == f"{span} mid"
    assert sd.loc[0, "n_removed"] == 0 and sd.loc[3, "n_removed"] == 0


def test_default_buckets_tracks_cluster():
    """VERDICT r3 #2: group-stage fan-out must scale with the cluster, not
    sit at a literal 64 -- per-bucket memory stays flat as cluster+data grow."""
    import ray

    from biomedical_entity_linking_ray.config import default_buckets

    cpus = int(ray.cluster_resources()["CPU"])
    assert default_buckets() == max(64, cpus * 4)
    assert default_buckets(floor=1, per_cpu=32) == max(1, cpus * 32)
    # explicit values still win (pipelines pass user overrides through)
    assert default_buckets(floor=10_000) == 10_000


def test_levenshtein_batch_matches_reference():
    from biomedical_entity_linking_ray.functions.strings import levenshtein_batch

    def ref(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                cur = dp[j]
                dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
                prev = cur
        return dp[-1]

    words = ["", "a", "ab", "kitten", "sitting", "über", "ünter",
             "small ring", "small rung", "x" * 40, "y" * 3]
    pairs = [(a, b) for a in words for b in words]
    got = levenshtein_batch([p[0] for p in pairs], [p[1] for p in pairs])
    assert got.tolist() == [ref(a, b) for a, b in pairs]


def test_fuzzy_name_join_blocked_exact(tmp_path):
    """Blocked Levenshtein join: same-brand pairs within the bound only,
    id_a < id_b, distances exact."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.similarity import fuzzy_name_join

    t = pa.table({
        "p_partkey": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "p_name": ["red bolt", "red bolts", "red bolt", "blue bolt", "green gear"],
        "p_brand": ["B1", "B1", "B2", "B1", "B1"],
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "part.parquet"))
    df = fuzzy_name_join(str(d), max_dist=2, all_pairs_max=64) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    # brand B1 block: (1,2) dist 1; (1,4) dist 2 ("red"->"blue" = 2 edits? r->b,
    # e->l,d->u e... actual levenshtein("red bolt","blue bolt")=3 -> dropped);
    # (2,4) >2 dropped; (2,5),(1,5),(4,5) far. Cross-brand (1,3) NEVER paired.
    assert df[["id_a", "id_b"]].values.tolist() == [[1, 2]]
    assert df["dist"].tolist() == [1]


def test_heavy_hitter_ngrams_exact_under_collisions(tmp_path):
    """CMS prune stays value-exact even when a tiny sketch forces heavy
    collisions: survivors are a superset (no underestimates), the exact
    verify pass discharges every false positive."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.text_analysis import (
        heavy_hitter_ngrams,
    )

    # 40 docs: 'hot x y' appears in 10 docs (heavy at T=4); 30 docs each
    # carry a unique cold 3-gram
    texts = ["hot x y"] * 10 + [f"cold {i} tail" for i in range(30)]
    t = pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "documents.parquet"))

    for width in (8, 1 << 14):  # width=8: every bucket collides
        df = heavy_hitter_ngrams(str(d), n=3, threshold=4,
                                 depth=2, width=width).to_pandas()
        assert df["gram"].tolist() == ["hot x y"]
        assert df["n"].tolist() == [10]


def test_knn_self_join_every_vector_ranked(tmp_path):
    """Self-join: every vector gets exactly k ranked neighbors, never
    itself, ranks deterministic under the (cosine desc, vec_id asc) order."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.similarity import knn_self_join

    rng = np.random.default_rng(7)
    n, dim = 40, 8
    t = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array([rng.normal(size=dim).tolist() for _ in range(n)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * n, pa.int32()),
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "embeddings.parquet"))
    df = knn_self_join(str(d), k=4).to_pandas()
    assert len(df) == n * 4
    assert (df["query_id"] != df["vec_id"]).all()
    g = df.sort_values(["query_id", "rank"]).groupby("query_id")
    assert all(r == [1, 2, 3, 4] for r in g["rank"].apply(list))
    # symmetry spot-check vs numpy
    M = np.array([t["embedding"][i].as_py() for i in range(n)], np.float64)
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    sims = np.round(M @ M.T, 4)
    np.fill_diagonal(sims, -2)
    top1 = df[df["rank"] == 1].sort_values("query_id")["vec_id"].to_numpy()
    expected_top1 = np.lexsort((np.arange(n)[None, :].repeat(n, 0),
                                -sims))[np.arange(n), 0]
    assert (top1 == expected_top1).all()


def test_customer_order_counts_preserves_orderless(tmp_path):
    """LEFT OUTER join keeps customers with no qualifying orders, zeros
    filled map-side."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.relational import (
        customer_order_counts,
    )

    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.table({"c_custkey": pa.array([1, 2, 3], pa.int64())}),
                   str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_custkey": pa.array([1, 1, 3], pa.int64()),
        "o_totalprice": pa.array([500000.0, 400000.0, 100.0]),
    }), str(d / "orders.parquet"))
    df = customer_order_counts(str(d)).to_pandas() \
        .sort_values("c_custkey").reset_index(drop=True)
    assert df["n_orders"].tolist() == [2, 0, 0]  # cust 3's order under floor
    assert df["total_spent"].tolist() == [900000.0, 0.0, 0.0]


def test_sorted_neighborhood_cross_band_pairs(tmp_path):
    """Band width smaller than the table: window pairs crossing band
    boundaries must come from the ghost replication, exactly once each."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.similarity import (
        sorted_neighborhood_pairs,
    )

    n, w, band = 200, 3, 16
    rng = np.random.default_rng(3)
    names = [f"name{rng.integers(0, 50):03d}" for _ in range(n)]
    t = pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": pa.array(names, pa.string()),
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "part.parquet"))
    df = sorted_neighborhood_pairs(str(d), window=w, band=band, n_ranges=4) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)

    # brute-force reference: global (name, id) order, all pairs within w
    order = sorted(range(n), key=lambda i: (names[i], i))
    exp = []
    for i in range(n):
        for j in range(i + 1, min(i + w + 1, n)):
            exp.append((order[i], order[j], j - i))
    exp = pd.DataFrame(exp, columns=["id_a", "id_b", "gap"]) \
        .sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert len(df) == len(exp)
    pd.testing.assert_frame_equal(df[["id_a", "id_b", "gap"]], exp)
    # every pair exactly once (no ghost duplicates)
    assert not df.duplicated(["id_a", "id_b"]).any()


def test_new_operator_degenerate_inputs(tmp_path):
    """Empty and single-row inputs: every late-round-4 operator returns an
    empty/self result with the right schema, no crash."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.dedup import snm_dedup_assignments
    from biomedical_entity_linking_ray.pipelines.relational import (
        customer_order_counts,
        order_rollup,
        topk_orders_per_customer,
    )
    from biomedical_entity_linking_ray.pipelines.similarity import (
        fuzzy_name_join,
        sorted_neighborhood_pairs,
    )
    from biomedical_entity_linking_ray.pipelines.text_analysis import (
        heavy_hitter_ngrams,
    )

    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(pa.table({
        "p_partkey": pa.array([], pa.int64()),
        "p_name": pa.array([], pa.string()),
        "p_brand": pa.array([], pa.string()),
    }), str(d / "part.parquet"))
    pq.write_table(pa.table({
        "doc_id": pa.array([7], pa.int64()),
        "text": pa.array(["only two"], pa.string()),  # < n words: no grams
    }), str(d / "documents.parquet"))
    pq.write_table(pa.table({
        "c_custkey": pa.array([1], pa.int64()),
    }), str(d / "customer.parquet"))
    pq.write_table(pa.table({
        "o_orderkey": pa.array([], pa.int64()),
        "o_custkey": pa.array([], pa.int64()),
        "o_orderstatus": pa.array([], pa.string()),
        "o_orderpriority": pa.array([], pa.string()),
        "o_totalprice": pa.array([], pa.float64()),
    }), str(d / "orders.parquet"))

    assert fuzzy_name_join(str(d)).count() == 0
    assert sorted_neighborhood_pairs(str(d)).count() == 0
    snm = snm_dedup_assignments(str(d)).to_pandas()
    assert len(snm) == 0
    assert heavy_hitter_ngrams(str(d)).count() == 0
    coc = customer_order_counts(str(d)).to_pandas()
    assert coc["n_orders"].tolist() == [0]
    ro = order_rollup(str(d)).to_pandas()  # grand-total row only, zeros
    assert len(ro) == 1 and ro["n_orders"].tolist() == [0]
    assert topk_orders_per_customer(str(d)).count() == 0


def test_sorted_neighborhood_spill_dir(tmp_path):
    """spill_dir Parquet path: identical pairs to the in-memory run."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from biomedical_entity_linking_ray.pipelines.similarity import (
        sorted_neighborhood_pairs,
    )

    n = 60
    rng = np.random.default_rng(5)
    t = pa.table({
        "p_partkey": pa.array(range(n), pa.int64()),
        "p_name": pa.array([f"n{rng.integers(0, 20):02d}" for _ in range(n)],
                           pa.string()),
    })
    d = tmp_path / "sf"
    os.makedirs(d)
    pq.write_table(t, str(d / "part.parquet"))
    mem = sorted_neighborhood_pairs(str(d), window=4, band=16, n_ranges=4) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    sp = sorted_neighborhood_pairs(str(d), window=4, band=16, n_ranges=4,
                                   spill_dir=str(tmp_path / "spill")) \
        .to_pandas().sort_values(["id_a", "id_b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(mem, sp)
    assert (tmp_path / "spill" / "keys").exists()
