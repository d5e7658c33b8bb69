"""Source readers, re-expressing the reference's loader family (SURVEY.md 2.1).

Every reader returns a ``ray.data.Dataset`` and prunes at the read where the
format allows (columns=, parquet filters). Reference analogs noted per
function; biomedical formats are translated to their target-domain shapes.
"""

from __future__ import annotations

import os
import re

import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def read_files_table(
    paths: str | list[str],
    columns: list[str] | None = None,
    lang: str | None = None,
) -> "ray.data.Dataset":
    """Primary input: Parquet files table (repo, path, commit, lang, content).

    Reference analog: S1 BigBio loader (bigbio_utils.py:14-37). Column and
    row-group pruning pushed into the scan.
    """
    flt = (pc.field("lang") == lang) if lang else None
    return ray.data.read_parquet(paths, columns=columns, filter=flt)


def read_alias_dictionary(paths: str | list[str]) -> "ray.data.Dataset":
    """``id1|id2||alias`` text lines -> (alias, ids) rows, alias-deduplicated.

    Reference analog: S10 DictionaryDataset.load_data
    (bioel/bioel/models/sapbert/data/utils.py:59-98): lines are
    ``CUI||name``, names lowercased, duplicate names collapsed. The reference
    keeps the first id set in FILE order; under unordered parallel shuffle
    "first" is nondeterministic, so the winner here is the lexicographically
    smallest id set (deterministic at any parallelism -- the repo-wide
    determinism rule outranks byte-for-byte parity on this tie-break).
    """

    def parse(t: pa.Table) -> pa.Table:
        aliases, ids = [], []
        for line in t["text"].to_pylist():
            line = line.strip()
            if not line or "||" not in line:
                continue
            id_part, alias = line.split("||", 1)
            aliases.append(alias.strip().lower())
            ids.append(id_part.strip())
        return pa.table({
            "alias": pa.array(aliases, pa.string()),
            "ids": pa.array(ids, pa.string()),
        })

    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    rows = ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")
    return bucketed_aggregate(rows, ["alias"], {"ids": ("ids", "min")})


_BLOCK_HEADER = re.compile(r"^(?P<id>[^|]+)\|(?P<kind>[ta])\|(?P<text>.*)$")


def read_record_blocks(paths: str | list[str]) -> "ray.data.Dataset":
    """Blank-line-separated record blocks -> (doc_id, title, body, n_annotations).

    Reference analog: S2 PubTator gz parser (krissbert/usage/utils.py:143-178):
    blocks of ``id|t|title`` / ``id|a|abstract`` / tab-separated annotation
    lines. Whole files are read (block boundaries must not straddle tasks)
    and each file is exploded to one row per block with a stateless flat map.
    """

    def parse_file(row: dict) -> list[dict]:
        text = row["bytes"].decode("utf-8", "replace")
        out = []
        for block in text.split("\n\n"):
            block = block.strip()
            if not block:
                continue
            doc_id, title, body, n_ann = None, "", "", 0
            for line in block.splitlines():
                m = _BLOCK_HEADER.match(line)
                if m:
                    doc_id = m.group("id")
                    if m.group("kind") == "t":
                        title = m.group("text")
                    else:
                        body = m.group("text")
                elif "\t" in line:
                    n_ann += 1
            if doc_id is not None:
                out.append({"doc_id": doc_id, "title": title, "body": body,
                            "n_annotations": n_ann})
        return out

    return ray.data.read_binary_files(paths).flat_map(parse_file)


def read_xml_corpus(paths: str | list[str]) -> "ray.data.Dataset":
    """``*.xml[.gz]`` corpus scan -> (doc_id, title, abstract) rows.

    Reference analog: S3 PubMed XML.gz iteration
    (extract_pubmed_entities/extract_pubmed_entities.py:130-181): one task per
    file (file-level parallelism, exactly the reference's per-file loop made
    distributed), gzip + XML decode inside the task, one row per article
    element. Stdlib ElementTree only -- no lxml in this container.
    """
    import gzip
    import xml.etree.ElementTree as ET

    def parse_file(row: dict) -> list[dict]:
        data = row["bytes"]
        if data[:2] == b"\x1f\x8b":
            data = gzip.decompress(data)
        out = []
        root = ET.fromstring(data)
        # accept either <articles><article id=..><title/><abstract/>.. or
        # any nesting where article-like elements carry the three fields
        for art in root.iter("article"):
            doc_id = art.get("id") or (art.findtext("id") or "")
            out.append({
                "doc_id": doc_id,
                "title": art.findtext("title") or "",
                "abstract": art.findtext("abstract") or "",
            })
        return out

    return ray.data.read_binary_files(paths).flat_map(parse_file)


def read_obo_ontology(paths: str | list[str]) -> "ray.data.Dataset":
    """OBO ontology file -> one row per [Term]: (term_id, name, synonyms,
    alt_ids, is_obsolete).

    Reference analog: S5 BiomedicalOntology.load_obo (ontology.py:82-167):
    obonet graph walk collecting name/synonyms/alt ids and skipping obsolete
    terms -- here a stateless per-file parse (whole file read so stanza
    boundaries never straddle tasks), synonyms/alt_ids as '|'-joined strings
    so the row stays flat-schema'd.
    """
    _SYN = re.compile(r'^synonym:\s*"([^"]*)"')

    def parse_file(row: dict) -> list[dict]:
        text = row["bytes"].decode("utf-8", "replace")
        out = []
        for stanza in text.split("\n["):
            lines = stanza.splitlines()
            if not lines or lines[0].strip("[]") != "Term":
                continue
            term_id, name, obsolete = "", "", False
            syns: list[str] = []
            alts: list[str] = []
            for line in lines[1:]:
                if line.startswith("id:"):
                    term_id = line[3:].strip()
                elif line.startswith("name:"):
                    name = line[5:].strip()
                elif line.startswith("synonym:"):
                    m = _SYN.match(line)
                    if m:
                        syns.append(m.group(1))
                elif line.startswith("alt_id:"):
                    alts.append(line[7:].strip())
                elif line.startswith("is_obsolete:") and "true" in line:
                    obsolete = True
            if term_id:
                out.append({
                    "term_id": term_id, "name": name,
                    "synonyms": "|".join(syns), "alt_ids": "|".join(alts),
                    "is_obsolete": obsolete,
                })
        return out

    return ray.data.read_binary_files(paths).flat_map(parse_file)


def read_medic_table(paths: str | list[str]) -> "ray.data.Dataset":
    """MEDIC-shaped TSV (CTD disease vocabulary) -> entity rows.

    Reference analog: S6 load_medic (ontology.py:169-233): '#'-prefixed
    header comments, columns DiseaseName / DiseaseID / AltDiseaseIDs /
    Definition / Synonyms ('|'-separated). Emits one flat row per entity
    (synonyms/alt ids stay '|'-joined); duplicate-id rows are dropped
    deterministically (min name wins -- reference D3 duplicate-CUI skip,
    ontology.py:224-230, made parallel-safe).
    """
    from biomedical_entity_linking_ray.functions.groups import bucketed_aggregate

    def parse(t: pa.Table) -> pa.Table:
        names, ids, alts, defs, syns = [], [], [], [], []
        for line in t["text"].to_pylist():
            if not line or line.startswith("#"):
                continue
            f = line.split("\t")
            if len(f) < 2:
                continue
            names.append(f[0])
            ids.append(f[1])
            alts.append(f[2] if len(f) > 2 else "")
            defs.append(f[3] if len(f) > 3 else "")
            syns.append(f[7] if len(f) > 7 else (f[4] if len(f) > 4 else ""))
        return pa.table({
            "entity_id": pa.array(ids, pa.string()),
            "name": pa.array(names, pa.string()),
            "alt_ids": pa.array(alts, pa.string()),
            "definition": pa.array(defs, pa.string()),
            "synonyms": pa.array(syns, pa.string()),
        })

    rows = ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")
    return bucketed_aggregate(rows, ["entity_id"], {
        "name": ("name", "min"), "alt_ids": ("alt_ids", "min"),
        "definition": ("definition", "min"), "synonyms": ("synonyms", "min"),
    })


_GENE_TYPE_DROP = {"unknown", "tRNA", "rRNA", "snRNA", "snoRNA", "miscRNA"}


def read_gene_info(
    paths: str | list[str], taxon: int | None = None,
) -> "ray.data.Dataset":
    """Entrez gene_info-shaped TSV -> gene rows with the reference's row
    filters applied.

    Reference analog: S7 load_entrez (ontology.py:236-324) + M12 filters
    (ontology.py:283-289, extract_ncbi_gene.py:9-33): drop low-information
    gene types, 'hypothetical protein' descriptions and predicted
    (LOC-prefixed) symbols; optional taxon filter. Columns: tax_id, GeneID,
    Symbol, Synonyms, description, type_of_gene (tab-separated, '#' header).
    """

    def parse(t: pa.Table) -> pa.Table:
        tax, gid, sym, syn, desc, typ = [], [], [], [], [], []
        for line in t["text"].to_pylist():
            if not line or line.startswith("#"):
                continue
            f = line.split("\t")
            if len(f) < 6:
                continue
            if taxon is not None and f[0] != str(taxon):
                continue
            if f[5] in _GENE_TYPE_DROP:
                continue
            if f[4].lower().startswith("hypothetical protein"):
                continue
            if f[2].startswith("LOC"):
                continue
            tax.append(int(f[0])); gid.append(f[1]); sym.append(f[2])
            syn.append(f[3]); desc.append(f[4]); typ.append(f[5])
        return pa.table({
            "tax_id": pa.array(tax, pa.int64()),
            "gene_id": pa.array(gid, pa.string()),
            "symbol": pa.array(sym, pa.string()),
            "synonyms": pa.array(syn, pa.string()),
            "description": pa.array(desc, pa.string()),
            "gene_type": pa.array(typ, pa.string()),
        })

    return ray.data.read_text(paths).map_batches(parse, batch_format="pyarrow")


def read_jsonl_records(paths: str | list[str]) -> "ray.data.Dataset":
    """JSONL mention/KB records (reference analogs: S9 load_json
    ontology.py:583-620, S11 read_dataset BiEncoderLightningDataModule.py:28-41)."""
    return ray.data.read_json(paths)


def read_delimited_table(
    paths: str | list[str],
    delimiter: str = "|",
    column_names: list[str] | None = None,
) -> "ray.data.Dataset":
    """Delimiter-separated table (reference analog: S4 UMLS MRCONSO reader,
    umls_utils.py:83-173 -- pipe-delimited fixed columns)."""
    from pyarrow import csv as pacsv

    parse_options = pacsv.ParseOptions(delimiter=delimiter)
    read_options = pacsv.ReadOptions(column_names=column_names) if column_names else None
    return ray.data.read_csv(
        paths, parse_options=parse_options,
        **({"read_options": read_options} if read_options else {}),
    )


# MRCONSO.RRF fixed column layout (18 data fields + trailing delimiter)
_MRCONSO_COLS = [
    "cui", "lang", "term_status", "lui", "stt", "sui", "ispref", "aui",
    "saui", "scui", "sdui", "sab", "tty", "code", "alias", "srl",
    "suppress", "cvf", "null_col",
]
_MRRANK_COLS = ["rank", "sab", "tty", "suppress", "null_col"]


def read_umls(umls_dir: str, lang: str = "ENG") -> "ray.data.Dataset":
    """Composite UMLS ontology loader (S8): MRCONSO pipe-CSV + MRRANK merge
    -> one row per CUI with the rank-canonical name and the alias set.

    Semantics follow the reference cascade (umls_utils.py:83-237 `_load_umls`
    + `get_canonical_name`; ontology.py:326-408 `load_umls`):
    - MRCONSO.RRF parsed pipe-delimited with the fixed 19-column layout;
    - MRRANK.RRF supplies (sab, tty) -> rank, remapped to 850 - rank so
      SMALLER is better, inner-merged (rows whose (sab, tty) is unranked
      drop, as in the reference merge);
    - rows filtered to `lang`;
    - per CUI: canonical ``name`` = alias of the min-rank row, ``aliases`` =
      sorted distinct aliases minus the name, ``cui`` prefixed 'UMLS:'.
    Documented deviation: the reference's groupby.idxmin breaks equal-rank
    ties by FILE ORDER; here ties break by (rank, alias) so the result is
    deterministic under parallel, unordered blocks (repo invariant).

    Ray-Data-first: MRRANK is tiny and rides a `ray.put` broadcast (vectorized
    pandas merge per batch -- no shuffle of MRCONSO for the rank attach);
    MRCONSO streams through map_batches; ONE bucketed groupby on cui.
    """
    import numpy as np
    import pandas as pd

    import ray as _ray

    from biomedical_entity_linking_ray.functions import hashing
    from biomedical_entity_linking_ray.functions.joins import cached_broadcast

    rank_df = read_delimited_table(
        os.path.join(umls_dir, "MRRANK.RRF"), column_names=_MRRANK_COLS,
    ).to_pandas()[["rank", "sab", "tty"]]
    rank_df["rank"] = 850 - rank_df["rank"].astype(np.int64)
    rank_ref = _ray.put(rank_df)

    conso = read_delimited_table(
        os.path.join(umls_dir, "MRCONSO.RRF"), column_names=_MRCONSO_COLS)

    def attach_rank(t: pa.Table) -> pa.Table:
        df = t.select(["cui", "lang", "sab", "tty", "alias"]).to_pandas()
        df = df[df["lang"] == lang]
        rk = cached_broadcast(rank_ref)
        df = df.merge(rk, on=["sab", "tty"], how="inner")
        return pa.table({
            "cui": pa.array(df["cui"], pa.string()),
            "alias": pa.array(df["alias"], pa.string()),
            "rank": pa.array(df["rank"].to_numpy(np.int64)),
        })

    rows = conso.map_batches(attach_rank, batch_format="pyarrow")

    from biomedical_entity_linking_ray.config import default_buckets

    n_buckets = default_buckets()

    def add_bucket(t: pa.Table) -> pa.Table:
        h = hashing.fnv1a_fixed(t["cui"].to_numpy(zero_copy_only=False), width=32)
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(n_buckets)).astype(np.int64)))

    def agg_cui(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cui", "rank", "alias"])
        name = g.groupby("cui", sort=True)["alias"].first()
        out = pd.DataFrame({"cui0": name.index, "name": name.to_numpy()})
        alias_sets = g.groupby("cui", sort=True)["alias"].agg(
            lambda s: sorted(set(s)))
        out["aliases"] = [
            [a for a in al if a != nm]
            for al, nm in zip(alias_sets.to_numpy(), out["name"])
        ]
        out["num_aliases"] = [len(a) for a in out["aliases"]]
        out["cui"] = "UMLS:" + out["cui0"]
        return out[["cui", "name", "aliases", "num_aliases"]]

    return (
        rows.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(agg_cui, batch_format="pandas")
    )


def read_ab3p(paths: str | list[str], min_confidence: float = 0.95) -> "ray.data.Dataset":
    """Ab3P raw-abbreviation output -> (doc_id, short_form, long_form,
    confidence) rows, confidence-filtered.

    Reference analog: the abbreviation-dictionary GENERATION step
    (bioel/bioel/utils/solve_abbreviation/solve_abbreviations.py:41-96 drives
    the external Ab3P binary; abbreviations_utils.py:76-120 parses its
    output). The binary's format is blank-line-separated blocks:
    a ``pmid | document text`` header line followed by one
    ``  short|long|confidence`` line per detected abbreviation. The parse +
    ``confidence > cutoff`` filter + dict assembly is re-expressed as a
    file-parallel flat_map (block boundaries never straddle tasks because
    whole files are read); `resolve_abbreviations` (M4) consumes the result.
    """

    def parse_file(row: dict) -> list[dict]:
        text = row["bytes"].decode("utf-8", "replace")
        out = []
        for block in text.split("\n\n"):
            block = block.strip()
            if not block:
                continue
            lines = block.splitlines()
            doc_id = lines[0].split("|")[0].strip()
            for line in lines[1:]:
                parts = line.strip().split("|")
                if len(parts) != 3:
                    continue
                conf = float(parts[2])
                if conf > min_confidence:
                    out.append({"doc_id": doc_id,
                                "short_form": parts[0].strip(),
                                "long_form": parts[1].strip(),
                                "confidence": conf})
        return out

    return ray.data.read_binary_files(paths).flat_map(parse_file)
