"""Job configuration for the linkage pipeline.

Every knob that affects shuffle volume, block fan-out or determinism lives
here so a job config fully determines the output (reference analog: hydra /
params.json config surfaces, SURVEY.md 2.11).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class LinkageConfig:
    # --- MinHash / LSH (stage 1 blocking) ---
    num_perm: int = 128          # minhash permutations; sig bytes/row = 8*num_perm
    # 21 bands x 6 rows (126 of 128 perms used): P(co-block) = 1-(1-J^6)^21 --
    # 0.998 at J=0.80 (measured planted near-dup floor ~0.81), 0.008 at J=0.27
    # (measured random-pair ceiling). Geometry chosen from the measured Jaccard
    # separation, not guessed.
    lsh_bands: int = 21
    shingle_k: int = 5           # char-shingle width over normalized content
    max_shingles: int = 8192     # cap shingles per doc; bounds per-row cost
    # content-defined mod-p shingle sampling (functions/hashing.py
    # sample_shingles): keep 1/p of shingles by hash value -- shift-robust,
    # Jaccard-unbiased, cuts per-row sketch cost ~p-fold
    shingle_sample_mod: int = 4

    # --- hashed-TF vector (stage 2 cosine) ---
    tf_dim: int = 128            # hashed term-frequency vector dimensionality

    # --- blocking keys ---
    # (no sha-key knob: exact duplicates are contracted away BEFORE blocking,
    # so an exact-content key could never co-block anything new)
    use_minhash_keys: bool = True
    use_path_key: bool = True    # lang + filename-stem key (catches renamed near-dups)
    # extra blocking-key functions by registry name (stages/blocking.py
    # register_blocker) or direct callables -- the SURVEY 2.11 blocker slot
    extra_blockers: tuple = ()

    # --- hot-key salting (stage 1 shuffle skew control) ---
    # A block with > salt_cap rows is split into ceil(n/salt_cap) salted
    # sub-blocks by hash(file_id); a deterministic ~1/bridge_rate sample of each
    # sub-block is ALSO emitted into the next sub-block (ring overlap) so the
    # block stays connected for transitive closure. This caps per-group pair
    # fan-out at O(salt_cap * pair_window) regardless of key skew.
    salt_cap: int = 512
    bridge_rate: int = 8         # ~1/8 of a salted sub-block is duplicated into the ring

    # --- pair generation ---
    # Within a block (sorted by file_id): all pairs when the group is small,
    # otherwise each row links to its next `pair_window` neighbors (sorted
    # neighborhood). Windowed chains stay connected; transitive clustering
    # recovers the full cluster. Documented partitioning assumption: a cluster
    # is recovered iff its members share blocks whose windowed-link graph is
    # connected, which salting's ring overlap preserves.
    all_pairs_max: int = 64      # group size up to which all O(n^2)/2 pairs are emitted
    pair_window: int = 8         # neighbor links per row in larger groups

    # --- scoring / decision ---
    w_jw: float = 0.25           # weight: Jaro-Winkler(path)
    w_jac: float = 0.45          # weight: MinHash-estimated Jaccard(content shingles)
    w_cos: float = 0.30          # weight: cosine(hashed-TF content vectors)
    tau: float = 0.62            # combined-score threshold for an edge

    # --- scored-pairs product artifact ---
    # The deduplicated scored-pair table is a PRODUCT output (audit / eval /
    # threshold tuning), not an input to clustering (CC consumes star edges).
    # Its (id_a, id_b) max-score dedup is the job's largest all-to-all -- the
    # pre-dedup stream is ~rows x bands x window (measured: 470 s of a 559 s
    # run at 651 k rows; the disk-envelope bound in BASELINE.md). Assignments-
    # only deployments set False: the fused scorer emits star edges only and
    # `scored_pairs`/`edges` come back typed-empty.
    emit_scored_pairs: bool = True

    # --- clustering ---
    max_rounds: int = 50         # hard cap on label-propagation rounds
    # Residual-graph fast path: after per-block local contraction the edge
    # list is ~1 edge/member; below this count the component resolution runs
    # as a driver-side union-find (guide: "union-find on the driver only if
    # the candidate set is provably small"), above it the distributed
    # label-propagation path runs. At 10^12 rows the distributed path is the
    # one that executes.
    driver_cc_max_edges: int = 5_000_000
    # Broadcast fast path for the final member->cluster attachment: when the
    # representative label table fits comfortably in the object store it is
    # ray.put once and looked up per batch (no shuffle); beyond the bound the
    # hash-join path runs (the 10^12-scale path).
    broadcast_labels_max: int = 5_000_000
    # Same policy for the small side of the contract / memberset / enrich
    # joins: under this row count the side is ray.put once and applied as a
    # vectorized per-batch lookup (no aggregator-actor fleet, no shuffle of
    # the big side); beyond it the partitioned hash join runs. Sized from
    # payload bytes vs a worker node's heap, not timidity: the widest side
    # (scoring features -- path_norm + 256 B sig + tfvec) is ~1.3 KB/row, so
    # 4 M rows is a ~5 GB broadcast -- comfortable on any >=64 GB node, and
    # paying it beats the alternative by 20x: beyond the bound the enrich
    # join replicates the payload once per exploded block row (~25x/rep)
    # through the coarse shuffle -- measured ~100 GB of shuffle+spill at a
    # 2.8 M-row corpus vs a 3.4 GB broadcast (BASELINE.md round 4). At true
    # cluster scale (reps >> any node) the join path still engages.
    broadcast_side_max: int = 4_000_000

    # --- physical execution ---
    batch_size: int = 1024       # rows per batch in feature stages
    score_batch_size: int = 4096 # pairs per batch in the scoring actor pool
    scorer_concurrency: int = 4  # scoring actor-pool size
    join_partitions: int = 8     # num_partitions for hash joins / groupbys
    seed: int = 42               # all hashing / salting derives from this

    @property
    def rows_per_band(self) -> int:
        # trailing permutations beyond bands*rows are simply unused by banding
        return self.num_perm // self.lsh_bands


DEFAULT_CONFIG = LinkageConfig()


def effective_partitions(cfg: LinkageConfig) -> int:
    """Shuffle/join partition count: at least the configured floor, scaled up
    to the cluster CPU count so exchanges never cap parallelism below the
    cores available (join_partitions=8 on a 32-core node serializes 4x)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(cfg.join_partitions, cpus)


def default_buckets(floor: int = 64, per_cpu: int = 4) -> int:
    """Cluster-derived group-stage fan-out for the standalone pipelines (no
    LinkageConfig): n_buckets = max(floor, CPUs * per_cpu).

    A coarse group holds ~N/n_buckets surviving rows, so a fixed literal 64
    makes per-task memory grow linearly with the corpus; scaling the bucket
    count with the cluster keeps it flat (the fused scorer already does this
    via effective_partitions(cfg) * 16 -- same shape here). Bucket count only
    partitions work; results are invariant to it. per_cpu=4 measured best at
    bench scale (this Ray build pays ~2.5 ms per group: cpus*16 = 512 buckets
    cost minhash_near_dup +1.4 s over 128 at sf0.1 with no benefit until
    per-bucket volume actually pressures a task heap -- a knob, not a law)."""
    import ray

    cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(floor, cpus * per_cpu)


@dataclass(frozen=True)
class SynthConfig:
    """Deterministic synthetic files-corpus generator knobs (FIXTURES.md 1/4)."""

    seed: int = 42
    n_singletons: int = 600          # unique files, no cluster
    n_small_clusters: int = 120      # planted clusters of size 2-5
    n_medium_clusters: int = 6       # planted clusters of size ~50
    hot_block_size: int = 500        # one vendored file duplicated widely
    n_hard_negatives: int = 150      # same lang + similar path, different content
    n_cross_lang_decoys: int = 60    # same path tokens, different lang
    near_dup_edit_rate: float = 0.05 # token-level edit fraction for near dups
    # Content-length multiplier. 1.0 plants ~1-2 KB files (fast unit tests);
    # real source files average several KB, so bench/scaling corpora use a
    # larger value to keep the compute/shuffle balance representative of the
    # 10^12-file source-code workload (sketch sizes are fixed, so only the
    # content scan grows -- exactly as at production scale).
    content_scale: float = 1.0
    langs: tuple = ("python", "java", "js", "c", "go", "text")

    def scaled(self, factor: float, content_scale: float | None = None) -> "SynthConfig":
        """Scale row volume by `factor`, keeping structure."""
        return SynthConfig(
            seed=self.seed,
            n_singletons=max(1, int(self.n_singletons * factor)),
            n_small_clusters=max(1, int(self.n_small_clusters * factor)),
            n_medium_clusters=max(1, int(self.n_medium_clusters * factor)),
            hot_block_size=max(4, int(self.hot_block_size * factor)),
            n_hard_negatives=max(1, int(self.n_hard_negatives * factor)),
            n_cross_lang_decoys=max(1, int(self.n_cross_lang_decoys * factor)),
            near_dup_edit_rate=self.near_dup_edit_rate,
            content_scale=(self.content_scale if content_scale is None
                           else content_scale),
            langs=self.langs,
        )
