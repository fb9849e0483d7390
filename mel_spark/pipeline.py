"""End-to-end entity-resolution pipeline (SURVEY.md §7.1).

repos(repo, path, commit, lang, content)
  → ingest (sha256 invariant, mention_id)             [stage: ingest]
  → exact dedup groups feed cheap block keys
  → embed (Arrow UDF bi-encoder)                      [stage: embed]
  → block (sha ∪ (lang,minhash-band) ∪ hyperplane)    [stage: blocks]
  → candidate pairs + fused scoring                   [stage: pairs]
  → threshold → matches
  → large-star/small-star connected components        [stage: clusters]

Every stage checkpoints via CheckpointManager (resume = skip green stages).
The reference's pipeline shape being re-expressed: tokenize → embed →
alias-table/ANN block → retrieve+score → resolve (SURVEY.md §3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mel_spark.functions import text as T
from mel_spark.operators import blocking, cluster, pairs
from mel_spark.sources.checkpoint import CheckpointManager


@dataclass
class ERConfig:
    shingle_n: int = 3
    # 16 bands × 2 rows: a true jaccard-0.6 pair misses a band with p=0.64,
    # all 16 with p=0.64^16 ≈ 8e-4 → blocking recall ≈ 0.999 (tuning analogue:
    # ScaNN leaves/search/reorder, src/finetunings/evaluation/find_recall.py:28-37)
    minhash_hashes: int = 32
    minhash_bands: int = 16
    emb_dim: int = 64
    use_hyperplane_blocks: bool = False
    hyperplane_planes: int = 16
    hyperplane_bands: int = 4
    max_block_size: int = 64
    salt_threshold: int = 256
    # fused score of a worst-case planted near-dup (≈8% token edits):
    # cos≈0.92, jaccard≈0.60 → 0.6·0.92+0.4·0.60 ≈ 0.79; random pairs ≈ 0.2
    threshold: float = 0.72
    w_cos: float = 0.6
    w_jw: float = 0.0
    w_lev: float = 0.0
    w_jaccard: float = 0.4
    seed: int = 42


def ingest(repos: DataFrame) -> DataFrame:
    """Stage 1: mention_id = sha256(repo||path||commit); content_sha invariant.

    Columns are cast to the contract schema (input_hint: all string) so
    schema-drifted sources (e.g. an empty parquet with inferred types) fail
    soft instead of breaking sha2 type checks.

    ``mid`` = xxhash64(mention_id) is the 8-byte WORKING id every downstream
    shuffle keys on (blocks, pairs, connected components): a 64-char sha hex
    string costs ~8× the shuffle bytes, sort width, and hash-table churn of a
    long, and the blocks/pairs stages shuffle ~17 rows per mention. The sha
    string remains the durable identity — final cluster output joins back to
    it. Collision envelope: n²/2⁶⁵ spurious-merge probability (~3e-8 at 10⁶
    rows); at the 10^12-file tier swap ``mid`` for a 128-bit (2-long) key —
    same plan shape, double key width."""
    repos = repos.select(*[F.col(c).cast("string").alias(c) for c in
                           ("repo", "path", "commit", "lang", "content")])
    return repos.select(
        F.sha2(F.concat_ws("\x00", "repo", "path", "commit"), 256).alias("mention_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        T.content_sha("content").alias("content_sha"),
    ).withColumn("mid", F.xxhash64("mention_id"))


def embed_stage(mentions: DataFrame, cfg: ERConfig) -> DataFrame:
    """Stage 3: dedup distinct contents BEFORE featurizing (the reference's
    wasted-resources lesson, src/baselines/olpeat/at_embeddings.py:4-8), then
    join features back to all mentions on the 8-byte content hash.

    ONE fused Arrow pass (vectors.featurize_map) computes the embedding, the
    sorted-distinct shingle-hash set ``xs`` (reused by the pair stage's
    jaccard verification) and the minhash ``bands`` keys — batch-vectorized
    NumPy, fed by a single JVM xxhash64 pass per token. The Catalyst form of
    the minhash permutations allocated one array per permutation per row and
    capped 2→8-thread scaling at ~1.5× (BENCH r1); the fused pass removes
    that JVM allocation entirely."""
    from mel_spark.functions.vectors import featurize_map

    m = mentions.withColumn("csid", F.xxhash64("content_sha"))
    distinct_contents = m.select("csid", "content").dropDuplicates(["csid"])
    feat_fn, feat_schema = featurize_map(
        dim=cfg.emb_dim,
        seed=cfg.seed,
        shingle_n=cfg.shingle_n,
        num_hashes=cfg.minhash_hashes,
        bands=cfg.minhash_bands,
    )
    feats = distinct_contents.select(
        "csid", T.token_int_hashes("content").alias("_th")
    ).mapInPandas(feat_fn, feat_schema)
    # the embed output is the hot-path working set: long ids + features only.
    # content/repo/commit/content_sha live in the ingest checkpoint; dropping
    # them here cuts the join shuffle and every downstream scan (~5× smaller
    # rows). mention_id (sha) is kept for lineage joins and tests.
    return m.select("mid", "mention_id", "path", "lang", "csid").join(feats, "csid")


def block_stage(embedded: DataFrame, cfg: ERConfig) -> DataFrame:
    """Stage 4: union of key families, then skew controls (salt → cap).

    Both the key AND the member id are 8-byte longs: the exploded block table
    (~17 rows/mention) is the pipeline's biggest shuffle, and the cap/salt
    windows sort it — 16-byte rows keep that sort allocation-light."""
    b_exact = embedded.select(
        F.xxhash64(F.lit("sha"), F.col("csid")).alias("block_key"),
        F.col("mid").alias("mention_id"),
    )
    # band ints are precomputed by the fused featurizer — blocking is just an
    # explode + one xxhash64 mixing in the lang (no array math here)
    b_mh = embedded.select(
        F.col("mid").alias("mention_id"),
        F.explode("bands").alias("_band"),
        "lang",
    ).select(
        F.xxhash64(F.lit("mh"), F.col("_band"), F.col("lang")).alias("block_key"),
        "mention_id",
    )
    blocks = b_exact.unionByName(b_mh)
    if cfg.use_hyperplane_blocks:
        b_hp = blocking.hyperplane_blocks(
            embedded,
            "mid",
            "emb",
            dim=cfg.emb_dim,
            n_planes=cfg.hyperplane_planes,
            bands=cfg.hyperplane_bands,
            seed=cfg.seed,
        ).select(F.xxhash64(F.lit("hp"), "block_key").alias("block_key"), "mention_id")
        blocks = blocks.unionByName(b_hp)
    blocks = blocking.salt_hot_blocks(blocks, cfg.salt_threshold)
    return blocking.cap_blocks(blocks, cfg.max_block_size)


def pair_stage(blocks: DataFrame, embedded: DataFrame, cfg: ERConfig) -> DataFrame:
    cand = pairs.candidate_pairs(blocks)
    records = embedded.select(
        F.col("mid").alias("mention_id"), "emb", "path", "xs"
    ).dropDuplicates(["mention_id"])
    scored = pairs.score_pairs(
        cand,
        records,
        emb_col="emb",
        ident_col="path" if (cfg.w_jw or cfg.w_lev) else None,
        hash_col="xs",
        w_cos=cfg.w_cos,
        w_jw=cfg.w_jw,
        w_lev=cfg.w_lev,
    )
    # fuse jaccard into the score (content is the strongest signal for code ER)
    if cfg.w_jaccard:
        total = cfg.w_cos + cfg.w_jw + cfg.w_lev + cfg.w_jaccard
        scored = scored.withColumn(
            "score",
            F.round(
                (
                    F.col("score") * F.lit(cfg.w_cos + cfg.w_jw + cfg.w_lev)
                    + F.col("jaccard") * F.lit(cfg.w_jaccard)
                )
                / F.lit(total),
                6,
            ),
        )
    return scored


def run_pipeline(
    spark: SparkSession,
    repos: DataFrame,
    checkpoint_dir: str,
    cfg: ERConfig = ERConfig(),
    input_token: str = "",
) -> dict[str, DataFrame]:
    """Full resumable run; returns every stage DataFrame keyed by stage name.

    ``input_token`` identifies the input (path / synth spec); it is hashed
    with the full ERConfig into each stage's checkpoint fingerprint, so a
    rerun against the same --checkpoint dir with a different threshold or
    input recomputes instead of serving stale stages."""
    import hashlib
    import json
    from dataclasses import asdict

    fp = hashlib.sha256(
        (json.dumps(asdict(cfg), sort_keys=True) + "\x00" + input_token).encode()
    ).hexdigest()
    ckpt = CheckpointManager(checkpoint_dir)
    mentions, _ = ckpt.get_or_compute(
        "ingest", spark, lambda: ingest(repos), partition_by=["lang"], fingerprint=fp
    )
    embedded, _ = ckpt.get_or_compute(
        "embed", spark, lambda: embed_stage(mentions, cfg), fingerprint=fp
    )
    blocks, _ = ckpt.get_or_compute(
        "blocks", spark, lambda: block_stage(embedded, cfg), fingerprint=fp
    )
    scored, _ = ckpt.get_or_compute(
        "pairs", spark, lambda: pair_stage(blocks, embedded, cfg), fingerprint=fp
    )
    matches = pairs.match_pairs(scored, cfg.threshold)

    def _cluster() -> DataFrame:
        # CC runs entirely on long mids; the sha mention_id is joined back in
        # ONE final pass (the only string shuffle after ingest)
        cc = cluster.connected_components(matches)
        cl = cluster.attach_singletons(cc, mentions.select(F.col("mid").alias("mention_id")))
        id_map = mentions.select("mid", F.col("mention_id").alias("_sha_id"))
        return (
            cl.withColumnRenamed("mention_id", "mid")
            .join(id_map, "mid")
            .select(F.col("_sha_id").alias("mention_id"), "cluster_id")
        )

    clusters, _ = ckpt.get_or_compute("clusters", spark, _cluster, fingerprint=fp)
    return {
        "mentions": mentions,
        "embedded": embedded,
        "blocks": blocks,
        "scored": scored,
        "matches": matches,
        "clusters": clusters,
    }
