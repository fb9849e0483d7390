"""Blocking: map each record to candidate-generation keys.

Two key families, unioned (the reference's two alias sources feeding one table,
ChainStep src/tokenization/pipeline/utils/chain.py:5-17; SURVEY.md §7.1 stage 4):

 (a) content/minhash family — exact sha256 key, or (lang, minhash-band) LSH keys
     over token shingles (alias-table analogue:
     src/baselines/string_alias_tables/all_languages.py:93-115,
     src/baselines/olpeat/find_recall.py:76-91);
 (b) embedding family — random-hyperplane signature bands over the embedding
     column (Spark-native form of ScaNN partitioning,
     src/models/searchers/scann_searcher.py:21-49).

Skew handling (north_rule): hot blocks are capped; a block of size s yields
s·(s-1)/2 pairs, so an uncapped hot key (the reference's "Paris" problem,
src/baselines/olpeat/at_embeddings.py:4-6) quadratically dominates the shuffle.
Cap precedent: per-qid index cap, src/data_processors/index/index.py:102-120.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mel_spark.functions import text as T


def exact_content_blocks(df: DataFrame, id_col: str, content_col: str = "content") -> DataFrame:
    """Blocking key = sha256(content): exact-duplicate blocks (stage-2 minimum
    slice). Emits (block_key, mention_id)."""
    return df.select(
        F.concat(F.lit("sha:"), T.content_sha(content_col)).alias("block_key"),
        F.col(id_col).alias("mention_id"),
    )


def minhash_blocks(
    df: DataFrame,
    id_col: str,
    content_col: str = "content",
    lang_col: str | None = "lang",
    shingle_n: int = 3,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """(lang, minhash-band) LSH blocks. num_hashes = bands × rows; two docs
    share ≥1 key with prob 1-(1-j^rows)^bands for Jaccard j — with 8 bands × 2
    rows, j=0.7 collides with p≈0.996."""
    # staged projections: shingle build → single md5 pass → permutations
    staged = df.select(
        F.col(id_col).alias("mention_id"),
        (F.concat(F.col(lang_col), F.lit("/")) if lang_col else F.lit("")).alias("_lp"),
        T.shingles(content_col, shingle_n).alias("_sh"),
    ).select("mention_id", "_lp", T.shingle_int_hashes(F.col("_sh")).alias("_xs"))
    return minhash_blocks_from_ints(
        staged, "mention_id", "_xs", lang_prefix_col="_lp",
        num_hashes=num_hashes, bands=bands,
    )


def minhash_blocks_from_ints(
    df: DataFrame,
    id_col: str,
    xs_col: str,
    lang_prefix_col: str | None = None,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """Band keys from a pre-materialized shingle-int-hash column (the 100 TB
    path: the md5 pass is paid once at the embed/ingest checkpoint and reused
    by blocking AND jaccard verification)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    lp: Column = F.col(lang_prefix_col) if lang_prefix_col else F.lit("")
    staged = df.select(
        F.col(id_col).alias("mention_id"),
        lp.alias("_lp"),
        T.minhash_signature_from_ints(F.col(xs_col), num_hashes).alias("_sig"),
    )
    return staged.select(
        "mention_id",
        F.explode(T.minhash_band_keys(F.col("_sig"), bands, rows)).alias("_bk"),
        "_lp",
    ).select(
        F.concat(F.lit("mh:"), F.col("_lp"), F.col("_bk")).alias("block_key"),
        "mention_id",
    )


def hyperplane_blocks(
    df: DataFrame,
    id_col: str,
    emb_col: str = "emb",
    dim: int = 64,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Random-hyperplane (SimHash-for-cosine) LSH over the embedding column,
    banded like minhash. Hyperplanes are a seeded deterministic matrix baked
    into the plan as array literals — JVM-side dot products, no Python."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim)).astype("float64")
    assert n_planes % bands == 0
    rows = n_planes // bands

    def _bit(p: int) -> Column:
        lits = F.array(*[F.lit(float(x)) for x in planes[p]])
        s = F.aggregate(
            F.zip_with(F.col(emb_col), lits, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))

    bits = [_bit(p) for p in range(n_planes)]
    keys = [
        F.concat(F.lit(f"hp{i}:"), *bits[i * rows : (i + 1) * rows]) for i in range(bands)
    ]
    return df.select(
        F.col(id_col).alias("mention_id"), F.explode(F.array(*keys)).alias("block_key")
    )


def cap_blocks(blocks: DataFrame, max_block_size: int = 64, order_col: str = "mention_id") -> DataFrame:
    """Drop members beyond ``max_block_size`` per key (deterministic order) and
    drop singleton blocks (they generate no pairs — pruning them early avoids
    shuffling dead keys)."""
    w = Window.partitionBy("block_key").orderBy(order_col)
    return (
        blocks.withColumn("_rn", F.row_number().over(w))
        .withColumn("_sz", F.count(F.lit(1)).over(Window.partitionBy("block_key")))
        .filter((F.col("_rn") <= max_block_size) & (F.col("_sz") >= 2))
        .drop("_rn", "_sz")
    )


def minhash_long_blocks(
    df: DataFrame,
    id_col: str,
    xs_col: str,
    lang_col: str | None = None,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """All-integer LSH blocking (the 100 TB hot path): signature from
    pre-projected int hashes, band keys as longs, final block_key =
    xxhash64(family, band, lang) — an 8-byte join key, zero string churn.
    Emits (block_key long, mention_id)."""
    assert num_hashes % bands == 0
    rows = num_hashes // bands
    lang = F.col(lang_col) if lang_col else F.lit("")
    staged = df.select(
        F.col(id_col).alias("mention_id"),
        lang.alias("_lang"),
        T.minhash_signature_from_ints(F.col(xs_col), num_hashes).alias("_sig"),
    )
    return staged.select(
        "mention_id",
        "_lang",
        F.explode(T.minhash_band_ints(F.col("_sig"), bands, rows)).alias("_band"),
    ).select(
        "mention_id",
        F.xxhash64(F.lit("mh"), F.col("_band"), F.col("_lang")).alias("block_key"),
    )


def raw_band_keys(feats: DataFrame, content_langs: DataFrame) -> DataFrame:
    """(block_key long, mention_id=csid) raw minhash-band keys from the fused
    featurizer's precomputed ``bands`` column — the SINGLE definition of the
    xxhash64("mh", band, lang) key identity shared by the pipeline's durable
    block index (pipeline.block_index_stage) and incremental folds' delta keys
    (operators/incremental.py). Any drift between those two constructions
    silently breaks the fold-equals-full-run contract (delta keys would stop
    joining the base index), so both call THIS function. No salt/cap/singleton
    policies here — those are pairing-time policies, not key identities.

    ``content_langs``: (csid, lang) — a content seen under k languages blocks
    in all k of them (preserves per-mention (lang, band) semantics after
    content-level dedup)."""
    return (
        feats.select("csid", "bands")
        .join(content_langs.select("csid", "lang"), "csid")
        .select(
            F.col("csid").alias("mention_id"),
            F.explode("bands").alias("_band"),
            "lang",
        )
        .select(
            F.xxhash64(F.lit("mh"), F.col("_band"), F.col("lang")).alias("block_key"),
            "mention_id",
        )
    )


def salt_hot_blocks(
    blocks: DataFrame,
    salt_threshold: int = 256,
    n_salts: int = 8,
    hot_keys: DataFrame | None = None,
) -> DataFrame:
    """Split blocks larger than ``salt_threshold`` into ``n_salts`` sub-blocks
    by a deterministic hash of (block_key, member). Trades (bounded) recall
    INSIDE each mega-block for a quadratic reduction in its pair fan-out
    (north_rule skew handling).

    The salt is derived from the pair (block_key, mention_id) — NOT the member
    alone — so salts DECORRELATE across key families: two members split apart
    in one hot band land together in other bands/sha/hyperplane blocks with
    independent probability, their edge survives there, and transitive
    clustering re-merges the cluster. (A member-only salt makes the same split
    in every family, deterministically fragmenting any cluster whose blocks
    are all hot.)

    ``hot_keys`` (block_key) optionally supplies a precomputed hot-key set —
    the pipeline passes the persisted per-key sizes from its ``block_sizes``
    stage, and incremental folds pass base+delta TOTALS, skipping the
    counting pass over the full key stream here."""
    from pyspark.sql.types import LongType

    if hot_keys is not None:
        hot = hot_keys.select("block_key", F.lit(1).alias("_sz"))
    else:
        hot = (
            blocks.groupBy("block_key")
            .agg(F.count(F.lit(1)).alias("_sz"))
            .filter(F.col("_sz") > salt_threshold)
        )
    is_long = isinstance(blocks.schema["block_key"].dataType, LongType)
    salt = F.pmod(F.xxhash64("block_key", "mention_id"), F.lit(n_salts))
    salted_key = (
        F.xxhash64("block_key", salt)
        if is_long
        else F.concat(F.col("block_key"), F.lit("#"), salt.cast("string"))
    )
    return (
        blocks.join(F.broadcast(hot), "block_key", "left")
        .withColumn(
            "block_key",
            F.when(F.col("_sz").isNotNull(), salted_key).otherwise(F.col("block_key")),
        )
        .drop("_sz")
    )
