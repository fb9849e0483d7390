"""End-to-end ER pipeline: F1 vs planted clusters, sha invariant, resume."""

import pytest
from pyspark.sql import functions as F

from mel_spark.datagen import GenConfig, generate_repos
from mel_spark.operators.evaluate import pairs_from_clusters, pairwise_prf
from mel_spark.pipeline import ERConfig, run_pipeline


@pytest.fixture(scope="module")
def pipeline_run(spark, tmp_path_factory):
    tables = generate_repos(GenConfig(n_files=600, seed=42))
    repos = spark.createDataFrame(tables["repos"])
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    out = run_pipeline(spark, repos, ckpt)
    return tables, out, ckpt


def test_f1_against_planted_clusters(spark, pipeline_run):
    tables, out, _ = pipeline_run
    ref = spark.createDataFrame(tables["reference_clusters"])
    gold = pairs_from_clusters(ref, "mention_id", "entity_id")
    pred = pairs_from_clusters(out["clusters"], "mention_id", "cluster_id")
    m = pairwise_prf(pred, gold)
    assert m["f1"] >= 0.99, m


def test_content_sha_invariant(spark, pipeline_run):
    """input_hint: per-row sha256(content) equality vs the source table."""
    tables, out, _ = pipeline_run
    import hashlib

    src = tables["repos"].copy()
    src["content_sha"] = [
        hashlib.sha256(c.encode()).hexdigest() for c in src["content"]
    ]
    expected = spark.createDataFrame(src[["repo", "path", "commit", "content_sha"]])
    got = out["mentions"].select("repo", "path", "commit", "content_sha")
    assert got.exceptAll(expected).count() == 0
    assert expected.exceptAll(got).count() == 0


def test_resume_skips_green_stages(spark, pipeline_run):
    tables, out, ckpt = pipeline_run
    from mel_spark.sources.checkpoint import CheckpointManager

    mgr = CheckpointManager(ckpt)
    for stage in ["ingest", "embed", "blocks", "pairs", "clusters"]:
        assert mgr.exists(stage), stage
    # re-run: compute thunks must NOT be invoked
    calls = []

    def boom():
        calls.append(1)
        raise AssertionError("stage recomputed despite valid checkpoint")

    df, resumed = mgr.get_or_compute("ingest", spark, boom)
    assert resumed and not calls and df.count() == 600


def test_lineage_columns_present(pipeline_run):
    _, out, _ = pipeline_run
    for c in ("_stage", "_run_id", "_src_partition"):
        assert c in out["mentions"].columns


def test_embedding_deterministic_across_parallelism(spark, pipeline_run):
    """FIXTURES.md §5: same content ⇒ identical vector at different
    partitionings (features are keyed by the content hash csid)."""
    tables, out, _ = pipeline_run
    emb1 = out["embedded"].select("csid", "emb")
    repos = spark.createDataFrame(tables["repos"]).repartition(13)
    from mel_spark.pipeline import ingest, embed_stage

    emb2 = embed_stage(ingest(repos), ERConfig()).select(
        "csid", F.col("emb").alias("emb2")
    )
    j = emb1.join(emb2, "csid")
    assert j.count() == out["embedded"].count()
    diff = j.filter(F.to_json("emb") != F.to_json("emb2")).count()
    assert diff == 0


def test_ingest_redirect_decoration(spark):
    """S5 semantics: the redirect remap decorates the source read, so a
    redirected entity id is normalized BEFORE mention identity is derived —
    mentions arriving under the old id land in the remapped entity's rows
    (reference decorates every loader, src/utils/loaders.py:37-56)."""
    from mel_spark.pipeline import ingest

    repos = spark.createDataFrame(
        [
            ("org/old-name", "a.py", "c1", "python", "x = 1"),
            ("org/new-name", "a.py", "c1", "python", "x = 1"),
            ("org/other", "b.py", "c2", "python", "y = 2"),
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    redirects = spark.createDataFrame(
        [("org/old-name", "org/new-name")], ["old_entity_id", "new_entity_id"]
    )
    out = ingest(repos, redirects=redirects).collect()
    repos_seen = {r["repo"] for r in out}
    assert repos_seen == {"org/new-name", "org/other"}
    # identity derived AFTER the remap: the old-name and new-name rows now
    # have the SAME mention_id (and collapse into one entity downstream)
    mids = {r["mention_id"] for r in out if r["repo"] == "org/new-name"}
    assert len(mids) == 1
