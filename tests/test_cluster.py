"""Connected-components correctness: transitivity, determinism, idempotence
(FIXTURES.md §6 invariants)."""

import pytest
from pyspark.sql import functions as F

from mel_spark.operators.cluster import attach_singletons, connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["mention_id_a", "mention_id_b"])
    return {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df).collect()
    }


def test_chain_is_transitive(spark):
    got = _cc(spark, [("a", "b"), ("b", "c"), ("c", "d"), ("x", "y")])
    assert got["a"] == got["b"] == got["c"] == got["d"] == "a"
    assert got["x"] == got["y"] == "x"


def test_long_path_converges(spark):
    n = 40
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    got = _cc(spark, edges)
    assert set(got.values()) == {"n000"}
    assert len(got) == n + 1


def test_star_and_cycle(spark):
    edges = [("h", f"l{i}") for i in range(10)] + [("c1", "c2"), ("c2", "c3"), ("c3", "c1")]
    got = _cc(spark, edges)
    assert len({got[f"l{i}"] for i in range(10)} | {got["h"]}) == 1
    assert got["c1"] == got["c2"] == got["c3"] == "c1"


def test_idempotent_rerun(spark):
    edges = [("a", "b"), ("b", "c"), ("p", "q")]
    assert _cc(spark, edges) == _cc(spark, edges)


def test_singletons_attached(spark):
    matches = spark.createDataFrame([("a", "b")], ["mention_id_a", "mention_id_b"])
    all_ids = spark.createDataFrame([("a",), ("b",), ("z",)], ["mention_id"])
    cc = connected_components(matches)
    out = {r["mention_id"]: r["cluster_id"] for r in attach_singletons(cc, all_ids).collect()}
    assert out == {"a": "a", "b": "a", "z": "z"}


def test_planted_hub_is_safe(spark):
    """A high-degree hub (the skewed match graph case, VERDICT r1 #3): the
    star steps must resolve it via scalar min-aggregation — no collect_set
    neighbor arrays — and still produce one transitive cluster."""
    n = 100_000
    hub = spark.range(1, n + 1).select(
        F.lit(0).alias("mention_id_a"), F.col("id").alias("mention_id_b")
    )
    # a side chain hanging off the hub's last leaf exercises multi-round merging
    chain = spark.range(n, n + 50).select(
        F.col("id").alias("mention_id_a"), (F.col("id") + 1).alias("mention_id_b")
    )
    cc = connected_components(hub.union(chain))
    assert cc.select("cluster_id").distinct().collect()[0]["cluster_id"] == 0
    assert cc.count() == n + 51


def test_mid_clustering_resume(spark, tmp_path):
    """north_rule: the pipeline resumes MID-clustering. Run CC with a durable
    round checkpoint, simulate a crash by re-invoking with the same dir —
    the completed rounds must be read back, not recomputed, and the result
    must equal the non-checkpointed run."""
    import json
    import os

    n = 60
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    df = spark.createDataFrame(edges, ["mention_id_a", "mention_id_b"])
    cc_dir = str(tmp_path / "cc")
    base = {r["mention_id"]: r["cluster_id"] for r in connected_components(df).collect()}
    first = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=cc_dir).collect()
    }
    assert first == base
    state = json.load(open(os.path.join(cc_dir, "_CC_STATE.json")))
    assert state["converged"] and state["iteration"] >= 1
    # "crash" after convergence: a rerun must resume, not restart — it reads
    # the final round back and performs ZERO additional star rounds
    n_rounds_before = len([d for d in os.listdir(cc_dir) if d.startswith("iter")])
    second = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=cc_dir).collect()
    }
    n_rounds_after = len([d for d in os.listdir(cc_dir) if d.startswith("iter")])
    assert second == base and n_rounds_after == n_rounds_before
    # mid-run crash: drop the converged flag and final round → resumes from
    # the remaining round and still converges to the same partition
    json.dump(
        {"iteration": state["iteration"] - 1,
         "fingerprint": state["fingerprint"], "converged": False},
        open(os.path.join(cc_dir, "_CC_STATE.json"), "w"),
    )
    third = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=cc_dir).collect()
    }
    assert third == base


def test_durable_every_cadence(spark, tmp_path):
    """durable_every=K: intermediate rounds are localCheckpoint-only, the
    converged round is still written durably with its state marker, results
    match the per-round-durable run, and crash-after-convergence resume
    performs zero extra rounds."""
    import json
    import os

    n = 60  # a 61-node path needs several star rounds → exercises the cadence
    edges = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(n)]
    df = spark.createDataFrame(edges, ["mention_id_a", "mention_id_b"])
    base = {r["mention_id"]: r["cluster_id"] for r in connected_components(df).collect()}

    d1 = str(tmp_path / "cc_k1")
    dk = str(tmp_path / "cc_k3")
    got1 = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=d1).collect()
    }
    gotk = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=dk, durable_every=3).collect()
    }
    assert got1 == base and gotk == base

    st1 = json.load(open(os.path.join(d1, "_CC_STATE.json")))
    stk = json.load(open(os.path.join(dk, "_CC_STATE.json")))
    # same rounds to converge; the cadenced run wrote FEWER durable rounds
    assert stk["iteration"] == st1["iteration"] and stk["converged"]
    iters1 = {d for d in os.listdir(d1) if d.startswith("iter")}
    itersk = {d for d in os.listdir(dk) if d.startswith("iter")}
    assert len(itersk) < len(iters1)
    # the converged round is always durable, whatever the cadence
    assert f"iter{stk['iteration']}" in itersk

    # crash-after-convergence resume: same result, no new iter dirs
    again = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(df, checkpoint_dir=dk, durable_every=3).collect()
    }
    assert again == base
    assert {d for d in os.listdir(dk) if d.startswith("iter")} == itersk


def test_matches_gold_partition(spark, tiny_tables):
    """Edges built from the gold assignment must recover exactly the gold
    partition (modulo label choice)."""
    ref = spark.createDataFrame(tiny_tables["reference_clusters"])
    gold_pairs = (
        ref.alias("a")
        .join(ref.alias("b"), F.col("a.entity_id") == F.col("b.entity_id"))
        .filter(F.col("a.mention_id") < F.col("b.mention_id"))
        .select(
            F.col("a.mention_id").alias("mention_id_a"),
            F.col("b.mention_id").alias("mention_id_b"),
        )
    )
    cc = attach_singletons(connected_components(gold_pairs), ref.select("mention_id"))
    joined = cc.join(ref, "mention_id")
    # each predicted cluster maps to exactly one gold entity and vice versa
    assert joined.groupBy("cluster_id").agg(F.countDistinct("entity_id").alias("n")).filter(
        "n > 1"
    ).count() == 0
    assert joined.groupBy("entity_id").agg(F.countDistinct("cluster_id").alias("n")).filter(
        "n > 1"
    ).count() == 0


def test_stale_state_discarded_on_fingerprint_mismatch(spark, tmp_path):
    """Rerunning into the same checkpoint dir with a DIFFERENT input
    fingerprint must discard the saved rounds and recompute — not resume
    from the previous input's converged edges (which silently emits stale
    components)."""
    ckpt = str(tmp_path / "cc")
    e1 = spark.createDataFrame(
        [("a", "b"), ("b", "c")], ["mention_id_a", "mention_id_b"]
    )
    got1 = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(e1, checkpoint_dir=ckpt, input_fingerprint="fp1").collect()
    }
    assert got1 == {"b": "a", "c": "a", "a": "a"}
    # different edge set, SAME dir, new fingerprint: must reflect e2 only
    e2 = spark.createDataFrame(
        [("x", "y"), ("y", "z")], ["mention_id_a", "mention_id_b"]
    )
    got2 = {
        r["mention_id"]: r["cluster_id"]
        for r in connected_components(e2, checkpoint_dir=ckpt, input_fingerprint="fp2").collect()
    }
    assert got2 == {"y": "x", "z": "x", "x": "x"}, got2


def test_random_graphs_match_union_find_oracle(spark):
    """Breadth check: random Erdős–Rényi-ish edge sets at several densities
    vs a pure-Python union-find with min-label semantics (cluster_id = min
    member id). The structural cases above pin known shapes; this pins the
    algorithm on graphs nobody hand-picked (seeded — deterministic)."""
    import numpy as np

    def union_find_labels(edges, nodes):
        parent = {n: n for n in nodes}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for u, v in edges:
            ru, rv = find(u), find(v)
            if ru != rv:
                parent[max(ru, rv)] = min(ru, rv)
        # relabel every component to its min member
        comp: dict[str, str] = {}
        for n in nodes:
            r = find(n)
            comp[r] = min(comp.get(r, n), n)
        return {n: comp[find(n)] for n in nodes}

    rng = np.random.default_rng(20260820)
    for n_nodes, n_edges in [(30, 15), (60, 60), (50, 120), (200, 80)]:
        a = rng.integers(0, n_nodes, size=n_edges)
        b = rng.integers(0, n_nodes, size=n_edges)
        edges = [
            (f"v{u:03d}", f"v{v:03d}") for u, v in zip(a.tolist(), b.tolist()) if u != v
        ]
        if not edges:
            continue
        nodes = sorted({x for e in edges for x in e})
        expected = union_find_labels(edges, nodes)
        got = _cc(spark, edges)
        assert got == expected, f"mismatch at ({n_nodes},{n_edges})"
