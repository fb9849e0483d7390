"""Generator determinism + planted-cluster structure (FIXTURES.md §1-2)."""

import hashlib

from mel_spark.datagen import GenConfig, generate_repos


def test_deterministic():
    a = generate_repos(GenConfig(n_files=200, seed=42))
    b = generate_repos(GenConfig(n_files=200, seed=42))
    for name in a:
        ha = hashlib.sha256(a[name].to_csv(index=False).encode()).hexdigest()
        hb = hashlib.sha256(b[name].to_csv(index=False).encode()).hexdigest()
        assert ha == hb, name


def test_shape_and_clusters(tiny_tables):
    repos = tiny_tables["repos"]
    ref = tiny_tables["reference_clusters"]
    assert list(repos.columns) == ["repo", "path", "commit", "lang", "content"]
    assert len(repos) == len(ref) == 300
    sizes = ref.groupby("entity_id").size()
    assert (sizes >= 2).any() and (sizes == 1).any()
    # mention_id is unique and sha-shaped
    assert ref["mention_id"].is_unique
    assert ref["mention_id"].str.len().eq(64).all()


def test_write_parquet_is_splittable(tmp_path):
    """Spark assigns parquet scan tasks at row-group granularity; pandas'
    default single ~1Mi-row row group made a 3M-row benchmark input scan
    ≤3-wide at ANY core count. The writer must emit bounded row groups so
    generated corpora parallelize like production multi-file tables."""
    import pyarrow.parquet as pq

    from mel_spark.datagen import write_parquet

    tables = generate_repos(GenConfig(n_files=70_000, seed=7))
    write_parquet(tables, str(tmp_path))
    f = pq.ParquetFile(str(tmp_path / "repos.parquet"))
    assert f.metadata.num_rows == len(tables["repos"]) >= 70_000
    assert f.metadata.num_row_groups >= 2  # pandas default would give 1
    assert all(
        f.metadata.row_group(i).num_rows <= 65536
        for i in range(f.metadata.num_row_groups)
    )


def test_near_dups_are_similar(tiny_tables):
    """Within a planted cluster, token overlap must be high (bounded edits)."""
    repos = tiny_tables["repos"].copy()
    ref = tiny_tables["reference_clusters"]
    repos["entity_id"] = ref["entity_id"].values
    for _, grp in repos.groupby("entity_id"):
        if len(grp) < 2:
            continue
        docs = [set(t.split()) for t in grp["content"]]
        base = docs[0]
        for d in docs[1:]:
            jacc = len(base & d) / len(base | d)
            assert jacc > 0.5, jacc
