"""The Spark-SQL string twins of the hot text builders (r6 build-time
optimization) must produce byte-identical columns to the Column-API builders
they replace in the ER feature pass."""

from __future__ import annotations

from pyspark.sql import functions as F

from mel_spark.functions import text as T


def _docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "one two"),
        (3, "single"),
        (4, "a a a a a repeated tokens a a"),
        (5, "punct, mix! and? 123 numbers 456 ok"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingle_and_hash_sql_twins(spark):
    docs = _docs(spark)
    col_side = docs.select(
        "doc_id", T.shingles("text", 3).alias("sh")
    ).select("doc_id", T.shingle_int_hashes(F.col("sh")).alias("xs"))
    sql_side = docs.selectExpr(
        "doc_id", f"{T.shingles_sql('text', 3)} AS sh"
    ).selectExpr("doc_id", f"{T.shingle_int_hashes_sql('sh')} AS xs")
    assert [r.asDict() for r in col_side.orderBy("doc_id").collect()] == [
        r.asDict() for r in sql_side.orderBy("doc_id").collect()
    ]


def test_signature_and_band_sql_twins(spark):
    docs = _docs(spark)

    def feats(use_sql: bool):
        sh = docs.select("doc_id", T.shingles("text", 3).alias("sh"))
        xs = sh.select("doc_id", T.shingle_int_hashes(F.col("sh")).alias("xs"))
        if use_sql:
            sig = xs.selectExpr(
                "doc_id", f"{T.minhash_signature_from_ints_sql('xs', 32)} AS sig"
            )
            return sig.selectExpr(
                "doc_id", f"{T.minhash_band_keys_sql('sig', 16, 2)} AS bands"
            )
        sig = xs.select(
            "doc_id", T.minhash_signature_from_ints(F.col("xs"), 32).alias("sig")
        )
        return sig.select(
            "doc_id", T.minhash_band_keys(F.col("sig"), 16, 2).alias("bands")
        )

    a = [r.asDict() for r in feats(False).orderBy("doc_id").collect()]
    b = [r.asDict() for r in feats(True).orderBy("doc_id").collect()]
    assert a == b
