"""Engine scalar/array functions.

Every function here is a **Column-expression builder** (pure Catalyst, JVM-side,
whole-stage-codegen friendly) or an Arrow-vectorized pandas UDF. No per-row
Python anywhere (input_hint mandate; reference precedent: all math is
whole-matrix numba/torch, SURVEY.md §2.10).

``mel_spark.functions.oracle`` contains the DuckDB-SQL twins of the Column
builders — the pairs are kept textually adjacent and equality-tested in
tests/test_oracle_parity.py so the driver's DuckDB correctness gate and the
Spark engine can never drift.
"""
