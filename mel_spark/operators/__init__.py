"""Engine operators: blocking, candidate-pair scoring, clustering, dedup,
similarity search, alias tables, remaps, evaluation.

Each maps a reference behavior (SURVEY.md §2 inventory ids cited in docstrings)
onto Spark DataFrame primitives — shuffles only where semantically required,
broadcast for small sides, windows for top-R-per-group.
"""
