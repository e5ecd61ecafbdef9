"""Declarative analytics plans (the SQL/DataFrame surface the reference lacks
— SURVEY.md §2.3-2.8 list it as absent; it is required by the driver's
correctness gate and is a first-class capability of this engine).

Each module exposes ``QUERIES: dict[name, (spark, sf_dir) -> DataFrame]`` and
``ORACLES: dict[name, ansi_sql]`` consumed by ``__spark_entry__``.
"""
