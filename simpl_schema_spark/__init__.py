"""simpl_schema_spark — a PySpark-native schema + constraint validation engine.

A from-scratch reimagining of longshotlabs/simpl-schema's declarative schema
surface (types, required/optional, min/max, regex, allowedValues, custom
validators, MongoDB-style update-modifier semantics) as a distributed
validator over Common-Crawl-style web-page tables: every schema rule compiles
to vectorized Spark SQL expressions (pandas/Arrow UDFs only for opaque custom
validators), evaluated in a single per-partition pass that also emits
per-column stats, uniqueness, referential-integrity, and distribution-drift
checks.
"""

from .errors import ErrorTypes, VIOLATION_SCHEMA  # noqa: F401
from .schema import SimpleSchema, oneOf  # noqa: F401


def __getattr__(name):
    # lazy top-level API: importing the package must not require an active
    # SparkSession, so Spark-touching modules load on first use
    # note: the modules are named validation/cleaning (NOT validate/clean) so
    # a submodule import can never clobber these top-level function names
    lazy = {
        "validate": ("simpl_schema_spark.validation", "validate"),
        "with_violations": ("simpl_schema_spark.validation", "with_violations"),
        "violations_table": ("simpl_schema_spark.validation", "violations_table"),
        "ValidationResult": ("simpl_schema_spark.validation", "ValidationResult"),
        "clean": ("simpl_schema_spark.cleaning", "clean"),
        "clean_and_validate": ("simpl_schema_spark.pipeline", "clean_and_validate"),
        "validate_modifier_table": ("simpl_schema_spark.modifiers", "validate_modifier_table"),
        "clean_modifier_table": ("simpl_schema_spark.modifiers", "clean_modifier_table"),
        "spark_rule": ("simpl_schema_spark.compiler", "spark_rule"),
        "hash_sample": ("simpl_schema_spark.sampling", "hash_sample"),
        "stratified_sample": ("simpl_schema_spark.sampling", "stratified_sample"),
        "sequence_chunks": ("simpl_schema_spark.packing", "sequence_chunks"),
        "percentile_filter": ("simpl_schema_spark.ranking", "percentile_filter"),
        "exact_rank_counts": ("simpl_schema_spark.ranking", "exact_rank_counts"),
        "exclusive_prefix_sum": ("simpl_schema_spark.packing", "exclusive_prefix_sum"),
        "keep_best": ("simpl_schema_spark.dedup", "keep_best"),
        "pii_counts": ("simpl_schema_spark.text", "pii_counts"),
        "redact_pii": ("simpl_schema_spark.text", "redact_pii"),
    }
    if name in lazy:
        import importlib

        module, attr = lazy[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__version__ = "0.1.0"
