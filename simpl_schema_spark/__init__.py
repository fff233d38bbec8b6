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

__version__ = "0.1.0"
