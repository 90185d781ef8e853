"""Dynamic schema system: inference, widening merge, compatibility.

Re-expresses (Spark StructType instead of PyArrow):
- reference delta-writer/src/transformers/schema_inferrer.py (infer/merge/
  modes/validation)
- reference delta-writer/src/transformers/type_resolver.py (widening matrix,
  strategies, safety checks)
- reference delta-writer/src/transformers/bson_to_delta.py:172-263 (numeric
  hierarchy, list/struct recursive merge, string fallback)
"""

from .types import (
    MergeMode,
    SchemaEvolutionError,
    cast_to_schema,
    is_widening_safe,
    merge_schemas,
    merge_types,
    schema_diff,
    validate_schema_compatibility,
)

__all__ = [
    "MergeMode",
    "SchemaEvolutionError",
    "merge_types",
    "merge_schemas",
    "cast_to_schema",
    "schema_diff",
    "validate_schema_compatibility",
    "is_widening_safe",
]
