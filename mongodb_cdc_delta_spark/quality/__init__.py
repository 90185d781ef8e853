"""Data-quality policies: validation rules, transformation rules, PII
masking, quality metrics (reference spec FR-057/FR-058/FR-059)."""

from .rules import (
    FieldRename,
    DateConversion,
    MaskRule,
    ValidationRule,
    apply_transformations,
    mask_columns,
    validate_split,
)
from .reliability import CircuitBreaker, CircuitOpenError, RetryConfig, retry_call

__all__ = [
    "ValidationRule",
    "FieldRename",
    "DateConversion",
    "MaskRule",
    "validate_split",
    "apply_transformations",
    "mask_columns",
    "RetryConfig",
    "retry_call",
    "CircuitBreaker",
    "CircuitOpenError",
]
