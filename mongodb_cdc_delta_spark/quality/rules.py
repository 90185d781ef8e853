"""Validation & transformation rules as declarative column expressions.

Re-expresses the reference's spec'd data-quality policies
(specs/001-mongodb-cdc-delta/spec.md FR-057 validation on critical fields,
FR-058 quality metrics, FR-059 field renaming / date conversion / PII
masking; crypto utilities shared/security/crypto.py:17-179) as pure
DataFrame transforms — every rule is a Column predicate or projection, so
the whole rule set stays inside whole-stage codegen with zero Python
per-row cost at 100 TB.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Literal

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class ValidationRule:
    """One critical-field rule (FR-057). ``predicate`` is a SQL boolean
    expression string over the row; rows failing any rule are quarantined
    with rule name + reason."""

    name: str
    predicate: str  # SQL expression; True = valid

    def col(self) -> Column:
        return F.expr(self.predicate)


def validate_split(
    df: DataFrame, rules: list[ValidationRule]
) -> tuple[DataFrame, DataFrame]:
    """(valid, invalid): invalid rows carry `_failed_rules` (array of rule
    names) — the DLQ write adds reason=schema_validation_failed. One pass,
    no shuffle."""
    if not rules:
        return df, df.limit(0).withColumn(
            "_failed_rules", F.lit(None).cast("array<string>")
        )
    failed = F.filter(
        F.array(
            *[
                F.when(~r.col(), F.lit(r.name)).otherwise(F.lit(None))
                for r in rules
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("_failed_rules", failed)
    valid = tagged.where(F.size("_failed_rules") == 0).drop("_failed_rules")
    invalid = tagged.where(F.size("_failed_rules") > 0)
    return valid, invalid


@dataclass(frozen=True)
class FieldRename:
    """FR-059 field renaming."""

    src: str
    dst: str


@dataclass(frozen=True)
class DateConversion:
    """FR-059 ISO8601 ↔ Unix epoch conversion for one column.

    to='unix'  : timestamp/ISO string column → epoch seconds (long)
    to='iso'   : epoch seconds/millis or timestamp → ISO8601 string
    to='timestamp': ISO string or epoch → TimestampType
    """

    column: str
    to: Literal["unix", "iso", "timestamp"]
    assume_millis: bool = False  # for numeric inputs when to != 'unix'


@dataclass(frozen=True)
class MaskRule:
    """FR-059 PII masking. Strategies (reference crypto.py:17-179 ships
    Fernet symmetric encryption + PBKDF2 key derivation + HMAC hashing;
    every strategy here is a JVM column expression — no Python per row):

    - 'hash'    : sha2-256 of the value (deterministic, join-preserving —
                  the HMAC-style pseudonymization of crypto.py:150-179)
    - 'redact'  : constant '***'
    - 'partial' : keep last ``keep_last`` chars, mask the rest
    - 'encrypt' : reversible AES (crypto.py:40-100 encrypt_data/
                  decrypt_data equivalent): base64(aes_encrypt(value, key))
                  with ``unmask_columns`` as the decrypt path. Default GCM
                  with a random IV per value (semantically secure, like
                  Fernet); pass ``iv_hex`` (12-byte IV, hex) to get
                  deterministic output when ciphertext must be
                  join/compare-stable — the documented tradeoff.
    """

    column: str
    strategy: Literal["hash", "redact", "partial", "encrypt"] = "hash"
    keep_last: int = 4
    #: AES key for 'encrypt' (16/24/32-byte string; a deployment derives it
    #: via PBKDF2 exactly like reference generate_key — key service concern)
    key: str | None = None
    aes_mode: str = "GCM"
    iv_hex: str | None = None


def _convert_date(df: DataFrame, rule: DateConversion) -> DataFrame:
    c = F.col(rule.column)
    dtype = df.schema[rule.column].dataType.typeName()
    if rule.to == "unix":
        if dtype in ("timestamp", "timestamp_ntz"):
            out = F.unix_timestamp(c)
        elif dtype == "string":
            out = F.unix_timestamp(F.to_timestamp(c))
        else:  # numeric already epoch
            out = (c / F.lit(1000)).cast("long") if rule.assume_millis else c.cast("long")
    elif rule.to == "timestamp":
        if dtype in ("long", "integer", "bigint", "int", "double"):
            out = (
                F.timestamp_millis(c.cast("long"))
                if rule.assume_millis
                else F.timestamp_seconds(c)
            )
        else:
            out = F.to_timestamp(c)
    else:  # iso
        if dtype in ("long", "integer", "bigint", "int"):
            ts = (
                F.timestamp_millis(c.cast("long"))
                if rule.assume_millis
                else F.timestamp_seconds(c)
            )
        else:
            ts = F.to_timestamp(c)
        out = F.date_format(ts, "yyyy-MM-dd'T'HH:mm:ss")
    return df.withColumn(rule.column, out)


def mask_columns(df: DataFrame, rules: list[MaskRule]) -> DataFrame:
    for r in rules:
        if r.column not in df.columns:
            continue
        c = F.col(r.column).cast("string")
        if r.strategy == "hash":
            out = F.when(c.isNotNull(), F.sha2(c, 256))
        elif r.strategy == "redact":
            out = F.when(c.isNotNull(), F.lit("***"))
        elif r.strategy == "encrypt":
            out = F.when(c.isNotNull(), _aes_encrypt_col(c, r))
        else:
            n = r.keep_last
            out = F.when(
                c.isNotNull(),
                F.concat(
                    F.regexp_replace(
                        F.substring(c, 1, 2_000_000),  # whole string
                        r".(?=.{%d})" % n,
                        "*",
                    )
                ),
            )
        df = df.withColumn(r.column, out)
    return df


def _require_key(r: MaskRule) -> str:
    if not r.key or len(r.key) not in (16, 24, 32):
        raise ValueError(
            f"MaskRule('{r.column}', 'encrypt') needs a 16/24/32-byte key"
        )
    return r.key


def _aes_encrypt_col(c: Column, r: MaskRule) -> Column:
    key = _require_key(r)
    if r.iv_hex is not None:
        enc = F.expr(
            f"aes_encrypt(cast(`{r.column}` as string), '{key}', "
            f"'{r.aes_mode}', 'DEFAULT', unhex('{r.iv_hex}'))"
        )
    else:
        enc = F.aes_encrypt(c, F.lit(key), F.lit(r.aes_mode))
    return F.base64(enc)


def unmask_columns(df: DataFrame, rules: list[MaskRule]) -> DataFrame:
    """Decrypt path for 'encrypt' mask rules (reference crypto.py:71-100
    decrypt_data): base64 → aes_decrypt → original string. Non-encrypt
    strategies are one-way and are left untouched."""
    for r in rules:
        if r.strategy != "encrypt" or r.column not in df.columns:
            continue
        key = _require_key(r)
        out = F.aes_decrypt(
            F.unbase64(F.col(r.column)), F.lit(key), F.lit(r.aes_mode)
        ).cast("string")
        df = df.withColumn(r.column, out)
    return df


def apply_transformations(
    df: DataFrame,
    renames: list[FieldRename] = (),
    date_rules: list[DateConversion] = (),
    mask_rules: list[MaskRule] = (),
) -> DataFrame:
    """FR-059 pipeline: rename → date-convert → mask, all declarative."""
    for r in renames:
        if r.src in df.columns:
            df = df.withColumnRenamed(r.src, r.dst)
    for dr in date_rules:
        if dr.column in df.columns:
            df = _convert_date(df, dr)
    return mask_columns(df, list(mask_rules))


def quality_observe(df: DataFrame, name: str = "quality"):
    """FR-058 quality metrics via the observe() API: row count + per-column
    null counts ride the next action on this frame — no extra scan.

    Returns (df, Observation); after any action on df, ``observation.get``
    yields {'rows': n, 'nulls_<col>': n, ...} (reference
    prometheus_metrics.py events/failure counters)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in df.columns[:20]:  # cap observation width
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nulls_{c}")
        )
    return df.observe(obs, *metrics), obs
