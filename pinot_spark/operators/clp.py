"""CLP-style log encoding: message → (logtype, dictionaryVars, encodedVars).

Reference: Pinot's CLP integration
(pinot-core/.../transform/function/CLPDecodeTransformFunction.java:45-55 —
``clpDecode(col_logtype, col_dictionaryVars, col_encodedVars)``;
ingestion side CLPEncodingTransformer). CLP (Compressed Log Processing,
a published USENIX/OSDI system) splits each log message into a static
TEMPLATE (logtype) with placeholders plus two variable columns: dictionary
variables (identifiers — strings with digits/paths) and encoded variables
(numbers). Templates repeat heavily across a log stream, so the logtype
column dictionary-encodes to near nothing and the variables compress as
typed columns — the whole point of the format.

This module implements the same columnar model with the same three-column
layout and the same query surface. The wire encoding is this engine's own
(placeholders ``\\x11`` dict / ``\\x12`` numeric, variables as arrays) —
NOT byte-compatible with the CLP library's binary format (declared;
the library is not in this environment). Encode∘decode is lossless,
asserted by a property test.

Everything is pure Column expressions — regex split/extract JVM-side,
no Python in either path.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# variable-matching rules, CLP-style: numbers become encoded vars;
# tokens containing digits (ids, paths, uuids) become dictionary vars.
# Only CANONICALLY double-representable numerics encode (no leading
# zeros, <=15 integer digits, no trailing fraction zeros, no exponent) —
# everything else stays a dictionary var so decode is text-lossless,
# the same reason CLP's own encoded-var scheme preserves float text.
_NUM_RE = r"[+-]?(?:0|[1-9]\d{0,14})(?:\.\d*[1-9])?"
_DICT_RE = r"[\w./:\-]*\d[\w./:\-]*"
_VAR_RE = f"({_NUM_RE}(?=[^\\w.]|$))|({_DICT_RE})"
_DICT_PLACEHOLDER = "\x11"
_NUM_PLACEHOLDER = "\x12"


def clp_encode_df(
    df: DataFrame, message_col: str, out_prefix: str | None = None
) -> DataFrame:
    """Ingestion-side CLP encoding (CLPEncodingTransformer analog):
    adds ``<prefix>_logtype``, ``<prefix>_dictionaryVars``,
    ``<prefix>_encodedVars`` columns."""
    p = out_prefix or message_col
    msg = F.col(message_col)
    num_token = f"(?<![\\w.]){_NUM_RE}(?=[^\\w.]|$)"
    # stage 1: numerics → \x12 (so dict-var regex can't re-match them)
    stage1 = F.regexp_replace(msg, num_token, _NUM_PLACEHOLDER)
    logtype = F.regexp_replace(stage1, _DICT_RE, _DICT_PLACEHOLDER)
    encoded = F.transform(
        F.regexp_extract_all(msg, F.lit(f"({num_token})"), 1),
        lambda v: v.cast("double"),
    )
    dict_vars = F.regexp_extract_all(stage1, F.lit(f"({_DICT_RE})"), 1)
    return (
        df.withColumn(f"{p}_logtype", logtype)
        .withColumn(f"{p}_dictionaryVars", dict_vars)
        .withColumn(f"{p}_encodedVars", encoded)
    )


def clp_decode(
    logtype: str | Column,
    dictionary_vars: str | Column,
    encoded_vars: str | Column,
    default: str | None = None,
) -> Column:
    """clpDecode(logtype, dictionaryVars, encodedVars[, default]) —
    reassemble the original message
    (CLPDecodeTransformFunction.java:45-55)."""
    lt = F.col(logtype) if isinstance(logtype, str) else logtype
    dv = F.col(dictionary_vars) if isinstance(dictionary_vars, str) else dictionary_vars
    ev = F.col(encoded_vars) if isinstance(encoded_vars, str) else encoded_vars

    # walk the logtype splitting on placeholders; fold both variable
    # arrays back in order. Split keeps empty segments, so segments
    # align 1:1 with placeholder occurrences.
    parts = F.split(lt, f"(?=[{_DICT_PLACEHOLDER}{_NUM_PLACEHOLDER}])")
    folded = F.aggregate(
        parts,
        F.struct(
            F.lit("").alias("acc"), F.lit(0).alias("di"), F.lit(0).alias("ni")
        ),
        lambda st, seg: F.when(
            seg.startswith(_DICT_PLACEHOLDER),
            F.struct(
                F.concat(
                    st["acc"],
                    F.coalesce(F.element_at(dv, st["di"] + 1), F.lit("")),
                    F.substring(seg, 2, 1_000_000),
                ).alias("acc"),
                (st["di"] + 1).alias("di"),
                st["ni"].alias("ni"),
            ),
        )
        .when(
            seg.startswith(_NUM_PLACEHOLDER),
            F.struct(
                F.concat(
                    st["acc"],
                    F.coalesce(_fmt_num(F.element_at(ev, st["ni"] + 1)), F.lit("")),
                    F.substring(seg, 2, 1_000_000),
                ).alias("acc"),
                st["di"].alias("di"),
                (st["ni"] + 1).alias("ni"),
            ),
        )
        .otherwise(
            F.struct(
                F.concat(st["acc"], seg).alias("acc"),
                st["di"].alias("di"),
                st["ni"].alias("ni"),
            )
        ),
        lambda st: st["acc"],
    )
    out = F.when(lt.isNotNull(), folded)
    return out.otherwise(F.lit(default)) if default is not None else out


def _fmt_num(v: Column) -> Column:
    """Render a double back to its shortest text form (ints lose '.0')."""
    as_long = v.cast("long")
    return F.when(
        v.eqNullSafe(as_long.cast("double")), as_long.cast("string")
    ).otherwise(v.cast("string"))
