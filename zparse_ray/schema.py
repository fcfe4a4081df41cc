"""Canonical Arrow schemas for the engine's tables.

Input table (BASELINE.json input_hint):
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

plus a materialized ``partition_id`` lineage column (one input parquet
file per partition; the column is the file's id, dictionary-compressed
to ~nothing) so every downstream stage can key verdicts, checkpoints
and skew handling off one partitioning concept without re-deriving it
from file paths.

The interleaved spans column mirrors the reference's XML DOM — an
ordered sequence of text/element content (reference:
crates/zparse/src/xml/model.rs:20-24); per-row span order is the
observable invariant (kind, text, media_ref, order).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_KINDS = ("text", "json", "jsonc", "csv", "toml", "yaml", "xml", "image", "audio")
TEXT_KINDS = ("text", "json", "jsonc", "csv", "toml", "yaml", "xml")
MEDIA_KINDS = ("image", "audio")
GRAMMAR_KINDS = ("json", "jsonc", "csv", "toml", "yaml", "xml")

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
        ("partition_id", pa.int32()),
    ]
)

ASSETS_SCHEMA = pa.schema(
    [
        ("asset_id", pa.string()),
        ("bytes_len", pa.int64()),
    ]
)

# violation rows: the engine's analog of the reference's positioned
# errors — reference ``Pos`` carries (offset, line, col)
# (crates/zparse/src/error.rs:8-44) and the CLI prints
# ``error at off:line:col``; grammar violations carry the parser's
# 1-based (line, col) alongside the span offset, and non-parse
# violations (order/ref/size/dup/drift) carry (0, 0)
VIOLATIONS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("doc_id", pa.string()),
        ("span_index", pa.int32()),
        ("check_id", pa.string()),
        ("detail", pa.string()),
        ("offset", pa.int32()),
        ("line", pa.int32()),
        ("col", pa.int32()),
    ]
)

# per-partition verdicts: the distributed form of the CLI's "ok" output
# (reference: zparse-cli/src/main.rs:228-229)
VERDICTS_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int32()),
        ("passed", pa.bool_()),
        ("n_docs", pa.int64()),
        ("n_spans", pa.int64()),
        ("n_violations", pa.int64()),
        ("checks_failed", pa.string()),  # comma-joined sorted check ids
    ]
)

PROFILE_SCHEMA = pa.schema(
    [
        ("column", pa.string()),
        ("stat", pa.string()),
        ("value", pa.float64()),
        ("payload", pa.binary()),  # serialized digest/sketch when not scalar
    ]
)
