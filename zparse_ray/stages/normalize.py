"""Text normalization — the C4-style hygiene pass that runs before any
hash-keyed operator (exact dedup, line dedup, n-gram ops) so that
byte-level noise doesn't split otherwise-identical content.

Steps, in an order chosen so the full pass is IDEMPOTENT (stripping a
control character can splice a base char against a combining mark, so
composition must run after the strip, never before):

1. line terminators: ``\\r\\n``, lone ``\\r`` and C1 NEL all become
   ``\\n`` (one RE2 pass) — deleting them instead would merge the
   words on either side of a classic-Mac line break.
2. ``strip_control``: drop the remaining C0/C1 control characters
   except ``\\t`` and ``\\n`` (one RE2 pass).
3. ``nfc``: Unicode NFC composition, matching DuckDB's
   ``nfc_normalize`` exactly (the parity test drives both engines).
   pyarrow 16's ``pc.utf8_normalize(form="NFC")`` does NOT compose
   (verified: decomposed input passes through unchanged), so this is
   a hybrid: ONE C-level RE2 scan finds rows containing any non-ASCII
   byte (ASCII is NFC by definition), and only those rows reach
   Python's C-implemented ``unicodedata.is_normalized`` quick check /
   ``normalize`` — the jsonc-C-gate pattern: vectorized detection,
   per-row work only where required. (An ``\\p{Mn}``-only gate would
   miss compositions with no combining mark — Hangul jamo, Mc matras,
   singletons like U+212B.) The rebuilt column keeps the input's
   exact Arrow type (string vs large_string), so block schemas stay
   uniform across a dataset.
4. ``collapse_ws``: runs of tab/space become one space, runs of blank
   lines one newline, leading/trailing whitespace trimmed.

Nulls pass through as nulls (normalization must not invent content).
Every vectorized step is one Arrow RE2 kernel pass; the stage is a
pure per-batch map — zero shuffle, streams at any scale.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# C0 except \t\n, plus DEL and the C1 block; \r and NEL (\x85) are
# handled by the line-terminator mapping before this strip runs
_CONTROL_RE = "[\\x00-\\x08\\x0b-\\x1f\\x7f\\x80-\\x9f]"
_LINE_TERM_RE = "\\r\\n|\\r|\\x85"
_NON_ASCII_RE = "[^\\x00-\\x7f]"


def _nfc_column(col, out_type: pa.DataType):
    """Hybrid NFC: RE2 non-ASCII gate -> quick check -> normalize."""
    import unicodedata

    needs = pc.fill_null(
        pc.match_substring_regex(col, pattern=_NON_ASCII_RE), False
    ).to_numpy(zero_copy_only=False)
    if not needs.any():
        return col
    vals = col.to_pandas().to_numpy(dtype=object)
    for i in np.flatnonzero(needs):
        if not unicodedata.is_normalized("NFC", vals[i]):
            vals[i] = unicodedata.normalize("NFC", vals[i])
    return pa.chunked_array([pa.array(vals, out_type)])


def normalize_batch(
    batch: pa.Table,
    *,
    column: str = "text",
    nfc: bool = True,
    strip_control: bool = True,
    collapse_ws: bool = True,
) -> pa.Table:
    col = batch[column]
    out_type = batch.schema.field(column).type
    if strip_control:
        col = pc.replace_substring_regex(col, pattern=_LINE_TERM_RE, replacement="\n")
        col = pc.replace_substring_regex(col, pattern=_CONTROL_RE, replacement="")
    if nfc:
        col = _nfc_column(col, out_type)
    if collapse_ws:
        col = pc.replace_substring_regex(col, pattern="[\\t ]+", replacement=" ")
        col = pc.replace_substring_regex(col, pattern=" ?\\n ?", replacement="\n")
        col = pc.replace_substring_regex(col, pattern="\\n+", replacement="\n")
        col = pc.utf8_trim(col, characters=" \n")
    if not isinstance(col, pa.ChunkedArray) or col.type != out_type:
        col = pc.cast(col, out_type)
    return batch.set_column(batch.schema.get_field_index(column), column, col)


def normalize(ds, *, column: str = "text", **kwargs):
    """Dataset wrapper: streaming normalization pass."""
    return ds.map_batches(
        normalize_batch,
        fn_kwargs={"column": column, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
