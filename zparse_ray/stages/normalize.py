"""Text normalization — the C4-style hygiene pass that runs before any
hash-keyed operator (exact dedup, line dedup, n-gram ops) so that
byte-level noise doesn't split otherwise-identical content.

Three composable, individually-switchable steps, each ONE C-level
Arrow kernel pass over the column (no per-row Python):

- ``nfc``: Unicode NFC composition — "e + combining accent" and "é"
  become one code point, matching DuckDB's ``nfc_normalize`` exactly
  (the parity test drives both engines). pyarrow 16's
  ``pc.utf8_normalize(form="NFC")`` does NOT compose (verified: a
  decomposed input passes through unchanged), so this is a hybrid:
  ONE C-level RE2 ``\\p{Mn}`` scan finds the rows that contain any
  combining mark (rare in real corpora), and only those few go
  through Python ``unicodedata.normalize`` — the jsonc-C-gate
  pattern: vectorized detection, per-row work only where required.
- ``strip_control``: drop C0/C1 control characters except ``\\t`` and
  ``\\n`` (one RE2 ``replace_substring_regex`` pass). ``\\r`` is
  deliberately IN the removed set (CRLF -> LF).
- ``collapse_ws``: runs of tab/space become one space, and runs of
  blank lines one newline; leading/trailing whitespace trimmed.

A pure per-batch map: zero shuffle, streams at any scale. Nulls pass
through as nulls (normalization must not invent content).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# C0 except \t\n, plus DEL and the C1 block (RE2-safe explicit ranges)
_CONTROL_RE = "[\\x00-\\x08\\x0b-\\x1f\\x7f\\x80-\\x9f]"


def normalize_batch(
    batch: pa.Table,
    *,
    column: str = "text",
    nfc: bool = True,
    strip_control: bool = True,
    collapse_ws: bool = True,
) -> pa.Table:
    col = batch[column]
    if nfc:
        needs = pc.fill_null(
            pc.match_substring_regex(col, pattern="\\p{Mn}"), False
        ).to_numpy(zero_copy_only=False)
        if needs.any():
            import unicodedata

            import numpy as np

            vals = col.to_pandas().to_numpy(dtype=object)
            idx = np.flatnonzero(needs)
            for i in idx:
                vals[i] = unicodedata.normalize("NFC", vals[i])
            col = pa.chunked_array([pa.array(vals, pa.string())])
    if strip_control:
        col = pc.replace_substring_regex(col, pattern=_CONTROL_RE, replacement="")
    if collapse_ws:
        col = pc.replace_substring_regex(col, pattern="[\\t ]+", replacement=" ")
        col = pc.replace_substring_regex(col, pattern=" ?\\n ?", replacement="\n")
        col = pc.replace_substring_regex(col, pattern="\\n+", replacement="\n")
        col = pc.utf8_trim(col, characters=" \n")
    return batch.set_column(batch.schema.get_field_index(column), column, col)


def normalize(ds, *, column: str = "text", **kwargs):
    """Dataset wrapper: streaming normalization pass."""
    return ds.map_batches(
        normalize_batch,
        fn_kwargs={"column": column, **kwargs},
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
