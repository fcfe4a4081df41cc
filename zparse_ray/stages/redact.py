"""PII redaction: replace email / IPv4 / E.164-phone literals in a text
column with typed placeholder tokens, and count redactions per document
— the standard pre-training hygiene pass next to decontamination
(``stages/decontam.py``) and quality filtering.

Scale shape at 100 TB:
- pure per-batch map with NO shuffle: each document is rewritten
  entirely inside its own batch, so the stage streams with
  backpressure like any other ``map_batches`` transform;
- every pattern is applied as ONE C-level RE2 pass over the whole
  Arrow column (``pyarrow.compute.replace_substring_regex`` /
  ``count_substring_regex``) — no Python loop over rows, no Python
  ``re`` at all in the hot path;
- patterns are RE2-safe (no backreferences / lookarounds) and use
  explicit ASCII classes, so DuckDB's RE2 ``regexp_replace(..., 'g')``
  is an exact oracle (tested in ``tests/test_stages.py``).

Pattern order matters and is fixed: emails before phones (an email's
local part may contain digit runs), IPs before phones (dotted quads
contain digit runs). Placeholders are single tokens with no digits or
``@``/dots, so one pattern's output can never create a later match.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# (name, RE2 pattern, replacement token) — applied in order.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "<IP>",
    ),
    (
        "phone",
        r"\+[0-9]{7,15}\b",
        "<PHONE>",
    ),
)


def redact_batch(
    batch: pa.Table,
    column: str = "text",
    *,
    patterns: tuple[tuple[str, str, str], ...] = PII_PATTERNS,
    out_column: str | None = None,
) -> pa.Table:
    """Rewrite ``column`` with placeholders and append one int64
    ``n_<name>`` count per pattern plus ``n_redactions`` (their sum).
    Counts are taken on the text as each pattern sees it (i.e. after
    the previous patterns ran), matching the sequential-replace
    semantics exactly. Null text stays null with zero counts."""
    out_column = out_column or column
    text = batch[column].combine_chunks()
    counts = []
    for _name, pat, token in patterns:
        counts.append(pc.count_substring_regex(text, pattern=pat))
        text = pc.replace_substring_regex(text, pattern=pat, replacement=token)
    total = counts[0]
    for c in counts[1:]:
        total = pc.add(total, c)
    if out_column == column:
        batch = batch.set_column(
            batch.schema.get_field_index(column), column, text
        )
    else:
        batch = batch.append_column(out_column, text)
    for (name, _pat, _tok), c in zip(patterns, counts):
        batch = batch.append_column(
            f"n_{name}", pc.fill_null(pc.cast(c, pa.int64()), 0)
        )
    return batch.append_column(
        "n_redactions", pc.fill_null(pc.cast(total, pa.int64()), 0)
    )


def redact(ds, column: str = "text", **kwargs):
    """Dataset-level wrapper: streaming per-batch redaction."""
    return ds.map_batches(
        lambda t: redact_batch(t, column, **kwargs), batch_format="pyarrow"
    )
