"""Error taxonomy for the grammar validators.

Mirrors the reference's 16-variant ``ErrorKind`` enum
(reference: crates/zparse/src/error.rs:48-64) plus engine-level check
ids required by the north rule (referential integrity, span order,
drift, uniqueness-at-row-level).  The ``check_id`` strings below are
the vocabulary of the violations table.
"""

from __future__ import annotations

from dataclasses import dataclass

# -- reference-grammar check ids (error.rs:48-64) ------------------------
INVALID_ESCAPE = "InvalidEscapeSequence"
INVALID_UNICODE = "InvalidUnicodeEscape"
UNTERMINATED_STRING = "UnterminatedString"
INVALID_NUMBER = "InvalidNumber"
INVALID_TOKEN = "InvalidToken"
EXPECTED = "Expected"
TRAILING_COMMA = "TrailingComma"
MISSING_COMMA = "MissingComma"
DUPLICATE_KEY = "DuplicateKey"
INVALID_KEY = "InvalidKey"
INVALID_DATETIME = "InvalidDatetime"
INVALID_INLINE_TABLE = "InvalidInlineTable"
INVALID_ARRAY = "InvalidArray"
MAX_DEPTH_EXCEEDED = "MaxDepthExceeded"
MAX_SIZE_EXCEEDED = "MaxSizeExceeded"

# -- engine-level check ids (new; north rule) ----------------------------
REF_INTEGRITY = "RefIntegrity"
SPAN_ORDER = "SpanOrder"
DRIFT = "Drift"
ROUND_TRIP = "RoundTrip"
UNKNOWN_KIND = "UnknownKind"

GRAMMAR_CHECK_IDS = frozenset(
    {
        INVALID_ESCAPE,
        INVALID_UNICODE,
        UNTERMINATED_STRING,
        INVALID_NUMBER,
        INVALID_TOKEN,
        EXPECTED,
        TRAILING_COMMA,
        MISSING_COMMA,
        DUPLICATE_KEY,
        INVALID_KEY,
        INVALID_DATETIME,
        INVALID_INLINE_TABLE,
        INVALID_ARRAY,
        MAX_DEPTH_EXCEEDED,
        MAX_SIZE_EXCEEDED,
    }
)

ENGINE_CHECK_IDS = frozenset({REF_INTEGRITY, SPAN_ORDER, DRIFT, ROUND_TRIP, UNKNOWN_KIND})


@dataclass
class ParseError(Exception):
    """A structured parse/validation failure.

    Carries the check id plus an (offset, line, col) position like the
    reference's ``Error::at`` (error.rs:137-141); line/col are 1-based,
    offset is a 0-based character offset into the payload.
    """

    check_id: str
    message: str
    offset: int = 0
    line: int = 1
    col: int = 1

    def __str__(self) -> str:  # "error at off:line:col: msg"
        return f"error at {self.offset}:{self.line}:{self.col}: {self.message}"


def expected(what: str, found: str, offset: int, line: int, col: int) -> ParseError:
    return ParseError(EXPECTED, f"expected {what}, found {found}", offset, line, col)
