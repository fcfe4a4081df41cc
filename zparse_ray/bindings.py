"""Structured-boundary bindings — the analog of the reference's WASM
surface (crates/zparse-wasm/src/lib.rs:105-168): the same four exports

- ``convert(input, from_, to)``      -> converted string
- ``convert_csv(input, to, delimiter)`` -> converted string (custom
  single-ASCII-char delimiter, same rejection rules as
  lib.rs:179-211: empty / multi-char / non-ASCII / ``\\n`` ``\\r`` ``"``)
- ``parse(content, format)``         -> JSON string (XML rejected with
  the reference's exact message — lib.rs:146-156)
- ``detect_format(path)``            -> lowercase format name or None

Failures raise :class:`BindingError`, whose ``to_dict()`` is the
reference's serialized JsError shape (lib.rs:11-28)::

    {"kind": <stable kind>, "message": str,
     "span": {"start": {"offset", "line", "col"},
              "end":   {"offset", "line", "col"}} | None}

``kind`` uses the stable 15-kind vocabulary (lib.rs:61-79) — our
ParseError.check_id already IS that vocabulary — plus ``UnknownFormat``
for bad format names (lib.rs:83-89). Divergences (documented): the
reference's errors carry a (start, end) byte span; this engine's carry
one position, so ``start == end`` here. And where the reference maps a
positionless ``Span::empty()`` to ``span: None``, this engine's parse
errors ALWAYS carry a position (offset 0 / 1:1 is a real
start-of-document position, not a sentinel), so ``span: None`` occurs
only for boundary-level errors raised before parsing (UnknownFormat,
delimiter validation, XML-in-parse rejection).
"""

from __future__ import annotations

from .functions.convert import ConvertOptions, detect_format_from_path
from .functions.convert import convert as _convert
from .functions.csv_parser import CsvConfig
from .functions.errors import ParseError

_FORMATS = ("json", "csv", "toml", "yaml", "xml")


class BindingError(Exception):
    """Structured error crossing the binding boundary (JsError parity)."""

    def __init__(self, kind: str, message: str, span: dict | None = None):
        super().__init__(f"{kind}: {message}")
        self.kind = kind
        self.message = message
        self.span = span

    def to_dict(self) -> dict:
        return {"kind": self.kind, "message": self.message, "span": self.span}

    @classmethod
    def from_parse_error(cls, e: ParseError) -> "BindingError":
        pos = {"offset": e.offset, "line": e.line, "col": e.col}
        # single-position engine errors become a zero-width span
        return cls(e.check_id, e.message, {"start": pos, "end": dict(pos)})

    @classmethod
    def unknown_format(cls, fmt: str) -> "BindingError":
        return cls("UnknownFormat", f"Unknown format: {fmt}", None)


def _check_format(fmt: str) -> str:
    # the reference WASM surface accepts exactly the 5 base formats
    # (lib.rs:169-177) — "jsonc" is NOT among them (it reaches the
    # reference only via path detection, which maps .jsonc -> json)
    low = fmt.lower()
    if low not in _FORMATS:
        raise BindingError.unknown_format(fmt)
    return low


def convert(input: str, from_: str, to: str) -> str:
    """Convert between formats (lib.rs:105-112)."""
    f, t = _check_format(from_), _check_format(to)
    try:
        return _convert(input, f, t)
    except ParseError as e:
        raise BindingError.from_parse_error(e) from None


def _check_delimiter(s: str) -> str:
    # rejection rules and messages mirror lib.rs:179-211
    if len(s) == 0:
        raise BindingError("InvalidToken", "CSV delimiter must be a single ASCII character")
    if len(s) > 1:
        raise BindingError("InvalidToken", "CSV delimiter must be a single character")
    if ord(s) > 0x7F:
        raise BindingError("InvalidToken", "CSV delimiter must be an ASCII character")
    if s in ("\n", "\r", '"'):
        raise BindingError(
            "InvalidToken",
            f"CSV delimiter {s!r} conflicts with record separators or quoting rules",
        )
    return s


def convert_csv(input: str, to: str, delimiter: str) -> str:
    """Convert CSV with a custom delimiter (lib.rs:118-132)."""
    t = _check_format(to)
    d = _check_delimiter(delimiter)
    opts = ConvertOptions(csv=CsvConfig(delimiter=d))
    try:
        return _convert(input, "csv", t, opts)
    except ParseError as e:
        raise BindingError.from_parse_error(e) from None


def parse(content: str, format: str) -> str:
    """Parse content to JSON (lib.rs:138-161). XML is rejected here
    exactly like the reference — use convert() instead."""
    f = _check_format(format)
    if f == "xml":
        raise BindingError(
            "InvalidToken",
            "XML parse is not supported in parse(); use convert() instead",
        )
    try:
        return _convert(content, f, "json")
    except ParseError as e:
        raise BindingError.from_parse_error(e) from None


def detect_format(path: str) -> str | None:
    """Detect format from a file path (lib.rs:164-168); lowercase name
    or None."""
    return detect_format_from_path(path)
