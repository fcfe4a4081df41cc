"""Event-stream API (SURVEY §2.5): the reference exposes pull-based
SAX-style event iterators per format (`next_event`, json/parser.rs:
120-151, toml/parser.rs:88-122, yaml/parser.rs:75-90) with event
vocabularies like ObjectStart/Key/Value/ObjectEnd/ArrayStart/ArrayEnd/
Eof (json/event.rs:7-20).

JSON/JSONC get a TRUE pull parser (``JsonEventParser`` /
``iter_json_events``): an iterative state machine over the same
scanner primitives the DOM parser uses, consuming input only as the
caller pulls events — mirroring the reference's `next_event` token
loop (json/parser.rs:119-151; its `parse_value()` is a fold over this
same stream). Errors surface at the event where the offending token is
pulled, with the DOM parser's exact check_ids and positions.

TOML gets a statement-level pull parser in the reference's OWN
vocabulary (``TomlEventParser`` — TableStart/KeyValue,
toml/event.rs:7-12; parse errors surface lazily at the triggering
event; the lexer is eager, see the class docstring). YAML gets
``YamlEventParser`` in the reference YAML vocabulary
(MappingStart/.../SequenceEnd) with EXACT behavioral parity — the
reference's YAML next_event itself parses fully up front and drains a
queue (yaml/parser.rs:75-90). The generic ``parse_events(text, fmt)``
entry point yields the NORMALIZED JSON-style vocabulary for every
format (one uniform stream for cross-format consumers); use the
per-format classes for the reference's native vocabularies.
"""

from __future__ import annotations

from collections.abc import Iterator

from .convert import parse_value
from .errors import EXPECTED, INVALID_TOKEN, MAX_SIZE_EXCEEDED, TRAILING_COMMA, ParseError
from .json_parser import JSONC_CONFIG, JsonConfig, _err as _jerr, _JsonParser
from .toml_parser import DLB, DRB, EQ, LB, RB, EOF as T_EOF, TomlConfig, _TomlParser

# event kinds (json/event.rs:7-20 vocabulary)
OBJECT_START = "ObjectStart"
OBJECT_END = "ObjectEnd"
ARRAY_START = "ArrayStart"
ARRAY_END = "ArrayEnd"
KEY = "Key"
VALUE = "Value"
EOF = "Eof"


def iter_events(value) -> Iterator[tuple[str, object]]:
    """Walk a parsed Value, yielding (event_kind, payload) pairs in the
    order the reference's event stream would produce them."""
    if isinstance(value, dict):
        yield (OBJECT_START, None)
        for k, v in value.items():
            yield (KEY, k)
            yield from iter_events(v)
        yield (OBJECT_END, None)
    elif isinstance(value, list):
        yield (ARRAY_START, None)
        for v in value:
            yield from iter_events(v)
        yield (ARRAY_END, None)
    else:
        yield (VALUE, value)


def _parse_primitive(p: _JsonParser):
    """Primitive-value dispatch with the DOM parser's exact errors
    (containers are handled by the event state machine)."""
    text, pos = p.text, p.pos
    c = text[pos]
    if c == '"':
        return p.parse_string()
    if c == "n":
        if text.startswith("null", pos):
            p.pos = pos + 4
            return None
        raise _jerr(INVALID_TOKEN, "invalid token", text, pos)
    if c == "t":
        if text.startswith("true", pos):
            p.pos = pos + 4
            return True
        raise _jerr(INVALID_TOKEN, "invalid token", text, pos)
    if c == "f":
        if text.startswith("false", pos):
            p.pos = pos + 5
            return False
        raise _jerr(INVALID_TOKEN, "invalid token", text, pos)
    if c == "-" or c.isdigit():
        return p.parse_number()
    raise _jerr(INVALID_TOKEN, "invalid token", text, pos)


def iter_json_events(text: str, config: JsonConfig | None = None) -> Iterator[tuple[str, object]]:
    """TRUE pull-based JSON/JSONC event stream: an iterative state
    machine over the scanner (no recursion, no DOM) that consumes input
    only as events are pulled — the reference's `next_event` contract
    (json/parser.rs:119-151). Yields the json/event.rs vocabulary
    terminated by Eof; raises the DOM parser's exact ParseErrors at the
    offending token. Depth is the live container-stack size, so
    max_depth triggers at the same open token as the DOM parser."""
    cfg = config or JsonConfig()
    if len(text.encode("utf-8", "surrogatepass")) > cfg.max_size:
        raise ParseError(MAX_SIZE_EXCEEDED, f"maximum size exceeded: {cfg.max_size}", 0, 1, 1)
    p = _JsonParser(text, cfg)
    stack: list[str] = []
    state = "value"
    p.skip_ws()
    while True:
        if state == "value":
            if p.pos >= p.n:
                raise _jerr(EXPECTED, "expected value, found end of input", text, p.pos)
            c = text[p.pos]
            if c == "{":
                p.check_depth(len(stack) + 1)
                p.pos += 1
                yield (OBJECT_START, None)
                stack.append("O")
                p.skip_ws()
                if p.pos < p.n and text[p.pos] == "}":
                    p.pos += 1
                    yield (OBJECT_END, None)
                    stack.pop()
                    state = "after"
                else:
                    state = "key"
            elif c == "[":
                p.check_depth(len(stack) + 1)
                p.pos += 1
                yield (ARRAY_START, None)
                stack.append("A")
                p.skip_ws()
                if p.pos < p.n and text[p.pos] == "]":
                    p.pos += 1
                    yield (ARRAY_END, None)
                    stack.pop()
                    state = "after"
                else:
                    state = "arr_value"
            else:
                yield (VALUE, _parse_primitive(p))
                state = "after"
        elif state == "arr_value":
            p.skip_ws()
            if p.pos < p.n and text[p.pos] == "]":
                # only reachable after a comma -> trailing comma
                if cfg.allow_trailing_commas:
                    p.pos += 1
                    yield (ARRAY_END, None)
                    stack.pop()
                    state = "after"
                else:
                    raise _jerr(TRAILING_COMMA, "trailing comma", text, p.pos)
            else:
                state = "value"
        elif state == "key":
            p.skip_ws()
            if p.pos >= p.n:
                raise _jerr(EXPECTED, "expected key, found end of input", text, p.pos)
            if text[p.pos] == "}":
                if cfg.allow_trailing_commas:
                    p.pos += 1
                    yield (OBJECT_END, None)
                    stack.pop()
                    state = "after"
                    continue
                raise _jerr(TRAILING_COMMA, "trailing comma", text, p.pos)
            if text[p.pos] != '"':
                raise _jerr(
                    EXPECTED, f"expected string key, found {text[p.pos]!r}", text, p.pos
                )
            key = p.parse_string()
            yield (KEY, key)
            p.skip_ws()
            if p.pos >= p.n or text[p.pos] != ":":
                raise _jerr(EXPECTED, "expected ':', found other", text, p.pos)
            p.pos += 1
            p.skip_ws()
            state = "value"
        else:  # "after" a completed value
            if not stack:
                p.skip_ws()
                if p.pos != p.n:
                    raise _jerr(
                        EXPECTED, "expected end of input, found trailing content", text, p.pos
                    )
                yield (EOF, None)
                return
            p.skip_ws()
            top = stack[-1]
            if p.pos >= p.n:
                what = "',' or '}'" if top == "O" else "',' or ']'"
                raise _jerr(EXPECTED, f"expected {what}, found end of input", text, p.pos)
            c = text[p.pos]
            if top == "O":
                if c == ",":
                    p.pos += 1
                    state = "key"
                elif c == "}":
                    p.pos += 1
                    yield (OBJECT_END, None)
                    stack.pop()
                else:
                    raise _jerr(EXPECTED, f"expected ',' or '}}', found {c!r}", text, p.pos)
            else:
                if c == ",":
                    p.pos += 1
                    state = "arr_value"
                elif c == "]":
                    p.pos += 1
                    yield (ARRAY_END, None)
                    stack.pop()
                else:
                    raise _jerr(EXPECTED, f"expected ',' or ']', found {c!r}", text, p.pos)


class _PullEvents:
    """Shared `next_event` API shape (reference json/parser.rs:119-151):
    events return one at a time, ``("Eof", None)`` marks the end, and
    ``None`` follows it (the reference returns Ok(None) at EOF).
    Subclasses either set ``self._it`` (an event iterator) or override
    ``next_event`` entirely."""

    _it: Iterator[tuple[str, object]]
    _done = False

    def next_event(self) -> tuple[str, object] | None:
        if self._done:
            return None
        ev = next(self._it, None)
        if ev is None or ev[0] == EOF:
            self._done = True
        return ev

    def __iter__(self) -> Iterator[tuple[str, object]]:
        while (ev := self.next_event()) is not None:
            yield ev


class JsonEventParser(_PullEvents):
    """TRUE pull-based JSON/JSONC `next_event` over iter_json_events —
    input is consumed incrementally as events are pulled."""

    def __init__(self, text: str, config: JsonConfig | None = None, *, jsonc: bool = False):
        self._it = iter_json_events(text, config or (JSONC_CONFIG if jsonc else JsonConfig()))


# TOML event kinds (toml/event.rs:7-12 vocabulary)
TABLE_START = "TableStart"
KEY_VALUE = "KeyValue"


class TomlEventParser(_PullEvents):
    """TRUE pull-based TOML event stream with the reference's own TOML
    vocabulary (toml/event.rs:7-12): ``TableStart {path, is_array}``
    and ``KeyValue {key, value}``, one statement consumed per
    ``next_event()`` call — the reference's `parse()` is literally a
    fold over this stream (toml/parser.rs:88-127). The parser keeps the
    growing DOM so duplicate-key/table conflicts raise at the exact
    event where the reference would raise; the fully-folded root is
    available as ``.root`` after Eof.

    Lazy END-TO-END like the reference (toml/parser.rs:88-122): the
    lexer is a pull generator, so lexical errors AND parse/DOM-fold
    errors (bad headers, duplicate keys, type conflicts) all surface at
    the event whose statement reaches them; construction only checks
    the max_size resource limit."""

    def __init__(self, text: str, config=None):
        cfg = config or TomlConfig()
        if cfg.max_size > 0 and len(text.encode("utf-8", "surrogatepass")) > cfg.max_size:
            raise ParseError(
                MAX_SIZE_EXCEEDED, f"maximum size exceeded: {cfg.max_size}", 0, 1, 1
            )
        self._p = _TomlParser(text, cfg)
        self._done = False
        self._err: ParseError | None = None

    @property
    def root(self) -> dict:
        return self._p.root

    def next_event(self) -> tuple[str, object] | None:
        # error latch (ADVICE r3): once a ParseError propagates, the
        # stream is poisoned — re-polling must re-raise the SAME error,
        # not re-parse from the failed token against the partially
        # folded DOM (which could raise a different error or emit
        # inconsistent events)
        if self._err is not None:
            raise self._err
        if self._done:
            return None
        try:
            return self._next_event_inner()
        except ParseError as e:
            self._err = e
            self._done = True
            raise

    def _next_event_inner(self) -> tuple[str, object] | None:
        p = self._p
        t = p.next_non_nl()
        kind = t[0]
        if kind == T_EOF:
            self._done = True
            return (EOF, None)
        if kind in (LB, DLB):
            is_array = kind == DLB
            path = p.parse_table_header(RB if kind == LB else DRB, t[2])
            if is_array:
                p.ensure_array_table(path, t[2])
            else:
                p.ensure_table(path, t[2])
            p.current_table = path
            p.current_is_array = is_array
            return (TABLE_START, {"path": path, "is_array": is_array})
        key = p.parse_key_path(t)
        p.expect(EQ)
        value = p.parse_value()
        target = (
            p.array_table_last(p.current_table, t[2])
            if p.current_is_array
            else p.table_at(p.current_table, t[2])
        )
        p.insert_dotted(target, key, value, t[2])
        return (KEY_VALUE, {"key": key, "value": value})


# YAML event kinds (yaml/event.rs:7-14 vocabulary)
MAPPING_START = "MappingStart"
MAPPING_END = "MappingEnd"
SEQUENCE_START = "SequenceStart"
SEQUENCE_END = "SequenceEnd"

_YAML_KIND = {
    OBJECT_START: MAPPING_START,
    OBJECT_END: MAPPING_END,
    ARRAY_START: SEQUENCE_START,
    ARRAY_END: SEQUENCE_END,
}


class YamlEventParser(_PullEvents):
    """YAML event stream with the reference's YAML vocabulary
    (MappingStart/MappingEnd/SequenceStart/SequenceEnd/Key/Value,
    yaml/event.rs:7-14). EXACT behavioral parity with the reference,
    which is itself NOT incremental for YAML: its ``next_event`` parses
    the whole document on the first call and then drains a queue of
    events emitted from the folded value (yaml/parser.rs:75-90) — this
    does the same (parse at construction, one event per call)."""

    def __init__(self, text: str, config=None):
        from .yaml_parser import parse_yaml

        value = parse_yaml(text, config) if config is not None else parse_yaml(text)

        def gen():
            for kind, payload in iter_events(value):
                yield (_YAML_KIND.get(kind, kind), payload)
            yield (EOF, None)

        self._it = gen()


def parse_events(text: str, fmt: str) -> Iterator[tuple[str, object]]:
    """Parse `text` as `fmt` and yield its event stream, terminated by
    an Eof event (reference `next_event` returns Eof at end). JSON and
    JSONC stream through the true pull parser; other formats derive the
    stream from the DOM (same observable sequence)."""
    if fmt == "json":
        yield from iter_json_events(text)
        return
    if fmt == "jsonc":
        yield from iter_json_events(text, JSONC_CONFIG)
        return
    value = parse_value(text, fmt)
    yield from iter_events(value)
    yield (EOF, None)
