"""Event-stream API (SURVEY §2.5): the reference exposes pull-based
SAX-style event iterators per format (`next_event`, json/parser.rs:
120-151, toml/parser.rs:88-122, yaml/parser.rs:75-90) with event
vocabularies like ObjectStart/Key/Value/ObjectEnd/ArrayStart/ArrayEnd/
Eof (json/event.rs:7-20).

This engine derives the same event sequence from the parsed DOM rather
than re-implementing incremental pull parsers: per-document inputs are
already in memory as one span, so a pull lexer buys no streaming
benefit here — the distributed streaming happens at the Dataset/block
level. The observable contract (event kinds + order for a given
document) matches the reference's fold: its `parse_value()` folds
exactly this event stream into the DOM, so walking the DOM emits the
inverse, identical sequence.
"""

from __future__ import annotations

from collections.abc import Iterator

from .convert import parse_value

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


def parse_events(text: str, fmt: str) -> Iterator[tuple[str, object]]:
    """Parse `text` as `fmt` and yield its event stream, terminated by
    an Eof event (reference `next_event` returns Eof at end)."""
    value = parse_value(text, fmt)
    yield from iter_events(value)
    yield (EOF, None)
