"""Top-level library API surface (reference lib.rs:69-188 parity)."""

import zparse_ray as z


def test_from_str_dispatch():
    assert z.from_str('{"a": 1}', "json") == {"a": 1.0}
    assert z.from_str("a = 1", "toml") == {"a": 1.0}
    assert z.from_str("a: 1", "yaml") == {"a": 1.0}
    assert z.from_str("a\n1\n", "csv") == [{"a": 1.0}]
    assert z.from_str("<r>t</r>", "xml").root.children == ["t"]


def test_format_specific_entrypoints():
    assert z.from_json_str("[1]") == [1.0]
    assert z.from_jsonc_str("[1,] // c") == [1.0]
    assert z.from_csv_str_with_delimiter("a;b\n1;2\n", ";") == [{"a": 1.0, "b": 2.0}]
    assert z.from_toml_str("x = true") == {"x": True}
    assert z.from_yaml_str("x: [1, 2]") == {"x": [1.0, 2.0]}
    assert z.from_xml_str("<a b='c'/>").root.attributes == {"b": "c"}


def test_convert_and_detect():
    assert z.convert('{"a": 1}', "json", "toml") == "a = 1"
    assert z.detect_format_from_path("x.yml") == "yaml"


# -- event-stream API (SURVEY §2.5, ref json/parser.rs:120-151) ------------

def test_event_stream_vocabulary_and_order():
    from zparse_ray.functions.events import parse_events

    evts = list(parse_events('{"a": [1, true], "b": null}', "json"))
    assert evts == [
        ("ObjectStart", None),
        ("Key", "a"),
        ("ArrayStart", None),
        ("Value", 1.0),
        ("Value", True),
        ("ArrayEnd", None),
        ("Key", "b"),
        ("Value", None),
        ("ObjectEnd", None),
        ("Eof", None),
    ]


def test_event_stream_toml_and_scalar_root():
    from zparse_ray.functions.events import parse_events

    assert list(parse_events("42", "json")) == [("Value", 42.0), ("Eof", None)]
    evts = list(parse_events('k = { x = 1 }\n', "toml"))
    assert evts[0] == ("ObjectStart", None) and evts[-1] == ("Eof", None)
    assert ("Key", "x") in evts


# -- true pull-based JSON event parser (reference next_event parity) -------

def test_pull_events_match_dom_derived():
    from zparse_ray.functions.events import EOF, iter_events, iter_json_events
    from zparse_ray.functions.json_parser import JSONC_CONFIG, parse_json, parse_jsonc

    valid = [
        "1", ' "x" ', "null", "true", "[]", "{}", "[1,2,3]", '{"a":1}',
        '{"a": {"b": [1, {"c": null}]}, "d": [true, false, "s"]}',
        "[[[[1]]]]", '{"k": []}', ' [ { "a" : [ ] } , 2.5e3 ] ',
        '"\\u0041\\n"', "[-0.5, 1e-3, 0]",
    ]
    for doc in valid:
        dom = list(iter_events(parse_json(doc))) + [(EOF, None)]
        assert list(iter_json_events(doc)) == dom, doc
    for doc in ["[1, 2, ]", '{"a": 1,}', "// c\n[1]", '/*x*/ {"a"/*y*/: 1}']:
        dom = list(iter_events(parse_jsonc(doc))) + [(EOF, None)]
        assert list(iter_json_events(doc, JSONC_CONFIG)) == dom, doc


def test_pull_events_error_parity_with_dom_parser():
    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import iter_json_events
    from zparse_ray.functions.json_parser import JsonConfig, parse_json

    invalid = [
        "", "[1,]", '{"a" 1}', "{a: 1}", "[1 2]", '{"a":}', "[", "{", '{"a"',
        "1 2", "[truex]", '"unterminated', "[01]", '{"a":1,,}', "]", ",",
        "[1}", '["\\q"]',
    ]
    for doc in invalid:
        try:
            parse_json(doc)
            e_dom = None
        except ParseError as e:
            e_dom = (e.check_id, e.offset)
        try:
            list(iter_json_events(doc))
            e_pull = None
        except ParseError as e:
            e_pull = (e.check_id, e.offset)
        assert e_dom == e_pull, (doc, e_dom, e_pull)
    # max_depth fires at the same open token as the DOM slow path
    deep = "[" * 200 + '"\\n"' + "]" * 200
    cfg = JsonConfig(max_depth=100)
    for fn in (lambda: parse_json(deep, cfg), lambda: list(iter_json_events(deep, cfg))):
        try:
            fn()
            raise AssertionError("expected MaxDepthExceeded")
        except ParseError as e:
            assert (e.check_id, e.offset) == ("MaxDepthExceeded", 100)


def test_pull_events_are_incremental():
    from itertools import islice

    from zparse_ray.functions.events import EOF, JsonEventParser, iter_json_events

    # the malformed tail is never lexed when the caller stops pulling —
    # proof the stream is pull-based, not DOM-derived
    lazy = iter_json_events("[1, 2, " + "x" * 5 + "]")
    assert [k for k, _ in islice(lazy, 3)] == ["ArrayStart", "Value", "Value"]

    p = JsonEventParser('{"a": [1]}')
    evs = []
    while (ev := p.next_event()) is not None:
        evs.append(ev)
    assert [k for k, _ in evs] == [
        "ObjectStart", "Key", "ArrayStart", "Value", "ArrayEnd", "ObjectEnd", "Eof",
    ]
    assert p.next_event() is None  # reference: Ok(None) after Eof


def test_toml_pull_events_fold_to_dom():
    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import EOF, KEY_VALUE, TABLE_START, TomlEventParser
    from zparse_ray.functions.toml_parser import parse_toml

    doc = (
        'top = 1\n[server]\nhost = "x"\nport = 8001\n'
        '[[jobs]]\nname = "a"\n[[jobs]]\nname = "b"\nnested.key = 2\n'
    )
    p = TomlEventParser(doc)
    evs = list(p)
    kinds = [k for k, _ in evs]
    assert kinds == [
        KEY_VALUE, TABLE_START, KEY_VALUE, KEY_VALUE,
        TABLE_START, KEY_VALUE, TABLE_START, KEY_VALUE, KEY_VALUE, EOF,
    ]
    assert evs[1][1] == {"path": ["server"], "is_array": False}
    assert evs[4][1] == {"path": ["jobs"], "is_array": True}
    assert evs[-2][1] == {"key": ["nested", "key"], "value": 2.0}
    # the fold IS the reference's parse(): root matches parse_toml
    assert p.root == parse_toml(doc)
    assert p.next_event() is None

    # parse-level errors are LAZY: the first statement's event is
    # delivered before the duplicate-key statement raises
    bad = "a = 1\na = 2\n"
    try:
        parse_toml(bad)
        raise AssertionError("expected dup error")
    except ParseError as e:
        expect = (e.check_id, e.offset)
    q = TomlEventParser(bad)
    assert q.next_event()[0] == KEY_VALUE
    import pytest

    with pytest.raises(ParseError) as ei:
        while q.next_event() is not None:
            pass
    assert (ei.value.check_id, ei.value.offset) == expect


def test_toml_pull_events_lazy_lexing_parity():
    """Reference parity (toml/parser.rs:88-122): the lexer is lazy, so
    (a) events before a LEXICAL error are delivered first, and (b) a
    parse error earlier in the document wins over a lexical error later
    in it."""
    import pytest

    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import KEY_VALUE, TomlEventParser
    from zparse_ray.functions.toml_parser import parse_toml

    p = TomlEventParser("x = 1\ny = @@@\n")  # lexical error on stmt 2
    assert p.next_event()[0] == KEY_VALUE
    with pytest.raises(ParseError) as ei:
        p.next_event()
    assert ei.value.check_id == "InvalidToken"

    with pytest.raises(ParseError) as ei:
        parse_toml("a = 1\na = 2\nb = @@@\n")
    assert ei.value.check_id == "DuplicateKey"  # not the later InvalidToken


def test_toml_pull_events_error_latches():
    """Re-polling after a ParseError re-raises the SAME error — the
    stream never re-parses from the failed token against the partially
    folded DOM (ADVICE r3)."""
    import pytest

    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import TomlEventParser

    q = TomlEventParser("a = 1\na = 2\nb = 3\n")
    assert q.next_event() is not None
    with pytest.raises(ParseError) as first:
        q.next_event()
    with pytest.raises(ParseError) as again:
        q.next_event()
    assert again.value is first.value


def test_yaml_events_use_reference_vocabulary():
    from zparse_ray.functions.events import EOF, YamlEventParser

    doc = "server:\n  host: x\n  ports:\n    - 1\n    - 2\n"
    evs = list(YamlEventParser(doc))
    assert [k for k, _ in evs] == [
        "MappingStart", "Key", "MappingStart", "Key", "Value", "Key",
        "SequenceStart", "Value", "Value", "SequenceEnd",
        "MappingEnd", "MappingEnd", EOF,
    ]
    p = YamlEventParser("a: 1\n")
    assert p.next_event() == ("MappingStart", None)
    while p.next_event() is not None:
        pass
    assert p.next_event() is None


def test_top_level_events_dispatch():
    import zparse_ray as z

    assert [k for k, _ in z.events('{"a": 1}', "json")] == [
        "ObjectStart", "Key", "Value", "ObjectEnd", "Eof",
    ]
    assert [k for k, _ in z.events("a = 1\n", "toml")] == ["KeyValue", "Eof"]
    assert [k for k, _ in z.events("a: 1\n", "yaml")][0] == "MappingStart"
    import pytest

    with pytest.raises(ValueError):
        z.events("x", "csv")
