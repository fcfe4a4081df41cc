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
