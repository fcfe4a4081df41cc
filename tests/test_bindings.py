"""Structured-boundary bindings — parity with the reference WASM
surface (crates/zparse-wasm/src/lib.rs:105-168 exports, :214-394 test
coverage, :11-89 error shape)."""

import pytest

from zparse_ray.bindings import BindingError, convert, convert_csv, detect_format, parse


def test_convert_matrix_smoke():
    out = convert('{"name": "John", "age": 30}', "json", "toml")
    assert "name" in out and "John" in out
    out = convert("name,age\nJane,20\n", "csv", "json")
    assert "Jane" in out and "20" in out
    out = convert('{"name": "Jane"}', "json", "yaml")
    assert "name" in out and "Jane" in out
    out = convert('name = "Tom"\nage = 25\n', "toml", "json")
    assert "Tom" in out and "25" in out
    out = convert("name: Alice\n", "yaml", "json")
    assert "Alice" in out


def test_json_identity_fast_path():
    # reference: convert(json, json) returns the input unchanged
    src = '{"a":  1,\n "b": [2]}'
    assert convert(src, "json", "json") == src


def test_parse_to_json_and_xml_rejected():
    assert "Test" in parse('{"t": "Test"}', "json")
    assert "42" in parse("v = 42\n", "toml")
    assert "data" in parse("k: data\n", "yaml")
    out = parse("name,age\nSam,21\n", "csv")
    assert "Sam" in out and "21" in out
    with pytest.raises(BindingError) as ei:
        parse("<a>1</a>", "xml")
    assert ei.value.kind == "InvalidToken"
    assert "use convert() instead" in ei.value.message
    # XML still converts
    assert "1" in convert("<a>1</a>", "xml", "json")


def test_unknown_format_error_shape():
    with pytest.raises(BindingError) as ei:
        convert("{}", "invalid", "json")
    d = ei.value.to_dict()
    assert d == {
        "kind": "UnknownFormat",
        "message": "Unknown format: invalid",
        "span": None,
    }
    # jsonc is NOT a WASM-surface format name (lib.rs:169-177)
    with pytest.raises(BindingError):
        parse("{}", "jsonc")


def test_parse_error_carries_span():
    with pytest.raises(BindingError) as ei:
        convert('{"a": 1,,}', "json", "toml")
    d = ei.value.to_dict()
    assert d["kind"] in ("InvalidToken", "Expected", "TrailingComma", "MissingComma")
    span = d["span"]
    assert set(span) == {"start", "end"}
    assert set(span["start"]) == {"offset", "line", "col"}
    assert span["start"] == span["end"]  # single-position engine errors
    assert span["start"]["line"] >= 1 and span["start"]["col"] >= 1

    with pytest.raises(BindingError) as ei:
        convert("a = 1\na = 2\n", "toml", "json")
    assert ei.value.kind == "DuplicateKey"


def test_convert_csv_delimiter_rules():
    out = convert_csv("a;b\n1;2\n", "json", ";")
    assert '"a"' in out or "a" in out
    for bad, msg in [
        ("", "single ASCII character"),
        (";;", "single character"),
        ("é", "ASCII character"),
        ("\n", "conflicts with record separators"),
        ('"', "conflicts with record separators"),
    ]:
        with pytest.raises(BindingError) as ei:
            convert_csv("a;b\n", "json", bad)
        assert ei.value.kind == "InvalidToken"
        assert msg in ei.value.message


def test_detect_format():
    assert detect_format("file.json") == "json"
    assert detect_format("file.jsonc") == "json"  # reference: Jsonc -> Json
    assert detect_format("data.CSV") == "csv"
    assert detect_format("cfg.toml") == "toml"
    assert detect_format("cfg.yaml") == "yaml"
    assert detect_format("cfg.yml") == "yaml"
    assert detect_format("doc.xml") == "xml"
    assert detect_format("notes.txt") is None
