"""YAML subset grammar tests mirroring the reference's yaml fixture
corpus and yaml_parser_tests.rs semantics."""

import pytest

from zparse_ray.functions.errors import ParseError
from zparse_ray.functions.yaml_parser import YamlConfig, parse_yaml


def err_id(text, **kw):
    with pytest.raises(ParseError) as ei:
        parse_yaml(text, **kw)
    return ei.value.check_id


def test_basic_mapping():
    v = parse_yaml("name: John\nage: 30\nactive: true\n")
    assert v == {"name": "John", "age": 30.0, "active": True}


def test_nested_mapping_and_sequence():
    v = parse_yaml("person:\n  name: Jane\n  skills:\n    - rust\n    - yaml\n")
    assert v == {"person": {"name": "Jane", "skills": ["rust", "yaml"]}}


def test_top_level_sequence():
    assert parse_yaml("- one\n- two\n- three\n") == ["one", "two", "three"]


def test_flow_collections():
    v = parse_yaml("point: { x: 1, y: 2 }\nnums: [1, 2, 3]\n")
    assert v == {"point": {"x": 1.0, "y": 2.0}, "nums": [1.0, 2.0, 3.0]}


def test_nested_flow():
    v = parse_yaml("m: {a: [1, {b: 2}], c: []}\n")
    assert v == {"m": {"a": [1.0, {"b": 2.0}], "c": []}}


def test_scalar_typing():
    v = parse_yaml("a: null\nb: ~\nc: True\nd: FALSE\ne: 5\nf: -2.5\ng: 1e3\nh: hello\n")
    assert v == {"a": None, "b": None, "c": True, "d": False, "e": 5.0, "f": -2.5, "g": 1000.0, "h": "hello"}


def test_inf_nan_stay_strings():
    v = parse_yaml("a: inf\nb: .inf\nc: nan\nd: -.inf\n")
    assert v == {"a": "inf", "b": ".inf", "c": "nan", "d": "-.inf"}


def test_quoted_never_coerced():
    v = parse_yaml('a: "5"\nb: \'true\'\nc: "null"\n')
    assert v == {"a": "5", "b": "true", "c": "null"}


def test_double_quote_escapes():
    v = parse_yaml('a: "x\\ny"\nb: "q\\"w"\n')
    assert v == {"a": "x\ny", "b": 'q"w'}


def test_single_quote_doubling():
    assert parse_yaml("a: 'it''s'\n") == {"a": "it's"}


def test_comments_stripped():
    v = parse_yaml("# top\na: 1 # trailing\nb: \"has # inside\"\n")
    assert v == {"a": 1.0, "b": "has # inside"}


def test_empty_doc_is_null():
    assert parse_yaml("") is None
    assert parse_yaml("# just a comment\n\n") is None


def test_scalar_doc():
    assert parse_yaml("hello\n") == "hello"
    assert parse_yaml("42\n") == 42.0


def test_null_value_for_empty():
    v = parse_yaml("a:\nb: 1\n")
    assert v == {"a": None, "b": 1.0}


def test_sequence_of_mappings():
    v = parse_yaml("- name: a\n  age: 1\n- name: b\n  age: 2\n")
    assert v == [{"name": "a", "age": 1.0}, {"name": "b", "age": 2.0}]


def test_sequence_nested_block():
    v = parse_yaml("-\n  x: 1\n- 2\n")
    assert v == [{"x": 1.0}, 2.0]


def test_duplicate_key():
    assert err_id("key: 1\nkey: 2\n") == "DuplicateKey"
    assert err_id("m: {x: 1, x: 2}\n") == "DuplicateKey"


def test_bad_indent():
    assert err_id("root:\n   child: 1\n  sibling: 2\n") == "InvalidToken"


def test_tab_indent():
    assert err_id("a: 1\n\tb: 2\n") == "InvalidToken"


def test_unterminated_quote():
    assert err_id('name: "unterminated\n') == "UnterminatedString"


def test_unterminated_flow():
    assert err_id("nums: [1, 2, 3\n") == "InvalidToken"


def test_missing_flow_value():
    assert err_id("point: { x: 1, y: }\n") == "InvalidToken"


def test_multiword_scalar():
    # documented divergence: joined into one string (reference errors)
    assert parse_yaml("msg: hello world\n") == {"msg": "hello world"}


def test_url_value():
    assert parse_yaml("url: http://example.com/x\n") == {"url": "http://example.com/x"}


def test_max_depth():
    deep = "\n".join("  " * i + f"k{i}:" for i in range(130)) + "\n" + "  " * 130 + "leaf: 1\n"
    assert err_id(deep) == "MaxDepthExceeded"
    cfg = YamlConfig(max_depth=2)
    assert err_id("a:\n  b:\n    c: 1\n", config=cfg) == "MaxDepthExceeded"


def test_key_order_preserved():
    v = parse_yaml("z: 1\na: 2\nm: 3\n")
    assert list(v.keys()) == ["z", "a", "m"]
