"""Conversion matrix + serializer tests (reference: convert_tests.rs,
csv_tests.rs conversions) and property-based round-trip tests
(reference: property_tests.rs:89-219, toml/yaml variants) — the
reference's own parity oracle, reused later as the distributed
span-sequence equality check."""

import math
import random

import pytest

from zparse_ray.functions.convert import (
    convert,
    detect_format_from_path,
    format_f64,
    parse_value,
    serialize_json,
    serialize_toml,
    serialize_value,
    serialize_xml,
    serialize_yaml,
    value_to_xml,
    xml_to_value,
)
from zparse_ray.functions.json_parser import JSONC_CONFIG, JsonConfig, parse_json
from zparse_ray.functions.toml_parser import parse_toml
from zparse_ray.functions.xml_parser import parse_xml
from zparse_ray.functions.yaml_parser import parse_yaml
from zparse_ray.value import values_equal


def test_format_detection():
    assert detect_format_from_path("x.JSON") == "json"
    assert detect_format_from_path("x.jsonc") == "json"
    assert detect_format_from_path("x.yml") == "yaml"
    assert detect_format_from_path("x.unknown") is None
    assert detect_format_from_path("noext") is None


def test_format_f64_rust_display_parity():
    assert format_f64(3.0) == "3"
    assert format_f64(-0.0) == "-0"
    assert format_f64(0.1) == "0.1"
    assert format_f64(1e20) == "100000000000000000000"
    assert format_f64(1e-7) == "0.0000001"
    assert format_f64(-2.5) == "-2.5"


def test_serialize_json_compact():
    v = {"a": 1.0, "b": [True, None, "x\n"], "c": {"d": 2.5}}
    assert serialize_json(v) == '{"a":1,"b":[true,null,"x\\n"],"c":{"d":2.5}}'


def test_serialize_json_nonfinite_null():
    assert serialize_json(float("nan")) == "null"
    assert serialize_json(float("inf")) == "null"


def test_identity_fast_path():
    assert convert('{"a": 1,}ILLEGAL', "json", "json") == '{"a": 1,}ILLEGAL'  # untouched


def test_jsonc_normalization():
    from zparse_ray.functions.convert import ConvertOptions

    out = convert('{"a": 1, /* c */ }', "json", "json", ConvertOptions(json=JSONC_CONFIG))
    assert out == '{"a":1}'


def test_json_to_yaml():
    out = convert('{"a": 1, "b": {"c": [1, 2]}}', "json", "yaml")
    assert out == 'a: 1\nb:\n  c:\n    - 1\n    - 2'


def test_json_to_toml():
    out = convert('{"t": "x", "n": {"a": 1}}', "json", "toml")
    assert out == 't = "x"\nn = {a = 1}'


def test_csv_to_json():
    out = convert("a,b\n1,hi\n", "csv", "json")
    assert out == '[{"a":1,"b":"hi"}]'


def test_csv_to_toml_rows_wrap():
    out = convert("a\n1\n", "csv", "toml")
    assert out == "rows = [{a = 1}]"


def test_json_to_csv_header_union():
    out = convert('[{"a": 1}, {"b": "x"}, {"a": 2, "c": true}]', "json", "csv")
    assert out == 'a,b,c\n1,,\n,"x",\n2,,true\n'


def test_csv_string_cells_force_quoted():
    out = convert('[{"s": "plain", "n": 5}]', "json", "csv")
    assert out == 's,n\n"plain",5\n'


def test_csv_integral_float_format():
    out = convert('[{"x": 3.0, "y": 2.5}]', "json", "csv")
    assert out == "x,y\n3,2.5\n"


def test_json_to_xml():
    out = convert('{"a": {"b": "t"}}', "json", "xml")
    assert out == "<root><a><b>t</b></a></root>"


def test_xml_to_json_conventions():
    out = convert('<r id="1">hello<c>x</c></r>', "xml", "json")
    assert out == '{"r":{"@attributes":{"id":"1"},"#text":"hello","c":{"#text":"x"}}}'


def test_xml_repeated_children_collapse():
    v = xml_to_value(parse_xml("<r><i>1</i><i>2</i></r>"))
    assert v == {"r": {"i": {"#text": "1"}, "i_2": {"#text": "2"}}} or v == {
        "r": {"i": [{"#text": "1"}, {"#text": "2"}]}
    }
    assert v == {"r": {"i": [{"#text": "1"}, {"#text": "2"}]}}


def test_xml_attributes_round_trip():
    out = convert('{"e": {"@attributes": {"k": "v"}, "#text": "t"}}', "json", "xml")
    assert out == '<root><e k="v">t</e></root>'


def test_csv_xml_row_paths():
    out = convert("a,b\n1,x\n", "csv", "xml")
    assert out == "<root><row><a>1</a><b>x</b></row></root>"
    back = convert(out, "xml", "csv")
    assert back == 'a,b\n1,"x"\n'


def test_array_to_xml_flattens():
    out = convert('[1, "two"]', "json", "xml")
    assert out == "<root>1two</root>"


def test_xml_entity_escaping():
    out = convert('{"a": "x<&>\\"\'"}', "json", "xml")
    assert out == "<root><a>x&lt;&amp;&gt;&quot;&apos;</a></root>"


def test_toml_root_must_be_object():
    from zparse_ray.functions.errors import ParseError

    with pytest.raises(ParseError):
        serialize_toml([1.0])


def test_toml_null_and_nonfinite():
    assert serialize_toml({"a": None, "b": float("nan")}) == 'a = ""\nb = nan'


def test_yaml_serializer_block_style():
    v = {"a": [1.0, {"b": 2.0}], "s": "x"}
    assert serialize_yaml(v) == 'a:\n  - 1\n  - b: 2\ns: "x"'


# -- property-based round-trips (reference: property_tests.rs) -------------

def _rand_value(rng: random.Random, depth: int):
    kinds = ["null", "bool", "num", "str"]
    if depth < 4:
        kinds += ["arr", "obj", "obj"]
    k = rng.choice(kinds)
    if k == "null":
        return None
    if k == "bool":
        return rng.random() < 0.5
    if k == "num":
        return round(rng.uniform(-1e6, 1e6), rng.randint(0, 6))
    if k == "str":
        n = rng.randint(0, 12)
        alphabet = "abcXYZ 0123_\n\t\"\\é☃"
        return "".join(rng.choice(alphabet) for _ in range(n))
    if k == "arr":
        return [_rand_value(rng, depth + 1) for _ in range(rng.randint(0, 5))]
    keys = [f"k{i}_{rng.randint(0, 999)}" for i in range(rng.randint(0, 5))]
    return {key: _rand_value(rng, depth + 1) for key in keys}


def test_json_round_trip_property():
    rng = random.Random(42)
    for _ in range(300):
        v = _rand_value(rng, 0)
        s = serialize_json(v)
        assert values_equal(parse_json(s), v), s


def _has_empty_container(v) -> bool:
    if isinstance(v, list):
        return not v or any(_has_empty_container(x) for x in v)
    if isinstance(v, dict):
        return not v or any(_has_empty_container(x) for x in v.values())
    return False


def test_yaml_round_trip_property():
    # empty containers are lossy in the block-style serializer by design
    # (they render as '' and reparse as null) — skip them, as the
    # reference's own proptest corpus effectively does
    rng = random.Random(43)
    for _ in range(300):
        v = _rand_value(rng, 0)
        if not isinstance(v, (dict, list)) or _has_empty_container(v):
            continue
        s = serialize_yaml(v)
        assert values_equal(parse_yaml(s), v), s


def test_toml_round_trip_property():
    rng = random.Random(44)
    for _ in range(300):
        v = _rand_value(rng, 0)
        if not isinstance(v, dict) or not v:
            continue
        # toml serializer emits bare keys; restrict to bare-safe keys (ours are)
        s = serialize_toml(v)
        back = parse_toml(s)
        # Nulls serialize as "" (lossy by design, convert.rs:316) — compare modulo that
        assert values_equal(back, _null_to_empty(v)), s


def _null_to_empty(v):
    if v is None:
        return ""
    if isinstance(v, list):
        return [_null_to_empty(x) for x in v]
    if isinstance(v, dict):
        return {k: _null_to_empty(x) for k, x in v.items()}
    return v


def test_csv_round_trip_rows():
    rows = [{"a": 1.0, "b": "x,y", "c": None}, {"a": 2.5, "b": 'q"w', "c": True}]
    s = serialize_value(rows, "csv")
    back = parse_value(s, "csv")
    assert back == rows
