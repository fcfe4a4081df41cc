"""JSON/JSONC grammar tests — our own conformance corpus mirroring the
semantics of the reference's fixtures (tests/fixtures/{valid,invalid})
and json_parser_tests.rs. Fixtures are written fresh (reference is
GPL-3.0, study-only)."""

import pytest

from zparse_ray.functions.errors import ParseError
from zparse_ray.functions.json_parser import (
    JsonConfig,
    parse_json,
    parse_jsonc,
)


def err_id(fn, *args, **kw):
    with pytest.raises(ParseError) as ei:
        fn(*args, **kw)
    return ei.value.check_id


# -- valid corpus ----------------------------------------------------------

def test_simple_object():
    assert parse_json('{"a": 1, "b": "x"}') == {"a": 1.0, "b": "x"}


def test_nested():
    v = parse_json('{"a": {"b": [1, 2, {"c": null}]}, "d": true}')
    assert v == {"a": {"b": [1.0, 2.0, {"c": None}]}, "d": True}


def test_array_root():
    assert parse_json("[1, 2.5, -3e2, \"s\", false, null]") == [1.0, 2.5, -300.0, "s", False, None]


def test_scalar_roots():
    assert parse_json("42") == 42.0
    assert parse_json('"hi"') == "hi"
    assert parse_json("null") is None
    assert parse_json("true") is True


def test_key_order_preserved():
    v = parse_json('{"z": 1, "a": 2, "m": 3}')
    assert list(v.keys()) == ["z", "a", "m"]


def test_duplicate_json_keys_last_wins():
    # IndexMap::insert semantics: position kept, value replaced
    v = parse_json('{"a": 1, "b": 2, "a": 3}')
    assert v == {"a": 3.0, "b": 2.0}
    assert list(v.keys()) == ["a", "b"]


def test_escapes():
    assert parse_json(r'"\" \\ \/ \b \f \n \r \t"') == '" \\ / \b \f \n \r \t'
    assert parse_json(r'"Aé"') == "Aé"


def test_unicode_passthrough():
    assert parse_json('"héllo ☃"') == "héllo ☃"


def test_numbers():
    assert parse_json("0") == 0.0
    assert parse_json("-0.5e-2") == -0.005
    assert parse_json("1E+3") == 1000.0


# -- invalid corpus --------------------------------------------------------

def test_trailing_comma():
    assert err_id(parse_json, '{"a": 1,}') == "TrailingComma"
    assert err_id(parse_json, "[1, 2,]") == "TrailingComma"


def test_unclosed_containers():
    assert err_id(parse_json, '{"a": 1') == "Expected"
    assert err_id(parse_json, "[1, 2") == "Expected"


def test_unterminated_string():
    assert err_id(parse_json, '"abc') == "UnterminatedString"
    assert err_id(parse_json, '{"a": "x') == "UnterminatedString"


def test_bad_escape():
    assert err_id(parse_json, r'"\q"') == "InvalidEscapeSequence"


def test_bad_unicode_escape():
    assert err_id(parse_json, r'"\u12g4"') == "InvalidUnicodeEscape"
    # lone surrogates rejected (char::from_u32 semantics, no pair combining)
    assert err_id(parse_json, r'"\ud834"') == "InvalidUnicodeEscape"


def test_leading_zero_number():
    assert err_id(parse_json, "01") == "InvalidNumber"
    assert err_id(parse_json, "1.") == "InvalidNumber"
    assert err_id(parse_json, "1e") == "InvalidNumber"
    assert err_id(parse_json, "-") == "InvalidNumber"


def test_control_char_in_string():
    assert err_id(parse_json, '"a\x01b"') == "InvalidToken"


def test_bad_literals():
    assert err_id(parse_json, "nul") == "InvalidToken"
    assert err_id(parse_json, "truthy") == "InvalidToken"  # lexer peeks 'trut' != 'true'
    assert err_id(parse_json, "true1") == "Expected"  # 'true' + trailing content


def test_trailing_content():
    assert err_id(parse_json, "1 2") == "Expected"
    assert err_id(parse_json, "{} []") == "Expected"


def test_missing_colon_and_commas():
    assert err_id(parse_json, '{"a" 1}') == "Expected"
    assert err_id(parse_json, "[1 2]") == "Expected"
    assert err_id(parse_json, '{"a": 1 "b": 2}') == "Expected"


def test_max_depth():
    deep = "[" * 129 + "]" * 129
    assert err_id(parse_json, deep) == "MaxDepthExceeded"
    ok = "[" * 128 + "]" * 128
    assert parse_json(ok) is not None
    cfg = JsonConfig(max_depth=3)
    assert err_id(parse_json, "[[[[1]]]]", cfg) == "MaxDepthExceeded"


def test_max_size():
    cfg = JsonConfig(max_size=4)
    assert err_id(parse_json, '"abcdefgh"', cfg) == "MaxSizeExceeded"


def test_error_position():
    with pytest.raises(ParseError) as ei:
        parse_json('{"a": 1,\n "b": }')
    assert ei.value.line == 2


# -- JSONC mode ------------------------------------------------------------

def test_jsonc_comments():
    v = parse_jsonc('{\n// line comment\n"a": 1, /* block */ "b": 2}')
    assert v == {"a": 1.0, "b": 2.0}


def test_jsonc_trailing_commas():
    assert parse_jsonc('{"a": 1,}') == {"a": 1.0}
    assert parse_jsonc("[1, 2,]") == [1.0, 2.0]


def test_jsonc_unterminated_block_comment():
    assert err_id(parse_jsonc, '{"a": 1 /* oops') == "InvalidToken"


def test_strict_json_rejects_comments():
    assert err_id(parse_json, '{"a": 1} // c') == "Expected"


def test_depth_limit_reports_opener_position():
    # reference: max_depth error is reported at the container OPENER
    # (json_parser_tests.rs test_depth_limit_reports_opener_position);
    # applies to the exact parser (docs with escapes skip the fast path)
    cfg = JsonConfig(max_depth=2)
    with pytest.raises(ParseError) as ei:
        parse_json('{"a\\t": [[1]]}', cfg)
    assert ei.value.check_id == "MaxDepthExceeded"
    assert ei.value.offset == 9  # the second '[' that exceeds the limit


def test_size_limit_counts_comment_bytes():
    # comments count toward max_size (reference checks bytes_parsed per
    # token; we check the whole input — same observable outcome)
    cfg = JsonConfig(max_size=10, allow_comments=True, allow_trailing_commas=True)
    with pytest.raises(ParseError) as ei:
        parse_json("/* a long comment */ 1", cfg)
    assert ei.value.check_id == "MaxSizeExceeded"
