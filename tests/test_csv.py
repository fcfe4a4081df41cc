"""CSV grammar tests mirroring the reference's csv_tests.rs semantics
(type inference, quoting/multiline, delimiters, header normalization)."""

import pytest

from zparse_ray.functions.csv_parser import CsvConfig, parse_csv
from zparse_ray.functions.errors import ParseError


def err_id(text, **kw):
    with pytest.raises(ParseError) as ei:
        parse_csv(text, **kw)
    return ei.value.check_id


def test_basic_type_inference():
    rows = parse_csv("a,b,c,d,e\n1,2.5,true,null,hello\n")
    assert rows == [{"a": 1.0, "b": 2.5, "c": True, "d": None, "e": "hello"}]


def test_case_insensitive_literals():
    rows = parse_csv("a,b,c\nTRUE,False,NULL\n")
    assert rows == [{"a": True, "b": False, "c": None}]


def test_empty_cell_is_null():
    rows = parse_csv("a,b\n,2\n")
    assert rows == [{"a": None, "b": 2.0}]


def test_quoted_always_string():
    rows = parse_csv('a,b\n"1","true"\n')
    assert rows == [{"a": "1", "b": "true"}]


def test_quote_escape_and_multiline():
    rows = parse_csv('a,b\n"x""y","line1\nline2"\n')
    assert rows == [{"a": 'x"y', "b": "line1\nline2"}]


def test_unquoted_trimmed():
    rows = parse_csv("a,b\n  hi  , 1 \n")
    assert rows == [{"a": "hi", "b": 1.0}]


def test_quoted_untrimmed():
    rows = parse_csv('a\n"  hi  "\n')
    assert rows == [{"a": "  hi  "}]


def test_blank_records_skipped():
    rows = parse_csv("a,b\n1,2\n\n   \n3,4\n")
    assert rows == [{"a": 1.0, "b": 2.0}, {"a": 3.0, "b": 4.0}]


def test_crlf():
    rows = parse_csv("a,b\r\n1,2\r\n")
    assert rows == [{"a": 1.0, "b": 2.0}]


def test_duplicate_headers():
    rows = parse_csv("x,x,x\n1,2,3\n")
    assert rows == [{"x": 1.0, "x_2": 2.0, "x_3": 3.0}]


def test_empty_headers():
    rows = parse_csv(",b,\n1,2,3\n")
    assert rows == [{"column_1": 1.0, "b": 2.0, "column_3": 3.0}]


def test_overflow_cells():
    rows = parse_csv("a,b\n1,2,3,4\n")
    assert rows == [{"a": 1.0, "b": 2.0, "column_3": 3.0, "column_4": 4.0}]


def test_missing_cells_null():
    rows = parse_csv("a,b,c\n1\n")
    assert rows == [{"a": 1.0, "b": None, "c": None}]


def test_custom_delimiter():
    rows = parse_csv("a;b\n1;2\n", config=CsvConfig(delimiter=";"))
    assert rows == [{"a": 1.0, "b": 2.0}]


def test_invalid_delimiter():
    assert err_id("a\n1\n", config=CsvConfig(delimiter="\n")) == "InvalidToken"
    assert err_id("a\n1\n", config=CsvConfig(delimiter='"')) == "InvalidToken"


def test_junk_after_closing_quote():
    assert err_id('a\n"x"y\n') == "InvalidToken"


def test_space_after_closing_quote_ok():
    rows = parse_csv('a,b\n"x" ,2\n')
    assert rows == [{"a": "x", "b": 2.0}]


def test_unterminated_quote():
    assert err_id('a\n"x\n') == "InvalidToken"


def test_non_utf8_bytes():
    assert err_id(b"a\n\xff\xfe\n") == "InvalidToken"


def test_empty_doc():
    assert parse_csv("") == []
    assert parse_csv("\n\n") == []


def test_header_only():
    assert parse_csv("a,b\n") == []


def test_numbers_with_sign_and_exp():
    rows = parse_csv("a,b,c\n+5,-2.5,1e3\n")
    assert rows == [{"a": 5.0, "b": -2.5, "c": 1000.0}]


def test_inf_nan_stay_strings():
    rows = parse_csv("a,b\ninf,nan\n")
    assert rows == [{"a": "inf", "b": "nan"}]


def test_i64_overflow_to_float():
    rows = parse_csv("a\n99999999999999999999\n")
    assert rows == [{"a": 1e20}]


def test_max_size():
    assert err_id("a\n" + "x" * 100 + "\n", config=CsvConfig(max_size=10)) == "MaxSizeExceeded"


def test_unterminated_with_escaped_quotes_stays_unterminated():
    # regression: the quoted-field regex must not backtrack `""` into a
    # shorter field + junk error — this doc is UNTERMINATED
    import pytest

    from zparse_ray.functions.csv_parser import parse_csv
    from zparse_ray.functions.errors import ParseError

    with pytest.raises(ParseError) as e:
        parse_csv('a,b\n"ab""cd,2\n')
    assert "unterminated" in e.value.message


def test_whitespace_delimiter_after_quoted_field():
    # regression (ADVICE r2): with a whitespace delimiter the trailing-ws
    # skip after a closing quote must NOT consume the delimiter itself
    # (csv/parser.rs: skip whitespace after closing quote but not the delim)
    assert parse_csv('a\tb\n"x"\t2\n', CsvConfig(delimiter="\t")) == [{"a": "x", "b": 2.0}]
    assert parse_csv('a b\n"x" 2\n', CsvConfig(delimiter=" ")) == [{"a": "x", "b": 2.0}]
    # other whitespace after the quote is still skipped before the delimiter
    assert parse_csv('a,b\n"x" \t,2\n') == [{"a": "x", "b": 2.0}]
    # space before a tab delimiter is fine; tab before a space delimiter too
    assert parse_csv('a\tb\n"x" \t2\n', CsvConfig(delimiter="\t")) == [{"a": "x", "b": 2.0}]
