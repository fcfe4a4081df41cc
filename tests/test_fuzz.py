"""Property-based fuzzing (the reference runs cargo-fuzz on its json/
toml parsers weekly — .github/workflows/fuzzing.yml:35-48; this is the
pytest equivalent): every parser must either return a value or raise
ParseError — never any other exception, never hang.

Also: serializer closure — whatever parses must re-serialize and
re-parse (the property_tests.rs invariant under random inputs).
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from zparse_ray.functions.convert import serialize_value
from zparse_ray.functions.csv_parser import parse_csv
from zparse_ray.functions.errors import ParseError
from zparse_ray.functions.json_parser import parse_json, parse_jsonc
from zparse_ray.functions.toml_parser import parse_toml
from zparse_ray.functions.xml_parser import parse_xml
from zparse_ray.functions.yaml_parser import parse_yaml

PARSERS = {
    "json": parse_json,
    "jsonc": parse_jsonc,
    "csv": parse_csv,
    "toml": parse_toml,
    "yaml": parse_yaml,
    "xml": parse_xml,
}

# text skewed toward grammar-relevant characters so fuzzing hits parser
# internals rather than failing at the first byte
_grammar_text = st.text(
    alphabet=st.sampled_from(
        list("{}[]\",':=#-.\\ \t\n\r0123456789abcXYZ_éd☃<>&;/epro+ulnTZ")
    ),
    max_size=120,
)


@pytest.mark.parametrize("fmt", list(PARSERS))
@settings(max_examples=300, deadline=2000, suppress_health_check=[HealthCheck.too_slow])
@given(text=_grammar_text)
def test_parser_total(fmt, text):
    try:
        PARSERS[fmt](text)
    except ParseError:
        pass  # structured failure is the contract


@pytest.mark.parametrize("fmt", ["json", "yaml", "csv"])
@settings(max_examples=150, deadline=2000, suppress_health_check=[HealthCheck.too_slow])
@given(text=_grammar_text)
def test_parse_serialize_parse_closure(fmt, text):
    """If a doc parses, its serialization must parse too (serializer
    output is always valid input)."""
    try:
        v = PARSERS[fmt](text)
    except ParseError:
        return
    if fmt == "csv" and v == []:
        return  # empty doc serializes to "" which parses to [] — fine
    try:
        s = serialize_value(v, fmt)
    except ParseError:
        return  # e.g. csv output needs array-of-objects root
    PARSERS[fmt](s)  # must not raise
