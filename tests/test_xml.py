"""XML grammar tests mirroring the reference's xml fixture corpus and
xml_parser_tests.rs semantics."""

import pytest

from zparse_ray.functions.errors import ParseError
from zparse_ray.functions.xml_parser import XmlConfig, XmlElement, parse_xml


def err_id(text, **kw):
    with pytest.raises(ParseError) as ei:
        parse_xml(text, **kw)
    return ei.value.check_id


def test_basic():
    doc = parse_xml("<root><child>text</child></root>")
    assert doc.root.name == "root"
    child = doc.root.children[0]
    assert child.name == "child"
    assert child.children == ["text"]


def test_attributes_both_quote_styles():
    doc = parse_xml("<root id=\"1\" name='test'><item value=\"42\" /></root>")
    assert doc.root.attributes == {"id": "1", "name": "test"}
    assert doc.root.children[0].attributes == {"value": "42"}
    assert doc.root.children[0].children == []


def test_attribute_order_preserved():
    doc = parse_xml('<r z="1" a="2" m="3"/>')
    assert list(doc.root.attributes.keys()) == ["z", "a", "m"]


def test_entities():
    doc = parse_xml("<root>Fish &amp; Chips &lt;test&gt; &quot;q&quot; &apos;a&apos;</root>")
    assert doc.root.children == ['Fish & Chips <test> "q" \'a\'']


def test_numeric_entities():
    doc = parse_xml("<r>&#65;&#x42;</r>")
    assert doc.root.children == ["AB"]


def test_entities_in_attributes():
    doc = parse_xml('<r a="x&amp;y"/>')
    assert doc.root.attributes == {"a": "x&y"}


def test_whitespace_only_text_dropped():
    doc = parse_xml("<root>\n  <child>value</child>\n</root>")
    assert len(doc.root.children) == 1
    assert isinstance(doc.root.children[0], XmlElement)


def test_interleaved_text_and_elements():
    doc = parse_xml("<r>before<e/>after</r>")
    assert doc.root.children[0] == "before"
    assert doc.root.children[1].name == "e"
    assert doc.root.children[2] == "after"


def test_declaration_and_pi_skipped():
    doc = parse_xml('<?xml version="1.0"?>\n<!DOCTYPE root>\n<root/>')
    assert doc.root.name == "root"


def test_comment_and_cdata_skipped():
    doc = parse_xml("<r><!-- comment --><a/><![CDATA[ignored]]><b/></r>")
    names = [c.name for c in doc.root.children if isinstance(c, XmlElement)]
    assert names == ["a", "b"]


def test_text_after_comment():
    # documented divergence: reference rejects this (untested quirk)
    doc = parse_xml("<r><!--c-->text</r>")
    assert doc.root.children == ["text"]


def test_self_closing():
    doc = parse_xml("<a><b/><c /></a>")
    assert [c.name for c in doc.root.children] == ["b", "c"]


def test_mismatched_closing_tag():
    assert err_id("<a><b></a></b>") == "InvalidToken"
    assert err_id("<a></b>") == "InvalidToken"


def test_unterminated_element():
    assert err_id("<a><b>") == "InvalidToken"
    assert err_id("<a>text") == "InvalidToken"


def test_duplicate_attribute():
    assert err_id('<a x="1" x="2"/>') == "InvalidToken"


def test_bad_entity():
    assert err_id("<a>&bogus;</a>") == "InvalidToken"
    assert err_id("<a>&#xZZ;</a>") == "InvalidToken"
    assert err_id("<a>no semi &amp</a>") == "InvalidToken"


def test_unquoted_attribute_value():
    assert err_id("<a x=1/>") == "InvalidToken"


def test_trailing_content_after_root():
    assert err_id("<a/><b/>") == "InvalidToken"
    assert err_id("<a/>text") == "InvalidToken"


def test_trailing_comment_after_root_ok():
    doc = parse_xml("<a/><!-- done -->")
    assert doc.root.name == "a"


def test_bad_name():
    assert err_id("<1a/>") == "InvalidToken"


def test_name_grammar():
    doc = parse_xml("<ns:tag-1.x _y='2'/>")
    assert doc.root.name == "ns:tag-1.x"


def test_closing_tag_whitespace():
    doc = parse_xml("<a>text</a  >")
    assert doc.root.children == ["text"]


def test_max_size():
    assert err_id("<a>" + "x" * 100 + "</a>", config=XmlConfig(max_size=10)) == "MaxSizeExceeded"
