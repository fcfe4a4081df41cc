"""Format conversion + serialization (the reference's convert.rs).

Serializer semantics mirrored from reference crates/zparse/src/convert.rs:

- numbers render like Rust's ``f64::to_string()``: shortest round-trip
  decimal, NEVER exponent notation, integral floats without ``.0``
  (convert.rs:207-217 uses ``{:.0}`` for integral CSV cells; JSON/YAML/
  TOML use plain Display)
- JSON: compact, non-finite -> ``null``, escape set ``\\ \" \n \r \t``
  (convert.rs:249-293)
- CSV: union-of-keys header scan over ALL rows (two passes,
  convert.rs:160-177), string cells force-quoted (:223-227), nested
  values embedded as JSON (:219), Null/non-finite -> empty cell,
  ``\n``-joined with trailing newline
- TOML: flat ``key = value`` lines; nested objects -> inline tables;
  Null -> ``""``; non-finite -> ``nan``; root must be Object
  (convert.rs:295-339)
- YAML: block style, 2-space indent, strings always double-quoted
  (convert.rs:436-469)
- XML: ``root`` wrapper; ``@attributes`` / ``#text`` conventions;
  arrays -> repeated elements; entity escaping of & < > " '
  (convert.rs:545-659)
- CSV<->XML special paths: ``<row>`` element trees (convert.rs:341-430)
- datetime renderings at seconds precision (convert.rs:471-490)
- convert(): identity fast-path when from==to except JSONC
  normalization (convert.rs:37-82); CSV->TOML wraps rows in
  ``{rows: [...]}`` (convert.rs:84-93)
"""

from __future__ import annotations

import math
import re
from decimal import Decimal

from ..value import DT_LOCAL, DT_OFFSET, DT_TIME, TomlDatetime
from .csv_parser import CsvConfig, infer_primitive, parse_csv
from .errors import INVALID_TOKEN, ParseError
from .json_parser import JsonConfig, parse_json
from .toml_parser import parse_toml
from .xml_parser import XmlDocument, XmlElement, parse_xml
from .yaml_parser import parse_yaml

FORMATS = ("json", "csv", "toml", "yaml", "xml")


def detect_format_from_path(path: str) -> str | None:
    """lib.rs:43-54 — case-insensitive extension sniff; .jsonc -> json."""
    ext = path.rsplit(".", 1)[-1].lower() if "." in path else ""
    return {
        "json": "json",
        "jsonc": "json",
        "csv": "csv",
        "toml": "toml",
        "yaml": "yaml",
        "yml": "yaml",
        "xml": "xml",
    }.get(ext)


# ---------------------------------------------------------------------------
# number formatting (Rust f64 Display parity)

def format_f64(n: float) -> str:
    """Rust's ``f64::to_string()``: shortest round-trip decimal with no
    exponent; integral values without a fractional part; NaN/inf callers
    handle separately."""
    if n == 0.0:
        return "-0" if math.copysign(1.0, n) < 0 else "0"
    s = repr(n)
    if "e" in s or "E" in s:
        s = format(Decimal(s), "f")
    if s.endswith(".0"):
        s = s[:-2]
    return s


_ESC_RE = re.compile(r'[\\"\n\r\t]')
_ESC_MAP = {"\\": "\\\\", '"': '\\"', "\n": "\\n", "\r": "\\r", "\t": "\\t"}


def escape_string(s: str) -> str:
    """convert.rs:277-291 — escape set used by JSON/TOML/YAML serializers."""
    return _ESC_RE.sub(lambda m: _ESC_MAP[m.group()], s)


def format_toml_datetime(dt: TomlDatetime) -> str:
    """convert.rs:471-490 — seconds-precision renderings; offset
    datetimes keep nonzero fractional seconds (Rfc3339 behavior), local
    variants drop them."""
    t = dt.text
    if dt.variant == DT_OFFSET:
        m = re.match(
            r"(\d{4}-\d{2}-\d{2})[Tt](\d{2}:\d{2}:\d{2})(\.\d+)?([Zz]|[+-]\d{2}:\d{2})\Z", t
        )
        if not m:
            return t
        frac = m.group(3) or ""
        frac = frac.rstrip("0")
        if frac == ".":
            frac = ""
        off = m.group(4)
        if off in ("z", "Z", "+00:00", "-00:00"):
            off = "Z"
        return f"{m.group(1)}T{m.group(2)}{frac}{off}"
    if dt.variant == DT_LOCAL:
        return t.split(".")[0]
    if dt.variant == DT_TIME:
        return t.split(".")[0]
    return t  # DT_DATE


# ---------------------------------------------------------------------------
# serializers

def serialize_json(v) -> str:
    """convert.rs:249-275 — compact JSON; non-finite numbers -> null."""
    out: list[str] = []
    _ser_json(v, out)
    return "".join(out)


def _ser_json(v, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif isinstance(v, bool):
        out.append("true" if v else "false")
    elif isinstance(v, float):
        out.append(format_f64(v) if math.isfinite(v) else "null")
    elif isinstance(v, str):
        out.append('"')
        out.append(escape_string(v))
        out.append('"')
    elif isinstance(v, list):
        out.append("[")
        for i, item in enumerate(v):
            if i:
                out.append(",")
            _ser_json(item, out)
        out.append("]")
    elif isinstance(v, dict):
        out.append("{")
        for i, (k, val) in enumerate(v.items()):
            if i:
                out.append(",")
            out.append('"')
            out.append(escape_string(k))
            out.append('":')
            _ser_json(val, out)
        out.append("}")
    elif isinstance(v, TomlDatetime):
        out.append('"')
        out.append(format_toml_datetime(v))
        out.append('"')
    else:
        raise TypeError(f"not a Value: {type(v)!r}")


def _escape_csv(s: str) -> str:
    if any(c in s for c in (",", '"', "\n", "\r")):
        return '"' + s.replace('"', '""') + '"'
    return s


def serialize_csv(v) -> str:
    """convert.rs:135-247 — union-of-keys header scan; the ONE converter
    needing cross-row state (distributed form: per-block partial header
    sets merged, then a second pass — see stages/)."""
    if isinstance(v, list):
        rows = v
    elif isinstance(v, dict):
        rows = v["rows"] if isinstance(v.get("rows"), list) else [v]
    else:
        raise ParseError(INVALID_TOKEN, "csv output requires array or object root")
    if not rows:
        return ""
    headers: list[str] = []
    seen = set()
    for row in rows:
        if not isinstance(row, dict):
            raise ParseError(INVALID_TOKEN, "csv output requires array of objects")
        for key in row:
            if key not in seen:
                seen.add(key)
                headers.append(key)
    if not headers:
        return ""
    lines = [",".join(_escape_csv(h) for h in headers)]
    for row in rows:
        fields = []
        for h in headers:
            val = row.get(h)
            if isinstance(val, str):
                fields.append('"' + val.replace('"', '""') + '"')  # force-quoted
                continue
            if val is None:
                cell = ""
            elif isinstance(val, bool):
                cell = "true" if val else "false"
            elif isinstance(val, float):
                if math.isfinite(val):
                    cell = format_f64(val)
                else:
                    cell = ""
            elif isinstance(val, TomlDatetime):
                cell = format_toml_datetime(val)
            else:
                cell = serialize_json(val)
            fields.append(_escape_csv(cell))
        lines.append(",".join(fields))
    return "\n".join(lines) + "\n"


def serialize_toml(v) -> str:
    """convert.rs:295-339 — flat key = value; root must be Object."""
    if not isinstance(v, dict):
        raise ParseError(INVALID_TOKEN, "toml root must be object")
    return "\n".join(f"{k} = {_ser_toml_value(val)}" for k, val in v.items())


def _ser_toml_value(v) -> str:
    if v is None:
        return '""'
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return format_f64(v) if math.isfinite(v) else "nan"
    if isinstance(v, str):
        return '"' + escape_string(v) + '"'
    if isinstance(v, list):
        return "[" + ", ".join(_ser_toml_value(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ", ".join(f"{k} = {_ser_toml_value(val)}" for k, val in v.items()) + "}"
    if isinstance(v, TomlDatetime):
        return format_toml_datetime(v)
    raise TypeError(f"not a Value: {type(v)!r}")


def serialize_yaml(v, indent: int = 0) -> str:
    """convert.rs:436-469 — block style, 2-space indent, quoted strings."""
    pad = " " * indent
    if v is None:
        return f"{pad}null"
    if isinstance(v, bool):
        return f"{pad}true" if v else f"{pad}false"
    if isinstance(v, float):
        num = format_f64(v) if math.isfinite(v) else ("NaN" if math.isnan(v) else ("inf" if v > 0 else "-inf"))
        return f"{pad}{num}"
    if isinstance(v, str):
        return f'{pad}"{escape_string(v)}"'
    if isinstance(v, TomlDatetime):
        return f"{pad}{format_toml_datetime(v)}"
    if isinstance(v, list):
        return "\n".join(f"{pad}- {serialize_yaml(x, indent + 2).lstrip()}" for x in v)
    if isinstance(v, dict):
        parts = []
        for k, val in v.items():
            if isinstance(val, (list, dict)):
                parts.append(f"{pad}{k}:\n{serialize_yaml(val, indent + 2)}")
            else:
                parts.append(f"{pad}{k}: {serialize_yaml(val, indent + 2).lstrip()}")
        return "\n".join(parts)
    raise TypeError(f"not a Value: {type(v)!r}")


def _escape_xml(s: str) -> str:
    return (
        s.replace("&", "&amp;")
        .replace("<", "&lt;")
        .replace(">", "&gt;")
        .replace('"', "&quot;")
        .replace("'", "&apos;")
    )


def serialize_xml(doc: XmlDocument) -> str:
    out: list[str] = []
    _ser_element(doc.root, out)
    return "".join(out)


def _ser_element(el: XmlElement, out: list[str]) -> None:
    out.append(f"<{el.name}")
    for k, v in el.attributes.items():
        out.append(f' {k}="{_escape_xml(v)}"')
    if not el.children:
        out.append("/>")
        return
    out.append(">")
    for child in el.children:
        if isinstance(child, XmlElement):
            _ser_element(child, out)
        else:
            out.append(_escape_xml(child))
    out.append(f"</{el.name}>")


# ---------------------------------------------------------------------------
# XML <-> Value projections

def xml_to_value(doc: XmlDocument):
    """convert.rs:492-543 — the canonical interleaved-spans -> structured
    record projection: element -> object with @attributes / #text;
    repeated child names collapse to arrays."""
    return {doc.root.name: _element_to_value(doc.root)}


def _element_to_value(el: XmlElement):
    obj: dict = {}
    if el.attributes:
        obj["@attributes"] = dict(el.attributes)
    text = "".join(c for c in el.children if isinstance(c, str))
    if text.strip():
        obj["#text"] = text
    for child in el.children:
        if isinstance(child, XmlElement):
            val = _element_to_value(child)
            if child.name in obj:
                existing = obj[child.name]
                if isinstance(existing, list):
                    existing.append(val)
                else:
                    obj[child.name] = [existing, val]
            else:
                obj[child.name] = val
    return obj


def value_to_xml(value) -> XmlDocument:
    """convert.rs:545-575 — wrap in <root>."""
    return XmlDocument(XmlElement("root", {}, value_to_children(value)))


def value_to_children(value) -> list:
    if isinstance(value, dict):
        out = []
        for k, v in value.items():
            out.extend(_value_to_elements(k, v))
        return out
    if isinstance(value, list):
        out = []
        for v in value:
            out.extend(value_to_children(v))
        return out
    if isinstance(value, str):
        return [value]
    if isinstance(value, bool):
        return ["true" if value else "false"]
    if isinstance(value, float):
        return [format_f64(value) if math.isfinite(value) else ("NaN" if math.isnan(value) else ("inf" if value > 0 else "-inf"))]
    if value is None:
        return []
    if isinstance(value, TomlDatetime):
        return [format_toml_datetime(value)]
    raise TypeError(f"not a Value: {type(value)!r}")


def _value_to_elements(name: str, value) -> list[XmlElement]:
    if isinstance(value, list):
        out = []
        for v in value:
            out.extend(_value_to_elements(name, v))
        return out
    if isinstance(value, dict):
        attributes = {}
        children: list = []
        attrs = value.get("@attributes")
        if isinstance(attrs, dict):
            for k, v in attrs.items():
                attributes[k] = v if isinstance(v, str) else serialize_json(v)
        txt = value.get("#text")
        if isinstance(txt, str):
            children.append(txt)
        for k, v in value.items():
            if k in ("@attributes", "#text"):
                continue
            children.extend(_value_to_elements(k, v))
        return [XmlElement(name, attributes, children)]
    return [XmlElement(name, {}, value_to_children(value))]


def csv_value_to_xml(value) -> XmlDocument:
    """convert.rs:341-392 — rows -> <root><row><field>..</field></row>..."""
    if not isinstance(value, list):
        raise ParseError(INVALID_TOKEN, "csv value must be an array of objects for xml conversion")
    children = []
    for row in value:
        if not isinstance(row, dict):
            raise ParseError(INVALID_TOKEN, "csv row must be an object")
        row_children = [
            XmlElement(key, {}, value_to_children(val)) for key, val in row.items()
        ]
        children.append(XmlElement("row", {}, row_children))
    return XmlDocument(XmlElement("root", {}, children))


def xml_to_csv_value(doc: XmlDocument):
    """convert.rs:394-430 — expects <row> children, leaf-only fields."""
    rows = []
    for child in doc.root.children:
        if not isinstance(child, XmlElement) or child.name != "row":
            continue
        row: dict = {}
        for field_el in child.children:
            if isinstance(field_el, XmlElement):
                row[field_el.name] = _xml_leaf_to_value(field_el)
        rows.append(row)
    return rows


def _xml_leaf_to_value(el: XmlElement):
    if not el.children:
        return None
    if len(el.children) == 1 and isinstance(el.children[0], str):
        text = el.children[0]
        v, hit = infer_primitive(text.strip())
        return v if hit else text
    raise ParseError(INVALID_TOKEN, "xml row fields must be simple leaf elements")


# ---------------------------------------------------------------------------
# convert matrix

class ConvertOptions:
    def __init__(self, json: JsonConfig | None = None, csv: CsvConfig | None = None):
        self.json = json or JsonConfig()
        self.csv = csv or CsvConfig()


def parse_value(text: str, fmt: str, options: ConvertOptions | None = None):
    opts = options or ConvertOptions()
    if fmt == "jsonc":
        # reference maps Jsonc -> Format::Json + permissive config
        # (zparse-api/src/main.rs:44-47,127-137)
        from .json_parser import JSONC_CONFIG

        cfg = opts.json
        if not (cfg.allow_comments and cfg.allow_trailing_commas):
            cfg = JSONC_CONFIG
        return parse_json(text, cfg)
    if fmt == "json":
        return parse_json(text, opts.json)
    if fmt == "csv":
        return parse_csv(text, opts.csv)
    if fmt == "toml":
        return parse_toml(text)
    if fmt == "yaml":
        return parse_yaml(text)
    if fmt == "xml":
        raise ParseError(INVALID_TOKEN, "xml requires xml parser")
    raise ParseError(INVALID_TOKEN, f"unknown format: {fmt}")


def serialize_value(value, fmt: str) -> str:
    if fmt == "json" or fmt == "jsonc":
        return serialize_json(value)
    if fmt == "csv":
        return serialize_csv(value)
    if fmt == "toml":
        return serialize_toml(value)
    if fmt == "yaml":
        return serialize_yaml(value, 0)
    raise ParseError(INVALID_TOKEN, "xml requires xml serializer")


def convert(text: str, from_fmt: str, to_fmt: str, options: ConvertOptions | None = None) -> str:
    """convert.rs:32-82 — parse(from) -> normalize -> serialize(to);
    identity fast-path when from == to (except JSONC normalization)."""
    opts = options or ConvertOptions()
    if from_fmt == to_fmt:
        if from_fmt == "json" and (opts.json.allow_comments or opts.json.allow_trailing_commas):
            return serialize_value(parse_value(text, from_fmt, opts), to_fmt)
        return text
    if (from_fmt, to_fmt) == ("csv", "xml"):
        return serialize_xml(csv_value_to_xml(parse_value(text, "csv", opts)))
    if (from_fmt, to_fmt) == ("xml", "csv"):
        return serialize_value(xml_to_csv_value(parse_xml(text)), "csv")
    if from_fmt == "xml":
        return serialize_value(xml_to_value(parse_xml(text)), to_fmt)
    if to_fmt == "xml":
        return serialize_xml(value_to_xml(parse_value(text, from_fmt, opts)))
    value = parse_value(text, from_fmt, opts)
    if (from_fmt, to_fmt) == ("csv", "toml") and isinstance(value, list):
        value = {"rows": value}
    return serialize_value(value, to_fmt)
