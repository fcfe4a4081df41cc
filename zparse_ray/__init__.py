"""zparse_ray — a Ray-Data-native schema + constraint validation engine.

A brand-new engine (NOT a port) with the validation/conversion
capabilities of the reference (pixincreate/zParse, studied at
/root/reference): recursive-descent grammar validation for
JSON / JSONC / CSV / TOML / YAML / XML, a dynamic typed value model,
format conversion, and — new, required by the north rule — distributed
column stats (t-digest, HyperLogLog, null/type histograms), doc_id
uniqueness, media_ref referential integrity, distribution drift,
dedup / text-analysis / similarity operators, all expressed as
Ray Data ``Dataset`` pipelines over zero-copy Arrow batches.

Library code NEVER calls ``ray.init`` — sessions are owned by the CLI
entry points, ``bench.py`` and the pytest fixture.
"""

__version__ = "0.1.0"


# ---------------------------------------------------------------------------
# public library API — the engine's analog of the reference's top-level
# surface (reference: crates/zparse/src/lib.rs:69-188: from_str,
# from_*_str, *_with_config, convert, detect_format_from_path).
# Heavy imports stay lazy so `import zparse_ray` is cheap in workers.

def from_str(text: str, format: str, **config):  # noqa: A002 - mirrors lib.rs naming
    """Parse a document of the given format to a Value (lib.rs:69-90)."""
    from .functions.convert import parse_value
    from .functions.xml_parser import parse_xml

    if format == "xml":
        return parse_xml(text)
    return parse_value(text, format)


def from_json_str(text: str, config=None):
    from .functions.json_parser import parse_json

    return parse_json(text, config)


def from_jsonc_str(text: str, config=None):
    from .functions.json_parser import parse_jsonc

    return parse_jsonc(text, config)


def from_csv_str(text: str, config=None):
    from .functions.csv_parser import parse_csv

    return parse_csv(text, config)


def from_csv_str_with_delimiter(text: str, delimiter: str):
    from .functions.csv_parser import CsvConfig, parse_csv

    return parse_csv(text, CsvConfig(delimiter=delimiter))


def from_toml_str(text: str, config=None):
    from .functions.toml_parser import parse_toml

    return parse_toml(text, config)


def from_yaml_str(text: str, config=None):
    from .functions.yaml_parser import parse_yaml

    return parse_yaml(text, config)


def from_xml_str(text: str, config=None):
    from .functions.xml_parser import parse_xml

    return parse_xml(text, config)


def convert(text: str, from_format: str, to_format: str, options=None) -> str:
    """Format conversion (lib.rs convert / convert.rs:32-82)."""
    from .functions.convert import convert as _convert

    return _convert(text, from_format, to_format, options)


def detect_format_from_path(path: str):
    from .functions.convert import detect_format_from_path as _d

    return _d(path)


def validate(spans_dir: str, out_dir: str, **kwargs) -> dict:
    """Run the distributed validation pipeline (requires a live Ray
    session); returns the run summary."""
    from .pipelines.validate import run_validation

    return run_validation(spans_dir, out_dir, **kwargs)


def events(text: str, format: str):  # noqa: A002 - mirrors lib.rs naming
    """Event-stream API: returns the pull parser for the format's
    NATIVE reference vocabulary (json/jsonc -> JsonEventParser,
    toml -> TomlEventParser, yaml -> YamlEventParser); other formats
    raise. For one uniform JSON-style stream across all formats use
    ``functions.events.parse_events``."""
    from .functions.events import JsonEventParser, TomlEventParser, YamlEventParser

    if format in ("json", "jsonc"):
        return JsonEventParser(text, jsonc=format == "jsonc")
    if format == "toml":
        return TomlEventParser(text)
    if format == "yaml":
        return YamlEventParser(text)
    raise ValueError(f"no event parser for format {format!r}")
