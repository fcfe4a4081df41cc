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
