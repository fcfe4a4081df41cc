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


# -- pipeline-level table fuzz: random adversarial span tables must keep
# distributed-vs-oracle parity (nulls, invalid docs, dup ids, bad offsets)

def test_random_adversarial_tables_parity(ray_session, tmp_path):
    import os
    import random

    import pyarrow as pa
    import pyarrow.parquet as pq

    from zparse_ray.oracle import oracle_validate, read_pipeline_outputs
    from zparse_ray.pipelines.validate import run_validation
    from zparse_ray.synth import _INVALID_MENU, _valid_payload

    span_t = pa.struct(
        [("kind", pa.string()), ("text", pa.string()),
         ("media_ref", pa.string()), ("offset", pa.int32())]
    )
    schema = pa.schema(
        [("partition_id", pa.int32()), ("doc_id", pa.string()), ("spans", pa.list_(span_t))]
    )
    kinds = ["json", "jsonc", "csv", "toml", "yaml", "xml", "text", "image", "audio", "bogus", None]

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        rows = []
        for pid in range(2):
            for i in range(40):
                spans = []
                off = 0
                for _ in range(rng.randint(1, 6)):
                    kind = rng.choice(kinds)
                    if kind in _INVALID_MENU and rng.random() < 0.4:
                        text = rng.choice(_INVALID_MENU[kind])[0]
                    elif kind in ("json", "jsonc", "csv", "toml", "yaml", "xml", "text"):
                        text = _valid_payload(kind, rng)
                    else:
                        text = rng.choice([None, "", "blob"])
                    ref = rng.choice([None, "", "asset-000001", "asset-missing"]) if kind in ("image", "audio") else ""
                    o = rng.choice([None, off, off - 3])
                    spans.append({"kind": kind, "text": rng.choice([text, None]) if rng.random() < 0.1 else text,
                                  "media_ref": ref, "offset": o})
                    off += rng.randint(1, 9)
                doc_id = rng.choice([None, f"doc-{rng.randint(0, 50):04d}"])
                rows.append({"partition_id": pid, "doc_id": doc_id, "spans": spans})
        d = str(tmp_path / f"fuzz{seed}")
        os.makedirs(os.path.join(d, "spans"))
        t = pa.Table.from_pylist(rows, schema=schema)
        for pid in range(2):
            import pyarrow.compute as pc
            pq.write_table(
                t.filter(pc.equal(t["partition_id"], pid)),
                os.path.join(d, "spans", f"part-{pid:05d}.parquet"),
            )
        pq.write_table(pa.table({"asset_id": pa.array(["asset-000001"])}),
                       os.path.join(d, "assets.parquet"))
        out = str(tmp_path / f"fuzz{seed}_out")
        run_validation(d, out, round_trip=True)
        p = read_pipeline_outputs(out)
        o = oracle_validate(d, round_trip=True)
        assert p[0] == o[0], f"seed {seed}: violations diverge"
        assert p[1] == o[1], f"seed {seed}: verdicts diverge"


@given(st.text(alphabet='{}[],:"\\ 01ntf.e-u', max_size=40))
@settings(max_examples=300, deadline=None)
def test_fuzz_pull_events_differential(doc):
    """Pull event parser and DOM parser agree on accept/reject,
    check_id and offset for arbitrary JSON-ish garbage."""
    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import EOF, iter_events, iter_json_events
    from zparse_ray.functions.json_parser import parse_json

    try:
        dom = list(iter_events(parse_json(doc))) + [(EOF, None)]
        e_dom = None
    except ParseError as e:
        dom, e_dom = None, (e.check_id, e.offset)
    except RecursionError:
        return
    try:
        pull = list(iter_json_events(doc))
        e_pull = None
    except ParseError as e:
        pull, e_pull = None, (e.check_id, e.offset)
    assert e_dom == e_pull and dom == pull, (doc, e_dom, e_pull)


@given(st.text(alphabet='[]{}=.,"\'\n abc1_-#', max_size=40))
@settings(max_examples=300, deadline=None)
def test_fuzz_toml_pull_events_differential(doc):
    """TOML pull event stream and DOM parser agree on accept/reject,
    error identity, and the folded root for arbitrary TOML-ish text."""
    from zparse_ray.functions.errors import ParseError
    from zparse_ray.functions.events import TomlEventParser

    try:
        dom = parse_toml(doc)
        e_dom = None
    except ParseError as e:
        dom, e_dom = None, (e.check_id, e.offset)
    except RecursionError:
        return
    try:
        p = TomlEventParser(doc)
        while p.next_event() is not None:
            pass
        root, e_pull = p.root, None
    except ParseError as e:
        root, e_pull = None, (e.check_id, e.offset)
    assert e_dom == e_pull and dom == root, (doc, e_dom, e_pull)


# --- property fuzz for the round-4 text operators (batch-level) ---


@settings(max_examples=250, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(st.text(max_size=120), min_size=1, max_size=8),
)
def test_fuzz_normalize_idempotent_and_null_safe(texts):
    import pyarrow as pa

    from zparse_ray.stages.normalize import normalize_batch

    t = pa.table({"text": pa.array(texts, pa.string())})
    once = normalize_batch(t)["text"].to_pylist()
    t2 = pa.table({"text": pa.array(once, pa.string())})
    assert normalize_batch(t2)["text"].to_pylist() == once  # fixpoint
    # no control chars or runs survive in any output
    for s in once:
        assert "\r" not in s and "\x00" not in s and "  " not in s
        assert not s.startswith((" ", "\n")) and not s.endswith((" ", "\n"))


@settings(max_examples=250, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    texts=st.lists(st.text(max_size=200), min_size=1, max_size=6),
    chunk=st.integers(min_value=1, max_value=20),
    overlap_frac=st.floats(min_value=0.0, max_value=0.95),
)
def test_fuzz_chunk_covers_all_tokens(texts, chunk, overlap_frac):
    import re

    import pyarrow as pa

    from zparse_ray.stages.chunk import chunk_documents_batch

    overlap = min(int(chunk * overlap_frac), chunk - 1)
    stride = chunk - overlap
    tok = re.compile(r"[^\t\n\f\r ]+")
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    out = chunk_documents_batch(t, chunk_tokens=chunk, overlap_tokens=overlap)
    by_doc = {}
    for did, cid, txt, ntok in zip(
        out["doc_id"].to_pylist(), out["chunk_id"].to_pylist(),
        out["text"].to_pylist(), out["n_tokens"].to_pylist(),
    ):
        by_doc.setdefault(did, []).append((cid, txt, ntok))
    for i, text in enumerate(texts):
        words = tok.findall(text)
        chunks = sorted(by_doc.get(i, []))
        if not words:
            assert chunks == []
            continue
        for cid, txt, ntok in chunks:
            assert len(tok.findall(txt)) == ntok <= chunk
        # each chunk holds exactly its slice of the doc's token stream
        flat = [w for cid, txt, _ in chunks for w in tok.findall(txt)]
        expect = []
        for cid, _, ntok in chunks:
            lo = cid * stride
            expect.extend(words[lo : lo + ntok])
        assert flat == expect
        # full coverage: last chunk ends at the last token
        last_cid, _, last_n = chunks[-1]
        assert last_cid * stride + last_n == len(words)
