"""Deterministic data-mixture composition: combine N corpora at target
weights into one training corpus hitting a token budget.

The step every pretraining pipeline runs last ("70% web, 20% code, 10%
books, 1T tokens total"), in this repo's RNG-free idiom:

- per source, the EXACT token total comes from one streaming scan of
  per-batch partials (``textops.token_count_batch`` + ``sum`` — no
  materialization, no shuffle);
- per-source sampling rates are resolved on the driver by
  deterministic water-filling (``resolve_rates``): a source too small
  for its share is taken whole (rate 1) and its unmet allocation is
  redistributed across the remaining sources by weight, iterating at
  most n_sources times; any budget left when every source is exhausted
  is reported as ``shortfall_tokens`` rather than silently dropped;
  with ``max_epochs > 1`` a too-small source may instead be REPEATED
  (floor(rate) whole passes + one fractional sampled pass, each tagged
  ``mix_epoch`` with independent per-epoch seeds) — the standard
  upsampling knob for small high-quality corpora;
- each source is then sampled with the SQL-reproducible Bernoulli hash
  rule (``sample.hash_sample_batch``) under a per-source seed (so the
  same doc_id in two sources draws independently), tagged with a
  ``mix_source`` column, and unioned — all pure per-batch filters,
  zero shuffle;
- the optional final deterministic shuffle is ONE hash-keyed global
  sort (the ``sample.deterministic_shuffle`` rationale) whose key is
  the per-source-seeded hash with (source, id) tie-breaks, so the
  interleaving is invariant to block layout and engine — reruns give
  byte-identical training order.

Sampling is Bernoulli, so realized token counts concentrate around the
target (exact in expectation; at corpus scale the relative deviation
is O(1/sqrt(n_docs))). The realized sample itself is fully
deterministic — the stats the pipeline returns report both the target
and the expectation.

Sources may have heterogeneous schemas; the union keeps the
intersection of their columns (ordered as in the first source), which
always includes ``id_column`` and ``text_column``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.sketches import hash64
from ..stages.sample import hash_sample_batch, rate_to_ppm
from ..stages.textops import token_count_batch


def resolve_rates(totals: dict[str, int], weights: dict[str, float],
                  token_budget: float, *,
                  max_epochs: int = 1) -> tuple[dict[str, float], float]:
    """Water-filling: per-source keep rates so expected sampled tokens
    hit ``token_budget`` split by ``weights``; a source smaller than
    its share is taken whole and its slack re-split over the rest.
    With ``max_epochs > 1`` a too-small source may be REPEATED — its
    capacity becomes ``total × max_epochs`` and its resolved rate may
    exceed 1 (e.g. 2.4 = two full passes + a 40% sample), the standard
    upsampling knob for small high-quality corpora. Returns
    ``(rates, shortfall_tokens)``. Pure driver arithmetic over
    O(n_sources) numbers — unit-testable without Ray."""
    if token_budget <= 0:
        raise ValueError(f"token_budget must be positive, got {token_budget}")
    if max_epochs < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    bad = [n for n, w in weights.items() if w <= 0]
    if bad:
        raise ValueError(f"weights must be positive, got {bad}")
    rates = {n: 0.0 for n in totals}
    active = sorted(n for n in totals if totals[n] > 0)
    pool = float(token_budget)
    while active and pool > 0:
        wsum = sum(weights[n] for n in active)
        capped = [n for n in active
                  if pool * weights[n] / wsum >= totals[n] * max_epochs]
        if not capped:
            for n in active:
                rates[n] = (pool * weights[n] / wsum) / totals[n]
            pool = 0.0
            break
        for n in capped:
            rates[n] = float(max_epochs)
            pool -= totals[n] * max_epochs
        active = [n for n in active if n not in capped]
    return rates, max(pool, 0.0)


def _source_seed(name: str, seed: int) -> int:
    """Stable per-source seed so identical ids across sources draw
    independent Bernoulli decisions."""
    h = int(hash64(np.array([name], dtype=object))[0])
    return (h ^ (seed * 0x9E3779B97F4A7C15)) % (1 << 62)


def _token_total(ds, text_column: str) -> int:
    counted = ds.map_batches(
        lambda t: token_count_batch(t, text_column).select(["n_tokens"]),
        batch_format="pyarrow",
    )
    return int(counted.sum("n_tokens") or 0)


def mix_corpora(sources: dict, token_budget: float, *,
                weights: dict[str, float] | None = None,
                max_epochs: int = 1,
                id_column: str = "doc_id", text_column: str = "text",
                source_column: str = "mix_source",
                epoch_column: str = "mix_epoch", seed: int = 0,
                shuffle: bool = True):
    """Compose ``sources`` (name -> Dataset) into one mixture Dataset.

    With ``max_epochs > 1``, a source whose resolved rate exceeds 1 is
    emitted as ``floor(rate)`` whole passes plus one fractional-rate
    sampled pass, each tagged with ``mix_epoch`` and drawing its
    Bernoulli decisions / interleave keys from a per-(source, epoch)
    seed — epochs land at independent positions in the training order.

    Returns ``(dataset, stats)``; ``stats`` carries per-source exact
    token totals, resolved rate, target and expected token counts,
    plus any ``shortfall_tokens``. The result streams — nothing beyond
    O(n_sources) numbers ever reaches the driver."""
    names = list(sources)
    if not names:
        raise ValueError("mix_corpora: no sources")
    if weights is None:
        weights = {n: 1.0 for n in names}
    missing = [n for n in names if n not in weights]
    if missing:
        raise ValueError(f"mix_corpora: no weight for sources {missing}")

    totals = {n: _token_total(sources[n], text_column) for n in names}
    rates, shortfall = resolve_rates(totals, weights, token_budget,
                                     max_epochs=max_epochs)

    common = [c for c in sources[names[0]].schema().names
              if all(c in sources[n].schema().names for n in names)]
    for required in (id_column, text_column):
        if required not in common:
            raise ValueError(f"mix_corpora: column {required!r} not shared "
                             f"by every source")
    # helper/tag columns are appended per batch: an input already
    # carrying one would produce DUPLICATE Arrow column names and
    # silently corrupt the sort key / drop_columns (ADVICE r4; the
    # grouped_cap_sample _cap_h guard precedent)
    all_in = {c for n in names for c in sources[n].schema().names}
    clash = sorted(all_in & {"_mix_h", source_column, epoch_column})
    if clash:
        raise ValueError(
            f"mix_corpora: input column(s) {clash} collide with the "
            f"mixture's helper/tag columns — rename them or pass "
            f"different source_column/epoch_column names"
        )

    def _part(n: str, epoch: int, ppm: int):
        sseed = _source_seed(f"{n}#e{epoch}", seed)

        def tag(t: pa.Table, *, _n=n, _e=epoch, _ppm=ppm,
                _sseed=sseed) -> pa.Table:
            # strip pandas/parquet schema metadata so every source's
            # blocks carry the IDENTICAL schema — union/sort otherwise
            # log schema-mismatch noise per bundle (the driver_queries
            # _read precedent)
            t = t.select(common).replace_schema_metadata(None)
            kept = t if _ppm >= 1_000_000 else hash_sample_batch(
                t, rate_ppm=_ppm, id_column=id_column, seed=_sseed)
            key = hash64(kept[id_column].to_numpy(zero_copy_only=False),
                         seed=_sseed).view(np.int64)
            return kept.append_column(
                source_column, pa.array([_n] * kept.num_rows, pa.string())
            ).append_column(
                epoch_column, pa.array([_e] * kept.num_rows, pa.int32())
            ).append_column("_mix_h", pa.array(key, pa.int64()))

        return sources[n].map_batches(tag, batch_format="pyarrow")

    wsum = sum(weights[n] for n in names)
    parts, per_source = [], {}
    for n in names:
        rate = rates[n]
        whole = int(rate + 1e-9)
        frac_ppm = rate_to_ppm(min(max(rate - whole, 0.0), 1.0))
        per_source[n] = {
            "tokens_total": totals[n],
            "rate": rate,
            "epochs_whole": whole,
            "frac_ppm": frac_ppm,
            "target_tokens": token_budget * weights[n] / wsum,
            "expected_tokens": totals[n] * (whole + frac_ppm / 1_000_000),
            "taken_whole": rate >= 1.0,
        }
        for e in range(whole):
            parts.append(_part(n, e, 1_000_000))
        if frac_ppm > 0:
            parts.append(_part(n, whole, frac_ppm))

    if not parts:
        raise ValueError("mix_corpora: every resolved rate is 0 — "
                         "no source has tokens")
    out = parts[0].union(*parts[1:]) if len(parts) > 1 else parts[0]
    if shuffle:
        out = out.sort(["_mix_h", source_column, epoch_column, id_column])
    out = out.drop_columns(["_mix_h"])
    stats = {
        "token_budget": token_budget,
        "shortfall_tokens": shortfall,
        "expected_tokens": sum(s["expected_tokens"]
                               for s in per_source.values()),
        "sources": per_source,
    }
    return out, stats
