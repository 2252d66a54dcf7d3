#!/usr/bin/env python
"""Adversarial variant of the sf0.01 oracle tables.

The driver's correctness gate runs every declared query against DuckDB on
`/root/testdata/sf0.01` — whose documents/events/embeddings contain ZERO
NULLs, empty strings, whitespace-only text, Unicode stress, timestamp
ties, or zero-norm vectors (measured round 8). Engine-vs-oracle
divergences that live only on those shapes are invisible to it; the
round-7/8 latent fixes (NULL-text spans, NULL-user sliding spine, the
prefix-sum NULL offset) were all exactly this class, found by hand.

This script derives a schema-identical copy of sf0.01 with those shapes
injected DETERMINISTICALLY (fixed modular index rules, no RNG), leaving
the TPC-H-ish relational tables untouched (their queries assume the
TPC-H NOT NULL contract). Both engines read the same perturbed parquet,
so any comparison failure is an engine-semantics divergence, not data
noise.

Usage:
    python scripts/gen_adversarial.py [--tier hostile|empty|singleton|skew|
                                       timeedge|allnull|keyedge]
                                      [--out DIR]   # default: per-tier /tmp path
    SPARK_GRAFT_SF_TEST=/tmp/sfadv python -m pytest tests/test_oracle.py -q

This docstring documents the default --tier hostile value rules; the
round-9 shape tiers (empty / singleton / skew / timeedge) are described
at their definitions below.

Perturbation map (index i is the row position in the source table):

documents (500 rows)
  i % 29 == 0   text -> NULL
  i % 31 == 1   text -> ''            (empty)
  i % 37 == 2   text -> ' \t\n  \t '  (whitespace-only)
  i % 41 == 3   text -> 'solo'        (single token)
  i % 43 == 4   text -> Unicode stress (ß, CJK, Cyrillic, emoji,
                combining accents; case-STABLE chars only — see below)
  i % 23 == 5   text -> exact copy of row (i*7+11) % 500 (dup families)
  i % 19 == 6   text -> row (i*3+29) % 500 + ' extra token' (near-dup)
  i % 59 == 9   text -> pathological valid UTF-8 (NUL byte, C0 controls,
                zero-width space/joiner, combining marks, astral plane,
                DEL, BOM-as-ZWNBSP mid-string)
  i % 61 == 10  text -> one 4096-char token + ' tail' (degenerate
                token-length distribution; stresses shingles/regex)
  i % 47 == 7   lang -> NULL
  i % 53 == 8   source -> NULL
  n_chars is recomputed as length(text) (NULL for NULL text) so the
  generator preserves the source invariant n_chars == length(text).

events (10000 rows)
  i % 43 == 7   ts -> NULL            (applied first; rules below skip it)
  i % 17 == 0   user_id -> NULL
  i % 19 == 1   event_type -> NULL
  i % 23 == 2   value -> NULL
  i % 29 == 3   props -> NULL
  i % 31 == 4   props -> 'not json'   (malformed)
  i % 37 == 5   props -> '{"k": null}'
  i % 41 == 6   props -> '{}'         (missing key)
  i % 13 == 8   ts -> truncated to the exact hour (window boundary)
  i % 11 == 9   ts -> copied from row i-1 (tie; event_id still unique)
  i % 47 == 10  value -> NaN   (failed sensor; both engines propagate
  i % 53 == 11  value -> +Inf   NaN/Inf through SUM/MIN/MAX/windows
  i % 59 == 12  value -> -Inf   identically — moment estimators differ:
                DuckDB STDDEV/CORR raise Out of Range on non-finite
                input where Spark yields NaN, so moment-based queries
                must declare non-finite measurements out of scope)

embeddings (500 rows)
  i % 13 == 0   embedding -> all-zero vector (zero norm)
  i % 17 == 1   embedding -> exact copy of row (i*11+3) % 500
  i % 19 == 2   embedding -> NaN in lane (i % dim) (NaN norm, not null —
                within the dense fixed-dim contract, unlike NULL/ragged)
  i % 29 == 4   embedding -> +Inf in lane (i % dim), -Inf in lane
                ((i+1) % dim) (Inf norm; dot products overflow to ±Inf,
                cosine degenerates to NaN)
  i % 23 == 3   label -> NULL
  (embedding stays non-NULL and fixed-dim: the ANN operators' declared
  contract is a dense fixed-dim column; NULL/ragged vectors are
  rejected upstream by the pipeline, not handled per-query. NaN/Inf
  COMPONENTS are representable inside that contract, so they are
  injected.)
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.01"
UNTOUCHED = [
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
]

# Case-STABLE Unicode only (lowercasing is the identity for every char
# here): JVM and DuckDB case mappings legitimately differ on Turkish
# dotted I, Greek final sigma, etc. — a divergence the engine documents
# as out of parity scope (operators/textops.py case-parity caveat), so
# including case-unstable chars here would only re-flag the accepted
# caveat on every md5/lower-dependent query and drown actionable signal.
UNICODE_STRESS = (
    "straße ırmak οδος τέλος ςσ 你好 世界 мир приве́т "
    "café résumé 🦄 emoji"
)


# Pathological but VALID UTF-8: every code point here round-trips through
# parquet, JVM strings, Arrow, and DuckDB. NUL and C0 controls are legal
# inside UTF-8 strings (only C strings treat \x00 as a terminator);
# zero-width space/joiner are format chars that most \s-style tokenizers
# do NOT split on; U+FEFF mid-string is ZERO WIDTH NO-BREAK SPACE, not a
# BOM; the astral-plane chars exercise any code path that wrongly counts
# UTF-16 code units instead of code points.
PATHOLOGICAL_UTF8 = (
    "nul\x00byte ctrl\x01\x02seq del\x7fchar "
    "zero​width jo‍iner feff﻿mid "
    "combo é̂̃ astral \U0001f600\U0010fffd tail"
)


def _rebuild(table: pa.Table, cols: dict[str, list]) -> pa.Table:
    arrays = []
    for field in table.schema:
        if field.name in cols:
            arrays.append(pa.array(cols[field.name], type=field.type))
        else:
            arrays.append(table.column(field.name).combine_chunks())
    return pa.Table.from_arrays(arrays, schema=table.schema)


def perturb_documents(table: pa.Table) -> pa.Table:
    text = table.column("text").to_pylist()
    lang = table.column("lang").to_pylist()
    source = table.column("source").to_pylist()
    n = len(text)
    orig = list(text)
    for i in range(n):
        if i % 29 == 0:
            text[i] = None
        elif i % 31 == 1:
            text[i] = ""
        elif i % 37 == 2:
            text[i] = " \t\n  \t "
        elif i % 41 == 3:
            text[i] = "solo"
        elif i % 43 == 4:
            text[i] = UNICODE_STRESS
        elif i % 23 == 5:
            text[i] = orig[(i * 7 + 11) % n]
        elif i % 19 == 6:
            text[i] = orig[(i * 3 + 29) % n] + " extra token"
        elif i % 59 == 9:
            text[i] = PATHOLOGICAL_UTF8
        elif i % 61 == 10:
            text[i] = "x" * 4096 + " tail"
        if i % 47 == 7:
            lang[i] = None
        if i % 53 == 8:
            source[i] = None
    n_chars = [len(t) if t is not None else None for t in text]
    return _rebuild(
        table, {"text": text, "lang": lang, "source": source, "n_chars": n_chars}
    )


def perturb_events(table: pa.Table) -> pa.Table:
    ts = table.column("ts").to_pylist()
    user_id = table.column("user_id").to_pylist()
    event_type = table.column("event_type").to_pylist()
    value = table.column("value").to_pylist()
    props = table.column("props").to_pylist()
    n = len(ts)
    for i in range(n):
        if i % 43 == 7:
            ts[i] = None
        if i % 17 == 0:
            user_id[i] = None
        if i % 19 == 1:
            event_type[i] = None
        if i % 23 == 2:
            value[i] = None
        if i % 29 == 3:
            props[i] = None
        elif i % 31 == 4:
            props[i] = "not json"
        elif i % 37 == 5:
            props[i] = '{"k": null}'
        elif i % 41 == 6:
            props[i] = "{}"
        if i % 13 == 8 and ts[i] is not None:
            ts[i] = ts[i].replace(minute=0, second=0, microsecond=0)
        if i % 11 == 9 and i > 0 and ts[i] is not None and ts[i - 1] is not None:
            ts[i] = ts[i - 1]
        if i % 47 == 10 and value[i] is not None:
            value[i] = float("nan")
        elif i % 53 == 11 and value[i] is not None:
            value[i] = float("inf")
        elif i % 59 == 12 and value[i] is not None:
            value[i] = float("-inf")
    return _rebuild(
        table,
        {
            "ts": ts,
            "user_id": user_id,
            "event_type": event_type,
            "value": value,
            "props": props,
        },
    )


def perturb_embeddings(table: pa.Table) -> pa.Table:
    emb = table.column("embedding").to_pylist()
    label = table.column("label").to_pylist()
    n = len(emb)
    dim = len(emb[0])
    orig = list(emb)
    for i in range(n):
        if i % 13 == 0:
            emb[i] = [0.0] * dim
        elif i % 17 == 1:
            emb[i] = orig[(i * 11 + 3) % n]
        elif i % 19 == 2:
            v = list(orig[i])
            v[i % dim] = float("nan")
            emb[i] = v
        elif i % 29 == 4:
            v = list(orig[i])
            v[i % dim] = float("inf")
            v[(i + 1) % dim] = float("-inf")
            emb[i] = v
        if i % 23 == 3:
            label[i] = None
    return _rebuild(table, {"embedding": emb, "label": label})


PERTURB = {
    "documents": perturb_documents,
    "events": perturb_events,
    "embeddings": perturb_embeddings,
}

ALL_TABLES = UNTOUCHED + ["documents", "events", "embeddings"]


# ---------------------------------------------------------------------------
# Round 9: three more hostile tiers sharing the triage harness. The hostile
# tier stresses VALUES (NULL/NaN/Inf/Unicode/ties); these stress SHAPE:
#
#   empty     — every table 0 rows. At 100 TB every filter, partition, and
#               incremental batch eventually presents an empty input; a
#               query that crashes or disagrees with its oracle on empty
#               input is wrong, just rarely.
#   singleton — every table exactly 1 row (head row, so documents.doc_id
#               and embeddings.vec_id stay aligned). n=1 is where sample
#               moments (STDDEV_SAMP, CORR), windows, and seeded
#               algorithms hide undefined behavior.
#   skew      — 90-95% of rows collapse onto one hot key per axis:
#               documents text (one ~450-way exact-dup family), events
#               user_id/event_type (one giant session/window partition),
#               embeddings vector (one ~450-way identical-vector family),
#               lineitem l_partkey and orders o_custkey (one hot join
#               key). Degenerate skew is the shape that exposes
#               nondeterministic tie-breaks and quadratic blow-ups the
#               uniform tiers never reach.
#
# All rules stay deterministic (fixed modular index rules, no RNG) so the
# dirs regenerate byte-identically for the judge.
# ---------------------------------------------------------------------------


def skew_documents(table: pa.Table) -> pa.Table:
    text = table.column("text").to_pylist()
    hot = text[0]
    n = len(text)
    out = [text[i] if i % 10 == 0 else hot for i in range(n)]
    n_chars = [len(t) if t is not None else None for t in out]
    return _rebuild(table, {"text": out, "n_chars": n_chars})


def skew_events(table: pa.Table) -> pa.Table:
    user_id = table.column("user_id").to_pylist()
    event_type = table.column("event_type").to_pylist()
    hot_user, hot_type = user_id[0], event_type[0]
    n = len(user_id)
    user_id = [user_id[i] if i % 10 == 0 else hot_user for i in range(n)]
    event_type = [
        event_type[i] if i % 7 == 0 else hot_type for i in range(n)
    ]
    return _rebuild(table, {"user_id": user_id, "event_type": event_type})


def skew_embeddings(table: pa.Table) -> pa.Table:
    emb = table.column("embedding").to_pylist()
    hot = emb[0]
    n = len(emb)
    emb = [emb[i] if i % 10 == 0 else hot for i in range(n)]
    return _rebuild(table, {"embedding": emb})


def skew_lineitem(table: pa.Table) -> pa.Table:
    pk = table.column("l_partkey").to_pylist()
    hot = pk[0]
    n = len(pk)
    pk = [pk[i] if i % 20 == 0 else hot for i in range(n)]
    return _rebuild(table, {"l_partkey": pk})


def skew_orders(table: pa.Table) -> pa.Table:
    ck = table.column("o_custkey").to_pylist()
    hot = ck[0]
    n = len(ck)
    ck = [ck[i] if i % 20 == 0 else hot for i in range(n)]
    return _rebuild(table, {"o_custkey": ck})


SKEW_PERTURB = {
    "documents": skew_documents,
    "events": skew_events,
    "embeddings": skew_embeddings,
    "lineitem": skew_lineitem,
    "orders": skew_orders,
}


# ---------------------------------------------------------------------------
# Tier "timeedge": representable-but-extreme VALUES at type boundaries.
#
#   events.ts    — pre-epoch timestamps (negative epoch seconds: every
#                  epoch-div bucket, gap, and window computation must
#                  FLOOR, not truncate toward zero — the classic
#                  integer-division divergence), the exact epoch
#                  boundary ±1 µs, and a far future inside the
#                  TIMESTAMP(NANOS) int64 range (≤ 2262-04-11).
#   events.value — ±1e308 (SUM overflows to ±Inf in IEEE — both engines
#                  must agree), 5e-324 (subnormal), 1e-308.
#   embeddings   — one lane at ±1e200 (self-dot overflows to +Inf: the
#                  vector is degenerate by the declared isfinite(v·v)
#                  contract even though every COMPONENT is finite), and
#                  an all-1e-170 vector (norm-product underflow: cosine
#                  = nonzero/0 → ±Inf quotient, the round-9 ADVICE
#                  shape, exercised end-to-end here).
#
# All timestamps stay µs-aligned: the engine documents nanos→micros
# truncation at ingest (sources/parquet.py), so sub-µs residue is out of
# the declared contract.
# ---------------------------------------------------------------------------


def timeedge_events(table: pa.Table) -> pa.Table:
    from datetime import datetime, timedelta

    ts = table.column("ts").to_pylist()
    value = table.column("value").to_pylist()
    n = len(ts)
    for i in range(n):
        if i % 101 == 0:
            ts[i] = datetime(1965, 3, 7, 12, 34, 56, 789000) + timedelta(
                seconds=i
            )
        elif i % 103 == 1:
            ts[i] = datetime(1969, 12, 31, 23, 59, 59, 999999)
        elif i % 107 == 2:
            ts[i] = datetime(1970, 1, 1, 0, 0, 0, 1)
        elif i % 109 == 3:
            ts[i] = datetime(2250, 6, 15, 6, 7, 8, 91011 % 1000000) + timedelta(
                minutes=i % 1440
            )
        if i % 113 == 4:
            value[i] = 1e308
        elif i % 127 == 5:
            value[i] = -1e308
        elif i % 131 == 6:
            value[i] = 5e-324
        elif i % 137 == 7:
            value[i] = 1e-308
        elif i % 139 == 8:
            # ±9.7e153: each value's square is representable but ONE
            # deviation pair overflows a moment accumulator — the shape
            # that proved a per-value sqrt(DBL_MAX) bound insufficient
            # (round-9 review). Must be excluded by the measurability
            # contract on both engines.
            value[i] = 9.7e153 if i % 2 == 0 else -9.7e153
        elif i % 149 == 9:
            # ±9e99: inside the declared 1e100 bound — large magnitudes
            # that must still MEASURE identically on both engines.
            value[i] = 9e99 if i % 2 == 0 else -9e99
    return _rebuild(table, {"ts": ts, "value": value})


def timeedge_embeddings(table: pa.Table) -> pa.Table:
    emb = table.column("embedding").to_pylist()
    n = len(emb)
    dim = len(emb[0])
    for i in range(n):
        if i % 13 == 0:
            v = list(emb[i])
            v[i % dim] = 1e200 if i % 2 == 0 else -1e200
            emb[i] = v
        elif i % 17 == 1:
            emb[i] = [1e-170] * dim
    return _rebuild(table, {"embedding": emb})


TIMEEDGE_PERTURB = {
    "events": timeedge_events,
    "embeddings": timeedge_embeddings,
}


# ---------------------------------------------------------------------------
# Tier "allnull" (round 10): every nullable ANALYTIC column 100% NULL
# while every row and primary key survives. Distinct from both existing
# NULL-bearing shapes: the hostile tier scatters NULLs so valid rows
# always anchor every group/window/join, and the empty tier removes the
# rows themselves — this tier keeps the rows and removes the values, so
# code that branches on "has rows" must then aggregate, group, window,
# join, tokenize, and rank over NOTHING but NULL keys and NULL measures
# (one all-NULL group per keyed operator, zero measurable values, zero
# tokens corpus-wide, no timestamps to bucket). At 100 TB this is a
# real shape: a malformed upstream delivery or a schema-mapping bug
# yields exactly full-size files with intact keys and dead columns.
#
#   documents  — text/lang/source NULL everywhere; n_chars NULL (the
#                generator-preserved invariant n_chars == length(text)).
#   events     — ts/user_id/event_type/value/props NULL everywhere.
#   embeddings — label NULL everywhere; the embedding column itself
#                stays non-NULL (the ANN operators' declared contract
#                is a dense fixed-dim column; NULL vectors are rejected
#                upstream by the pipeline, not handled per-query).
# ---------------------------------------------------------------------------


def allnull_documents(table: pa.Table) -> pa.Table:
    nulls = [None] * table.num_rows
    return _rebuild(
        table,
        {"text": nulls, "lang": nulls, "source": nulls, "n_chars": nulls},
    )


def allnull_events(table: pa.Table) -> pa.Table:
    nulls = [None] * table.num_rows
    return _rebuild(
        table,
        {
            "ts": nulls,
            "user_id": nulls,
            "event_type": nulls,
            "value": nulls,
            "props": nulls,
        },
    )


def allnull_embeddings(table: pa.Table) -> pa.Table:
    return _rebuild(table, {"label": [None] * table.num_rows})


ALLNULL_PERTURB = {
    "documents": allnull_documents,
    "events": allnull_events,
    "embeddings": allnull_embeddings,
}


# ---------------------------------------------------------------------------
# Tier "keyedge" (round 10): ids drawn from the FULL int64 range —
# INT64_MAX-adjacent, INT64_MIN-adjacent, and small negatives — with
# uniqueness (and, for user_id, group identity) preserved. Realistic at
# 100 TB: production pipelines key documents and events by 64-bit
# content/snowflake hashes, so ids near ±2^63 are ordinary inputs, and
# any id ARITHMETIC (scaling, offsetting, modular synthesis) that was
# only ever exercised on small dense test ids overflows exactly here —
# ANSI engines raise where legacy engines wrap, so an overflow is an
# engine-vs-oracle divergence, not a silent wrong answer. The
# relational TPC-H tables keep their dense keys (their cross-table
# join contract would need a coordinated remap; the LLM-pipeline
# tables are where hash-derived ids actually occur).
#
#   documents.doc_id / embeddings.vec_id / events.event_id — row-index
#       rule: i%11==0 -> INT64_MAX - i, ==1 -> INT64_MIN + 1 + i,
#       ==2 -> -(i+1); else unchanged. Distinct by construction and
#       disjoint from the small non-negative originals.
#   events.user_id — VALUE-keyed injective rule (u%5) so every row of
#       a user maps to the same new id and grouping structure is
#       byte-identical on both engines.
# ---------------------------------------------------------------------------

_I64MAX = (1 << 63) - 1
_I64MIN = -(1 << 63)


def _edge_id(x: int, residue: int, keep: int) -> int:
    """The single source of truth for the keyedge boundary-id rule
    (round-10 review: the row-index and user-value mappings used to
    carry two copies of these branches): residue 0 -> INT64_MAX - x,
    1 -> INT64_MIN + 1 + x, 2 -> -(x + 1), otherwise ``keep``."""
    if residue == 0:
        return _I64MAX - x
    if residue == 1:
        return _I64MIN + 1 + x
    if residue == 2:
        return -(x + 1)
    return keep


def _keyedge_row_ids(ids: list) -> list:
    return [_edge_id(i, i % 11, v) for i, v in enumerate(ids)]


def keyedge_documents(table: pa.Table) -> pa.Table:
    return _rebuild(
        table, {"doc_id": _keyedge_row_ids(table.column("doc_id").to_pylist())}
    )


def keyedge_embeddings(table: pa.Table) -> pa.Table:
    return _rebuild(
        table, {"vec_id": _keyedge_row_ids(table.column("vec_id").to_pylist())}
    )


def keyedge_events(table: pa.Table) -> pa.Table:
    event_id = _keyedge_row_ids(table.column("event_id").to_pylist())
    user_id = [
        None if u is None else _edge_id(u, u % 5, u)
        for u in table.column("user_id").to_pylist()
    ]
    return _rebuild(table, {"event_id": event_id, "user_id": user_id})


KEYEDGE_PERTURB = {
    "documents": keyedge_documents,
    "events": keyedge_events,
    "embeddings": keyedge_embeddings,
}

TIER_DEFAULT_OUT = {
    "hostile": "/tmp/sfadv",
    "empty": "/tmp/sfadv_empty",
    "singleton": "/tmp/sfadv_one",
    "skew": "/tmp/sfadv_skew",
    "timeedge": "/tmp/sfadv_time",
    "allnull": "/tmp/sfadv_null",
    "keyedge": "/tmp/sfadv_key",
}


def generate(out_dir: str, src: str = SRC, tier: str = "hostile") -> None:
    os.makedirs(out_dir, exist_ok=True)
    if tier == "hostile":
        for name in UNTOUCHED:
            shutil.copyfile(
                os.path.join(src, f"{name}.parquet"),
                os.path.join(out_dir, f"{name}.parquet"),
            )
        for name, fn in PERTURB.items():
            table = pq.read_table(os.path.join(src, f"{name}.parquet"))
            out = fn(table)
            assert out.schema == table.schema, f"{name}: schema drifted"
            assert out.num_rows == table.num_rows, f"{name}: rows drifted"
            pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    elif tier in ("empty", "singleton"):
        n_keep = 0 if tier == "empty" else 1
        for name in ALL_TABLES:
            table = pq.read_table(os.path.join(src, f"{name}.parquet"))
            out = table.slice(0, n_keep)
            assert out.schema == table.schema, f"{name}: schema drifted"
            pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    elif tier in ("skew", "timeedge", "allnull", "keyedge"):
        perturb = {
            "skew": SKEW_PERTURB,
            "timeedge": TIMEEDGE_PERTURB,
            "allnull": ALLNULL_PERTURB,
            "keyedge": KEYEDGE_PERTURB,
        }[tier]
        for name in ALL_TABLES:
            table = pq.read_table(os.path.join(src, f"{name}.parquet"))
            fn = perturb.get(name)
            out = fn(table) if fn else table
            assert out.schema == table.schema, f"{name}: schema drifted"
            assert out.num_rows == table.num_rows, f"{name}: rows drifted"
            pq.write_table(out, os.path.join(out_dir, f"{name}.parquet"))
    else:
        raise SystemExit(f"unknown tier: {tier}")
    print(f"adversarial tables (tier={tier}) written to {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--tier",
        default="hostile",
        choices=sorted(TIER_DEFAULT_OUT),
        help="which hostile shape family to generate",
    )
    ap.add_argument(
        "--out",
        default=None,
        help="output dir (default: per-tier /tmp path)",
    )
    args = ap.parse_args()
    generate(args.out or TIER_DEFAULT_OUT[args.tier], tier=args.tier)
