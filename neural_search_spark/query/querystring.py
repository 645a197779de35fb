"""simple_query_string — the human-facing mini query language
(OpenSearch SimpleQueryStringQueryBuilder → Lucene SimpleQueryParser),
compiled to the engine's existing query kinds rather than executed by a
bespoke scorer: the parse is pure Python, the plan is whatever the target
kinds already produce (fused single-scan bool for the lexical parts).

Supported syntax (the widely-used subset):

    term            analyzed match clause
    "a phrase"      exact phrase (match_phrase; needs a positional index)
    pref*           prefix clause (constant score 1.0, Lucene default)
    -clause         negation (must_not) — applies to any clause form
    +clause         explicit AND for one clause (must) regardless of
                    default_operator

``default_operator`` "or" (default) puts positive clauses in `should`
(minimum_should_match 1); "and" puts them in `must`. NOT offered
(documented): `|`/`(`)` grouping, `~N` fuzziness/slop suffixes, `\\`
escaping — Lucene's SimpleQueryParser degrades gracefully on bad syntax
and so does this parser (unparseable fragments are analyzed as plain
terms; a lone ``*`` matches everything via match_all, like Lucene's
MatchAllDocsQuery rewrite for an empty prefix).

Multi-token inputs inside one clause (e.g. hyphenated originals) analyze
through the standard tokenizer exactly like `match`.
"""

from __future__ import annotations

import re

_TOKEN_RE = re.compile(r'"[^"]*"|\S+')


def parse_simple_query_string(
    query: str, default_operator: str = "or"
) -> dict:
    """Parse the query string into an executable `bool` query dict.

    Returns ``{"bool": {...}}`` (or ``{"match_all"|"match_none": {}}`` for
    degenerate inputs) built purely from existing DSL kinds.
    """
    if default_operator not in ("or", "and"):
        raise ValueError(f"default_operator must be 'or' or 'and', got {default_operator!r}")
    musts: list[dict] = []
    shoulds: list[dict] = []
    must_nots: list[dict] = []
    for raw in _TOKEN_RE.findall(query or ""):
        neg = False
        forced = False
        while raw and raw[0] in "+-":
            if raw[0] == "-":
                neg = True
            else:
                forced = True
            raw = raw[1:]
        if not raw:
            continue
        if raw.startswith('"'):
            inner = raw.strip('"')
            if not inner:
                continue
            clause = {"match_phrase": {"text": {"query": inner}}}
        elif raw.endswith("*"):
            stem = raw[:-1].lower()
            if not stem:
                # bare `*` — MatchAllDocsQuery rewrite
                clause = {"match_all": {}}
            else:
                clause = {"prefix": {"text": {"value": stem}}}
        else:
            clause = {"match": {"text": {"query": raw}}}
        if neg:
            must_nots.append(clause)
        elif forced or default_operator == "and":
            musts.append(clause)
        else:
            shoulds.append(clause)
    if not musts and not shoulds and not must_nots:
        return {"match_none": {}}
    body: dict = {}
    if musts:
        body["must"] = musts
    if shoulds:
        # no explicit minimum_should_match: the bool kind applies Lucene's
        # default (1 with no must/filter clauses, else 0), which is exactly
        # SimpleQueryParser's behavior for "+a b"
        body["should"] = shoulds
    if must_nots:
        body["must_not"] = must_nots
    return {"bool": body}
