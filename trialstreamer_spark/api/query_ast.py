"""Nested boolean query AST → Spark Column predicates (SURVEY G3, F4).

The reference's search notebook (nb/testing pico mesh search.ipynb:
``nested_mesh`` / ``nested_subtrees`` / ``nested_pa`` / ``queryize`` /
``make_pico_q2``) builds SQL from nested lists like::

    p = ["Migraine", ["OR", "Migraine with Aura", "Migraine Disorders"]]

- a list whose first element is ``"OR"``/``"AND"`` combines its rest
  with that operator; any other list is an implicit AND;
- leaves are MeSH term strings, matched against the ``mesh_term`` key of
  the field's concept array (the jsonb ``@>`` containment, F4);
- rewrite passes expand leaves in place: free text → matched MeSH terms,
  term → its ontology subtree, drug class → member drugs.

Here the same three rewrites operate on the AST and the compiler emits a
``Column`` tree of ``exists(field_mesh, x -> x.mesh_term IN (...))``
conjuncts/disjuncts — Catalyst's expression tree is the target IR, so
expansion stays query-build-time exactly as in the reference (SURVEY §4).
"""

from __future__ import annotations

from collections.abc import Callable
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Ast = str | list

_OPS = ("OR", "AND")


def _map_leaves(ast: Ast, fn: Callable[[str], Ast]) -> Ast:
    """Apply fn to every leaf; operator markers pass through. A leaf
    rewrite returning multiple terms becomes an OR group (reference
    nested_* helpers)."""
    if isinstance(ast, str):
        if ast in _OPS:
            return ast
        return fn(ast)
    return [_map_leaves(i, fn) for i in ast]


def _expansion(terms: list[str], fallback: str) -> Ast:
    terms = list(dict.fromkeys(terms))  # stable-dedupe
    if not terms:
        return fallback
    if len(terms) == 1:
        return terms[0]
    return ["OR", *terms]


def expand_mesh(ast: Ast, match_terms: Callable[[str], list[str]]) -> Ast:
    """Free-text leaf → matched MeSH terms (ref nested_mesh; the matcher
    is the minimap-style dictionary NER — functions.text.match_concepts
    at corpus scale, or a plain dict lookup for query strings)."""
    return _map_leaves(ast, lambda s: _expansion(match_terms(s), s))


def expand_subtrees(ast: Ast, subtree: Callable[[str], list[str]]) -> Ast:
    """Term leaf → OR of its ontology subtree (ref nested_subtrees)."""
    return _map_leaves(ast, lambda s: _expansion(subtree(s), s))


def expand_drug_classes(ast: Ast, drugs_from_class: dict[str, list[str]]) -> Ast:
    """Drug-class leaf → OR of member drugs (ref nested_pa); non-class
    leaves pass through unchanged."""
    return _map_leaves(
        ast,
        lambda s: _expansion(drugs_from_class[s], s)
        if s in drugs_from_class
        else s,
    )


def unravel(
    ast: Ast,
    match_terms: Callable[[str], list[str]] | None = None,
    subtree: Callable[[str], list[str]] | None = None,
    drugs_from_class: dict[str, list[str]] | None = None,
) -> Ast:
    """mesh-resolution → subtree → drug-class, the reference's fixed
    rewrite order (``unravel``)."""
    if match_terms is not None:
        ast = expand_mesh(ast, match_terms)
    if subtree is not None:
        ast = expand_subtrees(ast, subtree)
    if drugs_from_class is not None:
        ast = expand_drug_classes(ast, drugs_from_class)
    return ast


def compile_predicate(ast: Ast, field: str, match_key: str = "mesh_term") -> Column:
    """AST → Column over ``{field}_mesh``. Leaves compile to
    ``exists(arr, x -> x[match_key] == term)`` (match_key='cui' gives the
    API's F3 containment; 'mesh_term' the notebook's F4)."""
    col = F.col(f"{field}_mesh")

    def go(node: Ast) -> Column:
        if isinstance(node, str):
            if node in _OPS:
                raise ValueError(f"operator {node!r} in leaf position")
            return F.exists(col, lambda x: x[match_key] == F.lit(node))
        if not node:
            raise ValueError("empty query group")
        if isinstance(node[0], str) and node[0] in _OPS:
            op = (lambda a, b: a | b) if node[0] == "OR" else (lambda a, b: a & b)
            parts = node[1:]
        else:
            op = lambda a, b: a & b  # noqa: E731  (implicit AND)
            parts = node
        if not parts:
            raise ValueError("operator group with no operands")
        return reduce(op, (go(p) for p in parts))

    return go(ast)


def pico_query(
    annotations: DataFrame,
    p: Ast | None = None,
    i: Ast | None = None,
    o: Ast | None = None,
    registry_links: DataFrame | None = None,
    pubmed: DataFrame | None = None,
    match_key: str = "mesh_term",
) -> DataFrame:
    """The composable search join (ref make_pico_q2, J4): per-field ASTs
    ANDed on the annotations table, optional equi-joins to
    registry_links (adds regid) and pubmed (adds ti/ab). String inputs
    are single-leaf queries."""
    preds = [
        compile_predicate(ast, field, match_key)
        for field, ast in (("population", p), ("interventions", i), ("outcomes", o))
        if ast is not None
    ]
    if not preds:
        raise ValueError("No terms in the search")
    out = annotations.filter(reduce(lambda a, b: a & b, preds)).select("pmid")
    if registry_links is not None:
        out = out.join(registry_links.select("pmid", "regid"), "pmid")
    if pubmed is not None:
        out = out.join(pubmed.select("pmid", "ti", "ab"), "pmid")
    return out
