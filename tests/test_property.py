"""Property-style randomized testing (SURVEY.md §5): random bboxes and random
filter expression trees, Spark planner vs the Python oracle.

Deterministic seeds (no flaky CI); each case builds a random AST directly so
it also covers shapes the string grammar can produce but our hand-written
query list doesn't.
"""

import random
from collections import Counter

import pytest

from simple_osm_queries_spark.query import ast
from simple_osm_queries_spark.query.planner import plan_query
from tests.oracle import run_oracle

KEYS = ["amenity", "seats", "natural", "height", "addr:housenumber", "name", "nosuchkey"]
VALUES = ["bench", "cafe", "tree", "2", "3", "10", "1.7", "2.5", "yes", "site", "zzz"]
WAY_KEYS = ["highway", "building", "nosuchkey"]
WAY_VALUES = ["primary", "rail", "yes", "light_rail", "zzz"]
OPS = ["=", "!=", ">", ">=", "<", "<="]


def random_filter(rng: random.Random, depth: int, keys, values, outer_type: str) -> ast.FilterExpr:
    choices = ["tag", "key", "and", "or"]
    if depth > 0:
        choices += ["not", "sub", "sub"]
    kind = rng.choice(choices if depth > 0 else ["tag", "key", "tag"])
    if kind == "tag":
        return ast.TagFilter(rng.choice(keys), rng.choice(OPS), rng.choice(values))
    if kind == "key":
        return ast.KeyFilter(rng.choice(keys), rng.random() < 0.5)
    if kind == "and":
        return ast.And(
            random_filter(rng, depth - 1, keys, values, outer_type),
            random_filter(rng, depth - 1, keys, values, outer_type),
        )
    if kind == "or":
        return ast.Or(
            random_filter(rng, depth - 1, keys, values, outer_type),
            random_filter(rng, depth - 1, keys, values, outer_type),
        )
    if kind == "not":
        # grammar restriction: '!' only before '(' or 'this' — semantically a
        # Not around any subtree; we mirror the semantic superset here
        return ast.Not(random_filter(rng, depth - 1, keys, values, outer_type))
    # sub-statement: pick a valid inner type for the outer object type
    valid = {
        "node": ["ways", "relations"],
        "way": ["nodes", "relations"],
        "relation": ["nodes", "ways", "relations", "child_relations"],
    }[outer_type]
    inner_q = rng.choice(valid)
    inner_base = ast.BASE_TYPE[inner_q]
    ik, iv = (WAY_KEYS, WAY_VALUES) if inner_base == "way" else (KEYS, VALUES)
    inner_filter = random_filter(rng, depth - 1, ik, iv, inner_base)
    return ast.SubStatement(ast.Statement(ast.ContextAware(), inner_q, inner_filter))


def random_bbox(rng: random.Random) -> ast.Bbox:
    x0 = rng.uniform(9.88, 10.10)
    y0 = rng.uniform(53.48, 53.70)
    w = rng.uniform(0.0, 0.15)
    h = rng.uniform(0.0, 0.15)
    return ast.Bbox(x0, y0, x0 + w, y0 + h)


@pytest.mark.parametrize("seed", range(20))
def test_random_query_matches_oracle(seed, dataset, oracle_data):
    rng = random.Random(1000 + seed)
    qtype = rng.choice(["nodes", "ways", "relations"])
    keys, values = (WAY_KEYS, WAY_VALUES) if qtype == "ways" else (KEYS, VALUES)
    stmt = ast.Statement(
        random_bbox(rng),
        qtype,
        random_filter(rng, 2, keys, values, ast.BASE_TYPE[qtype]),
    )
    q = ast.Query((stmt,))
    expected = Counter(run_oracle(q, oracle_data))
    got = Counter(
        (r.osm_type, r.id)
        for r in plan_query(q, dataset).select("osm_type", "id").collect()
    )
    assert got == expected, f"seed={seed} stmt={stmt}"
