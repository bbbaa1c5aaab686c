"""Tag dictionary build + reference-format text persistence (A2, S8).

The reference builds a key->values dictionary over every object during
import pass 1 (/root/reference/src/index/tag.go:43-98), natural-sorts each
key's values (tag.go:58-67) and persists one `key=v1|v2|...` line per key
with `$$EQUAL$$`/`$$PIPE$$`/`$$NEWLINE$$` escaping (tag.go:148-152,304-308;
load: tag.go:111-170).

Our engine does not NEED the dictionary (filters compare decoded values
directly), but it is part of the reference's API surface — queries against a
reference-built index can be interop-checked, and the dictionary doubles as
the distinct-tag statistics table (useful for planning).

Build is distributed: explode tags -> distinct (hash-partitionable); only
the (small) distinct set is collected for the natural sort.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions.natural_sort import natural_is_less_py

_ESCAPES = [("=", "$$EQUAL$$"), ("|", "$$PIPE$$"), ("\n", "$$NEWLINE$$")]


def _escape(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(raw, esc)
    return s


def _unescape(s: str) -> str:
    for raw, esc in _ESCAPES:
        s = s.replace(esc, raw)
    return s


def _natural_sorted(values: list[str]) -> list[str]:
    def cmp(a: str, b: str) -> int:
        if natural_is_less_py(a, b):
            return -1
        if natural_is_less_py(b, a):
            return 1
        return 0

    return sorted((v.strip() for v in values), key=functools.cmp_to_key(cmp))


def build_tag_index(*tag_dfs: DataFrame) -> dict[str, list[str]]:
    """Distinct (key, value) pairs over any number of tables carrying a
    ``tags`` map column; values natural-sorted per key."""
    distinct = None
    for df in tag_dfs:
        kv = df.select(F.explode("tags").alias("k", "v"))
        distinct = kv if distinct is None else distinct.unionByName(kv)
    assert distinct is not None
    rows = (
        distinct.distinct()
        .groupBy("k")
        .agg(F.collect_list("v").alias("vs"))
        .collect()
    )
    return {r.k: _natural_sorted(list(r.vs)) for r in rows}


def save_tag_index(index: dict[str, list[str]], path: str) -> None:
    with open(path, "w") as f:
        for key in sorted(index):
            values = "|".join(_escape(v) for v in index[key])
            f.write(f"{_escape(key)}={values}\n")


def load_tag_index(path: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            key, _, values = line.partition("=")
            out[_unescape(key)] = [_unescape(v) for v in values.split("|") if v != ""]
    return out


def value_index(index: dict[str, list[str]], key: str, value: str) -> int | None:
    """Dictionary position of a value under its key (None if absent) —
    the reference's GetIndicesFromKeyValueStrings (tag.go:190-213)."""
    try:
        return index[key].index(value)
    except (KeyError, ValueError):
        return None


def next_lower_value_index(index: dict[str, list[str]], key: str, value: str) -> int | None:
    """Largest position whose value is strictly less than ``value`` under
    natural order — GetNextLowerValueIndexForKey (tag.go:215-230)."""
    values = index.get(key)
    if not values:
        return None
    best = None
    for i, v in enumerate(values):
        if natural_is_less_py(v, value):
            best = i
    return best
