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

# Escaping mirrors the reference EXACTLY (tag.go:301-317 write,
# tag.go:147-153 load): keys are written UNESCAPED; each value escapes only
# '|', then '\n' and '=' are escaped on the JOINED value string. A key
# containing '=' therefore truncates at the first '=' on load — reference
# behavior (SplitN(line, "=", 2)), preserved for file-level interop.


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


def merge_tag_index(
    a: dict[str, list[str]], b: dict[str, list[str]]
) -> dict[str, list[str]]:
    """Union of two dictionaries, values re-natural-sorted per key — the
    incremental-upsert companion (index/upsert.py): re-run build_tag_index
    over just the delta tables and merge, instead of rescanning the world.
    Additive-only by design: entries for deleted rows are vocabulary, not
    row data, and keeping them is reference behavior (the reference never
    removes dictionary entries either, tag.go:43-98)."""
    out: dict[str, list[str]] = {}
    for key in set(a) | set(b):
        out[key] = _natural_sorted(list({*a.get(key, []), *b.get(key, [])}))
    return out


def save_tag_index(index: dict[str, list[str]], path: str) -> None:
    with open(path, "w") as f:
        for key in sorted(index):
            values = "|".join(v.replace("|", "$$PIPE$$") for v in index[key])
            values = values.replace("\n", "$$NEWLINE$$").replace("=", "$$EQUAL$$")
            f.write(f"{key}={values}\n")


def load_tag_index(path: str) -> dict[str, list[str]]:
    out: dict[str, list[str]] = {}
    with open(path) as f:
        for lineno, line in enumerate(f):
            line = line.rstrip("\n")
            if not line:
                continue
            key, sep, values = line.partition("=")
            if not sep:
                raise ValueError(
                    f"wrong format of line {lineno}: '=' expected separating "
                    f"key and value list"
                )
            values = values.replace("$$NEWLINE$$", "\n").replace("$$EQUAL$$", "=")
            # empty entries are KEPT (reference keeps them: tag.go:150-156)
            out[key] = [v.replace("$$PIPE$$", "|") for v in values.split("|")]
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
