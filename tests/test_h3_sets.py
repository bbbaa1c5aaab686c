"""H3 compact/uncompact set operations vs independent python oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd

from simple_osm_queries_spark.functions import h3 as H
from simple_osm_queries_spark.functions import h3_encode as E
from simple_osm_queries_spark.operators import h3_sets as S


def _children_py(h: int, res: int) -> list[int]:
    """All children one level down (python oracle)."""
    digits = (0, 2, 3, 4, 5, 6) if H.is_pentagon_py(h) else tuple(range(7))
    shift = H._digit_shift(res)
    base = (h & ~(0xF << 52) & ~(7 << shift)) | (res << 52)
    return [base | (d << shift) for d in digits]


def _uncompact_py(cells: list[int], res: int) -> set[int]:
    out = set()
    stack = list(cells)
    while stack:
        c = stack.pop()
        r = H.resolution_py(c)
        if r == res:
            out.add(c)
        else:
            stack.extend(_children_py(c, r + 1))
    return out


def _cells_fixture(res: int) -> list[int]:
    # encoder-produced real cells over a mixed region incl. a pentagon area
    lon = np.concatenate([np.linspace(9.8, 10.3, 40), np.linspace(10.0, 11.5, 30)])
    lat = np.concatenate([np.linspace(53.4, 53.9, 40), np.linspace(63.8, 65.5, 30)])
    return sorted(set(E.lnglat_to_cell(lon, lat, res).view(np.int64).tolist()))


def _df(spark, cells):
    return spark.createDataFrame(pd.DataFrame({"cell": np.array(cells, dtype=np.int64)}))


def test_uncompact_matches_python_oracle(spark):
    cells = _cells_fixture(4)
    got = {r.cell for r in S.uncompact_cells(_df(spark, cells), 6).collect()}
    want = _uncompact_py(cells, 6)
    assert got == want
    # counts: hexagons contribute 49, any pentagon fewer
    assert len(got) <= 49 * len(cells)


def test_compact_inverts_uncompact(spark):
    cells = _cells_fixture(5)
    u = S.uncompact_cells(_df(spark, cells), 7)
    back = {r.cell for r in S.compact_cells(u).collect()}
    assert back == set(cells)


def test_compact_partial_families_stay(spark):
    # remove one child from one family: that family must NOT compact
    cells = _cells_fixture(5)[:4]
    u = sorted({r.cell for r in S.uncompact_cells(_df(spark, cells), 6).collect()})
    dropped = u[1:]  # drop one child
    back = {r.cell for r in S.compact_cells(_df(spark, dropped)).collect()}
    # the parent of the dropped child must not appear
    victim_parent = H.parent_py(u[0], 5)
    assert victim_parent not in back
    # every remaining sibling of the victim family survives uncompacted
    siblings = {c for c in u[1:] if H.parent_py(c, 5) == victim_parent}
    assert siblings <= back
    # the other families compact back to their parents
    others = {H.parent_py(c, 5) for c in dropped} - {victim_parent}
    assert others <= back


def test_pentagon_family_size(spark):
    # a real pentagon cell (base cell 4's center child chain) expands to 6
    pent0 = (1 << 59) | (0 << 52) | (4 << 45) | H._digits_mask(1)
    assert H.is_pentagon_py(pent0)
    got = S.uncompact_cells(_df(spark, [pent0]), 1).collect()
    assert len(got) == 6
    back = {r.cell for r in S.compact_cells(_df(spark, [r.cell for r in got])).collect()}
    assert back == {pent0}


def test_mixed_resolution_input(spark):
    # mixed-res set: a res-3 cell + the res-4 children of a NEIGHBOR cell
    a, b = _cells_fixture(3)[:2]
    kids_b = _children_py(b, 4)
    mixed = [a] + kids_b
    u = {r.cell for r in S.uncompact_cells(_df(spark, mixed), 5).collect()}
    assert u == _uncompact_py(mixed, 5)
    back = {r.cell for r in S.compact_cells(_df(spark, mixed)).collect()}
    assert back == {a, b}


def test_uncompact_rejects_finer_input(spark):
    import pytest as _pytest

    cells = _cells_fixture(5)[:2]
    with _pytest.raises(ValueError, match="coarser than an input cell"):
        S.uncompact_cells(_df(spark, cells), 4).collect()


def test_h3_pyramid_matches_per_level_recompute(spark, dataset):
    """Aggregate-of-aggregates pyramid equals recomputing the rollup
    independently at every resolution."""
    import numpy as np

    from simple_osm_queries_spark.functions import h3_encode as E
    from simple_osm_queries_spark.operators.h3_sets import h3_pyramid

    from pyspark.sql import functions as F

    pts = dataset.nodes.select("lon", "lat")
    res = h3_pyramid(pts, res=8, min_res=5).collect()
    got = {(r.res, r.cell): r.n for r in res}
    assert len(got) == len(res)
    pdf = pts.toPandas()
    # oracle: ANCESTOR-of-the-res-8-assignment per level (H3 children are
    # not geometrically nested, so per-level re-encode is a different — and
    # inconsistent — hierarchy; see the operator docstring)
    from simple_osm_queries_spark.functions import h3 as H

    base = E.lnglat_to_cell(pdf.lon.to_numpy(), pdf.lat.to_numpy(), 8)
    for r_ in range(5, 9):
        anc = np.array([H.parent_py(int(c), r_) for c in base.tolist()], dtype=np.uint64)
        vals, counts = np.unique(anc.view(np.int64), return_counts=True)
        expect = dict(zip(vals.tolist(), counts.tolist()))
        level = {c: n for (rr, c), n in got.items() if rr == r_}
        assert level == expect, f"res {r_}"
        assert sum(level.values()) == len(pdf)  # every row exactly once

    # custom aggs referencing input columns (regression: the base projection
    # must keep df columns visible to the aggregate expressions)
    pts2 = dataset.nodes.select("lon", "lat", (F.col("id") % 7).alias("w"))
    res2 = h3_pyramid(
        pts2, res=7, min_res=6,
        aggs={"n": (F.count("*"), "sum"), "wmax": (F.max("w"), "max")},
    ).collect()
    assert {r.res for r in res2} == {6, 7}
    assert all(r.wmax is not None for r in res2)
    total_by_res = {}
    for r in res2:
        total_by_res[r.res] = total_by_res.get(r.res, 0) + r.n
    assert total_by_res[6] == total_by_res[7] == pts2.count()


def test_merged_ranges_superset_and_capped():
    """Gap-closing may only WIDEN coverage and must respect the cap."""
    import random

    from simple_osm_queries_spark.operators.spatial_join import _merged_ranges

    rng = random.Random(17)
    for _ in range(50):
        n = rng.randint(1, 200)
        ranges = []
        for _ in range(n):
            lo = rng.randint(0, 10_000)
            ranges.append((lo, lo + rng.randint(0, 50)))
        cap = rng.randint(1, 40)
        merged = _merged_ranges(list(ranges), cap)
        assert len(merged) <= cap
        assert merged == sorted(merged)
        # non-overlapping and non-adjacent output
        for (a0, a1), (b0, b1) in zip(merged, merged[1:]):
            assert b0 > a1 + 1
        # every input id stays covered
        for lo, hi in ranges:
            assert any(m0 <= lo and hi <= m1 for m0, m1 in merged), (lo, hi)


def test_compact_cells_py_matches_distributed(spark):
    """The plan-time numpy compaction and the distributed DataFrame
    operator implement the same spec — cross-validate them on mixed,
    partially-complete family sets (incl. pentagon-region cells)."""
    cells = _cells_fixture(5)
    u = sorted({r.cell for r in S.uncompact_cells(_df(spark, cells), 6).collect()})
    for drop in (0, 1, 7):  # complete, one-missing, several-missing
        subset = u[drop:]
        dist = {r.cell for r in S.compact_cells(_df(spark, subset)).collect()}
        local = set(H.compact_cells_py(subset))
        assert dist == local, f"drop={drop}"


def test_child_range_py_property():
    """Range containment == descendant-ship, for random real cells: every
    digit-constructed descendant falls in [lo, hi]; every same-res
    NON-descendant valid cell falls outside."""
    import random

    rng = random.Random(23)
    base_cells = _cells_fixture(3)
    for _ in range(200):
        c = rng.choice(base_cells)
        rc = H.resolution_py(c)
        child_res = rng.randint(rc, min(rc + 4, 15))
        lo, hi = H.child_range_py(c, child_res)
        # construct a random descendant by appending random digits
        d = (c & ~(0xF << 52)) | (child_res << 52)
        d &= ~H._digits_mask(rc + 1, child_res)
        for i in range(rc + 1, child_res + 1):
            d |= rng.randint(0, 6) << H._digit_shift(i)
        assert lo <= d <= hi
        assert H.parent_py(d, rc) == c
        # a same-res cell under a DIFFERENT parent is outside the range
        other = rng.choice([x for x in base_cells if x != c])
        o = (other & ~(0xF << 52)) | (child_res << 52)
        o &= ~H._digits_mask(H.resolution_py(other) + 1, child_res)
        assert not (lo <= o <= hi)
