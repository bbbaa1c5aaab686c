"""Distance-buffer spatial semi-join — `this.buffer(5m).<type>{...}`.

The reference DOCUMENTS this operator as a future feature and never
implemented it (/root/reference/README.md:154-181: "find all benches that
have any highway-way within a 5m radius"). We implement it as a first-class
distributed operator; semantics:

    EXISTS inner feature f of <type>, satisfying the inner filter, with
    geometric distance(outer, f) <= D meters.

Distance model: local equirectangular meters —
    dx = dlon * 111320 * cos(lat_point),  dy = dlat * 111320
(exact enough at buffer scales of meters-to-kilometers; swap in haversine
for global-scale buffers). Point-to-way distance is the minimum over the
way's stored segments (point-to-segment projection), matching how the
reference stores way geometry as node polylines.

Physical shapes:
* node<->node — equi-join on a buffer-sized grid key with ring-1 expansion
  (shuffle-hash/broadcast on the cell key; exact: grid size >= D ensures a
  point's 3x3 neighborhood covers its whole buffer disk);
* node<->way / way<->way — strategy by inner-side size: broadcast the
  filtered way side with an expanded-bbox candidate predicate (small dim,
  one pass), or bucket both sides onto a D-sized grid and equi-join on the
  cell key (big dim — the Spark analogue of the reference routing ways into
  every cell they touch, grid_writer.go:90-252). The bucketed candidate
  shuffle carries ids + bboxes only; node arrays join back for the exact
  segment-distance refine. No broadcast nested loop at any size.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C

M_PER_DEG = 111320.0


def _meters_k(lat: Column) -> tuple[Column, Column]:
    """(meters per deg lon at lat, meters per deg lat)."""
    return F.lit(M_PER_DEG) * F.cos(F.radians(lat)), F.lit(M_PER_DEG)


def point_dist2_m(lon_a: Column, lat_a: Column, lon_b: Column, lat_b: Column) -> Column:
    kx, ky = _meters_k(lat_a)
    dx = (lon_a - lon_b) * kx
    dy = (lat_a - lat_b) * ky
    return dx * dx + dy * dy


def point_to_way_dist2_m(lon: Column, lat: Column, way_nodes: Column) -> Column:
    """Min squared meter-distance from a point to a way's segment polyline.

    ``way_nodes``: array<struct<id,lon,lat>> in path order.
    """
    kx, ky = _meters_k(lat)
    n = F.size(way_nodes)
    segs = F.zip_with(
        F.slice(way_nodes, 1, n - 1),
        F.slice(way_nodes, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )

    def seg_dist2(s: Column) -> Column:
        ax = (s["a"]["lon"] - lon) * kx
        ay = (s["a"]["lat"] - lat) * ky
        bx = (s["b"]["lon"] - lon) * kx
        by = (s["b"]["lat"] - lat) * ky
        dx = bx - ax
        dy = by - ay
        len2 = dx * dx + dy * dy
        t_raw = F.when(len2 > 0, -(ax * dx + ay * dy) / len2).otherwise(F.lit(0.0))
        t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
        cx = ax + t * dx
        cy = ay + t * dy
        return cx * cx + cy * cy

    first = way_nodes[0]
    single_dist = point_dist2_m(lon, lat, first["lon"], first["lat"])
    return F.coalesce(F.array_min(F.transform(segs, seg_dist2)), single_dist)


def within_buffer_node_node(
    outer_nodes: DataFrame,
    inner_nodes: DataFrame,
    buffer_m: float,
    ref_lat: float = 70.0,
) -> DataFrame:
    """Outer node ids having >=1 inner node within buffer_m meters.

    ``ref_lat`` bounds the data's |latitude| for the lon grid sizing (the
    grid must be at least D meters wide at every data latitude).
    """
    s_lat = buffer_m / M_PER_DEG
    s_lon = buffer_m / (M_PER_DEG * math.cos(math.radians(ref_lat)))
    inner = inner_nodes.select(
        F.col("id").alias("iid"),
        F.col("lon").alias("ilon"),
        F.col("lat").alias("ilat"),
        C.pack_cell(C.cell_x(F.col("lon"), s_lon), C.cell_y(F.col("lat"), s_lat)).alias("cell"),
    )
    ox = C.cell_x(F.col("lon"), s_lon)
    oy = C.cell_y(F.col("lat"), s_lat)
    ring = [
        C.pack_cell(ox + F.lit(dx), oy + F.lit(dy))
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
    ]
    outer = outer_nodes.select("id", "lon", "lat").withColumn(
        "cell", F.explode(F.array(*ring))
    )
    d2 = point_dist2_m(F.col("lon"), F.col("lat"), F.col("ilon"), F.col("ilat"))
    return (
        outer.join(inner, "cell")
        .filter((F.col("id") != F.col("iid")) & (d2 <= F.lit(float(buffer_m) ** 2)))
        .select("id")
        .distinct()
    )


DEFAULT_BUCKET_DEG = 0.01  # ~1.1 km: bounds per-way cell fan-out for
# typical way extents; tune cell_deg to the data's P90 bbox size at scale


def _grid_sizes(buffer_m: float, ref_lat: float, cell_deg: float | None) -> tuple[float, float]:
    """(s_lon, s_lat) bucket sizes in degrees. The cell must be at least the
    buffer at every data latitude (so a D-pad covers the whole disk) and at
    least ``cell_deg`` (so a tiny buffer does not shatter way bboxes into
    millions of cells — fan-out per way is (extent/cell + 2)^2)."""
    floor = DEFAULT_BUCKET_DEG if cell_deg is None else cell_deg
    s_lat = max(buffer_m / M_PER_DEG, floor)
    s_lon = max(buffer_m / (M_PER_DEG * math.cos(math.radians(ref_lat))), floor)
    return s_lon, s_lat


def _bbox_cells_col(
    min_lon: Column,
    min_lat: Column,
    max_lon: Column,
    max_lat: Column,
    s_lon: float,
    s_lat: float,
    pad_lon: Column | None = None,
    pad_lat: Column | None = None,
) -> Column:
    """array<long> of packed grid cells covering a (padded) bbox. cell_x/y
    truncate toward zero but stay monotone, so the [cell(min), cell(max)]
    sequence is a correct cover."""
    zero = F.lit(0.0)
    plon = pad_lon if pad_lon is not None else zero
    plat = pad_lat if pad_lat is not None else zero
    xs = F.sequence(C.cell_x(min_lon - plon, s_lon), C.cell_x(max_lon + plon, s_lon))
    ys = F.sequence(C.cell_y(min_lat - plat, s_lat), C.cell_y(max_lat + plat, s_lat))
    return F.flatten(
        F.transform(xs, lambda x: F.transform(ys, lambda y: C.pack_cell(x, y)))
    )


def _resolve_strategy(inner: DataFrame, strategy: str, broadcast_threshold: int) -> str:
    """'auto' counts the (filtered) inner side up to the threshold: small
    dims broadcast (one pass, no shuffle), big ones take the bucketed
    equi-join (the 100x-scale plan — a BNLJ over a fat inner side is the one
    plan we refuse to ship)."""
    if strategy != "auto":
        return strategy
    n = inner.limit(broadcast_threshold + 1).count()
    return "broadcast" if n <= broadcast_threshold else "bucketed"


def within_buffer_node_way(
    nodes: DataFrame,
    ways: DataFrame,
    buffer_m: float,
    output: str = "node",
    strategy: str = "auto",
    broadcast_threshold: int = 100_000,
    ref_lat: float = 70.0,
    cell_deg: float | None = None,
) -> DataFrame:
    """Ids of nodes with a way within buffer_m (output='node'), or ids of
    ways with a node within buffer_m (output='way').

    ``ways`` must carry (id, nodes, min_lon, min_lat, max_lon, max_lat).
    Physical strategy: broadcast (small filtered way side: D-expanded bbox
    candidate predicate + exact refine in one pass) or bucketed (big way
    side: ways explode to the grid cells of their D-expanded bbox, nodes to
    their own cell, equi-join on cell, pair-distinct on ids only, then the
    exact point-to-polyline refine on joined-back geometry). 'auto' picks by
    counting the way side against ``broadcast_threshold``.
    """
    d_lat = buffer_m / M_PER_DEG
    w = ways.select(
        F.col("id").alias("wid"),
        F.col("nodes").alias("wnodes"),
        "min_lon",
        "min_lat",
        "max_lon",
        "max_lat",
    )
    pt = nodes.select(F.col("id").alias("nid"), "lon", "lat")
    out_col = "nid" if output == "node" else "wid"
    r2 = float(buffer_m) ** 2

    small_ways = _resolve_strategy(w, strategy, broadcast_threshold) == "broadcast"
    if small_ways:
        d_lon = F.lit(buffer_m) / (F.lit(M_PER_DEG) * F.cos(F.radians(F.col("lat"))))
        cand_pred = (
            (F.col("lon") >= F.col("min_lon") - d_lon)
            & (F.col("lon") <= F.col("max_lon") + d_lon)
            & (F.col("lat") >= F.col("min_lat") - F.lit(d_lat))
            & (F.col("lat") <= F.col("max_lat") + F.lit(d_lat))
        )
        cand = pt.join(
            F.broadcast(w.select("wid", "min_lon", "min_lat", "max_lon", "max_lat")),
            cand_pred,
            "inner",
        ).select("nid", "lon", "lat", "wid")
    else:
        # bucketed: equi-join on a D-sized grid key; the candidate shuffle
        # carries (nid, lon, lat, wid) — two extra doubles beat a whole
        # join-back shuffle of the (big) point side
        s_lon, s_lat = _grid_sizes(buffer_m, ref_lat, cell_deg)
        d_lon_w = F.lit(buffer_m) / (
            F.lit(M_PER_DEG)
            * F.cos(F.radians(F.greatest(F.abs(F.col("min_lat")), F.abs(F.col("max_lat")))))
        )
        w_cells = w.select(
            "wid",
            F.explode(
                _bbox_cells_col(
                    F.col("min_lon"), F.col("min_lat"),
                    F.col("max_lon"), F.col("max_lat"),
                    s_lon, s_lat,
                    pad_lon=d_lon_w, pad_lat=F.lit(d_lat),
                )
            ).alias("cell"),
        )
        n_cells = pt.select(
            "nid", "lon", "lat",
            C.pack_cell(C.cell_x(F.col("lon"), s_lon), C.cell_y(F.col("lat"), s_lat)).alias("cell"),
        )
        cand = n_cells.join(w_cells, "cell").select("nid", "lon", "lat", "wid")

    # exact refine on segment ROWS (scalar codegen) — never the array
    # lambda per pair (interpreted; see way_segments docstring). EXISTS
    # semantics = any segment row within r2; output distinct absorbs
    # candidate multiplicity.
    segs = way_segments(w, "wid", "wnodes")
    if small_ways:
        segs = F.broadcast(segs)
    matched = cand.join(segs, "wid").filter(
        pt_seg_d2_m_scalar(
            F.col("lon"), F.col("lat"),
            F.col("alon"), F.col("alat"), F.col("blon"), F.col("blat"),
        )
        <= F.lit(r2)
    )
    return matched.select(F.col(out_col).alias("id")).distinct()


# --- way <-> way (segment-pair distance) -----------------------------------


def segments_col(nodes: Column) -> Column:
    """array<struct<a,b>> of consecutive-node segments; a single-node way
    becomes one degenerate (a == b) segment so the distance math still holds."""
    n = F.size(nodes)
    segs = F.zip_with(
        F.slice(nodes, 1, n - 1),
        F.slice(nodes, 2, n - 1),
        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
    )
    single = F.array(F.struct(nodes[0].alias("a"), nodes[0].alias("b")))
    return F.when(n >= 2, segs).otherwise(single)


def way_segments(
    ways: DataFrame, id_col: str, nodes_col: str, prefix: str = ""
) -> DataFrame:
    """(id, {p}alon, {p}alat, {p}blon, {p}blat) — one row per consecutive-
    node segment. The interpreted `segments_col` lambda runs once per WAY;
    everything downstream of the explode is scalar codegen. This is the
    refine-side representation for all buffer/nearest joins: evaluating the
    array-lambda distance (`point_to_way_dist2_m` / `way_pair_within_m`)
    once per candidate PAIR runs interpreted at ~10 µs/pair — measured 5-20x
    the rest of the join (BENCH.md r5e)."""
    s = ways.select(id_col, F.explode(segments_col(F.col(nodes_col))).alias("_s"))
    return s.select(
        id_col,
        F.col("_s.a.lon").alias(prefix + "alon"),
        F.col("_s.a.lat").alias(prefix + "alat"),
        F.col("_s.b.lon").alias(prefix + "blon"),
        F.col("_s.b.lat").alias(prefix + "blat"),
    )


def pt_seg_d2_m_scalar(
    lon: Column, lat: Column, alon: Column, alat: Column, blon: Column, blat: Column
) -> Column:
    """Squared meter distance from point to segment — the exact expression
    tree of `point_to_way_dist2_m`'s per-segment lambda restated over
    scalar columns (whole-stage codegen; IEEE-identical values, so DuckDB
    twins written for the array form hold)."""
    kx, ky = _meters_k(lat)
    ax = (alon - lon) * kx
    ay = (alat - lat) * ky
    bx = (blon - lon) * kx
    by = (blat - lat) * ky
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t_raw = F.when(len2 > 0, -(ax * dx + ay * dy) / len2).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = ax + t * dx
    cy = ay + t * dy
    return cx * cx + cy * cy


def _pt_seg_d2(px: Column, py: Column, ax: Column, ay: Column, bx: Column, by: Column) -> Column:
    dx = bx - ax
    dy = by - ay
    len2 = dx * dx + dy * dy
    t_raw = F.when(len2 > 0, ((px - ax) * dx + (py - ay) * dy) / len2).otherwise(F.lit(0.0))
    t = F.least(F.greatest(t_raw, F.lit(0.0)), F.lit(1.0))
    cx = ax + t * dx - px
    cy = ay + t * dy - py
    return cx * cx + cy * cy


def _ccw(ax: Column, ay: Column, bx: Column, by: Column, cx: Column, cy: Column) -> Column:
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def seg_pair_dist2_m(sa: Column, sb: Column) -> Column:
    """Min squared meter-distance between two segments (structs a/b of
    lon/lat nodes).

    Decomposition: 0 if the segments properly cross, else the min of the 4
    endpoint-to-other-segment distances — exact for every configuration
    (touching / collinear cases are covered by an endpoint distance of 0,
    so only the strict proper-crossing test is needed). The meter scaling
    uses cos(lat) of segment A's first endpoint; the crossing test runs in
    degree space (axis scaling preserves orientation signs).
    """
    kx = F.lit(M_PER_DEG) * F.cos(F.radians(sa["a"]["lat"]))
    ky = F.lit(M_PER_DEG)
    a1x, a1y = sa["a"]["lon"] * kx, sa["a"]["lat"] * ky
    a2x, a2y = sa["b"]["lon"] * kx, sa["b"]["lat"] * ky
    b1x, b1y = sb["a"]["lon"] * kx, sb["a"]["lat"] * ky
    b2x, b2y = sb["b"]["lon"] * kx, sb["b"]["lat"] * ky
    d = F.least(
        _pt_seg_d2(a1x, a1y, b1x, b1y, b2x, b2y),
        _pt_seg_d2(a2x, a2y, b1x, b1y, b2x, b2y),
        _pt_seg_d2(b1x, b1y, a1x, a1y, a2x, a2y),
        _pt_seg_d2(b2x, b2y, a1x, a1y, a2x, a2y),
    )
    o1 = _ccw(sa["a"]["lon"], sa["a"]["lat"], sa["b"]["lon"], sa["b"]["lat"], sb["a"]["lon"], sb["a"]["lat"])
    o2 = _ccw(sa["a"]["lon"], sa["a"]["lat"], sa["b"]["lon"], sa["b"]["lat"], sb["b"]["lon"], sb["b"]["lat"])
    o3 = _ccw(sb["a"]["lon"], sb["a"]["lat"], sb["b"]["lon"], sb["b"]["lat"], sa["a"]["lon"], sa["a"]["lat"])
    o4 = _ccw(sb["a"]["lon"], sb["a"]["lat"], sb["b"]["lon"], sb["b"]["lat"], sa["b"]["lon"], sa["b"]["lat"])
    crossing = (o1 * o2 < 0) & (o3 * o4 < 0)
    return F.when(crossing, F.lit(0.0)).otherwise(d)


def way_pair_within_m(nodes_a: Column, nodes_b: Column, buffer_m: float) -> Column:
    """True iff min segment-pair distance between two polylines <= buffer_m.

    Column form over node arrays — Spark evaluates the nested exists
    INTERPRETED per pair; the joins below use the exploded scalar form
    (`way_segments` + `seg_pair_d2_m_scalar`) instead. Kept as the
    reference semantics / for ad-hoc use on small frames."""
    d2 = F.lit(float(buffer_m) ** 2)
    segs_b = segments_col(nodes_b)
    return F.exists(
        segments_col(nodes_a),
        lambda sa: F.exists(segs_b, lambda sb: seg_pair_dist2_m(sa, sb) <= d2),
    )


def seg_pair_d2_m_scalar(
    oalon: Column, oalat: Column, oblon: Column, oblat: Column,
    ialon: Column, ialat: Column, iblon: Column, iblat: Column,
) -> Column:
    """`seg_pair_dist2_m`'s exact expression tree over scalar columns
    (outer segment a=(oalon,oalat) b=(oblon,oblat), inner likewise) —
    whole-stage codegen, IEEE-identical to the struct form so the
    `osm_buffer_way_way` DuckDB twin keeps holding."""
    kx = F.lit(M_PER_DEG) * F.cos(F.radians(oalat))
    ky = F.lit(M_PER_DEG)
    a1x, a1y = oalon * kx, oalat * ky
    a2x, a2y = oblon * kx, oblat * ky
    b1x, b1y = ialon * kx, ialat * ky
    b2x, b2y = iblon * kx, iblat * ky
    d = F.least(
        _pt_seg_d2(a1x, a1y, b1x, b1y, b2x, b2y),
        _pt_seg_d2(a2x, a2y, b1x, b1y, b2x, b2y),
        _pt_seg_d2(b1x, b1y, a1x, a1y, a2x, a2y),
        _pt_seg_d2(b2x, b2y, a1x, a1y, a2x, a2y),
    )
    o1 = _ccw(oalon, oalat, oblon, oblat, ialon, ialat)
    o2 = _ccw(oalon, oalat, oblon, oblat, iblon, iblat)
    o3 = _ccw(ialon, ialat, iblon, iblat, oalon, oalat)
    o4 = _ccw(ialon, ialat, iblon, iblat, oblon, oblat)
    crossing = (o1 * o2 < 0) & (o3 * o4 < 0)
    return F.when(crossing, F.lit(0.0)).otherwise(d)


def within_buffer_way_way(
    outer_ways: DataFrame,
    inner_ways: DataFrame,
    buffer_m: float,
    strategy: str = "auto",
    broadcast_threshold: int = 100_000,
    ref_lat: float = 70.0,
    cell_deg: float | None = None,
) -> DataFrame:
    """Outer way ids having >=1 (distinct) inner way within buffer_m meters.

    Physical strategy:
    * broadcast (small filtered inner side) — D-expanded bbox-overlap
      candidate predicate on a broadcast nested loop, exact segment-pair
      refine (0 on crossings) in the same pass. The bbox lon expansion uses
      the pair's worst-case |lat| so candidates stay a superset everywhere.
    * bucketed (big inner side) — both sides explode their bbox to D-sized
      grid cells (inner side D-padded), equi-join on cell with the bbox
      overlap prefilter, pair-distinct on ids only, then geometry joins back
      for the exact refine. All equi-joins — no BNLJ at any size.
    'auto' counts the inner side against ``broadcast_threshold``.
    """
    o = outer_ways.select(
        F.col("id"),
        F.col("nodes").alias("onodes"),
        F.col("min_lon").alias("o_min_lon"),
        F.col("min_lat").alias("o_min_lat"),
        F.col("max_lon").alias("o_max_lon"),
        F.col("max_lat").alias("o_max_lat"),
    )
    i = inner_ways.select(
        F.col("id").alias("iid"),
        F.col("nodes").alias("inodes"),
        F.col("min_lon").alias("i_min_lon"),
        F.col("min_lat").alias("i_min_lat"),
        F.col("max_lon").alias("i_max_lon"),
        F.col("max_lat").alias("i_max_lat"),
    )
    d_lat = buffer_m / M_PER_DEG
    worst_lat = F.greatest(
        F.abs(F.col("o_min_lat")), F.abs(F.col("o_max_lat")),
        F.abs(F.col("i_min_lat")), F.abs(F.col("i_max_lat")),
    )
    d_lon = F.lit(buffer_m) / (F.lit(M_PER_DEG) * F.cos(F.radians(worst_lat)))
    cand = (
        (F.col("o_min_lon") - d_lon <= F.col("i_max_lon"))
        & (F.col("o_max_lon") + d_lon >= F.col("i_min_lon"))
        & (F.col("o_min_lat") - F.lit(d_lat) <= F.col("i_max_lat"))
        & (F.col("o_max_lat") + F.lit(d_lat) >= F.col("i_min_lat"))
    )

    r2 = float(buffer_m) ** 2
    osegs = way_segments(o, "id", "onodes", prefix="o")
    isegs = way_segments(i, "iid", "inodes", prefix="i")
    seg_hit = (
        seg_pair_d2_m_scalar(
            F.col("oalon"), F.col("oalat"), F.col("oblon"), F.col("oblat"),
            F.col("ialon"), F.col("ialat"), F.col("iblon"), F.col("iblat"),
        )
        <= F.lit(r2)
    )

    if _resolve_strategy(i, strategy, broadcast_threshold) == "broadcast":
        # candidate pairs stay a BNLJ on the broadcast bbox-only inner dim;
        # the refine joins segment ROWS (scalar codegen) instead of running
        # the nested-exists array lambda per pair (interpreted — measured
        # 20x the join at 10k x 10k, BENCH.md r5e)
        pairs = o.select(
            "id", "o_min_lon", "o_min_lat", "o_max_lon", "o_max_lat"
        ).join(
            F.broadcast(
                i.select("iid", "i_min_lon", "i_min_lat", "i_max_lon", "i_max_lat")
            ),
            cand & (F.col("id") != F.col("iid")),
            "inner",
        ).select("id", "iid")
        return (
            pairs.join(osegs, "id")
            .join(F.broadcast(isegs), "iid")
            .filter(seg_hit)
            .select("id")
            .distinct()
        )

    # bucketed: equi-join on D-sized grid cells. The candidate shuffle
    # carries ids + bboxes (6 scalars), never the node arrays; geometry
    # joins back onto the deduplicated (id, iid) pairs for the refine.
    s_lon, s_lat = _grid_sizes(buffer_m, ref_lat, cell_deg)
    i_pad_lon = F.lit(buffer_m) / (
        F.lit(M_PER_DEG)
        * F.cos(F.radians(F.greatest(F.abs(F.col("i_min_lat")), F.abs(F.col("i_max_lat")))))
    )
    i_cells = i.select(
        "iid", "i_min_lon", "i_min_lat", "i_max_lon", "i_max_lat",
        F.explode(
            _bbox_cells_col(
                F.col("i_min_lon"), F.col("i_min_lat"),
                F.col("i_max_lon"), F.col("i_max_lat"),
                s_lon, s_lat,
                pad_lon=i_pad_lon, pad_lat=F.lit(d_lat),
            )
        ).alias("cell"),
    )
    o_cells = o.select(
        "id", "o_min_lon", "o_min_lat", "o_max_lon", "o_max_lat",
        F.explode(
            _bbox_cells_col(
                F.col("o_min_lon"), F.col("o_min_lat"),
                F.col("o_max_lon"), F.col("o_max_lat"),
                s_lon, s_lat,
            )
        ).alias("cell"),
    )
    cand_ids = (
        o_cells.join(i_cells, "cell")
        .filter(cand & (F.col("id") != F.col("iid")))
        .select("id", "iid")
        .distinct()
    )
    return (
        cand_ids.join(osegs, "id")
        .join(isegs, "iid")
        .filter(seg_hit)
        .select("id")
        .distinct()
    )
