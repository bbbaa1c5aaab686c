"""Raster <-> vector tile assignment (north rule).

Slippy-map (Web-Mercator) tiles: assigning a point to its tile at zoom z is
pure column math (functions/cells.py), so tile JOIN degenerates to an
equi-join on the computed tile id — no range/spatial join needed, which is
the whole point of tiling at 10^12 scale: the expensive geometry predicate
is replaced by a hash-partitionable key.

``tile_stats`` is the rollup (per-tile aggregation with optional salting for
hot tiles — the reference's extent bin-packer import.go:167-233 solved the
same skew problem at import time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from simple_osm_queries_spark.functions import cells as C


def assign_tiles(
    points: DataFrame, zoom: int, lon: str = "lon", lat: str = "lat", out: str = "tile_id"
) -> DataFrame:
    return points.withColumn(out, C.tile_of(F.col(lon), F.col(lat), zoom))


def tile_join(points: DataFrame, tiles: DataFrame, zoom: int) -> DataFrame:
    """Join points to a tile catalog (tile_id, ...) at the same zoom.

    The catalog is the small side -> broadcast. Truth semantics: a point
    belongs to exactly the tile whose index equals its computed slippy
    index (equivalently: tile bbox containment with right/bottom-exclusive
    edges, the slippy convention).
    """
    pts = assign_tiles(points, zoom)
    return pts.join(F.broadcast(tiles), "tile_id", "inner")


def tile_stats(points: DataFrame, zoom: int, salt: int = 1) -> DataFrame:
    """Per-tile rollup: count + bbox of contained points.

    ``salt > 1`` demonstrates explicit hot-key splitting: partial aggregate
    per (tile, salt) then final merge — the classic two-step combine. With
    AQE on, Spark's partial aggregation usually makes this unnecessary; it
    exists for the pathological single-hot-tile case and as the documented
    skew pattern.
    """
    pts = assign_tiles(points, zoom)
    aggs = [
        F.count("*").alias("n"),
        F.min("lon").alias("min_lon"),
        F.min("lat").alias("min_lat"),
        F.max("lon").alias("max_lon"),
        F.max("lat").alias("max_lat"),
    ]
    if salt <= 1:
        return pts.groupBy("tile_id").agg(*aggs)
    partial = (
        pts.withColumn("__salt", F.pmod(F.col("id"), F.lit(salt)))
        .groupBy("tile_id", "__salt")
        .agg(*aggs)
    )
    return partial.groupBy("tile_id").agg(
        F.sum("n").alias("n"),
        F.min("min_lon").alias("min_lon"),
        F.min("min_lat").alias("min_lat"),
        F.max("max_lon").alias("max_lon"),
        F.max("max_lat").alias("max_lat"),
    )


def tile_parent(tile_id: Column, zoom: int) -> Column:
    """Parent tile id at zoom-1 — pure bit math on the (zoom<<58|tx<<29|ty)
    packing: halve tx and ty, decrement the zoom field."""
    tx = F.shiftright(tile_id, 29).bitwiseAND(F.lit((1 << 29) - 1))
    ty = tile_id.bitwiseAND(F.lit((1 << 29) - 1))
    return (
        F.lit((zoom - 1) << 58)
        + F.shiftleft(F.shiftright(tx, 1), 29)
        + F.shiftright(ty, 1)
    ).cast("long")


def tile_pyramid(
    points: DataFrame, max_zoom: int, min_zoom: int, salt: int = 1
) -> DataFrame:
    """Multi-zoom tile rollup (the hypertable-pyramid shape): per-tile stats
    at ``max_zoom`` from ONE pass over the points, then every coarser level
    folds its four children's AGGREGATES (sum/min/max are decomposable) —
    each level is a shuffle over tile-count rows, never a second scan of
    the data. Output: one row per (zoom, tile_id) for zoom in
    [min_zoom, max_zoom]."""
    if not 0 <= min_zoom <= max_zoom:
        raise ValueError(f"need 0 <= min_zoom <= max_zoom, got {min_zoom}..{max_zoom}")
    cur = tile_stats(points, max_zoom, salt).withColumn("zoom", F.lit(max_zoom))
    levels = [cur]
    for z in range(max_zoom, min_zoom, -1):
        cur = (
            cur.groupBy(tile_parent(F.col("tile_id"), z).alias("tile_id"))
            .agg(
                F.sum("n").alias("n"),
                F.min("min_lon").alias("min_lon"),
                F.min("min_lat").alias("min_lat"),
                F.max("max_lon").alias("max_lon"),
                F.max("max_lat").alias("max_lat"),
            )
            .withColumn("zoom", F.lit(z - 1))
        )
        levels.append(cur)
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def make_tile_catalog(spark, zoom: int, min_lon: float, min_lat: float, max_lon: float, max_lat: float) -> DataFrame:
    """Enumerate the tiles covering a window (driver-side; tiny)."""
    x0, y1 = C.tile_xy_py(min_lon, min_lat, zoom)  # note: y inverted
    x1, y0 = C.tile_xy_py(max_lon, max_lat, zoom)
    rows = []
    for tx in range(min(x0, x1), max(x0, x1) + 1):
        for ty in range(min(y0, y1), max(y0, y1) + 1):
            rows.append((C.tile_id_py(tx, ty, zoom), zoom, tx, ty))
    return spark.createDataFrame(rows, "tile_id long, zoom int, tile_x int, tile_y int")


def tile_pixel_bins(
    points: DataFrame, zoom: int, tile_px: int = 256,
    lon: str = "lon", lat: str = "lat", weight: str | None = None,
) -> DataFrame:
    """Bin points to raster pixels: (tile_id, px, py, cnt) at ``zoom`` with
    ``tile_px``-pixel tiles. Pure column math (the fractional part of the
    same Web-Mercator projection tile_x/tile_y floor), so the whole raster
    aggregation is ONE hash groupBy with map-side partial aggregation —
    the output per tile is bounded by tile_px^2 rows no matter how many
    input points, which is what makes rendering at 10^12 points feasible.

    ``weight``: optional long column summed instead of counting rows —
    re-binning already-aggregated bins (e.g. the pixel_bins_to_points
    round trip) must weight each row by its original count.
    """
    fx, fy = C.tile_fxy(F.col(lon), F.col(lat), zoom)
    tx = F.least(F.greatest(F.floor(fx).cast("int"), F.lit(0)), F.lit((1 << zoom) - 1))
    ty = F.least(F.greatest(F.floor(fy).cast("int"), F.lit(0)), F.lit((1 << zoom) - 1))
    px = F.least(
        F.greatest(F.floor((fx - tx) * F.lit(float(tile_px))).cast("int"), F.lit(0)),
        F.lit(tile_px - 1),
    )
    py = F.least(
        F.greatest(F.floor((fy - ty) * F.lit(float(tile_px))).cast("int"), F.lit(0)),
        F.lit(tile_px - 1),
    )
    cols = [
        C.tile_id(tx, ty, zoom).alias("tile_id"),
        px.alias("px"),
        py.alias("py"),
    ]
    if weight is not None:
        cols.append(F.col(weight).alias("_w"))
    agg = F.count("*") if weight is None else F.sum("_w")
    return (
        points.select(*cols)
        .groupBy("tile_id", "px", "py")
        .agg(agg.cast("long").alias("cnt"))
    )


def tile_heatmap(
    points: DataFrame, zoom: int, tile_px: int = 256,
    lon: str = "lon", lat: str = "lat", log_scale: bool = True,
) -> DataFrame:
    """Render per-tile density rasters as grayscale PNGs — the
    raster<->vector bridge in the rendering direction (vector points in,
    map tiles out; the reference's web UI serves GeoJSON and leaves
    rasterization to the browser, README.md:49-66).

    Two stages: `tile_pixel_bins` (one aggregating shuffle; <= tile_px^2
    rows per tile survive it) then a per-tile applyInPandas that paints
    the canvas and PNG-encodes. Intensity is count-proportional (or
    log1p-scaled for heavy skew), normalized per tile to the max bin.
    Output: (tile_id, zoom, tx, ty, n_points, png binary).
    """
    import pandas as pd

    bins = tile_pixel_bins(points, zoom, tile_px, lon, lat)

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        from simple_osm_queries_spark.sources import codecs

        tid = int(pdf["tile_id"].iloc[0])
        canvas = np.zeros((tile_px, tile_px), dtype=np.float64)
        canvas[pdf["py"].to_numpy(), pdf["px"].to_numpy()] = pdf["cnt"].to_numpy()
        vals = np.log1p(canvas) if log_scale else canvas
        top = vals.max()
        gray = (
            np.zeros((tile_px, tile_px), np.uint8)
            if top <= 0
            else np.clip(np.round(vals / top * 255.0), 0, 255).astype(np.uint8)
        )
        png = codecs.encode_png(np.repeat(gray[..., None], 3, axis=2))
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "zoom": [tid >> 58],
                "tx": [(tid >> 29) & ((1 << 29) - 1)],
                "ty": [tid & ((1 << 29) - 1)],
                "n_points": [int(pdf["cnt"].sum())],
                "png": [png],
            }
        )

    return bins.groupBy("tile_id").applyInPandas(
        render,
        "tile_id long, zoom int, tx int, ty int, n_points long, png binary",
    )


def tile_contact_sheet(
    df: DataFrame,
    zoom: int,
    thumb: int = 32,
    grid: int = 8,
    id_col: str = "image_id",
    lon: str = "lon",
    lat: str = "lat",
    on_error: str = "raise",
) -> DataFrame:
    """Per-tile image contact sheets: the first ``grid^2`` members of each
    tile (deterministic ``id_col`` order), area-resized to ``thumb`` px and
    pasted row-major onto a (grid*thumb)^2 canvas, PNG-encoded — the
    standard corpus-inspection artifact ("what does this map region's
    training data look like").

    Scale shape: member SELECTION runs on the cheap (tile_id, id) columns
    only — window row_number, capped at grid^2 — and the heavy ``bytes``
    column is fetched by a join for the SELECTED rows alone, so at most
    grid^2 images per tile ever cross the render shuffle no matter how
    many rows the tile holds (same caps-before-shuffle discipline as the
    dedup family's max_df/max_bucket).

    ``on_error``: 'raise' (default, trusted corpus) re-raises a codec
    ValueError from any malformed row; 'skip' leaves that slot black and
    keeps rendering (dirty-corpus mode, same knob as multimodal.py).

    ``id_col`` values SHOULD be unique per tile; if they are not, slots
    are assigned per DISTINCT id (dense_rank) and the renderer keeps one
    deterministic representative per slot (smallest bytes) rather than
    double-painting — duplicates can never break the grid^2 cap.

    Output: (tile_id, zoom, tx, ty, n_members, n_shown, png binary).
    """
    import pandas as pd
    from pyspark.sql import Window

    from simple_osm_queries_spark.operators.multimodal import _check_on_error

    _check_on_error(on_error)
    cap = grid * grid
    keyed = assign_tiles(df, zoom, lon=lon, lat=lat)
    slim = keyed.select("tile_id", id_col)
    w = Window.partitionBy("tile_id").orderBy(id_col)
    # n_members rides the same tile_id exchange the ranking already needs
    # (unordered count window) — no second aggregation, no join back.
    wc = Window.partitionBy("tile_id")
    ranked = slim.withColumn("rn", F.dense_rank().over(w)).withColumn(
        "n_members", F.count("*").over(wc)
    )
    chosen = ranked.filter(F.col("rn") <= cap)
    # heavy columns only for the chosen rows
    picked = chosen.join(
        keyed.select("tile_id", id_col, "bytes", "fmt"), ["tile_id", id_col]
    )

    side = grid * thumb

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        from simple_osm_queries_spark.operators.multimodal import (
            _box_mean_grid,
            _decode_or_none,
        )
        from simple_osm_queries_spark.sources import codecs

        # duplicate-id fan-out from the join back: one deterministic
        # representative per slot (ties broken by raw bytes, which is
        # shuffle-order-independent)
        pdf = pdf.sort_values(["rn", "bytes"], kind="mergesort").drop_duplicates(
            subset=["rn"], keep="first"
        )
        tid = int(pdf["tile_id"].iloc[0])
        canvas = np.zeros((side, side, 3), dtype=np.uint8)
        shown = 0
        for rn, data, fmt in zip(pdf["rn"], pdf["bytes"], pdf["fmt"]):
            px = _decode_or_none(
                lambda b: codecs.decode_image(b, fmt), data, on_error
            )
            if px is None:  # on_error='skip': leave the slot black
                continue
            t = np.stack(
                [
                    _box_mean_grid(px[..., c].astype(np.float64), thumb, thumb)
                    for c in range(3)
                ],
                axis=-1,
            )
            t = np.clip(t.round(), 0, 255).astype(np.uint8)
            slot = int(rn) - 1
            r, c = divmod(slot, grid)
            canvas[r * thumb : (r + 1) * thumb, c * thumb : (c + 1) * thumb] = t
            shown += 1
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "zoom": [tid >> 58],
                "tx": [(tid >> 29) & ((1 << 29) - 1)],
                "ty": [tid & ((1 << 29) - 1)],
                "n_members": [int(pdf["n_members"].iloc[0])],
                "n_shown": [shown],
                "png": [codecs.encode_png(canvas)],
            }
        )

    return picked.groupBy("tile_id").applyInPandas(
        render,
        "tile_id long, zoom int, tx int, ty int, n_members long, n_shown int, png binary",
    )


def tile_vectors(
    df: DataFrame,
    zoom: int,
    extent: int = 4096,
    cap: int = 65536,
    layer: str = "nodes",
    id_col: str = "id",
    lon: str = "lon",
    lat: str = "lat",
    tags_col: str | None = "tags",
) -> DataFrame:
    """Vector-tile output for point features: one Mapbox Vector Tile (MVT
    2.1, sources/mvt.py) per slippy tile at ``zoom``, points carrying
    their ``tags_col`` map entries as MVT attributes — the other half of
    the raster<->vector pair next to tile_heatmap (the reference sends
    raw GeoJSON to the browser, src/web/api.go:117; MVT is what makes a
    dense region drawable by a standard map client).

    Plan shape mirrors the raster path: tile assignment and the
    tile-local integer coordinates are PURE COLUMN MATH on the shared
    tile_fxy projection (a point's MVT position is its tile_heatmap pixel
    at tile_px=extent), so the only Python is the byte assembly in one
    applyInPandas over the per-tile groups. ``cap`` bounds features per
    tile (window rank on the same exchange the render groupBy needs —
    nothing unbounded crosses the shuffle); n_total still reports the
    true member count, so a capped tile is detectable (no silent cap).

    Output: (tile_id, zoom, tx, ty, n_features, n_total, mvt binary).
    """
    import pandas as pd
    from pyspark.sql import Window

    fx, fy = C.tile_fxy(F.col(lon), F.col(lat), zoom)
    tx = F.least(F.greatest(F.floor(fx).cast("int"), F.lit(0)), F.lit((1 << zoom) - 1))
    ty = F.least(F.greatest(F.floor(fy).cast("int"), F.lit(0)), F.lit((1 << zoom) - 1))
    ix = F.least(
        F.greatest(F.floor((fx - tx) * F.lit(float(extent))).cast("int"), F.lit(0)),
        F.lit(extent - 1),
    )
    iy = F.least(
        F.greatest(F.floor((fy - ty) * F.lit(float(extent))).cast("int"), F.lit(0)),
        F.lit(extent - 1),
    )
    cols = [
        C.tile_id(tx, ty, zoom).alias("tile_id"),
        F.col(id_col).alias("fid"),
        ix.alias("ix"),
        iy.alias("iy"),
    ]
    if tags_col is not None:
        cols.append(F.col(tags_col).alias("attrs"))
    slim = df.select(*cols)
    w = Window.partitionBy("tile_id").orderBy("fid")
    wc = Window.partitionBy("tile_id")
    ranked = (
        slim.withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count("*").over(wc))
        .filter(F.col("rn") <= cap)
    )
    has_attrs = tags_col is not None

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        from simple_osm_queries_spark.sources import mvt

        pdf = pdf.sort_values("rn")
        tid = int(pdf["tile_id"].iloc[0])
        attrs_seq = pdf["attrs"] if has_attrs else [None] * len(pdf)
        feats = [
            {
                "id": int(fid),
                "type": mvt.POINT,
                "rings": [[(int(ix), int(iy))]],
                "attrs": dict(attrs) if attrs is not None else {},
            }
            for fid, ix, iy, attrs in zip(pdf["fid"], pdf["ix"], pdf["iy"], attrs_seq)
        ]
        blob = mvt.encode_tile([(layer, feats)], extent=extent)
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "zoom": [tid >> 58],
                "tx": [(tid >> 29) & ((1 << 29) - 1)],
                "ty": [tid & ((1 << 29) - 1)],
                "n_features": [len(feats)],
                "n_total": [int(pdf["n_total"].iloc[0])],
                "mvt": [blob],
            }
        )

    return ranked.groupBy("tile_id").applyInPandas(
        render,
        "tile_id long, zoom int, tx int, ty int, n_features int, n_total long, mvt binary",
    )


def tile_vectors_ways(
    ways: DataFrame,
    zoom: int,
    extent: int = 4096,
    cap: int = 16384,
    max_cover: int = 256,
    oversize: str = "raise",
    layer: str = "ways",
    simplify_tol: float = 0.0,
) -> DataFrame:
    """Vector tiles for way LINESTRINGs (prepared ways table: ``nodes``
    array<struct<id,lon,lat>> + bbox columns from sources/dataset.py).

    A way lands on every tile its BBOX covers (column-math sequence +
    explode — an equi-joinable (way, tile) fan-out, no spatial join);
    vertex coordinates are encoded tile-locally and MAY leave [0, extent)
    on border tiles, which the MVT spec allows (renderers clip) — that is
    what makes a no-clipping encoder correct. A way whose bbox covers
    more than ``max_cover`` tiles at this zoom (a continental motorway at
    z=15) would fan out explosively; ``oversize='raise'`` (default) fails
    fast with the count, ``'skip'`` drops those ways — visibly, via the
    ``n_oversize`` column present on every output row (no silent cap).

    ``simplify_tol`` > 0 runs Douglas–Peucker per feature in TILE
    COORDINATE UNITS (the [0, extent) grid — extent/256 units ≈ one
    on-screen pixel) on the already-projected integer vertices, inside
    the same per-tile Arrow stage (geodesy's iterative numpy stack, zero
    extra passes). Endpoints always survive; max deviation from the
    original projected polyline <= simplify_tol. This is what makes a
    low-zoom planet render feasible: a 10k-vertex river at z4 is a few
    dozen MVT vertices.

    Output: (tile_id, zoom, tx, ty, n_features, n_total, n_oversize, mvt).
    """
    import pandas as pd
    from pyspark.sql import Window

    ranked, n_over, over_cnt = _bbox_tile_fanout(
        ways, zoom, cap, max_cover, oversize, ["nodes"], "ways"
    )

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import math

        import numpy as np

        from simple_osm_queries_spark.functions.cells import tile_fxy_py
        from simple_osm_queries_spark.operators.geodesy import _dp_mask
        from simple_osm_queries_spark.sources import mvt

        pdf = pdf.sort_values("rn")
        tid = int(pdf["tile_id"].iloc[0])
        feats = []
        for fid, nodes, tx_r, ty_r in zip(
            pdf["fid"], pdf["nodes"], pdf["tx"], pdf["ty"]
        ):
            tx_, ty_ = int(tx_r), int(ty_r)
            ring = []
            for v in nodes:
                fx, fy = tile_fxy_py(v["lon"], v["lat"], zoom)
                ring.append(
                    (
                        int(math.floor((fx - tx_) * extent)),
                        int(math.floor((fy - ty_) * extent)),
                    )
                )
            if len(ring) < 2:
                continue  # degenerate single-vertex way
            if simplify_tol > 0.0 and len(ring) > 2:
                xs = np.array([p[0] for p in ring], dtype=np.float64)
                ys = np.array([p[1] for p in ring], dtype=np.float64)
                keep = _dp_mask(xs, ys, float(simplify_tol))
                ring = [ring[i] for i in np.flatnonzero(keep)]
            feats.append({"id": int(fid), "type": mvt.LINESTRING, "rings": [ring]})
        blob = mvt.encode_tile([(layer, feats)], extent=extent)
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "zoom": [tid >> 58],
                "tx": [(tid >> 29) & ((1 << 29) - 1)],
                "ty": [tid & ((1 << 29) - 1)],
                "n_features": [len(feats)],
                "n_total": [int(pdf["n_total"].iloc[0])],
                "n_oversize": [int(n_over or 0)],
                "mvt": [blob],
            }
        )

    out = ranked.groupBy("tile_id").applyInPandas(
        render,
        "tile_id long, zoom int, tx int, ty int, n_features int, "
        "n_total long, n_oversize long, mvt binary",
    )
    return _attach_oversize(out, n_over, over_cnt)


def _attach_oversize(out: DataFrame, n_over, over_cnt: DataFrame) -> DataFrame:
    """oversize='skip' path (ADVICE r5): the dropped-feature count rides
    in as a broadcast 1-row aggregate evaluated in the SAME action as the
    tile render, replacing the plan-build-time blocking count() job. The
    'raise' path already verified the count is 0 eagerly."""
    if n_over is not None:
        return out
    return (
        out.drop("n_oversize")
        .crossJoin(F.broadcast(over_cnt))
        .select(
            "tile_id", "zoom", "tx", "ty", "n_features", "n_total",
            "n_oversize", "mvt",
        )
    )


def _bbox_tile_fanout(
    df: DataFrame,
    zoom: int,
    cap: int,
    max_cover: int,
    oversize: str,
    payload_cols: list[str],
    what: str,
) -> tuple[DataFrame, int]:
    """(feature -> covered tiles) fan-out shared by the linestring and
    polygon MVT paths: bbox columns -> tile index ranges (column math) ->
    sequence+explode -> per-tile window rank to ``cap``. Returns the
    ranked (tile_id, fid, payload..., tx, ty, rn, n_total) frame, the
    eager oversize-dropped count (0, for 'raise' — a nonzero count raised;
    None for 'skip', where no plan-build job runs), and the lazy 1-row
    count aggregate for _attach_oversize."""
    from pyspark.sql import Window

    if oversize not in ("raise", "skip"):
        raise ValueError(f"oversize must be 'raise' or 'skip', got {oversize!r}")
    xmin = C.tile_x(F.col("min_lon"), zoom)
    xmax = C.tile_x(F.col("max_lon"), zoom)
    ymin = C.tile_y(F.col("max_lat"), zoom)  # y grows DOWN (screen space)
    ymax = C.tile_y(F.col("min_lat"), zoom)
    sized = df.select(
        F.col("id").alias("fid"),
        *payload_cols,
        xmin.alias("xmin"),
        xmax.alias("xmax"),
        ymin.alias("ymin"),
        ymax.alias("ymax"),
    ).withColumn(
        "n_tiles",
        (F.col("xmax") - F.col("xmin") + 1) * (F.col("ymax") - F.col("ymin") + 1),
    )
    oversized = sized.filter(F.col("n_tiles") > max_cover)
    if oversize == "raise":
        # eager: fail-fast BEFORE the fan-out job is the documented
        # semantics of 'raise'
        n_over = oversized.count()
        if n_over:
            raise ValueError(
                f"{n_over} {what} cover > {max_cover} tiles at z{zoom} "
                "(raise max_cover, lower zoom, or pass oversize='skip')"
            )
    else:
        # 'skip' (ADVICE r5): no plan-build-time Spark job — the count is
        # attached lazily by the caller as a broadcast 1-row aggregate, so
        # a /tiles/{z}/{x}/{y} request runs ONE action instead of three
        n_over = None
    fanned = (
        sized.filter(F.col("n_tiles") <= max_cover)
        .withColumn("tx", F.explode(F.sequence("xmin", "xmax")))
        .withColumn("ty", F.explode(F.sequence("ymin", "ymax")))
        .select(
            C.tile_id(F.col("tx"), F.col("ty"), zoom).alias("tile_id"),
            "fid",
            *payload_cols,
            "tx",
            "ty",
        )
    )
    w = Window.partitionBy("tile_id").orderBy("fid")
    wc = Window.partitionBy("tile_id")
    ranked = (
        fanned.withColumn("rn", F.row_number().over(w))
        .withColumn("n_total", F.count("*").over(wc))
        .filter(F.col("rn") <= cap)
    )
    return ranked, n_over, oversized.agg(F.count("*").alias("n_oversize"))


def tile_vectors_relations(
    relations: DataFrame,
    zoom: int,
    extent: int = 4096,
    cap: int = 16384,
    max_cover: int = 256,
    oversize: str = "raise",
    layer: str = "relations",
    tags_col: str | None = "tags",
) -> DataFrame:
    """Vector tiles for relation BBOX POLYGONS — the geometry the
    reference outputs for relations (grid_reader.go:513-517 emits the
    relation's bounding box as a polygon ring; sources/geojson.py:33-45
    mirrors it), completing the POINT/LINESTRING/POLYGON triple over the
    prepared tables. Same bbox fan-out as tile_vectors_ways; each tile
    renders the rectangle tile-locally (corners may leave [0, extent) on
    border tiles — renderers clip). The exterior ring is wound positive
    under the shoelace formula in screen space (y down), as MVT 2.1
    requires for an exterior ring.

    Output: (tile_id, zoom, tx, ty, n_features, n_total, n_oversize, mvt).
    """
    import pandas as pd

    payload = ["min_lon", "min_lat", "max_lon", "max_lat"]
    if tags_col is not None:
        payload.append(tags_col)
    ranked, n_over, over_cnt = _bbox_tile_fanout(
        relations, zoom, cap, max_cover, oversize, payload, "relations"
    )
    has_attrs = tags_col is not None

    def render(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import math

        from simple_osm_queries_spark.functions.cells import tile_fxy_py
        from simple_osm_queries_spark.sources import mvt

        pdf = pdf.sort_values("rn")
        tid = int(pdf["tile_id"].iloc[0])
        attrs_seq = pdf[tags_col] if has_attrs else [None] * len(pdf)
        feats = []
        for fid, x1, y1, x2, y2, tx_r, ty_r, attrs in zip(
            pdf["fid"],
            pdf["min_lon"],
            pdf["min_lat"],
            pdf["max_lon"],
            pdf["max_lat"],
            pdf["tx"],
            pdf["ty"],
            attrs_seq,
        ):
            tx_, ty_ = int(tx_r), int(ty_r)
            # top-left = (min_lon, max_lat): screen y grows DOWN
            fx0, fy0 = tile_fxy_py(float(x1), float(y2), zoom)
            fx1, fy1 = tile_fxy_py(float(x2), float(y1), zoom)
            px0 = int(math.floor((fx0 - tx_) * extent))
            py0 = int(math.floor((fy0 - ty_) * extent))
            px1 = int(math.floor((fx1 - tx_) * extent))
            py1 = int(math.floor((fy1 - ty_) * extent))
            # CW on screen (positive shoelace with y down) => exterior
            ring = [(px0, py0), (px1, py0), (px1, py1), (px0, py1)]
            feats.append(
                {
                    "id": int(fid),
                    "type": mvt.POLYGON,
                    "rings": [ring],
                    "attrs": dict(attrs) if attrs is not None else {},
                }
            )
        blob = mvt.encode_tile([(layer, feats)], extent=extent)
        return pd.DataFrame(
            {
                "tile_id": [tid],
                "zoom": [tid >> 58],
                "tx": [(tid >> 29) & ((1 << 29) - 1)],
                "ty": [tid & ((1 << 29) - 1)],
                "n_features": [len(feats)],
                "n_total": [int(pdf["n_total"].iloc[0])],
                "n_oversize": [int(n_over or 0)],
                "mvt": [blob],
            }
        )

    out = ranked.groupBy("tile_id").applyInPandas(
        render,
        "tile_id long, zoom int, tx int, ty int, n_features int, "
        "n_total long, n_oversize long, mvt binary",
    )
    return _attach_oversize(out, n_over, over_cnt)


# ---------------------------------------------------------------------------
# raster -> vector: the inverse direction of the tile bridge
# ---------------------------------------------------------------------------

def pixel_bins_to_points(
    bins: DataFrame, tile_px: int = 256, value_col: str | None = "cnt"
) -> DataFrame:
    """Inverse of ``tile_pixel_bins`` — the raster->vector direction of the
    north rule's bridge: each (tile_id, px, py) raster pixel becomes the
    lon/lat POINT at its center (inverse Web-Mercator,
    ``lat = atan(sinh(pi*(1 - 2*fy/n)))``), with ``value_col`` passed
    through. Pure column math end-to-end — no UDF, no shuffle; zoom is
    decoded from the packed tile_id so one frame may mix zooms.

    Round-trip guarantee: a pixel center re-bins (``tile_pixel_bins`` at
    the same zoom/tile_px, ``weight=value_col``) to exactly the bins it
    came from — the center sits 0.5 px from every floor boundary, ~1e5
    times the double-precision projection error, so the integer keys
    cannot flip (tested exactly in tests/test_raster_vector.py).

    Output: (lon double, lat double[, value_col]).
    """
    import math

    mask = F.lit((1 << 29) - 1)
    z = F.shiftright(F.col("tile_id"), 58).cast("double")
    tx = F.shiftright(F.col("tile_id"), 29).bitwiseAND(mask).cast("double")
    ty = F.col("tile_id").bitwiseAND(mask).cast("double")
    n = F.pow(F.lit(2.0), z)
    fx = tx + (F.col("px").cast("double") + F.lit(0.5)) / F.lit(float(tile_px))
    fy = ty + (F.col("py").cast("double") + F.lit(0.5)) / F.lit(float(tile_px))
    lon = fx / n * F.lit(360.0) - F.lit(180.0)
    lat = F.degrees(F.atan(F.sinh(F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * fy / n))))
    cols = [lon.alias("lon"), lat.alias("lat")]
    if value_col is not None:
        cols.append(F.col(value_col))
    return bins.select(*cols)


def raster_to_bins(
    rasters: DataFrame, tile_px: int = 256, png_col: str = "png",
    on_error: str = "raise",
) -> DataFrame:
    """Vectorize raster tiles: decode each PNG (any of the engine's image
    formats, sniffed by magic) and emit one row per NONZERO pixel —
    ``(tile_id, px, py, intensity)`` with intensity the 0-255 gray value.
    The structural inverse of ``tile_heatmap`` (per-tile normalization is
    not invertible, so intensity is brightness, not the original count;
    key-set equality with ``tile_pixel_bins`` IS exact and tested).
    Compose with ``pixel_bins_to_points(value_col='intensity')`` for the
    full raster-tiles-in, lon/lat-points-out path. Arrow-batched
    mapInPandas; ``on_error`` follows the multimodal raise/skip contract.
    """
    import pandas as pd

    from simple_osm_queries_spark.operators.multimodal import (
        _check_on_error,
        _decode_or_none,
    )

    _check_on_error(on_error)

    def run(batches):
        import numpy as np

        from simple_osm_queries_spark.sources import codecs

        for pdf in batches:
            out_tid, out_px, out_py, out_val = [], [], [], []
            for tid, data in zip(pdf["tile_id"], pdf[png_col]):
                px_img = _decode_or_none(
                    lambda b: codecs.decode_image(b, None), data, on_error
                )
                if px_img is None:
                    continue
                if px_img.shape[0] != tile_px or px_img.shape[1] != tile_px:
                    if on_error == "skip":
                        continue
                    raise ValueError(
                        f"raster tile is {px_img.shape[1]}x{px_img.shape[0]}, "
                        f"expected {tile_px}x{tile_px}"
                    )
                gray = px_img.astype(np.uint16).sum(axis=2) // 3
                ys, xs = np.nonzero(gray)
                out_tid.extend([int(tid)] * len(xs))
                out_px.extend(xs.tolist())
                out_py.extend(ys.tolist())
                out_val.extend(gray[ys, xs].astype(int).tolist())
            yield pd.DataFrame(
                {
                    "tile_id": pd.Series(out_tid, dtype="int64"),
                    "px": pd.Series(out_px, dtype="int32"),
                    "py": pd.Series(out_py, dtype="int32"),
                    "intensity": pd.Series(out_val, dtype="int64"),
                }
            )

    return rasters.select("tile_id", png_col).mapInPandas(
        run, "tile_id long, px int, py int, intensity long"
    )
