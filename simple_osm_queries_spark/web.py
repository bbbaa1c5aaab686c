"""HTTP server entry point (SURVEY.md §3.2).

Mirrors the reference's API (/root/reference/src/web/api.go): the index is
loaded once at startup; `POST /query` takes the query text as the request
body and answers GeoJSON; parse and execution errors come back as JSON
envelopes with 400/500 (api.go:84-96,100-113). `GET /app` serves the
interactive map UI (web_app.html — functional parity with the reference's
OpenLayers page src/web/index.html: {{bbox}} viewport placeholder, result
rendering, error label, localStorage; self-contained canvas, no CDN).

stdlib ThreadingHTTPServer — the Spark driver is the server process, the
cluster does the work, exactly like the reference's single process plus
goroutines (but distributed underneath).
"""

from __future__ import annotations

import functools
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pyspark.sql import functions as F

from simple_osm_queries_spark.query.parser import ParseError, parse_query
from simple_osm_queries_spark.query.planner import PlanError, plan_query
from simple_osm_queries_spark.sources.dataset import OsmDataset
from simple_osm_queries_spark.sources.geojson import to_geojson_capped

# POST /query result cap: the reference streams the FULL GeoJSON result into
# one response (api.go:117) — a planet-wide wildcard query OOMs the driver.
# We fetch via toLocalIterator and stop at the cap, flagging "truncated".
DEFAULT_MAX_ROWS = 100_000
# GET /cells cap on the ESTIMATED cell count (bbox area / cell area at res):
# a planet bbox at res 12 would otherwise group+collect millions of rows.
DEFAULT_MAX_CELLS = 50_000


@functools.cache
def _app_html() -> bytes:
    # importlib.resources: works both from a checkout AND from the
    # spark-submit --py-files zip (plain open(__file__-relative) would not)
    from importlib import resources

    return resources.files("simple_osm_queries_spark").joinpath("web_app.html").read_bytes()


def make_handler(
    dataset: OsmDataset,
    max_rows: int = DEFAULT_MAX_ROWS,
    max_cells: int = DEFAULT_MAX_CELLS,
):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: bytes, content_type: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", content_type)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):  # noqa: N802 (http.server API)
            if self.path.rstrip("/") in ("", "/app"):
                self._send(200, _app_html(), "text/html")
            elif self.path.startswith("/cells"):
                self._get_cells()
            elif self.path.startswith("/tiles/"):
                self._get_tile()
            elif self.path.startswith("/nearest"):
                self._get_nearest()
            else:
                self._send(404, b'{"error": "not found"}', "application/json")

        def _get_nearest(self) -> None:
            """GET /nearest?lon=..&lat=..&k=1&radius=500 — the k nearest
            ways within radius meters of the point, as JSON
            {way_id, dist_m, rank} rows (operators/nearest_way.py as a
            user surface: reverse geocoding / GPS-snap). The way side is
            bbox-prefiltered around the point before the broadcast join,
            so a single lookup never scans the full way table's geometry."""
            import math
            from urllib.parse import parse_qs, urlparse

            from simple_osm_queries_spark.operators.buffer import M_PER_DEG
            from simple_osm_queries_spark.operators.nearest_way import (
                nearest_way_join,
            )

            try:
                qs = parse_qs(urlparse(self.path).query)
                lon = float(qs["lon"][0])
                lat = float(qs["lat"][0])
                k = int(qs.get("k", ["1"])[0])
                radius = float(qs.get("radius", ["500"])[0])
                if not (-180.0 <= lon <= 180.0 and -90.0 <= lat <= 90.0):
                    raise ValueError("lon/lat out of range")
                if not 1 <= k <= 100:
                    raise ValueError("k must be in [1, 100]")
                if not 0.0 < radius <= 100_000.0:
                    raise ValueError("radius must be in (0, 100km]")
            except (KeyError, ValueError) as e:
                self._send(
                    400,
                    json.dumps({"error": "bad request", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            try:
                d_lat = radius / M_PER_DEG
                d_lon = radius / (
                    M_PER_DEG * math.cos(math.radians(min(abs(lat), 89.0)))
                )
                cand = dataset.ways.filter(
                    (F.col("min_lon") <= lon + d_lon)
                    & (F.col("max_lon") >= lon - d_lon)
                    & (F.col("min_lat") <= lat + d_lat)
                    & (F.col("max_lat") >= lat - d_lat)
                ).select(
                    "id", "nodes", "min_lon", "min_lat", "max_lon", "max_lat"
                )
                spark = dataset.nodes.sparkSession
                pt = spark.createDataFrame(
                    [(0, lon, lat)], "id long, lon double, lat double"
                )
                rows = (
                    nearest_way_join(
                        pt, cand, radius, k=k, strategy="broadcast", snap=True
                    )
                    .orderBy("rank")
                    .collect()
                )
                payload = {
                    "query": {"lon": lon, "lat": lat, "k": k, "radius_m": radius},
                    "results": [
                        {
                            "way_id": r.way_id,
                            "dist_m": r.dist_m,
                            "rank": r.rank,
                            "snap_lon": r.snap_lon,
                            "snap_lat": r.snap_lat,
                        }
                        for r in rows
                    ],
                }
                self._send(200, json.dumps(payload).encode(), "application/json")
            except Exception as e:  # execution error envelope
                self._send(
                    500,
                    json.dumps({"error": "execution error", "message": str(e)}).encode(),
                    "application/json",
                )

        def _get_tile(self) -> None:
            """GET /tiles/{z}/{x}/{y}.png — an on-demand density heatmap
            raster for ONE slippy tile (operators/tiles.py tile_heatmap
            over the tile's bbox-filtered nodes), and .mvt — the same
            tile as a Mapbox Vector Tile (operators/tiles.py tile_vectors
            over the same filtered points, tags as MVT attributes). The
            reference's UI sends every feature to the browser as GeoJSON;
            raster keeps a dense region drawable, MVT keeps it
            *interactive* in any standard map client. Zoom capped like
            /cells."""
            import math
            import re
            from urllib.parse import urlparse

            from simple_osm_queries_spark.functions import cells as C
            from simple_osm_queries_spark.operators.tiles import (
                tile_heatmap,
                tile_vectors,
            )

            # slippy-map clients append cache-busting/auth query strings
            # (.../{z}/{x}/{y}.png?v=2) — match on the path component only
            m = re.match(
                r"^/tiles/(\d+)/(\d+)/(\d+)\.(png|mvt)$", urlparse(self.path).path
            )
            if not m:
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            from urllib.parse import parse_qs

            try:  # ?simplify=<tol in tile units> — DP-thins the ways layer
                simplify = float(
                    parse_qs(urlparse(self.path).query).get("simplify", ["0"])[0]
                )
                if not 0.0 <= simplify <= 4096.0:
                    raise ValueError("simplify must be in [0, 4096]")
            except ValueError as e:
                self._send(
                    400,
                    json.dumps({"error": "bad request", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            z, x, y = (int(g) for g in m.groups()[:3])
            fmt = m.group(4)
            n = 1 << z
            if not (0 <= z <= 22 and 0 <= x < n and 0 <= y < n):
                self._send(
                    400, b'{"error": "tile out of range"}', "application/json"
                )
                return
            try:
                # Membership truth is the ENGINE's projection (tile_of ==
                # want), not driver-math bbox inequalities: tile_fxy clamps
                # lat beyond ±85.05° into the edge rows and lon=180 into the
                # last column, and the driver-side inverse-Mercator bbox is
                # not guaranteed to be the bit-exact inverse of the Spark
                # expression. The bbox (widened by ε, unbounded at clamped
                # edges) remains as a PREFILTER only — it is what reaches
                # parquet/Iceberg min-max pruning; the exact tile_of
                # equality on top decides membership.
                eps = 1e-7
                lon0 = -180.0 if x == 0 else x / n * 360.0 - 180.0 - eps
                lon1 = 180.0 if x == n - 1 else (x + 1) / n * 360.0 - 180.0 + eps
                lat1 = (
                    90.0
                    if y == 0
                    else math.degrees(
                        math.atan(math.sinh(math.pi * (1 - 2 * y / n)))
                    )
                    + eps
                )
                lat0 = (
                    -90.0
                    if y == n - 1
                    else math.degrees(
                        math.atan(math.sinh(math.pi * (1 - 2 * (y + 1) / n)))
                    )
                    - eps
                )
                want = C.tile_id_py(x, y, z)
                pre = dataset.nodes.where(
                    (F.col("lon") >= lon0)
                    & (F.col("lon") <= lon1)
                    & (F.col("lat") >= lat0)
                    & (F.col("lat") <= lat1)
                ).where(C.tile_of(F.col("lon"), F.col("lat"), z) == F.lit(want))
                if fmt == "mvt":
                    from simple_osm_queries_spark.operators.tiles import (
                        tile_vectors_relations,
                        tile_vectors_ways,
                    )
                    from simple_osm_queries_spark.sources import mvt as _mvt

                    # a tile message is just repeated Layer fields, so the
                    # three per-type operators' blobs CONCATENATE into one
                    # valid multi-layer tile (no re-encode)
                    parts: list[bytes] = []
                    rows = [
                        r
                        for r in tile_vectors(
                            pre.select("id", "lon", "lat", "tags"),
                            z,
                            cap=max_rows,
                        ).collect()
                        if r.tile_id == want
                    ]
                    if rows:
                        parts.append(bytes(rows[0].mvt))
                    # ways/relations: bbox-overlap prefilter (their bbox
                    # columns reach parquet min-max pruning), fan-out
                    # membership decides; skip-not-raise — one continental
                    # feature must not 500 the tile
                    for frame, op in (
                        (dataset.ways, tile_vectors_ways),
                        (dataset.relations, tile_vectors_relations),
                    ):
                        cand = frame.where(
                            (F.col("min_lon") <= lon1)
                            & (F.col("max_lon") >= lon0)
                            & (F.col("min_lat") <= lat1)
                            & (F.col("max_lat") >= lat0)
                        )
                        # tile_id filter runs IN Spark: a candidate's bbox
                        # fans out to up to max_cover tiles and only one is
                        # wanted — don't ship the other blobs to the driver
                        kw = (
                            {"simplify_tol": simplify}
                            if op is tile_vectors_ways and simplify > 0.0
                            else {}
                        )
                        parts.extend(
                            bytes(r.mvt)
                            for r in op(cand, z, cap=max_rows, oversize="skip", **kw)
                            .where(F.col("tile_id") == F.lit(want))
                            .collect()
                        )
                    if not parts:  # empty but valid MVT
                        parts.append(_mvt.encode_tile([("nodes", [])]))
                    self._send(
                        200, b"".join(parts), "application/vnd.mapbox-vector-tile"
                    )
                    return
                pts = pre.select("lon", "lat")
                rows = [
                    r
                    for r in tile_heatmap(pts, z, 256).collect()
                    if r.tile_id == want
                ]
                if rows:
                    png = bytes(rows[0].png)
                else:  # empty tile -> blank raster
                    import numpy as np

                    from simple_osm_queries_spark.sources import codecs as _codecs

                    png = _codecs.encode_png(np.zeros((256, 256, 3), np.uint8))
                self._send(200, png, "image/png")
            except Exception as e:  # execution error envelope
                self._send(
                    500,
                    json.dumps(
                        {"error": "execution error", "message": str(e)}
                    ).encode(),
                    "application/json",
                )

        def _get_cells(self) -> None:
            """GET /cells?bbox=minlon,minlat,maxlon,maxlat&res=7 — per-H3-cell
            node density over the bbox as a GeoJSON FeatureCollection of cell
            polygons with a `count` property (the round-3 encoder + boundary
            machinery as a user surface)."""
            from urllib.parse import parse_qs, urlparse

            import numpy as np

            from simple_osm_queries_spark.functions import cells as C
            from simple_osm_queries_spark.sources.geojson import (
                h3_cells_feature_collection,
            )

            try:
                qs = parse_qs(urlparse(self.path).query)
                x1, y1, x2, y2 = (float(v) for v in qs["bbox"][0].split(","))
                res = int(qs.get("res", ["7"])[0])
                if not 0 <= res <= 12:
                    raise ValueError("res must be in [0, 12]")
            except (KeyError, ValueError) as e:
                self._send(
                    400,
                    json.dumps({"error": "bad request", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            # estimated cell count: bbox area (cos-corrected) / hex area;
            # reject before running anything (ADVICE r3 #3)
            import math

            from simple_osm_queries_spark.operators.knn import h3_min_inradius_deg

            mid = math.cos(math.radians(min(abs(y1 + y2) / 2.0, 89.0)))
            inr = h3_min_inradius_deg(res)
            est = abs(x2 - x1) * abs(y2 - y1) * mid / (2.0 * math.sqrt(3.0) * inr * inr)
            if est > max_cells:
                self._send(
                    413,
                    json.dumps(
                        {
                            "error": "too many cells",
                            "message": f"bbox at res {res} covers ~{int(est)} cells "
                            f"(cap {max_cells}); use a coarser res or smaller bbox",
                        }
                    ).encode(),
                    "application/json",
                )
                return
            try:
                rows = (
                    dataset.nodes.filter(
                        (F.col("lon") >= x1) & (F.col("lon") <= x2)
                        & (F.col("lat") >= y1) & (F.col("lat") <= y2)
                    )
                    .groupBy(C.cell_h3(F.col("lon"), F.col("lat"), res).alias("cell"))
                    .agg(F.count("*").alias("n"))
                    .collect()
                )
                cells = np.array([r.cell for r in rows], dtype=np.int64).view(np.uint64)
                fc = h3_cells_feature_collection(cells)
                for feat, r in zip(fc["features"], rows):
                    feat["properties"]["count"] = r.n
                self._send(200, json.dumps(fc).encode(), "application/geo+json")
            except Exception as e:  # execution error envelope
                self._send(
                    500,
                    json.dumps({"error": "execution error", "message": str(e)}).encode(),
                    "application/json",
                )

        def do_POST(self):  # noqa: N802
            if self.path != "/query":
                self._send(404, b'{"error": "not found"}', "application/json")
                return
            length = int(self.headers.get("Content-Length", "0"))
            body = self.rfile.read(length).decode("utf-8", errors="replace")
            try:
                query = parse_query(body)
            except ParseError as e:
                self._send(
                    400,
                    json.dumps({"error": "parse error", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            try:
                fc = to_geojson_capped(plan_query(query, dataset), max_rows)
            except PlanError as e:
                self._send(
                    400,
                    json.dumps({"error": "plan error", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            except Exception as e:  # execution error envelope (api.go:100-113)
                self._send(
                    500,
                    json.dumps({"error": "execution error", "message": str(e)}).encode(),
                    "application/json",
                )
                return
            self._send(200, json.dumps(fc).encode(), "application/geo+json")

        def log_message(self, fmt, *args):  # quiet
            pass

    return Handler


def serve(
    dataset: OsmDataset,
    port: int = 8080,
    max_rows: int = DEFAULT_MAX_ROWS,
    max_cells: int = DEFAULT_MAX_CELLS,
) -> ThreadingHTTPServer:
    """Build the server (caller decides serve_forever vs background thread)."""
    return ThreadingHTTPServer(
        ("127.0.0.1", port), make_handler(dataset, max_rows, max_cells)
    )
