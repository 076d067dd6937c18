"""Zoom-pyramid tile layouts — GeoTrellis SpatialKey / ZoomedLayoutScheme parity.

Reference semantics (cited for parity, not ported):
- ``ZoomedLayoutScheme(WebMercator, 256)``: power-of-two pyramid, zoom z has
  2^z × 2^z tiles of 256×256 px over the WebMercator world extent
  (reference: core/.../vlm/geotiff/GeoTiffNode.scala:60-63,
  core/.../vlm/geotiff/util/CogUtils.scala:33-36).
- ``LayoutDefinition.mapTransform`` maps SpatialKey(x, y) ↔ extent
  (reference: ogc/.../wmts/GeotrellisTileMatrix.scala:37-49,
  ogc/.../TiledOgcLayer.scala:100-112).
- Key convention: tile_x grows east from xmin, tile_y grows SOUTH from ymax
  (GeoTrellis MapKeyTransform floor convention). Points exactly on the
  east/south world edge clamp into the last tile.

Everything here is pure arithmetic, exposed three ways:
1. Python scalars (goldens / driver-side planning),
2. numpy vectorized (inside pandas UDF kernels),
3. SQL fragment strings (:mod:`..sqlgen`) compiled by Catalyst — the hot
   path never leaves the JVM.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

# WebMercator world square (EPSG:3857), meters. Matches the constant pinned
# in FIXTURES.md §F5 / reference application-spacetimekey.conf.
WEBMERCATOR_BOUND = 20037508.342789244
WORLD_EXTENT_3857 = (-WEBMERCATOR_BOUND, -WEBMERCATOR_BOUND, WEBMERCATOR_BOUND, WEBMERCATOR_BOUND)
TILE_SIZE = 256
MAX_LAT = 85.05112877980659  # WebMercator latitude clip


@dataclass(frozen=True)
class Extent:
    """2D bounding box (reference: geotrellis Extent; SURVEY.md §1.1)."""

    xmin: float
    ymin: float
    xmax: float
    ymax: float

    @property
    def width(self) -> float:
        return self.xmax - self.xmin

    @property
    def height(self) -> float:
        return self.ymax - self.ymin

    def buffer(self, d: float) -> "Extent":
        return Extent(self.xmin - d, self.ymin - d, self.xmax + d, self.ymax + d)

    def intersects(self, o: "Extent") -> bool:
        return not (self.xmax < o.xmin or o.xmax < self.xmin or self.ymax < o.ymin or o.ymax < self.ymin)

    def intersection(self, o: "Extent") -> "Extent | None":
        xmin, ymin = max(self.xmin, o.xmin), max(self.ymin, o.ymin)
        xmax, ymax = min(self.xmax, o.xmax), min(self.ymax, o.ymax)
        if xmin > xmax or ymin > ymax:
            return None
        return Extent(xmin, ymin, xmax, ymax)

    def combine(self, o: "Extent") -> "Extent":
        return Extent(
            min(self.xmin, o.xmin), min(self.ymin, o.ymin), max(self.xmax, o.xmax), max(self.ymax, o.ymax)
        )

    def contains_point(self, x: float, y: float) -> bool:
        return self.xmin <= x <= self.xmax and self.ymin <= y <= self.ymax


@dataclass(frozen=True)
class LayoutDefinition:
    """Tiling grid of one zoom level: extent + (layout_cols, layout_rows,
    tile_cols, tile_rows). Reference: GeoTrellis LayoutDefinition used at
    ogc/.../TiledOgcLayer.scala:100-112."""

    extent: Extent
    layout_cols: int
    layout_rows: int
    tile_cols: int = TILE_SIZE
    tile_rows: int = TILE_SIZE

    @property
    def tile_width(self) -> float:
        return self.extent.width / self.layout_cols

    @property
    def tile_height(self) -> float:
        return self.extent.height / self.layout_rows

    @property
    def cell_width(self) -> float:
        return self.tile_width / self.tile_cols

    @property
    def cell_height(self) -> float:
        return self.tile_height / self.tile_rows

    def key_for(self, x: float, y: float) -> tuple[int, int]:
        """Map coordinate → SpatialKey, clamped at world edges."""
        tx = int(math.floor((x - self.extent.xmin) / self.tile_width))
        ty = int(math.floor((self.extent.ymax - y) / self.tile_height))
        tx = min(max(tx, 0), self.layout_cols - 1)
        ty = min(max(ty, 0), self.layout_rows - 1)
        return tx, ty

    def keys_np(self, x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        tx = np.floor((x - self.extent.xmin) / self.tile_width).astype(np.int64)
        ty = np.floor((self.extent.ymax - y) / self.tile_height).astype(np.int64)
        np.clip(tx, 0, self.layout_cols - 1, out=tx)
        np.clip(ty, 0, self.layout_rows - 1, out=ty)
        return tx, ty

    def extent_for(self, tx: int, ty: int) -> Extent:
        """SpatialKey → tile extent (mapTransform inverse)."""
        xmin = self.extent.xmin + tx * self.tile_width
        ymax = self.extent.ymax - ty * self.tile_height
        return Extent(xmin, ymax - self.tile_height, xmin + self.tile_width, ymax)

    def keys_for_extent(self, e: Extent) -> tuple[int, int, int, int]:
        """Extent → inclusive key bounds (GridBounds analog) — the spatial
        partition-pruning range (reference: GTLayerNode.scala:90-95)."""
        tx0, ty0 = self.key_for(e.xmin, e.ymax)
        # Right/bottom edges: a point exactly on a tile boundary belongs to
        # the next tile, so an extent whose max edge coincides with a tile
        # boundary must NOT include that next tile (GeoTrellis
        # gridBoundsFor). "Coincides" is FP-noisy → snap with a relative
        # epsilon (a few ulps; far smaller than one pixel = 1/256 tile).
        fx = (e.xmax - self.extent.xmin) / self.tile_width
        fy = (self.extent.ymax - e.ymin) / self.tile_height
        tx1, ty1 = int(math.floor(fx)), int(math.floor(fy))
        eps_x = (abs(fx) + 1.0) * 1e-12
        eps_y = (abs(fy) + 1.0) * 1e-12
        if fx - tx1 <= eps_x and tx1 > tx0:
            tx1 -= 1
        if fy - ty1 <= eps_y and ty1 > ty0:
            ty1 -= 1
        tx1 = min(max(tx1, 0), self.layout_cols - 1)
        ty1 = min(max(ty1, 0), self.layout_rows - 1)
        return tx0, ty0, tx1, ty1


class ZoomedLayoutScheme:
    """zoom → LayoutDefinition over the WebMercator world square.

    Reference: ZoomedLayoutScheme(WebMercator, 256) at
    core/.../vlm/geotiff/GeoTiffNode.scala:60-63; scale-denominator math at
    ogc/.../wmts/GeotrellisTileMatrix.scala:49.
    """

    def __init__(self, tile_size: int = TILE_SIZE):
        self.tile_size = tile_size
        self.world = Extent(*WORLD_EXTENT_3857)

    def layout(self, zoom: int) -> LayoutDefinition:
        n = 1 << zoom
        return LayoutDefinition(self.world, n, n, self.tile_size, self.tile_size)

    def cell_size(self, zoom: int) -> float:
        return self.world.width / ((1 << zoom) * self.tile_size)

    def zoom_for_cell_size(self, cell_size: float, max_zoom: int = 30,
                           tile_size: int | None = None) -> int:
        """Coarsest zoom whose cell size <= requested — reference overview
        strategy Auto(0)/AutoHigherResolution + GTLayer cell-diagonal pick
        (CogUtils.scala:65; GTLayerNode.scala:136-149). Used for zoom-level
        partition pruning of the pyramid table (SURVEY.md O3/R5).
        ``tile_size`` overrides the scheme default for layers with
        non-256px tiles."""
        px = tile_size or self.tile_size
        for z in range(max_zoom + 1):
            if self.world.width / ((1 << z) * px) <= cell_size:
                return z
        return max_zoom


class CrsLayoutScheme:
    """Power-of-two pyramid over an ARBITRARY (CRS, base extent, tile
    size) — the WMTS custom tile-matrix-set surface (reference:
    GeotrellisTileMatrix.scala:37-49 builds a LayoutDefinition from any
    configured matrix set; scale-denominator math at :49). The
    WebMercator ``ZoomedLayoutScheme`` is the special case
    (extent = world square, 1×1 at zoom 0).

    Level 0 fits the extent's aspect ratio with near-square tiles
    (cols0 × rows0); level z has cols0·2^z × rows0·2^z tiles. All key
    math is plain LayoutDefinition arithmetic, so the SQL floor-keying
    and partition pruning work unchanged over projected coordinates.
    """

    def __init__(self, crs_epsg: int, extent: Extent, tile_size: int = TILE_SIZE):
        self.crs_epsg = int(crs_epsg)
        self.extent = extent
        self.tile_size = int(tile_size)
        if extent.width >= extent.height:
            self.rows0 = 1
            self.cols0 = max(1, round(extent.width / extent.height))
        else:
            self.cols0 = 1
            self.rows0 = max(1, round(extent.height / extent.width))

    def layout(self, zoom: int) -> LayoutDefinition:
        return LayoutDefinition(
            self.extent, self.cols0 << zoom, self.rows0 << zoom,
            self.tile_size, self.tile_size,
        )

    def cell_size(self, zoom: int) -> float:
        return self.extent.width / ((self.cols0 << zoom) * self.tile_size)

    def scale_denominator(self, zoom: int, metres_per_unit: float = 1.0) -> float:
        """WMTS scale denominator: cell size over the standardized 0.28 mm
        pixel (GeotrellisTileMatrix.scala:49)."""
        return self.cell_size(zoom) * metres_per_unit / 0.00028

    def zoom_for_cell_size(self, cell_size: float, max_zoom: int = 30) -> int:
        for z in range(max_zoom + 1):
            if self.cell_size(z) <= cell_size:
                return z
        return max_zoom


def lonlat_to_mercator(lon: np.ndarray, lat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """EPSG:4326 → EPSG:3857, vectorized. The only reprojection the engine
    needs internally (SURVEY.md R2: one canonical CRS, WebMercator for tile
    math only)."""
    lon = np.asarray(lon, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    x = lon * (WEBMERCATOR_BOUND / 180.0)
    y = np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) * (WEBMERCATOR_BOUND / np.pi)
    return x, y


def mercator_to_lonlat(x: np.ndarray, y: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    lon = np.asarray(x, dtype=np.float64) / (WEBMERCATOR_BOUND / 180.0)
    lat = np.degrees(2.0 * np.arctan(np.exp(np.asarray(y) / (WEBMERCATOR_BOUND / np.pi))) - np.pi / 2.0)
    return lon, lat


def tile_key_np(lon: np.ndarray, lat: np.ndarray, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """lon/lat → (tile_x, tile_y) at ``zoom`` — normalized-mercator floor
    math, identical to the SQL fragment in :mod:`..sqlgen` (shared
    convention is load-bearing: tile assignments must match the oracle
    bit-for-bit)."""
    n = 1 << zoom
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MAX_LAT, MAX_LAT)
    mx = (np.asarray(lon, dtype=np.float64) + 180.0) / 360.0
    my = 0.5 - np.log(np.tan(np.pi / 4.0 + np.radians(lat) / 2.0)) / (2.0 * np.pi)
    tx = np.minimum(np.floor(mx * n), n - 1).astype(np.int64)
    ty = np.minimum(np.floor(my * n), n - 1).astype(np.int64)
    np.clip(tx, 0, None, out=tx)
    np.clip(ty, 0, None, out=ty)
    return tx, ty
