"""Packed (columnar) geometry codec: GeoJSON <-> flat coordinate arrays.

Layout (the GeoArrow-style layout SURVEY.md §1.2 mandates — no per-row
Python geometry objects ever cross the JVM/Python boundary):

    gtype:        int8   — geometry type id (see GTYPE_IDS)
    coords:       float64[2*n] — interleaved x0,y0,x1,y1,...
    ring_offsets: int32[n_rings+1] — cumulative *coordinate-pair* counts
    part_offsets: int32[n_parts+1] — cumulative *ring* counts

Examples
    Point(1,2)            -> coords=[1,2], ring_offsets=[0,1], part_offsets=[0,1]
    LineString 3 pts      -> ring_offsets=[0,3], part_offsets=[0,1]
    Polygon shell+hole    -> ring_offsets=[0,a,a+b], part_offsets=[0,2]
    MultiPolygon 2 shells -> part_offsets=[0,1,2]

Reference semantics: gdal_boots/geometry.py:7-119 (GeometryBuilder /
GeometryGeoJson) — dict or JSON string in, nested float lists out,
per-coordinate ``round(c, precision)`` on encode (geometry.py:74,112),
optional 2-D flatten (geometry.py:59-64,115-119).  GeometryCollection
(geometry.py:47-51): homogeneous Point/Polygon collections flatten into
the equivalent MultiX (operator-compatible fast path); heterogeneous
collections pack as gtype 7 with two extra arrays (part_types int8 per
child, child_offsets int32 cumulative part counts) and round-trip the
exact nesting (reference golden test_geometry.py:135-179).  Nested
collections raise (GeoJSON discourages them; the reference suite never
builds one).
"""

from __future__ import annotations

import json
from dataclasses import dataclass

import numpy as np

GTYPE_IDS = {
    "Point": 1,
    "LineString": 2,
    "Polygon": 3,
    "MultiPoint": 4,
    "MultiLineString": 5,
    "MultiPolygon": 6,
    "GeometryCollection": 7,
}
GTYPE_NAMES = {v: k for k, v in GTYPE_IDS.items()}


@dataclass
class PackedGeometry:
    gtype: int
    coords: np.ndarray  # float64, interleaved x,y
    ring_offsets: np.ndarray  # int32
    part_offsets: np.ndarray  # int32
    # GeometryCollection (gtype 7) only — None otherwise:
    #   part_types:    int8[n_children], GTYPE id of each child
    #   child_offsets: int32[n_children+1], cumulative PART counts, so
    #                  child i owns parts child_offsets[i]:child_offsets[i+1]
    part_types: np.ndarray | None = None
    child_offsets: np.ndarray | None = None

    @property
    def n_points(self) -> int:
        return len(self.coords) // 2

    def xy(self) -> tuple[np.ndarray, np.ndarray]:
        c = self.coords.reshape(-1, 2)
        return c[:, 0], c[:, 1]


def _flatten2d(pos):
    # Drop Z (and beyond): reference FlattenTo2D (geometry.py:59-64).
    return float(pos[0]), float(pos[1])


def from_geojson(obj) -> PackedGeometry:
    """GeoJSON dict or JSON string -> PackedGeometry (always 2-D)."""
    if isinstance(obj, (str, bytes)):
        obj = json.loads(obj)
    gt = obj["type"]
    coords = obj.get("coordinates", [])

    pts: list[float] = []
    ring_offsets: list[int] = [0]
    part_offsets: list[int] = [0]

    def add_ring(ring_pos):
        # vectorized when the ring's positions are uniform-length (the
        # GeoJSON norm): one asarray + slice beats a per-point Python
        # loop ~4x; ragged 2-D/3-D mixes fall back to the loop.
        try:
            arr = np.asarray(ring_pos, dtype=np.float64)
        except (ValueError, TypeError):
            arr = None
        if arr is not None and arr.ndim == 2 and arr.shape[1] >= 2:
            pts.extend(arr[:, :2].ravel())
        else:
            for p in ring_pos:
                x, y = _flatten2d(p)
                pts.append(x)
                pts.append(y)
        ring_offsets.append(ring_offsets[-1] + len(ring_pos))

    if gt == "GeometryCollection":
        geoms = obj.get("geometries", [])
        kinds = {g["type"] for g in geoms}
        if kinds <= {"Polygon", "MultiPolygon"}:
            flat = []
            for g in geoms:
                cc = g["coordinates"]
                flat.extend(cc if g["type"] == "MultiPolygon" else [cc])
            return from_geojson({"type": "MultiPolygon", "coordinates": flat})
        if kinds <= {"Point", "MultiPoint"}:
            flat = []
            for g in geoms:
                cc = g["coordinates"]
                flat.extend(cc if g["type"] == "MultiPoint" else [cc])
            return from_geojson({"type": "MultiPoint", "coordinates": flat})
        # heterogeneous collection (reference GeometryBuilder builds any
        # collection, geometry.py:47-51): children concatenate into the
        # shared flat buffers; part_types + child_offsets record each
        # child's type and its span of parts, so to_geojson reconstructs
        # the exact nesting (golden round-trip test_geometry.py:135-179).
        if "GeometryCollection" in kinds:
            raise ValueError("nested GeometryCollection not supported")
        ccoords: list[np.ndarray] = []
        cro: list[int] = [0]
        cpo: list[int] = [0]
        ptypes: list[int] = []
        choffs: list[int] = [0]
        for g in geoms:
            pc = from_geojson(g)
            ccoords.append(pc.coords)
            rings_before = len(cro) - 1
            base_pair = cro[-1]
            cro.extend(base_pair + int(v) for v in pc.ring_offsets[1:])
            cpo.extend(rings_before + int(v) for v in pc.part_offsets[1:])
            ptypes.append(pc.gtype)
            choffs.append(choffs[-1] + len(pc.part_offsets) - 1)
        return PackedGeometry(
            gtype=GTYPE_IDS["GeometryCollection"],
            coords=np.concatenate(ccoords) if ccoords else np.empty(0, np.float64),
            ring_offsets=np.asarray(cro, dtype=np.int32),
            part_offsets=np.asarray(cpo, dtype=np.int32),
            part_types=np.asarray(ptypes, dtype=np.int8),
            child_offsets=np.asarray(choffs, dtype=np.int32),
        )

    if gt == "Point":
        if coords:
            add_ring([coords])
        part_offsets.append(len(ring_offsets) - 1)
    elif gt in ("LineString", "LinearRing"):
        add_ring(coords)
        part_offsets.append(len(ring_offsets) - 1)
        gt = "LineString"
    elif gt == "Polygon":
        for ring_pos in coords:
            add_ring(ring_pos)
        part_offsets.append(len(ring_offsets) - 1)
    elif gt == "MultiPoint":
        for p in coords:
            add_ring([p])
            part_offsets.append(len(ring_offsets) - 1)
    elif gt == "MultiLineString":
        for line in coords:
            add_ring(line)
            part_offsets.append(len(ring_offsets) - 1)
    elif gt == "MultiPolygon":
        for poly in coords:
            for ring_pos in poly:
                add_ring(ring_pos)
            part_offsets.append(len(ring_offsets) - 1)
    else:
        raise ValueError(f"unsupported geometry type: {gt}")

    return PackedGeometry(
        gtype=GTYPE_IDS[gt],
        coords=np.asarray(pts, dtype=np.float64),
        ring_offsets=np.asarray(ring_offsets, dtype=np.int32),
        part_offsets=np.asarray(part_offsets, dtype=np.int32),
    )


def collection_children(pg: PackedGeometry) -> list[PackedGeometry]:
    """GeometryCollection -> list of child PackedGeometry views (slices
    of the shared flat buffers, re-based to child-local offsets)."""
    if pg.gtype != GTYPE_IDS["GeometryCollection"]:
        return [pg]
    if pg.part_types is None or pg.child_offsets is None:
        raise ValueError("packed GeometryCollection lacks part_types/child_offsets")
    out = []
    ro, po, co = pg.ring_offsets, pg.part_offsets, pg.child_offsets
    for i in range(len(pg.part_types)):
        p0, p1 = int(co[i]), int(co[i + 1])
        r0, r1 = int(po[p0]), int(po[p1])
        c0, c1 = int(ro[r0]), int(ro[r1])
        out.append(
            PackedGeometry(
                gtype=int(pg.part_types[i]),
                coords=pg.coords[2 * c0 : 2 * c1],
                ring_offsets=np.asarray(ro[r0 : r1 + 1], dtype=np.int32) - np.int32(c0),
                part_offsets=np.asarray(po[p0 : p1 + 1], dtype=np.int32) - np.int32(r0),
            )
        )
    return out


def _round_pos(x: float, y: float, precision: int):
    # Reference rounds each coordinate: geometry.py:74 round(c, precision).
    # float() first: round(np.float64, n) delegates to numpy's scaled
    # rounding, which can move the value 1 ulp where CPython's
    # correctly-rounded round() (what the reference applies) is identity.
    return [round(float(x), precision), round(float(y), precision)]


def to_geojson(pg: PackedGeometry, precision: int = 15) -> dict:
    """PackedGeometry -> GeoJSON dict, coordinates rounded to `precision`
    (default 15, matching gdal_boots/geometry.py:72-77)."""
    name = GTYPE_NAMES[pg.gtype]
    if name == "GeometryCollection":
        return {
            "type": "GeometryCollection",
            "geometries": [
                to_geojson(ch, precision) for ch in collection_children(pg)
            ],
        }
    c = pg.coords.reshape(-1, 2)
    ro = pg.ring_offsets
    po = pg.part_offsets

    def ring_list(r):
        lo, hi = int(ro[r]), int(ro[r + 1])
        return [_round_pos(c[i, 0], c[i, 1], precision) for i in range(lo, hi)]

    if name == "Point":
        if pg.n_points == 0:
            return {"type": "Point", "coordinates": []}
        return {"type": "Point", "coordinates": ring_list(0)[0]}
    if name == "LineString":
        return {"type": "LineString", "coordinates": ring_list(0) if len(ro) > 1 else []}
    if name == "Polygon":
        nr = int(po[1]) if len(po) > 1 else 0
        return {"type": "Polygon", "coordinates": [ring_list(r) for r in range(nr)]}
    if name == "MultiPoint":
        return {
            "type": "MultiPoint",
            "coordinates": [ring_list(r)[0] for r in range(len(ro) - 1)],
        }
    if name == "MultiLineString":
        return {
            "type": "MultiLineString",
            "coordinates": [ring_list(r) for r in range(len(ro) - 1)],
        }
    if name == "MultiPolygon":
        parts = []
        for p in range(len(po) - 1):
            parts.append([ring_list(r) for r in range(int(po[p]), int(po[p + 1]))])
        return {"type": "MultiPolygon", "coordinates": parts}
    raise ValueError(f"bad gtype {pg.gtype}")


def bounds(pg: PackedGeometry) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy) envelope — reference Feature.bounds
    (gdal.py:961-962) / Layer extent (gdal.py:1109-1139)."""
    if pg.n_points == 0:
        return (np.nan, np.nan, np.nan, np.nan)
    x, y = pg.xy()
    return (float(x.min()), float(y.min()), float(x.max()), float(y.max()))
