"""OpenStreetMap XML vector ingest from scratch — no GDAL.

Produces the reference's 5-layer OSM model (the layout OGR's osm
driver exposes and the reference's VectorDataset.open surfaces,
gdal.py:1197-1205): ``points`` (tagged nodes), ``lines`` (tagged
unclosed ways), ``multipolygons`` (multipolygon/boundary relations
with ways stitched into outer/inner rings, plus closed area ways),
``multilinestrings`` (route-style relations) and ``other_relations``.
Layer schemas, tag->column mapping, the hstore-style ``other_tags``
column and the selection rules were derived empirically against the
reference fixture pair minsk-boundary.osm / minsk-boundary.gpkg
(converted with OGR) — the test suite asserts layer-by-layer parity.

Whole-file XML is not splittable: parsing is driver-side, matching
the engine's contract that vector layers are DIMENSION-sized.
"""

from __future__ import annotations

import json
import xml.etree.ElementTree as ET

import numpy as np

from pyspark.sql import SparkSession

from .vector_io import FEATURE_SCHEMA, VectorDataset

# keys OGR's default osmconf drops entirely (verified on the fixture:
# ele/note/created_by never reach columns or other_tags)
IGNORED_KEYS = {"created_by", "converted_by", "source", "time", "ele", "note", "todo", "fixme", "FIXME"}

# per-layer attribute columns (osmconf defaults; the exact sets the
# reference 5-layer gpkg fixture carries)
LAYER_FIELDS = {
    "points": ["osm_id", "name", "barrier", "highway", "ref", "address", "is_in", "place", "man_made"],
    "lines": ["osm_id", "name", "highway", "waterway", "aerialway", "barrier", "man_made", "z_order"],
    "multilinestrings": ["osm_id", "name", "type"],
    "multipolygons": [
        "osm_id", "osm_way_id", "name", "type", "aeroway", "amenity", "admin_level", "barrier",
        "boundary", "building", "craft", "geological", "historic", "land_area", "landuse", "leisure",
        "man_made", "military", "natural", "office", "place", "shop", "sport", "tourism",
    ],
    "other_relations": ["osm_id", "name", "type"],
}

# closed ways with any of these keys are polygons (osmconf
# closed_ways_are_polygons); area=yes forces, area=no blocks
AREA_KEYS = {
    "aeroway", "amenity", "boundary", "building", "craft", "geological", "historic", "landuse",
    "leisure", "military", "natural", "office", "place", "shop", "sport", "tourism",
}

_Z_HIGHWAY = {
    "minor": 3, "road": 3, "unclassified": 3, "residential": 3, "tertiary_link": 4, "tertiary": 4,
    "secondary_link": 6, "secondary": 6, "primary_link": 7, "primary": 7, "trunk_link": 8,
    "trunk": 8, "motorway_link": 9, "motorway": 9,
}


def _z_order(tags: dict) -> int:
    """OGR osmconf z_order: highway rank + rail +5, +/-10 per layer,
    +10 bridge, -10 tunnel.  (All-zero on the fixture — no highways —
    which the parity test pins.)"""
    z = _Z_HIGHWAY.get(tags.get("highway", ""), 0)
    if tags.get("railway"):
        z += 5
    try:
        z += 10 * int(tags.get("layer", 0))
    except ValueError:
        pass
    if tags.get("bridge") not in (None, "no"):
        z += 10
    if tags.get("tunnel") not in (None, "no"):
        z -= 10
    return z


def _hstore(tags: dict, exclude: set[str]) -> str | None:
    parts = []
    for k, v in tags.items():
        if k in exclude or k in IGNORED_KEYS:
            continue
        ke = k.replace("\\", "\\\\").replace('"', '\\"')
        ve = v.replace("\\", "\\\\").replace('"', '\\"')
        parts.append(f'"{ke}"=>"{ve}"')
    return ",".join(parts) if parts else None


def _feature_row(fid: int, layer: str, geom: dict | None, tags: dict, ids: dict) -> tuple:
    fields = LAYER_FIELDS[layer]
    props = {}
    used = set(IGNORED_KEYS)
    for f in fields:
        if f in ids:
            props[f] = ids[f]
        elif f == "z_order":
            props[f] = _z_order(tags)
        else:
            props[f] = tags.get(f)
            used.add(f)
    props["other_tags"] = _hstore(tags, used)
    return (
        fid,
        geom["type"] if geom else None,
        json.dumps(geom, separators=(",", ":")) if geom else None,
        json.dumps(props, separators=(",", ":"), ensure_ascii=False),
    )


def _significant(tags: dict) -> bool:
    return any(k not in IGNORED_KEYS for k in tags)


def _is_area(tags: dict) -> bool:
    if tags.get("area") == "no":
        return False
    if tags.get("area") == "yes":
        return True
    return any(k in AREA_KEYS for k in tags)


def _assemble_rings(seqs: list[list[int]]) -> list[list[int]]:
    """Stitch way node-id sequences into closed rings by shared
    endpoints (unclosed leftovers are dropped, as OGR does).

    Endpoint-indexed: each join is O(1) via a node-id -> pending-way
    index, so a 10k-way boundary relation stitches in O(total nodes)
    rather than the quadratic scan of the naive pool walk."""
    rings_pre = [list(s) for s in seqs if len(s) >= 4 and s[0] == s[-1]]
    pool: dict[int, list[int]] = {
        i: list(s) for i, s in enumerate(seqs) if len(s) >= 2 and s[0] != s[-1]
    }
    by_end: dict[int, set[int]] = {}
    for i, s in pool.items():
        by_end.setdefault(s[0], set()).add(i)
        by_end.setdefault(s[-1], set()).add(i)

    def _unindex(i: int, s: list[int]) -> None:
        for node in (s[0], s[-1]):
            ids = by_end.get(node)
            if ids:
                ids.discard(i)
                if not ids:
                    del by_end[node]

    rings = list(rings_pre)
    while pool:
        i, cur = pool.popitem()
        _unindex(i, cur)
        while cur[0] != cur[-1]:
            cand = by_end.get(cur[-1]) or by_end.get(cur[0])
            if not cand:
                break
            j = next(iter(cand))
            w = pool.pop(j)
            _unindex(j, w)
            if w[0] == cur[-1]:
                cur += w[1:]
            elif w[-1] == cur[-1]:
                cur += w[-2::-1]
            elif w[-1] == cur[0]:
                cur = w[:-1] + cur
            else:
                cur = w[::-1][:-1] + cur
        if cur[0] == cur[-1] and len(cur) >= 4:
            rings.append(cur)
    return rings


def read_osm(spark: SparkSession, path: str, max_bytes: int = 1 << 30) -> VectorDataset:
    """OSM XML file -> VectorDataset with the 5 OGR-compatible layers.

    Driver-side parse by the documented dimension-size contract: OSM
    XML needs global node/way/relation resolution, so it is not
    splittable.  A planet-scale file would OOM the driver — refuse it
    early with a pointer at the splittable path instead."""
    import os as _os

    size = _os.path.getsize(path)
    if size > max_bytes:
        raise ValueError(
            f"OSM file is {size / 2**30:.1f} GiB (> {max_bytes / 2**30:.1f} GiB): "
            "driver-side XML parse is for dimension-sized extracts. "
            "Convert planet-scale data to the splittable NDJSON layer "
            "directory (sources/vector_io.py) upstream, or raise "
            "max_bytes explicitly if the driver has the memory."
        )
    from ..geom.pip import points_in_polygon

    nodes: dict[int, tuple[float, float, dict]] = {}
    ways: dict[int, tuple[list[int], dict]] = {}
    rels: dict[int, tuple[list[tuple[str, int, str]], dict]] = {}
    for _, el in ET.iterparse(path):
        if el.tag == "node":
            tags = {t.get("k"): t.get("v") for t in el if t.tag == "tag"}
            nodes[int(el.get("id"))] = (float(el.get("lon")), float(el.get("lat")), tags)
            el.clear()
        elif el.tag == "way":
            nds = [int(n.get("ref")) for n in el if n.tag == "nd"]
            tags = {t.get("k"): t.get("v") for t in el if t.tag == "tag"}
            ways[int(el.get("id"))] = (nds, tags)
            el.clear()
        elif el.tag == "relation":
            members = [(m.get("type"), int(m.get("ref")), m.get("role")) for m in el if m.tag == "member"]
            tags = {t.get("k"): t.get("v") for t in el if t.tag == "tag"}
            rels[int(el.get("id"))] = (members, tags)
            el.clear()

    def coords_of(nds: list[int]) -> list[list[float]]:
        return [[nodes[n][0], nodes[n][1]] for n in nds if n in nodes]

    points_rows, lines_rows, mls_rows, mp_rows, other_rows = [], [], [], [], []

    for nid, (lon, lat, tags) in nodes.items():
        if _significant(tags):
            geom = {"type": "Point", "coordinates": [lon, lat]}
            points_rows.append(
                _feature_row(len(points_rows) + 1, "points", geom, tags, {"osm_id": str(nid)})
            )

    # ways consumed as OUTER rings of an emitted polygon relation are
    # not duplicated as standalone polygons (inner-role ways with their
    # own tags ARE — verified on the fixture: the boundary's outer way
    # is absorbed, its 4 tagged inner enclaves stay).  Populated inside
    # the emission loop (ADVICE r4): a relation that is skipped — not
    # _significant, or no assemblable outer ring — absorbs nothing, so
    # its tagged closed member ways still emit as standalone polygons.
    consumed_outer: set[int] = set()

    for rid, (members, tags) in rels.items():
        rtype = tags.get("type")
        if rtype in ("multipolygon", "boundary"):
            # OGR "old-style multipolygon" rule: the structural `type`
            # tag alone does not make the relation a feature — a
            # relation with no other significant tags emits nothing
            # and its tagged member ways keep their own features
            # (reachable form of the ADVICE r4 consumed_outer leak).
            if not _significant({k: v for k, v in tags.items() if k != "type"}):
                continue
        elif not _significant(tags):
            continue
        if rtype in ("multipolygon", "boundary"):
            outer_seqs = [ways[r][0] for t, r, role in members if t == "way" and role in ("outer", "") and r in ways]
            inner_seqs = [ways[r][0] for t, r, role in members if t == "way" and role == "inner" and r in ways]
            outers = [coords_of(r) for r in _assemble_rings(outer_seqs)]
            inners = [coords_of(r) for r in _assemble_rings(inner_seqs)]
            outers = [r for r in outers if len(r) >= 4]
            inners = [r for r in inners if len(r) >= 4]
            if not outers:
                continue
            parts = [[o] for o in outers]
            for ring in inners:
                placed = False
                px, py = ring[0]
                for part in parts:
                    o = np.asarray(part[0], np.float64)
                    inside = points_in_polygon(
                        np.array([px]), np.array([py]),
                        o.ravel(), np.asarray([0, len(part[0])], np.int32),
                    )[0]
                    if inside:
                        part.append(ring)
                        placed = True
                        break
                if not placed:
                    parts[0].append(ring)
            geom = {"type": "MultiPolygon", "coordinates": parts}
            mp_rows.append(
                _feature_row(
                    len(mp_rows) + 1, "multipolygons", geom, tags,
                    {"osm_id": str(rid), "osm_way_id": None},
                )
            )
            for mtype, ref, role in members:
                if mtype == "way" and role in ("outer", ""):
                    consumed_outer.add(ref)
        elif rtype in ("route", "multilinestring"):
            seqs = [coords_of(ways[r][0]) for t, r, _ in members if t == "way" and r in ways]
            seqs = [s for s in seqs if len(s) >= 2]
            if not seqs:
                continue
            geom = {"type": "MultiLineString", "coordinates": seqs}
            mls_rows.append(
                _feature_row(len(mls_rows) + 1, "multilinestrings", geom, tags, {"osm_id": str(rid)})
            )
        else:
            other_rows.append(
                _feature_row(len(other_rows) + 1, "other_relations", None, tags, {"osm_id": str(rid)})
            )

    for wid, (nds, tags) in ways.items():
        # ways need ANY tag to be emitted — even one from IGNORED_KEYS
        # (the fixture's note-only boundary segments are real OGR lines
        # with all-NULL attributes); nodes use the stricter rule.
        if not tags:
            continue
        closed = len(nds) >= 4 and nds[0] == nds[-1]
        if closed and _is_area(tags):
            if wid in consumed_outer:
                continue
            ring = coords_of(nds)
            if len(ring) < 4:
                continue
            geom = {"type": "MultiPolygon", "coordinates": [[ring]]}
            mp_rows.append(
                _feature_row(
                    len(mp_rows) + 1, "multipolygons", geom, tags,
                    {"osm_id": None, "osm_way_id": str(wid)},
                )
            )
        else:
            line = coords_of(nds)
            if len(line) < 2:
                continue
            geom = {"type": "LineString", "coordinates": line}
            lines_rows.append(
                _feature_row(len(lines_rows) + 1, "lines", geom, tags, {"osm_id": str(wid)})
            )

    layers = {
        "points": points_rows,
        "lines": lines_rows,
        "multilinestrings": mls_rows,
        "multipolygons": mp_rows,
        "other_relations": other_rows,
    }
    return VectorDataset(
        {name: spark.createDataFrame(rows, FEATURE_SCHEMA) for name, rows in layers.items()}
    )
