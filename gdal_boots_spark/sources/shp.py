"""ESRI Shapefile vector I/O from scratch — no GDAL.

The reference exports an ``ESRIShape`` driver-options marker
(options.py:126-130, __init__.py:4) whose OGR backend this module
replaces: ``.shp`` (geometry records), ``.shx`` (offset index) and
``.dbf`` (dBASE III attribute table) are read and written directly
with struct/NumPy per the ESRI Shapefile Technical Description
(file code 9994, big-endian headers, little-endian records).

Geometry mapping (2-D; Z/M variants read-flattened):
    Point <-> 1, (Multi)LineString <-> 3 (PolyLine),
    (Multi)Polygon <-> 5 (Polygon: rings concatenated, OUTER rings
    clockwise / holes counter-clockwise per spec — winding is written
    on encode and used on decode to regroup rings into polygons),
    MultiPoint <-> 8, NULL geometry <-> 0.

Shapefiles are single-type, whole-file containers — driver-side,
dimension-scale (the splittable scale format stays NDJSON/parquet).
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np

from pyspark.sql import DataFrame, SparkSession

from .vector_io import EXPORT_MAX_FEATURES, FEATURE_SCHEMA, collect_for_export

_SHP_NULL, _SHP_POINT, _SHP_POLYLINE, _SHP_POLYGON, _SHP_MULTIPOINT = 0, 1, 3, 5, 8


def _ring_area2(ring: np.ndarray) -> float:
    """2x signed area; NEGATIVE for clockwise (shapefile outer) rings."""
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def _close(ring):
    r = [list(map(float, p[:2])) for p in ring]
    if r and r[0] != r[-1]:
        r.append(r[0])
    return r


def _geom_to_shp(geom: dict | None) -> tuple[int, bytes]:
    """GeoJSON geometry -> (shape type, record payload after the type)."""
    if geom is None:
        return _SHP_NULL, b""
    gt = geom["type"]
    if gt == "Point":
        c = geom.get("coordinates") or []
        if not c:
            return _SHP_NULL, b""
        return _SHP_POINT, struct.pack("<dd", float(c[0]), float(c[1]))
    if gt in ("LineString", "MultiLineString"):
        parts = [geom["coordinates"]] if gt == "LineString" else geom["coordinates"]
        parts = [p for p in parts if len(p) >= 2]
        return _SHP_POLYLINE, _pack_parts(parts)
    if gt in ("Polygon", "MultiPolygon"):
        polys = [geom["coordinates"]] if gt == "Polygon" else geom["coordinates"]
        rings = []
        for poly in polys:
            for i, ring in enumerate(poly):
                r = np.asarray(_close(ring), np.float64)
                if len(r) < 4:
                    continue
                a2 = _ring_area2(r)
                # spec winding: outer ring (i==0) clockwise (area2<0),
                # holes counter-clockwise
                if (i == 0 and a2 > 0) or (i > 0 and a2 < 0):
                    r = r[::-1]
                rings.append(r.tolist())
        return _SHP_POLYGON, _pack_parts(rings)
    if gt == "MultiPoint":
        pts = np.asarray([p[:2] for p in geom["coordinates"]], np.float64).reshape(-1, 2)
        box = struct.pack(
            "<dddd", pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max()
        )
        return _SHP_MULTIPOINT, box + struct.pack("<i", len(pts)) + pts.astype("<f8").tobytes()
    if gt == "GeometryCollection":
        raise ValueError("shapefiles are single-type; flatten the GeometryCollection first")
    raise ValueError(f"unsupported geometry type for shapefile: {gt}")


def _pack_parts(parts: list) -> bytes:
    all_pts = np.asarray([p[:2] for part in parts for p in part], np.float64).reshape(-1, 2)
    box = struct.pack(
        "<dddd", all_pts[:, 0].min(), all_pts[:, 1].min(), all_pts[:, 0].max(), all_pts[:, 1].max()
    )
    offs, n = [], 0
    for part in parts:
        offs.append(n)
        n += len(part)
    return (
        box
        + struct.pack("<ii", len(parts), n)
        + b"".join(struct.pack("<i", o) for o in offs)
        + all_pts.astype("<f8").tobytes()
    )


def _shp_to_geom(stype: int, buf: bytes):
    if stype == _SHP_NULL:
        return None
    base = stype % 10  # Z (+10) and M (+20) variants share the XY prefix
    if base == _SHP_POINT:
        x, y = struct.unpack_from("<dd", buf, 0)
        return {"type": "Point", "coordinates": [x, y]}
    if base == _SHP_MULTIPOINT:
        n = struct.unpack_from("<i", buf, 32)[0]
        pts = np.frombuffer(buf, "<f8", count=2 * n, offset=36).reshape(-1, 2)
        return {"type": "MultiPoint", "coordinates": pts.tolist()}
    if base in (_SHP_POLYLINE, _SHP_POLYGON):
        nparts, npts = struct.unpack_from("<ii", buf, 32)
        offs = list(struct.unpack_from(f"<{nparts}i", buf, 40)) + [npts]
        pts = np.frombuffer(buf, "<f8", count=2 * npts, offset=40 + 4 * nparts).reshape(-1, 2)
        parts = [pts[offs[i] : offs[i + 1]].tolist() for i in range(nparts)]
        if base == _SHP_POLYLINE:
            if len(parts) == 1:
                return {"type": "LineString", "coordinates": parts[0]}
            return {"type": "MultiLineString", "coordinates": parts}
        # polygon: regroup rings by winding (outer = clockwise)
        outers, holes = [], []
        for p in parts:
            arr = np.asarray(p, np.float64)
            (outers if _ring_area2(arr) < 0 else holes).append(p)
        if not outers and holes:  # tolerate mis-wound files
            outers, holes = holes, []
        polys = [[o] for o in outers]
        if holes:
            from ..geom.pip import points_in_polygon

            for h in holes:
                placed = False
                hx, hy = h[0]
                for poly in polys:
                    o = np.asarray(poly[0], np.float64)
                    if points_in_polygon(
                        np.array([hx]), np.array([hy]), o.ravel(), np.asarray([0, len(poly[0])], np.int32)
                    )[0]:
                        poly.append(h)
                        placed = True
                        break
                if not placed and polys:
                    polys[0].append(h)
        if len(polys) == 1:
            return {"type": "Polygon", "coordinates": polys[0]}
        return {"type": "MultiPolygon", "coordinates": polys}
    raise ValueError(f"unsupported shapefile shape type {stype}")


# --- DBF (dBASE III) ---------------------------------------------------
def _dbf_write(path: str, names: list[str], types: dict, rows: list[dict]) -> None:
    fields = []
    for k in names:
        t = types[k]
        if t == "INTEGER":
            fields.append((k, k[:10], b"N", 18, 0))
        elif t == "REAL":
            fields.append((k, k[:10], b"N", 24, 15))
        else:
            # width from str(v) for every non-NULL value — `v or ""`
            # gave falsy non-nulls (False, 0 routed to TEXT) width 0
            # and truncated them on write (ADVICE r4)
            width = max(
                [1]
                + [
                    len(str(r[k]).encode("utf-8"))
                    for r in rows
                    if r.get(k) is not None
                ]
            )
            fields.append((k, k[:10], b"C", min(width, 254), 0))
    reclen = 1 + sum(f[3] for f in fields)
    with open(path, "wb") as f:
        f.write(struct.pack("<BBBBIHH20x", 3, 24, 1, 1, len(rows), 33 + 32 * len(fields), reclen))
        for _, trunc, typ, width, dec in fields:
            f.write(struct.pack("<11s1sIBB14x", trunc.encode("utf-8")[:11], typ, 0, width, dec))
        f.write(b"\x0d")
        for r in rows:
            f.write(b" ")  # not deleted
            for key, _, typ, width, dec in fields:
                v = r.get(key)
                if typ == b"N":
                    if v is None:
                        s = b" " * width
                    elif dec:
                        # fixed-decimal first; magnitudes that overflow
                        # the field fall back to shorter %g forms
                        # instead of silently truncating to garbage
                        txt = f"{float(v):.{dec}f}"
                        for sig in (17, 15, 12, 9, 6):
                            if len(txt) <= width:
                                break
                            txt = f"{float(v):.{sig}g}"
                        if len(txt) > width:
                            raise ValueError(f"numeric value {v!r} does not fit DBF field width {width}")
                        s = txt.rjust(width).encode()
                    else:
                        txt = str(int(v))
                        if len(txt) > width:
                            raise ValueError(f"integer value {v!r} does not fit DBF field width {width}")
                        s = txt.rjust(width).encode()
                else:
                    b = str(v if v is not None else "").encode("utf-8")[:width]
                    # never split a multi-byte UTF-8 character at the
                    # truncation boundary (ADVICE r4): drop any
                    # incomplete trailing sequence
                    s = b.decode("utf-8", "ignore").encode("utf-8").ljust(width)
                f.write(s)
        f.write(b"\x1a")


def _dbf_read(path: str) -> list[dict]:
    with open(path, "rb") as f:
        buf = f.read()
    nrec, hdrlen, reclen = struct.unpack_from("<IHH", buf, 4)
    fields = []
    off = 32
    while buf[off] != 0x0D:
        name = buf[off : off + 11].split(b"\x00")[0].decode("utf-8", "replace")
        typ = chr(buf[off + 11])
        width = buf[off + 16]
        dec = buf[off + 17]
        fields.append((name, typ, width, dec))
        off += 32
    out = []
    p = hdrlen
    for _ in range(nrec):
        if buf[p : p + 1] == b"*":  # deleted
            p += reclen
            continue
        rec, q = {}, p + 1
        for name, typ, width, dec in fields:
            raw = buf[q : q + width]
            q += width
            if typ == "N":
                s = raw.strip()
                if not s:
                    rec[name] = None
                elif dec or b"." in s:
                    rec[name] = float(s)
                else:
                    rec[name] = int(s)
            else:
                rec[name] = raw.decode("utf-8", "replace").rstrip() or None
        out.append(rec)
        p += reclen
    return out


# --- container read / write -------------------------------------------
def write_shp(
    df: DataFrame, path: str, overwrite: bool = False,
    max_features: int = EXPORT_MAX_FEATURES,
) -> None:
    """features DataFrame -> path.shp/.shx/.dbf (single geometry type;
    reference to_file overwrite semantics).  Collects to the driver
    (single-file container) — guarded by ``max_features``; use
    write_ndjson/parquet for planet-scale layers."""
    base = path[:-4] if path.endswith(".shp") else path
    if os.path.exists(base + ".shp"):
        if not overwrite:
            raise FileExistsError(base + ".shp")
        for ext in (".shp", ".shx", ".dbf"):
            if os.path.exists(base + ext):
                os.remove(base + ext)
    feats = collect_for_export(
        df.select("fid", "gtype", "geojson", "props_json"), max_features, "Shapefile")
    payloads, types = [], set()
    for r in feats:
        st, body = _geom_to_shp(json.loads(r["geojson"]) if r["geojson"] else None)
        payloads.append((st, body))
        if st != _SHP_NULL:
            types.add(st)
    if len(types) > 1:
        raise ValueError(f"shapefiles are single-type; got shape types {sorted(types)}")
    ftype = types.pop() if types else _SHP_NULL

    records, offsets = [], []
    off = 50  # header is 100 bytes = 50 16-bit words
    for i, (st, body) in enumerate(payloads):
        content = struct.pack("<i", st) + body
        clen_words = len(content) // 2
        records.append(struct.pack(">ii", i + 1, clen_words) + content)
        offsets.append((off, clen_words))
        off += 4 + clen_words
    total_words = off

    xs, ys = [], []
    for r in feats:
        if r["geojson"]:
            from ..geom.packed import from_geojson

            pg = from_geojson(json.loads(r["geojson"]))
            if pg.coords.size:
                c = pg.coords.reshape(-1, 2)
                xs += [float(c[:, 0].min()), float(c[:, 0].max())]
                ys += [float(c[:, 1].min()), float(c[:, 1].max())]
    bbox = (min(xs), min(ys), max(xs), max(ys)) if xs else (0.0, 0.0, 0.0, 0.0)

    def header(total_w):
        return (
            struct.pack(">i20xi", 9994, total_w)
            + struct.pack("<ii", 1000, ftype)
            + struct.pack("<dddd", *bbox)
            + struct.pack("<dddd", 0, 0, 0, 0)  # Z/M ranges
        )

    with open(base + ".shp", "wb") as f:
        f.write(header(total_words))
        for rec in records:
            f.write(rec)
    with open(base + ".shx", "wb") as f:
        f.write(header(50 + 4 * len(records)))
        for o, ln in offsets:
            f.write(struct.pack(">ii", o, ln))

    props = [json.loads(r["props_json"] or "{}") for r in feats]
    names: list[str] = []
    for p in props:
        for k in p:
            if k not in names:
                names.append(k)
    if not names:
        names = ["fid_"]
        for p, r in zip(props, feats):
            p["fid_"] = r["fid"]

    def sql_type(vals):
        kinds = {type(v) for v in vals if v is not None}
        if kinds <= {int}:
            return "INTEGER"
        if kinds <= {int, float}:
            return "REAL"
        return "TEXT"

    types_map = {k: sql_type([p.get(k) for p in props]) for k in names}
    _dbf_write(base + ".dbf", names, types_map, props)


def read_shp(spark: SparkSession, path: str) -> DataFrame:
    """path(.shp) -> features DataFrame (fid = 0-based record index,
    matching OGR's shapefile FIDs)."""
    base = path[:-4] if path.endswith(".shp") else path
    with open(base + ".shp", "rb") as f:
        buf = f.read()
    assert struct.unpack_from(">i", buf, 0)[0] == 9994, "not a shapefile"
    attrs = _dbf_read(base + ".dbf") if os.path.exists(base + ".dbf") else []
    rows, off, i = [], 100, 0
    while off + 8 <= len(buf):
        _, clen_words = struct.unpack_from(">ii", buf, off)
        stype = struct.unpack_from("<i", buf, off + 8)[0]
        geom = _shp_to_geom(stype, buf[off + 12 : off + 8 + 2 * clen_words])
        props = attrs[i] if i < len(attrs) else {}
        rows.append(
            (
                i,
                geom["type"] if geom else None,
                json.dumps(geom, separators=(",", ":")) if geom else None,
                json.dumps(props, separators=(",", ":"), ensure_ascii=False),
            )
        )
        off += 8 + 2 * clen_words
        i += 1
    return spark.createDataFrame(rows, FEATURE_SCHEMA)
