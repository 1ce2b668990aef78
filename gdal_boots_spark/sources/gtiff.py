"""Pure-Python GeoTIFF container — the engine's GTiff analogue.

Reference: ``RasterDataset.to_file(..., GTiff())`` (gdal.py:526-535)
with the GTiff creation options (options.py:58-108; zlevel applies iff
compression is deflate, options.py:88-92) and the byte-size goldens of
test_raster.py:90-113 (higher zlevel -> smaller file).

This writes REAL little-endian TIFF 6.0 + GeoTIFF 1.1 bytes readable
by GDAL/QGIS — no image library:

* tiled (TIFF tags 322/323/324/325, tile dims multiple of 16) or
  stripped layout;
* compression none (1) or Adobe deflate (8, ``zlib`` — in the stdlib);
* dtypes uint8/16/32, int8/16/32, float32/64 via BitsPerSample +
  SampleFormat;
* multi-band as chunky pixel interleave (PlanarConfiguration=1);
* georeferencing: ModelPixelScale (33550) + ModelTiepoint (33922),
  CRS via a minimal GeoKeyDirectory (34735: model type + raster type +
  Projected/GeographicTypeGeoKey = EPSG), nodata via GDAL_NODATA
  (42113, ASCII) — exactly the tag set gdal.Translate emits for a
  north-up EPSG raster.

``decode_gtiff`` parses the same subset back (both byte orders), so
encode/decode round-trips bit-exactly and the distributed ingest path
(``read_gtiff_tiles``: binaryFile scan -> per-file decode -> tile
rows) mirrors the PNG ingest (sources/png.py, tiles.py:179).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# dtype -> (BitsPerSample, SampleFormat); SampleFormat: 1 uint, 2 int, 3 float
_DTYPES = {
    "uint8": (8, 1), "uint16": (16, 1), "uint32": (32, 1),
    "int8": (8, 2), "int16": (16, 2), "int32": (32, 2),
    "float32": (32, 3), "float64": (64, 3),
}
_FMT_TO_DTYPE = {(b, f): d for d, (b, f) in _DTYPES.items()}

_SHORT, _LONG, _ASCII, _DOUBLE = 3, 4, 2, 12
_TYPE_SIZE = {_SHORT: 2, _LONG: 4, _ASCII: 1, _DOUBLE: 8}


def encode_gtiff(
    arr: np.ndarray,
    transform: tuple,
    epsg: int = 4326,
    nodata: float | None = None,
    compress: str = "deflate",
    zlevel: int = 6,
    blockxsize: int | None = 256,
    blockysize: int | None = 256,
) -> bytes:
    """(bands, h, w) or (h, w) array -> GeoTIFF bytes.

    ``zlevel`` is honored only when ``compress`` is deflate — the
    reference's option rule (options.py:88-92)."""
    if arr.ndim == 2:
        arr = arr[None]
    bands, h, w = arr.shape
    dt = str(arr.dtype)
    if dt not in _DTYPES:
        raise ValueError(f"unsupported dtype {dt}")
    bits, sfmt = _DTYPES[dt]
    comp = compress.lower()
    if comp not in ("none", "deflate"):
        raise ValueError("compress must be none|deflate (zstd/lzw need foreign codecs)")
    tiled = blockxsize is not None and blockysize is not None
    if tiled and (blockxsize % 16 or blockysize % 16):
        raise ValueError("TIFF tile dims must be multiples of 16")

    # chunky interleave: (h, w, bands) row-major
    chunky = np.ascontiguousarray(np.moveaxis(arr, 0, -1))

    def pack(block: np.ndarray) -> bytes:
        raw = block.tobytes()
        if comp == "deflate":
            return zlib.compress(raw, zlevel)
        return raw

    blocks: list[bytes] = []
    if tiled:
        ntx, nty = -(-w // blockxsize), -(-h // blockysize)
        for ty in range(nty):
            for tx in range(ntx):
                # TIFF tiles are FULL size; edge tiles pad with zeros
                tile = np.zeros((blockysize, blockxsize, bands), dtype=arr.dtype)
                ys, xs = ty * blockysize, tx * blockxsize
                sub = chunky[ys : ys + blockysize, xs : xs + blockxsize]
                tile[: sub.shape[0], : sub.shape[1]] = sub
                blocks.append(pack(tile))
    else:
        rps = max(1, (8192 // max(1, w * bands * bits // 8)) or 1)
        for y0 in range(0, h, rps):
            blocks.append(pack(chunky[y0 : y0 + rps]))

    a, b, c, d, e, f = transform
    geo_doubles_scale = struct.pack("<3d", a, -e, 0.0)
    geo_doubles_tie = struct.pack("<6d", 0.0, 0.0, 0.0, c, f, 0.0)
    is_geographic = epsg == 4326 or (4000 <= epsg < 5000)
    geokeys = [
        (1024, 0, 1, 2 if is_geographic else 1),  # GTModelType
        (1025, 0, 1, 1),  # GTRasterType = PixelIsArea
        (2048 if is_geographic else 3072, 0, 1, int(epsg)),
    ]
    gkd = struct.pack(f"<{4 + 4 * len(geokeys)}H", 1, 1, 0, len(geokeys), *(x for k in geokeys for x in k))

    entries: list[tuple[int, int, int, bytes]] = [
        (256, _LONG, 1, struct.pack("<I", w)),
        (257, _LONG, 1, struct.pack("<I", h)),
        (258, _SHORT, bands, struct.pack(f"<{bands}H", *([bits] * bands))),
        (259, _SHORT, 1, struct.pack("<H", 8 if comp == "deflate" else 1)),
        (262, _SHORT, 1, struct.pack("<H", 1)),  # BlackIsZero
        (277, _SHORT, 1, struct.pack("<H", bands)),
        (284, _SHORT, 1, struct.pack("<H", 1)),  # chunky
        (339, _SHORT, bands, struct.pack(f"<{bands}H", *([sfmt] * bands))),
        (33550, _DOUBLE, 3, geo_doubles_scale),
        (33922, _DOUBLE, 6, geo_doubles_tie),
        (34735, _SHORT, len(gkd) // 2, gkd),
    ]
    if tiled:
        entries.append((322, _LONG, 1, struct.pack("<I", blockxsize)))
        entries.append((323, _LONG, 1, struct.pack("<I", blockysize)))
    else:
        entries.insert(8, (278, _LONG, 1, struct.pack("<I", rps)))
    if nodata is not None:
        nd = (repr(float(nodata)) if isinstance(nodata, float) or sfmt == 3 else str(int(nodata))).encode() + b"\x00"
        entries.append((42113, _ASCII, len(nd), nd))

    n_blocks = len(blocks)
    counts = struct.pack(f"<{n_blocks}I", *(len(bk) for bk in blocks))
    # layout: header(8) | IFD | external payloads | block offsets+counts | blocks
    n_entries = len(entries) + 2  # + offsets tag + bytecounts tag
    ifd_size = 2 + 12 * n_entries + 4
    pos = 8 + ifd_size
    ext: list[bytes] = []
    packed_entries: list[bytes] = []

    def entry(tag, typ, cnt, payload):
        nonlocal pos
        if len(payload) <= 4:
            return struct.pack("<HHI", tag, typ, cnt) + payload.ljust(4, b"\x00")
        off = pos
        ext.append(payload)
        pos += len(payload) + (len(payload) & 1)
        return struct.pack("<HHII", tag, typ, cnt, off)

    off_tag, cnt_tag = (324, 325) if tiled else (273, 279)
    for tag, typ, cnt, payload in sorted(entries):
        packed_entries.append(entry(tag, typ, cnt, payload))
    # block offsets/counts external arrays (reserve space, fill after)
    offsets_pos = pos
    pos += 4 * n_blocks
    counts_pos = pos
    pos += 4 * n_blocks
    data_start = pos
    offs, cur = [], data_start
    for bk in blocks:
        offs.append(cur)
        cur += len(bk)
    o_entry = struct.pack("<HHII", off_tag, _LONG, n_blocks, offsets_pos if n_blocks > 1 else offs[0])
    c_entry = struct.pack("<HHII", cnt_tag, _LONG, n_blocks, counts_pos if n_blocks > 1 else len(blocks[0]))
    all_entries = sorted(packed_entries + [o_entry, c_entry], key=lambda eb: struct.unpack("<H", eb[:2])[0])

    out = bytearray()
    out += struct.pack("<2sHI", b"II", 42, 8)
    out += struct.pack("<H", n_entries)
    for eb in all_entries:
        out += eb
    out += struct.pack("<I", 0)  # next IFD
    for payload in ext:
        out += payload
        if len(payload) & 1:
            out += b"\x00"
    out += struct.pack(f"<{n_blocks}I", *offs)
    out += counts
    for bk in blocks:
        out += bk
    return bytes(out)


def _read_entries(buf: bytes, en: str, ifd_off: int):
    (n,) = struct.unpack_from(f"{en}H", buf, ifd_off)
    out = {}
    for i in range(n):
        tag, typ, cnt = struct.unpack_from(f"{en}HHI", buf, ifd_off + 2 + 12 * i)
        size = _TYPE_SIZE.get(typ, 1) * cnt
        vpos = ifd_off + 2 + 12 * i + 8
        if size > 4:
            (vpos,) = struct.unpack_from(f"{en}I", buf, vpos)
        if typ == _SHORT:
            vals = struct.unpack_from(f"{en}{cnt}H", buf, vpos)
        elif typ == _LONG:
            vals = struct.unpack_from(f"{en}{cnt}I", buf, vpos)
        elif typ == _DOUBLE:
            vals = struct.unpack_from(f"{en}{cnt}d", buf, vpos)
        elif typ == _ASCII:
            vals = (buf[vpos : vpos + cnt].split(b"\x00")[0].decode(),)
        else:
            continue
        out[tag] = vals
    return out


def decode_gtiff(buf: bytes):
    """GeoTIFF bytes -> (array (bands,h,w), transform, epsg, nodata).
    Parses the subset encode_gtiff writes (both byte orders, tiled or
    stripped, none/deflate)."""
    order = buf[:2]
    en = "<" if order == b"II" else ">"
    magic, ifd_off = struct.unpack_from(f"{en}HI", buf, 2)
    if order not in (b"II", b"MM") or magic != 42:
        raise ValueError("not a classic TIFF")
    t = _read_entries(buf, en, ifd_off)
    w, h = t[256][0], t[257][0]
    bands = t.get(277, (1,))[0]
    bits, sfmt = t[258][0], t.get(339, (1,))[0]
    dt = np.dtype(_FMT_TO_DTYPE[(bits, sfmt)])
    if en == ">":
        dt = dt.newbyteorder(">")
    comp = t.get(259, (1,))[0]
    if comp not in (1, 8):
        raise ValueError(f"unsupported TIFF compression {comp}")
    if t.get(284, (1,))[0] != 1:
        raise ValueError("only chunky PlanarConfiguration supported")

    def unpack(raw: bytes) -> bytes:
        return zlib.decompress(raw) if comp == 8 else raw

    chunky = np.zeros((h, w, bands), dtype=dt)
    if 322 in t:  # tiled
        tw, th = t[322][0], t[323][0]
        offs, cnts = t[324], t[325]
        ntx = -(-w // tw)
        for i, (o, ccnt) in enumerate(zip(offs, cnts)):
            ty, tx = i // ntx, i % ntx
            tile = np.frombuffer(unpack(buf[o : o + ccnt]), dtype=dt).reshape(th, tw, bands)
            ys, xs = ty * th, tx * tw
            chunky[ys : ys + th, xs : xs + tw] = tile[: min(th, h - ys), : min(tw, w - xs)]
    else:
        rps = t.get(278, (h,))[0]
        offs, cnts = t[273], t[279]
        for i, (o, ccnt) in enumerate(zip(offs, cnts)):
            rows = min(rps, h - i * rps)
            chunky[i * rps : i * rps + rows] = np.frombuffer(
                unpack(buf[o : o + ccnt]), dtype=dt
            ).reshape(rows, w, bands)

    sx, sy = (t[33550][0], t[33550][1]) if 33550 in t else (1.0, 1.0)
    cx, cy = (t[33922][3], t[33922][4]) if 33922 in t else (0.0, 0.0)
    transform = (sx, 0.0, cx, 0.0, -sy, cy)
    epsg = 0
    if 34735 in t:
        gk = t[34735]
        for i in range(gk[3]):
            key, _, _, val = gk[4 + 4 * i : 8 + 4 * i]
            if key in (2048, 3072):
                epsg = int(val)
    nodata = None
    if 42113 in t:
        try:
            nodata = float(t[42113][0])
        except ValueError:
            nodata = None
    arr = np.moveaxis(chunky, -1, 0)
    if en == ">":
        arr = arr.astype(dt.newbyteorder("<"))
    return arr, transform, epsg, nodata


# --- Spark integration ------------------------------------------------------

def write_gtiff(tiles, grid, path: str, compress: str = "deflate", zlevel: int = 6) -> None:
    """Single-file GeoTIFF export (reference to_file semantics,
    gdal.py:526-535): assemble the raster driver-side and encode.  Like
    write_geojson, the single-file sink is inherently a driver
    operation; the scale path is the tile-table Parquet sink
    (GTiffLike.parquet_options) or per-tile read_gtiff_tiles files."""
    from .tiles import tiles_to_array

    arr = tiles_to_array(tiles, grid)
    if arr.ndim == 2:
        arr = arr[None]
    blob = encode_gtiff(
        arr, grid.transform, epsg=grid.epsg, nodata=grid.nodata,
        compress=compress, zlevel=zlevel,
        blockxsize=None, blockysize=None,
    )
    with open(path, "wb") as fh:
        fh.write(blob)


def read_gtiff_tiles(spark, path_glob: str, tile_w: int = 256, tile_h: int = 256):
    """Distributed GeoTIFF ingest: binaryFile scan -> per-file decode in
    executors -> tile rows (mirrors the PNG ingest, tiles.py:179).
    Each file becomes one raster (raster_id = file name sans suffix);
    files split into (tile_h, tile_w) tile rows."""
    import os

    import pandas as pd
    from pyspark.sql import functions as F  # noqa: F401

    from .tiles import TILE_SCHEMA

    files = spark.read.format("binaryFile").load(path_glob).select("path", "content")

    def to_tiles(batches):
        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                arr, transform, epsg, nodata = decode_gtiff(bytes(blob))
                rid = os.path.splitext(os.path.basename(p))[0]
                bands, hh, ww = arr.shape
                a, b0, c, d0, e, f = transform
                for band in range(bands):
                    for ty in range(-(-hh // tile_h)):
                        for tx in range(-(-ww // tile_w)):
                            sub = arr[band, ty * tile_h : (ty + 1) * tile_h, tx * tile_w : (tx + 1) * tile_w]
                            px, py = tx * tile_w, ty * tile_h
                            rows.append({
                                "tile_key": f"{rid}/{band}/{ty}/{tx}",
                                "raster_id": rid,
                                "band": band,
                                "tile_x": tx,
                                "tile_y": ty,
                                "epsg": epsg,
                                "transform": [a, b0, a * px + b0 * py + c, d0, e, d0 * px + e * py + f],
                                "width": sub.shape[1],
                                "height": sub.shape[0],
                                "dtype": str(arr.dtype),
                                "nodata": nodata,
                                "data": np.ascontiguousarray(sub).tobytes(),
                                "meta": None,
                            })
            if rows:
                yield pd.DataFrame(rows)

    return files.mapInPandas(to_tiles, schema=TILE_SCHEMA)
