"""Minimal GeoTIFF reader/writer (pure stdlib — no GDAL/rasterio here).

Real-raster ingestion seam #2 (alongside the .asc reader in
geoflow.sources.tiles): the reference opens any GDAL raster
(``util/gdal_utils.py:44-59``); this module covers the baseline-TIFF
subset that plain DEM/band exports actually use, feeding the same tile
table as every other source:

- both byte orders, strip- or tile-organized, PlanarConfiguration=1,
- BitsPerSample 8/16/32/64 with SampleFormat uint/int/float,
- Compression 1 (none) or 8 (zlib/Deflate),
- GeoTIFF georeferencing via ModelPixelScale (33550) + ModelTiepoint
  (33922) -> origin + ewres/nsres in the GDAL sign convention,
- NODATA via the GDAL_NODATA ASCII tag (42113).

Fuller codecs (LZW, JPEG-in-TIFF, BigTIFF) belong to rasterio/GDAL —
slot them in upstream of ``raster_to_tile_table`` when available.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_TAG_WIDTH = 256
_TAG_HEIGHT = 257
_TAG_BITS = 258
_TAG_COMPRESSION = 259
_TAG_STRIP_OFFSETS = 273
_TAG_SAMPLES_PER_PIXEL = 277
_TAG_ROWS_PER_STRIP = 278
_TAG_STRIP_COUNTS = 279
_TAG_PLANAR = 284
_TAG_TILE_WIDTH = 322
_TAG_TILE_HEIGHT = 323
_TAG_TILE_OFFSETS = 324
_TAG_TILE_COUNTS = 325
_TAG_SAMPLE_FORMAT = 339
_TAG_PIXEL_SCALE = 33550
_TAG_TIEPOINT = 33922
_TAG_GDAL_NODATA = 42113

_FIELD_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4,
                10: 8, 11: 4, 12: 8}
_FIELD_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd_values(data: bytes, bo: str, ftype: int, count: int,
                     payload: bytes):
    size = _FIELD_SIZES[ftype] * count
    if size > 4:
        off = struct.unpack(bo + "I", payload)[0]
        raw = data[off:off + size]
    else:
        raw = payload[:size]
    if ftype == 2:                        # ASCII
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if ftype in (5, 10):                  # RATIONAL
        fmt = bo + ("II" if ftype == 5 else "ii")
        vals = [struct.unpack_from(fmt, raw, 8 * i) for i in range(count)]
        return [n / d if d else 0.0 for n, d in vals]
    fmt = bo + _FIELD_FMT[ftype] * count
    return list(struct.unpack(fmt, raw))


def read_geotiff(path: str):
    """-> (bands (S, H, W) float32, meta dict with ewres/nsres/lat0/lon0
    /nodata_value where present)."""
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    magic, ifd_off = struct.unpack_from(bo + "HI", data, 2)
    if magic != 42:
        raise NotImplementedError("BigTIFF not supported")
    tags: dict[int, object] = {}
    (n_entries,) = struct.unpack_from(bo + "H", data, ifd_off)
    for i in range(n_entries):
        tag, ftype, count = struct.unpack_from(
            bo + "HHI", data, ifd_off + 2 + 12 * i)
        payload = data[ifd_off + 2 + 12 * i + 8:ifd_off + 2 + 12 * i + 12]
        if ftype in _FIELD_FMT or ftype in (2, 5, 10):
            tags[tag] = _read_ifd_values(data, bo, ftype, count, payload)

    w = int(tags[_TAG_WIDTH][0])
    h = int(tags[_TAG_HEIGHT][0])
    spp = int(tags.get(_TAG_SAMPLES_PER_PIXEL, [1])[0])
    bits = int(tags.get(_TAG_BITS, [8])[0])
    comp = int(tags.get(_TAG_COMPRESSION, [1])[0])
    sfmt = int(tags.get(_TAG_SAMPLE_FORMAT, [1])[0])
    planar = int(tags.get(_TAG_PLANAR, [1])[0])
    if planar != 1:
        raise NotImplementedError("PlanarConfiguration=2 not supported")
    if comp not in (1, 8):
        raise NotImplementedError(f"TIFF compression {comp} not supported "
                                  "(none/Deflate only; use GDAL for LZW etc.)")
    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt)
    if kind is None:
        raise NotImplementedError(f"sample format {sfmt}")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")

    def _chunk(off: int, cnt: int) -> bytes:
        raw = data[off:off + cnt]
        return zlib.decompress(raw) if comp == 8 else raw

    out = np.empty((h, w * spp), dtype=dtype.newbyteorder("="))
    if _TAG_TILE_OFFSETS in tags:
        tw = int(tags[_TAG_TILE_WIDTH][0])
        th = int(tags[_TAG_TILE_HEIGHT][0])
        offs = tags[_TAG_TILE_OFFSETS]
        cnts = tags[_TAG_TILE_COUNTS]
        tiles_across = (w + tw - 1) // tw
        for ti, (off, cnt) in enumerate(zip(offs, cnts)):
            ty, tx = divmod(ti, tiles_across)
            arr = np.frombuffer(_chunk(int(off), int(cnt)), dtype=dtype)
            arr = arr.reshape(th, tw * spp)
            y0, x0 = ty * th, tx * tw * spp
            hh = min(th, h - y0)
            ww = min(tw * spp, w * spp - x0)
            out[y0:y0 + hh, x0:x0 + ww] = arr[:hh, :ww]
    else:
        rps = int(tags.get(_TAG_ROWS_PER_STRIP, [h])[0])
        offs = tags[_TAG_STRIP_OFFSETS]
        cnts = tags[_TAG_STRIP_COUNTS]
        y = 0
        for off, cnt in zip(offs, cnts):
            arr = np.frombuffer(_chunk(int(off), int(cnt)), dtype=dtype)
            rows = min(rps, h - y)
            out[y:y + rows] = arr.reshape(rows, w * spp)
            y += rows
    bands = np.ascontiguousarray(
        out.reshape(h, w, spp).transpose(2, 0, 1)).astype(np.float32)

    meta: dict = {"width": w, "height": h, "bands": spp,
                  "dtype": str(dtype), "compression": comp}
    if _TAG_PIXEL_SCALE in tags:
        sx, sy = tags[_TAG_PIXEL_SCALE][0], tags[_TAG_PIXEL_SCALE][1]
        meta["ewres"] = float(sx)
        meta["nsres"] = -float(sy)        # GDAL north-up convention
    if _TAG_TIEPOINT in tags and len(tags[_TAG_TIEPOINT]) >= 6:
        tp = tags[_TAG_TIEPOINT]
        meta["lon0"] = float(tp[3])
        meta["lat0"] = float(tp[4])
    if _TAG_GDAL_NODATA in tags:
        try:
            meta["nodata_value"] = float(str(tags[_TAG_GDAL_NODATA]).strip())
        except ValueError:
            pass
    return bands, meta


def write_geotiff(path: str, bands: np.ndarray,
                  pixel_scale: tuple[float, float] = (1.0, 1.0),
                  tiepoint: tuple[float, float] = (0.0, 0.0),
                  nodata: float | None = None,
                  compress: bool = True) -> str:
    """(S, H, W) or (H, W) float32 -> little-endian striped GeoTIFF."""
    if bands.ndim == 2:
        bands = bands[None]
    s, h, w = bands.shape
    pix = np.ascontiguousarray(
        bands.transpose(1, 2, 0)).astype("<f4").tobytes()
    payload = zlib.compress(pix, 6) if compress else pix

    entries: list[tuple[int, int, int, bytes | int]] = []
    extra: list[bytes] = []
    header_guess = 8

    def add(tag, ftype, values):
        if ftype == 2:
            raw = values.encode("ascii") + b"\x00"
            count = len(raw)
        elif ftype == 12:
            raw = b"".join(struct.pack("<d", v) for v in values)
            count = len(values)
        else:
            fmt = {3: "H", 4: "I"}[ftype]
            raw = b"".join(struct.pack("<" + fmt, int(v)) for v in values)
            count = len(values)
        entries.append((tag, ftype, count, raw))

    add(_TAG_WIDTH, 4, [w])
    add(_TAG_HEIGHT, 4, [h])
    add(_TAG_BITS, 3, [32] * s)
    add(_TAG_COMPRESSION, 3, [8 if compress else 1])
    add(262, 3, [1])                       # PhotometricInterpretation
    add(_TAG_STRIP_OFFSETS, 4, [0])        # patched below
    add(_TAG_SAMPLES_PER_PIXEL, 3, [s])
    add(_TAG_ROWS_PER_STRIP, 4, [h])
    add(_TAG_STRIP_COUNTS, 4, [len(payload)])
    add(_TAG_PLANAR, 3, [1])
    add(_TAG_SAMPLE_FORMAT, 3, [3] * s)
    add(_TAG_PIXEL_SCALE, 12, [pixel_scale[0], pixel_scale[1], 0.0])
    add(_TAG_TIEPOINT, 12, [0.0, 0.0, 0.0, tiepoint[0], tiepoint[1], 0.0])
    if nodata is not None:
        add(_TAG_GDAL_NODATA, 2, repr(float(nodata)))

    entries.sort(key=lambda e: e[0])
    ifd_off = 8
    n = len(entries)
    data_off = ifd_off + 2 + 12 * n + 4
    blobs = []
    fixed = []
    for tag, ftype, count, raw in entries:
        size = len(raw)
        if size <= 4:
            fixed.append((tag, ftype, count, raw.ljust(4, b"\x00")))
        else:
            fixed.append((tag, ftype, count,
                          struct.pack("<I", data_off)))
            blobs.append(raw)
            data_off += size
    strip_off = data_off
    out = bytearray()
    out += b"II*\x00" + struct.pack("<I", ifd_off)
    out += struct.pack("<H", n)
    for tag, ftype, count, payload4 in fixed:
        if tag == _TAG_STRIP_OFFSETS:
            payload4 = struct.pack("<I", strip_off)
        out += struct.pack("<HHI", tag, ftype, count) + payload4
    out += struct.pack("<I", 0)            # next IFD
    for bl in blobs:
        out += bl
    out += payload
    with open(path, "wb") as f:
        f.write(bytes(out))
    return path


def geotiff_to_tile_table(path: str, tile: int = 64,
                          raster_id: str | None = None):
    """GeoTIFF -> engine tile table (band 0 doubles as the DEM when the
    file is a single-band elevation raster)."""
    import os

    from .tiles import raster_to_tile_table

    bands, meta = read_geotiff(path)
    rid = raster_id or os.path.splitext(os.path.basename(path))[0]
    ndv = meta.get("nodata_value")
    nodata = (bands[0] == np.float32(ndv)) if ndv is not None else None
    table = raster_to_tile_table(bands, bands[0], raster_id=rid,
                                 tile=tile, nodata=nodata)
    return table, meta
