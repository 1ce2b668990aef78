"""Resampling kernels as NumPy batch ops (north_star: "bilinear/nearest
resampling kernels rewritten as NumPy batch ops").

Reference: the 14-kernel ``Resampling`` enum (gdal.py:179-204) applied
inside gdal.Warp (gdal.py:720).  Engine semantics:

* ``nearest``   — src index = floor((dst+0.5) * scale), clipped; exact
                  GDAL near behavior for both up- and down-sampling.
* ``bilinear``  — src coord = (dst+0.5) * scale - 0.5, 4-neighbour
                  weighted, edge-clamped.
* aggregates (``average sum min max median q1 q3 mode rms``) — defined
  for integer downscale factors (block reduce); the per-output-pixel
  aggregation over contributing input pixels.

All functions map a source buffer to a destination block in one
vectorized call; they are invoked per (output tile) group inside
applyInPandas.
"""

from __future__ import annotations

import numpy as np

AGG_KERNELS = ("average", "sum", "min", "max", "median", "q1", "q3", "mode", "rms")


def nearest(src: np.ndarray, sx0: float, sy0: float, scale_x: float, scale_y: float, oh: int, ow: int, ox0: int, oy0: int):
    """Gather src (local buffer with origin at global src pixel
    (sx0, sy0)) into an (oh, ow) dst block whose global dst origin is
    (ox0, oy0)."""
    js = np.arange(ox0, ox0 + ow, dtype=np.float64)
    is_ = np.arange(oy0, oy0 + oh, dtype=np.float64)
    cx = np.clip(np.floor((js + 0.5) * scale_x) - sx0, 0, src.shape[1] - 1).astype(np.int64)
    cy = np.clip(np.floor((is_ + 0.5) * scale_y) - sy0, 0, src.shape[0] - 1).astype(np.int64)
    return src[cy[:, None], cx[None, :]]


def bilinear(src: np.ndarray, sx0: float, sy0: float, scale_x: float, scale_y: float, oh: int, ow: int, ox0: int, oy0: int):
    js = np.arange(ox0, ox0 + ow, dtype=np.float64)
    is_ = np.arange(oy0, oy0 + oh, dtype=np.float64)
    fx = (js + 0.5) * scale_x - 0.5 - sx0
    fy = (is_ + 0.5) * scale_y - 0.5 - sy0
    x0 = np.clip(np.floor(fx), 0, src.shape[1] - 1).astype(np.int64)
    y0 = np.clip(np.floor(fy), 0, src.shape[0] - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, src.shape[1] - 1)
    y1 = np.clip(y0 + 1, 0, src.shape[0] - 1)
    wx = np.clip(fx - x0, 0.0, 1.0)
    wy = np.clip(fy - y0, 0.0, 1.0)
    s = src.astype(np.float64)
    top = s[y0[:, None], x0[None, :]] * (1 - wx)[None, :] + s[y0[:, None], x1[None, :]] * wx[None, :]
    bot = s[y1[:, None], x0[None, :]] * (1 - wx)[None, :] + s[y1[:, None], x1[None, :]] * wx[None, :]
    out = top * (1 - wy)[:, None] + bot * wy[:, None]
    if np.issubdtype(src.dtype, np.integer):
        return np.round(out).astype(src.dtype)
    return out.astype(src.dtype)


def block_agg(src: np.ndarray, kx: int, ky: int, kernel: str):
    """Integer-factor block reduction: src (h*ky, w*kx) -> (h, w)."""
    h, w = src.shape[0] // ky, src.shape[1] // kx
    b = src[: h * ky, : w * kx].reshape(h, ky, w, kx).astype(np.float64)
    if kernel == "average":
        out = b.mean(axis=(1, 3))
    elif kernel == "sum":
        out = b.sum(axis=(1, 3))
    elif kernel == "min":
        out = b.min(axis=(1, 3))
    elif kernel == "max":
        out = b.max(axis=(1, 3))
    elif kernel == "median":
        out = np.median(b, axis=(1, 3))
    elif kernel == "q1":
        out = np.quantile(b, 0.25, axis=(1, 3))
    elif kernel == "q3":
        out = np.quantile(b, 0.75, axis=(1, 3))
    elif kernel == "rms":
        out = np.sqrt((b**2).mean(axis=(1, 3)))
    elif kernel == "mode":
        flat = b.transpose(0, 2, 1, 3).reshape(h, w, ky * kx)
        sv = np.sort(flat, axis=2)
        # most frequent value per block (ties -> smallest, deterministic)
        best = sv[:, :, 0].copy()
        best_n = np.ones((h, w), dtype=np.int64)
        run_v = sv[:, :, 0].copy()
        run_n = np.ones((h, w), dtype=np.int64)
        for k in range(1, ky * kx):
            same = sv[:, :, k] == run_v
            run_n = np.where(same, run_n + 1, 1)
            run_v = sv[:, :, k]
            upd = run_n > best_n
            best = np.where(upd, run_v, best)
            best_n = np.where(upd, run_n, best_n)
        out = best
    else:
        raise ValueError(f"unknown kernel {kernel}")
    if np.issubdtype(src.dtype, np.integer) and kernel in ("min", "max", "mode"):
        return out.astype(src.dtype)
    return out


def gather_nearest(buf: np.ndarray, px: np.ndarray, py: np.ndarray, fill):
    """Non-separable gather: px/py are continuous buffer-local pixel
    coords (same shape as the output); out-of-buffer -> fill.  Used by
    reprojection, where the dst->src mapping is per-pixel."""
    cx = np.floor(px).astype(np.int64)
    cy = np.floor(py).astype(np.int64)
    ok = (cx >= 0) & (cx < buf.shape[1]) & (cy >= 0) & (cy < buf.shape[0])
    out = np.full(px.shape, fill, dtype=buf.dtype)
    out[ok] = buf[cy[ok], cx[ok]]
    return out


def gather_bilinear(buf: np.ndarray, px: np.ndarray, py: np.ndarray, fill):
    fx, fy = px - 0.5, py - 0.5
    x0 = np.floor(fx).astype(np.int64)
    y0 = np.floor(fy).astype(np.int64)
    wx = fx - x0
    wy = fy - y0
    ok = (x0 >= 0) & (x0 + 1 < buf.shape[1]) & (y0 >= 0) & (y0 + 1 < buf.shape[0])
    x0c = np.clip(x0, 0, buf.shape[1] - 2)
    y0c = np.clip(y0, 0, buf.shape[0] - 2)
    s = buf.astype(np.float64)
    top = s[y0c, x0c] * (1 - wx) + s[y0c, x0c + 1] * wx
    bot = s[y0c + 1, x0c] * (1 - wx) + s[y0c + 1, x0c + 1] * wx
    val = top * (1 - wy) + bot * wy
    out = np.full(px.shape, np.float64(0) + (0 if fill is None else fill), dtype=np.float64)
    out[ok] = val[ok]
    if np.issubdtype(buf.dtype, np.integer):
        return np.round(out).astype(buf.dtype)
    return out.astype(buf.dtype)
