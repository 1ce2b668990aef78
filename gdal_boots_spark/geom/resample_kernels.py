"""Resampling kernels as NumPy batch ops (north_star: "bilinear/nearest
resampling kernels rewritten as NumPy batch ops").

Reference: the 14-kernel ``Resampling`` enum (gdal.py:179-204) applied
inside gdal.Warp (gdal.py:720).  Engine semantics:

* ``nearest``   — src index = floor((dst+0.5) * scale), clipped; exact
                  GDAL near behavior for both up- and down-sampling.
* ``bilinear``  — src coord = (dst+0.5) * scale - 0.5, 4-neighbour
                  weighted, edge-clamped.
* convolution (``cubic cubicspline lanczos``) — separable windowed
  convolution at any scale: cubic = Keys a=-0.5 (4 taps),
  cubicspline = cubic B-spline (4 taps, approximating/smoothing),
  lanczos = 3-lobe windowed sinc (6 taps).  Tap weights are computed
  from unclamped distances then normalized to sum 1; tap INDICES are
  edge-clamped (no weight renormalization after clamping — the oracle
  SQL reproduces exactly this rule).
* aggregates (``average sum min max median q1 q3 mode rms``) — the
  per-output-pixel aggregation over the source pixels whose CENTERS
  fall in the output pixel's source-space footprint
  [j*scale, (j+1)*scale).  For integer factors this is exactly the
  block reduce (fast path ``block_agg``); any downscale factor >= 1
  goes through ``window_agg``.

All functions map a source buffer to a destination block in one
vectorized call; they are invoked per (output tile) group inside
applyInPandas.
"""

from __future__ import annotations

import numpy as np

AGG_KERNELS = ("average", "sum", "min", "max", "median", "q1", "q3", "mode", "rms")

# kernel -> support radius (taps = 2*support per axis)
CONV_KERNELS = {"cubic": 2, "cubicspline": 2, "lanczos": 3}


def nearest(src: np.ndarray, sx0: float, sy0: float, scale_x: float, scale_y: float, oh: int, ow: int, ox0: int, oy0: int):
    """Gather src (local buffer with origin at global src pixel
    (sx0, sy0)) into an (oh, ow) dst block whose global dst origin is
    (ox0, oy0).  Accepts leading batch dims: (..., h, w) -> (..., oh, ow)
    (media stacks resample a whole same-shape group in one call)."""
    js = np.arange(ox0, ox0 + ow, dtype=np.float64)
    is_ = np.arange(oy0, oy0 + oh, dtype=np.float64)
    cx = np.clip(np.floor((js + 0.5) * scale_x) - sx0, 0, src.shape[-1] - 1).astype(np.int64)
    cy = np.clip(np.floor((is_ + 0.5) * scale_y) - sy0, 0, src.shape[-2] - 1).astype(np.int64)
    return src[..., cy[:, None], cx[None, :]]


def bilinear(src: np.ndarray, sx0: float, sy0: float, scale_x: float, scale_y: float, oh: int, ow: int, ox0: int, oy0: int):
    """4-neighbour weighted, edge-clamped; accepts leading batch dims
    like ``nearest``."""
    js = np.arange(ox0, ox0 + ow, dtype=np.float64)
    is_ = np.arange(oy0, oy0 + oh, dtype=np.float64)
    fx = (js + 0.5) * scale_x - 0.5 - sx0
    fy = (is_ + 0.5) * scale_y - 0.5 - sy0
    x0 = np.clip(np.floor(fx), 0, src.shape[-1] - 1).astype(np.int64)
    y0 = np.clip(np.floor(fy), 0, src.shape[-2] - 1).astype(np.int64)
    x1 = np.clip(x0 + 1, 0, src.shape[-1] - 1)
    y1 = np.clip(y0 + 1, 0, src.shape[-2] - 1)
    wx = np.clip(fx - x0, 0.0, 1.0)
    wy = np.clip(fy - y0, 0.0, 1.0)
    s = src.astype(np.float64)
    top = s[..., y0[:, None], x0[None, :]] * (1 - wx)[None, :] + s[..., y0[:, None], x1[None, :]] * wx[None, :]
    bot = s[..., y1[:, None], x0[None, :]] * (1 - wx)[None, :] + s[..., y1[:, None], x1[None, :]] * wx[None, :]
    out = top * (1 - wy)[:, None] + bot * wy[:, None]
    if np.issubdtype(src.dtype, np.integer):
        # conv kernels overshoot (negative lobes): clamp to the dtype
        # range like GDAL instead of wrapping modulo 2^n (no-op for
        # convex kernels such as bilinear)
        info = np.iinfo(src.dtype)
        return np.clip(np.round(out), info.min, info.max).astype(src.dtype)
    return out.astype(src.dtype)


def _w_cubic(t: np.ndarray) -> np.ndarray:
    """Keys cubic convolution, a = -0.5 (the GDAL cubic kernel).
    Exactly reproduces polynomials up to degree 2; all weights at
    dyadic fractional offsets are exact binary fractions (the
    resample_cubic oracle relies on this)."""
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        1.5 * at**3 - 2.5 * at**2 + 1.0,
        np.where(at < 2.0, -0.5 * at**3 + 2.5 * at**2 - 4.0 * at + 2.0, 0.0),
    )


def _w_bspline(t: np.ndarray) -> np.ndarray:
    """Cubic B-spline (GDAL cubicspline): smoothing/approximating —
    does NOT interpolate samples but reproduces linears exactly."""
    at = np.abs(t)
    return np.where(
        at <= 1.0,
        (4.0 - 6.0 * at**2 + 3.0 * at**3) / 6.0,
        np.where(at < 2.0, (2.0 - at) ** 3 / 6.0, 0.0),
    )


def _w_lanczos(t: np.ndarray) -> np.ndarray:
    """3-lobe Lanczos windowed sinc (GDAL lanczos)."""
    at = np.abs(t)
    out = np.sinc(t) * np.sinc(t / 3.0)
    return np.where(at < 3.0, out, 0.0)


_CONV_W = {"cubic": _w_cubic, "cubicspline": _w_bspline, "lanczos": _w_lanczos}


def _axis_taps(lo_global: int, n_out: int, scale: float, off0: float, src_len: int, kernel: str):
    """Per-output-index tap indices (clamped, buffer-local) + normalized
    weights for one axis.  Returns (I (T, n_out) int, W (T, n_out) f8)."""
    support = CONV_KERNELS[kernel]
    wfn = _CONV_W[kernel]
    js = np.arange(lo_global, lo_global + n_out, dtype=np.float64)
    fx = (js + 0.5) * scale - 0.5 - off0  # continuous buffer-local coord
    base = np.floor(fx).astype(np.int64) - (support - 1)
    taps = 2 * support
    I = np.clip(base[None, :] + np.arange(taps)[:, None], 0, src_len - 1)
    W = wfn(fx[None, :] - (base[None, :] + np.arange(taps)[:, None]))
    W = W / W.sum(axis=0, keepdims=True)
    return I, W


def separable_conv(
    src: np.ndarray, sx0: float, sy0: float, scale_x: float, scale_y: float,
    oh: int, ow: int, ox0: int, oy0: int, kernel: str,
):
    """Windowed separable convolution (cubic/cubicspline/lanczos) at any
    scale: columns first (one gather+weighted-sum per tap), then rows.
    Accepts leading batch dims: (..., h, w) -> (..., oh, ow)."""
    Ix, Wx = _axis_taps(ox0, ow, scale_x, sx0, src.shape[-1], kernel)
    Iy, Wy = _axis_taps(oy0, oh, scale_y, sy0, src.shape[-2], kernel)
    s = src.astype(np.float64)
    # tmp[..., y, j] = sum_t Wx[t, j] * src[..., y, Ix[t, j]]
    tmp = np.zeros(src.shape[:-1] + (ow,), dtype=np.float64)
    for t in range(Ix.shape[0]):
        tmp += s[..., Ix[t]] * Wx[t][None, :]
    out = np.zeros(src.shape[:-2] + (oh, ow), dtype=np.float64)
    for t in range(Iy.shape[0]):
        out += tmp[..., Iy[t], :] * Wy[t][:, None]
    if np.issubdtype(src.dtype, np.integer):
        # conv kernels overshoot (negative lobes): clamp to the dtype
        # range like GDAL instead of wrapping modulo 2^n (no-op for
        # convex kernels such as bilinear)
        info = np.iinfo(src.dtype)
        return np.clip(np.round(out), info.min, info.max).astype(src.dtype)
    return out.astype(src.dtype)


def _window_bounds(lo_global: int, n_out: int, scale: float, off0: int, src_len: int):
    """Footprint windows: output index j covers source centers in
    [j*scale, (j+1)*scale) -> source index range [ceil(j*scale - 0.5),
    ceil((j+1)*scale - 0.5)).  Contiguous partition (hi_j == lo_{j+1})."""
    js = np.arange(lo_global, lo_global + n_out + 1, dtype=np.float64)
    b = np.ceil(js * scale - 0.5).astype(np.int64) - off0
    return np.clip(b, 0, src_len)


def window_agg(
    src: np.ndarray, sx0: int, sy0: int, scale_x: float, scale_y: float,
    oh: int, ow: int, ox0: int, oy0: int, kernel: str,
):
    """Aggregate resampling at ANY downscale factor >= 1 (the
    integer-factor fast path is block_agg; this generalizes it —
    identical results when the factors are integers, tested)."""
    if scale_x < 1.0 or scale_y < 1.0:
        raise ValueError("aggregate kernels are downsampling kernels (scale >= 1)")
    bx = _window_bounds(ox0, ow, scale_x, sx0, src.shape[1])
    by = _window_bounds(oy0, oh, scale_y, sy0, src.shape[0])
    b = src.astype(np.float64)
    cnt = np.maximum(by[1:] - by[:-1], 1)[:, None] * np.maximum(bx[1:] - bx[:-1], 1)[None, :]
    # ufunc.reduceat returns arr[lo] (not the identity) for zero-width
    # windows, and errors on an index == len: clip indices and mask the
    # affected outputs to 0 afterwards.  Unreachable from resample()
    # (buffers cover the footprint) but window_agg is a public kernel.
    empty = ((by[1:] - by[:-1]) == 0)[:, None] | ((bx[1:] - bx[:-1]) == 0)[None, :]

    def reduce2(ufunc, arr):
        # Trailing zero-width windows have start index == len(sub);
        # clipping that to len-1 would steal the last source row/col
        # from the preceding window's reduceat range.  Run reduceat on
        # the UNclipped valid indices (upper bounds stay intact; the
        # last valid window correctly runs to the end of sub) and
        # scatter, leaving invalid windows 0 (they are zero-width, so
        # the `empty` mask zeroes them anyway).
        sub = arr[by[0] : by[-1]]
        if sub.shape[0] == 0:
            return np.zeros((oh, ow), dtype=np.float64)
        iy = by[:-1] - by[0]
        vy = iy < sub.shape[0]
        rows = np.zeros((oh,) + sub.shape[1:], dtype=np.float64)
        rows[vy] = ufunc.reduceat(sub, iy[vy], axis=0)
        subc = rows[:, bx[0] : bx[-1]]
        if subc.shape[1] == 0:
            return np.zeros((oh, ow), dtype=np.float64)
        ix = bx[:-1] - bx[0]
        vx = ix < subc.shape[1]
        out = np.zeros((oh, ow), dtype=np.float64)
        out[:, vx] = ufunc.reduceat(subc, ix[vx], axis=1)
        return out

    def masked(o):
        if empty.any():
            o = o.copy()
            o[empty] = 0.0
        return o

    if kernel == "sum":
        return masked(reduce2(np.add, b))
    if kernel == "average":
        return masked(reduce2(np.add, b) / cnt)
    if kernel == "rms":
        return masked(np.sqrt(reduce2(np.add, b**2) / cnt))
    if kernel == "min":
        out = masked(reduce2(np.minimum, b))
    elif kernel == "max":
        out = masked(reduce2(np.maximum, b))
    elif kernel in ("median", "q1", "q3", "mode"):
        out = np.empty((oh, ow), dtype=np.float64)
        for i in range(oh):
            for j in range(ow):
                blk = b[by[i] : by[i + 1], bx[j] : bx[j + 1]].ravel()
                if blk.size == 0:
                    out[i, j] = 0.0
                elif kernel == "median":
                    out[i, j] = np.median(blk)
                elif kernel == "q1":
                    out[i, j] = np.quantile(blk, 0.25)
                elif kernel == "q3":
                    out[i, j] = np.quantile(blk, 0.75)
                else:  # mode: most frequent, ties -> smallest (block_agg rule)
                    vals, cnts = np.unique(blk, return_counts=True)
                    out[i, j] = vals[np.argmax(cnts)]
    else:
        raise ValueError(f"unknown kernel {kernel}")
    if np.issubdtype(src.dtype, np.integer) and kernel in ("min", "max", "mode"):
        return out.astype(src.dtype)
    return out


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
