"""Ellipsoidal geodesics: vectorized Vincenty direct + inverse.

The reference accepts any proj4 CRS by delegating to osr/PROJ
(reference gdal.py:124), which solves ellipsoidal azimuthal-equidistant
and geodesic distances via Karney's GeographicLib.  This module is the
engine's from-scratch equivalent: Vincenty's 1975 nested-iteration
formulation (T. Vincenty, "Direct and Inverse Solutions of Geodesics on
the Ellipsoid with Application of Nested Equations", Survey Review
XXIII/176), vectorized over numpy arrays so the per-partition cost is
a handful of array passes, never a Python loop per row.

Accuracy: ~0.5 mm over the convergent domain (Vincenty's published
figure).  Domain guard: the inverse iteration famously fails to
converge for NEARLY ANTIPODAL pairs (within ~0.5 deg of the antipode);
those rows come back NaN rather than silently wrong — the same honesty
contract as the azimuthal projections' antipodal-disk NaN guards
(crs.py `_make_aeqd`).  Karney's MGeodesic handles that band too, but
it needs Newton iteration on a transcendental system; the band is
already NaN-guarded engine-wide, so Vincenty + guard keeps behavior
consistent without a silently-degraded series.

Published worked-example anchor (tests/test_geom_core.py): the GDA
Technical Manual's Flinders Peak -> Buninyong line on GRS80
(s = 54 972.271 m, fwd az 306 deg 52' 05.37", rev az 127 deg 10'
25.07"), plus EPSG Guidance Note 7-2's Modified Azimuthal Equidistant
example (Yap Islands, Clarke 1866) for the aeqd wiring.
"""
from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def inverse(lat1, lon1, lat2, lon2, a: float = WGS84_A, f: float = WGS84_F):
    """Inverse geodesic problem, vectorized (degrees in, meters out).

    Returns ``(s12, azi1, azi2)``: geodesic distance and the forward
    azimuth (direction of travel, degrees clockwise from north) at each
    endpoint.  Coincident points give (0, 0, 0).  Nearly antipodal
    pairs where the lambda iteration does not converge give NaN (see
    module docstring).
    """
    lat1 = np.asarray(lat1, np.float64)
    lon1 = np.asarray(lon1, np.float64)
    lat2 = np.asarray(lat2, np.float64)
    lon2 = np.asarray(lon2, np.float64)
    b = a * (1.0 - f)

    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    U2 = np.arctan((1.0 - f) * np.tan(np.radians(lat2)))
    L = np.radians(lon2 - lon1)
    L = np.mod(L + np.pi, 2.0 * np.pi) - np.pi
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    # track convergence per element; the classic scalar loop exits per
    # pair — vectorized we iterate to a fixed cap and keep a mask
    converged = np.zeros(lam.shape, dtype=bool)
    sin_sigma = np.zeros_like(lam)
    cos_sigma = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    sin_alpha = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sm = np.ones_like(lam)
    with np.errstate(invalid="ignore", divide="ignore"):
        for _ in range(60):
            sin_lam, cos_lam = np.sin(lam), np.cos(lam)
            t1 = cosU2 * sin_lam
            t2 = cosU1 * sinU2 - sinU1 * cosU2 * cos_lam
            sin_sigma = np.hypot(t1, t2)
            cos_sigma = sinU1 * sinU2 + cosU1 * cosU2 * cos_lam
            sigma = np.arctan2(sin_sigma, cos_sigma)
            coincident = sin_sigma == 0.0
            sin_alpha = np.where(
                coincident, 0.0, cosU1 * cosU2 * sin_lam / np.where(coincident, 1.0, sin_sigma)
            )
            cos2_alpha = 1.0 - sin_alpha * sin_alpha
            equatorial = cos2_alpha == 0.0  # both points on the equator
            cos_2sm = np.where(
                equatorial,
                0.0,
                cos_sigma - 2.0 * sinU1 * sinU2 / np.where(equatorial, 1.0, cos2_alpha),
            )
            C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
            lam_new = L + (1.0 - C) * f * sin_alpha * (
                sigma
                + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
            )
            converged |= np.abs(lam_new - lam) < 1e-13
            lam = lam_new
            if bool(np.all(converged)):
                break

    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    d_sigma = B * sin_sigma * (
        cos_2sm
        + B
        / 4.0
        * (
            cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
            - B
            / 6.0
            * cos_2sm
            * (-3.0 + 4.0 * sin_sigma * sin_sigma)
            * (-3.0 + 4.0 * cos_2sm * cos_2sm)
        )
    )
    s12 = b * A * (sigma - d_sigma)
    sin_lam, cos_lam = np.sin(lam), np.cos(lam)
    azi1 = np.degrees(np.arctan2(cosU2 * sin_lam, cosU1 * sinU2 - sinU1 * cosU2 * cos_lam))
    azi2 = np.degrees(np.arctan2(cosU1 * sin_lam, -sinU1 * cosU2 + cosU1 * sinU2 * cos_lam))

    coincident = (lat1 == lat2) & (np.mod(lon1 - lon2, 360.0) == 0.0)
    nan = ~converged & ~coincident
    s12 = np.where(coincident, 0.0, np.where(nan, np.nan, s12))
    azi1 = np.where(coincident, 0.0, np.where(nan, np.nan, azi1))
    azi2 = np.where(coincident, 0.0, np.where(nan, np.nan, azi2))
    return s12, azi1, azi2


def direct(lat1, lon1, azi1, s12, a: float = WGS84_A, f: float = WGS84_F):
    """Direct geodesic problem, vectorized (degrees/meters in,
    degrees out).

    From ``(lat1, lon1)`` travel ``s12`` meters along the geodesic with
    initial azimuth ``azi1``; returns ``(lat2, lon2, azi2)`` where
    ``azi2`` is the direction of travel at the destination.  The sigma
    fixed-point iteration converges unconditionally (no domain guard
    needed); distances past the antipode simply continue along the
    geodesic, as in GeographicLib.
    """
    lat1 = np.asarray(lat1, np.float64)
    lon1 = np.asarray(lon1, np.float64)
    alpha1 = np.radians(np.asarray(azi1, np.float64))
    s = np.asarray(s12, np.float64)
    b = a * (1.0 - f)

    U1 = np.arctan((1.0 - f) * np.tan(np.radians(lat1)))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    cos_a1, sin_a1 = np.cos(alpha1), np.sin(alpha1)
    sigma1 = np.arctan2(np.tan(U1), cos_a1)
    sin_alpha = cosU1 * sin_a1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma = s / (b * A)
    sigma0 = sigma.copy()
    cos_2sm = np.cos(2.0 * sigma1 + sigma)
    for _ in range(60):
        cos_2sm = np.cos(2.0 * sigma1 + sigma)
        sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)
        d_sigma = B * sin_sigma * (
            cos_2sm
            + B
            / 4.0
            * (
                cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm)
                - B
                / 6.0
                * cos_2sm
                * (-3.0 + 4.0 * sin_sigma * sin_sigma)
                * (-3.0 + 4.0 * cos_2sm * cos_2sm)
            )
        )
        sigma_new = sigma0 + d_sigma
        if bool(np.all(np.abs(sigma_new - sigma) < 1e-13)):
            sigma = sigma_new
            break
        sigma = sigma_new
    cos_2sm = np.cos(2.0 * sigma1 + sigma)
    sin_sigma, cos_sigma = np.sin(sigma), np.cos(sigma)

    t = sinU1 * sin_sigma - cosU1 * cos_sigma * cos_a1
    lat2 = np.degrees(
        np.arctan2(
            sinU1 * cos_sigma + cosU1 * sin_sigma * cos_a1,
            (1.0 - f) * np.hypot(sin_alpha, t),
        )
    )
    lam = np.arctan2(sin_sigma * sin_a1, cosU1 * cos_sigma - sinU1 * sin_sigma * cos_a1)
    C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - C) * f * sin_alpha * (
        sigma + C * sin_sigma * (cos_2sm + C * cos_sigma * (-1.0 + 2.0 * cos_2sm * cos_2sm))
    )
    lon2 = np.degrees(np.radians(lon1) + L)
    lon2 = -(((-lon2) + 180.0) % 360.0 - 180.0)
    azi2 = np.degrees(np.arctan2(sin_alpha, -t))
    return lat2, lon2, azi2
