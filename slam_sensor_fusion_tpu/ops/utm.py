"""WGS-84 latitude/longitude -> UTM easting/northing.

Fresh implementation of the standard Snyder/USGS transverse-Mercator series
(the same textbook expansion the reference's geo_lib.hpp:38-83 encodes),
with the reference's two behavioural quirks preserved for parity:

* zone forced to 32 for the Norway exception band (lat in [56, 64),
  lon in [3, 12)) — geo_lib.hpp:52-55;
* the 10,000,000 m southern-hemisphere false northing is applied
  UNCONDITIONALLY, i.e. also in the northern hemisphere — geo_lib.hpp:82.
  ``south_offset_always=False`` gives the conventional behaviour.

UTM magnitudes (1e5–1e7 m) destroy float32, so this runs on the host in
numpy float64, vectorized over whole sequences. The device pipeline only
ever sees map-frame coordinates rebased by map_T_global (small, f32-safe),
mirroring how the reference centres everything through map_T_global
(global_map_frames_manager.cpp:224-246).
"""

from __future__ import annotations

import numpy as np

# WGS-84 ellipsoid
_A = 6378137.0
_E2 = 0.0818191908 ** 2  # first eccentricity squared (matches geo_lib.hpp)
_K0 = 0.9996
_FALSE_EASTING = 500000.0
_SOUTH_FALSE_NORTHING = 10000000.0


def ll_to_utm(
    lat_deg,
    lon_deg,
    south_offset_always: bool = True,
):
    """Convert latitude/longitude (degrees) to (easting, northing) metres.

    Vectorized float64. ``south_offset_always=True`` reproduces
    geo_lib.hpp:82 exactly (false northing added in both hemispheres).
    Returns (easting, northing) as float64 arrays (or scalars).
    """
    lat = np.asarray(lat_deg, dtype=np.float64)
    lon = np.asarray(lon_deg, dtype=np.float64)

    # normalize longitude to [-180, 180)
    lon_t = (lon + 180.0) - np.trunc((lon + 180.0) / 360.0) * 360.0 - 180.0

    lat_rad = np.deg2rad(lat)
    lon_rad = np.deg2rad(lon_t)
    zone = (np.trunc((lon_t + 180.0) / 6.0)).astype(np.int64) + 1
    norway = (lat >= 56.0) & (lat < 64.0) & (lon_t >= 3.0) & (lon_t < 12.0)
    zone = np.where(norway, 32, zone)

    lon_origin_rad = np.deg2rad((zone.astype(np.float64) - 1.0) * 6.0 - 180.0 + 3.0)

    e2 = _E2
    ep2 = e2 / (1.0 - e2)
    sin_lat = np.sin(lat_rad)
    cos_lat = np.cos(lat_rad)
    tan_lat = np.tan(lat_rad)

    N = _A / np.sqrt(1.0 - e2 * sin_lat * sin_lat)
    T = tan_lat * tan_lat
    C = ep2 * cos_lat * cos_lat
    A = cos_lat * (lon_rad - lon_origin_rad)

    # meridional arc length
    M = _A * (
        (1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256) * lat_rad
        - (3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024) * np.sin(2 * lat_rad)
        + (15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024) * np.sin(4 * lat_rad)
        - (35 * e2 ** 3 / 3072) * np.sin(6 * lat_rad)
    )

    easting = (
        _K0
        * N
        * (
            A
            + (1 - T + C) * A ** 3 / 6.0
            + (5 - 18 * T + T * T + 72 * C - 58 * ep2) * A ** 5 / 120.0
        )
        + _FALSE_EASTING
    )
    northing = _K0 * (
        M
        + N
        * tan_lat
        * (
            A ** 2 / 2.0
            + (5 - T + 9 * C + 4 * C * C) * A ** 4 / 24.0
            + (61 - 58 * T + T * T + 600 * C - 330 * ep2) * A ** 6 / 720.0
        )
    )
    if south_offset_always:
        northing = northing + _SOUTH_FALSE_NORTHING
    else:
        northing = northing + np.where(lat < 0.0, _SOUTH_FALSE_NORTHING, 0.0)
    return easting, northing
