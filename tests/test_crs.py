"""CRS transforms: independent oracles without pyproj.

- f=0 degeneration: the Krüger series must equal the closed-form
  spherical transverse Mercator exactly (all series coefficients vanish).
- Meridian arc: northing on the central meridian == k0 x numerically
  integrated meridian arc length (independent check of A + alpha series).
- Round trips: forward∘inverse sub-micrometer over the zone.
- LCC: scale factor exactly 1 on both standard parallels; round trip.
"""

import numpy as np

from lib_gdal_spark.functions import crs as CRS


def test_tm_sphere_matches_closed_form():
    tm = CRS.TransverseMercator(lon0=9.0, k0=1.0, false_e=0.0, f=0.0)
    lon = np.array([6.0, 9.0, 12.5, 3.1])
    lat = np.array([45.0, -20.0, 60.0, 0.5])
    E, N = tm.forward(lon, lat)
    lam = np.radians(lon - 9.0)
    phi = np.radians(lat)
    a = CRS.WGS84_A
    Es = a * np.arctanh(np.cos(phi) * np.sin(lam))
    Ns = a * np.arctan2(np.tan(phi), np.cos(lam))
    assert np.allclose(E, Es, atol=1e-6)
    assert np.allclose(N, Ns, atol=1e-6)


def test_tm_meridian_arc():
    tm = CRS.utm_zone(31)
    for lat in (10.0, 45.0, 75.0):
        _, N = tm.forward(np.array([3.0]), np.array([lat]))  # central meridian
        arc = CRS.meridian_arc_numeric(lat)
        assert abs(N[0] - 0.9996 * arc) < 2e-3  # mm-level vs numeric integral


def test_utm_round_trip():
    tm = CRS.utm_zone(31)
    rng = np.random.default_rng(3)
    lon = rng.uniform(0.0, 6.0, 500)
    lat = rng.uniform(-80.0, 84.0, 500)
    E, N = tm.forward(lon, lat)
    lon2, lat2 = tm.inverse(E, N)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    # UTM zone 31 sanity: central meridian maps to false easting
    E0, _ = tm.forward(np.array([3.0]), np.array([40.0]))
    assert abs(E0[0] - 500_000.0) < 1e-6


def test_utm_known_scale():
    # scale on the central meridian is k0; at the secant lines (~±180km)
    # scale returns to 1. Derive scale numerically from the forward map.
    tm = CRS.utm_zone(31)
    lat = 45.0
    d = 1e-6
    for lon, expect, tol in ((3.0, 0.9996, 1e-9),):
        E1, N1 = tm.forward(np.array([lon]), np.array([lat - d]))
        E2, N2 = tm.forward(np.array([lon]), np.array([lat + d]))
        ds = np.hypot(E2 - E1, N2 - N1)[0]
        arc = CRS.meridian_arc_numeric(lat + d) - CRS.meridian_arc_numeric(lat - d)
        assert abs(ds / arc - expect) < 1e-5


def test_lcc_scale_and_round_trip():
    lcc = CRS.LambertConformalConic(
        lat1=33.0, lat2=45.0, lat0=39.0, lon0=-96.0,
    )
    assert abs(lcc.scale_at(33.0) - 1.0) < 1e-12
    assert abs(lcc.scale_at(45.0) - 1.0) < 1e-12
    assert lcc.scale_at(39.0) < 1.0  # between the parallels the cone dips
    rng = np.random.default_rng(4)
    lon = rng.uniform(-120.0, -70.0, 300)
    lat = rng.uniform(20.0, 60.0, 300)
    E, N = lcc.forward(lon, lat)
    lon2, lat2 = lcc.inverse(E, N)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_albers_equal_area_property():
    aea = CRS.AlbersEqualArea(lat1=29.5, lat2=45.5, lat0=37.5, lon0=-96.0)
    # area element: |Jacobian| must equal the ellipsoid's area element
    # a^2 cos(phi) (1 - e2) / (1 - e2 sin^2 phi)^2 per radian^2
    e2 = CRS.WGS84_F * (2 - CRS.WGS84_F)
    rng = np.random.default_rng(6)
    lon = rng.uniform(-120, -70, 50)
    lat = rng.uniform(25, 50, 50)
    d = 1e-6
    Ex1, Nx1 = aea.forward(lon - d, lat)
    Ex2, Nx2 = aea.forward(lon + d, lat)
    Ey1, Ny1 = aea.forward(lon, lat - d)
    Ey2, Ny2 = aea.forward(lon, lat + d)
    dEx = (Ex2 - Ex1) / (2 * d)
    dNx = (Nx2 - Nx1) / (2 * d)
    dEy = (Ey2 - Ey1) / (2 * d)
    dNy = (Ny2 - Ny1) / (2 * d)
    jac = np.abs(dEx * dNy - dEy * dNx) * (180 / np.pi) ** 2
    phi = np.radians(lat)
    want = (CRS.WGS84_A ** 2 * np.cos(phi) * (1 - e2)
            / (1 - e2 * np.sin(phi) ** 2) ** 2)
    assert np.allclose(jac, want, rtol=1e-5)
    # round trip
    E, N = aea.forward(lon, lat)
    lon2, lat2 = aea.inverse(E, N)
    assert np.max(np.abs(lon2 - lon)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9


def test_polar_stereographic():
    ps = CRS.PolarStereographic(lat_ts=71.0, lon0=-45.0)  # EPSG:3413-style
    rng = np.random.default_rng(8)
    lon = rng.uniform(-180, 180, 200)
    lat = rng.uniform(60, 89.5, 200)
    E, N = ps.forward(lon, lat)
    lon2, lat2 = ps.inverse(E, N)
    dl = (lon2 - lon + 180) % 360 - 180  # wrap-safe
    assert np.max(np.abs(dl)) < 1e-9
    assert np.max(np.abs(lat2 - lat)) < 1e-9
    # conformality: local Jacobian is a scaled rotation (equal row norms,
    # orthogonal rows)
    d = 1e-6
    lo, la = np.array([-100.0]), np.array([75.0])
    E0, N0 = ps.forward(lo, la)
    dEx = (ps.forward(lo + d, la)[0] - E0) / d
    dNx = (ps.forward(lo + d, la)[1] - N0) / d
    dEy = (ps.forward(lo, la + d)[0] - E0) / d
    dNy = (ps.forward(lo, la + d)[1] - N0) / d
    # scale per radian: columns (dEx, dNx) and (dEy, dNy)
    phi = np.radians(la)
    e2 = CRS.WGS84_F * (2 - CRS.WGS84_F)
    # normalize lon column by cos(phi)*nu, lat column by rho_m (meridional)
    nu = CRS.WGS84_A / np.sqrt(1 - e2 * np.sin(phi) ** 2)
    rho_m = CRS.WGS84_A * (1 - e2) / (1 - e2 * np.sin(phi) ** 2) ** 1.5
    kx = np.hypot(dEx, dNx) / (np.cos(phi) * nu) * (180 / np.pi)
    ky = np.hypot(dEy, dNy) / rho_m * (180 / np.pi)
    assert abs(kx[0] / ky[0] - 1.0) < 1e-6  # equal scales in all directions
    # scale == 1 at the latitude of true scale
    lo, la = np.array([0.0]), np.array([71.0])
    E0, N0 = ps.forward(lo, la)
    dEy = (ps.forward(lo, la + d)[0] - E0) / d
    dNy = (ps.forward(lo, la + d)[1] - N0) / d
    rho_m = CRS.WGS84_A * (1 - e2) / (1 - e2 * np.sin(np.radians(la)) ** 2) ** 1.5
    k_ts = np.hypot(dEy, dNy) / rho_m * (180 / np.pi)
    assert abs(k_ts[0] - 1.0) < 1e-6


def test_epsg_registry_dispatch():
    """get_crs_transform: code -> projector with the array contract."""
    # UTM ranges
    tm = CRS.get_crs_transform(32631)
    assert isinstance(tm, CRS.TransverseMercator) and tm.lon0 == 3.0
    tms = CRS.get_crs_transform(32733)
    assert tms.false_n == 10_000_000.0
    nad83 = CRS.get_crs_transform(26910)
    assert abs(nad83.f - CRS.GRS80_F) < 1e-15 and nad83.lon0 == -123.0
    # identity + mercator
    g = CRS.get_crs_transform(4326)
    lon, lat = g.inverse(np.array([12.5]), np.array([-33.0]))
    assert lon[0] == 12.5 and lat[0] == -33.0
    wm = CRS.get_crs_transform(3857)
    x, y = wm.forward(np.array([0.0]), np.array([0.0]))
    assert abs(x[0]) < 1e-9 and abs(y[0]) < 1e-9
    lon2, _ = wm.inverse(np.array([20037508.342789244]), np.array([0.0]))
    assert abs(lon2[0] - 180.0) < 1e-9
    # unknown code: loud failure, no silent fallback
    try:
        CRS.get_crs_transform(31370)  # Belgian Lambert 72: not registered
        raise AssertionError("expected KeyError")
    except KeyError:
        pass


def test_epsg_registry_anchor_points():
    """False origin anchors are exact by construction of each definition."""
    # EPSG:5070 CONUS Albers: (lon0, lat0) -> (0, 0)
    aea = CRS.get_crs_transform(5070)
    E, N = aea.forward(np.array([-96.0]), np.array([23.0]))
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
    # EPSG:3031: south pole -> (0, 0); lon 0 half-plane has E == 0
    ps = CRS.get_crs_transform(3031)
    E, N = ps.forward(np.array([0.0]), np.array([-90.0]))
    assert abs(E[0]) < 1e-6 and abs(N[0]) < 1e-6
    # EPSG GN7-2 south-pole case: N = FN + rho*cos(lam), so the 0E
    # meridian carries POSITIVE northing (McMurdo at 166.7E is +E, -N)
    E, N = ps.forward(np.array([0.0]), np.array([-71.0]))
    assert abs(E[0]) < 1e-6 and N[0] > 0
    E, N = ps.forward(np.array([166.67]), np.array([-77.85]))
    assert E[0] > 0 and N[0] < 0  # McMurdo quadrant, published 3031 signs
    # EPSG:2154 Lambert-93: (3E, 46.5N) -> (700000, 6600000)
    l93 = CRS.get_crs_transform(2154)
    E, N = l93.forward(np.array([3.0]), np.array([46.5]))
    assert abs(E[0] - 700_000.0) < 1e-6
    assert abs(N[0] - 6_600_000.0) < 1e-6
    # round trips through the registry objects
    rng = np.random.default_rng(9)
    for code, lons, lats in (
        (3031, rng.uniform(-179, 179, 50), rng.uniform(-89, -55, 50)),
        (3413, rng.uniform(-179, 179, 50), rng.uniform(55, 89, 50)),
        (5070, rng.uniform(-125, -66, 50), rng.uniform(24, 49, 50)),
        (3577, rng.uniform(112, 154, 50), rng.uniform(-44, -10, 50)),
    ):
        p = CRS.get_crs_transform(code)
        E, N = p.forward(lons, lats)
        lon2, lat2 = p.inverse(E, N)
        dlon = (lon2 - lons + 180.0) % 360.0 - 180.0  # inverse lon is
        assert np.max(np.abs(dlon)) < 1e-8, code       # (lon0-180, lon0+180]
        assert np.max(np.abs(lat2 - lats)) < 1e-8, code


def test_transform_wkb_all_types():
    """transform_wkb walks every geometry type, Z untouched."""
    from lib_gdal_spark.functions import crs as CRS
    from lib_gdal_spark.functions.wkt import wkb_to_wkt, wkt_to_wkb

    def double_xy(x, y):
        return np.asarray(x) * 2.0, np.asarray(y) * 3.0

    cases = {
        "POINT (1 2)": "POINT (2 6)",
        "POINT Z (1 2 9)": "POINT Z (2 6 9)",
        "MULTIPOINT ((1 1), (2 2))": "MULTIPOINT ((2 3), (4 6))",
        "LINESTRING (0 0, 1 1)": "LINESTRING (0 0, 2 3)",
        "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))":
            "POLYGON ((0 0, 2 0, 2 3, 0 3, 0 0))",
        "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 1 0))":
            "GEOMETRYCOLLECTION (POINT (2 3), LINESTRING (0 0, 2 0))",
        "CIRCULARSTRING (0 0, 1 1, 2 0)": "CIRCULARSTRING (0 0, 2 3, 4 0)",
    }
    for src, want in cases.items():
        got = wkb_to_wkt(CRS.transform_wkb(wkt_to_wkb(src), double_xy))
        assert got == want, (src, got)


def test_reproject_layer_roundtrip(spark):
    """4326 -> 3857 -> 4326 returns the original coordinates."""
    from lib_gdal_spark.functions import crs as CRS
    from lib_gdal_spark.functions import geometry as G

    rows = [(i, bytearray(G.wkb_point(float(i * 3 - 60), float(i * 2 - 40))))
            for i in range(40)]
    df = spark.createDataFrame(rows, "fid long, geom_wkb binary")
    merc = CRS.reproject_layer(df, 4326, 3857)
    back = CRS.reproject_layer(merc, 3857, 4326)
    for r in back.collect():
        base, (x, y) = G.parse_wkb(bytes(r["geom_wkb"]))
        i = r["fid"]
        assert abs(x - (i * 3 - 60)) < 1e-9
        assert abs(y - (i * 2 - 40)) < 1e-9


def test_national_grids_and_world_projections():
    """Round-4 registry breadth: OSGB 27700 (Airy TM, 49N natural origin),
    NZTM2000 2193, ESRI 54008/54009 world sinusoidal/Mollweide."""
    from lib_gdal_spark.functions import crs as CRS

    bng = CRS.get_crs_transform(27700)
    # natural origin maps to the false easting/northing exactly
    e, n = bng.forward(np.array([-2.0]), np.array([49.0]))
    assert abs(e[0] - 400_000.0) < 1e-6 and abs(n[0] + 100_000.0) < 1e-6
    # the published OS worked example (A guide to coordinate systems in
    # Great Britain, C.1): 52d39m27.2531sN 1d43m4.5177sE ->
    # E 651409.903 N 313177.270 (OSGB36 graticule)
    phi = 52 + 39 / 60 + 27.2531 / 3600
    lam = 1 + 43 / 60 + 4.5177 / 3600
    e, n = bng.forward(np.array([lam]), np.array([phi]))
    assert abs(e[0] - 651409.903) < 0.002
    assert abs(n[0] - 313177.270) < 0.002

    nz = CRS.get_crs_transform(2193)
    e, n = nz.forward(np.array([173.0]), np.array([0.0]))
    assert abs(e[0] - 1_600_000.0) < 1e-6 and abs(n[0] - 10_000_000.0) < 1e-6

    for code, pts in {
        27700: ([-2.0, -3.5, 0.2], [49.0, 52.0, 55.0]),
        2193: ([173.0, 168.0, 178.0], [-41.0, -46.0, -37.5]),
        54008: ([-3.0, 120.0, -75.0], [51.5, -30.0, 45.0]),
        54009: ([-3.0, 120.0, -75.0], [51.5, -30.0, 45.0]),
    }.items():
        t = CRS.get_crs_transform(code)
        lon, lat = np.array(pts[0]), np.array(pts[1])
        x, y = t.forward(lon, lat)
        lo, la = t.inverse(x, y)
        assert np.allclose(lo, lon, atol=1e-9), code
        assert np.allclose(la, lat, atol=1e-9), code

    # Mollweide pins: poles at y = sqrt(2) R, map width 4 sqrt(2) R
    mo = CRS.get_crs_transform(54009)
    _, y = mo.forward(np.array([0.0]), np.array([90.0]))
    assert abs(y[0] - np.sqrt(2) * 6378137.0) < 1e-3
    x, _ = mo.forward(np.array([180.0]), np.array([0.0]))
    assert abs(x[0] - 2.0 * np.sqrt(2) * 6378137.0) < 1e-3
    # MODIS sphere
    assert CRS.modis_sinusoidal().R == 6371007.181


def test_helmert_datum_shift():
    """towgs84 Helmert legs (EPSG 9603/9606): known shift magnitudes,
    exact algebraic inverse, and the geodetic<->ECEF round trip."""
    from lib_gdal_spark.functions import crs as CRS

    lon = np.array([-100.0, -75.0, -122.4])
    lat = np.array([40.0, 35.0, 37.8])
    lo2, la2 = CRS.datum_shift(
        lon, lat, CRS.ELLIPSOIDS["clrk66"], CRS.TOWGS84["NAD27"],
        CRS.ELLIPSOIDS["WGS84"], None)
    # NAD27->WGS84 moves CONUS coordinates by tens of meters
    dm = np.hypot((lo2 - lon) * 111_320 * np.cos(np.radians(lat)),
                  (la2 - lat) * 110_540)
    assert np.all(dm > 10.0) and np.all(dm < 300.0)
    # and the reverse leg closes to sub-nanodegree
    lo3, la3 = CRS.datum_shift(
        lo2, la2, CRS.ELLIPSOIDS["WGS84"], None,
        CRS.ELLIPSOIDS["clrk66"], CRS.TOWGS84["NAD27"])
    assert np.allclose(lo3, lon, atol=1e-9)
    assert np.allclose(la3, lat, atol=1e-9)

    # OSGB36 Greenwich meridian sits ~5.5 arcsec east of WGS84's
    lo4, _ = CRS.datum_shift(
        np.array([0.0]), np.array([51.4777]),
        CRS.ELLIPSOIDS["airy"], CRS.TOWGS84["OSGB36"],
        CRS.ELLIPSOIDS["WGS84"], None)
    assert -0.0020 < lo4[0] < -0.0010

    # 7-param helmert inverse is the standard first-order (transposed
    # small-angle rotation) inverse: closure error O(r^2)*a ~ 0.1 mm
    X, Y, Z = CRS.geodetic_to_ecef(
        np.array([1.0]), np.array([52.0]), *CRS.ELLIPSOIDS["airy"])
    X2, Y2, Z2 = CRS.helmert_apply(X, Y, Z, CRS.TOWGS84["OSGB36"])
    X3, Y3, Z3 = CRS.helmert_apply(X2, Y2, Z2, CRS.TOWGS84["OSGB36"],
                                   inverse=True)
    assert abs(X3[0] - X[0]) < 1e-3
    assert abs(Y3[0] - Y[0]) < 1e-3
    assert abs(Z3[0] - Z[0]) < 1e-3

    # geodetic <-> ECEF closes (Bowring single step, h=0)
    lo, la = CRS.ecef_to_geodetic(X, Y, Z, *CRS.ELLIPSOIDS["airy"])
    assert abs(lo[0] - 1.0) < 1e-12 and abs(la[0] - 52.0) < 1e-9

    # same-datum reprojection takes no datum leg (identity fast path)
    lo5, la5 = CRS.datum_shift(lon, lat, CRS.ELLIPSOIDS["WGS84"], None,
                               CRS.ELLIPSOIDS["WGS84"], None)
    assert lo5 is lon and la5 is lat


def test_laea_europe_and_rd_new():
    """Round-4 session-2 registry breadth: EPSG:3035 (ellipsoidal LAEA,
    Snyder §24 / EPSG 9820) against the published EPSG Guidance Note 7-2
    worked example, and EPSG:28992 (oblique stereographic double
    projection, EPSG 9809, Bessel) against its GN7-2 worked example."""
    from lib_gdal_spark.functions import crs as CRS

    laea = CRS.get_crs_transform(3035)
    # GN7-2 §1.4.10 worked example (ETRS89/LAEA): 50N 5E ->
    # E 3962799.45, N 2999718.85
    e, n = laea.forward(np.array([5.0]), np.array([50.0]))
    assert abs(e[0] - 3962799.45) < 0.01
    assert abs(n[0] - 2999718.85) < 0.01
    # natural origin maps to the false easting/northing exactly
    e, n = laea.forward(np.array([10.0]), np.array([52.0]))
    assert abs(e[0] - 4_321_000.0) < 1e-6 and abs(n[0] - 3_210_000.0) < 1e-6
    # equal-area property: a small quad keeps its authalic area
    for lat0 in (35.0, 52.0, 68.0):
        d = 0.01
        lon_q = np.array([0.0, d, d, 0.0]) - 3.0
        lat_q = np.array([lat0, lat0, lat0 + d, lat0 + d])
        x, y = laea.forward(lon_q, lat_q)
        area = 0.5 * abs(
            np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        # ellipsoidal patch area via the authalic sphere
        Rq = laea.Rq
        phi = np.radians(lat0 + d / 2)
        q1 = laea._q(np.radians(lat0))
        q2 = laea._q(np.radians(lat0 + d))
        truth = (laea.a ** 2 / 2.0) * (q2 - q1) * np.radians(d)
        assert abs(area - truth) / truth < 1e-4, lat0
    # closure fuzz over the European window
    rng = np.random.default_rng(11)
    lon = rng.uniform(-10.0, 30.0, 5000)
    lat = rng.uniform(35.0, 70.0, 5000)
    x, y = laea.forward(lon, lat)
    lo, la = laea.inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-7  # authalic series truncation

    rd = CRS.get_crs_transform(28992)
    # GN7-2 §1.4.7.1 worked example (Amersfoort/RD New): 53N 6E ->
    # E 196105.283, N 557057.739
    e, n = rd.forward(np.array([6.0]), np.array([53.0]))
    assert abs(e[0] - 196105.283) < 0.002
    assert abs(n[0] - 557057.739) < 0.002
    # closure fuzz over the Dutch window (inverse is fully unrolled)
    lon = rng.uniform(3.0, 8.0, 5000)
    lat = rng.uniform(50.0, 54.0, 5000)
    x, y = rd.forward(lon, lat)
    lo, la = rd.inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-12
    # datum-aware inverse lands the RD origin on the published WGS84
    # position of the Amersfoort natural origin (~5.38720E 52.15517N)
    inv = CRS.datum_aware_inverse(28992)
    lo, la = inv(np.array([155_000.0]), np.array([463_000.0]))
    assert abs(lo[0] - 5.38720) < 5e-4
    assert abs(la[0] - 52.15517) < 5e-4


def test_krovak():
    """EPSG:5514 Krovak East North (EPSG method 9819) against the
    published GN7-2 worked example and bit-exact closure."""
    from lib_gdal_spark.functions import crs as CRS

    kr = CRS.get_crs_transform(5514)
    # GN7-2 §1.4.3 worked example: 50d12m32.4416sN 16d50m59.1790sE ->
    # Southing 1050538.63, Westing 568991.00 (2065); 5514 negates both
    phi = 50 + 12 / 60 + 32.4416 / 3600
    lam = 16 + 50 / 60 + 59.1790 / 3600
    e, n = kr.forward(np.array([lam]), np.array([phi]))
    assert abs(e[0] - (-568991.00)) < 0.02
    assert abs(n[0] - (-1050538.63)) < 0.02
    # closure fuzz over the Czech/Slovak window (unrolled fixed point)
    rng = np.random.default_rng(5)
    lon = rng.uniform(12.0, 23.0, 5000)
    lat = rng.uniform(47.5, 51.5, 5000)
    x, y = kr.forward(lon, lat)
    lo, la = kr.inverse(x, y)
    assert np.abs(lo - lon).max() < 1e-12
    assert np.abs(la - lat).max() < 1e-12
    # conformal: local scale isotropic (E/N aspect ratio of a tiny cross)
    d = 1e-6
    x0, y0 = kr.forward(np.array([17.0]), np.array([49.5]))
    xe, ye = kr.forward(np.array([17.0 + d]), np.array([49.5]))
    xn, yn = kr.forward(np.array([17.0]), np.array([49.5 + d]))
    de = np.hypot(xe - x0, ye - y0)[0]
    dn = np.hypot(xn - x0, yn - y0)[0]
    # meters per degree lon vs lat on Bessel at 49.5N
    e2 = kr.e2
    sp = np.sin(np.radians(49.5))
    nu = kr.a / np.sqrt(1 - e2 * sp * sp)
    rho = kr.a * (1 - e2) / (1 - e2 * sp * sp) ** 1.5
    truth = (nu * np.cos(np.radians(49.5))) / rho
    assert abs(de / dn - truth) < 1e-4
    # datum leg lands Prague (-743km, -1043km) at ~14.4187E 50.0874N
    inv = CRS.datum_aware_inverse(5514)
    lo, la = inv(np.array([-743000.0]), np.array([-1043000.0]))
    assert abs(lo[0] - 14.41867) < 5e-4
    assert abs(la[0] - 50.08742) < 5e-4


def test_cassini_soldner_trinidad():
    """EPSG:30200 Trinidad 1903 grid — GN7-2 §1.4.4 worked example:
    10°00'N 62°00'W -> E 66644.94, N 82536.22 Clarke's links."""
    import numpy as np
    from lib_gdal_spark.functions import crs as CRS

    cs = CRS.get_crs_transform(30200)
    E, N = cs.forward(np.array([-62.0]), np.array([10.0]))
    assert abs(E[0] - 66644.94) < 0.01
    assert abs(N[0] - 82536.22) < 0.01
    # closed-form inverse reverses the worked example
    lon, lat = cs.inverse(E, N)
    assert abs(lon[0] + 62.0) < 1e-9
    assert abs(lat[0] - 10.0) < 1e-9
    # natural origin maps to the false origin
    E0, N0 = cs.forward(np.array([cs.lon0]), np.array([cs.lat0]))
    assert abs(E0[0] - 430000.0) < 1e-6
    assert abs(N0[0] - 325000.0) < 1e-6
    # roundtrip fuzz over the island
    rng = np.random.default_rng(7)
    lo = rng.uniform(-62.5, -60.0, 2000)
    la = rng.uniform(9.0, 12.0, 2000)
    e, n = cs.forward(lo, la)
    lo2, la2 = cs.inverse(e, n)
    assert np.abs(lo2 - lo).max() < 1e-10
    assert np.abs(la2 - la).max() < 1e-8
    # srs_info reports the method
    info = CRS.srs_info(30200)
    assert info["proj"] == "cass"
    assert abs(info["false_e"] - 430000.0) < 1e-9


def test_american_polyconic_brazil():
    """EPSG:29101 SAD69 / Brazil Polyconic (Snyder §18)."""
    import numpy as np
    from lib_gdal_spark.functions import crs as CRS

    p = CRS.get_crs_transform(29101)
    # natural origin (0N 54W) -> false origin
    E, N = p.forward(np.array([-54.0]), np.array([0.0]))
    assert (E[0], N[0]) == (5_000_000.0, 10_000_000.0)
    # central meridian is the meridian arc (x = FE exactly)
    E2, N2 = p.forward(np.array([-54.0]), np.array([-15.0]))
    assert E2[0] == 5_000_000.0
    assert abs((N2[0] - 1e7) - (p._marc(np.radians(-15.0)) - p.M0)) < 1e-6
    # Snyder's §18 numerical example (Clarke 1866, lat0 30N lon0 96W,
    # point 40N 75W): x = 1,776,774.5 m, y = 1,319,657.8 m
    s = CRS.AmericanPolyconic(lat0=30.0, lon0=-96.0, a=6378206.4,
                              f=1.0 - 6356583.8 / 6378206.4)
    xs, ys = s.forward(np.array([-75.0]), np.array([40.0]))
    assert abs(xs[0] - 1776774.5) < 0.5
    assert abs(ys[0] - 1319657.8) < 0.5
    # Newton inverse roundtrips across Brazil incl. the equator band
    rng = np.random.default_rng(9)
    lo = rng.uniform(-74, -34, 3000)
    la = rng.uniform(-34, 5.5, 3000)
    e, n = p.forward(lo, la)
    lo2, la2 = p.inverse(e, n)
    assert np.abs(lo2 - lo).max() < 1e-10
    assert np.abs(la2 - la).max() < 1e-9
    # exact equator row uses the limiting form
    Ee, Ne = p.forward(np.array([-60.0]), np.array([0.0]))
    loe, lae = p.inverse(Ee, Ne)
    assert abs(lae[0]) < 1e-12 and abs(loe[0] + 60.0) < 1e-12
    assert CRS.srs_info(29101)["proj"] == "poly"


def test_mercator_ellipsoidal_and_eqc():
    """EPSG:3395/3002 ellipsoidal Mercator + EPSG:4087 equidistant
    cylindrical (methods 9804 / 1028)."""
    import numpy as np
    from lib_gdal_spark.functions import crs as CRS

    # GN7-2 Mercator-1SP worked example: Makassar / NEIEZ (Bessel,
    # k0 0.997, lon0 110E), point 3S 120E -> E 5009726.58, N 569150.82
    m = CRS.get_crs_transform(3002)
    E, N = m.forward(np.array([120.0]), np.array([-3.0]))
    assert abs(E[0] - 5009726.58) < 0.01
    assert abs(N[0] - 569150.82) < 0.01
    lo, la = m.inverse(E, N)
    assert abs(lo[0] - 120.0) < 1e-9 and abs(la[0] + 3.0) < 1e-9

    # 3395: equator at true scale (E = a*lam), N(0) = 0; differs from
    # the SPHERICAL 3857 away from the equator
    w = CRS.get_crs_transform(3395)
    E0, N0 = w.forward(np.array([10.0]), np.array([0.0]))
    assert abs(E0[0] - np.radians(10.0) * 6378137.0) < 1e-6
    assert N0[0] == 0.0
    web = CRS.get_crs_transform(3857)
    _, Nw = w.forward(np.array([0.0]), np.array([45.0]))
    _, Ns = web.forward(np.array([0.0]), np.array([45.0]))
    assert 0.001 < (Ns[0] - Nw[0]) / Ns[0] < 0.01  # ~0.7% ellipsoidal

    # 4087: N is the true meridian arc (numeric-integration cross-check)
    q = CRS.get_crs_transform(4087)
    _, Nq = q.forward(np.array([0.0]), np.array([45.0]))
    assert abs(Nq[0] - CRS.meridian_arc_numeric(45.0)) < 1e-3

    # roundtrip fuzz, world-wide
    rng = np.random.default_rng(11)
    lo_ = rng.uniform(-179, 179, 2000)
    la_ = rng.uniform(-85, 85, 2000)
    for p, tol in ((w, 1e-12), (q, 1e-8)):
        e, n = p.forward(lo_, la_)
        l2, a2 = p.inverse(e, n)
        assert np.abs(l2 - lo_).max() < 1e-12
        assert np.abs(a2 - la_).max() < tol

    assert CRS.srs_info(3395)["proj"] == "merc"
    assert CRS.srs_info(4087)["proj"] == "eqc"


def test_hotine_oblique_mercator_borneo():
    """EPSG:29873 Timbalai 1948 / RSO Borneo — GN7-2 §1.3.6 variant-B
    worked example: 5°23'14.1129"N 115°48'19.8196"E ->
    E 679245.73, N 596562.78 m."""
    import numpy as np
    from lib_gdal_spark.functions import crs as CRS

    h = CRS.get_crs_transform(29873)
    lat = 5.0 + 23.0 / 60.0 + 14.1129 / 3600.0
    lon = 115.0 + 48.0 / 60.0 + 19.8196 / 3600.0
    E, N = h.forward(np.array([lon]), np.array([lat]))
    assert abs(E[0] - 679245.73) < 0.01
    assert abs(N[0] - 596562.78) < 0.01
    lo, la = h.inverse(E, N)
    assert abs(lo[0] - lon) < 1e-9 and abs(la[0] - lat) < 1e-9
    # variant B: the projection center carries the false coordinates
    Ec, Nc = h.forward(np.array([115.0]), np.array([4.0]))
    assert abs(Ec[0] - 590476.87) < 1e-4
    assert abs(Nc[0] - 442857.65) < 1e-4
    # conformality: isotropic local scale at an off-axis point
    d = 1e-6
    x0, y0 = h.forward(np.array([117.0]), np.array([6.0]))
    xe, ye = h.forward(np.array([117.0 + d]), np.array([6.0]))
    xn, yn = h.forward(np.array([117.0]), np.array([6.0 + d]))
    de = np.hypot(xe - x0, ye - y0)[0]
    dn = np.hypot(xn - x0, yn - y0)[0]
    sp = np.sin(np.radians(6.0))
    nu = h.a / np.sqrt(1 - h.e2 * sp * sp)
    rho = h.a * (1 - h.e2) / (1 - h.e2 * sp * sp) ** 1.5
    truth = (nu * np.cos(np.radians(6.0))) / rho
    assert abs(de / dn - truth) < 1e-4
    # roundtrip fuzz over Borneo
    rng = np.random.default_rng(13)
    lo_ = rng.uniform(109, 120, 3000)
    la_ = rng.uniform(-1, 8, 3000)
    e, n = h.forward(lo_, la_)
    l2, a2 = h.inverse(e, n)
    assert np.abs(l2 - lo_).max() < 1e-12
    assert np.abs(a2 - la_).max() < 1e-12
    assert CRS.srs_info(29873)["proj"] == "omerc"


def test_ups_polar_grids():
    """EPSG:32661/32761 Universal Polar Stereographic (variant A,
    k0 = 0.994 at the pole, 2,000,000 m false origin)."""
    import numpy as np
    from lib_gdal_spark.functions import crs as CRS

    u = CRS.get_crs_transform(32661)
    # the pole carries the false origin, and local scale there is k0
    E, N = u.forward(np.array([0.0]), np.array([90.0]))
    assert (E[0], N[0]) == (2_000_000.0, 2_000_000.0)
    d = 1e-7
    x0, y0 = u.forward(np.array([0.0]), np.array([89.999]))
    x1, y1 = u.forward(np.array([0.0]), np.array([89.999 + d]))
    e2 = u.e * u.e
    rho = (6378137.0 * (1 - e2)
           / (1 - e2 * np.sin(np.radians(89.999)) ** 2) ** 1.5)
    k = np.hypot(x1 - x0, y1 - y0)[0] / (np.radians(d) * rho)
    assert abs(k - 0.994) < 1e-5
    # south grid mirrors
    s = CRS.get_crs_transform(32761)
    E3, N3 = s.forward(np.array([0.0]), np.array([-90.0]))
    assert (E3[0], N3[0]) == (2_000_000.0, 2_000_000.0)
    # roundtrip fuzz over the MGRS polar caps
    rng = np.random.default_rng(21)
    lo = rng.uniform(-180, 180, 2000)
    la = rng.uniform(84.0, 89.99, 2000)
    e, n = u.forward(lo, la)
    l2, a2 = u.inverse(e, n)
    assert np.abs(((l2 - lo + 180) % 360) - 180).max() < 1e-11
    assert np.abs(a2 - la).max() < 1e-11
    las = -la
    es, ns = s.forward(lo, las)
    l2s, a2s = s.inverse(es, ns)
    assert np.abs(((l2s - lo + 180) % 360) - 180).max() < 1e-11
    assert np.abs(a2s - las).max() < 1e-11


def test_state_plane_registry():
    """All 121 NAD83 SPCS zones: natural origin maps exactly to
    (FE, FN) (LCC-2SP and TM both have this EPSG-definition anchor) and
    the inverse round-trips interior points to 1e-9 deg."""
    from lib_gdal_spark.functions.stateplane_data import STATE_PLANE_NAD83

    assert len(STATE_PLANE_NAD83) == 121
    for epsg, z in STATE_PLANE_NAD83.items():
        t = CRS.get_crs_transform(epsg)
        if z[0] == "lcc":
            lat0, lon0, fe, fn = z[4], z[5], z[6], z[7]
        else:
            lat0, lon0, fe, fn = z[2], z[3], z[5], z[6]
        E, N = t.forward(np.array([lon0]), np.array([lat0]))
        assert abs(E[0] - fe) < 1e-6 and abs(N[0] - fn) < 1e-6, epsg
        lons = np.array([lon0 + 1.0, lon0 - 0.7])
        lats = np.array([lat0 + 0.8, lat0 + 1.5])
        E, N = t.forward(lons, lats)
        lo, la = t.inverse(E, N)
        assert np.max(np.abs(lo - lons)) < 1e-9, epsg
        assert np.max(np.abs(la - lats)) < 1e-9, epsg


def test_state_plane_spot_values():
    """Spot parameters against the published registry (Maryland LCC,
    New Jersey TM) and srs_info reporting."""
    md = CRS.srs_info(26985)
    assert md["proj"] == "lcc" and md["lon0"] == -77.0
    assert abs(md["lat1"] - 38.3) < 1e-9 and abs(md["lat2"] - 39.45) < 1e-9
    assert md["false_e"] == 400000.0
    nj = CRS.srs_info(32111)
    assert nj["proj"] == "tmerc" and nj["k0"] == 0.9999
    assert nj["false_n"] == 0.0  # EPSG-definition FN, not the internal one
    # scale factor on an LCC standard parallel is exactly 1
    t = CRS.get_crs_transform(26985)
    assert abs(t.scale_at(38.3) - 1.0) < 1e-12
    assert abs(t.scale_at(39.45) - 1.0) < 1e-12
