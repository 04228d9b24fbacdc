"""Mapbox Vector Tile codec (sinks/mvt.py)."""

import numpy as np

from lib_gdal_spark.functions import geometry as G
from lib_gdal_spark.sinks.mvt import (
    GEOM_LINE, GEOM_POINT, GEOM_POLY,
    decode_tile, encode_tile, tile_features,
)


def test_tile_roundtrip_all_types():
    feats = [
        dict(geom_type=GEOM_POINT, parts=[np.array([[10, 20]])],
             attrs={"name": "a", "rank": 3, "score": 1.5, "on": True},
             id=7),
        dict(geom_type=GEOM_LINE,
             parts=[np.array([[0, 0], [100, 50], [120, 40]]),
                    np.array([[5, 5], [6, 9]])],
             attrs={"name": "b"}),
        dict(geom_type=GEOM_POLY,
             parts=[np.array([[0, 0], [0, 40], [40, 40], [40, 0],
                              [0, 0]])],
             attrs=None),
    ]
    data = encode_tile("roads", feats, extent=4096)
    layers = decode_tile(data)
    assert len(layers) == 1
    lay = layers[0]
    assert lay["layer"] == "roads" and lay["extent"] == 4096
    f0, f1, f2 = lay["features"]
    assert f0["id"] == 7 and f0["geom_type"] == GEOM_POINT
    assert f0["parts"][0].tolist() == [[10, 20]]
    assert f0["attrs"] == {"name": "a", "rank": 3, "score": 1.5,
                           "on": True}
    assert f1["geom_type"] == GEOM_LINE
    assert f1["parts"][0].tolist() == [[0, 0], [100, 50], [120, 40]]
    assert f1["parts"][1].tolist() == [[5, 5], [6, 9]]
    # polygon ring comes back re-closed
    assert f2["parts"][0].tolist() == [[0, 0], [0, 40], [40, 40],
                                       [40, 0], [0, 0]]
    # value pool interning: shared key 'name' appears once in the pool
    assert data.count(b"name") == 1


def test_tile_features_distributed(spark):
    import pandas as pd
    rows = []
    for i in range(20):
        lon = -170 + i * 17 % 340
        lat = -60 + (i * 7) % 120
        rows.append((G.wkb_point(float(lon), float(lat)),
                     {"i": str(i)}))
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["geom_wkb", "attrs"]),
        schema="geom_wkb binary, attrs map<string,string>")
    tiles = tile_features(df, z=2, layer="pts").collect()
    n_feats = 0
    for t in tiles:
        lay = decode_tile(bytes(t["mvt"]))[0]
        assert lay["layer"] == "pts"
        for f in lay["features"]:
            assert f["geom_type"] == GEOM_POINT
            x, y = f["parts"][0][0]
            assert 0 <= x <= 4096 and 0 <= y <= 4096
            n_feats += 1
    assert n_feats == 20
