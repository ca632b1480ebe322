"""WKT grammar-edge regression corpus — accept/reject behavior verified
differentially against the reference parser (zero mismatches on these
cases; see round-1 session). Values for accepted forms, rejection for
the rest."""

import pytest

from pure_python_geospatial_export_spark.geo import wkt

ACCEPTED = {
    "POINT(1 2)": {"type": "Point", "coordinates": [1.0, 2.0]},
    "MULTIPOINT (1 2, 3 4)": {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    "MULTIPOINT ((1 2), (3 4))": {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    "MULTIPOINT ((1 2), 3 4)": {
        "type": "MultiPoint", "coordinates": [[1.0, 2.0], [3.0, 4.0]]},
    "POINT (1e3 -2.5E-2)": {
        "type": "Point", "coordinates": [1000.0, -0.025]},
    "POINT ( 1   2 )": {"type": "Point", "coordinates": [1.0, 2.0]},
    "LINESTRING(0 0,1 1)": {
        "type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
    "GEOMETRYCOLLECTION (POINT (1 2),LINESTRING (0 0, 1 1))": {
        "type": "GeometryCollection",
        "geometries": [
            {"type": "Point", "coordinates": [1.0, 2.0]},
            {"type": "LineString",
             "coordinates": [[0.0, 0.0], [1.0, 1.0]]},
        ],
    },
    "GEOMETRYCOLLECTION (POINT EMPTY)": {
        "type": "GeometryCollection",
        "geometries": [{"type": "Point", "coordinates": []}],
    },
    "SRID=0;POINT (1 2)": {
        "type": "Point", "coordinates": [1.0, 2.0], "meta": {"srid": 0}},
    # 5-ordinate points parse (reference parser is ordinate-count agnostic)
    "POINT (1 2 3 4 5)": {
        "type": "Point", "coordinates": [1.0, 2.0, 3.0, 4.0, 5.0]},
    # empty parens accepted as an empty point (reference behavior)
    "POINT ()": {"type": "Point", "coordinates": []},
}

REJECTED = [
    "point (1 2)",           # lowercase tag
    "POINT",
    "",
    "POLYGON (0 0, 1 1)",    # missing ring parens
]


@pytest.mark.parametrize("text", sorted(ACCEPTED))
def test_accepted_forms(text):
    assert wkt.loads(text) == ACCEPTED[text]


@pytest.mark.parametrize("text", REJECTED)
def test_rejected_forms(text):
    with pytest.raises(ValueError):
        wkt.loads(text)
