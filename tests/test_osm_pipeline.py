"""OSM wrangling-layer tests: XML ingest, audit, cleaning, shaping,
flattening, sinks, and the exploratory query layer — the reference's
lifecycle, asserted stage by stage."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_wrangling_openstreetmap_spark.sources.osm_gen import generate_osm_xml
from data_wrangling_openstreetmap_spark.sources import osm_pipeline as P

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def wrangled(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("osm")
    path = generate_osm_xml(spark, SF, str(d), max_nodes=150)
    tables, docs, audits = P.run_pipeline(spark, path, out_dir=str(d / "out"))
    return d, tables, docs, audits


def test_ingest_counts(spark, wrangled):
    _, tables, docs, _ = wrangled
    assert tables["nodes"].count() == 150
    assert tables["ways"].count() > 0
    # every way member references an existing node, positions start at 0
    wn = tables["ways_nodes"]
    orphans = wn.join(
        tables["nodes"], wn.node_id == tables["nodes"].id, "left_anti"
    )
    assert orphans.count() == 0
    assert wn.groupBy("id").agg(F.min("position").alias("m")).filter(
        F.col("m") != 0
    ).count() == 0


def test_audit_buckets(wrangled):
    _, _, _, audits = wrangled
    buckets = {r.bucket: r.n for r in audits["tag_keys"].collect()}
    assert buckets.get("lower_colon", 0) > 0  # addr:street etc.
    assert buckets.get("lower", 0) > 0  # amenity, phone
    assert buckets.get("problemchars", 0) > 0  # planted "bad key"
    street_types = {r.street_type for r in audits["street_types"].collect()}
    assert "St." in street_types and "Ave" in street_types


def test_street_cleaning(spark, wrangled):
    _, tables, _, _ = wrangled
    streets = tables["nodes_tags"].filter(
        (F.col("type") == "addr") & (F.col("key") == "street")
    )
    last_words = {
        r.w
        for r in streets.select(
            F.regexp_extract("value", r"(\S+\.?)$", 1).alias("w")
        ).collect()
    }
    # every messy abbreviation got normalized
    assert last_words <= {"Street", "Avenue", "Road", "Boulevard", "Drive", "Lane"}


def test_postcode_cleaning(spark, wrangled):
    _, tables, _, _ = wrangled
    posts = tables["nodes_tags"].filter(
        (F.col("type") == "addr") & (F.col("key") == "postcode")
    )
    bad = posts.filter(
        F.col("value").isNotNull() & ~F.col("value").rlike(r"^\d{5}$")
    )
    assert bad.count() == 0  # malformed → nulled
    assert posts.filter(F.col("value").isNull()).count() > 0


def test_shaped_documents(wrangled):
    _, _, docs, _ = wrangled
    row = docs.filter(F.col("address.street").isNotNull()).first()
    assert row.element_type == "node"
    assert len(row.pos) == 2
    assert row.created.user.startswith("mapper")
    schema_names = {f.name for f in docs.schema.fields}
    assert schema_names == {"id", "element_type", "pos", "created", "address", "tags"}


def test_sinks_roundtrip(spark, wrangled):
    d, tables, docs, _ = wrangled
    csv_nodes = (
        spark.read.option("header", True).csv(str(d / "out/csv/nodes"))
    )
    assert csv_nodes.count() == tables["nodes"].count()
    json_docs = spark.read.json(str(d / "out/json/documents"))
    assert json_docs.count() == docs.count()


def test_query_layer(wrangled):
    _, tables, _, _ = wrangled
    top = P.top_contributors(tables, k=5).collect()
    assert len(top) == 5
    assert top[0].n_contributions >= top[-1].n_contributions
    amen = P.top_amenities(tables).collect()
    assert {r.value for r in amen} <= {"cafe", "restaurant", "school", "library", "pharmacy"}
