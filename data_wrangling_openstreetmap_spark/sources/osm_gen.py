"""Deterministic OSM-XML fixture generator.

The reference project class wrangles a city OSM extract. No OSM data
ships with this environment, so the demo layer generates an OSM-shaped
XML file from the `customer` table: one `<node>` per customer with
deliberately MESSY tags (abbreviated street types, malformed postcodes,
inconsistent phone formats, an occasional problem-character key — the
exact dirt the reference's audit/clean steps exist for), and one
`<way>` per nation stringing its customers together.

Generation is driver-side string building — this is a test-fixture
generator, not a scale path; at scale the XML/PBF comes from planet
extracts and is ingested by the distributed XML source (osm_pipeline).
Everything derives from c_custkey arithmetic: same input ⇒ same file.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from ..io import load_table

STREET_TYPES_MESSY = ["St.", "Ave", "Rd.", "Blvd", "Street", "Avenue", "Dr.", "Ln"]
STREET_BASES = ["Main", "Oak", "College", "Harbor", "Mill", "Church", "Lake", "Park"]
AMENITIES = ["cafe", "restaurant", "school", "library", "pharmacy"]


def _node_xml(custkey: int, nationkey: int, name: str) -> str:
    lat = 43.0 + (custkey * 7 % 1000) / 1000.0
    lon = -79.0 - (custkey * 13 % 1000) / 1000.0
    user = f"mapper{custkey % 23}"
    street = (
        f"{STREET_BASES[custkey % len(STREET_BASES)]} "
        f"{STREET_TYPES_MESSY[custkey % len(STREET_TYPES_MESSY)]}"
    )
    tags = [
        ("addr:street", street),
        ("addr:postcode", f"M{custkey % 10}J 2N{custkey % 10}" if custkey % 7 == 0 else f"{10000 + custkey % 89999}"),
    ]
    if custkey % 3 == 0:
        tags.append(("amenity", AMENITIES[custkey % len(AMENITIES)]))
    if custkey % 5 == 0:
        tags.append(("phone", f"+1 416 555 {custkey % 10000:04d}"))
    elif custkey % 5 == 1:
        tags.append(("phone", f"(416) 555-{custkey % 10000:04d}"))
    if custkey % 11 == 0:
        tags.append(("bad key", "problem chars"))  # space → problemchars bucket
    tag_xml = "".join(f'  <tag k="{k}" v="{v}"/>\n' for k, v in tags)
    return (
        f'<node id="{custkey}" lat="{lat}" lon="{lon}" user="{user}" '
        f'uid="{custkey % 23}" version="{1 + custkey % 3}" '
        f'changeset="{custkey % 97}" '
        f'timestamp="2024-01-{1 + custkey % 28:02d}T00:00:00Z">\n'
        f"{tag_xml}</node>\n"
    )


def _way_xml(way_id: int, node_ids: list[int]) -> str:
    nds = "".join(f'  <nd ref="{n}"/>\n' for n in node_ids)
    return (
        f'<way id="{way_id}" user="mapper{way_id % 23}" uid="{way_id % 23}" '
        f'version="1" changeset="{way_id % 97}" '
        f'timestamp="2024-02-01T00:00:00Z">\n'
        f"{nds}"
        f'  <tag k="highway" v="residential"/>\n'
        f'  <tag k="name" v="{STREET_BASES[way_id % len(STREET_BASES)]} '
        f'{STREET_TYPES_MESSY[way_id % len(STREET_TYPES_MESSY)]}"/>\n'
        f"</way>\n"
    )


def generate_osm_xml(
    spark: SparkSession, sf_dir: str, out_dir: str, max_nodes: int = 500
) -> str:
    """Build `<out_dir>/extract.osm` from the first `max_nodes`
    customers (by custkey). Returns the file path."""
    customers = (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_nationkey", "c_name")
        .orderBy("c_custkey")
        .limit(max_nodes)
        .collect()
    )
    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n<osm version="0.6">\n']
    by_nation: dict[int, list[int]] = {}
    for r in customers:
        parts.append(_node_xml(r.c_custkey, r.c_nationkey, r.c_name))
        by_nation.setdefault(r.c_nationkey, []).append(r.c_custkey)
    for nationkey in sorted(by_nation):
        members = by_nation[nationkey]
        if len(members) >= 2:
            parts.append(_way_xml(1_000_000 + nationkey, members[:20]))
    parts.append("</osm>\n")
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "extract.osm")
    with open(path, "w", encoding="utf-8") as f:
        f.write("".join(parts))
    return path
