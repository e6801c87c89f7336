"""Scalar function sweep (SURVEY.md §2.7 F1–F9).

The reference's cleaning layer is built from exactly these families:
string normalization, regex standardization (phones/postcodes), date
handling, arithmetic, list/tag manipulation, casts. Each family gets a
focused query; everything is built-in Column expressions (JVM-side).

Float determinism: graded outputs avoid libm-dependent functions
(log/pow/trig) except where explicitly rounded — `+ - * / sqrt round
abs floor ceil` are IEEE-exact and engine-identical per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.geospatial import euclidean_deg, grid_cell, haversine_m, in_bbox
from ..io import load_table
from ..registry import register
from ._helpers import cents, spread

# ---------------------------------------------------------------------------
# q6 — JSON extraction + aggregation (F7). Headline bench query.
# ---------------------------------------------------------------------------

_Q6_ORACLE = """
SELECT
  event_type,
  COUNT(*) AS n,
  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS DOUBLE) / COUNT(*) AS avg_k
FROM events
GROUP BY event_type
"""


@register("q6_json_extract", oracle=_Q6_ORACLE, tags=("F7", "A1"))
def q6_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extract an integer field from the JSON props column and
    aggregate. get_json_object is JVM-side (Jackson); for a fixed
    schema at scale, from_json with an explicit schema is cheaper —
    both stay in codegen."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            (F.sum("k").cast("double") / F.count("*")).alias("avg_k"),
        )
    )


# ---------------------------------------------------------------------------
# F1 — string functions.
# ---------------------------------------------------------------------------

_F1_ORACLE = """
SELECT
  c_custkey,
  lower(c_name) AS name_lower,
  upper(c_mktsegment) AS seg_upper,
  length(c_name) AS name_len,
  substring(c_name, 1, 8) AS name_prefix,
  trim(concat('  ', c_name, '  ')) AS name_trimmed,
  lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
  replace(c_name, '#', '-') AS name_dashed,
  len(string_split(c_name, '0')) AS n_zero_splits
FROM customer
"""


@register("f1_string_funcs", oracle=_F1_ORACLE, tags=("F1",))
def f1_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function battery (lower/upper/length/substring/trim/lpad/
    replace/split) — the reference's name-cleaning idioms."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.lower("c_name").alias("name_lower"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.length("c_name").alias("name_len"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias(
            "name_trimmed"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.replace(F.col("c_name"), F.lit("#"), F.lit("-")).alias("name_dashed"),
        F.size(F.split("c_name", "0")).alias("n_zero_splits"),
    )


# ---------------------------------------------------------------------------
# F2 — regex standardization (the phone/postcode cleaning idiom).
# ---------------------------------------------------------------------------

_F2_ORACLE = """
SELECT
  s_suppkey,
  regexp_extract(s_name, '([0-9]+)$', 1) AS trailing_digits,
  CAST(regexp_extract(s_name, '([0-9]+)$', 1) AS BIGINT) AS supplier_num,
  regexp_replace(s_name, '[^0-9]+', '', 'g') AS digits_only
FROM supplier
"""


@register("f2_regex_standardize", oracle=_F2_ORACLE, tags=("F2", "F8"))
def f2_regex_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex extraction + global replace — postcode/phone
    standardization as the reference does it, minus the dirty data."""
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        "s_suppkey",
        F.regexp_extract("s_name", r"([0-9]+)\z", 1).alias("trailing_digits"),
        F.regexp_extract("s_name", r"([0-9]+)\z", 1)
        .cast("long")
        .alias("supplier_num"),
        F.regexp_replace("s_name", r"[^0-9]+", "").alias("digits_only"),
    )


# ---------------------------------------------------------------------------
# F3 — date/time functions.
# ---------------------------------------------------------------------------

_F3_ORACLE = """
SELECT
  year(o_orderdate) AS order_year,
  month(o_orderdate) AS order_month,
  COUNT(*) AS n_orders,
  CAST(MIN(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS first_day,
  MAX(day(o_orderdate)) AS max_dom,
  COUNT(DISTINCT CAST(date_trunc('week', o_orderdate) AS DATE)) AS n_weeks,
  CAST(SUM(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01')) AS BIGINT) AS total_days_before_2002
FROM orders
GROUP BY 1, 2
"""


@register("f3_datetime", oracle=_F3_ORACLE, tags=("F3", "A7"))
def f3_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-part extraction, truncation, and date arithmetic bucketed
    monthly. Driver-hash canonicalization: DATE outputs are cast to
    timestamp on both sides (pandas lands dates as object(datetime.date)
    on the Spark side but datetime64 on DuckDB's), and the BIGINT sum is
    CAST back to BIGINT in the oracle (DuckDB SUM returns HUGEINT →
    pandas float64)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.min(F.to_date("o_orderdate")).cast("timestamp").alias("first_day"),
            F.max(F.dayofmonth("o_orderdate")).alias("max_dom"),
            F.countDistinct(F.date_trunc("week", "o_orderdate").cast("date")).alias(
                "n_weeks"
            ),
            F.sum(
                F.datediff(F.lit("2002-01-01").cast("date"), F.to_date("o_orderdate"))
            ).alias("total_days_before_2002"),
        )
    )


# ---------------------------------------------------------------------------
# F4 — math functions (IEEE-exact subset, per-row).
# ---------------------------------------------------------------------------

_F4_ORACLE = """
SELECT
  l_orderkey,
  l_linenumber,
  round(l_extendedprice, 1) AS price_r1,
  abs(l_discount - 0.05) AS disc_dev,
  CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
  CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
  sqrt(l_quantity) AS qty_sqrt,
  CAST(l_quantity AS BIGINT) % 5 AS qty_mod5
FROM lineitem
WHERE l_orderkey < 200
"""


@register("f4_math", oracle=_F4_ORACLE, tags=("F4",))
def f4_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery restricted to correctly-rounded IEEE ops
    (round/abs/floor/ceil/sqrt/mod) so per-row values are bit-identical
    on both engines; log/pow live in ungraded demos because libm
    implementations differ."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_quantity").alias("qty_floor"),
        F.ceil(F.col("l_quantity") / 7).alias("qty_ceil7"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity").cast("long") % 5).alias("qty_mod5"),
    )


# ---------------------------------------------------------------------------
# F5 — array functions over split text.
# ---------------------------------------------------------------------------

_F5_ORACLE = """
SELECT
  doc_id,
  len(string_split(text, ' ')) AS n_words,
  array_to_string(list_slice(list_sort(string_split(text, ' ')), 1, 3), ' ') AS first3_sorted,
  list_contains(string_split(text, ' '), 'data') AS has_data,
  len(list_distinct(string_split(text, ' '))) AS n_distinct_words
FROM documents
WHERE doc_id < 100
"""


@register("f5_array_funcs", oracle=_F5_ORACLE, tags=("F5",))
def f5_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery (split/size/sort/slice/contains/distinct) — the
    node_refs / tag-list manipulation family. The sliced array is
    serialized with array_join on both sides: array-typed output columns
    crash the driver's pandas canonicalizer (round-1 `err`)."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.array_join(F.slice(F.sort_array(words), 1, 3), " ").alias("first3_sorted"),
        F.array_contains(words, "data").alias("has_data"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
    )


# ---------------------------------------------------------------------------
# F6 — map functions (the open tag-schema idiom).
# ---------------------------------------------------------------------------

_F6_ORACLE = """
SELECT doc_id, lang AS lang_from_map, source AS source_from_map, 2 AS n_keys
FROM documents
WHERE doc_id < 100
"""


@register("f6_map_funcs", oracle=_F6_ORACLE, tags=("F6",))
def f6_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a string→string map per row (the OSM open tag schema:
    MapType carries arbitrary k/v tags), then read it back via
    element_at / map_keys. The oracle checks the round-trip, which is
    the point: map in, correct values out."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    tags = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    return d.select(
        "doc_id",
        F.element_at(tags, "lang").alias("lang_from_map"),
        F.element_at(tags, "source").alias("source_from_map"),
        F.size(F.map_keys(tags)).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# F8 — casts / null handling.
# ---------------------------------------------------------------------------

_F8_ORACLE = """
SELECT
  p_partkey,
  CAST(p_size AS VARCHAR) AS size_str,
  TRY_CAST(regexp_extract(p_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
  COALESCE(NULLIF(p_brand, 'Brand#1'), 'OTHER') AS brand_or_other,
  CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS DOUBLE) AS price_dec,
  CAST(floor(p_retailprice) AS BIGINT) AS price_floor_int
FROM part
WHERE p_partkey < 300
"""


@register("f8_casts_nulls", oracle=_F8_ORACLE, tags=("F8",))
def f8_casts_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cast battery + coalesce/nullif — the postcode-digits-to-int
    cleaning idiom. The decimal cast is still exercised, but the final
    output re-casts to double on both sides: object(Decimal) vs float64
    breaks the driver's dtype-revealing hash (round-1 red). The
    double→decimal(12,2)→double round-trip is exact for these
    magnitudes, so values stay bit-identical."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") < 300)
    return p.select(
        "p_partkey",
        F.col("p_size").cast("string").alias("size_str"),
        F.regexp_extract("p_name", r"([0-9]+)", 1)
        .try_cast("long")
        .alias("name_num"),
        F.coalesce(F.nullif("p_brand", F.lit("Brand#1")), F.lit("OTHER")).alias(
            "brand_or_other"
        ),
        F.col("p_retailprice").cast("decimal(12,2)").cast("double").alias("price_dec"),
        F.floor("p_retailprice").alias("price_floor_int"),
    )


# ---------------------------------------------------------------------------
# F9 — geospatial (haversine, bbox, grid cell) over synthetic lat/lon
# derived deterministically from customer keys (the testdata has no
# native coordinates; the reference's domain is OSM points).
# ---------------------------------------------------------------------------

_F9_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 170) * CAST(0.5 AS DOUBLE) - CAST(42.0 AS DOUBLE) AS lat,
         (c_custkey % 355) * CAST(0.5 AS DOUBLE) - CAST(88.0 AS DOUBLE) AS lon
  FROM customer
)
SELECT
  c_custkey,
  lat, lon,
  CAST(floor((lat + 90.0) * 10.0) AS BIGINT) * 3600
    + CAST(floor((lon + 180.0) * 10.0) AS BIGINT) AS cell_id,
  (lat BETWEEN 40.0 AND 55.0 AND lon BETWEEN -5.0 AND 15.0) AS in_europe_box,
  sqrt((lat - 48.9) * (lat - 48.9) + (lon - 2.35) * (lon - 2.35)) AS deg_dist_paris,
  round(2 * 6371000.0 * asin(sqrt(
      sin(radians(48.9 - lat) / 2) * sin(radians(48.9 - lat) / 2)
      + cos(radians(lat)) * cos(radians(48.9))
        * sin(radians(2.35 - lon) / 2) * sin(radians(2.35 - lon) / 2)
  )), 0) AS hav_m_paris
FROM pts
"""


@register("f9_geospatial", oracle=_F9_ORACLE, tags=("F9",))
def f9_geospatial(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geospatial battery: grid-cell bucketing, bbox containment,
    exact planar distance, and haversine (rounded to whole meters —
    trig is libm-dependent, sub-meter bits may differ across engines).

    Lat/lon are synthesized deterministically from c_custkey — integer
    % and *0.5 are exact in doubles, so the points are engine-identical.
    """
    c = load_table(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 170) * 0.5 - 42.0
    lon = (F.col("c_custkey") % 355) * 0.5 - 88.0
    paris_lat, paris_lon = F.lit(48.9), F.lit(2.35)
    return c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
        grid_cell(lat, lon, 10).alias("cell_id"),
        in_bbox(lat, lon, 40.0, -5.0, 55.0, 15.0).alias("in_europe_box"),
        euclidean_deg(lat, lon, paris_lat, paris_lon).alias("deg_dist_paris"),
        F.round(haversine_m(lat, lon, paris_lat, paris_lon), 0).alias("hav_m_paris"),
    )


# ---------------------------------------------------------------------------
# F10 — binary encodings: base64 / hex round-trips over real payload
# bytes. The transport formats every ingestion boundary speaks (HTTP
# bodies, message queues, checksum manifests) — graded end to end
# including the decode-back-equals-original proof.
# ---------------------------------------------------------------------------

_F10_ORACLE = """
SELECT doc_id,
       base64(encode(text)) AS b64,
       upper(hex(encode(substring(text, 1, 8)))) AS hex16,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       decode(from_base64(base64(encode(text)))) = text AS roundtrip_ok
FROM documents
WHERE doc_id % 40 = 0
"""


@register("f10_binary_encodings", oracle=_F10_ORACLE, tags=("F1", "F8", "F2"))
def f10_binary_encodings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base64 and hex images of document payload bytes plus a
    decode-back-equals-original verdict — RFC 4648 base64 (with
    padding) and uppercase hex agree byte-for-byte between Spark's
    codec and DuckDB's, so the encodings themselves are value-hash
    graded, not just spot-checked — after normalizing one real codec
    divergence: Spark's base64 is Java's MIME encoder, which wraps
    output in CRLF every 76 chars, while DuckDB emits unwrapped RFC
    4648; the wrap is stripped here (unbase64 accepts both). The
    roundtrip column proves unbase64∘base64 is the identity on real
    payloads (not only that two encoders agree).

    Scale: pure map-side codec projections; base64 inflates 4/3× so at
    100 TB encode as late (and decode as early) as possible — the
    binary column, not its text image, should ride shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 40 == 0
    )
    payload = F.encode(F.col("text"), "utf-8")
    head8 = F.encode(F.substring(F.col("text"), 1, 8), "utf-8")
    return docs.select(
        "doc_id",
        F.regexp_replace(F.base64(payload), "\r\n", "").alias("b64"),
        F.hex(head8).alias("hex16"),
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        (
            F.decode(F.unbase64(F.base64(payload)), "utf-8") == F.col("text")
        ).alias("roundtrip_ok"),
    )


# ---------------------------------------------------------------------------
# F11 — semi-structured VARIANT (Spark 4): parse the JSON blob ONCE into
# the binary variant encoding, then do typed extractions from it — the
# scale-path replacement for repeated get_json_object string parsing.
# ---------------------------------------------------------------------------

_F11_ORACLE = """
SELECT event_type,
       CAST(CAST(props->>'k' AS BIGINT) % 10 AS BIGINT) AS k_bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(MIN(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k,
       CAST(COUNT(CAST(props->>'missing' AS BIGINT)) AS BIGINT) AS n_missing_key
FROM events
GROUP BY event_type, k_bucket
"""


@register("f11_variant_extract", oracle=_F11_ORACLE, tags=("F7", "F8", "A1"))
def f11_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path for semi-structured props: ``parse_json``
    builds the binary variant value once, ``variant_get`` does typed
    path extraction from it, and ``try_variant_get`` probes an absent
    key without erroring (NULL → counted as 0 matches). Same answers as
    the q6 string-path family — the point is the encoding.

    Scale: variant parses each blob exactly once per row and every
    subsequent extraction is a cheap binary traversal, where chained
    get_json_object re-parses the string per call; the whole projection
    stays inside WholeStageCodegen (plan-asserted), and the groupBy is
    an ordinary partial+final hash agg on (event_type, k_bucket).
    """
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.parse_json(F.col("props")).alias("v")
    ).select(
        "event_type",
        F.variant_get("v", "$.k", "long").alias("k"),
        F.try_variant_get("v", "$.missing", "long").alias("missing"),
    )
    return v.groupBy(
        "event_type", (F.col("k") % 10).alias("k_bucket")
    ).agg(
        F.count("*").alias("n"),
        F.min("k").alias("min_k"),
        F.max("k").alias("max_k"),
        F.count("missing").alias("n_missing_key"),
    )


# ---------------------------------------------------------------------------
# F12 — collation-aware comparison (Spark 4 COLLATE): case-insensitive
# grouping/equality as a COLUMN PROPERTY instead of scattered lower()
# calls — the engine picks collation-aware hashing and codegen.
# ---------------------------------------------------------------------------

_F12_ORACLE = """
WITH noisy AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN upper(event_type) ELSE event_type END
           AS raw_type,
         user_id
  FROM events
)
SELECT lower(raw_type) AS event_class,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM noisy
GROUP BY lower(raw_type)
"""


@register("f12_collation_groupby", oracle=_F12_ORACLE, tags=("F1", "A3"))
def f12_collation_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group case-noisy event types under the UTF8_LCASE collation:
    the deterministically case-mangled column is grouped by COLLATION,
    not by a lower() rewrite — 'CLICK' and 'click' land in one group
    because the column's comparison semantics say so. The output key is
    lowercased for a canonical cross-engine image (the group's
    representative raw casing is hash-luck; its lowercase is not).

    Scale: collation-aware grouping hashes the collation key directly —
    one shuffle, same shape as any groupBy; no per-row lower() copies
    of the column needed downstream, and joins/sorts on the column
    inherit the semantics without re-wrapping every reference.
    """
    ev = load_table(spark, sf_dir, "events")
    noisy = ev.select(
        F.when(F.col("event_id") % 2 == 0, F.upper("event_type"))
        .otherwise(F.col("event_type"))
        .alias("raw_type"),
        "user_id",
    )
    collated = noisy.select(
        F.expr("raw_type COLLATE UTF8_LCASE").alias("ctype"), "user_id"
    )
    return (
        collated.groupBy("ctype")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.lower(F.col("ctype")).cast("string").alias("event_class"),
            "n",
            "n_users",
        )
    )


# ---------------------------------------------------------------------------
# F13 — from_xml column function (Spark 4): schema-directed parse of an
# XML STRING COLUMN (s2 covers the file-level XML format; this is the
# per-row parser for XML payloads embedded in another feed).
# ---------------------------------------------------------------------------

_F13_ORACLE = """
SELECT n_nationkey AS nation_key,
       n_name AS nation_name,
       CAST(n_regionkey * 100 + n_nationkey AS BIGINT) AS routing_code
FROM nation
"""


@register("f13_from_xml", oracle=_F13_ORACLE, tags=("S2", "F7", "F8"))
def f13_from_xml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Roundtrip through an XML payload column: each nation serializes
    to an XML fragment (element per field), ``from_xml`` parses it back
    against a declared schema, and the typed fields — including an
    arithmetic check on the parsed integers — must equal the original
    table (the oracle never sees XML).

    Scale: from_xml is a per-row JVM projection (a streaming pull
    parser per value) — map-side, no shuffle; schema declaration means
    no inference pass, same rule as every other source in the repo.
    """
    nation = load_table(spark, sf_dir, "nation")
    xml = F.concat(
        F.lit("<nation><key>"),
        F.col("n_nationkey").cast("string"),
        F.lit("</key><name>"),
        F.col("n_name"),
        F.lit("</name><reg>"),
        F.col("n_regionkey").cast("string"),
        F.lit("</reg></nation>"),
    )
    parsed = nation.select(
        F.from_xml(xml, "key BIGINT, name STRING, reg BIGINT").alias("x")
    )
    return parsed.select(
        F.col("x.key").alias("nation_key"),
        F.col("x.name").alias("nation_name"),
        (F.col("x.reg") * 100 + F.col("x.key")).cast("long").alias("routing_code"),
    )


# ---------------------------------------------------------------------------
# F14 — ANSI-safe arithmetic (try_divide / try_cast): Spark 4 runs with
# spark.sql.ansi.enabled=true, where 1/0 and bad casts THROW — the
# try_* family is the per-expression opt-out that degrades to NULL
# instead of killing a 10-hour job on one malformed row.
# ---------------------------------------------------------------------------

_F14_ORACLE = """
WITH t AS (
  SELECT l_returnflag,
         l_extendedprice / NULLIF(l_quantity - 30, 0) AS ratio,
         try_cast(CASE WHEN l_quantity < 10 THEN CAST(CAST(l_quantity AS BIGINT) AS VARCHAR)
                       ELSE l_returnflag END AS BIGINT) AS parsed
  FROM lineitem
)
SELECT l_returnflag,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(*) - COUNT(ratio) AS BIGINT) AS n_div_by_zero,
       ROUND(MIN(ratio), 6) AS min_ratio,
       ROUND(MAX(ratio), 6) AS max_ratio,
       CAST(COUNT(parsed) AS BIGINT) AS n_parsed,
       CAST(SUM(parsed) AS BIGINT) AS parsed_sum
FROM t GROUP BY l_returnflag
"""


@register("f14_try_arithmetic", oracle=_F14_ORACLE, tags=("F8", "F4"))
def f14_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide over a deliberately-zeroed denominator (quantity 30 →
    NULL, counted per flag) and try_cast over a mixed digits-or-letters
    string (letters → NULL, digits parse and sum). Min/max of the
    surviving ratios round to 6 dp on both engines; the oracle spells
    the same semantics with NULLIF and DuckDB's try_cast.

    Scale: pure map-side projections + one low-cardinality agg;
    `spread` (on just the three needed columns) parallelizes the
    try_cast battery past the fixture's single-row-group scan
    (6.2 → ~0.6 s at sf0.1, optimization r12). The
    operational point: under ANSI mode these are the ONLY safe spellings
    for data you don't control — a plain divide or cast is a job-killer
    on row one of bad input, and a silent LEGACY-mode cast is worse.
    """
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            "l_returnflag", "l_extendedprice", "l_quantity"
        )
    )
    ratio = F.try_divide(F.col("l_extendedprice"), F.col("l_quantity") - 30)
    parsed = (
        F.when(
            F.col("l_quantity") < 10,
            F.col("l_quantity").cast("long").cast("string"),
        )
        .otherwise(F.col("l_returnflag"))
        .try_cast("long")
    )
    return (
        li.select("l_returnflag", ratio.alias("ratio"), parsed.alias("parsed"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            (F.count("*") - F.count("ratio")).alias("n_div_by_zero"),
            F.round(F.min("ratio"), 6).alias("min_ratio"),
            F.round(F.max("ratio"), 6).alias("max_ratio"),
            F.count("parsed").alias("n_parsed"),
            F.sum("parsed").alias("parsed_sum"),
        )
    )


# ---------------------------------------------------------------------------
# f15 — calendar arithmetic battery (F3 deep cut): quarter truncation,
# month addition with end-of-month clamping, last_day, ISO weekday,
# day spans. Everything lands as integers/timestamps so the grade is
# exact; Spark↔DuckDB weekday numbering is reconciled explicitly
# (Spark weekday() is 0=Monday; DuckDB isodow is 1=Monday).
# ---------------------------------------------------------------------------

_F15_ORACLE = """
SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS q_start,
       CAST(date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH
            AS TIMESTAMP) AS next_q_start,
       CAST(date_diff('day', date_trunc('quarter', o_orderdate),
                      date_trunc('quarter', o_orderdate) + INTERVAL 3 MONTH)
            AS BIGINT) AS days_in_quarter,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN isodow(o_orderdate) >= 6 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_weekend,
       CAST(SUM(CASE WHEN o_orderdate = CAST(last_day(CAST(o_orderdate AS DATE))
                                             AS TIMESTAMP)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_month_end
FROM orders
GROUP BY 1, 2, 3
"""


@register("f15_date_arithmetic", oracle=_F15_ORACLE, tags=("F3", "A7", "F8"))
def f15_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per order-quarter calendar profile: quarter start, next quarter
    start via month addition (add_months clamps to month end exactly
    like DuckDB's +INTERVAL — both calendars are proleptic Gregorian),
    the day length of the quarter (90/91/92 — a datediff over the
    derived bounds), and weekend / month-end order counts. Weekday
    parity: Spark's weekday() is 0-based Monday, DuckDB's isodow is
    1-based Monday — the +1 shift is reconciled here, not left to
    luck.

    Scale: every derived field is a scan-projection expression; the
    aggregate has one low-cardinality shuffle on the quarter key with
    map-side partials. Calendar functions are pure per-row JVM
    intrinsics — no UDF, no timezone service calls (session is UTC;
    the column is timezone-naive).
    """
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate")
    q_start = F.date_trunc("quarter", od)
    return (
        orders.select(
            q_start.alias("q_start"),
            F.add_months(q_start.cast("date"), 3).cast("timestamp_ntz").alias("next_q_start"),
            F.datediff(
                F.add_months(q_start.cast("date"), 3), q_start.cast("date")
            ).cast("long").alias("days_in_quarter"),
            (F.weekday(od) + 1 >= 6).cast("int").alias("is_weekend"),
            (od.cast("date") == F.last_day(od.cast("date")))
            .cast("int")
            .alias("is_month_end"),
        )
        .groupBy("q_start", "next_q_start", "days_in_quarter")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("is_weekend").cast("long").alias("n_weekend"),
            F.sum("is_month_end").cast("long").alias("n_month_end"),
        )
    )


# ---------------------------------------------------------------------------
# f16 — bitwise battery (F4/F8 deep cut): bitwise AND/OR/XOR
# aggregates, population counts, shifts, and masks — the flag-word
# and bitmap manipulations an encoding layer needs. All integers →
# exact grade.
# ---------------------------------------------------------------------------

_F16_ORACLE = """
SELECT event_type,
       bit_and(user_id) AS uid_and,
       bit_or(user_id) AS uid_or,
       bit_xor(event_id) AS eid_xor,
       CAST(SUM(bit_count(event_id)) AS BIGINT) AS total_popcount,
       bit_xor((event_id << 2) | (user_id & 3)) AS shift_checksum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
"""


@register("f16_bitwise", oracle=_F16_ORACLE, tags=("F4", "F8", "A1"))
def f16_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: bitwise AND/OR of user ids, XOR-fold of event
    ids (an order-insensitive content checksum — XOR is commutative,
    so the fold is partition-order-proof by algebra, unlike a double
    SUM), total set-bit population of the id space, and a shifted
    mask checksum ((id << 2) | (uid & 3)). Bitwise aggregates are the
    engine surface behind bitmap indexes, permission masks, and
    feature-flag rollups.

    Scale: single partial-aggregated groupBy — every bitwise aggregate
    carries ONE 64-bit accumulator per group per partition (same cost
    class as MAX), and all of them merge associatively, so map-side
    combine does almost all the work. Pure JVM intrinsics, no UDF.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.bit_and("user_id").alias("uid_and"),
        F.bit_or("user_id").alias("uid_or"),
        F.bit_xor("event_id").alias("eid_xor"),
        F.sum(F.bit_count("event_id")).cast("bigint").alias("total_popcount"),
        F.bit_xor(
            F.shiftleft(F.col("event_id"), 2).bitwiseOR(
                F.col("user_id").bitwiseAND(F.lit(3))
            )
        ).alias("shift_checksum"),
        F.count("*").alias("n"),
    )


# ---------------------------------------------------------------------------
# f17 — struct surgery: build a nested struct, update a nested field
# with withField, prune with dropFields — the Column-level nested
# mutators (no explode/rebuild round-trip), graded on the extracted
# scalars.
# ---------------------------------------------------------------------------

_F17_ORACLE = """
SELECT o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) + 500 AS adj_cents,
       upper(o_orderpriority) AS priority,
       CAST(year(o_orderdate) AS BIGINT) AS order_year
FROM orders
WHERE o_orderkey < 1000
"""


@register("f17_struct_surgery", oracle=_F17_ORACLE, tags=("F5", "F8", "P1"))
def f17_struct_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-struct mutation without rebuild: orders pack into a
    struct, ``withField`` patches one nested leaf in place (a +5.00
    fee on the cents amount), a second ``withField`` adds a derived
    leaf, ``dropFields`` removes the scratch field, and the grade
    extracts the surviving leaves as scalars. This is the API that
    makes deep-schema pipelines writable — the alternative is
    exploding and re-nesting the whole document per touch-up (n1's
    machinery, for one field).

    Scale: pure projection — Catalyst collapses chained
    withField/dropFields on the same struct into a single
    UpdateFields expression, so the nested rewrite costs one pass no
    matter how many patches stack.
    """
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    doc = orders.select(
        "o_orderkey",
        F.struct(
            F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderdate").alias("odate"),
            F.lit("scratch").alias("tmp"),
        ).alias("doc"),
    )
    patched = doc.withColumn(
        "doc", F.col("doc").withField("cents", F.col("doc.cents") + 500)
    ).withColumn(
        "doc", F.col("doc").withField("priority", F.upper(F.col("doc.priority")))
    ).withColumn(
        "doc",
        F.col("doc").withField("order_year", F.year(F.col("doc.odate")).cast("long")),
    ).withColumn("doc", F.col("doc").dropFields("tmp", "odate"))
    return patched.select(
        "o_orderkey",
        F.col("doc.cents").alias("adj_cents"),
        F.col("doc.priority").alias("priority"),
        F.col("doc.order_year").alias("order_year"),
    )


# ---------------------------------------------------------------------------
# f18 — parameterized SQL: named :placeholders bound server-side
# (spark.sql(query, args=...)) — the injection-safe templating surface;
# string-concatenated SQL is the anti-pattern this replaces.
# ---------------------------------------------------------------------------

_F18_ORACLE = """
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_totalprice >= 50000 AND o_orderstatus = 'F'
GROUP BY o_orderpriority
"""


@register("f18_parameterized_sql", oracle=_F18_ORACLE, tags=("F8", "A1", "P2"))
def f18_parameterized_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL: the threshold and status arrive as
    ``args={"min_total": ..., "status": ...}`` bound to ``:min_total``
    / ``:status`` placeholders — typed literal substitution in the
    PARSER, not string formatting, so a value can never re-shape the
    query (the SQL-injection class disappears) and plans cache across
    parameter values. Graded against the constant-folded equivalent.

    Scale: parameter binding is plan-time; the executed plan is the
    ordinary pushed-down scan + partial agg — placeholders leave no
    runtime residue (the filter shows the literal in the scan's
    PushedFilters exactly as if hand-written).
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("f18_orders")
    return spark.sql(
        """
        SELECT o_orderpriority,
               COUNT(*) AS n,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
        FROM f18_orders
        WHERE o_totalprice >= :min_total AND o_orderstatus = :status
        GROUP BY o_orderpriority
        """,
        args={"min_total": 50000, "status": "F"},
    )


# ---------------------------------------------------------------------------
# f20 — presence bitmap: each user's active January days packed into
# ONE BIGINT by bit_or of shifted bits — the roaring-bitmap primitive
# (set membership as bits) that replaces a count-distinct with a
# popcount and set algebra with AND/OR.
# ---------------------------------------------------------------------------

_F20_ORACLE = """
SELECT user_id,
       bit_or(CAST(1 AS BIGINT) << (CAST(day(ts) AS INT) - 1)) AS day_bitmap,
       CAST(bit_count(bit_or(CAST(1 AS BIGINT) << (CAST(day(ts) AS INT) - 1)))
            AS BIGINT) AS n_active_days,
       CAST(MIN(day(ts)) AS BIGINT) AS first_day,
       CAST(MAX(day(ts)) AS BIGINT) AS last_day
FROM events
GROUP BY user_id
"""


@register("f20_presence_bitmap", oracle=_F20_ORACLE, tags=("F4", "A3", "A1"))
def f20_presence_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-month activity bitmap per user: bit (d−1) set iff the
    user had any event on day d, built by a single ``bit_or`` of
    shifted ones — popcount recovers the distinct-active-days count
    with NO count-distinct machinery, and cohort intersections become
    bitwise ANDs of two BIGINTs. Exact integers throughout (the
    fixture spans one month, so 31 bits suffice; a year needs a
    6-word array or day-offset keying — same algebra).

    Scale: bit_or carries ONE 64-bit accumulator per (user, partition)
    and merges associatively — the cheapest possible distinct-days
    rollup; bitmaps for different periods OR together mergeably like
    every sketch in the a4 family. This is the primitive under bitmap
    indexes and retention matrices.
    """
    ev = load_table(spark, sf_dir, "events")
    # the Python shiftleft() only takes a literal count; the SQL form
    # accepts a column expression.
    bit = F.expr("shiftleft(CAST(1 AS BIGINT), day(ts) - 1)")
    return ev.groupBy("user_id").agg(
        F.bit_or(bit).alias("day_bitmap"),
        F.bit_count(F.bit_or(bit)).cast("long").alias("n_active_days"),
        F.min(F.dayofmonth("ts")).cast("long").alias("first_day"),
        F.max(F.dayofmonth("ts")).cast("long").alias("last_day"),
    )


# ---------------------------------------------------------------------------
# F6b — map SURGERY battery (round 4: second F6 carrier): value
# transform, predicate filter, and concat-with-new-entry over a per-row
# map, each read back out as a scalar the driver can hash.
# ---------------------------------------------------------------------------

_F6B_ORACLE = """
SELECT doc_id,
       upper(lang) AS lang_upper,
       CAST(
         (CASE WHEN length(upper(lang)) > 4 THEN 1 ELSE 0 END)
         + (CASE WHEN length(upper(source)) > 4 THEN 1 ELSE 0 END)
       AS INT) AS n_long_vals,
       CAST(n_chars AS VARCHAR) AS chars_str,
       3 AS n_keys
FROM documents
WHERE doc_id < 200
"""


@register("f6b_map_surgery", oracle=_F6B_ORACLE, tags=("F6",))
def f6b_map_surgery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed tag surgery: uppercase every value (transform_values),
    count the entries surviving a value-length predicate (map_filter),
    and graft a computed entry on (map_concat) — f6 proves map
    construction/lookup; this grades the three mutation HOFs, with the
    oracle re-deriving each result from the flat columns.

    Scale: all three are per-row JVM expressions inside whole-stage
    codegen — no shuffle, no Python.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    tags = F.create_map(
        F.lit("lang"), F.col("lang"), F.lit("source"), F.col("source")
    )
    up = F.transform_values(tags, lambda k, v: F.upper(v))
    kept = F.map_filter(up, lambda k, v: F.length(v) > 4)
    merged = F.map_concat(
        up, F.create_map(F.lit("chars"), F.col("n_chars").cast("string"))
    )
    return d.select(
        "doc_id",
        F.element_at(up, "lang").alias("lang_upper"),
        F.size(kept).alias("n_long_vals"),
        F.element_at(merged, "chars").alias("chars_str"),
        F.size(merged).alias("n_keys"),
    )


# ---------------------------------------------------------------------------
# F2b — regexp_extract_all battery (round 4): the ALL-matches form of
# the F2 regex surface (p4/f2 grade single extracts); per document,
# every '-ing' word is pulled, counted, deduped, and the first three
# are re-joined — array results reduced to hashable scalars.
# ---------------------------------------------------------------------------

_F22_ORACLE = """
WITH m AS (
  SELECT doc_id,
         regexp_extract_all(text, '([a-z]+ing)\\b', 1) AS hits
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       CAST(len(hits) AS INT) AS n_matches,
       CAST(len(list_distinct(hits)) AS INT) AS n_distinct,
       COALESCE(array_to_string(hits[1:3], ','), '') AS first3
FROM m
"""


@register("f22_regexp_extract_all", oracle=_F22_ORACLE, tags=("F2", "F5", "P4"))
def f22_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all``: every gerund-shaped token per document,
    with the match count, distinct-match count, and the first three
    matches re-joined (document order — both engines scan
    left-to-right, so the arrays align element-for-element). The
    single-capture-group form keeps Spark and DuckDB (RE2) semantics
    identical; no backreferences (the RE2 gotcha). Zero-match docs
    normalize to '' on both sides (DuckDB's empty-slice join is NULL,
    Spark's is '' — coalesced in the oracle).

    Scale: per-row JVM regex inside codegen — no shuffle; the arrays
    collapse to scalars in the same projection, so nothing wide
    crosses an exchange.
    """
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    hits = F.regexp_extract_all(F.col("text"), F.lit(r"([a-z]+ing)\b"), 1)
    return d.select(
        "doc_id",
        F.size(hits).alias("n_matches"),
        F.size(F.array_distinct(hits)).alias("n_distinct"),
        F.array_join(F.slice(hits, 1, 3), ",").alias("first3"),
    )


# ---------------------------------------------------------------------------
# F6 twin (round-5 rotation; f6/f6b graded): map CONSTRUCTION FROM
# AGGREGATED ROWS — map_from_entries over a collected struct list, then
# typed extraction. f6 builds literal maps, f6b mutates them; this
# round-trips grouped data through a map column, the shape a
# feature-store export uses.
# ---------------------------------------------------------------------------

_F6C_ORACLE = """
SELECT l_orderkey,
       CAST(COUNT(DISTINCT l_linenumber) AS INT) AS n_lines,
       CAST(MAX(l_linenumber) AS INT) AS max_line,
       CAST(SUM(CASE WHEN l_linenumber = 1
                     THEN CAST(round(l_extendedprice * 100) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS line1_cents
FROM lineitem
WHERE l_orderkey < 400
GROUP BY l_orderkey
"""


@register("f6c_map_from_entries", oracle=_F6C_ORACLE, tags=("F6", "A8"))
def f6c_map_from_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-order line map: pre-aggregate price cents PER LINE NUMBER
    (the fixture does NOT enforce (orderkey, linenumber) uniqueness —
    measured 11.8k duplicate pairs at sf0.01 — so the inner groupBy is
    what makes the map keys unique; map_from_entries raises on
    duplicates under ANSI), build a real MapType column, then answer
    everything FROM the map — entry count (size = distinct line
    numbers), max key (array_max ∘ map_keys), and a typed point lookup
    (element_at of line 1). The oracle recomputes each answer from the
    flat rows, so the construction/extraction pair must be lossless.
    Line 1 exists for every fixture order, so the coalesce fallback is
    a null-safety guard, not a data path.

    Scale: two hash aggregations, but the second reuses the first's
    (orderkey, linenumber) hash partitioning modulo key prefix — one
    real shuffle on orderkey; the map lives only inside the aggregated
    row, O(lines-per-order) entries, never a cross-row blowup.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 400)
    per_line = li.groupBy("l_orderkey", "l_linenumber").agg(
        F.sum(cents("l_extendedprice")).alias("line_cents")
    )
    entries = F.map_from_entries(
        F.collect_list(
            F.struct(
                F.col("l_linenumber").alias("k"),
                F.col("line_cents").alias("v"),
            )
        )
    )
    per_order = per_line.groupBy("l_orderkey").agg(entries.alias("line_map"))
    return per_order.select(
        "l_orderkey",
        F.size("line_map").alias("n_lines"),
        F.array_max(F.map_keys("line_map")).cast("int").alias("max_line"),
        F.coalesce(
            F.element_at("line_map", F.lit(1)), F.lit(0).cast("bigint")
        ).alias("line1_cents"),
    )


# ---------------------------------------------------------------------------
# F1/F8 — cryptographic-hash / encoding battery: md5, sha-256, base64,
# hex — the content-addressing functions a dedup/lineage pipeline keys
# on (exact dedup at 100 TB hashes, never compares, the text).
# ---------------------------------------------------------------------------

_F23_ORACLE = """
SELECT doc_id,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       CAST(length(to_base64(encode(text))) AS INT) AS b64_len,
       substring(to_base64(encode(text)), 1, 16) AS b64_head,
       hex(encode(substring(text, 1, 4))) AS hex8
FROM documents
WHERE doc_id < 300
"""


@register("f23_hash_encode_battery", oracle=_F23_ORACLE, tags=("F1", "F8", "L1"))
def f23_hash_encode_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressing battery over document text: md5 and sha-256
    hex digests (the dedup/lineage keys), base64 transport encoding
    (length + head — the full string would bloat the grade), and the
    hex dump of the first four bytes. Every output is definitional —
    two engines agreeing means byte-identical UTF-8 encoding, digest
    implementations, and RFC 4648 alphabets end to end.

    Scale: pure map-side projections in whole-stage codegen; hashing
    IS the scalable way to dedup/fingerprint at 100 TB (l1's
    hash-groupBy keys on exactly these digests).

    Interop note (measured): Spark's ``base64`` emits MIME-chunked
    output — a CRLF every 76 chars — while DuckDB's ``to_base64`` is
    unchunked RFC 4648; the CRLFs strip to the canonical form here,
    which is also what any cross-system consumer should do.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    payload = F.encode(F.col("text"), "utf-8")
    b64 = F.regexp_replace(F.base64(payload), "\r\n", "")
    return docs.select(
        "doc_id",
        F.md5(payload).alias("md5_hex"),
        F.sha2(payload, 256).alias("sha256_hex"),
        F.length(b64).cast("int").alias("b64_len"),
        F.substring(b64, 1, 16).alias("b64_head"),
        F.hex(F.encode(F.substring("text", 1, 4), "utf-8")).alias("hex8"),
    )


# ---------------------------------------------------------------------------
# F2/F1 — URL parsing battery: Spark's dedicated parse_url() against a
# hand-derived decomposition of the same synthesized URLs — the
# log-analytics staple (l4_url_normalize regex-canonicalizes; this
# grades the STRUCTURED extractor: host, path, query parameter).
# ---------------------------------------------------------------------------

_F24_ORACLE = """
WITH u AS (
  SELECT c_custkey,
         'https://shop' || CAST(c_nationkey AS VARCHAR)
           || '.example.com/seg/' || lower(c_mktsegment)
           || '/item?cust=' || CAST(c_custkey AS VARCHAR)
           || '&ref=mail' AS url
  FROM customer
)
SELECT c_custkey,
       regexp_extract(url, '^https://([^/]+)/', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, '[?&]cust=([^&]*)', 1) AS cust_param,
       CAST(regexp_extract(url, '[?&]cust=([^&]*)', 1) AS BIGINT) AS cust_id
FROM u
"""


@register("f24_parse_url_battery", oracle=_F24_ORACLE, tags=("F2", "F1", "L4"))
def f24_parse_url_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url() extraction — HOST, PATH, and a named QUERY
    parameter — over URLs synthesized from the customer table, graded
    against DuckDB's regex decomposition of the identical strings: two
    unrelated implementations (a structured RFC parser vs hand
    regexes) must agree byte-for-byte, including the typed cast of
    the extracted parameter.

    Scale: per-row JVM parsing in codegen — the clickstream-ETL hot
    path; the structured form survives edge cases (encoded '&', port
    suffixes) that ad-hoc regexes rot on, which is why the graded
    recipe is parse_url and the regexes live in the oracle.
    """
    cust = load_table(spark, sf_dir, "customer")
    url = F.concat(
        F.lit("https://shop"),
        F.col("c_nationkey").cast("string"),
        F.lit(".example.com/seg/"),
        F.lower("c_mktsegment"),
        F.lit("/item?cust="),
        F.col("c_custkey").cast("string"),
        F.lit("&ref=mail"),
    )
    u = cust.select("c_custkey", url.alias("url"))
    return u.select(
        "c_custkey",
        F.parse_url("url", F.lit("HOST")).alias("host"),
        F.parse_url("url", F.lit("PATH")).alias("path"),
        F.parse_url("url", F.lit("QUERY"), F.lit("cust")).alias("cust_param"),
        F.parse_url("url", F.lit("QUERY"), F.lit("cust"))
        .cast("bigint")
        .alias("cust_id"),
    )


# ---------------------------------------------------------------------------
# f25 — edit-distance battery (round 5+): levenshtein in both its
# plain and thresholded forms over part-name pairs. The thresholded
# variant (Spark 4: ``levenshtein(l, r, k)`` returns -1 past k) is the
# form entity resolution actually ships — the DP matrix computation
# band-limits to O(k·len) instead of O(len²), which at 100 TB of
# name-pair candidates is the difference between feasible and not.
# ---------------------------------------------------------------------------

_F25_ORACLE = """
WITH p AS (
  SELECT p_partkey, p_name FROM part WHERE p_partkey % 100 < 4),
pairs AS (
  SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
         a.p_name AS name_a, b.p_name AS name_b
  FROM p a JOIN p b ON a.p_partkey < b.p_partkey),
d AS (
  SELECT key_a, key_b,
         CAST(levenshtein(name_a, name_b) AS BIGINT) AS dist
  FROM pairs)
SELECT dist_band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(MIN(dist) AS BIGINT) AS min_dist,
       CAST(MAX(dist) AS BIGINT) AS max_dist,
       CAST(SUM(capped) AS BIGINT) AS capped_sum
FROM (
  SELECT CAST(LEAST(dist // 8, 4) AS INT) AS dist_band, dist,
         CASE WHEN dist <= 12 THEN dist ELSE -1 END AS capped
  FROM d)
GROUP BY dist_band
"""


@register("f25_edit_distance_battery", oracle=_F25_ORACLE, tags=("F1", "J8", "A1"))
def f25_edit_distance_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise levenshtein over a 4 % systematic sample of part names
    (deterministic ``partkey % 100 < 4`` — both engines pick identical
    rows), banded into distance classes, with the THRESHOLDED form
    ``levenshtein(a, b, 12)`` cross-checked against DuckDB's CASE
    emulation: Spark returns -1 beyond the threshold, the oracle
    computes the same -1 from the unbounded distance. A divergence in
    either implementation's DP recurrence breaks the band histogram.

    Scale: the thresholded call is the point — band-limited DP costs
    O(k·len) per pair, and real blocking (j9's sorted-prefix buckets)
    bounds the pair count; the sample keeps this battery's all-pairs
    form honest at fixture scale (~6k pairs at sf0.01) while the
    banded rollup output stays O(5) rows at any scale.
    """
    part = load_table(spark, sf_dir, "part")
    p = part.filter(F.col("p_partkey") % 100 < 4).select(
        "p_partkey", "p_name"
    )
    a, b = p.alias("a"), p.alias("b")
    pairs = a.join(
        b, F.col("a.p_partkey") < F.col("b.p_partkey")
    ).select(
        F.col("a.p_name").alias("name_a"),
        F.col("b.p_name").alias("name_b"),
    )
    d = pairs.select(
        F.levenshtein("name_a", "name_b").cast("long").alias("dist"),
        F.levenshtein("name_a", "name_b", 12).cast("long").alias("capped"),
    )
    return (
        d.select(
            F.least(F.expr("dist div 8"), F.lit(4)).cast("int").alias(
                "dist_band"
            ),
            "dist",
            "capped",
        )
        .groupBy("dist_band")
        .agg(
            F.count("*").alias("n_pairs"),
            F.min("dist").alias("min_dist"),
            F.max("dist").alias("max_dist"),
            F.sum("capped").cast("long").alias("capped_sum"),
        )
    )


# ---------------------------------------------------------------------------
# f26 — try_* battery (round 5+): the ANSI-mode safety valves. Under
# ANSI SQL a bad cast / division-by-zero / out-of-bounds index THROWS
# (the f8/f14 contract); the try_* family returns NULL instead — the
# form ingestion pipelines must use when the data, not the query, is
# untrusted. Mixed parseable/garbage strings are derived from part
# rows deterministically; the battery counts survivors per class.
# ---------------------------------------------------------------------------

_F26_ORACLE = """
WITH c AS (
  SELECT p_partkey % 3 AS parse_class,
         CASE p_partkey % 3
           WHEN 0 THEN CAST(p_size AS VARCHAR)
           WHEN 1 THEN p_name
           ELSE '1995-0' || CAST(p_size % 9 + 1 AS VARCHAR) || '-15'
         END AS s,
         p_size
  FROM part)
SELECT CAST(parse_class AS BIGINT) AS parse_class,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(TRY_CAST(s AS INTEGER)) AS BIGINT) AS n_int_ok,
       CAST(SUM(COALESCE(TRY_CAST(s AS INTEGER), 0)) AS BIGINT) AS int_sum,
       CAST(COUNT(TRY_CAST(s AS TIMESTAMP)) AS BIGINT) AS n_ts_ok,
       CAST(COUNT(CASE WHEN p_size <> 25
                       THEN 100.0 / (p_size - 25) END) AS BIGINT)
         AS n_div_ok,
       CAST(COUNT(CASE WHEN p_size <= 2 THEN 'x' END) AS BIGINT)
         AS n_elem_ok
FROM c GROUP BY 1
"""


@register("f26_try_battery", oracle=_F26_ORACLE, tags=("F8", "P2", "A1"))
def f26_try_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivor census for the try_* family over deterministic mixed
    input (class 0: integer strings, class 1: part-name garbage,
    class 2: ISO dates): ``try_cast`` to INT and TIMESTAMP,
    ``try_divide`` with a zero-hitting denominator, and
    ``try_element_at`` past the array bound — every one returns NULL
    where ANSI mode would throw, and the oracle reproduces each NULL
    with explicit CASE guards (DuckDB's TRY_CAST for the casts). The
    int survivors also checksum their parsed sum.

    Scale: pure map-side projections + one rollup on 3 classes; the
    point is semantic (ANSI-safe ingestion never aborts a 100 TB job
    over one malformed cell — it quarantines NULLs the dq suite then
    counts).
    """
    part = load_table(spark, sf_dir, "part")
    s = (
        F.when(
            F.col("p_partkey") % 3 == 0, F.col("p_size").cast("string")
        )
        .when(F.col("p_partkey") % 3 == 1, F.col("p_name"))
        .otherwise(
            F.concat(
                F.lit("1995-0"),
                (F.col("p_size") % 9 + 1).cast("string"),
                F.lit("-15"),
            )
        )
    )
    c = part.select(
        (F.col("p_partkey") % 3).alias("parse_class"),
        s.alias("s"),
        "p_size",
    )
    as_int = F.expr("try_cast(s AS INT)")
    as_ts = F.try_to_timestamp(F.col("s"))
    div = F.try_divide(F.lit(100.0), F.col("p_size") - 25)
    elem = F.try_element_at(
        F.array(F.lit("x"), F.lit("y")), F.col("p_size")
    )
    return c.groupBy("parse_class").agg(
        F.count("*").alias("n_rows"),
        F.count(as_int).alias("n_int_ok"),
        F.sum(F.coalesce(as_int, F.lit(0))).cast("long").alias("int_sum"),
        F.count(as_ts).alias("n_ts_ok"),
        F.count(div).alias("n_div_ok"),
        F.count(elem).alias("n_elem_ok"),
    )


# ---------------------------------------------------------------------------
# ROUND-8 F9 twin (f9 formula battery, f9c fixed-hub argmin routing,
# f9d bbox+grid density, j6/j13/d3 spatial joins/curves — every F9
# carrier graded). The angle: DIRECTIONAL analytics — quadrant
# classification is pure sign algebra on exact quarter-degree deltas
# (no trig at all), and the haversine ring bucket reuses f9c's
# integer-metre rounding so the bucket edge is integer math.
# ---------------------------------------------------------------------------

_F27_ORACLE = """
WITH pts AS (
  SELECT c_custkey,
         ((c_custkey * 7) % 161) * CAST(0.25 AS DOUBLE) - CAST(20.0 AS DOUBLE) AS lat,
         ((c_custkey * 13) % 289) * CAST(0.25 AS DOUBLE) - CAST(36.125 AS DOUBLE) AS lon
  FROM customer
), m AS (
  SELECT c_custkey, lat, lon,
         CASE WHEN lat >= 10.25 THEN 'N' ELSE 'S' END ||
         CASE WHEN lon >= -2.5 THEN 'E' ELSE 'W' END AS quadrant,
         CAST(round(2 * 6371000.0 * asin(sqrt(
             sin(radians(10.25 - lat) / 2) * sin(radians(10.25 - lat) / 2)
             + cos(radians(lat)) * cos(radians(10.25))
               * sin(radians(-2.5 - lon) / 2) * sin(radians(-2.5 - lon) / 2)
         ))) AS BIGINT) AS dist_m
  FROM pts
)
SELECT quadrant,
       dist_m // 500000 AS ring,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(SUM(dist_m) AS BIGINT) AS total_m,
       CAST(MIN(dist_m) AS BIGINT) AS nearest_m
FROM m
GROUP BY 1, 2
"""


@register("f27_quadrant_ring_density", oracle=_F27_ORACLE, tags=("F9", "A7"))
def f27_quadrant_ring_density(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional density map around an anchor: each synthetic
    customer point lands in a compass quadrant (pure sign comparisons
    on exact quarter-degree coordinates — no trig in the CLASSIFIER)
    and a 500 km great-circle ring (haversine_m rounded to integer
    metres BEFORE the integer floor-division bucket, f9c's recipe, so
    the bucket edges are exact on both engines); per (quadrant, ring):
    density, exact BIGINT metre total, nearest approach.

    Scale: map-only expression work into an O(4·rings)-key rollup —
    one tiny shuffle; the quadrant/ring pair is the natural spatial
    shuffle key for any downstream per-sector join.
    """
    anchor_lat, anchor_lon = 10.25, -2.5
    cust = load_table(spark, sf_dir, "customer")
    pts = cust.select(
        (((F.col("c_custkey") * 7) % 161) * F.lit(0.25) - F.lit(20.0)).alias("lat"),
        (((F.col("c_custkey") * 13) % 289) * F.lit(0.25) - F.lit(36.125)).alias(
            "lon"
        ),
    )
    quadrant = F.concat(
        F.when(F.col("lat") >= anchor_lat, F.lit("N")).otherwise(F.lit("S")),
        F.when(F.col("lon") >= anchor_lon, F.lit("E")).otherwise(F.lit("W")),
    )
    dist_m = F.round(
        haversine_m(
            F.col("lat"), F.col("lon"), F.lit(anchor_lat), F.lit(anchor_lon)
        )
    ).cast("bigint")
    return (
        pts.select(quadrant.alias("quadrant"), dist_m.alias("dist_m"))
        .groupBy("quadrant", (F.expr("dist_m div 500000")).alias("ring"))
        .agg(
            F.count("*").alias("n_points"),
            F.sum("dist_m").alias("total_m"),
            F.min("dist_m").alias("nearest_m"),
        )
    )


# ---------------------------------------------------------------------------
# ROUND-9 F6+F7 twin (f6 construction/lookup, f6b mutation HOFs, f6c
# map_from_entries, f6d ordered algebra, p10 override dict — all
# graded; q6/f7c/f11/f13 cover the JSON surface). The remaining
# un-graded F6 surface is the two-map combinators: map_zip_with and
# transform_keys. The angle: per-user sum- and count-maps keyed by
# event type (values fed by the JSON-extracted props.k — the F7 leg),
# combined into an integer-mean map via map_zip_with and re-keyed via
# transform_keys, every readout recomputed flat by the oracle.
# ---------------------------------------------------------------------------

_F28_ORACLE = """
WITH k AS (
  SELECT user_id, event_type,
         CAST(props->>'k' AS BIGINT) AS k
  FROM events WHERE user_id < 120
), per_type AS (
  SELECT user_id, event_type,
         CAST(SUM(k) AS BIGINT) AS ksum,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM k GROUP BY user_id, event_type
)
SELECT user_id,
       CAST(COUNT(*) AS INT) AS n_types,
       CAST(SUM(ksum) AS BIGINT) AS k_total,
       COALESCE(MAX(CASE WHEN event_type = 'click' THEN ksum // n END),
                -1) AS click_mean_floor,
       COALESCE(MAX(CASE WHEN event_type = 'error' THEN n END), -1)
         AS n_errors
FROM per_type
GROUP BY user_id
"""


@register("f28_type_map_combinators", oracle=_F28_ORACLE, tags=("F6", "F7"))
def f28_type_map_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-map combinator battery: per user, a sum-map and a count-map
    keyed by event type are built with map_from_entries over
    SORT-WRAPPED collected pairs (keys unique by construction — the
    inner groupBy — and the sort satisfies the aggregate-order sweep),
    the values fed by get_json_object(props, '$.k') (F7: the typed
    JSON extraction). map_zip_with folds the two maps into an
    integer-floor mean map — both maps are keyed identically so no
    null branch fires — and transform_keys uppercases the count-map's
    keys; each readout (size, total via aggregate over map_values,
    element_at of the zipped and re-keyed maps) is recomputed FLAT by
    the oracle, so the combinators must be lossless. Missing types
    normalize to -1 on both sides (element_at → NULL → coalesce).
    Integer floor division (ksum div n ↔ DuckDB //) dodges the
    float-quotient ROUND-half tie gotcha.

    Scale: the maps live only inside aggregated per-user rows,
    O(event-types) entries each; two hash aggregates share the
    user_id shuffle (the second groups a superset key); the
    combinators are per-row JVM expressions in codegen.
    """
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 120)
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    per_type = ev.select("user_id", "event_type", k.alias("k")).groupBy(
        "user_id", "event_type"
    ).agg(F.sum("k").alias("ksum"), F.count("*").alias("n"))
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("event_type"), F.col("ksum")))
            )
        ).alias("sum_map"),
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("event_type"), F.col("n")))
            )
        ).alias("cnt_map"),
    )
    # integer floor division inside the lambda: (s - s % n) is exactly
    # divisible, so the double quotient is exact and the cast lossless
    # (ksum ≥ 0 in the fixture, so truncation == floor == DuckDB //)
    mean_map = F.map_zip_with(
        F.col("sum_map"),
        F.col("cnt_map"),
        lambda t, s, n: ((s - s % n) / n).cast("bigint"),
    )
    upper_cnt = F.transform_keys(F.col("cnt_map"), lambda t, n: F.upper(t))
    return maps.select(
        "user_id",
        F.size("sum_map").alias("n_types"),
        # SQL SUM semantics exactly: skip NULL values via coalesce, but
        # an ALL-NULL (or empty) value set yields NULL, not 0 — the
        # exists() guard mirrors that. The fixture has no NULL k today
        # (props.k is always present), so this is latent-divergence
        # proofing, the j17/ADVICE-r8 class.
        F.when(
            F.exists(F.map_values("sum_map"), lambda v: v.isNotNull()),
            F.aggregate(
                F.map_values("sum_map"),
                F.lit(0).cast("bigint"),
                lambda acc, v: acc + F.coalesce(v, F.lit(0).cast("bigint")),
            ),
        ).alias("k_total"),
        F.coalesce(
            F.element_at(mean_map, F.lit("click")), F.lit(-1).cast("bigint")
        ).alias("click_mean_floor"),
        F.coalesce(
            F.element_at(upper_cnt, F.lit("ERROR")), F.lit(-1).cast("bigint")
        ).alias("n_errors"),
    )


# ---------------------------------------------------------------------------
# ROUND-10 F6+F7+F9 twin (f28 graded the two-map combinators over JSON
# values; f9/j18 the geospatial surface alone). The angle: one
# per-user profile where each family feeds a DIFFERENT output column —
# JSON-extracted error magnitudes (F7), a type→count map consumed
# through element_at and a thresholded map_filter (F6), and a
# synthesized home point bucketed/measured with the geo battery (F9) —
# so a break localizes to its family.
# ---------------------------------------------------------------------------

_F29_ORACLE = """
WITH per_type AS (
  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n,
         SUM(CASE WHEN event_type = 'error'
                  THEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                  ELSE 0 END) AS err_k
  FROM events GROUP BY user_id, event_type
), prof AS (
  SELECT user_id,
         CAST(SUM(n) AS BIGINT) AS n_events,
         CAST(COALESCE(MAX(CASE WHEN event_type = 'click' THEN n END), -1)
              AS BIGINT) AS n_click,
         CAST(SUM(CASE WHEN n >= 20 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_heavy_types,
         CAST(SUM(err_k) AS BIGINT) AS err_k_sum
  FROM per_type GROUP BY user_id
), pts AS (
  SELECT user_id,
         (user_id % 170) * CAST(0.5 AS DOUBLE) - CAST(42.0 AS DOUBLE) AS lat,
         (user_id % 355) * CAST(0.5 AS DOUBLE) - CAST(88.0 AS DOUBLE) AS lon
  FROM prof
)
SELECT p.user_id, p.n_events, p.n_click, p.n_heavy_types, p.err_k_sum,
       CAST(floor((t.lat + 90.0) * 10.0) AS BIGINT) * 3600
         + CAST(floor((t.lon + 180.0) * 10.0) AS BIGINT) AS cell_id,
       round(2 * 6371000.0 * asin(sqrt(
           sin(radians(35.7 - t.lat) / 2) * sin(radians(35.7 - t.lat) / 2)
           + cos(radians(t.lat)) * cos(radians(35.7))
             * sin(radians(139.7 - t.lon) / 2)
             * sin(radians(139.7 - t.lon) / 2)
       )), 0) AS hav_m_tokyo,
       (t.lat BETWEEN 20.0 AND 50.0 AND t.lon BETWEEN 100.0 AND 150.0)
         AS in_asia_box
FROM prof p JOIN pts t ON p.user_id = t.user_id
"""


@register(
    "f29_user_geo_profile",
    oracle=_F29_ORACLE,
    tags=("F6", "F7", "F9"),
)
def f29_user_geo_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user profile across three function families: error-event
    magnitudes JSON-extracted from props (F7), the per-type count MAP
    consumed through element_at('click') and a size(map_filter(n≥20))
    threshold (F6 — the map never leaves the query, per the no-map-
    output driver rule), and the f9 synthesized home point's grid
    cell, great-circle distance to Tokyo (rounded to whole meters —
    libm slack), and Asia-bbox verdict (F9).

    Scale: one shuffle to (user, type), one to user; the map is
    O(event types) per user; geo math is pure codegen arithmetic —
    no Python anywhere.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    per_type = ev.select(
        "user_id",
        "event_type",
        F.when(F.col("event_type") == "error", k).otherwise(0).alias("ek"),
    ).groupBy("user_id", "event_type").agg(
        F.count("*").alias("n"), F.sum("ek").alias("err_k")
    )
    maps = per_type.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.sum("err_k").alias("err_k_sum"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "n")))
        ).alias("cnt_map"),
    )
    lat = (F.col("user_id") % 170) * 0.5 - 42.0
    lon = (F.col("user_id") % 355) * 0.5 - 88.0
    tokyo_lat, tokyo_lon = F.lit(35.7), F.lit(139.7)
    return maps.select(
        "user_id",
        "n_events",
        F.coalesce(
            F.element_at("cnt_map", F.lit("click")), F.lit(-1).cast("bigint")
        ).alias("n_click"),
        F.size(F.map_filter("cnt_map", lambda t, n: n >= 20))
        .cast("bigint")
        .alias("n_heavy_types"),
        "err_k_sum",
        grid_cell(lat, lon, 10).alias("cell_id"),
        F.round(haversine_m(lat, lon, tokyo_lat, tokyo_lon), 0).alias(
            "hav_m_tokyo"
        ),
        in_bbox(lat, lon, 20.0, 100.0, 50.0, 150.0).alias("in_asia_box"),
    )
