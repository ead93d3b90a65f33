"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

Design (SURVEY.md §5.2.2): the driver's tables are TPC-H-ish plus a FLAT
``documents`` table (doc_id:int64, text, ...) — NOT the engine's spans
schema.  So the OSM-ish attributes (street, postcode, user, kind, lat/lon)
are DERIVED deterministically from ``doc_id`` by integer arithmetic that
both Spark SQL and DuckDB evaluate identically (`_DERIVED_SQL`, one shared
text).  The Spark side of each audit query then applies the *engine
operators* (osmspark.operators.*) on that derived view; the oracle side is
plain DuckDB SQL over the same derivation.  Column names are aliased
identically on both sides.

Engine ops that are not SQL-expressible (cell indexes, minhash/simhash,
raster bytes) have no oracle entry -> driver records a rows-only check;
their real correctness gate is the pytest suite (tests/).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from osmspark.config import SQL_PROBLEMCHARS

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def _register(spark: SparkSession, sf_dir: str, tables=None) -> None:
    for t in tables or TABLES:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Shared deterministic derivation (runs verbatim on Spark SQL *and* DuckDB).
# Integer arithmetic only -> bit-identical across engines.
# ---------------------------------------------------------------------------
_STREETS = [
    "Serangoon Road", "Orchard Rd", "Tampines St", "Bedok St.",
    "Clementi Street", "Yishun Ave", "Punggol Avenue", "Sengkang Dr",
    "Holland Drive", "Thomson Blvd", "Changi Boulevard", "Geylang Ln",
    "Kallang Lane", "Marina Cres", "Beach Crescent", "River Valley Ter",
    "Mount Faber Terrace", "Keppel Walk", "Labrador Link", "Sentosa Ct",
    "Jalan Besar", "Jln Ahmad Ibrahim", "Lorong Chuan", "Lor 24 Geylang",
]

_AMENITIES = ["restaurant", "cafe", "school", "bank", "atm", "parking",
              "place_of_worship", "hospital", "fuel", "police"]

_KEYS = ["amenity", "addr:street", "addr:postcode", "name", "highway",
         "bad key", "FIXME", "addr:street:name", "name.zh", "shop"]

_CUISINES = ["chinese", "malay", "indian", "japanese", "korean", "thai",
             "italian", "seafood"]

_EN_STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def _case_pick(expr: str, values: list[str]) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(values)
    )
    return f"CASE (({expr}) % {len(values)}) {whens} END"


# one CTE chain, shared by both engines (appended before each query body)
_DERIVED_SQL = f"""
WITH base AS (
  SELECT doc_id AS d,
         ((doc_id * 7919) + 777) % 2147483647 AS h1
  FROM documents
), hashed AS (
  SELECT d, h1,
         (h1 * 48271) % 2147483647 AS h2,
         ((h1 * 48271) % 2147483647 * 16807) % 2147483647 AS h3
  FROM base
), attrs AS (
  SELECT d, h1, h2, h3,
    CASE WHEN (h1 % 100) < 60 THEN 'node'
         WHEN (h1 % 100) < 75 THEN 'way'
         WHEN (h1 % 100) < 90 THEN 'text'
         ELSE 'media' END AS kind,
    {_case_pick('d * 7 + 3', _STREETS)} AS street_raw,
    CASE WHEN (d % 20) = 0
           THEN 'S' || lpad(cast((h2 % 10000) as string), 4, '0')
         WHEN (h3 % 100) >= 95
           THEN lpad(cast(79000 + (h2 % 3000) as string), 5, '0')
         ELSE lpad(cast(h2 % 800000 as string), 6, '0') END AS pc_raw,
    CASE WHEN (h2 % 10) < 4 THEN {_case_pick('h3', _AMENITIES)}
         ELSE NULL END AS amenity,
    {_case_pick('h3 + 1', _KEYS)} AS tag_key,
    'user_' || cast(h2 % 20 as string) AS usr,
    cast(h2 % 20 as string) AS uid,
    cast((h3 % 5) + 1 as string) AS version,
    cast(h2 % 99999 as string) AS changeset,
    '2016-' || lpad(cast((h1 % 12) + 1 as string), 2, '0') || '-' ||
      lpad(cast((h2 % 28) + 1 as string), 2, '0') || 'T' ||
      lpad(cast(h3 % 24 as string), 2, '0') || ':' ||
      lpad(cast(h1 % 60 as string), 2, '0') || ':00Z' AS ts_str,
    (h3 % 34000) AS lat_u,
    (h2 % 50000) AS lon_u
  FROM hashed
), derived AS (
  SELECT d, h1, h2, h3, kind, amenity, tag_key, usr, uid, version,
         changeset, ts_str, lat_u, lon_u,
         1.13 + lat_u * 1e-5 AS lat,
         103.6 + lon_u * 1e-5 AS lon,
         CASE WHEN kind = 'node' AND (h1 % 10) < 6 THEN street_raw END AS street,
         CASE WHEN kind = 'node' AND (h1 % 10) < 6 THEN pc_raw END AS pc,
         CASE WHEN amenity IN ('restaurant', 'cafe')
              THEN {_case_pick('h2 + 5', _CUISINES)} END AS cuisine
  FROM attrs
)
"""

# street-type extraction, shared-SQL form (parity with
# osmspark.operators.audit.street_type — verified in tests/tools)
_MALAY_FORMS = "('Jalan','Lorong','Bukit','Taman','Kampong','Lengkok','Jln','Jln.','Lor','Lor.','Bt')"
_STYPE_SQL = (
    "CASE WHEN regexp_extract(street, '^([^ ]+)', 1) IN " + _MALAY_FORMS +
    " THEN regexp_extract(street, '^([^ ]+)', 1)"
    " ELSE regexp_extract(street, '([^ .]+)[.]?$', 1) END"
)


def _mapping_case(expr: str) -> str:
    from osmspark.config import STREET_TYPE_MAPPING
    whens = " ".join(
        f"WHEN '{k}' THEN '{v}'" for k, v in STREET_TYPE_MAPPING.items()
    )
    return f"CASE ({expr}) {whens} ELSE ({expr}) END"


_PC_CLASS_SQL = (
    "CASE WHEN regexp_extract(pc, '^[0-8][0-9]{5}$', 0) <> '' THEN 'valid_sg' "
    "WHEN regexp_extract(pc, '^[0-9]{5}$', 0) <> '' THEN 'out_of_area' "
    "ELSE 'invalid' END"
)

# problemchars class comes from the ONE shared constant (config.py), so the
# engine operator (audit.key_class), the pytest oracle (tests/oracle.py) and
# this shared SQL agree byte-for-byte on the reference tags.py semantics.
_KEYCLASS_SQL = (
    "CASE WHEN regexp_extract(tag_key, '^([a-z]|_)+$', 0) <> '' THEN 'lower' "
    "WHEN regexp_extract(tag_key, '^([a-z]|_)+:([a-z]|_)+$', 0) <> '' THEN 'lower_colon' "
    f"WHEN regexp_extract(tag_key, '{SQL_PROBLEMCHARS}', 0) <> '' THEN 'problemchars' "
    "ELSE 'other' END"
)

# ---------------------------------------------------------------------------
# Shared-SQL queries: the SAME text runs on spark.sql() and DuckDB.
# ---------------------------------------------------------------------------
_SHARED_SQL: dict[str, str] = {
    # A8+A9+A11 [flagship]: street-type normalization counts
    "street_norm_counts": _DERIVED_SQL + f"""
        SELECT {_mapping_case(_STYPE_SQL)} AS normalized_type,
               count(*) AS cnt
        FROM derived WHERE street IS NOT NULL
        GROUP BY 1""",
    # A9+A10: unexpected street types (scalar projections of the example set)
    "unexpected_street_types": _DERIVED_SQL + f"""
        SELECT stype, count(*) AS cnt,
               count(DISTINCT street) AS n_names,
               min(street) AS first_name, max(street) AS last_name
        FROM (SELECT street, {_STYPE_SQL} AS stype
              FROM derived WHERE street IS NOT NULL) t
        WHERE stype NOT IN ('Street','Avenue','Boulevard','Drive','Court',
          'Place','Square','Lane','Road','Trail','Parkway','Commons',
          'Crescent','Close','Terrace','Walk','Link','Park','Green','Grove',
          'Highway','Jalan','Lorong','Bukit','Taman','Kampong','Lengkok')
        GROUP BY stype""",
    # A12: postcode-validity partition
    "postcode_partition": _DERIVED_SQL + f"""
        SELECT {_PC_CLASS_SQL} AS pc_class, count(*) AS cnt
        FROM derived WHERE pc IS NOT NULL GROUP BY 1""",
    # A5: tag-key classification buckets
    "key_class_counts": _DERIVED_SQL + f"""
        SELECT {_KEYCLASS_SQL} AS bucket, count(*) AS cnt
        FROM derived GROUP BY 1""",
    # A4: element/tag-name frequency
    "element_counts": _DERIVED_SQL + """
        SELECT kind, count(*) AS cnt FROM derived GROUP BY kind""",
    # A17 analogues on the events table
    "tag_frequency_events": """
        SELECT event_type AS kind, count(*) AS cnt
        FROM events GROUP BY event_type""",
    # A6: distinct contributors
    "distinct_users": "SELECT count(DISTINCT user_id) AS n_users FROM events",
    # A18: top-k contributors (deterministic tie-break)
    "top_users": """
        SELECT user_id, count(*) AS cnt FROM events
        GROUP BY user_id ORDER BY cnt DESC, user_id ASC LIMIT 10""",
    # A19: histogram of per-user post counts
    "user_post_histogram": """
        SELECT cnt AS n_posts, count(*) AS n_users
        FROM (SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id) t
        GROUP BY cnt""",
    # A20: exists-filter + top-k
    "top_amenities": _DERIVED_SQL + """
        SELECT amenity, count(*) AS cnt FROM derived
        WHERE amenity IS NOT NULL
        GROUP BY amenity ORDER BY cnt DESC, amenity ASC LIMIT 10""",
    # A20b: composed two-tag query — "cuisines of restaurants" notebook
    # aggregation ($match amenity=restaurant -> $group cuisine [R])
    "cuisines_of_restaurants": _DERIVED_SQL + """
        SELECT cuisine, count(*) AS cnt FROM derived
        WHERE amenity = 'restaurant' AND cuisine IS NOT NULL
        GROUP BY cuisine ORDER BY cnt DESC, cuisine ASC""",
    # A2: systematic sampling (every k-th document)
    "sample_every_k": """
        SELECT count(*) AS n_sampled, min(doc_id) AS first_id,
               max(doc_id) AS last_id
        FROM documents WHERE (doc_id % 10) = 0""",
    # A13/A14: shaped `created` sub-document, flat projection
    "shape_created": _DERIVED_SQL + """
        SELECT d AS id, version, changeset, ts_str AS created_ts,
               usr, uid, lat_u, lon_u
        FROM derived WHERE kind = 'node' AND d < 500""",
    # Tier-C demo: TPC-H Q1 pricing summary (integer-stable aggregates)
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               cast(round(sum(l_quantity)) as bigint) AS sum_qty,
               cast(round(sum(l_extendedprice) * 100) as bigint) AS sum_base_price_c,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""",
    # Tier-C demo: multi-join rollup (customer -> nation -> region)
    "revenue_by_nation": """
        SELECT n.n_name AS nation, count(*) AS n_orders,
               cast(round(sum(o.o_totalprice) * 100) as bigint) AS revenue_c
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name""",
    # Tier-C demo: time rollup on the events stream table
    "events_daily": """
        SELECT cast(ts AS DATE) AS day, event_type,
               count(*) AS cnt,
               cast(round(sum(value) * 100) as bigint) AS value_c
        FROM events GROUP BY 1, 2""",
    # dedup: exact duplicate stats over document text
    "exact_dedup_stats": """
        SELECT count(*) AS n_total,
               count(DISTINCT md5(text)) AS n_unique,
               count(*) - count(DISTINCT md5(text)) AS n_dupes
        FROM documents""",
}


# ---------------------------------------------------------------------------
# Engine-backed queries (Spark side = osmspark operators; oracle = DuckDB SQL)
# ---------------------------------------------------------------------------
def _derived_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, ["documents"])
    return spark.sql(_DERIVED_SQL + "SELECT * FROM derived")


def _points_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived node points (d, lat, lon, lat_u, lon_u)."""
    return _derived_df(spark, sf_dir).filter(F.col("kind") == "node").select(
        "d", "lat", "lon", "lat_u", "lon_u"
    )


# --- B4: PIP join vs rectangle oracle --------------------------------------
# bounds end in ...005 => unreachable by derived coords (multiples of 1e-5):
# no boundary ties, so ray-cast and strict bbox SQL agree exactly.
_RECTS = []
for _i, (_la0, _la1) in enumerate([(1.135005, 1.235005), (1.235005, 1.335005),
                                   (1.335005, 1.435005)]):
    for _j, (_lo0, _lo1) in enumerate([(103.605005, 103.845005),
                                       (103.845005, 104.085005)]):
        _RECTS.append((f"rect-{_i}{_j}", _la0, _la1, _lo0, _lo1))

_RECTS_SQL_VALUES = ", ".join(
    f"('{rid}', {la0}, {la1}, {lo0}, {lo1})"
    for rid, la0, la1, lo0, lo1 in _RECTS
)


def _q_pip_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase cell-prefilter + ray-cast PIP join (osmspark B4) counted
    per polygon; the oracle is the equivalent strict-bbox SQL."""
    from osmspark.operators.spatial_join import spatial_join

    pts = _points_df(spark, sf_dir)
    rows = []
    for rid, la0, la1, lo0, lo1 in _RECTS:
        ring = [(la0, lo0), (la0, lo1), (la1, lo1), (la1, lo0), (la0, lo0)]
        rows.append((rid, "zip", [{"lat": a, "lon": o} for a, o in ring], None))
    polys = spark.createDataFrame(
        rows,
        schema="poly_id string, level string, "
               "ring array<struct<lat:double,lon:double>>, postcode string",
    )
    return (
        spatial_join(pts, polys, res=7)
        .groupBy("poly_id")
        .agg(F.count("*").alias("cnt"))
    )


_PIP_ORACLE = _DERIVED_SQL + f"""
    SELECT r.poly_id AS poly_id, count(*) AS cnt
    FROM derived d
    JOIN (VALUES {_RECTS_SQL_VALUES}) AS r(poly_id, la0, la1, lo0, lo1)
      ON d.kind = 'node'
     AND d.lat > r.la0 AND d.lat < r.la1
     AND d.lon > r.lo0 AND d.lon < r.lo1
    GROUP BY r.poly_id"""


# --- B5: kNN (k-ring operator) vs window-SQL oracle ------------------------
_KNN_QUERIES = [("q0", 1.29, 103.85), ("q1", 1.35, 103.69),
                ("q2", 1.44, 103.79), ("q3", 1.20, 104.05),
                ("q4", 1.46, 103.62)]
_KNN_SQL_VALUES = ", ".join(f"('{q}', {a}, {o})" for q, a, o in _KNN_QUERIES)


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.knn import knn_kring

    pts = _points_df(spark, sf_dir).select(
        F.col("d").cast("string").alias("id"), "lat", "lon"
    )
    qdf = spark.createDataFrame(
        _KNN_QUERIES, "query_id string, lat double, lon double"
    )
    return knn_kring(pts, qdf, k=10, res=8, metric="sq_deg").select(
        "query_id", "rank", "point_id"
    )


_KNN_ORACLE = _DERIVED_SQL + f"""
    SELECT query_id, rank, point_id FROM (
      SELECT q.query_id AS query_id,
             cast(d.d as string) AS point_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY (d.lat - q.qlat)*(d.lat - q.qlat)
                      + (d.lon - q.qlon)*(d.lon - q.qlon) ASC,
                        cast(d.d as string) ASC
             ) AS rank
      FROM derived d
      JOIN (VALUES {_KNN_SQL_VALUES}) AS q(query_id, qlat, qlon)
        ON d.kind = 'node'
    ) t WHERE rank <= 10"""


# --- B6: integer-grid tiles + sparse raster --------------------------------
def _q_tile_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.tiles import int_tile_counts

    return int_tile_counts(_points_df(spark, sf_dir), cell_deg_u=4000)


_TILE_ORACLE = _DERIVED_SQL + """
    SELECT cast(floor(lon_u / 4000.0) as bigint) AS tile_x,
           cast(floor(lat_u / 4000.0) as bigint) AS tile_y,
           count(*) AS cnt
    FROM derived WHERE kind = 'node'
    GROUP BY 1, 2"""


def _q_tile_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 16x16 pixel binning inside integer tiles, as sparse
    (tile, pix, cnt) rows — the hash-comparable tile-assignment surface."""
    pts = _points_df(spark, sf_dir)
    return (
        pts.withColumn("tile_x", F.floor(F.col("lon_u") / F.lit(4000.0)).cast("long"))
        .withColumn("tile_y", F.floor(F.col("lat_u") / F.lit(4000.0)).cast("long"))
        .withColumn(
            "pix",
            (F.floor(F.pmod(F.col("lat_u"), F.lit(4000)) / F.lit(250.0)) * 16
             + F.floor(F.pmod(F.col("lon_u"), F.lit(4000)) / F.lit(250.0))
             ).cast("long"),
        )
        .groupBy("tile_x", "tile_y", "pix")
        .agg(F.count("*").alias("cnt"))
    )


_RASTER_ORACLE = _DERIVED_SQL + """
    SELECT cast(floor(lon_u / 4000.0) as bigint) AS tile_x,
           cast(floor(lat_u / 4000.0) as bigint) AS tile_y,
           cast(floor((lat_u % 4000) / 250.0) * 16
                + floor((lon_u % 4000) / 250.0) as bigint) AS pix,
           count(*) AS cnt
    FROM derived WHERE kind = 'node'
    GROUP BY 1, 2, 3"""


# --- dedup / text / similarity ---------------------------------------------
def _q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.dedup import exact_dedup

    _register(spark, sf_dir, ["documents"])
    docs = spark.table("documents")
    return exact_dedup(docs).select("doc_id", "n_copies")


_EXACT_DEDUP_ORACLE = """
    SELECT min(doc_id) AS doc_id, count(*) AS n_copies
    FROM documents GROUP BY text"""


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.dedup import ngram_jaccard_pairs

    _register(spark, sf_dir, ["documents"])
    docs = spark.table("documents").filter(F.col("doc_id") < 200)
    return ngram_jaccard_pairs(docs, F.col("lang"), n=3)


_NGRAM_ORACLE = """
    WITH t AS (
      SELECT doc_id, lang,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 200
    ), s AS (
      SELECT doc_id, lang,
             list_distinct(CASE WHEN len(toks) < 3 THEN []
               ELSE [array_to_string(toks[i:i+2], ' ')
                     for i in range(1, len(toks) - 1)] END) AS sh
      FROM t
    )
    SELECT l.doc_id AS a, r.doc_id AS b,
           len(list_intersect(l.sh, r.sh)) AS inter_sz,
           len(list_distinct(list_concat(l.sh, r.sh))) AS union_sz
    FROM s l JOIN s r ON l.lang = r.lang AND l.doc_id < r.doc_id"""


def _q_verified_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-correct dedup composition (LSH candidates -> exact n-gram
    Jaccard verify on pairs only); oracle = brute-force all-pairs exact
    Jaccard >= threshold in SQL.  Equality holds because LSH recall at
    j >= 0.8 with 16x4 banding is ~0.9996 and the fixed synthetic corpus
    has no pair in the miss band (verified at freeze time)."""
    from osmspark.operators.dedup import verified_near_dup_pairs

    _register(spark, sf_dir, ["documents"])
    docs = spark.table("documents").filter(F.col("doc_id") < 500)
    return verified_near_dup_pairs(docs, jaccard_threshold=0.8)


_VERIFIED_ORACLE = """
    WITH t AS (
      SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents WHERE doc_id < 500
    ), s AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(toks) < 3 THEN []
               ELSE [array_to_string(toks[i:i+2], ' ')
                     for i in range(1, len(toks) - 1)] END) AS sh
      FROM t
    )
    SELECT a, b, jaccard FROM (
      SELECT l.doc_id AS a, r.doc_id AS b,
             CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE)
               / len(list_distinct(list_concat(l.sh, r.sh))) AS jaccard
      FROM s l JOIN s r ON l.doc_id < r.doc_id
      WHERE len(l.sh) > 0 AND len(r.sh) > 0
    ) q WHERE jaccard >= 0.8"""


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.textstats import text_stats

    _register(spark, sf_dir, ["documents"])
    return text_stats(spark.table("documents")).select(
        "doc_id", "n_tokens", "n_stopwords", "lang_id", "quality"
    )


_TEXT_STATS_ORACLE = """
    WITH t AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(lower(trim(text)), '\\s+'))
             END AS n_tokens,
             len(list_filter(string_split_regex(lower(trim(text)), '\\s+'),
                 x -> x IN ('the','a','an','and','or','of','to','in','is',
                            'it','that','for','on','with','as','at','by',
                            'this'))) AS n_stopwords,
             length(text) AS n_chars,
             length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
               AS n_punct
      FROM documents
    )
    SELECT doc_id, n_tokens, n_stopwords,
           CASE WHEN n_tokens = 0 THEN 'empty'
                WHEN (n_stopwords * 100) >= (n_tokens * 8) THEN 'en'
                ELSE 'unknown' END AS lang_id,
           CASE WHEN n_tokens = 0 THEN 0
                ELSE cast(floor(
                  least(n_chars, 400) / 8.0
                  + least(n_stopwords * 10, 30)
                  + greatest(20 - n_punct * 2, 0)) as int)
           END AS quality
    FROM t"""


def _q_ann_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.similarity import cosine_topk_bruteforce

    _register(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return cosine_topk_bruteforce(emb, queries, k=5).select(
        "query_id", "rank", "vec_id"
    )


_ANN_ORACLE = """
    WITH e AS (
      SELECT vec_id, cast(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT query_id, rank, vec_id FROM (
      SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
             row_number() OVER (
               PARTITION BY q.vec_id
               ORDER BY list_cosine_similarity(q.v, e.v) DESC, e.vec_id ASC
             ) AS rank
      FROM e JOIN e q ON q.vec_id < 5
    ) t WHERE rank <= 5"""


def _q_ivf_full_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with nprobe == n_centroids: bucketing must be lossless, so
    the result equals exhaustive search — checked against the SAME
    independent SQL oracle as ann_cosine_topk.  (Partial-probe recall is
    pytest-gated; it is approximate by design.)"""
    from osmspark.operators.similarity import ivf_topk, train_centroids

    _register(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    cents = train_centroids(emb, n_centroids=8, iters=2)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf_topk(emb, queries, k=5, centroids=cents, nprobe=8).select(
        "query_id", "rank", "vec_id"
    )


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-blocked embedding near-dup pairs (golden regression
    oracle; planted-dup recall is pytest-gated)."""
    from osmspark.operators.similarity import embedding_near_dup_pairs

    _register(spark, sf_dir, ["embeddings"])
    emb = spark.table("embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("embedding"),
    )
    return embedding_near_dup_pairs(emb, threshold=0.25, n_bits=6).select(
        "a", "b", F.round("sim", 6).alias("sim")
    )


def _q_postcode_repair_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12 repair path through the ENGINE (audit.repair_postcode +
    postcode_class): half the rows get the reference's broken 'S <digits>'
    form prepended, repair strips non-digits when 6 remain; oracle
    reproduces the rule in SQL."""
    from osmspark.operators import audit

    d = _derived_df(spark, sf_dir).filter(F.col("pc").isNotNull())
    broken = F.when(F.pmod(F.col("d"), F.lit(2)) == 0,
                    F.concat(F.lit("S "), F.col("pc"))).otherwise(F.col("pc"))
    return (
        d.select(audit.repair_postcode(broken).alias("rp"))
        .select(audit.postcode_class("rp").alias("pc_class"))
        .groupBy("pc_class").agg(F.count("*").alias("cnt"))
    )


_POSTCODE_REPAIR_ORACLE = _DERIVED_SQL + """
    , broken AS (
      SELECT CASE WHEN (d % 2) = 0 THEN 'S ' || pc ELSE pc END AS x
      FROM derived WHERE pc IS NOT NULL
    ), repaired AS (
      SELECT CASE WHEN regexp_extract(regexp_replace(x, '[^0-9]', '', 'g'),
                                      '^[0-9]{6}$', 0) <> ''
                  THEN regexp_replace(x, '[^0-9]', '', 'g')
                  ELSE x END AS rp
      FROM broken
    )
    SELECT CASE WHEN regexp_extract(rp, '^[0-8][0-9]{5}$', 0) <> ''
                  THEN 'valid_sg'
                WHEN regexp_extract(rp, '^[0-9]{5}$', 0) <> ''
                  THEN 'out_of_area'
                ELSE 'invalid' END AS pc_class,
           count(*) AS cnt
    FROM repaired GROUP BY 1"""


# --- rows-only engine queries (no SQL equivalent; pytest is the gate) ------
def _q_hex_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.functions.hexgrid import with_hex_cell

    pts = _points_df(spark, sf_dir)
    return (
        with_hex_cell(pts, 8)
        .groupBy("hex_r8").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("hex_r8")).limit(50)
    )


def _q_s2_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.functions.s2 import with_s2_cell

    pts = _points_df(spark, sf_dir)
    return (
        with_s2_cell(pts, 12)
        .groupBy("s2_l12").agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("s2_l12")).limit(50)
    )


def _q_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.dedup import minhash_dedup_pairs

    _register(spark, sf_dir, ["documents"])
    return minhash_dedup_pairs(
        spark.table("documents"), threshold=0.5, num_perm=64, bands=16
    ).select("a", "b", F.round("est_jaccard", 4).alias("est_jaccard"))


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.dedup import simhash_near_dup_pairs

    _register(spark, sf_dir, ["documents"])
    return simhash_near_dup_pairs(spark.table("documents"), max_hamming=8)


def _q_knn_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.knn import knn_kring

    pts = _points_df(spark, sf_dir).select(
        F.col("d").cast("string").alias("id"), "lat", "lon"
    )
    qdf = spark.createDataFrame(
        _KNN_QUERIES, "query_id string, lat double, lon double"
    )
    # rank-level compare only: the haversine VALUE is float-env-sensitive
    # across engines (JVM StrictMath vs libm), but the ORDERING is stable —
    # distinct grid points differ by >> 1 ulp, exact ties break on point_id
    return knn_kring(pts, qdf, k=10, res=8, metric="haversine").select(
        "query_id", "rank", "point_id"
    )


_KNN_HAVERSINE_ORACLE = _DERIVED_SQL + f"""
    SELECT query_id, rank, point_id FROM (
      SELECT q.query_id AS query_id,
             cast(d.d as string) AS point_id,
             row_number() OVER (
               PARTITION BY q.query_id
               ORDER BY 2 * 6371008.8 * asin(sqrt(
                   pow(sin(radians(d.lat - q.qlat) / 2), 2)
                   + cos(radians(q.qlat)) * cos(radians(d.lat))
                     * pow(sin(radians(d.lon - q.qlon) / 2), 2))) ASC,
                 cast(d.d as string) ASC
             ) AS rank
      FROM derived d
      JOIN (VALUES {_KNN_SQL_VALUES}) AS q(query_id, qlat, qlon)
        ON d.kind = 'node'
    ) t WHERE rank <= 10"""


def _q_tile_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-raster render via applyInPandas; the raster array is projected
    to a '/'-joined string so the driver canonicalizer can hash/sort it
    (round-1 err: pandas sort_values dies on array<long> cells)."""
    from osmspark.operators.tiles import render_density_tiles

    r = render_density_tiles(_points_df(spark, sf_dir), zoom=12, px=16)
    return r.select(
        "zoom", "tile_x", "tile_y",
        F.concat_ws(
            "/", F.transform("raster", lambda x: x.cast("string"))
        ).alias("raster_csv"),
    )


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.datagen import documents_from_ids
    from osmspark.operators.multimodal import extract_features, media_table

    _register(spark, sf_dir, ["documents"])
    docs = documents_from_ids(spark.table("documents"), "doc_id")
    return extract_features(media_table(docs)).select(
        "doc_id", "media_ref", "media_type", "n_bytes"
    )


def _q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators.textstats import fingerprint_udf

    _register(spark, sf_dir, ["documents"])
    return spark.table("documents").select(
        "doc_id", fingerprint_udf(8)(F.col("text")).alias("fp")
    )


def _q_salted_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B7: explicit two-stage salted group-count over the skewed derived
    kind key; must equal a plain GROUP BY (the oracle)."""
    from osmspark.operators.salt import salted_group_count

    d = _derived_df(spark, sf_dir).select("d", "kind")
    return salted_group_count(d, "kind", nsalt=8, salt_from=["d"])


_SALTED_ORACLE = _DERIVED_SQL + """
    SELECT kind, count(*) AS cnt FROM derived GROUP BY kind"""


def _q_minhash_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs -> connected-component keep list."""
    from osmspark.operators.dedup import dedup_keep_list, minhash_dedup_pairs

    _register(spark, sf_dir, ["documents"])
    docs = spark.table("documents")
    pairs = minhash_dedup_pairs(docs, threshold=0.8, num_perm=64, bands=16)
    return dedup_keep_list(pairs, docs)


def _q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 engine op (hash-mod systematic sample; xxhash64 has no DuckDB
    twin -> rows-only)."""
    from osmspark.sources import systematic_sample

    _register(spark, sf_dir, ["documents"])
    return systematic_sample(spark.table("documents"), k=10).select("doc_id")


def _q_span_invariant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-sequence invariant sweep (input_hint [D]) over spansified docs:
    returns one row with the violation count (must be 0)."""
    from osmspark.datagen import documents_from_ids
    from osmspark.sources import span_sequence_violations

    _register(spark, sf_dir, ["documents"])
    docs = documents_from_ids(spark.table("documents"), "doc_id")
    return span_sequence_violations(docs).agg(
        F.count("*").alias("n_violations")
    )


_SPAN_INVARIANT_ORACLE = "SELECT cast(0 as bigint) AS n_violations FROM (SELECT 1)"


def _q_street_norm_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as street_norm_counts but via the engine operator chain
    (audit.street_type + mapping rewrite) — proves operator/SQL parity."""
    from osmspark.operators import audit

    streets = _derived_df(spark, sf_dir).filter(F.col("street").isNotNull())
    return audit.normalized_street_counts(streets).select(
        "normalized_type", F.col("cnt").cast("long").alias("cnt")
    )


def _q_postcode_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from osmspark.operators import audit

    d = _derived_df(spark, sf_dir).filter(F.col("pc").isNotNull())
    return (
        d.select(audit.postcode_class("pc").alias("pc_class"))
        .groupBy("pc_class").agg(F.count("*").alias("cnt"))
    )


def _q_key_class_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 through the ENGINE operator (audit.key_class / config regexes) —
    closes the round-1 oracle blind spot where key_class_counts ran the same
    SQL on both sides and never exercised the operator."""
    from osmspark.operators import audit

    d = _derived_df(spark, sf_dir)
    return (
        d.select(audit.key_class("tag_key").alias("bucket"))
        .groupBy("bucket").agg(F.count("*").alias("cnt"))
    )


def _q_shape_tags_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/A14 through the ENGINE shaping helpers: build a 1-entry tags map
    per derived row, run shape's problemchars-drop + addr-split + prefix
    strip, and project (bucket, out_key, cnt) — SQL reproduces the same
    key-routing rules independently."""
    from osmspark.operators.shape import _address, _clean_tags, _other_tags

    d = _derived_df(spark, sf_dir)
    tags = F.map_from_arrays(F.array(F.col("tag_key")), F.array(F.col("usr")))
    shaped = d.select(
        _address(_clean_tags(tags)).alias("address"),
        _other_tags(tags).alias("tags"),
    )
    addr = shaped.select(
        F.lit("address").alias("bucket"),
        F.explode(F.map_keys("address")).alias("out_key"),
    )
    oth = shaped.select(
        F.lit("tags").alias("bucket"),
        F.explode(F.map_keys("tags")).alias("out_key"),
    )
    return (
        addr.unionByName(oth)
        .groupBy("bucket", "out_key").agg(F.count("*").alias("cnt"))
    )


_SHAPE_TAGS_ORACLE = _DERIVED_SQL + f"""
    SELECT CASE WHEN tag_key LIKE 'addr:%' THEN 'address' ELSE 'tags' END
             AS bucket,
           CASE WHEN tag_key LIKE 'addr:%' THEN substr(tag_key, 6)
                ELSE tag_key END AS out_key,
           count(*) AS cnt
    FROM derived
    WHERE regexp_extract(tag_key, '{SQL_PROBLEMCHARS}', 0) = ''
      AND NOT (tag_key LIKE 'addr:%' AND strpos(substr(tag_key, 6), ':') > 0)
    GROUP BY 1, 2"""


def _q_cuisines_engine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A20b through the ENGINE operator (audit.composed_tag_counts) over a
    synthesized tags map; oracle = the shared cuisines_of_restaurants SQL."""
    from osmspark.operators import audit

    d = _derived_df(spark, sf_dir)
    nodes = d.select(
        F.map_filter(
            F.map_from_arrays(
                F.array(F.lit("amenity"), F.lit("cuisine")),
                F.array(F.col("amenity"), F.col("cuisine")),
            ),
            lambda k, v: v.isNotNull(),
        ).alias("tags")
    )
    return audit.composed_tag_counts(nodes, "amenity", "restaurant", "cuisine")


_ENGINE_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "street_norm_counts_engine": _q_street_norm_engine,
    "postcode_partition_engine": _q_postcode_engine,
    "key_class_counts_engine": _q_key_class_engine,
    "shape_tags_engine": _q_shape_tags_engine,
    "cuisines_engine": _q_cuisines_engine,
    "pip_rect_join": _q_pip_rect,
    "knn_sq_deg": _q_knn,
    "tile_counts_int": _q_tile_counts,
    "tile_raster_sparse": _q_tile_raster,
    "exact_dedup_keep": _q_exact_dedup,
    "ngram_jaccard": _q_ngram_jaccard,
    "verified_near_dups": _q_verified_near_dups,
    "text_stats": _q_text_stats,
    "ann_cosine_topk": _q_ann_cosine,
    "ivf_full_probe": _q_ivf_full_probe,
    "embedding_near_dups": _q_embedding_near_dups,
    "postcode_repair_engine": _q_postcode_repair_engine,
    "span_invariant": _q_span_invariant,
    "salted_group_counts": _q_salted_group,
    # rows-only (non-SQL-expressible; correctness gated in tests/)
    "minhash_keep_list": _q_minhash_keep,
    "systematic_sample_hash": _q_systematic_sample,
    "hex_cell_counts": _q_hex_cells,
    "s2_cell_counts": _q_s2_cells,
    "minhash_near_dups": _q_minhash,
    "simhash_near_dups": _q_simhash,
    "knn_haversine": _q_knn_haversine,
    "tile_render_raster": _q_tile_render,
    "media_features": _q_media_features,
    "doc_fingerprints": _q_fingerprints,
}

# ---------------------------------------------------------------------------
# Golden regression oracles for queries whose math has no SQL twin (cell
# indexes via trig, xxhash64 sampling, MinHash/SimHash, Arrow-UDF features).
# Mechanism (round-1 VERDICT item 7): the engine's sf0.01 result is FROZEN
# to a committed parquet (tools/make_golden.py), which DuckDB cross-reads —
# so the driver check pins these queries against regression.  INDEPENDENT
# correctness for each lives in tests/ (brute-force / property / oracle.py
# suites); these rows are regression gates, not independent derivations.
# ---------------------------------------------------------------------------
GOLDEN_DIR = "/root/repo/tests/golden"
GOLDEN_QUERIES = [
    "hex_cell_counts", "s2_cell_counts", "systematic_sample_hash",
    "doc_fingerprints", "minhash_near_dups", "simhash_near_dups",
    "minhash_keep_list", "media_features", "tile_render_raster",
    "embedding_near_dups",
]
_GOLDEN_ORACLES = {
    name: f"SELECT * FROM read_parquet('{GOLDEN_DIR}/{name}.parquet')"
    for name in GOLDEN_QUERIES
}


_ENGINE_ORACLES: dict[str, str] = {
    "street_norm_counts_engine": _SHARED_SQL["street_norm_counts"],
    "postcode_partition_engine": _SHARED_SQL["postcode_partition"],
    "key_class_counts_engine": _SHARED_SQL["key_class_counts"],
    "shape_tags_engine": _SHAPE_TAGS_ORACLE,
    "cuisines_engine": _SHARED_SQL["cuisines_of_restaurants"],
    "pip_rect_join": _PIP_ORACLE,
    "knn_sq_deg": _KNN_ORACLE,
    "tile_counts_int": _TILE_ORACLE,
    "tile_raster_sparse": _RASTER_ORACLE,
    "exact_dedup_keep": _EXACT_DEDUP_ORACLE,
    "ngram_jaccard": _NGRAM_ORACLE,
    "verified_near_dups": _VERIFIED_ORACLE,
    "text_stats": _TEXT_STATS_ORACLE,
    "ann_cosine_topk": _ANN_ORACLE,
    "ivf_full_probe": _ANN_ORACLE,
    "postcode_repair_engine": _POSTCODE_REPAIR_ORACLE,
    "span_invariant": _SPAN_INVARIANT_ORACLE,
    "salted_group_counts": _SALTED_ORACLE,
    "knn_haversine": _KNN_HAVERSINE_ORACLE,
}




# ---------------------------------------------------------------------------
# Driver API
# ---------------------------------------------------------------------------
def entry(spark: SparkSession) -> DataFrame:
    """Flagship end-to-end slice (SURVEY §7.1 M1) on sf0.001: spansify the
    driver documents into the input_hint schema -> B1 span extraction ->
    A7 street filter -> A8+A11 normalize -> group-count."""
    from osmspark.datagen import documents_from_ids
    from osmspark.operators import audit
    from osmspark.sources import parse_nodes

    flat = spark.read.parquet(f"{DEFAULT_SF_DIR}/documents.parquet")
    docs = documents_from_ids(flat, "doc_id")
    nodes = parse_nodes(docs)
    return audit.normalized_street_counts(audit.streets(nodes))


def _make_sql_runner(sql: str) -> Callable[[SparkSession, str], DataFrame]:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _register(spark, sf_dir)
        return spark.sql(sql)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        name: _make_sql_runner(sql) for name, sql in _SHARED_SQL.items()
    }
    q.update(_ENGINE_QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    import os

    d = dict(_SHARED_SQL)
    d.update(_ENGINE_ORACLES)
    for name, sql in _GOLDEN_ORACLES.items():
        if os.path.exists(f"{GOLDEN_DIR}/{name}.parquet"):
            d[name] = sql
    return d
