"""Deterministic synthetic data generators (FIXTURES.md §1-§2).

`gen_documents` builds the interleaved text+media `documents` table
(BASELINE.json:input_hint schema) entirely with native Spark expressions —
`spark.range` + integer-arithmetic hashing + `transform`/`sequence` lambdas +
`to_json` — so generation itself distributes across executors and scales to
arbitrary row counts with zero Python-per-row cost.  Pure function of
n_docs: same n -> byte-identical table, any partitioning.

Schema (BASELINE.json:input_hint [D]):
    documents(doc_id: string,
              spans: array<struct<kind:string, text:string,
                                  media_ref:string, offset:int>>)

Per-kind text grammar follows FIXTURES.md §1: node/way spans carry a JSON
payload (id, lat, lon, version, changeset, timestamp, user, uid, tags[, nd]),
text spans carry prose noise, media spans carry only a media_ref.  Node
coordinates cluster around HOT_CITIES (40% in city 0 — the skew knob, B7)
with a ~5% Malaysian-fringe spill (drives the A12 postcode partition).

`gen_polygons` builds the small admin/ZIP polygon dimension (50-ish convex
quads tiling the bbox) driver-side — it is a broadcast dimension by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import HOT_CITIES, MY_BBOX, SG_BBOX

# word pools for deterministic string synthesis ------------------------------
_USERS = ["alice", "bob", "carol", "dave", "erin", "frank", "grace", "heidi",
          "ivan", "judy", "mallory", "niaj", "olivia", "peggy", "rupert",
          "sybil", "trent", "victor", "walter", "wendy"]

_STREET_BASES = ["Serangoon", "Orchard", "Tampines", "Bedok", "Clementi",
                 "Yishun", "Punggol", "Sengkang", "Holland", "Thomson",
                 "Bukit Timah", "Changi", "Geylang", "Kallang", "Marina"]

# suffix types: mix of canonical and abbreviated (audit.py mapping targets)
_STREET_SUFFIXES = ["Road", "Rd", "Street", "St", "St.", "Avenue", "Ave",
                    "Drive", "Dr", "Boulevard", "Blvd", "Lane", "Ln",
                    "Crescent", "Cres", "Walk", "Link", "Terrace", "Ter"]

# Malay prefix-position street names [R]
_MALAY_STREETS = ["Jalan Besar", "Jln Ahmad Ibrahim", "Lorong Chuan",
                  "Lor 24 Geylang", "Bukit Merah Central", "Jalan Kayu"]

_AMENITIES = ["restaurant", "cafe", "school", "bank", "atm", "parking",
              "place_of_worship", "hospital", "fuel", "police"]

_WORDS = ["the", "map", "area", "covers", "dense", "urban", "blocks", "near",
          "river", "park", "with", "many", "small", "shops", "and", "food",
          "stalls", "along", "old", "rail", "corridor", "toward", "coast"]


def _lit_array(strings):
    return F.array(*[F.lit(s) for s in strings])


def _pick(arr_col, h, n):
    """Deterministically pick element (1-based element_at) by hash mod n."""
    return F.element_at(arr_col, (F.pmod(h, F.lit(n)) + F.lit(1)).cast("int"))


def spans_expr(d) -> "F.Column":
    """The spans array as a pure Spark expression over an int64 id column.

    Factored out so any integer-keyed table (e.g. the driver's flat
    `documents.parquet`) can be deterministically 'spansified' into the
    input_hint schema — all JVM-side, no Python per row."""
    # per-doc hash + span count (12..28, avg 20 — FIXTURES.md)
    hdoc = F.pmod(d * F.lit(1000003) + F.lit(12345), F.lit(2_147_483_647))
    n_spans = (F.pmod(hdoc, F.lit(17)) + F.lit(12)).cast("int")

    users = _lit_array(_USERS)
    bases = _lit_array(_STREET_BASES)
    suffixes = _lit_array(_STREET_SUFFIXES)
    malay = _lit_array(_MALAY_STREETS)
    amenities = _lit_array(_AMENITIES)
    words = _lit_array(_WORDS)

    def span_of(i):
        # independent per-span hashes (int64-safe: operands < 2^31)
        h = F.pmod(d * F.lit(7919) + i * F.lit(104729) + F.lit(777), F.lit(2_147_483_647))
        h2 = F.pmod(h * F.lit(48271), F.lit(2_147_483_647))
        h3 = F.pmod(h2 * F.lit(16807), F.lit(2_147_483_647))
        p = F.pmod(h, F.lit(100))

        # --- position: hot-city mixture (40/15/15/15/15) + 5% MY fringe ----
        pc = F.pmod(h2, F.lit(100))
        city_lat = (
            F.when(pc < 40, F.lit(HOT_CITIES[0][0]))
            .when(pc < 55, F.lit(HOT_CITIES[1][0]))
            .when(pc < 70, F.lit(HOT_CITIES[2][0]))
            .when(pc < 85, F.lit(HOT_CITIES[3][0]))
            .otherwise(F.lit(HOT_CITIES[4][0]))
        )
        city_lon = (
            F.when(pc < 40, F.lit(HOT_CITIES[0][1]))
            .when(pc < 55, F.lit(HOT_CITIES[1][1]))
            .when(pc < 70, F.lit(HOT_CITIES[2][1]))
            .when(pc < 85, F.lit(HOT_CITIES[3][1]))
            .otherwise(F.lit(HOT_CITIES[4][1]))
        )
        in_my = F.pmod(h3, F.lit(100)) >= F.lit(95)
        jlat = (F.pmod(h3, F.lit(2001)) - F.lit(1000)).cast("double") * F.lit(1e-5)
        jlon = (F.pmod(F.pmod(h3 * F.lit(31), F.lit(2_147_483_647)), F.lit(2001))
                - F.lit(1000)).cast("double") * F.lit(1e-5)
        my_lat = F.lit(MY_BBOX["lat_min"]) + F.pmod(h3, F.lit(2800)).cast("double") * F.lit(1e-4)
        my_lon = F.lit(MY_BBOX["lon_min"]) + F.pmod(h2, F.lit(5000)).cast("double") * F.lit(1e-4)
        lat = F.when(in_my, my_lat).otherwise(city_lat + jlat)
        lon = F.when(in_my, my_lon).otherwise(city_lon + jlon)

        # --- street name: 70% suffix-form (base + suffix), 30% Malay prefix
        street = F.when(
            F.pmod(h3, F.lit(10)) < 7,
            F.concat(_pick(bases, h2, len(_STREET_BASES)), F.lit(" "),
                     _pick(suffixes, h3, len(_STREET_SUFFIXES))),
        ).otherwise(_pick(malay, h3, len(_MALAY_STREETS)))

        # --- postcode: SG 6-digit when in SG, MY 5-digit when fringe, few bad
        pc6 = F.format_string("%06d", F.pmod(h2, F.lit(800000)).cast("int"))
        pc5 = F.format_string("%05d", (F.lit(79000) + F.pmod(h2, F.lit(3000))).cast("int"))
        bad_pc = F.concat(F.lit("S"), F.format_string("%04d", F.pmod(h2, F.lit(10000)).cast("int")))
        postcode = (
            F.when(F.pmod(h3, F.lit(20)) == 0, bad_pc)
            .when(in_my, pc5)
            .otherwise(pc6)
        )

        ts = F.format_string(
            "2016-%02d-%02dT%02d:%02d:00Z",
            (F.pmod(h, F.lit(12)) + F.lit(1)).cast("int"),
            (F.pmod(h2, F.lit(28)) + F.lit(1)).cast("int"),
            F.pmod(h3, F.lit(24)).cast("int"),
            F.pmod(h, F.lit(60)).cast("int"),
        )
        uid_num = F.pmod(h2, F.lit(len(_USERS)))
        user = F.element_at(users, (uid_num + F.lit(1)).cast("int"))

        # tags struct: to_json drops null fields -> presence varies by hash
        has_addr = F.pmod(h, F.lit(10)) < 6           # 60% of nodes carry addr
        tags_struct = F.struct(
            F.when(F.pmod(h2, F.lit(10)) < 4,
                   _pick(amenities, h3, len(_AMENITIES))).alias("amenity"),
            F.when(has_addr, street).alias("addr:street"),
            F.when(has_addr, postcode).alias("addr:postcode"),
            F.when(F.pmod(h3, F.lit(25)) == 0, F.lit("check me")).alias("FIXME"),
            F.when(F.pmod(h3, F.lit(31)) == 0, F.lit("oops")).alias("bad key!"),
            F.when(F.pmod(h3, F.lit(37)) == 0, F.lit("dropme")).alias("addr:street:name"),
            # dotted key: problemchars per tags.py [C] (the reference class
            # includes the literal '.') -> shape must DROP it
            F.when(F.pmod(h3, F.lit(29)) == 0, F.lit("拉布拉多")).alias("name.zh"),
        )

        common = [
            F.lit("id"), F.format_string("%d", d * F.lit(100) + i),
            F.lit("lat"), lat, F.lit("lon"), lon,
            F.lit("version"), F.format_string("%d", (F.pmod(h3, F.lit(5)) + F.lit(1)).cast("int")),
            F.lit("changeset"), F.format_string("%d", F.pmod(h2, F.lit(99999)).cast("int")),
            F.lit("timestamp"), ts,
            F.lit("user"), user,
            F.lit("uid"), F.format_string("%d", uid_num.cast("int")),
            F.lit("tags"), tags_struct,
        ]
        node_json = F.to_json(F.named_struct(*common))

        nd_refs = F.transform(
            F.sequence(F.lit(0), (F.pmod(h3, F.lit(5)) + F.lit(3)).cast("int")),
            lambda j: F.format_string(
                "%d", F.pmod(h * F.lit(131) + j * F.lit(97), F.lit(1_000_000))),
        )
        way_json = F.to_json(F.named_struct(*common, F.lit("nd"), nd_refs))

        prose = F.array_join(
            F.transform(
                F.sequence(F.lit(0), (F.pmod(h2, F.lit(10)) + F.lit(5)).cast("int")),
                lambda j: F.element_at(
                    words,
                    (F.pmod(h * F.lit(31) + j * F.lit(17), F.lit(len(_WORDS)))
                     + F.lit(1)).cast("int")),
            ),
            " ",
        )

        kind = (
            F.when(p < 60, F.lit("node"))
            .when(p < 75, F.lit("way"))
            .when(p < 90, F.lit("text"))
            .otherwise(F.lit("media"))
        )
        text = (
            F.when(p < 60, node_json)
            .when(p < 75, way_json)
            .when(p < 90, prose)
            .otherwise(F.lit(""))
        )
        media_ref = F.when(
            p >= 90, F.format_string("media://%08x", h3.cast("int"))
        ).otherwise(F.lit(""))
        # strictly increasing offsets within a doc: 7i <= off < 7(i+1)
        offset = (i * F.lit(7) + F.pmod(h, F.lit(5))).cast("int")

        return F.struct(
            kind.alias("kind"), text.alias("text"),
            media_ref.alias("media_ref"), offset.alias("offset"),
        )

    return F.transform(F.sequence(F.lit(0), n_spans - F.lit(1)), span_of)


def documents_from_ids(df: DataFrame, id_col: str) -> DataFrame:
    """Spansify any integer-keyed DataFrame into the input_hint schema.

    Projects the id first under a private name: Spark's lateral column alias
    resolution would otherwise bind the `doc_id` reference inside spans_expr
    to the new STRING alias in the same select list."""
    base = df.select(F.col(id_col).cast("long").alias("__did"))
    d = F.col("__did")
    return base.select(
        F.format_string("doc-%08d", d).alias("doc_id"),
        spans_expr(d).alias("spans"),
    )


def gen_documents(spark: SparkSession, n_docs: int, partitions: int | None = None) -> DataFrame:
    """Interleaved documents table; deterministic in n_docs."""
    if partitions is None:
        # enough tasks to keep a wide executor busy: ~2k docs per partition,
        # bounded so tiny fixtures don't fragment and huge runs don't flood
        # the scheduler
        partitions = max(16, min(1024, n_docs // 2_000))
    docs = spark.range(0, n_docs, 1, partitions).withColumnRenamed("id", "did")
    return documents_from_ids(docs, "did")


def gen_polygons(spark: SparkSession, grid_x: int = 10, grid_y: int = 5) -> DataFrame:
    """Admin/ZIP polygon dimension: grid_x*grid_y jittered convex quads tiling
    the SG bbox (FIXTURES.md §2). CCW closed rings, no holes. Deterministic
    (LCG jitter). Small by design -> broadcast side of the PIP join (B4)."""
    lat0, lat1 = SG_BBOX["lat_min"], SG_BBOX["lat_max"]
    lon0, lon1 = SG_BBOX["lon_min"], SG_BBOX["lon_max"]
    dlat = (lat1 - lat0) / grid_y
    dlon = (lon1 - lon0) / grid_x

    def lcg(x):
        return (x * 48271 + 11) % 2_147_483_647

    rows = []
    for gy in range(grid_y):
        for gx in range(grid_x):
            s = lcg(gy * 1000 + gx + 42)
            # jitter interior corners by up to 20% of a cell (keeps quads convex
            # and the tiling gap/overlap-bearing — exercises both join phases)
            def jit(seed_shift):
                nonlocal s
                s = lcg(s + seed_shift)
                return (s % 1000 - 500) / 500.0 * 0.2

            la, lo = lat0 + gy * dlat, lon0 + gx * dlon
            ring = [
                (la + jit(1) * dlat * 0.3, lo + jit(2) * dlon * 0.3),
                (la + jit(3) * dlat * 0.3, lo + dlon + jit(4) * dlon * 0.3),
                (la + dlat + jit(5) * dlat * 0.3, lo + dlon + jit(6) * dlon * 0.3),
                (la + dlat + jit(7) * dlat * 0.3, lo + jit(8) * dlon * 0.3),
            ]
            ring.append(ring[0])  # closed
            idx = gy * grid_x + gx
            level = "zip" if idx % 2 == 0 else "admin"
            postcode = f"{(idx * 13577) % 800000:06d}" if level == "zip" else None
            rows.append((
                f"{level}-{idx:03d}", level,
                [{"lat": p[0], "lon": p[1]} for p in ring], postcode,
            ))

    schema = ("poly_id string, level string, "
              "ring array<struct<lat:double,lon:double>>, postcode string")
    return spark.createDataFrame(rows, schema=schema)


def gen_vectors(spark: SparkSession, n: int, dim: int = 64,
                partitions: int | None = None) -> DataFrame:
    """Deterministic synthetic embedding table (vec_id, embedding) — NATIVE
    generation (xxhash64 per (id, lane) -> uniform [-1, 1)), distributed
    and reproducible regardless of partitioning.  Bench-scale stand-in for
    a real embedding column; isotropic, i.e. the WORST case for IVF
    bucketing recall."""
    from pyspark.sql import functions as F

    ids = spark.range(0, n, numPartitions=partitions).select(
        F.col("id").alias("vec_id")
    )
    lanes = F.sequence(F.lit(0), F.lit(dim - 1))
    vec = F.transform(
        lanes,
        lambda i: (
            (F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(2_000_001))
             - F.lit(1_000_000)) / F.lit(1_000_000.0)
        ),
    )
    return ids.select("vec_id", vec.alias("embedding"))


_URL_DOMAINS = [
    # Zipf-ish head: index 0 is the hot domain (~30% of URLs) — the
    # web-crawl skew knob for domain_stats' map-side-combine story
    "bigportal.com", "news.co.uk", "forum.example.org", "shop.com.sg",
    "blog.net", "wiki.org", "media.com.au", "docs.io", "mail.co.jp",
    "maps.example.com",
]
_URL_WORDS = ["page", "item", "post", "article", "thread", "view", "user",
              "tag", "archive", "search"]


def gen_url_corpus(spark: SparkSession, n_docs: int,
                   partitions: int | None = None) -> DataFrame:
    """Deterministic (doc_id, text) corpus where text is prose with 0-4
    embedded URLs — NATIVE generation (xxhash64 choices folded through
    transform/concat), reproducible regardless of partitioning.  URLs mix
    plain hosts, subdomains (exercises registered-domain folding), ports,
    query strings, two-level public suffixes, and trailing sentence
    punctuation (exercises the extractor's strip rule); ~10% of docs have
    no URL at all."""
    ids = spark.range(0, n_docs, numPartitions=partitions).select(
        F.col("id").alias("doc_id"))
    d = F.col("doc_id")

    def _h(salt, mod):
        return F.pmod(F.xxhash64(d, F.lit(salt)), F.lit(mod))

    doms = _lit_array(_URL_DOMAINS)
    words = _lit_array(_URL_WORDS)
    n_urls = F.when(_h(1, 10) == 0, F.lit(0)).otherwise(_h(2, 4) + 1)
    urls = F.transform(
        F.sequence(F.lit(1), n_urls),
        lambda k: F.concat(
            F.when(F.pmod(F.xxhash64(d, k, F.lit(3)), F.lit(5)) == 0,
                   F.lit("http://")).otherwise(F.lit("https://")),
            # hot-domain skew: slot 0 with prob ~0.3, else uniform
            F.when(F.pmod(F.xxhash64(d, k, F.lit(4)), F.lit(10)) < 3,
                   F.element_at(doms, 1)).otherwise(
                F.element_at(
                    doms,
                    (F.pmod(F.xxhash64(d, k, F.lit(5)),
                            F.lit(len(_URL_DOMAINS))) + 1).cast("int"))),
            F.when(F.pmod(F.xxhash64(d, k, F.lit(6)), F.lit(4)) == 0,
                   F.lit(":8080")).otherwise(F.lit("")),
            F.lit("/"),
            F.element_at(
                words,
                (F.pmod(F.xxhash64(d, k, F.lit(7)),
                        F.lit(len(_URL_WORDS))) + 1).cast("int")),
            F.lit("/"),
            F.pmod(F.xxhash64(d, k, F.lit(8)), F.lit(1000)).cast("string"),
            F.when(F.pmod(F.xxhash64(d, k, F.lit(9)), F.lit(3)) == 0,
                   F.lit("?ref=feed")).otherwise(F.lit("")),
        ),
    )
    # subdomain variant: prepend www./cdn. to ~25% of URLs post-hoc is
    # awkward inside one transform; instead fold it into the host pick by
    # rewriting a second pass over the array
    urls = F.transform(
        urls,
        lambda u, i: F.when(
            F.pmod(F.xxhash64(d, i, F.lit(10)), F.lit(4)) == 0,
            F.regexp_replace(u, "://", "://www."),
        ).otherwise(u),
    )
    prose = F.concat_ws(
        " ",
        F.lit("see"),
        F.concat_ws(" , ", F.transform(
            urls, lambda u, i: F.when(
                F.pmod(F.xxhash64(d, i, F.lit(11)), F.lit(3)) == 0,
                F.concat(u, F.lit(".")),   # trailing punctuation case
            ).otherwise(u))),
        F.lit("for details"),
    )
    return ids.select(
        d, F.when(n_urls == 0, F.lit("no links here at all"))
        .otherwise(prose).alias("text"))
