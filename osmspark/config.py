"""Shared constants for the engine.

Reference semantics (SURVEY.md §2 Tier A): the `expected` street-type
whitelist and the abbreviation `mapping` mirror audit.py:~L10 / audit.py:~L50
[C], extended with the Malay prefix types (Jalan/Lorong — Singapore map area,
[R]).  The three key-classification regexes mirror tags.py:~L5-L7 [C].
"""

from __future__ import annotations

# --- A9: expected street-type whitelist (audit.py:~L10 [C] + Malay [R]) ----
EXPECTED_STREET_TYPES = [
    "Street", "Avenue", "Boulevard", "Drive", "Court", "Place", "Square",
    "Lane", "Road", "Trail", "Parkway", "Commons", "Crescent", "Close",
    "Terrace", "Walk", "Link", "Park", "Green", "Grove", "Highway",
    # Malay street types appear as the FIRST word (prefix position) [R]
    "Jalan", "Lorong", "Bukit", "Taman", "Kampong", "Lengkok",
]

# Street types that appear as a PREFIX (first word) rather than suffix [R]
MALAY_PREFIX_TYPES = ["Jalan", "Lorong", "Bukit", "Taman", "Kampong", "Lengkok"]

# --- A11: abbreviation -> canonical mapping (audit.py:~L50 update_name [C/R])
STREET_TYPE_MAPPING = {
    "St": "Street", "St.": "Street", "st": "Street",
    "Ave": "Avenue", "Ave.": "Avenue", "Av": "Avenue",
    "Rd": "Road", "Rd.": "Road", "rd": "Road",
    "Blvd": "Boulevard", "Dr": "Drive", "Dr.": "Drive",
    "Ct": "Court", "Pl": "Place", "Sq": "Square",
    "Ln": "Lane", "Cres": "Crescent", "Ter": "Terrace",
    "Upp": "Upper", "Jln": "Jalan", "Jln.": "Jalan",
    "Lor": "Lorong", "Lor.": "Lorong", "Bt": "Bukit",
}

# --- A5: tag-key classification regexes (tags.py:~L5-L7 [C]) ---------------
# Spark `rlike` and DuckDB `regexp_matches` both do unanchored search, so the
# anchors are explicit.
RE_LOWER = r"^([a-z]|_)*$"
RE_LOWER_COLON = r"^([a-z]|_)*:([a-z]|_)*$"
# problemchars: any of  = + / & < > ; ' " ? % # $ @ , . and whitespace —
# the FULL reference class (tags.py:~L7 [C]), including the literal dot.
# This constant is the single source of truth: tests/oracle.py and the
# driver entry's shared SQL both derive from it (VERDICT r1 item 1).
RE_PROBLEMCHARS = r"""[=\+/&<>;'"\?%#$@\,\. \t\r\n]"""
# Same class as a fragment for embedding in a single-quoted SQL string
# literal ('' = escaped quote; parses identically on Spark SQL and DuckDB,
# and \t/\r/\n resolve to the same chars in both regex engines).
SQL_PROBLEMCHARS = "[=+/&<>;''\"?%#$@,. \\t\\r\\n]"

# --- A8: street-type extraction regex (audit.py:~L18 street_type_re [C]) ---
# last non-space token, optional trailing period stripped by the group
RE_STREET_TYPE_LAST = r"\b(\S+?)\.?$"

# --- A12: postcode validity (Singapore extract [R], BASELINE north_star [D])
RE_POSTCODE_SG = r"^[0-8][0-9]{5}$"     # 6 digits, districts 01-80
RE_POSTCODE_MY = r"^[0-9]{5}$"          # 5-digit Malaysian fringe (79xxx-81xxx)

# --- geography: Singapore-like bbox + Malaysian fringe (FIXTURES.md) -------
SG_BBOX = dict(lat_min=1.13, lat_max=1.47, lon_min=103.6, lon_max=104.1)
MY_BBOX = dict(lat_min=1.47, lat_max=1.75, lon_min=103.5, lon_max=104.0)

# hot-city centers for skew-realistic datagen (FIXTURES.md: H=5, one city ~40%)
HOT_CITIES = [
    (1.290, 103.850),  # "downtown"  (~40% of nodes)
    (1.350, 103.690),  # "west"
    (1.370, 103.950),  # "east"
    (1.430, 103.790),  # "north"
    (1.320, 103.900),  # "central-east"
]
CITY_WEIGHTS = [40, 15, 15, 15, 15]  # percent

EARTH_RADIUS_M = 6371008.8
