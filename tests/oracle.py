"""Pure-Python single-node oracle for Tier-A semantics (SURVEY §5.2.1).

An INDEPENDENT re-implementation of the reference's audit/shape behavior
(audit.py / tags.py / users.py / data.py [C]) in plain Python dict/set/re —
deliberately mirroring the reference's row-at-a-time style, NOT the engine's
DataFrame style — used by pytest to check the distributed operators.

Input: list of (doc_id, spans) where spans is a list of dicts with keys
kind/text/media_ref/offset (collected from the fixture DataFrame).
"""

from __future__ import annotations

import json
import re
from collections import Counter, defaultdict

from osmspark.config import (
    EXPECTED_STREET_TYPES,
    MALAY_PREFIX_TYPES,
    STREET_TYPE_MAPPING,
)

street_type_re = re.compile(r"\b(\S+?)\.?$")
lower = re.compile(r"^([a-z]|_)*$")
lower_colon = re.compile(r"^([a-z]|_)*:([a-z]|_)*$")
problemchars = re.compile(r"""[=\+/&<>;'"\?%#$@\,\. \t\r\n]""")

_PREFIX_FORMS = sorted(
    set(MALAY_PREFIX_TYPES)
    | {a for a, f in STREET_TYPE_MAPPING.items() if f in MALAY_PREFIX_TYPES}
)


def iter_elements(docs):
    """Parsed node/way payloads, in document order (the iterparse analogue)."""
    for doc_id, spans in docs:
        for pos, s in enumerate(spans):
            if s["kind"] in ("node", "way"):
                el = json.loads(s["text"])
                el["_kind"] = s["kind"]
                el["_doc_id"] = doc_id
                el["_pos"] = pos
                yield el


def tag_name_frequency(docs):
    """A4 (mapparser.count_tags)."""
    c = Counter()
    for _, spans in docs:
        for s in spans:
            c[s["kind"]] += 1
    return dict(c)


def key_class_counts(docs):
    """A5 (tags.key_type/process_map) over node tag keys."""
    c = Counter()
    for el in iter_elements(docs):
        if el["_kind"] != "node":
            continue
        for k in (el.get("tags") or {}):
            if lower.search(k):
                c["lower"] += 1
            elif lower_colon.search(k):
                c["lower_colon"] += 1
            elif problemchars.search(k):
                c["problemchars"] += 1
            else:
                c["other"] += 1
    return dict(c)


def distinct_users(docs):
    """A6 (users.process_map)."""
    return len({el["uid"] for el in iter_elements(docs) if el.get("uid")})


def street_type(name: str) -> str:
    first = name.split(" ")[0]
    if first in _PREFIX_FORMS:
        return first
    m = street_type_re.search(name)
    return m.group(1) if m else name


def audit_streets(docs):
    """A9+A10 (audit.audit): unexpected type -> set of example names."""
    st = defaultdict(set)
    counts = Counter()
    for el in iter_elements(docs):
        if el["_kind"] != "node":
            continue
        street = (el.get("tags") or {}).get("addr:street")
        if not street:
            continue
        t = street_type(street)
        if t not in EXPECTED_STREET_TYPES:
            st[t].add(street)
            counts[t] += 1
    return {t: (sorted(v), counts[t]) for t, v in st.items()}


def normalized_street_counts(docs):
    """A8+A11 (audit.update_name) — the flagship query."""
    c = Counter()
    for el in iter_elements(docs):
        if el["_kind"] != "node":
            continue
        street = (el.get("tags") or {}).get("addr:street")
        if not street:
            continue
        t = street_type(street)
        c[STREET_TYPE_MAPPING.get(t, t)] += 1
    return dict(c)


def postcode_partition(docs):
    """A12."""
    c = Counter()
    for el in iter_elements(docs):
        if el["_kind"] != "node":
            continue
        pc = (el.get("tags") or {}).get("addr:postcode")
        if pc is None:
            continue
        if re.fullmatch(r"[0-8][0-9]{5}", pc):
            c["valid_sg"] += 1
        elif re.fullmatch(r"[0-9]{5}", pc):
            c["out_of_area"] += 1
        else:
            c["invalid"] += 1
    return dict(c)


CREATED = ["version", "changeset", "timestamp", "user", "uid"]


def shape_element(el):
    """A13/A14 (data.shape_element): independent dict-based reimpl."""
    if el["_kind"] not in ("node", "way"):
        return None
    shaped = {
        "id": el.get("id"),
        "type": el["_kind"],
        "created": {k: el.get(k) for k in CREATED},
    }
    if el["_kind"] == "node":
        shaped["pos"] = [float(el["lat"]), float(el["lon"])]
    address, tags = {}, {}
    for k, v in (el.get("tags") or {}).items():
        if problemchars.search(k):
            continue
        if k.startswith("addr:"):
            rest = k[5:]
            if ":" in rest:
                continue  # two-level addr keys dropped (data.py:~L52 [C])
            address[rest] = v
        else:
            tags[k] = v
    shaped["address"] = address
    shaped["tags"] = tags
    if el["_kind"] == "way":
        shaped["node_refs"] = list(el.get("nd") or [])
    return shaped


def top_users(docs, k=10):
    """A18: ties broken by user asc."""
    c = Counter(el["user"] for el in iter_elements(docs) if el.get("user"))
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]


def top_amenities(docs, k=10):
    """A20."""
    c = Counter()
    for el in iter_elements(docs):
        if el["_kind"] != "node":
            continue
        a = (el.get("tags") or {}).get("amenity")
        if a:
            c[a] += 1
    return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
