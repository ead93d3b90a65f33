"""Geohash encode/decode — fully native Spark expressions, bit-compatible
with the published public spec (Niemeyer 2008; the base32 interleaved
binary-subdivision scheme documented on the public wiki).

Unlike the S2/hex modules (self-consistent, env-blocked from external
bit-compat — see `s2.py` docstring), geohash's spec is small enough to
implement exactly, so this is the engine's one grid that IS bit-exact to
the outside world: `encode(57.64911, 10.40744, 11) == "u4pruydqqvj"`.

Everything here is a composition of built-in Spark functions (shift/mask
Morton spread, `element_at` over an alphabet array literal, `aggregate`
over split chars for decode) — the whole path stays inside WholeStageCodegen
with zero Python in the plan, unlike the Arrow-UDF cell indexes.  At 100 TB
this is a map-side projection: no shuffle, no state, nothing to tune.

Layout (per the public spec): precision p -> 5p bits alternating
lon,lat,lon,... from the MSB; lon gets ceil(5p/2) bits, lat floor(5p/2);
each 5-bit group maps through the base32 alphabet
"0123456789bcdefghjkmnpqrstuvwxyz".  p <= 12 keeps the packed value in 60
bits, inside int64.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from osmspark.functions.expr import let_

B32 = "0123456789bcdefghjkmnpqrstuvwxyz"


# Let-binding barrier (see functions/expr.py for the full rationale).
# The shift/mask cascades below reference their argument twice per step, so
# a k-step cascade embeds 2^k copies of the argument's tree; COMPOSED (e.g.
# `encode(decode(gh).lat, ...)`) that reaches millions of nodes and
# stack-overflows the JVM during analysis.  decode/neighbors sit behind the
# barrier; `encode` itself stays a pure codegen cascade.
_let = let_

# Morton spread/compact magic masks (public bit-twiddling identities):
# _spread places the low 32 bits of x at even bit positions of an int64.
_SPREAD_STEPS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread(x: Column) -> Column:
    for shift, mask in _SPREAD_STEPS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


# each gather shift pairs with the NEXT coarser mask (not _SPREAD_STEPS
# reversed — pairing shift 1 with 0x5555… would erase the gathered bits)
_COMPACT_STEPS = (
    (1, 0x3333333333333333),
    (2, 0x0F0F0F0F0F0F0F0F),
    (4, 0x00FF00FF00FF00FF),
    (8, 0x0000FFFF0000FFFF),
    (16, 0x00000000FFFFFFFF),
)


def _compact(x: Column) -> Column:
    """Inverse of _spread: gather even bit positions into the low 32."""
    x = x.bitwiseAND(F.lit(0x5555555555555555))
    for shift, mask in _COMPACT_STEPS:
        x = x.bitwiseOR(F.shiftright(x, shift)).bitwiseAND(F.lit(mask))
    return x


def _quantize(coord: Column, lo: float, span: float, nbits: int) -> Column:
    """floor((coord - lo) / span * 2^nbits), clamped into [0, 2^nbits - 1].

    The clamp makes the closed upper edge (lat=90, lon=180) encode to the
    all-ones cell instead of overflowing, matching the subdivision loop's
    `>= mid` convention everywhere else.
    """
    scaled = F.floor((coord - F.lit(lo)) / F.lit(span) * F.lit(float(1 << nbits)))
    return F.greatest(F.lit(0), F.least(F.lit((1 << nbits) - 1), scaled))


def _pack(lat: Column, lon: Column, precision: int) -> Column:
    """Quantize + Morton-interleave lat/lon into the 5*precision-bit long."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2  # lon owns the MSB and any odd extra bit
    nlat = nbits // 2
    lat_q = _quantize(lat, -90.0, 180.0, nlat)
    lon_q = _quantize(lon, -180.0, 360.0, nlon)
    if nbits % 2:
        # lon bits at even positions (incl. both MSB and LSB), lat at odd
        return _spread(lon_q).bitwiseOR(F.shiftleft(_spread(lat_q), 1))
    # lon bits at odd positions (MSB), lat at even
    return F.shiftleft(_spread(lon_q), 1).bitwiseOR(_spread(lat_q))


def _chars_from(val: Column, precision: int) -> Column:
    """Packed long -> base32 string (references `val` once per char)."""
    alphabet = F.array(*[F.lit(c) for c in B32])
    chars = [
        F.element_at(
            alphabet,
            (
                F.shiftright(val, 5 * (precision - 1 - k)).bitwiseAND(F.lit(31))
                + F.lit(1)
            ).cast("int"),
        )
        for k in range(precision)
    ]
    return F.concat(*chars)


def encode(lat: Column, lon: Column, precision: int = 9) -> Column:
    """lat/lon (degrees, double) -> geohash string of `precision` chars.

    Pure native expression; null lat/lon propagates to a null geohash.

    Hot-path note: this is a plain codegen cascade — fast in bulk, but it
    references its lat/lon arguments ~2^5 times (see `_let`).  Passing a
    LARGE expression (e.g. a `decode(...)` field) as lat/lon multiplies
    that expression's tree; materialize between stages, or use
    `_encode_interp` when composing inside one projection.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    return _chars_from(_pack(lat, lon, precision), precision)


def _encode_interp(lat: Column, lon: Column, precision: int) -> Column:
    """encode() variant safe to compose with large argument expressions:
    the packed value sits behind a `_let` barrier, so lat/lon are each
    referenced once and evaluated once.  Interpreted (HOF), not codegen —
    use for query-side composition (e.g. `neighbors`), not bulk scans.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    return _let(
        F.struct(lat.alias("a"), lon.alias("o")),
        lambda s: _let(
            _pack(s["a"], s["o"], precision),
            lambda v: _chars_from(v, precision),
        ),
    )


def decode(gh: Column) -> Column:
    """geohash string (any length 1..12, may vary per row) ->
    struct(lat, lon, lat_err, lon_err): the cell CENTER plus half-extents.

    Variable-length rows are handled natively: split -> map-lookup ->
    aggregate fold rebuilds the packed value, then a parity-branched
    Morton compact recovers the two axes.  Unknown chars yield a null
    struct (the map lookup returns null and propagates).
    """
    chars = F.filter(F.split(gh, ""), lambda c: c != F.lit(""))
    charmap = F.create_map(
        *[x for i, c in enumerate(B32) for x in (F.lit(c), F.lit(i))]
    )
    idxs = F.transform(chars, lambda c: F.element_at(charmap, c))
    val = F.aggregate(
        idxs,
        F.lit(0).cast("long"),
        lambda acc, x: F.shiftleft(acc, 5).bitwiseOR(x.cast("long")),
    )
    n = F.length(gh) * 5

    # `_let` barrier: the `_compact` cascades below reference the packed
    # value 2^5 times each; binding struct(val, n) makes those references
    # leaf lambda variables, so `gh` is referenced exactly twice and the
    # fold over its chars runs once per row instead of ~128 times.
    def _body(s):
        v, nb = s["v"], s["n"]
        nlon = F.shiftright(nb + 1, 1)
        nlat = F.shiftright(nb, 1)
        odd = nb.bitwiseAND(F.lit(1)) == F.lit(1)
        lon_q = F.when(odd, _compact(v)).otherwise(_compact(F.shiftright(v, 1)))
        lat_q = F.when(odd, _compact(F.shiftright(v, 1))).otherwise(_compact(v))
        lat_cells = F.pow(F.lit(2.0), nlat.cast("double"))
        lon_cells = F.pow(F.lit(2.0), nlon.cast("double"))
        lat = (lat_q.cast("double") + F.lit(0.5)) * F.lit(180.0) / lat_cells - F.lit(
            90.0
        )
        lon = (lon_q.cast("double") + F.lit(0.5)) * F.lit(360.0) / lon_cells - F.lit(
            180.0
        )
        return F.struct(
            lat.alias("lat"),
            lon.alias("lon"),
            (F.lit(90.0) / lat_cells).alias("lat_err"),
            (F.lit(180.0) / lon_cells).alias("lon_err"),
        )

    return _let(F.struct(val.alias("v"), n.alias("n")), _body)


def neighbors(gh: Column, precision: int) -> Column:
    """The up-to-8 adjacent cells of a `precision`-char geohash, as an
    array of geohash strings.

    Decode-center +/- one cell step, re-encode — the step is exactly one
    cell because decode returns half-extents.  Longitude wraps across the
    antimeridian; latitude steps past a pole are dropped (array_compact),
    so polar cells return 5 neighbors like the published libraries do.
    Native end-to-end; used by the prefix-range scan below.  The decoded
    center sits behind a `_let` barrier (decode runs once per row), and the
    8 re-encodes use `_encode_interp` so the struct fields aren't
    multiplied through the spread cascades.
    """

    def _body(c):
        out = []
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dx == 0 and dy == 0:
                    continue
                nlat = c["lat"] + F.lit(float(dy)) * F.lit(2.0) * c["lat_err"]
                nlon = c["lon"] + F.lit(float(dx)) * F.lit(2.0) * c["lon_err"]
                nlon = F.pmod(nlon + F.lit(180.0), F.lit(360.0)) - F.lit(180.0)
                out.append(
                    F.when(
                        F.abs(nlat) <= F.lit(90.0),
                        _encode_interp(nlat, nlon, precision),
                    )
                )
        return F.array_compact(F.array(*out))

    return _let(decode(gh), _body)


def _encode_py(lat: float, lon: float, precision: int) -> str:
    """Driver-side twin of `encode` (same quantize/interleave layout) for
    the cover enumerator below — bit-identical by construction and pinned
    to the Spark path by tests."""
    nbits = 5 * precision
    nlon = (nbits + 1) // 2
    nlat = nbits // 2
    lat_q = min((1 << nlat) - 1, max(0, int((lat + 90.0) / 180.0 * (1 << nlat))))
    lon_q = min((1 << nlon) - 1, max(0, int((lon + 180.0) / 360.0 * (1 << nlon))))
    bits = []
    for j in range(nbits):
        if j % 2 == 0:  # lon owns even positions from the MSB
            bits.append((lon_q >> (nlon - 1 - j // 2)) & 1)
        else:
            bits.append((lat_q >> (nlat - 1 - (j - 1) // 2)) & 1)
    out = []
    for k in range(precision):
        v = 0
        for b in bits[5 * k : 5 * k + 5]:
            v = v * 2 + b
        out.append(B32[v])
    return "".join(out)


def cover_bbox(
    lat_min: float,
    lat_max: float,
    lon_min: float,
    lon_max: float,
    precision: int,
    max_cells: int = 4096,
) -> list[str]:
    """The prefix-range scan: every `precision`-char geohash whose cell
    intersects the bbox, as a sorted driver-side list.

    This is the pruning primitive for geohash-keyed layouts at scale: a
    table written with a geohash partition/sort column turns a bbox query
    into `F.col("gh").isin(cover)` (or a `startswith` union on shorter
    prefixes), which Spark pushes into the parquet scan as partition
    pruning / row-group min-max skipping — no geometry evaluated until
    after the skip.  Purely driver-side arithmetic over the quantized
    index ranges (no Spark job, no per-cell encode of data rows).

    `lon_min > lon_max` means the bbox crosses the antimeridian and is
    treated as the union of [lon_min, 180] and [-180, lon_max].

    Raises ValueError when the cover would exceed `max_cells` — pick a
    coarser precision (each char is a 32× cell-count step) rather than
    shipping a huge IN-list into the scan.
    """
    if not 1 <= precision <= 12:
        raise ValueError(f"geohash precision must be in [1, 12], got {precision}")
    if not (-90.0 <= lat_min <= lat_max <= 90.0):
        raise ValueError(f"bad latitude range [{lat_min}, {lat_max}]")
    nbits = 5 * precision
    nlon_bits = (nbits + 1) // 2
    nlat_bits = nbits // 2

    def q(coord: float, lo: float, span: float, nb: int) -> int:
        return min((1 << nb) - 1, max(0, int((coord - lo) / span * (1 << nb))))

    lat_lo = q(lat_min, -90.0, 180.0, nlat_bits)
    lat_hi = q(lat_max, -90.0, 180.0, nlat_bits)
    lon_ranges = (
        [(lon_min, lon_max)]
        if lon_min <= lon_max
        else [(lon_min, 180.0), (-180.0, lon_max)]
    )
    lon_spans = []
    for a, b in lon_ranges:
        lon_spans.append((q(a, -180.0, 360.0, nlon_bits), q(b, -180.0, 360.0, nlon_bits)))
    n_cells = (lat_hi - lat_lo + 1) * sum(b - a + 1 for a, b in lon_spans)
    if n_cells > max_cells:
        raise ValueError(
            f"bbox cover at precision {precision} is {n_cells} cells "
            f"(> max_cells={max_cells}); use a coarser precision"
        )
    lat_cell = 180.0 / (1 << nlat_bits)
    lon_cell = 360.0 / (1 << nlon_bits)
    out = []
    for lq in range(lat_lo, lat_hi + 1):
        clat = -90.0 + (lq + 0.5) * lat_cell
        for a, b in lon_spans:
            for oq in range(a, b + 1):
                clon = -180.0 + (oq + 0.5) * lon_cell
                out.append(_encode_py(clat, clon, precision))
    return sorted(set(out))
