"""Property-based tests for the hand-written Avro codec (avro_lite).

A binary coder's bugs live in the corners enumeration misses — varint
boundaries, empty containers, unicode surrogata, deep nesting. Hypothesis
drives randomized (schema, records) pairs through write→read and asserts
exact round-trip; the schema itself is part of the generated input, so
the generator explores record/array/map/union/fixed compositions the
hand-written tests never spell out. Pure Python (no Spark session), so
the whole file runs in seconds.
"""

from __future__ import annotations

import io
import math

from hypothesis import given, settings, strategies as st

from big_data_analytics_machine_learning_poc_spark.sources import avro_lite

# ---------------------------------------------------------------------------
# varint longs: the foundation everything else stands on
# ---------------------------------------------------------------------------

longs = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@settings(max_examples=300, deadline=None)
@given(longs)
def test_long_roundtrip(n):
    buf = io.BytesIO()
    avro_lite.write_long(buf, n)
    assert avro_lite.read_long(io.BytesIO(buf.getvalue())) == n


@settings(max_examples=50, deadline=None)
@given(st.lists(longs, min_size=0, max_size=50))
def test_long_stream_roundtrip(ns):
    buf = io.BytesIO()
    for n in ns:
        avro_lite.write_long(buf, n)
    rd = io.BytesIO(buf.getvalue())
    assert [avro_lite.read_long(rd) for _ in ns] == ns


# ---------------------------------------------------------------------------
# (schema, value) joint generation
# ---------------------------------------------------------------------------

_names = iter(range(10**9))


def _fresh(prefix: str) -> str:
    return f"{prefix}_{next(_names)}"


def _leaf():
    """(avro schema, value strategy) for leaf types."""
    finite_doubles = st.floats(allow_nan=False, width=64)
    # float32: round-trip through a 4-byte cast so equality is exact
    float32 = st.floats(allow_nan=False, width=32)
    return st.sampled_from(
        [
            ("long", longs),
            ("int", st.integers(min_value=-(2**31), max_value=2**31 - 1)),
            ("string", st.text(max_size=40)),
            ("bytes", st.binary(max_size=40)),
            ("boolean", st.booleans()),
            ("double", finite_doubles),
            ("float", float32),
        ]
    )


def _schema_and_value(depth: int = 2):
    """Strategy of (schema, one-record strategy) pairs, recursively built."""

    def build(d):
        base = _leaf()
        if d <= 0:
            return base

        def extend(pair_strategy):
            return st.one_of(
                pair_strategy,
                # nullable union
                pair_strategy.map(
                    lambda p: (["null", p[0]], st.one_of(st.none(), p[1]))
                ),
                # array
                pair_strategy.map(
                    lambda p: (
                        {"type": "array", "items": p[0]},
                        st.lists(p[1], max_size=5),
                    )
                ),
                # map
                pair_strategy.map(
                    lambda p: (
                        {"type": "map", "values": p[0]},
                        st.dictionaries(st.text(max_size=8), p[1], max_size=5),
                    )
                ),
                # record
                st.lists(pair_strategy, min_size=1, max_size=3).map(
                    lambda ps: (
                        {
                            "type": "record",
                            "name": _fresh("rec"),
                            "fields": [
                                {"name": f"f{i}", "type": s}
                                for i, (s, _) in enumerate(ps)
                            ],
                        },
                        st.tuples(*[v for (_, v) in ps]).map(
                            lambda vals: {f"f{i}": v for i, v in enumerate(vals)}
                        ),
                    )
                ),
            )

        return extend(build(d - 1))

    return build(depth)


record_schemas = st.lists(_schema_and_value(), min_size=1, max_size=4).map(
    lambda ps: (
        {
            "type": "record",
            "name": _fresh("top"),
            "fields": [{"name": f"c{i}", "type": s} for i, (s, _) in enumerate(ps)],
        },
        st.tuples(*[v for (_, v) in ps]).map(
            lambda vals: {f"c{i}": v for i, v in enumerate(vals)}
        ),
    )
)


def _close(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) == math.isnan(b)
        # float32 narrowing is the only tolerated difference
        import struct as _s

        return a == b or _s.unpack("<f", _s.pack("<f", a))[0] == b
    if isinstance(a, dict) and isinstance(b, dict):
        return a.keys() == b.keys() and all(_close(a[k], b[k]) for k in a)
    if isinstance(a, list) and isinstance(b, list):
        return len(a) == len(b) and all(_close(x, y) for x, y in zip(a, b))
    return a == b


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_ocf_roundtrip_random_schemas(data):
    import os
    import tempfile

    schema, value_strategy = data.draw(record_schemas)
    records = data.draw(st.lists(value_strategy, min_size=0, max_size=8))
    codec = data.draw(st.sampled_from(["null", "deflate"]))
    fd, path = tempfile.mkstemp(suffix=".avro")
    os.close(fd)
    try:
        avro_lite.write_ocf(path, schema, records, codec=codec)
        got_schema, got = avro_lite.read_ocf(path)
    finally:
        os.remove(path)
    assert got_schema == schema
    assert len(got) == len(records)
    for g, w in zip(got, records):
        assert _close(g, w), (g, w)


@settings(max_examples=100, deadline=None)
@given(st.binary(min_size=0, max_size=200))
def test_reader_never_hangs_on_garbage(blob):
    """Arbitrary bytes must raise a typed error (ValueError/EOFError/
    NotImplementedError/Key/Unicode), never loop or crash the process."""
    try:
        avro_lite.read_ocf_bytes(blob)
    except (ValueError, EOFError, NotImplementedError, KeyError, UnicodeDecodeError):
        pass
