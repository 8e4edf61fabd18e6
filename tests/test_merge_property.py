"""Property-based check of operators/merge.merge_into against a plain
Python reference implementation on hypothesis-generated tables —
duplicate target keys, null-free key domains, arbitrary tombstone
placement, insert on/off."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),       # key
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=0,
    max_size=12,
)
_src_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),
        st.integers(min_value=-100, max_value=100),
        st.booleans(),                                # tombstone
    ),
    min_size=0,
    max_size=10,
    unique_by=lambda r: r[0],  # source keys must be unique (Delta rule)
)


def _reference_merge(target, source, insert):
    src = {k: (v, dele) for k, v, dele in source}
    out = []
    for k, v in target:
        if k in src:
            sv, dele = src[k]
            if not dele:
                out.append((k, sv, "update"))
        else:
            out.append((k, v, "carry"))
    if insert:
        tkeys = {k for k, _ in target}
        for k, (sv, dele) in sorted(src.items()):
            if k not in tkeys:
                out.append((k, sv, "insert"))
    return sorted(out)


@settings(max_examples=12, deadline=None)
@given(target=_rows, source=_src_rows, insert=st.booleans())
def test_merge_matches_reference(spark, target, source, insert):
    from bigdata_spark.operators.merge import merge_into

    t = spark.createDataFrame(target or [(99, 0)], "k long, v long")
    if not target:
        t = t.filter(F.lit(False))
    s = spark.createDataFrame(
        source or [(99, 0, False)], "k long, v long, is_delete boolean"
    )
    if not source:
        s = s.filter(F.lit(False))
    got = sorted(
        (r["k"], r["v"], r["action"])
        for r in merge_into(
            t, s, ["k"], delete_when=F.col("s.is_delete"),
            insert=insert, action_col="action",
        ).collect()
    )
    assert got == _reference_merge(target, source, insert)
