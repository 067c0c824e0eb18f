"""Property-based tests (hypothesis) for the hand-built operators — the
ones Spark doesn't provide natively and the oracle can't fully pin
(SURVEY §5.2 hardening).
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flinkexp_spark.operators.asof import asof_join
from flinkexp_spark.operators.salting import salted_agg

KEYS = ["k0", "k1"]


@st.composite
def asof_case(draw):
    left = draw(
        st.lists(
            st.tuples(st.sampled_from(KEYS), st.integers(0, 50)),
            min_size=1,
            max_size=12,
        )
    )
    right = draw(
        st.lists(
            st.tuples(
                st.sampled_from(KEYS), st.integers(0, 50), st.integers(-99, 99)
            ),
            min_size=0,
            max_size=12,
            unique_by=lambda r: (r[0], r[1]),  # one version per (key, ts)
        )
    )
    return left, right


@given(asof_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_join_matches_naive_semantics(spark, case):
    left, right = case
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key string, lts long, lid long"
    )
    rdf = spark.createDataFrame(right, "key string, rts long, val long")
    out = asof_join(ldf, rdf, on="key", left_ts="lts", right_ts="rts")
    got = {r.lid: r.right_val for r in out.collect()}

    for lid, (k, t) in enumerate(left):
        versions = [(rts, val) for (rk, rts, val) in right if rk == k and rts <= t]
        expect = max(versions)[1] if versions else None
        assert got[lid] == expect, (lid, k, t, versions)


@given(
    st.lists(
        st.tuples(st.sampled_from(["a", "b"]), st.integers(0, 1000)),
        min_size=1,
        max_size=30,
    ),
    st.integers(1, 8),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_salted_agg_equals_plain_agg(spark, rows, n_salts):
    df = spark.createDataFrame(
        [(k, v, i) for i, (k, v) in enumerate(rows)], "key string, v long, rid long"
    )
    salted = salted_agg(
        df,
        keys=["key"],
        aggs={
            "n": (F.count("*"), F.sum("n").cast("long")),
            "s": (F.sum("v"), F.sum("s").cast("long")),
        },
        salt_col="rid",
        n_salts=n_salts,
    )
    got = {r.key: (r.n, r.s) for r in salted.collect()}
    plain = {
        r.key: (r.n, r.s)
        for r in df.groupBy("key")
        .agg(F.count("*").alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == plain


@given(
    st.lists(
        st.lists(
            st.text(alphabet="abcxyz", min_size=1, max_size=4),
            min_size=0,
            max_size=6,
        ),
        min_size=1,
        max_size=8,
    )
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_datastream_chain_matches_counter_model(spark, lines):
    """Property: the adapter's reference chain (flat_map -> map -> key_by ->
    sum) equals collections.Counter over arbitrary token lists, on BOTH
    expression paths (codegen SQL strings and Python callables)."""
    from collections import Counter

    from flinkexp_spark.datastream import StreamExecutionEnvironment

    text_lines = [" ".join(words) for words in lines]
    model = Counter(w for words in lines for w in words if w != "")

    df = spark.createDataFrame([(ln,) for ln in text_lines], "value string")
    env = StreamExecutionEnvironment.get_execution_environment(spark)

    sql_path = (
        env.from_data_frame(df)
        .flat_map("split(value, ' ')", output_type="word string")
        .filter("word <> ''")
        .map(["word", "CAST(1 AS BIGINT) AS one"])
        .key_by(0)
        .sum(1)
        .df.collect()
    )
    assert {(r.word, r.one) for r in sql_path} == set(model.items())

    py_path = (
        env.from_data_frame(df)
        .flat_map(
            lambda line: [w for w in line.split(" ") if w != ""],
            output_type="word string",
        )
        .map(lambda w: (w, 1), output_type="word string, one long")
        .key_by(0)
        .sum(1)
        .df.collect()
    )
    assert {(r.word, r.one) for r in py_path} == set(model.items())


# --- connected components: large-star/small-star vs union-find model --------


def _uf_components(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


@given(
    st.lists(
        st.tuples(st.integers(0, 12), st.integers(0, 12)),
        min_size=1,
        max_size=16,
    ).filter(lambda es: any(u != v for u, v in es))
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_star_components_match_union_find(spark, edges):
    from flinkexp_spark.operators.components import connected_components_star

    df = spark.createDataFrame(
        [(u, v) for u, v in edges if u != v], "id_a long, id_b long"
    )
    got = {r.node: r.component for r in connected_components_star(df).collect()}
    assert got == _uf_components([(u, v) for u, v in edges if u != v])


def test_star_components_long_chain_beats_diameter(spark):
    """A 64-node path graph (diameter 63) — far beyond min-label
    propagation's round budget — collapses to one component in the star
    path's O(log n) rounds."""
    from flinkexp_spark.operators.components import connected_components_star

    chain = [(i, i + 1) for i in range(63)]
    df = spark.createDataFrame(chain, "id_a long, id_b long")
    out = connected_components_star(df).collect()
    assert len(out) == 64
    assert {r.component for r in out} == {0}
