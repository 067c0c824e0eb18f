"""Property-based tests (hypothesis) for the hand-built operators — the
ones Spark doesn't provide natively and the oracle can't fully pin
(SURVEY §5.2 hardening).
"""

from __future__ import annotations

import pytest
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


@given(asof_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_forward_matches_naive_semantics(spark, case):
    """direction="forward": earliest right at-or-after, ties included."""
    left, right = case
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key string, lts long, lid long"
    )
    rdf = spark.createDataFrame(right, "key string, rts long, val long")
    out = asof_join(
        ldf, rdf, on="key", left_ts="lts", right_ts="rts", direction="forward"
    )
    got = {r.lid: r.right_val for r in out.collect()}

    for lid, (k, t) in enumerate(left):
        versions = [(rts, val) for (rk, rts, val) in right if rk == k and rts >= t]
        expect = min(versions)[1] if versions else None
        assert got[lid] == expect, (lid, k, t, versions)


@given(asof_case(), st.integers(0, 10))
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_forward_tolerance_bounds_lookahead(spark, case, tol):
    """forward + tolerance: a match farther than tol seconds AHEAD nulls
    out, mirroring the backward staleness contract."""
    left, right = case
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], "key string, lts long, lid long"
    )
    rdf = spark.createDataFrame(right, "key string, rts long, val long")
    out = asof_join(
        ldf,
        rdf,
        on="key",
        left_ts="lts",
        right_ts="rts",
        direction="forward",
        tolerance_s=tol,
    )
    got = {r.lid: r.right_val for r in out.collect()}

    for lid, (k, t) in enumerate(left):
        versions = [
            (rts, val)
            for (rk, rts, val) in right
            if rk == k and t <= rts  # at-or-after
        ]
        expect = min(versions)[1] if versions and min(versions)[0] - t <= tol else None
        assert got[lid] == expect, (lid, k, t, tol, versions)


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


@st.composite
def merge_case(draw):
    base = draw(
        st.lists(
            st.tuples(st.integers(0, 20), st.integers(-99, 99)),
            min_size=0,
            max_size=12,
            unique_by=lambda r: r[0],
        )
    )
    ops = draw(
        st.lists(
            st.tuples(
                st.integers(0, 25),
                st.sampled_from(["U", "I", "D"]),
                st.integers(-99, 99),
            ),
            min_size=0,
            max_size=12,
            unique_by=lambda r: r[0],
        )
    )
    return base, ops


@given(merge_case())
@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_merge_upsert_matches_dict_model(spark, case):
    """MERGE semantics == the obvious dict model: D removes, U/I replace-or-
    insert, untouched base rows survive."""
    from flinkexp_spark.operators.maintenance import merge_upsert

    base, ops = case
    t = spark.createDataFrame(base, "k long, v long") if base else (
        spark.createDataFrame([], "k long, v long")
    )
    u = spark.createDataFrame(
        [(k, op, v) for k, op, v in ops], "k long, op string, v long"
    ) if ops else spark.createDataFrame([], "k long, op string, v long")
    got = {r.k: r.v for r in merge_upsert(t, u, "k").collect()}

    model = dict(base)
    for k, op, v in ops:
        if op == "D":
            model.pop(k, None)
        else:
            model[k] = v
    assert got == model


def test_merge_upsert_contract_violations(spark):
    """SQL-MERGE parity contract: duplicate source keys and missing target
    columns must raise, not silently merge (round-3 review fix)."""
    import pytest as _pytest

    from flinkexp_spark.operators.maintenance import merge_upsert

    t = spark.createDataFrame([(1, 10)], "k long, v long")
    dup = spark.createDataFrame(
        [(1, "U", 1), (1, "U", 2)], "k long, op string, v long"
    )
    with _pytest.raises(ValueError, match="duplicate keys"):
        merge_upsert(t, dup, "k")
    # explicit opt-out skips the check (caller asserts uniqueness upstream)
    assert merge_upsert(t, dup, "k", check_unique=False) is not None

    missing = spark.createDataFrame([(1, "U")], "k long, op string")
    with _pytest.raises(ValueError, match="missing target columns"):
        merge_upsert(t, missing, "k")


def test_register_views_per_session(spark, sf_dir):
    """Temp views are session-scoped: a second session in the same
    application must get its own registration, not a memo skip
    (round-3 review fix — weak-keyed per-session memo)."""
    from flinkexp_spark.datasets import register_views

    register_views(spark, sf_dir)
    s2 = spark.newSession()
    register_views(s2, sf_dir)
    assert s2.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25
    assert spark.sql("SELECT count(*) AS n FROM nation").collect()[0].n == 25


@st.composite
def jaccard_corpus(draw):
    # token sets over a small alphabet so collisions and near-dups happen
    return draw(
        st.lists(
            st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=8),
            min_size=2,
            max_size=10,
        )
    )


@given(jaccard_corpus())
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_prefix_filter_jaccard_is_lossless(spark, case):
    """The WWW'07 prefix filter must lose NO pair: the Spark prefix-join
    pipeline equals brute force over every random corpus, not just the
    fixture (the oracle already proves it there)."""
    from pyspark.sql import Window

    T = 0.6
    sets = [sorted(set(doc)) for doc in case]
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(sets)], "doc_id long, sh array<string>"
    ).withColumn("n", F.size("sh"))
    post = df.select("doc_id", "n", F.explode("sh").alias("g"))
    dfreq = post.groupBy("g").agg(F.count("*").alias("gdf"))
    pl = F.col("n") - F.ceil(F.lit(T) * F.col("n")) + 1
    prefix = (
        post.join(dfreq, "g")
        .withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("doc_id").orderBy("gdf", "g")),
        )
        .filter(F.col("rn") <= pl)
        .select("doc_id", "g")
    )
    cand = (
        prefix.alias("a")
        .join(prefix.alias("b"), "g")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("ia"), F.col("b.doc_id").alias("ib"))
        .distinct()
    )
    got = set()
    sa = df.select(F.col("doc_id").alias("ia"), F.col("sh").alias("sha"))
    sb = df.select(F.col("doc_id").alias("ib"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect("sha", "shb"))
    jac = inter * F.lit(1.0) / (F.size("sha") + F.size("shb") - inter)
    for r in (
        cand.join(sa, "ia").join(sb, "ib").filter(jac >= T).select("ia", "ib").collect()
    ):
        got.add((r.ia, r.ib))

    brute = set()
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            a, b = set(sets[i]), set(sets[j])
            if len(a & b) / len(a | b) >= T:
                brute.add((i, j))
    assert got == brute


@given(
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=40, unique=True),
    st.lists(st.integers(-(2**40), 2**40), min_size=1, max_size=60, unique=True),
)
@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_bloom_never_drops_a_member(spark, members, probes):
    """Bloom prefilter soundness: EVERY probe key that is a member must
    survive the filter, for arbitrary (including negative/huge) keys."""
    from flinkexp_spark.operators.bloom import bloom_build, bloom_prefilter

    mdf = spark.createDataFrame([(k,) for k in members], "k long")
    pdf = spark.createDataFrame([(k,) for k in probes], "k long")
    bloom = bloom_build(mdf, "k", m_bits=512, k=4)
    kept = {r.k for r in bloom_prefilter(pdf, bloom, "k", m_bits=512, k=4).collect()}
    assert (set(members) & set(probes)) <= kept


@given(
    st.lists(
        st.tuples(st.integers(-1000, 1000), st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=60,
        unique_by=lambda r: r[0],  # callers pre-aggregate per order key
    ),
    st.integers(1, 8),
)
@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_distributed_prefix_sum_equals_global_window(spark, rows, n_parts):
    """running_sums (range partition -> parallel scan -> broadcast
    offsets) must equal the naive single-partition ordered window for
    every value column, at any partition count."""
    from pyspark.sql import Window

    from flinkexp_spark.operators.prefix_sum import running_sums

    df = spark.createDataFrame(rows, "k long, a long, b long")
    got = {
        r.k: (r.cum_a, r.cum_b)
        for r in running_sums(df, "k", ["a", "b"], n_partitions=n_parts).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: (r.ca, r.cb)
        for r in df.select(
            "k",
            F.sum("a").over(w).alias("ca"),
            F.sum("b").over(w).alias("cb"),
        ).collect()
    }
    assert got == want


def test_prefix_sum_keeps_double_precision(spark):
    """Double-valued val_cols must come back as doubles with fractional
    parts intact — the pre-fix code cast every cumulative column to long,
    silently truncating (ADVICE r6, prefix_sum.py)."""
    from flinkexp_spark.operators.prefix_sum import running_sums

    rows = [(i, 0.25 * (i + 1)) for i in range(20)]
    df = spark.createDataFrame(rows, "k long, x double")
    out = running_sums(df, "k", ["x"], n_partitions=4)
    assert dict(out.dtypes)["cum_x"] == "double"
    got = {r.k: r.cum_x for r in out.collect()}
    acc, want = 0.0, {}
    for i in range(20):
        acc += 0.25 * (i + 1)
        want[i] = acc
    assert got == pytest.approx(want)


def test_prefix_sum_rejects_non_numeric(spark):
    """A string val_col must raise, not silently produce garbage."""
    from flinkexp_spark.operators.prefix_sum import running_sums

    df = spark.createDataFrame([(1, "a")], "k long, s string")
    with pytest.raises(TypeError, match="non-numeric"):
        running_sums(df, "k", ["s"], n_partitions=2).collect()
