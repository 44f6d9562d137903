"""Property-based checks (SURVEY.md §5.4): healing is monotone and
convergent, DQ fractions are bounded, and oracle-checked aggregates are
invariant under repartitioning — the property that makes results
reproducible on any cluster layout.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from self_healing_data_pipeline_agent_spark.contract import Contract
from self_healing_data_pipeline_agent_spark.healing import (
    NULL_TOLERANCE_CAP,
    group_checks_by_column,
    heal_contract,
)


def _contract(tol: float) -> Contract:
    return Contract(
        raw={"columns": {"age": {"type": "int", "max_null_fraction": tol}}}
    )


def _nf_report(observed: float) -> dict:
    return {
        "failed_checks": [
            {"check": "max_null_fraction", "column": "age",
             "observed": observed, "threshold": 0.0}
        ]
    }


@given(
    prev=st.floats(min_value=0.0, max_value=NULL_TOLERANCE_CAP),
    observed=st.floats(min_value=0.0, max_value=1.0),
)
def test_null_tolerance_monotone_and_capped(prev, observed):
    healed, _ = heal_contract(_contract(prev), _nf_report(observed))
    new = healed.raw["columns"]["age"]["max_null_fraction"]
    assert prev <= new <= NULL_TOLERANCE_CAP


@given(
    prev=st.floats(min_value=0.0, max_value=NULL_TOLERANCE_CAP),
    observed=st.floats(min_value=0.0, max_value=1.0),
)
def test_healing_converges_to_fixpoint(prev, observed):
    """Repeated healing of the same failure reaches a fixpoint (<= cap)
    within a few steps — the loop can't oscillate or loosen forever."""
    c = _contract(prev)
    last = prev
    for _ in range(5):
        c, changes = heal_contract(c, _nf_report(observed))
        cur = c.raw["columns"]["age"]["max_null_fraction"]
        assert cur >= last
        if not changes:
            break
        last = cur
    c2, changes = heal_contract(c, _nf_report(observed))
    assert (
        not changes
        or c2.raw["columns"]["age"]["max_null_fraction"] == NULL_TOLERANCE_CAP
    )


@given(observed=st.floats(min_value=0.0, max_value=0.75))
def test_healed_contract_passes_same_data(observed):
    """For any observed null fraction the margin can absorb (< cap - 0.05),
    one healing round is enough: the new tolerance clears the observation."""
    healed, _ = heal_contract(_contract(0.0), _nf_report(observed))
    assert healed.raw["columns"]["age"]["max_null_fraction"] >= observed


@given(observed=st.integers(min_value=0, max_value=10**9))
def test_row_count_min_never_negative(observed):
    c = Contract(raw={"columns": {}, "quality": {"row_count_min": 10**9 + 1}})
    healed, _ = heal_contract(
        c,
        {"failed_checks": [
            {"check": "row_count", "column": None,
             "observed": observed, "threshold": 10**9 + 1}
        ]},
    )
    new_min = healed.raw["quality"]["row_count_min"]
    assert 0 <= new_min <= observed


@given(
    checks=st.lists(
        st.fixed_dictionaries(
            {"check": st.sampled_from(["row_count", "max_null_fraction"]),
             "column": st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))}
        ),
        max_size=20,
    )
)
def test_grouping_partitions_checks(checks):
    grouped = group_checks_by_column(checks)
    assert sum(len(v) for v in grouped.values()) == len(checks)
    for key, items in grouped.items():
        for item in items:
            assert (item.get("column") or "_global") == key


@settings(deadline=None, max_examples=10)
@given(data=st.data())
def test_healing_never_tightens_any_tolerance(data):
    """Across a random mixed failure report, no tolerance decreases, no
    required flag flips to True, and row_count_min never increases."""
    prev_tol = data.draw(st.floats(min_value=0.0, max_value=NULL_TOLERANCE_CAP))
    prev_min = data.draw(st.integers(min_value=0, max_value=1000))
    c = Contract(
        raw={
            "columns": {
                "a": {"type": "int", "max_null_fraction": prev_tol,
                      "required": True},
            },
            "quality": {"row_count_min": prev_min},
        }
    )
    report = {
        "failed_checks": [
            {"check": "max_null_fraction", "column": "a",
             "observed": data.draw(st.floats(0.0, 1.0)), "threshold": prev_tol},
            {"check": "missing_column", "column": "a"},
            {"check": "row_count", "column": None,
             "observed": data.draw(st.integers(0, 2000)),
             "threshold": prev_min},
        ]
    }
    healed, _ = heal_contract(c, report)
    assert healed.raw["columns"]["a"]["max_null_fraction"] >= prev_tol
    assert healed.raw["columns"]["a"]["required"] is False
    assert healed.raw["quality"]["row_count_min"] <= prev_min


def test_stable_sums_partition_invariant(spark, sf_dir):
    """dsum/dstd bits must not depend on the partition layout — THE
    correctness property for a 1000-executor deployment."""
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_agent_spark.functions.stable import (
        dstd, dsum,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    results = []
    for parts in (1, 7, 32):
        df = li.repartition(parts)
        row = df.agg(
            dsum(F.col("l_extendedprice")).alias("s"),
            dstd(F.col("l_extendedprice")).alias("d"),
        ).collect()[0]
        results.append((row["s"], row["d"]))
    assert results[0] == results[1] == results[2]


def test_salted_agg_matches_unsalted(spark, sf_dir):
    """Skew-safe two-level aggregation must be algebraically identical to
    the direct aggregation for any salt count."""
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_agent_spark.functions.skew import salted_agg
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    direct = {
        r["event_type"]: (r["n"], r["s"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum("value").alias("s"),
             F.max("value").alias("mx"))
        .collect()
    }
    for n_salts in (1, 4, 32):
        salted = {
            r["event_type"]: (r["n"], r["s"], r["mx"])
            for r in salted_agg(
                ev,
                ["event_type"],
                {"pn": F.count(F.lit(1)), "ps": F.sum("value"),
                 "pm": F.max("value")},
                {"n": F.sum("pn"), "s": F.sum("ps"), "mx": F.max("pm")},
                n_salts=n_salts,
            ).collect()
        }
        assert set(salted) == set(direct)
        for k, (n, s, mx) in direct.items():
            sn, ss, smx = salted[k]
            assert sn == n and smx == mx
            assert ss == s or abs(ss - s) < 1e-6 * max(1.0, abs(s))


def test_salt_deterministic(spark, sf_dir):
    """_salt must be a pure function of the row (retry-safe), not rand()."""
    from self_healing_data_pipeline_agent_spark.functions.skew import with_salt
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(100)
    a = sorted(r["_salt"] for r in with_salt(ev).collect())
    b = sorted(r["_salt"] for r in with_salt(ev).collect())
    assert a == b


def test_global_rank_is_group_permutation(spark, sf_dir):
    """with_global_rank must produce exactly 0..n-1 per group, and rank
    order must agree with value order (distributed rank == window rank)."""
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_agent_spark.functions.ranking import (
        with_global_rank,
    )

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ranked = with_global_rank(li, "l_returnflag", "l_quantity", partitions=8)
    stats = ranked.groupBy("l_returnflag").agg(
        F.min("rn").alias("mn"),
        F.max("rn").alias("mx"),
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("rn").alias("nd"),
    ).collect()
    for r in stats:
        assert r["mn"] == 0 and r["mx"] == r["n"] - 1 and r["nd"] == r["n"]
    # monotone: value at rank k <= value at rank k+1 (check via self-join
    # on adjacent ranks over a sample group)
    a = ranked.filter(F.col("l_returnflag") == "A").select(
        "rn", F.col("l_quantity").alias("v")
    )
    b = a.select((F.col("rn") - 1).alias("rn"), F.col("v").alias("v_next"))
    violations = a.join(b, "rn").filter(F.col("v") > F.col("v_next")).count()
    assert violations == 0


# --- chunker coverage properties (pure-Python model + Spark spot check) -----

def _chunk_starts(n: int, chunk: int, stride: int) -> list[int]:
    """Reference model of q_chunk_with_overlap's start-selection rule."""
    return [
        s for s in range(0, n, stride)
        if s == 0 or s < n - chunk + stride
    ]


@given(n=st.integers(min_value=1, max_value=500))
def test_chunker_model_covers_every_token(n):
    """Every token index [0, n) falls inside at least one emitted chunk,
    and consecutive kept chunks overlap (no gaps) — for the shipped
    (64, 48) geometry."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        RAG_CHUNK_TOKENS as C,
        RAG_CHUNK_STRIDE as S,
    )

    starts = _chunk_starts(n, C, S)
    assert starts and starts[0] == 0
    covered = set()
    for s in starts:
        covered.update(range(s, min(s + C, n)))
    assert covered == set(range(n))
    # no redundant tail: each kept chunk past the first must add coverage
    for prev, cur in zip(starts, starts[1:]):
        assert prev + C < n or cur == 0, (n, starts)


def test_chunker_spark_matches_model(spark, sf_dir):
    """Spark's per-doc chunk counts equal the reference model's."""
    from pyspark.sql import functions as F

    from self_healing_data_pipeline_agent_spark.operators.text import (
        RAG_CHUNK_TOKENS as C,
        RAG_CHUNK_STRIDE as S,
        _tokens_col,
        q_chunk_with_overlap,
    )
    from self_healing_data_pipeline_agent_spark.sources.tables import load_table

    got = {
        r.doc_id: r.n
        for r in q_chunk_with_overlap(spark, sf_dir)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ns = {
        r.doc_id: r.n
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", F.size(_tokens_col()).alias("n"))
        .collect()
    }
    want = {d: len(_chunk_starts(n, C, S)) for d, n in ns.items() if n > 0}
    assert got == want


# --- prefix-filter candidate scheme: lossless on random corpora -------------

@given(data=st.data())
@settings(max_examples=60, deadline=None)
def test_prefix_filter_candidates_lossless_model(data):
    """Pure-Python model of q_prefix_filter_jaccard's candidate scheme:
    for random corpora, every pair with Jaccard >= t must share a token
    that lies in BOTH docs' rarity-ordered prefixes (the property the
    Spark plan relies on for zero false negatives)."""
    import math
    from collections import Counter

    t = 0.6
    vocab = [f"w{i}" for i in range(data.draw(st.integers(4, 30)))]
    docs = {
        i: set(
            data.draw(
                st.lists(st.sampled_from(vocab), min_size=1, max_size=15)
            )
        )
        for i in range(data.draw(st.integers(2, 10)))
    }
    df = Counter(tok for s in docs.values() for tok in s)
    order = {tok: (df[tok], tok) for tok in vocab}

    def prefix(s):
        n = len(s)
        keep = n - math.ceil(t * n) + 1
        return set(sorted(s, key=lambda x: order[x])[:keep])

    for a in docs:
        for b in docs:
            if a >= b:
                continue
            inter = docs[a] & docs[b]
            union = docs[a] | docs[b]
            if not union or len(inter) / len(union) < t:
                continue
            assert prefix(docs[a]) & prefix(docs[b]), (
                docs[a], docs[b], prefix(docs[a]), prefix(docs[b])
            )


@given(
    data=st.data(),
    cap=st.integers(min_value=2, max_value=12),
)
@settings(max_examples=60, deadline=None)
def test_mg_summary_merge_guarantee_property(data, cap):
    """Mergeable-summaries invariant (frequent_items_sketch contract):
    for ANY token streams split into ANY partitions merged in ANY order,
    the merged Misra-Gries summary satisfies, for every term,
    freq - dec <= est <= freq, with dec <= n/(cap+1) and <= cap
    surviving counters."""
    from self_healing_data_pipeline_agent_spark.operators.sketches import (
        mg_summary_merge,
    )

    n_parts = data.draw(st.integers(min_value=1, max_value=4))
    vocab = st.sampled_from([f"t{i}" for i in range(15)])
    parts = [
        data.draw(st.lists(vocab, max_size=80)) for _ in range(n_parts)
    ]

    def build(stream):
        counters, dec, n = {}, 0, 0
        for t in stream:
            n += 1
            if t in counters:
                counters[t] += 1
            elif len(counters) < cap:
                counters[t] = 1
            else:
                dec += 1
                for k in list(counters):
                    counters[k] -= 1
                    if counters[k] == 0:
                        del counters[k]
        return counters, dec, n

    order = data.draw(st.permutations(range(n_parts)))
    acc = ({}, 0, 0)
    for i in order:
        acc = mg_summary_merge(acc, build(parts[i]), capacity=cap)
    counters, dec, n = acc

    truth: dict[str, int] = {}
    for p in parts:
        for t in p:
            truth[t] = truth.get(t, 0) + 1
    assert n == sum(truth.values())
    assert len(counters) <= cap
    assert dec <= (n // (cap + 1)) + 1
    for term, freq in truth.items():
        est = counters.get(term, 0)
        assert est <= freq
        assert freq - est <= dec


def _brute_dup_spans(docs: dict[int, list[str]], k: int, min_run: int):
    """Reference implementation of substring_dup_spans: every maximal run
    of consecutive equal k-grams per doc pair, O(pairs * positions^2) —
    correct by inspection, usable only on toy corpora."""
    grams = {
        d: [tuple(t[i:i + k]) for i in range(len(t) - k + 1)]
        for d, t in docs.items()
    }
    out = set()
    ids = sorted(grams)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            ga, gb = grams[a], grams[b]
            matched = {
                (i, j)
                for i in range(len(ga))
                for j in range(len(gb))
                if ga[i] == gb[j]
            }
            for (i, j) in matched:
                if (i - 1, j - 1) in matched:
                    continue  # not a run start
                run = 0
                while (i + run, j + run) in matched:
                    run += 1
                if run >= min_run:
                    out.add((a, b, i, j, run + k - 1))
    return out


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_substring_dup_spans_matches_bruteforce(spark, tmp_path_factory, data):
    """Engine-independent teeth for the ExactSubstr query: on random toy
    corpora (tiny vocabulary forces collisions, shared runs, multiple
    diagonals and within-doc repeats), the Spark pipeline — INCLUDING the
    winnowed-fingerprint candidate prefilter — must emit exactly the
    brute-force maximal-run set."""
    from self_healing_data_pipeline_agent_spark.operators.text import (
        SUBSTR_K,
        SUBSTR_MIN_RUN,
        q_substring_dup_spans,
    )

    tok = st.sampled_from(["a", "b", "c"])
    docs = {
        d: data.draw(st.lists(tok, min_size=6, max_size=28))
        for d in range(1, data.draw(st.integers(3, 5)) + 1)
    }
    expected = _brute_dup_spans(docs, SUBSTR_K, SUBSTR_MIN_RUN)
    d = tmp_path_factory.mktemp("substr")
    spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    got = {
        (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens)
        for r in q_substring_dup_spans(spark, str(d)).collect()
    }
    assert got == expected


@given(
    w=st.integers(min_value=1, max_value=8),
    h=st.integers(min_value=1, max_value=8),
    maxval=st.integers(min_value=1, max_value=255),
    pad=st.sampled_from([b" ", b"\n", b"\t", b"\r"]),
    comments=st.lists(
        st.binary(min_size=0, max_size=6).filter(lambda b: b"\n" not in b),
        max_size=3,
    ),
    data=st.data(),
)
@settings(max_examples=60, deadline=None)
def test_ppm_decode_roundtrip_property(w, h, maxval, pad, comments, data):
    """Any spec-valid P6 payload — arbitrary dimensions, maxval,
    header whitespace and comment placement — must decode to exactly its
    raster bytes; any truncation of the raster must raise.  The codec is
    the registry's real-container path, so its parser has to be
    spec-total, not just correct on the fixed 16x16 encoder output."""
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        _ppm_header,
        decode_payload,
    )
    import pytest as _pytest

    raster = data.draw(
        st.binary(min_size=w * h * 3, max_size=w * h * 3)
    )
    header = bytearray(b"P6")
    for tok in (w, h, maxval):
        for c in comments:
            header += b"#" + c + b"\n"
        header += pad + str(tok).encode()
    header += pad  # the single post-maxval whitespace byte
    payload = bytes(header) + raster
    assert decode_payload(payload, codec="ppm") == raster
    pw, ph, pm, off = _ppm_header(payload)
    assert (pw, ph, pm) == (w, h, maxval)
    assert payload[off:off + w * h * 3] == raster
    if w * h * 3 > 0:
        with _pytest.raises(ValueError):
            decode_payload(payload[:-1], codec="ppm")


@given(
    caps=st.lists(st.integers(min_value=1, max_value=10**6),
                  min_size=1, max_size=12),
    budget_frac=st.integers(min_value=0, max_value=300),
)
@settings(max_examples=300, deadline=None)
def test_waterfill_closed_form_matches_iterative(caps, budget_frac):
    """mixture_epochs' allocation uses the CLOSED FORM of waterfilling
    (lang i saturates iff cap_i*(k-i+1) <= budget - prefix_i over
    ascending caps, everyone else shares the leftover equally).  The
    textbook DEFINITION is the iterative fixpoint: hand each remaining
    party an equal share, cap whoever exceeds their cap, redistribute,
    repeat.  Multi-round saturation (a cap that only saturates after an
    earlier round frees budget) is exactly where a closed form can go
    wrong — this pins their equivalence under integer division,
    including budget 0, all-saturated, and tie cases."""
    budget = sum(caps) * budget_frac // 100

    # closed form, mirrored from q_mixture_epochs / its oracle
    order = sorted(range(len(caps)), key=lambda i: (caps[i], i))
    k = len(caps)
    prefix, sat = 0, [False] * k
    for pos, i in enumerate(order):
        if caps[i] * (k - pos) <= budget - prefix:
            sat[i] = True
        prefix += caps[i]
    sat_total = sum(c for i, c in enumerate(caps) if sat[i])
    n_unsat = k - sum(sat)
    closed = [
        caps[i] if sat[i]
        else (budget - sat_total) // n_unsat
        for i in range(k)
    ]

    # iterative fixpoint (the definition)
    remaining = set(range(k))
    alloc = [0] * k
    rem = budget
    while remaining:
        share = rem // len(remaining)
        newly = [i for i in remaining if caps[i] <= share]
        if not newly:
            for i in remaining:
                alloc[i] = share
            break
        for i in newly:
            alloc[i] = caps[i]
            rem -= caps[i]
            remaining.remove(i)

    assert closed == alloc


@given(
    frames=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=5),   # w
            st.integers(min_value=1, max_value=5),   # h
            st.sampled_from([b" ", b"\n", b"\t"]),   # header pad
        ),
        min_size=0, max_size=5,
    ),
    data=st.data(),
)
@settings(max_examples=80, deadline=None)
def test_ppm_stream_roundtrip_property(frames, data):
    """Any concatenation of spec-valid P6 frames — mixed dimensions and
    header whitespace — must split back into exactly its rasters in
    order; chopping any byte off the tail must raise.  The stream walker
    is the video ring's container parser, so it has to be total over
    frame-boundary placement, not just the fixed encoder layout."""
    import pytest as _pytest

    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        _ppm_stream_decode,
    )

    payload, rasters = b"", []
    for w, h, pad in frames:
        raster = data.draw(
            st.binary(min_size=w * h * 3, max_size=w * h * 3)
        )
        payload += b"P6" + pad + str(w).encode() + pad + str(h).encode() \
            + pad + b"255" + pad + raster
        rasters.append(raster)
    assert _ppm_stream_decode(payload) == rasters
    if payload:
        with _pytest.raises(ValueError):
            _ppm_stream_decode(payload[:-1])


# --- X43 image near-dup: the pigeonhole recall bound -------------------------
#
# The banded blocking's correctness claim is mathematical: a pair whose
# 64-bit hashes differ in at most IMG_HAM_MAX = 3 bits CANNOT differ in
# all four 16-bit bands (4 bands differing means >= 4 bits), so band
# equality loses no pair inside the verify threshold — recall is exact
# among pairs whose agreeing band is informative.  Pin the bound itself
# so a future threshold/band-count change that breaks the relationship
# (e.g. IMG_HAM_MAX = 4 with 4 bands) fails loudly here instead of
# silently costing recall.

@given(
    h1=st.integers(min_value=0, max_value=2**64 - 1),
    flips=st.sets(st.integers(min_value=0, max_value=63), max_size=3),
)
def test_image_banding_pigeonhole_recall(h1, flips):
    from self_healing_data_pipeline_agent_spark.operators.multimodal import (
        IMG_BANDS,
        IMG_HAM_MAX,
    )

    assert IMG_HAM_MAX < IMG_BANDS, (
        "the pigeonhole guarantee requires ham_max < n_bands — a pair "
        "differing in every band has Hamming >= n_bands"
    )
    h2 = h1
    for b in flips:
        h2 ^= 1 << b
    assert bin(h1 ^ h2).count("1") <= IMG_HAM_MAX
    bands1 = [(h1 >> (16 * k)) & 0xFFFF for k in range(IMG_BANDS)]
    bands2 = [(h2 >> (16 * k)) & 0xFFFF for k in range(IMG_BANDS)]
    assert any(a == b for a, b in zip(bands1, bands2)), (
        "a pair inside the Hamming threshold shares no band — "
        "banded blocking would lose it"
    )
