"""Property-based tests (FIXTURES.md §6) — pure-Python kernels, no Spark."""

from hypothesis import example, given, settings
from hypothesis import strategies as st

# The DuckDB-backed properties pay connection + SQL cost per example; the
# host's vCPU-steal windows can push a single example past hypothesis's
# default 200 ms deadline, which then passes on replay and is reported as
# Flaky.  Wall-clock deadlines are meaningless on this host — disable them
# for the whole module (example counts are the budget, not time).
settings.register_profile("kgforge", deadline=None)
settings.load_profile("kgforge")

from kgforge.functions.spans import merge_spans
from kgforge.oracle.twin import twin_canonical

spans_st = st.lists(
    st.tuples(st.integers(0, 500), st.integers(0, 500)).map(lambda t: (min(t), max(t))),
    max_size=30,
)


@given(spans_st)
def test_merge_idempotent(spans):
    once = merge_spans(spans)
    assert merge_spans(once) == once


@given(spans_st)
def test_merge_order_insensitive(spans):
    assert merge_spans(spans) == merge_spans(list(reversed(spans)))


@given(spans_st)
def test_merge_covers_input(spans):
    merged = merge_spans(spans)
    for s, e in spans:
        assert any(ms <= s and e <= me for ms, me in merged)
    # non-adjacent, sorted
    for (s1, e1), (s2, e2) in zip(merged, merged[1:]):
        assert s2 > e1 + 1


@given(st.lists(st.text("abc\n ", min_size=0, max_size=40), max_size=8))
def test_chunk_roundtrip(paragraphs):
    """Paragraph-chunker semantics (/root/reference/data/dart_papers.py:45-49):
    concat of chunks == original minus empty lines."""
    text = "\n".join(paragraphs)
    chunks = [c for c in text.split("\n") if c.strip()]
    want = [c for c in text.split("\n") if c.strip()]
    assert chunks == want
    assert all(c.strip() for c in chunks)


@given(
    st.lists(
        st.tuples(st.sampled_from("abcdefgh"), st.sampled_from("abcdefgh")).filter(
            lambda t: t[0] != t[1]
        ),
        max_size=20,
    )
)
def test_canonical_pair_symmetry(pairs):
    """f(a,b) == f(b,a): union-find output is invariant to edge orientation
    (/root/reference/experiments/uaz_documents_comparison.py:237-238 analog)."""
    import pandas as pd

    fwd = pd.DataFrame(pairs, columns=["a", "b"])
    rev = pd.DataFrame([(b, a) for a, b in pairs], columns=["a", "b"])
    assert twin_canonical(fwd) == twin_canonical(rev)


@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0.0, max_value=1e6, allow_nan=False),
            st.integers(min_value=0, max_value=1023),
        ),
        min_size=1,
        max_size=50,
    )
)
def test_packed_argmin_order_matches_lexicographic(pairs):
    """The packed-long encoding (similarity._pack_argmin) must order
    exactly like the (round(d, ROUND) asc, cid asc) tuple it replaces —
    for every candidate set, min over the packed longs picks the same
    (d, cid) as min over the tuples."""
    from kgforge.operators.registry import ROUND
    from kgforge.operators.similarity import _PACK_M

    rounded = [(round(d, ROUND), cid) for d, cid in pairs]
    packed = [round(d * 10**ROUND) * _PACK_M + cid for d, cid in rounded]
    want = min(rounded)
    got = rounded[packed.index(min(packed))]
    assert got == want


@given(
    st.lists(st.integers(min_value=100, max_value=10_000_000), min_size=2, max_size=40),
)
def test_unimax_waterfilling_invariants(sizes):
    """The closed-form UniMax allocation (corpusops.unimax_alloc oracle SQL,
    run standalone on a crafted per-source table) must satisfy the
    waterfilling invariants for ANY source-size distribution:
      (1) no source exceeds its epoch cap,
      (2) the budget is exhausted exactly when some source is budget-limited
          (else every source sits at its cap),
      (3) all budget-limited sources receive the same share, and that share
          is >= every capped source's cap (caps ascend into the threshold).
    This pins the closed form itself; engine parity at sf scale is
    test_oracles' job."""
    import duckdb

    from kgforge.operators.corpusops import UNIMAX_BFRAC, UNIMAX_EMAX
    from kgforge.operators.registry import ORACLES

    con = duckdb.connect()
    rows = ", ".join(f"({i}, 'src{i}', {n})" for i, n in enumerate(sizes))
    con.sql(
        "create view documents as "
        f"select * from (values {rows}) as t(doc_id, source, n_chars)"
    )
    out = con.sql(ORACLES["unimax_alloc"]).df().sort_values("source")
    caps = {f"src{i}": n * UNIMAX_EMAX for i, n in enumerate(sizes)}
    budget = sum(sizes) * UNIMAX_BFRAC
    eps = 1e-4 * max(budget, 1.0)
    total_alloc = out["alloc_chars"].sum()
    limited = []
    for _, r in out.iterrows():
        cap = caps[r["source"]]
        assert r["alloc_chars"] <= cap + 1e-3, (r["source"], r["alloc_chars"], cap)
        if r["alloc_chars"] < cap - 1e-3:
            limited.append(r["alloc_chars"])
    if limited:
        # budget-limited sources split the remainder equally and exhaust it
        assert abs(total_alloc - min(budget, sum(caps.values()))) <= eps
        assert max(limited) - min(limited) <= 1e-3
        capped_caps = [
            caps[r["source"]]
            for _, r in out.iterrows()
            if r["alloc_chars"] >= caps[r["source"]] - 1e-3
        ]
        if capped_caps:
            assert max(capped_caps) <= min(limited) + 1e-3
    else:
        # everyone at cap: the budget must cover the total cap
        assert sum(caps.values()) <= budget + eps


_words_st = st.lists(
    st.text("abcdefghij", min_size=1, max_size=3), min_size=0, max_size=40
)


def _docs_view(con, docs):
    rows = ", ".join(f"({i}, '{' '.join(ws)}')" for i, ws in enumerate(docs))
    con.sql(
        "create view documents as "
        f"select * from (values {rows}) as t(doc_id, text)"
    )


@given(st.lists(_words_st, min_size=1, max_size=10))
def test_segment_dedup_rewrite_twin(docs):
    """Full pure-Python differential for the segment_dedup oracle SQL:
    for ANY corpus, the rewrite must equal the independently computed
    first-holder-keep reassembly (duplicated SEG_L-token segments
    survive only in their min-doc_id document; surviving segments are
    rejoined in order).  Engine parity at sf scale is test_oracles' job;
    this pins the SQL's semantics on arbitrary shapes (empty docs,
    single-token docs, whole-corpus duplicates)."""
    import duckdb

    from kgforge.operators.corpusops import SEG_L
    from kgforge.operators.registry import ORACLES

    con = duckdb.connect()
    _docs_view(con, docs)
    out = {
        int(r["doc_id"]): r
        for _, r in con.sql(ORACLES["segment_dedup"]).df().iterrows()
    }
    segs = {
        i: [" ".join(ws[j : j + SEG_L]) for j in range(0, len(ws), SEG_L)]
        for i, ws in enumerate(docs)
    }
    holder: dict = {}
    ndocs: dict = {}
    for i, ss in segs.items():
        for s in set(ss):
            holder[s] = min(holder.get(s, i), i)
            ndocs[s] = ndocs.get(s, 0) + 1
    for i, ss in segs.items():
        keep = [s for s in ss if ndocs[s] < 2 or holder[s] == i]
        r = out[i]
        assert int(r["n_seg"]) == len(ss)
        assert int(r["n_kept"]) == len(keep)
        assert r["text_clean"] == " ".join(keep)


@given(st.lists(_words_st, min_size=1, max_size=10))
# Regression pin: a doc whose two segments are IDENTICAL (same digest
# twice) collapsed to one (doc_id, dig) group with 2k exploded position
# rows, failing the old fixed 'hits == k' membership test -> false
# negative (n_maybe < n_exact).  Found by hypothesis 2026-08-19.
@example(docs=[["a"] * 16, ["a"] * 8])
def test_bloom_prefilter_twin(docs):
    """Full pure-Python differential for the bloom_prefilter oracle SQL:
    rebuild the position-set filter with hashlib and assert exact
    equality of every count, plus the one-sided contract (n_exact <=
    n_maybe <= n_segs: a Bloom filter never false-negatives)."""
    import duckdb
    import hashlib

    from kgforge.operators.dedup import BLOOM_K, BLOOM_M, BLOOM_SEG_L, INCR_MOD
    from kgforge.operators.registry import ORACLES

    con = duckdb.connect()
    _docs_view(con, docs)
    got = con.sql(ORACLES["bloom_prefilter"]).df()

    def digs(ws):
        return {
            hashlib.md5(
                " ".join(ws[j : j + BLOOM_SEG_L]).encode()
            ).hexdigest()
            for j in range(0, len(ws), BLOOM_SEG_L)
        }

    def positions(dig):
        return {int(dig[8 * k : 8 * k + 8], 16) % BLOOM_M for k in range(BLOOM_K)}

    old_digs: set = set()
    filt: set = set()
    for i, ws in enumerate(docs):
        if i % INCR_MOD != 0 and ws:
            for d in digs(ws):
                old_digs.add(d)
                filt |= positions(d)
    want = {}
    for i, ws in enumerate(docs):
        if i % INCR_MOD == 0 and ws:
            ds = digs(ws)
            n_maybe = sum(1 for d in ds if positions(d) <= filt)
            n_exact = sum(1 for d in ds if d in old_digs)
            want[i] = (len(ds), n_maybe, n_exact)
    assert set(got["doc_id"].astype(int)) == set(want)
    for _, r in got.iterrows():
        n_segs, n_maybe, n_exact = want[int(r["doc_id"])]
        assert int(r["n_segs"]) == n_segs
        assert int(r["n_maybe"]) == n_maybe
        assert int(r["n_exact"]) == n_exact
        assert n_exact <= n_maybe <= n_segs
        assert bool(r["bloom_maybe"]) == (n_maybe > 0)
        assert bool(r["exact_overlap"]) == (n_exact > 0)
