"""Semantic invariants for the round-5 operators (oracle parity is in
test_parity.py; these pin the properties parity alone can't see)."""

import math

from pyspark.sql import functions as F

from smile_spark.tables import table


def test_token_entropy_information_bounds(spark, sf_dir):
    """Shannon bounds: 0 <= H <= log2(n_distinct); ttr in (0, 1];
    distinct count never exceeds token count; a single-type document
    (if any) has H = 0."""
    from smile_spark.operators.text import token_entropy

    rows = token_entropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.entropy <= math.log2(r.n_distinct) + 1e-6, r
        assert 0 < r.ttr <= 1.0 + 1e-12, r
        assert r.n_distinct <= r.n_tokens, r
        if r.n_distinct == 1:
            assert r.entropy == 0.0, r


def test_token_entropy_uniform_doc_hits_log2(spark, sf_dir):
    """All-distinct-token documents must hit the upper bound
    H = log2(n) exactly (to rounding): ttr == 1 → uniform
    distribution."""
    from smile_spark.operators.text import token_entropy

    uni = token_entropy(spark, sf_dir).filter(F.col("ttr") >= 1.0)
    for r in uni.collect():
        assert abs(r.entropy - math.log2(r.n_tokens)) < 1e-5, r


def test_equi_depth_bins_partition_and_order(spark, sf_dir):
    """The decile bins must partition the scan (counts sum to the row
    count), stay in 1..NBINS, be roughly equal-depth (each within 25%
    of the mean — 2-decimal price ties blur exact equality), and be
    value-ordered: hi of bin k <= lo of bin k+1."""
    from smile_spark.operators.analytics import (
        EQUI_DEPTH_NBINS,
        equi_depth_bins,
    )

    rows = sorted(equi_depth_bins(spark, sf_dir).collect(),
                  key=lambda r: r.bin)
    total = table(spark, sf_dir, "lineitem").count()
    assert sum(r.n for r in rows) == total
    assert [r.bin for r in rows] == list(range(1, EQUI_DEPTH_NBINS + 1))
    mean = total / EQUI_DEPTH_NBINS
    for r in rows:
        assert abs(r.n - mean) < 0.25 * mean, r
    for a, b in zip(rows, rows[1:]):
        assert a.hi <= b.lo, (a, b)


def test_containment_at_least_jaccard(spark, sf_dir):
    """For any directed pair, containment >= the pair's Jaccard
    (|A∩B|/|A| >= |A∩B|/|A∪B|), and containment is in (0, 1]."""
    from smile_spark.operators.dedup import containment_topk

    rows = containment_topk(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.containment <= 1.0 + 1e-12, r


def test_skyline_pareto_mutual_nondominance(spark, sf_dir):
    """No skyline member dominates another member, and every member
    beats (or ties) the global best in at least one dimension."""
    from smile_spark.operators.analytics import skyline_pareto

    rows = skyline_pareto(spark, sf_dir).collect()
    assert rows
    for p in rows:
        for q in rows:
            dominated = (
                q.avg_price <= p.avg_price
                and q.total_qty >= p.total_qty
                and (q.avg_price < p.avg_price or q.total_qty > p.total_qty)
            )
            assert not dominated, (p, q)
    # frontier endpoints present: the global min-price and max-qty parts
    best_price = min(r.avg_price for r in rows)
    best_qty = max(r.total_qty for r in rows)
    assert any(r.avg_price == best_price for r in rows)
    assert any(r.total_qty == best_qty for r in rows)


def test_skyline_pareto_members_undominated_globally(spark, sf_dir):
    """Recompute the per-part aggregate directly; every emitted member
    must be undominated against the FULL table, and every non-member
    must be dominated by someone (completeness + soundness)."""
    from smile_spark.operators.analytics import skyline_pareto
    from smile_spark.functions.numeric import davg, dsum

    li = table(spark, sf_dir, "lineitem")
    pp = {
        r.l_partkey: (r.avg_price, r.total_qty)
        for r in li.groupBy("l_partkey")
        .agg(davg("l_extendedprice", "avg_price"),
             dsum("l_quantity", "total_qty"))
        .collect()
    }
    members = {r.l_partkey for r in skyline_pareto(spark, sf_dir).collect()}

    def dominated(pk):
        px, py = pp[pk]
        return any(
            qx <= px and qy >= py and (qx < px or qy > py)
            for qk, (qx, qy) in pp.items()
            if qk != pk
        )

    for pk in pp:
        assert (pk in members) == (not dominated(pk)), pk


def test_mad_outliers_robustness_bounds(spark, sf_dir):
    """MAD >= 0; outliers are a strict minority (by construction at
    most half the group can sit beyond the median deviation, and 3x
    that); counts are consistent with the raw table."""
    from smile_spark.operators.quality import mad_outliers

    rows = mad_outliers(spark, sf_dir).collect()
    li_n = table(spark, sf_dir, "lineitem").count()
    assert rows
    assert sum(r.n_rows for r in rows) == li_n
    for r in rows:
        assert r.mad >= 0, r
        assert 0 <= r.n_outliers < r.n_rows / 2, r


def test_setsim_join_prefix_lossless_vs_bruteforce(spark, sf_dir):
    """The prefix filter must be LOSSLESS: within a small blocked
    subset, brute-force all-pairs Jaccard >= tau yields exactly the
    operator's pairs restricted to that block; emitted rows respect
    i <= min(na, nb) and jaccard >= tau."""
    from smile_spark.operators.dedup import SETSIM_TAU, setsim_join_prefix

    rows = setsim_join_prefix(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.i <= min(r.na, r.nb), r
        assert r.jaccard >= SETSIM_TAU, r

    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 20 == 0)
        .collect()
    }
    brute = set()
    ids = sorted(docs)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            i = len(docs[a] & docs[b])
            jac = round(i / (len(docs[a]) + len(docs[b]) - i), 6)
            if jac >= SETSIM_TAU:
                brute.add((a, b))
    got = {
        (r.a, r.b)
        for r in rows
        if r.a % 20 == 0 and r.b % 20 == 0
    }
    assert got == brute


def test_kcore_peel_profile_invariants(spark, sf_dir):
    """Peel profile sanity: rounds 1..R in order; n_alive monotone
    non-increasing; n_dropped consistent with consecutive n_alive;
    once a round drops nothing, every later round drops nothing (the
    peel is a fixpoint iteration); and a direct single-machine peel of
    the same graph reproduces the profile exactly."""
    import collections

    from smile_spark.operators.graph import (
        KCORE_K,
        KCORE_ROUNDS,
        kcore_peel,
    )

    rows = sorted(kcore_peel(spark, sf_dir).collect(), key=lambda r: r.round)
    assert [r.round for r in rows] == list(range(1, KCORE_ROUNDS + 1))
    for a, b in zip(rows, rows[1:]):
        assert b.n_alive <= a.n_alive
        assert b.n_dropped == a.n_alive - b.n_alive
        if a.n_dropped == 0:
            assert b.n_dropped == 0
    # direct reference peel
    li = table(spark, sf_dir, "lineitem")
    baskets = collections.defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    adj = collections.defaultdict(set)
    for ps in baskets.values():
        ps = sorted(ps)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
    alive = set(adj)
    expect = []
    for _ in range(KCORE_ROUNDS):
        deg = {n: sum(1 for m in adj[n] if m in alive) for n in alive}
        nxt = {n for n in alive if deg[n] >= KCORE_K}
        expect.append((len(alive) - len(nxt), len(nxt)))
        alive = nxt
    assert [(r.n_dropped, r.n_alive) for r in rows] == expect


def test_ewma_anomaly_matches_direct_recurrence(spark, sf_dir):
    """Recompute the truncated EWMA directly per user in Python and
    compare every row; ewma never exceeds the max of its history
    (weights sum < 1); spike flags are consistent with the emitted
    ewma."""
    from decimal import ROUND_HALF_UP, Decimal

    from smile_spark.operators.behavior import (
        EWMA_SPIKE_MULT,
        EWMA_W,
        ewma_anomaly,
    )

    rows = ewma_anomaly(spark, sf_dir).collect()
    assert rows
    ev = sorted(
        table(spark, sf_dir, "events")
        .select("user_id", "event_id", "ts", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    hist = {}
    expect = {}
    prev_user = None
    seq = []
    for r in ev:
        if r.user_id != prev_user:
            seq = []
            prev_user = r.user_id
        if seq:
            window = seq[-EWMA_W:]
            n = len(window)
            s = sum(
                Decimal(repr(x * 0.5 ** (n - i))).quantize(
                    Decimal("1e-12"), rounding=ROUND_HALF_UP
                )
                for i, x in enumerate(window)
            )
            expect[(r.user_id, r.event_id)] = float(
                s.quantize(Decimal("0.000001"), rounding=ROUND_HALF_UP)
            )
        seq.append(r.value)
    for r in rows:
        want = expect[(r.user_id, r.event_id)]
        assert abs(r.ewma_prev - want) < 1e-9, (r, want)
        assert r.is_spike == (r.value > EWMA_SPIKE_MULT * r.ewma_prev), r


def test_ann_sq8_recall_vs_bruteforce(spark, sf_dir):
    """SQ8 + exact re-rank must recover most of the true top-k
    (recall >= 0.8 per query here; the re-rank pool is 3x k), and the
    emitted cos_r values are the EXACT cosines (they come from the
    re-rank, not the quantized scores)."""
    from smile_spark.operators.similarity import (
        TOP_K,
        ann_cosine_topk,
        ann_sq8_topk,
    )

    truth = {}
    for r in ann_cosine_topk(spark, sf_dir).collect():
        truth.setdefault(r.qid, {})[r.vec_id] = r.cos_r
    got = {}
    for r in ann_sq8_topk(spark, sf_dir).collect():
        got.setdefault(r.qid, {})[r.vec_id] = r.cos_r
    assert set(got) == set(truth)
    for qid, t in truth.items():
        g = got[qid]
        assert len(g) == TOP_K
        recall = len(set(g) & set(t)) / len(t)
        assert recall >= 0.8, (qid, recall)
        for vid in set(g) & set(t):
            assert g[vid] == t[vid], (qid, vid)


def test_spatial_grid_join_complete_vs_bruteforce(spark, sf_dir):
    """The 3x3 grid neighborhood must be COMPLETE: a direct all-pairs
    distance computation over the synthesized coordinates produces
    exactly the operator's pair set; all emitted d2 <= r^2."""
    from smile_spark.operators.spatial import (
        SPATIAL_RADIUS,
        _KNUTH,
        _TWO32,
        spatial_grid_join,
    )

    def coord(key, salt):
        return ((key * _KNUTH + salt) % _TWO32) / _TWO32

    cust = [
        r.c_custkey
        for r in table(spark, sf_dir, "customer").select("c_custkey").collect()
    ]
    supp = [
        r.s_suppkey
        for r in table(spark, sf_dir, "supplier").select("s_suppkey").collect()
    ]
    r2 = SPATIAL_RADIUS * SPATIAL_RADIUS
    brute = set()
    for c in cust:
        x, y = coord(c, 1), coord(c, 2)
        for s in supp:
            sx, sy = coord(s, 3), coord(s, 4)
            if (x - sx) ** 2 + (y - sy) ** 2 <= r2:
                brute.add((c, s))
    rows = spatial_grid_join(spark, sf_dir).collect()
    assert rows
    got = {(r.c_custkey, r.s_suppkey) for r in rows}
    assert got == brute
    for r in rows:
        assert r.d2 <= r2 + 1e-12, r


def test_join_size_estimate_accuracy(spark, sf_dir):
    """The exact column must equal the actually-executed join count;
    the correlated-sampling estimate must land within 50% (1/16
    sampling over hundreds of matching keys)."""
    from smile_spark.operators.sketch import join_size_estimate

    row = join_size_estimate(spark, sf_dir).collect()[0]
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000)
    true_n = o.join(c, o.o_custkey == c.c_custkey).count()
    assert row.exact_join_rows == true_n
    assert row.n_sampled_keys > 0
    assert abs(row.rel_err) <= 0.5, row


def test_clustering_coefficient_bounds_and_closure(spark, sf_dir):
    """cc in [0, 1]; per-node triangle counts sum to 3x the global
    triangle count; a direct adjacency-set recomputation reproduces
    (deg, n_tri) for every node."""
    import collections

    from smile_spark.operators.graph import clustering_coefficient

    rows = clustering_coefficient(spark, sf_dir).collect()
    assert rows
    li = table(spark, sf_dir, "lineitem")
    baskets = collections.defaultdict(set)
    for r in li.select("l_orderkey", "l_partkey").collect():
        baskets[r.l_orderkey].add(r.l_partkey)
    adj = collections.defaultdict(set)
    for ps in baskets.values():
        ps = sorted(ps)
        for i, x in enumerate(ps):
            for y in ps[i + 1:]:
                adj[x].add(y)
                adj[y].add(x)
    total_tri = 0
    for r in rows:
        assert 0.0 <= r.cc <= 1.0, r
        nbrs = adj[r.part]
        assert r.deg == len(nbrs), r
        tri = sum(
            1
            for u in nbrs
            for w in nbrs
            if u < w and w in adj[u]
        )
        assert r.n_tri == tri, (r, tri)
        total_tri += r.n_tri
    assert total_tri % 3 == 0


def test_bm25_monotone_and_positive(spark, sf_dir):
    """BM25 scores are positive, ranked descending, and k rows come
    back; a doc containing NO query term never outranks one that
    does (scores of term-free docs are absent entirely)."""
    from smile_spark.operators.text import (
        BM25_QUERY_TERMS,
        BM25_TOP_K,
        bm25_topk,
    )

    rows = sorted(bm25_topk(spark, sf_dir).collect(), key=lambda r: r.rn)
    assert len(rows) == BM25_TOP_K
    assert all(r.score > 0 for r in rows)
    assert all(a.score >= b.score for a, b in zip(rows, rows[1:]))
    # every returned doc really contains >= 1 query term
    docs = {
        r.doc_id: set(r.text.split(" "))
        for r in table(spark, sf_dir, "documents").collect()
    }
    for r in rows:
        assert docs[r.doc_id] & set(BM25_QUERY_TERMS), r


def test_bitmap_distinct_equals_count_distinct(spark, sf_dir):
    """The bitmap popcount must equal COUNT(DISTINCT) exactly, and the
    word-state size must be <= ceil(max_id/32)+1 per group."""
    from smile_spark.operators.sketch import bitmap_distinct

    rows = {r.event_type: r for r in bitmap_distinct(spark, sf_dir).collect()}
    truth = {
        r.event_type: r.nd
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("nd"))
        .collect()
    }
    assert set(rows) == set(truth)
    max_id = (
        table(spark, sf_dir, "events").agg(F.max("user_id")).collect()[0][0]
    )
    for et, r in rows.items():
        assert r.n_users == truth[et], (et, r)
        assert r.n_words <= max_id // 32 + 1, r


def test_pattern_match_events_direct_scan(spark, sf_dir):
    """A direct per-user ordered scan reproduces every match count;
    no user with zero matches is emitted."""
    from smile_spark.operators.behavior import PATTERN, pattern_match_events

    ev = sorted(
        table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    seqs = {}
    for r in ev:
        seqs.setdefault(r.user_id, []).append(r.event_type)
    expect = {}
    for uid, seq in seqs.items():
        n = sum(
            1
            for i in range(len(seq) - len(PATTERN) + 1)
            if tuple(seq[i : i + len(PATTERN)]) == PATTERN
        )
        if n:
            expect[uid] = n
    got = {
        r.user_id: r.n_matches
        for r in pattern_match_events(spark, sf_dir).collect()
    }
    assert got == expect


def test_inverted_index_stats_fingerprints(spark, sf_dir):
    """df/cf/posting fingerprints agree with a direct recomputation
    for a sample of tokens; df <= cf; first_doc <= last_doc."""
    import collections
    import hashlib

    from smile_spark.operators.text import inverted_index_stats

    rows = {r.tok: r for r in inverted_index_stats(spark, sf_dir).collect()}
    assert rows
    postings = collections.defaultdict(list)
    cf = collections.Counter()
    for r in table(spark, sf_dir, "documents").collect():
        seen = collections.Counter(r.text.split(" "))
        for tok, c in seen.items():
            postings[tok].append(r.doc_id)
            cf[tok] += c
    assert set(rows) == set(postings)
    for tok in list(sorted(postings))[::7]:
        r = rows[tok]
        ids = sorted(postings[tok])
        assert r.df == len(ids) and r.cf == cf[tok], (tok, r)
        assert r.first_doc == ids[0] and r.last_doc == ids[-1]
        want = hashlib.md5(
            ",".join(str(i) for i in ids).encode()
        ).hexdigest()
        assert r.postings_md5 == want, tok
        assert r.df <= r.cf


def test_funnel_latency_consistent_with_funnel(spark, sf_dir):
    """Converter count equals funnel_conversion's purchase leg when
    computed over first-view (not first-click) ordering is relaxed:
    here we check internal consistency instead — n_converters equals
    a direct recomputation, percentiles are ordered and positive."""
    from smile_spark.operators.behavior import funnel_latency

    row = funnel_latency(spark, sf_dir).collect()[0]
    ev = table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    ).collect()
    v, p = {}, {}
    for r in ev:
        if r.event_type == "view":
            v[r.user_id] = min(v.get(r.user_id, r.us), r.us)
    for r in ev:
        if r.event_type == "purchase" and r.user_id in v and r.us > v[r.user_id]:
            p[r.user_id] = min(p.get(r.user_id, r.us), r.us)
    lats = sorted((p[u] - v[u]) / 1e6 for u in p)
    assert row.n_converters == len(lats)
    assert 0 < row.p50_s <= row.p90_s <= row.p99_s
    assert row.p99_s <= lats[-1] + 1e-9


def test_dedup_eval_confusion_identities(spark, sf_dir):
    """Confusion-matrix identities must hold (tp+fn = n_truth,
    tp+fp = n_lsh); LSH's exact verify makes fp = 0 structurally;
    precision is 1.0 whenever any pair was emitted."""
    from smile_spark.operators.dedup import dedup_eval

    r = dedup_eval(spark, sf_dir).collect()[0]
    assert r.tp + r.fn == r.n_truth
    assert r.tp + r.fp == r.n_lsh
    assert r.fp == 0
    assert r.n_truth > 0  # the audit block must contain true pairs
    if r.n_lsh > 0:
        assert r.precision == 1.0
    if r.n_truth > 0 and r.recall is not None:
        assert 0.0 <= r.recall <= 1.0


def test_stratified_kfold_balance_and_stability(spark, sf_dir):
    """Folds are balanced to at most 1 document per stratum BY
    CONSTRUCTION; total docs conserved; and the assignment is stable
    across invocations (the property df.randomSplit lacks)."""
    from smile_spark.operators.curation import KFOLD_K, stratified_kfold

    rows = stratified_kfold(spark, sf_dir).collect()
    assert rows
    total = table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == total
    for r in rows:
        assert 0 <= r.fold < KFOLD_K
        assert r.stratum_imbalance <= 1, r
    again = {(r.source, r.fold): r.n_docs
             for r in stratified_kfold(spark, sf_dir).collect()}
    assert again == {(r.source, r.fold): r.n_docs for r in rows}
