"""Round-7 second-batch operators: weighted SSSP, HITS, exact moment
statistics, and the stratified survival life table."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _trade_edge_list(spark):
    from bigdata_spark.plans.graphq import _trade_edges

    nodes, edges = _trade_edges(spark, SF)
    ns = sorted(r["node"] for r in nodes.collect())
    es = [(r["src"], r["dst"], r["w"]) for r in edges.collect()]
    return ns, es


def test_sssp_matches_python_bellman_ford(spark):
    from bigdata_spark.plans.graphq import (
        _SSSP_COST_NUM,
        _SSSP_INF,
        _SSSP_ROUNDS,
        _SSSP_SEED,
        graph_sssp_weighted,
    )

    ns, es = _trade_edge_list(spark)
    cost = [(s, d, 1 + _SSSP_COST_NUM // w) for s, d, w in es]
    dist = {n: (0 if n == _SSSP_SEED else _SSSP_INF) for n in ns}
    for _ in range(_SSSP_ROUNDS):
        relax = {}
        for s, d, c in cost:
            cand = dist[s] + c
            if d not in relax or cand < relax[d]:
                relax[d] = cand
        dist = {n: min(dist[n], relax.get(n, _SSSP_INF)) for n in ns}

    rows = graph_sssp_weighted(spark, SF).collect()
    got = {r["n_nationkey"]: r["dist"] for r in rows}
    assert got == dist
    assert got[_SSSP_SEED] == 0
    for r in rows:
        assert r["reachable"] == (r["dist"] < _SSSP_INF)


def test_hits_matches_python_integer_iteration(spark):
    from bigdata_spark.plans.graphq import _HITS_ROUNDS, _HITS_SCALE, graph_hits

    ns, es = _trade_edge_list(spark)

    def norm(masses):
        total = sum(masses.values())
        div = max(1, total // _HITS_SCALE)
        return {n: m // div for n, m in masses.items()}

    hub = {n: _HITS_SCALE for n in ns}
    auth = None
    for _ in range(_HITS_ROUNDS):
        raw_a = {n: 0 for n in ns}
        for s, d, w in es:
            raw_a[d] += hub[s] * w
        auth = norm(raw_a)
        raw_h = {n: 0 for n in ns}
        for s, d, w in es:
            raw_h[s] += auth[d] * w
        hub = norm(raw_h)

    rows = graph_hits(spark, SF).collect()
    assert {r["n_nationkey"]: r["authority"] for r in rows} == auth
    assert {r["n_nationkey"]: r["hub"] for r in rows} == hub
    # integer renormalization pins the L1 norm near the scale
    assert _HITS_SCALE // 2 <= sum(auth.values()) <= 2 * _HITS_SCALE


def test_skew_kurtosis_matches_python_moments(spark):
    from bigdata_spark.plans.statsq import stat_skew_kurtosis
    from bigdata_spark.sources.catalog import load_table

    raw = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups: dict[str, list[int]] = {}
    for r in raw:
        groups.setdefault(r["o_orderpriority"], []).append(
            math.floor(r["o_totalprice"] + 0.5)
        )

    rows = {r["o_orderpriority"]: r for r in stat_skew_kurtosis(spark, SF).collect()}
    assert set(rows) == set(groups)
    for k, qs in groups.items():
        n = float(len(qs))
        s1 = float(sum(qs))
        s2 = float(sum(q * q for q in qs))
        s3 = float(sum(q * q * q for q in qs))
        s4 = float(sum(q * q * q * q for q in qs))
        mean = s1 / n
        m2 = s2 / n - mean * mean
        m3 = s3 / n - 3.0 * mean * (s2 / n) + 2.0 * mean * mean * mean
        m4 = (
            s4 / n
            - 4.0 * mean * (s3 / n)
            + 6.0 * mean * mean * (s2 / n)
            - 3.0 * mean * mean * mean * mean
        )
        r = rows[k]
        assert r["n"] == len(qs) and r["sum_units"] == sum(qs)
        assert math.isclose(r["mean_units"], mean, rel_tol=1e-12)
        assert math.isclose(r["var_units"], m2, rel_tol=1e-12)
        assert math.isclose(
            r["skewness"], m3 / (m2 * math.sqrt(m2)), rel_tol=1e-9
        )
        assert math.isclose(r["kurtosis_excess"], m4 / (m2 * m2) - 3.0, rel_tol=1e-9)


def test_neyman_allocation_exhausts_budget(spark):
    from bigdata_spark.plans.samplingq import _ALLOC_N, p9_neyman_allocation
    from bigdata_spark.sources.catalog import load_table

    rows = p9_neyman_allocation(spark, SF).collect()
    assert sum(r["alloc_neyman"] for r in rows) == _ALLOC_N
    assert sum(r["n_rows"] for r in rows) == load_table(spark, SF, "orders").count()
    for r in rows:
        assert r["sd_cents"] > 0 and r["neyman_weight"] > 0
        assert 0 <= r["alloc_proportional"] <= _ALLOC_N
    # Neyman must differ from proportional when stddevs differ... or at
    # minimum never allocate more than the budget to one stratum
    assert max(r["alloc_neyman"] for r in rows) < _ALLOC_N


def test_cem_att_matches_python_replication(spark):
    import math

    from bigdata_spark.plans.statsq import _CEM_BAL_BIN, _CEM_TREATMENT, stat_cem_att
    from bigdata_spark.sources.catalog import load_table

    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    n = load_table(spark, SF, "nation")
    joined = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .select("n_regionkey", "c_acctbal", "o_orderpriority",
                "c_mktsegment", "o_totalprice")
        .collect()
    )
    strata: dict[tuple, list] = {}
    for r in joined:
        key = (
            r["n_regionkey"],
            math.floor(r["c_acctbal"] / _CEM_BAL_BIN),
            r["o_orderpriority"],
        )
        t = 1 if r["c_mktsegment"] == _CEM_TREATMENT else 0
        cents = math.floor(r["o_totalprice"] * 100 + 0.5)
        strata.setdefault(key, []).append((t, cents))
    att_num = m_t = m_c = n_strata = unmatched = 0
    for units in strata.values():
        nt = sum(t for t, _ in units)
        nc = len(units) - nt
        if nt > 0 and nc == 0:
            unmatched += nt
        if nt == 0 or nc == 0:
            continue
        sum_t = sum(ce for t, ce in units if t == 1)
        sum_c = sum(ce for t, ce in units if t == 0)
        mc_micro = (10000 * sum_c) // nc  # nonneg: trunc == floor
        att_num += 10000 * sum_t - nt * mc_micro
        m_t += nt
        m_c += nc
        n_strata += 1
    row = stat_cem_att(spark, SF).collect()[0]
    assert row["n_strata_matched"] == n_strata
    assert row["n_treated_matched"] == m_t
    assert row["n_control_matched"] == m_c
    assert row["n_treated_unmatched"] == unmatched
    expect_micro = (
        att_num // m_t if att_num >= 0 else -((-att_num) // m_t)
    )  # SQL div truncates toward zero
    assert row["att_micro_cents"] == expect_micro
    assert math.isclose(row["att_dollars"], att_num / m_t / 1e6, rel_tol=1e-12)


def test_quantile_hist_brackets_exact_percentile(spark):
    from bigdata_spark.plans.extended import _QH_WIDTH, approx_quantile_hist
    from bigdata_spark.sources.catalog import load_table

    vals = sorted(
        r["o_totalprice"]
        for r in load_table(spark, SF, "orders").select("o_totalprice").collect()
    )
    rows = approx_quantile_hist(spark, SF).collect()
    assert [r["pct"] for r in rows] == [50, 90, 95, 99]
    for r in rows:
        assert r["n"] == len(vals)
        target = (r["pct"] * len(vals) + 99) // 100
        assert r["target_rank"] == target
        exact = vals[target - 1]  # rank-th smallest
        assert abs(r["estimate"] - exact) <= _QH_WIDTH
        assert r["bucket"] * _QH_WIDTH <= r["estimate"] <= (r["bucket"] + 1) * _QH_WIDTH


def test_audio_silence_matches_gate_pattern(spark):
    from bigdata_spark.plans.multimodalq import _SIL_WIN_MS, mm_audio_silence

    rows = {r["media_id"]: r for r in mm_audio_silence(spark, SF).collect()}
    assert len(rows) == 48
    for i in range(48):
        period = 2 + i % 3
        silent_blocks = [b for b in range(8) if (b + i) % period == 0]
        # 250 ms blocks → two 125 ms windows each
        silent_wins = sorted(w for b in silent_blocks for w in (2 * b, 2 * b + 1))
        runs = []
        for w in silent_wins:
            if runs and w == runs[-1][1] + 1:
                runs[-1][1] = w
            else:
                runs.append([w, w])
        r = rows[i]
        assert r["n_windows"] == 16
        assert r["n_silent"] == len(silent_wins)
        assert r["n_runs"] == len(runs)
        longest = max((b - a + 1 for a, b in runs), default=0)
        assert r["longest_run_ms"] == longest * _SIL_WIN_MS
        first = silent_wins[0] * _SIL_WIN_MS if silent_wins else -1
        assert r["first_silence_ms"] == first


def test_markov_stationary_matches_python_iteration(spark):
    from bigdata_spark.plans.events import (
        _MKV_ITERS,
        _MKV_SCALE,
        evt_markov_stationary,
    )
    from bigdata_spark.plans.events import evt_transitions

    trans = evt_transitions(spark, SF).collect()
    counts = {(r["prev_type"], r["next_type"]): r["n"] for r in trans}
    tot: dict[str, int] = {}
    for (p, _nx), n in counts.items():
        tot[p] = tot.get(p, 0) + n
    states = sorted(tot)
    pi = {s: _MKV_SCALE for s in states}
    for _ in range(_MKV_ITERS):
        nxt = {s: 0 for s in states}
        for (p, nx), n in counts.items():
            nxt[nx] += (pi[p] * n) // tot[p]
        pi = nxt
    rows = evt_markov_stationary(spark, SF).collect()
    assert {r["event_type"]: r["mass"] for r in rows} == pi
    # fixed-point mass is conserved up to integer-division leakage
    assert sum(pi.values()) <= len(states) * _MKV_SCALE
    masses = [r["mass"] for r in rows]
    assert masses == sorted(masses, reverse=True)


def test_manifest_time_travel_snapshot_isolation(spark):
    from bigdata_spark.plans.scaleq import s34_manifest_time_travel
    from bigdata_spark.sources.catalog import load_table

    rows = s34_manifest_time_travel(spark, SF).collect()
    v1 = {r["o_orderstatus"]: r for r in rows if r["version"] == 1}
    v2 = {r["o_orderstatus"]: r for r in rows if r["version"] == 2}
    assert set(v1) == set(v2)
    base = (
        load_table(spark, SF, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .collect()
    )
    for r in base:
        st = r["o_orderstatus"]
        assert v1[st]["n"] == r["n"] and v1[st]["sum_price"] == r["sum_price"]
        assert v2[st]["n"] == r["n"]
        if st == "F":  # the rewritten partition: prices exactly doubled
            assert v2[st]["sum_price"] == 2 * r["sum_price"]
        else:  # untouched partitions identical across versions
            assert v2[st]["sum_price"] == r["sum_price"]


def test_pava_rational_and_isotonic_fit(spark):
    import random

    from bigdata_spark.ml.isotonic import pava_rational
    from bigdata_spark.plans.mlq import ml_isotonic_calibration

    # property: monotone output, pool-mass preserved, idempotent
    rng = random.Random(7)
    for _ in range(20):
        cells = [
            (b, rng.randint(1, 20), 0) for b in range(rng.randint(1, 30))
        ]
        cells = [(b, n, rng.randint(0, n)) for b, n, _ in cells]
        fit = pava_rational(cells)
        assert len(fit) == len(cells)
        # nondecreasing: num_i/den_i <= num_{i+1}/den_{i+1}
        for (_, n1, d1), (_, n2, d2) in zip(fit, fit[1:]):
            assert n1 * d2 <= n2 * d1
        # exact mass conservation: Σ n_b · fit_b == Σ y_b (each pool
        # contributes den · (num/den) = num) — identity-free rational check
        from fractions import Fraction

        total = sum(
            Fraction(n) * Fraction(num, den)
            for (_, n, _), (_, num, den) in zip(cells, fit)
        )
        assert total == sum(sy for _, _, sy in cells)
        # the isotonic fit's closed form: fit_b = max_{i≤b} min_{j≥b}
        # mean(i..j) — an independent exact reference
        B = len(cells)
        pn = [0] * (B + 1)
        ps = [0] * (B + 1)
        for ix, (_, n, sy) in enumerate(cells):
            pn[ix + 1] = pn[ix] + n
            ps[ix + 1] = ps[ix] + sy
        for b, (_, num, den) in enumerate(fit):
            expect = max(
                min(
                    Fraction(ps[j + 1] - ps[i], pn[j + 1] - pn[i])
                    for j in range(b, B)
                )
                for i in range(b + 1)
            )
            assert Fraction(num, den) == expect

    rows = ml_isotonic_calibration(spark, SF).collect()
    ppm = [r["fitted_ppm"] for r in rows]
    assert ppm == sorted(ppm)
    assert all(0 <= p <= 1_000_000 for p in ppm)


def test_qini_uplift_curve_invariants(spark):
    from bigdata_spark.plans.statsq import stat_qini_uplift
    from bigdata_spark.sources.catalog import load_table

    rows = stat_qini_uplift(spark, SF).collect()
    assert [r["decile"] for r in rows] == list(range(1, 11))
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    # ntile buckets differ by at most 1 and partition the users
    sizes = [r["n_t"] + r["n_c"] for r in rows]
    assert sum(sizes) == n_users and max(sizes) - min(sizes) <= 1
    ct = cc = yt = yc = 0
    for r in rows:
        ct += r["n_t"]; cc += r["n_c"]; yt += r["y_t"]; yc += r["y_c"]
        assert (r["n_t_cum"], r["n_c_cum"], r["y_t_cum"], r["y_c_cum"]) == (
            ct, cc, yt, yc,
        )
        if cc == 0:
            assert r["qini"] is None
        else:
            assert abs(r["qini"] - (yt - yc * ct / cc)) < 1e-9
        if ct == 0 or cc == 0:
            assert r["uplift_cum"] is None
        else:
            assert abs(r["uplift_cum"] - (yt / ct - yc / cc)) < 1e-12


def test_eb_shrinkage_pulls_toward_prior(spark):
    from bigdata_spark.plans.statsq import _EB_ALPHA, _EB_BETA, stat_eb_shrinkage

    rows = stat_eb_shrinkage(spark, SF).collect()
    assert len(rows) == 25
    prior_ppm = 1_000_000 * _EB_ALPHA // (_EB_ALPHA + _EB_BETA)
    for r in rows:
        assert r["raw_ppm"] == (1_000_000 * r["y"]) // r["n"]
        lo, hi = sorted((r["raw_ppm"], prior_ppm))
        assert lo - 1 <= r["shrunk_ppm"] <= hi + 1  # trunc-div slack
    assert sorted(r["rank_raw"] for r in rows) == list(range(1, 26))
    assert sorted(r["rank_shrunk"] for r in rows) == list(range(1, 26))


def test_readability_matches_python_regex(spark):
    import re

    from bigdata_spark.plans.textq import txt_readability
    from bigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    agg: dict[str, list[int]] = {}
    for d in docs:
        words = len(re.findall(r"[A-Za-z]+", d["text"]))
        if words == 0:
            continue
        sents = max(1, len(re.findall(r"[.!?]+", d["text"])))
        sylls = len(re.findall(r"[aeiouAEIOUyY]+", d["text"]))
        a = agg.setdefault(d["lang"], [0, 0, 0, 0, 0, 0])
        a[0] += 1; a[1] += words; a[2] += sents; a[3] += sylls
        score = 206.835 - 1.015 * (words / sents) - 84.6 * (sylls / words)
        a[4] += score >= 60
        a[5] += score < 30
    rows = {r["lang"]: r for r in txt_readability(spark, SF).collect()}
    assert set(rows) == set(agg)
    for lang, (nd, w, s, sy, easy, hard) in agg.items():
        r = rows[lang]
        assert (r["n_docs"], r["words"], r["sents"], r["sylls"]) == (nd, w, s, sy)
        assert (r["n_easy"], r["n_difficult"]) == (easy, hard)
        expect = 206.835 - 1.015 * (w / s) - 84.6 * (sy / w)
        import math

        assert math.isclose(r["flesch_lang"], expect, rel_tol=1e-12)


def test_pit_embargo_join_matches_python(spark):
    import datetime as dt

    from bigdata_spark.plans.extended import j10_pit_embargo_join
    from bigdata_spark.sources.catalog import load_table

    evs = (
        load_table(spark, SF, "events")
        .select("user_id", "ts", "event_type", "event_id")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in evs:
        by_user.setdefault(r["user_id"], []).append(r)
    expect = {}
    for uid, rows in by_user.items():
        labels = [r for r in rows if r["event_type"] == "purchase"]
        if not labels:
            continue
        n_labels = len(labels)
        sum_fc = max_fp = n_cold = 0
        for lb in labels:
            cutoff = lb["ts"] - dt.timedelta(hours=1)
            fc = sum(
                1 for r in rows if r["event_type"] == "click" and r["ts"] <= cutoff
            )
            fp = sum(
                1
                for r in rows
                if r["event_type"] == "purchase" and r["ts"] <= cutoff
            )
            sum_fc += fc
            max_fp = max(max_fp, fp)
            n_cold += fc == 0
        expect[uid] = (n_labels, sum_fc, max_fp, n_cold)
    got = {
        r["user_id"]: (
            r["n_labels"],
            r["sum_feat_clicks"],
            r["max_feat_purchases"],
            r["n_cold_start"],
        )
        for r in j10_pit_embargo_join(spark, SF).collect()
    }
    assert got == expect


def test_pseudonymize_join_is_referentially_intact(spark):
    from bigdata_spark.plans.qualityq import dq_pseudonymize_join
    from bigdata_spark.sources.catalog import load_table

    row = dq_pseudonymize_join(spark, SF).collect()[0]
    assert row["collision_free"] and row["referentially_intact"]
    assert row["n_orders"] == load_table(spark, SF, "orders").count()
    assert row["n_joined_raw"] == row["n_orders"]  # every order has a customer
    assert row["n_tokens"] == row["n_keys"] <= row["n_orders"]


def test_control_chart_zscores(spark):
    import math

    from bigdata_spark.plans.statsq import stat_control_chart
    from bigdata_spark.sources.catalog import load_table

    rows = stat_control_chart(spark, SF).collect()
    n_orders = load_table(spark, SF, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    g_n = sum(r["n"] for r in rows)
    g_c1 = sum(r["sum_cents"] for r in rows)
    # rebuild the global second moment from the raw table
    raw = load_table(spark, SF, "orders").select("o_totalprice").collect()
    cents = [math.floor(r["o_totalprice"] * 100 + 0.5) for r in raw]
    g_c2 = sum(c * c for c in cents)
    mu = g_c1 / g_n
    sd = math.sqrt(g_c2 / g_n - mu * mu)
    for r in rows:
        z = (r["sum_cents"] / r["n"] - mu) / (sd / math.sqrt(r["n"]))
        assert math.isclose(r["z"], z, rel_tol=1e-9)
        assert r["out_of_control"] == (abs(r["z"]) > 3.0)


def test_quantized_recall_bounds_and_replication(spark):
    import math

    from bigdata_spark.plans.simq import (
        _SQR_K,
        _SQR_MOD,
        _SQR_QCAP,
        _SQR_RES,
        _SQR_SCALE,
        sim_quantized_recall,
    )
    from bigdata_spark.sources.catalog import load_table

    vecs = {
        r["vec_id"]: list(r["embedding"])
        for r in load_table(spark, SF, "embeddings").collect()
    }

    def quant(v):
        return [math.floor(float(x) * _SQR_SCALE + 0.5) for x in v]

    qv = {i: quant(v) for i, v in vecs.items()}

    def cos(a, b):
        d = sum(float(x) * float(y) for x, y in zip(a, b))
        na = math.sqrt(sum(float(x) * float(x) for x in a))
        nb = math.sqrt(sum(float(y) * float(y) for y in b))
        return d / (na * nb) if na * nb != 0 else 0.0

    rows = sim_quantized_recall(spark, SF).collect()
    queries = sorted(
        i for i in vecs if i % _SQR_MOD == _SQR_RES and i < _SQR_QCAP
    )
    assert [r["query_id"] for r in rows] == queries
    for r in rows[:5]:  # replicate a few queries end-to-end
        qid = r["query_id"]
        others = [i for i in vecs if i != qid]
        exact = sorted(others, key=lambda i: (-cos(vecs[qid], vecs[i]), i))[:_SQR_K]
        approx = sorted(
            others,
            key=lambda i: (
                -sum(a * b for a, b in zip(qv[qid], qv[i])),
                i,
            ),
        )[:_SQR_K]
        overlap = len(set(exact) & set(approx))
        assert r["n_overlap"] == overlap
        assert r["recall_ppm"] == (1_000_000 * overlap) // _SQR_K
    # int8-ish quantization should preserve most of the ranking
    mean_recall = sum(r["n_overlap"] for r in rows) / (len(rows) * _SQR_K)
    assert mean_recall >= 0.5


def test_resource_allocation_degree_discount(spark):
    from bigdata_spark.plans.graphq import (
        _RA_TOPK,
        _copurchase_pairs,
        graph_resource_allocation,
    )

    pairs = {
        (r["pa"], r["pb"])
        for r in _copurchase_pairs(spark, SF).select("pa", "pb").collect()
    }
    adj: dict[int, set] = {}
    deg: dict[int, int] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for n, ns in adj.items():
        deg[n] = len(ns)
    scores = {}
    for z, ns in adj.items():
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1 :]:
                if (a, b) in pairs:
                    continue
                key = (a, b)
                cn, ra = scores.get(key, (0, 0))
                scores[key] = (cn + 1, ra + 1_000_000 // deg[z])
    expect = sorted(
        ((ra, a, b, cn) for (a, b), (cn, ra) in scores.items()),
        key=lambda t: (-t[0], t[1], t[2]),
    )[:_RA_TOPK]
    got = [
        (r["ra_ppm"], r["a"], r["b"], r["cn"])
        for r in graph_resource_allocation(spark, SF).collect()
    ]
    assert got == expect


def test_source_dedup_priority_policy(spark):
    import hashlib
    import re

    from bigdata_spark.plans.dedupq import llm_source_dedup_priority
    from bigdata_spark.sources.catalog import load_table

    docs = load_table(spark, SF, "documents").select(
        "doc_id", "text", "source"
    ).collect()
    corpus = [(r["doc_id"], r["text"], r["source"]) for r in docs]
    corpus += [
        (r["doc_id"] + 2_000_000, r["text"], f"src{(r['doc_id'] + 3) % 20}")
        for r in docs
        if r["doc_id"] % 11 == 0
    ]
    groups: dict[str, list] = {}
    for did, text, src in corpus:
        key = hashlib.md5(
            re.sub(r"\s+", " ", text.lower().strip()).encode()
        ).hexdigest()
        groups.setdefault(key, []).append((int(src[3:]), did, src))
    matrix: dict[tuple, int] = {}
    for members in groups.values():
        members.sort()
        winner = members[0][2]
        for _, _, loser in members[1:]:
            matrix[(winner, loser)] = matrix.get((winner, loser), 0) + 1
    rows = llm_source_dedup_priority(spark, SF).collect()
    assert rows, "the duplicate wave guarantees displacements"
    got = {
        (r["winner_source"], r["loser_source"]): r["n_displaced"] for r in rows
    }
    assert got == matrix


def test_jl_projection_audit_exact_replication(spark):
    import hashlib
    import math

    from bigdata_spark.plans.simq import (
        _JL_K,
        _JL_NVEC,
        _SQR_SCALE,
        sim_jl_projection_audit,
    )
    from bigdata_spark.sources.catalog import load_table

    vecs = {
        r["vec_id"]: [
            math.floor(float(x) * _SQR_SCALE + 0.5) for x in r["embedding"]
        ]
        for r in load_table(spark, SF, "embeddings")
        .filter(F.col("vec_id") < _JL_NVEC)
        .collect()
    }

    def sign(i, j):
        h = int(hashlib.md5(f"jl|{i}|{j}".encode()).hexdigest()[:15], 16)
        return 1 if h % 2 == 0 else -1

    mat = {(i, j): sign(i, j) for i in range(1, 65) for j in range(1, _JL_K + 1)}
    proj = {
        vid: [
            sum(q[i - 1] * mat[(i, j)] for i in range(1, 65))
            for j in range(1, _JL_K + 1)
        ]
        for vid, q in vecs.items()
    }
    from collections import Counter

    hist = Counter()
    mins: dict[int, int] = {}
    maxs: dict[int, int] = {}
    ids = sorted(vecs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            d2p = sum((x - y) ** 2 for x, y in zip(proj[a], proj[b]))
            d2o = sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
            r2 = (100 * d2p) // (_JL_K * d2o)
            bucket = (r2 // 10) * 10
            hist[bucket] += 1
            mins[bucket] = min(mins.get(bucket, r2), r2)
            maxs[bucket] = max(maxs.get(bucket, r2), r2)
    rows = sim_jl_projection_audit(spark, SF).collect()
    got = {
        r["ratio2_bucket"]: (
            r["n_pairs"],
            r["min_ratio2_pct"],
            r["max_ratio2_pct"],
        )
        for r in rows
    }
    assert got == {b: (hist[b], mins[b], maxs[b]) for b in hist}
    # JL contract: most mass near ratio² = 100 (undistorted)
    total = sum(hist.values())
    near = sum(n for b, n in hist.items() if 50 <= b <= 150)
    assert near / total > 0.9


def test_trimmed_mean_drops_exact_tails(spark):
    import math

    from bigdata_spark.plans.statsq import _TRIM_PCT, stat_trimmed_mean
    from bigdata_spark.sources.catalog import load_table

    raw = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_orderkey", "o_totalprice"
    ).collect()
    groups: dict[str, list] = {}
    for r in raw:
        groups.setdefault(r["o_orderpriority"], []).append(
            (math.floor(r["o_totalprice"] * 100 + 0.5), r["o_orderkey"])
        )
    rows = {r["o_orderpriority"]: r for r in stat_trimmed_mean(spark, SF).collect()}
    for prio, vals in groups.items():
        vals.sort()
        n = len(vals)
        k = n * _TRIM_PCT // 100
        kept = [c for c, _ in vals[k : n - k]]
        r = rows[prio]
        assert r["n"] == n and r["n_trimmed_each_side"] == k
        assert r["n_kept"] == len(kept)
        assert r["sum_kept_cents"] == sum(kept)
        assert math.isclose(
            r["trimmed_mean_cents"], sum(kept) / len(kept), rel_tol=1e-12
        )


def test_rising_streaks_match_python_scan(spark):
    import math

    from bigdata_spark.plans.events import _STREAK_TOPK, w13_rising_streaks
    from bigdata_spark.sources.catalog import load_table

    raw = load_table(spark, SF, "orders").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily: dict = {}
    for r in raw:
        d = r["o_orderdate"].date()
        daily[d] = daily.get(d, 0) + math.floor(r["o_totalprice"] * 100 + 0.5)
    days = sorted(daily)
    streaks = []
    start = days[0]
    for prev, cur in zip(days, days[1:]):
        rising = (cur - prev).days == 1 and daily[cur] > daily[prev]
        if not rising:
            streaks.append((start, prev))
            start = cur
    streaks.append((start, days[-1]))
    expect = sorted(
        (
            (
                -( (e - s).days + 1 ),
                -(daily[e] - daily[s]),
                s,
                e,
            )
            for s, e in streaks
            if (e - s).days + 1 >= 2
        )
    )[:_STREAK_TOPK]
    got = [
        (
            -r["len_days"],
            -r["climb_cents"],
            r["start_day"],
            r["end_day"],
        )
        for r in w13_rising_streaks(spark, SF).collect()
    ]
    assert got == expect


def test_anova_matches_python_sums(spark):
    import math

    from bigdata_spark.plans.statsq import stat_anova_oneway
    from bigdata_spark.sources.catalog import load_table

    raw = load_table(spark, SF, "orders").select(
        "o_orderpriority", "o_totalprice"
    ).collect()
    groups: dict[str, list[int]] = {}
    for r in raw:
        groups.setdefault(r["o_orderpriority"], []).append(
            math.floor(r["o_totalprice"] + 0.5)
        )
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s1 = sum(sum(v) for v in groups.values())
    s2 = sum(x * x for v in groups.values() for x in v)
    ssq_n = sum(sum(v) ** 2 // len(v) for v in groups.values())
    row = stat_anova_oneway(spark, SF).collect()[0]
    assert (row["k"], row["n"], row["sum_sq_over_n_units"]) == (k, n, ssq_n)
    ssb = ssq_n - s1 * s1 / n
    sst = s2 - s1 * s1 / n
    f = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert math.isclose(row["ss_between"], ssb, rel_tol=1e-12)
    assert math.isclose(row["ss_total"], sst, rel_tol=1e-12)
    assert math.isclose(row["f_stat"], f, rel_tol=1e-9)


def test_cohort_ltv_triangle_invariants(spark):
    import math

    from bigdata_spark.plans.events import evt_cohort_ltv
    from bigdata_spark.sources.catalog import load_table

    rows = evt_cohort_ltv(spark, SF).collect()
    assert rows
    e = load_table(spark, SF, "events")
    total_rev = sum(
        math.floor(r["value"] * 1_000_000 + 0.5)
        for r in e.filter(F.col("event_type") == "purchase")
        .select("value")
        .collect()
    )
    assert sum(r["rev_micro"] for r in rows) == total_rev
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r["cohort_w"], []).append(r)
    for rs in by_cohort.values():
        ages = [r["age_weeks"] for r in rs]
        assert ages == sorted(ages) and all(a >= 0 for a in ages)
        cum = 0
        for r in rs:
            cum += r["rev_micro"]
            assert r["cum_rev_micro"] == cum
            assert r["ltv_micro_per_user"] == cum // r["cohort_users"]


def test_top_paths_match_python(spark):
    from bigdata_spark.plans.events import _PATH_LEN, _PATH_TOPK, evt_top_paths
    from bigdata_spark.sources.catalog import load_table

    evs = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    by_ud: dict = {}
    for r in evs:
        by_ud.setdefault((r["user_id"], r["ts"].date()), []).append(
            (r["ts"], r["event_id"], r["event_type"])
        )
    from collections import Counter

    counts = Counter(
        ">".join(t for _, _, t in sorted(v)[:_PATH_LEN]) for v in by_ud.values()
    )
    expect = sorted(((-n, p) for p, n in counts.items()))[:_PATH_TOPK]
    got = [
        (-r["n_user_days"], r["path"]) for r in evt_top_paths(spark, SF).collect()
    ]
    assert got == expect


def test_growth_accounting_identities(spark):
    from bigdata_spark.plans.events import evt_growth_accounting
    from bigdata_spark.sources.catalog import load_table

    rows = evt_growth_accounting(spark, SF).collect()
    assert rows
    weeks = [r["w"] for r in rows]
    assert weeks == sorted(weeks)
    by_w = {r["w"]: r for r in rows}
    for i, r in enumerate(rows):
        # actives decompose exactly
        assert r["actives"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]
        if i == 0:
            assert r["n_retained"] == 0 and r["n_resurrected"] == 0
            assert r["n_churned"] == 0
        else:
            prev = rows[i - 1]
            # last week's actives = this week's retained + churned
            assert prev["actives"] == r["n_retained"] + r["n_churned"]
    n_users = (
        load_table(spark, SF, "events").select("user_id").distinct().count()
    )
    assert sum(r["n_new"] for r in rows) == n_users


def test_roc_auc_matches_mann_whitney_direction(spark):
    import math

    from bigdata_spark.plans.mlq import _ROC_BUCKET_W, ml_roc_auc
    from bigdata_spark.sources.catalog import load_table

    rows = ml_roc_auc(spark, SF).collect()
    # monotone curve, endpoints complete
    tps = [r["cum_tp"] for r in rows]
    fps = [r["cum_fp"] for r in rows]
    assert tps == sorted(tps) and fps == sorted(fps)
    raw = load_table(spark, SF, "orders").select(
        "o_totalprice", "o_orderstatus"
    ).collect()
    pos = sum(1 for r in raw if r["o_orderstatus"] == "F")
    neg = len(raw) - pos
    assert tps[-1] == pos and fps[-1] == neg
    # replicate AUC from banded counts
    from collections import Counter

    bands: dict[int, list[int]] = {}
    for r in raw:
        b = math.floor(r["o_totalprice"] / _ROC_BUCKET_W)
        cell = bands.setdefault(b, [0, 0])
        cell[0] += 1
        cell[1] += r["o_orderstatus"] == "F"
    ct = cf = num = 0
    for b in sorted(bands, reverse=True):
        n, tp = bands[b]
        pt, pf = ct, cf
        ct += tp
        cf += n - tp
        num += (cf - pf) * (ct + pt)
    assert rows[0]["auc_ppm"] == (1_000_000 * num) // (2 * pos * neg)
    assert all(r["auc_ppm"] == rows[0]["auc_ppm"] for r in rows)


def test_capture_recapture_consistency(spark):
    from bigdata_spark.plans.dedupq import dedup_capture_recapture

    row = dedup_capture_recapture(spark, SF).collect()[0]
    assert row["n1"] >= row["m"] and row["n2"] >= row["m"]
    if row["m"] > 0:
        # the estimate can never undercut either single method's catch
        assert row["est_pairs"] >= max(row["n1"], row["n2"])
        assert row["est_pairs_milli"] == (1000 * row["n1"] * row["n2"]) // row["m"]


def test_assortativity_matches_python_pearson(spark):
    import math

    from bigdata_spark.plans.graphq import _copurchase_pairs, graph_assortativity

    pairs = [
        (r["pa"], r["pb"])
        for r in _copurchase_pairs(spark, SF).select("pa", "pb").collect()
    ]
    deg: dict[int, int] = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in pairs:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    row = graph_assortativity(spark, SF).collect()[0]
    assert (row["m_directed_edges"], row["sum_deg_src"], row["sum_deg_prod"]) == (
        m, sx, sxy,
    )
    assert math.isclose(row["assortativity_r"], r, rel_tol=1e-12)
    assert -1.0 <= row["assortativity_r"] <= 1.0


def test_seasonal_anomaly_zscores(spark):
    import math

    from bigdata_spark.plans.events import evt_seasonal_anomaly
    from bigdata_spark.sources.catalog import load_table

    e = load_table(spark, SF, "events").filter(
        F.col("event_type") == "purchase"
    ).select("ts", "value").collect()
    hourly: dict = {}
    for r in e:
        h = r["ts"].replace(minute=0, second=0, microsecond=0)
        hourly[h] = hourly.get(h, 0) + math.floor(r["value"] * 1e6 + 0.5)
    season: dict = {}
    for h, vm in hourly.items():
        key = ((h.weekday() + 1) % 7 + 1, h.hour)  # Spark dow: Sunday=1
        season.setdefault(key, []).append(vm)
    means = {k: sum(v) // len(v) for k, v in season.items()}
    resid = {
        h: vm - means[((h.weekday() + 1) % 7 + 1, h.hour)]
        for h, vm in hourly.items()
    }
    g_n = len(resid)
    g_r2 = sum(r * r for r in resid.values())
    sd = math.sqrt(g_r2 / g_n / 1e12)
    expect = {
        h: (r / 1e6) / sd for h, r in resid.items() if abs((r / 1e6) / sd) > 3.0
    }
    rows = evt_seasonal_anomaly(spark, SF).collect()
    got = {r["h"]: r["z"] for r in rows}
    assert set(got) == set(expect)
    for h, z in got.items():
        assert math.isclose(z, expect[h], rel_tol=1e-9)
        assert abs(z) > 3.0


def test_mix_diversity_bounds(spark):
    from bigdata_spark.plans.textq import llm_mix_diversity

    row = llm_mix_diversity(spark, SF).collect()[0]
    assert 1.0 <= row["doc_eff_sources"] <= row["n_sources"]
    assert 1.0 <= row["tok_eff_sources"] <= row["n_sources"]
    # dominance is at least the uniform share
    assert row["doc_dominance_ppm"] >= 1_000_000 // row["n_sources"]
    assert row["tok_dominance_ppm"] >= 1_000_000 // row["n_sources"]


def test_survival_lifetable_invariants(spark):
    from bigdata_spark.plans.statsq import stat_survival_lifetable

    rows = stat_survival_lifetable(spark, SF).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for et, rs in by_type.items():
        durs = [r["dur_days"] for r in rs]
        assert durs == sorted(durs)
        # risk set shrinks as duration grows; events+censored exhaust it
        risks = [r["n_risk"] for r in rs]
        assert risks == sorted(risks, reverse=True)
        assert risks[0] == sum(r["n_event"] + r["n_censored"] for r in rs)
        cum = 0
        for r in rs:
            assert 0 <= r["n_event"] <= r["n_risk"]
            assert 0.0 <= r["hazard"] <= 1.0
            assert r["hazard_ppm"] == (1_000_000 * r["n_event"]) // r["n_risk"]
            cum += r["hazard_ppm"]
            assert r["cum_hazard_ppm"] == cum


def test_manifest_stats_pruning_api(spark, tmp_path):
    """collect_file_stats harvests footer min/max; read_snapshot_pruned
    skips non-intersecting files, keeps stat-less files (safe), and
    never changes the row-level answer."""
    import os

    from bigdata_spark.sources.manifest import (
        collect_file_stats,
        commit_snapshot,
        list_data_files,
        read_snapshot_pruned,
    )
    from pyspark.sql import functions as F

    base = os.path.join(str(tmp_path), "t")
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("v")
    )
    (
        df.withColumn("_b", (F.col("k") / 250).cast("int"))
        .repartition("_b")
        .write.partitionBy("_b")
        .parquet(base)
    )
    files = list_data_files(base)
    assert len(files) == 4
    stats = collect_file_stats(spark, files, ["k"])
    for f in files:
        lo, hi = stats[f]["cols"]["k"]
        assert 0 <= lo <= hi <= 999 and hi - lo <= 249
        assert stats[f]["rows"] == 250
    commit_snapshot(base, 1, files, stats=stats)

    out, n_total, n_read = read_snapshot_pruned(spark, base, 1, "k", hi=100)
    assert (n_total, n_read) == (4, 1)
    assert out.filter("k <= 100").count() == 101

    # interval predicate touches two buckets
    _out2, _, n_read2 = read_snapshot_pruned(spark, base, 1, "k", lo=200, hi=300)
    assert n_read2 == 2

    # a column with NO recorded stats never prunes
    _out3, _, n_read3 = read_snapshot_pruned(spark, base, 1, "v", hi=-1)
    assert n_read3 == 4


def test_manifest_pruning_all_files_pruned(spark, tmp_path):
    import os

    from bigdata_spark.sources.manifest import (
        collect_file_stats,
        commit_snapshot,
        list_data_files,
        read_snapshot_pruned,
    )
    from pyspark.sql import functions as F

    base = os.path.join(str(tmp_path), "t")
    spark.range(0, 100).select(F.col("id").alias("k")).repartition(2).write.parquet(base)
    files = list_data_files(base)
    commit_snapshot(base, 1, files, stats=collect_file_stats(spark, files, ["k"]))
    out, n_total, n_read = read_snapshot_pruned(spark, base, 1, "k", lo=5000)
    assert (n_total, n_read) == (2, 0)
    assert out.count() == 0 and "k" in out.columns
