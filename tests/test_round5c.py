"""Round-5 batch-3 additions: Kruskal-Wallis, two-proportion z-test,
Zipf slope, centroid silhouette, label propagation. Oracle comparison
plus an independent scipy/numpy/pure-python recomputation each."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from historical_obs_platform_spark.registry import QUERIES, load_all

from .conftest import SF_SMALL, assert_matches_oracle

load_all()


class TestKruskalWallis:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a32_kruskal_wallis")

    def test_matches_rank_recomputation(self, spark):
        """Definitional H from scipy-style average ranks (pandas
        rank(method='average')), tie-corrected."""
        row = (
            QUERIES["a32_kruskal_wallis"](spark, SF_SMALL)
            .toPandas()
            .iloc[0]
        )
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").dropna(
            subset=["value"]
        )
        ev = ev.assign(rank=ev.value.rank(method="average"))
        n = len(ev)
        s = sum(
            g["rank"].sum() ** 2 / len(g)
            for _, g in ev.groupby("event_type")
        )
        h = 12.0 * s / (n * (n + 1)) - 3.0 * (n + 1)
        ties = ev.value.value_counts()
        tie_c = 1.0 - float((ties**3 - ties).sum()) / (n**3 - n)
        assert math.isclose(row.h, h, rel_tol=1e-9, abs_tol=1e-6)
        assert math.isclose(row.tie_c, tie_c, abs_tol=1e-6)
        assert math.isclose(
            row.h_adj, h / tie_c, rel_tol=1e-9, abs_tol=1e-6
        )
        assert int(row.n) == n
        assert int(row.k) == ev.event_type.nunique()
        assert 0.0 < row.tie_c <= 1.0


class TestAbTestZ:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a33_ab_test_z")

    def test_matches_direct_formula(self, spark):
        row = QUERIES["a33_ab_test_z"](spark, SF_SMALL).toPandas().iloc[0]
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
            ["ts", "event_id"]
        )
        first = ev.groupby("user_id").first()
        conv = (first.event_type == "purchase").astype(int)
        variant = pd.Series(first.index % 2, index=first.index)
        n_a, n_b = int((variant == 0).sum()), int((variant == 1).sum())
        c_a = int(conv[variant == 0].sum())
        c_b = int(conv[variant == 1].sum())
        assert (int(row.n_a), int(row.n_b)) == (n_a, n_b)
        assert (int(row.conv_a), int(row.conv_b)) == (c_a, c_b)
        pa, pb = c_a / n_a, c_b / n_b
        pp = (c_a + c_b) / (n_a + n_b)
        z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / n_a + 1 / n_b))
        assert math.isclose(row.z, z, rel_tol=1e-6, abs_tol=1e-6)


class TestZipfSlope:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "t_zipf_slope")

    def test_matches_numpy_polyfit(self, spark):
        row = QUERIES["t_zipf_slope"](spark, SF_SMALL).toPandas().iloc[0]
        d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
        d = d[d.text.notna()]
        cnt: dict[str, int] = {}
        for text in d.text:
            for w in " ".join(text.strip().lower().split()).split(" "):
                cnt[w] = cnt.get(w, 0) + 1
        top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:256]
        x = np.log(np.arange(1, len(top) + 1, dtype=float))
        y = np.log(np.array([c for _, c in top], dtype=float))
        slope, intercept = np.polyfit(x, y, 1)
        assert int(row.k) == len(top)
        assert math.isclose(row.slope, slope, rel_tol=1e-6, abs_tol=1e-6)
        assert math.isclose(
            row.intercept, intercept, rel_tol=1e-6, abs_tol=1e-6
        )
        # Zipf-ish corpora have a negative slope and a decent fit
        assert row.slope < 0
        assert 0.0 <= row.r2 <= 1.0


class TestSilhouetteCells:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "s_silhouette_cells")

    def test_matches_numpy(self, spark):
        got = (
            QUERIES["s_silhouette_cells"](spark, SF_SMALL)
            .toPandas()
            .set_index("cell")
            .sort_index()
        )
        emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet").sort_values(
            "vec_id"
        )
        vecs = np.stack(
            [np.asarray(v, dtype=np.float64) for v in emb.embedding]
        )
        cents = vecs[:16]
        d = ((vecs[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        d = np.round(d, 6)
        order = np.argsort(d, axis=1, kind="stable")
        a = d[np.arange(len(vecs)), order[:, 0]]
        b = d[np.arange(len(vecs)), order[:, 1]]
        cell = order[:, 0]
        sil = np.round((b - a) / np.maximum(a, b), 6)
        for c in got.index:
            mask = cell == c
            assert int(got.loc[c, "n"]) == int(mask.sum())
            assert math.isclose(
                got.loc[c, "mean_sil"],
                float(sil[mask].mean()),
                rel_tol=1e-6,
                abs_tol=1e-5,
            )
        # n's cover the whole corpus
        assert int(got.n.sum()) == len(vecs)


class TestLabelProp:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_label_prop")

    def test_matches_sync_lpa_bruteforce(self, spark):
        got = (
            QUERIES["g_label_prop"](spark, SF_SMALL)
            .toPandas()
            .set_index("node")["label"]
        )
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
            ["l_orderkey", "l_suppkey", "l_quantity"]
        ]
        od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
            ["o_orderkey", "o_custkey"]
        ]
        li = li[li.l_quantity >= 48].merge(
            od, left_on="l_orderkey", right_on="o_orderkey"
        )
        adj: dict[int, set[int]] = {}
        for c, s in zip(li.o_custkey * 2, li.l_suppkey * 2 + 1):
            adj.setdefault(int(c), set()).add(int(s))
            adj.setdefault(int(s), set()).add(int(c))
        lab = {v: v for v in adj}
        for _ in range(3):
            new = {}
            for v in adj:
                votes: dict[int, int] = {}
                for u in adj[v]:
                    votes[lab[u]] = votes.get(lab[u], 0) + 1
                new[v] = min(
                    votes, key=lambda label: (-votes[label], label)
                )
            lab = new
        assert set(got.index) == set(adj)
        for v in adj:
            assert got[v] == lab[v], f"node {v}"


class TestLinkPrediction:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_link_prediction")

    def test_matches_set_bruteforce(self, spark):
        got = QUERIES["g_link_prediction"](spark, SF_SMALL).toPandas()
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
            ["l_orderkey", "l_suppkey", "l_quantity"]
        ]
        od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
            ["o_orderkey", "o_custkey"]
        ]
        li = li[li.l_quantity >= 48].merge(
            od, left_on="l_orderkey", right_on="o_orderkey"
        )
        nbrs: dict[int, set[int]] = {}
        for c, s in zip(li.o_custkey, li.l_suppkey):
            nbrs.setdefault(int(c), set()).add(int(s))
        scores = []
        cs = sorted(nbrs)
        for i, a in enumerate(cs):
            for b in cs[i + 1 :]:
                common = len(nbrs[a] & nbrs[b])
                if common:
                    scores.append(
                        (
                            round(common / len(nbrs[a] | nbrs[b]), 6),
                            a,
                            b,
                            common,
                        )
                    )
        scores.sort(key=lambda t: (-t[0], t[1], t[2]))
        want = scores[:20]
        assert len(got) == len(want)
        for row, (j, a, b, common) in zip(got.itertuples(), want):
            assert (row.node_a, row.node_b, row.n_common) == (a, b, common)
            assert math.isclose(row.jaccard, j, abs_tol=1e-9)


class TestHoltWinters:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "w26_holt_winters")

    def test_matches_scalar_fold(self, spark):
        """Bit-identical to an independent pandas/python replay of the
        additive HW recurrence (alpha=beta=gamma=1/2, m=24)."""
        got = (
            QUERIES["w26_holt_winters"](spark, SF_SMALL)
            .toPandas()
            .set_index("event_type")
        )
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        ev = ev.assign(hr=ev.ts.dt.floor("h"))
        h = ev.groupby(["event_type", "hr"]).size().reset_index(name="x")
        for et, g in h.groupby("event_type"):
            xs = [float(x) for x in g.sort_values("hr").x]
            level, trend = xs[0], 0.0
            sl = [0.0] * 24
            for x in xs[1:]:
                s_old = sl[0]
                l_new = (x - s_old) / 2 + (level + trend) / 2
                trend = ((l_new - level) + trend) / 2
                s_new = ((x - l_new) + s_old) / 2
                sl = sl[1:] + [s_new]
                level = l_new
            row = got.loc[et]
            assert int(row.n_obs) == len(xs)
            # bit-identity, not isclose: same IEEE ops in same order
            assert row.level == level
            assert row.trend == trend
            assert row.s_next == sl[0]
            assert row.forecast == level + trend + sl[0]


class TestCrossCorrelation:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "w27_cross_correlation")

    def test_matches_numpy_corrcoef(self, spark):
        got = (
            QUERIES["w27_cross_correlation"](spark, SF_SMALL)
            .toPandas()
            .set_index("lag")
            .sort_index()
        )
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        hi = (
            ev.ts.astype("int64") // 3_600_000_000
        )  # datetime64[us] -> epoch hour
        h = pd.DataFrame(
            {
                "hi": hi,
                "v": (ev.event_type == "view").astype(int),
                "p": (ev.event_type == "purchase").astype(int),
            }
        ).groupby("hi").sum()
        for lag in range(-3, 4):
            x, y = [], []
            for hr, row in h.iterrows():
                if hr + lag in h.index:
                    x.append(row.v)
                    y.append(h.loc[hr + lag, "p"])
            r = np.corrcoef(x, y)[0, 1]
            assert int(got.loc[lag, "n"]) == len(x)
            assert math.isclose(
                got.loc[lag, "r"], r, rel_tol=1e-6, abs_tol=1e-6
            )
        # zero-lag correlation of independent-ish series is small
        assert abs(got.loc[0, "r"]) < 0.5


class TestViewNoPurchase:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "j16_view_no_purchase")

    def test_matches_interval_scan(self, spark):
        got = (
            QUERIES["j16_view_no_purchase"](spark, SF_SMALL)
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        us = ev.ts.astype("int64")  # datetime64[us] epoch micros
        ev = ev.assign(us=us)
        views = ev[ev.event_type == "view"]
        buys = ev[ev.event_type == "purchase"]
        for uid, g in views.groupby("user_id"):
            bu = buys[buys.user_id == uid].us.to_numpy()
            unconv = 0
            for t in g.us:
                if not ((bu > t) & (bu <= t + 3_600_000_000)).any():
                    unconv += 1
            row = got.loc[uid]
            assert int(row.n_views) == len(g)
            assert int(row.n_unconverted) == unconv
            assert math.isclose(
                row.unconverted_rate, round(unconv / len(g), 6),
                abs_tol=1e-9,
            )


class TestDegreeAssortativity:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_degree_assortativity")

    def test_matches_numpy(self, spark):
        row = (
            QUERIES["g_degree_assortativity"](spark, SF_SMALL)
            .toPandas()
            .iloc[0]
        )
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
            ["l_orderkey", "l_suppkey", "l_quantity"]
        ]
        od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")[
            ["o_orderkey", "o_custkey"]
        ]
        li = li[li.l_quantity >= 48].merge(
            od, left_on="l_orderkey", right_on="o_orderkey"
        )
        pairs = {
            (int(c), int(s))
            for c, s in zip(li.o_custkey * 2, li.l_suppkey * 2 + 1)
        }
        edges = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
        deg: dict[int, int] = {}
        for a, _ in edges:
            deg[a] = deg.get(a, 0) + 1
        xs = np.array([deg[a] for a, _ in edges], dtype=float)
        ys = np.array([deg[b] for _, b in edges], dtype=float)
        r = np.corrcoef(xs, ys)[0, 1]
        assert int(row.n_edges) == len(edges)
        assert math.isclose(
            row.assortativity, r, rel_tol=1e-6, abs_tol=1e-6
        )
        # bipartite hub-leaf trade graphs are disassortative
        assert row.assortativity < 0


class TestMarkovEntropyRate:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a34_markov_entropy_rate")

    def test_matches_direct_entropy(self, spark):
        got = (
            QUERIES["a34_markov_entropy_rate"](spark, SF_SMALL)
            .toPandas()
            .set_index("from_type")
        )
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        cnt: dict[tuple[str, str], int] = {}
        for _, g in ev.groupby("user_id"):
            ets = g.event_type.tolist()
            for a, b in zip(ets, ets[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + 1
        froms = {a for a, _ in cnt}
        for ft in froms:
            tot = sum(n for (a, _), n in cnt.items() if a == ft)
            h = -sum(
                (n / tot) * math.log(n / tot)
                for (a, _), n in cnt.items()
                if a == ft
            )
            assert int(got.loc[ft, "n"]) == tot
            assert math.isclose(
                got.loc[ft, "h_nats"], h, rel_tol=1e-6, abs_tol=1e-6
            )
            # entropy bounded by ln(alphabet)
            assert 0.0 <= got.loc[ft, "h_nats"] <= math.log(5) + 1e-9


class TestRfmScores:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "e_rfm_scores")

    def test_quintile_properties(self, spark):
        got = QUERIES["e_rfm_scores"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        assert len(got) == ev.user_id.nunique()
        for c in ("r", "f", "m"):
            sizes = got[c].value_counts()
            assert set(sizes.index) == {1, 2, 3, 4, 5}
            assert sizes.max() - sizes.min() <= 1  # ntile balance
        # frequency quintile 1 really holds the most-active users
        f1_min = got.loc[got.f == 1, "freq"].min()
        f5_max = got.loc[got.f == 5, "freq"].max()
        assert f1_min >= f5_max
        # monetary matches an exact pandas recount for a few users
        buys = ev[ev.event_type == "purchase"]
        mon = buys.groupby("user_id").value.apply(
            lambda s: float(round(s.sum(), 2))
        )
        sample = got.nlargest(5, "monetary")
        for r in sample.itertuples():
            assert math.isclose(
                r.monetary, mon.get(r.user_id, 0.0), abs_tol=0.01
            )


class TestCdcChunking:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "d_cdc_chunking")

    def test_chunks_reassemble_and_savings_bound(self, spark):
        """Pure-python CDC replay: same boundary rule, chunks must
        reassemble to the normalized text, and the corpus stats must
        match the query exactly."""
        import hashlib as hl

        row = QUERIES["d_cdc_chunking"](spark, SF_SMALL).toPandas().iloc[0]
        d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
        d = d[d.text.notna()]
        total = 0
        hashes: dict[str, tuple[int, int]] = {}
        n_docs = 0
        for text in d.text:
            norm = " ".join(text.strip().lower().split())
            toks = norm.split(" ")
            if len(toks) < 1 or norm == "":
                if norm == "":
                    continue
            n_docs += 1
            chunks, cur = [], []
            for w in toks:
                cur.append(w)
                if hl.md5(w.encode()).hexdigest()[0] == "0":
                    chunks.append(" ".join(cur))
                    cur = []
            if cur:
                chunks.append(" ".join(cur))
            assert " ".join(chunks) == norm
            for c in chunks:
                total += 1
                h = hl.md5(c.encode()).hexdigest()
                cnt, cl = hashes.get(h, (0, len(c)))
                hashes[h] = (cnt + 1, cl)
        assert int(row.n_docs) == n_docs
        assert int(row.total_chunks) == total
        assert int(row.distinct_chunks) == len(hashes)
        saved = sum((cnt - 1) * cl for cnt, cl in hashes.values())
        tb = sum(cnt * cl for cnt, cl in hashes.values())
        assert int(row.total_chars) == tb
        assert int(row.char_savings_ppm) == saved * 1_000_000 // tb
        assert 0 <= row.char_savings_ppm < 1_000_000
