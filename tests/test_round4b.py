"""Round-4b additions: triangle census, Theil-Sen slope, training
chunking, per-brand skyline, matryoshka-truncation recall. Each gets
the driver-style oracle comparison (the same check the driver runs)
plus an algebraic property the oracle can't state."""

from __future__ import annotations

import itertools

import pandas as pd

from historical_obs_platform_spark.registry import QUERIES, load_all

from .conftest import SF_SMALL, assert_matches_oracle

load_all()


class TestTriangleCount:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_triangle_count")

    def test_matches_bruteforce(self, spark):
        """Independent pandas recount of the same graph at sf0.001."""
        row = QUERIES["g_triangle_count"](spark, SF_SMALL).toPandas().iloc[0]
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
            ["l_orderkey", "l_partkey"]
        ]
        od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
        urgent = set(
            od.loc[od.o_orderpriority == "1-URGENT", "o_orderkey"]
        )
        li = li[li.l_orderkey.isin(urgent)].drop_duplicates()
        edges = set()
        for _, grp in li.groupby("l_orderkey"):
            for x, y in itertools.combinations(
                sorted(set(grp.l_partkey)), 2
            ):
                edges.add((x, y))
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        tri = (
            sum(
                1
                for u, v in edges
                for w in adj[u] & adj[v]
                if v < w
            )
        )
        assert int(row.n_edges) == len(edges)
        assert int(row.n_nodes) == len(adj)
        assert int(row.n_triangles) == tri
        wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
        assert int(row.n_wedges) == wedges
        if wedges:
            assert int(row.closure_ppm) == (3 * tri * 1_000_000) // wedges


class TestTheilSen:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a23_theil_sen")

    def test_slope_within_extremes(self, spark):
        """The median slope lies between the min and max pairwise
        slope of its group (recomputed in pandas)."""
        out = QUERIES["a23_theil_sen"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        ev["station"] = ev.user_id.astype(str)
        ev["month"] = ev.ts.dt.strftime("%Y-%m")
        ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp(0)).dt.days
        ev["cv"] = (ev.value * 100).round()
        daily = (
            ev.groupby(["station", "month", "d"])
            .agg(s=("cv", "sum"), c=("cv", "size"))
            .reset_index()
        )
        for (st, mo), grp in daily.groupby(["station", "month"]):
            rows = grp.sort_values("d").to_dict("records")
            slopes = [
                ((b["s"] / b["c"]) - (a["s"] / a["c"])) / (b["d"] - a["d"])
                for a, b in itertools.combinations(rows, 2)
            ]
            sel = out[(out.station == st) & (out.month == mo)]
            if not slopes:
                assert sel.empty
                continue
            got = sel.sen_slope.iloc[0]
            assert min(slopes) - 1e-6 <= got <= max(slopes) + 1e-6
            assert int(sel.n_pairs.iloc[0]) == len(slopes)


class TestChunkWindows:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "t_chunk_windows")

    def test_reconstructs_text(self, spark):
        """Dropping each chunk's 32-char overlap (except chunk 0)
        reconstructs the document exactly — nothing lost, nothing
        padded."""
        out = QUERIES["t_chunk_windows"](spark, SF_SMALL).toPandas()
        docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
        by_doc = dict(
            out.sort_values(["doc_id", "chunk_idx"]).groupby("doc_id")[
                "chunk"
            ].apply(list)
        )
        for _, r in docs.iterrows():
            chunks = by_doc[r.doc_id]
            rebuilt = chunks[0] + "".join(c[32:] for c in chunks[1:])
            assert rebuilt == r.text
            assert all(len(c) <= 96 for c in chunks)
            assert all(len(c) > 64 for c in chunks[:-1])


class TestSkyline:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "o22_skyline")

    def test_pareto_properties(self, spark):
        """No skyline member dominates another; every excluded part
        is dominated by some skyline member (transitivity of
        dominance makes the frontier a sufficient witness set)."""
        sky = QUERIES["o22_skyline"](spark, SF_SMALL).toPandas()
        part = pd.read_parquet(f"{SF_SMALL}/part.parquet")
        part["price"] = part.p_retailprice.astype(float)

        def dominates(a, b):
            return (
                a.price <= b.price
                and a.size >= b.size
                and (a.price < b.price or a.size > b.size)
            )

        for brand, grp in part.groupby("p_brand"):
            members = sky[sky.brand == brand]
            mem = [
                type("P", (), {"price": r.price, "size": r["size"]})
                for _, r in members.iterrows()
            ]
            for a, b in itertools.permutations(mem, 2):
                assert not dominates(a, b)
            chosen = set(members.partkey)
            for _, r in grp.iterrows():
                p = type(
                    "P", (), {"price": r.price, "size": r.p_size}
                )
                if r.p_partkey not in chosen:
                    assert any(dominates(m, p) for m in mem), (
                        brand,
                        r.p_partkey,
                    )


class TestMatryoshkaRecall:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "s_matryoshka_recall")

    def test_recall_shape(self, spark):
        out = QUERIES["s_matryoshka_recall"](spark, SF_SMALL).toPandas()
        assert set(out.method) == {"matryoshka_d16", "matryoshka_d32"}
        assert (out.n_truth == 50).all()  # 10 queries x k=5
        assert ((out.recall >= 0) & (out.recall <= 1)).all()


class TestMase:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a24_mase")

    def test_pandas_recompute(self, spark):
        out = QUERIES["a24_mase"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        ev["station"] = ev.user_id.astype(str)
        ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
        ev["cv"] = (ev.value * 100).round().astype("int64")
        daily = (
            ev.groupby(["station", "day"]).cv.sum().reset_index(name="y")
        )
        for st, grp in daily.groupby("station"):
            y = grp.sort_values("day").y.to_numpy()
            if len(y) <= 7:
                continue
            num = int(abs(y[7:] - y[:-7]).sum())
            den = int(abs(y[1:] - y[:-1]).sum())
            sel = out[out.station == st]
            assert int(sel.num.iloc[0]) == num
            assert int(sel.den.iloc[0]) == den
            assert int(sel.mase_ppm.iloc[0]) == (
                num * (len(y) - 1) * 1_000_000
            ) // (den * (len(y) - 7))


class TestPrefixJaccard:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "d_prefix_jaccard_pairs")

    def test_candidates_superset_of_truth(self, spark):
        """Every pair with Jaccard >= t must appear in the prefix
        candidate set (the zero-false-negative theorem), checked on
        the sf0.001 corpus directly against brute force."""
        from historical_obs_platform_spark.operators import dedup as DD
        from historical_obs_platform_spark.queries.common import table
        from pyspark.sql import functions as F

        docs = (
            table(spark, SF_SMALL, "documents")
            .where(F.col("doc_id") % 5 == 0)
            .select("doc_id", "text")
        )
        sh = DD.word_shingles(docs, "doc_id", "text", n=2)
        cand = {
            (r.a, r.b)
            for r in DD.prefix_filter_candidates(
                sh, "doc_id", threshold=0.5
            ).collect()
        }
        truth = {
            (r.a, r.b)
            for r in DD.jaccard_pairs(sh, "doc_id", min_jaccard=0.5)
            .select("a", "b")
            .collect()
        }
        assert truth <= cand
        # pruning is corpus-dependent (the dense synthetic vocabulary
        # keeps prefixes collision-heavy); the contract is recall=1.0
        # above plus a strictly-smaller-than-all-pairs candidate set
        n = docs.count()
        assert len(cand) < n * (n - 1) // 2


class TestScd2:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "o19_scd2_intervals")

    def test_interval_contract(self, spark):
        out = QUERIES["o19_scd2_intervals"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        for uid, grp in out.groupby("user_id"):
            grp = grp.sort_values("version").reset_index(drop=True)
            # versions are 1..n dense
            assert list(grp.version) == list(range(1, len(grp) + 1))
            # half-open chain: valid_to == successor's valid_from
            for i in range(len(grp) - 1):
                assert grp.valid_to[i] == grp.valid_from[i + 1]
                assert not grp.is_current[i]
            assert grp.is_current.iloc[-1]
            assert pd.isna(grp.valid_to.iloc[-1])
            # consecutive versions change the attribute
            attrs = list(grp.attr_value)
            assert all(x != y for x, y in zip(attrs, attrs[1:]))
            # event mass is conserved
            assert grp.n_events.sum() == (ev.user_id == uid).sum()


class TestSeasonalAnomaly:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a25_seasonal_anomaly")

    def test_pandas_recompute(self, spark):
        """Full integer decomposition replayed in pandas; the top-3
        report must agree rank for rank."""
        out = QUERIES["a25_seasonal_anomaly"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        ev["station"] = ev.user_id.astype(str)
        ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
        ev["d"] = (ev.ts.dt.normalize() - pd.Timestamp(0)).dt.days
        ev["cv"] = (ev.value * 100).round().astype("int64")
        daily = (
            ev.groupby(["station", "day", "d"])
            .cv.sum()
            .reset_index(name="y")
        )
        for st, grp in daily.groupby("station"):
            grp = grp.sort_values("d").reset_index(drop=True)
            dmap = dict(zip(grp.d, grp.y))
            rows = []
            for _, r in grp.iterrows():
                window = [
                    dmap[r.d + o] for o in range(-3, 4) if r.d + o in dmap
                ]
                if len(window) != 7:
                    continue
                rows.append(
                    dict(
                        day=r.day,
                        dow=(r.d + 4) % 7,
                        y=r.y,
                        t7=sum(window),
                        dt7=7 * r.y - sum(window),
                    )
                )
            if not rows:
                assert out[out.station == st].empty
                continue
            df = pd.DataFrame(rows)
            seas = {
                dow: int(g.dt7.sum() / len(g))  # trunc toward zero
                for dow, g in df.groupby("dow")
            }
            df["resid"] = df.apply(
                lambda r: r.dt7 - seas[r.dow], axis=1
            )
            top = (
                df.assign(absr=df.resid.abs())
                .sort_values(["absr", "day"], ascending=[False, True])
                .head(3)
            )
            sel = out[out.station == st].sort_values("rank")
            assert list(sel.day) == list(top.day)
            assert list(sel.resid_x7) == list(top.resid)


class TestLiftPairs:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "j14_lift_pairs")

    def test_pandas_recompute(self, spark):
        out = QUERIES["j14_lift_pairs"](spark, SF_SMALL).toPandas()
        li = (
            pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
                ["l_orderkey", "l_partkey"]
            ]
            .drop_duplicates()
        )
        n_orders = li.l_orderkey.nunique()
        item = li.groupby("l_partkey").size().to_dict()
        pair_counts: dict[tuple[int, int], int] = {}
        for _, grp in li.groupby("l_orderkey"):
            for x, y in itertools.combinations(
                sorted(set(grp.l_partkey)), 2
            ):
                pair_counts[(x, y)] = pair_counts.get((x, y), 0) + 1
        scored = sorted(
            (
                (
                    -((n * n_orders * 1_000_000) // (item[a] * item[b])),
                    a,
                    b,
                    n,
                )
                for (a, b), n in pair_counts.items()
                if n >= 3
            )
        )[:20]
        assert len(out) == len(scored)
        for rank, (neg_lift, a, b, n) in enumerate(scored, start=1):
            row = out[out["rank"] == rank].iloc[0]
            assert (row.pa, row.pb, row.n_pair) == (a, b, n)
            assert int(row.lift_ppm) == -neg_lift


class TestAttribution:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "w22_attribution")

    def test_attribution_contract(self, spark):
        """Every purchase appears once; an attributed click is a real
        click by the same user, strictly before the purchase, within
        24 h, and no later click exists in between."""
        out = QUERIES["w22_attribution"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        purchases = ev[ev.event_type == "purchase"]
        assert len(out) == len(purchases)
        assert set(out.purchase_id) == set(purchases.event_id)
        clicks = ev[ev.event_type == "click"]
        by_user = {u: g.ts.sort_values() for u, g in clicks.groupby("user_id")}
        for _, r in out.iterrows():
            pts = pd.Timestamp(r.purchase_ts)
            user_clicks = by_user.get(r.user_id, pd.Series(dtype="datetime64[ns]"))
            prior = user_clicks[user_clicks < pts]
            if pd.isna(r.click_id):
                assert prior.empty or (
                    (pts - prior.max()).total_seconds() > 86400
                )
            else:
                cts = pd.Timestamp(r.click_ts)
                assert cts == prior.max()
                assert int((pts.floor("s") - cts.floor("s")).total_seconds()) == r.latency_s
                assert (pts.floor("s") - cts.floor("s")).total_seconds() <= 86400


class TestKhopReach:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_khop_reach")

    def test_bfs_recompute(self, spark):
        """Independent BFS in pure python at sf0.001."""
        out = {
            r.node: r.min_hops
            for r in QUERIES["g_khop_reach"](spark, SF_SMALL).collect()
        }
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")[
            ["l_orderkey", "l_partkey"]
        ]
        od = pd.read_parquet(f"{SF_SMALL}/orders.parquet")
        urgent = set(od.loc[od.o_orderpriority == "1-URGENT", "o_orderkey"])
        li = li[li.l_orderkey.isin(urgent)].drop_duplicates()
        adj: dict[int, set[int]] = {}
        for _, grp in li.groupby("l_orderkey"):
            pks = sorted(set(grp.l_partkey))
            for x in pks:
                for y in pks:
                    if x != y:
                        adj.setdefault(x, set()).add(y)
        dist = {pk: 0 for pk in set(li.l_partkey) if pk % 100 == 0}
        frontier = set(dist)
        for hop in (1, 2, 3):
            frontier = {
                v for u in frontier for v in adj.get(u, ())
            }
            for v in frontier:
                dist.setdefault(v, hop)
        assert out == dist


class TestPpmDecodeStats:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "m_ppm_decode_stats")

    def test_decoder_agrees_with_numpy(self, spark):
        """Decode one synthesized PPM by hand and compare the stats
        the query reports for it."""
        import hashlib as _h

        import numpy as np

        docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet").head(5)
        out = QUERIES["m_ppm_decode_stats"](spark, SF_SMALL).toPandas()
        for _, r in docs.iterrows():
            hx = _h.md5(r.text.encode()).hexdigest()[:24]
            arr = (
                np.frombuffer(bytes.fromhex(hx), dtype=np.uint8)
                .reshape(2, 2, 3)
                .astype(np.float64)
            )
            luma = (
                0.299 * arr[:, :, 0]
                + 0.587 * arr[:, :, 1]
                + 0.114 * arr[:, :, 2]
            )
            row = out[out.media_id == r.doc_id].iloc[0]
            assert row.n_bytes == 23 and row.width == 2 and row.height == 2
            assert row.mean_r == np.float32(arr[:, :, 0].mean() / 255.0)
            assert row.std_luma == np.float32(luma.std() / 255.0)
            assert row.px_min == np.float32(arr.min() / 255.0)
            assert row.px_max == np.float32(arr.max() / 255.0)


class TestHllError:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "sk_hll_error")

    def test_error_definition(self, spark):
        out = QUERIES["sk_hll_error"](spark, SF_SMALL).toPandas()
        assert set(out.method) == {"hll_m16", "hll_m256"}
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
        exact = li.l_orderkey.nunique()
        assert (out.exact_n == exact).all()
        for _, r in out.iterrows():
            assert r.err_ppm == round(
                (r.estimate - exact) / exact * 1_000_000
            )


class TestAcf:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a26_acf")

    def test_agrees_with_exact_recompute(self, spark):
        """acf_ppm at every lag equals the exact integer centered
        cross-product ratio truncated toward zero."""
        out = QUERIES["a26_acf"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        ev["station"] = ev.user_id.astype(str)
        ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
        ev["cv"] = (ev.value * 100).round().astype("int64")
        daily = (
            ev.groupby(["station", "day"]).cv.sum().reset_index(name="y")
        )
        for st, grp in daily.groupby("station"):
            y = grp.sort_values("day").y.to_numpy().astype(object)
            n, s = len(y), int(y.sum())
            c = n * y - s
            den = int((c * c).sum())
            for k in (1, 2, 3, 7):
                if n <= k:
                    continue
                num = int((c[:-k] * c[k:]).sum())
                sel = out[(out.station == st) & (out.lag == k)]
                got = int(sel.acf_ppm.iloc[0])
                # exact truncating (toward-zero) division
                q, r = divmod(num * 1_000_000, den)
                trunc = q if r == 0 or num >= 0 else q + 1
                assert got == trunc, (st, k, got, trunc)


class TestRendezvous:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "p_rendezvous_shard")

    def test_counts_and_weight_ordering(self, spark):
        out = QUERIES["p_rendezvous_shard"](spark, SF_SMALL).toPandas()
        docs = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
        assert out.n_docs.sum() == len(docs)
        assert set(out.shard) == {"s0", "s1", "s2", "s3", "s4"}
        # weight-3 shards each receive more than weight-1 shards
        w1 = out[out.weight == 1].n_docs.max()
        w3 = out[out.weight == 3].n_docs.min()
        assert w3 > w1


class TestExactMedian:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a27_exact_median")

    def test_agrees_with_pandas_sort(self, spark):
        out = QUERIES["a27_exact_median"](spark, SF_SMALL).toPandas().iloc[0]
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
        cents = (
            (li.l_extendedprice * 100).round().astype("int64").sort_values()
        )
        n = len(cents)
        v1 = cents.iloc[(n + 1) // 2 - 1]
        v2 = cents.iloc[(n + 2) // 2 - 1]
        assert int(out.n_rows) == n
        assert int(out.v_lo_cents) == v1
        assert int(out.v_hi_cents) == v2
        assert out.median_price == (v1 + v2) / 200.0


class TestDecayTrend:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a28_decay_trend")

    def test_exact_binary_sum(self, spark):
        """The decay score equals the python sum of 2^-age exactly
        (no tolerance): all terms share the 2^-window binary grid."""
        out = QUERIES["a28_decay_trend"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet")
        d = ev.ts.dt.normalize()
        age = (d.max() - d).dt.days
        ev = ev.assign(term=2.0 ** (-age.astype(float)))
        want = ev.groupby("event_type").term.sum()
        for _, r in out.iterrows():
            assert r.decay_score == want[r.event_type]


class TestFkIntegrity:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "o23_fk_integrity")

    def test_clean_schema_has_no_orphans(self, spark):
        out = QUERIES["o23_fk_integrity"](spark, SF_SMALL).toPandas()
        assert len(out) == 7
        li = pd.read_parquet(f"{SF_SMALL}/lineitem.parquet")
        row = out[out.relationship == "lineitem.l_orderkey"].iloc[0]
        assert row.n_child == len(li)
        # the driver's synthetic star schema is referentially clean
        assert (out.n_orphans == 0).all()


class TestReviewRegressions:
    def test_chunk_windows_empty_doc(self, spark, tmp_path):
        """An empty or tiny document yields exactly one chunk on both
        engines (the floor((len-1)/64) = -1 auto-descend hazard)."""
        import duckdb

        df = pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4, 5],
                "text": ["", "a", "x" * 64, "y" * 96, "z" * 97],
                "lang": ["en"] * 5,
                "source": ["s"] * 5,
                "n_chars": [0, 1, 64, 96, 97],
            }
        )
        df.to_parquet(tmp_path / "documents.parquet")
        got = (
            QUERIES["t_chunk_windows"](spark, str(tmp_path))
            .toPandas()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        con = duckdb.connect()
        con.sql(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{tmp_path}/documents.parquet'"
        )
        from historical_obs_platform_spark.registry import ORACLES

        want = (
            con.sql(ORACLES["t_chunk_windows"])
            .df()
            .sort_values(["doc_id", "chunk_idx"])
            .reset_index(drop=True)
        )
        # lens 0,1,64 -> 1 chunk each; 96 -> floor(95/64)=1 -> 2; 97 -> 2
        assert len(got) == len(want) == 1 + 1 + 1 + 2 + 2
        assert list(got.chunk) == list(want.chunk)

    def test_prefix_filter_tolerates_duplicate_rows(self, spark):
        """Duplicate (id, shingle) rows must not push rare shingles
        out of the prefix (the recall-1.0 contract)."""
        from historical_obs_platform_spark.operators import dedup as DD

        rows = [
            (1, "common"), (1, "common"), (1, "common"), (1, "rare1"),
            (2, "common"), (2, "rare1"),
            (3, "common"), (3, "other"),
        ]
        sh = spark.createDataFrame(rows, "doc_id long, shingle string")
        cand = {
            (r.a, r.b)
            for r in DD.prefix_filter_candidates(
                sh, "doc_id", threshold=0.5
            ).collect()
        }
        # docs 1 and 2 share {common, rare1}: Jaccard 2/2 = 1.0 >= 0.5
        assert (1, 2) in cand


class TestHoltSmoothing:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "w23_holt_smoothing")

    def test_fold_matches_hand_computation(self, spark, tmp_path):
        import pandas as pd

        pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "user_id": [7, 7, 7],
                "station": ["s"] * 3,
                "event_type": ["e"] * 3,
                "ts": pd.to_datetime(
                    ["2024-01-01", "2024-01-02", "2024-01-03"]
                ),
                "value": [4.0, 8.0, 2.0],
            }
        ).to_parquet(tmp_path / "events.parquet")
        out = QUERIES["w23_holt_smoothing"](spark, str(tmp_path)).toPandas()
        assert len(out) == 1
        r = out.iloc[0]
        # l1=4 t1=0; l2=(8+4)/2=6 t2=((6-4)+0)/2=1;
        # l3=(2+7)/2=4.5 t3=((4.5-6)+1)/2=-0.25
        assert r.n_obs == 3
        assert r.level == 4.5 and r.trend == -0.25
        assert r.forecast == 4.25


class TestSsspWeighted:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_sssp_weighted")

    def test_triangle_inequality_vs_khop(self, spark):
        """Weighted distances are >= min_hops (weights >= 1) and the
        reachable sets agree (same seeds, same edges, same depth)."""
        k = QUERIES["g_khop_reach"](spark, SF_SMALL).toPandas()
        d = QUERIES["g_sssp_weighted"](spark, SF_SMALL).toPandas()
        assert sorted(k.node) == sorted(d.node)
        m = k.merge(d, on="node")
        assert (m.dist >= m.min_hops).all()
        assert (m.dist <= 5 * m.min_hops).all()  # w <= 5
        assert (m.loc[m.min_hops == 0, "dist"] == 0).all()


class TestWeightedMedian:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a29_weighted_median")

    def test_crossing_definition(self, spark, tmp_path):
        """Lower weighted median: smallest v with 2*cumweight >= W."""
        import pandas as pd

        pd.DataFrame(
            {
                "l_returnflag": ["A"] * 3,
                "l_extendedprice": [1.00, 2.00, 3.00],
                "l_quantity": [1.0, 1.0, 2.0],
                "l_orderkey": [1, 2, 3],
                "l_partkey": [1, 2, 3],
                "l_suppkey": [1, 2, 3],
                "l_linenumber": [1, 1, 1],
                "l_discount": [0.0] * 3,
                "l_tax": [0.0] * 3,
                "l_linestatus": ["O"] * 3,
                "l_shipdate": pd.to_datetime(["2024-01-01"] * 3),
                "l_commitdate": pd.to_datetime(["2024-01-01"] * 3),
                "l_receiptdate": pd.to_datetime(["2024-01-01"] * 3),
                "l_shipinstruct": ["x"] * 3,
                "l_shipmode": ["y"] * 3,
                "l_comment": ["z"] * 3,
            }
        ).to_parquet(tmp_path / "lineitem.parquet")
        out = QUERIES["a29_weighted_median"](
            spark, str(tmp_path)
        ).toPandas()
        # W=4; cum at 1.00 is 1 (2*1 < 4), at 2.00 is 2 (2*2 >= 4)
        assert len(out) == 1
        assert out.iloc[0].total_weight == 4
        assert out.iloc[0].median_cents == 200
