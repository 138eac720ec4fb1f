"""Round-5 batch-2 additions: chi-square/Cramér's V, Jensen-Shannon
source drift, MMR diverse selection, Markov transitions, fixed-round
connected components. Each gets the driver-style oracle comparison
plus an independent recomputation or algebraic property the oracle
can't state."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from historical_obs_platform_spark.registry import QUERIES, load_all

from .conftest import SF_SMALL, assert_matches_oracle

load_all()


class TestCramersV:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "a30_cramers_v")

    def test_matches_pandas_chi2(self, spark):
        row = QUERIES["a30_cramers_v"](spark, SF_SMALL).toPandas().iloc[0]
        d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")[
            ["lang", "source"]
        ].dropna()
        ct = pd.crosstab(d.lang, d.source)
        n = ct.to_numpy().sum()
        e = np.outer(ct.sum(axis=1), ct.sum(axis=0)) / n
        chi2 = float((((ct.to_numpy() - e) ** 2) / e).sum())
        assert math.isclose(row.chi2, chi2, rel_tol=1e-9, abs_tol=1e-6)
        assert int(row.n) == n
        assert int(row.dof) == (ct.shape[0] - 1) * (ct.shape[1] - 1)
        v = math.sqrt(chi2 / (n * (min(ct.shape) - 1)))
        assert math.isclose(row.cramers_v, v, rel_tol=1e-9, abs_tol=1e-6)
        assert 0.0 <= row.cramers_v <= 1.0


class TestJsDivergence:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "t_js_divergence")

    def test_matches_hashlib_recount(self, spark):
        got = (
            QUERIES["t_js_divergence"](spark, SF_SMALL)
            .toPandas()
            .set_index("source")
        )
        d = pd.read_parquet(f"{SF_SMALL}/documents.parquet")
        d = d[d.text.notna()]
        pc: dict[tuple[str, int], int] = {}
        for src, text in zip(d.source, d.text):
            toks = " ".join(text.strip().lower().split()).split(" ")
            for w in toks:
                b = int(hashlib.md5(w.encode()).hexdigest()[:2], 16)
                pc[(src, b)] = pc.get((src, b), 0) + 1
        qc: dict[int, int] = {}
        np_: dict[str, int] = {}
        for (src, b), c in pc.items():
            qc[b] = qc.get(b, 0) + c
            np_[src] = np_.get(src, 0) + c
        nq = sum(qc.values())
        for src, ntok in np_.items():
            acc = 0.0
            for b in sorted(qc):
                p = pc.get((src, b), 0) / ntok
                q = qc[b] / nq
                if p > 0:
                    acc += 0.5 * p * math.log(p / (0.5 * (p + q)))
                if q > 0:
                    acc += 0.5 * q * math.log(q / (0.5 * (p + q)))
            assert math.isclose(
                got.loc[src, "js"], acc, rel_tol=1e-6, abs_tol=1e-6
            )
            assert int(got.loc[src, "n_tokens"]) == ntok
            # JS divergence is bounded by ln 2
            assert -1e-12 <= got.loc[src, "js"] <= math.log(2) + 1e-12


class TestMmrSelect:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "p_mmr_select")

    def test_greedy_bruteforce(self, spark):
        got = (
            QUERIES["p_mmr_select"](spark, SF_SMALL)
            .toPandas()
            .sort_values("rank")
        )
        emb = pd.read_parquet(f"{SF_SMALL}/embeddings.parquet")
        vecs = {
            int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for r in emb.itertuples()
        }
        qid = min(vecs)
        q = vecs[qid]
        rel = {
            vid: round(float(np.dot(v, q)), 6)
            for vid, v in vecs.items()
            if vid != qid
        }
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:24]
        sel: list[int] = []
        for _ in range(4):
            best = None
            for vid in sorted(set(cand) - set(sel)):
                mx = (
                    max(
                        round(float(np.dot(vecs[vid], vecs[s])), 6)
                        for s in sel
                    )
                    if sel
                    else None
                )
                score = rel[vid] if mx is None else round(rel[vid] - mx, 6)
                if best is None or score > best[1]:
                    best = (vid, score)
            sel.append(best[0])
        assert list(got.vec_id) == sel
        assert list(got["rank"]) == [1, 2, 3, 4]
        assert got.vec_id.nunique() == 4
        # rank 1 is the pure-relevance argmax
        assert int(got.iloc[0].vec_id) == cand[0]


class TestMarkovTransitions:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "e_markov_transitions")

    def test_row_stochastic_and_counts(self, spark):
        got = QUERIES["e_markov_transitions"](spark, SF_SMALL).toPandas()
        ev = pd.read_parquet(f"{SF_SMALL}/events.parquet").sort_values(
            ["user_id", "ts", "event_id"]
        )
        n_pairs = 0
        for _, g in ev.groupby("user_id"):
            n_pairs += max(len(g) - 1, 0)
        assert int(got.n.sum()) == n_pairs
        # each row of the transition matrix sums to ~1 (round-6 p's)
        for _, g in got.groupby("from_type"):
            assert math.isclose(g.p.sum(), 1.0, abs_tol=1e-4)


class TestComponentsFixed:
    def test_matches_oracle(self, spark, oracle_con):
        assert_matches_oracle(spark, oracle_con, "g_components_fixed")

    def test_matches_bfs_bruteforce(self, spark):
        """label(v) must equal the min node id within 4 hops of v."""
        got = (
            QUERIES["g_components_fixed"](spark, SF_SMALL)
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
        assert set(got.index) == set(adj)
        for v in adj:
            ball = {v}
            frontier = {v}
            for _ in range(4):
                frontier = {
                    u for f in frontier for u in adj[f]
                } - ball
                ball |= frontier
            assert got[v] == min(ball), f"node {v}"
