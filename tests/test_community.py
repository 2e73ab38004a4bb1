"""Community-detection kernel menu tests (core/community.py).

The reference hands each fat component to igraph's community_<algorithm>
(graph.py:272-297, walktrap default); these tests certify the NumPy
replacements on planted structures: bridged cliques must split, cliques
must stay intact, partitions must be deterministic, and the
modularity-based algorithms must match or beat LPA's modularity (the
quality number behind replacing igraph, round-1 VERDICT G6)."""

import numpy as np
import pytest

from apollo_spark.core import community as cm

MODULARITY_ALGOS = ("multilevel", "fastgreedy", "walktrap",
                    "leading_eigenvector", "edge_betweenness")
# infomap optimizes the map equation, not Q, but must still recover
# planted splits; it joins every structural test, not the Q gate
SPLIT_ALGOS = MODULARITY_ALGOS + ("infomap",)


def planted(sizes, bridges, w_intra=1.0, w_bridge=1.0):
    """Block-clique adjacency with bridge edges; returns (adj, blocks)."""
    n = sum(sizes)
    adj = np.zeros((n, n))
    blocks, start = [], 0
    for s in sizes:
        ix = np.arange(start, start + s)
        adj[np.ix_(ix, ix)] = w_intra
        blocks.append(ix)
        start += s
    np.fill_diagonal(adj, 0.0)
    for a, b in bridges:
        adj[a, b] = adj[b, a] = w_bridge
    return adj, blocks


def groups(labels):
    out = {}
    for i, lab in enumerate(labels):
        out.setdefault(int(lab), set()).add(i)
    return sorted(map(frozenset, out.values()), key=min)


class TestKernels:
    @pytest.mark.parametrize("alg", cm.ALGORITHMS)
    def test_single_clique_stays_whole(self, alg):
        adj, _ = planted([8], [])
        assert len(set(cm.detect(adj, alg).tolist())) == 1

    @pytest.mark.parametrize("alg", cm.ALGORITHMS)
    def test_deterministic(self, alg):
        adj, _ = planted([5, 4, 6], [(4, 5), (8, 9)])
        l1, l2 = cm.detect(adj, alg), cm.detect(adj, alg)
        assert (l1 == l2).all()

    @pytest.mark.parametrize("alg", cm.ALGORITHMS)
    def test_canonical_labels_are_min_member(self, alg):
        adj, _ = planted([4, 4], [])
        lab = cm.detect(adj, alg)
        for g in groups(lab):
            assert all(lab[i] == min(g) for i in g)

    @pytest.mark.parametrize("alg", SPLIT_ALGOS)
    def test_bridged_cliques_split(self, alg):
        """Two 5-cliques + one bridge: the canonical chained-component
        case. LPA is known to flood across an unweighted bridge here;
        every modularity-based algorithm must split it."""
        adj, blocks = planted([5, 5], [(4, 5)])
        lab = cm.detect(adj, alg)
        assert len(set(lab.tolist())) == 2
        for b in blocks:
            assert len(set(lab[b].tolist())) == 1

    @pytest.mark.parametrize("alg", SPLIT_ALGOS)
    def test_ring_of_cliques(self, alg):
        adj, blocks = planted([6, 6, 6, 6],
                              [(5, 6), (11, 12), (17, 18), (23, 0)])
        lab = cm.detect(adj, alg)
        assert len(set(lab.tolist())) == 4
        for b in blocks:
            assert len(set(lab[b].tolist())) == 1

    @pytest.mark.parametrize("alg", cm.ALGORITHMS)
    def test_weighted_chain_split(self, alg):
        """Three weighted cliques chained by weak bridges (the
        shared-bucket weighting refine actually feeds): ALL algorithms,
        including LPA, must recover the three groups."""
        adj, blocks = planted([3, 3, 3], [(2, 3), (5, 6)],
                              w_intra=3.0, w_bridge=0.5)
        lab = cm.detect(adj, alg)
        assert len(set(lab.tolist())) == 3
        for b in blocks:
            assert len(set(lab[b].tolist())) == 1

    @pytest.mark.parametrize("alg", MODULARITY_ALGOS)
    def test_modularity_at_least_lpa(self, alg):
        """The igraph-replacement quality gate: on the chained fixture each
        modularity algorithm's Q must match or beat LPA's."""
        adj, _ = planted([5, 5, 4], [(4, 5), (9, 10)])
        q_lpa = cm.modularity(adj, cm.detect(adj, "label_propagation"))
        q_alg = cm.modularity(adj, cm.detect(adj, alg))
        assert q_alg >= q_lpa - 1e-12

    def test_walktrap_matches_known_partition_weighted(self):
        adj, blocks = planted([4, 4], [(3, 4)], w_intra=2.0, w_bridge=0.25)
        lab = cm.detect(adj, "walktrap")
        assert groups(lab) == [frozenset(blocks[0].tolist()),
                               frozenset(blocks[1].tolist())]

    def test_walktrap_cap_falls_back(self, monkeypatch):
        """Above WALKTRAP_CAP the dispatcher must route to multilevel
        (the documented O(n³) guard), not run the matmul."""
        monkeypatch.setattr(cm, "WALKTRAP_CAP", 8)
        called = {}

        def boom(adj, t=4):  # pragma: no cover - must not run
            called["walktrap"] = True
            raise AssertionError("walktrap ran above its cap")

        monkeypatch.setattr(cm, "walktrap", boom)
        adj, _ = planted([5, 5], [(4, 5)])
        lab = cm.detect(adj, "walktrap")
        assert "walktrap" not in called
        assert len(set(lab.tolist())) == 2

    def test_edge_betweenness_cap_falls_back(self, monkeypatch):
        """Above EDGE_BETWEENNESS_CAP the dispatcher must route to
        multilevel (the O(m·n³) guard), not run Girvan-Newman."""
        monkeypatch.setattr(cm, "EDGE_BETWEENNESS_CAP", 8)

        def boom(adj):  # pragma: no cover - must not run
            raise AssertionError("edge_betweenness ran above its cap")

        monkeypatch.setattr(cm, "edge_betweenness", boom)
        adj, _ = planted([5, 5], [(4, 5)])
        lab = cm.detect(adj, "edge_betweenness")
        assert len(set(lab.tolist())) == 2

    def test_betweenness_scores_peak_on_bridge(self):
        """Hand-checked Brandes: in a barbell (two 4-cliques + one bridge)
        every shortest path between the halves crosses the bridge, so the
        bridge edge's score must strictly dominate every clique edge."""
        adj, _ = planted([4, 4], [(3, 4)])
        eb = cm._all_source_edge_betweenness((adj > 0).astype(float))
        bridge = eb[3, 4]
        intra = max(eb[0, 1], eb[4, 5])
        assert bridge > intra
        # every left source routes its 4 right-half targets across the
        # bridge (4 sources x 4 = 16 into eb[3,4]); mirrored from the
        # right into eb[4,3]; the symmetrized return sums both halves
        assert bridge == pytest.approx(32.0)

    def test_infomap_one_level_merges_clique(self):
        """Map-equation local moves alone (no aggregation) must already
        merge a clique into one module (codebook cost dominates)."""
        adj, _ = planted([6], [])
        lab = cm._map_eq_local_moves(adj)
        assert len(set(lab.tolist())) == 1

    def test_unknown_algorithm_raises(self):
        adj, _ = planted([4], [])
        with pytest.raises(ValueError, match="unknown community"):
            cm.detect(adj, "spinglass_typo")

    def test_empty_and_tiny(self):
        for alg in cm.ALGORITHMS:
            # disconnected pair: one community each (ADVICE r2 — the early
            # return must respect connectivity like the main path does)
            assert cm.detect(np.zeros((2, 2)), alg).tolist() == [0, 1]
            assert cm.detect(np.zeros((0, 0)), alg).tolist() == []

    def test_modularity_value(self):
        """Hand-checked Q: two disconnected 3-cliques, perfect partition.
        Q = sum_c (e_cc - a_c^2) = 2*(0.5 - 0.25) = 0.5."""
        adj, _ = planted([3, 3], [])
        lab = np.array([0, 0, 0, 1, 1, 1])
        assert cm.modularity(adj, lab) == pytest.approx(0.5)


class TestRefineAlgorithms:
    """The Spark seam: refine_components(algorithm=...) dispatches each fat
    component to the selected kernel."""

    @pytest.mark.parametrize("alg", ["multilevel", "walktrap"])
    def test_bridged_cliques_split_via_spark(self, spark, cfg, alg):
        from apollo_spark.stages import cc as cc_st
        from apollo_spark.stages import refine
        rows = []
        for g, members in (("a", ["a1", "a2", "a3", "a4"]),
                           ("b", ["b1", "b2", "b3", "b4"])):
            for k in range(3):
                rows += [(m, 0, f"{g}{k}") for m in members]
        rows += [("a4", 0, "bridge"), ("b1", 0, "bridge")]
        memb = spark.createDataFrame(
            [(d, ht, bytes(b, "utf-8")) for d, ht, b in rows],
            "image_id string, hashtable int, band binary")
        cc = cc_st.connected_components(memb, cfg)
        assert cc.select("cc_id").distinct().count() == 1
        refined = refine.refine_components(cc, memb, cfg, algorithm=alg)
        by = {r["image_id"]: r["cluster_id"] for r in refined.collect()}
        assert len(set(by.values())) == 2
        assert by["a1"] == by["a4"] and by["b1"] == by["b4"]
        assert by["a1"] != by["b1"]

    def test_config_algorithm_flows_through(self, spark, cfg):
        from apollo_spark.stages import cc as cc_st
        from apollo_spark.stages import refine
        rows = [(m, 0, f"c{k}") for k in range(2) for m in ["x", "y", "z"]]
        memb = spark.createDataFrame(
            [(d, ht, bytes(b, "utf-8")) for d, ht, b in rows],
            "image_id string, hashtable int, band binary")
        cc = cc_st.connected_components(memb, cfg)
        out = refine.refine_components(
            cc, memb, cfg.with_(community_algorithm="fastgreedy"))
        assert out.count() == 3

    def test_bad_algorithm_raises(self, spark, cfg):
        from apollo_spark.stages import refine
        empty = spark.createDataFrame([], "image_id string, cc_id string")
        with pytest.raises(ValueError, match="unknown community"):
            refine.refine_components(empty, empty, cfg, algorithm="nope")


class TestFallbackSurfacing:
    """VERDICT r2 #5 + ADVICE r2: cap fallbacks are visible, degenerate
    inputs respect connectivity."""

    def test_effective_algorithm_caps(self):
        assert cm.effective_algorithm("walktrap", cm.WALKTRAP_CAP) == "walktrap"
        assert cm.effective_algorithm(
            "walktrap", cm.WALKTRAP_CAP + 1) == "multilevel"
        assert cm.effective_algorithm(
            "edge_betweenness", cm.EDGE_BETWEENNESS_CAP + 1) == "multilevel"
        assert cm.effective_algorithm("label_propagation", 10 ** 6) \
            == "label_propagation"
        with pytest.raises(ValueError, match="unknown community"):
            cm.effective_algorithm("nope", 3)

    def test_early_return_respects_components(self):
        """ADVICE r2: a disconnected 2-node / all-zero adjacency must not
        merge into a single community via the n<=2 early return."""
        two_disconnected = np.zeros((2, 2))
        assert cm.detect(two_disconnected, "multilevel").tolist() == [0, 1]
        three_zero = np.zeros((3, 3))
        assert cm.detect(three_zero, "walktrap").tolist() == [0, 1, 2]
        two_connected = np.array([[0.0, 1.0], [1.0, 0.0]])
        assert cm.detect(two_connected, "multilevel").tolist() == [0, 0]

    def test_refine_kernel_marks_fallback_algorithm(self):
        """An over-WALKTRAP_CAP component requested as walktrap reports
        algorithm='multilevel' in its rows — the run no longer quietly
        isn't walktrap (VERDICT r2 #5)."""
        import pandas as pd
        from apollo_spark.stages.refine import _refine_kernel
        n = cm.WALKTRAP_CAP + 1
        rows = []
        # overlapping 256-member buckets chain the component together
        step, width = 255, 256
        for b, start in enumerate(range(0, n - 1, step)):
            for i in range(start, min(start + width, n)):
                rows.append((f"d{i:05d}", "cc0", 0, f"bk{b}".encode()))
        pdf = pd.DataFrame(rows,
                           columns=["image_id", "cc_id", "hashtable", "band"])
        out = _refine_kernel(pdf, "walktrap", rounds=5)
        assert len(out) == n
        assert set(out["algorithm"]) == {"multilevel"}
        # a small component requested as walktrap really runs walktrap
        small = pdf[pdf["image_id"] < "d00030"]
        out_small = _refine_kernel(small, "walktrap", rounds=5)
        assert set(out_small["algorithm"]) == {"walktrap"}

    def test_refine_passthrough_markers(self, spark, cfg):
        from apollo_spark.stages import refine
        cc = spark.createDataFrame(
            [("p1", "c"), ("p2", "c")], "image_id string, cc_id string")
        memb = spark.createDataFrame(
            [("p1", 0, b"x"), ("p2", 0, b"x")],
            "image_id string, hashtable int, band binary")
        out = refine.refine_components(cc, memb, cfg)
        assert {r["algorithm"] for r in out.collect()} == {"passthrough"}


class TestRefinedTwinParity:
    def test_flagship_refined_twin_matches_spark(self, spark):
        """oracle.flagship_refined_local — the host twin feeding the
        refined_clusters DuckDB oracle's fat-row literals — emits the SAME
        (image_id -> rep, effective-algorithm) mapping as the distributed
        refine stage on the driver's sf0.001 corpus, for both the config
        default and the reference-default walktrap. This is the documented
        circularity boundary: the SQL replays triage/CC/id-derivation, this
        test pins the one injected piece against the real Spark stage."""
        import __spark_entry__ as e
        from apollo_spark import oracle

        sf = "/root/testdata/sf0.001"
        for alg in (None, "walktrap"):
            rows = e._refined_clusters_query(spark, sf, algorithm=alg) \
                .collect()
            fat = {r["image_id"]: (r["cluster_id"].split("#", 1)[1],
                                   r["algorithm"])
                   for r in rows if "#" in r["cluster_id"]}
            assert fat, "sf0.001 flagship corpus must have fat components"
            host = oracle.flagship_refined_local(
                f"{sf}/documents.parquet", e._FLAGSHIP_CFG,
                alg or e._FLAGSHIP_CFG.community_algorithm)
            host_map = {r.image_id: (r.rep, r.algorithm)
                        for r in host.itertuples()}
            assert fat == host_map
