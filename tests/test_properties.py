"""Property-based tests (hypothesis) over the pure kernels.

The example-based suites pin specific fixtures; these generate adversarial
ones — ragged bags, degenerate weights, random graphs, pathological
dimensions — and assert the INVARIANTS each kernel advertises. All
JVM-free (NumPy only), so they run in milliseconds and shake the kernels
far harder than the handful of seeds the example tests use.
"""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from apollo_spark.core import community as cm
from apollo_spark.core import lsh, wmh
from apollo_spark.ops import multimodal as mm

settings.register_profile("kernels", max_examples=40, deadline=None)
settings.load_profile("kernels")


# ---------------------------------------------------------------------------
# WMH: the batch kernel must equal the dense golden oracle on ANY bag set
# ---------------------------------------------------------------------------

@st.composite
def bag_sets(draw):
    ndocs = draw(st.integers(1, 8))
    docs = []
    for d in range(ndocs):
        n = draw(st.integers(1, 12))
        hashes = draw(st.lists(st.integers(1, 2 ** 63 - 1), min_size=n,
                               max_size=n, unique=True))
        hashes = np.sort(np.array(hashes, dtype=np.uint64))
        weights = np.array(
            draw(st.lists(st.floats(0.0078125, 50.0, allow_nan=False,
                                    width=32),
                          min_size=len(hashes), max_size=len(hashes))),
            dtype=np.float32)
        docs.append((hashes, weights))
    return docs


class TestWMHProperties:
    @given(bag_sets(), st.integers(0, 2 ** 31), st.integers(1, 9))
    def test_batch_equals_dense_oracle(self, docs, seed, chunk):
        K = 8
        indptr = np.cumsum([0] + [len(h) for h, _ in docs]).astype(np.int64)
        fh = np.concatenate([h for h, _ in docs])
        w = np.concatenate([w for _, w in docs])
        got = wmh.wmh_batch(indptr, fh, w, K, seed=seed, chunk=chunk)
        for d, (hashes, weights) in enumerate(docs):
            rs, ln_cs, betas = wmh.gen_params_for(hashes, K, seed)
            exp = wmh.weighted_minhash(weights.copy(), K, rs, ln_cs, betas)
            exp_k = (hashes[exp[:, 0]] & np.uint64(0xFFFFFFFF)) \
                .astype(np.uint32)
            assert np.array_equal(got[d, :, 0], exp_k)
            assert np.array_equal(got[d, :, 1], exp[:, 1])

    @given(bag_sets())
    def test_scale_invariance(self, docs):
        """CWS property: scaling ALL weights of a doc by a constant leaves
        the argmin feature unchanged in distribution... but bit-exactness
        only holds for the same weights; here we assert determinism and
        shape instead, plus chunk-size independence."""
        K = 8
        indptr = np.cumsum([0] + [len(h) for h, _ in docs]).astype(np.int64)
        fh = np.concatenate([h for h, _ in docs])
        w = np.concatenate([w for _, w in docs])
        a = wmh.wmh_batch(indptr, fh, w, K, seed=7, chunk=3)
        b = wmh.wmh_batch(indptr, fh, w, K, seed=7, chunk=8)
        assert np.array_equal(a, b)
        assert a.shape == (len(docs), K, 2)


# ---------------------------------------------------------------------------
# Community kernels: structural invariants on random graphs
# ---------------------------------------------------------------------------

@st.composite
def random_adjacency(draw, max_n=12):
    n = draw(st.integers(2, max_n))
    edges = draw(st.lists(
        st.tuples(st.integers(0, n - 1), st.integers(0, n - 1),
                  st.floats(0.1, 5.0, allow_nan=False)),
        max_size=3 * n))
    adj = np.zeros((n, n))
    for i, j, w in edges:
        if i != j:
            adj[i, j] = adj[j, i] = w
    return adj


class TestCommunityProperties:
    @given(random_adjacency())
    def test_all_algorithms_valid_and_canonical(self, adj):
        n = adj.shape[0]
        for alg in cm.ALGORITHMS:
            lab = cm.detect(adj, alg)
            assert lab.shape == (n,)
            # canonical: every community labeled by its smallest member
            for c in np.unique(lab):
                members = np.flatnonzero(lab == c)
                assert c == members.min()

    @given(random_adjacency(max_n=10))
    def test_no_algorithm_merges_disconnected_components(self, adj):
        """Zero-weight cuts are hard boundaries: no kernel may assign two
        nodes from different connected components one community (CC is the
        upstream stage; refine must only ever SPLIT). Scoped to detect()'s
        contract domain — n > 2 with at least one edge (below that the
        dispatcher's degenerate shortcut returns one community by design,
        and refine only ever feeds it connected components anyway)."""
        n = adj.shape[0]
        if n <= 2 or adj.max() <= 0:
            return
        # true components by BFS on the support
        comp = np.full(n, -1)
        nxt = 0
        for s in range(n):
            if comp[s] >= 0:
                continue
            seen = np.zeros(n, dtype=bool)
            seen[s] = True
            front = seen.copy()
            while front.any():
                front = (adj[front] > 0).any(axis=0) & ~seen
                seen |= front
            comp[seen] = nxt
            nxt += 1
        for alg in cm.ALGORITHMS:
            lab = cm.detect(adj, alg)
            for c in np.unique(lab):
                members = np.flatnonzero(lab == c)
                assert len(set(comp[members].tolist())) == 1, \
                    f"{alg} merged disconnected components"

    @given(random_adjacency(max_n=10))
    def test_modularity_bounds(self, adj):
        for alg in ("multilevel", "fastgreedy"):
            q = cm.modularity(adj, cm.detect(adj, alg))
            assert -1.0 <= q <= 1.0


# ---------------------------------------------------------------------------
# LSH parameter search, resize math, frame sampling
# ---------------------------------------------------------------------------

class TestParamProperties:
    @given(st.floats(0.05, 0.95), st.integers(2, 64))
    def test_lsh_params_within_budget(self, threshold, size):
        b, r = lsh.calc_hashtable_params(threshold, size)
        assert 1 <= b and 1 <= r and b * r <= size

    @given(st.integers(1, 10_000), st.integers(1, 10_000),
           st.integers(1, 512))
    def test_target_dims_invariants(self, w, h, max_side):
        ow, oh = mm.target_dims(w, h, max_side)
        assert 1 <= ow <= w and 1 <= oh <= h          # never upscale
        if max(w, h) > max_side:
            assert max(ow, oh) <= max_side            # fits when shrunk
            # aspect preserved to integer truncation: ow/oh within one
            # rounding step of w/h
            assert abs(ow * h - oh * w) <= max(w, h)
        else:
            assert (ow, oh) == (w, h)                 # identity under fit

    @given(st.integers(1, 100_000), st.integers(1, 64))
    def test_frame_indices_invariants(self, n_frames, k):
        idx = mm.sample_frame_indices(n_frames, k)
        assert len(idx) == min(k, n_frames)
        assert idx[0] == 0
        assert all(0 <= i < n_frames for i in idx)
        assert all(b > a for a, b in zip(idx, idx[1:]))  # strictly increasing
