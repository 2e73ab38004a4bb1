"""Connected components — pure-Python reference semantics.

Same result contract as the reference's driver-side BFS
(/root/reference/apollo/graph.py:63-88): given LSH buckets (each a list of
elements), two elements are connected iff they transitively share buckets;
return the partition of elements into components. Implemented here with
union-find (different algorithm, identical partition — CC is unique), used as
the oracle the distributed Spark fixpoint (stages/cc.py) is checked against.
"""

from __future__ import annotations

from collections.abc import Hashable, Iterable


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self) -> None:
        self.parent: dict = {}
        self.rank: dict = {}

    def find(self, x):
        p = self.parent.setdefault(x, x)
        if p == x:
            self.rank.setdefault(x, 0)
            return x
        root = x
        while self.parent[root] != root:
            root = self.parent[root]
        while self.parent[x] != root:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def union(self, a, b) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1


def connected_components(buckets: Iterable[Iterable[Hashable]]
                         ) -> dict[int, set]:
    """Partition elements of ``buckets`` into connected components.

    Matches graph.py:63-88's output contract: mapping component_id -> set of
    elements, every input element appearing in exactly one component
    (element conservation — the invariant the reference's own tests assert,
    tests/test_graph_ConnectedComponents.py:8-58).
    """
    uf = UnionFind()
    seen: list = []
    for bucket in buckets:
        it = iter(bucket)
        try:
            head = next(it)
        except StopIteration:
            continue
        uf.find(head)
        seen.append(head)
        for el in it:
            uf.union(head, el)
            seen.append(el)
    roots: dict = {}
    out: dict[int, set] = {}
    for el in seen:
        r = uf.find(el)
        cid = roots.setdefault(r, len(roots))
        out.setdefault(cid, set()).add(el)
    return out


def dup_pairs(components: dict[int, set]) -> set[tuple]:
    """All unordered within-component pairs — the recall currency
    (BASELINE.md: dup-pair recall >= 0.99)."""
    pairs: set[tuple] = set()
    for members in components.values():
        ms = sorted(members)
        for i, a in enumerate(ms):
            for b in ms[i + 1:]:
                pairs.add((a, b))
    return pairs
