"""Unit tests for the asmg graph kernel on hand-built toy graphs."""
import numpy as np

from oatk_tpu.graph.asmg import Asmg
from oatk_tpu.graph.clean import drop_tip, pop_bubble, remove_weak_crosslink
from oatk_tpu.graph.traverse import path_exists, subgraph, tarjans_scc
from oatk_tpu.graph.unitig import unitigging


def _mk(n, arcs, lens=None, covs=None):
    g = Asmg()
    for i in range(n):
        g.add_vtx(a=np.array([i << 1], np.uint64),
                  length=(lens[i] if lens else 100),
                  cov=(covs[i] if covs else 10))
    for v, w, *rest in arcs:
        cov = rest[0] if rest else 10
        g.add_arc2(v, w, 0, 0, cov=cov)
    g.finalize(True)
    return g


def test_linear_chain_unitigging():
    # 0+ -> 1+ -> 2+ merges into one unitig
    g = _mk(3, [(0, 2), (2, 4)])
    ng = unitigging(g)
    assert ng.vtx_n1() == 1
    assert len(ng.vtx_a[0]) == 3


def test_circle_unitigging():
    g = _mk(4, [(0, 2), (2, 4), (4, 6), (6, 0)])
    ng = unitigging(g)
    assert ng.vtx_n1() == 1
    assert ng.vtx_circ[0]
    # circular unitig has a self arc
    assert ng.arc_exists1(0, 0)


def test_junction_unitigging():
    # two paths from 0 to 3: 0->1->3 and 0->2->3 (bubble shape)
    g = _mk(4, [(0, 2), (0, 4), (2, 6), (4, 6)])
    ng = unitigging(g)
    assert ng.vtx_n1() == 4  # no merge through junctions


def test_drop_tip():
    # main path 0->1->2 with a short tip 3->1
    g = _mk(4, [(0, 2), (2, 4), (6, 2)], lens=[1000, 1000, 1000, 50],
            covs=[30, 30, 30, 2])
    cnt = drop_tip(g, 0x7FFFFFFF, 100, True, True)
    assert cnt == 1
    assert g.vtx_n1() == 3


def test_pop_bubble():
    # bubble: 0 -> {1 (cov 30), 2 (cov 2)} -> 3
    g = _mk(4, [(0, 2), (0, 4), (2, 6), (4, 6)], lens=[1000, 500, 500, 1000],
            covs=[30, 30, 2, 30])
    n = pop_bubble(g, 10000, 0, False, True, True)
    assert n == 1
    assert g.vtx_n1() == 3  # low-coverage side removed


def test_weak_crosslink():
    # strong chain 0->1 (cov 40) and 2->3 (cov 40), weak cross arc 0->3 (cov 2)
    g = _mk(4, [(0, 2, 40), (4, 6, 40), (0, 6, 2)], covs=[40, 40, 40, 40])
    cnt = remove_weak_crosslink(g, 0.3, 10, True)
    assert cnt == 1


def test_subgraph_and_path_exists():
    # two components: 0-1 and 2-3
    g = _mk(4, [(0, 2), (4, 6)])
    vs = subgraph(g, [0], 0, 0, modify_graph=False)
    assert sorted(vs) == [0, 1]
    ok, _, _ = path_exists(g, 0, 2)
    assert ok
    ok, _, _ = path_exists(g, 0, 4)
    assert not ok


def test_tarjan_scc():
    # directed cycle 0+ -> 1+ -> 0+ forms an SCC of the two fwd vertices
    g = _mk(2, [(0, 2), (2, 0)])
    n_scc, scc = tarjans_scc(g)
    assert scc[0] == scc[2]
    assert scc[1] == scc[3]
    assert scc[0] != scc[1]


def test_symm_fix_and_link_ids():
    g = Asmg()
    for i in range(2):
        g.add_vtx(a=np.array([i << 1], np.uint64), length=10, cov=5)
    g.add_arc(0, 2, 0, 0)  # only one direction; finalize must add comp
    g.finalize(True)
    assert g.arc_exists1(3, 1)
    i = g.arc_idx(0, 2)
    j = g.arc_idx(3, 1)
    assert g.alink[i] == g.alink[j]
    assert bool(g.acomp[i]) != bool(g.acomp[j])


def _random_assembly_graph(rng):
    """Randomized assembly-shaped graph: a circular backbone decorated
    with tips, bubbles and weak crosslinks (the structures the cleaning
    passes target)."""
    g = Asmg()
    nb = int(rng.integers(6, 14))
    back = []
    for i in range(nb):
        back.append(
            g.add_vtx(a=np.array([i << 1], np.uint64),
                      length=int(rng.integers(400, 3000)),
                      cov=int(rng.integers(25, 45)))
        )
    for i in range(nb):
        g.add_arc2(back[i] << 1, back[(i + 1) % nb] << 1, 0, 0,
                   cov=int(rng.integers(20, 40)))
    # tips hanging off backbone nodes
    for _ in range(int(rng.integers(1, 5))):
        host = int(rng.integers(0, nb))
        t = g.add_vtx(a=np.array([(nb + len(g.vtx_len)) << 1], np.uint64),
                      length=int(rng.integers(20, 120)),
                      cov=int(rng.integers(1, 4)))
        if rng.random() < 0.5:
            g.add_arc2(back[host] << 1, t << 1, 0, 0, cov=2)
        else:
            g.add_arc2(t << 1, back[host] << 1, 0, 0, cov=2)
    # bubbles: alternative low-coverage path parallel to a backbone arc
    for _ in range(int(rng.integers(1, 4))):
        i = int(rng.integers(0, nb))
        alt = g.add_vtx(a=np.array([(100 + len(g.vtx_len)) << 1], np.uint64),
                        length=int(rng.integers(100, 600)),
                        cov=int(rng.integers(1, 5)))
        g.add_arc2(back[i] << 1, alt << 1, 0, 0, cov=3)
        g.add_arc2(alt << 1, back[(i + 1) % nb] << 1, 0, 0, cov=3)
    # weak crosslinks between random backbone nodes
    for _ in range(int(rng.integers(1, 4))):
        i, j = rng.integers(0, nb, 2)
        if i == j:
            continue
        g.add_arc2((back[int(i)] << 1) | int(rng.integers(0, 2)),
                   (back[int(j)] << 1) | int(rng.integers(0, 2)),
                   0, 0, cov=int(rng.integers(1, 3)))
    g.finalize(True)
    return g


def _clean_loop(g, rng=None):
    """The pipeline's final cleanup loop with optionally shuffled visit
    orders (the reference's DEBUG_EXEC_ORDER instrumentation,
    /root/reference/graph.c:581-592,864-871)."""
    def order(n):
        if rng is None:
            return None
        return rng.permutation(n)

    cleaned = 1
    while cleaned:
        cleaned = 0
        cleaned += pop_bubble(g, 100000, 0, False, True, False,
                              order=order(2 * g.n_vtx))
        cleaned += remove_weak_crosslink(g, 0.3, 10, False,
                                         order=order(len(g.av)))
        cleaned += drop_tip(g, 0x7FFFFFFF, 10000, True, False,
                            order=order(2 * g.n_vtx))
    g.finalize(True)


def _graph_fingerprint(g):
    vt = tuple(
        (tuple(int(x) for x in g.vtx_a[i]), int(g.vtx_len[i]), int(g.vtx_cov[i]))
        for i in range(g.n_vtx)
    )
    at = tuple(sorted(
        (int(v), int(w), int(ln), int(cov))
        for v, w, ln, cov, d in zip(g.av, g.aw, g.aln, g.acov, g.adel)
        if not d
    ))
    return vt, at


def test_clean_order_invariance():
    """Tip/bubble/crosslink cleaning must produce an identical graph for
    any vertex/arc visit order (reference DEBUG_EXEC_ORDER property,
    /root/reference/graph.c:581-592,864-871): >=20 random seeds, each
    compared against the default-order result."""
    for seed in range(25):
        rng = np.random.default_rng(seed)
        g_ref = _random_assembly_graph(rng)
        g_shuf = _random_assembly_graph(np.random.default_rng(seed))
        _clean_loop(g_ref)
        _clean_loop(g_shuf, rng=np.random.default_rng(1000 + seed))
        assert _graph_fingerprint(g_ref) == _graph_fingerprint(g_shuf), seed


def test_duplicate_pair_key_detection_routes_generic():
    """A canonical pair key and its complement key can BOTH occur (e.g.
    a tandem-duplicated syncmer read from both strands: (a,a) and
    (a^1,a^1)); the sorted-order arc constructor must detect this and
    fall back to the generic finalize path, whose first-occurrence
    overwrite order reproduces the reference's fix_symm semantics.
    Regression for the combined-radix-sort duplicate test (adjacent
    equal keys) replacing the searchsorted probe."""
    import numpy as np

    import oatk_tpu.asm.scg as SCG
    from oatk_tpu.index.syncmer_db import SyncmerDB

    from oatk_tpu.graph.asmg import Asmg

    def make(cv0, cv1, n_scm):
        db = SyncmerDB(
            h=np.arange(n_scm, dtype=np.uint64),
            s=np.zeros(n_scm, np.uint64),
            cov=np.full(n_scm, 5, np.uint32),
            del_=np.zeros(n_scm, bool),
            m_pos=[np.zeros(0, np.uint64)] * n_scm,
        )
        old = SCG._read_adjacent_pairs
        SCG._read_adjacent_pairs = lambda rd: (
            np.asarray(cv0, np.uint64), np.asarray(cv1, np.uint64))
        # record whether the direct-sorted construction ran: it sets
        # _arcs_sorted BEFORE finalize (finalize itself sets it after)
        presorted = []
        old_fin = Asmg.finalize

        def probe_fin(self, *a, **k):
            presorted.append(bool(getattr(self, "_arcs_sorted", False)))
            return old_fin(self, *a, **k)

        Asmg.finalize = probe_fin
        try:
            scg = SCG.make_syncmer_graph(object(), db, 0, 0.0)
        finally:
            SCG._read_adjacent_pairs = old
            Asmg.finalize = old_fin
        return scg.utg, presorted[0]

    # duplicate: key (2,2) and its complement key (3,3) both canonical
    g, presorted = make([2, 3, 4], [2, 3, 6], 8)
    # the essential property: the dup input did NOT take the
    # direct-sorted construction (generic finalize ran), and the
    # finalized graph is symmetric
    assert not presorted
    av = [(int(v), int(w)) for v, w, d in zip(g.av, g.aw, g.adel) if not d]
    assert (2, 2) in av and (3, 3) in av
    for v, w in av:
        assert (w ^ 1, v ^ 1) in av  # complement closure

    # dup-free control: same machinery must produce the sorted-order
    # construction and an identical finalized arc set either way
    g2, presorted2 = make([2, 9], [4, 3], 8)
    assert presorted2
    av2 = sorted((int(v), int(w)) for v, w, d in zip(g2.av, g2.aw, g2.adel) if not d)
    assert av2 == [(2, 4), (2, 8), (5, 3), (9, 3)]
