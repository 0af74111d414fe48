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
