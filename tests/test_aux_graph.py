"""Tests for the auxiliary graph components: A-statistic genome-size
estimation (OverlapGraph.cpp:995-1041) and the mate-pair linkage graph
(MatePairGraph.{h,cpp} design intent)."""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GOLDEN = os.path.join(REPO, "golden")


def _build_graph(pe=(), se=(), min_overlap=40):
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph
    from metagenomics_tpu.index import OverlapIndex

    def quiet(*a, **k):
        pass

    ds = Dataset(list(pe), list(se), min_overlap, log=quiet)
    cfg = AssemblerConfig(min_overlap=min_overlap,
                          paired_end_files=list(pe),
                          single_end_files=list(se))
    graph = OverlapGraph(ds, cfg, log=quiet)
    if not graph.build_full_native():
        graph.build_from_index(OverlapIndex(ds, min_overlap))
    return ds, graph


@pytest.fixture(scope="module")
def pe_graph():
    path = os.path.join(GOLDEN, "data", "pe_small.fasta")
    ds, graph = _build_graph(pe=[path])
    return ds, graph


def test_estimate_genome_size_converges(pe_graph):
    ds, graph = pe_graph
    assert graph.estimate_genome_size() is True
    # the pe_small genome is a few kb; the unitig graph's long edges should
    # put the A-statistic estimate within an order of magnitude
    assert graph.estimated_genome_size > 0


def test_estimate_genome_size_empty_graph():
    """No edges -> estimator terminates with size 0 instead of dividing by
    zero (the reference would hit float-inf UB here)."""
    from metagenomics_tpu.config import AssemblerConfig
    from metagenomics_tpu.dataset import Dataset
    from metagenomics_tpu.graph import OverlapGraph

    path = os.path.join(GOLDEN, "data", "se_small.fasta")
    ds = Dataset([], [path], 40, log=lambda *a, **k: None)
    graph = OverlapGraph(ds, AssemblerConfig(min_overlap=40),
                         log=lambda *a, **k: None)
    assert graph.estimate_genome_size() is True
    assert graph.estimated_genome_size == 0


def test_matepair_graph_build_and_ids(pe_graph):
    from metagenomics_tpu.graph import MatePairGraph

    ds, graph = pe_graph
    graph.calculate_mean_and_sd_of_insert_size()
    mpg = MatePairGraph(graph).build()
    # every edge got a signed ID; twins get opposite signs
    n_edges = sum(len(lst) for lst in graph.adj)
    assert len(mpg.edge_ids) == n_edges
    for e, eid in mpg.edge_ids.items():
        assert mpg.edge_ids[e.reverse] == -eid
        assert eid != 0
    # link lists indexed by positive ID; sources normalized to positive edges
    for links in mpg.link_list[1:]:
        for link in links:
            assert mpg.edge_ids[link.source] > 0
            assert mpg.edge_ids[link.destination] > 0
            assert link.support == len(link.gap_distance)
            assert 0 <= link.orientation <= 3


def test_matepair_graph_transitive_algebra():
    """The transitive-marking bit algebra (MatePairGraph.cpp:208): links
    e->e1 (Fwd*), e->e2 (*Fwd) compose to e1->e2 FwdFwd etc."""
    from metagenomics_tpu.graph.matepair_graph import (
        MatePairGraph, MatePairLink, FWD_FWD, FWD_REV, REV_FWD, REV_REV)

    for o1 in range(4):
        for o2 in range(4):
            compose_ok = (o1 & 1) == ((o2 & 2) >> 1)
            o3 = (o1 & 2) | (o2 & 1)
            # composition is only defined when the shared edge is traversed
            # consistently; the composed orientation keeps e1's source
            # direction and e2's destination direction
            if compose_ok:
                assert o3 in (FWD_FWD, FWD_REV, REV_FWD, REV_REV)
                assert (o3 & 2) == (o1 & 2)
                assert (o3 & 1) == (o2 & 1)


def test_matepair_graph_marking_feeds_flow(pe_graph):
    """Marked edges force a flow lower bound of 1 through
    calculate_bound_and_cost."""
    from metagenomics_tpu.graph import MatePairGraph

    ds, graph = pe_graph
    graph.calculate_mean_and_sd_of_insert_size()
    mpg = MatePairGraph(graph).build()
    mpg.mark_edges_by_mate_pairs()
    graph.mp_marked_edges = mpg.marked_edges
    for links in mpg.link_list[1:]:
        for link in links:
            if link.destination in mpg.marked_edges:
                lb, ub, cost = graph.calculate_bound_and_cost(link.destination)
                assert lb[0] == 1
    # unmarked simple edges keep the default bounds
    graph.mp_marked_edges = set()
    for i in range(1, len(graph.adj)):
        for e in graph.adj[i]:
            if not e.list_reads:
                lb, ub, cost = graph.calculate_bound_and_cost(e)
                assert lb == [0, 0, 0] and cost == [500000] * 3
