"""Flow phase: bidirected graph -> node-split min-cost-flow instance -> flows.

Reproduces OverlapGraph::calculateFlow (OverlapGraph.cpp:1402-1575)
byte-for-byte on the DIMACS artifact: each graph node splits into CS2 nodes
(2i, 2i+1), each bidirected edge becomes three parallel arc pairs whose
bounds/costs come from calculateBoundAndCost (:1614-1638), a super
source/sink pair ties every node in, and a single expensive return arc
forces minimal circulation.  The solve itself runs in-process
(mincostflow.solve_min_cost_flow) instead of through CS2's file round-trip;
the flow.output artifact is still written, byte-identical to CS2's
print_solution (cs2.h:1861-1882): forward arcs in the parser's
grouped-by-tail slot order (see _cs2_print_order).
"""

from ..mincostflow import solve_min_cost_flow


def _cs2_print_order(arcs, n_nodes):
    """Original-arc print order of CS2's solution file.

    CS2's DIMACS parser stores each input arc as a (forward, sister) slot
    pair and then groups slots by tail node with an in-place counting sort
    whose within-bucket order comes from its cycle-chasing swaps
    (parser_cs2.h:347-425).  print_solution (cs2.h:1861-1882) walks nodes in
    id order emitting every slot whose stored capacity is positive — i.e.
    exactly the forward arcs, in the permuted slot order.  This simulates
    that permutation on the tails alone (the swaps move whole arc records,
    so tracking the original slot id is enough) and returns the original
    arc indices in print order.
    """
    m2 = 2 * len(arcs)
    tails = [0] * m2
    orig = list(range(m2))
    counts = [0] * (n_nodes + 2)
    for k, (tail, head, _, _, _) in enumerate(arcs):
        tails[2 * k] = tail
        tails[2 * k + 1] = head          # sister slot: head acts as tail
        counts[tail + 1] += 1
        counts[head + 1] += 1
    node_min = min(tails)
    node_max = max(tails)
    # arc_first[i] = next free slot of node i's bucket; node_first[i] = the
    # immutable bucket start (the parser's node->first pointers)
    arc_first = counts[:]
    for i in range(node_min + 1, node_max + 2):
        arc_first[i] += arc_first[i - 1]
    node_first = arc_first[:]
    for i in range(node_min, node_max):
        last = node_first[i + 1]
        for pos in range(arc_first[i], last):
            tail = tails[pos]
            while tail != i:
                new = arc_first[tail]
                tails[pos], tails[new] = tails[new], tails[pos]
                orig[pos], orig[new] = orig[new], orig[pos]
                arc_first[tail] += 1
                tail = tails[pos]
    return [s // 2 for s in orig if s % 2 == 0]


class FlowMixin:
    def calculate_bound_and_cost(self, edge):
        """(OverlapGraph.cpp:1614-1638)."""
        lb = [0, 0, 0]
        ub = [10, 10, 10]
        cost = [500000, 500000, 500000]
        if edge.list_reads:
            # mp_marked_edges: unambiguous mate-pair-linked neighbors of
            # high-coverage edges, forced to carry flow (the stated purpose
            # of MatePairGraph::markEdgesByMatePairs, MatePairGraph.cpp:
            # 266-274); empty unless the mate-pair-graph refinement ran.
            if len(edge.list_reads) > 20 or edge in self.mp_marked_edges:
                lb = [1, 0, 0]
            ub = [1, 1, 8]
            cost = [1, 50000, 100000]
        return lb, ub, cost

    def calculate_flow(self, input_path, output_path):
        v = self.number_of_nodes * 2 + 2
        e = self.number_of_edges * 3 + self.number_of_nodes * 4 + 1
        supersource, supersink = 1, v
        lines = []
        arcs = []

        def arc(tail, head, lb, ub, cost):
            lines.append("a %10d %10d %10d %10d %10d\n"
                         % (tail, head, lb, ub, cost))
            arcs.append((tail, head, lb, ub, cost))

        lines.append("p min %10d %10d\n" % (v, e))
        lines.append("n %10d%10s\n" % (supersource, " 0"))
        lines.append("n %10d%10s\n" % (supersink, " 0"))
        arc(supersink, supersource, 1, 1000000, 1000000)

        n_adj = len(self.adj)
        node_map = [0] * (n_adj + 1)
        node_map_rev = [0] * (n_adj + 1)
        current = 1
        for i in range(1, n_adj):
            if self.adj[i]:
                node_map[i] = current
                node_map_rev[current] = i
                arc(supersource, 2 * current, 0, 1000000, 0)
                arc(supersource, 2 * current + 1, 0, 1000000, 0)
                arc(2 * current, supersink, 0, 1000000, 0)
                arc(2 * current + 1, supersink, 0, 1000000, 0)
                current += 1

        for i in range(1, n_adj):
            for edge in self.adj[i]:
                u = node_map[edge.source]
                w = node_map[edge.destination]
                lb, ub, cost = self.calculate_bound_and_cost(edge)
                if u < w or (u == w and edge.serial < edge.reverse.serial):
                    u1, u2, v1, v2 = 2 * u, 2 * u + 1, 2 * w, 2 * w + 1
                    if edge.orient == 0:
                        pairs = ((v1, u1), (u2, v2))
                    elif edge.orient == 1:
                        pairs = ((v2, u1), (u2, v1))
                    elif edge.orient == 2:
                        pairs = ((u1, v2), (v1, u2))
                    else:
                        pairs = ((u1, v1), (v2, u2))
                    for k in range(3):
                        arc(pairs[0][0], pairs[0][1], lb[k], ub[k], cost[k])
                        arc(pairs[1][0], pairs[1][1], lb[k], ub[k], cost[k])

        with open(input_path, "w") as f:
            f.write("".join(lines))

        self.log("Calling min-cost-flow solver")
        try:
            flows = solve_min_cost_flow(v, arcs)
        except ValueError:
            # infeasible circulation (e.g. an empty graph leaves the lb=1
            # return arc with no residual path).  CS2 prints "Error 2" to
            # stderr and exits with that code (cs2.h:346); match it instead
            # of tracebacking.
            import sys
            sys.stderr.write("\nError 2\n")
            raise SystemExit(2)
        self.log("Min-cost-flow solver finished")

        with open(output_path, "w") as f:
            for k in _cs2_print_order(arcs, v):
                tail, head = arcs[k][0], arcs[k][1]
                f.write("%d %d %d\n" % (tail, head, flows[k]))

        for (tail, head, _, _, _), fl in zip(arcs, flows):
            if (tail != supersink and tail != supersource
                    and head != supersource and head != supersink and fl != 0):
                my_source = node_map_rev[tail // 2]
                my_dest = node_map_rev[head // 2]
                self.find_edge(my_source, my_dest).flow += fl
        self.flow_computed = True
