from .graphs import Graph, EdgeDirectedType
from .flow import max_flow_min_cut, reachable_vertices_in_cut
from .dcel import DoublyConnectedEdgeList

__all__ = ["Graph", "EdgeDirectedType", "max_flow_min_cut",
           "reachable_vertices_in_cut", "DoublyConnectedEdgeList"]
