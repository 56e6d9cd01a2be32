"""Doubly-connected edge list for planar subdivisions.

Reference parity: `graphs/doublyConnectedEdgeLists.h:41,121` — half-edge
structure with twin/next/prev links, face traversal.  Host-side topology
structure (no device compute).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass
class HalfEdge:
    origin: int
    twin: int = -1
    next: int = -1
    prev: int = -1
    face: int = -1


@dataclass
class DoublyConnectedEdgeList:
    vertices: list = field(default_factory=list)   # vertex payloads
    half_edges: list = field(default_factory=list)
    faces: list = field(default_factory=list)      # one half-edge per face

    def add_vertex(self, payload=None) -> int:
        self.vertices.append(payload)
        return len(self.vertices) - 1

    def add_edge(self, u: int, v: int) -> tuple[int, int]:
        """Insert the half-edge pair (u->v, v->u); returns their ids."""
        a = len(self.half_edges)
        b = a + 1
        self.half_edges.append(HalfEdge(origin=u, twin=b))
        self.half_edges.append(HalfEdge(origin=v, twin=a))
        return a, b

    def link(self, prev_id: int, next_id: int):
        self.half_edges[prev_id].next = next_id
        self.half_edges[next_id].prev = prev_id

    def add_face(self, boundary: list[int]) -> int:
        """Register a face from an ordered cycle of half-edge ids."""
        fid = len(self.faces)
        self.faces.append(boundary[0])
        for k, he in enumerate(boundary):
            self.half_edges[he].face = fid
            self.link(he, boundary[(k + 1) % len(boundary)])
        return fid

    def face_cycle(self, face_id: int):
        start = self.faces[face_id]
        he = start
        while True:
            yield he
            he = self.half_edges[he].next
            if he == start or he == -1:
                break
