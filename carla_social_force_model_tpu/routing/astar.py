"""A* path search over NavGraph: native C++ core with a pure-Python fallback.

The native library (native/astar.cpp) is compiled on first use with g++ and
loaded through ctypes (utils/nativelib.py); environments without a toolchain
fall back to the heapq implementation (identical results, covered by tests).
"""
from __future__ import annotations

import ctypes
import heapq
import logging

import numpy as np

from .graph import GraphType, NavGraph
from ..utils import nativelib

log = logging.getLogger(__name__)

_CONFIGURED = False


def _load_native():
    global _CONFIGURED
    lib = nativelib.load("astar")
    if lib is None or _CONFIGURED:
        return lib
    _CONFIGURED = True
    lib.astar_graph_create.restype = ctypes.c_void_p
    lib.astar_graph_create.argtypes = [
        ctypes.c_int64, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32)]
    lib.astar_graph_destroy.argtypes = [ctypes.c_void_p]
    lib.astar_route.restype = ctypes.c_int64
    lib.astar_route.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64]
    lib.astar_nearest_nodes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_int32)]
    return lib


def _ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


class AStarRouter:
    """Routing engine over one NavGraph (native when available)."""

    def __init__(self, graph: NavGraph, use_native: bool = True):
        self.graph = graph
        self._handle = None
        self._lib = _load_native() if use_native else None
        offsets, nbr, nbr_len, nbr_type = graph.csr()
        self._csr = (offsets, nbr, nbr_len, nbr_type)
        if self._lib is not None:
            nodes = np.ascontiguousarray(graph.nodes, np.float64)
            self._nodes_buf = nodes  # keep alive
            self._handle = self._lib.astar_graph_create(
                graph.num_nodes, _ptr(nodes, ctypes.c_double),
                nbr.shape[0], _ptr(offsets, ctypes.c_int64),
                _ptr(nbr, ctypes.c_int32), _ptr(nbr_len, ctypes.c_double),
                _ptr(nbr_type, ctypes.c_int32))
        self._subgraph_nodes = {}

    def __del__(self):
        if self._handle and self._lib is not None:
            try:
                self._lib.astar_graph_destroy(self._handle)
            except Exception:
                pass

    @property
    def native(self) -> bool:
        return self._handle is not None

    def nearest_node(self, location, graph_type: GraphType) -> int:
        """Closest node (euclidean) among nodes reachable in the subgraph."""
        if graph_type not in self._subgraph_nodes:
            self._subgraph_nodes[graph_type] = \
                self.graph.nodes_in_subgraph(graph_type)
        mask = self._subgraph_nodes[graph_type]
        loc = np.asarray(location, np.float64).reshape(-1)
        if loc.shape[0] == 2:
            loc = np.r_[loc, 0.0]
        if self.native:
            q = np.ascontiguousarray(loc.reshape(1, 3))
            m = np.ascontiguousarray(mask.astype(np.uint8))
            out = np.zeros(1, np.int32)
            self._lib.astar_nearest_nodes(
                self._handle, _ptr(q, ctypes.c_double), 1,
                _ptr(m, ctypes.c_uint8), _ptr(out, ctypes.c_int32))
            return int(out[0])
        d = np.linalg.norm(self.graph.nodes - loc, axis=1)
        d[~mask] = np.inf
        return int(np.argmin(d))

    def shortest_path(self, start: int, goal: int,
                      graph_type: GraphType) -> list[int]:
        """A* node path start..goal; empty list when unreachable."""
        mask = self.graph.allowed_mask(graph_type)
        if self.native:
            cap = self.graph.num_nodes + 1
            out = np.zeros(cap, np.int32)
            n = self._lib.astar_route(self._handle, start, goal, mask,
                                      _ptr(out, ctypes.c_int32), cap)
            if n < 0:
                raise RuntimeError("native astar_route failed")
            return out[:n].tolist()
        return self._python_astar(start, goal, mask)

    def _python_astar(self, start: int, goal: int, allowed_mask: int) -> list[int]:
        offsets, nbr, nbr_len, nbr_type = self._csr
        nodes = self.graph.nodes

        def h(n):
            return float(np.linalg.norm(nodes[n] - nodes[goal]))

        dist = {start: 0.0}
        prev = {}
        open_heap = [(h(start), start)]
        closed = set()
        while open_heap:
            f, u = heapq.heappop(open_heap)
            if u == goal:
                break
            if u in closed:
                continue
            closed.add(u)
            for i in range(offsets[u], offsets[u + 1]):
                if not ((allowed_mask >> (int(nbr_type[i]) + 1)) & 1):
                    continue
                v = int(nbr[i])
                nd = dist[u] + float(nbr_len[i])
                if nd < dist.get(v, np.inf):
                    dist[v] = nd
                    prev[v] = u
                    heapq.heappush(open_heap, (nd + h(v), v))
        if goal not in dist:
            return []
        path = [goal]
        while path[-1] != start:
            path.append(prev[path[-1]])
        return path[::-1]
