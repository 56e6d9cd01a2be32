"""Search-range descriptors for cost-volume construction.

Reference parity: `searchOffset<nDim>` (`correlation/correlation_base.h:289`)
— a per-dimension [lower, upper] disparity range with idx <-> disp conversion
(``disp = idx + lower``), and the plain ``disp_t disp_width`` search (d in
[0, width)).  Static Python dataclasses; they shape traced programs only.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class SearchOffset1:
    """1-D search range [lower, upper] (both inclusive)."""

    lower: int
    upper: int

    @property
    def count(self) -> int:
        return self.upper - self.lower + 1

    def idx2disp(self, idx: int) -> int:
        return idx + self.lower

    def disp2idx(self, disp: int) -> int:
        return disp - self.lower

    @property
    def is_valid(self) -> bool:
        return self.upper >= self.lower


@dataclass(frozen=True)
class SearchOffset2:
    """2-D search window [lower0, upper0] x [lower1, upper1] (inclusive),
    dim 0 = vertical (di), dim 1 = horizontal (dj)."""

    lower0: int
    upper0: int
    lower1: int
    upper1: int

    @property
    def count0(self) -> int:
        return self.upper0 - self.lower0 + 1

    @property
    def count1(self) -> int:
        return self.upper1 - self.lower1 + 1

    def idx2disp(self, dim: int, idx: int) -> int:
        return idx + (self.lower0 if dim == 0 else self.lower1)

    def disp2idx(self, dim: int, disp: int) -> int:
        return disp - (self.lower0 if dim == 0 else self.lower1)

    @property
    def is_valid(self) -> bool:
        return self.upper0 >= self.lower0 and self.upper1 >= self.lower1
