"""Margins / padding semantics.

Reference parity: `utils/margins.h` — `Margins(left, top, right, bottom)` with
the 1-arg (uniform) and 2-arg (leftright, topbottom) constructors, and
`PaddingMargins` whose default-constructed state means "auto" (pad by the
window radius, see `correlation/unfold.h:256-259`).

These are static Python dataclasses: they only shape traced programs, they
never appear on device.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Margins:
    left: int = 0
    top: int = 0
    right: int = 0
    bottom: int = 0

    @classmethod
    def uniform(cls, padding: int) -> "Margins":
        return cls(padding, padding, padding, padding)

    @classmethod
    def symmetric(cls, leftright: int, topbottom: int) -> "Margins":
        return cls(leftright, topbottom, leftright, topbottom)


@dataclass(frozen=True)
class PaddingMargins(Margins):
    """Padding spec; ``auto=True`` (the default-constructed state) means the
    consumer pads by the filter radius so output size == input size."""

    auto: bool = True

    @classmethod
    def explicit(cls, left: int, top: int, right: int, bottom: int) -> "PaddingMargins":
        return cls(left, top, right, bottom, auto=False)

    @classmethod
    def uniform(cls, padding: int) -> "PaddingMargins":
        return cls(padding, padding, padding, padding, auto=False)

    @classmethod
    def none(cls) -> "PaddingMargins":
        return cls(0, 0, 0, 0, auto=False)

    def resolve(self, h_radius: int, v_radius: int) -> Margins:
        """Concrete padding for a (2*h_radius+1, 2*v_radius+1) window,
        following `correlation/unfold.h:256-259`."""
        if self.auto:
            return Margins(h_radius, v_radius, h_radius, v_radius)
        return Margins(self.left, self.top, self.right, self.bottom)
