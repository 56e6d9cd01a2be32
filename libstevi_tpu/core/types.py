"""Core enums and dtype policy for the cost-volume engine.

Reference parity: `correlation/correlation_base.h:31-47` (strategy/direction
enums, `disp_t = int32`) and `correlation/matching_costs.h:38-702` (the 13
matching functions and their compile-time traits).  The reference encodes the
traits as C++ template specializations selected at compile time; here they are
a static Python table — every trait lookup happens at trace time, so each
(matching function, shape) pair still jit-specializes to a fused XLA program
with zero runtime dispatch, which is the TPU-idiomatic equivalent of template
instantiation.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import jax.numpy as jnp

# disp_t in the reference is a signed 32-bit integer
# (`correlation/correlation_base.h:47`).
disp_dtype = jnp.int32


class ExtractionStrategy(enum.Enum):
    """Whether the optimum of a cost volume is an argmin (Cost) or argmax
    (Score).  Reference: `dispExtractionStartegy`,
    `correlation/correlation_base.h:31`."""

    COST = 0
    SCORE = 1


class DispDirection(enum.Enum):
    """Matching direction.  RIGHT_TO_LEFT: source = right image, target =
    left image, and target pixels are sampled at ``j + d`` (delta sign +1);
    LEFT_TO_RIGHT is the mirror with delta sign -1.  Reference:
    `dispDirection` + `condImgRef`, `correlation/correlation_base.h:36,824-878`
    and the delta sign at `correlation/cross_correlations.h:204`."""

    LEFT_TO_RIGHT = 0
    RIGHT_TO_LEFT = 1

    @property
    def delta_sign(self) -> int:
        return 1 if self is DispDirection.RIGHT_TO_LEFT else -1


class TruncatedCvDirection(enum.Enum):
    """How a truncated cost volume samples around the selected disparity.
    Reference: `truncatedCostVolumeDirection`,
    `correlation/correlation_base.h:41`."""

    SAME = 0
    REVERSED = 1
    BOTH = 2


class MatchingFunction(enum.Enum):
    """The 13 matching cost/score functions.  Reference: `matchingFunctions`,
    `correlation/matching_costs.h:38-53`."""

    CC = 0      # cross correlation
    NCC = 1     # normalized cross correlation
    SSD = 2     # sum of square differences
    SAD = 3     # sum of absolute differences
    ZCC = 4     # zero-mean correlation
    ZNCC = 5    # zero-mean normalized cross correlation
    ZSSD = 6    # zero-mean sum of square differences
    ZSAD = 7    # zero-mean sum of absolute differences
    MEDAD = 8   # median absolute difference
    ZMEDAD = 9  # zero-mean median absolute difference
    HAMMING = 10  # Hamming distance on binary features
    CENSUS = 11   # census transform then Hamming distance
    KERMI = 12    # kernel-based mutual information


@dataclass(frozen=True)
class MatchTraits:
    """Per-matching-function traits.

    Mirrors the fields of the `MatchingFunctionTraits<f>` specializations
    (`correlation/matching_costs.h:419-702`):
      * ``zero_mean``   — subtract the per-patch channel mean before comparing
      * ``normalized``  — divide by the per-patch L2 norm before comparing
      * ``strategy``    — argmin (COST) or argmax (SCORE) extraction
      * ``census``      — features are census-packed bits compared by Hamming
    ``kernel`` names the scalar comparison applied to (source, target) feature
    vectors after normalization: 'dot', 'ssd', 'sad', 'medad', 'hamming',
    or 'kermi'.
    """

    zero_mean: bool
    normalized: bool
    strategy: ExtractionStrategy
    census: bool
    kernel: str


_C = ExtractionStrategy.COST
_S = ExtractionStrategy.SCORE

MATCH_TRAITS: dict[MatchingFunction, MatchTraits] = {
    MatchingFunction.CC:      MatchTraits(False, False, _S, False, "dot"),
    MatchingFunction.NCC:     MatchTraits(False, True,  _S, False, "dot"),
    MatchingFunction.SSD:     MatchTraits(False, False, _C, False, "ssd"),
    MatchingFunction.SAD:     MatchTraits(False, False, _C, False, "sad"),
    MatchingFunction.ZCC:     MatchTraits(True,  False, _S, False, "dot"),
    MatchingFunction.ZNCC:    MatchTraits(True,  True,  _S, False, "dot"),
    MatchingFunction.ZSSD:    MatchTraits(True,  False, _C, False, "ssd"),
    MatchingFunction.ZSAD:    MatchTraits(True,  False, _C, False, "sad"),
    MatchingFunction.MEDAD:   MatchTraits(False, False, _C, False, "medad"),
    MatchingFunction.ZMEDAD:  MatchTraits(True,  False, _C, False, "medad"),
    MatchingFunction.HAMMING: MatchTraits(False, False, _C, True,  "hamming"),
    MatchingFunction.CENSUS:  MatchTraits(False, False, _C, True,  "hamming"),
    MatchingFunction.KERMI:   MatchTraits(False, False, _S, False, "kermi"),
}


def default_cv_value(func: MatchingFunction, dtype=jnp.float32):
    """Worst-possible cost value for a matching function (used to pad /
    initialize cost volumes).  Reference: `defaultCvValForMatchFunc`,
    `correlation/matching_costs.h:706-713`."""
    if MATCH_TRAITS[func].strategy is ExtractionStrategy.COST:
        return jnp.asarray(jnp.finfo(dtype).max if jnp.issubdtype(dtype, jnp.floating)
                           else jnp.iinfo(dtype).max, dtype)
    return jnp.asarray(jnp.finfo(dtype).min if jnp.issubdtype(dtype, jnp.floating)
                       else jnp.iinfo(dtype).min, dtype)
