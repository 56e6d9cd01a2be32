from .types import (
    MatchingFunction,
    DispDirection,
    ExtractionStrategy,
    TruncatedCvDirection,
    MATCH_TRAITS,
    MatchTraits,
    disp_dtype,
    default_cv_value,
)
from .margins import Margins, PaddingMargins

__all__ = [
    "MatchingFunction",
    "DispDirection",
    "ExtractionStrategy",
    "TruncatedCvDirection",
    "MATCH_TRAITS",
    "MatchTraits",
    "disp_dtype",
    "default_cv_value",
    "Margins",
    "PaddingMargins",
]
