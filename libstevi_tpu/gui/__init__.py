from .display import (ArrayDisplayAdapter, GrayscaleArrayDisplayAdapter,
                      disparity_to_color)
from .viewer import InteractiveViewer, view

__all__ = ["ArrayDisplayAdapter", "GrayscaleArrayDisplayAdapter",
           "disparity_to_color", "InteractiveViewer", "view"]
