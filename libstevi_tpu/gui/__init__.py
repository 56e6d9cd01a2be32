from .display import (ArrayDisplayAdapter, GrayscaleArrayDisplayAdapter,
                      disparity_to_color)

__all__ = ["ArrayDisplayAdapter", "GrayscaleArrayDisplayAdapter",
           "disparity_to_color"]
