"""GUI layer: display adapters + the interactive viewer, headless.

Reference parity: `gui/arraydisplayadapter.h:45,214` (adapters) and the
qImageDisplayWidget interaction (`examples/data_img_viewer/`) — pan,
zoom, level windowing.  The viewer's handlers are plain methods over
matplotlib events, so they are driven here with synthetic events on the
Agg backend (no display needed).
"""

import types

import numpy as np
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg", force=True)

from libstevi_tpu.gui import (ArrayDisplayAdapter,
                              GrayscaleArrayDisplayAdapter,
                              InteractiveViewer)


def _ev(**kw):
    e = types.SimpleNamespace(xdata=None, ydata=None, x=0, y=0,
                              button=None, key=None)
    for k, v in kw.items():
        setattr(e, k, v)
    return e


@pytest.fixture
def viewer():
    rng = np.random.default_rng(0)
    v = InteractiveViewer(rng.uniform(0, 10, (40, 60)).astype(np.float32))
    yield v
    import matplotlib.pyplot as plt
    plt.close(v.fig)


def test_adapter_windowing():
    a = np.linspace(0, 1, 12).reshape(3, 4).astype(np.float32)
    rgb = GrayscaleArrayDisplayAdapter(a, black_level=0.25,
                                       white_level=0.75,
                                       colormap="gray").to_rgb()
    assert rgb.shape == (3, 4, 3)
    assert rgb[0, 0, 0] == 0          # below black level clamps
    assert rgb[-1, -1, 0] == 255      # above white level clamps


def test_viewer_renders_rgb(viewer):
    rgb = viewer.rgb()
    assert rgb.shape == (40, 60, 3) and rgb.dtype == np.uint8


def test_scroll_zooms_about_cursor(viewer):
    x0 = viewer.ax.get_xlim()
    viewer.on_scroll(_ev(xdata=30.0, ydata=20.0, button="up"))
    x1 = viewer.ax.get_xlim()
    assert (x1[1] - x1[0]) < (x0[1] - x0[0])      # zoomed in
    # the cursor point keeps its relative position
    rel0 = (30.0 - x0[0]) / (x0[1] - x0[0])
    rel1 = (30.0 - x1[0]) / (x1[1] - x1[0])
    assert rel0 == pytest.approx(rel1, abs=1e-9)
    viewer.on_scroll(_ev(xdata=30.0, ydata=20.0, button="down"))
    x2 = viewer.ax.get_xlim()
    assert (x2[1] - x2[0]) == pytest.approx(x0[1] - x0[0])


def test_drag_pans(viewer):
    viewer.on_press(_ev(xdata=10.0, ydata=10.0, button=1))
    viewer.on_motion(_ev(xdata=15.0, ydata=12.0))
    viewer.on_release(_ev())
    x0, x1 = viewer.ax.get_xlim()
    assert x0 == pytest.approx(-5.5)              # shifted by -5


def test_right_drag_level_window(viewer):
    b0, w0 = viewer.black, viewer.white
    viewer.on_press(_ev(button=3, x=100, y=100))
    viewer.on_motion(_ev(x=160, y=100, xdata=None, ydata=None))
    assert viewer.black > b0                      # center moved right
    assert viewer.white - viewer.black == pytest.approx(w0 - b0)
    viewer.on_motion(_ev(x=100, y=300, xdata=None, ydata=None))
    assert viewer.white - viewer.black > (w0 - b0)  # widened
    viewer.on_release(_ev())


def test_reset_and_colormap_cycle(viewer):
    viewer.on_scroll(_ev(xdata=30.0, ydata=20.0, button="up"))
    viewer.on_press(_ev(button=3, x=0, y=0))
    viewer.on_motion(_ev(x=50, y=50, xdata=None, ydata=None))
    viewer.on_release(_ev())
    viewer.on_key(_ev(key="r"))
    assert viewer.ax.get_xlim() == viewer._home[0]
    assert (viewer.black, viewer.white) == viewer._full_range
    before = viewer.rgb().copy()
    viewer.on_key(_ev(key="c"))
    assert (viewer.rgb() != before).any()         # colormap changed


def test_value_readout(viewer):
    s = viewer._format_coord(12.2, 7.8)
    assert "x=12 y=8" in s and "value=" in s
    v = viewer.data[8, 12]
    assert f"{v:.4g}" in s
