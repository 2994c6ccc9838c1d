"""GUI smoke tests: importability + widget construction when a display
exists (headless CI skips construction, as with the reference Tkinter app)."""

import os

import pytest


def test_gui_modules_import():
    import dosma_tpu.app  # noqa: F401
    import dosma_tpu.gui.im_viewer  # noqa: F401
    import dosma_tpu.gui.ims  # noqa: F401
    import dosma_tpu.gui.preferences_viewer  # noqa: F401


@pytest.mark.skipif(not os.environ.get("DISPLAY"), reason="no display")
def test_viewer_constructs():  # pragma: no cover - needs X display
    from dosma_tpu.gui.ims import DosmaViewer

    viewer = DosmaViewer()
    viewer.root.update_idletasks()
    viewer.root.destroy()
