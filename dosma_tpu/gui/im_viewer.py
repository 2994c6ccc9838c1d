"""Slice-scroll image viewer with mask overlay (re-design of
``/root/reference/dosma/gui/im_viewer.py`` + ``ims.py`` viewer parts)."""

from __future__ import annotations

import numpy as np

__all__ = ["ImageViewer"]


class ImageViewer:
    """Matplotlib-in-Tk viewer: scroll through slices, overlay binary masks."""

    def __init__(self, parent, volume=None, mask=None):
        import tkinter as tk

        from matplotlib.backends.backend_tkagg import FigureCanvasTkAgg
        from matplotlib.figure import Figure

        self.parent = parent
        self._volume = None
        self._mask = None
        self._index = 0

        self.figure = Figure(figsize=(5, 5))
        self.ax = self.figure.add_subplot(111)
        self.canvas = FigureCanvasTkAgg(self.figure, master=parent)
        self.canvas.get_tk_widget().pack(side=tk.TOP, fill=tk.BOTH, expand=True)
        self.canvas.mpl_connect("scroll_event", self._on_scroll)

        self.slider = tk.Scale(
            parent, from_=0, to=0, orient=tk.HORIZONTAL, command=self._on_slider
        )
        self.slider.pack(side=tk.BOTTOM, fill=tk.X)

        if volume is not None:
            self.set_volume(volume, mask)

    def set_volume(self, volume, mask=None):
        self._volume = np.asarray(getattr(volume, "A", volume))
        self._mask = np.asarray(getattr(mask, "A", mask)) if mask is not None else None
        self._index = self._volume.shape[-1] // 2
        self.slider.configure(to=self._volume.shape[-1] - 1)
        self.slider.set(self._index)
        self._draw()

    def _on_scroll(self, event):
        if self._volume is None:
            return
        step = 1 if event.button == "up" else -1
        self._index = int(np.clip(self._index + step, 0, self._volume.shape[-1] - 1))
        self.slider.set(self._index)
        self._draw()

    def _on_slider(self, value):
        if self._volume is None:
            return
        self._index = int(value)
        self._draw()

    def _draw(self):
        self.ax.clear()
        self.ax.imshow(self._volume[..., self._index], cmap="gray")
        if self._mask is not None:
            overlay = np.ma.masked_where(
                self._mask[..., self._index] == 0, self._mask[..., self._index]
            )
            self.ax.imshow(overlay, cmap="autumn", alpha=0.4)
        self.ax.set_title(f"slice {self._index}")
        self.ax.axis("off")
        self.canvas.draw_idle()
