"""GUI entry point (ref ``/root/reference/dosma/app.py``).

Run: ``python -m dosma_tpu.app``
"""

from dosma_tpu.gui.ims import DosmaViewer


def main():  # pragma: no cover - needs display
    DosmaViewer().mainloop()


if __name__ == "__main__":  # pragma: no cover
    main()
