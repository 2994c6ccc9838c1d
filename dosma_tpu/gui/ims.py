"""Main GUI application (re-design of ``/root/reference/dosma/gui/ims.py:32``).

Tkinter app with three tabs: scan analysis (action forms generated from the
same ``cmd_line_actions`` reflection the CLI uses), a preferences editor,
and a slice-scroll image viewer with mask overlay.
"""

from __future__ import annotations

import inspect
import os
import threading

__all__ = ["DosmaViewer"]


class DosmaViewer:
    """Entry-point GUI class. Instantiate and call :meth:`mainloop`."""

    def __init__(self, root=None):
        import tkinter as tk
        from tkinter import ttk

        self.root = root or tk.Tk()
        self.root.title("DOSMA-TPU")
        self.root.geometry("900x650")

        notebook = ttk.Notebook(self.root)
        notebook.pack(fill=tk.BOTH, expand=True)

        self.scan_frame = tk.Frame(notebook)
        self.pref_frame = tk.Frame(notebook)
        self.viewer_frame = tk.Frame(notebook)
        notebook.add(self.scan_frame, text="Analyze")
        notebook.add(self.viewer_frame, text="Viewer")
        notebook.add(self.pref_frame, text="Preferences")

        self._build_scan_tab()
        from dosma_tpu.gui.preferences_viewer import PreferencesViewer

        self.preferences_viewer = PreferencesViewer(self.pref_frame)
        from dosma_tpu.gui.im_viewer import ImageViewer

        self.image_viewer = ImageViewer(self.viewer_frame)

    # ------------------------------------------------------------------
    def _build_scan_tab(self):
        import tkinter as tk
        from tkinter import filedialog, ttk

        from dosma_tpu.cli import SUPPORTED_SCAN_TYPES

        frame = self.scan_frame
        self.dicom_var = tk.StringVar()
        self.save_var = tk.StringVar()

        def browse(var, directory=True):
            def _cb():
                path = filedialog.askdirectory() if directory else filedialog.askopenfilename()
                if path:
                    var.set(path)

            return _cb

        row = 0
        tk.Label(frame, text="DICOM directory:").grid(row=row, column=0, sticky="w")
        tk.Entry(frame, textvariable=self.dicom_var, width=50).grid(row=row, column=1)
        tk.Button(frame, text="Browse", command=browse(self.dicom_var)).grid(row=row, column=2)
        row += 1
        tk.Label(frame, text="Save directory:").grid(row=row, column=0, sticky="w")
        tk.Entry(frame, textvariable=self.save_var, width=50).grid(row=row, column=1)
        tk.Button(frame, text="Browse", command=browse(self.save_var)).grid(row=row, column=2)
        row += 1

        tk.Label(frame, text="Scan:").grid(row=row, column=0, sticky="w")
        self.scan_var = tk.StringVar(value=SUPPORTED_SCAN_TYPES[-1].NAME)
        scan_menu = ttk.Combobox(
            frame,
            textvariable=self.scan_var,
            values=[s.NAME for s in SUPPORTED_SCAN_TYPES],
            state="readonly",
        )
        scan_menu.grid(row=row, column=1, sticky="w")
        scan_menu.bind("<<ComboboxSelected>>", lambda e: self._refresh_actions())
        row += 1

        tk.Label(frame, text="Action:").grid(row=row, column=0, sticky="w")
        self.action_var = tk.StringVar()
        self.action_menu = ttk.Combobox(frame, textvariable=self.action_var, state="readonly")
        self.action_menu.grid(row=row, column=1, sticky="w")
        self.action_menu.bind("<<ComboboxSelected>>", lambda e: self._refresh_params())
        row += 1

        self.param_frame = tk.Frame(frame)
        self.param_frame.grid(row=row, column=0, columnspan=3, sticky="nsew")
        row += 1

        self.run_button = tk.Button(frame, text="Run", command=self._run_action)
        self.run_button.grid(row=row, column=1, pady=8)
        self.status_var = tk.StringVar(value="ready")
        tk.Label(frame, textvariable=self.status_var).grid(row=row, column=2)

        self._refresh_actions()

    def _scan_type(self):
        from dosma_tpu.cli import SUPPORTED_SCAN_TYPES

        for s in SUPPORTED_SCAN_TYPES:
            if s.NAME == self.scan_var.get():
                return s

    def _refresh_actions(self):
        scan = self._scan_type()
        names = [w.name for _, w in scan.cmd_line_actions()]
        self.action_menu.configure(values=names)
        if names:
            self.action_var.set(names[0])
        self._refresh_params()

    def _refresh_params(self):
        import tkinter as tk

        from dosma_tpu.cli import BASIC_TYPES, _signature
        from dosma_tpu.tissues.tissue import Tissue

        for child in self.param_frame.winfo_children():
            child.destroy()
        self.param_vars = {}

        scan = self._scan_type()
        action = next(
            (a for a, w in scan.cmd_line_actions() if w.name == self.action_var.get()), None
        )
        if action is None:
            return
        sig = _signature(action)
        r = 0
        for name, param in sig.parameters.items():
            if name == "self" or param.annotation is Tissue:
                continue
            if param.annotation not in BASIC_TYPES:
                continue
            tk.Label(self.param_frame, text=name).grid(row=r, column=0, sticky="w", padx=4)
            default = "" if param.default is inspect._empty else str(param.default)
            var = tk.StringVar(value=default)
            self.param_vars[name] = (var, param.annotation)
            tk.Entry(self.param_frame, textvariable=var).grid(row=r, column=1, sticky="ew")
            r += 1

    def _run_action(self):
        self.status_var.set("running...")
        self.run_button.configure(state="disabled")
        threading.Thread(target=self._run_action_impl, daemon=True).start()

    def _run_action_impl(self):
        try:
            from dosma_tpu.cli import CommandLineScanContainer
            from dosma_tpu.defaults import preferences

            scan_type = self._scan_type()
            scan = CommandLineScanContainer(
                scan_type,
                dicom_path=self.dicom_var.get() or None,
                load_path=self.save_var.get() or None,
            )
            kwargs = {}
            for name, (var, ptype) in self.param_vars.items():
                raw = var.get()
                if raw in ("", "None"):
                    continue
                if ptype is bool:
                    kwargs[name] = raw.lower() in ("1", "true", "yes")
                else:
                    kwargs[name] = ptype(raw)
            getattr(scan, self.action_var.get())(**kwargs)
            if self.save_var.get():
                scan.save(self.save_var.get(), image_data_format=preferences.image_data_format)
            vols = scan.scan.volumes
            vol = vols[0] if isinstance(vols, (list, tuple)) else vols
            self.image_viewer.set_volume(vol)
            self.status_var.set("done")
        except Exception as e:  # pragma: no cover - GUI error path
            self.status_var.set(f"error: {e}")
        finally:
            self.run_button.configure(state="normal")

    def mainloop(self):
        self.root.mainloop()


def main():  # pragma: no cover - needs display
    DosmaViewer().mainloop()


if __name__ == "__main__":  # pragma: no cover
    main()
