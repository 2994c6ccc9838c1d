"""Preferences editor tab (re-design of
``/root/reference/dosma/gui/preferences_viewer.py``)."""

from __future__ import annotations

__all__ = ["PreferencesViewer"]


class PreferencesViewer:
    """Editable form over all preference leaves with save-to-disk."""

    def __init__(self, parent):
        import tkinter as tk

        from dosma_tpu.defaults import preferences

        self.parent = parent
        self._vars = {}

        flags = preferences.cmd_line_flags()
        row = 0
        for path, spec in sorted(flags.items()):
            tk.Label(parent, text=path).grid(row=row, column=0, sticky="w", padx=4, pady=2)
            var = tk.StringVar(value=str(preferences.get(path)))
            self._vars[path] = var
            if "choices" in spec:
                tk.OptionMenu(parent, var, *spec["choices"]).grid(row=row, column=1, sticky="ew")
            else:
                tk.Entry(parent, textvariable=var).grid(row=row, column=1, sticky="ew")
            row += 1

        tk.Button(parent, text="Apply", command=self.apply).grid(row=row, column=0, pady=6)
        tk.Button(parent, text="Apply & Save", command=self.apply_and_save).grid(
            row=row, column=1, pady=6
        )

    def apply(self):
        from dosma_tpu.defaults import preferences

        for path, var in self._vars.items():
            try:
                preferences.set(path, var.get())
            except (ValueError, KeyError):
                pass

    def apply_and_save(self):
        from dosma_tpu.defaults import preferences

        self.apply()
        preferences.save()
