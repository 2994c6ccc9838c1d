"""Environment report for bug reports (re-design of
``/root/reference/dosma/utils/collect_env.py:17``)."""

from __future__ import annotations

import importlib
import os
import platform
import sys

__all__ = ["collect_env_info"]

_CORE_PACKAGES = [
    "numpy", "scipy", "pandas", "matplotlib", "yaml", "h5py",
    "jax", "jaxlib", "flax", "optax", "chex", "torch",
]


def collect_env_info() -> str:
    """Collect platform + library version info as a formatted table."""
    rows = [
        ("sys.platform", sys.platform),
        ("Python", sys.version.replace("\n", "")),
        ("Machine", platform.machine()),
        ("Processor", platform.processor() or "n/a"),
    ]

    import dosma_tpu

    rows.append(("dosma_tpu", dosma_tpu.__version__))

    for pkg in _CORE_PACKAGES:
        try:
            mod = importlib.import_module(pkg)
            rows.append((pkg, getattr(mod, "__version__", "unknown")))
        except ImportError:
            rows.append((pkg, "not installed"))

    try:
        import jax

        rows.append(("jax.default_backend", jax.default_backend()))
        rows.append(("jax.devices", ", ".join(str(d) for d in jax.devices())))
    except Exception as e:  # pragma: no cover
        rows.append(("jax.devices", f"error: {e}"))

    rows.append(("DOSMA_DEBUG", os.environ.get("DOSMA_DEBUG", "unset")))

    width = max(len(k) for k, _ in rows)
    lines = [f"{k.ljust(width)}  {v}" for k, v in rows]
    return "\n".join(lines)


if __name__ == "__main__":
    print(collect_env_info())
