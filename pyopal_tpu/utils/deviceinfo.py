"""Backend/device introspection — the `_cpu_info` analog.

The reference exposes build/runtime SIMD capability flags
(``/root/reference/src/pyopal/lib.pyx:133-148``); the TPU-native
equivalents are the JAX backend, device kinds/counts, and which compute
engines are in play.
"""

from __future__ import annotations


def _device_info():
    """Return information about the runtime accelerator environment."""
    import jax

    try:
        devices = jax.devices()
        backend = jax.default_backend()
    except Exception as exc:  # pragma: no cover
        return {"backend": None, "error": str(exc)}

    from ..ops import pallas_kernel

    try:
        from pyopal_tpu.native import _encoder  # noqa: F401

        native = True
    except ImportError:
        native = False

    return {
        "backend": backend,
        "devices": [
            {"id": d.id, "kind": d.device_kind, "process": d.process_index}
            for d in devices
        ],
        "n_devices": len(devices),
        "engines": {
            "pallas": {
                "available": backend == "tpu",
                "max_query_len": pallas_kernel.MAX_QPAD,
            },
            "xla": {"available": True},
            "native_encoder": {"available": native},
        },
    }
