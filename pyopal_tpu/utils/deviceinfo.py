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

    from ..ops import pallas_ragged

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
                # what the dispatcher actually routes: the strip/v2
                # ragged kernels up to this tier, the segmented
                # long-query kernel (unbounded) beyond it
                "max_query_len": pallas_ragged.RAGGED_MAX_QPAD_STRIP,
                "long_queries": "segmented (unbounded)",
            },
            "xla": {"available": True},
            "native_encoder": {"available": native},
        },
    }
