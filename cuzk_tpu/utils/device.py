"""Device introspection (the analog of print_device_info /
check_cuda_compatibility — field_arithmetic_cuda.cu:629-650,
merkle_tree_cuda.cu:603-621)."""

from __future__ import annotations

from typing import Dict, List


def device_info() -> List[Dict]:
    """One dict per visible device."""
    import jax

    out = []
    for d in jax.devices():
        out.append(
            {
                "id": d.id,
                "platform": d.platform,
                "device_kind": d.device_kind,
                "process_index": d.process_index,
            }
        )
    return out


def check_tpu_compatibility() -> bool:
    """True if an accelerator is present; mirrors the reference's boolean
    pre-flight (merkle_tree_cuda.cu:603-621). CPU-only is still functional
    (the framework falls back to compiled jnp paths)."""
    import jax

    try:
        return any(d.platform in ("tpu", "axon") for d in jax.devices())
    except Exception:
        return False
