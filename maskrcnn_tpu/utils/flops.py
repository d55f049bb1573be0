"""Achieved-FLOPs / MFU accounting for benchmarks.

The reference only reports s/iter (MODEL_ZOO.md); img/s alone lets
efficiency regressions hide behind config changes, so every bench here also
prints achieved TFLOP/s and %-of-peak from XLA's own cost analysis of the
compiled program (one-time, exact for the compiled HLO).
"""

import jax

# Dense peak bf16 TFLOP/s per chip by device kind (public cloud specs).
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5e": 197.0,
    "TPU v5": 459.0,  # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,  # v6e / Trillium
    "TPU v6e": 918.0,
}


def device_peak_tflops():
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        return None
    for k, v in sorted(_PEAK_TFLOPS.items(), key=lambda kv: -len(kv[0])):
        if kind.startswith(k):
            return v
    return None


def compiled_flops(jitted_fn, *args, **kwargs):
    """Total FLOPs of one invocation, from the compiled HLO's cost analysis.
    Returns None when the backend exposes no cost model."""
    try:
        compiled = jitted_fn.lower(*args, **kwargs).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else {}
        f = ca.get("flops")
        return float(f) if f else None
    except Exception:
        return None


def mfu_fields(flops, seconds_per_step):
    """{"tflops_per_sec": ..., "mfu": ...} (empty when unknown)."""
    out = {}
    if not flops or not seconds_per_step:
        return out
    achieved = flops / seconds_per_step / 1e12
    out["tflops_per_sec"] = round(achieved, 2)
    peak = device_peak_tflops()
    if peak:
        out["mfu"] = round(achieved / peak, 4)
    return out
