#!/usr/bin/env python
"""Print XLA cost-analysis FLOPs + achieved TFLOP/s / MFU of the train step."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

from profile_train import build_step


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    step, params, opt_state, batch = build_step(b)
    rng = jax.random.PRNGKey(1)
    lowered = step.lower(params, opt_state, batch, rng)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops", 0.0)
    out = step(params, opt_state, batch, rng)
    float(out[2]["loss"])
    t0 = time.perf_counter()
    for _ in range(5):
        out = step(params, opt_state, batch, rng)
    float(out[2]["loss"])
    dt = (time.perf_counter() - t0) / 5
    print(f"flops/step: {flops / 1e12:.3f} TFLOP")
    print(f"bytes accessed: {ca.get('bytes accessed', 0) / 1e9:.2f} GB")
    print(f"step: {dt * 1000:.1f} ms  achieved: {flops / dt / 1e12:.1f} TF/s")
    from maskrcnn_tpu.utils.flops import device_peak_tflops

    peak = device_peak_tflops()
    if peak:
        print(f"mfu: {flops / dt / 1e12 / peak * 100:.1f}% of {peak} TF/s peak")


if __name__ == "__main__":
    main()
