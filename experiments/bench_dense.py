"""Honest on-device sustained bench for the dense MXU path (config 2).

VERDICT r3 item 4: the published config-2 row (1.7 Mrays/s, 65k rays)
measures the ~35-60 ms tunnel dispatch RTT, not the chip.  This harness
produces the two replacement rows for BASELINE.md:

  1. end-to-end: >=1M-ray batches through `trace_grid_mxu`, chained
     dispatches with per-rep jittered origins (pre-staged on device) and
     a final value-readback checksum — the form a real render loop takes;
  2. kernel-only on-device sustained: K batches chained inside ONE jitted
     lax.scan (per-step distinct origins, carried steps-sum checksum so
     every step must execute), amortizing the dispatch cost to zero.

Reference bar: the 2D prototype's 1M rays/frame
(`/root/reference/DDATestCpp/DDATestCpp.cpp:21,443-452`).

Usage: python experiments/bench_dense.py [W] [H] [reps] [K]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from bench import _require_tpu  # noqa: E402

_require_tpu()
from voxelengine_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from voxelengine_tpu.ops.pallas_trace import (  # noqa: E402
    trace_grid_mxu,
    trace_grid_vpu,
)
from voxelengine_tpu.worldgen.terrain import generate_world  # noqa: E402

# KERNEL=vpu selects the pair-gather fetch variant (default: mxu)
trace_kernel = (trace_grid_vpu if os.environ.get("KERNEL", "mxu") == "vpu"
                else trace_grid_mxu)


def main():
    W = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    K = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    print(f"devices: {jax.devices()}", flush=True)

    g = generate_world((64, 64, 64), octaves=8)
    # same camera family as apps/bench_configs.py config2, at >=1M rays
    u, v = np.meshgrid((np.arange(W) + 0.5) / W, (np.arange(H) + 0.5) / H)
    o = np.stack(
        [np.full(u.size, 32.0), np.full(u.size, 90.0), np.full(u.size, -40.0)],
        -1,
    ).astype(np.float32)
    d = np.stack(
        [(u.reshape(-1) - 0.5) * 1.2, -np.ones(u.size) * 0.9, np.ones(u.size)],
        -1,
    )
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    dj = jnp.asarray(d.astype(np.float32))
    n = W * H
    print(f"rays: {n} ({W}x{H})", flush=True)

    # --- end-to-end: chained dispatches, jittered, checksummed ---
    ojs = [jnp.asarray(o) + jnp.float32(1e-4) * k for k in range(reps + 1)]
    for x in ojs:
        x.block_until_ready()
    t0 = time.perf_counter()
    out = trace_kernel(g, ojs[reps], dj)
    out.hit.block_until_ready()
    print(f"compile+first: {time.perf_counter() - t0:.1f}s  "
          f"hit-rate {float(jnp.mean(out.hit)):.3f}  "
          f"steps mean {float(jnp.mean(out.steps)):.1f}", flush=True)
    t0 = time.perf_counter()
    for k in range(reps):
        out = trace_kernel(g, ojs[k], dj)
    _ = float(jnp.sum(out.steps))
    ms = (time.perf_counter() - t0) * 1000 / reps
    print(f"end-to-end: {ms:.2f} ms/batch -> {n / ms / 1000:.1f} Mrays/s "
          f"({reps} chained dispatches incl tunnel)", flush=True)

    # --- kernel-only: K batches chained in one jitted scan ---
    o0 = jnp.asarray(o)

    @jax.jit
    def sustained(o0, dj):
        def step(acc, k):
            r = trace_kernel(g, o0 + jnp.float32(1e-4) * k, dj)
            return acc + jnp.sum(r.steps), None

        acc, _ = jax.lax.scan(
            step, jnp.int32(0), jnp.arange(K, dtype=jnp.float32)
        )
        return acc

    t0 = time.perf_counter()
    sustained(o0, dj).block_until_ready()
    print(f"sustained compile+first: {time.perf_counter() - t0:.1f}s", flush=True)
    # M independent dispatches so enqueue hides behind device work; distinct
    # bases so nothing short-circuits; sum of accs forces execution
    M = 3
    t0 = time.perf_counter()
    accs = [sustained(o0 + jnp.float32(1e-3) * (m + 1), dj) for m in range(M)]
    total = sum(float(a) for a in accs)
    ms2 = (time.perf_counter() - t0) * 1000 / (K * M)
    print(f"on-device sustained: {ms2:.2f} ms/batch -> "
          f"{n / ms2 / 1000:.1f} Mrays/s  (K={K} scan x M={M}, "
          f"checksum {total:.0f})", flush=True)


if __name__ == "__main__":
    main()
