"""Round-3 probe D: per-op timing of the shortlist staging primitives.

Probe B (r3b) proved the pieces LOWER; the first full-kernel measurement
(sl=2, mid world) ran ~70x slower than the iteration count explains, so
one of the staged primitives must be orders slower than assumed.  This
times, in isolation, a kernel loop of N rounds each doing:

  a) nothing (loop + one vector add baseline)
  b) a lane-axis min reduction + broadcast store to scratch
  c) b + 2*R scalar reads from the stored scratch (used as broadcasts)
  d) c + 2*R dynamic-offset VMEM [8,128] loads, values consumed
  e) c + 2*R STATIC-offset loads (control for d)

Prints ns/round for each.  Run on TPU.
"""

import sys
import time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R, S = 16, 16
N = 20000


def make(variant):
    def kern(x_ref, o_ref, cache, cand):
        cache[:] = jnp.zeros((S * 8, 128), jnp.int32)

        def body(it, vacc):
            if variant == "a":
                return vacc + 1
            cs = jnp.min(
                jnp.where(x_ref[:] >= jax.lax.rem(it, 5), x_ref[:], S),
                axis=1, keepdims=True,
            )
            cand[0:R, :] = jnp.broadcast_to(cs, (R, 128))
            if variant == "b":
                return vacc + 1
            for g in range(R):
                s1 = jnp.minimum(cand[g, 0], S - 1)
                s2 = jnp.maximum(cand[g, 0] - 1, 0)
                if variant == "c":
                    vacc = vacc + s1 + s2
                elif variant == "d":
                    vacc = vacc + cache[pl.ds(s1 * 8, 8), :][0:8, :]
                    vacc = vacc + cache[pl.ds(s2 * 8, 8), :][0:8, :]
                elif variant == "e":
                    vacc = vacc + cache[g * 8 : g * 8 + 8, :] + s1
                    vacc = vacc + cache[(g // 2) * 8 : (g // 2) * 8 + 8, :] + s2
            return vacc

        o_ref[:] = jax.lax.fori_loop(0, N, body, jnp.zeros((8, 128), jnp.int32))

    return kern


def main():
    x = jnp.asarray(np.random.default_rng(0).integers(0, S, (R, 128)), jnp.int32)
    for variant in "abcde":
        fn = pl.pallas_call(
            make(variant),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((S * 8, 128), jnp.int32),
                pltpu.VMEM((2 * R, 128), jnp.int32),
            ],
            interpret=False,
        )
        try:
            out = fn(x)
            out.block_until_ready()
            reps = 3
            t0 = time.perf_counter()
            for k in range(reps):
                out = fn(x + k % 3)
            out.block_until_ready()
            dt = (time.perf_counter() - t0) / reps
            print(f"variant {variant}: {dt / N * 1e9:8.1f} ns/round", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"variant {variant}: FAILS {type(e).__name__}: {str(e)[:200]}")


if __name__ == "__main__":
    main()
